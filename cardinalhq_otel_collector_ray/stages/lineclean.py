"""Line/paragraph-granular cleaning — the C4 / Dolma sub-document edit
family.

Doc-level dedup (``stages/dedup.py``) and span removal
(``stages/relevance.py`` ``remove_dup_spans``) edit whole docs or token
ranges; web-corpus pipelines also clean at LINE granularity:

- **C4 line rules** (Raffel et al. 2020 §2.2): drop lines below a word
  minimum, drop repeated lines within a page, then gate the page on how
  much survived.
- **Dolma / CCNet paragraph dedup** (Soldaini et al. 2024; Wenzek et
  al. 2020 §4.1): suppress every paragraph whose exact content already
  appeared ANYWHERE in the corpus (first occurrence wins) — boilerplate
  headers/footers vanish corpus-wide.

Reference analog: the collector's logdedup processor suppresses
repeated log BODIES by content hash within an interval
(``distribution/components.go:133``); these operators apply the same
content-hash suppression at line granularity, within-doc (C4) and
corpus-wide (Dolma).

Scale shape: ``c4_line_clean`` is fully block-local (a doc is one row —
no shuffle at any size). ``paragraph_dedup_stats`` shuffles only skinny
(digest1, digest2, key, words) partials pre-grouped per block, tagged
with a bounded int32 partition — the corpus itself never moves (the
``exact_dedup_stats`` contract, see ``stages/dedup.py:100``).

Word-count contract: a line's word count is ``count(' ') + 1`` — the
number of single-space-split fields, identical to SQL
``len(string_split(line, ' '))`` (an empty line therefore counts ONE
empty-string word; with any sane ``min_words`` ≥ 1 it drops on both
engines). Null text is treated as ``''``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import part_tags
from ..functions.text import list_offsets_values, split_words

# second SipHash family key for the 128-bit line digest (CLAUDE.md
# convention: two independent pd.util.hash_array families)
_LINE_HASH_KEY2 = "linededup2ndfam!"

# paragraph_dedup packs (doc_id, line_idx) into one int64 order key:
# doc_id << _LINE_IDX_BITS | line_idx. 2^21 lines/doc × 2^42 docs.
_LINE_IDX_BITS = 21


def rewrap_lines(ds: ray.data.Dataset, text_col: str = "text",
                 id_col: str = "doc_id", base: int = 3,
                 mod: int = 5) -> ray.data.Dataset:
    """Deterministically re-wrap single-space word-soup text into
    ``'\\n'``-separated lines of ``w = base + (id % mod)`` words (the last
    line keeps the remainder). Derivation utility for exercising the
    line-granular operators on the newline-free test corpus — the same
    split is reproducible in SQL as ``line_idx = (pos-1) // w`` over
    ``generate_subscripts``, so oracles never rebuild the lined text.

    Fully Arrow: split → two nested ``ListArray`` rebuilds →
    ``pc.binary_join`` (words with ``' '``, lines with ``'\\n'``); numpy
    only for offset arithmetic.
    """
    base_i, mod_i = int(base), int(mod)

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        words = split_words(col)
        offsets, values = list_offsets_values(words)
        per_doc = np.diff(offsets)          # ≥ 1: split('') == ['']
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), per_doc)
        wpos = np.arange(len(values), dtype=np.int64) - offsets[doc_idx]
        w = base_i + (batch[id_col].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % mod_i)
        line_start = (wpos % w[doc_idx]) == 0
        starts = np.flatnonzero(line_start)
        line_offsets = np.concatenate(
            [starts, [len(values)]]).astype(np.int32)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        lines = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(line_offsets), values), " ")
        lines_per_doc = np.bincount(doc_idx[starts], minlength=n)
        doc_offsets = np.concatenate(
            [[0], np.cumsum(lines_per_doc)]).astype(np.int32)
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        lined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(doc_offsets), lines), "\n")
        return batch.set_column(batch.schema.get_field_index(text_col),
                                text_col, lined)

    return ds.map_batches(fn, batch_format="pyarrow")


def _lines_of(col) -> tuple[np.ndarray, np.ndarray, pa.Array, np.ndarray]:
    """Explode a text column into flat line arrays, all C++/numpy:
    (row index per line, 0-based line index within row, flat line
    StringArray, words per line). Null text counts as ``''``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    ll = pc.split_pattern(col, pattern="\n")
    offsets, flat = list_offsets_values(ll)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    row_idx = np.repeat(np.arange(len(col), dtype=np.int64),
                        np.diff(offsets))
    line_idx = np.arange(len(flat), dtype=np.int64) - offsets[row_idx]
    n_words = pc.add(pc.count_substring(flat, pattern=" "), 1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    return row_idx, line_idx, flat, n_words


def _line_digests(flat: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content digest of each line: two independent SipHash
    families (C speed per string; equal lines → equal pairs in every
    batch — value-deterministic by construction)."""
    vals = flat.to_numpy(zero_copy_only=False)
    d1 = pd.util.hash_array(vals).view(np.int64)
    d2 = pd.util.hash_array(vals, hash_key=_LINE_HASH_KEY2).view(np.int64)
    return d1, d2


_STATS_SCHEMA = pa.schema([("doc_id", pa.int64()),
                           ("kept_lines", pa.int64()),
                           ("kept_words", pa.int64()),
                           ("kept_idx_sum", pa.int64())])


def _doc_stats(doc_ids: np.ndarray, rows: np.ndarray, line_idx: np.ndarray,
               n_words: np.ndarray, n_rows: int,
               min_lines: int) -> pa.Table:
    """Per-doc survivors → (doc_id, kept_lines, kept_words, kept_idx_sum);
    docs with fewer than ``min_lines`` surviving lines are dropped.
    ``kept_idx_sum`` = Σ(line_idx+1) over survivors — a positional
    checksum proving WHICH lines survived, not just how many (the
    ``remove_dup_spans`` oracle convention)."""
    kept_lines = np.bincount(rows, minlength=n_rows)
    kept_words = np.bincount(rows, weights=n_words.astype(np.float64),
                             minlength=n_rows).astype(np.int64)
    kept_idx = np.bincount(rows, weights=(line_idx + 1).astype(np.float64),
                           minlength=n_rows).astype(np.int64)
    keep_doc = kept_lines >= min_lines
    return pa.table({"doc_id": pa.array(doc_ids[keep_doc], type=pa.int64()),
                     "kept_lines": pa.array(
                         kept_lines[keep_doc].astype(np.int64)),
                     "kept_words": pa.array(kept_words[keep_doc]),
                     "kept_idx_sum": pa.array(kept_idx[keep_doc])})


def c4_line_clean(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id", min_words: int = 4,
                  min_lines: int = 2) -> ray.data.Dataset:
    """C4 page cleaning (Raffel et al. 2020 §2.2), stats form: per doc,
    keep lines with ≥ ``min_words`` words, drop repeated lines WITHIN the
    doc (first occurrence by line index wins), gate the doc on
    ``min_lines`` surviving lines (the "at least three sentences" rule).

    Output: (doc_id, kept_lines, kept_words, kept_idx_sum). Fully
    block-local — one map_batches, zero shuffle at any corpus size (a
    doc never spans rows). Within-doc repeats are found on the 128-bit
    line digest in ONE lexsort pass (no per-doc Python).
    SQL-equivalent: filter ``n_words >= min_words``, then
    ``row_number() OVER (PARTITION BY doc_id, line ORDER BY line_idx)=1``,
    then ``GROUP BY doc_id HAVING count(*) >= min_lines``.
    """
    min_w, min_l = int(min_words), int(min_lines)

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _STATS_SCHEMA.empty_table()
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_idx, line_idx, flat, n_words = _lines_of(batch[text_col])
        keep = n_words >= min_w
        sub = np.flatnonzero(keep)
        if len(sub) == 0:
            return _STATS_SCHEMA.empty_table()
        d1, d2 = _line_digests(flat.take(pa.array(sub)))
        r, li, nw = row_idx[sub], line_idx[sub], n_words[sub]
        # first occurrence per (row, digest): sort groups, earliest line
        # index first, keep run heads
        order = np.lexsort((li, d2, d1, r))
        rs, d1s, d2s = r[order], d1[order], d2[order]
        head = np.ones(len(order), dtype=bool)
        head[1:] = ((rs[1:] != rs[:-1]) | (d1s[1:] != d1s[:-1])
                    | (d2s[1:] != d2s[:-1]))
        surv = order[head]
        return _doc_stats(doc_ids, r[surv], li[surv], nw[surv], n, min_l)

    return ds.map_batches(kernel, batch_format="pyarrow")


def c4_line_clean_apply(ds: ray.data.Dataset, text_col: str = "text",
                        id_col: str = "doc_id", min_words: int = 4,
                        min_lines: int = 2) -> ray.data.Dataset:
    """C4 page cleaning, APPLY form: emit (doc_id, text) with the short
    and within-doc-repeated lines REMOVED (first occurrence by line
    index wins), dropping docs with fewer than ``min_lines`` surviving
    lines — the edit the stats form only counts. Fully block-local like
    the stats form; same selection semantics (one lexsort pass on the
    128-bit line digests), lines rejoined with ``'\\n'`` in original
    order."""
    min_w, min_l = int(min_words), int(min_lines)

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.schema([("doc_id", pa.int64()),
                           ("text", pa.string())]).empty_table()
        if n == 0:
            return empty
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_idx, line_idx, flat, n_words = _lines_of(batch[text_col])
        sub = np.flatnonzero(n_words >= min_w)
        if len(sub) == 0:
            return empty
        d1, d2 = _line_digests(flat.take(pa.array(sub)))
        r, li = row_idx[sub], line_idx[sub]
        order = np.lexsort((li, d2, d1, r))
        rs, d1s, d2s = r[order], d1[order], d2[order]
        head = np.ones(len(order), dtype=bool)
        head[1:] = ((rs[1:] != rs[:-1]) | (d1s[1:] != d1s[:-1])
                    | (d2s[1:] != d2s[:-1]))
        surv = np.sort(sub[order[head]])      # flat indices, original order
        counts = np.bincount(row_idx[surv], minlength=n)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        kept_flat = flat.take(pa.array(surv))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), kept_flat), "\n")
        keep_doc = counts >= min_l
        return pa.table({"doc_id": pa.array(doc_ids[keep_doc]),
                         "text": text.filter(pa.array(keep_doc))})

    return ds.map_batches(kernel, batch_format="pyarrow")


def paragraph_winners(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_partitions: int = 64,
                      doc_partitions: int = 32) -> ray.data.Dataset:
    """Corpus-wide first-occurrence line decision (Dolma; CCNet §4.1):
    one row per DISTINCT line content — (doc_id, line_idx, n_words,
    _dpart) of the occurrence that wins (smallest (doc_id, line_idx)).

    One skinny bounded-tag shuffle: per-block pre-group (lines → 128-bit
    digests → block-local min order-key per digest in one lexsort pass)
    → partials (d1, d2, _pkey, _pw) tagged ``_part = d1 % P`` →
    per-partition C++ ``group_by(d1,d2).min``. The corpus itself never
    shuffles; hash collisions require both independent 64-bit families
    to collide (the ``training_prep.py:66`` digest contract). Order keys
    pack (doc_id << 21 | line_idx) — loud ValueError past 2^21 lines/doc
    or 2^42 docs.
    """
    P, DP = int(num_partitions), int(doc_partitions)
    _part_schema = pa.schema([("d1", pa.int64()), ("d2", pa.int64()),
                              ("_pkey", pa.int64()), ("_pw", pa.int64()),
                              ("_part", pa.int32())])

    def precombine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _part_schema.empty_table()
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        row_idx, line_idx, flat, n_words = _lines_of(batch[text_col])
        doc = doc_ids[row_idx]
        if line_idx.size:
            if int(line_idx.max()) >= (1 << _LINE_IDX_BITS):
                raise ValueError("doc exceeds 2^21 lines; raise "
                                 "_LINE_IDX_BITS")
            if int(doc.max()) >= (1 << (62 - _LINE_IDX_BITS)) \
                    or int(doc.min()) < 0:
                raise ValueError("doc_id out of packable range [0, 2^41)")
        key = (doc << _LINE_IDX_BITS) | line_idx
        d1, d2 = _line_digests(flat)
        order = np.lexsort((key, d2, d1))
        d1s, d2s, ks = d1[order], d2[order], key[order]
        head = np.ones(len(order), dtype=bool)
        head[1:] = (d1s[1:] != d1s[:-1]) | (d2s[1:] != d2s[:-1])
        out = pa.table({"d1": pa.array(d1s[head]),
                        "d2": pa.array(d2s[head]),
                        "_pkey": pa.array(ks[head]),
                        "_pw": pa.array(n_words[order][head])})
        return out.append_column(
            "_part", pa.array(part_tags(d1s[head], P)))

    def merge_part(t: pa.Table) -> pa.Table:
        g = t.group_by(["d1", "d2"]).aggregate(
            [("_pkey", "min"), ("_pw", "min")])
        key = g["_pkey_min"].to_numpy(zero_copy_only=False)
        doc = key >> _LINE_IDX_BITS
        li = key & ((1 << _LINE_IDX_BITS) - 1)
        out = pa.table({"doc_id": pa.array(doc),
                        "line_idx": pa.array(li),
                        "n_words": g["_pw_min"]})
        return out.append_column(
            "_dpart", pa.array((doc % DP).astype(np.int32)))

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    return partials.groupby("_part").map_groups(
        merge_part, batch_format="pyarrow")


def paragraph_dedup_stats(ds: ray.data.Dataset, text_col: str = "text",
                          id_col: str = "doc_id",
                          num_partitions: int = 64,
                          doc_partitions: int = 32) -> ray.data.Dataset:
    """Corpus-wide paragraph/line dedup stats: per doc with ≥1 surviving
    line, (doc_id, kept_lines, kept_words, kept_idx_sum). The decision is
    ``paragraph_winners``; the finals are one more bounded-tag C++
    aggregation over the (skinny) winner rows."""
    winners = paragraph_winners(ds, text_col, id_col, num_partitions,
                                doc_partitions)

    def per_doc(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "kept_words": t["n_words"].to_numpy(zero_copy_only=False),
            "kept_idx_sum": t["line_idx"].to_numpy(
                zero_copy_only=False) + 1})
        g = df.groupby("doc_id", sort=False)
        out = g.agg(kept_words=("kept_words", "sum"),
                    kept_idx_sum=("kept_idx_sum", "sum"),
                    kept_lines=("kept_words", "size")).reset_index()
        return pa.table({"doc_id": pa.array(out["doc_id"], type=pa.int64()),
                         "kept_lines": pa.array(out["kept_lines"],
                                                type=pa.int64()),
                         "kept_words": pa.array(out["kept_words"],
                                                type=pa.int64()),
                         "kept_idx_sum": pa.array(out["kept_idx_sum"],
                                                  type=pa.int64())})

    return winners.groupby("_dpart").map_groups(
        per_doc, batch_format="pyarrow")


def paragraph_dedup_apply(ds: ray.data.Dataset, text_col: str = "text",
                          id_col: str = "doc_id",
                          num_partitions: int = 64,
                          doc_partitions: int = 32) -> ray.data.Dataset:
    """Corpus-wide paragraph dedup, APPLY form (the Dolma edit): emit
    each doc's text with every line that is NOT the corpus-wide first
    occurrence of its content removed; docs whose every line was
    suppressed are dropped. Output (doc_id, text), lines rejoined with
    ``'\\n'`` in original order.

    One co-partition mark join (the ``stages/dedup._mark_removed``
    shape): corpus rows and the skinny winner decisions are both tagged
    ``_dpart = doc_id % P`` and met per bucket — the full text moves
    exactly once, the winner side carries only (doc_id, line_idx) packed
    keys, and no decision set ever lands on the driver, so the path
    holds at any corpus size."""
    DP = int(doc_partitions)
    winners = paragraph_winners(ds, text_col, id_col, num_partitions, DP)

    def tag_corpus(batch: pa.Table) -> pa.Table:
        doc = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(doc),
            "text": pc.fill_null(batch[text_col], ""),
            "_wkey": pa.nulls(batch.num_rows, pa.int64()),
            "_side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            "_dpart": pa.array((doc % DP).astype(np.int32))})

    def tag_winners(batch: pa.Table) -> pa.Table:
        doc = batch["doc_id"].to_numpy(zero_copy_only=False)
        li = batch["line_idx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": batch["doc_id"],
            "text": pa.nulls(batch.num_rows, pa.string()),
            "_wkey": pa.array((doc << _LINE_IDX_BITS) | li),
            "_side": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            "_dpart": batch["_dpart"]})

    def apply_group(g: pa.Table) -> pa.Table:
        sides = g["_side"].to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(sides == 0))
        wkey = np.sort(g.filter(pa.array(sides == 1))["_wkey"]
                       .to_numpy(zero_copy_only=False))
        n = docs.num_rows
        if n == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("text", pa.string())]).empty_table()
        doc_ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        row_idx, line_idx, flat, _ = _lines_of(docs["text"])
        key = (doc_ids[row_idx] << _LINE_IDX_BITS) | line_idx
        if len(wkey):
            pos = np.minimum(np.searchsorted(wkey, key), len(wkey) - 1)
            keep = wkey[pos] == key
        else:
            keep = np.zeros(len(key), dtype=bool)
        kept_idx = np.flatnonzero(keep)       # row-major → original order
        counts = np.bincount(row_idx[kept_idx], minlength=n)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        kept_flat = flat.take(pa.array(kept_idx))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), kept_flat), "\n")
        keep_doc = counts > 0
        return pa.table({"doc_id": pa.array(doc_ids[keep_doc]),
                         "text": text.filter(pa.array(keep_doc))})

    both = ds.map_batches(tag_corpus, batch_format="pyarrow").union(
        winners.map_batches(tag_winners, batch_format="pyarrow"))
    return both.groupby("_dpart").map_groups(
        apply_group, batch_format="pyarrow")
