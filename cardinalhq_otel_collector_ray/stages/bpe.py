"""BPE tokenizer training over the corpus (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
algorithm).

The scale split is the one every production BPE trainer uses: the ONLY
corpus-sized pass is the word-frequency count (distributed, per-block C++
``value_counts`` partials merged through a hash-partitioned exchange); the
merge-learning loop then runs over the *bounded* distinct-word table
(a natural-language vocabulary is ~10⁵ entries regardless of corpus size —
the same bounded-model contract as the tokenizer vocab and the broadcast
enrichment dict, ``extension/chqauthextension/serverauth.go:132-136``).

The merge loop itself is segmented-numpy over a flat symbol array (pair
counting via one ``np.unique`` per iteration, leftmost-non-overlapping
merge via the alternate-in-run trick) — no per-word Python in the
iteration. Determinism: best pair = (max weighted count, then
lexicographically smallest (left, right) strings) — retry-stable, no RNG.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import stable_str_hash64
from ..functions.text import split_words

END_WORD = "</w>"


def word_frequencies(ds: ray.data.Dataset, text_col: str = "text",
                     num_partitions: int = 16) -> pa.Table:
    """Distributed word-frequency table (word:string, freq:int64).

    Per-block: split + one C++ ``value_counts`` → ≤|block vocab| rows.
    Partials merge through a hash-partitioned C++ ``group_by`` (bounded-tag
    exchange — same shape as ``frequent_ngrams``); only distinct words
    reach the driver.
    """
    def block(batch: pa.Table) -> pa.Table:
        words = split_words(batch[text_col])
        flat = words.values if len(words) else pa.array([], pa.string())
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        vc = flat.value_counts()
        if len(vc) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "_c": pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int32())})
        w = vc.field("values")
        c = vc.field("counts").cast(pa.int64())
        part = (stable_str_hash64(w.to_numpy(zero_copy_only=False))
                % np.uint64(num_partitions)).astype(np.int32)
        return pa.table({"word": w, "_c": c, "_part": pa.array(part)})

    partials = ds.map_batches(block, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        out = g.group_by("word").aggregate([("_c", "sum")])
        return pa.table({"word": out["word"],
                         "freq": out["_c_sum"].cast(pa.int64())})

    merged = list(partials.groupby("_part")
                  .map_groups(merge, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow", batch_size=None))
    if not merged:
        return pa.table({"word": pa.array([], pa.string()),
                         "freq": pa.array([], pa.int64())})
    t = pa.concat_tables(merged, promote_options="default")
    # drop the empty word (split artifact of empty texts)
    keep = pa.compute.not_equal(t["word"], pa.scalar(""))
    return t.filter(keep)


def bpe_train_merges(word_freq: pa.Table, k: int) -> pd.DataFrame:
    """Learn the first ``k`` BPE merges from a (word, freq) table.

    Canonical algorithm: words are symbol sequences (BYTES + a final
    ``</w>`` marker, GPT-2-style — a base symbol is ``chr(byte)``, so on
    ASCII corpora this is character-level bit-for-bit, and on non-ASCII
    corpora it stays consistent with the byte-level encode kernel instead
    of KeyError-ing on a char the 0–255 base alphabet lacks); each
    iteration counts adjacent symbol pairs weighted by word frequency
    (overlapping occurrences all count, as in the reference pseudocode)
    and merges the best pair leftmost-first non-overlapping. Runs on the
    driver over the BOUNDED vocab table — flat-array numpy per iteration,
    no per-word Python.

    Returns (rank:int64, left, right, merged:string, pair_count:int64).
    """
    words = word_freq["word"].to_pylist()
    freqs = word_freq["freq"].to_numpy(zero_copy_only=False).astype(np.int64)

    # one-time flat encode of the bounded vocab (driver-side, not hot path)
    sym_strs: list[str] = []
    sym_id: dict[str, int] = {}
    flat: list[int] = []
    word_id: list[int] = []
    for wi, w in enumerate(words):
        wbytes = [chr(b) for b in w.encode("utf-8")]
        for ch in wbytes:
            i = sym_id.get(ch)
            if i is None:
                i = sym_id[ch] = len(sym_strs)
                sym_strs.append(ch)
        # second loop appends after ids exist (keeps dict lookups tight)
        for ch in wbytes:
            flat.append(sym_id[ch])
            word_id.append(wi)
        i = sym_id.get(END_WORD)
        if i is None:
            i = sym_id[END_WORD] = len(sym_strs)
            sym_strs.append(END_WORD)
        flat.append(i)
        word_id.append(wi)
    sym = np.asarray(flat, dtype=np.int64)
    wb = np.asarray(word_id, dtype=np.int64)

    out_rows = []
    for rank in range(k):
        if len(sym) < 2:
            break
        valid = wb[:-1] == wb[1:]
        pk = (sym[:-1] << np.int64(32)) | sym[1:]
        pkv = pk[valid]
        if len(pkv) == 0:
            break
        wgt = freqs[wb[:-1][valid]]
        uniq, inv = np.unique(pkv, return_inverse=True)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, wgt)
        top = cnt.max()
        cands = uniq[cnt == top]
        best = min(
            cands,
            key=lambda p: (sym_strs[int(p >> np.int64(32))],
                           sym_strs[int(p & np.int64(0xFFFFFFFF))]))
        left = sym_strs[int(best >> np.int64(32))]
        right = sym_strs[int(best & np.int64(0xFFFFFFFF))]
        merged_str = left + right
        new_id = sym_id.get(merged_str)
        if new_id is None:
            new_id = sym_id[merged_str] = len(sym_strs)
            sym_strs.append(merged_str)
        # leftmost-first non-overlapping merge: in each run of consecutive
        # match positions, keep alternate occurrences (1st, 3rd, …)
        match = np.flatnonzero((pk == best) & valid)
        run_start = np.r_[True, np.diff(match) != 1] if len(match) else \
            np.empty(0, bool)
        run_first = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        offset = np.arange(len(match)) - run_first[run_id]
        kept = match[offset % 2 == 0]
        sym[kept] = new_id
        drop = np.zeros(len(sym), dtype=bool)
        drop[kept + 1] = True
        sym = sym[~drop]
        wb = wb[~drop]
        out_rows.append((rank, left, right, merged_str, int(top)))

    return pd.DataFrame(out_rows, columns=["rank", "left", "right",
                                           "merged", "pair_count"]) \
        .astype({"rank": "int64", "pair_count": "int64"})


def bpe_merges(ds: ray.data.Dataset, text_col: str = "text",
               k: int = 30, num_partitions: int = 16) -> pd.DataFrame:
    """Corpus → first ``k`` BPE merges (the tokenizer-training pipeline)."""
    wf = word_frequencies(ds, text_col, num_partitions=num_partitions)
    return bpe_train_merges(wf, k)


def _merge_id_plan(merges: pd.DataFrame):
    """Map merge strings to a self-contained id space for the encode
    kernel: byte values 0–255 are the base symbols, 256 is ``</w>``, and
    merge r's output symbol is 257+r. Left/right of merge r are products
    of earlier merges (or base symbols), so the dict lookup always hits."""
    sid = {chr(b): b for b in range(256)}
    sid[END_WORD] = 256
    plan = []
    for r, row in enumerate(merges.itertuples(index=False)):
        lid, rid = sid[row.left], sid[row.right]
        mid = 257 + r
        sid[row.merged] = mid
        plan.append((np.int64(lid) << np.int64(32) | np.int64(rid),
                     np.int64(mid)))
    return plan


def apply_merges_kernel(sym: np.ndarray, wb: np.ndarray, plan) -> tuple:
    """Apply learned merges in rank order over a flat symbol array with
    word boundaries — the training loop's merge step without the counting
    (leftmost-non-overlapping via the alternate-in-run trick)."""
    for target, mid in plan:
        if len(sym) < 2:
            break
        pk = (sym[:-1] << np.int64(32)) | sym[1:]
        valid = wb[:-1] == wb[1:]
        match = np.flatnonzero((pk == target) & valid)
        if len(match) == 0:
            continue
        run_start = np.r_[True, np.diff(match) != 1]
        run_first = np.flatnonzero(run_start)
        run_id = np.cumsum(run_start) - 1
        offset = np.arange(len(match)) - run_first[run_id]
        kept = match[offset % 2 == 0]
        sym[kept] = mid
        drop = np.zeros(len(sym), dtype=bool)
        drop[kept + 1] = True
        sym = sym[~drop]
        wb = wb[~drop]
    return sym, wb


def bpe_encode_stats(ds: ray.data.Dataset, merges: pd.DataFrame,
                     text_col: str = "text",
                     doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """Apply learned BPE merges to the corpus; per-doc subword counts.

    Byte-level encode (GPT-2-style base alphabet: every byte is a base
    symbol — identical to char-level on the ASCII corpus contract): the
    whole block becomes ONE flat symbol array built from the Arrow string
    buffers (no per-row Python), the broadcast merge plan is applied with
    ``apply_merges_kernel`` (k vectorized passes), and per-doc counts come
    from one bincount. Output: (doc_id, n_words, n_subwords).
    """
    import ray as _ray
    plan_ref = _ray.put(_merge_id_plan(merges))

    def block(batch: pa.Table) -> pa.Table:
        plan = _ray.get(plan_ref)
        words = split_words(batch[text_col])
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        doc_off = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n_words_per_doc = np.diff(doc_off)
        flat = words.values
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        off_buf = np.frombuffer(flat.buffers()[1], dtype=np.int32)
        off = off_buf[flat.offset: flat.offset + len(flat) + 1] \
            .astype(np.int64)
        data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)[off[0]:off[-1]]
        off = off - off[0]
        n_words = len(off) - 1
        if n_words == 0:
            return pa.table({doc_id_col: batch[doc_id_col].slice(0, 0),
                             "n_words": pa.array([], pa.int64()),
                             "n_subwords": pa.array([], pa.int64())})
        word_len = np.diff(off)
        total = off[-1] + n_words                    # + one </w> per word
        sym = np.empty(total, dtype=np.int64)
        word_idx_per_byte = np.repeat(np.arange(n_words), word_len)
        byte_pos = np.arange(len(data), dtype=np.int64)
        sym[byte_pos + word_idx_per_byte] = data
        sym[off[1:] + np.arange(n_words)] = 256      # </w>
        wb = np.repeat(np.arange(n_words, dtype=np.int64), word_len + 1)
        sym, wb = apply_merges_kernel(sym, wb, plan)
        doc_of_word = np.repeat(np.arange(len(n_words_per_doc)),
                                n_words_per_doc)
        n_sub = np.bincount(doc_of_word[wb],
                            minlength=len(n_words_per_doc)).astype(np.int64)
        return pa.table({doc_id_col: batch[doc_id_col],
                         "n_words": pa.array(n_words_per_doc.astype(np.int64)),
                         "n_subwords": pa.array(n_sub)})

    return ds.map_batches(block, batch_format="pyarrow")
