"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

These extend the reference's decorate/fingerprint stage (drain template
mining, ``distribution/components.go:124``; decorator stage in
``docs/flow/flow.dot:27-104``) with the text-quality operators a 100 TB
training-data pipeline needs. All kernels are Arrow/numpy vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import poly_hash64, round6
from ..functions.text import list_offsets_values, split_words

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# SQL-reproducible: membership tests over fixed word lists.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit"),
    "fr": ("le", "la", "de", "et", "est", "en", "un", "une", "que", "pour"),
}


def _word_stats(batch: pa.Table, text_col: str):
    words = split_words(batch[text_col])
    offsets, values = list_offsets_values(words)
    n_words = np.diff(offsets)
    return words, offsets, values, n_words


def quality_stats(ds: ray.data.Dataset, text_col: str = "text",
                  id_cols: tuple[str, ...] = ("doc_id",)) -> ray.data.Dataset:
    """Quality-scoring columns: n_words, n_chars_obs, mean_word_len,
    stopword_ratio (EN list), alpha_ratio. Vectorized via reduceat over the
    flattened word values."""
    stop = set(LANG_STOPWORDS["en"])

    def fn(batch: pa.Table) -> pa.Table:
        words, offsets, values, n_words = _word_stats(batch, text_col)
        text = batch[text_col]
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        wlen = pc.utf8_length(values).to_numpy(zero_copy_only=False).astype(np.float64)
        starts = offsets[:-1]
        safe = np.maximum(n_words, 1).astype(np.float64)
        sum_wlen = np.add.reduceat(np.append(wlen, 0.0), np.minimum(starts, len(wlen)))
        sum_wlen[n_words == 0] = 0.0
        is_stop = pc.is_in(values, value_set=pa.array(sorted(stop))).to_numpy(zero_copy_only=False)
        sum_stop = np.add.reduceat(np.append(is_stop.astype(np.float64), 0.0),
                                   np.minimum(starts, len(is_stop)))
        sum_stop[n_words == 0] = 0.0
        out = batch.select([c for c in id_cols if c in batch.column_names])
        out = out.append_column("n_words", pa.array(n_words.astype(np.int64)))
        out = out.append_column("n_chars_obs", pa.array(n_chars))
        out = out.append_column("mean_word_len", pa.array(sum_wlen / safe))
        out = out.append_column("stopword_ratio", pa.array(sum_stop / safe))
        return out
    return ds.map_batches(fn, batch_format="pyarrow")


def langid_scores(ds: ray.data.Dataset, text_col: str = "text",
                  id_cols: tuple[str, ...] = ("doc_id",)) -> ray.data.Dataset:
    """Stopword-list language scores + argmax prediction (n-gram-heuristic
    language ID). Deterministic tie-break: first language in sorted order."""
    langs = sorted(LANG_STOPWORDS)
    sets = {lang: pa.array(sorted(LANG_STOPWORDS[lang])) for lang in langs}

    def fn(batch: pa.Table) -> pa.Table:
        words, offsets, values, n_words = _word_stats(batch, text_col)
        starts = offsets[:-1]
        safe = np.maximum(n_words, 1).astype(np.float64)
        out = batch.select([c for c in id_cols if c in batch.column_names])
        scores = []
        for lang in langs:
            hit = pc.is_in(values, value_set=sets[lang]).to_numpy(zero_copy_only=False)
            s = np.add.reduceat(np.append(hit.astype(np.float64), 0.0),
                                np.minimum(starts, len(hit)))
            s[n_words == 0] = 0.0
            ratio = s / safe
            scores.append(ratio)
            out = out.append_column(f"score_{lang}", pa.array(ratio))
        mat = np.stack(scores, axis=1)
        pred = np.asarray(langs, dtype=object)[np.argmax(mat, axis=1)]
        pred[mat.max(axis=1) == 0.0] = "und"
        out = out.append_column("lang_pred", pa.array(pred, type=pa.string()))
        return out
    return ds.map_batches(fn, batch_format="pyarrow")


def bpe_ish_token_count(ds: ray.data.Dataset, text_col: str = "text",
                        id_cols: tuple[str, ...] = ("doc_id",),
                        out: str = "n_bpe_ish") -> ray.data.Dataset:
    """Sub-word token count for the BPE-ish pattern
    `` ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+`` — i.e. one token per
    character-class run. Computed by collapsing each run to a single
    sentinel char with three RE2 passes, then counting non-space chars —
    fully vectorized, and expressible verbatim in SQL (same RE2 engine)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        s = pc.replace_substring_regex(col, pattern="[A-Za-z]+", replacement="A")
        s = pc.replace_substring_regex(s, pattern="[0-9]+", replacement="0")
        s = pc.replace_substring_regex(s, pattern="[^A0 ]+", replacement="#")
        total = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
        spaces = pc.utf8_length(
            pc.replace_substring_regex(s, pattern="[^ ]", replacement="")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        out_t = batch.select([c for c in id_cols if c in batch.column_names])
        return out_t.append_column(out, pa.array(total - spaces))
    return ds.map_batches(fn, batch_format="pyarrow")


def token_prefix_fingerprint(ds: ray.data.Dataset, tokens_col: str = "tokens",
                             k: int = 8, out: str = "fingerprint") -> ray.data.Dataset:
    """Drain/template-mining analog: fingerprint = polynomial hash of the
    first ``k`` token ids (pad with -1). int64 output (uint64 bit-cast)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(offsets) - 1
        mat = np.full((n, k), -1, dtype=np.int64)
        lens = np.minimum(np.diff(offsets), k)
        # gather first-k via one flat fancy-index (no row loop)
        rows = np.repeat(np.arange(n), lens)
        pos = np.concatenate([np.arange(l) for l in lens]) if n else np.empty(0, np.int64)
        mat[rows, pos] = values[np.repeat(offsets[:-1], lens) + pos]
        fp = poly_hash64(mat).view(np.int64)
        return batch.append_column(out, pa.array(fp))
    return ds.map_batches(fn, batch_format="pyarrow")


def sql_prefix_fingerprint(ds: ray.data.Dataset, tokens_col: str = "tokens",
                           k: int = 8, out: str = "fingerprint") -> ray.data.Dataset:
    """Oracle-safe variant: fingerprint = sum(token[i] * 31^i, i<k) in BIGINT
    (missing positions contribute 0) — reproducible in SQL."""
    powers = np.array([31 ** i for i in range(k)], dtype=np.int64)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(offsets) - 1
        mat = np.zeros((n, k), dtype=np.int64)
        lens = np.minimum(np.diff(offsets), k)
        rows = np.repeat(np.arange(n), lens)
        pos = np.concatenate([np.arange(l) for l in lens]) if n else np.empty(0, np.int64)
        mat[rows, pos] = values[np.repeat(offsets[:-1], lens) + pos]
        fp = (mat * powers[None, :]).sum(axis=1)
        return batch.append_column(out, pa.array(fp))
    return ds.map_batches(fn, batch_format="pyarrow")


def winnow_fingerprints(ds: ray.data.Dataset, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 5,
                        w: int = 8, code: str = "poly") -> ray.data.Dataset:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm; public).

    Per doc: all k-char shingle hashes (zero-copy buffer reads via
    ``char_shingles_u64``), then the minimum hash of every w-wide window,
    deduplicated. Guarantee: two documents sharing any substring of length
    ≥ w + k - 1 share at least one fingerprint. The window minimum is w-1
    vectorized ``np.minimum`` passes over the FLAT shingle array (uint64
    sentinel padding; windows crossing doc boundaries masked) — no per-row
    Python. Output rows: (id, fp:int64) — the exploded fingerprint sets,
    ready for an inverted-index / LSH-style pair stage.

    ``code="pack"`` (k ≤ 8) uses the INJECTIVE byte-pack shingle code, so
    each fingerprint IS its winning k-byte substring — the window minimum
    becomes lexicographic min over substrings, which a SQL oracle can
    recompute exactly (window ``min() OVER ... ROWS`` + ``ascii`` pack).
    Default ``"poly"`` keeps the cheaper rolling-hash codes.
    """
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        d, f = winnow_kernel(batch[text_col], k=k, w=w, code=code)
        if len(d) == 0:
            return pa.table({"id": ids.slice(0, 0),
                             "fp": pa.array([], type=pa.int64())})
        return pa.table({"id": ids.take(pa.array(d)),
                         "fp": pa.array(f)})
    return ds.map_batches(fn, batch_format="pyarrow")


def winnow_kernel(texts, k: int = 5, w: int = 8, code: str = "poly"):
    """Pure winnowing kernel over an Arrow string array (or list of str):
    returns (doc_index:int64[], fp:int64[]) — the deduped fingerprint sets
    in one vectorized pass. Separated from the Dataset stage so property
    tests can drive it directly."""
    from ..functions.text import char_shingles_u64

    sentinel = np.uint64(0xFFFFFFFFFFFFFFFF)
    starts, codes = char_shingles_u64(texts, k=k, code=code)
    L = len(codes)
    if L == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ext = np.concatenate([codes, np.full(w - 1, sentinel, dtype=np.uint64)])
    wmin = ext[:L].copy()
    for j in range(1, w):
        np.minimum(wmin, ext[j:j + L], out=wmin)
    n_sh = np.diff(starts)
    doc_of = np.repeat(np.arange(len(n_sh), dtype=np.int64), n_sh)
    doc_end = np.repeat(starts[1:], n_sh)
    p = np.arange(L, dtype=np.int64)
    valid = (p + w - 1) < doc_end  # window fully inside its doc
    d, f = doc_of[valid], wmin[valid]
    # docs with < w shingles have no full window: emit their global
    # min via a segment reduce (wmin would read into the next doc)
    short = np.flatnonzero((n_sh > 0) & (n_sh < w))
    if len(short):
        segmin = np.minimum.reduceat(codes,
                                     np.minimum(starts[:-1], L - 1))
        d = np.concatenate([d, short])
        f = np.concatenate([f, segmin[short]])
    # dedupe (doc, fp) pairs: d is non-decreasing; sort fp within doc
    order = np.lexsort((f, d))
    d, f = d[order], f[order]
    keep = np.r_[True, (np.diff(d) != 0) | (np.diff(f.view(np.int64)) != 0)]
    return d[keep], f[keep].view(np.int64)


def logistic_score(ds: ray.data.Dataset, features: list[tuple[str, float]],
                   bias: float, out: str = "score") -> ray.data.Dataset:
    """Broadcast-weight logistic scorer over feature columns — the
    "quality classifier" step of a training-data pipeline (fixed public
    weights; swap in learned ones the same way). z accumulates STRICTLY
    left-to-right (bias + w1·f1 + w2·f2 …) so a SQL oracle writing the
    same expression produces bit-identical doubles before the exp."""
    def fn(batch: pa.Table) -> pa.Table:
        z = np.full(batch.num_rows, float(bias))
        for col, wgt in features:
            z = z + wgt * batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        score = 1.0 / (1.0 + np.exp(-z))
        return batch.append_column(out, pa.array(score))
    return ds.map_batches(fn, batch_format="pyarrow")


def token_entropy(ds: ray.data.Dataset, tokens_col: str = "tokens",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Shannon entropy of each document's token distribution —
    H = −Σ_t (c_t/n)·ln(c_t/n) — a repetitiveness/quality signal next to
    `quality_stats`.

    Shuffle-free (entropy is per-doc): one lexsort of the block's flat
    (doc, token) pairs, run-length counts, then a term-per-distinct-token
    array reduced per doc with ``add.reduceat`` in token-ascending order —
    the same fixed summation order as a SQL
    ``list_sum(list(t ORDER BY tid))``, so doubles match bit-for-bit.
    Output: id, n_distinct (BIGINT), entropy (round 6)."""
    def kernel(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        n_per = np.diff(offsets)
        n_docs = len(n_per)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_per)
        order = np.lexsort((values, doc_idx))
        dv, tv = doc_idx[order], values[order]
        if len(tv) == 0:
            # a block of ONLY empty docs: np.r_[True, ...] below would
            # still mint one phantom run and index into the empty arrays
            # (caught by the empty-block smoke grid)
            return pa.table({id_col: batch[id_col].slice(0, 0),
                             "n_distinct": pa.array([], pa.int64()),
                             "entropy": pa.array([], pa.float64())})
        new_run = np.r_[True, (dv[1:] != dv[:-1]) | (tv[1:] != tv[:-1])]
        run_start = np.flatnonzero(new_run)
        c = np.diff(np.append(run_start, len(tv))).astype(np.float64)
        run_doc = dv[run_start]
        n = n_per[run_doc].astype(np.float64)
        p = c / n
        terms = -(p * np.log(p))
        new_doc = np.r_[True, run_doc[1:] != run_doc[:-1]]
        doc_start = np.flatnonzero(new_doc)
        ent = np.add.reduceat(terms, doc_start) if len(terms) else terms
        n_distinct = np.diff(np.append(doc_start, len(run_doc)))
        present = run_doc[doc_start]          # docs with ≥1 token
        out = pa.table({
            id_col: batch[id_col].take(pa.array(present)),
            "n_distinct": pa.array(n_distinct.astype(np.int64)),
            "entropy": pa.array(round6(ent)),
        })
        return out
    return ds.map_batches(kernel, batch_format="pyarrow")


def compression_ratio(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6
                      ) -> ray.data.Dataset:
    """Deflate compression ratio per document — the classic corpus-
    curation redundancy signal (highly repetitive/boilerplate text
    compresses far below natural prose). Deterministic: zlib at a fixed
    level produces identical bytes for identical input everywhere.

    Not SQL-expressible → rows-only driver check; goldens pin the
    ordering (repetitive < natural < random). The per-row call is one C
    deflate per document (the kernel IS the row granularity, like model
    inference); bytes come straight from the Arrow buffer."""
    import zlib

    def kernel(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        raw = col.cast(pa.binary())
        comp = np.fromiter(
            (len(zlib.compress(raw[i].as_py(), level)) for i in range(len(raw))),
            dtype=np.int64, count=len(raw))
        orig = pc.binary_length(raw).to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = comp / np.maximum(orig, 1)
        return pa.table({id_col: batch[id_col],
                         "n_bytes": pa.array(orig),
                         "compressed_bytes": pa.array(comp),
                         "compression_ratio": pa.array(round6(ratio))})
    return ds.map_batches(kernel, batch_format="pyarrow")


def intradoc_repetition(ds: ray.data.Dataset, n: int = 3,
                        vocab_size: int | None = None,
                        tokens_col: str = "tokens",
                        id_col: str = "doc_id") -> ray.data.Dataset:
    """Intra-document repetition: the fraction of a doc's token n-grams
    that belong to an n-gram occurring ≥2 times IN THAT DOC — the
    boilerplate/degenerate-text signal corpus-curation stacks gate on
    (repetitious docs score high). Shuffle-free (per-doc): packed gram
    codes, one lexsort per block, run-length counts, per-doc reduceat.
    Output: id, n_grams, n_dup, dup_ratio (exact-int division)."""
    def kernel(batch: pa.Table) -> pa.Table:
        col = batch[tokens_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(vocab_size if vocab_size is not None
                     else (values.max() + 1 if len(values) else 1))
        n_per = np.diff(offsets)
        n_docs = len(n_per)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_per)
        if len(values) >= n:
            key = values[: len(values) - n + 1].copy()
            row = doc_idx[: len(values) - n + 1]
            same = row == doc_idx[n - 1:]
            for j in range(1, n):
                key = key * V + values[j: len(values) - n + 1 + j]
            key, row = key[same], row[same]
        else:
            key = np.empty(0, np.int64)
            row = np.empty(0, np.int64)
        order = np.lexsort((key, row))
        rs, ks = row[order], key[order]
        if len(ks) == 0:
            # no window fits in any doc of this block: np.r_[True, ...]
            # below would mint one phantom run over the empty arrays
            # (caught by the empty-block smoke grid)
            return pa.table({
                id_col: batch[id_col].slice(0, 0),
                "n_grams": pa.array([], pa.int64()),
                "n_dup": pa.array([], pa.int64()),
                "dup_ratio": pa.array([], pa.float64())})
        new_run = np.r_[True, (rs[1:] != rs[:-1]) | (ks[1:] != ks[:-1])]
        run_start = np.flatnonzero(new_run)
        c = np.diff(np.append(run_start, len(ks))).astype(np.int64)
        run_doc = rs[run_start] if len(run_start) else run_start
        dup_c = np.where(c >= 2, c, 0)
        new_doc = np.r_[True, run_doc[1:] != run_doc[:-1]] \
            if len(run_doc) else np.empty(0, bool)
        doc_start = np.flatnonzero(new_doc)
        n_grams = (np.add.reduceat(c, doc_start)
                   if len(c) else np.empty(0, np.int64))
        n_dup = (np.add.reduceat(dup_c, doc_start)
                 if len(c) else np.empty(0, np.int64))
        present = run_doc[doc_start] if len(run_doc) else doc_start
        return pa.table({
            id_col: batch[id_col].take(pa.array(present)),
            "n_grams": pa.array(n_grams),
            "n_dup": pa.array(n_dup),
            "dup_ratio": pa.array(round6(n_dup / n_grams)
                                  if len(n_grams) else
                                  np.empty(0, np.float64)),
        })
    return ds.map_batches(kernel, batch_format="pyarrow")


def gopher_rules(stats: ray.data.Dataset, *, min_words: int = 20,
                 max_words: int = 80, min_mwl: float = 4.0,
                 max_mwl: float = 4.8,
                 min_stopword_ratio: float = 0.05) -> ray.data.Dataset:
    """Gopher-style quality-rule filter (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", Appendix A heuristics — public method):
    word-count bounds, mean-word-length bounds, stopword-presence
    threshold; a doc passes when ALL rules pass. Consumes the
    ``quality_stats`` output — the comparisons run on doubles computed
    operand-for-operand like the SQL oracle, so the boolean flags are
    engine-stable. Pure per-batch map: no shuffle, no state."""
    def fn(batch: pa.Table) -> pa.Table:
        nw = batch["n_words"].to_numpy(zero_copy_only=False)
        mwl = batch["mean_word_len"].to_numpy(zero_copy_only=False)
        sr = batch["stopword_ratio"].to_numpy(zero_copy_only=False)
        p_wc = (nw >= min_words) & (nw <= max_words)
        p_mwl = (mwl >= min_mwl) & (mwl <= max_mwl)
        p_sw = sr >= min_stopword_ratio
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_words": batch["n_words"],
            "pass_word_count": pa.array(p_wc),
            "pass_word_len": pa.array(p_mwl),
            "pass_stopwords": pa.array(p_sw),
            "passes": pa.array(p_wc & p_mwl & p_sw)})
    return stats.map_batches(fn, batch_format="pyarrow")
