"""TF-IDF and BM25 relevance scoring over tokenized documents.

Training-data-pipeline staples the reference lacks (its closest analog is
the fingerprint/aggregation family): corpus statistics (document frequency)
computed distributed, broadcast once as a flat idf array (vocab-bounded —
a BPE vocab is ~50k entries regardless of corpus size, the same contract as
the tokenizer vocabulary), then fully vectorized per-block scoring with no
shuffle at all (each doc's terms are complete within its row).

Float-parity notes (CLAUDE.md): idf math is double ops over exact-int
inputs written operand-for-operand like the SQL oracle; scores are rounded
to 6 decimals AFTER ranking; rankings carry integer/token tie-breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import round6

_LOW32 = np.int64(0xFFFFFFFF)


def _flat_tokens(batch: pa.Table, tokens_col: str):
    """(doc_row_index, token) flat arrays from a list<int32> column —
    buffer reads, no per-row Python."""
    col = batch[tokens_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    n_per = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(n_per), dtype=np.int64), n_per)
    return doc_idx, values, n_per


def corpus_stats(ds: ray.data.Dataset,
                 tokens_col: str = "tokens") -> pa.Table:
    """Document frequency AND total frequency per token in ONE distributed
    pass: per block, a sorted-unique over packed (doc,token) keys yields
    both the per-doc-deduped token list (→ df) and, via a second unique
    over the raw values, the total count (→ freq); the two sorted unique
    token sets are identical so the arrays align without a join. Partials
    merge where the vocab lives (bounded rows — vocab-sized, never
    corpus-sized). Returns (token:int32, df:int64, freq:int64)."""
    def block_stats(batch: pa.Table) -> pa.Table:
        doc_idx, values, _ = _flat_tokens(batch, tokens_col)
        key = np.unique((doc_idx << np.int64(32)) | values)
        t_df, c_df = np.unique(key & _LOW32, return_counts=True)
        t_fr, c_fr = np.unique(values, return_counts=True)
        # same distinct token set, both sorted — aligned by construction
        return pa.table({"token": pa.array(t_df.astype(np.int32)),
                         "_df": pa.array(c_df.astype(np.int64)),
                         "_freq": pa.array(c_fr.astype(np.int64))})

    partials = ds.map_batches(block_stats, batch_format="pyarrow")
    merged = pa.concat_tables(list(partials.iter_batches(batch_format="pyarrow", batch_size=None)),
                              promote_options="default")
    out = merged.group_by("token").aggregate([("_df", "sum"), ("_freq", "sum")])
    return pa.table({"token": out["token"].cast(pa.int32()),
                     "df": out["_df_sum"].cast(pa.int64()),
                     "freq": out["_freq_sum"].cast(pa.int64())})


def doc_frequencies(ds: ray.data.Dataset,
                    tokens_col: str = "tokens") -> pa.Table:
    """Document frequency per token (token:int32, df:int64)."""
    return corpus_stats(ds, tokens_col).select(["token", "df"])


def idf_array(df_table: pa.Table, n_docs: int) -> np.ndarray:
    """Flat idf lookup indexed by token id: ln((N+1)/(df+1)).
    SQL-equivalent: ``ln((N + 1.0) / (df + 1))``."""
    tok = df_table["token"].to_numpy(zero_copy_only=False)
    df = df_table["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    idf = np.zeros(int(tok.max()) + 1 if len(tok) else 1, dtype=np.float64)
    idf[tok] = np.log((n_docs + 1.0) / (df + 1))
    return idf


def tfidf_top_terms(ds: ray.data.Dataset, idf: np.ndarray, k: int = 3,
                    tokens_col: str = "tokens",
                    doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc top-k terms by tf × idf. No shuffle: each doc's terms are
    complete within its block row, so the whole operator is one vectorized
    map_batches (sorted-unique tf counts, idf gather, per-segment rank).
    Ties broken by token id; scores rounded to 6 AFTER ranking."""
    ref = ray.put(idf)

    def block_topk(batch: pa.Table) -> pa.Table:
        idf_arr = ray.get(ref)
        doc_idx, values, _ = _flat_tokens(batch, tokens_col)
        key, tf = np.unique((doc_idx << np.int64(32)) | values,
                            return_counts=True)
        row = (key >> np.int64(32)).astype(np.int64)
        tok = (key & _LOW32).astype(np.int64)
        score = tf.astype(np.float64) * idf_arr[tok]
        order = np.lexsort((tok, -score, row))
        o_row = row[order]
        # rank within each row segment (o_row is grouped)
        seg_start = np.r_[0, np.flatnonzero(np.diff(o_row)) + 1]
        seg_len = np.diff(np.r_[seg_start, len(o_row)])
        rank = np.arange(len(o_row)) - np.repeat(seg_start, seg_len)
        keep = order[rank < k]
        doc_ids = batch[doc_id_col].take(pa.array(row[keep]))
        return pa.table({
            "doc_id": doc_ids,
            "token": pa.array(tok[keep].astype(np.int32)),
            "tf": pa.array(tf[keep].astype(np.int64)),
            "score": pa.array(round6(score[keep])),
        })
    return ds.map_batches(block_topk, batch_format="pyarrow")


def bm25_scores(ds: ray.data.Dataset, query_tokens: np.ndarray,
                df_by_token: dict[int, int], n_docs: int, total_tokens: int,
                k1: float = 1.2, b: float = 0.75,
                tokens_col: str = "tokens", n_tok_col: str = "n_tok",
                doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc BM25 score against a fixed query-term set (Robertson;
    idf = ln((N - df + 0.5)/(df + 0.5) + 1)). One vectorized pass:
    np.isin prune to query terms, sorted-unique tf, per-row reduce.
    Emits only docs with ≥1 query term. dl/avgdl is computed as
    ``dl * N / S`` (exact-int products, one double division) so the SQL
    oracle reproduces the doubles operand-for-operand."""
    q = np.sort(np.asarray(query_tokens, dtype=np.int64))
    idf_q = np.array([
        np.log((n_docs - df_by_token[int(t)] + 0.5)
               / (df_by_token[int(t)] + 0.5) + 1.0) for t in q])
    ref = ray.put((q, idf_q))

    def block_score(batch: pa.Table) -> pa.Table:
        qs, qidf = ray.get(ref)
        doc_idx, values, _ = _flat_tokens(batch, tokens_col)
        sel = np.isin(values, qs)
        doc_idx, values = doc_idx[sel], values[sel]
        key, tf = np.unique((doc_idx << np.int64(32)) | values,
                            return_counts=True)
        row = (key >> np.int64(32)).astype(np.int64)
        tok = (key & _LOW32).astype(np.int64)
        qpos = np.searchsorted(qs, tok)
        dl = batch[n_tok_col].to_numpy(zero_copy_only=False).astype(np.int64)[row]
        tff = tf.astype(np.float64)
        denom = tff + k1 * (1.0 - b + b * (dl * np.int64(n_docs)
                                           / float(total_tokens)))
        pair = qidf[qpos] * (tff * (k1 + 1.0)) / denom
        if len(pair) == 0:
            return pa.table({"doc_id": batch[doc_id_col].slice(0, 0),
                             "score": pa.array([], type=pa.float64())})
        # `row` is ascending (np.unique keys) — per-row sum is one reduceat
        seg_start = np.r_[0, np.flatnonzero(np.diff(row)) + 1]
        out_rows = row[seg_start]
        score = np.add.reduceat(pair, seg_start)
        doc_ids = batch[doc_id_col].take(pa.array(out_rows))
        return pa.table({"doc_id": doc_ids, "score": pa.array(score)})
    return ds.map_batches(block_score, batch_format="pyarrow")


def bigram_counts(ds: ray.data.Dataset,
                  tokens_col: str = "tokens") -> pa.Table:
    """Corpus bigram counts (consecutive token pairs within each doc):
    per-block packed-key sorted-unique, partials merged where the bigram
    table lives. Bounded by DISTINCT observed bigrams (≤ vocab², in
    practice ≪) — the broadcast-model contract; beyond broadcast size,
    swap the scoring lookup for a hash-bucketed join on the packed key.
    Returns (prev:int32, cur:int32, c:int64)."""
    def block(batch: pa.Table) -> pa.Table:
        doc_idx, values, n_per = _flat_tokens(batch, tokens_col)
        if len(values) == 0:
            return pa.table({"prev": pa.array([], pa.int32()),
                             "cur": pa.array([], pa.int32()),
                             "_c": pa.array([], pa.int64())})
        same = doc_idx[:-1] == doc_idx[1:]
        key, c = np.unique((values[:-1][same] << np.int64(32))
                           | values[1:][same], return_counts=True)
        return pa.table({
            "prev": pa.array((key >> np.int64(32)).astype(np.int32)),
            "cur": pa.array((key & _LOW32).astype(np.int32)),
            "_c": pa.array(c.astype(np.int64))})

    partials = ds.map_batches(block, batch_format="pyarrow")
    merged = pa.concat_tables(list(partials.iter_batches(batch_format="pyarrow", batch_size=None)),
                              promote_options="default")
    out = merged.group_by(["prev", "cur"]).aggregate([("_c", "sum")])
    return pa.table({"prev": out["prev"], "cur": out["cur"],
                     "c": out["_c_sum"].cast(pa.int64())})


def bigram_logprob(ds: ray.data.Dataset, bigrams: pa.Table,
                   unigram_freq: np.ndarray, vocab_size: int,
                   tokens_col: str = "tokens",
                   doc_id_col: str = "doc_id",
                   passthrough_cols: list[str] | None = None
                   ) -> ray.data.Dataset:
    """Per-doc add-one-smoothed bigram LM log-likelihood:
    Σ ln((c(prev,cur)+1) / (c(prev)+V)) over consecutive pairs, summed in
    POSITION order (reduceat) so an ordered-list SQL sum reproduces the
    doubles. Bigram table broadcast once (sorted packed keys +
    searchsorted lookup); docs with <2 tokens are omitted.
    ``passthrough_cols`` ride through unchanged (e.g. ``source`` for the
    downstream CCNet per-source perplexity bucketing) — a column gather,
    not a join, so the scored stream keeps its grouping keys without a
    shuffle."""
    extra = list(passthrough_cols or [])
    bkey = ((bigrams["prev"].to_numpy(zero_copy_only=False).astype(np.int64)
             << np.int64(32))
            | bigrams["cur"].to_numpy(zero_copy_only=False).astype(np.int64))
    order = np.argsort(bkey)
    ref = ray.put((bkey[order],
                   bigrams["c"].to_numpy(zero_copy_only=False).astype(np.int64)[order],
                   np.asarray(unigram_freq, dtype=np.int64)))

    def block(batch: pa.Table) -> pa.Table:
        keys, cnts, uni = ray.get(ref)
        doc_idx, values, n_per = _flat_tokens(batch, tokens_col)
        if len(values) == 0:
            cols = {"doc_id": batch[doc_id_col].slice(0, 0),
                    "n_pairs": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64())}
            for c in extra:
                cols[c] = batch[c].slice(0, 0)
            return pa.table(cols)
        same = doc_idx[:-1] == doc_idx[1:]
        prev, cur, row = values[:-1][same], values[1:][same], doc_idx[:-1][same]
        pk = (prev << np.int64(32)) | cur
        pos = np.searchsorted(keys, pk)
        pos = np.minimum(pos, max(len(keys) - 1, 0))
        cb = np.where(keys[pos] == pk, cnts[pos], 0)
        term = np.log((cb + 1.0) / (uni[prev] + vocab_size))
        n_pairs = np.maximum(n_per - 1, 0)
        keep_rows = np.flatnonzero(n_pairs > 0)
        seg = np.r_[0, np.cumsum(n_pairs[keep_rows][:-1])] if len(keep_rows) \
            else np.empty(0, np.int64)
        lp = np.add.reduceat(term, seg.astype(np.int64)) if len(keep_rows) \
            else np.empty(0, np.float64)
        cols = {
            "doc_id": batch[doc_id_col].take(pa.array(keep_rows)),
            "n_pairs": pa.array(n_pairs[keep_rows].astype(np.int64)),
            "logprob": pa.array(lp)}
        for c in extra:
            cols[c] = batch[c].take(pa.array(keep_rows))
        return pa.table(cols)
    return ds.map_batches(block, batch_format="pyarrow")


def frequent_ngrams(ds: ray.data.Dataset, n: int, min_count: int,
                    vocab_size: int, tokens_col: str = "tokens",
                    num_partitions: int = 64) -> np.ndarray:
    """Corpus n-grams occurring ≥ min_count times, as packed BIGINT keys
    (positional base-V encoding — SQL-reproducible via lead()). Distinct
    n-grams are NOT vocab-bounded, so partials merge through a
    hash-partitioned C++ group_by (one bounded-tag shuffle); only the hot
    set (tiny by construction) reaches the driver."""
    V = np.int64(vocab_size)

    def block(batch: pa.Table) -> pa.Table:
        doc_idx, values, _ = _flat_tokens(batch, tokens_col)
        if len(values) < n:
            # schema must match the non-empty branch (incl. _part) or the
            # groupby sort rejects the block mix (caught by the naive fuzz)
            return pa.table({"key": pa.array([], pa.int64()),
                             "_c": pa.array([], pa.int64()),
                             "_part": pa.array([], pa.int32())})
        key = values[: len(values) - n + 1].copy()
        same = doc_idx[: len(values) - n + 1] == doc_idx[n - 1:]
        for j in range(1, n):
            key = key * V + values[j: len(values) - n + 1 + j]
        k, c = np.unique(key[same], return_counts=True)
        t = pa.table({"key": pa.array(k), "_c": pa.array(c.astype(np.int64))})
        part = (k % np.int64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    partials = ds.map_batches(block, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        out = g.group_by("key").aggregate([("_c", "sum")])
        hot = out.filter(pa.compute.greater_equal(out["_c_sum"],
                                                  pa.scalar(min_count)))
        return pa.table({"key": hot["key"],
                         "count": hot["_c_sum"].cast(pa.int64())})

    hot = partials.groupby("_part").map_groups(merge, batch_format="pyarrow")
    keys = np.sort(np.concatenate(
        [b["key"].to_numpy(zero_copy_only=False)
         for b in hot.iter_batches(batch_format="pyarrow", batch_size=None)] or
        [np.empty(0, np.int64)]))
    return keys


def flag_boilerplate(ds: ray.data.Dataset, hot_keys: np.ndarray, n: int,
                     vocab_size: int, tokens_col: str = "tokens",
                     doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc boilerplate/contamination flag: does the doc contain any
    corpus-frequent n-gram? Hot set broadcast once; per batch one packed-
    key construction + sorted membership test + per-row any()."""
    V = np.int64(vocab_size)
    ref = ray.put(np.asarray(hot_keys, dtype=np.int64))

    def block(batch: pa.Table) -> pa.Table:
        hot = ray.get(ref)
        doc_idx, values, n_per = _flat_tokens(batch, tokens_col)
        n_rows = batch.num_rows
        n_hot = np.zeros(n_rows, dtype=np.int64)
        if len(values) >= n and len(hot):
            key = values[: len(values) - n + 1].copy()
            row = doc_idx[: len(values) - n + 1]
            same = row == doc_idx[n - 1:]
            for j in range(1, n):
                key = key * V + values[j: len(values) - n + 1 + j]
            key, row = key[same], row[same]
            pos = np.searchsorted(hot, key)
            pos = np.minimum(pos, len(hot) - 1)
            is_hot = hot[pos] == key
            np.add.at(n_hot, row[is_hot], 1)
        return pa.table({
            "doc_id": batch[doc_id_col],
            "n_hot": pa.array(n_hot),
            "has_boilerplate": pa.array(n_hot > 0)})
    return ds.map_batches(block, batch_format="pyarrow")


def inverted_index(ds: ray.data.Dataset, tokens_col: str = "tokens",
                   id_col: str = "doc_id",
                   num_partitions: int = 64) -> ray.data.Dataset:
    """Distributed inverted-index build: token → sorted posting list of
    doc ids (+ document frequency). The retrieval-side companion of the
    TF-IDF/BM25 scorers.

    Scale shape: per-block the (token, doc) pairs are deduped with one
    ``np.unique`` over packed int64 codes (no Python per row), then ONE
    hash-partition shuffle on the token moves only distinct pairs; each
    partition emits its postings with a segmented ``np.split`` over the
    (token, doc)-sorted arrays. Posting lists are per-token — bounded by
    that token's df, the same contract as any posting store."""
    def block_pairs(batch: pa.Table) -> pa.Table:
        doc_idx, values, _ = _flat_tokens(batch, tokens_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        docs = ids[doc_idx]
        # pack (token, doc) for one-pass distinct; token and doc_id are
        # both < 2^31 by the input contract
        packed = np.unique((values << np.int64(32)) | docs)
        tok = (packed >> np.int64(32)).astype(np.int64)
        doc = (packed & np.int64(0xFFFFFFFF)).astype(np.int64)
        part = (tok % np.int64(num_partitions)).astype(np.int32)
        return pa.table({"token": pa.array(tok), "doc": pa.array(doc),
                         "_part": pa.array(part)})

    pairs = ds.map_batches(block_pairs, batch_format="pyarrow")

    def per_part(t: pa.Table) -> pa.Table:
        tok = t["token"].to_numpy(zero_copy_only=False)
        doc = t["doc"].to_numpy(zero_copy_only=False)
        packed = np.unique((tok << np.int64(32)) | doc)  # cross-block dedup
        tok = (packed >> np.int64(32)).astype(np.int64)
        doc = (packed & np.int64(0xFFFFFFFF)).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        counts = np.diff(np.append(starts, len(tok)))
        postings = pa.ListArray.from_arrays(
            pa.array(np.r_[starts, len(tok)].astype(np.int32)),
            pa.array(doc))
        return pa.table({"token": pa.array(tok[starts]),
                         "postings": postings,
                         "df": pa.array(counts.astype(np.int64))})

    return pairs.groupby("_part").map_groups(per_part, batch_format="pyarrow")


def contamination_flags(corpus: ray.data.Dataset,
                        benchmark: ray.data.Dataset, n: int,
                        vocab_size: int, tokens_col: str = "tokens",
                        num_partitions: int = 64) -> ray.data.Dataset:
    """Benchmark-contamination check (training-data hygiene): flag every
    corpus document containing ANY n-gram that appears in the benchmark
    set. The benchmark's distinct n-grams are collected with the same
    hash-partitioned merge as `frequent_ngrams` (min_count=1) and
    broadcast once; the corpus pass is the `flag_boilerplate` membership
    kernel — the corpus itself never shuffles."""
    grams = frequent_ngrams(benchmark, n=n, min_count=1,
                            vocab_size=vocab_size, tokens_col=tokens_col,
                            num_partitions=num_partitions)
    out = flag_boilerplate(corpus, grams, n=n, vocab_size=vocab_size,
                           tokens_col=tokens_col)
    return out.map_batches(
        lambda t: t.rename_columns(["doc_id", "n_shared", "contaminated"]),
        batch_format="pyarrow")


def cross_source_overlap(ds: ray.data.Dataset, source_ids: dict,
                         tokens_col: str = "tokens",
                         source_col: str = "source",
                         num_partitions: int = 64):
    """Vocabulary overlap between every pair of sources (corpus
    analytics / contamination triage): Jaccard of the distinct-token sets
    per source pair.

    Scale shape: sources are bounded (≤64 here — one uint64 bitmask), so
    per partition the distinct (token, source) pairs collapse to one
    BITMASK PER TOKEN (``bitwise_or.reduceat`` over the token-sorted
    runs) and only (mask, count) partials — at most 2^|S| but practically
    a handful — reach the driver. Pair intersections then expand from the
    mask counts; no token ever travels twice."""
    import pandas as _pd

    ref = ray.put(source_ids)

    def block_masks(batch: pa.Table) -> pa.Table:
        sid_map = ray.get(ref)
        doc_idx, values, _ = _flat_tokens(batch, tokens_col)
        src = batch[source_col].to_pylist()
        sids = np.asarray([sid_map[s] for s in src], dtype=np.int64)
        bit = np.uint64(1) << sids[doc_idx].astype(np.uint64)
        order = np.argsort(values, kind="mergesort")
        tv, bv = values[order], bit[order]
        starts = np.flatnonzero(np.r_[True, tv[1:] != tv[:-1]])
        masks = np.bitwise_or.reduceat(bv, starts) if len(tv) else bv
        t = pa.table({"token": pa.array(tv[starts]),
                      "mask": pa.array(masks.view(np.int64))})
        part = (tv[starts] % np.int64(num_partitions)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    partials = ds.map_batches(block_masks, batch_format="pyarrow")

    def merge_part(g: pa.Table) -> pa.Table:
        tok = g["token"].to_numpy(zero_copy_only=False)
        mk = g["mask"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(tok, kind="mergesort")
        tv, bv = tok[order], mk[order]
        starts = np.flatnonzero(np.r_[True, tv[1:] != tv[:-1]])
        masks = np.bitwise_or.reduceat(bv, starts) if len(tv) else bv
        um, cnt = np.unique(masks, return_counts=True)
        return pa.table({"mask": pa.array(um.view(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    mask_counts = (partials.groupby("_part")
                   .map_groups(merge_part, batch_format="pyarrow")
                   .to_pandas())
    agg = mask_counts.groupby("mask", as_index=False)["n"].sum()
    masks = agg["mask"].to_numpy().view(np.uint64)
    cnts = agg["n"].to_numpy().astype(np.int64)
    S = len(source_ids)
    present = (masks[:, None] >> np.arange(S, dtype=np.uint64)) & np.uint64(1)
    present = present.astype(bool)                     # (n_masks, S)
    sizes = (present * cnts[:, None]).sum(axis=0)      # |A| per source
    inv = {v: k for k, v in source_ids.items()}
    rows = []
    for a in range(S):
        for b in range(a + 1, S):
            inter = int(cnts[present[:, a] & present[:, b]].sum())
            if inter == 0:
                continue
            union = int(sizes[a] + sizes[b] - inter)
            rows.append((inv[a], inv[b], inter,
                         round6(inter / union)))
    return _pd.DataFrame(rows, columns=["src_a", "src_b", "inter", "jaccard"])


def dsir_weights(ds: ray.data.Dataset, vocab_size: int,
                 n_buckets: int = 4096, target_mod: int = 7,
                 target_rem: int = 3, tokens_col: str = "tokens",
                 doc_id_col: str = "doc_id", source_col: str = "source",
                 num_partitions: int = 16) -> ray.data.Dataset:
    """DSIR-style importance weights over hashed bigram features
    (Data Selection via Importance Resampling, Xie et al. 2023 — public
    method). Feature bucket = ``(prev·V + cur) % B`` (positional packing,
    SQL-reproducible); target/raw bag-of-features multinomials with
    add-one smoothing; per-doc log importance weight
    ``Σ ln p̂_target(b) − ln p̂_raw(b)`` summed in POSITION order so an
    ordered-list SQL sum reproduces the doubles (CLAUDE.md float rules).

    Target membership is a pure row property (``src_num % mod == rem``) —
    deterministic and retry-stable, like the routing hash.

    Scale shape: per-block counts collapse to ≤2·B rows via one
    ``np.unique`` on the packed (bucket, flag) key; partials merge through
    a hash-partitioned C++ ``group_by`` (bounded-tag exchange, same shape
    as ``frequent_ngrams``); only the dense 2×B count table reaches the
    driver, and the per-bucket log-ratio array (B doubles) is broadcast
    once for the shuffle-free scoring pass. Two passes over the token
    table — recompute, never materialize, at corpus scale.

    Closest reference surface: the fingerprint-frequency aggregation
    family (``processor/aggregationprocessor``); DSIR itself is
    beyond-reference training-data tooling.
    """
    import pyarrow.compute as pc

    V = np.int64(vocab_size)
    B = np.int64(n_buckets)

    def _pair_buckets(batch: pa.Table):
        doc_idx, values, n_per = _flat_tokens(batch, tokens_col)
        if len(values) == 0:
            return None
        same = doc_idx[:-1] == doc_idx[1:]
        prev, cur = values[:-1][same], values[1:][same]
        row = doc_idx[:-1][same]
        return (prev * V + cur) % B, row, n_per

    def block_counts(batch: pa.Table) -> pa.Table:
        empty = pa.table({"bucket": pa.array([], pa.int32()),
                          "flag": pa.array([], pa.int32()),
                          "_c": pa.array([], pa.int64()),
                          "_part": pa.array([], pa.int32())})
        p = _pair_buckets(batch)
        if p is None:
            return empty
        bucket, row, _ = p
        src = pc.cast(pc.utf8_slice_codeunits(batch[source_col], 3, 64),
                      pa.int64()).to_numpy(zero_copy_only=False)
        t = ((src % np.int64(target_mod)) == target_rem).astype(np.int64)
        key = (bucket << np.int64(1)) | t[row]
        k, c = np.unique(key, return_counts=True)
        bk = k >> np.int64(1)
        return pa.table({
            "bucket": pa.array(bk.astype(np.int32)),
            "flag": pa.array((k & np.int64(1)).astype(np.int32)),
            "_c": pa.array(c.astype(np.int64)),
            "_part": pa.array((bk % np.int64(num_partitions)).astype(np.int32))})

    partials = ds.map_batches(block_counts, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        out = g.group_by(["bucket", "flag"]).aggregate([("_c", "sum")])
        return pa.table({"bucket": out["bucket"], "flag": out["flag"],
                         "c": out["_c_sum"].cast(pa.int64())})

    merged = list(partials.groupby("_part")
                  .map_groups(merge, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow", batch_size=None))
    counts = (pa.concat_tables(merged, promote_options="default") if merged
              else pa.table({"bucket": pa.array([], pa.int32()),
                             "flag": pa.array([], pa.int32()),
                             "c": pa.array([], pa.int64())}))

    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    bk = counts["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    fl = counts["flag"].to_numpy(zero_copy_only=False)
    cc = counts["c"].to_numpy(zero_copy_only=False)
    np.add.at(cr, bk, cc)
    tm = fl == 1
    np.add.at(ct, bk[tm], cc[tm])
    nt, nr = int(ct.sum()), int(cr.sum())
    # operand-for-operand with the oracle: ln((c+1.0)/(N+B)) both sides
    term = (np.log((ct + 1.0) / float(nt + n_buckets))
            - np.log((cr + 1.0) / float(nr + n_buckets)))
    ref = ray.put(term)

    def block_score(batch: pa.Table) -> pa.Table:
        terms = ray.get(ref)
        p = _pair_buckets(batch)
        if p is None:
            return pa.table({doc_id_col: batch[doc_id_col].slice(0, 0),
                             "n_pairs": pa.array([], pa.int64()),
                             "log_w": pa.array([], pa.float64())})
        bucket, _, n_per = p
        vals = terms[bucket]
        n_pairs = np.maximum(n_per - 1, 0)
        keep = np.flatnonzero(n_pairs > 0)
        seg = (np.r_[0, np.cumsum(n_pairs[keep][:-1])].astype(np.int64)
               if len(keep) else np.empty(0, np.int64))
        lw = (np.add.reduceat(vals, seg) if len(keep)
              else np.empty(0, np.float64))
        return pa.table({doc_id_col: batch[doc_id_col].take(pa.array(keep)),
                         "n_pairs": pa.array(n_pairs[keep].astype(np.int64)),
                         "log_w": pa.array(lw)})

    return ds.map_batches(block_score, batch_format="pyarrow")


def dup_ngram_fraction(ds: ray.data.Dataset, hot_keys: np.ndarray, n: int,
                       vocab_size: int, tokens_col: str = "tokens",
                       doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """Per-doc duplicated-n-gram fraction — the cross-document substring
    duplication metric of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", exact-substring variant at n-gram
    granularity). ``hot_keys`` = packed n-gram keys with corpus count ≥ 2
    (from ``frequent_ngrams(min_count=2)`` — broadcast once; the dup set
    is the rare case). One packed-key construction + sorted membership
    test per batch; fraction = exact-int division (double parity).

    Positional base-V packing must fit BIGINT in BOTH engines (DuckDB
    errors on overflow, numpy wraps): asserted here. Beyond that bound,
    swap the packing for a rolling hash (parity then becomes rows-only).

    Output: (doc_id, n_grams:int64, n_dup:int64, dup_frac:float64) —
    docs with fewer than ``n`` tokens are omitted.
    """
    V = np.int64(vocab_size)
    if vocab_size ** n >= 2 ** 63:
        raise ValueError("base-V packed n-gram key overflows int64; "
                         "use a rolling hash for this (V, n)")
    ref = ray.put(np.sort(np.asarray(hot_keys, dtype=np.int64)))

    def block(batch: pa.Table) -> pa.Table:
        hot = ray.get(ref)
        doc_idx, values, n_per = _flat_tokens(batch, tokens_col)
        n_rows = batch.num_rows
        n_dup = np.zeros(n_rows, dtype=np.int64)
        if len(values) >= n and len(hot):
            key = values[: len(values) - n + 1].copy()
            row = doc_idx[: len(values) - n + 1]
            same = row == doc_idx[n - 1:]
            for j in range(1, n):
                key = key * V + values[j: len(values) - n + 1 + j]
            key, row = key[same], row[same]
            pos = np.searchsorted(hot, key)
            pos = np.minimum(pos, len(hot) - 1)
            np.add.at(n_dup, row[hot[pos] == key], 1)
        n_grams = np.maximum(n_per - (n - 1), 0)
        keep = np.flatnonzero(n_grams > 0)
        frac = (n_dup[keep] * 1.0) / n_grams[keep]
        return pa.table({
            doc_id_col: batch[doc_id_col].take(pa.array(keep)),
            "n_grams": pa.array(n_grams[keep].astype(np.int64)),
            "n_dup": pa.array(n_dup[keep]),
            "dup_frac": pa.array(frac)})
    return ds.map_batches(block, batch_format="pyarrow")


def remove_dup_spans(ds: ray.data.Dataset, hot_keys: np.ndarray, n: int,
                     vocab_size: int, tokens_col: str = "tokens",
                     doc_id_col: str = "doc_id") -> ray.data.Dataset:
    """Exact-substring dedup REMOVAL (Lee et al. 2022, the ExactSubstr
    edit): every token position covered by ANY n-gram window whose corpus
    occurrence count ≥ 2 is cut. ``dup_ngram_fraction`` measures the
    duplication; this operator applies the edit.

    Coverage is an interval union computed with a difference array +
    cumsum — O(tokens) per block, no per-window loop. Doc boundaries need
    no special casing: the ``same`` mask admits only windows fully inside
    one doc, so every +1 written at a window start s is cancelled by its
    −1 at s+n, which lies at or before that doc's end+1 in the flat
    layout — the running sum is back to 0 before the next doc's first
    position.

    Output per doc: (doc_id, n_tok, n_removed, n_kept, kept_tok_sum).
    ``kept_tok_sum`` is the exact BIGINT sum of SURVIVING token ids — a
    positional checksum the SQL oracle recomputes independently, proving
    WHICH positions were cut rather than just how many (CLAUDE.md exact-
    int parity rule). Same packed-key contract as ``frequent_ngrams`` /
    ``dup_ngram_fraction``: base-V positional encoding must fit BIGINT in
    both engines.
    """
    V = np.int64(vocab_size)
    if vocab_size ** n >= 2 ** 63:
        raise ValueError("base-V packed n-gram key overflows int64; "
                         "use a rolling hash for this (V, n)")
    ref = ray.put(np.sort(np.asarray(hot_keys, dtype=np.int64)))

    def block(batch: pa.Table) -> pa.Table:
        hot = ray.get(ref)
        doc_idx, values, n_per = _flat_tokens(batch, tokens_col)
        n_rows = batch.num_rows
        covered = np.zeros(len(values), dtype=bool)
        if len(values) >= n and len(hot):
            key = values[: len(values) - n + 1].copy()
            row = doc_idx[: len(values) - n + 1]
            same = row == doc_idx[n - 1:]
            for j in range(1, n):
                key = key * V + values[j: len(values) - n + 1 + j]
            cand = np.flatnonzero(same)
            k = key[cand]
            pos = np.searchsorted(hot, k)
            pos = np.minimum(pos, len(hot) - 1) if len(hot) else pos
            dup_starts = cand[hot[pos] == k] if len(hot) else cand[:0]
            if len(dup_starts):
                diff = np.zeros(len(values) + 1, dtype=np.int64)
                np.add.at(diff, dup_starts, 1)
                np.add.at(diff, dup_starts + n, -1)
                covered = np.cumsum(diff[:-1]) > 0
        kept_mask = ~covered
        n_removed = np.bincount(doc_idx[covered],
                                minlength=n_rows).astype(np.int64)
        kept_sum = np.zeros(n_rows, dtype=np.int64)
        # exact-int accumulation (np.add.at on int64; no float round-trip)
        np.add.at(kept_sum, doc_idx[kept_mask], values[kept_mask])
        n_tok = n_per.astype(np.int64)
        return pa.table({
            doc_id_col: batch[doc_id_col],
            "n_tok": pa.array(n_tok),
            "n_removed": pa.array(n_removed),
            "n_kept": pa.array(n_tok - n_removed),
            "kept_tok_sum": pa.array(kept_sum)})
    return ds.map_batches(block, batch_format="pyarrow")
