"""Training-batch preparation: sequence packing and deterministic splits.

The reference ships data to per-vendor sinks; a training-data engine
additionally has to lay documents out into fixed-length context windows
("concat-and-chunk" packing) and carve deterministic train/val/test
subsets. Both are pure segmented/vectorized kernels — no state, no
model, SQL-oracle-checkable.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import mulhash
from .temporal import DEFAULT_TEMPORAL_PARTITIONS, partitioned_apply


def pack_sequences(ds: ray.data.Dataset, key: str, order_col: str,
                   len_col: str, context_len: int,
                   num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                   ) -> ray.data.Dataset:
    """Concat-and-chunk packing: within each ``key`` stream ordered by
    ``order_col``, documents are laid end-to-end and cut into
    ``context_len``-token windows; each document gets the bin id and
    offset where it STARTS (``bin_id = excl_cumsum // L``,
    ``bin_offset = excl_cumsum % L`` — documents may straddle bins, the
    standard pretraining layout, not best-fit bin packing).

    One hash-partition shuffle on the key, then an exclusive cumsum per
    segment — O(partitions) Python dispatch. SQL-equivalent:
    ``sum(len) OVER (PARTITION BY key ORDER BY order ROWS UNBOUNDED
    PRECEDING) - len``."""
    L = np.int64(context_len)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, order_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return df.assign(bin_id=np.array([], np.int64),
                             bin_offset=np.array([], np.int64))
        v = df[len_col].to_numpy().astype(np.int64)
        new_key = np.zeros(n, dtype=bool)
        new_key[0] = True
        kv = df[key].to_numpy()
        new_key[1:] = kv[1:] != kv[:-1]
        cs = np.cumsum(v)
        seg_start_idx = np.flatnonzero(new_key)
        seg_len = np.diff(np.r_[seg_start_idx, n])
        base = np.repeat(cs[seg_start_idx] - v[seg_start_idx], seg_len)
        excl = cs - v - base                      # tokens before this doc
        return df.assign(bin_id=excl // L, bin_offset=excl % L)

    return partitioned_apply(ds, [key], kernel, num_partitions=num_partitions)


def chunk_tokens(ds: ray.data.Dataset, tokens_col: str = "tokens",
                 id_col: str = "doc_id", *, size: int = 32,
                 stride: int = 16,
                 emit_tokens: bool = False) -> ray.data.Dataset:
    """Sliding-window chunking of a tokenized corpus (RAG / context-window
    prep): each document explodes into windows of ``size`` tokens starting
    every ``stride`` tokens; the final window is the remainder (shorter
    than ``size``), and a doc with ≤ size tokens yields exactly one chunk.

    Shuffle-free — a pure per-batch segmented numpy explode (integer
    arithmetic only: chunk count = 1 + ceil((n - size)/stride) via
    (n - size + stride - 1) // stride, so a SQL oracle reproduces it
    exactly). Output: (id, chunk_idx, start_tok, n_tok_chunk) and, with
    ``emit_tokens``, the sliced ``tokens`` windows gathered from the flat
    Arrow values buffer (one vectorized fancy-index per batch — the
    output-token-count cost is inherent to overlapping windows).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("chunk_tokens: size and stride must be positive")
    if stride > size:
        # stride > size would skip tokens between windows AND breaks the
        # advance-until-covered count formula (negative remainder windows
        # — caught by the naive-reference fuzz); overlap must be ≥ 0
        raise ValueError("chunk_tokens: stride must be <= size "
                         f"(got stride={stride} > size={size})")

    def fn(batch: pa.Table) -> pa.Table:
        return chunk_batch(batch, tokens_col, id_col, size=size,
                           stride=stride, emit_tokens=emit_tokens)
    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_batch(batch: pa.Table, tokens_col: str, id_col: str, *,
                size: int, stride: int, emit_tokens: bool) -> pa.Table:
    """The per-batch kernel of ``chunk_tokens`` (module-level so the
    naive-reference fuzz can drive it without a Ray dataset)."""
    toks = batch[tokens_col]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.diff(offsets)
    k = np.where(n <= size, 1,
                 1 + (n - size + stride - 1) // stride).astype(np.int64)
    total = int(k.sum())
    doc_idx = np.repeat(np.arange(len(n)), k)
    firsts = np.zeros(len(n), dtype=np.int64)
    np.cumsum(k[:-1], out=firsts[1:])
    chunk_idx = np.arange(total, dtype=np.int64) - firsts[doc_idx]
    start_tok = chunk_idx * stride
    n_chunk = np.minimum(size, n[doc_idx] - start_tok)
    cols = {
        id_col: batch[id_col].take(pa.array(doc_idx)),
        "chunk_idx": pa.array(chunk_idx),
        "start_tok": pa.array(start_tok),
        "n_tok_chunk": pa.array(n_chunk),
    }
    if emit_tokens:
        # flat gather: output token t of chunk c reads values[
        # doc_start + start_tok + t] — built with one repeat/arange
        starts_flat = offsets[doc_idx] + start_tok
        out_off = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(n_chunk, out=out_off[1:])
        within = np.arange(out_off[-1], dtype=np.int64) \
            - np.repeat(out_off[:-1], n_chunk)
        gather = np.repeat(starts_flat, n_chunk) + within
        vals = toks.values.take(pa.array(gather))
        cols[tokens_col] = pa.ListArray.from_arrays(
            pa.array(out_off, type=pa.int32()), vals)
    return pa.table(cols)


def dataset_split(ds: ray.data.Dataset, id_col: str,
                  thresholds: tuple[int, int] = (80, 90),
                  out: str = "split") -> ray.data.Dataset:
    """Deterministic train/val/test assignment from the engine's standard
    integer hash (``(id·2654435761 + 12345) % 100``): < t0 → train,
    < t1 → val, else test. Pure per-batch column append — the split is a
    property of the row, so retries/resumes land every row in the same
    subset (no RNG, no wall clock)."""
    t0, t1 = thresholds
    names = np.array(["train", "val", "test"])

    def fn(batch: pa.Table) -> pa.Table:
        h = mulhash(batch[id_col].to_numpy(zero_copy_only=False), mod=100)
        idx = np.where(h < t0, 0, np.where(h < t1, 1, 2))
        return batch.append_column(out, pa.array(names[idx]))

    return ds.map_batches(fn, batch_format="pyarrow")


def shuffle_shards(ds: ray.data.Dataset, id_col: str, *,
                   num_shards: int = 64, pos_salt: int = 777,
                   num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                   ) -> ray.data.Dataset:
    """Deterministic global shuffle + shard assignment — the export layout
    every pretraining pipeline applies before writing token shards.

    Each row gets ``shard = (id·2654435761 + 12345) % num_shards`` and
    ``pos`` = its 0-based position within the shard under the shuffled
    order ``(h2, id)`` where ``h2 = ((id + pos_salt)·2654435761 + 12345)
    % 1000003`` — a reproducible permutation (retries/resumes land every
    row at the same (shard, pos); re-shuffling per epoch = a new
    ``pos_salt``). The salt is added to the ID BEFORE the multiply: an
    additive post-multiply salt would only shift every h2 by a constant
    (mod M), an order-PRESERVING rotation — epochs would replay the same
    order. No RNG, no wall clock, so a killed export resumes
    byte-identically.

    Scale shape: ONE bounded-tag co-partition shuffle of the SKINNY
    (id, shard, h2) table (the corpus text/tokens never move — the
    assignment is joined back or fed straight to ``PartitionedSink`` as
    the route/order columns); per-partition work is one sort + a
    segmented arange, O(rows/P · log) with zero per-row Python. A global
    ``ds.sort`` would be the naive shape; hash-sharding replaces the
    all-to-all range sort with a bounded exchange exactly like
    ``pack_sequences``. SQL-equivalent: ``row_number() OVER (PARTITION BY
    shard ORDER BY h2, id) - 1``.

    All OTHER input columns pass through unchanged (the op appends
    ``shard``/``pos``), so it composes mid-stream — e.g. on the skinny
    post-filter table of the composed training-prep job."""
    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return (batch
                .append_column("shard", pa.array(mulhash(ids, mod=num_shards)))
                .append_column("_h2",
                               pa.array(mulhash(ids + np.int64(pos_salt)))))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["shard", "_h2", id_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        shard = df["shard"].to_numpy().astype(np.int64)
        idx = np.arange(n, dtype=np.int64)
        starts = np.zeros(n, dtype=bool)
        if n:
            starts[0] = True
            starts[1:] = shard[1:] != shard[:-1]
        start_idx = np.maximum.accumulate(np.where(starts, idx, 0))
        return df.drop(columns=["_h2"]).assign(shard=shard,
                                               pos=idx - start_idx)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return partitioned_apply(tagged, ["shard"], kernel,
                             num_partitions=num_partitions)


def token_budget_sample(ds: ray.data.Dataset, key: str, id_col: str,
                        len_col: str, budgets: dict | int,
                        salt: int = 4242,
                        num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                        ) -> ray.data.Dataset:
    """Token-budgeted mixture construction: per ``key`` (source/domain),
    keep documents in deterministic hash-priority order until the key's
    token budget is exhausted — the "sample a 30B-token mix with these
    domain weights" primitive. A doc is kept iff the budget was not
    already exhausted when its turn came (``excl_cumsum < budget``), so
    the mix can overshoot by at most one document per key.

    Deterministic: priority = mulhash(id), a pure row property — the same
    mix on every retry/resume. One key shuffle + a segmented cumsum.
    ``budgets``: one int for all keys or a per-key dict (missing keys get
    budget 0)."""
    per_key = None if isinstance(budgets, int) else dict(budgets)
    flat = None if per_key is not None else np.int64(budgets)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        df = df.assign(_pri=mulhash(ids, salt=salt))
        df = df.sort_values([key, "_pri", id_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return df.drop(columns=["_pri"])
        v = df[len_col].to_numpy().astype(np.int64)
        kv = df[key].to_numpy()
        new_key = np.zeros(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = kv[1:] != kv[:-1]
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.r_[starts, n])
        cs = np.cumsum(v)
        base = np.repeat(cs[starts] - v[starts], seg_len)
        excl = cs - v - base
        if per_key is not None:
            seg_budget = np.asarray(
                [per_key.get(k, 0) for k in kv[starts]], dtype=np.int64)
            budget = np.repeat(seg_budget, seg_len)
        else:
            budget = flat
        return df[excl < budget].drop(columns=["_pri"])

    return partitioned_apply(ds, [key], kernel, num_partitions=num_partitions)


def temperature_budgets(token_sums: dict, total: int) -> dict:
    """Temperature-scaled (α = 0.5) per-source token budgets — the
    mC4 / XLM-R rebalancing rule p_s ∝ n_s^α that upweights small
    sources relative to their raw token mass, in ALL-INTEGER math so a
    SQL oracle reproduces it bit-exactly:

        w_s = isqrt(n_s)          (= floor(sqrt) — exact in BIGINT)
        budget_s = (total · w_s) // Σ w     (BIGINT floor division)

    ``isqrt`` matches DuckDB's ``CAST(floor(sqrt(n)) AS BIGINT)`` for
    every n < 2^50 (a correctly-rounded double sqrt is within 2^-29 of
    the true root while the nearest non-square root is ≥ ~2^-26 from an
    integer), guarded here so a corpus past that scale fails loudly
    instead of as an opaque oracle hash mismatch (CLAUDE.md
    exact-degeneration rule)."""
    if total < 0:
        raise ValueError("temperature_budgets: total must be >= 0")
    w = {}
    for k, n in token_sums.items():
        n = int(n)
        if n < 0:
            raise ValueError(
                f"temperature_budgets: negative token sum {n} for {k!r} "
                "(loud failure: the SQL oracle's sqrt would diverge)")
        if n >= 1 << 50:
            raise ValueError(
                f"temperature_budgets: token sum {n} for {k!r} >= 2^50; "
                "floor(sqrt(double)) no longer matches isqrt — switch the "
                "oracle to an exact integer sqrt before raising scale")
        w[k] = math.isqrt(n)
    sw = sum(w.values())
    if sw == 0:
        return {k: 0 for k in w}
    return {k: (int(total) * wk) // sw for k, wk in w.items()}


def temperature_mix(ds: ray.data.Dataset, key: str, id_col: str,
                    len_col: str, *, total: int, salt: int = 4242,
                    num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                    ) -> ray.data.Dataset:
    """Temperature-based source mixing (α = 0.5): derive each source's
    token budget from its share of the CORPUS under sqrt damping
    (``temperature_budgets``), then keep documents per source in
    deterministic hash-priority order until that budget is spent
    (``token_budget_sample`` — at-most-one-doc overshoot). This is the
    self-calibrating variant of ``token_budget_sample``: the caller
    names one global token ``total`` and the data decides the split,
    upweighting minority sources exactly as multilingual pretraining
    mixes do.

    Two passes over the input (a tiny per-source sum, then the keep
    filter), so the SKINNY (key, id, len) projection is materialized
    here — pass a pruned table, not the full corpus (same contract as
    ``write_sorted``). The per-source sum is a bounded-cardinality
    driver merge; budgets ride into the keep pass as a small dict."""
    from .aggregate import grouped_aggregate
    ds = ds.materialize()
    agg = grouped_aggregate(ds, keys=[key], value_col=len_col,
                            mode="driver").to_pandas()
    sums = dict(zip(agg[key].tolist(),
                    agg["agg_sum"].astype("int64").tolist()))
    budgets = temperature_budgets(sums, total)
    return token_budget_sample(ds, key, id_col, len_col, budgets,
                               salt=salt, num_partitions=num_partitions)
