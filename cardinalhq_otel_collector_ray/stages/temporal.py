"""Temporal / streaming-shaped operators over keyed, time-ordered streams.

Covers the reference distribution's temporal processor vocabulary
(``distribution/components.go:120-133``): cumulativetodelta,
deltatocumulative, deltatorate, logdedup (interval dedup of identical
bodies with count), and session windowing (tailsampling-style per-key
temporal grouping).

Ray-Data-native shape (scale-safe): ONE shuffle to hash-partitioned blocks
(``_part = hash(keys) % P`` — P bounded, independent of key cardinality),
then a **segmented vectorized kernel per partition**: sort the partition by
(keys, ts, tiebreak) once and compute every per-key window function with
numpy over key-change boundaries. Python dispatch is O(P), never O(keys) —
at 10^9 users the old ``groupby(keys).map_groups`` shape would be 10^9
Python calls; this is ~P ≈ blocks.

The per-key ordering assumption is the ONLY partitioning assumption; a
partition holds every row of each key hashed into it (same contract as the
reference's per-instance aggregation state, SURVEY §3.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import table_key_hash as _key_hash

DEFAULT_TEMPORAL_PARTITIONS = 64


def partitioned_apply(ds: ray.data.Dataset, keys: list[str], kernel,
                      num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                      ) -> ray.data.Dataset:
    """Hash-partition by ``keys`` and run ``kernel(pandas_df)`` ONCE per
    partition (all rows of a key land in one partition).

    ``num_partitions`` bounds Python dispatch; scale it with cluster size
    (tasks), NOT key cardinality — each partition must fit a worker's heap
    (rows/P per task), the same contract as any keyed shuffle stage.
    """
    def add_part(batch: pa.Table) -> pa.Table:
        h = _key_hash(batch, keys)
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("_tpart", pa.array(part))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return kernel(df.drop(columns=["_tpart"]))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_tpart").map_groups(per_part, batch_format="pandas"))


def _segment_starts(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Boolean mask: True at the first row of each key run (df pre-sorted
    by keys)."""
    n = len(df)
    new = np.zeros(n, dtype=bool)
    if n == 0:
        return new
    new[0] = True
    for k in keys:
        v = df[k].to_numpy()
        new[1:] |= v[1:] != v[:-1]
    return new


def cumulative_to_delta(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                        value_col: str, out: str = "delta",
                        tiebreak_cols: list[str] | None = None,
                        num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                        ) -> ray.data.Dataset:
    """delta[i] = value[i] - value[i-1] per key, time-ordered; first row per
    key yields null (cumulativetodelta semantics: no emission before a
    baseline exists). Segmented diff: one numpy pass per partition."""
    order = [ts_col] + (tiebreak_cols or [])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order, kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy().astype(np.float64)
        d = np.empty(len(v), dtype=np.float64)
        if len(v):
            d[0] = np.nan
            d[1:] = v[1:] - v[:-1]
            d[_segment_starts(df, keys)] = np.nan
        df[out] = d
        return df
    return partitioned_apply(ds, keys, kernel, num_partitions)


def delta_to_cumulative(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                        value_col: str, out: str = "cumulative",
                        tiebreak_cols: list[str] | None = None,
                        num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                        ) -> ray.data.Dataset:
    """Running sum per key, time-ordered (deltatocumulativeprocessor,
    ``distribution/components.go:122``). Segmented cumsum: full-partition
    cumsum minus the running total at each key's first row — exact for int
    inputs (dtype preserved, BIGINT parity with the SQL oracle)."""
    order = [ts_col] + (tiebreak_cols or [])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order, kind="mergesort").reset_index(drop=True)
        v = df[value_col].to_numpy()
        if len(v):
            c = np.cumsum(v)
            new = _segment_starts(df, keys)
            starts_idx = np.flatnonzero(new)
            seg_id = np.cumsum(new) - 1
            base = (c[starts_idx] - v[starts_idx])[seg_id]
            df[out] = c - base
        else:
            df[out] = v
        return df
    return partitioned_apply(ds, keys, kernel, num_partitions)


def delta_to_rate(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                  value_col: str, out: str = "rate",
                  ts_unit_per_sec: float = 1000.0,
                  tiebreak_cols: list[str] | None = None,
                  num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                  ) -> ray.data.Dataset:
    """rate[i] = value[i] / (ts[i] - ts[i-1] in seconds) per key (deltatorate)."""
    order = [ts_col] + (tiebreak_cols or [])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order, kind="mergesort").reset_index(drop=True)
        ts = df[ts_col].to_numpy().astype(np.float64)
        v = df[value_col].to_numpy().astype(np.float64)
        dt = np.empty(len(ts), dtype=np.float64)
        if len(ts):
            dt[0] = np.nan
            dt[1:] = (ts[1:] - ts[:-1]) / ts_unit_per_sec
            dt[_segment_starts(df, keys)] = np.nan
        df[out] = v / dt
        return df
    return partitioned_apply(ds, keys, kernel, num_partitions)


def interval_dedup(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                   interval_ms: int,
                   tiebreak_cols: list[str] | None = None,
                   num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                   ) -> ray.data.Dataset:
    """logdedupprocessor: within each (keys, interval) keep the FIRST record
    (min (ts, *tiebreak_cols) — a deterministic total order) and attach
    ``dedup_count`` = number of collapsed records.

    Two-phase: per-batch first+count pre-combine (each block contributes ≤1
    row per group — the skew defense), then ONE pandas groupby per hash
    partition for the final combine (no per-group Python dispatch).

    The pre-combine is pure Arrow — stable ``sort_indices`` plus a
    single-threaded ``group_by`` "first"/"count_all" (single-threaded
    because "first" is scan-order-sensitive) — so WIDE input blocks shrink
    before any pandas conversion; only the skinny partials pay the pandas
    hop in the final combine."""
    import pyarrow.compute as pc
    order = [ts_col] + (tiebreak_cols or [])
    group_cols = keys + ["_interval"]

    def precombine(t: pa.Table) -> pa.Table:
        ts = t[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        v = ts.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        t = t.append_column(
            "_interval", pa.array(np.floor_divide(v, interval_ms) * interval_ms))
        t = t.take(pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in order]))
        other = [c for c in t.column_names if c not in group_cols]
        agg = t.group_by(group_cols, use_threads=False).aggregate(
            [(c, "first") for c in other] + [([], "count_all")])
        agg = agg.rename_columns(group_cols + other + ["dedup_count"])
        # keep the original column order (+_interval, +dedup_count): block
        # schemas must agree for the downstream hash-partition union
        return agg.select(t.column_names + ["dedup_count"])

    def combine_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(group_cols + order, kind="mergesort")
        g = df.groupby(group_cols, sort=False, as_index=False)
        first = g.first()
        first["dedup_count"] = g["dedup_count"].sum()["dedup_count"].values
        return first

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    return partitioned_apply(partials, group_cols, combine_part, num_partitions)


def sliding_window_aggregate(ds: ray.data.Dataset, keys: list[str],
                             ts_col: str, value_col: str, *,
                             window_ms: int, hop_ms: int) -> ray.data.Dataset:
    """Sliding (hopping) event-time windows — a windowed aggregate Ray Data
    has no primitive for. Composition: each record EXPLODES into the
    ``window_ms / hop_ms`` windows that contain it (vectorized repeat),
    then the standard two-phase groupby aggregates per (window_start, keys).
    Output: keys..., window_start, n, sum. Window w covers
    [w, w + window_ms); records explode to w = ts//hop*hop - k*hop for
    k < window/hop. SQL-oracle-able via generate_series explode.
    """
    assert window_ms % hop_ms == 0
    k = window_ms // hop_ms

    def explode(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ts)
        base = (ts // hop_ms) * hop_ms
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        offsets = np.tile(np.arange(k, dtype=np.int64) * hop_ms, n)
        window_start = np.repeat(base, k) - offsets
        keep = window_start >= 0
        rep = batch.take(pa.array(idx[keep]))
        return rep.append_column("window_start", pa.array(window_start[keep]))

    from .aggregate import grouped_aggregate
    exploded = ds.map_batches(explode, batch_format="pyarrow")
    # window × key cardinality is mid-range (grows with the corpus time
    # span): partitioned C++ merge — distributed, no Aggregate-op overhead
    agg = grouped_aggregate(exploded, keys=keys + ["window_start"],
                            value_col=value_col, mode="partitioned")

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in keys + ["window_start"]}
        cols["n"] = batch["agg_count"].cast(pa.int64())
        cols["sum"] = batch["agg_sum"].cast(pa.int64())
        return pa.table(cols)
    return agg.map_batches(finalize, batch_format="pyarrow")


def asof_join_last_event(ds: ray.data.Dataset, key: str, ts_col: str,
                         left_filter, right_filter,
                         out: str = "asof_ts",
                         num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                         ) -> ray.data.Dataset:
    """Per-key as-of join within one stream: for every LEFT record, the
    greatest RIGHT timestamp ≤ its own. ONE ``pd.merge_asof(by=key)`` call
    per hash partition — the per-key semantics come from ``by=``, not from
    per-key Python dispatch. ``left_filter``/``right_filter``: pandas-mask
    callables selecting the two sides. Null when no prior right event."""
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        left = df[left_filter(df)]
        right = df[right_filter(df)][[key, ts_col]].rename(columns={ts_col: out})
        if len(left) == 0:
            return left.assign(**{out: pd.Series([], dtype="float64")})
        if len(right) == 0:
            return left.assign(**{out: np.nan})
        return pd.merge_asof(left, right, left_on=ts_col, right_on=out,
                             by=key, direction="backward")
    return partitioned_apply(ds, [key], kernel, num_partitions)


def sessionize(ds: ray.data.Dataset, key: str, ts_col: str, gap_ms: int,
               agg_cols: dict[str, str] | None = None,
               num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
               ) -> ray.data.Dataset:
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_ms``. Emits one row per session:
    key, session_id (0-based per key), session_start, session_end, n_events
    (+ optional ``{col: 'sum'}`` aggregates).

    Fully segmented-vectorized: session boundaries, per-key session ids and
    per-session aggregates all come from numpy over the partition-sorted
    arrays (``reduceat`` for sums) — zero per-key Python calls."""
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        ts = df[ts_col].to_numpy().astype(np.int64)
        newkey = _segment_starts(df, [key])
        newsess = newkey.copy()
        if n:
            newsess[1:] |= (ts[1:] - ts[:-1]) > gap_ms
        gsid = np.cumsum(newsess) - 1          # partition-global session idx
        key_first_gsid = gsid[np.flatnonzero(newkey)]
        key_seg = np.cumsum(newkey) - 1
        sid = gsid - key_first_gsid[key_seg]   # 0-based per key
        starts = np.flatnonzero(newsess)
        ends = np.append(starts[1:], n) - 1
        out = pd.DataFrame({
            key: df[key].to_numpy()[starts],
            "session_id": sid[starts].astype(np.int64),
            "session_start": ts[starts],
            "session_end": ts[ends],
            "n_events": np.diff(np.append(starts, n)).astype(np.int64),
        })
        for col, how in (agg_cols or {}).items():
            v = df[col].to_numpy()
            if how == "sum":
                out[f"sum_{col}"] = np.add.reduceat(v, starts) if n else v
            else:  # pragma: no cover - only sum is used today
                out[f"{how}_{col}"] = [getattr(np, how)(v[s:e + 1])
                                       for s, e in zip(starts, ends)]
        return out
    return partitioned_apply(ds, [key], kernel, num_partitions)


def funnel_match(ds: ray.data.Dataset, key: str, ts_col: str, type_col: str,
                 first_step: str, second_step: str, window_ms: int,
                 num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                 ) -> ray.data.Dataset:
    """Two-step event-time funnel per key (the groupbytrace / sessions
    analysis shape, components.go:129): for each key, find the FIRST
    ``first_step`` event and the FIRST ``second_step`` event at or after
    it within ``window_ms``. Emits one row per key that completed the
    funnel: key, first_a_ms, first_b_ms.

    Scale shape: one hash-partition shuffle on the key, then a segmented
    numpy kernel per partition — masked ``minimum.reduceat`` over the
    key-sorted timestamp array, zero per-key Python dispatch. Conditions
    compare timestamp VALUES only (``b_ts >= first_a``), so duplicate
    timestamps cannot make the result order-dependent."""
    inf = np.iinfo(np.int64).max

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return pd.DataFrame({key: df[key],
                                 "first_a_ms": np.array([], np.int64),
                                 "first_b_ms": np.array([], np.int64)})
        ts = df[ts_col].to_numpy().astype(np.int64)
        et = df[type_col].to_numpy()
        newkey = _segment_starts(df, [key])
        starts = np.flatnonzero(newkey)
        seg_len = np.diff(np.append(starts, n))
        ta = np.where(et == first_step, ts, inf)
        first_a = np.minimum.reduceat(ta, starts)
        row_first_a = np.repeat(first_a, seg_len)
        # subtraction form avoids inf + window overflow
        b_ok = ((et == second_step) & (row_first_a != inf)
                & (ts >= row_first_a) & (ts - row_first_a <= window_ms))
        tb = np.where(b_ok, ts, inf)
        first_b = np.minimum.reduceat(tb, starts)
        done = (first_a != inf) & (first_b != inf)
        return pd.DataFrame({
            key: df[key].to_numpy()[starts[done]],
            "first_a_ms": first_a[done],
            "first_b_ms": first_b[done],
        })

    return partitioned_apply(ds, [key], kernel, num_partitions)


def retention_cohorts(ds: ray.data.Dataset, user_col: str, ts_col: str,
                      bucket_ms: int,
                      num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                      ) -> ray.data.Dataset:
    """Cohort retention pairs: each user joins the cohort of their FIRST
    activity period (``ts // bucket_ms``); emit one (cohort_ms,
    active_ms) row per distinct (user, period). Counting the pairs per
    cell yields the classic retention matrix.

    One hash-partition shuffle on the user, then a segmented kernel: the
    (user, ts)-sorted stream gives distinct periods as run boundaries and
    the cohort as each segment's first period — no per-user Python. The
    output is ≤ users × periods rows (the matrix's own mass), so the
    follow-up count aggregate is bounded."""
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return pd.DataFrame({user_col: df[user_col],
                                 "cohort_ms": np.array([], np.int64),
                                 "active_ms": np.array([], np.int64)})
        ts = df[ts_col].to_numpy().astype(np.int64)
        period = ts // np.int64(bucket_ms)
        newkey = _segment_starts(df, [user_col])
        seg_start_idx = np.flatnonzero(newkey)
        seg_len = np.diff(np.append(seg_start_idx, n))
        cohort = np.repeat(period[seg_start_idx], seg_len)
        new_pair = newkey.copy()
        new_pair[1:] |= period[1:] != period[:-1]
        keep = np.flatnonzero(new_pair)
        return pd.DataFrame({
            user_col: df[user_col].to_numpy()[keep],
            "cohort_ms": cohort[keep] * np.int64(bucket_ms),
            "active_ms": period[keep] * np.int64(bucket_ms),
        })

    return partitioned_apply(ds, [user_col], kernel, num_partitions)


def funnel_steps(ds: ray.data.Dataset, key: str, ts_col: str, type_col: str,
                 steps: list[str], window_ms: int,
                 num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                 ) -> ray.data.Dataset:
    """k-step event-time funnel per key: the FIRST step-1 event, then for
    each later step the first matching event at-or-after the previous
    step's time and within ``window_ms`` of step 1. Emits one row per key
    that reached step 1: key, reached (deepest step index, 1-based) and
    ``t_1..t_k`` (-1 once unreached).

    Same segmented shape as `funnel_match`: one key shuffle, then k−1
    masked ``minimum.reduceat`` passes per partition — vectorized per
    STEP, never per key."""
    inf = np.iinfo(np.int64).max

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            out = {key: df[key].to_numpy()}
            out["reached"] = np.array([], np.int64)
            for i in range(len(steps)):
                out[f"t_{i+1}"] = np.array([], np.int64)
            return pd.DataFrame(out)
        ts = df[ts_col].to_numpy().astype(np.int64)
        et = df[type_col].to_numpy()
        newkey = _segment_starts(df, [key])
        starts = np.flatnonzero(newkey)
        seg_len = np.diff(np.append(starts, n))
        t_steps = []
        prev = None
        t1_rows = None
        for i, step in enumerate(steps):
            is_s = et == step
            if i == 0:
                cand = np.where(is_s, ts, inf)
            else:
                prev_rows = np.repeat(prev, seg_len)
                ok = (is_s & (prev_rows != inf) & (ts >= prev_rows)
                      & (t1_rows != inf) & (ts - np.where(
                          t1_rows == inf, 0, t1_rows) <= window_ms))
                cand = np.where(ok, ts, inf)
            cur = np.minimum.reduceat(cand, starts)
            if i == 0:
                t1_rows = np.repeat(cur, seg_len)
            t_steps.append(cur)
            prev = cur
        reached_mask = np.stack([t != inf for t in t_steps])  # (k, segs)
        has_first = reached_mask[0]
        reached = reached_mask.cumprod(axis=0).sum(axis=0).astype(np.int64)
        out = {key: df[key].to_numpy()[starts[has_first]],
               "reached": reached[has_first]}
        for i, t in enumerate(t_steps):
            out[f"t_{i+1}"] = np.where(t == inf, -1, t)[has_first]
        return pd.DataFrame(out)

    return partitioned_apply(ds, [key], kernel, num_partitions)


def followed_by_counts(ds: ray.data.Dataset, key: str, ts_col: str,
                       type_col: str, first_step: str, second_step: str,
                       window_ms: int,
                       num_partitions: int = DEFAULT_TEMPORAL_PARTITIONS
                       ) -> ray.data.Dataset:
    """Temporal self-join pair counting: per key, the number of
    (first_step, second_step) event PAIRS with ``0 ≤ t_b − t_a ≤
    window_ms`` — the "A followed by B" pattern-mining primitive (the
    funnel counts only the first completion; this counts every pair).

    One key shuffle, then a fully vectorized per-partition kernel: the
    partition's B-timestamps form one sorted array with per-segment
    offsets folded into the VALUES (segment_id·2⁴⁴ + ts), so a single
    pair of ``np.searchsorted`` calls prices every A row's window at
    once — no per-key Python, no quadratic pair expansion."""
    SEG = np.int64(1) << np.int64(44)   # ts_ms < 2^44; segments < 2^19

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return pd.DataFrame({key: df[key].to_numpy(),
                                 "n_pairs": np.array([], np.int64)})
        ts = df[ts_col].to_numpy().astype(np.int64)
        et = df[type_col].to_numpy()
        newkey = _segment_starts(df, [key])
        seg_id = np.cumsum(newkey) - 1
        folded = seg_id * SEG + ts
        is_b = et == second_step
        bs = folded[is_b]                  # sorted: seg-major, ts-minor
        is_a = et == first_step
        qa = folded[is_a]
        lo = np.searchsorted(bs, qa, side="left")
        hi = np.searchsorted(bs, qa + window_ms, side="right")
        # window never crosses a segment: qa + window stays inside the
        # segment's 2^44 slot because ts + window < 2^44
        pairs = hi - lo
        a_seg = seg_id[is_a]
        uniq, inv = np.unique(a_seg, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, pairs)
        starts = np.flatnonzero(newkey)
        keys_of_seg = df[key].to_numpy()[starts]
        keep = sums > 0
        return pd.DataFrame({key: keys_of_seg[uniq[keep]],
                             "n_pairs": sums[keep]})

    return partitioned_apply(ds, [key], kernel, num_partitions)
