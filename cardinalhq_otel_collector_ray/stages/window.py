"""SQL window functions at scale: rank / percent_rank / ntile per key.

Ray Data has no window operator; the scale-correct shape is the same as
the temporal family (``temporal.partitioned_apply``): ONE hash-partition
shuffle on the key (all rows of a key in one partition, O(partitions)
Python dispatch), then a segmented vectorized kernel per partition —
argsort + run-boundary math, no per-key Python.

Semantics match SQL exactly (tested against DuckDB):
- ``rank``: min-rank over the value order; ties share a rank, gaps follow.
- ``percent_rank`` = (rank-1)/(n-1), 0.0 for single-row partitions —
  an exact-int division, so doubles are bit-identical cross-engine.
- ``ntile(k)``: the first n%k buckets get one extra row, assigned by ROW
  position (tie order matters — callers pass a deterministic tiebreak,
  same as the SQL ORDER BY must).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from .temporal import partitioned_apply


def windowed_rank(ds: ray.data.Dataset, keys: list[str], value_col: str,
                  tiebreak_col: str, ntile: int = 4,
                  num_partitions: int = 64) -> ray.data.Dataset:
    """Adds ``rnk`` (BIGINT), ``pct`` (double) and ``tile`` (BIGINT)
    columns per ``keys`` group ordered by ``value_col`` (ties broken by
    ``tiebreak_col`` for row positions, shared for rank)."""
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [value_col, tiebreak_col],
                            kind="mergesort").reset_index(drop=True)
        n_rows = len(df)
        if n_rows == 0:
            return df.assign(rnk=np.array([], np.int64),
                             pct=np.array([], np.float64),
                             tile=np.array([], np.int64))
        # segment (key-group) boundaries
        new_key = np.zeros(n_rows, dtype=bool)
        new_key[0] = True
        for k in keys:
            v = df[k].to_numpy()
            new_key[1:] |= v[1:] != v[:-1]
        seg_id = np.cumsum(new_key) - 1
        seg_start_idx = np.flatnonzero(new_key)
        seg_len = np.diff(np.r_[seg_start_idx, n_rows])
        seg_start = np.repeat(seg_start_idx, seg_len)
        pos = np.arange(n_rows) - seg_start          # 0-based row position
        n = np.repeat(seg_len, seg_len).astype(np.int64)
        # min-rank with ties on value only
        val = df[value_col].to_numpy()
        new_run = new_key.copy()
        new_run[1:] |= val[1:] != val[:-1]
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(n_rows), 0))
        rnk = (run_start - seg_start + 1).astype(np.int64)
        # percent_rank: exact-int division; 0.0 for n == 1
        denom = np.maximum(n - 1, 1)
        pct = (rnk - 1) / denom
        pct[n == 1] = 0.0
        # ntile(k): first n%k buckets get size+1 rows, by row position
        k_ = np.int64(ntile)
        size = n // k_
        rem = n % k_
        big = rem * (size + 1)
        in_big = pos < big
        tile = np.where(in_big,
                        pos // np.maximum(size + 1, 1),
                        rem + (pos - big) // np.maximum(size, 1)) + 1
        return df.assign(rnk=rnk, pct=pct, tile=tile.astype(np.int64))

    return partitioned_apply(ds, keys, kernel, num_partitions=num_partitions)


def windowed_moving_agg(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                        value_col: str, tiebreak_col: str, window_rows: int,
                        num_partitions: int = 64) -> ray.data.Dataset:
    """Per-key ordered ROWS-frame window aggregates: ``lag_delta`` (value
    minus previous row's value, 0 on the first row of a key),
    ``mov_sum`` / ``mov_n`` / ``mov_avg`` over the trailing
    ``window_rows`` rows (SQL ``ROWS BETWEEN w-1 PRECEDING AND CURRENT
    ROW``).

    Kernel: one global int64 cumsum; each row's frame sum is
    ``cs[i] - cs[lower-1]`` where ``lower = max(seg_start, i-w+1)`` — the
    difference never crosses a key boundary, so one vector pass covers
    every key. ``mov_avg`` is an exact-int division (bit-identical to a
    SQL ``CAST(sum AS DOUBLE)/count``)."""
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return moving_agg_kernel(df, keys, ts_col, value_col, tiebreak_col,
                                 window_rows)

    return partitioned_apply(ds, keys, kernel, num_partitions=num_partitions)


def moving_agg_kernel(df: pd.DataFrame, keys: list[str], ts_col: str,
                      value_col: str, tiebreak_col: str,
                      window_rows: int) -> pd.DataFrame:
    """Pure kernel of `windowed_moving_agg` (module-level for direct
    property testing against naive pandas rolling)."""
    df = df.sort_values(keys + [ts_col, tiebreak_col],
                        kind="mergesort").reset_index(drop=True)
    n = len(df)
    if n == 0:
        return df.assign(lag_delta=np.array([], np.int64),
                         mov_sum=np.array([], np.int64),
                         mov_n=np.array([], np.int64),
                         mov_avg=np.array([], np.float64))
    v = df[value_col].to_numpy().astype(np.int64)
    new_key = np.zeros(n, dtype=bool)
    new_key[0] = True
    for k in keys:
        kv = df[k].to_numpy()
        new_key[1:] |= kv[1:] != kv[:-1]
    seg_start_idx = np.flatnonzero(new_key)
    seg_len = np.diff(np.r_[seg_start_idx, n])
    seg_start = np.repeat(seg_start_idx, seg_len)
    idx = np.arange(n)
    prev = np.r_[0, v[:-1]]
    lag_delta = np.where(new_key, 0, v - prev).astype(np.int64)
    cs = np.cumsum(v)
    lower = np.maximum(seg_start, idx - window_rows + 1)
    below = np.where(lower > 0, cs[np.maximum(lower - 1, 0)], 0)
    below[lower == 0] = 0
    mov_sum = cs - below
    mov_n = idx - lower + 1
    mov_avg = mov_sum / mov_n
    return df.assign(lag_delta=lag_delta, mov_sum=mov_sum,
                     mov_n=mov_n.astype(np.int64), mov_avg=mov_avg)


def grouped_median_mad(ds: ray.data.Dataset, keys: list[str],
                       value_col: str,
                       num_partitions: int = 64) -> ray.data.Dataset:
    """Robust per-key statistics: exact median and MAD (median absolute
    deviation) — the outlier-resistant companion to mean/z-score
    anomaly scoring.

    Kernel per partition: one sort by (keys, value) gives every key's
    median by indexing the two middle elements (SQL's interpolated rule —
    exact ``x.5`` doubles, parity-safe); absolute deviations are then
    re-sorted per segment for the second median. Two lexsorts per
    partition, zero per-key Python."""
    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + [value_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return df.iloc[0:0][keys].assign(
                n=np.array([], np.int64), median=np.array([], np.float64),
                mad=np.array([], np.float64))
        new_key = np.zeros(n, dtype=bool)
        new_key[0] = True
        for k in keys:
            kv = df[k].to_numpy()
            new_key[1:] |= kv[1:] != kv[:-1]
        seg_id = np.cumsum(new_key) - 1
        starts = np.flatnonzero(new_key)
        seg_len = np.diff(np.append(starts, n))
        v = df[value_col].to_numpy().astype(np.float64)

        def seg_median(values: np.ndarray) -> np.ndarray:
            lo = starts + (seg_len - 1) // 2
            hi = starts + seg_len // 2
            return (values[lo] + values[hi]) / 2.0

        med = seg_median(v)                       # v already key-sorted
        dev = np.abs(v - np.repeat(med, seg_len))
        order = np.lexsort((dev, seg_id))
        med_dev = seg_median(dev[order])
        out = df.iloc[starts][keys].reset_index(drop=True)
        out["n"] = seg_len.astype(np.int64)
        out["median"] = med
        out["mad"] = med_dev
        return out

    return partitioned_apply(ds, keys, kernel, num_partitions=num_partitions)


def grouped_concat(ds: ray.data.Dataset, keys: list[str], value_col: str,
                   order_cols: list[str], sep: str, out: str = "joined",
                   num_partitions: int = 64) -> ray.data.Dataset:
    """Ordered per-key string aggregation (SQL ``string_agg(v, sep ORDER
    BY ...)``): one key shuffle, then per partition a single sort + a
    C++ ``binary_join`` over a ListArray built from the run boundaries —
    the join itself never touches Python strings. Output:
    keys + ``out`` + ``n`` (elements joined)."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + order_cols,
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        if n == 0:
            return df.iloc[0:0][keys].assign(**{out: pd.Series([], dtype=str),
                                                "n": np.array([], np.int64)})
        new_key = np.zeros(n, dtype=bool)
        new_key[0] = True
        for k in keys:
            kv = df[k].to_numpy()
            new_key[1:] |= kv[1:] != kv[:-1]
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.append(starts, n))
        values = _pa.array(df[value_col].astype(str).to_numpy())
        lists = _pa.ListArray.from_arrays(
            _pa.array(np.r_[starts, n].astype(np.int32)), values)
        joined = _pc.binary_join(lists, sep)
        res = df.iloc[starts][keys].reset_index(drop=True)
        res[out] = joined.to_pandas()
        res["n"] = counts.astype(np.int64)
        return res

    return partitioned_apply(ds, keys, kernel, num_partitions=num_partitions)
