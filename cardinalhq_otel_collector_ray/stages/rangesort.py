"""Range partitioning for global sort — the scale primitive behind
sorted output.

Ray Data's ``Dataset.sort`` already range-partitions internally; this
module exposes the primitive itself so pipelines can produce
RANGE-PARTITIONED output (per-partition files whose key ranges are
disjoint and ordered — "sorted corpus" layout) with exact, balanced
boundaries:

1. exact per-value counts (two-phase: per-block C++ ``group_by`` →
   bounded-domain driver merge — the per-value histogram is the scale
   contract, like any dictionary-encoded key),
2. boundaries at ranks ``ceil(j·n/P)`` (deterministic, SQL-reproducible),
3. a broadcast-boundaries ``searchsorted`` tag per batch (value-based, so
   duplicate keys land in one partition and retries are idempotent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .aggregate import grouped_aggregate


def _value_histogram(ds: ray.data.Dataset, col: str):
    """Exact per-value counts, value-sorted ascending — the bounded-domain
    scale contract shared by every order statistic here (two-phase count:
    per-block C++ ``group_by`` partials → driver merge of ≤ domain rows)."""
    def one(batch: pa.Table) -> pa.Table:
        return batch.select([col]).append_column(
            "_one", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    counts = grouped_aggregate(ds.map_batches(one, batch_format="pyarrow"),
                               keys=[col], value_col="_one",
                               mode="driver").to_pandas()
    counts = counts.sort_values(col, kind="mergesort").reset_index(drop=True)
    return (counts[col].to_numpy().astype(np.int64),
            counts["agg_count"].to_numpy().astype(np.int64))


def range_partition_bounds(ds: ray.data.Dataset, col: str,
                           num_partitions: int) -> np.ndarray:
    """Exact balanced range boundaries: the distinct values at global
    ranks ``ceil(j·n/P)`` for j = 1..P-1 (duplicates collapsed — a value
    never straddles two partitions)."""
    v, c = _value_histogram(ds, col)
    n = int(c.sum())
    if n == 0 or num_partitions <= 1:
        return np.empty(0, dtype=np.int64)
    cum = np.cumsum(c)
    ranks = np.ceil(np.arange(1, num_partitions) * n
                    / float(num_partitions)).astype(np.int64)
    idx = np.searchsorted(cum, ranks, side="left")
    return np.unique(v[idx]).astype(np.int64)


def global_rank(ds: ray.data.Dataset, col: str, descending: bool = False,
                out_col: str = "global_rank") -> ray.data.Dataset:
    """Exact global SQL ``rank()`` over ``col`` (ties share the min rank,
    gaps follow) WITHOUT a global sort shuffle — the curriculum-ordering
    primitive (order every document by a quality score at corpus scale).

    Scale shape: the only thing that ever leaves the workers is the
    per-value histogram (two-phase count, bounded domain — quality scores
    are discretized ints, same contract as ``range_partition_bounds``).
    The driver turns it into a (sorted values, rank-at-value) pair of
    arrays, broadcast ONCE via ``ray.put``; the row pass is a shuffle-free
    ``searchsorted`` lookup per batch. rank(v) = 1 + #{rows strictly
    before v in the requested order}.
    """
    vals_asc, c = _value_histogram(ds, col)
    cum = np.cumsum(c)                       # rows with value <= vals_asc[i]
    if descending:
        ranks = cum[-1] - cum + 1 if len(c) else cum
    else:
        ranks = cum - c + 1
    ref = ray.put((vals_asc, ranks.astype(np.int64)))

    def tag(batch: pa.Table) -> pa.Table:
        v, r = ray.get(ref)
        vals = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(v, vals, side="left")
        return batch.append_column(out_col, pa.array(r[idx]))

    return ds.map_batches(tag, batch_format="pyarrow")


def global_percent_rank(ds: ray.data.Dataset, col: str,
                        out_col: str = "pct") -> ray.data.Dataset:
    """Exact global SQL ``percent_rank()`` — score→percentile
    normalization for curriculum/quality-mixing policies. Same scale
    shape as ``global_rank``: bounded histogram → driver
    (value, (rank-1)/(n-1)) arrays → broadcast searchsorted tag.
    The division is exact-int → float64 on both engines (parity-safe);
    0.0 for a single-row input, matching SQL."""
    vals_asc, c = _value_histogram(ds, col)
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(c) else 0
    ranks = cum - c + 1
    pct = ((ranks - 1) / float(n - 1) if n > 1
           else np.zeros(len(c), dtype=np.float64))
    ref = ray.put((vals_asc, pct.astype(np.float64)))

    def tag(batch: pa.Table) -> pa.Table:
        v, p = ray.get(ref)
        vals = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(v, vals, side="left")
        return batch.append_column(out_col, pa.array(p[idx]))

    return ds.map_batches(tag, batch_format="pyarrow")


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    percentiles: tuple[int, ...] = (1, 5, 25, 50, 75, 90, 99)
                    ) -> pd.DataFrame:
    """EXACT global discrete quantiles (the value at rank ``ceil(p·n/100)``,
    exact-int arithmetic) — the exact complement to the KLL sketch query,
    from the same bounded per-value histogram. No sort shuffle; only the
    histogram reaches the driver."""
    vals_asc, c = _value_histogram(ds, col)
    cum = np.cumsum(c)
    n = int(cum[-1]) if len(c) else 0
    ps = np.asarray(percentiles, dtype=np.int64)
    ranks = (ps * n + 99) // 100             # ceil(p*n/100), exact int
    idx = np.searchsorted(cum, ranks, side="left")
    return pd.DataFrame({"p": ps, col: vals_asc[idx]})


def range_partition_stats(ds: ray.data.Dataset, col: str,
                          num_partitions: int) -> pd.DataFrame:
    """Assign every row its range partition (``searchsorted`` against the
    broadcast boundaries, upper-bound side so ``part = #bounds ≤ v``) and
    return per-partition (n, min, max) — the disjointness certificate a
    range-partitioned sorted write relies on."""
    bounds = range_partition_bounds(ds, col, num_partitions)
    bref = ray.put(bounds)

    def tag_and_combine(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        vals = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = np.searchsorted(b, vals, side="right").astype(np.int32)
        t = pa.table({"part": pa.array(part), col: pa.array(vals)})
        out = t.group_by(["part"]).aggregate(
            [(col, "count"), (col, "min"), (col, "max")])
        return out.rename_columns(["part", "_n", "_min", "_max"])

    partials = ds.map_batches(tag_and_combine,
                              batch_format="pyarrow").to_pandas()
    g = partials.groupby("part", as_index=False).agg(
        n=("_n", "sum"), min_val=("_min", "min"), max_val=("_max", "max"))
    g = g.sort_values("part", kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({"part": g["part"].astype("int64"),
                         "n": g["n"].astype("int64"),
                         "min_val": g["min_val"].astype("int64"),
                         "max_val": g["max_val"].astype("int64")})
