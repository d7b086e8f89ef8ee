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


def range_partition_bounds(ds: ray.data.Dataset, col: str,
                           num_partitions: int) -> np.ndarray:
    """Exact balanced range boundaries: the distinct values at global
    ranks ``ceil(j·n/P)`` for j = 1..P-1 (duplicates collapsed — a value
    never straddles two partitions)."""
    def one(batch: pa.Table) -> pa.Table:
        return batch.select([col]).append_column(
            "_one", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    counts = grouped_aggregate(ds.map_batches(one, batch_format="pyarrow"),
                               keys=[col], value_col="_one",
                               mode="driver").to_pandas()
    counts = counts.sort_values(col, kind="mergesort").reset_index(drop=True)
    c = counts["agg_count"].to_numpy().astype(np.int64)
    v = counts[col].to_numpy()
    n = int(c.sum())
    if n == 0 or num_partitions <= 1:
        return np.empty(0, dtype=np.int64)
    cum = np.cumsum(c)
    ranks = np.ceil(np.arange(1, num_partitions) * n
                    / float(num_partitions)).astype(np.int64)
    idx = np.searchsorted(cum, ranks, side="left")
    return np.unique(v[idx]).astype(np.int64)


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
