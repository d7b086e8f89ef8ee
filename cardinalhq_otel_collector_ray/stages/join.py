"""Join operators.

The reference has NO stream-stream joins (SURVEY §2.2 "Not present
anywhere") — its only join is the small-dictionary lookup (C9). A
training-data engine needs real joins, so two Ray-Data-native shapes:

- ``broadcast_join``: small side ``ray.put`` once, pandas merge per batch
  inside ``map_batches`` — no shuffle, the C9 pattern generalized to full
  rows. Use whenever one side fits in worker memory (dimension tables).
- ``bucketed_hash_join``: both sides large — add ``bucket = hash(key) % B``
  to each side, ``groupby(bucket)`` the union, join within each bucket.
  One explicit co-partitioning shuffle; document B and salt hot keys by
  raising B. This is the portable partitioned hash join (ray_guide
  pattern) — independent of whether this Ray version ships Dataset.join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_join(ds: ray.data.Dataset, small: pd.DataFrame, on: str,
                   how: str = "left", suffix: str = "_r") -> ray.data.Dataset:
    """Join against a driver-side small table, broadcast once via ray.put."""
    ref = ray.put(small)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)  # node-local plasma hit after first task
        return df.merge(rhs, on=on, how=how, suffixes=("", suffix))
    return ds.map_batches(fn, batch_format="pandas")


def semi_join(ds: ray.data.Dataset, keys, on: str,
              anti: bool = False) -> ray.data.Dataset:
    """Semi/anti join via a broadcast key set (filter inside map_batches)."""
    key_arr = np.sort(np.asarray(list(keys)))
    ref = ray.put(key_arr)

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = batch[on].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, col)
        pos = np.minimum(pos, max(len(ks) - 1, 0))
        mask = (ks[pos] == col) if len(ks) else np.zeros(len(col), bool)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))
    return ds.map_batches(fn, batch_format="pyarrow")


def bucketed_hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
                       on: str, num_buckets: int = 32,
                       how: str = "inner") -> ray.data.Dataset:
    """Partitioned hash join of two large datasets on an integer key.

    Both sides get ``_bucket = (key * 2654435761 + 12345) % num_buckets``
    and a ``_side`` tag, are unioned, co-partitioned by ONE
    ``groupby(_bucket)`` shuffle, and merged per bucket with pandas.
    Columns common to both sides (other than ``on``) get a ``_r`` suffix
    on the right. Skewed keys: raise ``num_buckets`` (each bucket must fit
    in a worker's heap).
    """
    # Union requires one schema: suffix right-side name collisions, then
    # give each side typed-NA placeholders for the other side's columns.
    # ds.schema() is plan metadata (first-block at worst) — never re-executes
    # the upstream pipeline the way a take_batch(1) sample would.
    l_schema, r_schema = left.schema(), right.schema()
    lcols, rcols = list(l_schema.names), list(r_schema.names)
    collide = (set(lcols) & set(rcols)) - {on}
    r_renames = {c: c + "_r" for c in collide}
    r_out = [r_renames.get(c, c) for c in rcols]
    all_cols = [on] + [c for c in lcols if c != on] + \
               [c for c in r_out if c != on]

    arrow_types = dict(zip(l_schema.names, l_schema.types))
    for name, t in zip(r_schema.names, r_schema.types):
        arrow_types.setdefault(r_renames.get(name, name), t)

    def tag(side_code: int):
        # Arrow-native tagging: typed-null placeholders (pa.nulls — no
        # pandas conversion/copies), numpy bucket hash, int8 side marker
        def fn(t: pa.Table) -> pa.Table:
            if side_code == 1:
                t = t.rename_columns([r_renames.get(c, c)
                                      for c in t.column_names])
            n = t.num_rows
            cols = {c: (t[c] if c in t.column_names
                        else pa.nulls(n, arrow_types[c])) for c in all_cols}
            k = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
            cols["_bucket"] = pa.array(
                ((k * np.int64(2654435761) + np.int64(12345))
                 % np.int64(num_buckets)).astype(np.int32))
            cols["_side"] = pa.array(np.full(n, side_code, dtype=np.int8))
            return pa.table(cols)
        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")
    both = lt.union(rt)
    l_keep = [on] + [c for c in lcols if c != on]
    r_keep = [on] + [c for c in r_out if c != on]

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        # split sides FIRST, then select each side's own (null-free)
        # columns — dtypes survive the pandas conversion intact
        lmask = pc.equal(g["_side"], 0)
        l = g.filter(lmask).select(l_keep).to_pandas()
        r = g.filter(pc.invert(lmask)).select(r_keep).to_pandas()
        return l.merge(r, on=on, how=how)

    return both.groupby("_bucket").map_groups(join_bucket,
                                              batch_format="pyarrow")
