"""Deterministic samplers and drop-rule filters.

Covers the enforcement vocabulary of the reference's per-vendor pipelines
(``docs/flow/flow.dot:27-104``): ``filterprocessor`` OTTL drop rules and
``probabilisticsamplerprocessor`` hash-based %-sampling
(``distribution/components.go:125,137``) — made reproducible by hashing a
stable id column instead of randomizing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import SALT, hashmod_keep, mulhash, round6


def probabilistic_sample(ds: ray.data.Dataset, id_column: str, percent: int,
                         salt: int = 12345) -> ray.data.Dataset:
    """Keep ~percent% of rows, deterministically by id hash.
    SQL-equivalent predicate: ``(id * 2654435761 + salt) % 1000 < percent*10``."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(hashmod_keep(ids, percent, salt=salt)))
    return ds.map_batches(fn, batch_format="pyarrow")


def priority_sample(ds: ray.data.Dataset, id_col: str, k: int,
                    salt: int = 777, mod: int = 1_000_003,
                    pri_col: str = "pri"):
    """Deterministic distributed "reservoir" sample: exactly k rows, the
    global bottom-k by hashed priority ``(id*2654435761+salt) % mod`` with
    ``id`` as tie-break.

    Equivalent to uniform reservoir sampling but reproducible and
    merge-friendly: each block keeps only its local bottom-k, the driver
    merges <= k x blocks candidates (the ``distributed_top_k`` shape — no
    full materialization). SQL-equivalent: ``ORDER BY pri, id LIMIT k``.
    Returns a pandas DataFrame (k rows, driver-sized by construction).
    """
    from .aggregate import distributed_top_k

    def add_pri(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            pri_col, pa.array(mulhash(ids, salt=salt, mod=mod)))

    with_pri = ds.map_batches(add_pri, batch_format="pyarrow")
    return distributed_top_k(with_pri, k, by=[pri_col, id_col],
                             ascending=[True, True])


def stratified_sample(ds: ray.data.Dataset, key: str, id_col: str, k: int,
                      salt: int = 777, mod: int = 1_000_003,
                      pri_col: str = "pri",
                      num_partitions: int = 64) -> ray.data.Dataset:
    """Per-stratum deterministic sample: the bottom-k rows of EACH ``key``
    value by hashed priority. Two-phase: per-block per-key prune to k (so
    at most k x blocks rows per key move), then one hash-partitioned merge
    (bounded Python dispatch, all rows of a key in one partition).
    SQL-equivalent: ``QUALIFY row_number() OVER (PARTITION BY key
    ORDER BY pri, id) <= k``. Stays a streaming Dataset.
    """
    import pandas as pd

    from .temporal import partitioned_apply

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        df = df.assign(**{pri_col: mulhash(ids, salt=salt, mod=mod)})
        df = df.sort_values([key, pri_col, id_col], kind="mergesort")
        return df.groupby(key, sort=False).head(k)

    pruned = ds.map_batches(prune, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, pri_col, id_col], kind="mergesort")
        return df.groupby(key, sort=False).head(k)

    return partitioned_apply(pruned, [key], merge,
                             num_partitions=num_partitions)


def drop_where(ds: ray.data.Dataset, predicate) -> ray.data.Dataset:
    """filterprocessor drop rule: remove rows where ``predicate(batch)`` is
    true (vectorized bool mask, Arrow kernels)."""
    def fn(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
            mask = pa.array(np.asarray(mask, dtype=bool))
        # NULL predicate result (e.g. pc.equal against a null cell) means
        # "did not match the drop rule" — keep the row. Without fill_null
        # Arrow's filter drops null-mask rows, silently deleting them.
        return batch.filter(pc.fill_null(pc.invert(mask), True))
    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_priority_sample(ds: ray.data.Dataset, id_col: str,
                             weight_col: str, k: int,
                             salt: int = SALT) -> "ray.data.Dataset":
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): each row gets priority ``ln(u) / w`` with
    ``u = (mulhash(id)+0.5)/MOD`` — a pure function of the id, so
    retries/resumes select the same rows — and the k largest priorities
    win (equivalent to the classical ``u^(1/w)`` keys; heavier rows are
    proportionally likelier). Per-block top-k prune, then a k×blocks
    driver merge (`distributed_top_k`). SQL reproduces the identical
    doubles with the same expression."""
    import pandas as pd

    from ..functions.hashing import MOD
    from .aggregate import distributed_top_k

    def add_pri(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        w = df[weight_col].to_numpy().astype(np.float64)
        u = (mulhash(ids, salt=salt).astype(np.float64) + 0.5) / MOD
        return df.assign(pri=np.log(u) / w)

    top = distributed_top_k(ds.map_batches(add_pri, batch_format="pandas"),
                            k, by=["pri", id_col], ascending=[False, True])
    top = top.reset_index(drop=True)
    top["pri"] = round6(top["pri"].to_numpy())
    return top
