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

from ..functions.hashing import hashmod_keep


def probabilistic_sample(ds: ray.data.Dataset, id_column: str, percent: int,
                         salt: int = 12345) -> ray.data.Dataset:
    """Keep ~percent% of rows, deterministically by id hash.
    SQL-equivalent predicate: ``(id * 2654435761 + salt) % 1000 < percent*10``."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(hashmod_keep(ids, percent, salt=salt)))
    return ds.map_batches(fn, batch_format="pyarrow")


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
