"""ENRICH stage — broadcast-dictionary attribute lookup (chqauth analog).

Reference behavior: an api-key header is looked up against a tenant
directory, yielding ``{customer_id, customer_name, valid}``, with results
cached per key (``extension/chqauthextension/serverauth.go:116-318``). The
Ray-Data-native shape: the (small) key→attrs dictionary is ``ray.put`` once
on the driver and each enrichment actor fetches it ONCE in ``__init__`` —
never re-shipped per batch, never a shuffle join. The lookup itself is a
vectorized dictionary-encode + ``np.take`` per batch.

The TTL-cache semantics (valid 10 min / invalid 1 min,
``serverauth.go:181-222``) collapse in a batch engine to "one dictionary
snapshot per run"; a ``refresh()`` hook is provided for long-lived actors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


class BroadcastEnricher:
    """map_batches actor: join ``key_column`` against a broadcast dict.

    ``table_ref``: ray.ObjectRef of ``{key: {attr: value, ...}}``.
    Misses produce ``miss_value`` in every enriched column and
    ``valid=False`` when a ``valid`` attr exists (quarantine routing key).
    """

    def __init__(self, table_ref, key_column: str, miss_value=None,
                 loader=None):
        self.key_column = key_column
        self.miss_value = miss_value
        self._loader = loader
        self._ref = table_ref
        self._table = None
        self._attrs = None

    @property
    def table(self):
        if self._table is None:
            # Lazy resolve: in actor mode this runs once per actor; in
            # stateless-task mode ray.get hits the local plasma cache, so
            # the dict is fetched at most once per node.
            self._table = (ray.get(self._ref)
                           if isinstance(self._ref, ray.ObjectRef) else self._ref)
        return self._table

    @property
    def attrs(self):
        if self._attrs is None:
            self._attrs = sorted({a for v in self.table.values() for a in v}) \
                if self.table else []
        return self._attrs

    def refresh(self):
        """TTL-style refresh hook (serverauth.go:181-222 analog)."""
        if self._loader is not None:
            self._table = self._loader()
            self._attrs = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_column]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = pc.dictionary_encode(keys)
        dict_keys = enc.dictionary.to_pylist()
        indices = enc.indices.to_numpy(zero_copy_only=False)
        for attr in self.attrs:
            lut = np.asarray(
                [self.table.get(k, {}).get(attr, self.miss_value) for k in dict_keys],
                dtype=object)
            batch = batch.append_column(attr, pa.array(lut[indices]))
        return batch


def enrich_stage(ds: ray.data.Dataset, table: dict, key_column: str,
                 concurrency: int | None = None, batch_size: int | None = None,
                 miss_value=None) -> ray.data.Dataset:
    """Default: stateless tasks carrying the broadcast ObjectRef (resolved
    from the node-local plasma cache — the dict ships to each node once, not
    per batch). Pass ``concurrency`` for a pinned actor pool when the
    dictionary is big enough that even one resolve per task matters."""
    table_ref = ray.put(table)
    if concurrency is None:
        fn = BroadcastEnricher(table_ref, key_column, miss_value=miss_value)
        return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(BroadcastEnricher,
                          fn_constructor_args=(table_ref, key_column),
                          fn_constructor_kwargs={"miss_value": miss_value},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def stamp_columns(ds: ray.data.Dataset, values: dict) -> ray.data.Dataset:
    """Constant-column stamp — the client-auth header-inject analog
    (``extension/chqauthextension/clientauth.go:52-78``) and the
    ``additional_attributes`` append (``aggregationprocessor/config.go:26``)."""
    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        for k, v in values.items():
            batch = batch.append_column(k, pa.array([v] * n))
        return batch
    return ds.map_batches(fn, batch_format="pyarrow")
