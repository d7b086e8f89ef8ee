"""C3 re-emit shape fidelity — rebuilding metric rows from aggregate state.

Reference semantics (``processor/aggregationprocessor/aggregate.go:46-191``):
each closed interval emits a brand-new single-datapoint metric where

- Sum aggregation ⇒ Sum metric with DEFAULTS delta + non-monotonic set
  FIRST (``aggregate.go:55-60``); anything else ⇒ Gauge,
- ``setTags`` runs AFTER the defaults, so ``metadata.metric.
  aggregationtemporality`` ("cumulative"/"delta", Sum-only) and
  ``metadata.metric.ismonotonic`` (any value; true ⇔ "true", Sum-only)
  OVERRIDE them (``setMetricMetadata``, ``aggregate.go:167-191``),
- datapoint timestamp AND start-timestamp = interval StartTime
  (``aggregate.go:64-67``),
- the flat tag-set is re-split by ``section.`` prefix into resource /
  scope / datapoint attrs (``setTags``, ``aggregate.go:121-147``),
- ``metadata.metric.*`` restores name / description / unit;
  ``metadata.resource.schemaurl`` and ``metadata.instrumentation.
  {schemaurl,name,version}`` restore the outer-level fields
  (``aggregate.go:149-165``),
- config ``additional_attributes`` are appended to every emitted datapoint
  (``aggregate.go:72-74``, ``config.go:26``).

Two entry points: ``emit_row`` is the pure per-entry reference function
(golden-tested); ``emit_stage`` is the VECTORIZED batch path — section
re-split, metadata scatter and additional-attribute append all run as
Arrow/numpy kernels over the flattened map buffers (no ``to_pylist`` row
loop: C3 emit is the hot output path of the flagship aggregate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.tags import split_sections

METADATA_NAME = "metadata.metric.name"
METADATA_DESC = "metadata.metric.description"
METADATA_UNIT = "metadata.metric.unit"
# reference key spellings (aggregate.go:178,186) — no underscores
METADATA_TEMPORALITY = "metadata.metric.aggregationtemporality"
METADATA_MONOTONIC = "metadata.metric.ismonotonic"
METADATA_RESOURCE_SCHEMAURL = "metadata.resource.schemaurl"
METADATA_SCOPE_SCHEMAURL = "metadata.instrumentation.schemaurl"
METADATA_SCOPE_NAME = "metadata.instrumentation.name"
METADATA_SCOPE_VERSION = "metadata.instrumentation.version"


def emit_row(tags: dict[str, str], agg_type: str, value: float,
             interval_start_ms: int,
             additional_attributes: dict[str, str] | None = None) -> dict:
    """One aggregate state entry → one emitted metric row (pure function)."""
    sections = split_sections(tags)
    # sections["metadata"] keys had the "metadata." prefix stripped;
    # restore full keys for the metadata.* lookups
    meta = {"metadata." + k: v for k, v in sections["metadata"].items()}

    name = meta.get(METADATA_NAME, "")
    description = meta.get(METADATA_DESC, "")
    unit = meta.get(METADATA_UNIT, "")
    is_sum = agg_type == "sum"
    if is_sum:
        # defaults first (aggregate.go:55-60), metadata overrides after
        # (setTags ordering, aggregate.go:69 → setMetricMetadata :167-191)
        temporality = "delta"
        t = meta.get(METADATA_TEMPORALITY)
        if t in ("cumulative", "delta"):
            temporality = t
        mono = meta.get(METADATA_MONOTONIC)
        monotonic = (mono == "true") if mono is not None else False
    else:
        # setMetricMetadata returns early for non-Sum types
        temporality, monotonic = None, None

    dp_attrs = dict(sections["datapoint"])
    dp_attrs.update(additional_attributes or {})
    return {
        "name": name,
        "description": description,
        "unit": unit,
        "mtype": "sum" if is_sum else "gauge",
        "temporality": temporality,
        "monotonic": monotonic,
        "ts_ms": interval_start_ms,
        "start_ts_ms": interval_start_ms,
        "value_d": float(value),
        "resource_schema_url": meta.get(METADATA_RESOURCE_SCHEMAURL),
        "scope_schema_url": meta.get(METADATA_SCOPE_SCHEMAURL),
        "scope_name": meta.get(METADATA_SCOPE_NAME),
        "scope_version": meta.get(METADATA_SCOPE_VERSION),
        "resource_attrs": sections["resource"],
        "scope_attrs": sections["scope"],
        "dp_attrs": dp_attrs,
    }


def _section_map_array(keys: pa.Array, items: pa.Array, row_of: np.ndarray,
                       n: int, mask: np.ndarray, strip_regex: str | None,
                       extra: dict[str, str] | None) -> pa.MapArray:
    """Build a per-row map column from the masked flat (key, item) entries,
    optionally stripping a prefix and appending constant attrs per row —
    all Arrow take/filter kernels, no Python objects."""
    cnt = (np.bincount(row_of[mask], minlength=n).astype(np.int64)
           if mask.any() else np.zeros(n, dtype=np.int64))
    amask = pa.array(mask)
    fk = pc.filter(keys, amask)
    fi = pc.filter(items, amask)
    if strip_regex is not None and len(fk):
        fk = pc.replace_substring_regex(fk, pattern=strip_regex, replacement="")
    if not extra:
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cnt, out=offsets[1:])
        return pa.MapArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                       fk, fi)
    ek, ev = list(extra.keys()), list(extra.values())
    e = len(ek)
    old_total = int(cnt.sum())
    total = cnt + e
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(total, out=offsets[1:])
    # destinations: old entries keep row-relative position, constants append
    old_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(cnt[:-1], out=old_starts[1:])
    within = np.arange(old_total, dtype=np.int64) - np.repeat(old_starts, cnt)
    dst_old = np.repeat(offsets[:-1], cnt) + within
    dst_const = np.repeat(offsets[:-1] + cnt, e) + np.tile(np.arange(e), n)
    perm = np.empty(old_total + n * e, dtype=np.int64)
    perm[dst_old] = np.arange(old_total)
    perm[dst_const] = old_total + np.tile(np.arange(n * e), 1)
    all_keys = pa.concat_arrays([fk.cast(pa.string()),
                                 pa.array(ek * n, type=pa.string())])
    all_items = pa.concat_arrays([fi.cast(pa.string()),
                                  pa.array(ev * n, type=pa.string())])
    return pa.MapArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   pc.take(all_keys, pa.array(perm)),
                                   pc.take(all_items, pa.array(perm)))


def emit_stage(ds: ray.data.Dataset, *, tags_col: str = "tags",
               agg_type_col: str = "agg_type", value_col: str = "value",
               interval_col: str = "interval_start_ms",
               additional_attributes: dict[str, str] | None = None
               ) -> ray.data.Dataset:
    """Vectorized batch emit over map-typed tag columns (same row shape as
    ``emit_row``, asserted by tests)."""
    def fn(batch: pa.Table) -> pa.Table:
        tags = batch[tags_col]
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        n = len(tags)
        offsets = tags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # .keys/.items are the FULL flat buffers even for sliced arrays —
        # window them to this array's extent and normalize offsets
        start, end = int(offsets[0]), int(offsets[-1])
        keys = tags.keys.slice(start, end - start)
        items = tags.items.slice(start, end - start)
        offsets = offsets - start
        counts_all = np.diff(offsets)
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts_all)

        def starts(prefix: str) -> np.ndarray:
            if len(keys) == 0:
                return np.zeros(0, dtype=bool)
            return pc.starts_with(keys, prefix).to_numpy(zero_copy_only=False)

        m_res = starts("resource.")
        m_scope = starts("instrumentation.")
        m_meta = starts("metadata.")
        m_metric = starts("metric.")
        m_dp = m_metric | ~(m_res | m_scope | m_meta)

        def meta_scatter(key_name: str) -> np.ndarray:
            """Per-row value of one metadata key (None when absent)."""
            out = np.full(n, None, dtype=object)
            if len(keys) == 0:
                return out
            m = pc.equal(keys, key_name)
            mn = m.to_numpy(zero_copy_only=False)
            idx = np.flatnonzero(mn)
            if len(idx):
                out[row_of[idx]] = pc.filter(items, m).to_pylist()
            return out

        name = meta_scatter(METADATA_NAME)
        desc = meta_scatter(METADATA_DESC)
        unit = meta_scatter(METADATA_UNIT)
        t_over = meta_scatter(METADATA_TEMPORALITY)
        m_over = meta_scatter(METADATA_MONOTONIC)

        aggs = np.asarray(batch[agg_type_col].to_pylist(), dtype=object)
        is_sum = aggs == "sum"
        temporality = np.full(n, None, dtype=object)
        temporality[is_sum] = "delta"
        t_ok = is_sum & ((t_over == "cumulative") | (t_over == "delta"))
        temporality[t_ok] = t_over[t_ok]
        monotonic = np.full(n, None, dtype=object)
        monotonic[is_sum] = False
        m_ok = is_sum & (m_over != None)  # noqa: E711 — elementwise
        monotonic[m_ok] = m_over[m_ok] == "true"

        iv = batch[interval_col].cast(pa.int64())
        fill = lambda arr: pa.array(np.where(arr == None, "", arr))  # noqa: E711
        out = pa.table({
            "name": fill(name),
            "description": fill(desc),
            "unit": fill(unit),
            "mtype": pa.array(np.where(is_sum, "sum", "gauge")),
            "temporality": pa.array(temporality, type=pa.string()),
            "monotonic": pa.array(monotonic, type=pa.bool_()),
            "ts_ms": iv,
            "start_ts_ms": iv,
            "value_d": batch[value_col].cast(pa.float64()),
            "resource_schema_url": pa.array(
                meta_scatter(METADATA_RESOURCE_SCHEMAURL), type=pa.string()),
            "scope_schema_url": pa.array(
                meta_scatter(METADATA_SCOPE_SCHEMAURL), type=pa.string()),
            "scope_name": pa.array(meta_scatter(METADATA_SCOPE_NAME),
                                   type=pa.string()),
            "scope_version": pa.array(meta_scatter(METADATA_SCOPE_VERSION),
                                      type=pa.string()),
            "resource_attrs": _section_map_array(
                keys, items, row_of, n, m_res, "^resource\\.", None),
            "scope_attrs": _section_map_array(
                keys, items, row_of, n, m_scope, "^instrumentation\\.", None),
            "dp_attrs": _section_map_array(
                keys, items, row_of, n, m_dp, "^metric\\.",
                additional_attributes),
        })
        return out
    return ds.map_batches(fn, batch_format="pyarrow")
