"""C3 re-emit shape fidelity — rebuilding metric rows from aggregate state.

Reference semantics (``processor/aggregationprocessor/aggregate.go:46-191``):
each closed interval emits a brand-new single-datapoint metric where

- Sum aggregation ⇒ delta, non-monotonic Sum; anything else ⇒ Gauge
  (``aggregate.go:46-119``),
- datapoint timestamp AND start-timestamp = interval StartTime
  (``aggregate.go:64-67``),
- the flat tag-set is re-split by ``section.`` prefix into resource /
  scope / datapoint attrs (``setTags``, ``aggregate.go:121-147``),
- ``metadata.metric.*`` tags restore name / description / unit /
  temporality / monotonic instead of becoming attrs
  (``aggregate.go:167-191``),
- config ``additional_attributes`` are appended to every emitted datapoint
  (``aggregate.go:72-74``, ``config.go:26``).

This is a fidelity layer over dict-shaped tag sets (the open-world
attr case, pa.map_ columns) — NOT a hot path; the hot aggregate path keys
on promoted columns (stages/aggregate.py).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.tags import split_sections

METADATA_NAME = "metadata.metric.name"
METADATA_DESC = "metadata.metric.description"
METADATA_UNIT = "metadata.metric.unit"
METADATA_TEMPORALITY = "metadata.metric.aggregation_temporality"
METADATA_MONOTONIC = "metadata.metric.is_monotonic"


def emit_row(tags: dict[str, str], agg_type: str, value: float,
             interval_start_ms: int,
             additional_attributes: dict[str, str] | None = None) -> dict:
    """One aggregate state entry → one emitted metric row (pure function)."""
    sections = split_sections(tags)
    # sections["metadata"] keys had the "metadata." prefix stripped;
    # restore full keys for the metadata.metric.* lookups
    meta = {"metadata." + k: v for k, v in sections["metadata"].items()}

    name = meta.get(METADATA_NAME, "")
    description = meta.get(METADATA_DESC, "")
    unit = meta.get(METADATA_UNIT, "")
    is_sum = agg_type == "sum"
    if is_sum:
        temporality = meta.get(METADATA_TEMPORALITY, "delta")
        monotonic = meta.get(METADATA_MONOTONIC, "false") == "true"
    else:
        temporality, monotonic = None, None

    dp_attrs = dict(sections["datapoint"])
    dp_attrs.update(additional_attributes or {})
    return {
        "name": name,
        "description": description,
        "unit": unit,
        "mtype": "sum" if is_sum else "gauge",
        # emitted sums are ALWAYS delta non-monotonic (aggregate.go:96-101)
        "temporality": "delta" if is_sum else None,
        "monotonic": False if is_sum else None,
        "ts_ms": interval_start_ms,
        "start_ts_ms": interval_start_ms,
        "value_d": float(value),
        "resource_attrs": sections["resource"],
        "scope_attrs": sections["scope"],
        "dp_attrs": dp_attrs,
    }


def emit_stage(ds: ray.data.Dataset, *, tags_col: str = "tags",
               agg_type_col: str = "agg_type", value_col: str = "value",
               interval_col: str = "interval_start_ms",
               additional_attributes: dict[str, str] | None = None
               ) -> ray.data.Dataset:
    """Batch wrapper over ``emit_row`` for map-typed tag columns."""
    def fn(batch: pa.Table) -> pa.Table:
        tags_list = batch[tags_col].to_pylist()
        aggs = batch[agg_type_col].to_pylist()
        vals = batch[value_col].to_pylist()
        ivs = batch[interval_col].to_pylist()
        rows = [emit_row(dict(t) if not isinstance(t, dict) else t, a, v, i,
                         additional_attributes)
                for t, a, v, i in zip(tags_list, aggs, vals, ivs)]
        return pa.Table.from_pylist(rows)
    return ds.map_batches(fn, batch_format="pyarrow")
