"""Span/trace signal surface — the trace marshaling + spanmetrics analog.

The reference handles traces as a first-class signal (the ptrace branch of
``exporter/awss3exporter/marshaler.go:17-71``) and ships
``spanmetricsconnector`` (``distribution/components.go:24``), which derives
RED metrics — Request count, Error count, Duration histogram — per
(service, operation) from raw span rows.

Span rows here are plain Arrow records with the columns a span needs
(trace_id, span_id, service, operation, start_ms, duration_ms, is_error);
``spans_from_events`` synthesizes that view deterministically from the
``events`` fixture table (no wall clock, no randomness — every derived
field is integer arithmetic on event columns, so a DuckDB oracle can
reproduce it exactly), and ``red_metrics`` is the spanmetrics computation
itself: a two-phase (per-block C++ pre-combine → bounded-cardinality
merge) aggregate over (service, operation, duration_bucket) — the same
shuffle-light shape as every other aggregate in this engine, so it holds
at 100 TB of spans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .aggregate import grouped_aggregate

# fixture constants (documented so the SQL oracle mirrors them verbatim)
SPAN_SERVICES = 5            # service = 'svc' || (user_id % SPAN_SERVICES)
SPAN_DURATION_MOD = 10_000   # duration_ms = value_cents % SPAN_DURATION_MOD


def spans_from_events(ds: ray.data.Dataset, *,
                      error_type: str = "error") -> ray.data.Dataset:
    """Deterministic span view over the events fixture (requires the
    ``_events_ms`` columns event_id/user_id/event_type/ts_ms/value_cents).

    trace_id    = knuth-hash of event_id (the engine-wide sampling hash)
    span_id     = event_id
    service     = 'svc<user_id % 5>'
    operation   = event_type
    start_ms    = ts_ms
    duration_ms = value_cents % 10000  (exact integer — oracle-equal)
    is_error    = 1 if event_type == error_type else 0
    """
    svc_table = np.array([f"svc{i}" for i in range(SPAN_SERVICES)])

    def fn(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = batch["value_cents"].to_numpy(zero_copy_only=False)
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        import pyarrow.compute as pc
        return pa.table({
            "trace_id": pa.array((eid * 2654435761 + 12345) % (1 << 62)),
            "span_id": pa.array(eid),
            "service": pa.array(svc_table[uid % SPAN_SERVICES]),
            "operation": et,
            "start_ms": batch["ts_ms"],
            "duration_ms": pa.array(
                np.mod(cents, SPAN_DURATION_MOD).astype(np.int64)),
            "is_error": pc.equal(et, error_type).cast(pa.int64()),
        })
    return ds.map_batches(fn, batch_format="pyarrow")


def red_metrics(spans: ray.data.Dataset, *,
                service_col: str = "service", op_col: str = "operation",
                duration_col: str = "duration_ms", error_col: str = "is_error",
                bucket_width_ms: int = 500,
                mode: str = "driver") -> "pd.DataFrame":
    """spanmetricsconnector RED rollup: one row per
    (service, operation, duration bucket) carrying the request count and
    error count for that histogram bin — exactly the calls_total +
    duration-histogram datapoint set the connector emits, in the
    explicit-bounds fixed-width form of ``value_histogram``.

    Bucketing is ``floor(duration / width)`` (never round: numpy rounds
    half-to-even, DuckDB half-away). Aggregation is the engine's standard
    two-phase ``grouped_aggregate`` — per-block C++ partials, then a
    merge sized by ``mode`` (service × operation × bucket cardinality is
    bounded → "driver" by default; pass "partitioned" on wide
    deployments).

    Output columns: service, operation, bucket, n_spans, n_errors.
    """
    def prep(batch: pa.Table) -> pa.Table:
        d = batch[duration_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            service_col: batch[service_col],
            op_col: batch[op_col],
            "bucket": pa.array(np.floor_divide(d, bucket_width_ms)),
            error_col: batch[error_col],
        })

    agg = grouped_aggregate(spans.map_batches(prep, batch_format="pyarrow"),
                            keys=[service_col, op_col, "bucket"],
                            value_col=error_col, mode=mode)
    import pandas as pd
    df = agg.to_pandas()  # bounded: one row per (service, op, bucket)
    df = df.sort_values([service_col, op_col, "bucket"], kind="mergesort")
    return pd.DataFrame({
        "service": df[service_col].to_numpy(),
        "operation": df[op_col].to_numpy(),
        "bucket": df["bucket"].astype("int64").to_numpy(),
        "n_spans": df["agg_count"].astype("int64").to_numpy(),
        "n_errors": df["agg_sum"].astype("int64").to_numpy(),
    })
