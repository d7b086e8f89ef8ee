"""Event-time streaming aggregation with explicit late-data policies.

The batch engine collapses interval aggregation (C2) to one groupby;
this is the STREAMING shape — actor-per-bucket `MicroBatchAggregator`s
fed micro-batches in arrival order, intervals closed by an event-time
watermark (max arrival ts − allowed lateness, per bucket). The
reference's late-data rule is implicit ("a late dp lands in a new state
entry", SURVEY §2.4, aggregationprocessor/aggregate.go:193-294); here
it is an explicit policy:

- ``late_policy="absorb"`` (default, the reference's behavior): a late
  row re-opens its closed interval and re-emits it — downstream must
  merge duplicate (interval, key) rows.
- ``late_policy="drop"``: the late row is discarded and counted, so
  every (interval, key) is emitted exactly once — the shape a sink can
  ingest verbatim; the dropped count is the per-stage metric.

Scale notes: buckets are the unit of parallelism (a kafka-partition
consumer analog — per-bucket watermarks, per-bucket arrival order);
tiny micro-batches are driver-dispatch-bound, so `calls_per_rpc` groups
consecutive per-bucket sub-batches into one actor call without touching
the state machine (BASELINE.md note 13).

Run:  python examples/streaming_late_data.py /root/testdata/sf0.01
"""

import os
import sys

import numpy as np

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cardinalhq_otel_collector_ray.stages.streaming import (
        streaming_interval_aggregate)

    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_id", "event_type", "ts", "value"])
    ts_ms = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1000
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    # a deterministic out-of-order arrival: each event displaced ≤4 h
    arrival = ts_ms + (eid * 2654435761 + 12345) % 14_400_000
    full = pa.table({"event_type": t["event_type"],
                     "ts_ms": pa.array(ts_ms),
                     "v": t["value"]})
    full = full.take(pa.array(np.lexsort((eid, arrival))))
    chunks = [full.slice(i, 500) for i in range(0, full.num_rows, 500)]

    for policy in ("absorb", "drop"):
        out, late = streaming_interval_aggregate(
            chunks, keys=["event_type"], ts_col="ts_ms", value_col="v",
            interval_ms=3_600_000, key_col_for_bucket="event_type",
            num_buckets=4, allowed_lateness_ms=900_000,
            late_policy=policy, calls_per_rpc=16, return_late_count=True)
        df = out.to_pandas()
        dups = int(df.duplicated(["event_type", "interval_start"]).sum())
        print(f"{policy:6s}: {len(df)} emitted rows, "
              f"{dups} duplicate (interval,key) re-emissions, "
              f"{late} late rows dropped")

    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
