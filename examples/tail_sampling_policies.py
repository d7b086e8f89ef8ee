"""Tail-sampling with the composite policy vocabulary
(tailsamplingprocessor analog, distribution/components.go:145).

Trace-level features come from a distributed per-key aggregate; the
ordered composite claims traces first-match — unlimited status/latency
policies first, then a deterministic rate-limited catch-all (at most N
traces per minute bucket, hash-ranked so retries pick the same traces).
The kept keys then semi-join back onto the raw span/event stream.

Run:  python examples/tail_sampling_policies.py /root/testdata/sf0.01
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
    import pyarrow.compute as pc

    from cardinalhq_otel_collector_ray.sources import read_table
    from cardinalhq_otel_collector_ray.stages.join import semi_join
    from cardinalhq_otel_collector_ray.stages.sample import (
        apply_composite_policies, policy_and, policy_attr)
    from cardinalhq_otel_collector_ray.stages.temporal import partitioned_apply

    events = read_table(sf_dir, "events",
                        columns=["event_id", "user_id", "event_type", "ts",
                                 "value"])

    def feats(batch: pa.Table) -> pa.Table:
        err = pc.equal(batch["event_type"], "error").cast(pa.int64())
        ms = pc.divide(batch["ts"].cast(pa.int64()), 1000)
        return pa.table({"user_id": batch["user_id"], "is_error": err,
                         "ts_ms": ms})

    def per_user(df):
        g = df.groupby("user_id", as_index=False).agg(
            has_error=("is_error", "max"), min_ts=("ts_ms", "min"),
            n=("is_error", "size"))
        g["bucket"] = g["min_ts"] // 60_000
        return g.drop(columns=["min_ts"])

    traces = partitioned_apply(
        events.map_batches(feats, batch_format="pyarrow"),
        ["user_id"], per_user, num_partitions=8)

    kept = apply_composite_policies(
        traces,
        [("errors", policy_attr("has_error", "==", 1), None),
         ("busy", policy_and(policy_attr("n", ">=", 20),
                             policy_attr("has_error", "==", 0)), None),
         ("rate_limited", lambda df: np.ones(len(df), dtype=bool), 3)],
        key_col="user_id", bucket_col="bucket")

    keep_ids = kept.to_pandas()
    print(keep_ids.groupby("policy")["user_id"].count())
    sampled = semi_join(events, set(keep_ids["user_id"]), on="user_id")
    print("kept events:", sampled.count())
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
