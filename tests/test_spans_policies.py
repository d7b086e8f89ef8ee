"""Span signal (spanmetrics RED rollup) + tail-sampling policy vocabulary
(tailsamplingprocessor analog, distribution/components.go:24,145)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cardinalhq_otel_collector_ray.stages.sample import (
    apply_composite_policies, policy_and, policy_attr, policy_hash_sample,
    policy_not, policy_or)
from cardinalhq_otel_collector_ray.stages.spans import (red_metrics,
                                                        spans_from_events)


def _events_ds():
    n = 200
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(np.arange(n)),
        "user_id": pa.array(np.arange(n) % 17),
        "event_type": pa.array(["error" if i % 7 == 0 else "view"
                                for i in range(n)]),
        "ts_ms": pa.array(np.arange(n) * 13_000),
        "value_cents": pa.array((np.arange(n) * 997) % 25_000),
    }))


def test_spans_from_events_schema_and_determinism(ray_session):
    spans = spans_from_events(_events_ds()).to_pandas()
    assert list(spans.columns) == ["trace_id", "span_id", "service",
                                   "operation", "start_ms", "duration_ms",
                                   "is_error"]
    assert len(spans) == 200
    # every derived field is pure integer arithmetic on the event row
    assert (spans["duration_ms"] == (np.arange(200) * 997) % 25_000 % 10_000).all()
    assert (spans["service"] == [f"svc{i % 17 % 5}" for i in range(200)]).all()
    assert spans["is_error"].sum() == sum(1 for i in range(200) if i % 7 == 0)
    # rerun → identical (no wall clock, no randomness)
    spans2 = spans_from_events(_events_ds()).to_pandas()
    pd.testing.assert_frame_equal(spans, spans2)


def test_red_metrics_conservation(ray_session):
    red = red_metrics(spans_from_events(_events_ds()), bucket_width_ms=500)
    assert list(red.columns) == ["service", "operation", "bucket",
                                 "n_spans", "n_errors"]
    assert red["n_spans"].sum() == 200            # every span in one bin
    assert red["n_errors"].sum() == sum(1 for i in range(200) if i % 7 == 0)
    assert (red["n_errors"] <= red["n_spans"]).all()
    assert (red["bucket"] >= 0).all() and (red["bucket"] < 10_000 // 500).all()
    # errors only carry the 'error' operation
    assert set(red.loc[red["n_errors"] > 0, "operation"]) == {"error"}


def _traces():
    return pd.DataFrame({
        "user_id": np.arange(10, dtype=np.int64),
        "has_error": np.array([1, 0, 0, 0, 1, 0, 0, 0, 0, 0]),
        "max_cents": np.array([5, 50, 5, 50, 5, 5, 5, 5, 5, 5]) * 1000,
        "bucket": np.zeros(10, dtype=np.int64),
    })


def test_policy_combinators_vectorized():
    df = _traces()
    err = policy_attr("has_error", "==", 1)
    big = policy_attr("max_cents", ">=", 20_000)
    assert err(df).tolist() == [True, False, False, False, True] + [False] * 5
    assert policy_and(err, big)(df).sum() == 0
    assert policy_or(err, big)(df).sum() == 4
    assert (policy_not(err)(df) == ~err(df)).all()
    with pytest.raises(ValueError, match="unknown policy op"):
        policy_attr("x", "~", 1)
    # hash sampler is the engine-wide deterministic rule
    keep = policy_hash_sample("user_id", 500)(df)
    ids = df["user_id"].to_numpy()
    assert (keep == ((ids * 2654435761 + 12345) % 1000 < 500)).all()


def test_composite_ordered_claiming_and_rate_budget(ray_session):
    """First matching policy claims; the budgeted policy takes only the
    lowest-N eligible by hash priority per bucket; over-budget traces
    fall through to LATER policies (composite rate-share semantics)."""
    traces = ray.data.from_pandas(_traces())
    out = apply_composite_policies(
        traces,
        [("errors", policy_attr("has_error", "==", 1), None),
         ("big2", policy_attr("max_cents", ">=", 20_000), 1),
         ("rest", lambda df: np.ones(len(df), dtype=bool), 3)],
        key_col="user_id", bucket_col="bucket", num_partitions=2,
    ).to_pandas().sort_values("user_id").reset_index(drop=True)

    by_policy = out.groupby("policy")["user_id"].apply(set).to_dict()
    assert by_policy["errors"] == {0, 4}
    # big2 budget=1: among eligible {1, 3}, the lower hash priority wins
    pri = (np.array([1, 3]) * 2654435761 + 777) % 1_000_003
    winner = [1, 3][int(np.argmin(pri))]
    assert by_policy["big2"] == {winner}
    # the over-budget one FALLS THROUGH into 'rest' (budget 3, same bucket)
    loser = ({1, 3} - {winner}).pop()
    assert loser in by_policy["rest"]
    assert len(by_policy["rest"]) == 3
    # everything kept is labeled, nothing double-claimed
    assert len(out) == 2 + 1 + 3
    assert out["user_id"].is_unique


def test_rate_limit_is_per_bucket(ray_session):
    """budget applies per bucket_col value — two buckets each keep N."""
    df = _traces()
    df["bucket"] = np.array([0] * 5 + [1] * 5, dtype=np.int64)
    out = apply_composite_policies(
        ray.data.from_pandas(df),
        [("rl", lambda d: np.ones(len(d), dtype=bool), 2)],
        key_col="user_id", bucket_col="bucket", num_partitions=2,
    ).to_pandas()
    assert len(out) == 4
    assert out.groupby("bucket")["user_id"].count().tolist() == [2, 2]
