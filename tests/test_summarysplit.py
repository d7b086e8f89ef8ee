"""Summarysplit goldens transcribed from
processor/summarysplitprocessor/metrics_test.go:28-200."""

import numpy as np
import pyarrow as pa

from cardinalhq_otel_collector_ray.stages.summarysplit import (
    INT64_MAX, clamp_uint64, explode_summary_batch, quantile_suffix)


def test_quantile_naming_goldens():
    # metrics_test.go:28-63 naming table
    assert quantile_suffix(0.0) == ".min"
    assert quantile_suffix(1.0) == ".max"
    assert quantile_suffix(0.5) == ".quantile.50"
    assert quantile_suffix(0.9) == ".quantile.90"
    assert quantile_suffix(0.99) == ".quantile.99"
    assert quantile_suffix(0.999) == ".quantile.99_9"


def test_clamp_uint64():
    # metrics.go:118-123
    v = clamp_uint64(np.array([0, 5, 2**63 - 1, 2**63, 2**64 - 1], dtype=np.uint64))
    assert v.tolist() == [0, 5, INT64_MAX, INT64_MAX, INT64_MAX]


def _summary_table(quantiles, count=10, start_ts=0):
    return pa.table({
        "name": ["lat"],
        "ts": pa.array([1_000_000], pa.int64()),
        "start_ts": pa.array([start_ts], pa.int64()),
        "count": pa.array([count], pa.uint64()),
        "sum": pa.array([123.5], pa.float64()),
        "quantiles": pa.array([quantiles],
            type=pa.list_(pa.struct([("q", pa.float64()), ("v", pa.float64())]))),
    })


def test_explode_structure():
    t = _summary_table([{"q": 0.0, "v": 1.0}, {"q": 0.5, "v": 2.0},
                        {"q": 1.0, "v": 3.0}])
    out = explode_summary_batch(t).to_pandas()
    names = set(out["name"])
    assert names == {"lat.count", "lat.sum", "lat.min", "lat.quantile.50", "lat.max"}
    cnt = out[out["name"] == "lat.count"].iloc[0]
    assert cnt["mtype"] == "sum" and cnt["value_i"] == 10
    assert cnt["temporality"] == "delta" and not cnt["monotonic"]  # delta non-monotonic
    s = out[out["name"] == "lat.sum"].iloc[0]
    assert s["mtype"] == "gauge" and s["value_d"] == 123.5
    q = out[out["name"] == "lat.quantile.50"].iloc[0]
    assert q["value_d"] == 2.0


def test_invalid_quantiles_skipped():
    # NaN / Inf / out-of-[0,1] skipped (metrics.go:154)
    t = _summary_table([{"q": float("nan"), "v": 1.0}, {"q": -1.0, "v": 2.0},
                        {"q": 2.0, "v": 3.0}, {"q": 0.9, "v": 4.0}])
    out = explode_summary_batch(t).to_pandas()
    assert set(out["name"]) == {"lat.count", "lat.sum", "lat.quantile.90"}


def test_start_ts_fallback():
    # StartTimestamp zero → falls back to Timestamp (metrics.go:179-184)
    t = _summary_table([], start_ts=0)
    out = explode_summary_batch(t).to_pandas()
    assert (out["start_ts"] == 1_000_000).all()
    t2 = _summary_table([], start_ts=555)
    out2 = explode_summary_batch(t2).to_pandas()
    assert (out2["start_ts"] == 555).all()


def test_duplicate_quantiles_deduped():
    t = _summary_table([{"q": 0.5, "v": 2.0}, {"q": 0.5, "v": 9.0}])
    out = explode_summary_batch(t).to_pandas()
    q50 = out[out["name"] == "lat.quantile.50"]
    assert len(q50) == 1 and q50.iloc[0]["value_d"] == 2.0  # first wins
