"""Aggregation goldens transcribed from the reference tests.

- G1 (processor/aggregationprocessor/metrics_test.go:70-116): 3 marked sum
  datapoints 1.0+2.0+3.0, same tags, same interval → exactly ONE output row
  with value 6.0, timestamp = interval start.
- C1 absorb-filter: unmarked rows pass through untouched.
"""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.aggregate import (
    grouped_aggregate, interval_aggregate, split_marked, with_interval)


def _metric_ds():
    t = pa.table({
        "name": ["test", "test", "test", "other"],
        "ts_ms": [10_500, 11_500, 12_500, 10_500],
        "value": [1.0, 2.0, 3.0, 99.0],
        "agg_mark": [True, True, True, False],
        "tag_foo": ["bar", "bar", "bar", "bar"],
    })
    return ray.data.from_arrow(t)


def test_golden_sum_1_2_3_is_6():
    ds = _metric_ds()
    _, absorbed = split_marked(ds, "agg_mark")
    out = interval_aggregate(absorbed, ts_col="ts_ms", interval_ms=10_000,
                             keys=["name", "tag_foo"], value_col="value")
    df = out.to_pandas()
    assert len(df) == 1  # exactly one emitted datapoint
    row = df.iloc[0]
    assert row["agg_sum"] == 6.0
    assert row["agg_count"] == 3
    assert row["agg_avg"] == 2.0
    assert row["ts_ms"] == 10_000  # interval start (aggregate.go:64-67)


def test_absorb_passthrough_untouched():
    ds = _metric_ds()
    passthrough, absorbed = split_marked(ds, "agg_mark")
    pdf = passthrough.to_pandas()
    assert len(pdf) == 1 and pdf.iloc[0]["name"] == "other"
    assert pdf.iloc[0]["value"] == 99.0
    assert absorbed.count() == 3


def test_interval_bucketing():
    arr = pa.array([0, 9_999, 10_000, 19_999, 20_000])
    iv = with_interval(arr, 10_000)
    assert iv.to_pylist() == [0, 0, 10_000, 10_000, 20_000]


def test_two_phase_grouped_aggregate_matches_naive():
    rng = np.random.default_rng(3)
    n = 10_000
    t = pa.table({"k": rng.integers(0, 17, n), "v": rng.integers(0, 100, n)})
    ds = ray.data.from_arrow(t).repartition(8)
    out = grouped_aggregate(ds, keys=["k"], value_col="v").to_pandas()
    naive = t.to_pandas().groupby("k")["v"].agg(["sum", "count"]).reset_index()
    merged = out.merge(naive, on="k")
    assert (merged["agg_sum"] == merged["sum"]).all()
    assert (merged["agg_count"] == merged["count"]).all()


def test_multiple_intervals_and_keys():
    t = pa.table({
        "name": ["a", "a", "a", "b"],
        "ts_ms": [0, 10_000, 5_000, 0],
        "value": [1.0, 10.0, 2.0, 7.0],
    })
    out = interval_aggregate(ray.data.from_arrow(t), ts_col="ts_ms",
                             interval_ms=10_000, keys=["name"], value_col="value")
    df = out.to_pandas().sort_values(["name", "ts_ms"]).reset_index(drop=True)
    assert df[["name", "ts_ms", "agg_sum"]].values.tolist() == [
        ["a", 0, 3.0], ["a", 10_000, 10.0], ["b", 0, 7.0]]


def test_salted_group_sum_matches_naive_on_zipf():
    from cardinalhq_otel_collector_ray.stages.aggregate import salted_group_sum
    rng = np.random.default_rng(11)
    n = 50_000
    # Zipf-skewed key: ~90% of rows land on one hot key
    keys = np.where(rng.random(n) < 0.9, "hot", "cold-" +
                    pd.Series(rng.integers(0, 50, n)).astype(str))
    t = pa.table({"k": keys, "id": np.arange(n, dtype=np.int64),
                  "v": rng.integers(0, 100, n)})
    ds = ray.data.from_arrow(t).repartition(8)
    out = salted_group_sum(ds, keys=["k"], value_col="v", id_col="id",
                           salt_buckets=8).to_pandas()
    naive = t.to_pandas().groupby("k")["v"].agg(["sum", "count"]).reset_index()
    merged = out.merge(naive, on="k")
    assert len(merged) == len(naive)
    assert (merged["agg_sum"] == merged["sum"]).all()
    assert (merged["agg_count"] == merged["count"]).all()


def test_per_row_agg_type_override():
    """C2 fidelity: gauges default to AVG, overridable per datapoint via an
    agg-type attribute (aggregate.go:215-223) — expressed columnar by
    including the override column in the group keys and projecting the
    matching statistic per row."""
    t = pa.table({
        "name": ["m", "m", "m", "m", "m", "m"],
        "ts_ms": [0, 0, 0, 0, 0, 0],
        "agg_type": ["avg", "avg", "max", "max", "sum", "sum"],
        "value": [1.0, 3.0, 5.0, 9.0, 2.0, 10.0],
    })
    out = interval_aggregate(ray.data.from_arrow(t), ts_col="ts_ms",
                             interval_ms=10_000, keys=["name", "agg_type"],
                             value_col="value").to_pandas()
    import numpy as _np
    chosen = {
        r["agg_type"]: {"avg": r["agg_avg"], "max": r["agg_max"],
                        "sum": r["agg_sum"]}[r["agg_type"]]
        for _, r in out.iterrows()
    }
    assert chosen == {"avg": 2.0, "max": 9.0, "sum": 12.0}


def test_driver_mode_overflow_falls_back_to_shuffle(monkeypatch):
    """Both driver-merge entry points must detect partials above the cap and
    fall back to the distributed shuffle with identical results."""
    import cardinalhq_otel_collector_ray.stages.aggregate as agg_mod
    t = pa.table({
        "name": ["a", "b", "c", "a", "b", "c"],
        "ts_ms": [0, 0, 0, 20_000, 20_000, 20_000],
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
    })
    ds = ray.data.from_arrow(t)
    expected = interval_aggregate(ds, ts_col="ts_ms", interval_ms=10_000,
                                  keys=["name"], value_col="value",
                                  mode="shuffle").to_pandas() \
        .sort_values(["ts_ms", "name"]).reset_index(drop=True)
    monkeypatch.setattr(agg_mod, "MAX_DRIVER_ROWS", 1)  # force overflow
    via_driver = interval_aggregate(ds, ts_col="ts_ms", interval_ms=10_000,
                                    keys=["name"], value_col="value",
                                    mode="driver").to_pandas() \
        .sort_values(["ts_ms", "name"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        expected[sorted(expected.columns)], via_driver[sorted(via_driver.columns)])

    from cardinalhq_otel_collector_ray.stages.aggregate import grouped_aggregate
    g_shuffle = grouped_aggregate(ds, keys=["name"], value_col="value",
                                  mode="shuffle").to_pandas() \
        .sort_values("name").reset_index(drop=True)
    g_driver = grouped_aggregate(ds, keys=["name"], value_col="value",
                                 mode="driver").to_pandas() \
        .sort_values("name").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g_shuffle[sorted(g_shuffle.columns)], g_driver[sorted(g_driver.columns)])


def test_merge_partials_three_modes_equivalent(monkeypatch):
    """m4_downsample / grouped_weighted_avg / grouped_corr finish through
    merge_partials: driver, forced-overflow-fallback and partitioned modes
    must all produce identical frames (the VERDICT-r02 guard unification)."""
    import cardinalhq_otel_collector_ray.stages.aggregate as agg_mod
    from cardinalhq_otel_collector_ray.stages.aggregate import (
        grouped_corr, grouped_linreg, grouped_weighted_avg, m4_downsample)
    rng = np.random.default_rng(7)
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 5, n).astype("int64")),
        "ts": pa.array(np.arange(n, dtype="int64") * 137),
        "v": pa.array(rng.integers(0, 1000, n).astype("int64")),
        "w": pa.array(rng.integers(1, 9, n).astype("int64")),
    })
    ds = ray.data.from_arrow(t).repartition(6)

    def runs(fn):
        base = fn(ds, mode="driver")
        monkeypatch.setattr(agg_mod, "MAX_DRIVER_ROWS", 1)
        fallback = fn(ds, mode="driver")
        monkeypatch.setattr(agg_mod, "MAX_DRIVER_ROWS", 20_000_000)
        part = fn(ds, mode="partitioned")
        return base, fallback, part

    for fn in (
        lambda d, mode: m4_downsample(d, ["k"], "ts", "v", 10_000, mode=mode),
        lambda d, mode: grouped_weighted_avg(d, ["k"], "v", "w", mode=mode),
        lambda d, mode: grouped_corr(d, ["k"], "v", "w", mode=mode),
        lambda d, mode: grouped_linreg(d, ["k"], "ts", "v", mode=mode),
    ):
        base, fallback, part = runs(fn)
        key_cols = [c for c in ("k", "bucket_ms") if c in base.columns]
        def norm(df):
            df = df.sort_values(key_cols).reset_index(drop=True)
            return df[sorted(df.columns)].astype(
                {c: "int64" for c in df.columns
                 if str(df[c].dtype).startswith(("int", "uint"))})
        pd.testing.assert_frame_equal(norm(base), norm(fallback))
        pd.testing.assert_frame_equal(norm(base), norm(part))


def test_merge_partials_rejects_unknown_mode():
    from cardinalhq_otel_collector_ray.stages.aggregate import grouped_weighted_avg
    ds = ray.data.from_arrow(pa.table({"k": [1], "v": [1], "w": [1]}))
    with pytest.raises(ValueError, match="unknown merge mode"):
        grouped_weighted_avg(ds, ["k"], "v", "w", mode="coordinator")


def test_grouped_linreg_matches_numpy_polyfit():
    """OLS slope/intercept per key == numpy lstsq on the same points."""
    from cardinalhq_otel_collector_ray.stages.aggregate import grouped_linreg
    rng = np.random.default_rng(3)
    n = 300
    k = rng.integers(0, 3, n).astype("int64")
    x = rng.integers(0, 1000, n).astype("int64")
    y = (5 * x + 100 * k + rng.integers(-50, 50, n)).astype("int64")
    ds = ray.data.from_arrow(pa.table({"k": k, "x": x, "y": y})).repartition(4)
    out = grouped_linreg(ds, ["k"], "x", "y").set_index("k")
    for kk in (0, 1, 2):
        m = k == kk
        slope, intercept = np.polyfit(x[m].astype(float), y[m].astype(float), 1)
        assert abs(out.loc[kk, "slope"] - slope) < 1e-4
        assert abs(out.loc[kk, "intercept"] - intercept) < 1e-2
        assert out.loc[kk, "n"] == int(m.sum())


def test_grouped_linreg_zero_variance_is_null_like():
    """A zero-x-variance group yields NaN slope/intercept — matching
    DuckDB, where float division by zero is NULL (NaN in fetchdf)."""
    from cardinalhq_otel_collector_ray.stages.aggregate import grouped_linreg
    t = pa.table({"k": pa.array([0, 0, 1, 1], type=pa.int64()),
                  "x": pa.array([5, 5, 1, 2], type=pa.int64()),
                  "y": pa.array([10, 20, 1, 2], type=pa.int64())})
    out = grouped_linreg(ray.data.from_arrow(t), ["k"], "x", "y") \
        .set_index("k")
    assert np.isnan(out.loc[0, "slope"]) and np.isnan(out.loc[0, "intercept"])
    assert out.loc[1, "slope"] == 1.0


def test_merge_partials_as_dataset_stays_distributed():
    """as_dataset=True returns a Dataset with identical content and never
    pulls the merged result through the driver (the ADVICE-r3 contract for
    overflow-prone callers) — both modes."""
    from cardinalhq_otel_collector_ray.stages.aggregate import merge_partials
    rng = np.random.default_rng(3)
    n = 300
    partials = ray.data.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 7, n).astype("int64")),
        "s": pa.array(rng.integers(0, 100, n).astype("int64")),
        "mx": pa.array(rng.integers(0, 100, n).astype("int64")),
    })).repartition(5)
    spec = [("s", "sum"), ("mx", "max")]
    want = merge_partials(partials, ["k"], spec, mode="driver") \
        .sort_values("k").reset_index(drop=True)
    for mode in ("driver", "partitioned"):
        got = merge_partials(partials, ["k"], spec, mode=mode,
                             as_dataset=True)
        assert isinstance(got, ray.data.Dataset)
        gdf = got.to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(gdf[want.columns], want)
