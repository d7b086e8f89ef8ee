"""Incremental streaming aggregation vs the batch path (same semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from cardinalhq_otel_collector_ray.stages.streaming import (
    MicroBatchAggregator, streaming_interval_aggregate)


def test_microbatch_incremental_emission():
    agg = MicroBatchAggregator(keys=["name"], ts_col="ts", value_col="v",
                               interval_ms=10)
    # interval [0,10): values 1,2  — nothing closes while watermark < 10
    out1 = agg.consume(pa.table({"name": ["a", "a"], "ts": [1, 5], "v": [1, 2]}))
    assert out1.num_rows == 0
    # ts=25 → watermark 25 → interval 0 AND 10 close; 10s bucket empty for a
    out2 = agg.consume(pa.table({"name": ["a"], "ts": [25], "v": [10]}))
    rows = out2.to_pylist()
    assert len(rows) == 1
    assert rows[0] == {"interval_start": 0, "name": "a", "agg_sum": 3,
                       "agg_count": 2, "agg_min": 1, "agg_max": 2}
    # golden 1+2+3 → 6 on flush (metrics_test.go:70-116 shape)
    agg2 = MicroBatchAggregator(keys=["name"], ts_col="ts", value_col="v",
                                interval_ms=10_000)
    agg2.consume(pa.table({"name": ["t", "t", "t"],
                           "ts": [10_500, 11_500, 12_500], "v": [1, 2, 3]}))
    final = agg2.flush().to_pylist()
    assert len(final) == 1 and final[0]["agg_sum"] == 6 \
        and final[0]["interval_start"] == 10_000


def test_allowed_lateness_holds_interval_open():
    agg = MicroBatchAggregator(keys=["name"], ts_col="ts", value_col="v",
                               interval_ms=10, allowed_lateness_ms=10)
    out = agg.consume(pa.table({"name": ["a", "a"], "ts": [1, 15], "v": [1, 5]}))
    assert out.num_rows == 0  # watermark 5 → interval 0 still open
    late = agg.consume(pa.table({"name": ["a"], "ts": [9], "v": [100]}))
    assert late.num_rows == 0  # late record still absorbed
    final = agg.flush().to_pandas().set_index("interval_start")
    assert final.loc[0, "agg_sum"] == 101  # late row counted


def test_streaming_matches_batch(sf_dir):
    """Actor-per-bucket streaming over event micro-batches == batch groupby."""
    t = pq.read_table(f"{sf_dir}/events.parquet",
                      columns=["event_type", "ts", "value"])
    ts_ms = (t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) // 1000)
    cents = np.round(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
    full = pa.table({"event_type": t["event_type"],
                     "ts_ms": pa.array(ts_ms), "v": pa.array(cents)})
    # stream in arrival (ts) order, 7 micro-batches
    order = np.argsort(ts_ms, kind="stable")
    full = full.take(pa.array(order))
    chunks = [full.slice(i, 150) for i in range(0, full.num_rows, 150)]
    out = streaming_interval_aggregate(
        chunks, keys=["event_type"], ts_col="ts_ms", value_col="v",
        interval_ms=3_600_000, key_col_for_bucket="event_type",
        num_buckets=3).to_pandas()
    expect = full.to_pandas()
    expect["interval_start"] = (expect["ts_ms"] // 3_600_000) * 3_600_000
    want = expect.groupby(["interval_start", "event_type"])["v"] \
        .agg(["sum", "count", "min", "max"]).reset_index()
    merged = out.merge(want, on=["interval_start", "event_type"])
    assert len(merged) == len(want) == len(out)
    assert (merged["agg_sum"] == merged["sum"]).all()
    assert (merged["agg_count"] == merged["count"]).all()
    assert (merged["agg_min"] == merged["min"]).all()
    assert (merged["agg_max"] == merged["max"]).all()


def test_streaming_dedup_matches_batch_interval_dedup():
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from cardinalhq_otel_collector_ray.stages.streaming import StreamingDeduper
    rng = np.random.default_rng(8)
    n = 600
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "ts": np.sort(rng.integers(0, 5000, n)).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    })
    dd = StreamingDeduper(["k"], "ts", "id", interval_ms=1000)
    out = []
    for i in range(0, n, 100):
        out.append(dd.consume(pa.Table.from_pandas(df.iloc[i:i+100])))
    out.append(dd.flush())
    got = (pa.concat_tables([t for t in out if t.num_rows],
                            promote_options="default").to_pandas()
           .sort_values(["interval_start", "k"]).reset_index(drop=True))
    # batch-side reference
    ref = df.assign(iv=(df["ts"] // 1000) * 1000)
    exp = (ref.sort_values(["iv", "k", "ts", "id"])
           .groupby(["iv", "k"], as_index=False)
           .agg(first_ts=("ts", "min"), n=("ts", "size")))
    exp_first_id = (ref.sort_values(["ts", "id"])
                    .groupby(["iv", "k"], as_index=False).first())
    assert got["interval_start"].tolist() == exp["iv"].tolist()
    assert got["first_ts"].tolist() == exp["first_ts"].tolist()
    assert got["n_dropped_plus_one"].tolist() == exp["n"].tolist()
    assert got["first_tiebreak"].tolist() == exp_first_id["id"].tolist()


def test_streaming_dedup_watermark_and_lateness():
    import pyarrow as pa

    from cardinalhq_otel_collector_ray.stages.streaming import StreamingDeduper
    dd = StreamingDeduper(["k"], "ts", "id", interval_ms=10,
                          allowed_lateness_ms=5)
    t1 = pa.table({"k": ["x"], "ts": [3], "id": [0]})
    assert dd.consume(t1).num_rows == 0          # interval 0 still open
    t2 = pa.table({"k": ["x"], "ts": [22], "id": [1]})
    out = dd.consume(t2)                          # watermark 17 closes [0,10)
    assert out.num_rows == 1 and out["interval_start"][0].as_py() == 0
    # a late row for a CLOSED interval opens fresh state (no silent
    # drop) and — the watermark already being past it — re-emits as its
    # own late record immediately: the reference's late-data rule ("a
    # late dp lands in a new state entry for its own interval", §2.4)
    t3 = pa.table({"k": ["x"], "ts": [4], "id": [2]})
    out3 = dd.consume(t3)
    assert out3.num_rows == 1 and out3["interval_start"][0].as_py() == 0
    assert out3["n_dropped_plus_one"][0].as_py() == 1
    fin = dd.flush().to_pandas()
    assert fin["interval_start"].tolist() == [20]


def test_streaming_sessionizer_matches_batch_sessionize():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from cardinalhq_otel_collector_ray.stages.streaming import (
        StreamingSessionizer)
    from cardinalhq_otel_collector_ray.stages.temporal import sessionize
    rng = np.random.default_rng(13)
    n = 800
    df = pd.DataFrame({
        "u": rng.integers(0, 25, n),
        "ts": np.sort(rng.integers(0, 20_000, n)).astype(np.int64),
    })
    ss = StreamingSessionizer("u", "ts", gap_ms=300)
    out = []
    for i in range(0, n, 120):
        out.append(ss.consume(pa.Table.from_pandas(df.iloc[i:i+120])))
    out.append(ss.flush())
    got = (pa.concat_tables([t for t in out if t.num_rows],
                            promote_options="default").to_pandas()
           .sort_values(["u", "session_start"]).reset_index(drop=True))
    ref = (sessionize(ray.data.from_pandas(df), "u", "ts", gap_ms=300,
                      num_partitions=4).to_pandas()
           .sort_values(["u", "session_start"]).reset_index(drop=True))
    assert got["u"].tolist() == ref["u"].tolist()
    assert got["session_start"].tolist() == ref["session_start"].tolist()
    assert got["session_end"].tolist() == ref["session_end"].tolist()
    assert got["n_events"].tolist() == ref["n_events"].tolist()


def test_streaming_sessionizer_cross_batch_continuation():
    import pyarrow as pa

    from cardinalhq_otel_collector_ray.stages.streaming import (
        StreamingSessionizer)
    ss = StreamingSessionizer("u", "ts", gap_ms=100)
    # session spans two batches; an idle key closes by watermark
    assert ss.consume(pa.table({"u": ["a", "b"], "ts": [10, 20]})).num_rows == 0
    out = ss.consume(pa.table({"u": ["a"], "ts": [80]}))
    # watermark 80: b's last ts 20 not yet stale (80-20 <= 100) → nothing
    assert out.num_rows == 0
    out = ss.consume(pa.table({"u": ["a"], "ts": [500]}))
    # a's open session (10..80) closed by the 500-80>100 gap AND b idle
    got = out.to_pandas().sort_values("u")
    assert got["u"].tolist() == ["a", "b"]
    assert got[got["u"] == "a"]["session_end"].tolist() == [80]
    assert got[got["u"] == "a"]["n_events"].tolist() == [2]
    fin = ss.flush().to_pandas()
    assert fin["session_start"].tolist() == [500]


def test_late_policy_drop_discards_and_counts():
    """A row whose interval the watermark already closed is dropped and
    counted under late_policy="drop"; under "absorb" it re-opens the
    interval and re-emits a duplicate row at flush."""
    mk = lambda policy: MicroBatchAggregator(
        keys=["name"], ts_col="ts", value_col="v", interval_ms=10,
        late_policy=policy)
    drop, absorb = mk("drop"), mk("absorb")
    first = pa.table({"name": ["a"], "ts": [25], "v": [10]})
    late = pa.table({"name": ["a"], "ts": [5], "v": [100]})
    emitted = {}
    for which, agg in (("drop", drop), ("absorb", absorb)):
        assert agg.consume(first).num_rows == 0
        # the late row's interval (0) is already closed (boundary 20);
        # absorb re-opens it and re-emits it IMMEDIATELY (still closed)
        parts = [agg.consume(late), agg.flush()]
        emitted[which] = pa.concat_tables(
            [p for p in parts if p.num_rows]).to_pylist()
    d, a = emitted["drop"], emitted["absorb"]
    # drop: interval 0 never re-opens; absorb: it is re-emitted with v=100
    assert [r["interval_start"] for r in d] == [20]
    assert drop.late_dropped == 1
    assert sorted(r["interval_start"] for r in a) == [0, 20]
    assert absorb.late_dropped == 0
    # a late row arriving in the SAME batch as the watermark-advancing row
    # is not late (boundary is computed before the batch is absorbed)
    same = mk("drop")
    out = same.consume(pa.table({"name": ["a", "a"], "ts": [25, 5],
                                 "v": [1, 2]}))
    assert same.late_dropped == 0
    assert {r["interval_start"] for r in out.to_pylist()} == {0}


import pytest


@pytest.mark.parametrize("seed,lateness,B", [
    (42, 3_000, 97), (7, 0, 64), (13, 12_000, 251), (99, 3_000, 17)])
def test_late_policy_drop_matches_naive_simulation(seed, lateness, B):
    """Seeded out-of-order stream: the vectorized drop path == a naive
    per-row Python replay of the watermark state machine — across
    lateness (incl. zero) and chunk-size regimes."""
    rng = np.random.default_rng(seed)
    n = 2_000
    ts = np.sort(rng.integers(0, 500_000, n))
    jitter = rng.integers(0, 20_000, n)
    arrival = np.argsort(ts + jitter, kind="stable")
    names = rng.choice(["a", "b", "c"], n)
    vals = rng.integers(-50, 50, n)
    interval = 10_000
    # naive replay
    wm, dropped, kept = -(2**62), 0, []
    order = list(arrival)
    for s in range(0, n, B):
        idx = order[s:s + B]
        boundary = (wm // interval) * interval
        for i in idx:
            if (ts[i] // interval) * interval + interval <= boundary:
                dropped += 1
            else:
                kept.append(i)
        wm = max(wm, max(ts[i] for i in idx) - lateness)
    agg = MicroBatchAggregator(keys=["name"], ts_col="ts", value_col="v",
                               interval_ms=interval,
                               allowed_lateness_ms=lateness,
                               late_policy="drop")
    t = pa.table({"name": names, "ts": ts, "v": vals}).take(pa.array(arrival))
    parts = [agg.consume(t.slice(s, B)) for s in range(0, n, B)]
    parts.append(agg.flush())
    got = pa.concat_tables([p for p in parts if p.num_rows]).to_pandas()
    assert agg.late_dropped == dropped and dropped > 0
    exp = (pd.DataFrame({"name": names[kept],
                         "interval_start": (ts[kept] // interval) * interval,
                         "v": vals[kept]})
           .groupby(["interval_start", "name"])["v"]
           .agg(agg_sum="sum", agg_count="count", agg_min="min",
                agg_max="max").reset_index())
    got = got.sort_values(["interval_start", "name"]).reset_index(drop=True)
    exp = exp.sort_values(["interval_start", "name"]).reset_index(drop=True)
    # drop policy ⇒ each (interval, key) emitted exactly once
    assert not got.duplicated(["interval_start", "name"]).any()
    pd.testing.assert_frame_equal(
        got[exp.columns].astype({"agg_sum": "int64", "agg_count": "int64",
                                 "agg_min": "int64", "agg_max": "int64"}),
        exp.astype({"agg_sum": "int64", "agg_count": "int64",
                    "agg_min": "int64", "agg_max": "int64"}))
    # a fresh-instance replay over the same chunking is deterministic
    agg2 = MicroBatchAggregator(keys=["name"], ts_col="ts", value_col="v",
                                interval_ms=interval,
                                allowed_lateness_ms=lateness,
                                late_policy="drop")
    outs = [agg2.consume(t.slice(s2, B)) for s2 in range(0, n, B)]
    outs.append(agg2.flush())
    again = pa.concat_tables([p for p in outs if p.num_rows]).to_pandas()
    assert agg2.late_dropped == dropped
    pd.testing.assert_frame_equal(
        again.sort_values(["interval_start", "name"]).reset_index(drop=True),
        pa.concat_tables([p for p in parts if p.num_rows]).to_pandas()
        .sort_values(["interval_start", "name"]).reset_index(drop=True))


def test_streaming_aggregate_bucket_col_and_late_metric():
    """bucket_col routes by an explicit numeric column; return_late_count
    surfaces the summed per-actor late metric."""
    t = pa.table({"k": ["x", "y"] * 4,
                  "bkt": [0, 1] * 4,
                  "ts": [25, 25, 5, 5, 30, 30, 40, 40],
                  "v": [1, 4, 100, 200, 2, 5, 3, 6]})
    chunks = [t.slice(i, 2) for i in range(0, 8, 2)]
    out, late = streaming_interval_aggregate(
        chunks, keys=["k"], ts_col="ts", value_col="v", interval_ms=10,
        key_col_for_bucket="k", bucket_col="bkt", num_buckets=2,
        late_policy="drop", return_late_count=True)
    # per bucket: chunk 0's ts=25 closes interval 0, so chunk 1's ts=5
    # row (arriving in the NEXT sub-batch of each bucket) is late
    assert late == 2
    df = out.to_pandas()
    assert not df.duplicated(["k", "interval_start"]).any()
    assert 100 not in df["agg_sum"].values and 200 not in df["agg_sum"].values


def test_streaming_dedup_late_policy_drop():
    """StreamingDeduper drop policy: a late duplicate neither re-opens its
    closed interval nor inflates the suppressed count."""
    from cardinalhq_otel_collector_ray.stages.streaming import StreamingDeduper
    mk = lambda p: StreamingDeduper(keys=["k"], ts_col="ts",
                                    tiebreak_col="tb", interval_ms=10,
                                    late_policy=p)
    drop, absorb = mk("drop"), mk("absorb")
    out = {}
    for which, d in (("drop", drop), ("absorb", absorb)):
        p1 = d.consume(pa.table({"k": ["a", "a"], "ts": [1, 3],
                                 "tb": [7, 8]}))
        p2 = d.consume(pa.table({"k": ["a"], "ts": [25], "tb": [9]}))
        # interval 0 closed (boundary 20); ts=5 is late
        p3 = d.consume(pa.table({"k": ["a"], "ts": [5], "tb": [1]}))
        out[which] = pa.concat_tables(
            [p for p in (p1, p2, p3, d.flush()) if p.num_rows]).to_pandas()
    d_iv = out["drop"]["interval_start"].tolist()
    a_iv = out["absorb"]["interval_start"].tolist()
    assert sorted(d_iv) == [0, 20] and drop.late_dropped == 1
    # absorb re-emits interval 0 a second time with the late row as "first"
    assert sorted(a_iv) == [0, 0, 20] and absorb.late_dropped == 0
    first_emit = out["drop"][out["drop"]["interval_start"] == 0]
    assert first_emit["first_ts"].tolist() == [1]
    assert first_emit["n_dropped_plus_one"].tolist() == [2]


def test_calls_per_rpc_grouping_is_transparent():
    """calls_per_rpc only amortizes dispatch: grouped and ungrouped runs
    produce identical emissions and late counts."""
    rng = np.random.default_rng(5)
    n = 1_200
    t = pa.table({"k": rng.choice(["a", "b", "c", "d"], n),
                  "bkt": rng.integers(0, 2, n),
                  "ts": np.sort(rng.integers(0, 80_000, n)),
                  "v": rng.integers(0, 100, n)})
    # shuffle arrival deterministically
    t = t.take(pa.array(np.argsort(rng.permutation(n), kind="stable")))
    chunks = [t.slice(i, 60) for i in range(0, n, 60)]
    runs = {}
    for rpc in (1, 8):
        out, late = streaming_interval_aggregate(
            chunks, keys=["k"], ts_col="ts", value_col="v",
            interval_ms=5_000, key_col_for_bucket="k", bucket_col="bkt",
            num_buckets=2, allowed_lateness_ms=2_000, late_policy="drop",
            calls_per_rpc=rpc, return_late_count=True)
        runs[rpc] = (out.to_pandas()
                     .sort_values(["k", "interval_start"])
                     .reset_index(drop=True), late)
    assert runs[1][1] == runs[8][1] and runs[1][1] > 0
    pd.testing.assert_frame_equal(runs[1][0], runs[8][0])
