"""Edge-case goldens for the round-2 second-pass operators: two-step
funnel, ROWS-frame moving window, ROLLUP levels, integer-exact Pearson
correlation, inverted-index build."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from cardinalhq_otel_collector_ray.stages.aggregate import (grouped_corr,
                                                            rollup_aggregate)
from cardinalhq_otel_collector_ray.stages.relevance import inverted_index
from cardinalhq_otel_collector_ray.stages.temporal import funnel_match
from cardinalhq_otel_collector_ray.stages.window import windowed_moving_agg


def _events(rows):
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["user_id", "event_type", "ts_ms"]))


def test_funnel_basic_and_window_cutoff():
    ds = _events([
        (1, "view", 100), (1, "purchase", 150),        # completes
        (2, "view", 100), (2, "purchase", 2000),       # outside window
        (3, "purchase", 50), (3, "view", 100),         # B before A only
        (4, "view", 100), (4, "view", 50), (4, "purchase", 70),
    ])
    out = (funnel_match(ds, "user_id", "ts_ms", "event_type",
                        "view", "purchase", window_ms=500, num_partitions=2)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    # user 4: first view at 50, purchase at 70 is >= 50 and within window
    assert out["user_id"].tolist() == [1, 4]
    assert out["first_a_ms"].tolist() == [100, 50]
    assert out["first_b_ms"].tolist() == [150, 70]


def test_funnel_same_timestamp_counts():
    ds = _events([(7, "view", 100), (7, "purchase", 100)])
    out = funnel_match(ds, "user_id", "ts_ms", "event_type",
                       "view", "purchase", window_ms=10,
                       num_partitions=2).to_pandas()
    assert out["first_b_ms"].tolist() == [100]


def test_moving_agg_frame_and_segments():
    df = pd.DataFrame({
        "k": ["a"] * 6 + ["b"] * 2,
        "ts": [1, 2, 3, 4, 5, 6, 1, 2],
        "v": [10, 20, 30, 40, 50, 60, 7, 9],
        "id": range(8),
    })
    out = (windowed_moving_agg(ray.data.from_pandas(df), ["k"], "ts", "v",
                               "id", window_rows=3, num_partitions=2)
           .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True))
    # trailing-3 sums within "a": 10, 30, 60, 90, 120, 150
    assert out.loc[out["k"] == "a", "mov_sum"].tolist() == [10, 30, 60, 90, 120, 150]
    assert out.loc[out["k"] == "a", "mov_n"].tolist() == [1, 2, 3, 3, 3, 3]
    # lag_delta: 0 on each segment's first row; never crosses into "b"
    assert out.loc[out["k"] == "a", "lag_delta"].tolist() == [0, 10, 10, 10, 10, 10]
    assert out.loc[out["k"] == "b", "mov_sum"].tolist() == [7, 16]
    assert out.loc[out["k"] == "b", "lag_delta"].tolist() == [0, 2]
    a = out.loc[out["k"] == "a"]
    assert np.allclose(a["mov_avg"], a["mov_sum"] / a["mov_n"])


def test_rollup_levels_are_consistent():
    df = pd.DataFrame({"t": ["x", "x", "y"], "h": [0, 1, 0],
                       "v": [5, 7, 11]})
    out = rollup_aggregate(ray.data.from_pandas(df), ["t", "h"], "v",
                           sentinels={"t": "_ALL_", "h": -1})
    total = out[out["level"] == 0]
    assert total["agg_sum"].tolist() == [23]
    assert total["agg_count"].tolist() == [3]
    assert total["t"].tolist() == ["_ALL_"] and total["h"].tolist() == [-1]
    by_t = out[out["level"] == 1].sort_values("t")
    assert by_t["agg_sum"].tolist() == [12, 11]
    assert (by_t["h"] == -1).all()
    finest = out[out["level"] == 2]
    assert finest["agg_sum"].sum() == 23 and len(finest) == 3
    # dtypes survive the sentinel fill
    assert str(out["h"].dtype) == "int64"


def test_grouped_corr_perfect_and_inverse():
    df = pd.DataFrame({
        "g": ["p"] * 4 + ["n"] * 4,
        "x": [1, 2, 3, 4, 1, 2, 3, 4],
        "y": [2, 4, 6, 8, 8, 6, 4, 2],
    })
    out = grouped_corr(ray.data.from_pandas(df, override_num_blocks=3),
                       ["g"], "x", "y").sort_values("g")
    assert out["corr"].tolist() == [-1.0, 1.0]
    assert out["n"].tolist() == [4, 4]


def test_inverted_index_dedups_and_sorts():
    import pyarrow as pa
    t = pa.table({
        "doc_id": pa.array([10, 3, 7], pa.int64()),
        "tokens": pa.array([[1, 2, 1, 1], [2], [1, 5]],
                           pa.list_(pa.int32())),
    })
    out = (inverted_index(ray.data.from_arrow(t), num_partitions=4)
           .to_pandas().sort_values("token").reset_index(drop=True))
    assert out["token"].tolist() == [1, 2, 5]
    assert [list(p) for p in out["postings"]] == [[7, 10], [3, 10], [7]]
    assert out["df"].tolist() == [2, 2, 1]


def test_grouped_argmax_ties_pick_smallest_arg():
    from cardinalhq_otel_collector_ray.stages.aggregate import grouped_argmax
    df = pd.DataFrame({
        "g": ["a", "a", "a", "b", "b"],
        "v": [5, 9, 9, 2, 2],
        "i": [100, 42, 7, 3, 1],
    })
    out = grouped_argmax(ray.data.from_pandas(df, override_num_blocks=3),
                         ["g"], "v", "i").sort_values("g").reset_index(drop=True)
    assert out["max_v"].tolist() == [9, 2]
    assert out["argmax_i"].tolist() == [7, 1]
    # partitioned mode agrees
    out2 = grouped_argmax(ray.data.from_pandas(df, override_num_blocks=3),
                          ["g"], "v", "i", mode="partitioned",
                          num_partitions=4).sort_values("g").reset_index(drop=True)
    assert out2["max_v"].tolist() == [9, 2]
    assert out2["argmax_i"].tolist() == [7, 1]


def test_token_entropy_golden():
    import math

    import pyarrow as pa

    from cardinalhq_otel_collector_ray.stages.textstats import token_entropy
    t = pa.table({
        "doc_id": pa.array(["u", "h", "e"], pa.string()),
        "tokens": pa.array([[3, 3, 3, 3], [1, 2, 1, 2], []],
                           pa.list_(pa.int32())),
    })
    out = (token_entropy(ray.data.from_arrow(t))
           .to_pandas().set_index("doc_id"))
    assert out.loc["u", "entropy"] == 0.0          # uniform single token
    assert out.loc["u", "n_distinct"] == 1
    assert abs(out.loc["h", "entropy"] - math.log(2)) < 1e-6
    assert "e" not in out.index                     # empty doc dropped


def test_pack_sequences_layout():
    from cardinalhq_otel_collector_ray.stages.packing import pack_sequences
    df = pd.DataFrame({
        "src": ["a"] * 4 + ["b"] * 2,
        "doc": [1, 2, 3, 4, 1, 2],
        "n": [300, 300, 100, 600, 512, 1],
    })
    out = (pack_sequences(ray.data.from_pandas(df), "src", "doc", "n",
                          context_len=512, num_partitions=2)
           .to_pandas().sort_values(["src", "doc"]).reset_index(drop=True))
    a = out[out["src"] == "a"]
    # exclusive cumsum: 0, 300, 600, 700 → bins 0,0,1,1; offsets 0,300,88,188
    assert a["bin_id"].tolist() == [0, 0, 1, 1]
    assert a["bin_offset"].tolist() == [0, 300, 88, 188]
    b = out[out["src"] == "b"]
    # second source starts fresh: 0, 512 → bin 0 off 0, bin 1 off 0
    assert b["bin_id"].tolist() == [0, 1]
    assert b["bin_offset"].tolist() == [0, 0]


def test_dataset_split_deterministic_and_complete():
    from cardinalhq_otel_collector_ray.functions.hashing import mulhash
    from cardinalhq_otel_collector_ray.stages.packing import dataset_split
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    out = dataset_split(ray.data.from_pandas(df, override_num_blocks=4),
                        "doc_id").to_pandas()
    h = mulhash(out["doc_id"].to_numpy(), mod=100)
    expect = np.where(h < 80, "train", np.where(h < 90, "val", "test"))
    assert (out["split"].to_numpy() == expect).all()
    # all three subsets non-empty and disjoint-by-construction
    assert set(out["split"].unique()) == {"train", "val", "test"}


def test_contamination_flags_composition():
    import pyarrow as pa

    from cardinalhq_otel_collector_ray.stages.relevance import (
        contamination_flags)
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["c1", "c2"], pa.string()),
        "tokens": pa.array([[1, 2, 3, 9], [7, 8, 9]], pa.list_(pa.int32())),
    }))
    bench = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["b1"], pa.string()),
        "tokens": pa.array([[0, 1, 2, 3]], pa.list_(pa.int32())),
    }))
    out = (contamination_flags(corpus, bench, n=3, vocab_size=10)
           .to_pandas().set_index("doc_id"))
    assert bool(out.loc["c1", "contaminated"])      # shares (1,2,3)
    assert int(out.loc["c1", "n_shared"]) == 1
    assert not bool(out.loc["c2", "contaminated"])  # (7,8,9) not in bench


def test_spec_kinds_pack_split_funnel(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    spec = {
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "n_chars", "source"]},
        "stages": [
            {"kind": "dataset_split", "id": "doc_id"},
            {"kind": "pack_sequences", "key": "source", "order": "doc_id",
             "len": "n_chars", "context_len": 2048},
        ],
    }
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert {"split", "bin_id", "bin_offset"} <= set(out.columns)
    assert len(out) > 0


def test_spec_kind_shuffle_shards(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    spec = {
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id"]},
        "stages": [{"kind": "shuffle_shards", "id": "doc_id",
                    "num_shards": 4}],
    }
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert {"doc_id", "shard", "pos"} == set(out.columns)
    assert out["shard"].nunique() <= 4
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"].tolist()) == list(range(len(g)))


def test_retention_cohorts_pairs():
    from cardinalhq_otel_collector_ray.stages.temporal import retention_cohorts
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "ts": [5, 15, 15, 25, 35],   # bucket=10 → u1: {0,1}, u2: {2,3}
    })
    out = (retention_cohorts(ray.data.from_pandas(df), "u", "ts",
                             bucket_ms=10, num_partitions=2)
           .to_pandas().sort_values(["u", "active_ms"]).reset_index(drop=True))
    assert out[out["u"] == 1]["cohort_ms"].tolist() == [0, 0]
    assert out[out["u"] == 1]["active_ms"].tolist() == [0, 10]
    assert out[out["u"] == 2]["cohort_ms"].tolist() == [20, 20]
    assert out[out["u"] == 2]["active_ms"].tolist() == [20, 30]


def test_grouped_median_mad_golden():
    from cardinalhq_otel_collector_ray.stages.window import grouped_median_mad
    df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 4,
                       "v": [1, 3, 5, 7, 100, 2, 4, 6, 8]})
    out = (grouped_median_mad(ray.data.from_pandas(df), ["g"], "v",
                              num_partitions=2)
           .to_pandas().sort_values("g").reset_index(drop=True))
    # a: median 5; devs {4,2,0,2,95} sorted {0,2,2,4,95} → MAD 2
    assert out.loc[0, "median"] == 5.0 and out.loc[0, "mad"] == 2.0
    # b (even): median (4+6)/2=5; devs {3,1,1,3} → MAD (1+3)/2=2
    assert out.loc[1, "median"] == 5.0 and out.loc[1, "mad"] == 2.0
    assert out["n"].tolist() == [5, 4]


def test_weighted_sample_deterministic_and_weight_biased():
    from cardinalhq_otel_collector_ray.stages.sample import (
        weighted_priority_sample)
    n = 2000
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "w": np.where(np.arange(n) < 1000, 1, 50)})
    ds = ray.data.from_pandas(df, override_num_blocks=4)
    a = weighted_priority_sample(ds, "id", "w", k=100)
    b = weighted_priority_sample(ray.data.from_pandas(df, override_num_blocks=7),
                                 "id", "w", k=100)
    # identical selection regardless of blocking
    assert a["id"].tolist() == b["id"].tolist()
    # heavy rows (w=50) dominate the sample
    assert (a["id"].to_numpy() >= 1000).sum() > 80


def test_training_data_prep_example_spec(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    spec = load_spec("/root/repo/examples/training_data_prep.yaml")
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert {"split", "bin_id", "bin_offset"} <= set(out.columns)
    # packing respects the context boundary
    assert (out["bin_offset"] < 2048).all()


def test_compression_ratio_ordering():
    import pyarrow as pa

    from cardinalhq_otel_collector_ray.stages.textstats import (
        compression_ratio)
    rng = np.random.default_rng(3)
    rand = "".join(chr(c) for c in rng.integers(33, 126, 2000))
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["spam " * 400,
                          "the quick brown fox jumps over the lazy dog " * 45,
                          rand]),
    })
    out = (compression_ratio(ray.data.from_arrow(t))
           .to_pandas().set_index("doc_id"))
    assert (out.loc[1, "compression_ratio"]
            < out.loc[2, "compression_ratio"]
            < out.loc[3, "compression_ratio"])
    # determinism across runs
    out2 = (compression_ratio(ray.data.from_arrow(t))
            .to_pandas().set_index("doc_id"))
    assert (out["compressed_bytes"] == out2["compressed_bytes"]).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_funnel_matches_naive_reference(seed):
    from cardinalhq_otel_collector_ray.stages.temporal import funnel_match
    rng = np.random.default_rng(seed)
    n = 400
    df = pd.DataFrame({
        "u": rng.integers(0, 40, n),
        "t": rng.choice(["view", "purchase", "click"], n),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
    })
    W = 200
    out = (funnel_match(ray.data.from_pandas(df, override_num_blocks=3),
                        "u", "ts", "t", "view", "purchase", W,
                        num_partitions=4)
           .to_pandas().sort_values("u").reset_index(drop=True))
    expect = []
    for u, g in df.groupby("u"):
        views = g.loc[g["t"] == "view", "ts"]
        if views.empty:
            continue
        a = views.min()
        b = g.loc[(g["t"] == "purchase") & (g["ts"] >= a)
                  & (g["ts"] - a <= W), "ts"]
        if not b.empty:
            expect.append((u, a, b.min()))
    expect = sorted(expect)
    got = list(zip(out["u"], out["first_a_ms"], out["first_b_ms"]))
    assert got == expect


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_sequences_matches_naive_reference(seed):
    from cardinalhq_otel_collector_ray.stages.packing import pack_sequences
    rng = np.random.default_rng(seed)
    n = 300
    df = pd.DataFrame({
        "src": rng.integers(0, 5, n),
        "doc": np.arange(n, dtype=np.int64),
        "len": rng.integers(1, 700, n).astype(np.int64),
    })
    L = 512
    out = (pack_sequences(ray.data.from_pandas(df, override_num_blocks=4),
                          "src", "doc", "len", L, num_partitions=3)
           .to_pandas().sort_values(["src", "doc"]).reset_index(drop=True))
    exp_bin, exp_off = [], []
    for _, g in df.sort_values(["src", "doc"]).groupby("src", sort=True):
        acc = 0
        for length in g["len"]:
            exp_bin.append(acc // L)
            exp_off.append(acc % L)
            acc += length
    assert out["bin_id"].tolist() == exp_bin
    assert out["bin_offset"].tolist() == exp_off


def test_range_partition_disjoint_and_balanced():
    from cardinalhq_otel_collector_ray.stages.rangesort import (
        range_partition_bounds, range_partition_stats)
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"v": rng.integers(0, 10_000, 20_000).astype(np.int64)})
    ds = ray.data.from_pandas(df, override_num_blocks=6)
    stats = range_partition_stats(ds, "v", num_partitions=8)
    assert stats["n"].sum() == 20_000
    # disjoint, ordered ranges
    assert (stats["max_val"].to_numpy()[:-1]
            < stats["min_val"].to_numpy()[1:]).all()
    # balanced to within the duplicate-value granularity
    assert stats["n"].max() < 2 * stats["n"].min() + 100
    # heavy duplicate value never straddles a boundary
    df2 = pd.DataFrame({"v": np.r_[np.full(5000, 7, dtype=np.int64),
                                   np.arange(5000, dtype=np.int64)]})
    b = range_partition_bounds(ray.data.from_pandas(df2), "v", 4)
    s2 = range_partition_stats(ray.data.from_pandas(df2), "v", 4)
    assert len(np.unique(b)) == len(b)
    assert (s2["max_val"].to_numpy()[:-1]
            < s2["min_val"].to_numpy()[1:]).all()


def test_write_sorted_range_partitioned(tmp_path):
    import pyarrow.parquet as pq

    from cardinalhq_otel_collector_ray.sinks import PartitionedSink
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "v": rng.integers(0, 100_000, 5000).astype(np.int64),
        "route": "main",
    })
    ds = ray.data.from_pandas(df, override_num_blocks=4)
    sink = PartitionedSink(str(tmp_path / "s"), run_ts=1706078400.0,
                           num_partitions=4)
    entries = sink.write_sorted(ds, sort_col="v")
    assert sum(e.rows for e in entries) == 5000
    # per-file ranges are disjoint+ordered by pid; rows sorted in-file
    by_pid = sorted(entries, key=lambda e: int(e.partition_id.rsplit("/", 1)[1]))
    prev_max = -1
    for e in by_pid:
        t = pq.read_table(e.path)
        vals = t["v"].to_numpy()
        assert (np.diff(vals) >= 0).all()
        assert vals[0] > prev_max
        prev_max = vals[-1]
    # resume: identical rerun writes nothing
    ds2 = ray.data.from_pandas(df, override_num_blocks=7)
    assert sink.write_sorted(ds2, sort_col="v") == []


def test_grouped_argmax_overflow_falls_back(monkeypatch):
    import cardinalhq_otel_collector_ray.stages.aggregate as agg
    monkeypatch.setattr(agg, "MAX_DRIVER_ROWS", 1)
    df = pd.DataFrame({"g": ["a", "b", "c"], "v": [3, 1, 2],
                       "i": [7, 8, 9]})
    out = agg.grouped_argmax(ray.data.from_pandas(df, override_num_blocks=3),
                             ["g"], "v", "i").sort_values("g").reset_index(drop=True)
    assert out["max_v"].tolist() == [3, 1, 2]
    assert out["argmax_i"].tolist() == [7, 8, 9]


def test_spec_kinds_median_mad_retention(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    spec = {
        "source": {"kind": "parquet", "table": "events",
                   "columns": ["event_id", "user_id", "event_type", "ts",
                               "value"]},
        "stages": [
            {"kind": "epoch_ms", "column": "ts", "out": "ts_ms"},
            {"kind": "retention", "user": "user_id", "ts": "ts_ms",
             "bucket_ms": 86400000},
        ],
    }
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert {"cohort_ms", "active_ms"} <= set(out.columns) and len(out) > 0


@pytest.mark.parametrize("seed", [0, 1])
def test_retention_matches_naive_reference(seed):
    from cardinalhq_otel_collector_ray.stages.temporal import retention_cohorts
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"u": rng.integers(0, 30, 500),
                       "ts": rng.integers(0, 10_000, 500).astype(np.int64)})
    B = 1000
    out = (retention_cohorts(ray.data.from_pandas(df, override_num_blocks=3),
                             "u", "ts", B, num_partitions=4)
           .to_pandas())
    got = set(zip(out["u"], out["cohort_ms"], out["active_ms"]))
    expect = set()
    for u, g in df.groupby("u"):
        cohort = (g["ts"].min() // B) * B
        for p in sorted(set((g["ts"] // B) * B)):
            expect.add((u, cohort, p))
    assert got == expect


@pytest.mark.parametrize("seed", [0, 1])
def test_grouped_concat_matches_naive(seed):
    from cardinalhq_otel_collector_ray.stages.window import grouped_concat
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"k": rng.integers(0, 10, 200),
                       "v": rng.choice(list("abc"), 200),
                       "o": rng.permutation(200)})
    out = (grouped_concat(ray.data.from_pandas(df, override_num_blocks=3),
                          ["k"], "v", ["o"], sep="-", num_partitions=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    expect = (df.sort_values(["k", "o"]).groupby("k")["v"]
              .agg("-".join).reset_index())
    assert out["joined"].tolist() == expect["v"].tolist()
    assert out["n"].sum() == 200


def test_range_bounds_match_numpy_rank_rule():
    from cardinalhq_otel_collector_ray.stages.rangesort import (
        range_partition_bounds)
    rng = np.random.default_rng(9)
    v = rng.integers(0, 500, 3000).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"v": v}), override_num_blocks=4)
    P = 8
    b = range_partition_bounds(ds, "v", P)
    sv = np.sort(v)
    expect = np.unique(sv[np.ceil(np.arange(1, P) * len(v) / P)
                          .astype(int) - 1])
    assert b.tolist() == expect.tolist()


def test_uuid7_unique_key_surface(tmp_path):
    """Transcribes partition_test.go:307-362 (UniqueKeyFunc/UUIDv7):
    500 keys unique + time-ordered + RFC-9562 format; filename matches
    the uuid pattern — made deterministic per (run_ts, partition) so
    retries stay idempotent (our intentional improvement)."""
    import re

    from cardinalhq_otel_collector_ray.sinks.partitioned import (
        PartitionedSink, deterministic_uuid7)
    ks = [deterministic_uuid7(1706078400.0, i) for i in range(500)]
    assert len(set(ks)) == 500
    assert ks == sorted(ks)
    pat = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}"
                     r"-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
    assert all(pat.match(k) for k in ks)
    sink = PartitionedSink(str(tmp_path), run_ts=1706078400.0,
                           unique_key="uuid7", file_prefix="collector-capture-")
    assert re.search(r"collector-capture-logs_[0-9a-f-]{36}\.parquet$",
                     sink.object_path("main", 3))
    # same (run_ts, pid) → same object path (idempotent retries)
    assert sink.object_path("main", 3) == sink.object_path("main", 3)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        PartitionedSink(str(tmp_path), run_ts=0.0, unique_key="wallclock")


def test_salted_join_equals_plain_on_skew():
    from cardinalhq_otel_collector_ray.stages.join import (bucketed_hash_join,
                                                           salted_hash_join)
    rng = np.random.default_rng(6)
    n = 4000
    # 90% of left rows share key 7
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, n))
    left = pd.DataFrame({"k": keys.astype(np.int64),
                         "lid": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 50, dtype=np.int64),
                          "attr": np.arange(100, 150, dtype=np.int64)})
    lds = ray.data.from_pandas(left, override_num_blocks=4)
    rds = ray.data.from_pandas(right, override_num_blocks=2)
    plain = (bucketed_hash_join(lds, rds, on="k", num_buckets=8)
             .to_pandas().sort_values(["k", "lid"]).reset_index(drop=True))
    salted = (salted_hash_join(
        ray.data.from_pandas(left, override_num_blocks=4),
        ray.data.from_pandas(right, override_num_blocks=2),
        on="k", salt_from="lid", num_buckets=8, salt=4, hot_share=0.05)
        .to_pandas().sort_values(["k", "lid"]).reset_index(drop=True))
    assert plain[["k", "lid", "attr"]].equals(salted[["k", "lid", "attr"]])


def test_salted_join_spreads_hot_key():
    from cardinalhq_otel_collector_ray.functions.hashing import mulhash
    # the salt id is a pure function of the salt_from column: the hot
    # key's rows land in `salt` distinct sub-buckets
    ids = np.arange(1000, dtype=np.int64)
    sids = mulhash(ids) % 4
    assert len(np.unique(sids)) == 4
    assert np.bincount(sids).max() < 400     # roughly even spread


def test_spec_join_table_and_unroll(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    spec = {
        "source": {"kind": "parquet", "table": "supplier",
                   "columns": ["s_suppkey", "s_nationkey"]},
        "stages": [
            {"kind": "join_table", "table": "nation",
             "columns": ["n_nationkey", "n_name"], "on": None},
        ],
    }
    # join_table needs matching key names — rename via mapping first
    spec["stages"] = [
        {"kind": "rename", "mapping": {"s_nationkey": "n_nationkey"}},
        {"kind": "join_table", "table": "nation",
         "columns": ["n_nationkey", "n_name"], "on": "n_nationkey"},
    ]
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert "n_name" in out.columns and out["n_name"].notna().all()

    spec2 = {
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text"]},
        "stages": [
            {"kind": "hash", "column": "doc_id", "out": "h"},
        ],
    }
    # unroll over a synthesized list column via tokenizer would need
    # tokens; use events props? simplest: unroll checked directly
    import pyarrow as pa
    import ray.data as rd

    from cardinalhq_otel_collector_ray.pipelines.spec import _s_unroll
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "xs": pa.array([[10, 11], [12]], pa.list_(pa.int32()))})
    out2 = _s_unroll(rd.from_arrow(t), {"column": "xs"}).to_pandas()
    assert out2["element"].tolist() == [10, 11, 12]
    assert out2["id"].tolist() == [1, 1, 2]


def test_compact_sink_conserves_and_resumes(tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from cardinalhq_otel_collector_ray.sinks.partitioned import (
        PartitionedSink, compact_sink)
    df = pd.DataFrame({"k": np.arange(2000, dtype=np.int64),
                       "route": np.where(np.arange(2000) % 2 == 0,
                                         "main", "errors")})
    ds = ray.data.from_pandas(df, override_num_blocks=4)
    sink = PartitionedSink(str(tmp_path / "c"), run_ts=1706078400.0,
                           num_partitions=16)
    entries = sink.write(ds, key_col="k", route_col="route")
    n_files_before = len(glob.glob(str(tmp_path / "c" / "sink=*" / "**" /
                                       "*.parquet"), recursive=True))
    new = compact_sink(sink, min_rows=10_000)   # everything is "small"
    assert {e.sink for e in new} == {"main", "errors"}
    files_after = glob.glob(str(tmp_path / "c" / "sink=*" / "**" /
                                "*.parquet"), recursive=True)
    assert len(files_after) == 2 < n_files_before
    total = sum(pq.read_table(f).num_rows for f in files_after)
    assert total == 2000
    # resume after compaction: identical rerun writes nothing
    ds2 = ray.data.from_pandas(df, override_num_blocks=3)
    assert sink.write(ds2, key_col="k", route_col="route") == []
    # absorbed manifest entries now point at the consolidated files
    done = sink.manifest.completed()
    assert all(os.path.exists(e.path) for e in done.values())


def test_token_budget_sample_per_key_dict_and_overshoot():
    from cardinalhq_otel_collector_ray.stages.packing import (
        token_budget_sample)
    df = pd.DataFrame({
        "src": ["a"] * 10 + ["b"] * 10 + ["c"] * 5,
        "doc": np.arange(25, dtype=np.int64),
        "n": np.full(25, 100, dtype=np.int64),
    })
    out = (token_budget_sample(ray.data.from_pandas(df, override_num_blocks=3),
                               "src", "doc", "n",
                               budgets={"a": 350, "b": 0}, num_partitions=2)
           .to_pandas())
    by = out.groupby("src")["n"].sum().to_dict()
    # a: 3 docs fit under 350, the 4th starts at 300<350 → overshoot to 400
    assert by.get("a") == 400
    assert "b" not in by            # zero budget
    assert "c" not in by            # missing key → budget 0
    # determinism across blockings
    out2 = (token_budget_sample(ray.data.from_pandas(df, override_num_blocks=7),
                                "src", "doc", "n",
                                budgets={"a": 350, "b": 0}, num_partitions=5)
            .to_pandas())
    assert sorted(out["doc"]) == sorted(out2["doc"])


def test_temperature_budgets_integer_math():
    """α=0.5 budgets: w = isqrt(sum), budget = (total·w)//Σw — hand
    numbers, plus the 2^50 loud-failure guard and zero-mass edge."""
    import pytest
    from cardinalhq_otel_collector_ray.stages.packing import (
        temperature_budgets)
    # sums 100/400 → w 10/20 → S=30; total 30 → 10/20 (sqrt damping:
    # the 1:4 corpus becomes a 1:2 mix)
    assert temperature_budgets({"a": 100, "b": 400}, 30) == \
        {"a": 10, "b": 20}
    # floor division truncates, never rounds up
    assert temperature_budgets({"a": 100, "b": 401}, 31) == \
        {"a": 10, "b": 20}
    assert temperature_budgets({"a": 0, "b": 0}, 100) == {"a": 0, "b": 0}
    with pytest.raises(ValueError, match="2\\^50"):
        temperature_budgets({"a": 1 << 50}, 10)


def test_temperature_mix_upweights_minority_source():
    """End-to-end: a 9:1 two-source corpus mixed at α=0.5 keeps the
    minority source at its sqrt-damped share (3:1), and the result is
    blocking-invariant."""
    from cardinalhq_otel_collector_ray.stages.packing import temperature_mix
    n_a, n_b = 90, 10
    df = pd.DataFrame({
        "src": ["a"] * n_a + ["b"] * n_b,
        "doc": np.arange(n_a + n_b, dtype=np.int64),
        "n": np.full(n_a + n_b, 10, dtype=np.int64),
    })
    # sums 900/100 → w 30/10 → budgets (400·w)//40 = 300/100
    out = (temperature_mix(ray.data.from_pandas(df, override_num_blocks=4),
                           "src", "doc", "n", total=400, num_partitions=3)
           .to_pandas())
    by = out.groupby("src")["n"].sum().to_dict()
    assert by == {"a": 300, "b": 100}
    out2 = (temperature_mix(ray.data.from_pandas(df, override_num_blocks=9),
                            "src", "doc", "n", total=400, num_partitions=2)
            .to_pandas())
    assert sorted(out["doc"]) == sorted(out2["doc"])


def test_mixture_example_spec(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    out = compile_pipeline(
        load_spec("/root/repo/examples/mixture_sampling.yaml"),
        sf_dir).to_pandas()
    assert {"split", "source", "n_chars"} <= set(out.columns)
    # budget respected up to one-doc overshoot per source
    g = out.groupby("source")["n_chars"].sum()
    assert (g < 20000 + out["n_chars"].max()).all()


def test_temperature_mixture_example_spec(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    from cardinalhq_otel_collector_ray.sources import read_table
    from cardinalhq_otel_collector_ray.stages.packing import (
        temperature_budgets)
    out = compile_pipeline(
        load_spec("/root/repo/examples/temperature_mixture.yaml"),
        sf_dir).to_pandas()
    assert {"split", "source", "n_chars"} <= set(out.columns)
    # each source's kept mass respects ITS sqrt-damped budget (up to the
    # one-doc overshoot), recomputed here from the raw table
    docs = read_table(sf_dir, "documents",
                      columns=["n_chars", "source"]).to_pandas()
    budgets = temperature_budgets(
        docs.groupby("source")["n_chars"].sum().to_dict(), 100000)
    got = out.groupby("source")["n_chars"].sum()
    for src, tot in got.items():
        assert tot < budgets[src] + out["n_chars"].max()


def test_funnel_steps_three_step_golden():
    from cardinalhq_otel_collector_ray.stages.temporal import funnel_steps
    ds = _events([
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),  # full
        (2, "view", 10), (2, "click", 20),                        # 2 deep
        (3, "view", 10), (3, "purchase", 15),                     # skip click
        (4, "click", 5), (4, "purchase", 6),                      # no view
        (5, "view", 10), (5, "click", 20), (5, "purchase", 900),  # window
    ])
    out = (funnel_steps(ds, "user_id", "ts_ms", "event_type",
                        ["view", "click", "purchase"], window_ms=100,
                        num_partitions=2)
           .to_pandas().set_index("user_id").sort_index())
    assert out.index.tolist() == [1, 2, 3, 5]      # 4 never reached step 1
    assert out.loc[1, "reached"] == 3 and out.loc[1, "t_3"] == 30
    assert out.loc[2, "reached"] == 2 and out.loc[2, "t_3"] == -1
    # purchase before click cannot count as step 3
    assert out.loc[3, "reached"] == 1
    assert out.loc[5, "reached"] == 2               # purchase out of window


def test_intradoc_repetition_golden():
    import pyarrow as pa

    from cardinalhq_otel_collector_ray.stages.textstats import (
        intradoc_repetition)
    t = pa.table({
        "doc_id": pa.array(["rep", "uni", "tiny"], pa.string()),
        "tokens": pa.array([[1, 2, 3, 1, 2, 3, 1, 2, 3],  # (1,2,3) x3 etc.
                            [1, 2, 3, 4, 5],
                            [1, 2]],                        # no trigram
                           pa.list_(pa.int32())),
    })
    out = (intradoc_repetition(ray.data.from_arrow(t), n=3, vocab_size=6)
           .to_pandas().set_index("doc_id"))
    # rep: 7 grams; (1,2,3)x3, (2,3,1)x2, (3,1,2)x2 → all 7 duplicated
    assert out.loc["rep", "n_grams"] == 7 and out.loc["rep", "dup_ratio"] == 1.0
    assert out.loc["uni", "dup_ratio"] == 0.0
    assert "tiny" not in out.index


def test_m4_downsample_golden_and_blocking_invariance():
    from cardinalhq_otel_collector_ray.stages.aggregate import m4_downsample
    df = pd.DataFrame({
        "k": ["a"] * 5,
        "ts": [105, 101, 150, 199, 120],
        "v": [7, 3, 9, 2, 9],
    })
    out = m4_downsample(ray.data.from_pandas(df, override_num_blocks=3),
                        ["k"], "ts", "v", bucket_ms=100)
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["first_ms"], r["first_cents"]) == (101, 3)
    assert (r["last_ms"], r["last_cents"]) == (199, 2)
    assert (r["min_ms"], r["min_cents"]) == (199, 2)
    # value tie 9 at ts 150 and 120 → max keeps the LATER point
    assert (r["max_ms"], r["max_cents"]) == (150, 9)
    out2 = m4_downsample(ray.data.from_pandas(df, override_num_blocks=1),
                         ["k"], "ts", "v", bucket_ms=100)
    assert out.equals(out2)


@pytest.mark.parametrize("seed", [0, 1])
def test_m4_matches_naive_reference(seed):
    from cardinalhq_otel_collector_ray.stages.aggregate import m4_downsample
    rng = np.random.default_rng(seed)
    n = 500
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], n),
        "ts": rng.integers(0, 1000, n).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.int64),   # tie-heavy values
    })
    out = (m4_downsample(ray.data.from_pandas(df, override_num_blocks=4),
                         ["k"], "ts", "v", bucket_ms=100)
           .sort_values(["k", "bucket_ms"]).reset_index(drop=True))
    for _, r in out.iterrows():
        g = df[(df["k"] == r["k"]) & (df["ts"] // 100 * 100 == r["bucket_ms"])]
        g = g.assign(dt=g["ts"] - r["bucket_ms"])
        first = g.sort_values(["dt", "v"]).iloc[0]
        last = g.sort_values(["dt", "v"], ascending=False).iloc[0]
        vmin = g.sort_values(["v", "dt"]).iloc[0]
        vmax = g.sort_values(["v", "dt"], ascending=False).iloc[0]
        assert (r["first_ms"], r["first_cents"]) == (first["ts"], first["v"])
        assert (r["last_ms"], r["last_cents"]) == (last["ts"], last["v"])
        assert (r["min_ms"], r["min_cents"]) == (vmin["ts"], vmin["v"])
        assert (r["max_ms"], r["max_cents"]) == (vmax["ts"], vmax["v"])


def test_followed_by_counts_pairs():
    from cardinalhq_otel_collector_ray.stages.temporal import followed_by_counts
    ds = _events([
        (1, "view", 10), (1, "purchase", 20), (1, "purchase", 60),
        (1, "view", 50), (1, "purchase", 500),
        (2, "view", 10),                         # no purchases
        (3, "purchase", 5), (3, "view", 10),     # B before A doesn't count
    ])
    out = (followed_by_counts(ds, "user_id", "ts_ms", "event_type",
                              "view", "purchase", window_ms=100,
                              num_partitions=2)
           .to_pandas().set_index("user_id"))
    # user 1: view@10→{20,60}, view@50→{60} = 3 pairs (500 out of window)
    assert out.loc[1, "n_pairs"] == 3
    assert 2 not in out.index and 3 not in out.index


@pytest.mark.parametrize("seed", [0, 1])
def test_followed_by_matches_naive(seed):
    from cardinalhq_otel_collector_ray.stages.temporal import followed_by_counts
    rng = np.random.default_rng(seed)
    n = 400
    df = pd.DataFrame({
        "u": rng.integers(0, 25, n),
        "t": rng.choice(["view", "purchase", "click"], n),
        "ts": rng.integers(0, 2000, n).astype(np.int64),
    })
    W = 150
    out = (followed_by_counts(
        ray.data.from_pandas(df.rename(columns={"u": "user_id",
                                                "t": "event_type",
                                                "ts": "ts_ms"}),
                             override_num_blocks=3),
        "user_id", "ts_ms", "event_type", "view", "purchase", W,
        num_partitions=4).to_pandas().set_index("user_id"))
    for u, g in df.groupby("u"):
        a = g.loc[g["t"] == "view", "ts"].to_numpy()
        b = g.loc[g["t"] == "purchase", "ts"].to_numpy()
        expect = sum(int(((b >= x) & (b - x <= W)).sum()) for x in a)
        got = int(out.loc[u, "n_pairs"]) if u in out.index else 0
        assert got == expect


def test_training_topology_example(sf_dir):
    import pyarrow.parquet as pq

    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_topology, load_spec)
    views = compile_topology(
        load_spec("/root/repo/examples/training_topology.yaml"), sf_dir)
    assert set(views) == {"train", "val", "test"}
    total = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    frames = {k: v.to_pandas() for k, v in views.items()}
    # conservation: every doc lands in exactly one split view
    assert sum(len(f) for f in frames.values()) == total
    # per-sink chains applied: train is redacted+gated, eval views are raw
    assert frames["train"]["has_word"].all()
    assert list(frames["val"].columns) == ["doc_id", "text", "split", "route"]
    # deterministic split: route matches the split column everywhere
    for name, f in frames.items():
        if len(f):
            assert (f["route"] == name).all()


def test_global_rank_ties_and_directions():
    from cardinalhq_otel_collector_ray.stages.rangesort import global_rank
    df = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                       "v": [10, 30, 30, 20, 10]})
    ds = ray.data.from_pandas(df)
    asc = global_rank(ds, "v").to_pandas().sort_values("id")
    # min-rank with gaps: 10,10 -> 1; 20 -> 3; 30,30 -> 4
    assert asc["global_rank"].tolist() == [1, 4, 4, 3, 1]
    dsc = global_rank(ds, "v", descending=True).to_pandas().sort_values("id")
    assert dsc["global_rank"].tolist() == [4, 1, 1, 3, 4]
    assert dsc["global_rank"].dtype == np.int64


def test_exact_quantiles_golden():
    from cardinalhq_otel_collector_ray.stages.rangesort import exact_quantiles
    # 1..100 → p-th percentile is exactly p
    df = pd.DataFrame({"v": np.arange(1, 101, dtype=np.int64)})
    out = exact_quantiles(ray.data.from_pandas(df), "v")
    assert out["v"].tolist() == [1, 5, 25, 50, 75, 90, 99]
    # duplicates: rank selection lands inside the run
    df2 = pd.DataFrame({"v": np.array([7] * 99 + [100], dtype=np.int64)})
    out2 = exact_quantiles(ray.data.from_pandas(df2), "v")
    assert out2["v"].tolist() == [7, 7, 7, 7, 7, 7, 7]


def test_global_percent_rank_ties_and_single_row():
    from cardinalhq_otel_collector_ray.stages.rangesort import (
        global_percent_rank)
    df = pd.DataFrame({"id": [1, 2, 3, 4], "v": [10, 20, 20, 30]})
    out = (global_percent_rank(ray.data.from_pandas(df), "v")
           .to_pandas().sort_values("id"))
    # min-rank 1,2,2,4 -> (r-1)/3
    assert out["pct"].tolist() == [0.0, 1 / 3, 1 / 3, 1.0]
    one = global_percent_rank(
        ray.data.from_pandas(pd.DataFrame({"id": [1], "v": [5]})),
        "v").to_pandas()
    assert one["pct"].tolist() == [0.0]


def test_shuffle_shards_permutation_and_naive_match():
    from cardinalhq_otel_collector_ray.functions.hashing import mulhash
    from cardinalhq_otel_collector_ray.stages.packing import shuffle_shards
    ids = np.arange(0, 503, dtype=np.int64) * 7  # sparse, non-contiguous
    df = pd.DataFrame({"doc_id": ids})
    out = (shuffle_shards(ray.data.from_pandas(df, override_num_blocks=4),
                          "doc_id", num_shards=8, num_partitions=3)
           .to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True))
    # every input id appears exactly once
    assert sorted(out["doc_id"].tolist()) == sorted(ids.tolist())
    # per shard: pos is exactly 0..n_i-1
    for _, g in out.groupby("shard"):
        assert g["pos"].tolist() == list(range(len(g)))
    # matches the naive single-process reference
    naive = pd.DataFrame({"doc_id": ids,
                          "shard": mulhash(ids, mod=8),
                          "h2": mulhash(ids + np.int64(777))})
    naive = naive.sort_values(["shard", "h2", "doc_id"]).reset_index(drop=True)
    naive["pos"] = naive.groupby("shard").cumcount()
    merged = out.merge(naive[["doc_id", "shard", "pos"]], on="doc_id",
                       suffixes=("", "_ref"))
    assert (merged["shard"] == merged["shard_ref"]).all()
    assert (merged["pos"] == merged["pos_ref"]).all()
    # epoch re-shuffle: a different pos_salt permutes positions
    out2 = (shuffle_shards(ray.data.from_pandas(df), "doc_id", num_shards=8,
                           pos_salt=778, num_partitions=3)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    base = out.sort_values("doc_id").reset_index(drop=True)
    assert (out2["shard"] == base["shard"]).all()      # shards stable
    assert (out2["pos"] != base["pos"]).any()          # order re-drawn


def test_shuffled_export_example_spec(sf_dir, tmp_path):
    """examples/shuffled_export.yaml end-to-end: column-routed topology
    (route = the dataset_split assignment) through the partitioned sink,
    with the shuffled packing layout and resume."""
    import pyarrow.parquet as pq
    from cardinalhq_otel_collector_ray.pipelines.spec import (
        load_spec, write_topology)
    spec = load_spec("/root/repo/examples/shuffled_export.yaml")
    spec["write"]["root"] = str(tmp_path / "shuf")
    spec["write"]["num_partitions"] = 2
    sink, entries = write_topology(spec, sf_dir)
    assert {e.sink for e in entries} == {"train", "val", "test"}
    total = sum(e.rows for e in entries)
    assert total == 500  # every doc lands in exactly one split
    f = pq.read_table(entries[0].path)
    assert {"shard", "pos", "bin_id", "bin_offset"} <= set(f.column_names)
    # resume: rerun writes nothing
    _, again = write_topology(spec, sf_dir)
    assert again == []


def test_route_column_form_validation():
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_topology
    import pytest as _pt
    base = {"source": {"kind": "parquet", "table": "documents",
                       "columns": ["doc_id"]}}
    with _pt.raises(ValueError, match="not both"):
        compile_topology({**base, "route": {"column": "x", "rules": []}},
                         "/root/testdata/sf0.001")
    with _pt.raises(ValueError, match="route.values"):
        compile_topology({**base, "route": {"column": "x"}},
                         "/root/testdata/sf0.001")


def test_quality_buckets_example_spec(sf_dir):
    """Declarative `rank` kind: per-source tercile assignment matches a
    pandas recompute of the ntile row-position law."""
    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    out = compile_pipeline(
        load_spec("/root/repo/examples/quality_buckets.yaml"),
        sf_dir).to_pandas()
    assert {"rnk", "pct", "tile"} <= set(out.columns)
    out = out.sort_values(["source", "n_chars", "doc_id"],
                          kind="mergesort").reset_index(drop=True)
    for _, g in out.groupby("source"):
        n = len(g)
        size, rem = divmod(n, 3)
        pos = np.arange(n)
        tile = np.where(pos < rem * (size + 1),
                        pos // (size + 1),
                        rem + (pos - rem * (size + 1)) // max(size, 1)) + 1
        assert (g["tile"].to_numpy() == tile).all()
        assert g["tile"].min() == 1 and g["tile"].max() <= 3
