"""Join operators + declarative pipeline-spec compiler."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
from cardinalhq_otel_collector_ray.stages.join import (
    broadcast_join, bucketed_hash_join, semi_join)


def _left():
    return ray.data.from_arrow(pa.table({
        "k": [1, 2, 3, 4], "lval": ["a", "b", "c", "d"]}))


def _right():
    return ray.data.from_arrow(pa.table({
        "k": [2, 3, 3, 9], "rval": [20.0, 30.0, 31.0, 90.0]}))


def test_broadcast_join_left():
    small = pd.DataFrame({"k": [2, 3], "rval": [20.0, 30.0]})
    out = broadcast_join(_left(), small, on="k").to_pandas().sort_values("k")
    assert len(out) == 4
    assert out[out["k"] == 2]["rval"].iloc[0] == 20.0
    assert np.isnan(out[out["k"] == 1]["rval"].iloc[0])


def test_semi_and_anti_join():
    out = semi_join(_left(), keys=[2, 3], on="k").to_pandas()
    assert sorted(out["k"]) == [2, 3]
    out = semi_join(_left(), keys=[2, 3], on="k", anti=True).to_pandas()
    assert sorted(out["k"]) == [1, 4]


def test_bucketed_hash_join_matches_pandas():
    out = bucketed_hash_join(_left(), _right(), on="k", num_buckets=4).to_pandas()
    expect = (_left().to_pandas().merge(_right().to_pandas(), on="k"))
    assert len(out) == len(expect) == 3  # k=2 once, k=3 twice
    got = sorted(zip(out["k"], out["lval"], out["rval"]))
    want = sorted(zip(expect["k"], expect["lval"], expect["rval"]))
    assert got == want


def test_bucketed_join_column_collision_suffix():
    l = ray.data.from_arrow(pa.table({"k": [1], "v": ["L"]}))
    r = ray.data.from_arrow(pa.table({"k": [1], "v": ["R"]}))
    out = bucketed_hash_join(l, r, on="k").to_pandas()
    assert out["v"].iloc[0] == "L" and out["v_r"].iloc[0] == "R"


def test_spec_compile_and_run(sf_dir):
    spec = {
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text", "source"]},
        "stages": [
            {"kind": "parse_regex", "column": "text",
             "pattern": r"^(?P<head>\w+)"},
            {"kind": "flag_regex", "column": "text", "pattern": r"\bslow\b",
             "out": "has_slow"},
            {"kind": "replace_pattern", "column": "text", "pattern": r"\d+",
             "replacement": "#"},
            {"kind": "sample", "id_column": "doc_id", "percent": 50},
            {"kind": "route", "default": "main", "rules": [
                {"kind": "equals", "column": "has_slow", "value": True,
                 "sink": "slowlane"},
            ]},
            {"kind": "select", "columns": ["doc_id", "head", "route"]},
        ],
    }
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert list(out.columns) == ["doc_id", "head", "route"]
    assert set(out["route"]) <= {"main", "slowlane"}
    assert 0 < len(out) < 500  # 50% sample of 500 docs


def test_spec_unknown_stage_rejected(sf_dir):
    with pytest.raises(ValueError, match="unknown kind"):
        compile_pipeline({"source": {"kind": "parquet", "table": "documents"},
                          "stages": [{"kind": "nope"}]}, sf_dir)


def test_yaml_spec_loads_and_runs(sf_dir):
    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    spec = load_spec("/root/repo/examples/enforce_pipeline.yaml")
    out = compile_pipeline(spec, sf_dir).to_pandas()
    assert list(out.columns) == ["doc_id", "head_word", "route"]
    assert set(out["route"]) <= {"main", "slowlane", "sampled"}


def test_topology_per_sink_chains(sf_dir):
    """Collector topology: shared decorate → route → per-sink enforcement."""
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_topology
    spec = {
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text", "source"]},
        "stages": [
            {"kind": "flag_regex", "column": "text", "pattern": r"\bslow\b",
             "out": "has_slow"},
        ],
        "route": {"default": "main", "rules": [
            {"kind": "equals", "column": "has_slow", "value": True,
             "sink": "slowlane"},
        ]},
        "sinks": {
            "slowlane": {"stages": [
                {"kind": "sample", "id_column": "doc_id", "percent": 50},
                {"kind": "select", "columns": ["doc_id", "route"]},
            ]},
            "main": {"stages": [
                {"kind": "select", "columns": ["doc_id", "route"]},
            ]},
        },
    }
    sinks = compile_topology(spec, sf_dir)
    assert set(sinks) == {"main", "slowlane"}
    main = sinks["main"].to_pandas()
    slow = sinks["slowlane"].to_pandas()
    assert (main["route"] == "main").all()
    assert (slow["route"] == "slowlane").all()
    # per-sink enforcement applied only to its own pipeline: slowlane is
    # ~50% sampled, main is complete
    total_docs = 500
    assert len(main) + len(slow) < total_docs          # sampling dropped rows
    assert len(main) > 0 and 0 < len(slow)
    # main got every non-slow row (no sampling on main)
    import duckdb
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    n_slow = c.execute(r"SELECT count(*) FROM documents WHERE regexp_matches(text, '\bslow\b')").fetchone()[0]
    assert len(main) == total_docs - n_slow


def test_spec_new_stage_kinds(sf_dir):
    """Round-2 spec vocabulary: interval_aggregate / logdedup / sessionize /
    temporal / drain / dedup / textstats kinds compile and run."""
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    agg = compile_pipeline({
        "source": {"kind": "parquet", "table": "events",
                   "columns": ["event_id", "event_type", "ts", "value"]},
        "stages": [
            {"kind": "epoch_ms", "column": "ts", "out": "ts_ms"},
            {"kind": "interval_aggregate", "ts": "ts_ms",
             "interval_ms": 3_600_000, "keys": ["event_type"],
             "value": "value"},
        ],
    }, sf_dir).to_pandas()
    assert {"event_type", "agg_sum", "agg_count"} <= set(agg.columns)
    assert len(agg) > 0

    mined = compile_pipeline({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text"]},
        "stages": [{"kind": "drain", "text": "text", "id": "doc_id"}],
    }, sf_dir).to_pandas()
    assert mined["n_logs"].sum() > 0

    dedup = compile_pipeline({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text"]},
        "stages": [{"kind": "dedup_exact", "content": "text", "id": "doc_id"}],
    }, sf_dir).to_pandas()
    assert {"text", "keep_id", "n_copies"} <= set(dedup.columns)

    sess = compile_pipeline({
        "source": {"kind": "parquet", "table": "events",
                   "columns": ["user_id", "ts"]},
        "stages": [
            {"kind": "epoch_ms", "column": "ts", "out": "ts_ms"},
            {"kind": "sessionize", "key": "user_id", "ts": "ts_ms",
             "gap_ms": 1_800_000},
        ],
    }, sf_dir).to_pandas()
    assert {"session_id", "session_start", "n_events"} <= set(sess.columns)


def test_spec_round2_extension_kinds(sf_dir):
    """Second-pass spec vocabulary: stratified_sample / winnow / iforest
    kinds compile and run end-to-end from a dict spec."""
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline

    strat = compile_pipeline({
        "source": {"kind": "parquet", "table": "events",
                   "columns": ["event_id", "event_type"]},
        "stages": [{"kind": "stratified_sample", "key": "event_type",
                    "id": "event_id", "k": 5}],
    }, sf_dir).to_pandas()
    assert (strat.groupby("event_type").size() <= 5).all()
    assert len(strat) > 0

    fps = compile_pipeline({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text"]},
        "stages": [{"kind": "winnow", "text": "text", "id": "doc_id"}],
    }, sf_dir).to_pandas()
    assert {"id", "fp"} == set(fps.columns) and len(fps) > 0

    scored = compile_pipeline({
        "source": {"kind": "parquet", "table": "events",
                   "columns": ["event_id", "value"]},
        "stages": [{"kind": "iforest", "id": "event_id",
                    "features": ["value"], "trees": 16,
                    "tree_sample": 64}],
    }, sf_dir).to_pandas()
    assert "iforest_score" in scored.columns
    assert scored["iforest_score"].between(0, 1).all()


def test_bucketed_join_composite_key():
    import numpy as np
    import pandas as pd
    import ray.data

    from cardinalhq_otel_collector_ray.stages.join import bucketed_hash_join
    left = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "y", "x", "x", "z"],
                         "v": [10, 11, 12, 13, 14]})
    right = pd.DataFrame({"a": [1, 2, 9], "b": ["x", "x", "z"],
                          "w": [100, 200, 900]})
    out = (bucketed_hash_join(ray.data.from_pandas(left, override_num_blocks=2),
                              ray.data.from_pandas(right, override_num_blocks=2),
                              on=["a", "b"], num_buckets=4)
           .to_pandas().sort_values("v").reset_index(drop=True))
    # only exact (a, b) matches — never bucket-level cross products
    assert out["v"].tolist() == [10, 12, 13]
    assert out["w"].tolist() == [100, 200, 200]


def test_spec_incremental_dedup_kinds(sf_dir):
    """dedup_history / neardup_history kinds compile and run with the
    corpus as its own history: the exact pass must then drop EVERYTHING
    (every content is in history) and the near-dup pass must flag every
    doc at J=1.0 against its own history copy — both ends of the
    spectrum, with the cross-side split semantics covered by
    tests/test_incremental_dedup.py."""
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    out = compile_pipeline({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text"]},
        "stages": [
            {"kind": "dedup_history", "history_table": "documents",
             "content": "text", "id": "doc_id"},
        ],
    }, sf_dir).to_pandas()
    # history == the whole corpus -> every new content is also history
    assert len(out) == 0

    near = compile_pipeline({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text"]},
        "stages": [
            {"kind": "neardup_history", "history_table": "documents",
             "content": "text", "id": "doc_id", "threshold": 0.99},
        ],
    }, sf_dir).to_pandas()
    # every doc near-dups its own history copy at J=1
    assert (near["max_jaccard"] == 1.0).all()
    assert len(near) > 0


def test_spec_chunk_kind(sf_dir):
    """tokenize -> chunk: the declarative RAG-window prep pipeline."""
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_pipeline
    out = compile_pipeline({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text", "source"]},
        "stages": [
            {"kind": "tokenize"},
            {"kind": "chunk", "size": 16, "stride": 8},
        ],
    }, sf_dir).to_pandas()
    assert {"doc_id", "chunk_idx", "start_tok", "n_tok_chunk"} \
        <= set(out.columns)
    assert (out["n_tok_chunk"] > 0).all() and (out["n_tok_chunk"] <= 16).all()
    assert len(out) > 0


def test_example_incremental_dedup_spec(sf_dir):
    """examples/incremental_dedup.yaml compiles and runs end-to-end."""
    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    spec = load_spec("/root/repo/examples/incremental_dedup.yaml")
    out = compile_pipeline(spec, sf_dir).to_pandas()
    # corpus-as-its-own-history: every doc near-dups its own copy at J=1
    assert (out["max_jaccard"] == 1.0).all() and len(out) > 0


def test_topology_sink_chain_gets_sf_dir(sf_dir):
    """Per-sink chains receive the same _sf_dir injection as the shared
    chain, so side-source kinds (tokenize, *_history) work there too
    (regression: sink chains previously passed the raw stage dict)."""
    from cardinalhq_otel_collector_ray.pipelines.spec import compile_topology
    views = compile_topology({
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text", "source"]},
        "route": {"default": "main", "rules": []},
        "sinks": {"main": {"stages": [{"kind": "tokenize"}]}},
    }, sf_dir)
    out = views["main"].to_pandas()
    assert "n_tok" in out.columns and len(out) > 0
