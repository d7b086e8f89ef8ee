"""Re-ingest of sink-exported objects (sources/sinkfiles.py): direct
marshal→unmarshal round-trips for every format, and the distributed
write-through-PartitionedSink → read_sink_output loop (the
exporter_test.go:36-40 round-trip, end to end through real files)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cardinalhq_otel_collector_ray.sinks import serializers as ser
from cardinalhq_otel_collector_ray.sources.sinkfiles import (
    UNMARSHALERS, list_sink_files, read_sink_output, unmarshal_body,
    unmarshal_jsonl, unmarshal_otlp_json, unmarshal_otlp_proto,
    unmarshal_parquet, unmarshal_sumo_ic)


def _batch():
    return pa.table({
        "body": ["hello world", "second line", ""],
        "ts": pa.array([1_706_078_400_000_000_000,
                        1_706_078_401_000_000_000,
                        1_706_078_402_000_000_000], pa.int64()),
        "level": ["info", "error", "info"],
        "code": pa.array([200, -500, 0], pa.int64()),
        "ratio": pa.array([0.25, -1.5, 0.0], pa.float64()),
        "ok": pa.array([True, False, True]),
        "service": ["api", "api", "api"],
    })


def test_parquet_and_jsonl_roundtrip():
    b = _batch()
    assert unmarshal_parquet(ser.marshal_parquet(b)).equals(b)
    got = unmarshal_jsonl(ser.marshal_jsonl(b))
    assert got.select(b.column_names).cast(b.schema).equals(b)


def test_body_roundtrip_preserves_empty_lines():
    b = _batch()
    got = unmarshal_body(ser.marshal_body(b))
    assert got["body"].to_pylist() == b["body"].to_pylist()


def test_sumo_ic_roundtrip_restores_flat_schema():
    b = _batch().append_column("_sourceCategory", pa.array(["cat"] * 3)) \
        .append_column("_sourceHost", pa.array(["host"] * 3)) \
        .append_column("_sourceName", pa.array(["name"] * 3))
    data = ser.marshal_sumo_ic(b, record_attr_cols=("level", "code"))
    got = unmarshal_sumo_ic(data)
    # resource attrs land in fields and come back as columns; record
    # attrs + body come back via the message JSON
    assert got["body"].to_pylist() == b["body"].to_pylist()
    assert got["level"].to_pylist() == b["level"].to_pylist()
    assert got["code"].to_pylist() == b["code"].to_pylist()
    assert got["_sourceHost"].to_pylist() == ["host"] * 3
    assert got["service"].to_pylist() == ["api"] * 3   # via fields


@pytest.mark.parametrize("fmt,marshal,unmarshal", [
    ("otlp_json", ser.marshal_otlp_json, unmarshal_otlp_json),
    ("otlp_proto", ser.marshal_otlp_proto, unmarshal_otlp_proto),
])
def test_otlp_envelope_roundtrip(fmt, marshal, unmarshal):
    b = _batch()
    data = marshal(b, ts_col="ts", resource_attr_cols=("service",),
                   record_attr_cols=("level", "code", "ratio", "ok"))
    got = unmarshal(data)
    assert got.num_rows == 3
    assert got["body"].to_pylist() == b["body"].to_pylist()
    assert got["ts"].to_pylist() == b["ts"].to_pylist()
    assert got["service"].to_pylist() == ["api"] * 3
    assert got["level"].to_pylist() == b["level"].to_pylist()
    # negative int64 survives (two's-complement varint / proto3-JSON str)
    assert got["code"].to_pylist() == b["code"].to_pylist()
    assert got["ratio"].to_pylist() == b["ratio"].to_pylist()
    assert got["ok"].to_pylist() == b["ok"].to_pylist()


def test_unmarshaler_table_covers_every_marshaler():
    assert set(UNMARSHALERS) == set(ser.MARSHALERS)


def test_roundtrip_fuzz_edge_values():
    """Seeded fuzz: random flat tables (strings incl. unicode/quotes/
    empties, int64 extremes, doubles, bools) survive marshal→unmarshal
    for every self-describing format. body-format framing can't carry
    newlines (one line per record — the reference's contract) so bodies
    stay newline-free; None bodies round-trip as '' (the marshalers'
    documented mapping)."""
    rng = np.random.default_rng(2026)
    words = np.array(["plain", "uni¢ødé", 'quo"te', "back\\slash",
                      "tab\there", "", "ünïcode 千字", "{json}?"])
    for trial in range(5):
        n = int(rng.integers(1, 9))
        batch = pa.table({
            "body": pa.array([str(rng.choice(words)) for _ in range(n)]),
            "ts": pa.array(rng.integers(0, 2**62, n), pa.int64()),
            "code": pa.array(
                rng.choice([0, -1, 7, 2**63 - 1, -2**63, 42], n),
                pa.int64()),
            "ratio": pa.array(rng.standard_normal(n), pa.float64()),
            "ok": pa.array(rng.integers(0, 2, n) == 1),
        })
        got = unmarshal_jsonl(ser.marshal_jsonl(batch))
        assert got.select(batch.column_names).cast(batch.schema) \
            .equals(batch), f"jsonl trial {trial}"
        for marshal, unmarshal in (
                (ser.marshal_otlp_json, unmarshal_otlp_json),
                (ser.marshal_otlp_proto, unmarshal_otlp_proto)):
            data = marshal(batch, ts_col="ts",
                           record_attr_cols=("code", "ratio", "ok"))
            back = unmarshal(data)
            assert back["body"].to_pylist() == batch["body"].to_pylist()
            assert back["ts"].to_pylist() == batch["ts"].to_pylist()
            assert back["code"].to_pylist() == batch["code"].to_pylist()
            assert back["ratio"].to_pylist() == batch["ratio"].to_pylist()
            assert back["ok"].to_pylist() == batch["ok"].to_pylist()


def test_distributed_roundtrip_through_partitioned_sink(ray_session,
                                                        tmp_path):
    """Write a routed stream through the real sink (jsonl+gzip), read it
    back distributed, and match the original rows exactly."""
    import ray.data

    from cardinalhq_otel_collector_ray.sinks.partitioned import \
        PartitionedSink

    n = 200
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "route": np.where(np.arange(n) % 3 == 0, "alpha", "beta"),
        "body": [f"line {i} {'x' * int(rng.integers(0, 5))}"
                 for i in range(n)],
        "n_tok": rng.integers(1, 50, n).astype(np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    sink = PartitionedSink(str(tmp_path), 1706078400.0, num_partitions=4,
                           fmt="jsonl", compression="gzip")
    entries = sink.write(ds, key_col="doc_id", route_col="route",
                         tokens_len_col="n_tok", resume=False)
    assert len(entries) == 8                      # 2 routes × 4 pids
    assert all(e.path.endswith(".jsonl.gz") for e in entries)

    back = read_sink_output(str(tmp_path), fmt="jsonl",
                            include_path=True).to_pandas()
    assert len(back) == n
    assert back["_source_file"].nunique() == 8
    merged = back.sort_values("doc_id").reset_index(drop=True)
    want = df.sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "route", "body", "n_tok"):
        assert (merged[c].to_numpy() == want[c].to_numpy()).all(), c

    # manifest-driven path list (no LIST call) gives the same rows
    back2 = read_sink_output(str(tmp_path), fmt="jsonl",
                             manifest=sink.manifest).to_pandas()
    assert len(back2) == n
    # and the listing helper sees exactly the manifest's files
    assert sorted(list_sink_files(str(tmp_path), suffix=".jsonl.gz")) == \
        sorted(e.path for e in entries)


def test_spec_sink_source_reingests(ray_session, tmp_path):
    """Declarative re-ingest: source kind `sink` reads another run's
    sink output and feeds a normal stage chain."""
    import ray.data

    from cardinalhq_otel_collector_ray.pipelines.spec import \
        compile_pipeline
    from cardinalhq_otel_collector_ray.sinks.partitioned import \
        PartitionedSink
    df = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "route": np.where(np.arange(60) % 2 == 0, "even", "odd"),
        "body": [f"b{i}" for i in range(60)],
    })
    sink = PartitionedSink(str(tmp_path), 1706078400.0, num_partitions=2,
                           fmt="jsonl", compression="gzip")
    sink.write(ray.data.from_pandas(df).repartition(2), key_col="doc_id",
               route_col="route", resume=False)
    spec = {"source": {"kind": "sink", "path": str(tmp_path),
                       "format": "jsonl",
                       "columns": ["doc_id", "route", "body"]},
            "stages": [{"kind": "drop_where", "column": "route",
                        "equals": "odd"}]}
    out = compile_pipeline(spec, str(tmp_path)).to_pandas()
    assert len(out) == 30
    assert (out["route"] == "even").all()
    assert sorted(out["doc_id"]) == list(range(0, 60, 2))


def test_distributed_roundtrip_otlp_proto(ray_session, tmp_path):
    """body+attrs through otlp_proto objects and back."""
    import ray.data

    from cardinalhq_otel_collector_ray.sinks.partitioned import \
        PartitionedSink
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "route": ["solo"] * 40,
        "body": [f"msg {i}" for i in range(40)],
    })
    sink = PartitionedSink(str(tmp_path), 1706078400.0, num_partitions=2,
                           fmt="otlp_proto")
    sink.write(ray.data.from_pandas(df).repartition(2), key_col="doc_id",
               route_col="route", resume=False)
    back = read_sink_output(str(tmp_path), fmt="otlp_proto",
                            compression=None).to_pandas()
    assert sorted(back["body"]) == sorted(df["body"])
