"""C3 emit-shape goldens (aggregate.go:121-191) and C7 marshal goldens
(sumo_marshaler_test.go:70-321, body_marshaler.go:25-44)."""

import gzip
import json

import pyarrow as pa
import pytest

from cardinalhq_otel_collector_ray.sinks.serializers import (
    MarshalError, marshal_body, marshal_sumo_ic, serialize)
from cardinalhq_otel_collector_ray.stages.emit import emit_row


def test_emit_row_sections_and_metadata():
    tags = {
        "resource.host.name": "h1",
        "instrumentation.lib": "otel",
        "metric.path": "/api",
        "metadata.metric.name": "req.count",
        "metadata.metric.description": "requests",
        "metadata.metric.unit": "1",
        # reference key spellings (aggregate.go:178,186)
        "metadata.metric.aggregationtemporality": "cumulative",
        "metadata.metric.ismonotonic": "true",
    }
    row = emit_row(tags, "sum", 6.0, 10_000,
                   additional_attributes={"env": "prod"})
    assert row["name"] == "req.count"
    assert row["description"] == "requests"
    assert row["unit"] == "1"
    # defaults (delta, non-monotonic, aggregate.go:55-60) are set BEFORE
    # setTags, so metadata overrides win (setMetricMetadata :167-191)
    assert row["mtype"] == "sum"
    assert row["temporality"] == "cumulative" and row["monotonic"] is True
    # dp ts and start-ts = interval start (aggregate.go:64-67)
    assert row["ts_ms"] == row["start_ts_ms"] == 10_000
    assert row["resource_attrs"] == {"host.name": "h1"}
    assert row["scope_attrs"] == {"lib": "otel"}
    # metric.-prefixed and unprefixed tags land on the datapoint;
    # additional_attributes appended (aggregate.go:72-74)
    assert row["dp_attrs"] == {"path": "/api", "env": "prod"}


def test_emit_row_sum_defaults_without_metadata():
    row = emit_row({"metadata.metric.name": "req"}, "sum", 1.0, 0)
    assert row["temporality"] == "delta" and row["monotonic"] is False


def test_emit_row_metadata_overrides_are_sum_only():
    """setMetricMetadata returns early for non-Sum metrics
    (aggregate.go:177-190): gauge temporality/monotonic stay None."""
    row = emit_row({"metadata.metric.aggregationtemporality": "cumulative",
                    "metadata.metric.ismonotonic": "true"}, "avg", 1.0, 0)
    assert row["temporality"] is None and row["monotonic"] is None
    # invalid temporality value ignored → default kept
    row2 = emit_row({"metadata.metric.aggregationtemporality": "bogus"},
                    "sum", 1.0, 0)
    assert row2["temporality"] == "delta"
    # ismonotonic: ANY value overrides; non-"true" → False
    row3 = emit_row({"metadata.metric.ismonotonic": "yes"}, "sum", 1.0, 0)
    assert row3["monotonic"] is False


def test_emit_row_schema_url_and_scope_metadata():
    row = emit_row({"metadata.resource.schemaurl": "https://s/r",
                    "metadata.instrumentation.schemaurl": "https://s/i",
                    "metadata.instrumentation.name": "lib",
                    "metadata.instrumentation.version": "1.2"},
                   "sum", 1.0, 0)
    assert row["resource_schema_url"] == "https://s/r"
    assert row["scope_schema_url"] == "https://s/i"
    assert row["scope_name"] == "lib" and row["scope_version"] == "1.2"


def test_emit_row_gauge():
    row = emit_row({"metadata.metric.name": "cpu"}, "avg", 0.5, 0)
    assert row["mtype"] == "gauge"
    assert row["temporality"] is None and row["monotonic"] is None
    assert row["value_d"] == 0.5


def test_emit_stage_matches_emit_row(ray_session):
    """The vectorized batch path must reproduce the pure reference function
    row-for-row (including map-section splits and additional attrs)."""
    import ray.data
    from cardinalhq_otel_collector_ray.stages.emit import emit_stage
    tag_dicts = [
        {"resource.host": "h1", "metric.path": "/a",
         "metadata.metric.name": "m1",
         "metadata.metric.aggregationtemporality": "cumulative",
         "metadata.metric.ismonotonic": "true"},
        {"instrumentation.lib": "otel", "unprefixed": "x",
         "metadata.metric.unit": "ms"},
        {"metadata.instrumentation.name": "lib",
         "metadata.resource.schemaurl": "https://s"},
    ]
    aggs = ["sum", "gauge", "sum"]
    vals = [6.0, 0.5, 2.0]
    ivs = [10_000, 20_000, 30_000]
    batch = pa.table({
        "tags": pa.array(tag_dicts, type=pa.map_(pa.string(), pa.string())),
        "agg_type": pa.array(aggs),
        "value": pa.array(vals, type=pa.float64()),
        "interval_start_ms": pa.array(ivs, type=pa.int64()),
    })
    out = emit_stage(ray.data.from_arrow(batch),
                     additional_attributes={"env": "prod"}).to_pandas()
    assert len(out) == 3
    for i in range(3):
        want = emit_row(tag_dicts[i], aggs[i], vals[i], ivs[i],
                        additional_attributes={"env": "prod"})
        got = out.iloc[i]
        for col in ("name", "description", "unit", "mtype", "ts_ms",
                    "start_ts_ms", "value_d", "scope_name", "scope_version",
                    "resource_schema_url", "scope_schema_url"):
            w = want[col]
            g = got[col]
            assert (g == w) or (w in (None, "") and (g is None or g == "" or g != g)), \
                (col, i, g, w)
        assert (got["temporality"] == want["temporality"]
                or (want["temporality"] is None and got["temporality"] is None))
        assert dict(got["resource_attrs"]) == want["resource_attrs"]
        assert dict(got["scope_attrs"]) == want["scope_attrs"]
        assert dict(got["dp_attrs"]) == want["dp_attrs"]


def _logs_batch(**overrides):
    base = {
        "_sourceCategory": ["cat"], "_sourceHost": ["host"],
        "_sourceName": ["name"], "region": ["eu"],
        "level": ["info"], "body": ["hello world"],
    }
    base.update(overrides)
    return pa.table(base)


def test_sumo_golden_shape():
    out = marshal_sumo_ic(_logs_batch(), resource_attr_cols=("region",),
                          record_attr_cols=("level",))
    rec = json.loads(out.decode().strip())
    assert rec["_sourceCategory"] == "cat"
    assert rec["fields"] == {"region": "eu"}
    msg = json.loads(rec["message"])
    assert msg == {"level": "info", "log": "hello world"}


def test_sumo_missing_required_attr_errors():
    batch = _logs_batch().drop_columns(["_sourceHost"])
    with pytest.raises(MarshalError):
        marshal_sumo_ic(batch)
    with pytest.raises(MarshalError):
        marshal_sumo_ic(_logs_batch(_sourceName=[None]))


def test_body_marshaler_lines():
    batch = pa.table({"body": ["line one", "line two"]})
    assert marshal_body(batch) == b"line one\nline two\n"


def test_serialize_gzip_roundtrip_deterministic():
    batch = pa.table({"body": ["x"] * 3})
    data1, ext1 = serialize(batch, "body", compression="gzip")
    data2, ext2 = serialize(batch, "body", compression="gzip")
    assert ext1 == "txt.gz" and data1 == data2  # mtime=0 → byte-stable
    assert gzip.decompress(data1) == b"x\nx\nx\n"


def test_serialize_unknown_format_rejected():
    with pytest.raises(MarshalError):
        serialize(pa.table({"a": [1]}), "avro")


def test_sumo_auto_derives_remaining_resource_attrs():
    """sumo_marshaler.go:111-118 parity: with no explicit resource list,
    ALL columns other than the three _source*, the body, and declared
    record attrs land in ``fields``."""
    out = marshal_sumo_ic(_logs_batch(), record_attr_cols=("level",))
    rec = json.loads(out.decode().strip())
    assert rec["fields"] == {"region": "eu"}
    msg = json.loads(rec["message"])
    assert msg == {"level": "info", "log": "hello world"}


def _parse_proto(buf: bytes):
    """Minimal wire-format reader (test-side decoder): returns a list of
    (field, wire, value) where length-delimited values are raw bytes."""
    out, i = [], 0
    while i < len(buf):
        tag = 0
        shift = 0
        while True:
            b = buf[i]; i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, shift = 0, 0
            while True:
                b = buf[i]; i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            import struct as _s
            v = _s.unpack("<Q", buf[i:i + 8])[0]; i += 8
        elif wire == 2:
            ln, shift = 0, 0
            while True:
                b = buf[i]; i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]; i += ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.append((field, wire, v))
    return out


def _field(msgs, n):
    return [v for f, _, v in msgs if f == n]


def test_otlp_proto_wire_format_roundtrip():
    """Decode the hand-rolled LogsData with an independent wire parser:
    resource attrs, per-row log records, body AnyValue, ns timestamp."""
    from cardinalhq_otel_collector_ray.sinks.serializers import marshal_otlp_proto
    batch = pa.table({
        "body": ["hello", "world"],
        "ts_ns": [1_706_078_400_000_000_000, 1_706_078_401_000_000_000],
        "service": ["api", "api"],
        "level": ["info", "error"],
    })
    buf = marshal_otlp_proto(batch, ts_col="ts_ns",
                             resource_attr_cols=("service",),
                             record_attr_cols=("level",))
    (rl,) = _field(_parse_proto(buf), 1)          # ResourceLogs
    rl_msgs = _parse_proto(rl)
    (resource,) = _field(rl_msgs, 1)
    (kv,) = _field(_parse_proto(resource), 1)     # one resource attr
    kv_msgs = _parse_proto(kv)
    assert _field(kv_msgs, 1)[0] == b"service"
    (av,) = _field(kv_msgs, 2)
    assert _field(_parse_proto(av), 1)[0] == b"api"
    (sl,) = _field(rl_msgs, 2)                    # ScopeLogs
    records = _field(_parse_proto(sl), 2)
    assert len(records) == 2
    r0 = _parse_proto(records[0])
    assert _field(r0, 1)[0] == 1_706_078_400_000_000_000   # time_unix_nano
    (body_av,) = _field(r0, 5)
    assert _field(_parse_proto(body_av), 1)[0] == b"hello"
    (attr,) = _field(r0, 6)
    attr_msgs = _parse_proto(attr)
    assert _field(attr_msgs, 1)[0] == b"level"
    r1 = _parse_proto(records[1])
    (attr1,) = _field(r1, 6)
    (av1,) = _field(_parse_proto(attr1), 2)
    assert _field(_parse_proto(av1), 1)[0] == b"error"


def test_otlp_proto_anyvalue_types():
    from cardinalhq_otel_collector_ray.sinks.serializers import (
        _any_value, _varint)
    import struct as _s
    assert _any_value(True) == b"\x10\x01"                 # bool_value=2
    assert _any_value(7) == b"\x18\x07"                    # int_value=3
    assert _any_value(1.5) == b"\x21" + _s.pack("<d", 1.5)  # double_value=4
    assert _any_value("x") == b"\x0a\x01x"                 # string_value=1
    assert _varint(300) == b"\xac\x02"


def test_otlp_json_golden_roundtrip():
    """OTLP/JSON envelope golden (reference round-trip test
    exporter_test.go:36-40): resourceLogs/scopeLogs/logRecords with
    proto3-JSON AnyValue encoding — int64 as string, doubles as numbers."""
    import json as _json
    from cardinalhq_otel_collector_ray.sinks.serializers import marshal_otlp_json
    batch = pa.table({
        "body": ["hello", "world"],
        "ts_ns": [1_706_078_400_000_000_000, 1_706_078_401_000_000_000],
        "service": ["api", "api"],
        "level": ["info", "error"],
        "retries": [0, 3],
    })
    buf = marshal_otlp_json(batch, ts_col="ts_ns",
                            resource_attr_cols=("service",),
                            record_attr_cols=("level", "retries"))
    expected = {"resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service", "value": {"stringValue": "api"}}]},
        "scopeLogs": [{"scope": {}, "logRecords": [
            {"timeUnixNano": "1706078400000000000",
             "body": {"stringValue": "hello"},
             "attributes": [
                 {"key": "level", "value": {"stringValue": "info"}},
                 {"key": "retries", "value": {"intValue": "0"}}]},
            {"timeUnixNano": "1706078401000000000",
             "body": {"stringValue": "world"},
             "attributes": [
                 {"key": "level", "value": {"stringValue": "error"}},
                 {"key": "retries", "value": {"intValue": "3"}}]},
        ]}]}]}
    assert _json.loads(buf) == expected  # JSONEq, order-insensitive values


def test_otlp_json_matches_otlp_proto_content():
    """The two OTLP encodings of one batch carry identical records: decode
    the binpb with the independent wire parser and compare field-by-field
    against the JSON envelope."""
    import json as _json
    from cardinalhq_otel_collector_ray.sinks.serializers import (
        marshal_otlp_json, marshal_otlp_proto)
    batch = pa.table({"body": ["a", "b", "c"],
                      "ts_ns": [1, 2, 3],
                      "level": ["x", "y", "z"]})
    doc = _json.loads(marshal_otlp_json(batch, ts_col="ts_ns",
                                        record_attr_cols=("level",)))
    buf = marshal_otlp_proto(batch, ts_col="ts_ns",
                             record_attr_cols=("level",))
    (rl,) = _field(_parse_proto(buf), 1)
    (sl,) = _field(_parse_proto(rl), 2)
    records = _field(_parse_proto(sl), 2)
    jrecords = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"]
    assert len(records) == len(jrecords) == 3
    for wire_rec, jrec in zip(records, jrecords):
        msgs = _parse_proto(wire_rec)
        assert str(_field(msgs, 1)[0]) == jrec["timeUnixNano"]
        (body_av,) = _field(msgs, 5)
        assert _field(_parse_proto(body_av), 1)[0].decode() \
            == jrec["body"]["stringValue"]
        (attr,) = _field(msgs, 6)
        kv = _parse_proto(attr)
        assert _field(kv, 1)[0].decode() == jrec["attributes"][0]["key"]


def test_otlp_json_anyvalue_types_and_errors():
    import json as _json
    from cardinalhq_otel_collector_ray.sinks.serializers import (
        MarshalError, marshal_otlp_json)
    batch = pa.table({"body": [None], "b": [True], "f": [1.5], "i": [7]})
    doc = _json.loads(marshal_otlp_json(batch,
                                        record_attr_cols=("b", "f", "i")))
    rec = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    assert rec["body"] == {"stringValue": ""}  # None body → empty string
    vals = {a["key"]: a["value"] for a in rec["attributes"]}
    assert vals == {"b": {"boolValue": True}, "f": {"doubleValue": 1.5},
                    "i": {"intValue": "7"}}
    with pytest.raises(MarshalError, match="body"):
        marshal_otlp_json(pa.table({"x": [1]}))


def test_sink_otlp_json_format(sf_dir, tmp_path):
    """C7 end-to-end: PartitionedSink(fmt='otlp_json') writes parseable
    .json envelopes whose record counts sum to the input rows."""
    import json as _json
    from cardinalhq_otel_collector_ray.pipelines import routed_documents
    from cardinalhq_otel_collector_ray.sinks import PartitionedSink
    import pyarrow.parquet as _pq
    routed = routed_documents(sf_dir).map_batches(
        lambda t: t.append_column("body", t["head_word"]),
        batch_format="pyarrow")
    sink = PartitionedSink(str(tmp_path / "oj"), 1706078400.0,
                           num_partitions=2, fmt="otlp_json")
    entries = sink.write(routed, key_col="doc_id",
                         route_col="route", tokens_len_col="n_tok")
    assert entries and all(e.path.endswith(".json") for e in entries)
    total = 0
    for e in entries:
        doc = _json.loads(open(e.path, "rb").read())
        recs = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"]
        assert len(recs) == e.rows
        total += len(recs)
    assert total == _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def test_serialize_zstd_roundtrip_deterministic():
    from cardinalhq_otel_collector_ray.sinks.serializers import decompress
    batch = pa.table({"body": ["x"] * 3})
    try:
        data1, ext1 = serialize(batch, "body", compression="zstd")
    except MarshalError:
        pytest.skip("zstd codec unavailable in this environment")
    data2, ext2 = serialize(batch, "body", compression="zstd")
    assert ext1 == "txt.zst" and data1 == data2
    assert decompress(data1, "zstd", decompressed_size=6) == b"x\nx\nx\n"


def test_serialize_unknown_compression_rejected():
    with pytest.raises(MarshalError):
        serialize(pa.table({"body": ["x"]}), "body", compression="lz77")


def test_stamp_columns_and_enrich_refresh(sf_dir):
    """C10 constant-column stamp + C9 TTL-refresh hook."""
    import ray.data
    from cardinalhq_otel_collector_ray.stages.enrich import (
        BroadcastEnricher, stamp_columns)
    ds = ray.data.from_arrow(pa.table({"k": ["a", "b"]}))
    out = stamp_columns(ds, {"x-api-key": "secret", "env": "prod"}).to_pandas()
    assert (out["x-api-key"] == "secret").all() and (out["env"] == "prod").all()

    calls = []
    def loader():
        calls.append(1)
        return {"a": {"tenant": "t2"}}
    e = BroadcastEnricher({"a": {"tenant": "t1"}}, "k", loader=loader)
    t = pa.table({"k": ["a", "zz"]})
    assert e(t)["tenant"].to_pylist() == ["t1", None]
    e.refresh()
    assert calls == [1]
    assert e(t)["tenant"].to_pylist() == ["t2", None]


def test_route_dests_override(sf_dir, tmp_path):
    """C6: a route value lands in its own destination root."""
    from cardinalhq_otel_collector_ray.pipelines import routed_documents
    from cardinalhq_otel_collector_ray.sinks import PartitionedSink
    import os
    main_root = str(tmp_path / "main")
    q_root = str(tmp_path / "quarantine-bucket")
    sink = PartitionedSink(main_root, 1706078400.0, num_partitions=2,
                           route_dests={"quarantine": q_root})
    entries = sink.write(routed_documents(sf_dir), key_col="doc_id",
                         route_col="route", tokens_len_col="n_tok")
    q_entries = [e for e in entries if e.sink == "quarantine"]
    assert q_entries and all(e.path.startswith(q_root) for e in q_entries)
    others = [e for e in entries if e.sink != "quarantine"]
    assert others and all(e.path.startswith(main_root) for e in others)


def test_sumo_idempotent_and_nonmutating():
    """sumo_marshaler_test.go:70-321 parity: marshaling twice yields
    identical bytes and never mutates the input batch."""
    batch = _logs_batch()
    before = batch.to_pylist()
    out1 = marshal_sumo_ic(batch, record_attr_cols=("level",))
    out2 = marshal_sumo_ic(batch, record_attr_cols=("level",))
    assert out1 == out2
    assert batch.to_pylist() == before


def test_sumo_quote_and_newline_escaping():
    """Quote-escaping golden: bodies containing quotes/newlines must stay
    valid JSON-lines and round-trip exactly."""
    tricky = 'say "hi"\nline2\t\\backslash'
    out = marshal_sumo_ic(_logs_batch(body=[tricky]),
                          record_attr_cols=("level",))
    lines = out.decode().strip().split("\n")
    assert len(lines) == 1
    rec = json.loads(lines[0])
    msg = json.loads(rec["message"])
    assert msg["log"] == tricky


def test_jsonl_round_trip():
    """exporter_test.go:36-40 JSONEq analog: OTLP-JSON-lines round-trip
    reproduces every record."""
    from cardinalhq_otel_collector_ray.sinks.serializers import marshal_jsonl
    batch = pa.table({"a": [1, 2], "b": ["x", 'y "q"'], "c": [1.5, None]})
    lines = marshal_jsonl(batch).decode().strip().split("\n")
    got = [json.loads(ln) for ln in lines]
    assert got == [{"a": 1, "b": "x", "c": 1.5},
                   {"a": 2, "b": 'y "q"', "c": None}]
