"""Encoding-extension registration surface — the pluggable-marshaler
parity of ``exporter/awss3exporter/marshaler.go:27-40`` + the sink config
path of ``config.go:110-112``: register_marshaler() validation table, and
a config-driven custom format written through PartitionedSink."""

import pyarrow as pa
import pytest

from cardinalhq_otel_collector_ray.sinks.serializers import (
    EXTENSIONS, MARSHALERS, register_marshaler, serialize,
    unregister_marshaler)


@pytest.fixture
def _clean():
    yield
    unregister_marshaler("csv")
    unregister_marshaler("tsv")


def test_register_marshaler_validation_table(_clean):
    from marshal_helpers import to_csv
    # happy path: registered format serializes and carries its extension
    register_marshaler("csv", to_csv, "csv")
    assert "csv" in MARSHALERS and EXTENSIONS["csv"] == "csv"
    data, ext = serialize(pa.table({"a": [1, 2], "b": ["x", None]}), "csv")
    assert data == b"a,b\n1,x\n2,\n" and ext == "csv"
    # compression composes like any built-in format
    import gzip
    gz, ext = serialize(pa.table({"a": [1]}), "csv", compression="gzip")
    assert gzip.decompress(gz) == b"a\n1\n" and ext == "csv.gz"
    # double-register requires overwrite=True
    with pytest.raises(ValueError, match="already registered"):
        register_marshaler("csv", to_csv, "csv")
    register_marshaler("csv", to_csv, "txt", overwrite=True)
    assert EXTENSIONS["csv"] == "txt"
    # built-ins are protected (register and unregister)
    with pytest.raises(ValueError, match="built-in"):
        register_marshaler("parquet", to_csv, "parquet", overwrite=True)
    with pytest.raises(ValueError, match="built-in"):
        unregister_marshaler("jsonl")
    # bad inputs
    with pytest.raises(ValueError):
        register_marshaler("", to_csv, "csv")
    with pytest.raises(ValueError):
        register_marshaler("tsv", "not-callable", "tsv")
    with pytest.raises(ValueError):
        register_marshaler("tsv", to_csv, ".tsv")


def test_config_driven_custom_format_through_sink(tmp_path, sf_dir,
                                                  ray_session, _clean):
    """The full config path: a spec 'marshalers:' block registers the
    custom format by import path; 'write:' drives PartitionedSink with
    format=csv; the written objects are real CSV with the custom
    extension, and the manifest/resume contract holds."""
    from cardinalhq_otel_collector_ray.pipelines.spec import write_topology

    # a real deployment's marshaler package is importable on every node;
    # the tests/ helper is driver-only, so ship it by value to workers
    import marshal_helpers
    from ray import cloudpickle
    cloudpickle.register_pickle_by_value(marshal_helpers)

    spec = {
        "source": {"kind": "parquet", "table": "documents",
                   "columns": ["doc_id", "text", "source"]},
        "stages": [{"kind": "parse_regex", "column": "text",
                    "pattern": r"^(?P<head_word>\w+)"}],
        "route": {"default": "main", "rules": [
            {"kind": "equals", "column": "head_word", "value": "slow",
             "sink": "errors"}]},
        "sinks": {"main": {"stages": [
            {"kind": "select", "columns": ["doc_id", "route"]}]},
            "errors": {"stages": [
                {"kind": "select", "columns": ["doc_id", "route"]}]}},
        "marshalers": {"csv": {"fn": "marshal_helpers:to_csv",
                               "extension": "csv"}},
        "write": {"root": str(tmp_path / "out"), "run_ts": 1706078400.0,
                  "key_column": "doc_id", "format": "csv",
                  "num_partitions": 2, "resume": False},
    }
    sink, entries = write_topology(spec, sf_dir)
    assert entries and sink.fmt == "csv"
    import pyarrow.parquet as pq
    n_input = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert sum(e.rows for e in entries) == n_input  # conservation
    for e in entries:
        assert e.path.endswith(".csv")
        with open(e.path, "rb") as f:
            lines = f.read().decode().strip().split("\n")
        assert lines[0] == "doc_id,route"
        assert len(lines) - 1 == e.rows
    # resume skips everything on an identical rerun
    sink2, entries2 = write_topology(
        {**spec, "write": {**spec["write"], "resume": True}}, sf_dir)
    assert entries2 == []
