"""End-to-end 'switch from the reference' path: declarative topology spec
(collector-YAML analog) → shared decorate chain → route fan-out → per-sink
enforcement → PartitionedSink per sink with DIFFERENT marshal formats and
compressions → lineage manifest + notify events. Asserts the north-rule
conformance targets: routed-row conservation, per-sink counts, notify-after-
record ordering, and decodable sink payloads."""

import glob
import gzip
import json
import os

import pyarrow.parquet as pq

from cardinalhq_otel_collector_ray.pipelines.spec import compile_topology
from cardinalhq_otel_collector_ray.sinks.partitioned import PartitionedSink

SPEC = {
    "source": {"kind": "parquet", "table": "documents",
               "columns": ["doc_id", "text", "source"]},
    "stages": [
        {"kind": "parse_regex", "column": "text",
         "pattern": r"^(?P<head_word>\w+)"},
    ],
    "route": {"default": "main", "rules": [
        {"kind": "equals", "column": "head_word", "value": "slow",
         "sink": "errors"},
        {"kind": "sample", "id_column": "doc_id", "percent": 10,
         "sink": "sampled"},
    ]},
    "sinks": {
        "errors": {"stages": [{"kind": "select",
                               "columns": ["doc_id", "text", "route"]}]},
        "sampled": {"stages": [{"kind": "replace_pattern", "column": "text",
                                "pattern": r"\d+", "replacement": "#",
                                "out": "text_redacted"}]},
    },
}

SINK_FORMATS = {"main": ("parquet", None),
                "errors": ("jsonl", "gzip"),
                "sampled": ("jsonl", None)}


def test_topology_multiformat_sinks_manifest_and_notify(tmp_path, sf_dir,
                                                        ray_session):
    # defined inside the test so cloudpickle ships it BY VALUE to workers
    # (the sink object, notifier included, is captured by write closures)
    class CaptureNotifier:
        def __init__(self):
            self.events = []

        def enqueue(self, e):
            self.events.append(e)
            return True

        def shutdown(self, deadline_s=None):
            pass

    sinks = compile_topology(SPEC, sf_dir)
    n_input = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    total_rows = 0
    notifier = CaptureNotifier()
    all_entries = {}
    for name, ds in sorted(sinks.items()):
        fmt, comp = SINK_FORMATS[name]
        sink = PartitionedSink(str(tmp_path / name), run_ts=1706078400.0,
                               num_partitions=2, fmt=fmt, compression=comp,
                               notifier=notifier)
        entries = sink.write(ds, key_col="doc_id", route_col="route",
                             resume=False)
        all_entries[name] = entries
        total_rows += sum(e.rows for e in entries)
        # lineage manifest exists and replays to the same entries
        completed = sink.manifest.completed()
        assert {e.partition_id for e in entries} == set(completed)

    # routed-row CONSERVATION: the fan-out partitions the input exactly
    assert total_rows == n_input

    # notify-after-record: one event per manifest entry, with path + size
    assert len(notifier.events) == sum(len(v) for v in all_entries.values())
    by_key = {e.key: e.size for e in notifier.events}
    for entries in all_entries.values():
        for ent in entries:
            assert by_key[ent.path] == ent.bytes

    # payloads decode per format: gzip JSONL for errors, plain JSONL for
    # sampled, parquet for main — counts match the manifest
    err_files = glob.glob(str(tmp_path / "errors" / "**" / "*.jsonl.gz"),
                          recursive=True)
    assert err_files
    err_rows = 0
    for f in err_files:
        for line in gzip.decompress(open(f, "rb").read()).decode().splitlines():
            rec = json.loads(line)
            assert rec["route"] == "errors"
            err_rows += 1
    assert err_rows == sum(e.rows for e in all_entries["errors"])

    main_files = glob.glob(str(tmp_path / "main" / "**" / "*.parquet"),
                           recursive=True)
    main_rows = sum(pq.read_metadata(f).num_rows for f in main_files)
    assert main_rows == sum(e.rows for e in all_entries["main"])

    # sampled sink's enforcement chain ran: redacted column present
    samp_files = glob.glob(str(tmp_path / "sampled" / "sink=sampled" / "**"
                               / "*.jsonl"), recursive=True)
    rec = json.loads(open(samp_files[0]).readline())
    assert "text_redacted" in rec

    # strftime partition layout (partition_test.go golden timestamp)
    assert "year=2024/month=01/day=24/hour=06/minute=40" in \
        all_entries["main"][0].path
