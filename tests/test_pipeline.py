"""Flagship pipeline end-to-end: token passthrough equality, sink layout,
manifest lineage, resume-skip (FIXTURES.md F5/F6)."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from cardinalhq_otel_collector_ray.pipelines import (
    routed_documents, run_to_sinks, sink_counts)
from cardinalhq_otel_collector_ray.sources import build_vocab, tokenized_documents

RUN_TS = 1706078400.0  # 2024-01-24T06:40:00Z — partition_test.go golden time


def test_tokens_pass_through_byte_identical(sf_dir):
    """North-rule invariant: tokens survive parse/enrich/route unchanged."""
    vocab = build_vocab(sf_dir)
    base = tokenized_documents(sf_dir, vocab=vocab).to_pandas()
    routed = routed_documents(sf_dir, vocab=vocab).to_pandas()
    b = base.set_index("doc_id")["tokens"]
    r = routed.set_index("doc_id")["tokens"]
    assert set(b.index) == set(r.index)
    for did in b.index:
        assert list(b[did]) == list(r[did]), did


def test_route_partition_counts_sum_to_total(sf_dir):
    counts = sink_counts(routed_documents(sf_dir)).to_pandas()
    total_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert counts["n_rows"].sum() == total_docs
    assert set(counts["route"]) <= {"main", "errors", "sampled", "quarantine"}


@pytest.fixture()
def out_root(tmp_path):
    return str(tmp_path / "sinks")


def test_sink_layout_and_manifest(sf_dir, out_root):
    sink, entries = run_to_sinks(sf_dir, out_root, run_ts=RUN_TS,
                                 num_partitions=4)
    # strftime partition dirs from the FIXED run timestamp (partition.go:59-115)
    files = glob.glob(os.path.join(
        out_root, "sink=*", "year=2024", "month=01", "day=24", "hour=06",
        "minute=40", "logs_*.parquet"))
    assert files, "expected strftime-partitioned parquet files"
    # manifest rows (notify analog) cover every written file
    manifest_paths = {e.path for e in sink.manifest.completed().values()}
    assert set(files) <= manifest_paths
    # row counts in manifest match files
    for e in sink.manifest.completed().values():
        assert pq.read_metadata(e.path).num_rows == e.rows
    # total rows across sinks == input rows
    total = sum(e.rows for e in sink.manifest.completed().values())
    assert total == pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def test_resume_skips_completed_partitions(sf_dir, out_root):
    sink, entries = run_to_sinks(sf_dir, out_root, run_ts=RUN_TS,
                                 num_partitions=4)
    full_manifest = {e.partition_id: e for e in sink.manifest.completed().values()}

    # simulate a crash: drop the last 2 manifest lines + their files
    lines = open(sink.manifest.path).read().strip().split("\n")
    keep, lost = lines[:-2], lines[-2:]
    with open(sink.manifest.path, "w") as f:
        f.write("\n".join(keep) + "\n")
    for line in lost:
        os.remove(json.loads(line)["path"])

    sink2, entries2 = run_to_sinks(sf_dir, out_root, run_ts=RUN_TS,
                                   num_partitions=4, resume=True)
    # only the lost partitions were rewritten
    assert {e.partition_id for e in entries2} == {
        json.loads(l)["partition_id"] for l in lost}
    # final manifest is equivalent to the uninterrupted run
    final = {e.partition_id: e for e in sink2.manifest.completed().values()}
    assert final.keys() == full_manifest.keys()
    for pid, e in final.items():
        assert e.rows == full_manifest[pid].rows
        assert os.path.exists(e.path)


def test_rerun_without_resume_is_idempotent(sf_dir, out_root):
    sink, _ = run_to_sinks(sf_dir, out_root, run_ts=RUN_TS, num_partitions=4)
    rows1 = {e.partition_id: e.rows for e in sink.manifest.completed().values()}
    sink2, _ = run_to_sinks(sf_dir, out_root, run_ts=RUN_TS, num_partitions=4,
                            resume=False)
    rows2 = {e.partition_id: e.rows for e in sink2.manifest.completed().values()}
    assert rows1 == rows2


def test_metrics_json_written(sf_dir, out_root):
    import json as _json
    run_to_sinks(sf_dir, out_root, run_ts=RUN_TS, num_partitions=4)
    path = os.path.join(out_root, "metrics.json")
    assert os.path.exists(path)
    stages = _json.load(open(path))
    assert stages, "expected at least one operator entry"
    assert all("operator" in s and "wall_s" in s for s in stages)
    # the pipeline's rows flowed through at least one map operator
    assert any((s.get("rows") or 0) > 0 for s in stages)


def test_sink_jsonl_gzip_format(sf_dir, out_root):
    """C7 marshal formats wired into the partitioned sink (jsonl + gzip)."""
    import gzip as _gzip
    import json as _json
    from cardinalhq_otel_collector_ray.pipelines import routed_documents
    from cardinalhq_otel_collector_ray.sinks import PartitionedSink
    routed = routed_documents(sf_dir)
    sink = PartitionedSink(out_root, RUN_TS, num_partitions=2,
                           fmt="jsonl", compression="gzip")
    entries = sink.write(routed, key_col="doc_id", route_col="route",
                         tokens_len_col="n_tok")
    assert entries and all(e.path.endswith(".jsonl.gz") for e in entries)
    rec = _json.loads(_gzip.decompress(
        open(entries[0].path, "rb").read()).decode().splitlines()[0])
    assert "doc_id" in rec and "route" in rec
    total = sum(e.rows for e in entries)
    assert total == pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def test_sink_output_token_equality(sf_dir, out_root):
    """North rule: per-row tokens byte-identical on SINK OUTPUT vs input."""
    import ray.data
    from cardinalhq_otel_collector_ray.sources import build_vocab, tokenized_documents
    vocab = build_vocab(sf_dir)
    base = tokenized_documents(sf_dir, vocab=vocab).to_pandas() \
        .set_index("doc_id")["tokens"]
    run_to_sinks(sf_dir, out_root, run_ts=RUN_TS, num_partitions=4)
    files = glob.glob(os.path.join(out_root, "sink=*", "**", "*.parquet"),
                      recursive=True)
    seen = {}
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "tokens"])
        for did, toks in zip(t["doc_id"].to_pylist(), t["tokens"].to_pylist()):
            seen[did] = toks
    assert set(seen) == set(base.index)
    for did, toks in seen.items():
        assert list(base[did]) == list(toks), did


def test_write_streaming_row_sets(sf_dir, out_root):
    import ray.data
    from cardinalhq_otel_collector_ray.pipelines import routed_documents
    from cardinalhq_otel_collector_ray.sinks import PartitionedSink
    routed = routed_documents(sf_dir)
    sink = PartitionedSink(out_root, RUN_TS)
    out_dir = sink.write_streaming(routed)
    back = ray.data.read_parquet(out_dir).to_pandas()
    assert len(back) == pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    assert set(back["route"].unique()) <= {"main", "errors", "sampled", "quarantine"}


def test_flaky_task_retry_keeps_sink_consistent(sf_dir, out_root, tmp_path):
    """A write task that fails once is retried by Ray; the deterministic
    path + atomic rename keep the final output identical to a clean run
    (the idempotent-overwrite-on-retry design, SURVEY §4)."""
    import pyarrow as pa
    import ray.data
    from cardinalhq_otel_collector_ray.pipelines import routed_documents
    from cardinalhq_otel_collector_ray.sinks import PartitionedSink

    marker = tmp_path / "failed_once"

    def flaky(batch: pa.Table) -> pa.Table:
        if not marker.exists():
            marker.write_text("x")
            # hard worker death (Ray retries task/system failures, not
            # user exceptions) — the retried task must overwrite cleanly
            os._exit(1)
        return batch

    routed = routed_documents(sf_dir).map_batches(flaky, batch_format="pyarrow")
    sink = PartitionedSink(out_root, RUN_TS, num_partitions=4)
    entries = sink.write(routed, key_col="doc_id", route_col="route",
                         tokens_len_col="n_tok")
    assert marker.exists()  # the failure really fired
    total = sum(e.rows for e in entries)
    assert total == pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def test_partition_key_golden_exact_string():
    """Exact object-key golden transcribed from the reference
    (internal/upload/partition_test.go:14-130): base prefix + strftime dirs
    + file_prefix + signal + deterministic unique part + extension, at the
    fixed timestamp 2024-01-24T06:40Z."""
    from cardinalhq_otel_collector_ray.sinks import PartitionedSink
    sink = PartitionedSink("/telemetry", 1706078400.0, num_partitions=8,
                           signal="metrics", file_prefix="signal-output-")
    path = sink.object_path("chqs3", 3)
    assert path == ("/telemetry/sink=chqs3/year=2024/month=01/day=24/"
                    "hour=06/minute=40/signal-output-metrics_00003.parquet")
    # timezone rule (s3_writer.go:124-132): partition dirs follow the tz
    from datetime import timezone, timedelta
    sink_tz = PartitionedSink("/t", 1706078400.0, tz=timezone(timedelta(hours=5)))
    assert "hour=11" in sink_tz.object_path("a", 0)


def test_sink_config_validation_at_build(tmp_path):
    """Factory-rejects-at-build parity (awss3exporter factory.go:115-117):
    bad format / compression / partition count fail at sink CONSTRUCTION,
    never at first write."""
    import pytest
    from cardinalhq_otel_collector_ray.sinks.partitioned import PartitionedSink
    with pytest.raises(ValueError, match="unknown sink format"):
        PartitionedSink(str(tmp_path), 0.0, fmt="avro")
    with pytest.raises(ValueError, match="unknown sink compression"):
        PartitionedSink(str(tmp_path), 0.0, compression="lz77")
    with pytest.raises(ValueError, match="num_partitions"):
        PartitionedSink(str(tmp_path), 0.0, num_partitions=0)
    # zstd is a valid build-time choice (extension .zst, writer.go:157-191)
    s = PartitionedSink(str(tmp_path), 0.0, fmt="jsonl", compression="zstd")
    assert s.extension == "jsonl.zst"
