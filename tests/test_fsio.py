"""Object-store filesystem layer (fsio.py) + URI-rooted sinks.

The reference's sink is an S3 uploader (``exporter/awss3exporter/internal/
upload/s3_writer.go:54-132``); these tests prove the whole
write/resume/compaction contract holds when the sink root is a URI, not a
local path:

- ``memory://`` — fsspec in-process object store: exercises the
  PyFileSystem fallback + the no-rename PUT-atomicity branch (driver-side
  fsio/manifest API only; memory state is per-process, so no Ray tasks).
- ``file://`` — pyarrow-native URI over real shared disk: full Ray
  write/resume path through ``FileSystem.from_uri``.
- ``local://`` — fsspec's local filesystem: full Ray write through the
  OBJECT-STORE branch (direct write, per-entry manifest objects) while
  workers still share the underlying disk, so round-trips are verifiable.
"""

import json

import pyarrow.parquet as pq
import pytest

from cardinalhq_otel_collector_ray import fsio

RUN_TS = 1706078400.0


# ---------------------------------------------------------------- fsio unit


def test_fsio_memory_roundtrip():
    root = "memory://fsio-unit/a"
    p = fsio.join(root, "x", "y.bin")
    assert not fsio.exists(p)
    fsio.write_bytes_atomic(p, b"\x00payload")
    assert fsio.exists(p)
    assert fsio.file_size(p) == 8
    assert fsio.read_bytes(p) == b"\x00payload"
    files = fsio.list_files(fsio.join(root, "x"))
    assert len(files) == 1 and files[0].endswith("y.bin")
    # overwrite is last-write-wins (PUT semantics)
    fsio.write_bytes_atomic(p, b"v2")
    assert fsio.read_bytes(p) == b"v2"
    fsio.delete(p)
    assert not fsio.exists(p)
    assert fsio.list_files(fsio.join(root, "x")) == []


def test_fsio_local_atomic_rename(tmp_path):
    # local writes go through <path>.tmp + rename: no .tmp residue after
    p = str(tmp_path / "d1" / "d2" / "out.bin")
    fsio.write_bytes_atomic(p, b"abc")
    assert fsio.read_bytes(p) == b"abc"
    assert not fsio.exists(p + ".tmp")
    # file:// URI resolves to the same file
    assert fsio.read_bytes("file://" + p) == b"abc"
    assert fsio.is_local(p) and fsio.is_local("file://" + p)
    assert not fsio.is_local("s3://bucket/key")


def test_fsio_list_files_missing_dir_is_empty(tmp_path):
    assert fsio.list_files(str(tmp_path / "nope")) == []
    assert fsio.list_files("memory://fsio-unit/never-written") == []


# ------------------------------------------------- manifest on object store


def test_manifest_object_store_layout():
    """On a non-local root the manifest is one small object per entry
    (atomic PUT, last-write-wins) — object stores have no atomic append."""
    from cardinalhq_otel_collector_ray.state.manifest import (
        Manifest, ManifestEntry)
    m = Manifest("memory://fsio-manifest/run1")
    assert m.completed() == {}
    e1 = ManifestEntry("main/3", "main", "memory://b/f1", 10, 100, 5)
    e2 = ManifestEntry("errors/0", "errors", "memory://b/f2", 2, 20, 0)
    m.record(e1)
    m.record(e2)
    got = m.completed()
    assert got == {"main/3": e1, "errors/0": e2}
    # '/' in partition ids must not nest keys: exactly 2 flat objects
    assert len(fsio.list_files("memory://fsio-manifest/run1/manifest")) == 2
    # re-record same partition overwrites (last wins), never duplicates
    e1b = ManifestEntry("main/3", "main", "memory://b/f1", 11, 110, 6)
    m.record(e1b)
    assert m.completed()["main/3"] == e1b
    assert len(fsio.list_files("memory://fsio-manifest/run1/manifest")) == 2
    m.reset()
    assert m.completed() == {}


# ----------------------------------------------- full sink over URI roots


@pytest.fixture()
def uri_roots(tmp_path):
    base = tmp_path / "sinks"
    return {
        "file": "file://" + str(base / "file_fs"),
        "local": "local://" + str(base / "fsspec_fs"),
    }


@pytest.mark.parametrize("scheme", ["file", "local"])
def test_sink_write_over_uri_root(sf_dir, uri_roots, scheme):
    """run_to_sinks over a URI root: same layout, counts and manifest
    contract as the plain-path run (file:// = rename branch, local:// =
    object-store direct-PUT branch + per-entry manifest objects)."""
    from cardinalhq_otel_collector_ray.pipelines import run_to_sinks
    root = uri_roots[scheme]
    sink, entries = run_to_sinks(sf_dir, root, run_ts=RUN_TS,
                                 num_partitions=4)
    assert entries
    done = sink.manifest.completed()
    total = sum(e.rows for e in done.values())
    assert total == pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    for e in done.values():
        assert e.path.startswith(root)
        assert "/year=2024/month=01/day=24/hour=06/minute=40/" in e.path
        with fsio.open_input(e.path) as f:
            assert pq.read_table(f).num_rows == e.rows
        # no tmp residue anywhere
        assert not fsio.exists(e.path + ".tmp")


@pytest.mark.parametrize("scheme", ["file", "local"])
def test_sink_resume_over_uri_root(sf_dir, uri_roots, scheme):
    """Crash-resume over URI roots: drop two finished partitions from the
    manifest (+ their objects), re-run with resume=True, and only those
    partitions are rewritten — the ls-what-exists contract is
    FS-independent."""
    from cardinalhq_otel_collector_ray.pipelines import run_to_sinks
    root = uri_roots[scheme]
    sink, _ = run_to_sinks(sf_dir, root, run_ts=RUN_TS, num_partitions=4)
    full = sink.manifest.completed()
    victims = sorted(full)[-2:]
    if scheme == "file":  # jsonl manifest: rewrite without victim lines
        lines = [json.dumps({"partition_id": e.partition_id, "sink": e.sink,
                             "path": e.path, "rows": e.rows, "bytes": e.bytes,
                             "tokens": e.tokens})
                 for pid, e in full.items() if pid not in victims]
        fsio.delete(sink.manifest.path)
        for ln in lines:
            fsio.append_line(sink.manifest.path, ln + "\n")
    else:  # per-entry objects: delete the victim entries
        for p in fsio.list_files(sink.manifest.path):
            if json.loads(fsio.read_bytes(p))["partition_id"] in victims:
                fsio.delete(p)
    for pid in victims:
        fsio.delete(full[pid].path)

    sink2, entries2 = run_to_sinks(sf_dir, root, run_ts=RUN_TS,
                                   num_partitions=4, resume=True)
    assert {e.partition_id for e in entries2} == set(victims)
    final = sink2.manifest.completed()
    assert final.keys() == full.keys()
    for pid, e in final.items():
        assert e.rows == full[pid].rows
        assert fsio.exists(e.path)


def test_compaction_over_fsspec_root(sf_dir, uri_roots):
    """compact_sink round-trips parquet through fsio on a non-rename FS:
    small per-partition files merge into one consolidated file per route,
    originals deleted, resume still skips everything."""
    from cardinalhq_otel_collector_ray.pipelines import routed_documents
    from cardinalhq_otel_collector_ray.sinks import PartitionedSink
    from cardinalhq_otel_collector_ray.sinks.partitioned import compact_sink
    root = uri_roots["local"]
    routed = routed_documents(sf_dir)
    sink = PartitionedSink(root, RUN_TS, num_partitions=4)
    sink.write(routed, key_col="doc_id", route_col="route",
               tokens_len_col="n_tok")
    before = sink.manifest.completed()
    rows_before = sum(e.rows for e in before.values())
    new = compact_sink(sink, min_rows=10**9)  # everything is "small"
    assert new, "expected at least one consolidated file"
    after = sink.manifest.completed()
    # every pre-compaction partition still resumes as done
    assert set(before) <= set(after)
    # consolidated files hold all the rows, originals are gone
    for ce in new:
        with fsio.open_input(ce.path) as f:
            assert pq.read_table(f).num_rows == ce.rows
    live = {e.path for e in after.values()}
    for e in before.values():
        if e.path not in live:
            assert not fsio.exists(e.path)
    assert sum(ce.rows for ce in new) == rows_before
    # a resumed write after compaction rewrites nothing
    _, entries2 = (sink, sink.write(routed_documents(sf_dir),
                                    key_col="doc_id", route_col="route",
                                    tokens_len_col="n_tok", resume=True))
    assert entries2 == []


def test_atomic_output_error_deletes_partial_object():
    """Object-store branch: if the writer raises mid-stream, close() would
    commit a truncated object — the error path must delete it so readers
    listing the root never observe a partial (ADVICE r3)."""
    root = "memory://fsio-unit/partial"
    p = fsio.join(root, "part-000.bin")
    with pytest.raises(RuntimeError, match="boom"):
        with fsio.atomic_output(p) as f:
            f.write(b"half a payl")
            raise RuntimeError("boom")
    assert not fsio.exists(p)
    assert fsio.list_files(root) == []
    # a successful write afterwards still lands normally
    fsio.write_bytes_atomic(p, b"full")
    assert fsio.read_bytes(p) == b"full"


def test_atomic_output_error_deletes_local_tmp(tmp_path):
    """Local branch twin (round-4 review): a writer raising mid-stream must
    not leak '<path>.tmp' — globbing readers would try to parse it."""
    p = str(tmp_path / "out" / "part-000.bin")
    with pytest.raises(RuntimeError, match="boom"):
        with fsio.atomic_output(p) as f:
            f.write(b"half a payl")
            raise RuntimeError("boom")
    import os
    assert not os.path.exists(p)
    assert not os.path.exists(p + ".tmp")
    fsio.write_bytes_atomic(p, b"full")
    assert fsio.read_bytes(p) == b"full"


def test_upload_headers_validation_table():
    """Config-surface parity with the reference's upload options
    (writer.go:92-155, validated like config_test.go): accepted values map
    to the S3 header form; out-of-table values and unknown keys raise at
    BUILD time."""
    assert fsio.upload_headers(None) is None
    assert fsio.upload_headers({}) is None
    h = fsio.upload_headers({
        "storage_class": "STANDARD_IA",
        "acl": "bucket-owner-full-control",
        "content_type": "application/x-protobuf",
        "metadata": {"team": "o11y", "run": "r4"}})
    # ACL / Content-Type use the names Arrow's native S3FileSystem
    # recognizes (it silently drops unknown metadata keys); storage class
    # and user metadata have no Arrow setter, so they keep the raw S3
    # header forms for fsspec-backed filesystems (see fsio.upload_headers)
    assert h == {"x-amz-storage-class": "STANDARD_IA",
                 "ACL": "bucket-owner-full-control",
                 "Content-Type": "application/x-protobuf",
                 "x-amz-meta-team": "o11y", "x-amz-meta-run": "r4"}
    for bad in ({"storage_class": "GLACIER_DEEP"},   # not in the enum
                {"acl": "everyone"},
                {"bucket_owner": True},              # unknown key
                {"metadata": {"k": 7}}):             # non-str value
        with pytest.raises(ValueError):
            fsio.upload_headers(bad)
    # sink constructor validates at build, not first write
    from cardinalhq_otel_collector_ray.sinks.partitioned import PartitionedSink
    with pytest.raises(ValueError, match="storage_class"):
        PartitionedSink("memory://uo-bad/x", RUN_TS,
                        upload_options={"storage_class": "nope"})


def test_upload_options_reach_object_store_writer(monkeypatch):
    """Mock-fs integration: every non-local byte flows through
    fsio._open_output — assert the sink's upload options arrive there as
    headers. Uses compact_sink, whose object write runs DRIVER-side
    through the same ``atomic_output(path, sink.upload_options)`` plumbing
    as the task-side write_group (a worker-process write can't be
    observed by a driver monkeypatch)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from cardinalhq_otel_collector_ray.sinks.partitioned import (
        PartitionedSink, compact_sink)
    from cardinalhq_otel_collector_ray.state.manifest import ManifestEntry
    seen = []
    real = fsio._open_output

    def spy(fs, p, headers):
        seen.append((p, headers))
        return real(fs, p, headers)

    monkeypatch.setattr(fsio, "_open_output", spy)
    opts = {"storage_class": "STANDARD_IA", "acl": "private"}
    sink = PartitionedSink("memory://uo-test/root", RUN_TS, num_partitions=2,
                           upload_options=opts)
    # two tiny per-partition files, written + recorded driver-side
    for pid in (0, 1):
        path = sink.object_path("main", pid)
        with fsio.atomic_output(path, sink.upload_options) as f:
            pq.write_table(pa.table({"doc_id": [pid]}), f)
        sink.manifest.record(ManifestEntry(
            partition_id=f"main/{pid}", sink="main", path=path,
            rows=1, bytes=fsio.file_size(path), tokens=0))
    out = compact_sink(sink, min_rows=100)
    assert out, "compaction should have merged the two small files"
    want = {"x-amz-storage-class": "STANDARD_IA", "ACL": "private"}
    data_writes = [(p, h) for p, h in seen if "sink=" in p]
    assert data_writes and all(h == want for _, h in data_writes)
    compact_writes = [p for p, _ in data_writes if "compact" in p]
    assert compact_writes, "compact_sink write must carry the headers too"
