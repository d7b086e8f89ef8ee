"""Partitioned object-store sink with lineage + resume (awss3exporter analog).

Reproduces the reference's S3 sink layout semantics
(``exporter/awss3exporter/internal/upload/partition.go:59-134``):

- strftime partition dirs, default ``year=%Y/month=%m/day=%d/hour=%H/minute=%M``
  (``factory.go:59``), with a configurable timezone (``s3_writer.go:124-132``)
- object name ``<file_prefix><signal>_<unique>.<format>``

with two deliberate determinism changes (SURVEY §7.4):

- the partition timestamp is a **fixed run timestamp** passed by the
  caller, never wall clock (the reference uses ``clock.Now``,
  ``writer.go:111`` — that breaks exact-count conformance across retries);
- the unique key is the **partition id** (hash-bucket of the row key),
  never a random int/UUID (``partition.go:104-133``), so a retried task
  overwrites the same file instead of duplicating it.

Execution shape: rows get a ``_pid = mulhash(key) % num_partitions``
column; each (sink, pid) group is written by one task as one Parquet file
(atomic tmp+rename locally, atomic PUT on object stores — see
``fsio.atomic_output``), emitting one ManifestEntry — the notify analog
(C8). On resume, completed (sink, pid) partitions are filtered out BEFORE
the shuffle, so finished work costs nothing.

Roots may be local paths or ``s3://`` / ``gs://`` / ``file://`` URIs
(``fsio.resolve_fs``) — on the target multi-node cluster there is no
shared local FS, so the sink, manifest and compaction reads all go
through the same filesystem layer the reference's uploader uses
(``exporter/awss3exporter/internal/upload/writer.go:92-155``).
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..functions.hashing import bytes_hash64, mulhash
from ..state.manifest import Manifest, ManifestEntry
from .. import fsio
from .serializers import COMPRESSION_SUFFIX as _COMPRESSION_SUFFIX

DEFAULT_PARTITION_FORMAT = "year=%Y/month=%m/day=%d/hour=%H/minute=%M"


def partition_dir(run_ts: float, fmt: str = DEFAULT_PARTITION_FORMAT,
                  tz=timezone.utc) -> str:
    """strftime partition dir from the fixed run timestamp
    (partition.go:81-87 with the timezone rule of s3_writer.go:124-132)."""
    return datetime.fromtimestamp(run_ts, tz).strftime(fmt)


def deterministic_uuid7(run_ts: float, seq: int) -> str:
    """UUIDv7-shaped unique key (partition.go:118-133, UniqueKeyFunc
    surface) that is a PURE FUNCTION of (run timestamp, sequence): the
    48-bit ms field comes from ``run_ts`` and the random fields from an
    integer hash of ``seq`` with the sequence in the low bits — so keys
    are RFC-9562-formatted, time-ordered, unique per seq AND idempotent
    across retries (the reference's wall-clock/os-random generator makes
    every retry a new object; ours makes it the same object)."""
    ms = int(run_ts * 1000) & ((1 << 48) - 1)
    h = (seq * 2654435761 + 12345) & ((1 << 42) - 1)
    # seq rides the most-significant non-version bits so keys stay
    # time-(seq-)ordered even within one fixed run timestamp
    rand_a = (seq >> 20) & 0xFFF
    rand_b = ((seq & ((1 << 20) - 1)) << 42) | h
    b = (ms << 80) | (0x7 << 76) | (rand_a << 64) | (0b10 << 62) | rand_b
    hx = f"{b:032x}"
    return f"{hx[:8]}-{hx[8:12]}-{hx[12:16]}-{hx[16:20]}-{hx[20:]}"


class PartitionedSink:
    def __init__(self, root: str, run_ts: float, *,
                 num_partitions: int = 16, signal: str = "logs",
                 file_prefix: str = "", partition_format: str = DEFAULT_PARTITION_FORMAT,
                 tz=timezone.utc, route_dests: dict[str, str] | None = None,
                 fmt: str = "parquet", compression: str | None = None,
                 notifier=None, unique_key: str = "seq",
                 upload_options: dict | None = None):
        from .serializers import EXTENSIONS, MARSHALERS
        # config-validation at BUILD time, not first write (the reference
        # factory rejects bad marshaler configs at exporter build,
        # exporter/awss3exporter/factory.go:115-117)
        if fmt not in MARSHALERS:
            raise ValueError(f"unknown sink format {fmt!r}; known: {sorted(MARSHALERS)}")
        if compression not in _COMPRESSION_SUFFIX:
            raise ValueError(f"unknown sink compression {compression!r}; "
                             f"known: {sorted(k for k in _COMPRESSION_SUFFIX if k)}")
        if num_partitions < 1:
            raise ValueError("num_partitions must be >= 1")
        if unique_key not in ("seq", "uuid7"):
            raise ValueError(f"unknown unique_key {unique_key!r}; "
                             "known: ['seq', 'uuid7']")
        # S3 upload options (storage-class / ACL / content-type / metadata,
        # writer.go:92-155): validated HERE at build time — fsio raises on
        # out-of-table values — and passed to every object write below
        fsio.upload_headers(upload_options)
        self.upload_options = upload_options
        self.unique_key = unique_key
        self.root = root
        self.run_ts = run_ts
        self.num_partitions = num_partitions
        self.signal = signal
        self.file_prefix = file_prefix
        self.time_dir = partition_dir(run_ts, partition_format, tz)
        self.manifest = Manifest(root)
        # C6 per-attr-value destination override: route value → alternate
        # root (the bucket/prefix override of exporter.go:48-66, where the
        # batch is pre-split per attr value so the override is homogeneous)
        self.route_dests = route_dests or {}
        # C7 marshal format + compression (marshaler.go:17-71; .gz suffix
        # per writer.go:157-191). The marshaler FUNCTION is resolved here
        # at build time — the exporter-build resolution of
        # marshaler.go:27-40 — so custom register_marshaler() formats ride
        # the task closure to workers without registry state there.
        self.fmt = fmt
        self.compression = compression
        self.marshal_fn = MARSHALERS[fmt]
        self.extension = EXTENSIONS[fmt] + _COMPRESSION_SUFFIX.get(compression, "")
        # C8 notify-after-upload: every recorded ManifestEntry is also
        # enqueued to the webhook notifier (exporter.go:117-147; queue /
        # batch / retry semantics in state/notifier.py). Default: disabled.
        if notifier is None:
            from ..state.notifier import NoopNotifier
            notifier = NoopNotifier()
        self.notifier = notifier

    def __getstate__(self):
        """The sink object is captured by the per-partition write closure
        and shipped to Ray tasks — but the notifier runs ONLY driver-side
        (``_record_entries``), and a live ``HttpNotifier`` holds threads
        and locks that cannot pickle. Ship a Noop stand-in instead; the
        driver's own instance keeps the real one."""
        from ..state.notifier import NoopNotifier
        state = self.__dict__.copy()
        state["notifier"] = NoopNotifier()
        return state

    def object_path(self, sink: str, pid: int) -> str:
        if self.unique_key == "uuid7":
            uniq = deterministic_uuid7(self.run_ts, pid)
        else:
            uniq = f"{pid:05d}"
        fname = f"{self.file_prefix}{self.signal}_{uniq}.{self.extension}"
        root = self.route_dests.get(sink, self.root)
        return fsio.join(root, f"sink={sink}", self.time_dir, fname)

    def write(self, ds: ray.data.Dataset, *, key_col: str,
              route_col: str = "route", tokens_len_col: str | None = None,
              resume: bool = True, pid_fn=None,
              file_sort_col: str | None = None) -> list[ManifestEntry]:
        """Write every sink's rows as num_partitions deterministic files.

        Returns the manifest entries written THIS run (skipped partitions
        are not re-listed; use ``manifest.completed()`` for the full index).
        """
        done = self.manifest.completed() if resume else {}
        if not resume:
            self.manifest.reset()
        npart = self.num_partitions

        def add_pid(batch: pa.Table) -> pa.Table:
            if pid_fn is not None:
                return batch.append_column("_pid", pa.array(pid_fn(batch)))
            keys = batch[key_col]
            if pa.types.is_string(keys.type) or pa.types.is_large_string(keys.type):
                # buffer-level vectorized hash — no Python string
                # materialization in the sink hot path
                ids = (bytes_hash64(keys) % np.uint64(2**31)).astype(np.int64)
            else:
                ids = keys.to_numpy(zero_copy_only=False).astype(np.int64)
            pid = mulhash(ids, mod=npart)
            return batch.append_column("_pid", pa.array(pid))

        with_pid = ds.map_batches(add_pid, batch_format="pyarrow")

        if done:
            # route → sorted done-pid array; the per-batch filter is then
            # dictionary-encode (sink cardinality is tiny) + one np.isin
            # per distinct route — vectorized, no per-row tuple lookups
            # (this is the HOT path of a resumed run: every surviving row
            # passes through it)
            done_by_route: dict[str, np.ndarray] = {}
            for e in done.values():
                done_by_route.setdefault(e.sink, []).append(
                    int(e.partition_id.rsplit("/", 1)[1]))
            done_by_route = {r: np.unique(np.asarray(p, dtype=np.int64))
                             for r, p in done_by_route.items()}

            def drop_done(batch: pa.Table) -> pa.Table:
                routes = batch[route_col]
                if isinstance(routes, pa.ChunkedArray):
                    routes = routes.combine_chunks()
                enc = routes.dictionary_encode()
                ridx = enc.indices.to_numpy(zero_copy_only=False)
                pids = batch["_pid"].to_numpy(zero_copy_only=False)
                mask = np.ones(len(pids), dtype=bool)
                for j, r in enumerate(enc.dictionary.to_pylist()):
                    done_p = done_by_route.get(r)
                    if done_p is not None and len(done_p):
                        sel = ridx == j
                        mask[sel] = ~np.isin(pids[sel], done_p)
                return batch.filter(pa.array(mask))
            with_pid = with_pid.map_batches(drop_done, batch_format="pyarrow")

        sink_self = self

        def write_group(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return pa.table({"partition_id": pa.array([], pa.string()),
                                 "sink": pa.array([], pa.string()),
                                 "path": pa.array([], pa.string()),
                                 "rows": pa.array([], pa.int64()),
                                 "bytes": pa.array([], pa.int64()),
                                 "tokens": pa.array([], pa.int64())})
            import pyarrow.compute as pc
            sink = g[route_col][0].as_py()
            pid = int(g["_pid"][0].as_py())
            path = sink_self.object_path(sink, pid)
            # deterministic row order within the file for byte-stable output
            # (range-partitioned writes sort by the range column instead, so
            # partition-id file order == global sort order). Arrow sort_indices
            # is stable, matching the pandas mergesort this path replaced —
            # and the take() is the only copy the written bytes ever make.
            order = pc.sort_indices(
                g, sort_keys=[(file_sort_col or key_col, "ascending")])
            table = g.take(order).drop_columns(["_pid"])
            with fsio.atomic_output(path, sink_self.upload_options) as f:
                if sink_self.fmt == "parquet" and sink_self.compression is None:
                    pq.write_table(table, f)
                else:
                    from .serializers import serialize_with
                    data = serialize_with(sink_self.marshal_fn, table,
                                          compression=sink_self.compression)
                    f.write(data)
            tokens = (int(pc.sum(table[tokens_len_col]).as_py() or 0)
                      if tokens_len_col else 0)
            entry = ManifestEntry(partition_id=f"{sink}/{pid}", sink=sink,
                                  path=path, rows=table.num_rows,
                                  bytes=fsio.file_size(path), tokens=tokens)
            # record IN the task, immediately after the atomic rename/PUT:
            # the local O_APPEND line and the per-entry object PUT are both
            # atomic and multi-process safe, so every partition that
            # finished is durably resumable even if the driver (or a
            # sibling group in this same task) dies right after —
            # partition-granular kill-resume, independent of how Ray
            # batches groups into tasks. A task retry re-writes the same
            # bytes and re-records the same entry (last-wins, idempotent).
            sink_self.manifest.record(entry)
            return pa.table({"partition_id": [entry.partition_id],
                             "sink": [sink], "path": [path],
                             "rows": [table.num_rows],
                             "bytes": [entry.bytes],
                             "tokens": [tokens]})

        result = with_pid.groupby([route_col, "_pid"]).map_groups(
            write_group, batch_format="pyarrow")
        return self._record_entries(result)

    def write_sorted(self, ds: ray.data.Dataset, *, sort_col: str,
                     route_col: str = "route",
                     tokens_len_col: str | None = None,
                     resume: bool = True) -> list[ManifestEntry]:
        """Range-partitioned SORTED output: exact balanced boundaries over
        ``sort_col`` (``rangesort.range_partition_bounds``), value-based
        partition assignment (duplicates never straddle a boundary →
        retries idempotent), rows sorted within each file — reading the
        partition files in id order yields a globally sorted stream per
        sink. Same manifest/resume contract as ``write``."""
        import ray as _ray

        from ..stages.rangesort import range_partition_bounds
        bounds = range_partition_bounds(ds, sort_col, self.num_partitions)
        bref = _ray.put(bounds)

        def pid_fn(batch: pa.Table) -> np.ndarray:
            b = _ray.get(bref)
            v = batch[sort_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return np.searchsorted(b, v, side="right").astype(np.int64)

        return self.write(ds, key_col=sort_col, route_col=route_col,
                          tokens_len_col=tokens_len_col, resume=resume,
                          pid_fn=pid_fn, file_sort_col=sort_col)

    def write_streaming(self, ds: ray.data.Dataset, *,
                        route_col: str = "route") -> str:
        """Shuffle-free alternative for the very largest runs: Ray's native
        ``write_parquet(partition_cols=[route])`` writes each block's rows
        under its route directory directly — no co-partitioning exchange,
        so file CONTENTS are not deterministic across reruns (resume
        granularity = the whole run), but per-sink ROW SETS still are.
        Use ``write`` (deterministic per-partition files + manifest) unless
        the co-partitioning shuffle dominates the job.
        """
        out_dir = fsio.join(self.root, "stream", self.time_dir)
        fs, internal = fsio.resolve_fs(out_dir)
        ds.write_parquet(internal, filesystem=fs, partition_cols=[route_col])
        return out_dir

    def _record_entries(self, result) -> list[ManifestEntry]:
        # Manifest entries were durably recorded INSIDE the write tasks
        # (see write_group) — the driver side only streams them back for
        # the return value and fires notifications as partitions land
        # (iter_batches yields blocks as tasks complete, so notify
        # latency tracks the writes, not the whole run).
        #
        # Notification delivery contract: AT-MOST-ONCE across driver
        # death. A partition recorded by a run whose driver died before
        # this loop reached it is resumed-over silently (never re-written,
        # never re-notified) — matching the reference notifier's
        # drop-on-shutdown semantics (notifier.go:181-221: queued events
        # are counted as shutdown drops, not replayed). The manifest is
        # the durable source of truth; consumers that need exactly-once
        # discovery reconcile against `manifest.completed()`.
        from ..state.notifier import Event
        entries: list[ManifestEntry] = []
        for b in result.iter_batches(batch_format="pyarrow", batch_size=None):
            for r in b.to_pylist():
                e = ManifestEntry(partition_id=r["partition_id"],
                                  sink=r["sink"], path=r["path"],
                                  rows=int(r["rows"]), bytes=int(r["bytes"]),
                                  tokens=int(r["tokens"]))
                entries.append(e)
                # notify AFTER the entry is durably recorded (upload-then-
                # notify ordering of writer_test.go:366: no notify on
                # failure — a failed partition never reaches this loop)
                self.notifier.enqueue(Event(bucket=self.root, key=e.path,
                                            size=e.bytes))
        # per-stage throughput metrics (north rule), next to the manifest
        from ..state.metrics import write_metrics
        try:
            write_metrics(result, self.root)
        except Exception:  # stats format drift must never fail a write
            pass
        return entries


def compact_sink(sink: "PartitionedSink", min_rows: int
                 ) -> list[ManifestEntry]:
    """Sink maintenance: merge each route's SMALL partition files
    (< ``min_rows`` rows) into one consolidated file per route — the
    many-small-files problem every long-running partitioned writer grows.

    Safe ordering: the consolidated file is written (atomic tmp+rename)
    and recorded in the manifest BEFORE the absorbed originals are
    deleted, and the absorbed partition ids are re-recorded as pointing
    at the consolidated file — a crash between steps leaves only
    harmless duplicates, never data loss, and `write(resume=True)` still
    skips every absorbed partition. Parquet sinks only; per-route work
    is independent (driver-side here — compaction I/O is object-store
    bound, not compute bound)."""
    assert sink.fmt == "parquet" and sink.compression is None, \
        "compaction reads back parquet; run it on parquet sinks"
    done = sink.manifest.completed()
    by_sink: dict[str, list[ManifestEntry]] = {}
    for e in done.values():
        # pid -1 marks consolidated files (never a real hash bucket)
        if e.rows < min_rows and not e.partition_id.endswith("/-1"):
            by_sink.setdefault(e.sink, []).append(e)

    def compact_route(route: str, entries: list[ManifestEntry]):
        if len(entries) < 2:
            return None
        entries = sorted(entries, key=lambda e: e.partition_id)
        tables = [pq.read_table(fsio.open_input(e.path)) for e in entries]
        merged = pa.concat_tables(tables, promote_options="default")
        path = sink.object_path(route, 0).replace(
            f"{sink.signal}_", f"{sink.signal}_compact_")
        with fsio.atomic_output(path, sink.upload_options) as f:
            pq.write_table(merged, f)
        return (route, entries, path, merged.num_rows,
                fsio.file_size(path))

    results = []
    for route, entries in sorted(by_sink.items()):
        r = compact_route(route, entries)
        if r is not None:
            results.append(r)

    new_entries = []
    for route, absorbed, path, rows, nbytes in results:
        tokens = sum(e.tokens for e in absorbed)
        ce = ManifestEntry(partition_id=f"{route}/-1",
                           sink=route, path=path, rows=rows,
                           bytes=nbytes, tokens=tokens)
        sink.manifest.record(ce)
        new_entries.append(ce)
        # repoint absorbed partitions at the consolidated file (resume
        # keeps skipping them), THEN delete originals
        for e in absorbed:
            sink.manifest.record(ManifestEntry(
                partition_id=e.partition_id, sink=e.sink, path=path,
                rows=e.rows, bytes=0, tokens=e.tokens))
        for e in absorbed:
            if e.path != path and fsio.exists(e.path):
                fsio.delete(e.path)
    return new_entries
