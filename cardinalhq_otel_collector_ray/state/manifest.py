"""Per-partition lineage manifest — checkpoint index for resumable runs.

The analog of the reference's notify-after-upload events: every successful
upload enqueues ``{bucket, key, size}`` to a webhook
(``exporter/awss3exporter/internal/notify/notifier.go:160-257``,
``payload.go:57-75``). Here every partition write records one JSON entry
``{partition_id, sink, path, rows, bytes, tokens}``; on resume, partitions
already present are skipped (ls-what-exists resumability, SURVEY §4
"Checkpoint / resume").

Storage layout depends on the root filesystem (``fsio.py``):

- **local / file://** — one ``manifest.jsonl``, appended with single
  O_APPEND line writes (atomic on POSIX ≤ PIPE_BUF); last line wins.
- **object stores** (``s3://`` …) — no atomic append exists, so each
  entry is its own small object ``manifest/<encoded-partition-id>.json``
  (PUT is atomic; a re-recorded partition overwrites the same key —
  last-write-wins matches the jsonl semantics). ``completed()`` is one
  LIST + N small GETs, proportional to finished partitions, not data.

Either way, data is renamed/PUT into place BEFORE the manifest entry
lands, and a retried partition overwrites the same deterministic path
(idempotent) — a killed run never leaves a half-recorded partition.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

from .. import fsio


@dataclass(frozen=True)
class ManifestEntry:
    partition_id: str
    sink: str
    path: str
    rows: int
    bytes: int
    tokens: int = 0


def _encode_pid(partition_id: str) -> str:
    """Partition id → flat object key ('/' and '%' escaped, reversible)."""
    return partition_id.replace("%", "%25").replace("/", "%2F")


class Manifest:
    def __init__(self, root: str):
        self.root = root
        self.local = fsio.is_local(root)
        if self.local:
            fsio.makedirs(root)
            self.path = fsio.join(root, "manifest.jsonl")
        else:
            self.path = fsio.join(root, "manifest")

    def completed(self) -> dict[str, ManifestEntry]:
        """partition_id → entry for every finished partition (last wins)."""
        out: dict[str, ManifestEntry] = {}
        if self.local:
            if fsio.exists(self.path):
                for line in fsio.read_bytes(self.path).decode().splitlines():
                    if line.strip():
                        e = ManifestEntry(**json.loads(line))
                        out[e.partition_id] = e
        else:
            for p in fsio.list_files(self.path):
                e = ManifestEntry(**json.loads(fsio.read_bytes(p)))
                out[e.partition_id] = e
        return out

    def record(self, entry: ManifestEntry) -> None:
        if self.local:
            fsio.append_line(self.path, json.dumps(asdict(entry)) + "\n")
        else:
            key = fsio.join(self.path, _encode_pid(entry.partition_id) + ".json")
            fsio.write_bytes_atomic(key, json.dumps(asdict(entry)).encode())

    def reset(self) -> None:
        if self.local:
            if fsio.exists(self.path):
                fsio.delete(self.path)
        else:
            for p in fsio.list_files(self.path):
                fsio.delete(p)


def backoff_delays(max_attempts: int = 3, initial_s: float = 1.0,
                   max_s: float = 30.0, jitter=None) -> list[float]:
    """Retry schedule of the reference notifier
    (``internal/notify/notifier.go:416-425``, defaults ``config.go:18-26``):
    exponential backoff ``initial * 2^n`` capped at ``max_s``, each delay
    scaled by a jitter factor in [0.5, 1.5). ``jitter`` is an optional
    callable returning that factor (deterministic in tests; random in a
    live retry loop)."""
    out = []
    d = initial_s
    for _ in range(max_attempts):
        f = jitter() if jitter is not None else 1.0
        out.append(min(d, max_s) * f)
        d *= 2
    return out
