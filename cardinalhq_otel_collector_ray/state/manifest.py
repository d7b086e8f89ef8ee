"""Per-partition lineage manifest — checkpoint index for resumable runs.

The analog of the reference's notify-after-upload events: every successful
upload enqueues ``{bucket, key, size}`` to a webhook
(``exporter/awss3exporter/internal/notify/notifier.go:160-257``,
``payload.go:57-75``). Here every partition write appends one JSON line
``{partition_id, sink, path, rows, bytes, tokens}`` to ``manifest.jsonl``;
on resume, partitions already present are skipped (ls-what-exists
resumability, SURVEY §4 "Checkpoint / resume").

Writes are atomic (tmp file + rename for partition data; O_APPEND line
writes for the manifest) so a killed run never leaves a half-recorded
partition: data is renamed into place BEFORE the manifest line lands, and a
retried partition overwrites the same deterministic path (idempotent).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class ManifestEntry:
    partition_id: str
    sink: str
    path: str
    rows: int
    bytes: int
    tokens: int = 0


class Manifest:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "manifest.jsonl")

    def completed(self) -> dict[str, ManifestEntry]:
        """partition_id → entry for every finished partition (last wins)."""
        out: dict[str, ManifestEntry] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        e = ManifestEntry(**json.loads(line))
                        out[e.partition_id] = e
        return out

    def record(self, entry: ManifestEntry) -> None:
        # single O_APPEND write ≤ PIPE_BUF → atomic on POSIX
        with open(self.path, "a") as f:
            f.write(json.dumps(asdict(entry)) + "\n")

    def reset(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)


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
