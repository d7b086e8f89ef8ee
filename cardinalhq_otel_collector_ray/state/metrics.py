"""Per-stage throughput metrics — parsed from ``Dataset.stats()``.

North-rule requirement: "throughput metrics emitted per stage". After a
pipeline run, ``stage_metrics(ds)`` extracts one row per operator
(wall s, total task CPU s, tasks, output rows, output bytes, rows/s) and
``write_metrics`` lands them as ``metrics.json`` next to the manifest —
the engine-side analog of the reference's per-component obsreport metrics
(``exporter/awss3exporter/internal/notify/metrics.go:15-50``).
"""

from __future__ import annotations

import json
import re

_OP_RE = re.compile(r"^Operator (\d+) (.+?): (?:(\d+) tasks executed, )?"
                    r"(\d+) blocks produced in ([\d.]+)s", re.M)
_SUB_RE = re.compile(r"^Operator (\d+) (.+?): executed in ([\d.]+)s", re.M)
_ROWS_RE = re.compile(r"Output num rows per block: .* (\d+) total")
_BYTES_RE = re.compile(r"Output size bytes per block: .* (\d+) total")
_CPU_RE = re.compile(r"Remote cpu time: .*?, ([\d.]+)(us|ms|s) total")


def stage_metrics(ds) -> list[dict]:
    """One dict per operator from ``ds.stats()`` (call after execution)."""
    text = ds.stats()
    out: list[dict] = []
    # split per operator section
    sections = re.split(r"^(?=Operator \d+ )", text, flags=re.M)
    for sec in sections:
        m = _OP_RE.match(sec) or _SUB_RE.match(sec)
        if not m:
            continue
        if len(m.groups()) == 5:
            idx, name, tasks, blocks, wall = m.groups()
        else:
            idx, name, wall = m.groups()
            tasks, blocks = None, None
        rows = _ROWS_RE.search(sec)
        nbytes = _BYTES_RE.search(sec)
        cpu = _CPU_RE.search(sec)
        cpu_s = None
        if cpu:
            v, unit = float(cpu.group(1)), cpu.group(2)
            cpu_s = v / {"us": 1e6, "ms": 1e3, "s": 1.0}[unit]
        wall_s = float(wall)
        row_total = int(rows.group(1)) if rows else None
        out.append({
            "operator": name.strip(),
            "index": int(idx),
            "tasks": int(tasks) if tasks else None,
            "blocks": int(blocks) if blocks else None,
            "wall_s": wall_s,
            "cpu_s": cpu_s,
            "rows": row_total,
            "bytes": int(nbytes.group(1)) if nbytes else None,
            "rows_per_s": (row_total / wall_s) if (row_total and wall_s) else None,
        })
    return out


def write_metrics(ds, root: str, filename: str = "metrics.json") -> str:
    from .. import fsio
    path = fsio.join(root, filename)
    fsio.write_bytes_atomic(path, json.dumps(stage_metrics(ds), indent=1).encode())
    return path
