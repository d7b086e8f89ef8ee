"""Re-ingest of sink-exported objects — the collector-to-collector loop.

The reference's S3 exporter writes marshaled objects that downstream
collectors re-ingest (the round-trip its own tests pin:
``exporter/awss3exporter/exporter_test.go:36-40`` unmarshals what the
marshaler wrote; the filelog receiver tails ``body``-format files). This
module closes that loop distributedly: ``read_sink_output`` lists a sink
root (or takes explicit paths / a lineage ``Manifest``) and yields one
``ray.data.Dataset`` of the decoded records — every marshal format
``sinks/serializers.py`` can write, it can read back:

- ``parquet`` / ``jsonl`` / ``body`` — pyarrow-native parses;
- ``sumo_ic`` — two vectorized JSON passes (outer envelope, then the
  per-row ``message`` JSON strings re-joined and parsed as one buffer);
- ``otlp_json`` / ``otlp_proto`` — envelope walkers (per-RECORD decode;
  envelopes are small by the sink's own per-partition batching);
- gzip / zstd transparently by suffix (``compression="auto"``).

Scale shape: file listing happens once on the driver (object-store
LIST — the manifest path avoids even that); bytes are read and decoded
inside ``map_batches`` tasks, so decode parallelism scales with file
count and no object body ever lands on the driver.
"""

from __future__ import annotations

import io
import json
import struct

import numpy as np
import pyarrow as pa
import ray.data

from ..sinks.serializers import (COMPRESSION_SUFFIX, MarshalError,
                                 decompress)


# ------------------------------------------------------------- unmarshalers

def unmarshal_parquet(data: bytes) -> pa.Table:
    import pyarrow.parquet as pq
    return pq.read_table(io.BytesIO(data))


def unmarshal_jsonl(data: bytes) -> pa.Table:
    """JSON-lines → table (pyarrow's C++ line-delimited JSON reader)."""
    import pyarrow.json as pj
    return pj.read_json(io.BytesIO(data))


def unmarshal_body(data: bytes, body_col: str = "body") -> pa.Table:
    """``body`` format: one plain-text line per record
    (``body_marshaler.go:25-44``); the writer appends a trailing
    newline, so a final empty split element is the terminator, not a
    record."""
    text = data.decode()
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    return pa.table({body_col: pa.array(lines, type=pa.string())})


def unmarshal_sumo_ic(data: bytes, body_col: str = "body") -> pa.Table:
    """Invert ``marshal_sumo_ic`` (``sumo_marshaler.go:76-166``): outer
    JSON-lines parse, ``fields`` struct → resource-attr columns, the
    per-row ``message`` JSON strings re-joined into ONE buffer and parsed
    vectorized → record-attr columns + ``log`` → body. Flat original
    schema restored; no per-row json.loads."""
    import pyarrow.json as pj
    outer = pj.read_json(io.BytesIO(data))
    cols: dict[str, pa.Array] = {}
    for name in ("_sourceCategory", "_sourceHost", "_sourceName"):
        if name not in outer.column_names:
            raise MarshalError(f"sumo_ic object missing {name!r}")
        cols[name] = outer[name]
    if "fields" in outer.column_names:
        fields = outer["fields"]
        if isinstance(fields, pa.ChunkedArray):
            fields = fields.combine_chunks()
        if pa.types.is_struct(fields.type):
            for f in fields.type:
                cols[f.name] = fields.field(f.name)
    msgs = outer["message"].to_pylist()
    inner = pj.read_json(io.BytesIO(("\n".join(msgs) + "\n").encode()))
    for name in inner.column_names:
        out_name = body_col if name == "log" else name
        if out_name not in cols:
            cols[out_name] = inner[name]
    return pa.table(cols)


def _any_value_from_json(av: dict):
    if "stringValue" in av:
        return av["stringValue"]
    if "intValue" in av:
        return int(av["intValue"])          # proto3 JSON: int64 as string
    if "doubleValue" in av:
        return float(av["doubleValue"])
    if "boolValue" in av:
        return bool(av["boolValue"])
    return None


def _rows_to_table(rows: list[dict], body_col: str,
                   ts_col: str | None) -> pa.Table:
    """Column-ify decoded log records (python dicts) without guessing:
    key order is first-seen; missing keys → null."""
    if not rows:
        names = [c for c in (ts_col, body_col) if c]
        return pa.table({n: pa.array([], type=pa.string()) for n in names})
    names: list[str] = []
    for r in rows:
        for k in r:
            if k not in names:
                names.append(k)
    return pa.table({n: pa.array([r.get(n) for r in rows]) for n in names})


def unmarshal_otlp_json(data: bytes, body_col: str = "body",
                        ts_col: str | None = "ts") -> pa.Table:
    """Invert ``marshal_otlp_json`` (the ``exporter_test.go:36-40``
    round-trip): walk resourceLogs → scopeLogs → logRecords, resource
    attrs broadcast to every record of their ResourceLogs, AnyValues
    decoded per proto3-JSON."""
    doc = json.loads(data)
    rows: list[dict] = []
    for rl in doc.get("resourceLogs", []):
        res = {kv["key"]: _any_value_from_json(kv["value"])
               for kv in rl.get("resource", {}).get("attributes", [])}
        for sl in rl.get("scopeLogs", []):
            for rec in sl.get("logRecords", []):
                row = dict(res)
                if ts_col is not None and "timeUnixNano" in rec:
                    row[ts_col] = int(rec["timeUnixNano"])
                row[body_col] = _any_value_from_json(rec.get("body", {}))
                for kv in rec.get("attributes", []):
                    row[kv["key"]] = _any_value_from_json(kv["value"])
                rows.append(row)
    return _rows_to_table(rows, body_col, ts_col)


# --------------------------- minimal protobuf wire-format reader (otlp_proto)

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        n |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return n, i
        shift += 7


def _parse_message(buf: bytes) -> list[tuple[int, int, object]]:
    """(field, wire, value) triples of one message. Wire 0 → int,
    1 → 8 raw bytes, 2 → bytes payload."""
    out, i = [], 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            v, i = buf[i:i + 8], i + 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        else:
            raise MarshalError(f"unsupported wire type {wire}")
        out.append((field, wire, v))
    return out


def _fields(msgs, field):
    return [v for f, _, v in msgs if f == field]


def _decode_any_value(buf: bytes):
    """AnyValue: string_value=1, bool_value=2, int_value=3 (two's
    complement varint — the writer's encoding), double_value=4."""
    for field, wire, v in _parse_message(buf):
        if field == 1:
            return v.decode()
        if field == 2:
            return bool(v)
        if field == 3:
            return v - (1 << 64) if v >= (1 << 63) else v
        if field == 4:
            return struct.unpack("<d", v)[0]
    return None


def _decode_key_value(buf: bytes) -> tuple[str, object]:
    msgs = _parse_message(buf)
    (k,) = _fields(msgs, 1)
    (av,) = _fields(msgs, 2)
    return k.decode(), _decode_any_value(av)


def unmarshal_otlp_proto(data: bytes, body_col: str = "body",
                         ts_col: str | None = "ts") -> pa.Table:
    """Invert ``marshal_otlp_proto``: LogsData{1: repeated ResourceLogs
    {1: Resource{1: KeyValue*}, 2: ScopeLogs{2: LogRecord*}}},
    LogRecord{1: fixed64 time_unix_nano, 5: body AnyValue,
    6: KeyValue* attributes} — public OTLP logs/v1 field numbers."""
    rows: list[dict] = []
    for rl in _fields(_parse_message(data), 1):
        rl_msgs = _parse_message(rl)
        res: dict = {}
        for resource in _fields(rl_msgs, 1):
            for kv in _fields(_parse_message(resource), 1):
                k, v = _decode_key_value(kv)
                res[k] = v
        for sl in _fields(rl_msgs, 2):
            for rec in _fields(_parse_message(sl), 2):
                row = dict(res)
                msgs = _parse_message(rec)
                if ts_col is not None:
                    for t in _fields(msgs, 1):
                        row[ts_col] = struct.unpack("<Q", t)[0]
                for av in _fields(msgs, 5):
                    row[body_col] = _decode_any_value(av)
                for kv in _fields(msgs, 6):
                    k, v = _decode_key_value(kv)
                    row[k] = v
                rows.append(row)
    return _rows_to_table(rows, body_col, ts_col)


UNMARSHALERS = {
    "parquet": unmarshal_parquet,
    "jsonl": unmarshal_jsonl,
    "body": unmarshal_body,
    "sumo_ic": unmarshal_sumo_ic,
    "otlp_json": unmarshal_otlp_json,
    "otlp_proto": unmarshal_otlp_proto,
}

_SUFFIX_TO_COMPRESSION = {v: k for k, v in COMPRESSION_SUFFIX.items() if v}


def _is_bookkeeping(path: str) -> bool:
    """Sink-internal objects that share the root with data objects:
    the lineage manifest (``manifest.jsonl`` locally, ``manifest/*.json``
    on object stores — ``state/manifest.py:49-58``) and the per-stage
    ``metrics.json``."""
    name = path.rsplit("/", 1)[-1]
    return name in ("manifest.jsonl", "metrics.json") \
        or "/manifest/" in path


def _data_suffixes(fmt: str, compression: str | None) -> tuple[str, ...]:
    """Expected object suffixes for (format, compression) — with
    ``"auto"``, any compression of the format's extension."""
    from ..sinks.serializers import EXTENSIONS
    ext = "." + EXTENSIONS[fmt]
    if compression == "auto":
        return tuple(ext + s for s in COMPRESSION_SUFFIX.values())
    return (ext + COMPRESSION_SUFFIX.get(compression, ""),)


def _detect_compression(path: str) -> str | None:
    for suffix, comp in _SUFFIX_TO_COMPRESSION.items():
        if path.endswith(suffix):
            return comp
    return None


def list_sink_files(root: str, *, suffix: str = "") -> list[str]:
    """Recursive object listing under a sink root (one driver-side LIST;
    prefer ``manifest=`` on huge sinks — lineage already has the paths)."""
    from pyarrow import fs as pafs

    from ..fsio import resolve_fs
    f, p = resolve_fs(root)
    infos = f.get_file_info(pafs.FileSelector(p, recursive=True,
                                              allow_not_found=True))
    scheme = root.split("://", 1)[0] + "://" if "://" in root else ""
    return sorted(scheme + i.path for i in infos
                  if i.type == pafs.FileType.File
                  and i.path.endswith(suffix))


def read_sink_output(root: str | list[str], *, fmt: str = "jsonl",
                     compression: str | None = "auto",
                     manifest=None, include_path: bool = False,
                     **unmarshal_kwargs) -> ray.data.Dataset:
    """Distributed re-ingest of sink-written objects.

    ``root`` may be a sink root directory/URI (listed recursively on the
    driver) or an explicit path list; pass ``manifest=`` (a lineage
    ``Manifest``) to take the paths from lineage instead of a LIST call.
    ``compression="auto"`` detects gzip/zstd from the object suffix
    per file. Decode runs inside map_batches tasks — one task decodes a
    bundle of files; the driver never touches object bytes.
    """
    if fmt not in UNMARSHALERS:
        raise MarshalError(
            f"unknown format {fmt!r}; known: {sorted(UNMARSHALERS)}")
    if manifest is not None:
        paths = sorted(e.path for e in manifest.completed().values())
    elif isinstance(root, (list, tuple)):
        paths = list(root)
    else:
        # a sink root also holds bookkeeping objects (manifest entries,
        # metrics.json) — keep only this format's data objects
        suffixes = _data_suffixes(fmt, compression)
        paths = [p for p in list_sink_files(root)
                 if p.endswith(suffixes) and not _is_bookkeeping(p)]
    if not paths:
        raise MarshalError(f"no sink objects found under {root!r}")
    unmarshal = UNMARSHALERS[fmt]

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            # Ray's read_binary_files auto-decompresses objects whose
            # suffix names a codec (.gz/.zst) — only objects WITHOUT a
            # codec suffix but with an explicit compression= still carry
            # compressed bytes here
            if _detect_compression(path) is None \
                    and compression not in (None, "auto"):
                data = decompress(data, compression)
            t = unmarshal(data, **unmarshal_kwargs)
            if include_path:
                t = t.append_column(
                    "_source_file",
                    pa.array(np.full(t.num_rows, path, dtype=object)))
            tables.append(t)
        return pa.concat_tables(tables, promote_options="permissive")

    # compression=None: Arrow would otherwise auto-decompress by suffix
    # inside read_binary_files — decompression stays explicit here so
    # "auto"/override semantics are ours (and double-decompress can't bite)
    files = ray.data.read_binary_files(
        paths, include_paths=True,
        arrow_open_stream_args={"compression": None})
    return files.map_batches(decode, batch_format="pyarrow")
