"""C7 marshal formats — sink serializers (Arrow batch → bytes).

Reference (``exporter/awss3exporter/marshaler.go:17-71``): four formats —
``otlp_proto`` (binpb), ``otlp_json``, ``sumo_ic`` (JSON-lines with
``_sourceCategory/_sourceHost/_sourceName`` lifted from resource attrs,
hard error when missing; remaining resource attrs → ``fields``; record
attrs + body → ``message`` with the body under ``"log"``), and ``body``
(one plain-text line per record body). sumo/body are logs-only
(``sumo_marshaler.go:168-174``). Optional gzip compression with the
``.gz`` extension suffix (``internal/upload/writer.go:157-191``).

Here Parquet is the primary format; ``jsonl`` / ``sumo_ic`` / ``body``
are alternate encoders with the reference's field-lifting and error rules.
``otlp_proto`` is a hand-rolled minimal OTLP/protobuf wire-format encoder
(LogsData: varint/length-delimited fields only — no generated classes
needed); compression supports gzip (stdlib) and zstd (pyarrow's C++
codec, gated at import like the reference gates its encoders).
"""

from __future__ import annotations

import gzip as _gzip
import io
import json
import struct

import pyarrow as pa
import pyarrow.parquet as pq

try:  # zstd via pyarrow's bundled C++ codec (no standalone python-zstd here)
    _ZSTD = pa.Codec("zstd") if pa.Codec.is_available("zstd") else None
except Exception:  # pragma: no cover - codec probing must never hard-fail
    _ZSTD = None

# compression → file-extension suffix (writer.go:157-191: .gz / .zst)
COMPRESSION_SUFFIX = {None: "", "gzip": ".gz", "zstd": ".zst"}

SOURCE_CATEGORY = "_sourceCategory"
SOURCE_HOST = "_sourceHost"
SOURCE_NAME = "_sourceName"


class MarshalError(ValueError):
    pass


def marshal_parquet(batch: pa.Table) -> bytes:
    buf = io.BytesIO()
    pq.write_table(batch, buf)
    return buf.getvalue()


def marshal_jsonl(batch: pa.Table) -> bytes:
    """OTLP-JSON-lines analog: one JSON object per record."""
    out = io.StringIO()
    for row in batch.to_pylist():
        json.dump(row, out, default=str, sort_keys=True)
        out.write("\n")
    return out.getvalue().encode()


def marshal_body(batch: pa.Table, body_col: str = "body") -> bytes:
    """``body`` format: one plain-text line per record body
    (``body_marshaler.go:25-44``); logs-only."""
    if body_col not in batch.column_names:
        raise MarshalError(f"body marshaler requires a {body_col!r} column")
    lines = batch[body_col].to_pylist()
    return ("\n".join("" if v is None else str(v) for v in lines) + "\n").encode()


def marshal_sumo_ic(batch: pa.Table, *, body_col: str = "body",
                    resource_attr_cols: tuple[str, ...] | None = None,
                    record_attr_cols: tuple[str, ...] = ()) -> bytes:
    """sumo_ic JSON-lines (``sumo_marshaler.go:76-166``):

    - ``_sourceCategory/_sourceHost/_sourceName`` MUST be present per row
      (hard error otherwise — sumo_marshaler.go:95-104),
    - remaining resource attrs → ``fields``,
    - record attrs + body (under key ``"log"``) → ``message``.

    ``resource_attr_cols=None`` AUTO-DERIVES "remaining" the way the
    reference does (sumo_marshaler.go:111-118: the three ``_source*``
    attrs are lifted and ALL other resource attrs land in ``fields``):
    every schema column except the required three, the body, and the
    declared record-attr columns.
    """
    required = (SOURCE_CATEGORY, SOURCE_HOST, SOURCE_NAME)
    for c in required:
        if c not in batch.column_names:
            raise MarshalError(f"sumo_ic requires resource attr column {c!r}")
    if body_col not in batch.column_names:
        raise MarshalError(f"sumo_ic requires a {body_col!r} column")
    if resource_attr_cols is None:
        excluded = set(required) | {body_col} | set(record_attr_cols)
        resource_attr_cols = tuple(c for c in batch.column_names
                                   if c not in excluded)
    rows = batch.to_pylist()
    out = io.StringIO()
    for row in rows:
        for c in required:
            if row[c] is None:
                raise MarshalError(f"row missing required attr {c}")
        message = {k: row[k] for k in record_attr_cols if row.get(k) is not None}
        message["log"] = row[body_col]
        rec = {
            SOURCE_CATEGORY: row[SOURCE_CATEGORY],
            SOURCE_HOST: row[SOURCE_HOST],
            SOURCE_NAME: row[SOURCE_NAME],
            "fields": {k: row[k] for k in resource_attr_cols
                       if row.get(k) is not None},
            "message": json.dumps(message, sort_keys=True, default=str),
        }
        json.dump(rec, out, sort_keys=True, default=str)
        out.write("\n")
    return out.getvalue().encode()


# ------------------------- minimal protobuf wire-format writer (otlp_proto)
# Wire format only needs varints, length-delimited fields and fixed64 — no
# generated classes. Field numbers follow the public OTLP LogsData schema
# (opentelemetry-proto logs/v1): the shape the reference's otlp_proto
# marshaler emits via plog (marshaler.go:27-40).

def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _fixed64(field: int, value: int) -> bytes:
    return _tag(field, 1) + struct.pack("<Q", value & (1 << 64) - 1)


def _any_value(v) -> bytes:
    """AnyValue: string_value=1, bool_value=2, int_value=3, double_value=4."""
    if isinstance(v, bool):
        return _tag(2, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(3, 0) + _varint(v if v >= 0 else (1 << 64) + v)
    if isinstance(v, float):
        return _tag(4, 1) + struct.pack("<d", v)
    return _len_delim(1, str(v).encode())


def _key_value(k: str, v) -> bytes:
    return _len_delim(1, k.encode()) + _len_delim(2, _any_value(v))


def marshal_otlp_proto(batch: pa.Table, *, body_col: str = "body",
                       ts_col: str | None = None,
                       resource_attr_cols: tuple[str, ...] = (),
                       record_attr_cols: tuple[str, ...] = ()) -> bytes:
    """OTLP LogsData binpb: ONE ResourceLogs/ScopeLogs wrapping one
    LogRecord per row (flat-row analog of the reference's plog marshal,
    ``marshaler.go:27-40``). Resource attrs come from the FIRST row (the
    reference's batches are pre-split per resource value — factory.go:93-101),
    record attrs per row; body under AnyValue.string_value; timestamp (ns)
    into time_unix_nano when ``ts_col`` is given."""
    if body_col not in batch.column_names:
        raise MarshalError(f"otlp_proto requires a {body_col!r} column")
    rows = batch.to_pylist()
    resource = b""
    if rows:
        for c in resource_attr_cols:
            if rows[0].get(c) is not None:
                resource += _len_delim(1, _key_value(c, rows[0][c]))
    log_records = bytearray()
    for row in rows:
        rec = bytearray()
        if ts_col is not None and row.get(ts_col) is not None:
            rec += _fixed64(1, int(row[ts_col]))
        body = row[body_col]
        rec += _len_delim(5, _any_value("" if body is None else body))
        for c in record_attr_cols:
            if row.get(c) is not None:
                rec += _len_delim(6, _key_value(c, row[c]))
        log_records += _len_delim(2, bytes(rec))
    scope_logs = _len_delim(2, bytes(log_records))
    resource_logs = _len_delim(1, resource) + scope_logs
    return bytes(_len_delim(1, resource_logs))


def _any_value_json(v) -> dict:
    """OTLP/JSON AnyValue mapping (proto3 JSON): int64 rides as a STRING,
    doubles as numbers, strings/bools natively — the same encoding plog's
    JSON marshaler emits (``marshaler.go:27-40`` / OTLP spec)."""
    if isinstance(v, bool):
        return {"boolValue": v}
    if isinstance(v, int):
        return {"intValue": str(v)}
    if isinstance(v, float):
        return {"doubleValue": v}
    return {"stringValue": str(v)}


def marshal_otlp_json(batch: pa.Table, *, body_col: str = "body",
                      ts_col: str | None = None,
                      resource_attr_cols: tuple[str, ...] = (),
                      record_attr_cols: tuple[str, ...] = ()) -> bytes:
    """OTLP/JSON LogsData envelope — the reference's fourth marshal format
    (``exporter/awss3exporter/marshaler.go:27-40``; round-trip test
    ``exporter_test.go:36-40``): ``resourceLogs → scopeLogs → logRecords``
    with proto3-JSON field names and AnyValue encoding. Same flat-row →
    one-ResourceLogs mapping as ``marshal_otlp_proto`` (resource attrs
    from the first row of the pre-split batch, record attrs per row,
    ``timeUnixNano`` as a string when ``ts_col`` is given)."""
    if body_col not in batch.column_names:
        raise MarshalError(f"otlp_json requires a {body_col!r} column")
    rows = batch.to_pylist()
    resource: dict = {}
    if rows:
        attrs = [{"key": c, "value": _any_value_json(rows[0][c])}
                 for c in resource_attr_cols if rows[0].get(c) is not None]
        if attrs:
            resource["attributes"] = attrs
    log_records = []
    for row in rows:
        rec: dict = {}
        if ts_col is not None and row.get(ts_col) is not None:
            rec["timeUnixNano"] = str(int(row[ts_col]))
        body = row[body_col]
        rec["body"] = _any_value_json("" if body is None else body)
        rattrs = [{"key": c, "value": _any_value_json(row[c])}
                  for c in record_attr_cols if row.get(c) is not None]
        if rattrs:
            rec["attributes"] = rattrs
        log_records.append(rec)
    doc = {"resourceLogs": [{"resource": resource,
                             "scopeLogs": [{"scope": {},
                                            "logRecords": log_records}]}]}
    return json.dumps(doc, separators=(",", ":"), sort_keys=True).encode()


MARSHALERS = {
    "parquet": marshal_parquet,
    "jsonl": marshal_jsonl,
    "body": marshal_body,
    "sumo_ic": marshal_sumo_ic,
    "otlp_proto": marshal_otlp_proto,
    "otlp_json": marshal_otlp_json,
}

EXTENSIONS = {"parquet": "parquet", "jsonl": "jsonl", "body": "txt",
              "sumo_ic": "jsonl", "otlp_proto": "binpb", "otlp_json": "json"}

_BUILTIN_FORMATS = frozenset(MARSHALERS)


def register_marshaler(fmt: str, fn, extension: str, *,
                       overwrite: bool = False) -> None:
    """Formal encoding-extension registration — the pluggable-marshaler
    surface of ``exporter/awss3exporter/marshaler.go:27-40`` /
    ``config.go:110-112``, where an encoding extension ID resolves to a
    custom marshaler at exporter build time.

    ``fn(batch: pa.Table, **kwargs) -> bytes``; ``extension`` is the file
    suffix (no dot). Registration is process-global: ``PartitionedSink``
    validates formats against this registry at BUILD time, and spec
    YAMLs reach custom formats via the sink ``format:`` key plus a
    ``marshalers:`` config block (pipelines/spec.py). Built-in formats
    cannot be replaced (overwrite only applies to other custom formats);
    Multi-node contract: ``PartitionedSink`` resolves the format to the
    FUNCTION at build time (driver) and ships it inside the write task
    closure (the reference resolves the encoding-extension ID at exporter
    build, marshaler.go:27-40) — so driver-side registration suffices for
    sink writes; only code that calls ``serialize(fmt=...)`` inside its
    own Ray tasks needs worker-side registration."""
    if not fmt or not isinstance(fmt, str):
        raise ValueError("format name must be a non-empty string")
    if fmt in _BUILTIN_FORMATS:
        raise ValueError(f"cannot replace built-in format {fmt!r}")
    if fmt in MARSHALERS and not overwrite:
        raise ValueError(f"format {fmt!r} already registered; "
                         "pass overwrite=True to replace it")
    if not callable(fn):
        raise ValueError("marshaler must be callable (batch -> bytes)")
    if not extension or "." in extension:
        raise ValueError(f"extension must be a bare suffix, got {extension!r}")
    MARSHALERS[fmt] = fn
    EXTENSIONS[fmt] = extension


def unregister_marshaler(fmt: str) -> None:
    """Remove a CUSTOM format (tests / re-registration hygiene)."""
    if fmt in _BUILTIN_FORMATS:
        raise ValueError(f"cannot remove built-in format {fmt!r}")
    MARSHALERS.pop(fmt, None)
    EXTENSIONS.pop(fmt, None)


def serialize_with(fn, batch: pa.Table, compression: str | None = None,
                   **kwargs) -> bytes:
    """Payload bytes from an explicit marshaler function + compression —
    the build-time-resolved path ``PartitionedSink`` ships to its write
    tasks (so custom registered formats work without worker-side
    registry state)."""
    data = fn(batch, **kwargs)
    if compression == "gzip":
        data = _gzip.compress(data, mtime=0)  # mtime=0 → deterministic bytes
    elif compression == "zstd":
        if _ZSTD is None:  # gated like the PIL decode stub
            raise MarshalError("zstd codec not available in this environment")
        data = _ZSTD.compress(data, asbytes=True)
    elif compression is not None:
        raise MarshalError(f"unknown compression {compression!r}")
    return data


def serialize(batch: pa.Table, fmt: str, compression: str | None = None,
              **kwargs) -> tuple[bytes, str]:
    """(payload bytes, file extension) for a batch in the given format.
    ``compression``: 'gzip' → ``.gz``; 'zstd' → ``.zst``
    (writer.go:157-191 format switch)."""
    if fmt not in MARSHALERS:
        raise MarshalError(f"unknown format {fmt!r}; known: {sorted(MARSHALERS)}")
    data = serialize_with(MARSHALERS[fmt], batch, compression, **kwargs)
    return data, EXTENSIONS[fmt] + COMPRESSION_SUFFIX[compression]


def decompress(data: bytes, compression: str,
               decompressed_size: int | None = None) -> bytes:
    """Round-trip helper for tests/readers of serialized sink objects."""
    if compression == "gzip":
        return _gzip.decompress(data)
    if compression == "zstd":
        if _ZSTD is None:
            raise MarshalError("zstd codec not available in this environment")
        return _ZSTD.decompress(data, decompressed_size=decompressed_size,
                                asbytes=True)
    raise MarshalError(f"unknown compression {compression!r}")
