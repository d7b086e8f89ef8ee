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
``otlp_proto`` is NOT implemented (no protobuf runtime in this container)
and raises ``NotImplementedError`` with a clear message.
"""

from __future__ import annotations

import gzip as _gzip
import io
import json

import pyarrow as pa
import pyarrow.parquet as pq

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
                    resource_attr_cols: tuple[str, ...] = (),
                    record_attr_cols: tuple[str, ...] = ()) -> bytes:
    """sumo_ic JSON-lines (``sumo_marshaler.go:76-166``):

    - ``_sourceCategory/_sourceHost/_sourceName`` MUST be present per row
      (hard error otherwise — sumo_marshaler.go:95-104),
    - remaining resource attrs → ``fields``,
    - record attrs + body (under key ``"log"``) → ``message``.
    """
    required = (SOURCE_CATEGORY, SOURCE_HOST, SOURCE_NAME)
    for c in required:
        if c not in batch.column_names:
            raise MarshalError(f"sumo_ic requires resource attr column {c!r}")
    if body_col not in batch.column_names:
        raise MarshalError(f"sumo_ic requires a {body_col!r} column")
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


def marshal_otlp_proto(batch: pa.Table) -> bytes:
    raise NotImplementedError(
        "otlp_proto requires a protobuf runtime, which is not available in "
        "this environment; use 'parquet' or 'jsonl'")


MARSHALERS = {
    "parquet": marshal_parquet,
    "jsonl": marshal_jsonl,
    "body": marshal_body,
    "sumo_ic": marshal_sumo_ic,
    "otlp_proto": marshal_otlp_proto,
}

EXTENSIONS = {"parquet": "parquet", "jsonl": "jsonl", "body": "txt",
              "sumo_ic": "jsonl", "otlp_proto": "binpb"}


def serialize(batch: pa.Table, fmt: str, compression: str | None = None,
              **kwargs) -> tuple[bytes, str]:
    """(payload bytes, file extension) for a batch in the given format.
    ``compression='gzip'`` appends ``.gz`` (writer.go:157-191)."""
    if fmt not in MARSHALERS:
        raise MarshalError(f"unknown format {fmt!r}; known: {sorted(MARSHALERS)}")
    data = MARSHALERS[fmt](batch, **kwargs)
    ext = EXTENSIONS[fmt]
    if compression == "gzip":
        data = _gzip.compress(data, mtime=0)  # mtime=0 → deterministic bytes
        ext += ".gz"
    elif compression is not None:
        raise MarshalError(f"unknown compression {compression!r}")
    return data, ext
