"""Importable CUSTOM marshaler for the register_marshaler config-path test
(stands in for a user's encoding extension package)."""

import pyarrow as pa


def to_csv(batch: pa.Table, **kwargs) -> bytes:
    """Deterministic minimal CSV: header + rows, columns in schema order."""
    cols = batch.column_names
    lines = [",".join(cols)]
    data = [batch[c].to_pylist() for c in cols]
    for row in zip(*data):
        lines.append(",".join("" if v is None else str(v) for v in row))
    return ("\n".join(lines) + "\n").encode()
