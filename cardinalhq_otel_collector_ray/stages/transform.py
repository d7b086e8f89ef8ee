"""Per-record column transforms — the OTTL / attributes-processor vocabulary.

Covers ``transformprocessor`` (set/delete/replace_pattern),
``attributesprocessor`` (insert/update/upsert/delete/hash/extract) and
``redactionprocessor`` (PII masking) from the reference distribution
(``distribution/components.go:119,138,146``) as vectorized Arrow column ops.
Every op is a pure batch function — stateless tasks, no actor needed.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import mulhash


def rename_columns(ds: ray.data.Dataset, mapping: dict[str, str]) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([mapping.get(c, c) for c in batch.column_names])
    return ds.map_batches(fn, batch_format="pyarrow")


def delete_columns(ds: ray.data.Dataset, columns: list[str]) -> ray.data.Dataset:
    return ds.map_batches(lambda t: t.drop_columns([c for c in columns if c in t.column_names]),
                          batch_format="pyarrow")


def set_column(ds: ray.data.Dataset, column: str, fn) -> ray.data.Dataset:
    """OTTL ``set(column, expr)``: ``fn(batch) -> pa.Array`` (upsert)."""
    def _apply(batch: pa.Table) -> pa.Table:
        arr = fn(batch)
        if column in batch.column_names:
            batch = batch.drop_columns([column])
        return batch.append_column(column, arr)
    return ds.map_batches(_apply, batch_format="pyarrow")


def replace_pattern(ds: ray.data.Dataset, column: str, pattern: str,
                    replacement: str, out: str | None = None) -> ray.data.Dataset:
    """OTTL ``replace_pattern`` / redaction masking — RE2 in C++, identical
    semantics to DuckDB ``regexp_replace(col, pattern, replacement, 'g')``."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        repl = pc.replace_substring_regex(col, pattern=pattern, replacement=replacement)
        target = out or column
        if target in batch.column_names:
            batch = batch.drop_columns([target])
        return batch.append_column(target, repl)
    return ds.map_batches(fn, batch_format="pyarrow")


def normalize_text(ds: ray.data.Dataset, column: str = "text",
                   out: str | None = None, **opts) -> ray.data.Dataset:
    """CCNet canonicalization before dedup/hashing (Wenzek et al. 2020
    §4.1): accents stripped, lowercased, digits→0, whitespace collapsed
    — see ``functions.text.normalize_text_column`` for the kernel and
    the exact SQL equivalent. Block-local, all Arrow C++."""
    from ..functions.text import normalize_text_column

    def fn(batch: pa.Table) -> pa.Table:
        norm = normalize_text_column(batch[column], **opts)
        target = out or column
        if target in batch.column_names:
            batch = batch.drop_columns([target])
        return batch.append_column(target, norm)
    return ds.map_batches(fn, batch_format="pyarrow")


def hash_column(ds: ray.data.Dataset, column: str, out: str,
                salt: int = 12345, mod: int = 1_000_003) -> ray.data.Dataset:
    """attributesprocessor ``hash`` action on an integer id column, using
    the oracle-safe multiplicative hash (SQL: ``(c*2654435761+salt)%mod``)."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[column].to_numpy(zero_copy_only=False)
        return batch.append_column(out, pa.array(mulhash(ids, salt=salt, mod=mod)))
    return ds.map_batches(fn, batch_format="pyarrow")


# redactionprocessor analog (reference distribution/components.go:138,725):
# fixed public PII masks, applied as chained RE2 passes. Order matters —
# ip before long-digit runs so an IP is not half-eaten by the digit mask.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # phone needs a + prefix or a dashed triplet form — a bare digit run
    # is <NUM>, not a phone
    ("phone", r"\+\d[\d\- ]{7,14}\d|\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("digits", r"\b\d{6,}\b", "<NUM>"),
)


def redact_pii(ds: ray.data.Dataset, column: str,
               out: str | None = None,
               patterns=PII_PATTERNS) -> ray.data.Dataset:
    """Chained PII redaction over a text column — each mask is one C++ RE2
    pass (vectorized, order-stable). Identical semantics to chained DuckDB
    ``regexp_replace(..., 'g')`` calls, so oracle-checkable."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for _, pattern, replacement in patterns:
            col = pc.replace_substring_regex(col, pattern=pattern,
                                             replacement=replacement)
        target = out or column
        if target in batch.column_names:
            batch = batch.drop_columns([target])
        return batch.append_column(target, col)
    return ds.map_batches(fn, batch_format="pyarrow")
