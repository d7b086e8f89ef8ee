"""Deterministic, SQL-expressible and vectorized hash/sampling primitives.

Two families:

1. **Oracle-safe hashes** (``mulhash``, ``hashmod_keep``) — pure integer
   arithmetic that DuckDB can reproduce exactly with BIGINT math, used for
   deterministic routing / probabilistic sampling so per-sink routed-row
   counts are bit-for-bit reproducible (the reference routes on wall-clock
   randomness, ``exporter/awss3exporter/internal/upload/partition.go:104-115``;
   we deliberately make routing a pure function of the data — SURVEY §7.4).

2. **Internal 64-bit hashes** (``stable_str_hash64``, ``poly_hash64``) —
   fast vectorized fingerprints for grouping keys (dedup, LSH bands,
   template fingerprints). Never exposed in oracle-checked output columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Knuth multiplicative constant; products stay < 2^63 for ids < ~3.4e9 so the
# identical expression runs in DuckDB BIGINT without overflow:
#   (id * 2654435761 + SALT) % MOD
MUL = 2654435761
SALT = 12345
MOD = 1_000_003


def mulhash(ids: np.ndarray, salt: int = SALT, mod: int = MOD) -> np.ndarray:
    """SQL-equivalent: ``(id * 2654435761 + salt) % mod``  (BIGINT math).

    Ids must be NON-NEGATIVE for cross-engine parity: numpy's ``%`` returns
    a non-negative remainder while SQL's is sign-following, so negative ids
    would hash differently. Every id column in this engine (doc_id,
    event_id, *_key) is non-negative by construction.
    """
    ids = np.asarray(ids, dtype=np.int64)
    return (ids * np.int64(MUL) + np.int64(salt)) % np.int64(mod)


def hashmod_keep(ids: np.ndarray, percent: int, salt: int = SALT) -> np.ndarray:
    """Deterministic hash-mod sampler: keep ~percent% of rows.

    SQL-equivalent predicate: ``(id * 2654435761 + salt) % 1000 < percent*10``.
    Mirrors probabilisticsamplerprocessor semantics (hash-based % sampling,
    reference distribution/components.go:137) but reproducibly.
    """
    return mulhash(ids, salt=salt, mod=1000) < percent * 10


def stable_str_hash64(values) -> np.ndarray:
    """Deterministic (cross-process) 64-bit hash of a string array.

    Uses pandas' SipHash-based ``hash_array`` with its fixed default key —
    stable across workers and runs, vectorized in C. Internal use only
    (grouping/fingerprint keys); not reproducible in SQL.
    """
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr).astype(np.uint64)


def bytes_hash64(arr) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of an Arrow string/binary array.

    Operates directly on the Arrow offsets + data buffers — never
    materializes Python strings (the ``to_pylist`` cost of
    ``stable_str_hash64``). Work is O(total_bytes): one numpy pass per byte
    position over the still-live subset. Right for short id-like columns
    (routing/partition keys); for long document bodies prefer
    ``stable_str_hash64``, whose per-string C loop amortizes better.
    """
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        import pyarrow.compute as pc
        arr = pc.fill_null(arr, "" if pa.types.is_string(arr.type)
                           or pa.types.is_large_string(arr.type) else b"")
    arr = arr.cast(pa.large_binary())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset: arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offsets[:-1]
    lens = np.diff(offsets)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max())):
            sel = lens > j
            idx = starts[sel] + j
            h[sel] = (h[sel] ^ data[idx]) * prime
    return h


def table_key_hash(batch, keys: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of one or more key COLUMNS of an Arrow
    table (buffer-vectorized; strings via ``bytes_hash64``, ints via an
    avalanche multiply). The partition tag for every
    partitioned-C++-merge / partitioned-apply stage."""
    import pyarrow as pa

    h = None
    for k in keys:
        col = batch[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
                or pa.types.is_binary(col.type)
                or pa.types.is_large_binary(col.type)):
            ch = bytes_hash64(col)
        else:
            ch = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            with np.errstate(over="ignore"):
                ch = ch * np.uint64(0x9E3779B97F4A7C15) + np.uint64(0x2545F4914F6CDD1D)
        h = ch if h is None else combine_hash64(h, ch)
    return h


def poly_hash64(mat: np.ndarray, base: int = 1099511628211) -> np.ndarray:
    """Rolling polynomial hash over each row of an int matrix (uint64 wrap).

    Used for token-prefix fingerprints (drain/template-mining analog,
    reference distribution/components.go:124 ``drainprocessor``).
    """
    h = np.zeros(mat.shape[0], dtype=np.uint64)
    b = np.uint64(base)
    off = np.uint64(1469598103934665603)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            h = h * b + mat[:, j].astype(np.uint64) + off
    return h


def combine_hash64(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Order-dependent combine of two uint64 hash arrays (uint64 wrap)."""
    with np.errstate(over="ignore"):
        return h1.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + h2.astype(np.uint64)


def _round_half_away(a: np.ndarray) -> np.ndarray:
    """``std::round`` semantics (half AWAY from zero), vectorized and
    EXACT: ``floor(|a|) + (|a| - floor(|a|) >= 0.5)``, sign restored.

    NOT ``floor(|a| + 0.5)`` — that addition can round UP across a
    representable boundary when ``|a|`` sits just below ``k + 0.5``
    (confirmed: ``0.49999999999999994 + 0.5 == 1.0`` in float64, so the
    naive form returns 1 where DuckDB's std::round returns 0). The
    ``|a| - floor(|a|)`` subtraction is exact for ``|a| < 2^52``
    (Sterbenz), so the comparison sees the true fractional part."""
    x = np.abs(a)
    f = np.floor(x)
    return np.sign(a) * (f + (x - f >= 0.5))


def round6(x):
    """``round(x, 6)`` with SQL semantics: half AWAY from zero.

    numpy and Python round half-to-even, which diverges from DuckDB's
    ``round()`` exactly on .5-ulp ties at the 6th decimal — observed in
    the wild at sf0.1: jaccard 125/128 = 0.9765625 → numpy 0.976562,
    DuckDB 0.976563. Both engines see bit-identical float64 inputs
    (exact-int divisions) and apply the same ×1e6 product, so matching
    the rounding rule (``_round_half_away``, std::round-faithful)
    restores bit-identical rounded output. Every similarity/ratio score
    that an oracle re-rounds MUST go through this, not
    ``np.round``/``round``.
    """
    a = np.asarray(x, dtype=np.float64)
    out = _round_half_away(a * 1e6) / 1e6
    return float(out) if out.ndim == 0 else out


def to_cents(values: np.ndarray) -> np.ndarray:
    """Exact BIGINT cents: ``CAST(round(v * 100) AS BIGINT)`` with SQL
    half-away-from-zero (std::round) semantics via ``_round_half_away``.
    ``np.round`` is half-to-even — current testdata has no v·100 .5-ties
    (scanned), but the rule must not depend on generator luck."""
    a = np.asarray(values, dtype=np.float64) * 100.0
    return _round_half_away(a).astype(np.int64)


def round_units(values: np.ndarray) -> np.ndarray:
    """``CAST(round(v) AS BIGINT)`` with SQL std::round semantics — the
    integer-quantity twin of ``to_cents`` (quantities are integral in the
    current testdata, but the oracle's round() is half-away)."""
    a = np.asarray(values, dtype=np.float64)
    return _round_half_away(a).astype(np.int64)


def part_tags(ids: np.ndarray, partitions: int) -> np.ndarray:
    """int32 partition tag for an int64 id/key array: ``(id * Knuth) % P``
    in uint64 (wrap-safe, sign-safe). The ONE partition-hash discipline for
    every bounded-tag co-partition stage (pair dispatch, mark joins,
    distributed verify) — internal tags only, never an oracle-checked
    value."""
    k = np.asarray(ids, dtype=np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        return ((k * np.uint64(MUL)) % np.uint64(partitions)).astype(np.int32)
