"""Mergeable sketches — approximate aggregates for unbounded cardinality.

At 100 TB an exact `count(DISTINCT …)` per key shuffles every distinct
pair; the mergeable-sketch pattern (one sketch per block → tiny merge)
keeps the exchange O(blocks × sketch_size). This module ships a
vectorized HyperLogLog (Flajolet et al. 2007, with the standard small- and
large-range corrections) — the same two-phase shape as the exact
aggregates: per-block ``map_batches`` partials, one cheap merge.

`distinct_tokens_per_source` in ``__ray_entry__`` is the EXACT twin used
for oracle conformance; this is the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


class HyperLogLog:
    """Vectorized HLL over uint64 hashed values. p registers bits → 2^p
    registers; standard error ≈ 1.04 / sqrt(2^p)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashed(self, h: np.ndarray) -> "HyperLogLog":
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction (exact for the leading-zero count)
        rank = np.where(rest == 0, 65 - self.p,
                        64 - np.floor(np.log2(rest.astype(np.float64) + 0.5))
                        ).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        z = 1.0 / np.sum(np.exp2(-self.registers.astype(np.float64)))
        e = alpha * m * m * z
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(e)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(b, dtype=np.uint8).copy())


def _hash_values(values) -> np.ndarray:
    return pd.util.hash_array(np.asarray(values)).astype(np.uint64)


def approx_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> float:
    """Global approximate distinct count: one HLL per block, merged on the
    driver (blocks × 4 KiB moves — never the values)."""
    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        h = HyperLogLog(p).add_hashed(_hash_values(batch[column].to_numpy()))
        return pd.DataFrame({"sketch": [h.to_bytes()]})

    merged = HyperLogLog(p)
    for b in ds.map_batches(sketch, batch_format="pandas") \
               .iter_batches(batch_format="pandas"):
        for s in b["sketch"]:
            merged = merged.merge(HyperLogLog.from_bytes(s, p))
    return merged.estimate()


def approx_distinct_per_key(ds: ray.data.Dataset, key: str, column: str,
                            p: int = 12) -> ray.data.Dataset:
    """Per-key approximate distinct: per-(block, key) sketches → groupby
    merge → estimate. Output: key, approx_distinct (float)."""
    def sketch(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in batch.groupby(key, sort=False):
            h = HyperLogLog(p).add_hashed(_hash_values(g[column].to_numpy()))
            rows.append({key: k, "sketch": h.to_bytes()})
        return pd.DataFrame(rows)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = HyperLogLog(p)
        for s in g["sketch"]:
            merged = merged.merge(HyperLogLog.from_bytes(s, p))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "approx_distinct": [merged.estimate()]})

    partials = ds.map_batches(sketch, batch_format="pandas")
    return partials.groupby(key).map_groups(merge_group, batch_format="pandas")
