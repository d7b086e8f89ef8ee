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


class KLLSketch:
    """Mergeable quantile sketch (Karnin–Lang–Liberty 2016 compactor
    hierarchy). Level ℓ holds items of weight 2^ℓ; a full level sorts and
    keeps every other item, promoting the survivors one level up.

    Deviation from the paper: the keep-offset alternates DETERMINISTICALLY
    with the compaction counter instead of a coin flip, so a given input
    (in a given order) always yields the same sketch — the engine's
    reproducibility rule. Rank error stays O(1/k)-ish in practice; the
    accuracy tests bound it empirically.
    """

    def __init__(self, k: int = 200, levels: list[np.ndarray] | None = None,
                 compactions: int = 0):
        self.k = k
        self.levels: list[np.ndarray] = (
            levels if levels is not None else [np.empty(0, dtype=np.float64)])
        self.compactions = compactions

    def _capacity(self, level: int) -> int:
        depth = len(self.levels) - 1 - level
        return max(int(self.k * (2.0 / 3.0) ** depth), 8)

    def _compress(self) -> None:
        level = 0
        while level < len(self.levels):
            buf = self.levels[level]
            if len(buf) <= self._capacity(level):
                level += 1
                continue
            buf = np.sort(buf)
            offset = self.compactions & 1
            self.compactions += 1
            kept = buf[offset::2]
            self.levels[level] = np.empty(0, dtype=np.float64)
            if level + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[level + 1] = np.concatenate(
                [self.levels[level + 1], kept])
            # capacities shrink for lower levels as the hierarchy grows —
            # re-scan from the bottom
            level = 0

    def add(self, values: np.ndarray) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        assert self.k == other.k
        n = max(len(self.levels), len(other.levels))
        levels = []
        for i in range(n):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            levels.append(np.concatenate([a, b]).astype(np.float64))
        out = KLLSketch(self.k, levels,
                        self.compactions + other.compactions)
        out._compress()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels) if self.levels else np.empty(0)
        wts = np.concatenate([np.full(len(buf), 1 << lvl, dtype=np.int64)
                              for lvl, buf in enumerate(self.levels)]) \
            if self.levels else np.empty(0, dtype=np.int64)
        order = np.argsort(vals, kind="mergesort")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        vals, wts = self._weighted()
        if len(vals) == 0:
            return float("nan")
        cum = np.cumsum(wts)
        target = q * cum[-1]
        return float(vals[np.searchsorted(cum, target, side="left").clip(0, len(vals) - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def to_bytes(self) -> bytes:
        import struct
        head = struct.pack("<iii", self.k, self.compactions, len(self.levels))
        lens = struct.pack(f"<{len(self.levels)}i",
                           *[len(b) for b in self.levels])
        return head + lens + b"".join(np.ascontiguousarray(b).tobytes()
                                      for b in self.levels)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLLSketch":
        import struct
        k, compactions, n = struct.unpack_from("<iii", data, 0)
        lens = struct.unpack_from(f"<{n}i", data, 12)
        off = 12 + 4 * n
        levels = []
        for ln in lens:
            levels.append(np.frombuffer(data, dtype=np.float64,
                                        count=ln, offset=off).copy())
            off += 8 * ln
        return cls(k, levels, compactions)



def _key_segments(batch, key: str, column: str):
    """Arrow-native per-key segmentation for block-side sketch builders:
    stable key sort + numpy run boundaries → (key values at run starts,
    per-key numpy value slices). Replaces the pandas groupby hop on the
    WIDE input blocks; only the tiny sketch partials are ever pandas."""
    import pyarrow as pa
    import pyarrow.compute as pc
    t = batch.select([key, column])
    # pandas groupby (the path this replaced) EXCLUDES null keys — keep
    # that contract: null-key rows contribute to no per-key sketch
    t = t.filter(t[key].is_valid())
    idx = pc.sort_indices(t, sort_keys=[(key, "ascending")])
    karr = t[key].take(idx).to_numpy(zero_copy_only=False)
    vv = t[column].take(idx).to_numpy(zero_copy_only=False)
    n = len(karr)
    if n == 0:
        return karr[:0], []
    new = np.ones(n, dtype=bool)
    new[1:] = karr[1:] != karr[:-1]
    starts = np.flatnonzero(new)
    ends = np.r_[starts[1:], n]
    return karr[starts], [vv[s:e] for s, e in zip(starts, ends)]

def approx_quantiles_per_key(ds: ray.data.Dataset, key: str, column: str,
                             qs: list[float], k: int = 200,
                             strict_exact: bool = False) -> ray.data.Dataset:
    """Per-key approximate quantiles: one KLL sketch per (block, key) →
    groupby merge → query. The shuffle moves sketches (≤ a few KiB per
    key per block), never values — the scale path next to the exact
    rank-based `quantiles_per_type`. Output: key, q_<q> columns.

    ``strict_exact``: assert the exact-degeneration precondition — no
    compaction ever fired (k exceeded every group size), so the sketch
    answer IS the exact rank quantile. Callers that register an
    exact-SQL oracle against this path pass True so a scale change fails
    LOUDLY here instead of as an opaque oracle hash mismatch."""
    def sketch(batch) -> "pd.DataFrame":
        import pyarrow as pa
        kvals, segs = _key_segments(batch, key, column)
        blobs = [KLLSketch(k).add(v).to_bytes() for v in segs]
        return pa.table({key: pa.array(kvals),
                         "sketch": pa.array(blobs, pa.binary())}).to_pandas()

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = KLLSketch(k)
        for s in g["sketch"]:
            merged = merged.merge(KLLSketch.from_bytes(s))
        if strict_exact and merged.compactions > 0:
            raise AssertionError(
                f"approx_quantiles_per_key(strict_exact): KLL compaction "
                f"fired for key {g[key].iloc[0]!r} (k={k} is no longer "
                f"larger than the group) — the exact-degeneration oracle "
                f"no longer holds at this scale")
        row = {key: g[key].iloc[0]}
        for q in qs:
            row[f"q_{str(q).replace('.', '_')}"] = merged.quantile(q)
        return pd.DataFrame([row])

    partials = ds.map_batches(sketch, batch_format="pyarrow")
    return partials.groupby(key).map_groups(merge_group, batch_format="pandas")


def _hash_values(values) -> np.ndarray:
    return pd.util.hash_array(np.asarray(values)).astype(np.uint64)


def approx_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> float:
    """Global approximate distinct count: one HLL per block, merged on the
    driver (blocks × 4 KiB moves — never the values)."""
    def sketch(batch) -> "pa.Table":
        import pyarrow as pa
        vals = batch[column].to_numpy(zero_copy_only=False)
        h = HyperLogLog(p).add_hashed(_hash_values(vals))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(sketch, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        for s in b["sketch"]:
            merged = merged.merge(HyperLogLog.from_bytes(s.as_py(), p))
    return merged.estimate()


def approx_distinct_per_key(ds: ray.data.Dataset, key: str, column: str,
                            p: int = 12) -> ray.data.Dataset:
    """Per-key approximate distinct: per-(block, key) sketches → groupby
    merge → estimate. Output: key, approx_distinct (float)."""
    def sketch(batch) -> "pd.DataFrame":
        import pyarrow as pa
        kvals, segs = _key_segments(batch, key, column)
        blobs = [HyperLogLog(p).add_hashed(_hash_values(v)).to_bytes()
                 for v in segs]
        return pa.table({key: pa.array(kvals),
                         "sketch": pa.array(blobs, pa.binary())}).to_pandas()

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        merged = HyperLogLog(p)
        for s in g["sketch"]:
            merged = merged.merge(HyperLogLog.from_bytes(s, p))
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "approx_distinct": [merged.estimate()]})

    partials = ds.map_batches(sketch, batch_format="pyarrow")
    return partials.groupby(key).map_groups(merge_group, batch_format="pandas")


def approx_distinct_per_key_lcg_exact(ds: ray.data.Dataset, key: str,
                                      column: str, p: int = 12
                                      ) -> ray.data.Dataset:
    """SQL-replicable HLL sibling (exact-degeneration oracle for the
    sketch machinery): same per-(block, key) partial → register-max merge
    → estimate pipeline as `approx_distinct_per_key`, but with every
    non-SQL-expressible piece swapped for an exactly-replicable one:

    - hash: ``(v * 2654435761 + 12345) % 2^31`` (the repo's BIGINT-safe
      LCG rule) instead of SipHash — weak for production, irrelevant for
      oracling the register/merge/estimate arithmetic;
    - rho: top ``p`` bits → register index, remaining ``31-p`` bits w →
      rank = (32-p) - bit_length(w) (w=0 → 65-p, the empty-suffix
      sentinel mirroring `HyperLogLog.add_hashed`'s layout) — in SQL,
      ``length(ltrim(bin(w),'0'))``;
    - estimate: the register sum Σ 2^(-M) is computed as the EXACT
      integer Σ 2^(64-M) (order-free on both engines, immune to float
      summation order), then one double division; the small-range
      linear-counting branch (E ≤ 2.5m) is the same closed form
      ``m·ln(m/zeros)`` both sides.

    Production callers keep `approx_distinct_per_key` (strong hash);
    this path exists so the HLL family is oracle-checked end to end.
    Output: key, approx_distinct (float64, unrounded — callers round
    via functions.hashing.round6 AFTER any ranking, per CLAUDE.md)."""
    m = 1 << p
    shift = 31 - p

    def sketch(batch) -> "pd.DataFrame":
        import pyarrow as pa
        kvals, segs = _key_segments(batch, key, column)
        blobs = []
        for v in segs:
            h31 = (v.astype(np.int64) * 2654435761 + 12345) % (1 << 31)
            idx = h31 >> shift
            w = h31 & ((1 << shift) - 1)
            # bit_length via frexp exponent — exact (w ≤ 2^27 < 2^53)
            _, exp = np.frexp(w.astype(np.float64))
            rank = np.where(w == 0, 65 - p, 32 - p - exp).astype(np.uint8)
            regs = np.zeros(m, dtype=np.uint8)
            np.maximum.at(regs, idx, rank)
            blobs.append(regs.tobytes())
        return pa.table({key: pa.array(kvals),
                         "sketch": pa.array(blobs, pa.binary())}).to_pandas()

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for s in g["sketch"]:
            regs = np.maximum(regs, np.frombuffer(s, dtype=np.uint8))
        used = int(np.count_nonzero(regs))
        # exact-integer Σ 2^(64-M): empty registers contribute 2^64 each
        s64 = (m - used) * (1 << 64) + sum(
            1 << (64 - int(r)) for r in regs[regs > 0])
        # op order mirrors the SQL expression term for term so the
        # doubles are bitwise identical
        e = (0.7213 / (1 + 1.079 / float(m))) * m * m * (2.0 ** 64) \
            / float(s64)
        if e <= 2.5 * m and used < m:
            import math
            e = m * math.log(m / float(m - used))   # linear counting
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "approx_distinct": [float(e)]})

    partials = ds.map_batches(sketch, batch_format="pyarrow")
    return partials.groupby(key).map_groups(merge_group, batch_format="pandas")


class CountMinSketch:
    """Mergeable Count-Min frequency sketch (Cormode & Muthukrishnan 2005):
    ``d`` rows × ``w`` counters, estimate = min over rows — overestimates
    only, error ≤ e·N/w with prob. 1−(1/2)^d. Deterministic row hashes
    (fixed odd multipliers), so merge/order parity holds everywhere."""

    _MULS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5,
                      0xFF51AFD7ED558CCD], dtype=np.uint64)

    def __init__(self, w: int = 2048, d: int = 4,
                 table: np.ndarray | None = None):
        assert d <= len(self._MULS)
        self.w, self.d = w, d
        self.table = (np.zeros((d, w), dtype=np.int64)
                      if table is None else table)

    def add_hashed(self, h: np.ndarray,
                   counts: np.ndarray | None = None) -> "CountMinSketch":
        if counts is None:
            counts = np.ones(len(h), dtype=np.int64)
        h = h.astype(np.uint64)
        for r in range(self.d):
            with np.errstate(over="ignore"):
                pos = ((h * self._MULS[r]) >> np.uint64(40)) % np.uint64(self.w)
            np.add.at(self.table[r], pos.astype(np.int64), counts)
        return self

    def estimate_hashed(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64)
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.d):
            with np.errstate(over="ignore"):
                pos = ((h * self._MULS[r]) >> np.uint64(40)) % np.uint64(self.w)
            est = np.minimum(est, self.table[r][pos.astype(np.int64)])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.w, self.d) == (other.w, other.d)
        return CountMinSketch(self.w, self.d, self.table + other.table)

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, w: int = 2048, d: int = 4):
        return cls(w, d, np.frombuffer(b, dtype=np.int64).reshape(d, w).copy())


class SpaceSaving:
    """Mergeable SpaceSaving heavy-hitter sketch (Metwally et al. 2005):
    ≤ k (item, count, overestimate) triples; any item with true frequency
    > N/k is guaranteed present. The merge (union counts + keep top-k,
    Agarwal et al. 2012) preserves the guarantee. Deterministic: ties
    evicted by smallest item value."""

    def __init__(self, k: int = 64, items: dict | None = None):
        self.k = k
        self.items: dict[int, list] = items if items is not None else {}

    def add(self, values: np.ndarray,
            counts: np.ndarray | None = None) -> "SpaceSaving":
        v, c_in = np.unique(np.asarray(values, dtype=np.int64),
                            return_counts=True)
        if counts is not None:
            c_in = np.zeros(len(v), dtype=np.int64)
            idx = np.searchsorted(v, np.asarray(values, dtype=np.int64))
            np.add.at(c_in, idx, np.asarray(counts, dtype=np.int64))
        for val, c in zip(v.tolist(), c_in.tolist()):
            if val in self.items:
                self.items[val][0] += c
            elif len(self.items) < self.k:
                self.items[val] = [c, 0]
            else:
                evict = min(self.items, key=lambda x: (self.items[x][0], x))
                base = self.items.pop(evict)[0]
                self.items[val] = [base + c, base]
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        merged: dict[int, list] = {}
        for src in (self.items, other.items):
            for val, (c, e) in src.items():
                if val in merged:
                    merged[val][0] += c
                    merged[val][1] += e
                else:
                    merged[val] = [c, e]
        if len(merged) > self.k:
            keep = sorted(merged, key=lambda x: (-merged[x][0], x))[: self.k]
            merged = {v: merged[v] for v in keep}
        return SpaceSaving(self.k, merged)

    def candidates(self):
        """(item, count, overestimate) sorted by count desc, item asc."""
        return sorted(((v, c, e) for v, (c, e) in self.items.items()),
                      key=lambda t: (-t[1], t[0]))


def approx_heavy_hitters(ds: ray.data.Dataset, column: str, k: int,
                         sketch_k: int = 256,
                         strict_exact: bool = False) -> "pd.DataFrame":
    """Approximate per-column heavy hitters: one SpaceSaving sketch per
    block (values pre-combined with np.unique), tree-merged on the
    driver — blocks × O(sketch_k) state moves, never the values. Any item
    with true share > 1/sketch_k of the stream survives; the exact
    `exact_heavy_hitters` is the verification path.

    ``strict_exact``: assert the exact-degeneration precondition — no
    block sketch ever evicted (every per-block overestimate is 0: an
    eviction always stamps err ≥ 1 on the incoming item) and no driver
    merge ever truncated past ``sketch_k`` — i.e. distinct values fit
    the slots and the answer is exact. Exact-SQL-oracled callers pass
    True so a scale change fails LOUDLY here, not as a hash mismatch."""
    def block(batch) -> "pa.Table":
        import pyarrow as pa
        s = SpaceSaving(sketch_k).add(
            batch[column].to_numpy(zero_copy_only=False))
        items = s.candidates()
        return pa.table({
            "val": pa.array([np.asarray([t[0] for t in items],
                                        dtype=np.int64).tobytes()], pa.binary()),
            "cnt": pa.array([np.asarray([t[1] for t in items],
                                        dtype=np.int64).tobytes()], pa.binary()),
            "err": pa.array([np.asarray([t[2] for t in items],
                                        dtype=np.int64).tobytes()], pa.binary()),
        })

    merged = SpaceSaving(sketch_k)
    for b in ds.map_batches(block, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        for val_b, cnt_b, err_b in zip(b["val"].to_pylist(),
                                       b["cnt"].to_pylist(),
                                       b["err"].to_pylist()):
            errs = np.frombuffer(err_b, dtype=np.int64)
            if strict_exact and len(errs) and errs.max() > 0:
                raise AssertionError(
                    "approx_heavy_hitters(strict_exact): a block sketch "
                    f"evicted (overestimate > 0; sketch_k={sketch_k} no "
                    "longer exceeds per-block distinct values) — the "
                    "exact-degeneration oracle no longer holds at this scale")
            items = {int(v): [int(c), int(e)] for v, c, e in zip(
                np.frombuffer(val_b, dtype=np.int64),
                np.frombuffer(cnt_b, dtype=np.int64),
                errs)}
            union = len(merged.items.keys() | items.keys())
            merged = merged.merge(SpaceSaving(sketch_k, items))
            if strict_exact and union > sketch_k:
                raise AssertionError(
                    "approx_heavy_hitters(strict_exact): driver merge "
                    f"truncated to sketch_k={sketch_k} slots — distinct "
                    "values no longer fit; the exact-degeneration oracle "
                    "no longer holds at this scale")
    top = merged.candidates()[:k]
    return pd.DataFrame({"token": [t[0] for t in top],
                         "approx_count": [t[1] for t in top],
                         "max_overestimate": [t[2] for t in top]})
