"""Deduplication operators for training-data pipelines.

Extends the reference's dedup/fingerprint vocabulary (logdedup interval
dedup, ``distribution/components.go:133``; drain template mining ``:124``)
with the dedup family a 100 TB corpus pipeline needs:

- exact dedup (hash-partition + per-group first),
- MinHash + LSH near-dup (shingle → minhash → band → bucket groupby),
- SimHash with banded Hamming candidate generation,
- word-set Jaccard exact pairs (blocked, matmul-vectorized),
- embedding-cosine near-dup (blocked matmul).

Scale notes: every operator shuffles only *small derived rows* (hashes,
signatures, band keys) — never full documents; candidate verification
carries only signatures / set matrices per block. Hot buckets are bounded
with ``max_bucket`` guards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import stable_str_hash64
from ..functions.text import char_shingles_u64, list_offsets_values, split_words

# ---------------------------------------------------------------- exact dedup

def exact_dedup(ds: ray.data.Dataset, content_col: str, id_col: str) -> ray.data.Dataset:
    """Keep the min-id row per distinct content value.

    Hash-partition by a 64-bit content hash (so the shuffle moves hashes,
    not a giant string sort domain); exact equality is re-checked within
    the group, so hash collisions cannot merge distinct contents.
    SQL-equivalent: ``SELECT content, min(id) FROM t GROUP BY content``.
    """
    def add_hash(batch: pa.Table) -> pa.Table:
        h = stable_str_hash64(batch[content_col].to_pylist()).view(np.int64)
        return batch.append_column("_chash", pa.array(h))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values(id_col, kind="mergesort").groupby(
            content_col, sort=False, as_index=False).first()
        return keep.drop(columns=["_chash"])

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("_chash").map_groups(per_group, batch_format="pandas")


def exact_dedup_stats(ds: ray.data.Dataset, content_col: str, id_col: str) -> ray.data.Dataset:
    """Per distinct content: (content, keep_id=min(id), n_copies).
    SQL-equivalent: ``SELECT content, min(id), count(*) GROUP BY content``."""
    def add_hash(batch: pa.Table) -> pa.Table:
        h = stable_str_hash64(batch[content_col].to_pylist()).view(np.int64)
        return batch.append_column("_chash", pa.array(h))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        stats = g.groupby(content_col, sort=False)[id_col].agg(["min", "count"]).reset_index()
        return pd.DataFrame({content_col: stats[content_col],
                             "keep_id": stats["min"],
                             "n_copies": stats["count"].astype(np.int64)})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("_chash").map_groups(per_group, batch_format="pandas")


# ------------------------------------------------------------- MinHash + LSH

def _minhash_sigs(codes: np.ndarray, starts: np.ndarray, num_perm: int,
                  seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures from flat shingle codes.

    Permutation hashes h_i(s) = a_i*s + b_i (uint64 wrap); per-doc minima
    via ``np.minimum.reduceat`` — no per-row Python loop.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    n = len(starts) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(codes) == 0:
        return sig
    nonempty = np.diff(starts) > 0
    red_idx = np.minimum(starts[:-1], len(codes) - 1)
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            h = codes * a[i] + b[i]
            mins = np.minimum.reduceat(h, red_idx)
            sig[nonempty, i] = mins[nonempty]
    return sig


class MinHasher:
    """map_batches actor: text → (doc row per band) LSH index rows.

    Emits ``(id, band, band_hash, sig_hex)`` — bands × n_docs small rows;
    the signature rides along (num_perm × 8 bytes) for estimated-Jaccard
    verification inside the bucket groupby. Full text never shuffles.
    """

    def __init__(self, text_col: str, id_col: str, k_shingle: int = 4,
                 num_perm: int = 64, bands: int = 16, seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.k, self.num_perm, self.bands, self.seed = k_shingle, num_perm, bands, seed
        self.r = num_perm // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        starts, codes = char_shingles_u64(texts, k=self.k)
        sig = _minhash_sigs(codes, starts, self.num_perm, seed=self.seed)
        n = len(texts)
        band_rows = sig.reshape(n, self.bands, self.r)
        # hash each band's r values into one uint64
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.r):
                bh = bh * np.uint64(1099511628211) + band_rows[:, :, j]
        out_id = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        out_bh = bh.reshape(-1).view(np.int64)
        sig_bytes = [sig[i].tobytes() for i in range(n)]
        out_sig = np.repeat(np.asarray(sig_bytes, dtype=object), self.bands)
        return pa.table({
            "id": pa.array(out_id),
            "band": pa.array(out_band),
            "band_hash": pa.array(out_bh),
            "sig": pa.array(out_sig, type=pa.binary()),
        })


def minhash_lsh_pairs(ds: ray.data.Dataset, text_col: str, id_col: str, *,
                      k_shingle: int = 4, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.7, max_bucket: int = 2000,
                      seed: int = 7, concurrency: int = 2) -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    shingle → minhash → band → bucket ``groupby(band, band_hash)`` →
    within-bucket pairs → signature-estimated Jaccard filter → global pair
    dedup (a pair found in several bands collapses to one row).
    """
    index = ds.map_batches(
        MinHasher, fn_constructor_args=(text_col, id_col),
        fn_constructor_kwargs=dict(k_shingle=k_shingle, num_perm=num_perm,
                                   bands=bands, seed=seed),
        batch_format="pyarrow", concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:  # skip degenerate/hot buckets
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
        g = g.drop_duplicates(subset=["id"]).sort_values("id", kind="mergesort")
        ids = g["id"].to_numpy()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]])
        n = len(ids)
        ia, ib = np.triu_indices(n, k=1)
        est = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "est_jaccard": est[keep]})

    pairs = index.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas")

    def dedup_pair(g: pd.DataFrame) -> pd.DataFrame:
        return g.iloc[:1]

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_pair, batch_format="pandas")


# ------------------------------------------------------------------- SimHash

def simhash64(ds: ray.data.Dataset, text_col: str, out: str = "simhash") -> ray.data.Dataset:
    """64-bit word-frequency SimHash per row, fully vectorized:
    explode words → 64-bit word hashes → per-bit ±1 weighted sums via
    ``np.add.reduceat`` → sign bits."""
    def fn(batch: pa.Table) -> pa.Table:
        words = split_words(batch[text_col])
        offsets, values = list_offsets_values(words)
        n = len(offsets) - 1
        wh = stable_str_hash64(values.to_pylist())
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(wh):
            red_idx = np.minimum(offsets[:-1], len(wh) - 1)
            nonempty = np.diff(offsets) > 0
            for bit in range(64):
                bits = (((wh >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2) - 1
                s = np.add.reduceat(bits, red_idx)
                acc[nonempty, bit] = s[nonempty]
        h = np.zeros(n, dtype=np.uint64)
        for bit in range(64):
            h |= (acc[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
        return batch.append_column(out, pa.array(h.view(np.int64)))
    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_pairs(ds: ray.data.Dataset, text_col: str, id_col: str, *,
                  max_hamming: int = 3, max_bucket: int = 2000) -> ray.data.Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: with 4 16-bit chunks, any pair at Hamming ≤ 3 agrees
    on ≥1 chunk → ``groupby(chunk_idx, chunk_value)`` buckets generate all
    candidates; exact Hamming verifies in-bucket; pair dedup collapses
    multi-chunk hits.
    """
    hashed = simhash64(ds.select_columns([id_col, text_col]), text_col)

    def explode_chunks(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(h)
        chunk_idx = np.tile(np.arange(4, dtype=np.int32), n)
        hh = np.repeat(h, 4)
        shift = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        chunk_val = ((hh >> shift) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({"id": pa.array(np.repeat(ids, 4)),
                         "chunk": pa.array(chunk_idx),
                         "chunk_val": pa.array(chunk_val),
                         "simhash": pa.array(np.repeat(h.view(np.int64), 4))})

    index = hashed.map_batches(explode_chunks, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        g = g.drop_duplicates(subset=["id"]).sort_values("id", kind="mergesort")
        ids = g["id"].to_numpy()
        h = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        x = h[ia] ^ h[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "hamming": ham[keep]})

    pairs = index.groupby(["chunk", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pandas")
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.iloc[:1], batch_format="pandas")


# ------------------------------------------------- word-set Jaccard (exact)

def wordset_jaccard_pairs(ds: ray.data.Dataset, text_col: str, id_col: str,
                          block_col: str, threshold: float) -> ray.data.Dataset:
    """Exact distinct-word-set Jaccard pairs within blocks.

    Blocked all-pairs: within each ``block_col`` group, build the doc ×
    batch-vocab incidence matrix and get intersection counts with ONE
    matmul — vectorized exact Jaccard, no Python pair loop. SQL-equivalent
    (word explode + self-join within block) keeps it oracle-checkable.
    Output: id_a < id_b, jaccard (rounded to 6 dp for float parity).
    """
    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        word_lists = g[text_col].str.split()
        vocab: dict[str, int] = {}
        rows, cols = [], []
        for i, ws in enumerate(word_lists):
            for w in set(ws):
                rows.append(i); cols.append(vocab.setdefault(w, len(vocab)))
        # float64 throughout: counts are exact ints, so the division is
        # bit-identical to the SQL oracle's DOUBLE division
        m = np.zeros((len(ids), len(vocab)), dtype=np.float64)
        m[rows, cols] = 1.0
        sizes = m.sum(axis=1)
        inter = m @ m.T
        union = sizes[:, None] + sizes[None, :] - inter
        jac = inter / np.maximum(union, 1.0)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = jac[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "jaccard": np.round(jac[ia[keep], ib[keep]], 6)})
    return ds.groupby(block_col).map_groups(per_block, batch_format="pandas")


# ------------------------------------------------- embedding-cosine near-dup

def embedding_neardup_pairs(ds: ray.data.Dataset, vec_col: str, id_col: str,
                            block_col: str, threshold: float) -> ray.data.Dataset:
    """Cosine-similarity near-dup pairs within blocks (one matmul per
    block). float64 math so the SQL oracle (list_cosine_similarity)
    reproduces values; scores rounded to 6 dp."""
    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        ids = g[id_col].to_numpy()
        m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        m = m / np.maximum(norms, 1e-30)[:, None]
        sim = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
                             "cosine": np.round(sim[ia[keep], ib[keep]], 6)})
    return ds.groupby(block_col).map_groups(per_block, batch_format="pandas")
