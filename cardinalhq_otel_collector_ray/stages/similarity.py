"""Similarity search over an embedding column (ANN for training-data dedup
/ retrieval). Baseline: brute-force cosine top-k — one numpy matmul per
batch against a broadcast, pre-normalized query matrix (``ray.put`` once;
each actor reads it in ``__init__``, never re-shipped per batch). Scale
path: LSH-bucketed variant (random-hyperplane signs) that prunes candidates
to matching buckets before the exact rerank."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import round6


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    return mat / np.maximum(n, 1e-30)[:, None]


def _per_block_topk(k: int, exclude_self: bool):
    """EXACT per-block top-k prune of (qid, id, score) rows: keep, per qid,
    every row whose score ties-or-beats the block's k-th best — a global
    top-k member can never be dropped (if ≥k block rows beat it, they beat
    it globally too), ties survive for the (score desc, id asc) tie-break
    in the final combine. Shrinks the per-qid shuffle from n_rows to
    ≈ k × blocks — the same pre-combine discipline as every aggregate."""
    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        if exclude_self:
            t = t.filter(pc.invert(pc.equal(t["qid"], t["id"])))
            if t.num_rows == 0:
                return t
        qid = t["qid"].to_numpy(zero_copy_only=False)
        score = t["score"].to_numpy(zero_copy_only=False)
        order = np.argsort(qid, kind="mergesort")
        qs = qid[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        bounds = np.append(starts, len(qs))
        keep = np.zeros(len(qid), dtype=bool)
        for s, e in zip(starts, bounds[1:]):
            idx = order[s:e]
            sc = score[idx]
            if len(sc) <= k:
                keep[idx] = True
            else:
                kth = np.partition(sc, -k)[-k]
                keep[idx[sc >= kth]] = True
        return t.filter(pa.array(keep))
    return fn


class BruteForceScorer:
    """Per-batch exact cosine scores: emits (qid, id, score) for every
    (query, row) pair that survives a coarse ``min_score`` prune; the final
    global top-k is a tiny per-qid combine."""

    def __init__(self, queries_ref, vec_col: str, id_col: str,
                 min_score: float = -1.0):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(sorted(q))
        self.qmat = _normalize(np.stack([np.asarray(q[k], dtype=np.float64) for k in self.qids]))
        self.vec_col, self.id_col, self.min_score = vec_col, id_col, min_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        vecs = batch[self.vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        offsets = vecs.offsets.to_numpy(zero_copy_only=False)
        dim = offsets[1] - offsets[0]
        flat = vecs.values.to_numpy(zero_copy_only=False).astype(np.float64)
        m = _normalize(flat.reshape(len(ids), dim))
        sim = self.qmat @ m.T                      # (n_q, n_rows)
        qi, ri = np.nonzero(sim >= self.min_score)
        return pa.table({"qid": pa.array(self.qids[qi]),
                         "id": pa.array(ids[ri]),
                         "score": pa.array(sim[qi, ri])})



def _final_topk(scored: ray.data.Dataset, k: int,
                num_partitions: int = 8) -> ray.data.Dataset:
    """Global per-qid top-k finish: ONE bounded hash co-partition on qid,
    then a single SEGMENTED numpy kernel per partition (lexsort + run
    ranks) — no per-qid ``map_groups`` dispatch (the shape eliminated
    everywhere else; a driver-supplied query dict is dozens of qids, but
    uniformity keeps the stage safe if a caller feeds thousands).
    Deterministic ranking: (score desc, id asc); scores rounded to 6 dp
    AFTER ranking (functions.hashing.round6 — SQL half-away parity)."""
    from .temporal import partitioned_apply

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"qid": pd.Series([], dtype="int64"),
                                 "id": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="float64"),
                                 "rank": pd.Series([], dtype="int64")})
        qid = df["qid"].to_numpy()
        ids = df["id"].to_numpy()
        score = df["score"].to_numpy()
        order = np.lexsort((ids, -score, qid))
        qs = qid[order]
        starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
        seg = np.repeat(np.arange(len(starts)),
                        np.diff(np.append(starts, len(qs))))
        rank = np.arange(len(qs), dtype=np.int64) - starts[seg] + 1
        keep = rank <= k
        sel = order[keep]
        return pd.DataFrame({"qid": qid[sel], "id": ids[sel],
                             "score": round6(score[sel]),
                             "rank": rank[keep]})

    return partitioned_apply(scored, ["qid"], kernel, num_partitions)


def knn_brute_force(ds: ray.data.Dataset, queries: dict, vec_col: str,
                    id_col: str, k: int, concurrency: int | None = None,
                    exclude_self: bool = True) -> ray.data.Dataset:
    """Exact top-k cosine neighbors per query.

    Deterministic ranking: (score desc, id asc) tie-break; scores rounded
    to 6 dp AFTER ranking for float-parity with a SQL oracle.

    ``concurrency=None`` (default) runs the scorer as ELASTIC stateless
    tasks — the broadcast query matrix is small and rides the serialized
    callable, so there is no actor-pool startup cost and no fixed pool to
    size per cluster; pass an int for a pinned actor pool when the query
    set is big enough that per-task shipping matters.
    """
    qref = ray.put(queries)
    if concurrency is None:
        scored = ds.map_batches(BruteForceScorer(qref, vec_col, id_col),
                                batch_format="pyarrow")
    else:
        scored = ds.map_batches(BruteForceScorer,
                                fn_constructor_args=(qref, vec_col, id_col),
                                batch_format="pyarrow", concurrency=concurrency)
    scored = scored.map_batches(_per_block_topk(k, exclude_self),
                                batch_format="pyarrow")
    return _final_topk(scored, k)


def _kmeans(sample: np.ndarray, k: int, iters: int = 10,
            seed: int = 13, chunk: int = 4096) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the coarse
    quantizer an IVF index trains once and broadcasts).

    Memory-bounded for large k (SemDeDup auto-scales k ~ √n): distances
    via the dot-product expansion in row chunks — scratch is O(chunk × k),
    never the O(n × k × d) broadcast tensor — and cluster means via one
    ``np.add.at``/``bincount`` pass instead of a Python loop over k."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    n, d = sample.shape
    sq = (sample * sample).sum(axis=1)
    assign = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        csq = (centroids * centroids).sum(axis=1)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            dist = (sq[s:e, None]
                    - 2.0 * (sample[s:e] @ centroids.T) + csq[None, :])
            assign[s:e] = dist.argmin(axis=1)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        sums = np.zeros((k, d), dtype=np.float64)
        np.add.at(sums, assign, sample)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def knn_ivf(ds: ray.data.Dataset, queries: dict, vec_col: str, id_col: str,
            k: int, *, n_centroids: int = 16, nprobe: int = 4,
            sample_size: int = 2048, seed: int = 13,
            concurrency: int | None = None) -> ray.data.Dataset:
    """IVF ANN: k-means coarse quantizer (trained once on a driver sample,
    broadcast) → each row assigned to its nearest centroid → queries score
    only rows in their ``nprobe`` nearest cells. The classical alternative
    scale path to hyperplane LSH; recall grows with nprobe
    (nprobe == n_centroids ⇒ exact brute force)."""
    sample = ds.limit(sample_size).to_pandas()[vec_col]
    smat = _normalize(np.stack(sample.to_numpy()).astype(np.float64))
    centroids = _normalize(_kmeans(smat, n_centroids, seed=seed))
    qids = np.asarray(sorted(queries))
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    qsims = qmat @ centroids.T
    qcells = np.argsort(-qsims, axis=1)[:, :nprobe]
    wanted: dict[int, list] = {}
    for qi, cells in zip(qids, qcells):
        for c in cells:
            wanted.setdefault(int(c), []).append(qi)
    wref = ray.put((wanted, {int(q): qmat[i] for i, q in enumerate(qids)},
                    centroids))

    class Scorer:
        def __init__(self):
            self.wanted, self.qvecs, self.centroids = ray.get(wref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            vecs = batch[vec_col]
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            offsets = vecs.offsets.to_numpy(zero_copy_only=False)
            d = offsets[1] - offsets[0]
            m = _normalize(vecs.values.to_numpy(zero_copy_only=False)
                           .astype(np.float64).reshape(-1, d))
            cells = (m @ self.centroids.T).argmax(axis=1)
            out_q, out_id, out_s = [], [], []
            for c, qlist in self.wanted.items():
                mask = cells == c
                if not mask.any():
                    continue
                sub, sids = m[mask], ids[mask]
                for qid in qlist:
                    out_q.append(np.full(len(sids), qid))
                    out_id.append(sids)
                    out_s.append(sub @ self.qvecs[int(qid)])
            if not out_q:
                return pa.table({"qid": pa.array([], pa.int64()),
                                 "id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table({"qid": pa.array(np.concatenate(out_q)),
                             "id": pa.array(np.concatenate(out_id)),
                             "score": pa.array(np.concatenate(out_s))})

    # elastic stateless tasks by default (tiny broadcast state rides the
    # callable; no actor-pool startup) — int pins an actor pool
    scorer = Scorer() if concurrency is None else Scorer
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    scored = ds.map_batches(scorer, batch_format="pyarrow", **kwargs)
    scored = scored.map_batches(_per_block_topk(k, True),
                                batch_format="pyarrow")
    return _final_topk(scored, k)


class LshBucketer:
    """Random-hyperplane LSH: bucket = sign-bit pattern of ``nbits``
    projections. Emits (id, bucket) plus the vector for in-bucket rerank —
    the scale path that avoids scoring every row against every query."""

    def __init__(self, dim: int, nbits: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((nbits, dim))
        self.nbits = nbits

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        signs = (self.planes @ mat.T) > 0
        out = np.zeros(mat.shape[0], dtype=np.int64)
        for b in range(self.nbits):
            out |= signs[b].astype(np.int64) << b
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = batch["embedding"]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        offsets = vecs.offsets.to_numpy(zero_copy_only=False)
        dim = offsets[1] - offsets[0]
        m = vecs.values.to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        return batch.append_column("bucket", pa.array(self.bucket_of(_normalize(m))))


def knn_lsh(ds: ray.data.Dataset, queries: dict, vec_col: str, id_col: str,
            k: int, dim: int, nbits: int = 8, seed: int = 11,
            probe_radius: int = 1,
            concurrency: int | None = None) -> ray.data.Dataset:
    """LSH-pruned ANN with MULTI-PROBE: score rows in every bucket within
    Hamming distance ``probe_radius`` of each query's bucket (single-probe
    recall collapses on weakly-clustered data — real neighbors routinely
    flip one hyperplane sign). Approximate (recall < 1); the brute-force
    operator is the exactness baseline. Fraction of data scored ≈
    C(nbits, ≤radius) / 2^nbits."""
    bucketer = LshBucketer(dim, nbits=nbits, seed=seed)
    qids = np.asarray(sorted(queries))
    qmat = _normalize(np.stack([np.asarray(queries[q], dtype=np.float64) for q in qids]))
    qbuckets = bucketer.bucket_of(qmat)

    def probes(b: int) -> list[int]:
        out, frontier = {b}, [b]
        for _ in range(probe_radius):
            frontier = [f ^ (1 << i) for f in frontier for i in range(nbits)]
            out.update(frontier)
        return sorted(out)

    wanted = {}
    for qid, b in zip(qids, qbuckets):
        for pb in probes(int(b)):
            wanted.setdefault(pb, []).append(qid)
    wref = ray.put((wanted, {int(q): qmat[i] for i, q in enumerate(qids)}))

    class Scorer:
        def __init__(self):
            self.wanted, self.qvecs = ray.get(wref)
            self.bucketer = LshBucketer(dim, nbits=nbits, seed=seed)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            vecs = batch[vec_col]
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            offsets = vecs.offsets.to_numpy(zero_copy_only=False)
            d = offsets[1] - offsets[0]
            m = _normalize(vecs.values.to_numpy(zero_copy_only=False)
                           .astype(np.float64).reshape(-1, d))
            buckets = self.bucketer.bucket_of(m)
            out_q, out_id, out_s = [], [], []
            for b, qlist in self.wanted.items():
                mask = buckets == b
                if not mask.any():
                    continue
                sub = m[mask]; sids = ids[mask]
                for qid in qlist:
                    s = sub @ self.qvecs[int(qid)]
                    out_q.append(np.full(len(sids), qid))
                    out_id.append(sids); out_s.append(s)
            if not out_q:
                return pa.table({"qid": pa.array([], pa.int64()),
                                 "id": pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table({"qid": pa.array(np.concatenate(out_q)),
                             "id": pa.array(np.concatenate(out_id)),
                             "score": pa.array(np.concatenate(out_s))})

    scorer = Scorer() if concurrency is None else Scorer
    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    scored = ds.map_batches(scorer, batch_format="pyarrow", **kwargs)
    scored = scored.map_batches(_per_block_topk(k, True),
                                batch_format="pyarrow")
    return _final_topk(scored, k)


def sq_minmax(ds: ray.data.Dataset, vec_col: str) -> tuple[np.ndarray,
                                                           np.ndarray]:
    """Per-dimension (min, max) over an embedding column, distributed:
    each block contributes ONE (mins, maxs) partial row (2 × dim floats —
    bounded by dim, not corpus size); the driver folds the ≤ n_blocks
    partials. The codebook-training analog of the IVF sample fit, but
    exact and one pass."""
    def block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"mins": pa.array([], pa.list_(pa.float64())),
                             "maxs": pa.array([], pa.list_(pa.float64()))})
        vecs = batch[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        offsets = vecs.offsets.to_numpy(zero_copy_only=False)
        d = offsets[1] - offsets[0]
        m = vecs.values.to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(-1, d)
        return pa.table({"mins": pa.array([m.min(axis=0)]),
                         "maxs": pa.array([m.max(axis=0)])})

    parts = ds.map_batches(block, batch_format="pyarrow")
    lo, hi = None, None
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        mins = np.stack(b["mins"].to_pylist()).min(axis=0)
        maxs = np.stack(b["maxs"].to_pylist()).max(axis=0)
        lo = mins if lo is None else np.minimum(lo, mins)
        hi = maxs if hi is None else np.maximum(hi, maxs)
    return lo, hi


def sq_quantize_stats(ds: ray.data.Dataset, vec_col: str, id_col: str,
                      *, levels: int = 256) -> ray.data.Dataset:
    """Scalar (per-dimension uniform) quantization of an embedding column
    with reconstruction-error accounting — the 4× storage lever for
    100 TB embedding corpora (float32 → uint8 codes).

    code = clip(floor((v - lo_d) / (hi_d - lo_d) * levels), 0, levels-1)
    per dimension d (constant dims quantize to code 0 exactly);
    reconstruction v̂ = lo_d + (code + 0.5) · (hi_d - lo_d) / levels
    (mid-rise). All float64 with the same expression tree a SQL engine
    evaluates, so per-row stats are EXACTLY reproducible: output
    (id, max_code:int64, max_abs_err:float64 round6).

    The (lo, hi) codebook is 2 × dim values — trained distributed
    (`sq_minmax`), broadcast once via the serialized callable.
    """
    lo, hi = sq_minmax(ds, vec_col)
    if lo is None:
        raise ValueError("sq_quantize_stats: empty input dataset — "
                         "no vectors to train the (lo, hi) codebook on")
    rng_ = hi - lo
    safe = np.where(rng_ > 0, rng_, 1.0)

    def encode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id": batch[id_col],
                             "max_code": pa.array([], pa.int64()),
                             "max_abs_err": pa.array([], pa.float64())})
        vecs = batch[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        offsets = vecs.offsets.to_numpy(zero_copy_only=False)
        d = offsets[1] - offsets[0]
        m = vecs.values.to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(-1, d)
        code = np.floor((m - lo) / safe * levels)
        np.clip(code, 0, levels - 1, out=code)
        code[:, rng_ <= 0] = 0.0
        vhat = lo + (code + 0.5) * (rng_ / levels)
        err = np.abs(m - vhat)
        return pa.table({
            "id": batch[id_col],
            "max_code": pa.array(code.max(axis=1).astype(np.int64)),
            "max_abs_err": pa.array(round6(err.max(axis=1))),
        })
    return ds.map_batches(encode, batch_format="pyarrow")


def kmeans_assign(ds: ray.data.Dataset, vec_col: str, id_col: str, *,
                  n_centroids: int = 16, sample_size: int = 2048,
                  seed: int = 13, keep_vec: bool = False,
                  centroids: np.ndarray | None = None) -> ray.data.Dataset:
    """Distributed k-means cluster assignment (the IVF coarse quantizer as
    a first-class operator — corpus partitioning / near-dup blocking for
    embedding pipelines): centroids trained ONCE on a bounded driver
    sample, broadcast; assignment is one matmul-argmax per batch.
    Output: (id, cell:int32), plus the vector column when ``keep_vec``
    (the SemDeDup composition needs vectors alongside the cell).

    ``centroids`` skips the sample fit and assigns against an explicit
    codebook (rows normalized here) — the pretrained-quantizer surface an
    IVF index reuses across runs, and the exact-degeneration oracle path
    (seed vectors as centroids ⇒ nearest-seed assignment, which a SQL
    cross-join argmax reproduces; ties break to the lowest cell, matching
    ``argmax``'s first-max rule)."""
    if centroids is None:
        sample = ds.limit(sample_size).to_pandas()[vec_col]
        smat = _normalize(np.stack(sample.to_numpy()).astype(np.float64))
        centroids = _kmeans(smat, n_centroids, seed=seed)
    cref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        vecs = batch[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        offsets = vecs.offsets.to_numpy(zero_copy_only=False)
        d = offsets[1] - offsets[0]
        m = _normalize(vecs.values.to_numpy(zero_copy_only=False)
                       .astype(np.float64).reshape(-1, d))
        cells = (m @ cents.T).argmax(axis=1).astype(np.int32)
        cols = {"id": batch[id_col], "cell": pa.array(cells)}
        if keep_vec:
            cols[vec_col] = batch[vec_col]
        return pa.table(cols)
    return ds.map_batches(assign, batch_format="pyarrow")
