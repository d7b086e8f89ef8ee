"""Isolation-forest anomaly scoring (real forest, deterministic).

Upgrades the z-score analog of the reference's ``isolationforestprocessor``
(registered at ``distribution/components.go:131,718``) to an actual
isolation forest (Liu/Ting/Zhou 2008, public algorithm):

- **fit** happens ONCE on the driver over a small deterministic sample
  (hash-priority selected, bounded rows — never the full dataset), because
  iForest is defined on a sub-sample (the paper uses 256 rows/tree);
- the fitted forest is a handful of flat numpy arrays, broadcast via
  ``ray.put`` and read node-locally inside every scoring task;
- **scoring** is a stateless vectorized ``map_batches`` stage: per tree the
  whole batch descends one level per step (gather + where), so cost is
  O(rows x trees x depth) numpy ops with no per-row Python.

Scale shape: sample pull is O(sample_size), fit is O(trees x sample), both
constants; scoring streams. Nothing materializes the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hashing import mulhash

_EULER = 0.5772156649015329


def _avg_path(n) -> np.ndarray | float:
    """c(n): average unsuccessful-search path length of a BST of n nodes —
    the normalizer from the iForest paper."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    out[n == 2.0] = 1.0  # H(1) = 1 exactly; the ln approximation is poor there
    big = n > 2.0
    nn = n[big]
    out[big] = 2.0 * (np.log(nn - 1.0) + _EULER) - 2.0 * (nn - 1.0) / nn
    return out


class IsolationForest:
    """Flat-array isolation forest. Deterministic for a given seed (PCG64
    stream); fit on a bounded sample, score vectorized."""

    def __init__(self, n_trees: int = 64, sample_size: int = 256,
                 seed: int = 7):
        self.n_trees = n_trees
        self.sample_size = sample_size
        self.seed = seed
        self.trees: list[dict[str, np.ndarray]] = []
        self.max_depth = int(np.ceil(np.log2(max(sample_size, 2))))

    def fit(self, X: np.ndarray) -> "IsolationForest":
        X = np.asarray(X, dtype=np.float64)
        rng = np.random.Generator(np.random.PCG64(self.seed))
        n = X.shape[0]
        self.trees = []
        for _ in range(self.n_trees):
            idx = rng.choice(n, size=min(self.sample_size, n), replace=False)
            self.trees.append(self._build_tree(X[idx], rng))
        return self

    def _build_tree(self, S: np.ndarray, rng) -> dict[str, np.ndarray]:
        feat, thr, left, right, size = [], [], [], [], []
        # stack of (row-index-array, depth); node ids assigned in push order
        stack = [(np.arange(S.shape[0]), 0, -1, False)]
        while stack:
            rows, depth, parent, is_right = stack.pop()
            nid = len(feat)
            if parent >= 0:
                (right if is_right else left)[parent] = nid
            feat.append(-1); thr.append(0.0); left.append(-1); right.append(-1)
            size.append(len(rows))
            if depth >= self.max_depth or len(rows) <= 1:
                continue
            sub = S[rows]
            spans = sub.max(axis=0) - sub.min(axis=0)
            nonconst = np.flatnonzero(spans > 0)
            if len(nonconst) == 0:
                continue
            f = int(nonconst[rng.integers(len(nonconst))])
            lo, hi = sub[:, f].min(), sub[:, f].max()
            t = float(rng.uniform(lo, hi))
            mask = sub[:, f] < t
            feat[nid] = f; thr[nid] = t
            stack.append((rows[~mask], depth + 1, nid, True))
            stack.append((rows[mask], depth + 1, nid, False))
        return {"feat": np.asarray(feat, dtype=np.int32),
                "thr": np.asarray(thr, dtype=np.float64),
                "left": np.asarray(left, dtype=np.int32),
                "right": np.asarray(right, dtype=np.int32),
                "size": np.asarray(size, dtype=np.int64)}

    def path_lengths(self, X: np.ndarray) -> np.ndarray:
        """Mean isolation depth per row (vectorized level-synchronous
        descent: one gather+where per level per tree)."""
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        total = np.zeros(n, dtype=np.float64)
        for t in self.trees:
            node = np.zeros(n, dtype=np.int32)
            depth = np.zeros(n, dtype=np.float64)
            for _ in range(self.max_depth + 1):
                f = t["feat"][node]
                internal = f >= 0
                if not internal.any():
                    break
                rows = np.flatnonzero(internal)
                go_left = X[rows, f[rows]] < t["thr"][node[rows]]
                nxt = np.where(go_left, t["left"][node[rows]],
                               t["right"][node[rows]])
                node[rows] = nxt
                depth[rows] += 1.0
            total += depth + _avg_path(t["size"][node])
        return total / len(self.trees)

    def scores(self, X: np.ndarray) -> np.ndarray:
        """Anomaly score in (0, 1]: 2^(-E[path]/c(sample_size)); higher =
        more anomalous (paper eq. 2)."""
        c = float(_avg_path(np.asarray([self.sample_size]))[0])
        return np.power(2.0, -self.path_lengths(X) / c)


def deterministic_sample_matrix(ds: ray.data.Dataset, feature_cols: list[str],
                                id_col: str, target_rows: int,
                                total_rows: int | None = None,
                                salt: int = 99991) -> np.ndarray:
    """Bounded driver-side sample for model fitting: hash-priority filter
    (keep ~target rows by id hash) computed distributed, only the winners
    reach the driver. Never materializes the dataset."""
    if total_rows is None:
        total_rows = ds.count()
    mod = 1_000_003
    cutoff = int(min(mod, np.ceil(mod * (target_rows / max(total_rows, 1)) * 1.3)))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(mulhash(ids, salt=salt, mod=mod) < cutoff))

    small = (ds.select_columns([id_col] + feature_cols)
               .map_batches(keep, batch_format="pyarrow"))
    tbl = pa.concat_tables(list(small.iter_batches(batch_format="pyarrow", batch_size=None)),
                           promote_options="default")
    tbl = tbl.sort_by(id_col)  # order-independent of block arrival
    return np.column_stack([
        tbl[c].to_numpy(zero_copy_only=False).astype(np.float64)
        for c in feature_cols])


def iforest_score_stage(ds: ray.data.Dataset, forest: IsolationForest,
                        feature_cols: list[str],
                        out: str = "iforest_score") -> ray.data.Dataset:
    """Broadcast the fitted forest once (``ray.put``); stateless scoring
    tasks pull it from node-local plasma and score each Arrow batch with
    the vectorized descent."""
    ref = ray.put(forest)

    def score(batch: pa.Table) -> pa.Table:
        f: IsolationForest = ray.get(ref)
        X = np.column_stack([
            batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in feature_cols])
        return batch.append_column(out, pa.array(f.scores(X)))
    return ds.map_batches(score, batch_format="pyarrow")
