"""Isolation forest: determinism, planted-outlier recall, vectorized
scorer == naive recursive reference, and the Ray stage end-to-end."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from cardinalhq_otel_collector_ray.stages.anomaly import (
    IsolationForest, _avg_path, deterministic_sample_matrix,
    iforest_score_stage)


def _cluster_with_outliers(seed=0, n=800, n_out=8):
    rng = np.random.Generator(np.random.PCG64(seed))
    normal = rng.normal(0.0, 1.0, size=(n, 2))
    outliers = rng.uniform(8.0, 12.0, size=(n_out, 2))
    X = np.vstack([normal, outliers])
    return X, np.arange(n, n + n_out)


def test_deterministic_fit_and_score():
    X, _ = _cluster_with_outliers()
    s1 = IsolationForest(n_trees=32, sample_size=128, seed=11).fit(X).scores(X)
    s2 = IsolationForest(n_trees=32, sample_size=128, seed=11).fit(X).scores(X)
    np.testing.assert_array_equal(s1, s2)
    s3 = IsolationForest(n_trees=32, sample_size=128, seed=12).fit(X).scores(X)
    assert not np.array_equal(s1, s3)  # seed actually feeds the RNG


def test_planted_outliers_rank_top():
    X, out_idx = _cluster_with_outliers()
    scores = IsolationForest(n_trees=64, sample_size=256, seed=7).fit(X).scores(X)
    top = np.argsort(-scores)[: len(out_idx)]
    assert set(out_idx) == set(top)
    assert scores[out_idx].min() > 0.6  # classic iForest anomaly band
    assert np.median(scores[: 800]) < 0.55


def _naive_path(tree, x):
    nid, depth = 0, 0
    while tree["feat"][nid] >= 0:
        f = tree["feat"][nid]
        nid = tree["left"][nid] if x[f] < tree["thr"][nid] else tree["right"][nid]
        depth += 1
    return depth + float(_avg_path(np.asarray([tree["size"][nid]]))[0])


def test_vectorized_descent_matches_naive():
    X, _ = _cluster_with_outliers(seed=3, n=200, n_out=4)
    f = IsolationForest(n_trees=8, sample_size=64, seed=5).fit(X)
    fast = f.path_lengths(X)
    slow = np.array([
        np.mean([_naive_path(t, x) for t in f.trees]) for x in X])
    np.testing.assert_allclose(fast, slow, rtol=1e-12)


def test_avg_path_small_n():
    got = _avg_path(np.array([0.0, 1.0, 2.0, 256.0]))
    assert got[0] == 0.0 and got[1] == 0.0 and got[2] == 1.0
    assert 10.0 < got[3] < 12.0  # c(256) ~ 10.9


def test_stage_and_sample():
    rng = np.random.Generator(np.random.PCG64(2))
    n = 3000
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "a": rng.normal(0, 1, n),
        "b": rng.normal(0, 1, n),
    })
    df.loc[n - 3:, ["a", "b"]] = 50.0  # three extreme rows
    ds = ray.data.from_pandas(df).repartition(4)
    X = deterministic_sample_matrix(ds, ["a", "b"], id_col="rid",
                                   target_rows=512, total_rows=n)
    assert 256 <= X.shape[0] <= 1024 and X.shape[1] == 2
    forest = IsolationForest(n_trees=32, sample_size=128, seed=1).fit(X)
    out = iforest_score_stage(ds, forest, ["a", "b"]).to_pandas()
    assert len(out) == n
    top3 = out.nlargest(3, "iforest_score")["rid"].to_numpy()
    assert set(top3) == {n - 3, n - 2, n - 1}


def test_kmeans_assign_deterministic_and_separating():
    import ray.data
    from cardinalhq_otel_collector_ray.stages.similarity import kmeans_assign
    rng = np.random.Generator(np.random.PCG64(5))
    a = rng.normal(0, 0.05, (300, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0, 0.05, (300, 4)) + np.array([0, 0, 1, 0])
    vecs = np.vstack([a, b]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(600, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    got1 = kmeans_assign(ds, "embedding", "vec_id", n_centroids=4).to_pandas()
    got2 = kmeans_assign(ds, "embedding", "vec_id", n_centroids=4).to_pandas()
    m1 = got1.sort_values("id")["cell"].to_numpy()
    np.testing.assert_array_equal(m1, got2.sort_values("id")["cell"].to_numpy())
    # the two planted clusters never share a cell
    cells_a, cells_b = set(m1[:300]), set(m1[300:])
    assert not (cells_a & cells_b)
