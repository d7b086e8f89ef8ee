"""SemDeDup guarantee tests (the rows-only query's correctness contract):
planted duplicate groups keep exactly one survivor (the min id), distinct
vectors all survive, and per-cell counts conserve.
"""

import numpy as np
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.dedup import semdedup


def _mk_ds(vecs: np.ndarray, ids: np.ndarray) -> ray.data.Dataset:
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              type=pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(3)


def test_semdedup_planted_duplicates_keep_min_id():
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant 3 dup groups: ids (100,101,102), (200,201), (300,301,302,303)
    groups = [(100, 101, 102), (200, 201), (300, 301, 302, 303)]
    vecs, ids = [], []
    for i in range(40):
        vecs.append(base[i])
        ids.append(i)
    for gi, g in enumerate(groups):
        proto = base[gi] + 0.0  # exact duplicates of an existing vector
        for m in g:
            vecs.append(proto)
            ids.append(m)
    ds = _mk_ds(np.stack(vecs), np.asarray(ids))
    out = semdedup(ds, "embedding", "vec_id", n_centroids=4,
                   threshold=0.999, sample_size=64).to_pandas()
    keep = out.set_index("id")["keep"]
    for gi, g in enumerate(groups):
        # the proto (id gi) + its copies form one component; min id survives
        comp = [gi] + list(g)
        survivors = [i for i in comp if keep[i]]
        assert survivors == [min(comp)], (gi, survivors)
    # conservation
    assert len(out) == len(ids)


def test_semdedup_distinct_vectors_survive():
    # near-orthogonal one-hot vectors: no pair passes any high threshold
    vecs = np.eye(12)
    ds = _mk_ds(vecs, np.arange(12))
    out = semdedup(ds, "embedding", "vec_id", n_centroids=3,
                   threshold=0.9, sample_size=12).to_pandas()
    assert out["keep"].all()


def test_semdedup_cell_conservation_matches_flags():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 6))
    vecs[30:] = vecs[:30]  # every vector duplicated exactly once
    ds = _mk_ds(vecs, np.arange(60))
    out = semdedup(ds, "embedding", "vec_id", n_centroids=4,
                   threshold=0.999, sample_size=60).to_pandas()
    # exactly half removed (the higher id of each identical pair)
    assert int(out["keep"].sum()) == 30
    assert set(out.loc[out["keep"], "id"]) == set(range(30))
    # per-cell totals conserve
    g = out.groupby("cell")["keep"].agg(["count", "sum"])
    assert (g["count"] >= g["sum"]).all()


def test_semdedup_scaled_centroids_and_auto():
    """VERDICT r02 item 6: planted dups survive the paper-regime settings —
    n_centroids=64 (pair-stage hash partitions > cells) and the "auto"
    √n default — because exact duplicates land in the same k-means cell
    by construction (identical vectors ⇒ identical argmax)."""
    rng = np.random.default_rng(17)
    base = rng.normal(size=(400, 8))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = np.concatenate([base, base[:50]])  # ids 400..449 dup ids 0..49
    ids = np.concatenate([np.arange(400), np.arange(400, 450)])
    ds = _mk_ds(vecs, ids)
    for nc in (64, "auto"):
        out = semdedup(ds, "embedding", "vec_id", n_centroids=nc,
                       threshold=0.999).to_pandas().set_index("id")
        assert len(out) == 450
        assert not out.loc[400:449, "keep"].any()
        assert out.loc[:399, "keep"].all()
        if nc == 64:
            assert out["cell"].nunique() <= 64


def test_semdedup_distributed_flag_path_matches_broadcast():
    """Forcing max_driver_pairs=0 routes clustering through
    cluster_pairs_distributed + the co-partitioned mark join; the
    (id, cell, keep) output must equal the broadcast path's."""
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(80, 6))
    vecs[40:] = vecs[:40]
    ds = _mk_ds(vecs, np.arange(80))
    kw = dict(n_centroids=8, threshold=0.999, sample_size=80)
    broad = semdedup(ds, "embedding", "vec_id", **kw).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    dist = semdedup(ds, "embedding", "vec_id", max_driver_pairs=0, **kw) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(broad, dist)
    assert int(broad["keep"].sum()) == 40
