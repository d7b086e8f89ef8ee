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
