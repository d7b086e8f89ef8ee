"""Temporal operators and dedup operators — semantics unit tests."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.dedup import (
    exact_dedup, minhash_lsh_pairs, simhash64, wordset_jaccard_pairs)
from cardinalhq_otel_collector_ray.stages.temporal import (
    cumulative_to_delta, delta_to_rate, interval_dedup, sessionize)


def _events():
    return ray.data.from_arrow(pa.table({
        "id": [1, 2, 3, 4, 5],
        "k": ["a", "a", "a", "b", "b"],
        "ts": [1000, 2000, 4000, 1000, 61_000],
        "v": [10, 15, 30, 5, 7],
    }))


def test_cumulative_to_delta():
    out = cumulative_to_delta(_events(), keys=["k"], ts_col="ts", value_col="v") \
        .to_pandas().sort_values("id")
    deltas = out.set_index("id")["delta"]
    assert pd.isna(deltas[1]) and deltas[2] == 5 and deltas[3] == 15
    assert pd.isna(deltas[4]) and deltas[5] == 2


def test_delta_to_rate():
    out = delta_to_rate(_events(), keys=["k"], ts_col="ts", value_col="v") \
        .to_pandas().sort_values("id")
    r = out.set_index("id")["rate"]
    assert r[2] == 15 / 1.0  # 1000ms gap
    assert r[3] == 30 / 2.0


def test_interval_dedup_first_and_count():
    out = interval_dedup(_events(), keys=["k"], ts_col="ts",
                         interval_ms=60_000, tiebreak_cols=["id"]).to_pandas()
    a = out[out["k"] == "a"].iloc[0]
    assert a["id"] == 1 and a["dedup_count"] == 3
    b = out[out["k"] == "b"].sort_values("_interval")
    assert len(b) == 2 and list(b["dedup_count"]) == [1, 1]


def test_sessionize_gap():
    ds = ray.data.from_arrow(pa.table({
        "user": [1, 1, 1, 1],
        "ts": [0, 1000, 10_000_000, 10_001_000],
    }))
    out = sessionize(ds, key="user", ts_col="ts", gap_ms=1_800_000).to_pandas()
    assert len(out) == 2
    s0 = out[out["session_id"] == 0].iloc[0]
    assert s0["session_start"] == 0 and s0["session_end"] == 1000 and s0["n_events"] == 2


def test_exact_dedup_keeps_min_id():
    ds = ray.data.from_arrow(pa.table({
        "text": ["x", "y", "x", "x"], "id": [5, 2, 3, 9]}))
    out = exact_dedup(ds, content_col="text", id_col="id").to_pandas()
    assert sorted(out["id"]) == [2, 3]  # min id per distinct text


def test_exact_dedup_same_content_across_mixed_length_batches():
    """Regression (round-4 review): the partition-tag hash choice must be
    a pure function of the VALUE, not of per-batch statistics. A duplicate
    content appearing once in a short-strings batch and once in a batch
    dominated by long documents previously took different hash functions,
    landed in different _cpart partitions, and BOTH copies survived."""
    from cardinalhq_otel_collector_ray.stages.dedup import _content_part_tags
    dup = "hello-world-content"
    short_batch = pa.table({"text": [dup, "a", "bb"], "id": [1, 2, 3]})
    long_batch = pa.table({
        "text": [dup, "x" * 900, "y" * 900], "id": [7, 8, 9]})
    t1 = _content_part_tags(short_batch["text"], 64)
    t2 = _content_part_tags(long_batch["text"], 64)
    assert t1[0] == t2[0]  # same content -> same partition, always
    ds = ray.data.from_arrow([short_batch, long_batch])
    out = exact_dedup(ds, content_col="text", id_col="id").to_pandas()
    assert (out["text"] == dup).sum() == 1
    assert out.loc[out["text"] == dup, "id"].iloc[0] == 1


def test_minhash_finds_planted_near_dups():
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(200)]
    texts, ids = [], []
    for i in range(50):
        ws = list(rng.choice(words, size=30))
        texts.append(" ".join(ws)); ids.append(i * 2)
        if i < 5:  # plant a near-dup: one word changed
            ws2 = list(ws); ws2[0] = "CHANGED"
            texts.append(" ".join(ws2)); ids.append(i * 2 + 1)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.6).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    planted = {(2 * i, 2 * i + 1) for i in range(5)}
    assert planted <= found, f"missing {planted - found}"


def test_hot_bucket_keys_only_hot_set_reaches_driver():
    """The distributed count merge must hand the driver ONLY keys with n≥2:
    an all-unique-bucket index yields an empty hot set (at 100 TB the
    unfiltered per-block count table is ∝ docs × bands and must stay
    distributed), and planted duplicates yield exactly those keys."""
    from cardinalhq_otel_collector_ray.stages.dedup import hot_bucket_keys
    unique = ray.data.from_arrow(pa.table({
        "band_hash": np.arange(10_000, dtype=np.int64)}))
    assert len(hot_bucket_keys(unique, "band_hash")) == 0
    dup = ray.data.from_arrow(pa.table({
        "band_hash": np.concatenate([np.arange(1000, dtype=np.int64),
                                     np.array([7, 7, 42], dtype=np.int64)])}))
    hot = hot_bucket_keys(dup, "band_hash")
    assert sorted(hot.tolist()) == [7, 42]


def test_wordset_jaccard_chunked_guard_exact():
    """max_block chunking must be EXACT: tiny chunks reproduce the
    unchunked pair set bit-for-bit."""
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(words, size=12)) for _ in range(20)]
    texts += [texts[0] + " extra", texts[5]]
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": ids, "lang": ["en"] * len(ids), "text": texts}))
    full = wordset_jaccard_pairs(ds, "text", "doc_id", "lang", threshold=0.4) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    chunked = wordset_jaccard_pairs(ds, "text", "doc_id", "lang",
                                    threshold=0.4, max_block=3) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full, chunked)
    assert len(full) >= 2  # the planted near-dup + exact dup both found


def test_embedding_neardup_chunked_guard_exact():
    from cardinalhq_otel_collector_ray.stages.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(15, 8))
    vecs[9] = vecs[2] + 0.01  # planted near-dup
    ds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(15)), "bucket": [0] * 15,
        "embedding": [list(map(float, v)) for v in vecs]}))
    full = embedding_neardup_pairs(ds, "embedding", "vec_id", "bucket",
                                   threshold=0.9).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    chunked = embedding_neardup_pairs(ds, "embedding", "vec_id", "bucket",
                                      threshold=0.9, max_block=4).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(full, chunked)
    assert (2, 9) in set(zip(full["id_a"], full["id_b"]))


def test_simhash_identical_texts_equal():
    ds = ray.data.from_arrow(pa.table({
        "text": ["alpha beta gamma", "alpha beta gamma", "delta epsilon zeta"]}))
    h = simhash64(ds, "text").to_pandas()["simhash"]
    assert h[0] == h[1] and h[0] != h[2]


def test_wordset_jaccard_exact():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "lang": ["en", "en", "en"],
        "text": ["a b c d", "a b c x", "z z2 z3 z4"],
    }))
    out = wordset_jaccard_pairs(ds, "text", "doc_id", "lang", threshold=0.5) \
        .to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["id_a"], out.iloc[0]["id_b"]) == (1, 2)
    assert out.iloc[0]["jaccard"] == 0.6  # |{a,b,c}| / |{a,b,c,d,x}|


def test_knn_lsh_recall_vs_bruteforce(sf_dir):
    """ANN quality: LSH top-5 must recover a reasonable share of the exact
    top-5 (nbits=8 on 64-dim random vectors — recall is bucket-limited)."""
    import pyarrow.parquet as pq
    from cardinalhq_otel_collector_ray.sources import read_table
    from cardinalhq_otel_collector_ray.stages.similarity import (
        knn_brute_force, knn_lsh)
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    pairs = sorted(zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist()))
    queries = {int(v): e for v, e in pairs[:5]}
    dim = len(pairs[0][1])
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = knn_brute_force(ds, queries, "embedding", "vec_id", k=5).to_pandas()
    approx = knn_lsh(read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
                     queries, "embedding", "vec_id", k=5, dim=dim, nbits=4).to_pandas()
    exact_set = set(zip(exact["qid"], exact["id"]))
    approx_set = set(zip(approx["qid"], approx["id"]))
    recall = len(exact_set & approx_set) / len(exact_set)
    # every approx neighbor must at least be a real row
    assert approx_set <= {(q, i) for q in exact["qid"].unique()
                          for i in range(100000)}
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_hll_accuracy_and_mergeability():
    import numpy as np
    from cardinalhq_otel_collector_ray.stages.sketch import HyperLogLog, _hash_values
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 10**12, size=200_000)
    true = len(np.unique(vals))
    h = HyperLogLog(p=12).add_hashed(_hash_values(vals))
    est = h.estimate()
    assert abs(est - true) / true < 0.05, (est, true)
    # merge(a,b) == sketch(a ∪ b)
    a = HyperLogLog(p=12).add_hashed(_hash_values(vals[:100_000]))
    b = HyperLogLog(p=12).add_hashed(_hash_values(vals[100_000:]))
    assert a.merge(b).estimate() == h.estimate()
    # serialization round-trip
    assert HyperLogLog.from_bytes(h.to_bytes()).estimate() == h.estimate()


def test_approx_distinct_per_key(sf_dir):
    import ray.data
    import pyarrow as pa
    import numpy as np
    from cardinalhq_otel_collector_ray.stages.sketch import (
        approx_distinct, approx_distinct_per_key)
    rng = np.random.default_rng(3)
    n = 30_000
    t = pa.table({"k": np.where(rng.random(n) < 0.5, "a", "b"),
                  "v": rng.integers(0, 5000, n)})
    ds = ray.data.from_arrow(t).repartition(6)
    glob_est = approx_distinct(ds, "v")
    true = len(np.unique(t["v"].to_numpy()))
    assert abs(glob_est - true) / true < 0.06
    per = approx_distinct_per_key(ds, "k", "v").to_pandas()
    truth = t.to_pandas().groupby("k")["v"].nunique()
    for _, r in per.iterrows():
        assert abs(r["approx_distinct"] - truth[r["k"]]) / truth[r["k"]] < 0.06


def test_knn_ivf_recall(sf_dir):
    import pyarrow.parquet as pq
    from cardinalhq_otel_collector_ray.sources import read_table
    from cardinalhq_otel_collector_ray.stages.similarity import (
        knn_brute_force, knn_ivf)
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    pairs = sorted(zip(emb["vec_id"].to_pylist(), emb["embedding"].to_pylist()))
    queries = {int(v): e for v, e in pairs[:5]}
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = knn_brute_force(ds, queries, "embedding", "vec_id", k=5).to_pandas()
    ds2 = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    approx = knn_ivf(ds2, queries, "embedding", "vec_id", k=5,
                     n_centroids=8, nprobe=4).to_pandas()
    es = set(zip(exact["qid"], exact["id"]))
    as_ = set(zip(approx["qid"], approx["id"]))
    recall = len(es & as_) / len(es)
    assert recall >= 0.4, recall
    # nprobe == n_centroids degenerates to exact brute force
    ds3 = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    full = knn_ivf(ds3, queries, "embedding", "vec_id", k=5,
                   n_centroids=8, nprobe=8).to_pandas()
    assert set(zip(full["qid"], full["id"])) == es


def test_cluster_pairs_union_find():
    import ray.data
    import pyarrow as pa
    from cardinalhq_otel_collector_ray.stages.dedup import cluster_pairs
    pairs = ray.data.from_arrow(pa.table({
        "id_a": [1, 2, 10, 11, 2],
        "id_b": [2, 3, 11, 12, 1],
    }))
    out = cluster_pairs(pairs)
    got = dict(zip(out["id"], out["cluster"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cluster_pairs_distributed_matches_union_find():
    """Min-label propagation (the 100 TB path) must produce the same
    (id, cluster=min id) assignment as the driver union-find, including
    multi-hop chains that need several propagation rounds."""
    from cardinalhq_otel_collector_ray.stages.dedup import (
        cluster_pairs, cluster_pairs_distributed)
    # a 10-node path (worst-case diameter), a triangle, one isolated pair
    edges = [(i, i + 1) for i in range(10, 19)] + \
            [(1, 2), (2, 3), (1, 3), (100, 101)]
    ds = ray.data.from_arrow(pa.table({
        "id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]}))
    want = cluster_pairs(ds).sort_values("id").reset_index(drop=True)
    got = cluster_pairs_distributed(ds, num_partitions=4).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))
    assert got[got["id"] == 18]["cluster"].iloc[0] == 10  # 9 hops propagated


def test_ngram_jaccard_order_sensitive():
    """Bigram sets distinguish word ORDER: same word multiset, different
    order → low bigram Jaccard; identical order → 1.0. Chunked guard must
    stay exact for n-grams too."""
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "lang": ["en"] * 3,
        "text": ["a b c d e", "a b c d e", "e d c b a"],
    }))
    out = wordset_jaccard_pairs(ds, "text", "doc_id", "lang", threshold=0.5,
                                ngram=2).to_pandas()
    assert set(zip(out["id_a"], out["id_b"])) == {(1, 2)}
    assert out.iloc[0]["jaccard"] == 1.0
    # word-SET variant cannot tell 1 and 3 apart (same words)
    ws = wordset_jaccard_pairs(ds, "text", "doc_id", "lang", threshold=0.5) \
        .to_pandas()
    assert (1, 3) in set(zip(ws["id_a"], ws["id_b"]))
    chunked = wordset_jaccard_pairs(ds, "text", "doc_id", "lang",
                                    threshold=0.5, ngram=2, max_block=2) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.sort_values(["id_a", "id_b"]).reset_index(drop=True), chunked)


def test_kll_quantile_accuracy_and_merge():
    """KLL sketch: rank error small at k=200; merging shard sketches ≈
    one sketch over the union; byte round-trip identical; deterministic."""
    from cardinalhq_otel_collector_ray.stages.sketch import KLLSketch
    rng = np.random.default_rng(11)
    data = rng.normal(100.0, 25.0, size=100_000)
    s = KLLSketch(200).add(data)
    ranks = np.sort(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = s.quantile(q)
        # rank of the estimate must be within 2% of the target rank
        rank_err = abs(np.searchsorted(ranks, est) / len(ranks) - q)
        assert rank_err < 0.02, (q, est, rank_err)
    halves = [KLLSketch(200).add(data[:50_000]),
              KLLSketch(200).add(data[50_000:])]
    merged = halves[0].merge(halves[1])
    for q in (0.1, 0.5, 0.9):
        rank_err = abs(np.searchsorted(ranks, merged.quantile(q)) / len(ranks) - q)
        assert rank_err < 0.03, (q, rank_err)
    # deterministic: same input, same sketch bytes and values
    s2 = KLLSketch(200).add(data)
    assert s.to_bytes() == s2.to_bytes()
    rt = KLLSketch.from_bytes(s.to_bytes())
    assert rt.quantile(0.5) == s.quantile(0.5)


def test_approx_quantiles_per_key_dataset():
    from cardinalhq_otel_collector_ray.stages.sketch import approx_quantiles_per_key
    rng = np.random.default_rng(12)
    n = 20_000
    keys = np.where(rng.random(n) < 0.5, "a", "b")
    vals = np.where(keys == "a", rng.uniform(0, 100, n),
                    rng.uniform(1000, 2000, n))
    ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals}))
    out = approx_quantiles_per_key(ds, "k", "v", qs=[0.5]).to_pandas() \
        .set_index("k")["q_0_5"]
    assert 40 < out["a"] < 60
    assert 1400 < out["b"] < 1600


def test_char_shingles_pack_injective():
    """code="pack" must be an exact byte-pack (distinct codes ≡ distinct
    substrings) — the property the SQL substr oracle relies on."""
    from cardinalhq_otel_collector_ray.functions.text import char_shingles_u64
    texts = pa.array(["abcdef ghijkl", "abcdef"])
    starts, codes = char_shingles_u64(texts, k=6, code="pack")
    # first shingle of both docs is "abcdef" — identical packed code
    assert codes[starts[0]] == codes[starts[1]]
    expect = 0
    for ch in b"abcdef":
        expect = (expect << 8) | ch
    assert int(codes[starts[1]]) == expect
    import pytest
    with pytest.raises(ValueError):
        char_shingles_u64(texts, k=9, code="pack")


def test_exact_verify_distributed_matches_broadcast():
    """exact_shingle_jaccard_verify: the >max_driver_docs co-partition-join
    path must produce byte-identical output to the broadcast path."""
    from cardinalhq_otel_collector_ray.stages.dedup import (
        exact_shingle_jaccard_verify, minhash_lsh_pairs)
    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(300)]
    texts, ids = [], []
    for i in range(60):
        ws = list(rng.choice(words, size=40))
        texts.append(" ".join(ws)); ids.append(i * 2)
        if i < 8:
            ws2 = list(ws); ws2[3] = "MUT"
            texts.append(" ".join(ws2)); ids.append(i * 2 + 1)
    tbl = pa.table({"doc_id": ids, "text": texts})

    def run(max_driver_docs):
        ds = ray.data.from_arrow(tbl)
        cand = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.3)
        out = exact_shingle_jaccard_verify(
            cand, ray.data.from_arrow(tbl), "text", "doc_id",
            k_shingle=6, threshold=0.6, max_driver_docs=max_driver_docs)
        df = out.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        return df

    a, b = run(10**6), run(0)
    assert len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_minhash_neardup_exact_planted():
    """The exact pipeline finds every planted near-dup with its exact
    shingle Jaccard, and rejects unrelated pairs."""
    from cardinalhq_otel_collector_ray.stages.dedup import minhash_neardup_exact
    rng = np.random.default_rng(3)
    words = [f"v{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(40):
        ws = list(rng.choice(words, size=50))
        texts.append(" ".join(ws)); ids.append(i * 2)
        if i < 6:
            ws2 = list(ws); ws2[-1] = ws[-1]  # identical twin
            texts.append(" ".join(ws2)); ids.append(i * 2 + 1)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = minhash_neardup_exact(ds, "text", "doc_id", threshold=0.9).to_pandas()
    found = {tuple(sorted(p)) for p in zip(out["id_a"], out["id_b"])}
    planted = {(2 * i, 2 * i + 1) for i in range(6)}
    assert planted <= found
    # identical twins must verify at exactly 1.0
    twin = out[(out.id_a % 2 == 0) & (out.id_b == out.id_a + 1)]
    assert (twin["jaccard"] == 1.0).all()


def test_grid_dispatch_equals_partition_dispatch():
    """dispatch="grid" (theta-join chunk-pair tasks — parallelism scales
    with corpus size even at low block cardinality) must produce exactly
    the partition-dispatch pair set, including across chunk boundaries
    (max_block far below the block size forces multi-chunk grids)."""
    from cardinalhq_otel_collector_ray.stages.dedup import (
        embedding_neardup_pairs, wordset_jaccard_pairs)
    rng = np.random.default_rng(23)
    # TWO block values only, ~90 docs each, with planted near-dups
    texts, ids, blocks = [], [], []
    for i in range(180):
        w = [f"w{rng.integers(0, 40)}" for _ in range(8)]
        texts.append(" ".join(w))
        ids.append(i)
        blocks.append("en" if i % 2 == 0 else "de")
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": ids, "lang": blocks, "text": texts}))

    def run(**kw):
        return wordset_jaccard_pairs(ds, "text", "doc_id", "lang",
                                     threshold=0.5, **kw).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)

    base = run()
    grid = run(dispatch="grid", max_block=16)  # ~6 chunks per block
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, grid)
    assert (grid["id_a"] < grid["id_b"]).all()

    # cross-chunk canonical-order regression: 12 IDENTICAL docs with
    # max_block=4 (3 hash chunks) force pairs whose larger id lands in a
    # LOWER chunk — every one of the 66 pairs must still come out
    # id_a < id_b and equal to the partition dispatch
    twelve = ray.data.from_arrow(pa.table({
        "doc_id": list(range(12)), "lang": ["x"] * 12,
        "text": ["alpha beta gamma delta"] * 12}))

    def run12(**kw):
        return wordset_jaccard_pairs(twelve, "text", "doc_id", "lang",
                                     threshold=0.9, **kw).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)

    b12 = run12()
    g12 = run12(dispatch="grid", max_block=4)
    assert len(b12) == 66
    assert (g12["id_a"] < g12["id_b"]).all()
    pd.testing.assert_frame_equal(b12, g12)

    vecs = rng.normal(size=(120, 8))
    vecs[60:] = vecs[:60] + 0.01 * rng.normal(size=(60, 8))
    eds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(120)),
        "cell": [i % 2 for i in range(120)],
        "embedding": [list(map(float, v)) for v in vecs]}))

    def erun(**kw):
        return embedding_neardup_pairs(eds, "embedding", "vec_id", "cell",
                                       threshold=0.98, **kw).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)

    ebase = erun()
    egrid = erun(dispatch="grid", max_block=16)
    assert len(ebase) > 0
    assert (egrid["id_a"] < egrid["id_b"]).all()
    pd.testing.assert_frame_equal(ebase, egrid)

    # cross-chunk canonical order for the embedding kernel too: identical
    # vectors, one block, several hash chunks
    same = ray.data.from_arrow(pa.table({
        "vec_id": list(range(12)), "cell": [0] * 12,
        "embedding": [[1.0, 0.5, -0.25, 2.0]] * 12}))
    gs = embedding_neardup_pairs(same, "embedding", "vec_id", "cell",
                                 threshold=0.99, dispatch="grid",
                                 max_block=4).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(gs) == 66 and (gs["id_a"] < gs["id_b"]).all()


def test_grid_cardinality_guard_raises(monkeypatch):
    """dispatch="grid" must refuse high block cardinality with a clear
    error pointing at the partition dispatch (threshold monkeypatched
    low to exercise both the streaming and post-merge checks)."""
    import cardinalhq_otel_collector_ray.stages.dedup as dedup_mod
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(40)),
        "lang": [f"b{i}" for i in range(40)],  # 40 distinct blocks
        "text": ["alpha beta gamma"] * 40}))
    monkeypatch.setattr(dedup_mod, "GRID_MAX_BLOCKS", 8)
    with pytest.raises(ValueError, match="partition dispatch"):
        wordset_jaccard_pairs(ds, "text", "doc_id", "lang", threshold=0.5,
                              dispatch="grid").to_pandas()


def test_exact_pairs_survive_hot_buckets_and_long_docs():
    """Exactness fixes (round-3 review): (a) a bucket larger than
    max_bucket is processed as chunk×chunk sub-blocks for the EXACT APIs
    — never silently dropped; (b) candidate minhash signatures cover the
    full text, so long docs that agree only after the 4096-byte prefix
    still pair."""
    from cardinalhq_otel_collector_ray.stages.dedup import (
        minhash_neardup_exact, simhash_pairs)
    # (a) 12 identical docs with max_bucket=4: every band bucket holds all
    # 12; all 66 pairs must come out at jaccard 1.0
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(12)),
        "text": ["alpha beta gamma delta epsilon zeta"] * 12}))
    out = minhash_neardup_exact(ds, "text", "doc_id", threshold=0.9,
                                max_bucket=4).to_pandas()
    assert len(out) == 66 and (out["jaccard"] == 1.0).all()
    sp = simhash_pairs(ds, "text", "doc_id", max_hamming=3,
                       max_bucket=4).to_pandas()
    assert len(sp) == 66 and (sp["hamming"] == 0).all()
    # (b) two 8 KB docs: identical first 4096 bytes would NOT pair under a
    # prefix-capped signature regime after the prefix diverges — here they
    # share everything except one tail word, so full-text J >= 0.9 and the
    # pair must be found with its exact full-text jaccard
    head = " ".join(f"w{i:04d}" for i in range(700))      # ~4.9 KB shared
    t1 = head + " tail_one_xyz"
    t2 = head + " tail_two_qrs"
    ds2 = ray.data.from_arrow(pa.table({"doc_id": [0, 1],
                                        "text": [t1, t2]}))
    out2 = minhash_neardup_exact(ds2, "text", "doc_id",
                                 threshold=0.8).to_pandas()
    assert len(out2) == 1
    assert 0.8 <= out2["jaccard"].iloc[0] < 1.0
    # and the equal-prefix/different-suffix counterexample: two docs whose
    # FIRST 4096 bytes match but which are <80% similar overall must NOT
    # pair (the uncapped signature sees the divergence; a prefix-capped
    # one would emit est_jaccard 1.0 candidates that exact-verify kills —
    # either way output parity holds, this pins the verify)
    t3 = head + " " + " ".join(f"x{i:04d}" for i in range(900))
    t4 = head + " " + " ".join(f"y{i:04d}" for i in range(900))
    ds3 = ray.data.from_arrow(pa.table({"doc_id": [0, 1],
                                        "text": [t3, t4]}))
    out3 = minhash_neardup_exact(ds3, "text", "doc_id",
                                 threshold=0.8).to_pandas()
    assert len(out3) == 0


def test_blocked_pairs_invariant_at_high_block_cardinality():
    """Partition-dispatch invariance (VERDICT r02 item 5): with ≥1000
    distinct block values the pair set must (a) be identical for any
    ``partitions`` setting — including 1, the single-group path the old
    per-block dispatch reduces to — and (b) never cross a block boundary,
    even though many blocks now share one hash partition."""
    from cardinalhq_otel_collector_ray.stages.dedup import (
        embedding_neardup_pairs)
    n_blocks = 1200
    # wordset: every block holds one base doc + one near-dup (shared word
    # set), plus the SAME text reused in a different block (must not pair
    # across blocks).
    texts, ids, blocks = [], [], []
    for b in range(n_blocks):
        w = [f"w{b}_{i}" for i in range(6)]
        texts += [" ".join(w), " ".join(w[:5]) + f" x{b}"]
        ids += [2 * b, 2 * b + 1]
        blocks += [f"blk{b}", f"blk{b}"]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": ids, "lang": blocks, "text": texts}))
    outs = {}
    for p in (1, 7, 64):
        outs[p] = wordset_jaccard_pairs(
            ds, "text", "doc_id", "lang", threshold=0.5, partitions=p) \
            .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(outs[1], outs[7])
    pd.testing.assert_frame_equal(outs[1], outs[64])
    got = outs[64]
    assert len(got) == n_blocks  # exactly one pair per block
    assert (got["id_b"] - got["id_a"] == 1).all()  # never cross-block
    assert np.allclose(got["jaccard"], 5 / 7)

    # embedding: int block col, one planted near-dup per block
    rng = np.random.default_rng(11)
    base = rng.normal(size=(n_blocks, 8))
    vecs = np.repeat(base, 2, axis=0)
    vecs[1::2] += 0.01 * rng.normal(size=(n_blocks, 8))
    eds = ray.data.from_arrow(pa.table({
        "vec_id": list(range(2 * n_blocks)),
        "cell": np.repeat(np.arange(n_blocks, dtype=np.int64), 2),
        "embedding": [list(map(float, v)) for v in vecs]}))
    eouts = {}
    for p in (1, 64):
        eouts[p] = embedding_neardup_pairs(
            eds, "embedding", "vec_id", "cell", threshold=0.99,
            partitions=p).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(eouts[1], eouts[64])
    got = eouts[64]
    assert len(got) == n_blocks
    assert (got["id_b"] - got["id_a"] == 1).all()


def test_null_block_rows_are_dropped_both_dispatches():
    """Null block values produce no pairs (SQL: a self-join ON block never
    matches NULL) and must not corrupt task assignment — previously a null
    dictionary index turned into a garbage chunk index after astype(int64).
    Both dispatches must agree with the null-free corpus."""
    from cardinalhq_otel_collector_ray.stages.dedup import wordset_jaccard_pairs
    ids = list(range(9))
    texts = ["alpha beta gamma delta epsilon"] * 9
    blocks = ["en", "en", None, "en", None, "en", "de", "de", None]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": ids, "lang": blocks, "text": texts}))
    clean = ray.data.from_arrow(pa.table({
        "doc_id": [i for i, b in zip(ids, blocks) if b is not None],
        "lang": [b for b in blocks if b is not None],
        "text": ["alpha beta gamma delta epsilon"] * 6}))

    def run(d, **kw):
        return wordset_jaccard_pairs(d, "text", "doc_id", "lang",
                                     threshold=0.5, **kw).to_pandas() \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)

    want = run(clean)
    assert len(want) == 6 + 1  # C(4,2) en pairs + C(2,2) de pair
    pd.testing.assert_frame_equal(run(ds), want)
    pd.testing.assert_frame_equal(run(ds, dispatch="grid", max_block=2), want)


def test_grid_guard_compacts_repeated_blocks(monkeypatch):
    """B input blocks × D distinct-per-batch must NOT trip the grid
    cardinality guard when the true distinct count is far below the cap:
    the streamed count partials are group_by-compacted, not raw-counted."""
    import cardinalhq_otel_collector_ray.stages.dedup as dd
    monkeypatch.setattr(dd, "GRID_MAX_BLOCKS", 8)
    # 64 single-row input blocks over only 4 distinct block values:
    # cumulative partial rows (64) >> 4*cap (32), distinct (4) << cap (8)
    n = 64
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(n)),
        "lang": [f"b{i % 4}" for i in range(n)],
        "text": ["alpha beta gamma delta"] * n})).repartition(n)
    out = dd.wordset_jaccard_pairs(ds, "text", "doc_id", "lang",
                                   threshold=0.9, dispatch="grid",
                                   max_block=8).to_pandas()
    assert len(out) == 4 * (16 * 15 // 2)  # all-pairs within each block
    # and the guard still fires on TRUE high cardinality
    hot = ray.data.from_arrow(pa.table({
        "doc_id": list(range(40)),
        "lang": [f"u{i}" for i in range(40)],
        "text": ["alpha beta"] * 40}))
    with pytest.raises(ValueError, match="distinct"):
        dd.wordset_jaccard_pairs(hot, "text", "doc_id", "lang",
                                 threshold=0.9, dispatch="grid",
                                 max_block=8).to_pandas()
