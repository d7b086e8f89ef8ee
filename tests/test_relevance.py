"""TF-IDF / BM25 kernels vs naive references; exact heavy hitters."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.aggregate import exact_heavy_hitters
from cardinalhq_otel_collector_ray.stages.relevance import (
    bm25_scores, corpus_stats, idf_array, tfidf_top_terms)


def _toy_docs():
    # doc 0: a a b; doc 1: b c; doc 2: a c c c
    rows = [
        {"doc_id": "d0", "tokens": [0, 0, 1], "n_tok": 3},
        {"doc_id": "d1", "tokens": [1, 2], "n_tok": 2},
        {"doc_id": "d2", "tokens": [0, 2, 2, 2], "n_tok": 4},
    ]
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows]),
        "tokens": pa.array([r["tokens"] for r in rows], type=pa.list_(pa.int32())),
        "n_tok": pa.array([r["n_tok"] for r in rows], type=pa.int32()),
    })
    return ray.data.from_arrow(t).repartition(2)


def test_corpus_stats_exact():
    stats = corpus_stats(_toy_docs()).to_pandas().set_index("token")
    assert stats.loc[0, "df"] == 2 and stats.loc[0, "freq"] == 3
    assert stats.loc[1, "df"] == 2 and stats.loc[1, "freq"] == 2
    assert stats.loc[2, "df"] == 2 and stats.loc[2, "freq"] == 4


def test_tfidf_matches_naive():
    ds = _toy_docs()
    stats = corpus_stats(ds)
    idf = idf_array(stats.select(["token", "df"]), n_docs=3)
    got = tfidf_top_terms(ds, idf, k=2).to_pandas()
    # naive: per doc count tokens, score tf*idf, top2 by (-score, token)
    docs = {"d0": [0, 0, 1], "d1": [1, 2], "d2": [0, 2, 2, 2]}
    for doc_id, toks in docs.items():
        tf = pd.Series(toks).value_counts()
        scores = {t: n * idf[t] for t, n in tf.items()}
        expect = sorted(scores, key=lambda t: (-scores[t], t))[:2]
        sub = got[got["doc_id"] == doc_id].sort_values(
            ["score", "token"], ascending=[False, True])
        assert list(sub["token"]) == expect
        for t in expect:
            row = sub[sub["token"] == t].iloc[0]
            assert row["score"] == round(scores[t], 6)
            assert row["tf"] == tf[t]


def test_bm25_matches_naive():
    ds = _toy_docs()
    df_map = {0: 2, 1: 2, 2: 2}
    N, S = 3, 9
    got = (bm25_scores(ds, np.array([0, 2]), df_map, N, S)
           .to_pandas().set_index("doc_id")["score"])
    k1, b = 1.2, 0.75
    def idf(df):
        return math.log((N - df + 0.5) / (df + 0.5) + 1.0)
    def term(tf, dl, df):
        return idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl * N / float(S))))
    assert np.isclose(got["d0"], term(2, 3, 2))            # only token 0
    assert np.isclose(got["d1"], term(1, 2, 2))            # only token 2
    assert np.isclose(got["d2"], term(1, 4, 2) + term(3, 4, 2))
    # docs with no query terms emit nothing
    none = bm25_scores(ds, np.array([1]), {1: 2}, N, S).to_pandas()
    assert set(none["doc_id"]) == {"d0", "d1"}


def test_heavy_hitters_exact_and_candidate_bound():
    # value 7 is globally heavy but evenly SPREAD across blocks (never a
    # majority anywhere it isn't also locally heavy — the weighted-average
    # bound must still catch it); value 8 is locally heavy in one block but
    # globally light and must be excluded by the exact re-count.
    blocks = []
    for i in range(8):
        v = np.r_[np.full(20, 7), np.arange(100) + 10 + i * 200]  # 7: 20/120
        blocks.append(pd.DataFrame({"x": v.astype(np.int64)}))
    blocks.append(pd.DataFrame({"x": np.full(30, 8, dtype=np.int64)}))
    ds = ray.data.from_pandas(blocks)
    n = sum(len(b) for b in blocks)
    out = exact_heavy_hitters(ds, "x", k=8)
    truth = pd.concat(blocks)["x"].value_counts()
    expect = sorted(v for v, c in truth.items() if c * 8 > n)
    assert list(out["x"]) == expect
    assert 7 in set(out["x"])
    assert 8 not in set(out["x"])  # locally heavy, globally light
    got_counts = dict(zip(out["x"], out["count"]))
    assert got_counts[7] == 160


def test_bigram_counts_and_logprob_naive():
    from cardinalhq_otel_collector_ray.stages.relevance import (
        bigram_counts, bigram_logprob)
    ds = _toy_docs()  # d0: 0 0 1 | d1: 1 2 | d2: 0 2 2 2
    bi = bigram_counts(ds).to_pandas()
    got = {(r.prev, r.cur): r.c for r in bi.itertuples()}
    assert got == {(0, 0): 1, (0, 1): 1, (1, 2): 1, (0, 2): 1, (2, 2): 2}
    uni = np.array([3, 2, 4], dtype=np.int64)  # corpus freqs
    out = (bigram_logprob(ds, pa.Table.from_pandas(bi), uni, vocab_size=3)
           .to_pandas().set_index("doc_id"))
    V = 3
    def lp(pairs):
        return sum(math.log((got.get(p, 0) + 1.0) / (uni[p[0]] + V))
                   for p in pairs)
    assert np.isclose(out.loc["d0", "logprob"], lp([(0, 0), (0, 1)]))
    assert out.loc["d0", "n_pairs"] == 2
    assert np.isclose(out.loc["d2", "logprob"], lp([(0, 2), (2, 2), (2, 2)]))


def test_logistic_score_left_to_right():
    from cardinalhq_otel_collector_ray.stages.textstats import logistic_score
    df = pd.DataFrame({"a": [0.0, 1.0, 2.0], "b": [3, 1, 0]})
    out = logistic_score(ray.data.from_pandas(df), [("a", 2.0), ("b", -1.0)],
                         bias=0.5, out="s").to_pandas()
    z = 0.5 + 2.0 * df["a"].to_numpy() + -1.0 * df["b"].to_numpy().astype(float)
    np.testing.assert_array_equal(out["s"].to_numpy(), 1.0 / (1.0 + np.exp(-z)))


def test_dsir_weights_favor_target_distribution():
    """DSIR semantics: docs whose bigrams match the TARGET subset's
    distribution must get higher log importance weights than docs matching
    the raw-majority distribution (Xie et al. 2023 sanity property)."""
    from cardinalhq_otel_collector_ray.stages.relevance import dsir_weights
    # target sources: src_num % 7 == 3 → src3. Target docs use bigrams over
    # tokens {0,1}; raw-majority docs (src0) use tokens {5,6}.
    n_each = 8
    rows_id, rows_tok, rows_src = [], [], []
    for i in range(n_each):
        rows_id.append(f"t{i}")
        rows_tok.append([0, 1, 0, 1, 0])
        rows_src.append("src3")
        rows_id.append(f"r{i}")
        rows_tok.append([5, 6, 5, 6, 5])
        rows_src.append("src0")
    # probe docs, both from a NON-target source: one target-like, one raw-like
    rows_id += ["probe_t", "probe_r"]
    rows_tok += [[0, 1, 0, 1, 0], [5, 6, 5, 6, 5]]
    rows_src += ["src1", "src1"]
    t = pa.table({
        "doc_id": pa.array(rows_id),
        "tokens": pa.array(rows_tok, type=pa.list_(pa.int32())),
        "n_tok": pa.array([len(x) for x in rows_tok], type=pa.int32()),
        "source": pa.array(rows_src),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = dsir_weights(ds, vocab_size=7, n_buckets=64).to_pandas()
    w = out.set_index("doc_id")["log_w"]
    assert w["probe_t"] > w["probe_r"]
    # every pure-target-style doc outweighs every raw-style doc
    assert w[[f"t{i}" for i in range(n_each)]].min() > \
        w[[f"r{i}" for i in range(n_each)]].max()
    assert (out["n_pairs"] == 4).all()


def test_remove_dup_spans_known_coverage():
    """Hand-computed ExactSubstr removal at n=3: coverage is the interval
    UNION of duplicated windows; kept_tok_sum checksums which positions
    survive; intra-doc repetition also counts toward corpus count."""
    from cardinalhq_otel_collector_ray.stages.relevance import (
        frequent_ngrams, remove_dup_spans)
    t = pa.table({
        "doc_id": pa.array(["a", "b", "c", "d"]),
        "tokens": pa.array(
            [[1, 2, 3, 4, 5, 6],        # dup (1,2,3),(2,3,4) -> covers 0..3
             [9, 1, 2, 3, 4, 8],        # same windows at 1,2 -> covers 1..4
             [7, 7, 7, 7, 7],           # (7,7,7) x3 intra-doc -> covers all
             [11, 12]],                 # shorter than n: untouched
            type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(t).repartition(2)
    hot = frequent_ngrams(ds, n=3, min_count=2, vocab_size=16)
    got = (remove_dup_spans(ds, hot, n=3, vocab_size=16)
           .to_pandas().set_index("doc_id"))
    assert got.loc["a", "n_removed"] == 4 and got.loc["a", "kept_tok_sum"] == 5 + 6
    assert got.loc["b", "n_removed"] == 4 and got.loc["b", "kept_tok_sum"] == 9 + 8
    assert got.loc["c", "n_removed"] == 5 and got.loc["c", "kept_tok_sum"] == 0
    assert got.loc["d", "n_removed"] == 0 and got.loc["d", "kept_tok_sum"] == 23
    assert (got["n_kept"] == got["n_tok"] - got["n_removed"]).all()


def test_remove_dup_spans_no_cross_doc_bleed():
    """A duplicated window ending at a doc's last token must not mark the
    NEXT doc's first token (difference-array decrement lands exactly on
    the boundary) — both docs in ONE block to exercise the flat layout."""
    from cardinalhq_otel_collector_ray.stages.relevance import (
        frequent_ngrams, remove_dup_spans)
    t = pa.table({
        "doc_id": pa.array(["x", "y"]),
        # dup 3-gram (5,6,7) sits at the END of x and START of y:
        "tokens": pa.array([[1, 5, 6, 7], [5, 6, 7, 2]],
                           type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(t)  # single block
    hot = frequent_ngrams(ds, n=3, min_count=2, vocab_size=8)
    got = (remove_dup_spans(ds, hot, n=3, vocab_size=8)
           .to_pandas().set_index("doc_id"))
    assert got.loc["x", "n_removed"] == 3 and got.loc["x", "kept_tok_sum"] == 1
    assert got.loc["y", "n_removed"] == 3 and got.loc["y", "kept_tok_sum"] == 2


def test_bigram_logprob_passthrough_cols():
    """passthrough_cols ride through aligned with the kept (>=2-token)
    docs — the CCNet bucketing path needs `source` without a join."""
    from cardinalhq_otel_collector_ray.stages.relevance import (
        bigram_counts, bigram_logprob)
    t = pa.table({
        "doc_id": pa.array(["a", "b", "tiny"]),
        "source": pa.array(["s1", "s2", "s3"]),
        "tokens": pa.array([[1, 2, 3], [2, 3], [7]],
                           type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(t)
    bi = bigram_counts(ds)
    uni = np.zeros(8, dtype=np.int64)
    for toks in t["tokens"].to_pylist():
        for tok in toks:
            uni[tok] += 1
    out = (bigram_logprob(ds, bi, uni, vocab_size=8,
                          passthrough_cols=["source"])
           .to_pandas().set_index("doc_id"))
    assert out.loc["a", "source"] == "s1"
    assert out.loc["b", "source"] == "s2"
    assert "tiny" not in out.index          # <2 tokens: dropped
    assert out.loc["a", "n_pairs"] == 2
