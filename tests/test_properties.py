"""Property-based invariants (hypothesis) for the pure kernels."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cardinalhq_otel_collector_ray.functions.hashing import mulhash
from cardinalhq_otel_collector_ray.functions.text import (
    char_shingles_u64, map_words_to_ids, split_words)
from cardinalhq_otel_collector_ray.stages.summarysplit import (
    clamp_uint64, explode_summary_batch, quantile_suffix)

words_st = st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=6),
                    min_size=1, max_size=20)


@settings(max_examples=50, deadline=None)
@given(st.lists(words_st, min_size=1, max_size=10))
def test_tokenize_roundtrip(docs):
    """tokens decode back to the exact word sequence (vocab is total)."""
    texts = [" ".join(ws) for ws in docs]
    vocab_words = sorted({w for ws in docs for w in ws})
    vocab = {w: i for i, w in enumerate(vocab_words)}
    inv = {i: w for w, i in vocab.items()}
    toks = map_words_to_ids(split_words(pa.array(texts)), vocab)
    for ws, ids in zip(docs, toks.to_pylist()):
        assert [inv[i] for i in ids] == ws


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet="abcxyz-", min_size=0, max_size=200),
                min_size=1, max_size=30),
       st.data())
def test_content_part_tags_are_value_deterministic(contents, data):
    """The dedup partition tag must be a pure function of the VALUE —
    independent of which other rows share the batch (round-4 regression:
    a per-batch mean-length heuristic scattered duplicates)."""
    from cardinalhq_otel_collector_ray.stages.dedup import _content_part_tags
    tags = _content_part_tags(pa.array(contents, pa.string()), 64)
    expect = dict(zip(contents, tags.tolist()))
    # any sub-batch, any companions (incl. very long ones): same tags
    subset = data.draw(st.lists(st.sampled_from(contents), min_size=1,
                                max_size=10))
    companions = data.draw(st.lists(
        st.text(alphabet="qz", min_size=0, max_size=2000), max_size=3))
    mixed = _content_part_tags(pa.array(subset + companions, pa.string()), 64)
    for c, t in zip(subset, mixed.tolist()[: len(subset)]):
        assert t == expect[c]


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=50))
def test_mulhash_range_and_determinism(ids):
    a = mulhash(np.asarray(ids))
    b = mulhash(np.asarray(ids))
    assert (a == b).all()
    assert ((a >= 0) & (a < 1_000_003)).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="xyz ", min_size=0, max_size=30),
                min_size=1, max_size=8),
       st.integers(min_value=2, max_value=6))
def test_shingle_counts(texts, k):
    starts, codes = char_shingles_u64(texts, k=k)
    assert len(starts) == len(texts) + 1
    for i, t in enumerate(texts):
        n = max(len(t.encode()) - k + 1, 0)
        assert starts[i + 1] - starts[i] == n


@settings(max_examples=50, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_quantile_suffix_total_on_unit_interval(q):
    s = quantile_suffix(q)
    assert s in (".min", ".max") or s.startswith(".quantile.")
    assert "." not in s[len(".quantile."):] or s in (".min", ".max")


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=20))
def test_clamp_never_overflows(vals):
    out = clamp_uint64(np.array(vals, dtype=np.uint64))
    assert (out >= 0).all() and (out <= 2**63 - 1).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1),
       st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_explode_row_count_invariant(count, total):
    """#output rows == 2 + #valid distinct quantiles, for any inputs."""
    qs = [{"q": 0.0, "v": 1.0}, {"q": 0.5, "v": 2.0}, {"q": 2.0, "v": 3.0}]
    t = pa.table({
        "name": ["m"], "ts": pa.array([10], pa.int64()),
        "start_ts": pa.array([0], pa.int64()),
        "count": pa.array([count], pa.uint64()),
        "sum": pa.array([total], pa.float64()),
        "quantiles": pa.array([qs], type=pa.list_(
            pa.struct([("q", pa.float64()), ("v", pa.float64())]))),
    })
    out = explode_summary_batch(t)
    assert out.num_rows == 2 + 2  # .count, .sum, .min, .quantile.50 (2.0 invalid)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=60))
def test_router_first_match_wins_and_total(vals):
    """Router invariants: every row gets exactly one sink; first matching
    rule wins; unmatched rows get the default."""
    import pyarrow as pa
    from cardinalhq_otel_collector_ray.stages.route import RouteRule, Router

    batch = pa.table({"v": vals})
    rules = [
        RouteRule("s1", lambda t: np.asarray([x == "a" for x in t["v"].to_pylist()])),
        RouteRule("s2", lambda t: np.asarray([x in ("a", "b") for x in t["v"].to_pylist()])),
    ]
    out = Router(rules, default_sink="rest")(batch)
    routes = out["route"].to_pylist()
    assert len(routes) == len(vals)
    for v, r in zip(vals, routes):
        expect = "s1" if v == "a" else ("s2" if v == "b" else "rest")
        assert r == expect, (v, r)


# ---------------------- temporal kernels vs naive pandas reference --------
# The segmented-vectorized rewrites must agree with the obvious per-key
# pandas implementation on arbitrary keyed event streams.

import pyarrow as _pa
import ray.data as _rd
from hypothesis import HealthCheck

_events_strategy = st.lists(
    st.tuples(st.integers(0, 5),           # key
              st.integers(0, 10_000),      # ts
              st.integers(-1000, 1000)),   # value
    min_size=1, max_size=60)


def _mk_ds(rows):
    ks, ts, vs = zip(*rows)
    ids = list(range(len(rows)))
    return _rd.from_arrow(_pa.table({
        "id": ids, "k": list(ks), "ts": list(ts), "v": list(vs)})), ids


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_events_strategy)
def test_cumulative_to_delta_matches_pandas(rows):
    from cardinalhq_otel_collector_ray.stages.temporal import cumulative_to_delta
    ds, _ = _mk_ds(rows)
    got = cumulative_to_delta(ds, keys=["k"], ts_col="ts", value_col="v",
                              tiebreak_cols=["id"], num_partitions=3) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    import pandas as pd
    ref = pd.DataFrame(rows, columns=["k", "ts", "v"])
    ref["id"] = range(len(ref))
    ref = ref.sort_values(["k", "ts", "id"], kind="mergesort")
    ref["delta"] = ref.groupby("k")["v"].diff()
    ref = ref.sort_values("id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["delta"], ref["delta"],
                                   check_names=False)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_events_strategy)
def test_delta_to_cumulative_matches_pandas(rows):
    from cardinalhq_otel_collector_ray.stages.temporal import delta_to_cumulative
    ds, _ = _mk_ds(rows)
    got = delta_to_cumulative(ds, keys=["k"], ts_col="ts", value_col="v",
                              tiebreak_cols=["id"], num_partitions=3) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    import pandas as pd
    ref = pd.DataFrame(rows, columns=["k", "ts", "v"])
    ref["id"] = range(len(ref))
    ref = ref.sort_values(["k", "ts", "id"], kind="mergesort")
    ref["cumulative"] = ref.groupby("k")["v"].cumsum()
    ref = ref.sort_values("id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["cumulative"].astype("int64"), ref["cumulative"].astype("int64"),
        check_names=False)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_events_strategy)
def test_sessionize_matches_pandas(rows):
    from cardinalhq_otel_collector_ray.stages.temporal import sessionize
    GAP = 500
    ds, _ = _mk_ds(rows)
    got = sessionize(ds, key="k", ts_col="ts", gap_ms=GAP, num_partitions=3) \
        .to_pandas().sort_values(["k", "session_id"]).reset_index(drop=True)
    import pandas as pd
    import numpy as np
    ref_rows = []
    df = pd.DataFrame(rows, columns=["k", "ts", "v"])
    for k, g in df.groupby("k"):
        ts = np.sort(g["ts"].to_numpy())
        new = np.ones(len(ts), dtype=bool)
        new[1:] = (ts[1:] - ts[:-1]) > GAP
        sid = np.cumsum(new) - 1
        for s in np.unique(sid):
            seg = ts[sid == s]
            ref_rows.append((k, int(s), int(seg.min()), int(seg.max()),
                             len(seg)))
    ref = pd.DataFrame(ref_rows, columns=[
        "k", "session_id", "session_start", "session_end", "n_events"]) \
        .sort_values(["k", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[ref.columns].astype("int64"), ref.astype("int64"))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_events_strategy)
def test_interval_dedup_matches_pandas(rows):
    from cardinalhq_otel_collector_ray.stages.temporal import interval_dedup
    IV = 1000
    ds, _ = _mk_ds(rows)
    got = interval_dedup(ds, keys=["k"], ts_col="ts", interval_ms=IV,
                         tiebreak_cols=["id"], num_partitions=3) \
        .to_pandas().sort_values(["k", "_interval"]).reset_index(drop=True)
    import pandas as pd
    ref = pd.DataFrame(rows, columns=["k", "ts", "v"])
    ref["id"] = range(len(ref))
    ref["_interval"] = (ref["ts"] // IV) * IV
    ref = ref.sort_values(["ts", "id"], kind="mergesort")
    g = ref.groupby(["k", "_interval"], as_index=False)
    first = g.first()
    first["dedup_count"] = g.size()["size"].values
    first = first.sort_values(["k", "_interval"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "_interval", "id", "dedup_count"]].astype(
            {"_interval": "int64", "id": "int64", "dedup_count": "int64"}),
        first[["k", "_interval", "id", "dedup_count"]].astype(
            {"_interval": "int64", "id": "int64", "dedup_count": "int64"}))


# ---- round-2 second-pass kernels ------------------------------------------

texts_st = st.lists(st.text(alphabet="abcdxy ", min_size=0, max_size=40),
                    min_size=1, max_size=8)


@settings(max_examples=50, deadline=None)
@given(texts_st, st.integers(2, 4), st.integers(2, 6))
def test_winnow_kernel_invariants(texts, k, w):
    """Every fingerprint is a k-gram hash of its own doc; substring-sharing
    docs share a fingerprint; output is deduped per doc."""
    from cardinalhq_otel_collector_ray.stages.textstats import winnow_kernel

    d, f = winnow_kernel(pa.array(texts), k=k, w=w)
    # deduped (doc, fp) pairs
    assert len(set(zip(d.tolist(), f.tolist()))) == len(d)
    # every emitted fp is genuinely one of its doc's k-gram hashes
    for doc, fp in zip(d.tolist(), f.tolist()):
        s, c = char_shingles_u64(pa.array([texts[doc]]), k=k)
        assert np.uint64(fp) in set(c.tolist())
    # docs long enough emit >= 1 fingerprint
    for i, t in enumerate(texts):
        if len(t.encode()) >= k:
            assert i in set(d.tolist())


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=0, max_size=60),
       st.integers(2, 3))
def test_frequent_ngram_packing_matches_positional(tokens, n):
    """The packed n-gram key is the exact positional base-V number SQL
    computes with lead() — check against a per-position loop."""
    V = 31
    vals = np.asarray(tokens, dtype=np.int64)
    if len(vals) < n:
        return
    key = vals[: len(vals) - n + 1].copy()
    for j in range(1, n):
        key = key * V + vals[j: len(vals) - n + 1 + j]
    for i in range(len(vals) - n + 1):
        expect = 0
        for j in range(n):
            expect = expect * V + int(vals[i + j])
        assert key[i] == expect


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),          # key
                          st.integers(0, 5),          # ts (dup-heavy)
                          st.integers(-100, 100)),    # value
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=6))
def test_moving_agg_kernel_matches_pandas_rolling(rows, w):
    import pandas as pd

    from cardinalhq_otel_collector_ray.stages.window import moving_agg_kernel
    df = pd.DataFrame(rows, columns=["k", "ts", "v"])
    df["id"] = np.arange(len(df))
    out = moving_agg_kernel(df, ["k"], "ts", "v", "id", w)
    ref = df.sort_values(["k", "ts", "id"], kind="mergesort").reset_index(drop=True)
    g = ref.groupby("k", sort=False)["v"]
    exp_sum = g.rolling(w, min_periods=1).sum().reset_index(drop=True)
    exp_n = g.rolling(w, min_periods=1).count().reset_index(drop=True)
    exp_lag = (ref["v"] - g.shift(1).fillna(ref["v"])).reset_index(drop=True)
    assert out["mov_sum"].tolist() == exp_sum.astype(int).tolist()
    assert out["mov_n"].tolist() == exp_n.astype(int).tolist()
    assert out["lag_delta"].tolist() == exp_lag.astype(int).tolist()


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e7, max_value=1e7,
                 allow_nan=False, allow_infinity=False))
def test_round6_matches_duckdb_everywhere(x):
    """round6 == DuckDB round(x, 6) for arbitrary float64 (half-away)."""
    import duckdb

    from cardinalhq_otel_collector_ray.functions.hashing import round6
    con = duckdb.connect()
    sql = con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [x]).fetchone()[0]
    assert round6(x) == sql


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),                 # group key
                          st.integers(-1000, 1000)),         # value
                min_size=0, max_size=60),
       st.integers(1, 4),                                    # batch split
       st.sampled_from([1, 3, 10**9]))                       # driver cap
def test_driver_merge_stream_equals_one_group_by(ray_session, rows, nsplit, cap):
    """driver_merge_stream (compacted, possibly spilled) == a single
    group_by over the concatenated partials, at every cap regime."""
    import ray.data

    import cardinalhq_otel_collector_ray.stages.aggregate as agg_mod
    from cardinalhq_otel_collector_ray.stages.aggregate import \
        driver_merge_stream
    # pre-named partials, one column per op (the helper's contract)
    t = pa.table({"k": pa.array([k for k, _ in rows], type=pa.int64()),
                  "s": pa.array([v for _, v in rows], type=pa.int64()),
                  "m": pa.array([v for _, v in rows], type=pa.int64())})
    ds = ray.data.from_arrow(t)
    if t.num_rows:
        ds = ds.repartition(min(nsplit, t.num_rows))
    old = agg_mod.MAX_DRIVER_ROWS
    agg_mod.MAX_DRIVER_ROWS = cap
    try:
        out = driver_merge_stream(ds, ["k"], [("s", "sum"), ("m", "min")])
    finally:
        agg_mod.MAX_DRIVER_ROWS = old
    if out is None:
        assert t.num_rows == 0
        return
    if not isinstance(out, pa.Table):
        out = pa.concat_tables(
            [b for b in out.iter_batches(batch_format="pyarrow")
             if b.num_rows])
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    want = t.group_by(["k"]).aggregate([("s", "sum"), ("m", "min")]) \
        .to_pandas()
    want.columns = ["k", "s", "m"]
    want = want.sort_values("k").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got[["k", "s", "m"]].astype("int64"),
                                  want.astype("int64"))


@settings(max_examples=10, deadline=None)
@given(st.integers(2, 5),          # distinct blocks
       st.integers(2, 30),         # docs per block
       st.integers(2, 7),          # max_block (grid chunk size)
       st.integers(0, 2**31))      # corpus seed
def test_grid_dispatch_equivalence_randomized(ray_session, nblocks,
                                              per_block, max_block, seed):
    """dispatch="grid" ≡ dispatch="partition" for random corpora, any
    chunk size — pair set, values, and canonical id order."""
    import pandas as pd
    import ray.data

    from cardinalhq_otel_collector_ray.stages.dedup import \
        wordset_jaccard_pairs
    rng = np.random.default_rng(seed)
    ids, blocks, texts = [], [], []
    i = 0
    for b in range(nblocks):
        for _ in range(per_block):
            texts.append(" ".join(
                f"w{rng.integers(0, 12)}" for _ in range(5)))
            ids.append(i); blocks.append(f"b{b}")
            i += 1
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": ids, "blk": blocks, "text": texts}))

    def run(**kw):
        df = wordset_jaccard_pairs(ds, "text", "doc_id", "blk",
                                   threshold=0.4, **kw).to_pandas()
        if df.empty:
            # zero pairs: Ray drops all-empty blocks, losing the schema —
            # normalize so both dispatches compare equal
            df = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                               "id_b": pd.Series([], dtype="int64"),
                               "jaccard": pd.Series([], dtype="float64")})
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    base = run()
    grid = run(dispatch="grid", max_block=max_block)
    assert (grid["id_a"] < grid["id_b"]).all() if len(grid) else True
    pd.testing.assert_frame_equal(base, grid)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.integers(0, 1000), min_size=0, max_size=90),
                min_size=1, max_size=12),
       st.integers(1, 40), st.data())
def test_chunk_batch_matches_naive(docs, size, data):
    """chunk_batch ≡ the obvious per-doc Python chunker for every
    (size, stride ≤ size), including empty docs and remainder windows
    (stride > size is rejected by the operator — see chunk_tokens)."""
    from cardinalhq_otel_collector_ray.stages.packing import chunk_batch
    stride = data.draw(st.integers(1, size))
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    out = chunk_batch(t, "tokens", "doc_id", size=size, stride=stride,
                      emit_tokens=True)
    got = list(zip(out["doc_id"].to_pylist(), out["chunk_idx"].to_pylist(),
                   out["start_tok"].to_pylist(),
                   out["n_tok_chunk"].to_pylist(),
                   out["tokens"].to_pylist()))
    want = []
    for did, doc in enumerate(docs):
        n = len(doc)
        k = 1 if n <= size else 1 + -(-(n - size) // stride)
        for c in range(k):
            s = c * stride
            w = min(size, n - s)
            want.append((did, c, s, w, doc[s:s + w]))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.lists(st.integers(min_value=0, max_value=7),
                         min_size=0, max_size=24),
                min_size=1, max_size=12),
       st.integers(min_value=2, max_value=3),
       st.integers(min_value=1, max_value=4))
def test_remove_dup_spans_matches_naive(ray_session, docs, n, nblocks):
    """ExactSubstr removal vs a naive per-corpus reference: coverage is
    the interval union of windows whose CORPUS count >= 2 (intra-doc
    repeats included), across arbitrary blockings."""
    from collections import Counter

    import ray.data

    from cardinalhq_otel_collector_ray.stages.relevance import (
        frequent_ngrams, remove_dup_spans)

    cnt = Counter()
    for toks in docs:
        for i in range(len(toks) - n + 1):
            cnt[tuple(toks[i:i + n])] += 1
    expect = {}
    for d, toks in enumerate(docs):
        covered = [False] * len(toks)
        for i in range(len(toks) - n + 1):
            if cnt[tuple(toks[i:i + n])] >= 2:
                for j in range(i, i + n):
                    covered[j] = True
        expect[str(d)] = (len(toks), sum(covered),
                          sum(t for t, c in zip(toks, covered) if not c))

    t = pa.table({
        "doc_id": pa.array([str(d) for d in range(len(docs))]),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(t).repartition(nblocks)
    hot = frequent_ngrams(ds, n=n, min_count=2, vocab_size=8)
    got = remove_dup_spans(ds, hot, n=n, vocab_size=8).to_pandas()
    assert len(got) == len(docs)
    for _, r in got.iterrows():
        n_tok, n_rm, kept_sum = expect[r["doc_id"]]
        assert r["n_tok"] == n_tok
        assert r["n_removed"] == n_rm
        assert r["n_kept"] == n_tok - n_rm
        assert r["kept_tok_sum"] == kept_sum


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.text(alphabet="abcde", min_size=1, max_size=3),
                       st.integers(min_value=0, max_value=10**12),
                       min_size=1, max_size=8),
       st.integers(min_value=0, max_value=10**9))
def test_temperature_budgets_invariants(sums, total):
    """α=0.5 budget law: Σ budgets ≤ total (floor division never
    over-allocates), zero-mass sources get zero, and sqrt damping never
    inverts the ordering of two sources' budgets."""
    import math

    from cardinalhq_otel_collector_ray.stages.packing import (
        temperature_budgets)
    b = temperature_budgets(sums, total)
    assert set(b) == set(sums)
    assert sum(b.values()) <= total
    sw = sum(math.isqrt(v) for v in sums.values())
    for k, n in sums.items():
        # exact definition check (covers the zero-mass → zero case)
        assert b[k] == ((total * math.isqrt(n)) // sw if sw else 0)
    ks = list(sums)
    for i in range(len(ks) - 1):
        a, c = ks[i], ks[i + 1]
        if sums[a] <= sums[c]:
            assert b[a] <= b[c]
        else:
            assert b[a] >= b[c]


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                          st.integers(min_value=1, max_value=50)),
                min_size=1, max_size=40),
       st.integers(min_value=0, max_value=800),
       st.integers(min_value=1, max_value=4))
def test_temperature_mix_matches_naive(ray_session, rows, total, nblocks):
    """End-to-end temperature_mix vs a naive single-process reference:
    derive sqrt-damped budgets, then keep docs per source in mulhash
    priority order while the exclusive cumsum is under budget —
    blocking-invariant."""
    import math

    import pandas as pd
    import ray.data

    from cardinalhq_otel_collector_ray.functions.hashing import mulhash
    from cardinalhq_otel_collector_ray.stages.packing import temperature_mix

    df = pd.DataFrame({
        "src": [r[0] for r in rows],
        "doc": np.arange(len(rows), dtype=np.int64),
        "n": np.array([r[1] for r in rows], dtype=np.int64),
    })
    sums = df.groupby("src")["n"].sum().to_dict()
    sw = sum(math.isqrt(int(v)) for v in sums.values())
    budgets = {k: (total * math.isqrt(int(v))) // sw if sw else 0
               for k, v in sums.items()}
    nd = df.assign(pri=mulhash(df["doc"].to_numpy(), salt=4242))
    nd = nd.sort_values(["src", "pri", "doc"], kind="mergesort")
    keep = []
    for src, g in nd.groupby("src", sort=False):
        spent = 0
        for _, r in g.iterrows():
            if spent < budgets[src]:
                keep.append(int(r["doc"]))
            spent += int(r["n"])
    got = (temperature_mix(ray.data.from_pandas(df,
                                                override_num_blocks=nblocks),
                           "src", "doc", "n", total=total,
                           num_partitions=2).to_pandas())
    got_docs = got["doc"].tolist() if len(got) else []
    assert sorted(got_docs) == sorted(keep)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b"]),
                          st.integers(min_value=0, max_value=5)),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=3))
def test_windowed_rank_matches_duckdb(ray_session, rows, k, nblocks):
    """rank / percent_rank / ntile(k) vs DuckDB on random tied data —
    the `rank` spec kind's exact-parity contract, across blockings."""
    import duckdb
    import pandas as pd
    import ray.data

    from cardinalhq_otel_collector_ray.stages.window import windowed_rank

    df = pd.DataFrame({
        "g": [r[0] for r in rows],
        "v": np.array([r[1] for r in rows], dtype=np.int64),
        "i": np.arange(len(rows), dtype=np.int64),
    })
    got = (windowed_rank(ray.data.from_pandas(df,
                                              override_num_blocks=nblocks),
                         ["g"], "v", "i", ntile=k, num_partitions=2)
           .to_pandas().sort_values("i").reset_index(drop=True))
    ref = duckdb.connect().execute(f"""
        SELECT i,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               percent_rank() OVER w AS pct,
               CAST(ntile({k}) OVER (PARTITION BY g ORDER BY v, i)
                    AS BIGINT) AS tile
        FROM df WINDOW w AS (PARTITION BY g ORDER BY v)
        ORDER BY i
    """).fetchdf()
    assert got["rnk"].tolist() == ref["rnk"].tolist()
    assert got["tile"].tolist() == ref["tile"].tolist()
    assert np.array_equal(got["pct"].to_numpy(), ref["pct"].to_numpy())
