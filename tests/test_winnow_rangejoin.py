"""Winnowing fingerprints (MOSS guarantee, naive equivalence) and the
bucketed interval join (vs pandas reference)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.join import interval_join
from cardinalhq_otel_collector_ray.stages.textstats import winnow_fingerprints


def _fps(texts, k=5, w=8):
    t = pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    out = winnow_fingerprints(ray.data.from_arrow(t), "text", "doc_id",
                              k=k, w=w).to_pandas()
    return {d: set(g["fp"]) for d, g in out.groupby("id")}


def _naive_winnow(text, k=5, w=8):
    data = text.encode()
    codes = []
    for i in range(len(data) - k + 1):
        c = np.uint64(0)
        with np.errstate(over="ignore"):
            for b in data[i:i + k]:
                c = c * np.uint64(1099511628211) + np.uint64(b)
        codes.append(int(c))
    if not codes:
        return set()
    if len(codes) < w:
        return {int(np.int64(np.uint64(min(codes))))}
    sel = set()
    for j in range(len(codes) - w + 1):
        sel.add(min(codes[j:j + w]))
    return {int(np.int64(np.uint64(v))) for v in sel}


def test_winnow_matches_naive():
    texts = ["the quick brown fox jumps over the lazy dog",
             "short", "", "aaaaaaaaaaaaaaaaaaaa",
             "pack my box with five dozen liquor jugs"]
    got = _fps(texts)
    for i, t in enumerate(texts):
        expect = _naive_winnow(t)
        assert got.get(i, set()) == expect, f"doc {i}"


def test_winnow_shared_substring_guarantee():
    # docs sharing a substring of length >= w + k - 1 = 12 share >= 1 fp
    shared = "zxqwvunmlkjihg"  # 14 chars
    a = "prefix text then " + shared + " and a tail here"
    b = "completely different opener " + shared + " other ending"
    c = "no overlap with the others at all, nothing shared"
    got = _fps([a, b, c])
    assert got[0] & got[1], "shared substring must share a fingerprint"
    assert not (got[0] & got[2])


def test_interval_join_matches_pandas():
    rng = np.random.Generator(np.random.PCG64(9))
    pts = pd.DataFrame({
        "pid": np.arange(2000, dtype=np.int64),
        "ts": rng.integers(0, 100_000, 2000).astype(np.int64),
    })
    n_iv = 40
    s = rng.integers(0, 95_000, n_iv).astype(np.int64)
    iv = pd.DataFrame({"iv_id": np.arange(n_iv, dtype=np.int64),
                       "lo": s, "hi": s + rng.integers(100, 20_000, n_iv)})
    got = interval_join(ray.data.from_pandas(pts).repartition(4),
                        ray.data.from_pandas(iv).repartition(2),
                        ts_col="ts", start_col="lo", end_col="hi",
                        bucket_width=8192).to_pandas()
    expect = pts.merge(iv, how="cross")
    expect = expect[(expect["ts"] >= expect["lo"]) & (expect["ts"] < expect["hi"])]
    key = lambda df: sorted(zip(df["pid"], df["iv_id"]))
    assert key(got) == key(expect)
    # no duplicate pairs despite interval replication
    assert len(got) == len(set(zip(got["pid"], got["iv_id"])))


def test_interval_join_column_collision_suffix():
    pts = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                        "ts": np.arange(10, dtype=np.int64) * 10})
    iv = pd.DataFrame({"id": np.array([0], dtype=np.int64),
                       "lo": np.array([0], dtype=np.int64),
                       "hi": np.array([1000], dtype=np.int64)})
    got = interval_join(ray.data.from_pandas(pts), ray.data.from_pandas(iv),
                        ts_col="ts", start_col="lo", end_col="hi",
                        bucket_width=64).to_pandas()
    assert "id_r" in got.columns and len(got) == 10


def test_windowed_rank_matches_duckdb_edges():
    """Ties, single-row groups and uneven ntile splits vs DuckDB."""
    import duckdb
    from cardinalhq_otel_collector_ray.stages.window import windowed_rank
    df = pd.DataFrame({
        "id": np.arange(13, dtype=np.int64),
        "g": ["a"] * 7 + ["b"] * 5 + ["c"],          # c: single-row group
        "v": np.array([5, 5, 5, 1, 2, 2, 9,          # a: heavy ties
                       3, 3, 3, 3, 3,                # b: all equal
                       42], dtype=np.int64),
    })
    got = (windowed_rank(ray.data.from_pandas(df).repartition(3),
                         keys=["g"], value_col="v", tiebreak_col="id",
                         ntile=4, num_partitions=4)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = duckdb.query_df(df, "t", """
        SELECT id,
               CAST(rank() OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS rnk,
               percent_rank() OVER (PARTITION BY g ORDER BY v) AS pct,
               CAST(ntile(4) OVER (PARTITION BY g ORDER BY v, id) AS BIGINT) AS tile
        FROM t ORDER BY id""").to_df()
    for c in ("rnk", "pct", "tile"):
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)
