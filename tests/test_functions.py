"""Pure-kernel tests (no Ray needed beyond the session fixture)."""

import numpy as np
import pyarrow as pa

from cardinalhq_otel_collector_ray.functions.hashing import (
    combine_hash64, hashmod_keep, mulhash, poly_hash64, stable_str_hash64)
from cardinalhq_otel_collector_ray.functions.tags import (
    canonical_tagstring, split_sections)
from cardinalhq_otel_collector_ray.functions.text import (
    char_shingles_u64, map_words_to_ids, split_words)


def test_mulhash_matches_sql_semantics():
    ids = np.array([0, 1, 42, 10**6], dtype=np.int64)
    expect = [(i * 2654435761 + 12345) % 1_000_003 for i in ids]
    assert mulhash(ids).tolist() == expect


def test_hashmod_keep_fraction():
    ids = np.arange(100_000, dtype=np.int64)
    frac = hashmod_keep(ids, 10).mean()
    assert 0.08 < frac < 0.12


def test_stable_str_hash_deterministic():
    a = stable_str_hash64(["foo", "bar", "foo"])
    assert a[0] == a[2] and a[0] != a[1]
    # stability across calls (same process) and shape
    assert stable_str_hash64(["foo"])[0] == a[0]


def test_poly_hash_orders():
    m1 = np.array([[1, 2, 3]], dtype=np.int64)
    m2 = np.array([[3, 2, 1]], dtype=np.int64)
    assert poly_hash64(m1)[0] != poly_hash64(m2)[0]
    assert combine_hash64(np.array([1]), np.array([2]))[0] != \
           combine_hash64(np.array([2]), np.array([1]))[0]


def test_canonical_tagstring_order_insensitive():
    a = canonical_tagstring({"b": "2", "a": "1"})
    b = canonical_tagstring({"a": "1", "b": "2"})
    assert a == b


def test_split_sections():
    # aggregate.go:121-147 section prefixes
    tags = {"resource.host": "h1", "instrumentation.lib": "l",
            "metric.path": "/x", "metadata.metric.name": "m", "plain": "v"}
    s = split_sections(tags)
    assert s["resource"] == {"host": "h1"}
    assert s["scope"] == {"lib": "l"}
    assert s["metadata"] == {"metric.name": "m"}
    assert s["datapoint"] == {"path": "/x", "plain": "v"}


def test_split_words_and_map():
    col = pa.array(["a b c", "b b", ""])
    words = split_words(col)
    vocab = {"a": 0, "b": 1, "c": 2}
    toks = map_words_to_ids(words, vocab)
    assert toks.to_pylist()[:2] == [[0, 1, 2], [1, 1]]


def test_char_shingles():
    starts, codes = char_shingles_u64(["abcd", "ab", "abcde"], k=4)
    # doc0: 1 shingle, doc1: 0 (too short), doc2: 2
    assert starts.tolist() == [0, 1, 1, 3]
    assert len(codes) == 3
    assert codes[0] == codes[1]  # "abcd" shingle shared with doc2's first


def test_backoff_policy_reference_defaults():
    # notifier.go:416-425: exp backoff 1s -> 30s cap, jitter [0.5, 1.5)
    from cardinalhq_otel_collector_ray.state.manifest import backoff_delays
    assert backoff_delays(3) == [1.0, 2.0, 4.0]
    assert backoff_delays(7)[-1] == 30.0  # capped
    jittered = backoff_delays(3, jitter=lambda: 0.5)
    assert jittered == [0.5, 1.0, 2.0]


def test_interval_floor_enforced():
    import pytest
    import ray.data
    import pyarrow as pa
    from cardinalhq_otel_collector_ray.stages.aggregate import interval_aggregate
    ds = ray.data.from_arrow(pa.table({"k": ["a"], "ts": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="1000"):
        interval_aggregate(ds, ts_col="ts", interval_ms=500, keys=["k"],
                           value_col="v")


def test_tokenizer_unknown_word_gets_unk():
    from cardinalhq_otel_collector_ray.functions.text import (
        map_words_to_ids, split_words)
    words = split_words(pa.array(["known mystery"]))
    toks = map_words_to_ids(words, {"known": 7})
    assert toks.to_pylist() == [[7, -1]]  # unk id = -1


def test_jsonl_marshal_deterministic():
    from cardinalhq_otel_collector_ray.sinks.serializers import marshal_jsonl
    t = pa.table({"b": [1, 2], "a": ["x", "y"]})
    out1, out2 = marshal_jsonl(t), marshal_jsonl(t)
    assert out1 == out2
    assert out1.decode().splitlines()[0] == '{"a": "x", "b": 1}'  # sorted keys


def test_redact_pii_masks_and_order():
    import pandas as pd
    import ray.data
    from cardinalhq_otel_collector_ray.stages.transform import redact_pii
    df = pd.DataFrame({"t": [
        "mail me at jane.doe+x@corp.example.org now",
        "server 10.0.255.7 answered",
        "call +1 415-555-0199 today",
        "order 123456789 shipped",
        "clean text stays clean",
        "combo a@b.co from 192.168.0.1 ref 99887766",
    ]})
    out = redact_pii(ray.data.from_pandas(df), "t").to_pandas()["t"].tolist()
    assert out[0] == "mail me at <EMAIL> now"
    assert out[1] == "server <IP> answered"
    assert out[2] == "call <PHONE> today"
    assert out[3] == "order <NUM> shipped"
    assert out[4] == "clean text stays clean"
    # ip masked as IP (not eaten by the digit mask), email first
    assert out[5] == "combo <EMAIL> from <IP> ref <NUM>"


def test_round6_matches_duckdb_half_away():
    """round6 = SQL round(x, 6): half AWAY from zero. numpy/python round
    are half-to-even and diverge on .5-ulp ties — the observed case is
    jaccard 125/128 = 0.9765625 (sf0.1 parity failure before the fix)."""
    import duckdb
    import numpy as np

    from cardinalhq_otel_collector_ray.functions.hashing import round6

    assert round6(125 / 128) == 0.976563          # numpy gives 0.976562
    assert round6(-125 / 128) == -0.976563
    assert round6(0.0) == 0.0
    vals = [125/128, -125/128, 0.1234565, 1/3, 2/3, 0.9999995, 1e-7,
            123456.1234575, -0.0000005]
    got = round6(np.asarray(vals))
    con = duckdb.connect()
    for v, g in zip(vals, got):
        sql = con.execute("SELECT round(CAST(? AS DOUBLE), 6)", [v]).fetchone()[0]
        assert g == sql, (v, g, sql)


def test_to_cents_round_units_match_duckdb():
    """to_cents/round_units == DuckDB CAST(round(...) AS BIGINT), including
    the confirmed floor(+0.5) counterexample: v*100 = 0.49999999999999994
    (naive |a|+0.5 rounds UP to 1.0 in float64; std::round gives 0)."""
    import duckdb
    import numpy as np

    from cardinalhq_otel_collector_ray.functions.hashing import (
        round_units, to_cents)
    con = duckdb.connect()
    vals = [0.004999999999999999, -0.004999999999999999, 0.005, -0.005,
            0.125, -0.125, 1234.565, -1234.565, 0.0, 19.999999999999996,
            7.105, 42.0, -0.004999999999999999 * 3]
    got = to_cents(np.asarray(vals))
    for v, g in zip(vals, got):
        sql = con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE) * 100) AS BIGINT)",
            [v]).fetchone()[0]
        assert g == sql, ("cents", v, g, sql)
    qvals = [0.49999999999999994, 0.5, -0.5, 2.5, -2.5, 3.0, 49.5]
    gq = round_units(np.asarray(qvals))
    for v, g in zip(qvals, gq):
        sql = con.execute("SELECT CAST(round(CAST(? AS DOUBLE)) AS BIGINT)",
                          [v]).fetchone()[0]
        assert g == sql, ("units", v, g, sql)


def test_normalize_text_column_matches_naive_and_duckdb():
    """CCNet canonicalization: Arrow kernel chain == a unicodedata naive
    reference on accents/case/digits/whitespace, and == DuckDB's
    strip_accents/lower/regexp chain (the oracle form) on every case
    DuckDB's accent model covers."""
    import unicodedata

    import duckdb
    import pyarrow as pa

    from cardinalhq_otel_collector_ray.functions.text import \
        normalize_text_column

    def naive(t):
        if t is None:
            return None
        t = "".join(c for c in unicodedata.normalize("NFKD", t)
                    if unicodedata.category(c) != "Mn")
        t = t.lower()
        t = "".join("0" if c.isdigit() and ord(c) < 128 else c for c in t)
        import re
        return re.sub(r"\s+", " ", t).strip()

    cases = ["Héllo  WORLD 123", "Ångström  über café", "naïve\t\ttabs",
             "  lead trail  ", "MiXeD CaSe 2024 Q3", "", None,
             "a1b2c3", "éé ÉÉ ee"]
    got = normalize_text_column(pa.array(cases)).to_pylist()
    assert got == [naive(c) for c in cases]

    con = duckdb.connect()
    for c in cases:
        if c is None:
            continue
        sql = con.execute(
            "SELECT trim(regexp_replace(regexp_replace(lower("
            "strip_accents(CAST(? AS VARCHAR))), '[0-9]', '0', 'g'),"
            " '\\s+', ' ', 'g'))", [c]).fetchone()[0]
        g = normalize_text_column(pa.array([c])).to_pylist()[0]
        assert g == sql, (c, g, sql)
