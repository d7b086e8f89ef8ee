"""Line/paragraph-granular cleaning (stages/lineclean.py): naive-reference
fuzz for both operators, rewrap determinism, blocking invariance, and the
empty/short/unicode-block smoke cases (CLAUDE.md round-5 convention)."""

import numpy as np
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.lineclean import (
    c4_line_clean, paragraph_dedup_apply, paragraph_dedup_stats,
    rewrap_lines)

# ------------------------------------------------------------ naive models


def naive_rewrap(text, doc_id, base=3, mod=5):
    words = (text or "").split(" ")
    w = base + doc_id % mod
    return "\n".join(" ".join(words[i:i + w])
                     for i in range(0, len(words), w))


def naive_c4(docs, min_words=4, min_lines=2):
    out = {}
    for doc_id, text in docs:
        kept, seen = [], set()
        for idx, ln in enumerate((text or "").split("\n")):
            nw = ln.count(" ") + 1
            if nw < min_words or ln in seen:
                continue
            seen.add(ln)
            kept.append((idx, nw))
        if len(kept) >= min_lines:
            out[doc_id] = (len(kept), sum(n for _, n in kept),
                           sum(i + 1 for i, _ in kept))
    return out


def naive_c4_apply(docs, min_words=4, min_lines=2):
    out = {}
    for doc_id, text in docs:
        kept, seen = [], set()
        for ln in (text or "").split("\n"):
            if ln.count(" ") + 1 < min_words or ln in seen:
                continue
            seen.add(ln)
            kept.append(ln)
        if len(kept) >= min_lines:
            out[doc_id] = "\n".join(kept)
    return out


def naive_paragraph_apply(docs):
    seen, out = set(), {}
    for doc_id, text in sorted(docs):
        kept = []
        for ln in (text or "").split("\n"):
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        if kept:
            out[doc_id] = "\n".join(kept)
    return out


def naive_paragraph(docs):
    first = {}
    for doc_id, text in sorted(docs):
        for idx, ln in enumerate((text or "").split("\n")):
            if ln not in first:
                first[ln] = (doc_id, idx, ln.count(" ") + 1)
    out = {}
    for doc_id, idx, nw in first.values():
        c, w, s = out.get(doc_id, (0, 0, 0))
        out[doc_id] = (c + 1, w + nw, s + idx + 1)
    return out


def _stats_dict(ds):
    df = ds.to_pandas()
    return {int(r.doc_id): (int(r.kept_lines), int(r.kept_words),
                            int(r.kept_idx_sum))
            for r in df.itertuples()}


def _blocked(docs, cuts):
    """docs [(id, text)] split into blocks at the given cut indices."""
    tables, lo = [], 0
    for hi in list(cuts) + [len(docs)]:
        if hi > lo:
            tables.append(pa.table({
                "doc_id": pa.array([d for d, _ in docs[lo:hi]], pa.int64()),
                "text": pa.array([t for _, t in docs[lo:hi]])}))
            lo = hi
    return ray.data.from_arrow(tables)


def _rand_corpus(rng, n_docs, vocab):
    """Docs with planted intra-doc and cross-doc duplicate lines, short
    lines, empty lines, and occasional unicode words."""
    shared = [" ".join(rng.choice(vocab, size=rng.integers(1, 7)))
              for _ in range(4)]
    docs = []
    for d in range(n_docs):
        lines = []
        for _ in range(rng.integers(1, 8)):
            r = rng.random()
            if r < 0.25:
                lines.append(shared[rng.integers(len(shared))])
            elif r < 0.32:
                lines.append("")
            elif r < 0.40 and lines:
                lines.append(lines[rng.integers(len(lines))])  # intra-doc dup
            else:
                lines.append(" ".join(
                    rng.choice(vocab, size=rng.integers(1, 7))))
        docs.append((d, "\n".join(lines)))
    return docs


VOCAB = np.array(["alpha", "beta", "gamma", "delta", "épsilon", "ζeta",
                  "eta", "θ", "iota", "kappa"])


def test_c4_and_paragraph_match_naive_fuzz(ray_session):
    rng = np.random.default_rng(4207)
    for trial in range(6):
        docs = _rand_corpus(rng, n_docs=rng.integers(3, 25), vocab=VOCAB)
        cuts = sorted(rng.choice(len(docs), size=min(3, len(docs)),
                                 replace=False))
        ds = _blocked(docs, cuts)
        got = _stats_dict(c4_line_clean(ds, min_words=3, min_lines=2))
        exp = naive_c4(docs, min_words=3, min_lines=2)
        assert got == exp, f"c4 trial {trial}"
        ds = _blocked(docs, cuts)
        got = _stats_dict(paragraph_dedup_stats(ds, num_partitions=5,
                                                doc_partitions=3))
        assert got == naive_paragraph(docs), f"paragraph trial {trial}"


def test_c4_apply_matches_naive_fuzz(ray_session):
    from cardinalhq_otel_collector_ray.stages.lineclean import (
        c4_line_clean_apply)
    rng = np.random.default_rng(808)
    for trial in range(5):
        docs = _rand_corpus(rng, n_docs=rng.integers(3, 25), vocab=VOCAB)
        cuts = sorted(rng.choice(len(docs), size=min(3, len(docs)),
                                 replace=False))
        out = c4_line_clean_apply(_blocked(docs, cuts), min_words=3,
                                  min_lines=2).to_pandas()
        got = {int(r.doc_id): r.text for r in out.itertuples()}
        assert got == naive_c4_apply(docs, min_words=3, min_lines=2), \
            f"trial {trial}"


def test_paragraph_apply_matches_naive_fuzz(ray_session):
    rng = np.random.default_rng(515)
    for trial in range(5):
        docs = _rand_corpus(rng, n_docs=rng.integers(3, 25), vocab=VOCAB)
        cuts = sorted(rng.choice(len(docs), size=min(3, len(docs)),
                                 replace=False))
        ds = _blocked(docs, cuts)
        out = paragraph_dedup_apply(ds, num_partitions=5,
                                    doc_partitions=3).to_pandas()
        got = {int(r.doc_id): r.text for r in out.itertuples()}
        assert got == naive_paragraph_apply(docs), f"trial {trial}"


def test_paragraph_apply_consistent_with_stats(ray_session):
    """apply's surviving line counts == the stats form, doc for doc."""
    rng = np.random.default_rng(77)
    docs = _rand_corpus(rng, n_docs=15, vocab=VOCAB)
    applied = paragraph_dedup_apply(_blocked(docs, [5])).to_pandas()
    stats = _stats_dict(paragraph_dedup_stats(_blocked(docs, [5])))
    got = {int(r.doc_id): r.text.count("\n") + 1
           for r in applied.itertuples()}
    assert got == {d: s[0] for d, s in stats.items()}


def test_paragraph_blocking_invariance(ray_session):
    rng = np.random.default_rng(99)
    docs = _rand_corpus(rng, n_docs=20, vocab=VOCAB)
    a = _stats_dict(paragraph_dedup_stats(_blocked(docs, [7, 13])))
    b = _stats_dict(paragraph_dedup_stats(_blocked(docs, [1, 2, 3, 19])))
    assert a == b


def test_rewrap_matches_naive_and_roundtrips(ray_session):
    rng = np.random.default_rng(7)
    docs = [(int(i), " ".join(rng.choice(VOCAB, size=rng.integers(1, 30))))
            for i in range(40)] + [(40, ""), (41, "solo")]
    ds = rewrap_lines(_blocked(docs, [11, 40]), base=3, mod=5)
    got = {int(r.doc_id): r.text for r in ds.to_pandas().itertuples()}
    for doc_id, text in docs:
        assert got[doc_id] == naive_rewrap(text, doc_id), doc_id
        # round-trip: unwrapping restores the original word soup
        assert got[doc_id].replace("\n", " ") == text


def test_empty_short_unicode_isolated_blocks(ray_session):
    docs = [(1, "alpha beta gamma delta\nalpha beta gamma delta\nx"),
            (2, ""), (3, "θ µ ß 千 éé"), (4, "hi")]
    tables = [pa.table({"doc_id": pa.array([d], pa.int64()),
                        "text": pa.array([t])}) for d, t in docs]
    ds = ray.data.from_arrow(tables)
    got = _stats_dict(c4_line_clean(ds, min_words=2, min_lines=1))
    assert got == naive_c4(docs, min_words=2, min_lines=1)
    ds = ray.data.from_arrow(tables)
    got = _stats_dict(paragraph_dedup_stats(ds))
    assert got == naive_paragraph(docs)
    # rewrap over the degenerate blocks completes and keeps row count
    ds = ray.data.from_arrow(tables)
    assert rewrap_lines(ds).count() == 4


def test_line_cleaning_example_spec(ray_session, sf_dir):
    """Declarative chain rewrap_lines → line_clean compiles and matches
    the naive model over the real corpus."""
    import pyarrow.parquet as pq

    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    out = compile_pipeline(
        load_spec("/root/repo/examples/line_cleaning.yaml"), sf_dir)
    got = _stats_dict(out)
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    docs = [(int(d), naive_rewrap(x, int(d)))
            for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())]
    assert got == naive_c4(docs, min_words=4, min_lines=2)
    assert len(got) > 0


def test_paragraph_dedup_example_spec(ray_session, sf_dir):
    """Declarative normalize → rewrap → paragraph-dedup-apply chain
    matches the naive model (normalize is identity on this corpus, so
    the naive side is rewrap → first-occurrence removal)."""
    import pyarrow.parquet as pq

    from cardinalhq_otel_collector_ray.pipelines.spec import (
        compile_pipeline, load_spec)
    out = compile_pipeline(
        load_spec("/root/repo/examples/paragraph_dedup.yaml"), sf_dir) \
        .to_pandas()
    got = {int(r.doc_id): r.text for r in out.itertuples()}
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    docs = [(int(d), naive_rewrap(x, int(d)))
            for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())]
    assert got == naive_paragraph_apply(docs)
    assert len(got) > 0


def test_lineclean_duckdb_differential_fuzz(ray_session, tmp_path):
    """Differential fuzz of the REGISTERED query+oracle pairs on an
    adversarial corpus: word counts sit exactly at the wrap boundaries
    (1, w-1, w, w+1, 2w multiples) where an off-by-one in the
    `(pos-1) // w` line derivation would diverge from rewrap_lines.
    Runs the real _q_* callables against the real oracle_sql() strings
    over a synthetic documents.parquet."""
    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rng = np.random.default_rng(31415)
    rows = []
    words = np.array(["aa", "bb", "cc", "dd", "ee"])
    for i in range(60):
        doc_id = int(rng.integers(0, 100000))
        w = 3 + doc_id % 5
        n = int(rng.choice([1, w - 1, w, w + 1, 2 * w, 2 * w + 1,
                            int(rng.integers(1, 40))]))
        rows.append({"doc_id": doc_id,
                     "text": " ".join(rng.choice(words, size=n))})
    df = pd.DataFrame(rows).drop_duplicates("doc_id")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    for name in ("c4_line_clean", "paragraph_dedup",
                 "c4_line_clean_apply", "paragraph_dedup_apply"):
        got = qs[name](str(tmp_path)).to_pandas()
        want = con.execute(oracles[name]).df()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        want = want.astype(got.dtypes.to_dict())
        assert got.columns.sort_values().tolist() == \
            want.columns.sort_values().tolist(), name
        assert got[sorted(got.columns)].equals(
            want[sorted(want.columns)]), name


def test_null_text_treated_as_empty(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b c d\ne f g h", None])})
    ds = ray.data.from_arrow(t)
    got = _stats_dict(c4_line_clean(ds, min_words=2, min_lines=1))
    assert got == {1: (2, 8, 3)}
    ds = ray.data.from_arrow(t)
    got = _stats_dict(paragraph_dedup_stats(ds))
    assert got == {1: (2, 8, 3), 2: (1, 1, 1)}
