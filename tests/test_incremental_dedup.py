"""dedup_against_history guarantee tests: cross-run duplicates are
suppressed, within-increment duplicates collapse to the min id, and the
result is independent of how rows are batched on either side.
"""

import numpy as np
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.dedup import (
    dedup_against_history, neardup_against_history)


def _ds(rows, parts=3):
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    t = pa.table({"id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return ray.data.from_arrow(t).repartition(parts)


def _run(new_rows, hist_rows, **kw):
    out = dedup_against_history(_ds(new_rows), _ds(hist_rows),
                                "text", "id", **kw).to_pandas()
    return dict(zip(out["keep_id"], out["n_copies"]))


def test_history_hits_suppressed_and_min_id_kept():
    new = [(10, "aa"), (11, "bb"), (12, "aa"), (13, "cc"), (14, "bb")]
    hist = [(1, "bb"), (2, "zz")]
    got = _run(new, hist)
    # "bb" is in history -> gone; "aa" keeps id 10 (2 copies); "cc" id 13
    assert got == {10: 2, 13: 1}


def test_history_only_contents_do_not_appear():
    got = _run([(5, "x")], [(1, "y"), (2, "y"), (3, "w")])
    assert got == {5: 1}


def test_empty_history_degenerates_to_exact_dedup_stats():
    new = [(3, "p"), (1, "p"), (2, "q")]
    got = _run(new, [])
    assert got == {1: 2, 2: 1}


def test_neardup_history_flags_planted_pairs():
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base[:-1] + "!"          # one-char edit: shingle Jaccard ≈ 0.9
    far = "completely different content with no shared shingles at all xyz"
    new = [(100, near), (101, far), (102, base)]   # 102 is an exact dup
    hist = [(1, base)]
    out = neardup_against_history(_ds(new), _ds(hist), "text", "id",
                                  threshold=0.8, max_bucket=100).to_pandas()
    got = dict(zip(out["id"], out["max_jaccard"]))
    assert set(got) == {100, 102}
    assert got[102] == 1.0
    assert 0.8 <= got[100] < 1.0
    # within-new exact dup (100 vs 102 share most shingles) must NOT
    # appear as a history flag for a doc with no history match
    assert 101 not in got


def test_batching_invariance():
    rng = np.random.default_rng(11)
    texts = [f"doc-{i % 17}" for i in range(60)]
    new = list(zip(range(100, 160), texts))
    hist = [(int(i), f"doc-{int(i) % 7}") for i in rng.integers(0, 50, 20)]
    a = _run(new, hist)
    # different partitioning on both sides must not change the answer
    out_b = dedup_against_history(_ds(new, parts=1), _ds(hist, parts=5),
                                  "text", "id", num_partitions=8,
                                  coalesce_partials=True).to_pandas()
    b = dict(zip(out_b["keep_id"], out_b["n_copies"]))
    assert a == b
    kept_contents = {f"doc-{k}" for k in range(7, 17)}
    assert len(a) == len(kept_contents)


def test_null_contents_excluded_both_sides():
    """NULL contract: null contents never appear in the output and a null
    in history does NOT suppress anything (SQL equality semantics — the
    Arrow group_by null-as-key behavior is filtered out up front)."""
    new = [(10, "aa"), (11, None), (12, None), (13, "bb")]
    hist = [(1, None), (2, "bb")]
    out = _run(new, hist)
    assert out == {10: 1}  # 'aa' kept; nulls excluded; 'bb' in history
