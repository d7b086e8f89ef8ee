"""Drain template mining — golden-clustering tests (the drainprocessor
analog, distribution/components.go:124; algorithm per He et al. 2017)."""

import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.drain import (
    WILDCARD, DrainMiner, drain_templates)


def test_digit_tokens_merge_into_wildcard_template():
    m = DrainMiner(sim_threshold=0.5)
    m.add("connected to 10.0.0.1 port 8080".split())
    m.add("connected to 10.0.0.2 port 9090".split())
    t = m.templates()
    assert t == [(f"connected to {WILDCARD} port {WILDCARD}", 2)]


def test_different_token_counts_never_merge():
    m = DrainMiner(sim_threshold=0.0)  # even at zero threshold
    m.add("a b c".split())
    m.add("a b c d".split())
    assert len(m.templates()) == 2


def test_below_threshold_spawns_new_cluster():
    # same routed prefix (depth-2 = 2 token levels: "user login"), so the
    # leaf similarity decides: 2/3 ≥ 0.3 merges, 2/3 < 0.8 splits
    m = DrainMiner(sim_threshold=0.8)
    m.add("user login ok".split())
    m.add("user login fail".split())
    assert len(m.templates()) == 2
    m2 = DrainMiner(sim_threshold=0.3)
    m2.add("user login ok".split())
    m2.add("user login fail".split())
    assert m2.templates() == [(f"user login {WILDCARD}", 2)]


def test_max_children_branch_falls_back_to_wildcard():
    m = DrainMiner(sim_threshold=0.5, max_children=2)
    for w in ("alpha", "beta", "gamma", "delta"):
        m.add(f"{w} second third".split())
    # first two words got their own branches; the rest routed via <*> and
    # merged there (same suffix, similarity 2/3 ≥ 0.5)
    t = dict(m.templates())
    assert sum(t.values()) == 4
    assert f"{WILDCARD} second third" in t and t[f"{WILDCARD} second third"] == 2


def test_wildcard_positions_do_not_count_toward_similarity():
    m = DrainMiner(sim_threshold=0.6)
    m.add("job 1 done".split())
    m.add("job 2 done".split())   # template now: job <*> done
    # "job 3 stop" routes to the SAME leaf (job, <*>); only "job" counts
    # (the wildcard position is excluded) → sim 1/3 < 0.6 → new cluster
    m.add("job 3 stop".split())
    t = dict(m.templates())
    # the new cluster keeps its raw first line (wildcards only appear on merge)
    assert t == {f"job {WILDCARD} done": 2, "job 3 stop": 1}


def test_drain_templates_distributed_counts_sum(ray_session, sf_dir):
    """Integration over the documents table: every log lands in exactly
    one cluster, so template counts sum to the corpus row count."""
    import pyarrow.parquet as pq
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    n_rows = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    out = drain_templates(ds, "text", "doc_id", num_partitions=4).to_pandas()
    assert out["n_logs"].sum() == n_rows
    assert (out["n_logs"] > 0).all()
    assert out["template"].is_unique


def test_drain_templates_deterministic(ray_session):
    rows = [f"evt {i % 3} code {i}" for i in range(60)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [f"d{i:03d}" for i in range(60)], "text": rows}))
    a = drain_templates(ds, "text", "doc_id", num_partitions=4).to_pandas() \
        .sort_values("template").reset_index(drop=True)
    b = drain_templates(ds, "text", "doc_id", num_partitions=4).to_pandas() \
        .sort_values("template").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)
    assert a["n_logs"].sum() == 60
