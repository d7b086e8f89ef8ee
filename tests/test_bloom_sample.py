"""Bloom semi-join machinery + deterministic samplers."""

import numpy as np
import pandas as pd
import ray.data

from cardinalhq_otel_collector_ray.stages.join import (
    bloom_prefilter, bloom_semi_join, build_bloom_filter,
    partitioned_semi_join)
from cardinalhq_otel_collector_ray.stages.sample import (
    priority_sample, stratified_sample)


def _sides(n_left=5000, n_keys=200, seed=4):
    rng = np.random.Generator(np.random.PCG64(seed))
    left = pd.DataFrame({
        "k": rng.integers(0, 10_000, n_left).astype(np.int64),
        "v": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({"k": rng.choice(10_000, n_keys, replace=False)
                          .astype(np.int64)})
    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(3)
    return left, right, lds, rds


def test_bloom_no_false_negatives_and_prunes():
    left, right, lds, rds = _sides()
    bm = build_bloom_filter(rds, "k", num_bits=1 << 16)
    surv = bloom_prefilter(lds, "k", bm).to_pandas()
    truth = left[left["k"].isin(set(right["k"]))]
    # every true match survives the prefilter
    assert set(truth["v"]).issubset(set(surv["v"]))
    # and the filter actually prunes most non-matching rows
    assert len(surv) < 0.2 * len(left)


def test_bloom_semi_join_exact():
    left, right, lds, rds = _sides()
    got = bloom_semi_join(lds, rds, "k", num_bits=1 << 14).to_pandas()
    truth = left[left["k"].isin(set(right["k"]))]
    assert sorted(got["v"]) == sorted(truth["v"])


def test_partitioned_semi_and_anti_partition_the_input():
    left, right, lds, rds = _sides()
    semi = partitioned_semi_join(lds, rds, "k").to_pandas()
    anti = partitioned_semi_join(lds, rds, "k", anti=True).to_pandas()
    assert len(semi) + len(anti) == len(left)
    truth = left[left["k"].isin(set(right["k"]))]
    assert sorted(semi["v"]) == sorted(truth["v"])


def test_priority_sample_exact_bottom_k():
    n = 4000
    df = pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                       "x": np.arange(n, dtype=np.int64) * 3})
    ds = ray.data.from_pandas(df).repartition(5)
    out = priority_sample(ds, "rid", 100, salt=777)
    assert len(out) == 100
    pri = (df["rid"].to_numpy() * 2654435761 + 777) % 1_000_003
    expect = df.assign(pri=pri).sort_values(["pri", "rid"]).head(100)
    assert list(out["rid"]) == list(expect["rid"])


def test_stratified_sample_per_key_counts():
    n = 6000
    df = pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "g": np.array(["a", "b", "c"])[np.arange(n) % 3],
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = stratified_sample(ds, key="g", id_col="rid", k=40,
                            num_partitions=8).to_pandas()
    assert out.groupby("g").size().to_dict() == {"a": 40, "b": 40, "c": 40}
    # per-stratum bottom-k by the documented priority
    pri = (df["rid"].to_numpy() * 2654435761 + 777) % 1_000_003
    expect = (df.assign(pri=pri).sort_values(["g", "pri", "rid"])
              .groupby("g").head(40))
    assert sorted(out["rid"]) == sorted(expect["rid"])


def test_bloom_anti_join_exact():
    import numpy as np
    import pandas as pd
    import ray.data

    from cardinalhq_otel_collector_ray.stages.join import (bloom_anti_join,
                                                           partitioned_semi_join)
    rng = np.random.default_rng(12)
    left = pd.DataFrame({"k": rng.integers(0, 10_000, 5000).astype(np.int64),
                         "v": np.arange(5000, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.integers(0, 500, 800).astype(np.int64)})
    lds = ray.data.from_pandas(left, override_num_blocks=4)
    rds = ray.data.from_pandas(right, override_num_blocks=2)
    got = (bloom_anti_join(lds, rds, on="k")
           .to_pandas().sort_values("v").reset_index(drop=True))
    exp = (partitioned_semi_join(
        ray.data.from_pandas(left, override_num_blocks=4),
        ray.data.from_pandas(right, override_num_blocks=2), on="k",
        anti=True).to_pandas().sort_values("v").reset_index(drop=True))
    assert got[["k", "v"]].equals(exp[["k", "v"]])
