"""Deterministic samplers and drop-rule filters.

Covers the enforcement vocabulary of the reference's per-vendor pipelines
(``docs/flow/flow.dot:27-104``): ``filterprocessor`` OTTL drop rules and
``probabilisticsamplerprocessor`` hash-based %-sampling
(``distribution/components.go:125,137``) — made reproducible by hashing a
stable id column instead of randomizing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import SALT, hashmod_keep, mulhash, round6


def probabilistic_sample(ds: ray.data.Dataset, id_column: str, percent: int,
                         salt: int = 12345) -> ray.data.Dataset:
    """Keep ~percent% of rows, deterministically by id hash.
    SQL-equivalent predicate: ``(id * 2654435761 + salt) % 1000 < percent*10``."""
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(hashmod_keep(ids, percent, salt=salt)))
    return ds.map_batches(fn, batch_format="pyarrow")


def priority_sample(ds: ray.data.Dataset, id_col: str, k: int,
                    salt: int = 777, mod: int = 1_000_003,
                    pri_col: str = "pri"):
    """Deterministic distributed "reservoir" sample: exactly k rows, the
    global bottom-k by hashed priority ``(id*2654435761+salt) % mod`` with
    ``id`` as tie-break.

    Equivalent to uniform reservoir sampling but reproducible and
    merge-friendly: each block keeps only its local bottom-k, the driver
    merges <= k x blocks candidates (the ``distributed_top_k`` shape — no
    full materialization). SQL-equivalent: ``ORDER BY pri, id LIMIT k``.
    Returns a pandas DataFrame (k rows, driver-sized by construction).
    """
    from .aggregate import distributed_top_k

    def add_pri(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            pri_col, pa.array(mulhash(ids, salt=salt, mod=mod)))

    with_pri = ds.map_batches(add_pri, batch_format="pyarrow")
    return distributed_top_k(with_pri, k, by=[pri_col, id_col],
                             ascending=[True, True])


def stratified_sample(ds: ray.data.Dataset, key: str, id_col: str, k: int,
                      salt: int = 777, mod: int = 1_000_003,
                      pri_col: str = "pri",
                      num_partitions: int = 64) -> ray.data.Dataset:
    """Per-stratum deterministic sample: the bottom-k rows of EACH ``key``
    value by hashed priority. Two-phase: per-block per-key prune to k (so
    at most k x blocks rows per key move), then one hash-partitioned merge
    (bounded Python dispatch, all rows of a key in one partition).
    SQL-equivalent: ``QUALIFY row_number() OVER (PARTITION BY key
    ORDER BY pri, id) <= k``. Stays a streaming Dataset.
    """
    import pandas as pd

    from .temporal import partitioned_apply

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        df = df.assign(**{pri_col: mulhash(ids, salt=salt, mod=mod)})
        df = df.sort_values([key, pri_col, id_col], kind="mergesort")
        return df.groupby(key, sort=False).head(k)

    pruned = ds.map_batches(prune, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, pri_col, id_col], kind="mergesort")
        return df.groupby(key, sort=False).head(k)

    return partitioned_apply(pruned, [key], merge,
                             num_partitions=num_partitions)


def drop_where(ds: ray.data.Dataset, predicate) -> ray.data.Dataset:
    """filterprocessor drop rule: remove rows where ``predicate(batch)`` is
    true (vectorized bool mask, Arrow kernels)."""
    def fn(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
            mask = pa.array(np.asarray(mask, dtype=bool))
        # NULL predicate result (e.g. pc.equal against a null cell) means
        # "did not match the drop rule" — keep the row. Without fill_null
        # Arrow's filter drops null-mask rows, silently deleting them.
        return batch.filter(pc.fill_null(pc.invert(mask), True))
    return ds.map_batches(fn, batch_format="pyarrow")


def weighted_priority_sample(ds: ray.data.Dataset, id_col: str,
                             weight_col: str, k: int,
                             salt: int = SALT) -> "ray.data.Dataset":
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis): each row gets priority ``ln(u) / w`` with
    ``u = (mulhash(id)+0.5)/MOD`` — a pure function of the id, so
    retries/resumes select the same rows — and the k largest priorities
    win (equivalent to the classical ``u^(1/w)`` keys; heavier rows are
    proportionally likelier). Per-block top-k prune, then a k×blocks
    driver merge (`distributed_top_k`). SQL reproduces the identical
    doubles with the same expression."""
    import pandas as pd

    from ..functions.hashing import MOD
    from .aggregate import distributed_top_k

    def add_pri(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy().astype(np.int64)
        w = df[weight_col].to_numpy().astype(np.float64)
        u = (mulhash(ids, salt=salt).astype(np.float64) + 0.5) / MOD
        return df.assign(pri=np.log(u) / w)

    top = distributed_top_k(ds.map_batches(add_pri, batch_format="pandas"),
                            k, by=["pri", id_col], ascending=[False, True])
    top = top.reset_index(drop=True)
    top["pri"] = round6(top["pri"].to_numpy())
    return top


# --------------------------------------------------------------------------
# tail-sampling policy vocabulary (tailsamplingprocessor analog)
# --------------------------------------------------------------------------
# The reference's tailsamplingprocessor (distribution/components.go:145)
# decides keep/drop per TRACE from trace-level observations via a policy
# vocabulary: status_code / latency / numeric_attribute / string_attribute
# / probabilistic / rate_limiting, combined with `and` and ordered
# `composite` (each sub-policy with an allocated rate share). This is that
# vocabulary, made deterministic: probabilistic → the engine-wide hash-mod
# rule; rate_limiting → per-time-bucket hash-ranked top-N (a true N-per-
# second cap, reproducible across retries and SQL-oracle-able via
# row_number()).
#
# A policy is a pure vectorized predicate over the TRACE-LEVEL table
# (one row per decision key — built upstream by a distributed aggregate):
# ``policy(df: pandas.DataFrame) -> np.ndarray[bool]``. Policies never see
# raw spans, so policy evaluation is per-partition work over the (much
# smaller) trace table; the keep set then semi-joins back onto the span
# stream exactly like the single-policy ``tail_sampling`` path.

def policy_attr(col: str, op: str, value):
    """numeric_attribute / string_attribute / status_code / latency
    policies: a single vectorized comparison on a trace-level column."""
    import operator
    ops = {"==": operator.eq, "!=": operator.ne, ">=": operator.ge,
           "<=": operator.le, ">": operator.gt, "<": operator.lt}
    if op not in ops:
        raise ValueError(f"unknown policy op {op!r}; known: {sorted(ops)}")
    f = ops[op]

    def p(df) -> np.ndarray:
        return np.asarray(f(df[col].to_numpy(), value), dtype=bool)
    return p


def policy_hash_sample(key_col: str, per_mille: int, salt: int = SALT):
    """probabilistic policy, deterministic: keep when
    ``(key * 2654435761 + salt) % 1000 < per_mille``."""
    def p(df) -> np.ndarray:
        ids = df[key_col].to_numpy().astype(np.int64)
        return mulhash(ids, salt=salt, mod=1000) < per_mille
    return p


def policy_and(*policies):
    """`and` policy: every sub-policy must match (components.go:145
    andpolicy)."""
    def p(df) -> np.ndarray:
        m = policies[0](df)
        for q in policies[1:]:
            m = m & q(df)
        return m
    return p


def policy_or(*policies):
    def p(df) -> np.ndarray:
        m = policies[0](df)
        for q in policies[1:]:
            m = m | q(df)
        return m
    return p


def policy_not(policy):
    def p(df) -> np.ndarray:
        return ~policy(df)
    return p


def apply_composite_policies(traces: ray.data.Dataset,
                             policies: list[tuple],
                             *, key_col: str, bucket_col: str,
                             salt: int = 777, mod: int = 1_000_003,
                             num_partitions: int = 32) -> ray.data.Dataset:
    """Ordered `composite` policy over a trace-level Dataset.

    ``policies``: list of ``(name, policy, budget)`` evaluated IN ORDER —
    a trace is claimed by the FIRST matching policy. ``budget=None`` ⇒
    unlimited; an integer ⇒ at most ``budget`` claims per ``bucket_col``
    value (the rate_limiting allocation), chosen deterministically as the
    lowest-N eligible traces by ``(mulhash(key), key)``; traces over
    budget FALL THROUGH to later policies (the composite rate-share
    semantics). Returns kept rows with a ``policy`` label column.

    Distribution: hash-partitioned on ``bucket_col`` so each bucket's
    rank is computed whole; per-partition work is pure vectorized pandas
    (cumsum budget accounting, no per-trace Python).

    SQL-oracle shape per policy i with budget B:
    ``row_number() OVER (PARTITION BY bucket ORDER BY pri, key) <= B``
    over the rows not claimed by policies 0..i-1.
    """
    from .temporal import partitioned_apply

    def kernel(df: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        ids = df[key_col].to_numpy().astype(np.int64)
        df = df.assign(_pri=mulhash(ids, salt=salt, mod=mod))
        df = df.sort_values([bucket_col, "_pri", key_col], kind="mergesort")
        df = df.reset_index(drop=True)
        claimed = np.zeros(len(df), dtype=bool)
        label = np.full(len(df), "", dtype=object)
        for name, policy, budget in policies:
            eligible = np.asarray(policy(df), dtype=bool) & ~claimed
            if budget is not None:
                # rank eligible rows within their bucket (df is sorted by
                # (bucket, pri, key) → cumsum of the eligibility mask IS
                # the hash-rank) and claim only the first ``budget``
                rank = (pd.Series(eligible.astype(np.int64))
                        .groupby(df[bucket_col].to_numpy(), sort=False)
                        .cumsum().to_numpy())
                eligible &= rank <= budget
            claimed |= eligible
            label[eligible] = name
        out = df[claimed].drop(columns=["_pri"])
        return out.assign(policy=label[claimed])

    return partitioned_apply(traces, [bucket_col], kernel,
                             num_partitions=num_partitions)
