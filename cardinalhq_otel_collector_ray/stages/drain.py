"""Drain-style log template mining — the drainprocessor analog.

The reference distribution ships ``drainprocessor`` (CardinalHQ
fingerprinting, ``distribution/components.go:124``). The cheap hot-path
analog here is the token-prefix fingerprint (``stages/textstats.py``);
this module is the honest TEMPLATE-MINING analog: the fixed-depth prefix
tree of the public Drain algorithm (He et al., ICSE 2017 — "Drain: An
Online Log Parsing Approach with Fixed Depth Tree"):

- route by token COUNT, then the first ``depth`` tokens (a token
  containing digits routes through the ``<*>`` wildcard child; a full
  branch falls back to ``<*>`` — ``max_children`` guard),
- at the leaf, match against existing clusters by the fraction of equal
  tokens (wildcards don't count as matches in the similarity but do match
  positions); similarity ≥ ``sim_threshold`` merges (differing positions
  become ``<*>``), otherwise a new cluster is born.

Distribution shape: mining is inherently sequential per state, so state
lives per PARTITION (stateful kernel inside one ``map_groups`` call per
hash partition — the ``partitioned_apply`` contract), and per-partition
templates merge globally by exact template string (a C++ group_by sum).
Rows are sorted (by the id column) before mining so the result is
deterministic for a given partition count. Python-per-row cost is the
nature of the algorithm (the reference processor is per-record too); the
vectorized fingerprint stays the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

WILDCARD = "<*>"


def _has_digit(tok: str) -> bool:
    return any(c.isdigit() for c in tok)


class DrainMiner:
    """One Drain tree (single-threaded state; one per partition kernel)."""

    def __init__(self, depth: int = 4, sim_threshold: float = 0.5,
                 max_children: int = 100):
        self.depth = depth
        self.st = sim_threshold
        self.max_children = max_children
        self.root: dict = {}          # token-count → first-token tree
        self.clusters: list[list] = []  # [template_tokens, count]

    # -- tree walk -------------------------------------------------------
    def _leaf(self, tokens: list[str]) -> list:
        node = self.root.setdefault(len(tokens), {})
        # canonical Drain depth counts the root and leaf layers, so the
        # number of token-routing levels is depth - 2 (He et al. §III.B)
        for d in range(min(self.depth - 2, len(tokens))):
            tok = tokens[d]
            if _has_digit(tok):
                tok = WILDCARD
            children = node.setdefault("children", {})
            if tok not in children:
                if tok != WILDCARD and len(children) >= self.max_children:
                    tok = WILDCARD  # full branch → wildcard fallback
                children.setdefault(tok, {})
            node = children[tok]
        return node.setdefault("clusters", [])

    @staticmethod
    def _similarity(template: list[str], tokens: list[str]) -> float:
        same = sum(1 for t, x in zip(template, tokens)
                   if t == x and t != WILDCARD)
        return same / max(len(tokens), 1)

    def add(self, tokens: list[str]) -> int:
        """Route one log line; returns the cluster's index in this miner."""
        leaf = self._leaf(tokens)
        best, best_sim = None, -1.0
        for cl in leaf:
            sim = self._similarity(cl[0], tokens)
            if sim > best_sim:
                best, best_sim = cl, sim
        if best is not None and best_sim >= self.st:
            best[0] = [t if t == x else WILDCARD
                       for t, x in zip(best[0], tokens)]
            best[1] += 1
            return best[2]
        idx = len(self.clusters)
        cl = [list(tokens), 1, idx]
        leaf.append(cl)
        self.clusters.append(cl)
        return idx

    def templates(self) -> list[tuple[str, int]]:
        return [(" ".join(cl[0]), cl[1]) for cl in self.clusters]


def drain_templates(ds: ray.data.Dataset, text_col: str, id_col: str, *,
                    depth: int = 4, sim_threshold: float = 0.5,
                    max_children: int = 100,
                    num_partitions: int = 16) -> ray.data.Dataset:
    """Mine templates per hash partition, merge globally by template text.

    Output: (template, n_logs) — counts sum exactly to the input row count
    (every log joins exactly one cluster). Partition = hash(id) so skewed
    template popularity cannot hot-spot one worker.
    """
    from .temporal import partitioned_apply

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        miner = DrainMiner(depth=depth, sim_threshold=sim_threshold,
                           max_children=max_children)
        for text in df[text_col]:
            miner.add(text.split())
        t = miner.templates()
        return pd.DataFrame({"template": [x[0] for x in t],
                             "n_logs": np.asarray([x[1] for x in t],
                                                  dtype=np.int64)})

    per_part = partitioned_apply(ds, [id_col], kernel, num_partitions)

    def merge(t: pa.Table) -> pa.Table:
        out = t.group_by(["template"]).aggregate([("n_logs", "sum")])
        return out.rename_columns(["template", "n_logs"])
    # template count is corpus-bounded (thousands), one final merge block
    return per_part.repartition(1).map_batches(merge, batch_format="pyarrow")
