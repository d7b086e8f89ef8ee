"""ROUTE stage — deterministic predicate fan-out to named sinks.

Reference topology: decorated streams fan out through ``forward`` /
``routing`` connectors into per-vendor pipelines, each with its own
enforcement (drop/sample) and exporter (``docs/flow/flow.dot:27-104``,
``routingconnector`` at ``distribution/components.go:22``); the S3 exporter
additionally splits batches per resource-attr value
(``exporter/awss3exporter/factory.go:93-101``).

Ray-Data-native shape: ONE vectorized pass computes a ``route`` column from
ordered first-match-wins rules, then each sink consumes a filtered view (or
``write_parquet(partition_cols=["route"])`` writes all sinks in one pass).
Routing is a pure function of the data — never wall clock — so per-sink
routed-row counts are exactly reproducible (SURVEY §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import hashmod_keep


@dataclass(frozen=True)
class RouteRule:
    """First-match-wins routing rule: ``predicate(batch) -> bool ndarray``."""
    sink: str
    predicate: Callable[[pa.Table], np.ndarray]


def sample_rule(sink: str, id_column: str, percent: int, salt: int = 12345) -> RouteRule:
    """Deterministic hash-mod sampling rule (probabilisticsampler analog).
    SQL-equivalent: ``(id * 2654435761 + salt) % 1000 < percent * 10``."""
    def pred(batch: pa.Table) -> np.ndarray:
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return hashmod_keep(ids, percent, salt=salt)
    return RouteRule(sink, pred)


class Router:
    """Appends a ``route`` string column: first matching rule's sink, else
    ``default_sink``. One vectorized pass; no per-row dispatch."""

    def __init__(self, rules: list[RouteRule], default_sink: str = "default",
                 out: str = "route"):
        self.rules = rules
        self.default_sink = default_sink
        self.out = out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        route = np.full(n, self.default_sink, dtype=object)
        unassigned = np.ones(n, dtype=bool)
        for rule in self.rules:
            m = np.asarray(rule.predicate(batch), dtype=bool)
            take = m & unassigned
            route[take] = rule.sink
            unassigned &= ~take
        return batch.append_column(self.out, pa.array(route, type=pa.string()))


def route_stage(ds: ray.data.Dataset, rules: list[RouteRule],
                default_sink: str = "default", out: str = "route") -> ray.data.Dataset:
    return ds.map_batches(Router(rules, default_sink, out), batch_format="pyarrow")


def sink_view(ds: ray.data.Dataset, sink: str, route_col: str = "route") -> ray.data.Dataset:
    """Filtered view of one sink's rows (predicate fan-out consumer)."""
    return ds.map_batches(
        lambda t, s=sink: t.filter(pc.equal(t[route_col], s)),
        batch_format="pyarrow")
