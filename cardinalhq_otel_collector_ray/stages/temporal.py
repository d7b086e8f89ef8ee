"""Temporal / streaming-shaped operators over keyed, time-ordered streams.

Covers the reference distribution's temporal processor vocabulary
(``distribution/components.go:120-133``): cumulativetodelta,
deltatorate, logdedup (interval dedup of identical bodies with count), and
session windowing (tailsampling-style per-key temporal grouping).

Ray-Data-native shape: partition by key (``groupby``) and do the ordered
window math per group with vectorized pandas/numpy inside ``map_groups``
(batch engine has no watermarks — order within group is established by an
explicit sort, SURVEY §2.4). The per-key ordering assumption is the ONLY
partitioning assumption; hot keys are bounded by per-key row counts, not
dataset size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def cumulative_to_delta(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                        value_col: str, out: str = "delta") -> ray.data.Dataset:
    """delta[i] = value[i] - value[i-1] per key, time-ordered; first row per
    key yields null (cumulativetodelta semantics: no emission before a
    baseline exists)."""
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        g[out] = g[value_col].diff()
        return g
    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")


def delta_to_cumulative(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                        value_col: str, out: str = "cumulative") -> ray.data.Dataset:
    """Running sum per key, time-ordered (deltatocumulativeprocessor,
    ``distribution/components.go:122``) — the inverse of
    ``cumulative_to_delta``."""
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        g[out] = g[value_col].cumsum()
        return g
    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")


def delta_to_rate(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                  value_col: str, out: str = "rate",
                  ts_unit_per_sec: float = 1000.0) -> ray.data.Dataset:
    """rate[i] = value[i] / (ts[i] - ts[i-1] in seconds) per key (deltatorate)."""
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        dt = g[ts_col].diff() / ts_unit_per_sec
        g[out] = g[value_col] / dt
        return g
    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")


def interval_dedup(ds: ray.data.Dataset, keys: list[str], ts_col: str,
                   interval_ms: int,
                   tiebreak_cols: list[str] | None = None) -> ray.data.Dataset:
    """logdedupprocessor: within each (keys, interval) keep the FIRST record
    (min (ts, *tiebreak_cols) — a deterministic total order) and attach
    ``dedup_count`` = number of collapsed records. Two-phase: per-batch
    first+count pre-combine, then a global per-group combine — skew-safe
    because each block contributes one row per group."""
    order = [ts_col] + (tiebreak_cols or [])

    def precombine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_interval"] = (df[ts_col].astype("int64") // interval_ms) * interval_ms
        df = df.sort_values(order, kind="mergesort")
        g = df.groupby(keys + ["_interval"], sort=False, as_index=False)
        first = g.first()
        first["dedup_count"] = g.size()["size"].values
        return first

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order, kind="mergesort")
        out = g.iloc[:1].copy()
        out["dedup_count"] = g["dedup_count"].sum()
        return out

    partials = ds.map_batches(precombine, batch_format="pandas")
    return partials.groupby(keys + ["_interval"]).map_groups(combine, batch_format="pandas")


def sessionize(ds: ray.data.Dataset, key: str, ts_col: str, gap_ms: int,
               agg_cols: dict[str, str] | None = None) -> ray.data.Dataset:
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_ms``. Emits one row per session:
    key, session_id (0-based per key), session_start, session_end, n_events
    (+ optional ``{col: 'sum'}`` aggregates)."""
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].astype("int64").to_numpy()
        new = np.ones(len(ts), dtype=np.int64)
        new[1:] = (np.diff(ts) > gap_ms).astype(np.int64)
        sid = np.cumsum(new) - 1
        g = g.assign(_sid=sid)
        gg = g.groupby("_sid", sort=True)
        out = pd.DataFrame({
            key: g[key].iloc[0],
            "session_id": np.arange(gg.ngroups, dtype=np.int64),
            "session_start": gg[ts_col].min().astype("int64").values,
            "session_end": gg[ts_col].max().astype("int64").values,
            "n_events": gg.size().values.astype(np.int64),
        })
        for col, how in (agg_cols or {}).items():
            out[f"{how}_{col}"] = gg[col].agg(how).values
        return out
    return ds.groupby(key).map_groups(per_group, batch_format="pandas")
