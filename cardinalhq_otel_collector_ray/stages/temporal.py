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


def sliding_window_aggregate(ds: ray.data.Dataset, keys: list[str],
                             ts_col: str, value_col: str, *,
                             window_ms: int, hop_ms: int) -> ray.data.Dataset:
    """Sliding (hopping) event-time windows — a windowed aggregate Ray Data
    has no primitive for. Composition: each record EXPLODES into the
    ``window_ms / hop_ms`` windows that contain it (vectorized repeat),
    then the standard two-phase groupby aggregates per (window_start, keys).
    Output: keys..., window_start, n, sum. Window w covers
    [w, w + window_ms); records explode to w = ts//hop*hop - k*hop for
    k < window/hop. SQL-oracle-able via generate_series explode.
    """
    assert window_ms % hop_ms == 0
    k = window_ms // hop_ms
    import pyarrow as pa

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch[ts_col].astype("int64").to_numpy()
        base = (ts // hop_ms) * hop_ms
        n = len(batch)
        rep = batch.loc[batch.index.repeat(k)].reset_index(drop=True)
        offsets = np.tile(np.arange(k, dtype=np.int64) * hop_ms, n)
        rep["window_start"] = np.repeat(base, k) - offsets
        # a record belongs to window w iff w <= ts < w + window_ms; the
        # construction guarantees it, but guard for negative starts
        return rep[rep["window_start"] >= 0]

    from .aggregate import grouped_aggregate
    exploded = ds.map_batches(explode, batch_format="pandas")
    agg = grouped_aggregate(exploded, keys=keys + ["window_start"],
                            value_col=value_col)

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in keys + ["window_start"]}
        cols["n"] = batch["agg_count"].cast(pa.int64())
        cols["sum"] = batch["agg_sum"].cast(pa.int64())
        return pa.table(cols)
    return agg.map_batches(finalize, batch_format="pyarrow")


def asof_join_last_event(ds: ray.data.Dataset, key: str, ts_col: str,
                         left_filter, right_filter,
                         out: str = "asof_ts") -> ray.data.Dataset:
    """Per-key as-of join within one stream: for every LEFT record, the
    greatest RIGHT timestamp ≤ its own (``pd.merge_asof`` per key group —
    the as-of/range-join composition from the ray_guide join patterns).
    ``left_filter``/``right_filter``: pandas-mask callables selecting the
    two sides. Null when no prior right event exists."""
    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        left = g[left_filter(g)]
        right = g[right_filter(g)][[ts_col]].rename(columns={ts_col: out})
        if len(left) == 0:
            return left.assign(**{out: pd.Series([], dtype="float64")})
        if len(right) == 0:
            return left.assign(**{out: np.nan})
        merged = pd.merge_asof(left, right, left_on=ts_col, right_on=out,
                               direction="backward")
        return merged
    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


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
