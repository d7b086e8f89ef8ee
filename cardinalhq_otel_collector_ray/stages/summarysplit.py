"""SUMMARYSPLIT stage — per-record explode (1 summary → N metric rows).

Reference semantics (``processor/summarysplitprocessor/metrics.go:27-198``):
each Summary metric becomes

- ``<name>.count``  — delta non-monotonic int Sum (uint64→int64 clamped,
  ``metrics.go:118-123``),
- ``<name>.sum``    — double Gauge,
- one Gauge per distinct quantile with naming 0→``.min``, 1→``.max``,
  else ``.quantile.<pct>`` where the percent string replaces ``.``→``_``
  (0.999→``.quantile.99_9``; ``metrics.go:188-198``),
- NaN/Inf/out-of-[0,1] quantiles skipped (``metrics.go:154``),
- StartTimestamp falls back to Timestamp when zero (``metrics.go:179-184``).

Ray-Data-native shape: a pure stateless ``map_batches`` explode — k output
rows per input row built with numpy ``repeat``/``take`` (no shuffle, no
Python row loop).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import ray.data

INT64_MAX = 2**63 - 1


def quantile_suffix(q: float) -> str:
    """Quantile → metric-name suffix (metrics.go:188-198 naming golden)."""
    if q == 0:
        return ".min"
    if q == 1:
        return ".max"
    pct = q * 100.0
    # Go's strconv.FormatFloat(pct, 'f', -1, 64): shortest repr, no exponent
    s = repr(pct)
    if s.endswith(".0"):
        s = s[:-2]
    return ".quantile." + s.replace(".", "_")


def clamp_uint64(values: np.ndarray) -> np.ndarray:
    """uint64 → int64 with saturation at INT64_MAX (metrics.go:118-123)."""
    v = np.asarray(values, dtype=np.uint64)
    return np.where(v > np.uint64(INT64_MAX), np.int64(INT64_MAX),
                    v.astype(np.int64, casting="unsafe"))


def explode_summary_batch(batch: pa.Table, *, name_col: str = "name",
                          ts_col: str = "ts", start_ts_col: str = "start_ts",
                          count_col: str = "count", sum_col: str = "sum",
                          quantiles_col: str = "quantiles",
                          carry_cols: tuple[str, ...] = ()) -> pa.Table:
    """One summary row → (2 + #valid distinct quantiles) metric rows.

    Output columns: name, ts, start_ts, mtype ('sum'|'gauge'), value_i,
    value_d, temporality, monotonic, plus carried columns.
    ``quantiles`` is ``list<struct<q double, v double>>``.
    """
    n = batch.num_rows
    names = np.asarray(batch[name_col].to_pylist(), dtype=object)
    ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    start = batch[start_ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
    start = np.where(start == 0, ts, start)  # fallback rule metrics.go:179-184
    counts = clamp_uint64(batch[count_col].to_numpy(zero_copy_only=False))
    sums = batch[sum_col].to_numpy(zero_copy_only=False).astype(np.float64)

    out_name, out_ts, out_start = [], [], []
    out_mtype, out_vi, out_vd = [], [], []
    out_temp, out_mono = [], []
    src_idx = []

    # .count and .sum rows — fully vectorized
    for suffix, mtype, vi, vd, temp, mono in (
            (".count", "sum", counts, np.full(n, np.nan), "delta", False),
            (".sum", "gauge", np.full(n, -1, dtype=np.int64), sums, None, None)):
        out_name.append(np.char.add(names.astype(str), suffix))
        out_ts.append(ts); out_start.append(start)
        out_mtype.append(np.full(n, mtype, dtype=object))
        out_vi.append(vi); out_vd.append(vd)
        out_temp.append(np.full(n, temp, dtype=object))
        out_mono.append(np.full(n, mono, dtype=object))
        src_idx.append(np.arange(n))

    # quantile rows: flatten the list<struct> column once
    qcol = batch[quantiles_col]
    if isinstance(qcol, pa.ChunkedArray):
        qcol = qcol.combine_chunks()
    offsets = qcol.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = qcol.values  # StructArray
    if len(flat):
        qs = flat.field("q").to_numpy(zero_copy_only=False).astype(np.float64)
        vs = flat.field("v").to_numpy(zero_copy_only=False).astype(np.float64)
        row_of = np.searchsorted(offsets, np.arange(len(qs)), side="right") - 1
        valid = np.isfinite(qs) & (qs >= 0.0) & (qs <= 1.0)
        # dedupe per (row, q) keeping first occurrence (metrics.go dedupe
        # of quantile metrics per name across datapoints)
        order = np.arange(len(qs))
        _, first_idx = np.unique(
            np.stack([row_of, qs.view(np.int64)], axis=1)[valid], axis=0,
            return_index=True)
        keep = order[valid][np.sort(first_idx)]
        if len(keep):
            suffixes = np.asarray([quantile_suffix(q) for q in qs[keep]], dtype=object)
            r = row_of[keep]
            out_name.append(np.char.add(names[r].astype(str), suffixes.astype(str)))
            out_ts.append(ts[r]); out_start.append(start[r])
            out_mtype.append(np.full(len(keep), "gauge", dtype=object))
            out_vi.append(np.full(len(keep), -1, dtype=np.int64))
            out_vd.append(vs[keep])
            out_temp.append(np.full(len(keep), None, dtype=object))
            out_mono.append(np.full(len(keep), None, dtype=object))
            src_idx.append(r)

    idx = np.concatenate(src_idx)
    cols = {
        "name": pa.array(np.concatenate(out_name).astype(object), type=pa.string()),
        "ts": pa.array(np.concatenate(out_ts)),
        "start_ts": pa.array(np.concatenate(out_start)),
        "mtype": pa.array(np.concatenate(out_mtype), type=pa.string()),
        "value_i": pa.array(np.concatenate(out_vi)),
        "value_d": pa.array(np.concatenate(out_vd)),
        "temporality": pa.array(np.concatenate(out_temp), type=pa.string()),
        "monotonic": pa.array(np.concatenate(out_mono), type=pa.bool_()),
    }
    out = pa.table(cols)
    for c in carry_cols:
        out = out.append_column(c, batch[c].take(pa.array(idx)))
    return out


def summarysplit_stage(ds: ray.data.Dataset, **kwargs) -> ray.data.Dataset:
    return ds.map_batches(lambda t: explode_summary_batch(t, **kwargs),
                          batch_format="pyarrow")
