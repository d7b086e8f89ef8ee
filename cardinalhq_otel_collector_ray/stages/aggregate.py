"""AGGREGATE stage — interval groupby-aggregate with absorb & re-emit.

Reference semantics (the only stateful aggregation in the custom code):

- C1 absorb-filter: datapoints carrying the ``_cardinalhq.aggregate`` marker
  are REMOVED from the passthrough stream and folded into interval state
  (``processor/aggregationprocessor/metrics.go:32-96``).
- C2 interval groupby: state keyed by (interval bucket of the datapoint's
  own event timestamp, metric name, canonical tag-set); Sums aggregate with
  SUM, Gauges default to AVG with a per-datapoint override attr
  (``aggregate.go:193-294``; interval default 10 s, ``factory.go:37-39``).
- C3 re-emit: each closed interval emits ONE datapoint whose timestamp and
  start-timestamp equal the interval start (``aggregate.go:46-119``).

Ray-Data-native shape — a two-phase aggregate, NOT a translation of the
reference's in-heap map:

1. **Pre-combine** inside ``map_batches`` with Arrow's C++
   ``Table.group_by`` — each block shrinks to one partial row per
   (interval, key): (sum, count, min, max). This is the skew defense: a hot
   key contributes at most one row per block to the shuffle, so salting is
   rarely needed; when group cardinality per block stays huge, a
   ``salt = hash(row) % S`` column can be added to the key and a third
   tiny combine folds the salts (SURVEY §7.3).
2. **Global combine** via ``ds.groupby(keys).aggregate(Sum/Min/Max)`` over
   the (much smaller) partials — the only all-to-all exchange.
3. **Finalize**: derive the requested statistic (sum/avg/min/max/count) and
   stamp ``ts = interval_start`` (C3 emit rule).

Interval closure is purely event-time (ts // interval), a deliberate,
deterministic improvement over the reference's wall-clock flush
(``metrics.go:85``; SURVEY §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import round6
from ray.data.aggregate import Max, Min, Sum

# Driver-mode merge cap: above this many partial rows the coordinator merge
# is invalid and both aggregate entry points fall back to the distributed
# shuffle. Module-level so tests can monkeypatch it to force the fallback.
MAX_DRIVER_ROWS = 20_000_000


def driver_merge_stream(partials: ray.data.Dataset, group_cols: list[str],
                        spec: list[tuple[str, str]], *,
                        num_partitions: int = 64):
    """Coordinator merge of skinny pre-combined partials WITHOUT the
    re-execution hazard.

    The stream is compacted with a C++ ``group_by`` every
    ``~MAX_DRIVER_ROWS/4`` pulled rows, so driver memory is O(distinct
    groups) — never O(partial rows). If the compacted cardinality itself
    exceeds ``MAX_DRIVER_ROWS`` the already-pulled compacted chunks are
    ``ray.put`` back to the object store and ONE partitioned C++ merge
    finishes distributed — the lazy upstream pipeline never executes twice
    (CLAUDE.md: ``iter_batches`` runs the plan; the old overflow fallback
    re-ran the whole precombine chain).

    ``spec`` ops must be mergeable (sum/min/max). Returns a ``pa.Table``
    when everything fit on the driver, a (lazy) ``ray.data.Dataset`` with
    the same columns when it spilled, or ``None`` for an empty stream —
    in all cases columns keep the PARTIALS' names (group_cols + spec
    cols); callers rename.
    """
    import ray as _ray
    import ray.data as rd

    cols = [c for c, _ in spec]
    if len(set(cols)) != len(cols):
        # compaction must be CLOSED: output columns feed back through the
        # same spec, so two ops on one source column would collide —
        # pre-name the partials (one column per op) like every caller does
        raise ValueError("driver_merge_stream spec columns must be unique; "
                         "pre-name partial columns, one per aggregate op")

    def compact(tables: list[pa.Table]) -> pa.Table:
        t = pa.concat_tables(tables, promote_options="default")
        out = t.group_by(group_cols).aggregate(spec)
        return out.rename_columns(group_cols + cols)

    limit = max(MAX_DRIVER_ROWS // 4, 1)
    buf, rows, refs = [], 0, []
    acc_rows = 0  # rows of the compacted head (buf[0] after a compaction)
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        buf.append(b.select(group_cols + cols))
        rows += b.num_rows
        # geometric trigger: compact when the UNCOMPACTED tail outgrows
        # max(limit, compacted head) — re-compacting the whole accumulator
        # per pulled batch would be O(batches × groups) driver work when
        # cardinality sits just under the cap; doubling keeps it O(total)
        if rows - acc_rows > max(limit, acc_rows):
            acc = compact(buf)
            if acc.num_rows > MAX_DRIVER_ROWS:
                refs.append(_ray.put(acc))
                buf, rows, acc_rows = [], 0, 0
            else:
                buf, rows, acc_rows = [acc], acc.num_rows, acc.num_rows
    if refs:
        if buf:
            refs.append(_ray.put(compact(buf)))
        from ..functions.hashing import table_key_hash

        def add_part(b: pa.Table) -> pa.Table:
            tag = (table_key_hash(b, group_cols)
                   % np.uint64(num_partitions)).astype(np.int32)
            return b.append_column("_apart", pa.array(tag))

        def per_part(t: pa.Table) -> pa.Table:
            out = t.drop_columns(["_apart"]).group_by(group_cols).aggregate(spec)
            return out.rename_columns(group_cols + cols)

        return (rd.from_arrow_refs(refs)
                .map_batches(add_part, batch_format="pyarrow")
                .groupby("_apart").map_groups(per_part,
                                              batch_format="pyarrow"))
    if not buf:
        return None
    return compact(buf)


def merge_partials(partials: ray.data.Dataset, group_cols: list[str],
                   spec: list[tuple[str, str]], *, mode: str = "driver",
                   num_partitions: int = 64, as_dataset: bool = False):
    """Finish a two-phase aggregate over skinny per-block partials: merge
    by ``group_cols`` with ``spec = [(col, 'sum'|'min'|'max'), ...]``,
    returning a pandas DataFrame with the SAME column names.

    RETURN CONTRACT: the default return is a DRIVER-side DataFrame, so the
    grouped result must fit on the driver — callers own that cardinality
    bound. ``mode='driver'``'s spill keeps the MERGE memory O(groups), but
    an over-``MAX_DRIVER_ROWS`` grouped result still lands in the driver
    process at the final ``to_pandas``. Callers whose group cardinality
    can exceed the cap (unbounded keys at 100 TB) must pass
    ``as_dataset=True``: the merged result comes back as a (distributed)
    ``ray.data.Dataset`` with identical columns and never concentrates.

    Every mergeable-partial aggregate here shares this last step; the
    scale contract lives in one place:

    - ``mode='driver'`` — the ``driver_merge_stream`` compact-as-you-pull
      merge: driver memory is O(distinct groups), and a ``MAX_DRIVER_ROWS``
      cardinality overflow spills the compacted chunks back to the object
      store for a distributed finish without re-executing the upstream
      (monkeypatch the cap in tests to force the spill path).
    - ``mode='partitioned'`` — bounded-tag hash partition + one C++ merge
      per partition: distributed, skips the Aggregate operator's fixed
      sort-shuffle overhead (see CLAUDE.md / BASELINE.md measurements).
    """
    names = [c for c, _ in spec]
    if mode == "partitioned":
        from ..functions.hashing import table_key_hash

        def add_part(b: pa.Table) -> pa.Table:
            tag = (table_key_hash(b, group_cols)
                   % np.uint64(num_partitions)).astype(np.int32)
            return b.append_column("_apart", pa.array(tag))

        def per_part(t: pa.Table) -> pa.Table:
            out = t.group_by(group_cols).aggregate(spec)
            return out.rename_columns(group_cols + names)

        merged = (partials.map_batches(add_part, batch_format="pyarrow")
                  .groupby("_apart").map_groups(per_part,
                                                batch_format="pyarrow"))
        return merged if as_dataset else merged.to_pandas()
    if mode != "driver":
        raise ValueError(f"unknown merge mode {mode!r}; "
                         "known: ['driver', 'partitioned']")
    if as_dataset:
        # distributed end-to-end: never pull partials through the driver
        return merge_partials(partials, group_cols, spec, mode="partitioned",
                              num_partitions=num_partitions, as_dataset=True)
    out = driver_merge_stream(partials, group_cols, spec,
                              num_partitions=num_partitions)
    if out is None:  # empty stream: typed empty frame from plan metadata
        schema = partials.schema()
        return pa.table({c: pa.array([], type=schema.base_schema.field(c).type)
                         for c in group_cols + names}).to_pandas()
    # pa.Table (fit on driver) and spilled Dataset (already grouped-size)
    # both land as the same pandas frame
    return out.to_pandas()


def with_interval(ts_ms: pa.Array, interval_ms: int) -> pa.Array:
    """Event-time tumbling bucket start: ``(ts_ms // interval) * interval``.

    Pure int64 floor-divide (numpy floors toward -inf like Python's ``//``)
    — exact for the full int64 range, unlike the float64 divide/floor/cast
    chain this replaced, which loses ulps above 2**53."""
    ts = ts_ms.combine_chunks() if isinstance(ts_ms, pa.ChunkedArray) else ts_ms
    v = ts.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return pa.array(np.floor_divide(v, interval_ms) * interval_ms)


def split_marked(ds: ray.data.Dataset, mark_col: str):
    """C1 absorb-filter: (passthrough, absorbed) views by boolean marker."""
    passthrough = ds.map_batches(
        lambda t: t.filter(pc.invert(pc.fill_null(t[mark_col], False))),
        batch_format="pyarrow")
    absorbed = ds.map_batches(
        lambda t: t.filter(pc.fill_null(t[mark_col], False)),
        batch_format="pyarrow")
    return passthrough, absorbed


def interval_aggregate(ds: ray.data.Dataset, *, ts_col: str, interval_ms: int,
                       keys: list[str], value_col: str,
                       out_ts_col: str | None = None,
                       mode: str = "shuffle",
                       coalesce_partials: bool = False) -> ray.data.Dataset:
    """Two-phase (pre-combine + combine) interval aggregate.

    Output: one row per (interval, *keys) with columns
    ``keys..., <out_ts_col>, agg_sum, agg_count, agg_min, agg_max, agg_avg``.
    Callers project the statistic the metric type requires (C2: SUM for
    sums, AVG default for gauges, per-row override honored by including the
    override column in ``keys``).

    ``mode``: "shuffle" = distributed groupby (unbounded interval×key
    cardinality); "partitioned" = distributed bounded-tag C++ merge (mid
    cardinality — skips the Aggregate operator's fixed sort overhead);
    "driver" = coordinator merge of the per-block partials (bounded
    cardinality — same tradeoff as ``grouped_aggregate``).
    """
    if interval_ms < 1000:
        # reference floor: metric_aggregation.interval ≥ 1 s
        # (processor/aggregationprocessor/config.go:39-47)
        raise ValueError(f"interval_ms must be ≥ 1000 (got {interval_ms})")
    out_ts_col = out_ts_col or ts_col
    group_cols = ["_interval", *keys]

    def precombine(batch: pa.Table) -> pa.Table:
        iv = with_interval(batch[ts_col], interval_ms)
        t = batch.select(keys + [value_col]).append_column("_interval", iv)
        part = t.group_by(group_cols).aggregate(
            [(value_col, "sum"), (value_col, "count"),
             (value_col, "min"), (value_col, "max")])
        return part.rename_columns(group_cols + ["_psum", "_pcount", "_pmin", "_pmax"])

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    if mode == "partitioned":
        from ..functions.hashing import table_key_hash

        def add_part(b: pa.Table) -> pa.Table:
            tag = (table_key_hash(b, group_cols) % np.uint64(64)).astype(np.int32)
            return b.append_column("_apart", pa.array(tag))

        def per_part(t: pa.Table) -> pa.Table:
            out = t.group_by(group_cols).aggregate(
                [("_psum", "sum"), ("_pcount", "sum"),
                 ("_pmin", "min"), ("_pmax", "max")])
            return out.rename_columns(group_cols + ["agg_sum", "agg_count",
                                                    "agg_min", "agg_max"])

        tagged = partials.map_batches(add_part, batch_format="pyarrow")
        if coalesce_partials:  # see grouped_aggregate: wins at many blocks
            tagged = tagged.repartition(64)
        combined = tagged.groupby("_apart").map_groups(
            per_part, batch_format="pyarrow")
    elif mode == "driver":
        import ray.data as rd
        # Scale guard (same as grouped_aggregate): interval × key
        # cardinality grows with the corpus time span, so the driver merge
        # compacts as it pulls and spills to a distributed finish on
        # cardinality overflow (driver_merge_stream — never re-executes
        # the upstream precombine).
        out = driver_merge_stream(
            partials, group_cols,
            [("_psum", "sum"), ("_pcount", "sum"),
             ("_pmin", "min"), ("_pmax", "max")])
        agg_names = ["agg_sum", "agg_count", "agg_min", "agg_max"]
        if out is None:
            out = pa.table({c: pa.array([], pa.int64()) for c in
                            group_cols + ["_psum", "_pcount", "_pmin", "_pmax"]})
        if isinstance(out, pa.Table):
            combined = rd.from_arrow(
                out.rename_columns(group_cols + agg_names))
        else:
            combined = out.map_batches(
                lambda t: t.rename_columns(group_cols + agg_names),
                batch_format="pyarrow")
    else:
        combined = partials.groupby(group_cols).aggregate(
            Sum("_psum", alias_name="agg_sum"),
            Sum("_pcount", alias_name="agg_count"),
            Min("_pmin", alias_name="agg_min"),
            Max("_pmax", alias_name="agg_max"),
        )

    def finalize(batch: pa.Table) -> pa.Table:
        avg = pc.divide(batch["agg_sum"].cast(pa.float64()),
                        batch["agg_count"].cast(pa.float64()))
        batch = batch.append_column("agg_avg", avg)
        batch = batch.append_column(out_ts_col, batch["_interval"])
        return batch.drop_columns(["_interval"])

    return combined.map_batches(finalize, batch_format="pyarrow")


def grouped_aggregate(ds: ray.data.Dataset, keys: list[str], value_col: str,
                      precombine_batch_size: int | None = None,
                      mode: str = "shuffle",
                      num_partitions: int = 64,
                      coalesce_partials: bool = False) -> ray.data.Dataset:
    """Non-windowed two-phase groupby (countconnector/sumconnector analog,
    ``distribution/components.go:15,25``): sum/count per key-set.

    ``mode``:

    - ``"shuffle"`` (default): global ``groupby().aggregate()`` over the
      partials — fully distributed; right when group cardinality is
      unbounded. Cost grows with the NUMBER of partial blocks (Ray's sort
      shuffle creates O(blocks²) map→reduce objects), so upstream block
      sizing matters more than row counts here.
    - ``"partitioned"``: distributed like shuffle, but the exchange key is
      ``hash(keys) % num_partitions`` (bounded int32 sort domain) and the
      final merge is ONE C++ ``group_by`` per partition — skips the Ray
      Aggregate operator's fixed seconds of sort overhead (BASELINE.md
      note 7). Right for mid-cardinality groups where the driver merge is
      unsafe but the Aggregate operator dominates wall time.
    - ``"driver"``: stream the pre-combined partials (one small batch per
      block — already reduced to ≤ G rows each) to the driver and finish
      with ONE C++ ``group_by``. The right choice when G (distinct groups)
      is bounded and small (sink counts, per-source aggregates): the driver
      sees G·B rows of a few columns, never raw data. This is the standard
      "merge partial aggregates at the coordinator" pattern, not a
      driver-side loop over records.
    """

    def precombine(batch: pa.Table) -> pa.Table:
        part = batch.select(keys + [value_col]).group_by(keys).aggregate(
            [(value_col, "sum"), (value_col, "count")])
        return part.rename_columns(keys + ["_psum", "_pcount"])

    # batch_size=None: per-BLOCK precombine. A row-count batch size would
    # make the fused upstream chain bundle ~batch_size/block_rows input
    # blocks per task and serialize the whole pipeline.
    partials = ds.map_batches(precombine, batch_format="pyarrow",
                              batch_size=precombine_batch_size)

    if mode == "partitioned":
        from ..functions.hashing import table_key_hash

        def add_part(b: pa.Table) -> pa.Table:
            tag = (table_key_hash(b, keys)
                   % np.uint64(num_partitions)).astype(np.int32)
            return b.append_column("_apart", pa.array(tag))

        def per_part(t: pa.Table) -> pa.Table:
            out = t.group_by(keys).aggregate(
                [("_psum", "sum"), ("_pcount", "sum")])
            return out.rename_columns(keys + ["agg_sum", "agg_count"])

        # ``coalesce_partials``: repartition the (skinny) partial blocks
        # BEFORE the sort. Ray's sort creates O(input_blocks × partitions)
        # shuffle objects, so at hundreds+ of partial blocks the extra
        # AllToAll pays for itself ~4× (7.3 s → 1.9 s at 334 blocks); at a
        # handful of blocks its ~0.3-1 s fixed cost only hurts — callers
        # with big inputs (many read blocks) should enable it.
        tagged = partials.map_batches(add_part, batch_format="pyarrow")
        if coalesce_partials:
            tagged = tagged.repartition(num_partitions)
        return tagged.groupby("_apart").map_groups(per_part,
                                                   batch_format="pyarrow")

    if mode == "driver":
        import ray.data as rd
        # Scale guard: compact-as-you-pull driver merge; cardinality
        # overflow spills to a distributed finish without re-executing the
        # upstream (driver_merge_stream).
        out = driver_merge_stream(partials, keys,
                                  [("_psum", "sum"), ("_pcount", "sum")],
                                  num_partitions=num_partitions)
        if out is None:
            empty = pa.table({k: pa.array([], pa.string()) for k in keys})
            empty = empty.append_column("agg_sum", pa.array([], pa.int64()))
            return rd.from_arrow(empty.append_column(
                "agg_count", pa.array([], pa.int64())))
        agg_names = ["agg_sum", "agg_count"]
        if isinstance(out, pa.Table):
            return rd.from_arrow(out.rename_columns(keys + agg_names))
        return out.map_batches(
            lambda t: t.rename_columns(keys + agg_names),
            batch_format="pyarrow")

    return partials.groupby(keys).aggregate(
        Sum("_psum", alias_name="agg_sum"),
        Sum("_pcount", alias_name="agg_count"),
    )


def distributed_top_k(ds: ray.data.Dataset, k: int, by: list[str],
                      ascending: list[bool] | bool = False):
    """Global top-k WITHOUT materializing the dataset on the driver.

    Per-BLOCK top-k prune first (each block keeps ≤ k rows — valid whenever
    each ranked entity appears in exactly one block, e.g. after a grouped
    aggregate), then the driver merges only ≤ k × blocks candidates.
    Returns a pandas DataFrame of the final k rows (driver-sized by
    construction). Deterministic: callers include a tie-break column in
    ``by``.
    """
    import pandas as _pd

    if isinstance(ascending, bool):
        ascending = [ascending] * len(by)

    def block_topk(df: _pd.DataFrame) -> _pd.DataFrame:
        return df.sort_values(by, ascending=ascending, kind="mergesort").head(k)

    candidates = ds.map_batches(block_topk, batch_format="pandas").to_pandas()
    return candidates.sort_values(by, ascending=ascending,
                                  kind="mergesort").head(k)


def salted_group_sum(ds: ray.data.Dataset, keys: list[str], value_col: str,
                     salt_buckets: int = 16,
                     id_col: str | None = None) -> ray.data.Dataset:
    """Explicit skew-aware salted groupby (north rule).

    Stage 1 groups by (keys, salt) where ``salt = hash(id) % S`` — a hot
    key's rows split across S reducers instead of one; stage 2 folds the S
    salted partials per key. With per-block pre-combine (grouped_aggregate)
    salting is usually unnecessary — this operator is for inputs where a
    single group exceeds one reducer even after pre-combine (e.g. a
    Zipf-1 source receiving most of the corpus) or where a
    ``map_groups`` UDF (not a mergeable aggregate) would otherwise see the
    whole hot group at once.
    """
    def add_salt(batch: pa.Table) -> pa.Table:
        if id_col is not None:
            basis = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            basis = np.arange(batch.num_rows, dtype=np.int64)
        salt = (basis * np.int64(2654435761)) % np.int64(salt_buckets)
        return batch.append_column("_salt", pa.array(salt.astype(np.int32)))

    def stage1(batch: pa.Table) -> pa.Table:
        part = batch.select(keys + ["_salt", value_col]) \
            .group_by(keys + ["_salt"]).aggregate(
                [(value_col, "sum"), (value_col, "count")])
        return part.rename_columns(keys + ["_salt", "_psum", "_pcount"])

    salted = ds.map_batches(add_salt, batch_format="pyarrow") \
        .map_batches(stage1, batch_format="pyarrow")
    stage1_out = salted.groupby(keys + ["_salt"]).aggregate(
        Sum("_psum", alias_name="_s1sum"), Sum("_pcount", alias_name="_s1count"))
    # stage 2: fold the ≤ S salted rows per key (tiny)
    final = stage1_out.groupby(keys).aggregate(
        Sum("_s1sum", alias_name="agg_sum"),
        Sum("_s1count", alias_name="agg_count"))
    return final


def exact_heavy_hitters(ds: ray.data.Dataset, col: str, k: int):
    """EXACT frequent items: every value with global count·k > total rows,
    with its exact count — without ever shuffling or materializing the full
    value-frequency table.

    Two passes (Misra–Gries-style candidate bound made exact):

    1. Per-block C++ counts; keep only values with local count·k > block
       rows. If a value is globally heavy (freq/n > 1/k) it must be locally
       heavy in ≥1 block (weighted-average argument), and each block yields
       < k candidates — so the candidate union is ≤ (k-1)·blocks rows,
       driver-bounded, a guaranteed superset of the answer.
    2. Re-count ONLY the candidates (broadcast set, np.isin prune before
       the per-block count), merge the tiny partials, filter count·k > n.

    Pure integer math — a SQL ``HAVING count(*)*k > total`` reproduces it
    exactly. Returns a pandas DataFrame (value, count), value-sorted.
    """
    import pandas as _pd
    import ray as _ray

    def block_counts(batch: pa.Table) -> pa.Table:
        part = batch.select([col]).group_by([col]).aggregate([(col, "count")])
        part = part.rename_columns([col, "_n"])
        n_b = batch.num_rows
        mask = pc.greater(pc.multiply(part["_n"], pa.scalar(k, pa.int64())),
                          pa.scalar(n_b, pa.int64()))
        cand = part.filter(mask)
        # one extra null-keyed row per block carries the block row count so
        # phase 1 also yields the exact global total
        return pa.concat_tables([
            pa.table({col: cand[col],
                      "_n": cand["_n"].cast(pa.int64()),
                      "_total": pa.array(np.zeros(cand.num_rows, np.int64))}),
            pa.table({col: pa.nulls(1, batch[col].type),
                      "_n": pa.array([0], pa.int64()),
                      "_total": pa.array([n_b], pa.int64())}),
        ])

    phase1 = ds.map_batches(block_counts, batch_format="pyarrow").to_pandas()
    total = int(phase1["_total"].sum())
    candidates = phase1[col][phase1[col].notna()].unique()
    cand_ref = _ray.put(np.sort(np.asarray(candidates)))

    def recount(batch: pa.Table) -> pa.Table:
        cs = _ray.get(cand_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        sel = batch.filter(pa.array(np.isin(v, cs))).select([col])
        part = sel.group_by([col]).aggregate([(col, "count")])
        return part.rename_columns([col, "_n"])

    parts = ds.map_batches(recount, batch_format="pyarrow").to_pandas()
    counts = parts.groupby(col, as_index=False)["_n"].sum()
    out = counts[counts["_n"] * k > total].sort_values(col, kind="mergesort")
    return _pd.DataFrame({col: out[col].to_numpy(),
                          "count": out["_n"].astype("int64").to_numpy()})


def rollup_aggregate(ds, keys: list[str], value_col: str,
                     sentinels: dict[str, object], mode: str = "driver",
                     num_partitions: int = 64):
    """SQL ROLLUP: sum/count at every prefix level of ``keys`` (finest,
    each shorter prefix, grand total) from ONE scan.

    The finest level runs through ``grouped_aggregate`` (same two-phase
    pre-combine and mode choices); every coarser level is rolled up from
    the FINEST RESULT — G rows, the rollup's own output size — so the
    input is never re-scanned or re-shuffled per level. Rolled-up key
    columns carry the caller's ``sentinels`` value (not NULL) so dtypes
    stay stable across engines. Returns a pandas DataFrame with columns
    ``keys + [level, agg_sum, agg_count]`` where ``level`` = number of
    keys kept."""
    import pandas as _pd

    finest = grouped_aggregate(ds, keys, value_col, mode=mode,
                               num_partitions=num_partitions).to_pandas()
    finest = finest[keys + ["agg_sum", "agg_count"]]
    frames = []
    for level in range(len(keys), -1, -1):
        keep = keys[:level]
        if level == len(keys):
            f = finest.copy()
        elif keep:
            f = finest.groupby(keep, as_index=False, sort=False)[
                ["agg_sum", "agg_count"]].sum()
        else:
            f = _pd.DataFrame({"agg_sum": [finest["agg_sum"].sum()],
                               "agg_count": [finest["agg_count"].sum()]})
        for k in keys[level:]:
            f[k] = sentinels[k]
        f = f[keys + ["agg_sum", "agg_count"]]
        f.insert(len(keys), "level", np.int64(level))
        frames.append(f)
    out = _pd.concat(frames, ignore_index=True)
    out["agg_sum"] = out["agg_sum"].astype("int64")
    out["agg_count"] = out["agg_count"].astype("int64")
    return out


def grouped_corr(ds, keys: list[str], x_col: str, y_col: str,
                 mode: str = "driver"):
    """Pearson correlation per key from EXACT integer partial sums
    (n, Σx, Σy, Σx², Σy², Σxy accumulated per block with one C++
    ``group_by``, merged via ``merge_partials`` — driver merge is guarded
    by ``MAX_DRIVER_ROWS`` with a distributed fallback;
    ``mode='partitioned'`` for unbounded key cardinality).

    Callers pass integer-valued columns with |x|,|y| small enough that the
    per-block int64 products cannot overflow (the unbounded-scale variant
    would switch partials to float64 and give up bit-parity). The final
    correlation is computed in float64 with a FIXED operation order —
    ``(n·Σxy − Σx·Σy) / (sqrt(n·Σxx − Σx²) · sqrt(n·Σyy − Σy²))`` — so a
    SQL oracle using the same expression is bit-identical; round(…,6)
    last."""
    import pandas as _pd

    def precombine(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({**{k: batch[k] for k in keys},
                      "_x": pa.array(x), "_y": pa.array(y),
                      "_xx": pa.array(x * x), "_yy": pa.array(y * y),
                      "_xy": pa.array(x * y)})
        part = t.group_by(keys).aggregate(
            [("_x", "sum"), ("_y", "sum"), ("_xx", "sum"),
             ("_yy", "sum"), ("_xy", "sum"), ("_x", "count")])
        return part.rename_columns(keys + ["_sx", "_sy", "_sxx", "_syy",
                                           "_sxy", "_n"])

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    g = merge_partials(partials, keys,
                       [("_sx", "sum"), ("_sy", "sum"), ("_sxx", "sum"),
                        ("_syy", "sum"), ("_sxy", "sum"), ("_n", "sum")],
                       mode=mode)
    n = g["_n"].to_numpy().astype(np.float64)
    sx = g["_sx"].to_numpy().astype(np.float64)
    sy = g["_sy"].to_numpy().astype(np.float64)
    sxx = g["_sxx"].to_numpy().astype(np.float64)
    syy = g["_syy"].to_numpy().astype(np.float64)
    sxy = g["_sxy"].to_numpy().astype(np.float64)
    corr = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx)
                                  * np.sqrt(n * syy - sy * sy))
    out = g[keys].copy()
    out["n"] = g["_n"].astype("int64")
    out["corr"] = round6(corr)
    return _pd.DataFrame(out)


def grouped_linreg(ds, keys: list[str], x_col: str, y_col: str,
                   mode: str = "driver"):
    """Per-key ordinary-least-squares trend (slope + intercept) from EXACT
    integer partial sums — the telemetry trend-detection aggregate
    (per-metric rate-of-change over event time).

    Same mergeable shape as ``grouped_corr``: one C++ ``group_by`` per
    block accumulates (n, Σx, Σy, Σxy, Σx²) as int64, ``merge_partials``
    finishes (driver mode guarded by ``MAX_DRIVER_ROWS`` with the
    spill-don't-re-execute fallback; ``mode='partitioned'`` for unbounded
    key cardinality). The final math runs in float64 with a FIXED
    operation order — ``slope = (n·Σxy − Σx·Σy)/(n·Σxx − Σx²)``,
    ``intercept = (Σy − slope·Σx)/n`` — each int sum cast to double
    before multiplying, so a SQL oracle spelling the same expression is
    bit-identical even where the cross products exceed 2⁵³ (both engines
    round the same IEEE ops the same way); ``round6`` last.

    Callers pass integer x/y scaled so the per-block int64 SUMS cannot
    overflow (minutes-since-epoch-min × value-cents at the corpus scales
    here). Output: keys + n + slope + intercept.
    """
    import pandas as _pd

    def precombine(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({**{k: batch[k] for k in keys},
                      "_x": pa.array(x), "_y": pa.array(y),
                      "_xx": pa.array(x * x), "_xy": pa.array(x * y)})
        part = t.group_by(keys).aggregate(
            [("_x", "sum"), ("_y", "sum"), ("_xx", "sum"),
             ("_xy", "sum"), ("_x", "count")])
        return part.rename_columns(keys + ["_sx", "_sy", "_sxx",
                                           "_sxy", "_n"])

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    g = merge_partials(partials, keys,
                       [("_sx", "sum"), ("_sy", "sum"), ("_sxx", "sum"),
                        ("_sxy", "sum"), ("_n", "sum")], mode=mode)
    n = g["_n"].to_numpy().astype(np.float64)
    sx = g["_sx"].to_numpy().astype(np.float64)
    sy = g["_sy"].to_numpy().astype(np.float64)
    sxx = g["_sxx"].to_numpy().astype(np.float64)
    sxy = g["_sxy"].to_numpy().astype(np.float64)
    denom = n * sxx - sx * sx
    # zero x-variance group: slope undefined — emit NaN, which lands as
    # NULL/NaN on BOTH sides (DuckDB float x/0 is NULL; fetchdf gives NaN)
    denom[denom == 0.0] = np.nan
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    out = g[keys].copy()
    out["n"] = g["_n"].astype("int64")
    out["slope"] = round6(slope)
    out["intercept"] = round6(intercept)
    return _pd.DataFrame(out)


def grouped_argmax(ds, keys: list[str], value_col: str, arg_col: str,
                   mode: str = "driver", num_partitions: int = 64):
    """arg-max per key (the row identifier holding the key's maximum
    value; smallest ``arg_col`` wins ties) — the logdedup packed-key
    "first" trick generalized into a mergeable aggregate.

    Pack = ``value·2³¹ + (2³¹−1−arg)``: maximizing the pack maximizes the
    value and, on ties, minimizes the arg — so per-block C++ ``max``
    partials merge associatively like any sum (no per-group row
    retention). Contract: ``0 ≤ value < 2³¹`` and ``0 ≤ arg < 2³¹``
    (int64-exact); wider payloads would pack into fixed-width bytes.
    Returns key columns + ``max_<value_col>`` + ``argmax_<arg_col>``."""
    B = np.int64(1) << np.int64(31)

    def precombine(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        a = batch[arg_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({**{k: batch[k] for k in keys},
                      "_pack": pa.array(v * B + (B - 1 - a))})
        part = t.group_by(keys).aggregate([("_pack", "max")])
        return part.rename_columns(keys + ["_pack"])

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    if mode == "partitioned":
        from ..functions.hashing import table_key_hash

        def add_part(b: pa.Table) -> pa.Table:
            tag = (table_key_hash(b, keys)
                   % np.uint64(num_partitions)).astype(np.int32)
            return b.append_column("_apart", pa.array(tag))

        def per_part(t: pa.Table) -> pa.Table:
            return t.group_by(keys).aggregate([("_pack", "max")]) \
                    .rename_columns(keys + ["_pack"])

        merged = (partials.map_batches(add_part, batch_format="pyarrow")
                  .groupby("_apart").map_groups(per_part,
                                                batch_format="pyarrow")
                  .to_pandas())
    else:
        # same scale contract as grouped_aggregate's driver mode:
        # compact-as-you-pull, spill to a distributed max on cardinality
        # overflow (driver_merge_stream — no upstream re-execution)
        out = driver_merge_stream(partials, keys, [("_pack", "max")],
                                  num_partitions=num_partitions)
        if out is None:
            out = pa.table({**{k: pa.array([], pa.string()) for k in keys},
                            "_pack": pa.array([], pa.int64())})
        merged = out.to_pandas()
    pack = merged["_pack"].to_numpy().astype(np.int64)
    out = merged[keys].copy()
    out[f"max_{value_col}"] = pack // int(B)
    out[f"argmax_{arg_col}"] = int(B) - 1 - (pack % int(B))
    return out


def m4_downsample(ds, keys: list[str], ts_col: str, value_col: str,
                  bucket_ms: int, mode: str = "driver"):
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per (keys,
    bucket) the FIRST, LAST, MIN and MAX points with their timestamps —
    the error-free reduction for rendering/retention of metric streams.

    Every statistic is a mergeable packed-int64 min/max (the
    `grouped_argmax` discipline): with ``dt = ts − bucket_start`` and
    ``s = ceil(log2(bucket_ms))``,

    - first/last = min/max of ``dt·2³¹ + value``  (tie → smaller/larger value)
    - min/max    = min/max of ``value·2^s + dt``  (tie → earlier/later point)

    so per-block C++ partials merge associatively; ``merge_partials``
    finishes (keys × buckets cardinality grows with the corpus TIME SPAN,
    so the driver merge carries the ``MAX_DRIVER_ROWS`` overflow fallback
    and ``mode='partitioned'`` is the long-retention path). Contract:
    ``0 ≤ value < 2^(62−s)`` and ``0 ≤ dt < bucket_ms``."""
    import pandas as _pd
    s_bits = int(np.ceil(np.log2(bucket_ms)))
    B31 = np.int64(1) << np.int64(31)
    BS = np.int64(1) << np.int64(s_bits)

    def precombine(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (ts // bucket_ms) * bucket_ms
        dt = ts - b
        p_pos = dt * B31 + v          # position-major (first/last)
        p_val = v * BS + dt           # value-major (min/max)
        t = pa.table({**{k: batch[k] for k in keys},
                      "_b": pa.array(b),
                      "_pp": pa.array(p_pos), "_pv": pa.array(p_val)})
        part = t.group_by(["_b", *keys]).aggregate(
            [("_pp", "min"), ("_pp", "max"), ("_pv", "min"), ("_pv", "max")])
        return part.rename_columns(["_b", *keys, "_pp_min", "_pp_max",
                                    "_pv_min", "_pv_max"])

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    g = merge_partials(partials, ["_b", *keys],
                       [("_pp_min", "min"), ("_pp_max", "max"),
                        ("_pv_min", "min"), ("_pv_max", "max")],
                       mode=mode)
    b = g["_b"].to_numpy().astype(np.int64)
    out = {k: g[k] for k in keys}
    out["bucket_ms"] = b
    for name, col, base in (("first", "_pp_min", B31), ("last", "_pp_max", B31)):
        p = g[col].to_numpy().astype(np.int64)
        out[f"{name}_ms"] = b + p // base
        out[f"{name}_cents"] = p % base
    for name, col in (("min", "_pv_min"), ("max", "_pv_max")):
        p = g[col].to_numpy().astype(np.int64)
        out[f"{name}_cents"] = p // BS
        out[f"{name}_ms"] = b + p % BS
    return _pd.DataFrame(out)


def grouped_weighted_avg(ds, keys: list[str], value_col: str,
                         weight_col: str, mode: str = "driver"):
    """Weight-exact weighted mean per key: per-block int64 partials of
    Σ(w·v) and Σw (one C++ group_by), merged like any sum; the final
    division of two exact integers is a bit-identical double in every
    engine. Contract: w·v fits int64 per row (callers pass bounded
    integer units, same as every money column here). Merge via
    ``merge_partials`` (guarded driver default / partitioned)."""
    import pandas as _pd

    def precombine(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({**{k: batch[k] for k in keys},
                      "_wv": pa.array(w * v), "_w": pa.array(w)})
        part = t.group_by(keys).aggregate([("_wv", "sum"), ("_w", "sum")])
        return part.rename_columns(keys + ["_swv", "_sw"])

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    g = merge_partials(partials, keys, [("_swv", "sum"), ("_sw", "sum")],
                       mode=mode)
    swv = g["_swv"].to_numpy().astype(np.int64)
    sw = g["_sw"].to_numpy().astype(np.int64)
    out = g[keys].copy()
    out["sum_weight"] = sw
    out["weighted_avg"] = swv / np.maximum(sw, 1)
    return _pd.DataFrame(out)
