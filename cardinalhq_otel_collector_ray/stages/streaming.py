"""Incremental (micro-batch) interval aggregation — the reference's
absorb-and-re-emit state machine, kept across consume calls.

The batch engine collapses C2 to one groupby; this module preserves the
STREAMING shape for stream-shaped inputs (ordered, partitioned log —
ray_guide "Streaming-shaped workloads"): a ``MicroBatchAggregator`` holds
interval state exactly like ``MetricAggregator.MatchAndAdd``
(``processor/aggregationprocessor/aggregate.go:193-294``) and emits closed
intervals on every consume — but closure is decided by an event-time
WATERMARK (max ts seen − allowed lateness), not wall clock
(``metrics.go:85``; SURVEY §2.4 documents this as the deterministic
improvement).

Distribution shape: one actor per key-hash bucket
(``streaming_interval_aggregate``), fed batches in per-bucket ts order —
the partitioning assumption is the SAME per-key ordering every temporal
operator here relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


class MicroBatchAggregator:
    """Incremental interval state: consume(batch) → emitted closed rows.

    State: {(interval, *key): [sum, count, min, max]} — the in-heap
    aggregation set of ``aggregationProcessor`` (SURVEY §3.4), owned by one
    actor so global correctness holds per key bucket.
    """

    def __init__(self, keys: list[str], ts_col: str, value_col: str,
                 interval_ms: int, allowed_lateness_ms: int = 0,
                 late_policy: str = "absorb"):
        if late_policy not in ("absorb", "drop"):
            raise ValueError(f"late_policy must be 'absorb' or 'drop', "
                             f"got {late_policy!r}")
        self.keys = keys
        self.ts_col = ts_col
        self.value_col = value_col
        self.interval_ms = interval_ms
        self.lateness = allowed_lateness_ms
        self.late_policy = late_policy
        self.late_dropped = 0
        self.state: dict = {}
        self.watermark = -(2**62)

    def consume(self, batch: pa.Table) -> pa.Table:
        """Absorb a micro-batch; return rows for every interval the new
        watermark closes (emit shape: ts = interval start, C3).

        Late records — rows whose interval the CURRENT watermark already
        closed — follow ``late_policy``: ``"absorb"`` re-opens the interval
        and re-emits it at the next closure (a second row for the same
        (interval, keys) — downstream must merge), ``"drop"`` discards the
        row and counts it in ``late_dropped`` (each (interval, keys) is
        emitted exactly ONCE, the shape a sink can ingest verbatim). The
        watermark itself always advances over ALL arrivals, including
        dropped ones (a late row's ts is below the watermark by
        definition, so this is observably identical — documented for the
        oracle's benefit).

        Per-batch PRE-COMBINE first (one C++ ``group_by`` shrinks the batch
        to ≤G partial rows), then a Python merge over only those partials —
        never a row loop over the raw micro-batch."""
        t = batch.select(self.keys + [self.ts_col, self.value_col])
        ts = t[self.ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wm_advance = int(ts.max()) if len(ts) else None
        iv = (ts // self.interval_ms) * self.interval_ms
        if self.late_policy == "drop" and len(ts):
            boundary = (self.watermark // self.interval_ms) * self.interval_ms
            late = iv + self.interval_ms <= boundary
            if late.any():
                self.late_dropped += int(late.sum())
                keep = ~late
                t = t.filter(pa.array(keep))
                iv = iv[keep]
        v = self.value_col
        part = t.append_column("_iv", pa.array(iv)) \
            .group_by(["_iv", *self.keys]) \
            .aggregate([(v, "sum"), (v, "count"), (v, "min"), (v, "max")])
        ivs = part["_iv"].to_numpy(zero_copy_only=False)
        key_cols = [part[k].to_numpy(zero_copy_only=False) for k in self.keys]
        sums = part[f"{v}_sum"].to_numpy(zero_copy_only=False)
        counts = part[f"{v}_count"].to_numpy(zero_copy_only=False)
        mins = part[f"{v}_min"].to_numpy(zero_copy_only=False)
        maxs = part[f"{v}_max"].to_numpy(zero_copy_only=False)
        for i in range(part.num_rows):  # ≤ G partial rows, not batch rows
            k = (int(ivs[i]), *(c[i] for c in key_cols))
            s = self.state.get(k)
            if s is None:
                self.state[k] = [sums[i], int(counts[i]), mins[i], maxs[i]]
            else:
                s[0] += sums[i]
                s[1] += int(counts[i])
                if mins[i] < s[2]:
                    s[2] = mins[i]
                if maxs[i] > s[3]:
                    s[3] = maxs[i]
        if wm_advance is not None:
            self.watermark = max(self.watermark, wm_advance - self.lateness)
        return self._emit_closed()

    def _emit_closed(self) -> pa.Table:
        closed_boundary = (self.watermark // self.interval_ms) * self.interval_ms
        done = [k for k in self.state if k[0] + self.interval_ms <= closed_boundary]
        rows = []
        for k in sorted(done):
            s = self.state.pop(k)
            rows.append((k[0], *k[1:], s[0], s[1], s[2], s[3]))
        cols = ["interval_start", *self.keys, "agg_sum", "agg_count",
                "agg_min", "agg_max"]
        if not rows:
            return pa.table({c: pa.array([]) for c in cols})
        arrays = list(zip(*rows))
        return pa.table({c: pa.array(list(a)) for c, a in zip(cols, arrays)})

    def flush(self) -> pa.Table:
        """End-of-stream: emit everything (watermark → ∞)."""
        self.watermark = 2**62
        return self._emit_closed()


@ray.remote
class _BucketAggregator:
    def __init__(self, **kwargs):
        self.inner = MicroBatchAggregator(**kwargs)

    def consume(self, batch: pa.Table) -> pa.Table:
        return self.inner.consume(batch)

    def consume_many(self, batches: list) -> pa.Table:
        """Consume several micro-batches in ONE actor call — the state
        machine still sees them one at a time (identical watermark /
        late semantics); only the driver→actor submission overhead is
        amortized (8 000 tiny .remote() calls ≈ seconds of pure driver
        dispatch at 50-row chunks)."""
        outs = [self.inner.consume(b) for b in batches]
        real = [t for t in outs if t.num_rows]
        if not real:
            return outs[0] if outs else pa.table({})
        return pa.concat_tables(real, promote_options="default")

    def flush(self) -> pa.Table:
        return self.inner.flush()

    def late_count(self) -> int:
        return self.inner.late_dropped


def streaming_interval_aggregate(batches, *, keys: list[str], ts_col: str,
                                 value_col: str, interval_ms: int,
                                 key_col_for_bucket: str, num_buckets: int = 4,
                                 allowed_lateness_ms: int = 0,
                                 late_policy: str = "absorb",
                                 bucket_col: str | None = None,
                                 max_pending: int = 64,
                                 calls_per_rpc: int = 1,
                                 return_late_count: bool = False):
    """Drive an actor-per-bucket incremental aggregation over an iterator of
    Arrow micro-batches (a stream tail / kafka-partition analog). Records
    route to ``hash(key) % num_buckets`` actors; per-bucket arrival order is
    preserved by ACTOR TASK ORDERING (an actor executes its calls in
    submission order), so ingestion is fully PIPELINED — no per-batch
    ``ray.get`` barrier; results are collected in ``max_pending`` windows
    (bounds driver memory and applies backpressure). Returns the full
    emitted table (incremental emissions + final flush).

    ``bucket_col`` names a NUMERIC column used directly as ``value %
    num_buckets`` instead of hashing ``key_col_for_bucket`` — callers that
    need a reproducible (e.g. SQL-expressible) actor assignment precompute
    it; the routing contract is unchanged (every row of a group key MUST
    map to one bucket, since interval state is per-actor — so
    ``bucket_col`` must be a function of the group keys). ``late_policy``
    and the watermark are per ACTOR (per bucket): a bucket only observes
    its own sub-stream, exactly like a kafka-partition consumer.
    ``return_late_count=True`` returns ``(table, late_dropped_total)`` —
    the per-stage metric the north rule asks sinks to emit.
    ``calls_per_rpc`` groups that many consecutive per-bucket sub-batches
    into one actor call (``consume_many``) — pure submission-overhead
    amortization, the state machine is unchanged; raise it when the
    micro-batches are tiny relative to the stream (50-row chunks at
    100k+ rows)."""
    actors = [_BucketAggregator.remote(keys=keys, ts_col=ts_col,
                                       value_col=value_col,
                                       interval_ms=interval_ms,
                                       allowed_lateness_ms=allowed_lateness_ms,
                                       late_policy=late_policy)
              for _ in range(num_buckets)]
    emitted = []
    pending: list = []
    bufs: list = [[] for _ in range(num_buckets)]

    def _submit(b: int) -> None:
        if not bufs[b]:
            return
        if len(bufs[b]) == 1:
            pending.append(actors[b].consume.remote(bufs[b][0]))
        else:
            pending.append(actors[b].consume_many.remote(bufs[b]))
        bufs[b] = []

    for batch in batches:
        if bucket_col is not None:
            bucket = (batch[bucket_col].to_numpy(zero_copy_only=False)
                      .astype(np.int64) % num_buckets)
        else:
            h = pd.util.hash_array(
                np.asarray(batch[key_col_for_bucket].to_pylist(), dtype=object))
            bucket = (h % np.uint64(num_buckets)).astype(np.int64)
        for b in range(num_buckets):
            sub = batch.filter(pa.array(bucket == b))
            if sub.num_rows:
                bufs[b].append(sub)
                if len(bufs[b]) >= calls_per_rpc:
                    _submit(b)
        if len(pending) >= max_pending:
            # drain the OLDEST half only (sliding window, not a barrier):
            # the youngest calls stay in flight so every actor's queue
            # keeps feeding while the driver collects
            half = len(pending) // 2
            emitted.extend(ray.get(pending[:half]))
            pending = pending[half:]
    for b in range(num_buckets):
        _submit(b)
    pending.extend(a.flush.remote() for a in actors)
    emitted.extend(ray.get(pending))
    real = [t for t in emitted if t.num_rows]
    if not real:
        out = emitted[0] if emitted else pa.table({})
    else:
        out = pa.concat_tables(real, promote_options="default")
    if return_late_count:
        late = sum(ray.get([a.late_count.remote() for a in actors]))
        return out, late
    return out


class StreamingDeduper:
    """Incremental interval log-dedup — the logdedupprocessor's TRUE
    streaming shape (``distribution/components.go:133``): per (interval,
    key-set) keep the FIRST row (min (ts, tiebreak)) plus a suppressed
    count, state held across consume calls and evicted by the same
    event-time watermark as `MicroBatchAggregator`.

    Per-batch pre-combine: one C++ ``group_by`` reduces the micro-batch
    to ≤G (interval, keys) partials carrying a PACKED (ts, tiebreak)
    min — the Python merge then touches only partials. Emits each closed
    interval's (keys, interval, first_ts, tiebreak, count).

    ``late_policy`` mirrors `MicroBatchAggregator`: a late row (its
    interval already closed by the watermark) under ``"absorb"`` re-opens
    the interval and re-emits a second suppressed-count row; under
    ``"drop"`` it is discarded and counted in ``late_dropped``, so each
    (interval, keys) is emitted exactly once."""

    def __init__(self, keys: list[str], ts_col: str, tiebreak_col: str,
                 interval_ms: int, allowed_lateness_ms: int = 0,
                 late_policy: str = "absorb"):
        if late_policy not in ("absorb", "drop"):
            raise ValueError(f"late_policy must be 'absorb' or 'drop', "
                             f"got {late_policy!r}")
        self.keys = keys
        self.ts_col = ts_col
        self.tb_col = tiebreak_col
        self.interval_ms = interval_ms
        self.lateness = allowed_lateness_ms
        self.late_policy = late_policy
        self.late_dropped = 0
        self.state: dict = {}          # key → [packed_min, count]
        self.watermark = -(2**62)
        self._B = np.int64(1) << np.int64(31)

    def consume(self, batch: pa.Table) -> pa.Table:
        ts = batch[self.ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tb = batch[self.tb_col].to_numpy(zero_copy_only=False).astype(np.int64)
        wm_advance = int(ts.max()) if len(ts) else None
        iv = (ts // self.interval_ms) * self.interval_ms
        packed = ts * self._B + tb     # contract: 0 ≤ tiebreak < 2³¹
        keycols = {k: batch[k] for k in self.keys}
        if self.late_policy == "drop" and len(ts):
            boundary = (self.watermark // self.interval_ms) * self.interval_ms
            late = iv + self.interval_ms <= boundary
            if late.any():
                self.late_dropped += int(late.sum())
                keep = ~late
                mask = pa.array(keep)
                keycols = {k: batch[k].filter(mask) for k in self.keys}
                iv, packed = iv[keep], packed[keep]
        t = pa.table({**keycols,
                      "_iv": pa.array(iv), "_p": pa.array(packed)})
        part = t.group_by(["_iv", *self.keys]).aggregate(
            [("_p", "min"), ("_p", "count")])
        ivs = part["_iv"].to_numpy(zero_copy_only=False)
        key_cols = [part[k].to_numpy(zero_copy_only=False) for k in self.keys]
        pmin = part["_p_min"].to_numpy(zero_copy_only=False)
        cnt = part["_p_count"].to_numpy(zero_copy_only=False)
        for i in range(part.num_rows):      # ≤ G partials, not batch rows
            k = (int(ivs[i]), *(c[i] for c in key_cols))
            s = self.state.get(k)
            if s is None:
                self.state[k] = [int(pmin[i]), int(cnt[i])]
            else:
                if pmin[i] < s[0]:
                    s[0] = int(pmin[i])
                s[1] += int(cnt[i])
        if wm_advance is not None:
            self.watermark = max(self.watermark, wm_advance - self.lateness)
        return self._emit_closed()

    def _emit_closed(self) -> pa.Table:
        boundary = (self.watermark // self.interval_ms) * self.interval_ms
        done = [k for k in self.state
                if k[0] + self.interval_ms <= boundary]
        rows = []
        for k in sorted(done):
            p, c = self.state.pop(k)
            rows.append((k[0], *k[1:], p // int(self._B),
                         p % int(self._B), c))
        cols = ["interval_start", *self.keys, "first_ts", "first_tiebreak",
                "n_dropped_plus_one"]
        if not rows:
            return pa.table({c: pa.array([]) for c in cols})
        arrays = list(zip(*rows))
        return pa.table({c: pa.array(list(a)) for c, a in zip(cols, arrays)})

    def flush(self) -> pa.Table:
        self.watermark = 2**62
        return self._emit_closed()


class StreamingSessionizer:
    """Incremental session windows — the streaming shape of `sessionize`:
    per key an OPEN session (start, last_ts, n) survives across consume
    calls; a session closes when the event-time watermark passes
    ``last_ts + gap_ms`` (no later event can extend it) and emits
    (key, session_start, session_end, n_events).

    Contract: per-key arrival in ts order (the same per-bucket ordering
    every streaming stage here relies on). Per-batch pre-combine: the
    batch's own session structure is computed with the segmented numpy
    kernel (one sort, reduceat) and only each key's FIRST/LAST batch
    sessions touch the Python state — interior sessions emit directly."""

    def __init__(self, key: str, ts_col: str, gap_ms: int):
        self.key = key
        self.ts_col = ts_col
        self.gap = gap_ms
        self.open: dict = {}      # key → [start, last_ts, n]
        self.watermark = -(2**62)
        self._emitted = []

    def consume(self, batch: pa.Table) -> pa.Table:
        df = batch.select([self.key, self.ts_col]).to_pandas()
        df = df.sort_values([self.key, self.ts_col],
                            kind="mergesort").reset_index(drop=True)
        n = len(df)
        rows = []
        if n:
            ts = df[self.ts_col].to_numpy().astype(np.int64)
            kv = df[self.key].to_numpy()
            new_key = np.zeros(n, dtype=bool)
            new_key[0] = True
            new_key[1:] = kv[1:] != kv[:-1]
            new_sess = new_key.copy()
            new_sess[1:] |= (ts[1:] - ts[:-1]) > self.gap
            starts = np.flatnonzero(new_sess)
            ends = np.append(starts[1:], n) - 1
            counts = np.diff(np.append(starts, n))
            key_of = kv[starts]
            first_of_key = new_key[starts]
            for i in range(len(starts)):      # ≤ sessions in batch, not rows
                k, s, e, c = key_of[i], int(ts[starts[i]]), int(ts[ends[i]]), int(counts[i])
                st = self.open.get(k)
                if first_of_key[i] and st is not None:
                    if s - st[1] <= self.gap:     # continues the open session
                        s, c = st[0], st[2] + c   # merged; falls through
                    else:
                        rows.append((k, st[0], st[1], st[2]))  # closed by gap
                    del self.open[k]
                is_last_of_key = (i + 1 == len(starts)) or key_of[i + 1] != k
                if is_last_of_key:
                    self.open[k] = [s, e, c]      # may still be extended
                else:
                    rows.append((k, s, e, c))     # interior session: final
            self.watermark = max(self.watermark, int(ts.max()))
        # watermark closes idle open sessions
        done = [k for k, st in self.open.items()
                if self.watermark - st[1] > self.gap]
        for k in sorted(done):
            st = self.open.pop(k)
            rows.append((k, st[0], st[1], st[2]))
        return self._table(rows)

    def flush(self) -> pa.Table:
        rows = [(k, st[0], st[1], st[2])
                for k, st in sorted(self.open.items())]
        self.open.clear()
        return self._table(rows)

    def _table(self, rows) -> pa.Table:
        cols = [self.key, "session_start", "session_end", "n_events"]
        if not rows:
            return pa.table({c: pa.array([]) for c in cols})
        arrays = list(zip(*rows))
        return pa.table({c: pa.array(list(a)) for c, a in zip(cols, arrays)})
