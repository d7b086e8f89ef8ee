"""Join operators.

The reference has NO stream-stream joins (SURVEY §2.2 "Not present
anywhere") — its only join is the small-dictionary lookup (C9). A
training-data engine needs real joins, so two Ray-Data-native shapes:

- ``broadcast_join``: small side ``ray.put`` once, pandas merge per batch
  inside ``map_batches`` — no shuffle, the C9 pattern generalized to full
  rows. Use whenever one side fits in worker memory (dimension tables).
- ``bucketed_hash_join``: both sides large — add ``bucket = hash(key) % B``
  to each side, ``groupby(bucket)`` the union, join within each bucket.
  One explicit co-partitioning shuffle; document B and salt hot keys by
  raising B. This is the portable partitioned hash join (ray_guide
  pattern) — independent of whether this Ray version ships Dataset.join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def broadcast_join(ds: ray.data.Dataset, small: pd.DataFrame, on: str,
                   how: str = "left", suffix: str = "_r") -> ray.data.Dataset:
    """Join against a driver-side small table, broadcast once via ray.put."""
    ref = ray.put(small)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)  # node-local plasma hit after first task
        return df.merge(rhs, on=on, how=how, suffixes=("", suffix))
    return ds.map_batches(fn, batch_format="pandas")


def semi_join(ds: ray.data.Dataset, keys, on: str,
              anti: bool = False) -> ray.data.Dataset:
    """Semi/anti join via a broadcast key set (filter inside map_batches)."""
    key_arr = np.sort(np.asarray(list(keys)))
    ref = ray.put(key_arr)

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        col = batch[on].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ks, col)
        pos = np.minimum(pos, max(len(ks) - 1, 0))
        mask = (ks[pos] == col) if len(ks) else np.zeros(len(col), bool)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))
    return ds.map_batches(fn, batch_format="pyarrow")


def bucketed_hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
                       on, num_buckets: int = 32,
                       how: str = "inner") -> ray.data.Dataset:
    """Partitioned hash join of two large datasets on one integer key or
    a COMPOSITE key (``on`` may be a column name or a list of them).

    Both sides get ``_bucket = hash(key columns) % num_buckets`` (the
    engine's canonical ``table_key_hash`` for composites) and a ``_side``
    tag, are unioned, co-partitioned by ONE ``groupby(_bucket)`` shuffle,
    and merged per bucket with pandas ON THE REAL KEY COLUMNS (the bucket
    hash only co-locates; equality is exact). Columns common to both
    sides (other than the keys) get a ``_r`` suffix on the right. Skewed
    keys: raise ``num_buckets`` or use `salted_hash_join`.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    # Union requires one schema: suffix right-side name collisions, then
    # give each side typed-NA placeholders for the other side's columns.
    # ds.schema() is plan metadata (first-block at worst) — never re-executes
    # the upstream pipeline the way a take_batch(1) sample would.
    l_schema, r_schema = left.schema(), right.schema()
    lcols, rcols = list(l_schema.names), list(r_schema.names)
    collide = (set(lcols) & set(rcols)) - set(on_cols)
    r_renames = {c: c + "_r" for c in collide}
    r_out = [r_renames.get(c, c) for c in rcols]
    all_cols = on_cols + [c for c in lcols if c not in on_cols] + \
               [c for c in r_out if c not in on_cols]

    arrow_types = dict(zip(l_schema.names, l_schema.types))
    for name, t in zip(r_schema.names, r_schema.types):
        arrow_types.setdefault(r_renames.get(name, name), t)

    from ..functions.hashing import table_key_hash

    def tag(side_code: int):
        # Arrow-native tagging: typed-null placeholders (pa.nulls — no
        # pandas conversion/copies), vectorized bucket hash, int8 side
        def fn(t: pa.Table) -> pa.Table:
            if side_code == 1:
                t = t.rename_columns([r_renames.get(c, c)
                                      for c in t.column_names])
            n = t.num_rows
            cols = {c: (t[c] if c in t.column_names
                        else pa.nulls(n, arrow_types[c])) for c in all_cols}
            if len(on_cols) == 1 and pa.types.is_integer(t[on_cols[0]].type):
                k = t[on_cols[0]].to_numpy(zero_copy_only=False).astype(np.int64)
                b = ((k * np.int64(2654435761) + np.int64(12345))
                     % np.int64(num_buckets)).astype(np.int32)
            else:
                b = (table_key_hash(t, on_cols)
                     % np.uint64(num_buckets)).astype(np.int32)
            cols["_bucket"] = pa.array(b)
            cols["_side"] = pa.array(np.full(n, side_code, dtype=np.int8))
            return pa.table(cols)
        return fn

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")
    both = lt.union(rt)
    l_keep = on_cols + [c for c in lcols if c not in on_cols]
    r_keep = on_cols + [c for c in r_out if c not in on_cols]

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        # split sides FIRST, then select each side's own (null-free)
        # columns — dtypes survive the pandas conversion intact
        lmask = pc.equal(g["_side"], 0)
        l = g.filter(lmask).select(l_keep).to_pandas()
        r = g.filter(pc.invert(lmask)).select(r_keep).to_pandas()
        return l.merge(r, on=on_cols, how=how)

    return both.groupby("_bucket").map_groups(join_bucket,
                                              batch_format="pyarrow")


# --- Bloom-filter semi-join -------------------------------------------------
#
# For "big table ∈ medium key set" where the key set is too large to
# broadcast exactly but its BLOOM BITMAP is small: build the bitmap
# distributed over the key side, OR the per-block partials in a tree, then
# prefilter the big side with the broadcast bitmap (drops most non-matching
# rows before any shuffle) and finish with an exact co-partitioned
# semi-join of the few survivors. Result is EXACT — the bloom only prunes.


def _bloom_positions(h: np.ndarray, num_bits: int, num_hashes: int):
    """Double-hashing positions (Kirsch–Mitzenmacher): pos_i = h1 + i*h2."""
    h = h.astype(np.uint64)
    with np.errstate(over="ignore"):
        h2 = (h * np.uint64(0xFF51AFD7ED558CCD) + np.uint64(0xC4CEB9FE1A85EC53)) | np.uint64(1)
        for i in range(num_hashes):
            yield ((h + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.int64)


def build_bloom_filter(ds: ray.data.Dataset, on: str,
                       num_bits: int = 1 << 22,
                       num_hashes: int = 4) -> np.ndarray:
    """Distributed bloom build: per-block fixed-size bitmap partials
    (num_bits/8 bytes each, independent of row count), one tree-merge OR
    level (≤32 bitmaps per task), driver ORs the handful that remain.
    Returns the uint64-word bitmap."""
    from ..functions.hashing import table_key_hash

    n_words = num_bits // 64

    def block_bitmap(batch: pa.Table) -> pa.Table:
        bm = np.zeros(n_words, dtype=np.uint64)
        h = table_key_hash(batch, [on])
        for pos in _bloom_positions(h, num_bits, num_hashes):
            np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.large_binary())})

    partials = ds.map_batches(block_bitmap, batch_format="pyarrow")

    def or_merge(batch: pa.Table) -> pa.Table:
        acc = np.zeros(n_words, dtype=np.uint64)
        for buf in batch["bm"]:
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], type=pa.large_binary())})

    merged = partials.map_batches(or_merge, batch_format="pyarrow",
                                  batch_size=32)
    acc = np.zeros(n_words, dtype=np.uint64)
    for b in merged.iter_batches(batch_format="pyarrow", batch_size=None):
        for buf in b["bm"]:
            acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return acc


def bloom_prefilter(ds: ray.data.Dataset, on: str, bitmap: np.ndarray,
                    num_hashes: int = 4) -> ray.data.Dataset:
    """Keep rows whose key MIGHT be in the set (no false negatives).
    Bitmap broadcast once; test is vectorized bit math per batch."""
    from ..functions.hashing import table_key_hash

    num_bits = len(bitmap) * 64
    ref = ray.put(bitmap)

    def fn(batch: pa.Table) -> pa.Table:
        bm = ray.get(ref)
        h = table_key_hash(batch, [on])
        mask = np.ones(len(h), dtype=bool)
        for pos in _bloom_positions(h, num_bits, num_hashes):
            mask &= (bm[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1) != 0
        return batch.filter(pa.array(mask))
    return ds.map_batches(fn, batch_format="pyarrow")


def partitioned_semi_join(left: ray.data.Dataset, right: ray.data.Dataset,
                          on: str, num_buckets: int = 32,
                          anti: bool = False) -> ray.data.Dataset:
    """Exact distributed semi(/anti)-join: co-partition both sides by key
    hash (one shuffle), filter left rows against the right key set within
    each bucket. Left columns pass through unchanged."""
    from ..functions.hashing import table_key_hash

    l_schema = left.schema()
    lcols = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))

    def tag(side_code: int, keep_key_only: bool):
        def fn(t: pa.Table) -> pa.Table:
            h = table_key_hash(t, [on])
            bucket = pa.array((h % np.uint64(num_buckets)).astype(np.int32))
            if keep_key_only:
                t = t.select([on])
                for c in lcols:
                    if c != on:
                        t = t.append_column(c, pa.nulls(t.num_rows,
                                                        l_types[c]))
                t = t.select(lcols)
            return (t.append_column("_bucket", bucket)
                     .append_column("_side", pa.array(
                         np.full(t.num_rows, side_code, dtype=np.int8))))
        return fn

    lt = left.map_batches(tag(0, False), batch_format="pyarrow")
    rt = right.map_batches(tag(1, True), batch_format="pyarrow")

    def filter_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["_side"], 0)
        l = g.filter(lmask).select(lcols)
        rk = np.unique(g.filter(pc.invert(lmask))[on]
                       .to_numpy(zero_copy_only=False))
        lk = l[on].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rk, lk)
        pos = np.minimum(pos, max(len(rk) - 1, 0))
        mask = (rk[pos] == lk) if len(rk) else np.zeros(len(lk), bool)
        return l.filter(pa.array(~mask if anti else mask))

    return (lt.union(rt).groupby("_bucket")
              .map_groups(filter_bucket, batch_format="pyarrow"))


def bloom_semi_join(left: ray.data.Dataset, right: ray.data.Dataset,
                    on: str, num_bits: int = 1 << 22, num_hashes: int = 4,
                    num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT semi-join at scale: bloom prefilter (bitmap built distributed
    over the right side, broadcast once) prunes the big left side before
    the only shuffle; exact co-partitioned semi-join of the survivors
    removes bloom false positives."""
    bitmap = build_bloom_filter(right, on, num_bits, num_hashes)
    pruned = bloom_prefilter(left, on, bitmap, num_hashes)
    return partitioned_semi_join(pruned, right, on, num_buckets=num_buckets)


def interval_join(left: ray.data.Dataset, right: ray.data.Dataset,
                  ts_col: str, start_col: str, end_col: str,
                  bucket_width: int) -> ray.data.Dataset:
    """Range join: left rows (point ``ts``) × right rows (interval
    ``[start, end)``), matched on containment — the operator Ray Data has
    no native shape for.

    Bucketing makes it one co-partitioning shuffle: every point lands in
    bucket ``ts // width``; every interval is REPLICATED to each bucket it
    overlaps (vectorized repeat — no Python loop); a (point, interval)
    match can only meet in the point's bucket, so no pair dedup is needed.

    Partitioning assumptions (document per call site): pick ``bucket_width``
    near the typical interval length so replication stays O(1) per
    interval, and intervals-per-bucket stays bounded (the per-bucket kernel
    loops over LOCAL intervals with a vectorized point mask each).
    Output: left columns + right columns (collisions suffixed ``_r``).
    """
    l_schema, r_schema = left.schema(), right.schema()
    lcols, rcols = list(l_schema.names), list(r_schema.names)
    collide = set(lcols) & set(rcols)
    r_renames = {c: c + "_r" for c in collide}
    r_out = [r_renames.get(c, c) for c in rcols]
    all_cols = lcols + r_out
    types = dict(zip(lcols, l_schema.types))
    for name, t in zip(rcols, r_schema.types):
        types.setdefault(r_renames.get(name, name), t)

    def tag_left(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {c: (t[c] if c in t.column_names else pa.nulls(t.num_rows, types[c]))
                for c in all_cols}
        cols["_bucket"] = pa.array(ts // np.int64(bucket_width))
        cols["_side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        return pa.table(cols)

    def replicate_right(t: pa.Table) -> pa.Table:
        t = t.rename_columns([r_renames.get(c, c) for c in t.column_names])
        s = t[r_renames.get(start_col, start_col)].to_numpy(zero_copy_only=False).astype(np.int64)
        e = t[r_renames.get(end_col, end_col)].to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = s // np.int64(bucket_width)
        b1 = np.maximum(e - 1, s) // np.int64(bucket_width)
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), reps)
        # within-interval bucket offset: global arange minus each row's start
        offs = np.arange(len(idx), dtype=np.int64) - np.repeat(
            np.cumsum(np.r_[0, reps[:-1]]), reps)
        rep = t.take(pa.array(idx))
        cols = {c: (rep[c] if c in rep.column_names
                    else pa.nulls(len(idx), types[c])) for c in all_cols}
        cols["_bucket"] = pa.array(b0[idx] + offs)
        cols["_side"] = pa.array(np.ones(len(idx), dtype=np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(replicate_right, batch_format="pyarrow")
    rs_col = r_renames.get(start_col, start_col)
    re_col = r_renames.get(end_col, end_col)

    def join_bucket(g: pa.Table) -> pa.Table:
        lmask = pc.equal(g["_side"], 0)
        l = g.filter(lmask).select(lcols)
        r = g.filter(pc.invert(lmask)).select(r_out)
        ts = l[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rs = r[rs_col].to_numpy(zero_copy_only=False).astype(np.int64)
        re = r[re_col].to_numpy(zero_copy_only=False).astype(np.int64)
        l_take, r_take = [], []
        for j in range(len(rs)):  # bounded: intervals per bucket
            hit = np.flatnonzero((ts >= rs[j]) & (ts < re[j]))
            l_take.append(hit)
            r_take.append(np.full(len(hit), j, dtype=np.int64))
        if not l_take:
            l_idx = np.empty(0, dtype=np.int64)
            r_idx = np.empty(0, dtype=np.int64)
        else:
            l_idx = np.concatenate(l_take)
            r_idx = np.concatenate(r_take)
        out = l.take(pa.array(l_idx))
        for c in r_out:
            out = out.append_column(c, r[c].take(pa.array(r_idx)))
        return out

    return (lt.union(rt).groupby("_bucket")
              .map_groups(join_bucket, batch_format="pyarrow"))


def salted_hash_join(left: ray.data.Dataset, right: ray.data.Dataset,
                     on: str, salt_from: str, *, num_buckets: int = 32,
                     salt: int = 8, hot_share: float = 0.05,
                     how: str = "inner") -> ray.data.Dataset:
    """Skew-aware bucketed hash join: HOT join keys are split across
    ``salt`` sub-buckets instead of landing in one worker.

    Phase 1 detects hot keys with per-block count partials (each block
    contributes its locally-heavy candidates — a bounded superset, the
    `exact_heavy_hitters` discipline) and broadcasts the tiny hot set.
    Phase 2: LEFT rows of a hot key get ``salt_id = mulhash(salt_from) %
    salt`` (a pure row property — deterministic under retries); RIGHT
    rows of a hot key are REPLICATED once per salt id. Bucket =
    hash(key)·salt + salt_id, so each hot key's work spreads over
    ``salt`` buckets while cold keys pay nothing. Join semantics are
    identical to `bucketed_hash_join` (each left row still meets every
    matching right row exactly once)."""
    from ..functions.hashing import mulhash

    # --- phase 1: bounded hot-key detection over the LEFT side ----------
    def block_counts(batch: pa.Table) -> pa.Table:
        part = batch.select([on]).group_by([on]).aggregate([(on, "count")])
        t = part.rename_columns([on, "_n"])
        n_b = batch.num_rows
        mask = pc.greater(pc.multiply(t["_n"].cast(pa.float64()),
                                      pa.scalar(1.0 / max(hot_share, 1e-9))),
                          pa.scalar(float(n_b)))
        cand = t.filter(mask)
        return pa.concat_tables([
            pa.table({on: cand[on], "_n": cand["_n"].cast(pa.int64()),
                      "_tot": pa.array(np.zeros(cand.num_rows, np.int64))}),
            pa.table({on: pa.nulls(1, batch[on].type),
                      "_n": pa.array([0], pa.int64()),
                      "_tot": pa.array([n_b], pa.int64())}),
        ])

    phase1 = left.map_batches(block_counts, batch_format="pyarrow").to_pandas()
    total = int(phase1["_tot"].sum())
    cand = phase1[phase1[on].notna()]
    recount = cand.groupby(on, as_index=False)["_n"].sum()
    hot = np.sort(recount.loc[recount["_n"] > hot_share * total, on]
                  .to_numpy().astype(np.int64))
    hot_ref = ray.put(hot)

    S = np.int64(max(salt, 1))

    def _is_hot(keys: np.ndarray) -> np.ndarray:
        h = ray.get(hot_ref)
        if not len(h):
            return np.zeros(len(keys), dtype=bool)
        pos = np.minimum(np.searchsorted(h, keys), len(h) - 1)
        return h[pos] == keys

    def tag_left(batch: pa.Table) -> pa.Table:
        keys = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        sid = np.where(_is_hot(keys),
                       mulhash(batch[salt_from].to_numpy(
                           zero_copy_only=False)) % S,
                       0).astype(np.int64)
        return batch.append_column("_salt", pa.array(sid))

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        hot_mask = _is_hot(keys)
        cold = batch.filter(pa.array(~hot_mask)).append_column(
            "_salt", pa.array(np.zeros(int((~hot_mask).sum()), np.int64)))
        hot_rows = batch.filter(pa.array(hot_mask))
        if hot_rows.num_rows == 0:
            return cold
        reps = []
        for s in range(int(S)):
            reps.append(hot_rows.append_column(
                "_salt", pa.array(np.full(hot_rows.num_rows, s, np.int64))))
        return pa.concat_tables([cold] + reps)

    # same union + ONE co-partition shuffle as bucketed_hash_join, with a
    # composite (hash(key), salt) bucket and the merge on the REAL key
    l_schema, r_schema = left.schema(), right.schema()
    lcols, rcols = list(l_schema.names), list(r_schema.names)
    collide = (set(lcols) & set(rcols)) - {on}
    r_renames = {c: c + "_r" for c in collide}
    r_out = [r_renames.get(c, c) for c in rcols]
    all_cols = [on] + [c for c in lcols if c != on] + \
               [c for c in r_out if c != on]
    arrow_types = dict(zip(l_schema.names, l_schema.types))
    for name, t in zip(r_schema.names, r_schema.types):
        arrow_types.setdefault(r_renames.get(name, name), t)

    def finish_tag(side_code: int, tag_salt):
        def fn(t: pa.Table) -> pa.Table:
            t = tag_salt(t)
            if side_code == 1:
                t = t.rename_columns([r_renames.get(c, c)
                                      for c in t.column_names])
            n = t.num_rows
            cols = {c: (t[c] if c in t.column_names
                        else pa.nulls(n, arrow_types[c])) for c in all_cols}
            k = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
            sid = t["_salt"].to_numpy(zero_copy_only=False)
            b = ((k * np.int64(2654435761) + np.int64(12345))
                 % np.int64(num_buckets)) * S + sid
            cols["_bucket"] = pa.array(b.astype(np.int32))
            cols["_side"] = pa.array(np.full(n, side_code, dtype=np.int8))
            return pa.table(cols)
        return fn

    lt = left.map_batches(finish_tag(0, tag_left), batch_format="pyarrow")
    rt = right.map_batches(finish_tag(1, tag_right), batch_format="pyarrow")
    l_keep = [on] + [c for c in lcols if c != on]
    r_keep = [on] + [c for c in r_out if c != on]

    def join_bucket(g: pa.Table):
        lmask = pc.equal(g["_side"], 0)
        l = g.filter(lmask).select(l_keep).to_pandas()
        r = g.filter(pc.invert(lmask)).select(r_keep).to_pandas()
        return l.merge(r, on=on, how=how)

    return (lt.union(rt).groupby("_bucket")
            .map_groups(join_bucket, batch_format="pyarrow"))


def bloom_anti_join(left: ray.data.Dataset, right: ray.data.Dataset,
                    on: str, num_bits: int = 1 << 22, num_hashes: int = 4,
                    num_buckets: int = 32) -> ray.data.Dataset:
    """EXACT anti-join with a bloom fast path: a bloom-NEGATIVE left row
    is *provably* absent from the right side, so it is kept immediately
    without ever entering the shuffle; only the bloom-positive minority
    (true matches + false positives) runs the exact co-partitioned
    anti-join. The two streams union to the exact result — on a
    mostly-non-matching left side (the common anti-join shape) almost
    nothing shuffles."""
    from ..functions.hashing import table_key_hash

    bitmap = build_bloom_filter(right, on, num_bits, num_hashes)
    nbits = len(bitmap) * 64
    bref = ray.put(bitmap)

    def split(keep_negative: bool):
        def fn(batch: pa.Table) -> pa.Table:
            bm = ray.get(bref)
            h = table_key_hash(batch, [on])       # same hash as the build
            hit = np.ones(len(h), dtype=bool)
            for pos in _bloom_positions(h, nbits, num_hashes):
                hit &= ((bm[pos >> 6] >> (pos & 63).astype(np.uint64))
                        & np.uint64(1)) != 0
            return batch.filter(pa.array(~hit if keep_negative else hit))
        return fn

    definite_out = left.map_batches(split(True), batch_format="pyarrow")
    maybe = left.map_batches(split(False), batch_format="pyarrow")
    checked = partitioned_semi_join(maybe, right, on,
                                    num_buckets=num_buckets, anti=True)
    return definite_out.union(checked)
