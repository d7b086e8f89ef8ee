"""Deduplication operators for training-data pipelines.

Extends the reference's dedup/fingerprint vocabulary (logdedup interval
dedup, ``distribution/components.go:133``; drain template mining ``:124``)
with the dedup family a 100 TB corpus pipeline needs:

- exact dedup (hash-partition + per-group first),
- MinHash + LSH near-dup (shingle → minhash → band → bucket groupby),
- SimHash with banded Hamming candidate generation,
- word-set Jaccard exact pairs (blocked, matmul-vectorized),
- embedding-cosine near-dup (blocked matmul).

Scale notes: every operator shuffles only *small derived rows* (hashes,
signatures, band keys) — never full documents; candidate verification
carries only signatures / set matrices per block. Hot buckets are bounded
with ``max_bucket`` guards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import round6, stable_str_hash64
from ..functions.text import char_shingles_u64, list_offsets_values, split_words

# dispatch="grid" builds a driver-side per-block plan; above this many
# distinct block values the partition dispatch is the right tool instead.
# Module-level so tests can monkeypatch it to exercise the guard.
GRID_MAX_BLOCKS = 1_000_000

# ---------------------------------------------------------------- exact dedup

def _content_part_tags(col, num_partitions: int) -> np.ndarray:
    """Deterministic int32 partition tag for a content column. The hash
    choice is a pure function of each VALUE's byte length — short values
    (≤ 64 B) hash zero-copy from the Arrow buffers (``bytes_hash64``,
    whose cost is one numpy pass per byte position, so it's bounded at 64
    passes); long document bodies go through SipHash's per-string C loop,
    which amortizes better. Because equal contents have equal lengths,
    duplicates take the same path in EVERY batch — a per-batch heuristic
    here would scatter the same content across partitions and break
    exact_dedup (caught in round-4 review)."""
    from ..functions.hashing import bytes_hash64
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    filled = pc.fill_null(col, "" if pa.types.is_string(col.type)
                          or pa.types.is_large_string(col.type) else b"")
    lens = pc.binary_length(filled).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    h = np.empty(n, dtype=np.uint64)
    short = lens <= 64
    if short.any():
        idx = np.flatnonzero(short)
        h[idx] = bytes_hash64(filled.take(pa.array(idx)))
    if not short.all():
        idx = np.flatnonzero(~short)
        h[idx] = stable_str_hash64(filled.take(pa.array(idx)).to_pylist())
    return (h % np.uint64(num_partitions)).astype(np.int32)


def exact_dedup(ds: ray.data.Dataset, content_col: str, id_col: str,
                num_partitions: int = 64) -> ray.data.Dataset:
    """Keep the min-id row per distinct content value (full rows).

    Hash-PARTITION by ``hash(content) % P`` (bounded partition count — one
    pandas groupby call per partition, never one Python call per distinct
    content); exact equality is re-checked within the partition, so hash
    collisions cannot merge distinct contents.
    SQL-equivalent: ``SELECT content, min(id) FROM t GROUP BY content``.

    SCALE NOTE (100 TB): this keep-the-row API shuffles FULL rows by
    ``_cpart`` — right when the deduped output is itself the product. When
    only the decision is needed, use ``exact_dedup_stats`` (shuffles only
    (content, min, count) partials) and finish with a semi-join of
    ``keep_id`` against the source — the corpus then never re-shuffles.
    """
    def add_part(batch: pa.Table) -> pa.Table:
        part = _content_part_tags(batch[content_col], num_partitions)
        return batch.append_column("_cpart", pa.array(part))

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values(id_col, kind="mergesort").groupby(
            content_col, sort=False, as_index=False).first()
        return keep.drop(columns=["_cpart"])

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    return parted.groupby("_cpart").map_groups(per_part, batch_format="pandas")


def exact_dedup_stats(ds: ray.data.Dataset, content_col: str, id_col: str,
                      num_partitions: int = 64,
                      coalesce_partials: bool = False) -> ray.data.Dataset:
    """Per distinct content: (content, keep_id=min(id), n_copies).

    Fully C++ two-phase: per-block pyarrow ``group_by(content)`` partials
    (tagged ``_cpart = hash(content) % P``) → ONE co-partitioning shuffle
    on the bounded int32 tag → per-partition C++ Min/Sum merge — no
    per-group Python calls, no high-cardinality string sort (the shuffle
    key domain is P values; exact content equality is re-checked inside
    the partition group_by, so hash collisions can't merge contents).
    SQL-equivalent: ``SELECT content, min(id), count(*) GROUP BY content``.
    """
    def precombine(batch: pa.Table) -> pa.Table:
        part = batch.select([content_col, id_col]).group_by([content_col]) \
            .aggregate([(id_col, "min"), (id_col, "count")])
        part = part.rename_columns([content_col, "_pmin", "_pn"])
        tag = _content_part_tags(part[content_col], num_partitions)
        return part.append_column("_cpart", pa.array(tag))

    def per_part(t: pa.Table) -> pa.Table:
        g = t.group_by([content_col]).aggregate(
            [("_pmin", "min"), ("_pn", "sum")])
        return g.rename_columns([content_col, "keep_id", "n_copies"])

    partials = ds.map_batches(precombine, batch_format="pyarrow")
    if coalesce_partials:  # many-block inputs: see CLAUDE.md sort-cost note
        partials = partials.repartition(num_partitions)
    return partials.groupby("_cpart").map_groups(per_part, batch_format="pyarrow")


_HIST_SENTINEL_ID = np.iinfo(np.int64).max


def dedup_against_history(new_ds: ray.data.Dataset,
                          history_ds: ray.data.Dataset,
                          content_col: str, id_col: str,
                          num_partitions: int = 64,
                          coalesce_partials: bool = False
                          ) -> ray.data.Dataset:
    """Incremental exact dedup: among NEW rows, keep the min-id per
    distinct content whose content does NOT appear in the HISTORY corpus
    (a prior run's output — the daily-increment pattern: dedup today's
    crawl against everything already ingested).

    Scale contract (both corpora can be 100 TB): neither side ever
    shuffles full rows. Each side pre-combines per block to skinny
    partials — new → (content, min id, count), history → distinct
    contents only — tagged with the SAME value-deterministic
    ``_cpart = hash(content) % P`` used by ``exact_dedup_stats``, so equal
    contents from either side co-locate in ONE bounded-tag shuffle. The
    per-partition finish is a single C++ ``group_by`` (min / sum / max on
    a history flag); exact content equality is re-checked there, so hash
    collisions cannot suppress a keep.

    Output: (content, keep_id, n_copies) — one row per distinct NEW
    content not present in history. ``n_copies`` counts its occurrences
    within the new increment.
    SQL-equivalent: ``SELECT content, min(id), count(*) FROM new
    WHERE content IS NOT NULL AND content NOT IN
    (SELECT content FROM history WHERE content IS NOT NULL)
    GROUP BY content``.

    NULL contract: null contents are EXCLUDED from both sides before the
    shuffle. Without the filter, Arrow's ``group_by`` treats null as an
    ordinary key, so one null row in history would silently suppress all
    null new rows — semantics no SQL equality join has (``h.text =
    n.text`` never matches NULL). Callers that care about null-content
    rows handle them upstream.
    """
    def pre_new(batch: pa.Table) -> pa.Table:
        batch = batch.filter(batch[content_col].is_valid())
        part = batch.select([content_col, id_col]).group_by([content_col]) \
            .aggregate([(id_col, "min"), (id_col, "count")])
        part = part.rename_columns([content_col, "_pmin", "_pn"])
        tag = _content_part_tags(part[content_col], num_partitions)
        n = part.num_rows
        return pa.table({
            content_col: part[content_col],
            "_pmin": part["_pmin"].cast(pa.int64()),
            "_pn": part["_pn"].cast(pa.int64()),
            "_hist": pa.array(np.zeros(n, dtype=np.int8)),
            "_cpart": pa.array(tag),
        })

    def pre_hist(batch: pa.Table) -> pa.Table:
        col = batch[content_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        distinct = col.unique().drop_null()
        tag = _content_part_tags(distinct, num_partitions)
        n = len(distinct)
        # sentinel id can never win a min against a real new-side id, and
        # history-hit groups are filtered out anyway
        return pa.table({
            content_col: distinct,
            "_pmin": pa.array(np.full(n, _HIST_SENTINEL_ID, dtype=np.int64)),
            "_pn": pa.array(np.zeros(n, dtype=np.int64)),
            "_hist": pa.array(np.ones(n, dtype=np.int8)),
            "_cpart": pa.array(tag),
        })

    def per_part(t: pa.Table) -> pa.Table:
        g = t.group_by([content_col]).aggregate(
            [("_pmin", "min"), ("_pn", "sum"), ("_hist", "max")])
        g = g.rename_columns([content_col, "keep_id", "n_copies", "_h"])
        fresh = g.filter(pc.equal(g["_h"], pa.scalar(np.int8(0))))
        return fresh.drop_columns(["_h"])

    partials = new_ds.map_batches(pre_new, batch_format="pyarrow") \
        .union(history_ds.map_batches(pre_hist, batch_format="pyarrow"))
    if coalesce_partials:  # many-block inputs: see CLAUDE.md sort-cost note
        partials = partials.repartition(num_partitions)
    return partials.groupby("_cpart").map_groups(per_part,
                                                 batch_format="pyarrow")


# ------------------------------------------------------------- MinHash + LSH

def _minhash_sigs(codes: np.ndarray, starts: np.ndarray, num_perm: int,
                  seed: int = 7) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures from flat shingle codes.

    Permutation hashes h_i(s) = a_i*s + b_i (uint64 wrap); per-doc minima
    via ``np.minimum.reduceat`` — no per-row Python loop.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, size=num_perm, dtype=np.uint64)
    n = len(starts) - 1
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(codes) == 0:
        return sig
    nonempty = np.diff(starts) > 0
    red_idx = np.minimum(starts[:-1], len(codes) - 1)
    with np.errstate(over="ignore"):
        for i in range(num_perm):
            h = codes * a[i] + b[i]
            mins = np.minimum.reduceat(h, red_idx)
            sig[nonempty, i] = mins[nonempty]
    return sig


class MinHasher:
    """map_batches actor: text → (doc row per band) LSH index rows.

    Emits ``(id, band, band_hash, sig_hex)`` — bands × n_docs small rows;
    the signature rides along (num_perm × 8 bytes) for estimated-Jaccard
    verification inside the bucket groupby. Full text never shuffles.
    """

    def __init__(self, text_col: str, id_col: str, k_shingle: int = 4,
                 num_perm: int = 64, bands: int = 16, seed: int = 7,
                 max_bytes: int = 4096):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.k, self.num_perm, self.bands, self.seed = k_shingle, num_perm, bands, seed
        self.r = num_perm // bands
        # signature shingle cap: candidate-only callers keep the 4096-byte
        # prefix default; EXACT callers must pass the same max_bytes their
        # verify stage uses, or long docs diverging after the prefix are
        # never candidates (recall hole vs the uncapped oracle)
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        # shingling reads the Arrow UTF-8 buffers directly — no per-row
        # encode; signatures ship as one fixed-size-binary buffer with a
        # vectorized take for the per-band repeat (no per-doc tobytes)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        starts, codes = char_shingles_u64(batch[self.text_col], k=self.k,
                                          max_bytes=self.max_bytes)
        sig = _minhash_sigs(codes, starts, self.num_perm, seed=self.seed)
        n = len(ids)
        band_rows = sig.reshape(n, self.bands, self.r)
        # hash each band's r values into one uint64
        bh = np.zeros((n, self.bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(self.r):
                bh = bh * np.uint64(1099511628211) + band_rows[:, :, j]
        out_id = np.repeat(ids, self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), n)
        out_bh = bh.reshape(-1).view(np.int64)
        sig_fsb = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(self.num_perm * 8), n,
            [None, pa.py_buffer(np.ascontiguousarray(sig).tobytes())])
        out_sig = pc.take(sig_fsb, pa.array(np.repeat(
            np.arange(n, dtype=np.int64), self.bands)))
        return pa.table({
            "id": pa.array(out_id),
            "band": pa.array(out_band),
            "band_hash": pa.array(out_bh),
            "sig": out_sig,
        })


def hot_bucket_keys(index: ray.data.Dataset, key: str,
                    num_partitions: int = 64,
                    coalesce_partials: bool = False) -> np.ndarray:
    """Sorted array of ``key`` values occurring ≥2 times globally.

    Fully distributed count merge: per-block C++ ``group_by`` partials
    (each tagged ``_part = key % P``) → ONE co-partitioning shuffle on the
    bounded int32 ``_part`` → per-partition C++ sum + n≥2 filter. The
    driver receives ONLY the filtered hot set (near-dups are rare, so it
    is tiny). The unfiltered partial table is ∝ docs × bands (most buckets
    are singletons) and must never be coordinator-merged at 100 TB.
    Partitioning on ``_part`` instead of ``groupby(key)`` keeps the sort
    domain at P values — ~25× cheaper than a high-cardinality key sort.
    """
    def count_batch(batch: pa.Table) -> pa.Table:
        part = batch.select([key]).group_by([key]).aggregate([(key, "count")])
        part = part.rename_columns([key, "_n"])
        k = part[key].to_numpy(zero_copy_only=False)
        tag = (k.astype(np.uint64) % np.uint64(num_partitions)).astype(np.int32)
        return part.append_column("_part", pa.array(tag))

    def per_part(t: pa.Table) -> pa.Table:
        c = t.group_by([key]).aggregate([("_n", "sum")])
        return c.filter(pc.greater_equal(c["_n_sum"], 2)).select([key])

    partials = index.map_batches(count_batch, batch_format="pyarrow")
    if coalesce_partials:
        # coalesce skinny partial blocks before the sort — wins when the
        # index has many blocks (O(blocks×partitions) shuffle objects,
        # BASELINE.md note 4); skip at a handful of blocks
        partials = partials.repartition(num_partitions)
    hot = partials.groupby("_part").map_groups(per_part,
                                               batch_format="pyarrow")
    arrs = [b[key].to_numpy(zero_copy_only=False)
            for b in hot.iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    return np.sort(np.concatenate(arrs)) if arrs else np.empty(0, dtype=np.int64)


def _hot_bucket_filter(index: ray.data.Dataset, key: str) -> ray.data.Dataset:
    """Keep only rows whose ``key`` value occurs ≥2 times globally.

    Candidate buckets are RARE (near-dups are the exception): count them
    with a distributed two-phase aggregate (``hot_bucket_keys``), pull and
    broadcast only the (tiny) hot set, and vectorized-filter. Turns the
    pair stage into O(#actual candidates). Falls back gracefully: worst
    case (everything duplicated) the filter keeps everything.
    """
    import ray as _ray

    hot_keys = hot_bucket_keys(index, key)
    ref = _ray.put(hot_keys)

    def filt(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        hk = _ray.get(ref)
        pos = np.searchsorted(hk, keys)
        pos = np.minimum(pos, max(len(hk) - 1, 0))
        mask = len(hk) > 0 and hk[pos] == keys
        if isinstance(mask, bool):
            mask = np.zeros(len(keys), dtype=bool)
        return batch.filter(pa.array(mask))

    return index.map_batches(filt, batch_format="pyarrow")


def minhash_lsh_pairs(ds: ray.data.Dataset, text_col: str, id_col: str, *,
                      k_shingle: int = 6, num_perm: int = 64, bands: int = 8,
                      threshold: float = 0.7, max_bucket: int = 2000,
                      seed: int = 7, concurrency: int = 2,
                      max_bytes: int = 4096,
                      oversize: str = "drop") -> ray.data.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.

    shingle → minhash → band → hot-bucket prefilter (see
    ``_hot_bucket_filter``) → bucket groupby → within-bucket pairs →
    signature-estimated Jaccard filter → global pair dedup (a pair found in
    several bands collapses to one row).
    """
    hasher = MinHasher(text_col, id_col, k_shingle=k_shingle,
                       num_perm=num_perm, bands=bands, seed=seed,
                       max_bytes=max_bytes)
    # batch_size=None: one task per upstream block — a row-count batch
    # size would BUNDLE blocks into one task (CLAUDE.md gotcha) and
    # serialize the heaviest compute in the pipeline (num_perm universal-
    # hash passes over every shingle)
    index = ds.map_batches(hasher, batch_format="pyarrow", batch_size=None)
    # The index is consumed twice (bucket counts, then the filtered pair
    # pass) and is tiny relative to the input (ids + band keys + sigs) —
    # materialize so the shingle/minhash work runs ONCE.
    index = index.materialize()
    index = _hot_bucket_filter(index, "band_hash")

    # Pair generation is partitioned by band_hash % P (NOT per bucket):
    # one Python call per partition, runs of equal band_hash swept with
    # numpy — avoids a Ray dispatch per bucket when templated corpora put
    # most rows in hot buckets.
    def est_jaccard(sigs: np.ndarray, pa_pos: np.ndarray,
                    pb_pos: np.ndarray) -> np.ndarray:
        # column loop: gathers stay 1-D and cache-resident instead of
        # materializing two (n_pairs × num_perm) matrices
        acc = np.zeros(len(pa_pos), dtype=np.int32)
        for j in range(sigs.shape[1]):
            col = sigs[:, j]
            acc += col[pa_pos] == col[pb_pos]
        return acc / float(sigs.shape[1])

    pairs = _bucketed_pairs(index, "band_hash", sig_col="sig", sig_kind="binary",
                            max_bucket=max_bucket,
                            verify=est_jaccard,
                            verdict_col="est_jaccard",
                            keep=lambda v: v >= threshold,
                            num_perm=num_perm, oversize=oversize)
    return _pair_dedup(pairs, "est_jaccard", "max")


def _pair_dedup(pairs: ray.data.Dataset, value_col: str, agg: str,
                num_partitions: int = 16) -> ray.data.Dataset:
    """Collapse duplicate (id_a, id_b) rows (a pair found in several bands)
    to one, keeping ``agg`` of ``value_col``. Same partitioned shape as
    ``hot_bucket_keys``: co-partition on a bounded int32 tag, C++
    ``group_by`` per partition — Ray's Aggregate operator has seconds of
    fixed overhead the (rare) verified-pair set never justifies."""
    def add_part(b: pa.Table) -> pa.Table:
        from ..functions.hashing import part_tags
        k = b["id_a"].to_numpy(zero_copy_only=False)
        return b.append_column("_part",
                               pa.array(part_tags(k, num_partitions)))

    def per_part(t: pa.Table) -> pa.Table:
        out = t.group_by(["id_a", "id_b"]).aggregate([(value_col, agg)])
        return out.rename_columns(["id_a", "id_b", value_col])

    return (pairs.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part").map_groups(per_part, batch_format="pyarrow"))


def _bucketed_pairs(index: ray.data.Dataset, key: str, *, sig_col: str,
                    sig_kind: str, max_bucket: int, verify, verdict_col: str,
                    keep, num_perm: int = 0,
                    partitions: int = 64,
                    oversize: str = "drop",
                    slab_pairs: int = 4_000_000) -> ray.data.Dataset:
    """Vectorized within-bucket pair generation over hash partitions.

    ``index`` rows: (id, <key>, sig: binary). Partition = key % partitions;
    inside one partition, rows are sorted by key, equal-key runs found with
    one ``np.unique``, triu pair indices emitted per run (numpy), and
    ``verify(sig_a, sig_b)`` evaluated on stacked signatures in slabs of
    ≤ ``slab_pairs`` candidate pairs (bounded peak memory however hot the
    buckets).

    ``oversize`` decides what happens to a bucket larger than
    ``max_bucket``:

    - ``"drop"`` — skip it (a candidate-stage volume guard for the
      APPROXIMATE APIs; a hot bucket is usually a degenerate template).
    - ``"chunk"`` — process it EXACTLY as max_bucket-sized chunk×chunk
      sub-blocks (the guard bounds memory, never recall — required by the
      exact APIs, whose oracles enumerate all pairs). The O(m²) pair count
      of a degenerate bucket is inherent to the contract, not to this
      implementation.

    Cross-slab duplicate pairs (a pair hit in several bands) are collapsed
    by the callers' ``_pair_dedup`` stage; the in-slab unique is an
    optimization, not the correctness boundary.
    """
    if oversize not in ("drop", "chunk"):
        raise ValueError(f"unknown oversize policy {oversize!r}")

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        return batch.append_column("_part", pa.array(
            (k.astype(np.uint64) % np.uint64(partitions)).astype(np.int32)))

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "id"], kind="mergesort").drop_duplicates(
            subset=[key, "id"])
        keys = g[key].to_numpy()
        ids = g["id"].to_numpy()
        if sig_kind == "binary":
            sigs = np.frombuffer(b"".join(g[sig_col]), dtype=np.uint64).reshape(
                len(g), num_perm) if len(g) else np.empty((0, num_perm), np.uint64)
        else:  # int64 scalar signature
            sigs = g[sig_col].to_numpy().astype(np.int64).view(np.uint64).reshape(-1, 1)
        uids, first_pos = np.unique(ids, return_index=True)
        frames: list[pd.DataFrame] = []
        pend_a: list[np.ndarray] = []
        pend_b: list[np.ndarray] = []
        pend = 0

        def flush():
            nonlocal pend_a, pend_b, pend
            if not pend_a:
                return
            ia = np.concatenate(pend_a); ib = np.concatenate(pend_b)
            pend_a, pend_b, pend = [], [], 0
            # A pair hit in k bands/chunks appears k times — verify each
            # pair once per slab: map candidate positions to
            # first-occurrence-per-id, then unique the (posA, posB) set.
            pa_pos = first_pos[np.searchsorted(uids, ids[ia])]
            pb_pos = first_pos[np.searchsorted(uids, ids[ib])]
            lo = np.minimum(pa_pos, pb_pos); hi = np.maximum(pa_pos, pb_pos)
            packed = np.unique(lo.astype(np.uint64) << np.uint64(32)
                               | hi.astype(np.uint64))
            pa_pos = (packed >> np.uint64(32)).astype(np.int64)
            pb_pos = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
            v = verify(sigs, pa_pos, pb_pos)
            mask = keep(v)
            a_ids, b_ids = ids[pa_pos[mask]], ids[pb_pos[mask]]
            # canonical id order (position order ≠ id order after key sort)
            frames.append(pd.DataFrame({
                "id_a": np.minimum(a_ids, b_ids),
                "id_b": np.maximum(a_ids, b_ids),
                verdict_col: np.asarray(v, dtype=np.float64)[mask]}))

        def emit(ia: np.ndarray, ib: np.ndarray):
            nonlocal pend
            pend_a.append(ia); pend_b.append(ib)
            pend += len(ia)
            if pend > slab_pairs:
                flush()

        _, starts = np.unique(keys, return_index=True)
        bounds = np.append(starts, len(keys))
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m < 2:
                continue
            if m <= max_bucket:
                ia, ib = np.triu_indices(m, k=1)
                emit(ia + s, ib + s)
                continue
            if oversize == "drop":
                continue
            cb = list(range(int(s), int(e), max_bucket)) + [int(e)]
            for ci in range(len(cb) - 1):
                na = cb[ci + 1] - cb[ci]
                ia, ib = np.triu_indices(na, k=1)
                emit(ia + cb[ci], ib + cb[ci])
                for cj in range(ci + 1, len(cb) - 1):
                    nb = cb[cj + 1] - cb[cj]
                    ia = np.repeat(np.arange(na, dtype=np.int64), nb) + cb[ci]
                    ib = np.tile(np.arange(nb, dtype=np.int64), na) + cb[cj]
                    emit(ia, ib)
        flush()
        if not frames:
            empty = pd.Series([], dtype=ids.dtype if len(ids) else "int64")
            return pd.DataFrame({"id_a": empty, "id_b": empty,
                                 verdict_col: pd.Series([], dtype="float64")})
        return pd.concat(frames, ignore_index=True)

    return (index.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part").map_groups(partition_pairs, batch_format="pandas"))


# ------------------------------------------------- exact candidate verification

def _shingle_sets(ds: ray.data.Dataset, text_col: str, id_col: str,
                  cand_ref, k_shingle: int, max_bytes: int) -> ray.data.Dataset:
    """(id, codes: large_binary) — sorted UNIQUE packed k-byte shingle codes
    per candidate doc. ``cand_ref`` is a ray.put of the sorted candidate-id
    array; only candidate docs' sets are ever built (near-dups are rare)."""
    import ray as _ray

    def build(batch: pa.Table) -> pa.Table:
        cand = _ray.get(cand_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cand, ids)
        pos = np.minimum(pos, max(len(cand) - 1, 0))
        mask = (cand[pos] == ids) if len(cand) else np.zeros(len(ids), bool)
        if not mask.any():
            return pa.table({"id": pa.array([], type=pa.int64()),
                             "codes": pa.array([], type=pa.large_binary())})
        sub = batch.filter(pa.array(mask))
        starts, codes = char_shingles_u64(
            sub[text_col], k=k_shingle, max_bytes=max_bytes, code="pack")
        out_ids, blobs = [], []
        for i, did in enumerate(sub[id_col].to_numpy(zero_copy_only=False)):
            u = np.unique(codes[starts[i]:starts[i + 1]])
            out_ids.append(int(did))
            blobs.append(u.tobytes())
        return pa.table({"id": pa.array(out_ids, type=pa.int64()),
                         "codes": pa.array(blobs, type=pa.large_binary())})

    return ds.map_batches(build, batch_format="pyarrow")


def exact_shingle_jaccard_verify(
        pairs: ray.data.Dataset, ds: ray.data.Dataset, text_col: str,
        id_col: str, *, k_shingle: int = 6, threshold: float = 0.8,
        max_driver_docs: int = 200_000,
        max_driver_bytes: int = 1 << 30,
        max_bytes: int = 1 << 30) -> ray.data.Dataset:
    """Re-verify candidate (id_a, id_b) pairs with EXACT char-k-shingle
    Jaccard; emit (id_a, id_b, jaccard) for pairs ≥ threshold.

    The exactness chain: ``code="pack"`` shingle codes are injective
    (distinct codes ≡ distinct substrings), the division is exact-int /
    exact-int in float64, and rounding happens after filtering — so the
    output value-hashes against a DuckDB ``substr``-explode oracle
    (byte-for-char on ASCII corpora; documented divergence otherwise).

    Scale shape: candidate ids (≤ 2×|pairs|, rare by the near-dup
    contract — same boundedness argument as ``hot_bucket_keys``) are
    broadcast; only candidate docs' shingle sets are built, and the set
    table MATERIALIZES once (it is consumed again by the distributed
    path). The broadcast path requires BOTH ≤ ``max_driver_docs``
    candidates AND ≤ ``max_driver_bytes`` of shingle blobs (a count-only
    guard would let 200k × 8 MB sets OOM the coordinator); above either
    bound, verification runs as a distributed co-partition join (pairs
    meet both sides' sets via two bounded-tag shuffles of candidate-only
    rows — never the corpus).
    """
    import ray as _ray

    pairs = pairs.materialize()  # consumed twice: id set + verification

    def pair_ids(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b["id_a"].to_numpy(zero_copy_only=False),
            b["id_b"].to_numpy(zero_copy_only=False)])).astype(np.int64)
        return pa.table({"id": pa.array(u)})

    id_blocks = [b["id"].to_numpy(zero_copy_only=False)
                 for b in pairs.map_batches(pair_ids, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow", batch_size=None) if b.num_rows]
    cand = (np.unique(np.concatenate(id_blocks)) if id_blocks
            else np.empty(0, dtype=np.int64))
    cand_ref = _ray.put(cand)

    # materialize: the corpus scan that builds candidate-only sets runs
    # ONCE whichever verify path follows (the distributed path reads it
    # twice; re-running _shingle_sets would re-scan the corpus)
    sets = _shingle_sets(ds, text_col, id_col, cand_ref,
                         k_shingle, max_bytes).materialize()

    set_bytes = 0
    if len(cand) <= max_driver_docs:
        # cheap length-only pass over the (materialized, skinny) set table
        sizes = sets.map_batches(
            lambda t: pa.table({"n": pa.array(
                [pc.sum(pc.binary_length(t["codes"])).as_py() or 0],
                type=pa.int64())}),
            batch_format="pyarrow")
        set_bytes = sum(int(b["n"][0].as_py())
                        for b in sizes.iter_batches(batch_format="pyarrow", batch_size=None)
                        if b.num_rows)

    if len(cand) <= max_driver_docs and set_bytes <= max_driver_bytes:
        # broadcast path: ONE dict of candidate sets in plasma, node-local
        # lazy ray.get inside every verify task
        table: dict[int, np.ndarray] = {}
        for b in sets.iter_batches(batch_format="pyarrow", batch_size=None):
            ids = b["id"].to_pylist()
            for i, blob in enumerate(b["codes"]):
                table[ids[i]] = np.frombuffer(blob.as_py(), dtype=np.uint64)
        set_ref = _ray.put(table)

        def verify(b: pa.Table) -> pa.Table:
            d = _ray.get(set_ref)
            a_ids = b["id_a"].to_numpy(zero_copy_only=False)
            b_ids = b["id_b"].to_numpy(zero_copy_only=False)
            ja, oa, ob = [], [], []
            for x, y in zip(a_ids, b_ids):
                sa, sb = d.get(int(x)), d.get(int(y))
                if sa is None or sb is None:
                    continue
                if len(sa) > len(sb):
                    sa, sb = sb, sa
                p = np.searchsorted(sb, sa)
                p = np.minimum(p, max(len(sb) - 1, 0))
                inter = int((sb[p] == sa).sum()) if len(sb) else 0
                union = len(sa) + len(sb) - inter
                j = inter / union if union else 0.0
                if j >= threshold:
                    oa.append(int(x)); ob.append(int(y)); ja.append(round6(j))
            return pa.table({"id_a": pa.array(oa, type=pa.int64()),
                             "id_b": pa.array(ob, type=pa.int64()),
                             "jaccard": pa.array(ja, type=pa.float64())})

        return pairs.map_batches(verify, batch_format="pyarrow")

    return _verify_pairs_distributed(pairs, sets, threshold)


def _verify_pairs_distributed(pairs: ray.data.Dataset,
                              sets: ray.data.Dataset, threshold: float,
                              num_partitions: int = 64) -> ray.data.Dataset:
    """Distributed exact-Jaccard verify: candidate-only rows flow through
    two bounded-tag co-partition shuffles (same shape as
    ``hot_bucket_keys``) — pair rows meet side-A sets partitioned on id_a,
    carry the blob, then meet side-B sets partitioned on id_b."""
    from ..functions.hashing import part_tags

    def _tag(col):
        def fn(b: pa.Table) -> pa.Table:
            k = b[col].to_numpy(zero_copy_only=False)
            return b.append_column(
                "_part", pa.array(part_tags(k, num_partitions)))
        return fn

    def _union_schema(b: pa.Table, kind: int, id_key: str,
                      other: str | None, carry: str | None) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "kind": pa.array(np.full(n, kind, dtype=np.int8)),
            "id": b[id_key].cast(pa.int64()),
            "oid": (b[other].cast(pa.int64()) if other
                    else pa.array([None] * n, type=pa.int64())),
            "blob": (b[carry].cast(pa.large_binary()) if carry
                     else pa.array([None] * n, type=pa.large_binary())),
            "blob_a": (b["blob_a"].cast(pa.large_binary())
                       if "blob_a" in b.column_names
                       else pa.array([None] * n, type=pa.large_binary())),
        })

    def _join(part: pa.Table) -> pa.Table:
        kinds = part["kind"].to_numpy(zero_copy_only=False)
        docs = part.filter(pa.array(kinds == 0))
        prs = part.filter(pa.array(kinds == 1))
        d = {i: blob for i, blob in zip(docs["id"].to_pylist(),
                                        docs["blob"].to_pylist())}
        ids = prs["id"].to_pylist()
        blobs = [d.get(i) for i in ids]
        keep = pa.array([bl is not None for bl in blobs], type=pa.bool_())
        out = pa.table({
            "kind": pa.array(np.full(len(ids), 1, dtype=np.int8)),
            # swap: next round partitions on the OTHER id
            "id": prs["oid"],
            "oid": prs["id"].cast(pa.int64()),
            "blob": pa.array([None] * len(ids), type=pa.large_binary()),
            "blob_a": pa.array(blobs, type=pa.large_binary()),
        }).filter(keep)
        return out

    docs0 = sets.map_batches(
        lambda b: _union_schema(b, 0, "id", None, "codes"),
        batch_format="pyarrow")
    pairs0 = pairs.map_batches(
        lambda b: _union_schema(b, 1, "id_a", "id_b", None),
        batch_format="pyarrow")
    r1 = (docs0.union(pairs0)
          .map_batches(_tag("id"), batch_format="pyarrow")
          .groupby("_part")
          .map_groups(_join, batch_format="pyarrow"))
    # round 2: r1 pair rows are keyed on id_b (swapped into "id"), carry
    # blob_a; join against the doc sets again
    r2 = (docs0.union(r1)
          .map_batches(_tag("id"), batch_format="pyarrow")
          .groupby("_part"))

    def finish(part: pa.Table) -> pa.Table:
        kinds = part["kind"].to_numpy(zero_copy_only=False)
        docs = part.filter(pa.array(kinds == 0))
        prs = part.filter(pa.array(kinds == 1))
        d = {i: blob for i, blob in zip(docs["id"].to_pylist(),
                                        docs["blob"].to_pylist())}
        oa, ob, ja = [], [], []
        for idb, ida, blob_a in zip(prs["id"].to_pylist(),
                                    prs["oid"].to_pylist(),
                                    prs["blob_a"].to_pylist()):
            blob_b = d.get(idb)
            if blob_b is None or blob_a is None:
                continue
            sa = np.frombuffer(blob_a, dtype=np.uint64)
            sb = np.frombuffer(blob_b, dtype=np.uint64)
            if len(sa) > len(sb):
                sa, sb = sb, sa
            p = np.searchsorted(sb, sa)
            p = np.minimum(p, max(len(sb) - 1, 0))
            inter = int((sb[p] == sa).sum()) if len(sb) else 0
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                lo, hi = (ida, idb) if ida < idb else (idb, ida)
                oa.append(lo); ob.append(hi); ja.append(round6(j))
        return pa.table({"id_a": pa.array(oa, type=pa.int64()),
                         "id_b": pa.array(ob, type=pa.int64()),
                         "jaccard": pa.array(ja, type=pa.float64())})

    return r2.map_groups(finish, batch_format="pyarrow")


def minhash_neardup_exact(ds: ray.data.Dataset, text_col: str, id_col: str, *,
                          k_shingle: int = 6, threshold: float = 0.8,
                          num_perm: int = 128, bands: int = 32,
                          max_bucket: int = 2000, seed: int = 7,
                          max_bytes: int = 1 << 30) -> ray.data.Dataset:
    """EXACT near-dup pairs (char-k-shingle Jaccard ≥ threshold),
    LSH-accelerated: MinHash+LSH generates candidates, then every candidate
    is re-verified with the exact set Jaccard — so the OUTPUT is
    deterministic and SQL-oracle-checkable even though the candidate stage
    is probabilistic.

    Recall contract: a true pair at J=t is missed only if all ``bands``
    bands disagree — p_miss = (1 - t^r)^b with r = num_perm/bands; at the
    defaults (r=4, b=32, t=0.8) that is ≈ 5e-8 per pair, and vanishes for
    the high-J pairs real corpora contain. The est-Jaccard prefilter runs
    ≥7σ below threshold (σ ≈ sqrt(t(1-t)/num_perm)) so it only bounds
    candidate volume, never rejects a true pair.
    """
    est_floor = max(threshold - 0.25, 0.0)
    # exactness requires the candidate stage to see the SAME text the
    # verify stage and the oracle see: full-length signatures
    # (max_bytes passthrough) and chunked — never dropped — hot buckets
    cand = minhash_lsh_pairs(ds, text_col, id_col, k_shingle=k_shingle,
                             num_perm=num_perm, bands=bands,
                             threshold=est_floor, max_bucket=max_bucket,
                             seed=seed, max_bytes=max_bytes,
                             oversize="chunk")
    return exact_shingle_jaccard_verify(
        cand, ds, text_col, id_col, k_shingle=k_shingle,
        threshold=threshold, max_bytes=max_bytes)


def neardup_against_history(new_ds: ray.data.Dataset,
                            history_ds: ray.data.Dataset,
                            text_col: str, id_col: str, *,
                            k_shingle: int = 6, threshold: float = 0.8,
                            num_perm: int = 128, bands: int = 32,
                            max_bucket: int = 2000, seed: int = 7,
                            max_bytes: int = 1 << 30) -> ray.data.Dataset:
    """Fuzzy incremental dedup: flag NEW docs whose exact char-k-shingle
    Jaccard with ANY history doc is ≥ threshold (today's crawl near-dup'd
    against everything already ingested, without re-pairing history with
    itself on the output side).

    Rides the exact LSH pipeline (`minhash_neardup_exact`) over the union
    of both corpora: requires non-negative int64 ids; history ids travel
    as ``-(id+1)`` so side information survives into the (id_a, id_b)
    pair stream — pair emission orders id_a < id_b, so a cross-side pair
    is exactly (id_a < 0 ≤ id_b). Within-new and within-history pairs are
    dropped; the finish is the same bounded-tag partitioned C++ max as
    `_pair_dedup`. Output: (id, max_jaccard) per flagged new doc.
    """
    def neg_ids(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        flipped = pc.subtract(pa.scalar(-1, pa.int64()), ids)
        return pa.table({id_col: flipped, text_col: batch[text_col]})

    def pass_ids(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         text_col: batch[text_col]})

    union = new_ds.map_batches(pass_ids, batch_format="pyarrow").union(
        history_ds.map_batches(neg_ids, batch_format="pyarrow"))
    pairs = minhash_neardup_exact(union, text_col, id_col,
                                  k_shingle=k_shingle, threshold=threshold,
                                  num_perm=num_perm, bands=bands,
                                  max_bucket=max_bucket, seed=seed,
                                  max_bytes=max_bytes)

    def cross_only(b: pa.Table) -> pa.Table:
        from ..functions.hashing import part_tags
        a = b["id_a"].to_numpy(zero_copy_only=False)
        bb = b["id_b"].to_numpy(zero_copy_only=False)
        keep = (a < 0) & (bb >= 0)
        t = b.filter(pa.array(keep))
        part = part_tags(t["id_b"].to_numpy(zero_copy_only=False), 16)
        return pa.table({"id": t["id_b"], "jaccard": t["jaccard"],
                         "_part": pa.array(part)})

    def per_part(t: pa.Table) -> pa.Table:
        g = t.group_by(["id"]).aggregate([("jaccard", "max")])
        return g.rename_columns(["id", "max_jaccard"])

    flagged = pairs.map_batches(cross_only, batch_format="pyarrow")
    return flagged.groupby("_part").map_groups(per_part,
                                               batch_format="pyarrow")


# ------------------------------------------------------------------- SimHash

def simhash64(ds: ray.data.Dataset, text_col: str, out: str = "simhash") -> ray.data.Dataset:
    """64-bit word-frequency SimHash per row, fully vectorized:
    explode words → buffer-level 64-bit word hashes (no Python string
    materialization) → per-bit ±1 weighted sums via ``np.add.reduceat`` →
    sign bits."""
    from ..functions.hashing import bytes_hash64

    def fn(batch: pa.Table) -> pa.Table:
        words = split_words(batch[text_col])
        offsets, values = list_offsets_values(words)
        n = len(offsets) - 1
        wh = bytes_hash64(values)
        acc = np.zeros((n, 64), dtype=np.int64)
        if len(wh):
            red_idx = np.minimum(offsets[:-1], len(wh) - 1)
            nonempty = np.diff(offsets) > 0
            for bit in range(64):
                bits = (((wh >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2) - 1
                s = np.add.reduceat(bits, red_idx)
                acc[nonempty, bit] = s[nonempty]
        h = np.zeros(n, dtype=np.uint64)
        for bit in range(64):
            h |= (acc[:, bit] > 0).astype(np.uint64) << np.uint64(bit)
        return batch.append_column(out, pa.array(h.view(np.int64)))
    return ds.map_batches(fn, batch_format="pyarrow")


def simhash_pairs(ds: ray.data.Dataset, text_col: str, id_col: str, *,
                  max_hamming: int = 3, max_bucket: int = 2000) -> ray.data.Dataset:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: with 4 16-bit chunks, any pair at Hamming ≤ 3 agrees
    on ≥1 chunk → ``groupby(chunk_idx, chunk_value)`` buckets generate all
    candidates; exact Hamming verifies in-bucket; pair dedup collapses
    multi-chunk hits.
    """
    hashed = simhash64(ds.select_columns([id_col, text_col]), text_col)

    def explode_chunks(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(h)
        chunk_idx = np.tile(np.arange(4, dtype=np.int64), n)
        hh = np.repeat(h, 4)
        shift = np.tile(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
        chunk_val = ((hh >> shift) & np.uint64(0xFFFF)).astype(np.int64)
        # single combined bucket key: (chunk << 16) | chunk_val
        bkey = (chunk_idx << 16) | chunk_val
        return pa.table({"id": pa.array(np.repeat(ids, 4)),
                         "bkey": pa.array(bkey),
                         "simhash": pa.array(np.repeat(h.view(np.int64), 4))})

    index = hashed.map_batches(explode_chunks, batch_format="pyarrow")
    index = index.materialize()  # consumed twice (counts + filtered pairs)
    index = _hot_bucket_filter(index, "bkey")

    def hamming(sigs: np.ndarray, pa_pos: np.ndarray,
                pb_pos: np.ndarray) -> np.ndarray:
        col = sigs[:, 0]
        x = col[pa_pos] ^ col[pb_pos]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        return ham

    # oversize="chunk": the recall-1.0 claim (any Hamming≤3 pair agrees on
    # ≥1 chunk) must hold for hot buckets too — max_bucket bounds memory
    # via chunked sub-blocks, never drops candidates
    pairs = _bucketed_pairs(index, "bkey", sig_col="simhash", sig_kind="int64",
                            max_bucket=max_bucket, verify=hamming,
                            verdict_col="hamming",
                            keep=lambda v: v <= max_hamming,
                            oversize="chunk")
    return _pair_dedup(pairs, "hamming", "min")


def cluster_pairs_distributed(pairs_ds: ray.data.Dataset,
                              id_a: str = "id_a", id_b: str = "id_b", *,
                              num_partitions: int = 32,
                              max_iters: int = 50) -> ray.data.Dataset:
    """Near-dup PAIRS → connected components by DISTRIBUTED min-label
    propagation — the 100 TB path when the verified pair set itself is too
    large for the driver union-find (``cluster_pairs``).

    Each round: (1) co-partitioned hash join edge.src → current label +
    partitioned min over (dst ∪ self), then (2) one POINTER-JUMP round
    (relabel every id by its label's own label) so label distance halves —
    rounds needed ≈ log₂(component diameter), not diameter. Labels
    monotonically decrease, so convergence = the label SUM stops changing
    (checked from per-block partial sums — one tiny row per block reaches
    the driver). Returns a Dataset (id, cluster) with cluster = min id of
    the component.
    """
    def symm(b: pa.Table) -> pa.Table:
        a = b[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": np.concatenate([a, c]),
                         "dst": np.concatenate([c, a])})

    edges = pairs_ds.map_batches(symm, batch_format="pyarrow").materialize()

    def _min_label_per_id(ds: ray.data.Dataset) -> ray.data.Dataset:
        def add_part(b: pa.Table) -> pa.Table:
            k = b["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            tag = ((k * np.int64(2654435761)) % np.int64(num_partitions)
                   ).astype(np.int32)
            return b.append_column("_part", pa.array(tag))

        def per_part(t: pa.Table) -> pa.Table:
            out = t.group_by(["id"]).aggregate([("label", "min")])
            return out.rename_columns(["id", "label"])

        return (ds.map_batches(add_part, batch_format="pyarrow")
                .groupby("_part").map_groups(per_part, batch_format="pyarrow"))

    labels = _min_label_per_id(edges.map_batches(
        lambda b: pa.table({"id": b["src"], "label": b["src"]}),
        batch_format="pyarrow")).materialize()

    def _label_sum(ds: ray.data.Dataset) -> int:
        partials = ds.map_batches(
            lambda b: pa.table({"s": pa.array(
                [int(pc.sum(b["label"]).as_py() or 0)])}),
            batch_format="pyarrow")
        return sum(r["s"] for r in partials.take_all())

    from .join import bucketed_hash_join
    prev_sum = _label_sum(labels)
    for _ in range(max_iters):
        # (1) edge propagation: dst inherits min(label(src), own label)
        lab_as_src = labels.map_batches(
            lambda b: pa.table({"src": b["id"], "label": b["label"]}),
            batch_format="pyarrow")
        cand = bucketed_hash_join(edges, lab_as_src, on="src",
                                  num_buckets=num_partitions)
        prop = cand.map_batches(
            lambda b: pa.table({"id": b["dst"], "label": b["label"]}),
            batch_format="pyarrow")
        labels = _min_label_per_id(prop.union(labels)) \
            .repartition(num_partitions).materialize()
        # (2) pointer jump: id's label ← label(label(id)) — halves the
        # remaining label distance each round
        links = labels.map_batches(
            lambda b: pa.table({"src": b["label"], "dst": b["id"]}),
            batch_format="pyarrow")
        jumped = bucketed_hash_join(links, labels.map_batches(
            lambda b: pa.table({"src": b["id"], "label": b["label"]}),
            batch_format="pyarrow"), on="src", num_buckets=num_partitions)
        jump_prop = jumped.map_batches(
            lambda b: pa.table({"id": b["dst"], "label": b["label"]}),
            batch_format="pyarrow")
        labels = _min_label_per_id(jump_prop.union(labels)) \
            .repartition(num_partitions).materialize()
        cur = _label_sum(labels)
        if cur == prev_sum:  # monotone → fixed point reached
            break
        prev_sum = cur

    return labels.map_batches(
        lambda b: pa.table({"id": b["id"], "cluster": b["label"]}),
        batch_format="pyarrow")


def cluster_pairs(pairs_ds: ray.data.Dataset, id_a: str = "id_a",
                  id_b: str = "id_b") -> pd.DataFrame:
    """Near-dup PAIRS → connected-component CLUSTERS (id → cluster root).

    Driver-side union-find: correct whenever the verified pair set is
    coordinator-sized (near-dups are the rare case — the same bound as the
    hot-bucket prefilter). When the pair set itself outgrows the driver,
    use ``cluster_pairs_distributed`` (min-label propagation with
    co-partitioned rounds) — same (id, cluster=min id) output, asserted
    equal in tests.
    Returns a DataFrame (id, cluster) where cluster = min id of the
    component — the canonical "keep the representative" shape.

    Vectorized: numpy min-label propagation with pointer jumping over the
    edge arrays (O(log diameter) rounds of ``np.minimum.at``) — ~20×
    faster than a per-pair Python union loop at 10⁵+ pairs, identical
    min-id-root output.
    """
    ia_parts, ib_parts = [], []
    for batch in pairs_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if batch.num_rows:
            ia_parts.append(batch[id_a].to_numpy(zero_copy_only=False))
            ib_parts.append(batch[id_b].to_numpy(zero_copy_only=False))
    if not ia_parts:
        return pd.DataFrame({"id": pd.Series([], dtype="int64"),
                             "cluster": pd.Series([], dtype="int64")})
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    nodes, inv = np.unique(np.concatenate([ia, ib]), return_inverse=True)
    e_a, e_b = inv[:len(ia)], inv[len(ia):]
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        old = labels.copy()
        np.minimum.at(labels, e_a, labels[e_b])
        np.minimum.at(labels, e_b, labels[e_a])
        while True:  # pointer jumping: collapse label chains
            nl = labels[labels]
            if np.array_equal(nl, labels):
                break
            labels = nl
        if np.array_equal(labels, old):
            break
    return pd.DataFrame({"id": nodes, "cluster": nodes[labels]})


# ------------------------------------------------- word-set Jaccard (exact)

def _drop_null_blocks(b: pa.Table, block_col: str) -> pa.Table:
    """Drop rows whose block key is null BEFORE pair dispatch.

    A null block value would otherwise turn into garbage indices after
    ``dictionary_encode`` → ``to_numpy().astype(int64)`` (silently wrong
    task/partition assignment). SQL pair semantics agree: a self-join
    ``ON a.block = b.block`` never matches NULL, so null-block rows can
    produce no pairs — dropping them is the oracle-consistent behavior."""
    col = b[block_col]
    if col.null_count:
        b = b.filter(pc.is_valid(col))
    return b


def _block_part_tags(col, partitions: int) -> np.ndarray:
    """Deterministic int32 partition tag for a block-key column (int or
    string). Dispatch for blocked pair generation is ``hash(block) % P`` —
    O(P) Ray tasks regardless of block cardinality (the same shape as
    ``_bucketed_pairs``), never one ``map_groups`` call per distinct block
    value. String keys hash via crc32 of UTF-8 over the per-batch
    dictionary (O(distinct-per-batch) Python, O(rows) numpy gather).
    Callers must have dropped null block values (``_drop_null_blocks``)."""
    from ..functions.hashing import part_tags
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("null block values must be dropped before dispatch")
    if pa.types.is_integer(col.type):
        return part_tags(col.to_numpy(zero_copy_only=False), partitions)
    import zlib
    enc = pc.dictionary_encode(col)
    dic = [zlib.crc32(str(v).encode("utf-8")) for v in enc.dictionary.to_pylist()]
    h = np.asarray(dic, dtype=np.uint64)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return (h[codes] % np.uint64(partitions)).astype(np.int32)


def _block_runs(blocks: np.ndarray) -> np.ndarray:
    """Run boundaries (len k+1) of a SORTED block-value array."""
    if len(blocks) == 0:
        return np.zeros(1, dtype=np.int64)
    _, starts = np.unique(blocks, return_index=True)
    return np.append(np.sort(starts), len(blocks))


def _chunk_bounds(s: int, e: int, step: int) -> list[tuple[int, int]]:
    """[s, e) split into step-sized [lo, hi) spans."""
    b = list(range(int(s), int(e), step)) + [int(e)]
    return list(zip(b[:-1], b[1:]))


def _grid_replicate(ds: ray.data.Dataset, block_col: str, id_col: str,
                    chunk_rows: int) -> ray.data.Dataset:
    """Theta-join grid replication for blocked all-pairs.

    The hash-partition dispatch parallelizes across DISTINCT block values;
    when block cardinality is low (a 10-language corpus), one task owns a
    whole block's quadratic work. Grid mode sub-splits: each block's rows
    are deterministically chunked (``hash(id) % C_b`` with
    ``C_b = ceil(block_rows / chunk_rows)``) and every unordered chunk
    pair (i ≤ j) becomes one independent task — parallelism scales with
    CORPUS SIZE, not block cardinality. A row in chunk c replicates to
    its C_b tasks (role A for tasks (c, j≥c), role B for (i<c, c)), so
    data movement is O(n·C_b): the price of exact all-pairs, which is
    O(n²/C_b) compute per task anyway. Pair (x, y) is generated exactly
    once — in task (min(cx,cy), max(cx,cy)).

    Adds columns: ``_task`` (globally unique int64), ``_role`` (int8,
    0 = side A / diagonal, 1 = side B), ``_diag`` (bool).

    Block sizes come from one per-block count merged on the driver —
    bounded by block cardinality, which grid mode assumes is low (that is
    the regime where it is needed; at high cardinality use the default
    partition dispatch).
    """
    import ray as _ray

    # the input is consumed twice (count pass + replicate pass) —
    # materialize so a derived upstream pipeline runs ONCE
    ds = ds.materialize()

    # per-block row counts (skinny partial -> driver merge)
    def count_blocks(b: pa.Table) -> pa.Table:
        b = _drop_null_blocks(b, block_col)
        out = b.select([block_col]).group_by([block_col]).aggregate(
            [(block_col, "count")])
        return out.rename_columns([block_col, "_n"])

    # grid mode exists FOR low block cardinality; a million+ distinct
    # blocks means the per-block plan (driver dict, broadcast) is the
    # wrong tool — and the partition dispatch already parallelizes that
    # regime perfectly. The bound is checked on COMPACTED cardinality:
    # partials are group_by-merged whenever the streamed buffer outgrows
    # 4×GRID_MAX_BLOCKS rows (the driver_merge_stream shape), so B blocks
    # × D-distinct-per-block never trips a spurious overflow and the
    # driver never holds an unbounded partial table.
    _overflow = ValueError(
        f"dispatch='grid' saw over {GRID_MAX_BLOCKS} distinct "
        f"{block_col!r} values; grid targets LOW block cardinality — use "
        f"the default partition dispatch")

    def _compact(tables: list) -> pa.Table:
        t = pa.concat_tables(tables).group_by([block_col]).aggregate(
            [("_n", "sum")])
        return t.rename_columns([block_col, "_n"])

    parts, buffered = [], 0
    for t in ds.map_batches(count_blocks, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        if t.num_rows:
            parts.append(t)
            buffered += t.num_rows
            if buffered > 4 * GRID_MAX_BLOCKS:
                parts = [_compact(parts)]
                buffered = parts[0].num_rows
                if buffered > GRID_MAX_BLOCKS:  # true distinct count
                    raise _overflow
    if not parts:
        sizes = {}
    else:
        t = _compact(parts)
        if t.num_rows > GRID_MAX_BLOCKS:
            raise _overflow
        sizes = dict(zip(t[block_col].to_pylist(), t["_n"].to_pylist()))
    # C_b per block + global task-id base offsets (base = running sum of
    # C_b*(C_b+1)/2 per block, in sorted-key order for determinism)
    plan: dict = {}
    base = 0
    for k in sorted(sizes, key=lambda v: str(v)):
        cb = max(1, -(-int(sizes[k]) // chunk_rows))
        plan[k] = (cb, base)
        base += cb * (cb + 1) // 2
    plan_ref = _ray.put(plan)

    def replicate(b: pa.Table) -> pa.Table:
        p = _ray.get(plan_ref)
        b = _drop_null_blocks(b, block_col)
        enc = b[block_col]
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        enc = pc.dictionary_encode(enc)
        dic = enc.dictionary.to_pylist()
        cb_arr = np.asarray([p[v][0] for v in dic], dtype=np.int64)
        base_arr = np.asarray([p[v][1] for v in dic], dtype=np.int64)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = b.num_rows
        C = cb_arr[codes]                      # per-row chunk count
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            c = ((ids.view(np.uint64) * np.uint64(2654435761))
                 % C.view(np.uint64).astype(np.uint64)).astype(np.int64)
        # one copy per (row, slot k in [0, C)): slots < C-c are role A
        # (tasks (c, c+k)); the rest are role B (tasks (k-(C-c), c))
        rep = np.repeat(np.arange(n, dtype=np.int64), C)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(C, out=offs[1:])
        k = np.arange(offs[-1], dtype=np.int64) - offs[rep]
        cr, Cr = c[rep], C[rep]
        is_a = k < (Cr - cr)
        i = np.where(is_a, cr, k - (Cr - cr))
        j = np.where(is_a, cr + k, cr)
        # task index within the block's (i<=j) triangle, then global base
        tri = i * Cr - (i * (i - 1)) // 2 + (j - i)
        task = base_arr[codes][rep] + tri
        role = np.where(is_a, 0, 1).astype(np.int8)
        diag = (i == j)
        out = b.take(pa.array(rep))
        out = out.append_column("_task", pa.array(task))
        out = out.append_column("_role", pa.array(role))
        return out.append_column("_diag", pa.array(diag))

    return ds.map_batches(replicate, batch_format="pyarrow")


def wordset_jaccard_pairs(ds: ray.data.Dataset, text_col: str, id_col: str,
                          block_col: str, threshold: float,
                          max_block: int = 4096,
                          ngram: int = 1,
                          partitions: int = 64,
                          dispatch: str = "partition") -> ray.data.Dataset:
    """Exact distinct word-set (``ngram=1``) or word-n-gram-set Jaccard
    pairs within blocks.

    Blocked all-pairs: within each ``block_col`` group, build the doc ×
    batch-vocab incidence matrix and get intersection counts with ONE
    matmul — vectorized exact Jaccard, no Python pair loop. SQL-equivalent
    (word explode + self-join within block) keeps it oracle-checkable.
    Output: id_a < id_b, jaccard (rounded to 6 dp for float parity).

    ``dispatch``:

    - ``"partition"`` (default) — ``hash(block) % partitions`` →
      ``groupby(_part)``: O(partitions) Ray tasks however many distinct
      blocks exist; equal-block runs inside a partition are swept after
      ONE sort + ONE Arrow split/dict-encode pass. Parallelism degenerates
      to the distinct-block count when that count is small.
    - ``"grid"`` — theta-join grid (``_grid_replicate``): each block is
      sub-split into ``max_block``-row chunks and every chunk PAIR is an
      independent task, so a 10-block corpus still fans out with corpus
      size. Data replicates ~``block_rows/max_block``× — the inherent
      price of exact all-pairs over big blocks (beyond ~10⁶-row blocks,
      all-pairs is intractable in any engine; LSH-prefilter instead).
      Output is identical to ``"partition"`` (equivalence-tested).

    ``max_block`` is the memory guard: a hot ``block_col`` value larger
    than it is processed as chunk×chunk sub-matmuls (each bounded at
    max_block × pair-vocab) — still EXACT, never an O(m × vocab) dense
    matrix for an unbounded m in one worker.

    Fully vectorized: distinct (row, word) pairs come from ONE Arrow
    split + dictionary-encode + ``np.unique`` over the packed pair codes
    (no Python loop over words); incidence is float32 (intersection counts
    are exact ints < 2^24) while the Jaccard DIVISION runs in float64 —
    bit-identical to the SQL oracle's DOUBLE division.
    """
    def cross_pairs(ids_a, ra, ca, ids_b, rb, cb, same: bool) -> pd.DataFrame:
        # remap the two chunks' word codes onto their joint (small) vocab
        uc, inv = np.unique(np.concatenate([ca, cb]), return_inverse=True)
        a = np.zeros((len(ids_a), len(uc)), dtype=np.float32)
        a[ra, inv[:len(ca)]] = 1.0
        if same:
            b = a
        else:
            b = np.zeros((len(ids_b), len(uc)), dtype=np.float32)
            b[rb, inv[len(ca):]] = 1.0
        sa = a.sum(axis=1, dtype=np.float64)
        sb = b.sum(axis=1, dtype=np.float64)
        inter = (a @ b.T).astype(np.float64)
        union = sa[:, None] + sb[None, :] - inter
        jac = inter / np.maximum(union, 1.0)
        if same:
            ia, ib = np.triu_indices(len(ids_a), k=1)
        else:
            ia, ib = np.divmod(np.arange(len(ids_a) * len(ids_b)), len(ids_b))
        keep = jac[ia, ib] >= threshold
        a, b = ids_a[ia[keep]], ids_b[ib[keep]]
        # canonical id_a < id_b: grid-mode sides are HASH chunks, not
        # id-ordered, so cross pairs can arrive reversed
        return pd.DataFrame({"id_a": np.minimum(a, b),
                             "id_b": np.maximum(a, b),
                             "jaccard": round6(jac[ia[keep], ib[keep]])})

    def build(g: pd.DataFrame):
        """ONE Arrow split/dict-encode pass over a sorted frame → (ids,
        rows_u, codes_u): distinct (row, gram) code pairs, rows_u sorted."""
        ids = g[id_col].to_numpy()
        n = len(g)
        lists = pc.split_pattern(pa.array(g[text_col], type=pa.string()), " ")
        offsets = lists.offsets.to_numpy().astype(np.int64)
        enc = pc.dictionary_encode(lists.values)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vsize = len(enc.dictionary)
        row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        if ngram > 1:
            # consecutive n-gram codes: window positions whose span stays
            # within one row; combined code base-vsize (compact afterwards)
            span = len(codes) - (ngram - 1)
            if span <= 0:
                codes = np.empty(0, dtype=np.int64)
                row_of = np.empty(0, dtype=np.int64)
            else:
                valid = row_of[:span] == row_of[ngram - 1:]
                comb = np.zeros(span, dtype=np.int64)
                for j in range(ngram):
                    comb = comb * vsize + codes[j:j + span]
                row_of = row_of[:span][valid]
                comb = comb[valid]
                uc, codes = np.unique(comb, return_inverse=True)
                vsize = len(uc)
        upairs = np.unique(row_of * vsize + codes)  # distinct (row, gram)
        rows_u, codes_u = np.divmod(upairs, max(vsize, 1))
        return ids, rows_u, codes_u

    def chunks_of(ids, rows_u, codes_u, s0: int, e0: int):
        out = []
        for s, e in _chunk_bounds(s0, e0, max_block):
            lo, hi = np.searchsorted(rows_u, [s, e])
            out.append((ids[s:e], rows_u[lo:hi] - s, codes_u[lo:hi]))
        return out

    def sweep(ids, rows_u, codes_u, sA, eA, sB, eB, same: bool):
        ca = chunks_of(ids, rows_u, codes_u, sA, eA)
        if same:
            return [cross_pairs(*ca[i], *ca[j], same=(i == j))
                    for i in range(len(ca)) for j in range(i, len(ca))]
        cb = chunks_of(ids, rows_u, codes_u, sB, eB)
        return [cross_pairs(*a, *b, same=False) for a in ca for b in cb]

    _EMPTY = {"id_a": pd.Series([], dtype="int64"),
              "id_b": pd.Series([], dtype="int64"),
              "jaccard": pd.Series([], dtype="float64")}

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # equal-block runs slice the (sorted) distinct (row, gram) arrays
        g = g.sort_values([block_col, id_col], kind="mergesort")
        ids, rows_u, codes_u = build(g)
        out = []
        run_bounds = _block_runs(g[block_col].to_numpy())
        for s0, e0 in zip(run_bounds[:-1], run_bounds[1:]):
            out += sweep(ids, rows_u, codes_u, s0, e0, s0, e0, same=True)
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(_EMPTY)

    def per_task(g: pd.DataFrame) -> pd.DataFrame:
        # one grid task: side-A rows (role 0) × side-B rows (role 1), or a
        # diagonal chunk's triangle
        diag = bool(g["_diag"].iloc[0])
        g = g.sort_values(["_role", id_col], kind="mergesort")
        ids, rows_u, codes_u = build(g)
        nA = int((g["_role"].to_numpy() == 0).sum())
        if diag:
            out = sweep(ids, rows_u, codes_u, 0, nA, 0, nA, same=True)
        else:
            out = sweep(ids, rows_u, codes_u, 0, nA, nA, len(g), same=False)
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(_EMPTY)

    if dispatch == "grid":
        rep = _grid_replicate(ds.select_columns([id_col, text_col, block_col]),
                              block_col, id_col, max_block)
        return rep.groupby("_task").map_groups(per_task, batch_format="pandas")
    if dispatch != "partition":
        raise ValueError(f"unknown dispatch {dispatch!r}; "
                         "known: ['partition', 'grid']")

    def add_part(b: pa.Table) -> pa.Table:
        b = _drop_null_blocks(b, block_col)
        return b.append_column(
            "_part", pa.array(_block_part_tags(b[block_col], partitions)))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part").map_groups(per_part, batch_format="pandas"))


# ------------------------------------------------- embedding-cosine near-dup

def embedding_neardup_pairs(ds: ray.data.Dataset, vec_col: str, id_col: str,
                            block_col: str, threshold: float,
                            max_block: int = 16384,
                            partitions: int = 64,
                            dispatch: str = "partition") -> ray.data.Dataset:
    """Cosine-similarity near-dup pairs within blocks (one matmul per
    block). float64 math so the SQL oracle (list_cosine_similarity)
    reproduces values; scores rounded to 6 dp.

    ``dispatch="partition"`` (default) hash-partitions on block value
    (same shape as ``wordset_jaccard_pairs``): O(partitions) Ray tasks,
    parallelism bounded by distinct-block count. ``dispatch="grid"``
    theta-join-replicates (``_grid_replicate``) so one huge block's
    quadratic matmul work spreads over chunk-pair tasks — identical
    output, equivalence-tested.

    ``max_block`` memory guard: an oversized block runs as chunk×chunk
    sub-matmuls (pair matrices bounded at max_block² floats) — exact, no
    unbounded dense similarity matrix on one worker."""
    def cross(ids_a, ma, ids_b, mb, same: bool) -> pd.DataFrame:
        sim = ma @ mb.T
        if same:
            ia, ib = np.triu_indices(len(ids_a), k=1)
        else:
            ia, ib = np.divmod(np.arange(len(ids_a) * len(ids_b)), len(ids_b))
        keep = sim[ia, ib] >= threshold
        a, b = ids_a[ia[keep]], ids_b[ib[keep]]
        # canonical id_a < id_b (grid-mode sides are hash chunks)
        return pd.DataFrame({"id_a": np.minimum(a, b),
                             "id_b": np.maximum(a, b),
                             "cosine": round6(sim[ia[keep], ib[keep]])})

    _EMPTY = {"id_a": pd.Series([], dtype="int64"),
              "id_b": pd.Series([], dtype="int64"),
              "cosine": pd.Series([], dtype="float64")}

    def normalized(g: pd.DataFrame) -> np.ndarray:
        m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        return m / np.maximum(norms, 1e-30)[:, None]

    def sweep(ids, m, sA, eA, sB, eB, same: bool):
        ca = [(ids[s:e], m[s:e]) for s, e in _chunk_bounds(sA, eA, max_block)]
        if same:
            return [cross(ia_, ma, ib_, mb, same=(i == j))
                    for i, (ia_, ma) in enumerate(ca)
                    for j, (ib_, mb) in enumerate(ca) if j >= i]
        cb = [(ids[s:e], m[s:e]) for s, e in _chunk_bounds(sB, eB, max_block)]
        return [cross(ia_, ma, ib_, mb, same=False)
                for (ia_, ma) in ca for (ib_, mb) in cb]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([block_col, id_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        m = normalized(g)
        out = []
        run_bounds = _block_runs(g[block_col].to_numpy())
        for s0, e0 in zip(run_bounds[:-1], run_bounds[1:]):
            out += sweep(ids, m, s0, e0, s0, e0, same=True)
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(_EMPTY)

    def per_task(g: pd.DataFrame) -> pd.DataFrame:
        diag = bool(g["_diag"].iloc[0])
        g = g.sort_values(["_role", id_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        m = normalized(g)
        nA = int((g["_role"].to_numpy() == 0).sum())
        out = (sweep(ids, m, 0, nA, 0, nA, same=True) if diag
               else sweep(ids, m, 0, nA, nA, len(g), same=False))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(_EMPTY)

    if dispatch == "grid":
        rep = _grid_replicate(ds.select_columns([id_col, vec_col, block_col]),
                              block_col, id_col, max_block)
        return rep.groupby("_task").map_groups(per_task, batch_format="pandas")
    if dispatch != "partition":
        raise ValueError(f"unknown dispatch {dispatch!r}; "
                         "known: ['partition', 'grid']")

    def add_part(b: pa.Table) -> pa.Table:
        b = _drop_null_blocks(b, block_col)
        return b.append_column(
            "_part", pa.array(_block_part_tags(b[block_col], partitions)))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part").map_groups(per_part, batch_format="pandas"))


# ------------------------------------------------------------ SemDeDup

def semdedup(ds: ray.data.Dataset, vec_col: str, id_col: str, *,
             n_centroids: int | str = "auto", threshold: float = 0.97,
             sample_size: int = 2048, seed: int = 13,
             max_block: int = 16384, partitions: int = 64,
             max_driver_pairs: int = 2_000_000,
             centroids=None) -> ray.data.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    semantic deduplication = k-means partition of the embedding space +
    within-cluster cosine near-dup detection + keep ONE representative
    (the min id of each connected dup group).

    Scale contract (each stage bounded independently of corpus size):

    1. ``kmeans_assign`` — centroids trained once on a bounded driver
       sample, broadcast; assignment is a matmul-argmax per batch.
       ``n_centroids="auto"`` scales k ~ √n (clamped to [16, 65536], the
       paper's regime — ~10⁵ clusters at corpus scale) so per-cell
       all-pairs work stays ~O(n) total instead of O(n²/k) blow-up; the
       one ``ds.count()`` is metadata-only on file-backed datasets. The
       training sample grows to ≥4k rows so Lloyd's has enough support.
    2. ``embedding_neardup_pairs`` with ``block_col="cell"`` — dispatch is
       hash-partitioned (O(partitions) Ray tasks, never per-cell), blocked
       matmul with the ``max_block`` chunk guard.
    3. Pair clustering — pairs materialize once (they are the rare case);
       at ≤ ``max_driver_pairs`` the driver union-find runs, above it the
       distributed min-label propagation (``cluster_pairs_distributed``)
       takes over and the removed-id flag becomes ONE co-partitioned
       mark join over the skinny (id, cell) stream instead of a driver
       broadcast — the corpus itself never reaches one process.

    Output: (id, cell:int32, keep:bool) — ``keep`` is False for every
    member of a dup group except its min-id representative.
    """
    import ray as _ray

    from .similarity import kmeans_assign

    if centroids is None:
        if n_centroids == "auto":
            import math
            n_centroids = max(16, min(65536,
                                      math.isqrt(max(int(ds.count()), 1))))
        sample_size = max(sample_size, 4 * int(n_centroids))

    # ``centroids`` (explicit codebook) skips the sample fit — the
    # pretrained-quantizer surface, and the exact-degeneration oracle path
    # (seeded cells + threshold ≤ -1 ⇒ keep = min id per cell).
    assigned = kmeans_assign(ds, vec_col, id_col, n_centroids=n_centroids,
                             sample_size=sample_size, seed=seed,
                             keep_vec=True, centroids=centroids)
    pairs = embedding_neardup_pairs(assigned, vec_col, "id",
                                    block_col="cell", threshold=threshold,
                                    max_block=max_block,
                                    partitions=partitions).materialize()

    base = assigned.map_batches(
        lambda b: pa.table({"id": b["id"], "cell": b["cell"]}),
        batch_format="pyarrow")

    if pairs.count() <= max_driver_pairs:
        comps = cluster_pairs(pairs)
        removed = comps.loc[comps["id"] != comps["cluster"], "id"].to_numpy()
        rref = _ray.put(np.sort(np.asarray(removed, dtype=np.int64)))

        def flag(batch: pa.Table) -> pa.Table:
            rem = _ray.get(rref)
            ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(rem, ids)
            pos = np.minimum(pos, max(len(rem) - 1, 0))
            hit = (rem[pos] == ids) if len(rem) else np.zeros(len(ids), bool)
            return pa.table({"id": batch["id"], "cell": batch["cell"],
                             "keep": pa.array(~hit)})
        return base.map_batches(flag, batch_format="pyarrow")

    comps_ds = cluster_pairs_distributed(pairs)
    removed_ds = comps_ds.map_batches(
        lambda b: pa.table({"id": b["id"].filter(
            pc.invert(pc.equal(b["id"], b["cluster"])))}),
        batch_format="pyarrow")
    return _mark_removed(base, removed_ds, partitions=partitions)


def _mark_removed(base: ray.data.Dataset, removed: ray.data.Dataset,
                  partitions: int = 64) -> ray.data.Dataset:
    """(id, cell) × removed-id set → (id, cell, keep) via ONE co-partition
    mark join (hash(id) % P both sides, per-bucket sorted membership
    probe) — the 100 TB flag path when the removed set outgrows a
    broadcast."""
    from ..functions.hashing import part_tags

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            part = part_tags(b["id"].to_numpy(zero_copy_only=False),
                             partitions)
            cell = (b["cell"] if side == 0
                    else pa.nulls(b.num_rows, pa.int32()))
            return pa.table({"id": b["id"], "cell": cell,
                             "_side": pa.array(np.full(b.num_rows, side,
                                                       dtype=np.int8)),
                             "_part": pa.array(part)})
        return fn

    def mark(g: pa.Table) -> pa.Table:
        sides = g["_side"].to_numpy(zero_copy_only=False)
        rows = g.filter(pa.array(sides == 0))
        rem = np.unique(g.filter(pa.array(sides == 1))["id"]
                        .to_numpy(zero_copy_only=False))
        ids = rows["id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rem, ids)
        pos = np.minimum(pos, max(len(rem) - 1, 0))
        hit = (rem[pos] == ids) if len(rem) else np.zeros(len(ids), bool)
        return pa.table({"id": rows["id"], "cell": rows["cell"],
                         "keep": pa.array(~hit)})

    both = (base.map_batches(tag(0), batch_format="pyarrow")
            .union(removed.map_batches(tag(1), batch_format="pyarrow")))
    return both.groupby("_part").map_groups(mark, batch_format="pyarrow")
