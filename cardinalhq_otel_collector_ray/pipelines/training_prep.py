"""Composed end-to-end training-data preparation — ONE streaming job:

    exact dedup → near dedup (MinHash+LSH, exact-verified) → Gopher
    quality gate → train/val/test split → [optional deterministic epoch
    shuffle] → concat-and-chunk packing → range-partitioned SORTED sink
    (manifest + resume)

This is the pipeline a reference user runs daily over a crawl increment
(the training-side twin of the telemetry topology; spec analog
``examples/training_data_prep.yaml``), composed from the engine's
first-class stages and kept streaming end-to-end: the corpus is never
materialized on the driver, and the only driver-sized state is the two
DECISION sets (duplicate ids), which are orders of magnitude smaller than
the corpus and are broadcast once via ``ray.put``.

Scale shape, stage by stage:

- **exact dedup decision**: rows never shuffle. Each block emits skinny
  ``(digest128, id)`` pairs (two independent SipHash-keyed 64-bit content hashes — the
  production-standard digest dedup; collision odds at 2^128 are
  negligible and two distinct docs colliding would merely drop one doc);
  one bounded-tag co-partition shuffle of the 24-byte pairs; per
  partition the non-min ids per digest are the LOSERS. Loser volume ≈
  duplicate volume (small by definition in a deduped-ish corpus);
  ``max_driver_ids`` guards the broadcast (overflow → raise with the
  co-partition ``_mark_removed`` path named).
- **near-dup decision**: ``minhash_neardup_exact`` (banded LSH +
  chunked bucket pair generation + exact-Jaccard verify — bucketed,
  never all-pairs). Removal rule: drop the LARGER id of every verified
  pair (== keep each cluster's min for pair-shaped clusters; transitive
  chains collapse over repeated runs exactly like repeated crawls).
- **filters**: broadcast sorted-array anti-joins (one ObjectRef, lazy
  node-local get, searchsorted membership) + the Gopher rule gate fused
  into the stream — no shuffle.
- **split/pack/write**: hash-threshold split (pure row function), ONE
  key shuffle for packing (bounded partition dispatch), then the
  range-partitioned sorted write with streaming manifest records — a
  killed run resumes from the finished partitions.

Reference basis: dedup/quality are the training-data operators the brief
adds; split/pack mirror ``examples/training_data_prep.yaml``; the sink is
the awss3exporter analog (``sinks/partitioned.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import part_tags
from ..stages.packing import dataset_split, pack_sequences

MAX_DRIVER_IDS = 50_000_000  # ~400 MB of int64 — the broadcast guard


def exact_dup_loser_ids(ds: ray.data.Dataset, text_col: str, id_col: str,
                        num_partitions: int = 64,
                        max_driver_ids: int = MAX_DRIVER_IDS) -> np.ndarray:
    """Ids that lose exact (digest) dedup — every member of a duplicate
    group except the min id. The corpus never shuffles: only skinny
    (digest1, digest2, id) triples move, pre-grouped per block so a block
    contributes one row per distinct content + its local losers."""
    def digests(batch: pa.Table) -> pa.Table:
        import pandas as pd
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # two INDEPENDENT SipHash families → 128-bit digest (distinct
        # hash_keys; a pair collision requires both to collide). Both run
        # pandas' C SipHash per string — O(total bytes); never
        # bytes_hash64 here, whose per-byte-position numpy loop is
        # pathological on long documents (its own docstring says so)
        vals = col.to_numpy(zero_copy_only=False)
        d1 = pd.util.hash_array(vals).view(np.int64)
        d2 = pd.util.hash_array(vals, hash_key="trainprep2ndfam!") \
            .view(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # local pre-dedup in ONE sorted pass: the run-boundary mask both
        # identifies each digest group's min id (keep) and the rest
        # (local losers) — no separate hash aggregation
        order = np.lexsort((ids, d2, d1))
        sd1, sd2, sid = d1[order], d2[order], ids[order]
        first = np.ones(len(sid), dtype=bool)
        first[1:] = (sd1[1:] != sd1[:-1]) | (sd2[1:] != sd2[:-1])
        loser_flag = np.zeros(len(sid), dtype=np.int8)
        loser_flag[~first] = 1
        out = pa.table({"d1": pa.array(sd1), "d2": pa.array(sd2),
                        "id": pa.array(sid),
                        "loser": pa.array(loser_flag)})
        tag = part_tags(sd1, num_partitions)
        return out.append_column("_part", pa.array(tag))

    def per_part(t: pa.Table) -> pa.Table:
        d1 = t["d1"].to_numpy(zero_copy_only=False)
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        pre = t["loser"].to_numpy(zero_copy_only=False).astype(bool)
        order = np.lexsort((ids, d2, d1))
        sd1, sd2, sid = d1[order], d2[order], ids[order]
        first = np.ones(len(sid), dtype=bool)
        first[1:] = (sd1[1:] != sd1[:-1]) | (sd2[1:] != sd2[:-1])
        lose = np.zeros(len(sid), dtype=bool)
        lose[order] = ~first          # not the group-wide min id
        lose |= pre                   # block-local losers stay losers
        return pa.table({"id": pa.array(ids[lose])})

    parts = ds.map_batches(digests, batch_format="pyarrow") \
              .groupby("_part").map_groups(per_part, batch_format="pyarrow")
    out, total = [], 0
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        total += b.num_rows
        if total > max_driver_ids:
            raise MemoryError(
                f"exact-dup loser set exceeds max_driver_ids="
                f"{max_driver_ids}; use the co-partition mark-join path "
                "(stages/dedup._mark_removed) instead of the broadcast")
        out.append(b["id"].to_numpy(zero_copy_only=False))
    return (np.unique(np.concatenate(out)) if out
            else np.empty(0, dtype=np.int64))


def neardup_loser_ids(ds: ray.data.Dataset, text_col: str, id_col: str, *,
                      k_shingle: int = 6, threshold: float = 0.8,
                      num_perm: int = 64, bands: int = 16,
                      max_bucket: int = 2000,
                      max_driver_ids: int = MAX_DRIVER_IDS) -> np.ndarray:
    """Ids removed by near-dedup: the larger id of every exact-verified
    near-dup pair (keep-min rule)."""
    from ..stages.dedup import minhash_neardup_exact
    pairs = minhash_neardup_exact(ds, text_col, id_col,
                                  k_shingle=k_shingle, threshold=threshold,
                                  num_perm=num_perm, bands=bands,
                                  max_bucket=max_bucket)
    out, total = [], 0
    for b in pairs.iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        a = b["id_a"].to_numpy(zero_copy_only=False)
        c = b["id_b"].to_numpy(zero_copy_only=False)
        drop = np.maximum(a, c)
        total += len(drop)
        if total > max_driver_ids:
            raise MemoryError(
                f"near-dup loser set exceeds max_driver_ids="
                f"{max_driver_ids}; cluster with "
                "cluster_pairs_distributed + _mark_removed instead")
        out.append(drop)
    return (np.unique(np.concatenate(out)) if out
            else np.empty(0, dtype=np.int64))


def drop_ids(ds: ray.data.Dataset, ids: np.ndarray,
             id_col: str) -> ray.data.Dataset:
    """Broadcast anti-join: ONE sorted id array in plasma (node-local lazy
    ``ray.get``), membership via ``searchsorted`` per batch — O(batch ×
    log(drop set)). Never ``np.isin``: it re-sorts the multi-million-row
    drop array on EVERY batch."""
    ref = ray.put(np.unique(np.asarray(ids, dtype=np.int64)))

    def fn(batch: pa.Table) -> pa.Table:
        drop = ray.get(ref)
        v = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(drop) == 0:
            return batch
        pos = np.minimum(np.searchsorted(drop, v), len(drop) - 1)
        return batch.filter(pa.array(drop[pos] != v))
    return ds.map_batches(fn, batch_format="pyarrow")


def quality_gate(ds: ray.data.Dataset, text_col: str = "text", *,
                 min_words: int = 5, max_words: int = 1_000_000,
                 min_mean_word_len: float = 1.0,
                 max_mean_word_len: float = 20.0) -> ray.data.Dataset:
    """Gopher-style rule gate FUSED into the stream (word-count and
    mean-word-length bounds — the subset of Rae et al. 2021 App. A rules
    computable without a stopword probe): rows that fail are filtered in
    place, all columns flow through. No shuffle, no state."""
    def fn(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch[text_col], " ")
        nw = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        nc = pc.utf8_length(batch[text_col]) \
               .to_numpy(zero_copy_only=False).astype(np.float64)
        mwl = (nc - (nw - 1)) / np.maximum(nw, 1)   # chars sans separators
        keep = ((nw >= min_words) & (nw <= max_words)
                & (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len))
        return batch.filter(pa.array(keep))
    return ds.map_batches(fn, batch_format="pyarrow")


def training_prep(docs: ray.data.Dataset, sink, *,
                  text_col: str = "text", id_col: str = "doc_id",
                  pack_key: str = "source", context_len: int = 2048,
                  neardup: bool = True, num_partitions: int = 64,
                  neardup_opts: dict | None = None,
                  shuffle: bool = False, shuffle_shards_n: int = 64,
                  pos_salt: int = 777,
                  resume: bool = True) -> dict:
    """Run the full composed job; returns
    ``{entries, n_exact_dropped, n_near_dropped, stats}`` where ``stats``
    is the final write stream's per-operator ``ds.stats()`` text (the
    north-rule per-stage throughput source).

    ``shuffle=True`` inserts the deterministic epoch shuffle
    (``packing.shuffle_shards``) between the quality gate and packing:
    documents are packed per SHARD in shuffled ``pos`` order instead of
    per ``pack_key`` in id order — the standard pretraining layout where
    neighboring context windows are unrelated documents. One extra
    bounded-tag shuffle of the SKINNY table; everything else (split,
    sorted write, resume) is unchanged and stays deterministic."""
    exact_losers = exact_dup_loser_ids(docs, text_col, id_col,
                                       num_partitions=num_partitions)
    survivors = drop_ids(docs, exact_losers, id_col)

    near_losers = np.empty(0, dtype=np.int64)
    if neardup:
        near_losers = neardup_loser_ids(survivors, text_col, id_col,
                                        **(neardup_opts or {}))
        survivors = drop_ids(survivors, near_losers, id_col)

    gated = quality_gate(survivors, text_col)

    def with_len(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch[text_col]).cast(pa.int64())
        return batch.append_column("n_chars", n).drop_columns([text_col])

    skinny = gated.map_batches(with_len, batch_format="pyarrow")
    routed = dataset_split(skinny, id_col, out="route")
    if shuffle:
        from ..stages.packing import shuffle_shards
        routed = shuffle_shards(routed, id_col,
                                num_shards=shuffle_shards_n,
                                pos_salt=pos_salt,
                                num_partitions=num_partitions)
        pack_key, pack_order = "shard", "pos"
    else:
        pack_order = id_col
    packed = pack_sequences(routed, key=pack_key, order_col=pack_order,
                            len_col="n_chars", context_len=context_len,
                            num_partitions=num_partitions)
    # materialize the SKINNY packed table (id/len/bin/route only — the
    # text column was dropped above) before the sorted write:
    # ``write_sorted`` needs a bounds pass plus the tagged write pass, so
    # an unmaterialized input would re-run the whole dedup→gate→pack
    # chain per pass. The packed table is ~tens of bytes/row; at corpus
    # scale it spills to disk, which is still far cheaper than a second
    # full-corpus pass.
    packed = packed.materialize()
    entries = sink.write_sorted(packed, sort_col=id_col, route_col="route",
                                tokens_len_col="n_chars", resume=resume)
    # per-stage throughput (north rule): the sink lands metrics.json
    # (parsed Dataset.stats()) next to the manifest on every write
    stats = None
    try:
        import json

        from .. import fsio
        stats = json.loads(fsio.read_bytes(fsio.join(sink.root,
                                                     "metrics.json")))
    except Exception:
        pass
    return {"entries": entries,
            "n_exact_dropped": int(len(exact_losers)),
            "n_near_dropped": int(len(near_losers)),
            "stats": stats}
