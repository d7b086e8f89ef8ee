"""Tokenized-sequence source: documents → (doc_id, tokens, n_tok, source).

Produces the mandated input shape from BASELINE.json ``input_hint``
(``doc_id:string, tokens:array<int32>, n_tok:int32, source:string``)
deterministically from the driver-supplied ``documents`` table — no external
data. Token id = rank of the word in the sorted global vocabulary, which a
SQL oracle reproduces with ``row_number() OVER (ORDER BY word) - 1``.

At 100 TB the vocabulary is a *fixed broadcast artifact* (a BPE vocab of
~50k entries), exactly like the reference's broadcast enrichment dictionary
(``extension/chqauthextension/serverauth.go:132-136``): built / loaded once,
``ray.put`` once, read by every tokenizer actor in ``__init__``. Here we
build it with a distributed distinct-word pass (per-batch word sets →
tiny union), which is the same shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.text import split_words
from .parquet import read_table


def build_vocab(sf_dir: str) -> dict[str, int]:
    """Global sorted-word vocabulary. Distributed distinct: per-batch
    dictionary-encode (C++) → per-batch unique word lists (small) →
    driver-side union. Only distinct words per batch reach the driver."""
    ds = read_table(sf_dir, "documents", columns=["text"])

    def batch_distinct(batch: pa.Table) -> pa.Table:
        words = split_words(batch["text"])
        uniq = words.values.unique() if len(words) else pa.array([], pa.string())
        return pa.table({"word": uniq})

    parts = ds.map_batches(batch_distinct, batch_format="pyarrow")
    vocab_words = set()
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_words.update(b["word"].to_pylist())
    vocab_words.discard("")
    return {w: i for i, w in enumerate(sorted(vocab_words))}


class Tokenizer:
    """Tokenizer over a broadcast vocab.

    Works in BOTH execution shapes: as a stateless-task fn (instance passed
    to map_batches — the ObjectRef resolves from node-local plasma, lazily,
    at most one real fetch per node) and as an actor-pool class
    (``map_batches(Tokenizer, fn_constructor_args=...)`` — resolve once per
    actor). Stateless is the default: the vocab is small and elastic tasks
    scale with the cluster instead of a fixed pool.

    The kernel processes the block in ``chunk_rows``-row slices whose
    split/encode/gather working set stays LLC-resident, concatenating the
    slice outputs zero-copy (a chunked Table, no re-copy). Block-sized
    batches (~30k rows here) stream ~1 KB/row of intermediates through
    DRAM; with every core running one such task, the headline pipeline is
    DRAM-bound and the 8→32 scaling point pays for it (BASELINE.md).
    Measured single-thread: 30k rows 0.15 s whole-block vs 0.088 s at
    2048-row slices — cache residency pays even uncontended.
    """

    def __init__(self, vocab_ref, keep_text: bool = False,
                 chunk_rows: int = 2048):
        self._ref = vocab_ref
        self._vocab = None
        self._vocab_arr = None   # pa.string() of keys, for pc.index_in
        self._lut = None         # position-in-keys -> token id (+unk tail)
        self._identity = False   # lut is arange -> skip the remap pass
        self.keep_text = keep_text
        self.chunk_rows = chunk_rows

    @property
    def vocab(self):
        if self._vocab is None:
            self._vocab = (ray.get(self._ref)
                           if isinstance(self._ref, ray.ObjectRef) else self._ref)
            # One-time per worker: the C++ hash-probe path (pc.index_in
            # against the key array) replaces per-slice dictionary_encode
            # — ~25% off the map step, and zero per-slice Python. The LUT
            # remaps key position -> token id; a sorted-rank vocab (the
            # flagship's) is the identity, so the np.take pass is skipped.
            v = self._vocab
            self._vocab_arr = pa.array(list(v.keys()), type=pa.string())
            lut = np.fromiter(v.values(), dtype=np.int32, count=len(v))
            self._identity = bool((lut == np.arange(len(lut),
                                                    dtype=np.int32)).all())
            self._lut = np.append(lut, np.int32(-1))  # null/unk tail
        return self._vocab

    def _map_ids(self, words: pa.Array) -> pa.Array:
        """list<string> words -> list<int32> token ids via index_in."""
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        pos = pc.index_in(words.values, value_set=self._vocab_arr)
        if self._identity:
            ids = pc.fill_null(pos, -1).cast(pa.int32())
        else:
            p = pc.fill_null(pos, len(self._vocab)) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            ids = pa.array(self._lut[p])
        return pa.ListArray.from_arrays(words.offsets, ids)

    def _one(self, batch: pa.Table) -> pa.Table:
        self.vocab  # ensure the cached index_in artifacts exist
        words = split_words(batch["text"])
        tokens = self._map_ids(words)
        n_tok = pa.array(np.diff(tokens.offsets.to_numpy(zero_copy_only=False)).astype(np.int32))
        doc_id = batch["doc_id"].cast(pa.string())
        cols = {"doc_id": doc_id, "tokens": tokens,
                "n_tok": n_tok, "source": batch["source"]}
        if self.keep_text:
            cols["text"] = batch["text"]
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows <= self.chunk_rows:
            return self._one(batch)
        outs = [self._one(batch.slice(s, self.chunk_rows))
                for s in range(0, batch.num_rows, self.chunk_rows)]
        return pa.concat_tables(outs)  # zero-copy chunked columns


def tokenized_documents(sf_dir: str, vocab: dict[str, int] | None = None,
                        concurrency: int | None = None,
                        keep_text: bool = False) -> ray.data.Dataset:
    """The canonical token table as a streaming Dataset.

    Default: stateless tasks (elastic). Pass ``concurrency`` for a pinned
    actor pool (size it to leave CPUs for the read stage — a pool that
    reserves every CPU starves the reader and the pipeline serializes).
    """
    if vocab is None:
        vocab = build_vocab(sf_dir)
    vocab_ref = ray.put(vocab)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    # batch_size=None → one batch per block: block size is already set at
    # the read; a fixed row batch_size makes the map op accumulate rows
    # ACROSS blocks, which bundles inputs and serializes the stage.
    if concurrency is None:
        return ds.map_batches(Tokenizer(vocab_ref, keep_text=keep_text),
                              batch_format="pyarrow", batch_size=None)
    return ds.map_batches(Tokenizer, fn_constructor_args=(vocab_ref,),
                          fn_constructor_kwargs={"keep_text": keep_text},
                          batch_format="pyarrow", batch_size=None,
                          concurrency=concurrency)
