"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are treated as opaque Arrow ``binary`` columns
flowing zero-copy through the pipeline; decode / feature-extract stages are
actor pools (decoder state loaded once per actor in ``__init__``). The
actual codec libraries (PIL / torchaudio / av) are NOT in this container,
so the decode kernel is gated behind an import-try with a clearly-marked
deterministic fallback — the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested.

Batch sizing: large payloads need SMALL batches so
``batch_size × payload × concurrency`` fits the worker heap — pass
``batch_size`` explicitly (default 256 here vs 8192 for text stages).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import round6


def attach_binary_payload(ds: ray.data.Dataset, text_col: str = "text",
                          out: str = "payload") -> ray.data.Dataset:
    """Test-scale payload synthesis: utf-8 bytes of a string column as the
    opaque binary payload (stands in for image/audio bytes)."""
    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return batch.append_column(out, col.cast(pa.binary()))
    return ds.map_batches(fn, batch_format="pyarrow")


class ImageDecoder:
    """Actor-pool decode stage. Real codec if available, else a
    deterministic fake: 'width' = byte length, 'height' = first byte,
    'mode' = 'FAKE'. Raises NotImplementedError in strict mode when no
    codec library exists."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:
            from PIL import Image  # noqa: F401  (not present in this container)
            self._pil = Image
        except ImportError:
            self._pil = None
            if strict:
                raise NotImplementedError(
                    "image decode requires PIL, which is not installed; "
                    "run with strict=False for the deterministic fake")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        if self._pil is not None:
            import io
            widths, heights, modes = [], [], []
            for b in payload.to_pylist():
                img = self._pil.open(io.BytesIO(b))
                widths.append(img.width); heights.append(img.height); modes.append(img.mode)
            w = np.asarray(widths, dtype=np.int64); h = np.asarray(heights, dtype=np.int64)
            m = np.asarray(modes, dtype=object)
        else:
            # deterministic fake decode — byte length + first byte,
            # read straight from the binary buffers (no Python bytes)
            lb = payload.cast(pa.large_binary())
            n = len(lb)
            offs = np.frombuffer(lb.buffers()[1], dtype=np.int64)[
                lb.offset: lb.offset + n + 1]
            data = np.frombuffer(lb.buffers()[2], dtype=np.uint8)
            lens = np.diff(offs)
            firsts = np.zeros(n, dtype=np.int64)
            nz = lens > 0
            firsts[nz] = data[offs[:-1][nz]]
            w, h = lens.astype(np.int64), firsts
            m = np.full(n, "FAKE", dtype=object)
        batch = batch.append_column("width", pa.array(w))
        batch = batch.append_column("height", pa.array(h))
        return batch.append_column("mode", pa.array(m, type=pa.string()))


def decode_stage(ds: ray.data.Dataset, concurrency: int | None = None,
                 batch_size: int = 256, strict: bool = False) -> ray.data.Dataset:
    """Default: elastic stateless tasks (the stub decoder carries no model
    state). A REAL codec deployment passes ``concurrency=N`` so the model/
    codec loads once per actor in ``__init__``."""
    if concurrency is None:
        return ds.map_batches(ImageDecoder(strict=strict),
                              batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(ImageDecoder, fn_constructor_kwargs={"strict": strict},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def byte_histogram_features(ds: ray.data.Dataset, payload_col: str = "payload",
                            bins: int = 16, out: str = "features"
                            ) -> ray.data.Dataset:
    """REAL feature extraction over opaque binary payloads: an L1-normalized
    byte-value histogram per row (``bins`` must divide 256) — the
    codec-free member of the multimodal feature family, fully vectorized
    over the flattened Arrow binary buffer (one ``np.add.at`` scatter per
    batch, no per-row Python). Output: ``list<float32>`` feature column
    ready for the ANN / embedding-dedup operators."""
    assert 256 % bins == 0
    shift = 8 - int(np.log2(bins))

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.large_binary())  # int64 offsets, slice-safe
        n = len(col)
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset: col.offset + n + 1]
        start, end = int(offsets[0]), int(offsets[-1])
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[start:end]
        offsets = offsets - start
        lens = np.diff(offsets)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        hist = np.zeros(n * bins, dtype=np.int64)
        np.add.at(hist, row_of * bins + (data >> shift).astype(np.int64), 1)
        hist = hist.reshape(n, bins).astype(np.float32)
        hist /= np.maximum(lens, 1)[:, None].astype(np.float32)
        flat = pa.array(hist.reshape(-1))
        feats = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * bins, bins, dtype=np.int32)), flat)
        return batch.append_column(out, feats)
    return ds.map_batches(fn, batch_format="pyarrow")


class ImageResizer:
    """Actor-pool resize stage — plumbing real (schema, batch sizing, actor
    signature), pixel math gated behind the codec import like the decoder:
    without PIL it stamps the TARGET dims and passes the payload through
    untouched (strict=True raises)."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.width, self.height = width, height
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None
            if strict:
                raise NotImplementedError(
                    "image resize requires PIL, which is not installed; "
                    "run with strict=False for the passthrough stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._pil is not None:  # pragma: no cover - no PIL here
            import io
            out = []
            for b in batch["payload"].to_pylist():
                img = self._pil.open(io.BytesIO(b)).resize(
                    (self.width, self.height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
            batch = batch.set_column(batch.column_names.index("payload"),
                                     "payload", pa.array(out, type=pa.binary()))
        n = batch.num_rows
        batch = batch.append_column(
            "target_width", pa.array(np.full(n, self.width, dtype=np.int64)))
        return batch.append_column(
            "target_height", pa.array(np.full(n, self.height, dtype=np.int64)))


def resize_stage(ds: ray.data.Dataset, width: int, height: int,
                 concurrency: int | None = None, batch_size: int = 256,
                 strict: bool = False) -> ray.data.Dataset:
    if concurrency is None:  # see decode_stage
        return ds.map_batches(ImageResizer(width, height, strict=strict),
                              batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(ImageResizer,
                          fn_constructor_args=(width, height),
                          fn_constructor_kwargs={"strict": strict},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def frame_sample_stage(ds: ray.data.Dataset, every_n: int = 10,
                       id_col: str = "doc_id") -> ray.data.Dataset:
    """Frame-sampling analog: deterministic keep-every-nth by integer-id
    hash — same plumbing a video frame sampler uses (stateless, pure
    function of the key). SQL-equivalent predicate:
    ``(id * 2654435761 + 12345) % every_n = 0``."""
    from ..functions.hashing import mulhash

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = mulhash(ids, mod=every_n) == 0
        return batch.filter(pa.array(keep))
    return ds.map_batches(fn, batch_format="pyarrow")


# --- Content-defined chunking (CDC) dedup ----------------------------------

_CDC_P = np.uint64(1099511628211)            # FNV prime, odd → invertible
_CDC_PINV = np.uint64(pow(1099511628211, -1, 1 << 64))


def _rolling_boundaries(data: np.ndarray, window: int, mask: np.uint64
                        ) -> np.ndarray:
    """Positions i where the hash of ``data[i-window+1 : i+1]`` has its
    low bits zero (Rabin-style gear: 16 shifted multiply-adds, fully
    vectorized — no per-byte Python)."""
    n = len(data)
    if n < window:
        return np.empty(0, dtype=np.int64)
    h = np.zeros(n - window + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(window):
            w = _CDC_P ** np.uint64(window - 1 - j)
            h += data[j: n - window + 1 + j].astype(np.uint64) * w
    return np.flatnonzero((h & mask) == 0) + window - 1


def cdc_chunks(ds: ray.data.Dataset, payload_col: str = "payload",
               id_col: str = "doc_id", window: int = 16,
               mask_bits: int = 6) -> ray.data.Dataset:
    """Content-defined chunking for binary-payload dedup (Rabin-style —
    Muthitacharoen et al., LBFS SOSP'01): chunk boundaries depend only on
    LOCAL byte content, so an insertion early in a payload re-chunks only
    the affected neighborhood (shift-robust, unlike fixed-size blocks).

    Per batch everything is vectorized over the flattened Arrow binary
    buffer: one rolling-hash pass for boundaries, then per-chunk 64-bit
    polynomial fingerprints from ONE prefix-sum (``hash(chunk) =
    (S[e]−S[s])·P⁻ˢ`` with wrap-around arithmetic — exact, order-exact,
    no per-chunk loop). Output per row: id, n_chunks,
    chunk_hashes (list<int64>), chunk_lens (list<int32>)."""
    mask = np.uint64((1 << mask_bits) - 1)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.large_binary())
        n = len(col)
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
            col.offset: col.offset + n + 1]
        start = int(offsets[0])
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[
            start: int(offsets[-1])]
        offsets = offsets - start
        total = len(data)

        cuts = _rolling_boundaries(data, window, mask) + 1  # cut AFTER pos
        # row-local boundaries: every row start/end is always a cut.
        # (No min-chunk sweep: an exact one is a sequential dependency —
        # a per-boundary Python loop — and the expected chunk size is
        # already set by mask_bits; 2^mask_bits ≈ 64 B here.)
        cuts = np.unique(np.concatenate([offsets, cuts]))

        # per-chunk polynomial fingerprints from one prefix sum
        with np.errstate(over="ignore"):
            pw = np.empty(total + 1, dtype=np.uint64)
            pw[0] = np.uint64(1)
            np.multiply.accumulate(
                np.full(total, _CDC_P, dtype=np.uint64), out=pw[1:])
            weighted = (data.astype(np.uint64) + np.uint64(1)) * pw[:total]
            S = np.zeros(total + 1, dtype=np.uint64)
            np.cumsum(weighted, out=S[1:])
            s_idx, e_idx = cuts[:-1], cuts[1:]
            pinv = np.empty(total + 1, dtype=np.uint64)
            pinv[0] = np.uint64(1)
            np.multiply.accumulate(
                np.full(total, _CDC_PINV, dtype=np.uint64), out=pinv[1:])
            hashes = (S[e_idx] - S[s_idx]) * pinv[s_idx]
        lens = (e_idx - s_idx).astype(np.int32)
        chunk_row = np.searchsorted(offsets, s_idx, side="right") - 1
        # rows with zero bytes produce zero chunks
        counts = np.bincount(chunk_row, minlength=n).astype(np.int32)
        list_offsets = np.r_[0, np.cumsum(counts)].astype(np.int32)
        return pa.table({
            id_col: batch[id_col],
            "n_chunks": pa.array(counts.astype(np.int64)),
            "chunk_hashes": pa.ListArray.from_arrays(
                pa.array(list_offsets), pa.array(hashes.view(np.int64))),
            "chunk_lens": pa.ListArray.from_arrays(
                pa.array(list_offsets), pa.array(lens)),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def chunk_dedup_ratio(ds: ray.data.Dataset, payload_col: str = "payload",
                      id_col: str = "doc_id", **cdc_kwargs):
    """Corpus-level CDC dedup accounting: distinct vs total chunks and
    the byte dedup ratio — per-block distinct partials (packed hashes),
    merged through one bounded-tag partition exchange."""
    import pandas as pd

    chunks = cdc_chunks(ds, payload_col, id_col, **cdc_kwargs)

    def block(batch: pa.Table) -> pa.Table:
        h = batch["chunk_hashes"]
        if isinstance(h, pa.ChunkedArray):
            h = h.combine_chunks()
        ln = batch["chunk_lens"]
        if isinstance(ln, pa.ChunkedArray):
            ln = ln.combine_chunks()
        hv = h.values.to_numpy(zero_copy_only=False)
        lv = ln.values.to_numpy(zero_copy_only=False).astype(np.int64)
        uh, first = np.unique(hv, return_index=True)
        t = pa.table({"h": pa.array(uh), "len": pa.array(lv[first]),
                      "n_total": pa.array(
                          np.r_[np.int64(len(hv)),
                                np.zeros(len(uh) - 1 if len(uh) else 0,
                                         np.int64)]
                          if len(uh) else np.empty(0, np.int64)),
                      "bytes_total": pa.array(
                          np.r_[np.int64(lv.sum()),
                                np.zeros(len(uh) - 1 if len(uh) else 0,
                                         np.int64)]
                          if len(uh) else np.empty(0, np.int64))})
        part = (uh % np.int64(64)).astype(np.int32)
        return t.append_column("_part", pa.array(part))

    partials = chunks.map_batches(block, batch_format="pyarrow")

    def merge(g: pa.Table) -> pa.Table:
        hv = g["h"].to_numpy(zero_copy_only=False)
        lv = g["len"].to_numpy(zero_copy_only=False)
        uh, first = np.unique(hv, return_index=True)
        return pa.table({
            "distinct": pa.array([np.int64(len(uh))]),
            "distinct_bytes": pa.array([np.int64(lv[first].sum())]),
            "total": pa.array([np.int64(g["n_total"].to_numpy(
                zero_copy_only=False).sum())]),
            "bytes_total": pa.array([np.int64(g["bytes_total"].to_numpy(
                zero_copy_only=False).sum())]),
        })

    parts = (partials.groupby("_part").map_groups(merge,
                                                  batch_format="pyarrow")
             .to_pandas())
    distinct = int(parts["distinct"].sum())
    total = int(parts["total"].sum())
    dbytes = int(parts["distinct_bytes"].sum())
    tbytes = int(parts["bytes_total"].sum())
    return pd.DataFrame({
        "total_chunks": [total], "distinct_chunks": [distinct],
        "total_bytes": [tbytes], "distinct_bytes": [dbytes],
        "byte_dedup_ratio": [round6(dbytes / max(tbytes, 1))],
    })
