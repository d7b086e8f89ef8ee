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
