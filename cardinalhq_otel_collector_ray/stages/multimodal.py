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
            # deterministic fake decode — byte length + first byte
            lens = pa.compute.binary_length(payload).to_numpy(zero_copy_only=False)
            firsts = np.asarray([b[0] if len(b) else 0 for b in payload.to_pylist()],
                                dtype=np.int64)
            w, h = lens.astype(np.int64), firsts
            m = np.full(len(w), "FAKE", dtype=object)
        batch = batch.append_column("width", pa.array(w))
        batch = batch.append_column("height", pa.array(h))
        return batch.append_column("mode", pa.array(m, type=pa.string()))


def decode_stage(ds: ray.data.Dataset, concurrency: int = 2,
                 batch_size: int = 256, strict: bool = False) -> ray.data.Dataset:
    return ds.map_batches(ImageDecoder, fn_constructor_kwargs={"strict": strict},
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
