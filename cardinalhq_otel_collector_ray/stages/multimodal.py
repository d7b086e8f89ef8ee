"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads are treated as opaque Arrow ``binary`` columns
flowing zero-copy through the pipeline; decode / feature-extract stages are
actor pools (decoder state loaded once per actor in ``__init__``).

Codecs: **BMP (24-bpp uncompressed) and WAV (PCM) decode for REAL with
stdlib only** — a BMP header/pixel parse over the flat Arrow binary buffer
and the ``wave`` module respectively; BMP resize is a real numpy
nearest-neighbor kernel. Formats that need third-party libraries
(JPEG/PNG/MP3/MP4 via PIL / av, absent in this container) fall back to the
import-try gate with a clearly-marked deterministic fake; ``strict=True``
raises on any payload the stage cannot REALLY decode.

Batch sizing: large payloads need SMALL batches so
``batch_size × payload × concurrency`` fits the worker heap — pass
``batch_size`` explicitly (default 256 here vs 8192 for text stages).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import round6


# --- deterministic payload synthesis (tests + driver-checked queries) ------

def synth_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A valid 24-bpp bottom-up BMP whose pixel bytes are a deterministic
    function of (x, y, seed) — REAL, decodable by any image library."""
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    pix_size = row_bytes * height
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + pix_size, 0, 0, 54,        # file header
        40, width, height, 1, 24, 0, pix_size,  # BITMAPINFOHEADER
        2835, 2835, 0, 0)
    x = np.arange(row_bytes, dtype=np.uint64)[None, :]
    y = np.arange(height, dtype=np.uint64)[:, None]
    pix = ((x * np.uint64(31) + y * np.uint64(97) + np.uint64(seed))
           % np.uint64(256)).astype(np.uint8)
    return header + pix.tobytes()


def synth_wav(n_frames: int, rate: int = 8000, channels: int = 1,
              seed: int = 0) -> bytes:
    """A valid PCM WAV (16-bit) with deterministic sample values, written
    through the stdlib ``wave`` codec itself."""
    import io
    import wave
    samples = ((np.arange(n_frames * channels, dtype=np.int64) * 73 + seed)
               % 2003 - 1001).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _flat_binary(col) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) views over a binary column's flat buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_binary())
    n = len(col)
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset: col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return offsets, data


def _gather_le(data: np.ndarray, pos: np.ndarray, nbytes: int) -> np.ndarray:
    """Vectorized little-endian integer gather at byte positions ``pos``."""
    out = np.zeros(len(pos), dtype=np.int64)
    for j in range(nbytes):
        out |= data[pos + j].astype(np.int64) << (8 * j)
    return out


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
    """Actor-pool decode stage.

    BMP payloads decode for REAL (vectorized header parse over the flat
    Arrow binary buffer — width/height/bpp from BITMAPINFOHEADER, no
    third-party codec, no per-row Python). Other formats go to PIL when
    available, else the deterministic fake ('width' = byte length,
    'height' = first byte, 'mode' = 'FAKE'). ``strict=True`` raises
    NotImplementedError on any payload that cannot be REALLY decoded
    (non-BMP without PIL)."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:
            from PIL import Image  # noqa: F401  (not present in this container)
            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        offs, data = _flat_binary(payload)
        n = len(offs) - 1
        lens = np.diff(offs)
        # format sniff: 'BM' magic + full 54-byte header present
        is_bmp = lens >= 54
        if is_bmp.any():
            p = offs[:-1][is_bmp]
            is_bmp[is_bmp] = (data[p] == 0x42) & (data[p + 1] == 0x4D)
        if is_bmp.any():
            # header-sanity bounds: a truncated or garbage payload that
            # happens to start with 'BM' must NOT yield bogus dims — it
            # routes to the fake (non-strict) / raise (strict) path like
            # every other undecodable payload (ImageResizer contract).
            p = offs[:-1][is_bmp]
            plen = lens[is_bmp]
            declared = _gather_le(data, p + 2, 4)          # file size field
            data_off = _gather_le(data, p + 10, 4)         # pixel data offset
            bw = (_gather_le(data, p + 18, 4)
                  .astype(np.uint32)).astype(np.int32).astype(np.int64)
            bh_raw = (_gather_le(data, p + 22, 4)
                      .astype(np.uint32)).astype(np.int32).astype(np.int64)
            bpp = _gather_le(data, p + 28, 2)
            compression = _gather_le(data, p + 30, 4)
            ok = ((declared <= plen)                       # not truncated
                  & (data_off >= 54) & (data_off <= plen)  # offset in payload
                  & np.isin(bpp, (1, 4, 8, 16, 24, 32))
                  & (bw > 0) & (bh_raw != 0))
            # uncompressed (BI_RGB): the full pixel array must fit
            stride = ((bw * bpp + 31) // 32) * 4
            need = data_off + stride * np.abs(bh_raw)
            ok &= (compression != 0) | (need <= plen)
            is_bmp[is_bmp] = ok
        w = np.zeros(n, dtype=np.int64)
        h = np.zeros(n, dtype=np.int64)
        m = np.full(n, "FAKE", dtype=object)
        if is_bmp.any():
            p = offs[:-1][is_bmp]
            bw = _gather_le(data, p + 18, 4)
            bh = _gather_le(data, p + 22, 4)
            bpp = _gather_le(data, p + 28, 2)
            # int32 sign (top-down BMPs store negative height)
            bw = (bw.astype(np.uint32)).astype(np.int32).astype(np.int64)
            bh = np.abs((bh.astype(np.uint32)).astype(np.int32)).astype(np.int64)
            w[is_bmp], h[is_bmp] = bw, bh
            m[is_bmp] = [f"BMP{b}" for b in bpp]
        rest = ~is_bmp
        if rest.any():
            if self._pil is not None:  # pragma: no cover - no PIL here
                import io
                for i in np.flatnonzero(rest):
                    img = self._pil.open(io.BytesIO(
                        data[offs[i]:offs[i + 1]].tobytes()))
                    w[i], h[i], m[i] = img.width, img.height, img.mode
            elif self.strict:
                raise NotImplementedError(
                    f"{int(rest.sum())} payload(s) are not BMP and PIL is "
                    "not installed; run with strict=False for the "
                    "deterministic fake")
            else:
                # deterministic fake — byte length + first byte, straight
                # from the flat buffer (no Python bytes)
                firsts = np.zeros(n, dtype=np.int64)
                nz = rest & (lens > 0)
                firsts[nz] = data[offs[:-1][nz]]
                w[rest] = lens[rest]
                h[rest] = firsts[rest]
        batch = batch.append_column("width", pa.array(w))
        batch = batch.append_column("height", pa.array(h))
        return batch.append_column("mode", pa.array(m, type=pa.string()))


class AudioDecoder:
    """Actor-pool WAV decode stage — the REAL stdlib ``wave`` codec.
    Output per row: sample_rate, n_channels, n_frames, duration_us
    (= n_frames * 1_000_000 // rate, exact integer so the SQL oracle can
    reproduce it). Non-WAV payloads: zeros + codec='FAKE' (``strict=True``
    raises)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io
        import wave
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(payload)
        rate = np.zeros(n, dtype=np.int64)
        chans = np.zeros(n, dtype=np.int64)
        frames = np.zeros(n, dtype=np.int64)
        codec = np.full(n, "FAKE", dtype=object)
        for i in range(n):
            b = payload[i].as_py()
            if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                try:
                    with wave.open(io.BytesIO(b)) as w:
                        rate[i] = w.getframerate()
                        chans[i] = w.getnchannels()
                        frames[i] = w.getnframes()
                    codec[i] = "PCM"
                except (wave.Error, EOFError):
                    # RIFF/WAVE magic but unparseable container: the FAKE
                    # stamp in non-strict mode, same as any non-WAV payload
                    if self.strict:
                        raise
                    rate[i] = chans[i] = frames[i] = 0
            elif self.strict:
                raise NotImplementedError(
                    "payload is not a RIFF/WAVE container; run with "
                    "strict=False for the zero-stamped fake")
        dur = np.where(rate > 0, frames * 1_000_000 // np.maximum(rate, 1), 0)
        batch = batch.append_column("sample_rate", pa.array(rate))
        batch = batch.append_column("n_channels", pa.array(chans))
        batch = batch.append_column("n_frames", pa.array(frames))
        batch = batch.append_column("duration_us", pa.array(dur))
        return batch.append_column("codec", pa.array(codec, type=pa.string()))


def audio_decode_stage(ds: ray.data.Dataset, concurrency: int | None = None,
                       batch_size: int = 256, strict: bool = False
                       ) -> ray.data.Dataset:
    """WAV decode over a binary ``payload`` column (see ``AudioDecoder``)."""
    if concurrency is None:
        return ds.map_batches(AudioDecoder(strict=strict),
                              batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(AudioDecoder, fn_constructor_kwargs={"strict": strict},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


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


def _bmp_resize_nn(b: bytes, tw: int, th: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bpp uncompressed BMP — numpy
    index-map over the pixel array, re-encoded as a fresh 24-bpp BMP."""
    (w,) = struct.unpack_from("<i", b, 18)
    (h_signed,) = struct.unpack_from("<i", b, 22)
    (bpp,) = struct.unpack_from("<H", b, 28)
    (data_off,) = struct.unpack_from("<I", b, 10)
    if bpp != 24:
        raise NotImplementedError(f"BMP resize supports 24-bpp only, got {bpp}")
    h = abs(h_signed)
    row_bytes = (w * 3 + 3) & ~3
    pix = np.frombuffer(b, dtype=np.uint8,
                        count=row_bytes * h, offset=data_off)
    pix = pix.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    out = pix[ys][:, xs]                       # (th, tw, 3) gather
    out_row = (tw * 3 + 3) & ~3
    padded = np.zeros((th, out_row), dtype=np.uint8)
    padded[:, : tw * 3] = out.reshape(th, tw * 3)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + padded.size, 0, 0, 54,
        40, tw, th if h_signed >= 0 else -th, 1, 24, 0, padded.size,
        2835, 2835, 0, 0)
    return header + padded.tobytes()


class ImageResizer:
    """Actor-pool resize stage. 24-bpp BMP payloads resize for REAL
    (numpy nearest-neighbor, stdlib-only re-encode); other formats go to
    PIL when available, else pass through untouched with the TARGET dims
    stamped (``strict=True`` raises on payloads that cannot be REALLY
    resized)."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.width, self.height = width, height
        self.strict = strict
        try:
            from PIL import Image  # noqa: F401
            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        out, changed = [], False
        for b in payload.to_pylist():
            if len(b) >= 54 and b[:2] == b"BM":
                try:
                    out.append(_bmp_resize_nn(b, self.width, self.height))
                    changed = True
                except (NotImplementedError, ValueError, struct.error):
                    # 'BM' magic but not a parseable 24-bpp BMP (e.g. text
                    # that happens to start with BM, or a truncated file):
                    # strict raises, non-strict passes through untouched
                    if self.strict:
                        raise
                    out.append(b)
            elif self._pil is not None:  # pragma: no cover - no PIL here
                import io
                img = self._pil.open(io.BytesIO(b)).resize(
                    (self.width, self.height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
                changed = True
            elif self.strict:
                raise NotImplementedError(
                    "payload is not a 24-bpp BMP and PIL is not installed; "
                    "run with strict=False for the passthrough stub")
            else:
                out.append(b)  # passthrough stub
        if changed:
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
