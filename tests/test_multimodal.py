"""Multimodal plumbing: opaque binary payloads, decode/resize actor stages
(codec-gated), REAL byte-histogram feature extraction, frame sampling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cardinalhq_otel_collector_ray.stages.multimodal import (
    ImageDecoder, ImageResizer, attach_binary_payload,
    byte_histogram_features, decode_stage, frame_sample_stage, resize_stage)


def _payload_ds():
    return attach_binary_payload(ray.data.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["abc", "", "zzzz", "hello world"],
    })))


def test_byte_histogram_exact_vs_python_reference(ray_session):
    out = byte_histogram_features(_payload_ds(), bins=16).to_pandas()
    for _, row in out.iterrows():
        b = row["text"].encode()
        want = np.zeros(16, dtype=np.float32)
        for byte in b:
            want[byte >> 4] += 1
        want /= max(len(b), 1)
        np.testing.assert_array_equal(np.asarray(row["features"],
                                                 dtype=np.float32), want)


def test_byte_histogram_feeds_embedding_dedup(ray_session):
    """The extracted features are a real list<float> column — usable by the
    embedding-cosine near-dup operator directly."""
    from cardinalhq_otel_collector_ray.stages.dedup import embedding_neardup_pairs
    ds = attach_binary_payload(ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["aaaa bbbb", "aaaa bbbb", "zzzz!!!!"],
    })))
    feats = byte_histogram_features(ds, bins=16)
    feats = feats.map_batches(
        lambda t: t.append_column("grp", pa.array([0] * t.num_rows)),
        batch_format="pyarrow")
    pairs = embedding_neardup_pairs(feats, "features", "doc_id", "grp",
                                    threshold=0.999).to_pandas()
    assert (1, 2) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_decode_fake_deterministic(ray_session):
    out = decode_stage(_payload_ds(), concurrency=1).to_pandas() \
        .sort_values("doc_id")
    assert list(out["mode"].unique()) == ["FAKE"]
    assert list(out["width"]) == [3, 0, 4, 11]   # byte lengths
    assert out.iloc[0]["height"] == ord("a")


def test_decode_strict_raises_on_undecodable_payload():
    # strict mode now raises per-payload (non-BMP without PIL), not at
    # construction — BMP decode is always REALLY available (stdlib)
    dec = ImageDecoder(strict=True)
    with pytest.raises(NotImplementedError):
        dec(pa.table({"payload": pa.array([b"not an image"], pa.binary())}))


def test_nonstrict_decoders_survive_malformed_magic():
    """Round-4 review: magic-byte sniffs route payloads into the REAL
    stdlib codecs, but a payload can carry the magic and still be garbage
    (text starting with 'BM', truncated RIFF). Non-strict mode must fall
    back (FAKE stamp / passthrough), never crash the stage; strict mode
    raises."""
    from cardinalhq_otel_collector_ray.stages.multimodal import (
        AudioDecoder, ImageResizer)
    bad_wav = pa.table({"payload": pa.array(
        [b"RIFF0000WAVE" + b"\x00" * 8], pa.binary())})
    out = AudioDecoder(strict=False)(bad_wav)
    assert out["codec"].to_pylist() == ["FAKE"]
    assert out["sample_rate"].to_pylist() == [0]
    with pytest.raises(Exception):
        AudioDecoder(strict=True)(bad_wav)

    bm_text = b"BM" + b"this is not a bitmap, just text " * 2
    bad_bmp = pa.table({"payload": pa.array([bm_text], pa.binary())})
    out = ImageResizer(4, 4, strict=False)(bad_bmp)
    assert out["payload"].to_pylist() == [bm_text]  # passthrough untouched
    assert out["target_width"].to_pylist() == [4]
    with pytest.raises(Exception):
        ImageResizer(4, 4, strict=True)(bad_bmp)


def test_bmp_decode_real_roundtrip(ray_session):
    """REAL codec path: synthesized 24-bpp BMPs decode to their true
    pixel dimensions (not byte lengths) — strict mode, no fake."""
    from cardinalhq_otel_collector_ray.stages.multimodal import synth_bmp
    dims = [(1, 1), (7, 3), (64, 48), (33, 2)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(dims))),
        "payload": pa.array([synth_bmp(w, h, seed=i)
                             for i, (w, h) in enumerate(dims)], pa.binary())}))
    out = decode_stage(ds, concurrency=1, strict=True).to_pandas() \
        .sort_values("doc_id")
    assert list(zip(out["width"], out["height"])) == dims
    assert list(out["mode"].unique()) == ["BMP24"]


def test_wav_decode_real_roundtrip(ray_session):
    from cardinalhq_otel_collector_ray.stages.multimodal import (
        AudioDecoder, audio_decode_stage, synth_wav)
    specs = [(800, 8000, 1), (1, 44100, 2), (12345, 16000, 1)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": list(range(len(specs))),
        "payload": pa.array([synth_wav(f, r, c) for f, r, c in specs],
                            pa.binary())}))
    out = audio_decode_stage(ds, concurrency=1, strict=True).to_pandas() \
        .sort_values("doc_id")
    assert list(zip(out["n_frames"], out["sample_rate"],
                    out["n_channels"])) == specs
    assert list(out["duration_us"]) == [f * 1_000_000 // r
                                        for f, r, _ in specs]
    assert list(out["codec"].unique()) == ["PCM"]
    with pytest.raises(NotImplementedError):
        AudioDecoder(strict=True)(
            pa.table({"payload": pa.array([b"mp3???"], pa.binary())}))


def test_bmp_resize_real_nearest_neighbor(ray_session):
    """REAL resize: the output payload is a valid BMP at the target dims
    whose pixels are the nearest-neighbor gather of the source."""
    from cardinalhq_otel_collector_ray.stages.multimodal import synth_bmp
    src = synth_bmp(8, 4, seed=3)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0], "payload": pa.array([src], pa.binary())}))
    out = resize_stage(ds, 4, 2, concurrency=1, strict=True).to_pandas()
    resized = bytes(out.iloc[0]["payload"])
    # decodes as a real 4x2 BMP
    dec = ImageDecoder(strict=True)(
        pa.table({"payload": pa.array([resized], pa.binary())})).to_pandas()
    assert (dec.iloc[0]["width"], dec.iloc[0]["height"]) == (4, 2)
    # nearest-neighbor pixel check against a numpy reference
    import struct as _s
    def pixels(b, w, h):
        (off,) = _s.unpack_from("<I", b, 10)
        rb = (w * 3 + 3) & ~3
        return np.frombuffer(b, np.uint8, rb * h, off).reshape(h, rb)[:, :w*3]
    srcpix = pixels(src, 8, 4).reshape(4, 8, 3)
    want = srcpix[(np.arange(2) * 4) // 2][:, (np.arange(4) * 8) // 4]
    np.testing.assert_array_equal(
        pixels(resized, 4, 2).reshape(2, 4, 3), want)


def test_resize_stub_passthrough_and_dims(ray_session):
    out = resize_stage(_payload_ds(), 64, 48, concurrency=1).to_pandas() \
        .sort_values("doc_id")
    assert list(out["target_width"].unique()) == [64]
    assert list(out["target_height"].unique()) == [48]
    # payload untouched in stub mode (token/byte passthrough invariant)
    assert bytes(out.iloc[3]["payload"]) == b"hello world"
    with pytest.raises(NotImplementedError):
        ImageResizer(8, 8, strict=True)(
            pa.table({"payload": pa.array([b"not bmp"], pa.binary())}))


def test_frame_sample_deterministic(ray_session):
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(100))}))
    a = frame_sample_stage(ds, every_n=10).to_pandas()
    b = frame_sample_stage(ds, every_n=10).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 0 < len(a) < 100
