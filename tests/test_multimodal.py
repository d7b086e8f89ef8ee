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


def test_decode_strict_raises_without_codec():
    with pytest.raises(NotImplementedError):
        ImageDecoder(strict=True)


def test_resize_stub_passthrough_and_dims(ray_session):
    out = resize_stage(_payload_ds(), 64, 48, concurrency=1).to_pandas() \
        .sort_values("doc_id")
    assert list(out["target_width"].unique()) == [64]
    assert list(out["target_height"].unique()) == [48]
    # payload untouched in stub mode (token/byte passthrough invariant)
    assert bytes(out.iloc[3]["payload"]) == b"hello world"
    with pytest.raises(NotImplementedError):
        ImageResizer(8, 8, strict=True)


def test_frame_sample_deterministic(ray_session):
    ds = ray.data.from_arrow(pa.table({"doc_id": list(range(100))}))
    a = frame_sample_stage(ds, every_n=10).to_pandas()
    b = frame_sample_stage(ds, every_n=10).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert 0 < len(a) < 100
