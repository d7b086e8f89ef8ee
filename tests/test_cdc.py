import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.multimodal import (cdc_chunks,
                                                             chunk_dedup_ratio)


def _t(payloads):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(payloads)), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    }))


def test_cdc_shift_robust_and_deterministic(ray_session=None):
    rng = np.random.default_rng(4)
    base = rng.integers(0, 256, 20_000, dtype=np.uint8).tobytes()
    shifted = b"X" + base
    out = cdc_chunks(_t([base, shifted]), mask_bits=6).to_pandas()
    h0 = set(out.loc[0, "chunk_hashes"])
    h1 = set(out.loc[1, "chunk_hashes"])
    # insertion at the front only disturbs the first chunk(s): the vast
    # majority of chunk hashes survive — the CDC property fixed-size
    # blocking does not have
    assert len(h0 & h1) / len(h0) > 0.9
    # deterministic across re-runs and blockings
    out2 = cdc_chunks(_t([base, shifted]), mask_bits=6).to_pandas()
    assert out.loc[0, "chunk_hashes"].tolist() == out2.loc[0, "chunk_hashes"].tolist()
    # chunk lens cover the payload exactly
    assert out.loc[0, "chunk_lens"].sum() == len(base)
    assert out.loc[0, "n_chunks"] == len(out.loc[0, "chunk_lens"])


def test_cdc_duplicate_payloads_dedup_fully():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 8000, dtype=np.uint8).tobytes()
    r = chunk_dedup_ratio(_t([a, b, a, a]), mask_bits=5)
    assert r.loc[0, "total_bytes"] == 32_000
    # two distinct payloads => ~half the bytes distinct
    assert 0.4 < r.loc[0, "byte_dedup_ratio"] < 0.6
    r2 = chunk_dedup_ratio(_t([a, b]), mask_bits=5)
    assert r2.loc[0, "byte_dedup_ratio"] > 0.99


def test_cdc_empty_and_tiny_rows():
    out = cdc_chunks(_t([b"", b"ab", b"x" * 100])).to_pandas()
    assert out.loc[0, "n_chunks"] == 0
    assert out.loc[1, "n_chunks"] == 1
    assert out.loc[1, "chunk_lens"].tolist() == [2]
