"""sq_quantize_stats guarantee tests: codes bounded, reconstruction error
bounded by half a quantization step, constant dims exact, empty inputs
guarded."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cardinalhq_otel_collector_ray.stages.similarity import (sq_minmax,
                                                             sq_quantize_stats)


def _ds(mat: np.ndarray, parts=3):
    t = pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array(list(mat.astype(np.float32)),
                              type=pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(t).repartition(parts)


def test_error_bounded_by_half_step():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 8)).astype(np.float32)
    out = sq_quantize_stats(_ds(mat), "embedding", "vec_id").to_pandas()
    lo, hi = sq_minmax(_ds(mat), "embedding")
    half_step = ((hi - lo) / 256 / 2).max()
    assert (out["max_code"] <= 255).all() and (out["max_code"] >= 0).all()
    # mid-rise reconstruction error is at most half a step (+ rounding)
    assert (out["max_abs_err"] <= half_step + 1e-6).all()
    assert len(out) == 50


def test_constant_dim_quantizes_exactly():
    mat = np.ones((10, 4), dtype=np.float32) * 2.5
    out = sq_quantize_stats(_ds(mat), "embedding", "vec_id").to_pandas()
    assert (out["max_code"] == 0).all()
    assert (out["max_abs_err"] == 0.0).all()


def test_empty_block_survives_and_empty_dataset_raises():
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(6, 4)).astype(np.float32)
    ds = _ds(mat, parts=4)  # more partitions than needed -> empty blocks ok
    out = sq_quantize_stats(ds, "embedding", "vec_id").to_pandas()
    assert len(out) == 6
    empty = _ds(mat).filter(lambda r: False)
    with pytest.raises(ValueError, match="empty input"):
        sq_quantize_stats(empty, "embedding", "vec_id")
