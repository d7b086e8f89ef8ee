"""Parquet sources with pruning pushed to the read.

The reference's receivers accept pushed network batches
(``distribution/components.go:151-242``); our canonical source is Parquet
(BASELINE.json input_hint). Always pass ``columns=`` so only needed columns
leave storage; pass an Arrow dataset ``filter=`` expression for row-group
pruning.
"""

from __future__ import annotations

import ray.data

from .. import fsio

TARGET_BLOCK_BYTES = 16 << 20  # split reads into ~16 MiB blocks


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               filter=None, **kwargs) -> ray.data.Dataset:
    """``sf_dir`` may be a local dir or an object-store URI (``s3://…``) —
    size probing and the read itself go through the fsio layer."""
    path = fsio.join(sf_dir, f"{name}.parquet")
    if "override_num_blocks" not in kwargs:
        # Ray's default parallelism heuristic (≈2× CPUs) oversplits small
        # files into dozens of near-empty blocks; every downstream stage and
        # shuffle then pays per-task overhead ~15× the useful compute.
        # Split by actual bytes instead, with a floor of 8 blocks for
        # non-tiny files so downstream groupby/map_groups stages keep
        # shuffle parallelism. Large inputs: size ≫ TARGET_BLOCK_BYTES, so
        # the byte-based count dominates and matches Ray's own splitting.
        # The floor kicks in at 256 KiB COMPRESSED: parquet text compresses
        # ~4-5×, and per-doc kernels (minhash, shingling) carry seconds of
        # CPU per decompressed MB — a sub-MiB file can still be the
        # pipeline's dominant compute and must not collapse to one task.
        size = fsio.file_size(path)
        by_bytes = max(1, -(-size // TARGET_BLOCK_BYTES))
        kwargs["override_num_blocks"] = max(by_bytes, 8) if size >= (256 << 10) else by_bytes
    if "://" in path and not fsio.is_local(path):
        fs, internal = fsio.resolve_fs(path)
        return ray.data.read_parquet(internal, filesystem=fs, columns=columns,
                                     filter=filter, **kwargs)
    return ray.data.read_parquet(path, columns=columns, filter=filter, **kwargs)


def table_num_rows(sf_dir: str, name: str) -> int:
    """Exact row count from Parquet footer metadata — no data pages read.
    The cheap way to size hash-priority sample cutoffs without executing
    the pipeline an extra time."""
    import pyarrow.parquet as pq
    path = fsio.join(sf_dir, f"{name}.parquet")
    with fsio.open_input(path) as f:
        return pq.ParquetFile(f).metadata.num_rows
