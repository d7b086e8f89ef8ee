"""Parquet sources with pruning pushed to the read.

The reference's receivers accept pushed network batches
(``distribution/components.go:151-242``); our canonical source is Parquet
(BASELINE.json input_hint). Always pass ``columns=`` so only needed columns
leave storage; pass an Arrow dataset ``filter=`` expression for row-group
pruning.
"""

from __future__ import annotations

import os

import ray.data


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               filter=None, **kwargs) -> ray.data.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns, filter=filter, **kwargs)
