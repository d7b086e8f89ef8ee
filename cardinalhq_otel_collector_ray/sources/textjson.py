"""Line-oriented sources: JSONL and plain-text logs.

The reference ingests files via filelogreceiver with regex/JSON operator
chains (``distribution/components.go:178``). Ray-Data-native shape:
``read_text`` / ``read_json`` produce a Dataset whose parse chain is the
same vectorized `stages.parse` used for every other source — the source
only determines how lines become rows.
"""

from __future__ import annotations

import ray.data


def read_jsonl(paths, **kwargs) -> ray.data.Dataset:
    """JSON-lines files → one row per object (columnar from the read)."""
    return ray.data.read_json(paths, **kwargs)


def read_text_lines(paths, **kwargs) -> ray.data.Dataset:
    """Plain-text files → one row per line, column ``text`` — feed into
    ``stages.parse.parse_stage`` for the regex/grok field extraction."""
    return ray.data.read_text(paths, **kwargs)


def read_csv(paths, **kwargs) -> ray.data.Dataset:
    """Delimited files → columnar rows (Arrow CSV reader under the Ray
    Data source — schema inferred or passed via ``convert_options``).
    Rounds out the file-source vocabulary next to parquet/jsonl/text;
    downstream chains are identical."""
    return ray.data.read_csv(paths, **kwargs)
