"""Canonical tag-set fingerprinting.

The reference keys its interval aggregation state by the *full tag-set*
across resource/scope/datapoint attrs plus metadata, with ``section.``
prefixes (``processor/aggregationprocessor/aggregate.go:121-191``). In a
distributed engine the group key must be byte-identical no matter which
worker computes it, so canonicalization = sort by key, join ``k=v`` with
unit separators (SURVEY §7.4 "Tag-set fingerprinting").
"""

from __future__ import annotations

import numpy as np

from .hashing import stable_str_hash64

# Section prefixes used when re-splitting tags on emit (aggregate.go:121-147).
SECTION_RESOURCE = "resource."
SECTION_SCOPE = "instrumentation."
SECTION_METRIC = "metric."
SECTION_METADATA = "metadata."

_KV_SEP = "\x1f"  # unit separator — cannot appear in attr keys/values here
_PAIR_SEP = "\x1e"


def canonical_tagstring(tags: dict[str, str]) -> str:
    """Sorted ``k=v`` join — stable across workers and insertion orders."""
    return _PAIR_SEP.join(f"{k}{_KV_SEP}{v}" for k, v in sorted(tags.items()))


def split_sections(tags: dict[str, str]) -> dict[str, dict[str, str]]:
    """Re-split a canonical tag dict into sections by prefix — the emit-side
    inverse (aggregate.go:121-147: ``resource.`` / ``instrumentation.`` /
    ``metric.`` / ``metadata.``)."""
    out: dict[str, dict[str, str]] = {"resource": {}, "scope": {}, "datapoint": {}, "metadata": {}}
    for k, v in tags.items():
        if k.startswith(SECTION_RESOURCE):
            out["resource"][k[len(SECTION_RESOURCE):]] = v
        elif k.startswith(SECTION_SCOPE):
            out["scope"][k[len(SECTION_SCOPE):]] = v
        elif k.startswith(SECTION_METADATA):
            out["metadata"][k[len(SECTION_METADATA):]] = v
        elif k.startswith(SECTION_METRIC):
            out["datapoint"][k[len(SECTION_METRIC):]] = v
        else:
            out["datapoint"][k] = v
    return out


def tags_fingerprint(tagstrings) -> np.ndarray:
    """64-bit fingerprint of canonical tagstrings (internal group key)."""
    return stable_str_hash64(tagstrings)
