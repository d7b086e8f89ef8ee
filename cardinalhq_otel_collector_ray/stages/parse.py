"""PARSE stage — vectorized grok/regex field extraction.

The reference's parse vocabulary comes from filelogreceiver's regex/operator
chains and the transform processor's OTTL ``extract_patterns``
(``distribution/components.go:146,178``). Here a parse rule is
``(column, regex, output fields)`` compiled ONCE per actor and applied to
whole Arrow batches with RE2 C++ kernels (``pc.extract_regex`` /
``pc.match_substring_regex``) — both pyarrow and DuckDB use RE2, so oracle
SQL ``regexp_extract`` reproduces results exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


@dataclass(frozen=True)
class ParseRule:
    """Extract named groups of ``pattern`` from ``column`` into new columns.

    ``pattern`` must use named groups, e.g. ``(?P<level>ERROR|WARN)``.
    Rows that do not match get null in every extracted field (the
    filelog regex_parser's on-error=send semantics).
    """
    column: str
    pattern: str
    flags: str = ""


class RegexParser:
    """Actor-pool parse stage: patterns validated/compiled once per actor."""

    def __init__(self, rules: list[ParseRule]):
        import re
        self.rules = rules
        for r in rules:
            re.compile(r.pattern)  # fail fast on bad patterns

    def __call__(self, batch: pa.Table) -> pa.Table:
        for rule in self.rules:
            col = batch[rule.column]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            extracted = pc.extract_regex(col, pattern=rule.pattern)
            # extract_regex → StructArray with one field per named group,
            # null for non-matching rows.
            for f in extracted.type:
                batch = batch.append_column(f.name, pc.struct_field(extracted, f.name))
        return batch


def parse_stage(ds: ray.data.Dataset, rules: list[ParseRule],
                concurrency: int | None = None,
                batch_size: int | None = None) -> ray.data.Dataset:
    """Default: stateless tasks (RE2 patterns are compiled in C++ per call —
    cheap, and tasks never deadlock a small cluster the way stacked actor
    pools can). Pass ``concurrency`` to pin an actor pool instead (useful
    when a pattern bank is large enough that per-call validation matters).
    """
    if concurrency is None:
        parser = RegexParser(rules)
        return ds.map_batches(parser, batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(RegexParser, fn_constructor_args=(rules,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def flag_substring(ds: ray.data.Dataset, column: str, pattern: str,
                   out: str) -> ray.data.Dataset:
    """Boolean column = regex match anywhere in ``column`` (vectorized)."""
    def fn(batch: pa.Table) -> pa.Table:
        m = pc.match_substring_regex(batch[column], pattern=pattern)
        return batch.append_column(out, m)
    return ds.map_batches(fn, batch_format="pyarrow")
