"""The flagship pipeline: parse → enrich → route → aggregate → sinks.

Reproduces the reference's documented deployment DAG
(``docs/flow/flow.dot:15-292``): intake → decorate (parse/fingerprint) →
fan-out via forward connectors → per-sink enforce (drop/sample) → export,
re-expressed as ONE lazy Ray Data streaming pipeline over the mandated
token-table shape (doc_id, tokens:list<int32>, n_tok, source).

Per-row invariant (north rule): ``tokens`` flows through parse / enrich /
route byte-identical — zero-copy Arrow ListArray, never materialized to
Python lists (asserted in tests/test_pipeline.py).

Every routing / enrichment decision is a pure function of the data
(no wall clock, no randomness), so per-sink routed-row counts and per-sink
aggregate counts are exactly reproducible and oracle-checkable in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.tokenized import build_vocab
from ..stages.aggregate import grouped_aggregate
from ..stages.enrich import enrich_stage
from ..stages.parse import ParseRule, flag_substring, parse_stage
from ..stages.route import RouteRule, Router, sample_rule
from ..sinks.partitioned import PartitionedSink

# Route sinks, first-match-wins (flow.dot fan-out analog):
#   quarantine — enrichment says the source is invalid (chqauth deny path)
#   errors     — parse flagged the record (enforcement pipeline analog)
#   sampled    — deterministic 10% hash-mod of the remainder
#   main       — everything else
SAMPLE_PERCENT = 10
SAMPLE_SALT = 12345


def build_enrichment_table(sources: list[str]) -> dict[str, dict]:
    """source → tenant attrs (chqauth analog, serverauth.go:132-136).

    Deterministic rule so the SQL oracle can reproduce it:
    src_num = int(source[3:]); valid ⇔ src_num % 10 != 7;
    customer_id = 'cust-' + src_num.
    """
    out = {}
    for s in sources:
        num = int(s[3:])
        out[s] = {"customer_id": f"cust-{num}", "valid": num % 10 != 7}
    return out


def routed_from_docs(docs: ray.data.Dataset, vocab: dict,
                     sources: list[str]) -> ray.data.Dataset:
    """tokenize → parse → enrich → route over a documents Dataset
    (columns doc_id, text, source). Returns the routed record stream with
    columns (doc_id, tokens, n_tok, source, head_word, has_slow,
    customer_id, valid, route)."""
    import ray as _ray
    from ..sources.tokenized import Tokenizer
    vocab_ref = _ray.put(vocab)
    # stateless tokenizer tasks: elastic, no fixed pool to size per cluster
    ds = docs.map_batches(Tokenizer(vocab_ref, keep_text=True),
                          batch_format="pyarrow", batch_size=None)
    # PARSE — RE2 kernels; identical regex semantics to DuckDB regexp_*.
    # Stateless tasks (no pool): only the tokenizer holds real per-actor
    # state, so stacking three actor pools would just reserve CPUs.
    ds = parse_stage(ds, [ParseRule("text", r"^(?P<head_word>\w+)")])
    ds = flag_substring(ds, "text", r"\bslow\b", "has_slow")

    # ENRICH — broadcast dictionary over the (small) distinct source set
    table = build_enrichment_table(sources)
    ds = enrich_stage(ds, table, "source")

    # ROUTE — first-match-wins predicate fan-out (Arrow kernels, no row loops)
    def invalid_pred(batch: pa.Table) -> np.ndarray:
        v = batch["valid"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.fill_null(v.cast(pa.bool_()), False)
        return pc.invert(ok).to_numpy(zero_copy_only=False)

    def error_pred(batch: pa.Table) -> np.ndarray:
        # "level=ERROR" analog: the record's head token is the error marker
        m = pc.fill_null(pc.equal(batch["head_word"], "slow"), False)
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        return m.to_numpy(zero_copy_only=False)

    def id_as_int(batch: pa.Table) -> pa.Table:
        return batch.append_column("_docnum", batch["doc_id"].cast(pa.int64()))

    ds = ds.map_batches(id_as_int, batch_format="pyarrow")
    rules = [
        RouteRule("quarantine", invalid_pred),
        RouteRule("errors", error_pred),
        sample_rule("sampled", "_docnum", SAMPLE_PERCENT, salt=SAMPLE_SALT),
    ]
    ds = ds.map_batches(Router(rules, default_sink="main"), batch_format="pyarrow")
    return ds.drop_columns(["text", "_docnum"])


def routed_documents(sf_dir: str, vocab: dict | None = None) -> ray.data.Dataset:
    """Flagship routed stream read from ``sf_dir``. The distinct source set
    comes from a dedicated single-column read (prune at the read), not by
    executing the full upstream pipeline twice."""
    from ..sources.parquet import read_table
    if vocab is None:
        vocab = build_vocab(sf_dir)
    sources = sorted(set(read_table(sf_dir, "documents", columns=["source"])
                         .unique("source")))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "source"])
    return routed_from_docs(docs, vocab, sources)


def sink_counts(routed: ray.data.Dataset) -> ray.data.Dataset:
    """Per-sink routed-row counts + token counts (the conformance target:
    'per-sink routed-row counts must match exactly')."""
    agg = grouped_aggregate(routed, keys=["route"], value_col="n_tok", mode="driver")
    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "route": batch["route"],
            "n_rows": batch["agg_count"].cast(pa.int64()),
            "sum_tokens": batch["agg_sum"].cast(pa.int64()),
        })
    return agg.map_batches(finalize, batch_format="pyarrow")


def aggregate_by_source(routed: ray.data.Dataset) -> ray.data.Dataset:
    """Per-(sink, source) aggregate counts — the 'per-sink aggregate
    counts' conformance target; two-phase pre-combine + groupby."""
    agg = grouped_aggregate(routed, keys=["route", "source"], value_col="n_tok", mode="driver")
    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "route": batch["route"],
            "source": batch["source"],
            "n_rows": batch["agg_count"].cast(pa.int64()),
            "sum_tokens": batch["agg_sum"].cast(pa.int64()),
        })
    return agg.map_batches(finalize, batch_format="pyarrow")


def run_to_sinks(sf_dir: str, out_root: str, run_ts: float = 1706078400.0,
                 num_partitions: int = 16, resume: bool = True):
    """Full flagship run: routed stream → partitioned per-sink Parquet with
    lineage manifest (run_ts fixed for deterministic partition dirs;
    default = 2024-01-24T06:40Z, the reference's partition_test golden
    timestamp, partition_test.go:14-130)."""
    routed = routed_documents(sf_dir)
    sink = PartitionedSink(out_root, run_ts, num_partitions=num_partitions)
    entries = sink.write(routed, key_col="doc_id", route_col="route",
                         tokens_len_col="n_tok", resume=resume)
    return sink, entries
