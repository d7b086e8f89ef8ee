"""End-to-end training-data preparation path: tokenize → exact dedup →
entropy quality gate → deterministic split → concat-and-chunk packing →
range-partitioned SORTED sink per split, with lineage manifest + resume.

Asserts the conservation chain (every kept doc lands in exactly one
split's sink), layout invariants (sorted disjoint ranges per file) and
idempotent resume — the training-side twin of the telemetry topology
test."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from cardinalhq_otel_collector_ray.sinks.partitioned import PartitionedSink
from cardinalhq_otel_collector_ray.sources import tokenized_documents
from cardinalhq_otel_collector_ray.stages.join import semi_join
from cardinalhq_otel_collector_ray.stages.packing import (dataset_split,
                                                          pack_sequences)
from cardinalhq_otel_collector_ray.stages.textstats import token_entropy


def _prep(sf_dir: str):
    ds = tokenized_documents(sf_dir)

    def as_int(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("doc_id"), "doc_id",
            batch["doc_id"].cast(pa.int64()))

    return ds.map_batches(as_int, batch_format="pyarrow")


def test_training_prep_end_to_end(sf_dir, tmp_path):
    ds = _prep(sf_dir)
    total = ds.count()

    # quality gate: drop zero-entropy (single-token / empty) docs
    ent = token_entropy(ds).to_pandas()
    keep_ids = ent.loc[ent["entropy"] > 0.0, "doc_id"].to_numpy(np.int64)
    gated = semi_join(ds, keep_ids, "doc_id")

    # deterministic split + packing per (source) stream
    routed = dataset_split(gated, "doc_id", out="route")
    packed = pack_sequences(routed, key="source", order_col="doc_id",
                            len_col="n_tok", context_len=512,
                            num_partitions=4)

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_id", "n_tok", "route", "bin_id", "bin_offset"]]

    out = ray.data.from_pandas(
        packed.map_batches(clean, batch_format="pandas").to_pandas())

    sink = PartitionedSink(str(tmp_path / "prep"), run_ts=1706078400.0,
                           num_partitions=4)
    entries = sink.write_sorted(out, sort_col="doc_id", route_col="route",
                                tokens_len_col="n_tok")

    # conservation: every gated doc in exactly one split sink
    assert sum(e.rows for e in entries) == len(keep_ids) <= total
    sinks = {e.sink for e in entries}
    assert sinks <= {"train", "val", "test"}

    # sorted-range layout per sink: disjoint, ordered, in-file sorted
    for s in sinks:
        by_pid = sorted((e for e in entries if e.sink == s),
                        key=lambda e: int(e.partition_id.rsplit("/", 1)[1]))
        prev = -1
        for e in by_pid:
            vals = pq.read_table(e.path)["doc_id"].to_numpy()
            assert (np.diff(vals) >= 0).all()
            assert vals[0] > prev
            prev = vals[-1]

    # packing invariant survives the write
    any_file = pq.read_table(entries[0].path).to_pandas()
    assert (any_file["bin_offset"] < 512).all()

    # resume: identical rerun writes nothing
    assert sink.write_sorted(out, sort_col="doc_id", route_col="route",
                             tokens_len_col="n_tok") == []


def test_chunk_tokens_reconstructs_and_counts():
    """Non-overlapping windows (stride == size) concatenate back to the
    doc; overlapping windows obey the count/boundary arithmetic; short
    docs yield exactly one chunk."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from cardinalhq_otel_collector_ray.stages.packing import chunk_tokens

    rng = np.random.default_rng(9)
    docs = [list(rng.integers(0, 100, n)) for n in [1, 5, 32, 33, 100]]
    t = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "tokens": pa.array(docs, type=pa.list_(pa.int32())),
    })
    ds = ray.data.from_arrow(t).repartition(2)

    flat = chunk_tokens(ds, size=32, stride=32, emit_tokens=True) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    for did, doc in enumerate(docs):
        parts = flat[flat["doc_id"] == did]["tokens"]
        recon = [x for chunk in parts for x in chunk]
        assert recon == doc                     # stride==size: exact cover

    over = chunk_tokens(ds, size=32, stride=16).to_pandas()
    for did, doc in enumerate(docs):
        n = len(doc)
        k = 1 if n <= 32 else 1 + -(-(n - 32) // 16)
        sub = over[over["doc_id"] == did]
        assert len(sub) == k
        assert (sub["n_tok_chunk"] == np.minimum(
            32, n - sub["start_tok"])).all()
        assert (sub["n_tok_chunk"] > 0).all()
