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


def test_composed_training_prep_planted_corpus(ray_session, tmp_path):
    """The ONE-job composed pipeline (pipelines/training_prep.py) on a
    corpus with PLANTED exact dups, near dups and junk docs: exact counts
    for each decision stage, conservation into the sorted sinks, resume
    idempotence, and per-stage metrics emitted."""
    from cardinalhq_otel_collector_ray.pipelines.training_prep import (
        training_prep)

    rows = []
    for i in range(40):  # distinct 12-word docs (disjoint vocabularies)
        words = [f"w{i}x{j}" for j in range(12)]
        rows.append((i, " ".join(words), f"src{i % 3}"))
    for i in range(10):  # exact duplicates of docs 0..9 (higher ids lose)
        rows.append((100 + i, rows[i][1], f"src{i % 3}"))
    for i in range(10, 20):  # near-dups: doc i minus its last word
        rows.append((200 + i, rows[i][1].rsplit(" ", 1)[0], f"src{i % 3}"))
    for i in range(5):  # junk: single-word docs fail the quality gate
        rows.append((300 + i, "x", f"src{i % 3}"))

    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows]),
                  "source": pa.array([r[2] for r in rows])})
    docs = ray.data.from_arrow(t).repartition(4)

    sink = PartitionedSink(str(tmp_path / "prep"), run_ts=1706078400.0,
                           num_partitions=2)
    out = training_prep(
        docs, sink, context_len=50, num_partitions=8,
        neardup_opts=dict(k_shingle=6, threshold=0.5, num_perm=64,
                          bands=16))
    # 10 planted copies + 4 of the 5 identical junk docs dedup away
    assert out["n_exact_dropped"] == 14
    assert out["n_near_dropped"] == 10
    # survivors: the 40 base docs (dups/near-dups lose by id, junk gated)
    assert sum(e.rows for e in out["entries"]) == 40
    assert {e.sink for e in out["entries"]} <= {"train", "val", "test"}
    # packing invariant survives the write; files are doc_id-sorted
    for e in out["entries"]:
        f = pq.read_table(e.path)
        assert (f["bin_offset"].to_numpy() < 50).all()
        assert (np.diff(f["doc_id"].to_numpy()) >= 0).all()
    # per-stage metrics landed next to the manifest (north rule)
    assert out["stats"] and any("MapBatches" in s["operator"]
                                for s in out["stats"])
    # resume: identical rerun writes nothing
    again = training_prep(
        docs, sink, context_len=50, num_partitions=8,
        neardup_opts=dict(k_shingle=6, threshold=0.5, num_perm=64,
                          bands=16))
    assert again["entries"] == []


def test_composed_training_prep_shuffled_packing(ray_session, tmp_path):
    """shuffle=True packs per SHARD in deterministic shuffled order: same
    survivor set as the unshuffled job, bin layout matches a naive local
    recompute of the (shard, pos) packing, and reruns are idempotent."""
    from cardinalhq_otel_collector_ray.functions.hashing import mulhash
    from cardinalhq_otel_collector_ray.pipelines.training_prep import (
        training_prep)

    rows = [(i, " ".join(f"w{i}x{j}" for j in range(12)), f"src{i % 3}")
            for i in range(40)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows]),
                  "source": pa.array([r[2] for r in rows])})
    docs = ray.data.from_arrow(t).repartition(4)

    sink = PartitionedSink(str(tmp_path / "prep_shuf"), run_ts=1706078400.0,
                           num_partitions=2)
    out = training_prep(docs, sink, context_len=50, num_partitions=8,
                        neardup=False, shuffle=True, shuffle_shards_n=4)
    assert sum(e.rows for e in out["entries"]) == 40

    written = pa.concat_tables([pq.read_table(e.path)
                                for e in out["entries"]]).to_pandas()
    # naive local recompute: every doc has n_chars = len(text), shard =
    # hash(id) % 4, pos = rank by (h2, id) in shard; bins pack per shard
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    n_chars = np.array([len(r[1]) for r in rows], dtype=np.int64)
    ref = pd.DataFrame({"doc_id": ids, "n_chars": n_chars,
                        "shard": mulhash(ids, mod=4),
                        "h2": mulhash(ids + np.int64(777))})
    ref = ref.sort_values(["shard", "h2", "doc_id"]).reset_index(drop=True)
    excl = (ref.groupby("shard")["n_chars"].cumsum() - ref["n_chars"])
    ref["bin_id"], ref["bin_offset"] = excl // 50, excl % 50
    m = written.merge(ref, on="doc_id", suffixes=("", "_ref"))
    assert len(m) == 40
    assert (m["shard"] == m["shard_ref"]).all()
    assert (m["bin_id"] == m["bin_id_ref"]).all()
    assert (m["bin_offset"] == m["bin_offset_ref"]).all()
    # the shuffled layout is NOT the id-ordered one (some doc starts moved)
    base = training_prep(docs,
                         PartitionedSink(str(tmp_path / "prep_base"),
                                         run_ts=1706078400.0,
                                         num_partitions=2),
                         context_len=50, num_partitions=8, neardup=False)
    plain = pa.concat_tables([pq.read_table(e.path)
                              for e in base["entries"]]).to_pandas()
    j = written.merge(plain, on="doc_id", suffixes=("_s", "_p"))
    assert ((j["bin_id_s"] != j["bin_id_p"])
            | (j["bin_offset_s"] != j["bin_offset_p"])).any()
    # resume: identical shuffled rerun writes nothing
    again = training_prep(docs, sink, context_len=50, num_partitions=8,
                          neardup=False, shuffle=True, shuffle_shards_n=4)
    assert again["entries"] == []


def test_resume_after_midrun_failure_skips_recorded_partitions(
        ray_session, tmp_path):
    """Kill-resume contract at the manifest level: a run that DIES mid
    write has durably recorded every partition that finished (streaming
    manifest records); the rerun writes only the missing partitions and
    the final layout equals a clean run's."""
    import time as _time

    from cardinalhq_otel_collector_ray.sinks.serializers import (
        register_marshaler, unregister_marshaler)

    flag = tmp_path / "second_run"
    ids = np.arange(64, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids),
                  "route": pa.array(["main"] * 64),
                  "n": pa.array(ids * 2)})

    # fail partition pid==1 on the FIRST run only — and SLOWLY, so the
    # other partitions' writes finish (and record) before the abort
    from cardinalhq_otel_collector_ray.functions.hashing import mulhash
    flag_path = str(flag)

    def failing_jsonl(batch, **kw):
        pids = set(mulhash(batch["doc_id"].to_numpy(), mod=4).tolist())
        import json as _json
        import os as _os
        if 1 in pids and not _os.path.exists(flag_path):
            _time.sleep(1.5)
            raise RuntimeError("injected mid-run death")
        return ("\n".join(_json.dumps(r) for r in batch.to_pylist())
                + "\n").encode()

    register_marshaler("failing_jsonl", failing_jsonl, "jsonl")
    try:
        sink = PartitionedSink(str(tmp_path / "out"), run_ts=1706078400.0,
                               num_partitions=4, fmt="failing_jsonl")
        ds = ray.data.from_arrow(t).repartition(4)
        import pytest
        with pytest.raises(Exception):
            sink.write(ds, key_col="doc_id", resume=True)
        recorded = set(sink.manifest.completed())
        assert recorded, "finished partitions must be recorded before death"
        assert "main/1" not in recorded

        flag.write_text("go")
        entries2 = sink.write(ds, key_col="doc_id", resume=True)
        # only the missing partitions were rewritten
        assert {e.partition_id for e in entries2} == \
            {f"main/{p}" for p in range(4)} - recorded
        done = sink.manifest.completed()
        assert set(done) == {f"main/{p}" for p in range(4)}
        assert sum(e.rows for e in done.values()) == 64
    finally:
        unregister_marshaler("failing_jsonl")
