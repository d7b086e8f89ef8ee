"""Empty-block smoke grid: every token/text-consuming operator must
survive a corpus where a degenerate doc (zero tokens / empty text) sits
ALONE in its own block — the failure class behind the round-5
`frequent_ngrams` bug, where the short-block early return emitted a
different partial schema than the main branch and broke the merge.

Each case runs the operator over a 3-block dataset: [normal docs],
[empty doc], [short doc], and asserts completion + row-count sanity.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


def _token_ds():
    tables = [
        pa.table({"doc_id": pa.array(["a", "b"]),
                  "source": pa.array(["src1", "src2"]),
                  "tokens": pa.array([[1, 2, 3, 1, 2, 3], [2, 3, 4]],
                                     type=pa.list_(pa.int32()))}),
        pa.table({"doc_id": pa.array(["empty"]),
                  "source": pa.array(["src1"]),
                  "tokens": pa.array([[]], type=pa.list_(pa.int32()))}),
        pa.table({"doc_id": pa.array(["short"]),
                  "source": pa.array(["src2"]),
                  "tokens": pa.array([[5]], type=pa.list_(pa.int32()))}),
    ]
    return ray.data.from_arrow(tables)  # one block per table


def _text_ds():
    tables = [
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["the quick brown fox jumps over",
                                    "pack my box with five dozen jugs"])}),
        pa.table({"doc_id": pa.array([3], pa.int64()),
                  "text": pa.array([""])}),
        pa.table({"doc_id": pa.array([4], pa.int64()),
                  "text": pa.array(["hi"])}),
    ]
    return ray.data.from_arrow(tables)


def test_ngram_family_survives_isolated_empty_block():
    from cardinalhq_otel_collector_ray.stages.relevance import (
        dup_ngram_fraction, flag_boilerplate, frequent_ngrams,
        remove_dup_spans)
    ds = _token_ds()
    hot = frequent_ngrams(ds, n=3, min_count=2, vocab_size=8)
    assert len(hot) >= 1                      # (1,2,3) repeats in doc a
    out = dup_ngram_fraction(ds, hot, n=3, vocab_size=8).to_pandas()
    assert set(out["doc_id"]) <= {"a", "b", "empty", "short"}
    out = remove_dup_spans(ds, hot, n=3, vocab_size=8).to_pandas()
    assert len(out) == 4                      # removal keeps every doc row
    assert out.set_index("doc_id").loc["empty", "n_tok"] == 0
    out = flag_boilerplate(ds, hot, n=3, vocab_size=8).to_pandas()
    assert len(out) == 4


def test_corpus_model_family_survives_isolated_empty_block():
    from cardinalhq_otel_collector_ray.stages.relevance import (
        bigram_counts, bigram_logprob, corpus_stats, dsir_weights,
        inverted_index)
    ds = _token_ds()
    stats = corpus_stats(ds)
    assert stats.num_rows >= 4                # tokens 1..5 observed
    bi = bigram_counts(ds)
    tok = stats["token"].to_numpy(zero_copy_only=False)
    uni = np.zeros(int(tok.max()) + 1, dtype=np.int64)
    uni[tok] = stats["freq"].to_numpy(zero_copy_only=False)
    out = bigram_logprob(ds, bi, uni, vocab_size=8).to_pandas()
    assert set(out["doc_id"]) == {"a", "b"}   # <2-token docs dropped

    # inverted_index / dsir take INT doc ids (documented input contract)
    def add_int_id(b: pa.Table) -> pa.Table:
        ids = {"a": 0, "b": 1, "empty": 2, "short": 3}
        return b.set_column(
            b.column_names.index("doc_id"), "doc_id",
            pa.array([ids[x] for x in b["doc_id"].to_pylist()], pa.int64()))
    int_ds = _token_ds().map_batches(add_int_id, batch_format="pyarrow")
    out = inverted_index(int_ds, num_partitions=3).to_pandas()
    assert 5 in set(out["token"])             # short doc's token indexed
    out = dsir_weights(int_ds, vocab_size=8).to_pandas()
    assert len(out) >= 1                      # only multi-token docs score


def test_textstats_family_survives_isolated_empty_text_block():
    from cardinalhq_otel_collector_ray.stages.textstats import (
        compression_ratio, intradoc_repetition, langid_scores,
        quality_stats, winnow_fingerprints)
    ds = _text_ds()
    assert len(quality_stats(ds).to_pandas()) == 4
    assert len(langid_scores(ds).to_pandas()) == 4
    assert len(compression_ratio(ds).to_pandas()) == 4
    out = intradoc_repetition(_token_ds()).to_pandas()
    assert len(out) <= 4                      # short/empty docs may drop
    out = winnow_fingerprints(ds).to_pandas()
    assert set(out["id"]) <= {1, 2, 3, 4}     # winnow emits (id, fp) rows


def test_dedup_family_survives_isolated_empty_text_block():
    from cardinalhq_otel_collector_ray.stages.dedup import (
        exact_dedup, minhash_lsh_pairs, simhash_pairs)
    ds = _text_ds()
    kept = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert len(kept) == 4                     # all distinct, empty included
    # pair finders must not crash on sub-shingle-length docs
    minhash_lsh_pairs(ds, "text", "doc_id", k_shingle=5,
                      concurrency=2).to_pandas()
    simhash_pairs(ds, "text", "doc_id").to_pandas()


def test_chunk_and_entropy_survive_isolated_empty_block():
    from cardinalhq_otel_collector_ray.stages.packing import chunk_tokens
    from cardinalhq_otel_collector_ray.stages.textstats import token_entropy
    ds = _token_ds()
    out = chunk_tokens(ds, size=4, stride=2).to_pandas()
    # empty doc still yields exactly one (empty) chunk row per contract
    assert (out[out["doc_id"] == "empty"]["n_tok_chunk"] == 0).all()
    out = token_entropy(ds).to_pandas()
    assert "empty" not in set(out["doc_id"])  # empty doc dropped


def test_bpe_and_drain_survive_isolated_empty_text_block():
    from cardinalhq_otel_collector_ray.stages.bpe import (bpe_encode_stats,
                                                          bpe_merges,
                                                          word_frequencies)
    from cardinalhq_otel_collector_ray.stages.drain import drain_templates
    ds = _text_ds()
    wf = word_frequencies(ds)
    assert wf.num_rows >= 5
    merges = bpe_merges(ds, k=2)
    out = bpe_encode_stats(ds, merges).to_pandas()
    assert len(out) >= 2                      # non-empty docs encoded
    out = drain_templates(ds, "text", "doc_id").to_pandas()
    assert len(out) >= 2


def test_multimodal_survives_isolated_empty_payload_block():
    from cardinalhq_otel_collector_ray.stages.multimodal import (
        byte_histogram_features, cdc_chunks, decode_stage)
    tables = [
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array([b"\x01\x02\x03" * 50, b"\xff" * 10],
                                      pa.binary())}),
        pa.table({"doc_id": pa.array([3], pa.int64()),
                  "payload": pa.array([b""], pa.binary())}),
    ]
    ds = ray.data.from_arrow(tables)
    out = byte_histogram_features(ds).to_pandas()
    assert len(out) == 3                      # empty payload still featured
    out = cdc_chunks(ds).to_pandas()
    assert set(out["doc_id"]) <= {1, 2, 3}
    # non-strict decode routes undecodable payloads to the fake path
    out = decode_stage(ds, concurrency=2).to_pandas()
    assert len(out) == 3


def test_bpe_handles_non_ascii_corpus():
    """Byte-level BPE (GPT-2 base alphabet): training and encode agree on
    a non-ASCII corpus — previously training was char-level and encode
    byte-level, so any merge containing a codepoint > 255 KeyError'd the
    encode plan."""
    from cardinalhq_otel_collector_ray.stages.bpe import (bpe_encode_stats,
                                                          bpe_merges)
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["привет мир привет",
                                    "日本語 の テキスト 日本語",
                                    "héllo wörld héllo"])})
    ds = ray.data.from_arrow(t)
    merges = bpe_merges(ds, k=4)
    assert len(merges) == 4                   # repeated words → real merges
    out = (bpe_encode_stats(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 3
    # merges never grow the byte+boundary symbol stream, and the learned
    # merges shrink at least the docs they came from
    raw_syms = [sum(len(w.encode()) + 1 for w in s.split())
                for s in t["text"].to_pylist()]
    assert (out["n_subwords"].to_numpy() <= np.array(raw_syms)).all()
    assert (out["n_subwords"].to_numpy() < np.array(raw_syms)).any()
    assert (out["n_subwords"] >= out["n_words"]).all()


def test_text_family_handles_non_ascii():
    """Unicode robustness: the text-consuming surface (splitter, quality,
    langid, winnow, dedup pair finders, drain, PII redaction) accepts
    multi-byte scripts and emoji without error; redaction edits only the
    matched ASCII-pattern spans."""
    from cardinalhq_otel_collector_ray.functions.text import split_words
    from cardinalhq_otel_collector_ray.stages.dedup import (exact_dedup,
                                                            simhash_pairs)
    from cardinalhq_otel_collector_ray.stages.drain import drain_templates
    from cardinalhq_otel_collector_ray.stages.textstats import (
        langid_scores, quality_stats, winnow_fingerprints)
    from cardinalhq_otel_collector_ray.stages.transform import redact_pii
    texts = ["héllo wörld 🎉 日本語のテキスト user@example.com",
             "обычный русский текст с цифрами 123",
             "中文 words with 555-123-4567"]
    w = split_words(pa.array(texts))
    assert w.to_pylist()[0][3] == "日本語のテキスト"  # codepoints intact
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t)
    assert len(quality_stats(ds).to_pandas()) == 3
    assert len(langid_scores(ds).to_pandas()) == 3
    winnow_fingerprints(ds).to_pandas()
    assert len(exact_dedup(ds, "text", "doc_id").to_pandas()) == 3
    simhash_pairs(ds, "text", "doc_id").to_pandas()
    assert len(drain_templates(ds, "text", "doc_id").to_pandas()) == 3
    red = (redact_pii(ds, "text").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert "<EMAIL>" in red.loc[0, "text"]
    assert "日本語のテキスト" in red.loc[0, "text"]   # unicode untouched
    assert "<PHONE>" in red.loc[2, "text"]
    assert "中文" in red.loc[2, "text"]


def test_lineclean_family_survives_isolated_empty_block():
    """Grid extension for the line-granular family (CLAUDE.md round-5
    convention): empty / short / unicode text isolated in its own block
    through rewrap, both C4 forms, both paragraph-dedup forms, and
    normalization."""
    from cardinalhq_otel_collector_ray.stages.lineclean import (
        c4_line_clean, c4_line_clean_apply, paragraph_dedup_apply,
        paragraph_dedup_stats, rewrap_lines)
    from cardinalhq_otel_collector_ray.stages.transform import \
        normalize_text

    def ds():
        tables = [
            pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["a b c d\na b c d\nx y z w",
                                        "p q r s\nt u v w"])}),
            pa.table({"doc_id": pa.array([3], pa.int64()),
                      "text": pa.array([""])}),
            pa.table({"doc_id": pa.array([4], pa.int64()),
                      "text": pa.array(["héllo 🎉 日本語"])}),
        ]
        return ray.data.from_arrow(tables)

    assert rewrap_lines(ds()).count() == 4
    stats = c4_line_clean(ds(), min_words=4, min_lines=1).to_pandas()
    assert set(stats["doc_id"]) == {1, 2}     # dup line in 1 collapses
    assert stats.set_index("doc_id").loc[1, "kept_lines"] == 2
    applied = c4_line_clean_apply(ds(), min_words=4,
                                  min_lines=1).to_pandas()
    assert set(applied["doc_id"]) == {1, 2}
    pstats = paragraph_dedup_stats(ds()).to_pandas()
    assert set(pstats["doc_id"]) == {1, 2, 3, 4}
    papply = paragraph_dedup_apply(ds()).to_pandas()
    assert set(papply["doc_id"]) == {1, 2, 3, 4}
    norm = (normalize_text(ds()).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert norm.loc[2, "text"] == ""
    assert norm.loc[3, "text"] == "hello 🎉 日本語"
