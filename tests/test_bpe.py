"""BPE training vs the canonical naive algorithm (Sennrich et al. 2016
pseudocode transcribed with dict-of-symbol-tuples), plus the distributed
word-frequency pass vs Counter."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data

from cardinalhq_otel_collector_ray.stages.bpe import (bpe_train_merges,
                                                      word_frequencies)


def naive_bpe(word_freqs: dict, k: int):
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for r in range(k):
        stats: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] = \
                    stats.get((syms[i], syms[i + 1]), 0) + f
        if not stats:
            break
        top = max(stats.values())
        best = min(p for p, c in stats.items() if c == top)
        new_vocab: dict = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
        merges.append((r, best[0], best[1], best[0] + best[1], top))
    return merges


def _wf_table(freqs: dict) -> pa.Table:
    return pa.table({"word": pa.array(list(freqs)),
                     "freq": pa.array([freqs[w] for w in freqs], pa.int64())})


def test_bpe_matches_naive_on_classic_corpus():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = bpe_train_merges(_wf_table(freqs), k=10)
    want = naive_bpe(freqs, 10)
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_bpe_overlapping_runs_merge_leftmost_first():
    # 'aaaa' exercises the non-overlapping-run rule: 'aa' merges at 0 and 2
    freqs = {"aaaa": 3, "aaa": 2}
    got = bpe_train_merges(_wf_table(freqs), k=4)
    want = naive_bpe(freqs, 4)
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_bpe_fuzz_vs_naive():
    rng = np.random.default_rng(17)
    alphabet = list("abcd")
    for trial in range(6):
        n_words = int(rng.integers(3, 12))
        freqs = {}
        for _ in range(n_words):
            w = "".join(rng.choice(alphabet,
                                   size=int(rng.integers(1, 7))))
            freqs[w] = freqs.get(w, 0) + int(rng.integers(1, 9))
        got = bpe_train_merges(_wf_table(freqs), k=12)
        want = naive_bpe(freqs, 12)
        assert list(map(tuple, got.itertuples(index=False))) == want, freqs


def test_word_frequencies_distributed_matches_counter():
    texts = ["the cat sat", "the cat", "a mat", "", "the the the"]
    t = pa.table({"text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(3)
    wf = word_frequencies(ds, "text", num_partitions=4).to_pandas()
    want = Counter(w for s in texts for w in s.split(" ") if w)
    got = dict(zip(wf["word"], wf["freq"]))
    assert got == dict(want)


def _naive_encode_counts(texts, merges):
    """Word-by-word merge application (canonical apply loop)."""
    out = []
    for s in texts:
        n_sub = 0
        for w in s.split(" "):
            syms = [chr(b) for b in w.encode()] + ["</w>"]
            for _, left, right, _m, _c in merges:
                i, res = 0, []
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == left and \
                            syms[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                syms = res
            n_sub += len(syms)
        out.append(n_sub)
    return out


def test_bpe_encode_matches_naive():
    from cardinalhq_otel_collector_ray.stages.bpe import (bpe_encode_stats,
                                                          bpe_train_merges)
    texts = ["low low lower", "newest widest low", "aaaa aaa a",
             "the newest low", "widest widest"]
    freqs = Counter(w for s in texts for w in s.split(" "))
    merges_df = bpe_train_merges(_wf_table(dict(freqs)), k=8)
    merges = list(map(tuple, merges_df.itertuples(index=False)))
    t = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                  "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(2)
    got = (bpe_encode_stats(ds, merges_df, "text", "doc_id").to_pandas()
           .sort_values("doc_id"))
    want = _naive_encode_counts(texts, merges)
    assert got["n_subwords"].tolist() == want
    assert got["n_words"].tolist() == [len(s.split(" ")) for s in texts]
