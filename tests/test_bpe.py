"""BPE tokenizer training: exact-replay equality against a reference
driver-side implementation, on the testdata corpus and on random
corpora (hypothesis)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_local_data_pipeline_docker_spark.llmops import bpe as B

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al.): overlapping pair counts, argmax by
    (count desc, pair asc), left-to-right non-overlapping application."""
    vocab = {w: [c for c in w] for w in word_freqs}
    merges = []
    for step in range(1, n_merges + 1):
        counts = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


@pytest.mark.slow
def test_bpe_matches_reference_on_testdata(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    freqs = Counter(
        w for d in docs for w in d.text.split(" ") if w
    )
    want_merges, want_vocab = _reference_bpe(dict(freqs), B.N_MERGES)
    got = [
        (r.step, r.left, r.right, r.pair_count)
        for r in B.bpe_train_merges(spark, SF).collect()
    ]
    assert got == want_merges
    # contract invariants hold and the numbers pin to the corpus
    row = B.bpe_train_contract(spark, SF).collect()[0]
    assert row.n_distinct_words == len(freqs)
    assert row.total_freq == sum(freqs.values())
    assert row.n_merges == len(want_merges) == B.N_MERGES
    assert row.counts_nonincreasing and row.counts_positive and row.compresses


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(1, 50),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 5),
)
@pytest.mark.slow
def test_bpe_matches_reference_on_random_corpora(spark, freqs, n_merges):
    """ANY word-frequency table, ANY merge budget: the distributed loop
    equals the textbook implementation merge-for-merge, including early
    stop when no adjacent pair remains."""
    words = spark.createDataFrame(
        list(freqs.items()), "word STRING, freq BIGINT"
    )
    got_merges, got_vocab_df = B.train_bpe(words, n_merges)
    want_merges, want_vocab = _reference_bpe(freqs, n_merges)
    got_vocab = {r.word: list(r.syms) for r in got_vocab_df.collect()}
    got_vocab_df.unpersist()
    assert got_merges == want_merges
    assert got_vocab == want_vocab


def test_bpe_tokenize_corpus_compresses_and_matches_vocab(spark):
    """Per-doc counts: ws_tokens <= bpe_tokens <= chars, totals telescope
    to the contract's corpus numbers, and a spot-check doc re-tokenizes
    identically through the reference vocab."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    freqs = Counter(w for d in docs for w in d.text.split(" ") if w)
    _merges, want_vocab = _reference_bpe(dict(freqs), B.N_MERGES)
    out = {r.doc_id: r for r in B.bpe_tokenize_corpus(spark, SF).collect()}
    assert set(out) == {d.doc_id for d in docs if d.text.strip()}
    for d in docs:
        words = [w for w in d.text.split(" ") if w]
        if not words:
            continue
        r = out[d.doc_id]
        assert r.n_ws_tokens == len(words)
        assert r.n_chars == sum(len(w) for w in words)
        want_bpe = sum(len(want_vocab[w]) for w in words)
        assert r.n_bpe_tokens == want_bpe
        assert r.n_ws_tokens <= r.n_bpe_tokens <= r.n_chars
