"""X49 unigram tokenizer (operators/unigram.py): EM correctness
(likelihood non-decreasing at fixed vocab), Viterbi optimality against
brute-force segmentation enumeration, vocab-size/coverage invariants,
round-trip, unknown-character handling, and determinism across
partitionings.  The distributed seed statistic's cross-engine parity
lives in tests/test_oracle_parity.py (q_unigram_seed)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.unigram import (
    _em_pass,
    train_unigram,
    unigram_tokenize,
    viterbi_segment,
)

_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps under the quick brown tree",
    "quick brown foxes and lazy dogs over and over",
    "internationalization and internationalism internally",
    "tokenization tokenizers tokenize tokens",
]


def _corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id long, text string"
    )


def _all_segmentations(word):
    if not word:
        yield []
        return
    for l in range(1, len(word) + 1):
        for rest in _all_segmentations(word[l:]):
            yield [word[:l]] + rest


def test_em_likelihood_non_decreasing():
    wf = [("abab", 5), ("abc", 3), ("cab", 2), ("a", 7)]
    pieces = {"a", "b", "c", "ab", "ba", "bc", "ca", "aba", "bab"}
    logp = {p: math.log(1.0 / len(pieces)) for p in pieces}
    lls = []
    for _ in range(6):
        logp, ll = _em_pass(wf, logp, max_len=3)
        lls.append(ll)
    for prev, cur in zip(lls, lls[1:]):
        assert cur >= prev - 1e-9, lls


def test_viterbi_matches_brute_force():
    """Viterbi's score equals the exhaustive-enumeration optimum for
    every word short enough to enumerate (score equality, so the
    longer-last-piece tie rule needn't be replicated)."""
    import random

    rng = random.Random(8)
    pieces = ["a", "b", "c", "ab", "bc", "abc", "cab", "ba"]
    logp = {p: math.log(rng.uniform(0.01, 0.5)) for p in pieces}
    unk = min(logp.values()) - 10.0

    def seg_score(seg):
        s = 0.0
        for p in seg:
            lp = logp.get(p)
            if lp is None:
                if len(p) != 1:
                    return -math.inf
                lp = unk
            s += lp
        return s

    for word in ["abcab", "aaab", "cba", "abcd", "dd", "a", "bacbab"]:
        got = viterbi_segment(word, logp, max_len=3, unk_lp=unk)
        assert "".join(got) == word
        best = max(seg_score(s) for s in _all_segmentations(word))
        assert seg_score(got) == pytest.approx(best, abs=1e-12), (word, got)


def test_train_vocab_invariants_and_round_trip(spark):
    corpus = _corpus(spark)
    vocab = train_unigram(corpus, "text", vocab_size=60, max_piece_len=5)
    pieces = [p for p, _ in vocab]
    assert len(pieces) == len(set(pieces))
    chars = {c for t in _TEXTS for w in t.split() for c in w}
    singles = {p for p in pieces if len(p) == 1}
    assert chars <= singles  # coverage: no word can become unsegmentable
    assert len([p for p in pieces if len(p) > 1]) <= 60
    # logprobs are a (near-)distribution and sorted (logprob desc, piece)
    assert sum(math.exp(lp) for _, lp in vocab) == pytest.approx(1.0, abs=0.05)
    assert vocab == sorted(vocab, key=lambda t: (-t[1], t[0]))

    toks = corpus.select(
        "doc_id",
        unigram_tokenize("text", vocab).alias("pieces"),
        F.concat_ws(" ", F.transform(
            F.split(F.trim(F.lower("text")), r"\s+"), lambda w: w
        )).alias("norm"),
    ).collect()
    for r in toks:
        assert "".join(r["pieces"]) == r["norm"].replace(" ", "")


def test_train_deterministic_across_partitionings(spark):
    corpus = _corpus(spark)
    v1 = train_unigram(corpus, "text", vocab_size=40, max_piece_len=4)
    v2 = train_unigram(
        corpus.repartition(7), "text", vocab_size=40, max_piece_len=4
    )
    assert [p for p, _ in v1] == [p for p, _ in v2]
    for (_, a), (_, b) in zip(v1, v2):
        assert a == pytest.approx(b, abs=1e-12)


import pytest as _pytest


@_pytest.fixture(scope="module")
def vocab40(spark):
    """One shared training for the read-only consumers below (round 16:
    each re-trained the identical vocab, ~3.5 s a time)."""
    return train_unigram(_corpus(spark), "text", vocab_size=40)


def test_tokenize_handles_unknown_chars(spark, vocab40):
    vocab = vocab40
    df = spark.createDataFrame(
        [(1, "quick zürich 文字 dog"), (2, None), (3, "   ")],
        "id long, text string",
    )
    rows = {r["id"]: r["pieces"] for r in df.select(
        "id", unigram_tokenize("text", vocab).alias("pieces")
    ).collect()}
    assert "".join(rows[1]) == "quickzürich文字dog"
    assert rows[2] is None or rows[2] == []
    assert rows[3] == []


def test_train_validation_and_dict_guard(spark):
    corpus = _corpus(spark)
    with pytest.raises(ValueError):
        train_unigram(corpus, "text", vocab_size=0)
    with pytest.raises(ValueError):
        train_unigram(corpus, "text", shrink=1.0)
    with pytest.raises(ValueError):
        train_unigram(corpus, "text", vocab_size=10, em_impl="nope")
    # the dict guard applies to the COLLECTED-dict path only
    with pytest.raises(ValueError, match="driver_dict_max"):
        train_unigram(
            corpus, "text", vocab_size=10, driver_dict_max=3,
            em_impl="driver",
        )
    # the distributed E-step (default) has no driver-dict cap
    v_dist = train_unigram(
        corpus, "text", vocab_size=10, driver_dict_max=3
    )
    assert v_dist
    # top_words bounds the dict below the guard
    v = train_unigram(
        corpus, "text", vocab_size=20, top_words=5, driver_dict_max=10,
        em_impl="driver",
    )
    assert v


def test_distributed_em_matches_driver_em(spark):
    """VERDICT r8 #5: the distributed E-step must train the SAME vocab
    as the collected-dict path — identical piece sets, logprobs equal
    to float-summation order (the two paths share the per-word
    forward-backward; only the cross-word summation differs: exact
    decimal vs sequential float)."""
    corpus = _corpus(spark)
    kw = dict(vocab_size=40, max_piece_len=4, em_iters=2)
    v_drv = train_unigram(corpus, "text", em_impl="driver", **kw)
    v_dst = train_unigram(corpus, "text", em_impl="distributed", **kw)
    assert {p for p, _ in v_drv} == {p for p, _ in v_dst}
    d_drv, d_dst = dict(v_drv), dict(v_dst)
    # float-summation-order differences compound across EM iterations
    # (~1e-9 per pass); 1e-6 still pins identical semantics
    for p, lp in d_drv.items():
        assert abs(lp - d_dst[p]) < 1e-6, (p, lp, d_dst[p])


def test_distributed_em_likelihood_non_decreasing(spark):
    """EM guarantee on the distributed path, and partitioning
    invariance: the decimal-summed E-step must produce identical
    (logp, ll) whatever the word dict's physical layout."""
    from covid19i2b2_spark.operators.unigram import _em_pass_distributed

    wf = [("abab", 5), ("abc", 3), ("cab", 2), ("a", 7)]
    words = spark.createDataFrame(wf, "word string, n_word long")
    pieces = {"a", "b", "c", "ab", "ba", "bc", "ca", "aba", "bab"}
    logp = {p: math.log(1.0 / len(pieces)) for p in pieces}
    lls = []
    for _ in range(5):
        logp, ll = _em_pass_distributed(words, logp, max_len=3)
        lls.append(ll)
    for prev, cur in zip(lls, lls[1:]):
        assert cur >= prev - 1e-9, lls
    # layout invariance: 1 partition vs 7 -> bit-identical outputs
    logp0 = {p: math.log(1.0 / len(pieces)) for p in pieces}
    a = _em_pass_distributed(words.coalesce(1), logp0, max_len=3)
    b = _em_pass_distributed(words.repartition(7), logp0, max_len=3)
    assert a[0] == b[0] and a[1] == b[1]


def test_unigram_beats_chars_on_likelihood(spark):
    """The trained vocab must segment the training corpus with higher
    total likelihood than the all-single-char baseline — i.e. the EM
    actually learned multi-char pieces that pay for themselves."""
    corpus = _corpus(spark)
    vocab = train_unigram(corpus, "text", vocab_size=60, max_piece_len=5)
    logp = dict(vocab)
    words = [w for t in _TEXTS for w in t.split()]
    unk = min(logp.values()) - 10.0

    def ll(model, max_len):
        tot = 0.0
        for w in words:
            seg = viterbi_segment(w, model, max_len, unk)
            tot += sum(model.get(p, unk) for p in seg)
        return tot

    chars = [p for p in logp if len(p) == 1]
    uniform_chars = {c: math.log(1.0 / len(chars)) for c in chars}
    assert ll(logp, 5) > ll(uniform_chars, 1)
