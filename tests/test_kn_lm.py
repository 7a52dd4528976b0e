"""X93 interpolated Kneser–Ney trigram LM (operators/kn_lm.py).

The load-bearing pin is a pure-Python replay of the ENTIRE pipeline —
vocab cut, <unk> mapping, padded trigram events, the three continuation
count cascades, the interpolated probability with both backoff gates,
and the picounit fixed-point mean — at exact grid equality, on corpora
that exercise every path (OOV tokens, unseen contexts, empty docs,
cross-corpus scoring)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from covid19i2b2_spark.operators.kn_lm import (
    BOS,
    EOS,
    UNK,
    kn_logprob_score,
    release_kn_lm,
    train_kn_lm,
)

D = 0.75


def _toks(text):
    t = (text or "").strip()
    return re.split(r"\s+", t) if t else []


def _vocab(corpus, top_n):
    c = Counter(t for txt in corpus for t in _toks(txt))
    return {
        t
        for t, _ in sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    }


def _events(text, vocab):
    toks = _toks(text)
    if not toks:
        return []

    def m(t):
        return t if t in (BOS, EOS) or t in vocab else UNK

    padded = [BOS, BOS] + [m(t) for t in toks] + [EOS]
    return [
        (padded[i - 2], padded[i - 1], padded[i])
        for i in range(2, len(padded))
    ]


class _Model:
    def __init__(self, corpus, top_n, discount=D):
        self.vocab = _vocab(corpus, top_n)
        self.d = discount
        c3 = Counter()
        for txt in corpus:
            c3.update(_events(txt, self.vocab))
        self.c3 = c3
        self.c2 = Counter()
        self.n1p3 = Counter()
        for (a, b, c), n in c3.items():
            self.c2[(a, b)] += n
            self.n1p3[(a, b)] += 1
        self.cc2 = Counter()
        lefts = defaultdict(set)
        for (a, b, c) in c3:
            lefts[(b, c)].add(a)
        for bc, s in lefts.items():
            self.cc2[bc] = len(s)
        self.ctxcc2 = Counter()
        self.n1p2 = Counter()
        for (b, c), n in self.cc2.items():
            self.ctxcc2[b] += n
            self.n1p2[b] += 1
        self.cc1 = Counter()
        mids = defaultdict(set)
        for (b, c) in self.cc2:
            mids[c].add(b)
        for c, s in mids.items():
            self.cc1[c] = len(s)
        self.tot_cc1 = len(self.cc2)
        self.v_eff = len(self.cc1) + 1

    def p3(self, a, b, c):
        p1 = (self.cc1.get(c, 0) + 1) / float(self.tot_cc1 + self.v_eff)
        if b in self.ctxcc2:
            p2 = (
                max(float(self.cc2.get((b, c), 0)) - self.d, 0.0)
                + (self.d * float(self.n1p2[b])) * p1
            ) / float(self.ctxcc2[b])
        else:
            p2 = p1
        if (a, b) in self.c2:
            p = (
                max(float(self.c3.get((a, b, c), 0)) - self.d, 0.0)
                + (self.d * float(self.n1p3[(a, b)])) * p2
            ) / float(self.c2[(a, b)])
        else:
            p = p2
        return p

    def score(self, text):
        ev = _events(text, self.vocab)
        if not ev:
            return None
        s = sum(
            math.floor(math.log(self.p3(a, b, c)) * 1e12 + 0.5)
            for a, b, c in ev
        )
        return math.floor((s / len(ev) / 1e12) * 1e6 + 0.5) / 1e6


TRAIN = [
    "the cat sat on the mat",
    "the cat sat on the rug",
    "the dog sat on the mat",
    "a dog ran to the park",
    "the cat ran to the mat",
    "dogs and cats live in the park",
    "san francisco is a city",
    "san francisco is a place",
]


def _spark_scores(spark, train_rows, score_rows, top_n, out="kn_logprob"):
    tr = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_rows)], "doc_id long, text string"
    )
    sc = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score_rows)], "doc_id long, text string"
    )
    model = train_kn_lm(tr, "text", top_n_vocab=top_n)
    try:
        got = {
            r["doc_id"]: r[out]
            for r in kn_logprob_score(sc, "doc_id", "text", model).collect()
        }
    finally:
        release_kn_lm(model)
    return got


def test_kn_replay_self_scored(spark):
    """Self-scored corpus matches the pure-Python replay on the exact
    fixed-point grid — every doc hits seen trigrams, backoffs, and the
    continuation floor somewhere."""
    got = _spark_scores(spark, TRAIN, TRAIN, top_n=12)
    ref = _Model(TRAIN, 12)
    for i, txt in enumerate(TRAIN):
        assert got[i] == pytest.approx(ref.score(txt), abs=0), i


def test_kn_replay_cross_corpus_and_paths(spark):
    """Cross-corpus scoring: OOV tokens (<unk>), unseen (a,b) contexts
    (-> P2), unseen middle contexts (-> P1 floor), and an empty doc
    (NULL) all replay exactly."""
    score = [
        "the cat sat on the mat",          # fluent, all seen
        "mat the on sat cat the",          # shuffled -> backoff heavy
        "zyx wvu tsr qpo",                 # all OOV -> <unk> floor
        "francisco san city a is",          # seen words, novel order
        "",                                 # empty -> NULL
        "the cat sat on the mat extra",     # one OOV tail token
    ]
    got = _spark_scores(spark, TRAIN, score, top_n=12)
    ref = _Model(TRAIN, 12)
    for i, txt in enumerate(score):
        want = ref.score(txt)
        if want is None:
            assert got[i] is None, i
        else:
            assert got[i] == pytest.approx(want, abs=0), i


def test_kn_fluency_ordering(spark):
    """The reason the operator exists: under the training distribution,
    fluent word order outscores the same words shuffled, which outscore
    OOV gibberish.  top_n covers the training vocabulary — with a tight
    vocab cut, <unk> becomes a FREQUENT training token and OOV streams
    score like common text (the documented closed-vocab trade-off; the
    replay tests pin that regime too, at top_n=12)."""
    score = [
        "the cat sat on the mat",
        "mat the on sat cat the",
        "zyx wvu tsr qpo nml",
    ]
    got = _spark_scores(spark, TRAIN, score, top_n=40)
    assert got[0] > got[1] > got[2]


def test_kn_continuation_beats_raw_frequency():
    """The Kneser–Ney signature (pure Python, no Spark): 'francisco'
    is as frequent as 'city'+'place' combined but only ever follows
    'san', so its unigram continuation mass is the minimum while a
    word seen after many contexts carries more."""
    ref = _Model(TRAIN, 40)
    assert ref.cc1["francisco"] == 1
    assert ref.cc1["the"] > ref.cc1["francisco"]


def test_kn_probability_mass_bounded():
    """For every observed context, the interpolated distribution sums
    to <= 1 with the residual reserved for never-seen continuations
    (the add-one floor's unseen bucket)."""
    ref = _Model(TRAIN, 40)
    support = set(ref.cc1) | {UNK, EOS}
    for (a, b) in list(ref.c2)[:10]:
        total = sum(ref.p3(a, b, c) for c in support)
        assert total <= 1.0 + 1e-9, (a, b)
        assert total >= 0.9, (a, b)


NEW_CORPUS = [
    "the park is quiet in winter",
    "cats nap near the quiet river",
    "a comet passed over the park",
]


def _score_with(spark, model, rows):
    sc = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r["kn_logprob"]
        for r in kn_logprob_score(sc, "doc_id", "text", model).collect()
    }


def test_kn_model_build_load_roundtrip(spark, tmp_path):
    """KnLmModel.build -> load scores every probe doc identically to
    the in-memory train_kn_lm model (same vocab cut, same counts, same
    scalars re-derived from the stored statistic)."""
    from covid19i2b2_spark.operators.kn_lm import KnLmModel

    tr = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id long, text string"
    )
    store = KnLmModel(str(tmp_path / "kn"))
    assert store.current_version(spark) is None
    with pytest.raises(ValueError, match="call build"):
        store.load(spark)
    assert store.build(spark, tr, "text", top_n_vocab=12) == 1
    probe = TRAIN + ["the cat ran to the park", "zyx unk stream"]
    loaded = store.load(spark)
    mem = train_kn_lm(tr, "text", top_n_vocab=12)
    try:
        assert _score_with(spark, loaded, probe) == _score_with(
            spark, mem, probe
        )
        assert loaded.tot_cc1 == mem.tot_cc1
        assert loaded.v_eff == mem.v_eff
        m = store.meta(spark)
        assert (m["tot_cc1"], m["v_eff"]) == (mem.tot_cc1, mem.v_eff)
    finally:
        release_kn_lm(loaded)
        release_kn_lm(mem)


def test_kn_model_append_equals_union_retrain(spark, tmp_path):
    """append_corpus ≡ retrain over (old ∪ new) under the FROZEN vocab
    (trigram counts under a fixed vocabulary are additive): exact
    score equality on probes spanning old-only, new-only, and OOV
    text, and the version advances with the old one readable."""
    from covid19i2b2_spark.operators.kn_lm import KnLmModel

    a = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TRAIN)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, t) for i, t in enumerate(NEW_CORPUS)],
        "doc_id long, text string",
    )
    store = KnLmModel(str(tmp_path / "kn"))
    store.build(spark, a, "text", top_n_vocab=12)
    loaded_v1 = store.load(spark)
    frozen_vocab = loaded_v1.vocab
    assert store.append_corpus(spark, b, "text") == 2
    appended = store.load(spark)
    union_retrain = train_kn_lm(
        a.unionByName(b), "text", top_n_vocab=12, vocab=frozen_vocab
    )
    probe = TRAIN + NEW_CORPUS + ["quiet river cats", "zyx wvu"]
    try:
        assert _score_with(spark, appended, probe) == _score_with(
            spark, union_retrain, probe
        )
        tri_a = {
            (r["a"], r["b"], r["c"]): r["c3"]
            for r in appended.tri.collect()
        }
        tri_b = {
            (r["a"], r["b"], r["c"]): r["c3"]
            for r in union_retrain.tri.collect()
        }
        assert tri_a == tri_b
    finally:
        release_kn_lm(appended)
        release_kn_lm(union_retrain)
        release_kn_lm(loaded_v1)
    store.vacuum(spark)
    assert store.current_version(spark) == 2


def test_kn_guards(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="discount"):
        train_kn_lm(df, "text", discount=1.0)
    with pytest.raises(ValueError, match="top_n_vocab"):
        train_kn_lm(df, "text", top_n_vocab=0)
    model = train_kn_lm(df, "text", top_n_vocab=5)
    try:
        with pytest.raises(ValueError, match="already exists"):
            kn_logprob_score(
                df.withColumn("kn_logprob", df.doc_id), "doc_id", "text", model
            )
    finally:
        release_kn_lm(model)
