"""In-engine BPE training + application (operators/bpe.py): trainer vs
a pure-Python Sennrich reference, apply-kernel properties, end-to-end
corpus compression."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.bpe import apply_bpe, bpe_vocab, train_bpe
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def _ref_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(
    word_freqs: Counter, n_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """Sennrich et al. 2016 reference with the engine's tie-break
    (count desc, 'a b' string asc)."""
    words = {w: list(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, n in word_freqs.items():
            s = words[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += n
        if not counts:
            break
        (a, b), n = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )[0]
        if n < min_count:
            break
        merges.append((a, b))
        for w in words:
            words[w] = _ref_merge(words[w], a, b)
    return merges


def test_train_bpe_matches_reference(spark):
    """The distributed trainer must reproduce the reference merge list
    exactly — same greedy pair choice, same tie-break, same leftmost
    non-overlapping merge semantics (incl. 'aaa' under pair (a,a))."""
    corpus = [
        "low low low low low lower lower newest newest",
        "newest newest newest newest widest widest widest",
        "aaa aaa banana",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    wf = Counter(w for t in corpus for w in t.split())
    for n_merges in (1, 5, 12):
        got = train_bpe(df, "text", n_merges=n_merges, min_count=2)
        assert got == _ref_train(wf, n_merges, 2), n_merges


def test_apply_bpe_properties(spark):
    """Apply kernel: tokens concatenate back to the word stream, fully
    merged training words come out as single tokens, unknown characters
    survive as singletons, nulls stay null, and the result is identical
    across partitionings (pure function of (text, merges))."""
    corpus = ["low low low lower newest", "newest newest widest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    merges = train_bpe(df, "text", n_merges=20, min_count=1)
    assert ("l", "o") in merges or ("lo", "w") in merges

    test = spark.createDataFrame(
        [(1, "low newest zq low"), (2, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["toks"]
        for r in test.select(
            "doc_id", apply_bpe("text", merges).alias("toks")
        ).collect()
    }
    assert rows[2] is None
    toks = rows[1]
    assert "".join(toks) == "lownewestzqlow"
    assert toks.count("low") == 2 and "newest" in toks  # fully merged
    assert "z" in toks and "q" in toks  # unseen chars -> singletons

    repartitioned = {
        r["doc_id"]: r["toks"]
        for r in test.repartition(7)
        .select("doc_id", apply_bpe("text", merges).alias("toks"))
        .collect()
    }
    assert repartitioned == rows

    vocab = bpe_vocab(merges, base=set("lownewstzqider "))
    assert all(a + b in vocab for a, b in merges)


def test_bpe_end_to_end_compresses_corpus(spark):
    """Train on the documents table, apply to the same corpus: subword
    token count per doc must sit between the fully-merged floor (word
    count) and the char ceiling, and shrink as merges are learned —
    the compression property that makes BPE a tokenizer."""
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    merges = train_bpe(docs, "text", n_merges=24, min_count=2)
    assert len(merges) == 24

    counts = (
        docs.select(
            "doc_id",
            F.size(apply_bpe("text", merges)).alias("n_bpe"),
            F.size(apply_bpe("text", [])).alias("n_chars"),
            F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_words"),
        )
        .agg(
            F.sum("n_bpe").alias("bpe"),
            F.sum("n_chars").alias("chars"),
            F.sum("n_words").alias("words"),
        )
        .collect()[0]
    )
    assert counts["words"] <= counts["bpe"] < counts["chars"]


def test_apply_bpe_matches_spark_tokenization(spark):
    """Regression (review r4): apply must segment with Spark's tokens()
    semantics, not Python str.split() — a non-breaking space is NOT a
    separator for the JVM's \\s+, so 'ab\\xa0ab' is ONE word for both
    training and apply, and its subwords concatenate back to it."""
    text = "plain words ab\xa0ab plain"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = train_bpe(df, "text", n_merges=10, min_count=1)
    toks = df.select(apply_bpe("text", merges).alias("t")).collect()[0]["t"]
    joined = "".join(toks)
    # the NBSP word survives whole inside the token stream
    assert "ab\xa0ab" in joined
    assert joined == "".join(text.lower().split(" "))


def test_train_bpe_batched_matches_reference(spark):
    """Round-5 (VERDICT r4 #3): both scaled trainer tiers must produce
    the EXACT sequential-greedy merge list.  A seeded random
    small-alphabet corpus makes pair counts collide and conflict
    heavily — the stress case for the distributed prefix-acceptance
    stop rules AND the driver loop's lazy-heap tie-breaking."""
    import random

    rng = random.Random(1234)
    alphabet = "abcde"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 8)))
        for _ in range(400)
    ]
    # Zipf-ish repetition so ties and near-ties are common
    corpus_words = []
    for i, w in enumerate(words):
        corpus_words.extend([w] * (1 + (i % 7)))
    rng.shuffle(corpus_words)
    lines = [
        " ".join(corpus_words[i : i + 25])
        for i in range(0, len(corpus_words), 25)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "doc_id long, text string"
    )
    wf = Counter(corpus_words)

    # 40 merges: the conflict/tie structure the test stresses is in the
    # FIRST rounds (the seeded corpus collides heavily from merge 1);
    # 80 doubled the distributed rounds for no new coverage (round 16:
    # the suite must fit the driver's pytest window)
    ref40 = _ref_train(wf, 40, 2)
    # driver dict loop (default tier)
    got_driver = train_bpe(df, "text", n_merges=40, min_count=2)
    assert got_driver == ref40
    # distributed batched rounds, forced, two candidate windows
    got = train_bpe(
        df, "text", n_merges=40, min_count=2, batch_candidates=16,
        driver_dict_max=0,
    )
    assert got == ref40
    got64 = train_bpe(
        df, "text", n_merges=40, min_count=2, batch_candidates=64,
        driver_dict_max=0,
    )
    assert got64 == ref40

    # degenerate batch_candidates=1 is the classic loop
    got1 = train_bpe(
        df, "text", n_merges=6, min_count=2, batch_candidates=1,
        driver_dict_max=0,
    )
    assert got1 == ref40[:6]


def test_train_bpe_job_scaling(spark, monkeypatch):
    """The point of the round-5 rework: merges must not cost one
    aggregate+collect Spark round each.  Driver tier: exactly ONE
    collect (the word dict) regardless of n_merges — a large merge
    budget (1024, far beyond what this corpus supports) adds zero
    jobs.  Distributed tier: collect rounds < merges learned."""
    import random

    import pyspark.sql.classic.dataframe as _cdf

    rng = random.Random(99)
    corpus_words = [
        "".join(rng.choice("abcdefgh") for _ in range(rng.randint(3, 9)))
        for _ in range(600)
    ]
    lines = [
        " ".join(corpus_words[i : i + 30])
        for i in range(0, len(corpus_words), 30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "doc_id long, text string"
    )
    calls = {"n": 0}
    orig = _cdf.DataFrame.collect

    def counting_collect(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(_cdf.DataFrame, "collect", counting_collect)

    merges = train_bpe(df, "text", n_merges=1024, min_count=2)
    assert len(merges) > 50
    assert calls["n"] == 1, calls["n"]  # word-dict collect only
    wf = Counter(corpus_words)
    assert merges == _ref_train(wf, 1024, 2)

    calls["n"] = 0
    dist = train_bpe(
        df, "text", n_merges=60, min_count=2, batch_candidates=64,
        driver_dict_max=0,
    )
    assert len(dist) == 60
    assert calls["n"] < 60, calls["n"]  # strictly fewer rounds than merges
    assert dist == merges[:60]


def test_train_bpe_top_words_bounds_dict(spark):
    """top_words trains over only the N most frequent words — the list
    equals the reference trained on that truncated dict."""
    corpus = ["aa aa aa aa bb bb bb cc cc rare1 rare2 rare3"]
    df = spark.createDataFrame([(1, corpus[0])], "doc_id long, text string")
    wf = Counter(corpus[0].split())
    top2 = Counter(dict(sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:2]))
    got = train_bpe(df, "text", n_merges=5, min_count=1, top_words=2)
    assert got == _ref_train(top2, 5, 1)
