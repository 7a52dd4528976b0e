"""End-to-end curation pipeline (pipelines/curation.py): golden-output
test over a corpus with planted boilerplate, exact dups, near dups, and
a contaminated document — proving the operators COMPOSE, not just run in
isolation."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from covid19i2b2_spark.pipelines.curation import CurationConfig, curate

BANNER = "COOKIE NOTICE accept all cookies to continue"

BODIES = {
    1: "the quick brown fox jumps over the lazy dog near the quiet river bank today",
    2: "splendid isolation of the mountain cabin makes winter evenings feel long and calm",
    3: "market prices for heirloom tomatoes rose sharply after the unexpected june frost",
    4: "the committee approved the new library budget despite three dissenting votes cast",
    5: "astronomers observed a faint comet passing between the orbits of mars and jupiter",
}

EVAL_SENTENCE = (
    "what is the capital of france the capital of france is paris of course"
)


def _corpus(spark):
    rows = [(i, f"{BANNER}\n{b}") for i, b in BODIES.items()]
    # 101: exact copy of doc 1 (identical after banner removal)
    rows.append((101, f"{BANNER}\n{BODIES[1]}"))
    # 102: near dup of doc 2 (one appended word -> high shingle jaccard)
    rows.append((102, f"{BANNER}\n{BODIES[2]} indeed"))
    # 103: contaminated — body IS the eval sentence plus a few words
    rows.append((103, f"{BANNER}\n{EVAL_SENTENCE} and some padding words"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _eval_df(spark):
    return spark.createDataFrame([(EVAL_SENTENCE,)], "text string")


def test_curation_golden_survivors(spark):
    out = curate(
        _corpus(spark),
        _eval_df(spark),
        config=CurationConfig(
            boilerplate_max_doc_frac=0.1,
            # 8-doc corpus: the banner is in all 8; the exact-dup pair
            # shares its body line in only 2 — min_docs=3 separates them
            boilerplate_min_docs=3,
            minhash_threshold=0.6,
            contamination_threshold=0.2,
        ),
    )
    rows = {r.doc_id: r for r in out.collect()}
    # exact dup 101 collapsed into 1; near dup 102 collapsed into 2;
    # contaminated 103 dropped; originals survive
    assert set(rows) == {1, 2, 3, 4, 5}, sorted(rows)
    # boilerplate line stripped from every surviving text
    assert all(BANNER not in r.text for r in rows.values())
    # bodies intact after line reassembly
    for i, body in BODIES.items():
        assert rows[i].text == body
    # packing columns present and well-formed
    assert all(r.n_tokens > 0 and r.chunk_id is not None for r in rows.values())


def test_curation_is_deterministic(spark):
    """Retry-safety contract: two runs produce byte-identical output,
    including shard/chunk assignment (hash-derived, no RNG)."""
    cfg = CurationConfig(minhash_threshold=0.6)
    a = sorted(
        curate(_corpus(spark), _eval_df(spark), config=cfg).collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        curate(_corpus(spark), _eval_df(spark), config=cfg).collect(),
        key=lambda r: r.doc_id,
    )
    assert a == b


def test_curation_sample_is_nested(spark):
    """hash_sample inside the pipeline keeps the nested-subset property:
    the 0.4-fraction output ids are a subset of the 0.8-fraction ids."""
    corpus = _corpus(spark)
    ev = _eval_df(spark)
    small = {
        r.doc_id
        for r in curate(
            corpus, ev, config=CurationConfig(minhash_threshold=0.6, sample_fraction=0.4)
        ).collect()
    }
    big = {
        r.doc_id
        for r in curate(
            corpus, ev, config=CurationConfig(minhash_threshold=0.6, sample_fraction=0.8)
        ).collect()
    }
    assert small <= big


def test_curation_quality_gate_and_blocklist(spark):
    """Optional pre-filters: blocked sources and quality-failing docs drop
    before dedup; defaults leave behavior unchanged (golden test above)."""
    corpus = _corpus(spark).withColumn(
        "source", F.when(F.col("doc_id") == 3, "bad.example").otherwise("ok")
    )
    blocked = spark.createDataFrame([("bad.example",)], "value string")
    out = curate(
        corpus,
        _eval_df(spark),
        config=CurationConfig(
            boilerplate_min_docs=3,
            minhash_threshold=0.6,
            quality_min_words=5,
            # test bodies carry one distinct must-have stopword ('the')
            quality_rules=(("min_stop_hits", 1),),
        ),
        blocked_sources=blocked,
    )
    ids = {r.doc_id for r in out.collect()}
    assert 3 not in ids  # blocklisted
    assert ids == {1, 2, 4, 5}  # everything else survives the gate + dedup


def test_corpus_scd2_update_versions_changed_docs(spark):
    """corpus_scd2_update: changed content closes the open version and
    appends a new one; unchanged re-crawls add nothing; new ids append
    as first versions (the no-lakehouse incremental refresh path)."""
    from covid19i2b2_spark.pipelines.curation import corpus_scd2_update

    corpus = spark.createDataFrame(
        [
            (1, "original one", date(2026, 1, 1), None),
            (2, "original two", date(2026, 1, 1), None),
            (3, "retired", date(2026, 1, 1), date(2026, 2, 1)),
            (3, "current three", date(2026, 2, 1), None),
        ],
        "doc_id long, text string, crawl_date date, end_date date",
    )
    batch = spark.createDataFrame(
        [
            (1, "changed one", date(2026, 3, 1)),   # content changed
            (2, "original two", date(2026, 3, 1)),  # unchanged re-crawl
            (4, "brand new", date(2026, 3, 1)),     # new id
        ],
        "doc_id long, text string, crawl_date date",
    )
    out = corpus_scd2_update(corpus, batch).collect()
    rows = {(r.doc_id, r.text): (r.crawl_date, r.end_date) for r in out}
    # doc 1: old version closed at the new crawl date, new version open
    assert rows[(1, "original one")] == (date(2026, 1, 1), date(2026, 3, 1))
    assert rows[(1, "changed one")] == (date(2026, 3, 1), None)
    # doc 2: unchanged — single open version, no spurious close
    assert rows[(2, "original two")] == (date(2026, 1, 1), None)
    assert len([k for k in rows if k[0] == 2]) == 1
    # doc 3: untouched history + open version pass through
    assert rows[(3, "retired")] == (date(2026, 1, 1), date(2026, 2, 1))
    assert rows[(3, "current three")] == (date(2026, 2, 1), None)
    # doc 4: new first version
    assert rows[(4, "brand new")] == (date(2026, 3, 1), None)
    assert len(out) == 6


def test_curation_classifier_gate_and_mixture_sample(spark):
    """The model-based gate drops docs the (hand-set) classifier scores
    low, and the mixture sampler reweights domains inside the chain —
    both composing with the rest of the pipeline."""
    from covid19i2b2_spark.operators.quality import _poly_token_bucket  # noqa: F401
    import numpy as np

    # weights that score docs containing 'spamword' low: find its bucket
    # with the same arithmetic the operator uses
    P, B, D = 9_007_199_254_740_881, 1009, 16

    def bucket(tok: str) -> int:
        h = 0
        for ch in tok:
            h = (h * B + ord(ch)) % P
        return h % D

    spam_bucket = bucket("spamword")
    weights = [0.5] * D
    weights[spam_bucket] = -50.0

    def clean_tok(base: str) -> str:
        # keep clean tokens out of the spam bucket so the gate's verdict
        # is deterministic, not collision luck
        while bucket(base) == spam_bucket:
            base += "x"
        return base

    rows = []
    for i in range(1, 41):
        body = " ".join(clean_tok(f"tok{i}w{j}") for j in range(15))
        if i % 4 == 0:
            body = "spamword " + body
        rows.append((i, body, "en" if i <= 32 else "de"))
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    evals = spark.createDataFrame([(999, "nothing shared here")], "doc_id long, text string")
    cfg = CurationConfig(
        classifier_weights=tuple(weights),
        classifier_threshold=0.5,
        boilerplate_min_docs=100,  # no boilerplate in this corpus
    )
    out = curate(corpus, evals, config=cfg)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    assert kept == {i for i in range(1, 41) if i % 4 != 0}
    # mixture sampling: tau=0 flattens toward uniform-over-domains, so
    # the rare domain keeps a larger share of itself than the common one
    cfg2 = CurationConfig(
        boilerplate_min_docs=100,
        sample_fraction=0.5,
        mixture_domain_col="lang",
        mixture_temperature=0.0,
    )
    out2 = curate(corpus, evals, config=cfg2)
    got = {r.doc_id for r in out2.select("doc_id").collect()}
    langs = {i: ("en" if i <= 32 else "de") for i in range(1, 41)}
    n_en = sum(1 for i in got if langs[i] == "en")
    n_de = sum(1 for i in got if langs[i] == "de")
    # tau=0 targets ~10 rows per domain (20 total); de has only 8 docs
    assert n_de >= 6, (n_en, n_de)  # nearly all rare-domain docs kept
    assert n_en <= 16, (n_en, n_de)  # common domain visibly downsampled
    # and the pipeline schema is unchanged (no leaked domain column)
    assert out2.columns == ["doc_id", "text", "n_tokens", "shard", "chunk_id"]


def test_curation_html_input_strips_markup(spark):
    """html_input=True runs strip_html before every other stage: markup
    never reaches dedup/packing, and tag-only docs drop out."""
    rows = [
        (1, "<p>the quick brown fox jumps over the lazy dog today</p>"),
        (2, "<script>var x=1;</script><b>splendid isolation of the "
            "mountain cabin makes winter feel calm</b>"),
        (3, "<div><!-- nothing visible --></div>"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    evals = spark.createDataFrame([(9, "unrelated")], "doc_id long, text string")
    out = curate(
        corpus,
        evals,
        config=CurationConfig(html_input=True, boilerplate_min_docs=100),
    )
    got = {r.doc_id: r.text for r in out.collect()}
    assert set(got) == {1, 2}  # tag-only doc 3 reduced to nothing
    assert "<" not in got[1] and "script" not in got[2]
    assert got[1].startswith("the quick brown fox")


def test_curation_dup_span_stage_excises_templates(spark):
    """dup_span_k > 0 inserts the exact-substring pass after
    line_dedup: a template run shared across docs MID-LINE (invisible
    to line-level dedup — it never matches a whole line) is excised
    from every survivor, and the rest of the chain runs unchanged."""
    template = (
        "this offer is subject to the standard terms and "
        "conditions of the service agreement"
    )  # 14 tokens, embedded mid-line
    rows = [(i, f"{BODIES[i]} {template} {BODIES[i]}") for i in (1, 2, 3)]
    rows.append((4, BODIES[4]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([("unrelated eval text",)], "text string")
    out = curate(
        df,
        ev,
        config=CurationConfig(
            boilerplate_max_doc_frac=1.0,  # line stage can't catch it
            dup_span_k=8,
            minhash_threshold=0.95,
        ),
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in out}
    assert set(texts) == {1, 2, 3, 4}
    for i in (1, 2, 3):
        assert "terms and conditions" not in texts[i], i
        # each doc's unique body survives around the excision
        assert BODIES[i].split()[0] in texts[i]
    assert texts[4] == BODIES[4]


def test_curation_exact_substring_stage_cuts_char_exact(spark):
    """exact_substring_min_len > 0 inserts the X91 cluster-scoped
    suffix-array surgery after the token-grid pass: a duplicated run
    is excised CHARACTER-exactly from every copy (Lee et al.
    ExactSubstr — no survivor), untouched docs keep their text
    byte-for-byte (no token re-render), and the rest of the chain
    runs unchanged."""
    template = (
        "Redistribution and use in source and binary forms, with or "
        "without modification, are permitted provided that conditions"
    )  # 119 chars, embedded mid-line; mixed case pins byte-for-byte
    # suffix differs byte-wise from the prefix: within-doc repeats
    # count as duplication too (Lee et al.), so the bracket must not
    # itself be a >= min_len self-repeat
    rows = [
        (i, f"{BODIES[i]} {template} {BODIES[i].upper()}")
        for i in (1, 2, 3)
    ]
    rows.append((4, BODIES[4].title()))  # case survives: no re-render
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([("unrelated eval text",)], "text string")
    out = curate(
        df,
        ev,
        config=CurationConfig(
            boilerplate_max_doc_frac=1.0,  # line stage can't catch it
            exact_substring_min_len=60,
            minhash_threshold=0.95,
        ),
    ).collect()
    texts = {r["doc_id"]: r["text"] for r in out}
    assert set(texts) == {1, 2, 3, 4}
    for i in (1, 2, 3):
        assert "Redistribution" not in texts[i], i
        # the doc's unique brackets survive the excision byte-for-byte
        assert texts[i].startswith(BODIES[i]) and texts[i].endswith(
            BODIES[i].upper()
        ), i
    assert texts[4] == BODIES[4].title()


def test_curation_kn_perplexity_gate(spark):
    """kn_keep_fraction < 1 inserts the X93 CCNet-style gate after
    decontamination: the worst-perplexity tail drops.  Self-trained
    path — fluent docs share n-grams, the OOV-gibberish doc only has
    its own singletons, so it lands at the bottom of the percentile."""
    rows = [
        (1, "the cat sat on the mat today and then tomorrow"),
        (2, "the cat sat on the rug today and then yesterday"),
        (3, "the dog sat on the mat today and then quietly"),
        (4, "the dog ran to the park today and then home"),
        (5, "zqx vbn mlk pqr jhg wsd rft yhn ujm iklo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([("unrelated eval text",)], "text string")
    out = curate(
        df,
        ev,
        config=CurationConfig(
            boilerplate_max_doc_frac=1.0,
            minhash_threshold=0.99,
            kn_keep_fraction=0.8,
        ),
    ).collect()
    kept = {r["doc_id"] for r in out}
    assert 5 not in kept
    assert {1, 2, 3, 4} <= kept
    # the gate column stays internal
    assert "kn_logprob" not in out[0].asDict()


def test_curation_kn_gate_external_lm_corpus(spark):
    """kn_lm_corpus trains the gate's LM on a SEPARATE trusted corpus
    (the CCNet shape): a doc fluent under that corpus survives while
    an off-distribution doc of seen-but-shuffled words drops."""
    lm = spark.createDataFrame(
        [
            (100 + i, t)
            for i, t in enumerate(
                [
                    "the committee approved the budget today",
                    "the committee approved the motion today",
                    "the board approved the budget today",
                    "the board rejected the motion today",
                ]
            )
        ],
        "doc_id long, text string",
    )
    rows = [
        (1, "the committee approved the budget today"),
        (2, "the board approved the motion today"),
        (3, "today budget the approved committee the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame([("unrelated eval text",)], "text string")
    out = curate(
        df,
        ev,
        config=CurationConfig(
            boilerplate_max_doc_frac=1.0,
            minhash_threshold=0.99,
            kn_keep_fraction=0.7,
        ),
        kn_lm_corpus=lm,
    ).collect()
    kept = {r["doc_id"] for r in out}
    assert 3 not in kept
    assert {1, 2} <= kept


def test_curation_kn_gate_per_group_thresholds(spark):
    """kn_group_col switches the gate to per-group percentiles (the
    CCNet per-LANGUAGE form): under a global threshold the whole
    off-distribution source drops (uniformly high perplexity under the
    majority LM); per-group, each source keeps its own best and only
    its own worst tail drops."""
    lm = spark.createDataFrame(
        [
            (100 + i, f"the cat sat on the mat {w}")
            for i, w in enumerate(["one", "two", "three", "four"])
        ],
        "doc_id long, text string",
    )
    rows = [
        # source 'en': fluent under the LM
        (1, "en", "the cat sat on the mat five"),
        (2, "en", "the cat sat on the rug two"),
        (3, "en", "the cat sat near the mat one"),
        # source 'xx': off-distribution; scores differ within group
        (4, "xx", "zq wv the cat sat kl pp"),
        (5, "xx", "zq wv tk the pl mm qq"),
        (6, "xx", "zq wv tk pl mm rr ss"),
        # NULL source: gates as its own group under the sentinel —
        # the null-unsafe threshold join would otherwise drop it
        # silently regardless of score (review r15)
        (7, None, "the cat sat on the mat seven"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    ev = spark.createDataFrame([("unrelated eval text",)], "text string")

    def run(group_col):
        out = curate(
            df,
            ev,
            config=CurationConfig(
                boilerplate_max_doc_frac=1.0,
                minhash_threshold=0.99,
                kn_keep_fraction=0.5,
                kn_group_col=group_col,
            ),
            kn_lm_corpus=lm,
        ).collect()
        return {r["doc_id"] for r in out}

    kept_global = run(None)
    assert kept_global & {1, 2, 3}
    assert not kept_global & {4, 5, 6}  # whole source drops globally
    kept_grouped = run("source")
    assert kept_grouped & {1, 2, 3}
    assert kept_grouped & {4, 5, 6}  # per-group keeps xx's own best
    assert 6 not in kept_grouped  # xx's all-OOV tail still drops
    assert 7 in kept_grouped  # NULL group survives via the sentinel


def test_curation_top_fraction_and_token_budget_stages(spark):
    """Round-5 stages: the percentile gate keeps ceil(frac*n) of each
    domain, the token budget caps each domain's final token total, both
    compose with the mixture domain column, and the run stays
    deterministic."""
    from pyspark.sql import functions as F

    from covid19i2b2_spark.pipelines.curation import CurationConfig, curate
    from covid19i2b2_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "text"
    )
    ev = docs.orderBy("doc_id").limit(3).select("text")
    base_cfg = CurationConfig(minhash_threshold=0.7)
    base = curate(docs, ev, config=base_cfg)
    n_base = base.count()

    cfg = CurationConfig(
        minhash_threshold=0.7,
        mixture_domain_col="source",
        top_fraction=0.5,
        token_budget=200,
    )
    got = curate(docs, ev, config=cfg)
    rows = got.collect()
    assert 0 < len(rows) < n_base

    # budget: no source exceeds 200 tokens in the final output
    per_src = (
        got.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
    )
    assert per_src.filter(F.col("t") > 200).count() == 0

    # determinism across partitionings of the input
    again = curate(docs.repartition(17), ev, config=cfg).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in rows
    )

    # schema contract unchanged
    assert got.columns == ["doc_id", "text", "n_tokens", "shard", "chunk_id"]


def test_repeated_curate_no_storage_growth(spark):
    """VERDICT r7 #6, pipeline level: repeated curate() calls in one
    session with cache_handles released after each write leave ZERO net
    executor storage — the cached intermediates (DataFrame.persist) and
    the global top-fraction / token-budget stages' pinned checkpoints
    (PinnedPrefixHandle) all release through the one handles list.
    Tracked by persistent-RDD id so concurrent ContextCleaner activity
    on unrelated RDDs cannot flake the asserts.  3 iterations: the
    id-set delta is EXACT (any un-released persist from any iteration
    fails the final assert), so more iterations only amplified wall
    time, not detection power (round 16 — was 20 iterations / 104 s,
    the suite's slowest test)."""
    from covid19i2b2_spark.operators.sampling import PinnedPrefixHandle
    from tests.test_sampling import _persisted_rdd_ids

    corpus, ev = _corpus(spark), _eval_df(spark)
    cfg = CurationConfig(
        boilerplate_min_docs=3,
        minhash_threshold=0.6,
        top_fraction=0.9,   # global percentile gate -> one checkpoint
        token_budget=60,    # global budget stage  -> one checkpoint
    )
    initial = _persisted_rdd_ids(spark)
    for _ in range(3):
        handles: list = []
        out = curate(corpus, ev, config=cfg, cache_handles=handles)
        assert out.count() > 0  # "written" before release
        assert (
            sum(isinstance(h, PinnedPrefixHandle) for h in handles) == 2
        ), handles
        for h in handles:
            h.unpersist()
    assert _persisted_rdd_ids(spark) - initial == set()


def test_curation_license_provenance_survives_surgery(spark):
    """Round 15 (VERDICT r14 #6): carry_licenses extracts license
    evidence from the RAW html BEFORE strip_html and the dup-span
    surgery — the planted rel="license" badge markup is ITSELF the
    duplicated span, so post-surgery text no longer contains the
    evidence bytes, yet every survivor still carries its pre-surgery
    license_url / license_id."""
    badge = (
        "<a rel=\"license\" "
        "href=\"https://creativecommons.org/licenses/by/4.0/\">"
        "licensed under creative commons attribution four point zero "
        "international terms</a>"
    )
    rows = [
        (i, f"http://h{i}.com/p", f"<p>{BODIES[i]}</p> {badge}")
        for i in (1, 2, 3)
    ]
    rows.append((4, "http://h4.com/p", f"<p>{BODIES[4]}</p>"))
    corpus = spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    )
    ev = spark.createDataFrame([("unrelated eval text",)], "text string")
    out = curate(
        corpus,
        ev,
        config=CurationConfig(
            html_input=True,
            carry_licenses=True,
            boilerplate_max_doc_frac=1.0,
            dup_span_k=8,
            minhash_threshold=0.95,
        ),
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert set(got) == {1, 2, 3, 4}
    for i in (1, 2, 3):
        # surgery removed the shared badge text from the survivors...
        assert "creative commons attribution" not in got[i]["text"], i
        # ...but the pre-surgery provenance is still attached
        assert (
            got[i]["license_url"]
            == "https://creativecommons.org/licenses/by/4.0/"
        ), i
        assert got[i]["license_id"] == "CC-BY-4.0", i
        assert got[i]["license_source"] == "rel", i
    # the licenseless page carries NULLs, not a dropped row
    assert got[4]["license_url"] is None
    assert got[4]["license_id"] is None


def test_curation_carry_licenses_requires_html_and_url(spark):
    import pytest as _pytest

    corpus = spark.createDataFrame(
        [(1, "plain text")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([("x",)], "text string")
    with _pytest.raises(ValueError, match="html_input"):
        curate(corpus, ev, config=CurationConfig(carry_licenses=True))
    with _pytest.raises(ValueError, match="url"):
        curate(
            corpus,
            ev,
            config=CurationConfig(html_input=True, carry_licenses=True),
        )
