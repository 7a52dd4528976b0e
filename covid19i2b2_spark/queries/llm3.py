"""t2 queries: third batch of LLM-data operators — benchmark
contamination detection and BM25 relevance ranking (SURVEY §2.11).

Both are fully SQL-expressible, so they carry DuckDB oracles and get the
driver's hash-match check (unlike the LSH/ANN family).  Slots freed by
deregistering q_topk (O2 stays green via q_cosine_topk + plan test) and
q_icd_truncate (F6/F8 stays green via q_covid_diagnoses); both keep
pytest oracle parity in tests/test_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.aggregates import (
    QFIX0_SQL,
    QFIX_SQL,
    roundk,
)
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table

# The eval/benchmark split used by q_contamination: every 20th document
# plays the benchmark set (small by construction — the real-world
# invariant that makes the eval-side broadcast safe), the rest are the
# corpus under test.
_EVAL_MOD = 20

# Trigram overlap: the synthetic docs draw from a ~40-word vocabulary,
# so n=3 yields a non-degenerate ratio distribution (n=5 would match
# nothing, n=2 would flag everything).
_NGRAM_N = 3
_THRESHOLD = 0.2

_TOKED_SQL = """
    toked AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(toks) < 3 THEN []
                        ELSE [array_to_string(toks[i:i+2], ' ')
                              FOR i IN range(1, len(toks) - 1)] END) AS gset
        FROM toked
    )
"""


@query(
    "q_contamination",
    oracle=f"""
    WITH {_TOKED_SQL},
    eval_set AS (
        SELECT list(DISTINCT gram) AS egrams
        FROM (SELECT unnest(gset) AS gram FROM grams
              WHERE doc_id % {_EVAL_MOD} = 0)
    )
    SELECT doc_id,
           CAST(len(gset) AS BIGINT) AS n_grams,
           CAST(len(list_intersect(gset, egrams)) AS BIGINT) AS n_matched,
           CASE WHEN len(gset) = 0 THEN 0.0
                ELSE FLOOR((CAST(len(list_intersect(gset, egrams)) AS DOUBLE)
                            / len(gset)) * 1000000 + 0.5) / 1000000
           END AS contamination_ratio,
           CASE WHEN len(gset) = 0 THEN FALSE
                ELSE CAST(len(list_intersect(gset, egrams)) AS DOUBLE)
                     / len(gset) >= {_THRESHOLD}
           END AS contaminated
    FROM grams, eval_set
    WHERE doc_id % {_EVAL_MOD} <> 0
    ORDER BY doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4/X2-adjacent: benchmark-contamination report — per corpus doc,
    the fraction of its distinct word trigrams that appear anywhere in
    the eval split (GPT-3 appendix-C style decontamination test).
    Corpus side: one explode + broadcast join + one groupBy — the eval
    n-gram set is the only broadcast (small by invariant)."""
    from covid19i2b2_spark.operators.contamination import contamination_report

    docs = read_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    eval_df = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    return contamination_report(
        corpus, eval_df, "doc_id", "text", n=_NGRAM_N, threshold=_THRESHOLD
    ).orderBy("doc_id")


_BM25_TERMS = ["spark", "filter", "vector"]
_K1, _B, _TOPK = 1.2, 0.75, 10


def _bm25_oracle() -> str:
    tf_cols = ",\n               ".join(
        f"CAST(len(list_filter(toks, t -> t = '{t}')) AS BIGINT) AS tf_{t}"
        for t in _BM25_TERMS
    )
    df_cols = ",\n               ".join(
        f"CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"
        for t in _BM25_TERMS
    )
    # Mirror the Spark expression tree exactly: ((idf * tf) * (k1+1)) /
    # (tf + (k1 * ((1-b) + ((b * dl) / avgdl)))) summed left-to-right.
    parts = " + ".join(
        f"(ln(1.0 + (n - df_{t} + 0.5) / (df_{t} + 0.5))"
        f" * CAST(tf_{t} AS DOUBLE) * {_K1 + 1.0!r}"
        f" / (CAST(tf_{t} AS DOUBLE)"
        f"    + {_K1!r} * ({1.0 - _B!r} + {_B!r} * dl / avgdl)))"
        for t in _BM25_TERMS
    )
    tf_list = ", ".join(f"tf_{t}" for t in _BM25_TERMS)
    return f"""
    WITH toked AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents
    ),
    pertf AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS dl,
               {tf_cols}
        FROM toked
    ),
    stats AS (
        SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
               {df_cols}
        FROM pertf
    )
    SELECT doc_id, dl, {tf_list},
           FLOOR(({parts}) * 1000000 + 0.5) / 1000000 AS bm25
    FROM pertf, stats
    ORDER BY bm25 DESC, doc_id
    LIMIT {_TOPK}
    """


@query("q_bm25_rank", oracle=_bm25_oracle())
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: BM25 top-k keyword search over the documents table — fixed
    query terms become per-row array expressions (no explode, no
    (doc,term) shuffle): one scan -> 1-row stats agg -> broadcast ->
    score -> TakeOrderedAndProject."""
    from covid19i2b2_spark.operators.ranking import bm25_rank

    docs = read_table(spark, sf_dir, "documents")
    return bm25_rank(
        docs, "doc_id", "text", _BM25_TERMS, k1=_K1, b=_B, k=_TOPK
    )


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 quality tier: per-document Gopher rule report (Rae et al. 2021
    A1.1) — signals + passes flag for every doc, fully auditable.

    Not registered as a t2 query (driver 50-query window): the signal
    shapes (size/filter/aggregate over one projected token array) are
    hash-verified through q_text_analysis; this query's own DuckDB parity
    is asserted in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.quality import gopher_filter

    docs = read_table(spark, sf_dir, "documents")
    return gopher_filter(docs, "doc_id", "text", min_words=10).orderBy("doc_id")


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 vocabulary builder: exact top-100 token vocab with global counts
    and deterministic rank (count desc, token asc) — tokenizer-training
    input.  Unregistered (50-slot window); DuckDB parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.quality import build_vocab

    docs = read_table(spark, sf_dir, "documents")
    return build_vocab(docs, "text", top_n=100).orderBy("rank")


def q_text_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 hygiene surface: PII redaction + Gopher repetition ratios in one
    per-doc report.  PII spans are INJECTED deterministically (an email
    built from doc_id, an IP, a phone) so the redaction regexes are
    exercised on every row — the raw corpus contains none.

    Unregistered (50-slot window); DuckDB parity (same injection + RE2-
    compatible patterns) in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.text import redact_pii, repetition_ratios

    docs = read_table(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0.0.1 or +1 (555) 123-4567 now"),
        ).alias("dirty"),
    )
    rep = repetition_ratios("dirty")
    return dirty.select(
        "doc_id",
        redact_pii("dirty").alias("clean_text"),
        rep["dup_line_frac"].alias("dup_line_frac"),
        rep["dup_2gram_frac"].alias("dup_2gram_frac"),
    ).orderBy("doc_id")


def q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 hygiene: NFC unicode normalization (Arrow-vectorized pandas_udf
    — Spark has no built-in normalizer).  A decomposed span is appended
    to every doc so normalization changes every row; DuckDB's
    nfc_normalize provides the oracle (tests/test_oracle_parity.py).
    Unregistered (50-slot window)."""
    from covid19i2b2_spark.operators.text import normalize_unicode

    docs = read_table(spark, sf_dir, "documents")
    dirty = F.concat(F.col("text"), F.lit(" café naïve"))
    return docs.select(
        "doc_id", normalize_unicode(dirty, "NFC").alias("text_nfc")
    ).orderBy("doc_id")


def q_semantic_pairs_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 SemDeDup deterministic sub-stage: given FROZEN centroids (the
    first 16 embedding vectors — SQL-expressible, unlike the Lloyd
    iterations of train_centroids), assign every vector to its
    max-cosine centroid and emit within-cluster pairs with exact cosine
    >= 0.3.  exact_decimal fixed-points every dot product, so assignment
    AND pair cosines reproduce bit-for-bit in the DuckDB oracle
    (tests/test_oracle_parity.py) — covering everything in
    q_semantic_dedup except the k-means loop.  Unregistered (50-slot
    window)."""
    from covid19i2b2_spark.operators.semdedup import semantic_dedup_pairs

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    return (
        semantic_dedup_pairs(
            emb,
            "vec_id",
            "embedding",
            eps=0.3,
            centroids=cents,
            exact_decimal=True,
        )
        .select("id_a", "id_b", "cosine_sim")
        .orderBy("id_a", "id_b")
    )


def q_minhash_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 oracle-parity mode, EXPRESSION impl: the COMPLETE MinHash+LSH
    pipeline — signatures, band buckets, signature-estimate cascade,
    exact-Jaccard verify — with the polynomial shingle AND band hashes,
    so every stage reproduces bit-for-bit in the DuckDB oracle
    (tests/test_oracle_parity.py).  The registered q_minhash_pairs now
    runs the SAME polynomial arithmetic on the Arrow kernel
    (impl='kernel_poly') with the same oracle attached; this
    unregistered expression variant pins that the explode+aggregate path
    and the kernel agree against one oracle text.  Unregistered
    (50-slot window)."""
    from covid19i2b2_spark.operators.dedup import minhash_dedup_pairs

    docs = read_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        docs, "doc_id", "text", n_hashes=32, n_bands=8, shingle_k=5,
        threshold=0.5, impl="poly",
    ).orderBy("id_a", "id_b")


def clf_weights(n_buckets: int = 32) -> list[float]:
    """Deterministic stand-in classifier weights (seeded, rounded to 6
    decimals so the SAME short literals parse to identical doubles in
    Spark and the DuckDB oracle).  In production these come from an
    upstream trainer — see tests/test_quality.py, which trains a numpy
    logistic regression on planted labels and runs it through the same
    operator."""
    import numpy as np

    rng = np.random.default_rng(7)
    return [round(float(x), 6) for x in rng.standard_normal(n_buckets) * 0.5]


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window document chunking (64-token chunks, 16-token
    overlap) — the RAG / pre-training sequence-prep staple.  Map-only
    array expressions; UNREGISTERED (50-slot window), full DuckDB parity
    in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.chunking import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=64, overlap_tokens=16
    ).orderBy("doc_id", "chunk_id")


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring: fasttext-style linear classifier
    over hashed bag-of-tokens features (polynomial bucket hash, weights
    as plan literals, sigmoid of the token-mean weight).  Map-only model
    inference; UNREGISTERED, full DuckDB parity."""
    from covid19i2b2_spark.operators.quality import linear_text_classifier

    docs = read_table(spark, sf_dir, "documents")
    return (
        linear_text_classifier(
            docs, "text", clf_weights(), bias=0.1, out_col="quality_prob"
        )
        .select("doc_id", "quality_prob")
        .orderBy("doc_id")
    )


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted domain-mixture sampling (tau=0.5 flattens
    the language mix, target 50% of the corpus) in the oracle-mirrorable
    poly-bucket mode.  UNREGISTERED (50-slot window); the DuckDB oracle
    embeds thresholds computed by the SAME mixture_fractions float math,
    so membership matches bit-for-bit."""
    from covid19i2b2_spark.operators.sampling import (
        temperature_mixture_sample,
    )

    docs = read_table(spark, sf_dir, "documents")
    sampled, _ = temperature_mixture_sample(
        docs,
        "doc_id",
        "lang",
        temperature=0.5,
        target_fraction=0.5,
        seed=42,
        hash_impl="poly",
    )
    return sampled.select("doc_id", "lang").orderBy("doc_id")


_DUP_BANNER = (
    "subscribe to our newsletter for daily updates and exclusive offers today"
)
_DUP_EVERY = 5


def q_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-passage mining (poly hash mode).  The
    raw synthetic corpus has no repeated 8-grams, so a fixed boilerplate
    banner is PLANTED on every 5th document (the q_text_hygiene
    injection pattern) — its internal 8-token windows then repeat across
    ~60 docs and must surface with exact doc/occurrence counts and the
    earliest witness.  UNREGISTERED (50-slot window); full DuckDB parity
    in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.passages import duplicate_passages

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    dirty = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % _DUP_EVERY == 0,
            F.concat(F.lit(_DUP_BANNER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return duplicate_passages(
        dirty, "doc_id", "text", k=8, min_docs=2, hash_impl="poly"
    ).orderBy("passage_hash")


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality scoring (CCNet-style statistical filter) over
    the documents table: mean add-one-smoothed token log-probability
    under the corpus's own top-100 unigram distribution.  UNREGISTERED
    (50-slot window); full DuckDB parity in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.quality import unigram_logprob_score

    docs = read_table(spark, sf_dir, "documents")
    return (
        unigram_logprob_score(docs, "doc_id", "text", top_n_vocab=100)
        .select("doc_id", "unigram_logprob")
        .orderBy("doc_id")
    )


def q_kn_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X93 interpolated Kneser–Ney trigram LM (the CCNet perplexity
    filter's smoothing, Chen & Goodman 1998): train on the documents
    table (top-50 closed vocab, D=0.75), score every document with the
    per-doc mean event log-probability.  The DuckDB oracle RE-TRAINS
    the model — vocab cut, <unk> mapping, padded trigram events, all
    three continuation-count cascades — and re-scores every document
    in SQL at exact fixed-point equality.

    Unregistered (50-slot window); full DuckDB parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.kn_lm import (
        kn_logprob_score,
        train_kn_lm,
    )

    docs = read_table(spark, sf_dir, "documents")
    # persist=False: this query fn has no release hook (parity harness,
    # plan dump), and the cached model tables would otherwise leak
    # executor storage for the whole session (review r15)
    model = train_kn_lm(docs, "text", top_n_vocab=50, persist=False)
    return (
        kn_logprob_score(docs, "doc_id", "text", model)
        .select("doc_id", "kn_logprob")
        .orderBy("doc_id")
    )


def q_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X30 mergeable frequent-items store, full build->merge arithmetic:
    per-(shard, source) top-k token summaries (shard = doc_id % 4)
    merged to per-source heavy hitters with [count_lo, count_hi] bounds
    and the residual ``bound``.  Exercises the SpaceSaving merge charge
    (absent shard contributes its bound to count_hi) end-to-end.

    Unregistered (50-slot window); DuckDB parity replays the identical
    summary/merge arithmetic in SQL (tests/test_oracle_parity.py)."""
    from covid19i2b2_spark.operators.sketches import (
        build_topk_sketches,
        merge_topk_sketches,
        topk_estimates,
    )
    from covid19i2b2_spark.operators.text import tokens

    toks = (
        read_table(spark, sf_dir, "documents")
        .select(
            F.pmod("doc_id", F.lit(4)).alias("shard"),
            "source",
            F.explode(tokens(F.lower("text"))).alias("token"),
        )
    )
    shards = build_topk_sketches(toks, ["shard", "source"], "token", k=12)
    merged = merge_topk_sketches(shards, ["source"], k=12)
    return topk_estimates(merged).select(
        "source",
        F.col("rank").cast("long").alias("rank"),
        "item",
        F.col("count_lo").cast("long").alias("count_lo"),
        F.col("count_hi").cast("long").alias("count_hi"),
        F.col("bound").cast("long").alias("bound"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy("source", "rank")


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X35 BPE pair statistics: top adjacent character-pair counts over
    the word-frequency dict (the merge statistic of BPE tokenizer
    training), deterministic rank (count desc, pair asc).

    Unregistered (50-slot window); DuckDB parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.quality import bpe_pair_counts

    docs = read_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, "text", top_n=100).orderBy("rank")


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X37 bigram-LM quality scoring: per-doc mean add-one-smoothed
    conditional logprob over the bounded top-N vocab/bigram tables —
    the word-order-aware rung of the perplexity-filter ladder.

    Unregistered (50-slot window); DuckDB parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.quality import bigram_logprob_score

    docs = read_table(spark, sf_dir, "documents")
    return (
        bigram_logprob_score(
            docs, "doc_id", "text", top_n_vocab=100, top_n_bigrams=300
        )
        .select("doc_id", "bigram_logprob")
        .orderBy("doc_id")
    )


def q_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X39 duplicated-span REMOVAL (poly hash mode): the planted banner
    corpus from q_dup_passages, with every cross-document duplicated
    run excised from the normalized token stream — banner docs lose
    exactly the banner tokens, clean docs come back byte-identical to
    their normalization.  UNREGISTERED (50-slot window); full DuckDB
    parity in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.passages import remove_duplicate_spans

    docs = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    dirty = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % _DUP_EVERY == 0,
            F.concat(F.lit(_DUP_BANNER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return (
        remove_duplicate_spans(
            dirty, "doc_id", "text", k=8, min_docs=2, hash_impl="poly"
        )
        .select("doc_id", "text_deduped", "n_removed_tokens")
        .orderBy("doc_id")
    )


def q_token_budget_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 X43: quality-first selection under a per-source token
    budget (operators/sampling.py select_to_token_budget) — fill each
    source's training-mixture slice with its longest docs until 500
    tokens are claimed.  Deterministic (score desc, doc_id asc) window
    cumsum.  UNREGISTERED (50-slot window; renamed from
    q_token_budget_select in round 7 when the GLOBAL form took the t2
    slot); DuckDB parity in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.sampling import select_to_token_budget
    from covid19i2b2_spark.operators.text import token_count

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").alias("score"),
        token_count("text").cast("long").alias("n_toks"),
    )
    return (
        select_to_token_budget(
            docs, "doc_id", "score", "n_toks", budget=500,
            group_cols=["source"],
        )
        .select("doc_id", "source", "n_toks")
        .orderBy("source", "doc_id")
    )


@query(
    "q_token_budget_select",
    oracle="""
    WITH scored AS (
        SELECT doc_id, length(text) AS score,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                    END AS BIGINT) AS n_toks
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_toks,
               SUM(n_toks) OVER (ORDER BY score DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS c
        FROM scored
    )
    SELECT doc_id, n_toks FROM cum WHERE c <= 15000
    ORDER BY doc_id
    """,
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X43 GLOBAL token-budget selection (registered round 7, VERDICT
    r6 #4 — took q_join_left's slot): keep the corpus-wide best docs by
    (length desc, doc_id asc) until 15 000 tokens are claimed, through
    the range-partition + boundary-partition-window prefix plan
    (operators/sampling.py _global_ordered_prefix) — the path the
    round-7 partition-drift fix pinned with an eager localCheckpoint.
    An unpartitioned window would be a single task at 100 TB; this plan
    is #shuffle-partitions-parallel with one tiny stats collect."""
    from covid19i2b2_spark.operators.sampling import select_to_token_budget
    from covid19i2b2_spark.operators.text import token_count

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").alias("score"),
        token_count("text").cast("long").alias("n_toks"),
    )
    return (
        select_to_token_budget(docs, "doc_id", "score", "n_toks", budget=15_000)
        .select("doc_id", "n_toks")
        .orderBy("doc_id")
    )


def q_top_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 X44: per-source percentile gate — keep the top 25% of
    each source by score with integer ceil(frac*n) semantics
    (operators/sampling.py filter_top_fraction, exact mode; the sketch
    mode's error bounds are pytest-asserted in test_sampling.py).
    UNREGISTERED; DuckDB parity in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.sampling import filter_top_fraction

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").cast("long").alias("score")
    )
    return (
        filter_top_fraction(
            docs, "doc_id", "score", 0.25, ["source"], impl="exact"
        )
        .select("doc_id", "source", "score")
        .orderBy("source", "doc_id")
    )


def _cm_sketch_oracle(depth: int = 3, width: int = 512, seed: int = 42) -> str:
    """DuckDB replay of operators/sketches.py build_cm_sketches +
    merge_cm_sketches + cm_estimates: per-source Count-Min cells from
    the codepoint-polynomial affine hashes, probed for the shared
    CM_PROBE_KEYS vocabulary.  The Spark query builds per-shard and
    merges; cell-wise sums are linear, so per-source counts computed
    directly here are the identical store — the parity therefore also
    pins merge ≡ rebuild."""
    from covid19i2b2_spark.operators.dedup import _hash_family

    m31 = 2_147_483_647
    p53 = 9_007_199_254_740_881
    fam = _hash_family(depth, seed)
    ab_vals = ", ".join(f"({r}, {a}, {b})" for r, (a, b) in enumerate(fam))
    key_vals = ", ".join(f"('{k}')" for k in CM_PROBE_KEYS)

    def hp(col: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, length({col})+1), "
            f"i -> CAST(unicode({col}[i]) AS BIGINT)), "
            f"(acc, ch) -> (acc*1009 + ch) % {p53})"
        )

    def cell(col: str) -> str:
        return f"((({hp(col)} % {m31}) * ab.a + ab.b) % {m31}) % {width}"

    return f"""
    WITH toks AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
        FROM documents WHERE trim(text) <> ''
    ),
    ab(r, a, b) AS (VALUES {ab_vals}),
    cells AS (
        SELECT source, ab.r AS row, {cell('t')} AS cell
        FROM toks CROSS JOIN ab
    ),
    counts AS (
        SELECT source, row, cell, COUNT(*) AS c
        FROM cells GROUP BY 1, 2, 3
    ),
    nr AS (SELECT source, COUNT(*) AS n_rows FROM toks GROUP BY source),
    keys(key) AS (VALUES {key_vals}),
    kcells AS (
        SELECT key, ab.r AS row, {cell('key')} AS cell
        FROM keys CROSS JOIN ab
    ),
    est AS (
        SELECT nr.source, k.key, MIN(COALESCE(c.c, 0)) AS est, nr.n_rows
        FROM nr CROSS JOIN kcells k
        LEFT JOIN counts c
          ON c.source = nr.source AND c.row = k.row AND c.cell = k.cell
        GROUP BY nr.source, k.key, nr.n_rows
    )
    SELECT source, key, CAST(est AS BIGINT) AS est,
           CAST(n_rows AS BIGINT) AS n_rows
    FROM est ORDER BY source, key
    """


# probe vocabulary for q_cm_sketch — shared with the DuckDB oracle
# builder so both sides ask for the same keys (includes a token absent
# from the corpus: its estimate must come back 0 or tiny-collision; the
# non-ASCII key pins Spark `ascii` ≡ DuckDB `unicode` codepoint
# semantics through the polynomial hash — round 8, VERDICT r7 #5)
CM_PROBE_KEYS = ["the", "and", "data", "model", "zzznotoken", "héllo→☃"]


@query("q_cm_sketch", oracle=_cm_sketch_oracle())
def q_cm_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X47 Count-Min frequency store, full build->merge->estimate
    arithmetic: per-(shard, source) sparse cell matrices (shard =
    doc_id % 4) merged to per-source stores, probed for a fixed token
    vocabulary.  Point-frequency estimates for ARBITRARY keys at
    depth x width bounded size — the lookup the top-k store can't
    serve.  The cell hash is the oracle-mirrorable codepoint
    polynomial, so DuckDB replays the identical cells bit-for-bit.
    REGISTERED round 8 (VERDICT r7 #2; slot ceded by q_row_number,
    whose W3 semantics stay green via q_covid_patient_mapping +
    UNREGISTERED parity)."""
    from covid19i2b2_spark.operators.sketches import (
        build_cm_sketches,
        cm_estimates,
        merge_cm_sketches,
    )
    from covid19i2b2_spark.operators.text import tokens

    toks = read_table(spark, sf_dir, "documents").select(
        F.pmod("doc_id", F.lit(4)).alias("shard"),
        "source",
        F.explode(tokens(F.lower("text"))).alias("token"),
    )
    shards = build_cm_sketches(
        toks, ["shard", "source"], "token", depth=3, width=512
    )
    merged = merge_cm_sketches(shards, ["source"])
    return (
        cm_estimates(merged, ["source"], CM_PROBE_KEYS, depth=3, width=512)
        .orderBy("source", "key")
    )


def q_corpus_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 X45: token-distribution drift between two snapshot
    halves of the corpus (operators/drift.py corpus_divergence) — JS
    divergence per source plus token/type triage columns.  The halves
    split on floor(doc_id/20) %% 2 so every source keeps docs on both
    sides (doc_id %% 20 IS the source in the synthetic corpus).
    UNREGISTERED; DuckDB parity in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.drift import corpus_divergence_ordered

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    half = F.pmod(F.floor(F.col("doc_id") / 20), F.lit(2))
    return corpus_divergence_ordered(
        docs.filter(half == 0),
        docs.filter(half == 1),
        "text",
        ["source"],
    )


@query(
    "q_fuzzy_pairs",
    # the oracle is the BRUTE-FORCE cross join: driver-level parity
    # pins the blocking scheme's COMPLETENESS (padded q-gram prefix
    # blocks + short pool must find every pair the O(n²) scan finds)
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
    FROM customer a, customer b
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 X48: edit-distance similarity self-join
    (operators/fuzzy.py fuzzy_pairs) — all customer-name pairs within
    Levenshtein distance 1, via padded-q-gram prefix blocking + the
    thresholded JVM levenshtein verify.  The synthetic c_name column
    ("Customer#000000017") is exactly the dirty-metadata workload:
    single-digit typos are distance-1 neighbors.  REGISTERED round 9
    (VERDICT r8 #8; slot ceded by q_embedding_centroids, whose
    centroid semantics stay green via q_semantic_dedup + q_ann_ivf +
    UNREGISTERED parity): the brute-force oracle pins completeness —
    blocking must find every pair the cross join finds.

    gram_order='rare' (review r9): these template names are the
    documented degenerate case for the hash order — every name shares
    its lowest-HASH grams (the 'Customer#0' frame), collapsing a whole
    scale factor into ONE ~C(n,2) block — while the frequency order
    blocks on the discriminative digit grams.  The pair set is
    order-independent (pinned in tests), so the oracle is unchanged;
    registering the rare path puts it under the driver gate."""
    from covid19i2b2_spark.operators.fuzzy import fuzzy_pairs

    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        fuzzy_pairs(
            cust, "c_custkey", "c_name", max_dist=1, k=2,
            gram_order="rare",
        )
        .select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("dist").cast("int").alias("dist"),
        )
        .orderBy("id_a", "id_b")
    )


def _knn_fixdot(a: str, b: str) -> str:
    """DuckDB mirror of similarity._dot_decimal: fixed-point picounit
    sums, order/engine-independent (the q_embedding_near_dup /
    q_ann_ivf oracle convention)."""
    return (
        f"(CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(FLOOR(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)"
        f" * 1000000000000 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000)"
    )


def _knn_join_oracle() -> str:
    """X52 kNN join through frozen IVF: right assignment (max sim,
    tie -> highest centroid_id — ivf_assign's max_by), per-query
    top-4-of-16 probe (same tie rule), candidate join on centroid_id,
    per-query top-5 by (sim desc, neighbor_id asc) — every stage the
    deterministic fixed-point arithmetic knn_join_ivf runs.  The
    two-stage partial top-k changes the Spark plan only, not the
    result set (tests/test_knn.py pins the equality), so one global
    rank is the faithful oracle."""
    sim_ec = (
        f"{_knn_fixdot('e.embedding', 'c.cvec')}"
        f" / (sqrt({_knn_fixdot('e.embedding', 'e.embedding')})"
        f" * sqrt({_knn_fixdot('c.cvec', 'c.cvec')}))"
    )
    sim_qc = (
        f"{_knn_fixdot('q.qv', 'c.cvec')}"
        f" / (sqrt({_knn_fixdot('q.qv', 'q.qv')})"
        f" * sqrt({_knn_fixdot('c.cvec', 'c.cvec')}))"
    )
    sim_qa = (
        f"{_knn_fixdot('q.qv', 'a.embedding')}"
        f" / (sqrt({_knn_fixdot('q.qv', 'q.qv')})"
        f" * sqrt({_knn_fixdot('a.embedding', 'a.embedding')}))"
    )
    return f"""
    WITH cents AS (
        SELECT vec_id AS centroid_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 16
    ),
    assigned AS (
        SELECT vec_id AS neighbor_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {sim_ec} DESC, c.centroid_id DESC
                   ) AS rn
            FROM embeddings e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    queries AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    probes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.query_id, c.centroid_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {sim_qc} DESC, c.centroid_id DESC
                   ) AS rn
            FROM queries q CROSS JOIN cents c
        ) WHERE rn <= 4
    ),
    cand AS (
        SELECT p.query_id, a.neighbor_id, {sim_qa} AS sim
        FROM probes p
        JOIN queries q USING (query_id)
        JOIN assigned a USING (centroid_id)
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neighbor_id
               ) AS rn
        FROM cand
    )
    SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,
           FLOOR(sim * 1000000 + 0.5) / 1000000 AS cosine_sim
    FROM ranked WHERE rn <= 5
    ORDER BY query_id, rank
    """


@query("q_knn_join", oracle=_knn_join_oracle())
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-9 X52: distributed kNN JOIN (operators/knn.py
    knn_join_ivf) — every query vector's top-5 max-cosine corpus
    neighbors through an IVF partition: frozen centroids (vec_id < 16,
    the q_semantic_pairs_frozen convention), 4-of-16 probed clusters,
    fixed-point cosine, Arrow top-p probe kernel, two-stage partial
    top-k (round 10).  Deterministic end to end, so DuckDB replays
    assignment + probing + ranking exactly.  REGISTERED round 10
    (VERDICT r9 #1: slot ceded by q_cosine_topk, the single-query
    special case this join subsumes; cosine_topk stays green via
    UNREGISTERED parity + q_bm25_rank's TakeOrderedAndProject pin).
    The brute-force recall bound lives in tests/test_knn.py."""
    from covid19i2b2_spark.operators.knn import knn_join_ivf

    emb = read_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return knn_join_ivf(
        queries,
        emb,
        "vec_id",
        "vec_id",
        "embedding",
        "embedding",
        cents,
        k=5,
        n_probe=4,
        exact_decimal=True,
    ).orderBy("query_id", "rank")


def q_unigram_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-8 X49: the unigram tokenizer's seed-vocab statistic
    (operators/unigram.py seed_piece_counts) — corpus frequencies of
    every substring (length 1..6) of every word, weighted by word
    frequency, top 200 by (n desc, piece asc).  The distributed half of
    train_unigram; the EM/pruning half is vocabulary-sized and driver-
    side (tests/test_unigram.py).  UNREGISTERED; DuckDB parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.unigram import seed_piece_counts

    docs = read_table(spark, sf_dir, "documents")
    return (
        seed_piece_counts(docs, "text", max_piece_len=6)
        .select("piece", F.col("n").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "piece")
        .limit(200)
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 X55: URL canonicalization + URL-keyed dedup
    (operators/urls.py) over a DETERMINISTIC synthetic URL zoo — the
    documents table carries no URL column, so each doc derives one
    from (source, doc_id % 50): 50 distinct resources per source, each
    spelled four ways by doc_id % 4 (uppercase host + percent-encoded
    unreserved path chars, www. prefix + tracking param, explicit :80
    port + trailing slash, plain).  Canonicalization must fold the
    spellings so the dedup groups by resource; the DuckDB oracle
    replays the construction AND the folding rules (round 11: the
    expected canonical is derived from the construction, so the
    %44/%6Fc spelling passing parity IS the RFC 3986 unreserved-decode
    proof).  UNREGISTERED; parity in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.urls import url_dedup

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    key = F.pmod("doc_id", F.lit(50)).cast("long")
    spelling = F.pmod("doc_id", F.lit(4))
    host = F.concat(F.col("source"), F.lit(".example.com"))
    path = F.concat(F.lit("/Doc/"), key)
    url = (
        # host case folds, PATH case is kept — only the host uppercases;
        # the percent-encoded spelling decodes to the same "/Doc/" path
        # (%44 = D uppercase-hex, %6f = o lowercase-hex — both rules)
        F.when(
            spelling == 0,
            F.concat(
                F.lit("http://"), F.upper(host),
                F.lit("/%44%6fc/"), key,
            ),
        )
        .when(
            spelling == 1,
            F.concat(
                F.lit("http://www."), host, path,
                F.lit("?utm_source=x&b=2"),
            ),
        )
        .when(
            spelling == 2,
            F.concat(F.lit("http://"), host, F.lit(":80"), path, F.lit("/")),
        )
        .otherwise(F.concat(F.lit("http://"), host, path, F.lit("?b=2")))
    )
    # two canonical groups per (source, key): {0, 2} bare and {1, 3}
    # ?b=2 — the www/utm/port/slash/case rules all fold, the surviving
    # real param deliberately does not
    with_urls = docs.select("doc_id", url.alias("url"))
    return (
        url_dedup(with_urls, "doc_id", "url")
        .select(
            F.col("canonical_url"),
            F.col("doc_id").cast("long").alias("survivor_id"),
            F.col("n_duplicates").cast("long").alias("n_duplicates"),
        )
        .orderBy("canonical_url")
    )


@query(
    "q_dsir_select",
    oracle="""
    WITH toked AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents
    ),
    raw_tok AS (
        SELECT doc_id, unnest(toks) AS token FROM toked
        WHERE doc_id % 10 <> 0
    ),
    tgt_tok AS (
        SELECT doc_id, unnest(toks) AS token FROM toked
        WHERE doc_id % 10 = 0
    ),
    vocab_t AS (
        SELECT token, COUNT(*) AS n FROM tgt_tok GROUP BY token
        ORDER BY n DESC, token LIMIT 100
    ),
    vocab_r AS (
        SELECT token, COUNT(*) AS n FROM raw_tok GROUP BY token
        ORDER BY n DESC, token LIMIT 100
    ),
    nt AS (SELECT COUNT(*) AS n FROM tgt_tok),
    nr AS (SELECT COUNT(*) AS n FROM raw_tok),
    lp AS (
        SELECT t.doc_id,
               COUNT(*) AS dl,
               FLOOR((CAST(SUM(CAST(FLOOR(ln((COALESCE(vt.n, 0) + 1)
                       / (CAST(nt.n AS DOUBLE) + 101))
                       * 1000000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                      / COUNT(*) / 1000000000000) * 1000000 + 0.5)
                   / 1000000 AS lp_t,
               FLOOR((CAST(SUM(CAST(FLOOR(ln((COALESCE(vr.n, 0) + 1)
                       / (CAST(nr.n AS DOUBLE) + 101))
                       * 1000000000000 + 0.5) AS BIGINT)) AS DOUBLE)
                      / COUNT(*) / 1000000000000) * 1000000 + 0.5)
                   / 1000000 AS lp_r
        FROM raw_tok t
        LEFT JOIN vocab_t vt USING (token)
        LEFT JOIN vocab_r vr USING (token), nt, nr
        GROUP BY t.doc_id
    ),
    keyed AS (
        SELECT doc_id,
               (lp_t - lp_r) * dl AS diff,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|7'),
                                     1, 8)) AS BIGINT) + 0.5)
                   / 4294967296.0 AS u
        FROM lp
    )
    SELECT doc_id,
           FLOOR(diff * 1000000 + 0.5) / 1000000 AS log_weight,
           FLOOR((diff - ln(-ln(u))) * 1000000 + 0.5) / 1000000
               AS gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id
    LIMIT 50
    """,
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 X57: DSIR data selection (operators/sampling.py
    dsir_select) — every 10th document plays the small target corpus,
    the rest are the raw pool; the 50 raw docs most target-like by
    unigram importance weight are Gumbel-top-k selected (seeded md5
    noise — the F13 never-rand() rule, so DuckDB replays vocabularies,
    fixed-point logprob means, weights, noise, and the final ranking
    exactly).  REGISTERED round 11 (VERDICT r10 #2 — slot ceded by
    q_ngram_jaccard; the fused one-pass scoring carries the same
    oracle because it replays arithmetic, not plan shape)."""
    from covid19i2b2_spark.operators.sampling import dsir_select

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    raw = docs.filter(F.col("doc_id") % 10 != 0)
    return (
        dsir_select(
            raw, target, "doc_id", "text", k=50, top_n_vocab=100, seed=7
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "log_weight",
            "gumbel_key",
        )
        .orderBy(F.col("gumbel_key").desc(), "doc_id")
    )


def q_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 X59: snapshot schema/statistics drift report
    (operators/validation.py) between the even-doc_id and odd-doc_id
    halves of the documents table, with a planted schema drift on the
    b side (n_chars dropped, an extra_col added, lang retyped to int's
    length) — exercises presence, dtype, null-rate, distinct and range
    comparison in one report.  UNREGISTERED; DuckDB parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.validation import snapshot_drift_report

    docs = read_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .drop("n_chars")
        .withColumn("lang", F.length("lang").cast("int"))
        .withColumn(
            "extra_col",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(
                F.pmod("doc_id", F.lit(3))
            ).cast("long"),
        )
    )
    return snapshot_drift_report(a, b).orderBy("column")


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 X64: per-target top-k anchor texts
    (operators/graph.py top_anchor_texts) over a synthetic link table
    — every document "links" to target doc_id % 20 with its first two
    tokens as the anchor; top-3 anchors per target by link count, ties
    by text.  UNREGISTERED; the DuckDB oracle replays the count +
    ROW_NUMBER in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.graph import top_anchor_texts

    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    links = docs.select(
        F.pmod("doc_id", F.lit(20)).cast("long").alias("dst"),
        F.array_join(F.slice(toks, 1, 2), " ").alias("anchor"),
    )
    return (
        top_anchor_texts(links, "dst", "anchor", k=3)
        .orderBy("dst", "rank")
    )


def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 X62: asymmetric containment join
    (operators/containment.py) — corpus = 60 documents plus 20 planted
    snippets (each the first 8 tokens of its source doc, id + 10000),
    every ordered pair with bigram-set containment ≥ 0.75.  The DuckDB
    oracle is BRUTE-FORCE all-pairs over the same construction, so
    parity proves the prefix-filtered plan lossless on real data.
    UNREGISTERED; parity in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.containment import containment_pairs

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.filter(F.col("doc_id") < 60)
    snippets = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, 8), " ").alias("text"),
    )
    corpus = base.unionByName(snippets)
    return (
        containment_pairs(corpus, "doc_id", "text", 0.75, n=2)
        .select(
            F.col("containee_id").cast("long").alias("containee_id"),
            F.col("container_id").cast("long").alias("container_id"),
            "containment",
        )
        .orderBy("containee_id", "container_id")
    )


def q_dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 X63: survivor provenance rollup
    (operators/dedup_clusters.py survivor_provenance) over a planted
    pair graph — doc i pairs with doc i+250 (components of exactly
    two), the rollup unions each cluster's sources and spans its
    n_chars.  The DuckDB oracle derives components straight from the
    construction (doc_id % 250 — ground truth, independent of the
    label-propagation code).  UNREGISTERED; parity in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.dedup_clusters import (
        dedup_decision,
        survivor_provenance,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).filter(F.col("doc_id") < 500)
    pairs = docs.filter(F.col("doc_id") < 250).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + 250).alias("id_b"),
    )
    decision = dedup_decision(docs, pairs, "doc_id")
    prov = survivor_provenance(
        docs, decision, "doc_id",
        collect_cols=["source"], range_col="n_chars",
    )
    return prov.select(
        F.col("component").cast("long").alias("component"),
        F.col("survivor_doc_id").cast("long").alias("survivor_doc_id"),
        "n_members",
        F.array_join("source_set", ",").alias("source_set"),
        F.col("first_n_chars").cast("long").alias("first_n_chars"),
        F.col("last_n_chars").cast("long").alias("last_n_chars"),
    ).orderBy("component")


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-11 X61: politeness-aware crawl-frontier scheduling
    (operators/frontier.py) — each source plays a host, n_chars plays
    the priority, at most 20 URLs per host per round, a 3-round
    horizon (beyond it: loud NULL).  UNREGISTERED; the DuckDB oracle
    replays the whole schedule via ROW_NUMBER in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.frontier import frontier_schedule

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        F.col("n_chars").cast("double").alias("priority"),
    )
    return (
        frontier_schedule(
            docs, "host", "priority", "doc_id",
            per_host_per_round=20, max_rounds=3,
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "host",
            "crawl_round",
        )
        .orderBy("host", "crawl_round", "doc_id")
    )


def q_filter_disallowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 robots/blocklist exclusion (operators/urls.py
    filter_disallowed — VERDICT r11 missing #3): synthetic per-source
    URLs split against a three-rule zoo — a whole-host block
    (src1.example.com), a path-prefix block (src2.example.com/0), and
    a dot-anchored suffix block on one path segment across every host
    (.example.com/3).  UNREGISTERED; the DuckDB oracle replays the
    host/prefix predicates literally in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.urls import (
        filter_disallowed,
        parse_disallow_rules,
    )

    urls = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/"),
            F.pmod("doc_id", F.lit(4)), F.lit("/p"), F.col("doc_id"),
        ).alias("url"),
    )
    rules = parse_disallow_rules(spark, [
        "# blocklist zoo",
        "src1.example.com",
        "src2.example.com/0",
        ".example.com/3",
    ])
    allowed, blocked = filter_disallowed(urls, rules, url_col="url")
    return (
        allowed.withColumn("status", F.lit("allowed"))
        .unionByName(blocked.withColumn("status", F.lit("blocked")))
        .orderBy("doc_id")
    )


# sf_dirs whose q_phrase_search index is already built this process
_PHRASE_IDX_BUILT: set[str] = set()


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-10 X54 phrase form: exact-phrase retrieval through the
    positional inverted index — top-25 docs containing the consecutive
    bigram "the fast", OVERLAPPING occurrences counted.  The DuckDB
    oracle derives counts straight from the token arrays (ground truth
    by construction — adjacency scan, independent of the index's
    positional fold).  UNREGISTERED; parity in
    tests/test_oracle_parity.py.

    The index lives at ONE deterministic temp path per sf_dir, built at
    most once per process (ADVICE r10 #4: a fresh mkdtemp per invocation
    leaked a populated index dir every parity/bench run; the returned
    DataFrame reads the index lazily, so the dir cannot be removed
    before the caller collects — caching is the fix, and build()
    overwrites, so a stale dir from a crashed prior process is replaced,
    never accumulated)."""
    import hashlib
    import tempfile

    from covid19i2b2_spark.operators.inverted_index import InvertedIndex

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tag = hashlib.md5(sf_dir.encode("utf-8")).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/q_phrase_idx_{tag}"
    idx = InvertedIndex(path)
    if path not in _PHRASE_IDX_BUILT:
        idx.build(docs, "doc_id", "text")
        _PHRASE_IDX_BUILT.add(path)
    return (
        idx.phrase_search(spark, ["the", "fast"], k=25)
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                "n_occurrences")
        .orderBy(F.col("n_occurrences").desc(), "doc_id")
    )


def q_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 X70 spider-trap detection (operators/traps.py):
    synthetic per-doc URLs cycling through six shapes — clean, a
    repeated-segment loop, a calendar run, a session-id query, a
    repeated query key, and a 17-deep path — flagged by mark_traps.
    UNREGISTERED (the 50-query window is full); the DuckDB oracle
    RE-DERIVES every reason from the URL string with list functions
    (not a constant replay) in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.traps import mark_traps

    deep = "/".join(f"s{i}" for i in range(17))
    shape = F.pmod("doc_id", F.lit(6)).cast("int")
    url = F.concat(
        F.lit("http://"), F.col("source"), F.lit(".example.com"),
        F.when(shape == 0, F.concat(F.lit("/p"), F.col("doc_id")))
        .when(shape == 1, F.lit("/a/b/a/b/a"))
        .when(shape == 2, F.lit("/2026/08/16/2026/08/17/2026"))
        .when(shape == 3,
              F.concat(F.lit("/p?phpsessid="), F.col("doc_id")))
        .when(shape == 4, F.lit("/p?x=1&x=2&x=3"))
        .otherwise(F.lit("/" + deep)),
    )
    urls = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), url.alias("url")
    )
    return (
        mark_traps(urls, "url")
        .select(
            "doc_id",
            F.array_join("trap_reasons", ",").alias("reasons"),
            "is_trap",
        )
        .orderBy("doc_id")
    )


@query(
    "q_recrawl_schedule",
    oracle="""
    WITH hist AS (
        SELECT 'http://h.example.com/p' || CAST(user_id % 40 AS VARCHAR)
                   AS url,
               ts AS fetch_time,
               CAST(CAST(FLOOR(value) AS BIGINT) % 3 AS VARCHAR)
                   AS content_fp
        FROM events
    ),
    lagged AS (
        SELECT url, fetch_time, content_fp,
               LAG(content_fp) OVER w AS prev_fp,
               LAG(fetch_time) OVER w AS prev_ts
        FROM hist
        WINDOW w AS (PARTITION BY url ORDER BY fetch_time, content_fp)
    ),
    agg AS (
        SELECT url,
               COUNT(*) AS n_fetches,
               COUNT(*) - 1 AS n_intervals,
               CAST(COALESCE(SUM(CASE WHEN prev_ts IS NOT NULL
                                  AND content_fp IS DISTINCT FROM prev_fp
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_changes,
               date_diff('microsecond', MIN(fetch_time),
                         MAX(fetch_time)) AS span_us,
               CAST(date_diff('microsecond', TIMESTAMP '1970-01-01',
                              MAX(fetch_time)) AS DOUBLE)
                   / 1000000.0 AS last_epoch,
               CAST(date_diff('microsecond', TIMESTAMP '1970-01-01',
                              MIN(fetch_time)) AS DOUBLE)
                   / 1000000.0 AS first_epoch
        FROM lagged
        GROUP BY url
    ),
    est AS (
        SELECT *,
               last_epoch - first_epoch AS span_sec,
               CASE WHEN n_intervals >= 2
                     AND (last_epoch - first_epoch) > 0 THEN
                   -LN((n_intervals - n_changes + 0.5)
                       / (n_intervals + 0.5))
                   / ((last_epoch - first_epoch) / n_intervals)
               END AS lambda_hat
        FROM agg
    ),
    sched AS (
        SELECT *,
               CASE WHEN lambda_hat > 0 THEN
                        LEAST(GREATEST(0.6931471805599453 / lambda_hat,
                                       3600.0),
                              2592000.0)
                    WHEN lambda_hat IS NOT NULL THEN 2592000.0
               END AS revisit_sec
        FROM est
    )
    SELECT url, n_fetches, n_intervals, n_changes,
           span_us,
           {q_lambda} AS lambda_per_day_micro,
           {q_revisit} AS revisit_sec_w,
           {q_due} AS due_epoch_w
    FROM sched
    ORDER BY url
    """.format(
        q_lambda=QFIX_SQL.format(x="lambda_hat * 86400.0", s=10**6),
        q_revisit=QFIX0_SQL.format(x="revisit_sec"),
        q_due=QFIX0_SQL.format(x="last_epoch + revisit_sec"),
    ),
)
def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 X71 re-crawl scheduling (operators/recrawl.py): a
    fetch history derived from events (url = user_id % 40, fingerprint
    = floor(value) % 3) through the Cho–Garcia-Molina change-rate
    estimator and the -ln(1-p)/λ̂ revisit policy.  REGISTERED round 12
    (slot ceded by q_simhash_pairs, which moved to the UNREGISTERED
    parity suite — the q_dsir_select/q_ngram_jaccard protocol); the
    DuckDB oracle replays the FULL estimator — LAG window, null-safe
    change count, LN arithmetic, clamps.

    r13 output contract (VERDICT r12 #1): every float column is
    emitted as a fixed-point BIGINT (qfix) — span as exact
    microseconds, λ·86400 on a 1e-6 grid, revisit/due on whole
    seconds.  r12 used F.round/ROUND, which diverged on the driver's
    engine builds (Spark rounds the shortest-decimal repr, DuckDB the
    exact binary; a 1-ulp LN difference then flips a cell).  Integer
    grids only flip when the true value sits ~1 ulp from a grid
    boundary (~1e-10/cell), and the oracle pins -LN(0.5) to the same
    literal Python's math.log produces so the only residual libm ulp
    source is the estimator's own LN."""
    from covid19i2b2_spark.operators.aggregates import qfix
    from covid19i2b2_spark.operators.recrawl import estimate_change_rates

    hist = read_table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("http://h.example.com/p"),
            F.pmod("user_id", F.lit(40)).cast("string"),
        ).alias("url"),
        F.col("ts").alias("fetch_time"),
        F.pmod(F.floor("value"), F.lit(3)).cast("string").alias("content_fp"),
    )
    out = estimate_change_rates(
        hist,
        change_prob=0.5,
        min_interval_sec=3600.0,
        max_interval_sec=30.0 * 86400.0,
    )

    def us(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    return out.select(
        "url",
        "n_fetches",
        "n_intervals",
        "n_changes",
        (us("last_fetch") - us("first_fetch")).alias("span_us"),
        qfix(F.col("lambda_hat") * 86400.0, 6).alias(
            "lambda_per_day_micro"
        ),
        qfix(F.col("revisit_sec"), 0).alias("revisit_sec_w"),
        qfix(
            us("last_fetch") / F.lit(1000000.0) + F.col("revisit_sec"), 0
        ).alias("due_epoch_w"),
    ).orderBy("url")


def q_url_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 X72 URL-template mining (operators/url_templates.py):
    five URL shapes per doc (an exploding /item/{N}, a static /about,
    a nested /post/{N}/comments, a ?page&sort key set, a 32-hex {H}
    id) over three hosts, mined to per-template cardinality and host
    share.  UNREGISTERED (the 50-query window is full); the DuckDB
    oracle RE-DERIVES the template from the URL string (regexp folds +
    sorted key set) and replays the share arithmetic in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.url_templates import (
        mine_url_templates,
    )

    shape = F.pmod("doc_id", F.lit(5)).cast("int")
    url = F.concat(
        F.lit("http://h"),
        F.pmod("doc_id", F.lit(3)).cast("string"),
        F.lit(".example.com"),
        F.when(shape == 0, F.concat(F.lit("/item/"), F.col("doc_id")))
        .when(shape == 1, F.lit("/about"))
        .when(
            shape == 2,
            F.concat(F.lit("/post/"), F.col("doc_id"), F.lit("/comments")),
        )
        .when(
            shape == 3,
            F.concat(
                F.lit("/p?page="), F.col("doc_id"), F.lit("&sort=asc")
            ),
        )
        .otherwise(
            F.concat(F.lit("/d/"), F.md5(F.col("doc_id").cast("string")))
        ),
    )
    urls = read_table(spark, sf_dir, "documents").select(url.alias("u"))
    return (
        mine_url_templates(urls, "u")
        .select(
            "host",
            "template",
            "n_urls",
            "sample_url",
            "host_urls",
            roundk(F.col("host_share"), 6).alias("host_share"),
        )
        .orderBy("template")
    )


def q_dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 X73 DUST parameter-rule mining (operators/dust.py):
    urls = host(doc_id%2) / page(doc_id%3) ? id=(doc_id%5) &
    ref=(doc_id%4), fingerprint = md5(page|id) — so varying ``ref``
    never changes content (a rule) while varying ``id`` always does
    (never a rule); the moduli are chosen so every residual group
    really contains multiple spellings.  UNREGISTERED (the 50-query
    window is full); the DuckDB oracle replays the FULL mining —
    unnest over keys, residual reconstruction, the min=max
    consistency trick, both aggregates — in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.dust import mine_param_rules

    url = F.concat(
        F.lit("http://h"),
        F.pmod("doc_id", F.lit(2)).cast("string"),
        F.lit(".example.com/page"),
        F.pmod("doc_id", F.lit(3)).cast("string"),
        F.lit("?id="),
        F.pmod("doc_id", F.lit(5)).cast("string"),
        F.lit("&ref="),
        F.pmod("doc_id", F.lit(4)).cast("string"),
    )
    fp = F.md5(
        F.concat(
            F.pmod("doc_id", F.lit(3)).cast("string"),
            F.lit("|"),
            F.pmod("doc_id", F.lit(5)).cast("string"),
        )
    )
    pages = (
        read_table(spark, sf_dir, "documents")
        .select(url.alias("canonical_url"), fp.alias("content_fp"))
        .distinct()
    )
    return (
        mine_param_rules(pages, min_support=5, min_consistency=1.0)
        .select(
            "host",
            "param_key",
            "n_groups",
            "n_consistent",
            roundk(F.col("consistency"), 6).alias("consistency"),
            "is_rule",
        )
        .orderBy("host", "param_key")
    )


def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 X81 reciprocal-rank fusion (operators/fusion.py): two
    overlapping pseudo-retrieval lists over documents (deterministic
    modular scores, ranked per list) fused with k=60.  UNREGISTERED
    (the 50-query window is full); the DuckDB oracle replays the FULL
    fusion — both ROW_NUMBER rankings with the same tie rule and the
    1/(k+rank) sum — in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.fusion import rank_by_score, rrf_fuse

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    lex = docs.filter(F.col("doc_id") < 30).select(
        "doc_id",
        F.pmod(F.col("doc_id") * 37, F.lit(101)).cast("double").alias("s"),
    )
    vec = docs.filter(
        (F.col("doc_id") >= 15) & (F.col("doc_id") < 45)
    ).select(
        "doc_id",
        F.pmod(F.col("doc_id") * 53, F.lit(97)).cast("double").alias("s"),
    )
    fused = rrf_fuse(
        [
            rank_by_score(lex, "doc_id", "s"),
            rank_by_score(vec, "doc_id", "s"),
        ],
        k=60,
    )
    return fused.select(
        "id",
        roundk(F.col("rrf_score"), 9).alias("rrf_score"),
        "n_lists",
    ).orderBy(F.col("rrf_score").desc(), "id")


def q_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 X82 redirect resolution (operators/redirects.py):
    per-block chains from documents (u_d → u_{d-1} except block heads,
    so every chain ends at a u_{10k} terminal in ≤ 9 hops) plus one
    planted 2-cycle — pointer-doubled to finals.  n_hops is reported
    only for resolved rows (inside a cycle the doubled hop count is an
    artifact of the contraction, not a chain length).  UNREGISTERED
    (the 50-query window is full); the DuckDB oracle follows the SAME
    graph with a recursive CTE + hop cap in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.redirects import resolve_redirects

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    chain = docs.filter(F.pmod("doc_id", F.lit(10)) != 0).select(
        F.concat(F.lit("http://r.com/u"), F.col("doc_id")).alias("src"),
        F.concat(
            F.lit("http://r.com/u"), F.col("doc_id") - F.lit(1)
        ).alias("dst"),
    )
    cyc = spark.createDataFrame(
        [
            ("http://r.com/cycA", "http://r.com/cycB"),
            ("http://r.com/cycB", "http://r.com/cycA"),
        ],
        "src string, dst string",
    )
    out = resolve_redirects(chain.unionByName(cyc), max_hops=32)
    return out.select(
        "src",
        "final_url",
        "resolved",
        F.when(F.col("resolved"), F.col("n_hops")).alias("n_hops"),
    ).orderBy("src")


def q_crawl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-12 X85 crawl health report (operators/crawl_report.py):
    synthetic fetch records from events (5 hosts, status/content-type
    cycling on event_id, value-derived payload sizes) rolled up per
    host.  UNREGISTERED (the 50-query window is full); the DuckDB
    oracle replays the host extraction and the full conditional
    aggregation in tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.crawl_report import (
        crawl_health_report,
    )

    m = F.pmod("event_id", F.lit(10)).cast("int")
    recs = read_table(spark, sf_dir, "events").select(
        F.concat(
            F.lit("http://h"),
            F.pmod("user_id", F.lit(5)).cast("string"),
            F.lit(".example.com/p"),
            F.col("event_id").cast("string"),
        ).alias("target_uri"),
        F.when(m <= 5, F.lit(200))
        .when(m == 6, F.lit(301))
        .when(m == 7, F.lit(404))
        .when(m == 8, F.lit(503))
        .otherwise(F.lit(200))
        .alias("http_status"),
        F.when(m <= 5, F.lit("text/html; charset=utf-8"))
        .when(m == 9, F.lit("application/json"))
        .alias("http_content_type"),
        F.floor(F.col("value") * 10).cast("long").alias("payload_length"),
        (F.pmod("event_id", F.lit(13)) == 0).alias("is_truncated"),
    )
    rep = crawl_health_report(recs)
    return rep.select(
        "host",
        "n_fetches",
        "n_ok",
        "n_redirect",
        "n_client_err",
        "n_server_err",
        "n_html",
        "n_truncated",
        "total_payload_bytes",
        roundk(F.col("ok_rate"), 6).alias("ok_rate"),
        roundk(F.col("server_err_rate"), 6).alias("server_err_rate"),
        roundk(F.col("avg_payload_bytes"), 3).alias("avg_payload_bytes"),
    ).orderBy("host")


# X4' trained language ID (round 13): five-language seed + held-out
# fixture sentences, shared verbatim with the DuckDB oracle (the
# oracle RE-TRAINS the profiles and RE-SCORES every document in SQL).
_LANG_SEED = {
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und die "
        "katze schläft auf der warmen matte während die kinder am abend "
        "ihre bücher lesen und der alte mann über die strasse geht"
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog and the cat sleeps "
        "on the warm mat while the children read their books in the "
        "quiet evening and the old man walks across the street"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y el gato "
        "duerme sobre la alfombra caliente mientras los niños leen sus "
        "libros por la noche y el hombre viejo cruza la calle"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et le "
        "chat dort sur le tapis chaud pendant que les enfants lisent "
        "leurs livres le soir et le vieil homme traverse la rue"
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro e il gatto "
        "dorme sul tappeto caldo mentre i bambini leggono i loro libri "
        "la sera e il vecchio uomo attraversa la strada"
    ),
}
_LANG_TEST = {
    "de": (
        "ein kleiner junge geht mit seinem freund zur schule und sie "
        "sprechen über das spiel das sie gestern gespielt haben"
    ),
    "en": (
        "a small boy walks to the school with his friend and they talk "
        "about the game they played yesterday"
    ),
    "es": (
        "un niño pequeño camina a la escuela con su amigo y hablan del "
        "juego que jugaron ayer"
    ),
    "fr": (
        "un petit garçon marche vers l école avec son ami et ils parlent "
        "du jeu auquel ils ont joué hier"
    ),
    "it": (
        "un bambino piccolo cammina a scuola con il suo amico e parlano "
        "del gioco che hanno giocato ieri"
    ),
}
_LANG_TOP_K = 120
_LANG_MAX_CHARS = 120


def _lang_id_oracle() -> str:
    """X4' trained language ID: the oracle RE-TRAINS the char-bigram
    profiles (counts, per-lang totals, top-K cut, the shared-OOV
    advantage in MICROunit fixed point — coarse enough that a
    cross-build LN ulp is ~1e-9 of a cell) and RE-SCORES every planted
    document (bigram explode, profile join, BIGINT sums, argmax with
    the lang tie rule) from the same fixture strings the query uses —
    nothing is replayed as constants."""
    seed_vals = ",\n        ".join(
        f"('{l}', '{t}')" for l, t in sorted(_LANG_SEED.items())
    )
    when_text = "\n               ".join(
        f"WHEN {i} THEN '{_LANG_TEST[l]}' || ' ' || "
        f"substr('{_LANG_TEST[l]}', 1, CAST(doc_id % 40 AS INT))"
        for i, l in enumerate(sorted(_LANG_TEST))
    )
    k, mc = _LANG_TOP_K, _LANG_MAX_CHARS
    v = k + 1
    return f"""
    WITH seed(lang, text) AS (VALUES {seed_vals}),
    sp AS (SELECT lang,
                  ' ' || trim(regexp_replace(lower(text),
                                             '[^\\p{{L}}]+', ' ', 'g'))
                      || ' ' AS p
           FROM seed),
    sg AS (SELECT lang,
                  unnest([p[i:i+1] FOR i IN range(1, length(p))]) AS gram
           FROM sp),
    counts AS (SELECT lang, gram, COUNT(*) AS c FROM sg GROUP BY 1, 2),
    tots AS (SELECT lang, gram, c,
                    SUM(c) OVER (PARTITION BY lang) AS tot
             FROM counts),
    ranked AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY lang
                                         ORDER BY c DESC, gram) AS rk
               FROM tots),
    kept AS (SELECT * FROM ranked WHERE rk <= {k}),
    m AS (SELECT MAX(tot) AS tot_max FROM kept),
    prof AS (SELECT lang, gram,
                    CAST(FLOOR((LN((c + 1.0) / (tot + {v}.0))
                                + LN(tot_max + {v}.0))
                               * 1000000.0 + 0.5) AS BIGINT)
                        AS adv_fix
             FROM kept, m),
    docs AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                    CASE CAST(doc_id % 6 AS INT)
               {when_text}
                    ELSE '123 --- 456' END AS text
             FROM documents),
    dn AS (SELECT doc_id,
                  ' ' || trim(regexp_replace(lower(substr(text, 1, {mc})),
                                             '[^\\p{{L}}]+', ' ', 'g'))
                      || ' ' AS p
           FROM docs),
    dg AS (SELECT doc_id,
                  unnest(CASE WHEN length(p) <= 2 THEN []
                              ELSE [p[i:i+1]
                                    FOR i IN range(1, length(p))]
                         END) AS gram
           FROM dn),
    sc AS (SELECT doc_id, lang, SUM(adv_fix) AS adv
           FROM dg JOIN prof USING (gram) GROUP BY 1, 2),
    best AS (SELECT doc_id, lang, adv,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY adv DESC, lang) AS rk
             FROM sc)
    SELECT d.doc_id,
           COALESCE(b.lang, 'und') AS lang,
           FLOOR(CAST(b.adv AS DOUBLE) / 1000000.0
                 * 1000000.0 + 0.5) / 1000000.0 AS lang_lm_adv
    FROM docs d
    LEFT JOIN (SELECT * FROM best WHERE rk = 1) b USING (doc_id)
    ORDER BY d.doc_id
    """


@query("q_lang_id", oracle=_lang_id_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 X4' trained language ID (operators/lang_id.py —
    VERDICT r12 missing #2): char-bigram profiles trained on the
    five-language _LANG_SEED, classifying per-doc text planted from
    _LANG_TEST (doc_id % 6 cycles the five languages plus one
    letterless shape that must classify 'und'), with a per-doc
    length-varying suffix (substr of the sentence, doc_id % 40 chars)
    so the fixed-point sums differ across docs, and max_chars=120 so
    the truncation path is exercised too.  REGISTERED round 14
    (VERDICT r13 #1, slot ceded by q_fingerprint): the DuckDB oracle
    RE-TRAINS the profiles (bigram counts, top-K cut, shared-OOV
    advantage) and RE-SCORES every doc (broadcast join, BIGINT
    microunit sums, argmax with the lang tie rule).  The coverage/
    fallback gate is pytest-pinned in tests/test_lang_id.py (vs a
    pure-Python replay)."""
    from covid19i2b2_spark.operators.lang_id import (
        classify_language,
        train_lang_profiles,
    )

    # seed passed as Python pairs: training runs entirely on the driver
    # (round 15 — a DataFrame seed would cost a limit().collect() round
    # trip per call for identical profiles; equality of the two paths
    # is pinned in tests/test_lang_id.py)
    prof = train_lang_profiles(
        sorted(_LANG_SEED.items()), top_k=_LANG_TOP_K
    )
    shape = F.pmod("doc_id", F.lit(6)).cast("int")
    suffix_len = F.pmod("doc_id", F.lit(40)).cast("int")
    text = F.when(shape == 5, F.lit("123 --- 456"))
    for i, lang in enumerate(sorted(_LANG_TEST)):
        s = _LANG_TEST[lang]
        text = text.when(
            shape == i,
            F.concat(
                F.lit(s + " "),
                F.substring(F.lit(s), F.lit(1), suffix_len),
            ),
        )
    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), text.alias("text")
    )
    # attach=False (round 15): the output needs only the verdict, so
    # the explode_outer-covered per-id aggregate IS the result — no
    # second documents scan + shuffle/sort pair to re-attach payload
    # columns nothing selects (plans/r15/q_lang_id_{before,after}.txt:
    # SortMergeJoin LeftOuter eliminated).
    out = classify_language(
        docs, "doc_id", "text", prof, max_chars=_LANG_MAX_CHARS,
        attach=False,
    )
    return out.select("doc_id", "lang", "lang_lm_adv").orderBy("doc_id")


@query(
    "q_suffix_array",
    # The oracle sorts the ACTUAL SUFFIX STRINGS — the definitional
    # order the prefix-doubling construction must reproduce rank for
    # rank.  Float-free by construction (string sort + ROW_NUMBER).
    oracle="""
    WITH docs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc,
               substr(text, 1, 40) AS t
        FROM documents
        WHERE doc_id < 60 AND length(substr(text, 1, 40)) > 0
    ),
    sufs AS (
        SELECT doc,
               unnest(range(1, length(t) + 1)) AS pos,
               unnest([t[CAST(i AS INT):]
                       FOR i IN range(1, length(t) + 1)]) AS suf
        FROM docs
    )
    SELECT doc, pos,
           ROW_NUMBER() OVER (ORDER BY suf, doc, pos) - 1 AS sa_rank
    FROM sufs
    ORDER BY doc, pos
    """,
)
def q_suffix_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 X88 distributed suffix array (operators/suffixes.py):
    the global suffix order over 40-char prefixes of the first 60
    documents, built by prefix doubling (codepoint rank_0 → dense rank
    of rank pairs per round, -1 sentinel past doc end — the order of
    plain string comparison).  REGISTERED round 14 (VERDICT r13 #1,
    slot ceded by q_embedding_near_dup): the DuckDB oracle sorts the
    ACTUAL SUFFIX STRINGS (`ORDER BY substr(t, pos), doc, pos`) — the
    strongest possible check: the log-rounds distributed construction
    must reproduce the definitionally-correct order exactly, rank for
    rank."""
    from covid19i2b2_spark.operators.suffixes import suffix_array

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select(
            F.col("doc_id").cast("long").alias("doc"),
            F.substring("text", 1, 40).alias("t"),
        )
    )
    return suffix_array(docs, "doc", "t", max_prefix_len=64).orderBy(
        "doc", "pos"
    )


def q_dup_spans_sa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 X88 exact any-length duplicated spans: 30-char document
    prefixes, every third doc carrying a planted 27-char shared
    passage, scanned for duplicated 19-char windows (19 is not a power
    of two — the two-overlapping-rank trick is on the hook) merged to
    maximal spans.  Natural cross-doc repeats in the synthetic prefixes
    count too — the oracle recomputes from scratch, not from the
    plant.  UNREGISTERED; the DuckDB oracle brute-forces EVERY 19-char
    window (group-count, threshold, lag/sum run merge) in
    tests/test_oracle_parity.py."""
    from covid19i2b2_spark.operators.suffixes import duplicated_spans_exact

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 90)
        .select(
            F.col("doc_id").cast("long").alias("doc"),
            F.concat(
                F.substring("text", 1, 30),
                F.when(
                    F.pmod("doc_id", F.lit(3)) == 0,
                    F.lit(" planted shared passage xyz"),
                ).otherwise(F.lit("")),
            ).alias("t"),
        )
    )
    return duplicated_spans_exact(docs, "doc", "t", 19).orderBy(
        "doc", "span_start"
    )


@query(
    "q_license_extract",
    # The oracle derives each doc's EXPECTED evidence from the
    # construction rules (doc_id % 6 picks the planted HTML shape) —
    # the q_url_dedup adjudication style for HTML-parsing operators;
    # the regex zoo itself is pinned element-by-element in
    # tests/test_licenses.py.  Moved verbatim from
    # UNREGISTERED_ORACLES on registration (round 15).
    oracle="""
    WITH docs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(doc_id % 6 AS INT) AS s,
               CAST(doc_id % 7 AS VARCHAR) AS h
        FROM documents
    )
    SELECT doc_id,
           CASE s
             WHEN 0 THEN 'http://h' || h || '.com/terms'
                         || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN 'https://creativecommons.org/licenses/by/4.0/'
             WHEN 2 THEN 'https://creativecommons.org/licenses/by-sa/3.0/'
             WHEN 3 THEN 'http://h' || h || '.com/terms'
                         || CAST(doc_id AS VARCHAR)
             WHEN 4 THEN 'http://h' || h || '.com/a/t'
             ELSE NULL END AS license_url,
           CASE s WHEN 0 THEN 'rel' WHEN 1 THEN 'rel'
                  WHEN 2 THEN 'cc-href' WHEN 3 THEN 'rel'
                  WHEN 4 THEN 'rel' ELSE NULL END AS license_source,
           CASE s WHEN 1 THEN 'CC-BY-4.0'
                  WHEN 2 THEN 'CC-BY-SA-3.0'
                  ELSE NULL END AS license_id
    FROM docs ORDER BY doc_id
    """,
)
def q_license_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 X89 license/attribution extraction
    (operators/licenses.py — VERDICT r13 missing #3): pages
    synthesized from documents where doc_id % 6 picks the evidence
    shape (plain rel=license to an own-terms path; a rel token list
    pointing at CC-BY-4.0; a bare badge href to CC-BY-SA-3.0; BOTH
    channels with rel outranking the badge; a relative rel href
    exercising RFC 3986 resolution; a licenseless page), classified by
    extract_licenses.  REGISTERED round 15 (slot ceded by
    q_semantic_dedup per the cession protocol); the DuckDB oracle
    derives each doc's EXPECTED (license_url, license_source,
    license_id) from the same construction rules."""
    from covid19i2b2_spark.operators.licenses import extract_licenses

    shape = F.pmod("doc_id", F.lit(6)).cast("int")
    url = F.concat(
        F.lit("http://h"),
        F.pmod("doc_id", F.lit(7)).cast("string"),
        F.lit(".com/a/b/p"),
        F.col("doc_id").cast("string"),
    )
    own = F.concat(
        F.lit("<link rel='license' href='/terms"),
        F.col("doc_id").cast("string"),
        F.lit("'>"),
    )
    cc_by = F.lit(
        "<a rel=\"license nofollow\" "
        "href=\"https://creativecommons.org/licenses/by/4.0/\">cc</a>"
    )
    badge = F.lit(
        "<a href='https://creativecommons.org/licenses/by-sa/3.0/'>"
        "<img src='b.png'></a>"
    )
    rel_up = F.lit("<link rel=license href=../t>")
    html = (
        F.when(shape == 0, own)
        .when(shape == 1, cc_by)
        .when(shape == 2, badge)
        .when(shape == 3, F.concat(own, badge))
        .when(shape == 4, rel_up)
        .otherwise(F.lit("<p>plain page</p>"))
    )
    pages = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        url.alias("url"),
        html.alias("html"),
    )
    return (
        extract_licenses(pages)
        .select("doc_id", "license_url", "license_source", "license_id")
        .orderBy("doc_id")
    )


@query(
    "q_exact_substr_dedup",
    # Brute-force replay of both halves: re-derive the duplicated
    # 19-char windows, expand to covered character positions, rebuild
    # each doc's kept text from the uncovered characters.
    oracle="""
    WITH docs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               substr(text, 1, 30)
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' planted shared passage xyz'
                           ELSE '' END AS t
        FROM documents
        WHERE doc_id < 90
    ),
    wins AS (
        SELECT doc_id,
               unnest(range(1, CAST(greatest(length(t) - 19 + 2, 1)
                                    AS BIGINT))) AS pos,
               unnest([t[CAST(i AS INT):CAST(i + 18 AS INT)]
                       FOR i IN range(1, CAST(greatest(length(t) - 19
                                                       + 2, 1)
                                              AS BIGINT))]) AS w
        FROM docs
    ),
    dupw AS (SELECT w FROM wins GROUP BY w HAVING COUNT(*) >= 2),
    dstart AS (SELECT doc_id, pos FROM wins JOIN dupw USING (w)),
    covered AS (
        SELECT DISTINCT doc_id, pos + k AS cp
        FROM dstart, (SELECT unnest(range(0, 19)) AS k)
    ),
    chars AS (
        SELECT doc_id,
               unnest(range(1, length(t) + 1)) AS p,
               unnest([t[CAST(i AS INT):CAST(i AS INT)]
                       FOR i IN range(1, length(t) + 1)]) AS ch
        FROM docs
    ),
    kept AS (
        SELECT c.doc_id, string_agg(c.ch, '' ORDER BY c.p) AS txt
        FROM chars c
        LEFT JOIN covered v ON c.doc_id = v.doc_id AND c.p = v.cp
        WHERE v.cp IS NULL
        GROUP BY c.doc_id
    )
    SELECT d.doc_id, COALESCE(k.txt, '') AS text_dedup
    FROM docs d LEFT JOIN kept k USING (doc_id)
    ORDER BY d.doc_id
    """,
)
def q_exact_substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 X90 exact-substring dedup (operators/suffixes.py
    exact_substring_dedup — Lee et al. 2022 ExactSubstr): the
    q_dup_spans_sa corpus (30-char prefixes, every third doc carrying
    the planted 27-char passage) with EVERY duplicated 19-char span
    cut from EVERY carrier.  REGISTERED round 15 (VERDICT r14 next #5,
    slot ceded by q_scalar_funcs): the DuckDB oracle re-derives the
    duplicated windows BRUTE-FORCE, expands them to covered character
    positions, and rebuilds each doc's kept text character by
    character (string_agg over uncovered positions) — a fully
    independent replay of both the span finding and the surgery."""
    from covid19i2b2_spark.operators.suffixes import (
        exact_substring_dedup,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 90)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.concat(
                F.substring("text", 1, 30),
                F.when(
                    F.pmod("doc_id", F.lit(3)) == 0,
                    F.lit(" planted shared passage xyz"),
                ).otherwise(F.lit("")),
            ).alias("t"),
        )
    )
    return (
        exact_substring_dedup(docs, "doc_id", "t", 19)
        .select("doc_id", "text_dedup")
        .orderBy("doc_id")
    )


def q_media_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-15 X92 media perceptual signatures
    (operators/media_dedup.py media_blockhash — VERDICT r14 next #4):
    documents become fake media payloads (utf-8 bytes of the text, the
    X5 attach_fake_media convention), signed with the blockhash/dHash
    64-bit signature via the Arrow KERNEL path.  UNREGISTERED; the
    DuckDB oracle recomputes the identical integer arithmetic from the
    characters (the corpus is printable ASCII, so utf-8 byte == ord):
    block of byte i = i*65 // n, per-block sums, cross-multiplied
    adjacent comparisons, HUGEINT bit fold with the signed bit-63
    wrap — a full independent replay of the signature math."""
    from covid19i2b2_spark.operators.media_dedup import media_blockhash
    from covid19i2b2_spark.operators.multimodal import attach_fake_media

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    media = attach_fake_media(docs, "doc_id", "text")
    return (
        media_blockhash(media, "media_id", "payload", impl="kernel")
        .select(F.col("media_id").alias("doc_id"), "phash")
        .orderBy("doc_id")
    )
