"""t2 queries: training-data-pipeline extensions (SURVEY.md §2.11) —
dedup, similarity search, text analysis, multimodal plumbing, JSON."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators import similarity as sim
from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    simhash,
)
from covid19i2b2_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    frame_sample,
)
from covid19i2b2_spark.operators.text import (
    STOPWORDS,
    bpe_token_count,
    fingerprint,
    lang_guess,
    punct_count,
)
from covid19i2b2_spark.registry import query
from covid19i2b2_spark.sources.tables import read_table

_DUCK_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"
_DUCK_NTOK = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_DUCK_TOKENS}) END"


@query(
    "q_dedup_exact",
    oracle="""
    WITH doubled AS (
        SELECT doc_id, lang, text, 1 AS copy FROM documents
        UNION ALL
        SELECT doc_id, lang, text, 2 AS copy FROM documents
    ),
    kept AS (
        SELECT doc_id, lang, copy
        FROM (SELECT doc_id, lang, copy,
                     ROW_NUMBER() OVER (PARTITION BY text
                                        ORDER BY copy, doc_id) AS rn
              FROM doubled)
        WHERE rn = 1
    )
    SELECT lang, COUNT(*) AS n_docs, CAST(SUM(copy) AS BIGINT) AS sum_copy
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact dedup with a deterministic survivor.  The corpus is
    doubled (simulating a re-crawl) then deduped on text keeping the
    first copy; sum_copy == n_docs proves survivor selection, not just
    distinct-count."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    doubled = docs.withColumn("copy", F.lit(1)).unionByName(
        docs.withColumn("copy", F.lit(2))
    )
    kept = exact_dedup(doubled, ["text"], ["copy", "doc_id"])
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("copy").alias("sum_copy"))
        .orderBy("lang")
    )


# Round 14: slot ceded to q_lang_id (VERDICT r13 next-round #1) — the
# md5/regexp arithmetic stays verified via UNREGISTERED_ORACLES in
# tests/test_oracle_parity.py (oracle preserved verbatim there).
FINGERPRINT_ORACLE = """
    WITH fp AS (
        SELECT source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fingerprint
        FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT fingerprint) AS n_unique,
           MIN(fingerprint) AS min_fingerprint
    FROM fp GROUP BY source ORDER BY source
    """


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4: content fingerprinting — md5 over whitespace-normalized
    lowercase text; the exact-dedup key for crawled corpora.  min_
    fingerprint pins actual hash values, not just counts.

    Round 15: two-level aggregate.  A direct
    ``count_distinct + min(fingerprint)`` plan is a SortAggregate
    chain (a string MIN buffer is not hash-aggregable), so the whole
    corpus was sorted by (source, fingerprint) before the first
    partial aggregate.  Grouping to distinct (source, fingerprint)
    with a pure COUNT first keeps the full-data pass a HashAggregate;
    only the already-distinct fingerprint table (one row per distinct
    hash) pays the string-MIN SortAggregate.  ``count("fingerprint")``
    over the distinct rows equals COUNT(DISTINCT fingerprint) exactly
    (both skip NULLs); ``sum(n_dup)`` equals COUNT(*)."""
    docs = read_table(spark, sf_dir, "documents")
    fp = docs.select("source", fingerprint("text").alias("fingerprint"))
    per_fp = fp.groupBy("source", "fingerprint").agg(
        F.count("*").alias("n_dup")
    )
    return (
        per_fp.groupBy("source")
        .agg(
            F.sum("n_dup").alias("n_docs"),
            F.count("fingerprint").alias("n_unique"),
            F.min("fingerprint").alias("min_fingerprint"),
        )
        .orderBy("source")
    )


_STOP_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

_LANG_SCORE = {
    lang: f"""CASE WHEN trim(text) = '' THEN 0
              ELSE len(list_filter({_DUCK_TOKENS},
                   t -> list_contains([{", ".join(f"'{w}'" for w in ws)}], t))) END"""
    for lang, ws in STOPWORDS.items()
}


@query(
    "q_text_analysis",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_DUCK_NTOK} AS n_tokens,
               len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
               length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct,
               length(text) AS n_chars,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(list_filter({_DUCK_TOKENS},
                             t -> list_contains([{_STOP_EN}], t))) END AS stop_hits,
               {_LANG_SCORE['en']} AS s_en,
               {_LANG_SCORE['es']} AS s_es,
               {_LANG_SCORE['de']} AS s_de
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN GREATEST(s_en, s_es, s_de) = 0 THEN 'und'
                WHEN s_en = GREATEST(s_en, s_es, s_de) THEN 'en'
                WHEN s_es = GREATEST(s_en, s_es, s_de) THEN 'es'
                ELSE 'de' END AS lang_guess,
           n_tokens, n_bpe_tokens, n_punct, stop_hits,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE FLOOR((CAST(stop_hits AS DOUBLE) / n_tokens) * 1000000 + 0.5) / 1000000 END AS stop_ratio,
           FLOOR((
             (CASE WHEN n_tokens >= 10 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END)
             + (CASE WHEN (CASE WHEN n_chars = 0 THEN 1.0
                           ELSE CAST(n_punct AS DOUBLE) / n_chars END) < 0.1
                     THEN 0.3 ELSE 0.0 END)
             + (CASE WHEN (CASE WHEN n_tokens = 0 THEN 0.0
                           ELSE FLOOR((CAST(stop_hits AS DOUBLE) / n_tokens) * 1000000 + 0.5) / 1000000 END)
                          > 0.01
                     THEN 0.3 ELSE 0.0 END)) * 1000000 + 0.5) / 1000000 AS quality
    FROM scored ORDER BY doc_id
    """,
)
def q_text_analysis(
    spark: SparkSession, sf_dir: str, impl: str = "kernel"
) -> DataFrame:
    """X4: the per-document text-analysis surface in one slot — language
    ID (stopword-hit argmax, 'und' when no signal; tie-break en > es > de
    pinned in both engines), token counting (whitespace tokens + a
    BPE-ish pre-tokenizer regex: letter runs / digit runs / single
    symbols), and quality scoring (token-length band, punctuation
    density, stopword ratio — the crawl-filtering heuristics as one
    deterministic score).  Merges round-1's q_token_counts /
    q_text_quality / q_lang_id into one driver slot (50-query window,
    VERDICT r1 #1); the per-lang aggregate rollups they reported are
    derivable from these per-doc columns.

    ``impl="kernel"`` (default) computes every raw measure in ONE Arrow
    batch pass (text.text_measures_kernel — value-identical, verified
    against this expression path by test + the unchanged DuckDB
    oracle); ``impl="expr"`` keeps the pure-expression plan as the
    oracle mirror, tokenized ONCE into a projected column so every
    measure reads that array instead of re-splitting the text (~25%
    measured — see text.stopword_hits_in)."""
    from covid19i2b2_spark.operators.text import (
        STOPWORDS,
        lang_guess_scored,
        lang_scores_in,
        text_measures_kernel,
        tokens,
    )

    if impl not in ("expr", "kernel"):
        raise ValueError(f"impl must be 'expr' or 'kernel', got {impl!r}")
    docs = read_table(spark, sf_dir, "documents")
    lang_names = list(STOPWORDS)
    if impl == "kernel":
        scored = docs.select(
            "doc_id", "lang", "text", text_measures_kernel("text").alias("__m")
        ).select(
            "doc_id",
            "lang",
            "text",
            F.col("__m.n_tokens").alias("__nt"),
            F.col("__m.n_bpe_tokens").alias("__nbpe"),
            F.col("__m.n_punct").alias("__np"),
            *[F.col(f"__m.s_{lang}").alias(f"__s_{lang}") for lang in lang_names],
        )
    else:
        toked = docs.select(
            "doc_id", "lang", "text", tokens("text").alias("__toks")
        )
        scores = lang_scores_in(F.col("__toks"))
        scored = toked.select(
            "doc_id",
            "lang",
            "text",
            F.size("__toks").cast("long").alias("__nt"),
            bpe_token_count("text").cast("long").alias("__nbpe"),
            punct_count("text").cast("long").alias("__np"),
            *[
                s.cast("long").alias(f"__s_{lang}")
                for lang, s in scores.items()
            ],
        )
    n = F.col("__nt")
    stop_hits = F.col("__s_en")
    stop_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        round6(stop_hits.cast("double") / n)
    )
    nc = F.length("text")
    punct = F.col("__np")
    punct_density = F.when(nc == 0, F.lit(1.0)).otherwise(
        punct.cast("double") / nc
    )
    quality = round6(
        F.when((n >= 10) & (n <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(punct_density < 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    # kernel emits longs directly; the expr path casts (length/size are
    # int in Spark but BIGINT in DuckDB) — identical schemas either way
    return scored.select(
        "doc_id",
        "lang",
        lang_guess_scored(
            {lang: F.col(f"__s_{lang}") for lang in lang_names}
        ).alias("lang_guess"),
        n.alias("n_tokens"),
        F.col("__nbpe").alias("n_bpe_tokens"),
        punct.alias("n_punct"),
        stop_hits.alias("stop_hits"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
    ).orderBy("doc_id")


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: JSON property extraction from the events.props string column
    (get_json_object -> int), aggregated per event_type."""
    events = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.max(k).cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 baseline: brute-force cosine top-10 against the vec_id=0 query
    vector.  The exact-decimal dot path makes the score independent of
    summation order, so Spark and DuckDB rank identically (DuckDB's own
    list_cosine_similarity computes in float32 — not comparable).
    UNREGISTERED since round 10 (slot ceded to q_knn_join per VERDICT
    r9 #1 — this is the single-query special case the kNN join
    subsumes); full DuckDB parity continues in
    tests/test_oracle_parity.py (UNREGISTERED_ORACLES), and the
    TakeOrderedAndProject top-k plan stays pinned via q_bm25_rank."""
    emb = read_table(spark, sf_dir, "embeddings")
    query_vec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    candidates = emb.filter(F.col("vec_id") != 0)
    return sim.cosine_topk(
        candidates, "vec_id", "embedding", query_vec, k=10, exact_decimal=True
    )


def _fixdot_sql(a: str, b: str) -> str:
    """DuckDB fixed-point dot (mirror of similarity._dot_decimal)."""
    return (
        f"(CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(FLOOR(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)"
        f" * 1000000000000 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000)"
    )


def _ann_ivf_oracle() -> str:
    """DuckDB mirror of ivf_topk with frozen centroids + exact_decimal:
    max-cosine assignment (ties -> highest centroid_id), top-n_probe
    probe selection (ties -> lowest centroid_id, mirroring
    probe_centroids' orderBy), then top-k by exact cosine within the
    probed clusters (ties -> lowest vec_id, mirroring cosine_topk)."""
    sim_ec = (
        f"{_fixdot_sql('e.embedding', 'c.cvec')}"
        f" / (sqrt({_fixdot_sql('e.embedding', 'e.embedding')})"
        f" * sqrt({_fixdot_sql('c.cvec', 'c.cvec')}))"
    )
    sim_cq = (
        f"{_fixdot_sql('c.cvec', 'q.qv')}"
        f" / (sqrt({_fixdot_sql('c.cvec', 'c.cvec')})"
        f" * sqrt({_fixdot_sql('q.qv', 'q.qv')}))"
    )
    sim_aq = (
        f"{_fixdot_sql('a.embedding', 'q.qv')}"
        f" / (sqrt({_fixdot_sql('a.embedding', 'a.embedding')})"
        f" * sqrt({_fixdot_sql('q.qv', 'q.qv')}))"
    )
    return f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cents AS (
        SELECT vec_id AS centroid_id, embedding AS cvec
        FROM embeddings WHERE vec_id BETWEEN 1 AND 16
    ),
    cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
    scored AS (
        SELECT e.vec_id, e.embedding, c.centroid_id, {sim_ec} AS sim
        FROM cand e CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, centroid_id DESC
            ) AS rn FROM scored
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT centroid_id FROM (
            SELECT c.centroid_id, row_number() OVER (
                ORDER BY {sim_cq} DESC, c.centroid_id
            ) AS rn FROM cents c, q
        ) WHERE rn <= 4
    ),
    topk AS (
        SELECT a.vec_id, {sim_aq} AS ex
        FROM assigned a JOIN probes USING (centroid_id), q
        ORDER BY ex DESC, a.vec_id
        LIMIT 10
    )
    SELECT vec_id, FLOOR(ex * 1000000 + 0.5) / 1000000 AS cosine_sim
    FROM topk ORDER BY ex DESC, vec_id
    """


@query("q_ann_ivf", oracle=_ann_ivf_oracle())
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 scale path: IVF approximate top-k (frozen centroids, n_probe=4
    of 16 clusters).

    Hash-verified since round 4: centroids are FROZEN to the embeddings
    of vec_id 1..16 (SQL-expressible, unlike Lloyd training) and every
    cosine is exact_decimal fixed-point, so assignment, probe selection
    and the within-probe top-k reproduce bit-for-bit in the DuckDB
    oracle.  The trained-centroid mode (train_centroids + ivf_topk
    default) keeps its recall-vs-brute-force and probe-routing coverage
    in tests/test_llm_ops.py."""
    emb = read_table(spark, sf_dir, "embeddings")
    query_vec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    candidates = emb.filter(F.col("vec_id") != 0)
    cents = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= 16)
    ).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    return sim.ivf_topk(
        candidates,
        "vec_id",
        "embedding",
        query_vec,
        n_probe=4,
        k=10,
        centroids=cents,
        exact_decimal=True,
    )


def poly_shingle_list_sql(norm: str = "n") -> str:
    """DuckDB mirror of text.poly_hashes_from_codepoints (k=5): base-1009
    codepoint polynomial per shingle; whole-string fold under k chars."""
    return f"""CASE WHEN length({norm}) >= 5 THEN
        list_transform(range(1, length({norm})-3), i ->
          CAST(unicode({norm}[i]) AS BIGINT)*1036488922561
          + CAST(unicode({norm}[i+1]) AS BIGINT)*1027243729
          + CAST(unicode({norm}[i+2]) AS BIGINT)*1018081
          + CAST(unicode({norm}[i+3]) AS BIGINT)*1009
          + CAST(unicode({norm}[i+4]) AS BIGINT))
      WHEN length({norm}) = 0 THEN [CAST(0 AS BIGINT)]
      ELSE [list_reduce(
              list_transform(range(1, length({norm})+1),
                             i -> CAST(unicode({norm}[i]) AS BIGINT)),
              (a, c) -> a*1009 + c)]
      END"""


def minhash_poly_oracle_sql() -> str:
    """Full MinHash+LSH pipeline mirror of minhash_dedup_pairs(
    impl='kernel_poly' / 'poly'): poly shingle hashes -> h31 -> 32
    (a*h+b) mod 2^31-1 mins -> 8 poly band buckets -> candidate pairs ->
    signature-estimate cascade (>= threshold-0.15) -> exact Jaccard on
    the distinct shingle-hash sets.  MIN is duplicate-insensitive, so
    signatures over the DISTINCT hash set equal Spark's over all shingle
    instances."""
    from covid19i2b2_spark.operators.dedup import _MERSENNE31, _hash_family

    m = _MERSENNE31
    sig_elems = ",\n           ".join(
        f"list_min(list_transform(h31s, h -> (h*{a} + {b}) % {m}))"
        for a, b in _hash_family(32, 42)
    )
    return f"""
    WITH d AS (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
        FROM documents
    ),
    h AS (SELECT doc_id, {poly_shingle_list_sql()} AS hlist FROM d),
    s31 AS (
        SELECT doc_id, list_distinct(hlist) AS hset,
               list_transform(list_distinct(hlist), x -> x % {m}) AS h31s
        FROM h
    ),
    sigs AS (
        SELECT doc_id, hset,
           [{sig_elems}] AS sig
        FROM s31
    ),
    banded AS (
        SELECT doc_id, t.b AS band,
               list_reduce(sig[(t.b*4+1):(t.b*4+4)],
                           (acc, x) -> (acc*1009 + x) % 9007199254740881
               ) AS bucket
        FROM sigs, UNNEST(range(0, 8)) AS t(b)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                     AND a.doc_id < b.doc_id
    ),
    joined AS (
        SELECT c.id_a, c.id_b, sa.sig AS sig_a, sb.sig AS sig_b,
               sa.hset AS set_a, sb.hset AS set_b
        FROM cand c
        JOIN sigs sa ON c.id_a = sa.doc_id
        JOIN sigs sb ON c.id_b = sb.doc_id
    ),
    verified AS (
        SELECT id_a, id_b,
               FLOOR((CAST(len(list_intersect(set_a, set_b)) AS DOUBLE)
                      / len(list_distinct(list_concat(set_a, set_b))))
                     * 1000000 + 0.5) / 1000000 AS jaccard
        FROM joined
        WHERE CAST(len(list_filter(list_zip(sig_a, sig_b),
                                   x -> x[1] = x[2])) AS DOUBLE) / 32 >= 0.35
    )
    SELECT id_a, id_b, jaccard FROM verified
    WHERE jaccard >= 0.5
    ORDER BY id_a, id_b
    """


@query("q_minhash_pairs", oracle=minhash_poly_oracle_sql())
def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: MinHash+LSH near-dup pairs (32 hashes, 8 bands, 5-char
    shingles) verified with exact Jaccard >= 0.5, on the Arrow kernel
    fast path with the oracle-mirrorable polynomial shingle hash
    (impl='kernel_poly') — every stage of the registered pipeline
    reproduces bit-for-bit in the DuckDB oracle, AND the signature pass
    is one narrow mapInPandas with no explode/shuffle.
    Jaccard-vs-brute-force precision is asserted in
    tests/test_llm_ops.py; kernel_poly ≡ expr-poly signature equality is
    pinned there too."""
    docs = read_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        docs,
        "doc_id",
        "text",
        n_hashes=32,
        n_bands=8,
        shingle_k=5,
        threshold=0.5,
        impl="kernel_poly",
    ).orderBy("id_a", "id_b")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: 64-bit SimHash signatures per document (token-hash bit votes).

    Not registered as a t2 query (driver 50-query window): the signature
    path is exercised end-to-end by q_simhash_pairs, and planted-edit
    recall is asserted in tests/test_llm_ops.py."""
    docs = read_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text").orderBy("doc_id")


def _near_dup_planes() -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(42)
    return rng.standard_normal((8, 64)).tolist()


def _near_dup_oracle(threshold: float) -> str:
    """DuckDB mirror of embedding_near_dup_pairs(exact_decimal=True):
    buckets from the SIGNS of fixed-point plane dots, verify cosine from
    fixed-point dots — every sum is over floor(x*y*1e12+0.5) BIGINTs, so
    both engines agree bit-for-bit regardless of summation order.  The
    plane constants are embedded as literals (same Python floats the
    Spark side turns into F.lit)."""

    def fixdot(a: str, b: str) -> str:
        return (
            f"(CAST(list_sum(list_transform(list_zip({a}, {b}), "
            f"x -> CAST(FLOOR(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)"
            f" * 1000000000000 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000)"
        )

    plane_lits = [
        "[" + ", ".join(repr(float(x)) for x in p) + "]"
        for p in _near_dup_planes()
    ]
    bucket = " + ".join(
        f"(CASE WHEN {fixdot('embedding', pl)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, pl in enumerate(plane_lits)
    )
    cos = f"{fixdot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)"
    return f"""
    WITH bkt AS (
        SELECT vec_id, embedding, {bucket} AS bucket,
               sqrt({fixdot('embedding', 'embedding')}) AS nrm
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               FLOOR(({cos}) * 1000000 + 0.5) / 1000000 AS cosine_sim
        FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM pairs
    WHERE cosine_sim >= {threshold}
    ORDER BY id_a, id_b
    """


# Round 14: slot ceded to q_suffix_array (VERDICT r13 next-round #1) —
# the embedding-cosine arithmetic stays driver-verified through
# q_ann_ivf / q_knn_join / q_semantic_dedup, and this exact query keeps
# full DuckDB parity via UNREGISTERED_ORACLES (oracle generator
# _near_dup_oracle is unchanged and imported by the test).
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3: embedding-cosine near-dup pairs via hyperplane-LSH buckets
    (8 seeded planes) + exact cosine verify.  Threshold 0.3 keeps the
    check non-trivial on this near-orthogonal synthetic corpus (real
    near-dup corpora use ~0.9).

    Hash-verified since round 3: exact_decimal=True fixed-points every
    dot product (bucketing signs AND verify cosine), making the full
    LSH+verify pipeline reproducible in the DuckDB oracle — this was
    rows-only in rounds 1-2.  Runs impl='kernel' (round 4): the Arrow
    kernels compute the identical fixed-point arithmetic ~1.6x faster
    than the interpreted HOF expressions (equality pinned in
    tests/test_llm_ops.py); the oracle is unchanged because the values
    are bit-identical."""
    emb = read_table(spark, sf_dir, "embeddings")
    return sim.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", _near_dup_planes(), threshold=0.3,
        exact_decimal=True, impl="kernel",
    ).orderBy("id_a", "id_b")


@query(
    "q_multimodal_meta",
    # The FAKE decode is deterministic byte arithmetic (dims from byte
    # length + first byte, frames from ceil(bytes/256)), so DuckDB can
    # mirror it byte-exactly via hex(encode(text)) — upgrading this from
    # rows-only to a full value oracle.  What this verifies is the Arrow
    # plumbing's determinism and the aggregate; the real-codec path stays
    # stubbed (no codecs in this environment).
    oracle="""
    WITH b AS (
        SELECT doc_id, octet_length(encode(text)) AS nb,
               hex(encode(text)) AS hx
        FROM documents
    ),
    m AS (
        SELECT doc_id, nb,
            CASE WHEN nb = 0 THEN 0
                 ELSE CAST(concat('0x', substr(hx, 1, 2)) AS BIGINT)
            END AS first_b,
            CAST(ceil(nb / 256.0) AS BIGINT) AS nf
        FROM b
    )
    SELECT 'image/fake' AS media_type,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(nb) AS BIGINT) AS total_bytes,
           CAST(MAX((first_b % 16 + 1) * 64) AS INTEGER) AS max_width,
           CAST(MAX((nb % 16 + 1) * 64) AS INTEGER) AS max_height,
           CAST(SUM(nf) AS BIGINT) AS total_frames,
           CAST(SUM(CAST(ceil(nf / 4.0) AS BIGINT)) AS BIGINT) AS total_sampled
    FROM m
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 multimodal plumbing: documents -> binary payload column ->
    Arrow-batched mapInPandas fake decode (real codecs stubbed, see
    operators/multimodal.py) -> per-type size stats + frame sampling.

    Hash-verified since round 4: the fake decode's byte arithmetic is
    mirrored byte-exactly in the DuckDB oracle (hex-string byte
    extraction), pinning the Arrow batch path's determinism end to end."""
    docs = read_table(spark, sf_dir, "documents")
    media = attach_fake_media(docs, "doc_id", "text")
    decoded = decode_media(media)
    frames = frame_sample(media)
    return (
        decoded.join(frames, "media_id")
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
            F.sum("n_frames").alias("total_frames"),
            F.sum("n_sampled").alias("total_sampled"),
        )
        .orderBy("media_type")
    )
