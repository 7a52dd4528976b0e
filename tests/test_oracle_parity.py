"""Run every registered t2 query against the DuckDB oracle at sf0.001 —
a local mirror of the driver's correctness gate, so mismatches surface
before the driver's sf0.01 run."""

from __future__ import annotations

import pytest

from covid19i2b2_spark.registry import REGISTRY, all_queries
from tests.conftest import SF_DIR
from tests.oracle import assert_frames_match

all_queries()  # populate REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only contract: must run and return a stable schema
        assert sdf.schema is not None
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


# --- Queries deregistered from the t2 registry (driver 50-query window,
# --- VERDICT r1 #1) but still part of the engine surface: their oracle
# --- parity lives here instead of in CORRECTNESS_r{N}.json.


def _fixdot(a: str, b: str) -> str:
    """DuckDB mirror of similarity._dot_decimal: fixed-point picounit
    sums, order/engine-independent (same helper shape as the
    q_embedding_near_dup oracle)."""
    return (
        f"(CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(FLOOR(CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)"
        f" * 1000000000000 + 0.5) AS BIGINT))) AS DOUBLE) / 1000000000000)"
    )


def _semantic_pairs_frozen_oracle() -> str:
    """SemDeDup sub-stage given frozen centroids: max-cosine assignment
    (ties -> highest centroid_id, mirroring ivf_assign's max_by over
    (sim, centroid_id)) + within-cluster pairs with cosine >= 0.3."""
    sim_ec = (
        f"{_fixdot('e.embedding', 'c.cvec')}"
        f" / (sqrt({_fixdot('e.embedding', 'e.embedding')})"
        f" * sqrt({_fixdot('c.cvec', 'c.cvec')}))"
    )
    cos_ab = (
        f"{_fixdot('a.embedding', 'b.embedding')}"
        f" / (sqrt({_fixdot('a.embedding', 'a.embedding')})"
        f" * sqrt({_fixdot('b.embedding', 'b.embedding')}))"
    )
    return f"""
    WITH cents AS (
        SELECT vec_id AS centroid_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 16
    ),
    scored AS (
        SELECT e.vec_id, e.embedding, c.centroid_id, {sim_ec} AS sim
        FROM embeddings e CROSS JOIN cents c
    ),
    assigned AS (
        SELECT vec_id, embedding, centroid_id FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY sim DESC, centroid_id DESC
            ) AS rn FROM scored
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               FLOOR(({cos_ab}) * 1000000 + 0.5) / 1000000 AS cosine_sim
        FROM assigned a
        JOIN assigned b
          ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine_sim FROM pairs
    WHERE cosine_sim >= 0.3
    ORDER BY id_a, id_b
    """


# _poly_shingle_list / the minhash poly oracle moved into the package
# (queries/llm.py) when q_minhash_pairs gained its registered oracle; the
# unregistered q_minhash_poly (expression impl) reuses the same SQL, so
# kernel_poly and expr-poly are pinned against ONE oracle text.
from covid19i2b2_spark.queries.llm import (  # noqa: E402
    minhash_poly_oracle_sql as _minhash_poly_oracle,
    poly_shingle_list_sql as _poly_shingle_list,
)



_DUCK_TOKED = """
    toked AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents
    )
"""


def _chunk_documents_oracle() -> str:
    """Mirror of chunk_documents(chunk_tokens=64, overlap_tokens=16):
    starts 1, 49, ... while start <= max(n-16, 1); 64-token slices;
    chunk_id = (start-1)/48 (== posexplode position)."""
    return f"""
    WITH {_DUCK_TOKED},
    d AS (SELECT doc_id, toks, len(toks) AS n FROM toked WHERE len(toks) > 0)
    SELECT doc_id,
           CAST((u.s - 1) // 48 AS BIGINT) AS chunk_id,
           CAST(u.s AS BIGINT) AS start_token,
           CAST(len(toks[u.s:u.s+63]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(toks[u.s:u.s+63], ' ') AS chunk_text
    FROM d, UNNEST(range(1, greatest(n - 16, 1) + 1, 48)) AS u(s)
    ORDER BY doc_id, chunk_id
    """


def _quality_classifier_oracle() -> str:
    """Mirror of linear_text_classifier(clf_weights(), bias=0.1):
    per-token polynomial bucket -> weight pick -> sequential left-fold
    sum (list_reduce == Spark's F.aggregate: 0.0+x1 is exactly x1) ->
    sigmoid of bias + mean; tokenless docs keep their row with NULL."""
    from covid19i2b2_spark.queries.llm3 import clf_weights

    # ::DOUBLE per element: bare decimal literals land in DECIMAL(p,s)
    # and the fold sum overflows the inferred scale
    warr = "[" + ", ".join(f"{x!r}::DOUBLE" for x in clf_weights()) + "]"
    bucket = (
        "((CASE WHEN length(tok) = 0 THEN 0 "
        "ELSE list_reduce(list_transform(range(1, length(tok)+1), "
        "i -> CAST(unicode(tok[i]) AS BIGINT)), "
        "(a, c) -> (a*1009 + c) % 9007199254740881) END) % 32) + 1"
    )
    return f"""
    WITH {_DUCK_TOKED},
    s AS (
        SELECT doc_id, len(toks) AS n,
               CASE WHEN len(toks) = 0 THEN NULL
                    ELSE list_reduce(
                        list_transform(toks, tok -> ({warr})[{bucket}]),
                        (a, b) -> a + b) END AS sw
        FROM toked
    )
    SELECT doc_id,
           CASE WHEN n = 0 THEN NULL
                ELSE FLOOR((1.0 / (1.0 + exp(-(0.1 + sw / n))))
                           * 1000000 + 0.5) / 1000000
           END AS quality_prob
    FROM s
    ORDER BY doc_id
    """



def _mixture_sample_oracle() -> str:
    """Mirror of temperature_mixture_sample(tau=0.5, target=0.5,
    hash_impl='poly'): per-domain thresholds from the SAME
    mixture_fractions float arithmetic (imported, not re-derived), poly
    key bucket = affine(decimal-string polynomial) mod 1e6."""
    import duckdb as _dd

    from covid19i2b2_spark.operators.dedup import _hash_family
    from covid19i2b2_spark.operators.sampling import mixture_fractions

    con = _dd.connect()
    counts = dict(
        con.execute(
            f"SELECT lang, COUNT(*) FROM "
            f"read_parquet('{SF_DIR}/documents.parquet') GROUP BY lang"
        ).fetchall()
    )
    con.close()
    fr = mixture_fractions(counts, 0.5, 0.5)
    thresh = (
        "CASE "
        + " ".join(
            f"WHEN lang = '{d}' THEN {int(f * 1_000_000)}"
            for d, f in sorted(fr.items())
        )
        + " ELSE 0 END"
    )
    a, b = _hash_family(1, 42)[0]
    key = "CAST(doc_id AS VARCHAR)"
    bucket = (
        f"((list_reduce(list_transform(range(1, length({key})+1), "
        f"i -> CAST(unicode(({key})[i]) AS BIGINT)), "
        f"(x, c) -> (x*1009 + c) % 9007199254740881) % 2147483647) "
        f"* {a} + {b}) % 2147483647 % 1000000"
    )
    return f"""
    SELECT doc_id, lang FROM documents
    WHERE {bucket} < {thresh}
    ORDER BY doc_id
    """



def _dup_passages_oracle() -> str:
    """Mirror of duplicate_passages(k=8, min_docs=2, hash_impl='poly')
    over the banner-planted corpus: normalized single-space tokens ->
    8-token windows -> polynomial hash of the joined passage -> grouped
    stats with arg_min earliest witness."""
    from covid19i2b2_spark.queries.llm3 import _DUP_BANNER, _DUP_EVERY

    fold = (
        "list_reduce(list_transform(range(1, length(ptxt)+1), "
        "i -> CAST(unicode(ptxt[i]) AS BIGINT)), "
        "(a, c) -> (a*1009 + c) % 9007199254740881)"
    )
    return f"""
    WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % {_DUP_EVERY} = 0
                    THEN '{_DUP_BANNER} ' || text ELSE text END AS text
        FROM documents WHERE doc_id < 300
    ),
    normed AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
        FROM dirty
    ),
    toked AS (
        SELECT doc_id,
               CASE WHEN n = '' THEN [] ELSE string_split(n, ' ') END AS toks
        FROM normed
    ),
    spans AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               array_to_string(toks[u.i:u.i+7], ' ') AS ptxt
        FROM toked, UNNEST(range(1, len(toks) - 6)) AS u(i)
        WHERE len(toks) >= 8
    ),
    hashed AS (
        SELECT doc_id, pos, ptxt, {fold} AS passage_hash FROM spans
    )
    SELECT passage_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(arg_min(pos, doc_id*1000000000 + pos) AS BIGINT) AS first_pos,
           arg_min(ptxt, doc_id*1000000000 + pos) AS passage_text
    FROM hashed
    GROUP BY passage_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY passage_hash
    """



def _unigram_logprob_oracle() -> str:
    """Mirror of unigram_logprob_score(top_n_vocab=100): top-100 vocab
    (count desc, token asc — build_vocab's exact tie-break), add-one
    smoothing over N + V, fixed-point picounit mean (order-independent
    BIGINT sums, matching the Spark side bit-for-bit)."""
    return f"""
    WITH {_DUCK_TOKED},
    tok AS (SELECT doc_id, unnest(toks) AS token FROM toked),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    vocab AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 100),
    total AS (SELECT COUNT(*) AS nt FROM tok),
    scored AS (
        SELECT t.doc_id,
               CAST(FLOOR(ln((COALESCE(v.n, 0) + 1)
                             / (CAST(total.nt AS DOUBLE) + 101))
                          * 1000000000000 + 0.5) AS BIGINT) AS lp_fix
        FROM tok t LEFT JOIN vocab v USING (token), total
    ),
    per_doc AS (
        SELECT doc_id,
               FLOOR((CAST(SUM(lp_fix) AS DOUBLE) / COUNT(*)
                      / 1000000000000) * 1000000 + 0.5) / 1000000
                   AS unigram_logprob
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id, p.unigram_logprob
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """


def _remove_dup_spans_oracle() -> str:
    """Mirror of remove_duplicate_spans(k=8, min_docs=2, 'poly') over
    the q_dup_passages banner corpus: duplicated 8-windows -> covered
    positions -> anti-join token stream -> ordered string_agg rebuild."""
    from covid19i2b2_spark.queries.llm3 import _DUP_BANNER, _DUP_EVERY

    fold = (
        "list_reduce(list_transform(range(1, length(ptxt)+1), "
        "i -> CAST(unicode(ptxt[i]) AS BIGINT)), "
        "(a, c) -> (a*1009 + c) % 9007199254740881)"
    )
    return f"""
    WITH dirty AS (
        SELECT doc_id,
               CASE WHEN doc_id % {_DUP_EVERY} = 0
                    THEN '{_DUP_BANNER} ' || text ELSE text END AS text
        FROM documents WHERE doc_id < 300
    ),
    normed AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
        FROM dirty
    ),
    toked AS (
        SELECT doc_id,
               CASE WHEN n = '' THEN [] ELSE string_split(n, ' ') END AS toks
        FROM normed
    ),
    spans AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               array_to_string(toks[u.i:u.i+7], ' ') AS ptxt
        FROM toked, UNNEST(range(1, len(toks) - 6)) AS u(i)
        WHERE len(toks) >= 8
    ),
    hashed AS (
        SELECT doc_id, pos, {fold} AS passage_hash FROM spans
    ),
    dups AS (
        SELECT passage_hash FROM hashed
        GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    covered AS (
        SELECT DISTINCT h.doc_id, CAST(u.p AS BIGINT) AS p
        FROM hashed h JOIN dups USING (passage_hash),
             UNNEST(range(h.pos, h.pos + 8)) AS u(p)
    ),
    tokpos AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS p, toks[u.i] AS tok
        FROM toked, UNNEST(range(1, len(toks) + 1)) AS u(i)
    ),
    kept AS (
        SELECT t.doc_id, t.p, t.tok FROM tokpos t
        ANTI JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_deduped
        FROM kept GROUP BY doc_id
    ),
    removed AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed_tokens
        FROM covered GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN COALESCE(m.n_removed_tokens, 0) > 0
                THEN COALESCE(r.text_deduped, '')
                ELSE d.text END AS text_deduped,
           COALESCE(m.n_removed_tokens, 0) AS n_removed_tokens
    FROM dirty d
    LEFT JOIN rebuilt r USING (doc_id)
    LEFT JOIN removed m USING (doc_id)
    ORDER BY d.doc_id
    """


def _bigram_logprob_oracle() -> str:
    """Mirror of bigram_logprob_score(top_n_vocab=100,
    top_n_bigrams=300): P(b|a) = (c(a,b)+1)/(c(a)+101) with c from the
    bounded top-N tables (ties: count desc then key asc), fixed-point
    picounit mean.  Docs with < 2 tokens -> NULL."""
    return f"""
    WITH {_DUCK_TOKED},
    tok AS (SELECT doc_id, unnest(toks) AS token FROM toked),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    vocab AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 100),
    pairs AS (
        SELECT doc_id,
               toks[i] AS a, toks[i + 1] AS b
        FROM toked, unnest(range(1, len(toks))) AS r(i)
        WHERE len(toks) >= 2
    ),
    bigrams AS (
        SELECT a, b, COUNT(*) AS n_ab FROM pairs GROUP BY a, b
        ORDER BY n_ab DESC, a, b LIMIT 300
    ),
    scored AS (
        SELECT p.doc_id,
               CAST(FLOOR(ln((COALESCE(g.n_ab, 0) + 1)
                             / (CAST(COALESCE(v.n, 0) AS DOUBLE) + 101))
                          * 1000000000000 + 0.5) AS BIGINT) AS lp_fix
        FROM pairs p
        LEFT JOIN bigrams g USING (a, b)
        LEFT JOIN vocab v ON v.token = p.a
    ),
    per_doc AS (
        SELECT doc_id,
               FLOOR((CAST(SUM(lp_fix) AS DOUBLE) / COUNT(*)
                      / 1000000000000) * 1000000 + 0.5) / 1000000
                   AS bigram_logprob
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id, p.bigram_logprob
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """


def _topk_sketch_oracle(k: int = 12) -> str:
    """Replay of operators/sketches.py build_topk_sketches +
    merge_topk_sketches: per-(shard,source) exact top-k summaries with
    residual bound, merged to per-source bounds — absent shards charge
    their bound into count_hi; ties break (count desc, item desc)."""
    return f"""
    WITH toks AS (
        SELECT doc_id % 4 AS shard, source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                   AS item
        FROM documents WHERE trim(text) <> ''
    ),
    counts AS (
        SELECT shard, source, item, COUNT(*) AS n
        FROM toks GROUP BY 1, 2, 3
    ),
    ranked AS (
        SELECT shard, source, item, n,
               ROW_NUMBER() OVER (PARTITION BY shard, source
                                  ORDER BY n DESC, item DESC) AS rk
        FROM counts
    ),
    shard_stats AS (
        SELECT shard, source,
               COALESCE(MAX(CASE WHEN rk > {k} THEN n END), 0) AS sbound,
               SUM(n) AS srows
        FROM ranked GROUP BY 1, 2
    ),
    totals AS (
        SELECT source, SUM(sbound) AS total_bound, SUM(srows) AS n_rows
        FROM shard_stats GROUP BY 1
    ),
    per_item AS (
        SELECT r.source, r.item,
               SUM(r.n) AS count_lo,
               SUM(r.n) + ANY_VALUE(t.total_bound) - SUM(st.sbound)
                   AS count_hi,
               ANY_VALUE(t.total_bound) AS total_bound,
               ANY_VALUE(t.n_rows) AS n_rows
        FROM ranked r
        JOIN shard_stats st USING (shard, source)
        JOIN totals t ON t.source = r.source
        WHERE r.rk <= {k}
        GROUP BY r.source, r.item
    ),
    merged AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY count_hi DESC, count_lo DESC,
                                           item DESC) AS rk
        FROM per_item
    ),
    final_bound AS (
        SELECT source,
               GREATEST(ANY_VALUE(total_bound),
                        COALESCE(MAX(CASE WHEN rk > {k} THEN count_hi END),
                                 0)) AS bound
        FROM merged GROUP BY source
    )
    SELECT m.source, CAST(m.rk AS BIGINT) AS rank, m.item,
           CAST(m.count_lo AS BIGINT) AS count_lo,
           CAST(m.count_hi AS BIGINT) AS count_hi,
           CAST(b.bound AS BIGINT) AS bound,
           CAST(m.n_rows AS BIGINT) AS n_rows
    FROM merged m JOIN final_bound b USING (source)
    WHERE m.rk <= {k}
    ORDER BY m.source, rank
    """


def _kn_lm_oracle() -> str:
    """Full RE-TRAIN + RE-SCORE of q_kn_lm in SQL: top-50 vocab cut
    (count desc, token asc), marker-aware <unk> mapping, padded trigram
    events via 1-based list indexing, the three continuation-count
    cascades computed OVER THE TRIGRAM TABLE (cc2 = distinct left
    contexts per (b,c), cc1 = distinct middle contexts per c), and the
    interpolated probability with the exact IEEE op order of
    operators/kn_lm.py (GREATEST(x - D, 0) + (D * n1p) * p_backoff,
    then the context division), picounit-quantized per event.  Docs
    with zero tokens -> NULL, like the other LM scorers."""
    return f"""
    WITH {_DUCK_TOKED},
    tok AS (SELECT doc_id, unnest(toks) AS token FROM toked),
    counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    vocab AS (SELECT token FROM counts ORDER BY n DESC, token LIMIT 50),
    padded AS (
        SELECT doc_id, ['<s>', '<s>'] || toks || ['</s>'] AS p
        FROM toked WHERE len(toks) >= 1
    ),
    raw_ev AS (
        SELECT doc_id, p[i - 2] AS a_raw, p[i - 1] AS b_raw, p[i] AS c_raw
        FROM padded, unnest(range(3, len(p) + 1)) AS r(i)
    ),
    ev AS (
        SELECT doc_id,
               CASE WHEN a_raw IN ('<s>', '</s>') THEN a_raw
                    WHEN a_raw IN (SELECT token FROM vocab) THEN a_raw
                    ELSE '<unk>' END AS a,
               CASE WHEN b_raw IN ('<s>', '</s>') THEN b_raw
                    WHEN b_raw IN (SELECT token FROM vocab) THEN b_raw
                    ELSE '<unk>' END AS b,
               CASE WHEN c_raw IN ('<s>', '</s>') THEN c_raw
                    WHEN c_raw IN (SELECT token FROM vocab) THEN c_raw
                    ELSE '<unk>' END AS c
        FROM raw_ev
    ),
    tri AS (SELECT a, b, c, COUNT(*) AS c3 FROM ev GROUP BY 1, 2, 3),
    ctx3 AS (
        SELECT a, b, SUM(c3) AS c2, COUNT(*) AS n1p3 FROM tri GROUP BY 1, 2
    ),
    ccbc AS (SELECT b, c, COUNT(*) AS cc2 FROM tri GROUP BY 1, 2),
    ctx2 AS (
        SELECT b, SUM(cc2) AS ctxcc2, COUNT(*) AS n1p2 FROM ccbc GROUP BY 1
    ),
    ccu AS (SELECT c, COUNT(*) AS cc1 FROM ccbc GROUP BY 1),
    scal AS (
        SELECT COUNT(*) AS tot_cc1, COUNT(DISTINCT c) + 1 AS v_eff FROM ccbc
    ),
    j AS (
        SELECT e.doc_id, t.c3, x3.c2, x3.n1p3, g.cc2 AS cc2n,
               x2.ctxcc2, x2.n1p2, u.cc1
        FROM ev e
        LEFT JOIN tri t USING (a, b, c)
        LEFT JOIN ctx3 x3 USING (a, b)
        LEFT JOIN ccbc g USING (b, c)
        LEFT JOIN ctx2 x2 USING (b)
        LEFT JOIN ccu u USING (c)
    ),
    s1 AS (
        SELECT j.*,
               CAST(COALESCE(cc1, 0) + 1 AS DOUBLE)
                   / CAST(scal.tot_cc1 + scal.v_eff AS DOUBLE) AS p1
        FROM j, scal
    ),
    s2 AS (
        SELECT *,
               CASE WHEN ctxcc2 IS NOT NULL THEN
                   (GREATEST(CAST(COALESCE(cc2n, 0) AS DOUBLE) - 0.75, 0.0)
                    + (0.75 * CAST(n1p2 AS DOUBLE)) * p1)
                   / CAST(ctxcc2 AS DOUBLE)
               ELSE p1 END AS p2
        FROM s1
    ),
    s3 AS (
        SELECT doc_id,
               CASE WHEN c2 IS NOT NULL THEN
                   (GREATEST(CAST(COALESCE(c3, 0) AS DOUBLE) - 0.75, 0.0)
                    + (0.75 * CAST(n1p3 AS DOUBLE)) * p2)
                   / CAST(c2 AS DOUBLE)
               ELSE p2 END AS p3
        FROM s2
    ),
    scored AS (
        SELECT doc_id,
               CAST(FLOOR(ln(p3) * 1000000000000.0 + 0.5) AS BIGINT) AS lp
        FROM s3
    ),
    per_doc AS (
        SELECT doc_id,
               FLOOR((CAST(SUM(lp) AS DOUBLE) / COUNT(*)
                      / 1000000000000.0) * 1000000 + 0.5) / 1000000
                   AS kn_logprob
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id, p.kn_logprob
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """


UNREGISTERED_ORACLES = {

    # X64 anchor texts: count + ROW_NUMBER replay of the per-target
    # top-3 anchors over the synthetic doc_id%20 link table
    "q_anchor_texts": """
    WITH links AS (
        SELECT doc_id % 20 AS dst,
               lower(trim(array_to_string(
                   regexp_split_to_array(trim(text), '\\s+')[1:2], ' ')))
                   AS anchor_text
        FROM documents
    ),
    counts AS (
        SELECT dst, anchor_text, CAST(COUNT(*) AS BIGINT) AS n_links
        FROM links
        WHERE anchor_text IS NOT NULL AND anchor_text <> ''
        GROUP BY dst, anchor_text
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY dst ORDER BY n_links DESC, anchor_text
        ) AS rank FROM counts
    )
    SELECT CAST(dst AS BIGINT) AS dst, anchor_text, n_links,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 3
    ORDER BY dst, rank
    """,

    # X62 containment join: BRUTE-FORCE all-pairs over the 60-doc +
    # 20-snippet construction — parity proves the prefix-filtered plan
    # lossless (threshold compared on the unrounded ratio, output
    # rounded at 1e-6, both engines)
    "q_containment": """
    WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 60
        UNION ALL
        SELECT doc_id + 10000,
               array_to_string(
                   regexp_split_to_array(trim(text), '\\s+')[1:8], ' ')
        FROM documents WHERE doc_id < 20
    ),
    grams AS (
        SELECT doc_id,
               list_distinct(CASE
                   WHEN len(regexp_split_to_array(trim(text), '\\s+')) < 2
                   THEN []
                   ELSE [array_to_string(
                            regexp_split_to_array(trim(text), '\\s+')[i:i+1],
                            ' ')
                         FOR i IN range(1, len(
                            regexp_split_to_array(trim(text), '\\s+')))]
               END) AS gset
        FROM base
    ),
    g AS (SELECT * FROM grams WHERE len(gset) > 0)
    SELECT a.doc_id AS containee_id, b.doc_id AS container_id,
           FLOOR(CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE)
                 / len(a.gset) * 1000000 + 0.5) / 1000000 AS containment
    FROM g a, g b
    WHERE a.doc_id != b.doc_id
      AND CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE)
          / len(a.gset) >= 0.75
    ORDER BY containee_id, container_id
    """,

    # X63 provenance rollup: components derived straight from the
    # planted construction (doc i ~ doc i+250 -> component doc_id%250),
    # sources unioned sorted-distinct, n_chars spanned
    "q_dedup_provenance": """
    SELECT CAST(doc_id % 250 AS BIGINT) AS component,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           array_to_string(list_sort(list_distinct(list(source))), ',')
               AS source_set,
           CAST(MIN(n_chars) AS BIGINT) AS first_n_chars,
           CAST(MAX(n_chars) AS BIGINT) AS last_n_chars
    FROM documents
    WHERE doc_id < 500
    GROUP BY doc_id % 250
    ORDER BY component
    """,

    # X61 frontier scheduling: the whole politeness schedule replayed
    # via ROW_NUMBER (per-host priority order, 20/round cap, 3-round
    # horizon -> NULL beyond)
    "q_frontier_schedule": """
    WITH ranked AS (
        SELECT doc_id,
               source || '.example.com' AS host,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, host,
           CASE WHEN FLOOR((rn - 1) / 20) + 1 <= 3
                THEN CAST(FLOOR((rn - 1) / 20) + 1 AS BIGINT) END
               AS crawl_round
    FROM ranked
    ORDER BY host, crawl_round, doc_id
    """,

    # Round-12 robots/blocklist exclusion: the three-rule zoo replayed
    # as literal host/prefix predicates (whole host, path prefix on one
    # host, dot-suffix path block across every host)
    "q_filter_disallowed": """
    WITH urls AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               'http://' || source || '.example.com/' || (doc_id % 4)
                   || '/p' || doc_id AS url,
               source, doc_id % 4 AS seg
        FROM documents
    )
    SELECT doc_id, url,
           CASE WHEN source = 'src1'
                 OR (source = 'src2' AND seg = 0)
                 OR seg = 3
                THEN 'blocked' ELSE 'allowed' END AS status
    FROM urls ORDER BY doc_id
    """,

    # X54 phrase retrieval: overlapping consecutive-bigram counts
    # derived straight from the token arrays (adjacency scan — ground
    # truth by construction, independent of the index's positional
    # intersect fold)
    "q_phrase_search": """
    WITH toked AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
        FROM documents
    ),
    counts AS (
        SELECT doc_id,
               CAST(len(list_filter(range(1, len(toks)),
                    i -> toks[i] = 'the' AND toks[i+1] = 'fast'))
                    AS BIGINT) AS n_occurrences
        FROM toked
    )
    SELECT doc_id, n_occurrences FROM counts
    WHERE n_occurrences > 0
    ORDER BY n_occurrences DESC, doc_id
    LIMIT 25
    """,

    # X59 snapshot drift report: per-column stats of the even half vs
    # the odd half with planted schema drift (n_chars dropped, lang
    # retyped, extra_col added) — each metric independently derived
    "q_snapshot_drift": """
    SELECT * FROM (
    SELECT 'doc_id' AS "column", 'bigint' AS type_a, 'bigint' AS type_b, (SELECT FLOOR(CAST(SUM(CASE WHEN (doc_id) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 0) AS null_frac_a, (SELECT CAST(COUNT(DISTINCT (doc_id)) AS BIGINT) FROM documents WHERE doc_id % 2 = 0) AS n_distinct_a, (SELECT CAST(MIN(doc_id) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS min_a, (SELECT CAST(MAX(doc_id) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS max_a, (SELECT FLOOR(CAST(SUM(CASE WHEN (doc_id) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 1) AS null_frac_b, (SELECT CAST(COUNT(DISTINCT (doc_id)) AS BIGINT) FROM documents WHERE doc_id % 2 = 1) AS n_distinct_b, (SELECT CAST(MIN(doc_id) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS min_b, (SELECT CAST(MAX(doc_id) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS max_b, FALSE AS schema_drift
    UNION ALL
    SELECT 'extra_col' AS "column", CAST(NULL AS VARCHAR) AS type_a, 'bigint' AS type_b, CAST(NULL AS DOUBLE) AS null_frac_a, CAST(NULL AS BIGINT) AS n_distinct_a, CAST(NULL AS VARCHAR) AS min_a, CAST(NULL AS VARCHAR) AS max_a, (SELECT FLOOR(CAST(SUM(CASE WHEN (CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 3 END) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 1) AS null_frac_b, (SELECT CAST(COUNT(DISTINCT (CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 3 END)) AS BIGINT) FROM documents WHERE doc_id % 2 = 1) AS n_distinct_b, (SELECT CAST(MIN(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 3 END) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS min_b, (SELECT CAST(MAX(CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id % 3 END) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS max_b, TRUE AS schema_drift
    UNION ALL
    SELECT 'lang' AS "column", 'string' AS type_a, 'int' AS type_b, (SELECT FLOOR(CAST(SUM(CASE WHEN (lang) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 0) AS null_frac_a, (SELECT CAST(COUNT(DISTINCT (lang)) AS BIGINT) FROM documents WHERE doc_id % 2 = 0) AS n_distinct_a, (SELECT CAST(MIN(lang) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS min_a, (SELECT CAST(MAX(lang) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS max_a, (SELECT FLOOR(CAST(SUM(CASE WHEN (length(lang)) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 1) AS null_frac_b, (SELECT CAST(COUNT(DISTINCT (length(lang))) AS BIGINT) FROM documents WHERE doc_id % 2 = 1) AS n_distinct_b, (SELECT CAST(MIN(length(lang)) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS min_b, (SELECT CAST(MAX(length(lang)) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS max_b, TRUE AS schema_drift
    UNION ALL
    SELECT 'n_chars' AS "column", 'bigint' AS type_a, CAST(NULL AS VARCHAR) AS type_b, (SELECT FLOOR(CAST(SUM(CASE WHEN (n_chars) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 0) AS null_frac_a, (SELECT CAST(COUNT(DISTINCT (n_chars)) AS BIGINT) FROM documents WHERE doc_id % 2 = 0) AS n_distinct_a, (SELECT CAST(MIN(n_chars) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS min_a, (SELECT CAST(MAX(n_chars) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS max_a, CAST(NULL AS DOUBLE) AS null_frac_b, CAST(NULL AS BIGINT) AS n_distinct_b, CAST(NULL AS VARCHAR) AS min_b, CAST(NULL AS VARCHAR) AS max_b, TRUE AS schema_drift
    UNION ALL
    SELECT 'source' AS "column", 'string' AS type_a, 'string' AS type_b, (SELECT FLOOR(CAST(SUM(CASE WHEN (source) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 0) AS null_frac_a, (SELECT CAST(COUNT(DISTINCT (source)) AS BIGINT) FROM documents WHERE doc_id % 2 = 0) AS n_distinct_a, (SELECT CAST(MIN(source) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS min_a, (SELECT CAST(MAX(source) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS max_a, (SELECT FLOOR(CAST(SUM(CASE WHEN (source) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 1) AS null_frac_b, (SELECT CAST(COUNT(DISTINCT (source)) AS BIGINT) FROM documents WHERE doc_id % 2 = 1) AS n_distinct_b, (SELECT CAST(MIN(source) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS min_b, (SELECT CAST(MAX(source) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS max_b, FALSE AS schema_drift
    UNION ALL
    SELECT 'text' AS "column", 'string' AS type_a, 'string' AS type_b, (SELECT FLOOR(CAST(SUM(CASE WHEN (text) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 0) AS null_frac_a, (SELECT CAST(COUNT(DISTINCT (text)) AS BIGINT) FROM documents WHERE doc_id % 2 = 0) AS n_distinct_a, (SELECT CAST(MIN(text) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS min_a, (SELECT CAST(MAX(text) AS VARCHAR) FROM documents WHERE doc_id % 2 = 0) AS max_a, (SELECT FLOOR(CAST(SUM(CASE WHEN (text) IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000 FROM documents WHERE doc_id % 2 = 1) AS null_frac_b, (SELECT CAST(COUNT(DISTINCT (text)) AS BIGINT) FROM documents WHERE doc_id % 2 = 1) AS n_distinct_b, (SELECT CAST(MIN(text) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS min_b, (SELECT CAST(MAX(text) AS VARCHAR) FROM documents WHERE doc_id % 2 = 1) AS max_b, FALSE AS schema_drift
    ) ORDER BY "column"
    """,

    # X2 word-bigram Jaccard: REGISTERED rounds 2-10, slot ceded to
    # q_dsir_select in round 11 (VERDICT r10 #2) — full parity
    # continues here; the jaccard-verify arithmetic also stays under
    # the driver gate inside q_minhash_pairs' verify stage
    "q_ngram_jaccard": """
    WITH grams AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) < 2
                    THEN []
                    ELSE [array_to_string(regexp_split_to_array(trim(text), '\\s+')[i:i+1], ' ')
                          FOR i IN range(1, len(regexp_split_to_array(trim(text), '\\s+')))]
               END) AS gset
        FROM documents
        WHERE doc_id < 100
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           FLOOR((CAST(len(list_intersect(a.gset, b.gset)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.gset, b.gset)))) * 1000000 + 0.5)
               / 1000000 AS jaccard
    FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
    ORDER BY id_a
    """,

    # X55 URL dedup over the deterministic synthetic zoo: the oracle
    # derives each doc's EXPECTED canonical URL from the construction
    # rules directly (ground truth by construction — independent of
    # the operator's regexes), then groups
    "q_url_dedup": """
    WITH urls AS (
        SELECT doc_id,
               'http://' || source || '.example.com/Doc/'
                 || CAST(doc_id % 50 AS BIGINT)
                 || CASE WHEN doc_id % 4 IN (1, 3) THEN '?b=2' ELSE '' END
                   AS canonical_url
        FROM documents
    )
    SELECT canonical_url,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           CAST(COUNT(*) AS BIGINT) AS n_duplicates
    FROM urls GROUP BY canonical_url
    ORDER BY canonical_url
    """,

    # X3 brute-force cosine top-10: REGISTERED rounds 2-9, slot ceded to
    # q_knn_join in round 10 (VERDICT r9 #1) — the fixed-point parity
    # continues here (mirrors operators/similarity._dot_decimal)
    "q_cosine_topk": """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    prods AS (
        SELECT e.vec_id,
               unnest(e.embedding) AS a,
               unnest(q.qv) AS b
        FROM embeddings e, q
        WHERE e.vec_id != 0
    ),
    sums AS (
        SELECT vec_id,
               CAST(SUM(CAST(FLOOR(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)
                                   * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1e12 AS dot,
               CAST(SUM(CAST(FLOOR(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
                                   * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1e12 AS na2,
               CAST(SUM(CAST(FLOOR(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)
                                   * 1e12 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1e12 AS nb2
        FROM prods GROUP BY vec_id
    )
    SELECT vec_id,
           FLOOR((dot / (SQRT(na2) * SQRT(nb2))) * 1000000 + 0.5) / 1000000
               AS cosine_sim
    FROM sums
    ORDER BY dot / (SQRT(na2) * SQRT(nb2)) DESC, vec_id
    LIMIT 10
    """,

    # X49 unigram tokenizer seed statistic: substring frequencies of
    # the word dict, weighted by word count — the distributed half of
    # train_unigram (the EM half is vocabulary-sized and driver-side)
    "q_unigram_seed": """
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
      FROM documents WHERE trim(text) <> ''
    ),
    words AS (SELECT word, COUNT(*) AS n_word FROM toks GROUP BY word),
    subs AS (
      SELECT unnest(flatten(list_transform(range(1, length(word)+1),
               i -> list_transform(
                    range(1, least(6, length(word)-CAST(i AS INT)+1)+1),
                    l -> substr(word, CAST(i AS INT), CAST(l AS INT))))))
                 AS piece,
             n_word
      FROM words
    ),
    counts AS (SELECT piece, SUM(n_word) AS n FROM subs GROUP BY piece)
    SELECT piece, CAST(n AS BIGINT) AS n FROM counts
    ORDER BY n DESC, piece LIMIT 200
    """,
    # X3 per-label centroids: REGISTERED rounds 2-8, slot ceded to
    # q_fuzzy_pairs in round 9 (VERDICT r8 #8) — full-arithmetic parity
    # (fixed-point sums) continues here
    "q_embedding_centroids": """
    WITH elems AS (
        -- parallel unnests zip elementwise (no WITH ORDINALITY in duckdb 1.0)
        SELECT label,
               unnest(range(len(embedding))) AS dim,
               unnest(embedding) AS val
        FROM embeddings
    ),
    sums AS (
        SELECT label, dim,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1e12 + 0.5) AS BIGINT))
                    AS DOUBLE) / 1e12 AS s
        FROM elems GROUP BY label, dim
    )
    SELECT label, dim,
           CAST(n AS BIGINT) AS n_vectors,
           FLOOR((s / n) * 1000000 + 0.5) / 1000000 AS centroid_val
    FROM sums
    WHERE dim < 4
    ORDER BY label, dim
    """,
    "q_bpe_pairs": """
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))
                   AS word
        FROM documents WHERE trim(text) <> ''
    ),
    words AS (SELECT word, COUNT(*) AS n_word FROM toks GROUP BY word),
    pairs AS (
        SELECT unnest(list_transform(range(1, length(word)),
                                     i -> substr(word, i, 2))) AS pair,
               n_word
        FROM words WHERE length(word) >= 2
    ),
    counts AS (SELECT pair, SUM(n_word) AS n FROM pairs GROUP BY pair),
    top AS (SELECT pair, n FROM counts ORDER BY n DESC, pair LIMIT 100)
    SELECT pair, CAST(n AS BIGINT) AS n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
    FROM top ORDER BY rank
    """,
    "q_join_left": """
    SELECT c_custkey, c_nationkey,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE)
               AS sum_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_nationkey
    ORDER BY c_custkey
    """,
    "q_token_budget_grouped": """
    WITH scored AS (
        SELECT doc_id, source, length(text) AS score,
               CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_toks
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, n_toks,
               SUM(n_toks) OVER (PARTITION BY source
                                 ORDER BY score DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS c
        FROM scored
    )
    SELECT doc_id, source, n_toks FROM cum WHERE c <= 500
    ORDER BY source, doc_id
    """,
    "q_top_fraction": """
    WITH ranked AS (
        SELECT doc_id, source, CAST(length(text) AS BIGINT) AS score,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY length(text) DESC, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source, score FROM ranked
    WHERE rn <= CEIL(n * 0.25)
    ORDER BY source, doc_id
    """,
    "q_corpus_divergence": """
    WITH toks AS (
        SELECT source, CAST(FLOOR(doc_id / 20) AS BIGINT) % 2 AS half,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    ca AS (SELECT source, token, COUNT(*) AS c_a FROM toks WHERE half = 0
           GROUP BY source, token),
    cb AS (SELECT source, token, COUNT(*) AS c_b FROM toks WHERE half = 1
           GROUP BY source, token),
    j AS (
        SELECT COALESCE(ca.source, cb.source) AS source,
               COALESCE(ca.token, cb.token) AS token,
               COALESCE(c_a, 0) AS c_a, COALESCE(c_b, 0) AS c_b
        FROM ca FULL OUTER JOIN cb
          ON ca.source = cb.source AND ca.token = cb.token
    ),
    tot AS (
        SELECT source, CAST(SUM(c_a) AS BIGINT) AS n_a,
               CAST(SUM(c_b) AS BIGINT) AS n_b
        FROM j GROUP BY source
    ),
    terms AS (
        SELECT j.source, c_a, c_b, n_a, n_b,
               CAST(FLOOR((
                 (CASE WHEN c_a > 0 THEN
                    (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                    * ln((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE))
                         / ((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                             + CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / 2.0))
                  ELSE 0.0 END
                  +
                  CASE WHEN c_b > 0 THEN
                    (CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                    * ln((CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                         / ((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                             + CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / 2.0))
                  ELSE 0.0 END) / 2.0
               ) * 1000000000000 + 0.5) AS BIGINT) AS t_fix
        FROM j JOIN tot ON j.source = tot.source
    )
    SELECT source,
           CAST(MAX(n_a) AS BIGINT) AS n_tokens_a,
           CAST(MAX(n_b) AS BIGINT) AS n_tokens_b,
           CAST(SUM(CASE WHEN c_a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types_a,
           CAST(SUM(CASE WHEN c_b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_types_b,
           CAST(SUM(CASE WHEN c_a > 0 AND c_b > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_types_shared,
           FLOOR((CAST(SUM(t_fix) AS DOUBLE) / 1000000000000) * 1000000 + 0.5)
               / 1000000 AS js_divergence
    FROM terms GROUP BY source ORDER BY source
    """,
    "q_row_number": """
    SELECT c_nationkey AS nationkey, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    )
    WHERE rn <= 3
    ORDER BY nationkey, rn
    """,
    "q_topk_sketch": _topk_sketch_oracle(),
    "q_minhash_poly": _minhash_poly_oracle(),
    "q_chunk_documents": _chunk_documents_oracle(),
    "q_quality_classifier": _quality_classifier_oracle(),
    "q_mixture_sample": _mixture_sample_oracle(),
    "q_dup_passages": _dup_passages_oracle(),
    "q_unigram_logprob": _unigram_logprob_oracle(),
    "q_bigram_logprob": _bigram_logprob_oracle(),
    "q_kn_lm": _kn_lm_oracle(),
    "q_remove_dup_spans": _remove_dup_spans_oracle(),
    "q_semantic_pairs_frozen": _semantic_pairs_frozen_oracle(),
    "q_literal_map_join": """
    SELECT m.segment_class, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer
    JOIN (VALUES ('AUTOMOBILE', 'consumer'), ('HOUSEHOLD', 'consumer'),
                 ('FURNITURE', 'consumer'), ('BUILDING', 'industrial'),
                 ('MACHINERY', 'industrial')) AS m(seg, segment_class)
      ON c_mktsegment = m.seg
    GROUP BY m.segment_class
    ORDER BY m.segment_class
    """,
    "q_sql_api": """
    SELECT n_name AS nation, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY nation
    """,
    "q_window_frame": """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS order_date, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT order_date, n_orders,
           CAST(SUM(n_orders) OVER (
               ORDER BY order_date
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_4d,
           CAST(SUM(n_orders) OVER (
               ORDER BY order_date
               ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS BIGINT) AS leading_3d,
           CAST(MAX(n_orders) OVER (
               ORDER BY order_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS peak_to_date
    FROM daily
    ORDER BY order_date
    """,
    "q_sliding_window": """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events
        FROM events GROUP BY 1
    )
    SELECT event_date, n_events,
           CAST(SUM(n_events) OVER (
               ORDER BY event_date
               RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_7d
    FROM daily
    ORDER BY event_date
    """,
    "q_events_daily": """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS event_date,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases
        FROM events
        GROUP BY 1
    )
    SELECT event_date, n_events, n_users, n_purchases,
           CAST(SUM(n_events) OVER (
               ORDER BY event_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_events
    FROM daily
    ORDER BY event_date
    """,
    "q_topk": """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    "q_icd_truncate": """
    WITH codes AS (
        SELECT 'EVT:' || replace(event_type, '.', '') AS concept_cd, user_id
        FROM events
    )
    SELECT left(replace(substring(concept_cd, 5, 999), '.', ''), 3) AS code_3chars,
           COUNT(*) AS n_obs,
           COUNT(DISTINCT user_id) AS n_users
    FROM codes
    GROUP BY 1
    ORDER BY code_3chars
    """,
    # gopher_filter / build_vocab: never registered (50-slot window);
    # full-signal parity here.  round6 = FLOOR(x*1e6 + 0.5)/1e6 on both
    # engines; token split mirrors tokens() (trim first, [] for blank).
    "q_gopher_quality": """
    WITH toked AS (
        SELECT doc_id, text,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks,
               list_filter(string_split(text, chr(10)),
                           ln -> trim(ln) <> '') AS lines
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_words,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE FLOOR((CAST(list_sum(list_transform(toks,
                             t -> length(t))) AS DOUBLE) / len(toks))
                         * 1000000 + 0.5) / 1000000 END AS mean_word_len,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE FLOOR(((length(text) - length(replace(text, '#', ''))
                          + CAST(length(text) - length(replace(text, '...', ''))
                                 AS DOUBLE) / 3)
                         / len(toks)) * 1000000 + 0.5) / 1000000
               END AS symbol_ratio,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE FLOOR((CAST(list_sum(list_transform(toks,
                             t -> CASE WHEN regexp_matches(t, '[A-Za-z]')
                                       THEN 1 ELSE 0 END)) AS DOUBLE)
                         / len(toks)) * 1000000 + 0.5) / 1000000
               END AS alpha_word_frac,
               CASE WHEN len(lines) = 0 THEN 0.0
                    ELSE FLOOR((CAST(len(list_filter(lines,
                             ln -> starts_with(trim(ln), '- ')
                                OR starts_with(trim(ln), '* ')
                                OR starts_with(trim(ln), '• '))) AS DOUBLE)
                         / len(lines)) * 1000000 + 0.5) / 1000000
               END AS bullet_line_frac,
               CASE WHEN len(lines) = 0 THEN 0.0
                    ELSE FLOOR((CAST(len(list_filter(lines,
                             ln -> ends_with(trim(ln), '...'))) AS DOUBLE)
                         / len(lines)) * 1000000 + 0.5) / 1000000
               END AS ellipsis_line_frac,
               CAST(len(list_intersect(list_transform(toks, t -> lower(t)),
                    ['the','be','to','of','and','that','have','with']))
                    AS BIGINT) AS stop_hits
        FROM toked
    )
    SELECT *,
           (n_words BETWEEN 10 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND symbol_ratio < 0.1
            AND alpha_word_frac > 0.8
            AND bullet_line_frac < 0.9
            AND ellipsis_line_frac < 0.3
            AND stop_hits >= 2) AS passes
    FROM sig
    ORDER BY doc_id
    """,
    "q_vocab": """
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
        FROM documents WHERE trim(text) <> ''
    ),
    counts AS (SELECT token, COUNT(*) AS n FROM toks GROUP BY token),
    top AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 100)
    SELECT token, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
    FROM top
    ORDER BY rank
    """,
    # PII redaction + repetition ratios; PII injected per doc so every
    # row exercises the regexes (order matters: email, IP, then phone).
    "q_text_hygiene": """
    WITH dirty AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com at 10.0.0.1 or +1 (555) 123-4567 now'
                   AS dirty
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(dirty,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g'),
                   '\\+?\\d(?:[\\s().-]*\\d){8,}', '<PHONE>', 'g')
                   AS clean_text,
               list_filter(string_split(dirty, chr(10)),
                           ln -> trim(ln) <> '') AS lines,
               CASE WHEN trim(dirty) = '' THEN []
                    ELSE regexp_split_to_array(trim(dirty), '\\s+') END AS toks
        FROM dirty
    )
    SELECT doc_id, clean_text,
           CASE WHEN len(lines) = 0 THEN 0.0
                ELSE FLOOR((CAST(len(lines) - len(list_distinct(lines))
                                 AS DOUBLE) / len(lines)) * 1000000 + 0.5)
                     / 1000000 END AS dup_line_frac,
           CASE WHEN len(toks) < 2 THEN 0.0
                ELSE FLOOR((CAST((len(toks) - 1)
                         - len(list_distinct([array_to_string(toks[i:i+1], ' ')
                                              FOR i IN range(1, len(toks))]))
                                 AS DOUBLE) / (len(toks) - 1)) * 1000000 + 0.5)
                     / 1000000 END AS dup_2gram_frac
    FROM sig
    ORDER BY doc_id
    """,
    # Per-entity daily resample + forward fill (timeseries.py).
    "q_resample_fill": """
    WITH per_day AS (
        SELECT user_id, CAST(ts AS DATE) AS day, MAX(value) AS value
        FROM events GROUP BY 1, 2
    ),
    span AS (
        SELECT user_id, MIN(day) AS lo, MAX(day) AS hi FROM per_day GROUP BY 1
    ),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                           CAST(hi AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM span
    ),
    joined AS (
        SELECT s.user_id, s.day, p.value
        FROM spine s LEFT JOIN per_day p USING (user_id, day)
    )
    SELECT user_id, day,
           FLOOR((last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
               * 1000000 + 0.5) / 1000000 AS value_ff
    FROM joined
    ORDER BY user_id, day
    """,
    # NFC normalization: Spark pandas_udf vs DuckDB's built-in.
    "q_unicode_normalize": """
    SELECT doc_id,
           nfc_normalize(text || ' cafe\u0301 nai\u0308ve') AS text_nfc
    FROM documents
    ORDER BY doc_id
    """,
    # q_profile: deregistered round 3 (slot given to q_semantic_dedup).
    "q_profile": """
    WITH p AS (
        SELECT 'o_custkey' AS column_name, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               COUNT(DISTINCT o_custkey) AS n_distinct,
               MIN(CAST(o_custkey AS VARCHAR)) AS min_value,
               MAX(CAST(o_custkey AS VARCHAR)) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', COUNT(*),
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               COUNT(DISTINCT o_orderstatus),
               MIN(CAST(o_orderstatus AS VARCHAR)),
               MAX(CAST(o_orderstatus AS VARCHAR))
        FROM orders
    )
    SELECT column_name, n_rows, n_null, n_distinct, min_value, max_value,
           FLOOR((CAST(n_null AS DOUBLE) / n_rows) * 1000000 + 0.5) / 1000000
               AS null_rate
    FROM p
    ORDER BY column_name
    """,
    # tfidf_top_terms: distributed TF-IDF (vocabulary unknown at plan
    # time) — never registered; parity here only.
    "q_tfidf_top_terms": """
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents WHERE trim(text) <> ''
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
               FLOOR((tf.tf * ln((n_docs + 1.0) / (df.df + 1.0)))
                     * 1000000 + 0.5) / 1000000 AS tfidf
        FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, tfidf,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        FROM scored
    )
    WHERE rank <= 3
    ORDER BY doc_id, rank
    """,

    # X70 spider-trap detection (round 12): the oracle RE-DERIVES every
    # reason code from the URL string with DuckDB list functions — the
    # same parse (authority stripped, fragment out, path vs query) and
    # the same thresholds as operators/traps.py trap_signals, not a
    # constant replay of the construction.
    "q_trap_detection": """
    WITH urls AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               'http://' || source || '.example.com' ||
               CASE CAST(doc_id % 6 AS INT)
                 WHEN 0 THEN '/p' || CAST(doc_id AS VARCHAR)
                 WHEN 1 THEN '/a/b/a/b/a'
                 WHEN 2 THEN '/2026/08/16/2026/08/17/2026'
                 WHEN 3 THEN '/p?phpsessid=' || CAST(doc_id AS VARCHAR)
                 WHEN 4 THEN '/p?x=1&x=2&x=3'
                 ELSE '/s0/s1/s2/s3/s4/s5/s6/s7/s8/s9/s10/s11/s12/s13/s14/s15/s16'
               END AS url
        FROM documents
    ),
    parsed AS (
        SELECT doc_id, url,
               regexp_extract(url, '^[^:/?#]+://[^/?#]*([^#]*)', 1) AS rest
        FROM urls
    ),
    parts AS (
        SELECT doc_id, url,
               list_filter(string_split(
                   regexp_extract(rest, '^([^?]*)', 1), '/'),
                   s -> s <> '') AS segs,
               list_filter(string_split(
                   regexp_extract(rest, '\\?(.*)$', 1), '&'),
                   p -> p <> '') AS params
        FROM parsed
    ),
    sig AS (
        SELECT doc_id,
               len(segs) > 16 AS f_depth,
               length(url) > 2048 AS f_long_url,
               COALESCE(list_aggregate(
                   list_transform(segs, s -> length(s)), 'max'), 0)
                   > 128 AS f_long_segment,
               len(params) > 12 AS f_params,
               len(list_filter(segs,
                   s -> regexp_matches(s, '^[0-9]+$'))) >= 6
                   AS f_numeric_run,
               COALESCE(list_aggregate(list_transform(segs[1:64],
                   s -> len(list_filter(segs[1:64], x -> x = s))),
                   'max'), 0) >= 3 AS f_repeat_segment,
               COALESCE(list_aggregate(list_transform(
                   list_transform(params[1:64],
                       p -> regexp_extract(p, '^([^=]*)', 1)),
                   k -> len(list_filter(
                       list_transform(params[1:64],
                           p -> regexp_extract(p, '^([^=]*)', 1)),
                       x -> x = k))), 'max'), 0) >= 3
                   AS f_repeat_param_key,
               len(list_filter(list_transform(params,
                   p -> regexp_extract(p, '^([^=]*)', 1)),
                   k -> regexp_matches(lower(k),
                       '^(phpsessid|jsessionid|sessionid|session_id|sess_id|sid|s_id|cfid|cftoken|oscsid|zenid|aspsessionid[a-z0-9]*)$')))
                   > 0 AS f_session_param
        FROM parts
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_filter([
               CASE WHEN f_depth THEN 'depth' END,
               CASE WHEN f_long_url THEN 'long_url' END,
               CASE WHEN f_long_segment THEN 'long_segment' END,
               CASE WHEN f_params THEN 'params' END,
               CASE WHEN f_numeric_run THEN 'numeric_run' END,
               CASE WHEN f_repeat_segment THEN 'repeat_segment' END,
               CASE WHEN f_repeat_param_key THEN 'repeat_param_key' END,
               CASE WHEN f_session_param THEN 'session_param' END
           ], x -> x IS NOT NULL)), ','), '') AS reasons,
           (f_depth OR f_long_url OR f_long_segment OR f_params
            OR f_numeric_run OR f_repeat_segment OR f_repeat_param_key
            OR f_session_param) AS is_trap
    FROM sig
    ORDER BY doc_id
    """,

    "q_url_templates": """
    WITH urls AS (
        SELECT 'http://h' || CAST(doc_id % 3 AS VARCHAR)
               || '.example.com' ||
               CASE CAST(doc_id % 5 AS INT)
                 WHEN 0 THEN '/item/' || CAST(doc_id AS VARCHAR)
                 WHEN 1 THEN '/about'
                 WHEN 2 THEN '/post/' || CAST(doc_id AS VARCHAR)
                             || '/comments'
                 WHEN 3 THEN '/p?page=' || CAST(doc_id AS VARCHAR)
                             || '&sort=asc'
                 ELSE '/d/' || md5(CAST(doc_id AS VARCHAR))
               END AS u
        FROM documents
    ),
    parsed AS (
        SELECT u,
               lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
                   AS scheme,
               regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1)
                   AS rest
        FROM urls
    ),
    pieces AS (
        SELECT u, scheme,
               lower(regexp_extract(rest, '^([^/?#]*)', 1)) AS host,
               regexp_extract(rest, '^[^/?#]*([^?]*)', 1) AS path,
               regexp_extract(rest, '\\?(.*)$', 1) AS query
        FROM parsed
    ),
    tpl AS (
        SELECT u,
               scheme || '://' || host ||
               regexp_replace(
                   regexp_replace(path, '[0-9a-fA-F]{16,}', '{H}', 'g'),
                   '[0-9]+', '{N}', 'g') ||
               CASE WHEN len(list_filter(string_split(query, '&'),
                                         x -> x <> '')) > 0
                    THEN '?' || array_to_string(
                        list_sort(list_distinct(list_transform(
                            list_filter(string_split(query, '&'),
                                        x -> x <> ''),
                            x -> regexp_extract(x, '^([^=]*)', 1)))),
                        '&')
                    ELSE '' END AS template
        FROM pieces
    ),
    agg AS (
        SELECT template,
               COUNT(*) AS n_urls,
               MIN(u) AS sample_url,
               lower(regexp_extract(template, '^[^:]+://([^/?#]*)', 1))
                   AS host
        FROM tpl
        GROUP BY template
    )
    SELECT host, template, n_urls, sample_url,
           SUM(n_urls) OVER (PARTITION BY host) AS host_urls,
           FLOOR(CAST(n_urls AS DOUBLE)
                 / SUM(n_urls) OVER (PARTITION BY host)
                 * 1000000.0 + 0.5) / 1000000.0 AS host_share
    FROM agg
    ORDER BY template
    """,

    # X73 DUST parameter-rule mining (round 12): the oracle replays
    # the FULL mining pipeline — key unnest, residual reconstruction
    # (key's params removed, rest sorted), the min(fp)=max(fp) group
    # consistency trick, the >= 2-URL support filter, and the per-key
    # rollup with the rule thresholds (min_support=5, consistency=1.0).
    "q_dust_rules": """
    WITH pages AS (
        SELECT DISTINCT
               'http://h' || CAST(doc_id % 2 AS VARCHAR)
               || '.example.com/page' || CAST(doc_id % 3 AS VARCHAR)
               || '?id=' || CAST(doc_id % 5 AS VARCHAR)
               || '&ref=' || CAST(doc_id % 4 AS VARCHAR) AS url,
               md5(CAST(doc_id % 3 AS VARCHAR) || '|'
                   || CAST(doc_id % 5 AS VARCHAR)) AS fp
        FROM documents
    ),
    parsed AS (
        SELECT url, fp,
               lower(regexp_extract(
                   regexp_extract(url,
                       '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1),
                   '^([^/?#]*)', 1)) AS host,
               regexp_extract(url, '^([^?#]*)', 1) AS base,
               list_filter(
                   string_split(
                       regexp_extract(
                           regexp_extract(url,
                               '^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)', 1),
                           '\\?(.*)$', 1),
                       '&'),
                   p -> p <> '') AS params
        FROM pages
    ),
    exploded AS (
        SELECT url, fp, host, base, params,
               UNNEST(list_distinct(list_transform(
                   params, p -> regexp_extract(p, '^([^=]*)', 1))))
                   AS param_key
        FROM parsed
    ),
    with_residual AS (
        SELECT host, param_key, fp,
               base ||
               CASE WHEN len(list_filter(params,
                        p -> regexp_extract(p, '^([^=]*)', 1)
                             <> param_key)) > 0
                    THEN '?' || array_to_string(
                        list_sort(list_filter(params,
                            p -> regexp_extract(p, '^([^=]*)', 1)
                                 <> param_key)), '&')
                    ELSE '' END AS residual
        FROM exploded
    ),
    groups AS (
        SELECT host, param_key, residual,
               COUNT(*) AS n_urls,
               (MIN(fp) = MAX(fp)) AS same
        FROM with_residual
        GROUP BY host, param_key, residual
    )
    SELECT host, param_key,
           COUNT(*) AS n_groups,
           SUM(CASE WHEN same THEN 1 ELSE 0 END) AS n_consistent,
           FLOOR(CAST(SUM(CASE WHEN same THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
               AS consistency,
           (COUNT(*) >= 5
            AND CAST(SUM(CASE WHEN same THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) >= 1.0) AS is_rule
    FROM groups
    WHERE n_urls >= 2
    GROUP BY host, param_key
    ORDER BY host, param_key
    """,

    # X81 reciprocal-rank fusion (round 12): the oracle replays BOTH
    # per-list ROW_NUMBER rankings (score desc, id asc — the same tie
    # rule) and the 1/(k+rank) sum with k=60.
    "q_rrf_fusion": """
    WITH lex AS (
        SELECT doc_id,
               CAST((doc_id * 37) % 101 AS DOUBLE) AS s
        FROM documents WHERE doc_id < 30
    ),
    vec AS (
        SELECT doc_id,
               CAST((doc_id * 53) % 97 AS DOUBLE) AS s
        FROM documents WHERE doc_id >= 15 AND doc_id < 45
    ),
    ranked AS (
        SELECT doc_id AS id,
               ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank
        FROM lex
        UNION ALL
        SELECT doc_id AS id,
               ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rank
        FROM vec
    )
    SELECT id,
           FLOOR(SUM(1.0 / (60.0 + rank)) * 1000000000.0 + 0.5)
               / 1000000000.0 AS rrf_score,
           COUNT(*) AS n_lists
    FROM ranked
    GROUP BY id
    ORDER BY rrf_score DESC, id
    """,

    # X82 redirect resolution (round 12): the oracle follows the same
    # functional graph with a RECURSIVE CTE capped at max_hops+1 steps
    # — an entirely different mechanism than the operator's pointer
    # doubling, which is the point of the check.  resolved = the
    # deepest reachable pointer left the src domain within the cap.
    "q_redirects": """
    WITH RECURSIVE edges AS (
        SELECT 'http://r.com/u' || CAST(doc_id AS VARCHAR) AS src,
               'http://r.com/u' || CAST(doc_id - 1 AS VARCHAR) AS dst
        FROM documents WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT 'http://r.com/cycA', 'http://r.com/cycB'
        UNION ALL
        SELECT 'http://r.com/cycB', 'http://r.com/cycA'
    ),
    f AS (SELECT src, MIN(dst) AS dst FROM edges GROUP BY src),
    walk AS (
        SELECT src, dst AS cur, 1 AS hops FROM f
        UNION ALL
        SELECT w.src, f.dst, w.hops + 1
        FROM walk w JOIN f ON w.cur = f.src
        WHERE w.hops <= 32
    ),
    deepest AS (
        SELECT src, arg_max(cur, hops) AS cur, MAX(hops) AS hops
        FROM walk GROUP BY src
    )
    SELECT d.src,
           CASE WHEN s.src IS NULL AND d.hops <= 32 THEN d.cur
           END AS final_url,
           (s.src IS NOT NULL OR d.hops > 32) = FALSE AS resolved,
           CASE WHEN s.src IS NULL AND d.hops <= 32 THEN d.hops
           END AS n_hops
    FROM deepest d
    LEFT JOIN (SELECT DISTINCT src FROM f) s ON d.cur = s.src
    ORDER BY d.src
    """,

    # X85 crawl health report (round 12): the oracle re-derives the
    # host from the URI string and replays the full conditional
    # aggregation (status classes, html yield, truncation, payload
    # sums) plus the derived rates.
    "q_crawl_report": """
    WITH recs AS (
        SELECT 'http://h' || CAST(user_id % 5 AS VARCHAR)
               || '.example.com/p' || CAST(event_id AS VARCHAR) AS uri,
               CASE CAST(event_id % 10 AS INT)
                 WHEN 6 THEN 301 WHEN 7 THEN 404 WHEN 8 THEN 503
                 ELSE 200 END AS status,
               CASE WHEN event_id % 10 <= 5
                        THEN 'text/html; charset=utf-8'
                    WHEN event_id % 10 = 9 THEN 'application/json'
               END AS ctype,
               CAST(FLOOR(value * 10) AS BIGINT) AS plen,
               (event_id % 13 = 0) AS trunc
        FROM events
    ),
    agg AS (
        SELECT regexp_extract(uri, '^[a-z]+://([^/]+)', 1) AS host,
               COUNT(*) AS n_fetches,
               SUM(CASE WHEN status BETWEEN 200 AND 299 THEN 1 ELSE 0 END)
                   AS n_ok,
               SUM(CASE WHEN status BETWEEN 300 AND 399 THEN 1 ELSE 0 END)
                   AS n_redirect,
               SUM(CASE WHEN status BETWEEN 400 AND 499 THEN 1 ELSE 0 END)
                   AS n_client_err,
               SUM(CASE WHEN status BETWEEN 500 AND 599 THEN 1 ELSE 0 END)
                   AS n_server_err,
               SUM(CASE WHEN status BETWEEN 200 AND 299
                         AND regexp_matches(ctype, '^(?i)text/html\\b')
                        THEN 1 ELSE 0 END) AS n_html,
               SUM(CASE WHEN trunc THEN 1 ELSE 0 END) AS n_truncated,
               SUM(plen) AS total_payload_bytes
        FROM recs
        GROUP BY 1
    )
    SELECT host, n_fetches, n_ok, n_redirect, n_client_err,
           n_server_err, n_html, n_truncated, total_payload_bytes,
           FLOOR(CAST(n_ok AS DOUBLE) / n_fetches
                 * 1000000.0 + 0.5) / 1000000.0 AS ok_rate,
           FLOOR(CAST(n_server_err AS DOUBLE) / n_fetches
                 * 1000000.0 + 0.5) / 1000000.0 AS server_err_rate,
           FLOOR(CAST(total_payload_bytes AS DOUBLE) / n_fetches
                 * 1000.0 + 0.5) / 1000.0 AS avg_payload_bytes
    FROM agg
    ORDER BY host
    """,
}


# q_simhash_pairs ceded its registered slot to q_recrawl_schedule in
# round 12; its FULL-arithmetic oracle is generated (64 bit-vote columns)
# so it is imported from its author rather than duplicated here.
from covid19i2b2_spark.queries.llm2 import _simhash_oracle  # noqa: E402

UNREGISTERED_ORACLES["q_simhash_pairs"] = _simhash_oracle()

# Round 14: q_fingerprint and q_embedding_near_dup ceded their registered
# slots to q_lang_id / q_suffix_array (VERDICT r13 next-round #1); their
# oracles are preserved verbatim at their authors and imported here.
from covid19i2b2_spark.queries.llm import (  # noqa: E402
    FINGERPRINT_ORACLE,
    _near_dup_oracle,
)

UNREGISTERED_ORACLES["q_fingerprint"] = FINGERPRINT_ORACLE
UNREGISTERED_ORACLES["q_embedding_near_dup"] = _near_dup_oracle(0.3)

# X89 q_license_extract was parity-pinned here in round 14 and
# REGISTERED in round 15 — its construction-derived oracle moved
# verbatim to the @query decorator in queries/llm3.py.
# q_semantic_dedup ceded the slot (the embedding-similarity family
# keeps q_ann_ivf + q_knn_join registered); its oracle is preserved
# verbatim at its author and imported below.
# X90 q_exact_substr_dedup was parity-pinned here in round 14 and
# REGISTERED in round 15 (VERDICT r14 next #5) — its brute-force
# window-replay oracle moved verbatim to the @query decorator in
# queries/llm3.py and now runs under test_query_matches_oracle AND the
# driver gate.  q_scalar_funcs ceded the slot; its oracle is preserved
# verbatim below.
# X92 media perceptual signatures (round 15): the oracle replays the
# blockhash arithmetic from the characters — block of byte i = i*65//n,
# per-block sums, cross-multiplied adjacent comparisons, HUGEINT bit
# fold with the signed bit-63 wrap (corpus is printable ASCII, so the
# utf-8 payload byte equals ord(char)).
UNREGISTERED_ORACLES["q_media_phash"] = """
    WITH docs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id, text AS t,
               length(text) AS n
        FROM documents
        WHERE doc_id < 150 AND length(text) >= 65
    ),
    bytes AS (
        SELECT doc_id, n,
               unnest(range(0, n)) AS i,
               unnest([ord(t[CAST(i + 1 AS INT):CAST(i + 1 AS INT)])
                       FOR i IN range(0, n)]) AS v
        FROM docs
    ),
    blocks AS (
        -- // is INTEGER floor division: plain / is float division and
        -- DuckDB's float->int CAST rounds where Spark's truncates
        SELECT doc_id, (i * 65) // n AS blk,
               SUM(v) AS s, COUNT(*) AS c
        FROM bytes GROUP BY doc_id, (i * 65) // n
    ),
    bits AS (
        SELECT a.doc_id, a.blk,
               CASE WHEN b.s * a.c > a.s * b.c THEN 1 ELSE 0 END AS bit
        FROM blocks a JOIN blocks b
          ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
    ),
    sigs AS (
        SELECT doc_id,
               SUM(CASE WHEN bit = 1
                        THEN (1::HUGEINT << CAST(blk AS INT))
                        ELSE 0::HUGEINT END) AS h
        FROM bits GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(CASE WHEN h >= (1::HUGEINT << 63)
                     THEN h - (1::HUGEINT << 64) ELSE h END
                AS BIGINT) AS phash
    FROM sigs ORDER BY doc_id
"""

UNREGISTERED_ORACLES["q_scalar_funcs"] = """
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           MIN(CAST(o_orderdate AS DATE)) AS first_date,
           MAX(CAST(o_orderdate AS DATE)) AS last_date,
           date_diff('day', MIN(CAST(o_orderdate AS DATE)),
                     MAX(CAST(o_orderdate AS DATE))) AS span_days,
           MIN(CAST(o_orderdate AS DATE)) + 30 AS first_plus_30,
           MIN(LENGTH(o_orderpriority)) AS min_prio_len,
           MAX(UPPER(o_orderstatus)) AS max_status_upper,
           MIN(SUBSTRING(o_orderpriority, 1, 1) || ':' || o_orderstatus)
               AS min_prio_tag,
           CAST(SUM(CASE WHEN NULLIF(o_orderkey % 3, 0) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mod3_zero,
           CAST(SUM(COALESCE(NULLIF(o_orderkey % 3, 0), -1)) AS BIGINT)
               AS sum_effective_mod3
    FROM orders
    GROUP BY 1
    ORDER BY order_month
"""

from covid19i2b2_spark.queries.llm2 import (  # noqa: E402
    _semantic_dedup_oracle,
)

UNREGISTERED_ORACLES["q_semantic_dedup"] = _semantic_dedup_oracle()



# X88 exact duplicated spans (round 13): brute force over EVERY m-char
# window — group-count, >= 2 threshold, lag/sum maximal-run merge.
UNREGISTERED_ORACLES["q_dup_spans_sa"] = """
    WITH docs AS (
        SELECT CAST(doc_id AS BIGINT) AS doc,
               substr(text, 1, 30)
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' planted shared passage xyz'
                           ELSE '' END AS t
        FROM documents
        WHERE doc_id < 90
    ),
    wins AS (
        SELECT doc,
               unnest(range(1, CAST(greatest(length(t) - 19 + 2, 1)
                                    AS BIGINT))) AS pos,
               unnest([t[CAST(i AS INT):CAST(i + 18 AS INT)]
                       FOR i IN range(1, CAST(greatest(length(t) - 19
                                                       + 2, 1)
                                              AS BIGINT))]) AS w
        FROM docs
    ),
    dupw AS (
        SELECT w FROM wins GROUP BY w HAVING COUNT(*) >= 2
    ),
    dup AS (
        SELECT doc, pos FROM wins JOIN dupw USING (w)
    ),
    runs AS (
        SELECT doc, pos,
               CASE WHEN lag(pos) OVER (PARTITION BY doc ORDER BY pos)
                         IS NULL
                     OR pos - lag(pos) OVER (PARTITION BY doc
                                             ORDER BY pos) > 1
                    THEN 1 ELSE 0 END AS nr
        FROM dup
    ),
    rid AS (
        SELECT doc, pos,
               SUM(nr) OVER (PARTITION BY doc ORDER BY pos) AS run_id
        FROM runs
    )
    SELECT doc,
           MIN(pos) AS span_start,
           CAST(MAX(pos) + 19 - 1 AS BIGINT) AS span_end,
           COUNT(*) AS n_starts
    FROM rid
    GROUP BY doc, run_id
    ORDER BY doc, span_start
"""


@pytest.mark.parametrize("name", sorted(UNREGISTERED_ORACLES))
def test_unregistered_query_matches_oracle(name, spark, duck):
    from covid19i2b2_spark.queries import (
        core,
        filters,
        joins,
        llm,
        llm2,
        llm3,
        reshape,
        scalar,
        windows,
    )

    def _tfidf(spark, sf_dir):
        from covid19i2b2_spark.operators.ranking import tfidf_top_terms
        from covid19i2b2_spark.sources.tables import read_table

        docs = read_table(spark, sf_dir, "documents")
        return tfidf_top_terms(docs, "doc_id", "text", top_per_doc=3)

    fn = {
        "q_literal_map_join": joins.q_literal_map_join,
        "q_sql_api": core.q_sql_api,
        "q_window_frame": windows.q_window_frame,
        "q_sliding_window": reshape.q_sliding_window,
        "q_events_daily": core.q_events_daily,
        "q_topk": filters.q_topk,
        "q_icd_truncate": scalar.q_icd_truncate,
        "q_profile": reshape.q_profile,
        "q_tfidf_top_terms": _tfidf,
        "q_gopher_quality": llm3.q_gopher_quality,
        "q_vocab": llm3.q_vocab,
        "q_text_hygiene": llm3.q_text_hygiene,
        "q_unicode_normalize": llm3.q_unicode_normalize,
        "q_resample_fill": reshape.q_resample_fill,
        "q_semantic_pairs_frozen": llm3.q_semantic_pairs_frozen,
        "q_cosine_topk": llm.q_cosine_topk,
        "q_url_dedup": llm3.q_url_dedup,
        "q_frontier_schedule": llm3.q_frontier_schedule,
        "q_filter_disallowed": llm3.q_filter_disallowed,
        "q_dedup_provenance": llm3.q_dedup_provenance,
        "q_containment": llm3.q_containment,
        "q_anchor_texts": llm3.q_anchor_texts,
        "q_ngram_jaccard": llm2.q_ngram_jaccard,
        "q_snapshot_drift": llm3.q_snapshot_drift,
        "q_phrase_search": llm3.q_phrase_search,
        "q_minhash_poly": llm3.q_minhash_poly,
        "q_chunk_documents": llm3.q_chunk_documents,
        "q_quality_classifier": llm3.q_quality_classifier,
        "q_mixture_sample": llm3.q_mixture_sample,
        "q_dup_passages": llm3.q_dup_passages,
        "q_unigram_logprob": llm3.q_unigram_logprob,
        "q_topk_sketch": llm3.q_topk_sketch,
        "q_row_number": windows.q_row_number,
        "q_bpe_pairs": llm3.q_bpe_pairs,
        "q_bigram_logprob": llm3.q_bigram_logprob,
        "q_kn_lm": llm3.q_kn_lm,
        "q_remove_dup_spans": llm3.q_remove_dup_spans,
        "q_token_budget_grouped": llm3.q_token_budget_grouped,
        "q_top_fraction": llm3.q_top_fraction,
        "q_join_left": joins.q_join_left,
        "q_corpus_divergence": llm3.q_corpus_divergence,
        "q_unigram_seed": llm3.q_unigram_seed,
        "q_embedding_centroids": llm2.q_embedding_centroids,
        "q_trap_detection": llm3.q_trap_detection,
        "q_url_templates": llm3.q_url_templates,
        "q_dust_rules": llm3.q_dust_rules,
        "q_rrf_fusion": llm3.q_rrf_fusion,
        "q_redirects": llm3.q_redirects,
        "q_crawl_report": llm3.q_crawl_report,
        "q_simhash_pairs": llm2.q_simhash_pairs,
        "q_dup_spans_sa": llm3.q_dup_spans_sa,
        "q_fingerprint": llm.q_fingerprint,
        "q_embedding_near_dup": llm.q_embedding_near_dup,
        "q_semantic_dedup": llm2.q_semantic_dedup,
        "q_scalar_funcs": scalar.q_scalar_funcs,
        "q_media_phash": llm3.q_media_phash,
    }[name]
    spark_pdf = fn(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(UNREGISTERED_ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_approx_distinct_error_bound(spark):
    """q_approx_distinct (deregistered): HLL++ at rsd=0.01 must sit within
    5% of the exact distinct counts per group."""
    from covid19i2b2_spark.queries.aggregates import q_approx_distinct

    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in q_approx_distinct(spark, SF_DIR).collect()
    }
    from covid19i2b2_spark.sources.tables import read_table
    from pyspark.sql import functions as F

    exact = {
        r["o_orderpriority"]: r["n"]
        for r in read_table(spark, SF_DIR, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n_exact in exact.items():
        assert abs(approx[k] - n_exact) <= max(2, 0.05 * n_exact), k


def test_percentiles_approx_error_bound(spark):
    """q_percentiles_approx (deregistered): GK sketch p50 within 3% of the
    exact percentile per group (measured ~1.1% at sf0.001 group sizes;
    the sketch tightens as groups grow)."""
    from covid19i2b2_spark.queries.reshape import (
        q_percentiles,
        q_percentiles_approx,
    )

    approx = {
        r["o_orderpriority"]: r["p50_approx"]
        for r in q_percentiles_approx(spark, SF_DIR).collect()
    }
    exact = {
        r["o_orderpriority"]: r["p50"] for r in q_percentiles(spark, SF_DIR).collect()
    }
    for k, p50 in exact.items():
        assert abs(approx[k] - p50) <= 0.03 * abs(p50) + 1e-6, k
