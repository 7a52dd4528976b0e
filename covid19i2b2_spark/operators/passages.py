"""Cross-document duplicate-passage mining (SURVEY.md §2.11 extension —
the passage-level cousin of line_dedup: find k-token runs that repeat
across documents, the signal used to strip templated boilerplate and to
audit inter-document copying before training).

Scale shape: one narrow projection builds each document's k-token
passage hashes with positions (n - k + 1 rows per doc through ONE
posexplode), one map-side-combined groupBy on the passage key (key
space = distinct passages), and a semi-join back for the span listing.
No cartesian anything: documents only meet through the passage-key
aggregate, exactly like line_dedup's doc-frequency pass.

Hash modes follow the house pattern: 'xxhash64' (JVM intrinsic — the
100 TB hot path) or 'poly' (base-1009 codepoint polynomial over the
joined passage string, bit-for-bit reproducible in an ANSI engine — the
DuckDB-parity mode, see tests/test_oracle_parity.py q_dup_passages).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.text import normalize_text, tokens

_POLY_B = 1009
_POLY_P = 9_007_199_254_740_881  # largest prime < 2^53


def _passage_text(toks: Column | str, pos: Column, k: int) -> Column:
    return F.array_join(F.slice(toks, pos, k), " ")


def _passage_hash(passage: Column, hash_impl: str) -> Column:
    if hash_impl == "xxhash64":
        return F.xxhash64(passage)
    if hash_impl == "poly":
        cps = F.transform(
            F.sequence(F.lit(1), F.length(passage)),
            lambda i: F.ascii(F.substring(passage, i, F.lit(1))).cast("long"),
        )
        return F.aggregate(
            cps,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * _POLY_B + c) % _POLY_P,
        )
    raise ValueError(f"hash_impl must be 'xxhash64' or 'poly' (got {hash_impl!r})")


def passage_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """(id_col, pos, passage_hash) for every k-token window of the
    normalized text (pos is the 1-based token offset).  Documents with
    fewer than k tokens emit nothing — a sub-k run is not a passage."""
    toked = df.select(
        F.col(id_col), tokens(normalize_text(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    spans = toked.filter(F.col("__n") >= k).select(
        F.col(id_col),
        F.col("__toks"),
        F.explode(F.sequence(F.lit(1), F.col("__n") - (k - 1))).alias("pos"),
    )
    return spans.select(
        F.col(id_col),
        F.col("pos").cast("long"),
        _passage_hash(_passage_text("__toks", F.col("pos"), k), hash_impl).alias(
            "passage_hash"
        ),
    )


def duplicate_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Passages appearing in >= ``min_docs`` DISTINCT documents, with
    occurrence stats and the earliest witness: (passage_hash, n_docs,
    n_occurrences, first_doc, first_pos, passage_text).

    first_* / passage_text come from min_by over (doc, pos) — the
    deterministic earliest occurrence, so output is retry-stable.  The
    aggregate carries the passage text through min_by rather than a
    join-back, keeping this a single-shuffle plan."""
    toked = df.select(
        F.col(id_col), tokens(normalize_text(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    spans = (
        toked.filter(F.col("__n") >= k)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.col("__n") - (k - 1))).alias(
                "pos"
            ),
            F.col("__toks"),
        )
        .select(
            F.col(id_col),
            F.col("pos"),
            _passage_text("__toks", F.col("pos"), k).alias("__ptxt"),
        )
        .withColumn("passage_hash", _passage_hash(F.col("__ptxt"), hash_impl))
    )
    order_key = F.col(id_col).cast("long") * F.lit(1_000_000_000) + F.col("pos")
    return (
        spans.groupBy("passage_hash")
        .agg(
            F.count_distinct(id_col).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.min(id_col).cast("long").alias("first_doc"),
            F.min_by(F.col("pos"), order_key).cast("long").alias("first_pos"),
            F.min_by(F.col("__ptxt"), order_key).alias("passage_text"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    min_docs: int = 2,
    hash_impl: str = "xxhash64",
    out_col: str = "text_deduped",
) -> DataFrame:
    """Cut cross-document duplicated runs OUT of each document — the
    removal side of passage mining (the Lee et al. 2022 "Deduplicating
    Training Data Makes Language Models Better" treatment, with fixed-k
    window chaining standing in for suffix arrays: overlapping
    duplicated k-windows merge into maximal excised spans by
    construction, so any shared run of length >= k is removed whole).

    Adds ``out_col`` and ``n_removed_tokens``.  Documents WITH an
    excision are re-rendered from the normalized token stream the
    mining operates on (lowercased, whitespace-collapsed — excision
    positions only exist in that stream; '' when everything was
    boilerplate); documents with NOTHING removed keep their ORIGINAL
    text byte-for-byte, so enabling this pass never case-folds or
    reflows the clean part of a corpus.

    Plan: the corpus tokenizes ONCE (both the span mining and the
    position explode read the same frame); passage keys aggregate to
    doc-frequencies (map-side combine), duplicated starts come back via
    one semi-join, covered positions explode to at most k rows per
    duplicated start, and reconstruction is one anti-join + one per-doc
    sort_array fold.  Shuffles are bounded by token count — the honest
    cost of exact substring dedup; run AFTER the cheap document-level
    passes in a curation chain."""
    toked = df.select(
        F.col(id_col), tokens(normalize_text(text_col)).alias("__toks")
    )
    n_toks = F.size("__toks")
    spans = (
        toked.filter(n_toks >= k)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.explode(F.sequence(F.lit(1), n_toks - (k - 1))).alias("pos"),
        )
        .select(
            F.col(id_col),
            F.col("pos").cast("long"),
            _passage_hash(
                _passage_text("__toks", F.col("pos"), k), hash_impl
            ).alias("passage_hash"),
        )
    )
    dup_keys = (
        spans.groupBy("passage_hash")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("passage_hash")
    )
    covered = (
        spans.join(dup_keys, "passage_hash", "left_semi")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (k - 1))
            ).alias("__p"),
        )
        .distinct()
    )
    toks_pos = toked.select(
        F.col(id_col),
        F.posexplode("__toks").alias("__p0", "__tok"),
    ).select(id_col, (F.col("__p0") + 1).cast("long").alias("__p"), "__tok")
    kept = toks_pos.join(covered, [id_col, "__p"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__p"), F.col("__tok")))
                ),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias(out_col)
    )
    removed = covered.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_removed_tokens")
    )
    n_removed = F.coalesce(F.col("n_removed_tokens"), F.lit(0).cast("long"))
    return (
        df.join(rebuilt, id_col, "left")
        .join(removed, id_col, "left")
        .select(
            df["*"],
            # untouched docs keep their ORIGINAL text; only excised docs
            # re-render from the normalized stream
            F.when(
                n_removed > 0, F.coalesce(F.col(out_col), F.lit(""))
            )
            .otherwise(F.col(text_col))
            .alias(out_col),
            n_removed.alias("n_removed_tokens"),
        )
    )


def remove_duplicate_spans_cascade(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    k_min: int = 2,
    min_docs: int = 2,
    hash_impl: str = "xxhash64",
    out_col: str = "text_deduped",
) -> DataFrame:
    """The k-cascade closing of :func:`remove_duplicate_spans`' sub-k
    blind spot (VERDICT r9 #6): a single fixed-k pass cannot see a
    shared run SHORTER than k by construction (no k-window fits inside
    it).  The cascade re-runs the pass at halving window sizes —
    k, k/2, ..., down to and always including ``k_min`` — so every
    cross-document run of length >= k_min is excised in at most
    ceil(log2(k / k_min)) + 1 bounded passes, each the same
    token-bounded single-shuffle pipeline.

    What this is and is not: runs of length < k_min still survive
    (pinned with a planted-residual test — at the k=8, k_min=2
    default that residual is single shared TOKENS, which no substring
    dedup should remove); and like any pass-over-rewritten-text
    scheme, excising a span can stitch its neighbors into a NEW
    k'-gram an exact suffix-array method (which matches against the
    ORIGINAL text) would not form — later passes may therefore remove
    slightly more than the suffix-array answer.  Both edges are the
    documented trade for staying inside the one-shuffle window plan
    (PLANS.md has the derivation); corpora needing the exact semantics
    want a true suffix-array pass, which Spark expresses poorly.

    ``n_removed_tokens`` accumulates across passes, counted in each
    pass's own normalized stream (a pass-2 token count of text pass 1
    already reflowed — additive and monotone, but not a substring
    count of the original)."""
    if k_min < 1:
        raise ValueError(f"k_min must be >= 1, got {k_min}")
    if k_min > k:
        raise ValueError(f"k_min ({k_min}) must be <= k ({k})")
    sizes = []
    cur = k
    while cur > k_min:
        sizes.append(cur)
        cur //= 2
    sizes.append(k_min)
    out = df
    total = F.lit(0).cast("long")
    src = text_col
    for i, size in enumerate(sizes):
        step_col = f"__cascade_{i}"
        out = remove_duplicate_spans(
            out, id_col, src, k=size, min_docs=min_docs,
            hash_impl=hash_impl, out_col=step_col,
        ).withColumnRenamed("n_removed_tokens", f"__nrem_{i}")
        total = total + F.col(f"__nrem_{i}")
        src = step_col
    keep = [c for c in df.columns]
    return out.select(
        *keep,
        F.col(src).alias(out_col),
        total.alias("n_removed_tokens"),
    )
