"""X62: asymmetric containment join — find documents whose n-gram set
is (mostly) CONTAINED in another document's (SURVEY §2.11 extension;
round 11).  Jaccard-family dedup (X2 MinHash / X2'' n-gram) misses the
partial-copy case on purpose: a 50-word snippet quoted inside a
5000-word page has tiny Jaccard but containment ~1, and a training
corpus keeping both feeds the model the snippet twice.  Containment

    c(A, B) = |grams(A) ∩ grams(B)| / |grams(A)|

is the asymmetric measure for that (A = the suspected copy, B = the
suspected container); this operator emits every ordered pair with
c(A, B) ≥ t, exactly.

Candidate generation is PREFIX FILTERING (the PPJoin family — Xiao et
al. 2008 — restated for containment): if B holds ≥ t·|A| of A's grams,
then at most ⌊(1-t)·|A|⌋ of A's grams are missing from B, so among any
⌊(1-t)·|A|⌋+1 of A's grams at least one is in B — pigeonhole, no
approximation.  Ordering A's grams by GLOBAL document frequency
(rarest first, ties by gram text — the ED-Join ordering fuzzy.py uses
for edit distance) and taking that prefix makes the join keys each
document's rarest grams, so the candidate join's per-key fan-out is
bounded by how rare "rare" is in the corpus — common-vocab corpora
degrade smoothly toward more candidates, never toward wrong answers
(the planted + brute-force parity tests pin losslessness).

Plan shape (nothing is all-pairs):
1. grams per doc (map-only), explode → global gram df (one aggregate);
2. prefix per doc: explode ⋈ gram-df (gram-keyed equi-join), per-doc
   sort_array(collect_list(struct(df, gram))) + slice — the prefix is
   ⌊(1-t)|A|⌋+1 grams, i.e. ~(1-t) of the gram volume at t=0.8;
3. candidates: prefix grams ⋈ full gram postings (gram-keyed), distinct
   ordered pairs, a ≠ b;
4. verify: one array_intersect per candidate pair against the two gram
   sets (id-keyed joins), filter c ≥ t, round6 like every similarity
   score in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import word_ngrams


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = 2,
    out_a: str = "containee_id",
    out_b: str = "container_id",
    cache_handles: list | None = None,
) -> DataFrame:
    """(containee_id, container_id, containment): every ordered pair
    with c(containee, container) ≥ threshold over word ``n``-gram
    sets, EXACT (prefix filtering is lossless — pigeonhole, see module
    docstring).  Docs with no n-grams (< n tokens) carry no evidence
    and appear on neither side; a doc never pairs with itself.  Ties
    and order are deterministic: the result is a pure function of the
    corpus (sorted-gram prefixes, exact arithmetic).

    The per-doc gram table feeds four consumers (df-count, prefixes,
    postings, verify); pass ``cache_handles`` to persist it once and
    receive the handle for release after the action (the VERDICT r7 #6
    lifecycle discipline) — without it each consumer re-tokenizes."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    grams = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("__g"),
    ).withColumn("__glen", F.size("__g")).filter(F.col("__glen") > 0)
    if cache_handles is not None:
        grams = grams.persist()
        cache_handles.append(grams)
    posting = grams.select(
        "__id", F.explode("__g").alias("__gram")
    )
    gdf = posting.groupBy("__gram").agg(
        F.count("*").cast("long").alias("__gdf")
    )
    # per-doc prefix: rarest ⌊(1-t)|A|⌋+1 grams under the global
    # (df asc, gram asc) order — sort_array on (df, gram) structs is
    # exactly that order, and slice takes the prefix.  The bound is
    # computed with a conservative epsilon: 1-t is not exact in double
    # (1-0.8 = 0.19999999999999996), so a bare floor((1-t)*glen) comes
    # out one short whenever t*glen is an exact integer (t=0.8 with
    # glen a multiple of 5) — one gram short of the pigeonhole bound
    # breaks the EXACT contract when the missing gram is the doc's
    # rarest.  The relative (1+1e-12) + absolute 1e-9 slack strictly
    # dominates double rounding error at any realistic glen and can
    # only ever ENLARGE the prefix by one gram (more candidates, never
    # a missed pair).
    pref_len = (
        F.floor(
            F.lit((1.0 - threshold) * (1.0 + 1e-12)) * F.col("__glen")
            + F.lit(1e-9)
        )
        + 1
    ).cast("int")
    prefixes = (
        posting.join(gdf, "__gram")
        .groupBy("__id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__gdf", "__gram"))
            ).alias("__ordered")
        )
        .join(grams.select("__id", "__glen"), "__id")
        .select(
            "__id",
            F.explode(
                F.slice(F.col("__ordered"), 1, pref_len)
            ).alias("__p"),
        )
        .select("__id", F.col("__p.__gram").alias("__gram"))
    )
    cands = (
        prefixes.select(F.col("__id").alias("__a"), "__gram")
        .join(
            posting.select(F.col("__id").alias("__b"), "__gram"),
            "__gram",
        )
        .filter(F.col("__a") != F.col("__b"))
        .select("__a", "__b")
        .distinct()
    )
    a_side = grams.select(
        F.col("__id").alias("__a"),
        F.col("__g").alias("__ga"),
        F.col("__glen").alias("__la"),
    )
    b_side = grams.select(
        F.col("__id").alias("__b"), F.col("__g").alias("__gb")
    )
    c = (
        F.size(F.array_intersect("__ga", "__gb")).cast("double")
        / F.col("__la")
    )
    # threshold compares the UNROUNDED ratio (a ratio of small ints is
    # exact in double); round6 only formats the output — rounding
    # first could promote a just-below pair across the bar
    return (
        cands.join(a_side, "__a")
        .join(b_side, "__b")
        .filter(c >= threshold)
        .select(
            F.col("__a").alias(out_a),
            F.col("__b").alias(out_b),
            round6(c).alias("containment"),
        )
    )
