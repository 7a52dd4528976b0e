"""X48: distributed fuzzy string matching — edit-distance similarity
join over short text columns (entity names, titles, URLs, author
strings), the record-linkage step a training-data pipeline runs when
metadata arrives dirty (SURVEY §2.11 extension; no reference
counterpart — the reference has no approximate string join).

All-pairs Levenshtein is O(n²·L²) — dead at any scale.  This is the
ED-Join shape (Xiao, Wang & Lin, VLDB 2008 — public algorithm) rebuilt
declaratively:

1.  **Padded q-grams**: each string is framed by k-1 boundary chars
    ('\\x01', outside any real alphabet) and cut into overlapping
    k-grams.  One edit operation disturbs at most k grams, so strings
    within edit distance d share >= max(|A|,|B|) - k*d grams — at
    least ONE whenever the longer string has len >= k*(d-1)+2.
2.  **Prefix blocking**: grams are put in a global total order and
    only the first k*d+1 per string are indexed (prefix-filter
    principle: two sets with required overlap t intersect within their
    first |set|-t+1 elements, and t >= |set|-k*d here, so k*d+1
    suffices).  Candidate volume is therefore independent of string
    LENGTH — each row contributes <= k*d+1 exploded gram rows no
    matter how long the string.  ANY consistent total order is
    CORRECT; which one bounds BLOCK sizes is data-dependent:
    ``gram_order='hash'`` (default) orders by xxhash64 — zero extra
    passes, fine for naturally diverse strings; ``gram_order='rare'``
    orders by ascending corpus frequency (ED-Join's idf-ascending
    choice) at the cost of one gram-count aggregate + join + per-id
    window — decisive on TEMPLATE-heavy corpora ('Customer#0000...'),
    where every string shares its lowest-hash prefix grams and the
    hash order degenerates to one block per template (~C(n,2)
    candidates), while the rare order picks each string's
    DISCRIMINATIVE grams (measured in tests: max block n -> df-bounded).
3.  **Short-string pool**: pairs where BOTH sides are shorter than
    k*(d-1)+2 carry no gram guarantee ("ab"/"cd" share nothing yet sit
    at distance 2), so strings below the cutoff are cross-paired
    directly — a pool that is small by construction (few distinct
    strings that short) and guarded by ``short_cap``.
4.  **Verify**: length filter |len_a-len_b| <= d (an edit changes
    length by at most 1), then the JVM-side ``levenshtein(a, b, d)``
    with the threshold argument — Spark's implementation early-exits
    the DP once the band exceeds d, O(d*L) per pair instead of O(L²).

Everything is built-in expressions (explode / equi-join / levenshtein)
— no Python in the hot path; the only shuffles are the gram equi-join
and the pair dedup.  100 TB shape: gram blocks behave like LSH bands
(operators/dedup.py lsh_candidate_pairs); a hot gram (shared prefix
boilerplate) can be capped with ``gram_cap``, which — like bucket_cap
there — trades completeness for a bound and logs what it skipped.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, functions as F

_LOG = logging.getLogger(__name__)

_PAD = "\x01"  # outside every real alphabet; cannot collide with data


def _padded_qgrams(col: Column, k: int) -> Column:
    """DISTINCT padded k-grams of a string column, as an array.  The
    k-1-char frame gives every string (even '') at least one gram and
    strengthens the count filter at the boundaries."""
    pad = F.lit(_PAD * (k - 1))
    framed = F.concat(pad, col, pad)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(framed) - (k - 1)),
            lambda i: F.substring(framed, i, k),
        )
    )


def _prefix_grams(col: Column, k: int, max_dist: int) -> Column:
    """The first k*d+1 grams in the GLOBAL xxhash64 order — the
    prefix-filter index set.  Any total order is correct (rare-first
    bounds block sizes better on template-heavy data — see
    ``gram_order='rare'``); hash order needs no frequency pass, is
    deterministic across runs and engines, and is the only order
    STABLE under appends (frequencies drift as a corpus grows, hashes
    don't) — which is why FuzzyIndex pins it."""
    n_prefix = k * max_dist + 1
    return F.slice(
        F.array_sort(
            F.transform(
                _padded_qgrams(col, k),
                lambda g: F.struct(F.xxhash64(g).alias("h"), g.alias("g")),
            )
        ),
        1,
        n_prefix,
    ).getField("g")


def _rare_prefix_grams(
    exploded: DataFrame,
    freq: DataFrame,
    id_cols: list[str],
    k: int,
    max_dist: int,
) -> DataFrame:
    """Keep each string's k*d+1 grams in ascending (corpus frequency,
    hash, gram) order — the ED-Join idf-ascending prefix.  ``exploded``
    carries one row per (string, DISTINCT gram); ``freq`` is the
    (``__g``, ``__df``) count table the CALLER built over whichever
    population must share the order (the input itself for a self-join,
    the union of both sides for a two-table join — consistency of the
    order across sides is what the completeness proof needs).  One
    join + one per-id window; the window partitions on the id so no
    single task sees more than one string's grams."""
    from pyspark.sql.window import Window

    n_prefix = k * max_dist + 1
    w = Window.partitionBy(*id_cols).orderBy(
        "__df", F.xxhash64("__g"), "__g"
    )
    return (
        exploded.join(freq, "__g")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_prefix)
        .drop("__df", "__rn")
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 1,
    k: int = 2,
    gram_cap: int | None = None,
    short_cap: int = 100_000,
    gram_order: str = "hash",
    cache_handles: list | None = None,
) -> DataFrame:
    """Self-join: all (id_a, id_b, dist) pairs with
    levenshtein(text_a, text_b) <= max_dist, id_a < id_b.  COMPLETE —
    every qualifying pair is found (the ED-Join bound plus the
    short-string pool; equivalence to brute force pinned in tests and
    the DuckDB oracle) — unless ``gram_cap`` skips a hot block, which
    is logged.

    ``gram_order='rare'`` selects each string's prefix grams in
    ascending corpus-frequency order instead of hash order (round 9;
    see the module docstring): same completeness, one extra
    gram-count aggregate + join + per-id window, and on template-heavy
    corpora the hot full-corpus block the hash order degenerates to
    disappears.  Results are identical pair SETS either way (pinned in
    tests).

    ``id_col`` must be unique; NULL texts never match (SQL semantics:
    levenshtein(NULL, x) is NULL, not 0).
    """
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if gram_order not in ("hash", "rare"):
        raise ValueError(
            f"gram_order must be 'hash' or 'rare' (got {gram_order!r})"
        )
    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s")
    ).filter(F.col("__s").isNotNull())
    if gram_order == "hash":
        grams = base.select(
            "__id",
            "__s",
            F.explode(_prefix_grams(F.col("__s"), k, max_dist)).alias("__g"),
        )
    else:
        exploded = base.select(
            "__id",
            "__s",
            F.explode(_padded_qgrams(F.col("__s"), k)).alias("__g"),
        )
        freq = exploded.groupBy("__g").agg(F.count("*").alias("__df"))
        grams = _rare_prefix_grams(exploded, freq, ["__id"], k, max_dist)
    if gram_cap is not None:
        sizes = grams.groupBy("__g").agg(F.count("*").alias("__gsz"))
        # referenced twice (count + anti-join) — persist so the gram
        # scan doesn't re-run per job (lsh_candidate_pairs precedent);
        # registered with the caller's release list so a long-lived
        # session frees it deterministically (VERDICT r7 #6 protocol)
        hot = sizes.filter(F.col("__gsz") > gram_cap).persist()
        if cache_handles is not None:
            cache_handles.append(hot)
        n_hot = hot.count()
        if n_hot:
            _LOG.warning(
                "fuzzy_pairs: skipping %d gram blocks larger than "
                "gram_cap=%d; pairs whose ONLY shared prefix gram is in "
                "a skipped block are lost (completeness traded for a "
                "bound, same contract as lsh_candidate_pairs.bucket_cap)",
                n_hot,
                gram_cap,
            )
        grams = grams.join(hot.select("__g"), "__g", "left_anti")
    a = grams.select(
        F.col("__g"),
        F.col("__id").alias("id_a"),
        F.col("__s").alias("__sa"),
    )
    b = grams.select(
        F.col("__g"),
        F.col("__id").alias("id_b"),
        F.col("__s").alias("__sb"),
    )
    blocked = (
        a.join(b, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__sa", "__sb")
    )
    # pairs where BOTH strings sit below the gram-guarantee cutoff:
    # cross-pair them directly (the length filter in verify still
    # applies).  Bounded: len < k*(d-1)+2 admits few distinct strings;
    # short_cap fails loudly rather than letting a degenerate corpus
    # (everything 1-char) go quadratic unannounced.
    cutoff = k * (max_dist - 1) + 2
    short = base.filter(F.length("__s") < cutoff)
    n_short = short.limit(short_cap + 1).count()
    if n_short > short_cap:
        raise ValueError(
            f"fuzzy_pairs: more than short_cap={short_cap} strings "
            f"shorter than {cutoff} chars — the short-string pool would "
            f"go quadratic; raise short_cap deliberately or pre-filter"
        )
    if n_short > 1:
        sa = short.select(
            F.col("__id").alias("id_a"), F.col("__s").alias("__sa")
        )
        sb = short.select(
            F.col("__id").alias("id_b"), F.col("__s").alias("__sb")
        )
        blocked = blocked.unionByName(
            sa.join(sb, F.col("id_a") < F.col("id_b"))
        )
    dist = F.levenshtein("__sa", "__sb", max_dist)
    return (
        blocked.dropDuplicates(["id_a", "id_b"])
        .filter(
            (F.abs(F.length("__sa") - F.length("__sb")) <= max_dist)
            & (dist >= 0)  # threshold form returns -1 when above d
        )
        .select("id_a", "id_b", dist.alias("dist"))
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    max_dist: int = 1,
    k: int = 2,
    gram_cap: int | None = None,
    short_cap: int = 100_000,
    gram_order: str = "hash",
    cache_handles: list | None = None,
) -> DataFrame:
    """Two-table edit-distance join: every (left row, right row) pair
    with levenshtein(left_on, right_on) <= max_dist, carrying all
    columns of both sides plus ``dist``.  Same blocking scheme and
    completeness contract as :func:`fuzzy_pairs` (incl.
    ``gram_order='rare'`` — frequencies are counted over the UNION of
    both sides, so the order both sides truncate their gram sets by is
    one consistent global order, which is what the prefix-filter proof
    needs).  Column name collisions follow Spark join semantics —
    alias beforehand.  Rows that are FULLY identical on a side
    collapse to one output pair (the block dedup keys on all columns);
    keep a unique id column when multiplicity matters."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if gram_order not in ("hash", "rare"):
        raise ValueError(
            f"gram_order must be 'hash' or 'rare' (got {gram_order!r})"
        )
    if gram_order == "hash":
        lg = left.filter(F.col(left_on).isNotNull()).withColumn(
            "__g", F.explode(_prefix_grams(F.col(left_on), k, max_dist))
        )
        rg = right.filter(F.col(right_on).isNotNull()).withColumn(
            "__g", F.explode(_prefix_grams(F.col(right_on), k, max_dist))
        )
    else:
        # fully-duplicate rows must collapse BEFORE the per-row window:
        # copies sharing a partition would split the rn sequence and
        # each keep only part of the k*d+1 prefix (a completeness hole
        # the hash path doesn't have).  The output collapses them
        # anyway (dropDuplicates(out_cols) below).
        lx = (
            left.filter(F.col(left_on).isNotNull())
            .withColumn("__g", F.explode(_padded_qgrams(F.col(left_on), k)))
            .dropDuplicates()
        )
        rx = (
            right.filter(F.col(right_on).isNotNull())
            .withColumn("__g", F.explode(_padded_qgrams(F.col(right_on), k)))
            .dropDuplicates()
        )
        freq = (
            lx.select("__g")
            .unionAll(rx.select("__g"))
            .groupBy("__g")
            .agg(F.count("*").alias("__df"))
        )
        lg = _rare_prefix_grams(lx, freq, left.columns, k, max_dist)
        rg = _rare_prefix_grams(rx, freq, right.columns, k, max_dist)
    if gram_cap is not None:
        # a block's join cost is |left block| x |right block| — count
        # BOTH sides so a right-heavy gram can't slip under the cap
        sizes = (
            lg.select("__g")
            .unionAll(rg.select("__g"))
            .groupBy("__g")
            .agg(F.count("*").alias("__gsz"))
        )
        hot = sizes.filter(F.col("__gsz") > gram_cap).persist()
        if cache_handles is not None:
            cache_handles.append(hot)
        n_hot = hot.count()
        if n_hot:
            _LOG.warning(
                "fuzzy_join: skipping %d gram blocks larger than "
                "gram_cap=%d (see fuzzy_pairs)",
                n_hot,
                gram_cap,
            )
        lg = lg.join(hot.select("__g"), "__g", "left_anti")
        rg = rg.join(hot.select("__g"), "__g", "left_anti")
    cutoff = k * (max_dist - 1) + 2
    ls = left.filter(
        F.col(left_on).isNotNull() & (F.length(left_on) < cutoff)
    )
    rs = right.filter(
        F.col(right_on).isNotNull() & (F.length(right_on) < cutoff)
    )
    for side, nm in ((ls, "left"), (rs, "right")):
        n = side.limit(short_cap + 1).count()
        if n > short_cap:
            raise ValueError(
                f"fuzzy_join: more than short_cap={short_cap} {nm}-side "
                f"strings shorter than {cutoff} chars; raise short_cap "
                f"deliberately or pre-filter"
            )
    blocked = lg.join(rg, "__g").drop("__g")
    shorts = ls.crossJoin(rs)
    dist = F.levenshtein(F.col(left_on), F.col(right_on), max_dist)
    out_cols = [*left.columns, *right.columns]
    return (
        blocked.unionByName(shorts)
        .dropDuplicates(out_cols)
        .filter(
            (F.abs(F.length(left_on) - F.length(right_on)) <= max_dist)
            & (dist >= 0)
        )
        .select(*out_cols, dist.alias("dist"))
    )
