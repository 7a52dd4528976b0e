"""Mergeable distinct-count sketch store (SURVEY §2.4 A1' at scale —
the incremental companion to approx_count_distinct).

``approx_count_distinct`` answers one query over one scan.  At 100 TB
the pattern that matters is MERGEABILITY: aggregate each day/partition
ONCE into an Apache DataSketches HLL sketch (Spark 3.5+ built-ins —
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``, all
JVM-side), persist the binary sketches next to the rollup, and answer
any coarser-grained distinct question later — weekly, monthly, total,
cross-partition — by unioning kilobyte sketches instead of re-scanning
raw data.  A new day's load appends one sketch row; nothing is
recomputed.

Error: standard HLL, ~1.04/sqrt(2^lg_k) relative standard error
(lg_k=12 -> ~1.6%); pinned by the error-bound tests, mirroring the
approx_count_distinct testing strategy (SURVEY §5.2).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def build_distinct_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per group:
    (group_cols..., sketch binary, n_rows).  One map-side-combined
    aggregate — the only pass over the raw data this store ever takes.
    Persist the result (parquet handles the binary column) keyed by the
    finest grain you will query."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def rollup_distinct_sketches(
    sketches: DataFrame,
    group_cols: Sequence[str],
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser grain — (group_cols
    ..., approx_distinct, n_rows) — by unioning the binary sketches.
    Never touches raw data: the shuffle moves kilobyte sketches, one per
    input group.  Pass ``group_cols=[]`` for the global rollup."""
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(allow_different_lg_k))
        ).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    ]
    if group_cols:
        return sketches.groupBy(*group_cols).agg(*aggs)
    return sketches.agg(*aggs)


def merge_sketch_stores(
    existing: DataFrame, batch: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Incremental maintenance: fold a new batch's sketches into the
    store (same schema both sides).  Groups present in both merge via
    sketch union; new groups append — one union + one groupBy over
    sketch rows, the steady-state daily-load step."""
    return (
        existing.unionByName(batch)
        .groupBy(*group_cols)
        .agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


# --- Mergeable frequent-items (heavy-hitters) store ---------------------
#
# The top-k companion to the HLL store above: summarize each shard/day
# ONCE into its k most frequent items plus a residual bound, persist the
# kilobyte summaries, and answer coarser-grained "what dominates this
# corpus?" questions (boilerplate tokens, hot domains, repeated license
# headers) by merging summaries — never re-scanning raw data.
#
# Summary semantics (Misra-Gries / SpaceSaving merge, expressed purely
# declaratively):
#   - a FRESH shard summary is exact for its kept items (count_lo ==
#     count_hi == true shard count) and carries ``bound`` = the largest
#     count it dropped (0 when the shard had <= k distinct items);
#   - MERGING summaries sums count_lo where present, and for count_hi
#     charges each absent shard its ``bound`` (an absent item can hide
#     below a shard's truncation line but not above it), then re-truncates
#     to the k largest upper bounds;
#   - invariant preserved by both steps: true count in [count_lo,
#     count_hi], and any item whose true count exceeds the group's summed
#     bound is guaranteed present.
#
# Store schema (one row per group — same shape discipline as the HLL
# rows): group_cols..., items: array<struct<count_hi, count_lo, item>>
# (sorted descending so items[0] is the heaviest), bound, n_rows.


def _truncate_items(
    per_item: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """(group..., item, count_hi, count_lo, group_bound, n_rows) rows ->
    one summary row per group keeping the k largest by (count_hi, item).

    The rank sort runs over the DISTINCT items per group (already
    count-aggregated with map-side combine), not raw rows — at 100 TB
    that is vocabulary-sized, orders of magnitude below the scan."""
    from pyspark.sql import Window

    # tie-break by item DESC to agree exactly with the stored array's
    # sort_array(desc) order over (count_hi, count_lo, item) structs
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("count_hi"), F.desc("count_lo"), F.desc("item")
    )
    ranked = per_item.withColumn("__rk", F.row_number().over(w))
    return ranked.groupBy(*group_cols).agg(
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("__rk") <= k,
                    F.struct(
                        F.col("count_hi"),
                        F.col("count_lo"),
                        F.col("item"),
                    ),
                )
            ),
            asc=False,
        ).alias("items"),
        # new residual bound: anything truncated NOW could have a true
        # count as large as its upper bound -> fold the largest dropped
        # upper into the carried bound
        F.greatest(
            F.first("group_bound"),
            F.coalesce(
                F.max(F.when(F.col("__rk") > k, F.col("count_hi"))), F.lit(0)
            ),
        ).alias("bound"),
        F.first("n_rows").alias("n_rows"),
    )


def build_topk_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """One frequent-items summary of ``value_col`` per group.  The only
    pass over raw data this store ever takes: one map-side-combined
    count aggregate, then a per-group truncation over the distinct
    items.  Kept items are EXACT for the shard (count_lo == count_hi);
    ``bound`` records the largest dropped count."""
    from pyspark.sql import Window

    counts = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("cnt"))
    # group totals come from the counted items themselves (their counts
    # are exhaustive here) — no second aggregate over raw data
    gw = Window.partitionBy(*group_cols)
    per_item = counts.select(
        *group_cols,
        F.col(value_col).cast("string").alias("item"),
        F.col("cnt").alias("count_hi"),
        F.col("cnt").alias("count_lo"),
        F.lit(0).cast("bigint").alias("group_bound"),
        F.sum("cnt").over(gw).alias("n_rows"),
    )
    out = _truncate_items(per_item, group_cols, k)
    return out.withColumn("bound", F.col("bound").cast("bigint"))


def merge_topk_sketches(
    sketches: DataFrame, group_cols: Sequence[str], k: int = 64
) -> DataFrame:
    """Merge/roll up summaries to ``group_cols`` grain (pass a coarser
    key set to roll up; union new-batch summaries in first for
    incremental maintenance — the same operation serves both).

    Moves only summary rows (k items + 2 longs per input group) through
    the shuffle.  For each item: count_lo sums over shards where it was
    kept; count_hi additionally charges every shard that did NOT keep it
    that shard's bound (total_bound - sum of bounds where present)."""
    shard = sketches.select(
        *group_cols,
        F.col("bound").alias("shard_bound"),
        F.col("n_rows").alias("shard_rows"),
        F.col("items"),
    )
    totals = shard.groupBy(*group_cols).agg(
        F.sum("shard_bound").alias("total_bound"),
        F.sum("shard_rows").alias("n_rows"),
    )
    exploded = shard.select(
        *group_cols,
        "shard_bound",
        F.explode("items").alias("it"),
    )
    grouped = exploded.groupBy(*group_cols, F.col("it.item").alias("item")).agg(
        F.sum("it.count_lo").alias("count_lo"),
        F.sum("it.count_hi").alias("hi_present"),
        F.sum("shard_bound").alias("bound_present"),
    )
    # totals is one tiny row per output group — broadcast; the global
    # rollup (no group cols) is a 1-row crossJoin
    if group_cols:
        joined = grouped.join(F.broadcast(totals), list(group_cols))
    else:
        joined = grouped.crossJoin(F.broadcast(totals))
    per_item = joined.select(
        *group_cols,
        "item",
        (
            F.col("hi_present") + F.col("total_bound") - F.col("bound_present")
        ).alias("count_hi"),
        "count_lo",
        F.col("total_bound").alias("group_bound"),
        "n_rows",
    )
    return _truncate_items(per_item, group_cols, k)


def topk_estimates(sketches: DataFrame) -> DataFrame:
    """Unpack a summary store into the answer frame: one row per (group,
    item) with count_lo/count_hi bounds and a 1-based rank (by upper
    bound — the stored order)."""
    group_cols = [
        c for c in sketches.columns if c not in ("items", "bound", "n_rows")
    ]
    return sketches.select(
        *group_cols,
        "bound",
        "n_rows",
        F.posexplode("items").alias("__pos", "it"),
    ).select(
        *group_cols,
        (F.col("__pos") + 1).alias("rank"),
        F.col("it.item").alias("item"),
        F.col("it.count_lo").alias("count_lo"),
        F.col("it.count_hi").alias("count_hi"),
        "bound",
        "n_rows",
    )


# --- Mergeable quantile (DDSketch-style log-bucket) store ---------------
#
# Third member of the summary-store family (HLL distincts, SpaceSaving
# heavy hitters, and now quantiles): per-shard histograms over
# relative-error log buckets, exactly mergeable by summing bucket
# counts, answering any quantile at any later grain without re-scanning
# raw data.  DDSketch semantics (Masson et al., VLDB 2019): for x > 0,
# bucket = ceil(log_gamma(x)) with gamma = (1+eps)/(1-eps) puts x in
# (gamma^(b-1), gamma^b]; the estimate 2*gamma^b/(gamma+1) is within
# relative error eps of any value in the bucket.  Zeros and negatives
# keep exact sign fidelity via a (sign, bucket) identity with the
# negative side mirrored.
#
# Unlike the HLL/top-k stores there is NO DuckDB parity: bucket edges
# go through libm log(), which is not bit-identical across engines —
# the tests pin the mathematical guarantee (relative error <= eps)
# and exact merge≡rebuild instead.


def _dd_gamma(eps: float) -> float:
    if not 0 < eps < 1:
        raise ValueError(f"eps must be in (0,1), got {eps}")
    return (1 + eps) / (1 - eps)


def build_quantile_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    eps: float = 0.01,
) -> DataFrame:
    """One log-bucket histogram of ``value_col`` per group: (group...,
    buckets: array<struct<sign,bucket,cnt>> (sorted by value order),
    n_rows).  NULL values are excluded (no evidence), zeros and
    negatives are represented exactly/mirrored.  One map-side-combined
    aggregate over raw data — the only full pass this store takes."""
    import math

    gamma = _dd_gamma(eps)
    lg = math.log(gamma)
    v = F.col(value_col).cast("double")
    sign = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    bucket = F.when(
        v == 0, F.lit(0).cast("long")
    ).otherwise(F.ceil(F.log(F.abs(v)) / F.lit(lg)).cast("long"))
    counts = (
        # NULL: no evidence.  NaN: all three sign comparisons are false,
        # which would silently file it as a zero — exclude instead
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*group_cols, sign.alias("sign"), bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    # value-order key: negatives first (large |x| most negative), then
    # zero, then positives ascending
    order_key = F.struct(
        F.col("sign").alias("s"),
        (F.col("sign") * F.col("bucket")).alias("k"),
    )
    return counts.groupBy(*group_cols).agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        order_key.alias("__o"),
                        F.col("sign"),
                        F.col("bucket"),
                        F.col("cnt"),
                    )
                )
            ),
            lambda s: F.struct(s["sign"], s["bucket"], s["cnt"]),
        ).alias("buckets"),
        F.sum("cnt").alias("n_rows"),
    )


def merge_quantile_sketches(
    sketches: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge/roll up histogram rows to ``group_cols`` grain — bucket
    counts sum, so merge≡rebuild EXACTLY (no bound widening, unlike the
    top-k store).  Moves only histogram rows through the shuffle."""
    exploded = sketches.select(
        *group_cols, F.explode("buckets").alias("b")
    ).select(
        *group_cols,
        F.col("b.sign").alias("sign"),
        F.col("b.bucket").alias("bucket"),
        F.col("b.cnt").alias("cnt"),
    )
    summed = exploded.groupBy(*group_cols, "sign", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )
    order_key = F.struct(
        F.col("sign").alias("s"),
        (F.col("sign") * F.col("bucket")).alias("k"),
    )
    return summed.groupBy(*group_cols).agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        order_key.alias("__o"),
                        F.col("sign"),
                        F.col("bucket"),
                        F.col("cnt"),
                    )
                )
            ),
            lambda s: F.struct(s["sign"], s["bucket"], s["cnt"]),
        ).alias("buckets"),
        F.sum("cnt").alias("n_rows"),
    )


def quantile_estimates(
    sketches: DataFrame, qs: Sequence[float], eps: float = 0.01
) -> DataFrame:
    """Answer quantiles from a histogram store: one row per (group, q)
    with the DDSketch estimate — relative error <= eps vs the true
    q-quantile value.  Declarative walk: explode buckets (already in
    value order), running-sum counts, first bucket reaching ceil(q*n).

    The per-group window runs over the group's BUCKETS (a few hundred
    rows for eps=0.01 across 15 orders of magnitude), not its data."""
    from pyspark.sql import Window

    gamma = _dd_gamma(eps)
    group_cols = [
        c for c in sketches.columns if c not in ("buckets", "n_rows")
    ]
    # partition by the group columns THEMSELVES — window partitioning is
    # null-safe, unlike any string-concatenated gid (concat_ws skips
    # NULLs, which collides ('a', NULL) with (NULL, 'a'))
    part = (
        [F.col(c) for c in group_cols] if group_cols else [F.lit(0)]
    )
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col("sign"), (F.col("sign") * F.col("bucket")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flat = (
        sketches.select(
            *group_cols,
            "n_rows",
            F.explode("buckets").alias("b"),
        )
        .select(
            *group_cols,
            "n_rows",
            F.col("b.sign").alias("sign"),
            F.col("b.bucket").alias("bucket"),
            F.col("b.cnt").alias("cnt"),
        )
        .withColumn("cum", F.sum("cnt").over(w))
    )
    # bucket indexes |x|; sign applies OUTSIDE the power (the order key
    # uses sign*bucket, the magnitude does not)
    est = F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
        F.col("sign")
        * F.lit(2.0)
        * F.pow(F.lit(gamma), F.col("bucket"))
        / F.lit(gamma + 1.0)
    )
    from covid19i2b2_spark.fsutil import one_partition_df

    qdf = one_partition_df(
        flat.sparkSession, [(float(q),) for q in qs], "q double"
    )
    # rank clamps to [1, n]: q=0 means the minimum (rank 1), not "no row"
    rank = F.greatest(
        F.lit(1).cast("long"),
        F.least(F.col("n_rows"), F.ceil(F.col("q") * F.col("n_rows"))),
    )
    hits = (
        flat.join(F.broadcast(qdf))
        .filter(F.col("cum") - F.col("cnt") < rank)
        .filter(F.col("cum") >= rank)
        .select(*group_cols, "q", est.alias("value"), "n_rows")
    )
    return hits


# -- Count-Min frequency store (SURVEY §2.11 X47, round 7) ----------------
#
# The fourth mergeable summary: point-frequency estimates for ARBITRARY
# keys at bounded size.  The heavy-hitter store answers "what are the
# top items"; Count-Min answers "how often does THIS item appear" for
# any item, without storing the vocabulary — the primitive behind
# corpus-wide n-gram/token frequency lookups (repetition scoring,
# contamination triage) when exact counts don't fit.
#
# Representation: sparse cells (group_cols..., row, cell, cnt) — at most
# depth x width rows per group regardless of distinct count, exactly the
# d x w counter matrix stored sparsely (absent cell = 0).  Estimate for
# a key = min over the depth rows of its cell counts: never an
# UNDERestimate, overestimates by at most n_rows/width per row with
# probability (1/2)^depth (standard CM bound).  Merge = cell-wise count
# sum — NOT replay-idempotent (same epoch-guard contract as the
# heavy-hitter and DDSketch stores; see streaming/incremental.py).
#
# The cell hash is the house oracle-mirrorable polynomial (codepoint
# poly mod 2^53-prime, affine over GF(2^31-1), mod width — the same
# construction as sampling._poly_key_bucket), so a SQL engine reproduces
# the cells bit-for-bit: q_cm_sketch carries full DuckDB arithmetic
# parity in tests/test_oracle_parity.py.

_CM_POLY_P = 9_007_199_254_740_881  # largest prime < 2^53
_CM_M31 = 2_147_483_647


def _cm_poly(value: "F.Column"):
    s = value.cast("string")
    cps = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.ascii(F.substring(s, i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        cps, F.lit(0).cast("long"), lambda acc, c: (acc * 1009 + c) % _CM_POLY_P
    )


def _cm_cells(value: "F.Column", depth: int, width: int, seed: int):
    """Array of ``depth`` cell indexes for a key — one affine hash per
    row over the shared polynomial, mod width."""
    from covid19i2b2_spark.operators.dedup import _hash_family

    hp = F.pmod(_cm_poly(value), F.lit(_CM_M31))
    return F.array(
        *[
            (F.pmod(hp * F.lit(a) + F.lit(b), F.lit(_CM_M31)) % width).cast(
                "int"
            )
            for (a, b) in _hash_family(depth, seed)
        ]
    )


def build_cm_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """One Count-Min summary of ``value_col`` per group as sparse cells
    (group_cols..., row, cell, cnt, n_rows).  One pass over raw data:
    a map-side-combined count per (group, value) FIRST (same move as
    build_topk_sketches — the distinct vocabulary is Zipfian-small next
    to the raw stream), then each DISTINCT value explodes its ``depth``
    (row, cell) pairs carrying its count, summing into at most
    depth x width cells per group.  Exploding the raw stream instead
    cost depth x the token volume through the first aggregate (measured
    5.2 s vs ~1 s at sf0.1).  ``n_rows`` rides every cell row (audit +
    error bound n/width)."""
    gw = [F.col(c) for c in group_cols]
    vcounts = df.groupBy(*gw, F.col(value_col).alias("__v")).agg(
        F.count("*").alias("__n")
    )
    cells = vcounts.select(
        *gw,
        "__n",
        F.posexplode(_cm_cells(F.col("__v"), depth, width, seed)).alias(
            "row", "cell"
        ),
    )
    out = cells.groupBy(*gw, "row", "cell").agg(F.sum("__n").alias("cnt"))
    totals = (
        out.filter(F.col("row") == 0)
        .groupBy(*gw)
        .agg(F.sum("cnt").alias("n_rows"))
    )
    if group_cols:
        return out.join(F.broadcast(totals), list(group_cols))
    return out.crossJoin(F.broadcast(totals))


def merge_cm_sketches(
    sketches: DataFrame, group_cols: Sequence[str]
) -> DataFrame:
    """Merge/roll up CM stores to ``group_cols`` grain (coarser key set
    to roll up; union new-batch summaries in first for incremental
    maintenance).  Cell-wise count addition — the shuffle moves at most
    depth x width rows per input group, never raw data.  All inputs
    must share (depth, width, seed): cells only align under identical
    hashes (same identity contract as the dedup index parameters)."""
    gw = [F.col(c) for c in group_cols]
    merged = sketches.groupBy(*gw, "row", "cell").agg(
        F.sum("cnt").alias("cnt")
    )
    totals = (
        merged.filter(F.col("row") == 0)
        .groupBy(*gw)
        .agg(F.sum("cnt").alias("n_rows"))
    )
    if group_cols:
        return merged.join(F.broadcast(totals), list(group_cols))
    return merged.crossJoin(F.broadcast(totals))


def cm_estimates(
    sketches: DataFrame,
    group_cols: Sequence[str],
    keys: Sequence[str],
    depth: int = 4,
    width: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """Frequency estimates for ``keys`` at the store's grain: one row
    per (group, key) with ``est`` = min over the depth rows of the
    key's cell counts (a missing cell is 0 — no item ever hashed
    there).  ``keys`` is a small driver-side list (the usual shape:
    a probe vocabulary); it broadcasts against the cell store, so the
    lookup moves summary rows only.  (depth, width, seed) must match
    the build."""
    spark = sketches.sparkSession
    from covid19i2b2_spark.fsutil import one_partition_df

    kdf = one_partition_df(
        spark, [(k,) for k in keys], "key string"
    ).select(
        "key",
        F.posexplode(_cm_cells(F.col("key"), depth, width, seed)).alias(
            "row", "cell"
        ),
    )
    gw = [F.col(c) for c in group_cols]
    groups = sketches.select(*gw, "n_rows").distinct()
    probe = groups.crossJoin(F.broadcast(kdf))
    joined = probe.join(
        sketches.select(*gw, "row", "cell", "cnt"),
        [*group_cols, "row", "cell"],
        "left",
    )
    return (
        joined.groupBy(*gw, "key", "n_rows")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .select(*gw, "key", F.col("est").cast("long").alias("est"), "n_rows")
    )
