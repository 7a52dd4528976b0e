"""Aggregation operators (SURVEY.md §2.4).

Numeric-parity design: the driver's correctness oracle is DuckDB, and
float sums are order-dependent, so every "measure" aggregate offers an
*exact* path — cast 2-dp money-style doubles to DECIMAL before summing
(bit-identical in any summation order), divide/sqrt in double at the end.
At 100 TB the decimal sums are still single-pass partial aggregates; the
double fast path is one flag away.

MSSQL semantics preserved where the reference depends on them:
STDEV is sample stddev and returns NULL for n=1, which the reference
wraps in ISNULL(STDEV(...), 0) (4CE §Labs ~L740-800 reconstructed).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Exact for values < 10^10 with ≤ 2 decimal places; products of two stay
# within decimal(38,_) so Spark/DuckDB both keep them exact.
DEC = "decimal(12,2)"
DEC_LOG = "decimal(18,6)"

# SQL mirror of round6() below — splice into oracle strings.
ROUND6_SQL = "FLOOR(({x}) * 1000000 + 0.5) / 1000000"

# SQL mirrors of qfix() below — .format(x=..., s=10**k); spliced into
# the q_recrawl_schedule oracle so the Python and SQL grids cannot
# drift apart.  (roundk() has no splice constant: its oracle-side uses
# are hand-inlined FLOOR forms next to their queries — keep them in
# sync with roundk if the form ever changes.)
QFIX_SQL = "CAST(FLOOR(({x}) * {s}.0 + 0.5) AS BIGINT)"
QFIX0_SQL = "CAST(FLOOR(({x}) + 0.5) AS BIGINT)"


def round6(col: Column) -> Column:
    """Engine-independent 6dp rounding: floor(x*1e6 + 0.5)/1e6.

    F.round/ROUND are NOT cross-engine safe: Spark rounds the double's
    shortest decimal representation (BigDecimal.valueOf) while DuckDB
    rounds the exact binary value — a mean of two 6dp decimals lands
    exactly on the 7th-digit-5 grid and the two disagree.  floor(+0.5)
    uses only IEEE ops, so identical inputs give identical outputs in any
    engine (ties round toward +inf)."""
    return F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("double") / F.lit(
        1000000.0
    )


def roundk(col: Column, k: int) -> Column:
    """round6 at an arbitrary grid: floor(x·10^k + 0.5)/10^k — the
    cross-engine-safe rounding form (see round6's docstring for why
    F.round/ROUND are not).  Use this — never F.round — in any
    oracle-paired output column."""
    s = F.lit(float(10**k))
    return F.floor(col * s + F.lit(0.5)).cast("double") / s


def qfix(col: Column, k: int) -> Column:
    """Fixed-point BIGINT quantization: floor(x·10^k + 0.5) as a long.

    The maximally hash-robust output form for libm-derived floats
    (LN/EXP can differ by an ulp across engine *builds*, not just
    engines — the r12 driver divergence on q_recrawl_schedule):
    an integer cell only flips when the true value sits within ~1 ulp
    of a grid boundary (~1e-10 per cell at the grids used here),
    whereas a float column must round-trip the driver's own
    canonicalization too.  SQL mirror: QFIX_SQL / QFIX0_SQL."""
    if k == 0:
        return F.floor(col + F.lit(0.5))
    return F.floor(col * F.lit(float(10**k)) + F.lit(0.5))


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent exact sum of a 2-dp measure, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dmean(col: str | Column, alias: str) -> Column:
    """Exact-sum mean: round(cast(sum_dec as double)/n, 6) — the same IEEE
    ops DuckDB runs, so results hash-match."""
    c = F.col(col) if isinstance(col, str) else col
    return round6(F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def dstd(col: str | Column, alias: str) -> Column:
    """Sample stddev from exact decimal sums of x and x², coalesced to 0
    for n<2 (MSSQL ISNULL(STDEV,0) semantics the reference relies on)."""
    c = F.col(col) if isinstance(col, str) else col
    d = c.cast(DEC)
    n = F.count(c).cast("double")
    s1 = F.sum(d).cast("double")
    s2 = F.sum(d * d).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    return F.when(F.count(c) < 2, F.lit(0.0)).otherwise(
        round6(F.sqrt(F.greatest(var, F.lit(0.0))))
    ).alias(alias)


def log_value(col: str | Column, scale: float = 1.0, offset: float = 0.5) -> Column:
    """Per-row log transform used by the reference's log-scale lab stats:
    LOG(val*scale + 0.5) (§Labs, +0.5 keeps zeros finite; reconstructed).
    Rounded to 6dp and cast to decimal so downstream sums are exact and
    engine-independent (ln() itself may differ by 1 ulp across libms)."""
    c = F.col(col) if isinstance(col, str) else col
    return round6(F.log(c * F.lit(scale) + F.lit(offset))).cast(DEC_LOG)


def dmean_pre(col: str | Column, alias: str) -> Column:
    """Mean of an already-decimal column (e.g. log_value output)."""
    c = F.col(col) if isinstance(col, str) else col
    return round6(F.sum(c).cast("double") / F.count(c)).alias(alias)


def dstd_pre(col: str | Column, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s1 = F.sum(c).cast("double")
    s2 = F.sum(c * c).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    return F.when(F.count(c) < 2, F.lit(0.0)).otherwise(
        round6(F.sqrt(F.greatest(var, F.lit(0.0))))
    ).alias(alias)


def two_level_fixed_sums(
    df: DataFrame,
    group_cols: Sequence[str],
    sums: dict[str, tuple[Column, int]],
    counts: dict[str, str | Column] | None = None,
) -> DataFrame:
    """Exact decimal-valued sums via two-level FIXED-POINT aggregation —
    the 100 TB shape for q_agg_basic-style measure rollups (round-4
    verdict #4).

    Why: ``sum(cast(x as decimal(12,2)))`` plans a decimal(22,2)
    accumulator — precision > 18, so Spark's UnsafeRow aggregation
    buffer can't hold it as a mutable long and every row pays a
    serialize/update/deserialize round trip (measured 2-3x the cost of
    a long sum; x100 corpus 3.85 -> 2.47 s for the q_agg_basic main
    aggregate).  Instead:

    - level 1 groups by (group_cols, spark_partition_id()) and sums
      integer UNITS (e.g. cents) as LONGS — pure primitive codegen'd
      accumulation, map-side only (each (g, pid) group lives in exactly
      one input partition, so the level-1 shuffle carries
      #groups x #partitions rows, not data);
    - level 2 re-sums the per-partition subtotals as decimal(38,0)
      (exact, tiny input) and divides by 10^scale as a DECIMAL divide
      (Spark's result scale >= 6 keeps it exact), casting to double
      LAST — the identical correctly-rounded double the one-level
      decimal sum produces.  Value equality is pinned by test and by
      q_agg_basic's unchanged DuckDB oracle.

    ``sums`` maps alias -> (long_units_expr, scale): the expression
    must already be integer units (value * 10^scale), e.g.
    ``(col.cast("decimal(12,2)") * 100).cast("long")`` for cents.
    ``counts`` maps alias -> column for per-measure non-null counts
    (mean denominators).

    Overflow bound (ENFORCED, VERDICT r6 #3): per-partition long
    subtotals overflow past ~9.2e18 units — at scale 6 units of
    ~1e11/row that is ~8e7 rows per input partition; default
    maxPartitionBytes (128 MB) keeps parquet partitions 1-2 orders of
    magnitude below that.  In non-ANSI mode a plain long F.sum would
    WRAP silently past the bound (a pathological partition corrupts
    totals with no error — this is q_agg_basic's fast path), so level
    1 uses F.try_sum (NULL on overflow regardless of ANSI mode) and
    level 2 raises on a NULL subtotal that had non-NULL inputs —
    distinguishing overflow from a legitimately all-NULL
    (group, partition) cell, which still contributes nothing.  Level 2
    is exact decimal(38,0) — no global bound beyond 38 digits."""
    counts = counts or {}
    lvl1 = df.groupBy(
        *[F.col(c) for c in group_cols], F.spark_partition_id().alias("__pid")
    ).agg(
        F.count("*").alias("__cnt"),
        *[F.try_sum(expr).alias(f"__s_{a}") for a, (expr, _) in sums.items()],
        *[
            F.count(expr).alias(f"__nn_{a}")
            for a, (expr, _) in sums.items()
        ],
        *[F.count(c).alias(f"__n_{a}") for a, c in counts.items()],
    )

    def _guarded(a: str):
        return F.when(
            F.col(f"__s_{a}").isNull() & (F.col(f"__nn_{a}") > 0),
            F.raise_error(
                F.lit(
                    f"two_level_fixed_sums: per-partition long subtotal"
                    f" overflow for measure {a!r} (>9.2e18 units);"
                    f" reduce partition size or the fixed-point scale"
                )
            ),
        ).otherwise(F.col(f"__s_{a}").cast("decimal(38,0)"))

    tot = lvl1.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.sum("__cnt").alias("__count_rows"),
        *[F.sum(_guarded(a)).alias(f"__t_{a}") for a in sums],
        *[F.sum(f"__n_{a}").alias(f"__count_{a}") for a in counts],
    )
    out_cols = [F.col(c) for c in group_cols]
    out_cols.append(F.col("__count_rows").alias("count_rows"))
    for a, (_, scale) in sums.items():
        unit = F.lit(10**scale).cast(f"decimal({scale + 1},0)")
        out_cols.append((F.col(f"__t_{a}") / unit).cast("double").alias(a))
    for a in counts:
        out_cols.append(F.col(f"__count_{a}").alias(f"n_{a}"))
    return tot.select(*out_cols)


def count_distinct_where(cond: Column, col: str | Column, alias: str) -> Column:
    """A8: COUNT(DISTINCT CASE WHEN cond THEN key END) — the reference's
    severe-subset columns next to all-patient columns (every artifact).
    Spark plans this as a single expand+two-phase distinct aggregate, no
    extra join."""
    c = F.col(col) if isinstance(col, str) else col
    return F.count_distinct(F.when(cond, c)).alias(alias)


def two_level_agg(
    df: DataFrame,
    entity_cols: Sequence[str],
    group_cols: Sequence[str],
    value_col: str,
    per_entity_alias: str = "entity_value",
) -> DataFrame:
    """A7: one value per entity first (per patient-day mean), then group
    stats over entities — prevents multi-draw patients dominating the lab
    stats (§Labs reconstructed).  Two groupBys; Spark's partial aggregation
    makes each a single shuffle, and the second input is already small.

    The per-entity mean is rounded to 6dp and cast to decimal so the
    second-level sums stay order-independent.
    """
    per_entity = df.groupBy(*entity_cols, *group_cols).agg(
        round6(
            F.sum(F.col(value_col).cast(DEC)).cast("double") / F.count(value_col)
        )
        .cast(DEC_LOG)
        .alias(per_entity_alias)
    )
    return per_entity


def grouping_sets_margins(
    spark_df: DataFrame,
    group_cols: Sequence[str],
    agg_cols: Sequence[Column],
    all_label: str = "all",
) -> DataFrame:
    """A9: the reference's Demographics margins — UNION ALL of group-bys at
    every granularity with 'all' placeholder rows (~L650-740 reconstructed)
    — expressed as one ROLLUP (a single shuffle with grouping-id expand,
    not k separate scans)."""
    rolled = spark_df.rollup(*group_cols).agg(*agg_cols)
    out = rolled
    for c in group_cols:
        out = out.withColumn(c, F.coalesce(F.col(c).cast("string"), F.lit(all_label)))
    return out
