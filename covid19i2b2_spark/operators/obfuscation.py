"""Obfuscation pass (SURVEY.md §2.9 D2/D3, §2.8 F13/F15).

The reference's privacy layer (4CE_Phase1.1_Files_mssql.sql:§obfuscation
~L920-980, reconstructed; sentinel values -99/-999 are the published 4CE
convention):

- blur: add a per-cell random integer in [-blur, +blur]
- small-count mask: counts below a threshold become -99
- optional delete: drop masked rows entirely
- -999 marks suppressed/unavailable cells

Scale-critical change vs the reference idiom (ABS(CHECKSUM(NEWID()))):
noise must be DETERMINISTIC under task retry — a Spark task that retries
must produce the same noise or downstream exact-once guarantees break and
reruns diverge.  We derive noise from a hash of (key columns, seed),
never F.rand().

The hash is md5-based (first 8 hex chars parsed as an integer) rather
than xxhash64: md5 is available in every engine, so the DuckDB oracle
can reproduce the exact noise and the blur pass is hash-verified, not
just property-tested.  Obfuscation runs on aggregated artifacts (rows =
output cells, not input rows), so the md5-vs-xxhash64 cost difference is
irrelevant at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

MASKED = -99
SUPPRESSED = -999


@dataclass(frozen=True)
class ObfuscationConfig:
    """Mirrors the reference's #config flags (~L40-90 reconstructed)."""

    blur: int = 0
    small_count_mask: int = 10
    small_count_delete: bool = False
    seed: int = 42
    mask_sentinel: int = MASKED


def portable_hash(key_cols: Sequence[str | Column], seed: int) -> Column:
    """Deterministic non-negative integer from (keys, seed): the first 8
    hex chars of md5(concat_ws('|', keys..., seed)) parsed base-16.  A
    JVM-side codegen'd expression (md5/conv/substring); identical on task
    retry, across cluster sizes, and in DuckDB:

        CAST(('0x' || substr(md5(k1 || '|' || ... || '|' || seed), 1, 8))
             AS BIGINT)
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    key = F.concat_ws("|", *[c.cast("string") for c in cols], F.lit(str(seed)))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def seeded_noise(key_cols: Sequence[str | Column], blur: int, seed: int) -> Column:
    """Uniform integer in [-blur, +blur], a pure function of (keys, seed):
    pmod(portable_hash(...), 2b+1) - b."""
    if blur <= 0:
        return F.lit(0)
    return (
        F.pmod(portable_hash(key_cols, seed), F.lit(2 * blur + 1)) - F.lit(blur)
    ).cast("int")


def obfuscate_counts(
    df: DataFrame,
    count_cols: Sequence[str],
    key_cols: Sequence[str],
    cfg: ObfuscationConfig,
) -> DataFrame:
    """Blur + mask (+ delete) the count columns of an aggregate artifact.

    Mask wins over blur (a masked cell is -99 regardless of noise), and a
    blurred count never goes negative — matching the reference's UPDATE
    order (blur pass, then mask pass).
    """
    out = df
    for i, c in enumerate(count_cols):
        col = F.col(c)
        noise = seeded_noise([*key_cols, F.lit(c)], cfg.blur, cfg.seed + i)
        blurred = F.greatest(col + noise, F.lit(0))
        out = out.withColumn(
            c,
            F.when(col < cfg.small_count_mask, F.lit(cfg.mask_sentinel))
            .otherwise(blurred)
            .cast("long"),
        )
    if cfg.small_count_delete:
        keep = None
        for c in count_cols:
            cond = F.col(c) != cfg.mask_sentinel
            keep = cond if keep is None else (keep & cond)
        out = out.filter(keep)
    return out


def round_counts(df: DataFrame, count_cols: Sequence[str], nearest: int = 5) -> DataFrame:
    """F15: demographic rounding option — counts to the nearest multiple.
    Positive counts only, so HALF_UP == away-from-zero in both Spark and
    DuckDB and the oracle hash matches."""
    out = df
    for c in count_cols:
        out = out.withColumn(
            c,
            (F.floor(F.col(c) / F.lit(float(nearest)) + F.lit(0.5)) * nearest).cast(
                "long"
            ),
        )
    return out
