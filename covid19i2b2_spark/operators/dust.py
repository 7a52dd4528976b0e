"""X73: DUST parameter-rule mining — content-evidence URL aliasing
(SURVEY §2.11 extension; round 12).  X55 canonicalization strips a
STATIC list of tracking params (utm_*, fbclid, ...); real sites mint
their own content-irrelevant params (affiliate tags, display prefs,
in-house session echoes), and the only trustworthy way to find them is
content evidence: if URLs that differ ONLY in parameter k always carry
the same content fingerprint, k is removable on that host.  Bar-Yossef,
Keidar & Schonfeld, "Do not crawl in the DUST: different URLs with
similar text", WWW 2007, mine exactly this rule family; this operator
is the substitution-rule slice of their scheme (drop-parameter rules),
which in practice removes the bulk of crawl-side aliasing.

Mining shape (all pure expressions, two aggregates):

1. explode each URL's query into its parameter KEYS (a URL with p
   params becomes p rows — the corpus-side fanout is the mean param
   count, small by construction after X55 strips tracking params);
2. per exploded key, the RESIDUAL spelling = the URL with that key's
   params removed and the rest kept sorted (canonical inputs are
   already sorted — filtering preserves it);
3. groupBy (host, key, residual): a group collects the URLs that
   differ only in k.  ``all same fingerprint`` is min(fp) = max(fp) —
   no count-distinct Expand on the exploded corpus;
4. groupBy (host, key): support = groups with >= 2 URLs (a singleton
   group is no evidence), consistency = fraction of support groups
   where the fingerprint never varied.  A rule fires when support >=
   ``min_support`` AND consistency >= ``min_consistency``.

At 100 TB both shuffles are on (host, key[, residual]) — bounded by
the URL space itself, with map-side combine collapsing each group at
the source; nothing is collected.

Fingerprint NULLs: rows with a NULL fingerprint are EXCLUDED from
mining — unlike X71 (where dropping a fetch would shift every later
interval and bias the estimate), here a missing fingerprint simply
carries no sameness evidence in either direction; excluding it only
reduces support, never flips a verdict.  Input contract: one row per
(url); if the caller has multiple snapshots per URL they pick the one
to trust first (the X19 SCD2 current slice is the natural source).

apply_param_rules consumes the mined (host, param_key) pairs as a
BROADCAST host -> key-set map (hosts with rules ~10^5, keys per host
bounded) and strips matching params corpus-wide as pure expressions —
the corpus never shuffles to be rewritten, and sorted-param canonical
form is preserved by construction.

DuckDB parity (full mining replay: unnest + the min=max trick + both
aggregates) lives in tests/test_oracle_parity.py (q_dust_rules —
UNREGISTERED; the 50-query window is full).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _split_url(u: Column) -> tuple[Column, Column, Column]:
    """(host, base-before-?, param array) of an http(s) URL."""
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^#]*)", 1)
    host = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    base = F.regexp_extract(u, r"^([^?#]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    return host, base, params


def _key_of(p: Column) -> Column:
    return F.regexp_extract(p, "^([^=]*)", 1)


def mine_param_rules(
    df: DataFrame,
    url_col: str = "canonical_url",
    fingerprint_col: str = "content_fp",
    *,
    min_support: int = 5,
    min_consistency: float = 1.0,
) -> DataFrame:
    """One row per (host, param_key) with content evidence:
    ``n_groups`` (residual groups with >= 2 URLs), ``n_consistent``
    (those whose fingerprint never varied), ``consistency`` and
    ``is_rule``.  Keys with zero support groups produce no row (no
    evidence is not a verdict).  See module docstring for the NULL
    and input contracts."""
    if not 0.0 < min_consistency <= 1.0:
        raise ValueError(
            f"min_consistency must be in (0, 1], got {min_consistency}"
        )
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    u = F.col(url_col)
    host, base, params = _split_url(u)
    rows = df.filter(
        u.isNotNull()
        & F.lower(u).rlike(r"^https?://")
        & F.col(fingerprint_col).isNotNull()
    ).select(
        host.alias("host"),
        base.alias("__base"),
        params.alias("__params"),
        F.col(fingerprint_col).alias("__fp"),
        u.alias("__url"),
    )
    keys = F.array_distinct(
        F.transform(F.col("__params"), _key_of)
    )
    exploded = rows.select(
        "host",
        "__base",
        "__params",
        "__fp",
        "__url",
        F.explode(keys).alias("param_key"),
    )
    residual = F.concat(
        F.col("__base"),
        F.when(
            F.size(
                F.filter(
                    F.col("__params"),
                    lambda p: _key_of(p) != F.col("param_key"),
                )
            )
            > 0,
            F.concat(
                F.lit("?"),
                F.array_join(
                    F.array_sort(
                        F.filter(
                            F.col("__params"),
                            lambda p: _key_of(p) != F.col("param_key"),
                        )
                    ),
                    "&",
                ),
            ),
        ).otherwise(F.lit("")),
    )
    groups = (
        exploded.withColumn("__residual", residual)
        .groupBy("host", "param_key", "__residual")
        .agg(
            F.count(F.lit(1)).alias("__n_urls"),
            (F.min("__fp") == F.max("__fp")).alias("__same"),
        )
    )
    per_key = (
        groups.filter(F.col("__n_urls") >= 2)
        .groupBy("host", "param_key")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.col("__same").cast("long")).alias("n_consistent"),
        )
        .withColumn(
            "consistency", F.col("n_consistent") / F.col("n_groups")
        )
    )
    return per_key.withColumn(
        "is_rule",
        (F.col("n_groups") >= min_support)
        & (F.col("consistency") >= min_consistency),
    )


def apply_param_rules(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "canonical_url",
    out_col: str | None = None,
) -> DataFrame:
    """Strip every mined-irrelevant param from every URL: ``rules`` is
    (host, param_key) pairs (pre-filtered to is_rule by the caller —
    policy stays with the caller, the X66/X70 split), grouped to one
    broadcast host -> key-set row per host; URLs on hosts without
    rules pass through byte-identical.  Overwrites ``url_col`` unless
    ``out_col`` is given.  Param order (canonical = sorted) is
    preserved — filtering never reorders."""
    out = out_col or url_col
    u = F.col(url_col)
    host, base, params = _split_url(u)
    key_sets = rules.groupBy(
        F.col("host").alias("__rule_host")
    ).agg(F.collect_set("param_key").alias("__drop_keys"))
    joined = df.withColumn("__host", host).join(
        F.broadcast(key_sets),
        F.col("__host") == F.col("__rule_host"),
        "left",
    )
    kept = F.filter(
        params,
        lambda p: ~F.array_contains(F.col("__drop_keys"), _key_of(p)),
    )
    rewritten = F.concat(
        base,
        F.when(
            F.size(kept) > 0,
            F.concat(F.lit("?"), F.array_join(kept, "&")),
        ).otherwise(F.lit("")),
    )
    return (
        joined.withColumn(
            out,
            F.when(F.col("__drop_keys").isNull(), u).otherwise(rewritten),
        )
        .drop("__host", "__rule_host", "__drop_keys")
    )
