"""X82: redirect-chain resolution via pointer doubling (SURVEY §2.11
extension; round 12).  A crawl's 3xx responses form a functional graph
url → Location, and everything downstream needs the FINAL url: link
credit (X64), PageRank mass (X56), dedup identity (X55), re-crawl
state (X80) all mis-attribute when half the corpus points at hop #1 of
a chain.  Resolving by following one hop per round is O(longest chain)
shuffles; this operator uses POINTER DOUBLING (the classic
parallel-list-ranking contraction: after k rounds every pointer has
advanced min(2^k, chain) hops), so ``max_hops`` needs only
ceil(log2(max_hops)) self-joins — 32-hop chains cost 5 rounds, and
each round is one equi-join of the redirect table with ITSELF (edge-
sized, never corpus-sized).

Cycles and over-long chains cannot resolve; they stay in-domain
forever while their hop counts double past ``max_hops``.  The final
pass marks them loudly — (final_url NULL, resolved false) — instead
of emitting a rotating member of the cycle (the X33 rule: an
unresolvable redirect is a data fact, not a silent choice).  Browsers
cap at ~20 hops for the same reason; ``max_hops=32`` is deliberately
past that.

A src with MULTIPLE recorded Locations (re-fetch snapshots that moved)
folds to the lexicographically smallest dst first — deterministic; a
caller with fetch timestamps should pre-pick the newest snapshot (the
X19 SCD2 current slice) before resolving.

``redirect_edges`` builds the graph from the X75 WARC frame: 3xx
records' Location headers, RESOLVED against the record's own URI with
X69's RFC 3986 resolver (relative Locations are legal and common).

DuckDB parity (recursive-CTE replay of full chain following with
cycle cutoff) lives in tests/test_oracle_parity.py (q_redirects —
UNREGISTERED; the 50-query window is full).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def redirect_edges(
    records: DataFrame,
    uri_col: str = "target_uri",
    status_col: str = "http_status",
    location_col: str = "http_location",
) -> DataFrame:
    """(src, dst) from a fetch-record frame's 3xx rows, Location
    resolved against the record's own URI (relative Locations are
    legal per RFC 9110 and common in the wild).  Unresolvable
    Locations (garbage that X69 maps to NULL) drop — they redirect
    nowhere a crawler can follow."""
    from covid19i2b2_spark.operators.links import resolve_url

    # the dst validity checks run INSIDE an array-filter + explode:
    # a plain .filter() on the aliased column substitutes the whole
    # resolve_url tree into the predicate (2-3 evaluations per row and
    # ~58 KB of plan measured); the generator is a substitution
    # barrier, so resolution evaluates once (the extract_links rule)
    edge = F.struct(
        F.col(uri_col).alias("src"),
        resolve_url(F.col(uri_col), F.col(location_col)).alias("dst"),
    )
    return (
        records.filter(
            F.col(status_col).between(300, 399)
            & F.col(location_col).isNotNull()
            & F.col(uri_col).isNotNull()
        )
        .select(
            F.explode(
                F.filter(
                    F.array(edge),
                    lambda e: e["dst"].isNotNull()
                    & (e["src"] != e["dst"]),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 32,
    cache_handles: list | None = None,
    plan_probe: dict | None = None,
) -> DataFrame:
    """(src, final_url, n_hops, resolved) for every redirecting url.

    Pointer doubling (module docstring): ceil(log2(max_hops)) + 1
    rounds of one edge-sized self-join each, with an early stop when
    the mapping's (count, hash) signature stabilizes.  Rows whose
    final pointer is still itself a redirect source after the cap —
    cycles and chains longer than ``max_hops`` — get final_url NULL,
    resolved false (loud).  ``plan_probe`` receives ``n_rounds``."""
    from covid19i2b2_spark.caching import (
        CheckpointHandle,
        release_local_checkpoint,
    )

    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    m = (
        edges.groupBy(F.col("src"))
        .agg(F.min("dst").alias("dst"))
        .withColumn("hops", F.lit(1).cast("long"))
        .localCheckpoint(eager=True)
    )
    n_rounds = int(math.ceil(math.log2(max_hops))) + 1 if max_hops > 1 else 1
    prev_sig = None
    rounds = 0
    for _ in range(n_rounds):
        rounds += 1
        nxt = (
            m.alias("a")
            .join(
                m.select(
                    F.col("src").alias("__bsrc"),
                    F.col("dst").alias("__bdst"),
                    F.col("hops").alias("__bhops"),
                ),
                F.col("a.dst") == F.col("__bsrc"),
                "left",
            )
            .select(
                F.col("a.src").alias("src"),
                F.coalesce("__bdst", F.col("a.dst")).alias("dst"),
                (
                    F.col("a.hops") + F.coalesce("__bhops", F.lit(0))
                ).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(m)
        m = nxt
        sig_row = m.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64("src", "dst", "hops")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    if plan_probe is not None:
        plan_probe["n_rounds"] = rounds
    # a pointer still landing on a redirect SOURCE is unresolved
    # (cycle member or > max_hops chain); so is any hop count past
    # the cap (doubling overshoots inside cycles)
    srcs = m.select(F.col("src").alias("__s")).distinct()
    out = (
        m.join(srcs, m["dst"] == F.col("__s"), "left")
        .select(
            "src",
            F.when(
                F.col("__s").isNull() & (F.col("hops") <= max_hops),
                F.col("dst"),
            ).alias("final_url"),
            F.col("hops").alias("n_hops"),
            (
                F.col("__s").isNull() & (F.col("hops") <= max_hops)
            ).alias("resolved"),
        )
        .localCheckpoint(eager=True)
    )
    release_local_checkpoint(m)
    if cache_handles is not None:
        cache_handles.append(CheckpointHandle(out))
    return out
