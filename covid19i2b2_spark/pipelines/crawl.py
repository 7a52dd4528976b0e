"""Crawl-side composition (round 11): the X55 → X56 → X61 chain as one
pipeline, the frontier counterpart of pipelines/curation.py's text
chain.  A crawler's scheduling input is raw: duplicate spellings of
the same resource, hosts of wildly different value, and a politeness
constraint — this turns (urls, links) into a fetch schedule:

1. canonicalize + URL-keyed dedup (X55): one surviving row per
   canonical resource; rows that don't canonicalize are carried
   through unscheduled (loud NULL round) rather than dropped.
2. host key: ``extract_host`` — or the X55 registered domain
   (eTLD+1) when a public-suffix table is supplied, so politeness
   and priority act per SITE, not per hostname.
3. host-level link graph: link endpoints are mapped onto their
   CANONICAL resources first (a link to a duplicate spelling is a
   link to the resource), then collapsed to weighted host→host edges
   — the graph PageRank actually runs on at web scale (hosts are
   ~1e7 where pages are ~1e11; the host graph is the standard
   frontier-prioritization granularity).  Self-edges (intra-host
   links) are dropped: they carry no cross-site endorsement and a
   big site would otherwise vote for itself.
4. host priority: X56 pagerank over the weighted host graph (edges
   pinned once per run — pre_partition).  Hosts outside the link
   graph get the minimum observed rank (never NULL: an unlinked host
   still gets crawled, last).
5. schedule: X61 frontier_schedule — per-host politeness cap, host
   rank as priority, survivor id as the deterministic tie-break.

Scale shape: steps 1-3 are map-only expressions plus two
high-cardinality groupBys (canonical key, host-edge key); the
PageRank state is host-bounded; the final window shuffles once on the
host.  Nothing touches page text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.frontier import frontier_schedule
from covid19i2b2_spark.operators.graph import pagerank
from covid19i2b2_spark.operators.urls import (
    canonicalize_url,
    extract_host,
    extract_registered_domain,
    mark_disallowed,
    url_dedup,
)


def prioritize_and_schedule(
    urls: DataFrame,
    links: DataFrame,
    id_col: str = "url_id",
    url_col: str = "url",
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    per_host_per_round: int = 10,
    max_rounds: int | None = None,
    psl_rules: DataFrame | None = None,
    damping: float = 0.85,
    n_iter: int = 10,
    disallow_rules: DataFrame | None = None,
    exclude_traps: bool = False,
    trap_thresholds: dict | None = None,
) -> DataFrame:
    """(id, url, canonical_url, host, priority, crawl_round): one row
    per SURVIVING canonical resource (plus the un-canonicalizable
    rows, kept with NULL host/round — the url_dedup contract).
    ``links`` references the ORIGINAL url ids; endpoints are resolved
    through canonicalization, so links to duplicate spellings count
    toward the same resource's host.

    ``disallow_rules`` (round 12, VERDICT r11 missing #3): a
    parse_disallow_rules frame of robots/blocklist exclusions, applied
    BEFORE scheduling — a disallowed URL must never consume a round
    slot (politeness quotas go to fetchable URLs).  Blocked survivors
    stay in the output with a NULL crawl_round (visible, never
    silently dropped — the X33 rule); their hosts still contribute to
    the link graph (a blocked page's outlinks were still observed, and
    priority is a property of the host, not of fetchability).  The
    exclusion rides as mark_disallowed's flag column through
    frontier_schedule's ``exclude_col`` — ONE plan over the corpus
    chain (no allowed/blocked union re-evaluating it per branch), and
    the politeness window stays partitioned by the real host (review
    r12).

    ``exclude_traps`` (round 12, X70): additionally price spider-trap
    URLs out of the schedule — mark_traps' shape heuristics (loop
    segments, calendar runs, session-id params; operators/traps.py)
    OR-fold into the same exclusion flag, so a trapped URL also keeps
    its row (NULL crawl_round) and the corpus still evaluates once.
    ``trap_thresholds`` forwards to trap_signals."""
    id_to_canon = urls.select(
        F.col(id_col).alias("__orig"),
        canonicalize_url(url_col).alias("canonical_url"),
    )
    survivors = url_dedup(urls, id_col, url_col)
    if psl_rules is None:
        keyed = survivors.withColumn("host", extract_host("canonical_url"))
    else:
        with_host = survivors.withColumn(
            "__h", extract_host("canonical_url")
        )
        keyed = extract_registered_domain(
            with_host, "__h", psl_rules, out_col="host"
        ).drop("__h")

    # host-level weighted link graph over CANONICAL endpoints
    canon_host = id_to_canon.select(
        "__orig", extract_host("canonical_url").alias("__host")
    )
    if psl_rules is not None:
        canon_host = extract_registered_domain(
            canon_host, "__host", psl_rules, out_col="__dom"
        ).select("__orig", F.col("__dom").alias("__host"))
    edges = (
        links.join(
            canon_host.select(
                F.col("__orig").alias(src_col),
                F.col("__host").alias("__src_host"),
            ),
            src_col,
        )
        .join(
            canon_host.select(
                F.col("__orig").alias(dst_col),
                F.col("__host").alias("__dst_host"),
            ),
            dst_col,
        )
        .filter(
            F.col("__src_host").isNotNull()
            & F.col("__dst_host").isNotNull()
            & (F.col("__src_host") != F.col("__dst_host"))
        )
        .groupBy(
            F.col("__src_host").alias("src"),
            F.col("__dst_host").alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("n"))
        # pin once: pagerank traverses its edge input several times
        # (node set, degrees, the pre-partition shuffle) and the
        # emptiness probe below is an action too — without the
        # checkpoint each traversal re-runs the two endpoint joins
        .localCheckpoint(eager=True)
    )
    from covid19i2b2_spark.caching import release_local_checkpoint

    try:
        if edges.take(1):
            ranks = pagerank(
                edges, damping=damping, n_iter=n_iter, weight="n"
            ).select(F.col("node").alias("host"), F.col("rank"))
            # unlinked hosts crawl LAST, never not-at-all: floor at the
            # minimum observed rank instead of a NULL priority
            min_rank = ranks.agg(
                F.min("rank").alias("m")
            ).collect()[0]["m"]
            prioritized = keyed.join(ranks, "host", "left").withColumn(
                "priority", F.coalesce("rank", F.lit(float(min_rank)))
            ).drop("rank")
        else:
            prioritized = keyed.withColumn("priority", F.lit(0.0))
    finally:
        # ranks is itself eagerly checkpointed by pagerank, so the
        # returned lazy schedule never re-reads the edge blocks
        release_local_checkpoint(edges)
    frame, flags = prioritized, []
    if disallow_rules is not None:
        frame = mark_disallowed(
            frame, disallow_rules, url_col="canonical_url",
            out_col="__blocked",
        )
        flags.append("__blocked")
    if exclude_traps:
        from covid19i2b2_spark.operators.traps import mark_traps

        frame = mark_traps(
            frame, url_col="canonical_url", out_col="__trap_reasons",
            flag_col="__trap", **(trap_thresholds or {}),
        )
        flags.append("__trap")
    if not flags:
        return frontier_schedule(
            frame,
            "host",
            "priority",
            id_col,
            per_host_per_round,
            max_rounds=max_rounds,
        )
    exclude = flags[0]
    if len(flags) > 1:
        # OR-fold into one flag so frontier_schedule sees a single
        # exclusion column (each flag is already NULL-safe False)
        frame = frame.withColumn(
            "__excluded", F.col(flags[0]) | F.col(flags[1])
        )
        exclude = "__excluded"
    return frontier_schedule(
        frame,
        "host",
        "priority",
        id_col,
        per_host_per_round,
        max_rounds=max_rounds,
        exclude_col=exclude,
    ).drop("__blocked", "__trap", "__trap_reasons", "__excluded")
