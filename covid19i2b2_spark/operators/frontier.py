"""X61: politeness-aware crawl-frontier scheduling (SURVEY §2.11
extension; round 11).  A crawler cannot fetch a host as fast as its
cluster can ask: politeness caps each host at a few fetches per
scheduling round, regardless of how many of its URLs are queued.  This
operator turns a prioritized frontier (the output of the X55 → X56
chain: canonicalize → dedup → PageRank-style priority) into round
assignments — at most ``per_host_per_round`` URLs of any host in any
round, best priority first — so round r's slice IS the fetch set, no
driver-side queueing.

Shape: ONE window shuffle keyed on the host (row_number within host by
(priority desc, id asc) — the house deterministic-tie rule), then a
map-only division into rounds.  The window serializes per host, which
is exactly the semantics (a host's URLs form one politeness queue);
the partitionBy key is the HOST, so skew means one task per pathological
host, bounded by that host's frontier share — cap the horizon with
``max_rounds`` to drop (loudly, NULL round) the tail of hosts with more
queued URLs than the crawl will ever reach, which also bounds the
window's useful work.  For per-SITE rather than per-hostname politeness
feed the X55 registered domain (extract_registered_domain) as the key.

No oracle slot (the 50-query window is full); DuckDB parity for the
full schedule lives in tests/test_oracle_parity.py (q_frontier_schedule
— ROW_NUMBER replays it exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def frontier_schedule(
    df: DataFrame,
    host_col: str,
    priority_col: str,
    id_col: str,
    per_host_per_round: int,
    round_col: str = "crawl_round",
    max_rounds: int | None = None,
    per_host_cap_col: str | None = None,
    exclude_col: str | None = None,
) -> DataFrame:
    """df + ``round_col``: 1-based round in which each URL is fetched.

    Within a host, URLs are ordered (priority desc, id asc) and dealt
    into rounds of ``per_host_per_round``; across hosts, rounds are
    independent (round 1 holds every host's top slice — the breadth
    a polite crawl actually achieves).  NULL hosts are unschedulable
    and keep a NULL round (loud, like every invalid row in this
    engine); with ``max_rounds``, rows beyond the horizon also get
    NULL (dropped from the schedule, kept in the frame so the caller
    can count what politeness priced out).

    ``per_host_cap_col`` (round 12, the X67 Crawl-delay consumer):
    names a host-constant long column overriding the cap for that
    host — the standard derivation is
    ``floor(round_seconds / crawl_delay)`` from robots_crawl_delays.
    NULL falls back to ``per_host_per_round``; a cap below 1 is
    raised loudly row-side (a zero cap would silently starve the
    host — if a host must not be crawled, exclude it through
    filter_disallowed, don't zero its quota).

    ``exclude_col`` (round 12, the X66 consumer): names a boolean
    column; True rows get a NULL round WITHOUT consuming a slot —
    they sort after every schedulable row inside their host's window,
    so allowed row numbers are unaffected, and the window stays
    partitioned by the real host (routing excluded rows to a NULL
    host instead would pile them all into ONE window partition — the
    single-task skew this column exists to avoid).  NULL flags read
    as False."""
    if per_host_per_round < 1:
        raise ValueError(
            f"per_host_per_round must be >= 1, got {per_host_per_round}"
        )
    if max_rounds is not None and max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    if per_host_cap_col is None:
        cap = F.lit(per_host_per_round)
    else:
        raw = F.col(per_host_cap_col).cast("long")
        cap = F.coalesce(
            F.when(
                raw.isNotNull() & (raw < 1),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "frontier_schedule: per-host caps must be"
                            " >= 1 (got "
                        ),
                        raw.cast("string"),
                        F.lit(")"),
                    )
                ).cast("long"),
            ).otherwise(raw),
            F.lit(per_host_per_round),
        )
    order = [F.desc(priority_col), F.asc(id_col)]
    if exclude_col is not None:
        excluded = F.coalesce(F.col(exclude_col), F.lit(False))
        order = [F.asc(excluded.cast("int"))] + order
    win = Window.partitionBy(host_col).orderBy(*order)
    rnd = (
        F.floor((F.row_number().over(win) - 1) / cap) + 1
    ).cast("long")
    if max_rounds is not None:
        rnd = F.when(rnd <= max_rounds, rnd)
    rnd = F.when(F.col(host_col).isNotNull(), rnd)
    if exclude_col is not None:
        rnd = F.when(~excluded, rnd)
    return df.withColumn(round_col, rnd)
