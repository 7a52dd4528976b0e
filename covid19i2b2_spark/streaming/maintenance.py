"""Operational index self-maintenance for the streaming loops
(VERDICT r9 #5).  DedupIndex/FuzzyIndex/IvfIndex all EXPOSE health
signals (stats()/health(): replay duplication, bloom load, staleness),
but pull-only signals go unread in practice — a long-lived
at-least-once ingest discovers index bloat only when someone remembers
to ask.  This module makes the discipline push: every ``stats_every``
completed epochs the loop logs the index's own report, at WARNING once
the duplication ratio crosses the compact threshold.

Threshold: ``COMPACT_RATIO = 1.5`` — at 1.5x the one-shot row counts,
half again the index bytes stream through every batch's anti-join /
gram-join shuffle for zero extra answers; that is the same trip point
the sharded bloom uses for its load_ratio self-heal
(operators/dedup_incremental.py filter_batch), so one number governs
"this structure has outgrown its build" everywhere.  The log is a CUE:
compaction wants a quiet moment (it rewrites index tables), so the
loops never compact mid-stream on their own.

Cost: stats() is 2 aggregate jobs over index-sized tables, so the
default cadence is every 16 epochs, not per batch; pass
``stats_every=None`` to a loop to opt out, ``1`` to measure every
epoch (tests do)."""

from __future__ import annotations

import logging

from pyspark.sql import SparkSession

_LOG = logging.getLogger(__name__)

COMPACT_RATIO = 1.5


def log_index_health(
    index,
    spark: SparkSession,
    epoch_id: int,
    stats_every: int | None,
    loop: str,
) -> dict | None:
    """Log ``index.stats()`` — or ``index.health()`` for indexes built
    on that contract (IvfIndex) — plus the sharded-bloom load when that
    gate is present, on the cadence; returns the stats dict when it
    fired (None otherwise) so loop tests can assert on content.  Fires
    on epochs stats_every-1, 2*stats_every-1, ... so ``stats_every=1``
    fires every epoch and the default 16 first fires once a restart-
    free stream has actually done some work.  Never raises: a health
    probe must not kill the ingest it watches.

    Severity semantics differ by report shape: a report carrying
    ``stale`` (IvfIndex.health) warns on ANY duplication (>1.0 — there
    duplicates occupy extra kNN ranks, a correctness cue) and on the
    staleness flag itself (the rebuild cue); a stats() report warns
    only past COMPACT_RATIO (duplication is storage/shuffle cost,
    results stay correct through the anti-join / DISTINCT reads)."""
    if not stats_every or (epoch_id + 1) % stats_every != 0:
        return None
    try:
        if hasattr(index, "stats"):
            st = dict(index.stats(spark))
        else:
            st = dict(index.health(spark))
        blooms = getattr(index, "sharded_fp_path", None)
        if blooms is not None:
            from covid19i2b2_spark.fsutil import hadoop_fs

            fs, p = hadoop_fs(spark, index.sharded_fp_path)
            if fs.exists(p):
                from covid19i2b2_spark.operators.bloom_sharded import (
                    sharded_bloom_health,
                )

                st["sharded_bloom_load_ratio"] = sharded_bloom_health(
                    spark, index.sharded_fp_path
                )["load_ratio"]
        ratio = st.get("duplication_ratio", 1.0)
        dup_is_correctness = getattr(
            index, "DUPLICATION_IS_CORRECTNESS", False
        )
        if dup_is_correctness and "stale" not in st and ratio > 1.0:
            _LOG.warning(
                "%s epoch %d: index duplication_ratio %.4f > 1 — "
                "replayed postings double their ranked-score "
                "contribution; search(dedup=True) or compact() before "
                "trusting ranked output: %s",
                loop, epoch_id, ratio, st,
            )
        elif "stale" in st and (ratio > 1.0 or st["stale"]):
            _LOG.warning(
                "%s epoch %d: IVF index needs maintenance — %s: %s",
                loop,
                epoch_id,
                " and ".join(
                    ([f"duplication_ratio {ratio:.4f} > 1 (replayed "
                      "appends occupy extra kNN ranks — compact() or "
                      "query through assigned(dedup=True))"]
                     if ratio > 1.0 else [])
                    + ([f"cosine_drift {st.get('cosine_drift')} is "
                        "past the staleness bar — rebuild() to "
                        "retrain centroids"]
                       if st["stale"] else [])
                ),
                st,
            )
        elif "stale" not in st and ratio > COMPACT_RATIO:
            _LOG.warning(
                "%s epoch %d: index duplication_ratio %.3f exceeds the "
                "compact threshold %.1f — schedule index.compact() "
                "(replayed appends; results stay correct, every batch "
                "pays the extra shuffle volume): %s",
                loop, epoch_id, ratio, COMPACT_RATIO, st,
            )
        else:
            _LOG.info("%s epoch %d: index health %s", loop, epoch_id, st)
        # fragmentation is orthogonal to replay duplication (VERDICT
        # r10 #4): many CLEAN appends still leave a term's postings
        # smeared across one file set per batch, so the probe pays
        # footers/seeks instead of postings — its own WARNING with
        # compact() as the named remedy
        frag_bar = getattr(index, "COMPACT_FILES_PER_TERM", None)
        if frag_bar and st.get("files_per_term_max", 0) > frag_bar:
            _LOG.warning(
                "%s epoch %d: index postings are fragmentation-bound — "
                "files_per_term_max %d > %d (each append writes its own "
                "file set, so a term's probe touches ~one file per "
                "appended batch even with zero replay); schedule "
                "index.compact() to rewrite one tight term-sorted file "
                "set: %s",
                loop, epoch_id, st["files_per_term_max"], frag_bar, st,
            )
        return st
    except Exception:
        _LOG.exception(
            "%s epoch %d: index health probe failed (ingest continues)",
            loop, epoch_id,
        )
        return None
