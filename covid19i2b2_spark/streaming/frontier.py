"""X61'': streaming URL-frontier ingest (round 11) — discovered URLs
arrive in micro-batches (link extraction emits them continuously);
the frontier must admit each RESOURCE once, ever, across batches,
restarts, and replays.  This is the crawl-side twin of
streaming/curation.run_streaming_ingest: canonicalize (X55), dedup
within the batch, anti-join against the persisted
:class:`~covid19i2b2_spark.operators.urls.SeenUrlSet`, land the truly
new URLs as the epoch's frontier increment, fold them into the seen
set — so the NEXT batch dedups against this one too.

Replay contract (the house at-least-once story, the curation loop's
exact shape):

- new URLs write to ``out_path/epoch=<epoch_id>/`` with OVERWRITE —
  a replayed epoch replaces its own output (frontier increments are
  exactly-once);
- rows whose URL doesn't canonicalize route to
  ``out_path/_quarantine/epoch=<epoch_id>/`` (the X33
  quarantine-routing rule: garbage is preserved and visible, never
  silently dropped, never admitted);
- a per-epoch marker under the seen-set root commits all three side
  effects; a replayed marked epoch is skipped entirely;
- a replay of an UNMARKED epoch whose increment already committed
  (``epoch=<id>/_SUCCESS`` present — the crash fell between the
  increment write and the marker) RE-APPLIES from the durable
  increment instead of recomputing: by then ``seen.append`` may have
  run, so a recomputed ``filter_new`` would come back empty and the
  overwrite would replace the committed increment with nothing —
  URLs in the seen set but absent from every frontier, permanently
  unscheduled (the round-9 multi-write-replay rule: re-apply from
  the durable output record, never a re-computation);
- with that, the surviving crash windows cost only duplicated seen
  ROWS (a replayed ``seen.append``), which anti-join reads absorb —
  storage cost only, surfaced by the periodic health log at the
  storage-severity COMPACT_RATIO wording
  (SeenUrlSet.DUPLICATION_IS_CORRECTNESS is False), remediated by
  ``compact()``.

``checkpoint_dir`` is REQUIRED — every durable side effect is keyed on
epoch_id, and only a stable checkpoint makes epoch ids name the same
batch content across restarts (the round-8 durable-store rule).
Caller drives the returned query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.caching import release_local_checkpoint
from covid19i2b2_spark.fsutil import hadoop_fs
from covid19i2b2_spark.operators.urls import url_dedup
from covid19i2b2_spark.streaming.maintenance import log_index_health


def run_streaming_frontier_ingest(
    urls_stream: DataFrame,
    seen,
    out_path: str,
    id_col: str = "url_id",
    url_col: str = "url",
    strip_www: bool = True,
    checkpoint_dir: str | None = None,
    stats_every: int | None = 16,
):
    """Start the frontier ingest over a streaming (id, url) frame.
    ``seen`` is a :class:`SeenUrlSet` whose ``build`` has run
    (possibly on an empty seed).  Each epoch's output rows carry
    (id, url, canonical_url, n_duplicates) — url_dedup's survivor
    shape, so downstream scheduling (pipelines/crawl.py) consumes
    them directly.

    ``checkpoint_dir`` is REQUIRED (the round-8 durable-epoch-guard
    rule, review r12): every durable side effect here — the epoch
    markers AND the committed-increment re-apply — is keyed on
    epoch_id, and only a stable checkpoint makes epoch ids name the
    same batch content across restarts.  A checkpoint-less restart
    renumbers from 0 with whatever the inbox holds NOW: a marked or
    _SUCCESS-committed epoch 0 would then silently swallow a
    DIFFERENT batch (skipped outright, or replaced by the stale
    increment)."""
    if checkpoint_dir is None:
        raise ValueError(
            "run_streaming_frontier_ingest requires checkpoint_dir: "
            "epoch markers and committed-increment re-applies are "
            "keyed on epoch_id, which only a stable checkpoint makes "
            "durable across restarts"
        )

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fs, marker = hadoop_fs(spark, f"{seen.path}/_epochs/{epoch_id}")
        if fs.exists(marker):
            return  # epoch fully committed before — replayed batch
        deduped = url_dedup(batch_df, id_col, url_col, strip_www)
        valid = deduped.filter(F.col("canonical_url").isNotNull())
        invalid = deduped.filter(F.col("canonical_url").isNull())
        epoch_path = f"{out_path}/epoch={epoch_id}"
        # resolve the OUTPUT path's own filesystem — out_path and the
        # seen set may live on different stores
        out_fs, success = hadoop_fs(spark, f"{epoch_path}/_SUCCESS")
        pinned = None
        if out_fs.exists(success):
            # prior attempt committed the increment but crashed before
            # the marker — and possibly AFTER seen.append, so the batch
            # may already be in the seen set and a recomputed
            # filter_new would be empty.  Re-apply from the durable
            # record (explicit schema: an all-seen batch commits an
            # empty increment).
            new = spark.read.schema(valid.schema).parquet(epoch_path)
        else:
            new = seen.filter_new(spark, valid).localCheckpoint(
                eager=True
            )
            pinned = new
            new.write.mode("overwrite").parquet(epoch_path)
        invalid.write.mode("overwrite").parquet(
            f"{out_path}/_quarantine/epoch={epoch_id}"
        )
        seen.append(new)
        fs.create(marker, True).close()
        if pinned is not None:
            release_local_checkpoint(pinned)
        log_index_health(
            seen, spark, epoch_id, stats_every,
            "run_streaming_frontier_ingest",
        )

    return (
        urls_stream.writeStream.foreachBatch(_ingest)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
