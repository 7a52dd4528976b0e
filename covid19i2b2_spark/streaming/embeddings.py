"""Streaming embedding ingest over the X53 IvfIndex (round 10): new
document embeddings arrive as a stream — the encode stage of a
training-data pipeline emits batches continuously — and each
micro-batch must become SEARCHABLE (routed into the IVF layout under
the frozen centroids) without re-assigning the corpus already indexed.
The embedding analog of streaming/curation.py's ``run_streaming_ingest``
over DedupIndex and streaming/entities.py's resolve loop over
FuzzyIndex — the third index family gets the same operational form.

Replay protocol (single marker — the simple case): IvfIndex.append has
exactly ONE side effect (the partition-wise vector append; assignment
under frozen centroids is deterministic), so a per-epoch marker under
the index root written AFTER the append makes replays of marked epochs
no-ops.  The remaining window — a crash between the append and the
marker — duplicates vector rows on replay.  Unlike DedupIndex (where
duplicated index rows are read only through anti-joins and cost
storage), duplicated CORPUS rows would occupy extra ranks in a kNN
top-k, so the loop's periodic health log (streaming/maintenance.py)
treats ANY duplication_ratio > 1 as a WARNING with the remediation
spelled out: ``compact()`` in a quiet window, or query through
``assigned(dedup=True)`` until then.  The same log carries the
staleness drift — a stream whose embedding distribution wanders away
from the frozen centroids sees ``stale: True`` and should schedule
``rebuild()``.

``checkpoint_dir`` is REQUIRED — epoch ids restart at 0 without a
checkpointLocation and the markers would silently skip new data (the
durable-store contract, round 8)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from covid19i2b2_spark.streaming.maintenance import log_index_health


def ingest_epoch(
    index,
    batch_df: DataFrame,
    epoch_id: int,
    stats_every: int | None = 16,
) -> dict | None:
    """One epoch of the embedding ingest — the foreachBatch body,
    exposed for direct replay testing.  Returns IvfIndex.append's
    counters when the epoch did work (None for empty/replayed-marked
    epochs) so callers can alarm on ``dropped_degenerate`` growth — a
    stream suddenly full of unsearchable vectors is an upstream-encoder
    failure, not an index problem."""
    if batch_df.isEmpty():
        return None
    spark = batch_df.sparkSession
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, marker = hadoop_fs(spark, f"{index.path}/_epochs/embed_{epoch_id}")
    if fs.exists(marker):
        return None  # epoch fully committed before — replayed batch
    counters = index.append(batch_df)
    fs.create(marker, True).close()
    log_index_health(
        index, spark, epoch_id, stats_every, "run_streaming_embedding_ingest"
    )
    return counters


def run_streaming_embedding_ingest(
    vec_stream: DataFrame,
    index,
    checkpoint_dir: str | None = None,
    stats_every: int | None = 16,
):
    """Start the ingest loop; caller drives the returned query.
    ``index`` is an :class:`IvfIndex` whose ``build`` has run (the
    frozen centroids are the routing); the stream's columns must
    include the index's build-time id/vec columns (IvfIndex.append
    validates and raises loudly on a mismatch)."""
    if checkpoint_dir is None:
        raise ValueError(
            "run_streaming_embedding_ingest requires checkpoint_dir: "
            "epoch ids restart at 0 without a checkpointLocation, and "
            "the per-epoch markers would then skip genuinely new data "
            "after a restart (the durable-store contract, round 8)"
        )

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_epoch(index, batch_df, epoch_id, stats_every=stats_every)

    writer = vec_stream.writeStream.foreachBatch(_ingest).trigger(
        availableNow=True
    )
    return writer.option("checkpointLocation", checkpoint_dir).start()
