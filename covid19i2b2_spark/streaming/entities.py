"""Streaming entity resolution over the X51 FuzzyIndex (round 9; the
TODO round-9 candidate #2): dirty entity strings arrive as a stream —
crawl-extracted author names, site titles, source domains — and each
micro-batch must resolve against EVERYTHING canonical so far, with the
genuinely-new entities folded in so the NEXT micro-batch resolves
against them too.  The entity analog of streaming/curation.py's
``run_streaming_ingest`` over DedupIndex.

foreachBatch is at-least-once, so the writer makes replays safe with a
TWO-marker epoch protocol (a refinement of run_streaming_ingest's
single marker, needed because resolve output depends on index state):

1. resolve the batch (``append_new=False`` — the append is a separate,
   individually-guarded step);
2. write assignments + new_entities to ``epoch=<id>/`` dirs and mark
   ``entity_out_<id>`` — OUTPUTS are exactly-once: a replay whose
   output marker exists never rewrites them, because a crash between
   the append below and the final marker mutates the index, and
   re-resolving against the mutated index would overwrite this epoch's
   new_entities with the (now-empty) re-resolution — silently erasing
   entities from the output record while they live on in the index;
3. append new_entities to the index and mark ``entity_<id>`` LAST.  A
   replay whose output marker exists appends FROM THE DURABLE
   new_entities parquet written in step 2, never from a re-resolution
   (review r9): FuzzyIndex.append writes grams/ then shorts/ as two
   jobs, and after a crash between them a short survivor's gram rows
   make it match itself at dist 0 — a re-resolution would drop it from
   the survivor set and its shorts/ row would be missing FOREVER,
   silently losing every future zero-shared-gram match against it.
   Re-appending the durable record instead costs duplicated gram rows
   at worst, which FuzzyIndex documents as storage-only (candidates
   are dropDuplicates'd; ``compact()`` reclaims).

Every ``stats_every`` epochs (default 16) the loop logs
FuzzyIndex.stats() — WARNING once duplication_ratio crosses
streaming.maintenance.COMPACT_RATIO, the cue to schedule compact()
(VERDICT r9 #5: the replay protocol makes duplicated gram rows a
designed-in cost here, so the signal must be pushed, not pulled).

``checkpoint_dir`` is REQUIRED: epoch ids restart at 0 for a query
without a checkpointLocation, so a restarted stream would collide with
already-marked epochs and silently skip new data — the same contract
the durable sketch stores enforce (streaming/incremental.py, round 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from covid19i2b2_spark.streaming.maintenance import log_index_health


def resolve_epoch(
    index,
    out_path: str,
    id_col: str,
    text_col: str,
    batch_df: DataFrame,
    epoch_id: int,
    stats_every: int | None = 16,
) -> None:
    """One epoch of the resolve loop — the foreachBatch body, exposed
    so the replay protocol (marker states, durable-record append) is
    unit-testable without staging a mid-batch crash inside a real
    stream.  See the module docstring for the two-marker protocol."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, done = hadoop_fs(spark, f"{index.path}/_epochs/entity_{epoch_id}")
    if fs.exists(done):
        return  # epoch fully committed before — replayed batch
    _, out_marker = hadoop_fs(
        spark, f"{index.path}/_epochs/entity_out_{epoch_id}"
    )
    handles: list = []
    if fs.exists(out_marker):
        # replayed epoch whose outputs committed: append from the
        # DURABLE record, never a re-resolution (see the module
        # docstring's step 3 — a partial earlier append would bias
        # the re-resolution and lose shorts rows forever).
        # Explicit schema: an all-resolved epoch's new_entities
        # write can be empty, which plain read can't infer.
        survivors = spark.read.schema(batch_df.schema).parquet(
            f"{out_path}/new_entities/epoch={epoch_id}"
        )
    else:
        survivors, assignments = index.resolve_batch(
            spark,
            batch_df,
            id_col,
            text_col,
            append_new=False,
            cache_handles=handles,
        )
        assignments.write.mode("overwrite").parquet(
            f"{out_path}/assignments/epoch={epoch_id}"
        )
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/new_entities/epoch={epoch_id}"
        )
        fs.create(out_marker, True).close()
    index.append(survivors, id_col, text_col)
    fs.create(done, True).close()
    for h in handles:
        h.unpersist()
    # periodic self-maintenance signal (round 10, VERDICT r9 #5): this
    # loop's replay protocol deliberately RE-APPENDS the durable record
    # (step 3), so a replay-heavy ingest accumulates duplicated gram
    # rows by design — the cadence log is what turns that documented
    # trade into an operational one (WARNING past COMPACT_RATIO = the
    # cue to schedule index.compact() in a quiet window)
    log_index_health(index, spark, epoch_id, stats_every, "resolve_epoch")


def run_streaming_entity_resolution(
    batch_stream: DataFrame,
    index,
    out_path: str,
    id_col: str = "id",
    text_col: str = "name",
    checkpoint_dir: str | None = None,
    stats_every: int | None = 16,
):
    """Start the resolve loop; caller drives the returned query.

    ``index`` is a :class:`FuzzyIndex` whose ``build`` has run
    (possibly on an empty seed).  Per epoch the outputs are:

    - ``out_path/assignments/epoch=<id>/`` — one row per batch row:
      (batch_id, canonical_id, dist), exactly resolve_batch's contract;
    - ``out_path/new_entities/epoch=<id>/`` — the batch rows that
      became new canonical entities (full batch columns).  The union
      over epochs plus the build seed IS the canonical entity table.
    """
    if checkpoint_dir is None:
        raise ValueError(
            "run_streaming_entity_resolution requires checkpoint_dir: "
            "epoch ids restart at 0 without a checkpointLocation, and "
            "the per-epoch markers would then skip genuinely new data "
            "after a restart (the durable-store contract, round 8)"
        )

    def _resolve(batch_df: DataFrame, epoch_id: int) -> None:
        resolve_epoch(
            index, out_path, id_col, text_col, batch_df, epoch_id,
            stats_every=stats_every,
        )

    writer = batch_stream.writeStream.foreachBatch(_resolve).trigger(
        availableNow=True
    )
    return writer.option("checkpointLocation", checkpoint_dir).start()
