"""Streaming corpus-drift monitor (round 9; the X45 streaming form):
per micro-batch Jensen-Shannon divergence of the incoming token
distribution against a FROZEN reference snapshot — the ingest alarm
that fires when a broken extractor / encoding regression / source
takeover shifts the distribution, long before anyone reads a sample.

Shape: the reference corpus is token-counted ONCE at monitor start and
the (vocabulary-bounded) count table pinned with an eager
localCheckpoint, so each epoch pays only the BATCH-side aggregate plus
the bounded-key join (operators/drift.py divergence_from_counts — the
same fixed-point JS arithmetic the batch operator and its DuckDB
oracle share).  One output row per (group) per epoch, written to
``out_path/epoch=<id>/``.

Replay-idempotence needs NO markers here, unlike the ingest/entity
loops: the epoch result is a pure function of (batch, frozen
reference), and the only side effect is the epoch-keyed OVERWRITE
write — a replay recomputes the same rows over themselves.
``checkpoint_dir`` is still REQUIRED: epoch ids restart at 0 without a
checkpointLocation, and a restarted stream would then overwrite epoch
0's historical row with a different batch's result (silent history
corruption — the same contract every durable streaming surface in this
repo enforces, round 8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def run_streaming_drift_monitor(
    docs_stream: DataFrame,
    reference: DataFrame,
    out_path: str,
    text_col: str = "text",
    group_cols: Sequence[str] = ("source",),
    checkpoint_dir: str | None = None,
    alert_threshold: float | None = None,
):
    """Start the monitor; caller drives the returned query.

    ``reference`` is the blessed static snapshot (DataFrame).  Output
    rows carry drift.corpus_divergence's full schema (token/type
    triage columns + ``js_divergence``) plus ``epoch_id`` and — when
    ``alert_threshold`` is set — a boolean ``alert`` column
    (``js_divergence > threshold``), so downstream alerting is one
    filter over the output table."""
    if checkpoint_dir is None:
        raise ValueError(
            "run_streaming_drift_monitor requires checkpoint_dir: epoch "
            "ids restart at 0 without a checkpointLocation and a "
            "restarted stream would overwrite historical epoch rows "
            "with unrelated batches' results"
        )
    from covid19i2b2_spark.operators.drift import (
        _token_counts,
        divergence_from_counts,
    )

    g = list(group_cols)
    # reference counts: vocabulary-bounded, computed once, pinned —
    # NOT released (the monitor reads them every epoch for its
    # lifetime; dropping the handle on stream stop leaves the
    # ContextCleaner fallback, the long-lived-resource convention)
    ref_counts = _token_counts(reference, text_col, g, "a").localCheckpoint(
        eager=True
    )

    def _measure(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_counts = _token_counts(batch_df, text_col, g, "b")
        out = divergence_from_counts(ref_counts, batch_counts, g).withColumn(
            "epoch_id", F.lit(epoch_id).cast("long")
        )
        if alert_threshold is not None:
            out = out.withColumn(
                "alert", F.col("js_divergence") > F.lit(alert_threshold)
            )
        out.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")

    writer = docs_stream.writeStream.foreachBatch(_measure).trigger(
        availableNow=True
    )
    return writer.option("checkpointLocation", checkpoint_dir).start()
