"""Incremental artifact maintenance (SURVEY §2.10 ST5 + north star).

The reference's operating model is "re-run the whole script weekly"; the
incremental mode keeps a running artifact table current as observations
stream in:

- ``incremental_positive_counts``: watermarked daily counts of positive
  tests, merged into a running per-day table by ``foreachBatch`` +
  merge_upsert — the continuous version of DailyCounts' new-admissions
  feed.  Parity contract: after draining a bounded stream, the running
  table equals the batch groupBy (tests/test_streaming.py).
- ``stateful_user_totals``: custom stateful operator via
  applyInPandasWithState (X6) — per-user running totals with explicit
  state, the escape hatch when built-in windowed aggs can't express the
  semantics.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from covid19i2b2_spark.operators.merge import merge_upsert


class RunningTable:
    """Tiny in-memory merge target for tests; production swaps this for a
    Delta/parquet table with the same merge_upsert call."""

    def __init__(self, spark, keys: list[str]):
        self.spark = spark
        self.keys = keys
        self.df: DataFrame | None = None

    def merge(self, updates: DataFrame) -> None:
        updates = updates.localCheckpoint()  # pin each micro-batch
        self.df = (
            updates
            if self.df is None
            else merge_upsert(self.df, updates, self.keys).localCheckpoint()
        )


def incremental_positive_counts(
    stream: DataFrame,
    target: RunningTable,
    positive_event: str = "signup",
    watermark: str = "2 days",
):
    """Maintain per-day positive-test counts incrementally.  Update-mode
    aggregation emits changed days per micro-batch; foreachBatch merges
    them into the running table keyed by day (idempotent upsert — a
    replayed batch converges to the same table)."""
    agg = (
        stream.filter(F.col("event_type") == positive_event)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_positive"))
        .select(F.to_date(F.col("w.start")).alias("event_date"), "n_positive")
    )

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        target.merge(batch_df)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )


_STATE_SCHEMA = "n_events long, total_value double"
_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """X6: arbitrary stateful processing — per-user running (count, sum)
    with explicit GroupState, Arrow-batched.  Built-in aggs cover this
    case; the operator exists as the template for genuinely custom state
    (e.g. per-patient clinical state machines)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class RunningSketchStore:
    """In-memory merge target for the streaming HLL distinct-count store
    (operators/sketches.py); production swaps this for a parquet/Delta
    table holding (day, sketch) with the same union-merge."""

    def __init__(self, spark):
        self.spark = spark
        self.df: DataFrame | None = None

    def merge(self, batch_sketches: DataFrame) -> None:
        b = batch_sketches.localCheckpoint()
        if self.df is None:
            self.df = b
            return
        self.df = (
            self.df.unionByName(b)
            .groupBy("day")
            .agg(F.hll_union_agg("sketch").alias("sketch"))
            .localCheckpoint()
        )


def incremental_distinct_users(
    stream: DataFrame, target: RunningSketchStore, lg_k: int = 12
):
    """Maintain per-day distinct-user HLL sketches as events stream in:
    each micro-batch aggregates into kilobyte sketches inside
    foreachBatch and union-merges them into the running store — the
    streaming form of sketches.build_distinct_sketches +
    merge_sketch_stores.  Coarser-grained distinct questions (weekly /
    total) are answered from the store via rollup_distinct_sketches
    without ever re-reading the stream's history.

    Replay note: HLL union is SET-semantics idempotent — re-merging a
    replayed batch's sketch is a no-op for the estimate (union(s, s) =
    s), so the store's distinct counts are exactly-once even though
    foreachBatch is at-least-once.  (This is why the streaming store
    carries no n_rows column: a row COUNT would double on replay.)"""

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sk = (
            batch_df.select(F.to_date("ts").alias("day"), "user_id")
            .groupBy("day")
            .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(lg_k)).alias("sketch"))
        )
        target.merge(sk)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )


class RunningTopkStore:
    """In-memory merge target for the streaming frequent-items store
    (operators/sketches.py top-k family); production swaps this for a
    parquet/Delta table of summary rows with the same merge call.

    Unlike HLL union, SpaceSaving merge is NOT replay-idempotent (counts
    sum, so a re-merged batch double-counts) — the store therefore keys
    merges on ``epoch_id`` and skips epochs it has already folded in.

    DURABILITY CAVEAT: this epoch set lives in DRIVER MEMORY only —
    weaker than the commit markers streaming/curation.py writes to
    disk.  Within one process it guards replays correctly, but if the
    stream runs with a ``checkpointLocation`` and the driver restarts,
    Spark resumes PAST already-committed epochs against a fresh, empty
    store — silently undercounting.  A production swap must persist the
    folded-epoch set (e.g. an ``_epochs`` column or side table written
    atomically with the summary rows) so restart recovery can tell
    "epoch folded before the crash" from "epoch never seen"."""

    def __init__(self, spark, group_cols: list[str], k: int = 64):
        self.spark = spark
        self.group_cols = group_cols
        self.k = k
        self.df: DataFrame | None = None
        self._epochs: set[int] = set()

    def merge(self, batch_sketches: DataFrame, epoch_id: int) -> None:
        from covid19i2b2_spark.operators.sketches import merge_topk_sketches

        if epoch_id in self._epochs:
            return  # replayed micro-batch: already folded in
        b = batch_sketches.localCheckpoint()
        if self.df is None:
            self.df = b
        else:
            self.df = merge_topk_sketches(
                self.df.unionByName(b), self.group_cols, self.k
            ).localCheckpoint()
        self._epochs.add(epoch_id)


def incremental_topk_tokens(
    stream: DataFrame,
    target: RunningTopkStore,
    group_col: str = "source",
    text_col: str = "text",
):
    """Maintain per-group heavy-hitter token summaries as documents
    stream in: each micro-batch builds its own exact top-k summaries
    inside foreachBatch (one narrow aggregate over the batch) and folds
    them into the running store via the SpaceSaving merge — the
    streaming form of build_topk_sketches + merge_topk_sketches.  The
    store answers "what tokens dominate each source so far?" with
    [count_lo, count_hi] bounds, never re-reading stream history."""
    from covid19i2b2_spark.operators.sketches import build_topk_sketches
    from covid19i2b2_spark.operators.text import tokens

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks = batch_df.select(
            group_col, F.explode(tokens(F.lower(text_col))).alias("token")
        )
        target.merge(
            build_topk_sketches(toks, [group_col], "token", k=target.k),
            epoch_id,
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )


class RunningQuantileStore:
    """In-memory merge target for the streaming quantile store
    (operators/sketches.py DDSketch-style histograms).  Like the top-k
    store — and unlike HLL union — the merge SUMS counts, so replays
    double-count without the epoch guard.  Same driver-memory-only
    durability caveat as :class:`RunningTopkStore`: the epoch set does
    NOT survive a driver restart, so resuming from a checkpointLocation
    against a fresh store undercounts; production must persist the
    folded-epoch set alongside the summary table."""

    def __init__(self, spark, group_cols: list[str]):
        self.spark = spark
        self.group_cols = group_cols
        self.df: DataFrame | None = None
        self._epochs: set[int] = set()

    def merge(self, batch_sketches: DataFrame, epoch_id: int) -> None:
        from covid19i2b2_spark.operators.sketches import (
            merge_quantile_sketches,
        )

        if epoch_id in self._epochs:
            return
        b = batch_sketches.localCheckpoint()
        if self.df is None:
            self.df = b
        else:
            self.df = merge_quantile_sketches(
                self.df.unionByName(b), self.group_cols
            ).localCheckpoint()
        self._epochs.add(epoch_id)


def incremental_value_quantiles(
    stream: DataFrame,
    target: RunningQuantileStore,
    value_col: str = "value",
    eps: float = 0.01,
):
    """Maintain per-day value-distribution histograms as events stream
    in: per-batch DDSketch build in foreachBatch, exact count-sum merge
    into the running store.  Any quantile at any grain then answers
    from kilobyte histogram rows — the streaming percentile monitor
    (latency/size/score distributions) without retained raw history."""
    from covid19i2b2_spark.operators.sketches import build_quantile_sketches

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sk = build_quantile_sketches(
            batch_df.select(F.to_date("ts").alias("day"), value_col),
            ["day"],
            value_col,
            eps=eps,
        )
        target.merge(sk, epoch_id)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )


class RunningCmStore:
    """In-memory merge target for the streaming Count-Min store
    (operators/sketches.py X47 family); production swaps this for a
    parquet table of cell rows with the same merge call.

    Cell-wise count addition is NOT replay-idempotent (a re-merged
    batch double-counts every cell), so merges key on ``epoch_id`` —
    the same contract and DURABILITY CAVEAT as RunningTopkStore: the
    epoch set lives in driver memory; a production swap must persist it
    atomically with the cell rows."""

    def __init__(
        self,
        spark,
        group_cols: list[str],
        depth: int = 4,
        width: int = 1024,
        seed: int = 42,
    ):
        self.spark = spark
        self.group_cols = group_cols
        self.depth = depth
        self.width = width
        self.seed = seed
        self.df: DataFrame | None = None
        self._epochs: set[int] = set()

    def merge(self, batch_sketches: DataFrame, epoch_id: int) -> None:
        from covid19i2b2_spark.operators.sketches import merge_cm_sketches

        if epoch_id in self._epochs:
            return  # replayed micro-batch: already folded in
        b = batch_sketches.localCheckpoint()
        if self.df is None:
            self.df = b
        else:
            self.df = merge_cm_sketches(
                self.df.unionByName(b), self.group_cols
            ).localCheckpoint()
        self._epochs.add(epoch_id)


def incremental_cm_tokens(
    stream: DataFrame,
    target: RunningCmStore,
    group_col: str = "source",
    text_col: str = "text",
):
    """Maintain per-group Count-Min token-frequency cells as documents
    stream in: each micro-batch builds its own cell store inside
    foreachBatch (one narrow aggregate over the batch) and folds it in
    by cell-wise addition — the streaming form of build_cm_sketches +
    merge_cm_sketches.  The store answers "how often has THIS token
    appeared per source so far?" for any probe vocabulary via
    cm_estimates, never re-reading stream history."""
    from covid19i2b2_spark.operators.sketches import build_cm_sketches
    from covid19i2b2_spark.operators.text import tokens

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        toks = batch_df.select(
            group_col, F.explode(tokens(F.lower(text_col))).alias("token")
        )
        target.merge(
            build_cm_sketches(
                toks,
                [group_col],
                "token",
                depth=target.depth,
                width=target.width,
                seed=target.seed,
            ),
            epoch_id,
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )
