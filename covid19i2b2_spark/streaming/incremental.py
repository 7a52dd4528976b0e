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


class _SummaryStore:
    """Shared merge-target machinery for the running sketch stores
    (HLL / SpaceSaving top-k / DDSketch quantile / Count-Min).  Two
    modes:

    - **in-memory** (``path=None``, the test default): the merged
      summary and the folded-epoch set live in driver memory
      (localCheckpoint-pinned frames).  Replays within one process are
      guarded, but a driver RESTART loses both — resuming a
      checkpointed stream against a fresh store silently undercounts,
      and re-merging a replayed epoch double-counts the
      non-replay-idempotent merges (every store except HLL).
    - **durable** (``path`` set — round 8, VERDICT r7 #1): each fold
      writes the merged summary to ``{path}/state/epoch=<id>`` and
      THEN creates the zero-byte marker ``{path}/_epochs/<id>`` — the
      same marker-after-data commit ordering as the streaming crawl
      ingest (streaming/curation.py).  A fresh store instance pointed
      at the same path restores the folded-epoch set from the markers
      and the summary from the latest MARKED epoch's state, so a
      restarted driver over an at-least-once source skips every epoch
      folded before the crash instead of double-counting it.

    Durable crash windows, all fail-safe:

    - crash after the state write, before the marker: restore ignores
      the unmarked state dir (loads the previous marked epoch) and the
      replayed batch overwrites it — converges to identical state;
    - crash after the marker, before pruning: a superseded state dir
      survives as garbage; restore still reads only max(marked);
    - a replayed already-marked epoch is skipped before any job runs.

    Superseded state dirs are pruned after each commit, so the durable
    footprint is one summary table + one marker file per folded epoch
    (markers are zero bytes; compact them by re-basing the store path
    if billions of epochs ever matter).  Pruning invalidates summary
    FRAMES returned before the latest merge — read ``.df`` after
    merging, not before.

    Epoch contract (review r8): the durable guard assumes epoch ids
    are MONOTONIC across process restarts, which Structured Streaming
    only guarantees for a query resumed from a stable
    checkpointLocation — a fresh un-checkpointed query numbers batches
    from 0 again, colliding with marked epochs (new data silently
    skipped).  :func:`_start_store_stream` enforces this: a durable
    target refuses to start without ``checkpoint_location``."""

    def __init__(self, spark, path: str | None = None):
        self.spark = spark
        self.path = path.rstrip("/") if path else None
        self.df: DataFrame | None = None
        self._epochs: set[int] = set()
        if self.path is not None:
            self._restore()

    def _fold(self, both: DataFrame) -> DataFrame:
        raise NotImplementedError

    def _state_dir(self, epoch_id: int) -> str:
        return f"{self.path}/state/epoch={epoch_id}"

    def _restore(self) -> None:
        from covid19i2b2_spark.fsutil import hadoop_fs

        fs, mdir = hadoop_fs(self.spark, f"{self.path}/_epochs")
        if not fs.exists(mdir):
            return
        self._epochs = {
            int(st.getPath().getName()) for st in fs.listStatus(mdir)
        }
        if self._epochs:
            self.df = self.spark.read.parquet(
                self._state_dir(max(self._epochs))
            )

    def _commit(self, merged: DataFrame, epoch_id: int) -> None:
        from covid19i2b2_spark.fsutil import hadoop_fs

        state = self._state_dir(epoch_id)
        merged.write.mode("overwrite").parquet(state)
        fs, marker = hadoop_fs(
            self.spark, f"{self.path}/_epochs/{epoch_id}"
        )
        fs.mkdirs(marker.getParent())
        fs.create(marker, True).close()
        # prune superseded state dirs (the fold consumed them; the
        # marker is already down, so a crash mid-prune only leaves
        # garbage dirs that restore never reads)
        sfs, sroot = hadoop_fs(self.spark, f"{self.path}/state")
        for st in sfs.listStatus(sroot):
            name = st.getPath().getName()
            if name.startswith("epoch=") and int(name[6:]) != epoch_id:
                sfs.delete(st.getPath(), True)
        self.df = self.spark.read.parquet(state)

    def merge(
        self, batch_sketches: DataFrame, epoch_id: int | None = None
    ) -> None:
        if epoch_id is not None and epoch_id in self._epochs:
            return  # replayed micro-batch: already folded in
        if self.path is not None and epoch_id is None:
            raise ValueError(
                "a durable store needs the micro-batch epoch_id per"
                " merge — replay protection keys on it"
            )
        merged = (
            batch_sketches
            if self.df is None
            else self._fold(self.df.unionByName(batch_sketches))
        )
        if self.path is not None:
            self._commit(merged, epoch_id)
        else:
            # pin in executor memory: the batch frame dies with its
            # micro-batch, and the fold must not re-run per downstream
            # action (eager localCheckpoint materializes it here)
            self.df = merged.localCheckpoint()
        if epoch_id is not None:
            self._epochs.add(epoch_id)


def _start_store_stream(
    stream: DataFrame,
    merge_fn,
    target: "_SummaryStore",
    checkpoint_location: str | None,
):
    """Start a foreachBatch query feeding a summary store, enforcing
    the durable stores' epoch contract (review r8): foreachBatch epoch
    ids are only monotonic across process restarts when the query runs
    with a STABLE checkpointLocation — a fresh un-checkpointed query
    numbers its batches from 0 again, colliding with epochs a durable
    store already marked folded, so every new batch would be silently
    skipped (and pre-crash source data re-read past the guard).  A
    durable target therefore REQUIRES checkpoint_location; in-memory
    stores (whose epoch set dies with the process anyway) may omit
    it."""
    if target.path is not None and checkpoint_location is None:
        raise ValueError(
            "this store persists its folded-epoch set (path="
            f"{target.path!r}), so the stream must run with a stable"
            " checkpoint_location — without one, a restarted query's"
            " epoch ids restart at 0 and collide with already-marked"
            " epochs (new data silently skipped)"
        )
    w = stream.writeStream.outputMode("append").foreachBatch(merge_fn)
    if checkpoint_location is not None:
        w = w.option("checkpointLocation", checkpoint_location)
    return w.trigger(availableNow=True).start()


class RunningSketchStore(_SummaryStore):
    """Merge target for the streaming HLL distinct-count store
    (operators/sketches.py).  HLL union is SET-semantics idempotent, so
    the epoch guard is an optimization here, not a correctness need —
    but durable ``path`` still matters: restarting against a fresh
    in-memory store forgets all pre-crash days entirely."""

    def _fold(self, both: DataFrame) -> DataFrame:
        return both.groupBy("day").agg(
            F.hll_union_agg("sketch").alias("sketch")
        )


def incremental_distinct_users(
    stream: DataFrame,
    target: RunningSketchStore,
    lg_k: int = 12,
    checkpoint_location: str | None = None,
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
        target.merge(sk, epoch_id)

    return _start_store_stream(stream, _merge, target, checkpoint_location)


class RunningTopkStore(_SummaryStore):
    """Merge target for the streaming frequent-items store
    (operators/sketches.py top-k family).  Unlike HLL union, SpaceSaving
    merge is NOT replay-idempotent (counts sum, so a re-merged batch
    double-counts) — merges key on ``epoch_id``, and a durable ``path``
    persists both the summary rows and the folded-epoch set so restart
    recovery neither double-counts a replayed epoch nor forgets a
    folded one."""

    def __init__(
        self,
        spark,
        group_cols: list[str],
        k: int = 64,
        path: str | None = None,
    ):
        self.group_cols = group_cols
        self.k = k
        super().__init__(spark, path)

    def _fold(self, both: DataFrame) -> DataFrame:
        from covid19i2b2_spark.operators.sketches import merge_topk_sketches

        return merge_topk_sketches(both, self.group_cols, self.k)


def incremental_topk_tokens(
    stream: DataFrame,
    target: RunningTopkStore,
    group_col: str = "source",
    text_col: str = "text",
    checkpoint_location: str | None = None,
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

    return _start_store_stream(stream, _merge, target, checkpoint_location)


class RunningQuantileStore(_SummaryStore):
    """Merge target for the streaming quantile store
    (operators/sketches.py DDSketch-style histograms).  Like the top-k
    store — and unlike HLL union — the merge SUMS bucket counts, so
    replays double-count without the epoch guard; ``path`` persists the
    guard + summary atomically (see :class:`_SummaryStore`)."""

    def __init__(
        self, spark, group_cols: list[str], path: str | None = None
    ):
        self.group_cols = group_cols
        super().__init__(spark, path)

    def _fold(self, both: DataFrame) -> DataFrame:
        from covid19i2b2_spark.operators.sketches import (
            merge_quantile_sketches,
        )

        return merge_quantile_sketches(both, self.group_cols)


def incremental_value_quantiles(
    stream: DataFrame,
    target: RunningQuantileStore,
    checkpoint_location: str | None = None,
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

    return _start_store_stream(stream, _merge, target, checkpoint_location)


class RunningCmStore(_SummaryStore):
    """Merge target for the streaming Count-Min store
    (operators/sketches.py X47 family).  Cell-wise count addition is
    NOT replay-idempotent (a re-merged batch double-counts every cell),
    so merges key on ``epoch_id``; ``path`` persists the cell rows and
    the folded-epoch set in one marker-after-data commit (see
    :class:`_SummaryStore`)."""

    def __init__(
        self,
        spark,
        group_cols: list[str],
        depth: int = 4,
        width: int = 1024,
        seed: int = 42,
        path: str | None = None,
    ):
        self.group_cols = group_cols
        self.depth = depth
        self.width = width
        self.seed = seed
        super().__init__(spark, path)

    def _fold(self, both: DataFrame) -> DataFrame:
        from covid19i2b2_spark.operators.sketches import merge_cm_sketches

        return merge_cm_sketches(both, self.group_cols)


def incremental_cm_tokens(
    stream: DataFrame,
    target: RunningCmStore,
    group_col: str = "source",
    text_col: str = "text",
    checkpoint_location: str | None = None,
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

    return _start_store_stream(stream, _merge, target, checkpoint_location)


class DecayedTopkStore(RunningTopkStore):
    """X58: EWMA ("trending") frequent items — the top-k store with an
    exponential decay applied to the ACCUMULATED summary before each
    new epoch folds in, so an item's effective count is
    sum_t alpha^(epochs_since_t) * count_t: yesterday's boilerplate
    token stops outranking today's breakout.  ``decay=1.0`` degenerates
    to RunningTopkStore exactly (pinned by test).

    Bound discipline: scaling by alpha redefines the true quantity as
    the decayed count, and the SpaceSaving sandwich survives the
    scaling only with ONE-SIDED rounding — count_lo/n_rows floor (a
    lower bound may only shrink), count_hi/bound ceil (an upper bound
    may only grow relative to alpha*true).  floor on the hi side would
    VIOLATE the bound whenever hi was exact (floor(0.5*3)=1 < 1.5) —
    the reason this is a store subclass and not a caller-side
    multiply.

    Decay applies exactly once per FOLDED epoch: replayed
    (already-marked) epochs skip the decay together with the merge —
    otherwise an at-least-once source would decay the store once per
    delivery attempt.  Durable/restart semantics are inherited
    unchanged (the decayed fold is committed under the same
    marker-after-state protocol, so a restart resumes from the decayed
    summary)."""

    def __init__(
        self,
        spark,
        group_cols: list[str],
        k: int = 64,
        decay: float = 0.9,
        path: str | None = None,
    ):
        if not 0.0 < decay <= 1.0:
            raise ValueError(f"decay must be in (0, 1], got {decay}")
        self.decay = decay
        super().__init__(spark, group_cols, k=k, path=path)

    def _decayed(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        a = self.decay
        # field order matches _truncate_items' structs (count_hi,
        # count_lo, item) — array<struct> unions match by position —
        # and the array RE-SORTS: ceil/floor can flip a strict
        # (hi, lo) order into a tie with the wrong lo order, and
        # topk_estimates ranks by array position
        return df.withColumn(
            "items",
            F.sort_array(
                F.transform(
                    "items",
                    lambda it: F.struct(
                        F.ceil(it["count_hi"] * a)
                        .cast("long")
                        .alias("count_hi"),
                        F.floor(it["count_lo"] * a)
                        .cast("long")
                        .alias("count_lo"),
                        it["item"].alias("item"),
                    ),
                ),
                asc=False,
            ),
        ).withColumn(
            "bound", F.ceil(F.col("bound") * a).cast("long")
        ).withColumn(
            "n_rows", F.floor(F.col("n_rows") * a).cast("long")
        )

    def merge(
        self, batch_sketches: DataFrame, epoch_id: int | None = None
    ) -> None:
        replayed = epoch_id is not None and epoch_id in self._epochs
        if not replayed and self.df is not None and self.decay < 1.0:
            self.df = self._decayed(self.df)
        super().merge(batch_sketches, epoch_id)
