"""X80: incremental fetch-log store — streaming change-rate state
(SURVEY §2.11 extension; round 12).  X71 estimates change rates from
the FULL fetch history; a live crawler appends fetch results
continuously, and re-scanning an ever-growing history per scheduling
cycle is exactly the shape the engine's summary stores exist to kill
(X26/X32/X41/X47).  This store keeps ONE bounded row per url —

    (url, n_fetches, n_changes, first_fetch, last_fetch,
     first_fp, last_fp)

— and folds each micro-batch's per-url summary into it.  The boundary
fingerprints make the fold EXACT: merging summaries A (earlier) and B
(later) needs one extra term, "did the content change across the
boundary", which is A.last_fp vs B.first_fp (null-safe, the X71
rule).  No approximation, no decay: the store's estimates equal a
batch recompute over the concatenated history bit-for-bit (pinned by
test through the SHARED attach_rates expressions — merge ≡ rebuild as
an equality of inputs, not of two formula copies).

Fold shape: union(state, batch summaries) → groupBy(url) →
sort_array of (≤ 2) summary structs by first_fetch → one F.aggregate
fold — bounded per-url work, one url-keyed shuffle per micro-batch
over |state| + |batch| SUMMARY rows (never raw fetches).

Ordering contract: per url, a later batch's fetches must not
INTERLEAVE an earlier batch's time range (appending fetch results as
they happen satisfies this trivially; the sort_array handles whole
batches arriving out of order, but overlapping ranges would count
boundary changes against the wrong neighbor).  This is the same
source-monotonicity assumption the EWMA store documents — a fetch log
is an append-only event stream by construction.

Durability/replay: inherits the _SummaryStore contract — the fold is
NOT replay-idempotent (counts sum), so merges key on epoch_id with
the persisted folded-epoch set and bloom/marker crash semantics of
the base class; a durable path REQUIRES a stable streaming
checkpoint_location (enforced by _start_store_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from covid19i2b2_spark.streaming.incremental import (
    _start_store_stream,
    _SummaryStore,
)

_SUMMARY_COLS = [
    "url",
    "n_fetches",
    "n_changes",
    "first_fetch",
    "last_fetch",
    "first_fp",
    "last_fp",
]


def summarize_fetch_batch(
    df: DataFrame,
    url_col: str = "url",
    time_col: str = "fetch_time",
    fingerprint_col: str = "content_fp",
) -> DataFrame:
    """One store-shaped summary row per url for ONE batch of fetches:
    interior change count via the X71 lag rule, boundary fingerprints
    via min_by/max_by on the same (time, fingerprint) tie order the
    batch path sorts with — the two paths must count ties
    identically or merge ≡ rebuild breaks on fetch storms."""
    u, t, fp = F.col(url_col), F.col(time_col), F.col(fingerprint_col)
    w = Window.partitionBy(url_col).orderBy(t, fp)
    prev_fp = F.lag(fingerprint_col).over(w)
    prev_t = F.lag(time_col).over(w)
    changed = F.when(
        prev_t.isNotNull(), (~fp.eqNullSafe(prev_fp)).cast("long")
    )
    order_key = F.struct(t.alias("t"), fp.alias("f"))
    return (
        df.withColumn("__changed", changed)
        .groupBy(u.alias("url"))
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.coalesce(F.sum("__changed"), F.lit(0)).alias("n_changes"),
            F.min(time_col).alias("first_fetch"),
            F.max(time_col).alias("last_fetch"),
            F.min_by(fingerprint_col, order_key).alias("first_fp"),
            F.max_by(fingerprint_col, order_key).alias("last_fp"),
        )
    )


class RunningFetchLog(_SummaryStore):
    """Merge target for the streaming fetch log (module docstring).
    NOT replay-idempotent (counts sum) — the epoch guard is a
    correctness requirement, same as SpaceSaving/DDSketch/CM."""

    def _fold(self, both: DataFrame) -> DataFrame:
        part = F.struct(
            F.col("first_fetch"),
            F.col("last_fetch"),
            F.col("n_fetches"),
            F.col("n_changes"),
            F.col("first_fp"),
            F.col("last_fp"),
        )
        parts = F.array_sort(F.collect_list(part))

        def _combine(acc, p):
            return F.struct(
                acc["first_fetch"].alias("first_fetch"),
                p["last_fetch"].alias("last_fetch"),
                (acc["n_fetches"] + p["n_fetches"]).alias("n_fetches"),
                (
                    acc["n_changes"]
                    + p["n_changes"]
                    + (~acc["last_fp"].eqNullSafe(p["first_fp"])).cast(
                        "long"
                    )
                ).alias("n_changes"),
                acc["first_fp"].alias("first_fp"),
                p["last_fp"].alias("last_fp"),
            )

        folded = (
            both.groupBy("url")
            .agg(parts.alias("__p"))
            .withColumn(
                "__acc",
                F.aggregate(
                    F.slice(
                        F.col("__p"), 2, F.size("__p") - 1
                    ),
                    F.element_at("__p", 1),
                    _combine,
                ),
            )
        )
        return folded.select(
            "url",
            F.col("__acc.n_fetches").alias("n_fetches"),
            F.col("__acc.n_changes").alias("n_changes"),
            F.col("__acc.first_fetch").alias("first_fetch"),
            F.col("__acc.last_fetch").alias("last_fetch"),
            F.col("__acc.first_fp").alias("first_fp"),
            F.col("__acc.last_fp").alias("last_fp"),
        ).select(*_SUMMARY_COLS)

    def estimates(self, **rate_params) -> DataFrame:
        """The X71 schedule priced from the store's state — the SAME
        attach_rates expressions as the batch path.  Read after
        merging (the base-class pruning rule)."""
        from covid19i2b2_spark.operators.recrawl import (
            _epoch_sec,
            attach_rates,
        )

        if self.df is None:
            raise ValueError("empty store: merge at least one batch first")
        hist = self.df.select(
            "url",
            "n_fetches",
            (F.col("n_fetches") - F.lit(1)).alias("n_intervals"),
            "n_changes",
            "first_fetch",
            "last_fetch",
            (
                _epoch_sec(F.col("last_fetch"))
                - _epoch_sec(F.col("first_fetch"))
            ).alias("span_sec"),
        )
        return attach_rates(hist, **rate_params)


def incremental_fetch_log(
    stream: DataFrame,
    target: RunningFetchLog,
    url_col: str = "url",
    time_col: str = "fetch_time",
    fingerprint_col: str = "content_fp",
    checkpoint_location: str | None = None,
):
    """Maintain the fetch-log store as fetch results stream in: each
    micro-batch summarizes to one row per url inside foreachBatch and
    folds into the running state — the streaming form of X71's
    change_history.  Schedule queries read target.estimates() without
    ever re-reading the stream's history."""

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        target.merge(
            summarize_fetch_batch(
                batch_df, url_col, time_col, fingerprint_col
            ).select(*_SUMMARY_COLS),
            epoch_id,
        )

    return _start_store_stream(stream, _merge, target, checkpoint_location)
