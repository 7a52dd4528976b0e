"""Mergeable HLL distinct-count store (operators/sketches.py): error
bounds vs exact, merge-vs-rebuild equivalence, parquet round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.sketches import (
    build_distinct_sketches,
    merge_sketch_stores,
    rollup_distinct_sketches,
)
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def _events(spark):
    return read_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )


def test_sketch_rollup_tracks_exact_distinct(spark, tmp_path):
    """Daily sketches -> parquet -> read back -> global rollup must sit
    within the HLL error band of the exact distinct count, without
    touching the raw table again."""
    ev = _events(spark)
    daily = build_distinct_sketches(ev, ["day"], "user_id")
    path = str(tmp_path / "sketches")
    daily.write.mode("overwrite").parquet(path)  # binary column round-trip
    store = spark.read.parquet(path)

    total = rollup_distinct_sketches(store, []).collect()[0]
    exact = ev.agg(F.count_distinct("user_id").alias("n")).collect()[0]["n"]
    assert abs(total["approx_distinct"] - exact) <= max(2, 0.05 * exact)
    assert total["n_rows"] == ev.count()

    # per-day estimates track per-day exacts too
    per_day = {
        r["day"]: r["approx_distinct"]
        for r in rollup_distinct_sketches(store, ["day"]).collect()
    }
    exact_day = {
        r["day"]: r["n"]
        for r in ev.groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(per_day) == set(exact_day)
    for d, n in exact_day.items():
        assert abs(per_day[d] - n) <= max(2, 0.05 * n), d


def test_incremental_merge_equals_rebuild(spark):
    """Folding a new batch into the store (merge_sketch_stores) must
    estimate the same as rebuilding from all raw data — the property
    that makes the store incremental: overlap between batches collapses
    through the sketch union, never double-counted."""
    ev = _events(spark).cache()
    first = ev.filter(F.dayofmonth("day") <= 15)
    second = ev.filter(F.dayofmonth("day") > 10)  # overlaps days 11-15
    merged_store = merge_sketch_stores(
        build_distinct_sketches(first, ["day"], "user_id"),
        build_distinct_sketches(second, ["day"], "user_id"),
        ["day"],
    )
    rebuilt = build_distinct_sketches(
        first.unionByName(second), ["day"], "user_id"
    )
    a = {
        r["day"]: (r["approx_distinct"], r["n_rows"])
        for r in rollup_distinct_sketches(merged_store, ["day"]).collect()
    }
    b = {
        r["day"]: (r["approx_distinct"], r["n_rows"])
        for r in rollup_distinct_sketches(rebuilt, ["day"]).collect()
    }
    assert a == b  # identical sketches -> identical estimates and counts
    ev.unpersist()
