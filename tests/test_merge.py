"""merge_upsert / scd2_upsert semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.merge import merge_upsert, scd2_upsert


def test_merge_upsert_replaces_and_appends(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    out = {r.k: r.v for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "d"}
    # idempotent: merging the same updates again changes nothing
    again = merge_upsert(merge_upsert(target, updates, ["k"]), updates, ["k"])
    assert {r.k: r.v for r in again.collect()} == out


def test_scd2_upsert_closes_and_versions(spark):
    d = dt.date
    target = spark.createDataFrame(
        [(1, "a", d(2024, 1, 1), None), (2, "b", d(2024, 1, 1), None)],
        "k long, v string, effective_date date, end_date date",
    )
    updates = spark.createDataFrame(
        [(1, "A", d(2024, 2, 1))], "k long, v string, effective_date date"
    )
    out = scd2_upsert(target, updates, ["k"]).collect()
    rows = {(r.k, r.v): (r.effective_date, r.end_date) for r in out}
    assert rows[(1, "a")] == (d(2024, 1, 1), d(2024, 2, 1))  # closed
    assert rows[(1, "A")] == (d(2024, 2, 1), None)  # new open version
    assert rows[(2, "b")] == (d(2024, 1, 1), None)  # untouched stays open
    # exactly one open row per key
    open_per_key = {}
    for r in out:
        if r.end_date is None:
            open_per_key[r.k] = open_per_key.get(r.k, 0) + 1
    assert all(v == 1 for v in open_per_key.values())


def test_delta_probe_and_sql_path(spark):
    """Capability gate: in a jar-less env the probe is False and
    merge_into raises the clear fallback error (never a raw JVM
    ClassNotFoundException mid-query)."""
    from covid19i2b2_spark.operators.merge import (
        delta_available,
        iceberg_available,
        merge_into,
    )

    if delta_available(spark) or iceberg_available(spark):
        pytest.skip("lakehouse runtime present — covered by test_merge_into_delta")
    upd = spark.createDataFrame([(1, "a")], "k long, v string")
    with pytest.raises(RuntimeError, match="merge_upsert"):
        merge_into(spark, "delta.`/tmp/nope`", upd, ["k"])


def test_merge_into_delta(spark, tmp_path):
    """Real MERGE INTO — runs only when Delta jars are on the classpath.

    PERMANENTLY skipped in this harness (verified round 4: no delta or
    iceberg jars anywhere on the box, no packages, no network to vendor
    them); the path lights up unchanged on a real cluster.  The
    no-lakehouse incremental story is covered instead by
    pipelines/curation.corpus_scd2_update (versioned corpus refresh
    composed from merge_upsert/scd2_upsert primitives)."""
    from covid19i2b2_spark.operators.merge import delta_available, merge_into

    if not delta_available(spark):
        pytest.skip("no Delta Lake jars in this environment (permanent here)")
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "old"), (2, "keep")], "k long, v string"
    ).write.format("delta").save(path)
    merge_into(
        spark,
        f"delta.`{path}`",
        spark.createDataFrame([(1, "new"), (3, "ins")], "k long, v string"),
        ["k"],
    )
    got = {(r.k, r.v) for r in spark.read.format("delta").load(path).collect()}
    assert got == {(1, "new"), (2, "keep"), (3, "ins")}
