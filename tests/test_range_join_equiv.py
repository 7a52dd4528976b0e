"""Property: the binned range join (the two-large-sides scale path) is
semantically identical to the broadcast range join (SURVEY §4.2 J6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.joins import range_join, range_join_binned
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def test_binned_equals_broadcast_range_join(spark):
    orders = read_table(spark, SF_DIR, "orders")
    stays = orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("admit"),
        F.date_add(
            F.to_date("o_orderdate"), (F.col("o_orderkey") % 45).cast("int")
        ).alias("discharge"),  # up to 45d: spans month-bin boundaries
    )
    points = (
        stays.select(F.col("admit").alias("d")).dropDuplicates()
    )
    via_broadcast = (
        range_join(points, stays, "d", "admit", "discharge")
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    via_binned = (
        range_join_binned(points, stays, "d", "admit", "discharge")
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    a = {r.d: r.n for r in via_broadcast.collect()}
    b = {r.d: r.n for r in via_binned.collect()}
    assert a == b
