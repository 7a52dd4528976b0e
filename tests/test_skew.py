"""Salted aggregation equivalence (SURVEY §4.2 skew handling)."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.skew import (
    salted_agg,
    salted_count,
    skew_resistant_count_distinct,
)
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def test_salted_count_equals_plain(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    plain = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        r.l_returnflag: r.n
        for r in salted_count(li, ["l_returnflag"], n_salts=8).collect()
    }
    assert plain == salted


def test_salted_sum_min_max_equals_plain(spark):
    li = read_table(spark, SF_DIR, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"),
        F.min("l_partkey").alias("mn"),
        F.max("l_partkey").alias("mx"),
    )
    salted = salted_agg(
        li,
        ["l_returnflag"],
        [
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__s"),
            F.min("l_partkey").alias("__mn"),
            F.max("l_partkey").alias("__mx"),
        ],
        [
            F.sum("__s").alias("s"),
            F.min("__mn").alias("mn"),
            F.max("__mx").alias("mx"),
        ],
        n_salts=8,
    )
    a = {r.l_returnflag: (float(r.s), r.mn, r.mx) for r in plain.collect()}
    b = {r.l_returnflag: (float(r.s), r.mn, r.mx) for r in salted.collect()}
    assert a == b


def test_skew_resistant_count_distinct(spark):
    orders = read_table(spark, SF_DIR, "orders")
    plain = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    spread = {
        r.o_orderpriority: r.n_distinct
        for r in skew_resistant_count_distinct(
            orders, ["o_orderpriority"], "o_custkey"
        ).collect()
    }
    assert plain == spread
