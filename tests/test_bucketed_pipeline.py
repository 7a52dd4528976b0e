"""End-to-end layout proof (SURVEY §4.2): the covid cohort build over
patient_num-bucketed source tables shuffles strictly less than over plain
parquet — the claim that bucketing makes the per-patient pipeline
(mostly) shuffle-free at 100 TB, pinned as a test."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.pipelines import adapter
from covid19i2b2_spark.pipelines.covid import CovidConfig, CovidPipeline
from covid19i2b2_spark.sources.layout import write_bucketed
from tests.conftest import SF_DIR


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_bucketed_cohort_shuffles_less(spark):
    obs = adapter.observation_fact(spark, SF_DIR)
    pats = adapter.patient_dimension(spark, SF_DIR)
    vis = adapter.visit_dimension(spark, SF_DIR)
    write_bucketed(obs, "obs_b", ["patient_num"], n_buckets=8)
    write_bucketed(pats, "pats_b", ["patient_num"], n_buckets=8)
    write_bucketed(vis, "vis_b", ["patient_num"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = CovidPipeline(
            CovidConfig(), obs, pats, vis
        ).cohort()
        bucketed = CovidPipeline(
            CovidConfig(),
            spark.table("obs_b"),
            spark.table("pats_b"),
            spark.table("vis_b"),
        ).cohort()
        # same result …
        a = sorted(map(str, plain.collect()))
        b = sorted(map(str, bucketed.collect()))
        assert a == b
        # … with strictly fewer shuffles
        n_plain, n_bucketed = _n_exchanges(plain), _n_exchanges(bucketed)
        assert n_bucketed < n_plain, (
            f"bucketed cohort should shuffle less: {n_bucketed} vs {n_plain}"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("obs_b", "pats_b", "vis_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_write_bucketed_replays_over_stranded_location(spark):
    """A crashed writer (or a fresh metastore over an old warehouse)
    leaves the managed location on disk with NO catalog entry; replaying
    the write must win, not fail LOCATION_ALREADY_EXISTS (VERDICT r13
    what's-wrong #1).  Strand the directory by hand, then overwrite —
    twice, to prove the path is re-entrant."""
    import os

    from covid19i2b2_spark.sources.layout import _default_table_location

    obs = adapter.observation_fact(spark, SF_DIR).limit(100)
    loc = _default_table_location(spark, "strand_t")
    assert loc is not None
    assert not spark.catalog.tableExists("strand_t")
    os.makedirs(os.path.join(loc, "leftover"), exist_ok=True)
    try:
        for _ in range(2):
            write_bucketed(obs, "strand_t", ["patient_num"], n_buckets=4)
            assert spark.table("strand_t").count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS strand_t")


def test_overwrite_from_self_preserves_read_guard(spark):
    """ADVICE r14 medium: when the catalog entry EXISTS, the overwrite
    must go through saveAsTable's own path so Spark's cannot-overwrite-
    a-table-being-read-from guard still fires BEFORE any data is
    touched — an unconditional pre-clear would delete the source files
    first and lose both old and new data.  Pin: self-referential
    overwrite raises, and the original rows survive intact."""
    import pytest

    obs = adapter.observation_fact(spark, SF_DIR).limit(80)
    try:
        write_bucketed(obs, "selfref_t", ["patient_num"], n_buckets=4)
        derived = spark.table("selfref_t").filter(F.col("patient_num") >= 0)
        with pytest.raises(Exception):
            write_bucketed(derived, "selfref_t", ["patient_num"], n_buckets=4)
        assert spark.table("selfref_t").count() == 80
    finally:
        spark.sql("DROP TABLE IF EXISTS selfref_t")


def test_overwrite_in_other_database_spares_default_table(spark):
    """Review r14: an unqualified overwrite while the CURRENT database
    is not default must clear THAT database's stranded location, never
    default.<name>'s live data."""
    import os

    from covid19i2b2_spark.sources.layout import _default_table_location

    obs = adapter.observation_fact(spark, SF_DIR).limit(50)
    spark.sql("CREATE DATABASE IF NOT EXISTS stagingdb")
    try:
        # live managed table in default
        write_bucketed(obs, "default.shared_t", ["patient_num"], n_buckets=2)
        default_loc = _default_table_location(spark, "default.shared_t")
        spark.catalog.setCurrentDatabase("stagingdb")
        # location resolution follows the current database
        loc = _default_table_location(spark, "shared_t")
        assert loc.endswith(os.path.join("stagingdb.db", "shared_t"))
        # strand the staging location, then overwrite unqualified
        os.makedirs(os.path.join(loc, "leftover"), exist_ok=True)
        write_bucketed(obs, "shared_t", ["patient_num"], n_buckets=2)
        assert spark.table("stagingdb.shared_t").count() == 50
        # default's table and its data survived
        assert spark.table("default.shared_t").count() == 50
        assert os.path.isdir(default_loc)
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP TABLE IF EXISTS stagingdb.shared_t")
        spark.sql("DROP TABLE IF EXISTS default.shared_t")
        spark.sql("DROP DATABASE IF EXISTS stagingdb CASCADE")
