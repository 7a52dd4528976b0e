"""Golden-output pinning (SURVEY §5.2 item 2): the fixture pipeline with
pinned seeds must reproduce the committed CSVs byte-for-byte (values via
pandas round-trip).  Any semantic drift in cohort logic, artifact shapes,
or obfuscation shows up as a diff here."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.obfuscation import ObfuscationConfig
from covid19i2b2_spark.pipelines.covid import CovidConfig, CovidPipeline
from covid19i2b2_spark.pipelines.fixture import make_fixture

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def artifacts(spark):
    fx = make_fixture(spark, n_patients=200)
    cfg = CovidConfig(
        obfuscation=ObfuscationConfig(blur=2, small_count_mask=10, seed=7)
    )
    pipe = CovidPipeline(
        cfg,
        fx["observation_fact"].withColumn("start_date", F.to_date("start_date")),
        fx["patient_dimension"].withColumn("death_date", F.to_date("death_date")),
        fx["visit_dimension"]
        .withColumn("start_date", F.to_date("start_date"))
        .withColumn("end_date", F.to_date("end_date")),
    )
    return {
        name: df.orderBy(*pipe.KEY_COLS[name]).toPandas()
        for name, df in pipe.all_artifacts().items()
    }


@pytest.mark.parametrize(
    "name",
    ["DailyCounts", "ClinicalCourse", "Demographics", "Labs", "Diagnoses",
     "Medications"],
)
def test_artifact_matches_golden(artifacts, name):
    got = artifacts[name]
    golden = pd.read_csv(os.path.join(GOLDEN_DIR, f"{name}.csv"))
    assert list(got.columns) == list(golden.columns), name
    assert len(got) == len(golden), name
    # stringify both through the same CSV round-trip for comparison
    got_rt = pd.read_csv(
        __import__("io").StringIO(got.to_csv(index=False))
    )
    pd.testing.assert_frame_equal(got_rt, golden, check_dtype=False)
