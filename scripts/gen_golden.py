"""Regenerate tests/golden/*.csv after an intentional semantic change
(e.g. the round-2 switch of obfuscation noise from xxhash64 to the
md5-based portable_hash).  Mirrors tests/test_golden.py's fixture
exactly — keep the two in sync."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.obfuscation import ObfuscationConfig
from covid19i2b2_spark.pipelines.covid import CovidConfig, CovidPipeline
from covid19i2b2_spark.pipelines.fixture import make_fixture
from covid19i2b2_spark.session import get_spark

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main() -> None:
    spark = get_spark()
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
    for name, df in pipe.all_artifacts().items():
        out = os.path.join(GOLDEN_DIR, f"{name}.csv")
        df.orderBy(*pipe.KEY_COLS[name]).toPandas().to_csv(out, index=False)
        print("wrote", out)


if __name__ == "__main__":
    main()
