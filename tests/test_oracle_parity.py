"""Run every registered t2 query against the DuckDB oracle at sf0.001 —
a local mirror of the driver's correctness gate, so mismatches surface
before the driver's sf0.01 run."""

from __future__ import annotations

import pytest

from covid19i2b2_spark.registry import REGISTRY, all_queries
from tests.conftest import SF_DIR
from tests.oracle import assert_frames_match

all_queries()  # populate REGISTRY


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only contract: must run and return a stable schema
        assert sdf.schema is not None
        assert len(spark_pdf) >= 0
        return
    oracle_pdf = duck.execute(spec.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)
