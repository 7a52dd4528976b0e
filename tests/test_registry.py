"""Registry-wide contracts the driver harness depends on.

- Every t2 output schema is atomic-typed: the driver canonicalizes even
  rows-only (oracle=None) outputs via a pandas lexsort, which crashes on
  array/map/struct cells (round-1 q_winnow_fingerprints failure:
  TypeError: unhashable numpy.ndarray).
- The registry stays within the driver's 50-query CORRECTNESS window —
  queries registered past slot 50 silently get NO verdict (round-1
  VERDICT #1: 21 of 71 queries were invisible).
"""

from __future__ import annotations

import pyspark.sql.types as T

from covid19i2b2_spark.registry import REGISTRY, all_queries
from tests.conftest import SF_DIR

DRIVER_WINDOW = 50

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_registry_fits_driver_window():
    assert len(all_queries()) <= DRIVER_WINDOW, (
        f"{len(REGISTRY)} queries registered; the driver grades only the "
        f"first {DRIVER_WINDOW} — consolidate (VERDICT r1 #1)"
    )


def test_all_outputs_atomic_typed(spark):
    all_queries()
    offenders = {}
    for name, spec in REGISTRY.items():
        schema = spec.fn(spark, SF_DIR).schema
        bad = [f.name for f in schema.fields if isinstance(f.dataType, _COMPLEX)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-atomic t2 output columns: {offenders}"
