"""covid19i2b2_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GriffinWeber/covid19i2b2 (the 4CE Phase 1.1
i2b2 COVID-19 extraction pipeline), rebuilt Spark-first.

The reference is a set of T-SQL / Oracle scripts that read the i2b2 star
schema and emit six aggregate files (DailyCounts, ClinicalCourse,
Demographics, Labs, Diagnoses, Medications).  See SURVEY.md for the full
operator inventory; provenance caveat: /root/reference was empty at survey
time, so citations are reconstructed from public knowledge of the repo
(cited as ``4CE_Phase1.1_Files_mssql.sql:§<section>``).

Layout
------
- ``session``    SparkSession factory with scale-tuned defaults
- ``schemas``    explicit StructTypes (never inferred) for all inputs
- ``sources``    schema-enforced readers + CSV/parquet sinks
- ``operators``  composable DataFrame operators (joins, aggs, windows,
                 set-ops, obfuscation, dedup, similarity, text)
- ``functions``  scalar helpers (dates, strings, ICD codes, hashing)
- ``pipelines``  the covid cohort pipeline + six artifact builders
- ``plans``      plan-shape inspection/assertion helpers
- ``streaming``  incremental (Structured Streaming) variants
- ``queries``    the t2 registry: name -> (spark fn, DuckDB oracle SQL)
"""

__version__ = "0.1.0"

from covid19i2b2_spark.session import get_spark  # noqa: F401
