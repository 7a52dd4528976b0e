"""Format-general corpus IO (SURVEY §2.6 source/sink surface, round 7):
the same corpus tables read/written through any columnar or text format
the lake actually has — parquet (house default), ORC (Hive-legacy
lakes), JSON-lines, CSV.

Why this exists: a training-data pipeline rarely chooses its input
format; it inherits one.  The engine's operators are format-agnostic
(they see DataFrames), so the only format-specific concerns live here:

- **Pushdown parity**: parquet and ORC both serve PushedFilters and
  column pruning from file metadata (pinned in tests/test_sources.py —
  the ORC scan of a filtered read must carry the predicate); JSON/CSV
  parse every row and only prune columns at the parser, so putting a
  hot corpus behind them costs the whole scan — the docstrings say so
  instead of hiding it.
- **Schema enforcement**: JSON/CSV REQUIRE an explicit schema here.
  Inference silently scans the data once per read and guesses types
  (a doc_id that happens to fit int32 in one shard and not another
  flips the column type between reads); a corpus read must be
  deterministic, so the weakly-typed formats refuse to run without a
  schema.
- **Avro**: Spark treats it as an external module and this build has
  no spark-avro jar (probed 2026-08-14, 'Failed to find data source:
  avro') — requesting it raises with that explanation rather than a
  raw classpath error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SELF_DESCRIBING = ("parquet", "orc")
_SCHEMA_REQUIRED = ("json", "csv")
SUPPORTED_FORMATS = _SELF_DESCRIBING + _SCHEMA_REQUIRED

# CSV NULL sentinel (the Hive convention): Spark's DEFAULTS write NULL
# as an empty field AND read empty fields as NULL, so a written
# empty-STRING column came back NULL (ADVICE r7).  Writing NULL as \N
# and empty as a quoted "" keeps the two distinct through a round trip.
# Residual caveat, documented not hidden: a string value exactly equal
# to \N is written unquoted and reads back as NULL — CSV has no
# escape-proof NULL representation; use parquet/ORC when that matters.
_CSV_NULL = "\\N"


def _check_fmt(fmt: str) -> None:
    if fmt == "avro":
        raise ValueError(
            "avro is an external Spark module and its jar is not in this"
            " build (probed 2026-08-14); use parquet/orc, or deploy"
            " spark-avro and extend SUPPORTED_FORMATS"
        )
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(
            f"fmt must be one of {SUPPORTED_FORMATS}, got {fmt!r}"
        )


def read_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    legacy_csv_nulls: bool = False,
) -> DataFrame:
    """Read a corpus table in any supported format.

    ``legacy_csv_nulls``: CSV files written BEFORE the ``\\N`` sentinel
    (round 8) encoded NULL as an empty field; reading them with the new
    sentinel turns every legacy NULL string into '' (review r8).  Pass
    True to read such files with Spark's original empty-field-is-NULL
    defaults — which also restores the old lossy collapse of genuine
    empty strings, so rewrite legacy corpora when the distinction
    matters.

    parquet/ORC: self-describing — ``schema`` is optional and, when
    given, applied as an enforced read schema (missing columns fail the
    read instead of silently yielding NULLs at first use).  JSON/CSV:
    ``schema`` is REQUIRED (see module docstring) and the read
    delegates to sources/files.py's enforced-schema readers so the two
    never-infer surfaces can't drift (review r7).  CSV reads with
    header=true and multiLine=true: corpus text routinely contains
    embedded newlines, which the writer quotes across physical lines —
    without multiLine the reader tears each such document into garbage
    rows (review r7)."""
    _check_fmt(fmt)
    if fmt in _SCHEMA_REQUIRED and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema — inference scans"
            " the data and guesses types per-read, which is not"
            " deterministic corpus IO"
        )
    if fmt == "csv":
        from covid19i2b2_spark.sources.files import read_csv

        sentinel = (
            {} if legacy_csv_nulls
            else {"nullValue": _CSV_NULL, "emptyValue": ""}
        )
        return read_csv(
            spark,
            path,
            schema,
            header=True,
            multiLine="true",
            **sentinel,
        )
    if fmt == "json":
        from covid19i2b2_spark.sources.files import read_json

        return read_json(spark, path, schema)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_corpus(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Write a corpus table in any supported format.  CSV writes a
    header (so reads round-trip column names) and the ``\\N`` NULL
    sentinel + quoted-empty emptyValue, matching :func:`read_corpus` so
    NULL and empty-string survive the round trip distinctly (see
    ``_CSV_NULL``); compression defaults to each format's Spark
    default (snappy for parquet/ORC)."""
    _check_fmt(fmt)
    writer = df.write.format(fmt).mode(mode)
    if compression is not None:
        writer = writer.option("compression", compression)
    if fmt == "csv":
        writer = (
            writer.option("header", "true")
            .option("nullValue", _CSV_NULL)
            .option("emptyValue", '""')
        )
    writer.save(path)
