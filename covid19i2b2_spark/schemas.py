"""Explicit StructType schemas for every input the engine reads.

SURVEY.md §1.2: the reference's schema system is fixed/static — every table
is explicitly DDL'd, nothing inferred.  We mirror that: readers always pass
these schemas, so a drifting upstream file fails loudly instead of silently
changing types.

Two families:
- TESTDATA_*: the driver-provided TPC-H-ish tables (TESTDATA.md), schemas
  verified against the parquet footers.
- I2B2_*: the i2b2 star schema the covid pipeline consumes
  (4CE_Phase1.1_Files_mssql.sql reads observation_fact / patient_dimension /
  visit_dimension; reconstructed — see SURVEY.md §0/§1.1).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# --------------------------------------------------------------------------
# Driver testdata (TESTDATA.md; verified from parquet footers 2026-08-13)
# --------------------------------------------------------------------------

TESTDATA_REGION = _s(("r_regionkey", T.IntegerType()), ("r_name", T.StringType()))

TESTDATA_NATION = _s(
    ("n_nationkey", T.IntegerType()),
    ("n_name", T.StringType()),
    ("n_regionkey", T.IntegerType()),
)

TESTDATA_CUSTOMER = _s(
    ("c_custkey", T.LongType()),
    ("c_name", T.StringType()),
    ("c_nationkey", T.IntegerType()),
    ("c_acctbal", T.DoubleType()),
    ("c_mktsegment", T.StringType()),
)

TESTDATA_SUPPLIER = _s(
    ("s_suppkey", T.LongType()),
    ("s_name", T.StringType()),
    ("s_nationkey", T.IntegerType()),
    ("s_acctbal", T.DoubleType()),
)

TESTDATA_PART = _s(
    ("p_partkey", T.LongType()),
    ("p_name", T.StringType()),
    ("p_brand", T.StringType()),
    ("p_type", T.StringType()),
    ("p_size", T.IntegerType()),
    ("p_retailprice", T.DoubleType()),
)

TESTDATA_ORDERS = _s(
    ("o_orderkey", T.LongType()),
    ("o_custkey", T.LongType()),
    ("o_orderstatus", T.StringType()),
    ("o_totalprice", T.DoubleType()),
    ("o_orderdate", T.TimestampNTZType()),
    ("o_orderpriority", T.StringType()),
)

TESTDATA_LINEITEM = _s(
    ("l_orderkey", T.LongType()),
    ("l_partkey", T.LongType()),
    ("l_suppkey", T.LongType()),
    ("l_linenumber", T.IntegerType()),
    ("l_quantity", T.DoubleType()),
    ("l_extendedprice", T.DoubleType()),
    ("l_discount", T.DoubleType()),
    ("l_tax", T.DoubleType()),
    ("l_returnflag", T.StringType()),
    ("l_linestatus", T.StringType()),
    ("l_shipdate", T.TimestampNTZType()),
)

# Legacy testdata generations stored events.ts as INT64 TIMESTAMP(NANOS),
# which Spark's parquet reader cannot represent natively; with
# spark.sql.legacy.parquet.nanosAsLong it arrives as a long of epoch-nanos
# (RAW schema) and the source layer converts to timestamp_ntz (LOGICAL
# schema).  Current testdata is TIMESTAMP(MICROS) and reads natively; the
# source layer sniffs the footer and picks the right path (tables.py).
TESTDATA_EVENTS_RAW = _s(
    ("event_id", T.LongType()),
    ("ts", T.LongType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
)

TESTDATA_EVENTS = _s(
    ("event_id", T.LongType()),
    ("ts", T.TimestampNTZType()),
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
)

TESTDATA_DOCUMENTS = _s(
    ("doc_id", T.LongType()),
    ("text", T.StringType()),
    ("lang", T.StringType()),
    ("source", T.StringType()),
    ("n_chars", T.LongType()),
)

TESTDATA_EMBEDDINGS = _s(
    ("vec_id", T.LongType()),
    ("embedding", T.ArrayType(T.FloatType())),
    ("label", T.IntegerType()),
)

TESTDATA: dict[str, T.StructType] = {
    "region": TESTDATA_REGION,
    "nation": TESTDATA_NATION,
    "customer": TESTDATA_CUSTOMER,
    "supplier": TESTDATA_SUPPLIER,
    "part": TESTDATA_PART,
    "orders": TESTDATA_ORDERS,
    "lineitem": TESTDATA_LINEITEM,
    "events": TESTDATA_EVENTS,
    "documents": TESTDATA_DOCUMENTS,
    "embeddings": TESTDATA_EMBEDDINGS,
}

TABLE_NAMES = tuple(TESTDATA)


# --------------------------------------------------------------------------
# i2b2 star schema (covid pipeline input; SURVEY.md §1.1 table)
# Types: the reference's decimal(18,5) lab values map to DoubleType for
# DuckDB-parity float semantics (SURVEY.md §1.3 note on decimals).
# --------------------------------------------------------------------------

I2B2_OBSERVATION_FACT = _s(
    ("patient_num", T.LongType()),
    ("encounter_num", T.LongType()),
    ("concept_cd", T.StringType()),
    ("start_date", T.TimestampNTZType()),
    ("nval_num", T.DoubleType()),
    ("tval_char", T.StringType()),
    ("valueflag_cd", T.StringType()),
    ("units_cd", T.StringType()),
)

I2B2_PATIENT_DIMENSION = _s(
    ("patient_num", T.LongType()),
    ("birth_date", T.TimestampNTZType()),
    ("death_date", T.TimestampNTZType()),
    ("vital_status_cd", T.StringType()),
    ("sex_cd", T.StringType()),
    ("race_cd", T.StringType()),
    ("age_in_years_num", T.IntegerType()),
)

I2B2_VISIT_DIMENSION = _s(
    ("encounter_num", T.LongType()),
    ("patient_num", T.LongType()),
    ("start_date", T.TimestampNTZType()),
    ("end_date", T.TimestampNTZType()),
    ("inout_cd", T.StringType()),
)

I2B2 = {
    "observation_fact": I2B2_OBSERVATION_FACT,
    "patient_dimension": I2B2_PATIENT_DIMENSION,
    "visit_dimension": I2B2_VISIT_DIMENSION,
}
