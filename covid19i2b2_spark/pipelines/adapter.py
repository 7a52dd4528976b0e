"""i2b2-analog adapter over the driver testdata (FIXTURES.md §B).

Maps the provided tables onto the i2b2 star schema so the REAL covid
pipeline runs (and is oracle-checked) on driver data:

- observation_fact <- events: user_id -> patient_num, ts -> start_date,
  event_type -> namespaced concept_cd, value -> nval_num (labs only):
    signup   -> COVID:POS       (positive test; cohort seed)
    purchase -> LOINC:1742-6    (lab value)
    error    -> ICD10CM:J80     (severe diagnosis indicator)
    click    -> ICD10CM:U07.1   (non-severe diagnosis)
    view     -> RXNORM:HCQ1     (medication, class HCQ)
- visit_dimension <- 'view' events (event_id -> encounter_num, inpatient
  stay of event_id % 10 days).  orders can't serve as visits: their dates
  (1995-2001) never overlap the events timeline (2024-01), so the
  admission-window join would be empty.
- patient_dimension <- customer (c_custkey -> patient_num; deterministic
  sex/race/age/death derivations so Demographics/DailyCounts have axes).

All derivations are pure column expressions, mirrored 1:1 by the
ADAPTER_SQL CTE prefix used in the DuckDB oracles (queries/covid.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.sources.tables import read_table

CONCEPT_MAP = {
    "signup": "COVID:POS",
    "purchase": "LOINC:1742-6",
    "error": "ICD10CM:J80",
    "click": "ICD10CM:U07.1",
    "view": "RXNORM:HCQ1",
}


def observation_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    concept = F.lit(None).cast("string")
    for etype, code in CONCEPT_MAP.items():
        concept = F.when(F.col("event_type") == etype, F.lit(code)).otherwise(concept)
    return events.select(
        F.col("user_id").alias("patient_num"),
        F.col("event_id").alias("encounter_num"),
        concept.alias("concept_cd"),
        F.to_date("ts").alias("start_date"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("nval_num"),
    )


def visit_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("encounter_num"),
        F.col("user_id").alias("patient_num"),
        F.to_date("ts").alias("start_date"),
        F.date_add(F.to_date("ts"), (F.col("event_id") % 10).cast("int")).alias(
            "end_date"
        ),
        F.lit("I").alias("inout_cd"),
    )


def patient_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    key = F.col("c_custkey")
    return cust.select(
        key.alias("patient_num"),
        F.when(key % 3 == 0, "M").when(key % 3 == 1, "F").otherwise("U").alias(
            "sex_cd"
        ),
        F.when(F.col("c_nationkey") % 4 == 0, "white")
        .when(F.col("c_nationkey") % 4 == 1, "black")
        .when(F.col("c_nationkey") % 4 == 2, "asian")
        .otherwise("other")
        .alias("race_cd"),
        (key % 96).cast("int").alias("age_in_years_num"),
        F.when(
            key % 13 == 0,
            F.date_add(F.lit("2024-01-15").cast("date"), (key % 30).cast("int")),
        ).alias("death_date"),
    )


# The same derivations as DuckDB CTEs — prepended to every covid oracle.
ADAPTER_SQL = """
WITH obs AS (
    SELECT user_id AS patient_num,
           event_id AS encounter_num,
           CASE event_type WHEN 'signup'   THEN 'COVID:POS'
                           WHEN 'purchase' THEN 'LOINC:1742-6'
                           WHEN 'error'    THEN 'ICD10CM:J80'
                           WHEN 'click'    THEN 'ICD10CM:U07.1'
                           WHEN 'view'     THEN 'RXNORM:HCQ1' END AS concept_cd,
           CAST(ts AS DATE) AS start_date,
           CASE WHEN event_type = 'purchase' THEN value END AS nval_num
    FROM events
),
visits AS (
    SELECT event_id AS encounter_num,
           user_id AS patient_num,
           CAST(ts AS DATE) AS start_date,
           CAST(ts AS DATE) + CAST(event_id % 10 AS INTEGER) AS end_date,
           'I' AS inout_cd
    FROM events WHERE event_type = 'view'
),
patients AS (
    SELECT c_custkey AS patient_num,
           CASE c_custkey % 3 WHEN 0 THEN 'M' WHEN 1 THEN 'F' ELSE 'U' END AS sex_cd,
           CASE c_nationkey % 4 WHEN 0 THEN 'white' WHEN 1 THEN 'black'
                                WHEN 2 THEN 'asian' ELSE 'other' END AS race_cd,
           CAST(c_custkey % 96 AS INTEGER) AS age_in_years_num,
           CASE WHEN c_custkey % 13 = 0
                THEN DATE '2024-01-15' + CAST(c_custkey % 30 AS INTEGER)
           END AS death_date
    FROM customer
),
covid_pos AS (
    SELECT patient_num, MIN(start_date) AS covid_pos_date
    FROM obs WHERE concept_cd = 'COVID:POS'
    GROUP BY patient_num
),
adm AS (
    SELECT v.patient_num,
           MIN(v.start_date) AS admission_date,
           MAX(v.end_date) AS discharge_date
    FROM visits v JOIN covid_pos p ON v.patient_num = p.patient_num
    WHERE v.inout_cd = 'I'
      AND v.start_date BETWEEN p.covid_pos_date - 7 AND p.covid_pos_date + 14
    GROUP BY v.patient_num
),
severe_pts AS (
    SELECT o.patient_num, MIN(o.start_date) AS severe_date
    FROM obs o JOIN adm a ON o.patient_num = a.patient_num
    WHERE o.concept_cd IN ('ICD10CM:J80', 'ICD10CM:J96.0', 'PROC:VENT')
      AND o.start_date >= a.admission_date
    GROUP BY o.patient_num
),
cohort AS (
    SELECT a.patient_num, a.admission_date, a.discharge_date,
           CASE WHEN s.severe_date IS NOT NULL THEN 1 ELSE 0 END AS severe,
           s.severe_date, p.death_date, p.sex_cd, p.race_cd, p.age_in_years_num
    FROM adm a
    JOIN patients p ON a.patient_num = p.patient_num
    LEFT JOIN severe_pts s ON a.patient_num = s.patient_num
)
"""
