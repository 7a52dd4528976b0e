"""t2 queries: 4CE Phase 2 patient-level files (pipelines/phase2.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from covid19i2b2_spark.pipelines import phase2
from covid19i2b2_spark.pipelines.adapter import ADAPTER_SQL
from covid19i2b2_spark.queries.covid import _pipeline
from covid19i2b2_spark.registry import query

_AGE_SQL = """CASE WHEN age_in_years_num IS NULL THEN 'other'
     WHEN age_in_years_num < 3 THEN '00to02'
     WHEN age_in_years_num < 6 THEN '03to05'
     WHEN age_in_years_num < 12 THEN '06to11'
     WHEN age_in_years_num < 18 THEN '12to17'
     WHEN age_in_years_num < 26 THEN '18to25'
     WHEN age_in_years_num < 50 THEN '26to49'
     WHEN age_in_years_num < 70 THEN '50to69'
     WHEN age_in_years_num < 80 THEN '70to79'
     ELSE '80plus' END"""


@query(
    "q_covid_patient_mapping",
    oracle=ADAPTER_SQL
    + """
    SELECT 'SITE01' AS siteid, patient_num,
           CAST(ROW_NUMBER() OVER (
               ORDER BY CAST(('0x' || substr(md5(CAST(patient_num AS VARCHAR)
                                              || '|42'), 1, 8)) AS BIGINT),
                        patient_num) AS BIGINT) AS study_num
    FROM cohort
    ORDER BY study_num
    """,
)
def q_covid_patient_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 2 LocalPatientMapping: seeded-hash pseudonyms (study_num).
    The permutation orders by portable_hash (md5-derived), so the DuckDB
    oracle reproduces it exactly; permutation properties additionally
    asserted in tests/test_phase2.py."""
    return phase2.patient_mapping(_pipeline(spark, sf_dir)).orderBy("study_num")


@query(
    "q_covid_patient_summary",
    oracle=ADAPTER_SQL
    + f"""
    SELECT 'SITE01' AS siteid, patient_num, admission_date,
           discharge_date AS last_discharge_date,
           date_diff('day', admission_date, discharge_date) AS length_of_stay,
           CAST(severe AS BIGINT) AS severe,
           severe_date,
           CASE WHEN death_date IS NOT NULL THEN 1 ELSE 0 END AS deceased,
           death_date,
           sex_cd AS sex,
           {_AGE_SQL} AS age_group,
           race_cd AS race
    FROM cohort
    ORDER BY patient_num
    """,
)
def q_covid_patient_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 2 LocalPatientSummary: one row per cohort patient."""
    return phase2.patient_summary(_pipeline(spark, sf_dir)).orderBy("patient_num")


@query(
    "q_covid_patient_course",
    oracle=ADAPTER_SQL
    + """
    , chrt AS (
        SELECT *, date_diff('day', admission_date, discharge_date) AS los
        FROM cohort
    )
    SELECT 'SITE01' AS siteid,
           patient_num,
           d AS days_since_admission,
           admission_date + CAST(d AS INTEGER) AS calendar_date,
           CAST(1 AS BIGINT) AS in_hospital,
           CASE WHEN severe = 1
                 AND severe_date <= admission_date + CAST(d AS INTEGER)
                THEN 1 ELSE 0 END AS severe,
           CASE WHEN death_date IS NOT NULL
                 AND death_date <= admission_date + CAST(d AS INTEGER)
                THEN 1 ELSE 0 END AS deceased
    FROM chrt, LATERAL unnest(generate_series(0, los)) AS t(d)
    ORDER BY patient_num, days_since_admission
    """,
)
def q_covid_patient_course(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 2 LocalPatientClinicalCourse: patient × day-of-stay grid with
    severity/death status as of each day."""
    return phase2.patient_clinical_course(_pipeline(spark, sf_dir)).orderBy(
        "patient_num", "days_since_admission"
    )


@query(
    "q_covid_patient_obs",
    oracle=ADAPTER_SQL
    + """
    SELECT 'SITE01' AS siteid,
           o.patient_num,
           date_diff('day', c.admission_date, o.start_date) AS days_since_admission,
           split_part(o.concept_cd, ':', 1) AS concept_type,
           split_part(o.concept_cd, ':', 2) AS concept_code,
           o.nval_num AS value
    FROM obs o JOIN cohort c ON o.patient_num = c.patient_num
    ORDER BY o.patient_num, days_since_admission, concept_type, concept_code
    """,
)
def q_covid_patient_obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phase 2 LocalPatientObservations: the long-form patient-level EAV
    extract (stays long — shards by patient_num; SURVEY §1.3)."""
    return phase2.patient_observations(_pipeline(spark, sf_dir)).orderBy(
        "patient_num", "days_since_admission", "concept_type", "concept_code"
    )
