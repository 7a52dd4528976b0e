"""t2 queries: the covid pipeline's six artifacts + cohort, run through
the REAL CovidPipeline over the i2b2 adapter (pipelines/adapter.py), each
with a full DuckDB oracle reproducing the reference semantics in SQL
(SURVEY.md §3; 4CE_Phase1.1_Files_mssql.sql reconstructed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.pipelines import adapter
from covid19i2b2_spark.pipelines.covid import CovidConfig, CovidPipeline
from covid19i2b2_spark.registry import query

_SQL = adapter.ADAPTER_SQL


_PIPELINES: dict[tuple[int, str], CovidPipeline] = {}


def _pipeline(spark: SparkSession, sf_dir: str) -> CovidPipeline:
    """Memoized per (session, sf_dir): the seven covid queries then share
    one cached cohort instead of each recomputing it — mirrors the
    reference materializing #covid_cohort once for all artifacts."""
    key = (id(spark), sf_dir)
    if key not in _PIPELINES:
        _PIPELINES[key] = CovidPipeline(
            CovidConfig(),
            adapter.observation_fact(spark, sf_dir),
            adapter.patient_dimension(spark, sf_dir),
            adapter.visit_dimension(spark, sf_dir),
        )
    return _PIPELINES[key]


@query(
    "q_covid_cohort",
    oracle=_SQL
    + """
    SELECT patient_num, admission_date, discharge_date, severe, severe_date,
           death_date, sex_cd, race_cd, age_in_years_num
    FROM cohort
    ORDER BY patient_num
    """,
)
def q_covid_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline 1 (~L330-520 reconstructed): positive test -> admission
    window -> earliest admission -> severity -> death.  The table every
    artifact joins against."""
    return _pipeline(spark, sf_dir).cohort().orderBy("patient_num")


@query(
    "q_covid_daily_counts",
    oracle=_SQL
    + """
    , bounds AS (
        SELECT MIN(admission_date) AS lo,
               GREATEST(COALESCE(MAX(discharge_date), DATE '1900-01-01'),
                        COALESCE(MAX(death_date), DATE '1900-01-01'),
                        COALESCE(MAX(severe_date), DATE '1900-01-01')) AS hi
        FROM cohort
    ),
    calendar AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                   AS calendar_date
        FROM bounds
    ),
    new_admits AS (SELECT admission_date AS d, COUNT(*) AS n FROM cohort GROUP BY 1),
    new_severe AS (SELECT severe_date AS d, COUNT(*) AS n FROM cohort
                   WHERE severe_date IS NOT NULL GROUP BY 1),
    new_dead AS (SELECT death_date AS d, COUNT(*) AS n FROM cohort
                 WHERE death_date IS NOT NULL GROUP BY 1),
    daily AS (
        SELECT c.calendar_date,
               COALESCE(a.n, 0) AS new_admits,
               COALESCE(s.n, 0) AS new_severe,
               COALESCE(dd.n, 0) AS new_dead
        FROM calendar c
        LEFT JOIN new_admits a ON a.d = c.calendar_date
        LEFT JOIN new_severe s ON s.d = c.calendar_date
        LEFT JOIN new_dead dd ON dd.d = c.calendar_date
    ),
    census AS (
        SELECT c.calendar_date,
               COUNT(*) AS n_hosp,
               CAST(SUM(CASE WHEN ch.severe = 1
                              AND ch.severe_date <= c.calendar_date
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hosp_sev
        FROM calendar c JOIN cohort ch
          ON ch.admission_date <= c.calendar_date
         AND ch.discharge_date >= c.calendar_date
        GROUP BY 1
    )
    SELECT 'SITE01' AS siteid,
           d.calendar_date,
           CAST(SUM(new_admits) OVER w AS BIGINT) AS cumulative_patients_all,
           CAST(SUM(new_severe) OVER w AS BIGINT) AS cumulative_patients_severe,
           CAST(SUM(new_dead) OVER w AS BIGINT) AS cumulative_patients_dead,
           COALESCE(ce.n_hosp, 0) AS num_patients_in_hospital_on_this_date,
           COALESCE(ce.n_hosp_sev, 0)
               AS num_patients_in_hospital_and_severe_on_this_date
    FROM daily d LEFT JOIN census ce ON ce.calendar_date = d.calendar_date
    WINDOW w AS (ORDER BY d.calendar_date
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY d.calendar_date
    """,
)
def q_covid_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#DailyCounts (~L520-600 reconstructed): cumulative all/severe/dead
    via W1 window over per-day pre-aggregates; in-hospital census via the
    broadcast calendar range join (J6)."""
    return _pipeline(spark, sf_dir).daily_counts()


@query(
    "q_covid_clinical_course",
    oracle=_SQL
    + """
    , chrt AS (
        SELECT *, date_diff('day', admission_date, discharge_date) AS los
        FROM cohort
    ),
    days AS (
        SELECT unnest(generate_series(0, (SELECT MAX(los) FROM chrt)))
                   AS days_since_admission
    )
    SELECT 'SITE01' AS siteid,
           d.days_since_admission,
           COUNT(*) AS num_patients_all_still_in_hospital,
           CAST(SUM(CASE WHEN severe = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS num_patients_ever_severe_still_in_hospital
    FROM days d JOIN chrt ON chrt.los >= d.days_since_admission
    GROUP BY d.days_since_admission
    ORDER BY d.days_since_admission
    """,
)
def q_covid_clinical_course(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#ClinicalCourse: patients still hospitalized per day-since-admission
    (all / ever-severe)."""
    df = _pipeline(spark, sf_dir).clinical_course()
    return df.withColumn(
        "days_since_admission", F.col("days_since_admission").cast("long")
    )


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
    "q_covid_demographics",
    oracle=_SQL
    + f"""
    , labeled AS (
        SELECT patient_num, severe, sex_cd AS sex, race_cd AS race,
               {_AGE_SQL} AS age_group
        FROM cohort
    )
    SELECT 'SITE01' AS siteid,
           COALESCE(sex, 'all') AS sex,
           COALESCE(age_group, 'all') AS age_group,
           COALESCE(race, 'all') AS race,
           COUNT(DISTINCT patient_num) AS num_patients_all,
           COUNT(DISTINCT CASE WHEN severe = 1 THEN patient_num END)
               AS num_patients_ever_severe
    FROM labeled
    GROUP BY CUBE (sex, age_group, race)
    ORDER BY sex, age_group, race
    """,
)
def q_covid_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#Demographics (~L650-740 reconstructed): sex × age_group × race
    with 'all' margin rows — one CUBE instead of the reference's stacked
    UNION ALL group-bys (A9)."""
    return _pipeline(spark, sf_dir).demographics()


@query(
    "q_covid_labs",
    oracle=_SQL
    + """
    , labs AS (
        SELECT o.patient_num, o.start_date, o.nval_num, m.loinc, m.scale_factor
        FROM obs o
        JOIN (VALUES ('LOINC:1742-6', '1742-6', 1.0),
                     ('LOINC:1751-7', '1751-7', 1.0),
                     ('LOINC:2160-0', '2160-0', 1.0),
                     ('LOINC:1988-5', '1988-5', 1.0),
                     ('LOINC:6690-2', '6690-2', 1.0))
             AS m(concept_cd, loinc, scale_factor)
          ON o.concept_cd = m.concept_cd
        WHERE o.nval_num IS NOT NULL
    ),
    per_pat_day AS (
        SELECT l.loinc,
               CAST(date_diff('day', c.admission_date, l.start_date) AS BIGINT)
                   AS days_since_admission,
               l.patient_num, c.severe,
               CAST(FLOOR((CAST(SUM(CAST(l.nval_num * l.scale_factor
                                        AS DECIMAL(12,2))) AS DOUBLE)
                          / COUNT(l.nval_num)) * 1000000 + 0.5) / 1000000 AS DECIMAL(18,6)) AS pval
        FROM labs l JOIN cohort c ON l.patient_num = c.patient_num
        GROUP BY 1, 2, 3, 4
    ),
    pp AS (
        SELECT *, CAST(FLOOR((LN(CAST(pval AS DOUBLE) + 0.5)) * 1000000 + 0.5) / 1000000
                       AS DECIMAL(18,6)) AS lval
        FROM per_pat_day
    )
    SELECT 'SITE01' AS siteid, loinc, days_since_admission,
           COUNT(DISTINCT patient_num) AS num_patients_all,
           COALESCE(FLOOR((CAST(SUM(pval) AS DOUBLE) / COUNT(pval)) * 1000000 + 0.5) / 1000000, 0.0)
               AS mean_value_all,
           CASE WHEN COUNT(pval) < 2 THEN 0.0 ELSE
             FLOOR((SQRT(GREATEST(
               (CAST(SUM(pval * pval) AS DOUBLE)
                - CAST(SUM(pval) AS DOUBLE) * CAST(SUM(pval) AS DOUBLE)
                  / COUNT(pval)) / (COUNT(pval) - 1.0), 0.0))) * 1000000 + 0.5) / 1000000 END
               AS stdev_value_all,
           COALESCE(FLOOR((CAST(SUM(lval) AS DOUBLE) / COUNT(lval)) * 1000000 + 0.5) / 1000000, 0.0)
               AS mean_log_value_all,
           CASE WHEN COUNT(lval) < 2 THEN 0.0 ELSE
             FLOOR((SQRT(GREATEST(
               (CAST(SUM(lval * lval) AS DOUBLE)
                - CAST(SUM(lval) AS DOUBLE) * CAST(SUM(lval) AS DOUBLE)
                  / COUNT(lval)) / (COUNT(lval) - 1.0), 0.0))) * 1000000 + 0.5) / 1000000 END
               AS stdev_log_value_all,
           COUNT(DISTINCT CASE WHEN severe = 1 THEN patient_num END)
               AS num_patients_ever_severe,
           COALESCE(FLOOR((CAST(SUM(CASE WHEN severe = 1 THEN pval END) AS DOUBLE)
                          / COUNT(CASE WHEN severe = 1 THEN pval END)) * 1000000 + 0.5) / 1000000, 0.0)
               AS mean_value_ever_severe,
           CASE WHEN COUNT(CASE WHEN severe = 1 THEN pval END) < 2 THEN 0.0 ELSE
             FLOOR((SQRT(GREATEST(
               (CAST(SUM(CASE WHEN severe = 1 THEN pval * pval END) AS DOUBLE)
                - CAST(SUM(CASE WHEN severe = 1 THEN pval END) AS DOUBLE)
                  * CAST(SUM(CASE WHEN severe = 1 THEN pval END) AS DOUBLE)
                  / COUNT(CASE WHEN severe = 1 THEN pval END))
               / (COUNT(CASE WHEN severe = 1 THEN pval END) - 1.0), 0.0))) * 1000000 + 0.5) / 1000000 END
               AS stdev_value_ever_severe,
           COALESCE(FLOOR((CAST(SUM(CASE WHEN severe = 1 THEN lval END) AS DOUBLE)
                          / COUNT(CASE WHEN severe = 1 THEN lval END)) * 1000000 + 0.5) / 1000000, 0.0)
               AS mean_log_value_ever_severe,
           CASE WHEN COUNT(CASE WHEN severe = 1 THEN lval END) < 2 THEN 0.0 ELSE
             FLOOR((SQRT(GREATEST(
               (CAST(SUM(CASE WHEN severe = 1 THEN lval * lval END) AS DOUBLE)
                - CAST(SUM(CASE WHEN severe = 1 THEN lval END) AS DOUBLE)
                  * CAST(SUM(CASE WHEN severe = 1 THEN lval END) AS DOUBLE)
                  / COUNT(CASE WHEN severe = 1 THEN lval END))
               / (COUNT(CASE WHEN severe = 1 THEN lval END) - 1.0), 0.0))) * 1000000 + 0.5) / 1000000 END
               AS stdev_log_value_ever_severe
    FROM pp
    GROUP BY loinc, days_since_admission
    ORDER BY loinc, days_since_admission
    """,
)
def q_covid_labs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#Labs (~L740-800 reconstructed): per (loinc, days_since_admission)
    patient counts + value/log moments, all vs ever-severe; two-level agg
    (per patient-day mean first, A7) with exact-decimal parity."""
    df = _pipeline(spark, sf_dir).labs()
    return df.withColumn(
        "days_since_admission", F.col("days_since_admission").cast("long")
    )


@query(
    "q_covid_diagnoses",
    oracle=_SQL
    + """
    , coded AS (
        SELECT patient_num, start_date,
               left(replace(substring(concept_cd, 9, 999), '.', ''), 3)
                   AS icd_code_3chars,
               10 AS icd_version
        FROM obs WHERE concept_cd LIKE 'ICD10CM:%'
    ),
    windowed AS (
        SELECT cd.icd_code_3chars, cd.icd_version, cd.patient_num, c.severe,
               date_diff('day', c.admission_date, cd.start_date) AS delta
        FROM coded cd JOIN cohort c ON cd.patient_num = c.patient_num
    )
    SELECT 'SITE01' AS siteid, icd_code_3chars, icd_version,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -365 AND -15
                               THEN patient_num END)
               AS num_patients_all_before_admission,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -14 AND 365
                               THEN patient_num END)
               AS num_patients_all_since_admission,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -365 AND -15 AND severe = 1
                               THEN patient_num END)
               AS num_patients_ever_severe_before_admission,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -14 AND 365 AND severe = 1
                               THEN patient_num END)
               AS num_patients_ever_severe_since_admission
    FROM windowed
    WHERE delta BETWEEN -365 AND -15 OR delta BETWEEN -14 AND 365
    GROUP BY icd_code_3chars, icd_version
    ORDER BY icd_code_3chars, icd_version
    """,
)
def q_covid_diagnoses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#Diagnoses (~L800-860 reconstructed): 3-char ICD rollup, distinct
    patients in the before-admission window [-365,-15] vs since-admission
    [-14,365], all vs ever-severe."""
    return _pipeline(spark, sf_dir).diagnoses()


@query(
    "q_covid_medications",
    oracle=_SQL
    + """
    , coded AS (
        SELECT o.patient_num, o.start_date, m.med_class
        FROM obs o
        JOIN (VALUES ('ACEI', 'RXNORM:ACEI1'),
                     ('HCQ', 'RXNORM:HCQ1'),
                     ('SIANES', 'RXNORM:SIANES1'))
             AS m(med_class, concept_cd)
          ON o.concept_cd = m.concept_cd
    ),
    windowed AS (
        SELECT cd.med_class, cd.patient_num, c.severe,
               date_diff('day', c.admission_date, cd.start_date) AS delta
        FROM coded cd JOIN cohort c ON cd.patient_num = c.patient_num
    )
    SELECT 'SITE01' AS siteid, med_class,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -365 AND -15
                               THEN patient_num END)
               AS num_patients_all_before_admission,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -14 AND 365
                               THEN patient_num END)
               AS num_patients_all_since_admission,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -365 AND -15 AND severe = 1
                               THEN patient_num END)
               AS num_patients_ever_severe_before_admission,
           COUNT(DISTINCT CASE WHEN delta BETWEEN -14 AND 365 AND severe = 1
                               THEN patient_num END)
               AS num_patients_ever_severe_since_admission
    FROM windowed
    WHERE delta BETWEEN -365 AND -15 OR delta BETWEEN -14 AND 365
    GROUP BY med_class
    ORDER BY med_class
    """,
)
def q_covid_medications(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#Medications (~L860-920 reconstructed): per med class (broadcast
    literal code map, J2/S2), before vs since admission."""
    return _pipeline(spark, sf_dir).medications()


from covid19i2b2_spark.registry import REGISTRY as _REG  # noqa: E402

_MASK_COLS = [
    "cumulative_patients_all",
    "cumulative_patients_severe",
    "cumulative_patients_dead",
    "num_patients_in_hospital_on_this_date",
    "num_patients_in_hospital_and_severe_on_this_date",
]
_MASK_SQL = ",\n       ".join(
    f"CASE WHEN {c} < 10 THEN -99 ELSE {c} END AS {c}" for c in _MASK_COLS
)


@query(
    "q_covid_daily_counts_obfuscated",
    oracle=f"""
    WITH plain AS ({_REG["q_covid_daily_counts"].oracle})
    SELECT siteid, calendar_date,
       {_MASK_SQL}
    FROM plain
    ORDER BY calendar_date
    """,
)
def q_covid_daily_counts_obfuscated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline 3 (~L920-980 reconstructed) through t2: the small-count
    mask (-99, the published 4CE sentinel) applied to DailyCounts with
    blur=0 so the oracle checks exact values (the seeded-blur path is
    q_obfuscate_blur + hypothesis invariants)."""
    from covid19i2b2_spark.operators.obfuscation import (
        ObfuscationConfig,
        obfuscate_counts,
    )

    pipe = _pipeline(spark, sf_dir)
    return obfuscate_counts(
        pipe.daily_counts(),
        CovidPipeline.COUNT_COLS["DailyCounts"],
        CovidPipeline.KEY_COLS["DailyCounts"],
        ObfuscationConfig(blur=0, small_count_mask=10),
    ).orderBy("calendar_date")
