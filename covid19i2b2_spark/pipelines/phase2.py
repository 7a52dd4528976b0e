"""4CE Phase 2 patient-level files (SURVEY.md §0 inventory: the Phase 2
companion scripts — LocalPatientSummary, LocalPatientClinicalCourse,
LocalPatientObservations, LocalPatientMapping; reconstructed, confidence
[C]: these may live in covidclinical org repos rather than the reference
repo itself, but they are the published patient-level extension of the
same pipeline).

Unlike Phase 1.1 (aggregate counts), these are row-per-patient(-day)
extracts; the privacy layer is pseudonymization (study_num) instead of
count obfuscation.  The reference assigns pseudonyms with
ROW_NUMBER() OVER (ORDER BY NEWID()) — nondeterministic; here study_num
orders by portable_hash(patient_num, seed): stable under retry,
unlinkable without the seed, reproducible for tests (W3, SURVEY §2.5),
and md5-based so the DuckDB oracle reproduces the exact permutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from covid19i2b2_spark.operators.obfuscation import portable_hash
from covid19i2b2_spark.pipelines.covid import CovidPipeline


def patient_mapping(pipe: CovidPipeline, seed: int = 42) -> DataFrame:
    """LocalPatientMapping: patient_num -> study_num pseudonym.

    Single-partition window over the cohort (bounded by patient count —
    same invariant as the DailyCounts cumulative; for a >10^8-patient
    cohort switch to zipWithIndex over sorted hash ranges)."""
    w = Window.orderBy(portable_hash(["patient_num"], seed), "patient_num")
    return (
        pipe.cohort()
        .select("patient_num")
        .withColumn("study_num", F.row_number().over(w).cast("long"))
        .select(
            F.lit(pipe.cfg.siteid).alias("siteid"), "patient_num", "study_num"
        )
    )


def patient_summary(pipe: CovidPipeline) -> DataFrame:
    """LocalPatientSummary: one row per cohort patient."""
    from covid19i2b2_spark.functions.buckets import age_group

    c = pipe.cohort()
    return c.select(
        F.lit(pipe.cfg.siteid).alias("siteid"),
        "patient_num",
        "admission_date",
        F.col("discharge_date").alias("last_discharge_date"),
        F.datediff("discharge_date", "admission_date")
        .cast("long")
        .alias("length_of_stay"),
        F.col("severe").cast("long").alias("severe"),
        "severe_date",
        F.col("death_date").isNotNull().cast("long").alias("deceased"),
        "death_date",
        F.col("sex_cd").alias("sex"),
        age_group("age_in_years_num").alias("age_group"),
        F.col("race_cd").alias("race"),
    )


def patient_clinical_course(pipe: CovidPipeline) -> DataFrame:
    """LocalPatientClinicalCourse: one row per patient per day of stay
    (explode over the per-patient day range — fan-out bounded by LOS)."""
    c = pipe.cohort().withColumn(
        "los", F.datediff("discharge_date", "admission_date")
    )
    days = c.select(
        "patient_num",
        "admission_date",
        "severe",
        "severe_date",
        "death_date",
        "los",
        F.explode(F.sequence(F.lit(0), F.col("los"))).alias("days_since_admission"),
    )
    cal = F.date_add("admission_date", F.col("days_since_admission").cast("int"))
    return days.select(
        F.lit(pipe.cfg.siteid).alias("siteid"),
        "patient_num",
        F.col("days_since_admission").cast("long").alias("days_since_admission"),
        cal.alias("calendar_date"),
        F.lit(1).cast("long").alias("in_hospital"),
        (
            (F.col("severe") == 1) & (F.col("severe_date") <= cal)
        ).cast("long").alias("severe"),
        (
            F.col("death_date").isNotNull() & (F.col("death_date") <= cal)
        ).cast("long").alias("deceased"),
    )


def patient_observations(pipe: CovidPipeline) -> DataFrame:
    """LocalPatientObservations: per patient, per day-since-admission, per
    concept — the long-form EAV extract (kept long on purpose: it shards
    by patient_num; consumers pivot at the edge, SURVEY §1.3)."""
    c = pipe.cohort().select("patient_num", "admission_date")
    obs = pipe.obs.join(c, "patient_num")
    return obs.select(
        F.lit(pipe.cfg.siteid).alias("siteid"),
        "patient_num",
        F.datediff("start_date", "admission_date")
        .cast("long")
        .alias("days_since_admission"),
        F.split("concept_cd", ":").getItem(0).alias("concept_type"),
        F.split("concept_cd", ":").getItem(1).alias("concept_code"),
        F.col("nval_num").alias("value"),
    )
