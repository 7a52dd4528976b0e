"""Phase 2 patient-level file properties (pseudonym permutation etc.)."""

from __future__ import annotations

from covid19i2b2_spark.pipelines import phase2
from covid19i2b2_spark.queries.covid import _pipeline
from tests.conftest import SF_DIR


def test_patient_mapping_is_deterministic_permutation(spark):
    pipe = _pipeline(spark, SF_DIR)
    m = phase2.patient_mapping(pipe, seed=42).collect()
    n = pipe.cohort().count()
    assert len(m) == n
    assert sorted(r.study_num for r in m) == list(range(1, n + 1))
    # deterministic across runs
    m2 = phase2.patient_mapping(pipe, seed=42).collect()
    assert {r.patient_num: r.study_num for r in m} == {
        r.patient_num: r.study_num for r in m2
    }
    # different seed -> different permutation (unlinkability knob)
    m3 = phase2.patient_mapping(pipe, seed=43).collect()
    assert {r.patient_num: r.study_num for r in m} != {
        r.patient_num: r.study_num for r in m3
    }
    # pseudonyms don't follow patient order (it's a hash shuffle)
    by_patient = [r.study_num for r in sorted(m, key=lambda r: r.patient_num)]
    assert by_patient != sorted(by_patient)


def test_adapter_cohort_invariants(spark):
    """SURVEY §5.2: admission within [-7,+14] days of the positive test;
    severe_date >= admission — on the adapter-driven cohort."""
    from pyspark.sql import functions as F

    pipe = _pipeline(spark, SF_DIR)
    pos = pipe.covid_pos_patients()
    cohort = pipe.cohort().join(pos, "patient_num")
    n = cohort.count()
    assert n > 0
    bad_window = cohort.filter(
        (F.col("admission_date") < F.date_sub("covid_pos_date", 7))
        | (F.col("admission_date") > F.date_add("covid_pos_date", 14))
    ).count()
    assert bad_window == 0
    bad_severe = cohort.filter(
        (F.col("severe") == 1) & (F.col("severe_date") < F.col("admission_date"))
    ).count()
    assert bad_severe == 0


def test_patient_course_consistent_with_summary(spark):
    pipe = _pipeline(spark, SF_DIR)
    summary = {r.patient_num: r for r in phase2.patient_summary(pipe).collect()}
    course = phase2.patient_clinical_course(pipe).collect()
    per_patient_days = {}
    for r in course:
        per_patient_days.setdefault(r.patient_num, []).append(r)
    assert set(per_patient_days) == set(summary)
    for p, rows in per_patient_days.items():
        assert len(rows) == summary[p].length_of_stay + 1
        # severity flags are monotone over the stay
        flags = [r.severe for r in sorted(rows, key=lambda r: r.days_since_admission)]
        assert flags == sorted(flags)
