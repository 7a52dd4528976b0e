"""Deterministic synthetic i2b2 fixture (FIXTURES.md §A) for pipeline
tests — seeded numpy on the driver, created as DataFrames (small by
design; the pipeline's scale path is exercised by the driver testdata
through pipelines/adapter.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from covid19i2b2_spark import schemas

_EPOCH = dt.datetime(2020, 3, 1)


def _day(offset: int) -> dt.datetime:
    return _EPOCH + dt.timedelta(days=int(offset))


def make_fixture(
    spark: SparkSession,
    n_patients: int = 200,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """observation_fact / patient_dimension / visit_dimension with known
    ground truth: every patient p has a positive test on day p%20, an
    inpatient admission p%20+1 (inside the +14d window), a lab value, and
    patients with p%5==0 get a severe diagnosis 2 days after admission;
    p%7==0 die 10 days after admission."""
    rng = np.random.default_rng(seed)

    patients = [
        (
            p,
            _day(-365 * (20 + p % 60)),  # birth
            _day(p % 20 + 11) if p % 7 == 0 else None,  # death
            "Y" if p % 7 != 0 else "N",
            ["M", "F", "U"][p % 3],
            ["white", "black", "asian", "other"][p % 4],
            20 + p % 60,
        )
        for p in range(n_patients)
    ]
    visits = []
    obs = []
    for p in range(n_patients):
        pos_day = p % 20
        obs.append((p, p * 10, "COVID:POS", _day(pos_day), None, "T", None, None))
        # admission 1 day after positive test, LOS 3..12 days
        los = 3 + p % 10
        visits.append((p * 10 + 1, p, _day(pos_day + 1), _day(pos_day + 1 + los), "I"))
        # a noise outpatient visit outside the window
        visits.append((p * 10 + 2, p, _day(pos_day + 40), _day(pos_day + 41), "O"))
        # lab values spread across the stay (richer Labs day axis)
        obs.append(
            (
                p,
                p * 10 + 1,
                "LOINC:1742-6",
                _day(pos_day + 2 + p % 5),
                float(np.round(rng.lognormal(3.0, 0.5), 2)),
                "E",
                None,
                "U/L",
            )
        )
        if p % 3 == 0:  # second analyte for a third of patients
            obs.append(
                (
                    p,
                    p * 10 + 5,
                    "LOINC:2160-0",
                    _day(pos_day + 3),
                    float(np.round(rng.lognormal(0.0, 0.3), 2)),
                    "E",
                    None,
                    "mg/dL",
                )
            )
        # diagnosis history before admission
        obs.append((p, p * 10 + 2, "ICD10CM:E11.9", _day(pos_day - 100), None, "T", None, None))
        if p % 5 == 0:  # severe indicator 2 days after admission
            obs.append((p, p * 10 + 3, "ICD10CM:J80", _day(pos_day + 3), None, "T", None, None))
        if p % 4 == 0:  # medication since admission
            obs.append((p, p * 10 + 4, "RXNORM:HCQ1", _day(pos_day + 2), None, "T", None, None))

    return {
        "observation_fact": spark.createDataFrame(obs, schemas.I2B2_OBSERVATION_FACT),
        "patient_dimension": spark.createDataFrame(
            patients, schemas.I2B2_PATIENT_DIMENSION
        ),
        "visit_dimension": spark.createDataFrame(visits, schemas.I2B2_VISIT_DIMENSION),
    }
