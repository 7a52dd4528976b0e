"""t2 query: concept_dimension-driven code discovery (SURVEY.md:78,
VERDICT r1 #4) — the site-onboarding report derived from the ontology,
not from configured code lists."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from covid19i2b2_spark.operators.concepts import (
    ONTOLOGY_SQL,
    concept_dimension,
    observed_concepts,
)
from covid19i2b2_spark.pipelines import adapter
from covid19i2b2_spark.registry import query


@query(
    "q_concept_discovery",
    oracle=adapter.ADAPTER_SQL
    + f"""
    , cdim AS (SELECT * FROM {ONTOLOGY_SQL})
    SELECT string_split(concept_path, '\\')[3] AS category,
           o.concept_cd, name_char,
           COUNT(*) AS n_obs,
           COUNT(DISTINCT patient_num) AS n_patients,
           MIN(start_date) AS first_date,
           MAX(start_date) AS last_date
    FROM obs o JOIN cdim c ON o.concept_cd = c.concept_cd
    GROUP BY 1, 2, 3
    ORDER BY 1, 2
    """,
)
def q_concept_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code discovery from concept_dimension: ontology concepts (path
    subtree under \\ACT\\) that actually appear in the site's
    observation_fact, with usage counts and date coverage.  The maps the
    CovidPipeline otherwise takes from config (labs, med classes, severity
    codes) derive from the same ontology — tests/test_concepts.py proves
    a discovered-not-configured pipeline run is artifact-identical.

    Plan: broadcast(ontology) ⋈ fact, one ontology-bounded aggregate —
    the fact side never shuffles for the join (operators/concepts.py)."""
    obs = adapter.observation_fact(spark, sf_dir)
    return observed_concepts(obs, concept_dimension(spark)).orderBy(
        "category", "concept_cd"
    )
