"""concept_dimension-driven code discovery (SURVEY.md:78; VERDICT r1 #4).

The reference optionally derives its site-local code lists from the i2b2
``concept_dimension`` ontology (concept_path prefixes) instead of
hard-coded config lists — that's how a site with non-standard local codes
onboards.  This module provides the Spark-first version:

- ``concept_dimension(spark)``: the ontology as a (tiny) DataFrame.  Here
  it is a literal table mirroring the published 4CE/ACT ontology slice the
  adapter uses (FIXTURES.md §B); a real site reads its own
  ``concept_dimension`` table — every downstream operator only assumes
  (concept_path, concept_cd, name_char) columns.
- ``discover_codes(cdim, prefix)``: path-prefix discovery — the
  startswith filter is a broadcast-able dim-table scan.
- ``lab_map_from_concepts`` / ``med_classes_from_concepts`` /
  ``severe_concepts_from_concepts``: derive CovidConfig's code lists from
  the ontology.  These ``collect()`` a handful of ontology rows on the
  driver ON PURPOSE: the lists become plan literals (constant-folded,
  J8 — the same way the reference folds its 1-row #config), never a join
  against the fact table.

Scale note: concept_dimension is ontology-sized (thousands of rows at a
real site, never fact-scale), so collect/broadcast is the correct plan at
100 TB of facts; the fact side is only touched in ``observed_concepts``
via one broadcast join + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# (concept_path, concept_cd, name_char) — the ontology slice: observed
# site codes PLUS registered-but-unobserved codes (real ontologies carry
# far more codes than any site records facts for).
ONTOLOGY: list[tuple[str, str, str]] = [
    ("\\ACT\\COVID\\POS\\", "COVID:POS", "SARS-CoV-2 positive test"),
    ("\\ACT\\Lab\\LOINC\\1742-6\\", "LOINC:1742-6", "alanine aminotransferase"),
    ("\\ACT\\Lab\\LOINC\\1751-7\\", "LOINC:1751-7", "albumin"),
    ("\\ACT\\Lab\\LOINC\\2160-0\\", "LOINC:2160-0", "creatinine"),
    ("\\ACT\\Lab\\LOINC\\1988-5\\", "LOINC:1988-5", "C-reactive protein"),
    ("\\ACT\\Lab\\LOINC\\6690-2\\", "LOINC:6690-2", "white blood cell count"),
    ("\\ACT\\Diag\\ICD10CM\\J80\\", "ICD10CM:J80", "acute respiratory distress"),
    ("\\ACT\\Diag\\ICD10CM\\J96.0\\", "ICD10CM:J96.0", "acute respiratory failure"),
    ("\\ACT\\Diag\\ICD10CM\\U07.1\\", "ICD10CM:U07.1", "COVID-19"),
    ("\\ACT\\Proc\\VENT\\", "PROC:VENT", "invasive mechanical ventilation"),
    ("\\ACT\\Med\\ACEI\\RXNORM:ACEI1\\", "RXNORM:ACEI1", "ACE inhibitor"),
    ("\\ACT\\Med\\HCQ\\RXNORM:HCQ1\\", "RXNORM:HCQ1", "hydroxychloroquine"),
    ("\\ACT\\Med\\SIANES\\RXNORM:SIANES1\\", "RXNORM:SIANES1", "sedative/anesthetic"),
]

_SCHEMA = T.StructType(
    [
        T.StructField("concept_path", T.StringType(), False),
        T.StructField("concept_cd", T.StringType(), False),
        T.StructField("name_char", T.StringType(), False),
    ]
)

# The same ontology as a DuckDB VALUES clause (oracle mirror).  DuckDB
# regular string literals treat backslash literally (no escape), so the
# paths go in verbatim.
ONTOLOGY_SQL = "(VALUES " + ", ".join(
    "('{0}', '{1}', '{2}')".format(p, c, n.replace("'", "''"))
    for p, c, n in ONTOLOGY
) + ") AS concept_dimension(concept_path, concept_cd, name_char)"


def concept_dimension(spark: SparkSession) -> DataFrame:
    """The ontology as a DataFrame.  A real deployment replaces this with
    spark.read.table('concept_dimension'); everything downstream only
    needs the three i2b2 columns."""
    from covid19i2b2_spark.fsutil import one_partition_df

    return one_partition_df(spark, list(ONTOLOGY), _SCHEMA)


def discover_codes(cdim: DataFrame, prefix: str) -> DataFrame:
    """All concepts under an ontology path prefix.  Dim-table-only scan;
    the startswith predicate pushes down when cdim is a real table."""
    return cdim.filter(F.col("concept_path").startswith(prefix))


def _segment(col, idx: int):
    """1-based path segment: split on backslash, skipping the leading
    empty segment produced by the leading separator."""
    return F.split(col, "\\\\").getItem(idx)


def discovered_category(cdim: DataFrame) -> DataFrame:
    """concept_cd -> top-level ontology category (segment under \\ACT\\)."""
    return cdim.select(
        "concept_path",
        "concept_cd",
        "name_char",
        _segment(F.col("concept_path"), 2).alias("category"),
    )


def observed_concepts(
    obs: DataFrame, cdim: DataFrame, prefix: str = "\\ACT\\"
) -> DataFrame:
    """The site's ACTIVE code list: ontology concepts under ``prefix``
    that actually appear in observation_fact, with usage counts — the
    site-onboarding report the reference builds from concept_dimension.

    Plan shape: broadcast(ontology) ⋈ fact on concept_cd (fact side never
    shuffles for the join), then one aggregate on the concept key —
    holds at 100 TB because the key cardinality is ontology-bounded.
    """
    cats = discovered_category(discover_codes(cdim, prefix))
    return (
        obs.join(F.broadcast(cats), "concept_cd")
        .groupBy("category", "concept_cd", "name_char")
        .agg(
            F.count("*").alias("n_obs"),
            F.count_distinct("patient_num").alias("n_patients"),
            F.min("start_date").alias("first_date"),
            F.max("start_date").alias("last_date"),
        )
    )


def lab_map_from_concepts(
    cdim: DataFrame, scale_factor: float = 1.0
) -> list[tuple[str, str, float]]:
    """Derive CovidPipeline's lab map [(loinc, name, scale)] from the
    ontology (replaces DEFAULT_LAB_MAP).  Driver-side collect of an
    ontology-bounded frame -> plan literals (J8)."""
    rows = (
        discover_codes(cdim, "\\ACT\\Lab\\LOINC\\")
        .select(
            F.regexp_replace("concept_cd", "^LOINC:", "").alias("loinc"),
            "name_char",
        )
        .orderBy("loinc")
        .collect()
    )
    return [(r["loinc"], r["name_char"], scale_factor) for r in rows]


def med_classes_from_concepts(cdim: DataFrame) -> list[tuple[str, str]]:
    """Derive the med-class map [(class, concept_cd)] from path segment 3
    of \\ACT\\Med\\{class}\\{code}\\ (replaces DEFAULT_MED_CLASSES)."""
    rows = (
        discover_codes(cdim, "\\ACT\\Med\\")
        .select(
            _segment(F.col("concept_path"), 3).alias("med_class"), "concept_cd"
        )
        .orderBy("med_class")
        .collect()
    )
    return [(r["med_class"], r["concept_cd"]) for r in rows]


def severe_concepts_from_concepts(cdim: DataFrame) -> tuple[str, ...]:
    """Severe-illness indicator codes: severe diagnosis subtree + vent
    procedures (the reference's severity definition, ~L260-330)."""
    rows = (
        discover_codes(cdim, "\\ACT\\Diag\\ICD10CM\\J80\\")
        .unionByName(discover_codes(cdim, "\\ACT\\Diag\\ICD10CM\\J96.0\\"))
        .unionByName(discover_codes(cdim, "\\ACT\\Proc\\"))
        .select("concept_cd")
        .orderBy("concept_cd")
        .collect()
    )
    return tuple(r["concept_cd"] for r in rows)
