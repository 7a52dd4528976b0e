"""concept_dimension code discovery (VERDICT r1 #4): a pipeline driven by
ontology-discovered code lists must match the config-driven pipeline."""

from __future__ import annotations

from covid19i2b2_spark.operators.concepts import (
    concept_dimension,
    discover_codes,
    lab_map_from_concepts,
    med_classes_from_concepts,
    severe_concepts_from_concepts,
)
from covid19i2b2_spark.pipelines import adapter
from covid19i2b2_spark.pipelines.covid import (
    DEFAULT_LAB_MAP,
    DEFAULT_MED_CLASSES,
    CovidConfig,
    CovidPipeline,
)
from tests.conftest import SF_DIR


def test_discovered_maps_match_published_defaults(spark):
    """The ontology-derived maps reproduce the published 4CE lists —
    discovery is a superset mechanism, not a different vocabulary."""
    cdim = concept_dimension(spark)
    assert lab_map_from_concepts(cdim) == sorted(DEFAULT_LAB_MAP)
    assert med_classes_from_concepts(cdim) == sorted(DEFAULT_MED_CLASSES)
    assert set(severe_concepts_from_concepts(cdim)) == set(
        CovidConfig().severe_concepts
    )


def test_prefix_discovery_scopes_subtrees(spark):
    cdim = concept_dimension(spark)
    labs = discover_codes(cdim, "\\ACT\\Lab\\").select("concept_cd").collect()
    assert all(r["concept_cd"].startswith("LOINC:") for r in labs)
    assert len(labs) == 5
    meds = discover_codes(cdim, "\\ACT\\Med\\").select("concept_cd").collect()
    assert len(meds) == 3


def test_discovered_pipeline_matches_configured(spark):
    """Onboarding path: a site configures NOTHING — severity codes, lab
    map, med classes all come from concept_dimension — and every artifact
    equals the config-driven run."""
    cdim = concept_dimension(spark)
    obs = adapter.observation_fact(spark, SF_DIR)
    pat = adapter.patient_dimension(spark, SF_DIR)
    vis = adapter.visit_dimension(spark, SF_DIR)

    configured = CovidPipeline(CovidConfig(), obs, pat, vis)
    discovered = CovidPipeline(
        CovidConfig(severe_concepts=severe_concepts_from_concepts(cdim)),
        obs,
        pat,
        vis,
        lab_map=lab_map_from_concepts(cdim),
        med_map=med_classes_from_concepts(cdim),
    )

    for name, df in configured.all_artifacts().items():
        got = sorted(map(tuple, discovered.all_artifacts()[name].collect()))
        want = sorted(map(tuple, df.collect()))
        assert got == want, name
