"""Importing this package populates the t2 registry (registry.REGISTRY)."""

from covid19i2b2_spark.queries import (  # noqa: F401
    aggregates,
    concepts,
    core,
    covid,
    filters,
    joins,
    llm,
    llm2,
    llm3,
    obfuscation,
    phase2,
    reshape,
    scalar,
    setops,
    windows,
)
