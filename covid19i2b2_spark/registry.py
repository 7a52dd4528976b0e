"""The t2 query registry: name -> (Spark builder, DuckDB oracle SQL).

Every operator from SURVEY.md §2 lands here as a named query over the
driver testdata, with a matching ANSI-SQL oracle string (column names
aliased identically on both sides — the driver's compare sorts columns by
name before hashing values).  Queries whose semantics aren't
SQL-expressible register ``oracle=None`` and get the driver's rows-only
check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a t2 query.  Usage::

        @query("q_cumulative", oracle="SELECT ...")
        def q_cumulative(spark, sf_dir): ...
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import covid19i2b2_spark.queries  # noqa: F401  (populates REGISTRY)

    return {n: s.fn for n, s in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    import covid19i2b2_spark.queries  # noqa: F401

    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}
