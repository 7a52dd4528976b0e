"""Plan-shape inspection (SURVEY.md §4 / §5.2 item 4).

The reference encodes its "optimizer" in script order (filter early,
materialize the cohort, join small maps late); Catalyst does all of that
automatically — these helpers let tests PIN the physical properties the
100 TB design depends on (broadcasts stay broadcasts, filters reach the
scan, no accidental nested-loop joins) so a regression shows up as a test
failure, not a 100x slowdown in production.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The final (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of every parquet scan in the plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "\n".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))


def assert_broadcast_hash_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, f"expected BroadcastHashJoin:\n{plan}"


def assert_no_nested_loop(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, (
        f"unexpected nested-loop/cartesian join:\n{plan}"
    )


def assert_take_ordered(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, (
        f"top-k should plan TakeOrderedAndProject, not a global sort:\n{plan}"
    )
