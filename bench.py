#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect).  Per-query time is the MEDIAN of N_RUNS=3 runs (machine
noise here is ±30-50%; VERDICT r1 #8) after a warm-up query that pays
session/JIT startup.  The suite total is the sum of medians.

Round-2 note: the headline set follows the registry consolidation
(VERDICT r1 #1) — q_join_broadcast/q_count_distinct folded into
q_join_inner/q_agg_basic, q_token_counts/q_text_quality into
q_text_analysis, q_simhash into q_simhash_pairs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from covid19i2b2_spark.registry import REGISTRY, all_queries  # noqa: E402
from covid19i2b2_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Headline set: the covid artifacts (the product), the heavy relational
# operators, and the LLM-data extensions.  Everything else in the registry
# is covered by the driver's t2 correctness run.
HEADLINE = [
    "q_agg_basic",
    "q_join_inner",
    "q_cumulative",
    "q_range_join",
    "q_grouping_sets",
    "q_two_level_agg",
    "q_labs_stats",
    "q_asof_first",
    "q_covid_cohort",
    "q_covid_daily_counts",
    "q_covid_demographics",
    "q_covid_labs",
    "q_covid_diagnoses",
    "q_covid_daily_counts_obfuscated",
    "q_covid_patient_course",
    "q_events_daily",
    "q_sessionize",
    "q_pivot_unpivot",
    "q_dedup_exact",
    "q_fingerprint",
    "q_text_analysis",
    "q_minhash_pairs",
    "q_simhash_pairs",
    "q_cosine_topk",
    "q_embedding_near_dup",
    "q_contamination",
    "q_bm25_rank",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _fn(name: str):
    if name in REGISTRY:
        return REGISTRY[name].fn
    # unregistered engine-surface queries (driver 50-query window)
    from covid19i2b2_spark.queries.core import q_events_daily

    return {"q_events_daily": q_events_daily}[name]


def main() -> None:
    all_queries()
    spark = get_spark(app_name="covid19i2b2-bench")
    # warm-up: pay JVM/codegen/parquet-footer startup outside the timings
    REGISTRY["q_conditional_agg"].fn(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = _fn(name)
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
