#!/usr/bin/env python
"""VERDICT r15 #4 receipt: the covid cohort chain over patient_num-
bucketed source tables — the declared 100 TB answer to the cohort
cache's remaining severe-markers SortMergeJoin.  Dumps the
explain("formatted") of the cohort plan for the plain-parquet and
bucketed pipelines (plans/r16/covid_cohort_{plain,bucketed}.txt),
counts Exchange nodes, and times cohort+DailyCounts end-to-end
INTERLEAVED min-of-N so box drift cancels.

Broadcast joins are disabled for the receipt (autoBroadcastJoinThreshold
= -1): at sf0.1 the severe side would broadcast and hide the join shape
the receipt is about — at 100 TB the severe-marker aggregate is
site-cohort-sized and the planner cannot assume it broadcasts.

Usage: python scripts/bucketed_cohort_probe.py
env: BCP_SF (default /root/testdata/sf0.1), BCP_N (default 3),
     BCP_BUCKETS (default 16)
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from covid19i2b2_spark.pipelines import adapter  # noqa: E402
from covid19i2b2_spark.pipelines.covid import (  # noqa: E402
    CovidConfig,
    CovidPipeline,
)
from covid19i2b2_spark.session import get_spark  # noqa: E402
from covid19i2b2_spark.sources.layout import write_bucketed  # noqa: E402

SF = os.environ.get("BCP_SF", "/root/testdata/sf0.1")
N = int(os.environ.get("BCP_N", "3"))
BUCKETS = int(os.environ.get("BCP_BUCKETS", "16"))


def _explain(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(app_name="bucketed-cohort-probe", driver_memory="8g")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    plain_tables = (
        adapter.observation_fact(spark, SF),
        adapter.patient_dimension(spark, SF),
        adapter.visit_dimension(spark, SF),
    )
    for df, name in zip(plain_tables, ("obs_p16", "pats_p16", "vis_p16")):
        write_bucketed(df, name, ["patient_num"], n_buckets=BUCKETS)
    bucketed_tables = tuple(
        spark.table(t) for t in ("obs_p16", "pats_p16", "vis_p16")
    )

    def _fresh(tables) -> CovidPipeline:
        return CovidPipeline(CovidConfig(), *tables)

    # --- plan dumps (pre-cache enrich chain: the severe join shape) ---
    out_dir = os.path.join(REPO_ROOT, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for label, tables in (("plain", plain_tables), ("bucketed", bucketed_tables)):
        from pyspark.sql import functions as F

        p = _fresh(tables)
        adm = p.admissions().groupBy("patient_num").agg(
            F.min("start_date").alias("admission_date"),
            F.max("end_date").alias("discharge_date"),
        )
        plan = _explain(p.enrich_admissions(adm))
        with open(os.path.join(out_dir, f"covid_cohort_{label}.txt"), "w") as f:
            f.write(plan)
        print(f"{label}: Exchange nodes = {plan.count('Exchange')}", flush=True)

    # --- interleaved timing: cohort + DailyCounts end-to-end ---
    res = {"plain": [], "bucketed": []}
    for i in range(N):
        for label, tables in (
            ("plain", plain_tables),
            ("bucketed", bucketed_tables),
        ):
            p = _fresh(tables)
            t0 = time.perf_counter()
            p.daily_counts().write.format("noop").mode("overwrite").save()
            res[label].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            print(f"round {i} {label}: {res[label][-1]:.3f}", flush=True)
    for label, runs in res.items():
        print(f"{label}: min-of-{N} = {min(runs):.3f}  runs={['%.3f' % r for r in runs]}")
    for t in ("obs_p16", "pats_p16", "vis_p16"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
