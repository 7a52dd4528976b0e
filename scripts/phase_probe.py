#!/usr/bin/env python
"""Per-phase attribution probe (round 15, guide §1.1): for each named
bench query, split wall time into BUILD (Python plan construction),
PLAN (analysis + optimization + physical planning, forced via
queryExecution().executedPlan()), and EXEC (noop-sink run of the
pre-built frame).  The bench's timed region is build+plan+exec, so
this tells us which phase to attack per query.

Runs IN-PROCESS (one warm JVM, like the bench suite); run on a quiet
box.  Usage: python scripts/phase_probe.py [q_a q_b ...]
env: PHASE_SF (default /root/testdata/sf0.1), PHASE_N (default 2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid19i2b2_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PHASE_SF", "/root/testdata/sf0.1")
N = int(os.environ.get("PHASE_N", "2"))


def main() -> None:
    import bench

    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark(app_name="phase-probe", driver_memory="16g")
    # warm-up (bench convention)
    bench._fn("q_conditional_agg")(spark, SF).write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"{'query':34s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    totals = [0.0, 0.0, 0.0]
    for name in names:
        fn = bench._fn(name)
        best = None
        for _ in range(N):
            t0 = time.perf_counter()
            df = fn(spark, SF)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            cur = (t1 - t0, t2 - t1, t3 - t2)
            if best is None or sum(cur) < sum(best):
                best = cur
        spark.catalog.clearCache()
        b, p, e = best
        for i, v in enumerate(best):
            totals[i] += v
        print(f"{name:34s} {b:7.3f} {p:7.3f} {e:7.3f} {b+p+e:7.3f}")
    b, p, e = totals
    print(f"{'TOTAL':34s} {b:7.3f} {p:7.3f} {e:7.3f} {b+p+e:7.3f}")


if __name__ == "__main__":
    main()
