#!/usr/bin/env python
"""VERDICT r15 #6: q_agg_basic's first-in-suite tail.  In the bench,
q_agg_basic is the FIRST TIMED query after the single warm-up
(q_conditional_agg) and its median-of-3 reads ~3x its mid-suite
plan-alikes.  This probe attributes the tail: fresh process, bench
warm-up, then q_agg_basic's three runs recorded INDIVIDUALLY (the
bench's median hides which run pays), then the same for a fresh
process where the warm-up is doubled, and for q_two_level_agg (a
mid-suite aggregate shape) first-in-suite.

Usage: python scripts/agg_tail_probe.py
env: ATP_SF (default /root/testdata/sf0.1), ATP_N (default 2 samples
per variant)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
import os
os.chdir(sys.argv[1])
from covid19i2b2_spark.session import get_spark
import bench
sf = sys.argv[2]
variant = sys.argv[3]
spark = get_spark(app_name=f"agg-tail-{variant}", driver_memory="16g")
warmups = 2 if variant == "double_warmup" else 1
for _ in range(warmups):
    bench._fn("q_conditional_agg")(spark, sf).write.format("noop").mode(
        "overwrite").save()
name = "q_two_level_agg" if variant == "two_level_first" else "q_agg_basic"
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    bench._fn(name)(spark, sf).write.format("noop").mode(
        "overwrite").save()
    runs.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"variant": variant, "query": name, "runs": runs}))
"""


def main() -> None:
    sf = os.environ.get("ATP_SF", "/root/testdata/sf0.1")
    n = int(os.environ.get("ATP_N", "2"))
    variants = ["baseline", "double_warmup", "two_level_first"]
    for i in range(n):
        for v in variants:
            r = subprocess.run(
                [sys.executable, "-c", CHILD, REPO_ROOT, sf, v],
                capture_output=True, text=True, timeout=600,
            )
            line = [x for x in r.stdout.splitlines() if x.startswith("{")]
            print(f"sample {i} {line[-1] if line else r.stderr[-300:]}",
                  flush=True)


if __name__ == "__main__":
    main()
