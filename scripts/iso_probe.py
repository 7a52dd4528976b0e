#!/usr/bin/env python
"""Isolated fresh-process probe for bench queries (round-15 drift
protocol): each (tree, query) sample runs in its OWN subprocess —
fresh JVM, cold code-gen — and the recorded value is the MIN of N
samples (noise is one-sided).  For A/B adjudication pass two tree
roots and the samples interleave base/head so box drift cancels.

Usage:
  python scripts/iso_probe.py q_a q_b ...                # this tree
  python scripts/iso_probe.py --trees /a,/b q_a q_b ...  # A/B
  env: ISO_SF (default /root/testdata/sf0.1), ISO_N (default 3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from covid19i2b2_spark.session import get_spark
import bench
spark = get_spark(app_name="iso-probe", driver_memory="8g")
# warm-up: JVM/parquet-footer startup outside the timing (bench.py's own
# convention)
bench._fn("q_conditional_agg")(spark, sys.argv[3]).write.format(
    "noop").mode("overwrite").save()
fn = bench._fn(sys.argv[2])
t0 = time.perf_counter()
fn(spark, sys.argv[3]).write.format("noop").mode("overwrite").save()
print(json.dumps({"sec": round(time.perf_counter() - t0, 3)}))
"""


def one(tree: str, query: str, sf: str) -> float | None:
    r = subprocess.run(
        [sys.executable, "-c", CHILD, tree, query, sf],
        capture_output=True, text=True, timeout=600,
    )
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)["sec"]
    print(f"  FAILED {tree} {query}: {r.stderr[-500:]}", file=sys.stderr)
    return None


def main() -> None:
    args = sys.argv[1:]
    trees = [os.getcwd()]
    if args and args[0] == "--trees":
        trees = args[1].split(",")
        args = args[2:]
    sf = os.environ.get("ISO_SF", "/root/testdata/sf0.1")
    n = int(os.environ.get("ISO_N", "3"))
    res: dict[str, dict[str, list[float]]] = {
        t: {q: [] for q in args} for t in trees
    }
    for i in range(n):
        for q in args:
            for t in trees:  # interleave trees within each round
                v = one(t, q, sf)
                if v is not None:
                    res[t][q].append(v)
                print(f"round {i} {q} {t}: {v}", flush=True)
    print("\n=== min-of-%d ===" % n)
    for q in args:
        row = "  ".join(
            f"{t}={min(res[t][q]):.3f}" if res[t][q] else f"{t}=FAIL"
            for t in trees
        )
        print(f"{q}: {row}")


if __name__ == "__main__":
    main()
