#!/usr/bin/env python
"""Shuffle/IO codec A/B probe (round 15, guide §2.3/§6 — "measure
both"): each sample runs in its own subprocess (fresh JVM) with
``spark.io.compression.codec`` set to lz4 (Spark default) or zstd,
interleaved so box drift cancels; the recorded value is the MIN of N.

Ops:
  minhash   — q_minhash_pairs noop run (banded LSH shuffle)
  pagerank  — 4 pagerank passes over the sf edge set (the repo's most
              shuffle-iterative leg)
  suffix    — duplicated_spans_exact over sf documents, local_cap=0
              (forces the distributed doubling loop's shuffles)

Usage: python scripts/codec_probe.py minhash pagerank suffix
env: CODEC_SF (default /root/testdata/sf0.1), CODEC_N (default 3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
import os
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from covid19i2b2_spark.session import get_spark
from covid19i2b2_spark.sources.tables import read_table
codec = sys.argv[2]
op = sys.argv[3]
sf = sys.argv[4]
spark = get_spark(app_name=f"codec-{codec}-{op}", driver_memory="8g",
                  extra_conf={"spark.io.compression.codec": codec})
docs = read_table(spark, sf, "documents")
docs.groupBy().count().collect()  # warm-up outside the timing
t0 = time.perf_counter()
if op == "minhash":
    import bench
    bench._fn("q_minhash_pairs")(spark, sf).write.format(
        "noop").mode("overwrite").save()
elif op == "pagerank":
    from covid19i2b2_spark.operators.graph import pagerank
    orders = read_table(spark, sf, "orders")
    v = max(orders.count() // 10, 10)
    edges = orders.select(
        F.pmod(F.col("o_orderkey"), F.lit(v)).alias("src"),
        F.pmod(F.xxhash64("o_orderkey"), F.lit(v)).alias("dst"),
    )
    pagerank(edges, n_iter=4, tol=None).write.format(
        "noop").mode("overwrite").save()
elif op == "suffix":
    from covid19i2b2_spark.operators.suffixes import duplicated_spans_exact
    d = docs.select(F.col("doc_id").alias("doc"), "text")
    duplicated_spans_exact(d, "doc", "text", 32, local_cap=0).write.format(
        "noop").mode("overwrite").save()
print(json.dumps({"sec": round(time.perf_counter() - t0, 3)}))
"""


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one(codec: str, op: str, sf: str) -> float | None:
    r = subprocess.run(
        [sys.executable, "-c", CHILD, REPO_ROOT, codec, op, sf],
        capture_output=True, text=True, timeout=900,
    )
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)["sec"]
    print(f"  FAILED {codec} {op}: {r.stderr[-500:]}", file=sys.stderr)
    return None


def main() -> None:
    ops = sys.argv[1:] or ["minhash", "pagerank", "suffix"]
    sf = os.environ.get("CODEC_SF", "/root/testdata/sf0.1")
    n = int(os.environ.get("CODEC_N", "3"))
    res: dict[str, dict[str, list[float]]] = {
        c: {op: [] for op in ops} for c in ("lz4", "zstd")
    }
    for i in range(n):
        for op in ops:
            for codec in ("lz4", "zstd"):
                v = one(codec, op, sf)
                if v is not None:
                    res[codec][op].append(v)
                print(f"sample {i+1}/{n} {codec:4s} {op}: {v}", flush=True)
    print(json.dumps({
        c: {op: min(v) if v else None for op, v in by.items()}
        for c, by in res.items()
    }))


if __name__ == "__main__":
    main()
