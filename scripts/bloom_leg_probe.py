#!/usr/bin/env python
"""Round-16 (VERDICT r15 #3): interleaved fresh-process A/B of the
incremental-dedup bloom leg, plus a per-phase breakdown of where the
leg's wall goes (build_bloom fp / build_bloom bands / counts / sinks)
and of write_blooms (flat) vs (sharded).

Each sample is its own subprocess (fresh JVM); samples interleave
across trees so box drift cancels; recorded value = min of N.

Usage:
  python scripts/bloom_leg_probe.py ab /tree/base /tree/head   # A/B
  python scripts/bloom_leg_probe.py phases                     # breakdown
env: BLP_SF (default /root/testdata/sf0.1), BLP_N (default 3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

AB_CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from covid19i2b2_spark.session import get_spark
from covid19i2b2_spark.sources.tables import read_table
from covid19i2b2_spark.operators.dedup_incremental import DedupIndex
sf = sys.argv[2]
spark = get_spark(app_name="bloom-leg-ab", driver_memory="8g")
docs = read_table(spark, sf, "documents").select("doc_id", "text")
docs.groupBy().count().collect()  # warm-up
first = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
second = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)
with tempfile.TemporaryDirectory(prefix="blp_") as root:
    idx = DedupIndex(os.path.join(root, "idx"))
    idx.build(first, "doc_id", "text")
    t0 = time.perf_counter()
    s, d = idx.filter_batch(spark, second, "doc_id", "text", bloom_fpp=0.01)
    s.write.format("noop").mode("overwrite").save()
    d.write.format("noop").mode("overwrite").save()
    bloom_sec = time.perf_counter() - t0
print(json.dumps({"sec": round(bloom_sec, 3)}))
"""

PHASES_CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from pyspark.sql import functions as F
from covid19i2b2_spark.session import get_spark
from covid19i2b2_spark.sources.tables import read_table
from covid19i2b2_spark.operators.dedup_incremental import DedupIndex
from covid19i2b2_spark.operators import bloom as B
sf = sys.argv[2]
spark = get_spark(app_name="bloom-leg-phases", driver_memory="8g")
docs = read_table(spark, sf, "documents").select("doc_id", "text")
docs.groupBy().count().collect()
first = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
second = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)
out = {}
with tempfile.TemporaryDirectory(prefix="blp_") as root:
    idx = DedupIndex(os.path.join(root, "idx"))
    t0 = time.perf_counter(); idx.build(first, "doc_id", "text")
    out["index_build"] = round(time.perf_counter() - t0, 3)
    fp = spark.read.parquet(idx.fp_path).select("fingerprint")
    t0 = time.perf_counter(); n_fp = fp.count()
    out["fp_count"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    fp_bloom = B.build_bloom(fp, "fingerprint", expected_items=n_fp, fpp=0.01)
    out["fp_bitmap"] = round(time.perf_counter() - t0, 3)
    bands = spark.read.parquet(idx.bands_path)
    bkeys = bands.select(F.xxhash64("band", "bucket").alias("__bb"))
    t0 = time.perf_counter(); n_bb = bkeys.count()
    out["band_count"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    band_bloom = B.build_bloom(bkeys, "__bb", expected_items=n_bb, fpp=0.01)
    out["band_bitmap"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    B.write_bloom_table(spark, fp_bloom, idx.bloom_fp_path)
    B.write_bloom_table(spark, band_bloom, idx.bloom_bands_path)
    out["write_tables"] = round(time.perf_counter() - t0, 3)
    # the timed leg itself, now with persisted blooms available
    t0 = time.perf_counter()
    s, d = idx.filter_batch(spark, second, "doc_id", "text", bloom_fpp=0.01)
    s.write.format("noop").mode("overwrite").save()
    d.write.format("noop").mode("overwrite").save()
    out["filter_persisted"] = round(time.perf_counter() - t0, 3)
print(json.dumps(out))
"""


def one(child: str, tree: str, sf: str) -> dict | None:
    r = subprocess.run(
        [sys.executable, "-c", child, tree, sf],
        capture_output=True, text=True, timeout=900,
    )
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    print(f"  FAILED {tree}: {r.stderr[-500:]}", file=sys.stderr)
    return None


def main() -> None:
    sf = os.environ.get("BLP_SF", "/root/testdata/sf0.1")
    n = int(os.environ.get("BLP_N", "3"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "phases"
    if mode == "ab":
        trees = sys.argv[2:4]
        res = {t: [] for t in trees}
        for i in range(n):
            for t in trees:
                v = one(AB_CHILD, t, sf)
                if v:
                    res[t].append(v["sec"])
                print(f"round {i} {t}: {v}", flush=True)
        for t in trees:
            print(f"{t}: min-of-{n} = {min(res[t]) if res[t] else 'FAIL'}")
    else:
        samples = []
        for i in range(n):
            v = one(PHASES_CHILD, REPO_ROOT, sf)
            print(f"round {i}: {v}", flush=True)
            if v:
                samples.append(v)
        if samples:
            keys = samples[0].keys()
            print(json.dumps({k: min(s[k] for s in samples) for k in keys}))


if __name__ == "__main__":
    main()
