#!/usr/bin/env python
"""Isolated fresh-process probe for the suffix-span operators (round-15
drift protocol, clustered-kernel A/B): each (tree, op) sample runs in
its own subprocess — fresh JVM, cold codegen — and the recorded value
is the MIN of N samples.  With --trees a,b the samples interleave so
box drift cancels.

Ops: clustered (clustered_exact_substring_dedup over the sf documents
corpus, min_len=32 — the bench suffix_spans section's hybrid row) and
spans_full (the corpus-wide duplicated_spans_exact it is compared to).

Usage:
  python scripts/span_probe.py clustered [spans_full]
  python scripts/span_probe.py --trees /a,/b clustered
  env: SPAN_SF (default /root/testdata/sf0.1), SPAN_N (default 3)
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
spark = get_spark(app_name="span-probe", driver_memory="8g")
sf = sys.argv[3]
docs = read_table(spark, sf, "documents").select(
    F.col("doc_id").alias("doc"), "text")
# warm-up: JVM/parquet-footer startup outside the timing
docs.groupBy().count().collect()
probe = {}
t0 = time.perf_counter()
if sys.argv[2] == "clustered":
    from covid19i2b2_spark.operators.suffixes import (
        clustered_exact_substring_dedup)
    clustered_exact_substring_dedup(
        docs, "doc", "text", 32, probe=probe
    ).write.format("noop").mode("overwrite").save()
else:
    from covid19i2b2_spark.operators.suffixes import duplicated_spans_exact
    duplicated_spans_exact(
        docs, "doc", "text", 32, probe=probe
    ).write.format("noop").mode("overwrite").save()
out = {"sec": round(time.perf_counter() - t0, 3)}
for k in ("mode", "n_clusters", "cluster_chars", "corpus_chars",
          "max_cluster_chars", "rounds_run"):
    if k in probe:
        out[k] = probe[k]
print(json.dumps(out))
"""


def one(tree: str, op: str, sf: str) -> dict | None:
    r = subprocess.run(
        [sys.executable, "-c", CHILD, tree, op, sf],
        capture_output=True, text=True, timeout=900,
    )
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    print(f"  FAILED {tree} {op}: {r.stderr[-500:]}", file=sys.stderr)
    return None


def main() -> None:
    args = sys.argv[1:]
    trees = [os.getcwd()]
    if args and args[0] == "--trees":
        trees = args[1].split(",")
        args = args[2:]
    ops = args or ["clustered"]
    sf = os.environ.get("SPAN_SF", "/root/testdata/sf0.1")
    n = int(os.environ.get("SPAN_N", "3"))
    res: dict[str, dict[str, list]] = {t: {o: [] for o in ops} for t in trees}
    for i in range(n):
        for op in ops:
            for t in trees:  # interleave trees inside each round
                r = one(t, op, sf)
                print(f"round {i+1} {t} {op}: {r}")
                if r is not None:
                    res[t][op].append(r)
    for t in trees:
        for op in ops:
            runs = res[t][op]
            if runs:
                best = min(r["sec"] for r in runs)
                print(f"MIN {t} {op}: {best} (of {[r['sec'] for r in runs]})")


if __name__ == "__main__":
    main()
