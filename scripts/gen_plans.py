#!/usr/bin/env python
"""Regenerate PLANS.md — curated `.explain("formatted")` excerpts for the
headline queries, with the scale-relevant properties called out.  Run
after any plan-affecting change; the same properties are pinned by
tests/test_plan_shape.py."""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid19i2b2_spark.registry import REGISTRY, all_queries  # noqa: E402
from covid19i2b2_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

COMMENT = {
    "q_agg_basic": (
        "TPC-H Q1 shape. Check: the timestamp bound reaches the scan "
        "(PushedFilters), ReadSchema carries only the 7 needed columns of "
        "11, and aggregation is two-phase HashAggregate (map-side partials "
        "before the single exchange) inside WholeStageCodegen."
    ),
    "q_join_inner": (
        "Workhorse join pipeline (J1+J2). Check: the orders⋈customer "
        "large×large join shuffles both sides on the key (bucketing makes "
        "it shuffle-free at scale) while the nation map side is "
        "BroadcastHashJoin — the joined fact stream never reshuffles for "
        "the map lookup; the only further exchange is the final groupBy."
    ),
    "q_concept_discovery": (
        "Ontology-driven code discovery (S7). Check: BroadcastHashJoin "
        "with the literal concept_dimension on the build side — the "
        "observation scan (the 100 TB side) never shuffles for the join; "
        "the aggregate key space is ontology-bounded."
    ),
    "q_simhash_pairs": (
        "SimHash near-dup (X2'). Check: no CartesianProduct — candidate "
        "pairs come from the 2-chunk multi-index equi-join on (key_idx, "
        "v1, v2) (~25-bit keys) over the persisted signatures; hamming "
        "verify is the bit_count intrinsic, no string popcount; "
        "signatures come from the Arrow kernel (MapInPandas) — no token "
        "explode, no 64-vote aggregation exchange (round 4 "
        "impl='kernel')."
    ),
    "q_topk": (
        "Top-k (O2). Check: TakeOrderedAndProject — per-partition heaps, "
        "no global Sort, no extra Exchange."
    ),
    "q_covid_daily_counts": (
        "DailyCounts artifact. Check: InMemoryTableScan = the cohort "
        "cached once for all six artifacts; cumulatives AND census come "
        "from ONE per-day event-delta aggregate (each cohort row emits "
        "+1/-1 at admission/severe/death/discharge+1) joined to the "
        "calendar and a single Window producing all five running sums — "
        "no interval join of any kind (round 4; the previous census "
        "BroadcastNestedLoopJoin is gone)."
    ),
    "q_minhash_pairs": (
        "MinHash+LSH near-dup. Check: no CartesianProduct — candidates "
        "come from an equi-join on (band, bucket); InMemoryTableScan "
        "shows the persisted signatures feeding both the band join and "
        "the Jaccard verify; signatures come from ONE narrow mapInPandas "
        "(ArrowEvalPython/MapInPandas) kernel pass computing the "
        "oracle-exact polynomial hashes — no shingle explode, no "
        "aggregation exchange in the signature stage (round 4 "
        "impl='kernel_poly')."
    ),
    "q_embedding_near_dup": (
        "Embedding-cosine near-dup (X2'''). Check: candidate generation "
        "is a bucket EQUI-join (SortMergeJoin/ShuffledHashJoin on "
        "__bucket), never a cross join; bucket signs + per-vector norms "
        "come from ONE ArrowEvalPython pass (bucket_norm_kernel) and the "
        "pair verify is the vectorized dot12_kernel — both bit-identical "
        "to the fixed-point expression path under the unchanged DuckDB "
        "oracle (round 4 impl='kernel', A/B median 2.11 -> 1.35 s)."
    ),
    "q_lang_id": (
        "Trained language ID (X4', registered round 14; scoring "
        "restructured round 15). Check: the gram-pivoted profile "
        "enters through ONE BroadcastHashJoin (|grams| rows — KBs) "
        "onto the bounded explode_outer (gram-less docs ride the "
        "aggregate, so there is NO re-attach join or second input "
        "scan); ONE per-id hash aggregate computes every language's "
        "sums and the argmax is a row-local array_min — no window, no "
        "SortMergeJoin; no row-Python anywhere (zero ArrowEvalPython/"
        "BatchEvalPython — training and scoring are pure expressions)."
    ),
    "q_suffix_array": (
        "Distributed suffix array (X88, registered round 14). Check: "
        "the plan shown is the FINAL numbering pass over the doubling "
        "table — range-partition on (rank, doc, pos) + per-partition "
        "row_number with the (pid, offset) frame entering through a "
        "BroadcastHashJoin (constant plan depth at any partition "
        "count; the iterative rounds are materialized localCheckpoints "
        "released round-over-round, so they don't appear here)."
    ),
    "q_kn_lm": (
        "Kneser–Ney trigram LM scoring (X93, round 15; unregistered — "
        "full DuckDB retrain parity in tests). Check: event generation "
        "is MAP-ONLY (Generate explode of padded trigram structs — no "
        "Window, no per-doc exchange), <unk> mapping is three "
        "BroadcastHashJoins over the persisted top-N vocab "
        "(InMemoryTableScan), the five model-table joins broadcast at "
        "this scale (key-partitioned shuffle joins at corpus scale via "
        "AQE), and the only exchanges are the trigram count (training, "
        "cached) and the per-doc mean aggregate; zero "
        "ArrowEvalPython/BatchEvalPython."
    ),
}


def _curation_df(spark):
    """End-to-end curation pipeline over the documents table (eval set =
    a 5-doc hash-sample standing in for a benchmark)."""
    from covid19i2b2_spark.pipelines.curation import CurationConfig, curate
    from covid19i2b2_spark.sources.tables import read_table

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    ev = docs.orderBy("doc_id").limit(5).select("text")
    return curate(docs, ev, config=CurationConfig(minhash_threshold=0.7))


EXTRA = {
    "curation_pipeline": (
        _curation_df,
        "pipelines/curation.py end-to-end (line_dedup -> exact_dedup -> "
        "MinHash pair graph -> components -> decontamination -> sample -> "
        "packing). Check: between shuffle stages the narrow ops (filters, "
        "projections, semi-join probes) fuse into shared WholeStageCodegen "
        "spans — composing the stages adds NO exchange beyond each "
        "operator's own; the eval-gram join is the one BroadcastHashJoin "
        "(small by invariant); no CartesianProduct anywhere."
    ),
}

MAX_TREE_LINES = 45
MAX_DETAIL_BLOCKS = 5


def _query_fn(name: str):
    if name in REGISTRY:
        return REGISTRY[name].fn
    # deregistered-but-still-shipped queries (driver 50-slot window)
    from covid19i2b2_spark.queries import filters, llm, llm2, llm3

    return {
        "q_topk": filters.q_topk,
        # round 12: slot ceded to q_recrawl_schedule
        "q_simhash_pairs": llm2.q_simhash_pairs,
        # round 14: slots ceded to q_lang_id / q_suffix_array
        "q_fingerprint": llm.q_fingerprint,
        "q_embedding_near_dup": llm.q_embedding_near_dup,
        # round 15: unregistered flagship (parity-only, X93)
        "q_kn_lm": llm3.q_kn_lm,
    }[name]


def excerpt(name: str) -> str:
    if name in EXTRA:
        df = EXTRA[name][0](get_spark())
    else:
        df = _query_fn(name)(get_spark(), SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    text = buf.getvalue()
    head, _, details = text.partition("\n\n")
    tree = head.splitlines()
    if len(tree) > MAX_TREE_LINES:
        tree = tree[:MAX_TREE_LINES] + [f"   ... ({len(tree) - MAX_TREE_LINES} more nodes)"]
    keep = []
    for block in details.split("\n\n"):
        if re.search(
            r"PushedFilters|ReadSchema|Scan parquet|InMemoryRelation|TakeOrdered",
            block,
        ):
            keep.append("\n".join(block.splitlines()[:6]))
        if len(keep) >= MAX_DETAIL_BLOCKS:
            break
    return "\n".join(tree) + "\n\n" + "\n\n".join(keep)


def main() -> None:
    all_queries()
    get_spark(
        app_name="plans",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = [
        "# PLANS — physical-plan review of headline queries (sf0.01, AQE on)",
        "",
        "Generated by `python scripts/gen_plans.py`; the properties called",
        "out are PINNED by tests/test_plan_shape.py — a regression fails the",
        "suite, not production.",
        "",
    ]
    for name, comment in COMMENT.items():
        out.append(f"## {name}\n\n{comment}\n\n```\n{excerpt(name)}\n```\n")
    for name, (_, comment) in EXTRA.items():
        out.append(f"## {name}\n\n{comment}\n\n```\n{excerpt(name)}\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "PLANS.md")
    # PLANS.md carries hand-written narrative sections appended after
    # generation (the round-over-round plan reviews); regeneration must
    # carry over every section whose heading this script doesn't own.
    # Track code-fence state so a '## ' line INSIDE a carried ```block```
    # can't flip the keep decision, and recognize generated sections by
    # their shape (heading + plan fence) rather than only by current
    # membership in COMMENT/EXTRA — a query removed from COMMENT must
    # drop its stale generated section, not fossilize it (review r15).
    known = {f"## {n}" for n in list(COMMENT) + list(EXTRA)}
    if os.path.exists(path):
        carried, keep, fenced = [], False, False
        for line in open(path).read().splitlines():
            if not fenced and line.startswith("## "):
                head = line.rstrip()
                # a section this run owns, OR one that LOOKS generated
                # (a bare '## q_name' heading) but is no longer in
                # COMMENT/EXTRA: both are dropped; only hand-written
                # narrative headings are carried
                keep = head not in known and not re.match(
                    r"^## q_[a-z0-9_]+$", head
                )
            if keep:
                carried.append(line)
                if line.startswith("```"):
                    fenced = not fenced
        if carried:
            out.append("\n".join(carried))
    with open(path, "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
