"""X86 batched BM25 (InvertedIndex.search_many): per-query exact
equality with the single-query search() loop (the whole contract),
repeated-term bag semantics, k truncation, hybrid composition with a
vector list under rrf_fuse, and the one-postings-scan /
rank-pruned-window plan pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.inverted_index import InvertedIndex

DOCS = [
    (1, "spark shuffles data across the cluster nodes"),
    (2, "spark joins and spark aggregates at scale"),
    (3, "cats purr on warm windowsills all day"),
    (4, "spark aggregates need map side combiners"),
    (5, "the cluster aggregates telemetry from nodes"),
    (6, "windowsills gather dust when cats nap elsewhere"),
]

QUERIES = [
    (10, ["spark", "aggregates"]),
    (11, ["cats", "windowsills"]),
    (12, ["cluster", "nodes", "telemetry"]),
    (13, ["spark", "spark", "aggregates"]),  # repeated term: bag dedupe
]


def _index(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = InvertedIndex(str(tmp_path / "idx"))
    idx.build(docs, "doc_id", "text")
    return idx


def _queries_df(spark):
    return spark.createDataFrame(QUERIES, "query_id long, terms array<string>")


def test_matches_single_query_search(spark, tmp_path):
    idx = _index(spark, tmp_path)
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["bm25"])
        for r in idx.search_many(_queries_df(spark), k=4).collect()
    }
    for qid, terms in QUERIES:
        want = idx.search(spark, terms, k=4).collect()
        for rank, row in enumerate(want, start=1):
            assert got[(qid, rank)] == (row["doc_id"], row["bm25"]), (
                qid, rank,
            )
        # no extra rows beyond the single-query result
        assert (qid, len(want) + 1) not in got


def test_k_truncates_per_query(spark, tmp_path):
    idx = _index(spark, tmp_path)
    out = idx.search_many(_queries_df(spark), k=1)
    per_q = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_q.values()) == {1}


def test_hybrid_composition_with_vector_list(spark, tmp_path):
    """The decontamination shape: batched BM25 + a per-query vector
    list, fused per query with rrf_fuse."""
    from covid19i2b2_spark.operators.fusion import rank_by_score, rrf_fuse

    idx = _index(spark, tmp_path)
    bm25 = idx.search_many(_queries_df(spark), k=4)
    q10_lex = bm25.filter("query_id = 10").select("doc_id", "bm25")
    vec = spark.createDataFrame(
        [(4, 0.95), (2, 0.7), (6, 0.1)], "doc_id long, similarity double"
    )
    fused = rrf_fuse(
        [
            rank_by_score(q10_lex, "doc_id", "bm25"),
            rank_by_score(vec, "doc_id", "similarity"),
        ]
    ).collect()
    ids = [r["id"] for r in fused]
    assert set(ids[:2]) == {2, 4}  # in both lists -> top


def test_plan_single_postings_scan_and_rank_pruning(spark, tmp_path):
    """ONE scan of the postings parquet for all queries (the batching
    claim — search() per query costs one scan each) and the per-query
    top-k compiles to rank pruning, not a global sort."""
    from covid19i2b2_spark.plans import physical_plan

    idx = _index(spark, tmp_path)
    plan = physical_plan(idx.search_many(_queries_df(spark), k=3))
    body = plan.split("== Physical Plan ==")[-1]
    import re

    postings_scans = len(
        re.findall(r"Scan parquet[^\n]*postings", body)
    ) or body.count("postings")
    assert postings_scans <= 2, plan  # scan + the df-side reuse at most
    assert "WindowGroupLimit" in body, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
