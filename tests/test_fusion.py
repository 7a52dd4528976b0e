"""X81 reciprocal-rank fusion (operators/fusion.py): the RRF formula
against hand-computed values, tie determinism, ascending
(distance-shaped) lists, missing-doc convention, validation, the
end-to-end hybrid over a real X54 index + cosine list, and the
bounded-plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.fusion import (
    hybrid_search,
    rank_by_score,
    rrf_fuse,
)


def _scored(spark, rows, score="score"):
    return spark.createDataFrame(rows, f"doc_id long, {score} double")


def test_rrf_hand_computed(spark):
    lex = _scored(spark, [(1, 9.0), (2, 7.0), (3, 5.0)])
    vec = _scored(spark, [(2, 0.99), (4, 0.98), (1, 0.5)], "similarity")
    got = {
        r["id"]: (r["rrf_score"], r["n_lists"])
        for r in hybrid_search(lex, vec, k=60).collect()
    }
    # lex ranks: 1->1, 2->2, 3->3; vec ranks: 2->1, 4->2, 1->3
    assert got[1][0] == pytest.approx(1 / 61 + 1 / 63)
    assert got[2][0] == pytest.approx(1 / 62 + 1 / 61)
    assert got[3] == (pytest.approx(1 / 63), 1)
    assert got[4] == (pytest.approx(1 / 62), 1)
    # doc 2 (high in both) beats doc 1 (top lexical only)
    order = [
        r["id"] for r in hybrid_search(lex, vec, k=60).collect()
    ]
    assert order[0] == 2 and order[1] == 1


def test_rank_ties_break_on_id(spark):
    df = _scored(spark, [(5, 1.0), (3, 1.0), (4, 1.0)])
    ranks = {r["id"]: r["rank"] for r in rank_by_score(df, "doc_id", "score").collect()}
    assert ranks == {3: 1, 4: 2, 5: 3}


def test_ascending_distance_lists(spark):
    dist = _scored(spark, [(1, 0.9), (2, 0.1), (3, 0.5)])
    ranks = {
        r["id"]: r["rank"]
        for r in rank_by_score(
            dist, "doc_id", "score", ascending=True
        ).collect()
    }
    assert ranks == {2: 1, 3: 2, 1: 3}


def test_top_n_and_validation(spark):
    a = rank_by_score(_scored(spark, [(i, float(-i)) for i in range(9)]),
                      "doc_id", "score")
    out = rrf_fuse([a], top_n=3).collect()
    assert len(out) == 3
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], k=0)


def test_hybrid_over_real_index(spark, tmp_path):
    """End-to-end: an X54 BM25 result + a brute-force cosine result,
    fused — a doc that is mid-rank in BOTH beats docs that top one
    list but miss the other."""
    from covid19i2b2_spark.operators.inverted_index import InvertedIndex

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "spark joins and spark aggregates at scale"),
            (3, "cats purr on warm windowsills"),
            (4, "spark aggregates need combiners"),
        ],
        "doc_id long, text string",
    )
    idx = InvertedIndex(str(tmp_path / "idx"))
    idx.build(docs, "doc_id", "text")
    bm25 = idx.search(spark, ["spark", "aggregates"], k=4)
    # synthetic vector list: doc 4 strong, doc 2 mid, doc 3 weak
    vec = spark.createDataFrame(
        [(4, 0.95), (2, 0.80), (3, 0.10)],
        "doc_id long, similarity double",
    )
    fused = hybrid_search(
        bm25.select("doc_id", F.col("bm25").alias("score")), vec, top_n=4
    ).collect()
    ids = [r["id"] for r in fused]
    # docs 2 and 4 appear in both lists -> they occupy the top
    assert set(ids[:2]) == {2, 4}
    assert fused[0]["n_lists"] == 2


def test_plan_is_retrieval_bounded(spark):
    """Fusion = one window per list + one groupBy over the tagged
    union — no Python, no corpus-sized operator anywhere."""
    from covid19i2b2_spark.plans import physical_plan

    a = rank_by_score(_scored(spark, [(1, 2.0)]), "doc_id", "score")
    b = rank_by_score(_scored(spark, [(1, 3.0)]), "doc_id", "score")
    plan = physical_plan(rrf_fuse([a, b]))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan, plan  # union + groupBy, never a join
