"""Product quantization: determinism, reconstruction quality, ADC recall
against the exact L2 ranking (operators/quantization.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators import quantization as pq

DIM, M, K = 32, 8, 16


@pytest.fixture(scope="module")
def clustered(spark):
    """Planted Gaussian clusters — the corpus shape PQ is built for."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((10, DIM)) * 3.0
    # sigma=1.0: loose enough that same-cluster points land on different
    # codes (sigma=0.3 made every cluster member quantize identically,
    # degenerating ADC ranking into its id-tiebreak)
    rows = [
        (i, [float(x) for x in centers[i % 10] + rng.standard_normal(DIM) * 1.0])
        for i in range(600)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


def test_pq_training_is_deterministic(spark, clustered):
    a = pq.train_pq_codebooks(
        clustered, "vec_id", "embedding", DIM, m=M, k=K, n_iter=2
    ).collect()
    b = pq.train_pq_codebooks(
        clustered, "vec_id", "embedding", DIM, m=M, k=K, n_iter=2
    ).collect()
    ka = {(r["sub_id"], r["code"]): r["cword"] for r in a}
    kb = {(r["sub_id"], r["code"]): r["cword"] for r in b}
    assert ka == kb


def test_pq_reconstruction_beats_global_mean(spark, clustered):
    """Quantization error must be far below the data's variance around
    its global mean (the 1-codeword baseline) — i.e. the codebooks
    actually learned structure."""
    books_df = pq.train_pq_codebooks(
        clustered, "vec_id", "embedding", DIM, m=M, k=K
    )
    books = pq.collect_codebooks(books_df)
    codes = pq.pq_encode(clustered, "vec_id", "embedding", books_df, DIM, M)
    joined = clustered.join(codes, "vec_id").select(
        "vec_id",
        pq._sq_dist(
            F.transform("embedding", lambda x: x.cast("double")),
            pq.pq_decode_expr("codes", books),
        ).alias("err"),
    )
    mse = joined.agg(F.avg("err")).first()[0]
    pdf = clustered.select("embedding").toPandas()
    mat = np.array([list(v) for v in pdf["embedding"]])
    var = float(((mat - mat.mean(axis=0)) ** 2).sum(axis=1).mean())
    assert mse < 0.25 * var, (mse, var)


def test_adc_topk_recall_vs_exact(spark, clustered):
    """Standard PQ metric recall@R: the exact-L2 top-10 must mostly sit
    inside the ADC top-50 (codes only, originals never read).  R > k
    because quantization collapses near-ties — rank inversions within a
    cell are expected, losing true neighbors entirely is not."""
    books_df = pq.train_pq_codebooks(
        clustered, "vec_id", "embedding", DIM, m=M, k=K
    )
    books = pq.collect_codebooks(books_df)
    codes = pq.pq_encode(
        clustered, "vec_id", "embedding", books_df, DIM, M
    ).cache()
    recalls = []
    for qid in [0, 1, 2]:
        qvec = [
            float(x)
            for x in clustered.filter(F.col("vec_id") == qid)
            .first()["embedding"]
        ]
        exact = {
            r["vec_id"]
            for r in clustered.filter(F.col("vec_id") != qid)
            .select(
                "vec_id",
                pq._sq_dist(
                    F.transform("embedding", lambda x: x.cast("double")),
                    F.array(*[F.lit(x) for x in qvec]),
                ).alias("d"),
            )
            .orderBy("d", "vec_id")
            .limit(10)
            .collect()
        }
        approx = {
            r["vec_id"]
            for r in pq.adc_topk(
                codes.filter(F.col("vec_id") != qid), "vec_id", qvec, books, k=50
            ).collect()
        }
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_adc_plans_take_ordered(spark, clustered):
    from tests.test_plan_shape import assert_take_ordered

    books_df = pq.train_pq_codebooks(
        clustered, "vec_id", "embedding", DIM, m=M, k=K, n_iter=1
    )
    books = pq.collect_codebooks(books_df)
    codes = pq.pq_encode(clustered, "vec_id", "embedding", books_df, DIM, M)
    qvec = [0.0] * DIM
    assert_take_ordered(pq.adc_topk(codes, "vec_id", qvec, books, k=5))


def test_ivfpq_recall_and_pruned_layout(spark, clustered, tmp_path):
    """IVF-PQ end to end: build (residual codebooks), persist partitioned
    by centroid_id, probe-read only n_probe cluster dirs, ADC over codes.
    Exact cosine top-10 must mostly appear in the IVF-PQ top-50."""
    from covid19i2b2_spark.operators import similarity as sim
    from covid19i2b2_spark.plans import physical_plan

    cents, books_df, codes = pq.ivfpq_build(
        clustered, "vec_id", "embedding", DIM, n_centroids=8, m=M, k=K, n_iter=3
    )
    path = str(tmp_path / "ivfpq_index")
    pq.write_ivfpq_index(codes, path)
    books = pq.collect_codebooks(books_df)
    centroids = [(r["centroid_id"], list(r["cvec"])) for r in cents.collect()]

    recalls = []
    for qid in [0, 1, 2]:
        qvec = [
            float(x)
            for x in clustered.filter(F.col("vec_id") == qid).first()["embedding"]
        ]
        query = spark.createDataFrame(
            [([float(x) for x in qvec],)], "qv array<float>"
        )
        exact = {
            r["vec_id"]
            for r in sim.cosine_topk(
                clustered.filter(F.col("vec_id") != qid),
                "vec_id",
                "embedding",
                query,
                10,
            ).collect()
        }
        stored = spark.read.parquet(path).filter(F.col("vec_id") != qid)
        approx_df = pq.ivfpq_topk(
            stored, "vec_id", qvec, centroids, books, n_probe=3, k=50
        )
        approx = {r["vec_id"] for r in approx_df.collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.7, recalls

    # the probe scan is partition-pruned: isin on the partition column
    # lands in PartitionFilters, not a post-scan Filter
    plan = physical_plan(approx_df)
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "centroid_id" in part_lines[0], plan
