"""X52 kNN join (operators/knn.py): brute-force contract, IVF recall
against brute force, kernel≡expr probe equality under exact_decimal,
degenerate-vector handling, determinism across partitionings.  The
cross-engine value parity lives in
tests/test_oracle_parity.py::q_knn_join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.knn import (
    centroid_topp_kernel,
    knn_join_brute,
    knn_join_ivf,
)
from covid19i2b2_spark.operators.similarity import deterministic_centroids
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def _emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


def test_brute_contract_and_self_match(spark):
    """Each query gets exactly k ranked neighbors; when the query set
    is a subset of the corpus, rank 1 is the vector itself at ~1.0."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    out = knn_join_brute(
        q, emb, "vec_id", "vec_id", "embedding", "embedding", k=3
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {0, 1, 2, 3, 4}
    for qid, rows in per_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3]
        assert rows[0].neighbor_id == qid  # self at rank 1
        assert rows[0].cosine_sim == pytest.approx(1.0, abs=1e-6)
        sims = [r.cosine_sim for r in rows]
        assert sims == sorted(sims, reverse=True)
    with pytest.raises(ValueError):
        knn_join_brute(q, emb, "vec_id", "vec_id", "embedding",
                       "embedding", k=0)


def test_ivf_recall_against_brute(spark):
    """Probing 8 of 16 clusters must recover a solid share of the true
    top-10 (the synthetic embeddings are near-random, so recall tracks
    the probed-cluster share; the bound is deliberately loose —
    the operator contract is 'approximate like IVF', not a constant)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 20)
    cents = deterministic_centroids(emb, "vec_id", "embedding", 16)
    cents = cents.localCheckpoint(eager=True)
    brute = knn_join_brute(
        q, emb, "vec_id", "vec_id", "embedding", "embedding", k=10
    )
    ivf = knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, k=10, n_probe=8,
    )
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    a = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(a & b) / len(b)
    assert recall >= 0.4, recall
    # and the probed share bounds it the other way: n_probe=16 == brute
    full = knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, k=10, n_probe=16,
    )
    f = {(r.query_id, r.neighbor_id) for r in full.collect()}
    assert f == b  # probing every cluster IS the exact join


def test_kernel_probe_equals_expr_probe(spark):
    """impl='kernel' and impl='expr' must produce identical output
    under exact_decimal (the centroid_argmax_kernel bit-equality
    contract, extended to top-p)."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 15)
    cents = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    kw = dict(k=5, n_probe=3, exact_decimal=True)
    a = sorted(map(tuple, knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, impl="kernel", **kw).collect()))
    b = sorted(map(tuple, knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, impl="expr", **kw).collect()))
    assert a == b
    with pytest.raises(ValueError):
        knn_join_ivf(q, emb, "vec_id", "vec_id", "embedding",
                     "embedding", cents, impl="nope")


def test_degenerate_vectors_and_validation(spark):
    """NULL / zero-norm query vectors produce NO output rows (their
    cosines are NULL / the kernel returns NULL probes) instead of
    crashing the stage or polluting ranks; centroid_topp_kernel
    validates its inputs."""
    emb = _emb(spark).limit(50)
    dim = len(emb.select("embedding").first()[0])
    weird = spark.createDataFrame(
        [(9001, None), (9002, [0.0] * dim), (9003, [1.0] * dim)],
        "vec_id long, embedding array<float>",
    )
    cents = deterministic_centroids(emb, "vec_id", "embedding", 4)
    out = knn_join_ivf(
        weird, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, k=3, n_probe=2,
    )
    got = {r.query_id for r in out.collect()}
    assert got == {9003}
    brute = knn_join_brute(
        weird, emb, "vec_id", "vec_id", "embedding", "embedding", k=3
    )
    assert {r.query_id for r in brute.collect()} == {9003}
    with pytest.raises(ValueError):
        centroid_topp_kernel("embedding", [], 2)
    with pytest.raises(ValueError):
        centroid_topp_kernel("embedding", [(1, [1.0] * dim)], 0)


def test_knn_deterministic_across_partitionings(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    cents = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    a = sorted(map(tuple, knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, k=4, n_probe=3, exact_decimal=True).collect()))
    b = sorted(map(tuple, knn_join_ivf(
        q.repartition(7), emb.repartition(13), "vec_id", "vec_id",
        "embedding", "embedding", cents, k=4, n_probe=3,
        exact_decimal=True).collect()))
    assert a == b


def test_preassigned_corpus_equals_per_call_assignment(spark):
    """Passing a pre-assigned corpus (the assign-once, probe-many
    steady state) must produce identical results to the per-call
    assignment path."""
    from covid19i2b2_spark.operators.similarity import ivf_assign

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    cents = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    pre = ivf_assign(emb, "vec_id", "embedding", cents, exact_decimal=True)
    kw = dict(k=4, n_probe=3, exact_decimal=True)
    a = sorted(map(tuple, knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, **kw).collect()))
    b = sorted(map(tuple, knn_join_ivf(
        q, emb, "vec_id", "vec_id", "embedding", "embedding",
        cents, assigned=pre, **kw).collect()))
    assert a == b


def test_two_stage_equals_single_stage(spark):
    """The per-(query, probed-cluster) partial top-k (two_stage=True,
    the default) must reproduce the single global per-query window
    exactly — each neighbor lives in one cluster and every global
    top-k member is within its own cluster's top-k under the same
    (sim desc, neighbor_id asc) order.  Pinned on both impl paths."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 12)
    cents = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    for impl in ("kernel", "expr"):
        kw = dict(k=5, n_probe=4, exact_decimal=True, impl=impl)
        two = sorted(map(tuple, knn_join_ivf(
            q, emb, "vec_id", "vec_id", "embedding", "embedding",
            cents, two_stage=True, **kw).collect()))
        one = sorted(map(tuple, knn_join_ivf(
            q, emb, "vec_id", "vec_id", "embedding", "embedding",
            cents, two_stage=False, **kw).collect()))
        assert two == one, f"two-stage != single-stage under impl={impl}"
        assert len(two) == 12 * 5
