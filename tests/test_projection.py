"""PCA projection for embedding columns (operators/projection.py):
variance capture on planted low-rank data, distance preservation,
determinism across partitionings, ANN composition."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.projection import (
    project_embeddings,
    train_pca_projection,
)


@pytest.fixture(scope="module")
def lowrank(spark):
    rng = np.random.default_rng(0)
    basis = rng.standard_normal((3, 16))
    rows = []
    for i in range(500):
        coef = rng.standard_normal(3) * np.array([5.0, 3.0, 1.0])
        v = coef @ basis + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        np.stack([r for _, r in rows]),
    )


def test_pca_captures_planted_low_rank_structure(spark, lowrank):
    df, x = lowrank
    comps, mean, ev = train_pca_projection(df, "embedding", 3)
    total_var = x.var(axis=0, ddof=1).sum()
    assert sum(ev) / total_var > 0.99  # rank-3 data + tiny noise
    assert len(comps) == 3 and all(len(c) == 16 for c in comps)
    # components are unit-norm and orthogonal
    w = np.array(comps)
    assert np.allclose(w @ w.T, np.eye(3), atol=1e-9)
    # pairwise distances survive the projection on low-rank data
    out = project_embeddings(df, "embedding", comps, mean)
    p = {r.vec_id: np.array(r.embedding_pca) for r in out.collect()}
    for a, b in [(0, 1), (2, 3), (4, 5)]:
        full = np.linalg.norm(x[a] - x[b])
        proj = np.linalg.norm(p[a] - p[b])
        assert abs(full - proj) / full < 0.02, (a, b)
    # schema: original columns + the new array<float>
    assert out.columns == ["vec_id", "embedding", "embedding_pca"]
    assert out.schema["embedding_pca"].dataType.simpleString() == "array<float>"


def test_pca_is_deterministic_and_validates(spark, lowrank):
    df, _ = lowrank
    a = train_pca_projection(df, "embedding", 3)
    b = train_pca_projection(df.repartition(7), "embedding", 3)
    assert np.allclose(a[0], b[0], atol=1e-9)  # sign-fixed components
    assert np.allclose(a[1], b[1], atol=1e-12)
    with pytest.raises(ValueError):
        train_pca_projection(df, "embedding", 0)
    with pytest.raises(ValueError):
        train_pca_projection(df, "embedding", 17)
    with pytest.raises(ValueError):
        train_pca_projection(df.limit(1), "embedding", 2)
    with pytest.raises(ValueError):
        train_pca_projection(df.limit(0), "embedding", 2)


def test_pca_composes_with_ann(spark, lowrank):
    """Projected vectors feed the existing cosine top-k: neighbors in
    PCA space track neighbors in full space on low-rank data."""
    from covid19i2b2_spark.operators import similarity as sim

    df, _ = lowrank
    comps, mean, _ = train_pca_projection(df, "embedding", 3)
    proj = project_embeddings(df, "embedding", comps, mean).cache()
    qfull = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    qproj = proj.filter(F.col("vec_id") == 0).select(
        F.col("embedding_pca").alias("qv")
    )
    exact = {
        r.vec_id
        for r in sim.cosine_topk(
            df.filter(F.col("vec_id") != 0), "vec_id", "embedding", qfull, 10
        ).collect()
    }
    reduced = {
        r.vec_id
        for r in sim.cosine_topk(
            proj.filter(F.col("vec_id") != 0), "vec_id", "embedding_pca", qproj, 10
        ).collect()
    }
    assert len(exact & reduced) >= 8  # >= 0.8 recall@10
    proj.unpersist()
