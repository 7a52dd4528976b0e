"""PCA dimensionality reduction for embedding columns (SURVEY §2.11
similarity-toolkit extension — the projection step run before ANN
indexing / SemDeDup when raw embeddings are wider than they need to be).

Scale shape (the canonical one-pass pattern):

- ``train_pca_projection``: ONE pass over the vectors computing
  per-partition partial moments (count, per-dim sums, d x d co-moment
  matrix) inside an Arrow ``mapInPandas`` kernel — each partition emits
  a single row of ~d² doubles, so the driver combines #partitions rows
  regardless of corpus size, then eigendecomposes the d x d covariance
  (d is small by construction: 64-4096).  No row leaves the cluster.
- ``project_embeddings``: map-only Arrow batch matmul of (x - mean) @ W
  — no shuffle, the projection matrix rides in the closure.

Determinism: eigenvectors get a sign convention (largest-|component|
coordinate made positive), so retries and re-runs produce identical
projections — the same contract as every other operator here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def train_pca_projection(
    df: DataFrame, vec_col: str, k: int
) -> tuple[list[list[float]], list[float], list[float]]:
    """(components, mean, explained_variance) from one distributed pass.

    components is k x d (rows = principal directions, unit-norm, sign-
    fixed); explained_variance the top-k eigenvalues of the sample
    covariance."""
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("cannot train PCA on an empty DataFrame")
    d = first["d"]
    if not 0 < k <= d:
        raise ValueError(f"k must be in (0, {d}] (got {k})")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(d)
        ss = np.zeros((d, d))
        for pdf in batches:
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            n += m.shape[0]
            s += m.sum(axis=0)
            ss += m.T @ m
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    parts = (
        df.select(F.col(vec_col).alias("v"))
        .mapInPandas(partial, "n long, s array<double>, ss array<double>")
        .collect()
    )
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError(f"need at least 2 vectors to train PCA (got {n})")
    s = np.sum([np.array(r["s"]) for r in parts], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in parts], axis=0)
    mean = s / n
    cov = (ss - np.outer(mean, s) - np.outer(s, mean) + n * np.outer(mean, mean)) / (
        n - 1
    )
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    # sign convention: the largest-|coordinate| entry of each component
    # is positive — eigh's sign is otherwise arbitrary
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return (
        [[float(x) for x in row] for row in comps],
        [float(x) for x in mean],
        [float(vals[o]) for o in order],
    )


def project_embeddings(
    df: DataFrame,
    vec_col: str,
    components: list[list[float]],
    mean: list[float],
    out_col: str = "embedding_pca",
) -> DataFrame:
    """Append the k-dim projection (x - mean) @ components^T as
    ``out_col`` (array<float>) — one Arrow batch matmul per partition,
    no shuffle, schema otherwise unchanged."""
    w = np.array(components, dtype=np.float64).T  # d x k
    m = np.array(mean, dtype=np.float64)
    cols = df.columns

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = (x - m) @ w
            out = pdf.copy()
            out[out_col] = [row.astype(np.float32) for row in y]
            yield out

    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, ArrayType(FloatType()))]
    )
    return df.mapInPandas(proj, schema).select(*cols, out_col)
