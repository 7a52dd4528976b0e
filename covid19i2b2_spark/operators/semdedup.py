"""Semantic deduplication (SemDeDup-style; north-star LLM-pipeline op).

Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540): cluster document embeddings
with k-means, then — within each cluster only — drop all but one of any
group of documents whose pairwise cosine exceeds ``eps``.  Near-identical
*meaning* (translations, paraphrases, templated rewrites) collapses even
when the surface text shares no n-grams, which MinHash/SimHash cannot see.

Spark-first shape (reusing the IVF building blocks from similarity.py and
the pair-graph decision from dedup_clusters.py):

1. ``train_centroids``: deterministic spherical k-means (driver-side state
   is the k·dim centroid table only);
2. ``ivf_assign``: broadcast-join argmax assignment — the corpus never
   shuffles for this step;
3. within-cluster pair generation: a self-equi-join on ``centroid_id``
   (never a corpus-wide cross join) + exact-cosine filter;
4. ``dedup_decision``: connected components over the near-dup edges, min
   id survives — deterministic across runs and retries.

Scale note (100 TB): the only quadratic term is per-cluster pair count,
bounded by cluster size ≈ N/k — k is the operative knob and SemDeDup's own
recipe scales k with N (the paper uses k=110k for LAION-440M, ~4k
docs/cluster).  ``cluster_cap`` bounds the damage of degenerate clusters
(e.g. empty-document embeddings all at one point): oversized clusters are
excluded from pairing and LOGGED, never silently joined.  Everything else
is linear: one broadcast join, one equi-join shuffle on centroid_id, an
edge-bounded component loop.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.dedup_clusters import dedup_decision
from covid19i2b2_spark.operators.similarity import (
    cosine,
    ivf_assign,
    train_centroids,
)

_LOG = logging.getLogger(__name__)


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    eps: float = 0.95,
    centroids: DataFrame | None = None,
    n_iter: int = 3,
    cluster_cap: int | None = None,
    exact_decimal: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine_sim) edges between same-cluster documents with
    exact cosine >= eps.  Pass a persisted ``centroids`` table to skip
    training (the production path: train once on a hash-sample, reuse).

    With frozen ``centroids`` and ``exact_decimal=True`` this sub-stage
    is fully deterministic ANSI arithmetic — assignment and pair cosines
    reproduce bit-for-bit in DuckDB (tests/test_oracle_parity.py
    q_semantic_pairs_frozen); only Lloyd iteration keeps the full
    q_semantic_dedup query rows-only."""
    cents = (
        centroids
        if centroids is not None
        else train_centroids(df, id_col, vec_col, n_centroids, n_iter=n_iter)
    )
    assigned = ivf_assign(df, id_col, vec_col, cents, exact_decimal)
    if cluster_cap is not None:
        from covid19i2b2_spark.operators.dedup import lazy_cap_filter

        assigned = lazy_cap_filter(
            assigned,
            ["centroid_id"],
            cluster_cap,
            "semantic_dedup_pairs",
            detail=" — raise n_centroids to shrink clusters",
        )
    a = assigned.select(
        "centroid_id", F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = assigned.select(
        "centroid_id", F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round6(cosine("__va", "__vb", exact_decimal)).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= eps)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    eps: float = 0.95,
    centroids: DataFrame | None = None,
    n_iter: int = 3,
    cluster_cap: int | None = None,
    exact_decimal: bool = False,
) -> DataFrame:
    """Corpus -> surviving rows.  Groups of semantically-equivalent docs
    (cosine >= eps within a cluster, closed transitively) keep only the
    min-id survivor; all other rows pass through unchanged."""
    pairs = semantic_dedup_pairs(
        df,
        id_col,
        vec_col,
        n_centroids,
        eps,
        centroids,
        n_iter,
        cluster_cap,
        exact_decimal,
    )
    decision = dedup_decision(df.select(id_col), pairs, id_col)
    return df.join(
        decision.filter(F.col("keep")).select(id_col), id_col, "left_semi"
    )
