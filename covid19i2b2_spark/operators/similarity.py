"""Similarity search over embedding columns (SURVEY.md §2.11 X3).

Embeddings are plain ``array<float>`` columns.  Three tiers:

- brute-force cosine top-k: the exactness baseline; one broadcast of the
  query vector(s), one pass, TakeOrderedAndProject for the top-k.
- IVF: deterministic coarse centroids; search only the closest n_probe
  clusters — the 100 TB path (cluster assignment is a broadcast join +
  argmax, so candidate scans touch ~n_probe/n_centroids of the data).
- random-hyperplane LSH bucketing: sign-bit sketch for near-dup joins.

Numeric determinism: dot products fold left-to-right via F.aggregate; the
``exact_decimal=True`` path rounds each elementwise product to 12dp and
sums in decimal, making the result independent of engine/summation order
(used by the DuckDB-oracle query; fast double path is the default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6

def _dot_double(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _dot_decimal(a: Column, b: Column) -> Column:
    """Order/engine-independent dot product: each elementwise product is
    fixed-pointed to picounits via floor(x*y*1e12 + 0.5) (repr-independent,
    unlike ROUND — see aggregates.round6) and summed as exact longs; sums
    stay < 2^63 for any realistic embedding dim."""
    return (
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: F.floor(
                    x.cast("double") * y.cast("double") * F.lit(1e12) + F.lit(0.5)
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / F.lit(1e12)
    )


def dot(a: str | Column, b: str | Column, exact_decimal: bool = False) -> Column:
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return _dot_decimal(ac, bc) if exact_decimal else _dot_double(ac, bc)


def norm(a: str | Column, exact_decimal: bool = False) -> Column:
    ac = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(ac, ac, exact_decimal))


def cosine(a: str | Column, b: str | Column, exact_decimal: bool = False) -> Column:
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    return dot(ac, bc, exact_decimal) / (
        norm(ac, exact_decimal) * norm(bc, exact_decimal)
    )


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    k: int = 10,
    exact_decimal: bool = False,
) -> DataFrame:
    """Brute-force cosine top-k against a 1-row query DataFrame holding
    column ``qv``.  Broadcast the query, scan once; orderBy+limit plans
    TakeOrderedAndProject (per-partition top-k, no full sort)."""
    joined = df.crossJoin(F.broadcast(query))
    # single cosine evaluation per row; the rounded display column is
    # derived AFTER the top-k limit, so only k rows pay the round
    scored = joined.select(
        id_col,
        cosine(vec_col, "qv", exact_decimal).alias("__exact"),
    )
    return (
        scored.orderBy(F.col("__exact").desc(), id_col)
        .limit(k)
        .select(id_col, round6(F.col("__exact")).alias("cosine_sim"))
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
) -> DataFrame:
    """Assign each vector to its max-cosine centroid.  ``centroids`` is a
    small (centroid_id, cvec) DataFrame — broadcast; argmax via max_by.
    At scale, write the output partitioned by centroid_id so probes read
    only their clusters."""
    joined = df.join(F.broadcast(centroids))
    scored = joined.select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(vec_col, "cvec").alias("__sim"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by("centroid_id", "__sim").alias("centroid_id"),
        F.first(vec_col).alias(vec_col),
    )


def deterministic_centroids(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """Deterministic coarse centroids: the n_centroids lowest-id vectors
    (a k-means seeding stand-in that never varies across runs/retries; at
    100 TB swap in k-means|| trained offline and persist the centroids)."""
    return (
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.monotonically_increasing_id().alias("centroid_id"),
            F.col(vec_col).alias("cvec"),
        )
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """IVF approximate top-k: probe only the n_probe centroids closest to
    the query, brute-force within.  Recall/latency knob = n_probe."""
    cents = deterministic_centroids(df, id_col, vec_col, n_centroids)
    assigned = ivf_assign(df, id_col, vec_col, cents)
    probe_ids = (
        cents.join(F.broadcast(query))
        .select("centroid_id", cosine("cvec", "qv").alias("__sim"))
        .orderBy(F.col("__sim").desc(), "centroid_id")
        .limit(n_probe)
        .select("centroid_id")
    )
    candidates = assigned.join(F.broadcast(probe_ids), "centroid_id")
    return cosine_topk(candidates, id_col, vec_col, query, k)


def hyperplane_lsh_bucket(
    vec_col: str | Column, planes: list[list[float]]
) -> Column:
    """Sign-bit sketch: bucket id from the signs of <v, plane_i>.  Planes
    are driver-side constants (seeded numpy), so the sketch is
    deterministic everywhere."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot_double(v, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket vectors (hyperplane signs),
    pair within buckets, verify with exact cosine >= threshold.  The
    bucket equi-join replaces the O(n²) cross join; more planes -> smaller
    buckets -> higher precision / lower recall per bucket (union several
    plane sets for recall)."""
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), hyperplane_lsh_bucket(vec_col, planes).alias("__bucket")
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "__bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "__bucket"
    )
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round6(cosine("__va", "__vb")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
