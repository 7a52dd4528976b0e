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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

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


def centroid_argmax_kernel(
    vec_col: str | Column,
    cents: list[tuple[int, list[float]]],
    exact_decimal: bool = False,
) -> Column:
    """Arrow-batched max-cosine centroid assignment: one kernel pass
    computes every (vector, centroid) similarity and the argmax —
    replacing the broadcast-join + per-pair interpreted HOF cosine +
    max_by shuffle that goes O(n_vectors x n_centroids) in *Python-free
    but interpreted* expression evaluations (measured 277 s for one
    3-iteration training at 200k x 447 — the x100 rotated corpus;
    the kernel does the same arithmetic as vectorized numpy).

    Ties break to the HIGHEST centroid_id (last max along the
    cid-ascending axis), mirroring ivf_assign's
    max_by(centroid_id, struct(sim, centroid_id)).

    ``exact_decimal=True`` reproduces the fixed-point cosine
    (floor(x*y*1e12+0.5) int64 element sums — dot12_kernel semantics)
    BIT-identically to the expression path FOR VALID OPERANDS, so the
    q_ann_ivf oracle holds on the kernel path (pinned by test).
    False = float64 matmul over unit-normalized operands — the training
    fast path; may differ from the HOF fold in the last ulp (different
    summation order), which can flip exact near-ties: acceptable for
    k-means (documented), not for oracle parity.

    Degenerate handling (review r5): a ZERO-NORM or NaN-carrying
    CENTROID produces NaN/undefined similarities that would poison
    np.argmax (every vector would assign to it) — such columns are
    forced to -inf so they can never win; the expression path's NULL
    cosine loses in max_by the same way.  A degenerate VECTOR (NULL,
    wrong dim, NULL elements, zero norm — every sim NaN) gets a NULL
    struct; the expression path instead assigns it to the HIGHEST
    centroid id (NULL sims sort below any real sim in the max_by
    struct, so with no real sims the highest cid wins) — a documented,
    test-pinned divergence: NULL is the honest answer, and index
    writers drop NULL-centroid rows explicitly rather than routing
    garbage into a real cluster.  Returns
    struct<centroid_id: long, sim: double> (long: frozen centroids may
    carry raw 64-bit doc ids; the caller casts back to its input
    type)."""
    from pyspark.sql.functions import pandas_udf

    if not cents:
        raise ValueError("centroid_argmax_kernel needs at least one centroid")
    ids = np.asarray([int(c) for c, _ in cents], dtype=np.int64)
    C = np.asarray([v for _, v in cents], dtype=np.float64)  # (k, dim)
    order = np.argsort(ids)
    ids, C = ids[order], C[order]  # cid-ascending for the last-max rule
    dim = C.shape[1] if C.ndim == 2 else 0
    bad_cent = np.isnan(C).any(axis=1) if dim else np.zeros(0, dtype=bool)
    if exact_decimal:
        with np.errstate(invalid="ignore"):
            cnorm = np.sqrt(
                np.floor(np.nan_to_num(C) * np.nan_to_num(C) * 1e12 + 0.5)
                .astype(np.int64)
                .sum(axis=1)
                / 1e12
            )
        bad_cent = bad_cent | (cnorm == 0)
        cnorm = np.where(cnorm == 0, 1.0, cnorm)
    else:
        cn = np.sqrt(np.nan_to_num(C * C).sum(axis=1))
        bad_cent = bad_cent | (cn == 0)
        cn = np.where(cn == 0, 1.0, cn)
        Cu = np.nan_to_num(C) / cn[:, None]

    @pandas_udf("struct<centroid_id: long, sim: double>")
    def _assign(xs: pd.Series) -> pd.DataFrame:
        n = len(xs)
        out_id = np.full(n, np.nan, dtype=object)
        out_sim = np.full(n, np.nan)
        good = [
            i
            for i in range(n)
            if xs.iloc[i] is not None and len(xs.iloc[i]) == dim
        ]
        if good:
            V = np.stack(
                [np.asarray(xs.iloc[i], dtype=np.float64) for i in good]
            )
            ok = ~np.isnan(V).any(axis=1)
            good = [i for i, keep in zip(good, ok) if keep]
            V = V[ok]
        if good:
            if exact_decimal:
                vnorm = np.sqrt(
                    np.floor(V * V * 1e12 + 0.5).astype(np.int64).sum(axis=1)
                    / 1e12
                )
                zero_v = vnorm == 0
                vnorm = np.where(zero_v, 1.0, vnorm)
                sims = np.empty((len(V), len(ids)))
                # chunked: the per-element floor blows the intermediate
                # up to rows x cents x dim doubles — bound it
                for r0 in range(0, len(V), 1024):
                    Vb = V[r0 : r0 + 1024]
                    for c0 in range(0, len(ids), 64):
                        Cb = np.nan_to_num(C[c0 : c0 + 64])
                        prods = Vb[:, None, :] * Cb[None, :, :]
                        d = (
                            np.floor(prods * 1e12 + 0.5)
                            .astype(np.int64)
                            .sum(axis=2)
                            / 1e12
                        )
                        sims[r0 : r0 + 1024, c0 : c0 + 64] = d / (
                            vnorm[r0 : r0 + 1024, None] * cnorm[None, c0 : c0 + 64]
                        )
                sims[zero_v, :] = -np.inf  # zero-norm vector: no winner
            else:
                vn = np.sqrt((V * V).sum(axis=1))
                zero_v = vn == 0
                vn = np.where(zero_v, 1.0, vn)
                sims = (V / vn[:, None]) @ Cu.T
                sims[zero_v, :] = -np.inf
            # degenerate centroids can never win (review r5: their NaN
            # sims would otherwise poison argmax and claim every row)
            if bad_cent.any():
                sims[:, bad_cent] = -np.inf
            # last occurrence of the max -> highest centroid_id on ties
            last_max = sims.shape[1] - 1 - np.argmax(sims[:, ::-1], axis=1)
            for j, i in enumerate(good):
                if np.isneginf(sims[j, last_max[j]]):
                    continue  # every candidate degenerate -> NULL
                out_id[i] = int(ids[last_max[j]])
                out_sim[i] = sims[j, last_max[j]]
        return pd.DataFrame({"centroid_id": out_id, "sim": out_sim})

    # non-deterministic mark (round 15, guide §4.4): a filter on the
    # kernel's output (join-key null gates) otherwise duplicates the
    # whole Arrow evaluation below the pushed filter — the plan showed
    # two ArrowEvalPython nodes per call site.  The kernel is pure;
    # the mark only forbids the optimizer to copy/reorder it.
    return _assign.asNondeterministic()(_c_sim(vec_col))


def _c_sim(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    exact_decimal: bool = False,
    impl: str = "kernel",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid.  ``centroids`` is a
    small (centroid_id, cvec) DataFrame (collected driver-side for the
    kernel — config-sized by contract); argmax ties break to the
    HIGHEST centroid id deterministically.
    ``exact_decimal=True`` fixed-points the cosine so an external engine
    reproduces the assignment bit-for-bit (oracle parity).  At scale,
    write the output partitioned by centroid_id so probes read only
    their clusters.

    ``impl='kernel'`` (default) runs :func:`centroid_argmax_kernel` —
    one map-only Arrow pass, no join, no max_by shuffle; bit-identical
    to the expression path under exact_decimal FOR VALID VECTORS
    (pinned by test).  Degenerate vectors (NULL / ragged / NULL
    elements / zero norm) get centroid_id NULL on the kernel path,
    where the expr path assigns them to the HIGHEST centroid id (NULL
    sims lose every max_by comparison) — the kernel's NULL is the
    honest answer, and write_ivf_index/append_to_ivf_index drop such
    rows explicitly rather than routing garbage into a real cluster
    (divergence pinned by test).  ``impl='expr'`` keeps the
    broadcast-join + max_by plan (the float mode's ulp-exact legacy
    semantics)."""
    if impl not in ("expr", "kernel"):
        raise ValueError(f"impl must be 'expr' or 'kernel', got {impl!r}")
    if impl == "kernel":
        cid_type = centroids.schema["centroid_id"].dataType
        cents = [
            (r["centroid_id"], list(r["cvec"])) for r in centroids.collect()
        ]
        a = centroid_argmax_kernel(vec_col, cents, exact_decimal)
        return df.select(
            id_col,
            F.col(vec_col),
            # kernel emits long (frozen centroids may be raw 64-bit doc
            # ids); cast back to the caller's centroid_id type so the
            # output schema matches the expr path (review r5)
            a.getField("centroid_id").cast(cid_type).alias("centroid_id"),
        ).select(id_col, "centroid_id", vec_col)
    joined = df.join(F.broadcast(centroids))
    scored = joined.select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(vec_col, "cvec", exact_decimal).alias("__sim"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by("centroid_id", F.struct("__sim", "centroid_id")).alias(
            "centroid_id"
        ),
        F.first(vec_col).alias(vec_col),
    )


def deterministic_centroids(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int, seed: int = 42
) -> DataFrame:
    """Deterministic SEED centroids: the n_centroids vectors with the
    lowest xxhash64(id, seed) — a hash-spread pseudo-random sample that
    never varies across runs/retries (lowest-id seeding clustered by
    insertion order and measured poor recall geometry; VERDICT r1).
    Refine with ``train_centroids`` before real use."""
    w = F.xxhash64(F.col(id_col), F.lit(seed))
    # row_number over the n_centroids-row limit: single tiny partition
    return (
        df.orderBy(w, id_col)
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy(w, id_col))
            .cast("int")
            .alias("centroid_id"),
            F.col(vec_col).alias("cvec"),
        )
    )


def unit_normalize(vec: str | Column) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    n = norm(v)
    return F.transform(v, lambda x: x.cast("double") / n)


def train_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    n_iter: int = 5,
    seed: int = 42,
    sample_mod: int | None = None,
) -> DataFrame:
    """Spherical k-means refinement of the deterministic seeds — the
    k-means||-shaped training loop (VERDICT r1 #5), fully deterministic:

    - seeding: hash-spread sample (``deterministic_centroids``);
    - assign: broadcast(centroids) ⋈ vectors, max-cosine argmax — the
      fact side never shuffles;
    - update: element-wise mean via posexplode -> groupBy(centroid, pos)
      with map-side partial aggregation (k·dim rows after combine, no
      matter the corpus size), re-normalized to the unit sphere;
    - empty clusters keep their previous centroid.

    Per iteration the k·dim-sized centroid table is collected to the
    driver and re-broadcast — config-sized by construction, the same
    J8 constant-fold pattern as the covid pipeline's maps.  At 100 TB
    pass ``sample_mod=m`` to train on the deterministic 1/m hash-sample
    (xxhash64(id, seed) % m == 0); assignment of the full corpus happens
    once afterwards in ``ivf_assign``.
    """
    base = df.select(id_col, vec_col)
    if sample_mod:
        base = base.filter(
            F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(sample_mod)) == 0
        )
    unit = base.select(
        id_col, unit_normalize(vec_col).alias(vec_col)
    ).persist()
    cents = deterministic_centroids(unit, id_col, vec_col, n_centroids, seed)
    spark = df.sparkSession
    prev = {r["centroid_id"]: r["cvec"] for r in cents.collect()}
    for _ in range(n_iter):
        # kernel assignment (float-matmul mode), with the centroid list
        # passed straight from the driver dict — no createDataFrame ->
        # collect round trip per iteration (review r5).  The
        # per-iteration cost is n_vectors x n_centroids similarities:
        # interpreted HOF cosines took 277 s for one x100 training
        # (200k x 447); the Arrow matmul pass does the same work in
        # seconds.  Last-ulp summation-order differences vs the HOF
        # fold can flip exact near-ties; k-means is insensitive
        # (quality pinned by recall tests) and the float mode is never
        # an oracle surface.
        a = centroid_argmax_kernel(
            vec_col, [(cid, list(v)) for cid, v in sorted(prev.items())]
        )
        assigned = unit.select(
            id_col,
            a.getField("centroid_id").cast("int").alias("centroid_id"),
            F.col(vec_col),
        )
        means = (
            # NULL-centroid rows (degenerate vectors under the kernel
            # assignment) must not form a None cluster key — sorted()
            # over mixed None/int keys would crash the next iteration
            assigned.filter(F.col("centroid_id").isNotNull())
            .select(
                "centroid_id", F.posexplode(vec_col).alias("pos", "val")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        new = dict(prev)  # empty clusters keep their previous centroid
        for r in means.collect():
            v = r["cvec"]
            nrm = sum(x * x for x in v) ** 0.5
            new[r["centroid_id"]] = [x / nrm for x in v] if nrm > 0 else v
        if new == prev:
            break
        prev = new
    unit.unpersist()
    from covid19i2b2_spark.fsutil import one_partition_df

    return one_partition_df(
        spark,
        [(cid, list(v)) for cid, v in sorted(prev.items())],
        "centroid_id int, cvec array<double>",
    )


def write_ivf_index(
    assigned: DataFrame, path: str, vec_col: str = "embedding"
) -> None:
    """Persist the IVF index partitioned by centroid_id: probe reads then
    scan ONLY the probed cluster directories (parquet partition pruning) —
    the 100 TB layout where n_probe/n_centroids of the data is touched.

    Rows with NULL centroid_id (degenerate vectors under the kernel
    assignment) are DROPPED explicitly: partitionBy would file them
    under __HIVE_DEFAULT_PARTITION__, which no probe ever reads — an
    unsearchable vector does not belong in a search index.  Count them
    upstream if the pipeline needs the audit."""
    # cluster rows by the partition column first (round 15, guide §6.2):
    # unclustered partitionBy emits one file per (task, centroid) —
    # n_tasks·nlist tiny files that every probe pays a footer for; the
    # hash-cluster makes it one file per cluster directory
    assigned.filter(F.col("centroid_id").isNotNull()).repartition(
        "centroid_id"
    ).write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def append_to_ivf_index(
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    path: str,
) -> None:
    """Incrementally fold new vectors into a persisted IVF index: assign
    against the SAME frozen centroids the index was built with (different
    centroids would silently mis-route probes) and append into the
    partitioned layout — batch-sized parquet appends landing in the right
    centroid_id directories, no index rewrite, no re-read of existing
    clusters.  The embedding-side counterpart of DedupIndex.append;
    retrain centroids only on drift, then rebuild with write_ivf_index.
    NULL-centroid rows (degenerate vectors) are dropped like
    write_ivf_index does.

    Round 10: operators/ivf_index.IvfIndex is the MAINTAINED form of
    this pair — versioned layout, frozen-centroid appends, the
    staleness/skew/duplication health report, compact/rebuild — and is
    what the streaming embedding ingest loop runs; these two functions
    remain the unmanaged primitives underneath it."""
    assigned = ivf_assign(new_vectors, id_col, vec_col, centroids)
    # cluster by the partition column — one file per touched cluster
    # per append instead of one per (task, cluster); see write_ivf_index
    assigned.filter(F.col("centroid_id").isNotNull()).repartition(
        "centroid_id"
    ).write.mode("append").partitionBy("centroid_id").parquet(path)


def probe_centroids(
    cents: DataFrame,
    query: DataFrame,
    n_probe: int,
    exact_decimal: bool = False,
) -> DataFrame:
    """The n_probe centroid ids closest (cosine) to the 1-row query."""
    return (
        cents.join(F.broadcast(query))
        .select("centroid_id", cosine("cvec", "qv", exact_decimal).alias("__sim"))
        .orderBy(F.col("__sim").desc(), "centroid_id")
        .limit(n_probe)
        .select("centroid_id")
    )


def read_ivf_probes(spark, path: str, probe_ids: list[int]) -> DataFrame:
    """Partition-pruned read of the probed clusters.  The IN filter is on
    the partition column, so Spark lists only those directories
    (tests/test_llm_ops.py pins inputFiles ⊆ probed partitions)."""
    return spark.read.parquet(path).filter(
        F.col("centroid_id").isin([int(p) for p in probe_ids])
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: DataFrame,
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
    centroids: DataFrame | None = None,
    n_iter: int = 3,
    exact_decimal: bool = False,
) -> DataFrame:
    """IVF approximate top-k: probe only the n_probe centroids closest to
    the query, brute-force within.  Recall/latency knob = n_probe.
    Centroids default to spherical-k-means-trained (deterministic seeds);
    pass a persisted ``centroids`` table to skip training (the production
    path: train once, reuse per query).

    With frozen ``centroids`` and ``exact_decimal=True`` the whole search
    — assignment, probe selection, within-probe top-k — is reproducible
    in an ANSI engine (the q_ann_ivf DuckDB oracle)."""
    cents = (
        centroids
        if centroids is not None
        else train_centroids(df, id_col, vec_col, n_centroids, n_iter=n_iter)
    )
    assigned = ivf_assign(df, id_col, vec_col, cents, exact_decimal)
    probe_ids = probe_centroids(cents, query, n_probe, exact_decimal)
    candidates = assigned.join(F.broadcast(probe_ids), "centroid_id")
    return cosine_topk(candidates, id_col, vec_col, query, k, exact_decimal)


def hyperplane_lsh_bucket(
    vec_col: str | Column,
    planes: list[list[float]],
    exact_decimal: bool = False,
) -> Column:
    """Sign-bit sketch: bucket id from the signs of <v, plane_i>.  Planes
    are driver-side constants (seeded numpy), so the sketch is
    deterministic everywhere.  ``exact_decimal=True`` takes the sign of
    the fixed-point dot product (order/engine-independent — lets a SQL
    oracle reproduce the bucketing bit-for-bit)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(
            dot(v, plane, exact_decimal) > 0, F.lit(1).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return bucket


def dot12_kernel(a: Column, b: Column) -> Column:
    """Arrow-vectorized twin of _dot_decimal: identical fixed-point
    arithmetic (floor(x*y*1e12 + 0.5) per element, int64 sum, /1e12) in
    numpy — float32->float64 widening, IEEE-754 multiply, floor and
    int64 accumulation are bit-identical between numpy and the JVM, so
    this returns the same doubles as the expression path (pinned by
    tests/test_llm_ops.py).

    Exists because F.aggregate/zip_with lambdas evaluate interpreted,
    outside whole-stage codegen — at ~50k candidate pairs x 64 dims the
    HOF verify dominates the near-dup query; one Arrow batch does the
    same work as a vectorized matmul-shaped pass."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot12(xs: pd.Series, ys: pd.Series) -> pd.Series:
        n = len(xs)
        if n == 0:
            return pd.Series(np.zeros(0))
        out = np.full(n, np.nan)
        # NULL or length-mismatched rows stay NaN -> NULL (the expr path
        # returns NULL there; a kernel must not crash the stage instead)
        lens: dict[int, list[int]] = {}
        for i in range(n):
            x, y = xs.iloc[i], ys.iloc[i]
            if x is None or y is None or len(x) != len(y):
                continue
            lens.setdefault(len(x), []).append(i)
        for L, idxs in lens.items():
            if L == 0:
                out[idxs] = 0.0
                continue
            A = np.stack([np.asarray(xs.iloc[i], dtype=np.float64) for i in idxs])
            B = np.stack([np.asarray(ys.iloc[i], dtype=np.float64) for i in idxs])
            # a NULL *element* inside an array becomes NaN here, and
            # floor(NaN).astype(int64) is platform-dependent garbage; the
            # expression path returns NULL for such rows, so mask them out
            # and leave their slot NaN -> NULL (bit-identical contract)
            ok = ~(np.isnan(A).any(axis=1) | np.isnan(B).any(axis=1))
            if ok.any():
                s = (
                    np.floor(A[ok] * B[ok] * 1e12 + 0.5)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                out[np.asarray(idxs)[ok]] = s / 1e12
        return pd.Series(out)

    # non-deterministic mark (round 15, guide §4.4): a filter on the
    # kernel's output (join-key null gates) otherwise duplicates the
    # whole Arrow evaluation below the pushed filter — the plan showed
    # two ArrowEvalPython nodes per call site.  The kernel is pure;
    # the mark only forbids the optimizer to copy/reorder it.
    return _dot12.asNondeterministic()(a, b)


def bucket_norm_kernel(vec_col: str, planes: list[list[float]]) -> Column:
    """Arrow-vectorized twin of (hyperplane_lsh_bucket, norm) with
    exact_decimal semantics: one batch pass computes all plane sign
    bits AND the vector norm, replacing len(planes)+1 interpreted HOF
    aggregates per row.  Returns struct<bucket: long, norm: double>,
    bit-identical to the expression path for valid vectors.

    Degenerate vectors (NULL array, wrong dimension, or a NULL
    *element* — which numpy conversion turns into NaN) yield NULL
    struct fields here, where the expression path yields (bucket=0,
    norm=NULL) — its `when(dot > 0).otherwise(0)` bit falls through on
    a NULL dot.  The FINAL pair output is still identical on both
    paths: a NULL-norm row never survives the cosine verify, and NULL
    buckets drop out of the bucket equi-join one stage earlier
    (cheaper).  Pinned by the null-element test in
    tests/test_llm_ops.py."""
    from pyspark.sql.functions import pandas_udf

    P = [list(map(float, p)) for p in planes]

    dim = len(P[0]) if P else 0

    @pandas_udf("struct<bucket: long, norm: double>")
    def _bn(xs: pd.Series) -> pd.DataFrame:
        n = len(xs)
        if n == 0:
            return pd.DataFrame({"bucket": [], "norm": []})
        Pm = np.asarray(P, dtype=np.float64)  # (n_planes, dim)
        bucket = np.full(n, np.nan, dtype=object)
        norm_out = np.full(n, np.nan)
        # NULL or wrong-dimension vectors yield NULL struct fields (the
        # expr path returns NULL there) rather than crashing the stage
        good = [
            i
            for i in range(n)
            if xs.iloc[i] is not None and len(xs.iloc[i]) == dim
        ]
        if good:
            V = np.stack(
                [np.asarray(xs.iloc[i], dtype=np.float64) for i in good]
            )
            # NULL elements become NaN on conversion; floor(NaN)->int64 is
            # undefined, and the expr path yields NULL for such vectors —
            # drop them from the batch so their struct fields stay NULL
            ok = ~np.isnan(V).any(axis=1)
            good = [i for i, keep in zip(good, ok) if keep]
            V = V[ok]
        if good:
            # fixed-point dot per (vector, plane): floor each elementwise
            # product, THEN sum — same order of roundings as _dot_decimal
            prods = V[:, None, :] * Pm[None, :, :]
            dots = np.floor(prods * 1e12 + 0.5).astype(np.int64).sum(axis=2)
            bits = (dots > 0).astype(np.int64)
            bk = (bits << np.arange(len(P), dtype=np.int64)[None, :]).sum(
                axis=1
            )
            sd = (
                np.floor(V * V * 1e12 + 0.5).astype(np.int64).sum(axis=1)
                / 1e12
            )
            for j, i in enumerate(good):
                bucket[i] = int(bk[j])
                norm_out[i] = np.sqrt(sd[j])
        return pd.DataFrame({"bucket": bucket, "norm": norm_out})

    # non-deterministic mark (round 15, guide §4.4): a filter on the
    # kernel's output (join-key null gates) otherwise duplicates the
    # whole Arrow evaluation below the pushed filter — the plan showed
    # two ArrowEvalPython nodes per call site.  The kernel is pure;
    # the mark only forbids the optimizer to copy/reorder it.
    return _bn.asNondeterministic()(F.col(vec_col))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    threshold: float = 0.9,
    exact_decimal: bool = False,
    impl: str = "expr",
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket vectors (hyperplane signs),
    pair within buckets, verify with exact cosine >= threshold.  The
    bucket equi-join replaces the O(n²) cross join; more planes -> smaller
    buckets -> higher precision / lower recall per bucket (use
    :func:`embedding_near_dup_pairs_multitable` to buy recall back).
    ``exact_decimal=True`` makes bucket AND verify order/engine-
    independent (DuckDB-oracle-reproducible).  ``impl="kernel"`` runs
    the identical fixed-point arithmetic in Arrow-vectorized numpy
    (dot12_kernel / bucket_norm_kernel) — same values, ~2x at sf0.1;
    requires exact_decimal semantics (the only ones the kernels
    implement)."""
    if impl not in ("expr", "kernel"):
        raise ValueError(f"impl must be 'expr' or 'kernel', got {impl!r}")
    if impl == "kernel" and not exact_decimal:
        raise ValueError("impl='kernel' implements exact_decimal semantics")
    # per-vector norm computed ONCE here (it's a per-doc quantity) and
    # carried through the join — the verify then pays one dot per pair
    # instead of three (dot + both norms re-derived pairwise)
    if impl == "kernel":
        bucketed = df.select(
            F.col(id_col),
            F.col(vec_col),
            bucket_norm_kernel(vec_col, planes).alias("__bn"),
        ).select(
            id_col,
            vec_col,
            F.col("__bn.bucket").alias("__bucket"),
            F.col("__bn.norm").alias("__norm"),
        )
    else:
        bucketed = df.select(
            F.col(id_col),
            F.col(vec_col),
            hyperplane_lsh_bucket(vec_col, planes, exact_decimal).alias(
                "__bucket"
            ),
            norm(vec_col, exact_decimal).alias("__norm"),
        )
    a = bucketed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
        "__bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
        "__bucket",
    )
    pair_dot = (
        dot12_kernel(F.col("__va"), F.col("__vb"))
        if impl == "kernel"
        else dot("__va", "__vb", exact_decimal)
    )
    return (
        a.join(b, "__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round6(pair_dot / (F.col("__na") * F.col("__nb"))).alias(
                "cosine_sim"
            ),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def multi_bucket_norm_kernel(
    vec_col: str, plane_tables: list[list[list[float]]]
) -> Column:
    """Arrow twin of the per-table hyperplane_lsh_bucket loop + norm for
    the MULTI-table scheme: one batch pass computes every table's bucket
    (all tables' planes stacked into one matmul-shaped product, split by
    table) and the vector norm, exact_decimal semantics, bit-identical
    to the expression path.  Returns struct<buckets: array<long>,
    norm: double>; NULL/wrong-dimension vectors yield NULL fields."""
    from pyspark.sql.functions import pandas_udf

    tables = [[list(map(float, p)) for p in t] for t in plane_tables]
    flat = [p for t in tables for p in t]
    sizes = [len(t) for t in tables]
    dim = len(flat[0]) if flat else 0

    @pandas_udf("struct<buckets: array<long>, norm: double>")
    def _mbn(xs: pd.Series) -> pd.DataFrame:
        n = len(xs)
        if n == 0:
            return pd.DataFrame({"buckets": [], "norm": []})
        Pm = np.asarray(flat, dtype=np.float64)
        buckets = np.full(n, None, dtype=object)
        norm_out = np.full(n, np.nan)
        good = [
            i
            for i in range(n)
            if xs.iloc[i] is not None and len(xs.iloc[i]) == dim
        ]
        if good:
            V = np.stack(
                [np.asarray(xs.iloc[i], dtype=np.float64) for i in good]
            )
            prods = V[:, None, :] * Pm[None, :, :]
            dots = np.floor(prods * 1e12 + 0.5).astype(np.int64).sum(axis=2)
            bits = (dots > 0).astype(np.int64)
            off = 0
            per_table = []
            for sz in sizes:
                chunk = bits[:, off : off + sz]
                per_table.append(
                    (chunk << np.arange(sz, dtype=np.int64)[None, :]).sum(
                        axis=1
                    )
                )
                off += sz
            sd = (
                np.floor(V * V * 1e12 + 0.5).astype(np.int64).sum(axis=1)
                / 1e12
            )
            for j, i in enumerate(good):
                buckets[i] = [int(t[j]) for t in per_table]
                norm_out[i] = np.sqrt(sd[j])
        return pd.DataFrame({"buckets": buckets, "norm": norm_out})

    # non-deterministic mark (round 15, guide §4.4): a filter on the
    # kernel's output (join-key null gates) otherwise duplicates the
    # whole Arrow evaluation below the pushed filter — the plan showed
    # two ArrowEvalPython nodes per call site.  The kernel is pure;
    # the mark only forbids the optimizer to copy/reorder it.
    return _mbn.asNondeterministic()(F.col(vec_col))


def embedding_near_dup_pairs_multitable(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    plane_tables: list[list[list[float]]],
    threshold: float = 0.9,
    exact_decimal: bool = False,
    impl: str = "expr",
) -> DataFrame:
    """Multi-table LSH (the classic recall lever): each of T independent
    plane sets buckets every vector once; candidates meet if they share a
    bucket in ANY table.  Recall for a pair with collision probability p
    per table rises to 1-(1-p)^T while per-table bucket sizes (the
    quadratic term) stay those of the single-table scheme.

    Plan shape: one explode to (table_idx, bucket) rows — T rows per
    vector — then the SAME equi-join as the single-table path with
    table_idx in the key, so tables never cross-pollinate; duplicate
    candidates surfacing from multiple tables are dropped BEFORE the
    cosine, so extra tables cost index rows, not verify work."""
    if impl not in ("expr", "kernel"):
        raise ValueError(f"impl must be 'expr' or 'kernel', got {impl!r}")
    if impl == "kernel" and not exact_decimal:
        raise ValueError("impl='kernel' implements exact_decimal semantics")
    if impl == "kernel":
        keyed = (
            df.select(
                F.col(id_col),
                F.col(vec_col),
                multi_bucket_norm_kernel(vec_col, plane_tables).alias("__bn"),
            )
            .select(
                id_col,
                vec_col,
                F.col("__bn.norm").alias("__norm"),
                F.posexplode("__bn.buckets").alias("table_idx", "bucket"),
            )
        )
    else:
        keyed = df.select(
            F.col(id_col),
            F.col(vec_col),
            norm(vec_col, exact_decimal).alias("__norm"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_idx"),
                            hyperplane_lsh_bucket(
                                vec_col, planes, exact_decimal
                            ).alias("bucket"),
                        )
                        for t, planes in enumerate(plane_tables)
                    ]
                )
            ).alias("tb"),
        ).select(id_col, vec_col, "__norm", "tb.table_idx", "tb.bucket")
    a = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
        "table_idx",
        "bucket",
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
        "table_idx",
        "bucket",
    )
    candidates = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va", "__vb", "__na", "__nb")
        .dropDuplicates(["id_a", "id_b"])  # before the verify dot
    )
    pair_dot = (
        dot12_kernel(F.col("__va"), F.col("__vb"))
        if impl == "kernel"
        else dot("__va", "__vb", exact_decimal)
    )
    return candidates.select(
        "id_a",
        "id_b",
        round6(pair_dot / (F.col("__na") * F.col("__nb"))).alias(
            "cosine_sim"
        ),
    ).filter(F.col("cosine_sim") >= threshold)
