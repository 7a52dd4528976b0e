"""X52: distributed k-nearest-neighbor JOIN over embedding columns —
for EVERY row of a query table, its k max-cosine rows from a corpus
table (SURVEY §2.11 extension; no reference counterpart).  This is the
batch retrieval primitive a training-data pipeline runs for label
propagation, dedup-adjacent mining, retrieval-augmented eval set
construction — the all-queries generalization of similarity.cosine_topk
(one broadcast query) and ivf_topk (one probed query).

Two paths, one contract (output: query_id, neighbor_id, rank,
cosine_sim — rank 1..k by (cosine desc, neighbor id asc)):

- :func:`knn_join_brute` — exact.  |L| x |R| candidate pairs through a
  per-query top-k window: the small-side baseline AND the oracle the
  approximate path is measured against.  O(|L|·|R|) by construction;
  at scale it exists to be called on SAMPLES.
- :func:`knn_join_ivf` — the scale path.  The corpus is assigned to
  centroids ONCE (similarity.ivf_assign — map-only Arrow kernel);
  each query probes only its ``n_probe`` max-cosine clusters, so
  candidate volume is |L| · n_probe · (|R|/nlist) instead of |L|·|R|.
  Approximate exactly like IVF search: a true neighbor living outside
  the probed clusters is missed (recall pinned in tests; grow
  ``n_probe`` / nlist like any IVF deployment).  With
  ``exact_decimal=True`` and frozen centroids the whole pipeline is
  deterministic and DuckDB-reproducible (the q_ann_ivf /
  q_semantic_pairs_frozen precedent) — q_knn_join carries the parity.

100 TB shape: centroids are driver-sized by contract (the IVF
invariant); the corpus assignment is one map-only pass (persist it
partitioned by centroid_id via similarity.write_ivf_index for repeated
query batches); the probe selection is map-only (Arrow kernel) or a
broadcast join + per-query window (expr); the candidate join is one
shuffle on centroid_id, the stage-one partial top-k sorts within that
same partitioning (HashPartitioning(centroid_id) already clusters
(query_id, centroid_id) — no extra exchange), and the final top-k
shuffles only the ≤ n_probe·k survivors per query.  Nothing collects
but the centroid table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.similarity import (
    _c_sim,
    dot,
    ivf_assign,
    norm,
)


def _knn_topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, __sim) -> top-k per query with rank.
    Ties break to the LOWER neighbor id — deterministic across runs,
    partitionings, and engines (the oracle sorts the same way)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("neighbor_id")
    )
    # NULL sims are dropped AFTER the rank (DESC puts them last, so
    # real neighbors hold the same 1..k numbers either way): filtering
    # them before the window let the optimizer push the predicate into
    # the upstream join condition, re-evaluating the cosine per pair
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter((F.col("__rank") <= k) & F.col("__sim").isNotNull())
        .select(
            "query_id",
            "neighbor_id",
            F.col("__rank").cast("int").alias("rank"),
            round6(F.col("__sim")).alias("cosine_sim"),
        )
    )


def knn_join_brute(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_vec: str,
    right_vec: str,
    k: int = 10,
    exact_decimal: bool = False,
) -> DataFrame:
    """Exact kNN join — every left row's k max-cosine right rows.
    O(|L|·|R|): the baseline and the recall oracle for the IVF path.
    NULL-cosine pairs (degenerate vectors) sort below every real
    neighbor and fall out of the top-k naturally."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # per-row norms + per-side degenerate drop (same shape as
    # knn_join_ivf, round 15): one dot product per pair instead of
    # three array aggregates evaluated twice through a pushed filter
    lhs = (
        left.select(
            F.col(left_id).alias("query_id"), F.col(left_vec).alias("__lv")
        )
        .withColumn("__ln", norm("__lv", exact_decimal))
        .filter(F.col("__ln") > 0)
    )
    rhs = (
        right.select(
            F.col(right_id).alias("neighbor_id"),
            F.col(right_vec).alias("__rv"),
        )
        .withColumn("__rn", norm("__rv", exact_decimal))
        .filter(F.col("__rn") > 0)
    )
    scored = lhs.crossJoin(rhs).select(
        "query_id",
        "neighbor_id",
        F.try_divide(
            dot("__lv", "__rv", exact_decimal), F.col("__ln") * F.col("__rn")
        ).alias("__sim"),
    )
    return _knn_topk(scored, k)


def centroid_topp_kernel(
    vec_col: str | Column,
    cents: list[tuple[int, list[float]]],
    p: int,
    exact_decimal: bool = False,
) -> Column:
    """Arrow-batched top-p centroid selection: per input vector, the p
    max-cosine centroid ids ordered (sim desc, centroid_id desc) — the
    multi-winner sibling of similarity.centroid_argmax_kernel, same
    tie rule (highest id wins), same fixed-point arithmetic under
    ``exact_decimal`` so the expression path reproduces it bit-for-bit
    for valid vectors (pinned by test).  Degenerate vectors (NULL /
    wrong dim / NULL elements / zero norm) return NULL; degenerate
    centroids can never win.  Returns array<long>."""
    from pyspark.sql.functions import pandas_udf

    if not cents:
        raise ValueError("centroid_topp_kernel needs at least one centroid")
    if p < 1:
        raise ValueError(f"p must be >= 1, got {p}")
    ids = np.asarray([int(c) for c, _ in cents], dtype=np.int64)
    C = np.asarray([v for _, v in cents], dtype=np.float64)
    order = np.argsort(ids)
    ids, C = ids[order], C[order]
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

    @pandas_udf("array<long>")
    def _topp(xs: pd.Series) -> pd.Series:
        n = len(xs)
        out: list = [None] * n
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
        if len(good):
            if exact_decimal:
                vnorm = np.sqrt(
                    np.floor(V * V * 1e12 + 0.5).astype(np.int64).sum(axis=1)
                    / 1e12
                )
                zero_v = vnorm == 0
                vnorm = np.where(zero_v, 1.0, vnorm)
                sims = np.empty((len(V), len(ids)))
                # chunked like centroid_argmax_kernel: the per-element
                # floor inflates the intermediate to rows x cents x dim
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
                            vnorm[r0 : r0 + 1024, None]
                            * cnorm[None, c0 : c0 + 64]
                        )
                sims[zero_v, :] = -np.inf
            else:
                vn = np.sqrt((V * V).sum(axis=1))
                zero_v = vn == 0
                vn = np.where(zero_v, 1.0, vn)
                sims = (V / vn[:, None]) @ Cu.T
                sims[zero_v, :] = -np.inf
            if bad_cent.any():
                sims[:, bad_cent] = -np.inf
            # (sim desc, id desc): ids are cid-ascending, so sort by
            # (-sim asc, -id asc) via lexsort(last key primary)
            neg_ids = -ids
            for j, i in enumerate(good):
                row = sims[j]
                if np.isneginf(row).all():
                    continue  # every candidate degenerate -> NULL
                sel = np.lexsort((neg_ids, -row))[:p]
                sel = sel[~np.isneginf(row[sel])]
                out[i] = [int(ids[s]) for s in sel]
        return pd.Series(out)

    return _topp(_c_sim(vec_col))


def knn_join_ivf(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_vec: str,
    right_vec: str,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 8,
    exact_decimal: bool = False,
    impl: str = "kernel",
    assigned: DataFrame | None = None,
    two_stage: bool = True,
) -> DataFrame:
    """Approximate kNN join through an IVF partition of the corpus —
    see the module docstring for shape and contract.  ``centroids`` is
    the small (centroid_id, cvec) table (similarity.train_centroids /
    deterministic_centroids, or frozen rows for oracle parity).

    ``assigned`` skips the per-call corpus assignment: pass the
    (right_id, right_vec, centroid_id) frame a previous call or
    similarity.write_ivf_index produced — the steady-state shape for
    repeated query batches over one corpus (assign once, probe many;
    a centroid_id-partitioned layout additionally prunes the candidate
    scan to the probed clusters).  It MUST have been assigned under
    the same centroids/exact_decimal or probes will look in the wrong
    clusters.

    ``impl='kernel'`` selects each query's probes in one map-only
    Arrow pass (:func:`centroid_topp_kernel`); ``'expr'`` uses a
    broadcast join + per-query window — same results under
    exact_decimal for valid vectors (pinned by test), but the
    interpreted HOF cosine goes O(|L| x nlist) in expression
    evaluations (the 277 s lesson behind centroid_argmax_kernel).
    Probe ordering ties break to the HIGHEST centroid id, mirroring
    ivf_assign.

    ``two_stage`` (default on) reduces top-k per (query_id,
    centroid_id) BEFORE the global per-query rank — the standard IVF
    two-stage reduce.  The single-stage window puts ALL of a query's
    candidates (n_probe·|R|/nlist rank rows; ~800 k at the 10^10-corpus
    design point) into one task's sort; stage one splits that work
    across the query's n_probe clusters and bounds the final exchange
    and per-task sort to ≤ n_probe·k survivors per query.  Results are
    IDENTICAL by construction: each neighbor lives in exactly one
    cluster, and any global top-k member is necessarily within its own
    cluster's top-k under the same (sim desc, neighbor_id asc) order —
    pinned by the two_stage≡single-stage equality test."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_probe < 1:
        raise ValueError(f"n_probe must be >= 1, got {n_probe}")
    if impl not in ("expr", "kernel"):
        raise ValueError(f"impl must be 'expr' or 'kernel', got {impl!r}")
    # Round-15 (guide §4.2 "pass only what the function needs" applied
    # to expressions, §3.1 deliberate join strategy): norms are computed
    # ONCE PER ROW on each side before the candidate join.  The old
    # shape computed _safe_cosine(__lv, __rv) per candidate PAIR — three
    # array aggregates (dot + both norms) — and its eager
    # .isNotNull() filter was pushed into the join condition, so the
    # whole expression evaluated TWICE per pair (6 aggregates).  With
    # per-side norms the pair cost is ONE dot product, and the
    # degenerate-vector drop becomes a cheap per-row norm > 0 predicate
    # pushed below the join on each side (same rows out: a NULL or
    # zero-norm vector nulls every cosine it touches, which the old
    # filter dropped pair-by-pair).
    lhs = (
        left.select(
            F.col(left_id).alias("query_id"), F.col(left_vec).alias("__lv")
        )
        .withColumn("__ln", norm("__lv", exact_decimal))
        .filter(F.col("__ln") > 0)
    )
    cid_type = centroids.schema["centroid_id"].dataType
    if assigned is None:
        assigned = ivf_assign(
            right, right_id, right_vec, centroids, exact_decimal
        )
    assigned = (
        assigned.select(
            F.col(right_id).alias("neighbor_id"),
            F.col(right_vec).alias("__rv"),
            "centroid_id",
        )
        .withColumn("__rn", norm("__rv", exact_decimal))
        .filter(F.col("__rn") > 0)
    )
    if impl == "kernel":
        cents = [
            (r["centroid_id"], list(r["cvec"])) for r in centroids.collect()
        ]
        probes = lhs.select(
            "query_id",
            F.explode(
                centroid_topp_kernel("__lv", cents, n_probe, exact_decimal)
            ).alias("__cid"),
        ).select(
            "query_id",
            # the kernel emits long; cast back to the caller's
            # centroid_id type (generators can't nest under the cast)
            F.col("__cid").cast(cid_type).alias("centroid_id"),
        )
    else:
        # NARROW window input (query_id, centroid_id, sim) — the query
        # vectors rejoin below rather than riding the window exchange
        scored_c = lhs.join(F.broadcast(centroids)).select(
            "query_id",
            "centroid_id",
            F.try_divide(
                dot("__lv", "cvec", exact_decimal),
                F.col("__ln") * norm("cvec", exact_decimal),
            ).alias("__csim"),
        )
        wp = Window.partitionBy("query_id").orderBy(
            F.col("__csim").desc(), F.col("centroid_id").desc()
        )
        probes = (
            # NULL csims (zero-norm centroid / length-mismatched pair)
            # are dropped AFTER the rank so the isNotNull predicate is
            # not pushed into the broadcast-join condition, where it
            # would re-evaluate the cosine per (query, centroid); DESC
            # ordering puts NULLs last, so the surviving row numbers
            # are identical either way
            scored_c.withColumn("__rn", F.row_number().over(wp))
            .filter((F.col("__rn") <= n_probe) & F.col("__csim").isNotNull())
            .select("query_id", "centroid_id")
        )
    # The probe set (≤ |L|·n_probe narrow rows plus each query's vector)
    # broadcasts into the candidate join so the CORPUS side streams in
    # place — without the hint the local planner broadcasts the corpus
    # (the only side with size stats; the probes side sits behind a
    # Python kernel), exactly backwards at 100 TB.  Candidate rows leave
    # the join narrow (ids + one sim double) for the top-k windows.
    cand = F.broadcast(probes.join(lhs, "query_id")).join(
        assigned, "centroid_id"
    )
    scored = cand.select(
        "query_id",
        "centroid_id",
        "neighbor_id",
        F.try_divide(
            dot("__lv", "__rv", exact_decimal), F.col("__ln") * F.col("__rn")
        ).alias("__sim"),
    )
    if two_stage:
        # stage 1: per-(query, probed-cluster) partial top-k — each of a
        # query's n_probe clusters ranks its own candidates in its own
        # task, so only ≤ n_probe·k narrow rows reach the final window
        w1 = Window.partitionBy("query_id", "centroid_id").orderBy(
            F.col("__sim").desc(), F.col("neighbor_id")
        )
        scored = (
            scored.withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= k)
            .drop("__r1")
        )
    # residual NULL sims (only length-mismatched vector pairs can get
    # here now) fall out inside _knn_topk, after the window barrier
    return _knn_topk(scored.drop("centroid_id"), k)
