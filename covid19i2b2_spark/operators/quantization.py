"""Product quantization (PQ) for embedding columns (SURVEY.md §2.11 X3 —
the compression tier of the similarity stack, alongside IVF in
operators/similarity.py).

PQ splits each D-dim vector into ``m`` contiguous subvectors, learns a
``k``-codeword codebook per subspace (plain L2 Lloyd iterations — NOT
spherical; PQ approximates Euclidean geometry within each subspace), and
stores each vector as ``m`` small codes.  A 32-dim float vector becomes
m=8 bytes — a 16x compression that turns a 100 TB embedding table into a
~6 TB code table that fits hot storage.

Query path is ADC (asymmetric distance computation): the query stays
un-quantized; per subspace the k distances query-slice↔codeword are
precomputed into an m×k table (config-sized: collected + re-broadcast as
a literal, the same J8 constant-fold pattern as the covid config maps),
and each row's approximate distance is m table lookups — no per-row
float math against the original vectors, which are never read at query
time.

Determinism: hash-spread seeding (same scheme as
similarity.deterministic_centroids), fixed iteration count, ties in
assignment broken by lowest code id — byte-identical codebooks and codes
across runs.  Training never collects the corpus: per iteration only the
(m·k·dsub)-sized codebook table hits the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _subvectors(vec_col: str | Column, dim: int, m: int) -> Column:
    """array of m contiguous slices (dim must divide evenly by m)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.array(
        *[
            F.transform(
                F.slice(v, j * d + 1, d), lambda x: x.cast("double")
            )
            for j in range(m)
        ]
    )


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _explode_subspaces(
    df: DataFrame, id_col: str, vec_col: str, dim: int, m: int
) -> DataFrame:
    """(id, sub_id, subvec) — one pass, all m subspaces trained together."""
    return df.select(
        F.col(id_col),
        F.posexplode(_subvectors(vec_col, dim, m)).alias("sub_id", "subvec"),
    )


def _codebook_df(spark, books: dict[tuple[int, int], list[float]]) -> DataFrame:
    rows = [(s, c, list(v)) for (s, c), v in sorted(books.items())]
    return spark.createDataFrame(
        rows, "sub_id int, code int, cword array<double>"
    )


def _assign_codes(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """(id..., sub_id, subvec, code): nearest codeword per subspace.
    Broadcast join on sub_id (codebook is config-sized), min_by with
    (dist, code) struct so ties deterministically pick the lowest code."""
    joined = subs.join(F.broadcast(cents), "sub_id")
    key = F.struct(
        _sq_dist("subvec", "cword").alias("d"), F.col("code").alias("c")
    )
    others = [c for c in subs.columns if c not in ("sub_id", "subvec")]
    return (
        joined.groupBy(*others, "sub_id")
        .agg(
            F.min_by("code", key).alias("code"),
            F.any_value("subvec").alias("subvec"),
        )
    )


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 16,
    n_iter: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Learn the m per-subspace codebooks: (sub_id, code, cword).

    Seeding: per subspace, the k subvectors with the lowest
    xxhash64(id, sub_id, seed).  Lloyd update: groupBy(sub_id, code, pos)
    elementwise means — map-side partials keep the shuffle at
    m·k·(dim/m) rows regardless of corpus size.  Empty codes keep their
    previous codeword."""
    spark = df.sparkSession
    subs = _explode_subspaces(df, id_col, vec_col, dim, m).persist()
    h = F.xxhash64(F.col(id_col), F.col("sub_id"), F.lit(seed))
    w = Window.partitionBy("sub_id").orderBy(h, id_col)
    seeds = (
        subs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "sub_id",
            (F.col("__rn") - 1).cast("int").alias("code"),
            F.col("subvec").alias("cword"),
        )
    )
    prev = {
        (r["sub_id"], r["code"]): list(r["cword"]) for r in seeds.collect()
    }
    for _ in range(n_iter):
        cents = _codebook_df(spark, prev)
        assigned = _assign_codes(subs, cents)
        means = (
            assigned.select(
                "sub_id", "code", F.posexplode("subvec").alias("pos", "val")
            )
            .groupBy("sub_id", "code", "pos")
            .agg(F.avg("val").alias("mval"))
            .groupBy("sub_id", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                    lambda s: s["mval"],
                ).alias("cword")
            )
        )
        new = dict(prev)  # empty codes keep their previous codeword
        for r in means.collect():
            new[(r["sub_id"], r["code"])] = list(r["cword"])
        if new == prev:
            break
        prev = new
    subs.unpersist()
    return _codebook_df(spark, prev)


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: DataFrame,
    dim: int,
    m: int,
) -> DataFrame:
    """(id, codes array<int>) — each vector as its m nearest-codeword ids,
    ordered by sub_id.  One explode + broadcast join + one groupBy(id);
    the original vectors are not carried forward (that is the point)."""
    subs = _explode_subspaces(df, id_col, vec_col, dim, m)
    assigned = _assign_codes(subs, codebooks)
    return assigned.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub_id", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def pq_decode_expr(codes_col: str | Column, books: list[list[list[float]]]) -> Column:
    """Reconstructed vector (concatenated codewords) as a column — for
    reconstruction-error audits; books is the collected codebook
    [sub][code] -> cword (config-sized literal)."""
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    lit_books = F.array(
        *[
            F.array(*[F.array(*[F.lit(x) for x in cw]) for cw in sub])
            for sub in books
        ]
    )
    m = len(books)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.element_at(
                F.element_at(lit_books, j + 1), F.element_at(c, j + 1) + 1
            ),
        )
    )


def collect_codebooks(codebooks: DataFrame) -> list[list[list[float]]]:
    """Codebook table -> nested list [sub_id][code] -> cword.  The ONE
    intended collect: m·k·(dim/m) floats, config-sized by construction."""
    rows = codebooks.collect()
    m = max(r["sub_id"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    out: list[list[list[float]]] = [[[] for _ in range(k)] for _ in range(m)]
    for r in rows:
        out[r["sub_id"]][r["code"]] = list(r["cword"])
    return out


def adc_topk(
    codes_df: DataFrame,
    id_col: str,
    query_vec: list[float],
    books: list[list[list[float]]],
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over the CODE table (original vectors
    never read).  The m×k query↔codeword distance table is computed
    driver-side (m·k tiny dot products) and inlined as a literal; each
    row costs m array lookups + m adds, then TakeOrderedAndProject.

    Columns: (id_col, adc_dist) — ascending approximate squared L2."""
    m = len(books)
    d = len(query_vec) // m
    table = [
        [
            sum(
                (query_vec[j * d + t] - cw[t]) ** 2 for t in range(d)
            )
            for cw in books[j]
        ]
        for j in range(m)
    ]
    lit_table = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in table]
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(lit_table, j + 1), F.element_at(F.col("codes"), j + 1) + 1
        ),
    )
    from covid19i2b2_spark.operators.aggregates import round6

    return (
        codes_df.select(F.col(id_col), round6(dist).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


# --- IVF-PQ (IVFADC): coarse centroids route the query to n_probe
# --- clusters; within each cluster only RESIDUAL codes are scanned.
# --- The composition that makes ANN work at 100 TB: partition pruning
# --- cuts the scan to n_probe/n_centroids of the corpus, PQ cuts the
# --- bytes-per-row by ~16x, and the original vectors are never read at
# --- query time.


def ivfpq_build(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    k: int = 16,
    n_iter: int = 3,
    seed: int = 42,
):
    """Train coarse centroids (spherical k-means, cosine geometry) and PQ
    codebooks over the RESIDUALS (unit(x) - centroid), then encode.

    Returns (centroids, codebooks, codes) where codes is
    (id, centroid_id, codes array<int>).  On the unit sphere
    ||a-b||^2 = 2 - 2*cos(a,b), so ADC's squared-L2 ranking over
    residual-corrected distances reproduces cosine ranking.
    """
    from covid19i2b2_spark.operators import similarity as sim

    cents = sim.train_centroids(
        df, id_col, vec_col, n_centroids, n_iter=n_iter, seed=seed
    )
    unit = df.select(
        id_col, sim.unit_normalize(vec_col).alias(vec_col)
    )
    assigned = sim.ivf_assign(unit, id_col, vec_col, cents)
    resid = assigned.join(F.broadcast(cents), "centroid_id").select(
        id_col,
        "centroid_id",
        F.zip_with(
            vec_col, "cvec", lambda x, c: x.cast("double") - c
        ).alias("__resid"),
    )
    books = train_pq_codebooks(
        resid, id_col, "__resid", dim, m=m, k=k, n_iter=n_iter, seed=seed
    )
    codes = pq_encode(resid, id_col, "__resid", books, dim, m).join(
        resid.select(id_col, "centroid_id"), id_col
    )
    return cents, books, codes


def write_ivfpq_index(codes: DataFrame, path: str) -> None:
    """Persist (id, codes, centroid_id) partitioned by centroid_id —
    probe reads scan only the probed cluster directories (same pruned
    layout as similarity.write_ivf_index, but rows are code-sized)."""
    codes.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def ivfpq_topk(
    codes_df: DataFrame,
    id_col: str,
    query_vec: list[float],
    centroids: list[tuple[int, list[float]]],
    books: list[list[list[float]]],
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """ADC top-k over an IVF-PQ code table.  ``centroids`` is the
    collected (centroid_id, cvec) list (config-sized, like the covid
    code maps); the per-probe m x k distance tables use the PER-CENTROID
    residual query (unit(q) - centroid), selected per row by centroid_id
    via a literal lookup — one pruned scan, no per-probe jobs.

    Filter codes_df to the probed partitions first (read_ivf_probes /
    isin on centroid_id) so the scan is partition-pruned; this function
    also applies the isin filter itself for safety."""
    from covid19i2b2_spark.operators.aggregates import round6

    qn = sum(x * x for x in query_vec) ** 0.5 or 1.0
    q = [x / qn for x in query_vec]
    by_sim = sorted(
        centroids,
        key=lambda cv: -(sum(a * b for a, b in zip(q, cv[1]))),
    )
    probes = by_sim[:n_probe]
    m = len(books)
    d = len(q) // m
    # tables[p][j][c]: distance of (q - centroid_p) slice j to codeword c
    tables = []
    for _, cvec in probes:
        rq = [q[t] - cvec[t] for t in range(len(q))]
        tables.append(
            [
                [
                    sum((rq[j * d + t] - cw[t]) ** 2 for t in range(d))
                    for cw in books[j]
                ]
                for j in range(m)
            ]
        )
    lit_tables = F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in tab])
            for tab in tables
        ]
    )
    probe_ids = [int(cid) for cid, _ in probes]
    # centroid_id -> probe index (1-based for element_at)
    probe_idx = F.lit(None).cast("int")
    for i, cid in enumerate(probe_ids):
        probe_idx = F.when(
            F.col("centroid_id") == cid, F.lit(i + 1)
        ).otherwise(probe_idx)
    tab = F.element_at(lit_tables, probe_idx)
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(tab, j + 1), F.element_at(F.col("codes"), j + 1) + 1
        ),
    )
    return (
        codes_df.filter(F.col("centroid_id").isin(probe_ids))
        .select(F.col(id_col), round6(dist).alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )
