"""X53: incremental IVF index maintenance — the persisted
append/health/rebuild lifecycle for the ANN corpus (SURVEY §2.11
extension; VERDICT r9 #2).  Every other index in the engine
(DedupIndex, FuzzyIndex, the bloom tables, the sketch stores) already
has one; at 100 TB the embedding corpus is never static either: new
documents arrive in batches and must become searchable WITHOUT
re-assigning the ~10^10 vectors already routed, while something watches
for the moment the frozen centroids stop describing the data.

The index is a VERSIONED directory tree:

    path/_CURRENT          -> "v0007"  (tmp+rename atomic pointer)
    path/v0007/centroids/  -> (centroid_id, cvec) — the frozen routing
    path/v0007/vectors/    -> (id, vec) partitionBy(centroid_id) — the
                              searchable corpus, partition-pruned probes
    path/v0007/meta/       -> 1 row: column names, arithmetic mode,
                              baseline mean assigned-cosine

Lifecycle contract (mirrors DedupIndex/FuzzyIndex):

- :meth:`IvfIndex.build` trains (or accepts frozen) centroids, assigns
  the corpus, and writes version 1.  ``meta/`` is written LAST, so its
  ``_SUCCESS`` is the version-complete marker.
- :meth:`IvfIndex.append` assigns a new batch under the SAME frozen
  centroids (different centroids would silently mis-route probes) and
  parquet-appends into the current version's partition dirs — no index
  rewrite, no re-read of existing clusters.  append ≡ one-shot build
  over the union, pinned by test.
- :meth:`IvfIndex.health` is the staleness signal: per-cluster size
  skew plus the drift of the mean assigned cosine below the baseline
  recorded when the centroids were trained — appended vectors that no
  longer resemble any centroid pull the mean down.  One broadcast-join
  scan; only nlist aggregate rows reach the driver (driver-sized by
  the IVF contract).
- :meth:`IvfIndex.compact` drops replayed-append duplicates (an
  at-least-once ingest replays batches; replayed rows are IDENTICAL,
  including their deterministic assignment).  Unlike DedupIndex —
  where replay duplication costs storage only — duplicated corpus rows
  here would occupy EXTRA RANKS in a kNN top-k, so health() surfacing
  ``duplication_ratio > 1`` is a correctness cue, not just a storage
  one: compact (or query through ``assigned(dedup=True)``) before
  trusting ranked output.  Compaction writes a NEW version and flips —
  never an in-place overwrite of a path a lazy plan might re-read.
- :meth:`IvfIndex.rebuild` retrains centroids over the CURRENT corpus
  (the answer to a stale health signal), re-assigns, writes a new
  version, resets the baseline.

Crash safety: the pointer flips only after meta lands, so a crash
mid-build/compact/rebuild leaves the previous version live; the
pointer itself is tmp+rename with a highest-complete-version fallback
on the reader (the bloom_sharded protocol, ADVICE r8 #1).  A crash
mid-APPEND can leave committed part-files of a partial batch in the
current version — the replay of that batch restores completeness and
compact() reclaims the duplicates, exactly the at-least-once story
the streaming entity loop runs.

Nothing collects but centroid-sized tables (the IVF invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.fsutil import (
    hadoop_fs,
    read_text_file,
    write_text_file_atomic,
)
from covid19i2b2_spark.operators.similarity import cosine, ivf_assign

_META_SCHEMA = (
    "id_col string, vec_col string, exact_decimal boolean, impl string,"
    " n_centroids int, base_mean_cosine double, seed long,"
    " vectors_schema string"
)


class IvfIndex:
    """Paths + lifecycle of a persisted, versioned IVF index.  The
    routing parameters (column names, arithmetic mode, assignment
    impl) are INDEX IDENTITY: they are captured at :meth:`build` into
    ``meta/`` and every later operation reads them from there — there
    is no way to append or probe under mismatched settings."""

    def __init__(self, path: str):
        self.path = path.rstrip("/")

    # ---- version plumbing -------------------------------------------

    def _vdir(self, version: int) -> str:
        return f"{self.path}/v{version:04d}"

    def _pointer(self) -> str:
        return f"{self.path}/_CURRENT"

    def current_version(self, spark: SparkSession) -> int | None:
        """The live version, or None before the first build.  An
        unparseable/missing pointer (torn write, the delete->rename
        gap, a reader racing the flip) falls back to the highest
        version whose meta/_SUCCESS marker exists — a crash costs
        availability of the NEW version at worst, never makes an
        intact index unreadable."""
        txt = read_text_file(spark, self._pointer())
        if txt is not None:
            name = txt.strip()
            if name.startswith("v") and name[1:].isdigit():
                return int(name[1:])
        fs, root = hadoop_fs(spark, self.path)
        if not fs.exists(root):
            return None
        jvm = spark._jvm  # noqa: SLF001
        best = None
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                marker = jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "meta/_SUCCESS"
                )
                if fs.exists(marker):
                    v = int(name[1:])
                    best = v if best is None else max(best, v)
        return best

    def _require_version(self, spark: SparkSession) -> int:
        v = self.current_version(spark)
        if v is None:
            raise ValueError(
                f"no complete version at {self.path} — call build() first"
            )
        return v

    def _flip(self, spark: SparkSession, version: int) -> None:
        """Point the index at a fully-written version (the LAST step),
        then prune superseded version dirs EXCEPT the immediately-
        previous one — a lazy DataFrame handle captured from the
        previous version (an assigned()/centroids() a kNN consumer is
        still holding while compact()/rebuild() runs in its quiet
        window) evaluates against files that must still exist, so the
        flip leaves version-1 as a reader grace window (ADVICE r10 #3)
        and :meth:`vacuum` reclaims it explicitly once no reader can
        hold a handle that old.  A crash mid-prune only leaves garbage
        the pointer never references."""
        write_text_file_atomic(spark, self._pointer(), f"v{version:04d}")
        fs, root = hadoop_fs(spark, self.path)
        jvm = spark._jvm  # noqa: SLF001
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) < version - 1:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(root, name), True
                    )

    def vacuum(self, spark: SparkSession) -> None:
        """Delete every version directory except the current one —
        including the grace-window predecessor :meth:`_flip` retains
        for in-flight readers.  Run it AFTER the maintenance quiet
        window closes (when no consumer can still hold a lazy handle
        on the previous version); until then the predecessor costs one
        superseded copy of disk and nothing else."""
        v = self._require_version(spark)
        fs, root = hadoop_fs(spark, self.path)
        jvm = spark._jvm  # noqa: SLF001
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) != v:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(root, name), True
                    )

    # ---- reads -------------------------------------------------------

    def meta(self, spark: SparkSession) -> dict:
        v = self._require_version(spark)
        row = spark.read.parquet(f"{self._vdir(v)}/meta").collect()[0]
        return {**row.asDict(), "version": v}

    def centroids(self, spark: SparkSession) -> DataFrame:
        v = self._require_version(spark)
        return spark.read.parquet(f"{self._vdir(v)}/centroids")

    def _vectors(self, spark: SparkSession, meta: dict) -> DataFrame:
        """The version's vectors under the EXPLICIT schema stored in
        meta — never inference: an empty index (streaming loops build
        on empty seeds) has a file-less vectors dir that inference
        cannot read, and the stored schema also keeps centroid_id at
        the centroid table's key type instead of the partition-dir
        narrowing."""
        import json as _json

        from pyspark.sql.types import StructType

        schema = StructType.fromJson(_json.loads(meta["vectors_schema"]))
        return spark.read.schema(schema).parquet(
            f"{self._vdir(meta['version'])}/vectors"
        )

    def assigned(
        self, spark: SparkSession, dedup: bool = False
    ) -> DataFrame:
        """The (id, vec, centroid_id) corpus — the ``assigned=`` input
        knn_join_ivf consumes (assign once, probe many), partition-
        pruned on centroid_id filters.  ``dedup=True`` drops replayed-
        append duplicates on the way out (one extra shuffle) — use it
        when ranked output matters and health() shows
        duplication_ratio > 1 but a compact() hasn't run yet."""
        df = self._vectors(spark, self.meta(spark))
        return df.dropDuplicates() if dedup else df

    # ---- writes ------------------------------------------------------

    def _write_version(
        self,
        spark: SparkSession,
        version: int,
        cents: DataFrame,
        assigned: DataFrame,
        meta: dict,
    ) -> None:
        """centroids -> vectors -> meta (meta last = complete marker),
        then flip.  The baseline mean assigned-cosine is measured from
        the WRITTEN vectors — the exact bytes later healths compare
        against, not a pre-write plan that could diverge."""
        import json as _json

        from pyspark.sql.types import StructField, StructType

        vdir = self._vdir(version)
        cents.write.mode("overwrite").parquet(f"{vdir}/centroids")
        # Cluster rows by the partition column before the partitioned
        # write (round 15, guide §6.2 output file sizing): without it
        # every upstream task emits one file per centroid it holds —
        # n_tasks·nlist tiny files per version (~10k at the x10 bench
        # corpus), which slows this write AND every later scan of the
        # version (health, rebuild, probes all pay a footer per file).
        # Hash-clustering on centroid_id lands each cluster wholly in
        # one task -> exactly one file per cluster directory; the task
        # count stays scale-adaptive (spark.sql.shuffle.partitions +
        # AQE coalescing), and parquet files stay splittable on read.
        assigned.filter(F.col("centroid_id").isNotNull()).repartition(
            "centroid_id"
        ).write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{vdir}/vectors"
        )
        # the read-back schema, pinned into meta: data columns in file
        # order, centroid_id (the partition column) last, at the
        # centroid table's key type — explicit-schema reads then work
        # on EMPTY indexes too (no files to infer from)
        fields = [
            assigned.schema[meta["id_col"]],
            assigned.schema[meta["vec_col"]],
            StructField(
                "centroid_id", cents.schema["centroid_id"].dataType
            ),
        ]
        vec_schema = _json.dumps(StructType(fields).jsonValue())
        base = self._mean_assigned_cosine(
            spark, vdir, {**meta, "version": version,
                          "vectors_schema": vec_schema},
        )
        row = {**meta, "base_mean_cosine": base,
               "vectors_schema": vec_schema}
        from covid19i2b2_spark.fsutil import one_partition_df

        one_partition_df(spark, [tuple(
            row[k] for k in (
                "id_col", "vec_col", "exact_decimal", "impl",
                "n_centroids", "base_mean_cosine", "seed",
                "vectors_schema",
            )
        )], _META_SCHEMA).write.mode("overwrite").parquet(
            f"{vdir}/meta"
        )
        self._flip(spark, version)

    def _mean_assigned_cosine(
        self, spark: SparkSession, vdir: str, meta: dict
    ) -> float:
        """Mean cosine(vector, its assigned centroid) over a version's
        vectors — one broadcast join + one aggregate row.  Degenerate
        rows can't appear (NULL assignments are dropped at write);
        an EMPTY index reads 0.0."""
        cents = spark.read.parquet(f"{vdir}/centroids")
        vecs = self._vectors(spark, meta)
        row = (
            vecs.join(F.broadcast(cents), "centroid_id")
            .agg(
                F.avg(
                    cosine(meta["vec_col"], "cvec", meta["exact_decimal"])
                ).alias("m")
            )
            .collect()[0]
        )
        return float(row["m"]) if row["m"] is not None else 0.0

    def build(
        self,
        corpus: DataFrame,
        id_col: str,
        vec_col: str,
        n_centroids: int | None = None,
        centroids: DataFrame | None = None,
        n_iter: int = 5,
        seed: int = 42,
        exact_decimal: bool = False,
        impl: str = "kernel",
        sample_mod: int | None = None,
    ) -> None:
        """Create version 1: train ``n_centroids`` spherical-k-means
        centroids (or take ``centroids`` frozen — the oracle-parity
        form), assign the corpus, persist.  Exactly one of
        n_centroids/centroids must be given."""
        if (n_centroids is None) == (centroids is None):
            raise ValueError(
                "build() needs exactly one of n_centroids= (train) or "
                "centroids= (frozen)"
            )
        spark = corpus.sparkSession
        if centroids is None:
            from covid19i2b2_spark.operators.similarity import (
                train_centroids,
            )

            centroids = train_centroids(
                corpus, id_col, vec_col, n_centroids,
                n_iter=n_iter, seed=seed, sample_mod=sample_mod,
            )
        # pin: the centroid plan must not re-evaluate between the
        # assignment and the persisted copy (train is deterministic,
        # but frozen-centroid plans may read tables being replaced)
        cents = centroids.localCheckpoint(eager=True)
        assigned = ivf_assign(
            corpus, id_col, vec_col, cents, exact_decimal, impl
        )
        prev = self.current_version(spark) or 0
        self._write_version(
            spark,
            prev + 1,
            cents,
            assigned,
            {
                "id_col": id_col,
                "vec_col": vec_col,
                "exact_decimal": bool(exact_decimal),
                "impl": impl,
                "n_centroids": cents.count(),
                "seed": seed,
            },
        )

    def append(self, batch: DataFrame) -> dict:
        """Fold a new batch in under the FROZEN centroids: assign,
        drop degenerate vectors (NULL assignment — an unsearchable
        vector does not belong in a search index), parquet-append into
        the current version's partition dirs.  Batch columns must be
        named as at build (meta's id_col/vec_col) — renaming them here
        would hide a caller wiring the wrong table in.  Returns
        ``{"appended": n, "dropped_degenerate": m}`` so the ingest
        loop can alarm on silent vector loss."""
        spark = batch.sparkSession
        m = self.meta(spark)
        for c in (m["id_col"], m["vec_col"]):
            if c not in batch.columns:
                raise ValueError(
                    f"append batch is missing index column {c!r} "
                    f"(index was built with id_col={m['id_col']!r}, "
                    f"vec_col={m['vec_col']!r})"
                )
        assigned = ivf_assign(
            batch.select(m["id_col"], m["vec_col"]),
            m["id_col"],
            m["vec_col"],
            self.centroids(spark),
            m["exact_decimal"],
            m["impl"],
        ).persist()
        try:
            total = assigned.count()
            good = assigned.filter(F.col("centroid_id").isNotNull())
            kept = good.count()
            # cluster by the partition column first — one file per
            # touched cluster per append instead of one per (task,
            # cluster); see _write_version
            good.repartition("centroid_id").write.mode(
                "append"
            ).partitionBy("centroid_id").parquet(
                f"{self._vdir(m['version'])}/vectors"
            )
        finally:
            assigned.unpersist()
        return {"appended": kept, "dropped_degenerate": total - kept}

    # ---- maintenance -------------------------------------------------

    def health(
        self, spark: SparkSession, stale_drift: float = 0.02
    ) -> dict:
        """The staleness/skew/bloat report — run on a maintenance
        cadence (the streaming loops log it every N epochs), not per
        batch.  One broadcast-join scan; nlist aggregate rows collect.

        - ``cosine_drift`` = baseline mean assigned-cosine minus the
          current mean: appended vectors the frozen centroids no
          longer describe pull it positive.  ``stale`` trips at
          ``stale_drift`` (default 0.02 — at that point recall at
          fixed n_probe has measurably decayed; tune per corpus) —
          the cue to :meth:`rebuild`.
        - ``cluster_skew`` = max/mean cluster size and
          ``empty_clusters``: routing imbalance (hot probe tasks).
        - ``duplication_ratio`` = rows / distinct ids: replayed
          appends.  >1 means ranked kNN output through this index is
          suspect until :meth:`compact` (or assigned(dedup=True)) —
          duplicates occupy extra ranks, unlike DedupIndex where
          replay costs storage only."""
        m = self.meta(spark)
        vdir = self._vdir(m["version"])
        cents = spark.read.parquet(f"{vdir}/centroids")
        vecs = self._vectors(spark, m)
        per = (
            vecs.join(F.broadcast(cents), "centroid_id")
            .groupBy("centroid_id")
            .agg(
                F.count("*").alias("n"),
                # ids assign deterministically, so a replayed id lands
                # in the SAME cluster: per-cluster distinct sums to the
                # global distinct without a second shuffle
                F.count_distinct(F.col(m["id_col"])).alias("d"),
                F.sum(
                    cosine(m["vec_col"], "cvec", m["exact_decimal"])
                ).alias("s"),
            )
            .collect()
        )
        n_cents = cents.count()
        n_rows = sum(r["n"] for r in per)
        n_ids = sum(r["d"] for r in per)
        mean_cos = (
            sum(r["s"] for r in per) / n_rows if n_rows else 0.0
        )
        sizes = [r["n"] for r in per]
        mean_sz = n_rows / n_cents if n_cents else 0.0
        drift = round(m["base_mean_cosine"] - mean_cos, 6)
        return {
            "version": m["version"],
            "n_rows": n_rows,
            "n_distinct_ids": n_ids,
            "duplication_ratio": (
                round(n_rows / n_ids, 4) if n_ids else 1.0
            ),
            "n_centroids": n_cents,
            "empty_clusters": n_cents - len(per),
            "max_cluster": max(sizes) if sizes else 0,
            "cluster_skew": (
                round(max(sizes) / mean_sz, 4) if sizes else 0.0
            ),
            "mean_cosine": round(mean_cos, 6),
            "base_mean_cosine": round(m["base_mean_cosine"], 6),
            "cosine_drift": drift,
            "stale": drift > stale_drift,
        }

    def compact(self, spark: SparkSession) -> None:
        """Write a new version with replayed-append duplicates dropped
        (exact-row dedup: replays are identical rows — two rows
        sharing an id but not a vector are a caller error this
        deliberately preserves rather than guessing a survivor).  The
        baseline mean cosine carries over UNCHANGED: duplicates enter
        numerator and denominator alike, so compaction never moves
        the drift signal — only rebuild() resets it.  New-version
        write + pointer flip, never an in-place overwrite."""
        m = self.meta(spark)
        vdir = self._vdir(m["version"])
        cents = spark.read.parquet(f"{vdir}/centroids")
        vecs = self._vectors(spark, m).dropDuplicates()
        new_v = m["version"] + 1
        ndir = self._vdir(new_v)
        cents.write.mode("overwrite").parquet(f"{ndir}/centroids")
        # cluster by the partition column (dropDuplicates shuffles on
        # ALL columns, so rows arrive scattered) — see _write_version
        vecs.repartition("centroid_id").write.mode(
            "overwrite"
        ).partitionBy("centroid_id").parquet(f"{ndir}/vectors")
        from covid19i2b2_spark.fsutil import one_partition_df

        one_partition_df(spark, [(
            m["id_col"], m["vec_col"], m["exact_decimal"], m["impl"],
            m["n_centroids"], m["base_mean_cosine"], m["seed"],
            m["vectors_schema"],
        )], _META_SCHEMA).write.mode("overwrite").parquet(
            f"{ndir}/meta"
        )
        self._flip(spark, new_v)

    def rebuild(
        self,
        spark: SparkSession,
        n_centroids: int | None = None,
        n_iter: int = 5,
        seed: int | None = None,
        sample_mod: int | None = None,
    ) -> None:
        """Retrain centroids over the CURRENT corpus (the answer to a
        stale health signal), re-assign everything, write a new
        version with a FRESH baseline.  Replay duplicates are dropped
        on the way (a rebuild is implicitly a compact).  Defaults keep
        the build-time n_centroids/seed."""
        from covid19i2b2_spark.operators.similarity import train_centroids

        m = self.meta(spark)
        corpus = self.assigned(spark, dedup=True).select(
            m["id_col"], m["vec_col"]
        )
        cents = train_centroids(
            corpus,
            m["id_col"],
            m["vec_col"],
            n_centroids if n_centroids is not None else m["n_centroids"],
            n_iter=n_iter,
            seed=seed if seed is not None else m["seed"],
            sample_mod=sample_mod,
        ).localCheckpoint(eager=True)
        assigned = ivf_assign(
            corpus, m["id_col"], m["vec_col"], cents,
            m["exact_decimal"], m["impl"],
        )
        self._write_version(
            spark,
            m["version"] + 1,
            cents,
            assigned,
            {
                "id_col": m["id_col"],
                "vec_col": m["vec_col"],
                "exact_decimal": m["exact_decimal"],
                "impl": m["impl"],
                "n_centroids": cents.count(),
                "seed": seed if seed is not None else m["seed"],
            },
        )
