"""X51: incremental fuzzy-match index — entity resolution across
batches (SURVEY §2.11 extension; the persisted/append form of X48,
exactly as dedup_incremental.DedupIndex operationalizes X2's minhash).

The workload: a canonical entity table (author names, site titles,
source domains) grows batch by batch; each new batch's dirty strings
must be matched against EVERYTHING canonical so far within an edit
budget, without re-scanning prior batches, and unmatched strings
become new canonical entries.

The index is two parquet tables under one root:

- ``grams/``: (gram, id, s) — each canonical string's k*d+1 PREFIX
  grams (operators/fuzzy.py ``_prefix_grams``; the ED-Join bound).
  Matching equi-joins the batch's prefix grams against it — candidate
  volume independent of string length, and the INDEX is bounded at
  k*d+1 rows per canonical string.
- ``shorts/``: (id, s) — strings below the gram-guarantee cutoff
  (len < k*(d-1)+2), cross-checked against the batch's shorts (the
  zero-shared-gram pairs; both pools bounded by construction and
  guarded).  Long-index x short-batch pairs stay covered by the gram
  join: the prefix-filter guarantee needs only the LONGER side over
  the cutoff, and a short side's prefix IS its full gram set.

Same completeness contract as fuzzy_pairs — every pair the brute-force
cross join finds (pinned in tests against brute force over the index
contents).  Parameters (max_dist, k) are index identity: querying with
different settings than the build silently misses matches, so they are
constructor arguments, not per-call options.

Appends are parquet APPENDS of batch-sized deltas; a replayed append
duplicates gram rows, which costs storage but never correctness (pair
candidates are dropDuplicates'd before verify) — :meth:`FuzzyIndex.stats`
surfaces the duplication ratio and :meth:`FuzzyIndex.compact` rebuilds
the tables back to one-shot-build row counts (VERDICT r8 #3).  Nothing
is broadcast or collected; the gram join streams through one shuffle
like DedupIndex's band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark.operators.fuzzy import _prefix_grams


class FuzzyIndex:
    """Paths + parameters of a persisted fuzzy-match index.

    ``short_cap`` bounds BOTH short-string pools at match time (the
    batch's and the persisted index's): the below-cutoff cross pool is
    quadratic by design, so a degenerate corpus (everything shorter
    than k*(d-1)+2) must fail LOUDLY instead of running an unannounced
    n² join — the same contract as fuzzy_pairs.short_cap (VERDICT r8
    #2/what's-wrong)."""

    def __init__(
        self,
        path: str,
        max_dist: int = 1,
        k: int = 2,
        short_cap: int = 100_000,
    ):
        if max_dist < 1:
            raise ValueError(f"max_dist must be >= 1, got {max_dist}")
        if k < 2:
            raise ValueError(f"k must be >= 2, got {k}")
        if short_cap < 1:
            raise ValueError(f"short_cap must be >= 1, got {short_cap}")
        self.path = path.rstrip("/")
        self.max_dist = max_dist
        self.k = k
        self.short_cap = short_cap

    @property
    def grams_path(self) -> str:
        return f"{self.path}/grams"

    @property
    def shorts_path(self) -> str:
        return f"{self.path}/shorts"

    @property
    def _cutoff(self) -> int:
        return self.k * (self.max_dist - 1) + 2

    def _entries(
        self, df: DataFrame, id_col: str, text_col: str
    ) -> tuple[DataFrame, DataFrame]:
        base = df.select(
            F.col(id_col).alias("id"), F.col(text_col).alias("s")
        ).filter(F.col("s").isNotNull())
        grams = base.select(
            F.explode(
                _prefix_grams(F.col("s"), self.k, self.max_dist)
            ).alias("gram"),
            "id",
            "s",
        )
        shorts = base.filter(F.length("s") < self._cutoff)
        return grams, shorts

    def build(self, df: DataFrame, id_col: str, text_col: str) -> None:
        """Create/overwrite the index from the canonical seed set.
        ``id_col`` must be unique and non-NULL."""
        grams, shorts = self._entries(df, id_col, text_col)
        grams.write.mode("overwrite").parquet(self.grams_path)
        shorts.write.mode("overwrite").parquet(self.shorts_path)

    def append(self, df: DataFrame, id_col: str, text_col: str) -> None:
        """Fold new canonical rows in — batch-sized parquet appends."""
        grams, shorts = self._entries(df, id_col, text_col)
        grams.write.mode("append").parquet(self.grams_path)
        shorts.write.mode("append").parquet(self.shorts_path)

    def stats(self, spark: SparkSession) -> dict:
        """Health signals (VERDICT r8 #3): persisted row counts, the
        distinct counts a one-shot build would hold, and the resulting
        duplication ratio — the caller's cue to :meth:`compact` (the
        analog of the bloom tables' fill_ratio).  Row duplication comes
        only from replayed appends (at-least-once ingest), so ratio
        1.0 = no replays ever.  Two aggregate jobs over index-sized
        tables; run it on a maintenance cadence, not per batch."""
        grams = spark.read.parquet(self.grams_path)
        shorts = spark.read.parquet(self.shorts_path)
        g = grams.agg(
            F.count("*").alias("n"),
            F.count_distinct(F.struct("gram", "id", "s")).alias("d"),
        ).collect()[0]
        s = shorts.agg(
            F.count("*").alias("n"),
            F.count_distinct(F.struct("id", "s")).alias("d"),
        ).collect()[0]
        return {
            "grams_rows": g["n"],
            "grams_distinct": g["d"],
            "shorts_rows": s["n"],
            "shorts_distinct": s["d"],
            "short_cap": self.short_cap,
            "duplication_ratio": (
                round((g["n"] + s["n"]) / (g["d"] + s["d"]), 4)
                if (g["d"] + s["d"])
                else 1.0
            ),
        }

    def compact(self, spark: SparkSession) -> None:
        """Rebuild grams/ and shorts/ dropping replay duplicates
        (VERDICT r8 #3): restores one-shot-build row counts with
        byte-identical match results (candidates were already
        dropDuplicates'd, so compaction changes storage and join
        volume, never answers).  The deduped frames are PINNED
        (eager localCheckpoint) before the overwrite — Spark cannot
        lazily read a path it is replacing — and released once the
        writes return."""
        from covid19i2b2_spark.caching import release_local_checkpoint

        grams = (
            spark.read.parquet(self.grams_path)
            .dropDuplicates(["gram", "id", "s"])
            .localCheckpoint(eager=True)
        )
        shorts = (
            spark.read.parquet(self.shorts_path)
            .dropDuplicates(["id", "s"])
            .localCheckpoint(eager=True)
        )
        grams.write.mode("overwrite").parquet(self.grams_path)
        shorts.write.mode("overwrite").parquet(self.shorts_path)
        release_local_checkpoint(grams)
        release_local_checkpoint(shorts)

    def match_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        id_col: str,
        text_col: str,
    ) -> DataFrame:
        """(batch_id, index_id, dist): EVERY canonical string within
        ``max_dist`` of each batch string (complete; take min-dist
        per batch_id downstream if one best match is wanted —
        :meth:`resolve_batch` does).  Batch ids needn't be distinct
        from index ids; the pair columns keep the two namespaces
        apart.

        Both short pools are count-guarded against ``short_cap``
        BEFORE the cross join (VERDICT r8 #2): the index pool grows
        monotonically across appends, so without the guard a
        degenerate corpus goes quadratic silently batch after batch."""
        bgrams, bshorts = self._entries(batch, id_col, text_col)
        igrams = spark.read.parquet(self.grams_path)
        ishorts = spark.read.parquet(self.shorts_path)
        for side, nm in ((bshorts, "batch"), (ishorts, "index")):
            n = side.limit(self.short_cap + 1).count()
            if n > self.short_cap:
                raise ValueError(
                    f"FuzzyIndex.match_batch: more than short_cap="
                    f"{self.short_cap} {nm}-side strings shorter than "
                    f"{self._cutoff} chars — the short-string cross pool "
                    f"would go quadratic; raise short_cap deliberately, "
                    f"pre-filter, or rebuild the index without the "
                    f"degenerate strings (stats() reports the persisted "
                    f"pool size)"
                )
        blocked = bgrams.select(
            "gram",
            F.col("id").alias("batch_id"),
            F.col("s").alias("__sb"),
        ).join(
            igrams.select(
                "gram",
                F.col("id").alias("index_id"),
                F.col("s").alias("__si"),
            ),
            "gram",
        ).drop("gram")
        shorts = bshorts.select(
            F.col("id").alias("batch_id"), F.col("s").alias("__sb")
        ).crossJoin(
            ishorts.select(
                F.col("id").alias("index_id"), F.col("s").alias("__si")
            )
        )
        dist = F.levenshtein("__sb", "__si", self.max_dist)
        return (
            blocked.unionByName(shorts)
            .dropDuplicates(["batch_id", "index_id"])
            .filter(
                (F.abs(F.length("__sb") - F.length("__si")) <= self.max_dist)
                & (dist >= 0)
            )
            .select("batch_id", "index_id", dist.alias("dist"))
        )

    def resolve_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        id_col: str,
        text_col: str,
        append_new: bool = True,
        cache_handles: list | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """Full entity-resolution step: returns ``(new_entities,
        assignments)``.

        - ``assignments``: one row per batch row — (batch_id,
          canonical_id, dist).  Rows matching the index map to their
          BEST canonical entry (min dist, then min index_id —
          deterministic); unmatched rows resolve within the batch by
          fuzzy self-match with min-id survivors (two new spellings of
          the same new entity collapse to one canonical id), and the
          survivors map to themselves at dist 0.
        - ``new_entities``: the survivor rows (full batch columns) —
          the batch's genuinely new canonical entries, appended to the
          index unless ``append_new=False``.

        The returned frames are materialized (the survivors must be
        pinned before the append mutates the index under them — the
        DedupIndex.filter_batch discipline); with ``cache_handles``
        their checkpoint handles are appended for deterministic release
        once consumed (the VERDICT r7 #6 protocol)."""
        from covid19i2b2_spark.caching import CheckpointHandle
        from covid19i2b2_spark.operators.dedup_clusters import dedup_decision
        from covid19i2b2_spark.operators.fuzzy import fuzzy_pairs

        matches = self.match_batch(spark, batch, id_col, text_col)
        best = matches.groupBy("batch_id").agg(
            F.min(F.struct("dist", "index_id")).alias("b")
        ).select(
            "batch_id",
            F.col("b.index_id").alias("canonical_id"),
            F.col("b.dist").alias("dist"),
        )
        unmatched = batch.join(
            best.select(F.col("batch_id").alias(id_col)), id_col, "left_anti"
        )
        pairs = fuzzy_pairs(
            unmatched,
            id_col,
            text_col,
            self.max_dist,
            self.k,
            short_cap=self.short_cap,
            cache_handles=cache_handles,
        )
        decision = dedup_decision(
            unmatched.select(id_col), pairs, id_col,
            cache_handles=cache_handles,
        )
        survivors = unmatched.join(
            decision.filter(F.col("keep")).select(id_col), id_col, "left_semi"
        ).localCheckpoint(eager=True)
        within = decision.select(
            F.col(id_col).alias("batch_id"),
            F.col("component").alias("canonical_id"),
        ).withColumn(
            # within-batch spellings are within max_dist of their
            # survivor BY EDGE, not necessarily pairwise — report the
            # verified distance for survivor self-rows only, NULL for
            # collapsed spellings (their edge dist is in `pairs`)
            "dist",
            F.when(
                F.col("batch_id") == F.col("canonical_id"), F.lit(0)
            ).cast("int"),
        )
        assignments = best.unionByName(within).localCheckpoint(eager=True)
        if cache_handles is not None:
            cache_handles.append(CheckpointHandle(survivors))
            cache_handles.append(CheckpointHandle(assignments))
        if append_new:
            self.append(survivors, id_col, text_col)
        return survivors, assignments
