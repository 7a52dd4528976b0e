"""X54: persisted incremental inverted index — repeated-query BM25
retrieval without per-query corpus scans (SURVEY §2.11 extension;
round 10).  ranking.bm25_rank is the one-shot form: one full corpus
pass per query, the minimum for AD-HOC exact BM25 and exactly wrong
for the interactive loop a curation team actually runs (hundreds of
targeted keyword probes against the same corpus).  This index moves
the corpus pass to BUILD time and makes each query's cost proportional
to its own terms' postings — and joins the engine's index family
(DedupIndex, FuzzyIndex, IvfIndex) with the same
build/append/stats/compact lifecycle.

Two parquet tables under one root:

- ``postings/``: (term, doc_id, dl, tf, positions) — one row per
  (term, document) with the term frequency, the document's token
  length denormalized in (8 bytes/posting buys probes freedom from
  any doc-length join), and the sorted 0-based position list (4
  bytes/occurrence — what makes :meth:`InvertedIndex.phrase_search`
  possible; BM25 probes never project it, so column pruning keeps it
  off their scans).
  Written range-partitioned AND sorted by term, so each file and row
  group covers a tight term range: a query's ``term IN (...)`` filter
  pushes into the parquet scan and skips everything else — the
  100 TB probe reads O(query postings), not O(corpus).
- ``stats/``: append-only batch deltas (batch_key, n_docs, sum_dl) —
  corpus size and mean doc length come from summing this tiny table,
  never from a corpus scan at query time.  ``batch_key`` is a
  content-derived fingerprint (bit_xor of xxhash64(doc_id) — the shard
  manifests' checksum pattern), so a REPLAYED append writes an
  identical delta row that compaction collapses, while distinct
  batches keep distinct rows.

Append/replay contract (the house at-least-once story): appends are
parquet appends of batch-sized deltas to both tables; a replayed
append duplicates posting rows AND their delta row CONSISTENTLY (both
sides inflate by the same batch, so n/avgdl stay consistent with the
postings).  Like IvfIndex — and unlike the anti-join-read dedup
indexes — duplication here is correctness-affecting: a duplicated
posting row doubles that (term, doc) contribution in the score fold.
``stats()`` surfaces the ratio, ``search(dedup=True)`` answers
correctly before the quiet window, ``compact()`` reclaims (the same
remediation triple the streaming health log names for the IVF index).

Scoring matches ranking.bm25_rank: whitespace ``tokens()`` (no case
folding — parity with the one-shot form), smoothed idf
ln(1 + (N - df + 0.5)/(df + 0.5)), per-doc fold over an array_sort'ed
(term, part) list — a DETERMINISTIC summation order, reproducible
across partitionings and engines (a bare SUM over the term rows would
be last-ulp order-dependent).  bm25_rank itself sums in query-term
order, so the two forms can differ in the last ulp when query_terms
isn't alphabetical; tests compare at round6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import tokens


def _postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toked = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    ).withColumn("dl", F.size("__toks").cast("long"))
    return (
        toked.select(
            "doc_id", "dl", F.posexplode("__toks").alias("__pos", "term")
        )
        .groupBy("term", "doc_id", "dl")
        .agg(
            F.count("*").cast("long").alias("tf"),
            # 0-based, sorted: the phrase-search adjacency fold walks
            # these; plain BM25 probes never project the column
            # (parquet column pruning keeps it off their scans)
            F.sort_array(
                F.collect_list(F.col("__pos").cast("int"))
            ).alias("positions"),
        )
    )


def _delta(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    ).agg(
        # bit_xor, not sum: order-independent, can't overflow under
        # ANSI, and the sinks' shard-manifest checksum pattern
        F.bit_xor(F.xxhash64("doc_id")).cast("long").alias("batch_key"),
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("__toks")).cast("long").alias("sum_dl"),
    )


class InvertedIndex:
    """Paths of a persisted BM25 index.  Tokenization (whitespace
    ``tokens()``) is the index identity — there are no per-build
    tokenizer knobs to mismatch; k1/b are QUERY-time parameters."""

    # the streaming health log reads this: duplicated postings double
    # their score contribution, so ANY duplication warrants the
    # correctness-cue WARNING (the IvfIndex severity), not the
    # storage-only COMPACT_RATIO wording the anti-join indexes get
    DUPLICATION_IS_CORRECTNESS = True

    # fragmentation trip point (VERDICT r10 #4): every append writes
    # its own repartitionByRange file set, so a term's probe touches
    # ~one file/row-group per appended batch even with ZERO replay —
    # past this many files per term the probe cost is
    # fragmentation-bound, not postings-bound, and compact() (which
    # rewrites ONE tight term-sorted file set) is the remedy.  4 =
    # the point where footer/seek overhead rivals a term's actual
    # posting bytes at typical batch sizes; the streaming health log
    # reads this constant.
    COMPACT_FILES_PER_TERM = 4

    def __init__(self, path: str):
        self.path = path.rstrip("/")

    @property
    def postings_path(self) -> str:
        return f"{self.path}/postings"

    @property
    def stats_path(self) -> str:
        return f"{self.path}/stats"

    def _write(self, df: DataFrame, id_col: str, text_col: str,
               mode: str) -> None:
        # range-partition + sort by term: tight per-file/row-group term
        # ranges make the probe's IN-filter skip everything but the
        # query's own postings (min/max pushdown)
        _postings(df, id_col, text_col).repartitionByRange(
            "term"
        ).sortWithinPartitions("term").write.mode(mode).parquet(
            self.postings_path
        )
        _delta(df, id_col, text_col).coalesce(1).write.mode(
            "append" if mode == "append" else "overwrite"
        ).parquet(self.stats_path)

    def build(self, docs: DataFrame, id_col: str, text_col: str) -> None:
        """Create the index from the initial corpus snapshot."""
        self._write(docs, id_col, text_col, "overwrite")

    def append(self, docs: DataFrame, id_col: str, text_col: str) -> None:
        """Fold a new document batch in: batch-sized parquet appends to
        both tables — no index rewrite, no re-read of prior postings.
        append ≡ one-shot build over the union (pinned by test).  Doc
        ids must be NEW (re-appending an id double-counts it exactly
        like every other index here — the caller dedups first; that is
        what DedupIndex is for).  The doc-id TYPE is index identity:
        appending a different type would corrupt the postings schema
        mid-table, so it is validated loudly against the persisted
        footer (one metadata read, no data scan)."""
        new_type = docs.schema[id_col].dataType
        try:
            existing = docs.sparkSession.read.parquet(
                self.postings_path
            ).schema["doc_id"].dataType
        except Exception:
            existing = None  # nothing persisted yet (or torn) — build path
        if existing is not None and existing != new_type:
            raise ValueError(
                f"append id type {new_type.simpleString()} != the index's "
                f"{existing.simpleString()} — the doc-id type is index "
                "identity (a mixed-type postings table is unreadable)"
            )
        self._write(docs, id_col, text_col, "append")

    def _corpus_stats(
        self, spark: SparkSession, dedup: bool = False
    ) -> tuple[int, float]:
        """(N, avgdl) from the delta table.  ``dedup=True`` collapses
        replayed delta rows first — replays write an IDENTICAL row (the
        content-derived batch_key), so dropDuplicates on the key
        restores one-shot-build N/avgdl exactly; without it a replayed
        append inflates N and shifts every idf and length norm
        (non-uniformly across terms), so dedup'd posting reads MUST
        pair with dedup'd stats for search(dedup=True) to reproduce
        the clean index's scores (ADVICE r10 #1)."""
        deltas = spark.read.parquet(self.stats_path)
        if dedup:
            deltas = deltas.dropDuplicates(["batch_key"])
        row = (
            deltas
            .agg(
                F.sum("n_docs").alias("n"),
                F.sum("sum_dl").alias("s"),
            )
            .collect()[0]
        )
        n = int(row["n"] or 0)
        return n, (float(row["s"]) / n if n else 0.0)

    def search(
        self,
        spark: SparkSession,
        query_terms: list[str],
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        dedup: bool = False,
    ) -> DataFrame:
        """Top-k (doc_id, bm25) for a bag of query terms — reads ONLY
        the query terms' postings (IN-filter pushed to the scan over
        the term-sorted layout) plus the tiny stats table; ties break
        to the lower doc_id (the bm25_rank contract).  ``dedup=True``
        drops replayed posting rows on the way in (one extra shuffle)
        AND collapses replayed stats deltas (identical batch_key rows),
        so it reproduces the clean index's scores EXACTLY — use when
        stats() shows duplication and compact() hasn't run."""
        if not query_terms:
            raise ValueError("query_terms must be non-empty")
        n, avgdl = self._corpus_stats(spark, dedup=dedup)
        post = spark.read.parquet(self.postings_path).filter(
            F.col("term").isin(list(query_terms))
        )
        if dedup:
            post = post.dropDuplicates()
        df = post.groupBy("term").agg(F.count("*").alias("__df"))
        scored = post.join(F.broadcast(df), "term")
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n)) - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
        tf = F.col("tf").cast("double")
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
        )
        part = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        # deterministic per-doc fold: sum in sorted (term, part) order
        # so the score never depends on shuffle arrival order
        folded = (
            scored.select("doc_id", F.struct("term", part.alias("p")).alias("__tp"))
            .groupBy("doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list("__tp")),
                    F.lit(0.0),
                    lambda acc, s: acc + s["p"],
                ).alias("__score")
            )
        )
        return (
            folded.select("doc_id", round6(F.col("__score")).alias("bm25"))
            .orderBy(F.col("bm25").desc(), "doc_id")
            .limit(k)
        )

    def search_many(
        self,
        queries: DataFrame,
        query_id_col: str = "query_id",
        terms_col: str = "terms",
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        dedup: bool = False,
    ) -> DataFrame:
        """X86 (round 12): BATCHED BM25 — top-k (query_id, doc_id,
        bm25, rank) for a whole DataFrame of queries in ONE plan.
        ``search`` is the single-query form; running it per query
        from a driver loop reads the postings once PER QUERY and
        serializes the jobs — this form reads the postings ONCE for
        the union of all queries' terms (the IN-pushdown becomes a
        broadcast semi-join against the distinct term set), scores
        every (query, doc) pair in one aggregate, and takes per-query
        top-k with a rank-pruned window (WindowGroupLimit — no global
        sort).  Per-query results are EXACTLY ``search``'s (same
        deterministic sorted-(term, part) fold, same round6, same
        lower-doc-id tie rule; repeated query terms dedupe — bag
        semantics, query-side tf ignored, matching ``search``'s
        isin).  The retrieval driver for decontamination sweeps: an
        eval SET against the corpus index, composing with knn_join
        (X52) under rrf_fuse (X81) for hybrid leakage checks."""
        spark = queries.sparkSession
        n, avgdl = self._corpus_stats(spark, dedup=dedup)
        q_terms = queries.select(
            F.col(query_id_col).alias("__qid"),
            F.explode(F.array_distinct(F.col(terms_col))).alias("term"),
        )
        post = spark.read.parquet(self.postings_path).join(
            F.broadcast(q_terms.select("term").distinct()),
            "term",
            "left_semi",
        )
        if dedup:
            post = post.dropDuplicates()
        df = post.groupBy("term").agg(F.count("*").alias("__df"))
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n)) - F.col("__df") + F.lit(0.5))
            / (F.col("__df") + F.lit(0.5))
        )
        tf = F.col("tf").cast("double")
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
        )
        part = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        scored = (
            post.join(F.broadcast(df), "term")
            .join(F.broadcast(q_terms), "term")
            .select(
                "__qid",
                "doc_id",
                F.struct("term", part.alias("p")).alias("__tp"),
            )
        )
        folded = scored.groupBy("__qid", "doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list("__tp")),
                F.lit(0.0),
                lambda acc, s: acc + s["p"],
            ).alias("__score")
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("bm25").desc(), F.col("doc_id")
        )
        return (
            folded.select(
                F.col("__qid").alias(query_id_col),
                "doc_id",
                round6(F.col("__score")).alias("bm25"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def phrase_search(
        self,
        spark: SparkSession,
        phrase_terms: list[str],
        k: int = 10,
        dedup: bool = False,
    ) -> DataFrame:
        """Exact-phrase retrieval: top-k (doc_id, n_occurrences) for a
        consecutive token sequence, OVERLAPPING occurrences counted
        ("batch batch batch" contains "batch batch" twice).  The
        adjacency fold is pure array expressions: start from the first
        term's position list and intersect each next term's list with
        the previous survivors shifted by one —

            S_1 = positions(t_1);  S_i = (S_{i-1} + 1) ∩ positions(t_i)

        |S_m| is the occurrence count.  Plan: the probe reads ONLY the
        phrase terms' postings (same IN-filter pushdown as search),
        then m-1 doc_id equi-joins each filtered to one term — every
        stage shrinks (a doc missing ANY term drops at its join;
        emptied survivor sets drop immediately), and nothing leaves
        the JVM.  Repeated terms in the phrase are handled by the same
        fold (the shift makes self-adjacency count correctly).
        ``dedup=True`` drops replayed posting rows first (replays
        duplicate join ROWS here rather than doubling a score)."""
        if len(phrase_terms) < 2:
            raise ValueError(
                "phrase_search needs >= 2 terms (use search() for one)"
            )
        post = spark.read.parquet(self.postings_path).filter(
            F.col("term").isin(list(set(phrase_terms)))
        )
        if dedup:
            post = post.dropDuplicates(["term", "doc_id"])
        cur = post.filter(F.col("term") == phrase_terms[0]).select(
            "doc_id", F.col("positions").alias("__surv")
        )
        for i, t in enumerate(phrase_terms[1:], 1):
            nxt = post.filter(F.col("term") == t).select(
                "doc_id", F.col("positions").alias(f"__p{i}")
            )
            cur = (
                cur.join(nxt, "doc_id")
                .select(
                    "doc_id",
                    F.array_intersect(
                        F.transform("__surv", lambda x: x + 1),
                        F.col(f"__p{i}"),
                    ).alias("__surv"),
                )
                .filter(F.size("__surv") > 0)
            )
        return (
            cur.select(
                "doc_id",
                F.size("__surv").cast("long").alias("n_occurrences"),
            )
            .orderBy(F.col("n_occurrences").desc(), "doc_id")
            .limit(k)
        )

    def stats(self, spark: SparkSession) -> dict:
        """Health signals on the house contract: persisted vs distinct
        row counts and the duplication ratio (replayed appends).  Here
        the ratio is a CORRECTNESS cue (duplicated postings double
        their (term, doc) score contribution) — search(dedup=True) or
        compact() before trusting ranked output, the IvfIndex rule.

        Fragmentation (VERDICT r10 #4): ``posting_files`` and the
        per-term file spread (``files_per_term_max`` / ``_avg``) from
        one (term, input_file_name) aggregate pass — every append
        writes its own file set, so probe cost degrades with APPEND
        COUNT even at duplication_ratio 1.0; past
        COMPACT_FILES_PER_TERM the health log cues compact() for
        fragmentation, the compact_parquet (X38) counter pattern."""
        post = spark.read.parquet(self.postings_path)
        deltas = spark.read.parquet(self.stats_path)
        p = post.agg(
            F.count("*").alias("n"),
            F.count_distinct(F.struct("term", "doc_id")).alias("d"),
        ).collect()[0]
        # ONE postings scan feeds both file metrics (ADVICE r11 #3 —
        # this probe runs inside the streaming loop): the distinct
        # (term, file) frame is tiny (n_terms × append count), so pin
        # it and derive the per-term spread and the global file count
        # from it instead of re-reading the whole index.
        tf = (
            post.select("term", F.input_file_name().alias("__f"))
            .distinct()
            .persist()
        )
        try:
            frag = (
                tf.groupBy("term")
                .agg(F.count("*").alias("__nf"))
                .agg(
                    F.max("__nf").alias("mx"),
                    F.avg("__nf").alias("av"),
                    F.count("*").alias("terms"),
                )
                .collect()[0]
            )
            n_files = tf.select("__f").distinct().count()
        finally:
            tf.unpersist()
        n_docs, avgdl = self._corpus_stats(spark)
        n_batches = deltas.count()
        n_distinct_batches = deltas.dropDuplicates(["batch_key"]).count()
        return {
            "posting_rows": p["n"],
            "posting_distinct": p["d"],
            "n_docs": n_docs,
            "avgdl": round(avgdl, 4),
            "batches": n_batches,
            "n_terms": frag["terms"],
            "posting_files": n_files,
            "files_per_term_max": int(frag["mx"] or 0),
            "files_per_term_avg": round(float(frag["av"] or 0.0), 4),
            "duplication_ratio": (
                round(p["n"] / p["d"], 4) if p["d"]
                else (1.0 if n_distinct_batches == n_batches else
                      round(n_batches / max(n_distinct_batches, 1), 4))
            ),
        }

    def compact(self, spark: SparkSession) -> None:
        """Drop replayed-append duplicates from both tables (replays
        write identical posting rows and an identical content-derived
        batch_key delta) — restores one-shot-build counts AND correct
        un-dedup'd search scores.  Frames pin (eager localCheckpoint)
        before overwriting the paths they read, FuzzyIndex.compact's
        pattern."""
        from covid19i2b2_spark.caching import release_local_checkpoint

        post = (
            spark.read.parquet(self.postings_path)
            .dropDuplicates(["term", "doc_id"])
            .localCheckpoint(eager=True)
        )
        deltas = (
            spark.read.parquet(self.stats_path)
            .dropDuplicates(["batch_key"])
            .localCheckpoint(eager=True)
        )
        post.repartitionByRange("term").sortWithinPartitions(
            "term"
        ).write.mode("overwrite").parquet(self.postings_path)
        deltas.coalesce(1).write.mode("overwrite").parquet(self.stats_path)
        release_local_checkpoint(post)
        release_local_checkpoint(deltas)
