"""Streaming corpus ingestion + curation (SURVEY §2.10/§2.11 north star).

The batch curation pipeline (pipelines/curation.py) assumes the corpus is
at rest; a crawl is not — documents land continuously.  This module runs
the per-document (stateless or stream-static) curation stages directly on
the stream, so quality filtering, blocklisting, PII redaction, exact-dup
rejection against the persisted index, and train/val/test routing all
happen AT INGEST, and only surviving documents ever hit the lake:

- quality rules / redaction / split tagging are map-only column
  expressions — trivially streaming-safe, no state, append mode;
- exact dedup against everything already ingested is a STREAM-STATIC
  left-anti join with the DedupIndex fingerprint table: the static side
  is re-read per micro-batch (picking up index appends between batches),
  the stream side never buffers state;
- near-dup (MinHash) needs cross-document state and stays in the
  micro-batch/batch layer (dedup_incremental.filter_batch via
  foreachBatch) — the split mirrors production systems: cheap hygiene
  inline, quadratic-candidate work batched.

Parity: stream output ≡ the same operators applied in batch, pinned in
tests/test_streaming.py.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from covid19i2b2_spark import schemas
from covid19i2b2_spark.operators.quality import blocklist_filter, gopher_signals
from covid19i2b2_spark.operators.sampling import hash_split
from covid19i2b2_spark.operators.text import fingerprint, redact_pii
from covid19i2b2_spark.session import ensure_runtime_conf
from covid19i2b2_spark.streaming.maintenance import log_index_health


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the documents parquet (stand-in for the crawl
    landing topic); same symlink-dir shape as daily_counts.stream_events."""
    ensure_runtime_conf(spark)
    src = os.path.realpath(os.path.join(sf_dir, "documents.parquet"))
    digest = hashlib.md5(src.encode()).hexdigest()[:16]
    stream_dir = os.path.join(tempfile.gettempdir(), f"covid19i2b2_docs_{digest}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "documents.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    return spark.readStream.schema(schemas.TESTDATA["documents"]).parquet(
        stream_dir
    )


def curate_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    known_fingerprints: DataFrame | None = None,
    blocked_sources: DataFrame | None = None,
    source_col: str = "source",
    min_words: int = 10,
    min_stop_hits: int = 2,
    min_alpha_word_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    splits: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Ingest-time curation over a document stream (works identically on
    a batch DataFrame — one code path, two execution modes):

    1. blocklist the source/domain (broadcast anti-join);
    2. reject exact dups vs ``known_fingerprints`` (stream-static
       left-anti on the md5 content fingerprint);
    3. Gopher quality rules — only ``passes`` docs continue;
    4. PII redaction on the surviving text;
    5. deterministic split tag (hash_split) for downstream routing.

    Returns (id, text[redacted], n_words, split) in append mode — no
    watermark needed, nothing stateful on the stream side."""
    out = docs
    if blocked_sources is not None:
        out = blocklist_filter(out, F.col(source_col), blocked_sources)
    out = out.withColumn("__fp", fingerprint(text_col))
    if known_fingerprints is not None:
        out = out.join(
            known_fingerprints.select(F.col("fingerprint").alias("__known")),
            out["__fp"] == F.col("__known"),
            "left_anti",
        )
    sig = gopher_signals(text_col)
    out = (
        out.withColumn("__sig", sig)
        .filter(
            (F.col("__sig.n_words") >= min_words)
            & (F.col("__sig.stop_hits") >= min_stop_hits)
            & (F.col("__sig.alpha_word_frac") > min_alpha_word_frac)
            & (F.col("__sig.symbol_ratio") < max_symbol_ratio)
        )
        .select(
            id_col,
            redact_pii(text_col).alias(text_col),
            F.col("__sig.n_words").alias("n_words"),
        )
    )
    return hash_split(out, id_col, splits or {"train": 0.9, "val": 0.1}, seed)


def _hadoop_fs(spark: SparkSession, path: str):
    from covid19i2b2_spark.fsutil import hadoop_fs

    return hadoop_fs(spark, path)


def run_streaming_ingest(
    docs_stream: DataFrame,
    index,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sim_threshold: float = 0.7,
    checkpoint_dir: str | None = None,
    bloom_fpp: float | None = None,
    stats_every: int | None = 16,
    search_index=None,
):
    """The production crawl-ingest loop end-to-end: each micro-batch is
    deduped within itself AND against everything previously ingested via
    the persisted DedupIndex (exact fingerprints + MinHash bands), the
    survivors land in the corpus parquet, and the index is updated — so
    the NEXT micro-batch dedups against this one too.

    foreachBatch is only at-least-once: a micro-batch can be REPLAYED
    after a retry or restart.  The writer makes the replay idempotent by
    keying everything on ``epoch_id``:

    - survivors write to ``out_path/epoch=<epoch_id>/`` with OVERWRITE —
      a replayed epoch replaces its own output instead of appending a
      duplicate copy (corpus contents are exactly-once);
    - a per-epoch marker file under the index root is written only after
      BOTH side effects; a replay of a marked epoch is skipped entirely;
    - the one remaining window (crash between ``index.append`` and the
      marker) can duplicate index ROWS, which is benign: the index is
      only read through anti-joins / DISTINCT candidates, so duplicates
      cost space, never correctness.

    Pass ``checkpoint_dir`` in production so Structured Streaming tracks
    epoch progress across restarts — genuine stop/restart recovery
    (resume past committed epochs, dedup new waves against the index,
    no-op on an empty restart) is exercised in
    tests/test_streaming.py::test_streaming_ingest_restart_recovery_with_checkpoint.
    Caller drives the returned query.  ``index`` is a :class:`DedupIndex`
    whose ``build`` has run (possibly on an empty corpus).

    ``bloom_fpp`` (round 7, X46): forwarded to ``filter_batch`` — in the
    steady state (corpus >> micro-batch, mostly-new rows) the Bloom
    membership gate prunes the vs-index join inputs map-side; results
    are byte-identical with it on or off (tests/test_bloom.py).

    ``stats_every`` (round 10, VERDICT r9 #5): every N completed
    epochs the loop logs ``index.stats()`` — plus the sharded-bloom
    load when that gate is active — at WARNING once duplication_ratio
    crosses streaming.maintenance.COMPACT_RATIO (1.5), the documented
    cue to schedule ``index.compact()`` during a quiet window.  None
    opts out; the probe never kills the ingest.

    ``search_index`` (round 10, X54): an
    :class:`~covid19i2b2_spark.operators.inverted_index.InvertedIndex`
    whose ``build`` has run — each epoch's SURVIVORS (the rows that
    passed dedup, i.e. exactly the corpus appends) also append to it,
    so the lake stays keyword-searchable as it grows.  The append sits
    INSIDE the same epoch marker as the corpus write: a replay of a
    marked epoch skips all three side effects, and the one crash
    window (between the appends and the marker) duplicates postings
    consistently with their stats delta — surfaced by the SAME
    periodic health log, remediated by search(dedup=True)/compact()
    (the correctness-cue semantics X54 documents).
    """

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fs, marker = _hadoop_fs(spark, f"{index.path}/_epochs/{epoch_id}")
        if fs.exists(marker):
            return  # epoch fully committed before — replayed batch
        survivors, _dropped = index.filter_batch(
            spark, batch_df, id_col, text_col, sim_threshold,
            bloom_fpp=bloom_fpp,
        )
        survivors = survivors.localCheckpoint(eager=True)  # pin before writes
        survivors.write.mode("overwrite").parquet(f"{out_path}/epoch={epoch_id}")
        index.append(survivors, id_col, text_col)
        if search_index is not None:
            search_index.append(survivors, id_col, text_col)
        fs.create(marker, True).close()
        index.release()  # free this epoch's caches/broadcasts (review r7)
        log_index_health(
            index, spark, epoch_id, stats_every, "run_streaming_ingest"
        )
        if search_index is not None:
            log_index_health(
                search_index, spark, epoch_id, stats_every,
                "run_streaming_ingest[search]",
            )

    writer = docs_stream.writeStream.foreachBatch(_ingest).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def stream_crawl_lines(spark: SparkSession, dirpath: str) -> DataFrame:
    """Raw crawl JSONL landing zone as a bounded file stream — one
    ``value`` line per record, schema applied downstream (the parse is
    the ingest loop's job, because malformed lines must route to
    quarantine, not kill the source)."""
    return spark.readStream.text(dirpath)


def run_streaming_crawl_ingest(
    lines_stream: DataFrame,
    schema,
    index,
    out_path: str,
    quarantine_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sim_threshold: float = 0.7,
    checkpoint_dir: str | None = None,
    bloom_fpp: float | None = None,
    stats_every: int | None = 16,
    search_index=None,
):
    """:func:`run_streaming_ingest` fed from RAW crawl JSONL: each
    micro-batch of lines parses with the quarantine split
    (sources/files.py semantics — PERMISSIVE from_json, malformed and
    half-parsed lines keep their raw text), bad lines land in
    ``quarantine_path/epoch=<id>/`` and good rows flow into the same
    dedup-filter -> corpus-append -> index-append loop.

    Same replay discipline as run_streaming_ingest, extended to the
    quarantine: all three side effects are epoch-keyed OVERWRITE writes
    behind one commit marker, so a replayed micro-batch converges to
    identical corpus AND quarantine contents.  ``stats_every`` and
    ``search_index``: the same periodic index-health log and X54
    co-maintenance as run_streaming_ingest (survivors append to the
    search index inside the same marker)."""
    from pyspark.sql import functions as F

    from covid19i2b2_spark.sources.files import _parse_and_route

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        fs, marker = _hadoop_fs(
            spark, f"{index.path}/_epochs/crawl_{epoch_id}"
        )
        if fs.exists(marker):
            return  # replayed, fully committed before
        good, bad = _parse_and_route(
            batch_df,
            schema,
            "_corrupt_record",
            lambda full, opts: F.from_json("value", full, opts),
            {},
        )
        bad.write.mode("overwrite").parquet(
            f"{quarantine_path}/epoch={epoch_id}"
        )
        survivors, _dropped = index.filter_batch(
            spark, good, id_col, text_col, sim_threshold,
            bloom_fpp=bloom_fpp,
        )
        survivors = survivors.localCheckpoint(eager=True)
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/epoch={epoch_id}"
        )
        index.append(survivors, id_col, text_col)
        if search_index is not None:
            search_index.append(survivors, id_col, text_col)
        fs.create(marker, True).close()
        index.release()  # free this epoch's caches/broadcasts (review r7)
        log_index_health(
            index, spark, epoch_id, stats_every,
            "run_streaming_crawl_ingest",
        )
        if search_index is not None:
            log_index_health(
                search_index, spark, epoch_id, stats_every,
                "run_streaming_crawl_ingest[search]",
            )

    writer = lines_stream.writeStream.foreachBatch(_ingest).trigger(
        availableNow=True
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
