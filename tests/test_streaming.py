"""Streaming parity (SURVEY §5.2 item 5): the availableNow streaming run
over the bounded events data must equal the batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.sources.tables import read_table
from covid19i2b2_spark.streaming import (
    daily_event_counts,
    dedup_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    stream_events,
)
from tests.conftest import SF_DIR


def test_daily_counts_stream_matches_batch(spark):
    stream = stream_events(spark, SF_DIR)
    assert stream.isStreaming
    got = run_available_now(daily_event_counts(stream), "t_daily").collect()
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(0)
            ).alias("n_purchases"),
        )
        .collect()
    )
    got_m = {r.event_date: (r.n_events, r.n_purchases) for r in got}
    batch_m = {r.event_date: (r.n_events, r.n_purchases) for r in batch}
    assert got_m == batch_m
    # approx_users within 5% of exact
    exact = {
        r.event_date: r.n
        for r in read_table(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in got:
        assert abs(r.approx_users - exact[r.event_date]) <= max(
            2, 0.05 * exact[r.event_date]
        )


def test_sliding_and_session_windows_run(spark):
    stream = stream_events(spark, SF_DIR)
    slid = run_available_now(sliding_counts(stream), "t_slide").collect()
    assert len(slid) > 0
    # every event lands in length/slide windows: total count = 7 * n_events
    n_events = read_table(spark, SF_DIR, "events").count()
    assert sum(r.n_events for r in slid) == 7 * n_events
    sess = run_available_now(session_counts(stream_events(spark, SF_DIR)), "t_sess")
    rows = sess.collect()
    assert sum(r.n_events for r in rows) == n_events  # partition of events


def test_incremental_positive_counts_matches_batch(spark):
    """ST5/foreachBatch: after draining the bounded stream, the running
    merge target equals the batch per-day positive counts."""
    from covid19i2b2_spark.streaming.incremental import (
        RunningTable,
        incremental_positive_counts,
    )

    target = RunningTable(spark, ["event_date"])
    q = incremental_positive_counts(stream_events(spark, SF_DIR), target)
    q.awaitTermination()
    got = {r.event_date: r.n_positive for r in target.df.collect()}
    batch = {
        r.event_date: r.n
        for r in read_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "signup")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch


def test_stateful_user_totals(spark):
    """X6 applyInPandasWithState: per-user running totals over the
    bounded stream equal the batch aggregation."""
    from covid19i2b2_spark.streaming.incremental import stateful_user_totals

    out = run_available_now(
        stateful_user_totals(stream_events(spark, SF_DIR)),
        "t_state",
        output_mode="update",
    ).collect()
    # update mode may emit a row per micro-batch per user; keep the last
    got = {r.user_id: (r.n_events, round(r.total_value, 2)) for r in out}
    batch = {
        r.user_id: (r.n, round(r.s, 2))
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == batch


def test_stream_dedup(spark):
    stream = dedup_stream(stream_events(spark, SF_DIR))
    out = run_available_now(
        stream.select("event_id"), "t_dedup"
    ).collect()
    n = read_table(spark, SF_DIR, "events").count()
    assert len(out) == n  # event_id already unique; dedup must not drop


def test_streaming_cohort_matches_batch(spark):
    """VERDICT r1 #6: the stream-stream-join-maintained cohort equals the
    batch CovidPipeline cohort() on the same events — admissions from the
    watermarked positive-test ⋈ visit join, enrichment through the SAME
    batch code path (enrich_admissions)."""
    from covid19i2b2_spark.pipelines import adapter
    from covid19i2b2_spark.pipelines.covid import CovidConfig, CovidPipeline
    from covid19i2b2_spark.streaming.cohort import (
        cohort_from_pairs,
        run_streaming_cohort,
    )

    pairs, pos_feed = run_streaming_cohort(spark, SF_DIR, name="t_cohort")
    stream_adm = cohort_from_pairs(pairs, pos_feed)

    pipe = CovidPipeline(
        CovidConfig(),
        adapter.observation_fact(spark, SF_DIR),
        adapter.patient_dimension(spark, SF_DIR),
        adapter.visit_dimension(spark, SF_DIR),
    )
    stream_cohort = sorted(
        map(tuple, pipe.enrich_admissions(stream_adm).collect())
    )
    batch_cohort = sorted(map(tuple, pipe.cohort().collect()))
    assert stream_cohort == batch_cohort
    assert len(batch_cohort) > 0


def test_streaming_curation_matches_batch(spark):
    """curate_stream over the file stream ≡ the same operator chain on
    the batch read — one code path, two execution modes.  Exercises the
    stream-static anti-join (fingerprint index), the broadcast blocklist,
    the map-only quality/redaction stages, and split routing."""
    from covid19i2b2_spark.operators.text import fingerprint
    from covid19i2b2_spark.streaming.curation import (
        curate_stream,
        stream_documents,
    )

    docs = read_table(spark, SF_DIR, "documents")
    # "already ingested": every even doc's content fingerprint
    known = (
        docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
        .select(fingerprint("text").alias("fingerprint"))
        .distinct()
    )
    # synthetic corpus draws from a ~40-word vocab containing only one
    # Gopher must-have stopword -> relax the prose thresholds
    blocked = spark.createDataFrame([("src0",), ("src7",)], "value string")
    kwargs = dict(
        known_fingerprints=known,
        blocked_sources=blocked,
        min_stop_hits=1,
    )

    got = run_available_now(
        curate_stream(stream_documents(spark, SF_DIR), **kwargs), "t_curate"
    ).collect()
    want = curate_stream(docs, **kwargs).collect()
    assert len(want) > 0
    assert sorted((r.doc_id, r.text, r.n_words, r.split) for r in got) == sorted(
        (r.doc_id, r.text, r.n_words, r.split) for r in want
    )
    # blocked sources and known fingerprints really were rejected
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    got_ids = {r.doc_id for r in got}
    assert all(src[i] not in ("src0", "src7") for i in got_ids)
    assert all(i % 2 == 1 for i in got_ids)


def test_streaming_ingest_updates_index_and_corpus(spark, tmp_path):
    """run_streaming_ingest: micro-batches dedup against the persisted
    index (exact + near), survivors land in the corpus parquet, and the
    index is updated — equals the batch filter_batch over the same input."""
    from covid19i2b2_spark.operators.dedup_incremental import DedupIndex
    from covid19i2b2_spark.streaming.curation import (
        run_streaming_ingest,
        stream_documents,
    )

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") < 250)

    idx_stream = DedupIndex(str(tmp_path / "idx_stream"))
    idx_stream.build(first, "doc_id", "text")
    out_path = str(tmp_path / "corpus")
    q = run_streaming_ingest(
        stream_documents(spark, SF_DIR).select("doc_id", "text"),
        idx_stream,
        out_path,
    )
    q.awaitTermination()
    got = {r.doc_id for r in spark.read.parquet(out_path).collect()}

    idx_batch = DedupIndex(str(tmp_path / "idx_batch"))
    idx_batch.build(first, "doc_id", "text")
    survivors, _ = idx_batch.filter_batch(spark, docs, "doc_id", "text")
    want = {r.doc_id for r in survivors.collect()}

    assert got == want and len(got) > 0
    # already-ingested docs were rejected as exact dups
    assert all(i >= 250 for i in got)
    # the index grew: a replay of the same batch now drops everything
    survivors2, _ = idx_stream.filter_batch(spark, docs, "doc_id", "text")
    assert survivors2.count() == 0
    # at-least-once replay safety: restarting the query without a
    # checkpoint re-delivers the same files as epoch 0, whose commit
    # marker exists — the batch is skipped, the corpus is unchanged
    q2 = run_streaming_ingest(
        stream_documents(spark, SF_DIR).select("doc_id", "text"),
        idx_stream,
        out_path,
    )
    q2.awaitTermination()
    assert {r.doc_id for r in spark.read.parquet(out_path).collect()} == got

    # bloom-gated loop (round 7, X46): same input + fresh index with the
    # Bloom pre-filter on must ingest the identical survivor set
    idx_bloom = DedupIndex(str(tmp_path / "idx_bloom"))
    idx_bloom.build(first, "doc_id", "text")
    out_bloom = str(tmp_path / "corpus_bloom")
    qb = run_streaming_ingest(
        stream_documents(spark, SF_DIR).select("doc_id", "text"),
        idx_bloom,
        out_bloom,
        bloom_fpp=0.01,
    )
    qb.awaitTermination()
    assert {r.doc_id for r in spark.read.parquet(out_bloom).collect()} == got


def test_incremental_distinct_user_sketches_match_batch(spark):
    """Streaming HLL store: after draining the bounded stream, per-day
    sketch estimates equal the batch-built store's exactly (same sketch
    algorithm over the same values), and re-merging a batch's sketches
    (a foreachBatch replay) leaves every estimate unchanged — HLL union
    is set-idempotent."""
    from covid19i2b2_spark.operators.sketches import (
        build_distinct_sketches,
        rollup_distinct_sketches,
    )
    from covid19i2b2_spark.streaming.incremental import (
        RunningSketchStore,
        incremental_distinct_users,
    )

    target = RunningSketchStore(spark)
    q = incremental_distinct_users(stream_events(spark, SF_DIR), target)
    q.awaitTermination()
    got = {
        r["day"]: r["approx_distinct"]
        for r in rollup_distinct_sketches(
            target.df.withColumn("n_rows", F.lit(0)), ["day"]
        ).collect()
    }
    ev = read_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    batch = {
        r["day"]: r["approx_distinct"]
        for r in rollup_distinct_sketches(
            build_distinct_sketches(ev, ["day"], "user_id"), ["day"]
        ).collect()
    }
    assert got == batch
    # replay idempotence: union-merging the whole store into itself
    # changes no estimate
    target.merge(target.df.select("day", "sketch"))
    again = {
        r["day"]: r["approx_distinct"]
        for r in rollup_distinct_sketches(
            target.df.withColumn("n_rows", F.lit(0)), ["day"]
        ).collect()
    }
    assert again == got


def test_incremental_topk_store_brackets_batch_counts(spark):
    """Streaming frequent-items store: after draining the bounded
    document stream, every stored item's [count_lo, count_hi] brackets
    its true corpus count, every token above the residual bound is
    present, and a replayed epoch (same epoch_id) is a no-op — the
    store's epoch guard makes the non-idempotent SpaceSaving merge
    effectively exactly-once."""
    from covid19i2b2_spark.operators.sketches import topk_estimates
    from covid19i2b2_spark.operators.text import tokens as tok_col
    from covid19i2b2_spark.streaming.curation import stream_documents
    from covid19i2b2_spark.streaming.incremental import (
        RunningTopkStore,
        incremental_topk_tokens,
    )

    target = RunningTopkStore(spark, ["source"], k=16)
    q = incremental_topk_tokens(stream_documents(spark, SF_DIR), target)
    q.awaitTermination()
    assert target.df is not None and len(target._epochs) >= 1

    est = topk_estimates(target.df).collect()
    toks = (
        read_table(spark, SF_DIR, "documents")
        .select("source", F.explode(tok_col(F.lower("text"))).alias("token"))
    )
    exact = {
        (r["source"], r["token"]): r["n"]
        for r in toks.groupBy("source", "token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    bounds = {r["source"]: r["bound"] for r in target.df.collect()}
    present = set()
    for r in est:
        true = exact[(r["source"], r["item"])]
        assert r["count_lo"] <= true <= r["count_hi"], (r, true)
        present.add((r["source"], r["item"]))
    for (src, tok), true in exact.items():
        if true > bounds[src]:
            assert (src, tok) in present, (src, tok, true)

    # replayed epoch: merging any already-seen epoch changes nothing
    before = sorted(
        (r["source"], r["item"], r["count_lo"], r["count_hi"]) for r in est
    )
    target.merge(target.df, epoch_id=next(iter(target._epochs)))
    after = sorted(
        (r["source"], r["item"], r["count_lo"], r["count_hi"])
        for r in topk_estimates(target.df).collect()
    )
    assert before == after


def test_incremental_quantile_store_equals_batch(spark):
    """Streaming DDSketch store: after draining the bounded stream the
    merged histograms EQUAL the batch-built store (count-sum merge is
    exact), and a replayed epoch is a no-op via the epoch guard."""
    from covid19i2b2_spark.operators.sketches import build_quantile_sketches
    from covid19i2b2_spark.streaming.incremental import (
        RunningQuantileStore,
        incremental_value_quantiles,
    )

    target = RunningQuantileStore(spark, ["day"])
    q = incremental_value_quantiles(stream_events(spark, SF_DIR), target)
    q.awaitTermination()
    got = {r["day"]: (r["buckets"], r["n_rows"]) for r in target.df.collect()}
    ev = read_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    want = {
        r["day"]: (r["buckets"], r["n_rows"])
        for r in build_quantile_sketches(ev, ["day"], "value").collect()
    }
    assert got == want
    before = got
    target.merge(target.df, epoch_id=next(iter(target._epochs)))
    after = {r["day"]: (r["buckets"], r["n_rows"]) for r in target.df.collect()}
    assert after == before


def test_streaming_crawl_ingest_routes_quarantine(spark, tmp_path):
    """Raw-JSONL crawl ingest: malformed lines land epoch-keyed in the
    quarantine, good lines dedup against the index and land in the
    corpus, and a replayed run (same files, marker present) changes
    neither."""
    from pyspark.sql.types import LongType, StringType, StructType

    from covid19i2b2_spark.operators.dedup_incremental import DedupIndex
    from covid19i2b2_spark.streaming.curation import (
        run_streaming_crawl_ingest,
        stream_crawl_lines,
    )

    land = tmp_path / "landing"
    land.mkdir()
    (land / "shard0.jsonl").write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "alpha beta gamma delta"}',
                '{"doc_id": 2, "text": "alpha beta gamma delta"}',  # dup
                "BROKEN LINE",
                '{"doc_id": 3, "text": "unique words here entirely"}',
                '{"doc_id": "x", "text": "bad id type"}',
            ]
        )
    )
    schema = (
        StructType().add("doc_id", LongType()).add("text", StringType())
    )
    idx = DedupIndex(str(tmp_path / "idx"))
    idx.build(
        spark.createDataFrame([], "doc_id long, text string"),
        "doc_id",
        "text",
    )
    out, quar = str(tmp_path / "corpus"), str(tmp_path / "quarantine")
    q = run_streaming_crawl_ingest(
        stream_crawl_lines(spark, str(land)), schema, idx, out, quar
    )
    q.awaitTermination()

    corpus = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert corpus == {1, 3}  # 2 deduped away, bad lines quarantined
    raws = [r["raw_line"] for r in spark.read.parquet(quar).collect()]
    assert len(raws) == 2
    assert any("BROKEN" in r for r in raws)

    # replay: marker skips the epoch, contents unchanged
    q2 = run_streaming_crawl_ingest(
        stream_crawl_lines(spark, str(land)), schema, idx, out, quar
    )
    q2.awaitTermination()
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == corpus
    assert spark.read.parquet(quar).count() == 2


def test_streaming_ingest_restart_recovery_with_checkpoint(spark, tmp_path):
    """Round-5 (VERDICT r4 #7): a REAL restart across a
    checkpointLocation — run the ingest stream, stop it, land new files
    (including duplicates of already-ingested docs), restart with the
    same checkpoint.  Structured Streaming must resume past the
    committed epochs (no re-delivery), the new batch must dedup against
    the persisted index, and a third restart with nothing new must be a
    no-op: no duplicate and no lost epochs in corpus or index."""
    from covid19i2b2_spark.operators.dedup_incremental import DedupIndex
    from covid19i2b2_spark.streaming.curation import run_streaming_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_path = str(tmp_path / "corpus")

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    batch_a = docs.filter(F.col("doc_id") < 100)
    batch_a.coalesce(1).write.parquet(str(landing / "wave1"))

    schema = batch_a.schema
    idx = DedupIndex(str(tmp_path / "idx"))
    idx.build(spark.createDataFrame([], schema), "doc_id", "text")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(landing))
        )
        return run_streaming_ingest(
            stream, idx, out_path, checkpoint_dir=ckpt
        )

    # batch-side mirror: the same filter sequence without streaming
    idx_batch = DedupIndex(str(tmp_path / "idx_batch"))
    idx_batch.build(spark.createDataFrame([], schema), "doc_id", "text")

    q1 = start()
    q1.awaitTermination()
    after1 = {r.doc_id for r in spark.read.parquet(out_path).collect()}
    exp1_df, _ = idx_batch.filter_batch(spark, batch_a, "doc_id", "text")
    exp1_df = exp1_df.localCheckpoint(eager=True)
    idx_batch.append(exp1_df, "doc_id", "text")
    exp1 = {r.doc_id for r in exp1_df.collect()}
    assert after1 == exp1 and len(after1) > 0

    # wave 2: new docs 100-149 plus EXACT duplicates of wave-1 docs
    batch_b_new = docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 150)
    )
    dup_of_a = batch_a.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    batch_b_new.unionByName(dup_of_a).coalesce(1).write.parquet(
        str(landing / "wave2")
    )

    q2 = start()
    q2.awaitTermination()
    spark.catalog.refreshByPath(out_path)
    after2 = {r.doc_id for r in spark.read.parquet(out_path).collect()}
    wave2 = batch_b_new.unionByName(dup_of_a)
    exp2_df, _ = idx_batch.filter_batch(spark, wave2, "doc_id", "text")
    exp2 = {r.doc_id for r in exp2_df.collect()}
    # resumed past wave 1 (ids appear exactly once — no re-delivery),
    # new docs ingested, renamed exact duplicates rejected by the index
    rows2 = spark.read.parquet(out_path).groupBy("doc_id").count()
    assert rows2.filter(F.col("count") > 1).count() == 0
    assert after2 == exp1 | exp2 and len(exp2) > 0
    assert not any(i >= 100000 for i in after2)

    # distinct epochs landed (wave 2 got a NEW epoch, none lost)
    epochs = {
        r.epoch
        for r in spark.read.parquet(out_path).select("epoch").distinct().collect()
    }
    assert len(epochs) == 2

    # third restart, nothing new: a strict no-op
    q3 = start()
    q3.awaitTermination()
    spark.catalog.refreshByPath(out_path)
    assert {
        r.doc_id for r in spark.read.parquet(out_path).collect()
    } == after2
    # index state: replaying every ingested doc now drops everything
    ingested = docs.filter(F.col("doc_id") < 150).join(
        spark.read.parquet(out_path).select("doc_id"), "doc_id", "left_semi"
    )
    survivors, _ = idx.filter_batch(spark, ingested, "doc_id", "text")
    assert survivors.count() == 0


def test_incremental_cm_store_equals_batch(spark):
    """Streaming Count-Min store (X47): after draining the bounded
    document stream, probe estimates from the running store EQUAL the
    batch-built store's (cell addition is exact arithmetic — unlike the
    top-k brackets), and a replayed epoch is a no-op under the epoch
    guard."""
    from covid19i2b2_spark.operators.sketches import (
        build_cm_sketches,
        cm_estimates,
    )
    from covid19i2b2_spark.operators.text import tokens as tok_col
    from covid19i2b2_spark.streaming.curation import stream_documents
    from covid19i2b2_spark.streaming.incremental import (
        RunningCmStore,
        incremental_cm_tokens,
    )

    target = RunningCmStore(spark, ["source"], depth=3, width=256)
    q = incremental_cm_tokens(stream_documents(spark, SF_DIR), target)
    q.awaitTermination()
    assert target.df is not None and len(target._epochs) >= 1

    keys = ["the", "and", "data", "zzznotoken"]
    got = {
        (r["source"], r["key"]): (r["est"], r["n_rows"])
        for r in cm_estimates(
            target.df, ["source"], keys, depth=3, width=256
        ).collect()
    }
    toks = read_table(spark, SF_DIR, "documents").select(
        "source", F.explode(tok_col(F.lower("text"))).alias("token")
    )
    batch_store = build_cm_sketches(
        toks, ["source"], "token", depth=3, width=256
    )
    want = {
        (r["source"], r["key"]): (r["est"], r["n_rows"])
        for r in cm_estimates(
            batch_store, ["source"], keys, depth=3, width=256
        ).collect()
    }
    assert got == want and len(got) > 0

    # replayed epoch: merging any already-folded epoch id changes nothing
    before = sorted(map(tuple, target.df.collect()))
    some_epoch = next(iter(target._epochs))
    target.merge(target.df, some_epoch)
    assert sorted(map(tuple, target.df.collect())) == before


def test_durable_quantile_store_survives_restart(spark, tmp_path):
    """VERDICT r7 #1: a durable summary store persists the folded-epoch
    set atomically with the summary table, so a 'driver restart' (fresh
    store instance at the same path) neither forgets pre-crash state nor
    double-counts a replayed epoch — while an in-memory store with the
    same frames DOES double-count, pinning the failure mode the durable
    path exists to prevent."""
    from covid19i2b2_spark.operators.sketches import build_quantile_sketches
    from covid19i2b2_spark.streaming.incremental import RunningQuantileStore

    ev = read_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "value", "user_id"
    )
    halves = [
        build_quantile_sketches(
            ev.filter(F.col("user_id") % 2 == i), ["day"], "value"
        )
        for i in (0, 1)
    ]
    path = str(tmp_path / "qstore")

    def snap(df):
        return {r["day"]: (r["buckets"], r["n_rows"]) for r in df.collect()}

    store = RunningQuantileStore(spark, ["day"], path=path)
    store.merge(halves[0], epoch_id=0)
    store.merge(halves[1], epoch_id=1)
    want = snap(build_quantile_sketches(ev, ["day"], "value"))
    assert snap(store.df) == want

    # "restart": a fresh instance restores both the epoch set and state
    store2 = RunningQuantileStore(spark, ["day"], path=path)
    assert store2._epochs == {0, 1}
    assert snap(store2.df) == want

    # at-least-once replay of a pre-crash epoch after restart: no-op
    store2.merge(halves[1], epoch_id=1)
    assert snap(store2.df) == want

    # contrast — the pre-durability failure mode: same summary frame but
    # a driver-memory epoch set that died with the old process
    mem = RunningQuantileStore(spark, ["day"])
    mem.df = store2.df
    mem.merge(halves[1], epoch_id=1)  # fresh epoch set: folds AGAIN
    double = snap(mem.df)
    assert double != want
    assert all(
        double[d][1] >= want[d][1] for d in want
    )  # n_rows double-counted

    # a NEW epoch after restart still folds in (store stays functional)
    store2.merge(halves[0], epoch_id=2)
    grown = snap(store2.df)
    assert all(grown[d][1] >= want[d][1] for d in want)

    # durable mode refuses epoch-less merges (replay guard keys on it)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="epoch_id"):
        store2.merge(halves[0])

    # prune: only the latest MARKED epoch's state dir remains on disk
    state_dirs = [  # '.crc' sidecars are Hadoop-local noise
        p.name
        for p in (tmp_path / "qstore" / "state").iterdir()
        if not p.name.startswith(".")
    ]
    assert state_dirs == ["epoch=2"]
    markers = sorted(
        int(p.name)
        for p in (tmp_path / "qstore" / "_epochs").iterdir()
        if not p.name.startswith(".")
    )
    assert markers == [0, 1, 2]


def test_durable_store_ignores_unmarked_state(spark, tmp_path):
    """Crash window between the state write and the marker: restore must
    ignore the unmarked (torn) state dir, resume from the last MARKED
    epoch, and let the replayed batch re-fold and re-commit — converging
    to the same state as a crash-free run."""
    from covid19i2b2_spark.operators.sketches import merge_cm_sketches
    from covid19i2b2_spark.operators.sketches import build_cm_sketches
    from covid19i2b2_spark.operators.text import tokens as tok_col
    from covid19i2b2_spark.streaming.incremental import RunningCmStore

    toks = read_table(spark, SF_DIR, "documents").select(
        "source", F.explode(tok_col(F.lower("text"))).alias("token")
    )
    halves = [  # src0-src9 vs src10-src19 (both non-empty)
        build_cm_sketches(
            toks.filter(F.length("source") == 4), ["source"], "token",
            depth=3, width=128,
        ),
        build_cm_sketches(
            toks.filter(F.length("source") > 4), ["source"], "token",
            depth=3, width=128,
        ),
    ]
    path = str(tmp_path / "cmstore")
    store = RunningCmStore(
        spark, ["source"], depth=3, width=128, path=path
    )
    store.merge(halves[0], epoch_id=0)
    want_crashfree = sorted(
        map(tuple, merge_cm_sketches(
            halves[0].unionByName(halves[1]), ["source"]
        ).collect())
    )

    # simulate: epoch 1's state lands on disk but the marker never does
    store.df.unionByName(halves[1]).write.mode("overwrite").parquet(
        f"{path}/state/epoch=1"
    )

    store2 = RunningCmStore(
        spark, ["source"], depth=3, width=128, path=path
    )
    assert store2._epochs == {0}  # torn epoch invisible
    # replayed epoch 1 re-folds over the LAST MARKED state and commits
    store2.merge(halves[1], epoch_id=1)
    assert sorted(map(tuple, store2.df.collect())) == want_crashfree
    assert store2._epochs == {0, 1}


def test_durable_store_requires_checkpoint_location(spark, tmp_path):
    """Review r8: a durable store's epoch guard is only sound when the
    feeding query's epoch ids stay monotonic across restarts — i.e.
    the query runs with a stable checkpointLocation.  Starting a
    durable-store stream WITHOUT one must refuse (a fresh query's
    epochs restart at 0, collide with marked epochs, and silently skip
    new data); with one, the stream runs, the store commits, and a
    RE-RUN of the same source+checkpoint with a FRESH store instance
    folds nothing new (no re-read past the guard, no double count)."""
    import pytest as _pt

    from covid19i2b2_spark.streaming.curation import stream_documents
    from covid19i2b2_spark.streaming.incremental import (
        RunningCmStore,
        incremental_cm_tokens,
    )

    path = str(tmp_path / "cm_durable")
    store = RunningCmStore(spark, ["source"], depth=3, width=128, path=path)
    with _pt.raises(ValueError, match="checkpoint_location"):
        incremental_cm_tokens(stream_documents(spark, SF_DIR), store)

    ckpt = str(tmp_path / "ckpt")
    q = incremental_cm_tokens(
        stream_documents(spark, SF_DIR), store, checkpoint_location=ckpt
    )
    q.awaitTermination()
    assert store.df is not None and store._epochs
    state = sorted(map(tuple, store.df.collect()))
    epochs = set(store._epochs)

    # "restart": fresh store instance, same source files, SAME
    # checkpoint — the resumed query has no new batches to hand us, so
    # the restored store must stay exactly as committed
    store2 = RunningCmStore(spark, ["source"], depth=3, width=128, path=path)
    assert store2._epochs == epochs
    q2 = incremental_cm_tokens(
        stream_documents(spark, SF_DIR), store2, checkpoint_location=ckpt
    )
    q2.awaitTermination()
    assert sorted(map(tuple, store2.df.collect())) == state
    assert store2._epochs == epochs


def test_streaming_entity_resolution_restart_recovery(spark, tmp_path):
    """Round 9 (X51 streaming form): the resolve loop across a real
    stop/restart — wave 1 resolves typos against the seed index and
    appends its new entities; wave 2 (after restart over the same
    checkpoint) must resolve against wave 1's appended entities; a
    third restart with nothing new is a no-op.  checkpoint_dir is a
    hard requirement (epoch ids restart at 0 without one)."""
    from covid19i2b2_spark.operators.fuzzy_incremental import FuzzyIndex
    from covid19i2b2_spark.streaming.entities import (
        run_streaming_entity_resolution,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "resolved")
    schema = "id long, name string"

    idx = FuzzyIndex(str(tmp_path / "fidx"), max_dist=1, k=2)
    idx.build(
        spark.createDataFrame(
            [(1, "anthropic"), (2, "google"), (3, "microsoft")], schema
        ),
        "id",
        "name",
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="checkpoint_dir"):
        run_streaming_entity_resolution(
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(landing)),
            idx,
            out,
        )

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(landing))
        )
        return run_streaming_entity_resolution(
            stream, idx, out, checkpoint_dir=ckpt
        )

    # wave 1: a 1-deletion typo of a canonical entry + two spellings
    # of a NEW entity
    spark.createDataFrame(
        [(100, "googl"), (101, "amazonia"), (102, "amazonja")], schema
    ).coalesce(1).write.parquet(str(landing / "wave1"))
    q1 = start()
    q1.awaitTermination()
    asn1 = {
        r.batch_id: (r.canonical_id, r.dist)
        for r in spark.read.parquet(f"{out}/assignments").collect()
    }
    assert asn1[100] == (2, 1)  # googl -> google
    assert asn1[101] == (101, 0)  # new entity, survivor maps to itself
    assert asn1[102][0] == 101  # within-batch collapse to the survivor
    new1 = {
        r.id for r in spark.read.parquet(f"{out}/new_entities").collect()
    }
    assert new1 == {101}

    # wave 2 after restart: an exact copy of the APPENDED entity (must
    # resolve against wave 1's index state) + one genuinely new name
    spark.createDataFrame(
        [(200, "amazonia"), (201, "netflix")], schema
    ).coalesce(1).write.parquet(str(landing / "wave2"))
    q2 = start()
    q2.awaitTermination()
    spark.catalog.refreshByPath(f"{out}/assignments")
    spark.catalog.refreshByPath(f"{out}/new_entities")
    asn2 = {
        r.batch_id: (r.canonical_id, r.dist)
        for r in spark.read.parquet(f"{out}/assignments").collect()
    }
    assert asn2[200] == (101, 0)  # matched the wave-1 appended entity
    assert asn2[201] == (201, 0)  # new
    new2 = {
        r.id for r in spark.read.parquet(f"{out}/new_entities").collect()
    }
    assert new2 == {101, 201}
    # wave-1 rows appear exactly once (no re-delivery across restart)
    counts = (
        spark.read.parquet(f"{out}/assignments")
        .groupBy("batch_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert counts == 0

    # third restart, nothing new: strict no-op
    q3 = start()
    q3.awaitTermination()
    spark.catalog.refreshByPath(f"{out}/assignments")
    assert {
        r.batch_id
        for r in spark.read.parquet(f"{out}/assignments").collect()
    } == {100, 101, 102, 200, 201}
    # the index resolves every canonical name at distance 0 now
    probe = spark.createDataFrame(
        [(900, "amazonia"), (901, "netflix"), (902, "google")], schema
    )
    m = {
        r["batch_id"]: r["index_id"]
        for r in idx.match_batch(spark, probe, "id", "name")
        .filter(F.col("dist") == 0)
        .collect()
    }
    assert m == {900: 101, 901: 201, 902: 2}


def test_entity_epoch_replay_after_partial_append(spark, tmp_path, monkeypatch):
    """Review r9: a crash BETWEEN FuzzyIndex.append's two parquet
    writes (grams landed, shorts didn't) must not lose the short
    survivor's shorts/ row on replay — the replay appends from the
    epoch's DURABLE new_entities record, never a re-resolution (which
    would see the partial gram rows, match the survivor to itself at
    dist 0, and drop it from the survivor set forever)."""
    import pytest as _pytest

    from covid19i2b2_spark.operators.fuzzy_incremental import FuzzyIndex
    from covid19i2b2_spark.streaming.entities import resolve_epoch

    schema = "id long, name string"
    idx = FuzzyIndex(str(tmp_path / "pidx"), max_dist=2, k=2)
    idx.build(spark.createDataFrame([(1, "anthropic")], schema), "id", "name")
    out = str(tmp_path / "pout")
    # 'ab' sits below the cutoff (k*(d-1)+2 = 4): its only route to a
    # zero-shared-gram match like 'cd' is the shorts/ pool
    batch = spark.createDataFrame([(100, "ab")], schema)

    orig_append = FuzzyIndex.append

    def partial_append(self, df, id_col, text_col):
        grams, _shorts = self._entries(df, id_col, text_col)
        grams.write.mode("append").parquet(self.grams_path)
        raise RuntimeError("simulated crash between grams and shorts")

    monkeypatch.setattr(FuzzyIndex, "append", partial_append)
    with _pytest.raises(RuntimeError, match="simulated crash"):
        resolve_epoch(idx, out, "id", "name", batch, 0)
    monkeypatch.setattr(FuzzyIndex, "append", orig_append)

    # the foreachBatch retry: outputs committed, so the append must
    # come from the durable record
    resolve_epoch(idx, out, "id", "name", batch, 0)
    probe = spark.createDataFrame([(900, "cd")], schema)
    got = {
        (r.batch_id, r.index_id, r.dist)
        for r in idx.match_batch(spark, probe, "id", "name").collect()
    }
    assert got == {(900, 100, 2)}  # the shorts-pool pair survived
    asn = spark.read.parquet(f"{out}/assignments").collect()
    assert {r.batch_id for r in asn} == {100}
    # fully committed now: a further replay is a strict no-op
    st = idx.stats(spark)
    resolve_epoch(idx, out, "id", "name", batch, 0)
    assert idx.stats(spark) == st


def test_streaming_drift_monitor_matches_batch(spark, tmp_path):
    """Round 9 (X45 streaming form): draining the bounded document
    stream through the drift monitor produces EXACTLY the batch
    operator's JS rows (same fixed-point arithmetic, frozen reference
    counts reused per epoch), with the epoch id and alert column
    attached; checkpoint_dir is a hard requirement."""
    import pytest as _pytest

    from covid19i2b2_spark.operators.drift import corpus_divergence
    from covid19i2b2_spark.streaming.curation import stream_documents
    from covid19i2b2_spark.streaming.drift import (
        run_streaming_drift_monitor,
    )

    docs = read_table(spark, SF_DIR, "documents")
    # per-source halves: doc_id %% 20 IS the source in the synthetic
    # corpus, so split on floor(doc_id/20) %% 2 (memory/TESTDATA trap)
    reference = docs.filter(
        F.pmod(F.floor(F.col("doc_id") / 20), F.lit(2)) == 0
    )
    out = str(tmp_path / "drift")
    with _pytest.raises(ValueError, match="checkpoint_dir"):
        run_streaming_drift_monitor(
            stream_documents(spark, SF_DIR), reference, out
        )
    q = run_streaming_drift_monitor(
        stream_documents(spark, SF_DIR),
        reference,
        out,
        group_cols=("source",),
        checkpoint_dir=str(tmp_path / "ckpt"),
        alert_threshold=0.05,
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    rows = {r["source"]: r for r in got.collect()}
    exp = {
        r["source"]: r
        for r in corpus_divergence(
            reference, docs, "text", ["source"]
        ).collect()
    }
    assert set(rows) == set(exp) and len(rows) > 0
    for src, r in rows.items():
        e = exp[src]
        assert r["js_divergence"] == e["js_divergence"], src
        assert r["n_tokens_a"] == e["n_tokens_a"]
        assert r["n_tokens_b"] == e["n_tokens_b"]
        assert r["n_types_shared"] == e["n_types_shared"]
        assert r["alert"] == (r["js_divergence"] > 0.05)
    # the whole-corpus-vs-half comparison should NOT alarm at 0.05
    # (same generator); a deliberately alien batch must
    alien = spark.createDataFrame(
        [(i, rows_src, "zzz qqq xxx " * 30)
         for i, rows_src in enumerate(sorted(rows))],
        "doc_id long, source string, text string",
    )
    from covid19i2b2_spark.operators.drift import corpus_divergence as cd

    alien_js = {
        r["source"]: r["js_divergence"]
        for r in cd(reference, alien, "text", ["source"]).collect()
    }
    assert all(v > 0.5 for v in alien_js.values())


def test_streaming_loops_surface_index_health(spark, tmp_path, caplog):
    """VERDICT r9 #5: a replay-heavy ingest must PUSH the maintenance
    signal, not wait to be asked — resolve_epoch logs
    FuzzyIndex.stats() on the stats_every cadence: INFO while clean,
    WARNING with a compact() cue once replayed re-appends push
    duplication_ratio past maintenance.COMPACT_RATIO."""
    import logging

    from covid19i2b2_spark.fsutil import hadoop_fs
    from covid19i2b2_spark.operators.fuzzy_incremental import FuzzyIndex
    from covid19i2b2_spark.streaming import maintenance
    from covid19i2b2_spark.streaming.entities import resolve_epoch

    schema = "id long, name string"
    idx = FuzzyIndex(str(tmp_path / "fidx"), max_dist=1, k=2)
    idx.build(
        spark.createDataFrame([(1, "anthropic")], schema), "id", "name"
    )
    batch = spark.createDataFrame(
        [(100, "exampleco"), (101, "samplecorp")], schema
    )
    out = str(tmp_path / "out")
    logger = "covid19i2b2_spark.streaming.maintenance"

    with caplog.at_level(logging.INFO, logger=logger):
        resolve_epoch(idx, out, "id", "name", batch, 0, stats_every=1)
    infos = [r for r in caplog.records if "index health" in r.getMessage()]
    assert infos, "clean epoch must log the INFO health line"
    assert "duplication_ratio" in infos[-1].getMessage()

    # cadence: stats_every=3 must NOT fire on epochs 0 or 1
    caplog.clear()
    with caplog.at_level(logging.INFO, logger=logger):
        resolve_epoch(
            idx, out, "id", "name",
            spark.createDataFrame([(200, "volkswagen")], schema),
            1, stats_every=3,
        )
    assert not caplog.records

    # at-least-once replays: drop the DONE marker (keep the output
    # marker) so each re-run re-appends the durable record — the
    # designed-in duplication path the signal exists for
    fs, done = hadoop_fs(spark, f"{idx.path}/_epochs/entity_0")
    caplog.clear()
    with caplog.at_level(logging.INFO, logger=logger):
        for _ in range(2):
            fs.delete(done, False)
            resolve_epoch(idx, out, "id", "name", batch, 0, stats_every=1)
    warns = [
        r
        for r in caplog.records
        if r.levelno >= logging.WARNING and "compact" in r.getMessage()
    ]
    assert warns, "replay-bloated index must log the WARNING compact cue"
    st = idx.stats(spark)
    assert st["duplication_ratio"] > maintenance.COMPACT_RATIO
    idx.compact(spark)
    assert idx.stats(spark)["duplication_ratio"] == 1.0


def test_ingest_loop_logs_dedup_index_health(spark, tmp_path, caplog):
    """The DedupIndex ingest loop pushes the same signal (stats_every
    wired through run_streaming_ingest's foreachBatch body)."""
    import logging

    from covid19i2b2_spark.operators.dedup_incremental import DedupIndex
    from covid19i2b2_spark.streaming.curation import run_streaming_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.filter(F.col("doc_id") < 50).coalesce(1).write.parquet(
        str(landing / "wave1")
    )
    schema = docs.schema
    idx = DedupIndex(str(tmp_path / "idx"))
    idx.build(spark.createDataFrame([], schema), "doc_id", "text")
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(landing))
    )
    with caplog.at_level(
        logging.INFO, logger="covid19i2b2_spark.streaming.maintenance"
    ):
        q = run_streaming_ingest(
            stream, idx, str(tmp_path / "corpus"),
            checkpoint_dir=str(tmp_path / "ckpt"), stats_every=1,
        )
        q.awaitTermination()
    msgs = [r.getMessage() for r in caplog.records]
    assert any(
        "run_streaming_ingest" in m and "duplication_ratio" in m
        for m in msgs
    )


def test_streaming_embedding_ingest_restart_recovery(spark, tmp_path):
    """Round 10 (X53 streaming form): embedding batches stream into an
    IvfIndex across a real stop/restart — wave 1 appends under the
    frozen centroids, wave 2 (restart, same checkpoint) appends only
    the new wave, a third restart is a no-op, and the final index
    equals the one-shot build over everything.  checkpoint_dir is a
    hard requirement."""
    import pytest as _pytest

    from covid19i2b2_spark.operators.ivf_index import IvfIndex
    from covid19i2b2_spark.streaming.embeddings import (
        run_streaming_embedding_ingest,
    )

    emb = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = (
        emb.filter(F.col("vec_id") < 16)
        .selectExpr("vec_id AS centroid_id", "embedding AS cvec")
        .localCheckpoint(eager=True)
    )
    seed = emb.filter(F.col("vec_id") < 100)
    idx = IvfIndex(str(tmp_path / "ivf"))
    idx.build(seed, "vec_id", "embedding", centroids=cents,
              exact_decimal=True)

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    schema = emb.schema

    with _pytest.raises(ValueError, match="checkpoint_dir"):
        run_streaming_embedding_ingest(
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(landing)),
            idx,
        )

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(landing))
        )
        return run_streaming_embedding_ingest(
            stream, idx, checkpoint_dir=ckpt
        )

    wave1 = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 300))
    wave1.coalesce(1).write.parquet(str(landing / "wave1"))
    start().awaitTermination()
    wave2 = emb.filter(F.col("vec_id") >= 300)
    wave2.coalesce(1).write.parquet(str(landing / "wave2"))
    start().awaitTermination()
    start().awaitTermination()  # third restart: no new files, no-op

    one_shot = IvfIndex(str(tmp_path / "oneshot"))
    one_shot.build(emb, "vec_id", "embedding", centroids=cents,
                   exact_decimal=True)

    def rows(i):
        return sorted(
            (r["vec_id"], r["centroid_id"])
            for r in i.assigned(spark)
            .select("vec_id", "centroid_id").collect()
        )

    assert rows(idx) == rows(one_shot)
    assert idx.health(spark)["duplication_ratio"] == 1.0


def test_embedding_ingest_replay_warns_and_compacts(spark, tmp_path, caplog):
    """A crash between IvfIndex.append and the epoch marker replays
    the append — the health log must WARN at ANY duplication (>1.0:
    replayed vectors occupy extra kNN ranks, unlike the storage-only
    dedup/fuzzy indexes) and name both remediations; compact()
    restores clean ranked output."""
    import logging

    from covid19i2b2_spark.operators.ivf_index import IvfIndex
    from covid19i2b2_spark.streaming.embeddings import ingest_epoch

    emb = read_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = emb.filter(F.col("vec_id") < 16).selectExpr(
        "vec_id AS centroid_id", "embedding AS cvec"
    )
    idx = IvfIndex(str(tmp_path / "ivf"))
    idx.build(
        emb.filter(F.col("vec_id") < 200), "vec_id", "embedding",
        centroids=cents, exact_decimal=True,
    )
    batch = emb.filter(F.col("vec_id") >= 200)
    logger = "covid19i2b2_spark.streaming.maintenance"

    with caplog.at_level(logging.INFO, logger=logger):
        c = ingest_epoch(idx, batch, 0, stats_every=1)
    assert c["appended"] > 0
    # the health line fired (INFO while clean; appending most of a
    # random corpus can legitimately trip the staleness WARNING —
    # either way the report with its ratio surfaced)
    assert any(
        "duplication_ratio" in r.getMessage() for r in caplog.records
    )
    assert not any(
        "extra kNN ranks" in r.getMessage() for r in caplog.records
    )

    # replay the crash window: marker never landed, epoch re-runs
    from covid19i2b2_spark.fsutil import hadoop_fs

    fs, marker = hadoop_fs(spark, f"{idx.path}/_epochs/embed_0")
    fs.delete(marker, False)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger=logger):
        ingest_epoch(idx, batch, 0, stats_every=1)
    warns = [
        r.getMessage()
        for r in caplog.records
        if r.levelno >= logging.WARNING
    ]
    assert warns and "extra kNN ranks" in warns[-1]
    assert "dedup=True" in warns[-1]
    h = idx.health(spark)
    assert h["duplication_ratio"] > 1.0
    idx.compact(spark)
    assert idx.health(spark)["duplication_ratio"] == 1.0
    # a marked replay is a strict no-op (returns None, no growth)
    assert ingest_epoch(idx, batch, 0, stats_every=1) is None


def test_ingest_loop_comaintains_search_index(spark, tmp_path):
    """run_streaming_ingest(search_index=...): each epoch's dedup
    SURVIVORS append to the X54 inverted index inside the same epoch
    marker, so the lake stays keyword-searchable as it grows — the
    final index must equal a one-shot build over the ingested corpus,
    across a real restart, including duplicates REJECTED by dedup
    (they must not enter the search index either)."""
    from covid19i2b2_spark.operators.dedup_incremental import DedupIndex
    from covid19i2b2_spark.operators.inverted_index import InvertedIndex
    from covid19i2b2_spark.streaming.curation import run_streaming_ingest

    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_path = str(tmp_path / "corpus")

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    schema = docs.schema
    idx = DedupIndex(str(tmp_path / "dedup"))
    idx.build(spark.createDataFrame([], schema), "doc_id", "text")
    sidx = InvertedIndex(str(tmp_path / "search"))
    sidx.build(spark.createDataFrame([], schema), "doc_id", "text")

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(landing))
        )
        return run_streaming_ingest(
            stream, idx, out_path, checkpoint_dir=ckpt,
            search_index=sidx,
        )

    docs.filter(F.col("doc_id") < 100).coalesce(1).write.parquet(
        str(landing / "wave1")
    )
    start().awaitTermination()
    # wave 2 re-lands 50 already-ingested docs (exact dups the dedup
    # index must reject from corpus AND search) plus 100 new ones
    docs.filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 200)
    ).coalesce(1).write.parquet(str(landing / "wave2"))
    start().awaitTermination()

    corpus_ids = {
        r.doc_id for r in spark.read.parquet(out_path).collect()
    }
    one_shot = InvertedIndex(str(tmp_path / "oneshot"))
    one_shot.build(
        docs.filter(F.col("doc_id").isin(list(corpus_ids))),
        "doc_id", "text",
    )
    terms = ["spark", "filter", "vector"]
    got = [
        (r["doc_id"], r["bm25"])
        for r in sidx.search(spark, terms, k=20).collect()
    ]
    want = [
        (r["doc_id"], r["bm25"])
        for r in one_shot.search(spark, terms, k=20).collect()
    ]
    assert got == want
    st = sidx.stats(spark)
    assert st["n_docs"] == len(corpus_ids)
    assert st["duplication_ratio"] == 1.0


def test_search_index_duplication_gets_correctness_warning(spark, tmp_path, caplog):
    """log_index_health over a replay-duplicated InvertedIndex must
    warn at ANY duplication with the ranked-score remediation wording
    (not the storage-only COMPACT_RATIO path the anti-join indexes
    get), and go back to INFO after compact()."""
    import logging

    from covid19i2b2_spark.operators.inverted_index import InvertedIndex
    from covid19i2b2_spark.streaming.maintenance import log_index_health

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = InvertedIndex(str(tmp_path / "inv"))
    idx.build(docs.filter(F.col("doc_id") < 400), "doc_id", "text")
    batch = docs.filter(F.col("doc_id") >= 400)
    idx.append(batch, "doc_id", "text")
    idx.append(batch, "doc_id", "text")  # replay
    logger = "covid19i2b2_spark.streaming.maintenance"
    with caplog.at_level(logging.INFO, logger=logger):
        st = log_index_health(idx, spark, 0, 1, "test-loop")
    assert st["duplication_ratio"] > 1.0
    warns = [
        r.getMessage() for r in caplog.records
        if r.levelno >= logging.WARNING
    ]
    assert warns and "ranked-score" in warns[-1]
    assert "dedup=True" in warns[-1]
    idx.compact(spark)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger=logger):
        log_index_health(idx, spark, 0, 1, "test-loop")
    assert all(r.levelno < logging.WARNING for r in caplog.records)
    assert any("index health" in r.getMessage() for r in caplog.records)
