"""X61'' streaming frontier ingest (streaming/frontier.py +
operators/urls.SeenUrlSet): cross-batch resource dedup, quarantine
routing, marked-replay no-op, restart recovery, set health/compact."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.urls import SeenUrlSet, url_dedup
from covid19i2b2_spark.streaming.frontier import (
    run_streaming_frontier_ingest,
)

WAVE1 = [
    (1, "http://a.com/1"),
    (2, "HTTP://A.COM/1"),          # dup spelling inside the batch
    (3, "http://b.com/x"),
    (4, "bad url"),
]
WAVE2 = [
    (10, "http://a.com/1?utm_source=z"),   # dup of a wave-1 resource
    (11, "http://c.com/new"),
    (12, "%%% not a url"),
]


def _stream(spark, dirpath):
    return (
        spark.readStream.schema("url_id long, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirpath)
    )


def test_frontier_ingest_cross_batch_dedup_and_replay(spark, tmp_path):
    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "frontier")
    for wave in (WAVE1, WAVE2):
        spark.createDataFrame(
            wave, "url_id long, url string"
        ).coalesce(1).write.mode("append").parquet(inbox)

    seen = SeenUrlSet(str(tmp_path / "seen"))
    seen.build(spark.createDataFrame([], "canonical_url string"))
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_frontier_ingest(
        _stream(spark, inbox), seen, out, checkpoint_dir=ckpt,
        stats_every=1,
    )
    q.awaitTermination()

    got = spark.read.schema(
        "url_id long, url string, canonical_url string,"
        " n_duplicates long"
    ).parquet(out).collect()
    canon = sorted(r["canonical_url"] for r in got)
    # each RESOURCE admitted exactly once across batches; the wave-2
    # respelling of a.com/1 was rejected by the seen set
    assert canon == [
        "http://a.com/1", "http://b.com/x", "http://c.com/new"
    ]
    assert len(set(canon)) == len(canon)
    # within-batch dedup happened before the set: a.com/1 absorbed its
    # batch-mate (n_duplicates 2, survivor id 1)
    a = {r["canonical_url"]: r for r in got}["http://a.com/1"]
    assert a["url_id"] == 1 and a["n_duplicates"] == 2
    # garbage routed to quarantine, not dropped, not admitted
    quar = spark.read.schema(
        "url_id long, url string, canonical_url string,"
        " n_duplicates long"
    ).parquet(f"{out}/_quarantine").collect()
    assert sorted(r["url_id"] for r in quar) == [4, 12]
    # the seen set equals the one-shot union dedup's canonical domain
    batch = url_dedup(
        spark.createDataFrame(WAVE1 + WAVE2, "url_id long, url string"),
        "url_id", "url",
    ).filter(F.col("canonical_url").isNotNull())
    assert sorted(
        r["canonical_url"] for r in seen._read(spark).collect()
    ) == sorted(r["canonical_url"] for r in batch.collect())
    st = seen.stats(spark)
    assert st["duplication_ratio"] == 1.0 and st["seen_rows"] == 3

    # restart on the same checkpoint: nothing new to process
    q2 = run_streaming_frontier_ingest(
        _stream(spark, inbox), seen, out, checkpoint_dir=ckpt,
    )
    q2.awaitTermination()
    assert spark.read.schema(
        "url_id long, url string, canonical_url string,"
        " n_duplicates long"
    ).parquet(out).count() == 3

    # a FRESH-checkpoint rerun re-delivers the files as epochs 0/1
    # whose markers exist — the marked-replay no-op (epoch-id keying
    # holds because the inbox is unchanged; checkpoint_dir itself is
    # required — review r12)
    q3 = run_streaming_frontier_ingest(
        _stream(spark, inbox), seen, out,
        checkpoint_dir=str(tmp_path / "ckpt3"),
    )
    q3.awaitTermination()
    assert spark.read.schema(
        "url_id long, url string, canonical_url string,"
        " n_duplicates long"
    ).parquet(out).count() == 3
    assert seen.stats(spark)["duplication_ratio"] == 1.0


def test_unmarked_committed_epoch_replay_preserves_increment(
    spark, tmp_path
):
    """ADVICE r11 #2 regression: crash between ``seen.append`` and the
    epoch marker.  On replay the seen set already contains the batch,
    so a recomputed filter_new comes back empty — and the old code's
    overwrite then replaced the committed increment with an EMPTY
    dataset: URLs in the seen set but in no frontier increment,
    permanently unscheduled.  The replay must re-apply from the
    durable increment instead."""
    import os

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "frontier")
    spark.createDataFrame(
        WAVE1, "url_id long, url string"
    ).coalesce(1).write.mode("append").parquet(inbox)
    seen = SeenUrlSet(str(tmp_path / "seen"))
    seen.build(spark.createDataFrame([], "canonical_url string"))
    q = run_streaming_frontier_ingest(
        _stream(spark, inbox), seen, out,
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    q.awaitTermination()
    inc_schema = (
        "url_id long, url string, canonical_url string,"
        " n_duplicates long"
    )
    epoch0 = f"{out}/epoch=0"
    before = sorted(
        r["canonical_url"]
        for r in spark.read.schema(inc_schema).parquet(epoch0).collect()
    )
    assert before == ["http://a.com/1", "http://b.com/x"]
    # simulate the crash: increment committed AND seen.append ran, but
    # the marker never landed
    marker = str(tmp_path / "seen" / "_epochs" / "0")
    os.remove(marker)
    # fresh-checkpoint rerun re-delivers the SAME file as epoch 0 —
    # unmarked, increment committed: the exact replay the old code
    # emptied (inbox unchanged, so epoch 0 names the same batch)
    q2 = run_streaming_frontier_ingest(
        _stream(spark, inbox), seen, out,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination()
    after = sorted(
        r["canonical_url"]
        for r in spark.read.schema(inc_schema).parquet(epoch0).collect()
    )
    assert after == before       # increment preserved, not emptied
    assert os.path.exists(marker)
    # the replayed append costs seen-set storage only; compact heals it
    assert seen.stats(spark)["duplication_ratio"] == 2.0
    new = seen.filter_new(
        spark,
        spark.createDataFrame(
            [(99, "http://a.com/1")], "i long, canonical_url string"
        ),
    )
    assert new.count() == 0
    seen.compact(spark)
    assert seen.stats(spark)["seen_rows"] == 2


def test_seen_set_bloom_gate_equivalence_and_crash_window(
    spark, tmp_path
):
    """VERDICT r11 #3: the bloom-gated filter_new must equal the plain
    anti-join byte-for-byte (the tests/test_bloom.py contract), stay
    maintained through append (bloom-before-table ordering), resolve
    crash-window false POSITIVES through the exact join, and fall back
    to the plain maybe-side anti-join past the broadcast cap."""
    from covid19i2b2_spark.operators.bloom import (
        or_into,
        read_bloom_table,
        write_bloom_table,
    )

    seen = SeenUrlSet(str(tmp_path / "seen"))
    base = spark.createDataFrame(
        [(f"http://h{i % 7}.com/p{i}",) for i in range(200)],
        "canonical_url string",
    )
    seen.build(base)
    batch = spark.createDataFrame(
        [(i, f"http://h{i % 7}.com/p{i}") for i in range(150, 250)]
        + [(999, None)],
        "i long, canonical_url string",
    )
    plain = sorted(r["i"] for r in seen.filter_new(spark, batch).collect())
    assert len(plain) == 51          # 50 new + the NULL-key row
    seen.write_bloom(spark)
    gated = sorted(r["i"] for r in seen.filter_new(spark, batch).collect())
    assert gated == plain
    # broadcast-cap fallback: same result through the plain maybe-side
    # anti-join
    capped = sorted(
        r["i"]
        for r in seen.filter_new(
            spark, batch, bloom_broadcast_bytes=1
        ).collect()
    )
    assert capped == plain
    # append maintains the bloom (bloom-before-table): after admitting
    # the batch, only the NULL row still reads as new — through the
    # gate, so a missing bloom bit (false negative) would fail here
    new = seen.filter_new(
        spark, batch.filter(F.col("canonical_url").isNotNull())
    )
    seen.append(new)
    assert [r["i"] for r in seen.filter_new(spark, batch).collect()] == [999]
    # crash window: bloom OR'd but the table append LOST — extra bits
    # are false positives the exact join resolves; the URL must still
    # be admitted as new
    ghost = spark.createDataFrame(
        [("http://ghost.com/x",)], "canonical_url string"
    )
    spec = read_bloom_table(spark, seen.bloom_path)
    write_bloom_table(
        spark, or_into(spec, ghost, "canonical_url"), seen.bloom_path
    )
    probe = spark.createDataFrame(
        [(1, "http://ghost.com/x")], "i long, canonical_url string"
    )
    assert seen.filter_new(spark, probe).count() == 1
    seen.release()


def test_seen_set_replay_health_and_compact(spark, tmp_path):
    """A crash-window replay duplicates seen rows (storage cost only:
    anti-join reads absorb them); stats() surfaces the ratio and
    compact() restores one-shot counts."""
    seen = SeenUrlSet(str(tmp_path / "seen"))
    urls = spark.createDataFrame(
        [("http://a.com/1",), ("http://b.com/2",)], "canonical_url string"
    )
    seen.build(urls)
    seen.append(urls)            # simulated crash-window replay
    st = seen.stats(spark)
    assert st["duplication_ratio"] == 2.0
    # anti-join reads are unaffected by the duplication
    probe = spark.createDataFrame(
        [(1, "http://a.com/1"), (2, "http://new.com/x")],
        "i long, canonical_url string",
    )
    new = seen.filter_new(spark, probe)
    assert [r["i"] for r in new.collect()] == [2]
    seen.compact(spark)
    st2 = seen.stats(spark)
    assert st2["duplication_ratio"] == 1.0 and st2["seen_rows"] == 2


def test_frontier_loop_with_bloom_gate(spark, tmp_path):
    """The streaming loop over a bloom-opted seen set: filter_new runs
    gated, append maintains the bitmap across epochs (bloom-before-
    table), and the admit-once contract holds exactly — a false
    NEGATIVE anywhere would re-admit a wave-1 resource here."""
    from covid19i2b2_spark.operators.bloom import read_bloom_table

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "frontier")
    for wave in (WAVE1, WAVE2):
        spark.createDataFrame(
            wave, "url_id long, url string"
        ).coalesce(1).write.mode("append").parquet(inbox)
    seen = SeenUrlSet(str(tmp_path / "seen"))
    seen.build(spark.createDataFrame([], "canonical_url string"))
    seen.write_bloom(spark)
    q = run_streaming_frontier_ingest(
        _stream(spark, inbox), seen, out,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = sorted(
        r["canonical_url"]
        for r in spark.read.schema(
            "url_id long, url string, canonical_url string,"
            " n_duplicates long"
        ).parquet(out).collect()
    )
    # identical admit-once result as the ungated loop's test
    assert got == [
        "http://a.com/1", "http://b.com/x", "http://c.com/new"
    ]
    # the bitmap was maintained through the epoch appends: every seen
    # key answers maybe (no false negatives by construction)
    spec = read_bloom_table(spark, seen.bloom_path)
    assert spec is not None and spec.n_items >= 3
    probe = spark.createDataFrame(
        [(1, "http://a.com/1"), (2, "http://c.com/new"),
         (3, "http://b.com/x")],
        "i long, canonical_url string",
    )
    assert seen.filter_new(spark, probe).count() == 0
    seen.release()


def test_checkpoint_dir_is_required(spark, tmp_path):
    """Review r12: every durable side effect is epoch-id-keyed, so a
    checkpoint-less stream (whose epoch ids renumber per run) could
    silently skip or stale-replace a NEW batch — required, loudly."""
    import pytest

    inbox = str(tmp_path / "inbox")
    spark.createDataFrame(
        WAVE1, "url_id long, url string"
    ).coalesce(1).write.mode("append").parquet(inbox)
    seen = SeenUrlSet(str(tmp_path / "seen"))
    seen.build(spark.createDataFrame([], "canonical_url string"))
    with pytest.raises(ValueError, match="checkpoint_dir"):
        run_streaming_frontier_ingest(
            _stream(spark, inbox), seen, str(tmp_path / "out"),
        )
