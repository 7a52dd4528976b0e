"""X80 incremental fetch-log store (streaming/fetch_log.py): the
merge ≡ rebuild equality against X71's batch path (the store's whole
contract), boundary change counting incl. NULL fingerprints,
out-of-order batch folding, replay guard, durable restore, and the
streaming end-to-end run."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.recrawl import estimate_change_rates
from covid19i2b2_spark.streaming.fetch_log import (
    RunningFetchLog,
    incremental_fetch_log,
    summarize_fetch_batch,
)

T0 = dt.datetime(2026, 1, 1)
SCHEMA = "url string, fetch_time timestamp, content_fp string"


def _rows(spec):
    return [
        (url, T0 + dt.timedelta(seconds=offs), fp) for url, offs, fp in spec
    ]


def _history():
    spec = []
    # u_alt: changes every hour for 9 fetches
    spec += [("u_alt", i * 3600, "ab"[i % 2]) for i in range(9)]
    # u_stable: never changes
    spec += [("u_stable", i * 3600, "z") for i in range(9)]
    # u_some: changes at fetches 4 and 7
    fps = ["a"] * 4 + ["b"] * 3 + ["c"] * 2
    spec += [("u_some", i * 3600, fps[i]) for i in range(9)]
    # u_nulls: a failed-hash fetch in the middle
    spec += [("u_nulls", 0, "a"), ("u_nulls", 3600, None),
             ("u_nulls", 7200, "a")]
    # u_cold: one fetch only
    spec += [("u_cold", 0, "q")]
    return spec


def _estimates_map(df):
    return {
        r["url"]: (
            r["n_fetches"], r["n_changes"], r["lambda_hat"],
            r["revisit_sec"],
        )
        for r in df.collect()
    }


def test_merge_equals_rebuild(spark):
    """Three time-split batches through the store ≡ one batch pass
    over the concatenated history — bit-for-bit on λ̂ and revisit."""
    spec = _history()
    full = spark.createDataFrame(_rows(spec), SCHEMA)
    want = _estimates_map(estimate_change_rates(full))

    store = RunningFetchLog(spark)
    cuts = [(0, 3 * 3600), (3 * 3600, 6 * 3600), (6 * 3600, 10**9)]
    for i, (lo, hi) in enumerate(cuts):
        batch = [
            (u, o, f) for u, o, f in spec if lo <= o < hi
        ]
        store.merge(
            summarize_fetch_batch(
                spark.createDataFrame(_rows(batch), SCHEMA)
            ),
            epoch_id=i,
        )
    got = _estimates_map(store.estimates())
    assert got == want


def test_boundary_change_counted(spark):
    store = RunningFetchLog(spark)
    b1 = spark.createDataFrame(
        _rows([("u", 0, "a"), ("u", 60, "a")]), SCHEMA
    )
    b2 = spark.createDataFrame(
        _rows([("u", 120, "b"), ("u", 180, "b")]), SCHEMA
    )
    store.merge(summarize_fetch_batch(b1), 0)
    store.merge(summarize_fetch_batch(b2), 1)
    row = store.df.collect()[0]
    # interior: 0 + 0; boundary a->b: 1
    assert row["n_fetches"] == 4 and row["n_changes"] == 1
    # NULL boundary counts as change (the X71 null-safe rule)
    store2 = RunningFetchLog(spark)
    store2.merge(
        summarize_fetch_batch(
            spark.createDataFrame(_rows([("u", 0, "a")]), SCHEMA)
        ),
        0,
    )
    store2.merge(
        summarize_fetch_batch(
            spark.createDataFrame(_rows([("u", 60, None)]), SCHEMA)
        ),
        1,
    )
    assert store2.df.collect()[0]["n_changes"] == 1


def test_out_of_order_batches_fold_by_time(spark):
    """A later-ingested batch covering an EARLIER time range folds
    into the right position (sort_array on first_fetch)."""
    spec = [("u", i * 60, "ab"[i % 2]) for i in range(6)]
    full = spark.createDataFrame(_rows(spec), SCHEMA)
    want = _estimates_map(estimate_change_rates(full))
    store = RunningFetchLog(spark)
    late = [r for r in spec if r[1] >= 180]
    early = [r for r in spec if r[1] < 180]
    store.merge(
        summarize_fetch_batch(spark.createDataFrame(_rows(late), SCHEMA)), 0
    )
    store.merge(
        summarize_fetch_batch(spark.createDataFrame(_rows(early), SCHEMA)), 1
    )
    assert _estimates_map(store.estimates()) == want


def test_replay_guard(spark):
    store = RunningFetchLog(spark)
    batch = summarize_fetch_batch(
        spark.createDataFrame(_rows([("u", 0, "a"), ("u", 60, "b")]), SCHEMA)
    )
    store.merge(batch, 5)
    store.merge(batch, 5)  # replayed epoch: must be a no-op
    row = store.df.collect()[0]
    assert row["n_fetches"] == 2 and row["n_changes"] == 1


def test_durable_restore(spark, tmp_path):
    path = str(tmp_path / "fetchlog")
    store = RunningFetchLog(spark, path=path)
    store.merge(
        summarize_fetch_batch(
            spark.createDataFrame(
                _rows([("u", 0, "a"), ("u", 3600, "b"), ("u", 7200, "b")]),
                SCHEMA,
            )
        ),
        0,
    )
    want = _estimates_map(store.estimates())
    restored = RunningFetchLog(spark, path=path)
    assert _estimates_map(restored.estimates()) == want
    # restored store also remembers folded epochs
    restored.merge(
        summarize_fetch_batch(
            spark.createDataFrame(_rows([("u", 99, "z")]), SCHEMA)
        ),
        0,  # already folded -> skipped
    )
    assert _estimates_map(restored.estimates()) == want


def test_empty_store_is_loud(spark):
    with pytest.raises(ValueError):
        RunningFetchLog(spark).estimates()


def test_streaming_end_to_end(spark, tmp_path):
    """availableNow file stream -> foreachBatch summaries -> store;
    the store's schedule equals the batch path over the same files."""
    landing = tmp_path / "landing"
    landing.mkdir()
    spec = _history()
    full = spark.createDataFrame(_rows(spec), SCHEMA)
    full.filter(F.col("fetch_time") < T0 + dt.timedelta(hours=4)) \
        .coalesce(1).write.parquet(str(landing / "w1"))
    full.filter(F.col("fetch_time") >= T0 + dt.timedelta(hours=4)) \
        .coalesce(1).write.parquet(str(landing / "w2"))

    store = RunningFetchLog(spark, path=str(tmp_path / "store"))
    stream = (
        spark.readStream.schema(full.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(landing))
    )
    q = incremental_fetch_log(
        stream, store, checkpoint_location=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = _estimates_map(store.estimates())
    want = _estimates_map(estimate_change_rates(full))
    assert got == want


def test_durable_requires_checkpoint(spark, tmp_path):
    store = RunningFetchLog(spark, path=str(tmp_path / "s"))
    (tmp_path / "landing").mkdir()
    stream = (
        spark.readStream.schema(SCHEMA).parquet(str(tmp_path / "landing"))
    )
    with pytest.raises(ValueError):
        incremental_fetch_log(stream, store)
