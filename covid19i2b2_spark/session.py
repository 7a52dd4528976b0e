"""SparkSession factory with defaults tuned for the engine.

Design notes (SURVEY.md §4):
- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- ``spark.sql.shuffle.partitions`` sized to cores for local mode; on a real
  cluster this would be ~2-3x total executor cores and AQE coalesces down.
- Session timezone pinned to UTC: DuckDB (the correctness oracle) uses
  UTC-naive timestamps.
- ``spark.sql.legacy.parquet.nanosAsLong``: legacy ``events.parquet``
  generations store TIMESTAMP(NANOS) which Spark's vectorized parquet reader
  otherwise rejects; the source layer sniffs the footer and, for nanos files
  only, reads nanos as long and converts (sources/tables.py).  Harmless for
  the current MICROS testdata.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Round-15 note — coalescePartitions.parallelismFirst=false (+ a
    # 16m advisory size) and canChangeCachedPlanOutputPartitioning=true
    # were both TRIED AND REVERTED with measurements: byte-sized
    # post-shuffle coalescing collapses the parallelism of
    # compute-dense small-byte stages (pagerank x10 per-pass 1.7 ->
    # 2.9-3.1 s when the repartition+localCheckpoint'd edge frames
    # coalesce; MinHash verify +19% when the cached signature exchange
    # coalesces under cached-plan AQE), while the wins on toy-scale
    # exchanges were inside the noise band.  The engine's iterative
    # operators deliberately key their layouts for downstream CPU
    # parallelism, not shuffle bytes — see OPTIMIZATION_r15.md batch 6.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    # Runtime Bloom prefilters on selective shuffle joins (J1 at scale):
    # the optimizer injects bloom_filter_agg on the filtered build side
    # and might_contain on the probe side, dropping non-matching fact
    # rows BEFORE the shuffle.  Explicitly pinned (and plan-tested in
    # tests/test_plan_shape.py) rather than left to version defaults;
    # the size thresholds stay at Spark's production defaults.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # PySpark 4 captures the user-code call site on EVERY DataFrame/
    # Column API call (a Python stack walk per call) purely to decorate
    # error messages.  Expression-heavy query builders make thousands of
    # such calls, so this is ~20% of driver-side plan-construction time
    # (measured: 5-query build total 2.32 -> 1.86 s at sf0.1).  Static
    # conf, so it only applies to sessions built here; errors still
    # carry the JVM-side context, just not the Python call site.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # Shuffle/IO codec (guide §2.3: "measure both").  Measured round 15
    # (scripts/codec_probe.py, interleaved min-of-N at sf0.1): zstd is
    # flat-to-worse locally (minhash +4%, pagerank -4%, suffix doubling
    # +6% — all inside the noise band) because local-mode shuffles are
    # KB-MB and loopback-fast, where lz4's lower latency wins.  On a
    # real cluster, where shuffle bytes cross a network, zstd's ~2x
    # better ratio usually pays — set SPARK_GRAFT_IO_CODEC=zstd there
    # and A/B on the deployment's own network/disk balance.
    "spark.io.compression.codec": os.environ.get(
        "SPARK_GRAFT_IO_CODEC", "lz4"
    ),
}


def get_spark(
    app_name: str = "covid19i2b2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores).  On a real cluster, pass ``master=None`` after setting
    ``spark.master`` externally — every engine component only assumes a
    plain SparkSession.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions
        or ((os.cpu_count() or 8) if cpus == "*" else int(cpus))
    )
    if driver_memory:
        conf["spark.driver.memory"] = driver_memory
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_runtime_conf(spark: SparkSession) -> None:
    """Apply runtime-settable engine conf to an externally-created session.

    The driver harness constructs its own SparkSession; queries must not
    assume our builder ran.  Everything in DEFAULT_CONF that is
    runtime-settable is applied here (best-effort: static conf raises and
    is skipped).

    ``spark.io.compression.codec`` is excluded deliberately (ADVICE r15):
    it is a SparkContext-level conf fixed at startup — ``conf.set`` on a
    live session either raises or silently does nothing, so applying it
    here would mislead an operator into thinking SPARK_GRAFT_IO_CODEC
    took effect on an externally-built session.  The env knob only
    applies to sessions built by :func:`get_spark`.
    """
    for k, v in DEFAULT_CONF.items():
        if k == "spark.io.compression.codec":
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf (e.g. spark.ui.enabled) — fine to skip
