"""Sources/sinks/layout tests: CSV line-mode export (S5), CSV/JSON
readers, JDBC reader config (S6), and the bucketed shuffle-free join
(SURVEY §4.2 — the 100 TB layout claim, pinned by a plan assertion)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from covid19i2b2_spark.sources.files import read_csv, read_json
from covid19i2b2_spark.sources.jdbc import read_jdbc
from covid19i2b2_spark.sources.layout import write_bucketed
from covid19i2b2_spark.sources.sinks import write_csv
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def test_csv_line_mode_export(spark, tmp_path):
    """S5: the reference's output_as_csv mode — one varchar column of
    pre-joined lines with a header row first."""
    df = read_table(spark, SF_DIR, "region")
    out = str(tmp_path / "lines")
    write_csv(df, out, order_by=["r_regionkey"], single_file=True, as_lines=True)
    lines = [r.value for r in spark.read.text(out).collect()]
    assert lines[0] == "r_regionkey,r_name"
    assert len(lines) == 1 + df.count()
    assert all("," in ln for ln in lines)


def test_csv_and_json_round_trip(spark, tmp_path):
    df = read_table(spark, SF_DIR, "nation")
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    write_csv(df, csv_dir, order_by=["n_nationkey"])
    df.write.mode("overwrite").json(json_dir)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back_csv = read_csv(spark, csv_dir, schema)
    back_json = read_json(spark, json_dir, schema)
    assert back_csv.count() == df.count() == back_json.count()
    assert back_csv.schema == schema == back_json.schema


def test_jdbc_reader_is_partition_configured(spark):
    reader = read_jdbc(
        spark, "jdbc:postgresql://db/i2b2", "observation_fact", num_partitions=32
    )
    # the reader is configured for a partitioned scan; no DB in the
    # harness so .load() is out of scope
    opts = reader._jreader.toString()  # smoke: object exists and is jdbc
    assert reader is not None and "DataFrameReader" in type(reader).__name__


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Write orders+customer bucketed by the join key -> the join plan has
    no Exchange on either side (co-located buckets)."""
    # (warehouse dir is static conf; managed tables land in
    # ./spark-warehouse and are dropped below)
    orders = read_table(spark, SF_DIR, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = read_table(spark, SF_DIR, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    write_bucketed(orders, "orders_b", ["custkey"], n_buckets=8)
    write_bucketed(cust, "cust_b", ["custkey"], n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(spark.table("cust_b"), "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_date_partitioned_layout_prunes(spark, tmp_path):
    """write_date_partitioned + read_date_range: the range filter lands in
    the scan's PartitionFilters and row counts match an unpruned filter."""
    from covid19i2b2_spark.plans import physical_plan
    from covid19i2b2_spark.sources import layout
    from covid19i2b2_spark.sources.tables import read_table as read_td

    events = read_td(spark, SF_DIR, "events")
    path = str(tmp_path / "events_by_day")
    layout.write_date_partitioned(events, path, "ts")

    lo, hi = "2024-01-05", "2024-01-08"
    pruned = layout.read_date_range(spark, path, lo, hi)
    plan = physical_plan(pruned)
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "event_date" in part_lines[0], plan

    import pyspark.sql.functions as F

    expect = events.filter(F.to_date("ts").between(lo, hi)).count()
    assert pruned.count() == expect > 0


def test_dynamic_partition_pruning_over_date_layout(spark, tmp_path):
    """Joining the date-partitioned layout against a small filtered date
    dimension triggers dynamic partition pruning: the partitioned scan
    carries a dynamicpruning subquery filter instead of reading every
    partition."""
    import pyspark.sql.functions as F

    from covid19i2b2_spark.plans import physical_plan
    from covid19i2b2_spark.sources import layout
    from covid19i2b2_spark.sources.tables import read_table as read_td

    events = read_td(spark, SF_DIR, "events")
    path = str(tmp_path / "events_dpp")
    layout.write_date_partitioned(events, path, "ts")

    fact = spark.read.parquet(path)
    dates = (
        events.select(F.to_date("ts").alias("event_date"))
        .dropDuplicates()
        .filter(F.dayofmonth("event_date") <= 3)  # non-partition-col filter
    )
    joined = fact.join(dates, "event_date").groupBy("event_date").count()
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan
    got = {r["event_date"] for r in joined.collect()}
    assert got and all(d.day <= 3 for d in got)


def test_write_training_shards_layout(spark, tmp_path):
    """JSONL shard export: one directory per (split, shard), one JSON
    object per line, round-trips through a plain JSON read."""
    import glob as _glob
    import json as _json

    from covid19i2b2_spark.sources.sinks import write_training_shards

    df = spark.createDataFrame(
        [(i, f"text {i}", i % 3, "train" if i % 5 else "val") for i in range(30)],
        "doc_id long, text string, shard long, split string",
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, split_col="split")
    back = spark.read.json(path)
    assert back.count() == 30
    assert {r.doc_id for r in back.collect()} == set(range(30))
    # layout contract: split=/shard= directories, one part file per shard
    for split, n_shards in (("train", 3), ("val", 3)):
        dirs = sorted(_glob.glob(f"{path}/split={split}/shard=*"))
        assert len(dirs) <= n_shards and dirs
        for d in dirs:
            parts = [p for p in _glob.glob(f"{d}/part-*") if not p.endswith(".crc")]
            assert len(parts) == 1  # a shard IS a file
            with open(parts[0]) as f:
                for line in f:
                    _json.loads(line)  # valid JSONL


def test_zorder_layout_clusters_both_columns(spark, tmp_path):
    """write_zordered: per-file min/max ranges of BOTH clustering columns
    are a small fraction of the global range — the statistics property
    parquet row-group/file skipping feeds on.  A lexicographic sort
    clusters only its leading column; z-order must cluster both."""
    import glob as _glob

    import pyarrow.parquet as _pq

    from covid19i2b2_spark.sources.layout import write_zordered
    from covid19i2b2_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "zorders")
    write_zordered(orders, path, ["o_custkey", "o_totalprice"], n_files=8)

    back = spark.read.parquet(path)
    assert back.count() == orders.count()  # content preserved

    spans = {"o_custkey": [], "o_totalprice": []}
    glb = {}
    for col in spans:
        row = orders.agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        glb[col] = float(row.hi) - float(row.lo)
    files = [
        f
        for f in _glob.glob(f"{path}/part-*")
        if f.endswith(".parquet") or ".snappy" in f
    ]
    assert len(files) > 3
    for f in files:
        md = _pq.ParquetFile(f).metadata
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        for col in spans:
            idx = schema_names.index(col)
            lo = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            spans[col].append((float(hi) - float(lo)) / glb[col])
    # average per-file span must be well below the global range on BOTH
    # dimensions (a plain sort achieves this on one dimension only)
    for col, fr in spans.items():
        assert sum(fr) / len(fr) < 0.7, (col, fr)


def test_zorder_clamps_bits_to_64bit_key(spark, tmp_path):
    """5 cols x default 16 bits would overflow the 64-bit morton key
    (JVM shifts wrap mod 64, silently scrambling the interleave);
    write_zordered must auto-reduce bits and still produce a correct,
    readable table."""
    from covid19i2b2_spark.sources.tables import read_table
    from covid19i2b2_spark.sources.layout import write_zordered
    from tests.conftest import SF_DIR

    orders = (
        read_table(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp").cast("long"))
        .withColumn("o_mod", F.col("o_orderkey") % 7)
    )
    path = str(tmp_path / "z5")
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_mod"]
    write_zordered(orders, path, cols, bits=16, n_files=4)
    assert spark.read.parquet(path).count() == orders.count()


def test_read_evolving_snapshots_aligns_by_name(spark, tmp_path):
    """Snapshots written at three schema versions (base; +score; +score
    +license, score moved position) read back as one frame aligned by
    NAME with NULLs where a snapshot lacked the column, each row tagged
    with its snapshot path; filters still push into each scan."""
    from covid19i2b2_spark.sources.files import read_evolving_snapshots

    p1, p2, p3 = (str(tmp_path / f"snap{i}") for i in (1, 2, 3))
    spark.createDataFrame(
        [(1, "alpha")], "doc_id long, text string"
    ).write.parquet(p1)
    spark.createDataFrame(
        [(2, "beta", 0.9)], "doc_id long, text string, score double"
    ).write.parquet(p2)
    spark.createDataFrame(
        [(3, 0.7, "cc-by", "gamma")],
        "doc_id long, score double, license string, text string",
    ).write.parquet(p3)
    out = read_evolving_snapshots(spark, [p1, p2, p3])
    rows = {r.doc_id: r for r in out.collect()}
    assert set(out.columns) == {"doc_id", "text", "score", "license", "snapshot"}
    assert rows[1].score is None and rows[1].license is None
    assert rows[2].score == 0.9 and rows[2].license is None
    assert rows[3].license == "cc-by" and rows[3].text == "gamma"
    assert rows[1].snapshot.endswith("snap1")
    # per-snapshot scans keep pushdown: a doc_id filter reaches parquet
    from covid19i2b2_spark.plans import physical_plan

    plan = physical_plan(out.filter(F.col("doc_id") == 3))
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,3)]" in plan, plan
    import pytest as _pt

    with _pt.raises(ValueError):
        read_evolving_snapshots(spark, [])


def test_read_json_with_quarantine_routes_bad_lines(spark, tmp_path):
    """Crawl ingest: malformed JSONL lines land in the quarantine frame
    (raw line preserved for replay), clean lines parse to exactly the
    declared schema — nothing dropped, nothing fatal, one parse pass."""
    from pyspark.sql.types import LongType, StringType, StructType

    from covid19i2b2_spark.sources.files import read_json_with_quarantine

    p = tmp_path / "crawl.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "alpha"}',
                '{"doc_id": 2, "text": "beta"',  # truncated — malformed
                "not json at all",
                '{"doc_id": "three", "text": "gamma"}',  # type mismatch
                '{"doc_id": 4, "text": "delta"}',
            ]
        )
    )
    schema = (
        StructType().add("doc_id", LongType()).add("text", StringType())
    )
    good, bad = read_json_with_quarantine(spark, str(p), schema)
    assert good.columns == ["doc_id", "text"]
    assert {r["doc_id"] for r in good.collect()} == {1, 4}
    raws = [r["raw_line"] for r in bad.collect()]
    assert len(raws) == 3
    assert any("not json at all" in r for r in raws)
    assert any('"three"' in r for r in raws)  # half-parsed lines kept whole

    # declaring a colliding data column is a hard error, not silent
    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_json_with_quarantine(
            spark,
            str(p),
            StructType().add("_corrupt_record", StringType()),
        )


def test_read_csv_with_quarantine_routes_bad_lines(spark, tmp_path):
    """CSV twin: type-mismatched and over-width lines quarantine with
    their raw text; repeated header lines (common in concatenated crawl
    shards) are dropped by value when header=True."""
    from pyspark.sql.types import LongType, StringType, StructType

    from covid19i2b2_spark.sources.files import read_csv_with_quarantine

    p = tmp_path / "shard.csv"
    p.write_text(
        "\n".join(
            [
                "doc_id,text",
                "1,alpha",
                "oops,beta",          # doc_id not a long
                "doc_id,text",        # mid-stream repeated header
                "doc_id, text",       # header variant: space after sep
                '"Doc_Id","Text"',    # header variant: quoted + cased
                "2,gamma",
            ]
        )
    )
    schema = (
        StructType().add("doc_id", LongType()).add("text", StringType())
    )
    good, bad = read_csv_with_quarantine(spark, str(p), schema, header=True)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    raws = [r["raw_line"] for r in bad.collect()]
    assert raws == ["oops,beta"]


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """Compaction must collapse a many-tiny-files layout into the byte-
    target-derived file count, preserve every row, and (with
    sort_within_by) restore selective min/max footer clustering."""
    import glob

    from covid19i2b2_spark.sources.layout import compact_parquet

    src = str(tmp_path / "frag")
    # 64 micro-batch-sized files
    spark.range(20_000).selectExpr(
        "id", "id % 7 as k", "repeat('x', 20) as pad"
    ).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64

    dst = str(tmp_path / "compact")
    n = compact_parquet(
        spark, src, dst, target_file_bytes=1 << 30, sort_within_by=["id"]
    )
    assert n == 1
    files = glob.glob(f"{dst}/*.parquet")
    assert len(files) == 1
    back = spark.read.parquet(dst)
    assert back.count() == 20_000
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(20_000))

    # a tiny byte target forces multiple output files
    dst2 = str(tmp_path / "compact2")
    n2 = compact_parquet(spark, src, dst2, target_file_bytes=64 * 1024)
    assert n2 > 1
    assert len(glob.glob(f"{dst2}/*.parquet")) == n2


def test_shard_manifest_and_verify(spark, tmp_path):
    """Export manifest + integrity gate: write shards, write manifest,
    verify ok everywhere; corrupt one shard file (append a row) and the
    verify must flag exactly that shard with both sides reported."""
    import glob

    from covid19i2b2_spark.sources.sinks import (
        verify_training_shards,
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.range(300).selectExpr(
        "id", "concat('text ', id) as text", "cast(id % 4 as long) as shard"
    )
    path = str(tmp_path / "export")
    write_training_shards(df, path, shard_col="shard")
    man = write_shard_manifest(spark, df, path, shard_col="shard")
    assert man.count() == 4
    assert man.filter(F.col("n_bytes") > 0).count() == 4

    ok = verify_training_shards(spark, path, shard_col="shard")
    assert ok.count() == 4
    assert ok.filter(~F.col("ok")).count() == 0

    # corrupt shard 2: append one JSON line to its file.  Drop Hadoop's
    # local .crc sidecar for that file — a copy to object storage would
    # not carry it, and with it present the LocalFileSystem fails the
    # READ instead of letting the manifest comparison catch the change
    import os

    victim = glob.glob(f"{path}/shard=2/*.json")[0]
    with open(victim, "a") as f:
        f.write('{"id": 99999, "text": "injected"}\n')
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    after = {
        r["shard"]: r["ok"]
        for r in verify_training_shards(spark, path, shard_col="shard").collect()
    }
    assert after == {"0": True, "1": True, "2": False, "3": True}


def test_shard_manifest_verifies_nested_structs(spark, tmp_path):
    """Regression (review r4): nested struct fields re-read from JSON
    infer alphabetized, which would change the to_json rendering — the
    manifest records the writer's schema and verify re-reads with it,
    so an intact copy of a nested-struct export verifies ok."""
    from covid19i2b2_spark.sources.sinks import (
        verify_training_shards,
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.range(60).selectExpr(
        "id",
        "named_struct('b', id * 2, 'a', concat('x', id)) as meta",
        "cast(id % 2 as long) as shard",
    )
    assert [f.name for f in df.schema["meta"].dataType.fields] == ["b", "a"]
    path = str(tmp_path / "nested")
    write_training_shards(df, path, shard_col="shard")
    write_shard_manifest(spark, df, path, shard_col="shard")
    ok = verify_training_shards(spark, path, shard_col="shard")
    assert ok.count() == 2
    assert ok.filter(~F.col("ok")).count() == 0


def test_csv_header_routing_quarantine(spark, tmp_path):
    """Regression (ADVICE r4): a data row that coincidentally equals the
    header is silently deleted under header_routing='drop' (documented
    hazard); 'quarantine' keeps every matched line visible and
    countable in the quarantine frame instead."""
    import pytest as _pytest
    from pyspark.sql.types import LongType, StringType, StructType

    from covid19i2b2_spark.sources.files import read_csv_with_quarantine

    p = tmp_path / "shard.csv"
    p.write_text(
        "\n".join(
            [
                "doc_id,text",
                "1,alpha",
                "oops,beta",
                "doc_id,text",  # repeated header (or a matching data row)
                "2,gamma",
            ]
        )
    )
    schema = (
        StructType().add("doc_id", LongType()).add("text", StringType())
    )
    good, bad = read_csv_with_quarantine(
        spark, str(p), schema, header=True, header_routing="quarantine"
    )
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    raws = sorted(r["raw_line"] for r in bad.collect())
    assert raws == ["doc_id,text", "doc_id,text", "oops,beta"]

    with _pytest.raises(ValueError, match="header_routing"):
        read_csv_with_quarantine(
            spark, str(p), schema, header=True, header_routing="nope"
        )


def test_shard_manifest_multiset_checksum(spark, tmp_path):
    """Regression (ADVICE r4): a plain bit_xor of row hashes cancels on
    even multisets — a copy that swaps a duplicate PAIR for two copies
    of another existing row preserved both n_rows and the old checksum
    and verified clean.  The multiset checksum (xor of
    xxhash64(row_hash, count)) must flag it."""
    import glob
    import os

    from covid19i2b2_spark.sources.sinks import (
        verify_training_shards,
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("b", 0), ("b", 0)], "text string, shard long"
    )
    path = str(tmp_path / "dup_export")
    write_training_shards(df, path, shard_col="shard")
    write_shard_manifest(spark, df, path, shard_col="shard")
    ok = verify_training_shards(spark, path, shard_col="shard")
    assert ok.filter(~F.col("ok")).count() == 0

    # tamper: replace the two "b" rows with two more copies of the "a"
    # row — same row count, and the per-row XOR is 0 both before
    # (hA^hA^hB^hB) and after (hA^hA^hA^hA)
    victim = glob.glob(f"{path}/shard=0/*.json")[0]
    with open(victim) as f:
        lines = f.read().splitlines()
    a_line = next(ln for ln in lines if '"a"' in ln)
    tampered = [a_line if '"b"' in ln else ln for ln in lines]
    assert len(tampered) == len(lines)
    with open(victim, "w") as f:
        f.write("\n".join(tampered) + "\n")
    crc = os.path.join(
        os.path.dirname(victim), f".{os.path.basename(victim)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    after = verify_training_shards(spark, path, shard_col="shard")
    flagged = after.filter(~F.col("ok")).collect()
    assert len(flagged) == 1 and flagged[0]["shard"] == "0"
    # row counts alone would NOT have caught it
    assert flagged[0]["manifest_rows"] == flagged[0]["actual_rows"] == 4


def test_compact_partitioned_preserves_layout(spark, tmp_path):
    """Round-5 (VERDICT r4 #6): partition-aware compaction must compact
    only the fragmented partitions, copy healthy ones byte-for-byte,
    preserve the k=v layout (no flattening), and preserve every row."""
    import glob

    import pytest as _pytest

    from covid19i2b2_spark.sources.layout import (
        compact_parquet,
        compact_partitioned,
    )

    src = str(tmp_path / "tree")
    # partition k=0: fragmented (16 files); k=1: healthy (1 file)
    spark.range(4000).selectExpr("id", "0 as k").repartition(16).write.partitionBy(
        "k"
    ).parquet(src)
    spark.range(4000, 5000).selectExpr("id", "1 as k").coalesce(1).write.mode(
        "append"
    ).partitionBy("k").parquet(src)
    assert len(glob.glob(f"{src}/k=0/*.parquet")) == 16
    n_k1 = len(glob.glob(f"{src}/k=1/*.parquet"))

    dst = str(tmp_path / "compacted")
    out = compact_partitioned(
        spark, src, dst, small_file_threshold=8
    )
    assert set(out) == {"k=0", "k=1"}
    assert out["k=0"] == 1  # sized from bytes: tiny partition -> 1 file
    assert out["k=1"] == n_k1  # below threshold: copied, not rewritten
    assert len(glob.glob(f"{dst}/k=0/*.parquet")) == 1
    assert len(glob.glob(f"{dst}/k=1/*.parquet")) == n_k1

    # layout preserved: partition column re-inferred, rows identical
    before = spark.read.parquet(src)
    after = spark.read.parquet(dst)
    assert [f.name for f in after.schema.fields] == [
        f.name for f in before.schema.fields
    ]
    assert after.count() == 5000
    assert (
        after.selectExpr("sum(id)", "count(distinct k)").collect()
        == before.selectExpr("sum(id)", "count(distinct k)").collect()
    )

    # flat (unpartitioned) input: clear error pointing at compact_parquet
    flat = str(tmp_path / "flat")
    spark.range(100).write.parquet(flat)
    with _pytest.raises(ValueError, match="compact_parquet"):
        compact_partitioned(spark, flat, str(tmp_path / "flat_out"))


def test_compact_partitioned_rerun_is_idempotent(spark, tmp_path):
    """Regression (review r5): re-running compact_partitioned into an
    existing dst_root (crash-retry path) must not nest copied
    partitions as dst/k=1/k=1 — FileUtil.copy into an existing dir
    redirects to a subdirectory without error."""
    import glob

    from covid19i2b2_spark.sources.layout import compact_partitioned

    src = str(tmp_path / "tree")
    spark.range(1000).selectExpr("id", "pmod(id, 2) as k").coalesce(
        1
    ).write.partitionBy("k").parquet(src)
    dst = str(tmp_path / "out")
    first = compact_partitioned(spark, src, dst, small_file_threshold=99)
    second = compact_partitioned(spark, src, dst, small_file_threshold=99)
    assert first == second
    assert not glob.glob(f"{dst}/k=*/k=*")  # no nesting
    spark.catalog.refreshByPath(dst)
    assert spark.read.parquet(dst).count() == 1000


def test_shard_manifest_legacy_checksum_fallback(spark, tmp_path):
    """Regression (review r5): a manifest written BEFORE the multiset
    checksum (no checksum_version field, legacy per-row XOR) must still
    verify ok on intact data — verify dispatches on the version."""
    import glob
    import json

    from pyspark.sql import functions as F

    from covid19i2b2_spark.sources.sinks import (
        verify_training_shards,
        write_shard_manifest,
        write_training_shards,
    )

    df = spark.range(100).selectExpr(
        "id", "concat('t', id) as text", "cast(id % 2 as long) as shard"
    )
    path = str(tmp_path / "legacy_export")
    write_training_shards(df, path, shard_col="shard")
    write_shard_manifest(spark, df, path, shard_col="shard")

    # rewrite the manifest as a LEGACY one: per-row XOR checksum, no
    # checksum_version field (what pre-upgrade exports carry)
    data_cols = ["id", "text"]
    legacy = (
        spark.read.json(path)
        .groupBy(F.col("shard").cast("string").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.bit_xor(
                F.xxhash64(
                    F.to_json(F.struct(*[F.col(c) for c in data_cols]))
                )
            ).alias("checksum"),
        )
        .collect()
    )
    man_file = glob.glob(f"{path}/_MANIFEST/*.json")[0]
    old_lines = [json.loads(ln) for ln in open(man_file)]
    by_shard = {r["shard"]: r for r in legacy}
    with open(man_file, "w") as f:
        for row in old_lines:
            row.pop("checksum_version", None)
            row["checksum"] = by_shard[row["shard"]]["checksum"]
            f.write(json.dumps(row) + "\n")
    import os

    crc = os.path.join(
        os.path.dirname(man_file), f".{os.path.basename(man_file)}.crc"
    )
    if os.path.exists(crc):
        os.remove(crc)

    ok = verify_training_shards(spark, path, shard_col="shard")
    assert ok.filter(~F.col("ok")).count() == 0
    assert ok.count() == 2


def test_corpus_formats_roundtrip_and_pushdown(spark, tmp_path):
    """Format-general corpus IO (sources/formats.py, round 7): the
    documents table round-trips byte-identically through parquet, ORC,
    JSON, and CSV; ORC serves predicate pushdown like parquet; the
    weakly-typed formats refuse to read without a schema; avro raises
    its env-fence explanation."""
    import pytest as _pt

    from covid19i2b2_spark.sources.formats import read_corpus, write_corpus
    from covid19i2b2_spark.sources.tables import read_table

    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    want = sorted(map(tuple, docs.collect()))
    schema = docs.schema

    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"docs_{fmt}")
        write_corpus(docs, path, fmt=fmt)
        back = read_corpus(
            spark, path, fmt=fmt,
            schema=None if fmt in ("parquet", "orc") else schema,
        )
        assert back.schema == schema, fmt
        assert sorted(map(tuple, back.collect())) == want, fmt

    # ORC pushdown parity with parquet: the filter reaches the scan
    from covid19i2b2_spark.plans.explain import physical_plan

    orc = read_corpus(spark, str(tmp_path / "docs_orc"), fmt="orc")
    plan = physical_plan(orc.filter(F.col("doc_id") < 100))
    assert "PushedFilters: [" in plan and "doc_id" in plan.split(
        "PushedFilters"
    )[1][:120], plan

    # weakly-typed formats refuse schema-less reads
    with _pt.raises(ValueError, match="explicit schema"):
        read_corpus(spark, str(tmp_path / "docs_json"), fmt="json")
    with _pt.raises(ValueError, match="avro"):
        write_corpus(docs, str(tmp_path / "docs_avro"), fmt="avro")
    with _pt.raises(ValueError, match="fmt must be"):
        write_corpus(docs, str(tmp_path / "docs_x"), fmt="xml")

    # embedded newlines / quotes / separators in text must round-trip
    # through the TEXT formats too (review r7: without multiLine the
    # CSV reader tears quoted multi-line documents into garbage rows)
    tricky = spark.createDataFrame(
        [
            (1, "line one\nline two\nline three"),
            (2, 'she said "hi, there" — then left'),
            (3, "trailing comma, and a\r\nwindows newline"),
        ],
        "doc_id long, text string",
    )
    twant = sorted(map(tuple, tricky.collect()))
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"tricky_{fmt}")
        write_corpus(tricky, path, fmt=fmt)
        back = read_corpus(spark, path, fmt=fmt, schema=tricky.schema)
        assert sorted(map(tuple, back.collect())) == twant, fmt

    # NULL vs empty-string must survive the CSV round trip DISTINCTLY
    # (ADVICE r7: Spark's default nullValue/emptyValue collapse a
    # written empty string to NULL on read; the \N sentinel fixes it)
    ne = spark.createDataFrame(
        [(1, None, "x"), (2, "", "y"), (3, "val", None), (4, "", "")],
        "doc_id long, a string, b string",
    )
    newant = sorted(
        map(tuple, ne.collect()), key=lambda t: t[0]
    )
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"nullempty_{fmt}")
        write_corpus(ne, path, fmt=fmt)
        back = read_corpus(spark, path, fmt=fmt, schema=ne.schema)
        got = sorted(map(tuple, back.collect()), key=lambda t: t[0])
        assert got == newant, (fmt, got)
