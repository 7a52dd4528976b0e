"""File sinks.

SURVEY.md §2.1 S4/S5: the reference ends each pipeline with an ordered
SELECT exported as CSV — either as result-set columns or as pre-serialized
CSV lines with a header row (the ``output_as_columns`` / ``output_as_csv``
config switch, 4CE_Phase1.1_Files_mssql.sql:§output ~L980-1100,
reconstructed).

Scale note: ``single_file=True`` coalesces to 1 partition — only sane for
the reference's aggregate outputs (thousands of rows).  Large extracts keep
the partitioned layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def write_csv(
    df: DataFrame,
    path: str,
    order_by: list[str | Column] | None = None,
    single_file: bool = False,
    as_lines: bool = False,
    mode: str = "overwrite",
) -> None:
    """Ordered CSV export (S4) with the reference's two output modes (S5).

    ``as_lines=True`` mirrors the reference's csv-string mode: one varchar
    column containing the pre-joined line (header row included via a
    sort-key union, as the reference does with a ``sort`` column).
    """
    out = df.orderBy(*order_by) if order_by else df
    if as_lines:
        cols = out.columns
        header = out.sparkSession.range(1).select(
            F.lit(",".join(cols)).alias("line"), F.lit(0).alias("_sort")
        )
        body = out.select(
            F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("line"),
            F.lit(1).alias("_sort"),
        )
        lines = header.unionByName(body).orderBy("_sort").select("line")
        (lines.coalesce(1) if single_file else lines).write.mode(mode).text(path)
        return
    writer = (out.coalesce(1) if single_file else out).write.mode(mode)
    writer.option("header", True).csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    split_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Training-data export (north-star sink): JSONL shards — the
    interchange format every trainer/tokenizer toolchain reads.

    The output of pack_sequences/hash_split writes as
    ``path/[split=…/]shard=…/part-*.json`` with one JSON object per line.
    Partitioning by (split, shard) means a trainer reading shard k of
    split 'train' lists exactly one directory, and shards can be
    consumed/resumed independently — the layout contract, not a detail.
    Rows within a shard are repartitioned to one file per shard so a
    shard IS a file (readers assume this); shard counts are chosen by
    pack_sequences' n_shards, so files stay executor-memory-sized at any
    corpus scale."""
    parts = [c for c in ([split_col] if split_col else []) + [shard_col]]
    (
        df.repartition(*[F.col(c) for c in parts])
        .write.mode(mode)
        .partitionBy(*parts)
        .json(path)
    )


def _shard_content_stats(
    df: DataFrame,
    parts: list[str],
    data_cols: list[str],
    token_count_col: str | None = None,
    cast_parts: bool = False,
) -> DataFrame:
    """Per-shard (n_rows, checksum[, n_tokens]) with a MULTISET-safe
    order-independent checksum: bit_xor of xxhash64(row_hash, count)
    over the per-distinct-row-hash counts.  A plain bit_xor of row
    hashes cancels on any even multiset of identical rows (a copy that
    swaps two duplicate rows for two copies of another existing row
    verifies clean); folding the multiplicity into the hashed value
    closes that hole.  Two map-side-combinable aggregates instead of
    one — fine for an integrity gate, not a hot path."""
    row_hash = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in data_cols])))
    part_cols = (
        [F.col(c).cast("string").alias(c) for c in parts]
        if cast_parts
        else [F.col(c) for c in parts]
    )
    first_aggs = [F.count("*").cast("long").alias("__cnt")]
    if token_count_col:
        first_aggs.append(
            F.sum(token_count_col).cast("long").alias("__tok")
        )
    per_hash = df.groupBy(*part_cols, row_hash.alias("__rh")).agg(*first_aggs)
    second_aggs = [
        F.sum("__cnt").cast("long").alias("n_rows"),
        F.bit_xor(F.xxhash64(F.col("__rh"), F.col("__cnt"))).alias("checksum"),
    ]
    if token_count_col:
        second_aggs.append(F.sum("__tok").cast("long").alias("n_tokens"))
    return per_hash.groupBy(*parts).agg(*second_aggs)


def write_shard_manifest(
    spark,
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    split_col: str | None = None,
    token_count_col: str | None = None,
) -> DataFrame:
    """Write the integrity manifest for a :func:`write_training_shards`
    export: one row per (split,) shard with ``n_rows``, an
    order-independent multiset-safe content checksum (bit_xor of
    xxhash64(row_hash, multiplicity) — see :func:`_shard_content_stats`
    for why plain per-row XOR is not enough), optional ``n_tokens``,
    and the shard's on-disk bytes — persisted as JSON under
    ``path/_MANIFEST``.

    The checksum is computed from the DATAFRAME (map-side combined
    aggregates; XOR never overflows and ignores row order), the
    bytes from one driver-side FS listing of the shard directories
    (file-count-bounded).  Trainers and transfer jobs then verify a
    copy with :func:`verify_training_shards` without trusting the
    transport.  Returns the manifest DataFrame."""
    import json as _json

    from pyspark.sql.types import StructType as _St

    parts = ([split_col] if split_col else []) + [shard_col]
    # canonical rendering: SORTED top-level columns, and the EXACT data
    # schema (incl. nested struct field order) recorded in the manifest
    # so verify re-reads with it — schema inference on read-back
    # alphabetizes nested fields, which would change to_json's rendering
    # and fail intact copies
    data_cols = sorted(c for c in df.columns if c not in parts)
    data_schema = _St([df.schema[c] for c in data_cols])
    stats = _shard_content_stats(df, parts, data_cols, token_count_col)

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    sizes = []
    for kv in _iter_partition_dirs(fs, root, parts):
        dirpath, values = kv
        total = fs.getContentSummary(dirpath).getLength()
        sizes.append(tuple(values) + (int(total),))
    sizes_df = spark.createDataFrame(
        sizes, ", ".join([f"{c} string" for c in parts] + ["n_bytes long"])
    )
    manifest = stats
    for c in parts:  # partition values listed from dir names are strings
        manifest = manifest.withColumn(c, F.col(c).cast("string"))
    manifest = (
        manifest.join(sizes_df, parts, "full_outer")
        .withColumn(
            "schema_json", F.lit(_json.dumps(data_schema.jsonValue()))
        )
        # version 2 = multiset checksum (xxhash64(row_hash, count) XOR);
        # absent/1 = legacy per-row XOR — verify dispatches on this so
        # pre-upgrade manifests still verify (review r5)
        .withColumn("checksum_version", F.lit(2))
    )
    manifest.coalesce(1).write.mode("overwrite").json(f"{path}/_MANIFEST")
    return manifest


def _iter_partition_dirs(fs, root, parts: list[str]):
    """Yield (leaf_dir_path, [value, ...]) for path/[p0=v0/]p1=v1 dirs."""

    def walk(dirpath, remaining, values):
        if not remaining:
            yield dirpath, values
            return
        key = remaining[0]
        for st in fs.listStatus(dirpath):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name.startswith(f"{key}="):
                yield from walk(
                    st.getPath(), remaining[1:], values + [name.split("=", 1)[1]]
                )

    yield from walk(root, parts, [])


def verify_training_shards(
    spark,
    path: str,
    shard_col: str = "shard",
    split_col: str | None = None,
) -> DataFrame:
    """Re-read an exported shard tree, recompute per-shard row counts
    and checksums, and compare against ``path/_MANIFEST``: returns one
    row per shard with ``ok`` (rows AND checksum match) plus both sides
    of each number — the post-transfer integrity gate.  A shard present
    in only one side reports ok=false (nulls on the missing side)."""
    import json as _json

    from pyspark.sql.types import StructType as _St

    parts = ([split_col] if split_col else []) + [shard_col]
    # an integrity check must see the files AS THEY ARE NOW — drop any
    # cached listing (stale sizes from a pre-corruption read otherwise
    # fail the scan outright instead of failing the comparison)
    spark.catalog.refreshByPath(path)
    manifest_raw = spark.read.json(f"{path}/_MANIFEST")
    manifest = manifest_raw.select(
        *parts,
        F.col("n_rows").alias("manifest_rows"),
        F.col("checksum").alias("manifest_checksum"),
    )
    # read with the WRITER'S schema (recorded in the manifest) so nested
    # struct field order — and therefore to_json's rendering — matches
    # the write-side checksum exactly
    if "schema_json" in manifest_raw.columns:
        ddl = manifest_raw.select("schema_json").first()["schema_json"]
        schema = _St.fromJson(_json.loads(ddl))
        data = spark.read.schema(schema).json(path)
    else:
        data = spark.read.json(path)
    data_cols = sorted(c for c in data.columns if c not in parts)
    # checksum_version dispatch: manifests written before the multiset
    # checksum (version field absent) carry the legacy per-row XOR —
    # recompute with the matching formula so intact old exports still
    # verify ok (review r5)
    version = 1
    if "checksum_version" in manifest_raw.columns:
        v = manifest_raw.select("checksum_version").first()[0]
        version = int(v) if v is not None else 1
    if version >= 2:
        actual = _shard_content_stats(data, parts, data_cols, cast_parts=True)
    else:
        row_hash = F.xxhash64(
            F.to_json(F.struct(*[F.col(c) for c in data_cols]))
        )
        actual = data.groupBy(
            *[F.col(c).cast("string").alias(c) for c in parts]
        ).agg(
            F.count("*").cast("long").alias("n_rows"),
            F.bit_xor(row_hash).alias("checksum"),
        )
    actual = actual.select(
        *parts,
        F.col("n_rows").alias("actual_rows"),
        F.col("checksum").alias("actual_checksum"),
    )
    return manifest.join(actual, parts, "full_outer").select(
        *parts,
        "manifest_rows",
        "actual_rows",
        "manifest_checksum",
        "actual_checksum",
        (
            F.col("manifest_rows").eqNullSafe(F.col("actual_rows"))
            & F.col("manifest_checksum").eqNullSafe(F.col("actual_checksum"))
        ).alias("ok"),
    )
