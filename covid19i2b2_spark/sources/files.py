"""CSV/JSON readers with enforced schemas (engine surface beyond the
parquet default; SURVEY §2.1).  Never infer schemas in production — an
inference pass is a full extra scan at 100 TB and silently drifts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), **options)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    return spark.read.schema(schema).options(**options).json(path)


def read_json_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Crawl-grade JSONL ingest: parse with the enforced schema in
    PERMISSIVE mode and ROUTE rather than drop or die — returns
    ``(good, quarantine)``.

    - ``good``: rows that parsed clean, exactly ``schema``'s columns;
    - ``quarantine``: the raw line of every row that failed to parse
      (or half-parsed: PERMISSIVE nulls out bad fields and captures the
      whole line), for audit/replay.

    At 100 TB of crawl data malformed lines are a certainty, FAILFAST
    dies on the first one, and DROPMALFORMED silently biases the corpus
    (breakage correlates with source); quarantining keeps the pipeline
    total AND accountable.  Both frames come from ONE parse pass over
    the files (the split is two filters on the same scan — Spark plans
    the JSON parse per-branch, no shuffle either way).

    Implementation note: reads LINES (text source) and parses with
    ``from_json`` rather than ``spark.read.json`` — the raw-JSON reader
    refuses plans that reference only its corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN; the
    documented workaround is caching the scan, a non-starter at crawl
    scale).  As an expression, the parse runs inside whole-stage
    codegen and each branch stays an independent scan+filter."""
    from pyspark.sql import functions as F

    return _parse_and_route(
        spark.read.text(path),
        schema,
        corrupt_col,
        lambda full, opts: F.from_json("value", full, opts),
        options,
    )


def _parse_and_route(
    lines: "DataFrame",
    schema: StructType,
    corrupt_col: str,
    parse,
    options: dict,
) -> tuple[DataFrame, DataFrame]:
    """Shared quarantine plumbing for the line-oriented readers: extend
    the schema with the corrupt column, parse each line with the given
    expression builder, and split one scan into (good rows with exactly
    the declared schema, raw quarantine lines)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    if corrupt_col in schema.fieldNames():
        raise ValueError(f"{corrupt_col!r} collides with a data column")
    full = StructType(list(schema.fields)).add(corrupt_col, StringType())
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": corrupt_col,
        **options,
    }
    parsed = lines.select(
        F.col("value").alias("raw_line"), parse(full, opts).alias("d")
    )
    bad_flag = F.col(f"d.{corrupt_col}").isNotNull() | F.col("d").isNull()
    good = parsed.filter(~bad_flag).select(
        *[F.col(f"d.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(bad_flag).select("raw_line")
    return good, quarantine


def read_csv_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = False,
    corrupt_col: str = "_corrupt_record",
    header_routing: str = "drop",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_json_with_quarantine`: one text scan,
    ``from_csv`` in PERMISSIVE mode, split into (good, quarantine raw
    lines).  ``header=True`` treats header lines BY VALUE anywhere in
    the stream (crawl shards repeat headers mid-file): a line counts as
    a header when its cells — split on the sep, trimmed, unquoted,
    case-folded — equal the schema's field names, so 'name, city' and
    '"Name","City"' variants are caught, not just the byte-exact
    rendering.

    FALSE-POSITIVE HAZARD: a legitimate data row whose cells
    coincidentally equal the field names is indistinguishable from a
    repeated header, and the cell split does not honor quoted
    separators (a quoted field containing the sep splits too many
    cells — which can only cause a MISSED header, never a false drop,
    since the cell count then mismatches).  ``header_routing`` decides
    what happens to matched lines: ``"drop"`` (default) discards them
    silently — correct when the corpus genuinely repeats headers;
    ``"quarantine"`` routes them into the quarantine frame instead, so
    they stay visible and countable (pick this when a data row matching
    the header is conceivable for your schema)."""
    import re

    from pyspark.sql import functions as F

    if header_routing not in ("drop", "quarantine"):
        raise ValueError(
            f"header_routing must be 'drop' or 'quarantine', got {header_routing!r}"
        )
    lines = spark.read.text(path)
    header_lines = None
    if header:
        sep = options.get("sep", ",")
        cells = F.transform(
            F.split(F.col("value"), re.escape(sep)),
            lambda x: F.lower(F.regexp_replace(F.trim(x), '^"|"$', "")),
        )
        names = F.array(
            *[F.lit(n.lower()) for n in schema.fieldNames()]
        )
        if header_routing == "quarantine":
            header_lines = lines.filter(cells == names).select(
                F.col("value").alias("raw_line")
            )
        lines = lines.filter(~(cells == names))
    good, quarantine = _parse_and_route(
        lines,
        schema,
        corrupt_col,
        lambda full, opts: F.from_csv("value", full.simpleString(), opts),
        options,
    )
    if header_lines is not None:
        quarantine = quarantine.unionAll(header_lines)
    return good, quarantine


def read_evolving_snapshots(
    spark: SparkSession,
    paths: list[str],
    snapshot_col: str | None = "snapshot",
) -> DataFrame:
    """Read a sequence of parquet snapshots whose schemas EVOLVED over
    time (later crawls add columns — quality scores, license tags,
    embedding ids) into one frame: the union of all columns, with
    missing ones NULL, optionally tagged with the source snapshot path.

    Two schema-evolution strategies, composed:

    - within one path, Spark's native ``mergeSchema`` reconciles files
      written at different schema versions (footer-level merge — no
      data pass);
    - across paths, ``unionByName(allowMissingColumns=True)`` aligns by
      COLUMN NAME, never position — the only safe alignment when
      snapshots dropped or reordered columns.

    Scale note: each snapshot stays an independent parquet scan with
    its own pushdown/pruning; the union is plan-level (no shuffle).
    Type CONFLICTS (same column, different type) are not silently cast
    — Spark raises, which is the correct failure mode for a corpus
    store; reconcile types upstream."""
    if not paths:
        raise ValueError("paths must be non-empty")
    frames = []
    for p in paths:
        df = spark.read.option("mergeSchema", "true").parquet(p)
        if snapshot_col is not None:
            from pyspark.sql import functions as F

            df = df.withColumn(snapshot_col, F.lit(p))
        frames.append(df)
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
