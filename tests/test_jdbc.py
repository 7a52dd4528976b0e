"""JDBC source (SURVEY §2.1 S6) exercised END-TO-END against Apache
Derby — the embedded RDBMS Spark ships for its Hive metastore, so the
real ``spark.read.format("jdbc").load()`` path runs in this harness:
driver resolution, partitioned range scans, and filter pushdown into
the database."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.sources.jdbc import read_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _create_derby_table(spark, db_path: str, n_rows: int = 200) -> str:
    """Create a Derby database with an i2b2-shaped observations table via
    the JVM's own JDBC (py4j), outside Spark — so the Spark read below is
    a genuine external-database ingest."""
    jvm = spark._jvm  # noqa: SLF001
    url = f"jdbc:derby:{db_path};create=true"
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        st.executeUpdate(
            "CREATE TABLE observations ("
            "patient_num INT, concept_cd VARCHAR(32), nval_num DOUBLE)"
        )
        ps = conn.prepareStatement(
            "INSERT INTO observations VALUES (?, ?, ?)"
        )
        for i in range(n_rows):
            ps.setInt(1, i % 50)
            ps.setString(2, f"LOINC:{i % 7}")
            ps.setDouble(3, float(i) / 4.0)
            ps.addBatch()
        ps.executeBatch()
    finally:
        conn.close()
    return f"jdbc:derby:{db_path}"


def test_jdbc_partitioned_read_and_pushdown(spark, tmp_path):
    """read_jdbc(...).load(): the configured reader must (a) return the
    exact table contents, (b) split the scan into numPartitions parallel
    range queries on the partition column, and (c) push filters down into
    the database (PushedFilters on the JDBC scan node)."""
    url = _create_derby_table(spark, str(tmp_path / "derbydb"))
    df = read_jdbc(
        spark,
        url,
        "observations",
        partition_column="patient_num",
        lower_bound=0,
        upper_bound=50,
        num_partitions=4,
        driver=DERBY_DRIVER,
    ).load()
    assert df.count() == 200
    # partitioned scan: one range query per partition
    assert df.rdd.getNumPartitions() == 4
    # values round-trip
    got = df.filter(F.col("PATIENT_NUM") == 3).orderBy("NVAL_NUM").collect()
    assert [r.NVAL_NUM for r in got] == [3 / 4, 53 / 4, 103 / 4, 153 / 4]
    # filter pushdown into the database
    filtered = df.filter(F.col("NVAL_NUM") > 40.0).select("PATIENT_NUM")
    plan = filtered._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "PushedFilters" in plan and "NVAL_NUM" in plan, plan
    assert filtered.count() == df.filter(F.col("NVAL_NUM") > 40.0).count() > 0


def test_jdbc_aggregate_over_partitioned_read(spark, tmp_path):
    """An i2b2-shaped aggregate (per-concept count + avg) over the JDBC
    source matches the same aggregate computed in pure Python — the
    ingest feeds the normal DataFrame pipeline unchanged."""
    url = _create_derby_table(spark, str(tmp_path / "derbydb2"), n_rows=140)
    df = read_jdbc(
        spark,
        url,
        "observations",
        partition_column="patient_num",
        lower_bound=0,
        upper_bound=50,
        num_partitions=3,
        driver=DERBY_DRIVER,
    ).load()
    got = {
        r.CONCEPT_CD: (r.n, round(r.avg_val, 6))
        for r in df.groupBy("CONCEPT_CD")
        .agg(F.count("*").alias("n"), F.avg("NVAL_NUM").alias("avg_val"))
        .collect()
    }
    import statistics

    want: dict[str, list[float]] = {}
    for i in range(140):
        want.setdefault(f"LOINC:{i % 7}", []).append(i / 4.0)
    for concept, vals in want.items():
        n, avg = got[concept]
        assert n == len(vals)
        assert abs(avg - statistics.fmean(vals)) < 1e-9
