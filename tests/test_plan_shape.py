"""Plan-shape assertions (SURVEY §5.2 item 4): pin the physical properties
the 100 TB design depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.plans import (
    assert_broadcast_hash_join,
    assert_no_nested_loop,
    assert_take_ordered,
    physical_plan,
    pushed_filters,
)
from covid19i2b2_spark.registry import REGISTRY, all_queries
from tests.conftest import SF_DIR

all_queries()


def test_equality_and_prefix_filters_push_down_to_parquet(spark):
    df = REGISTRY["q_filter_predicates"].fn(spark, SF_DIR)
    pf = pushed_filters(df)
    assert "p_size" in pf, pf
    assert "StringStartsWith" in pf, pf


def test_date_bound_pushes_down(spark):
    df = REGISTRY["q_agg_basic"].fn(spark, SF_DIR)
    assert "l_shipdate" in pushed_filters(df), pushed_filters(df)


def test_column_pruning_reaches_scan(spark):
    # q_scalar_funcs ceded its registry slot in round 15 (to
    # q_exact_substr_dedup) — resolve the shipped query directly
    from covid19i2b2_spark.queries.scalar import q_scalar_funcs

    df = q_scalar_funcs(spark, SF_DIR)
    plan = physical_plan(df)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "o_totalprice" not in scan[0], (
        "unused column not pruned from scan: " + scan[0]
    )


def test_code_map_join_is_broadcast(spark):
    from covid19i2b2_spark.queries.joins import q_literal_map_join

    # q_join_inner's nation side is the explicit F.broadcast map join
    assert_broadcast_hash_join(REGISTRY["q_join_inner"].fn(spark, SF_DIR))
    assert_broadcast_hash_join(q_literal_map_join(spark, SF_DIR))


def test_workhorse_join_has_no_nested_loop(spark):
    from covid19i2b2_spark.queries.joins import q_join_left

    assert_no_nested_loop(REGISTRY["q_join_inner"].fn(spark, SF_DIR))
    # deregistered round 7 (slot went to q_token_budget_select) but the
    # J3 plan shape stays pinned
    assert_no_nested_loop(q_join_left(spark, SF_DIR))
    assert_no_nested_loop(REGISTRY["q_semi_anti_join"].fn(spark, SF_DIR))


def test_topk_plans_take_ordered(spark):
    from covid19i2b2_spark.queries.filters import q_topk
    from covid19i2b2_spark.queries.llm3 import q_bm25_rank

    assert_take_ordered(q_topk(spark, SF_DIR))
    assert_take_ordered(q_bm25_rank(spark, SF_DIR))


def test_minhash_lsh_is_equi_join_not_cartesian(spark):
    """The LSH candidate join must be an equi-join on (band, bucket) —
    never a cross join over documents."""
    assert_no_nested_loop(REGISTRY["q_minhash_pairs"].fn(spark, SF_DIR))


def test_range_join_small_side_is_broadcast(spark):
    """q_range_join's calendar side is tiny and must be the BNLJ build
    side (broadcast) — acceptable shape; two large sides would use
    range_join_binned (equi-join) instead."""
    plan = physical_plan(REGISTRY["q_range_join"].fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin BuildLeft" in plan or "BroadcastHashJoin" in plan, plan


def test_cosine_topk_single_evaluation(spark):
    """cosine_topk must evaluate the cosine ONCE per row: exactly three
    zip_with expressions in the plan (dot(v,q) + the two norms).  The
    round-1 version projected round6(cosine) and cosine separately,
    doubling the aggregate work per row (VERDICT r1 #4)."""
    from covid19i2b2_spark.queries.llm import q_cosine_topk

    plan = physical_plan(q_cosine_topk(spark, SF_DIR))
    assert plan.count("zip_with") <= 3, plan.count("zip_with")


def test_simhash_verify_uses_bit_count_intrinsic(spark):
    """The hamming verify must popcount via the JVM bit_count intrinsic,
    not the old bin()/regexp_replace string shape (64-char allocation per
    candidate pair); and the candidate join stays an equi-join."""
    # q_simhash_pairs left the registry in round 12 (slot ceded to
    # q_recrawl_schedule) but the plan pin stays on the function
    from covid19i2b2_spark.queries.llm2 import q_simhash_pairs

    df = q_simhash_pairs(spark, SF_DIR)
    plan = physical_plan(df)
    assert "bit_count" in plan, plan
    assert "regexp_replace" not in plan, "string popcount crept back in"
    assert_no_nested_loop(df)


def test_embedding_near_dup_is_equi_join(spark):
    """Hyperplane-LSH candidate generation must stay a bucket equi-join —
    never a cross join over vectors (the plane dots bucket per-row; only
    same-bucket pairs meet)."""
    # q_embedding_near_dup left the registry in round 14 (slot ceded to
    # q_suffix_array); the plan pin outlives the slot
    from covid19i2b2_spark.queries.llm import q_embedding_near_dup

    assert_no_nested_loop(q_embedding_near_dup(spark, SF_DIR))


def test_curation_pipeline_has_no_cartesian(spark):
    """Composing line_dedup -> exact_dedup -> minhash -> components ->
    decontamination -> packing must not introduce a nested-loop/cartesian
    join anywhere: every candidate join is an equi-join, the eval-gram
    join is broadcast."""
    from covid19i2b2_spark.pipelines.curation import CurationConfig, curate
    from covid19i2b2_spark.sources.tables import read_table

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ev = docs.orderBy("doc_id").limit(5).select("text")
    out = curate(docs, ev, config=CurationConfig(minhash_threshold=0.7))
    assert_no_nested_loop(out)


def test_binned_range_join_is_equi(spark):
    """range_join_binned turns interval containment into an equi-join."""
    from pyspark.sql import functions as F

    from covid19i2b2_spark.operators.joins import range_join_binned
    from covid19i2b2_spark.sources.tables import read_table

    orders = read_table(spark, SF_DIR, "orders")
    stays = orders.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("admit"),
        F.date_add(F.to_date("o_orderdate"), 20).alias("discharge"),
    )
    points = orders.select(F.to_date("o_orderdate").alias("d")).dropDuplicates()
    joined = range_join_binned(points, stays, "d", "admit", "discharge")
    plan = physical_plan(joined)
    assert "CartesianProduct" not in plan
    # must run and produce plausible counts (every point is in its own stay)
    assert joined.count() >= points.count()


def test_aqe_splits_skewed_join_partitions(spark):
    """The 100x scale story for J1 joins on skewed keys: with
    spark.sql.adaptive.skewJoin enabled (the engine default,
    session.ensure_runtime_conf), AQE must detect an oversized shuffle
    partition at runtime and split it — the final adaptive plan carries
    the skew=true marker on the join.  Thresholds are lowered here so
    local-mode data trips the same code path production would."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old: dict[str, str | None] = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # pad must be INCOMPRESSIBLE: shuffle partition sizes are
        # measured on the lz4-compressed blocks, and a constant pad
        # compresses below the skew threshold
        hot = spark.range(100_000).select(
            F.lit(0).alias("k"),
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.md5(F.col("id").cast("string")),
            ).alias("pad"),
        )
        cold = spark.range(1000).select(
            (F.col("id") + 1).alias("k"),
            F.col("id").cast("string").alias("pad"),
        )
        dim = spark.range(1001).select(F.col("id").alias("k"), F.col("id").alias("dv"))
        # the probed action is the join itself (a collect has no
        # downstream distribution requirement, so OptimizeSkewedJoin can
        # split freely — same shape as a sink write in production)
        # keep pad in the output — column pruning would otherwise drop it
        # before the exchange, deflating the skewed partition
        joined = hot.unionAll(cold).join(dim, "k").select("k", "dv", "pad")
        assert len(joined.collect()) == 101_000
        plan = physical_plan(joined)
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, (
            "AQE did not mark the join as skew-split:\n" + plan
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prefilters_selective_join(spark, tmp_path):
    """J1 at scale: a shuffle join whose build side carries a selective
    filter gets an optimizer-injected Bloom prefilter — bloom_filter_agg
    over the filtered dim keys, might_contain on the fact side BEFORE
    its shuffle — so non-matching fact rows die at the scan.  Thresholds
    are lowered only to make the small fixture eligible; the
    conf itself (bloomFilter.enabled) is an engine default
    (session.DEFAULT_CONF).  Results must equal the unfiltered plan."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old: dict[str, str | None] = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
        spark.range(0, 200_000).select(
            (F.col("id") % 50_000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pay"),
        ).write.mode("overwrite").parquet(fact_p)
        spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("attr")
        ).write.mode("overwrite").parquet(dim_p)
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).filter(F.col("attr") == 1)
        joined = fact.join(dim, "k")
        n = joined.count()
        plan = physical_plan(joined)
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
        # prefilter is semantics-free: same rows as without it
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        assert fact.join(dim, "k").count() == n
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_new_round4_operators_plan_shapes(spark):
    """Round-4 operators keep their scale contracts: the heavy-hitters
    build has ONE raw-data exchange (the count aggregate — the window
    sort runs over distinct items, post-aggregate); quantile queries
    broadcast the tiny q list and never nested-loop anything else; the
    bigram scorer broadcasts both bounded model tables; span removal
    has no nested loop (docs meet only through the passage-key
    aggregate)."""
    from covid19i2b2_spark.operators.sketches import (
        build_quantile_sketches,
        build_topk_sketches,
        quantile_estimates,
    )
    from covid19i2b2_spark.operators.text import tokens
    from covid19i2b2_spark.queries.llm3 import (
        q_bigram_logprob,
        q_remove_dup_spans,
    )
    from covid19i2b2_spark.sources.tables import read_table

    docs = read_table(spark, SF_DIR, "documents").select(
        "source", F.explode(tokens(F.lower("text"))).alias("token")
    )
    topk = build_topk_sketches(docs, ["source"], "token", k=8)
    assert_no_nested_loop(topk)

    ev = read_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    qdf = quantile_estimates(
        build_quantile_sketches(ev, ["day"], "value"), [0.5, 0.9]
    )
    # the q-list join is the only BNLJ-eligible join and must broadcast
    plan = physical_plan(qdf)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan

    bi = q_bigram_logprob(spark, SF_DIR)
    assert_no_nested_loop(bi)
    assert physical_plan(bi).count("BroadcastExchange") >= 2  # both models

    assert_no_nested_loop(q_remove_dup_spans(spark, SF_DIR))


def test_agg_basic_fixed_point_equals_decimal(spark):
    """Round-5 (VERDICT r4 #4): the two-level fixed-point measure
    aggregate (long unit sums per (group, partition), decimal(38,0)
    finalize) must produce byte-identical rows to the one-level decimal
    plan it replaces, and no Expand node (the multi-distinct rewrite
    from round 2 must survive the rewrite)."""
    from covid19i2b2_spark.queries.aggregates import q_agg_basic

    a = q_agg_basic(spark, SF_DIR, impl="decimal").collect()
    b = q_agg_basic(spark, SF_DIR, impl="fixed").collect()
    assert a == b and len(a) > 0

    plan = physical_plan(REGISTRY["q_agg_basic"].fn(spark, SF_DIR))
    assert "Expand" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        q_agg_basic(spark, SF_DIR, impl="nope")


def test_two_level_fixed_sums_null_and_negative(spark):
    """The fixed-point helper must match one-level decimal sums on
    NULLs (sum skips, count skips) and negative values (floor-based
    cents conversion must not bias) — byte-identical doubles."""
    from covid19i2b2_spark.operators.aggregates import two_level_fixed_sums

    rows = [
        ("a", 1.25), ("a", -2.50), ("a", None), ("a", 0.01),
        ("b", None), ("b", None),
        ("c", 123456.78), ("c", -0.99),
    ]
    df = spark.createDataFrame(rows, "g string, v double").repartition(5)
    cents = (F.col("v").cast("decimal(12,2)") * 100).cast("long")
    got = {
        r["g"]: (r["sum_v"], r["n_v"], r["count_rows"])
        for r in two_level_fixed_sums(
            df, ["g"], sums={"sum_v": (cents, 2)}, counts={"v": "v"}
        ).collect()
    }
    exp = {
        r["g"]: (r["s"], r["n"], r["c"])
        for r in df.groupBy("g")
        .agg(
            F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("s"),
            F.count("v").alias("n"),
            F.count("*").alias("c"),
        )
        .collect()
    }
    assert got == exp


def test_two_level_fixed_sums_overflow_raises(spark):
    """Regression (ADVICE r5 low / VERDICT r6 #3): a per-partition long
    subtotal past ~9.2e18 units must ERROR, not wrap silently into a
    corrupt total (this is q_agg_basic's fast path; non-ANSI long sums
    wrap).  Planted: three 2^62-unit rows in ONE partition (sum 3*2^62
    > 2^63-1) -> try_sum yields NULL with non-NULL inputs -> raise.  An
    all-NULL cell still aggregates to nothing rather than raising."""
    import pytest as _pytest

    from covid19i2b2_spark.operators.aggregates import two_level_fixed_sums

    big = spark.createDataFrame(
        [("a", 2**62), ("a", 2**62), ("a", 2**62)], "g string, u long"
    ).coalesce(1)
    with _pytest.raises(Exception, match="overflow for measure"):
        two_level_fixed_sums(big, ["g"], sums={"s": (F.col("u"), 0)}).collect()

    allnull = spark.createDataFrame(
        [("a", None), ("a", None)], "g string, u long"
    ).coalesce(1)
    row = two_level_fixed_sums(
        allnull, ["g"], sums={"s": (F.col("u"), 0)}
    ).collect()[0]
    assert row["s"] is None and row["count_rows"] == 2


def test_token_budget_select_plan_shape(spark):
    """Round-7 pin for the registered global prefix plan
    (q_token_budget_select): the ranged frame is a pinned scan (the
    eager localCheckpoint shows as ExistingRDD/Scan, NOT a re-run
    range exchange per consumer), and no unpartitioned window over the
    full input exists — the only Window partitions by __pid on the
    boundary partition's rows."""
    plan = physical_plan(REGISTRY["q_token_budget_select"].fn(spark, SF_DIR))
    # the checkpoint pins the exchange: consumers read the materialized
    # RDD instead of re-executing repartitionByRange
    assert "Scan ExistingRDD" in plan, plan
    # any Window in the plan is partitioned (no global single-task sort)
    for seg in plan.split("\n"):
        if "Window" in seg and "windowspecdefinition" in seg:
            assert "__pid" in seg, seg


def test_text_analysis_kernel_plan_is_one_arrow_pass(spark):
    """Round-5 PLANS.md pin: the kernel-path q_text_analysis is one
    scan -> one ArrowEvalPython -> project, with the output-order range
    exchange as the ONLY exchange (no shuffle introduced by the
    measures themselves)."""
    plan = physical_plan(REGISTRY["q_text_analysis"].fn(spark, SF_DIR))
    assert plan.count("ArrowEvalPython") == 1, plan
    assert plan.count("Exchange") <= 2, plan  # range partition (+AQE read)


def test_ivf_assign_kernel_plan_is_map_only(spark):
    """Round-5 PLANS.md pin: kernel centroid assignment is map-only —
    one ArrowEvalPython over the scan, no join, no max_by aggregate
    exchange (the expr plan pays broadcast-join + groupBy)."""
    from covid19i2b2_spark.operators import similarity as sim
    from covid19i2b2_spark.sources.tables import read_table

    emb = read_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= 16)
    ).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    plan = physical_plan(
        sim.ivf_assign(emb, "vec_id", "embedding", cents, impl="kernel")
    )
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_sharded_filter_batch_cogroup_carries_no_payload(spark, tmp_path):
    """Integration form of the X50 narrow-probe pin (VERDICT r8 #1):
    the sharded-gated filter_batch plan must route ONLY (hash, shard)
    pairs through its Arrow cogroups — the batch's text payload joins
    the flags back JVM-side and never crosses the Python boundary."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from covid19i2b2_spark.operators.dedup_incremental import DedupIndex

    corpus = spark.createDataFrame(
        [(i, f"seed doc {i} " + " ".join(f"t{i}x{j}" for j in range(10)))
         for i in range(60)],
        "doc_id long, text string",
    )
    idx = DedupIndex(str(tmp_path / "planidx"))
    idx.build(corpus, "doc_id", "text")
    idx.write_blooms(spark, fpp=0.01, sharded=4)
    batch = spark.createDataFrame(
        [(100 + i, f"new doc {i} " + " ".join(f"n{i}x{j}" for j in range(10)))
         for i in range(20)],
        "doc_id long, text string",
    )
    survivors, _ = idx.filter_batch(
        spark, batch, "doc_id", "text", bloom_fpp=0.01
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        survivors.explain("formatted")
    plan = buf.getvalue()
    assert "FlatMapCoGroupsInPandas" in plan
    left_lines = [
        ln for ln in plan.splitlines() if ln.startswith("Left output")
    ]
    assert left_lines, plan
    assert all("text#" not in ln for ln in left_lines), left_lines
    idx.release()


def test_knn_join_two_stage_bounds_both_exchanges(spark):
    """q_knn_join (round 10 two-stage top-k): both rank stages must
    carry a map-side WindowGroupLimit 'Partial' BEFORE their exchange —
    Spark's rank-limit pushdown bounding what shuffles to <= k rows per
    (query, cluster) group resp. <= n_probe*k per query — and the
    stage-1 window must partition on (query_id, centroid_id) so that a
    shuffled candidate join's centroid_id partitioning satisfies it at
    scale without a new exchange."""
    plan = physical_plan(REGISTRY["q_knn_join"].fn(spark, SF_DIR))
    assert plan.count("WindowGroupLimit") >= 4, plan  # 2 stages x P+F
    assert "Partial" in plan and "Final" in plan, plan
    # stage-1 grouping key present in a window spec
    assert "query_id" in plan and "centroid_id" in plan
    # no cartesian anywhere in the candidate chain
    assert "CartesianProduct" not in plan, plan


def test_dsir_plan_is_expression_only(spark):
    """q_dsir_select: the whole selection (fused one-pass LM scoring,
    weights, seeded Gumbel noise, top-k) must stay JVM-side — no
    Python evaluation of any kind, no cartesian, and the merged
    bounded vocab map enters through a broadcast join."""
    from covid19i2b2_spark.queries.llm3 import q_dsir_select

    df = q_dsir_select(spark, SF_DIR)
    plan = physical_plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_pagerank_pre_partition_cuts_per_pass_exchanges(spark):
    """VERDICT r10 #1: with the edges pinned on their source key
    (pre_partition=True, the default) a PageRank pass must plan
    STRICTLY fewer exchanges than the naive per-pass re-shuffle —
    and an edges table bucketed on the source key
    (layout.write_bucketed) must co-locate the same join with
    pre_partition=False.  Results are identical either way."""
    import pytest as _pytest

    from covid19i2b2_spark.operators.graph import pagerank
    from covid19i2b2_spark.sources.layout import read_table as read_bucketed
    from covid19i2b2_spark.sources.layout import write_bucketed
    from covid19i2b2_spark.sources.tables import read_table

    orders = read_table(spark, SF_DIR, "orders").limit(500)
    edges = orders.select(
        (F.col("o_orderkey") % 97).alias("src"),
        (F.xxhash64("o_orderkey") % 97).alias("dst"),
    )
    kw = dict(n_iter=3, tol=None)
    naive_probe: dict = {}
    naive = pagerank(edges, pre_partition=False, plan_probe=naive_probe,
                     **kw)
    pre_probe: dict = {}
    pre = pagerank(edges, pre_partition=True, plan_probe=pre_probe, **kw)
    # steady-state pass = the SECOND iteration (the first reads the
    # uniform init ranks, whose partitioning differs)
    n_naive = naive_probe["iteration_plans"][1].count("Exchange")
    n_pre = pre_probe["iteration_plans"][1].count("Exchange")
    assert n_pre < n_naive, (n_pre, n_naive)
    got_n = {r["node"]: r["rank"] for r in naive.collect()}
    got_p = {r["node"]: r["rank"] for r in pre.collect()}
    assert set(got_n) == set(got_p)
    for v in got_n:
        assert got_p[v] == _pytest.approx(got_n[v], abs=1e-12), v

    # bucketed-table path: the scan itself reports the bucket
    # partitioning, so even pre_partition=False co-locates
    spark.sql("DROP TABLE IF EXISTS pagerank_edges_bucketed")
    write_bucketed(edges, "pagerank_edges_bucketed", ["src"],
                   n_buckets=8, sort_cols=["src"])
    try:
        b_probe: dict = {}
        b = pagerank(
            read_bucketed(spark, "pagerank_edges_bucketed"),
            pre_partition=False, plan_probe=b_probe, **kw,
        )
        n_bucketed = b_probe["iteration_plans"][1].count("Exchange")
        assert n_bucketed < n_naive, (n_bucketed, n_naive)
        got_b = {r["node"]: r["rank"] for r in b.collect()}
        for v in got_n:
            assert got_b[v] == _pytest.approx(got_n[v], abs=1e-12), v
    finally:
        spark.sql("DROP TABLE IF EXISTS pagerank_edges_bucketed")


def test_containment_plan_is_blocked_not_all_pairs(spark):
    """q_containment: the prefix-filtered candidate join must plan as
    equi-joins — no cartesian, no nested-loop, nothing Python-side
    (the brute-force all-pairs shape lives only in the test oracle)."""
    from covid19i2b2_spark.queries.llm3 import q_containment

    plan = physical_plan(q_containment(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_url_dedup_plan_is_expression_only(spark):
    """q_url_dedup: canonicalization is pure regexp/array expressions
    (map-only) and the dedup is one hash aggregate — no Python, no
    join at all in the plan."""
    from covid19i2b2_spark.queries.llm3 import q_url_dedup

    plan = physical_plan(q_url_dedup(spark, SF_DIR))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_mark_disallowed_plan_broadcasts_policy(spark):
    """X66: the exclusion flag must reach the corpus as ONE broadcast
    join + array exists — no cartesian, no nested-loop, no Python, and
    the big side never hash-exchanges for the policy check."""
    from covid19i2b2_spark.operators.urls import (
        mark_disallowed,
        parse_disallow_rules,
    )
    from covid19i2b2_spark.sources.tables import read_table

    rules = parse_disallow_rules(
        spark, ["src1.example.com", ".example.com/3"]
    )
    urls = read_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/p"),
            F.col("doc_id"),
        ).alias("u"),
    )
    plan = physical_plan(mark_disallowed(urls, rules, url_col="u"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_lang_id_profiles_join_is_broadcast(spark):
    """X4-langid: the profile table (|langs|*K rows) must broadcast
    into the gram join — a shuffled profile join would hash-exchange
    the exploded corpus grams against a KB-sized model."""
    from covid19i2b2_spark.operators.lang_id import (
        classify_language,
        train_lang_profiles,
    )

    seed = spark.createDataFrame(
        [("en", "the cat sat on the mat"), ("de", "die katze sitzt")],
        "lang string, text string",
    )
    prof = train_lang_profiles(seed, top_k=50)
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "die katze")], "doc_id int, text string"
    )
    out = classify_language(docs, "doc_id", "text", prof)
    assert_broadcast_hash_join(out)
    plan = physical_plan(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kn_lm_plan_is_map_only_events_no_window(spark):
    """X93: event generation must stay MAP-ONLY — the padded trigram
    stream comes out of one array transform + explode with <unk>
    mapping as broadcast vocab joins, so the scoring plan carries no
    DOC-KEYED window (the only Window allowed is build_vocab's rank
    over the already-LIMITed top-N — bounded rows by design), no
    Python evaluation, no cartesian; the only exchanges are the
    (cached) model aggregates and the per-doc mean."""
    from covid19i2b2_spark.operators.kn_lm import (
        kn_logprob_score,
        release_kn_lm,
        train_kn_lm,
    )

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat on the rug")],
        "doc_id int, text string",
    )
    model = train_kn_lm(docs, "text", top_n_vocab=20)
    try:
        out = kn_logprob_score(docs, "doc_id", "text", model)
        plan = physical_plan(out)
        # every Window must be the vocab rank (a bare row_number over
        # the LIMITed top-N); nothing may window over the event stream
        for line in plan.splitlines():
            if "Window [" in line:
                assert "row_number()" in line, line
        assert "windowspecdefinition(doc_id" not in plan, plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan, plan
    finally:
        release_kn_lm(model)


def test_suffix_dense_rank_window_is_partition_local(spark):
    """X88: the doubling loop's dense rank must never plan an
    unpartitioned window (it would pull the per-char table through one
    task).  The loop's outputs are checkpointed (opaque ExistingRDD
    plans), so the pin targets the lazy _rank_pairs_global frame — the
    one place a window exists in the round."""
    from covid19i2b2_spark.operators.suffixes import (
        _codepoint_rows,
        _rank_pairs_global,
    )

    docs = spark.createDataFrame(
        [(1, "abcabcabc"), (2, "xyzabcabc")], "doc_id int, text string"
    )
    paired = _codepoint_rows(docs, "doc_id", "text").withColumn(
        "__r2", F.lit(-1)
    )
    out, handle = _rank_pairs_global(paired, 4)
    plan = physical_plan(out)
    handle.unpersist()
    win_lines = [
        ln for ln in plan.splitlines() if "Window " in ln or "Window[" in ln
    ]
    assert win_lines, plan
    for ln in win_lines:
        # the partition key must be the range-partition id
        assert "__pid" in ln, ln
    assert "CartesianProduct" not in plan


def test_fingerprint_full_data_aggregate_is_hash(spark):
    """X4 / q_fingerprint (round 15): the aggregate nearest the scan —
    the one that sees every corpus row — must be a HashAggregate.  A
    direct count_distinct + min(string) plan is a SortAggregate chain
    (string MIN buffers are not hash-aggregable), which sorts the whole
    corpus by (source, fingerprint); the two-level rewrite confines the
    string-MIN SortAggregate to the distinct-fingerprint rows."""
    from covid19i2b2_spark.queries.llm import q_fingerprint

    plan = physical_plan(q_fingerprint(spark, SF_DIR))
    lines = plan.splitlines()
    scan_idx = next(
        i for i, ln in enumerate(lines) if "Scan parquet" in ln
    )
    first_agg = next(
        ln for ln in reversed(lines[:scan_idx]) if "Aggregate" in ln
    )
    assert "HashAggregate" in first_agg, first_agg
