"""Mergeable HLL distinct-count store (operators/sketches.py): error
bounds vs exact, merge-vs-rebuild equivalence, parquet round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.sketches import (
    build_distinct_sketches,
    merge_sketch_stores,
    rollup_distinct_sketches,
)
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def _events(spark):
    return read_table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )


def test_sketch_rollup_tracks_exact_distinct(spark, tmp_path):
    """Daily sketches -> parquet -> read back -> global rollup must sit
    within the HLL error band of the exact distinct count, without
    touching the raw table again."""
    ev = _events(spark)
    daily = build_distinct_sketches(ev, ["day"], "user_id")
    path = str(tmp_path / "sketches")
    daily.write.mode("overwrite").parquet(path)  # binary column round-trip
    store = spark.read.parquet(path)

    total = rollup_distinct_sketches(store, []).collect()[0]
    exact = ev.agg(F.count_distinct("user_id").alias("n")).collect()[0]["n"]
    assert abs(total["approx_distinct"] - exact) <= max(2, 0.05 * exact)
    assert total["n_rows"] == ev.count()

    # per-day estimates track per-day exacts too
    per_day = {
        r["day"]: r["approx_distinct"]
        for r in rollup_distinct_sketches(store, ["day"]).collect()
    }
    exact_day = {
        r["day"]: r["n"]
        for r in ev.groupBy("day")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(per_day) == set(exact_day)
    for d, n in exact_day.items():
        assert abs(per_day[d] - n) <= max(2, 0.05 * n), d


def test_incremental_merge_equals_rebuild(spark):
    """Folding a new batch into the store (merge_sketch_stores) must
    estimate the same as rebuilding from all raw data — the property
    that makes the store incremental: overlap between batches collapses
    through the sketch union, never double-counted."""
    ev = _events(spark).cache()
    first = ev.filter(F.dayofmonth("day") <= 15)
    second = ev.filter(F.dayofmonth("day") > 10)  # overlaps days 11-15
    merged_store = merge_sketch_stores(
        build_distinct_sketches(first, ["day"], "user_id"),
        build_distinct_sketches(second, ["day"], "user_id"),
        ["day"],
    )
    rebuilt = build_distinct_sketches(
        first.unionByName(second), ["day"], "user_id"
    )
    a = {
        r["day"]: (r["approx_distinct"], r["n_rows"])
        for r in rollup_distinct_sketches(merged_store, ["day"]).collect()
    }
    b = {
        r["day"]: (r["approx_distinct"], r["n_rows"])
        for r in rollup_distinct_sketches(rebuilt, ["day"]).collect()
    }
    assert a == b  # identical sketches -> identical estimates and counts
    ev.unpersist()


# --- frequent-items (top-k heavy hitters) store -------------------------


def _doc_tokens(spark):
    from covid19i2b2_spark.operators.text import tokens

    return (
        read_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", tokens(F.lower("text")).alias("toks"))
        .select("doc_id", "source", F.explode("toks").alias("token"))
    )


def test_topk_build_is_exact_for_kept_items(spark):
    """A fresh shard summary is EXACT: with k >= distinct items per
    group, every item appears with count_lo == count_hi == true count,
    ranked by count desc, and bound == 0 (nothing dropped)."""
    from covid19i2b2_spark.operators.sketches import (
        build_topk_sketches,
        topk_estimates,
    )

    toks = _doc_tokens(spark)
    n_distinct = (
        toks.groupBy("source", "token").count().groupBy("source").count()
    )
    k = max(r["count"] for r in n_distinct.collect())
    store = build_topk_sketches(toks, ["source"], "token", k=k)
    est = topk_estimates(store).collect()
    exact = {
        (r["source"], r["token"]): r["n"]
        for r in toks.groupBy("source", "token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert len(est) == len(exact)
    for r in est:
        true = exact[(r["source"], r["item"])]
        assert r["count_lo"] == true == r["count_hi"]
        assert r["bound"] == 0
    # ranks are 1..n and non-increasing in count
    by_src: dict = {}
    for r in sorted(est, key=lambda r: (r["source"], r["rank"])):
        prev = by_src.get(r["source"])
        if prev is not None:
            assert r["count_hi"] <= prev
        by_src[r["source"]] = r["count_hi"]


def test_topk_merge_bounds_and_guarantee(spark, tmp_path):
    """Shard-wise summaries merged to the coarser grain must (a)
    bracket every true count in [count_lo, count_hi] and (b) retain
    every item whose true count exceeds the merged residual bound —
    after a parquet round-trip of the nested summary rows."""
    from covid19i2b2_spark.operators.sketches import (
        build_topk_sketches,
        merge_topk_sketches,
        topk_estimates,
    )

    toks = _doc_tokens(spark).cache()
    k = 16
    shards = build_topk_sketches(
        toks.withColumn("shard", F.pmod("doc_id", F.lit(4))),
        ["shard", "source"],
        "token",
        k=k,
    )
    path = str(tmp_path / "topk")
    shards.write.mode("overwrite").parquet(path)
    merged = merge_topk_sketches(spark.read.parquet(path), ["source"], k=k)
    est = topk_estimates(merged).collect()
    exact = {
        (r["source"], r["token"]): r["n"]
        for r in toks.groupBy("source", "token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    bounds = {r["source"]: r["bound"] for r in merged.collect()}
    present = set()
    for r in est:
        true = exact[(r["source"], r["item"])]
        assert r["count_lo"] <= true <= r["count_hi"], (r, true)
        present.add((r["source"], r["item"]))
    for (src, tok), true in exact.items():
        if true > bounds[src]:
            assert (src, tok) in present, (src, tok, true, bounds[src])
    # n_rows preserved through the merge
    n_rows = {r["source"]: r["n_rows"] for r in merged.collect()}
    exact_rows = {
        r["source"]: r["n"]
        for r in toks.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert n_rows == exact_rows
    toks.unpersist()


def test_topk_planted_heavy_hitter_survives_skew(spark):
    """SpaceSaving guarantee under skew: a value holding >1/k of the
    mass in every shard must survive shard summaries of k slots and the
    merge, with its count_lo/count_hi tight around the true count."""
    from covid19i2b2_spark.operators.sketches import (
        build_topk_sketches,
        merge_topk_sketches,
        topk_estimates,
    )

    n = 20_000
    df = spark.range(n).select(
        F.pmod("id", F.lit(8)).alias("shard"),
        F.when(F.pmod("id", F.lit(3)) == 0, F.lit("HOT"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 1500).cast("string")))
        .alias("token"),
    )
    shards = build_topk_sketches(df, ["shard"], "token", k=8)
    merged = merge_topk_sketches(shards, [], k=8)
    est = topk_estimates(merged)
    hot = est.filter(F.col("item") == "HOT").collect()
    assert len(hot) == 1 and hot[0]["rank"] == 1
    true_hot = df.filter(F.col("token") == "HOT").count()
    assert hot[0]["count_lo"] <= true_hot <= hot[0]["count_hi"]
    # HOT is kept in every shard -> its lower bound is exact
    assert hot[0]["count_lo"] == true_hot


# --- quantile (DDSketch log-bucket) store -------------------------------


def test_quantile_store_error_bound_and_merge(spark, tmp_path):
    """DDSketch guarantee: per-day value quantiles from the store must
    sit within relative eps of the exact percentiles; shard-built
    sketches merged equal the directly-built store EXACTLY (bucket
    counts sum); nested rows round-trip parquet."""
    from covid19i2b2_spark.operators.sketches import (
        build_quantile_sketches,
        merge_quantile_sketches,
        quantile_estimates,
    )

    ev = (
        read_table(spark, SF_DIR, "events")
        .select(F.to_date("ts").alias("day"), "value", "event_id")
        .cache()
    )
    eps = 0.02
    store = build_quantile_sketches(ev, ["day"], "value", eps=eps)
    path = str(tmp_path / "qsketch")
    store.write.mode("overwrite").parquet(path)
    store = spark.read.parquet(path)

    qs = [0.1, 0.5, 0.9, 0.99]
    est = {
        (r["day"], r["q"]): r["value"]
        for r in quantile_estimates(store, qs, eps=eps).collect()
    }
    # DDSketch guarantees relative eps vs the ORDER STATISTIC at rank
    # ceil(q*n) — not vs interpolated percentiles, which at small n sit
    # between order stats
    import math

    by_day: dict = {}
    for r in ev.collect():
        by_day.setdefault(r["day"], []).append(r["value"])
    checked = 0
    for day, vals in by_day.items():
        vals.sort()
        for q in qs:
            true = vals[max(0, math.ceil(q * len(vals)) - 1)]
            got = est[(day, q)]
            assert abs(got - true) <= eps * abs(true) + 1e-9, (
                day, q, got, true,
            )
            checked += 1
    assert checked >= 40

    # shard split -> merge equals direct build exactly
    shards = build_quantile_sketches(
        ev.withColumn("shard", F.pmod("event_id", F.lit(4))),
        ["shard", "day"],
        "value",
        eps=eps,
    )
    merged = merge_quantile_sketches(shards, ["day"])
    a = {r["day"]: (r["buckets"], r["n_rows"]) for r in merged.collect()}
    b = {r["day"]: (r["buckets"], r["n_rows"]) for r in store.collect()}
    assert a == b
    ev.unpersist()


def test_quantile_store_signs_and_zeros(spark):
    """Sign fidelity: a store over mixed negative/zero/positive values
    must place q=0.5 at zero and keep negative estimates negative."""
    from covid19i2b2_spark.operators.sketches import (
        build_quantile_sketches,
        quantile_estimates,
    )

    vals = [-100.0] * 25 + [0.0] * 50 + [100.0] * 25
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    store = build_quantile_sketches(df, [], "value", eps=0.01)
    est = {
        r["q"]: r["value"]
        for r in quantile_estimates(store, [0.1, 0.5, 0.9], eps=0.01).collect()
    }
    assert est[0.5] == 0.0
    assert est[0.1] < 0 and abs(est[0.1] + 100) <= 2.5
    assert est[0.9] > 0 and abs(est[0.9] - 100) <= 2.5


def test_quantile_store_edge_ranks_and_nan(spark):
    """q=0 clamps to the minimum (rank 1) and q=1 to the maximum; NaN
    values are excluded from the histogram rather than silently filed
    as zeros."""
    from covid19i2b2_spark.operators.sketches import (
        build_quantile_sketches,
        quantile_estimates,
    )

    vals = [float(v) for v in range(1, 101)] + [float("nan")] * 5
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    store = build_quantile_sketches(df, [], "value", eps=0.01)
    assert store.collect()[0]["n_rows"] == 100  # NaNs excluded
    est = {
        r["q"]: r["value"]
        for r in quantile_estimates(store, [0.0, 1.0], eps=0.01).collect()
    }
    assert abs(est[0.0] - 1.0) <= 0.02
    assert abs(est[1.0] - 100.0) <= 2.0


def test_quantile_store_null_groups_stay_distinct(spark):
    """Regression (review r4): group columns containing NULL must keep
    their own windows — ('a', NULL) and (NULL, 'a') are different
    groups and both answer their own median."""
    from covid19i2b2_spark.operators.sketches import (
        build_quantile_sketches,
        quantile_estimates,
    )

    rows = [("a", None, 10.0), ("a", None, 20.0), (None, "a", 1000.0)]
    df = spark.createDataFrame(rows, "g1 string, g2 string, value double")
    store = build_quantile_sketches(df, ["g1", "g2"], "value", eps=0.01)
    est = {
        (r["g1"], r["g2"]): r["value"]
        for r in quantile_estimates(store, [0.5], eps=0.01).collect()
    }
    assert set(est) == {("a", None), (None, "a")}
    assert abs(est[("a", None)] - 10.0) <= 0.5
    assert abs(est[(None, "a")] - 1000.0) <= 25.0


def test_cm_sketch_bounds_and_merge(spark):
    """X47 Count-Min: estimates never UNDERestimate; with width >>
    distinct items they are exact; merging shard stores equals building
    on the union (linearity); an absent key estimates ~0 (at most the
    collision bound n/width per row)."""
    from covid19i2b2_spark.operators.sketches import (
        build_cm_sketches,
        cm_estimates,
        merge_cm_sketches,
    )

    rows = (
        [("a", "x")] * 50 + [("a", "y")] * 20 + [("a", "z")] * 5
        + [("b", "x")] * 7 + [("b", "w")] * 3
    )
    df = spark.createDataFrame(rows, "g string, v string").repartition(6)
    truth = {("a", "x"): 50, ("a", "y"): 20, ("a", "z"): 5,
             ("b", "x"): 7, ("b", "w"): 3}

    wide = build_cm_sketches(df, ["g"], "v", depth=4, width=4096)
    est = {
        (r["g"], r["key"]): r["est"]
        for r in cm_estimates(
            wide, ["g"], ["x", "y", "z", "w", "absent"],
            depth=4, width=4096,
        ).collect()
    }
    for gk, n in truth.items():
        assert est[gk] == n, (gk, est[gk], n)  # exact at wide width
    assert est[("a", "absent")] == 0 and est[("b", "absent")] == 0

    # never-underestimate even at a tiny, collision-heavy width
    tight = build_cm_sketches(df, ["g"], "v", depth=3, width=4)
    est_t = {
        (r["g"], r["key"]): r["est"]
        for r in cm_estimates(
            tight, ["g"], ["x", "y", "z", "w"], depth=3, width=4
        ).collect()
    }
    for gk, n in truth.items():
        assert est_t[gk] >= n, (gk, est_t[gk], n)
        assert est_t[gk] <= sum(
            c for (g2, _), c in truth.items() if g2 == gk[0]
        )  # bounded by the group total

    # merge ≡ rebuild: shard by value hash, merge the shard stores
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64("v"), F.lit(3))
    )
    shard_stores = build_cm_sketches(
        sharded, ["shard", "g"], "v", depth=4, width=4096
    )
    merged = merge_cm_sketches(shard_stores, ["g"])
    direct = build_cm_sketches(df, ["g"], "v", depth=4, width=4096)
    m = sorted(
        map(tuple, merged.select("g", "row", "cell", "cnt", "n_rows").collect())
    )
    d = sorted(
        map(tuple, direct.select("g", "row", "cell", "cnt", "n_rows").collect())
    )
    assert m == d

    # global (no group) grain works too
    g0 = build_cm_sketches(df, [], "v", depth=4, width=4096)
    e0 = {
        r["key"]: r["est"]
        for r in cm_estimates(g0, [], ["x", "w"], depth=4, width=4096).collect()
    }
    assert e0["x"] == 57 and e0["w"] == 3


def test_cm_sketch_non_ascii_keys_exact(spark):
    """X47, round 8 (VERDICT r7 #5): the codepoint-polynomial cell hash
    must treat non-ASCII keys by Unicode CODEPOINT (Spark `ascii` ==
    codepoint of the first char, same as DuckDB `unicode`) — multi-byte
    keys build and probe exactly, and two keys that differ only in a
    non-ASCII char land in different cells (no byte-truncation
    aliasing)."""
    from covid19i2b2_spark.operators.sketches import (
        build_cm_sketches,
        cm_estimates,
    )

    rows = (
        [("héllo→☃",)] * 11 + [("héllo→x",)] * 4 + [("日本語テスト",)] * 7
        + [("ascii",)] * 3
    )
    df = spark.createDataFrame(rows, "v string").repartition(4)
    store = build_cm_sketches(df, [], "v", depth=4, width=4096)
    est = {
        r["key"]: r["est"]
        for r in cm_estimates(
            store, [], ["héllo→☃", "héllo→x", "日本語テスト", "ascii", "héllo→y"],
            depth=4, width=4096,
        ).collect()
    }
    assert est["héllo→☃"] == 11
    assert est["héllo→x"] == 4
    assert est["日本語テスト"] == 7
    assert est["ascii"] == 3
    assert est["héllo→y"] == 0  # absent key, distinct cells from its near-twins


def test_decayed_topk_store_trending_semantics(spark, tmp_path):
    """X58 EWMA heavy hitters: token 'old' dominates epochs 0-3, 'new'
    dominates 4-5 — undecayed totals keep 'old' on top, the decayed
    store flips to 'new'; per-item bounds sandwich the exact EWMA
    count; a replayed epoch neither re-decays nor re-counts; decay=1.0
    reproduces RunningTopkStore bit-for-bit; restart restores the
    decayed summary."""
    from covid19i2b2_spark.operators.sketches import (
        build_topk_sketches,
        topk_estimates,
    )
    from covid19i2b2_spark.streaming.incremental import (
        DecayedTopkStore,
        RunningTopkStore,
    )

    def batch(epoch):
        tok, n = ("old", 100) if epoch < 4 else ("new", 60)
        rows = [(tok,)] * n + [("base",)] * 5
        return build_topk_sketches(
            spark.createDataFrame(rows, "token string"), [], "token", k=8
        )

    alpha = 0.5
    plain = RunningTopkStore(spark, [], k=8)
    decayed = DecayedTopkStore(
        spark, [], k=8, decay=alpha, path=str(tmp_path / "store")
    )
    for ep in range(6):
        b = batch(ep)
        plain.merge(b, epoch_id=ep)
        decayed.merge(b, epoch_id=ep)

    def top(store):
        return {
            r["item"]: (r["rank"], r["count_lo"], r["count_hi"])
            for r in topk_estimates(store.df).collect()
        }

    p, d = top(plain), top(decayed)
    assert p["old"][0] == 1 and p["old"][1] == 400  # raw total wins
    assert d["new"][0] == 1 and d["old"][0] == 2    # trend wins decayed
    # exact EWMA counts (weights alpha^(5-t)); lo <= true <= hi
    true_old = sum(100 * alpha ** (5 - t) for t in range(4))
    true_new = sum(60 * alpha ** (5 - t) for t in (4, 5))
    assert d["old"][1] <= true_old <= d["old"][2]
    assert d["new"][1] <= true_new <= d["new"][2]
    # floors/ceils stay within 1 of the exact value per fold (6 folds)
    assert d["new"][2] - d["new"][1] <= 6

    # replayed epoch: no re-decay, no re-count
    before = top(decayed)
    decayed.merge(batch(5), epoch_id=5)
    assert top(decayed) == before

    # decay=1.0 degenerates to the plain store exactly
    ident = DecayedTopkStore(spark, [], k=8, decay=1.0)
    for ep in range(6):
        ident.merge(batch(ep), epoch_id=ep)
    assert top(ident) == p

    # restart: a fresh instance over the same path restores the
    # decayed summary and skips all marked epochs
    resumed = DecayedTopkStore(
        spark, [], k=8, decay=alpha, path=str(tmp_path / "store")
    )
    assert top(resumed) == before
    resumed.merge(batch(3), epoch_id=3)  # replay across restart
    assert top(resumed) == before

    import pytest as _pytest
    with _pytest.raises(ValueError, match="decay"):
        DecayedTopkStore(spark, [], decay=0.0)
