"""Deterministic sampling + sequence packing (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.sampling import (
    hash_sample,
    pack_sequences,
    stratified_hash_sample,
)
from covid19i2b2_spark.operators.text import token_count
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


def test_hash_sample_deterministic_and_nested(spark):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    n = docs.count()
    s10 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    s10_again = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    assert s10 == s10_again                      # reproducible
    assert s10 <= s30                            # nested fractions
    assert 0.03 * n <= len(s10) <= 0.2 * n       # roughly proportional
    # different seed -> different membership
    s10_seed = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1, seed=7).collect()}
    assert s10 != s10_seed


def test_stratified_hash_sample(spark):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    out = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.2, "de": 1.0}, default_fraction=0.0
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("de") == totals["de"]          # kept fully
    assert set(by_lang) <= {"en", "de"}               # others dropped
    assert 0 < by_lang.get("en", 0) < totals["en"]    # downsampled


def test_pack_sequences_bounds(spark):
    docs = read_table(spark, SF_DIR, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    target = 2000
    packed = pack_sequences(docs, "doc_id", "n_tokens", target, n_shards=8)
    assert packed.count() == docs.count()  # every doc in exactly one chunk
    max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
    chunks = (
        packed.groupBy("shard", "chunk_id")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    )
    assert all(r["total"] <= target + max_doc for r in chunks)
    # all but the last chunk of each shard reach the target
    # (chunk_id is "shard-idx"; compare on the numeric idx, not the string)
    idx = lambda cid: int(cid.split("-")[1])  # noqa: E731
    per_shard_last: dict[int, int] = {}
    for r in chunks:
        per_shard_last[r["shard"]] = max(
            per_shard_last.get(r["shard"], -1), idx(r["chunk_id"])
        )
    for r in chunks:
        if per_shard_last[r["shard"]] != idx(r["chunk_id"]):
            assert r["total"] + max_doc > target
    # deterministic across invocations
    a = sorted(map(tuple, packed.collect()))
    b = sorted(map(tuple, pack_sequences(docs, "doc_id", "n_tokens", target, n_shards=8).collect()))
    assert a == b


def test_temperature_mixture_sample_flattens_and_nests(spark):
    """tau<1 upsamples rare domains relative to their natural share, the
    realized sizes track the computed fractions, membership is
    deterministic, and lower targets nest inside higher ones."""
    from covid19i2b2_spark.operators.sampling import (
        mixture_fractions,
        temperature_mixture_sample,
    )

    rows = [(i, "en" if i < 8000 else "de") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    sampled, fr = temperature_mixture_sample(
        df, "doc_id", "lang", temperature=0.5, target_fraction=0.4
    )
    # rare domain keeps a larger fraction of itself
    assert fr["de"] > fr["en"]
    got = {
        r["lang"]: r["n"]
        for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert abs(got["en"] - fr["en"] * 8000) < 0.05 * 8000
    assert abs(got["de"] - fr["de"] * 2000) < 0.05 * 2000
    # deterministic + nested in target_fraction
    again, _ = temperature_mixture_sample(
        df, "doc_id", "lang", temperature=0.5, target_fraction=0.4
    )
    ids = {r.doc_id for r in sampled.select("doc_id").collect()}
    assert ids == {r.doc_id for r in again.select("doc_id").collect()}
    smaller, _ = temperature_mixture_sample(
        df, "doc_id", "lang", temperature=0.5, target_fraction=0.2
    )
    assert {r.doc_id for r in smaller.select("doc_id").collect()} <= ids
    # tau=1 preserves natural proportions exactly (every fraction equal)
    nat = mixture_fractions({"a": 700, "b": 300}, 1.0, 0.5)
    assert abs(nat["a"] - 0.5) < 1e-9 and abs(nat["b"] - 0.5) < 1e-9
    with pytest.raises(ValueError):
        mixture_fractions({"a": 1}, -0.1, 0.5)
    with pytest.raises(ValueError):
        temperature_mixture_sample(df, "doc_id", "lang", hash_impl="nope")


def test_leakage_safe_split_keeps_dup_clusters_together(spark):
    """Near-dup components must land in ONE split: plant chains whose
    per-doc hash routing would separate them, and assert every component
    is split-homogeneous while proportions stay near the request."""
    from covid19i2b2_spark.operators.sampling import leakage_safe_split

    df = spark.createDataFrame(
        [(i,) for i in range(2_000)], "doc_id long"
    )
    # chains 0-1-2, 10-11, ... every 10th id pairs with its neighbors
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 2_000, 10)]
        + [(i + 1, i + 2) for i in range(0, 2_000, 10)],
        "id_a long, id_b long",
    )
    out = leakage_safe_split(
        df, pairs, "doc_id", {"train": 0.8, "val": 0.2}
    ).cache()
    per_comp = (
        out.groupBy("component")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_comp)
    # the planted triples specifically stay together
    trip = {
        r.doc_id: r.split
        for r in out.filter(F.col("doc_id") < 3).collect()
    }
    assert len(set(trip.values())) == 1 and len(trip) == 3
    # proportions still track the request (components route, not docs)
    sizes = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(sizes.get("train", 0) - 1600) < 200
    out.unpersist()


def test_keep_top_fraction_per_domain(spark):
    """Per-domain threshold selection: exactly the top fraction survives
    per domain on distinct scores, skewed domain sizes don't leak across
    domains, and the approx path tracks the exact one."""
    from covid19i2b2_spark.operators.quality import keep_top_fraction

    rows = [(f"a{i}", "a", float(i)) for i in range(100)] + [
        (f"b{i}", "b", float(i)) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string, score double")
    kept = keep_top_fraction(df, "lang", "score", 0.25).collect()
    a = sorted(float(r.score) for r in kept if r.lang == "a")
    b = sorted(float(r.score) for r in kept if r.lang == "b")
    # exact percentile threshold at q=0.75 keeps the top quarter
    # (plus the interpolated boundary value)
    assert min(a) >= 74.0 and len(a) in (25, 26)
    assert min(b) >= 6.0 and len(b) in (3, 4)
    approx = keep_top_fraction(df, "lang", "score", 0.25, approx=True).count()
    assert abs(approx - len(kept)) <= 2
    assert keep_top_fraction(df, "lang", "score", 1.0).count() == 110
    import pytest as _pt

    with _pt.raises(ValueError):
        keep_top_fraction(df, "lang", "score", 0.0)


def test_select_to_token_budget_semantics(spark):
    """Budget selection: per-group totals never exceed the budget, docs
    are claimed best-score-first, a doc bigger than the whole budget is
    never selected, and the output is partitioning-independent."""
    from pyspark.sql import functions as F

    from covid19i2b2_spark.operators.sampling import select_to_token_budget

    rows = [
        # grp a: scores 9,8,7 with tokens 40,50,20 -> 40+50=90 fits,
        # the 20-token doc would cross 100 -> excluded
        ("a", 1, 9.0, 40), ("a", 2, 8.0, 50), ("a", 3, 7.0, 20),
        # grp b: single doc larger than the budget -> nothing selected
        ("b", 4, 9.0, 150),
        # grp c: tie scores break by key asc
        ("c", 6, 5.0, 60), ("c", 5, 5.0, 60),
    ]
    df = spark.createDataFrame(rows, "grp string, key long, score double, toks long")
    got = select_to_token_budget(
        df, "key", "score", "toks", budget=100, group_cols=["grp"]
    )
    keys = {r["key"] for r in got.collect()}
    assert keys == {1, 2, 5}
    again = select_to_token_budget(
        df.repartition(7), "key", "score", "toks", budget=100,
        group_cols=["grp"],
    )
    assert {r["key"] for r in again.collect()} == keys


def test_filter_top_fraction_modes(spark):
    """Exact mode keeps exactly ceil(frac*n) per group; sketch mode's
    kept fraction sits within the DDSketch relative-error band of the
    target; invalid args raise."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from covid19i2b2_spark.operators.sampling import filter_top_fraction

    df = spark.range(1000).selectExpr(
        "id as key", "cast(id % 4 as string) as grp",
        "cast(pmod(xxhash64(id), 100000) as double) as score",
    )
    exact = filter_top_fraction(df, "key", "score", 0.3, ["grp"], impl="exact")
    per_group = {r["grp"]: r["count"] for r in exact.groupBy("grp").count().collect()}
    assert all(v == 75 for v in per_group.values())  # ceil(250*0.3)

    sk = filter_top_fraction(df, "key", "score", 0.3, ["grp"], impl="sketch")
    n_sk = sk.count()
    # DDSketch thresholds are (1+-eps)-relative on the VALUE; with a
    # near-uniform score distribution the kept fraction stays close
    assert 0.2 * 1000 <= n_sk <= 0.4 * 1000, n_sk
    # sketch keeps a superset-biased set around the same threshold:
    # every exact-kept score above the approx threshold is kept too
    with _pytest.raises(ValueError):
        filter_top_fraction(df, "key", "score", 0.3, ["grp"], impl="nope")
    with _pytest.raises(ValueError):
        filter_top_fraction(df, "key", "score", 1.5, ["grp"])


def test_corpus_divergence_properties(spark):
    """JS divergence: 0 for identical snapshots, symmetric, ln 2 for
    disjoint vocabularies, and sensitive to a planted distribution
    shift; groups missing on one side are omitted."""
    import math

    from covid19i2b2_spark.operators.drift import corpus_divergence_ordered

    a = spark.createDataFrame(
        [(1, "g", "x x y"), (2, "g", "x y z"), (3, "only_a", "q q")],
        "doc_id long, src string, text string",
    )
    same = corpus_divergence_ordered(a, a, "text", ["src"]).collect()
    assert all(r["js_divergence"] == 0.0 for r in same)

    b = spark.createDataFrame(
        [(4, "g", "x x y z"), (5, "g", "w w")],
        "doc_id long, src string, text string",
    )
    ab = {r["src"]: r for r in corpus_divergence_ordered(a, b, "text", ["src"]).collect()}
    ba = {r["src"]: r for r in corpus_divergence_ordered(b, a, "text", ["src"]).collect()}
    assert set(ab) == {"g"}  # only_a has no counterpart -> omitted
    assert ab["g"]["js_divergence"] == ba["g"]["js_divergence"] > 0.0
    assert ab["g"]["n_types_shared"] == 3  # x, y, z

    dis = spark.createDataFrame(
        [(9, "g", "aa bb cc")], "doc_id long, src string, text string"
    )
    far = corpus_divergence_ordered(a, dis, "text", ["src"]).collect()[0]
    assert abs(far["js_divergence"] - math.log(2)) < 1e-5
    assert far["n_types_shared"] == 0


def test_filter_top_fraction_sketch_respects_eps(spark):
    """Regression (review r5): the sketch threshold must be decoded
    with the SAME eps the histogram was built with — a mismatched gamma
    decodes garbage thresholds that let everything through."""
    from covid19i2b2_spark.operators.sampling import filter_top_fraction

    df = spark.range(2000).selectExpr(
        "id as key",
        "cast(pmod(xxhash64(id), 100000) as double) + 1000.0 as score",
    )
    for eps in (0.01, 0.05, 0.1):
        kept = filter_top_fraction(
            df, "key", "score", 0.3, (), impl="sketch", eps=eps
        ).count()
        assert 0.15 * 2000 <= kept <= 0.45 * 2000, (eps, kept)


def test_global_modes_avoid_single_task_window(spark):
    """Regression (review r5): ungrouped exact filter_top_fraction and
    select_to_token_budget must produce the same rows as the naive
    single-partition computation — via the range-partition prefix plan,
    whose physical plan contains no unpartitioned window over the full
    input."""
    from pyspark.sql import functions as F

    from covid19i2b2_spark.operators.sampling import (
        filter_top_fraction,
        select_to_token_budget,
    )

    df = spark.range(5000).selectExpr(
        "id as key",
        "cast(pmod(xxhash64(id, 7), 1000) as double) as score",
        "cast(pmod(xxhash64(id, 11), 50) + 1 as long) as toks",
    ).repartition(16)

    rows = df.collect()
    order = sorted(rows, key=lambda r: (-r["score"], r["key"]))

    import math

    n_keep = math.ceil(len(rows) * 0.2)
    want_top = {r["key"] for r in order[:n_keep]}
    got_top = {
        r["key"]
        for r in filter_top_fraction(df, "key", "score", 0.2, ()).collect()
    }
    assert got_top == want_top

    budget, cum, want_budget = 20_000, 0, set()
    for r in order:
        if cum + r["toks"] <= budget:
            want_budget.add(r["key"])
            cum += r["toks"]
        else:
            break
    got_budget = {
        r["key"]
        for r in select_to_token_budget(
            df, "key", "score", "toks", budget=budget
        ).collect()
    }
    assert got_budget == want_budget


def test_global_prefix_stable_across_jobs(spark):
    """Regression (ADVICE r5 HIGH / VERDICT r6 #1): the global prefix
    plan must pin the range partitioning ONCE.  Unfixed, the stats
    collect and the kept/edge filters re-ran the range exchange as
    separate jobs, and RangePartitioner re-draws its reservoir sample
    per job — at 5 k rows the sample nearly covers the input so
    boundaries coincided by luck, but at 300 k rows the sample
    truncates and a row's __pid drifts between jobs: reproduced here
    as silent budget overshoot (+3104 rows) or mid-prefix drops
    (-2810) in 4/5 runs before the localCheckpoint fix.  An unrelated
    job runs between the operator call (which collects the stats) and
    the consuming collect (the kept/edge filter jobs) to maximize
    inter-job state change."""
    import math

    from covid19i2b2_spark.operators.sampling import (
        filter_top_fraction,
        select_to_token_budget,
    )

    df = spark.range(300_000).selectExpr(
        "id as key",
        "cast(pmod(xxhash64(id, 7), 1000000) as double) as score",
        "cast(pmod(xxhash64(id, 11), 50) + 1 as long) as toks",
    ).repartition(16)

    rows = df.collect()
    order = sorted(rows, key=lambda r: (-r["score"], r["key"]))
    budget, cum, want = 3_000_000, 0, set()
    for r in order:
        if cum + r["toks"] <= budget:
            want.add(r["key"])
            cum += r["toks"]
        else:
            break

    for _ in range(3):
        out = select_to_token_budget(df, "key", "score", "toks", budget=budget)
        # interleave: an unrelated job between the stats job (already
        # run inside the call) and the kept/edge filter jobs below
        spark.range(10).count()
        got = {r["key"] for r in out.collect()}
        assert got == want, (
            f"partition drift: extra={len(got - want)} "
            f"missing={len(want - got)}"
        )

    # same plan under ungrouped exact filter_top_fraction (VERDICT r6
    # #4 registers the budget form; this pins the fraction form at the
    # same scale, with the row count folded into the stats collect)
    n_keep = math.ceil(len(rows) * 0.1)
    want_frac = {r["key"] for r in order[:n_keep]}
    got_frac = {
        r["key"]
        for r in filter_top_fraction(df, "key", "score", 0.1, ()).collect()
    }
    assert got_frac == want_frac


def test_token_budget_weight_contract(spark):
    """Regression (ADVICE r5 low / VERDICT r6 #2): NULL or negative
    token counts must raise identically in the grouped and global
    paths — before the guard the two paths silently disagreed (grouped
    cumsum kept NULL-token rows for free; global kept them wholesale
    in full partitions or TypeError'd the driver loop)."""
    import pytest as _pt

    from covid19i2b2_spark.operators.sampling import select_to_token_budget

    rows = [("a", 1, 9.0, 40), ("a", 2, 8.0, None), ("b", 3, 7.0, 20)]
    df = spark.createDataFrame(
        rows, "grp string, key long, score double, toks long"
    )
    with _pt.raises(Exception, match="non-NULL and non-negative"):
        select_to_token_budget(
            df, "key", "score", "toks", budget=100, group_cols=["grp"]
        ).collect()
    with _pt.raises(Exception, match="non-NULL and non-negative"):
        select_to_token_budget(
            df, "key", "score", "toks", budget=100
        ).collect()
    neg = spark.createDataFrame(
        [("a", 1, 9.0, -5)], "grp string, key long, score double, toks long"
    )
    with _pt.raises(Exception, match="non-NULL and non-negative"):
        select_to_token_budget(
            neg, "key", "score", "toks", budget=100, group_cols=["grp"]
        ).collect()
    # valid input unaffected in both paths
    ok = spark.createDataFrame(
        [("a", 1, 9.0, 40), ("a", 2, 8.0, 50)],
        "grp string, key long, score double, toks long",
    )
    assert {
        r["key"]
        for r in select_to_token_budget(
            ok, "key", "score", "toks", budget=100, group_cols=["grp"]
        ).collect()
    } == {1, 2}
    assert {
        r["key"]
        for r in select_to_token_budget(
            ok, "key", "score", "toks", budget=100
        ).collect()
    } == {1, 2}


def test_global_exact_empty_input(spark):
    """The ungrouped exact paths on an EMPTY frame: the n==0
    early-return was folded into the budget callable (VERDICT r6 #6);
    empty input must still come back empty with the original schema."""
    from covid19i2b2_spark.operators.sampling import (
        filter_top_fraction,
        select_to_token_budget,
    )

    df = spark.range(0).selectExpr(
        "id as key", "cast(id as double) as score", "id as toks"
    )
    out = filter_top_fraction(df, "key", "score", 0.5, ())
    assert out.count() == 0 and out.columns == df.columns
    out2 = select_to_token_budget(df, "key", "score", "toks", budget=10)
    assert out2.count() == 0 and out2.columns == df.columns


def _persisted_rdd_ids(spark) -> set[int]:
    return {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs()
        .keySet()
        .toArray()
    }


def test_checkpoint_handle_releases_storage(spark):
    """VERDICT r7 #6: the global prefix plan's eager localCheckpoint
    must have a DETERMINISTIC release path — without one a long-lived
    session accumulates executor storage until the ContextCleaner
    happens to GC the dropped frames.  cache_handles gets exactly one
    PinnedPrefixHandle per global stage; unpersist() after
    materialization frees the checkpoint immediately (asserted via the
    persistent-RDD registry, by id — unrelated concurrent GC of other
    tests' RDDs can only shrink the sets these asserts track) and is
    idempotent.  4 iterations, zero net growth (the per-iteration
    created/released delta asserts are exact, so more iterations only
    added wall — round 16, driver pytest window)."""
    from covid19i2b2_spark.operators.sampling import (
        PinnedPrefixHandle,
        select_to_token_budget,
    )

    docs = spark.createDataFrame(
        [(i, float(i % 17), 10 + i % 5) for i in range(500)],
        "key long, score double, toks long",
    )
    initial = _persisted_rdd_ids(spark)
    last_handle = None
    for i in range(4):
        before = _persisted_rdd_ids(spark)
        handles: list = []
        out = select_to_token_budget(
            docs, "key", "score", "toks", budget=1000 + i,
            cache_handles=handles,
        )
        n = out.count()  # materialize BEFORE release
        assert n > 0
        assert len(handles) == 1
        assert isinstance(handles[0], PinnedPrefixHandle)
        created = _persisted_rdd_ids(spark) - before
        assert created, "checkpoint did not register as persisted"
        for h in handles:
            h.unpersist()
        assert _persisted_rdd_ids(spark) & created == set()
        last_handle = handles[0]
    assert _persisted_rdd_ids(spark) - initial == set()
    last_handle.unpersist()  # idempotent

    # filter_top_fraction's ungrouped exact mode rides the same plan
    handles2: list = []
    from covid19i2b2_spark.operators.sampling import filter_top_fraction

    kept = filter_top_fraction(
        docs, "key", "score", 0.25, (), cache_handles=handles2
    )
    assert kept.count() == 125
    assert len(handles2) == 1
    handles2[0].unpersist()
    assert _persisted_rdd_ids(spark) - initial == set()


def test_dsir_selects_target_like_documents(spark):
    """X57 planted selection: raw pool = 30 target-vocabulary docs +
    30 gibberish docs; the importance weight (sum form) must put every
    selected doc in the target-like half despite the Gumbel noise
    (each doc is long enough that the log-weight gap dwarfs the noise
    scale), deterministically for a fixed seed; length_normalized mode
    and validation pinned too."""
    import pytest as _pytest

    from covid19i2b2_spark.operators.sampling import dsir_select

    tgt_words = ["alpha", "beta", "gamma", "delta"]
    junk_words = ["zz1", "zz2", "zz3", "zz4"]
    target = spark.createDataFrame(
        [(1000 + i, " ".join(tgt_words * 10)) for i in range(5)],
        "doc_id long, text string",
    )
    rows = [
        (i, " ".join((tgt_words if i < 30 else junk_words) * 10))
        for i in range(60)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string")

    sel = dsir_select(raw, target, "doc_id", "text", k=20, seed=11)
    picked = [r["doc_id"] for r in sel.collect()]
    assert len(picked) == 20
    assert all(d < 30 for d in picked), picked
    # deterministic for a fixed seed, across partitionings
    again = [
        r["doc_id"]
        for r in dsir_select(
            raw.repartition(7), target, "doc_id", "text", k=20, seed=11
        ).collect()
    ]
    assert picked == again
    # length-normalized mode also separates the planted halves
    norm = dsir_select(
        raw, target, "doc_id", "text", k=20, seed=11,
        length_normalized=True,
    )
    assert all(r["doc_id"] < 30 for r in norm.collect())
    with _pytest.raises(ValueError, match="k must be"):
        dsir_select(raw, target, "doc_id", "text", k=0)


def test_dsir_one_pass_equals_two_pass(spark):
    """VERDICT r10 #2: the fused single-scan scoring (one explode +
    one broadcast token->(count_target, count_raw) map) must be
    bit-identical to the original two-pass unigram_logprob_score
    composition — the fixed-point picounit sums make both plans
    order-independent, so this is exact equality on weights and keys,
    not a tolerance check."""
    from covid19i2b2_spark.operators.sampling import dsir_select
    from covid19i2b2_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    raw = docs.filter(F.col("doc_id") % 10 != 0)
    kw = dict(k=40, top_n_vocab=100, seed=7)
    one = [
        (r["doc_id"], r["log_weight"], r["gumbel_key"])
        for r in dsir_select(
            raw, target, "doc_id", "text", one_pass=True, **kw
        ).collect()
    ]
    two = [
        (r["doc_id"], r["log_weight"], r["gumbel_key"])
        for r in dsir_select(
            raw, target, "doc_id", "text", one_pass=False, **kw
        ).collect()
    ]
    assert one == two
    assert len(one) == 40
