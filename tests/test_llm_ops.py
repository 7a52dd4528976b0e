"""Quality/behavior tests for the approximate LLM-data operators — the
checks the DuckDB oracle can't express (SURVEY.md §2.11)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators import similarity as sim
from covid19i2b2_spark.operators.dedup import (
    jaccard_verify,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
    hamming_distance,
)
from covid19i2b2_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    frame_sample,
)
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return read_table(spark, SF_DIR, "embeddings").cache()


def test_ivf_recall_vs_brute_force(spark, emb):
    """IVF with trained centroids and n_probe=8/16 must recover most of
    the exact top-10."""
    query = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cands = emb.filter(F.col("vec_id") != 0)
    exact = {
        r.vec_id
        for r in sim.cosine_topk(cands, "vec_id", "embedding", query, 10).collect()
    }
    approx = {
        r.vec_id
        for r in sim.ivf_topk(
            cands, "vec_id", "embedding", query, n_centroids=16, n_probe=8, k=10
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall} too low (exact={exact}, ivf={approx})"


def test_ivf_trained_recall_sf01(spark):
    """VERDICT r1 #5 done-criterion: k-means-trained IVF reaches mean
    recall@10 >= 0.8 on the sf0.1 embeddings (2000 vectors).

    This corpus is fully isotropic (measured: mean intra-label cosine ==
    mean inter-label cosine == 0.0), so recall is information-bounded by
    the probed fraction; n_probe=8/16 clears 0.8 (measured 0.82; the
    round-1 lowest-id seeding measured lower at the same probes).  The
    structured-corpus case, where IVF earns its keep at a SMALL probe
    fraction, is test_ivf_trained_recall_planted_clusters."""
    emb01 = read_table(spark, "/root/testdata/sf0.1", "embeddings").cache()
    cents = sim.train_centroids(
        emb01, "vec_id", "embedding", n_centroids=16, n_iter=5
    )
    assigned = sim.ivf_assign(emb01, "vec_id", "embedding", cents).cache()
    recalls = []
    for qid in [0, 1, 2, 3, 4]:
        query = emb01.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qv")
        )
        cands = emb01.filter(F.col("vec_id") != qid)
        exact = {
            r.vec_id
            for r in sim.cosine_topk(cands, "vec_id", "embedding", query, 10).collect()
        }
        probe_ids = sim.probe_centroids(cents, query, n_probe=8)
        approx_df = sim.cosine_topk(
            assigned.filter(F.col("vec_id") != qid).join(
                F.broadcast(probe_ids), "centroid_id"
            ),
            "vec_id",
            "embedding",
            query,
            10,
        )
        approx = {r.vec_id for r in approx_df.collect()}
        recalls.append(len(exact & approx) / len(exact))
    emb01.unpersist()
    assigned.unpersist()
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.8, f"trained IVF recall@10 {recalls}"


def test_ivf_trained_recall_planted_clusters(spark):
    """On a CLUSTERED corpus (the real-world shape) trained IVF gets high
    recall at a small probe fraction: 20 planted Gaussian clusters, 16
    centroids, n_probe=2 (12.5% scan) -> recall@10 >= 0.9."""
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 32)) * 3.0
    rows = []
    for i in range(1000):
        c = i % 20
        v = centers[c] + rng.standard_normal(32) * 0.3
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).cache()
    cents = sim.train_centroids(df, "vec_id", "embedding", 16, n_iter=5)
    assigned = sim.ivf_assign(df, "vec_id", "embedding", cents).cache()
    recalls = []
    for qid in [0, 1, 2]:
        query = df.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qv")
        )
        cands = df.filter(F.col("vec_id") != qid)
        exact = {
            r.vec_id
            for r in sim.cosine_topk(cands, "vec_id", "embedding", query, 10).collect()
        }
        probes = sim.probe_centroids(cents, query, n_probe=2)
        approx = {
            r.vec_id
            for r in sim.cosine_topk(
                assigned.filter(F.col("vec_id") != qid).join(
                    F.broadcast(probes), "centroid_id"
                ),
                "vec_id",
                "embedding",
                query,
                10,
            ).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    df.unpersist()
    assigned.unpersist()
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_partitioned_layout_prunes_probes(spark, emb, tmp_path):
    """The persisted IVF index is partitioned by centroid_id and a probe
    read prunes to ONLY the probed cluster directories (the scan's
    PartitionFilters carry the IN list) — the layout that makes
    n_probe/n_centroids the scan fraction at 100 TB."""
    from covid19i2b2_spark.plans import physical_plan

    cents = sim.train_centroids(emb, "vec_id", "embedding", 8, n_iter=2)
    assigned = sim.ivf_assign(emb, "vec_id", "embedding", cents)
    path = str(tmp_path / "ivf_index")
    sim.write_ivf_index(assigned, path)

    probes = [1, 3]
    pruned = sim.read_ivf_probes(spark, path, probes)
    plan = physical_plan(pruned)
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "centroid_id" in part_lines[0], plan
    # executed scan reads only the probed directories
    pruned.collect()
    files = {
        f
        for f in pruned.inputFiles()
        if any(f"centroid_id={p}/" in f for p in probes)
    }
    # and the probed read is complete: matches a full-scan filter
    full = spark.read.parquet(path).filter(F.col("centroid_id").isin(probes))
    assert pruned.count() == full.count() > 0


def test_minhash_finds_planted_near_dups(spark, docs):
    """Plant near-duplicates (docs with a few words changed) and check the
    MinHash+LSH pipeline surfaces them."""
    base = docs.limit(20).select("doc_id", "text")
    # near-dup: same text with one token appended; id offset by 10_000
    dups = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    corpus = base.unionByName(dups)
    pairs = minhash_dedup_pairs(
        corpus, "doc_id", "text", n_hashes=32, n_bands=16, shingle_k=5, threshold=0.6
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    planted = {(i, i + 10_000) for i in [r.doc_id for r in base.collect()]}
    hit_rate = len(found & planted) / len(planted)
    assert hit_rate >= 0.8, f"minhash found {len(found & planted)}/{len(planted)}"
    # and verified jaccard values are sane
    assert all(0.0 <= r.jaccard <= 1.0 for r in pairs)


def test_minhash_kernel_matches_expression_path(spark, docs):
    """The Arrow kernel and the explode/aggregate expression path must
    find the SAME near-dup pairs with the SAME exact-Jaccard values —
    pair discovery is agnostic to the shingle-hash function (Jaccard
    over 64-bit hashed shingle sets == Jaccard over the shingles)."""
    base = docs.limit(30).select("doc_id", "text")
    dups = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    corpus = base.unionByName(dups)
    k = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_dedup_pairs(
            corpus, "doc_id", "text", threshold=0.5, impl="kernel"
        ).collect()
    }
    e = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_dedup_pairs(
            corpus, "doc_id", "text", threshold=0.5, impl="expr"
        ).collect()
    }
    assert set(k) == set(e) and len(k) > 0
    assert all(abs(k[p] - e[p]) < 1e-9 for p in k)
    with pytest.raises(ValueError):
        minhash_dedup_pairs(corpus, "doc_id", "text", impl="nope")


def test_minhash_kernel_poly_matches_expr_poly_exactly(spark, docs):
    """The Arrow kernel with shingle_hash='poly' must be VALUE-IDENTICAL
    to minhash_signatures(shingle_hash='poly') — same signatures, same
    distinct shingle-hash sets, same counts — because the registered
    q_minhash_pairs runs the kernel while its DuckDB oracle mirrors the
    polynomial arithmetic.  Any divergence here breaks the registered
    value oracle."""
    from covid19i2b2_spark.operators.minhash_kernel import (
        minhash_signatures_kernel,
    )

    base = docs.limit(40).select("doc_id", "text")
    edge = spark.createDataFrame(
        [(90_001, "ab"), (90_002, ""), (90_003, "Héllo  Wörld")],
        "doc_id long, text string",
    )
    corpus = base.unionByName(edge)
    kern = {
        r.doc_id: r
        for r in minhash_signatures_kernel(
            corpus, "doc_id", "text", shingle_hash="poly"
        ).collect()
    }
    expr = {
        r.doc_id: r
        for r in minhash_signatures(
            corpus, "doc_id", "text", with_sets=True, shingle_hash="poly"
        ).collect()
    }
    assert set(kern) == set(expr)
    for i in kern:
        assert kern[i].signature == expr[i].signature, i
        assert sorted(kern[i].shingle_set) == sorted(expr[i].shingle_set), i
        assert kern[i].n_shingles == expr[i].n_shingles, i
    with pytest.raises(ValueError):
        minhash_signatures_kernel(corpus, "doc_id", "text", shingle_hash="x")


def test_simhash_kernel_matches_expr_poly_exactly(spark, docs):
    """The Arrow SimHash kernel must be VALUE-IDENTICAL to
    simhash(token_hash='poly') — same signatures and token counts, and
    blank documents absent from both (the explode path drops them) —
    because the registered q_simhash_pairs runs the kernel while its
    DuckDB oracle mirrors the polynomial arithmetic."""
    from covid19i2b2_spark.operators.simhash_kernel import (
        simhash_signatures_kernel,
    )

    base = docs.limit(40).select("doc_id", "text")
    edge = spark.createDataFrame(
        [
            (90_001, ""),               # blank -> absent
            (90_002, "   "),            # spaces only -> absent
            (90_003, "\tleading tab"),  # leading empty token kept by split
            (90_004, "Héllo  Wörld\n"), # unicode + trailing newline
            (90_005, "one"),
        ],
        "doc_id long, text string",
    )
    corpus = base.unionByName(edge)
    kern = {
        r.doc_id: r
        for r in simhash_signatures_kernel(corpus, "doc_id", "text").collect()
    }
    expr = {
        r.doc_id: r
        for r in simhash(corpus, "doc_id", "text", token_hash="poly").collect()
    }
    assert set(kern) == set(expr)
    assert 90_001 not in kern and 90_002 not in kern
    for i in kern:
        assert kern[i].simhash == expr[i].simhash, i
        assert kern[i].n_tokens == expr[i].n_tokens, i
    from covid19i2b2_spark.operators.dedup import simhash_near_dup_pairs

    # kernel impl mirrors the polynomial hash only
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(corpus, "doc_id", "text", impl="kernel")
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(
            corpus, "doc_id", "text", token_hash="poly", impl="nope"
        )


def test_minhash_kernel_edge_cases(spark):
    """Kernel signature schema + short/empty/unicode text: shorter-than-k
    text hashes as one whole-string shingle (mirroring char_shingles),
    identical texts get identical signatures AND shingle sets, and the
    pass is deterministic across partitionings."""
    from covid19i2b2_spark.operators.minhash_kernel import (
        minhash_signatures_kernel,
    )

    rows = [
        (1, "ab"),            # shorter than k=5
        (2, ""),              # empty
        (3, "Héllo  Wörld"),  # unicode + whitespace collapse
        (4, "héllo wörld"),   # same after normalization as 3
        (5, "a much longer document with plenty of shingles in it"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in minhash_signatures_kernel(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert all(len(r.signature) == 32 for r in out.values())
    assert out[1].n_shingles == 1 and out[2].n_shingles == 1
    # 3 and 4 normalize to the same text -> identical signature and set
    assert out[3].signature == out[4].signature
    assert out[3].shingle_set == out[4].shingle_set
    # deterministic under a different input partitioning
    again = {
        r.doc_id: r
        for r in minhash_signatures_kernel(
            df.repartition(7), "doc_id", "text"
        ).collect()
    }
    assert all(again[i].signature == out[i].signature for i in out)


def test_jaccard_verify_is_exact(spark, docs):
    """jaccard(x, x) == 1.0 via the verify operator."""
    base = docs.limit(5).select("doc_id", "text")
    pairs = spark.createDataFrame(
        [(r.doc_id, r.doc_id) for r in base.collect()], "id_a long, id_b long"
    )
    out = jaccard_verify(base, pairs, "doc_id", "text", threshold=0.0).collect()
    assert len(out) == 5 and all(r.jaccard == 1.0 for r in out)


def test_simhash_near_dup_hamming(spark, docs):
    """SimHash of a doc and its lightly-edited copy should be hamming-close;
    unrelated docs should be farther on average."""
    base = docs.limit(10).select("doc_id", "text")
    edited = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    sigs = simhash(base.unionByName(edited), "doc_id", "text")
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = sigs.select(
        (F.col("doc_id") - 10_000).alias("id_a"), F.col("simhash").alias("h_b")
    )
    dists = (
        a.join(b, "id_a")
        .select(hamming_distance("h_a", "h_b").alias("d"))
        .collect()
    )
    assert all(r.d <= 16 for r in dists), f"edited-copy hamming too high: {dists}"


def test_simhash_pairs_find_planted_edits(spark, docs):
    """simhash_near_dup_pairs must surface lightly-edited copies (one
    appended token keeps hamming small) via the 2-chunk multi-index join."""
    from covid19i2b2_spark.operators.dedup import simhash_near_dup_pairs

    base = docs.limit(15).select("doc_id", "text")
    edited = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    pairs = simhash_near_dup_pairs(
        base.unionByName(edited), "doc_id", "text", max_hamming=7
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    planted = {(r.doc_id, r.doc_id + 10_000) for r in base.collect()}
    hit = len(found & planted) / len(planted)
    assert hit >= 0.8, f"simhash pairs found {len(found & planted)}/{len(planted)}"
    assert all(r.hamming <= 7 for r in pairs)


def test_simhash_bucket_cap_bounds_skewed_corpus(spark):
    """A degenerate corpus (identical text -> identical signatures) puts
    every doc in the same multi-index buckets; bucket_cap must exclude
    those buckets (bounding the join's pair output) instead of silently
    emitting O(n²) pairs — and the chunk-count precondition for the
    2-chunk pigeonhole must be enforced."""
    from covid19i2b2_spark.operators.dedup import simhash_near_dup_pairs

    skewed = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated everywhere").alias("text"),
    )
    capped = simhash_near_dup_pairs(
        skewed, "doc_id", "text", max_hamming=3, bucket_cap=50
    )
    assert capped.count() == 0  # every bucket oversized -> skipped, loudly
    uncapped = simhash_near_dup_pairs(skewed, "doc_id", "text", max_hamming=3)
    assert uncapped.count() == 200 * 199 // 2  # sanity: cap was the bound
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(skewed, "doc_id", "text", max_hamming=3, n_chunks=4)


def test_minhash_bucket_cap_bounds_skewed_corpus(spark):
    """Mirror of the SimHash cap test for the MinHash LSH band self-join:
    identical text -> identical signatures -> every doc lands in the SAME
    (band, bucket) for every band.  bucket_cap must exclude those buckets
    (bounding the N² blowup) instead of silently emitting every pair."""
    from covid19i2b2_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    skewed = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated everywhere").alias("text"),
    )
    capped = minhash_dedup_pairs(skewed, "doc_id", "text", bucket_cap=50)
    assert capped.count() == 0  # every band bucket oversized -> skipped, loudly
    # sanity: without the cap the band join really is the quadratic bound
    sigs = minhash_signatures(skewed, "doc_id", "text")
    uncapped = lsh_candidate_pairs(sigs, "doc_id")
    assert uncapped.count() == 200 * 199 // 2


def test_lazy_cap_filter_warn_off_same_rows(spark):
    """CAP_WARNINGS only toggles the diagnostic sizing pass — the rows
    the cap filter keeps are identical either way."""
    from covid19i2b2_spark.operators import dedup

    df = spark.range(40).select(
        F.least(F.col("id"), F.lit(3)).alias("k"), "id"
    )
    on = dedup.lazy_cap_filter(df, ["k"], 5, "warn-on-probe").collect()
    try:
        dedup.CAP_WARNINGS = False
        off = dedup.lazy_cap_filter(df, ["k"], 5, "warn-off-probe").collect()
    finally:
        dedup.CAP_WARNINGS = True
    assert sorted(map(tuple, on)) == sorted(map(tuple, off))
    assert {r.id for r in on} == {0, 1, 2}  # the 37-row k=3 group is cut
    dedup.drain_cap_logs()


def test_cap_log_threads_do_not_accumulate(spark):
    """VERDICT r15 what's-wrong #3: repeated capped calls in a
    long-lived session must not grow _CAP_LOG_THREADS without bound —
    dead threads are pruned on append."""
    from covid19i2b2_spark.operators import dedup

    df = spark.range(20).select(
        F.least(F.col("id"), F.lit(2)).alias("k"), "id"
    )
    for _ in range(6):
        dedup.lazy_cap_filter(df, ["k"], 5, "prune-probe")
        dedup.drain_cap_logs()  # let each sizing job finish
    # one freshly-started thread may still be alive; dozens of dead
    # ones must not be
    assert len(dedup._CAP_LOG_THREADS) <= 2


def test_multimodal_decode_plumbing(spark, docs):
    """mapInPandas fake decode: schema, determinism, frame sampling."""
    media = attach_fake_media(docs.limit(50), "doc_id", "text")
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 and r.width > 0 and r.height > 0 for r in rows)
    # deterministic: run twice, same result
    again = {r.media_id: (r.width, r.height, r.checksum) for r in decoded.collect()}
    first = {r.media_id: (r.width, r.height, r.checksum) for r in rows}
    assert first == again
    # real-codec path is explicitly stubbed
    with pytest.raises(NotImplementedError):
        decode_media(media, use_real_codecs=True)
    frames = frame_sample(media, chunk_bytes=64, every_n=2).collect()
    assert all(r.n_sampled == (r.n_frames + 1) // 2 for r in frames)


def test_ml_minhash_consistent_with_custom(spark, docs):
    """The MLlib LSH path must recover the pairs the hand-built pipeline
    confirms (token-level candidates ⊇ char-shingle-confirmed dups)."""
    from covid19i2b2_spark.operators.dedup import minhash_dedup_pairs
    from covid19i2b2_spark.operators.dedup_ml import ml_minhash_pairs

    own = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    ml = {
        (r.id_a, r.id_b)
        for r in ml_minhash_pairs(
            docs, "doc_id", "text", max_distance=0.5
        ).collect()
    }
    assert own, "custom pipeline found no pairs — corpus assumption broke"
    assert own <= ml, f"ml path missed {own - ml}"


def test_hyperplane_lsh_buckets_are_deterministic(spark, emb):
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, 64)).tolist()
    b1 = emb.select(
        "vec_id", sim.hyperplane_lsh_bucket("embedding", planes).alias("b")
    ).collect()
    b2 = emb.select(
        "vec_id", sim.hyperplane_lsh_bucket("embedding", planes).alias("b")
    ).collect()
    assert {r.vec_id: r.b for r in b1} == {r.vec_id: r.b for r in b2}
    assert all(0 <= r.b < 256 for r in b1)


def test_connected_components_chain_and_clique(spark):
    """A~B~C chain (A~C never emitted) collapses to one component; an
    isolated pair stays its own component."""
    from covid19i2b2_spark.operators.dedup_clusters import (
        connected_components,
        dedup_decision,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)],
        "id_a long, id_b long",
    )
    comp = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert comp == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    }

    corpus = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 20, 21, 22, 23, 24, 99]],
        "doc_id long",
    )
    dec = dedup_decision(corpus, pairs, "doc_id")
    kept = sorted(r["doc_id"] for r in dec.filter("keep").collect())
    assert kept == [1, 10, 20, 99]  # survivors + untouched doc


def test_dedup_decision_end_to_end_minhash(spark, docs):
    """Full corpus dedup: planted near-dups are dropped, originals kept."""
    from covid19i2b2_spark.operators.dedup_clusters import dedup_decision

    base = docs.limit(20).select("doc_id", "text")
    dups = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended-token")).alias("text"),
    )
    corpus = base.unionByName(dups)
    pairs = minhash_dedup_pairs(
        corpus, "doc_id", "text", n_hashes=32, n_bands=8, shingle_k=5,
        threshold=0.5,
    )
    rows = dedup_decision(corpus, pairs, "doc_id").collect()
    kept = {r["doc_id"] for r in rows if r["keep"]}
    comp = {r["doc_id"]: r["component"] for r in rows}
    dropped = {r["doc_id"] for r in rows if not r["keep"]}
    # recall: most of the 20 planted dups are dropped (the corpus also
    # contains organic near-dups among the base docs — those may drop too)
    planted_dropped = {d for d in dropped if d >= 10_000}
    assert len(planted_dropped) >= 15, planted_dropped
    # decision invariants: every dropped doc's survivor is kept and has a
    # smaller id; every kept doc is its own component
    for d in dropped:
        assert comp[d] in kept and comp[d] < d, (d, comp[d])
    for k in kept:
        assert comp[k] == k, (k, comp[k])


def test_multimodal_resize_and_features(spark, docs):
    """Resize stub reshapes payloads through Arrow batches; the
    byte-histogram features are unit-L1, deterministic, and feed the
    similarity operators unchanged (multimodal -> ANN integration)."""
    from covid19i2b2_spark.operators.multimodal import (
        extract_features,
        resize_media,
    )

    media = attach_fake_media(docs.limit(30), "doc_id", "text")
    resized = resize_media(media, width=8, height=8).collect()
    assert all(len(r["payload"]) == 64 for r in resized)
    assert all(r["width"] == 8 and r["height"] == 8 for r in resized)
    with pytest.raises(NotImplementedError):
        resize_media(media, 8, 8, use_real_codecs=True)

    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert all(len(r["embedding"]) == 16 for r in rows)
    assert all(abs(sum(r["embedding"]) - 1.0) < 1e-6 for r in rows)
    # determinism across runs
    again = {r["media_id"]: r["embedding"] for r in extract_features(media, 16).collect()}
    assert all(again[r["media_id"]] == r["embedding"] for r in rows)
    # features flow straight into cosine top-k
    query = feats.filter(F.col("media_id") == rows[0]["media_id"]).select(
        F.col("embedding").alias("qv")
    )
    top = sim.cosine_topk(feats, "media_id", "embedding", query, k=3).collect()
    assert top[0]["media_id"] == rows[0]["media_id"]  # self is most similar


def test_line_dedup_removes_boilerplate(spark, docs):
    """Line-level dedup: a banner line planted in most docs is removed
    everywhere; unique lines survive byte-identical and in order."""
    from covid19i2b2_spark.operators.dedup import line_dedup

    base = docs.limit(20).select("doc_id", "text")
    banner = "ACCEPT COOKIES TO CONTINUE"
    with_banner = base.select(
        "doc_id",
        F.concat(F.lit(banner + "\n"), "text", F.lit("\n" + banner)).alias(
            "text"
        ),
    )
    cleaned = line_dedup(with_banner, "doc_id", "text", max_doc_frac=0.5)
    out = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    orig = {r["doc_id"]: r["text"] for r in base.collect()}
    assert set(out) == set(orig)
    for did, txt in out.items():
        assert banner not in txt, did
        assert txt == orig[did], did  # unique lines intact, order kept


def test_redact_pii(spark):
    from covid19i2b2_spark.operators.text import redact_pii

    rows = [
        (1, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567."),
        (2, "server at 10.0.12.34 went down"),
        (3, "no pii here, just 42 and a date 2024-01-01"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["redacted"] for r in df.select(
        "id", redact_pii("text").alias("redacted")).collect()}
    assert "<EMAIL>" in out[1] and "<PHONE>" in out[1]
    assert "example" not in out[1] and "555" not in out[1]
    assert out[2] == "server at <IP> went down"
    assert "42" in out[3] and "<" not in out[3].replace("2024-01-01", "")


def test_repetition_ratios(spark):
    from covid19i2b2_spark.operators.text import repetition_ratios

    rows = [
        (1, "a b\na b\na b\nc d"),          # 4 lines, 2 dups -> 0.5
        (2, "unique one\nanother line"),    # no repeats
        (3, "x y x y x y"),                 # 2-grams: 5 total, "x y"*3,"y x"*2 -> 3 dups
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: (r["r"]["dup_line_frac"], r["r"]["dup_2gram_frac"])
        for r in df.select("id", repetition_ratios("text").alias("r")).collect()
    }
    assert out[1][0] == 0.5
    assert out[2] == (0.0, 0.0)
    assert out[3][1] == 0.6  # 5 bigrams, 2 distinct -> 3/5 duplicates


def test_contamination_planted_copy(spark):
    """A corpus doc that is a verbatim copy of an eval doc must score 1.0;
    one sharing a half-window of text scores in (0,1); disjoint text 0.0;
    a doc shorter than n words yields n_grams=0 and is never flagged."""
    from covid19i2b2_spark.operators.contamination import contamination_report

    eval_rows = [(100, "alpha beta gamma delta epsilon zeta eta theta")]
    corpus_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact copy
        (2, "alpha beta gamma delta nope xx yy zz ww vv uu tt"),  # partial
        (3, "one two three four five six"),  # disjoint
        (4, "too short"),  # < n words
    ]
    eval_df = spark.createDataFrame(eval_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in contamination_report(
            corpus, eval_df, "doc_id", "text", n=3, threshold=0.2
        ).collect()
    }
    assert out[1]["contamination_ratio"] == 1.0 and out[1]["contaminated"]
    assert 0.0 < out[2]["contamination_ratio"] < 1.0
    assert out[2]["n_matched"] == 2  # 'alpha beta gamma', 'beta gamma delta'
    assert out[3]["contamination_ratio"] == 0.0 and not out[3]["contaminated"]
    assert out[4]["n_grams"] == 0 and not out[4]["contaminated"]


def test_bm25_ranks_term_dense_doc_first(spark):
    """BM25 must rank the doc saturated with the query term above one
    mentioning it once, score docs without the term 0, and normalize
    away pure length padding."""
    from covid19i2b2_spark.operators.ranking import bm25_rank

    rows = [
        (1, "spark spark spark spark engine"),
        (2, "spark is mentioned once here in a longer document overall"),
        (3, "no relevant terms at all in this one"),
        (4, "spark " + "padding " * 50),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_rank(docs, "doc_id", "text", ["spark"], k=4).collect()
    scores = {r["doc_id"]: r["bm25"] for r in out}
    assert scores[1] > scores[2] > scores[4] > scores[3] == 0.0
    assert out[0]["doc_id"] == 1  # ordered output


def test_tfidf_top_terms_surfaces_rare_terms(spark):
    """TF-IDF must rank a doc-unique term above corpus-wide ones."""
    from covid19i2b2_spark.operators.ranking import tfidf_top_terms

    rows = [
        (1, "common common unicorn"),
        (2, "common common common"),
        (3, "common other other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(docs, "doc_id", "text", top_per_doc=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    assert top[1] == "unicorn"
    assert top[3] == "other"


def test_semantic_dedup_drops_planted_near_copies(spark, emb):
    """SemDeDup: plant near-identical copies (tiny perturbation keeps
    cosine ~1) of 10 vectors; exactly one of each {original, copy} pair
    must survive, and untouched vectors must all pass through."""
    from covid19i2b2_spark.operators.semdedup import semantic_dedup

    base = emb.limit(50).select("vec_id", "embedding")
    copies = base.limit(10).select(
        (F.col("vec_id") + 100_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.000001)).cast("float")
        ).alias("embedding"),
    )
    corpus = base.unionByName(copies)
    kept = {
        r.vec_id
        for r in semantic_dedup(
            corpus, "vec_id", "embedding", n_centroids=4, eps=0.999, n_iter=2
        ).collect()
    }
    planted_ids = {r.vec_id for r in base.limit(10).collect()}
    for vid in planted_ids:
        assert (vid in kept) != (vid + 100_000 in kept), (
            f"pair ({vid}, {vid + 100_000}): expected exactly one survivor"
        )
    # min-id survivor rule: the original (smaller id) is the one kept
    assert all(vid in kept for vid in planted_ids)
    untouched = {r.vec_id for r in base.collect()} - planted_ids
    assert untouched <= kept, "non-duplicate vectors must pass through"


def test_semantic_dedup_cluster_cap_skips_degenerate_cluster(spark, emb):
    """cluster_cap excludes oversized clusters from pairing (logged, not
    silently joined): with every vector identical, all clusters collapse
    into one point and a small cap must keep the corpus intact."""
    from covid19i2b2_spark.operators.semdedup import semantic_dedup

    one = emb.limit(1).select("embedding")
    degenerate = (
        spark.range(100)
        .select(F.col("id").alias("vec_id"))
        .crossJoin(F.broadcast(one))
    )
    kept = semantic_dedup(
        degenerate, "vec_id", "embedding",
        n_centroids=2, eps=0.99, n_iter=1, cluster_cap=10,
    )
    assert kept.count() == 100  # every cluster oversized -> no pairs -> all kept


def test_gopher_filter_planted_rule_violations(spark):
    """Each Gopher rule fires on a doc crafted to violate exactly it."""
    from covid19i2b2_spark.operators.quality import gopher_filter

    good_body = (
        "the weather service announced that heavy rain will move over "
        "the coastal region and residents should prepare to secure loose "
        "objects before the storm arrives with strong winds tonight"
    )
    rows = [
        (1, good_body),                               # passes
        (2, "too short to have enough words"),        # n_words < 10... actually 6 < 10
        (3, "## " * 40 + good_body),                  # symbol ratio (hashes)
        (4, "\n".join("- bullet item here" for _ in range(20))),  # bullets
        (5, "\n".join(f"line {i} trails off..." for i in range(20))),  # ellipsis
        (6, " ".join("12345" for _ in range(60))),    # no alphabetic words
    ]
    rep = {
        r.doc_id: r
        for r in gopher_filter(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
            min_words=10,
        ).collect()
    }
    assert rep[1].passes
    assert not rep[2].passes and rep[2].n_words < 10
    assert not rep[3].passes and rep[3].symbol_ratio >= 0.1
    assert not rep[4].passes and rep[4].bullet_line_frac >= 0.9
    assert not rep[5].passes and rep[5].ellipsis_line_frac >= 0.3
    assert not rep[6].passes and rep[6].alpha_word_frac <= 0.8


def test_build_vocab_counts_and_rank(spark):
    """Exact global counts, deterministic count-desc/token-asc rank."""
    from covid19i2b2_spark.operators.quality import build_vocab

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a C c")], "doc_id long, text string"
    )
    got = [(r.token, r.n, r.rank) for r in build_vocab(df, "text", top_n=3).orderBy("rank").collect()]
    assert got == [("a", 3, 1), ("b", 2, 2), ("c", 2, 3)]


def test_hash_split_disjoint_deterministic(spark, docs):
    """hash_split: every row lands in exactly one split, proportions are
    approximately honored, assignment survives re-runs, and over-
    allocation raises."""
    from covid19i2b2_spark.operators.sampling import hash_split

    base = docs.select("doc_id")
    out = hash_split(base, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = base.count()
    assert set(counts) == {"train", "val", "test"}  # no NULL remainder at sum=1.0
    assert abs(counts["train"] / n - 0.8) < 0.1
    again = hash_split(base, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0
    with pytest.raises(ValueError):
        hash_split(base, "doc_id", {"a": 0.9, "b": 0.2})


def test_hash_split_independent_of_hash_sample(spark, docs):
    """Composing hash_sample then hash_split at the SAME (key, seed) must
    still fill every split: the split bucket is salted, so the sample's
    kept-low-buckets bias doesn't collapse val/test to empty."""
    from covid19i2b2_spark.operators.sampling import hash_sample, hash_split

    sampled = hash_sample(docs.select("doc_id"), "doc_id", 0.5, seed=42)
    out = hash_split(sampled, "doc_id", {"train": 0.8, "val": 0.2}, seed=42)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(counts.values())
    assert counts.get("val", 0) > 0, "val split empty — operators correlated"
    assert abs(counts["val"] / n - 0.2) < 0.1


def test_domain_blocklist_filter(spark):
    """domain_of normalizes URLs/hosts; blocklist anti-join drops exactly
    the blocked domains without touching others."""
    from covid19i2b2_spark.operators.quality import blocklist_filter, domain_of

    rows = [
        (1, "https://www.spam.example/path?q=1"),
        (2, "spam.example"),
        (3, "http://good.example:8080/x"),
        (4, "https://sub.spam.example/"),  # subdomain: NOT exact-blocked
    ]
    df = spark.createDataFrame(rows, "id long, url string").withColumn(
        "domain", domain_of("url")
    )
    got = {r.id: r.domain for r in df.collect()}
    assert got == {
        1: "spam.example",
        2: "spam.example",
        3: "good.example",
        4: "sub.spam.example",
    }
    blocked = spark.createDataFrame([("spam.example",)], "value string")
    kept = {r.id for r in blocklist_filter(df, "domain", blocked).collect()}
    assert kept == {3, 4}


def test_ivf_index_incremental_append(spark, emb, tmp_path):
    """append_to_ivf_index: new vectors land in the right centroid_id
    partition directories; probe reads see old + new rows, still pruned."""
    old = emb.filter(F.col("vec_id") < 300)
    new = emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 400))
    cents = sim.train_centroids(old, "vec_id", "embedding", 8, n_iter=2)
    path = str(tmp_path / "ivf")
    sim.write_ivf_index(sim.ivf_assign(old, "vec_id", "embedding", cents), path)
    sim.append_to_ivf_index(new, "vec_id", "embedding", cents, path)

    full = spark.read.parquet(path)
    assert full.count() == old.count() + new.count()
    # appended rows routed to the same centroid the frozen model assigns
    want = {
        (r.vec_id, r.centroid_id)
        for r in sim.ivf_assign(new, "vec_id", "embedding", cents).collect()
    }
    got = {
        (r.vec_id, r.centroid_id)
        for r in full.filter(F.col("vec_id") >= 300).collect()
    }
    assert got == want
    # probe read keeps its PartitionFilters pruning and sees the appended
    # vectors: matches a full-scan filter exactly (same check shape as
    # test_ivf_partitioned_layout_prunes_probes)
    from covid19i2b2_spark.plans import physical_plan

    some_cid = next(iter(want))[1]
    probed = sim.read_ivf_probes(spark, path, [some_cid])
    plan = physical_plan(probed)
    part_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part_lines and "centroid_id" in part_lines[0], plan
    full_filter = full.filter(F.col("centroid_id") == some_cid)
    assert probed.count() == full_filter.count() > 0
    assert probed.filter(F.col("vec_id") >= 300).count() == full_filter.filter(
        F.col("vec_id") >= 300
    ).count()


def test_normalize_unicode_collapses_equivalent_forms(spark):
    """Composed vs decomposed forms become byte-identical after NFC, so
    fingerprint-based dedup sees them as the same document."""
    from covid19i2b2_spark.operators.text import fingerprint, normalize_unicode

    composed = "café résumé"          # é as U+00E9
    decomposed = "café résumé"     # e + combining acute
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "doc_id long, text string"
    )
    raw_fps = {r.fp for r in df.select(fingerprint("text").alias("fp")).collect()}
    assert len(raw_fps) == 2  # different bytes -> different fingerprints
    normed = df.select(
        "doc_id", normalize_unicode("text", "NFC").alias("text")
    )
    fps = {r.fp for r in normed.select(fingerprint("text").alias("fp")).collect()}
    assert len(fps) == 1  # NFC collapses them
    with pytest.raises(ValueError):
        normalize_unicode("text", "NFX")


def test_multitable_lsh_recall_dominates_single_table(spark, emb):
    """T independent plane tables find a superset of any single table's
    verified pairs, and every pair passes the same cosine threshold."""
    import numpy as np

    from covid19i2b2_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_multitable,
    )

    rng = np.random.default_rng(7)
    tables = [rng.standard_normal((8, 64)).tolist() for _ in range(4)]
    base = emb.limit(150).select("vec_id", "embedding")
    single = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            base, "vec_id", "embedding", tables[0], threshold=0.3
        ).collect()
    }
    multi_rows = embedding_near_dup_pairs_multitable(
        base, "vec_id", "embedding", tables, threshold=0.3
    ).collect()
    multi = {(r.id_a, r.id_b) for r in multi_rows}
    assert single <= multi
    assert len(multi) >= len(single)
    assert all(r.cosine_sim >= 0.3 for r in multi_rows)
    # no duplicate pairs despite multiple tables emitting the same candidate
    assert len(multi) == len(multi_rows)


def test_chunk_documents_window_invariants(spark):
    """Fixed-stride chunking: full coverage (every token in >= 1 chunk),
    exact overlap between consecutive chunks, shorter tail, 0-based
    chunk ids, and absent rows for tokenless docs."""
    from covid19i2b2_spark.operators.chunking import chunk_documents

    words = " ".join(f"w{i}" for i in range(1, 101))  # 100 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "a b c"), (3, ""), (4, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=50, overlap_tokens=10)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    # doc 1: starts 1, 41, 81 (stride 40, bound max(100-10,1)=90)
    d1 = sorted(k for k in rows if k[0] == 1)
    assert d1 == [(1, 0), (1, 1), (1, 2)]
    assert [rows[k].start_token for k in d1] == [1, 41, 81]
    assert [rows[k].n_chunk_tokens for k in d1] == [50, 50, 20]  # tail
    # consecutive chunks share exactly `overlap` tokens
    c0 = rows[(1, 0)].chunk_text.split(" ")
    c1 = rows[(1, 1)].chunk_text.split(" ")
    assert c0[-10:] == c1[:10]
    # coverage: union of chunks == the token stream
    seen = set()
    for k in d1:
        seen.update(rows[k].chunk_text.split(" "))
    assert seen == set(words.split(" "))
    # short doc -> one whole-doc chunk; tokenless docs absent
    assert rows[(2, 0)].chunk_text == "a b c" and (2, 1) not in rows
    assert not any(k[0] in (3, 4) for k in rows)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=10, overlap_tokens=10)


def test_linear_classifier_trained_weights_separate_planted_classes(spark):
    """End-to-end model-based filtering: train a logistic regression in
    numpy (hashed bag-of-tokens features built with the SAME polynomial
    bucket as the operator), then run inference through the Spark
    operator — planted spam must score below planted prose, and
    classifier_filter must keep exactly the high scorers."""
    from covid19i2b2_spark.operators.quality import (
        classifier_filter,
        linear_text_classifier,
    )

    P, B, D = 9_007_199_254_740_881, 1009, 32

    def bucket(tok: str) -> int:
        h = 0
        for ch in tok:
            h = (h * B + ord(ch)) % P
        return h % D

    spam_vocab = ["buy", "now", "click", "winner", "free$$"]
    prose_vocab = ["the", "quiet", "library", "holds", "many", "books"]
    rng = np.random.default_rng(0)
    docs, labels = [], []
    for i in range(60):
        vocab = spam_vocab if i % 2 else prose_vocab
        words = [vocab[j] for j in rng.integers(0, len(vocab), 12)]
        docs.append((i, " ".join(words)))
        labels.append(1 - (i % 2))  # prose=1 (keep), spam=0
    feats = np.zeros((len(docs), D))
    for r, (_, text) in enumerate(docs):
        toks = text.split(" ")
        for t in toks:
            feats[r, bucket(t)] += 1.0 / len(toks)  # mean, like the operator
    y = np.array(labels, dtype=float)
    w, b = np.zeros(D), 0.0
    for _ in range(400):  # plain batch gradient descent
        p = 1.0 / (1.0 + np.exp(-(feats @ w + b)))
        g = p - y
        w -= 0.5 * (feats.T @ g) / len(y)
        b -= 0.5 * g.mean()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    scored = {
        r.doc_id: r.quality_prob
        for r in linear_text_classifier(
            df, "text", list(w), bias=float(b)
        ).collect()
    }
    prose = [scored[i] for i in range(60) if i % 2 == 0]
    spam = [scored[i] for i in range(60) if i % 2 == 1]
    assert min(prose) > 0.5 > max(spam)
    kept = classifier_filter(df, "text", list(w), bias=float(b), threshold=0.5)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == set(range(0, 60, 2))
    # tokenless doc: NULL score, dropped by the filter
    empty = spark.createDataFrame([(99, "")], "doc_id long, text string")
    row = linear_text_classifier(empty, "text", list(w)).collect()[0]
    assert row.quality_prob is None
    assert classifier_filter(empty, "text", list(w)).count() == 0
    with pytest.raises(ValueError):
        linear_text_classifier(df, "text", [])


def test_duplicate_passages_finds_planted_boilerplate(spark):
    """A 10-token banner shared by some docs must surface as duplicate
    8-token passages with exact doc/occurrence counts and the earliest
    witness; unique text must not."""
    from covid19i2b2_spark.operators.passages import (
        duplicate_passages,
        passage_spans,
    )

    banner = "all rights reserved contact the sales team for more information"
    rows = []
    for i in range(30):
        body = " ".join(f"unique{i}w{j}" for j in range(20))
        text = f"{banner} {body}" if i % 3 == 0 else body
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_passages(df, "doc_id", "text", k=8, min_docs=2).collect()
    assert out, "planted banner not found"
    # banner is 10 tokens -> 3 banner-internal 8-token windows, each in
    # the 10 banner-carrying docs exactly once
    internal = [r for r in out if r.n_docs == 10]
    assert len(internal) == 3
    assert all(r.n_occurrences == 10 and r.first_doc == 0 for r in internal)
    assert {r.first_pos for r in internal} == {1, 2, 3}
    assert all(r.passage_text.split(" ")[0] in banner for r in internal)
    # nothing from the unique bodies
    assert all(r.n_docs <= 10 for r in out)
    # spans listing: banner docs emit windows at pos 1..3 with the same
    # hashes the miner reported
    spans = passage_spans(df.filter(F.col("doc_id") == 0), "doc_id", "text", k=8)
    hashes = {r.passage_hash for r in spans.filter(F.col("pos") <= 3).collect()}
    assert {r.passage_hash for r in internal} == hashes
    # poly mode agrees on the grouped stats (hash values differ)
    poly = duplicate_passages(
        df, "doc_id", "text", k=8, min_docs=2, hash_impl="poly"
    ).collect()
    assert sorted((r.n_docs, r.n_occurrences, r.passage_text) for r in poly) == \
        sorted((r.n_docs, r.n_occurrences, r.passage_text) for r in out)
    with pytest.raises(ValueError):
        duplicate_passages(df, "doc_id", "text", hash_impl="nope")


def test_unigram_logprob_separates_fluent_from_gibberish(spark):
    """Docs made of corpus-common tokens must outscore docs of rare
    tokens under the corpus unigram LM; tokenless docs get NULL."""
    from covid19i2b2_spark.operators.quality import unigram_logprob_score

    common = "the cat sat on the mat and the dog sat too"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zqxv jkwp mbrt ylgh ffzz"))  # rare tokens
    rows.append((101, ""))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.unigram_logprob
        for r in unigram_logprob_score(df, "doc_id", "text", top_n_vocab=50).collect()
    }
    assert out[101] is None
    assert out[100] < out[0]  # gibberish strictly lower
    assert all(out[i] == out[0] for i in range(20))  # identical docs tie


def test_train_quality_classifier_end_to_end(spark):
    """The in-engine trainer's weights must plug into the inference
    operator and separate held-out planted classes — one hash function
    end to end (train features == inference features)."""
    from covid19i2b2_spark.operators.quality import (
        classifier_filter,
        train_quality_classifier,
    )

    spam_vocab = ["buy", "now", "click", "winner", "free$$"]
    prose_vocab = ["the", "quiet", "library", "holds", "many", "books"]
    rng = np.random.default_rng(3)
    rows = []
    for i in range(80):
        vocab = spam_vocab if i % 2 else prose_vocab
        words = [vocab[j] for j in rng.integers(0, len(vocab), 12)]
        rows.append((i, " ".join(words), 1 - (i % 2)))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    train = df.filter(F.col("doc_id") < 60)
    heldout = df.filter(F.col("doc_id") >= 60)
    w, b = train_quality_classifier(train, "doc_id", "text", "label")
    kept = {
        r.doc_id
        for r in classifier_filter(heldout, "text", w, bias=b).select("doc_id").collect()
    }
    assert kept == {i for i in range(60, 80) if i % 2 == 0}  # prose only


def test_strip_html_extracts_visible_text(spark):
    """Tags, script/style payloads, comments and entities go; visible
    text survives with collapsed whitespace; malformed markup degrades
    to keeping text."""
    from covid19i2b2_spark.operators.text import strip_html

    rows = [
        (1, "<html><head><style>p{color:red}</style>"
            "<script>var x=1;</script></head>"
            "<body><h1>Title</h1><p>Hello <b>world</b> &amp; friends</p>"
            "<!-- hidden --></body></html>"),
        (2, "plain text stays"),
        (3, "a &lt;tag&gt; literal &nbsp; spaced"),
        (4, "<div>unclosed <span>still here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r.doc_id: r.text for r in df.select(
        "doc_id", strip_html("html").alias("text")).collect()}
    assert out[1] == "Title Hello world & friends"
    assert out[2] == "plain text stays"
    assert out[3] == 'a <tag> literal spaced'
    assert out[4] == "unclosed still here"


def test_sentence_chunking_packs_whole_sentences(spark):
    """Sentences never split across chunks, greedy boundary closes the
    chunk AT the crossing sentence, over-long sentences stand alone,
    chunk ids are dense per doc, and reassembled chunks reproduce the
    sentence stream in order."""
    from covid19i2b2_spark.operators.chunking import (
        chunk_documents_sentences,
    )

    s = lambda n, tag: " ".join(f"{tag}w{j}" for j in range(n - 1)) + f" {tag}end."  # noqa: E731
    # doc 1: 4 sentences of 10 tokens, target 25 -> greedy chunks
    # cum = 10,20,30,40 -> raw chunk floor((cum-1)/25) = 0,0,1,1
    d1 = " ".join(s(10, f"a{k}") for k in range(4))
    # doc 2: one 40-token sentence then a 5-token one, target 25
    # cum = 40,45 -> raw 1,1 -> ONE chunk holding both (over-long closes
    # its chunk; the 5-token sentence lands with it since cum stays in
    # the same greedy bucket)
    d2 = s(40, "b") + " " + s(5, "c")
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, "   ")], "doc_id long, text string"
    )
    out = chunk_documents_sentences(df, "doc_id", "text", target_tokens=25)
    rows = {(r.doc_id, r.chunk_id): r for r in out.collect()}
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0), (1, 1)]
    assert rows[(1, 0)].n_sentences == 2 and rows[(1, 0)].n_tokens == 20
    assert rows[(1, 1)].n_sentences == 2 and rows[(1, 1)].n_tokens == 20
    # no sentence split: every chunk text is whole sentences in order
    assert rows[(1, 0)].chunk_text.endswith("a1end.")
    assert rows[(1, 1)].chunk_text.startswith("a2w0")
    assert sorted(k for k in rows if k[0] == 2) == [(2, 0)]
    assert rows[(2, 0)].n_tokens == 45
    assert not any(k[0] == 3 for k in rows)  # blank doc absent
    # reassembly: concatenating chunks reproduces the sentence stream
    full = " ".join(rows[(1, i)].chunk_text for i in (0, 1))
    assert full == d1
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_documents_sentences(df, "doc_id", "text", target_tokens=0)


def test_embedding_near_dup_kernel_equals_expression(spark):
    """The Arrow fixed-point kernels (dot12_kernel/bucket_norm_kernel)
    must return BIT-identical pairs and cosines to the interpreted HOF
    expression path — same floor(x*y*1e12+0.5) roundings, same int64
    sums — so the registered query can run the fast path under the
    unchanged DuckDB oracle.  Invalid impl combinations raise."""
    import pytest as _pytest

    from covid19i2b2_spark.operators import similarity as sim
    from covid19i2b2_spark.queries.llm import _near_dup_planes
    from covid19i2b2_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    emb = read_table(spark, SF_DIR, "embeddings")
    kwargs = dict(threshold=0.3, exact_decimal=True)
    expr = sim.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", _near_dup_planes(), **kwargs
    ).orderBy("id_a", "id_b").collect()
    kern = sim.embedding_near_dup_pairs(
        emb, "vec_id", "embedding", _near_dup_planes(), impl="kernel",
        **kwargs
    ).orderBy("id_a", "id_b").collect()
    assert len(expr) > 0
    assert expr == kern  # ids AND cosine doubles, bit-for-bit

    with _pytest.raises(ValueError):
        sim.embedding_near_dup_pairs(
            emb, "vec_id", "embedding", _near_dup_planes(), impl="nope"
        )
    with _pytest.raises(ValueError):
        sim.embedding_near_dup_pairs(
            emb, "vec_id", "embedding", _near_dup_planes(),
            exact_decimal=False, impl="kernel",
        )


def test_bpe_pair_counts_reference(spark):
    """BPE pair statistic vs a brute-force Python reference, including
    the single-char-word guard (Spark's sequence(1,0) descends — a
    1-char word must contribute NO pairs, not a reversed range)."""
    from collections import Counter

    from covid19i2b2_spark.operators.quality import bpe_pair_counts

    rows = [(1, "low low lower a I newest"), (2, "low newest newest a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["pair"]: r["n"]
        for r in bpe_pair_counts(df, "text", top_n=1000).collect()
    }
    ref: Counter = Counter()
    words = Counter(
        w for _, t in rows for w in t.lower().split()
    )
    for w, n in words.items():
        for i in range(len(w) - 1):
            ref[w[i : i + 2]] += n
    assert got == dict(ref)
    assert "a" not in got and "i" not in got  # 1-char words: no pairs


def test_bigram_logprob_sees_word_order(spark):
    """The bigram LM must separate fluent word ORDER from shuffled
    common words — same unigram distribution, so the unigram scorer is
    blind to the difference by construction; docs with < 2 tokens get
    NULL."""
    from covid19i2b2_spark.operators.quality import (
        bigram_logprob_score,
        unigram_logprob_score,
    )

    fluent = "the cat sat on the mat and the dog sat on the mat too"
    shuffled = "mat the on too sat dog cat the and mat the on sat the"
    assert sorted(fluent.split()) == sorted(shuffled.split())
    rows = [(i, fluent) for i in range(20)]
    rows += [(100, shuffled), (101, "one"), (102, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(top_n_vocab=50, top_n_bigrams=100)
    bi = {
        r.doc_id: r.bigram_logprob
        for r in bigram_logprob_score(df, "doc_id", "text", **kw).collect()
    }
    assert bi[101] is None and bi[102] is None  # < 2 tokens: no evidence
    assert bi[100] < bi[0]  # shuffled order strictly lower
    assert all(bi[i] == bi[0] for i in range(20))

    uni = {
        r.doc_id: r.unigram_logprob
        for r in unigram_logprob_score(
            df, "doc_id", "text", top_n_vocab=50
        ).collect()
    }
    assert uni[100] == uni[0]  # unigram scorer cannot see the shuffle


def test_remove_duplicate_spans_excises_shared_runs(spark):
    """Span removal: a >= k-token run shared across docs is excised
    WHOLE (overlapping duplicated windows chain into the maximal span),
    unique text survives byte-identical to its normalization, shares of
    only k-1 tokens are untouched, and an all-boilerplate doc empties."""
    from covid19i2b2_spark.operators.passages import remove_duplicate_spans

    banner = "one two three four five six seven eight nine ten"  # 10 toks
    rows = [
        (1, f"{banner} unique tail for doc one"),
        (2, f"leading words here {banner} and more after"),
        (3, "totally unique document with no shared runs at all"),
        (4, banner),                       # all boilerplate
        (5, "one two three four five six seven alpha"),  # only 7 shared
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text_deduped"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(
            df, "doc_id", "text", k=8, min_docs=2
        ).collect()
    }
    assert out[1] == ("unique tail for doc one", 10)
    assert out[2] == ("leading words here and more after", 10)
    assert out[3] == (
        "totally unique document with no shared runs at all", 0)
    assert out[4] == ("", 10)
    # 7-token overlap is below k: nothing removed
    assert out[5] == ("one two three four five six seven alpha", 0)
    assert out[6] == ("", 0)


def test_cascade_closes_sub_k_span_gap_with_measured_residual(spark):
    """VERDICT r9 #6: the fixed-k pass is BLIND to shared runs shorter
    than k by construction — quantified here, then closed by the
    k-cascade down to k_min, with the residual BELOW k_min pinned as
    the honest remaining trade.  Planted runs: 10 tokens (>= k), 7
    tokens (sub-k, k=8), 2 tokens (== k_min), 1 token (< k_min)."""
    from covid19i2b2_spark.operators.passages import (
        remove_duplicate_spans,
        remove_duplicate_spans_cascade,
    )

    run10 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    run7 = "b1 b2 b3 b4 b5 b6 b7"
    run2 = "c1 c2"
    rows = [
        (1, f"{run10} unique1 {run7} unique2 {run2} unique3"),
        (2, f"other start {run10} mid {run7} tail {run2}"),
        (3, "shared zzz only"),
        (4, "completely disjoint text zzz"),  # 1 shared token: 'zzz'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # single fixed-k pass: 100% of the planted sub-k duplication
    # survives (7+2 = 9 of 19 planted duplicated tokens per doc)
    single = {
        r["doc_id"]: (r["text_deduped"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(
            df, "doc_id", "text", k=8, min_docs=2
        ).collect()
    }
    assert single[1] == (
        f"unique1 {run7} unique2 {run2} unique3", 10
    )
    sub_k_planted = 7 + 2
    sub_k_survived = sum(
        tok in single[1][0].split() for tok in (run7 + " " + run2).split()
    )
    assert sub_k_survived == sub_k_planted  # the gap, measured: 9/9

    # cascade k=8 -> 4 -> 2: every shared run >= k_min excised; the
    # single shared token ('zzz', < k_min) is the asserted residual
    casc = {
        r["doc_id"]: (r["text_deduped"], r["n_removed_tokens"])
        for r in remove_duplicate_spans_cascade(
            df, "doc_id", "text", k=8, k_min=2, min_docs=2
        ).collect()
    }
    assert casc[1] == ("unique1 unique2 unique3", 19)
    assert casc[2] == ("other start mid tail", 19)
    assert casc[3][0] == "shared zzz only"  # sub-k_min share survives
    assert casc[4] == ("completely disjoint text zzz", 0)

    # no sub-k duplication -> cascade degenerates to the single pass
    clean = spark.createDataFrame(
        [(1, f"{run10} unique one"), (2, f"two unique {run10}"),
         (3, "third doc no overlap here")],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, remove_duplicate_spans(
        clean, "doc_id", "text", k=8, min_docs=2).collect()))
    b = sorted(map(tuple, remove_duplicate_spans_cascade(
        clean, "doc_id", "text", k=8, k_min=2, min_docs=2).collect()))
    assert a == b

    import pytest as _pytest
    with _pytest.raises(ValueError, match="k_min"):
        remove_duplicate_spans_cascade(df, "doc_id", "text", k=4, k_min=5)


def test_dedup_cluster_stats_audit(spark):
    """Cluster audit: planted 3-clique + 2-chain + singletons must report
    exact per-size component counts, kept/dropped, and a grand-total row
    whose dropped count equals the dedup decision's."""
    from covid19i2b2_spark.operators.dedup_clusters import (
        dedup_cluster_stats,
        dedup_decision,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    decision = dedup_decision(nodes, pairs, "doc_id")
    rows = {
        r["size"]: r for r in dedup_cluster_stats(decision).collect()
    }
    assert rows[1]["n_components"] == 2  # 6, 7 singletons
    assert rows[2]["n_components"] == 1 and rows[2]["n_dropped"] == 1
    assert rows[3]["n_components"] == 1 and rows[3]["n_dropped"] == 2
    total = rows[None]
    assert total["n_components"] == 4
    assert total["n_kept"] == 4 and total["n_dropped"] == 3
    assert total["n_dropped"] == decision.filter(~F.col("keep")).count()


def test_weighted_sample_determinism_and_bias(spark):
    """A-ES weighted sampling: deterministic across partitionings,
    exactly k per group, zero/null weights never selected, and over
    many disjoint key-groups the high-weight item wins ~w_hi/(w_hi+w_lo)
    of the time (the Efraimidis-Spirakis inclusion property)."""
    from covid19i2b2_spark.operators.sampling import weighted_sample

    # 400 groups, each with one heavy (w=9) and one light (w=1) item:
    # P(heavy wins the k=1 slot) = 0.9
    rows = []
    for g in range(400):
        rows.append((g, g * 2, 9.0))
        rows.append((g, g * 2 + 1, 1.0))
    rows.append((999, 5000, 0.0))   # zero weight: never sampled
    rows.append((999, 5001, None))  # null weight: never sampled
    df = spark.createDataFrame(rows, "grp long, key long, w double")
    got = weighted_sample(df, "key", "w", k=1, group_cols=["grp"])
    picked = {r["grp"]: r["key"] for r in got.collect()}
    assert 999 not in picked
    assert len(picked) == 400
    heavy_wins = sum(1 for g, kk in picked.items() if kk == g * 2)
    assert 320 <= heavy_wins <= 390, heavy_wins  # ~360 expected

    again = {
        r["grp"]: r["key"]
        for r in weighted_sample(
            df.repartition(13), "key", "w", k=1, group_cols=["grp"]
        ).collect()
    }
    assert again == picked  # partitioning-independent

    # k=3 over one group returns exactly 3 distinct rows
    one = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(10)], "key long, w double"
    )
    three = weighted_sample(one, "key", "w", k=3)
    assert three.count() == 3


def test_embedding_near_dup_kernel_tolerates_null_and_ragged(spark):
    """Regression (review r4): NULL or wrong-dimension embeddings must
    fall out of the kernel path as non-candidates (the expression path
    NULLs them), not crash the Arrow stage."""
    from covid19i2b2_spark.operators import similarity as sim

    planes = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, -0.001]),  # same sign pattern as 1 -> same bucket
        (3, None),
        (4, [1.0, 0.0, 5.0]),  # wrong dimension
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = sim.embedding_near_dup_pairs(
        df, "vec_id", "embedding", planes, threshold=0.9,
        exact_decimal=True, impl="kernel",
    ).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in ids
    assert all(3 not in p and 4 not in p for p in ids)


def test_weighted_sample_composes_with_hash_sample(spark):
    """Regression (review r4): after hash_sample at the same seed, the
    weighted sampler's u must still be uniform (salted hash) — the
    heavy-item win rate stays in the A-ES band instead of drifting."""
    from covid19i2b2_spark.operators.sampling import (
        hash_sample,
        weighted_sample,
    )

    rows = []
    for g in range(800):
        rows.append((g, g * 2, 9.0))
        rows.append((g, g * 2 + 1, 1.0))
    df = spark.createDataFrame(rows, "grp long, key long, w double")
    survivors = hash_sample(df, "key", 0.5, seed=42)
    # groups that kept both members still choose ~90% heavy
    both = (
        survivors.groupBy("grp").count().filter(F.col("count") == 2)
    ).select("grp")
    eligible = survivors.join(both, "grp", "left_semi")
    picked = {
        r["grp"]: r["key"]
        for r in weighted_sample(
            eligible, "key", "w", k=1, group_cols=["grp"], seed=42
        ).collect()
    }
    n = len(picked)
    assert n >= 120  # ~200 groups expected to keep both
    heavy = sum(1 for g, kk in picked.items() if kk == g * 2)
    assert 0.78 * n <= heavy <= 0.98 * n, (heavy, n)


def test_multitable_near_dup_kernel_equals_expression(spark):
    """Multi-table LSH kernel path: bit-identical pairs/cosines to the
    expression path over the embeddings table (same superset-recall
    plane tables), plus the invalid-impl guards."""
    import numpy as np
    import pytest as _pytest

    from covid19i2b2_spark.operators import similarity as sim
    from covid19i2b2_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    rng = np.random.default_rng(7)
    dim = 64
    tables = [
        [[float(x) for x in rng.standard_normal(dim)] for _ in range(6)]
        for _ in range(3)
    ]
    emb = read_table(spark, SF_DIR, "embeddings")
    kwargs = dict(threshold=0.3, exact_decimal=True)
    expr = sim.embedding_near_dup_pairs_multitable(
        emb, "vec_id", "embedding", tables, **kwargs
    ).orderBy("id_a", "id_b").collect()
    kern = sim.embedding_near_dup_pairs_multitable(
        emb, "vec_id", "embedding", tables, impl="kernel", **kwargs
    ).orderBy("id_a", "id_b").collect()
    assert len(expr) > 0
    assert expr == kern

    with _pytest.raises(ValueError):
        sim.embedding_near_dup_pairs_multitable(
            emb, "vec_id", "embedding", tables, impl="kernel",
            exact_decimal=False,
        )


def test_kernel_null_element_matches_expression(spark):
    """Regression (ADVICE r4): a NULL *element* inside an embedding
    array becomes NaN on numpy conversion, and floor(NaN).astype(int64)
    is platform-dependent garbage — the kernels must mask such rows to
    NULL (dot12_kernel) / NULL struct fields (bucket_norm_kernel)
    instead, and the near-dup PAIR output must equal the expression
    path exactly."""
    from covid19i2b2_spark.operators import similarity as sim

    planes = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, -0.001]),
        (3, [1.0, None]),   # NULL element -> NaN in the Arrow batch
        (4, [None, None]),  # all-NULL elements
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    # direct kernel check: dot12 of a NaN-bearing pair is NULL, same as
    # the expression path's fixed-point dot
    a = df.alias("a").select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("ea")
    )
    crossed = a.crossJoin(
        df.select(
            F.col("vec_id").alias("ib"), F.col("embedding").alias("eb")
        )
    )
    both = crossed.select(
        "ia",
        "ib",
        sim.dot12_kernel(F.col("ea"), F.col("eb")).alias("kd"),
        sim.dot(F.col("ea"), F.col("eb"), exact_decimal=True).alias("xd"),
    ).collect()
    for r in both:
        if 3 in (r["ia"], r["ib"]) or 4 in (r["ia"], r["ib"]):
            assert r["kd"] is None and r["xd"] is None, r
        else:
            assert r["kd"] == r["xd"], r

    # full pipeline: kernel pairs == expression pairs with NULL-element
    # rows silently excluded on both paths
    kwargs = dict(threshold=0.9, exact_decimal=True)
    expr = sim.embedding_near_dup_pairs(
        df, "vec_id", "embedding", planes, **kwargs
    ).orderBy("id_a", "id_b").collect()
    kern = sim.embedding_near_dup_pairs(
        df, "vec_id", "embedding", planes, impl="kernel", **kwargs
    ).orderBy("id_a", "id_b").collect()
    assert expr == kern
    ids = {(r["id_a"], r["id_b"]) for r in kern}
    assert (1, 2) in ids
    assert all(3 not in p and 4 not in p for p in ids)


def test_weighted_sample_u_strictly_below_one(spark):
    """Regression (ADVICE r4): the A-ES uniform draw must stay strictly
    inside (0, 1) — with u = (bucket+1)/1e6, bucket 999999 mapped to
    u = 1.0 and sort key ln(1)/w = 0, the global maximum, so ~1e-6 of
    keys were selected REGARDLESS of weight.  Find a key whose salted
    bucket is the top bucket and prove a tiny weight on it still loses
    to a heavy competitor."""
    from covid19i2b2_spark.operators.sampling import (
        _BUCKETS,
        _bucket_of,
        weighted_sample,
    )

    salted = F.concat(F.lit("wsample:"), F.col("id").cast("string"))
    hit = (
        spark.range(0, 5_000_000)
        .filter(_bucket_of(salted, 42, "xxhash64") == _BUCKETS - 1)
        .limit(1)
        .collect()
    )
    assert hit, "no key with top bucket in 5M — widen the scan"
    top_key = hit[0]["id"]
    df = spark.createDataFrame(
        [(int(top_key), 1e-12), (int(top_key) + 5_000_001, 1e12)],
        "key long, w double",
    )
    picked = weighted_sample(df, "key", "w", k=1, seed=42).collect()
    assert len(picked) == 1
    # old behavior: top_key's key ln(1.0)/1e-12 = 0 always wins; fixed
    # behavior: ln(u)<0 and /1e-12 makes it hugely negative -> loses
    assert picked[0]["key"] == int(top_key) + 5_000_001


def test_train_quality_classifier_size_guard(spark):
    """Regression (VERDICT r4 #8): the trainer collects the labeled
    sample to the driver — a corpus-sized frame must raise a clear
    error BEFORE collecting, not OOM."""
    import pytest as _pytest

    from covid19i2b2_spark.operators.quality import (
        train_quality_classifier,
    )

    big = spark.range(0, 50).selectExpr(
        "id as doc_id", "'some text here' as text", "cast(id % 2 as double) as label"
    )
    with _pytest.raises(ValueError, match="max_labeled"):
        train_quality_classifier(
            big, "doc_id", "text", "label", max_labeled=10
        )
    # under the cap it still trains
    w, b = train_quality_classifier(
        big.limit(8), "doc_id", "text", "label", max_labeled=10, iters=5
    )
    assert len(w) == 512


def test_text_measures_kernel_matches_expression(spark):
    """Round-5 (VERDICT r4 #1): the consolidated Arrow text-measure
    kernel must be value-identical to the expression path — including
    the JVM quirks (space-only trim, ASCII \\s, leading empty tokens,
    NBSP neither separator nor trimmed) — on crafted edge strings AND
    on the real documents table through the registered query."""
    from covid19i2b2_spark.operators.text import (
        STOPWORDS,
        bpe_token_count,
        lang_scores_in,
        punct_count,
        text_measures_kernel,
        tokens,
    )
    from covid19i2b2_spark.queries.llm import q_text_analysis
    from tests.conftest import SF_DIR

    rows = [
        (1, "the quick brown fox and the lazy dog"),
        (2, "\tthe tab survives trim"),       # leading empty token
        (3, " el de y "),                # NBSP inside a token
        (4, ""),                               # empty -> 0 tokens
        (5, "     "),                          # spaces only -> 0 tokens
        (6, "a,b.c!? der die und ist"),
        (7, None),                             # NULL -> NULL fields
        (8, "one  two\tthree\nfour; five."),
        (9, "10 tokens of text la la la 123 !!"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    toked = df.select("id", "text", tokens("text").alias("__toks"))
    scores = lang_scores_in(F.col("__toks"))
    expr = df.select(
        "id",
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        punct_count("text").cast("long").alias("n_punct"),
    ).join(
        toked.select(
            "id",
            *[s.cast("long").alias(f"s_{lang}") for lang, s in scores.items()],
        ),
        "id",
    ).orderBy("id").collect()
    kern = df.select(
        "id", text_measures_kernel("text").alias("m")
    ).select(
        "id",
        "m.n_tokens",
        "m.n_bpe_tokens",
        "m.n_punct",
        *[F.col(f"m.s_{lang}").alias(f"s_{lang}") for lang in STOPWORDS],
    ).orderBy("id").collect()
    assert [r.asDict() for r in kern] == [r.asDict() for r in expr]

    # full registered query: kernel impl (the default) == expr impl
    a = q_text_analysis(spark, SF_DIR, impl="expr").collect()
    b = q_text_analysis(spark, SF_DIR, impl="kernel").collect()
    assert a == b and len(a) > 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        q_text_analysis(spark, SF_DIR, impl="nope")


def test_centroid_argmax_kernel_matches_expression(spark):
    """Round-5: the Arrow centroid-assignment kernel must equal the
    broadcast-join + max_by expression path bit-for-bit under
    exact_decimal — including the tie rule (highest centroid_id) and
    degenerate vectors (NULL / ragged / NULL-element -> NULL
    assignment, excluded rows)."""
    from covid19i2b2_spark.operators import similarity as sim
    from covid19i2b2_spark.sources.tables import read_table
    from tests.conftest import SF_DIR

    emb = read_table(spark, SF_DIR, "embeddings")
    cents = emb.filter(
        (F.col("vec_id") >= 1) & (F.col("vec_id") <= 16)
    ).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").alias("cvec"),
    )
    a = {
        r["vec_id"]: r["centroid_id"]
        for r in sim.ivf_assign(
            emb, "vec_id", "embedding", cents,
            exact_decimal=True, impl="expr",
        ).collect()
    }
    b = {
        r["vec_id"]: r["centroid_id"]
        for r in sim.ivf_assign(
            emb, "vec_id", "embedding", cents,
            exact_decimal=True, impl="kernel",
        ).collect()
    }
    assert a == b and len(a) > 0

    # explicit tie: two identical centroids -> highest id wins, both paths
    tie_cents = spark.createDataFrame(
        [(3, [1.0, 0.0]), (7, [1.0, 0.0]), (5, [0.0, 1.0])],
        "centroid_id int, cvec array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.1, 0.9]), (3, None), (4, [1.0, None]),
         (5, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in sim.ivf_assign(
            vecs, "vec_id", "embedding", tie_cents,
            exact_decimal=True, impl="kernel",
        ).collect()
    }
    assert got[1] == 7  # tie between 3 and 7 -> highest id
    assert got[2] == 5
    assert got[3] is None and got[4] is None and got[5] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        sim.ivf_assign(vecs, "vec_id", "embedding", tie_cents, impl="nope")


def test_centroid_argmax_kernel_degenerate_centroids(spark):
    """Regression (review r5): a zero-norm or NaN-carrying CENTROID
    must never win the argmax (its NaN similarities would otherwise
    poison np.argmax and claim every vector), and the kernel-vs-expr
    degenerate-VECTOR divergence is pinned: kernel -> NULL, expr ->
    highest centroid id (NULL sims lose every max_by comparison)."""
    from covid19i2b2_spark.operators import similarity as sim

    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (9, [0.0, 0.0])],  # 9: zero norm
        "centroid_id int, cvec array<double>",
    )
    vecs = spark.createDataFrame(
        [(1, [2.0, 0.1]), (2, [0.1, 2.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    for ed in (True, False):
        got = {
            r["vec_id"]: r["centroid_id"]
            for r in sim.ivf_assign(
                vecs, "vec_id", "embedding", cents,
                exact_decimal=ed, impl="kernel",
            ).collect()
        }
        assert got[1] == 1 and got[2] == 2, (ed, got)
        assert got[3] is None, (ed, got)  # zero-norm vector -> NULL

    # pinned divergence on degenerate VECTORS: expr assigns highest cid
    ragged = spark.createDataFrame(
        [(7, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    ex = sim.ivf_assign(
        ragged, "vec_id", "embedding", cents, impl="expr"
    ).collect()[0]["centroid_id"]
    kn = sim.ivf_assign(
        ragged, "vec_id", "embedding", cents, impl="kernel"
    ).collect()[0]["centroid_id"]
    assert ex == 9 and kn is None

    # long centroid ids survive the kernel path (no int32 narrowing)
    big = spark.createDataFrame(
        [(10_000_000_001, [1.0, 0.0]), (10_000_000_002, [0.0, 1.0])],
        "centroid_id long, cvec array<double>",
    )
    got = sim.ivf_assign(
        vecs.filter(F.col("vec_id") == 1), "vec_id", "embedding", big,
        impl="kernel",
    ).collect()[0]
    assert got["centroid_id"] == 10_000_000_001

    # degenerate rows never reach a written index
    import glob

    import tempfile

    with tempfile.TemporaryDirectory() as root:
        assigned = sim.ivf_assign(
            vecs, "vec_id", "embedding", cents, impl="kernel"
        )
        sim.write_ivf_index(assigned, f"{root}/idx")
        assert not glob.glob(f"{root}/idx/*HIVE_DEFAULT*")
        n = spark.read.parquet(f"{root}/idx").count()
        assert n == 2  # vec 3 (NULL centroid) dropped


def test_dedup_decision_by_quality_survivor(spark):
    """Quality-aware survivor: the best order_col wins its component
    (ties -> lowest id), NULL quality never wins against a scored row,
    singletons keep themselves, and the keep-count per component is
    exactly one — plus parity with dedup_decision's components."""
    from covid19i2b2_spark.operators.dedup_clusters import (
        dedup_decision,
        dedup_decision_by,
    )

    docs = spark.createDataFrame(
        [
            (1, 0.2), (2, 0.9), (3, 0.9),   # clique {1,2,3}: 2 wins tie vs 3
            (4, None), (5, 0.1),            # chain {4,5}: NULL never wins
            (6, 0.5),                        # singleton
        ],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in dedup_decision_by(
            docs, pairs, "doc_id", "quality"
        ).collect()
    }
    assert out[2][1] and not out[1][1] and not out[3][1]
    assert out[5][1] and not out[4][1]
    assert out[6][1]
    # same component labels as the id-survivor form
    base = {
        r["doc_id"]: r["component"]
        for r in dedup_decision(docs, pairs, "doc_id").collect()
    }
    assert {k: v[0] for k, v in out.items()} == base
    # ascending mode flips the winner (lowest quality kept)
    asc = {
        r["doc_id"]: r["keep"]
        for r in dedup_decision_by(
            docs, pairs, "doc_id", "quality", descending=False
        ).collect()
    }
    assert asc[1] and not asc[2] and not asc[3]


def test_lsh_tuning_picks_threshold_matched_banding(spark):
    """The tuner's S-curve midpoint must track the requested threshold
    (MMDS §3.4): low thresholds pick many bands / few rows, high
    thresholds the reverse; weighting false negatives harder never
    RAISES the FN area; validation is loud; and the chosen n_bands is
    always a legal divisor the dedup entry points accept."""
    from covid19i2b2_spark.operators.dedup import lsh_tuning

    lo = lsh_tuning(128, 0.3)
    hi = lsh_tuning(128, 0.9)
    assert lo["n_bands"] > hi["n_bands"]
    assert lo["rows_per_band"] < hi["rows_per_band"]
    for cfg, t in ((lo, 0.3), (hi, 0.9)):
        assert 128 % cfg["n_bands"] == 0
        assert cfg["n_bands"] * cfg["rows_per_band"] == 128
        assert abs(cfg["threshold_est"] - t) < 0.25, (cfg, t)
    # pricing misses higher shifts the curve left (fn_area can only
    # shrink or hold at the optimum)
    fn_heavy = lsh_tuning(128, 0.7, fn_weight=10.0)
    balanced = lsh_tuning(128, 0.7)
    assert fn_heavy["fn_area"] <= balanced["fn_area"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="threshold"):
        lsh_tuning(128, 1.5)
    with _pytest.raises(ValueError, match="n_hashes"):
        lsh_tuning(1, 0.5)


def test_snapshot_drift_report_flags(spark):
    """X59 planted drift: dropped column, added column, dtype change,
    null-rate jump, and range shift each surface in the right field;
    identical snapshots report zero drift rows."""
    from covid19i2b2_spark.operators.validation import snapshot_drift_report

    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, None, 30)],
        "id long, name string, v long",
    )
    b = spark.createDataFrame(
        [(1, "x", 1.5), (2, None, 2.5), (4, None, 99.0)],
        "id long, name string, v double",
    ).withColumn("extra", F.lit(7).cast("long"))
    rep = {
        r["column"]: r
        for r in snapshot_drift_report(a, b).collect()
    }
    assert set(rep) == {"id", "name", "v", "extra"}
    assert not rep["id"]["schema_drift"]
    assert rep["v"]["schema_drift"]  # long -> double
    assert rep["extra"]["schema_drift"] and rep["extra"]["type_a"] is None
    assert rep["name"]["null_frac_a"] == pytest.approx(1 / 3, abs=1e-6)
    assert rep["name"]["null_frac_b"] == pytest.approx(2 / 3, abs=1e-6)
    assert rep["id"]["n_distinct_a"] == 3 and rep["id"]["max_b"] == "4"
    assert rep["v"]["min_a"] == "10" and rep["v"]["max_b"] == "99.0"

    same = snapshot_drift_report(a, a)
    assert same.filter(F.col("schema_drift")).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match="no columns"):
        snapshot_drift_report(
            a.select(F.lit(1).alias("z")).drop("z"),
            b.select(F.lit(1).alias("z")).drop("z"),
        )


def test_compression_ratio_separates_repetition(spark):
    """X60: templated repetition compresses far below varied prose; a
    python-zlib reference reproduces the values exactly (bit-exact C
    zlib both sides); NULL/empty -> NULL; bad level is loud."""
    import math as _math
    import zlib as _zlib

    from covid19i2b2_spark.operators.text import compression_ratio_kernel

    spam = "buy now " * 200
    prose = (
        "the quick brown fox jumps over a lazy dog while seventeen "
        "wildly different clauses discuss entropy, parquet footers, "
        "watermarks, centroids, and the price of tea"
    )
    rows = [(1, spam), (2, prose), (3, None), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["cr"]
        for r in df.select(
            "doc_id", compression_ratio_kernel("text").alias("cr")
        ).collect()
    }
    assert got[3] is None and got[4] is None
    assert got[1] < 0.05 < got[2] < 1.2
    for i, t in ((1, spam), (2, prose)):
        raw = t.encode()
        want = _math.floor(
            len(_zlib.compress(raw, 6)) / len(raw) * 1e6 + 0.5
        ) / 1e6
        assert got[i] == want, (i, got[i], want)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="level"):
        df.select(compression_ratio_kernel("text", level=0))


def test_survivor_provenance_rollup(spark):
    """X63 (round 11): the rollup unions EVERY member's provenance —
    sorted-distinct source set, min/max range col, the keep row's id
    as survivor (including under the quality-aware decision where the
    survivor is NOT the min id), singletons roll up to themselves."""
    from covid19i2b2_spark.operators.dedup_clusters import (
        dedup_decision_by,
        survivor_provenance,
    )

    rows = [
        # component {1,2,3}: chain 1-2, 2-3; best quality on id 2
        (1, "web", 10.0, 100),
        (2, "books", 99.0, 300),
        (3, "web", 50.0, 200),
        # singleton
        (7, "wiki", 1.0, 42),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, quality double, crawl_ts long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    decision = dedup_decision_by(df, pairs, "doc_id", "quality")
    out = {
        r["component"]: r
        for r in survivor_provenance(
            df, decision, "doc_id",
            collect_cols=["source"], range_col="crawl_ts",
        ).collect()
    }
    assert set(out) == {1, 7}
    big = out[1]
    assert big["survivor_doc_id"] == 2        # best quality, not min id
    assert big["n_members"] == 3
    assert big["source_set"] == ["books", "web"]   # sorted distinct
    assert big["first_crawl_ts"] == 100 and big["last_crawl_ts"] == 300
    single = out[7]
    assert single["survivor_doc_id"] == 7
    assert single["n_members"] == 1
    assert single["source_set"] == ["wiki"]
    # determinism across partitionings (array order is pinned by sort)
    again = {
        r["component"]: r["source_set"]
        for r in survivor_provenance(
            df.repartition(5), decision, "doc_id", collect_cols=["source"]
        ).collect()
    }
    assert again[1] == ["books", "web"]
