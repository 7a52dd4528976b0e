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
    """IVF with n_probe=8/16 must recover most of the exact top-10."""
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
    appended token keeps hamming small) via the chunk-bucket join."""
    from covid19i2b2_spark.operators.dedup import simhash_near_dup_pairs

    base = docs.limit(15).select("doc_id", "text")
    edited = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"),
    )
    pairs = simhash_near_dup_pairs(
        base.unionByName(edited), "doc_id", "text", max_hamming=7, n_chunks=8
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    planted = {(r.doc_id, r.doc_id + 10_000) for r in base.collect()}
    hit = len(found & planted) / len(planted)
    assert hit >= 0.8, f"simhash pairs found {len(found & planted)}/{len(planted)}"
    assert all(r.hamming <= 7 for r in pairs)


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
