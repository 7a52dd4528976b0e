"""Deterministic sampling + sequence packing (operators/sampling.py)."""

from __future__ import annotations

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
