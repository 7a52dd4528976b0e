"""spark.ml-backed near-dup pipeline (SURVEY §2.11 X2 alternate path):
RegexTokenizer -> NGram(2) -> HashingTF -> MinHashLSH.approxSimilarityJoin.

The hand-built pipeline in dedup.py is the primary path (cheaper: no
ml.Vector conversion, fused verify); this variant exists because MLlib's
LSH gives approxNearestNeighbors and a model object that can be persisted
and reused across jobs — useful when the dedup index outlives one query.
Gated behind import-try per the environment contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

try:
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, RegexTokenizer

    ML_AVAILABLE = True
except ImportError:  # pragma: no cover - pyspark.ml ships with pyspark
    ML_AVAILABLE = False


def ml_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_features: int = 1 << 18,
    num_hash_tables: int = 8,
    max_distance: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MLlib LSH.  Returns (id_a, id_b, jaccard) where
    jaccard = 1 - approx Jaccard distance.  Empty-token docs are dropped
    (MinHashLSH requires >=1 non-zero feature)."""
    if not ML_AVAILABLE:  # pragma: no cover
        raise ImportError("pyspark.ml not available")
    tokenizer = RegexTokenizer(
        inputCol=text_col, outputCol="__tokens", pattern=r"\s+"
    )
    # bigrams, not unigram sets: corpora with small shared vocabularies
    # make token-SET Jaccard degenerate (every doc pairs with every doc);
    # 2-grams restore discrimination (matches q_ngram_jaccard's measure)
    ngram = NGram(n=2, inputCol="__tokens", outputCol="__grams")
    tf = HashingTF(
        inputCol="__grams", outputCol="__features", numFeatures=num_features
    )
    lsh = MinHashLSH(
        inputCol="__features",
        outputCol="__hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    feats = tf.transform(ngram.transform(tokenizer.transform(df.select(id_col, text_col))))
    feats = feats.filter(F.size("__grams") > 0)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, max_distance, distCol="__dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            (F.lit(1.0) - F.col("__dist")).alias("jaccard"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
