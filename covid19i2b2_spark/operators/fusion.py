"""X81: reciprocal-rank fusion — hybrid lexical + vector retrieval
(SURVEY §2.11 extension; round 12).  The engine retrieves two ways —
BM25 over the persisted inverted index (X54) and cosine/IVF ANN over
embeddings (X3'/X52) — and corpus-curation tasks need BOTH at once
(decontamination against an eval set misses paraphrases lexically and
misses rare-entity overlap semantically).  Reciprocal Rank Fusion
(Cormack, Clarke & Buettcher, SIGIR 2009) is the standard score-free
combiner:

    rrf(d) = Σ_lists 1 / (k + rank_list(d))

Score-FREE matters: BM25 scores and cosine similarities live on
incomparable scales, and RRF uses only each list's ranking, which is
why it beats learned weights in the paper's experiments and became
the default in production hybrid search.

Shape: each input list is ranked by its own score (one bounded window
over ≤ per-list-k rows — retrieval outputs, not the corpus), the
tagged union is one groupBy(id) over Σ|lists| rows, and the final
top-k is an ORDER BY on the fused rows.  Everything is bounded by the
retrieval depth, never the corpus; at 100 TB the expensive parts are
the retrievals themselves (X54's postings probe, X52's IVF probes),
and fusion adds one tiny aggregate.

Deterministic: ties inside a list break on the id (the house rule),
ties in fused score break on the id; lists that don't contain a doc
simply contribute nothing (the RRF convention — absence is rank ∞).

DuckDB parity (full replay: per-list ROW_NUMBER + the 1/(k+r) sum)
lives in tests/test_oracle_parity.py (q_rrf_fusion — UNREGISTERED;
the 50-query window is full).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rank_by_score(
    df: DataFrame,
    id_col: str,
    score_col: str,
    ascending: bool = False,
) -> DataFrame:
    """(id, rank) from a scored retrieval list — rank 1 = best.
    ``ascending=True`` for distance-like scores (smaller = better).
    Ties break on the id (deterministic, the house rule)."""
    score = F.col(score_col)
    order = [score.asc() if ascending else score.desc(), F.col(id_col)]
    w = Window.orderBy(*order)
    return df.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    ranked_lists: list[DataFrame],
    *,
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse (id, rank) lists into (id, rrf_score, n_lists) ordered
    best-first.  ``k`` is the paper's damping constant (60 in the
    original and in every production default); ``top_n`` truncates
    the fused output.  Lists are retrieval outputs (bounded rows) —
    see module docstring for why this never touches the corpus."""
    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    tagged = ranked_lists[0].select("id", "rank")
    for other in ranked_lists[1:]:
        tagged = tagged.unionByName(other.select("id", "rank"))
    fused = (
        tagged.groupBy("id")
        .agg(
            F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias(
                "rrf_score"
            ),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col("id"))
    )
    return fused.limit(top_n) if top_n is not None else fused


def hybrid_search(
    lexical: DataFrame,
    vector: DataFrame,
    *,
    id_col: str = "doc_id",
    lexical_score_col: str = "score",
    vector_score_col: str = "similarity",
    k: int = 60,
    top_n: int = 10,
) -> DataFrame:
    """The standard two-list case: X54's BM25 result + an X3'/X52
    similarity result, RRF-fused to (id, rrf_score, n_lists).  Both
    score columns are higher-is-better (BM25 and cosine both are);
    pass distance-shaped lists through rank_by_score(ascending=True)
    and rrf_fuse directly instead."""
    return rrf_fuse(
        [
            rank_by_score(lexical, id_col, lexical_score_col),
            rank_by_score(vector, id_col, vector_score_col),
        ],
        k=k,
        top_n=top_n,
    )
