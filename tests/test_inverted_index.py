"""X54 inverted index (operators/inverted_index.py): search ≡ the
one-shot bm25_rank, append ≡ one-shot build, replay duplication
surfaced / dedup-on-read / compact recovery, probe plan reads only the
query terms' postings (filter pushdown), determinism across
partitionings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.inverted_index import InvertedIndex
from covid19i2b2_spark.operators.ranking import bm25_rank
from covid19i2b2_spark.sources.tables import read_table
from tests.conftest import SF_DIR

TERMS = ["spark", "filter", "vector"]


def _docs(spark):
    return read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _ranked(df):
    return [
        (r["doc_id"], r["bm25"])
        for r in df.orderBy(F.col("bm25").desc(), "doc_id").collect()
    ]


def test_search_matches_one_shot_bm25(spark, tmp_path):
    """Index-backed search must reproduce bm25_rank's ranking and
    round6 scores (term-order ulp is the only allowed daylight —
    both sides round at 1e-6)."""
    docs = _docs(spark)
    idx = InvertedIndex(str(tmp_path / "inv"))
    idx.build(docs, "doc_id", "text")
    got = _ranked(idx.search(spark, TERMS, k=10))
    want = [
        (r["doc_id"], r["bm25"])
        for r in bm25_rank(docs, "doc_id", "text", TERMS, k=10).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, g), (_, w) in zip(got, want):
        assert g == pytest.approx(w, abs=2e-6)
    with pytest.raises(ValueError, match="non-empty"):
        idx.search(spark, [])


def test_append_equals_one_shot_build(spark, tmp_path):
    docs = _docs(spark)
    inc = InvertedIndex(str(tmp_path / "inc"))
    inc.build(docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text")
    inc.append(docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text")
    one = InvertedIndex(str(tmp_path / "one"))
    one.build(docs, "doc_id", "text")
    assert _ranked(inc.search(spark, TERMS, k=15)) == _ranked(
        one.search(spark, TERMS, k=15)
    )
    si, so = inc.stats(spark), one.stats(spark)
    assert si["posting_rows"] == so["posting_rows"]
    assert si["n_docs"] == so["n_docs"] and si["avgdl"] == so["avgdl"]
    assert si["duplication_ratio"] == 1.0 and si["batches"] == 2


def test_replay_dedup_read_and_compact(spark, tmp_path):
    """A replayed append inflates postings AND the stats delta
    consistently; un-dedup'd search scores are then wrong (duplicated
    rows double their contribution — the correctness cue), while
    search(dedup=True) answers exactly; compact() restores one-shot
    counts and clean search."""
    docs = _docs(spark)
    idx = InvertedIndex(str(tmp_path / "idx"))
    idx.build(docs.filter(F.col("doc_id") < 400), "doc_id", "text")
    batch = docs.filter(F.col("doc_id") >= 400)
    idx.append(batch, "doc_id", "text")
    clean = _ranked(idx.search(spark, TERMS, k=10))
    clean_stats = idx.stats(spark)
    assert clean_stats["duplication_ratio"] == 1.0

    idx.append(batch, "doc_id", "text")  # at-least-once replay
    st = idx.stats(spark)
    assert st["duplication_ratio"] > 1.0
    # consistency: the replayed delta inflates n_docs together with
    # the postings (identical batch_key row appended twice)
    assert st["batches"] == 3
    # dedup-on-read collapses BOTH the posting rows and the replayed
    # stats delta (identical batch_key), so it reproduces the clean
    # index's ranking AND scores exactly (ADVICE r10 #1)
    assert _ranked(idx.search(spark, TERMS, k=10, dedup=True)) == clean
    idx.compact(spark)
    st2 = idx.stats(spark)
    assert st2["duplication_ratio"] == 1.0
    assert st2["n_docs"] == clean_stats["n_docs"]
    assert st2["avgdl"] == clean_stats["avgdl"]
    assert _ranked(idx.search(spark, TERMS, k=10)) == clean


def test_fragmentation_signal_fires_without_replay(spark, tmp_path):
    """VERDICT r10 #4: many CLEAN appends (zero replay —
    duplication_ratio stays 1.0) must still surface as fragmentation:
    stats() reports per-term file spread, the maintenance log WARNs
    past COMPACT_FILES_PER_TERM naming compact() as the remedy, and
    compact() actually restores a tight file set."""
    import logging

    from covid19i2b2_spark.streaming.maintenance import log_index_health

    docs = _docs(spark)
    idx = InvertedIndex(str(tmp_path / "frag"))
    # 6 disjoint batches -> 6 append file sets; the corpus vocabulary
    # is common enough that frequent terms land in every batch
    idx.build(docs.filter(F.col("doc_id") % 6 == 0), "doc_id", "text")
    for m in range(1, 6):
        idx.append(docs.filter(F.col("doc_id") % 6 == m), "doc_id", "text")
    st = idx.stats(spark)
    assert st["duplication_ratio"] == 1.0          # no replay anywhere
    assert st["files_per_term_max"] > InvertedIndex.COMPACT_FILES_PER_TERM
    assert st["posting_files"] >= 6
    assert st["files_per_term_avg"] >= 1.0

    logger = logging.getLogger("covid19i2b2_spark.streaming.maintenance")
    records: list = []

    class _Cap(logging.Handler):
        def emit(self, r):
            records.append(r)

    h = _Cap()
    logger.addHandler(h)
    try:
        out = log_index_health(idx, spark, epoch_id=0, stats_every=1,
                               loop="frag-test")
    finally:
        logger.removeHandler(h)
    assert out is not None
    warns = [r.getMessage() for r in records
             if r.levelno == logging.WARNING]
    assert any("fragmentation-bound" in w and "compact()" in w
               for w in warns), warns

    idx.compact(spark)
    st2 = idx.stats(spark)
    assert st2["files_per_term_max"] <= InvertedIndex.COMPACT_FILES_PER_TERM
    assert st2["duplication_ratio"] == 1.0


def test_probe_reads_only_query_term_postings(spark, tmp_path):
    """The IN-filter must reach the postings scan (PushedFilters: In on
    term) over the term-sorted layout — the O(query postings) probe."""
    docs = _docs(spark)
    idx = InvertedIndex(str(tmp_path / "idx"))
    idx.build(docs, "doc_id", "text")
    plan = idx.search(spark, TERMS, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan, plan


def test_search_deterministic_across_partitionings(spark, tmp_path):
    docs = _docs(spark)
    a_idx = InvertedIndex(str(tmp_path / "a"))
    a_idx.build(docs.repartition(13), "doc_id", "text")
    b_idx = InvertedIndex(str(tmp_path / "b"))
    b_idx.build(docs.repartition(3), "doc_id", "text")
    assert _ranked(a_idx.search(spark, TERMS, k=20)) == _ranked(
        b_idx.search(spark, TERMS, k=20)
    )


def test_empty_build_and_id_type_identity(spark, tmp_path):
    """An empty-seed build must read back (stats/search over zero
    postings); appending a different doc-id TYPE than the index holds
    raises loudly instead of corrupting the postings schema."""
    idx = InvertedIndex(str(tmp_path / "idx"))
    idx.build(
        spark.createDataFrame([], "doc_id long, text string"),
        "doc_id", "text",
    )
    st = idx.stats(spark)
    assert st["n_docs"] == 0 and st["posting_rows"] == 0
    assert idx.search(spark, ["anything"], k=3).collect() == []
    idx.append(
        spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string"),
        "doc_id", "text",
    )
    assert idx.search(spark, ["alpha"], k=3).count() == 1
    with pytest.raises(ValueError, match="index identity"):
        idx.append(
            spark.createDataFrame(
                [("x", "gamma")], "doc_id string, text string"
            ),
            "doc_id", "text",
        )


def test_phrase_search_counts_overlapping_occurrences(spark, tmp_path):
    """Planted phrases: consecutive-run overlap counted ('b b b' holds
    'b b' twice), repeated-term phrases fold correctly, docs missing
    any term drop, 3-term phrases chain, absent terms give empty,
    single-term phrase is loud."""
    rows = [
        (1, "a b c d"),            # 'b c' once; 'b c d' once
        (2, "b b b"),              # 'b b' twice (overlap)
        (3, "b c b c"),            # 'b c' twice
        (4, "c b"),                # reversed: no 'b c'
        (5, "x y z"),
    ]
    idx = InvertedIndex(str(tmp_path / "idx"))
    idx.build(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id", "text",
    )

    def hits(terms):
        return {
            r["doc_id"]: r["n_occurrences"]
            for r in idx.phrase_search(spark, terms, k=10).collect()
        }

    assert hits(["b", "c"]) == {1: 1, 3: 2}
    assert hits(["b", "b"]) == {2: 2}
    assert hits(["b", "c", "d"]) == {1: 1}
    assert hits(["b", "q"]) == {}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="2 terms"):
        idx.phrase_search(spark, ["b"])


def test_phrase_search_append_and_pushdown(spark, tmp_path):
    """Phrase search over an appended index equals the one-shot build,
    and the probe's IN-filter reaches the postings scan."""
    docs = _docs(spark)
    inc = InvertedIndex(str(tmp_path / "inc"))
    inc.build(docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text")
    inc.append(docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text")
    one = InvertedIndex(str(tmp_path / "one"))
    one.build(docs, "doc_id", "text")
    phrase = ["the", "fast"]
    a = sorted(map(tuple, inc.phrase_search(spark, phrase, k=50).collect()))
    b = sorted(map(tuple, one.phrase_search(spark, phrase, k=50).collect()))
    assert a == b
    plan = (
        inc.phrase_search(spark, phrase, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "In(term" in plan, plan
