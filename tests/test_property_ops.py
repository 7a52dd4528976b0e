"""Property-based hardening (TODO.md round-2): sessionize gap boundaries
and range_join_binned bin-edge intervals, checked against brute-force
Python references over hypothesis-generated inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.joins import range_join, range_join_binned
from covid19i2b2_spark.operators.windows import sessionize

BASE = dt.datetime(2024, 1, 1)


def _ref_sessions(offsets_min: list[int], gap: int) -> list[int]:
    """Brute-force session ids for sorted minute offsets (1-based)."""
    out, sid = [], 0
    prev = None
    for o in sorted(offsets_min):
        if prev is None or o - prev > gap:
            sid += 1
        out.append(sid)
        prev = o
    return out


@settings(max_examples=8, deadline=None)
@given(
    offsets=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=25,
        unique=True,
    ),
    gap=st.integers(min_value=1, max_value=120),
)
def test_sessionize_matches_reference(spark, offsets, gap):
    """Gap-boundary semantics: a delta of EXACTLY gap minutes stays in the
    same session (> gap starts a new one) — pinned against a Python
    reference for arbitrary offset sets, including exact-boundary deltas
    hypothesis will generate."""
    rows = [
        (1, BASE + dt.timedelta(minutes=o), i) for i, o in enumerate(offsets)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = [
        r["session_id"]
        for r in sessionize(df, "user_id", "ts", gap_minutes=gap, tiebreak="event_id")
        .orderBy("ts")
        .collect()
    ]
    assert got == _ref_sessions(offsets, gap)


@settings(max_examples=6, deadline=None)
@given(
    data=st.data(),
    n_intervals=st.integers(min_value=1, max_value=12),
)
def test_range_join_binned_matches_plain(spark, data, n_intervals):
    """Bin-edge correctness: intervals that start/end exactly on month
    boundaries, span several bins, or collapse to a single day must join
    identically through the binned equi-join and the plain range join."""
    intervals = []
    for i in range(n_intervals):
        start_off = data.draw(st.integers(min_value=0, max_value=120), label="start")
        length = data.draw(
            st.sampled_from([0, 1, 27, 28, 30, 31, 62, 90]), label="len"
        )
        s = dt.date(2024, 1, 1) + dt.timedelta(days=start_off)
        intervals.append((i, s, s + dt.timedelta(days=length)))
    points = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=d),)
        # month boundaries + mid-month points across the covered span
        for d in [0, 30, 31, 59, 60, 90, 91, 120, 150, 181, 14, 45, 75, 105]
    ]
    idf = spark.createDataFrame(intervals, "iid long, s date, e date")
    pdf = spark.createDataFrame(points, "p date")
    plain = sorted(
        (r["p"], r["iid"])
        for r in range_join(pdf, idf, "p", "s", "e").select("p", "iid").collect()
    )
    binned = sorted(
        (r["p"], r["iid"])
        for r in range_join_binned(pdf, idf, "p", "s", "e")
        .select("p", "iid")
        .collect()
    )
    assert binned == plain


@settings(max_examples=15, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40,
        unique=True,
    ),
    fracs=st.lists(
        st.floats(min_value=0.05, max_value=0.5), min_size=1, max_size=4
    ),
)
def test_hash_split_partition_property(spark, keys, fracs):
    """hash_split is a PARTITION of the keyspace: every row gets exactly
    one label (or NULL for the remainder), labels never overlap, and the
    assignment is a pure function of (key, seed) — independent of row
    order and of which other rows are present."""
    from covid19i2b2_spark.operators.sampling import hash_split

    fractions = {f"s{i}": f for i, f in enumerate(fracs)}
    if sum(fractions.values()) > 1.0:
        return  # generator may overshoot; the ValueError path has its own test
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = {r.k: r.split for r in hash_split(df, "k", fractions).collect()}
    assert set(rows) == set(keys)  # exactly one row per key, one label each
    # subset-independence: the same keys in a different, smaller frame get
    # the same labels
    half = keys[: max(1, len(keys) // 2)]
    again = {
        r.k: r.split
        for r in hash_split(
            spark.createDataFrame([(k,) for k in half], "k long"), "k", fractions
        ).collect()
    }
    assert all(again[k] == rows[k] for k in half)


@settings(max_examples=10, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(
            codec="utf-8", categories=("L", "N", "P", "Zs", "Cc")
        ),
        max_size=400,
    )
)
def test_gopher_signals_bounds(spark, text):
    """Signal invariants over arbitrary text: counts non-negative, every
    ratio/fraction in [0, 1] (symbol_ratio can exceed 1 only when a word
    carries multiple symbols — allow [0, inf) but never negative/null)."""
    from covid19i2b2_spark.operators.quality import gopher_signals

    df = spark.createDataFrame([(text,)], "text string")
    r = df.select(gopher_signals("text").alias("s")).select("s.*").collect()[0]
    assert r.n_words >= 0 and r.stop_hits >= 0
    assert r.mean_word_len >= 0.0
    assert r.symbol_ratio >= 0.0
    assert 0.0 <= r.alpha_word_frac <= 1.0
    assert 0.0 <= r.bullet_line_frac <= 1.0
    assert 0.0 <= r.ellipsis_line_frac <= 1.0


def _ref_chunks(n: int, chunk: int, overlap: int) -> list[tuple[int, int]]:
    """Brute-force (start, length) chunk windows for an n-token doc."""
    stride = chunk - overlap
    bound = max(n - overlap, 1)
    out = []
    s = 1
    while s <= bound:
        out.append((s, min(chunk, n - s + 1)))
        s += stride
    return out


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=400),
    chunk=st.integers(min_value=2, max_value=64),
    overlap_frac=st.floats(min_value=0.0, max_value=0.95),
)
def test_chunk_documents_matches_reference(spark, n, chunk, overlap_frac):
    """Window invariants over generated sizes: chunk starts/lengths match
    the brute-force reference, every token is covered, and consecutive
    chunks overlap by exactly `overlap` tokens (except the tail)."""
    from covid19i2b2_spark.operators.chunking import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    text = " ".join(f"t{i}" for i in range(1, n + 1))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.start_token, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(
            df, "doc_id", "text", chunk_tokens=chunk, overlap_tokens=overlap
        ).collect()
    )
    ref = _ref_chunks(n, chunk, overlap)
    assert [(s, l) for s, l, _ in rows] == ref
    covered = set()
    for s, l, txt in rows:
        toks = txt.split(" ")
        assert toks == [f"t{i}" for i in range(s, s + l)]
        covered.update(range(s, s + l))
    assert covered == set(range(1, n + 1))


@settings(max_examples=6, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # shard
            st.integers(min_value=0, max_value=12),  # item id (small domain
        ),                                           # -> forced collisions)
        min_size=1,
        max_size=120,
    ),
    k=st.integers(min_value=1, max_value=6),
)
def test_topk_merge_invariants(spark, items, k):
    """SpaceSaving store invariants for ARBITRARY shardings and k:
    after build(shard grain) + merge(global), (a) every surviving item's
    [count_lo, count_hi] brackets its true count, (b) every item whose
    true count exceeds the merged bound survives, (c) n_rows is exact.
    Checked against a brute-force Counter reference."""
    from collections import Counter

    from covid19i2b2_spark.operators.sketches import (
        build_topk_sketches,
        merge_topk_sketches,
        topk_estimates,
    )

    df = spark.createDataFrame(
        [(s, f"i{v}") for s, v in items], "shard long, item string"
    )
    merged = merge_topk_sketches(
        build_topk_sketches(df, ["shard"], "item", k=k), [], k=k
    ).collect()
    assert len(merged) == 1
    bound, n_rows = merged[0]["bound"], merged[0]["n_rows"]
    true = Counter(f"i{v}" for _, v in items)
    assert n_rows == len(items)
    est = {
        r["item"]: (r["count_lo"], r["count_hi"])
        for r in topk_estimates(
            spark.createDataFrame(merged, schema=None)
        ).collect()
    }
    for it, (lo, hi) in est.items():
        assert lo <= true[it] <= hi, (it, lo, true[it], hi)
    for it, n in true.items():
        if n > bound:
            assert it in est, (it, n, bound)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=5),  # tiny alphabet ->
            min_size=0,                             # natural shared runs
            max_size=18,
        ),
        min_size=2,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=4),
)
def test_remove_duplicate_spans_matches_reference(spark, docs, k):
    """Span removal vs a brute-force reference for arbitrary corpora:
    a position is removed iff some k-window covering it occurs in >= 2
    distinct docs; survivors rebuild in order."""
    from covid19i2b2_spark.operators.passages import remove_duplicate_spans

    texts = [" ".join(f"w{c}" for c in d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_deduped"], r["n_removed_tokens"])
        for r in remove_duplicate_spans(
            df, "doc_id", "text", k=k, min_docs=2
        ).collect()
    }
    # reference: window -> set of docs; covered positions per doc
    win_docs: dict = {}
    for i, d in enumerate(docs):
        for s in range(len(d) - k + 1):
            win_docs.setdefault(tuple(d[s : s + k]), set()).add(i)
    for i, d in enumerate(docs):
        covered = set()
        for s in range(len(d) - k + 1):
            if len(win_docs[tuple(d[s : s + k])]) >= 2:
                covered.update(range(s, s + k))
        kept = [f"w{c}" for p, c in enumerate(d) if p not in covered]
        assert got[i] == (" ".join(kept), len(covered)), (i, d)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),     # score
            st.integers(min_value=0, max_value=40),      # tokens
        ),
        min_size=0,
        max_size=60,
    ),
    budget=st.integers(min_value=0, max_value=400),
    frac_pct=st.integers(min_value=1, max_value=100),
)
def test_global_selection_matches_reference(
    spark, rows, budget, frac_pct
):
    """Property (round 5): the global (ungrouped) range-partition prefix
    plans of select_to_token_budget and filter_top_fraction must equal
    the brute-force Python reference for arbitrary score/token
    multisets, budgets, and fractions — including all-ties, zero-token
    rows, and empty inputs."""
    import math

    from covid19i2b2_spark.operators.sampling import (
        filter_top_fraction,
        select_to_token_budget,
    )

    data = [(i, float(s), t) for i, (s, t) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "key long, score double, toks long"
    ).repartition(5)
    order = sorted(data, key=lambda r: (-r[1], r[0]))

    # budget prefix
    want, cum = set(), 0
    for k, _, t in order:
        if cum + t <= budget:
            want.add(k)
            cum += t
        else:
            break
    got = {
        r["key"]
        for r in select_to_token_budget(
            df, "key", "score", "toks", budget=budget
        ).collect()
    }
    assert got == want

    # top-fraction prefix
    frac = frac_pct / 100.0
    n_keep = math.ceil(len(data) * frac)
    want_top = {k for k, _, _ in order[:n_keep]}
    got_top = {
        r["key"]
        for r in filter_top_fraction(df, "key", "score", frac).collect()
    }
    assert got_top == want_top


@settings(max_examples=30, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=400,
        unique=True,
    ),
    probes=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0,
        max_size=400,
    ),
    fpp=st.sampled_from([0.01, 0.05, 0.2]),
)
def test_bloom_bitmap_math_no_false_negatives(keys, probes, fpp):
    """X46 membership math, adversarial inputs (pure numpy — the Spark
    plumbing is pinned in tests/test_bloom.py): every inserted 64-bit
    hash probes True under any (size, fpp); sizing formulas hold."""
    import math as _math

    import numpy as np

    from covid19i2b2_spark.operators.bloom import _positions, bloom_params

    n_bits, k = bloom_params(len(keys), fpp)
    assert n_bits % 8 == 0 and k >= 1
    # bits/key tracks the optimum -ln(fpp)/ln^2(2) (within rounding)
    assert n_bits >= -len(keys) * _math.log(fpp) / (_math.log(2) ** 2) - 8

    h = np.array(keys, dtype=np.int64)
    bm = np.zeros(n_bits // 8, dtype=np.uint8)
    pos = _positions(h, k, n_bits).ravel()
    assert pos.min() >= 0 and pos.max() < n_bits
    np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    p = _positions(h, k, n_bits)
    hit = (bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1
    assert bool(hit.all(axis=0).all())  # no false negatives, ever

    nonmembers = np.array(
        [x for x in probes if x not in set(keys)], dtype=np.int64
    )
    if nonmembers.size >= 200:
        q = _positions(nonmembers, k, n_bits)
        fp = int(((bm[q >> 3] >> (q & 7).astype(np.uint8)) & 1).all(axis=0).sum())
        # statistical band sized so legitimate draws essentially never
        # breach it (review r7: a fixed 5x multiplier failed ~1.4% of
        # small-n fpp=0.01 examples, and hypothesis REPLAYS a stored
        # failing example forever): fpp + 6 binomial sigmas
        import math as _m

        bound = fpp + 6 * _m.sqrt(fpp * (1 - fpp) / nonmembers.size)
        assert fp / nonmembers.size <= bound, (fp, nonmembers.size, fpp)


def _ref_fuzzy_pairs(strings: list[str], max_dist: int):
    """Brute-force Levenshtein pairs (classic DP), the Python reference."""

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            d = lev(strings[i], strings[j])
            if d <= max_dist:
                out.add((i, j, d))
    return out


@settings(max_examples=5, deadline=None)
@given(
    strings=st.lists(
        st.text(
            # tight alphabet on purpose: maximizes near-miss pairs and
            # shared-gram collisions; includes the padding char '\x01'
            # (fuzzy.py frames grams with it — data containing it must
            # still be correct) and a non-ASCII char
            alphabet=st.sampled_from(list("ab1\x01é")),
            min_size=0,
            max_size=8,
        ),
        min_size=2,
        max_size=14,
        unique=True,
    ),
    max_dist=st.integers(min_value=1, max_value=3),
    k=st.integers(min_value=2, max_value=3),
    order=st.sampled_from(["hash", "rare"]),
)
def test_fuzzy_pairs_completeness_property(spark, strings, max_dist, k, order):
    """X48 blocking completeness over hypothesis-adversarial strings
    (boundary lengths around every cutoff, padding-char collisions,
    empty strings, unicode) for BOTH gram orders: the q-gram prefix
    blocks + short pool must find exactly the brute-force pair set."""
    from covid19i2b2_spark.operators.fuzzy import fuzzy_pairs

    df = spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(
            df, "id", "s", max_dist=max_dist, k=k, gram_order=order
        ).collect()
    }
    assert got == _ref_fuzzy_pairs(strings, max_dist)


@settings(max_examples=4, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.integers(min_value=0, max_value=6),  # tiny alphabet ->
            min_size=0,                             # overlapping postings
            max_size=15,
        ),
        min_size=1,
        max_size=6,
    ),
    terms=st.lists(
        st.integers(min_value=0, max_value=6), min_size=1, max_size=3,
        unique=True,
    ),
)
def test_inverted_index_matches_brute_bm25(spark, docs, terms, tmp_path_factory):
    """X54 search vs a pure-python BM25 reference for arbitrary tiny
    corpora: postings, df, idf, dl normalization and the top-k ordering
    (score desc, doc_id) must agree at round6 — including docs with no
    matching term (absent from search output), empty docs (count
    toward N/avgdl only), and query terms absent from the corpus."""
    import math

    from covid19i2b2_spark.operators.inverted_index import InvertedIndex

    texts = [" ".join(f"w{c}" for c in d) for d in docs]
    df_in = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    idx = InvertedIndex(str(tmp_path_factory.mktemp("inv")))
    idx.build(df_in, "doc_id", "text")
    got = [
        (r["doc_id"], r["bm25"])
        for r in idx.search(
            spark, [f"w{t}" for t in terms], k=len(docs)
        ).collect()
    ]
    # reference
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    k1, b = 1.2, 0.75
    ref = []
    for i, d in enumerate(docs):
        score = 0.0
        hit = False
        for t in sorted(terms):  # the fold sums in sorted term order
            tf = sum(1 for c in d if c == t)
            if tf == 0:
                continue
            hit = True
            dfreq = sum(1 for dd in docs if t in dd)
            idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
            score += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(d) / avgdl)
            )
        if hit:
            ref.append((i, math.floor(score * 1e6 + 0.5) / 1e6))
    ref.sort(key=lambda x: (-x[1], x[0]))
    assert [g[0] for g in got] == [r[0] for r in ref]
    for (_, gs), (_, rs) in zip(got, ref):
        assert abs(gs - rs) <= 2e-6, (gs, rs)
