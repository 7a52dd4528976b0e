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


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 64,
    min_count: int = 2,
    lowercase: bool = True,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a corpus.

    One raw-text pass builds the word-frequency dict; every iteration
    after that touches only that dict (distinct words × current symbol
    arrays).  Per iteration: one pair-count aggregate + a 1-row collect
    (the argmax), then a map-only fold rewriting words that contain the
    winning pair.  localCheckpoint every ``checkpoint_every`` merges
    truncates the growing lineage (k-means precedent,
    semdedup.train_centroids).  Stops early when the best pair's count
    drops below ``min_count``."""
    words = _word_freqs(df, text_col, lowercase).select(
        "word",
        "n_word",
        # chars: split at every inter-char boundary — (?!^) alone also
        # matches end-of-string and yields a trailing '' symbol, hence
        # the (?=.) guard requiring a following char
        F.split("word", "(?!^)(?=.)").alias("syms"),
    )
    words = words.localCheckpoint()
    merges: list[tuple[str, str]] = []
    for t in range(n_merges):
        top = (
            words.select(
                "n_word", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy("p")
            .agg(F.sum("n_word").alias("n"))
            .orderBy(F.col("n").desc(), "p")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["p"].split(" ", 1)
        merges.append((a, b))
        words = words.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        if (t + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
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
