"""X49: unigram language-model tokenizer — training + application
(SURVEY §2.11 extension; the subword-regularization family from Kudo
2018, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" — the SentencePiece unigram
mode).  Complements the BPE pair (operators/bpe.py X35/X36): BPE grows
a vocab bottom-up by merges; unigram starts from a large seed vocab and
PRUNES it down under an EM-fitted piece distribution, then tokenizes by
Viterbi (the max-likelihood segmentation).

Division of labor (round 9, VERDICT r8 #5 — the E-step is now
distributed by default):

- **Distributed (corpus- and dict-scale)**: ONE raw-text pass builds
  the word-frequency dict, ONE aggregate over that (vocabulary-sized)
  dict counts candidate substrings for the seed vocab
  (:func:`seed_piece_counts` — exploding substrings of DISTINCT words
  weighted by n_word, never of raw text), and — with
  ``em_impl='distributed'`` — every EM E-step runs as a mapInPandas
  job over the word dict with the vocab-sized logp broadcast: each
  word's forward-backward emits per-piece expected-count rows that a
  groupBy sums in exact decimal arithmetic (partitioning-independent).
  The word dict is therefore NOT driver-bounded; at 100 TB the text
  scan is the only corpus-scale stage and EM costs one dict-scale job
  per iteration.
- **Driver (vocabulary-scale)**: the M-step renormalization and the
  pruning schedule run over the vocab-sized logp only.  E-step is the
  full forward-backward over each word's segmentation lattice (soft
  counts, not Viterbi-hard).  Pruning drops the pieces with the
  smallest expected counts by a shrink factor per round until
  ``vocab_size`` is reached — the common reimplementation
  approximation of SentencePiece's alternative-segmentation loss
  (documented trade: the exact criterion re-segments with each piece
  deleted); single-character pieces are never pruned, so every train
  word stays segmentable.  ``em_impl='driver'`` keeps the original
  collected-dict EM (fewer jobs; ``driver_dict_max``-guarded, with
  ``top_words`` as the Zipf-head bound — the train_bpe shape).

Application (:func:`unigram_tokenize`) is per-word Viterbi — inherently
sequential per word, so it runs as an Arrow kernel with a per-batch
distinct-word memo (Zipf: each distinct word pays once per batch),
exactly the apply_bpe pattern.  Word segmentation and casing run IN
SPARK (tokens()/F.lower) for train/apply parity on Unicode edge cases
— see apply_bpe's note on \\xa0 and 'İ'.

Determinism end to end: seed selection ties break (count desc, piece
asc); EM is fixed-iteration floating-point over a sorted dict; Viterbi
ties prefer the LONGER last piece.  Same corpus -> same vocab -> same
tokens, any partitioning (pinned in tests).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.bpe import _word_freqs

_UNK_PENALTY = 10.0  # added below the vocab's min logprob for unseen chars


def seed_piece_counts(
    df: DataFrame,
    text_col: str,
    max_piece_len: int = 8,
    lowercase: bool = True,
) -> DataFrame:
    """(piece, n) corpus frequencies of every substring of length
    1..max_piece_len of every word — the unigram seed-vocab statistic,
    fully distributed.  The explode runs over the DISTINCT word dict
    weighted by word count (vocabulary-sized input), not over raw text;
    n counts every occurrence position, weighted by the word's corpus
    frequency.  SQL-expressible — DuckDB parity in
    tests/test_oracle_parity.py (q_unigram_seed)."""
    words = _word_freqs(df, text_col, lowercase)
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.transform(
                # substrings starting at i, lengths 1..min(max, L-i+1);
                # sequence(1, 0) would DESCEND — the least(...) floor
                # keeps the upper bound >= 1 for every i
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.length("word") - i + 1
                    ),
                ),
                lambda l: F.substring(F.col("word"), i, l),
            ),
        )
    )
    return (
        words.select("n_word", F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n_word").alias("n"))
    )


def _lattice_pieces(word, logp, max_len):
    """Per end-position lists of (start, piece-logprob) arcs into the
    word's segmentation lattice — shared by forward-backward and
    Viterbi."""
    n = len(word)
    arcs: list[list[tuple[int, float]]] = [[] for _ in range(n + 1)]
    for j in range(1, n + 1):
        for l in range(1, min(max_len, j) + 1):
            lp = logp.get(word[j - l : j])
            if lp is not None:
                arcs[j].append((j - l, lp))
    return arcs


def _logsumexp(xs: list[float]) -> float:
    m = max(xs)
    if m == -math.inf:
        return m
    return m + math.log(sum(math.exp(x - m) for x in xs))


def _word_expected_counts(
    word: str,
    n: int,
    logp: dict[str, float],
    max_len: int,
    counts: dict[str, float],
) -> float | None:
    """Forward-backward over ONE word's segmentation lattice: soft
    expected piece counts accumulate into ``counts``; returns the
    word's likelihood contribution n * log Z, or None when the word is
    unsegmentable under this vocab (can't happen while single chars
    are retained; the guard keeps a pruned-to-death vocab from
    poisoning the M-step with NaNs).  Shared by the driver and
    distributed E-steps so the two paths run identical per-word
    arithmetic."""
    L = len(word)
    arcs = _lattice_pieces(word, logp, max_len)
    alpha = [-math.inf] * (L + 1)
    alpha[0] = 0.0
    for j in range(1, L + 1):
        terms = [alpha[i] + lp for i, lp in arcs[j]]
        if terms:
            alpha[j] = _logsumexp(terms)
    if alpha[L] == -math.inf:
        return None
    beta = [-math.inf] * (L + 1)
    beta[L] = 0.0
    for j in range(L, 0, -1):
        for i, lp in arcs[j]:
            beta[i] = _logsumexp([beta[i], lp + beta[j]])
    z = alpha[L]
    for j in range(1, L + 1):
        for i, lp in arcs[j]:
            c = math.exp(alpha[i] + lp + beta[j] - z) * n
            # quantize each contribution to the 1e-12 grid the
            # distributed E-step sums on (decimal(38,12)): both paths
            # then flush the SAME sub-resolution soft counts to zero —
            # without this, a count like 1e-182 keeps a piece alive on
            # the driver path but lands it at the unused floor on the
            # distributed one, and the two trainers diverge
            c = math.floor(c * 1e12 + 0.5) / 1e12
            if c > 0.0:
                piece = word[i:j]
                counts[piece] = counts.get(piece, 0.0) + c
    return n * z


def _m_step(
    counts: dict[str, float],
    total: float,
    logp: dict[str, float],
) -> dict[str, float]:
    """Renormalize expected counts into logprobs; pieces the E-step
    never used keep a floor so they remain in the vocab until pruning
    decides (dropping them here would make the shrink schedule depend
    on float underflow)."""
    new_logp = {
        p: math.log(c) - math.log(total)
        for p, c in counts.items()
        if c > 0.0
    }
    floor = (min(new_logp.values()) if new_logp else 0.0) - _UNK_PENALTY
    for p in logp:
        new_logp.setdefault(p, floor)
    return new_logp


def _em_pass(
    wf: list[tuple[str, int]],
    logp: dict[str, float],
    max_len: int,
) -> tuple[dict[str, float], float]:
    """One full EM iteration over a COLLECTED word dict (the bounded
    driver path): forward-backward expected piece counts (E),
    renormalized logprobs (M).  Returns (new logp, corpus
    log-likelihood under the INPUT model) — the likelihood sequence is
    non-decreasing across iterations at fixed vocab (EM guarantee,
    pinned in tests)."""
    counts: dict[str, float] = {}
    total_ll = 0.0
    for word, n in wf:
        z = _word_expected_counts(word, n, logp, max_len, counts)
        if z is not None:
            total_ll += z
    total = sum(counts.values())
    return _m_step(counts, total, logp), total_ll


def _em_pass_distributed(
    words: DataFrame,
    logp: dict[str, float],
    max_len: int,
) -> tuple[dict[str, float], float]:
    """One EM iteration with the E-step DISTRIBUTED over the word-dict
    DataFrame (VERDICT r8 #5) — training is no longer capped by a
    driver-collected dict; only the VOCAB-sized (piece, count)
    aggregate ever reaches the driver, where the M-step renormalizes.

    Shape: mapInPandas over (word, n_word) with the vocab-sized logp
    broadcast; each word emits its per-piece expected-count rows plus
    one likelihood row — no intra-batch float accumulation, so every
    cross-word sum happens in the groupBy below as EXACT
    decimal(38,12) arithmetic over per-word float64 contributions
    (the two_level_fixed_sums determinism pattern): results are
    independent of partitioning and cluster layout, which is what
    makes same-corpus-same-vocab hold on a real cluster."""
    spark = words.sparkSession
    b_logp = spark.sparkContext.broadcast(logp)

    def _estep(batches):
        lp = b_logp.value
        for pdf in batches:
            pieces: list[str | None] = []
            cs: list[float] = []
            lls: list[float] = []
            for word, n in zip(pdf["word"], pdf["n_word"]):
                wc: dict[str, float] = {}
                z = _word_expected_counts(word, int(n), lp, max_len, wc)
                if z is None:
                    continue
                pieces.extend(wc.keys())
                cs.extend(wc.values())
                lls.extend([0.0] * len(wc))
                pieces.append(None)
                cs.append(0.0)
                lls.append(z)
            yield pd.DataFrame({"piece": pieces, "c": cs, "ll": lls})

    agg = (
        words.mapInPandas(_estep, "piece string, c double, ll double")
        .groupBy("piece")
        .agg(
            F.sum(F.col("c").cast("decimal(38,12)")).alias("c"),
            F.sum(F.col("ll").cast("decimal(38,12)")).alias("ll"),
        )
        .collect()
    )
    # destroy, not unpersist (review r9): the collect() above fully
    # consumed the pass, nothing recomputes against this broadcast —
    # unpersist would keep the driver copy alive per pass and a
    # training run makes dozens of vocab-sized broadcasts
    b_logp.destroy()
    counts: dict[str, float] = {}
    total_ll = 0.0
    for r in agg:
        if r["piece"] is None:
            total_ll = float(r["ll"])
        else:
            counts[r["piece"]] = float(r["c"])
    # total summed in sorted-piece order: collect() row order is not
    # deterministic, and a float sum must not depend on it
    total = 0.0
    for p in sorted(counts):
        total += counts[p]
    return _m_step(counts, total, logp), total_ll


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    shrink: float = 0.75,
    em_iters: int = 2,
    lowercase: bool = True,
    top_words: int | None = None,
    driver_dict_max: int = 1_000_000,
    em_impl: str = "distributed",
) -> list[tuple[str, float]]:
    """Learn a unigram tokenizer vocab: [(piece, logprob)] of size <=
    ``vocab_size`` (plus however many single chars the corpus needs),
    sorted (logprob desc, piece asc).

    Seed = the ``seed_factor * vocab_size`` most frequent substrings
    (count desc, piece asc) from the DISTRIBUTED
    :func:`seed_piece_counts`, unioned with every single character so
    coverage is total.  Then rounds of (``em_iters`` x EM, prune the
    lowest-expected-count multi-char pieces to ``shrink`` x current
    size) until the vocab fits.  See the module docstring for what is
    exact vs approximated relative to SentencePiece.

    ``em_impl='distributed'`` (default; VERDICT r8 #5) runs every EM
    E-step as a Spark job over the word-dict DataFrame — the driver
    holds only the vocab-sized logp, so training is NOT capped by
    ``driver_dict_max`` (``top_words`` remains available as the
    statistical Zipf-head trade, no longer a memory necessity).
    ``em_impl='driver'`` keeps the collected-dict path — fewer Spark
    jobs, right when the dict is known-small; it is the path
    ``driver_dict_max`` guards.  Both run identical per-word
    arithmetic (:func:`_word_expected_counts`); final vocabs agree to
    float-summation order (pinned in tests)."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not (0.0 < shrink < 1.0):
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if em_impl not in ("distributed", "driver"):
        raise ValueError(
            f"em_impl must be 'distributed' or 'driver' (got {em_impl!r})"
        )
    from covid19i2b2_spark.caching import release_local_checkpoint

    words = _word_freqs(df, text_col, lowercase)
    if top_words is not None:
        words = words.orderBy(F.col("n_word").desc(), "word").limit(top_words)
        words = words.localCheckpoint(eager=True)
    wf: list[tuple[str, int]] = []
    if em_impl == "driver":
        n_dict = words.count()
        if n_dict > driver_dict_max:
            raise ValueError(
                f"word dict has {n_dict} entries > driver_dict_max="
                f"{driver_dict_max}; pass top_words to bound it (the"
                f" SentencePiece-style trade: train on the Zipf head)"
                f" or use em_impl='distributed'"
            )
        wf = [
            (r["word"], r["n_word"])
            for r in words.orderBy("word").collect()
        ]
        if top_words is not None:
            # the bounded-dict checkpoint is fully consumed (the seed
            # scan below reads the RAW corpus, not `words`) — release
            # its executor storage now instead of waiting for GC
            release_local_checkpoint(words)
    elif top_words is None:
        # the distributed path reads `words` once per EM pass — pin the
        # (vocabulary-sized) dict so passes don't re-scan the corpus
        # and re-aggregate each time (released after the final pass)
        words = words.localCheckpoint(eager=True)
    seed_n = max(vocab_size * seed_factor, vocab_size)
    seeds = (
        seed_piece_counts(df, text_col, max_piece_len, lowercase)
        .orderBy(F.col("n").desc(), "piece")
        .limit(seed_n)
        .collect()
    )
    chars: set[str] = set()
    if em_impl == "driver":
        for w, _ in wf:
            chars.update(w)
    else:
        # alphabet from the distributed dict — one vocab-bounded job
        # ((?!^)(?=.) splits between every char without the trailing ''
        # a plain (?!^) leaves)
        chars = {
            r["ch"]
            for r in words.select(
                F.explode(F.split("word", r"(?!^)(?=.)")).alias("ch")
            )
            .distinct()
            .collect()
            if r["ch"]
        }
    total0 = sum(r["n"] for r in seeds) or 1
    logp: dict[str, float] = {
        r["piece"]: math.log(r["n"]) - math.log(total0) for r in seeds
    }
    floor0 = (min(logp.values()) if logp else 0.0) - _UNK_PENALTY
    for c in chars:
        logp.setdefault(c, floor0)

    def _one_pass(lp):
        if em_impl == "driver":
            return _em_pass(wf, lp, max_piece_len)
        return _em_pass_distributed(words, lp, max_piece_len)

    while True:
        for _ in range(em_iters):
            logp, _ = _one_pass(logp)
        # singles are NEVER pruned (coverage), and the seed may carry
        # single chars beyond the (possibly top_words-bounded) dict's
        # own alphabet — so the multi-piece budget derives from the
        # LIVE single count, and each round strictly shrinks n_multi
        # (min with n_multi-1) so the loop provably terminates even
        # when singles alone exceed vocab_size (target_multi == 0)
        n_single = sum(1 for p in logp if len(p) == 1)
        n_multi = len(logp) - n_single
        target_multi = max(0, vocab_size - n_single)
        if n_multi <= target_multi:
            break
        keep_multi = min(
            n_multi - 1, max(target_multi, int(n_multi * shrink))
        )
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
        logp = {p: lp for p, lp in multi[:keep_multi]} | {
            p: lp for p, lp in logp.items() if len(p) == 1
        }
    # final fit at the final vocab + deterministic ordering
    logp, _ = _one_pass(logp)
    if em_impl == "distributed":
        release_local_checkpoint(words)
    return sorted(logp.items(), key=lambda t: (-t[1], t[0]))


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int, unk_lp: float
) -> list[str]:
    """Max-likelihood segmentation; characters outside the vocab score
    ``unk_lp`` so unseen text still tokenizes (each such char becomes
    its own piece).  Ties prefer the longer last piece — deterministic
    and biased toward fewer tokens, the convention tokenizers use."""
    L = len(word)
    best = [(-math.inf, 0)] * (L + 1)
    best[0] = (0.0, 0)
    for j in range(1, L + 1):
        cand = []
        for l in range(1, min(max_len, j) + 1):
            lp = logp.get(word[j - l : j])
            if lp is None and l == 1:
                lp = unk_lp
            if lp is not None and best[j - l][0] != -math.inf:
                cand.append((best[j - l][0] + lp, l))
        if cand:
            best[j] = max(cand)  # score first, then LONGER l wins ties
    out: list[str] = []
    j = L
    while j > 0:
        _, l = best[j]
        out.append(word[j - l : j])
        j -= l
    out.reverse()
    return out


def unigram_tokenize(
    col: str | Column,
    vocab: list[tuple[str, float]],
    lowercase: bool = True,
) -> Column:
    """Tokenize text with a trained unigram vocab -> array<string>
    subword pieces (word boundaries preserved; pieces of a word
    concatenate back to the word — round trip pinned in tests).  Arrow
    kernel with a per-batch distinct-word Viterbi memo; word split and
    casing stay JVM-side for train/apply parity (see apply_bpe)."""
    from pyspark.sql.functions import pandas_udf

    from covid19i2b2_spark.operators.text import tokens

    logp = dict(vocab)
    max_len = max((len(p) for p in logp), default=1)
    unk_lp = (min(logp.values()) if logp else 0.0) - _UNK_PENALTY

    @pandas_udf("array<string>")
    def _encode(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc(ws):
            if ws is None:
                return None
            out: list[str] = []
            for w in ws:
                got = memo.get(w)
                if got is None:
                    got = viterbi_segment(w, logp, max_len, unk_lp)
                    memo[w] = got
                out.extend(got)
            return out

        return words.map(enc)

    c = col if isinstance(col, Column) else F.col(col)
    ws = tokens(c)
    if lowercase:
        ws = F.transform(ws, lambda t: F.lower(t))
    return _encode(ws)
