"""Document-quality rule filtering and vocabulary building (SURVEY §2.11
north-star extension — the pre-tokenization passes of a training-data
pipeline).

``gopher_signals`` implements the published Gopher corpus-filtering rules
(Rae et al. 2021, "Scaling Language Models: ... Gopher", appendix A1.1):
word-count band, mean-word-length band, symbol-to-word ratio, bullet- and
ellipsis-line fractions, alphabetic-word fraction, and a must-have
stopword count.  ``build_vocab`` is the distributed top-N token
vocabulary (the input to tokenizer training).

Scale shape: the signals are pure JVM column expressions over one
projected token/line array each — a map-only pass, no shuffle, no UDF.
The vocab builder is one explode + one map-side-combined groupBy over the
token key space + a top-N — the minimal plan for an exact global count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import _c, tokens

# Gopher A1.1 must-have stopwords: a doc passing quality has at least
# MIN_STOP_HITS distinct of these (weeds out non-prose token streams).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
MIN_STOP_HITS = 2

_BULLETS = ("- ", "* ", "• ")


def gopher_signals(col: str | Column) -> Column:
    """Struct of the Gopher rule signals for one document:

    (n_words, mean_word_len, symbol_ratio, alpha_word_frac,
     bullet_line_frac, ellipsis_line_frac, stop_hits)

    All ratios round6'd so both engines agree bit-for-bit."""
    c = _c(col)
    toks = tokens(c)
    n = F.size(toks)
    nd = n.cast("double")
    mean_len = F.when(n == 0, F.lit(0.0)).otherwise(
        round6(
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / nd
        )
    )
    # '#' occurrences + '...' occurrences, per word
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / 3
    symbol_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        round6((n_hash + n_ellipsis).cast("double") / nd)
    )
    alpha_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        round6(
            F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
            / nd
        )
    )
    lines = F.filter(F.split(c, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    bullet = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        round6(
            F.size(
                F.filter(
                    lines,
                    lambda ln: F.lit(False)
                    | F.trim(ln).startswith(_BULLETS[0])
                    | F.trim(ln).startswith(_BULLETS[1])
                    | F.trim(ln).startswith(_BULLETS[2]),
                )
            ).cast("double")
            / n_lines.cast("double")
        )
    )
    ellipsis_line = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        round6(
            F.size(
                F.filter(lines, lambda ln: F.trim(ln).endswith("..."))
            ).cast("double")
            / n_lines.cast("double")
        )
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(toks, lambda t: F.lower(t)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    return F.struct(
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        bullet.alias("bullet_line_frac"),
        ellipsis_line.alias("ellipsis_line_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )


def gopher_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_stop_hits: int = MIN_STOP_HITS,
) -> DataFrame:
    """Per-document Gopher rule report: the signals flattened to atomic
    columns plus ``passes`` (all rules hold).  Callers filter on
    ``passes``; keeping the full report makes rejection auditable (which
    rule fired), the operational requirement for corpus curation."""
    sig = gopher_signals(text_col)
    out = df.select(F.col(id_col), sig.alias("__s")).select(
        id_col,
        "__s.n_words",
        "__s.mean_word_len",
        "__s.symbol_ratio",
        "__s.alpha_word_frac",
        "__s.bullet_line_frac",
        "__s.ellipsis_line_frac",
        "__s.stop_hits",
    )
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") < max_symbol_ratio)
        & (F.col("alpha_word_frac") > min_alpha_word_frac)
        & (F.col("bullet_line_frac") < max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") < max_ellipsis_line_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("passes", passes)


def domain_of(col: str | Column) -> Column:
    """Registered-host extraction from a URL-or-hostname column: strips
    scheme, path/query, port, and a leading ``www.`` — the grouping key
    for per-domain corpus stats and blocklist joins.  Pure regexp,
    map-only."""
    c = _c(col)
    host = F.regexp_extract(c, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/:?#]+)", 1)
    return F.lower(F.regexp_replace(host, r"^www\.", ""))


def blocklist_filter(
    df: DataFrame,
    value_col: str | Column,
    blocked: DataFrame,
    blocked_col: str = "value",
) -> DataFrame:
    """Drop rows whose ``value_col`` (e.g. the extracted domain) appears
    in the blocklist.  LEFT ANTI equi-join; blocklists are small by
    invariant (curated lists, not corpora) so the explicit broadcast is
    size-safe — the corpus side never shuffles."""
    v = _c(value_col)
    return df.join(
        F.broadcast(blocked.select(F.col(blocked_col).alias("__blocked"))),
        v == F.col("__blocked"),
        "left_anti",
    )


def build_vocab(
    df: DataFrame, text_col: str, top_n: int = 1000, lowercase: bool = True
) -> DataFrame:
    """Exact top-N token vocabulary with global counts and a deterministic
    rank (count desc, token asc) — the tokenizer-training input.

    Plan: one explode, one groupBy(token) with map-side partial counts
    (key space = vocabulary, not corpus), then a top-N via
    TakeOrderedAndProject — no global sort of the full vocabulary.  At
    100 TB the only shuffle is token-keyed counts; AQE splits skewed
    head words."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), "token").limit(top_n)
    # rank over the already-limited top-N: single tiny partition by design
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), "token")
    return top.select(
        "token", "n", F.row_number().over(w).cast("long").alias("rank")
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, top_n: int = 200, lowercase: bool = True
) -> DataFrame:
    """Adjacent symbol-pair frequencies over the word-frequency dict —
    the statistic BPE tokenizer training merges on each iteration
    (Sennrich et al. 2016 operate on exactly this count table).

    Plan: words aggregate to (word, n_docs_weighted_count) FIRST — the
    pair extraction then runs over the DISTINCT word list (vocabulary-
    sized, not corpus-sized), each word contributing its in-word pairs
    weighted by its corpus frequency.  One token shuffle + one tiny
    pair shuffle; at 100 TB the char-pair expansion never touches raw
    text again."""
    toks = tokens(F.col(text_col))
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    words = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_word"))
    )
    # guard single-char words: sequence(1, 0) would generate a DESCENDING
    # [1, 0] in Spark, not an empty array
    in_word_pairs = F.when(
        F.length("word") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length("word") - 1),
            lambda i: F.col("word").substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pairs = words.select("n_word", F.explode(in_word_pairs).alias("pair"))
    counts = pairs.groupBy("pair").agg(F.sum("n_word").alias("n"))
    top = counts.orderBy(F.col("n").desc(), "pair").limit(top_n)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n").desc(), "pair")
    return top.select(
        "pair", "n", F.row_number().over(w).cast("long").alias("rank")
    )


# -- model-based quality scoring (fasttext-style linear classifier) ------

_CLF_POLY_B = 1009
_CLF_POLY_P = 9_007_199_254_740_881  # largest prime < 2^53


def _poly_token_bucket(tok: Column, n_buckets: int) -> Column:
    """Hashing-trick bucket of one token: base-1009 codepoint polynomial
    mod a sub-2^53 prime, reduced mod n_buckets.  Engine-independent
    (unicode()/ascii() + integer math), so classifier scores reproduce
    bit-for-bit in an ANSI-SQL oracle — unlike xxhash64.  acc*1009 + c
    stays under 2^63 for acc < 2^53: ANSI-mode safe."""
    cps = F.transform(
        F.sequence(F.lit(1), F.length(tok)),
        lambda i: F.ascii(F.substring(tok, i, F.lit(1))).cast("long"),
    )
    hp = F.aggregate(
        cps,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _CLF_POLY_B + c) % _CLF_POLY_P,
    )
    return F.pmod(hp, F.lit(n_buckets))


def linear_text_classifier(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Model-based quality scoring (the CCNet / GPT-3 / DCLM filtering
    stage): a linear classifier over hashed bag-of-tokens features —
    P(keep) = sigmoid(bias + mean_t weights[bucket(t)]) — with the
    weight vector broadcast as a literal array.

    This is INFERENCE plumbing: ``weights`` comes from any upstream
    trainer (a logistic regression over labeled docs; see the planted
    test, which trains one in numpy).  The mean (not sum) keeps scores
    length-invariant, like fasttext's averaged bag of words.

    Scale shape: one map-only projection — token split, per-token
    bucket, weight lookup and the sigmoid are all array expressions
    inside whole-stage codegen; no explode, no shuffle, no UDF, and the
    model rides along as a plan literal (no join against a weight
    table).  Documents with zero tokens get NULL (no evidence).
    """
    n_buckets = len(weights)
    if n_buckets == 0:
        raise ValueError("weights must be non-empty")
    warr = F.array(*[F.lit(float(w)) for w in weights])
    toks = tokens(F.col(text_col))
    picked = F.transform(
        toks,
        lambda t: F.element_at(warr, (_poly_token_bucket(t, n_buckets) + 1).cast("int")),
    )
    n = F.size(toks)
    mean_w = F.aggregate(
        picked, F.lit(0.0), lambda acc, x: acc + x
    ) / n.cast("double")
    z = F.lit(float(bias)) + mean_w
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(
        out_col, F.when(n > 0, round6(prob)).otherwise(F.lit(None))
    )


def classifier_filter(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    bias: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """Keep documents the linear classifier scores >= threshold (NULL
    scores — tokenless docs — are dropped, like every quality gate
    here)."""
    scored = linear_text_classifier(df, text_col, weights, bias, "__prob")
    return scored.filter(F.col("__prob") >= threshold).drop("__prob")


def keep_top_fraction(
    df: DataFrame,
    domain_col: str,
    score_col: str,
    fraction: float,
    approx: bool = False,
) -> DataFrame:
    """Keep the best ``fraction`` of each domain by score (the
    'top X% per language by classifier score' curation step), WITHOUT a
    per-domain sort: one tiny per-domain percentile aggregate (exact by
    default; ``approx=True`` switches to percentile_approx for the
    100 TB path), broadcast back, then a map-only threshold filter.

    A full-sort percent_rank would shuffle every row into per-domain
    sort order and serialize on skewed domains; the threshold shape
    moves only one number per domain.  Ties AT the threshold are kept
    (deterministic: membership depends on values, not row order), so
    heavily-tied score distributions may keep slightly more than
    ``fraction``.  For COUNT-exact ceil(frac*n) semantics (ties cut by
    key order, SQL-oracle-reproducible) or the mergeable DDSketch
    threshold path, use sampling.filter_top_fraction — same job,
    different contracts."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1] (got {fraction})")
    if fraction == 1.0:
        return df
    q = 1.0 - fraction
    agg = (
        F.percentile_approx(F.col(score_col), F.lit(q), F.lit(10_000))
        if approx
        else F.percentile(F.col(score_col), F.lit(q))
    )
    th = df.groupBy(domain_col).agg(agg.alias("__th"))
    return (
        df.join(F.broadcast(th), domain_col)
        .filter(F.col(score_col) >= F.col("__th"))
        .drop("__th")
    )


def unigram_logprob_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n_vocab: int = 1000,
    out_col: str = "unigram_logprob",
    lm_corpus: DataFrame | None = None,
) -> DataFrame:
    """Statistical language-model quality scoring (the CCNet-style
    perplexity filter, unigram form): per document, the mean add-one-
    smoothed log-probability of its tokens under the corpus unigram
    distribution — fluent prose made of common words scores high,
    gibberish and rare-token streams score low (more negative).

    P(t) = (count(t) + 1) / (N + V) with counts from the top-N vocab
    (everything below the cut is one OOV bucket with count 0), N = total
    corpus token count, V = top_n_vocab + 1.

    ``lm_corpus`` (round 10, the DSIR building block): fit the LM on a
    DIFFERENT corpus than the one being scored — vocab and N come from
    ``lm_corpus`` while every row of ``df`` gets a score.  Default None
    keeps the self-scored CCNet form (LM fit on df itself).

    Scale shape: the vocab is the already-bounded top-N table
    (build_vocab — one explode + one token-keyed aggregate), broadcast
    into the per-token left join; N comes from the same pass's corpus
    count.  Tokenless documents keep their row with NULL (no evidence),
    like linear_text_classifier."""
    lm = lm_corpus if lm_corpus is not None else df
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    vocab = build_vocab(lm, text_col, top_n=top_n_vocab, lowercase=False)
    # one scalar: total LM-corpus tokens
    n_total = lm.select(F.explode(tokens(F.col(text_col)))).count()
    v = top_n_vocab + 1
    logp = F.log(
        (F.coalesce(F.col("n"), F.lit(0)) + 1).cast("double")
        / F.lit(float(n_total + v))
    )
    # fixed-point picounit sum (the _fixdot/dmean pattern): double sums
    # are association-order-dependent across partitions, so the mean is
    # taken over floor(logp*1e12+0.5) BIGINTs — order-independent, and
    # bit-identical in the DuckDB oracle.  |logp|*1e12 * tokens-per-doc
    # stays far under 2^63.
    lp_fix = F.floor(logp * F.lit(1e12) + F.lit(0.5)).cast("long")
    per_doc = (
        toks.join(F.broadcast(vocab.select("token", "n")), "token", "left")
        .groupBy(id_col)
        .agg(
            round6(
                F.sum(lp_fix).cast("double")
                / F.count("*")
                / F.lit(1e12)
            ).alias(out_col)
        )
    )
    return df.join(per_doc, id_col, "left").select(
        df["*"], F.col(out_col)
    )


def bigram_logprob_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n_vocab: int = 1000,
    top_n_bigrams: int = 5000,
    out_col: str = "bigram_logprob",
) -> DataFrame:
    """Bigram form of :func:`unigram_logprob_score` — the next rung of
    the CCNet-style perplexity ladder: per document, the mean add-one-
    smoothed conditional log-probability of its adjacent token pairs,

        P(b | a) = (c(a,b) + 1) / (c(a) + V),   V = top_n_vocab + 1,

    with c(a,b) from the bounded top-N bigram table and c(a) from the
    top-N vocab (below-cut contexts/pairs count 0).  Fluent word ORDER
    now matters: shuffled common words score like gibberish, which the
    unigram filter cannot see.

    Scale shape: bigram extraction is map-only (an in-array zip — no
    self-join, no window shuffle); both model tables are bounded top-Ns
    broadcast into per-pair left joins; the per-doc mean uses the same
    order-independent fixed-point picounit sums as the unigram scorer.
    Documents with < 2 tokens keep their row with NULL."""
    toks_arr = tokens(F.col(text_col))
    big_arr = F.when(
        F.size(toks_arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks_arr) - 1),
            lambda i: F.struct(
                F.element_at(toks_arr, i).alias("a"),
                F.element_at(toks_arr, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    pairs = df.select(F.col(id_col), F.explode(big_arr).alias("bg")).select(
        id_col, F.col("bg.a").alias("a"), F.col("bg.b").alias("b")
    )
    bigram_counts = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .orderBy(F.col("n_ab").desc(), "a", "b")
        .limit(top_n_bigrams)
    )
    vocab = build_vocab(df, text_col, top_n=top_n_vocab, lowercase=False)
    v = top_n_vocab + 1
    logp = F.log(
        (F.coalesce(F.col("n_ab"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("n"), F.lit(0)) + F.lit(v)).cast("double")
    )
    lp_fix = F.floor(logp * F.lit(1e12) + F.lit(0.5)).cast("long")
    per_doc = (
        pairs.join(F.broadcast(bigram_counts), ["a", "b"], "left")
        .join(
            F.broadcast(
                vocab.select(F.col("token").alias("a"), "n")
            ),
            "a",
            "left",
        )
        .groupBy(id_col)
        .agg(
            round6(
                F.sum(lp_fix).cast("double") / F.count("*") / F.lit(1e12)
            ).alias(out_col)
        )
    )
    return df.join(per_doc, id_col, "left").select(df["*"], F.col(out_col))


def train_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int = 512,
    iters: int = 400,
    lr: float = 0.5,
    max_labeled: int = 1_000_000,
) -> tuple[list[float], float]:
    """Train the weights for :func:`linear_text_classifier` from a
    LABELED document sample (label 1 = keep, 0 = drop) — closing the
    train→infer loop inside the engine with ONE hash function: features
    here use the same polynomial bucket the inference operator applies,
    so the returned (weights, bias) plug straight into
    ``linear_text_classifier`` / ``classifier_filter`` / the curation
    config.

    Scale shape: feature extraction is distributed (explode → bucket →
    one groupBy on (doc, bucket), emitting mean-normalized counts —
    exactly the inference-side feature); only the SPARSE feature triples
    of the labeled sample are collected for the driver-side logistic
    regression.  Labeled sets are small by construction (human/LLM
    labels, ~10^4-10^5 docs), which is why a numpy batch-gradient loop
    beats shipping a distributed trainer whose hash wouldn't match the
    inference bucket.  ``max_labeled`` enforces that contract: pointing
    the trainer at a corpus-sized frame raises a clear error BEFORE any
    collect instead of OOMing an executor or the driver."""
    import numpy as np

    # limit-bounded: stops scanning after max_labeled+1 rows instead of
    # paying a full count() over the very corpus the guard exists to
    # reject (review r5)
    if df.limit(max_labeled + 1).count() > max_labeled:
        raise ValueError(
            f"train_quality_classifier collects the labeled sample to the "
            f"driver; got more than max_labeled={max_labeled} rows. "
            f"This trainer is for small labeled sets (~10^4-10^5 docs) — "
            f"sample the frame first (e.g. hash_sample) or raise "
            f"max_labeled deliberately."
        )
    labels = {
        r[0]: float(r[1]) for r in df.select(id_col, label_col).collect()
    }
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("tok"),
        F.size(tokens(F.col(text_col))).alias("__n"),
    )
    triples = (
        toks.withColumn("bucket", _poly_token_bucket(F.col("tok"), n_buckets))
        .groupBy(id_col, "bucket")
        .agg(F.sum(F.lit(1.0) / F.col("__n")).alias("w"))
        .collect()
    )
    ids = sorted(labels)
    row_of = {d: i for i, d in enumerate(ids)}
    feats = np.zeros((len(ids), n_buckets))
    for r in triples:
        feats[row_of[r[0]], r["bucket"]] = r["w"]
    y = np.array([labels[d] for d in ids])
    w, b = np.zeros(n_buckets), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(feats @ w + b)))
        g = p - y
        w -= lr * (feats.T @ g) / len(y)
        b -= lr * g.mean()
    return [float(x) for x in w], float(b)
