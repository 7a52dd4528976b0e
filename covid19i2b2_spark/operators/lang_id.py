"""X4' trained language identification (SURVEY §2.11 extension;
round 13 — VERDICT r12 "What's missing" #2).

The stopword heuristic (text.py lang_guess) only sees whole-token hits
against five ~20-word lists — it is blind to morphology, misses any
language without a list, and saturates on short text.  Real corpus
curation (fastText lang-id, CLD) classifies on CHARACTER n-gram
statistics learned from per-language seed corpora.  This module is
that, in-engine and expression-only: train per-language character
bigram log-probability profiles from a (lang, text) seed frame, then
classify any corpus by argmax of summed gram log-likelihood advantage
— zero UDFs on either path, full DuckDB replay (q_lang_id parity).

Model = one small DataFrame (lang, gram, logp, adv_fix): the top-K
bigrams per language with add-one-smoothed log-probs,

    P_l(g) = (c_{l,g} + 1) / (tot_l + K + 1),

plus a SHARED out-of-vocabulary floor oov = -ln(tot_max + K + 1)
folded in at training time as adv = logp - oov.  The shared floor is
what keeps scoring to one broadcast join: for every kept gram
(c >= 1), logp >= ln(2/(tot_l+K+1)) > ln(1/(tot_max+K+1)) = oov since
tot_l <= tot_max — so adv > 0, every matched gram strictly improves a
language's score over the all-OOV baseline, and a language with ZERO
matched grams can never be the argmax.  Unmatched languages therefore
need no rows at all: the per-document score is

    score(d, l) = sum_{g in d, g in profile_l} (logp_l(g) - oov)

(the n·oov all-OOV term is common across languages and cancels out of
the argmax), computed as an exact BIGINT sum of microunit fixed-point
advantages (the _fixdot/dmean pattern — order-independent, DuckDB
bit-identical).

Shape at 100 TB: classification is explode (bounded by ``max_chars``
per doc — language ID needs a few hundred chars, not the document)
→ LEFT broadcast-join the per-GRAM pivoted profile table (one row per
distinct gram with every language's adv_fix — KBs) → ONE per-id hash
aggregate (per-language sums/hits + the coverage denominator) → a
row-local array_min argmax.  Training counts run driver-locally for
seed corpora under _TRAIN_LOCAL_CAP_* (a seed is sentences, not a
corpus; pass local_cap=0 for the distributed explode → (lang, gram)
aggregate → top-K window plan, which large seeds fall back to
automatically).  The driver-side state is the bounded model itself —
|langs|·top_k rows, which scoring broadcasts anyway.

Loud-NULL contract: documents with no matched gram (empty text,
non-letter text, an unseeded language) classify 'und' — the same
no-evidence token lang_guess uses; compose lang_guess as a fallback
with :func:`classify_language_with_fallback`.
"""

from __future__ import annotations

import math

from pyspark.sql import (
    Column,
    DataFrame,
    SparkSession,
    Window,
    functions as F,
)

from covid19i2b2_spark.operators.aggregates import round6
from covid19i2b2_spark.operators.text import _c, lang_guess

# MICROunit fixed point — deliberately coarser than the 1e12 picounit
# grid unigram_logprob_score uses: adv = logp - oov is O(1)-O(10), so at
# 1e12 one double ulp of a cross-build LN difference is ~1e-3 of a grid
# cell (the r12 q_recrawl_schedule divergence mode), while at 1e6 it is
# ~1e-9 — the same safety margin as the recrawl qfix grids.  1e-6 of a
# log-likelihood unit is far below any meaningful score difference.
_FIX = 1e6


def lang_norm(col: str | Column) -> Column:
    """Letters-only canonical form for char-gram language ID:
    lowercase, fold every non-letter run to one space, trim.  \\p{L}
    (Unicode letter) in both engines' regex dialects, so accents and
    non-Latin scripts survive."""
    return F.trim(
        F.regexp_replace(F.lower(_c(col)), r"[^\p{L}]+", " ")
    )


def _bigrams_of_padded(padded: Column) -> Column:
    """Bigrams of an ALREADY-PROJECTED padded string column.  The
    char_shingles trap applies: expressions referenced inside the
    array lambda re-evaluate PER ELEMENT, so ``padded`` must be a real
    column (or a plain column reference), never an inlined regex."""
    return F.when(
        F.length(padded) <= 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(padded) - 1),
            lambda i: F.substring(padded, i, F.lit(2)),
        )
    )


def padded_lang_norm(col: str | Column, max_chars: int | None = None) -> Column:
    """' ' + lang_norm(text[:max_chars]) + ' ' — the projection hot
    paths must materialize before :func:`_bigrams_of_padded` (the
    char_shingles per-element-re-eval trap).  Empty/letterless text
    pads to '  ' (length 2), which _bigrams_of_padded maps to the
    empty array — no fake '  ' gram, no evidence."""
    c = _c(col)
    if max_chars is not None:
        c = F.substring(c, 1, max_chars)
    return F.concat(F.lit(" "), lang_norm(c), F.lit(" "))


def char_bigrams(col: str | Column) -> Column:
    """Word-boundary-padded character bigrams of the lang_norm'd text:
    ' ' + s + ' ' sliced at every position, so initial/final letters
    get their own boundary grams (the fastText trick that separates
    e.g. Italian final vowels from Spanish ones).  Empty text -> empty
    array (no evidence).  Convenience form — hot paths project
    padded_lang_norm to a real column and call _bigrams_of_padded on
    the column reference instead (per-element re-eval trap)."""
    return _bigrams_of_padded(padded_lang_norm(col))


# Driver-local training fast path bounds (round 15, guide §1.2 "per-task
# work" / the suffix_array local_cap precedent): a language-ID seed is a
# few sentences per language, yet the distributed kept-counts plan costs
# an explode + a (lang, gram) exchange + two windows + a collect — pure
# scheduler latency at seed scale, re-paid on EVERY train call (the
# bench times fn() construction).  Under these caps the counting runs in
# plain Python on the driver: exact integer counts, the same
# (-c, gram) top-K cut (UTF-8 byte order == code-point order, so Python
# str compare matches the JVM's UTF8String compare), and the SAME JVM
# expressions for logp/adv_fix afterwards (_profiles_from_kept on the
# local relation) — no float crosses engines.  local_cap=0 pins the
# distributed path (tests assert local ≡ distributed on real seeds).
_TRAIN_LOCAL_CAP_CHARS = 65536
_TRAIN_LOCAL_CAP_ROWS = 64


def _norm_local(text: str) -> str:
    """Pure-Python lang_norm: lower, fold non-letter runs (Unicode
    general category L*) to one space, trim — mirrors
    lower + regexp_replace('[^\\p{L}]+', ' ') + trim."""
    import unicodedata

    out: list[str] = []
    prev_sep = True
    for ch in text.lower():
        if unicodedata.category(ch).startswith("L"):
            out.append(ch)
            prev_sep = False
        elif not prev_sep:
            out.append(" ")
            prev_sep = True
    return "".join(out).strip()


def _bigrams_local(text: str) -> list[str]:
    norm = _norm_local(text)
    if not norm:
        return []
    padded = f" {norm} "
    return [padded[i : i + 2] for i in range(len(padded) - 1)]


def _kept_count_rows(pairs: list) -> list:
    """Driver-local replay of the kept-counts plan over (lang, text)
    pairs: per-language bigram Counter -> per-language total ->
    (-c, gram) top-K cut is applied by the caller (it needs top_k).
    Returns [(lang, Counter, tot)] sorted by lang."""
    from collections import Counter

    counts: dict = {}
    for lang, text in pairs:
        if text is None:
            continue
        grams = _bigrams_local(text)
        if grams:
            counts.setdefault(lang, Counter()).update(grams)
    return sorted(
        ((lang, c, sum(c.values())) for lang, c in counts.items()),
        key=lambda t: (t[0] is not None, t[0]),
    )


def _kept_counts_rows_local(pairs: list, top_k: int) -> list:
    """[(lang, gram, c, tot)] — the kept-counts sufficient statistic,
    computed driver-locally (exact integers; Python str sort == the
    JVM's UTF8String sort because UTF-8 byte order preserves code-point
    order)."""
    out = []
    for lang, c, tot in _kept_count_rows(pairs):
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out.extend((lang, g, n, tot) for g, n in top)
    return out


def _seed_local_pairs(
    seed, lang_col: str, text_col: str, local_cap: int
) -> list | None:
    """(lang, text) pairs when the seed is driver-local and small, else
    None (caller falls back to the distributed plan).  A plain Python
    sequence of pairs IS the fast path (no Spark round trip at all); a
    DataFrame seed pays one bounded limit().collect()."""
    if isinstance(seed, (list, tuple)):
        return [(lang, text) for lang, text in seed]
    if not local_cap:
        return None
    head = (
        seed.select(F.col(lang_col), F.col(text_col))
        .limit(_TRAIN_LOCAL_CAP_ROWS + 1)
        .collect()
    )
    if len(head) > _TRAIN_LOCAL_CAP_ROWS or (
        sum(len(r[text_col] or "") for r in head) > local_cap
    ):
        return None
    return [(r[lang_col], r[text_col]) for r in head]


def _profiles_local(spark, counts_rows: list, top_k: int) -> DataFrame:
    """Profiles frame from driver-local kept-counts: the SAME float
    recipe as _profiles_from_kept — logp = log((c+1)/(tot+v)) and
    adv_fix = floor((logp + ln(tot_max+v))·1e6 + 0.5) — in Python
    doubles (libm log == the JVM's Math.log on every value the replay
    test and the q_lang_id DuckDB oracle exercise; local ≡ distributed
    is pinned by test_local_training_equals_distributed, and
    local_cap=0 forces the JVM path).  The Python rows ride along on
    the returned frame (``_graft_profile_rows``) so classify_language
    can build its per-gram pivot without a collect round trip."""
    v = top_k + 1
    tot_max = max(tot for _, _, _, tot in counts_rows)
    oov = -math.log(float(tot_max) + v)
    data = []
    for lang, gram, c, tot in counts_rows:
        logp = math.log((c + 1) / (tot + v))
        data.append(
            (lang, gram, logp, math.floor((logp - oov) * _FIX + 0.5))
        )
    from covid19i2b2_spark.fsutil import one_partition_df

    prof = one_partition_df(
        spark, data, "lang string, gram string, logp double, adv_fix long"
    )
    prof._graft_profile_rows = [  # noqa: SLF001 (own attribute)
        (lang, gram, adv) for lang, gram, _, adv in data
    ]
    return prof


def train_lang_profiles(
    seed: DataFrame | list | tuple,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = 300,
    local_cap: int = _TRAIN_LOCAL_CAP_CHARS,
) -> DataFrame:
    """Per-language char-bigram profiles from a (lang, text) seed
    corpus: the top-``top_k`` bigrams per language by count (ties by
    gram — deterministic), with columns

    - ``logp``: add-one-smoothed ln P_l(g) (double, diagnostic)
    - ``adv_fix``: floor((logp - oov)·1e6 + 0.5) as BIGINT — the
      scoring payload; oov is the shared floor -ln(tot_max + K + 1)
      (module docstring), so adv_fix >= 1 for every kept gram.

    The returned frame is the whole model — persist it with plain
    parquet and broadcast it at scoring time (|langs|·K rows); for a
    versioned save/load/append lifecycle wrap it in
    :class:`LangIdModel`."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    # Driver-local fast path: count + top-K + log in plain Python (one
    # bounded limit().collect() for a DataFrame seed, ZERO Spark jobs
    # for a Python-pairs seed) — at seed scale the distributed plan is
    # pure scheduler latency, and every local-relation collect() round
    # trip costs ~0.4 s of fixed overhead on its own.
    pairs = _seed_local_pairs(seed, lang_col, text_col, local_cap)
    if pairs is not None:
        counts_rows = _kept_counts_rows_local(pairs, top_k)
        if not counts_rows:
            raise ValueError("seed corpus produced no character bigrams")
        spark = (
            seed.sparkSession
            if isinstance(seed, DataFrame)
            else SparkSession.getActiveSession()
        )
        return _profiles_local(spark, counts_rows, top_k)
    kept = _lang_gram_kept_counts(
        seed, lang_col, text_col, top_k, local_cap=0
    )
    # collect the sufficient statistic (bounded by construction:
    # |langs| x top_k tiny rows — the whole model broadcasts at scoring
    # time anyway) and rebuild it as a LOCAL relation: the lazy plan
    # otherwise re-runs the two training exchanges + top-K windows
    # INSIDE every scoring broadcast, i.e. the seed corpus is
    # re-aggregated once per classify call (round 15, guide §3.1
    # "compute the small side first" / §5 bounded-driver rule).  The
    # tot_max aggregate already forced one driver pass over `kept`;
    # collecting the rows costs the same pass and saves every re-run.
    rows = kept.collect()
    if not rows:
        raise ValueError("seed corpus produced no character bigrams")
    tot_max = max(r["tot"] for r in rows)
    from covid19i2b2_spark.fsutil import one_partition_df

    local_kept = one_partition_df(
        kept.sparkSession,
        [(r["lang"], r["gram"], r["c"], r["tot"]) for r in rows],
        "lang string, gram string, c long, tot long",
    )
    return _profiles_from_kept(local_kept, top_k, int(tot_max))


def _lang_gram_kept_counts(
    seed: DataFrame,
    lang_col: str,
    text_col: str,
    top_k: int,
    local_cap: int = _TRAIN_LOCAL_CAP_CHARS,
) -> DataFrame:
    """(lang, gram, c, tot): the per-language top-``top_k`` bigram
    counts with the per-language TOTAL gram count (over ALL grams, not
    just the kept ones) folded onto every row.  This is the sufficient
    statistic of the estimator: languages are independent here (counts,
    totals and the top-K cut are all per-language) — only the shared
    OOV floor couples them, and that is re-derived from MAX(tot) by
    :func:`_profiles_from_kept`.  LangIdModel persists THIS frame so
    appending languages can recompute every profile exactly as a
    retrain over the union would."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    pairs = _seed_local_pairs(seed, lang_col, text_col, local_cap)
    if pairs is not None:
        from covid19i2b2_spark.fsutil import one_partition_df

        return one_partition_df(
            seed.sparkSession,
            _kept_counts_rows_local(pairs, top_k),
            "lang string, gram string, c long, tot long",
        )
    grams = seed.select(
        F.col(lang_col).alias("lang"),
        padded_lang_norm(F.col(text_col)).alias("__p"),
    ).select(
        "lang",
        F.explode(_bigrams_of_padded(F.col("__p"))).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_tot = Window.partitionBy("lang")
    w_rank = Window.partitionBy("lang").orderBy(
        F.col("c").desc(), F.col("gram")
    )
    return (
        counts.withColumn("tot", F.sum("c").over(w_tot))
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= top_k)
        .select("lang", "gram", "c", "tot")
    )


def _profiles_from_kept(
    kept: DataFrame, top_k: int, tot_max: int
) -> DataFrame:
    """Derive the scoring payload (lang, gram, logp, adv_fix) from the
    kept-counts sufficient statistic under the shared OOV floor
    -ln(tot_max + K + 1)."""
    v = top_k + 1
    oov = -math.log(float(tot_max) + v)
    logp = F.log(
        (F.col("c") + F.lit(1)).cast("double")
        / (F.col("tot") + F.lit(v)).cast("double")
    )
    return kept.select(
        "lang",
        "gram",
        logp.alias("logp"),
        F.floor((logp - F.lit(oov)) * F.lit(_FIX) + F.lit(0.5)).alias(
            "adv_fix"
        ),
    )


def classify_language(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: DataFrame,
    *,
    max_chars: int = 400,
    min_coverage: float = 0.0,
    out_col: str = "lang",
    adv_col: str = "lang_lm_adv",
    cov_col: str = "lang_lm_coverage",
    attach: bool = True,
) -> DataFrame:
    """df + (``out_col``, ``adv_col``): argmax language under the
    trained profiles, scored on the first ``max_chars`` characters
    (language ID converges in a few hundred chars; bounding the
    explode keeps the pass O(max_chars) per document regardless of
    document length).  ``adv_col`` is the winning language's summed
    log-likelihood advantage over the all-OOV baseline (round6'd
    microunit sum — exact, order-independent, > 0 whenever a gram
    matched).  No match at all -> 'und' with NULL advantage.

    ``min_coverage`` > 0 adds an abstention gate (and a ``cov_col``
    output): coverage = matched-gram instances of the WINNING language
    / total grams; below the gate the LM abstains to 'und' — the text
    is mostly outside the winner's vocabulary (a language missing from
    the seed set sharing an alphabet with one that isn't), which is
    exactly when a fallback heuristic should get its say
    (:func:`classify_language_with_fallback`).  The denominator rides
    the same per-id aggregate as the scores (one extra count column);
    0.0 (default) skips the column and the gate.

    Ties break by language order (same rule as lang_guess_scored).

    ``attach=False`` (round 15, guide §2.4) returns ONLY
    (``id_col``, ``out_col``, ``adv_col`` [, ``cov_col``]) — one row
    per distinct id — instead of re-attaching the scores to ``df``.
    The gram explode is an ``explode_outer`` (gram-less documents ride
    the same aggregate with a NULL gram and score 'und'/NULL exactly
    as before), so the per-id aggregate already covers EVERY input id
    and the attach join exists purely to restore the caller's payload
    columns.  A caller that only needs the verdict (q_lang_id) skips
    that join: one fewer scan of the input and one fewer shuffle+sort
    pair at every scale."""
    taken = [
        c
        for c in (out_col, adv_col, *((cov_col,) if min_coverage > 0 else ()))
        if c in df.columns
    ]
    if taken:
        raise ValueError(
            f"output column(s) {taken} already exist on the input — "
            "pass different out_col/adv_col/cov_col names (a silent "
            "replace would shadow caller data)"
        )
    # Round-15 restructure (guide §2.3 "shuffle fewer bytes" + §2.4):
    # the model is bounded (|langs|·K rows — it broadcasts anyway), so
    # collect it ONCE and re-shape it per GRAM: one row per distinct
    # gram carrying that gram's adv_fix for every language (NULL where
    # the gram is outside a language's top-K).  The per-gram LEFT
    # broadcast join then emits exactly one row per gram instance
    # (the (gram, lang) long form fanned each instance out once per
    # matching language), ONE per-id hash aggregate computes every
    # language's sum/hit plus the coverage denominator together
    # (the long form needed a (id, lang) exchange + a struct-min
    # SortAggregate + a separate totals aggregate AND join), and the
    # argmax becomes a row-local array_min over per-language structs —
    # the SAME (adv DESC, lang ASC) tie rule as the old
    # min(struct(-adv, lang, ...)), language order baked into the
    # struct array.  BIGINT microunit sums, so every value is exact
    # and order-independent; null advs (zero matched grams for that
    # language) are filtered before the min, so "a language with no
    # matched gram never wins" is preserved verbatim.
    prows = getattr(profiles, "_graft_profile_rows", None)
    if prows is None:
        # loaded/custom model: one bounded collect (the model is
        # |langs|·top_k rows and broadcasts at scoring time anyway)
        prows = [
            (r["lang"], r["gram"], r["adv_fix"])
            for r in profiles.select("lang", "gram", "adv_fix").collect()
        ]
    if not prows:
        raise ValueError("profiles is empty — train_lang_profiles first")
    langs = sorted({lang for lang, _, _ in prows})
    idx = {lang: i for i, lang in enumerate(langs)}
    by_gram: dict[str, list] = {}
    for lang, gram, adv_fix in prows:
        advs = by_gram.setdefault(gram, [None] * len(langs))
        if advs[idx[lang]] is not None:
            raise ValueError(
                "duplicate (lang, gram) row in profiles: "
                f"({lang!r}, {gram!r})"
            )
        advs[idx[lang]] = adv_fix
    a_cols = [f"__a{i}" for i in range(len(langs))]
    from covid19i2b2_spark.fsutil import one_partition_df

    pivot = one_partition_df(
        df.sparkSession,
        [(g, *advs) for g, advs in sorted(by_gram.items())],
        "gram string, " + ", ".join(f"{c} long" for c in a_cols),
    )
    rows = df.select(
        F.col(id_col).alias("__id"),
        padded_lang_norm(_c(text_col), max_chars).alias("__p"),
    ).select(
        "__id",
        F.explode_outer(_bigrams_of_padded(F.col("__p"))).alias("__gram"),
    )
    joined = rows.join(
        F.broadcast(pivot), F.col("__gram") == F.col("gram"), "left"
    )
    aggs = []
    for i in range(len(langs)):
        aggs.append(F.sum(a_cols[i]).alias(f"__adv{i}"))
        aggs.append(F.count(a_cols[i]).alias(f"__hit{i}"))
    if min_coverage > 0.0:
        aggs.append(F.count("__gram").alias("__n"))
    grouped = joined.groupBy("__id").agg(*aggs)
    cand = F.filter(
        F.array(
            *[
                F.struct(
                    (-F.col(f"__adv{i}")).alias("__na"),
                    F.lit(lang).alias("lang"),
                    F.col(f"__adv{i}").alias("__adv"),
                    F.col(f"__hit{i}").alias("__hit"),
                )
                for i, lang in enumerate(langs)
            ]
        ),
        lambda s: s["__adv"].isNotNull(),
    )
    win = F.array_min(cand)
    best = grouped.select(
        F.col("__id"),
        win["lang"].alias(out_col),
        round6(win["__adv"].cast("double") / F.lit(_FIX)).alias(adv_col),
        win["__hit"].alias("__hit"),
        *(["__n"] if min_coverage > 0.0 else []),
    )
    if min_coverage > 0.0:
        cov = round6(
            F.col("__hit").cast("double") / F.col("__n").cast("double")
        )
        best = (
            best.withColumn(cov_col, cov)
            .withColumn(
                out_col,
                F.when(
                    F.col(cov_col) < F.lit(float(min_coverage)),
                    F.lit("und"),
                ).otherwise(F.col(out_col)),
            )
            .withColumn(
                adv_col,
                F.when(
                    F.col(out_col) == "und", F.lit(None).cast("double")
                ).otherwise(F.col(adv_col)),
            )
            .drop("__n")
        )
    if not attach:
        return best.drop("__hit").withColumnRenamed(
            "__id", id_col
        ).withColumn(out_col, F.coalesce(F.col(out_col), F.lit("und")))
    out = df.join(best, df[id_col] == best["__id"], "left").drop(
        "__id", "__hit"
    )
    return out.withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit("und"))
    )


def classify_language_with_fallback(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: DataFrame,
    *,
    max_chars: int = 400,
    min_coverage: float = 0.5,
    out_col: str = "lang",
    adv_col: str = "lang_lm_adv",
    cov_col: str = "lang_lm_coverage",
) -> DataFrame:
    """classify_language with the stopword heuristic (text.lang_guess)
    as the low-evidence fallback: where the LM abstains to 'und' —
    no profile gram matched, or the winner's gram coverage fell below
    ``min_coverage`` (default 0.5: at least half the text's grams must
    be in the winning profile's vocabulary; below that the text is
    mostly foreign to the model) — fall back to lang_guess; 'und' only
    when both abstain.

    Same output-column collision contract as classify_language.  The
    wrapper validates only ITS OWN output (``out_col``) — the inner
    call below already rejects collisions on ``__lm_lang`` (its
    out_col), ``adv_col``, and the forwarded ``cov_col`` under the
    same min_coverage gating, so re-checking them here would be a
    second copy of the same contract to keep in sync (review r14)."""
    if out_col in df.columns:
        raise ValueError(
            f"output column(s) ['{out_col}'] already exist on the "
            "input — pass different out_col/adv_col/cov_col names (a "
            "silent replace would shadow caller data)"
        )
    lm = classify_language(
        df,
        id_col,
        text_col,
        profiles,
        max_chars=max_chars,
        min_coverage=min_coverage,
        out_col="__lm_lang",
        adv_col=adv_col,
        cov_col=cov_col,
    )
    return lm.withColumn(
        out_col,
        F.when(
            F.col("__lm_lang") != "und", F.col("__lm_lang")
        ).otherwise(lang_guess(_c(text_col))),
    ).drop("__lm_lang")


class LangIdModel:
    """Versioned save/load/append lifecycle for trained language-ID
    profiles (VERDICT r13 missing #2 / next-round #5) — the same
    directory protocol as IvfIndex/DedupIndex/FuzzyIndex
    (operators/ivf_index.py): a user trains profiles once and
    classifies many corpora, so the model needs a persisted home.

        path/_CURRENT        -> "v0001"   (tmp+rename atomic pointer)
        path/v0001/counts/   -> (lang, gram, c, tot) — the sufficient
                                statistic (per-language, independent)
        path/v0001/profiles/ -> (lang, gram, logp, adv_fix) — the
                                scoring payload under the CURRENT
                                shared OOV floor
        path/v0001/meta/     -> 1 row: top_k, tot_max, n_langs
                                (written LAST — its _SUCCESS is the
                                version-complete marker)

    ``append_languages`` is exact, not approximate: profiles couple
    across languages ONLY through the shared OOV floor
    -ln(tot_max + K + 1), so the model persists the per-language
    kept-counts (independent across languages) and re-derives EVERY
    language's adv_fix under the merged tot_max — bit-identical to a
    one-shot retrain over the unioned seed corpus (pinned by test).
    A language already in the model is rejected loudly (retrain to
    replace a language's seed — silently mixing two seeds would
    change its totals).

    Crash safety: the pointer flips only after meta lands; an
    unparseable/missing pointer falls back to the highest version
    whose meta/_SUCCESS exists.  The flip leaves the immediately
    previous version as a reader grace window; :meth:`vacuum`
    reclaims older versions."""

    def __init__(self, path: str):
        self.path = path.rstrip("/")

    # ---- version plumbing (IvfIndex protocol) ------------------------

    def _vdir(self, version: int) -> str:
        return f"{self.path}/v{version:04d}"

    def _pointer(self) -> str:
        return f"{self.path}/_CURRENT"

    def current_version(self, spark) -> int | None:
        from covid19i2b2_spark.fsutil import hadoop_fs, read_text_file

        txt = read_text_file(spark, self._pointer())
        if txt is not None:
            name = txt.strip()
            if name.startswith("v") and name[1:].isdigit():
                return int(name[1:])
        fs, root = hadoop_fs(spark, self.path)
        if not fs.exists(root):
            return None
        jvm = spark._jvm  # noqa: SLF001
        best = None
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                marker = jvm.org.apache.hadoop.fs.Path(
                    st.getPath(), "meta/_SUCCESS"
                )
                if fs.exists(marker):
                    v = int(name[1:])
                    best = v if best is None else max(best, v)
        return best

    def _require_version(self, spark) -> int:
        v = self.current_version(spark)
        if v is None:
            raise ValueError(
                f"no complete model at {self.path} — call build() first"
            )
        return v

    def _flip(self, spark, version: int) -> None:
        from covid19i2b2_spark.fsutil import (
            hadoop_fs,
            write_text_file_atomic,
        )

        write_text_file_atomic(spark, self._pointer(), f"v{version:04d}")
        fs, root = hadoop_fs(spark, self.path)
        jvm = spark._jvm  # noqa: SLF001
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) < version - 1:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(root, name), True
                    )

    def vacuum(self, spark) -> None:
        """Delete every version except the current one (including the
        grace-window predecessor) once no reader can hold a handle."""
        from covid19i2b2_spark.fsutil import hadoop_fs

        v = self._require_version(spark)
        fs, root = hadoop_fs(spark, self.path)
        jvm = spark._jvm  # noqa: SLF001
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                if int(name[1:]) != v:
                    fs.delete(
                        jvm.org.apache.hadoop.fs.Path(root, name), True
                    )

    # ---- writes ------------------------------------------------------

    def _write_version(
        self, spark, version: int, kept: DataFrame, top_k: int
    ) -> None:
        tot_max = kept.agg(F.max("tot")).collect()[0][0]
        if tot_max is None:
            raise ValueError("seed corpus produced no character bigrams")
        tot_max = int(tot_max)
        vdir = self._vdir(version)
        kept.write.mode("overwrite").parquet(f"{vdir}/counts")
        # read the persisted counts back so profiles/ derives from the
        # exact stored statistic (and the lazy plan doesn't re-run the
        # seed scan)
        stored = spark.read.parquet(f"{vdir}/counts")
        _profiles_from_kept(stored, top_k, tot_max).write.mode(
            "overwrite"
        ).parquet(f"{vdir}/profiles")
        n_langs = stored.select("lang").distinct().count()
        from covid19i2b2_spark.fsutil import one_partition_df

        one_partition_df(
            spark,
            [(top_k, tot_max, n_langs)],
            "top_k int, tot_max long, n_langs int",
        ).write.mode("overwrite").parquet(f"{vdir}/meta")
        self._flip(spark, version)

    def build(
        self,
        spark,
        seed: DataFrame,
        lang_col: str = "lang",
        text_col: str = "text",
        top_k: int = 300,
    ) -> int:
        """Train from a (lang, text) seed corpus and write version 1
        (or the next version, if rebuilding over an existing model)."""
        prev = self.current_version(spark)
        version = 1 if prev is None else prev + 1
        kept = _lang_gram_kept_counts(seed, lang_col, text_col, top_k)
        self._write_version(spark, version, kept, top_k)
        return version

    def append_languages(
        self,
        spark,
        seed: DataFrame,
        lang_col: str = "lang",
        text_col: str = "text",
    ) -> int:
        """Add new languages to the model — EXACTLY equivalent to
        retraining over (stored seed ∪ new seed): new languages'
        kept-counts are trained fresh, unioned with the stored counts,
        and every profile row (old and new) is re-derived under the
        merged tot_max.  Languages already present are rejected."""
        v = self._require_version(spark)
        meta = self.meta(spark)
        top_k = int(meta["top_k"])
        stored = self.counts(spark)
        new_langs = {
            r["lang"]
            for r in seed.select(
                F.col(lang_col).alias("lang")
            ).distinct().collect()
        }
        overlap = sorted(
            new_langs
            & {r["lang"] for r in stored.select("lang").distinct().collect()}
        )
        if overlap:
            raise ValueError(
                f"language(s) {overlap} already in the model at "
                f"{self.path} — rebuild() to replace a language's seed "
                "(appending would silently mix two seed corpora)"
            )
        fresh = _lang_gram_kept_counts(seed, lang_col, text_col, top_k)
        merged = stored.unionByName(fresh)
        self._write_version(spark, v + 1, merged, top_k)
        return v + 1

    # ---- reads -------------------------------------------------------

    def meta(self, spark) -> dict:
        v = self._require_version(spark)
        row = spark.read.parquet(f"{self._vdir(v)}/meta").collect()[0]
        return {**row.asDict(), "version": v}

    def counts(self, spark) -> DataFrame:
        v = self._require_version(spark)
        return spark.read.parquet(f"{self._vdir(v)}/counts")

    def profiles(self, spark) -> DataFrame:
        v = self._require_version(spark)
        return spark.read.parquet(f"{self._vdir(v)}/profiles")

    def langs(self, spark) -> list[str]:
        return sorted(
            r["lang"]
            for r in self.profiles(spark).select("lang").distinct().collect()
        )

    def classify(
        self, spark, df: DataFrame, id_col: str, text_col: str, **kwargs
    ) -> DataFrame:
        """:func:`classify_language` under the stored profiles."""
        return classify_language(
            df, id_col, text_col, self.profiles(spark), **kwargs
        )
