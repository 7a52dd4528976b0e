"""X4' trained language ID (operators/lang_id.py): train char-bigram
profiles on a five-language seed, classify held-out sentences, and pin
the fixed-point arithmetic against an independent pure-Python replay
of the whole estimator (training counts, top-K cut, shared-OOV
advantage, argmax) — plus the loud-'und' contract, the coverage
abstention gate, the stopword fallback composition, and the max_chars
bound."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.lang_id import (
    classify_language,
    classify_language_with_fallback,
    train_lang_profiles,
)

# Seed corpus: one longish sentence per language (public pangram-style
# filler — deliberately everyday vocabulary).
SEED = {
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und die "
        "katze schläft auf der warmen matte während die kinder am abend "
        "ihre bücher lesen und der alte mann über die strasse geht"
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog and the cat sleeps "
        "on the warm mat while the children read their books in the "
        "quiet evening and the old man walks across the street"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y el gato "
        "duerme sobre la alfombra caliente mientras los niños leen sus "
        "libros por la noche y el hombre viejo cruza la calle"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et le "
        "chat dort sur le tapis chaud pendant que les enfants lisent "
        "leurs livres le soir et le vieil homme traverse la rue"
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro e il gatto "
        "dorme sul tappeto caldo mentre i bambini leggono i loro libri "
        "la sera e il vecchio uomo attraversa la strada"
    ),
}

# Held-out sentences — same languages, different content.
HELD_OUT = {
    "de": (
        "ein kleiner junge geht mit seinem freund zur schule und sie "
        "sprechen über das spiel das sie gestern gespielt haben"
    ),
    "en": (
        "a small boy walks to the school with his friend and they talk "
        "about the game they played yesterday"
    ),
    "es": (
        "un niño pequeño camina a la escuela con su amigo y hablan del "
        "juego que jugaron ayer"
    ),
    "fr": (
        "un petit garçon marche vers l école avec son ami et ils parlent "
        "du jeu auquel ils ont joué hier"
    ),
    "it": (
        "un bambino piccolo cammina a scuola con il suo amico e parlano "
        "del gioco che hanno giocato ieri"
    ),
}

TOP_K = 300
FIX = 1e6


def _seed_df(spark, langs=None):
    rows = [(l, t) for l, t in SEED.items() if langs is None or l in langs]
    return spark.createDataFrame(rows, "lang string, text string")


# ---------------------------------------------------------------- reference


def _py_norm(text: str) -> str:
    out = []
    prev_space = True
    for ch in text.lower():
        if ch.isalpha():
            out.append(ch)
            prev_space = False
        elif not prev_space:
            out.append(" ")
            prev_space = True
    return "".join(out).strip()


def _py_bigrams(text: str, max_chars: int | None = None) -> list[str]:
    if max_chars is not None:
        text = text[:max_chars]
    norm = _py_norm(text)
    if not norm:
        return []
    padded = f" {norm} "
    return [padded[i : i + 2] for i in range(len(padded) - 1)]


def _py_profiles(seed: dict[str, str], top_k: int = TOP_K):
    """lang -> {gram: adv_fix}, replaying train_lang_profiles."""
    counts = {l: Counter(_py_bigrams(t)) for l, t in seed.items()}
    tots = {l: sum(c.values()) for l, c in counts.items()}
    v = top_k + 1
    oov = -math.log(float(max(tots.values())) + v)
    prof: dict[str, dict[str, int]] = {}
    for l, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        prof[l] = {
            g: math.floor(
                (math.log((n + 1) / (tots[l] + v)) - oov) * FIX + 0.5
            )
            for g, n in top
        }
    return prof


def _py_classify(prof, text: str, max_chars: int = 400):
    """(lang, adv_fix_sum) or ('und', None), replaying classify."""
    grams = _py_bigrams(text, max_chars)
    scores = {
        l: sum(p[g] for g in grams if g in p)
        for l, p in prof.items()
    }
    scores = {l: s for l, s in scores.items() if s > 0}
    if not scores:
        return "und", None
    # tie rule: max adv, then FIRST lang in sort order
    top = max(scores.values())
    lang = min(l for l, s in scores.items() if s == top)
    return lang, scores[lang]


# ------------------------------------------------------------------- tests


def test_heldout_sentences_classify_correctly(spark):
    prof = train_lang_profiles(_seed_df(spark))
    docs = spark.createDataFrame(
        [(i, l, t) for i, (l, t) in enumerate(sorted(HELD_OUT.items()))],
        "doc_id int, expected string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in classify_language(docs, "doc_id", "text", prof).collect()
    }
    for r in out.values():
        assert r["lang"] == r["expected"], (r["expected"], r["lang"])
        assert r["lang_lm_adv"] > 0


def test_matches_pure_python_replay(spark):
    """Training counts, top-K cut, OOV advantage and per-doc argmax all
    agree with an independent Python replay — exact fixed-point
    equality, not approx."""
    prof_df = train_lang_profiles(_seed_df(spark))
    prof_py = _py_profiles(SEED)
    got = {
        (r["lang"], r["gram"]): r["adv_fix"] for r in prof_df.collect()
    }
    want = {
        (l, g): fx for l, p in prof_py.items() for g, fx in p.items()
    }
    assert got == want

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(HELD_OUT.values())]
        + [(90, ""), (91, "12345 !!!"), (92, "οι θεοί της ελλάδας")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["lang"], r["lang_lm_adv"])
        for r in classify_language(docs, "doc_id", "text", prof_df).collect()
    }
    for i, t in enumerate(HELD_OUT.values()):
        lang, fx = _py_classify(prof_py, t)
        assert out[i][0] == lang
        assert out[i][1] == pytest.approx(
            math.floor(fx / FIX * 1e6 + 0.5) / 1e6, abs=0
        )
    # the planted no-evidence docs must replay too (empty, letterless,
    # unseeded script): both sides say ('und', no advantage)
    for i, t in [(90, ""), (91, "12345 !!!"), (92, "οι θεοί της ελλάδας")]:
        assert _py_classify(prof_py, t)[0] == "und"
        assert out[i] == ("und", None)


def test_local_training_equals_distributed(spark):
    """Round-15 driver-local training fast path: the pure-Python
    kept-counts (norm, bigrams, per-language totals, (-c, gram) top-K
    cut) must equal the distributed explode/aggregate/window plan
    EXACTLY — (lang, gram, c, tot, adv_fix) row sets identical — on a
    seed with accents, an unseeded-script language, a NULL text, and a
    letterless language (which must vanish from the model in both)."""
    rows = sorted(SEED.items()) + [
        ("el", "οι θεοί της ελλάδας αγαπούν το φως και την θάλασσα"),
        ("xx", "123 --- 456"),
        ("zz", None),
    ]
    from covid19i2b2_spark.operators.lang_id import _lang_gram_kept_counts

    seed = spark.createDataFrame(rows, "lang string, text string")
    key = lambda r: (r["lang"], r["gram"])  # noqa: E731
    kept_fast = _lang_gram_kept_counts(seed, "lang", "text", 50)
    kept_dist = _lang_gram_kept_counts(seed, "lang", "text", 50, local_cap=0)
    got = {key(r): (r["c"], r["tot"]) for r in kept_fast.collect()}
    want = {key(r): (r["c"], r["tot"]) for r in kept_dist.collect()}
    assert got == want
    assert not any(lang in ("xx", "zz") for lang, _ in got)
    prof_fast = {
        key(r): r["adv_fix"]
        for r in train_lang_profiles(seed, top_k=50).collect()
    }
    prof_dist = {
        key(r): r["adv_fix"]
        for r in train_lang_profiles(seed, top_k=50, local_cap=0).collect()
    }
    assert prof_fast == prof_dist


def test_classify_plan_single_hash_aggregate(spark):
    """Round-15 pivoted scoring path: the classify plan must carry NO
    SortAggregate (the old struct-min argmax) and NO (id, lang)-keyed
    second exchange — one per-id hash aggregate over the LEFT broadcast
    gram join does everything (coverage denominator included)."""
    from covid19i2b2_spark.plans import physical_plan

    prof = train_lang_profiles(_seed_df(spark))
    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "")], "doc_id int, text string"
    )
    out = classify_language(
        docs, "doc_id", "text", prof, min_coverage=0.5
    )
    plan = physical_plan(out)
    assert "SortAggregate" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_loud_und_on_no_evidence(spark):
    """Empty, letterless, and unseeded-script text -> 'und' with NULL
    advantage (loud-NULL contract)."""
    prof = train_lang_profiles(_seed_df(spark))
    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "12345 --- !!!"), (3, "θεοί ελλάδας")],
        "doc_id int, text string",
    )
    for r in classify_language(docs, "doc_id", "text", prof).collect():
        assert r["lang"] == "und", (r["doc_id"], r["lang"])
        assert r["lang_lm_adv"] is None


def test_coverage_gate_abstains(spark):
    """Spanish text against an English-only model: some Latin bigrams
    match, but coverage sits below the gate -> 'und' (gated) while the
    ungated call mislabels it 'en' — the exact failure mode the gate
    exists for."""
    prof = train_lang_profiles(_seed_df(spark, langs=["en"]))
    docs = spark.createDataFrame(
        [(0, HELD_OUT["es"])], "doc_id int, text string"
    )
    ungated = classify_language(docs, "doc_id", "text", prof).collect()[0]
    assert ungated["lang"] == "en"  # wrong, confidently
    gated = classify_language(
        docs, "doc_id", "text", prof, min_coverage=0.8
    ).collect()[0]
    assert gated["lang"] == "und"
    assert gated["lang_lm_adv"] is None
    assert 0.0 < gated["lang_lm_coverage"] < 0.8


def test_fallback_composes_stopword_heuristic(spark):
    """LM abstains (coverage gate) -> stopword heuristic answers:
    Spanish held-out text with an en-only LM falls back to 'es' via
    the stopword lists; Greek text (neither LM nor stopwords) stays
    'und'; English text stays on the LM path."""
    prof = train_lang_profiles(_seed_df(spark, langs=["en"]))
    docs = spark.createDataFrame(
        [(0, HELD_OUT["es"]), (1, "θεοί ελλάδας"), (2, HELD_OUT["en"])],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r["lang"]
        for r in classify_language_with_fallback(
            docs, "doc_id", "text", prof, min_coverage=0.8
        ).collect()
    }
    assert out == {0: "es", 1: "und", 2: "en"}


def test_max_chars_bounds_scoring(spark):
    """A German prefix followed by kilobytes of English classifies 'de'
    when max_chars stops before the English — the explode is bounded
    by the prefix, not the document."""
    prof = train_lang_profiles(_seed_df(spark))
    text = HELD_OUT["de"] + " " + (HELD_OUT["en"] + " ") * 200
    docs = spark.createDataFrame(
        [(0, text)], "doc_id int, text string"
    )
    short = classify_language(
        docs, "doc_id", "text", prof, max_chars=len(HELD_OUT["de"])
    ).collect()[0]
    assert short["lang"] == "de"


def test_tie_breaks_by_language_order(spark):
    """Two languages trained on the SAME seed text produce identical
    profiles; classification picks the alphabetically first."""
    rows = [("aa", SEED["en"]), ("zz", SEED["en"])]
    prof = train_lang_profiles(
        spark.createDataFrame(rows, "lang string, text string")
    )
    docs = spark.createDataFrame(
        [(0, HELD_OUT["en"])], "doc_id int, text string"
    )
    assert (
        classify_language(docs, "doc_id", "text", prof).collect()[0]["lang"]
        == "aa"
    )


def test_train_validates(spark):
    with pytest.raises(ValueError, match="top_k"):
        train_lang_profiles(_seed_df(spark), top_k=0)
    with pytest.raises(ValueError, match="no character bigrams"):
        train_lang_profiles(
            spark.createDataFrame(
                [("en", "123 456")], "lang string, text string"
            )
        )


def test_output_column_collision_is_loud(spark):
    """An input frame already carrying the output column names must be
    rejected, not silently shadowed."""
    prof = train_lang_profiles(_seed_df(spark, langs=["en"]))
    docs = spark.createDataFrame(
        [(0, "the cat", "fr")], "doc_id int, text string, lang string"
    )
    with pytest.raises(ValueError, match="already exist"):
        classify_language(docs, "doc_id", "text", prof)
    # renaming the outputs makes the same frame legal
    out = classify_language(
        docs, "doc_id", "text", prof, out_col="lang2", adv_col="adv2"
    ).collect()[0]
    assert out["lang"] == "fr" and out["lang2"] == "en"


def test_fallback_output_column_collision_is_loud(spark):
    """ADVICE r13: the fallback wrapper must honor the same collision
    contract as classify_language — a frame already carrying 'lang' (or
    the forwarded coverage column) is rejected, never silently
    overwritten."""
    prof = train_lang_profiles(_seed_df(spark, langs=["en"]))
    docs = spark.createDataFrame(
        [(0, "the cat", "fr")], "doc_id int, text string, lang string"
    )
    with pytest.raises(ValueError, match="already exist"):
        classify_language_with_fallback(docs, "doc_id", "text", prof)
    # pre-existing coverage column collides too (wrapper forwards it)
    docs_cov = spark.createDataFrame(
        [(0, "the cat", 0.5)],
        "doc_id int, text string, lang_lm_coverage double",
    )
    with pytest.raises(ValueError, match="already exist"):
        classify_language_with_fallback(docs_cov, "doc_id", "text", prof)
    # renaming every output makes the same frames legal
    out = classify_language_with_fallback(
        docs, "doc_id", "text", prof,
        out_col="lang2", adv_col="adv2", cov_col="cov2",
    ).collect()[0]
    assert out["lang"] == "fr" and out["lang2"] == "en"


def test_attach_false_equals_attach_true(spark):
    """attach=False returns exactly the (id, lang, adv [, cov]) rows
    the attach=True path carries — including gram-less documents,
    which ride the explode_outer aggregate instead of reappearing via
    the attach join (round 15: q_lang_id's plan drops the re-attach
    SortMergeJoin + second input scan on this contract)."""
    prof = train_lang_profiles(_seed_df(spark))
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox and the lazy dog"),
            (1, ""),                      # gram-less: empty
            (2, "123 --- 456"),           # gram-less: letterless
            (3, "el gato duerme sobre la alfombra caliente"),
        ],
        "doc_id int, text string",
    )
    for kw in ({}, {"min_coverage": 0.5}):
        cols = ["doc_id", "lang", "lang_lm_adv"] + (
            ["lang_lm_coverage"] if kw else []
        )
        attached = (
            classify_language(docs, "doc_id", "text", prof, **kw)
            .select(*cols)
            .orderBy("doc_id")
            .collect()
        )
        bare = (
            classify_language(
                docs, "doc_id", "text", prof, attach=False, **kw
            )
            .select(*cols)
            .orderBy("doc_id")
            .collect()
        )
        assert bare == attached, (kw, bare, attached)
        assert [r["lang"] for r in bare[1:3]] == ["und", "und"]
