"""Interpolated Kneser–Ney trigram language model (X93, round 15).

The missing rung of the CCNet-style perplexity-filter ladder
(Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
from Web Crawl Data", LREC 2020 — whose filter is a KenLM 5-gram):
:func:`quality.unigram_logprob_score` / ``bigram_logprob_score`` are
add-one smoothers, which over-penalize unseen-but-plausible n-grams and
under-penalize frequent-token gibberish.  Interpolated Kneser–Ney
(Kneser & Ney 1995; Chen & Goodman 1998 — the smoothing KenLM
implements) fixes both with absolute discounting plus CONTINUATION
counts: the unigram backoff weight of a word is how many distinct
contexts it follows, not how often it occurs ("Francisco" is frequent
but only ever follows "San", so its backoff mass is tiny).

Model (trigram, fixed discount D):

    P3(c|a,b) = (max(c3(abc)-D,0) + D·N1+(ab·)·P2(c|b)) / c2(ab)
                 ... or P2(c|b) when context (a,b) is unseen
    P2(c|b)   = (max(cc2(bc)-D,0) + D·N1+(b·)·P1(c)) / Σ_c cc2(bc)
                 ... or P1(c) when b is unseen as a middle context
    P1(c)     = (cc1(c)+1) / (N1+(··)+V+1)     -- add-one floor so any
                 score-time token has P > 0 (KenLM's <unk> role)

where cc2(bc) = |{a: c3(abc)>0}| and cc1(c) = |{b: cc2(bc)>0}| are the
continuation counts, all computable as grouped aggregates OVER THE
TRIGRAM TABLE — the reason a distributed KN trainer is cheap: one
trigram count shuffle, then three tiny cascaded groupBys.

Sequences: each document is one sequence, padded <s> <s> t1..tn </s>;
every real token plus </s> is one prediction event.  Out-of-vocab
tokens map to <unk> BEFORE counting (closed vocabulary, the standard
treatment); documents with zero tokens score NULL like the other
quality scorers.

Scale shape: event generation is MAP-ONLY — the padded trigram structs
come out of one array ``transform`` + ``explode`` (no window, no
per-doc shuffle), and <unk> mapping is three broadcast joins against
the bounded top-N vocab.  Training pays one trigram-keyed count
shuffle (key space = distinct trigram types, corpus-bounded) and three
cascaded aggregates over that table; scoring pays per-event left joins
against the model tables (AQE broadcasts them when they fit, plain
shuffle-hash joins otherwise) and one doc-keyed aggregate.  All
log-probs are summed on the picounit fixed-point grid (qfix), so the
per-doc mean is association-order-independent and the DuckDB oracle
(tests/test_oracle_parity.py q_kn_lm RE-TRAINS the model and re-scores
every document in SQL) matches hash-for-hash.

Reference scope note: the reconstructed covid19i2b2 reference has no
LM operators — this module is north-star LLM-pipeline surface
(SURVEY §2.11), built on the same fixed-point discipline as
q_lang_id (SURVEY X4-langid).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.aggregates import qfix, round6
from covid19i2b2_spark.operators.quality import build_vocab
from covid19i2b2_spark.operators.text import tokens

BOS = "<s>"
EOS = "</s>"
UNK = "<unk>"


@dataclass(frozen=True)
class KnTrigramLm:
    """Trained model: the five count tables plus two scalars.

    ``tri``  (a, b, c, c3): trigram event counts.
    ``ctx3`` (a, b, c2, n1p3): context totals + distinct continuations.
    ``cc2``  (b, c, cc2): continuation counts |{a: c3(abc)>0}|.
    ``ctx2`` (b, ctxcc2, n1p2): middle-context totals + distinct c.
    ``cc1``  (c, cc1): unigram continuation counts |{b: cc2(bc)>0}|.
    ``tot_cc1`` = distinct (b, c) pairs; ``v_eff`` = distinct predicted
    tokens + 1 (the add-one floor's vocabulary size).
    """

    vocab: DataFrame
    tri: DataFrame
    ctx3: DataFrame
    cc2: DataFrame
    ctx2: DataFrame
    cc1: DataFrame
    tot_cc1: int
    v_eff: int
    discount: float
    top_n_vocab: int


def _map_marker_or_vocab(col: Column, hit: Column) -> Column:
    """<s>/</s> pass through (they are never vocab members); known
    tokens keep themselves; everything else is <unk>.  A corpus token
    that LITERALLY spells a marker collides with it — deterministic,
    mirrored verbatim in the oracle, and absent from real corpora."""
    return (
        F.when(col.isin(BOS, EOS), col)
        .when(hit.isNotNull(), col)
        .otherwise(F.lit(UNK))
    )


def kn_events(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """(id, a, b, c): one row per prediction event of each document —
    the padded trigram stream with out-of-vocab tokens mapped to <unk>.

    Map-only: pad + trigram structs as array expressions, one explode,
    three broadcast vocab joins (one per trigram slot).  Documents with
    zero tokens emit no events (they score NULL downstream)."""
    toks = tokens(F.col(text_col))
    padded = F.concat(
        F.array(F.lit(BOS), F.lit(BOS)), toks, F.array(F.lit(EOS))
    )
    ev = F.transform(
        F.sequence(F.lit(3), F.size(padded)),
        lambda i: F.struct(
            F.element_at(padded, i - 2).alias("a_raw"),
            F.element_at(padded, i - 1).alias("b_raw"),
            F.element_at(padded, i).alias("c_raw"),
        ),
    )
    raw = (
        df.filter(F.size(toks) >= 1)
        .select(F.col(id_col), F.explode(ev).alias("e"))
        .select(
            id_col,
            F.col("e.a_raw").alias("a_raw"),
            F.col("e.b_raw").alias("b_raw"),
            F.col("e.c_raw").alias("c_raw"),
        )
    )
    va = F.broadcast(vocab.select(F.col("token").alias("__ta")))
    vb = F.broadcast(vocab.select(F.col("token").alias("__tb")))
    vc = F.broadcast(vocab.select(F.col("token").alias("__tc")))
    return (
        raw.join(va, raw["a_raw"] == va["__ta"], "left")
        .join(vb, raw["b_raw"] == vb["__tb"], "left")
        .join(vc, raw["c_raw"] == vc["__tc"], "left")
        .select(
            id_col,
            _map_marker_or_vocab(F.col("a_raw"), F.col("__ta")).alias("a"),
            _map_marker_or_vocab(F.col("b_raw"), F.col("__tb")).alias("b"),
            _map_marker_or_vocab(F.col("c_raw"), F.col("__tc")).alias("c"),
        )
    )


def _cc_scalars(cc2: DataFrame) -> tuple[int, int]:
    """(tot_cc1, v_eff) from the (b, c) continuation-count table — the
    ONE definition of both scalars (review r15: _write_version carried
    a renamed copy that could silently diverge from load()-time
    re-derivation)."""
    row = cc2.agg(
        F.count("*").alias("t"),
        F.count_distinct("c").alias("v"),
    ).collect()[0]
    return int(row["t"] or 0), int(row["v"] or 0) + 1


def _model_from_tri(
    vocab: DataFrame,
    tri: DataFrame,
    discount: float,
    top_n_vocab: int,
    persist: bool = True,
) -> KnTrigramLm:
    """Derive the full model from the (vocab, trigram-count) sufficient
    statistic: three cascaded aggregates over ``tri`` plus two bounded
    driver scalars.  ``persist=True`` caches everything (release_kn_lm
    frees it); ``tri`` should then already be persisted or
    parquet-backed — each cascade scans it once.  ``persist=False`` is
    the fire-and-forget mode for one-shot consumers (the parity query)
    that have no release hook — correctness identical, the event
    pipeline just recomputes per consumer."""
    _p = (lambda df: df.persist()) if persist else (lambda df: df)
    ctx3 = _p(
        tri.groupBy("a", "b")
        .agg(F.sum("c3").alias("c2"), F.count("*").alias("n1p3"))
    )
    cc2 = _p(tri.groupBy("b", "c").agg(F.count("*").alias("cc2")))
    ctx2 = _p(
        cc2.groupBy("b")
        .agg(F.sum("cc2").alias("ctxcc2"), F.count("*").alias("n1p2"))
    )
    cc1 = _p(cc2.groupBy("c").agg(F.count("*").alias("cc1")))
    tot_cc1, v_eff = _cc_scalars(cc2)
    return KnTrigramLm(
        vocab=vocab,
        tri=tri,
        ctx3=ctx3,
        cc2=cc2,
        ctx2=ctx2,
        cc1=cc1,
        tot_cc1=tot_cc1,
        v_eff=v_eff,
        discount=discount,
        top_n_vocab=top_n_vocab,
    )


def _tri_counts(
    df: DataFrame, text_col: str, vocab: DataFrame
) -> DataFrame:
    """The trigram event counts of ``df`` under ``vocab`` — the
    mergeable half of the sufficient statistic (counts under a FIXED
    vocab are additive across corpora; the vocab itself is not)."""
    # kn_events needs an id column; counting ignores ids, so synthesize
    # a constant (the explode keys on nothing downstream)
    ev = kn_events(
        df.select(F.lit(1).alias("__kn_id"), F.col(text_col)),
        "__kn_id",
        text_col,
        vocab,
    ).drop("__kn_id")
    return ev.groupBy("a", "b", "c").agg(F.count("*").alias("c3"))


def train_kn_lm(
    df: DataFrame,
    text_col: str,
    *,
    top_n_vocab: int = 1000,
    discount: float = 0.75,
    vocab: DataFrame | None = None,
    persist: bool = True,
) -> KnTrigramLm:
    """Fit the interpolated KN trigram model on ``df``.

    One trigram count shuffle + three cascaded aggregates over the
    count table; the only driver scalars are two bounded counts
    (distinct (b,c) pairs and distinct predicted tokens).  The count
    tables are persisted — scoring joins read each one once per score
    call, and the cascade would otherwise recount trigrams three
    times.

    ``vocab``: train under a CALLER-FROZEN vocabulary instead of
    cutting a fresh top-N from ``df`` — the retrain side of
    :class:`KnLmModel.append_corpus`'s exactness contract (appending
    under a frozen vocab equals retraining the union under that same
    vocab; ``top_n_vocab`` is ignored for the cut but kept as model
    metadata).

    ``persist=False``: skip all caching — for one-shot consumers with
    no release hook (the q_kn_lm parity query); correctness identical,
    each consumer just recomputes the event pipeline."""
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if top_n_vocab < 1:
        raise ValueError(f"top_n_vocab must be >= 1, got {top_n_vocab}")
    if vocab is None:
        # persisted: the three per-slot broadcast projections alias the
        # vocab differently, so without the cache each one recomputes
        # the corpus-wide token count (verified in the physical plan —
        # no ReusedExchange across the va/vb/vc builds)
        vocab = build_vocab(df, text_col, top_n=top_n_vocab, lowercase=False)
        if persist:
            vocab = vocab.persist()
    tri = _tri_counts(df, text_col, vocab)
    if persist:
        tri = tri.persist()
    return _model_from_tri(vocab, tri, discount, top_n_vocab, persist=persist)


def kn_logprob_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: KnTrigramLm,
    out_col: str = "kn_logprob",
) -> DataFrame:
    """df + ``out_col``: the per-document mean interpolated-KN trigram
    log-probability (natural log; exp(-score) is the perplexity).
    Fluent text under the training distribution scores high (less
    negative); gibberish, shuffled words, and off-domain text score
    low.  Documents with zero tokens keep their row with NULL.

    Per-event probability, exactly as the oracle replays it:
    unseen (a,b) context falls back to P2, unseen middle context b
    falls back to P1, and the add-one continuation floor keeps every
    event strictly positive.  Log-probs are summed as picounit BIGINTs
    (order-independent; see aggregates.qfix)."""
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    ev = kn_events(df, id_col, text_col, model.vocab)
    d = float(model.discount)
    sc = (
        ev.join(model.tri, ["a", "b", "c"], "left")
        .join(model.ctx3, ["a", "b"], "left")
        .join(model.cc2, ["b", "c"], "left")
        .join(model.ctx2, ["b"], "left")
        .join(model.cc1, ["c"], "left")
    )
    p1 = (F.coalesce(F.col("cc1"), F.lit(0)) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(model.tot_cc1 + model.v_eff))
    p2 = F.when(
        F.col("ctxcc2").isNotNull(),
        (
            F.greatest(
                F.coalesce(F.col("cc2"), F.lit(0)).cast("double") - F.lit(d),
                F.lit(0.0),
            )
            + (F.lit(d) * F.col("n1p2").cast("double")) * p1
        )
        / F.col("ctxcc2").cast("double"),
    ).otherwise(p1)
    p3 = F.when(
        F.col("c2").isNotNull(),
        (
            F.greatest(
                F.coalesce(F.col("c3"), F.lit(0)).cast("double") - F.lit(d),
                F.lit(0.0),
            )
            + (F.lit(d) * F.col("n1p3").cast("double")) * p2
        )
        / F.col("c2").cast("double"),
    ).otherwise(p2)
    lp_fix = qfix(F.log(p3), 12).cast("long")
    # the per-doc sum runs in DECIMAL(38,0): a floor-probability event
    # contributes ~-1.6e13 picounits, so a LONG sum would wrap silently
    # past ~5.7e5 events (multi-MB documents) while the DuckDB oracle's
    # SUM(BIGINT) promotes to HUGEINT and stays exact (review r15).
    # Both sides convert the exact integer to double for the mean.
    per_doc = (
        sc.select(F.col(id_col), lp_fix.alias("__lp"))
        .groupBy(id_col)
        .agg(
            round6(
                F.sum(F.col("__lp").cast("decimal(20,0)")).cast("double")
                / F.count("*")
                / F.lit(1e12)
            ).alias(out_col)
        )
    )
    return df.join(per_doc, id_col, "left").select(df["*"], F.col(out_col))


class KnLmModel:
    """Versioned save/load/append lifecycle for trained KN models —
    the IvfIndex/LangIdModel directory protocol: train once, score
    many corpora, grow the model as new corpus lands.

        path/_CURRENT     -> "v0001"    (tmp+rename atomic pointer)
        path/v0001/vocab/ -> (token, n, rank) — FROZEN at build
        path/v0001/tri/   -> (a, b, c, c3) — the sufficient statistic
        path/v0001/meta/  -> 1 row: top_n_vocab, discount, tot_cc1,
                             v_eff (written LAST — its _SUCCESS is the
                             version-complete marker)

    Only (vocab, tri) persist: the four cascade tables and both
    scalars re-derive from them at :meth:`load` (three aggregates over
    the stored parquet — cheap next to re-scanning a corpus), so a
    version can never hold mutually inconsistent tables.

    ``append_corpus`` is exact UNDER THE FROZEN VOCAB: trigram counts
    under a fixed vocabulary are additive across corpora, so append =
    stored counts + the new corpus's counts, and equals a one-shot
    retrain over the unioned corpus with the same vocab (pinned by
    test via train_kn_lm's ``vocab=`` override).  The vocab itself
    CANNOT be appended — a token the old corpus mapped to <unk> is
    not recoverable from counts — which is also KenLM's contract
    (vocabulary fixed at train time); rebuild to re-cut it.

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
        self,
        spark,
        version: int,
        vocab: DataFrame,
        tri: DataFrame,
        top_n_vocab: int,
        discount: float,
    ) -> None:
        vdir = self._vdir(version)
        vocab.write.mode("overwrite").parquet(f"{vdir}/vocab")
        tri.write.mode("overwrite").parquet(f"{vdir}/tri")
        # scalars derive from the STORED counts (via the one shared
        # _cc_scalars definition) so meta can never disagree with the
        # files it describes
        stored_tri = spark.read.parquet(f"{vdir}/tri")
        tot_cc1, v_eff = _cc_scalars(
            stored_tri.groupBy("b", "c").agg(F.count("*").alias("cc2"))
        )
        from covid19i2b2_spark.fsutil import one_partition_df

        one_partition_df(
            spark,
            [(top_n_vocab, float(discount), tot_cc1, v_eff)],
            "top_n_vocab int, discount double, tot_cc1 long, v_eff long",
        ).write.mode("overwrite").parquet(f"{vdir}/meta")
        self._flip(spark, version)

    def build(
        self,
        spark,
        df: DataFrame,
        text_col: str = "text",
        *,
        top_n_vocab: int = 1000,
        discount: float = 0.75,
    ) -> int:
        """Train from a corpus and write version 1 (or the next
        version, if rebuilding over an existing model — a rebuild
        re-cuts the vocab from the new corpus alone)."""
        if not 0.0 < discount < 1.0:
            raise ValueError(f"discount must be in (0, 1), got {discount}")
        if top_n_vocab < 1:
            raise ValueError(
                f"top_n_vocab must be >= 1, got {top_n_vocab}"
            )
        prev = self.current_version(spark)
        version = 1 if prev is None else prev + 1
        vocab = build_vocab(
            df, text_col, top_n=top_n_vocab, lowercase=False
        ).persist()
        tri = _tri_counts(df, text_col, vocab)
        self._write_version(spark, version, vocab, tri, top_n_vocab, discount)
        vocab.unpersist()
        return version

    def append_corpus(
        self, spark, df: DataFrame, text_col: str = "text"
    ) -> int:
        """Fold a new corpus into the model under the FROZEN vocab —
        exactly equivalent to retraining over (old corpus ∪ new
        corpus) with the stored vocabulary: per-(a,b,c) counts add."""
        v = self._require_version(spark)
        vdir = self._vdir(v)
        meta = spark.read.parquet(f"{vdir}/meta").collect()[0]
        vocab = spark.read.parquet(f"{vdir}/vocab").persist()
        old_tri = spark.read.parquet(f"{vdir}/tri")
        new_tri = _tri_counts(df, text_col, vocab)
        merged = (
            old_tri.unionByName(new_tri)
            .groupBy("a", "b", "c")
            .agg(F.sum("c3").alias("c3"))
        )
        self._write_version(
            spark,
            v + 1,
            vocab,
            merged,
            int(meta["top_n_vocab"]),
            float(meta["discount"]),
        )
        vocab.unpersist()
        return v + 1

    # ---- reads -------------------------------------------------------

    def meta(self, spark) -> dict:
        vdir = self._vdir(self._require_version(spark))
        return spark.read.parquet(f"{vdir}/meta").collect()[0].asDict()

    def load(self, spark) -> KnTrigramLm:
        """The current version as a scorable model: vocab + trigram
        counts off parquet (persisted), the cascades re-derived —
        release with :func:`release_kn_lm` when done."""
        vdir = self._vdir(self._require_version(spark))
        meta = spark.read.parquet(f"{vdir}/meta").collect()[0]
        vocab = spark.read.parquet(f"{vdir}/vocab").persist()
        tri = spark.read.parquet(f"{vdir}/tri").persist()
        return _model_from_tri(
            vocab, tri, float(meta["discount"]), int(meta["top_n_vocab"])
        )


def release_kn_lm(model: KnTrigramLm) -> None:
    """Unpersist the model's cached tables (training persists the
    vocab and all five count tables; callers done scoring release them
    in one call)."""
    for t in (
        model.vocab,
        model.tri,
        model.ctx3,
        model.cc2,
        model.ctx2,
        model.cc1,
    ):
        t.unpersist()
