"""X74: main-content extraction — boilerplate removal by shallow text
features (SURVEY §2.11 extension; round 12).  X30's strip_html keeps
EVERYTHING that isn't markup: nav bars, footers, cookie banners and
related-links rails all land in the training text, and at corpus scale
boilerplate is a top source of duplicated spans (X39 removes the
symptom; this removes the source).  Kohlschütter, Fankhauser & Nejdl,
"Boilerplate Detection using Shallow Text Features", WSDM 2010, showed
two features — a block's word count and its link density, with one
block of context on each side — separate content from boilerplate as
well as heavyweight DOM/visual methods.  This operator implements
their published NumWordsRulesClassifier decision tree verbatim:

    curr_linkDensity <= 0.333333
    | prev_linkDensity <= 0.555556
    | | curr_numWords <= 16
    | | | next_numWords <= 15
    | | | | prev_numWords <= 4  -> BOILERPLATE
    | | | | prev_numWords > 4   -> CONTENT
    | | | next_numWords > 15    -> CONTENT
    | | curr_numWords > 16      -> CONTENT
    | prev_linkDensity > 0.555556
    | | curr_numWords <= 40
    | | | next_numWords <= 17   -> BOILERPLATE
    | | | next_numWords > 17    -> CONTENT
    | | curr_numWords > 40      -> CONTENT
    curr_linkDensity > 0.333333  -> BOILERPLATE

Blocks are the texts between block-level tag boundaries (p/div/li/td/
h1-6/article/nav/...), the paper's segmentation; link density is
anchor-text words / block words.  The first/last block use zeroed
missing-neighbor features (the reference implementation's contract).

Spark shape: the WHOLE operator is one expression tree over arrays —
split to blocks, per-block features via transform (anchor text pulled
with regexp_extract_all before tags are stripped), neighbor context by
index, tree as nested CASE, content blocks filtered and re-joined.
Map-only: no shuffle, no UDF, no explode — a 100 TB corpus pays one
codegen'd pass, and per-row cost is bounded by the document length the
ingest path already bounds.  Like strip_html, malformed markup degrades
toward KEEPING text (a block that fails to split merges into its
neighbor and gains words), never silently dropping the document.

NULL in -> NULL out; a page with no content blocks returns ''
(distinguishable from invalid input, the X33 split).

Parity: a pure-Python reference (same spec implemented twice — the
X67 robots pattern, since the block regex semantics make SQL replay a
duplicate of the plan rather than an independent check) under a
planted page zoo and the documents-table fixture in
tests/test_boilerplate.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from covid19i2b2_spark.operators.text import (
    _HTML_COMMENT,
    _HTML_DROP_BLOCKS,
    _HTML_ENTITIES,
    _HTML_TAG,
)

# the paper's block-level segmentation boundaries (inline tags — a, b,
# i, span, em, strong, ... — deliberately NOT here: they don't end a
# visual block, and anchors must stay inside their block for link
# density to mean anything)
BLOCK_TAGS = (
    "p|div|td|th|li|h[1-6]|article|section|tr|table|ul|ol|header|"
    "footer|nav|aside|blockquote|br|hr|pre|dd|dt|dl|form|fieldset|"
    "figure|figcaption|main|body|html|head|title"
)
_BLOCK_SPLIT = rf"(?i)</?(?:{BLOCK_TAGS})\b[^>]*>"
_ANCHOR = r"(?is)<a\b[^>]*>(.*?)</a>"

# NumWordsRulesClassifier thresholds (Kohlschütter et al., WSDM 2010)
_CURR_LD = 0.333333
_PREV_LD = 0.555556


def _visible(b: Column) -> Column:
    """Inline tags stripped, whitespace collapsed (entities are decoded
    once on the final joined text, not per block)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(b, _HTML_TAG, " "), r"\s+", " ")
    )


def _nwords(t: Column) -> Column:
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def main_content_blocks(col: str | Column) -> Column:
    """``array<struct<text, n_words, link_density, is_content>>`` of
    the page's blocks — the observability form (a corpus report can
    aggregate boilerplate share per host from it)."""
    h = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(
        F.regexp_replace(h, _HTML_DROP_BLOCKS, " "), _HTML_COMMENT, " "
    )
    # two-level transform: level 1 materializes the per-block regex
    # results (visible text, visible anchor text) ONCE into a struct;
    # level 2 derives the counted features from FIELD references.  A
    # single-level lambda re-evaluated _visible's regex chain 3x per
    # block (text, n_words, the density denominator) — the same
    # per-element re-eval trap text.py's char_shingles documents
    # (round-13 ingest profile: ~1.3x on the full-ingest pass).
    vis = F.transform(
        F.split(cleaned, _BLOCK_SPLIT),
        lambda b: F.struct(
            _visible(b).alias("text"),
            _visible(
                F.array_join(
                    F.regexp_extract_all(b, F.lit(_ANCHOR), 1), " "
                )
            ).alias("atext"),
        ),
    )
    counted = F.transform(
        vis,
        lambda s: F.struct(
            s["text"].alias("text"),
            _nwords(s["text"]).alias("n_words"),
            _nwords(s["atext"]).alias("a_words"),
        ),
    )
    feats = F.filter(
        F.transform(
            counted,
            lambda s: F.struct(
                s["text"].alias("text"),
                s["n_words"].alias("n_words"),
                (
                    s["a_words"]
                    / F.greatest(s["n_words"], F.lit(1))
                ).alias("link_density"),
            ),
        ),
        lambda s: s["text"] != "",
    )

    # bind the feats subtree ONCE as a higher-order-function lambda
    # variable: the classifier references its blocks ~10x per index
    # (curr/prev/next fields across the tree's branches), and a direct
    # reference would copy the whole split/transform/filter expression
    # into each — the tree-duplication trap urls.py:85-89 documents
    # (measured here: 45 KB -> ~5 KB of optimized plan for one call)
    def _classify_all(fs: Column) -> Column:
        def _classify(i: Column) -> Column:
            curr = F.element_at(fs, i + 1)
            # missing neighbors read as zero-word, zero-density blocks
            prev_w = F.coalesce(
                F.when(i > 0, F.element_at(fs, i)["n_words"]), F.lit(0)
            )
            prev_ld = F.coalesce(
                F.when(i > 0, F.element_at(fs, i)["link_density"]),
                F.lit(0.0),
            )
            next_w = F.coalesce(
                F.when(
                    i + 2 <= F.size(fs),
                    F.element_at(fs, i + 2)["n_words"],
                ),
                F.lit(0),
            )
            return F.when(
                curr["link_density"] <= _CURR_LD,
                F.when(
                    prev_ld <= _PREV_LD,
                    F.when(
                        curr["n_words"] <= 16,
                        F.when(
                            next_w <= 15,
                            F.when(prev_w <= 4, F.lit(False)).otherwise(
                                F.lit(True)
                            ),
                        ).otherwise(F.lit(True)),
                    ).otherwise(F.lit(True)),
                ).otherwise(
                    F.when(
                        curr["n_words"] <= 40,
                        F.when(next_w <= 17, F.lit(False)).otherwise(
                            F.lit(True)
                        ),
                    ).otherwise(F.lit(True))
                ),
            ).otherwise(F.lit(False))

        idx = F.sequence(
            F.lit(0), F.greatest(F.size(fs) - 1, F.lit(0))
        )
        return F.when(F.size(fs) > 0, F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(fs, i + 1)["text"].alias("text"),
                F.element_at(fs, i + 1)["n_words"].alias("n_words"),
                F.element_at(fs, i + 1)["link_density"].alias(
                    "link_density"
                ),
                _classify(i).alias("is_content"),
            ),
        )).otherwise(F.array().cast(
            "array<struct<text:string,n_words:int,"
            "link_density:double,is_content:boolean>>"
        ))

    classified = F.element_at(
        F.transform(F.array(feats), _classify_all), 1
    )
    return F.when(h.isNotNull(), classified)


def extract_main_content(col: str | Column) -> Column:
    """The page's main text: content blocks joined with newlines,
    entities decoded once at the end.  NULL in -> NULL out; a page
    that is ALL boilerplate returns ''."""
    blocks = main_content_blocks(col)
    joined = F.array_join(
        F.transform(
            F.filter(blocks, lambda s: s["is_content"]),
            lambda s: s["text"],
        ),
        "\n",
    )
    for ent, repl in _HTML_ENTITIES:
        joined = F.replace(joined, F.lit(ent), F.lit(repl))
    return joined
