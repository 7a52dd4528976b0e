"""X69: HTML link extraction + RFC 3986 reference resolution (round
12) — the PRODUCER of the whole crawl chain's input.  Everything
downstream already exists (X55 canonicalize/dedup → X64 anchor texts →
X56 host PageRank → X61 schedule → X61'' streaming frontier), but the
(src, href, anchor) edges those operators consume had no in-engine
source: crawl results are HTML, and hrefs in HTML are mostly RELATIVE.
A driver loop over 10^9 pages is the banned collect() shape, so both
steps are pure column expressions.

``resolve_url`` implements RFC 3986 §5 reference resolution (matching
urllib.parse.urljoin where the RFC and the stdlib agree, pinned by a
hypothesis property):

- a ref with its own scheme AND authority is rebuilt with §5.2.4
  remove-dot-segments on its path (RFC §5.2.2 runs it for EVERY
  target — skipping it would hand the downstream canonicalizer two
  spellings of one resource, since X55 never resolves ``/../``;
  review r12 pass 3); a scheme-only opaque ref (``mailto:``) is
  verbatim;
- protocol-relative ``//host/p`` inherits the base scheme, same
  dot-segment treatment;
- root-relative, query-only, empty, and relative refs merge with the
  base per §5.3; remove-dot-segments runs as ONE F.aggregate fold
  over the split path (``..`` pops, ``.`` skips, ``..`` at root is a
  no-op, a trailing ``/.`` or ``/..`` keeps the trailing slash);
- TWO documented divergences from urllib.parse.urljoin, both toward
  the RFC: empty path segments (``a//b``) are PRESERVED per
  RFC/WHATWG (the stdlib collapses them), and dot segments in
  authority-bearing refs are removed (the stdlib keeps them);
- the ref's fragment is dropped before resolution (never sent to the
  server; the frontier keys on resources), DOTALL so an embedded
  newline can't smuggle one through.

``extract_links`` pulls ``<a ... href=...>anchor</a>`` blocks with one
regexp_extract_all body pass (the X68 single-scan rule), decodes the
five XML entities in hrefs (``&amp;`` inside query strings is the norm
in HTML), honors a ``<base href>`` when present (itself resolved
against the page URL per the HTML spec), resolves every href, and
keeps http(s) results only — javascript:/mailto:/tel: links carry no
crawl evidence.  Anchor text is the block's inner text with tags
stripped, entities decoded, and whitespace collapsed — the exact shape
X64 top_anchor_texts consumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from covid19i2b2_spark.operators.robots import _xml_unescape

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def _let(val: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``val`` ONCE and feed it
    to ``body`` as a lambda variable (single-element transform).  A
    Column helper that references its argument N times otherwise
    inlines the argument's whole tree N times — and through nested
    helpers the duplication compounds exponentially (the round-13
    links-staging trap; q_license_extract's pre-fix physical plan
    carried one ~50 KB Project expression).  Catalyst cannot undo the
    duplication (CollapseProject only guards adjacent projections, and
    codegen subexpression elimination does not cross lazily-evaluated
    CASE branches), so the builder must not create it (guide §1.2
    step 2: per-task work; the same convention extract_links applies
    via withColumn staging)."""
    return F.element_at(F.transform(F.array(val), body), 1)


def _remove_dot_segments(p0: Column) -> Column:
    """RFC 3986 §5.2.4 over an ABSOLUTE path (leading '/'): one
    aggregate fold — '..' pops (a no-op at root), '.' skips, empty
    segments are real segments (preserved), and a trailing '/.' or
    '/..' keeps the directory's trailing slash.

    Both the input path and the folded join are let-bound: each is
    referenced 2-3 times below, and ``p0`` is typically itself a
    merge/extract expression at every call site."""

    def _fold(p: Column) -> Column:
        folded = F.aggregate(
            F.split(p, "/"),
            F.slice(F.array(F.lit("")), 1, 0),  # empty array<string>
            lambda acc, s: F.when(s == ".", acc)
            .when(
                s == "..",
                F.when(
                    F.size(acc) > 1,
                    F.slice(acc, 1, F.size(acc) - 1),
                ).otherwise(acc),
            )
            .otherwise(F.concat(acc, F.array(s))),
        )

        def _finish(joined: Column) -> Column:
            ends_dir = p.rlike(r"(^|/)\.\.?$")
            slashed = F.when(
                ends_dir & ~joined.endswith("/"),
                F.concat(joined, F.lit("/")),
            ).otherwise(joined)
            return _let(
                slashed,
                lambda j: F.when(j == "", F.lit("/")).otherwise(j),
            )

        return _let(F.array_join(folded, "/"), _finish)

    return _let(p0, _fold)


def resolve_url(base: Column | str, ref: Column | str) -> Column:
    """The absolute URL of reference ``ref`` against ``base`` (an
    absolute http(s) URL — crawl page URLs by construction).  NULL
    inputs resolve to NULL.  See the module docstring for the exact
    RFC 3986 §5 semantics and the one documented urljoin divergence.

    Every multiply-referenced piece (the de-fragmented ref, the
    base/ref component extracts, the cleaned authority path, the base
    directory) is let-bound via :func:`_let`, so the returned CASE
    tree is LINEAR in the number of branches instead of exponential
    in helper nesting (round 15; same values, same branch order)."""
    b0 = F.col(base) if isinstance(base, str) else base
    ref0 = F.col(ref) if isinstance(ref, str) else ref

    def _with_b(b: Column) -> Column:
        return _let(F.trim(ref0), lambda r0: _with_r0(b, r0))

    def _with_r0(b: Column, r0: Column) -> Column:
        # fragments never resolve; (?s) because an embedded newline
        # must not smuggle one through (review r12 pass 3)
        return _let(
            F.regexp_replace(r0, r"(?s)#.*", ""),
            lambda r: _with_r(b, r0, r),
        )

    def _with_r(b: Column, r0: Column, r: Column) -> Column:
        # every component extract, computed exactly once per row
        parts = F.struct(
            F.regexp_replace(b, r"(?s)#.*", "").alias("b_nofrag"),
            F.lower(
                F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
            ).alias("b_scheme"),
            F.regexp_extract(
                b, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1
            ).alias("b_auth"),
            F.regexp_extract(
                b, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1
            ).alias("b_path"),
            F.regexp_extract(r, r"(?s)^([^?]*)", 1).alias("rp"),
            F.regexp_extract(r, r"(?s)(\?.*)$", 1).alias("rq"),
            F.regexp_extract(
                r, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1
            ).alias("r_scheme"),
            F.regexp_extract(
                r, r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//([^/?#]*)", 1
            ).alias("na"),
            F.regexp_extract(
                r,
                r"(?s)^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?//[^/?#]*([^?#]*)",
                1,
            ).alias("np"),
        )
        return _let(parts, lambda s: _with_parts(b, r0, r, s))

    def _with_parts(b: Column, r0: Column, r: Column, s: Column) -> Column:
        # authority-bearing refs (own scheme://, or protocol-relative):
        # rebuilt with dot segments removed (§5.2.2 — an empty path
        # stays empty, never "/")
        np_clean = F.when(s["np"] == "", F.lit("")).otherwise(
            _remove_dot_segments(s["np"])
        )
        # relative merge (§5.3): the base directory is the path up to
        # its last '/', or root when the base path is empty/slash-less
        b_dir = _let(
            F.regexp_extract(s["b_path"], r"^(.*/)", 1),
            lambda d: F.when(d == "", F.lit("/")).otherwise(d),
        )
        return _let(
            np_clean,
            lambda npc: _let(
                b_dir, lambda bd: _branches(b, r0, r, s, npc, bd)
            ),
        )

    def _branches(
        b: Column, r0: Column, r: Column, s: Column, npc: Column, bd: Column
    ) -> Column:
        prefix = F.concat(s["b_scheme"], F.lit("://"), s["b_auth"])
        r_netloc = r.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
        return F.when(
            r0.isNull() | b.isNull(), F.lit(None).cast("string")
        ).when(r == "", s["b_nofrag"]).when(
            r_netloc,
            F.concat(s["r_scheme"], F.lit("://"), s["na"], npc, s["rq"]),
        ).when(
            r.rlike(_SCHEME_RE), r                  # opaque (mailto:)
        ).when(
            r.startswith("//"),
            F.concat(s["b_scheme"], F.lit("://"), s["na"], npc, s["rq"]),
        ).when(
            s["rp"].startswith("/"),
            F.concat(prefix, _remove_dot_segments(s["rp"]), s["rq"]),
        ).when(
            s["rp"] == "",
            F.concat(prefix, s["b_path"], s["rq"]),  # query-only ref
        ).otherwise(
            F.concat(
                prefix,
                _remove_dot_segments(F.concat(bd, s["rp"])),
                s["rq"],
            )
        )

    return _let(b0, _with_b)


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src, href, anchor_text): one row per ``<a href>`` in each
    page, hrefs resolved to ABSOLUTE http(s) URLs (everything else —
    javascript:, mailto:, unresolvable garbage — carries no crawl
    evidence and is dropped; pages with no links emit nothing).
    ``src`` is the page URL as given.  Output feeds url_dedup /
    SeenUrlSet (href), top_anchor_texts (anchor_text), and the
    prioritize_and_schedule links frame."""
    # attribute-aware tag body: quoted values may contain '>' (a bare
    # [^>]* would truncate at title="a>b" and corrupt everything after
    # — review r12 pass 3)
    attrs = r"""(?:[^>"']|"[^"]*"|'[^']*')*"""
    # href must be preceded by whitespace or a quote — 'data-href' /
    # 'xlink:href' must never shadow the real attribute
    href_pat = r"""[\s"']href\s*=\s*"""
    dq_pat = f"(?is){href_pat}\"([^\"]*)\""
    sq_pat = f"(?is){href_pat}'([^']*)'"
    bare_pat = f"""(?is){href_pat}([^\\s"'>][^\\s>]*)"""

    def _href_from(tag_col):
        dq = F.regexp_extract(tag_col, dq_pat, 1)
        sq = F.regexp_extract(tag_col, sq_pat, 1)
        bare = F.regexp_extract(tag_col, bare_pat, 1)
        # presence is tested on the WHOLE match, not the captured
        # value: href="" is a real (self-)reference, not a miss
        raw = (
            F.when(F.regexp_extract(tag_col, dq_pat, 0) != "", dq)
            .when(F.regexp_extract(tag_col, sq_pat, 0) != "", sq)
            .when(bare != "", bare)
        )
        # the HTML spec strips tab/CR/LF anywhere in URL attribute
        # values (formatted markup wraps long hrefs across lines)
        return _xml_unescape(F.regexp_replace(raw, r"[\t\r\n]", ""))

    # The effective base is computed PER PAGE before the explode, so
    # the full HTML never rides along one-copy-per-link — and every
    # multiply-referenced expensive expression is materialized as a
    # COLUMN in its own projection first (the round-11 duplication
    # convention: CollapseProject will not merge a projection whose
    # output is referenced more than once unless it is cheap).  The
    # round-13 profile of the r12 shape found the <base> FULL-HTML
    # regex re-inlined through _href_from (6 refs) and then through
    # resolve_url's ~10 ref uses — ~60 whole-document regex scans per
    # page, 6.4 s of the 6.8 s links pass at the 140 MB bench corpus;
    # staged, the same pass runs in ~1 s.
    base_page = (
        pages.select(
            F.col(url_col).alias("src"),
            F.col(html_col).alias("__html"),
            # ONE whole-document regex: the <base> tag
            F.regexp_extract(
                F.col(html_col), f"(?is)(<base\\s{attrs}>)", 1
            ).alias("__bt"),
        )
        # short-string regexes over the materialized tag
        .withColumn("__braw", _href_from(F.col("__bt")))
        .withColumn(
            "__base",
            F.when(
                F.col("__braw").isNotNull() & (F.col("__braw") != ""),
                resolve_url(F.col("src"), F.col("__braw")),
            ).otherwise(F.col("src")),
        )
    )
    # block = open tag + inner text up to the nearest close, TEMPERED:
    # the inner part must not contain another '<a' — an unclosed
    # anchor then loses only itself, never its next valid sibling
    block_pat = f"(?is)<a\\s{attrs}>(?:(?!<a[\\s>]).)*?</a>"
    blocks = base_page.select(
        "src",
        "__base",
        F.explode(
            F.regexp_extract_all(
                F.col("__html"), F.lit(block_pat), F.lit(0)
            )
        ).alias("__a"),
    ).withColumn(
        "__ot", F.regexp_extract("__a", f"(?is)^(<a\\s{attrs}>)", 1)
    )
    anchor = F.regexp_replace(
        # inner text = the block minus its open tag and closing </a>
        F.regexp_replace(
            F.col("__a").substr(
                F.length("__ot") + 1,
                F.length("__a") - F.length("__ot"),
            ),
            r"(?is)</a>$",
            "",
        ),
        r"(?s)<[^>]*>",
        " ",
    )
    anchor = F.trim(
        F.regexp_replace(_xml_unescape(anchor), r"\s+", " ")
    )
    return (
        # __href materializes the cleaned value as a COLUMN first —
        # resolve_url references its ref ~10x, and each reference
        # would otherwise copy the whole extract/unescape tree into
        # codegen (the round-11 duplication convention)
        blocks.withColumn("__href", _href_from(F.col("__ot")))
        .withColumn("__anchor", anchor)
        .withColumn("href", resolve_url(F.col("__base"), F.col("__href")))
        # prefix comparisons, not rlike: same semantics as
        # '(?i)^https?://' with codegen'd compares instead of a regex
        # match per anchor (one quiet-window read: +0.2 s for the
        # regex at the 64 MB x1 corpus; within noise on the loaded
        # box, kept because it is strictly simpler)
        .filter(
            (F.lower(F.substring("href", 1, 7)) == "http://")
            | (F.lower(F.substring("href", 1, 8)) == "https://")
        )
        .select("src", "href", F.col("__anchor").alias("anchor_text"))
    )
