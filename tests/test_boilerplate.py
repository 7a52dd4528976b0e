"""X74 boilerplate removal (operators/boilerplate.py): the
NumWordsRules tree against a planted page zoo (every branch hit), a
pure-Python same-spec reference over a generated page corpus (the X67
robots pattern), NULL/empty/all-boilerplate contracts, and the
map-only no-Python plan pin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.boilerplate import (
    BLOCK_TAGS,
    extract_main_content,
    main_content_blocks,
)

LONG = " ".join(f"word{i}" for i in range(30))  # 30 words > 16
MID = " ".join(f"w{i}" for i in range(10))  # 10 words
NAV = '<a href="/">Home</a> <a href="/x">News</a> <a href="/y">Shop</a>'


# ---------------------------------------------------------------- python ref
_BLOCK_RE = re.compile(rf"(?i)</?(?:{BLOCK_TAGS})\b[^>]*>")
_TAG_RE = re.compile(r"(?is)</?[a-z][^>]*>")
_ANCHOR_RE = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
_DROP_RE = re.compile(r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")


def _vis(s: str) -> str:
    return re.sub(r"\s+", " ", _TAG_RE.sub(" ", s)).strip()


def _nw(t: str) -> int:
    return len(t.split()) if t else 0


def _py_blocks(html: str):
    cleaned = _COMMENT_RE.sub(" ", _DROP_RE.sub(" ", html))
    feats = []
    for b in _BLOCK_RE.split(cleaned):
        text = _vis(b)
        if not text:
            continue
        aw = _nw(_vis(" ".join(_ANCHOR_RE.findall(b))))
        feats.append((text, _nw(text), aw / max(_nw(text), 1)))
    out = []
    for i, (text, nw, ld) in enumerate(feats):
        pw, pld = (feats[i - 1][1], feats[i - 1][2]) if i > 0 else (0, 0.0)
        nxw = feats[i + 1][1] if i + 1 < len(feats) else 0
        if ld <= 0.333333:
            if pld <= 0.555556:
                if nw <= 16:
                    content = (nxw > 15) or (pw > 4)
                else:
                    content = True
            else:
                content = nw > 40 or nxw > 17
        else:
            content = False
        out.append((text, content))
    return out


def _py_main(html: str) -> str:
    return "\n".join(t for t, c in _py_blocks(html) if c)


def _run(spark, pages):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "id long, html string"
    )
    return {
        r["id"]: r["main"]
        for r in df.select(
            "id", extract_main_content("html").alias("main")
        ).collect()
    }


def test_article_kept_nav_and_footer_dropped(spark):
    page = (
        f"<html><body><nav>{NAV}</nav>"
        f"<article><p>{LONG}</p><p>{LONG} extra</p></article>"
        f"<footer><a href='/tos'>Terms</a> <a href='/p'>Privacy</a>"
        f"</footer></body></html>"
    )
    got = _run(spark, [page])[0]
    assert got == f"{LONG}\n{LONG} extra"


def test_tree_branches(spark):
    # dense-link block -> boilerplate regardless of words; the block
    # after it sits under prev_ld > 0.5556 with no next, so it needs
    # > 40 words to survive (the tree's wordy-after-nav branch)
    huge = " ".join(f"word{i}" for i in range(45))
    linky = f"<p><a href='/'>{MID}</a> also</p><p>{huge}</p>"
    got = _run(spark, [linky])[0]
    assert got == huge
    # ... and the 30-word version is NOT enough after a dense prev
    linky30 = f"<p><a href='/'>{MID}</a> also</p><p>{LONG}</p>"
    assert _run(spark, [linky30])[0] == ""
    # short block rescued by a wordy next block (next_numWords > 15)
    rescue = f"<p>{MID}</p><p>{LONG}</p>"
    assert _run(spark, [rescue])[0] == f"{MID}\n{LONG}"
    # short block with short neighbors and tiny prev -> dropped
    lonely = f"<p>{MID}</p>"
    assert _run(spark, [lonely])[0] == ""
    # prev link-dense (pure nav, ld=1.0): need > 40 words or wordy next
    after_nav = f"<p>{NAV}</p><p>{MID} tail</p>"
    assert _run(spark, [after_nav])[0] == ""
    # ...but a HALF-link prev (ld=0.5 <= 0.5556) rescues the same block
    # via prev_numWords > 4
    half_nav = f"<p>{NAV} pad pad pad</p><p>{MID} tail</p>"
    assert _run(spark, [half_nav])[0] == f"{MID} tail"


def test_null_empty_and_entities(spark):
    got = _run(spark, [None, "", f"<p>{LONG} &amp; more &lt;3</p>"])
    assert got[0] is None
    assert got[1] == ""
    assert got[2] == f"{LONG} & more <3"


def test_script_style_comments_never_content(spark):
    page = (
        f"<script>var x = 'not {LONG}';</script>"
        f"<style>p {{ color: red }}</style>"
        f"<!-- {LONG} -->"
        f"<p>{LONG}</p>"
    )
    assert _run(spark, [page])[0] == LONG


def test_matches_python_reference_on_generated_corpus(spark):
    """Same spec implemented twice: 60 deterministic pages mixing nav
    rails, articles, comment sections, tables and malformed markup."""
    pages = []
    for i in range(60):
        words = " ".join(f"t{i}_{j}" for j in range(5 + (i * 7) % 50))
        parts = [f"<div class=nav>{NAV}</div>"] * (i % 3)
        parts.append(f"<h1>Title {i}</h1>")
        parts.append(f"<p>{words}</p>")
        if i % 2:
            parts.append(f"<p>{words} {words}</p>")
        if i % 4 == 1:
            parts.append("<ul>" + "".join(
                f"<li><a href='/{j}'>link {j}</a></li>" for j in range(4)
            ) + "</ul>")
        if i % 5 == 2:
            parts.append(f"<td>{words}<p>unclosed")
        if i % 7 == 3:
            parts.append(f"<P CLASS='X'>{words.upper()}</P>")
        pages.append("".join(parts))
    got = _run(spark, pages)
    for i, p in enumerate(pages):
        assert got[i] == _py_main(p), (i, p)


def test_blocks_observability(spark):
    huge = " ".join(f"word{i}" for i in range(45))  # >40: survives nav prev
    page = f"<nav>{NAV}</nav><p>{huge}</p>"
    df = spark.createDataFrame([(page,)], "html string")
    rows = df.select(
        F.explode(main_content_blocks("html")).alias("b")
    ).select("b.*").collect()
    assert [r["is_content"] for r in rows] == [False, True]
    assert rows[0]["link_density"] > 0.9
    assert rows[1]["n_words"] == 45


def test_plan_is_map_only_expressions(spark):
    from covid19i2b2_spark.plans import physical_plan

    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = physical_plan(df.select(extract_main_content("html")))
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan.split("== Physical Plan ==")[-1]
    # the feats subtree is bound ONCE via a HOF lambda variable; a
    # direct reference copied it into every element_at — 45 KB of
    # optimized plan for one call (the urls.py tree-duplication trap)
    opt = (
        df.select(extract_main_content("html"))
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert len(opt) < 15_000, len(opt)
