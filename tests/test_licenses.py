"""X89 license/attribution extraction (operators/licenses.py): the
rel="license" zoo (link and anchor elements, quote styles, token
lists, attribute orders, relative hrefs, entities, first-wins,
non-http(s)), CC badge-href recognition, SPDX-style id normalization,
channel precedence, the collision guard, plan pins, and the X63
provenance composition the operator exists to feed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from covid19i2b2_spark.operators.licenses import (
    cc_href_link,
    cc_license_id,
    extract_licenses,
    rel_license_link,
)

REL_ZOO = [
    # (id, page url, html, expected license url)
    (1, "http://a.com/p",
     "<link rel='license' href='http://a.com/terms'>",
     "http://a.com/terms"),
    (2, "http://a.com/p",
     '<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">CC BY</a>',
     "https://creativecommons.org/licenses/by/4.0/"),
    # rel token list + attribute order free
    (3, "http://a.com/p",
     "<a href='/lic' rel='license nofollow'>terms</a>",
     "http://a.com/lic"),
    (4, "http://a.com/p",
     "<a rel='nofollow license' href='/lic2'>terms</a>",
     "http://a.com/lic2"),
    # bare rel value, bare href
    (5, "http://a.com/p", "<link rel=license href=/bare>",
     "http://a.com/bare"),
    # relative resolution against a directory URL
    (6, "http://a.com/dir/page",
     "<link rel='license' href='../terms'>", "http://a.com/terms"),
    # entities decode before resolution
    (7, "http://a.com/p",
     "<link rel='license' href='/t?a=1&amp;b=2'>",
     "http://a.com/t?a=1&b=2"),
    # first declaration wins
    (8, "http://a.com/p",
     "<link rel='license' href='/first'><a rel='license' href='/second'>x</a>",
     "http://a.com/first"),
    # 'licenses' is a DIFFERENT token; substring must not match
    (9, "http://a.com/p", "<link rel='licenses' href='/no'>", None),
    (10, "http://a.com/p", "<a href='/no'>no rel</a>", None),
    # hyphenated rel tokens are different tokens too (review r14:
    # \b would treat '-' as a boundary and match these)
    (14, "http://a.com/p",
     "<a rel='license-info nofollow' href='/no'>x</a>", None),
    (15, "http://a.com/p", "<link rel='my-license' href='/no'>", None),
    # first-declaration-wins across QUOTE STYLES (review r14: the
    # quoted-pattern-first form returned the LATER quoted declaration
    # over an earlier bare one)
    (16, "http://a.com/p",
     "<a rel=license href=/bare-first>x</a>"
     "<link rel='license' href='/quoted-second'>",
     "http://a.com/bare-first"),
    # hyphen-prefixed attributes must not shadow the real href
    # (review r15: \bhref treats '-' as a boundary, so data-href='/x'
    # would win over the actual href='/y')
    (17, "http://a.com/p",
     "<a rel='license' data-href='/x' href='/y'>x</a>",
     "http://a.com/y"),
    (11, "http://a.com/p", None, None),
    # non-http(s) resolution -> NULL
    (12, "http://a.com/p",
     "<link rel='license' href='javascript:void(0)'>", None),
    # case-insensitive element/attr names
    (13, "http://a.com/p",
     "<LINK REL='LICENSE' HREF='HTTP://a.com/T'>", "HTTP://a.com/T"),
]


def test_rel_license_zoo(spark):
    df = spark.createDataFrame(
        [(i, u, h) for i, u, h, _ in REL_ZOO],
        "id long, url string, html string",
    )
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", rel_license_link("html", "url").alias("c")
        ).collect()
    }
    for i, _, _, want in REL_ZOO:
        assert got[i] == want, (i, got[i], want)


CC_ID_ZOO = [
    ("https://creativecommons.org/licenses/by/4.0/", "CC-BY-4.0"),
    ("http://creativecommons.org/licenses/by-sa/3.0/", "CC-BY-SA-3.0"),
    ("https://www.creativecommons.org/licenses/by-nc-nd/2.5/deed.en",
     "CC-BY-NC-ND-2.5"),
    ("https://creativecommons.org/publicdomain/zero/1.0/", "CC0-1.0"),
    ("https://creativecommons.org/publicdomain/mark/1.0/", "CC-PDM-1.0"),
    ("http://a.com/my-own-terms", None),
    (None, None),
]


def test_cc_license_id_normalization(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CC_ID_ZOO)],
        "id long, url string",
    )
    got = {
        r["id"]: r["lic"]
        for r in df.select(
            "id", cc_license_id("url").alias("lic")
        ).collect()
    }
    for i, (_, want) in enumerate(CC_ID_ZOO):
        assert got[i] == want, (i, got[i], want)


def test_cc_href_badge_recognition(spark):
    df = spark.createDataFrame(
        [
            (1, "<a href='https://creativecommons.org/licenses/by/4.0/'>"
                "<img src='badge.png'></a>"),
            (2, "<a href=\"http://other.com\">x</a>"),
            # entity-encoded href decodes
            (3, "<a href='https://creativecommons.org/licenses/by/4.0/"
                "?ref=x&amp;y=1'>b</a>"),
            (4, None),
        ],
        "id long, html string",
    )
    got = {
        r["id"]: r["c"]
        for r in df.select("id", cc_href_link("html").alias("c")).collect()
    }
    assert got[1] == "https://creativecommons.org/licenses/by/4.0/"
    assert got[2] is None
    assert got[3] == (
        "https://creativecommons.org/licenses/by/4.0/?ref=x&y=1"
    )
    assert got[4] is None


def test_extract_licenses_channel_precedence(spark):
    pages = spark.createDataFrame(
        [
            # rel declaration outranks the badge href
            (1, "http://a.com/p",
             "<link rel='license' href='/my-terms'>"
             "<a href='https://creativecommons.org/licenses/by/4.0/'>b</a>"),
            # badge only
            (2, "http://a.com/p",
             "<a href='https://creativecommons.org/publicdomain/zero/1.0/'>z</a>"),
            # rel declaration pointing AT a CC URL: id from the rel URL
            (3, "http://a.com/p",
             "<a rel='license' href='https://creativecommons.org/licenses/by-sa/4.0/'>c</a>"),
            (4, "http://a.com/p", "<p>plain page</p>"),
        ],
        "id long, url string, html string",
    )
    got = {
        r["id"]: (r["license_url"], r["license_source"], r["license_id"])
        for r in extract_licenses(pages).collect()
    }
    assert got[1] == ("http://a.com/my-terms", "rel", None)
    assert got[2] == (
        "https://creativecommons.org/publicdomain/zero/1.0/",
        "cc-href",
        "CC0-1.0",
    )
    assert got[3] == (
        "https://creativecommons.org/licenses/by-sa/4.0/",
        "rel",
        "CC-BY-SA-4.0",
    )
    assert got[4] == (None, None, None)


def test_extract_licenses_collision_is_loud(spark):
    pages = spark.createDataFrame(
        [(1, "http://a.com/p", "<p>x</p>", "CC-BY-4.0")],
        "id long, url string, html string, license_id string",
    )
    with pytest.raises(ValueError, match="already exist"):
        extract_licenses(pages)


def test_feeds_survivor_provenance(spark):
    """The operator's reason to exist: license ids ride X63's
    collect_cols so a dedup survivor carries the UNION of its
    cluster's license obligations."""
    from covid19i2b2_spark.operators.dedup_clusters import (
        survivor_provenance,
    )

    pages = spark.createDataFrame(
        [
            (1, "http://a.com/1",
             "<a rel='license' href='https://creativecommons.org/licenses/by/4.0/'>c</a>"),
            (2, "http://b.com/2",
             "<a rel='license' href='https://creativecommons.org/licenses/by-sa/4.0/'>c</a>"),
            (3, "http://c.com/3", "<p>none</p>"),
        ],
        "id long, url string, html string",
    )
    lic = extract_licenses(pages)
    decision = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 3, True)],
        "id long, component long, keep boolean",
    )
    prov = {
        r["component"]: r["license_id_set"]
        for r in survivor_provenance(
            lic, decision, "id", collect_cols=["license_id"]
        ).collect()
    }
    assert prov[1] == ["CC-BY-4.0", "CC-BY-SA-4.0"]
    assert prov[3] == []


def test_plan_is_map_only_and_bounded(spark):
    from covid19i2b2_spark.plans import physical_plan

    pages = spark.createDataFrame(
        [(1, "http://a.com/p", "<p>x</p>")],
        "id long, url string, html string",
    )
    plan = physical_plan(extract_licenses(pages))
    assert "Exchange" not in plan
    # the links.py LESSON: staged columns keep the tree bounded
    assert len(plan) < 200_000, len(plan)
