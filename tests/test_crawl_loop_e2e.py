"""Round-12 integration: the WHOLE crawl loop from archive bytes to a
fetch schedule, in-engine — WARC (X75) → pages/documents/links (X76 /
X74 / X69) → page-level robots enforcement (X77) → redirect resolution
(X82) → rel=canonical (X83) → alias unification (X84 over X78) →
prioritize_and_schedule with trap exclusion (X61'/X70).  One planted
mini-web with every hazard; every stage's effect asserted on the final
artifacts."""

from __future__ import annotations

from pyspark.sql import functions as F

from covid19i2b2_spark.operators.redirects import (
    redirect_edges,
    resolve_redirects,
)
from covid19i2b2_spark.operators.robots_meta import apply_page_directives
from covid19i2b2_spark.operators.url_aliases import (
    canonical_edges,
    unify_aliases,
)
from covid19i2b2_spark.pipelines.crawl import prioritize_and_schedule
from covid19i2b2_spark.pipelines.fetch import warc_pages, warc_to_documents
from covid19i2b2_spark.sources.warc import read_warc
from tests.test_warc import _http, _record

ART = " ".join(f"alpha{i}" for i in range(30))
NEWS = " ".join(f"beta{i}" for i in range(25))


def _page(body_html: str) -> bytes:
    return _http(body_html.encode())


def _mini_web(tmp_path) -> str:
    d = tmp_path / "web"
    d.mkdir()
    recs = []
    # site.com/a: article linking /b, a printable alias, and a trap
    recs.append(_record("response", _page(
        f"<p>{ART}</p><a href='/b'>b</a>"
        f"<a href='/a?print=1'>print</a>"
        f"<a href='/loop/x/y/x/y/x'>loop</a>"
    ), uri="http://site.com/a", rid="<urn:uuid:a>"))
    # /a?print=1 declares /a as canonical (X83 alias evidence)
    recs.append(_record("response", _page(
        f"<link rel='canonical' href='/a'><p>{ART}</p>"
    ), uri="http://site.com/a?print=1", rid="<urn:uuid:ap>"))
    # /b: news page linking the moved /old
    recs.append(_record("response", _page(
        f"<p>{NEWS}</p><a href='http://site.com/old'>old</a>"
    ), uri="http://site.com/b", rid="<urn:uuid:b>"))
    # /old 301s to /new (X82 alias evidence)
    recs.append(_record("response",
        b"HTTP/1.1 301 Moved\r\nLocation: /new\r\nContent-Length: 0\r\n\r\n",
        uri="http://site.com/old", rid="<urn:uuid:old>"))
    # /new: the moved page
    recs.append(_record("response", _page(
        f"<p>{NEWS} relocated edition</p>"
    ), uri="http://site.com/new", rid="<urn:uuid:new>"))
    # /secret: noindex'd page whose LINK still counts (X77 semantics)
    recs.append(_record("response", _page(
        f"<meta name='robots' content='noindex'>"
        f"<p>{ART} secret</p><a href='http://peer.com/p'>peer</a>"
    ), uri="http://site.com/secret", rid="<urn:uuid:s>"))
    # peer.com/p: second host
    recs.append(_record("response", _page(
        f"<p>{NEWS} peer</p>"
    ), uri="http://peer.com/p", rid="<urn:uuid:p>"))
    (d / "web.warc").write_bytes(b"".join(recs))
    return str(d)


def test_full_loop(spark, tmp_path):
    path = _mini_web(tmp_path)
    recs = read_warc(spark, path)
    pages = warc_pages(spark, path)
    documents, links = warc_to_documents(spark, path)

    # X77: noindex'd document drops, its outgoing link survives
    documents, links = apply_page_directives(pages, documents, links)
    doc_urls = {r["url"] for r in documents.select("url").collect()}
    assert "http://site.com/secret" not in doc_urls
    assert "http://site.com/a" in doc_urls
    link_pairs = {(r["src"], r["href"]) for r in links.collect()}
    assert ("http://site.com/secret", "http://peer.com/p") in link_pairs

    # X82 + X83 + X84: /old→/new and /a?print=1→/a collapse
    redir = resolve_redirects(redirect_edges(recs)).filter("resolved")
    aliases = unify_aliases([
        redir.select(F.col("src"), F.col("final_url").alias("dst")),
        canonical_edges(pages),
    ])
    ids = {r["url"]: r["canonical_id"] for r in aliases.collect()}
    assert ids["http://site.com/old"] == ids["http://site.com/new"]
    assert ids["http://site.com/a?print=1"] == "http://site.com/a"

    # frontier: discovered URLs = link targets + fetched pages,
    # relabeled through the alias identity before scheduling
    discovered = (
        links.select(F.col("href").alias("url"))
        .unionByName(pages.select("url"))
        .distinct()
        .join(aliases, "url", "left")
        .select(
            F.coalesce("canonical_id", "url").alias("url")
        )
        .distinct()
        .withColumn("url_id", F.xxhash64("url"))
    )
    id_of = {
        r["url"]: r["url_id"] for r in discovered.collect()
    }
    # the alias collapse happened BEFORE scheduling
    assert "http://site.com/old" not in id_of
    assert "http://site.com/a?print=1" not in id_of

    edge_ids = links.select(
        F.xxhash64("src").alias("src_id"), F.xxhash64("href").alias("dst_id")
    )
    schedule = prioritize_and_schedule(
        discovered,
        edge_ids,
        per_host_per_round=2,
        exclude_traps=True,
    )
    rows = {r["url"]: r for r in schedule.collect()}

    # X70 through the pipeline: the loop trap never gets a round
    trap = rows["http://site.com/loop/x/y/x/y/x"]
    assert trap["crawl_round"] is None
    # real pages are scheduled with politeness caps per host
    assert rows["http://site.com/a"]["crawl_round"] is not None
    assert rows["http://peer.com/p"]["crawl_round"] is not None
    per_round = (
        schedule.filter("crawl_round IS NOT NULL")
        .groupBy("host", "crawl_round")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_round <= 2
