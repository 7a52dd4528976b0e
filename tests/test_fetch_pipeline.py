"""X76 fetch-to-documents pipeline (pipelines/fetch.py): WARC fixture
through the full chain — page filtering by peeled HTTP columns,
boilerplate-stripped text, link edges, charset handling (default cast
vs opt-in sniff: BOM > header > meta > utf-8 fallback), and the
all-boilerplate-keeps-its-row contract."""

from __future__ import annotations

import gzip

from covid19i2b2_spark.pipelines.fetch import (
    _sniff_and_decode,
    warc_to_documents,
)
from tests.test_warc import _http, _record

ARTICLE = " ".join(f"word{i}" for i in range(30))
PAGE = (
    f"<html><body><nav><a href='/a'>A</a> <a href='/b'>B</a></nav>"
    f"<p>{ARTICLE}</p><p>{ARTICLE} more</p>"
    f"<a href='http://peer.com/x'>peer link</a></body></html>"
).encode()
NAV_ONLY = (
    b"<html><body><nav><a href='/a'>A</a> <a href='/b'>B</a></nav>"
    b"</body></html>"
)


def _write(tmp_path) -> str:
    d = tmp_path / "warc"
    d.mkdir()
    blob = (
        _record("warcinfo", b"software: t\r\n")
        + _record("response", _http(PAGE), uri="http://site.com/art",
                  rid="<urn:uuid:10>")
        + _record("response", _http(NAV_ONLY),
                  uri="http://site.com/navonly", rid="<urn:uuid:11>")
        + _record("response", _http(b"nope", status=404),
                  uri="http://site.com/missing", rid="<urn:uuid:12>")
        + _record("response", _http(b"{}", ctype="application/json"),
                  uri="http://site.com/api", rid="<urn:uuid:13>")
        + _record("request", b"GET / HTTP/1.1\r\n",
                  uri="http://site.com/art")
    )
    (d / "f.warc").write_bytes(blob)
    return str(d)


def test_documents_and_links(spark, tmp_path):
    docs_df, links_df = warc_to_documents(spark, _write(tmp_path))
    docs = {r["url"]: r for r in docs_df.collect()}
    # 404, non-html and request records never become documents
    assert set(docs) == {"http://site.com/art", "http://site.com/navonly"}
    art = docs["http://site.com/art"]
    assert art["canonical_url"] == "http://site.com/art"
    assert art["fetched_at"] == "2026-08-16T00:00:00Z"
    # nav dropped, article paragraphs kept (inline anchor text of the
    # trailing link block is boilerplate by link density)
    assert art["text"] == f"{ARTICLE}\n{ARTICLE} more"
    # all-boilerplate page keeps its row with text='' (corpus policy
    # decides dropping, not ingest)
    assert docs["http://site.com/navonly"]["text"] == ""
    links = {
        (r["src"], r["href"]) for r in links_df.collect()
    }
    assert ("http://site.com/art", "http://site.com/a") in links
    assert ("http://site.com/art", "http://peer.com/x") in links
    assert ("http://site.com/navonly", "http://site.com/b") in links


def test_gzip_end_to_end(spark, tmp_path):
    d = tmp_path / "gz"
    d.mkdir()
    blob = gzip.compress(
        _record("response", _http(PAGE), uri="http://site.com/art")
    )
    (d / "f.warc.gz").write_bytes(blob)
    docs_df, _ = warc_to_documents(spark, str(d))
    assert docs_df.count() == 1


def test_charset_sniff_order():
    # BOM wins over everything
    assert _sniff_and_decode(
        "﻿hé".encode("utf-8"), "text/html; charset=latin-1"
    ) == "hé"
    # header charset when no BOM
    assert _sniff_and_decode(
        "café".encode("latin-1"), "text/html; charset=ISO-8859-1"
    ) == "café"
    # meta charset when header silent
    html = '<meta charset="windows-1252"><p>café</p>'.encode(
        "windows-1252"
    )
    assert "café" in _sniff_and_decode(html, "text/html")
    # unknown label -> utf-8 fallback, never a crash
    assert _sniff_and_decode(b"ok", "text/html; charset=bogus-enc") == "ok"
    # utf-8 default with replacement, never a crash
    assert "�" in _sniff_and_decode(b"\xff\xfe\xff", None)
    assert _sniff_and_decode(None, None) is None


def test_charset_aware_spark_path(spark, tmp_path):
    d = tmp_path / "cs"
    d.mkdir()
    body = "<p>café résumé naïve et ainsi de suite pour la densité " \
        "des mots du bloc principal de la page entière ici même " \
        "encore davantage de texte francophone</p>".encode("latin-1")
    blob = _record(
        "response",
        _http(body, ctype="text/html; charset=ISO-8859-1"),
        uri="http://fr.com/a",
    )
    (d / "f.warc").write_bytes(blob)
    docs_aware, _ = warc_to_documents(spark, str(d), charset_aware=True)
    text = docs_aware.collect()[0]["text"]
    assert "café" in text and "�" not in text
    # the default cast path keeps the row but mojibakes the accents
    docs_plain, _ = warc_to_documents(spark, str(d))
    plain = docs_plain.collect()[0]["text"]
    assert "�" in plain
