"""X75 WARC source (sources/warc.py): spec-built fixtures through the
full read path — plain and per-member-gzip layouts, HTTP peeling,
bodies containing the WARC magic (the delimiter-split trap), payload
truncation, torn/corrupt records and gzip-member resync, and the
one-mapInPandas plan pin."""

from __future__ import annotations

import gzip

import pytest

from covid19i2b2_spark.sources.warc import (
    parse_warc_records,
    read_warc,
)


def _record(
    warc_type: str,
    body: bytes,
    uri: str | None = None,
    rid: str = "<urn:uuid:1>",
    extra: dict | None = None,
) -> bytes:
    fields = {
        "WARC-Type": warc_type,
        "WARC-Record-ID": rid,
        "WARC-Date": "2026-08-16T00:00:00Z",
        "Content-Length": str(len(body)),
        "Content-Type": "application/http; msgtype=response"
        if warc_type == "response"
        else "application/warc-fields",
    }
    if uri:
        fields["WARC-Target-URI"] = uri
    fields.update(extra or {})
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode() for k, v in fields.items()
    )
    return head + b"\r\n" + body + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


HTML = b"<html><body>hello crawl</body></html>"
# a body that CONTAINS the record magic — splitting on the magic
# instead of walking Content-Length would shred this record
TRAP = b"about warc:\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record"


def _fixture_bytes() -> bytes:
    return (
        _record("warcinfo", b"software: test\r\n")
        + _record(
            "response", _http(HTML), uri="http://ex.com/", rid="<urn:uuid:2>"
        )
        + _record(
            "response",
            _http(TRAP, ctype="text/plain"),
            uri="http://ex.com/trap",
            rid="<urn:uuid:3>",
        )
        + _record("request", b"GET / HTTP/1.1\r\n", uri="http://ex.com/")
    )


def test_parse_records_pure_python():
    recs = parse_warc_records(_fixture_bytes())
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "response", "request",
    ]
    r1 = recs[1]
    assert r1["target_uri"] == "http://ex.com/"
    assert r1["http_status"] == 200
    assert r1["http_content_type"] == "text/html"
    assert r1["payload"] == HTML
    assert r1["payload_length"] == len(HTML)
    # the trap body survives byte-identically
    assert recs[2]["payload"] == TRAP
    # the request record is not an HTTP *response*: payload unpeeled
    assert recs[3]["http_status"] is None
    assert recs[3]["payload"].startswith(b"GET /")
    assert all(r["parse_error"] is None for r in recs)


def test_payload_truncation():
    recs = parse_warc_records(_fixture_bytes(), payload_limit_bytes=5)
    r1 = recs[1]
    assert r1["is_truncated"] is True
    assert r1["payload"] == HTML[:5]
    assert r1["payload_length"] == len(HTML)  # the REAL length survives


def test_torn_record_is_loud():
    data = _fixture_bytes()
    # last record tail = 16-byte body + 4-byte record separator; a
    # 10-byte cut keeps the header block intact but truncates the
    # declared body
    torn = data[: len(data) - 10]
    recs = parse_warc_records(torn)
    assert recs[-1]["parse_error"] is not None
    assert "past end" in recs[-1]["parse_error"]
    # everything before the tear parsed normally
    assert [r["warc_type"] for r in recs[:-1]] == [
        "warcinfo", "response", "response",
    ]


def test_missing_content_length_is_loud():
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    recs = parse_warc_records(bad)
    assert len(recs) == 1 and "Content-Length" in recs[0]["parse_error"]


def _write_fixture(tmp_path, gz: bool) -> str:
    d = tmp_path / ("warc_gz" if gz else "warc")
    d.mkdir()
    if gz:
        # the standard layout: ONE gzip member PER RECORD
        blob = b"".join(
            gzip.compress(
                _record(
                    "response",
                    _http(f"page {i}".encode()),
                    uri=f"http://ex.com/{i}",
                    rid=f"<urn:uuid:{i}>",
                )
            )
            for i in range(3)
        )
        (d / "f.warc.gz").write_bytes(blob)
    else:
        (d / "f.warc").write_bytes(_fixture_bytes())
    return str(d)


def test_read_warc_plain(spark, tmp_path):
    out = read_warc(spark, _write_fixture(tmp_path, gz=False)).collect()
    by_id = {r["record_id"]: r for r in out}
    assert len(out) == 4
    r = by_id["<urn:uuid:2>"]
    assert r["warc_type"] == "response" and r["http_status"] == 200
    assert bytes(r["payload"]) == HTML
    assert by_id["<urn:uuid:3>"]["content_type"].startswith(
        "application/http"
    )
    assert all(x["parse_error"] is None for x in out)


def test_read_warc_gzip_members(spark, tmp_path):
    out = read_warc(spark, _write_fixture(tmp_path, gz=True)).collect()
    assert sorted(r["target_uri"] for r in out) == [
        f"http://ex.com/{i}" for i in range(3)
    ]
    assert all(r["http_status"] == 200 for r in out)
    # member offsets are distinct file positions
    assert len({r["record_offset"] for r in out}) == 3


def test_gzip_corrupt_member_resyncs(spark, tmp_path):
    d = tmp_path / "warc_bad"
    d.mkdir()
    good = gzip.compress(
        _record("response", _http(b"ok"), uri="http://ex.com/ok")
    )
    # corrupt member: valid magic, garbage after
    bad = b"\x1f\x8b\x08\x00" + b"\xff" * 20
    (d / "f.warc.gz").write_bytes(good + bad + good)
    out = read_warc(spark, str(d)).collect()
    oks = [r for r in out if r["parse_error"] is None]
    errs = [r for r in out if r["parse_error"] is not None]
    assert len(oks) == 2  # both good members survive the bad middle
    assert len(errs) == 1 and "gzip" in errs[0]["parse_error"]


def test_plan_is_one_python_pass(spark, tmp_path):
    from covid19i2b2_spark.plans import physical_plan

    df = read_warc(spark, _write_fixture(tmp_path, gz=False))
    plan = physical_plan(df)
    assert plan.count("MapInPandas") == 1, plan
    assert "Exchange" not in plan.split("== Physical Plan ==")[-1]
