"""X75: WARC source — the crawl interchange format (SURVEY §2.11
extension; round 12).  Everything upstream of the crawl chain (X69
link extraction, X74 boilerplate removal, X67 robots) consumes fetched
bodies, and the format those arrive in — from Common Crawl, Heritrix,
wget --warc — is ISO 28500 WARC: concatenated records, each a version
line + named header fields + a Content-Length-delimited body.  This
source parses WARC (and the universal .warc.gz per-record-member gzip
layout) into a typed DataFrame.

Parsing is SPEC-DRIVEN, not delimiter-driven: the body is read as
exactly Content-Length bytes — a body may legally contain
``WARC/1.0\\r\\n`` (an archived page ABOUT warc files), so splitting on
the magic would corrupt records; the only correct cursor is the
declared length (ISO 28500 §4).  For ``response`` records the HTTP
status and headers are peeled from the payload front (the WARC body of
a response record IS the HTTP message), so downstream filters
(status=200, content-type text/html) are column predicates.

Spark shape: files arrive via the built-in ``binaryFile`` source (one
row per file, whole content), then ONE mapInPandas pass parses records
— Arrow-batched Python, the honest choice for a byte-cursor format no
expression can walk.  Parallelism is per FILE (the crawl convention
caps .warc files at ~1 GB exactly so archives parallelize), so a
1000-executor cluster reads 1000 files at once; payloads are truncated
at ``payload_limit_bytes`` with a loud ``is_truncated`` flag (a 100 TB
scan must bound row width before shuffles).  gzip members are
decompressed with the stdlib streaming decompressor, member by member
— never the whole file at once.

Malformed input follows the X33 quarantine rule: a record that cannot
be parsed yields a row with warc_type NULL and ``parse_error`` set
(offset + reason), and parsing RESUMES at the next gzip member when
the layout allows — one rotten record never discards a 1 GB file.

Parity: a planted multi-record fixture (response/request/warcinfo,
bodies containing the WARC magic, gzip members, truncation, torn
records) round-trips through a pure-Python reference in
tests/test_warc.py (the X67 same-spec-twice pattern).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("http_location", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_length", T.LongType()),
        T.StructField("is_truncated", T.BooleanType()),
        T.StructField("parse_error", T.StringType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    """WARC named fields: 'Name: value' lines, case-insensitive names
    (ISO 28500 §4); continuation lines (SP/TAB) fold into the previous
    value."""
    out: dict[str, str] = {}
    last = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            out[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, val = line.partition(b":")
        if not sep:
            continue
        last = name.strip().decode("utf-8", "replace").lower()
        out[last] = val.strip().decode("utf-8", "replace")
    return out


def _peel_http(
    payload: bytes,
) -> tuple[int | None, str | None, str | None, bytes]:
    """(status, content-type, location, body) of an HTTP message
    payload; the original payload comes back unchanged when it isn't
    one.  Location feeds X82 redirect resolution — for 3xx records
    the header IS the fetch result."""
    if not payload.startswith(b"HTTP/"):
        return None, None, None, payload
    head, sep, body = payload.partition(_CRLF2)
    if not sep:
        return None, None, None, payload
    lines = head.split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, None, payload
    headers = _parse_headers(b"\r\n".join(lines[1:]))
    return status, headers.get("content-type"), headers.get("location"), body


def parse_warc_records(
    data: bytes, *, payload_limit_bytes: int = 1 << 20
) -> list[dict]:
    """All records of one (already-decompressed) WARC stream — the
    byte-cursor walk the module docstring describes.  Each dict matches
    WARC_SCHEMA minus ``file``.  On a malformed record, one error row
    is emitted and the walk stops (without per-member gzip framing
    there is no trustworthy resync point past a corrupt length)."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        offset = pos
        if not data.startswith(b"WARC/", pos):
            out.append(_err_row(offset, "missing WARC/ version line"))
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            out.append(_err_row(offset, "unterminated header block"))
            break
        head = data[pos:head_end]
        fields = _parse_headers(head.split(b"\r\n", 1)[1] if b"\r\n" in head else b"")
        try:
            clen = int(fields["content-length"])
            if clen < 0:
                raise ValueError
        except (KeyError, ValueError):
            out.append(_err_row(offset, "missing/invalid Content-Length"))
            break
        body_start = head_end + len(_CRLF2)
        if body_start + clen > n:
            out.append(_err_row(offset, "body extends past end of data"))
            break
        payload = data[body_start : body_start + clen]
        status, http_ct, http_loc, http_body = _peel_http(payload)
        if status is not None:
            payload = http_body
        truncated = len(payload) > payload_limit_bytes
        out.append(
            {
                "record_offset": offset,
                "warc_type": fields.get("warc-type"),
                "record_id": fields.get("warc-record-id"),
                "target_uri": fields.get("warc-target-uri"),
                "warc_date": fields.get("warc-date"),
                "content_type": fields.get("content-type"),
                "content_length": clen,
                "http_status": status,
                "http_content_type": http_ct,
                "http_location": http_loc,
                "payload": payload[:payload_limit_bytes],
                "payload_length": len(payload),
                "is_truncated": truncated,
                "parse_error": None,
            }
        )
        pos = body_start + clen
    return out


def _err_row(offset: int, reason: str) -> dict:
    return {
        "record_offset": offset,
        "warc_type": None,
        "record_id": None,
        "target_uri": None,
        "warc_date": None,
        "content_type": None,
        "content_length": None,
        "http_status": None,
        "http_content_type": None,
        "http_location": None,
        "payload": None,
        "payload_length": None,
        "is_truncated": None,
        "parse_error": f"offset {offset}: {reason}",
    }


def _gzip_members(data: bytes) -> Iterator[tuple[int, bytes | None, str | None]]:
    """(member_offset, decompressed, error) per gzip member — zlib
    decompressobj stops at each member boundary (eof + unused_data),
    so members decompress one at a time instead of as one concatenated
    stream.  A corrupt member yields an error and the walk RESUMES at
    the next gzip magic (the per-record-member layout makes that a
    real resync point, unlike the plain-warc case)."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
            if not d.eof:
                yield pos, None, "truncated gzip member"
                return
        except zlib.error as e:
            nxt = data.find(b"\x1f\x8b", pos + 2)
            yield pos, None, f"corrupt gzip member: {e}"
            if nxt < 0:
                return
            pos = nxt
            continue
        consumed = n - pos - len(d.unused_data)
        yield pos, chunk, None
        pos += consumed


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    payload_limit_bytes: int = 1 << 20,
) -> DataFrame:
    """WARC records under ``path`` (plain ``.warc`` and per-member
    ``.warc.gz``) as a DataFrame with WARC_SCHEMA — one mapInPandas
    pass over the built-in binaryFile source."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content)
                if fname.endswith(".gz"):
                    for off, chunk, err in _gzip_members(content):
                        if err is not None:
                            r = _err_row(off, err)
                            r["file"] = fname
                            rows.append(r)
                            continue
                        for r in parse_warc_records(
                            chunk, payload_limit_bytes=payload_limit_bytes
                        ):
                            # offsets inside a member are member-local;
                            # report the member's file offset instead
                            r["record_offset"] = off
                            r["file"] = fname
                            rows.append(r)
                else:
                    for r in parse_warc_records(
                        content, payload_limit_bytes=payload_limit_bytes
                    ):
                        r["file"] = fname
                        rows.append(r)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in WARC_SCHEMA.fields}
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)
