"""X82 redirect resolution (operators/redirects.py): chain/branch
topologies against a pure-Python follower, cycle and over-long-chain
loudness, exact hop counts, the log-rounds probe, multi-snapshot
determinism, and redirect_edges from real WARC rows incl. relative
Locations."""

from __future__ import annotations

import math

import pytest

from covid19i2b2_spark.operators.redirects import (
    redirect_edges,
    resolve_redirects,
)


def _py_resolve(edges, max_hops=32):
    f = {}
    for s, d in edges:
        f[s] = min(d, f[s]) if s in f else d
    out = {}
    for s in f:
        cur, hops = f[s], 1
        while cur in f and hops <= max_hops:
            cur = f[cur]
            hops += 1
        if cur in f or hops > max_hops:
            out[s] = (None, False)
        else:
            out[s] = (cur, True)
    return out


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _run(spark, pairs, **kw):
    return {
        r["src"]: (r["final_url"], r["resolved"], r["n_hops"])
        for r in resolve_redirects(_edges(spark, pairs), **kw).collect()
    }


def test_chains_and_branches_match_python(spark):
    pairs = [(f"c{i}", f"c{i+1}") for i in range(20)]  # 20-hop chain
    pairs += [("a", "b"), ("b", "t1")]
    pairs += [(f"x{i}", "hub") for i in range(5)] + [("hub", "t2")]
    got = _run(spark, pairs)
    want = _py_resolve(pairs)
    assert {k: v[:2] for k, v in got.items()} == want
    # exact hop counts on the named rows
    assert got["a"] == ("t1", True, 2)
    assert got["x3"] == ("t2", True, 2)
    assert got["c0"] == ("c20", True, 20)
    assert got["c19"] == ("c20", True, 1)


def test_cycles_and_too_long_are_loud(spark):
    pairs = [("p", "q"), ("q", "p")]  # 2-cycle
    pairs += [("s", "s2"), ("s2", "s3"), ("s3", "s2")]  # tail into cycle
    pairs += [(f"l{i}", f"l{i+1}") for i in range(40)]  # 40 > max_hops=32
    got = _run(spark, pairs, max_hops=32)
    for src in ("p", "q", "s", "s2", "s3", "l0"):
        assert got[src][0] is None and got[src][1] is False, src
    # a chain comfortably under the cap still resolves in the same run
    assert got["l20"] == ("l40", True, 20)


def test_rounds_are_logarithmic(spark):
    pairs = [(f"c{i}", f"c{i+1}") for i in range(30)]
    probe: dict = {}
    _run(spark, pairs, max_hops=32, plan_probe=probe)
    assert probe["n_rounds"] <= math.ceil(math.log2(32)) + 1


def test_multi_snapshot_src_is_deterministic(spark):
    # the same src recorded with two Locations folds to min(dst)
    got = _run(spark, [("u", "zzz"), ("u", "aaa")])
    assert got["u"] == ("aaa", True, 1)


def test_validation_and_empty(spark):
    with pytest.raises(ValueError):
        _run(spark, [("a", "b")], max_hops=0)
    assert _run(spark, []) == {}


def test_redirect_edges_from_warc_rows(spark):
    rows = [
        # absolute Location
        ("http://a.com/old", 301, "http://a.com/new"),
        # relative Location resolves against the record's own URI
        ("http://a.com/dir/x", 302, "../y"),
        # root-relative
        ("http://b.com/p?q=1", 307, "/landing"),
        # non-3xx rows and NULLs never become edges
        ("http://a.com/ok", 200, None),
        ("http://a.com/miss", 404, None),
        (None, 301, "http://x.com/"),
        # self-redirect drops (it resolves to itself forever)
        ("http://c.com/self", 301, "http://c.com/self"),
    ]
    df = spark.createDataFrame(
        rows, "target_uri string, http_status int, http_location string"
    )
    got = {r["src"]: r["dst"] for r in redirect_edges(df).collect()}
    assert got == {
        "http://a.com/old": "http://a.com/new",
        "http://a.com/dir/x": "http://a.com/y",
        "http://b.com/p?q=1": "http://b.com/landing",
    }


def test_end_to_end_from_warc_fixture(spark, tmp_path):
    from covid19i2b2_spark.sources.warc import read_warc
    from tests.test_warc import _record

    d = tmp_path / "warc"
    d.mkdir()
    redirect = (
        b"HTTP/1.1 301 Moved\r\nLocation: /final\r\n"
        b"Content-Length: 0\r\n\r\n"
    )
    blob = _record(
        "response", redirect, uri="http://m.com/start", rid="<urn:uuid:1>"
    )
    (d / "f.warc").write_bytes(blob)
    recs = read_warc(spark, str(d))
    got = resolve_redirects(redirect_edges(recs)).collect()
    assert len(got) == 1
    assert got[0]["final_url"] == "http://m.com/final"
    assert got[0]["resolved"] is True


def test_edge_plan_resolves_once(spark):
    """The explode barrier keeps resolve_url to ONE evaluation per
    row — a plain filter on the aliased dst substituted the tree into
    the predicate (58 KB of plan; now ~19 KB with one Generate)."""
    df = spark.createDataFrame(
        [("http://a/b", 301, "/x")],
        "target_uri string, http_status int, http_location string",
    )
    opt = (
        redirect_edges(df)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert len(opt) < 30_000, len(opt)
    assert "Generate explode" in opt or "Generate" in opt, opt
