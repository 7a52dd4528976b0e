"""X56 PageRank (operators/graph.py): closed forms (cycle, complete
graph), a pure-python reference over arbitrary graphs, dangling-mass
conservation, early stop, determinism across partitionings."""

from __future__ import annotations

import pytest

from covid19i2b2_spark.operators.graph import pagerank


def _ranks(spark, edge_list, **kw):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(e, **kw).collect()}


def _ref(edge_list, damping=0.85, n_iter=20, tol=1e-6):
    """The same power iteration in pure python."""
    nodes = sorted({x for e in edge_list for x in e})
    n = len(nodes)
    out: dict = {}
    for s, _ in edge_list:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r for v, r in rank.items() if v not in out)
        new = {v: (1.0 - damping) / n + damping * dangling / n for v in nodes}
        for s, d in edge_list:
            new[d] += damping * rank[s] / out[s]
        delta = sum(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if tol is not None and delta < tol:
            break
    return rank


def test_cycle_is_uniform(spark):
    """A directed cycle is perfectly symmetric: every node 1/n, one
    iteration already at the fixpoint."""
    edges = [(i, (i + 1) % 5) for i in range(5)]
    got = _ranks(spark, edges, n_iter=3)
    for v, r in got.items():
        assert r == pytest.approx(0.2, abs=1e-9), (v, r)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_matches_python_reference_on_asymmetric_graph(spark):
    """Hub-and-authority shape with a dangling node and a duplicate
    edge (multigraph reading: linking twice contributes twice)."""
    edges = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 3),  # dup edge
        (5, 1),  # 5 has no in-links; 3 is the authority
        (3, 6),  # 6 is dangling (no out-edges)
    ]
    got = _ranks(spark, edges, n_iter=30, tol=None)
    want = _ref(edges, n_iter=30, tol=None)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # the authority out-ranks its spokes
    assert got[3] > got[1] > got[5]


def test_dangling_mass_conserved(spark):
    """All mass flows into a sink with no out-edges; without uniform
    redistribution total rank would decay toward (1-d) — it must stay
    1 every iteration."""
    edges = [(1, 3), (2, 3)]  # 3 dangling
    got = _ranks(spark, edges, n_iter=15, tol=None)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    want = _ref(edges, n_iter=15, tol=None)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_early_stop_and_validation(spark):
    """tol stops a symmetric graph after one pass (delta 0); parameter
    validation is loud."""
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = {r["node"]: r["rank"] for r in pagerank(e, n_iter=50, tol=1e-3).collect()}
    assert out[1] == pytest.approx(0.5, abs=1e-9)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(e, n_iter=0)


def test_deterministic_across_partitionings(spark):
    edges = [(i, (i * 7) % 11) for i in range(11) if i != (i * 7) % 11]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank(e.repartition(7), n_iter=10).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(e.repartition(2), n_iter=10).collect()}
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12), v


def _ref_weighted(edge_list, damping=0.85, n_iter=20, reset=None):
    """Weighted/personalized power iteration in pure python (weights
    per edge; reset = {node: prob} normalized, None = uniform)."""
    nodes = sorted({x for s, d, _ in edge_list for x in (s, d)})
    n = len(nodes)
    out: dict = {}
    for s, _, w in edge_list:
        out[s] = out.get(s, 0.0) + w
    if reset is None:
        rp = {v: 1.0 / n for v in nodes}
    else:
        tot = sum(reset.values())
        rp = {v: reset.get(v, 0.0) / tot for v in nodes}
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r for v, r in rank.items() if v not in out)
        new = {
            v: (1.0 - damping) * rp[v] + damping * dangling * rp[v]
            for v in nodes
        }
        for s, d, w in edge_list:
            new[d] += damping * rank[s] * w / out[s]
        rank = new
    return rank


def test_weighted_pagerank_matches_reference(spark):
    """Edge weights split a source's rank proportionally; pinned
    against the python reference, with the heavier edge's target
    out-ranking the lighter's; non-positive weights rejected."""
    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, weight="w", n_iter=25, tol=None).collect()
    }
    want = _ref_weighted(edges, n_iter=25)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert got[2] > got[3]
    bad = spark.createDataFrame(
        [(1, 2, 0.0)], "src long, dst long, w double"
    )
    with pytest.raises(ValueError, match="positive"):
        pagerank(bad, weight="w")


def test_personalized_reset_localizes_rank(spark):
    """Personalized teleport: all restart mass on node 1 — rank must
    concentrate around 1's neighborhood vs the uniform run, dangling
    mass follows the reset distribution, total stays 1; python
    reference at 1e-9; empty reset mass is loud."""
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 1, 1.0),
             (5, 6, 1.0)]  # a 4-cycle + a disconnected dangling tail
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    reset = spark.createDataFrame([(1, 1.0)], "node long, reset_prob double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=30, tol=None, reset=reset).collect()
    }
    want = _ref_weighted(edges, n_iter=30, reset={1: 1.0})
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    uniform = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=30, tol=None).collect()
    }
    assert got[1] > uniform[1]          # mass concentrates at the seed
    assert got[6] < uniform[6]          # the disconnected tail starves
    with pytest.raises(ValueError, match="positive mass"):
        pagerank(e, reset=spark.createDataFrame(
            [(9, 0.0)], "node long, reset_prob double"))


def test_reset_mass_outside_graph_is_renormalized(spark):
    """ADVICE r10 #2: reset rows naming nodes the graph doesn't contain
    must not leak teleport mass — normalization happens over the
    IN-GRAPH nodes, so {1: 1.0, 99: 3.0} behaves exactly like {1: 1.0}
    and total rank stays 1; a reset that is positive ONLY outside the
    graph is loud."""
    edges = [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    with_ghost = spark.createDataFrame(
        [(1, 1.0), (99, 3.0)], "node long, reset_prob double"
    )
    clean = spark.createDataFrame([(1, 1.0)], "node long, reset_prob double")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=15, tol=None, reset=with_ghost).collect()
    }
    want = {
        r["node"]: r["rank"]
        for r in pagerank(e, n_iter=15, tol=None, reset=clean).collect()
    }
    assert set(got) == set(want) == {1, 2, 3}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    only_ghost = spark.createDataFrame(
        [(99, 5.0)], "node long, reset_prob double"
    )
    with pytest.raises(ValueError, match="positive mass on the"):
        pagerank(e, reset=only_ghost)
