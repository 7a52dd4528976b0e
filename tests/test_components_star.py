"""X78 large-star/small-star connected components
(operators/dedup_clusters.py connected_components_star): equality with
a pure-Python union-find on random graph topologies, equality with the
existing min-label operator, the O(log n)-rounds claim demonstrated on
a long path where min-label's round budget fails, probe/handle
contracts and edge cases."""

from __future__ import annotations

import random

from covid19i2b2_spark.operators.dedup_clusters import (
    connected_components,
    connected_components_star,
)


def _union_find(edges):
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min reachable id
    return {x: find(x) for x in parent}


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _labels(df):
    return {r["node"]: r["component"] for r in df.collect()}


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    # 4 random graphs exercise the merge/star rounds fully; 6 only
    # added wall (round 16: driver pytest window)
    for trial in range(4):
        n = 40 + trial * 20
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(n // 2 + trial * 10)
        ]
        edges = [e for e in edges if e[0] != e[1]] or [(0, 1)]
        want = _union_find(edges)
        got = _labels(connected_components_star(_pairs(spark, edges)))
        assert got == want, (trial, edges)


def test_matches_min_label_operator(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [e for e in edges if e[0] != e[1]]
    pairs = _pairs(spark, edges)
    # min-label needs a diameter-sized round budget on random graphs —
    # exactly the gap the star variant closes
    a = _labels(connected_components(pairs, max_iter=60))
    b = _labels(connected_components_star(pairs))
    assert a == b


def test_long_path_converges_in_log_rounds(spark):
    """A 300-edge path: diameter 300, so min-label's default 10-round
    budget CANNOT finish it (the reason this operator exists) while
    the star algorithm lands the exact answer in ~log2(n) rounds."""
    edges = [(i, i + 1) for i in range(300)]
    want = {i: 0 for i in range(301)}
    probe: dict = {}
    got = _labels(
        connected_components_star(_pairs(spark, edges), plan_probe=probe)
    )
    assert got == want
    assert probe["n_rounds"] <= 12, probe
    # the honest contrast: min-label at its default cap returns a
    # PARTIAL merge on this topology
    partial = _labels(connected_components(_pairs(spark, edges)))
    assert partial != want


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3)]
    got = _labels(connected_components_star(_pairs(spark, edges)))
    assert got == {1: 1, 2: 2, 3: 2}


def test_single_edge_and_empty(spark):
    got = _labels(connected_components_star(_pairs(spark, [(9, 4)])))
    assert got == {9: 4, 4: 4}
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(empty).count() == 0


def test_round_plan_reads_pinned_large_star(spark):
    """The large-star output is checkpointed before small-star
    consumes it twice (min aggregate + relink join): the round's plan
    reads it as a materialized scan and carries exactly ONE join —
    unpinned, the bi-join subtree replicated ~3x (7 joins observed)."""
    probe: dict = {}
    connected_components_star(
        _pairs(spark, [(1, 2), (2, 3), (3, 4)]), plan_probe=probe
    )
    plan = probe["round_plan"]
    n_joins = (
        plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("BroadcastHashJoin")
    )
    assert n_joins == 1, plan
    assert "ExistingRDD" in plan, plan


def test_cache_handle_contract(spark):
    handles: list = []
    df = connected_components_star(
        _pairs(spark, [(1, 2)]), cache_handles=handles
    )
    assert len(handles) == 1
    df.count()
    handles[0].unpersist()  # idempotent release surface
