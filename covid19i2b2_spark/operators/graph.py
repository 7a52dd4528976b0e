"""X56: link-graph centrality — distributed PageRank (SURVEY §2.11
extension; round 10).  A crawl pipeline prioritizes its frontier and
weights its quality priors by link centrality (the original use of the
algorithm); a training-data pipeline reuses the same scores as a
document-level quality signal.  This is also the engine's one operator
family that is ITERATIVE with distributed state — k-means keeps its
state driver-sized (train_centroids collects k·dim centroids per
pass), while ranks here stay a DataFrame end to end.

Power iteration, standard damping form with uniform dangling-mass
redistribution:

    rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/out_deg(u)
                              + dangling_mass/N)

Plan shape per iteration (the part that must survive 100 TB):

- contributions = ranks ⋈ edges on src, groupBy dst sum (map-side
  combined) — both keyed on node ids, high-cardinality by
  construction.  Degrees are computed ONCE and persisted, and so are
  the edges (``pre_partition=True``, the default): one up-front
  shuffle onto the source key + eager checkpoint, so every pass reads
  pre-clustered materialized blocks instead of re-scanning AND
  re-shuffling the raw edges — measured strictly fewer per-pass
  exchanges (pinned by test_plan_shape; round 11, VERDICT r10 #1).
  What remains per pass: the contribution groupBy (the mass transfer
  along edges — irreducible) plus node-sized bookkeeping exchanges.
  Cross-job, an edges table written through layout.write_bucketed on
  the source key co-locates the join from the scan itself (also
  pinned strictly cheaper than the naive plan).
- dangling_mass = one scalar aggregate (nodes with no out-edges hold
  mass that must redistribute or total rank leaks below 1 — pinned by
  the mass-conservation test).
- the new ranks frame is eagerly localCheckpoint'ed EVERY iteration:
  iterative DataFrames otherwise stack a lineage of 2 shuffles per
  pass, and iteration i would replay all i-1 predecessors on every
  action (the classic exploding-plan trap; the checkpoint/persist
  lifecycle note in PLANS.md round 8).  Previous checkpoints are
  released as soon as their successor is pinned.

No oracle: iterative fixpoints aren't SQL-expressible (the driver
contract's documented carve-out) — correctness is pinned against
closed forms (cycle, complete graph) and a pure-python reference
implementation of the same iteration, plus mass conservation,
dangling handling, early stop, and determinism-across-partitionings
tests in tests/test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from covid19i2b2_spark.caching import release_local_checkpoint


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    tol: float | None = 1e-6,
    weight: str | None = None,
    reset: DataFrame | None = None,
    pre_partition: bool = True,
    plan_probe: dict | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) over the directed edge list; ranks sum to 1.

    ``tol`` stops early once the L1 delta between iterations falls
    below it (None = always run ``n_iter`` passes).  Duplicate edges
    are kept — a page linking twice contributes twice, matching the
    multigraph reading; dedup upstream for the simple-graph reading.
    Node ids may be any equality-comparable type.

    ``weight`` names an edge-weight column: each source splits its
    rank proportionally to weight instead of uniformly (contrib =
    rank * w / sum_w(src)); non-positive weights are rejected loudly
    (a zero-weight edge is no edge, and a negative one makes the walk
    ill-defined).

    ``reset`` personalizes the teleport: a (node, reset_prob) frame —
    the (1-d) restart and the dangling mass land on THIS distribution
    instead of uniform.  The reset mass is normalized over the IN-GRAPH
    nodes (one left join onto the node frame, then one scalar sum), so
    entries naming nodes absent from the edge list are renormalized
    away and ranks still sum to 1 — mass on a node the walk can never
    visit must not silently leak out of the total (ADVICE r10 #2);
    zero in-graph mass raises.  Personalized PageRank from trusted
    seed hosts is the standard crawl-frontier prioritization; the
    normalized teleport column is folded ONCE into the node frame
    before the loop, so the personalized iteration pays exactly the
    same two node-keyed joins per pass as the uniform one (VERDICT
    r10 #5 — no third per-pass join).

    ``pre_partition`` (default True — VERDICT r10 #1): shuffle the
    edge frame ONCE onto its source key and pin it (eager
    localCheckpoint) before the loop.  Without it every pass re-scans
    the raw edges and re-shuffles them for the ranks⋈edges join — the
    single biggest per-pass cost at scale, paid n_iter times for the
    same bytes; with it each pass reads pre-clustered materialized
    blocks instead, and the per-pass plan carries strictly fewer
    exchanges (pinned by test_plan_shape; what remains is the
    unavoidable contribution groupBy plus node-sized bookkeeping).
    Same result either way (pinned).  Cross-job, a caller holding
    edges in a layout.write_bucketed table bucketed on the source key
    gets a co-located join with ``pre_partition=False`` and zero
    per-job setup — the scan itself reports the bucket partitioning
    (also pinned strictly cheaper than the naive plan).

    ``plan_probe``: pass a dict to receive
    ``{"iteration_plans": [str, ...], "n_iterations": int}`` — the
    executed-plan text of the first two iterations' rank updates
    (planning only, no extra execution) and how many passes actually
    ran (tol may stop early); the hook test_plan_shape pins exchange
    counts through.

    ``init_ranks`` (round 11): warm-start the iteration from a
    previous run's (node, rank) frame — the steady state of a crawl
    that re-ranks a slowly-changing graph.  Uncovered (new) nodes
    seed at 1/n, the vector renormalizes to sum 1, and the fixpoint
    is UNCHANGED (power iteration converges to the same vector from
    any positive start) — warm starting only buys fewer passes under
    ``tol`` (pinned: seeding from a converged run stops after one)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    cols = [F.col(src).alias("__src"), F.col(dst).alias("__dst")]
    if weight is not None:
        cols.append(F.col(weight).cast("double").alias("__w"))
    e = edges.select(*cols)
    if weight is None:
        e = e.withColumn("__w", F.lit(1.0))
    elif e.filter((F.col("__w").isNull()) | (F.col("__w") <= 0)).take(1):
        raise ValueError(
            "edge weights must be positive and non-NULL (a zero-weight "
            "edge is no edge; a negative one makes the walk ill-defined)"
        )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    degrees = (
        e.groupBy("__src").agg(F.sum("__w").alias("__deg"))
        .localCheckpoint(eager=True)
    )
    ck_edges = None
    if pre_partition:
        # one shuffle + one materialization now, instead of a raw-edge
        # re-scan AND re-shuffle inside every pass: the checkpointed
        # blocks carry HashPartitioning(__src), which the per-pass
        # contribution join reuses (no edge-side exchange)
        e = e.repartition(F.col("__src")).localCheckpoint(eager=True)
        ck_edges = e
    # fold the teleport distribution into the node frame ONCE: uniform
    # is a literal column on the checkpointed nodes; personalized is
    # one left join + in-graph renormalization, checkpointed.  Either
    # way the loop below sees ONE (node, __reset) frame and pays the
    # same two node-keyed joins per pass.
    if reset is not None:
        with_r = nodes.join(reset, "node", "left").select(
            "node",
            F.coalesce(F.col("reset_prob"), F.lit(0.0)).alias("__r"),
        )
        # normalize by the IN-GRAPH mass: reset rows naming nodes the
        # graph doesn't contain would otherwise make the teleport sum
        # to < 1 and total rank silently drop below 1
        r_total = with_r.agg(F.sum("__r").alias("s")).collect()[0]["s"]
        if not r_total or r_total <= 0:
            raise ValueError(
                "reset distribution must put positive mass on the "
                "graph's nodes"
            )
        node_frame = with_r.select(
            "node",
            (F.col("__r") / F.lit(float(r_total))).alias("__reset"),
        ).localCheckpoint(eager=True)
        release_local_checkpoint(nodes)
        ck_node_frame = node_frame
    else:
        node_frame = nodes.withColumn("__reset", F.lit(1.0 / n))
        ck_node_frame = nodes
    if init_ranks is not None:
        # warm start (round 11): a continuously-recomputed crawl graph
        # changes a little between runs, so the previous run's ranks
        # are a near-fixpoint — seed from them and let tol stop early.
        # Nodes the init frame doesn't cover (newly discovered) seed at
        # the cold 1/n; the whole vector renormalizes to sum 1 (the
        # invariant every test pins), so any non-negative init is safe.
        seeded = node_frame.join(
            init_ranks.select("node", F.col("rank").alias("__r0")),
            "node",
            "left",
        ).select(
            "node",
            F.coalesce(F.col("__r0"), F.lit(1.0 / n)).alias("__r0"),
        )
        z = seeded.agg(F.sum("__r0").alias("s")).collect()[0]["s"]
        if not z or z <= 0:
            raise ValueError(
                "init_ranks must carry positive total mass over the "
                "graph's nodes"
            )
        ranks = seeded.select(
            "node", (F.col("__r0") / F.lit(float(z))).alias("rank")
        )
    else:
        ranks = node_frame.select("node", F.lit(1.0 / n).alias("rank"))
    ranks = ranks.localCheckpoint(eager=True)
    for it in range(n_iter):
        if plan_probe is not None:
            plan_probe["n_iterations"] = it + 1
        # pin the ranks⋈degrees frame BEFORE the dangling scalar: it
        # feeds two actions per pass (the dangling collect and the
        # contribution join under new_ranks' checkpoint), and without
        # the pin the node-sized join re-executes for each (VERDICT
        # r11 #1 — the HITS discipline applied here too).  Released
        # once new_ranks is pinned.
        with_deg = (
            ranks.join(degrees, ranks["node"] == degrees["__src"], "left")
            .select("node", "rank", "__deg")
            .localCheckpoint(eager=True)
        )
        # dangling nodes (no out-edges) leak their mass unless it is
        # redistributed uniformly — one scalar aggregate per pass
        dangling = (
            with_deg.filter(F.col("__deg").isNull())
            .agg(F.sum("rank").alias("m"))
            .collect()[0]["m"]
            or 0.0
        )
        contribs = (
            with_deg.filter(F.col("__deg").isNotNull())
            .join(e, F.col("node") == F.col("__src"))
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") * F.col("__w") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        joined = node_frame.join(contribs, "node", "left")
        rank_expr = (
            F.lit(1.0 - damping) * F.col("__reset")
            + F.lit(damping)
            * (
                F.coalesce(F.col("__in"), F.lit(0.0))
                + F.lit(dangling) * F.col("__reset")
            )
        )
        update = joined.select("node", rank_expr.alias("rank"))
        if plan_probe is not None and it < 2:
            plan_probe.setdefault("iteration_plans", []).append(
                update._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
            )
        # cut the 2-shuffle/iter lineage
        new_ranks = update.localCheckpoint(eager=True)
        release_local_checkpoint(with_deg)
        if tol is not None:
            delta = (
                ranks.select("node", F.col("rank").alias("__old"))
                .join(new_ranks, "node")
                .agg(F.sum(F.abs(F.col("rank") - F.col("__old"))).alias("d"))
                .collect()[0]["d"]
            )
        else:
            delta = None
        release_local_checkpoint(ranks)
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    release_local_checkpoint(ck_node_frame)
    release_local_checkpoint(degrees)
    if ck_edges is not None:
        release_local_checkpoint(ck_edges)
    return ranks


def top_anchor_texts(
    links: DataFrame,
    dst_col: str,
    anchor_col: str,
    k: int = 5,
    lowercase: bool = True,
) -> DataFrame:
    """X64 (round 11): per link TARGET, the top-``k`` anchor texts by
    how many links carry them — the classic link-corpus signal (what
    the web CALLS a page is evidence the page itself can't give: a
    homepage titled "Home" is findable only through its anchors; the
    signal feeds retrieval fields, title repair, and keyword priors
    for training-data selection).

    (dst, anchor_text, n_links, rank): anchors are trimmed (and
    lowercased unless ``lowercase=False``); empty/NULL anchors carry
    no evidence and are dropped; ties break by anchor text ascending
    (deterministic across runs/partitionings).

    Shape: one (dst, anchor) groupBy — high-cardinality by
    construction — then a per-dst ``row_number() <= k`` that compiles
    to WindowGroupLimit (per-partition rank pruning, no full sort of
    any target's anchor list; the top-k-per-group plan shape this
    engine pins elsewhere).  Nothing is collected."""
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    a = F.trim(F.col(anchor_col))
    if lowercase:
        a = F.lower(a)
    counts = (
        links.select(F.col(dst_col).alias("dst"), a.alias("anchor_text"))
        .filter(F.col("anchor_text").isNotNull() & (F.col("anchor_text") != ""))
        .groupBy("dst", "anchor_text")
        .agg(F.count("*").cast("long").alias("n_links"))
    )
    w = Window.partitionBy("dst").orderBy(
        F.col("n_links").desc(), F.col("anchor_text").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dst", "anchor_text", "n_links", F.col("rank").cast("long").alias("rank"))
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 20,
    tol: float | None = 1e-6,
    plan_probe: dict | None = None,
) -> DataFrame:
    """X65 (round 11): HITS hubs-and-authorities (Kleinberg 1999) —
    the complementary link prior to :func:`pagerank`: an AUTHORITY is
    pointed at by good hubs (the pages worth keeping), a HUB points at
    good authorities (the pages worth crawling for their outlinks).
    PageRank mixes both notions through one random walk; training-data
    selection often wants them apart (keep authorities, expand hubs).

    Power iteration of the alternating updates

        a(v) = Σ_{u→v} h(u)      h(u) = Σ_{u→v} a(v)

    each followed by an L1 normalization (scores sum to 1 — scale-free
    like pagerank's vector, so thresholds transfer across graphs).
    Returns (node, authority, hub) for every node in the edge list.

    Shape per pass — the pagerank discipline applied twice: the edge
    frame is pinned ONCE in each orientation (eager localCheckpoint
    after a shuffle onto the join key, so neither half-step re-scans
    or re-shuffles raw edges), each half-step is one co-keyed join +
    one map-side-combined groupBy + one scalar normalizer, and the
    state frame is eagerly checkpointed every pass with predecessor
    release (the exploding-lineage trap).  Each half-step's raw
    aggregate is itself pinned BEFORE its normalizer collect (VERDICT
    r11 #1): it feeds two actions (the scalar total and the normalized
    state's checkpoint), and without the pin the pass's dominant
    edge-keyed join + groupBy would execute twice — a free 2× at
    scale.  ``tol`` stops early on the L1 delta of the authority
    vector.  ``plan_probe``: pass a dict to receive
    ``{"half_step_plans": [str, str], "n_iterations": int}`` — the
    executed-plan text of the FIRST pass's normalized-state updates
    (the test pins that they read the pinned aggregate as an
    ExistingRDD scan, not a re-derived join).  No oracle — iterative
    fixpoint, the documented non-SQL carve-out; correctness pins
    against a pure-python same-iteration reference, closed forms,
    normalization invariants, and determinism (tests/test_graph.py)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst"))
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("authority"), F.lit(0.0).alias("hub")
        )
    by_src = e.repartition(F.col("__src")).localCheckpoint(eager=True)
    by_dst = e.repartition(F.col("__dst")).localCheckpoint(eager=True)
    hubs = nodes.select("node", F.lit(1.0 / n).alias("h"))
    hubs = hubs.localCheckpoint(eager=True)
    auths = None
    for it in range(n_iter):
        if plan_probe is not None:
            plan_probe["n_iterations"] = it + 1
        # pin the edge-keyed aggregate BEFORE the normalizer collect:
        # a_raw feeds two actions (the scalar total and new_auths'
        # checkpoint), and the pin makes the pass's dominant join +
        # groupBy execute exactly once (VERDICT r11 #1)
        a_raw = (
            hubs.join(by_src, hubs["node"] == by_src["__src"])
            .select(F.col("__dst").alias("node"), F.col("h").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__a"))
            .localCheckpoint(eager=True)
        )
        a_tot = a_raw.agg(F.sum("__a").alias("s")).collect()[0]["s"] or 1.0
        upd_a = nodes.join(a_raw, "node", "left").select(
            "node",
            (
                F.coalesce(F.col("__a"), F.lit(0.0)) / F.lit(float(a_tot))
            ).alias("a"),
        )
        if plan_probe is not None and it == 0:
            plan_probe.setdefault("half_step_plans", []).append(
                upd_a._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
            )
        new_auths = upd_a.localCheckpoint(eager=True)
        release_local_checkpoint(a_raw)
        h_raw = (
            new_auths.join(by_dst, new_auths["node"] == by_dst["__dst"])
            .select(F.col("__src").alias("node"), F.col("a").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__h"))
            .localCheckpoint(eager=True)
        )
        h_tot = h_raw.agg(F.sum("__h").alias("s")).collect()[0]["s"] or 1.0
        upd_h = nodes.join(h_raw, "node", "left").select(
            "node",
            (
                F.coalesce(F.col("__h"), F.lit(0.0)) / F.lit(float(h_tot))
            ).alias("h"),
        )
        if plan_probe is not None and it == 0:
            plan_probe["half_step_plans"].append(
                upd_h._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
            )
        new_hubs = upd_h.localCheckpoint(eager=True)
        release_local_checkpoint(h_raw)
        if tol is not None and auths is not None:
            delta = (
                auths.select("node", F.col("a").alias("__old"))
                .join(new_auths, "node")
                .agg(F.sum(F.abs(F.col("a") - F.col("__old"))).alias("d"))
                .collect()[0]["d"]
            )
        else:
            delta = None
        release_local_checkpoint(hubs)
        if auths is not None:
            release_local_checkpoint(auths)
        hubs, auths = new_hubs, new_auths
        if delta is not None and delta < tol:
            break
    out = auths.select("node", F.col("a").alias("authority")).join(
        hubs.select("node", F.col("h").alias("hub")), "node"
    ).localCheckpoint(eager=True)
    release_local_checkpoint(auths)
    release_local_checkpoint(hubs)
    release_local_checkpoint(nodes)
    release_local_checkpoint(by_src)
    release_local_checkpoint(by_dst)
    return out
