"""Near-dup pair graph -> dedup decision (SURVEY §2.11 X2 completion).

The pair finders (MinHash/SimHash/embedding-LSH) emit edges; a corpus
dedup needs the CLOSURE of those edges — A~B and B~C must collapse to one
survivor even when A~C was never emitted.  This module turns the edge
list into connected components and a deterministic keep/drop decision:

- ``connected_components``: iterative min-label propagation over the
  undirected edge list.  Each round joins every node's current label with
  its neighbors' and takes the min — pure DataFrame ops (explode both
  edge directions, groupBy min), converging in O(diameter) rounds.
  Near-dup graphs are overwhelmingly tiny cliques/chains (diameter ≤ ~3),
  so the loop exits after 2-4 bounded shuffles; ``max_iter`` caps
  pathological chains and the loop stops early on a converged count.
  Every iteration localCheckpoints the label frame: the lineage would
  otherwise double per round (the classic iterative-Spark trap).
- ``dedup_decision``: component id + keep flag (survivor = min id in the
  component — same deterministic-survivor rule as exact_dedup).
- ``connected_components_star`` (X78, round 12): the alternating
  large-star/small-star algorithm (Kiveris, Lattanzi, Mirrokni,
  Rastogi, Vassilvitskii, "Connected Components in MapReduce and
  Beyond", SoCC 2014) — converges in O(log n) ROUNDS regardless of
  diameter, where min-label propagation needs O(diameter).  Near-dup
  graphs are tiny cliques and either works; WEB graphs (X55/X56's
  host graphs, template chains) contain long paths where O(diameter)
  is the difference between 8 rounds and 800.  Same output contract
  as ``connected_components`` (component = min reachable id), pinned
  equal by test.

At 100 TB the edge list is vastly smaller than the corpus (only near-dup
candidates appear); the per-round shuffle is edge-bounded, and the final
decision joins back to the corpus on the id — a broadcast when the dup
set is small, an equi-join otherwise (left to AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
    cache_handles: list | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in the edge list;
    component = min node id reachable through the edges.

    Checkpoint lifecycle (VERDICT r7 #6): each superseded label frame
    is released IN-loop once the next one is materialized —
    ``localCheckpoint()`` defaults to EAGER, so every new_labels
    partition is computed at creation, before the ``changed`` count
    job even runs (ADVICE r8 #3: do NOT flip these to eager=False and
    rely on that count job — ``limit(1).count()`` does not compute all
    partitions) — after which iteration N-1's frame is dead; the edge
    frame is released on exit.  Only the FINAL label frame
    outlives the call: with ``cache_handles`` its CheckpointHandle is
    appended for the caller to release after materializing downstream;
    without, the ContextCleaner frees it on GC as before."""
    from covid19i2b2_spark.caching import (
        CheckpointHandle,
        release_local_checkpoint,
    )

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .dropDuplicates()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("component").alias("__nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("__nbr_min", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        # new_labels' EAGER checkpoint materialized in full at creation,
        # so the previous round's frame can be freed NOW instead of
        # waiting for GC — bounds live storage at 2 label frames
        # regardless of iteration count
        release_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    release_local_checkpoint(edges)
    if cache_handles is not None:
        cache_handles.append(CheckpointHandle(labels))
    return labels


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    cache_handles: list | None = None,
    plan_probe: dict | None = None,
) -> DataFrame:
    """(node, component) via alternating large-star/small-star
    (SoCC 2014) — O(log n) rounds on ANY topology (module docstring).

    One round = large-star (per-node min over the full neighborhood,
    strictly-larger neighbors relink to it: one groupBy + one join)
    then small-star (edges oriented big→small, the small side plus the
    key relink to the minimum: one groupBy + one join).  Convergence =
    the small-star edge set reproduces itself, checked with one
    (count, hash-sum) aggregate — no edge-set diff join.  The edge
    frame is localCheckpoint'ed per round and the superseded round
    released immediately (the connected_components lifecycle).

    ``plan_probe``: receives ``n_rounds``.  Non-convergence inside
    ``max_iter`` logs a WARNING and returns the partial merge — the
    same honesty contract as min-label's cap, but at 25 rounds this
    covers graphs of ~2^25 nodes, so hitting it flags a bug, not a
    big graph."""
    import logging

    from covid19i2b2_spark.caching import (
        CheckpointHandle,
        release_local_checkpoint,
    )

    nodes = (
        pairs.select(F.col(id_a).alias("node"))
        .unionByName(pairs.select(F.col(id_b).alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    prev_sig: tuple | None = None
    rounds = 0
    for it in range(max_iter):
        rounds = it + 1
        # --- large-star: key = every endpoint, full neighborhood ----
        bi = edges.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(
            edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = bi.groupBy("u").agg(F.min("v").alias("__mn"))
        m_l = F.least(F.col("u"), F.col("__mn"))
        # pin the large-star output before small-star consumes it
        # twice (the min aggregate AND the relink join): unpinned, the
        # bi-join subtree replicated ~3x in the round's physical plan
        # (7 joins observed where the algorithm has 2) — the exact
        # double-evaluation class VERDICT r11 #1 flagged in HITS
        large = (
            bi.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("hi"), m_l.alias("lo")
            )
            .filter(F.col("hi") != F.col("lo"))
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        # --- small-star over the large output (already hi>lo) -------
        # both emission branches — (every small neighbor, m) and
        # (the key, m) — come from ONE join via an array explode, so
        # mins_s is consumed once
        mins_s = large.groupBy("hi").agg(F.min("lo").alias("__m"))
        small_pre = (
            large.join(mins_s, "hi")
            .select(
                F.explode(F.array("lo", "hi")).alias("node"),
                F.col("__m").alias("root"),
            )
            .filter(F.col("node") != F.col("root"))
            .select(
                F.col("node").alias("hi"), F.col("root").alias("lo")
            )
            .dropDuplicates()
        )
        if plan_probe is not None and it == 0:
            # captured BEFORE the checkpoint (which replaces the plan
            # with an RDD scan) — this is the round's real work
            plan_probe["round_plan"] = (
                small_pre._jdf.queryExecution().executedPlan().toString()
            )
        small = small_pre.localCheckpoint(eager=True)
        release_local_checkpoint(large)
        release_local_checkpoint(edges)
        edges = small
        # bit_xor: order-insensitive, overflow-free under ANSI (a SUM
        # of xxhash64 values overflows long); rows are distinct, so
        # xor is a faithful set signature
        sig_row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64("hi", "lo")), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        logging.getLogger(__name__).warning(
            "connected_components_star: no convergence in %d rounds "
            "(edge signature still moving) — returning partial merge",
            max_iter,
        )
    if plan_probe is not None:
        plan_probe["n_rounds"] = rounds
    labels = (
        nodes.join(
            edges.select(
                F.col("hi").alias("node"), F.col("lo").alias("__root")
            ),
            "node",
            "left",
        )
        .select(
            "node", F.coalesce("__root", F.col("node")).alias("component")
        )
        .localCheckpoint(eager=True)
    )
    release_local_checkpoint(nodes)
    release_local_checkpoint(edges)
    if cache_handles is not None:
        cache_handles.append(CheckpointHandle(labels))
    return labels


def dedup_decision(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
    cache_handles: list | None = None,
) -> DataFrame:
    """Corpus + near-dup edges -> (id, component, keep).  Nodes outside
    any edge keep themselves (their own component); inside a component the
    min id survives — deterministic under retries and across runs.
    ``cache_handles`` receives the component frame's CheckpointHandle
    (see connected_components)."""
    comp = connected_components(
        pairs, id_a, id_b, max_iter, cache_handles=cache_handles
    ).withColumnRenamed("node", id_col)
    return df.join(comp, id_col, "left").select(
        id_col,
        F.coalesce("component", F.col(id_col)).alias("component"),
        (
            F.col("component").isNull() | (F.col(id_col) == F.col("component"))
        ).alias("keep"),
    )


def dedup_cluster_stats(decision: DataFrame) -> DataFrame:
    """Audit summary of a :func:`dedup_decision` frame — the numbers a
    curation run should log before anyone trusts its output.  Schema:
    (size, n_components, n_kept, n_dropped) — one row per component
    SIZE, plus a size=NULL grand-total row; the corpus dedup rate is
    grand.n_dropped / (grand.n_kept + grand.n_dropped).

    Shape: two aggregates over the (already edge-bounded) decision
    frame — nothing touches the corpus.  A healthy near-dup graph shows
    overwhelmingly size-2/3 components; a heavy tail of large
    components is the LSH-blowup smell worth alarming on."""
    per_comp = decision.groupBy("component").agg(
        F.count("*").alias("sz"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
    )
    by_size = per_comp.groupBy(F.col("sz").alias("size")).agg(
        F.count("*").cast("long").alias("n_components"),
        F.sum("kept").cast("long").alias("n_kept"),
        F.sum(F.col("sz") - F.col("kept")).cast("long").alias("n_dropped"),
    )
    # grand total derives from the per-size rows — no extra pass
    grand = by_size.agg(
        F.lit(None).cast("long").alias("size"),
        F.sum("n_components").cast("long").alias("n_components"),
        F.sum("n_kept").cast("long").alias("n_kept"),
        F.sum("n_dropped").cast("long").alias("n_dropped"),
    )
    return by_size.unionByName(grand).orderBy(F.col("size").asc_nulls_last())


def dedup_decision_by(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col: str,
    descending: bool = True,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
    cache_handles: list | None = None,
) -> DataFrame:
    """:func:`dedup_decision` with a QUALITY-AWARE survivor: within
    each component the row with the best ``order_col`` wins (max when
    ``descending``, else min), ties break to the LOWEST id so the
    choice stays deterministic under retries (the house survivor
    discipline).  This is what a curation pipeline actually wants —
    keep the longest / highest-quality-score duplicate, not whichever
    copy happened to get the smallest id (Lee et al. 2022 keep the
    longest member of each duplicate cluster for exactly this reason).

    Shape: the component labels come from the same edge-bounded
    min-label propagation; the survivor pick is ONE window over the
    decision frame partitioned by component — components are tiny by
    construction (the cluster-size audit alarms otherwise), so the
    window never concentrates meaningful data in one task.  A NULL
    ``order_col`` sorts worst (NULL quality never beats a scored row).
    Output: (id, component, keep) — drop-in for dedup_decision."""
    from pyspark.sql.window import Window

    comp = connected_components(
        pairs, id_a, id_b, max_iter, cache_handles=cache_handles
    ).withColumnRenamed("node", id_col)
    labeled = df.join(comp, id_col, "left").select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("component"),
        F.col(order_col).alias("__q"),
    )
    order = (
        F.col("__q").desc_nulls_last()
        if descending
        else F.col("__q").asc_nulls_last()
    )
    w = Window.partitionBy("component").orderBy(order, F.col(id_col))
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .select(
            id_col,
            "component",
            (F.col("__rn") == 1).alias("keep"),
        )
    )


def survivor_provenance(
    df: DataFrame,
    decision: DataFrame,
    id_col: str,
    collect_cols: list[str] | None = None,
    range_col: str | None = None,
) -> DataFrame:
    """X63 (round 11): per-component provenance rollup — what dedup
    must NOT silently discard.  Collapsing a near-dup cluster to one
    survivor is a data decision; licensing, takedown, and attribution
    are corpus-level obligations that attach to EVERY member, so the
    survivor needs the union of its cluster's provenance, not just its
    own row (the reason curation pipelines carry a "merged sources"
    column next to the kept text).

    Inputs: the corpus frame and a ``dedup_decision[_by]`` frame
    (id, component, keep).  Output: one row per component —

    - ``survivor_<id_col>``: the keep row's id;
    - ``n_members``: cluster size;
    - for each name in ``collect_cols``: ``<name>_set``, the sorted
      distinct values across ALL members (array — deterministic order,
      so downstream hashes/joins are stable);
    - for ``range_col``: ``first_<name>`` / ``last_<name>`` (min/max)
      — crawl-date spans, version ranges.

    Shape: one id-keyed join + one component-keyed aggregate.  The
    collected sets are cluster-bounded: near-dup components are tiny
    by construction (the cluster-size audit alarms otherwise), so no
    array grows past a cluster's distinct values."""
    joined = df.join(
        decision.select(id_col, "component", "keep"), id_col
    )
    aggs = [
        F.min(F.when(F.col("keep"), F.col(id_col))).alias(
            f"survivor_{id_col}"
        ),
        F.count("*").cast("long").alias("n_members"),
    ]
    for c in collect_cols or []:
        aggs.append(
            F.array_sort(F.array_distinct(F.collect_list(c))).alias(
                f"{c}_set"
            )
        )
    if range_col is not None:
        aggs.append(F.min(range_col).alias(f"first_{range_col}"))
        aggs.append(F.max(range_col).alias(f"last_{range_col}"))
    return joined.groupBy("component").agg(*aggs)
