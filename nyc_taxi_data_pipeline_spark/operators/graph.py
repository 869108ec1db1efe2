"""Iterative graph algorithms: connected components by min-label
propagation.

The dedup pipeline needs TRUE duplicate clusters: pairwise near-dup edges
(A~B, B~C) must collapse transitively even when A~C itself missed the
similarity threshold. That is connected components — an inherently
iterative algorithm, the one class SURVEY.md §2 has no single-plan Spark
expression for.

Scale shape: each iteration is one join + one aggregation (both hash-
partitioned on node id); lineage is truncated per iteration with a lazy
localCheckpoint — without it the plan tree doubles every round and the
driver dies planning iteration ~15 (the canonical iterative-Spark trap).
Iterations needed = graph diameter, which for dedup clusters (near-cliques
of near-identical docs) is 2-3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component is
    the minimum node id reachable via undirected edges.

    Min-label propagation: every node starts labeled with itself; each
    round nodes take the min of their own and their neighbors' labels;
    fixpoint when no label changes. Raises if max_iterations is hit —
    silent partial convergence would mislabel clusters."""
    # materialize the edge list before symmetrizing — the union references
    # `edges` twice and would compute its (possibly expensive) upstream,
    # e.g. a pairwise-similarity verification, twice
    edges = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=False)
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iterations):
        neighbor_labels = sym.join(
            labels, sym["b"] == labels["node"]
        ).select(F.col("a").alias("node"), "label")
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.select("node", F.col("label").alias("old")), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster assignment for dedup: every row of `df` mapped to its
    duplicate-cluster representative (the min id in its component);
    rows with no near-dup edge are their own singleton cluster."""
    comp = connected_components(pairs, src="id_a", dst="id_b")
    out = df.join(comp, df[id_col] == comp["node"], "left")
    return out.withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("node")


def pagerank_fixed_iterations(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    dangling: str = "redistribute",
) -> DataFrame:
    """(node, pr) after a FIXED number of power iterations of PageRank over
    the directed edge list — the canonical iterative join-aggregate workload
    (each iteration: one shuffle-join of the rank vector against the edge
    list + one hash aggregation on the destination).

    All arithmetic is SCALED-INTEGER (ranks are bigints summing to ~`scale`,
    `div` floor division everywhere), so the result is bit-identical in any
    engine — no float summation-order drift — and the catalog entry gets a
    REAL cross-engine oracle (unrolled CTEs) instead of a rows-only check,
    unusual for an iterative algorithm. Callers pass a symmetrized edge list
    for undirected graphs.

    `dangling` picks the treatment of nodes with out-degree 0:
      * "redistribute" (default) — the standard formulation: each
        iteration sums the rank mass sitting on dangling nodes (one tiny
        aggregate, broadcast back) and spreads it uniformly, so total
        mass is conserved up to floor-division dust;
      * "leak" — dangling mass vanishes (the power-iteration-over-edges
        shortcut); only correct when the caller knows the graph has no
        dangling sources, so it is opt-in, not silently the default.

    Lineage discipline: on the "redistribute" path the rank frame is
    localCheckpointed per iteration (it feeds two consumers per round, so
    an un-truncated tree recomputes per consumer and doubles every
    round); on the "leak" path the rank chain has a single consumer per
    round, so the bounded loop builds ONE query over the checkpointed
    edge/node frames with no per-iteration checkpoint."""
    if dangling not in ("redistribute", "leak"):
        raise ValueError(f"dangling must be 'redistribute' or 'leak': {dangling!r}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=False
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_frame = nodes.agg(F.count(F.lit(1)).alias("__n"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    if dangling == "redistribute":
        # the per-iteration dangling-mass anti-join probes deg directly —
        # checkpoint it so the aggregation is not recomputed every round
        deg = deg.localCheckpoint(eager=False)
    # r9 plan-shape restructure (guide §2.4: remove shuffles/stages
    # outright; values bit-identical — every lane is bigint arithmetic):
    #   * the per-src degree is folded INTO the edge list ONCE (e2), so
    #     each iteration runs ONE join against the rank vector instead of
    #     an edge join followed by a degree join;
    #   * the node count rides as a constant column on a once-checkpointed
    #     node frame (nodes2) instead of being re-aggregated and
    #     re-broadcast inside every iteration's subtree.
    e2 = e.join(deg, "src").localCheckpoint(eager=False)
    nodes2 = nodes.crossJoin(F.broadcast(n_frame)).localCheckpoint(eager=False)
    teleport = F.expr(f"({100 - damping_pct} * {scale}L) div (100 * __n)")
    pr = nodes2.select("node", F.expr(f"{scale}L div __n").alias("pr"))
    for _ in range(iterations):
        summed = (
            e2.join(pr.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("pr div __deg").alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        if dangling == "redistribute":
            # mass sitting on out-degree-0 nodes this iteration: one tiny
            # aggregate (anti-join against the degree frame), broadcast
            # back and spread uniformly — conserves total mass
            dang = (
                pr.join(deg, pr["node"] == deg["src"], "left_anti")
                .agg(F.coalesce(F.sum("pr"), F.lit(0)).alias("__d"))
            )
            inflow = F.expr(
                f"({damping_pct} * (coalesce(__s, 0L) + __d div __n)) div 100"
            )
            base = nodes2.crossJoin(F.broadcast(dang))
        else:
            inflow = F.expr(f"({damping_pct} * coalesce(__s, 0L)) div 100")
            base = nodes2
        pr = base.join(summed, "node", "left").select(
            "node", (teleport + inflow).alias("pr")
        )
        if dangling == "redistribute":
            # the rank frame feeds TWO consumers next round (inflow join +
            # dangling aggregate) — checkpoint or both recompute it. On the
            # "leak" path pr is a SINGLE-consumer chain: 3 bounded
            # iterations build one query with no duplicated subtree, so the
            # per-iteration checkpoint (and its serialized AQE
            # stage-materialization at build time) is dropped outright.
            pr = pr.localCheckpoint(eager=False)
    return pr
