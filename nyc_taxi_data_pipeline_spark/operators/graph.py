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
