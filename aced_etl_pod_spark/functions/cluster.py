"""Connected components over candidate-pair edges (dedup cluster merging).

Near-dup pairs (MinHash/SimHash output) must be merged into clusters before
keep-one-per-cluster dedup. Algorithm: iterative min-label propagation
(the join-based star-contraction family — cf. PAPERS.md large-graph CC
literature): every node starts labeled with itself; each round, every node
takes the min label among itself and its neighbors; converged when no label
changes. Rounds = O(graph diameter); every round is one shuffle-join —
no driver-side graph state, so it scales with the cluster, not the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 15
) -> DataFrame:
    """Label every node reachable through ``edges`` with its component's min
    node id. Returns (node, component). Raises if ``max_iter`` rounds were
    not enough to converge (see :func:`connected_components_with_stats`)."""
    labels, stats = connected_components_with_stats(edges, src, dst, max_iter)
    if not stats["converged"]:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            f"(graph diameter > {max_iter}); raise max_iter — returning "
            "partial labels would over-keep rows in keep-one-per-cluster dedup"
        )
    return labels


def connected_components_with_stats(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 15
) -> tuple[DataFrame, dict]:
    """Min-label propagation CC that also reports convergence metadata:
    ``{"iterations": n, "converged": bool}``. At 100 TB the iteration cap
    bounds the shuffle-rounds cost; callers must check ``converged`` (or use
    :func:`connected_components`, which raises) because unconverged labels
    split real components and silently under-merge duplicate clusters."""
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .cache()
    )
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    converged = False
    iterations = 0
    for _ in range(max_iter):
        neighbor_min = (
            bidir.join(labels, bidir.v == labels.node)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        # localCheckpoint truncates lineage each round — without it the plan
        # nests every prior iteration and analysis time explodes (the
        # standard iterative-DataFrame pitfall).
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
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
        labels = new_labels
        iterations += 1
        if changed == 0:
            converged = True
            break
    bidir.unpersist()
    return labels, {"iterations": iterations, "converged": converged}


def dedup_keep_one_per_cluster(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Given near-dup ``pairs`` (id_a, id_b), keep exactly one row (the min
    id) per duplicate cluster plus every unpaired row."""
    comps = connected_components(pairs)
    keep_of_cluster = comps.groupBy("component").agg(F.min("node").alias("keep"))
    drop = (
        comps.join(keep_of_cluster, "component")
        .filter(F.col("node") != F.col("keep"))
        .select(F.col("node").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")
