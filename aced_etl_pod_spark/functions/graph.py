"""Join-based PageRank (graph analytics over edge DataFrames).

Same execution discipline as functions/cluster.py's connected components:
every iteration is a shuffle-join + aggregate with NO driver-side graph
state, so the algorithm scales with the cluster. The one driver-side value
per iteration is the dangling-node rank mass — a single scalar (standard in
distributed PageRank: dangling mass must be redistributed globally, and a
1-row aggregate is the cheapest way to close that loop; it does not grow
with the graph). ``localCheckpoint`` truncates the lineage each round so
the plan does not grow exponentially with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank) with ranks summing to 1. Dangling nodes (no
    out-edges) donate their rank uniformly to all nodes each round, per the
    standard formulation: r' = (1-d)/N + d * (in-contributions + dangling/N).
    """
    # Checkpoint the (possibly expensive) edge build ONCE — contrib joins e
    # every round, and without this the upstream plan (e.g. a fact-fact join
    # producing the edges) would re-execute per iteration.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count("*").alias("deg")).localCheckpoint(True)
    # The dangling-node SET is static; precompute it once so the per-round
    # dangling mass is a semi-join + 1-row aggregate folded into the round's
    # plan as a broadcast (no separate driver-side action per iteration).
    dangling_nodes = nodes.join(
        out_deg, nodes.node == out_deg.src, "left_anti"
    ).localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(iterations):
        dangling_mass = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        in_rank = contrib.groupBy("node").agg(F.sum("c").alias("in_rank"))
        ranks = (
            nodes.join(in_rank, "node", "left")
            .crossJoin(F.broadcast(dangling_mass))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_rank"), F.lit(0.0)) + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_counts(edges: DataFrame, u: str = "u", v: str = "v") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    ``edges`` must be acyclically oriented by ANY strict total order on
    vertices, with no self-loops and no duplicates (the caller's
    contract; :func:`orient_edges` / :func:`orient_edges_by_degree`
    below normalize a raw edge list). Under a total order every triangle
    {a<b<c} is enumerated exactly once as (a,b)⋈(b,c)⋈(a,c) — two
    equi-joins hash-partitioned on a vertex key, never a cross join and
    no post-hoc division by orientation count — and the resulting
    per-node participation counts are orientation-INVARIANT (each
    triangle contributes one row per corner regardless of which order
    produced it). Returns (node, n_triangles) for nodes in ≥1
    triangle."""
    e = edges.select(F.col(u).alias("u"), F.col(v).alias("v"))
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def orient_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Normalize a raw (possibly directed / duplicated) edge list into the
    canonical undirected form triangle_counts expects: low → high, no
    self-loops, distinct."""
    a, b = F.col(src), F.col(dst)
    return (
        edges.filter(a != b)
        .select(F.least(a, b).alias("u"), F.greatest(a, b).alias("v"))
        .distinct()
    )


def orient_edges_by_degree(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """:func:`orient_edges` hardened for hub skew (guide §2.5, round-13
    verdict item 1): orient each undirected edge from the lower to the
    higher endpoint under the strict total order (degree, id) instead of
    raw id. triangle_counts' path join (a,b)⋈(b,c) materializes
    Σ_b indeg(b)·outdeg(b) candidate rows; under raw-id orientation a
    hub with a mid-range id splits its neighbors ~half below / ~half
    above — deg(hub)²/4 candidates through one vertex (and one shuffle
    key). Under (degree, id) order every vertex's OUT-neighbors carry
    degree ≥ its own, which caps outdeg at O(sqrt(m)) on any graph —
    the fan-out is ≤ m·O(sqrt(m)) total, and a hub (globally last)
    contributes zero. Triangle counts are orientation-invariant (see
    triangle_counts), so results are identical to the id orientation on
    every input; the cost is one degree aggregation + two joins against
    the (node, deg) table — metadata-sized next to the path join they
    bound."""
    und = orient_edges(edges, src, dst)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    ed = und.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return ed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("u"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("v"),
    )
