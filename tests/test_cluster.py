"""Connected-components clustering + IVF ANN tests."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

import pytest

from aced_etl_pod_spark.functions.cluster import (
    connected_components,
    connected_components_with_stats,
    dedup_keep_one_per_cluster,
)
from aced_etl_pod_spark.functions.similarity import ivf_topk


def test_connected_components_known_graph(spark):
    # two chains + a singleton edge: {1,2,3,4}, {10,11}, {20,21}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    comps = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    n = 12  # diameter close to max_iter — min label must still reach the end
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    comps = connected_components(edges)
    assert comps.select("component").distinct().count() == 1


def test_connected_components_reports_convergence(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    labels, stats = connected_components_with_stats(edges)
    assert stats["converged"] and 1 <= stats["iterations"] <= 3
    assert labels.count() == 3


def test_connected_components_raises_when_iteration_capped(spark):
    """Diameter > max_iter: partial labels would silently under-merge
    duplicate clusters, so the strict variant must refuse."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)
    _, stats = connected_components_with_stats(edges, max_iter=2)
    assert stats == {"iterations": 2, "converged": False}


def test_dedup_keep_one_per_cluster(spark):
    df = spark.createDataFrame([(i, f"doc {i}") for i in range(6)], "doc_id long, text string")
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], "id_a long, id_b long")
    kept = sorted(
        r["doc_id"] for r in dedup_keep_one_per_cluster(df, pairs, "doc_id").collect()
    )
    # cluster {0,1,2} keeps 0; {4,5} keeps 4; 3 untouched
    assert kept == [0, 3, 4]


def _clustered_embeddings(spark, n_clusters=6, per_cluster=20, dim=16, seed=11):
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(per_cluster):
            rows.append((vid, [float(x + rng.gauss(0, 0.05)) for x in c]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_recall_vs_brute_force(spark):
    emb = _clustered_embeddings(spark)
    queries = emb.filter(F.col("vec_id") % 17 == 0)
    approx = ivf_topk(emb, queries, k=3, n_centroids=6, n_probe=2)
    a = {(r["q_id"], r["nbr_id"]) for r in approx.collect()}

    # exact: brute force per query over everything
    q = queries.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    from pyspark.sql import Window as W

    from aced_etl_pod_spark.functions.similarity import cosine_expr

    pairs = emb.crossJoin(q).filter(F.col("vec_id") != F.col("q_id")).withColumn(
        "cos", cosine_expr("embedding", "q_emb")
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    exact = {
        (r["q_id"], r["vec_id"])
        for r in pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    recall = len(a & exact) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9"


def test_end_to_end_dedup_pipeline(spark):
    """Full near-dup pipeline: corpus with planted dups → MinHash-LSH
    candidates → connected components → keep-one-per-cluster. Result must
    contain every base doc and none of the planted duplicates."""
    from tests.test_dedup import _corpus
    from aced_etl_pod_spark.functions.dedup import minhash_candidate_pairs

    df, planted = _corpus(spark, n_docs=40, n_dups=5)
    pairs = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.5)
    kept = {r["doc_id"] for r in dedup_keep_one_per_cluster(df, pairs, "doc_id").collect()}
    dup_ids = {b for _, b in planted}
    base_ids = {a for a, _ in planted}
    assert dup_ids.isdisjoint(kept), f"dups survived: {dup_ids & kept}"
    assert base_ids <= kept
    assert len(kept) == 40  # all originals, no dups


def test_pagerank_matches_dense_power_iteration(spark):
    """functions.graph.pagerank vs a dense NumPy power iteration with the
    identical dangling-mass formulation, on a small directed graph with
    dangling nodes (3 → nothing) and a cycle."""
    import numpy as np
    from aced_etl_pod_spark.functions.graph import pagerank

    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 3), (4, 0)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=12).collect()}

    nodes = sorted({u for e in edge_list for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n, d = len(nodes), 0.85
    out_deg = np.zeros(n)
    A = np.zeros((n, n))
    for s, t in edge_list:
        A[idx[t], idx[s]] += 1.0
        out_deg[idx[s]] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        dangling = r[out_deg == 0].sum()
        contrib = A @ np.divide(r, out_deg, out=np.zeros(n), where=out_deg > 0)
        r = (1 - d) / n + d * (contrib + dangling / n)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-12, (v, got[v], r[idx[v]])


def _pagerank_dense(edge_list, iterations, d=0.85):
    import numpy as np

    nodes = sorted({u for e in edge_list for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    A = np.zeros((n, n))
    for s, t in set(edge_list):
        A[idx[t], idx[s]] += 1.0
        out_deg[idx[s]] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = r[out_deg == 0].sum()
        contrib = A @ np.divide(r, out_deg, out=np.zeros(n), where=out_deg > 0)
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_self_loops_and_duplicate_edges(spark):
    from aced_etl_pod_spark.functions.graph import pagerank

    edge_list = [(0, 0), (0, 1), (0, 1), (1, 2), (2, 0), (3, 1)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    ref = _pagerank_dense(edge_list, 10)
    for v, expect in ref.items():
        assert abs(got[v] - expect) < 1e-12, (v, got[v], expect)


def test_pagerank_disconnected_components_sum_to_one(spark):
    from aced_etl_pod_spark.functions.graph import pagerank

    edge_list = [(0, 1), (1, 0), (5, 6), (6, 7), (7, 5)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=10).collect()}
    ref = _pagerank_dense(edge_list, 10)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v, expect in ref.items():
        assert abs(got[v] - expect) < 1e-12


def test_triangle_counts_known_graph(spark):
    """K4 has 4 triangles, each node in 3; an appended pendant edge and a
    disconnected pair join no triangle."""
    from itertools import combinations

    from aced_etl_pod_spark.functions.graph import orient_edges, triangle_counts

    k4 = list(combinations(range(4), 2))
    extra = [(3, 9), (20, 21)]
    edges = spark.createDataFrame(k4 + extra, ["u", "v"])
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # total triangles = sum per-node / 3
    assert sum(got.values()) // 3 == 4


def test_orient_edges_normalizes(spark):
    from aced_etl_pod_spark.functions.graph import orient_edges

    raw = [(1, 2), (2, 1), (2, 2), (3, 1), (1, 3), (1, 3)]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    got = sorted(tuple(r) for r in orient_edges(edges).collect())
    assert got == [(1, 2), (1, 3)]


def test_triangle_counts_direction_insensitive(spark):
    """A triangle supplied with mixed edge directions and duplicates counts
    once after orientation."""
    from aced_etl_pod_spark.functions.graph import orient_edges, triangle_counts

    raw = [(1, 2), (3, 2), (3, 1), (2, 1), (1, 3)]
    edges = orient_edges(spark.createDataFrame(raw, ["src", "dst"]))
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1}
