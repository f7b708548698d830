"""Similarity-search tests: exact kernel sanity + ANN recall vs the
brute-force baseline on clustered synthetic vectors."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from aced_etl_pod_spark.functions.similarity import (
    brute_force_topk,
    brute_force_topk_fast,
    brute_force_topk_unrolled,
    cosine_expr,
    random_hyperplanes,
    signature_bucket,
)


def _clustered(spark, n_clusters=8, per_cluster=12, dim=16, seed=3):
    rng = random.Random(seed)
    centers = [
        [rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    vid = 0
    for c, center in enumerate(centers):
        for _ in range(per_cluster):
            vec = [x + rng.gauss(0, 0.05) for x in center]
            rows.append((vid, c, [float(v) for v in vec]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")


def test_cosine_self_similarity_is_one(spark):
    df = _clustered(spark, n_clusters=1, per_cluster=1)
    paired = df.select(
        F.col("embedding").alias("a"), F.col("embedding").alias("b")
    ).select(cosine_expr("a", "b").alias("cos"))
    assert abs(paired.first()["cos"] - 1.0) < 1e-12


def test_brute_force_topk_finds_own_cluster(spark):
    df = _clustered(spark)
    q = df.filter(F.col("vec_id") == 0).select("embedding")
    top = brute_force_topk(df, q, k=12).collect()
    labels = (
        df.select("vec_id", "label").toPandas().set_index("vec_id")["label"].to_dict()
    )
    # all top-12 matches for a cluster-0 vector are cluster 0
    assert all(labels[r["vec_id"]] == 0 for r in top)


def test_lsh_buckets_group_clusters(spark):
    """Sign-LSH on tightly clustered vectors: same-cluster vectors must land
    in the same bucket (their sign pattern is the center's)."""
    df = _clustered(spark)
    planes = random_hyperplanes(dim=16, n_planes=6)
    b = df.withColumn("bucket", signature_bucket("embedding", planes))
    per_cluster_buckets = (
        b.groupBy("label").agg(F.countDistinct("bucket").alias("nb")).collect()
    )
    # tight clusters (σ=0.05 around unit-scale centers) almost never straddle
    # a hyperplane; allow at most 2 buckets per cluster
    assert all(r["nb"] <= 2 for r in per_cluster_buckets)


def test_topk_kernels_agree(spark):
    """The three cosine kernels (interpreted HOF fold, codegen-unrolled
    literals, Arrow+numpy) must return identical top-k at 6 dp — same ids,
    same order, same rounded scores."""
    df = _clustered(spark)
    q = df.filter(F.col("vec_id") == 0)

    def rows(topk):
        return [
            (r["vec_id"], round(r["cos_sim"], 6))
            for r in topk.select("vec_id", F.round("cos_sim", 6).alias("cos_sim")).collect()
        ]

    fold = rows(brute_force_topk(df, q, k=8))
    unrolled = rows(brute_force_topk_unrolled(df, q, k=8))
    arrow = rows(brute_force_topk_fast(df, q, k=8))
    assert fold == unrolled == arrow


def test_ann_recall_vs_brute_force(spark):
    """Recall@3 of the bucketed ANN against exact per-label kNN ≥ 0.9 on
    clustered data (the standard ANN acceptance gate)."""
    df = _clustered(spark)
    planes = random_hyperplanes(dim=16, n_planes=6)
    bucketed = df.withColumn("bucket", signature_bucket("embedding", planes))

    def topk(joined_key: str):
        a = bucketed.select(
            F.col("vec_id").alias("vec_id"), joined_key, F.col("embedding").alias("ea")
        )
        b = bucketed.select(
            F.col("vec_id").alias("nbr_id"), joined_key, F.col("embedding").alias("eb")
        )
        from pyspark.sql import Window as W

        pairs = (
            a.join(b, joined_key)
            .filter(F.col("vec_id") != F.col("nbr_id"))
            .withColumn("cos", cosine_expr("ea", "eb"))
        )
        w = W.partitionBy("vec_id").orderBy(F.desc("cos"), "nbr_id")
        return (
            pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("vec_id", "nbr_id")
        )

    exact = {(r["vec_id"], r["nbr_id"]) for r in topk("label").collect()}
    approx = {(r["vec_id"], r["nbr_id"]) for r in topk("bucket").collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ANN recall {recall:.2f} < 0.9"


def test_embedding_quantize_int8_bounds(spark):
    """Quantized codes stay in [-127, 127] and reconstruction error is
    bounded by half a quantization step (scale/254)."""
    from aced_etl_pod_spark.registry import registry

    from tests.conftest import SF_SMALL

    df = registry()["embedding_quantize_int8"].fn(spark, SF_SMALL)
    emb = {r["vec_id"]: r["embedding"] for r in
           spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()}
    rows = df.collect()
    assert rows
    for r in rows:
        # qvec is emitted as its canonical string form "[q0,q1,...]" so the
        # column stays scalar/hashable for downstream canonicalizers
        assert r["qvec"].startswith("[") and r["qvec"].endswith("]")
        q = [int(t) for t in r["qvec"][1:-1].split(",")]
        s = r["qscale"]
        assert max(abs(x) for x in q) <= 127
        orig = emb[r["vec_id"]]
        assert len(q) == len(orig)
        step = s / 127.0
        for x, qi in zip(orig, q):
            # qscale is rounded to 6dp, so allow that slack on top of step/2
            assert abs(float(x) - qi * step) <= step / 2 + 2e-6, (r["vec_id"], x, qi)


def test_lsh_planes_scale_with_corpus():
    """The plane count must track corpus size so expected bucket occupancy
    stays bounded — the 100× question: parameters, not just plan shape."""
    from aced_etl_pod_spark.functions.similarity import lsh_planes_for

    for n in (100, 2_000, 200_000, 20_000_000, 2_000_000_000):
        p = lsh_planes_for(n, target_bucket=64)
        assert 4 <= p <= 24
        expected_occupancy = n / 2**p
        # either occupancy is within 2x of target, or we hit the plane cap
        assert expected_occupancy <= 2 * 64 or p == 24, (n, p, expected_occupancy)
    # monotone: more data never means fewer planes
    planes = [lsh_planes_for(n) for n in (1_000, 10_000, 100_000, 1_000_000)]
    assert planes == sorted(planes)


def test_ivf_centroids_scale_with_corpus():
    from aced_etl_pod_spark.functions.similarity import ivf_centroids_for

    assert ivf_centroids_for(2_000) == 44  # ~sqrt(n)
    assert ivf_centroids_for(100) == 10
    assert ivf_centroids_for(10_000_000_000) == 65536  # clamped
    # cell width n/C stays O(sqrt(n)), not O(n)
    for n in (10_000, 1_000_000, 100_000_000):
        c = ivf_centroids_for(n)
        assert n / c <= 2 * math.sqrt(n) + 1


def test_ann_lsh_degenerate_bucket_capped(spark):
    """A mass of identical vectors (one mega-bucket) must be dropped by the
    max_bucket_size cap, not joined quadratically — mirrors the
    minhash_band_candidates degenerate-key guard."""
    from aced_etl_pod_spark.functions.similarity import ann_lsh_topk

    same = [(i, 0, [1.0] * 8) for i in range(60)]
    distinct = [
        (100 + i, 1, [float(j == i) for j in range(8)]) for i in range(8)
    ]
    df = spark.createDataFrame(
        same + distinct, "vec_id long, label int, embedding array<float>"
    )
    out = ann_lsh_topk(df, k=2, target_bucket=2, max_bucket_size=10)
    ids = {r["vec_id"] for r in out.collect()}
    # none of the 60-identical mega-bucket members survive the cap
    assert all(i >= 100 or i not in ids for i in range(60))


def test_ann_lsh_topk_recall_on_clustered(spark):
    """End-to-end recall of the scale-parameterized ann_lsh_topk vs exact
    per-label kNN on clustered data (the op-level acceptance gate)."""
    from aced_etl_pod_spark.functions.similarity import ann_lsh_topk
    from pyspark.sql import Window as W

    df = _clustered(spark)
    approx = {
        (r["vec_id"], r["nbr_id"])
        for r in ann_lsh_topk(df, k=3, target_bucket=16).collect()
    }
    a = df.select("vec_id", "label", F.col("embedding").alias("ea"))
    b = df.select(
        F.col("vec_id").alias("nbr_id"), "label", F.col("embedding").alias("eb")
    )
    pairs = (
        a.join(b, "label")
        .filter(F.col("vec_id") != F.col("nbr_id"))
        .withColumn("cos", cosine_expr("ea", "eb"))
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cos"), "nbr_id")
    exact = {
        (r["vec_id"], r["nbr_id"])
        for r in pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("vec_id", "nbr_id")
        .collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ann_lsh_topk recall {recall:.2f} < 0.9"


# -- Product quantization (functions/pq.py) --------------------------------


def _emb_matrix(spark):
    import numpy as np

    rows = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    return X, ids


def test_pq_roundtrip_beats_random_codebook(spark):
    """Trained codebooks must reconstruct much better than the naive bound:
    unit vectors quantized to the zero vector have error 1.0; trained PQ
    must land well under it on average."""
    import numpy as np

    from aced_etl_pod_spark.functions.pq import (
        decode_codes,
        encode_batch,
        train_codebooks,
    )

    X, _ = _emb_matrix(spark)
    books = train_codebooks(X[:512], m=8, k=16, iters=10)
    codes = encode_batch(X, books)
    assert codes.shape == (len(X), 8) and codes.dtype == np.uint8
    err = np.sqrt(((X - decode_codes(codes, books)) ** 2).sum(axis=1))
    assert err.mean() < 0.85  # measured ~0.74; zero-codebook bound is 1.0


def test_pq_codes_deterministic_across_partitionings(spark):
    """Same codes and errors whether the table arrives in 1 partition or
    13 — codebooks are trained once on the deterministic sample, so the
    distributed encode cannot depend on data placement."""
    from aced_etl_pod_spark.operators.similarity import embedding_pq_codes

    a = {r["vec_id"]: (r["pq_code"], r["recon_err"])
         for r in embedding_pq_codes(spark, SF_SMALL).collect()}
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        b = {r["vec_id"]: (r["pq_code"], r["recon_err"])
             for r in embedding_pq_codes(spark, SF_SMALL).collect()}
    finally:
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
    assert a == b and len(a) == 500


def test_pq_adc_recall_vs_exact(spark):
    """ADC top-10 must overlap the exact L2 top-10 (≥3) and sit almost
    entirely inside the exact top-50 (≥8) — the compressed-domain search
    is approximate but must not be noise. (Measured: 4/10 and 10/10 on
    this corpus; thresholds leave margin for testdata regeneration.)"""
    import numpy as np

    from aced_etl_pod_spark.operators.similarity import sim_ann_pq_adc_topk

    X, ids = _emb_matrix(spark)
    q = X[ids == 0][0]
    mask = ids != 0
    d = ((X[mask] - q) ** 2).sum(axis=1)
    order = np.argsort(d, kind="stable")
    exact10 = set(ids[mask][order[:10]].tolist())
    exact50 = set(ids[mask][order[:50]].tolist())
    got = [r["vec_id"] for r in sim_ann_pq_adc_topk(spark, SF_SMALL).collect()]
    assert len(got) == 10
    assert len(set(got) & exact10) >= 3
    assert len(set(got) & exact50) >= 8


def test_pq_compression_ratio():
    """The stored code is 8 bytes (16 hex chars) per 64-float vector: 32×
    smaller than float32, 64× smaller than float64."""
    import numpy as np

    from aced_etl_pod_spark.functions.pq import encode_batch, train_codebooks

    rng = np.random.default_rng(3)
    X = rng.normal(size=(256, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    books = train_codebooks(X, m=8, k=16, iters=5)
    codes = encode_batch(X, books)
    assert codes.nbytes * 32 == X.astype(np.float32).nbytes


def test_ivfpq_recall_and_probe_fraction(spark):
    """IVF-PQ must stay a usable approximation (top-10 overlaps exact
    top-10 by >=2 and exact top-50 by >=5 — measured 3 and 7) while only
    probing 4 of 16 cells, i.e. the candidate set that does PQ work is a
    strict subset of the corpus."""
    import numpy as np

    from aced_etl_pod_spark.functions.pq import train_codebooks
    from aced_etl_pod_spark.operators.similarity import sim_ann_ivf_pq_topk

    X, ids = _emb_matrix(spark)
    q = X[ids == 0][0]
    mask = ids != 0
    d = ((X[mask] - q) ** 2).sum(axis=1)
    order = np.argsort(d, kind="stable")
    exact10 = set(ids[mask][order[:10]].tolist())
    exact50 = set(ids[mask][order[:50]].tolist())
    got = [r["vec_id"] for r in sim_ann_ivf_pq_topk(spark, SF_SMALL).collect()]
    assert len(got) == 10
    assert len(set(got) & exact10) >= 2
    assert len(set(got) & exact50) >= 5
    # probe fraction: cells hold ~n/16 each; 4 probed cells must cover
    # well under the whole corpus (sanity on the coarse quantizer)
    S = X[:512]
    coarse = train_codebooks(S, m=1, k=16, iters=10)[0]
    cells = ((X[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    cd2 = ((coarse - q[None, :]) ** 2).sum(axis=1)
    probed = set(np.argsort(cd2, kind="stable")[:4].tolist())
    frac = np.isin(cells, list(probed)).mean()
    assert frac < 0.8


def test_ivf_index_build_probe_roundtrip(spark, tmp_path):
    """The persisted-index serving path (bench's q8_ivf line): build on
    the corpus, probe the vec_id=0 query, and require (a) the bucketed
    cells layout on disk (round-10, SCALE.md item 6: partitionBy(bkt),
    cid a sorted data column — NOT one file per cell), (b) probe
    recall@10 == 1.0 vs the exact scan at this n_probe on the small
    corpus, (c) schema/order contract."""
    import os

    from aced_etl_pod_spark.functions.similarity import (
        brute_force_topk_unrolled,
        ivf_buckets_for,
        ivf_index_build,
        ivf_index_probe,
    )
    from aced_etl_pod_spark.tables import load

    emb = load(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    ncent = ivf_index_build(emb, path)
    assert ncent >= 4
    bkts = [d for d in os.listdir(f"{path}/cells") if d.startswith("bkt=")]
    dim = len(emb.select("embedding").head()[0])
    expect_b = ivf_buckets_for(emb.count(), dim, ncent)
    assert len(bkts) == expect_b, (bkts, expect_b)
    assert not any(
        d.startswith("cid=") for d in os.listdir(f"{path}/cells")
    ), "per-cell hive layout is the retired round-9 layout"
    cells_df = spark.read.parquet(f"{path}/cells")
    assert [f.name for f in cells_df.schema] == [
        "vec_id", "embedding", "cid", "bkt",
    ], cells_df.schema
    q = emb.filter("vec_id = 0")
    got = ivf_index_probe(spark, path, q, k=10, n_probe=max(4, ncent // 2))
    # file-level pruning happens on the bucket key: the scan's partition
    # filter must be on bkt (PartitionFilters in the formatted plan)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "bkt" in plan.split("PartitionFilters", 1)[-1][:200], plan[:1500]
    rows = got.collect()
    assert [c for c in got.columns] == ["vec_id", "cos_sim"]
    exact = [r["vec_id"] for r in brute_force_topk_unrolled(emb, q, k=10).collect()]
    assert set(r["vec_id"] for r in rows) == set(exact)


def test_ivf_index_probe_many_batch_serving(spark, tmp_path):
    """Batch serving: every query's top-k from the persisted index must
    equal its single-query probe at the same n_probe, and the candidate
    join must reach the cells scan as a partition-level filter (DPP or
    static pruning — the scan must not read every cell file)."""
    from aced_etl_pod_spark.functions.similarity import (
        ivf_index_build,
        ivf_index_probe,
        ivf_index_probe_many,
    )
    from aced_etl_pod_spark.tables import load

    emb = load(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    ncent = ivf_index_build(emb, path)
    queries = emb.filter("vec_id % 100 = 0")
    np_ = max(4, ncent // 4)
    batch = ivf_index_probe_many(
        spark, path, queries, k=5, n_probe=np_, broadcast_queries=True
    )
    got = {
        (r["q_id"], r["nbr_id"]): r["cos_sim"] for r in batch.collect()
    }
    assert got, "batch probe returned nothing"
    for q_id in [r[0] for r in queries.select("vec_id").collect()][:3]:
        single = ivf_index_probe(
            spark, path, emb.filter(f"vec_id = {q_id}"), k=6, n_probe=np_
        )
        # single probe includes the query row itself (exact-scan parity);
        # the batch path excludes self — compare on the non-self prefix
        srows = [
            r["vec_id"] for r in single.collect() if r["vec_id"] != q_id
        ][:5]
        brows = [nbr for (q, nbr) in sorted(
            ((q, n) for (q, n) in got if q == q_id),
            key=lambda t: (-got[t], t[1]),
        )]
        assert set(srows) <= set(brows) | {q_id}, (q_id, srows, brows)


def test_ivf_probe_many_never_hashes_the_cells_side(spark, tmp_path):
    """Round-9 regression pin, restated for the round-10 strategies: the
    CELLS side must never be collected into a hash relation. On the
    bounded-Q path (broadcast_queries=True, now a driver-ranked gemm
    kernel) there is NO join at all — the plan is a statically pruned
    scan feeding mapInArrow (PushedFilters carry the probed cids, a
    PythonMapInArrow node scores them); the r9 bug (a corpus-sized
    cells-side HashedRelation rebuilt per execution, 20.6 s -> 3.8 s at
    x40/Q=256) is structurally impossible. The corpus-fraction path
    (broadcast_queries=False) keeps the distributed join and leaves the
    build side to AQE's runtime sizes by design — both its inputs are
    unbounded at scale, so no orientation is pinned (ADVICE round-10)."""
    from aced_etl_pod_spark.functions.similarity import (
        ivf_index_build,
        ivf_index_probe_many,
    )
    from aced_etl_pod_spark.tables import load

    emb = load(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_index_build(emb, path)
    batch = ivf_index_probe_many(
        spark,
        path,
        emb.filter("vec_id % 100 = 0"),
        k=5,
        n_probe=4,
        broadcast_queries=True,
    )
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan, plan[:1500]
    assert "Join" not in plan, (
        "bounded-Q path must score via the gemm kernel, not a join:\n"
        + plan[:1500]
    )
    assert "PushedFilters: [In(bkt" in plan or "In(cid" in plan, (
        "probed-cells static pruning missing:\n" + plan[:1500]
    )


def test_ivf_probe_many_gemm_equals_join_path(spark, tmp_path):
    """The round-10 bounded-Q gemm kernel and the corpus-fraction
    distributed join plan are two physical strategies for ONE logical
    operator — on the same index and query set they must return the
    same (q_id, nbr_id) sets with cosines agreeing at the 6-dp rounding
    both paths emit (BLAS pairwise summation vs the HOF's sequential
    fold differ only in the last ulp — the sim_cosine_topk_fast
    precedent)."""
    from aced_etl_pod_spark.functions.similarity import (
        ivf_index_build,
        ivf_index_probe_many,
    )
    from aced_etl_pod_spark.tables import load

    emb = load(spark, SF_SMALL, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_index_build(emb, path)
    queries = emb.filter("vec_id % 50 = 0")
    gemm = ivf_index_probe_many(
        spark, path, queries, k=5, n_probe=4, broadcast_queries=True
    )
    join = ivf_index_probe_many(
        spark, path, queries, k=5, n_probe=4, broadcast_queries=False
    )
    g = {(r["q_id"], r["nbr_id"]): r["cos_sim"] for r in gemm.collect()}
    j = {(r["q_id"], r["nbr_id"]): r["cos_sim"] for r in join.collect()}
    assert g and set(g) == set(j), (
        f"pair sets differ: only-gemm={sorted(set(g)-set(j))[:5]} "
        f"only-join={sorted(set(j)-set(g))[:5]}"
    )
    for key in g:
        assert abs(g[key] - j[key]) < 1e-9, (key, g[key], j[key])


def test_multiprobe_queries_param_matches_allpairs_restriction(spark):
    """Round-12 escalation-tier plumbing: ann_lsh_multiprobe_topk's
    ``queries`` parameter (serving shape — only the query set probes)
    must return exactly the all-pairs result restricted to those query
    ids: same planes (sized from the CORPUS, not the query set), same
    buckets, same ties."""
    from pyspark.sql import functions as F

    from aced_etl_pod_spark.functions.similarity import (
        ann_lsh_multiprobe_topk,
    )
    from aced_etl_pod_spark.tables import load
    from tests.conftest import SF_SMALL

    emb = load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    qset = emb.filter(F.col("vec_id") % 50 == 0)
    full = {
        tuple(r)
        for r in ann_lsh_multiprobe_topk(emb, k=3).collect()
        if r["vec_id"] % 50 == 0
    }
    sub = {
        tuple(r)
        for r in ann_lsh_multiprobe_topk(emb, k=3, queries=qset).collect()
    }
    assert sub == full and len(sub) > 0
