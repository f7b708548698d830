"""Advanced operators: dup-cluster merging (connected components),
stream-stream joins, IVF approximate NN, regex token counting — the
deeper algorithmic layer on top of the core families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aced_etl_pod_spark.functions.cluster import connected_components
from aced_etl_pod_spark.functions.dedup import (
    duck_minhash_pairs_cte,
    minhash_candidate_pairs,
)
from aced_etl_pod_spark.operators.util import finite, finite_sql, money, money_sql
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.streaming.replay import (
    materialize_batches,
    nudge_batch,
    read_stream,
    run_to_memory,
)
from aced_etl_pod_spark.tables import load


# Full oracle since round 6: the minhash pairs replay in SQL
# (functions/dedup.py::duck_minhash_pairs_cte), and min-label-propagation
# CC converges to the component's min node id — which a recursive-CTE
# transitive closure computes directly (min reachable id per node). The
# iterative Spark algorithm and the set-semantics recursion meet at the
# same fixpoint, so the oracle is exact, not a proxy.
DEDUP_CLUSTER_CC_ORACLE = f"""
    WITH RECURSIVE {duck_minhash_pairs_cte()},
    cc_edges AS (SELECT id_a AS u, id_b AS v FROM mh_pairs
                 UNION SELECT id_b, id_a FROM mh_pairs),
    cc_reach AS (
      SELECT u AS node, u AS r FROM cc_edges
      UNION
      SELECT cc_reach.node, e.v FROM cc_reach JOIN cc_edges e ON e.u = cc_reach.r
    ),
    cc_comp AS (SELECT node, min(r) AS component FROM cc_reach GROUP BY 1),
    cc_sz AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
              FROM cc_comp GROUP BY 1)
    SELECT cc_comp.node AS doc_id, cc_comp.component, cc_sz.cluster_size
    FROM cc_comp JOIN cc_sz USING (component)
"""


@op("dedup_cluster_cc", oracle=DEDUP_CLUSTER_CC_ORACLE,
    tags=("dedup", "approx", "extra"))
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: MinHash-LSH candidate pairs → join-based connected
    components → cluster id + size per clustered doc. Full hash oracle
    since round 6 (DEDUP_CLUSTER_CC_ORACLE replays the pairs and closes
    them transitively); exact cluster semantics additionally proven on a
    known graph in tests/test_cluster.py."""
    d = load(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(d, "doc_id", "text", threshold=0.5)
    comps = connected_components(pairs)
    sizes = comps.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comps.join(sizes, "component").select(
        F.col("node").alias("doc_id"), "component", "cluster_size"
    )


@op(
    "stream_stream_join",
    oracle="""
    SELECT l.event_id,
           CAST(count(*) AS BIGINT) AS n_clicks_before
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
    GROUP BY l.event_id
    """,
    tags=("stream", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases ⋈ clicks within the preceding
    hour, per user. Both sides watermarked; the time-range condition bounds
    the join state (without it, stream-stream state grows forever — the
    100 TB failure mode). INNER join: matches emit as soon as both sides
    arrive, so full replay equals the batch interval join (an OUTER
    stream-stream join would withhold end-of-stream unmatched rows until a
    watermark that never comes — same lag as stream_watermark_late)."""
    src = materialize_batches(spark, sf_dir, "ss_join")
    stream = read_stream(spark, src)
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select("event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )
    out = run_to_memory(joined.select("event_id", "c_ts"), "t_ss_join", "append")
    return out.groupBy("event_id").agg(F.count("*").alias("n_clicks_before"))


@op(
    "stream_stream_left_outer",
    oracle="""
    SELECT l.event_id,
           CAST(count(r.ts) AS BIGINT) AS n_clicks_before
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'
            AND ts IS NOT NULL AND user_id IS NOT NULL) l
    LEFT JOIN (SELECT user_id, ts FROM events
               WHERE event_type = 'click'
                 AND ts IS NOT NULL AND user_id IS NOT NULL) r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
    GROUP BY l.event_id
    """,
    tags=("stream", "join"),
)
def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join with deterministic tail
    emission. Unmatched purchases are withheld in the join state until the
    watermark passes their eviction time; since state eviction uses the
    PREVIOUS micro-batch's watermark, the replay appends TWO far-future
    nudge batches (negative ids, never matching real keys) so the withheld
    null-extended rows flush before the stream ends. Full replay therefore
    equals the batch LEFT JOIN — unmatched purchases report 0 clicks."""
    nudge = nudge_batch(spark, ("purchase", "click"))
    src = materialize_batches(
        spark, sf_dir, "ss_left_outer", extra_batches=[nudge, nudge]
    )
    stream = read_stream(spark, src)
    # watermarked state joins need an event time and a key: null-ts
    # rows are never evicted/emitted, silently vanishing from the result
    purchases = (
        stream.filter(
            (F.col("event_type") == "purchase")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select("event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        stream.filter(
            (F.col("event_type") == "click")
            & F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
        )
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    )
    out = run_to_memory(
        joined.select("event_id", "p_user", "c_ts"), "t_ss_left_outer", "append"
    )
    return (
        out.filter(F.col("p_user") >= 0)  # drop the synthetic nudge rows
        .groupBy("event_id")
        .agg(F.count("c_ts").alias("n_clicks_before"))
    )


def _ivf_topk_oracle(
    k: int = 5,
    n_probe: int = 4,
    lloyd_iters: int = 2,
    train_where: str = "",
    query_where: str = "vec_id % 100 = 0",
) -> str:
    """Full replay of functions/similarity.py::ivf_topk since round 6:
    ~sqrt(n) seed centroids (isqrt replayed with a double-rounding
    correction), ``lloyd_iters`` refinement rounds whose cell means are
    vec_id-ordered left folds cast to float32 (exactly the Spark kernel's
    fold), cosine assignment with (desc cos, cid) tie-break via the
    list_dot_product == house-DOT-fold identity, 4-cell probing, and the
    exact in-cell re-rank. Iterations are unrolled AS MATERIALIZED (the
    inliner rule, see _pagerank_oracle)."""
    from aced_etl_pod_spark.operators.similarity import DUCK_COS

    def assign(cent: str, name: str, src: str = "iv_train") -> str:
        return f"""{name} AS MATERIALIZED (
      SELECT vec_id, e, cid FROM (
        SELECT s.vec_id, s.e, c.cid,
               row_number() OVER (PARTITION BY s.vec_id ORDER BY
                 {DUCK_COS.format(a='s.e', b='c.cv')} DESC, c.cid) AS rk
        FROM {src} s CROSS JOIN {cent} c
      ) WHERE rk = 1
    )"""

    def step(prev_assign: str, name: str) -> str:
        return f"""{name} AS MATERIALIZED (
      SELECT cid,
             CAST(list_transform(generate_series(1, len(vecs[1])), t ->
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(vecs, w -> CAST(w[t] AS DOUBLE))),
                 (acc, x) -> acc + x) / cnt) AS FLOAT[]) AS cv
      FROM (SELECT cid, list(e ORDER BY vec_id) AS vecs, count(*) AS cnt
            FROM {prev_assign} GROUP BY cid)
    )"""

    ctes = ["""iv_emb AS (
      -- well-scaled-vector contract (the round-7 similarity-family
      -- rule): a NULL vector in a Lloyd cell makes the cell mean carry
      -- NULL lanes, and list_dot_product RAISES on NULL lanes — which
      -- cell that poisons depends on seed composition, so an unguarded
      -- corpus passes or fails by luck
      SELECT vec_id, embedding AS e FROM embeddings
      WHERE (embedding IS NOT NULL AND len(list_filter(embedding,
             x -> x IS NULL OR NOT (abs(x) < 1e12))) = 0))""",
            f"""iv_train AS (SELECT vec_id, e FROM iv_emb {train_where})""",
            """iv_n AS (SELECT count(*) AS n FROM iv_train)""",
            """iv_c AS (
      SELECT greatest(4, least(65536,
        CASE WHEN (f + 1) * (f + 1) <= n THEN f + 1
             WHEN f * f > n THEN f - 1 ELSE f END)) AS c
      FROM (SELECT greatest(n, 16) AS n,
                   CAST(floor(sqrt(CAST(greatest(n, 16) AS DOUBLE)))
                        AS BIGINT) AS f
            FROM iv_n)
    )""",
            """c0 AS MATERIALIZED (
      SELECT vec_id AS cid, e AS cv
      FROM (SELECT vec_id, e FROM iv_train ORDER BY vec_id
            LIMIT (SELECT c FROM iv_c))
    )"""]
    prev = "c0"
    for i in range(1, lloyd_iters + 1):
        ctes.append(assign(prev, f"a{i}"))
        ctes.append(step(f"a{i}", f"c{i}"))
        prev = f"c{i}"
    ctes.append(assign(prev, "iv_inverted", src="iv_emb"))
    ctes.append(f"""iv_qcells AS (
      SELECT q_id, qe, cid FROM (
        SELECT q.vec_id AS q_id, q.e AS qe, c.cid,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 {DUCK_COS.format(a='q.e', b='c.cv')} DESC, c.cid) AS rk
        FROM (SELECT vec_id, e FROM iv_emb WHERE {query_where}) q
        CROSS JOIN {prev} c
      ) WHERE rk <= {n_probe}
    )""")
    ctes.append(f"""iv_ranked AS (
      SELECT q_id, vec_id AS nbr_id, cos, rk FROM (
        SELECT qc.q_id, iv.vec_id,
               {DUCK_COS.format(a='qc.qe', b='iv.e')} AS cos,
               row_number() OVER (PARTITION BY qc.q_id ORDER BY
                 {DUCK_COS.format(a='qc.qe', b='iv.e')} DESC, iv.vec_id) AS rk
        FROM iv_qcells qc
        JOIN iv_inverted iv ON iv.cid = qc.cid AND iv.vec_id != qc.q_id
      ) WHERE rk <= {k}
    )""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT q_id, nbr_id, round(cos, 6) AS cos_sim FROM iv_ranked
    """


SIM_ANN_IVF_TOPK_ORACLE = _ivf_topk_oracle()

# Incremental maintenance variant: train on the BASE split only, absorb
# the delta split by assignment alone (the frozen coarse quantizer), and
# probe the MERGED inverted lists. Same replay machinery with the
# training CTEs filtered to the base.
SIM_ANN_IVF_APPEND_PROBE_ORACLE = _ivf_topk_oracle(
    train_where="WHERE vec_id % 10 != 0"
)


@op(
    "sim_ann_ivf_append_probe",
    oracle=SIM_ANN_IVF_APPEND_PROBE_ORACLE,
    tags=("similarity", "approx", "incremental", "extra"),
)
def sim_ann_ivf_append_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF index maintenance — the daily-delta story for a
    production ANN index: the coarse quantizer is trained on the BASE
    corpus (vec_id % 10 != 0, the replayable ordered-fold Lloyd of
    sim_ann_ivf_topk), then the delta split (vec_id % 10 == 0) is
    absorbed by ASSIGNMENT ALONE against the frozen centroids — one
    broadcast argmin pass over the delta, no retrain, no touch of the
    base lists — and queries probe the MERGED inverted lists.

    This is how an ANN index absorbs appends at 100 TB: retraining is
    O(corpus) and happens on a schedule (ivf_index_build); the daily
    path is O(delta). The quantizer drifts as deltas accumulate — cells
    grow unevenly until the scheduled retrain rebalances them — which
    is the standard IVF operations trade (FAISS's add-vs-train split).
    The oracle replays base-only training (seed centroids from the
    base's lowest vec_ids, both Lloyd rounds as vec_id-ordered folds)
    and the merged-list probe exactly.

    Plan: the delta assignment is the SAME broadcast-argmin expression
    as the base assignment, so the incremental pass is one scan of the
    delta + a broadcast of the C-row centroid table; the probe is
    unchanged. Recall on appended vectors equals base recall by
    construction (assignment is the same function either way)."""
    from pyspark.sql import Window as SW

    from aced_etl_pod_spark.functions.similarity import (
        _assign_nearest_centroid,
        _ivf_train,
        cosine_expr,
    )

    from aced_etl_pod_spark.operators.util import finite_vec

    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(finite_vec(F.col("embedding")))
        .select("vec_id", "embedding")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0).cache()
    # train the coarse quantizer on the BASE only (replayable Lloyd)
    centroids = _ivf_train(base, None, 2)
    # merged inverted lists: base AND delta assigned to the frozen
    # centroids — the delta rows ride the same broadcast argmin
    inverted = _assign_nearest_centroid(emb, centroids).join(emb, "vec_id")
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    q_cells = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("d", cosine_expr("q_emb", "c_emb"))
        .withColumn(
            "rk",
            F.row_number().over(
                SW.partitionBy("q_id").orderBy(F.desc("d"), "cid")
            ),
        )
        .filter(F.col("rk") <= 4)
        .select("q_id", "q_emb", "cid")
    )
    cands = q_cells.join(inverted, "cid").filter(
        F.col("q_id") != F.col("vec_id")
    )
    scored = cands.withColumn("cos", cosine_expr("q_emb", "embedding"))
    w = SW.partitionBy("q_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "q_id",
            F.col("vec_id").alias("nbr_id"),
            F.round("cos", 6).alias("cos_sim"),
        )
    )


@op("sim_ann_ivf_topk", oracle=SIM_ANN_IVF_TOPK_ORACLE,
    tags=("similarity", "approx", "extra"))
def sim_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN (the other scale path besides sign-LSH):
    coarse quantizer = ~sqrt(n) deterministic seed centroids
    (functions/similarity.py::ivf_centroids_for — the standard IVF sizing,
    balancing cell width n/C against quantizer probe cost C; a fixed C=16
    would leave cells O(n) wide at corpus scale) refined by 2 Lloyd
    iterations (cell means as vec_id-ordered folds — one shuffle per
    iteration, group state bounded by the ~sqrt(n) cell width);
    every vector is assigned to its nearest centroid (broadcast argmin);
    queries probe the 4 nearest cells and exact-re-rank only those
    candidates. Full oracle since round 6 (SIM_ANN_IVF_TOPK_ORACLE
    replays seeds, both Lloyd rounds, probing, and the re-rank — the
    ordered-fold means are what make the distributed training
    replayable); recall vs brute force asserted in tests/test_cluster.py
    on clustered data."""
    from aced_etl_pod_spark.functions.similarity import ivf_topk
    from aced_etl_pod_spark.operators.util import finite_vec

    emb = load(spark, sf_dir, "embeddings").filter(
        finite_vec(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    return ivf_topk(emb, queries, k=5, n_centroids=None, n_probe=4)


@op(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
                AS BIGINT) AS bpe_ish_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS num_tokens
    FROM documents
    """,
    tags=("text", "extra"),
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish regex
    (letter runs / digit runs / single other-chars — the GPT-2 pre-tokenizer
    shape reduced to its deterministic regex core)."""
    d = load(spark, sf_dir, "documents")
    # size() of a NULL array is -1 under non-ANSI Spark; null docs must
    # report NULL counts (DuckDB's len(NULL) semantics), not -1
    nn = F.col("text").isNotNull()
    return d.select(
        "doc_id",
        F.when(nn, F.size(F.split("text", " "))).cast("long").alias("ws_tokens"),
        F.when(
            nn,
            F.size(
                F.regexp_extract_all(
                    "text", F.lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), F.lit(0)
                )
            ),
        )
        .cast("long")
        .alias("bpe_ish_tokens"),
        F.when(nn, F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))))
        .cast("long")
        .alias("num_tokens"),
    )


def _pagerank_oracle(iterations: int = 8) -> str:
    """DuckDB oracle for graph_pagerank: the same fixed-point recurrence,
    UNROLLED into one CTE per iteration. A recursive CTE can't express it
    directly — each step needs the previous ranks TWICE (dangling-mass
    scalar + in-contribution sum) and the standard recursive form allows a
    single reference to the working table — but with a fixed iteration
    count plain chained CTEs are exact and engine-portable.

    Each r{{k}} is AS MATERIALIZED: every step references its predecessor
    TWICE (dangling scalar + contribution sum), and DuckDB inlines
    non-materialized CTEs — without the hint the whole chain re-computes
    from the edge join at every reference, a 2^iterations blowup (the
    oracle-side twin of the BFS lineage bug fixed Spark-side in round 5c;
    measured 246 s → 0.27 s at sf0.01, and disk-spill death → 2.8 s at
    sf0.1)."""
    step = """r{k} AS MATERIALIZED (
      SELECT nd.node,
             (1 - 0.85) / cnt.n
             + 0.85 * (COALESCE(c.in_rank, 0) + dgm.dm / cnt.n) AS rank
      FROM nodes nd
      CROSS JOIN cnt
      CROSS JOIN (
        SELECT COALESCE(SUM(p.rank), 0) AS dm
        FROM r{p} p JOIN dangling d ON p.node = d.node
      ) dgm
      LEFT JOIN (
        SELECT e.dst AS node, SUM(p.rank / od.deg) AS in_rank
        FROM e JOIN r{p} p ON e.src = p.node JOIN out_deg od ON od.src = e.src
        GROUP BY e.dst
      ) c ON c.node = nd.node
    )"""
    chain = ",\n    ".join(step.format(k=k, p=k - 1) for k in range(1, iterations + 1))
    return f"""
    WITH e AS (
      SELECT DISTINCT o_custkey AS src, -(l_suppkey + 1) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
    ), nodes AS (
      SELECT src AS node FROM e UNION SELECT dst FROM e
    ), cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    out_deg AS (
      SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM e GROUP BY src
    ), dangling AS (
      SELECT node FROM nodes nd
      WHERE NOT EXISTS (SELECT 1 FROM out_deg od WHERE od.src = nd.node)
    ), r0 AS (
      SELECT node, 1.0 / cnt.n AS rank FROM nodes CROSS JOIN cnt
    ),
    {chain}
    SELECT node, ROUND(rank, 6) AS "rank"
    FROM r{iterations}
    ORDER BY ROUND(rank, 6) DESC, node
    LIMIT 20
    """


@op("graph_pagerank", oracle=_pagerank_oracle(8), tags=("graph", "extra"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (edges: orders ⋈
    lineitem, distinct (o_custkey, l_suppkey)) — 8 fixed iterations,
    d=0.85. Oracle: the identical recurrence unrolled into 8 chained DuckDB
    CTEs (see _pagerank_oracle); exactness vs a dense NumPy power iteration
    is additionally asserted in tests/test_cluster.py. Both engines round
    to 6dp before ranking, so cross-engine float summation-order noise
    (~1e-12 after 8 iterations) cannot flip the comparison.

    Customer and supplier keys share the 0-based integer space, so supplier
    nodes are mapped to the negative ids -(suppkey+1) to keep the bipartite
    node sets disjoint (otherwise 'supplier 7' and 'customer 7' would merge
    into one node and rank would flow back out through the customer's
    edges). Output node ids < 0 are suppliers.

    Plan per iteration: one shuffle-join (rank onto edge src) + one
    aggregate (contributions by dst) + a 1-row dangling-mass scalar — the
    graph itself never leaves the executors (functions/graph.py). The
    reference analog is the graph store build (vertices/edges,
    fhir_import_export.py:224-226) taken one step further into analytics."""
    from aced_etl_pod_spark.functions.graph import pagerank

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # an edge needs BOTH endpoints: a NULL src/dst would create a
    # phantom NULL node that every downstream equi-join silently drops
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("o_custkey").isNotNull() & F.col("l_suppkey").isNotNull())
        .select(
            F.col("o_custkey").alias("src"),
            (-(F.col("l_suppkey") + 1)).alias("dst"),
        )
    )
    pr = pagerank(edges, iterations=8, damping=0.85)
    # Rank on the ROUNDED value (like the other top-k ops): float-sum
    # accumulation order varies run to run, and the node tie-break only
    # fires on equal sort keys, so ordering by the raw double could swap
    # sub-6dp near-ties across the limit cutoff between runs.
    return (
        pr.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


@op(
    "graph_triangle_count",
    oracle="""
    WITH raw AS (
      SELECT least(o_custkey % 500, o_orderkey % 500) AS u,
             greatest(o_custkey % 500, o_orderkey % 500) AS v
      FROM orders
      WHERE o_custkey % 500 <> o_orderkey % 500
    ), e AS (
      SELECT DISTINCT u, v FROM raw
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e1.v = e2.u
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), nodes AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ), per_node AS (
      SELECT node, count(*) AS n_triangles FROM nodes GROUP BY 1
    ), ranked AS (
      SELECT node, n_triangles,
             row_number() OVER (ORDER BY n_triangles DESC, node) AS rk
      FROM per_node
    )
    SELECT CAST(node AS BIGINT) AS node,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    """,
    tags=("graph", "extra"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on a deterministic synthetic graph (edges derived
    from orders: {o_custkey mod 500} — {o_orderkey mod 500}; the purchase
    graph itself is bipartite and triangle-free): top-10 nodes by triangle
    participation. Reference analog: graph-store analytics one step past
    the vertices/edges load (fhir_import_export.py:224-226).

    Plan: edges are distinct-ed and acyclically oriented by the strict
    total order (degree, id) — the standard hub hardening, shipped in
    round 13 (was documented-only through r12). The path join
    (a,b)⋈(b,c) materializes Σ_b indeg(b)·outdeg(b) candidates; degree
    order caps every outdeg at O(sqrt(m)) (out-neighbors have degree ≥
    your own), so a hub — deg²/4 candidates through one shuffle key
    when its raw id is mid-range — contributes zero. Every triangle
    {a<b<c} under the order is enumerated exactly once as
    (a,b)⋈(b,c)⋈(a,c) — two equi-joins, no direction double-count, no
    division by 6, broadcast nothing. Per-node participation counts are
    orientation-INVARIANT, so the id-oriented DuckDB oracle (and the r12
    external hash row) match bit-for-bit; the skewed-hub fan-out A/B is
    tools/hotblock_ladder.py."""
    from aced_etl_pod_spark.functions.graph import (
        orient_edges_by_degree,
        triangle_counts,
    )

    o = load(spark, sf_dir, "orders")
    raw = o.select(
        (F.col("o_custkey") % 500).alias("src"),
        (F.col("o_orderkey") % 500).alias("dst"),
    )
    per_node = triangle_counts(orient_edges_by_degree(raw))
    w = W.orderBy(F.desc("n_triangles"), "node")
    return (
        per_node.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


# ---------------------------------------------------------------------------
# Label propagation (registration queue — finished + locally verified in
# tests/test_incremental.py; registers when the driver window rotates).
# ---------------------------------------------------------------------------

LPA_ITERS = 4


def _lpa_oracle(iterations: int = LPA_ITERS) -> str:
    """Unrolled-CTE oracle for label propagation — one CTE per synchronous
    round, same chaining technique as _pagerank_oracle. Pure integer
    arithmetic end to end, so the match is exact with no rounding."""
    step = """l{k} AS (
      SELECT node, label FROM (
        SELECT e.dst AS node, p.label,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, p.label) AS rk
        FROM e JOIN l{p} p ON e.src = p.node
        GROUP BY e.dst, p.label) t WHERE rk = 1
    )"""
    chain = ",\n    ".join(
        step.format(k=k, p=k - 1) for k in range(1, iterations + 1)
    )
    return f"""
    WITH ed AS (
      SELECT DISTINCT o_custkey AS a, -(l_suppkey + 1) AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), e AS (
      SELECT a AS src, b AS dst FROM ed
      UNION ALL
      SELECT b AS src, a AS dst FROM ed
    ), l0 AS (
      SELECT DISTINCT src AS node, src AS label FROM e
    ),
    {chain}
    SELECT node, label AS community FROM l{iterations} ORDER BY node
    """


GRAPH_LABEL_PROPAGATION_ORACLE = _lpa_oracle()


@op(
    "graph_label_propagation",
    oracle=GRAPH_LABEL_PROPAGATION_ORACLE,
    tags=("graph", "extra"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    (symmetrized) customer↔supplier purchase graph: every node starts
    labeled with its own id; each round it adopts the most frequent label
    among its neighbors, ties to the SMALLEST label — the determinism
    twist that makes classic LPA (random tie-break, async order) exactly
    reproducible and therefore fully oracle-checkable, unrolled CTE per
    round like graph_pagerank. Fixed LPA_ITERS rounds: like the k-means
    and PageRank stages, iteration count is a budget, not a convergence
    promise — the honest posture for bounded-cost graph passes at 100 TB.

    Distinct from dedup_cluster_cc (min-label = connected components):
    frequency-argmax labels split dense regions into communities rather
    than collapsing every reachable node.

    Plan per round: one shuffle-join (labels onto edge sources) + one
    partial-agg count + one per-node window argmax — the label table,
    never the edge list, is what iterates; integer-only state, no float
    drift across engines."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (-(F.col("l_suppkey") + 1)).alias("b"),
        )
        .distinct()
    )
    edges = ed.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        ed.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).cache()
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    from pyspark.sql.window import Window as _W

    for _ in range(LPA_ITERS):
        nb = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        cnt = nb.groupBy("node", "label").count()
        w = _W.partitionBy("node").orderBy(F.desc("count"), "label")
        labels = (
            cnt.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "label")
        )
    return labels.select(
        "node", F.col("label").alias("community")
    ).orderBy("node")


# ---------------------------------------------------------------------------
# graph_bfs_khop (round-7 registration queue)
# ---------------------------------------------------------------------------

BFS_HOPS = 4
_BFS_SEED_MOD = 50

# The frontier recurrence unrolled per hop (same chained-CTE style as the
# pagerank / LPA oracles): d_{i+1} = min over (d_i  UNION  d_i pushed one
# edge). Integer-only state, so the cross-engine match is exact.
_BFS_EDGES_CTE = """
    ed AS (
      SELECT DISTINCT o_custkey AS a, -(l_suppkey + 1) AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (
      SELECT a AS src, b AS dst FROM ed
      UNION ALL
      SELECT b AS src, a AS dst FROM ed
    ),
    d0 AS (
      SELECT DISTINCT c_custkey AS node, 0 AS dist
      FROM customer WHERE c_custkey % {seed_mod} = 0
    )
"""


def _bfs_oracle(hops: int) -> str:
    # AS MATERIALIZED: each hop references its predecessor twice (carry +
    # push); DuckDB inlines non-materialized CTEs, which re-computes the
    # whole chain per reference — 2^hops work (see _pagerank_oracle).
    ctes = [_BFS_EDGES_CTE.format(seed_mod=_BFS_SEED_MOD)]
    for i in range(1, hops + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d{i - 1}.dist + 1 AS dist
        FROM d{i - 1} JOIN e ON d{i - 1}.node = e.src
      ) GROUP BY node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, dist FROM d{hops} ORDER BY node"
    )


GRAPH_BFS_KHOP_ORACLE = _bfs_oracle(BFS_HOPS)


@op("graph_bfs_khop", oracle=GRAPH_BFS_KHOP_ORACLE, tags=('graph', 'extra'))
def graph_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop BFS reachability with exact minimum hop distance over the
    symmetrized customer<->supplier purchase graph, from the seed set
    {customers with key % 50 == 0}. Four synchronous frontier-expansion
    rounds: reached' = min-agg(reached UNION reached pushed one edge) —
    the same iterate-the-small-table discipline as PageRank/LPA (the edge
    list is scanned once per round but never re-derived or collected; only
    the O(reached) node table iterates). Oracle: the recurrence unrolled
    into chained DuckDB CTEs; integer distances make the match exact.

    Scale: per round, one shuffle-join (frontier onto edge src) + one
    min-agg; fixed round count = bounded cost. The production refinement
    at 100 TB — pushing ONLY the newly-settled frontier instead of the
    whole reached set — changes constant factors, not the plan shape, and
    needs the same two exchanges per round. Naming the whole reached set
    keeps round i's input deterministic for the oracle unroll."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (-(F.col("l_suppkey") + 1)).alias("b"),
        )
        .distinct()
    )
    edges = (
        ed.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(ed.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .cache()
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    reached = (
        c.filter(F.col("c_custkey") % _BFS_SEED_MOD == 0)
        .select(F.col("c_custkey").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    for _ in range(BFS_HOPS):
        # `reached` appears TWICE per round (kept + pushed); without a
        # cache the logical plan doubles every hop — 2^hops copies of the
        # seed scan. Caching collapses both references to one
        # InMemoryRelation per round (at cluster scale: localCheckpoint,
        # which also truncates the lineage for failure recovery).
        reached = reached.cache()
        pushed = reached.join(edges, reached.node == edges.src).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        reached = (
            reached.unionAll(pushed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return reached.orderBy("node")


# ---------------------------------------------------------------------------
# hierarchy_unroll_paths (round-7 registration queue)
# ---------------------------------------------------------------------------

_HIER_ROUNDS = 12  # covers depth <= 12; ternary tree depth at sf0.1 is 9

HIERARCHY_UNROLL_PATHS_ORACLE = """
    WITH RECURSIVE
    e AS (
      SELECT c_custkey AS child, (c_custkey - 1) // 3 AS parent
      FROM customer WHERE c_custkey > 0
    ),
    anc AS (
      SELECT c_custkey AS node, c_custkey AS anc,
             CAST(c_custkey AS VARCHAR) AS path
      FROM customer
      UNION ALL
      SELECT a.node, e.parent, CAST(e.parent AS VARCHAR) || '/' || a.path
      FROM anc a JOIN e ON a.anc = e.child
    )
    SELECT node,
           CAST(anc AS BIGINT) AS root,
           CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)
             AS depth,
           '/' || path AS path
    FROM anc WHERE anc = 0 ORDER BY node
"""


@op("hierarchy_unroll_paths", oracle=HIERARCHY_UNROLL_PATHS_ORACLE, tags=('graph', 'extra'))
def hierarchy_unroll_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal: every node's full root path over a
    parent-child EDGE TABLE — org charts, bills of material, category
    trees. The fixture forest is a ternary tree on customer keys
    (parent(k) = (k-1) div 3, root 0), carried as DATA so the op
    exercises real joins, not key arithmetic.

    Spark 4 gained a native recursive CTE — sql_recursive_cte_native
    runs the SAME task through it and the gate pins both to the same
    answer. This op keeps the explicit loop-of-joins unroll — the
    fallback for pre-4.0 engines and the form that allows per-round
    instrumentation/caching control — as the pattern: each round, rows whose current ancestor is not yet the root
    extend one level via a broadcast join onto the edge table and prepend
    the parent to the path; settled rows pass through untouched.
    Convergence is bounded by tree depth (9 at sf0.1; 12 rounds fixed) —
    like the PageRank/BFS/LPA stages, iteration count is a budget. The
    oracle is DuckDB's native WITH RECURSIVE over the same edges —
    engine-native recursion vs unrolled joins, differential by
    construction.

    Scale: the ITERATING table is O(nodes) and each round touches one
    broadcast join (edge table O(nodes) too — at true scale, partition
    both by the ancestor key; rounds = tree depth, which is log-bounded
    for balanced hierarchies). Path strings grow O(depth); per-round
    cache keeps the lineage linear, same discipline as graph_bfs_khop."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    edges = (
        c.filter(F.col("c_custkey") > 0)
        .select(
            F.col("c_custkey").alias("child"),
            F.expr("(c_custkey - 1) div 3").alias("parent"),
        )
        .cache()
    )
    paths = c.select(
        F.col("c_custkey").alias("node"),
        F.col("c_custkey").alias("anc"),
        F.col("c_custkey").cast("string").alias("path"),
    )
    for _ in range(_HIER_ROUNDS):
        paths = paths.cache()
        ext = paths.join(
            edges, paths.anc == edges.child, "left"
        ).select(
            "node",
            F.coalesce("parent", "anc").alias("anc"),
            F.when(
                F.col("parent").isNotNull(),
                F.concat(F.col("parent").cast("string"), F.lit("/"), F.col("path")),
            )
            .otherwise(F.col("path"))
            .alias("path"),
        )
        paths = ext
    return paths.select(
        "node",
        F.col("anc").cast("long").alias("root"),
        (F.size(F.split("path", "/")) - 1).cast("long").alias("depth"),
        F.concat(F.lit("/"), F.col("path")).alias("path"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# graph_shortest_path_weighted (round-7 registration queue)
# ---------------------------------------------------------------------------

_SPW_ROUNDS = 6

_SPW_EDGES_CTE = """
    ed AS (
      SELECT DISTINCT o_custkey AS a, -(l_suppkey + 1) AS b,
             (o_custkey + l_suppkey) % 7 + 1 AS w
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    e AS (
      SELECT a AS src, b AS dst, w FROM ed
      UNION ALL
      SELECT b AS src, a AS dst, w FROM ed
    ),
    d0 AS (
      SELECT DISTINCT c_custkey AS node, 0 AS dist
      FROM customer WHERE c_custkey % 50 = 0
    )
"""


def _spw_oracle(rounds: int) -> str:
    # AS MATERIALIZED for the same 2^rounds inlining reason as
    # _bfs_oracle / _pagerank_oracle.
    ctes = [_SPW_EDGES_CTE]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
      SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
        SELECT node, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS node, d{i - 1}.dist + e.w AS dist
        FROM d{i - 1} JOIN e ON d{i - 1}.node = e.src
      ) GROUP BY node
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, dist FROM d{rounds} ORDER BY node"
    )


GRAPH_SHORTEST_PATH_WEIGHTED_ORACLE = _spw_oracle(_SPW_ROUNDS)


@op("graph_shortest_path_weighted", oracle=GRAPH_SHORTEST_PATH_WEIGHTED_ORACLE, tags=('graph', 'extra'))
def graph_shortest_path_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source-set shortest paths by synchronous
    Bellman-Ford relaxation (6 fixed rounds — paths of <= 6 edges; like
    every iterative op here, the round count is a budget): dist' =
    min(dist, min over edges (dist[src] + w)). Deterministic integer
    weights ((cust + supp) % 7 + 1) keep the oracle exact; the unrolled
    CTE matches graph_bfs_khop's shape with the weighted relax. Per-round
    cache collapses the double self-reference (the BFS lineage lesson);
    at cluster scale the relax join partitions by src and only the
    distance table iterates. Negative-cycle concerns don't arise
    (weights >= 1); on general graphs fixed-round Bellman-Ford still
    converges monotonically, it just may not have SETTLED — the honest
    bounded-cost contract."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    ed = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (-(F.col("l_suppkey") + 1)).alias("b"),
            ((F.col("o_custkey") + F.col("l_suppkey")) % 7 + 1).alias("w"),
        )
        .distinct()
    )
    edges = (
        ed.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w")
        .unionAll(ed.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w"))
        .cache()
    )
    c = load(spark, sf_dir, "customer").select("c_custkey")
    dist = (
        c.filter(F.col("c_custkey") % 50 == 0)
        .select(F.col("c_custkey").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    for _ in range(_SPW_ROUNDS):
        dist = dist.cache()
        relaxed = dist.join(edges, dist.node == edges.src).select(
            F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
    return dist.orderBy("node")


# ---------------------------------------------------------------------------
# graph_jaccard_link_prediction (round-7+ registration queue, tranche 38)
# ---------------------------------------------------------------------------

GRAPH_JACCARD_LINK_PREDICTION_ORACLE = """
    WITH raw AS (
      SELECT least(o_custkey % 500, o_orderkey % 500) AS u,
             greatest(o_custkey % 500, o_orderkey % 500) AS v
      FROM orders
      WHERE o_custkey % 500 <> o_orderkey % 500
    ), e AS (
      SELECT DISTINCT u, v FROM raw
    ), adj AS (
      SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY a
    ), cand AS (
      SELECT x.a AS a, y.b AS b, CAST(count(*) AS BIGINT) AS common
      FROM adj x JOIN adj y ON x.b = y.a AND x.a < y.b
      GROUP BY x.a, y.b
    ), nonedge AS (
      SELECT c.a, c.b, c.common FROM cand c
      LEFT JOIN e ON e.u = c.a AND e.v = c.b
      WHERE e.u IS NULL
    ), scored AS (
      SELECT n.a, n.b, n.common,
             round(CAST(n.common AS DOUBLE)
                   / (da.deg + db.deg - n.common), 4) AS jaccard
      FROM nonedge n
      JOIN deg da ON da.node = n.a
      JOIN deg db ON db.node = n.b
    )
    SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, common, jaccard
    FROM scored
    ORDER BY jaccard DESC, a, b
    LIMIT 20
"""


@op("graph_jaccard_link_prediction", oracle=GRAPH_JACCARD_LINK_PREDICTION_ORACLE, tags=('graph', 'extra'))
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard — for every NON-adjacent
    node pair sharing ≥1 neighbor, score |N(a)∩N(b)| / |N(a)∪N(b)| and
    return the top-20 predicted links (the classic common-neighbors
    recommender baseline: "people you may know", co-purchase suggestion).
    Same derived 500-node graph as graph_triangle_count
    (advanced_ops.py:274) so the family shares a fixture.

    Plan: symmetrize once, count 2-paths with ONE self-join on the
    shared-neighbor key (the wedge join — identical shape to the
    triangle count's first hop), degree table as a broadcast, existing
    edges removed by a null-producing left join. Union size comes from
    deg_a + deg_b - common, so the score is a pure integer ratio rounded
    at 4dp — no float until the last projection. At 100 TB the wedge
    join is bounded by degree skew: cap or sample super-node
    neighborhoods first (the max_bucket_size rule functions/dedup.py
    uses), which only drops candidates a recommender would cap anyway."""
    o = load(spark, sf_dir, "orders")
    raw = o.select(
        F.least(
            F.col("o_custkey") % 500, F.col("o_orderkey") % 500
        ).alias("u"),
        F.greatest(
            F.col("o_custkey") % 500, F.col("o_orderkey") % 500
        ).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    e = raw.distinct()
    adj = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count("*").alias("deg")
    )
    x = adj.select(F.col("a"), F.col("b").alias("w"))
    y = adj.select(F.col("a").alias("w2"), F.col("b"))
    cand = (
        x.join(y, (F.col("w") == F.col("w2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    nonedge = cand.join(
        e, (e.u == cand.a) & (e.v == cand.b), "left_anti"
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    return (
        nonedge.join(da, "a")
        .join(db, "b")
        .select(
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("common").cast("long").alias("common"),
            F.round(
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "a", "b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# sql_recursive_cte_native (round-7+ registration queue, tranche 42)
# ---------------------------------------------------------------------------

SQL_RECURSIVE_CTE_NATIVE_ORACLE = HIERARCHY_UNROLL_PATHS_ORACLE

_RECURSIVE_CTE_SPARK = """
    WITH RECURSIVE anc AS (
      SELECT c_custkey AS node, c_custkey AS anc,
             CAST(c_custkey AS STRING) AS path
      FROM rec_customer
      UNION ALL
      SELECT a.node, e.parent,
             CAST(e.parent AS STRING) || '/' || a.path
      FROM anc a
      JOIN (SELECT c_custkey AS child, (c_custkey - 1) div 3 AS parent
            FROM rec_customer WHERE c_custkey > 0) e
        ON a.anc = e.child
    )
    SELECT node,
           CAST(anc AS BIGINT) AS root,
           CAST(length(path) - length(replace(path, '/', '')) AS BIGINT)
             AS depth,
           '/' || path AS path
    FROM anc WHERE anc = 0 ORDER BY node
"""


@op("sql_recursive_cte_native", oracle=SQL_RECURSIVE_CTE_NATIVE_ORACLE, tags=('sql', 'extra'))
def sql_recursive_cte_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's NATIVE ``WITH RECURSIVE`` (SPARK-24497, new in 4.0) on
    the same ternary-tree root-path task hierarchy_unroll_paths solves by
    hand: anchor = every node, recursive step climbs one ancestor level
    and prepends it to the path, fixpoint at the root. The differential
    is engine-native recursion on BOTH sides — Spark's recursive CTE
    executor vs DuckDB's — over identical data, so the two ops together
    pin the unrolled loop-of-joins AND the native executor to the same
    answer.

    At scale the native form delegates per-round caching/convergence to
    the engine (no hand-managed cache() per round, no fixed round
    budget); the hand-unrolled sibling remains the fallback pattern for
    engines/versions without recursion and for per-round instrumentation.
    The recursive step JOINS the recursive relation to the edge
    derivation — the representative shape (org charts join real edge
    tables) — and terminates when no ancestor has an edge row, exactly
    as the oracle does."""
    c = load(spark, sf_dir, "customer")
    c.createOrReplaceTempView("rec_customer")
    return spark.sql(_RECURSIVE_CTE_SPARK)


# ---------------------------------------------------------------------------
# scan_json_variant (round-7+ registration queue, tranche 42)
# ---------------------------------------------------------------------------

SCAN_JSON_VARIANT_ORACLE = """
    WITH extracted AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           (CASE WHEN abs(CAST(CAST(sum(k) AS DOUBLE) / count(*) AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST(CAST(sum(k) AS DOUBLE) / count(*) AS DOUBLE) AS DECIMAL(18,9)), 4) AS DOUBLE) ELSE CAST(CAST(sum(k) AS DOUBLE) / count(*) AS DOUBLE) END) AS avg_k,
           CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high
    FROM extracted
    GROUP BY event_type
    ORDER BY event_type
"""


@op("scan_json_variant", oracle=SCAN_JSON_VARIANT_ORACLE, tags=('scan', 'extra'))
def scan_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type: the
    JSON props column is parsed ONCE into the binary variant encoding
    (``parse_json``) and fields are then extracted with typed
    ``variant_get`` paths — the modern replacement for per-access
    ``get_json_object`` string re-parsing (fn_json,
    operators/functions.py:237): one parse, many cheap typed reads,
    shreddable at the scan at 100 TB (the open-format variant shredding
    design). DuckDB's native JSON extraction is the oracle — two
    engines, two binary JSON representations, same typed answer.

    Plan: parse + extract are pure projections (no shuffle); the
    rollup is one partial agg on O(types) keys."""
    e = load(spark, sf_dir, "events")
    ext = e.select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
    )
    return (
        ext.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.expr(
                "CAST(round(CAST(CAST(sum(k) AS DOUBLE) / count(*)"
                " AS DECIMAL(18,9)), 4) AS DOUBLE)"
            ).alias("avg_k"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
        .select("event_type", F.col("n").cast("long"), "sum_k", "avg_k", "n_high")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# graph_cc_large_star_small_star (round-7+ registration queue, tranche 46)
# ---------------------------------------------------------------------------

GRAPH_CC_STAR_ORACLE = """
    WITH RECURSIVE raw AS (
      SELECT least(o_custkey % 500, o_orderkey % 500) AS u,
             greatest(o_custkey % 500, o_orderkey % 500) AS v
      FROM orders
      WHERE o_custkey % 500 <> o_orderkey % 500
    ), e AS (
      SELECT DISTINCT u, v FROM raw
    ), sym AS (
      SELECT u AS a, v AS b FROM e UNION SELECT v, u FROM e
    ), nodes AS (
      SELECT DISTINCT a AS node FROM sym
    ), reach AS (
      SELECT node AS src, node AS dst FROM nodes
      UNION
      SELECT r.src, s.b FROM reach r JOIN sym s ON s.a = r.dst
    )
    SELECT CAST(src AS BIGINT) AS node,
           CAST(min(dst) AS BIGINT) AS component
    FROM reach GROUP BY src ORDER BY node
"""

_CC_STAR_ROUNDS = 12


@op("graph_cc_large_star_small_star", oracle=GRAPH_CC_STAR_ORACLE, tags=('graph', 'extra'))
def graph_cc_large_star_small_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., the MapReduce-scale CC algorithm): each node
    keeps a current parent label; large-star hangs every HIGHER-numbered
    neighbor under the neighborhood minimum, small-star re-hangs parents
    and lower neighbors — both rounds are pure groupBy/min + join steps
    that strictly shrink tree heights until every node points at its
    component minimum. Unlike plain min-label flooding
    (dedup_cluster_cc's loop, O(diameter) rounds), the star operations
    contract long paths roughly logarithmically — THE difference at
    100 TB where a chain-shaped component would force thousands of
    flooding rounds.

    Implementation detail: each round recomputes parent = min over the
    closed neighborhood in parent space (p(v), min p(neighbors)), which
    composes large-star + small-star into one groupBy-min pass per
    round with the edge set REWRITTEN into parent space — the
    functional-join formulation of star contraction. Convergence is
    verified (labels == per-component minimum) by the DuckDB
    reachability-closure oracle; a second gate pins it to
    dedup_cluster_cc's answer."""
    o = load(spark, sf_dir, "orders")
    raw = o.select(
        F.least(F.col("o_custkey") % 500, F.col("o_orderkey") % 500).alias(
            "u"
        ),
        F.greatest(
            F.col("o_custkey") % 500, F.col("o_orderkey") % 500
        ).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    e = raw.distinct()
    sym = (
        e.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(e.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .cache()
    )
    # parent(v) starts as v
    parent = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("p"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_CC_STAR_ROUNDS):
        pa = parent.select(F.col("node").alias("a"), F.col("p").alias("pa"))
        pb = parent.select(F.col("node").alias("b"), F.col("p").alias("pb"))
        # edges rewritten into parent space; closed-neighborhood min
        nbr_min = (
            sym.join(pa, "a")
            .join(pb, "b")
            .groupBy("pa")
            .agg(F.min("pb").alias("m"))
            .select(F.col("pa").alias("p"), "m")
        )
        stepped = parent.join(nbr_min, "p", "left").select(
            "node",
            F.least(F.col("p"), F.coalesce(F.col("m"), F.col("p"))).alias("p"),
        )
        # path compression: point at parent's parent (pointer jumping);
        # localCheckpoint per round truncates the iterative lineage
        # (functions/cluster.py's rule) so round N never replans round N-1.
        gp = stepped.select(F.col("node").alias("p"), F.col("p").alias("gp"))
        new_parent = (
            stepped.join(gp, "p", "left")
            .select("node", F.coalesce(F.col("gp"), F.col("p")).alias("p"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_parent.alias("n")
            .join(parent.alias("o"), "node")
            .filter(F.col("n.p") != F.col("o.p"))
            .limit(1)
            .count()
        )
        parent = new_parent
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {_CC_STAR_ROUNDS} rounds"
        )
    return parent.select(
        F.col("node").cast("long").alias("node"),
        F.col("p").cast("long").alias("component"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# graph_modularity_score (round-7+ registration queue, tranche 54)
# ---------------------------------------------------------------------------

GRAPH_MODULARITY_SCORE_ORACLE = """
    WITH raw AS (
      SELECT least(o_custkey % 500, o_orderkey % 500) AS u,
             greatest(o_custkey % 500, o_orderkey % 500) AS v
      FROM orders
      WHERE o_custkey % 500 <> o_orderkey % 500
    ), e AS (
      SELECT DISTINCT u, v FROM raw
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS m FROM e
    ), parts AS (
      SELECT 'hash_blocks' AS partition_name, u, v,
             u // 125 AS cu, v // 125 AS cv FROM e
      UNION ALL
      SELECT 'parity', u, v, u % 2, v % 2 FROM e
    ), deg AS (
      SELECT partition_name, c, sum(cnt) AS d_c FROM (
        SELECT partition_name, cu AS c, CAST(count(*) AS BIGINT) AS cnt
        FROM parts GROUP BY 1, 2
        UNION ALL
        SELECT partition_name, cv AS c, CAST(count(*) AS BIGINT) AS cnt
        FROM parts GROUP BY 1, 2
      ) GROUP BY 1, 2
    ), intra AS (
      SELECT partition_name, cu AS c, CAST(count(*) AS BIGINT) AS e_c
      FROM parts WHERE cu = cv GROUP BY 1, 2
    )
    SELECT d.partition_name,
           round(sum(CAST(coalesce(i.e_c, 0) AS DOUBLE) / (SELECT m FROM m)
                 - (CAST(d.d_c AS DOUBLE) / (2 * (SELECT m FROM m)))
                   * (CAST(d.d_c AS DOUBLE) / (2 * (SELECT m FROM m)))),
                 6) AS q
    FROM deg d LEFT JOIN intra i
      ON i.partition_name = d.partition_name AND i.c = d.c
    GROUP BY d.partition_name
    ORDER BY d.partition_name
"""


@op("graph_modularity_score", oracle=GRAPH_MODULARITY_SCORE_ORACLE, tags=('graph', 'extra'))
def graph_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q = Σ_c [e_c/m − (d_c/2m)²] as a SCORING
    operator over candidate community assignments — the objective every
    community-detection loop (Louvain, LPA refinement) maximizes,
    exposed as its own op so partitions from any source (LPA labels, a
    business taxonomy, a hash sharding) can be judged on the same graph.
    Two reference partitions of the derived 500-node graph are scored
    side by side (contiguous 125-node blocks vs node parity).

    Plan: everything reduces to O(communities) tables — per-community
    degree sums (one agg over the edge list counted from both
    endpoints) and intra-community edge counts (one filtered agg);
    Q is closed-form arithmetic on those. Exact integer counts until
    the final division; the e_c/m and (d_c/2m)² terms are identical
    IEEE on identical integers."""
    o = load(spark, sf_dir, "orders")
    raw = o.select(
        F.least(F.col("o_custkey") % 500, F.col("o_orderkey") % 500).alias("u"),
        F.greatest(
            F.col("o_custkey") % 500, F.col("o_orderkey") % 500
        ).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    e = raw.distinct().cache()
    m = e.count()
    parts = e.select(
        F.lit("hash_blocks").alias("partition_name"),
        "u",
        "v",
        (F.col("u") / 125).cast("long").alias("cu"),
        (F.col("v") / 125).cast("long").alias("cv"),
    ).unionByName(
        e.select(
            F.lit("parity").alias("partition_name"),
            "u",
            "v",
            (F.col("u") % 2).alias("cu"),
            (F.col("v") % 2).alias("cv"),
        )
    )
    deg = (
        parts.select("partition_name", F.col("cu").alias("c"))
        .unionAll(parts.select("partition_name", F.col("cv").alias("c")))
        .groupBy("partition_name", "c")
        .agg(F.count("*").alias("d_c"))
    )
    intra = (
        parts.filter(F.col("cu") == F.col("cv"))
        .groupBy("partition_name", F.col("cu").alias("c"))
        .agg(F.count("*").alias("e_c"))
    )
    term = (
        F.coalesce(F.col("e_c"), F.lit(0)).cast("double") / F.lit(m)
        - (F.col("d_c").cast("double") / F.lit(2 * m))
        * (F.col("d_c").cast("double") / F.lit(2 * m))
    )
    return (
        deg.join(intra, ["partition_name", "c"], "left")
        .groupBy("partition_name")
        .agg(F.round(F.sum(term), 6).alias("q"))
        .orderBy("partition_name")
    )


# ---------------------------------------------------------------------------
# graph_assortativity (round-7+ registration queue, tranche 57)
# ---------------------------------------------------------------------------

GRAPH_ASSORTATIVITY_ORACLE = """
    WITH raw AS (
      SELECT least(o_custkey % 500, o_orderkey % 500) AS u,
             greatest(o_custkey % 500, o_orderkey % 500) AS v
      FROM orders
      WHERE o_custkey % 500 <> o_orderkey % 500
    ), e AS (
      SELECT DISTINCT u, v FROM raw
    ), adj AS (
      SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY a
    ), ends AS (
      SELECT du.d AS x, dv.d AS y
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x + y) AS BIGINT) AS sxpy,
             CAST(sum(x * x + y * y) AS BIGINT) AS sx2py2
      FROM ends
    )
    SELECT m,
           round((CAST(sxy AS DOUBLE) / m
                  - (CAST(sxpy AS DOUBLE) / (2 * m))
                    * (CAST(sxpy AS DOUBLE) / (2 * m)))
                 / nullif(CAST(sx2py2 AS DOUBLE) / (2 * m)
                          - (CAST(sxpy AS DOUBLE) / (2 * m))
                            * (CAST(sxpy AS DOUBLE) / (2 * m)), 0)
                 , 6) + 0.0 AS assortativity
    FROM sums
"""


@op("graph_assortativity", oracle=GRAPH_ASSORTATIVITY_ORACLE, tags=('graph', 'extra'))
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman's r): the Pearson correlation of
    degrees across edge endpoints — positive means hubs link to hubs
    (social networks), negative means hubs link to leaves (the internet,
    and most recommender bipartite projections); it decides whether
    super-node mitigation (the dedup bucket caps) will bite. Formula on
    symmetrized edge-end pairs: r = [Σxy/m − (Σ(x+y)/2m)²] /
    [Σ(x²+y²)/2m − (Σ(x+y)/2m)²].

    Every sum is an exact BIGINT over integer degrees (same discipline
    as ts_autocorrelation's deviation trick — no float until the final
    closed form); degenerate regular graphs (zero variance) yield NULL
    via nullif, and +0.0 normalizes negative zero. Plan: degree table =
    one agg, endpoint join against the O(nodes) broadcast, one 1-row
    reduce."""
    o = load(spark, sf_dir, "orders")
    raw = o.select(
        F.least(F.col("o_custkey") % 500, F.col("o_orderkey") % 500).alias("u"),
        F.greatest(
            F.col("o_custkey") % 500, F.col("o_orderkey") % 500
        ).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    e = raw.distinct()
    adj = e.select(F.col("u").alias("a")).unionAll(
        e.select(F.col("v").alias("a"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(F.count("*").alias("d"))
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("x"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("y"))
    ends = e.join(du, "u").join(dv, "v")
    sums = ends.agg(
        F.count("*").alias("m"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") + F.col("y")).alias("sxpy"),
        F.sum(
            F.col("x") * F.col("x") + F.col("y") * F.col("y")
        ).alias("sx2py2"),
    )
    mean_half = F.col("sxpy").cast("double") / (2 * F.col("m"))
    r = (
        F.round(
            (F.col("sxy").cast("double") / F.col("m") - mean_half * mean_half)
            / F.nullif(
                F.col("sx2py2").cast("double") / (2 * F.col("m"))
                - mean_half * mean_half,
                F.lit(0.0),
            ),
            6,
        )
        + 0.0
    )
    return sums.select(
        F.col("m").cast("long").alias("m"), r.alias("assortativity")
    )


# ---------------------------------------------------------------------------
# graph_kcore_membership (round-7+ registration queue, tranche 60)
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 12


def _kcore_oracle() -> str:
    """The k-core peel unrolled: each round recomputes degrees over the
    surviving subgraph and drops nodes with degree < k. Generated
    programmatically so both engines share the exact semantics; 12
    rounds is far past the fixture's fixpoint (convergence is asserted
    by the op itself raising otherwise)."""
    head = """
    WITH raw AS (
      SELECT least(o_custkey % 500, o_orderkey % 500) AS u,
             greatest(o_custkey % 500, o_orderkey % 500) AS v
      FROM orders
      WHERE o_custkey % 500 <> o_orderkey % 500
    ), e AS MATERIALIZED (
      SELECT DISTINCT u, v FROM raw
    ), n0 AS MATERIALIZED (
      SELECT u AS node FROM e UNION SELECT v FROM e
    )"""
    rounds = []
    prev = "n0"
    for i in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
    , d{i} AS MATERIALIZED (
      SELECT a.node, count(*) AS d
      FROM (SELECT u AS node, v AS nbr FROM e
            UNION ALL SELECT v, u FROM e) a
      JOIN {prev} pa ON pa.node = a.node
      JOIN {prev} pb ON pb.node = a.nbr
      GROUP BY a.node
    ), n{i} AS MATERIALIZED (
      SELECT node FROM d{i} WHERE d >= {_KCORE_K}
    )""")
        prev = f"n{i}"
    tail = f"""
    SELECT CAST(node AS BIGINT) AS node
    FROM {prev}
    ORDER BY node"""
    return head + "".join(rounds) + tail


GRAPH_KCORE_MEMBERSHIP_ORACLE = _kcore_oracle()


@op("graph_kcore_membership", oracle=GRAPH_KCORE_MEMBERSHIP_ORACLE, tags=('graph', 'extra'))
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core membership (k = 3): the maximal subgraph where every node
    keeps ≥ k neighbors INSIDE the subgraph — the standard graph
    pre-filter (spam/bot rings, dense-community seeds, feature for
    influence models) that degree alone cannot compute, because removing
    a leaf can demote its neighbors (the peeling cascade). Iterative
    peel: recompute degrees over survivors, drop < k, repeat to
    fixpoint; per-round localCheckpoint + convergence check (raises on
    budget exhaustion), the dedup_cluster_cc discipline.

    The ORACLE is the same peel UNROLLED into generated CTE rounds —
    deterministic by construction, so the differential checks the whole
    cascade, not just the final degrees. At scale each round is one
    degree agg + two semi-joins on the shrinking node set; rounds are
    bounded by the peel depth (≤ diameter, usually tiny)."""
    o = load(spark, sf_dir, "orders")
    raw = o.select(
        F.least(F.col("o_custkey") % 500, F.col("o_orderkey") % 500).alias("u"),
        F.greatest(
            F.col("o_custkey") % 500, F.col("o_orderkey") % 500
        ).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    e = raw.distinct().cache()
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    ).cache()
    nodes = adj.select("node").distinct().localCheckpoint(eager=True)
    for _ in range(_KCORE_ROUNDS):
        na = nodes.select(F.col("node"))
        nb = nodes.select(F.col("node").alias("nbr"))
        deg = (
            adj.join(na, "node")
            .join(nb, "nbr")
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        new_nodes = (
            deg.filter(F.col("d") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
        before = nodes.count()
        after = new_nodes.count()
        nodes = new_nodes
        if after == before:
            break
    else:
        raise RuntimeError(
            f"k-core peel did not converge in {_KCORE_ROUNDS} rounds"
        )
    return nodes.select(F.col("node").cast("long").alias("node")).orderBy(
        "node"
    )


# ---------------------------------------------------------------------------
# sim_ann_ivf_serve_batch — the persisted-index BATCH serving path
# ---------------------------------------------------------------------------


def _ivf_serve_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Persist (centroids, cells) for the batch-serving op, trained with
    the REPLAYABLE distributed Lloyd (functions/similarity.py::_ivf_train
    — vec_id-ordered fold means, the same machinery
    SIM_ANN_IVF_TOPK_ORACLE replays), laid out exactly like
    ivf_index_build's artifacts: cells as BUCKETED parquet —
    partitionBy('bkt'), bkt = cid % ivf_buckets_for(...), cid sorted
    within each file (docs/SCALE.md item 6; data columns first, bkt as
    the inferred partition column — the one CELLS read-back schema both
    build paths must produce, per the round-8 empty-index fix) and the
    C-row centroid table (carrying each cell's bkt) alongside.
    Centroid c_emb types carry ivf_index_build's documented asymmetry:
    the empty branch writes array<double> (ivf_index_build's empty
    contract, functions/similarity.py) while the non-empty _ivf_train
    branch yields array<float>; every reader tolerates both
    (cosine_expr casts, probe returns empty on 0 centroids).
    Fingerprint-keyed so regenerated testdata invalidates it.

    Publication is ATOMIC (round-10 advice, mirroring
    tables.load_validated_embeddings): data + _DONE marker are built in
    a private temp dir and ``os.rename``d into the fingerprinted path,
    so concurrent sessions can't interleave writes into the live dir
    and a reader that saw the marker can never scan a half-overwritten
    cells dir. A losing racer's rename fails (non-empty target) and its
    temp dir is discarded; superseded fingerprints for the same sf_tag
    are pruned best-effort after publish."""
    import os
    import shutil
    import tempfile

    from aced_etl_pod_spark.functions.similarity import (
        _assign_nearest_centroid,
        _ivf_train,
        ivf_buckets_for,
        ivf_centroids_for,
        ivf_rowgroup_bytes,
    )
    from aced_etl_pod_spark.operators.util import finite_vec
    from aced_etl_pod_spark.tables import scratch_dir

    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
    base = scratch_dir()
    # 'ivfserve2' = bucketed-cells layout generation; the name bump
    # orphans round-9 per-cell-layout fixtures (evicted below) so a
    # published old-layout index is never read by a bucket-aware probe
    name = f"ivfserve2_{sf_tag}_{st.st_mtime_ns:x}_{st.st_size:x}"
    path = os.path.join(base, name)
    marker = os.path.join(path, "_DONE")
    if os.path.exists(marker):
        return path
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(finite_vec(F.col("embedding")))
        .select("vec_id", "embedding")
    )
    tmp = tempfile.mkdtemp(prefix=f".{name}.tmp.", dir=base)
    try:
        n_rows = emb.count()
        if n_rows == 0:
            # empty-index contract (round-8 ADVICE fix, mirrored):
            # cells keep the one read-back schema; centroids use
            # array<double> exactly like ivf_index_build's empty branch
            emb.withColumn("cid", F.lit(0).cast("long")).withColumn(
                "bkt", F.lit(0).cast("int")
            ).limit(0).write.mode("overwrite").parquet(f"{tmp}/cells")
            spark.createDataFrame(
                [], "cid long, c_emb array<double>, bkt int"
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{tmp}/centroids"
            )
        else:
            dim = len(emb.select("embedding").head()[0])
            n_cent = ivf_centroids_for(n_rows)
            n_buckets = ivf_buckets_for(n_rows, dim, n_cent)
            centroids = _ivf_train(emb, n_cent, lloyd_iters=2)
            inverted = _assign_nearest_centroid(emb, centroids).join(
                emb, "vec_id"
            )
            (
                inverted.select("vec_id", "embedding", "cid")
                .withColumn("bkt", (F.col("cid") % n_buckets).cast("int"))
                .repartition(n_buckets, "bkt")
                .sortWithinPartitions("bkt", "cid")
                .write.mode("overwrite")
                # ~one cell per row group (ivf_rowgroup_bytes): bkt
                # prunes files, cid min/max prunes row groups
                .option(
                    "parquet.block.size",
                    ivf_rowgroup_bytes(n_rows, dim, n_cent),
                )
                .partitionBy("bkt")
                .parquet(f"{tmp}/cells")
            )
            centroids.withColumn(
                "bkt", (F.col("cid") % n_buckets).cast("int")
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{tmp}/centroids"
            )
        open(os.path.join(tmp, "_DONE"), "w").close()
        for _ in range(2):
            try:
                os.rename(tmp, path)  # atomic publish on the same fs
                break
            except OSError:
                if os.path.exists(marker):
                    # a concurrent session published first — theirs is
                    # complete (marker only exists post-rename)
                    break
                # marker-less target = partial dir from a pre-atomic
                # writer or a crash; clear it and rename once more
                shutil.rmtree(path, ignore_errors=True)
        else:
            raise OSError(f"could not publish IVF serve index at {path}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # evict superseded fingerprints of this sf_tag AND any round-9
    # per-cell-layout fixture ('ivfserve_' prefix, pre-bucketing) —
    # AGE-GATED so a concurrent reader that resolved the old fingerprint
    # isn't pulled out from under mid-query (round-11 advice)
    from aced_etl_pod_spark.tables import evict_stale_fixtures

    evict_stale_fixtures(
        base, (f"ivfserve2_{sf_tag}_", f"ivfserve_{sf_tag}_"), keep=name
    )
    return path


@op(
    "sim_ann_ivf_serve_batch",
    oracle=SIM_ANN_IVF_TOPK_ORACLE,
    tags=("similarity", "approx", "serving", "extra"),
)
def sim_ann_ivf_serve_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch serving against a PERSISTED IVF index — the round-9
    throughput winner (tools/serve_throughput.py: 67-88 qps at
    x40/Q=256, 14x over per-query jobs) registered as a first-class,
    hash-oracled operator. The index artifacts are built once by
    :func:`_ivf_serve_fixture` with the replayable ordered-fold Lloyd,
    then ALL queries (vec_id % 100 == 0, the sim_ann_ivf_topk query set)
    are answered by ONE ivf_index_probe_many plan: a union-of-cells scan
    coalesced to cluster width (the small-files fix; bucket pruning via
    DPP is OPPORTUNISTIC on this path — Spark only inserts the pruning
    subquery when AQE broadcasts q_cells, which the unbounded-Q contract
    forbids at scale, so the join, not the scan, discards non-probed
    cells — round-11 advice), codegen cosine re-rank, WindowGroupLimit
    top-k per query.

    This op's query set is a corpus FRACTION (1 % of vec_ids), so it is
    unbounded at 100 TB and takes probe_many's unhinted AQE path
    (``broadcast_queries=False`` — round-10 advice; docs/SCALE.md §16's
    audit rule: hint only construction-bounded sides). Bounded-batch
    serving callers (tools/serve_throughput.py, fixed Q per batch)
    keep the broadcast hint, which is theirs by contract.

    Because training, probing, tie-breaks, and rounding are identical to
    sim_ann_ivf_topk's in-memory path, the result set IS that op's —
    SIM_ANN_IVF_TOPK_ORACLE is reused verbatim, so the hash check proves
    the persisted layout (partition-column round-trip, float c_emb
    round-trip, build-side orientation, scan coalesce) changes nothing
    but the physics. At 100 TB: index once (one full pass), serve every
    subsequent batch from n_probe·Q pruned cells."""
    from aced_etl_pod_spark.functions.similarity import ivf_index_probe_many
    from aced_etl_pod_spark.operators.util import finite_vec

    path = _ivf_serve_fixture(spark, sf_dir)
    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(finite_vec(F.col("embedding")))
        .filter(F.col("vec_id") % 100 == 0)
    )
    return ivf_index_probe_many(
        spark, path, queries, k=5, n_probe=4, broadcast_queries=False
    )


# Bounded-batch serving variant: a FIXED-Q query slice (vec_id < 100 —
# the serving-batch contract) against the same replayable persisted
# index; the oracle is the same full Lloyd/probe replay with only the
# query CTE's predicate changed.
SIM_ANN_IVF_SERVE_BOUNDED_ORACLE = _ivf_topk_oracle(
    query_where="vec_id < 100"
)


@op(
    "sim_ann_ivf_serve_bounded",
    oracle=SIM_ANN_IVF_SERVE_BOUNDED_ORACLE,
    tags=("similarity", "approx", "serving", "extra"),
)
def sim_ann_ivf_serve_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-batch serving against the persisted IVF index — the
    round-10 GEMM kernel (functions/similarity.py::_ivf_probe_many_gemm)
    as a first-class hash-oracled op. Where sim_ann_ivf_serve_batch's
    corpus-fraction query set forces the fully distributed join plan,
    THIS op's query set is fixed-Q by contract (vec_id < 100 — a serving
    batch, model-sized driver state), so ivf_index_probe_many takes the
    broadcast_queries=True path: driver-side cell ranking (one Q·C
    gemm, the single probe's argmax Q-wide), a cells scan statically
    pruned to the probed (bkt, cid) union (file-level bkt pruning +
    row-group cid pruning off the bucketed layout), one float64 gemm
    per Arrow batch scoring all queries at once, per-batch boundary-tie
    top-k, tiny merge window. Measured 150/82/56 qps at x40/x200/x800
    vs the join plan's 11.6 qps at x200 (PLANS.md round-10).

    The oracle replays the ordered-fold Lloyd training and the exact
    probe/re-rank in DuckDB with only the query predicate changed — the
    hash match proves the gemm kernel's float64 pairwise summation,
    masking, self-exclusion, and tie-breaks reproduce the sequential
    fold's results at the 6-dp contract (the sim_cosine_topk_fast
    precedent, now covering multi-query serving end to end)."""
    from aced_etl_pod_spark.functions.similarity import ivf_index_probe_many
    from aced_etl_pod_spark.operators.util import finite_vec

    path = _ivf_serve_fixture(spark, sf_dir)
    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(finite_vec(F.col("embedding")))
        .filter(F.col("vec_id") < 100)
    )
    return ivf_index_probe_many(
        spark, path, queries, k=5, n_probe=4, broadcast_queries=True
    )
