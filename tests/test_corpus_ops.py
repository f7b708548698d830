"""Property tests for the round-4 corpus/feature operators (corpus_ops.py)
beyond the DuckDB parity gate: chunk coverage/overlap invariants, JL
distance preservation, ORC round-trip fidelity vs the parquet source, and
quantile-bucket balance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.corpus_ops import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    N_BUCKETS,
    RP_DOUT,
    embedding_random_projection,
    feature_quantile_bucketize,
    join_asof_forward,
    sink_orc_roundtrip,
    text_chunk_sliding_tokens,
)
from aced_etl_pod_spark.tables import load
from tests.conftest import SF_SMALL


def test_chunks_cover_every_token(spark):
    """No token is dropped: per doc, max(start+len-1) == doc token count,
    chunk 1 starts at token 1, and consecutive starts advance by at most
    CHUNK_STRIDE (the right-aligned tail may advance less)."""
    chunks = text_chunk_sliding_tokens(spark, SF_SMALL)
    docs = (
        load(spark, SF_SMALL, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
    )
    agg = chunks.groupBy("doc_id").agg(
        F.min("start_tok").alias("first_start"),
        F.max(F.col("start_tok") + F.col("n_tokens") - 1).alias("covered"),
        F.max("n_tokens").alias("max_len"),
        F.count("*").alias("n_chunks"),
    )
    joined = agg.join(docs, "doc_id").collect()
    assert joined, "no documents chunked"
    for r in joined:
        assert r.first_start == 1, r
        assert r.covered == r.n, r
        assert r.max_len <= CHUNK_TOKENS, r
        # chunk count for right-aligned sliding windows
        expect = (
            1
            if r.n <= CHUNK_TOKENS
            else 1 + math.ceil((r.n - CHUNK_TOKENS) / CHUNK_STRIDE)
        )
        assert r.n_chunks == expect, r


def test_chunk_text_matches_slice(spark):
    """chunk_text is exactly the stride-window join of the doc's tokens."""
    chunks = text_chunk_sliding_tokens(spark, SF_SMALL)
    d = load(spark, SF_SMALL, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    bad = (
        chunks.join(d, "doc_id")
        .withColumn(
            "expect",
            F.array_join(
                F.expr(f"slice(toks, start_tok, {CHUNK_TOKENS})"), " "
            ),
        )
        .filter(F.col("chunk_text") != F.col("expect"))
        .count()
    )
    assert bad == 0


def test_random_projection_preserves_distance_rank(spark):
    """JL sanity: projected pairwise distances correlate with the original
    ones over a deterministic sample of vector pairs (sign test — the
    sparse projection must at minimum order far/near pairs consistently
    more often than chance)."""
    proj = embedding_random_projection(spark, SF_SMALL)
    rows = proj.collect()
    assert {len({r.k for r in rows if r.vec_id == v}) for v in {r.vec_id for r in rows}} == {RP_DOUT}
    emb = {
        r.vec_id: r.embedding
        for r in load(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    }
    pv: dict[int, list[float]] = {}
    for r in rows:
        pv.setdefault(r.vec_id, [0.0] * RP_DOUT)[r.k] = r.y
    ids = sorted(emb)[:20]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    agree = trials = 0
    for i in range(0, len(ids) - 3, 2):
        a, b, c = ids[i], ids[i + 1], ids[i + 2]
        orig = d2(emb[a], emb[b]) < d2(emb[a], emb[c])
        prj = d2(pv[a], pv[b]) < d2(pv[a], pv[c])
        trials += 1
        agree += orig == prj
    assert trials >= 5
    assert agree / trials > 0.5


def test_orc_roundtrip_digest_matches_parquet_source(spark):
    """The ORC read-back manifest equals the same manifest computed straight
    from the parquet source — format round-trip loses nothing."""
    manifest = {r.lang: r for r in sink_orc_roundtrip(spark, SF_SMALL).collect()}
    doc_hash = F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long")
    src = {
        r.lang: r
        for r in load(spark, SF_SMALL, "documents")
        .withColumn("__h", doc_hash)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("bit_xor(__h)").alias("content_digest"),
        )
        .collect()
    }
    assert set(manifest) == set(src) and manifest
    for lang, m in manifest.items():
        s = src[lang]
        assert (m.n_docs, m.total_chars, m.content_digest) == (
            s.n_docs,
            s.total_chars,
            s.content_digest,
        ), lang


def test_quantile_buckets_balanced_and_ordered(spark):
    """Within each group: all N_BUCKETS present, sizes differ by ≤1 (ntile
    contract), and [lo, hi] ranges are non-overlapping and ordered."""
    rows = feature_quantile_bucketize(spark, SF_SMALL).collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r.l_returnflag, []).append(r)
    assert by_group
    for flag, rs in by_group.items():
        rs.sort(key=lambda r: r.bucket)
        assert [r.bucket for r in rs] == list(range(1, N_BUCKETS + 1)), flag
        sizes = [r.n for r in rs]
        assert max(sizes) - min(sizes) <= 1, (flag, sizes)
        for prev, cur in zip(rs, rs[1:]):
            assert prev.hi <= cur.lo, (flag, prev, cur)


def test_asof_forward_direction_and_minimality(spark):
    """Every matched next_error_ts is at-or-after its purchase, and no
    earlier eligible error exists between the purchase and the match."""
    out = {r.event_id: r for r in join_asof_forward(spark, SF_SMALL).collect()}
    ev = load(spark, SF_SMALL, "events")
    purchases = {
        r.event_id: r
        for r in ev.filter(F.col("event_type") == "purchase").collect()
    }
    errors_by_user: dict[int, list] = {}
    for r in ev.filter(F.col("event_type") == "error").collect():
        errors_by_user.setdefault(r.user_id, []).append(r.ts)
    assert set(out) == set(purchases)
    for eid, row in out.items():
        p = purchases[eid]
        later = sorted(t for t in errors_by_user.get(p.user_id, []) if t >= p.ts)
        if not later:
            assert row.next_error_ts is None, row
        else:
            assert row.next_error_ts == later[0].strftime("%Y-%m-%d %H:%M:%S.%f"), (
                row,
                later[0],
            )


def test_curation_pipeline_accounting(spark):
    """Manifest accounting closes: every doc is exactly one of kept /
    low-quality / duplicate, and the quality gate drops a nonzero but
    minority share at this corpus's score distribution."""
    from aced_etl_pod_spark.operators.corpus_ops import pipeline_corpus_curation

    rows = pipeline_corpus_curation(spark, SF_SMALL).collect()
    assert rows
    total = kept = lowq = 0
    for r in rows:
        assert r.n_docs == r.n_low_quality + r.n_duplicate + r.n_kept, r
        total += r.n_docs
        kept += r.n_kept
        lowq += r.n_low_quality
    assert 0 < lowq < total
    assert kept > 0


def test_heavy_hitter_candidates_cover_true_topk(spark):
    """The sketch stage's candidate union must contain every true top-k
    token (the recall guarantee the exact recount depends on), and the
    final output must equal the exact top-k."""
    from aced_etl_pod_spark.operators.corpus_ops import (
        HH_TOPK,
        agg_heavy_hitters_sketch,
    )

    got = agg_heavy_hitters_sketch(spark, SF_SMALL).collect()
    words = (
        load(spark, SF_SMALL, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    exact = sorted(words, key=lambda r: (-r["count"], r.w))[:HH_TOPK]
    assert [(r.w, r.n) for r in sorted(got, key=lambda r: r.rk)] == [
        (r.w, r["count"]) for r in exact
    ]


def test_quantile_bucketize_approx_path_no_window(spark):
    """The exact=False scale path: (a) no Window / per-group sort node in
    the physical plan — boundaries come from one partial-agg pass and the
    bucket id is a per-row expression; (b) same output schema as exact;
    (c) every row lands in a valid bucket, group totals preserved, and
    [lo, hi] ranges are ordered per group."""
    from aced_etl_pod_spark.operators.corpus_ops import (
        N_BUCKETS,
        quantile_bucketize_plan,
    )

    li = load(spark, SF_SMALL, "lineitem")
    approx = quantile_bucketize_plan(
        li, "l_returnflag", "l_extendedprice", N_BUCKETS, exact=False
    )
    plan = approx._sc._jvm.PythonSQLUtils.explainString(
        approx._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan, plan
    exact = quantile_bucketize_plan(
        li,
        "l_returnflag",
        "l_extendedprice",
        N_BUCKETS,
        tie_cols=("l_orderkey", "l_linenumber"),
        exact=True,
    )
    # same column names and types (nullability flags may differ: ntile is
    # provably non-null, the aggregate expression is not)
    assert [(f.name, f.dataType) for f in approx.schema.fields] == [
        (f.name, f.dataType) for f in exact.schema.fields
    ]
    rows = approx.collect()
    n_src = li.count()
    assert sum(r.n for r in rows) == n_src
    by_group: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.bucket <= N_BUCKETS, r
        by_group.setdefault(r.l_returnflag, []).append(r)
    for flag, rs in by_group.items():
        rs.sort(key=lambda r: r.bucket)
        sizes = [r.n for r in rs]
        # approx boundaries: buckets near-balanced (rank error 1/accuracy)
        assert max(sizes) <= 2 * min(sizes) + 2, (flag, sizes)
        for prev, cur in zip(rs, rs[1:]):
            assert prev.hi <= cur.lo, (flag, prev, cur)


def test_cms_never_underestimates(spark):
    """Count-min's one-sided guarantee: every point estimate >= the exact
    count (a min over cells each containing the key's full count plus
    non-negative collision mass)."""
    from aced_etl_pod_spark.operators.corpus_ops import agg_count_min_sketch

    rows = agg_count_min_sketch(spark, SF_SMALL).collect()
    assert rows, "no event types"
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] == r["exact_n"] + r["overcount"] for r in rows)


def test_url_canonical_collapses_all_variants(spark):
    """Each canonical item URL must absorb every surface form that maps to
    it: with 4 variants cycling on o_orderkey % 4 and items on % 500, any
    canonical key with >= 4 occurrences must have seen > 1 surface form,
    and no canonical URL may retain a port, fragment, tracking param,
    uppercase host, or trailing slash."""
    import re

    from aced_etl_pod_spark.operators.corpus_ops import dedup_url_canonical

    rows = dedup_url_canonical(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        u = r["canonical_url"]
        assert re.fullmatch(r"https://example\.com/item/\d+", u), u
        if r["n_occurrences"] >= 4:
            assert r["n_surface_forms"] >= 2


def test_kmv_estimate_quality_and_union_merge(spark):
    """KMV estimates must be near exact (k=64 → ~12% std err; allow 3σ)
    and the union row — computed purely by merging per-group sketches —
    must estimate the true cross-group distinct to the same tolerance."""
    from aced_etl_pod_spark.operators.corpus_ops import agg_kmv_theta_distinct

    rows = {r["event_type"]: r for r in agg_kmv_theta_distinct(spark, SF_SMALL).collect()}
    assert "__union__" in rows
    for t, r in rows.items():
        exact, est = r["exact_distinct"], r["kmv_est"]
        assert est > 0
        if exact <= 64:
            assert est == exact  # under-full sketch is exact by construction
        else:
            assert abs(est - exact) / exact < 0.40, (t, exact, est)


def test_tokenize_partial_arrow_kernel_null_semantics(spark):
    """The round-11 partial-aggregating q7 kernel must reproduce the JVM
    branch's null semantics exactly: null text -> excluded from
    avg/max but counted in n_docs; null lang is its own group; null
    n_chars drops out of avg_chars. The degenerate sweeps only exercise
    the small-corpus JVM branch (the dispatch knee is 100k docs), so
    this pins the big-corpus kernel against the JVM plan directly."""
    from aced_etl_pod_spark.operators.text import _tokenize_partial_arrow

    rows = [
        ("en", "a b c", 5),
        ("en", None, 7),
        (None, "x y", None),
        ("de", "einzeln", 7),
        (None, None, 3),
        ("en", "", 0),
    ]
    d = spark.createDataFrame(rows, "lang string, text string, n_chars long")
    partial = d.select("lang", "text", "n_chars").mapInArrow(
        _tokenize_partial_arrow,
        "lang string, n_rows long, s_ntok long, c_ntok long, m_ntok long,"
        " s_chars long, c_chars long",
    )
    got = {
        r["lang"]: (r["n_docs"], r["avg_tokens"], r["max_tokens"], r["avg_chars"])
        for r in partial.groupBy("lang")
        .agg(
            F.sum("n_rows").alias("n_docs"),
            F.round(F.sum("s_ntok") / F.sum("c_ntok"), 2).alias("avg_tokens"),
            F.max("m_ntok").cast("long").alias("max_tokens"),
            F.round(F.sum("s_chars") / F.sum("c_chars"), 2).alias("avg_chars"),
        )
        .collect()
    }
    ntok = F.when(F.col("text").isNotNull(), F.size(F.split(F.col("text"), " ")))
    want = {
        r["lang"]: (r["n_docs"], r["avg_tokens"], r["max_tokens"], r["avg_chars"])
        for r in d.select("lang", ntok.alias("ntok"), "n_chars")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ntok"), 2).alias("avg_tokens"),
            F.max("ntok").cast("long").alias("max_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .collect()
    }
    assert got == want, (got, want)
