"""Semantics + plan-shape tests for the llm_pipeline operator family
(oracle parity runs separately via tests/test_parity.py — these assert the
invariants the oracle can't state and the plan shapes that matter at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aced_etl_pod_spark.operators import llm_pipeline as L
from tests.conftest import SF_SMALL


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_tfidf_rk_dense_per_doc(spark):
    out = L.text_tfidf_topk(spark, SF_SMALL).toPandas()
    by_doc = out.groupby("doc_id")["rk"].apply(lambda s: sorted(s.tolist()))
    assert all(r == list(range(1, len(r) + 1)) for r in by_doc)
    assert (out["tfidf"] > 0).all()


def test_tfidf_df_join_is_broadcast(spark):
    plan = _plan(L.text_tfidf_topk(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan


def test_bm25_scores_monotone_in_rank(spark):
    out = (
        L.text_bm25_score(spark, SF_SMALL)
        .orderBy("rk")
        .toPandas()
    )
    assert len(out) == 20
    assert (out["bm25"].diff().dropna() <= 1e-12).all()
    assert (out["bm25"] > 0).all()


def test_decontaminate_bounds_and_broadcast(spark):
    df = L.decontaminate_ngram_overlap(spark, SF_SMALL)
    out = df.toPandas()
    # benchmark docs (src0) are excluded from the scored set
    assert (out["n_hit"] <= out["n_grams"]).all()
    assert out["overlap_frac"].between(0.0, 1.0).all()
    # the benchmark gram set joins broadcast — the corpus side never shuffles
    assert "BroadcastHashJoin" in _plan(df)


def test_seq_pack_reconstructs_cumsum(spark):
    out = L.seq_pack_offsets(spark, SF_SMALL).toPandas()
    for _, grp in out.groupby("source"):
        g = grp.sort_values("doc_id").reset_index(drop=True)
        cum = 0
        for row in g.itertuples():
            assert row.pack_id * L.SEQ_LEN + row.offset == cum
            cum += row.ntok
    first = out.sort_values("doc_id").groupby("source").first()
    assert (first["pack_id"] == 0).all()
    assert (first["offset"] == 0).all()


def test_repetition_stats_ranges(spark):
    out = L.text_repetition_stats(spark, SF_SMALL).toPandas()
    for col in ("distinct_ratio", "top_token_frac", "top_bigram_frac"):
        assert out[col].between(0.0, 1.0).all(), col
    # a repeated token implies top_token_frac >= 1/ntok and distinct < 1
    rep = out[out["distinct_ratio"] < 1.0]
    # 1e-4 slack: the frac is rounded to 4dp, which can dip below the bound
    assert (rep["top_token_frac"] >= 2.0 / rep["ntok"] - 1e-4).all()


def test_centroid_stats_cover_all_vectors(spark):
    from aced_etl_pod_spark.tables import load

    out = L.embedding_centroid_stats(spark, SF_SMALL).toPandas()
    n_total = load(spark, SF_SMALL, "embeddings").count()
    assert out["n_vecs"].sum() == n_total
    assert (out["centroid_norm"] >= 0).all()
    assert (out["mean_abs_dim"] >= 0).all()


def test_bm25_posting_filter_precedes_aggregate(spark):
    """The query-term filter must sit directly on the explode output (a
    Filter node whose child is the Generate), pruning postings BEFORE the
    (doc, term) aggregation shuffle — the inverted-index-probe shape. A
    regression to post-aggregate filtering would leave no Filter between
    Generate and the aggregate."""
    import re

    plan = _plan(L.text_bm25_score(spark, SF_SMALL))
    # the filter condition is the literal query-term IN-list...
    assert re.search(r"Condition : term#\d+ IN \(spark,query,join,fast\)", plan)
    # ...and in the plan tree a Filter node's immediate child is the Generate
    tree = plan.split("\n\n")[0]
    assert re.search(r"Filter \(\d+\)\n[\s:+|-]*\+- Generate \(\d+\)", tree)


def test_shard_manifest_covers_corpus_and_is_deterministic(spark):
    from aced_etl_pod_spark.tables import load

    m1 = L.sink_shard_manifest(spark, SF_SMALL).toPandas().sort_values("shard_id")
    assert len(m1) == L.N_SHARDS
    assert m1["n_docs"].sum() == load(spark, SF_SMALL, "documents").count()
    # rerun: same shard assignment, same digests (rerun-stable export)
    m2 = L.sink_shard_manifest(spark, SF_SMALL).toPandas().sort_values("shard_id")
    assert m1.reset_index(drop=True).equals(m2.reset_index(drop=True))


def test_decontaminate_reports_short_docs(spark, tmp_path):
    """Docs with fewer than DECON_N tokens can't shingle — they must still
    appear in the report with n_grams = n_hit = 0, not be dropped."""
    rows = [
        (1, "alpha beta", "en", "src1", 10),
        (2, "key agg row scan slow fast table", "en", "src1", 33),
        (3, "key agg row scan slow fast table", "en", "src0", 33),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r.asDict()
        for r in L.decontaminate_ngram_overlap(spark, str(tmp_path)).collect()
    }
    assert out[1] == {"doc_id": 1, "n_grams": 0, "n_hit": 0, "overlap_frac": 0.0}
    assert out[2]["n_hit"] == out[2]["n_grams"] > 0
    assert out[2]["overlap_frac"] == 1.0
    assert 3 not in out  # benchmark docs are not scored


def test_text_entropy_bounds(spark):
    """0 ≤ entropy ≤ ln(n_distinct); zero iff the doc repeats one token."""
    import math

    from aced_etl_pod_spark.registry import registry

    from tests.conftest import SF_SMALL

    rows = registry()["text_entropy_stats"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["entropy"] >= 0.0
        # entropy is 4dp-rounded (±5e-5) on top of 8dp per-term rounds
        assert r["entropy"] <= math.log(max(r["n_distinct"], 1)) + 1e-4
        if r["n_distinct"] == 1:
            assert r["entropy"] == 0.0


def test_levenshtein_pairs_canonical(spark):
    """Pairs are canonical (a<b), unique, and within the distance cap."""
    from aced_etl_pod_spark.operators.llm_pipeline import LEV_MAX
    from aced_etl_pod_spark.registry import registry

    from tests.conftest import SF_ORACLE

    rows = registry()["dedup_levenshtein_pairs"].fn(spark, SF_ORACLE).collect()
    assert rows, "threshold should admit pairs at sf0.01"
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["lev"] <= LEV_MAX
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
