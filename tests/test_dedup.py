"""Recall tests for the approximate dedup family (SURVEY §7.3.5): on a
corpus with planted near-duplicates, MinHash-LSH and SimHash must find
every planted pair (recall), and candidate sets must stay sane (no
all-pairs blowup)."""

from __future__ import annotations

import random

import pytest

from aced_etl_pod_spark.functions.dedup import minhash_candidate_pairs, simhash_near_pairs

VOCAB = [f"w{i}" for i in range(500)]


def _corpus(spark, n_docs=60, doc_len=40, n_dups=6, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(doc_len))))
    planted = []
    for d in range(n_dups):
        base_id = d
        dup_id = n_docs + d
        toks = rows[base_id][1].split()
        toks[rng.randrange(len(toks))] = rng.choice(VOCAB)  # perturb 1 of 40
        rows.append((dup_id, " ".join(toks)))
        planted.append((base_id, dup_id))
    return spark.createDataFrame(rows, "doc_id long, text string"), set(planted)


def test_minhash_recall(spark):
    df, planted = _corpus(spark)
    pairs = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.5)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert planted <= found, f"missed planted dups: {planted - found}"
    # no blowup: random docs over a 500-word vocab are not near-dups
    assert len(found) <= len(planted) + 3


def test_minhash_exact_dup_jaccard_is_one(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x w v u t s")],
        "doc_id long, text string",
    )
    rows = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [(1, 2, 1.0)]


def test_simhash_recall(spark):
    # simhash needs longer documents: one perturbed token must flip few of
    # the 64 sign-sums, so use 120-token docs (3 changed shingles of ~118)
    df, planted = _corpus(spark, doc_len=120)
    # multi-block blocking GUARANTEES recall for Hamming <= max_hamming
    pairs = simhash_near_pairs(df, "doc_id", "text", max_hamming=12)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert planted <= found, f"missed planted dups: {planted - found}"


def test_minhash_bucket_cap_bounds_pathological_corpus(spark):
    """A degenerate corpus (hundreds of docs sharing one boilerplate text)
    collides into a single band bucket in every band; the bucket-size cap
    must drop those buckets so the candidate-pair count stays bounded
    instead of going O(n²)."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(300)]
    rows += [(1000, "alpha beta gamma delta epsilon zeta"), (1001, "alpha beta gamma delta epsilon zeta x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.5, max_bucket_size=50)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # the 300-doc mega-bucket is dropped (0 pairs from it, not 44 850);
    # the small genuine near-dup bucket survives
    assert (1000, 1001) in found
    assert len(found) <= 2
    # uncapped, the same corpus explodes into all boilerplate pairs
    uncapped = minhash_candidate_pairs(
        df, "doc_id", "text", threshold=0.5, max_bucket_size=None
    )
    assert uncapped.count() > 40_000


def test_minhash_band_join_ships_ids_only(spark):
    """Scale contract: the band-collision self-join must not carry the
    shingle arrays — candidates are generated from (band, bucket, id) only,
    and shingles are re-joined per surviving pair."""
    from aced_etl_pod_spark.functions.dedup import (
        _shingled_signatures,
        minhash_band_candidates,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
    )
    sigged = _shingled_signatures(df, "doc_id", "text", 3, 32)
    cands = minhash_band_candidates(sigged, "doc_id")
    plan = cands._sc._jvm.PythonSQLUtils.explainString(
        cands._jdf.queryExecution(), "formatted"
    )
    lines = plan.splitlines()
    exchange_inputs = [
        lines[i + 1]
        for i, line in enumerate(lines)
        if "Exchange" in line and line.lstrip().startswith("(")
        and i + 1 < len(lines) and lines[i + 1].startswith("Input")
    ]
    assert exchange_inputs, "expected at least one Exchange in the candidates plan"
    for inp in exchange_inputs:
        assert "shingles" not in inp, f"shingles crossed an exchange: {inp}"


def test_cdc_chunks_are_position_independent(spark):
    """The CDC property: a shared passage must produce the same chunk
    digest even when it sits at different offsets in different documents
    (whole-doc hashing can never catch this)."""
    from pyspark.sql import functions as F

    from aced_etl_pod_spark.registry import registry

    shared = " ".join(f"common{i}" for i in range(120))
    rows = [
        (1, "unique prefix one two three " + shared),
        (2, shared + " tail words here"),
        (3, "totally different content with no overlap at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("cdc_docs")
    # run the same plan as the registered op, against the in-memory corpus
    import aced_etl_pod_spark.operators.text as T

    orig_load = T.load
    T.load = lambda s, sf, name: df
    try:
        dup = registry()["dedup_chunk_content_defined"].fn(spark, "ignored")
        dup_rows = dup.collect()
    finally:
        T.load = orig_load
    # docs 1 and 2 share interior chunks; doc 3 contributes none
    assert any(r["n_docs"] == 2 for r in dup_rows)
    assert all(r["n_occurrences"] >= 2 for r in dup_rows)


def test_simhash_signature_agg_matches_expression(spark):
    """The explode+aggregate simhash (the scale path) must produce bit-
    identical signatures to the single-row fold expression."""
    from pyspark.sql import functions as F

    from aced_etl_pod_spark.functions.dedup import (
        simhash_expr,
        simhash_signatures,
        with_shingles,
    )

    df, _ = _corpus(spark, n_docs=40, doc_len=60)
    sh = with_shingles(df, "text", 3).filter(F.size("shingles") > 0)
    old = sh.withColumn("simhash", simhash_expr()).select(
        F.col("doc_id").alias("doc"), F.col("simhash").alias("h_expr")
    )
    new = simhash_signatures(sh, "doc_id", "text")
    joined = old.join(new, "doc")
    assert joined.count() == 46
    assert joined.filter(F.col("h_expr") != F.col("simhash")).count() == 0


@pytest.mark.slow
def test_minhash_no_candidates_on_disjoint_docs(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"only{i}_{j}" for j in range(30))) for i in range(20)],
        "doc_id long, text string",
    )
    assert minhash_candidate_pairs(df, "doc_id", "text").count() == 0
