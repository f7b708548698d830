"""Deduplication algorithms for large-scale text corpora (north star:
exact hash, MinHash+LSH, SimHash, n-gram Jaccard).

Design for 100 TB (cf. PAPERS.md near-duplicate detection literature):
never compare all pairs. Every near-dup algorithm here reduces candidate
generation to an EQUI-JOIN on a derived key (band hash / simhash prefix),
which Spark shuffles by key — O(n) + O(candidate pairs), not O(n²).
Signatures are built from ``xxhash64`` (JVM built-in, codegen'd) — no
Python in the signature path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aced_etl_pod_spark.functions.text import word_shingles_expr


def with_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Add a distinct word-n-gram shingle array column."""
    return df.withColumn("shingles", word_shingles_expr(text_col, n))


def minhash_signature(num_hashes: int = 32) -> F.Column:
    """MinHash signature over a ``shingles`` array column: for seed s,
    sig[s] = min over shingles of xxhash64(shingle, s). Returns an
    ARRAY<BIGINT> of length ``num_hashes``."""
    cols = [
        F.expr(f"array_min(transform(shingles, x -> xxhash64(x, {seed})))")
        for seed in range(num_hashes)
    ]
    return F.array(*cols)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline (each stage a DataFrame op, shuffling only on band buckets):
      shingle → signature → band hashes → posexplode → self-equi-join on
      (band index, band hash) with id_a < id_b → distinct candidates →
      verify exact Jaccard on shingle sets → filter ≥ threshold.

    Rows per band bucket are bounded by collision groups, so the join is
    data-proportional; at 100 TB add a bucket-size cap + salting for
    pathological buckets.

    Returns (id_a, id_b, jaccard DOUBLE).
    """
    rows = num_hashes // bands
    sigged = (
        with_shingles(df.select(id_col, text_col), text_col, shingle_n)
        .filter(F.size("shingles") > 0)
        .withColumn("sig", minhash_signature(num_hashes))
    )
    band_hash = F.array(
        *[
            F.xxhash64(F.slice("sig", b * rows + 1, rows), F.lit(b))
            for b in range(bands)
        ]
    )
    banded = sigged.select(
        F.col(id_col).alias("doc"),
        F.col("shingles"),
        F.posexplode(band_hash).alias("band", "bucket"),
    )
    left = banded.select(
        F.col("doc").alias("id_a"), F.col("shingles").alias("sh_a"), "band", "bucket"
    )
    right = banded.select(
        F.col("doc").alias("id_b"), F.col("shingles").alias("sh_b"), "band", "bucket"
    )
    cands = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cands.withColumn("jaccard", F.round(jaccard, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_expr(bits: int = 64) -> F.Column:
    """SimHash over a ``shingles`` array: hash every shingle ONCE, then one
    fold accumulates per-bit sign votes in an ARRAY<BIGINT> accumulator;
    a final fold packs the positive-vote bits into one BIGINT. Single pass
    over the shingles (the naive per-bit formulation re-hashes every
    shingle 64× and explodes codegen)."""
    last = bits - 1
    votes = (
        f"aggregate(transform(shingles, s -> xxhash64(s)), "
        f"  transform(sequence(0, {last}), b -> 0L), "
        f"  (acc, h) -> zip_with(acc, "
        f"    transform(sequence(0, {last}), b -> "
        f"      CASE WHEN ((h >> b) & 1) = 1 THEN 1L ELSE -1L END), "
        f"    (a, v) -> a + v))"
    )
    return F.expr(
        f"aggregate(zip_with({votes}, sequence(0, {last}), "
        f"  (v, b) -> CASE WHEN v > 0 THEN shiftleft(1L, CAST(b AS INT)) ELSE 0L END), "
        f"  0L, (acc, x) -> acc | x)"
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 8,
    prefix_bits: int = 16,
) -> DataFrame:
    """SimHash near-dup candidates: block on 16-bit prefix bands of the
    64-bit simhash (4 rotations), then verify Hamming distance ≤ k.
    Equi-join on (rotation, prefix) — same no-cross-join discipline."""
    sigged = with_shingles(df.select(id_col, text_col), text_col).filter(
        F.size("shingles") > 0
    ).withColumn("simhash", simhash_expr())
    rotations = 64 // prefix_bits
    pref = F.array(
        *[
            F.expr(f"(simhash >> {r * prefix_bits}) & {(1 << prefix_bits) - 1}")
            for r in range(rotations)
        ]
    )
    blocked = sigged.select(
        F.col(id_col).alias("doc"), "simhash", F.posexplode(pref).alias("rot", "pref")
    )
    a = blocked.select(F.col("doc").alias("id_a"), F.col("simhash").alias("h_a"), "rot", "pref")
    b = blocked.select(F.col("doc").alias("id_b"), F.col("simhash").alias("h_b"), "rot", "pref")
    cands = (
        a.join(b, ["rot", "pref"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.expr("h_a ^ h_b"))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
