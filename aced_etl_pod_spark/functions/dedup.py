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


def _shingled_signatures(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int, num_hashes: int
) -> DataFrame:
    # Guard on the CHEAP token count, BEFORE the shingle projection, instead
    # of filtering size(shingles) > 0 after it: Catalyst's projection
    # collapse would otherwise substitute the whole normalize+split+
    # transform+array_distinct chain into the scan filter and re-evaluate
    # it per row (docs/SCALE.md §11; flagged by tools/plan_audit.py on
    # dedup_incremental_minhash). Equivalent row set: ngrams_expr yields a
    # non-empty gram array exactly when the normalized token count >= n.
    from aced_etl_pod_spark.functions.text import NORMALIZE_SQL

    tok_n = F.size(
        F.split(F.expr(NORMALIZE_SQL.format(col=text_col)), " ")
    )
    return (
        with_shingles(
            df.select(id_col, text_col).filter(tok_n >= shingle_n),
            text_col,
            shingle_n,
        )
        .withColumn("sig", minhash_signature(num_hashes))
    )


def minhash_band_candidates(
    sigged: DataFrame,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """Distinct candidate (id_a, id_b) pairs from LSH band collisions.

    The band self-join carries ONLY (band, bucket, id) — never the shingle
    arrays — so the band exchange ships a fixed ~24 bytes per row per band
    regardless of document size. Buckets larger than ``max_bucket_size``
    are dropped before the join: a degenerate key (empty/boilerplate
    shingle sets colliding across the corpus) would otherwise create an
    O(bucket²) pair blowup at 100 TB. True near-dup pairs inside a dropped
    mega-bucket almost always collide again in another band; byte-identical
    documents belong to the exact-hash dedup pass, not LSH.
    """
    rows = num_hashes // bands
    band_hash = F.array(
        *[
            F.xxhash64(F.slice("sig", b * rows + 1, rows), F.lit(b))
            for b in range(bands)
        ]
    )
    banded = sigged.select(
        F.col(id_col).alias("doc"), F.posexplode(band_hash).alias("band", "bucket")
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window as W

        bucket_n = F.count("*").over(W.partitionBy("band", "bucket"))
        banded = banded.withColumn("bucket_n", bucket_n).filter(
            F.col("bucket_n") <= max_bucket_size
        )
    left = banded.select(F.col("doc").alias("id_a"), "band", "bucket")
    right = banded.select(F.col("doc").alias("id_b"), "band", "bucket")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | None = 200,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    Pipeline (each stage a DataFrame op, shuffling only on band buckets):
      shingle → signature → band hashes → posexplode → id-only self-equi-
      join on (band index, band hash) with id_a < id_b → distinct candidate
      pairs → re-join the shingle arrays once per surviving pair → verify
      exact Jaccard → filter ≥ threshold.

    Shingle arrays never enter the band exchange (see
    :func:`minhash_band_candidates`); they are shipped exactly once per
    *surviving candidate pair* — O(candidates), not O(docs × bands).

    Returns (id_a, id_b, jaccard DOUBLE).
    """
    sigged = _shingled_signatures(df, id_col, text_col, shingle_n, num_hashes)
    cands = minhash_band_candidates(
        sigged, id_col, num_hashes, bands, max_bucket_size
    )
    sh = sigged.select(F.col(id_col).alias("vid"), "shingles")
    paired = (
        cands.join(
            sh.select(F.col("vid").alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        ).join(
            sh.select(F.col("vid").alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
    )
    jaccard = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        paired.withColumn("jaccard", F.round(jaccard, 4))
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


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """(id, simhash) via explode → one codegen'd xxhash64 per shingle →
    per-bit conditional-sum aggregation → bit pack. Equivalent to
    :func:`simhash_expr` (order-independent sign votes), but every stage is
    whole-stage-codegen'd straight-line code with map-side partial
    aggregation — the per-row interpreted 64-slot fold becomes a
    (doc × 64)-column partial agg whose shuffle payload is one row per doc.
    This is the 100 TB shape; ``simhash_expr`` remains as the single-row
    expression API."""
    ex = df.select(F.col(id_col).alias("doc"), F.explode("shingles").alias("s"))
    h = ex.select("doc", F.xxhash64("s").alias("h"))
    votes = h.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(h, {b}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    packed = " | ".join(
        f"(CASE WHEN v{b} > 0 THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(bits)
    )
    return votes.select("doc", F.expr(packed).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs with a *recall guarantee* for Hamming distance
    ≤ ``max_hamming`` (Manku/Charikar-style multi-block blocking).

    The 64-bit simhash is split into ``max_hamming + 2`` nearly-equal bit
    blocks; each document emits one candidate key per *pair* of blocks
    (C(b, 2) keys, each the concatenation of two block values). A pair of
    documents differing in ≤ max_hamming bits touches at most max_hamming
    blocks, leaving ≥ 2 blocks identical — so they share at least one key
    (pigeonhole). Candidate generation is an equi-join on (key index, key);
    each exploded row carries only (id, simhash, rot, key) — four fixed-
    width columns, no document payload. Verification is one bit_count XOR
    per candidate pair.

    Two-block keys keep the bucket space wide (≈ 2·64/b bits per key) so
    buckets stay small at scale; ``max_bucket_size`` additionally drops
    degenerate buckets (e.g. the all-zeros simhash of boilerplate docs),
    same policy as :func:`minhash_band_candidates`.
    """
    n_blocks = max_hamming + 2
    if n_blocks > 64:
        raise ValueError(f"max_hamming={max_hamming} needs >64 one-bit blocks")
    shingled = with_shingles(df.select(id_col, text_col), text_col).filter(
        F.size("shingles") > 0
    )
    sigged = simhash_signatures(shingled, id_col, text_col)
    # Nearly-equal block spans over the 64 bits.
    bounds = [(i * 64 // n_blocks, (i + 1) * 64 // n_blocks) for i in range(n_blocks)]

    def block(i: int) -> str:
        lo, hi = bounds[i]
        return f"(shiftright(simhash, {lo}) & {(1 << (hi - lo)) - 1})"

    keys = []
    for i in range(n_blocks):
        for j in range(i + 1, n_blocks):
            width_j = bounds[j][1] - bounds[j][0]
            keys.append(f"shiftleft({block(i)}, {width_j}) | {block(j)}")
    key_arr = F.expr(f"array({', '.join(keys)})")
    blocked = sigged.select(
        "doc", "simhash", F.posexplode(key_arr).alias("rot", "key")
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window as W

        blocked = blocked.withColumn(
            "bucket_n", F.count("*").over(W.partitionBy("rot", "key"))
        ).filter(F.col("bucket_n") <= max_bucket_size)
    a = blocked.select(F.col("doc").alias("id_a"), F.col("simhash").alias("h_a"), "rot", "key")
    b = blocked.select(F.col("doc").alias("id_b"), F.col("simhash").alias("h_b"), "rot", "key")
    cands = (
        a.join(b, ["rot", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.expr("h_a ^ h_b"))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
