"""Deduplication algorithms for large-scale text corpora (north star:
exact hash, MinHash+LSH, SimHash, n-gram Jaccard).

Design for 100 TB (cf. PAPERS.md near-duplicate detection literature):
never compare all pairs. Every near-dup algorithm here reduces candidate
generation to an EQUI-JOIN on a derived key (band hash / simhash prefix),
which Spark shuffles by key — O(n) + O(candidate pairs), not O(n²).

Hashing is sha256-derived (ONE JVM-codegen'd ``sha2`` per shingle) with
cheap universal-hash permutations / bit slices on top — the same
portable-pseudo-randomness recipe as the sign-LSH planes
(functions/similarity.py): because sha256 and the mult-mod arithmetic are
bit-identical in DuckDB, the "approximate" MinHash/SimHash indexes are
deterministically replayable and the ops carry FULL differential oracles
(``duck_minhash_pairs_cte`` / ``duck_simhash_pairs_cte`` below), not just
recall tests. Engine-native hashes (xxhash64/murmur) would be faster per
call but tie correctness to one engine's implementation; one sha256 per
shingle amortized over 32 permutations costs about the same as the 32
xxhash64 calls it replaces.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aced_etl_pod_spark.functions.text import NORMALIZE_SQL, word_shingles_expr

# 2^31 - 1 (Mersenne prime). With 31-bit base hashes and 31-bit
# coefficients every intermediate product stays < 2^62 — exact int64 on
# BOTH engines, no overflow wrap to diverge on (the constraint that
# sizes the whole scheme; cf. ADVICE r5 on stat_bootstrap_poisson_ci).
MH_P = 2147483647

# 31-bit base hash of a shingle: the top 8 hex chars of sha256, mod p.
# JVM-side (sha2 is codegen'd); DuckDB replays it verbatim via
# CAST('0x' || substr(sha256(x), 1, 8) AS UBIGINT) % p.
BASE_HASH_SQL = "CAST(conv(substr(sha2({x}, 256), 1, 8), 16, 10) AS BIGINT) % 2147483647"
DUCK_BASE_HASH_SQL = (
    "CAST(CAST('0x' || substr(sha256({x}), 1, 8) AS UBIGINT) % 2147483647 AS BIGINT)"
)

# Band-bucket fold seed: any constant < p keeps acc*seed + v < 2^62.
_BAND_MULT = 1000003


def minhash_params(num_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic universal-hash coefficients (a_k in [1, p-1], b_k in
    [0, p-1]) derived from sha256 of the seed index — pure Python, tiny,
    embedded as LITERALS into both the Spark plan and the DuckDB oracle
    (the same derive-constants-from-sha256 pattern as
    ``random_hyperplanes`` in functions/similarity.py)."""
    a_coef, b_coef = [], []
    for k in range(num_hashes):
        (ua,) = struct.unpack(
            "<Q", hashlib.sha256(f"minhash:a:{k}".encode()).digest()[:8]
        )
        (ub,) = struct.unpack(
            "<Q", hashlib.sha256(f"minhash:b:{k}".encode()).digest()[:8]
        )
        a_coef.append(1 + ua % (MH_P - 1))
        b_coef.append(ub % MH_P)
    return a_coef, b_coef


def with_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Add a distinct word-n-gram shingle array column."""
    return df.withColumn("shingles", word_shingles_expr(text_col, n))


def minhash_signature(num_hashes: int = 32) -> F.Column:
    """MinHash signature over a ``shingles`` array column:
    sig[k] = min over shingles of (a_k · h31(shingle) + b_k) mod p —
    the classic universal-hash permutation family over a 31-bit
    sha256-derived base hash. ONE sha2 per shingle, then ``num_hashes``
    mult-mods; the base-hash array is bound once via the single-element-
    array lambda (the ngrams_expr trick, functions/text.py) so the sha2
    chain is never re-evaluated per permutation. Returns an ARRAY<BIGINT>
    of length ``num_hashes``."""
    a_coef, b_coef = minhash_params(num_hashes)
    hs = f"transform(shingles, x -> {BASE_HASH_SQL.format(x='x')})"
    mins = ", ".join(
        f"array_min(transform(__h, h -> ({a_coef[k]}L * h + {b_coef[k]}L) % {MH_P}))"
        for k in range(num_hashes)
    )
    return F.expr(f"element_at(transform(array({hs}), __h -> array({mins})), 1)")


def band_buckets_expr(num_hashes: int = 32, bands: int = 8) -> F.Column:
    """Per-band bucket ids over a ``sig`` signature column: a polynomial
    fold of the band's signature slice seeded by the band index
    (acc·1000003 + v mod p) — portable arithmetic instead of an
    engine-native hash, so the oracle replays the bucketing exactly.
    Returns ARRAY<BIGINT> of length ``bands``."""
    rows = num_hashes // bands
    return F.array(
        *[
            F.expr(
                f"aggregate(slice(sig, {b * rows + 1}, {rows}), "
                f"CAST({b + 1} AS BIGINT), "
                f"(acc, v) -> (acc * {_BAND_MULT} + v) % {MH_P})"
            )
            for b in range(bands)
        ]
    )


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
    banded = sigged.select(
        F.col(id_col).alias("doc"),
        F.posexplode(band_buckets_expr(num_hashes, bands)).alias("band", "bucket"),
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
      shingle → signature → band buckets → posexplode → id-only self-equi-
      join on (band index, band bucket) with id_a < id_b → distinct
      candidate pairs → re-join the shingle arrays once per surviving
      pair → verify exact Jaccard → filter ≥ threshold.

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


def simhash_chunks_sql(hash_expr: str, bits: int = 64) -> str:
    """SQL for the 16-bit sha256 chunk array backing a ``bits``-wide
    SimHash: chunk j = hex chars [4j+1, 4j+4] of ``hash_expr`` parsed as
    an integer; bit b of the signature is bit (b mod 16) of chunk
    (b div 16). Chunked parsing keeps every value tiny (< 2^16) — no
    64-bit sign games on either engine."""
    n_chunks = (bits + 15) // 16
    return (
        f"transform(sequence(0, {n_chunks - 1}), "
        f"j -> CAST(conv(substr({hash_expr}, CAST(j * 4 + 1 AS INT), 4), 16, 10)"
        f" AS BIGINT))"
    )


def simhash_expr(bits: int = 64) -> F.Column:
    """SimHash over a ``shingles`` array: sha256 every shingle ONCE (bound
    via the single-element-array lambda), then one fold accumulates
    per-bit sign votes in an ARRAY<BIGINT> accumulator; a final fold packs
    the positive-vote bits into one BIGINT. Single pass over the shingles
    (the naive per-bit formulation re-hashes every shingle ``bits``× and
    explodes codegen)."""
    last = bits - 1
    hs = (
        f"transform(shingles, s -> element_at(transform(array(sha2(s, 256)), "
        f"__x -> {simhash_chunks_sql('__x', bits)}), 1))"
    )
    votes = (
        f"aggregate({hs}, "
        f"  transform(sequence(0, {last}), b -> 0L), "
        f"  (acc, c) -> zip_with(acc, "
        f"    transform(sequence(0, {last}), b -> "
        # function-form shiftright: the `>>` operator fails to parse after
        # a function-call token inside a nested lambda (Spark 4 grammar).
        f"      CASE WHEN (shiftright(element_at(c, CAST(b / 16 AS INT) + 1),"
        f" CAST(b % 16 AS INT)) & 1) = 1 THEN 1L ELSE -1L END), "
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
    """(id, simhash) via explode → one codegen'd sha2 per shingle → 16-bit
    chunk parse → per-bit conditional-sum aggregation → bit pack.
    Equivalent to :func:`simhash_expr` (order-independent sign votes), but
    every stage is whole-stage-codegen'd straight-line code with map-side
    partial aggregation — the per-row interpreted 64-slot fold becomes a
    (doc × 64)-column partial agg whose shuffle payload is one row per doc.
    This is the 100 TB shape; ``simhash_expr`` remains as the single-row
    expression API."""
    n_chunks = (bits + 15) // 16
    ex = df.select(F.col(id_col).alias("doc"), F.explode("shingles").alias("s"))
    h = ex.select(
        "doc",
        *[
            F.expr(
                f"CAST(conv(substr(sha2(s, 256), {4 * j + 1}, 4), 16, 10) AS BIGINT)"
            ).alias(f"c{j}")
            for j in range(n_chunks)
        ],
    )
    votes = h.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.expr(f"(shiftright(c{b // 16}, {b % 16}) & 1) = 1"), 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    packed = " | ".join(
        f"(CASE WHEN v{b} > 0 THEN shiftleft(1L, {b}) ELSE 0L END)"
        for b in range(bits)
    )
    return votes.select("doc", F.expr(packed).alias("simhash"))


def simhash_blocks(max_hamming: int) -> list[tuple[int, int]]:
    """Nearly-equal bit spans for Manku-style blocking: max_hamming + 2
    blocks over the 64 signature bits (shared by the Spark op and its
    DuckDB oracle so both enumerate identical keys)."""
    n_blocks = max_hamming + 2
    if n_blocks > 64:
        raise ValueError(f"max_hamming={max_hamming} needs >64 one-bit blocks")
    return [(i * 64 // n_blocks, (i + 1) * 64 // n_blocks) for i in range(n_blocks)]


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
    bounds = simhash_blocks(max_hamming)
    n_blocks = len(bounds)
    # Same cheap token-count guard as _shingled_signatures (equivalent to
    # size(shingles) > 0 for 3-gram shingles — grams exist iff tokens >= 3).
    tok_n = F.size(F.split(F.expr(NORMALIZE_SQL.format(col=text_col)), " "))
    shingled = with_shingles(
        df.select(id_col, text_col).filter(tok_n >= 3), text_col
    )
    sigged = simhash_signatures(shingled, id_col, text_col)

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
    hamming = F.bit_count(F.expr("h_a ^ h_b")).cast("long")
    return cands.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors — kept adjacent to the kernels they replay so the
# two sides cannot drift silently. Because every hash above is sha256 +
# portable arithmetic, the oracles rebuild the ENTIRE index (shingles →
# signatures → bands/blocks → caps → verify) from first principles in SQL;
# nothing is sampled or approximated away.
# ---------------------------------------------------------------------------

# Distinct 3-gram shingles per document — the SQL twin of
# word_shingles_expr + the token-count guard.
_DUCK_SHINGLES = """
    mh_docs AS (
      SELECT doc_id, list_distinct(
        list_transform(generate_series(1, len(toks) - 2),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
      FROM (SELECT doc_id,
                   string_split(trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')), ' ') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    )"""


def duck_minhash_pairs_cte(
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int = 200,
    pair_filter: str = "TRUE",
) -> str:
    """CTE chain ending in ``mh_pairs(id_a, id_b, jaccard)`` — the exact
    DuckDB replay of :func:`minhash_candidate_pairs` (same coefficients
    embedded as literals, same band fold, same mega-bucket cap, same
    rounded-Jaccard filter). ``pair_filter`` further restricts the
    candidate pairs (used by the incremental variant)."""
    rows = num_hashes // bands
    a_coef, b_coef = minhash_params(num_hashes)
    a_list = ", ".join(str(a) for a in a_coef)
    b_list = ", ".join(str(b) for b in b_coef)
    return f"""
    {_DUCK_SHINGLES},
    mh_hh AS (
      SELECT doc_id, {DUCK_BASE_HASH_SQL.format(x='s')} AS h
      FROM (SELECT doc_id, unnest(shingles) AS s FROM mh_docs)
    ),
    mh_seeds AS (SELECT unnest(generate_series(0, {num_hashes - 1})) AS k,
                        unnest([{a_list}]) AS a, unnest([{b_list}]) AS b),
    mh_sigk AS (
      SELECT doc_id, k, min((a * h + b) % {MH_P}) AS v
      FROM mh_hh CROSS JOIN mh_seeds GROUP BY 1, 2
    ),
    mh_sig AS (SELECT doc_id, list(v ORDER BY k) AS sig FROM mh_sigk GROUP BY 1),
    mh_bands AS (
      SELECT doc_id, b,
             list_reduce(list_prepend(CAST(b + 1 AS BIGINT),
                                      sig[b * {rows} + 1 : b * {rows} + {rows}]),
                         (acc, v) -> (acc * {_BAND_MULT} + v) % {MH_P}) AS bucket
      FROM mh_sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS b)
    ),
    mh_bn AS (SELECT b, bucket, count(*) AS cnt FROM mh_bands GROUP BY 1, 2),
    mh_keep AS (SELECT mh_bands.* FROM mh_bands JOIN mh_bn USING (b, bucket)
                WHERE cnt <= {max_bucket_size}),
    mh_cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                FROM mh_keep x JOIN mh_keep y USING (b, bucket)
                WHERE x.doc_id < y.doc_id),
    mh_pairs AS (
      SELECT id_a, id_b, round(CAST(inter AS DOUBLE) / uni, 4) AS jaccard
      FROM (
        SELECT id_a, id_b,
               len(list_filter(da.shingles,
                               x -> list_contains(db.shingles, x))) AS inter,
               len(da.shingles) + len(db.shingles)
                 - len(list_filter(da.shingles,
                                   x -> list_contains(db.shingles, x))) AS uni
        FROM mh_cand JOIN mh_docs da ON da.doc_id = mh_cand.id_a
                     JOIN mh_docs db ON db.doc_id = mh_cand.id_b
        WHERE {pair_filter}
      )
      WHERE round(CAST(inter AS DOUBLE) / uni, 4) >= {threshold}
    )"""


def duck_simhash_pairs_cte(max_hamming: int = 7) -> str:
    """CTE chain ending in ``sh_pairs(id_a, id_b, hamming)`` — the exact
    DuckDB replay of :func:`simhash_near_pairs` (no bucket cap variant):
    per-bit sign votes from the same sha256 16-bit chunks, block keys
    enumerated from the same :func:`simhash_blocks` spans, Hamming verify
    as a per-bit disagreement count (≡ bit_count(xor) of the packed
    signatures, which the oracle never needs to materialize)."""
    bounds = simhash_blocks(max_hamming)
    n_blocks = len(bounds)
    blk_sqls = []
    for lo, hi in bounds:
        blk_sqls.append(
            "(" + " + ".join(f"bits[{b + 1}] * {1 << (b - lo)}" for b in range(lo, hi)) + ")"
        )
    key_structs = []
    rot = 0
    for i in range(n_blocks):
        for j in range(i + 1, n_blocks):
            width_j = bounds[j][1] - bounds[j][0]
            key_structs.append(
                f"{{'rot': {rot}, 'key': {blk_sqls[i]} * {1 << width_j}"
                f" + {blk_sqls[j]}}}"
            )
            rot += 1
    return f"""
    {_DUCK_SHINGLES},
    sh_ch AS (
      SELECT doc_id,
             [CAST(CAST('0x' || substr(sha256(s), 1, 4) AS UBIGINT) AS BIGINT),
              CAST(CAST('0x' || substr(sha256(s), 5, 4) AS UBIGINT) AS BIGINT),
              CAST(CAST('0x' || substr(sha256(s), 9, 4) AS UBIGINT) AS BIGINT),
              CAST(CAST('0x' || substr(sha256(s), 13, 4) AS UBIGINT) AS BIGINT)]
               AS c
      FROM (SELECT doc_id, unnest(shingles) AS s FROM mh_docs)
    ),
    sh_vb AS (
      SELECT doc_id, bb.b,
             sum(((c[bb.b // 16 + 1] >> (bb.b % 16)) & 1) * 2 - 1) AS v
      FROM sh_ch CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
      GROUP BY 1, 2
    ),
    sh_bits AS (
      SELECT doc_id, list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY b) AS bits
      FROM sh_vb GROUP BY 1
    ),
    sh_keyed AS (
      SELECT doc_id, unnest([{', '.join(key_structs)}]) AS kr
      FROM sh_bits
    ),
    sh_cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM sh_keyed x JOIN sh_keyed y ON x.kr = y.kr AND x.doc_id < y.doc_id
    ),
    sh_pairs AS (
      SELECT id_a, id_b, hamming FROM (
        SELECT id_a, id_b,
               CAST(list_sum(list_transform(generate_series(1, 64),
                 i -> CASE WHEN ba.bits[i] != bb2.bits[i] THEN 1 ELSE 0 END))
                 AS BIGINT) AS hamming
        FROM sh_cand JOIN sh_bits ba ON ba.doc_id = sh_cand.id_a
                     JOIN sh_bits bb2 ON bb2.doc_id = sh_cand.id_b
      ) WHERE hamming <= {max_hamming}
    )"""
