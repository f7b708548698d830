"""Vector-similarity primitives over ARRAY<FLOAT> embedding columns
(north star: similarity search at scale).

The cosine kernel is a sequential left-fold in double precision —
bit-identical to DuckDB's ``list_dot_product`` evaluation, which is what
makes the oracle hash-checkable. Brute-force top-k is the correctness
baseline; the LSH-bucketed variant is the 100 TB path (candidate
generation by equi-join on hyperplane sign buckets, then exact re-rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)


def dot_expr(a: str, b: str) -> Column:
    return F.expr(DOT.format(a=a, b=b))


def cosine_expr(a: str, b: str) -> Column:
    """cos(a,b) = dot/(sqrt(dot_aa)*sqrt(dot_bb)) — mirror of the DuckDB
    ``list_dot_product`` formulation."""
    return F.expr(
        f"{DOT.format(a=a, b=b)} / "
        f"(sqrt({DOT.format(a=a, b=a)}) * sqrt({DOT.format(a=b, b=b)}))"
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH (pure python —
    tiny, broadcast as literals into the plan)."""
    import hashlib
    import struct

    planes = []
    for p in range(n_planes):
        vec = []
        for d in range(dim):
            h = hashlib.sha256(f"{seed}:{p}:{d}".encode()).digest()[:8]
            (u,) = struct.unpack("<Q", h)
            vec.append((u / 2**64) * 2.0 - 1.0)
        planes.append(vec)
    return planes


def signature_bucket(emb_col: str, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit p = sign(dot(emb, plane_p)). Vectors in the
    same bucket are cosine-close with high probability."""
    bits = []
    for p, plane in enumerate(planes):
        lits = ", ".join(f"CAST({v!r} AS DOUBLE)" for v in plane)
        dot = DOT.format(a=emb_col, b=f"array({lits})")
        bits.append(f"CASE WHEN {dot} >= 0 THEN shiftleft(1L, {p}) ELSE 0L END")
    return F.expr(" + ".join(bits))


def brute_force_topk(
    df: DataFrame,
    query: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k of every row in ``df`` against the single-row
    ``query`` (broadcast). Tie-break on id for determinism.

    The query norm is hoisted into the broadcast side (computed once, not
    re-folded per scan row) — the scan-side work is one dot + one norm fold
    per row."""
    q = F.broadcast(
        query.select(
            F.col(emb_col).alias("q_emb"),
            F.expr(f"sqrt({DOT.format(a=emb_col, b=emb_col)})").alias("q_norm"),
        )
    )
    cos = F.expr(
        f"{DOT.format(a=emb_col, b='q_emb')} / "
        f"(sqrt({DOT.format(a=emb_col, b=emb_col)}) * q_norm)"
    )
    scored = df.crossJoin(q).select(id_col, cos.alias("cos_sim"))
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)
