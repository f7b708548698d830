"""Product quantization (PQ) for embedding compression + ADC search.

The published FAISS/Jégou et al. design ("Product Quantization for Nearest
Neighbor Search", TPAMI 2011): split each d-dim vector into M contiguous
subvectors, k-means each subspace independently (k centroids), store each
vector as M centroid ids (M bytes for k ≤ 256) — a d·4-byte float vector
compresses to M bytes (64× here: 64 floats → 4 codes). Search uses
Asymmetric Distance Computation (ADC): the query stays exact; per subspace
a k-entry lookup table of query↔centroid distances is built once, and each
database vector's approximate distance is the sum of M table lookups — no
float vector ever touches the candidates.

Scale split (the part that matters at 100 TB):
  * TRAIN driver-side on a bounded deterministic sample (the standard
    practice — codebooks are a tiny model, k·M·d_sub floats; FAISS trains
    on samples too). Cost is O(sample), independent of corpus size.
  * ASSIGN / SEARCH distributed: codebooks broadcast to executors, code
    assignment and ADC scoring run vectorized per Arrow batch
    (mapInPandas), and the top-k is a TakeOrdered — zero shuffles.

Everything is deterministic: sample = lowest vec_ids, k-means init =
evenly-strided sorted subvectors, fixed Lloyd iteration count — so results
are reproducible across runs and partitionings (asserted in tests).

Since round 6 every float reduction in this module folds LEFT-TO-RIGHT
(:func:`_ordered_sum` — np.cumsum's sequential order, not np.sum's
pairwise blocking). Fold order is part of the contract (docs/SCALE.md
§10): with a pinned order the whole PQ family — codebook training
included — replays bit-for-bit as DuckDB recursive-CTE + list_reduce
folds, which is what upgraded these ops from rows-only to full oracles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered_sum(a: np.ndarray, axis: int) -> np.ndarray:
    """Strict sequential (left-fold) summation along ``axis``: cumsum's
    last prefix. Matches a SQL ``list_reduce`` left fold bit-for-bit,
    unlike ``np.sum``'s pairwise blocking — the one-line price of making
    every k-means/ADC distance cross-engine replayable."""
    return np.cumsum(a, axis=axis).take(-1, axis=axis)


def train_codebooks(
    sample: np.ndarray, m: int = 4, k: int = 16, iters: int = 10
) -> np.ndarray:
    """k-means codebooks per subspace over a training sample.

    Returns (m, k, d_sub). Deterministic: initial centroids are an even
    stride over the sample's subvectors sorted lexicographically; ties in
    assignment break to the lowest centroid id (numpy argmin); empty
    clusters keep their previous centroid."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m
    books = np.empty((m, k, d_sub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * d_sub : (j + 1) * d_sub].astype(np.float64)
        order = np.lexsort(sub.T[::-1])
        centroids = sub[order[np.linspace(0, n - 1, k).astype(int)]].copy()
        for _ in range(iters):
            d2 = _ordered_sum((sub[:, None, :] - centroids[None, :, :]) ** 2, axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    # sequential fold in sample order, then divide — the
                    # replayable mean (NOT np.mean's pairwise sum)
                    centroids[c] = _ordered_sum(sub[mask], axis=0) / mask.sum()
        books[j] = centroids
    return books


def encode_batch(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Assign PQ codes for a batch: (n, d) → (n, m) uint8 centroid ids."""
    n, d = vecs.shape
    m, k, d_sub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        sub = vecs[:, j * d_sub : (j + 1) * d_sub, None].astype(np.float64)
        d2 = _ordered_sum((sub - books[j].T[None, :, :]) ** 2, axis=1)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def decode_codes(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Reconstruct approximate vectors from codes: (n, m) → (n, d)."""
    m, k, d_sub = books.shape
    return np.concatenate(
        [books[j][codes[:, j]] for j in range(m)], axis=1
    )


def adc_table(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Per-subspace query↔centroid squared-distance lookup table (m, k)."""
    m, k, d_sub = books.shape
    tab = np.empty((m, k), dtype=np.float64)
    for j in range(m):
        diff = books[j] - query[j * d_sub : (j + 1) * d_sub][None, :]
        tab[j] = _ordered_sum(diff * diff, axis=1)
    return tab


def pq_quantize(emb: DataFrame, books: np.ndarray,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Distributed PQ encoding: codebooks ride the closure (broadcast by
    Spark's task serialization — a few KB), each Arrow batch is encoded and
    reconstruction error computed vectorized. Output:
    (id, pq_code hex string, recon_err double)."""
    spark_books = books  # captured; tiny

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            codes = encode_batch(vecs, spark_books)
            recon = decode_codes(codes, spark_books)
            err = np.sqrt(_ordered_sum((vecs - recon) ** 2, axis=1))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col],
                    "pq_code": [c.tobytes().hex() for c in codes],
                    "recon_err": err,
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, "vec_id long, pq_code string, recon_err double"
    )


def adc_topk(emb: DataFrame, books: np.ndarray, query: np.ndarray, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """ADC search: encode each database vector, score it as the sum of M
    lookup-table entries against the exact query, return global top-k by
    ascending approximate distance (ties → lowest id, total order). One
    scan, one Python stage, TakeOrdered — zero shuffles."""
    tab = adc_table(query, books)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            codes = encode_batch(vecs, books)
            dist = _ordered_sum(
                tab[np.arange(tab.shape[0])[None, :], codes], axis=1
            )
            yield pd.DataFrame({"vec_id": pdf[id_col], "adc_dist": dist})

    scored = emb.select(id_col, vec_col).mapInPandas(
        run, "vec_id long, adc_dist double"
    )
    return (
        scored.select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )


def ivfpq_topk(
    emb: DataFrame,
    coarse: np.ndarray,
    books: np.ndarray,
    query: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search (the published FAISS IVFADC architecture): a coarse
    quantizer routes each vector to a cell; PQ encodes the RESIDUAL
    (vector − its centroid); a query probes only the ``n_probe`` nearest
    cells and ADC-scores candidates with a per-cell lookup table built
    from the query's residual against that cell.

    ``coarse`` is (C, d) centroids, ``books`` the residual codebooks.
    Executed as ONE scan + one vectorized Python stage (cell assignment,
    probe filter, residual encode, table lookup all per Arrow batch) +
    TakeOrdered — zero shuffles; non-probed vectors cost one argmin and
    are dropped before any PQ work."""
    cd2 = _ordered_sum((coarse - query[None, :]) ** 2, axis=1)
    probed = np.argsort(cd2, kind="stable")[:n_probe]
    tabs = {int(c): adc_table(query - coarse[c], books) for c in probed}
    probed_set = set(int(c) for c in probed)
    m = books.shape[0]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].map(np.asarray).values).astype(np.float64)
            d2 = _ordered_sum((vecs[:, None, :] - coarse[None, :, :]) ** 2, axis=2)
            cells = d2.argmin(axis=1)
            keep = np.isin(cells, list(probed_set))
            if not keep.any():
                yield pd.DataFrame({"vec_id": [], "adc_dist": []}).astype(
                    {"vec_id": "int64", "adc_dist": "float64"}
                )
                continue
            v = vecs[keep]
            cell_kept = cells[keep]
            res = v - coarse[cell_kept]
            codes = encode_batch(res, books)
            dist = np.empty(len(v), dtype=np.float64)
            for c in probed_set:
                cmask = cell_kept == c
                if cmask.any():
                    tab = tabs[c]
                    dist[cmask] = _ordered_sum(
                        tab[np.arange(m)[None, :], codes[cmask]], axis=1
                    )
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].values[keep], "adc_dist": dist}
            )

    scored = emb.select(id_col, vec_col).mapInPandas(
        run, "vec_id long, adc_dist double"
    )
    return (
        scored.select("vec_id", F.round("adc_dist", 6).alias("adc_dist"))
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors (round 6). Because every reduction above folds
# left-to-right, the ENTIRE family — Lloyd training included — replays in
# SQL: distances are list_reduce left folds, means are vec_id-ordered
# folds, and the training loop is a recursive CTE whose working table
# carries all (subspace, centroid) vectors per iteration. Kept adjacent
# to the kernels so the two sides cannot drift silently.
# ---------------------------------------------------------------------------

# Sequential squared-distance fold between two DOUBLE[] lists {a}, {b}.
DUCK_SQDIST = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, {ds}), t -> "
    "({a}[t] - {b}[t]) * ({a}[t] - {b}[t]))), (acc, x) -> acc + x)"
)


def duck_kmeans_ctes(
    prefix: str, samp: str, m: int, k: int, d_sub: int, iters: int
) -> str:
    """CTE chain ending in ``{prefix}books(j, cid, v)`` — the exact replay
    of :func:`train_codebooks` over a sample CTE ``samp`` exposing
    (pos BIGINT, j, v DOUBLE[]) rows (pos = 1-based sample order, one row
    per subspace j). Init = even stride over the lexicographically sorted
    subvectors (numpy linspace truncation replayed in double arithmetic);
    assignment = pinned-fold argmin with lowest-cid tie-break; means =
    sample-order folds; empty clusters keep their previous centroid."""
    dist = DUCK_SQDIST.format(ds=d_sub, a="s.v", b="c.v")
    return f"""
    {prefix}n AS (SELECT count(DISTINCT pos) AS n FROM {samp}),
    {prefix}sorted AS (
      SELECT j, row_number() OVER (PARTITION BY j ORDER BY v, pos) AS sidx, v
      FROM {samp}
    ),
    {prefix}init AS (
      SELECT s.j, i.i AS cid, s.v
      FROM (SELECT unnest(generate_series(0, {k - 1})) AS i) i
      JOIN {prefix}sorted s
        ON s.sidx = 1 + CASE WHEN i.i = {k - 1}
             THEN (SELECT n - 1 FROM {prefix}n)
             ELSE CAST(trunc((((SELECT n FROM {prefix}n) - 1) / {k - 1}.0)
                             * i.i) AS BIGINT) END
    ),
    {prefix}km AS (
      SELECT 0 AS it, j, cid, v FROM {prefix}init
      UNION ALL
      SELECT * FROM (
        WITH cur AS (SELECT it, j, cid, v FROM {prefix}km WHERE it < {iters}),
        asg AS (
          SELECT s.j, s.pos, s.v AS sv, c.cid,
                 row_number() OVER (
                   PARTITION BY s.j, s.pos ORDER BY {dist}, c.cid) AS rk
          FROM {samp} s JOIN cur c ON c.j = s.j
        ),
        grp AS (
          SELECT j, cid, list(sv ORDER BY pos) AS vecs, count(*) AS cnt
          FROM asg WHERE rk = 1 GROUP BY j, cid
        ),
        means AS (
          SELECT j, cid,
                 list_transform(generate_series(1, {d_sub}), t ->
                   list_reduce(list_prepend(CAST(0 AS DOUBLE),
                     list_transform(vecs, w -> w[t])), (acc, x) -> acc + x)
                   / cnt) AS v
          FROM grp
        )
        SELECT cur.it + 1, cur.j, cur.cid, coalesce(mn.v, cur.v) AS v
        FROM cur LEFT JOIN means mn ON mn.j = cur.j AND mn.cid = cur.cid
      )
    ),
    {prefix}books AS (SELECT j, cid, v FROM {prefix}km WHERE it = {iters})"""


def duck_pq_sample_ctes(m: int, d_sub: int, limit: int = 512,
                        name: str = "pq_samp") -> str:
    """Sample CTE ``{name}(pos, j, v)``: the lowest ``limit`` vec_ids
    sliced into m subspaces — the SQL twin of _pq_books_and_query's
    driver-side collect."""
    return f"""
    {name} AS (
      SELECT pos, j,
             CAST(embedding[j * {d_sub} + 1 : (j + 1) * {d_sub}]
                  AS DOUBLE[]) AS v
      FROM (SELECT row_number() OVER (ORDER BY vec_id) AS pos, embedding
            FROM (SELECT vec_id, embedding FROM embeddings
                  WHERE (embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL OR NOT (abs(x) < 1e12))) = 0)
                  ORDER BY vec_id LIMIT {limit}))
      CROSS JOIN (SELECT unnest(generate_series(0, {m - 1})) AS j)
    )"""
