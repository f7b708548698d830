"""Geo-spatial operators (round-7 registration queue — finished and
locally oracle-verified here; they take registry slots when the driver
window next rotates).

The engine so far has no spatial family; these two ops add the core
primitives a geo-enriched warehouse needs:

* **grid-blocked radius join** (``join_geo_gridded_radius``): all point
  pairs within R km, WITHOUT a cross join — candidate pairs come from an
  equi-join on coarse lat/lon grid cells (one side exploded to its 3x3
  neighborhood), then an exact haversine verify on the survivors. This is
  the standard spatial-join blocking scheme (the equi-join analog of a
  geohash/S2 covering): candidates shuffle by cell, so the cost is
  O(points-per-cell-neighborhood), not O(n*m).
* **spatial density rollup** (``agg_geo_grid_density``): per-cell point
  counts + centroid — the map-tile / heatmap aggregation, a single
  map-side-combining groupBy on integer cell ids.

The test tables carry no coordinates, so both ops derive deterministic
synthetic points from integer keys via the house portable multiplicative
hash (the same Knuth constant the CMS/KMV sketches use) — IDENTICAL
integer arithmetic runs on both engines, so even the raw coordinates
cross-engine match exactly; distances go through the decimal sandwich and
the radius predicate compares the ROUNDED distance on both engines so the
boolean cannot split at the boundary.

Correctness of the blocking (no missed pair): points span lat in
[-45, 45), cells are 5 degrees; within that band 1 degree of longitude is
>= 111.320*cos(45 deg) = 78.7 km, so a 5-degree cell is >= 393 km in both
axes > R = 300 km — any qualifying pair is in the same or an adjacent
cell, which the 3x3 neighborhood explode covers (pigeonhole, same
guarantee style as the minhash band join / simhash blocks). Longitude
spans [-150, 150) so the grid never wraps the antimeridian.

Scale posture at 100 TB: the density rollup is one partial-agg pass with
O(cells) output; the radius join shuffles both sides once on cell id, the
3x3 explode is a constant 9x on ONE side, and a degenerate cell (urban
hotspot) is bounded by the same max-candidates cap arithmetic as the LSH
buckets — documented per-op below. (Reference analog: none — the
reference has no spatial surface; this family extends the engine the way
the LLM/text tier does.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aced_etl_pod_spark.operators.util import finite, finite_sql, money, money_sql
from aced_etl_pod_spark.registry import op
from aced_etl_pod_spark.tables import load

# Portable coordinate derivation (identical on both engines; all-integer
# until the final /1000.0). Two independent Knuth/xxhash odd constants so
# lat and lon are uncorrelated; the supplier side salts the key so the two
# point sets differ.
_LAT_MUL = 2654435761
_LON_MUL = 2246822519
_MOD32 = 4294967296
_SUPP_SALT = 9973
_CELL_MIL = 5000  # 5-degree cells in milli-degrees
_RADIUS_KM = 300.0


def _lat_mil_sql(key: str) -> str:
    return f"(({key} * {_LAT_MUL}) % {_MOD32}) % 90000"


def _lon_mil_sql(key: str) -> str:
    return f"(({key} * {_LON_MUL}) % {_MOD32}) % 300000"


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle km; plain-function form shared verbatim by both engines."""
    return (
        "2.0 * 6371.0 * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


JOIN_GEO_GRIDDED_RADIUS_ORACLE = f"""
    WITH c AS (
      SELECT c_custkey,
             {_lat_mil_sql('c_custkey')} / 1000.0 - 45.0 AS lat,
             {_lon_mil_sql('c_custkey')} / 1000.0 - 150.0 AS lon
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             {_lat_mil_sql('(s_suppkey + ' + str(_SUPP_SALT) + ')')} / 1000.0 - 45.0 AS lat,
             {_lon_mil_sql('(s_suppkey + ' + str(_SUPP_SALT) + ')')} / 1000.0 - 150.0 AS lon
      FROM supplier
    )
    SELECT c.c_custkey, s.s_suppkey,
           (CASE WHEN abs(CAST({_haversine_sql('c.lat', 'c.lon', 's.lat', 's.lon')} AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST({_haversine_sql('c.lat', 'c.lon', 's.lat', 's.lon')} AS DOUBLE) AS DECIMAL(18,9)), 3) AS DOUBLE) ELSE CAST({_haversine_sql('c.lat', 'c.lon', 's.lat', 's.lon')} AS DOUBLE) END) AS dist_km
    FROM c CROSS JOIN s
    WHERE round(CAST({_haversine_sql('c.lat', 'c.lon', 's.lat', 's.lon')}
                AS DECIMAL(18,9)), 3) <= {_RADIUS_KM}
"""


@op("join_geo_gridded_radius", oracle=JOIN_GEO_GRIDDED_RADIUS_ORACLE, tags=('geo', 'extra'))
def join_geo_gridded_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All (customer, supplier) point pairs within 300 km, via grid-cell
    blocking: suppliers explode to their 3x3 neighbor cells, customers keep
    their own cell, candidates come from the (cell_lat, cell_lon) equi-join
    and only survivors pay the haversine. The oracle is the O(n*m) cross
    join with the identical formula — proving the blocking loses nothing.

    Scale: both sides shuffle once on integer cell ids; the exploded side
    grows a constant 9x (id + cell only, not the payload — coordinates
    rejoin after the verify would be the 100 TB variant; here the row is
    already 3 columns). Density skew is bounded by cell granularity the
    same way LSH bucket width is: halve _CELL_MIL (and the radius bound)
    to split hotspots, exactly the geohash-precision knob."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_lat_mil_sql("c_custkey")).alias("lat_mil"),
        F.expr(_lon_mil_sql("c_custkey")).alias("lon_mil"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(_lat_mil_sql(f"(s_suppkey + {_SUPP_SALT})")).alias("lat_mil"),
        F.expr(_lon_mil_sql(f"(s_suppkey + {_SUPP_SALT})")).alias("lon_mil"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(da).alias("da"), F.lit(db).alias("db"))
            for da in (-1, 0, 1)
            for db in (-1, 0, 1)
        ]
    )
    supp9 = supp.select(
        "s_suppkey", "lat_mil", "lon_mil", F.explode(offsets).alias("o")
    ).select(
        "s_suppkey",
        "lat_mil",
        "lon_mil",
        (F.expr(f"lat_mil div {_CELL_MIL}") + F.col("o.da")).alias("cell_lat"),
        (F.expr(f"lon_mil div {_CELL_MIL}") + F.col("o.db")).alias("cell_lon"),
    )
    cust_c = cust.select(
        "c_custkey",
        F.col("lat_mil").alias("c_lat_mil"),
        F.col("lon_mil").alias("c_lon_mil"),
        F.expr(f"lat_mil div {_CELL_MIL}").alias("cell_lat"),
        F.expr(f"lon_mil div {_CELL_MIL}").alias("cell_lon"),
    )
    cand = cust_c.join(supp9, ["cell_lat", "cell_lon"]).select(
        "c_custkey",
        "s_suppkey",
        (F.col("c_lat_mil") / 1000.0 - 45.0).alias("clat"),
        (F.col("c_lon_mil") / 1000.0 - 150.0).alias("clon"),
        (F.col("lat_mil") / 1000.0 - 45.0).alias("slat"),
        (F.col("lon_mil") / 1000.0 - 150.0).alias("slon"),
    )
    dist = F.expr(
        "round(CAST("
        + _haversine_sql("clat", "clon", "slat", "slon")
        + " AS DECIMAL(18,9)), 3)"
    )
    return (
        cand.withColumn("dist_km", dist.cast("double"))
        .filter(F.col("dist_km") <= _RADIUS_KM)
        .select("c_custkey", "s_suppkey", "dist_km")
        .orderBy("c_custkey", "s_suppkey")
    )


AGG_GEO_GRID_DENSITY_ORACLE = f"""
    WITH p AS (
      SELECT {_lat_mil_sql('event_id')} AS lat_mil,
             {_lon_mil_sql('event_id')} AS lon_mil
      FROM events
    )
    SELECT lat_mil // {_CELL_MIL} AS cell_lat,
           lon_mil // {_CELL_MIL} AS cell_lon,
           CAST(count(*) AS BIGINT) AS n,
           (CASE WHEN abs(CAST(sum(lat_mil) / count(*) / 1000.0 - 45.0 AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST(sum(lat_mil) / count(*) / 1000.0 - 45.0 AS DOUBLE) AS DECIMAL(18,9)), 3) AS DOUBLE) ELSE CAST(sum(lat_mil) / count(*) / 1000.0 - 45.0 AS DOUBLE) END) AS centroid_lat,
           (CASE WHEN abs(CAST(sum(lon_mil) / count(*) / 1000.0 - 150.0 AS DOUBLE)) < 1e9 THEN CAST(round(CAST(CAST(sum(lon_mil) / count(*) / 1000.0 - 150.0 AS DOUBLE) AS DECIMAL(18,9)), 3) AS DOUBLE) ELSE CAST(sum(lon_mil) / count(*) / 1000.0 - 150.0 AS DOUBLE) END) AS centroid_lon
    FROM p
    GROUP BY 1, 2
"""


@op("agg_geo_grid_density", oracle=AGG_GEO_GRID_DENSITY_ORACLE, tags=('geo', 'extra'))
def agg_geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-tile density rollup: events hashed to deterministic points, one
    map-side-combining groupBy on integer (cell_lat, cell_lon) emitting
    count + centroid. Centroid sums stay INTEGER milli-degrees until the
    final divide, so the partials are exact and mergeable (same algebra as
    the sketch family) — at 100 TB this is a partial-agg pass whose shuffle
    is O(cells), and coarser zoom levels compose from finer ones the way
    agg_cascading_rollup's grains do."""
    e = load(spark, sf_dir, "events").select(
        F.expr(_lat_mil_sql("event_id")).alias("lat_mil"),
        F.expr(_lon_mil_sql("event_id")).alias("lon_mil"),
    )
    return (
        e.groupBy(
            F.expr(f"lat_mil div {_CELL_MIL}").alias("cell_lat"),
            F.expr(f"lon_mil div {_CELL_MIL}").alias("cell_lon"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("lat_mil").alias("slat"),
            F.sum("lon_mil").alias("slon"),
        )
        .select(
            "cell_lat",
            "cell_lon",
            "n",
            F.expr(
                "CAST(round(CAST(slat / n / 1000.0 - 45.0 AS DECIMAL(18,9)), 3)"
                " AS DOUBLE)"
            ).alias("centroid_lat"),
            F.expr(
                "CAST(round(CAST(slon / n / 1000.0 - 150.0 AS DECIMAL(18,9)), 3)"
                " AS DOUBLE)"
            ).alias("centroid_lon"),
        )
        .orderBy("cell_lat", "cell_lon")
    )


# ---------------------------------------------------------------------------
# join_geo_point_in_polygon (round-7 registration queue)
# ---------------------------------------------------------------------------

# Three convex polygons in raw milli-degree space (lon_mil = x in
# [0, 300000), lat_mil = y in [0, 90000)), vertices counter-clockwise.
# Integer vertices + integer points => the half-plane cross products are
# exact BIGINT arithmetic; no float enters the containment decision.
_POLYGONS = {
    "diamond": [(175000, 45000), (150000, 70000), (125000, 45000), (150000, 20000)],
    "box": [(40000, 10000), (90000, 10000), (90000, 30000), (40000, 30000)],
    "tri": [(220000, 50000), (280000, 55000), (250000, 85000)],
}


def _polygon_edges():
    rows = []
    for label, verts in _POLYGONS.items():
        xs = [v[0] for v in verts]
        ys = [v[1] for v in verts]
        bbox = (min(xs), max(xs), min(ys), max(ys))
        for i, (x1, y1) in enumerate(verts):
            x2, y2 = verts[(i + 1) % len(verts)]
            rows.append((label, x1, y1, x2, y2, *bbox))
    return rows


_EDGE_VALUES = ", ".join(
    f"('{l}', {x1}, {y1}, {x2}, {y2}, {bx1}, {bx2}, {by1}, {by2})"
    for l, x1, y1, x2, y2, bx1, bx2, by1, by2 in _polygon_edges()
)

JOIN_GEO_POINT_IN_POLYGON_ORACLE = f"""
    WITH edges(label, x1, y1, x2, y2, bx1, bx2, by1, by2) AS
      (VALUES {_EDGE_VALUES}),
    pts AS (
      SELECT c_custkey,
             {_lon_mil_sql('c_custkey')} AS px,
             {_lat_mil_sql('c_custkey')} AS py
      FROM customer
    ),
    hits AS (
      SELECT p.c_custkey, e.label,
             (e.x2 - e.x1) * (p.py - e.y1) - (e.y2 - e.y1) * (p.px - e.x1)
               AS cross_z
      FROM pts p JOIN edges e
        ON p.px BETWEEN e.bx1 AND e.bx2 AND p.py BETWEEN e.by1 AND e.by2
    ),
    verdicts AS (
      SELECT c_custkey, label, min(cross_z) >= 0 AS inside
      FROM hits GROUP BY 1, 2
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_bbox_candidates,
           CAST(count(*) FILTER (WHERE inside) AS BIGINT) AS n_inside
    FROM verdicts GROUP BY label
"""


@op("join_geo_point_in_polygon", oracle=JOIN_GEO_POINT_IN_POLYGON_ORACLE, tags=('geo', 'extra'))
def join_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join against a broadcast polygon table: candidate
    (point, polygon) pairs come from a bounding-box theta join (the prune
    step — at scale the bbox test is what a grid/R-tree index would
    answer), and containment is the convex half-plane test: a point is
    inside iff EVERY edge's cross product is non-negative (vertices CCW).
    Points and vertices live in integer milli-degree space, so the
    decision is exact BIGINT arithmetic — no float epsilon, no
    cross-engine trig.

    Scale: the polygon side is O(edges) and broadcast; each point pays
    the bbox test per polygon (or per grid-cell bucket of polygons when
    the table grows — the same cell-blocking join_geo_gridded_radius
    uses); the min-agg over a point's edges is a within-group fold of a
    handful of rows. Output is O(polygons)."""
    pts = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_lon_mil_sql("c_custkey")).alias("px"),
        F.expr(_lat_mil_sql("c_custkey")).alias("py"),
    )
    edges = spark.createDataFrame(
        _polygon_edges(),
        "label string, x1 long, y1 long, x2 long, y2 long,"
        " bx1 long, bx2 long, by1 long, by2 long",
    )
    hits = pts.join(
        F.broadcast(edges),
        (F.col("px").between(F.col("bx1"), F.col("bx2")))
        & (F.col("py").between(F.col("by1"), F.col("by2"))),
    ).select(
        "c_custkey",
        "label",
        (
            (F.col("x2") - F.col("x1")) * (F.col("py") - F.col("y1"))
            - (F.col("y2") - F.col("y1")) * (F.col("px") - F.col("x1"))
        ).alias("cross_z"),
    )
    verdicts = hits.groupBy("c_custkey", "label").agg(
        (F.min("cross_z") >= 0).alias("inside")
    )
    return (
        verdicts.groupBy("label")
        .agg(
            F.count("*").alias("n_bbox_candidates"),
            F.count_if(F.col("inside")).alias("n_inside"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# join_geo_nearest_broadcast (round-7 registration queue)
# ---------------------------------------------------------------------------

JOIN_GEO_NEAREST_BROADCAST_ORACLE = f"""
    WITH c AS (
      SELECT c_custkey,
             {_lat_mil_sql('c_custkey')} / 1000.0 - 45.0 AS lat,
             {_lon_mil_sql('c_custkey')} / 1000.0 - 150.0 AS lon
      FROM customer
    ),
    s AS (
      SELECT s_suppkey,
             {_lat_mil_sql('(s_suppkey + ' + str(_SUPP_SALT) + ')')} / 1000.0 - 45.0 AS lat,
             {_lon_mil_sql('(s_suppkey + ' + str(_SUPP_SALT) + ')')} / 1000.0 - 150.0 AS lon
      FROM supplier
    ),
    d AS (
      SELECT c.c_custkey, s.s_suppkey,
             round(CAST({_haversine_sql('c.lat', 'c.lon', 's.lat', 's.lon')}
                   AS DECIMAL(18,9)), 3) AS dist_km,
             row_number() OVER (
               PARTITION BY c.c_custkey
               ORDER BY round(CAST({_haversine_sql('c.lat', 'c.lon', 's.lat', 's.lon')}
                        AS DECIMAL(18,9)), 3), s.s_suppkey
             ) AS rk
      FROM c CROSS JOIN s
    )
    SELECT c_custkey, s_suppkey, CAST(dist_km AS DOUBLE) AS dist_km
    FROM d WHERE rk = 1
"""


@op("join_geo_nearest_broadcast", oracle=JOIN_GEO_NEAREST_BROADCAST_ORACLE, tags=('geo', 'extra'))
def join_geo_nearest_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor geo join for a SMALL reference set: each customer's
    closest supplier, via a broadcast of the supplier points and a
    per-customer argmin as min(struct(rounded_dist, key)) — lexicographic
    struct-min IS argmin-with-tie-break, and unlike a row_number window
    it PARTIAL-AGGREGATES: each task reduces its candidate block to one
    row per customer map-side, so the n x m candidate set never shuffles
    and never sorts. (The first formulation, a per-customer window,
    pushed all 15M sf0.1 candidates through an exchange + sort: 16.8 s;
    this plan: ~0.7 s — the ladder caught it.) This is the broadcast tier
    of spatial KNN — correct whenever the reference set fits an executor
    (thousands of depots/stores); the big-reference tier is
    expanding-ring search over the same grid cells
    join_geo_gridded_radius builds."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.expr(_lat_mil_sql("c_custkey")) / 1000.0 - 45.0).alias("clat"),
        (F.expr(_lon_mil_sql("c_custkey")) / 1000.0 - 150.0).alias("clon"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (F.expr(_lat_mil_sql(f"(s_suppkey + {_SUPP_SALT})")) / 1000.0 - 45.0).alias(
            "slat"
        ),
        (F.expr(_lon_mil_sql(f"(s_suppkey + {_SUPP_SALT})")) / 1000.0 - 150.0).alias(
            "slon"
        ),
    )
    d = cust.crossJoin(F.broadcast(supp)).select(
        "c_custkey",
        "s_suppkey",
        F.expr(
            "round(CAST("
            + _haversine_sql("clat", "clon", "slat", "slon")
            + " AS DECIMAL(18,9)), 3)"
        ).alias("dist_km"),
    )
    best = d.groupBy("c_custkey").agg(
        F.min(F.struct("dist_km", "s_suppkey")).alias("b")
    )
    return best.select(
        "c_custkey",
        F.col("b.s_suppkey").alias("s_suppkey"),
        F.col("b.dist_km").cast("double").alias("dist_km"),
    ).orderBy("c_custkey")
