"""Geo declared queries (ES geo-aggregation parity): equirectangular
grid bucketing with centroid metrics, and radius (geo_distance)
filtering — over coordinates synthesized identically on both sides
from c_custkey in integer centi-degrees (see operators/geo.py for why
integers).

lat spans [-60, 60) and lon [-180, 180) via coprime multipliers, so
cells fill the usable band and the bounding box / radius cuts are
non-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import geo as G
from .declared import _t, q

# lat_centi = -6000 + (c_custkey * 7) % 12000 ; lon_centi = -18000 +
# (c_custkey * 13) % 36000
_LATLON_SQL = (
    "-6000 + (c_custkey * 7) % 12000 AS lat_centi, "
    "-18000 + (c_custkey * 13) % 36000 AS lon_centi"
)

_GRID_ORACLE = f"""
WITH pts AS (SELECT c_custkey, c_acctbal, {_LATLON_SQL} FROM customer),
box AS (SELECT * FROM pts
        WHERE lat_centi >= -3000 AND lat_centi < 3000
          AND lon_centi >= -9000 AND lon_centi < 9000),
cells AS (SELECT (lat_centi + 9000) // 500 AS cell_y,
                 (lon_centi + 18000) // 500 AS cell_x,
                 lat_centi, lon_centi, c_acctbal
          FROM box)
SELECT cell_y, cell_x,
       COUNT(*) AS n_points,
       round(CAST(SUM(lat_centi) AS DOUBLE) / (COUNT(*) * 100.0), 6)
         AS centroid_lat,
       round(CAST(SUM(lon_centi) AS DOUBLE) / (COUNT(*) * 100.0), 6)
         AS centroid_lon,
       round(SUM(round(c_acctbal * 100)) / 100.0, 2) AS total_bal
FROM cells
GROUP BY cell_y, cell_x
HAVING COUNT(*) >= 5
ORDER BY n_points DESC, cell_y, cell_x
LIMIT 40
"""


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_acctbal",
        "c_nationkey",
        (F.lit(-6000) + (F.col("c_custkey") * 7) % 12000).alias("lat_centi"),
        (F.lit(-18000) + (F.col("c_custkey") * 13) % 36000).alias("lon_centi"),
    )


@q("geo_grid_counts", _GRID_ORACLE)
def geo_grid_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geotile_grid-style bucketing inside a bounding box with
    geo_centroid metrics: integer cell assignment (narrow, codegen),
    bounding-box filter pushed to the scan, one partial-aggregated
    groupBy. Balance totals stage through exact cents."""
    lat, lon = F.col("lat_centi"), F.col("lon_centi")
    box = _pts(spark, sf_dir).where(
        lat.between(-3000, 2999) & lon.between(-9000, 8999)
    )
    cy, cx = G.grid_cell(lat, lon, 500)
    clat, clon = G.centroid_cols(lat, lon)
    return (
        box.select(cy.alias("cell_y"), cx.alias("cell_x"), lat, lon, "c_acctbal")
        .groupBy("cell_y", "cell_x")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            clat.alias("centroid_lat"),
            clon.alias("centroid_lon"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100)) / 100.0, 2
            ).alias("total_bal"),
        )
        .where(F.col("n_points") >= 5)
        .orderBy(F.col("n_points").desc(), "cell_y", "cell_x")
        .limit(40)
    )


_RADIUS_ORACLE = f"""
WITH pts AS (SELECT c_custkey, c_nationkey, {_LATLON_SQL} FROM customer),
hit AS (SELECT * FROM pts
        WHERE (lat_centi - 1000) * (lat_centi - 1000)
            + (lon_centi + 2000) * (lon_centi + 2000) <= 2500 * 2500)
SELECT n_name AS nation,
       COUNT(*) AS n_customers,
       MIN(c_custkey) AS min_cust,
       MAX(c_custkey) AS max_cust
FROM hit JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_customers DESC, nation
"""


@q("geo_radius_customers", _RADIUS_ORACLE)
def geo_radius_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_distance query: customers inside a 25-degree disk around
    (10, -20), counted per nation. The disk test is an exact integer
    predicate evaluated at the scan; the nation name join broadcasts."""
    pts = _pts(spark, sf_dir)
    hit = pts.where(
        G.within_radius(
            F.col("lat_centi"), F.col("lon_centi"), 1000, -2000, 2500
        )
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        hit.join(F.broadcast(nation), hit.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_cust"),
            F.max("c_custkey").alias("max_cust"),
        )
        .orderBy(F.col("n_customers").desc(), "nation")
    )


# ---------------------------------------------------------------------------
# geo_bounds + geo_centroid per nation (ES geo_bounds / geo_centroid
# aggregations): bounding box and centroid of each nation's customers.
# ---------------------------------------------------------------------------

_BOUNDS_ORACLE = f"""
WITH pts AS (SELECT c_custkey, c_nationkey, {_LATLON_SQL} FROM customer),
s AS (SELECT c_nationkey,
             CAST(count(*) AS BIGINT) AS n_points,
             CAST(min(lat_centi) AS BIGINT) AS min_lat_c,
             CAST(max(lat_centi) AS BIGINT) AS max_lat_c,
             CAST(min(lon_centi) AS BIGINT) AS min_lon_c,
             CAST(max(lon_centi) AS BIGINT) AS max_lon_c,
             CAST(sum(lat_centi + 6000) AS BIGINT) AS slat,
             CAST(sum(lon_centi + 18000) AS BIGINT) AS slon
      FROM pts GROUP BY c_nationkey)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, n_points,
       min_lat_c, max_lat_c, min_lon_c, max_lon_c,
       (slat * 10000) // n_points - 60000000 AS centroid_lat_e6,
       (slon * 10000) // n_points - 180000000 AS centroid_lon_e6
FROM s
"""


@q("geo_bounds_by_nation", _BOUNDS_ORACLE)
def _geo_bounds_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_bounds/geo_centroid parity: per-nation bounding box and
    centroid over integer centi-degree points — min/max/sum close in
    ONE partial aggregation, and the centroid is emitted as EXACT
    integer micro-degrees (offset-positive floor division: Spark DIV
    and DuckDB // agree on non-negative operands, and no float
    rounding mode is involved — a double centroid can land on an
    exact .5 at the rounding digit, where the engines' round-half
    conventions disagree)."""
    pts = _pts(spark, sf_dir)
    s = pts.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("lat_centi").cast("long").alias("min_lat_c"),
        F.max("lat_centi").cast("long").alias("max_lat_c"),
        F.min("lon_centi").cast("long").alias("min_lon_c"),
        F.max("lon_centi").cast("long").alias("max_lon_c"),
        F.sum(F.col("lat_centi") + 6000).alias("slat"),
        F.sum(F.col("lon_centi") + 18000).alias("slon"),
    )
    return s.select(
        "c_nationkey",
        "n_points",
        "min_lat_c",
        "max_lat_c",
        "min_lon_c",
        "max_lon_c",
        (F.expr("(slat * 10000) DIV n_points") - 60000000).alias(
            "centroid_lat_e6"
        ),
        (F.expr("(slon * 10000) DIV n_points") - 180000000).alias(
            "centroid_lon_e6"
        ),
    )
