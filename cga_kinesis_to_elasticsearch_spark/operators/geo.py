"""Geo-bucketing and radius filtering (ES geo-aggregation parity).

Elasticsearch's geo family (``geohash_grid`` / ``geotile_grid``
bucketing, ``geo_distance`` filtering, ``geo_bounds`` / ``geo_centroid``
metrics) is a standard log-analytics dimension (client geolocation of
the IPs the reference's access logs carry). This module provides the
same shapes over (lat, lon) columns.

Determinism-first representation: coordinates are INTEGER
centi-degrees (lat * 100), not floating degrees. Grid assignment and
radius tests are then exact integer arithmetic — no transcendentals
(geohash's interleaved-bit codes, Web-Mercator's ln/tan) whose last-ulp
differences across engines could flip a boundary point into a
different bucket. An equirectangular grid loses geohash's
shared-prefix property but buckets identically everywhere, which is
the property a cross-engine pipeline actually needs; the radius test
is the squared-euclidean comparison in centi-degree space (callers
scale the radius by cos(lat) if they need metric fidelity at high
latitudes).

Scale shape: both operators are narrow, codegen'd per-row expressions
— bucketing feeds an ordinary partial-aggregated groupBy, the radius
test is a pushed-down filter. Nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["grid_cell", "within_radius", "centroid_cols"]

# world bounds in centi-degrees — offsets keep the integer division
# non-negative so floor == truncate in every engine
_LAT_OFF = 9000
_LON_OFF = 18000


def grid_cell(lat_centi: Column, lon_centi: Column, cell_centi: int) -> tuple[Column, Column]:
    """``(cell_y, cell_x)`` of a point on an equirectangular grid with
    ``cell_centi``-centi-degree cells (50 = 0.5 deg)."""
    y = ((lat_centi + F.lit(_LAT_OFF)) / cell_centi).cast("long")
    x = ((lon_centi + F.lit(_LON_OFF)) / cell_centi).cast("long")
    return y, x


def within_radius(
    lat_centi: Column,
    lon_centi: Column,
    center_lat_centi: int,
    center_lon_centi: int,
    radius_centi: int,
) -> Column:
    """Exact integer disk test: squared euclidean distance in
    centi-degree space against the squared radius."""
    dy = lat_centi - F.lit(center_lat_centi)
    dx = lon_centi - F.lit(center_lon_centi)
    return (dy * dy + dx * dx) <= F.lit(radius_centi * radius_centi)


def centroid_cols(lat_centi: Column, lon_centi: Column) -> tuple[Column, Column]:
    """Aggregate expressions for a geo_centroid in degrees: exact
    integer sums closed by one double division (identical IEEE result
    on identical inputs in any engine)."""
    lat = F.sum(lat_centi).cast("double") / (F.count(F.lit(1)) * 100.0)
    lon = F.sum(lon_centi).cast("double") / (F.count(F.lit(1)) * 100.0)
    return F.round(lat, 6), F.round(lon, 6)
