"""Geo queries: LatLonPoint box / distance analogs (SURVEY §2.3).

Semantics source (behavior only): o.a.l/document/LatLonPoint.java
(newBoxQuery / newDistanceQuery; demo LuceneDemo8.4.0/.../io/search/geo/
LatLonPointQueryTest.java) and SloppyMath.haversinMeters. Lucene executes
these via BKD trees; on Spark the lat/lon columns are plain doubles and
Catalyst's parquet min-max pruning plays the BKD role (SURVEY §2.3
PointRangeQuery mapping) — the box is two BETWEENs pushed into the scan, the
distance query is a pushable bounding box plus an exact haversine verify.

All arithmetic is double-precision with a fixed formula shape so an external
SQL engine reproduces distances bit-comparably.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["EARTH_MEAN_RADIUS_M", "haversine_meters_col", "box_query",
           "distance_query", "polygon_query"]


def polygon_query(df: DataFrame, lat_col: str, lon_col: str,
                  vertices: list[tuple]) -> DataFrame:
    """LatLonShape / LatLonPoint.newPolygonQuery analog (o.a.l/geo/
    Polygon2D.java contains() — the even-odd crossing-number test; Lucene
    runs it under a BKD bounding-box prefilter).

    `vertices` = [(lat, lon), ...] of a simple (non-self-intersecting)
    polygon, closing edge implied. The plan: the polygon's bounding box as
    two pushable BETWEENs (parquet min-max pruning, the BKD role) AND an
    unrolled crossing-number expression — one CASE term per edge, all
    whole-stage codegen, no UDF. Boundary points follow raw double
    comparison semantics; pick vertices off the data grid for exactness."""
    lats = [float(a) for a, _ in vertices]
    lons = [float(b) for _, b in vertices]
    y, x = F.col(lat_col), F.col(lon_col)
    crossings = F.lit(0)
    n = len(vertices)
    for i in range(n):
        yi, xi = lats[i], lons[i]
        yj, xj = lats[(i + 1) % n], lons[(i + 1) % n]
        if yi == yj:
            continue  # horizontal edge never crosses a horizontal ray test
        straddles = (F.lit(yi) > y) != (F.lit(yj) > y)
        x_at_y = (F.lit(xj - xi) * (y - F.lit(yi)) / F.lit(yj - yi)
                  + F.lit(xi))
        crossings = crossings + F.when(straddles & (x < x_at_y),
                                       F.lit(1)).otherwise(F.lit(0))
    bbox = (y.between(min(lats), max(lats))
            & x.between(min(lons), max(lons)))
    return df.where(bbox & (crossings % 2 == 1))

# GeoUtils.EARTH_MEAN_RADIUS (meters) in the reference
EARTH_MEAN_RADIUS_M = 6371008.7714


def haversine_meters_col(lat_col, lon_col, center_lat: float,
                         center_lon: float):
    """Great-circle distance (meters) from each row to a fixed center."""
    lat1 = F.radians(F.lit(float(center_lat)))
    lon1 = F.radians(F.lit(float(center_lon)))
    lat2 = F.radians(F.col(lat_col))
    lon2 = F.radians(F.col(lon_col))
    h = (
        F.pow(F.sin((lat2 - lat1) / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin((lon2 - lon1) / 2), 2)
    )
    return F.lit(2.0 * EARTH_MEAN_RADIUS_M) * F.asin(F.sqrt(h))


def box_query(df: DataFrame, lat_col: str, lon_col: str,
              min_lat: float, max_lat: float,
              min_lon: float, max_lon: float) -> DataFrame:
    """LatLonPoint.newBoxQuery analog: inclusive bounding box. Both range
    predicates push into the parquet scan (row-group min-max pruning — the
    Catalyst 'BKD')."""
    return df.where(
        F.col(lat_col).between(float(min_lat), float(max_lat))
        & F.col(lon_col).between(float(min_lon), float(max_lon)))


def distance_query(df: DataFrame, lat_col: str, lon_col: str,
                   center_lat: float, center_lon: float,
                   radius_m: float, dist_col: str = "distance_m") -> DataFrame:
    """LatLonPoint.newDistanceQuery analog: docs within radius_m meters of the
    center, with the computed distance attached.

    Two-phase like the BKD implementation: a cheap pushable bounding-box
    prefilter (lat delta always sound; lon delta widened by cos(lat), skipped
    near the poles) then the exact haversine verify."""
    import math
    dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
    lat_lo, lat_hi = center_lat - dlat, center_lat + dlat
    pre = df.where(F.col(lat_col).between(lat_lo, lat_hi))
    cos_edge = min(math.cos(math.radians(min(abs(lat_lo), 90.0))),
                   math.cos(math.radians(min(abs(lat_hi), 90.0))))
    if cos_edge > 1e-3:
        dlon = math.degrees(radius_m / (EARTH_MEAN_RADIUS_M * cos_edge))
        lon_lo, lon_hi = center_lon - dlon, center_lon + dlon
        if lon_lo >= -180.0 and lon_hi <= 180.0:  # no antimeridian wrap
            pre = pre.where(F.col(lon_col).between(lon_lo, lon_hi))
    return (pre.withColumn(dist_col, haversine_meters_col(
                lat_col, lon_col, center_lat, center_lon))
            .where(F.col(dist_col) <= float(radius_m)))


def distance_facet_counts(df: DataFrame, lat_col: str, lon_col: str,
                          center_lat: float, center_lon: float,
                          ranges: list) -> DataFrame:
    """DistanceFacetsExample.java: DoubleRange facet counts over the computed
    haversine distance — the demo's getDistanceValueSource DoubleValuesSource
    is a Catalyst expression here, so the whole facet is one codegen'd pass
    of conditional sums (ranges may overlap, as DoubleRange allows).

    ranges: (label, min_m_incl, max_m_incl) triples in meters."""
    from .collectors import range_facet_counts
    d = df.withColumn("_dist_m", haversine_meters_col(
        lat_col, lon_col, center_lat, center_lon))
    return range_facet_counts(d, "_dist_m", ranges)
