"""AssociationsFacetsExample + DistanceFacetsExample analogs.

Reference behavior: demo AssociationsFacetsExample.java (TaxonomyFacetSum-
Int/FloatAssociations — per-category sums of per-doc association values) and
DistanceFacetsExample.java (DoubleRange facet counts over a computed
haversine distance DoubleValuesSource)."""

import math

from lucene_7_x_9_x_spark.operators.collectors import association_facet_sums
from lucene_7_x_9_x_spark.operators.geo import (
    distance_facet_counts, EARTH_MEAN_RADIUS_M)

import pytest


def test_association_facet_sums(spark):
    rows = [("a", 3, 0.5), ("a", 1, 1.25), ("b", 7, 0.75), ("b", 2, 0.0)]
    df = spark.createDataFrame(rows, "cat string, pop int, weight double")
    got = {r["cat"]: (r["sum_pop"], r["sum_weight"])
           for r in association_facet_sums(
               df, "cat", int_col="pop", float_col="weight").collect()}
    assert got == {"a": (4, 1.75), "b": (9, 0.75)}


def test_association_facet_single_channel(spark):
    df = spark.createDataFrame([("a", 3), ("a", 4)], "cat string, pop int")
    got = association_facet_sums(df, "cat", int_col="pop").collect()
    assert got[0]["sum_pop"] == 7
    with pytest.raises(ValueError):
        association_facet_sums(df, "cat")


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    h = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2)
         * math.sin((math.radians(lon2) - math.radians(lon1)) / 2) ** 2)
    return 2 * EARTH_MEAN_RADIUS_M * math.asin(math.sqrt(h))


def test_distance_facet_counts(spark):
    pts = [(0, 25.0, 10.0), (1, 26.0, 10.0), (2, 35.0, 10.0),
           (3, 60.0, 80.0), (4, -40.0, -150.0)]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    ranges = [("near", 0.0, 500_000.0),
              ("mid", 0.0, 5_000_000.0),          # overlaps "near"
              ("far", 5_000_000.0, 25_000_000.0)]
    got = {r["label"]: r["cnt"] for r in distance_facet_counts(
        df, "lat", "lon", 25.0, 10.0, ranges).collect()}
    dists = [_hav(lat, lon, 25.0, 10.0) for _, lat, lon in pts]
    want = {lbl: sum(1 for d in dists if lo <= d <= hi)
            for lbl, lo, hi in ranges}
    assert got == want
    # sanity on the fixture: every bucket non-trivial, overlap visible
    assert want["near"] >= 2 and want["mid"] > want["near"] and want["far"] >= 1
