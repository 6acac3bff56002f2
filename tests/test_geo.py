"""LatLonPoint role: quantized box query, distance query, nearest-k.

Semantics verified against a pandas replica of the reference's
GeoEncodingUtils quantization (floor/ceil edge rounding) and
SloppyMath.haversinSortKey formula.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_7_x_9_x_spark.functions.geo import (EARTH_MEAN_RADIUS_M,
                                                LAT_SCALE, LON_SCALE,
                                                geo_box, geo_distance,
                                                geo_nearest)


def _pts(n=400, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "id": np.arange(n),
        "lat": rng.uniform(-89.0, 89.0, n),
        "lon": rng.uniform(-179.0, 179.0, n)})


def _key(lat, lon, clat, clon):
    x1, x2 = np.radians(lat), math.radians(clat)
    h1 = 1 - np.cos(x1 - x2)
    h2 = 1 - np.cos(np.radians(lon - clon))
    return h1 + np.cos(x1) * math.cos(x2) * h2


def _qlat(lat):
    return np.floor(lat * LAT_SCALE) / LAT_SCALE


def _qlon(lon):
    return np.floor(lon * LON_SCALE) / LON_SCALE


def test_box_quantized_edges(spark):
    pdf = _pts()
    df = spark.createDataFrame(pdf)
    box = (-30.0, 42.5, -100.0, 15.25)
    got = sorted(r["id"] for r in
                 geo_box(df, "lat", "lon", *box).select("id").collect())
    elat = np.floor(pdf.lat * LAT_SCALE)
    elon = np.floor(pdf.lon * LON_SCALE)
    want = pdf.id[(elat >= math.ceil(box[0] * LAT_SCALE))
                  & (elat <= math.floor(box[1] * LAT_SCALE))
                  & (elon >= math.ceil(box[2] * LON_SCALE))
                  & (elon <= math.floor(box[3] * LON_SCALE))]
    assert got == sorted(want.tolist())
    assert len(got) > 10


def test_box_point_on_quantization_boundary(spark):
    # a point exactly on a decoded grid line must match a box whose min
    # edge is that line (ceil rounding keeps it) — the reference's
    # encodeLatitudeCeil edge case
    g = 12345678 / LAT_SCALE  # exactly representable grid latitude
    pdf = pd.DataFrame({"id": [0], "lat": [g], "lon": [0.0]})
    df = spark.createDataFrame(pdf)
    assert geo_box(df, "lat", "lon", g, g + 1.0, -1.0, 1.0).count() == 1


def test_box_dateline_cross(spark):
    pdf = _pts()
    df = spark.createDataFrame(pdf)
    got = sorted(r["id"] for r in
                 geo_box(df, "lat", "lon", -90.0, 90.0, 170.0, -170.0)
                 .select("id").collect())
    elon = np.floor(pdf.lon * LON_SCALE)
    want = pdf.id[(elon >= math.ceil(170.0 * LON_SCALE))
                  | (elon <= math.floor(-170.0 * LON_SCALE))]
    assert got == sorted(want.tolist())


def test_distance_query_matches_reference_formula(spark):
    pdf = _pts()
    df = spark.createDataFrame(pdf)
    clat, clon, radius = 10.0, 20.0, 4_000_000.0
    got = sorted(r["id"] for r in
                 geo_distance(df, "lat", "lon", clat, clon, radius)
                 .select("id").collect())
    k = _key(_qlat(pdf.lat.values), _qlon(pdf.lon.values), clat, clon)
    dist = 2 * EARTH_MEAN_RADIUS_M * np.arcsin(
        np.minimum(1.0, np.sqrt(k * 0.5)))
    want = pdf.id[dist <= radius]
    assert got == sorted(want.tolist())
    assert 0 < len(got) < len(pdf)


def test_distance_bbox_is_only_a_prune(spark):
    # a polar center: the bounding box degenerates to all longitudes but
    # the haversine refine still bounds the result correctly
    pdf = _pts()
    df = spark.createDataFrame(pdf)
    got = geo_distance(df, "lat", "lon", 89.5, 0.0, 1_500_000.0) \
        .toPandas()
    assert (got.distance_m <= 1_500_000.0).all()
    k = _key(_qlat(pdf.lat.values), _qlon(pdf.lon.values), 89.5, 0.0)
    dist = 2 * EARTH_MEAN_RADIUS_M * np.arcsin(
        np.minimum(1.0, np.sqrt(k * 0.5)))
    assert sorted(got.id) == sorted(pdf.id[dist <= 1_500_000.0].tolist())


def test_nearest_k_rank_and_ties(spark):
    pdf = _pts()
    df = spark.createDataFrame(pdf)
    clat, clon = -33.0, 151.0
    got = geo_nearest(df, "lat", "lon", clat, clon, 15, ["id"]).toPandas()
    k = _key(_qlat(pdf.lat.values), _qlon(pdf.lon.values), clat, clon)
    want = pdf.assign(k=k).sort_values(["k", "id"]).head(15)
    assert got.id.tolist() == want.id.tolist()
    assert got["rank"].tolist() == list(range(1, 16))
    # distance_m is the meters conversion of the winning sort keys
    wd = 2 * EARTH_MEAN_RADIUS_M * np.arcsin(
        np.minimum(1.0, np.sqrt(want.k.values * 0.5)))
    assert np.allclose(got.distance_m.values, wd, rtol=1e-12)


def test_box_pushes_range_filters_to_scan(spark, tmp_path):
    # the BKD-prune role: the sargable range predicates must reach the
    # parquet scan as PushedFilters
    p = str(tmp_path / "geo.parquet")
    spark.createDataFrame(_pts()).write.parquet(p)
    df = spark.read.parquet(p)
    plan = (geo_box(df, "lat", "lon", -10.0, 10.0, -20.0, 20.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(lat" in plan and \
        "LessThanOrEqual(lat" in plan


def test_polygon_contains_matches_matplotlib_free_reference(spark):
    # crossing-parity vs a plain-python ray caster on a grid of points
    from lucene_7_x_9_x_spark.functions.geo import geo_polygon
    verts = [(0.0, -10.0), (10.0, 0.0), (0.0, 10.0), (-10.0, 0.0)]

    def py_inside(lat, lon):
        inside = False
        n = len(verts)
        for i in range(n):
            y1, x1 = verts[i]
            y2, x2 = verts[(i + 1) % n]
            if y1 == y2:
                continue
            if ((y1 > lat) != (y2 > lat)) and \
                    lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                inside = not inside
        return inside

    pts = [(i, lat / 2.0, lon / 2.0)
           for i, (lat, lon) in enumerate(
               (a, b) for a in range(-24, 25) for b in range(-24, 25))]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    got = {r.doc_id for r in
           geo_polygon(df, "lat", "lon", verts).collect()}
    want = {i for i, lat, lon in pts if py_inside(lat, lon)}
    assert got == want
    assert 0 < len(want) < len(pts)


def test_polygon_bbox_prune_reaches_scan(spark, tmp_path):
    from lucene_7_x_9_x_spark.functions.geo import geo_polygon
    df = spark.createDataFrame(
        [(i, float(i % 90), float(i % 180)) for i in range(100)],
        "doc_id long, lat double, lon double")
    df.write.parquet(str(tmp_path / "pts"))
    r = geo_polygon(spark.read.parquet(str(tmp_path / "pts")),
                    "lat", "lon", [(0.0, -10.0), (10.0, 0.0),
                                   (0.0, 10.0), (-10.0, 0.0)])
    plan = r._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(lat" in plan
