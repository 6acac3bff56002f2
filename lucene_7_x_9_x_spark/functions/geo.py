"""Geo-point queries — the LatLonPoint role.

References (behavior, not code):
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/document/
    LatLonPoint.java (newBoxQuery:176, newDistanceQuery:241)
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/geo/
    GeoEncodingUtils.java:38-135 — 32-bit quantization: encode =
    floor(deg * 2^32/range) rounding toward -inf, ceil variant for
    box minima, decode = encoded * range/2^32.
  solr-8.4.0/lucene/core/src/java/org/apache/lucene/util/SloppyMath.java
    :87-95 — haversinSortKey h = (1-cos(dlat)) + cos(lat1)cos(lat2)
    (1-cos(dlon)); haversinMeters = R * 2 * asin(min(1, sqrt(h/2))).

Spark-first substitutions, deliberate and documented:
  - The BKD tree's role (pruning the point space before exact tests) is
    played by parquet row-group min/max stats: the box / bounding-box
    predicates below are plain range comparisons on the lat/lon columns,
    which Spark pushes into the scan (PushedFilters) — the same
    prune-then-refine shape as LatLonPointDistanceQuery's
    grid-relate-then-distance-check.
  - Trig uses the JVM's Math.cos/asin (via Spark SQL expressions), not
    SloppyMath's table-interpolated variants (error ~1e-15 either way;
    transcribing SloppyMath would be copying, not re-expression).

All expressions are JVM-side built-ins — no Python in any geo path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# GeoEncodingUtils.BITS = 32
LAT_SCALE = (1 << 32) / 180.0
LON_SCALE = (1 << 32) / 360.0
# SloppyMath.TO_METERS: mean earth radius in meters
EARTH_MEAN_RADIUS_M = 6_371_008.7714


def encode_lat(col):
    """GeoEncodingUtils.encodeLatitude: quantize toward -90."""
    return F.floor(col * F.lit(LAT_SCALE)).cast("long")


def encode_lon(col):
    """GeoEncodingUtils.encodeLongitude: quantize toward -180."""
    return F.floor(col * F.lit(LON_SCALE)).cast("long")


def decode_lat(col):
    return col * F.lit(1.0 / LAT_SCALE)


def decode_lon(col):
    return col * F.lit(1.0 / LON_SCALE)


def geo_box(df: DataFrame, lat_col: str, lon_col: str,
            min_lat: float, max_lat: float,
            min_lon: float, max_lon: float) -> DataFrame:
    """LatLonPoint.newBoxQuery: docs whose QUANTIZED point falls inside
    the box, with the reference's edge rounding — box minima round UP
    (encodeLatitudeCeil/encodeLongitudeCeil), maxima round DOWN, so a
    doc on a quantization boundary is matched exactly like the
    reference. Integer comparisons only: bit-exact under any engine.
    Dateline-crossing boxes (min_lon > max_lon) split into two ranges,
    the reference's two-leaf disjunction."""
    dlat = encode_lat(F.col(lat_col))
    dlon = encode_lon(F.col(lon_col))
    lat_pred = (dlat >= math.ceil(min_lat * LAT_SCALE)) & \
               (dlat <= math.floor(max_lat * LAT_SCALE))
    lo = math.ceil(min_lon * LON_SCALE)
    hi = math.floor(max_lon * LON_SCALE)
    if min_lon > max_lon:  # crosses the dateline
        lon_pred = (dlon >= lo) | (dlon <= hi)
    else:
        lon_pred = (dlon >= lo) & (dlon <= hi)
    # the raw-column range test is redundant with the quantized one but
    # is sargable: it reaches the parquet scan as PushedFilters (the BKD
    # prune), while the floor() comparisons above give exact reference
    # edge semantics. One quantization step of slack on each edge.
    slack_lat = 1.0 / LAT_SCALE
    slack_lon = 1.0 / LON_SCALE
    scan = (F.col(lat_col) >= min_lat - slack_lat) & \
           (F.col(lat_col) <= max_lat + slack_lat)
    if min_lon <= max_lon:
        scan = scan & (F.col(lon_col) >= min_lon - slack_lon) & \
            (F.col(lon_col) <= max_lon + slack_lon)
    return df.where(scan & lat_pred & lon_pred)


def _haversin_sort_key(lat_col, lon_col, clat: float, clon: float):
    """SloppyMath.haversinSortKey over the quantized point: monotone in
    distance, cheaper than the full asin/sqrt — the reference sorts and
    prunes on the sort key and converts to meters once per hit."""
    x1 = F.radians(lat_col)
    x2 = math.radians(clat)
    h1 = 1 - F.cos(x1 - F.lit(x2))
    h2 = 1 - F.cos(F.radians(lon_col - F.lit(clon)))
    return h1 + F.cos(x1) * F.lit(math.cos(x2)) * h2


def _sort_key_to_meters(key):
    return (F.lit(2 * EARTH_MEAN_RADIUS_M)
            * F.asin(F.least(F.lit(1.0), F.sqrt(key * 0.5))))


def _bounding_box(clat: float, clon: float, radius_m: float):
    """Rectangle.fromPointDistance role: the exact bounding box of the
    spherical cap — lat extent = angular radius, lon extent = the
    tangent-meridian deviation asin(sin c / cos lat0) — inflated by an
    explicit slack (1e-6 deg, far above quantization's 4e-8 deg and any
    libm ulp) so the prune PROVABLY contains every point whose quantized
    haversine distance is within the radius. It is only a prune; the
    refine is exact."""
    eps = 1e-6
    c = radius_m / EARTH_MEAN_RADIUS_M  # angular radius, radians
    lat_delta = math.degrees(c) + eps
    min_lat = max(-90.0, clat - lat_delta)
    max_lat = min(90.0, clat + lat_delta)
    if abs(clat) + lat_delta >= 90.0 - eps or c >= math.pi / 2:
        return min_lat, max_lat, -180.0, 180.0  # cap touches a pole
    lon_delta = math.degrees(
        math.asin(min(1.0, math.sin(c) / math.cos(math.radians(clat))))
    ) + eps
    if lon_delta >= 180.0:
        return min_lat, max_lat, -180.0, 180.0
    return min_lat, max_lat, clon - lon_delta, clon + lon_delta


def geo_distance(df: DataFrame, lat_col: str, lon_col: str,
                 center_lat: float, center_lon: float,
                 radius_m: float) -> DataFrame:
    """LatLonPoint.newDistanceQuery: docs within radius_m meters of the
    center (haversine over the quantized point). Plan shape: a sargable
    bounding-box range prune that reaches the parquet scan, then the
    exact haversine refine — prune-then-refine, the
    LatLonPointDistanceQuery shape."""
    mn_lat, mx_lat, mn_lon, mx_lon = _bounding_box(
        center_lat, center_lon, radius_m)
    scan = (F.col(lat_col) >= mn_lat) & (F.col(lat_col) <= mx_lat)
    if mn_lon >= -180.0 and mx_lon <= 180.0:
        scan = scan & (F.col(lon_col) >= mn_lon) & \
            (F.col(lon_col) <= mx_lon)
    qlat = decode_lat(encode_lat(F.col(lat_col)))
    qlon = decode_lon(encode_lon(F.col(lon_col)))
    key = _haversin_sort_key(qlat, qlon, center_lat, center_lon)
    dist = _sort_key_to_meters(key)
    return (df.where(scan)
            .withColumn("distance_m", dist)
            .where(F.col("distance_m") <= radius_m))


def geo_nearest(df: DataFrame, lat_col: str, lon_col: str,
                center_lat: float, center_lon: float, k: int,
                id_cols: list[str]) -> DataFrame:
    """Nearest-k by haversine (LatLonDocValuesField.newDistanceSort +
    LatLonPointPrototypeQueries.nearest role). Distributed top-k: each
    partition computes sort keys JVM-side, TakeOrderedAndProject keeps k,
    then a k-row rank window — never a global sort of the corpus. Ties
    break on the id columns ascending, the reference's docid tie."""
    qlat = decode_lat(encode_lat(F.col(lat_col)))
    qlon = decode_lon(encode_lon(F.col(lon_col)))
    key = _haversin_sort_key(qlat, qlon, center_lat, center_lon)
    order = [F.asc("_gkey")] + [F.asc(c) for c in id_cols]
    out = (df.withColumn("_gkey", key)
           .orderBy(*order).limit(k)
           .withColumn("distance_m", _sort_key_to_meters(F.col("_gkey"))))
    # k-row rank window under a non-foldable constant partition (the
    # repo-wide warning-free pattern)
    from pyspark.sql import Window
    w = (Window.partitionBy(F.xxhash64(id_cols[0]) % F.lit(1))
         .orderBy(*order))
    return (out.withColumn("rank", F.row_number().over(w))
            .select("rank", *id_cols, "distance_m"))


def polygon_crossing_sql(lat_expr: str, lon_expr: str,
                         vertices: list) -> str:
    """Even-odd crossing-parity point-in-polygon as ONE SQL boolean
    expression string (the Polygon2D.contains role —
    solr-8.4.0/lucene/core/src/java/org/apache/lucene/geo/Polygon2D.java
    evaluates an edge tree with orientation tests; for simple polygons
    the result is the standard crossing-number rule re-expressed here).

    The SAME string runs under Spark SQL (F.expr) and DuckDB: every
    vertex is inlined via repr so both engines parse identical doubles
    and evaluate identical IEEE operations — the decision is therefore
    bit-reproducible even where it is not exact (near-edge points).
    Boundary semantics: the reference counts on-edge points as inside;
    even-odd leaves them convention-dependent — a documented deviation
    only observable for points exactly on an edge.

    Horizontal edges are skipped at GENERATION time (they never change
    parity), which also removes the division-by-zero case entirely.
    """
    n = len(vertices)
    terms = []
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge: parity-neutral
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr}))"
            f" AND ({lon_expr} < ({x2!r} - {x1!r})"
            f" * ({lat_expr} - {y1!r}) / ({y2!r} - {y1!r}) + {x1!r})"
            f" THEN 1 ELSE 0 END)")
    if not terms:
        return "FALSE"
    return "(((" + " + ".join(terms) + ") % 2) = 1)"


def geo_polygon(df: DataFrame, lat_col: str, lon_col: str,
                vertices: list) -> DataFrame:
    """LatLonPoint.newPolygonQuery: docs inside the polygon.

    Prune-then-refine, the reference's BKD shape: a bounding-box range
    predicate (pushed to the parquet scan — the grid-relate prune) then
    the exact crossing-parity test as a JVM expression."""
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    prune = ((F.col(lat_col) >= min(lats)) & (F.col(lat_col) <= max(lats))
             & (F.col(lon_col) >= min(lons))
             & (F.col(lon_col) <= max(lons)))
    refine = F.expr(polygon_crossing_sql(lat_col, lon_col, vertices))
    return df.where(prune).where(refine)
