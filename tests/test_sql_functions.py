"""ST_* functions through the Spark SQL surface.

Queries and expected values mirror the reference's sqllogictest corpus
(``/root/reference/test/sql/geometry/*.test``, ``test/sql/geos/predicates.test``,
``test/sql/proj.test``).
"""

import math

import pytest


def one(spark, expr):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_point_roundtrip(spark):
    assert one(spark, "ST_AsText(ST_Point(1.0D, 2.0D))") == "POINT (1 2)"
    assert one(spark, "ST_X(ST_Point(1.5D, 2.0D))") == 1.5
    assert one(spark, "ST_Y(ST_Point(1.5D, 2.25D))") == 2.25


def test_wkt_parse_area(spark):
    # st_area.test semantics: unit square 1.0; hole subtracted
    assert one(spark, "ST_Area(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == 1.0
    v = one(
        spark,
        "ST_Area(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), "
        "(0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))'))",
    )
    assert abs(v - 0.64) < 1e-12
    assert one(spark, "ST_Area(ST_GeomFromText('POINT (1 1)'))") == 0.0
    assert one(spark, "ST_Area(ST_GeomFromText('LINESTRING (0 0, 1 1)'))") == 0.0


def test_predicates_sql(spark):
    assert one(
        spark,
        "ST_Within(ST_Point(0.5D, 0.5D), ST_MakeEnvelope(0.0D, 0.0D, 1.0D, 1.0D))",
    )
    assert not one(
        spark,
        "ST_Within(ST_Point(5.0D, 5.0D), ST_MakeEnvelope(0.0D, 0.0D, 1.0D, 1.0D))",
    )
    assert one(
        spark,
        "ST_Intersects(ST_GeomFromText('LINESTRING (0 0, 2 2)'), "
        "ST_GeomFromText('LINESTRING (0 2, 2 0)'))",
    )
    assert one(
        spark,
        "ST_Touches(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'), "
        "ST_GeomFromText('POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))'))",
    )


def test_accessors_sql(spark):
    assert one(spark, "ST_NPoints(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)'))") == 3
    assert (
        one(spark, "ST_AsText(ST_PointN(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)'), -1))")
        == "POINT (2 2)"
    )
    assert one(spark, "ST_GeometryType(ST_GeomFromText('MULTIPOINT (0 0, 1 1)'))") == "MULTIPOINT"
    assert one(spark, "ST_HasZ(ST_GeomFromText('POINT Z (1 2 3)'))") is True
    assert one(spark, "ST_ZMFlag(ST_GeomFromText('POINT ZM (1 2 3 4)'))") == 3
    assert one(spark, "ST_NumInteriorRings(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))") == 0
    ext = one(spark, "ST_Extent(ST_GeomFromText('LINESTRING (0 1, 2 3)'))")
    assert (ext.min_x, ext.min_y, ext.max_x, ext.max_y) == (0.0, 1.0, 2.0, 3.0)


def test_constructive_sql(spark):
    v = one(spark, "ST_Area(ST_Buffer(ST_Point(0.0D, 0.0D), 1.0D))")
    assert abs(v - math.pi) < 0.03
    assert (
        one(spark, "ST_AsText(ST_Centroid(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')))")
        == "POINT (1 1)"
    )
    assert one(spark, "ST_AsText(ST_Envelope(ST_GeomFromText('LINESTRING (0 0, 2 3)')))") == (
        "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))"
    )
    inter = one(
        spark,
        "ST_Area(ST_Intersection(ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'), "
        "ST_GeomFromText('POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))')))",
    )
    assert abs(inter - 1.0) < 1e-12


def test_geojson_hex_sql(spark):
    gj = one(spark, "ST_AsGeoJSON(ST_Point(1.0D, 2.0D))")
    assert gj == '{"type":"Point","coordinates":[1.0,2.0]}'
    assert one(spark, "ST_AsText(ST_GeomFromGeoJSON('{\"type\":\"Point\",\"coordinates\":[3,4]}'))") == "POINT (3 4)"
    hexwkb = one(spark, "ST_AsHEXWKB(ST_Point(0.0D, 0.0D))")
    assert one(spark, f"ST_AsText(ST_GeomFromHEXWKB('{hexwkb}'))") == "POINT (0 0)"


def test_transform_golden(spark):
    """proj.test:10-14 golden answer: EPSG:4326 (lat,lon) -> EPSG:3857."""
    x = one(
        spark,
        "ST_X(ST_Transform(ST_Point(52.3676D, 4.9041D), 'EPSG:4326', 'EPSG:3857', false))",
    )
    y = one(
        spark,
        "ST_Y(ST_Transform(ST_Point(52.3676D, 4.9041D), 'EPSG:4326', 'EPSG:3857', false))",
    )
    assert abs(x - 545921.9147992929) < 1e-6
    assert abs(y - 6866867.121983132) < 1e-6
    # always_xy: input (lon, lat)
    x2 = one(
        spark,
        "ST_X(ST_Transform(ST_Point(4.9041D, 52.3676D), 'EPSG:4326', 'EPSG:3857', true))",
    )
    assert abs(x2 - 545921.9147992929) < 1e-6
    # roundtrip back
    lat = one(
        spark,
        "ST_X(ST_Transform(ST_Transform(ST_Point(52.3676D, 4.9041D), 'EPSG:4326', 'EPSG:3857', false),"
        " 'EPSG:3857', 'EPSG:4326', false))",
    )
    assert abs(lat - 52.3676) < 1e-9


def test_transform_utm(spark):
    # Amsterdam lon/lat -> UTM 31N; easting ~629144, northing ~5803996 (PROJ values)
    x = one(
        spark,
        "ST_X(ST_Transform(ST_Point(4.9041D, 52.3676D), 'OGC:CRS84', 'EPSG:32631', true))",
    )
    y = one(
        spark,
        "ST_Y(ST_Transform(ST_Point(4.9041D, 52.3676D), 'OGC:CRS84', 'EPSG:32631', true))",
    )
    # cross-checked against an independent Snyder-series TM implementation
    assert abs(x - 629638.04) < 0.5
    assert abs(y - 5803631.23) < 0.5


def test_sphere_spheroid(spark):
    # Paris -> Amsterdam haversine ~ 430 km. The sphere/spheroid surface
    # uses the reference's [lat, lon] axis order: x = latitude
    # (st_distance_sphere.cpp doc, st_distance_spheroid.cpp:30).
    d = one(
        spark,
        "ST_Distance_Sphere(ST_Point(48.8566D, 2.3522D), ST_Point(52.3676D, 4.9041D))",
    )
    assert abs(d - 430_000) < 5_000
    dv = one(
        spark,
        "ST_Distance_Spheroid(ST_Point(48.8566D, 2.3522D), ST_Point(52.3676D, 4.9041D))",
    )
    assert abs(dv - d) < 2_000  # spheroid within 0.5% of sphere here
    # the reference's own case: JFK -> AMS, [lat, lon] points
    # (test/sql/geometry/st_distance_sphere.test). Its pinned "5847000" is
    # hand-rounded to km and inconsistent with its own R=6371000 formula
    # (st_distance_sphere.cpp:20-35 evaluates to 5847934.55); we pin the
    # code-exact value.
    jfk = one(
        spark,
        "ST_Distance_Sphere(ST_Point(40.639722D, -73.778889D), ST_Point(52.3D, 4.765D))",
    )
    assert abs(jfk - 5847934.55) < 0.01
    # the reference's own st_area_spheroid.test belem box ([lat, lon] ring):
    # pinned 73991730 m^2 (GeographicLib); our Karney-decomposition kernel
    # agrees to ~1e-8 relative
    belem = one(
        spark,
        "ST_Area_Spheroid(ST_GeomFromText('POLYGON ((-1.475781 -48.516655,"
        " -1.475781 -48.433228, -1.403706 -48.433228, -1.403706 -48.516655,"
        " -1.475781 -48.516655))'))",
    )
    assert abs(belem - 73991730) < 5
    # 1x1 degree box at equator ~ 12,300 km^2 ellipsoidal
    a = one(
        spark,
        "ST_Area_Spheroid(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))'))",
    )
    assert abs(a - 12_308_778_361) / 12_308_778_361 < 0.002


def test_hilbert_quadkey(spark):
    # hilbert: distinct points -> distinct indexes; locality sanity
    d0 = one(spark, "ST_Hilbert(0.0D, 0.0D, 0.0D, 0.0D, 100.0D, 100.0D)")
    d1 = one(spark, "ST_Hilbert(1.0D, 1.0D, 0.0D, 0.0D, 100.0D, 100.0D)")
    d2 = one(spark, "ST_Hilbert(99.0D, 99.0D, 0.0D, 0.0D, 100.0D, 100.0D)")
    assert d0 != d2 and abs(d1 - d0) < abs(d2 - d0)
    qk = one(spark, "ST_QuadKey(11.08D, 46.0D, 6)")
    assert len(qk) == 6 and set(qk) <= set("0123")


def test_dump_collect_sql(spark):
    rows = spark.sql(
        "SELECT explode(ST_Dump(ST_GeomFromText('MULTIPOINT (0 0, 1 1)'))) AS d"
    ).select("d.path").collect()
    assert [r.path for r in rows] == [[1], [2]]
    wkt = one(
        spark,
        "ST_AsText(ST_Collect(array(ST_Point(0.0D, 0.0D), ST_Point(1.0D, 1.0D))))",
    )
    assert wkt == "MULTIPOINT (0 0, 1 1)"


def test_null_propagation(spark):
    assert one(spark, "ST_Area(NULL)") is None
    assert one(spark, "ST_AsText(NULL)") is None
    assert one(spark, "ST_Intersects(NULL, ST_Point(0.0D, 0.0D))") is None


def test_transform_conics(spark):
    """Conic CRS (EPSG:5070 Albers, 2154/3347 LCC): origin invariants +
    roundtrip through the SQL surface."""
    def xy(expr):
        r = spark.sql(f"SELECT ST_X({expr}) AS x, ST_Y({expr}) AS y").collect()[0]
        return r.x, r.y

    x, y = xy("ST_Transform(ST_Point(3.0D, 46.5D), 'OGC:CRS84', 'EPSG:2154', true)")
    assert abs(x - 700000) < 1e-6 and abs(y - 6600000) < 1e-6
    x, y = xy("ST_Transform(ST_Point(-96.0D, 23.0D), 'OGC:CRS84', 'EPSG:5070', true)")
    assert abs(x) < 1e-6 and abs(y) < 1e-6
    lon, lat = xy(
        "ST_Transform(ST_Transform(ST_Point(2.3522D, 48.8566D), 'OGC:CRS84', 'EPSG:2154', true),"
        " 'EPSG:2154', 'OGC:CRS84', true)"
    )
    assert abs(lon - 2.3522) < 1e-9 and abs(lat - 48.8566) < 1e-9


def test_misc_function_surface(spark):
    """Known-answer sweep over the less-exercised SQL functions."""
    assert one(spark, "ST_AsText(ST_Boundary(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')))") == \
        "LINESTRING (0 0, 1 0, 1 1, 0 1, 0 0)"
    assert one(spark, "ST_AsText(ST_Reverse(ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)')))") == \
        "LINESTRING (2 2, 1 1, 0 0)"
    assert one(spark, "ST_AsText(ST_Force3DZ(ST_GeomFromText('POINT (1 2)'), 7.0D))") == "POINT Z (1 2 7)"
    assert one(spark, "ST_AsText(ST_Force2D(ST_GeomFromText('POINT ZM (1 2 3 4)')))") == "POINT (1 2)"
    assert one(spark, "ST_NPoints(ST_Simplify(ST_GeomFromText('LINESTRING (0 0, 1 0.01, 2 0)'), 0.5D))") == 2
    assert one(spark, "ST_AsText(ST_ReducePrecision(ST_GeomFromText('POINT (1.2345 5.6789)'), 0.01D))") == \
        "POINT (1.23 5.68)"
    assert one(spark, "ST_AsText(ST_ShortestLine(ST_Point(0.0D, 3.0D), ST_GeomFromText('LINESTRING (0 0, 5 0)')))") == \
        "LINESTRING (0 3, 0 0)"
    assert one(spark, "ST_IsSimple(ST_GeomFromText('LINESTRING (0 0, 1 1)'))") is True
    assert one(spark, "ST_IsRing(ST_GeomFromText('LINESTRING (0 0, 1 0, 1 1, 0 0)'))") is True
    assert one(spark, "ST_Dimension(ST_GeomFromText('GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1))'))") == 1
    assert one(spark, "ST_AsText(ST_FlipCoordinates(ST_GeomFromText('LINESTRING (1 2, 3 4)')))") == \
        "LINESTRING (2 1, 4 3)"
    assert one(spark, "ST_AsText(ST_Multi(ST_GeomFromText('POINT (1 1)')))") == "MULTIPOINT (1 1)"
    assert one(spark, "ST_NumGeometries(ST_GeomFromText('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2)))'))") == 2
    assert one(spark, "ST_AsText(ST_ExteriorRing(ST_GeomFromText('POLYGON ((0 0, 1 0, 1 1, 0 0), (0.1 0.1, 0.2 0.1, 0.2 0.2, 0.1 0.1))')))") == \
        "LINESTRING (0 0, 1 0, 1 1, 0 0)"
    assert one(spark, "ST_AsText(ST_StartPoint(ST_GeomFromText('LINESTRING (5 5, 6 6)')))") == "POINT (5 5)"
    assert one(spark, "ST_AsText(ST_EndPoint(ST_GeomFromText('LINESTRING (5 5, 6 6)')))") == "POINT (6 6)"
    assert one(spark, "ST_Intersects_Extent(ST_GeomFromText('POINT (1 1)'), ST_GeomFromText('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))'))") is True
    # JTS/GEOS normalize convention: shells CW, starting at the min vertex
    assert one(spark, "ST_AsText(ST_Normalize(ST_GeomFromText('POLYGON ((1 1, 0 1, 0 0, 1 0, 1 1))')))") == \
        "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
    assert one(spark, "ST_AsText(ST_Points(ST_GeomFromText('LINESTRING (0 0, 1 1)')))") == "MULTIPOINT (0 0, 1 1)"
    assert one(spark, "ST_AsText(ST_PointOnSurface(ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))')))") == \
        "POINT (2 2)"
    assert one(spark, "ST_NumInteriorRings(ST_GeomFromText('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))'))") == 1
    svg = one(spark, "ST_AsSVG(ST_Point(5.0D, 7.0D), false, 0)")
    assert svg == 'cx="5" cy="-7"'
    assert one(spark, "ST_ZMFlag(ST_GeomFromText('POINT M (1 2 3)'))") == 1
    assert one(spark, "ST_HasM(ST_GeomFromText('POINT M (1 2 3)'))") is True
    assert one(spark, "round(ST_M(ST_GeomFromText('POINT M (1 2 3)')), 1)") == 3.0
    assert one(spark, "round(ST_ZMax(ST_GeomFromText('LINESTRING Z (0 0 1, 1 1 5)')), 1)") == 5.0
    assert one(spark, "ST_AsText(ST_RemoveRepeatedPoints(ST_GeomFromText('LINESTRING (0 0, 0 0, 1 1, 1 1, 2 2)')))") == \
        "LINESTRING (0 0, 1 1, 2 2)"
    assert one(spark, "ST_IsEmpty(ST_GeomFromText('POLYGON EMPTY'))") is True


def test_transform_polar_and_mercator():
    """Pinned EPSG Guidance Note 7-2 worked example (Polar Stereographic
    variant A / UPS North) + roundtrips across the polar family and
    ellipsoidal World Mercator."""
    import numpy as np

    from duckdb_spatial_spark.functions.crs import transform_xy

    x, y = transform_xy([44.0], [73.0], "EPSG:4326", "EPSG:32661", always_xy=True)
    assert abs(x[0] - 3320416.75) < 0.5 and abs(y[0] - 632668.43) < 0.5

    rng = np.random.default_rng(7)
    for crs, latrange in [
        ("EPSG:32661", (60, 89.5)), ("EPSG:32761", (-89.5, -60)),
        ("EPSG:3413", (60, 89.5)), ("EPSG:3995", (60, 89.5)),
        ("EPSG:3031", (-89.5, -60)), ("EPSG:3976", (-89.5, -60)),
        ("EPSG:3395", (-80, 80)),
    ]:
        lons = rng.uniform(-179, 179, 100)
        lats = rng.uniform(*latrange, 100)
        px, py = transform_xy(lons, lats, "EPSG:4326", crs, always_xy=True)
        lon2, lat2 = transform_xy(px, py, crs, "EPSG:4326", always_xy=True)
        assert max(np.abs(lon2 - lons).max(), np.abs(lat2 - lats).max()) < 1e-9, crs

    # 32662 (plate carree, not UTM/UPS) still raises cleanly
    import pytest

    with pytest.raises(ValueError):
        transform_xy([0.0], [0.0], "EPSG:4326", "EPSG:32662", always_xy=True)


def test_transform_proj4_long_tail():
    """proj4-string front-end: pinned worked examples for EPSG:27700 and
    EPSG:2056 plus datum-shift roundtrips (reference embeds full PROJ,
    proj/functions.cpp:487-508; ours covers the long tail via proj4 defs)."""
    import numpy as np

    from duckdb_spatial_spark.functions.crs import transform_xy

    # OS 'A guide to coordinate systems in Great Britain' worked example:
    # OSGB36 geodetic 52d39'27.2531"N 1d43'4.5177"E -> E 651409.903 N 313177.270
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = transform_xy([lon], [lat], "EPSG:4277", "EPSG:27700", always_xy=True)
    assert abs(e[0] - 651409.903) < 0.002 and abs(n[0] - 313177.270) < 0.002

    # WGS84 -> BNG: the WGS84 graticule sits ~100 m east of OSGB36's near
    # Greenwich (the transit-circle offset), so lon -2 must land east of
    # the 400000 false-easting meridian after the Helmert step
    e, n = transform_xy([-2.0], [54.0], "OGC:CRS84", "EPSG:27700", always_xy=True)
    assert 400080 < e[0] < 400120
    lon2, lat2 = transform_xy(e, n, "EPSG:27700", "OGC:CRS84", always_xy=True)
    assert abs(lon2[0] + 2.0) < 1e-7 and abs(lat2[0] - 54.0) < 1e-7

    # Swiss LV95: the projection center is the false origin by definition
    e, n = transform_xy(
        [7.439583333333333], [46.95240555555556], "EPSG:4326", "EPSG:2056", always_xy=True
    )
    # WGS84 center differs from CH1903+ center by the datum shift (~130 m)
    assert abs(e[0] - 2600000) < 250 and abs(n[0] - 1200000) < 250
    rng = np.random.default_rng(11)
    lons = rng.uniform(6.0, 10.0, 50)
    lats = rng.uniform(46.0, 47.5, 50)
    px, py = transform_xy(lons, lats, "EPSG:4326", "EPSG:2056", always_xy=True)
    lon3, lat3 = transform_xy(px, py, "EPSG:2056", "EPSG:4326", always_xy=True)
    assert max(np.abs(lon3 - lons).max(), np.abs(lat3 - lats).max()) < 1e-7

    # raw proj4 string == registry entry
    bng = ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 "
           "+ellps=airy +towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 +units=m")
    e2, n2 = transform_xy([-2.0], [54.0], "OGC:CRS84", bng, always_xy=True)
    e3, n3 = transform_xy([-2.0], [54.0], "OGC:CRS84", "EPSG:27700", always_xy=True)
    assert abs(e2[0] - e3[0]) < 1e-9 and abs(n2[0] - n3[0]) < 1e-9

    # ETRS89/UTM32 (GRS80) ~= WGS84/UTM32 to sub-mm
    x1, y1 = transform_xy([9.1], [48.7], "OGC:CRS84", "EPSG:25832", always_xy=True)
    x2, y2 = transform_xy([9.1], [48.7], "OGC:CRS84", "EPSG:32632", always_xy=True)
    assert abs(x1[0] - x2[0]) < 1e-3 and abs(y1[0] - y2[0]) < 1e-3

    # us-ft units: state-plane easting/northing are the meter values / 0.3048006...
    ftUS = 1200.0 / 3937.0
    m_def = ("+proj=lcc +lat_1=35.46666666666667 +lat_2=34.03333333333333 +lat_0=33.5 "
             "+lon_0=-118 +x_0=2000000.0001016 +y_0=500000.0001016002 +ellps=GRS80 +units=m")
    xf, yf = transform_xy([-118.2437], [34.0522], "OGC:CRS84", "EPSG:2229", always_xy=True)
    xm, ym = transform_xy([-118.2437], [34.0522], "OGC:CRS84", m_def, always_xy=True)
    # identical lcc, different unit: ftUS output * ftUS-in-meters == meters
    assert abs(xf[0] * ftUS - xm[0]) < 1e-6 and abs(yf[0] * ftUS - ym[0]) < 1e-6
    lonb, latb = transform_xy(xf, yf, "EPSG:2229", "OGC:CRS84", always_xy=True)
    assert abs(lonb[0] + 118.2437) < 1e-7 and abs(latb[0] - 34.0522) < 1e-7


def test_transform_sterea_laea():
    """Oblique stereographic (EPSG 9809) and Lambert azimuthal equal-area
    (EPSG 9820): pinned against the EPSG Guidance Note 7-2 worked examples
    (reference embeds full PROJ, proj/functions.cpp:487-508; the Dutch RD
    New CRS is what the reference's own amsterdam_roads fixtures use)."""
    import numpy as np

    from duckdb_spatial_spark.functions.crs import transform_xy

    # GN7-2 9809 example (Amersfoort / RD New, projection only): the
    # published vector is Bessel geodetic 53N 6E -> E 196105.283 N 557057.739
    bessel = "+proj=longlat +ellps=bessel"
    rd_raw = ("+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
              "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel")
    e, n = transform_xy([6.0], [53.0], bessel, rd_raw, always_xy=True)
    assert abs(e[0] - 196105.283) < 0.002 and abs(n[0] - 557057.739) < 0.002
    # projection origin -> false origin by construction
    e, n = transform_xy([5.38763888888889], [52.15616055555555], bessel, rd_raw, always_xy=True)
    assert abs(e[0] - 155000.0) < 1e-6 and abs(n[0] - 463000.0) < 1e-6
    # registry EPSG:28992 carries towgs84: the RD origin's published
    # ETRS89 position (RDNAPTRANS) reproduces to the 7-param accuracy
    lo, la = transform_xy([155000.0], [463000.0], "EPSG:28992", "EPSG:4326", always_xy=True)
    assert abs(lo[0] - 5.38720621) < 1e-5 and abs(la[0] - 52.15517440) < 1e-5

    # GN7-2 9820 example (ETRS89-LAEA / EPSG:3035): 50N 5E
    e, n = transform_xy([5.0], [50.0], "EPSG:4258", "EPSG:3035", always_xy=True)
    assert abs(e[0] - 3962799.45) < 0.01 and abs(n[0] - 2999718.85) < 0.01
    # equal-area sanity: the qP cap normalizes the pole into range
    e, n = transform_xy([10.0], [52.0], "EPSG:4258", "EPSG:3035", always_xy=True)
    assert abs(e[0] - 4321000.0) < 1e-6 and abs(n[0] - 3210000.0) < 1e-6

    # roundtrip sweeps, both families, incl. far-from-center points
    rng = np.random.default_rng(5)
    lons = rng.uniform(-10.0, 30.0, 200)
    lats = rng.uniform(35.0, 70.0, 200)
    for crs in ("EPSG:28992", "EPSG:3035"):
        x, y = transform_xy(lons, lats, "EPSG:4326", crs, always_xy=True)
        lo, la = transform_xy(x, y, crs, "EPSG:4326", always_xy=True)
        assert max(np.abs(lo - lons).max(), np.abs(la - lats).max()) < 1e-6, crs


def test_transform_cass_omerc():
    """Cassini-Soldner (EPSG 9806) and Hotine oblique Mercator (EPSG 9812
    variant A / 9815 variant B), pinned against the EPSG GN7-2 worked
    examples (Trinidad Grid and Timbalai RSO Borneo)."""
    import numpy as np

    from duckdb_spatial_spark.functions.crs import transform_xy

    # GN7-2 9806: Trinidad 1903 geodetic 10N 62W -> E 66644.94 N 82536.22
    # Clarke's LINKS (projection-only: same ellipsoid both sides, no
    # datum leg; the registry EPSG:30200 adds towgs84 for the WGS84 path)
    trin = "+proj=longlat +a=6378293.645452597 +b=6356617.987679838"
    grid = ("+proj=cass +lat_0=10.441666666666666 +lon_0=-61.33333333333334 "
            "+x_0=86501.46392052 +y_0=65379.0134283 "
            "+a=6378293.645452597 +b=6356617.987679838 "
            "+to_meter=0.201166195164")
    e, n = transform_xy([-62.0], [10.0], trin, grid, always_xy=True)
    assert abs(e[0] - 66644.94) < 0.02 and abs(n[0] - 82536.22) < 0.02
    lo, la = transform_xy(e, n, grid, trin, always_xy=True)
    assert abs(lo[0] + 62.0) < 1e-8 and abs(la[0] - 10.0) < 1e-8

    # GN7-2 9815 variant B: Timbalai 1948 geodetic -> RSO Borneo (m)
    ev = "+proj=longlat +ellps=evrstSS"
    rso = ("+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
           "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 "
           "+y_0=442857.65 +ellps=evrstSS")
    lat_t = 5 + 23 / 60 + 14.1129 / 3600
    lon_t = 115 + 48 / 60 + 19.8196 / 3600
    e, n = transform_xy([lon_t], [lat_t], ev, rso, always_xy=True)
    assert abs(e[0] - 679245.73) < 0.01 and abs(n[0] - 596562.78) < 0.01

    # variant A (+no_uoff) differs from B by exactly the u_c offset
    # rotated by gamma; roundtrip must still invert
    rso_a = rso + " +no_uoff"
    ea, na = transform_xy([lon_t], [lat_t], ev, rso_a, always_xy=True)
    assert abs(ea[0] - e[0]) > 1000  # the offset is real
    lo, la = transform_xy(ea, na, rso_a, ev, always_xy=True)
    assert abs(lo[0] - lon_t) < 1e-9 and abs(la[0] - lat_t) < 1e-9

    # registry roundtrips through WGS84 (datum legs included)
    rng = np.random.default_rng(17)
    for crs, lo_rng, la_rng in (
        ("EPSG:29873", (113.0, 119.0), (0.5, 8.0)),
        ("EPSG:30200", (-62.5, -60.5), (9.8, 11.4)),
    ):
        lons = rng.uniform(*lo_rng, 100)
        lats = rng.uniform(*la_rng, 100)
        x, y = transform_xy(lons, lats, "EPSG:4326", crs, always_xy=True)
        lo, la = transform_xy(x, y, crs, "EPSG:4326", always_xy=True)
        assert max(np.abs(lo - lons).max(), np.abs(la - lats).max()) < 1e-6, crs


def test_transform_krovak():
    """Krovak oblique conformal conic (EPSG 9819; S-JTSK / EPSG 5514),
    pinned against the EPSG GN7-2 worked example (the published example
    carries ~1 cm of its own intermediate rounding)."""
    import numpy as np

    from duckdb_spatial_spark.functions.crs import transform_xy

    bessel = "+proj=longlat +ellps=bessel"
    kro = ("+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
           "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel")
    lat_t = 50 + 12 / 60 + 32.4416 / 3600
    lon_t = 16 + 50 / 60 + 59.1790 / 3600
    x, y = transform_xy([lon_t], [lat_t], bessel, kro, always_xy=True)
    # GN7-2: Southing 1050538.63, Westing 568991.00 -> east/north negative
    assert abs(x[0] + 568991.00) < 0.02 and abs(y[0] + 1050538.63) < 0.02
    lo, la = transform_xy(x, y, kro, bessel, always_xy=True)
    assert abs(lo[0] - lon_t) < 1e-9 and abs(la[0] - lat_t) < 1e-9

    # registry EPSG:5514 with the datum leg: Czech territory roundtrips
    rng = np.random.default_rng(23)
    lons = rng.uniform(12.0, 23.0, 100)
    lats = rng.uniform(47.5, 51.5, 100)
    px, py = transform_xy(lons, lats, "EPSG:4326", "EPSG:5514", always_xy=True)
    assert (px < 0).all() and (py < 0).all()  # Krovak East North negatives
    lo, la = transform_xy(px, py, "EPSG:5514", "EPSG:4326", always_xy=True)
    assert max(np.abs(lo - lons).max(), np.abs(la - lats).max()) < 1e-6


def test_transform_nzmg():
    """New Zealand Map Grid (EPSG 9811; NZGD49 / EPSG 27200) — the Reilly
    complex-series conformal projection, pinned against the published
    projection example (the series as implemented reproduces it to <5 cm,
    within NZMG's own fitting tolerance)."""
    import numpy as np

    from duckdb_spatial_spark.functions.crs import transform_xy

    intl = "+proj=longlat +ellps=intl"
    nzmg = "+proj=nzmg +lat_0=-41 +lon_0=173 +x_0=2510000 +y_0=6023150 +ellps=intl"
    x, y = transform_xy([172.739194], [-34.444066], intl, nzmg, always_xy=True)
    assert abs(x[0] - 2487100.638) < 0.05 and abs(y[0] - 6751049.719) < 0.05
    lo, la = transform_xy(x, y, nzmg, intl, always_xy=True)
    assert abs(lo[0] - 172.739194) < 1e-9 and abs(la[0] + 34.444066) < 1e-9

    # registry EPSG:27200 with the 7-param datum leg: NZ territory roundtrips
    rng = np.random.default_rng(27)
    lons = rng.uniform(166.5, 178.5, 100)
    lats = rng.uniform(-47.0, -34.5, 100)
    px, py = transform_xy(lons, lats, "EPSG:4326", "EPSG:27200", always_xy=True)
    assert ((px > 1.9e6) & (px < 3.1e6)).all() and ((py > 5.3e6) & (py < 6.8e6)).all()
    lo, la = transform_xy(px, py, "EPSG:27200", "EPSG:4326", always_xy=True)
    assert max(np.abs(lo - lons).max(), np.abs(la - lats).max()) < 1e-6


def test_transform_laea_sphere():
    """US National Atlas Equal Area (EPSG 9311/2163) — LAEA on the Clarke
    1866 authalic sphere. Pins the origin identity, exact roundtrips, and
    the equal-area property itself (local Jacobian == R^2 cos(lat))."""
    import numpy as np

    from duckdb_spatial_spark.functions.crs import transform_xy

    sph = "+proj=longlat +a=6370997 +b=6370997"
    x, y = transform_xy([-100.0], [45.0], sph, "EPSG:9311", always_xy=True)
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    rng = np.random.default_rng(31)
    lons = rng.uniform(-130.0, -60.0, 200)
    lats = rng.uniform(20.0, 55.0, 200)
    px, py = transform_xy(lons, lats, sph, "EPSG:9311", always_xy=True)
    lo, la = transform_xy(px, py, "EPSG:9311", sph, always_xy=True)
    assert max(np.abs(lo - lons).max(), np.abs(la - lats).max()) < 1e-9
    # equal-area: numeric Jacobian determinant d(x,y)/d(lon_r,lat_r)
    # equals R^2 cos(lat) everywhere
    R = 6370997.0
    h = 1e-6
    for lon, lat in [(-100.0, 45.0), (-75.0, 40.0), (-120.0, 33.0)]:
        x0, y0 = transform_xy([lon - h, lon + h, lon, lon],
                              [lat, lat, lat - h, lat + h],
                              sph, "EPSG:9311", always_xy=True)
        dxdl = (x0[1] - x0[0]) / (2 * np.radians(h))
        dydl = (y0[1] - y0[0]) / (2 * np.radians(h))
        dxdp = (x0[3] - x0[2]) / (2 * np.radians(h))
        dydp = (y0[3] - y0[2]) / (2 * np.radians(h))
        det = abs(dxdl * dydp - dxdp * dydl)
        want = R * R * np.cos(np.radians(lat))
        assert abs(det / want - 1.0) < 1e-5, (lon, lat)
