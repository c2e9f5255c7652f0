"""Parity cases ported from the reference's sqllogictest corpus.

Sources: /root/reference/test/sql/geos/predicates.test (itself derived from
libgeos coversTest), test/sql/geometry/st_dump.test, st_pointn.test,
st_area.test — expected values are the reference's pinned outputs.
"""

from duckdb_spatial_spark.geo import algorithms as A, from_wkt, to_wkt


def test_covers_corpus():
    # predicates.test case 1: boundaries touch, still covers
    a = from_wkt("POLYGON ((0 0, 0 100, 100 100, 100 0, 0 0))")
    b = from_wkt("POLYGON ((0 0, 0 100, 90 90, 90 0, 0 0))")
    assert A.covers(a, b) and A.covered_by(b, a)

    # case 2: polygon covers boundary line but does not contain it
    line = from_wkt("LINESTRING (0 0, 0 100)")
    assert A.covers(a, line) and A.covered_by(line, a) and not A.contains(a, line)

    # case 3: line covers endpoint (no contain) and interior point (contain)
    p_end = from_wkt("POINT (0 0)")
    p_int = from_wkt("POINT (0 2)")
    assert A.covers(line, p_end) and not A.contains(line, p_end)
    assert A.covers(line, p_int) and A.contains(line, p_int)

    # case 4 (geos ticket 580): concave real-world parcel contains the point
    parcel = from_wkt(
        "POLYGON ((-1.183864 52.951915, -1.183862 52.951903, -1.18389 52.9519, "
        "-1.183924 52.951897, -1.183958 52.951894, -1.183954 52.95188, "
        "-1.183954 52.951878, -1.183932 52.951841, -1.183904 52.951844, "
        "-1.18387 52.951847, -1.183832 52.951852, -1.183824 52.951838, "
        "-1.18382 52.95183, -1.18387 52.951819, -1.183886 52.951815, "
        "-1.18389 52.951819, -1.183929 52.95181, -1.183909 52.951776, "
        "-1.183861 52.951787, -1.183853 52.951788, -1.183842 52.95177, "
        "-1.18397 52.951742, -1.183983 52.951763, -1.183963 52.951768, "
        "-1.183975 52.951788, -1.183994 52.951785, -1.184009 52.951807, "
        "-1.184002 52.951808, -1.184009 52.951835, -1.18399 52.951836, "
        "-1.18399 52.951836, -1.18399 52.951838, -1.184001 52.95188, "
        "-1.184018 52.951954, -1.18402 52.951956, -1.183998 52.951957, "
        "-1.183998 52.951956, -1.183996 52.951948, -1.18397 52.951906, "
        "-1.183936 52.951909, -1.183864 52.951915))"
    )
    pt = from_wkt("POINT (-1.183972 52.951871)")
    assert A.covers(parcel, pt) and A.covered_by(pt, parcel) and A.contains(parcel, pt)


def test_dump_corpus(spark):
    """st_dump.test: recursive paths."""
    rows = spark.sql(
        "SELECT explode(ST_Dump(ST_GeomFromText("
        "'GEOMETRYCOLLECTION (POINT (1 1), POINT (2 2), GEOMETRYCOLLECTION (POINT (3 3)))'"
        "))) AS d"
    ).selectExpr("ST_AsText(d.geom) AS wkt", "d.path").collect()
    assert [(r.wkt, r.path) for r in rows] == [
        ("POINT (1 1)", [1]),
        ("POINT (2 2)", [2]),
        ("POINT (3 3)", [3, 1]),
    ]
    # empty collection -> []
    empty = spark.sql(
        "SELECT ST_Dump(ST_GeomFromText('GEOMETRYCOLLECTION EMPTY')) AS d"
    ).collect()[0].d
    assert empty == []
    # multipolygon paths
    rows = spark.sql(
        "SELECT explode(ST_Dump(ST_GeomFromText("
        "'MULTIPOLYGON (((0 0, 1 1, 1 0, 0 0)), ((2 2, 3 3, 3 2, 2 2)))'))) AS d"
    ).selectExpr("ST_AsText(d.geom) AS wkt", "d.path").collect()
    assert [(r.wkt, r.path) for r in rows] == [
        ("POLYGON ((0 0, 1 1, 1 0, 0 0))", [1]),
        ("POLYGON ((2 2, 3 3, 3 2, 2 2))", [2]),
    ]


def test_pointn_negative_indexing(spark):
    """st_pointn.test: 1-based, negative from end, NULL out of range."""
    line = "ST_GeomFromText('LINESTRING (0 0, 1 1, 2 2)')"
    get = lambda n: spark.sql(f"SELECT ST_AsText(ST_PointN({line}, {n})) AS v").collect()[0].v
    assert get(1) == "POINT (0 0)"
    assert get(3) == "POINT (2 2)"
    assert get(-1) == "POINT (2 2)"
    assert get(-3) == "POINT (0 0)"
    assert get(4) is None
    assert get(-4) is None
    assert get(0) is None


def test_area_corpus(spark):
    """st_area.test: per-subtype semantics."""
    cases = [
        ("POINT (0 0)", 0.0),
        ("LINESTRING (0 0, 1 1)", 0.0),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", 1.0),
        # hole variant (both ring orientations give same result)
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))", 0.64),
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.2 0.8, 0.8 0.8, 0.8 0.2, 0.2 0.2))", 0.64),
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))", 2.0),
        ("GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))", 1.0),
        ("GEOMETRYCOLLECTION EMPTY", 0.0),
        ("POLYGON Z ((0 0 0, 1 0 0, 1 1 1, 0 1 1, 0 0 0))", 1.0),  # planar area ignores Z
    ]
    for wkt, expected in cases:
        v = spark.sql(f"SELECT ST_Area(ST_GeomFromText('{wkt}')) AS v").collect()[0].v
        assert abs(v - expected) < 1e-12, wkt


def test_collection_extract(spark):
    g = (
        "ST_GeomFromText('GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1), "
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)), MULTIPOINT (5 5, 6 6))')"
    )
    get = lambda t: spark.sql(f"SELECT ST_AsText(ST_CollectionExtract({g}, {t})) AS v").collect()[0].v
    assert get(1) == "MULTIPOINT (1 1, 5 5, 6 6)"
    assert get(2) == "MULTILINESTRING ((0 0, 1 1))"
    assert get(3) == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))"


def test_postgis_pointonsurface_corpus():
    """test/sql/postgis/st_pointonsurface.test pinned answers (GEOS
    InteriorPoint conventions)."""
    assert to_wkt(A.point_on_surface(from_wkt("POINT (0 5)"))) == "POINT (0 5)"
    assert to_wkt(A.point_on_surface(from_wkt("LINESTRING (0 5, 0 10)"))) == "POINT (0 5)"
    assert (
        to_wkt(A.point_on_surface(from_wkt("POLYGON ((0 0, 0 5, 5 5, 5 0, 0 0))")))
        == "POINT (2.5 2.5)"
    )
    g = from_wkt(
        "POLYGON ((130 120, 120 190, 30 140, 50 20, 190 20, 170 100, 90 60, 90 130, 130 120))"
    )
    assert to_wkt(A.point_on_surface(g)) == "POINT (62.5 110)"
    c = A.centroid(g)
    assert abs(c[0] - 100.18264840182648) < 1e-12 and abs(c[1] - 85.11415525114155) < 1e-12


def test_postgis_linemerge_corpus():
    """test/sql/postgis/st_linemerge.test pinned answers."""
    m = A.line_merge(
        from_wkt("MULTILINESTRING ((10 160, 60 120), (120 140, 60 120), (120 140, 180 120))")
    )
    assert to_wkt(m) == "LINESTRING (10 160, 60 120, 120 140, 180 120)"
    d = A.line_merge(
        from_wkt("MULTILINESTRING ((60 30, 10 70), (120 50, 60 30), (120 50, 180 30))"),
        directed=True,
    )
    parts = {to_wkt(p) for p in d.flatten()}
    assert parts == {"LINESTRING (120 50, 60 30, 10 70)", "LINESTRING (120 50, 180 30)"}
