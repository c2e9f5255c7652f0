"""DGN v7 source (sources/dgn.py, ISFF element subset): line/linestring/
shape round trips, symbology defaults, skip behavior, dispatch."""

import struct

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import register_all
from duckdb_spatial_spark.sources import st_read, st_write
from duckdb_spatial_spark.sources.dgn import read_dgn, write_dgn


def test_roundtrip_geometries(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long").selectExpr(
        "id",
        "CASE WHEN id = 1 THEN ST_AsWKB(ST_MakeLine(ARRAY("
        "  ST_Point(1.25, 2.5), ST_Point(3.0, 4.0))))"
        " WHEN id = 2 THEN ST_AsWKB(ST_MakeLine(ARRAY("
        "  ST_Point(0.0, 0.0), ST_Point(5.0, 0.0), ST_Point(5.0, 7.0))))"
        " ELSE ST_AsWKB(ST_MakeEnvelope(10, 10, 14, 16)) END AS geom",
    )
    p = str(tmp_path / "t.dgn")
    st_write(df, p)
    back = st_read(spark, p)
    rows = back.selectExpr(
        "ST_GeometryType(geom) AS t", "round(ST_Length(geom), 6) AS l",
        "round(ST_Area(geom), 6) AS a", "ST_NPoints(geom) AS n",
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.t, []).append(r)
    lines = sorted(by_type["LINESTRING"], key=lambda r: r.n)
    assert lines[0].n == 2 and abs(lines[0].l - 5.3125 ** 0.5) < 1e-6
    assert lines[1].n == 3 and lines[1].l == 12.0
    poly = by_type["POLYGON"][0]
    assert poly.a == 24.0


def test_uor_resolution_and_levels(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(7, 1.234567,)], "lvl int, x double").selectExpr(
        "lvl",
        "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(x, 0.0), ST_Point(x, 1.0)))) AS geom",
    )
    p = str(tmp_path / "u.dgn")
    write_dgn(df, p, level_col="lvl", uor_scale=1_000_000)
    back = read_dgn(spark, p, uor_scale=1_000_000)
    r = back.selectExpr("level", "round(ST_XMin(geom), 6) AS x").first()
    assert r.level == 7 and r.x == 1.234567


def test_skips_foreign_elements_and_eof(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_MakeEnvelope(0, 0, 2, 2)) AS geom")
    p = str(tmp_path / "s.dgn")
    write_dgn(df, p)
    raw = open(p, "rb").read()
    assert raw.endswith(b"\xff\xff")
    # splice in an unsupported element (type 17 text, empty body) before EOF
    alien = bytes([0, 17]) + struct.pack("<H", 16) + b"\x00" * 32
    with open(p, "wb") as f:
        f.write(raw[:-2] + alien + b"\xff\xff")
    assert read_dgn(spark, p).count() == 1  # alien skipped, not raised


def test_holes_and_points_refused(spark, tmp_path):
    register_all(spark)
    holed = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_GeomFromText('POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0),"
        " (2 2, 3 2, 3 3, 2 3, 2 2))')) AS geom")
    with pytest.raises(ValueError, match="holes"):
        write_dgn(holed, str(tmp_path / "h.dgn"))
    pt = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Point(1.0, 2.0)) AS geom")
    with pytest.raises(ValueError, match="unsupported geometry"):
        write_dgn(pt, str(tmp_path / "p.dgn"))


def test_tcb_uor_default_roundtrip(spark, tmp_path):
    # the writer stamps uor_scale into the TCB; the reader's default
    # picks it up without an explicit uor_scale=
    register_all(spark)
    df = spark.createDataFrame([(1.234567,)], "x double").selectExpr(
        "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(x, 0.0), ST_Point(x, 1.0)))) AS geom")
    p = str(tmp_path / "tcb.dgn")
    write_dgn(df, p, uor_scale=1_000_000)
    r = read_dgn(spark, p).selectExpr("round(ST_XMin(geom), 6) AS x").first()
    assert r.x == 1.234567
    from duckdb_spatial_spark.sources.dgn import tcb_uor_scale
    assert tcb_uor_scale(p) == 1_000_000.0


def test_complex_chain_roundtrip(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_GeomFromText('MULTILINESTRING ((0 0, 1 0, 2 1),"
        " (2 1, 3 5))')) AS geom")
    p = str(tmp_path / "cc.dgn")
    write_dgn(df, p)
    back = read_dgn(spark, p)
    r = back.selectExpr("ST_AsText(geom) AS t", "text").first()
    # parts share the endpoint (2 1): chain concatenates into one linestring
    assert r.t == "LINESTRING (0 0, 1 0, 2 1, 3 5)" and r.text is None


def test_complex_shape_roundtrip(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_MakeEnvelope(0, 0, 8, 6)) AS geom")
    p = str(tmp_path / "cs.dgn")
    write_dgn(df, p, complex_shapes=True)
    back = read_dgn(spark, p)
    r = back.selectExpr("ST_GeometryType(geom) AS t",
                        "round(ST_Area(geom), 6) AS a").first()
    assert r.t == "POLYGON" and r.a == 48.0


def test_text_elements(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame(
        [(1, "Main St", 2.5, 3.25), (2, None, 0.0, 0.0)],
        "id long, label string, x double, y double",
    ).selectExpr("id", "label", "ST_AsWKB(ST_Point(x, y)) AS geom",
                 "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(x, y),"
                 " ST_Point(x + 1, y)))) AS lgeom")
    # text rows write TEXT elements; the null-label row needs a line geom
    txt = df.where("label IS NOT NULL").select("label", "geom")
    lines = df.where("label IS NULL").select(
        F.lit(None).cast("string").alias("label"), F.col("lgeom").alias("geom"))
    p = str(tmp_path / "txt.dgn")
    write_dgn(txt.unionByName(lines), p, text_col="label")
    back = read_dgn(spark, p)
    rows = {r.text: r for r in back.selectExpr(
        "text", "ST_AsText(geom) AS t").collect()}
    assert rows["Main St"].t == "POINT (2.5 3.25)"
    assert rows[None].t.startswith("LINESTRING")


def test_arc_and_ellipse_elements(spark, tmp_path):
    """ISFF curve elements (types 15/16) stroke to ring/linestring like
    GDAL's DGN layer (dgnlib DGNStrokeArc)."""
    import math

    from duckdb_spatial_spark.sources.dgn import (
        arc_element, ellipse_element, write_dgn,
    )

    register_all(spark)
    # seed a file with one linestring, then splice in an ellipse + arc
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(0.0, 0.0), ST_Point(1.0, 0.0)))) AS geom")
    p = str(tmp_path / "curves.dgn")
    write_dgn(df, p, uor_scale=100000)
    raw = open(p, "rb").read()
    ell = ellipse_element(10.0, 20.0, 3.0, 2.0, level=4, uor_scale=100000)
    arc = arc_element(0.0, 0.0, 5.0, 5.0, 0.0, 90.0, level=6, uor_scale=100000)
    with open(p, "wb") as f:
        f.write(raw[:-2] + ell + arc + b"\xff\xff")
    back = read_dgn(spark, p)
    rows = {r.level: r for r in back.selectExpr(
        "level", "ST_GeometryType(geom) AS t", "round(ST_Area(geom), 2) AS a",
        "round(ST_Length(geom), 3) AS l", "ST_NPoints(geom) AS n",
        "round(ST_XMin(geom), 3) AS mnx", "round(ST_XMax(geom), 3) AS mxx",
    ).collect()}
    e = rows[4]
    assert e.t == "POLYGON"
    # stroked 72-gon area converges on pi*a*b = 18.85 (within 1%)
    assert abs(e.a - math.pi * 3.0 * 2.0) < 0.2
    assert abs(e.mnx - 7.0) < 0.01 and abs(e.mxx - 13.0) < 0.01
    a = rows[6]
    assert a.t == "LINESTRING"
    # quarter circle r=5: length ~ 2*pi*5/4 = 7.854
    assert abs(a.l - math.pi * 2.5) < 0.02
    assert a.n == 19 + 1  # 90/5 steps + 1


def test_cell_header(spark, tmp_path):
    """ISFF CELL headers (type 2): members collect into one multi-geometry
    row; the RAD50-packed cell name lands in the text column."""
    from duckdb_spatial_spark.sources.dgn import (
        _element, _linework, _rng, cell_element, write_dgn,
    )

    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_MakeEnvelope(100.0, 100.0, 101.0, 101.0)) AS geom")
    p = str(tmp_path / "cell.dgn")
    write_dgn(df, p, uor_scale=100000)
    raw = open(p, "rb").read()
    uor = 100000
    pts1 = [(0, 0), (uor, 0)]
    et1, b1 = _linework(pts1)
    m1 = _element(et1, 0, 0, _rng(pts1), b1, cmplx=True)
    import struct as _s

    from duckdb_spatial_spark.sources.dgn import DGNT_SHAPE, _wr_i32

    ring = [(2 * uor, 0), (3 * uor, 0), (3 * uor, uor), (2 * uor, 0)]
    body = _s.pack("<H", len(ring)) + b"".join(_wr_i32(v) for pnt in ring for v in pnt)
    m2 = _element(DGNT_SHAPE, 0, 0, _rng(ring), body, cmplx=True)
    cell = cell_element("PUMP2", [m1, m2], level=9)
    with open(p, "wb") as f:
        f.write(raw[:-2] + cell + b"\xff\xff")
    back = read_dgn(spark, p)
    rows = {r.level: r for r in back.selectExpr(
        "level", "text", "ST_GeometryType(geom) AS t",
        "ST_NumGeometries(geom) AS n").collect()}
    c = rows[9]
    assert c.text == "PUMP2"
    assert c.t == "GEOMETRYCOLLECTION" and c.n == 2
    assert rows[0].text is None  # the plain envelope row untouched


def test_3d_linework_roundtrip(spark, tmp_path):
    """dimension=3 stamps the TCB flag; LINE/LINE_STRING/SHAPE payloads
    become (x y z) triplets and read back as Z geometries."""
    register_all(spark)
    df = spark.createDataFrame(
        [(1, "LINESTRING Z (0 0 1.5, 3 4 2.5)"),
         (2, "POLYGON Z ((0 0 1, 4 0 1, 4 4 1, 0 4 1, 0 0 1))"),
         (3, "LINESTRING Z (0 0 -5, 1 0 -6, 2 1 -7)")],
        "lvl int, wkt string",
    ).selectExpr("lvl", "ST_AsWKB(ST_GeomFromText(wkt)) AS geom")
    p = str(tmp_path / "three.dgn")
    write_dgn(df, p, level_col="lvl", dimension=3, uor_scale=100000)
    back = {r.level: r for r in read_dgn(spark, p).selectExpr(
        "level", "ST_GeometryType(geom) AS t", "ST_HasZ(geom) AS hz",
        "ST_NPoints(geom) AS n", "round(ST_ZMin(geom), 6) AS zmn",
        "round(ST_ZMax(geom), 6) AS zmx",
        "round(ST_Area(geom), 6) AS a").collect()}
    assert back[1].t == "LINESTRING" and back[1].hz and back[1].zmx == 2.5
    assert back[2].t == "POLYGON" and back[2].a == 16.0 and back[2].zmn == 1.0
    assert back[3].n == 3 and back[3].zmn == -7.0  # negative z UORs
    # a 2D write of the same geometries drops z entirely
    p2 = str(tmp_path / "two.dgn")
    write_dgn(df, p2, level_col="lvl", uor_scale=100000)
    flat = read_dgn(spark, p2).selectExpr("ST_HasZ(geom) AS hz").collect()
    assert all(not r.hz for r in flat)


def test_curve_element_stroked(spark, tmp_path):
    """CURVE (type 11): first/last vertices are slope controls the curve
    does not pass through; the stroke is a C1 cubic through the interior
    vertices, 8 samples per span."""
    from duckdb_spatial_spark.sources.dgn import (
        curve_element, write_dgn_elements,
    )

    register_all(spark)
    p = str(tmp_path / "curve.dgn")
    write_dgn_elements(p, [
        curve_element([(-1, -1), (0, 0), (1, 1), (2, 0), (3, 1)],
                      level=5, uor_scale=100000),
    ], uor_scale=100000)
    r = read_dgn(spark, p).selectExpr(
        "level", "ST_GeometryType(geom) AS t", "ST_NPoints(geom) AS n",
        "round(ST_X(ST_StartPoint(geom)), 6) AS x0",
        "round(ST_Y(ST_StartPoint(geom)), 6) AS y0",
        "round(ST_X(ST_EndPoint(geom)), 6) AS x1",
        "round(ST_Y(ST_EndPoint(geom)), 6) AS y1").first()
    assert (r.level, r.t, r.n) == (5, "LINESTRING", 17)
    assert (r.x0, r.y0) == (0.0, 0.0) and (r.x1, r.y1) == (2.0, 0.0)


def test_bspline_open_and_closed(spark, tmp_path):
    """B-SPLINE CURVE header (27) + POLE component (21): open curves
    clamp to the end poles; closed curves are periodic (start == end)
    and a square control polygon passes through its edge midpoints."""
    from duckdb_spatial_spark.sources.dgn import (
        bspline_elements, write_dgn_elements,
    )

    register_all(spark)
    p = str(tmp_path / "bspl.dgn")
    write_dgn_elements(p, [
        bspline_elements([(0, 0), (1, 2), (2, -2), (3, 0)], order=3,
                         level=1, uor_scale=100000),
        bspline_elements([(0, 0), (2, 0), (2, 2), (0, 2)], order=3,
                         closed=True, level=2, uor_scale=100000),
    ], uor_scale=100000)
    rows = {r.level: r for r in read_dgn(spark, p).selectExpr(
        "level", "ST_NPoints(geom) AS n", "ST_IsClosed(geom) AS cl",
        "round(ST_X(ST_StartPoint(geom)), 6) AS x0",
        "round(ST_X(ST_EndPoint(geom)), 6) AS x1",
        "round(ST_XMin(geom), 6) AS mnx",
        "round(ST_XMax(geom), 6) AS mxx").collect()}
    op, cl = rows[1], rows[2]
    assert op.n == 21 and op.x0 == 0.0 and op.x1 == 3.0 and not op.cl
    assert cl.n == 41 and cl.cl and cl.mnx == 0.0 and cl.mxx == 2.0


def test_3d_arc_ellipse_text(spark, tmp_path):
    """3D ELLIPSE/ARC (quaternion layouts) and 3D TEXT origin: identity
    quaternion keeps the XY plane at z = cz; a 90-degree rotation about
    the X axis (quat w=x=sqrt(2)/2) maps the local ellipse plane into
    XZ, so the world points are (cx + a cos t, cy, cz + b sin t)."""
    import math

    from duckdb_spatial_spark.sources.dgn import (
        arc_element, ellipse_element, read_dgn, write_dgn,
        write_dgn_elements,
    )

    register_all(spark)
    s = math.sqrt(0.5)
    p = str(tmp_path / "curves3.dgn")
    write_dgn_elements(p, [
        # identity quat: quarter circle r=5 in the z=7.5 plane
        arc_element(0.0, 0.0, 5.0, 5.0, 0.0, 90.0, level=6,
                    uor_scale=100000, cz=7.5),
        # 90 deg about X: ellipse a=3/b=2 in the XZ plane through y=20
        ellipse_element(10.0, 20.0, 3.0, 2.0, level=4, uor_scale=100000,
                        cz=3.0, quat=(s, s, 0.0, 0.0)),
    ], uor_scale=100000, dimension=3)
    rows = {r.level: r for r in read_dgn(spark, p).selectExpr(
        "level", "ST_GeometryType(geom) AS t", "ST_HasZ(geom) AS hz",
        "ST_NPoints(geom) AS n",
        "round(ST_XMin(geom), 3) AS mnx", "round(ST_XMax(geom), 3) AS mxx",
        "round(ST_YMin(geom), 3) AS mny", "round(ST_YMax(geom), 3) AS mxy",
        "round(ST_ZMin(geom), 3) AS mnz", "round(ST_ZMax(geom), 3) AS mxz",
    ).collect()}
    a = rows[6]
    assert a.t == "LINESTRING" and a.hz and a.n == 20
    assert a.mnz == 7.5 and a.mxz == 7.5
    assert a.mxx == 5.0 and a.mxy == 5.0 and abs(a.mnx) < 0.01
    e = rows[4]
    assert e.t == "POLYGON" and e.hz
    # stroked 73-gon: extremes converge on the axis lengths (within 1%)
    assert abs(e.mnx - 7.0) < 0.01 and abs(e.mxx - 13.0) < 0.01
    assert (e.mny, e.mxy) == (20.0, 20.0)
    assert abs(e.mnz - 1.0) < 0.01 and abs(e.mxz - 5.0) < 0.01
    # 3D TEXT: write_dgn's dimension=3 text path + origin z readback
    df = spark.createDataFrame([(9, "Depth", "POINT Z (1.5 2.5 -3.25)")],
                               "lvl int, nm string, wkt string").selectExpr(
        "lvl", "nm", "ST_AsWKB(ST_GeomFromText(wkt)) AS geom")
    pt = str(tmp_path / "text3.dgn")
    write_dgn(df, pt, level_col="lvl", text_col="nm", dimension=3,
              uor_scale=100000)
    r = read_dgn(spark, pt).selectExpr(
        "level", "text", "ST_HasZ(geom) AS hz",
        "round(ST_X(geom), 6) AS x", "round(ST_Y(geom), 6) AS y",
        "round(ST_Z(geom), 6) AS z").first()
    assert (r.level, r.text, r.hz) == (9, "Depth", True)
    assert (r.x, r.y, r.z) == (1.5, 2.5, -3.25)
