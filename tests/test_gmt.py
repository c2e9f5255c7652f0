"""GMT ASCII vector source (sources/gmt.py): point/line/polygon round
trips, attribute typing, hole handling, st_read/st_write dispatch."""

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import register_all
from duckdb_spatial_spark.sources import st_read, st_write
from duckdb_spatial_spark.sources.gmt import read_gmt, write_gmt


def test_point_roundtrip_with_attrs(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame(
        [(1, "a", 1.5, 10.0, 20.0), (2, "b", 2.5, 30.0, 40.0)],
        "id long, name string, v double, x double, y double",
    ).selectExpr("id", "name", "v", "ST_AsWKB(ST_Point(x, y)) AS geom")
    p = str(tmp_path / "pts.gmt")
    st_write(df, p)
    back = st_read(spark, p)
    assert dict(back.dtypes)["id"] == "bigint"
    assert dict(back.dtypes)["v"] == "double"
    rows = {r.id: r for r in back.selectExpr(
        "id", "name", "v", "ST_X(geom) AS x", "ST_Y(geom) AS y").collect()}
    assert rows[1].name == "a" and rows[1].v == 1.5
    assert (rows[2].x, rows[2].y) == (30.0, 40.0)


def test_linestring_roundtrip(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,)], "id long").selectExpr(
        "id",
        "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(CAST(id AS DOUBLE), 0.0),"
        " ST_Point(CAST(id AS DOUBLE), CAST(id * 3 AS DOUBLE))))) AS geom",
    )
    p = str(tmp_path / "lines.gmt")
    write_gmt(df, p)
    back = read_gmt(spark, p)
    rows = {r.id: r for r in back.selectExpr(
        "id", "ST_Length(geom) AS l", "ST_NPoints(geom) AS n").collect()}
    assert rows[1].l == 3.0 and rows[2].l == 6.0
    assert rows[1].n == 2


def test_polygon_with_hole_roundtrip(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,)], "id long").selectExpr(
        "id",
        "CASE WHEN id = 1 THEN ST_AsWKB(ST_GeomFromText("
        "'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))'))"
        " ELSE ST_AsWKB(ST_MakeEnvelope(20, 20, 25, 30)) END AS geom",
    )
    p = str(tmp_path / "polys.gmt")
    write_gmt(df, p)
    back = read_gmt(spark, p)
    rows = {r.id: r for r in back.selectExpr(
        "id", "ST_Area(geom) AS a",
        "ST_NInteriorRings(geom) AS h").collect()}
    assert rows[1].a == 96.0 and rows[1].h == 1  # 100 - 4 hole
    assert rows[2].a == 50.0 and rows[2].h == 0


def test_mixed_types_refused(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "id", "ST_AsWKB(ST_Collect(ARRAY(ST_Point(1.0, 2.0)))) AS geom")
    with pytest.raises(ValueError, match="unsupported geometry"):
        write_gmt(df, str(tmp_path / "x.gmt"))


def test_multipolygon_roundtrip(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,)], "id long").selectExpr(
        "id",
        "CASE WHEN id = 1 THEN ST_AsWKB(ST_GeomFromText('MULTIPOLYGON ("
        "((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2)),"
        " ((20 0, 25 0, 25 5, 20 5, 20 0)))'))"
        " ELSE ST_AsWKB(ST_MakeEnvelope(40, 40, 42, 43)) END AS geom",
    )
    p = str(tmp_path / "mp.gmt")
    write_gmt(df, p, gtype="MULTIPOLYGON")
    back = read_gmt(spark, p)
    rows = {r.id: r for r in back.selectExpr(
        "id", "ST_GeometryType(geom) AS t", "ST_Area(geom) AS a",
        "ST_NumGeometries(geom) AS n").collect()}
    assert rows[1].t == "MULTIPOLYGON" and rows[1].n == 2
    assert rows[1].a == 96.0 + 25.0
    # POLYGON row promoted into the MULTIPOLYGON layer
    assert rows[2].t == "MULTIPOLYGON" and rows[2].a == 6.0


def test_multipolygon_no_attrs_single_feature(spark, tmp_path):
    # attribute-less MULTIPOLYGON files still delimit features via the
    # empty "# @D" line the writer emits
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,)], "id long").selectExpr(
        "ST_AsWKB(ST_Multi(ST_MakeEnvelope(id * 10, 0, id * 10 + 5, 5))) AS geom")
    p = str(tmp_path / "mpna.gmt")
    write_gmt(df, p)
    back = read_gmt(spark, p)
    assert back.count() == 2


def test_mixed_tag_rows_raise(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,)], "id long").selectExpr(
        "id",
        "CASE WHEN id = 1 THEN ST_AsWKB(ST_Point(1.0, 2.0))"
        " ELSE ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(0.0, 0.0),"
        " ST_Point(1.0, 1.0)))) END AS geom")
    with pytest.raises(ValueError, match="mixed-type"):
        write_gmt(df, str(tmp_path / "mix.gmt"))
