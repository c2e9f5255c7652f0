"""Generalized ST_Read_Meta (sources/__init__.py): header-only metadata
for FGB/GPKG/SHP/GDB, GeoJSON feature scan, generic st_read fallback
(reference st_read_meta.cpp:26-56, flattened schema)."""

import os

import pytest

from duckdb_spatial_spark.sources import st_read_meta, write_gdb, write_gpkg, write_shapefile
from duckdb_spatial_spark.sources.flatgeobuf import write_flatgeobuf
from duckdb_spatial_spark.sources.xmlgeo import write_kml


@pytest.fixture(scope="module")
def pts(spark):
    return spark.sql(
        "SELECT id, ST_Point(CAST(id AS DOUBLE), 1.0D) AS geom FROM range(42)"
    ).cache()


def _one(spark, path, **kw):
    rows = st_read_meta(spark, path, **kw).collect()
    assert len(rows) == 1
    return rows[0]


def test_meta_header_only_formats(spark, pts, tmp_path):
    p = str(tmp_path / "t.fgb")
    write_flatgeobuf(pts, p)
    r = _one(spark, p)
    assert (r.driver, r.feature_count, r.geometry_types) == ("FlatGeobuf", 42, "Point")

    p = str(tmp_path / "t.gpkg")
    write_gpkg(pts, p)
    r = _one(spark, p)
    assert r.driver == "GPKG" and r.feature_count == 42 and r.crs.startswith("EPSG:")

    p = str(tmp_path / "t.shp")
    write_shapefile(pts, p)
    r = _one(spark, p)
    assert (r.driver, r.feature_count, r.geometry_types) == ("ESRI Shapefile", 42, "Point")

    p = str(tmp_path / "t.gdb")
    write_gdb(pts, p, geometry_type="POINT")
    r = _one(spark, p)
    assert (r.driver, r.feature_count, r.geometry_types) == ("OpenFileGDB", 42, "Point")


def test_meta_generic_fallback_scans(spark, pts, tmp_path):
    p = str(tmp_path / "t.kml")
    write_kml(pts, p)
    r = _one(spark, p, format="kml")
    assert r.feature_count == 42
    assert "Point" in r.geometry_types


def test_read_meta_arrow(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read_meta, write_arrow_ipc

    df = spark.range(250).selectExpr(
        "id", "ST_AsWKB(ST_Point(CAST(id AS DOUBLE), 1.0D)) AS geom"
    )
    p = str(tmp_path / "m.arrow")
    write_arrow_ipc(df, p)
    r = st_read_meta(spark, p).collect()[0]
    assert r.driver == "Arrow" and r.feature_count == 250
    assert r.geometry_types == "WKB"


def test_read_meta_tab_and_spatialite(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read_meta, st_write

    df = spark.sql(
        "SELECT id, ST_Point(CAST(id AS DOUBLE), 2.0D) AS geom FROM range(30)"
    )
    tab = str(tmp_path / "m.tab")
    st_write(df, tab)
    r = st_read_meta(spark, tab).collect()[0]
    assert r.driver == "MapInfo File" and r.feature_count == 30
    assert "Point" in r.geometry_types

    sl = str(tmp_path / "m.sqlite")
    st_write(df, sl)
    r2 = st_read_meta(spark, sl).collect()[0]
    assert r2.driver == "SQLite" and r2.feature_count == 30
    assert r2.crs == "EPSG:4326"


def test_meta_new_r13_formats(spark, tmp_path):
    """gmt/dgn/s57 answer st_read_meta from their driver-side parsers
    (no Spark scan job)."""
    from duckdb_spatial_spark.functions import register_all
    from duckdb_spatial_spark.sources import st_read_meta, st_write

    register_all(spark)
    df = spark.createDataFrame([(i,) for i in range(4)], "id long").selectExpr(
        "id",
        "ST_AsWKB(ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0,"
        " CAST(id + 1 AS DOUBLE), 2.0)) AS geom",
    )
    for ext, driver, gt in (
        (".gmt", "OGR_GMT", "Polygon"),
        (".dgn", "DGN", "Polygon"),
        (".000", "S57", "Polygon"),
    ):
        p = str(tmp_path / f"m{ext}")
        st_write(df, p)
        r = st_read_meta(spark, p).first()
        assert r.driver == driver and r.feature_count == 4, (ext, r)
        assert gt in r.geometry_types, (ext, r)


def test_meta_new_r16_formats(spark, tmp_path):
    """sosi/interlis/sdts answer st_read_meta from their driver-side
    parsers (no Spark scan job); SOSI carries the KOORDSYS EPSG."""
    from duckdb_spatial_spark.functions import register_all
    from duckdb_spatial_spark.sources import st_read_meta, st_write

    register_all(spark)
    df = spark.createDataFrame([(i,) for i in range(4)], "id long").selectExpr(
        "id",
        "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(CAST(id AS DOUBLE), 0.0),"
        " ST_Point(CAST(id AS DOUBLE), 2.0)))) AS geom",
    )
    p = str(tmp_path / "m.sos")
    st_write(df, p, koordsys=23)
    r = st_read_meta(spark, p).first()
    # SOSI polygon-writer note: linestrings write as KURVE; the FLATE
    # path is polygon-only, so these stay LineString
    assert r.driver == "SOSI" and r.feature_count == 4
    assert "LineString" in r.geometry_types and r.crs == "EPSG:25833"

    p = str(tmp_path / "m.itf")
    st_write(df, p)
    r = st_read_meta(spark, p).first()
    assert r.driver == "Interlis 1" and r.feature_count == 4
    assert "LineString" in r.geometry_types

    p = str(tmp_path / "m_sdts")
    st_write(df, p, format="sdts")
    r = st_read_meta(spark, str(tmp_path / "m_sdts" / "TR01CATD.DDF")).first()
    assert r.driver == "SDTS" and r.feature_count == 4
    assert "LineString" in r.geometry_types
