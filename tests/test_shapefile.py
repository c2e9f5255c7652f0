"""Shapefile reader/writer against the reference's real NYC borough export
(read-only input from /root/reference/test/data/nyc_export)."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import udfs
from duckdb_spatial_spark.sources.shapefile import read_dbf, read_shapefile, write_shapefile

NYC = "/root/reference/test/data/nyc_export"


@pytest.mark.skipif(not os.path.isdir(NYC), reason="reference data not present")
def test_read_nyc_boroughs(spark):
    df = read_shapefile(spark, NYC)
    rows = (
        df.withColumn("t", udfs.st_geometrytype("geom"))
        .withColumn("v", udfs.st_isvalid("geom"))
        .select("boro_name", "t", "v")
        .orderBy("boro_name")
        .collect()
    )
    assert [r.boro_name for r in rows] == [
        "Bronx",
        "Brooklyn",
        "Manhattan",
        "Queens",
        "Staten Island",
    ]
    assert all(r.t in ("POLYGON", "MULTIPOLYGON") for r in rows)


@pytest.mark.skipif(not os.path.isdir(NYC), reason="reference data not present")
def test_shapefile_roundtrip(spark, tmp_path):
    df = read_shapefile(spark, NYC)
    out = str(tmp_path / "out.shp")
    write_shapefile(df, out)
    back = read_shapefile(spark, out)

    def areas(d):
        return [
            r.a
            for r in d.withColumn("a", F.round(udfs.st_area("geom"), 9))
            .orderBy("boro_name")
            .collect()
        ]

    assert areas(df) == areas(back)
    fields, rows = read_dbf(str(tmp_path / "out.dbf"))
    assert len(rows) == 5


def test_synthetic_points_roundtrip(spark, tmp_path):
    pts = spark.createDataFrame(
        [(1, "a", 1.5, 2.5), (2, "b", -3.0, 4.0)], "id long, name string, x double, y double"
    ).withColumn("geom", udfs.st_point("x", "y")).drop("x", "y")
    out = str(tmp_path / "pts.shp")
    write_shapefile(pts, out)
    back = read_shapefile(spark, out)
    wkts = {r.wkt for r in back.withColumn("wkt", udfs.st_astext("geom")).collect()}
    assert wkts == {"POINT (1.5 2.5)", "POINT (-3 4)"}


def test_prj_crs_tag_roundtrip(spark, tmp_path):
    """write_shapefile(crs=) emits a .prj; read_shapefile tags the geom
    column metadata with its WKT; st_transform_tagged consumes the tag.
    The grid coordinates are the PINNED outputs of the transform_wkt
    oracle for (-2, 54), so the tagged inverse must land back there."""
    from duckdb_spatial_spark.functions import register_all
    from duckdb_spatial_spark.functions.crs import geom_crs, st_transform_tagged

    register_all(spark)
    osgb = (
        'PROJCS["OSGB36 / British National Grid",GEOGCS["OSGB36",'
        'DATUM["Ordnance_Survey_of_Great_Britain_1936",SPHEROID["Airy 1830",'
        '6377563.396,299.3249646],'
        'TOWGS84[446.448,-125.157,542.06,0.15,0.247,0.842,-20.489]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],'
        'PARAMETER["latitude_of_origin",49],PARAMETER["central_meridian",-2],'
        'PARAMETER["scale_factor",0.9996012717],'
        'PARAMETER["false_easting",400000],PARAMETER["false_northing",-100000],'
        'UNIT["metre",1],AUTHORITY["EPSG","27700"]]'
    )
    df = spark.createDataFrame(
        [(1, 400097.646, 455996.503)], "id long, e double, n double"
    ).selectExpr("id", "ST_AsWKB(ST_Point(e, n)) AS geom")
    shp = str(tmp_path / "osgb.shp")
    write_shapefile(df, shp, crs=osgb)
    assert os.path.exists(str(tmp_path / "osgb.prj"))

    back = read_shapefile(spark, shp)
    assert geom_crs(back, "geom") == osgb
    row = (
        st_transform_tagged(back, "OGC:CRS84", geom_col="geom")
        .selectExpr("round(ST_X(geom), 6) AS lon", "round(ST_Y(geom), 6) AS lat")
        .first()
    )
    assert (row.lon, row.lat) == (-2.0, 54.0)

    # crs propagates write->read without restating it
    shp2 = str(tmp_path / "copy.shp")
    write_shapefile(back.select("geom"), shp2)
    assert geom_crs(read_shapefile(spark, shp2), "geom") == osgb

    # untagged transform must refuse rather than guess a source CRS
    with pytest.raises(ValueError, match="no crs tag"):
        st_transform_tagged(df, "EPSG:4326")


def test_gpkg_srs_crs_tag(spark, tmp_path):
    """read_gpkg surfaces the layer SRS as an EPSG crs tag."""
    from duckdb_spatial_spark.functions import register_all
    from duckdb_spatial_spark.functions.crs import geom_crs
    from duckdb_spatial_spark.sources.gpkg import read_gpkg, write_gpkg

    register_all(spark)
    df = spark.createDataFrame(
        [(1, -0.1276, 51.5072)], "id long, lon double, lat double"
    ).selectExpr("id", "ST_AsWKB(ST_Point(lon, lat)) AS geom")
    path = str(tmp_path / "pts.gpkg")
    write_gpkg(df, path, layer="pts", srs_id=4326)
    assert geom_crs(read_gpkg(spark, path), "geom") == "EPSG:4326"


def test_gpkg_write_crs_roundtrip(spark, tmp_path):
    """write_gpkg(crs=) registers the SRS in gpkg_spatial_ref_sys —
    EPSG code, raw WKT, and tag propagation from a tagged read."""
    from duckdb_spatial_spark.functions import register_all
    from duckdb_spatial_spark.functions.crs import geom_crs
    from duckdb_spatial_spark.sources.gpkg import read_gpkg, write_gpkg

    register_all(spark)
    df = spark.createDataFrame(
        [(1, 400097.646, 455996.503)], "id long, e double, n double"
    ).selectExpr("id", "ST_AsWKB(ST_Point(e, n)) AS geom")
    p1 = str(tmp_path / "osgb.gpkg")
    write_gpkg(df, p1, layer="pts", crs="EPSG:27700")
    back = read_gpkg(spark, p1)
    assert geom_crs(back) == "EPSG:27700"

    wkt = ('PROJCS["OSGB36 / British National Grid",GEOGCS["OSGB36",'
           'DATUM["OSGB_1936",SPHEROID["Airy 1830",6377563.396,299.3249646]],'
           'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
           'PROJECTION["Transverse_Mercator"],UNIT["metre",1]]')
    p2 = str(tmp_path / "wkt.gpkg")
    write_gpkg(df, p2, layer="pts", srs_id=90001, crs=wkt)
    assert geom_crs(read_gpkg(spark, p2)) == wkt

    # tag propagation: read (tagged EPSG:27700) -> write without crs=
    p3 = str(tmp_path / "prop.gpkg")
    write_gpkg(back, p3, layer="pts")
    assert geom_crs(read_gpkg(spark, p3)) == "EPSG:27700"
