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
