"""Writer breadth (COPY TO analogs): FlatGeobuf / GML / GPX / GeoJSON
FeatureCollection, each round-tripped through the matching reader
(readers are themselves validated against reference GDAL fixtures)."""

import json

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources.flatgeobuf import read_flatgeobuf, write_flatgeobuf
from duckdb_spatial_spark.sources.geojson import read_geojson, write_geojson
from duckdb_spatial_spark.sources.xmlgeo import read_gml, read_gpx, write_gml, write_gpx


@pytest.fixture(scope="module")
def mixed(spark):
    return spark.sql(
        """
        SELECT id, CAST(id AS STRING) AS name, CAST(id * 1.5 AS DOUBLE) AS score,
               CASE WHEN id % 4 = 0 THEN ST_Point(CAST(id AS DOUBLE), CAST(id*2 AS DOUBLE))
                    WHEN id % 4 = 1 THEN ST_MakeLine(array(
                        ST_Point(CAST(id AS DOUBLE), 0.0D), ST_Point(CAST(id+1 AS DOUBLE), 1.0D),
                        ST_Point(CAST(id+2 AS DOUBLE), 0.5D)))
                    WHEN id % 4 = 2 THEN ST_Multi(ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0D,
                        CAST(id+2 AS DOUBLE), 2.0D))
                    ELSE ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0D, CAST(id+2 AS DOUBLE), 2.0D)
               END AS geom
        FROM range(30)
        """
    ).cache()


def _wkts(df):
    return {int(r.id): r.wkt for r in df.selectExpr("CAST(id AS LONG) AS id", "ST_AsText(geom) AS wkt").collect()}


def test_flatgeobuf_roundtrip(spark, mixed, tmp_path):
    p = str(tmp_path / "rt.fgb")
    write_flatgeobuf(mixed, p, name="test")
    back = read_flatgeobuf(spark, p)
    assert set(back.columns) == {"id", "name", "score", "geom"}
    assert _wkts(back) == _wkts(mixed)
    assert {r.id: (r.name, r.score) for r in back.collect()} == {
        r.id: (r.name, r.score) for r in mixed.collect()
    }


def test_flatgeobuf_null_geometry_and_props(spark, tmp_path):
    df = spark.sql(
        "SELECT id, CASE WHEN id = 1 THEN NULL ELSE CAST(id AS STRING) END AS name,"
        " CASE WHEN id = 2 THEN NULL ELSE ST_Point(CAST(id AS DOUBLE), 0.0D) END AS geom"
        " FROM range(4)"
    )
    p = str(tmp_path / "nulls.fgb")
    write_flatgeobuf(df, p)
    back = read_flatgeobuf(spark, p)
    rows = {r.id: (r.name, r.geom is None) for r in back.collect()}
    assert rows[1][0] is None and rows[2][1]
    assert back.count() == 4


def test_gml_roundtrip(spark, mixed, tmp_path):
    p = str(tmp_path / "rt.gml")
    write_gml(mixed, p)
    back = read_gml(spark, p)
    assert back.count() == 30
    assert _wkts(back) == _wkts(mixed)


def test_gpx_roundtrip(spark, mixed, tmp_path):
    pts = mixed.filter("id % 4 = 0")
    p = str(tmp_path / "w.gpx")
    write_gpx(pts, p, name_col="name")
    back = read_gpx(spark, p, layer="waypoints")
    assert back.count() == pts.count()
    lines = mixed.filter("id % 4 = 1")
    p2 = str(tmp_path / "t.gpx")
    write_gpx(lines, p2, name_col="name")
    back2 = read_gpx(spark, p2, layer="tracks")
    assert back2.count() == lines.count()
    with pytest.raises(ValueError):
        write_gpx(mixed.filter("id % 4 = 3"), str(tmp_path / "bad.gpx"))


def test_geojson_collection_roundtrip(spark, mixed, tmp_path):
    p = str(tmp_path / "fc.json")
    write_geojson(mixed, p, style="collection")
    doc = json.load(open(p))
    assert doc["type"] == "FeatureCollection" and len(doc["features"]) == 30
    back = read_geojson(spark, p)
    assert back.count() == 30
    assert _wkts(back.withColumn("id", F.col("id").cast("long"))) == _wkts(mixed)


def test_wkt_csv_roundtrip(spark, mixed, tmp_path):
    from duckdb_spatial_spark.sources.geojson import read_wkt_csv, write_wkt_csv

    p = str(tmp_path / "csvout")
    write_wkt_csv(mixed, p)
    back = read_wkt_csv(spark, p + "/*.csv")
    assert back.count() == 30
    assert _wkts(back) == _wkts(mixed)


def test_single_file_writer_guards(spark, mixed, tmp_path):
    # driver-materializing single-file writers must refuse big inputs with
    # an actionable error instead of OOMing the driver
    from duckdb_spatial_spark.sources.gpkg import write_gpkg
    from duckdb_spatial_spark.sources.shapefile import write_shapefile

    pts = mixed.filter("id % 4 = 0")
    with pytest.raises(ValueError, match="max_rows"):
        write_gpkg(mixed, str(tmp_path / "g.gpkg"), max_rows=5)
    with pytest.raises(ValueError, match="max_rows"):
        write_shapefile(pts, str(tmp_path / "s.shp"), max_rows=2)
    # under the cap both still write
    write_gpkg(mixed, str(tmp_path / "ok.gpkg"), max_rows=100)
    write_shapefile(pts, str(tmp_path / "ok.shp"), max_rows=100)


def test_st_write_dispatch(spark, tmp_path):
    """One entry point for every sink format (COPY TO analog)."""
    import pytest as _pytest

    from duckdb_spatial_spark.sources import st_read, st_write

    df = spark.sql(
        "SELECT id, concat('n', CAST(id AS STRING)) AS name,"
        " ST_Point(CAST(id AS DOUBLE), CAST(id * 2 AS DOUBLE)) AS geom FROM range(25)"
    )
    for fname in ("d.geojson", "d.shp", "d.gpkg", "d.kml", "d.mif", "d.tab",
                  "d.sqlite", "d.sql", "d.rss", "d.arrow"):
        p = str(tmp_path / fname)
        st_write(df, p)
        back = st_read(spark, p)
        assert back.count() == 25, fname
    with _pytest.raises(ValueError, match="sniff"):
        st_write(df, str(tmp_path / "d.unknown"))
