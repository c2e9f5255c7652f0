"""Esri JSON FeatureSet source/sink: ring-winding organization (cw
exterior / ccw holes, opposite of OGC), geometry kinds, typed fields,
write->read roundtrip. Reference: GDAL's ESRIJSON driver reached through
st_read.cpp's dispatch; format per the public ArcGIS REST spec."""

import json

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources import st_read, st_write
from duckdb_spatial_spark.sources.esrijson import read_esrijson, write_esrijson


def test_read_rings_organized_by_winding(spark, tmp_path):
    """A cw shell with a ccw hole -> polygon with hole; two cw shells ->
    multipolygon; an orphan ccw ring -> promoted to its own shell."""
    doc = {
        "geometryType": "esriGeometryPolygon",
        "fields": [{"name": "id", "type": "esriFieldTypeInteger"}],
        "features": [
            {  # shell (cw) + hole (ccw) inside it
                "attributes": {"id": 1},
                "geometry": {"rings": [
                    [[0, 0], [0, 10], [10, 10], [10, 0], [0, 0]],   # cw
                    [[2, 2], [4, 2], [4, 4], [2, 4], [2, 2]],       # ccw
                ]},
            },
            {  # two separate cw shells
                "attributes": {"id": 2},
                "geometry": {"rings": [
                    [[0, 0], [0, 1], [1, 1], [1, 0], [0, 0]],
                    [[5, 5], [5, 6], [6, 6], [6, 5], [5, 5]],
                ]},
            },
        ],
    }
    p = str(tmp_path / "r.esrijson")
    json.dump(doc, open(p, "w"))
    out = read_esrijson(spark, p).selectExpr(
        "id",
        "ST_GeometryType(geom) AS t",
        "round(ST_Area(geom), 6) AS area",
        "CAST(ST_NInteriorRings(geom) AS INT) AS holes",
    ).collect()
    rows = {r.id: r for r in out}
    assert rows[1].t == "POLYGON" and rows[1].area == 96.0 and rows[1].holes == 1
    assert rows[2].t == "MULTIPOLYGON" and rows[2].area == 2.0


def test_roundtrip_all_kinds(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "a", "POINT (3 4)"),
            (2, "b", "LINESTRING (0 0, 2 2, 4 0)"),
            (3, "c", "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
            (4, "d", "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"),
            (5, "e", "MULTIPOINT (1 1, 2 2)"),
            (6, "f", None),
        ],
        "id long, name string, wkt string",
    ).selectExpr("id", "name", "ST_GeomFromText(wkt) AS geom")
    p = str(tmp_path / "rt.esrijson")
    # mixed geometry kinds are not a FeatureSet concept; write per-kind
    for kind, ids in (("poly", (3, 4)), ("line", (2,)), ("pt", (1, 5, 6))):
        path = str(tmp_path / f"{kind}.esrijson")
        st_write(df.filter(F.col("id").isin(list(ids))), path, format="esrijson")
        back = st_read(spark, path)
        got = {
            r.id: (r.name, r.wkt)
            for r in back.selectExpr("id", "name", "ST_AsText(geom) AS wkt").collect()
        }
        want = {
            r.id: (r.name, r.wkt)
            for r in df.filter(F.col("id").isin(list(ids)))
            .selectExpr("id", "name", "ST_AsText(ST_Normalize(geom)) AS wkt")
            .collect()
        }
        for i in ids:
            assert got[i][0] == want[i][0]
            if i == 6:
                assert got[i][1] is None or got[i][1] == "POINT EMPTY"
                continue
            # normalize both sides: ring winding differs by convention
            norm = {
                r.id: r.w
                for r in back.selectExpr(
                    "id", "ST_AsText(ST_Normalize(geom)) AS w"
                ).collect()
            }
            assert norm[i] == want[i][1], i


def test_st_read_meta_header_only(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read_meta

    df = spark.createDataFrame([(1, 2.0)], "id long, v double").selectExpr(
        "id", "ST_Point(v, v) AS geom"
    )
    p = str(tmp_path / "m.esrijson")
    st_write(df, p, format="esrijson")
    r = st_read_meta(spark, p).collect()[0]
    assert r.driver == "ESRIJSON" and r.feature_count == 1
    assert r.geometry_types == "Point" and r.crs == "EPSG:4326"


def test_typed_fields_and_st_read_options(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"n{i}", float(i) / 2, float(5 * (i - 1))) for i in range(1, 7)],
        "id long, name string, score double, v double",
    ).selectExpr("id", "name", "score", "ST_Point(v, v) AS geom")
    p = str(tmp_path / "opts.esrijson")
    st_write(df, p, format="esrijson")
    back = st_read(spark, p)
    assert dict(back.dtypes)["id"] == "bigint"
    assert dict(back.dtypes)["score"] == "double"
    # the uniform bbox=/columns= contract applies
    win = st_read(spark, p, bbox=(4, 4, 16, 16), columns=["id"])
    assert {r.id for r in win.collect()} == {2, 3, 4}
    assert set(win.columns) == {"id", "geom"}
