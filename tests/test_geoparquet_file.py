"""Spec-1.0 GeoParquet single-file sink: the 'geo' footer key, primary-
column aliasing on read, header-only metadata, cross-engine footer check
through DuckDB's parquet_kv_metadata()."""

import json

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geo import wkb as WKB
from duckdb_spatial_spark.geo.wkt import from_wkt


def _df(spark):
    rows = [
        (0, "POINT (10 20)"),
        (1, "LINESTRING (0 0, 5 5)"),
        (2, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"),
        (3, None),
    ]
    return spark.createDataFrame(
        [(i, WKB.to_wkb(from_wkt(w)) if w else None) for i, w in rows],
        "fid long, the_geom binary",
    )


def test_geo_key_written_and_read(spark, tmp_path):
    from duckdb_spatial_spark.sources.geoparquet import read_geo_key, write_geoparquet_file

    p = str(tmp_path / "f.parquet")
    n = write_geoparquet_file(_df(spark), p, geom_col="the_geom", crs="EPSG:4326")
    assert n == 4
    gk = read_geo_key(p)
    assert gk["version"] == "1.0.0" and gk["primary_column"] == "the_geom"
    col = gk["columns"]["the_geom"]
    assert col["encoding"] == "WKB"
    assert col["geometry_types"] == ["LineString", "Point", "Polygon"]
    assert col["bbox"] == [0.0, 0.0, 10.0, 20.0]
    assert col["crs"] == "EPSG:4326"


def test_duckdb_sees_geo_key(spark, tmp_path):
    """Cross-engine: DuckDB's parquet reader surfaces the same footer key
    (this is exactly how the reference's parquet lane detects GeoParquet)."""
    import duckdb

    from duckdb_spatial_spark.sources.geoparquet import write_geoparquet_file

    p = str(tmp_path / "d.parquet")
    write_geoparquet_file(_df(spark), p, geom_col="the_geom")
    kv = duckdb.connect().execute(
        "SELECT key, value FROM parquet_kv_metadata(?)", [p]
    ).fetchall()
    geo = {bytes(k).decode(): v for k, v in kv}.get("geo")
    assert geo is not None
    doc = json.loads(bytes(geo).decode())
    assert doc["primary_column"] == "the_geom"
    # and DuckDB reads the rows themselves fine
    assert duckdb.connect().execute(
        f"SELECT count(*) FROM '{p}'"
    ).fetchone()[0] == 4


def test_st_read_renames_primary_column(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read, st_write

    p = str(tmp_path / "r.parquet")
    st_write(_df(spark), p, format="geoparquet", file=True, geom_col="the_geom")
    back = st_read(spark, p)
    assert "geom" in back.columns and "the_geom" not in back.columns
    assert back.count() == 4
    # uniform bbox filter works against the aliased column
    assert st_read(spark, p, bbox=(9, 19, 11, 21)).count() == 1


def test_geoparquet_meta_header_only(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read_meta, st_write

    p = str(tmp_path / "m.parquet")
    st_write(_df(spark), p, format="geoparquet", file=True,
             geom_col="the_geom", crs="EPSG:3857")
    r = st_read_meta(spark, p).collect()[0]
    assert r.driver == "GeoParquet" and r.feature_count == 4
    assert r.geometry_types == "LineString,Point,Polygon"
    assert r.crs == "EPSG:3857"


def test_single_file_guard(spark, tmp_path):
    from duckdb_spatial_spark.sources.geoparquet import write_geoparquet_file

    with pytest.raises(ValueError, match="single-file sink"):
        write_geoparquet_file(
            _df(spark), str(tmp_path / "g.parquet"), geom_col="the_geom", max_rows=2
        )


def test_geoparquet_crs_tag_flows_to_transform(spark, tmp_path):
    """r13: the geo footer's column crs surfaces as the geom metadata tag
    (string form and PROJJSON-id form) and drives st_transform_tagged."""
    import json

    import pyarrow.parquet as pq

    from duckdb_spatial_spark.functions import register_all
    from duckdb_spatial_spark.functions.crs import geom_crs, st_transform_tagged
    from duckdb_spatial_spark.sources import st_read
    from duckdb_spatial_spark.sources.geoparquet import write_geoparquet_file

    register_all(spark)
    df = spark.createDataFrame(
        [(1, -0.1276, 51.5072)], "id long, lon double, lat double"
    ).selectExpr("id", "ST_AsWKB(ST_Point(lon, lat)) AS geom")
    p1 = str(tmp_path / "s.parquet")
    write_geoparquet_file(df, p1, crs="EPSG:4326")
    back = st_read(spark, p1)
    assert geom_crs(back) == "EPSG:4326"
    row = (
        st_transform_tagged(back, "EPSG:3857")
        .selectExpr("round(ST_X(geom), 3) AS x").first()
    )
    import math
    assert abs(row.x - round(6378137.0 * math.radians(-0.1276), 3)) < 1e-3

    # PROJJSON dict crs (spec GeoParquet) reduces to authority:code
    pf = pq.read_table(p1)
    geo = json.loads(pf.schema.metadata[b"geo"])
    geo["columns"]["geom"]["crs"] = {
        "type": "GeographicCRS", "name": "WGS 84",
        "id": {"authority": "EPSG", "code": 4326},
    }
    meta = dict(pf.schema.metadata)
    meta[b"geo"] = json.dumps(geo).encode()
    p2 = str(tmp_path / "pj.parquet")
    pq.write_table(pf.replace_schema_metadata(meta), p2)
    assert geom_crs(st_read(spark, p2)) == "EPSG:4326"
