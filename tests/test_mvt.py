"""Mapbox Vector Tile codec: geometry-family roundtrips, the spec's
command/zigzag encoding, ring-winding normalization, typed Value oneof,
tile quantization math.

Layout per the public Mapbox Vector Tile Specification 2.1 (GDAL MVT
driver analog; reference reaches it via the st_read.cpp format tail).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geo import wkb as WKB
from duckdb_spatial_spark.geo.wkt import from_wkt, to_wkt


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, n, v, b, WKB.to_wkb(from_wkt(w))) for i, (n, v, b, w) in enumerate(rows)],
        "fid long, name string, score double, flag boolean, geom binary",
    )


def test_mvt_roundtrip_families(spark, tmp_path):
    from duckdb_spatial_spark.sources.mvt import read_mvt, write_mvt

    rows = [
        ("pt", 1.5, True, "POINT (100 200)"),
        ("mpt", 2.0, False, "MULTIPOINT (10 10, 20 30)"),
        ("ln", 0.25, True, "LINESTRING (0 0, 50 50, 100 0)"),
        ("mln", -3.5, False, "MULTILINESTRING ((0 0, 10 0), (20 20, 30 40, 50 20))"),
        ("pg", 7.0, True, "POLYGON ((0 0, 100 0, 100 100, 0 100, 0 0))"),
        (
            "pgh", 8.0, False,
            "POLYGON ((0 0, 80 0, 80 80, 0 80, 0 0), (20 20, 40 20, 40 40, 20 40, 20 20))",
        ),
        (
            "mpg", 9.0, True,
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)), ((200 200, 260 200, 260 260, 200 260, 200 200)))",
        ),
    ]
    df = _df(spark, rows)
    p = str(tmp_path / "t.mvt")
    n = write_mvt(df, p, extent=4096, layer="roads")
    assert n == len(rows)
    back = read_mvt(spark, p)
    got = {r.name: r for r in back.collect()}
    assert set(got) == {r[0] for r in rows}
    from duckdb_spatial_spark.geo import algorithms as A

    for i, (name, score, flag, wkt) in enumerate(rows):
        r = got[name]
        assert r.layer == "roads" and r.score == score and r.flag == flag
        # integer inputs < extent survive quantization exactly; ring
        # winding/start are MVT-normalized (tile y points down), so
        # compare canonical forms
        assert to_wkt(A.normalize(WKB.from_wkb(bytes(r.geom)))) == to_wkt(
            A.normalize(from_wkt(wkt))
        )


def test_mvt_quantization_and_bbox(spark, tmp_path):
    from duckdb_spatial_spark.sources.mvt import read_mvt, write_mvt

    # world bbox 0..1000 over a 4096 extent: resolution 1000/4096
    df = spark.createDataFrame(
        [(0, WKB.to_wkb(from_wkt("POINT (123.456 789.012)")))], "fid long, geom binary"
    )
    p = str(tmp_path / "q.mvt")
    write_mvt(df, p, bbox=(0, 0, 1000, 1000), extent=4096)
    r = read_mvt(spark, p, bbox=(0, 0, 1000, 1000)).collect()[0]
    g = WKB.from_wkb(bytes(r.geom))
    ext = 4096
    qx = np.floor(123.456 / 1000 * ext + 0.5) / ext * 1000
    qy = 1000 - np.floor((1000 - 789.012) / 1000 * ext + 0.5) / ext * 1000
    assert float(g.data[0]) == pytest.approx(qx, abs=1e-9)
    assert float(g.data[1]) == pytest.approx(qy, abs=1e-9)


def test_mvt_winding_normalized(spark, tmp_path):
    """Writer must emit spec winding regardless of input ring order, and
    the reader groups rings into polygons by the winding sign."""
    from duckdb_spatial_spark.sources.mvt import read_mvt, write_mvt
    from duckdb_spatial_spark.geo import algorithms as A

    # exterior given CW (OGC-reversed), hole given CCW — both get fixed
    wkt = "POLYGON ((0 0, 0 50, 50 50, 50 0, 0 0), (10 10, 20 10, 20 20, 10 20, 10 10))"
    df = spark.createDataFrame([(0, WKB.to_wkb(from_wkt(wkt)))], "fid long, geom binary")
    p = str(tmp_path / "w.mvt")
    write_mvt(df, p)
    g = WKB.from_wkb(bytes(read_mvt(spark, p).collect()[0].geom))
    assert g.tag == 3 and len(g.data) == 2  # polygon, shell + hole
    assert A.area(g) == pytest.approx(50 * 50 - 10 * 10)


def test_mvt_st_read_st_write_dispatch(spark, tmp_path):
    from duckdb_spatial_spark.functions import udfs
    from duckdb_spatial_spark.sources import st_read, st_write

    df = (
        spark.range(20)
        .select(
            F.col("id"),
            udfs.st_point(
                (F.col("id") * 13 % 400).cast("double"),
                (F.col("id") * 29 % 400).cast("double"),
            ).alias("geom"),
        )
    )
    p = str(tmp_path / "d.mvt")
    st_write(df, p)
    back = st_read(spark, p)
    assert back.count() == 20
    # uniform bbox= option stays a FILTER (tile georeference is tile_bounds=)
    sub = st_read(spark, p, bbox=(0, 0, 100, 100), columns=["id"])
    assert 0 < sub.count() < 20 and set(sub.columns) == {"id", "geom"}


def test_mvt_value_dedup(tmp_path, spark):
    """Repeated attribute values share one Value-table slot."""
    from duckdb_spatial_spark.sources.mvt import write_mvt, _parse_layer, _read_uvarint

    df = spark.createDataFrame(
        [(i, "same", WKB.to_wkb(from_wkt(f"POINT ({i} {i})"))) for i in range(10)],
        "fid long, tagv string, geom binary",
    )
    p = str(tmp_path / "v.mvt")
    write_mvt(df, p)
    buf = open(p, "rb").read()
    key, pos = _read_uvarint(buf, 0)
    n, pos = _read_uvarint(buf, pos)
    lay = _parse_layer(buf[pos : pos + n])
    assert lay["values"].count("same") == 1
    assert len(lay["features"]) == 10 and lay["extent"] == 4096


def test_mvt_meta(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read_meta
    from duckdb_spatial_spark.sources.mvt import write_mvt

    df = spark.createDataFrame(
        [(i, WKB.to_wkb(from_wkt(f"POINT ({i} {i})"))) for i in range(7)],
        "fid long, geom binary",
    )
    p = str(tmp_path / "m.mvt")
    write_mvt(df, p, layer="pois")
    r = st_read_meta(spark, p).collect()[0]
    assert r.driver == "MVT" and r.feature_count == 7 and r.file.endswith(":pois")
