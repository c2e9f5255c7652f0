"""GeoPackage source tests: round-trip through our writer, plus a
hand-built externally-shaped .gpkg (envelope variants, empty flag, NULL
geometry) per the OGC 12-128r19 binary layout the reference reads via GDAL
(``test/sql/gdal``)."""

import sqlite3
import struct

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import udfs
from duckdb_spatial_spark.sources import gpkg_layers, read_gpkg, write_gpkg
from duckdb_spatial_spark.sources.gpkg import make_gp_header, strip_gp_header


def _pt_wkb(x, y):
    return b"\x01\x01\x00\x00\x00" + struct.pack("<dd", x, y)


def test_gp_header_codec():
    wkb = _pt_wkb(3.5, -7.25)
    assert strip_gp_header(make_gp_header(wkb, 4326)) == wkb
    assert strip_gp_header(make_gp_header(wkb, 4326, (3.5, -7.25, 3.5, -7.25))) == wkb
    assert strip_gp_header(None) is None
    assert strip_gp_header(b"XX" + b"\x00" * 10) is None
    # empty-geometry flag
    hdr = bytearray(make_gp_header(wkb, 4326))
    hdr[3] |= 0x10
    assert strip_gp_header(bytes(hdr)) is None
    # extended encoding flag
    hdr = bytearray(make_gp_header(wkb, 4326))
    hdr[3] |= 0x20
    assert strip_gp_header(bytes(hdr)) is None


def test_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "rt.gpkg")
    df = (
        spark.range(100)
        .select(
            F.col("id"),
            (F.col("id") % 10).cast("double").alias("x"),
            (F.col("id") % 7).cast("double").alias("y"),
            F.concat(F.lit("name"), F.col("id")).alias("tag"),
        )
        .withColumn("geom", udfs.st_point("x", "y"))
        .drop("x", "y")
    )
    write_gpkg(df, path, layer="pts")

    layers = gpkg_layers(path)
    assert [l["table"] for l in layers] == ["pts"]
    assert layers[0]["srs_id"] == 4326

    back = read_gpkg(spark, path, num_partitions=4)
    assert back.count() == 100
    rows = {r.id: r for r in back.collect()}
    assert rows[42].tag == "name42"
    got = udfs_xy(spark, back)
    assert got[42] == (2.0, 0.0)  # 42%10, 42%7


def udfs_xy(spark, df):
    out = df.select("id", udfs.st_x("geom").alias("x"), udfs.st_y("geom").alias("y")).collect()
    return {r.id: (r.x, r.y) for r in out}


def test_external_gpkg_variants(spark, tmp_path):
    """A .gpkg not written by us: mixed envelope indicators, a NULL geometry,
    an empty-flag geometry, and big-endian-flagged headers must all read."""
    path = str(tmp_path / "ext.gpkg")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY, data_type TEXT, identifier TEXT, srs_id INTEGER)")
    con.execute("CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)")
    con.execute("INSERT INTO gpkg_contents VALUES ('roads', 'features', 'roads', 4326)")
    con.execute("INSERT INTO gpkg_contents VALUES ('lookup', 'attributes', 'lookup', NULL)")
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('roads', 'geometry', 'POINT', 4326, 0, 0)")
    con.execute("CREATE TABLE roads (fid INTEGER PRIMARY KEY, name TEXT, speed REAL, geometry BLOB)")
    con.execute("CREATE TABLE lookup (k TEXT)")

    no_env = b"GP\x00\x01" + struct.pack("<i", 4326) + _pt_wkb(1.0, 2.0)
    xy_env = (
        b"GP\x00\x03" + struct.pack("<i", 4326)
        + struct.pack("<4d", 3.0, 3.0, 4.0, 4.0) + _pt_wkb(3.0, 4.0)
    )
    xyzm_env = (
        b"GP\x00" + bytes([0x01 | (4 << 1)]) + struct.pack("<i", 4326)
        + struct.pack("<8d", 5.0, 5.0, 6.0, 6.0, 0.0, 0.0, 0.0, 0.0) + _pt_wkb(5.0, 6.0)
    )
    empty_flag = b"GP\x00" + bytes([0x01 | 0x10]) + struct.pack("<i", 4326)
    rows = [
        (1, "a", 30.0, no_env),
        (2, "b", 50.0, xy_env),
        (3, "c", None, xyzm_env),
        (4, "d", 70.0, None),
        (5, "e", 90.0, empty_flag),
    ]
    con.executemany("INSERT INTO roads VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()

    assert [l["table"] for l in gpkg_layers(path)] == ["roads"]  # attributes table excluded
    df = read_gpkg(spark, path, layer="roads", num_partitions=3)
    got = {r.fid: r for r in df.collect()}
    assert len(got) == 5
    assert got[4].geometry is None and got[5].geometry is None
    assert strip_gp_header(None) is None
    xy = {
        fid: (r.x, r.y)
        for fid, r in {
            r.fid: r
            for r in df.filter(F.col("geometry").isNotNull())
            .select("fid", udfs.st_x("geometry").alias("x"), udfs.st_y("geometry").alias("y"))
            .collect()
        }.items()
    }
    assert xy == {1: (1.0, 2.0), 2: (3.0, 4.0), 3: (5.0, 6.0)}
    assert got[2].speed == 50.0 and got[3].speed is None


def test_missing_layer_raises(spark, tmp_path):
    path = str(tmp_path / "rt2.gpkg")
    df = spark.range(3).withColumn("geom", udfs.st_point(F.lit(1.0), F.lit(2.0)))
    write_gpkg(df, path, layer="pts")
    with pytest.raises(ValueError):
        read_gpkg(spark, path, layer="nope")


# ---------------------------------------------------------------------------
# SpatiaLite (sources/spatialite.py — BLOB-Geometry format, stdlib sqlite3)
# ---------------------------------------------------------------------------

def test_spatialite_roundtrip(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read
    from duckdb_spatial_spark.sources.spatialite import (
        read_spatialite,
        spatialite_layers,
        write_spatialite,
    )

    df = spark.sql(
        """
        SELECT id, concat('nm', CAST(id AS STRING)) AS name,
               CAST(id AS DOUBLE) / 4 AS score,
               CASE WHEN id % 4 = 0 THEN ST_Point(CAST(id AS DOUBLE), 1.5D)
                    WHEN id % 4 = 1 THEN ST_GeomFromText('LINESTRING (0 0, 2 2, 4 0)')
                    WHEN id % 4 = 2 THEN ST_MakeEnvelope(0.0D, 0.0D, CAST(id AS DOUBLE), 2.0D)
                    ELSE NULL END AS geom
        FROM range(20)
        """
    )
    p = str(tmp_path / "db.sqlite")
    write_spatialite(df, p, layer="feats", srid=4326)
    assert spatialite_layers(p) == [{"table": "feats", "geom_col": "geom", "srid": 4326}]
    back = read_spatialite(spark, p)
    back.createOrReplaceTempView("_sl")
    rows = {
        r.id: r
        for r in spark.sql(
            "SELECT id, name, score, ST_AsText(geom) AS wkt FROM _sl"
        ).collect()
    }
    assert len(rows) == 20
    assert rows[4].wkt == "POINT (4 1.5)" and rows[4].score == 1.0
    assert rows[1].wkt == "LINESTRING (0 0, 2 2, 4 0)"
    assert rows[2].wkt == "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))"
    assert rows[3].wkt is None
    # extension dispatch
    assert st_read(spark, p).count() == 20


def test_spatialite_blob_big_endian_and_markers(tmp_path):
    import struct

    from duckdb_spatial_spark.geo import wkb as WKB, wkt as W
    from duckdb_spatial_spark.sources.spatialite import splite_to_wkb

    # hand-build a big-endian BLOB: POINT (3 4), srid 31370
    blob = bytes([0x00, 0x00]) + struct.pack(">i", 31370)
    blob += struct.pack(">4d", 3, 4, 3, 4) + bytes([0x7C])
    blob += struct.pack(">i", 1) + struct.pack(">2d", 3, 4) + bytes([0xFE])
    assert W.to_wkt(WKB.from_wkb(splite_to_wkb(blob))) == "POINT (3 4)"
    # corrupt END marker -> loud failure
    import pytest as _pytest

    with _pytest.raises(ValueError, match="END marker"):
        splite_to_wkb(blob[:-1] + b"\x00")
