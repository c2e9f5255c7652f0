"""MapInfo MIF/MID reader + writer (GDAL "MapInfo File" driver analog;
the reference reaches it via ST_Read's GDAL dispatch, st_read.cpp)."""

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources import st_read
from duckdb_spatial_spark.sources.mapinfo import read_mif, write_mif


@pytest.fixture(scope="module")
def mixed(spark):
    return spark.sql(
        """
        SELECT id, concat('nm', CAST(id AS STRING)) AS name,
               CAST(id AS DOUBLE) / 4 AS score, id % 2 = 0 AS flag,
               CASE WHEN id % 3 = 0 THEN ST_Point(CAST(id AS DOUBLE), CAST(id*2 AS DOUBLE))
                    WHEN id % 3 = 1 THEN ST_MakeLine(array(
                        ST_Point(CAST(id AS DOUBLE), 0.0D), ST_Point(CAST(id+1 AS DOUBLE), 1.0D),
                        ST_Point(CAST(id+2 AS DOUBLE), 0.5D)))
                    ELSE ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0D, CAST(id+2 AS DOUBLE), 2.0D)
               END AS geom
        FROM range(18)
        """
    ).cache()


def _wkts(df):
    return {
        int(r.id): r.wkt
        for r in df.selectExpr("CAST(id AS LONG) AS id", "ST_AsText(geom) AS wkt").collect()
    }


def test_mif_roundtrip(spark, mixed, tmp_path):
    p = str(tmp_path / "rt.mif")
    write_mif(mixed, p)
    back = read_mif(spark, p)
    assert set(back.columns) == {"id", "name", "score", "flag", "geom"}
    assert _wkts(back) == _wkts(mixed)
    rows = {r.id: (r.name, r.score, r.flag) for r in back.collect()}
    want = {r.id: (r.name, r.score, r.flag) for r in mixed.collect()}
    assert rows == want
    # extension dispatch through st_read
    assert st_read(spark, p).count() == 18


def test_mif_polygon_with_hole_and_multi(spark, tmp_path):
    df = spark.sql(
        """
        SELECT 1 AS id, ST_GeomFromText(
          'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))') AS geom
        UNION ALL SELECT 2, ST_GeomFromText(
          'MULTIPOLYGON (((0 0, 3 0, 3 3, 0 3, 0 0)), ((20 20, 24 20, 24 24, 20 24, 20 20)))')
        """
    )
    p = str(tmp_path / "holes.mif")
    write_mif(df, p)
    back = read_mif(spark, p)
    back.createOrReplaceTempView("mif_holes")
    got = {
        r.id: (r.t, r.a)
        for r in spark.sql(
            "SELECT id, ST_GeometryType(geom) AS t, ST_Area(geom) AS a FROM mif_holes"
        ).collect()
    }
    # hole survives containment reassembly: 100 - 4
    assert got[1] == ("POLYGON", pytest.approx(96.0))
    # two disjoint shells come back as a multipolygon
    assert got[2] == ("MULTIPOLYGON", pytest.approx(9.0 + 16.0))


def test_mif_hand_written_with_styles(spark, tmp_path):
    """A MIF file as MapInfo itself writes it: CoordSys + styling clauses
    between objects, tab delimiter default, quoted strings in the MID."""
    mif = "\n".join(
        [
            "Version 300",
            'Charset "WindowsLatin1"',
            'Delimiter ","',
            "CoordSys Earth Projection 1, 104",
            "Columns 3",
            "  label Char(32)",
            "  n Integer",
            "  ok Logical",
            "Data",
            "Point 1 2",
            "    Symbol (34,0,12)",
            "Pline 3",
            "0 0",
            "1 1",
            "2 0",
            "    Pen (1,2,0)",
            "Region 1",
            "  4",
            "0 0",
            "5 0",
            "5 5",
            "0 0",
            "    Brush (2,16777215,16777215)",
            "None",
        ]
    )
    mid = "\n".join(['"a, with comma",7,T', '"b",8,F', '"c",9,T', '"d",,F'])
    (tmp_path / "h.mif").write_text(mif)
    (tmp_path / "h.mid").write_text(mid)
    back = read_mif(spark, str(tmp_path / "h.mif"))
    back.createOrReplaceTempView("mif_hand")
    rows = spark.sql(
        "SELECT label, n, ok, CASE WHEN geom IS NULL THEN '-' ELSE ST_GeometryType(geom) END AS t,"
        " CASE WHEN geom IS NULL THEN -1.0D ELSE ST_Area(geom) END AS a FROM mif_hand"
    ).collect()
    assert [(r.label, r.n, r.ok, r.t) for r in rows] == [
        ("a, with comma", 7, True, "POINT"),
        ("b", 8, False, "LINESTRING"),
        ("c", 9, True, "POLYGON"),
        ("d", None, False, "-"),
    ]
    assert rows[2].a == pytest.approx(12.5)


def test_mif_max_rows_guard(spark, tmp_path):
    df = spark.range(5).withColumn("geom", F.expr("ST_Point(CAST(id AS DOUBLE), 0.0D)"))
    with pytest.raises(ValueError, match="max_rows"):
        write_mif(df, str(tmp_path / "g.mif"), max_rows=3)


# ---------------------------------------------------------------------------
# TAB binary (sources/mapinfo_tab.py — MITAB-documented block layout)
# ---------------------------------------------------------------------------

from duckdb_spatial_spark.sources.mapinfo_tab import read_tab, write_tab


def test_tab_roundtrip_all_types(spark, tmp_path):
    rows = [
        (1, "pt", 1.5, "POINT (10.25 -3.5)"),
        (2, "ln2", 2.5, "LINESTRING (0 0, 5 5)"),
        (3, "pl", None, "LINESTRING (0 0, 1 2, 3 1, 4 4, 2 5)"),
        (4, "ml", 4.0, "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))"),
        (5, "poly", 5.25,
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
        (6, "none", 0.0, None),
    ]
    df = spark.createDataFrame(rows, "id long, name string, score double, wkt string")
    df = df.withColumn("geom", F.expr("ST_GeomFromText(wkt)")).drop("wkt")
    path = str(tmp_path / "rt.tab")
    write_tab(df, path)
    for ext in (".tab", ".dat", ".map", ".id"):
        assert (tmp_path / ("rt" + ext)).exists()
    back = read_tab(spark, path)
    back.createOrReplaceTempView("_tab_rt")
    got = {
        int(r.id): r
        for r in spark.sql(
            """SELECT id, name, score, ST_AsText(geom) AS wkt,
                      ST_GeometryType(geom) AS gt,
                      round(coalesce(ST_Area(geom), 0), 5) AS area,
                      round(coalesce(ST_Length(geom), 0), 5) AS length
               FROM _tab_rt"""
        ).collect()
    }
    assert got[1].gt == "POINT" and got[1].wkt.startswith("POINT")
    # int32 grid quantization <= half-resolution (~2.5e-6 here)
    import re

    x, y = map(float, re.findall(r"-?[\d.]+(?:e-?\d+)?", got[1].wkt))
    assert abs(x - 10.25) < 1e-4 and abs(y - -3.5) < 1e-4
    assert got[2].gt == "LINESTRING" and abs(got[2].length - 7.07107) < 1e-3
    assert got[3].gt == "LINESTRING" and got[3].score is None
    assert got[4].gt == "MULTILINESTRING"
    assert got[5].gt == "POLYGON" and abs(got[5].area - 96.0) < 1e-3
    assert got[6].wkt is None
    # attributes exact (typed .dat round trip)
    assert got[5].name == "poly" and got[5].score == 5.25


def test_tab_st_read_dispatch(spark, tmp_path):
    df = spark.sql("SELECT 1 AS id, ST_Point(3.0D, 4.0D) AS geom")
    path = str(tmp_path / "disp.tab")
    write_tab(df, path)
    assert st_read(spark, path).count() == 1


def test_tab_compressed_symbol_read(spark, tmp_path):
    """Hand-craft a .map with a compressed SYMBOL_C object (int16 deltas
    vs the object block center) — read-side support for MITAB's
    compressed point records."""
    import struct

    import numpy as np

    from duckdb_spatial_spark.sources.mapinfo_tab import (
        BLOCK, MAGIC, SYMBOL_C,
    )

    scale, displ = 1000.0, 0.0
    cx, cy = 5000, 7000  # block center in int coords = (5.0, 7.0) world
    rec = struct.pack("<Bi2hB", SYMBOL_C, 1, 250, -500, 1)  # +0.25, -0.5
    blk = bytearray(struct.pack("<BxH2i2i", 2, len(rec), cx, cy, 0, 0)) + rec
    hdr = bytearray(BLOCK)
    struct.pack_into("<i", hdr, 0x100, MAGIC)
    struct.pack_into("<2h", hdr, 0x104, 300, BLOCK)
    struct.pack_into("<4d", hdr, 0x140, scale, scale, displ, displ)
    idx = struct.pack("<Bxh", 1, 1) + struct.pack("<5i", 0, 0, 0, 0, 2 * BLOCK)
    with open(tmp_path / "c.map", "wb") as f:
        f.write(bytes(hdr) + idx.ljust(BLOCK, b"\0") + bytes(blk).ljust(BLOCK, b"\0"))
    with open(tmp_path / "c.id", "wb") as f:
        f.write(np.asarray([2 * BLOCK + 20], dtype="<i4").tobytes())
    # minimal one-column .dat (id N)
    fd = b"id".ljust(11, b"\0") + b"N" + b"\0" * 4 + bytes([10, 0]) + b"\0" * 14
    with open(tmp_path / "c.dat", "wb") as f:
        f.write(struct.pack("<4BI2H20x", 3, 24, 1, 1, 1, 32 + 32 + 1, 11))
        f.write(fd + b"\r" + b" " + b"1".rjust(10) + b"\x1a")
    with open(tmp_path / "c.tab", "w") as f:
        f.write("!table\n!version 300\nDefinition Table\n  Fields 1\n    id Integer ;\n")
    row = read_tab(spark, str(tmp_path / "c.tab")).collect()[0]
    from duckdb_spatial_spark.geo import wkb as WKB

    g = WKB.from_wkb(row.geom)
    assert abs(g.data[0] - 5.25) < 1e-9 and abs(g.data[1] - 6.5) < 1e-9


def test_tab_big_coord_payload_straddles_blocks(spark, tmp_path):
    """A polyline long enough that its coord payload spans several chained
    coord blocks — pins the header-skipping stream reader."""
    n = 400  # 400 pairs = 3200 bytes > 6 coord blocks
    pts = ", ".join(f"{i}.0 {(i * 3) % 97}.0" for i in range(n))
    df = spark.sql(f"SELECT 1 AS id, ST_GeomFromText('LINESTRING ({pts})') AS geom")
    path = str(tmp_path / "long.tab")
    write_tab(df, path)
    back = read_tab(spark, path).collect()[0]
    from duckdb_spatial_spark.geo import wkb as WKB

    g = WKB.from_wkb(back.geom)
    assert g.tag == 2 and len(g.data) == n
    assert abs(g.data[n - 1][0] - (n - 1)) < 1e-3


def test_tab_corrupt_files_fail_loudly(spark, tmp_path):
    import struct

    import pytest as _pytest

    from duckdb_spatial_spark.sources.mapinfo_tab import _MapFile, read_tab

    # bad magic
    bad = bytearray(512)
    struct.pack_into("<i", bad, 0x100, 123456)
    p = tmp_path / "bad.map"
    p.write_bytes(bytes(bad))
    with _pytest.raises(ValueError, match="bad .map magic"):
        _MapFile(str(p))
    # truncated header
    (tmp_path / "short.map").write_bytes(b"\x00" * 100)
    with _pytest.raises(ValueError, match="truncated"):
        _MapFile(str(tmp_path / "short.map"))
    # dataset without .dat
    (tmp_path / "lonely.tab").write_text("!table\n")
    with _pytest.raises(FileNotFoundError, match="no sibling .dat"):
        read_tab(spark, str(tmp_path / "lonely.tab"))


def test_tab_zip_archive_read(spark, tmp_path):
    """A zipped TAB dataset reads through the vfs localize path."""
    import zipfile

    from duckdb_spatial_spark.sources import st_read
    from duckdb_spatial_spark.sources.mapinfo_tab import write_tab

    df = spark.sql("SELECT id, ST_Point(CAST(id AS DOUBLE), 1.0D) AS geom FROM range(12)")
    write_tab(df, str(tmp_path / "z.tab"))
    zp = tmp_path / "bundle.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for ext in (".tab", ".dat", ".map", ".id"):
            z.write(tmp_path / ("z" + ext), "z" + ext)
    # bang spelling addresses the member; bare archive sniffs members
    assert st_read(spark, str(zp) + "!z.tab").count() == 12
    assert st_read(spark, str(zp)).count() == 12
