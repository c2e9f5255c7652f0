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
