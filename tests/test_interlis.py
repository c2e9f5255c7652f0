"""INTERLIS 1 source (sources/interlis.py): ITF framing, OBJE value
lists ('@' nulls, CONT continuation), STPT/LIPT/ARCP/ELIN sequences,
write->read round trip, directory read, dispatch."""

import math

import pytest

from duckdb_spatial_spark.functions import register_all
from duckdb_spatial_spark.sources import st_read, st_write
from duckdb_spatial_spark.sources.interlis import (
    parse_itf, read_interlis, write_interlis,
)


def _write(tmp_path, body, name="t.itf"):
    p = tmp_path / name
    p.write_text(body, encoding="utf-8")
    return str(p)


def test_parse_framing_nulls_and_cont(tmp_path):
    p = _write(tmp_path, """SCNT
 free comment, ignored
////
MTID INTERLIS1
MODL Roads
TOPI RoadsTopic
TABL Street
OBJE 1 Main @ 50
CONT asphalt
OBJE 2 Side 30 40
ETAB
TABL Segment
OBJE 3 1
STPT 0 0
LIPT 3 4
ELIN
ETAB
ETOP
EMOD
ENDE
""")
    meta, feats = parse_itf(p)
    assert meta["mtid"] == "INTERLIS1" and meta["model"] == "Roads"
    by_tid = {f["tid"]: f for f in feats}
    assert by_tid[1]["table"] == "Street"
    assert by_tid[1]["attrs"] == ["Main", None, "50", "asphalt"]
    assert by_tid[1]["geom"] is None
    assert by_tid[2]["attrs"] == ["Side", "30", "40"]
    seg = by_tid[3]
    assert seg["topic"] == "RoadsTopic" and seg["table"] == "Segment"
    pts = [list(pt) for pt in seg["geom"].data]
    assert pts == [[0.0, 0.0], [3.0, 4.0]]


def test_arcp_strokes_circumcircle(tmp_path):
    """ARCP between STPT and LIPT strokes the circular arc through the
    three points with exact endpoints (quarter circle r=10)."""
    p = _write(tmp_path, """MTID INTERLIS1
MODL M
TOPI T
TABL Arc
OBJE 1
STPT 10 0
ARCP 7.0710678 7.0710678
LIPT 0 10
ELIN
ETAB
ETOP
EMOD
ENDE
""")
    _, feats = parse_itf(p)
    pts = [list(pt) for pt in feats[0]["geom"].data]
    assert pts[0] == [10.0, 0.0] and pts[-1] == [0.0, 10.0]
    assert len(pts) > 5  # stroked, not the 3 raw points
    for x, y in pts:
        assert abs(math.hypot(x, y) - 10.0) < 0.01


def test_roundtrip_multiline_polygon_and_nulls(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame(
        [(10, "A", "POINT (2.5 3.25)"),
         (20, None, "LINESTRING (0 0, 5 0, 5 7)"),
         (30, "C", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))"),
         (40, "D", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")],
        "fid long, nm string, wkt string",
    ).selectExpr("fid", "nm", "ST_AsWKB(ST_GeomFromText(wkt)) AS geom")
    p = str(tmp_path / "rt.itf")
    write_interlis(df, p, tid_col="fid", attrs=["nm"],
                   model="M", topic="T", table="Feat")
    back = read_interlis(spark, p)
    rows = {r.tid: r for r in back.selectExpr(
        "tid", "attrs[0] AS nm", "ST_GeometryType(geom) AS t",
        "ST_NPoints(geom) AS n", "round(ST_Length(geom), 6) AS l",
    ).collect()}
    assert rows[10].t == "POINT" and rows[10].nm == "A"
    assert rows[20].t == "LINESTRING" and rows[20].l == 12.0
    assert rows[20].nm is None  # '@' round-trips to null
    assert rows[30].t == "MULTILINESTRING" and rows[30].n == 4
    # polygon rings write as boundary sequences (the ITF area-boundary
    # convention); a single ring reads back as one closed linestring
    assert rows[40].t == "LINESTRING" and rows[40].n == 5


def test_dispatch_and_directory(spark, tmp_path):
    register_all(spark)
    for i in range(3):
        df = spark.createDataFrame([(i,)], "id long").selectExpr(
            f"ST_AsWKB(ST_MakeLine(ARRAY(ST_Point({i}.0, 0.0),"
            f" ST_Point({i}.0, 1.0)))) AS geom")
        st_write(df, str(tmp_path / f"f{i}.itf"))
    back = st_read(spark, str(tmp_path), format="interlis")
    assert back.count() == 3
    # extension sniffing + allowed_drivers alias
    one = st_read(spark, str(tmp_path / "f0.itf"),
                  allowed_drivers=["Interlis 1"])
    assert one.count() == 1


def test_unsupported_geometry_refused(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Collect(ARRAY(ST_Point(1.0, 2.0)))) AS geom")
    with pytest.raises(ValueError, match="unsupported geometry"):
        write_interlis(df, str(tmp_path / "x.itf"))
