"""SOSI source (sources/sosi.py): dot-hierarchy parsing, ORIGO/ENHET
scaling, FLATE ring assembly from KURVE refs (reversed + holes), NØH
heights, charsets, KOORDSYS CRS tag, write->read round trip."""

import pytest

from duckdb_spatial_spark.functions import register_all
from duckdb_spatial_spark.functions.crs import geom_crs
from duckdb_spatial_spark.sources import st_read, st_write
from duckdb_spatial_spark.sources.sosi import parse_sosi, read_sosi, write_sosi


def _write(tmp_path, body, name="t.sos", encoding="utf-8"):
    p = tmp_path / name
    p.write_bytes(body.encode(encoding))
    return str(p)


HEAD = """.HODE
..TEGNSETT UTF-8
..TRANSPAR
...KOORDSYS 22
...ORIGO-NØ 6000000 500000
...ENHET 0.01
..OMRÅDE
...MIN-NØ 0 0
...MAX-NØ 100000000 100000000
..SOSI-VERSJON 4.5
"""


def test_parse_origo_enhet_and_attrs(tmp_path):
    p = _write(tmp_path, HEAD + """.PUNKT 1:
..OBJTYPE Flyplass
..NAVN Gardermoen
..NØ
1000 2000
.SLUTT
""")
    meta, feats = parse_sosi(p)
    assert meta["epsg"] == 25832 and meta["enhet"] == 0.01
    f = feats[0]
    assert f["objtype"] == "Flyplass" and f["attrs"]["NAVN"] == "Gardermoen"
    # x = origo_e + e*enhet, y = origo_n + n*enhet (NØ order: north first)
    assert list(f["geom"].data) == [500000 + 2000 * 0.01, 6000000 + 1000 * 0.01]


def test_flate_reversed_refs_and_hole(tmp_path):
    p = _write(tmp_path, HEAD + """.KURVE 1:
..NØ
0 0
0 1000
.KURVE 2:
..NØ
0 0
1000 0
1000 1000
0 1000
.KURVE 3:
..NØ
200 200
200 400
400 400
400 200
200 200
.FLATE 9:
..OBJTYPE Innsjø
..REF :1 :-2 (:3)
..NØ
500 500
.SLUTT
""")
    _, feats = parse_sosi(p)
    fl = [f for f in feats if f["kind"] == "FLATE"][0]
    g = fl["geom"]
    assert g.tag == 3 and len(g.data) == 2  # shell + hole
    # :-2 reverses KURVE 2 so its last vertex (0,1000) chains onto
    # KURVE 1's end; the shared vertex dedups -> a closed 5-point ring
    shell = [list(pt) for pt in g.data[0]]
    assert shell[0] == shell[-1] and len(shell) == 5
    hole = [list(pt) for pt in g.data[1]]
    assert len(hole) == 5


def test_noh_heights_and_iso8859(tmp_path):
    body = HEAD.replace("UTF-8", "ISO8859-1") + """.KURVE 4:
..OBJTYPE Vannvei
..NØH
0 0 120
1000 1000 130
.SLUTT
"""
    p = _write(tmp_path, body, encoding="latin-1")
    _, feats = parse_sosi(p)
    g = feats[0]["geom"]
    assert g.has_z and [round(c, 6) for c in g.data[0]][2] == 120.0
    assert feats[0]["objtype"] == "Vannvei"


def test_roundtrip_and_crs_tag(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame(
        [(1, "A", "POINT (10.5 60.25)"),
         (2, "B", "LINESTRING (10 60, 11 61)"),
         (3, "C", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")],
        "id long, typ string, wkt string",
    ).selectExpr("id", "typ", "ST_AsWKB(ST_GeomFromText(wkt)) AS geom")
    p = str(tmp_path / "rt.sos")
    st_write(df, p, objtype_col="typ", koordsys=23, enhet=0.000001,
             attrs=["id"])
    back = st_read(spark, p)
    assert geom_crs(back) == "EPSG:25833"
    rows = {r.objtype: r for r in back.selectExpr(
        "objtype", "kind", "ST_AsText(geom) AS wkt",
        "attrs['ID'] AS fid").collect() if r.objtype}
    assert rows["A"].wkt == "POINT (10.5 60.25)" and rows["A"].fid == "1"
    assert rows["B"].kind == "KURVE"
    assert rows["C"].kind == "FLATE"
    assert "POLYGON" in rows["C"].wkt and "(1 1" in rows["C"].wkt
    # uniform bbox= / columns= contract
    assert st_read(spark, p, bbox=(10.4, 60.2, 10.6, 60.3),
                   columns=["objtype"]).columns == ["objtype", "geom"]


def test_unsupported_geometry_refused(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Collect(ARRAY(ST_Point(1.0, 2.0)))) AS geom")
    with pytest.raises(ValueError, match="unsupported geometry"):
        write_sosi(df, str(tmp_path / "x.sos"))


def test_directory_read_distributed(spark, tmp_path):
    register_all(spark)
    for i in range(3):
        df = spark.createDataFrame([(i,)], "id long").selectExpr(
            f"ST_AsWKB(ST_Point({i}.0, {i}.0)) AS geom")
        write_sosi(df, str(tmp_path / f"f{i}.sos"))
    back = read_sosi(spark, str(tmp_path))
    assert back.count() == 3


def test_buep_arc_stroked(tmp_path):
    """BUEP (arc through three points) strokes a circumcircle polyline
    with exact endpoints; FLATE boundaries can reference it."""
    import math

    p = _write(tmp_path, """.HODE
..TEGNSETT UTF-8
..TRANSPAR
...ORIGO-NØ 0 0
...ENHET 1
.BUEP 1:
..OBJTYPE Kai
..NØ
0 100
100 0
0 -100
.KURVE 2:
..NØ
0 -100
0 100
.FLATE 3:
..REF :1 :2
..NØ
0 0
.SLUTT
""")
    _, feats = parse_sosi(p)
    by_kind = {f["kind"]: f for f in feats}
    arc = by_kind["BUEP"]["geom"]
    pts = [list(q) for q in arc.data]
    assert pts[0] == [100.0, 0.0] and pts[-1] == [-100.0, 0.0]
    assert len(pts) == 38  # 180 deg at 5-deg steps + exact endpoints
    assert all(abs(math.hypot(x, y) - 100.0) < 1e-9 for x, y in pts)
    # the FLATE closes: stroked arc + the straight chord back
    fl = by_kind["FLATE"]["geom"]
    ring = [list(q) for q in fl.data[0]]
    assert ring[0] == ring[-1] and len(ring) == 39


def test_tekst_element(tmp_path):
    """TEKST elements read as text points; the STRENG value lands in the
    attrs map (GDAL's SOSI driver exposes the same)."""
    p = _write(tmp_path, """.HODE
..TEGNSETT UTF-8
..TRANSPAR
...ORIGO-NØ 0 0
...ENHET 0.5
.TEKST 7:
..OBJTYPE Stedsnavn
..STRENG Blåfjell
..NØ
100 200
.SLUTT
""")
    _, feats = parse_sosi(p)
    t = feats[0]
    assert t["kind"] == "TEKST" and t["attrs"]["STRENG"] == "Blåfjell"
    assert list(t["geom"].data) == [100.0, 50.0]  # e*0.5, n*0.5


def test_flate_split_shell_groups(tmp_path):
    """Exterior KURVE refs appearing AFTER a parenthesized hole group
    continue the SAME exterior chain — they are not a second shell and
    must not be dropped."""
    p = _write(tmp_path, HEAD + """.KURVE 1:
..NØ
0 0
0 1000
1000 1000
.KURVE 2:
..NØ
1000 1000
1000 0
0 0
.KURVE 3:
..NØ
200 200
200 400
400 400
400 200
200 200
.FLATE 9:
..REF :1 (:3) :2
..NØ
500 500
.SLUTT
""")
    _, feats = parse_sosi(p)
    fl = [f for f in feats if f["kind"] == "FLATE"][0]
    g = fl["geom"]
    assert g.tag == 3 and len(g.data) == 2  # one shell + one hole
    shell = [list(pt) for pt in g.data[0]]
    assert shell[0] == shell[-1] and len(shell) == 5  # full closed square
    # the (n=1000, e=0) corner comes only from KURVE 2 (the post-hole
    # shell group) — truncating to the first group would lose it
    assert [500000.0, 6000010.0] in shell


def test_mixed_koordsys_directory_untagged(spark, tmp_path):
    """A directory mixing UTM zones (KOORDSYS 22 vs 23) must not tag all
    rows with the first file's EPSG — the CRS tag is omitted instead."""
    register_all(spark)
    for i, ks in enumerate((22, 23)):
        df = spark.createDataFrame([(i,)], "id long").selectExpr(
            f"ST_AsWKB(ST_Point({i}.0, {i}.0)) AS geom")
        write_sosi(df, str(tmp_path / f"z{i}.sos"), koordsys=ks)
    back = read_sosi(spark, str(tmp_path))
    assert geom_crs(back) is None
    assert back.count() == 2
    # agreeing zones still tag
    for f in ("z0.sos", "z1.sos"):
        (tmp_path / f).unlink()
    for i in range(2):
        df = spark.createDataFrame([(i,)], "id long").selectExpr(
            f"ST_AsWKB(ST_Point({i}.0, {i}.0)) AS geom")
        write_sosi(df, str(tmp_path / f"u{i}.sos"), koordsys=23)
    assert geom_crs(read_sosi(spark, str(tmp_path))) == "EPSG:25833"


def test_header_groups_raster_skip_and_shared_kurve(tmp_path):
    """SOSI depth residue (r16): DEF/DATO/SOSI-VERSJON/OMRÅDE header
    groups surface in meta, RASTER raw-data lines are skipped (counted
    in meta['skipped']), and two FLATEs share one boundary KURVE
    (forward / :-n reversed — the standard Kartverket shared-edge
    encoding) without the second losing its ring."""
    p = _write(tmp_path, """.HODE
..TEGNSETT UTF-8
..SOSI-VERSJON 4.5
..DATO 20240815
..TRANSPAR
...KOORDSYS 22
...ORIGO-NØ 0 0
...ENHET 0.01
..OMRÅDE
...MIN-NØ 0 0
...MAX-NØ 2000 2000
..DEF
...GRUPPE 1
.KURVE 1:
..NØ
0 1000
1000 1000
.KURVE 2:
..NØ
1000 1000
1000 0
0 0
0 1000
.KURVE 3:
..NØ
0 1000
0 2000
1000 2000
1000 1000
.FLATE 11:
..REF :1 :2
..NØ
500 500
.FLATE 12:
..REF :3 :-1
..NØ
500 1500
.RASTER 99:
..RASTER-DEL 1
1 2 3 4 5 6 7 8
.SLUTT
""")
    meta, feats = parse_sosi(p)
    assert meta["sosi_versjon"] == "4.5" and meta["dato"] == "20240815"
    assert meta["omrade"] == {"min": (0.0, 0.0), "max": (2000.0, 2000.0)}
    assert meta["skipped"] == {"RASTER": 1}
    fl = {f["id"]: f for f in feats if f["kind"] == "FLATE"}
    # both polygons assemble closed 5-point squares; the shared edge is
    # K1 forward in 11, reversed in 12 (raster data lines did not leak)
    for fid in (11, 12):
        ring = [list(pt) for pt in fl[fid]["geom"].data[0]]
        assert ring[0] == ring[-1] and len(ring) == 5
    xs11 = {pt[0] for pt in fl[11]["geom"].data[0]}
    xs12 = {pt[0] for pt in fl[12]["geom"].data[0]}
    assert xs11 == {0.0, 10.0} and xs12 == {10.0, 20.0}
