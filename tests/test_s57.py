"""S-57 ENC source (sources/s57.py): ISO 8211 container + S-57 feature
assembly round trips, edge node resolution, orientation, holes."""

import struct

import pytest

from duckdb_spatial_spark.functions import register_all
from duckdb_spatial_spark.sources import st_read, st_write
from duckdb_spatial_spark.sources.s57 import (
    RCNM_VC, RCNM_VE, _mk_record, parse_s57, read_s57, write_s57,
)


def test_roundtrip_point_line_polygon_hole(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,), (3,)], "id long").selectExpr(
        "CAST(id + 10 AS INT) AS objl",
        "CASE WHEN id = 1 THEN ST_AsWKB(ST_Point(12.5, -33.25))"
        " WHEN id = 2 THEN ST_AsWKB(ST_MakeLine(ARRAY("
        "  ST_Point(0.0, 0.0), ST_Point(1.5, 2.0), ST_Point(3.0, 2.5))))"
        " ELSE ST_AsWKB(ST_GeomFromText('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
        " (2 2, 4 2, 4 4, 2 4, 2 2))')) END AS geom",
    )
    p = str(tmp_path / "cell.000")
    st_write(df, p, objl_col="objl")
    back = st_read(spark, p)
    rows = {r.objl: r for r in back.selectExpr(
        "objl", "prim", "ST_GeometryType(geom) AS t",
        "round(ST_Area(geom), 6) AS a",
        "round(ST_Length(geom), 6) AS l",
        "round(ST_X(ST_Centroid(geom)), 6) AS cx").collect()}
    assert rows[11].t == "POINT" and rows[11].prim == 1
    assert rows[12].t == "LINESTRING" and rows[12].prim == 2
    assert rows[13].t == "POLYGON" and rows[13].a == 96.0  # 100 - 4 hole
    # coordinates survive the COMF integer quantization at 1e-7 deg
    pt = back.filter("objl = 11").selectExpr(
        "ST_X(geom) AS x", "ST_Y(geom) AS y").first()
    assert abs(pt.x - 12.5) < 1e-6 and abs(pt.y + 33.25) < 1e-6


def test_edge_node_resolution_and_orientation(spark, tmp_path):
    """A hand-built cell exercising what our writer does NOT emit: an edge
    whose endpoints live in connected-node records (VRPT TOPI 1/2) and a
    reversed FSPT orientation — the real-ENC topology path."""
    register_all(spark)
    comf = 10_000_000

    def sg2d(coords):
        return b"".join(struct.pack("<ii", int(y * comf), int(x * comf))
                        for x, y in coords)

    def vrid(rcnm, rcid):
        return bytes([rcnm]) + struct.pack("<IHB", rcid, 1, 1)

    def name(rcnm, rcid):
        return bytes([rcnm]) + struct.pack("<I", rcid)

    dspm = (bytes([20]) + struct.pack("<I", 1) + bytes([2, 7, 1])
            + struct.pack("<I", 52000) + bytes([1, 1, 1, 1])
            + struct.pack("<II", comf, 10))
    recs = [
        _mk_record("L", [("0000", b"0100;&x")], field_control_len="09"),
        _mk_record("D", [("0001", struct.pack("<H", 1)), ("DSPM", dspm)]),
        # connected nodes 1 (0,0) and 2 (3,3)
        _mk_record("D", [("0001", struct.pack("<H", 2)),
                         ("VRID", vrid(RCNM_VC, 1)), ("SG2D", sg2d([(0, 0)]))]),
        _mk_record("D", [("0001", struct.pack("<H", 3)),
                         ("VRID", vrid(RCNM_VC, 2)), ("SG2D", sg2d([(3, 3)]))]),
        # edge 5: interior vertices only; begin node 1, end node 2
        _mk_record("D", [
            ("0001", struct.pack("<H", 4)),
            ("VRID", vrid(RCNM_VE, 5)),
            ("VRPT", name(RCNM_VC, 1) + bytes([1, 1, 1, 2])
                     + name(RCNM_VC, 2) + bytes([1, 1, 2, 2])),
            ("SG2D", sg2d([(1, 1), (2, 2)])),
        ]),
        # line feature over edge 5 REVERSED (ORNT=2)
        _mk_record("D", [
            ("0001", struct.pack("<H", 5)),
            ("FRID", bytes([100]) + struct.pack("<I", 9) + bytes([2, 1])
                     + struct.pack("<HHB", 42, 1, 1)),
            ("FSPT", name(RCNM_VE, 5) + bytes([2, 1, 2])),
        ]),
    ]
    p = str(tmp_path / "topo.000")
    with open(p, "wb") as f:
        f.write(b"".join(recs))
    feats = parse_s57(p)
    assert len(feats) == 1
    rcid, objl, prim, attrs, natf, g = feats[0]
    assert (rcid, objl, prim) == (9, 42, 2)
    pts = [list(p[:2]) for p in g.data]
    assert pts == [[3.0, 3.0], [2.0, 2.0], [1.0, 1.0], [0.0, 0.0]]


def test_unsupported_geometry_refused(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Collect(ARRAY(ST_Point(1.0, 2.0)))) AS geom")
    with pytest.raises(ValueError, match="unsupported geometry"):
        write_s57(df, str(tmp_path / "x.000"))


def test_attf_attributes_roundtrip(spark, tmp_path):
    """ATTF pairs (ATTL code, UT-terminated value) survive the round trip
    as the attrs map."""
    register_all(spark)
    df = spark.createDataFrame(
        [(1, "Elbe Light", 12.5), (2, None, 7.0)],
        "id long, objnam string, valsou double",
    ).selectExpr(
        "id", "objnam", "valsou",
        "ST_AsWKB(ST_Point(CAST(id AS DOUBLE), 53.9)) AS geom",
    )
    p = str(tmp_path / "attr.000")
    write_s57(df, p, attrs={"objnam": 116, "valsou": 174})
    back = st_read(spark, p)
    rows = sorted(back.selectExpr(
        "attrs[116] AS objnam", "attrs[174] AS valsou").collect(),
        key=lambda r: (r.objnam is None, r.objnam))
    assert rows[0].objnam == "Elbe Light" and rows[0].valsou == "12.5"
    assert rows[1].objnam is None and rows[1].valsou == "7.0"


def test_sg3d_soundings_roundtrip(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,), (2,)], "id long").selectExpr(
        "CAST(id AS INT) AS objl",
        "CASE WHEN id = 1 THEN ST_AsWKB(ST_GeomFromText("
        "'MULTIPOINT Z ((1.5 2.5 10.3), (3.25 4.0 7.1))'))"
        " ELSE ST_AsWKB(ST_GeomFromText('POINT Z (5.5 6.5 2.2)')) END AS geom")
    p = str(tmp_path / "snd.000")
    write_s57(df, p, objl_col="objl")
    back = read_s57(spark, p)
    rows = {r.objl: r for r in back.selectExpr(
        "objl", "ST_GeometryType(geom) AS t", "ST_AsText(geom) AS w",
        "ST_NPoints(geom) AS n").collect()}
    assert rows[1].t == "MULTIPOINT" and rows[1].n == 2
    assert "10.3" in rows[1].w and "7.1" in rows[1].w
    assert rows[2].t == "POINT" and "2.2" in rows[2].w


def test_natf_roundtrip(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1, "Nationale", "Intl")],
                               "id long, nname string, iname string").selectExpr(
        "nname", "iname", "ST_AsWKB(ST_Point(1.0, 2.0)) AS geom")
    p = str(tmp_path / "natf.000")
    write_s57(df, p, attrs={"iname": 116}, natf={"nname": 300})
    r = read_s57(spark, p).selectExpr(
        "attrs[116] AS i", "natf[300] AS n").first()
    assert r.i == "Intl" and r.n == "Nationale"


def test_multi_exterior_rings_multipolygon(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_GeomFromText('MULTIPOLYGON ("
        "((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2)),"
        " ((20 0, 25 0, 25 5, 20 5, 20 0)))')) AS geom")
    p = str(tmp_path / "mp.000")
    write_s57(df, p)
    r = read_s57(spark, p).selectExpr(
        "ST_GeometryType(geom) AS t", "ST_NumGeometries(geom) AS n",
        "round(ST_Area(geom), 6) AS a").first()
    # two shells -> MULTIPOLYGON; the hole attaches to the 10x10 shell
    assert r.t == "MULTIPOLYGON" and r.n == 2 and r.a == 96.0 + 25.0


def test_update_files_applied(spark, tmp_path):
    register_all(spark)
    from duckdb_spatial_spark.sources.s57 import (
        RCNM_VI, _sg2d, _vrid, s57_meta, write_s57_update,
    )

    base_df = spark.createDataFrame([(1, "Alpha"), (2, "Beta"), (3, "Gamma")],
                                    "id long, nm string").selectExpr(
        "CAST(id AS INT) AS objl", "nm",
        "ST_AsWKB(ST_Point(CAST(id AS DOUBLE), 50.0)) AS geom")
    p = str(tmp_path / "upd.000")
    write_s57(base_df, p, objl_col="objl", attrs={"nm": 116}, dsnm="UPDCELL")
    comf = 10_000_000.0
    # the writer allocates vector rcid 1..3 and feature rcid 4? -> feature
    # FRIDs interleave: VI=1,FRID=2, VI=3,FRID=4, VI=5,FRID=6
    base = {(r.rcid): r for r in read_s57(spark, p).collect()}
    assert sorted(base) == [2, 4, 6]
    # update 1: delete feature rcid 4 (Beta); move node of feature 2 (VI 1)
    write_s57_update(str(tmp_path / "upd.001"), [
        {"kind": "F", "rcnm": 100, "rcid": 4, "ruin": 2},
        {"kind": "V", "rcnm": RCNM_VI, "rcid": 1, "ruin": 3,
         "fields": [("SG2D", _sg2d([(9.5, 51.5)], comf))]},
    ])
    # update 2: modify feature 6's attribute 116 (merge)
    write_s57_update(str(tmp_path / "upd.002"), [
        {"kind": "F", "rcnm": 100, "rcid": 6, "ruin": 3, "prim": 1,
         "fields": [("ATTF", struct.pack("<H", 116) + b"Delta" + b"\x1f")]},
    ])
    back = {r.rcid: r for r in read_s57(spark, p).selectExpr(
        "rcid", "attrs[116] AS nm", "ST_X(geom) AS x").collect()}
    assert sorted(back) == [2, 6]            # Beta deleted
    assert back[2].x == 9.5                  # node moved by update 1
    assert back[2].nm == "Alpha"             # attrs untouched
    assert back[6].nm == "Delta"             # attr merged by update 2
    # apply_updates=False reads the raw base cell
    raw = read_s57(spark, p, apply_updates=False)
    assert raw.count() == 3
    m = s57_meta(p)
    assert m["dsnm"] == "UPDCELL" and m["updates"] == ["upd.001", "upd.002"]


def test_malformed_leader_no_hang(tmp_path):
    # zero/garbage record length must terminate the generator, not loop
    from duckdb_spatial_spark.sources.s57 import iso8211_records
    bad = b"00000" + b"3D" + b"E1 " + b"09" + b"00000" + b" ! " + b"110" + b"4"
    assert list(iso8211_records(bad + b"\x00" * 64)) == []


def test_partial_edit_updates_sgcc_fspc(spark, tmp_path):
    """S-57 Part 3 §8.4 partial edits: SGCC splices coordinates into the
    target vector record's SG2D array; FSPC splices FSPT pointer
    entries."""
    register_all(spark)
    from duckdb_spatial_spark.sources.s57 import (
        RCNM_VE, _sg2d, sgcc, write_s57_update,
    )

    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(0.0, 0.0), ST_Point(1.0, 0.0),"
        " ST_Point(2.0, 0.0)))) AS geom")
    p = str(tmp_path / "pe.000")
    write_s57(df, p)  # VE rcid 1 with 3 vertices; FRID rcid 2
    comf = 10_000_000.0
    # SGCC modify: replace vertex 2 (1,0) -> (1,5); then insert one more
    # vertex (3,0) after position 3
    write_s57_update(str(tmp_path / "pe.001"), [
        {"kind": "V", "rcnm": RCNM_VE, "rcid": 1, "ruin": 3,
         "fields": [("SGCC", sgcc(3, 2, 1)), ("SG2D", _sg2d([(1.0, 5.0)], comf))]},
    ])
    write_s57_update(str(tmp_path / "pe.002"), [
        {"kind": "V", "rcnm": RCNM_VE, "rcid": 1, "ruin": 3,
         "fields": [("SGCC", sgcc(1, 4, 1)), ("SG2D", _sg2d([(3.0, 0.0)], comf))]},
    ])
    r = read_s57(spark, p).selectExpr("ST_AsText(geom) AS t", "ST_NPoints(geom) AS n").first()
    assert r.t == "LINESTRING (0 0, 1 5, 2 0, 3 0)" and r.n == 4
    # SGCC delete: remove the vertex just inserted
    write_s57_update(str(tmp_path / "pe.003"), [
        {"kind": "V", "rcnm": RCNM_VE, "rcid": 1, "ruin": 3,
         "fields": [("SGCC", sgcc(2, 4, 1))]},
    ])
    r = read_s57(spark, p).selectExpr("ST_AsText(geom) AS t").first()
    assert r.t == "LINESTRING (0 0, 1 5, 2 0)"


def test_partial_edit_updates_vrpc(spark, tmp_path):
    """S-57 Part 3 §8.4 VRPC control field: splices 9-byte VRPT pointer
    entries (begin/end node pointers) instead of wholesale replacement —
    the last update instruction GDAL's ApplyRecordUpdate honors."""
    register_all(spark)
    from duckdb_spatial_spark.sources.s57 import (
        RCNM_FE, _sg2d, _vrid, sgcc, write_s57_update,
    )

    comf = 10_000_000

    def name(rcnm, rcid):
        return bytes([rcnm]) + struct.pack("<I", rcid)

    dspm = (bytes([20]) + struct.pack("<I", 1) + bytes([2, 7, 1])
            + struct.pack("<I", 52000) + bytes([1, 1, 1, 1])
            + struct.pack("<II", comf, 10))
    recs = [
        _mk_record("L", [("0000", b"0100;&x")], field_control_len="09"),
        _mk_record("D", [("0001", struct.pack("<H", 1)), ("DSPM", dspm)]),
        # connected nodes 1 (0,0) and 2 (3,3)
        _mk_record("D", [("0001", struct.pack("<H", 2)),
                         ("VRID", _vrid(RCNM_VC, 1)),
                         ("SG2D", _sg2d([(0.0, 0.0)], comf))]),
        _mk_record("D", [("0001", struct.pack("<H", 3)),
                         ("VRID", _vrid(RCNM_VC, 2)),
                         ("SG2D", _sg2d([(3.0, 3.0)], comf))]),
        # edge 5: interior vertices (1,1)-(2,2); begin node 1, end node 2
        _mk_record("D", [
            ("0001", struct.pack("<H", 4)),
            ("VRID", _vrid(RCNM_VE, 5)),
            ("VRPT", name(RCNM_VC, 1) + bytes([1, 1, 1, 2])
                     + name(RCNM_VC, 2) + bytes([1, 1, 2, 2])),
            ("SG2D", _sg2d([(1.0, 1.0), (2.0, 2.0)], comf)),
        ]),
        # line feature over edge 5
        _mk_record("D", [
            ("0001", struct.pack("<H", 5)),
            ("FRID", bytes([RCNM_FE]) + struct.pack("<I", 9) + bytes([2, 1])
                     + struct.pack("<HHB", 42, 1, 1)),
            ("FSPT", name(RCNM_VE, 5) + bytes([1, 1, 2])),
        ]),
    ]
    p = str(tmp_path / "vrpc.000")
    with open(p, "wb") as f:
        f.write(b"".join(recs))

    def line():
        return read_s57(spark, p).selectExpr("ST_AsText(geom) AS t").first().t

    assert line() == "LINESTRING (0 0, 1 1, 2 2, 3 3)"
    # .001: insert node VC 3 at (9,9); VRPC MODIFY entry 2 (the end
    # pointer) to point at it — the old end node VC 2 stays on disk
    write_s57_update(str(tmp_path / "vrpc.001"), [
        {"kind": "V", "rcnm": RCNM_VC, "rcid": 3, "ruin": 1,
         "fields": [("SG2D", _sg2d([(9.0, 9.0)], comf))]},
        {"kind": "V", "rcnm": RCNM_VE, "rcid": 5, "ruin": 3,
         "fields": [("VRPC", sgcc(3, 2, 1)),
                    ("VRPT", name(RCNM_VC, 3) + bytes([1, 1, 2, 2]))]},
    ])
    assert line() == "LINESTRING (0 0, 1 1, 2 2, 9 9)"
    # .002: VRPC DELETE entry 1 (the begin pointer)
    write_s57_update(str(tmp_path / "vrpc.002"), [
        {"kind": "V", "rcnm": RCNM_VE, "rcid": 5, "ruin": 3,
         "fields": [("VRPC", sgcc(2, 1, 1))]},
    ])
    assert line() == "LINESTRING (1 1, 2 2, 9 9)"
    # .003: VRPC INSERT a begin pointer to VC 2 at position 1
    write_s57_update(str(tmp_path / "vrpc.003"), [
        {"kind": "V", "rcnm": RCNM_VE, "rcid": 5, "ruin": 3,
         "fields": [("VRPC", sgcc(1, 1, 1)),
                    ("VRPT", name(RCNM_VC, 2) + bytes([1, 1, 1, 2]))]},
    ])
    assert line() == "LINESTRING (3 3, 1 1, 2 2, 9 9)"


def test_update_modify_missing_record_skipped(spark, tmp_path):
    """RUIN=3 (modify) of a record absent from the base is skipped, not
    treated as an insert — an ATTF-only fragment must not surface as a
    bogus feature (GDAL warns and skips; r14 advisory)."""
    register_all(spark)
    from duckdb_spatial_spark.sources.s57 import write_s57_update

    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Point(1.0, 2.0)) AS geom")
    p = str(tmp_path / "miss.000")
    write_s57(df, p)
    write_s57_update(str(tmp_path / "miss.001"), [
        {"kind": "F", "rcnm": 100, "rcid": 77, "ruin": 3, "prim": 1,
         "fields": [("ATTF", struct.pack("<H", 116) + b"Ghost" + b"\x1f")]},
    ])
    back = read_s57(spark, p)
    assert back.count() == 1
    assert back.selectExpr("rcid").first().rcid == 2


def test_dsid_pseudo_layer(spark, tmp_path):
    """layer='DSID' returns GDAL's dataset-identification pseudo-layer:
    one row per cell with EXPP/INTU/DSNM/EDTN/UPDN, COMF/SOMF and the
    applied-update count."""
    register_all(spark)
    from duckdb_spatial_spark.sources.s57 import write_s57_update

    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Point(1.0, 2.0)) AS geom")
    p = str(tmp_path / "dsid.000")
    write_s57(df, p, dsnm="DSIDCELL")
    write_s57_update(str(tmp_path / "dsid.001"), [
        {"kind": "F", "rcnm": 100, "rcid": 2, "ruin": 3, "prim": 1,
         "fields": [("ATTF", struct.pack("<H", 116) + b"X" + b"\x1f")]},
    ])
    row = read_s57(spark, p, layer="DSID").first()
    assert row.dsnm == "DSIDCELL" and row.updates == 1
    assert row.comf == 10_000_000.0 and row.somf == 10.0
    assert row.expp == 1 and row.intu == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="DSID"):
        read_s57(spark, p, layer="Nope")
    # through the generic st_read layer= contract too
    assert st_read(spark, p, layer="DSID").count() == 1


def test_exchange_set_catalog(spark, tmp_path):
    """CATALOG.031 enumeration (S-57 Part 3 §5.2 CATD records): reading
    the exchange-set root or the catalogue file itself yields exactly
    the referenced .000 cells — backslash separators normalize, the
    catalogue's own row / TXT ancillaries / missing files are skipped."""
    import os

    from duckdb_spatial_spark.sources.s57 import (
        exchange_set_cells, parse_s57_catalog, read_s57, write_s57,
        write_s57_catalog,
    )

    register_all(spark)
    enc = tmp_path / "ENC_ROOT"
    (enc / "GB5").mkdir(parents=True)
    a = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Point(1.0, 2.0)) AS geom")
    b = spark.createDataFrame([(2,)], "id long").selectExpr(
        "ST_AsWKB(ST_Point(3.0, 4.0)) AS geom")
    # a third cell EXISTS on disk but is not in the catalogue: the
    # catalogue, not the glob, decides membership
    c = spark.createDataFrame([(3,)], "id long").selectExpr(
        "ST_AsWKB(ST_Point(5.0, 6.0)) AS geom")
    write_s57(a, str(enc / "aa.000"))
    write_s57(b, str(enc / "GB5" / "bb.000"))
    write_s57(c, str(enc / "zz.000"))
    cat = str(enc / "CATALOG.031")
    write_s57_catalog(cat, [
        ("CATALOG.031", "ASC"),
        "aa.000",
        "GB5\\bb.000",
        ("GB5\\README.TXT", "TXT"),
        "missing.000",
    ])
    ents = parse_s57_catalog(cat)
    assert [e["file"] for e in ents] == [
        "CATALOG.031", "aa.000", "GB5/bb.000", "GB5/README.TXT",
        "missing.000"]
    assert ents[0]["impl"] == "ASC" and ents[1]["impl"] == "BIN"
    cells = exchange_set_cells(cat)
    assert sorted(os.path.basename(f) for f in cells) == ["aa.000", "bb.000"]
    # exchange-set ROOT (ENC_ROOT discovery), catalogue path, and the
    # parent of ENC_ROOT all enumerate the same two cells
    for p in (str(tmp_path), str(enc), cat):
        xs = sorted(round(r.x, 6) for r in read_s57(spark, p).selectExpr(
            "ST_X(geom) AS x").collect())
        assert xs == [1.0, 3.0], p
    # a catalogue resolving zero cells raises
    empty = str(tmp_path / "empty.031")
    write_s57_catalog(empty, ["gone.000"])
    with pytest.raises(FileNotFoundError):
        exchange_set_cells(empty)
