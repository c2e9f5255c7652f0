"""SDTS TVP source (sources/sdts.py): CATD enumeration, IREF scaling,
point/line modules, ATID->AP attribute resolution, round trip,
dispatch, unsupported-module skip accounting."""

import os
import struct

import pytest

from duckdb_spatial_spark.functions import register_all
from duckdb_spatial_spark.sources import st_read, st_write
from duckdb_spatial_spark.sources.sdts import (
    parse_sdts, parse_sdts_catd, read_sdts, write_sdts,
)


@pytest.fixture()
def xfer(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame(
        [(7, "Alpha", 3, "POINT (2.5 3.25)"),
         (8, None, None, "LINESTRING (0 0, 5 0, 5 7)"),
         (9, "Gamma", 5, "LINESTRING (-1.25 -2, 4 4)")],
        "fid long, nm string, lvl int, wkt string",
    ).selectExpr("fid", "nm", "lvl",
                 "ST_AsWKB(ST_GeomFromText(wkt)) AS geom")
    d = str(tmp_path / "xfer")
    write_sdts(df, d, rcid_col="fid", attrs=["nm", "lvl"])
    return d


def test_roundtrip_attrs_and_scaling(spark, xfer):
    rows = {r.rcid: r for r in read_sdts(spark, xfer).selectExpr(
        "module", "rcid", "attrs['nm'] AS nm", "attrs['lvl'] AS lvl",
        "ST_AsText(geom) AS wkt").collect()}
    assert rows[7].module == "NO01" and rows[7].wkt == "POINT (2.5 3.25)"
    assert rows[7].nm == "Alpha" and rows[7].lvl == "3"
    # null attrs -> no AP record referenced -> empty map
    assert rows[8].module == "LE01" and rows[8].nm is None
    assert rows[8].wkt == "LINESTRING (0 0, 5 0, 5 7)"
    # negative coordinates exercise the BI32 two's complement
    assert rows[9].wkt == "LINESTRING (-1.25 -2, 4 4)"
    assert rows[9].lvl == "5"


def test_catd_enumeration_and_dispatch(spark, xfer):
    mods = {m["name"]: m["file"] for m in parse_sdts_catd(
        os.path.join(xfer, "TR01CATD.DDF"))}
    assert set(mods) == {"IREF", "NO01", "LE01", "AP01"}
    # transfer dir, CATD path, and .DDF extension sniffing all read
    assert st_read(spark, xfer, format="sdts").count() == 3
    assert st_read(spark, os.path.join(xfer, "TR01CATD.DDF")).count() == 3


def test_unsupported_module_skip_counted(spark, xfer):
    # splice a polygon module into the catalog: skipped, counted
    from duckdb_spatial_spark.sources.s57 import _UT, _mk_record

    cat = os.path.join(xfer, "TR01CATD.DDF")
    extra = _mk_record("D", [("0001", struct.pack("<H", 99)),
                             ("CATD", b"PC01" + _UT + b"TR01PC01.DDF")])
    with open(cat, "ab") as fh:
        fh.write(extra)
    with open(os.path.join(xfer, "TR01PC01.DDF"), "wb") as fh:
        fh.write(b"")
    meta, feats = parse_sdts(xfer)
    assert meta["skipped"] == {"PC01": "unsupported module type"}
    assert len(feats) == 3
    assert meta["iref"]["sfax"] == 0.01


def test_write_refuses_polygons(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_MakeEnvelope(0, 0, 2, 2)) AS geom")
    with pytest.raises(ValueError, match="unsupported geometry"):
        write_sdts(df, str(tmp_path / "bad"))


def test_st_write_dispatch(spark, tmp_path):
    register_all(spark)
    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_Point(1.0, 2.0)) AS geom")
    d = str(tmp_path / "via_generic")
    st_write(df, d, format="sdts")
    assert st_read(spark, d, format="sdts").count() == 1
