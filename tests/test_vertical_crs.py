"""Vertical / compound EPSG registry (functions/crs.py r15): compound
codes lower to horizontal proj4 + vertical tokens; GTX geoid grids
attach per-code; +vto_meter=-1 models depth axes; executor-side UDFs
resolve grids through the PROJ_DATA convention directory."""

import os
import struct

import numpy as np
import pytest

from duckdb_spatial_spark.functions import crs as C


def _write_affine_gtx(path, a=2.0, b=0.5, c=0.25):
    """N(lon,lat) = a + b*(lon+100) + c*(lat-30) over 11x11 1-degree
    nodes; every node value is a binary fraction (exact in float32)."""
    with open(path, "wb") as f:
        f.write(struct.pack(">ddddii", 30.0, -100.0, 1.0, 1.0, 11, 11))
        for i in range(11):
            for j in range(11):
                f.write(struct.pack(">f", a + b * j + c * i))


@pytest.fixture()
def geoid(tmp_path):
    p = str(tmp_path / "navd88.gtx")
    _write_affine_gtx(p)
    C.register_vertical_grid(5703, p)
    yield p
    C._VERTICAL_GRIDS.pop(5703, None)
    C._PROJ4_CACHE.clear()


def test_compound_code_applies_geoid(geoid):
    x, y, z = C.transform_xy(np.array([-95.5]), np.array([35.25]),
                             "EPSG:5498", "EPSG:4326", always_xy=True,
                             z=np.array([100.0]))
    N = 2 + 0.5 * (-95.5 + 100) + 0.25 * (35.25 - 30)
    assert z[0] == 100.0 + N
    # roundtrip back to orthometric
    _, _, z2 = C.transform_xy(x, y, "EPSG:4326", "EPSG:5498",
                              always_xy=True, z=z)
    assert abs(z2[0] - 100.0) < 1e-6


def test_proj_notation_and_depth(geoid):
    # PROJ's 'EPSG:h+v' compound notation
    _, _, z = C.transform_xy(np.array([-97.75]), np.array([31.5]),
                             "EPSG:4326+5703", "EPSG:4326",
                             always_xy=True, z=np.array([12.5]))
    assert z[0] == 12.5 + 3.5
    # MSL depth (5715): +vto_meter=-1 negates
    _, _, zd = C.transform_xy(np.array([-95.5]), np.array([35.25]),
                              "EPSG:4326+5715", "EPSG:4326",
                              always_xy=True, z=np.array([50.0]))
    assert zd[0] == -50.0
    # and back: height -> depth
    _, _, zd2 = C.transform_xy(np.array([-95.5]), np.array([35.25]),
                               "EPSG:4326", "EPSG:4326+5715",
                               always_xy=True, z=np.array([-50.0]))
    assert zd2[0] == 50.0


def test_no_grid_passthrough_and_axis_order():
    # 9705 (WGS 84 + MSL height): no grid registered -> z unchanged
    _, _, z = C.transform_xy(np.array([10.0]), np.array([50.0]),
                             "EPSG:9705", "EPSG:4326", always_xy=True,
                             z=np.array([7.25]))
    assert z[0] == 7.25
    # compound keeps the horizontal member's authority axis order
    x1, y1 = C.transform_xy(np.array([35.25]), np.array([-95.5]),
                            "EPSG:5498", "EPSG:3857", always_xy=False)
    x2, y2 = C.transform_xy(np.array([-95.5]), np.array([35.25]),
                            "EPSG:4269", "EPSG:3857", always_xy=True)
    assert abs(x1[0] - x2[0]) < 1e-6 and abs(y1[0] - y2[0]) < 1e-6


def test_harn_compound_5499(geoid):
    # NAD83(HARN) horizontal (4152, GRS80 null-transform stance like
    # NAD83) + NAVD88: same geoid math as 5498, authority lat/lon order
    x, y, z = C.transform_xy(np.array([35.25]), np.array([-95.5]),
                             "EPSG:5499", "EPSG:4326", always_xy=False,
                             z=np.array([1.0]))
    N = 2 + 0.5 * (-95.5 + 100) + 0.25 * (35.25 - 30)
    # GRS80 vs WGS84 flattening differ in the 9th decimal, so the
    # datum-less geocentric roundtrip wobbles lat by ~1e-9 deg
    assert abs(x[0] - 35.25) < 1e-6 and y[0] == -95.5 and z[0] == 1.0 + N


def test_projected_compound_and_errors():
    # 7415 Amersfoort / RD New + NAP: horizontal still transforms with
    # the vertical axis passing through (no NAP grid registered)
    x, y, z = C.transform_xy(np.array([155000.0]), np.array([463000.0]),
                             "EPSG:7415", "EPSG:4326", always_xy=True,
                             z=np.array([3.0]))
    assert abs(x[0] - 5.3872) < 1e-3 and abs(y[0] - 52.1552) < 1e-3
    assert z[0] == 3.0
    # bare vertical code: loud, names the fix
    with pytest.raises(ValueError, match="vertical CRS"):
        C.transform_xy(np.array([0.0]), np.array([0.0]),
                       "EPSG:5703", "EPSG:4326")
    # unknown vertical member in notation
    with pytest.raises(ValueError, match="unknown vertical"):
        C.transform_xy(np.array([0.0]), np.array([0.0]),
                       "EPSG:4326+9999", "EPSG:4326")
    with pytest.raises(ValueError, match="not a known vertical"):
        C.register_vertical_grid(4326, "x.gtx")


def test_proj_data_convention_dir(tmp_path, monkeypatch):
    """Grids resolve from <SPARK_GRAFT_PROJ_DATA>/epsg_<code>.gtx when
    not explicitly registered — the executor-side path."""
    gd = tmp_path / "proj_data"
    gd.mkdir()
    _write_affine_gtx(str(gd / "epsg_5773.gtx"))
    monkeypatch.setenv("SPARK_GRAFT_PROJ_DATA", str(gd))
    C._PROJ4_CACHE.clear()
    try:
        _, _, z = C.transform_xy(np.array([-95.5]), np.array([35.25]),
                                 "EPSG:9707", "EPSG:4326",
                                 always_xy=True, z=np.array([0.0]))
        N = 2 + 0.5 * (-95.5 + 100) + 0.25 * (35.25 - 30)
        assert z[0] == N
    finally:
        C._PROJ4_CACHE.clear()


def test_refsys_lists_vertical_and_compound(spark):
    rows = {(r.code, r.type): r for r in C.list_proj_crs_df(spark).collect()}
    assert rows[("5703", "vertical")].name == "NAVD88 height"
    assert rows[("5715", "vertical")].axis == "down"
    c = rows[("7415", "compound")]
    assert "NAP height" in c.name and c.axis == "x,y,z"
    assert rows[("9707", "compound")].axis == "lat,lon,z"


def test_st_transform_udf_vertical(spark, tmp_path):
    """End-to-end through the executor-side ST_Transform UDF with the
    PROJ_DATA convention dir (the driver-row shape)."""
    gd = os.path.join("spark-warehouse", "proj_grids")
    os.makedirs(gd, exist_ok=True)
    _write_affine_gtx(os.path.join(gd, "epsg_5703.gtx"))
    from duckdb_spatial_spark.functions import register_all

    register_all(spark)
    r = spark.sql(
        "SELECT round(ST_Z(ST_Transform(ST_GeomFromText("
        "'POINT Z (-95.5 35.25 100.0)'), 'EPSG:5498', 'EPSG:4326', true)), 6) AS h"
    ).first()
    assert r.h == 105.5625
