"""NTv2 (.gsb) grid-shift: format roundtrip, bilinear/affine exactness,
iterative inverse, subgrid selection, and the proj4 pipeline integration
(+nadgrids=, +datum=NAD27 loud failure).

Synthetic grids use AFFINE shift fields with dyadic coefficients: bilinear
interpolation reproduces an affine field exactly, and dyadic node values
are exact in float32 — so expected values are closed-form, no golden
files. Reference behavior: proj's +nadgrids (reference vendors proj 9.x,
test/sql/proj.test)."""

import numpy as np
import pytest

from duckdb_spatial_spark.functions import proj4 as P
from duckdb_spatial_spark.functions.ntv2 import (
    NTv2Grid,
    SubGrid,
    load_grid,
    read_gsb,
    write_gsb,
)

# grid covering lon [-100.5, -79.5] (E_LONG pw = 79.5*3600), lat [24.5, 40.5]
S_LAT, N_LAT = 24.5 * 3600, 40.5 * 3600
E_LONG, W_LONG = 79.5 * 3600, 100.5 * 3600  # positive west
INC = 1800.0  # 0.5 deg

# dyadic affine coefficients (arc-seconds per node step)
A_LAT, B_LAT, C_LAT = 2.5, 0.0625, 0.03125     # value = A + B*col + C*row
A_LON, B_LON, C_LON = -1.75, 0.03125, 0.0625


def _affine_nodes(a, b, c, nrows, ncols):
    rows = np.arange(nrows, dtype=np.float64)[:, None]
    cols = np.arange(ncols, dtype=np.float64)[None, :]
    return (a + b * cols + c * rows).astype(np.float32)


def _make_subgrid(name="SYNTH", parent="NONE"):
    nrows = int(round((N_LAT - S_LAT) / INC)) + 1
    ncols = int(round((W_LONG - E_LONG) / INC)) + 1
    return SubGrid(
        name, parent, S_LAT, N_LAT, E_LONG, W_LONG, INC, INC,
        _affine_nodes(A_LAT, B_LAT, C_LAT, nrows, ncols),
        _affine_nodes(A_LON, B_LON, C_LON, nrows, ncols),
    )


def _expected_shift(lon_deg, lat_deg):
    """Closed-form affine shift at east-positive degrees (arc-seconds)."""
    col = (-lon_deg * 3600.0 - E_LONG) / INC
    row = (lat_deg * 3600.0 - S_LAT) / INC
    dlat = A_LAT + B_LAT * col + C_LAT * row
    dlon_pw = A_LON + B_LON * col + C_LON * row
    return dlat, dlon_pw


@pytest.mark.parametrize("big_endian", [False, True])
def test_gsb_roundtrip(tmp_path, big_endian):
    path = str(tmp_path / ("be.gsb" if big_endian else "le.gsb"))
    write_gsb(path, [_make_subgrid()], big_endian=big_endian)
    g = read_gsb(path)
    assert len(g.subgrids) == 1
    sg = g.subgrids[0]
    assert sg.name == "SYNTH"
    assert sg.s_lat == S_LAT and sg.w_long == W_LONG
    assert sg.shift_lat.shape == (33, 43)
    np.testing.assert_array_equal(sg.shift_lat, _make_subgrid().shift_lat)


def test_bilinear_reproduces_affine_field(tmp_path):
    path = str(tmp_path / "g.gsb")
    write_gsb(path, [_make_subgrid()])
    g = read_gsb(path)
    rng = np.random.default_rng(7)
    lon = rng.uniform(-100.0, -80.0, 200)
    lat = rng.uniform(25.0, 40.0, 200)
    lon2, lat2 = g.forward(lon, lat)
    dlat, dlon_pw = _expected_shift(lon, lat)
    np.testing.assert_allclose(lat2, lat + dlat / 3600.0, rtol=0, atol=1e-12)
    np.testing.assert_allclose(lon2, lon - dlon_pw / 3600.0, rtol=0, atol=1e-12)


def test_inverse_roundtrip_and_outside_passthrough(tmp_path):
    path = str(tmp_path / "g.gsb")
    write_gsb(path, [_make_subgrid()])
    g = read_gsb(path)
    lon = np.array([-95.0, -85.25, -80.1, 10.0])  # last point outside
    lat = np.array([30.0, 27.5, 39.9, 50.0])
    flon, flat = g.forward(lon, lat)
    # outside the grid: unshifted
    assert flon[3] == 10.0 and flat[3] == 50.0
    assert not g.covers([10.0], [50.0])[0]
    blon, blat = g.inverse(flon, flat)
    np.testing.assert_allclose(blon, lon, rtol=0, atol=1e-11)
    np.testing.assert_allclose(blat, lat, rtol=0, atol=1e-11)


def test_finer_child_subgrid_wins(tmp_path):
    parent = _make_subgrid("PARENT")
    # child: twice the resolution over lon [-90,-85], lat [30,35], with a
    # CONSTANT field distinguishable from the parent's affine one
    cs, cn = 30 * 3600.0, 35 * 3600.0
    ce, cw = 85 * 3600.0, 90 * 3600.0
    nrows = int(round((cn - cs) / 900)) + 1
    ncols = int(round((cw - ce) / 900)) + 1
    child = SubGrid(
        "CHILD", "PARENT", cs, cn, ce, cw, 900.0, 900.0,
        np.full((nrows, ncols), 10.0, dtype=np.float32),
        np.full((nrows, ncols), -5.0, dtype=np.float32),
    )
    path = str(tmp_path / "nested.gsb")
    write_gsb(path, [parent, child])
    g = read_gsb(path)
    lon, lat = g.forward(np.array([-87.0]), np.array([32.0]))
    assert lat[0] == pytest.approx(32.0 + 10.0 / 3600.0, abs=1e-12)
    assert lon[0] == pytest.approx(-87.0 + 5.0 / 3600.0, abs=1e-12)
    # a point in the parent only still uses the affine field
    lon2, lat2 = g.forward(np.array([-95.0]), np.array([27.0]))
    dlat, _ = _expected_shift(np.array([-95.0]), np.array([27.0]))
    assert lat2[0] == pytest.approx(27.0 + dlat[0] / 3600.0, abs=1e-12)


def test_parse_proj4_datum_and_nadgrids(tmp_path):
    # NAD27 without a grid: loud failure, not silent WGS84
    with pytest.raises(ValueError, match="nadgrids"):
        P.parse_proj4("+proj=longlat +datum=NAD27 +no_defs")
    # unknown datum: loud failure
    with pytest.raises(ValueError, match="unknown \\+datum"):
        P.parse_proj4("+proj=longlat +datum=XYZ99 +no_defs")
    # @null stays a no-op
    d = P.parse_proj4("+proj=longlat +datum=WGS84 +nadgrids=@null")
    assert d.nadgrids is None
    # NAD27 + grid parses with the Clarke 1866 ellipsoid
    path = str(tmp_path / "g.gsb")
    write_gsb(path, [_make_subgrid()])
    d = P.parse_proj4(f"+proj=longlat +datum=NAD27 +nadgrids={path}")
    assert d.nadgrids == path
    assert d.ell.a == pytest.approx(6378206.4)
    # datum shorthands expand to their Helmert
    d = P.parse_proj4("+proj=longlat +datum=potsdam")
    assert d.towgs84 is not None and d.towgs84[0] == pytest.approx(598.1)
    # missing mandatory grid file raises at load time
    with pytest.raises(FileNotFoundError):
        load_grid(str(tmp_path / "missing.gsb"))


def test_transform_proj4_nad27_to_wgs84(tmp_path):
    path = str(tmp_path / "g.gsb")
    write_gsb(path, [_make_subgrid()])
    src = P.parse_proj4(f"+proj=longlat +datum=NAD27 +nadgrids={path}")
    dst = P.parse_proj4("+proj=longlat +datum=WGS84")
    lon = np.array([-95.0, -85.25])
    lat = np.array([30.0, 27.5])
    ox, oy = P.transform_proj4(lon, lat, src, dst)
    dlat, dlon_pw = _expected_shift(lon, lat)
    np.testing.assert_allclose(oy, lat + dlat / 3600.0, rtol=0, atol=1e-12)
    np.testing.assert_allclose(ox, lon - dlon_pw / 3600.0, rtol=0, atol=1e-12)
    # and back (engine inverse iterates)
    bx, by = P.transform_proj4(ox, oy, dst, src)
    np.testing.assert_allclose(bx, lon, rtol=0, atol=1e-11)
    np.testing.assert_allclose(by, lat, rtol=0, atol=1e-11)


def test_transform_grid_then_projection(tmp_path):
    """NAD27 geographic -> WGS84 UTM: the grid shift composes with the
    projection leg (shift first, then project with WGS84 params)."""
    path = str(tmp_path / "g.gsb")
    write_gsb(path, [_make_subgrid()])
    src = P.parse_proj4(f"+proj=longlat +datum=NAD27 +nadgrids={path}")
    utm = P.parse_proj4("+proj=utm +zone=15 +datum=WGS84")
    lon = np.array([-93.0])
    lat = np.array([31.0])
    ox, oy = P.transform_proj4(lon, lat, src, utm)
    dlat, dlon_pw = _expected_shift(lon, lat)
    ex, ey = P.transform_proj4(
        lon - dlon_pw / 3600.0, lat + dlat / 3600.0,
        P.parse_proj4("+proj=longlat +datum=WGS84"), utm,
    )
    np.testing.assert_allclose(ox, ex, rtol=0, atol=1e-8)
    np.testing.assert_allclose(oy, ey, rtol=0, atol=1e-8)


def test_st_transform_sql_with_nadgrids(spark, tmp_path):
    """End-to-end SQL path: ST_Transform through a +nadgrids CRS."""
    path = str(tmp_path / "g.gsb")
    write_gsb(path, [_make_subgrid()])
    src_crs = f"+proj=longlat +ellps=clrk66 +nadgrids={path}"
    row = spark.sql(
        f"""
        SELECT ST_X(p) AS x, ST_Y(p) AS y FROM (
          SELECT ST_Transform(ST_Point(-95.0D, 30.0D),
                              '{src_crs}', 'EPSG:4326', true) AS p
        )
        """
    ).collect()[0]
    dlat, dlon_pw = _expected_shift(np.array([-95.0]), np.array([30.0]))
    assert row.x == pytest.approx(-95.0 - dlon_pw[0] / 3600.0, abs=1e-9)
    assert row.y == pytest.approx(30.0 + dlat[0] / 3600.0, abs=1e-9)
