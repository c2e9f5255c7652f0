"""GTX vertical (geoid) grid: format roundtrip, bilinear/affine
exactness, +geoidgrids= pipeline (orthometric <-> ellipsoidal heights),
and the SQL ST_Transform path with POINT Z. Synthetic grids carry an
AFFINE undulation field (bilinear of affine is exact) with dyadic
coefficients (exact float32 nodes)."""

import numpy as np
import pytest

from duckdb_spatial_spark.functions import proj4 as P
from duckdb_spatial_spark.functions.gtx import load_gtx, read_gtx, write_gtx

# grid: lat 24..41 deg, lon -101..-79 deg, 0.5 deg cells
S_LAT, W_LON, INC = 24.0, -101.0, 0.5
NROWS, NCOLS = 35, 45
# N(lon, lat) = 30 + 0.125*col + 0.0625*row  (meters; dyadic)
A, B, C = 30.0, 0.125, 0.0625


def _grid_values():
    rows = np.arange(NROWS, dtype=np.float64)[:, None]
    cols = np.arange(NCOLS, dtype=np.float64)[None, :]
    return (A + B * cols + C * rows).astype(np.float32)


def _expected_n(lon, lat):
    col = (np.asarray(lon, dtype=np.float64) - W_LON) / INC
    row = (np.asarray(lat, dtype=np.float64) - S_LAT) / INC
    return A + B * col + C * row


@pytest.fixture()
def gtx_path(tmp_path):
    p = str(tmp_path / "geoid.gtx")
    write_gtx(p, S_LAT, W_LON, INC, INC, _grid_values())
    return p


def test_roundtrip_and_interpolation(gtx_path):
    g = read_gtx(gtx_path)
    assert g.nrows == NROWS and g.ncols == NCOLS
    rng = np.random.default_rng(3)
    lon = rng.uniform(-100.5, -79.5, 100)
    lat = rng.uniform(24.5, 40.5, 100)
    np.testing.assert_allclose(
        g.undulation(lon, lat), _expected_n(lon, lat), rtol=0, atol=1e-10
    )
    # outside: zero shift
    assert g.undulation([10.0], [50.0])[0] == 0.0


def test_lon_0_360_convention(tmp_path):
    """VDatum-style grids store west longitudes as 259..281 deg east."""
    p = str(tmp_path / "g360.gtx")
    write_gtx(p, S_LAT, W_LON + 360.0, INC, INC, _grid_values())
    g = read_gtx(p)
    np.testing.assert_allclose(
        g.undulation([-95.0], [30.0]), _expected_n([-95.0], [30.0]),
        rtol=0, atol=1e-10,
    )


def test_geoid_pipeline_both_directions(gtx_path):
    src = P.parse_proj4(f"+proj=longlat +datum=WGS84 +geoidgrids={gtx_path}")
    dst = P.parse_proj4("+proj=longlat +datum=WGS84")
    lon = np.array([-95.0, -85.25])
    lat = np.array([30.0, 27.5])
    h = np.array([100.0, 250.0])  # orthometric
    ox, oy, oz = P.transform_proj4(lon, lat, src, dst, z=h)
    np.testing.assert_allclose(oz, h + _expected_n(lon, lat), rtol=0, atol=1e-9)
    np.testing.assert_allclose(ox, lon, rtol=0, atol=1e-12)
    # back down: ellipsoidal -> orthometric
    bx, by, bz = P.transform_proj4(ox, oy, dst, src, z=oz)
    np.testing.assert_allclose(bz, h, rtol=0, atol=1e-9)
    # without z the signature is unchanged
    assert len(P.transform_proj4(lon, lat, src, dst)) == 2


def test_geoid_composes_with_projection(gtx_path):
    """Orthometric heights survive a horizontal reprojection: geographic
    +geoidgrids -> UTM (no dst grid) keeps h = H + N."""
    src = P.parse_proj4(f"+proj=longlat +datum=WGS84 +geoidgrids={gtx_path}")
    utm = P.parse_proj4("+proj=utm +zone=15 +datum=WGS84")
    ox, oy, oz = P.transform_proj4(
        np.array([-93.0]), np.array([31.0]), src, utm, z=np.array([10.0])
    )
    assert oz[0] == pytest.approx(10.0 + _expected_n(-93.0, 31.0), abs=1e-9)


def test_st_transform_sql_point_z(spark, gtx_path):
    src = f"+proj=longlat +datum=WGS84 +geoidgrids={gtx_path}"
    row = spark.sql(
        f"""
        SELECT round(ST_X(p), 6) AS x, round(ST_Y(p), 6) AS y,
               round(ST_Z(p), 6) AS z FROM (
          SELECT ST_Transform(ST_Point3D(-95.0D, 30.0D, 100.0D),
                              '{src}', 'EPSG:4326', true) AS p
        )
        """
    ).collect()[0]
    assert row.x == -95.0 and row.y == 30.0
    assert row.z == pytest.approx(100.0 + _expected_n(-95.0, 30.0), abs=1e-6)
    # missing mandatory grid raises at load
    with pytest.raises(FileNotFoundError):
        load_gtx("/nonexistent/geoid.gtx")
