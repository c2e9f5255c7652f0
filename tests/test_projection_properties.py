"""Defining mathematical invariants of the projection families — checks
no worked example can make: equal-area projections preserve area scale,
conformal projections preserve angles/isotropic scale, Cassini-Soldner
holds true scale along its central meridian. All pure numpy (no Spark).
"""

import math

import numpy as np

from duckdb_spatial_spark.functions import proj4 as P

EPS = 1e-4  # degrees; quads ~11 m — small enough for first-order tests


def _radii(ell, lat_r):
    s = np.sin(lat_r)
    w = np.sqrt(1 - ell.e2 * s * s)
    rho = ell.a * (1 - ell.e2) / w**3  # meridional
    nu = ell.a / w                     # prime vertical
    return rho, nu


def _project_quad(d, lon, lat):
    """Planar shoelace area of the projected (lon,lat)+EPS quad and the
    ellipsoidal area of the same quad."""
    lons = np.array([lon, lon + EPS, lon + EPS, lon])
    lats = np.array([lat, lat, lat + EPS, lat + EPS])
    x, y = P._fwd(d, lons, lats)
    planar = 0.5 * abs(
        sum(
            x[i] * y[(i + 1) % 4] - x[(i + 1) % 4] * y[i]
            for i in range(4)
        )
    )
    lat_r = math.radians(lat + EPS / 2)
    rho, nu = _radii(d.ell, np.array([lat_r]))
    ell_area = (rho[0] * math.radians(EPS)) * (nu[0] * math.cos(lat_r) * math.radians(EPS))
    return planar, ell_area


def _scale_vectors(d, lon, lat):
    """Projected east/north unit-displacement vectors, normalized by the
    corresponding ellipsoidal ground distances."""
    lat_r = math.radians(lat)
    rho, nu = _radii(d.ell, np.array([lat_r]))
    x0, y0 = P._fwd(d, np.array([lon]), np.array([lat]))
    xe, ye = P._fwd(d, np.array([lon + EPS]), np.array([lat]))
    xn, yn = P._fwd(d, np.array([lon]), np.array([lat + EPS]))
    de = math.radians(EPS) * nu[0] * math.cos(lat_r)
    dn = math.radians(EPS) * rho[0]
    ve = np.array([xe[0] - x0[0], ye[0] - y0[0]]) / de
    vn = np.array([xn[0] - x0[0], yn[0] - y0[0]]) / dn
    return ve, vn


def _assert_conformal(d, pts, tol=2e-4):
    for lon, lat in pts:
        ve, vn = _scale_vectors(d, lon, lat)
        ne, nn = np.linalg.norm(ve), np.linalg.norm(vn)
        # isotropic scale: |k_east - k_north| / k ~ 0
        assert abs(ne - nn) / ne < tol, (lon, lat, ne, nn)
        # orthogonality: cos(angle) ~ 0
        cosang = abs(np.dot(ve, vn)) / (ne * nn)
        assert cosang < tol, (lon, lat, cosang)


def test_laea_is_equal_area():
    d = P.parse_proj4(
        "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80"
    )
    rng = np.random.default_rng(31)
    for lon, lat in zip(rng.uniform(-10, 30, 40), rng.uniform(35, 70, 40)):
        planar, ell_area = _project_quad(d, lon, lat)
        assert abs(planar / ell_area - 1) < 5e-4, (lon, lat, planar / ell_area)


def test_sterea_krovak_omerc_are_conformal():
    rng = np.random.default_rng(37)
    rd = P.parse_proj4(
        "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
        "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel"
    )
    _assert_conformal(rd, zip(rng.uniform(3, 8, 25), rng.uniform(50, 54, 25)))

    kro = P.parse_proj4(
        "+proj=krovak +lat_0=49.5 +lon_0=24.833333333333332 "
        "+alpha=30.28813972222222 +k=0.9999 +ellps=bessel"
    )
    _assert_conformal(kro, zip(rng.uniform(13, 22, 25), rng.uniform(48, 51, 25)))

    rso = P.parse_proj4(
        "+proj=omerc +lat_0=4 +lonc=115 +alpha=53.31582047222222 "
        "+gamma=53.13010236111111 +k=0.99984 +x_0=590476.87 "
        "+y_0=442857.65 +ellps=evrstSS"
    )
    _assert_conformal(rso, zip(rng.uniform(113, 118, 25), rng.uniform(1, 7, 25)))


def test_cass_true_scale_on_central_meridian():
    d = P.parse_proj4(
        "+proj=cass +lat_0=10.441666666666666 +lon_0=-61.33333333333334 "
        "+x_0=430000 +y_0=325000 +a=6378293.645452597 +b=6356617.987679838"
    )
    for lat in (9.8, 10.4, 11.2):
        lat_r = math.radians(lat)
        rho, _ = _radii(d.ell, np.array([lat_r]))
        x0, y0 = P._fwd(d, np.array([-61.33333333333334]), np.array([lat]))
        x1, y1 = P._fwd(d, np.array([-61.33333333333334]), np.array([lat + EPS]))
        planar = math.hypot(x1[0] - x0[0], y1[0] - y0[0])
        ground = math.radians(EPS) * rho[0]
        assert abs(planar / ground - 1) < 1e-6, (lat, planar / ground)
        # and the central meridian maps onto the x = x_0 grid line
        assert abs(x0[0] - 430000.0) < 1e-6


def test_eqc_and_aeqd():
    """eqc: EPSG GN7-2 method-1028 worked example + meridian-distance
    semantics. aeqd: the DEFINING property — planar radius from the
    center equals the geodesic distance (Vincenty), azimuth preserved."""
    d = P.parse_proj4("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +ellps=WGS84")
    x, y = P._fwd(d, np.array([10.0]), np.array([55.0]))
    assert abs(x[0] - 1113194.91) < 0.01 and abs(y[0] - 6097230.31) < 0.01
    lo, la = P._inv(d, x, y)
    assert abs(lo[0] - 10) < 1e-9 and abs(la[0] - 55) < 1e-9

    from duckdb_spatial_spark.functions.geodesy import geodesic_distance

    a = P.parse_proj4("+proj=aeqd +lat_0=52.3676 +lon_0=4.9041 +ellps=WGS84")
    rng = np.random.default_rng(43)
    lons = rng.uniform(-10, 20, 100)
    lats = rng.uniform(40, 65, 100)
    x, y = P._fwd(a, lons, lats)
    s = geodesic_distance(np.full(100, 4.9041), np.full(100, 52.3676), lons, lats)
    assert np.abs(np.hypot(x, y) - s).max() < 1e-6  # radius == geodesic dist
    lo, la = P._inv(a, x, y)
    assert max(np.abs(lo - lons).max(), np.abs(la - lats).max()) < 1e-9

    import pytest as _pytest

    with _pytest.raises(ValueError, match="aeqd"):
        P._fwd(P.parse_proj4("+proj=aeqd +ellps=bessel"), np.array([1.0]), np.array([1.0]))


def test_aeqd_antipodal_raises_and_omerc_alpha90():
    """aeqd must FAIL LOUDLY (not silently return the last Vincenty
    iterate) in the near-antipodal divergence region; omerc variant B
    with alpha=90 takes the EPSG 9815 special-case uc = A*(lon_c - lam0),
    which equals the alpha->90 analytic limit of the atan2 form."""
    import math

    import pytest as _pytest

    a = P.parse_proj4("+proj=aeqd +lat_0=52 +lon_0=5 +ellps=WGS84")
    with _pytest.raises(ValueError, match="did not converge"):
        P._fwd(a, np.array([-175.0]), np.array([-52.0]))

    ell = P.parse_proj4("+proj=longlat +ellps=WGS84").ell
    B, A_, H, g0, lam0, uc = P._omerc_setup(ell, 4, 115, 90.0, 90.0, 0.99984)
    assert abs(uc - A_ * (math.radians(115) - lam0)) < 1e-6
    # analytic limit check: G = sqrt(D^2-1) at alpha=90, so the asin arg
    # is exactly 1 and lon_c - lam0 = pi/(2B)
    assert abs((math.radians(115) - lam0) - math.pi / (2 * B)) < 1e-9
    # roundtrip through the special case stays exact
    x, y = P.omerc_forward(
        ell, np.array([114.0]), np.array([3.0]), 4, 115, 90.0, 90.0,
        0.99984, 0.0, 0.0, False,
    )
    lo, la = P.omerc_inverse(
        ell, x, y, 4, 115, 90.0, 90.0, 0.99984, 0.0, 0.0, False
    )
    assert abs(lo[0] - 114.0) < 1e-9 and abs(la[0] - 3.0) < 1e-9


def test_epsg_registry_breadth_worked_examples():
    """r11 registry series validated against PUBLISHED constants: the
    EPSG GN7-2 lcc-2SP worked example (NAD27 / Texas South Central,
    EPSG:32040) to 0.01 ftUS and the GDA94 technical-manual example
    (Flinders Peak -> MGA zone 55) to 1 mm; every new series roundtrips
    a landmark through forward+inverse (incl. Helmert datum legs)."""
    from duckdb_spatial_spark.functions.crs import transform_xy

    x, y = transform_xy(
        np.array([-96.0]), np.array([28.5]), "EPSG:4267", "EPSG:32040", True
    )
    assert abs(x[0] - 2963503.91) < 0.01 and abs(y[0] - 254759.80) < 0.01

    lat = -(37 + 57 / 60 + 3.72030 / 3600)
    lon = 144 + 25 / 60 + 29.52440 / 3600
    x, y = transform_xy(
        np.array([lon]), np.array([lat]), "EPSG:4283", "EPSG:28355", True
    )
    assert abs(x[0] - 273741.297) < 1e-3 and abs(y[0] - 5796489.777) < 1e-3

    landmarks = [
        ("EPSG:2263", -74.006, 40.7128), ("EPSG:2227", -121.4944, 38.5816),
        ("EPSG:2276", -96.797, 32.7767), ("EPSG:2272", -75.1652, 39.9526),
        ("EPSG:2232", -104.9903, 39.7392), ("EPSG:2285", -122.3321, 47.6062),
        ("EPSG:2236", -80.1918, 25.7617), ("EPSG:3435", -87.6298, 41.8781),
        ("EPSG:26716", -87.6298, 41.8781), ("EPSG:28407", 37.6176, 55.7558),
        ("EPSG:28432", 178.0, 64.0), ("EPSG:31467", 9.1829, 48.7758),
        ("EPSG:28355", 144.9631, -37.8136), ("EPSG:7855", 144.9631, -37.8136),
        ("EPSG:31983", -46.6333, -23.5505), ("EPSG:31976", -60.0217, 3.8014),
        ("EPSG:3577", 133.8807, -23.698),
    ]
    for code, lo, la in landmarks:
        x, y = transform_xy(np.array([lo]), np.array([la]), "EPSG:4326", code, True)
        lo2, la2 = transform_xy(x, y, code, "EPSG:4326", True)
        # 1e-7 deg ~ 1 cm: the 7-param Helmert legs (rotation terms)
        # round-trip to ~1e-8 deg on far-east GK zones
        assert abs(lo2[0] - lo) < 1e-7 and abs(la2[0] - la) < 1e-7, code
