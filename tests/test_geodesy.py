"""Exact ellipsoidal geodesy kernels (functions/geodesy.py).

Reference semantics: geographiclib/functions/st_area_spheroid.cpp:151-156
(GeographicLib exact polygon area), st_distance_spheroid.cpp (geodesic
inverse). Truth sources here are closed forms: the ellipsoidal zone area
(lat/lon-bounded region) and the meridian-arc series, plus published
geodesic worked values.
"""

import numpy as np
import pytest

from duckdb_spatial_spark.functions import geodesy as gd
from duckdb_spatial_spark.geo import wkt as WKT


def zone_f(phi_deg):
    s = np.sin(np.radians(phi_deg))
    return s / (1 - gd._E2 * s * s) + np.arctanh(gd._E * s) / gd._E


def zone_area(lat_lo, lat_hi, width_deg):
    return np.radians(width_deg) / 2 * gd.WGS84_B ** 2 * (zone_f(lat_hi) - zone_f(lat_lo))


def zone_ring(lon0, width, lat_lo, lat_hi, step=0.001):
    n = max(int(round(width / step)), 1)
    bottom = [(lon0 + width * i / n, lat_lo) for i in range(n + 1)]
    top = [(lon0 + width - width * i / n, lat_hi) for i in range(n + 1)]
    return np.array(bottom + top + [bottom[0]])


def test_vincenty_known_value():
    # LINZ/Vincenty standard test line (Flinders Peak -> Buninyong, GDA):
    # classic worked example distance 54972.271 m on WGS84-like ellipsoid.
    s = float(
        gd.geodesic_distance(
            144 + 25 / 60 + 29.52440 / 3600,
            -(37 + 57 / 60 + 3.72030 / 3600),
            143 + 55 / 60 + 35.38390 / 3600,
            -(37 + 39 / 60 + 10.15610 / 3600),
        )
    )
    assert abs(s - 54972.271) < 0.05


def test_vincenty_vectorized_matches_scalar():
    from duckdb_spatial_spark.functions.udfs import vincenty_m

    rng = np.random.default_rng(7)
    lon1 = rng.uniform(-170, 170, 64)
    lat1 = rng.uniform(-80, 80, 64)
    lon2 = lon1 + rng.uniform(-30, 30, 64)
    lat2 = np.clip(lat1 + rng.uniform(-30, 30, 64), -85, 85)
    v = gd.geodesic_distance(lon1, lat1, lon2, lat2)
    ref = np.array([vincenty_m(a, b, c, d) for a, b, c, d in zip(lon1, lat1, lon2, lat2)])
    assert np.max(np.abs(v - ref)) < 1e-5


def test_coincident_and_equator():
    assert float(gd.geodesic_distance(10.0, 20.0, 10.0, 20.0)) == 0.0
    # equatorial arc: geodesic follows the equator, length = a * dlam
    s = float(gd.geodesic_distance(0.0, 0.0, 1.0, 0.0))
    assert abs(s - gd.WGS84_A * np.radians(1.0)) < 1e-6


@pytest.mark.parametrize(
    "lat_lo,lat_hi,width",
    [(0.0, 30.0, 1.0), (10.0, 55.0, 2.0), (-40.0, -5.0, 1.5), (20.0, 80.0, 0.5)],
)
def test_ring_area_matches_zone_closed_form(lat_lo, lat_hi, width):
    ring = zone_ring(7.0, width, lat_lo, lat_hi)
    a = gd.geodesic_ring_area(ring)
    expect = zone_area(lat_lo, lat_hi, width)
    assert abs(a - expect) / expect < 5e-7  # test-ring densification limited


def test_ring_area_orientation_and_hemispheres():
    ring = zone_ring(100.0, 1.0, -30.0, -5.0)
    a = gd.geodesic_ring_area(ring)
    assert a > 0
    assert abs(gd.geodesic_ring_area(ring[::-1]) + a) / a < 1e-9


def test_excess_stable_under_densification():
    # The turn-angle excess must not degrade as vertex count grows
    # (cancellation-free azimuths); compare 500- vs 8000-vertex rings.
    coarse = gd.geodesic_ring_area(zone_ring(0.0, 1.0, 10.0, 40.0, step=0.004))
    fine = gd.geodesic_ring_area(zone_ring(0.0, 1.0, 10.0, 40.0, step=0.00025))
    assert abs(coarse - fine) / fine < 1e-6


def test_polygon_with_hole():
    outer = "POLYGON ((5 40, 6 40, 6 41, 5 41, 5 40), (5.4 40.4, 5.6 40.4, 5.6 40.6, 5.4 40.6, 5.4 40.4))"
    g = WKT.from_wkt(outer)
    a = gd.geodesic_polygon_area(g)
    shell = gd.geodesic_ring_area(np.array(g.data[0]))
    hole = gd.geodesic_ring_area(np.array(g.data[1]))
    assert abs(a - (abs(shell) - abs(hole))) < 1e-6
    assert 0 < a < abs(shell)


def test_large_geodesic_triangle_vs_girard_bound():
    # Big triangle with 1000+ km geodesic edges: area must sit between the
    # inscribed-sphere (b^2) and circumscribed-sphere (a^2) Girard areas
    # computed from the same Gauss-Bonnet excess.
    tri = np.array([(0.0, 0.0), (20.0, 0.0), (10.0, 25.0), (0.0, 0.0)])
    a = gd.geodesic_ring_area(tri)
    inv = gd.vincenty_inverse(tri[:-1, 0], tri[:-1, 1], tri[1:, 0], tri[1:, 1])
    turn = inv["az1"] - np.roll(inv["az2"], 1)
    turn = (turn + np.pi) % (2 * np.pi) - np.pi
    excess = float(np.sum(turn)) - 2 * np.pi
    if excess < -2 * np.pi:
        excess += 4 * np.pi
    assert gd.WGS84_B ** 2 * excess < a < gd.WGS84_A ** 2 * excess


def test_segment_lengths_meridian_series():
    # meridian arc 0->50N via the standard series (Snyder 3-21)
    e2 = gd._E2
    c0 = 1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256
    c2 = 3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024
    c4 = 15 * e2**2 / 256 + 45 * e2**3 / 1024
    c6 = 35 * e2**3 / 3072
    phi = np.radians(50.0)
    expect = gd.WGS84_A * (c0 * phi - c2 * np.sin(2 * phi) + c4 * np.sin(4 * phi) - c6 * np.sin(6 * phi))
    got = float(gd.geodesic_segment_lengths(np.array([(9.0, 0.0), (9.0, 50.0)]))[0])
    assert abs(got - expect) < 0.01
