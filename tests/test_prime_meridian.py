"""+pm= prime-meridian support (NTF Paris / Lambert zones, Bern, Ferro
...): longitudes rotate to Greenwich around the datum leg, exactly
proj's pipeline. Reference: proj 9.x vendored by the reference extension
(proj/functions.cpp); EPSG:2757x definitions per the published registry."""

import numpy as np
import pytest

from duckdb_spatial_spark.functions import proj4 as P
from duckdb_spatial_spark.functions.crs import transform_xy

NTF_PARIS_LL = "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0 +pm=paris"
NTF_GREENWICH_LL = "+proj=longlat +a=6378249.2 +b=6356515 +towgs84=-168,-60,320,0,0,0,0"


def test_projection_origin_is_false_origin():
    """lon=0 (Paris meridian), lat=lat_0 projects to exactly (x_0, y_0) —
    no datum leg (same datum both sides)."""
    x, y = transform_xy([0.0], [46.8], NTF_PARIS_LL, "EPSG:27572", True)
    assert x[0] == pytest.approx(600000.0, abs=1e-6)
    assert y[0] == pytest.approx(2200000.0, abs=1e-6)


def test_pm_rotation_to_greenwich():
    x, y = transform_xy([0.0], [46.8], NTF_PARIS_LL, NTF_GREENWICH_LL, True)
    assert x[0] == pytest.approx(2.337229166666667, abs=1e-12)
    assert y[0] == pytest.approx(46.8, abs=1e-12)
    # and back
    bx, by = transform_xy(x, y, NTF_GREENWICH_LL, NTF_PARIS_LL, True)
    assert bx[0] == pytest.approx(0.0, abs=1e-12)


def test_wgs84_roundtrip_lambert2():
    lon = np.array([2.3522, -1.5536, 5.3698])   # Paris, Nantes, Marseille
    lat = np.array([48.8566, 47.2184, 43.2965])
    X, Y = transform_xy(lon, lat, "EPSG:4326", "EPSG:27572", True)
    blon, blat = transform_xy(X, Y, "EPSG:27572", "EPSG:4326", True)
    np.testing.assert_allclose(blon, lon, rtol=0, atol=1e-7)  # ~1 cm
    np.testing.assert_allclose(blat, lat, rtol=0, atol=1e-7)
    # Paris in Lambert II (étendu numbers): ~ (601 km, 2 429 km)
    assert 600500 < X[0] < 602500
    assert 2425000 < Y[0] < 2432000


def test_all_four_zones_parse_and_project():
    for code, y0 in (("EPSG:27571", 1200000.0), ("EPSG:27572", 2200000.0),
                     ("EPSG:27573", 3200000.0)):
        x, y = transform_xy([2.337229166666667], [0.0], NTF_GREENWICH_LL, code, True)
        assert x[0] == pytest.approx(600000.0, abs=1e-6), code
    x, y = transform_xy([3.0], [42.0], "EPSG:4326", "EPSG:27574", True)
    assert np.isfinite(x[0]) and np.isfinite(y[0])


def test_unknown_pm_name_raises():
    with pytest.raises(ValueError, match="unknown \\+pm"):
        P.parse_proj4("+proj=longlat +ellps=WGS84 +pm=atlantis")
    # numeric offsets are accepted
    d = P.parse_proj4("+proj=longlat +ellps=WGS84 +pm=-17.6666666667")
    assert d.pm == pytest.approx(-17.6666666667)
