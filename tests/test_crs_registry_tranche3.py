"""EPSG registry tranche 3 (r12): full SPCS83 metric set, JGD2000/2011,
CGCS2000, Pulkovo 1995, SWEREF99, Poland, Baltics, RGF93 CC, and friends.

Validation strategy (no pyproj in the container, so truth is layered):
  1. generic per-zone invariants over the WHOLE registry (defining origin
     identity, forward/inverse roundtrip, point-scale sanity) — catches
     wiring, sign, and gross-degree errors;
  2. exact unit-twin agreement between new metric zones and the
     independently hand-validated ftUS zones of earlier tranches — a real
     external anchor for the shared-parameter zones;
  3. coincident-datum crosschecks (SWEREF99 TM == ETRS89/UTM33, JGD2000
     UTM == WGS84 UTM at this engine's datum resolution);
  4. coarse landmark boxes for one zone per new family — traps swapped
     offsets / wrong central meridians.
"""

import math
import re

import numpy as np
import pytest

from duckdb_spatial_spark.functions import proj4 as P
from duckdb_spatial_spark.functions.crs import _PROJ4_STRINGS, transform_xy

US_FT = 1200.0 / 3937.0  # exact US survey foot in metres


def _defs():
    out = {}
    for code, s in _PROJ4_STRINGS.items():
        d = P.parse_proj4(s)
        out[code] = (s, d)
    return out


def test_registry_size_and_parsability():
    defs = _defs()
    # 428 explicit proj4 entries after tranche 3 (plus ~30 analytic
    # builtins and 120 pattern-matched WGS84 UTM codes -> ~578 supported)
    assert len(defs) >= 420, f"registry shrank: {len(defs)}"
    # every registered string parses and projects its own origin
    for code, (s, d) in defs.items():
        assert d is not None, code


def test_generic_zone_invariants():
    """Origin identity + roundtrip + scale sanity for every plain-metre
    tmerc/lcc registry entry (no +pm, no +to_meter, no +units=us-ft —
    those carry extra conventions checked by their own rows/tests)."""
    defs = _defs()
    checked = 0
    for code, (s, d) in defs.items():
        if d.proj not in ("tmerc", "lcc"):
            continue
        if "+pm=" in s or "+to_meter=" in s or "us-ft" in s:
            continue
        g = d.params.get
        lat0, lon0 = g("lat_0", 0.0), g("lon_0", 0.0)
        x0, y0 = g("x_0", 0.0), g("y_0", 0.0)
        # 1. defining identity: the grid/false origin maps to (x_0, y_0)
        x, y = P._fwd(d, np.array([lon0]), np.array([lat0]))
        assert abs(x[0] - x0) < 1e-6 and abs(y[0] - y0) < 1e-6, (
            f"{code}: origin -> ({x[0]}, {y[0]}) != ({x0}, {y0})"
        )
        # pick a zone-interior probe latitude
        if d.proj == "lcc":
            # 2SP: probe between the parallels; 1SP (tranche 4, e.g.
            # Kalianpur): probe at the standard parallel
            plat = (d.params["lat_1"] + d.params.get("lat_2", d.params["lat_1"])) / 2.0
        else:
            plat = lat0 + 0.6 if abs(lat0) > 1e-9 else 30.0
        plon = lon0 + 0.7
        # 2. forward/inverse roundtrip
        px, py = P._fwd(d, np.array([plon]), np.array([plat]))
        rlon, rlat = P._inv(d, px, py)
        assert abs(rlon[0] - plon) < 1e-9 and abs(rlat[0] - plat) < 1e-9, code
        # 3. numeric point scale along the meridian at the probe: SPCS and
        # national grids are designed for ~1e-4 distortion; 1.5e-3 bounds
        # even the wide single-zone conics while catching wrong degrees
        eps = 1e-4
        x2, y2 = P._fwd(d, np.array([plon]), np.array([plat + eps]))
        ground = math.radians(eps) * P._meridian_arc_radius(d.ell, math.radians(plat)) \
            if hasattr(P, "_meridian_arc_radius") else None
        if ground is None:
            e2 = d.ell.e2
            sin2 = math.sin(math.radians(plat)) ** 2
            M = d.ell.a * (1 - e2) / (1 - e2 * sin2) ** 1.5
            ground = math.radians(eps) * M
        grid = math.hypot(x2[0] - px[0], y2[0] - py[0])
        k = grid / ground
        assert 0.9985 < k < 1.0015, f"{code}: meridian scale {k}"
        checked += 1
    assert checked >= 200, checked


@pytest.mark.parametrize(
    "ft_code,m_code",
    [
        ("EPSG:2263", "EPSG:32118"),  # NY Long Island
        ("EPSG:2227", "EPSG:26943"),  # California zone 3
        ("EPSG:2229", "EPSG:26945"),  # California zone 5
        ("EPSG:2276", "EPSG:32138"),  # Texas North Central
        ("EPSG:2272", "EPSG:32129"),  # Pennsylvania South
        ("EPSG:2232", "EPSG:26954"),  # Colorado Central
        ("EPSG:2285", "EPSG:32148"),  # Washington North
        ("EPSG:2236", "EPSG:26958"),  # Florida East
        ("EPSG:3435", "EPSG:26971"),  # Illinois East
    ],
)
def test_unit_twins_anchor_metric_zones(ft_code, m_code):
    """The ftUS zones were validated in earlier tranches (GN7-2 examples,
    landmark roundtrips); their metric twins must agree EXACTLY through
    the survey-foot ratio — an independent anchor on the new table."""
    # a spread of in-zone points (the ft zone's own service area)
    pts = {
        "EPSG:2263": (-73.9, 40.75), "EPSG:2227": (-121.5, 37.6),
        "EPSG:2229": (-118.2, 34.1), "EPSG:2276": (-97.3, 32.8),
        "EPSG:2272": (-76.3, 40.0), "EPSG:2232": (-104.9, 39.0),
        "EPSG:2285": (-122.3, 47.7), "EPSG:2236": (-80.2, 25.8),
        "EPSG:3435": (-87.7, 41.9),
    }
    lon, lat = pts[ft_code]
    fx, fy = transform_xy([lon], [lat], "EPSG:4269", ft_code, always_xy=True)
    mx, my = transform_xy([lon], [lat], "EPSG:4269", m_code, always_xy=True)
    # the ftUS definitions carry sub-mm false-origin roundings
    # (e.g. 6,561,666.667 ftUS = 2000000.0001016 m), so agreement is
    # bounded at 0.5 mm — a wrong parallel or CM would be metres-to-km
    assert abs(fx[0] * US_FT - mx[0]) < 5e-4
    assert abs(fy[0] * US_FT - my[0]) < 5e-4


def test_coincident_datum_crosschecks():
    # SWEREF99 TM is exactly ETRS89 / UTM zone 33N
    ax, ay = transform_xy([16.3], [58.6], "EPSG:4258", "EPSG:3006", always_xy=True)
    bx, by = transform_xy([16.3], [58.6], "EPSG:4258", "EPSG:25833", always_xy=True)
    assert abs(ax[0] - bx[0]) < 1e-6 and abs(ay[0] - by[0]) < 1e-6
    # JGD2000 / UTM 54N coincides with WGS84 / UTM 54N at this engine's
    # datum resolution (both plate-fixed GRS80/WGS84)
    jx, jy = transform_xy([140.1], [36.1], "EPSG:4326", "EPSG:3100", always_xy=True)
    wx, wy = transform_xy([140.1], [36.1], "EPSG:4326", "EPSG:32654", always_xy=True)
    assert abs(jx[0] - wx[0]) < 1e-3 and abs(jy[0] - wy[0]) < 1e-3


def test_landmark_boxes():
    """Coarse expected-range traps: one landmark per new family, bounds
    wide enough for datum nuance but tight enough to catch a wrong CM,
    a swapped false origin, or a dropped sign."""
    cases = [
        # (lon, lat, src, dst, (xmin, xmax), (ymin, ymax))
        (-74.006, 40.7128, "EPSG:4269", "EPSG:32118",
         (285_000, 305_000), (50_000, 70_000)),        # NYC, NY LI metric
        (21.0122, 52.2297, "EPSG:4258", "EPSG:2180",
         (625_000, 650_000), (480_000, 495_000)),       # Warsaw, CS92
        (139.7671, 35.6812, "EPSG:6668", "EPSG:6677",
         (-9_000, -3_000), (-38_000, -33_000)),         # Tokyo Stn, JGD2011 IX
        (116.407, 39.904, "EPSG:4490", "EPSG:4498",
         (20_440_000, 20_460_000), (4_405_000, 4_435_000)),  # Beijing, GK z20
        (18.0686, 59.3293, "EPSG:4258", "EPSG:3006",
         (650_000, 700_000), (6_560_000, 6_600_000)),   # Stockholm, SWEREF99 TM
        (-6.2603, 53.3498, "EPSG:4258", "EPSG:2157",
         (700_000, 730_000), (730_000, 750_000)),       # Dublin, ITM
        (-9.139, 38.722, "EPSG:4258", "EPSG:3763",
         (-95_000, -80_000), (-110_000, -100_000)),     # Lisbon, PT-TM06
        (37.6176, 55.7558, "EPSG:4326", "EPSG:20007",
         (7_300_000, 7_450_000), (6_150_000, 6_220_000)),  # Moscow, P95 GK z7
        (-149.9003, 61.2181, "EPSG:4269", "EPSG:26934",
         (400_000, 600_000), (780_000, 830_000)),       # Anchorage, AK zone 4
        (2.3522, 48.8566, "EPSG:4258", "EPSG:3948",
         (1_650_000, 1_720_000), (7_280_000, 7_310_000)),  # Paris, RGF93 CC48
    ]
    for lon, lat, src, dst, (x0, x1), (y0, y1) in cases:
        x, y = transform_xy([lon], [lat], src, dst, always_xy=True)
        assert x0 < x[0] < x1, f"{dst}: x={x[0]}"
        assert y0 < y[0] < y1, f"{dst}: y={y[0]}"


def test_alaska_zone1_omerc_roundtrip():
    # Juneau sits on the panhandle axis; variant-B omerc roundtrip
    x, y = transform_xy([-134.42], [58.3], "EPSG:4269", "EPSG:26931",
                        always_xy=True)
    lon, lat = transform_xy(x, y, "EPSG:26931", "EPSG:4269", always_xy=True)
    assert abs(lon[0] + 134.42) < 1e-8 and abs(lat[0] - 58.3) < 1e-8
    # easting/northing magnitudes in the zone's designed range
    assert 0 < x[0] < 9_000_000 and -6_000_000 < y[0] < 4_000_000


def test_japan_zone_table_is_the_published_ladder():
    """The 19 zone origins are the survey-act table; spot-pin a few
    directly off the proj4 strings so a transposed row fails loudly."""
    s9 = _PROJ4_STRINGS["EPSG:6677"]
    assert "+lat_0=36" in s9 and "+lon_0=139.8333333333" in s9.replace("'", "")
    s1 = _PROJ4_STRINGS["EPSG:2443"]
    assert "+lat_0=33" in s1 and "+lon_0=129.5" in s1
    s13 = _PROJ4_STRINGS["EPSG:2455"]
    assert "+lat_0=44" in s13 and "+lon_0=144.25" in s13
    # JGD2000 and JGD2011 plane CS share projection parameters
    for i in range(19):
        assert _PROJ4_STRINGS[f"EPSG:{2443 + i}"] == _PROJ4_STRINGS[f"EPSG:{6669 + i}"]
