"""proj4-string front-end for ST_Transform — the long-tail CRS path.

The reference embeds the full PROJ database (``spatial/src/spatial/proj/
functions.cpp:487-508``; vendored proj-9.1.1 in ``deps/CMakeLists.txt``),
so any ``+proj=...`` string or EPSG code resolves. This container has no
pyproj, so this module implements the projection pipeline from the public
formulas (Snyder, *Map Projections — A Working Manual*; Karney/Krüger
series for transverse mercator; EPSG Guidance Note 7-2; swisstopo's
published oblique-mercator formulas):

    src projected -> src geodetic (src ellipsoid)
        -> [towgs84 Helmert via geocentric XYZ, EPSG 9606 position-vector]
        -> WGS84 geodetic -> dst geodetic (dst ellipsoid) -> dst projected

Supported ``+proj`` kinds: longlat, tmerc, utm, merc, webmerc, lcc
(1SP & 2SP), aea, stere (polar aspects), sterea (oblique stereographic,
EPSG 9809 — Dutch RD), laea (EPSG 9820 — ETRS89-LAEA), somerc, cass
(EPSG 9806 — cadastral long tail), omerc (Hotine oblique Mercator,
EPSG 9812 variant A via +no_uoff / 9815 variant B — Borneo RSO, Alaska
zone 1), krovak (EPSG 9819 — S-JTSK), eqc (EPSG 1028 — World
Equidistant Cylindrical), aeqd (geodesic-based, WGS84/GRS80).
Ellipsoids: the common
``+ellps`` names plus explicit ``+a``/``+b``/``+rf``/``+f``. Units via
``+units``/``+to_meter``. Anything else raises with the offending token so
the error is actionable.

All kernels are vectorized numpy over coordinate arrays — the pandas-UDF
caller hands whole Arrow batches through, no per-row Python.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# ellipsoids (a, 1/f); rf=0 => sphere
# ---------------------------------------------------------------------------
ELLIPSOIDS = {
    "WGS84": (6378137.0, 298.257223563),
    "GRS80": (6378137.0, 298.257222101),
    "airy": (6377563.396, 299.3249646),
    "mod_airy": (6377340.189, 299.3249646),
    "bessel": (6377397.155, 299.1528128),
    "intl": (6378388.0, 297.0),
    "clrk66": (6378206.4, 294.9786982),
    "clrk80": (6378249.145, 293.465),
    "clrk80ign": (6378249.2, 293.4660212936269),
    "krass": (6378245.0, 298.3),
    "evrst30": (6377276.345, 300.8017),
    "evrstSS": (6377298.556, 300.8017),
    "GRS67": (6378160.0, 298.2471674270),
    "aust_SA": (6378160.0, 298.25),
    "helmert": (6378200.0, 298.3),
    "sphere": (6370997.0, 0.0),
}

_UNITS = {"m": 1.0, "us-ft": 1200.0 / 3937.0, "ft": 0.3048, "km": 1000.0}


class Ellipsoid:
    __slots__ = ("a", "f", "e2", "e", "n", "A", "alpha", "beta")

    def __init__(self, a: float, rf: float):
        self.a = a
        self.f = 0.0 if rf == 0 else 1.0 / rf
        self.e2 = self.f * (2 - self.f)
        self.e = math.sqrt(self.e2)
        n = self.f / (2 - self.f)
        self.n = n
        # Krüger rectifying radius + series to n^4 (micrometer-level)
        self.A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
        self.alpha = (
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
            61 * n**3 / 240 - 103 * n**4 / 140,
            49561 * n**4 / 161280,
        )
        self.beta = (
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
            17 * n**3 / 480 - 37 * n**4 / 840,
            4397 * n**4 / 161280,
        )


_WGS84 = Ellipsoid(*ELLIPSOIDS["WGS84"])


# ---------------------------------------------------------------------------
# proj4 string parsing
# ---------------------------------------------------------------------------
class ProjDef:
    __slots__ = (
        "proj", "ell", "params", "towgs84", "to_meter", "nadgrids", "pm",
        "geoidgrids", "vto_meter",
    )

    def __init__(self, proj, ell, params, towgs84, to_meter, nadgrids=None,
                 pm=0.0, geoidgrids=None, vto_meter=1.0):
        self.proj = proj
        self.ell = ell
        self.params = params
        self.towgs84 = towgs84
        self.to_meter = to_meter
        # +nadgrids= spec string (NTv2 .gsb path list); the grid loads
        # lazily per process (functions/ntv2.py lru_cache) so ProjDef
        # stays a picklable bag of primitives for executor shipping
        self.nadgrids = nadgrids
        # +pm= prime-meridian Greenwich offset in degrees: longitudes of
        # this CRS are measured from there (NTF Paris, Bern, Ferro, ...)
        self.pm = pm
        # +geoidgrids= GTX vertical grid: this CRS's z is ORTHOMETRIC
        # height above the geoid; lazily loaded (functions/gtx.py)
        self.geoidgrids = geoidgrids
        # +vto_meter= vertical unit factor (PROJ semantics): z in this
        # CRS times vto_meter = meters; -1 models depth axes (MSL depth)
        self.vto_meter = vto_meter


def _parse_angle(v: str) -> float:
    # proj4 accepts plain degrees and dDmM's" forms; registry uses degrees
    return float(v)


# every +key this engine consumes; anything else is semantically meaningful
# in PROJ (e.g. +pm, +axis, +nadgrids, +geoidgrids) and silently dropping it
# would return coordinates that are wrong by up to degrees.
_CONSUMED_KEYS = frozenset(
    {
        "proj", "a", "rf", "f", "b", "ellps", "datum", "towgs84", "to_meter",
        "units", "lat_0", "lat_1", "lat_2", "lat_ts", "lon_0", "k", "k_0",
        "x_0", "y_0", "zone", "south", "nadgrids", "pm", "geoidgrids",
        "vto_meter", "lonc", "alpha", "gamma", "no_uoff",
    }
)
# +pm= named prime meridians (proj's `-lm` list, Greenwich offsets in deg)
_PRIME_MERIDIANS = {
    "greenwich": 0.0,
    "lisbon": -9.131906111111112,
    "paris": 2.337229166666667,
    "bogota": -74.08091666666667,
    "madrid": -3.687938888888889,
    "rome": 12.45233333333333,
    "bern": 7.439583333333333,
    "jakarta": 106.8077194444444,
    "ferro": -17.66666666666667,
    "brussels": 4.367975,
    "stockholm": 18.05827777777778,
    "athens": 23.7163375,
    "oslo": 10.72291666666667,
}
# +datum= shorthand expansions (proj's datum table): ellipsoid + either a
# Helmert or a REQUIRED grid file. Datums whose published transform is
# grid-based raise loudly unless +nadgrids= is given — silently treating
# NAD27 as WGS84 would be wrong by up to ~100 m.
_DATUMS = {
    "WGS84": ("WGS84", [0, 0, 0, 0, 0, 0, 0], False),
    "NAD83": ("GRS80", [0, 0, 0, 0, 0, 0, 0], False),
    "ETRS89": ("GRS80", [0, 0, 0, 0, 0, 0, 0], False),
    "NAD27": ("clrk66", None, True),   # NTv2/NADCON grids only
    "nzgd49": ("intl", [59.47, -5.04, 187.44, 0.47, -0.1, 1.024, -4.5993], False),
    "potsdam": ("bessel", [598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7], False),
    "ire65": ("mod_airy", [482.530, -130.596, 564.557, -1.042, -0.214, -0.631, 8.15], False),
    "OSGB36": ("airy", [446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894], False),
}
# no-op decorations PROJ strings routinely carry
_BENIGN_KEYS = frozenset({"no_defs", "wktext", "type", "over", "approx"})


def parse_proj4(s: str) -> ProjDef:
    params: dict[str, str] = {}
    for tok in s.split():
        if not tok.startswith("+"):
            continue
        body = tok[1:]
        if "=" in body:
            k, v = body.split("=", 1)
            params[k] = v
        else:
            params[body] = "true"
    proj = params.get("proj")
    if proj is None:
        raise ValueError(f"proj4 string missing +proj: {s!r}")
    for k, v in params.items():
        if k in _CONSUMED_KEYS or k in _BENIGN_KEYS:
            continue
        raise ValueError(
            f"unsupported proj4 parameter +{k}={v} in {s!r}: this engine "
            f"consumes {sorted(_CONSUMED_KEYS)}; +axis changes the "
            f"result and cannot be ignored"
        )

    nadgrids = params.get("nadgrids")
    if nadgrids == "@null":
        nadgrids = None

    geoidgrids = params.get("geoidgrids")
    if geoidgrids == "@null":
        geoidgrids = None
    vto_meter = float(params.get("vto_meter", 1.0))
    if vto_meter == 0.0:
        raise ValueError("+vto_meter=0 is not a unit")

    pm = 0.0
    if "pm" in params:
        v = params["pm"]
        if v.lower() in _PRIME_MERIDIANS:
            pm = _PRIME_MERIDIANS[v.lower()]
        else:
            try:
                pm = float(v)
            except ValueError:
                raise ValueError(
                    f"unknown +pm={v} in {s!r} (named: {sorted(_PRIME_MERIDIANS)})"
                ) from None

    datum = params.get("datum")
    datum_ellps, datum_towgs84 = None, None
    if datum is not None:
        if datum not in _DATUMS:
            raise ValueError(
                f"unknown +datum={datum} in {s!r} (known: {sorted(_DATUMS)}); "
                f"spell out +ellps/+towgs84 or +nadgrids explicitly"
            )
        datum_ellps, datum_towgs84, needs_grid = _DATUMS[datum]
        if needs_grid and nadgrids is None:
            raise ValueError(
                f"+datum={datum} is grid-shift based (NTv2); pass "
                f"+nadgrids=<file.gsb> in {s!r} — treating it as WGS84 "
                f"would be wrong by up to ~100 m"
            )

    if "a" in params:
        a = float(params["a"])
        if "rf" in params:
            rf = float(params["rf"])
        elif "f" in params:
            f = float(params["f"])
            rf = 0.0 if f == 0 else 1.0 / f
        elif "b" in params:
            b = float(params["b"])
            rf = 0.0 if b == a else a / (a - b)
        else:
            rf = 0.0  # sphere
        ell = Ellipsoid(a, rf)
    else:
        name = params.get("ellps", datum_ellps or "WGS84")
        if datum_ellps is not None:
            name = datum_ellps  # +datum wins (proj semantics)
        if name not in ELLIPSOIDS:
            raise ValueError(f"unknown +ellps={name} in {s!r}")
        ell = Ellipsoid(*ELLIPSOIDS[name])

    towgs84 = None
    if "towgs84" in params:
        vals = [float(v) for v in params["towgs84"].split(",")]
        if len(vals) == 3:
            vals += [0.0, 0.0, 0.0, 0.0]
        if len(vals) != 7:
            raise ValueError(f"+towgs84 needs 3 or 7 values: {s!r}")
        if any(vals):
            towgs84 = vals
    elif datum_towgs84 is not None and any(datum_towgs84):
        towgs84 = list(datum_towgs84)
    to_meter = float(params["to_meter"]) if "to_meter" in params else _UNITS.get(
        params.get("units", "m")
    )
    if to_meter is None:
        raise ValueError(f"unsupported +units={params.get('units')} in {s!r}")

    num = {}
    for k in (
        "lat_0", "lat_1", "lat_2", "lat_ts", "lon_0", "k", "k_0", "x_0", "y_0",
        "zone", "lonc", "alpha", "gamma",
    ):
        if k in params:
            num[k] = _parse_angle(params[k])
    num["south"] = "south" in params
    num["no_uoff"] = "no_uoff" in params
    if proj not in (
        "longlat", "latlong", "tmerc", "utm", "merc", "webmerc", "lcc", "aea",
        "stere", "sterea", "laea", "somerc", "cass", "omerc", "krovak", "eqc",
        "aeqd", "nzmg",
    ):
        raise ValueError(f"unsupported +proj={proj} (supported: longlat, tmerc, utm, merc, "
                         f"webmerc, lcc, aea, stere, sterea, laea, somerc, cass, omerc, "
                         f"krovak, eqc, aeqd, nzmg)")
    return ProjDef(proj, ell, num, towgs84, to_meter, nadgrids, pm,
                   geoidgrids, vto_meter)


# ---------------------------------------------------------------------------
# datum shift: geodetic <-> geocentric + 7-param Helmert (EPSG 9606,
# position-vector sign convention — the one proj's +towgs84 uses)
# ---------------------------------------------------------------------------
def _geodetic_to_xyz(ell: Ellipsoid, lon, lat, h=0.0):
    lon_r = np.radians(lon)
    lat_r = np.radians(lat)
    s, c = np.sin(lat_r), np.cos(lat_r)
    N = ell.a / np.sqrt(1 - ell.e2 * s * s)
    x = (N + h) * c * np.cos(lon_r)
    y = (N + h) * c * np.sin(lon_r)
    z = (N * (1 - ell.e2) + h) * s
    return x, y, z


def _xyz_to_geodetic(ell: Ellipsoid, x, y, z):
    lon = np.degrees(np.arctan2(y, x))
    p = np.hypot(x, y)
    lat = np.arctan2(z, p * (1 - ell.e2))
    for _ in range(6):
        s = np.sin(lat)
        N = ell.a / np.sqrt(1 - ell.e2 * s * s)
        lat = np.arctan2(z + ell.e2 * N * s, p)
    return lon, np.degrees(lat)


_ARCSEC = math.pi / (180.0 * 3600.0)


def _helmert(xyz, p, inverse=False):
    dx, dy, dz, rx, ry, rz, ds = p
    rx, ry, rz = rx * _ARCSEC, ry * _ARCSEC, rz * _ARCSEC
    m = 1 + ds * 1e-6
    x, y, z = xyz
    if not inverse:
        return (
            dx + m * (x - rz * y + ry * z),
            dy + m * (rz * x + y - rx * z),
            dz + m * (-ry * x + rx * y + z),
        )
    # inverse of the linearized rotation (I+S): transposing S alone leaves
    # an O(r^2)·X error (~2.5 mm at RD New's 4" rotations); adding the S^2
    # Neumann term (S^2 v = r(r·v) − |r|^2 v) brings it to O(r^3) (~nm)
    x, y, z = (x - dx) / m, (y - dy) / m, (z - dz) / m
    cx = x + rz * y - ry * z
    cy = -rz * x + y + rx * z
    cz = ry * x - rx * y + z
    dot = rx * x + ry * y + rz * z
    r2 = rx * rx + ry * ry + rz * rz
    return (
        cx + rx * dot - r2 * x,
        cy + ry * dot - r2 * y,
        cz + rz * dot - r2 * z,
    )


# ---------------------------------------------------------------------------
# kernels (all take/return degrees lon/lat and meters x/y)
# ---------------------------------------------------------------------------
def _t_fac(ell, lat_r):
    s = np.sin(lat_r)
    return np.tan(math.pi / 4 - lat_r / 2) / ((1 - ell.e * s) / (1 + ell.e * s)) ** (ell.e / 2)


def _m_fac(ell, lat_r):
    s = np.sin(lat_r)
    return np.cos(lat_r) / np.sqrt(1 - ell.e2 * s * s)


def _q_fac(ell, lat_r):
    s = np.sin(lat_r)
    if ell.e == 0:
        return 2 * s
    return (1 - ell.e2) * (
        s / (1 - ell.e2 * s * s) - (1 / (2 * ell.e)) * np.log((1 - ell.e * s) / (1 + ell.e * s))
    )


def _conformal_to_geodetic(ell, tp):
    """lat from conformal factor t (Snyder 7-9 fixed point)."""
    phi = math.pi / 2 - 2 * np.arctan(tp)
    for _ in range(8):
        s = np.sin(phi)
        phi = math.pi / 2 - 2 * np.arctan(tp * ((1 - ell.e * s) / (1 + ell.e * s)) ** (ell.e / 2))
    return phi


# --- transverse mercator (Krüger series, arbitrary lat_0/k_0/x_0/y_0) -----
def _tm_mu(ell, lat0_r: float) -> float:
    """Rectifying 'xi' of the central latitude (for the meridian-arc offset)."""
    if lat0_r == 0.0:
        return 0.0
    t = math.sinh(
        math.atanh(math.sin(lat0_r)) - ell.e * math.atanh(ell.e * math.sin(lat0_r))
    )
    xi = math.atan2(t, 1.0)  # cos(0)=1
    y = xi
    for j, a in enumerate(ell.alpha, start=1):
        y += a * math.sin(2 * j * xi)
    return y


def tmerc_forward(ell, lon, lat, lat_0, lon_0, k_0, x_0, y_0):
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64)) - math.radians(lon_0)
    lon_r = (lon_r + math.pi) % (2 * math.pi) - math.pi
    t = np.sinh(np.arctanh(np.sin(lat_r)) - ell.e * np.arctanh(ell.e * np.sin(lat_r)))
    xi = np.arctan2(t, np.cos(lon_r))
    eta = np.arctanh(np.sin(lon_r) / np.sqrt(1 + t * t))
    x = eta.copy()
    y = xi.copy()
    for j, a in enumerate(ell.alpha, start=1):
        x = x + a * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        y = y + a * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
    M0 = ell.A * _tm_mu(ell, math.radians(lat_0))
    return x_0 + k_0 * ell.A * x, y_0 + k_0 * (ell.A * y - M0)


def tmerc_inverse(ell, X, Y, lat_0, lon_0, k_0, x_0, y_0):
    M0 = ell.A * _tm_mu(ell, math.radians(lat_0))
    x = (np.asarray(X, dtype=np.float64) - x_0) / (k_0 * ell.A)
    y = (np.asarray(Y, dtype=np.float64) - y_0 + k_0 * M0) / (k_0 * ell.A)
    xi = y.copy()
    eta = x.copy()
    for j, b in enumerate(ell.beta, start=1):
        xi = xi - b * np.sin(2 * j * y) * np.cosh(2 * j * x)
        eta = eta - b * np.cos(2 * j * y) * np.sinh(2 * j * x)
    chi = np.arcsin(np.clip(np.sin(xi) / np.cosh(eta), -1, 1))
    psi = np.arctanh(np.clip(np.sin(chi), -0.999999999999, 0.999999999999))
    sinlat = np.sin(chi)
    for _ in range(10):
        sinlat = np.tanh(psi + ell.e * np.arctanh(ell.e * sinlat))
    lat = np.degrees(np.arcsin(np.clip(sinlat, -1, 1)))
    lon = lon_0 + np.degrees(np.arctan2(np.sinh(eta), np.cos(xi)))
    return lon, lat


# --- mercator (EPSG 9804/9805) ---------------------------------------------
def merc_forward(ell, lon, lat, lon_0, k_0, lat_ts, x_0, y_0):
    if lat_ts is not None:
        k_0 = _m_fac(ell, np.array([math.radians(lat_ts)]))[0]
    lat_r = np.radians(np.clip(np.asarray(lat, dtype=np.float64), -89.9999, 89.9999))
    x = x_0 + k_0 * ell.a * (np.radians(np.asarray(lon, dtype=np.float64) - lon_0))
    y = y_0 - k_0 * ell.a * np.log(_t_fac(ell, lat_r))
    return x, y


def merc_inverse(ell, X, Y, lon_0, k_0, lat_ts, x_0, y_0):
    if lat_ts is not None:
        k_0 = _m_fac(ell, np.array([math.radians(lat_ts)]))[0]
    lon = lon_0 + np.degrees((np.asarray(X, dtype=np.float64) - x_0) / (k_0 * ell.a))
    tp = np.exp(-(np.asarray(Y, dtype=np.float64) - y_0) / (k_0 * ell.a))
    return lon, np.degrees(_conformal_to_geodetic(ell, tp))


# --- lambert conformal conic (1SP: EPSG 9801, 2SP: EPSG 9802) --------------
def _lcc_setup(ell, lat_1, lat_2, lat_0, k_0):
    p0 = math.radians(lat_0)
    if lat_2 is None:
        # 1SP: n = sin(lat_1); F from k_0 at lat_1
        p1 = math.radians(lat_1 if lat_1 is not None else lat_0)
        n = math.sin(p1)
        m1 = _m_fac(ell, np.array([p1]))[0]
        t1 = _t_fac(ell, np.array([p1]))[0]
        F_ = k_0 * m1 / (n * t1**n)
    else:
        p1, p2 = math.radians(lat_1), math.radians(lat_2)
        m1 = _m_fac(ell, np.array([p1]))[0]
        m2 = _m_fac(ell, np.array([p2]))[0]
        t1 = _t_fac(ell, np.array([p1]))[0]
        t2 = _t_fac(ell, np.array([p2]))[0]
        n = math.log(m1 / m2) / math.log(t1 / t2)
        F_ = m1 / (n * t1**n)
    t0 = _t_fac(ell, np.array([p0]))[0]
    rho0 = ell.a * F_ * t0**n
    return n, F_, rho0


def lcc_forward(ell, lon, lat, lat_1, lat_2, lat_0, lon_0, k_0, x_0, y_0):
    n, F_, rho0 = _lcc_setup(ell, lat_1, lat_2, lat_0, k_0)
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    rho = ell.a * F_ * _t_fac(ell, lat_r) ** n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    return x_0 + rho * np.sin(th), y_0 + rho0 - rho * np.cos(th)


def lcc_inverse(ell, X, Y, lat_1, lat_2, lat_0, lon_0, k_0, x_0, y_0):
    n, F_, rho0 = _lcc_setup(ell, lat_1, lat_2, lat_0, k_0)
    x = np.asarray(X, dtype=np.float64) - x_0
    y = np.asarray(Y, dtype=np.float64) - y_0
    rho = np.sign(n) * np.hypot(x, rho0 - y)
    th = np.arctan2(x, rho0 - y)
    tp = (rho / (ell.a * F_)) ** (1 / n)
    lat = np.degrees(_conformal_to_geodetic(ell, tp))
    return lon_0 + np.degrees(th / n), lat


# --- albers equal area (EPSG 9822) -----------------------------------------
def _aea_setup(ell, lat_1, lat_2, lat_0):
    p0, p1, p2 = (math.radians(v) for v in (lat_0, lat_1, lat_2))
    m1 = _m_fac(ell, np.array([p1]))[0]
    m2 = _m_fac(ell, np.array([p2]))[0]
    q1 = _q_fac(ell, np.array([p1]))[0]
    q2 = _q_fac(ell, np.array([p2]))[0]
    q0 = _q_fac(ell, np.array([p0]))[0]
    n = (m1 * m1 - m2 * m2) / (q2 - q1)
    C = m1 * m1 + n * q1
    rho0 = ell.a * math.sqrt(C - n * q0) / n
    return n, C, rho0


def aea_forward(ell, lon, lat, lat_1, lat_2, lat_0, lon_0, x_0, y_0):
    n, C, rho0 = _aea_setup(ell, lat_1, lat_2, lat_0)
    q = _q_fac(ell, np.radians(np.asarray(lat, dtype=np.float64)))
    rho = ell.a * np.sqrt(C - n * q) / n
    th = n * np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    return x_0 + rho * np.sin(th), y_0 + rho0 - rho * np.cos(th)


def aea_inverse(ell, X, Y, lat_1, lat_2, lat_0, lon_0, x_0, y_0):
    n, C, rho0 = _aea_setup(ell, lat_1, lat_2, lat_0)
    x = np.asarray(X, dtype=np.float64) - x_0
    y = np.asarray(Y, dtype=np.float64) - y_0
    # n < 0 on southern cones: rho carries n's sign (forward emits
    # negative rho there) and theta measures from the mirrored axis —
    # same convention as lcc_inverse
    rho = np.sign(n) * np.hypot(x, rho0 - y)
    th = np.arctan2(np.sign(n) * x, np.sign(n) * (rho0 - y))
    q = (C - (rho * n / ell.a) ** 2) / n
    lat = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(8):
        s = np.sin(lat)
        lat = lat + (
            (1 - ell.e2 * s * s) ** 2
            / (2 * np.cos(lat))
            * (
                q / (1 - ell.e2)
                - s / (1 - ell.e2 * s * s)
                + (1 / (2 * ell.e)) * np.log((1 - ell.e * s) / (1 + ell.e * s))
            )
        )
    return lon_0 + np.degrees(th / n), np.degrees(lat)


# --- polar stereographic (EPSG 9810 variant A / 9829 variant B) ------------
def stere_forward(ell, lon, lat, lat_0, lat_ts, lon_0, k_0, x_0, y_0):
    south = lat_0 < 0
    denom = math.sqrt((1 + ell.e) ** (1 + ell.e) * (1 - ell.e) ** (1 - ell.e))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    phi = -lat_r if south else lat_r
    t = _t_fac(ell, phi)
    if lat_ts is None:
        rho = 2 * ell.a * (k_0 or 1.0) * t / denom
    else:
        tsr = math.radians(abs(lat_ts))
        rho = ell.a * _m_fac(ell, np.array([tsr]))[0] * t / _t_fac(ell, np.array([tsr]))[0]
    th = lon_r - math.radians(lon_0)
    x = x_0 + rho * np.sin(th)
    y = y_0 + (rho * np.cos(th) if south else -rho * np.cos(th))
    return x, y


def stere_inverse(ell, X, Y, lat_0, lat_ts, lon_0, k_0, x_0, y_0):
    south = lat_0 < 0
    denom = math.sqrt((1 + ell.e) ** (1 + ell.e) * (1 - ell.e) ** (1 - ell.e))
    x = np.asarray(X, dtype=np.float64) - x_0
    y = np.asarray(Y, dtype=np.float64) - y_0
    rho = np.hypot(x, y)
    if lat_ts is None:
        tp = rho * denom / (2 * ell.a * (k_0 or 1.0))
    else:
        tsr = math.radians(abs(lat_ts))
        tp = rho * _t_fac(ell, np.array([tsr]))[0] / (ell.a * _m_fac(ell, np.array([tsr]))[0])
    phi = _conformal_to_geodetic(ell, tp)
    lon = math.radians(lon_0) + (np.arctan2(x, y) if south else np.arctan2(x, -y))
    lat = -phi if south else phi
    lon_deg = (np.degrees(lon) + 180.0) % 360.0 - 180.0
    return lon_deg, np.degrees(lat)


# --- Cassini-Soldner (EPSG 9806; cadastral long tail — Trinidad Grid,
# old Czech/Germany/Malaysia cadastres) ------------------------------------
def _meridian_arc(ell, lat_r):
    """Meridian distance M(lat) = A * rectifying-latitude (Krüger series
    reused from the tmerc kernel), vectorized."""
    lat_r = np.asarray(lat_r, dtype=np.float64)
    t = np.sinh(np.arctanh(np.sin(lat_r)) - ell.e * np.arctanh(ell.e * np.sin(lat_r)))
    xi = np.arctan2(t, np.ones_like(t))
    y = xi.copy()
    for j, a in enumerate(ell.alpha, start=1):
        y += a * np.sin(2 * j * xi)
    return ell.A * y


def _footpoint(ell, M):
    """Footpoint latitude for meridian distance M (inverse rectifying
    series + conformal iteration — tmerc_inverse's eta=0 path)."""
    xi = np.asarray(M, dtype=np.float64) / ell.A
    xip = xi.copy()
    for j, b in enumerate(ell.beta, start=1):
        xip -= b * np.sin(2 * j * xi)
    psi = np.arctanh(np.clip(np.sin(xip), -0.999999999999, 0.999999999999))
    sinlat = np.sin(xip)
    for _ in range(10):
        sinlat = np.tanh(psi + ell.e * np.arctanh(ell.e * sinlat))
    return np.arcsin(np.clip(sinlat, -1, 1))


def cass_forward(ell, lon, lat, lat_0, lon_0, x_0, y_0):
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    dl = (dl + math.pi) % (2 * math.pi) - math.pi
    s, c = np.sin(lat_r), np.cos(lat_r)
    A = dl * c
    T = np.tan(lat_r) ** 2
    C = ell.e2 * c * c / (1 - ell.e2)
    nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
    M = _meridian_arc(ell, lat_r)
    M0 = float(_meridian_arc(ell, np.array([math.radians(lat_0)]))[0])
    x = nu * (A - T * A**3 / 6 - (8 - T + 8 * C) * T * A**5 / 120)
    y = M - M0 + nu * np.tan(lat_r) * (A * A / 2 + (5 - T + 6 * C) * A**4 / 24)
    return x_0 + x, y_0 + y


def cass_inverse(ell, X, Y, lat_0, lon_0, x_0, y_0):
    M0 = float(_meridian_arc(ell, np.array([math.radians(lat_0)]))[0])
    M1 = M0 + (np.asarray(Y, dtype=np.float64) - y_0)
    phi1 = _footpoint(ell, M1)
    s1, c1 = np.sin(phi1), np.cos(phi1)
    T1 = np.tan(phi1) ** 2
    nu1 = ell.a / np.sqrt(1 - ell.e2 * s1 * s1)
    rho1 = ell.a * (1 - ell.e2) / (1 - ell.e2 * s1 * s1) ** 1.5
    D = (np.asarray(X, dtype=np.float64) - x_0) / nu1
    phi = phi1 - (nu1 * np.tan(phi1) / rho1) * (D * D / 2 - (1 + 3 * T1) * D**4 / 24)
    lam = np.radians(lon_0) + (D - T1 * D**3 / 3 + (1 + 3 * T1) * T1 * D**5 / 15) / c1
    return np.degrees(lam), np.degrees(phi)


# --- Hotine oblique Mercator (EPSG 9812 variant A / 9815 variant B;
# Borneo RSO, Alaska zone 1, Swiss-adjacent obliques) -----------------------
def _omerc_setup(ell, lat_c, lon_c, alpha_c, gamma_c, k_c):
    e, e2 = ell.e, ell.e2
    pc = math.radians(lat_c)
    sc, cc = math.sin(pc), math.cos(pc)
    B = math.sqrt(1 + e2 * cc**4 / (1 - e2))
    A_ = ell.a * B * k_c * math.sqrt(1 - e2) / (1 - e2 * sc * sc)
    t0 = math.tan(math.pi / 4 - pc / 2) / ((1 - e * sc) / (1 + e * sc)) ** (e / 2)
    D = B * math.sqrt(1 - e2) / (cc * math.sqrt(1 - e2 * sc * sc))
    D2 = max(D * D, 1.0)
    F = D + math.sqrt(D2 - 1) * (1 if pc >= 0 else -1)
    H = F * t0**B
    G = (F - 1 / F) / 2
    g0 = math.asin(min(max(math.sin(math.radians(alpha_c)) / D, -1.0), 1.0))
    lam0 = math.radians(lon_c) - math.asin(min(max(G * math.tan(g0), -1.0), 1.0)) / B
    # variant B's u offset at the projection center (EPSG 9815); the
    # guide's special case: when alpha_c = 90 exactly, the atan2 form
    # degenerates (cos(alpha_c) = 0 would give A*pi/(2B)) and uc is
    # instead A*(lon_c - lam0)
    if abs(alpha_c - 90.0) < 1e-12:
        uc = A_ * (math.radians(lon_c) - lam0)
    else:
        uc = (
            abs(A_ / B * math.atan2(math.sqrt(D2 - 1), math.cos(math.radians(alpha_c))))
            * (1 if pc >= 0 else -1)
        )
    return B, A_, H, g0, lam0, uc


def omerc_forward(ell, lon, lat, lat_c, lon_c, alpha_c, gamma_c, k_c,
                  x_0, y_0, no_uoff):
    B, A_, H, g0, lam0, uc = _omerc_setup(ell, lat_c, lon_c, alpha_c, gamma_c, k_c)
    e = ell.e
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    dl = B * ((np.radians(np.asarray(lon, dtype=np.float64)) - lam0 + math.pi)
              % (2 * math.pi) - math.pi)
    s = np.sin(lat_r)
    t = np.tan(math.pi / 4 - lat_r / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)
    Q = H / t**B
    S = (Q - 1 / Q) / 2
    Tf = (Q + 1 / Q) / 2
    V = np.sin(dl)
    U = (-V * math.cos(g0) + S * math.sin(g0)) / Tf
    v = A_ * np.log((1 - U) / (1 + U)) / (2 * B)
    u = A_ * np.arctan2(S * math.cos(g0) + V * math.sin(g0), np.cos(dl)) / B
    if not no_uoff:
        u = u - uc
    gr = math.radians(gamma_c)
    E = v * math.cos(gr) + u * math.sin(gr) + x_0
    N = u * math.cos(gr) - v * math.sin(gr) + y_0
    return E, N


def omerc_inverse(ell, X, Y, lat_c, lon_c, alpha_c, gamma_c, k_c,
                  x_0, y_0, no_uoff):
    B, A_, H, g0, lam0, uc = _omerc_setup(ell, lat_c, lon_c, alpha_c, gamma_c, k_c)
    gr = math.radians(gamma_c)
    Ep = np.asarray(X, dtype=np.float64) - x_0
    Np = np.asarray(Y, dtype=np.float64) - y_0
    v = Ep * math.cos(gr) - Np * math.sin(gr)
    u = Np * math.cos(gr) + Ep * math.sin(gr)
    if not no_uoff:
        u = u + uc
    Q = np.exp(-B * v / A_)
    S = (Q - 1 / Q) / 2
    Tf = (Q + 1 / Q) / 2
    V = np.sin(B * u / A_)
    U = (V * math.cos(g0) + S * math.sin(g0)) / Tf
    t = (H / np.sqrt((1 + U) / (1 - U))) ** (1 / B)
    phi = _conformal_to_geodetic(ell, t)
    lam = lam0 - np.arctan2(S * math.cos(g0) - V * math.sin(g0), np.cos(B * u / A_)) / B
    lam = (lam + math.pi) % (2 * math.pi) - math.pi
    return np.degrees(lam), np.degrees(phi)


# --- equidistant cylindrical (EPSG 1028 ellipsoidal / Plate Carrée;
# WGS 84 / World Equidistant Cylindrical EPSG:4087) -------------------------
def eqc_forward(ell, lon, lat, lat_ts, lat_0, lon_0, x_0, y_0):
    t1 = math.radians(lat_ts)
    nu1_cos = ell.a * math.cos(t1) / math.sqrt(1 - ell.e2 * math.sin(t1) ** 2)
    dl = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    dl = (dl + math.pi) % (2 * math.pi) - math.pi
    M0 = float(_meridian_arc(ell, np.array([math.radians(lat_0)]))[0])
    x = x_0 + nu1_cos * dl
    y = y_0 + _meridian_arc(ell, np.radians(np.asarray(lat, dtype=np.float64))) - M0
    return x, y


def eqc_inverse(ell, X, Y, lat_ts, lat_0, lon_0, x_0, y_0):
    t1 = math.radians(lat_ts)
    nu1_cos = ell.a * math.cos(t1) / math.sqrt(1 - ell.e2 * math.sin(t1) ** 2)
    M0 = float(_meridian_arc(ell, np.array([math.radians(lat_0)]))[0])
    phi = _footpoint(ell, M0 + (np.asarray(Y, dtype=np.float64) - y_0))
    lam = math.radians(lon_0) + (np.asarray(X, dtype=np.float64) - x_0) / nu1_cos
    return np.degrees(lam), np.degrees(phi)


# --- azimuthal equidistant (geodesic-based, the proj/GeographicLib
# formulation: x = s·sin(az), y = s·cos(az) from the center — the
# buffer-in-meters-around-a-point projection) -------------------------------
def _aeqd_check_ell(ell):
    # the geodesic engine (functions/geodesy.py Vincenty) is WGS84; GRS80
    # differs by 0.1 mm in b — accept both, refuse anything else honestly
    if abs(ell.a - 6378137.0) > 1e-6 or abs(ell.f - 1 / 298.257223563) > 1e-9:
        raise ValueError(
            "+proj=aeqd supported on WGS84/GRS80 only (geodesic kernel is "
            "WGS84; pass +ellps=WGS84 or +ellps=GRS80)"
        )


def aeqd_forward(ell, lon, lat, lat_0, lon_0, x_0, y_0):
    from .geodesy import vincenty_inverse

    _aeqd_check_ell(ell)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    inv = vincenty_inverse(
        np.full_like(lon, lon_0), np.full_like(lat, lat_0), lon, lat
    )
    if not np.all(inv["converged"]):
        bad = np.flatnonzero(~np.asarray(inv["converged"]))
        raise ValueError(
            f"+proj=aeqd: Vincenty inverse did not converge for "
            f"{bad.size} near-antipodal point(s) (first at index "
            f"{int(bad[0])}, lon={float(lon.flat[bad[0]])}, "
            f"lat={float(lat.flat[bad[0]])}); results there would be "
            f"silently metres-level wrong (PROJ's GeographicLib solver "
            f"always converges). Keep inputs out of the antipodal "
            f"neighbourhood of the projection centre"
        )
    return x_0 + inv["s"] * np.sin(inv["az1"]), y_0 + inv["s"] * np.cos(inv["az1"])


def aeqd_inverse(ell, X, Y, lat_0, lon_0, x_0, y_0):
    from .geodesy import vincenty_direct

    _aeqd_check_ell(ell)
    x = np.asarray(X, dtype=np.float64) - x_0
    y = np.asarray(Y, dtype=np.float64) - y_0
    s = np.hypot(x, y)
    az = np.arctan2(x, y)
    lon, lat = vincenty_direct(
        np.full_like(s, lon_0), np.full_like(s, lat_0), az, s
    )
    at_center = s == 0
    return np.where(at_center, lon_0, lon), np.where(at_center, lat_0, lat)


# --- Krovak (EPSG 9819; Czech/Slovak S-JTSK — EPSG 5514) ------------------
def _krovak_setup(ell, lat_0, alpha_c, k_0):
    e, e2 = ell.e, ell.e2
    pc = math.radians(lat_0)
    sc, cc = math.sin(pc), math.cos(pc)
    A_ = ell.a * math.sqrt(1 - e2) / (1 - e2 * sc * sc)
    B = math.sqrt(1 + e2 * cc**4 / (1 - e2))
    g0 = math.asin(sc / B)
    t0 = (
        math.tan(math.pi / 4 + g0 / 2)
        * ((1 + e * sc) / (1 - e * sc)) ** (e * B / 2)
        / math.tan(math.pi / 4 + pc / 2) ** B
    )
    phi_p = math.radians(78.5)  # pseudo-standard parallel, fixed by the method
    n = math.sin(phi_p)
    r0 = (k_0 or 1.0) * A_ / math.tan(phi_p)
    return A_, B, g0, t0, phi_p, n, r0, math.radians(alpha_c)


def krovak_forward(ell, lon, lat, lat_0, lon_0, alpha_c, k_0, x_0, y_0):
    A_, B, g0, t0, phi_p, n, r0, ac = _krovak_setup(ell, lat_0, alpha_c, k_0)
    e = ell.e
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    s = np.sin(lat_r)
    U = 2 * (
        np.arctan(
            t0
            * np.tan(lat_r / 2 + math.pi / 4) ** B
            * ((1 - e * s) / (1 + e * s)) ** (e * B / 2)
        )
        - math.pi / 4
    )
    V = B * (math.radians(lon_0) - lon_r)
    Tt = np.arcsin(
        np.clip(math.cos(ac) * np.sin(U) + math.sin(ac) * np.cos(U) * np.cos(V), -1, 1)
    )
    D = np.arcsin(np.clip(np.cos(U) * np.sin(V) / np.cos(Tt), -1, 1))
    theta = n * D
    r = r0 * math.tan(math.pi / 4 + phi_p / 2) ** n / np.tan(Tt / 2 + math.pi / 4) ** n
    Xs = r * np.cos(theta)  # southing
    Yw = r * np.sin(theta)  # westing
    # proj's GIS-friendly orientation: easting = -westing, northing =
    # -southing (EPSG 5514 "Krovak East North" carries negative values)
    return x_0 - Yw, y_0 - Xs


def krovak_inverse(ell, X, Y, lat_0, lon_0, alpha_c, k_0, x_0, y_0):
    A_, B, g0, t0, phi_p, n, r0, ac = _krovak_setup(ell, lat_0, alpha_c, k_0)
    e = ell.e
    Yw = -(np.asarray(X, dtype=np.float64) - x_0)
    Xs = -(np.asarray(Y, dtype=np.float64) - y_0)
    r = np.hypot(Xs, Yw)
    theta = np.arctan2(Yw, Xs)
    D = theta / n
    Tt = 2 * (
        np.arctan((r0 / r) ** (1 / n) * math.tan(math.pi / 4 + phi_p / 2)) - math.pi / 4
    )
    U = np.arcsin(np.clip(math.cos(ac) * np.sin(Tt) - math.sin(ac) * np.cos(Tt) * np.cos(D), -1, 1))
    V = np.arcsin(np.clip(np.cos(Tt) * np.sin(D) / np.cos(U), -1, 1))
    lon = math.radians(lon_0) - V / B
    # U (conformal-sphere lat) -> geodetic via fixed point
    phi = U.copy()
    for _ in range(10):
        s = np.sin(phi)
        phi = 2 * (
            np.arctan(
                t0 ** (-1 / B)
                * np.tan(U / 2 + math.pi / 4) ** (1 / B)
                * ((1 + e * s) / (1 - e * s)) ** (e / 2)
            )
            - math.pi / 4
        )
    return np.degrees(lon), np.degrees(phi)


# --- New Zealand Map Grid (EPSG 9811; NZGD49 / EPSG 27200) ----------------
# The published NZMG definition (W.I. Reilly, "A conformal mapping
# projection with minimum scale error", Survey Review 1973; LINZ standard
# LINZS25900) is a 6th-order complex polynomial in (isometric-latitude
# series, longitude difference). The coefficient tables below are the
# published ones; only lat_0=-41, lon_0=173 on the International 1924
# ellipsoid are valid (the series is fitted to New Zealand).
_NZMG_PSI = (0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
             0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
_NZMG_B = np.array([
    0.7557853228 + 0.0j,
    0.249204646 + 0.003371507j,
    -0.001541739 + 0.041058560j,
    -0.10162907 + 0.01727609j,
    -0.26623489 - 0.36249218j,
    -0.6870983 - 1.1651967j,
], dtype=np.complex128)
_NZMG_PHI = (1.5627014243, 0.5185406398, -0.03333098, -0.1052906,
             -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)
_SEC5_TO_RAD = 0.4848136811095359935899141120e-9  # 1e-5 arcsec in radians


def _nzmg_zpoly(z: np.ndarray) -> np.ndarray:
    """sum_i B[i] * z**(i+1) (Horner)."""
    a = np.full_like(z, _NZMG_B[-1])
    for c in _NZMG_B[-2::-1]:
        a = c + z * a
    return a * z


def _nzmg_zpolyd(z: np.ndarray):
    """(poly, d poly/dz) for the Newton inverse."""
    n = len(_NZMG_B) - 1
    a = np.full_like(z, _NZMG_B[-1])
    b = a * (n + 1)
    for i in range(n - 1, -1, -1):
        a = _NZMG_B[i] + z * a
        b = _NZMG_B[i] * (i + 1) + z * b
    return a * z, b


def nzmg_forward(ell, lon, lat, lat_0, lon_0, x_0, y_0):
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    # delta-lat in units of 1e-5 arcseconds
    dphi = (lat - lat_0) * 3600.0 * 1e-5
    psi = np.full_like(dphi, _NZMG_PSI[-1])
    for c in _NZMG_PSI[-2::-1]:
        psi = c + dphi * psi
    psi *= dphi
    dlam = np.radians(lon - lon_0)
    Z = _nzmg_zpoly(psi + 1j * dlam)
    return Z.imag * ell.a + x_0, Z.real * ell.a + y_0


def nzmg_inverse(ell, X, Y, lat_0, lon_0, x_0, y_0):
    zr = (np.asarray(Y, dtype=np.float64) - y_0) / ell.a
    zi = (np.asarray(X, dtype=np.float64) - x_0) / ell.a
    Z = zr + 1j * zi
    z = Z.copy()
    for _ in range(20):
        f, fp = _nzmg_zpolyd(z)
        dz = (Z - f) / fp
        z = z + dz
        if np.all(np.abs(dz.real) + np.abs(dz.imag) <= 1e-14):
            break
    psi = z.real
    dphi = np.full_like(psi, _NZMG_PHI[-1])
    for c in _NZMG_PHI[-2::-1]:
        dphi = c + psi * dphi
    # dphi series yields delta-lat back in 1e-5 arcsec per unit psi
    lat = lat_0 + psi * dphi * 1e5 / 3600.0
    lon = lon_0 + np.degrees(z.imag)
    return lon, lat


# --- oblique stereographic (EPSG 9809 — double projection via the
# conformal sphere; Dutch RD New / EPSG 28992 is the canonical user) -------
def _sterea_setup(ell, lat_0, k_0):
    p0 = math.radians(lat_0)
    s0, c0 = math.sin(p0), math.cos(p0)
    e, e2 = ell.e, ell.e2
    rho0 = ell.a * (1 - e2) / (1 - e2 * s0 * s0) ** 1.5
    nu0 = ell.a / math.sqrt(1 - e2 * s0 * s0)
    R = math.sqrt(rho0 * nu0)
    n = math.sqrt(1 + e2 * c0**4 / (1 - e2))
    S1 = (1 + s0) / (1 - s0)
    S2 = (1 - e * s0) / (1 + e * s0)
    w1 = (S1 * S2**e) ** n
    sin_chi00 = (w1 - 1) / (w1 + 1)
    c = (n + s0) * (1 - sin_chi00) / ((n - s0) * (1 + sin_chi00))
    w2 = c * w1
    chi0 = math.asin((w2 - 1) / (w2 + 1))
    return R, n, c, chi0


def sterea_forward(ell, lon, lat, lat_0, lon_0, k_0, x_0, y_0):
    R, n, c, chi0 = _sterea_setup(ell, lat_0, k_0)
    k0 = k_0 or 1.0
    lam0 = math.radians(lon_0)
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64))
    s = np.sin(lat_r)
    Lam = n * (lon_r - lam0) + lam0
    Sa = (1 + s) / (1 - s)
    Sb = (1 - ell.e * s) / (1 + ell.e * s)
    w = c * (Sa * Sb**ell.e) ** n
    chi = np.arcsin(np.clip((w - 1) / (w + 1), -1, 1))
    dl = Lam - lam0
    B = 1 + np.sin(chi) * math.sin(chi0) + np.cos(chi) * math.cos(chi0) * np.cos(dl)
    E = x_0 + 2 * R * k0 * np.cos(chi) * np.sin(dl) / B
    N = y_0 + 2 * R * k0 * (
        np.sin(chi) * math.cos(chi0) - np.cos(chi) * math.sin(chi0) * np.cos(dl)
    ) / B
    return E, N


def sterea_inverse(ell, X, Y, lat_0, lon_0, k_0, x_0, y_0):
    R, n, c, chi0 = _sterea_setup(ell, lat_0, k_0)
    k0 = k_0 or 1.0
    lam0 = math.radians(lon_0)
    Ep = np.asarray(X, dtype=np.float64) - x_0
    Np = np.asarray(Y, dtype=np.float64) - y_0
    g = 2 * R * k0 * math.tan(math.pi / 4 - chi0 / 2)
    h = 4 * R * k0 * math.tan(chi0) + g
    i = np.arctan2(Ep, h + Np)
    j = np.arctan2(Ep, g - Np) - i
    chi = chi0 + 2 * np.arctan2(Np - Ep * np.tan(j / 2), 2 * R * k0)
    Lam = j + 2 * i + lam0
    lon = (Lam - lam0) / n + lam0
    # conformal-sphere latitude -> geodetic via isometric latitude
    psi = 0.5 * np.log((1 + np.sin(chi)) / (c * (1 - np.sin(chi)))) / n
    phi = 2 * np.arctan(np.exp(psi)) - math.pi / 2
    e, e2 = ell.e, ell.e2
    for _ in range(8):
        sp = np.sin(phi)
        psi_i = np.log(
            np.tan(phi / 2 + math.pi / 4) * ((1 - e * sp) / (1 + e * sp)) ** (e / 2)
        )
        phi = phi - (psi_i - psi) * np.cos(phi) * (1 - e2 * sp * sp) / (1 - e2)
    return np.degrees(lon), np.degrees(phi)


# --- Lambert azimuthal equal area (EPSG 9820; ETRS89-LAEA / EPSG 3035) ----
def _laea_q(ell, s):
    e, e2 = ell.e, ell.e2
    if e == 0.0:
        # authalic sphere (US National Atlas EPSG 9311 uses laea on the
        # Clarke 1866 authalic sphere): q degenerates to 2*sin(lat)
        return 2.0 * s
    return (1 - e2) * (
        s / (1 - e2 * s * s) - (1 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
    )


def _laea_setup(ell, lat_0):
    p0 = math.radians(lat_0)
    s0 = math.sin(p0)
    qP = _laea_q(ell, 1.0)
    q0 = _laea_q(ell, s0)
    beta0 = math.asin(min(max(q0 / qP, -1.0), 1.0))
    Rq = ell.a * math.sqrt(qP / 2)
    D = ell.a * (math.cos(p0) / math.sqrt(1 - ell.e2 * s0 * s0)) / (Rq * math.cos(beta0))
    return qP, beta0, Rq, D


def laea_forward(ell, lon, lat, lat_0, lon_0, x_0, y_0):
    qP, beta0, Rq, D = _laea_setup(ell, lat_0)
    lam0 = math.radians(lon_0)
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    dl = np.radians(np.asarray(lon, dtype=np.float64)) - lam0
    q = _laea_q(ell, np.sin(lat_r))
    beta = np.arcsin(np.clip(q / qP, -1, 1))
    B = Rq * np.sqrt(
        2 / (1 + math.sin(beta0) * np.sin(beta) + math.cos(beta0) * np.cos(beta) * np.cos(dl))
    )
    E = x_0 + B * D * np.cos(beta) * np.sin(dl)
    N = y_0 + (B / D) * (
        math.cos(beta0) * np.sin(beta) - math.sin(beta0) * np.cos(beta) * np.cos(dl)
    )
    return E, N


def laea_inverse(ell, X, Y, lat_0, lon_0, x_0, y_0):
    qP, beta0, Rq, D = _laea_setup(ell, lat_0)
    lam0 = math.radians(lon_0)
    Ep = np.asarray(X, dtype=np.float64) - x_0
    Np = np.asarray(Y, dtype=np.float64) - y_0
    rho = np.hypot(Ep / D, D * Np)
    at_center = rho == 0
    rho_safe = np.where(at_center, 1.0, rho)
    C = 2 * np.arcsin(np.clip(rho_safe / (2 * Rq), -1, 1))
    beta_p = np.arcsin(
        np.clip(
            np.cos(C) * math.sin(beta0) + D * Np * np.sin(C) * math.cos(beta0) / rho_safe,
            -1,
            1,
        )
    )
    lon = lam0 + np.arctan2(
        Ep * np.sin(C),
        D * rho_safe * math.cos(beta0) * np.cos(C) - D * D * Np * math.sin(beta0) * np.sin(C),
    )
    e2 = ell.e2
    e4, e6 = e2 * e2, e2 * e2 * e2
    phi = (
        beta_p
        + (e2 / 3 + 31 * e4 / 180 + 517 * e6 / 5040) * np.sin(2 * beta_p)
        + (23 * e4 / 360 + 251 * e6 / 3780) * np.sin(4 * beta_p)
        + (761 * e6 / 45360) * np.sin(6 * beta_p)
    )
    phi = np.where(at_center, math.radians(lat_0), phi)
    lon = np.where(at_center, lam0, lon)
    return np.degrees(lon), np.degrees(phi)


# --- swiss oblique mercator (EPSG 9815 circular variant; swisstopo doc) ----
def _somerc_setup(ell, lat_0, k_0):
    p0 = math.radians(lat_0)
    s0, c0 = math.sin(p0), math.cos(p0)
    alfa = math.sqrt(1 + ell.e2 / (1 - ell.e2) * c0**4)
    b0 = math.asin(s0 / alfa)
    K = (
        math.log(math.tan(math.pi / 4 + b0 / 2))
        - alfa * math.log(math.tan(math.pi / 4 + p0 / 2))
        + alfa * ell.e / 2 * math.log((1 + ell.e * s0) / (1 - ell.e * s0))
    )
    R = ell.a * (k_0 or 1.0) * math.sqrt(1 - ell.e2) / (1 - ell.e2 * s0 * s0)
    return alfa, b0, K, R


def somerc_forward(ell, lon, lat, lat_0, lon_0, k_0, x_0, y_0):
    alfa, b0, K, R = _somerc_setup(ell, lat_0, k_0)
    lat_r = np.radians(np.asarray(lat, dtype=np.float64))
    lon_r = np.radians(np.asarray(lon, dtype=np.float64) - lon_0)
    s = np.sin(lat_r)
    S = (
        alfa * np.log(np.tan(math.pi / 4 + lat_r / 2))
        - alfa * ell.e / 2 * np.log((1 + ell.e * s) / (1 - ell.e * s))
        + K
    )
    b = 2 * (np.arctan(np.exp(S)) - math.pi / 4)
    ll = alfa * lon_r
    # rotate the conformal sphere so the projection equator runs through
    # the center: b̄ = asin(cos b0 sin b − sin b0 cos b cos l),
    # l̄ = atan2(cos b sin l, cos b0 cos b cos l + sin b0 sin b)
    bbar = np.arcsin(
        np.clip(math.cos(b0) * np.sin(b) - math.sin(b0) * np.cos(b) * np.cos(ll), -1, 1)
    )
    lbar = np.arctan2(
        np.cos(b) * np.sin(ll),
        math.cos(b0) * np.cos(b) * np.cos(ll) + math.sin(b0) * np.sin(b),
    )
    Y = R * lbar
    X = R / 2 * np.log((1 + np.sin(bbar)) / (1 - np.sin(bbar)))
    return x_0 + Y, y_0 + X


def somerc_inverse(ell, X, Y, lat_0, lon_0, k_0, x_0, y_0):
    alfa, b0, K, R = _somerc_setup(ell, lat_0, k_0)
    yy = (np.asarray(X, dtype=np.float64) - x_0) / R  # easting -> rotated lon
    xx = (np.asarray(Y, dtype=np.float64) - y_0) / R  # northing -> rotated lat
    bbar = 2 * (np.arctan(np.exp(xx)) - math.pi / 4)
    lbar = yy
    b = np.arcsin(
        np.clip(math.cos(b0) * np.sin(bbar) + math.sin(b0) * np.cos(bbar) * np.cos(lbar), -1, 1)
    )
    ll = np.arctan2(
        np.cos(bbar) * np.sin(lbar),
        math.cos(b0) * np.cos(bbar) * np.cos(lbar) - math.sin(b0) * np.sin(bbar),
    )
    lon = lon_0 + np.degrees(ll / alfa)
    # conformal sphere lat -> geodetic (fixed point on S)
    lat = b.copy()
    for _ in range(10):
        s = np.sin(lat)
        Sv = (np.log(np.tan(math.pi / 4 + b / 2)) - K) / alfa + ell.e / 2 * np.log(
            (1 + ell.e * s) / (1 - ell.e * s)
        )
        lat = 2 * (np.arctan(np.exp(Sv)) - math.pi / 4)
    return lon, np.degrees(lat)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------
def _fwd(d: ProjDef, lon, lat):
    p = d.params
    g = p.get
    if d.proj in ("longlat", "latlong"):
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if d.proj == "utm":
        zone = int(g("zone", 0))
        if not 1 <= zone <= 60:
            raise ValueError("+proj=utm needs +zone=1..60")
        x, y = tmerc_forward(
            d.ell, lon, lat, 0.0, zone * 6 - 183, 0.9996, 500000.0,
            10000000.0 if p["south"] else 0.0,
        )
    elif d.proj == "tmerc":
        x, y = tmerc_forward(
            d.ell, lon, lat, g("lat_0", 0.0), g("lon_0", 0.0),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "webmerc":
        lat_c = np.clip(np.asarray(lat, dtype=np.float64), -89.9999, 89.9999)
        x = d.ell.a * np.radians(np.asarray(lon, dtype=np.float64) - g("lon_0", 0.0))
        y = d.ell.a * np.log(np.tan(math.pi / 4 + np.radians(lat_c) / 2))
        x, y = x + g("x_0", 0.0), y + g("y_0", 0.0)
    elif d.proj == "merc":
        x, y = merc_forward(
            d.ell, lon, lat, g("lon_0", 0.0), g("k", g("k_0", 1.0)),
            p.get("lat_ts"), g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "lcc":
        x, y = lcc_forward(
            d.ell, lon, lat, p.get("lat_1"), p.get("lat_2"), g("lat_0", 0.0),
            g("lon_0", 0.0), g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "aea":
        x, y = aea_forward(
            d.ell, lon, lat, g("lat_1", 29.5), g("lat_2", 45.5), g("lat_0", 0.0),
            g("lon_0", 0.0), g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "stere":
        lat0 = g("lat_0", 90.0)
        if abs(lat0) != 90.0:
            raise ValueError("+proj=stere supported in polar aspects only (lat_0=+/-90)")
        x, y = stere_forward(
            d.ell, lon, lat, lat0, p.get("lat_ts"), g("lon_0", 0.0),
            g("k", g("k_0", None)), g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "somerc":
        x, y = somerc_forward(
            d.ell, lon, lat, g("lat_0", 0.0), g("lon_0", 0.0),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "sterea":
        x, y = sterea_forward(
            d.ell, lon, lat, g("lat_0", 0.0), g("lon_0", 0.0),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "laea":
        x, y = laea_forward(
            d.ell, lon, lat, g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "cass":
        x, y = cass_forward(
            d.ell, lon, lat, g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "omerc":
        x, y = omerc_forward(
            d.ell, lon, lat, g("lat_0", 0.0), g("lonc", g("lon_0", 0.0)),
            g("alpha", 90.0), g("gamma", g("alpha", 90.0)),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
            p.get("no_uoff", False),
        )
    elif d.proj == "aeqd":
        x, y = aeqd_forward(
            d.ell, lon, lat, g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "eqc":
        x, y = eqc_forward(
            d.ell, lon, lat, g("lat_ts", 0.0), g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "krovak":
        x, y = krovak_forward(
            d.ell, lon, lat, g("lat_0", 49.5), g("lon_0", 0.0),
            g("alpha", 30.28813972222222), g("k", g("k_0", 0.9999)),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    elif d.proj == "nzmg":
        x, y = nzmg_forward(
            d.ell, lon, lat, g("lat_0", -41.0), g("lon_0", 173.0),
            g("x_0", 2510000.0), g("y_0", 6023150.0),
        )
    else:  # pragma: no cover - parse_proj4 already validated
        raise ValueError(f"unsupported +proj={d.proj}")
    if d.to_meter != 1.0:
        x, y = x / d.to_meter, y / d.to_meter
    return x, y


def _inv(d: ProjDef, x, y):
    p = d.params
    g = p.get
    if d.proj in ("longlat", "latlong"):
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if d.to_meter != 1.0:
        x = np.asarray(x, dtype=np.float64) * d.to_meter
        y = np.asarray(y, dtype=np.float64) * d.to_meter
    if d.proj == "utm":
        zone = int(g("zone", 0))
        return tmerc_inverse(
            d.ell, x, y, 0.0, zone * 6 - 183, 0.9996, 500000.0,
            10000000.0 if p["south"] else 0.0,
        )
    if d.proj == "tmerc":
        return tmerc_inverse(
            d.ell, x, y, g("lat_0", 0.0), g("lon_0", 0.0),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "webmerc":
        lon = g("lon_0", 0.0) + np.degrees((np.asarray(x, dtype=np.float64) - g("x_0", 0.0)) / d.ell.a)
        lat = np.degrees(
            2 * np.arctan(np.exp((np.asarray(y, dtype=np.float64) - g("y_0", 0.0)) / d.ell.a))
            - math.pi / 2
        )
        return lon, lat
    if d.proj == "merc":
        return merc_inverse(
            d.ell, x, y, g("lon_0", 0.0), g("k", g("k_0", 1.0)),
            p.get("lat_ts"), g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "lcc":
        return lcc_inverse(
            d.ell, x, y, p.get("lat_1"), p.get("lat_2"), g("lat_0", 0.0),
            g("lon_0", 0.0), g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "aea":
        return aea_inverse(
            d.ell, x, y, g("lat_1", 29.5), g("lat_2", 45.5), g("lat_0", 0.0),
            g("lon_0", 0.0), g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "stere":
        return stere_inverse(
            d.ell, x, y, g("lat_0", 90.0), p.get("lat_ts"), g("lon_0", 0.0),
            g("k", g("k_0", None)), g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "somerc":
        return somerc_inverse(
            d.ell, x, y, g("lat_0", 0.0), g("lon_0", 0.0),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "sterea":
        return sterea_inverse(
            d.ell, x, y, g("lat_0", 0.0), g("lon_0", 0.0),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "laea":
        return laea_inverse(
            d.ell, x, y, g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "cass":
        return cass_inverse(
            d.ell, x, y, g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "omerc":
        return omerc_inverse(
            d.ell, x, y, g("lat_0", 0.0), g("lonc", g("lon_0", 0.0)),
            g("alpha", 90.0), g("gamma", g("alpha", 90.0)),
            g("k", g("k_0", 1.0)), g("x_0", 0.0), g("y_0", 0.0),
            p.get("no_uoff", False),
        )
    if d.proj == "aeqd":
        return aeqd_inverse(
            d.ell, x, y, g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "eqc":
        return eqc_inverse(
            d.ell, x, y, g("lat_ts", 0.0), g("lat_0", 0.0), g("lon_0", 0.0),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "krovak":
        return krovak_inverse(
            d.ell, x, y, g("lat_0", 49.5), g("lon_0", 0.0),
            g("alpha", 30.28813972222222), g("k", g("k_0", 0.9999)),
            g("x_0", 0.0), g("y_0", 0.0),
        )
    if d.proj == "nzmg":
        return nzmg_inverse(
            d.ell, x, y, g("lat_0", -41.0), g("lon_0", 173.0),
            g("x_0", 2510000.0), g("y_0", 6023150.0),
        )
    raise ValueError(f"unsupported +proj={d.proj}")  # pragma: no cover


def transform_proj4(x, y, src: ProjDef, dst: ProjDef, z=None):
    """Full pipeline between two parsed proj4 defs (x/y in src CRS units).

    Datum leg: [src NTv2 grid -> WGS84-frame geodetic] -> [Helmert via
    geocentric XYZ when towgs84/ellipsoids require it] -> [dst NTv2 grid
    inverse]. A grid shift REPLACES the Helmert+ellipsoid change for its
    side (the grid's target is the WGS84-frame datum, e.g. NAD83), which
    is exactly proj's +nadgrids pipeline. +pm= rotates longitudes to/from
    Greenwich around the datum leg (NTF Paris etc.).

    ``z``: optional height column. A side carrying +geoidgrids= treats
    its z as ORTHOMETRIC: src converts up to ellipsoidal (h = H + N),
    dst back down (H = h - N), N bilinear from the GTX grid at the
    geographic position (proj's vgridshift; the lookup position is
    datum-insensitive at geoid smoothness). Returns (x, y) without z,
    (x, y, z) with it."""
    lon, lat = _inv(src, x, y)
    if src.pm:
        lon = np.asarray(lon, dtype=np.float64) + src.pm
    if z is not None and src.vto_meter != 1.0:
        # vertical units -> meters (PROJ +vto_meter; -1 = depth axis)
        z = np.asarray(z, dtype=np.float64) * src.vto_meter
    if z is not None and src.geoidgrids:
        from .gtx import load_gtx

        z = load_gtx(src.geoidgrids).to_ellipsoidal(lon, lat, z)
    same_datum = (
        src.towgs84 == dst.towgs84
        and src.nadgrids == dst.nadgrids
        and abs(src.ell.a - dst.ell.a) < 1e-9
        and abs(src.ell.f - dst.ell.f) < 1e-15
    )
    if not same_datum:
        src_ell, dst_ell = src.ell, dst.ell
        if src.nadgrids:
            from .ntv2 import load_grid

            lon, lat = load_grid(src.nadgrids).forward(lon, lat)
            src_ell = _WGS84  # grid output is WGS84-frame (NAD83~WGS84)
        if dst.nadgrids:
            dst_ell = _WGS84
        if (
            src.towgs84 or dst.towgs84
            or abs(src_ell.a - dst_ell.a) >= 1e-9
            or abs(src_ell.f - dst_ell.f) >= 1e-15
        ):
            xyz = _geodetic_to_xyz(src_ell, lon, lat)
            if src.towgs84:
                xyz = _helmert(xyz, src.towgs84)
            if dst.towgs84:
                xyz = _helmert(xyz, dst.towgs84, inverse=True)
            lon, lat = _xyz_to_geodetic(dst_ell, *xyz)
        if dst.nadgrids:
            from .ntv2 import load_grid

            lon, lat = load_grid(dst.nadgrids).inverse(lon, lat)
    if z is not None and dst.geoidgrids:
        from .gtx import load_gtx

        z = load_gtx(dst.geoidgrids).to_orthometric(lon, lat, z)
    if z is not None and dst.vto_meter != 1.0:
        z = np.asarray(z, dtype=np.float64) / dst.vto_meter
    if dst.pm:
        lon = np.asarray(lon, dtype=np.float64) - dst.pm
    ox, oy = _fwd(dst, lon, lat)
    if z is None:
        return ox, oy
    return ox, oy, np.asarray(z, dtype=np.float64)
