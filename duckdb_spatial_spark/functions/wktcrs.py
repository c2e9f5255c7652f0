"""WKT CRS parser: OGC WKT1 / ESRI WKT1 / basic WKT2 -> proj4 string.

The reference hands any CRS string to PROJ's ``proj_create_crs_to_crs``
(``spatial/src/spatial/proj/functions.cpp:103``), which accepts proj4
strings, ``AUTH:CODE`` pairs, and WKT definitions. This module closes the
WKT form: a ``PROJCS[...]`` / ``GEOGCS[...]`` (WKT1, OGC or ESRI flavor)
or ``PROJCRS[...]`` / ``GEOGCRS[...]`` (WKT2) text lowers onto the
existing proj4 engine (``functions/proj4.py``), so every projection that
engine supports (tmerc, utm, merc, webmerc, lcc 1&2SP, aea, polar stere,
somerc, longlat) also works from its WKT spelling. Grammar per the public
specs: OGC 01-009 (WKT1), ISO 19162 / OGC 18-010r7 (WKT2).

Compound CRS (``COMPD_CS``/``COMPOUNDCRS``) lowers to its horizontal
component — the vertical axis passes through unchanged, matching PROJ's
2D behavior. Unsupported constructs fail loudly (same policy as
parse_proj4): an unknown projection method, a non-Greenwich prime
meridian, or a bare vertical CRS raises with the construct named, never
a silent drop.
"""

from __future__ import annotations

import re

__all__ = ["is_wkt_crs", "wkt_to_proj4"]

_HEADS = ("PROJCS", "GEOGCS", "PROJCRS", "GEOGCRS", "GEODCRS", "BASEGEOGCRS",
          "COMPD_CS", "COMPOUNDCRS", "VERT_CS", "VERTCRS", "LOCAL_CS")


def is_wkt_crs(s: str) -> bool:
    head = s.lstrip().upper()
    return any(head.startswith(h + "[") or head.startswith(h + "(") or
               head.startswith(h + " ") for h in _HEADS)


# ------------------------------------------------------------- tokenizer

class _Node:
    __slots__ = ("kw", "args")

    def __init__(self, kw, args):
        self.kw = kw  # upper-cased keyword
        self.args = args  # list of str | float | _Node

    def all(self, kw):
        return [a for a in self.args if isinstance(a, _Node) and a.kw == kw]

    def first(self, *kws):
        for kw in kws:
            for a in self.args:
                if isinstance(a, _Node) and a.kw == kw:
                    return a
        return None

    def strings(self):
        return [a for a in self.args if isinstance(a, str)]

    def numbers(self):
        return [a for a in self.args if isinstance(a, float)]


_TOKEN = re.compile(
    r"""\s*(?:
        "((?:[^"]|"")*)"          # quoted string
      | ([A-Za-z_][A-Za-z0-9_ ]*?)\s*([\[\(])   # keyword + open bracket
      | ([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)  # number
      | ([\]\)])                  # close bracket
      | (,)                       # separator
      | ([A-Za-z][A-Za-z0-9_]*)   # bare identifier (WKT2: Cartesian, east)
    )""",
    re.X,
)


def _parse(s: str) -> _Node:
    pos = 0
    stack: list[_Node] = []
    root = None
    n = len(s)
    while pos < n:
        m = _TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"WKT CRS parse error at {s[pos:pos+30]!r}")
        pos = m.end()
        if m.group(2) is not None:
            node = _Node(m.group(2).strip().upper().replace(" ", "_"), [])
            if stack:
                stack[-1].args.append(node)
            else:
                root = node
            stack.append(node)
            continue
        if m.group(6) is not None:  # comma separator
            continue
        if m.group(5) is not None:  # close bracket
            if not stack:
                raise ValueError("WKT CRS parse error: unbalanced close bracket")
            stack.pop()
            if not stack:
                if s[pos:].strip():
                    raise ValueError(
                        f"WKT CRS parse error: trailing content {s[pos:pos+30]!r}"
                    )
                break
            continue
        # scalar tokens (string / number / bare identifier) need a parent
        if not stack:
            raise ValueError(f"WKT CRS parse error: value outside any node at {s[:30]!r}")
        if m.group(1) is not None:
            stack[-1].args.append(m.group(1).replace('""', '"'))
        elif m.group(4) is not None:
            stack[-1].args.append(float(m.group(4)))
        elif m.group(7) is not None:
            stack[-1].args.append(m.group(7))
    if root is None:
        raise ValueError("empty WKT CRS string")
    if stack:
        raise ValueError("WKT CRS parse error: unterminated node")
    return root


# ------------------------------------------------- vocabulary normalizers

def _norm(name: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", name.strip().lower()).strip("_")


# projection method -> +proj (WKT1 OGC, ESRI, and WKT2/EPSG method names)
_METHODS = {
    "transverse_mercator": "tmerc",
    "gauss_kruger": "tmerc",
    "mercator_1sp": "merc",
    "mercator_variant_a": "merc",
    "mercator_variant_b": "merc",
    "mercator_2sp": "merc",
    "mercator": "merc",
    "popular_visualisation_pseudo_mercator": "webmerc",
    "mercator_auxiliary_sphere": "webmerc",
    "lambert_conformal_conic_1sp": "lcc1",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert_conformal_conic": "lcc",
    "albers_conic_equal_area": "aea",
    "albers": "aea",
    "albers_equal_area": "aea",
    "polar_stereographic": "stere",
    "polar_stereographic_variant_a": "stere",
    "polar_stereographic_variant_b": "stere",
    "stereographic_south_pole": "stere",
    "stereographic_north_pole": "stere",
    "hotine_oblique_mercator_azimuth_center": "somerc",
    "swiss_oblique_cylindrical": "somerc",
    "swiss_oblique_mercator": "somerc",
}

# parameter name -> proj4 key (WKT1 + WKT2/EPSG spellings)
_PARAMS = {
    "latitude_of_origin": "lat_0",
    "latitude_of_natural_origin": "lat_0",
    "latitude_of_center": "lat_0",
    "latitude_of_projection_centre": "lat_0",
    "latitude_of_false_origin": "lat_0",
    "latitude_of_standard_parallel": "lat_ts",
    "central_meridian": "lon_0",
    "longitude_of_natural_origin": "lon_0",
    "longitude_of_center": "lon_0",
    "longitude_of_projection_centre": "lon_0",
    "longitude_of_origin": "lon_0",
    "longitude_of_false_origin": "lon_0",
    "scale_factor": "k_0",
    "scale_factor_at_natural_origin": "k_0",
    "scale_factor_on_initial_line": "k_0",
    "standard_parallel_1": "lat_1",
    "latitude_of_1st_standard_parallel": "lat_1",
    "standard_parallel_2": "lat_2",
    "latitude_of_2nd_standard_parallel": "lat_2",
    "false_easting": "x_0",
    "easting_at_false_origin": "x_0",
    "easting_at_projection_centre": "x_0",
    "false_northing": "y_0",
    "northing_at_false_origin": "y_0",
    "northing_at_projection_centre": "y_0",
    "azimuth": "__azimuth",  # somerc: must be the implied 90deg (validated)
    "angle_from_rectified_to_skew_grid": "__azimuth",
    "rectified_grid_angle": "__azimuth",
    "auxiliary_sphere_type": None,  # webmerc marker (value 0)
}

_ELLPS = {
    # (a, rf) -> +ellps shorthand where it matches a named ellipsoid
    (6378137.0, 298.257223563): "WGS84",
    (6378137.0, 298.257222101): "GRS80",
    (6377563.396, 299.3249646): "airy",
    (6377397.155, 299.1528128): "bessel",
    (6378388.0, 297.0): "intl",
    (6378206.4, 294.9786982): "clrk66",
    (6378249.145, 293.465): "clrk80",
}


def _fmt(v: float) -> str:
    return repr(float(v)).rstrip("0").rstrip(".") if "." in repr(float(v)) else repr(float(v))


def _geog_parts(g: _Node, out: list):
    """GEOGCS / GEOGCRS / BASEGEOGCRS -> ellipsoid (+datum shift) tokens."""
    datum = g.first("DATUM", "TRF", "GEODETICDATUM")
    if datum is None:
        raise ValueError("WKT CRS: missing DATUM")
    sph = datum.first("SPHEROID", "ELLIPSOID")
    if sph is None:
        raise ValueError("WKT CRS: missing SPHEROID/ELLIPSOID")
    nums = sph.numbers()
    if len(nums) < 2:
        raise ValueError("WKT CRS: SPHEROID needs a and rf")
    a, rf = nums[0], nums[1]
    named = _ELLPS.get((round(a, 4), round(rf, 9)))
    if named is None:
        for (ka, krf), nm in _ELLPS.items():
            if abs(a - ka) < 1e-3 and abs(rf - krf) < 1e-7:
                named = nm
                break
    if named is not None:
        out.append(f"+ellps={named}")
    elif rf == 0.0:
        out.append(f"+a={_fmt(a)}")
        out.append(f"+b={_fmt(a)}")
    else:
        out.append(f"+a={_fmt(a)}")
        out.append(f"+rf={_fmt(rf)}")
    tw = datum.first("TOWGS84")
    if tw is not None:
        vals = tw.numbers()
        out.append("+towgs84=" + ",".join(_fmt(v) for v in (vals + [0.0] * 7)[:7]))
    pm = g.first("PRIMEM")
    if pm is not None:
        pnums = pm.numbers()
        if pnums and abs(pnums[0]) > 1e-12:
            raise ValueError(
                f"WKT CRS: non-Greenwich prime meridian {pm.strings()[:1]} is "
                "not supported (it changes every coordinate and cannot be ignored)"
            )


def wkt_to_proj4(s: str) -> str:
    """Lower a WKT1/WKT2 CRS definition to an equivalent proj4 string."""
    root = _parse(s)
    # GDAL-style escape hatch: EXTENSION["PROJ4", "<string>"] is
    # authoritative when present (e.g. the published EPSG:3857 WKT1, whose
    # Mercator_1SP method alone would wrongly select the ellipsoidal form)
    ext = root.first("EXTENSION")
    if ext is not None:
        strs = ext.strings()
        if len(strs) >= 2 and strs[0].upper() == "PROJ4":
            return strs[1].strip()
    if root.kw in ("COMPD_CS", "COMPOUNDCRS"):
        # compound (horizontal + vertical): the 2D engine transforms the
        # horizontal component; the vertical axis passes through unchanged
        # (PROJ does the same for 2D operations on compound CRS)
        horiz = root.first("PROJCS", "GEOGCS", "PROJCRS", "GEOGCRS", "GEODCRS")
        if horiz is None:
            raise ValueError("WKT CRS: compound CRS without a horizontal component")
        root = horiz
        ext = root.first("EXTENSION")
        if ext is not None:
            strs = ext.strings()
            if len(strs) >= 2 and strs[0].upper() == "PROJ4":
                return strs[1].strip()
    if root.kw in ("VERT_CS", "VERTCRS"):
        raise ValueError("WKT CRS: vertical CRS has no horizontal transform")
    if root.kw in ("GEOGCS", "GEOGCRS", "GEODCRS"):
        out = ["+proj=longlat"]
        _geog_parts(root, out)
        return " ".join(out)
    if root.kw not in ("PROJCS", "PROJCRS"):
        raise ValueError(f"WKT CRS: unsupported root {root.kw}")

    geog = root.first("GEOGCS", "BASEGEOGCRS", "GEOGCRS", "GEODCRS")
    if geog is None:
        raise ValueError("WKT CRS: PROJCS without GEOGCS/BASEGEOGCRS")

    # WKT1 keeps PROJECTION/PARAMETER at the top level; WKT2 nests them
    # under CONVERSION[ METHOD[...], PARAMETER[...] ]
    conv = root.first("CONVERSION") or root
    meth = conv.first("PROJECTION", "METHOD")
    if meth is None:
        raise ValueError("WKT CRS: missing PROJECTION/METHOD")
    mname = _norm(meth.strings()[0]) if meth.strings() else ""
    proj = _METHODS.get(mname)
    if proj is None:
        raise ValueError(f"WKT CRS: unsupported projection method {meth.strings()[:1]}")

    params: dict[str, float] = {}
    for p in conv.all("PARAMETER"):
        pstr = p.strings()
        pnum = p.numbers()
        if not pstr or not pnum:
            continue
        key = _norm(pstr[0])
        if key not in _PARAMS:
            raise ValueError(f"WKT CRS: unsupported parameter {pstr[0]!r}")
        pk = _PARAMS[key]
        if pk is not None:
            params[pk] = pnum[0]
    if proj == "somerc" and abs(params.pop("__azimuth", 90.0)) != 90.0:
        # the somerc kernel implies the 90deg azimuth of the Swiss system
        raise ValueError("WKT CRS: oblique Mercator with non-Swiss azimuth")
    params.pop("__azimuth", None)
    if proj == "lcc1":
        proj = "lcc"
        params.setdefault("lat_1", params.get("lat_0", 0.0))
    if proj == "merc" and "lat_1" in params:
        # Mercator 2SP / variant B: the standard parallel drives the scale
        # through lat_ts in the merc kernel (k_0 form is variant A)
        params["lat_ts"] = params.pop("lat_1")

    # angular parameters are in the GEOGCS angular unit — only degrees are
    # supported (grad-based systems pair with the Paris meridian, which is
    # rejected above anyway, but fail loudly regardless)
    aunit = geog.first("UNIT", "ANGLEUNIT")
    if aunit is not None:
        anums = aunit.numbers()
        if anums and abs(anums[0] - 0.017453292519943295) > 1e-9:
            raise ValueError(
                f"WKT CRS: unsupported angular unit {aunit.strings()[:1]} "
                "(only degree)"
            )

    # WKT1 expresses false_easting/false_northing in the PROJCS linear
    # unit; proj4 +x_0/+y_0 are meters, +to_meter scales the output axes
    unit = root.first("UNIT", "LENGTHUNIT")
    to_meter = 1.0
    if unit is not None:
        unums = unit.numbers()
        if unums:
            to_meter = unums[0]
    for k in ("x_0", "y_0"):
        if k in params and to_meter != 1.0:
            params[k] = params[k] * to_meter

    out = [f"+proj={proj}"]
    for k in ("lat_0", "lat_1", "lat_2", "lat_ts", "lon_0", "k_0", "x_0", "y_0"):
        if k in params:
            out.append(f"+{k}={_fmt(params[k])}")
    _geog_parts(geog, out)
    if abs(to_meter - 1.0) > 1e-12:
        out.append(f"+to_meter={_fmt(to_meter)}")
    return " ".join(out)
