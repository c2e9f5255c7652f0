"""SOSI source (Norwegian Kartverket vector format; the reference reads
it through GDAL's SOSI driver — ``gdal/functions/st_drivers.cpp`` —
which wraps the FYBA library). Independent implementation of the PUBLIC
SOSI syntax (Kartverket "SOSI Del 1: Realisering i SOSI-format"):

  line level = number of leading dots; ``!`` starts a comment line
  .HODE                       file header
    ..TEGNSETT <cs>           charset (UTF-8, ISO8859-1, ISO8859-10)
    ..TRANSPAR
      ...KOORDSYS <n>         EUREF89 UTM zone codes 21-25 -> EPSG 2583x
      ...ORIGO-NØ <n> <e>     coordinate origin (NORTHING first)
      ...ENHET <u>            unit: coord = origo + value * u
  .PUNKT <id>:                point feature: ..NØ / ..NØH + one coord line
  .TEKST <id>:                text point: ..STRENG value -> attrs map
  .KURVE <id>:                line feature: coords one per line under ..NØ
  .BUEP <id>:                 arc through three points -> stroked 5-deg
                              polyline (FYBA/GDAL behavior); referenceable
                              from FLATE boundaries like any KURVE
  .FLATE <id>:                area feature: ..REF lists the boundary as
                              KURVE references — ``:n`` forward, ``:-n``
                              reversed, parenthesized groups are interior
                              rings; ..NØ holds the representation point
  .SLUTT                      end of file

Header depth (r16): ..SOSI-VERSJON / ..DATO / ..OMRÅDE (MIN-NØ/MAX-NØ)
surface in the parse meta; ..DEF definition groups are tolerated
without effect (the FYBA behavior); non-vector element kinds (RASTER
and its raw data lines, symbol groups...) are skipped and counted in
meta['skipped']. FLATE boundaries may SHARE KURVEs across features
(forward in one, ``:-n`` reversed in the other — the standard
Kartverket shared-edge encoding), and ALL non-parenthesized REF groups
concatenate into one exterior chain (an exterior group listed after a
hole group continues the same shell).

Coordinate lines carry NORTHING EASTING [HEIGHT] (the NØ/NØH axis
order); this reader emits (x=easting, y=northing[, z=height]). Every
``..NAME value`` group on a feature that is not NØ/NØH/REF/OBJTYPE is
kept in an ``attrs`` map (stringly, like the S-57 ATTF map). Unknown
element types (RASTER, symbol groups...) are skipped. The writer
emits UTF-8 with TEGNSETT declared, one KURVE per polygon ring with a
FLATE referencing them (holes parenthesized), so read_sosi(write_sosi)
round-trips geometry exactly at the chosen ENHET quantization."""

from __future__ import annotations

import glob as _glob
import os
import re as _re

from pyspark.sql import DataFrame, SparkSession

from ..geo import geom as G
from ..geo import wkb as WKB

# EUREF89 / UTM zone N (KOORDSYS 21-25 -> EPSG:25831-25835)
_KOORDSYS_EPSG = {21: 25831, 22: 25832, 23: 25833, 24: 25834, 25: 25835}

_ELEM = _re.compile(r"^\.([A-ZÆØÅa-zæøå][\wÆØÅæøå-]*)(?:\s+(\d+))?\s*:?\s*$")
_REF_TOKEN = _re.compile(r"\(|\)|:-?\d+")


def _stroke_buep(p0, p1, p2, step_deg: float = 5.0):
    """BUEP (arc through three points): circumcircle through p0/p1/p2,
    stroked from p0 THROUGH p1 to p2 at ``step_deg`` steps (the dgn.py
    arc density; FYBA/GDAL stroke BUEP the same way). Collinear points
    degrade to the 3-point polyline. The exact input endpoints are
    emitted verbatim so the arc provably passes through them."""
    import math

    (x0, y0), (x1, y1), (x2, y2) = p0[:2], p1[:2], p2[:2]
    d = 2.0 * (x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
    if d == 0.0:
        return [list(p0), list(p1), list(p2)]
    ux = ((x0 * x0 + y0 * y0) * (y1 - y2) + (x1 * x1 + y1 * y1) * (y2 - y0)
          + (x2 * x2 + y2 * y2) * (y0 - y1)) / d
    uy = ((x0 * x0 + y0 * y0) * (x2 - x1) + (x1 * x1 + y1 * y1) * (x0 - x2)
          + (x2 * x2 + y2 * y2) * (x1 - x0)) / d
    r = math.hypot(x0 - ux, y0 - uy)
    a0 = math.atan2(y0 - uy, x0 - ux)
    a1 = math.atan2(y1 - uy, x1 - ux)
    a2 = math.atan2(y2 - uy, x2 - ux)
    two_pi = 2.0 * math.pi
    ccw = (a2 - a0) % two_pi
    mid = (a1 - a0) % two_pi
    sweep = ccw if mid <= ccw else ccw - two_pi
    n = max(2, int(abs(math.degrees(sweep)) / step_deg) + 1)
    out = [list(p0)]
    for i in range(1, n):
        t = a0 + sweep * i / n
        out.append([ux + r * math.cos(t), uy + r * math.sin(t)])
    out.append(list(p2))
    return out


def _decode(raw: bytes) -> str:
    """Decode using the file's own TEGNSETT declaration (found in the
    ASCII-safe prefix), defaulting to UTF-8 with latin-1 fallback."""
    head = raw[:4096].decode("latin-1", "replace")
    m = _re.search(r"\.\.TEGNSETT\s+([\w-]+)", head, _re.IGNORECASE)
    cs = (m.group(1).upper() if m else "UTF-8")
    enc = {
        "UTF-8": "utf-8", "ISO8859-1": "latin-1", "ISO8859-10": "iso8859-10",
        "ANSI": "cp1252", "DOSN8": "cp865", "ND7": "latin-1",
    }.get(cs, "utf-8")
    try:
        return raw.decode(enc)
    except (UnicodeDecodeError, LookupError):
        return raw.decode("latin-1", "replace")


def _header_koordsys(path: str) -> int | None:
    """KOORDSYS from the .HODE prefix only (no feature parse) — the
    cheap per-file scan read_sosi uses to detect mixed UTM zones."""
    with open(path, "rb") as fh:
        head = _decode(fh.read(8192))
    m = _re.search(r"\.{3}KOORDSYS\s+(\d+)", head)
    return int(m.group(1)) if m else None


def parse_sosi(path: str):
    """-> (meta, features): meta has origo/enhet/koordsys/epsg; features
    are dicts {id, kind, objtype, attrs, geometry}."""
    with open(path, "rb") as fh:
        text = _decode(fh.read())
    origo = (0.0, 0.0)
    enhet = 1.0
    koordsys = None
    versjon = None
    dato = None
    omrade: dict = {}
    elems: list[dict] = []
    cur: dict | None = None
    mode = None  # "coords" | "refs" | None — what dotless lines mean
    for rawline in text.splitlines():
        line = rawline.strip()
        if not line or line.startswith("!"):
            continue
        if line.startswith("."):
            level = len(line) - len(line.lstrip("."))
            body = line[level:].strip()
            if level == 1:
                m = _ELEM.match(line)
                kind = (m.group(1).upper() if m else body.split()[0].upper())
                if kind == "SLUTT":
                    break
                cur = {"kind": kind,
                       "id": int(m.group(2)) if m and m.group(2) else None,
                       "attrs": {}, "coords": [], "refs": []}
                elems.append(cur)
                mode = None
                continue
            if cur is None:
                continue
            name, _, val = body.partition(" ")
            uname = name.upper()
            if cur["kind"] == "HODE":
                if uname == "ORIGO-NØ" or uname == "ORIGO-NO":
                    parts = val.split()
                    if len(parts) >= 2:
                        origo = (float(parts[0]), float(parts[1]))
                elif uname == "ENHET":
                    enhet = float(val)
                elif uname == "KOORDSYS":
                    koordsys = int(val.split()[0])
                elif uname == "SOSI-VERSJON":
                    versjon = val.strip()
                elif uname == "DATO":
                    dato = val.strip()
                elif uname in ("MIN-NØ", "MIN-NO", "MAX-NØ", "MAX-NO"):
                    parts = val.split()
                    if len(parts) >= 2:
                        omrade[uname[:3].replace("Ø", "O").lower()] = (
                            float(parts[0]), float(parts[1]))
                # ..DEF definition groups (and anything nested under
                # them) are tolerated without effect, the FYBA behavior
                mode = None
                continue
            if uname in ("NØ", "NO", "NØH", "NOH"):
                mode = "coords"
                cur["has_h"] = uname in ("NØH", "NOH")
                continue
            if uname == "REF":
                mode = "refs"
                cur["refs"].extend(_REF_TOKEN.findall(val))
                continue
            mode = None
            if uname == "OBJTYPE":
                cur["objtype"] = val.strip()
            elif level == 2 and val:
                cur["attrs"][name] = val.strip()
            continue
        # dotless continuation line: coordinates or more REF tokens
        if cur is None or mode is None:
            continue
        if mode == "refs":
            cur["refs"].extend(_REF_TOKEN.findall(line))
            continue
        parts = line.split()
        if len(parts) >= 2:
            try:
                n, e = float(parts[0]), float(parts[1])
            except ValueError:
                continue
            h = None
            if cur.get("has_h") and len(parts) >= 3:
                try:
                    h = float(parts[2])
                except ValueError:
                    h = None
            x = origo[1] + e * enhet
            y = origo[0] + n * enhet
            cur["coords"].append([x, y] if h is None else [x, y, h])
    _FEAT_KINDS = ("PUNKT", "TEKST", "KURVE", "BUEP", "FLATE", "HODE")
    skipped: dict[str, int] = {}
    for el in elems:
        if el["kind"] not in _FEAT_KINDS:
            skipped[el["kind"]] = skipped.get(el["kind"], 0) + 1
    meta = {"origo": origo, "enhet": enhet, "koordsys": koordsys,
            "epsg": _KOORDSYS_EPSG.get(koordsys),
            "sosi_versjon": versjon, "dato": dato,
            "omrade": omrade or None, "skipped": skipped}
    # BUEP arcs stroke to vertex chains up front so both the standalone
    # feature and any FLATE reference see the same polyline
    for el in elems:
        if el["kind"] == "BUEP" and len(el["coords"]) >= 3:
            el["coords"] = _stroke_buep(*el["coords"][:3])
    kurver = {el["id"]: el for el in elems
              if el["kind"] in ("KURVE", "BUEP") and el["id"] is not None}
    feats = []
    for el in elems:
        kind = el["kind"]
        if kind in ("PUNKT", "TEKST") and el["coords"]:
            # TEKST is a text point (GDAL's SOSI driver exposes it the
            # same way); its ..STRENG value already lands in attrs
            c = el["coords"][0]
            g = G.point(*c[:3]) if len(c) > 2 else G.point(c[0], c[1])
        elif kind in ("KURVE", "BUEP") and len(el["coords"]) >= 2:
            g = G.linestring(el["coords"])
        elif kind == "FLATE" and el["refs"]:
            rings, ring, depth = [], [], 0
            groups: list[tuple[list, bool]] = []  # (ref ids, is_hole)
            grp: list[int] = []
            for tok in el["refs"]:
                if tok == "(":
                    if grp:
                        groups.append((grp, depth > 0))
                    grp, depth = [], depth + 1
                elif tok == ")":
                    if grp:
                        groups.append((grp, True))
                    grp, depth = [], max(0, depth - 1)
                else:
                    grp.append(int(tok[1:]))
            if grp:
                groups.append((grp, depth > 0))
            def _ring(ids):
                ring = []
                for rid in ids:
                    k = kurver.get(abs(rid))
                    if k is None:
                        continue
                    pts = list(k["coords"])
                    if rid < 0:
                        pts = pts[::-1]
                    if ring and pts and ring[-1] == pts[0]:
                        pts = pts[1:]
                    ring.extend(pts)
                if len(ring) < 3:
                    return None
                if ring[0] != ring[-1]:
                    ring.append(list(ring[0]))
                return ring

            # ALL non-hole groups concatenate into ONE exterior chain:
            # exterior KURVE refs listed after a parenthesized hole group
            # continue the same shell (they are not a second polygon)
            shell_ids = [rid for ids, is_hole in groups if not is_hole
                         for rid in ids]
            shell = _ring(shell_ids)
            if shell is None:
                continue
            holes = [r for r in (_ring(ids) for ids, is_hole in groups
                                 if is_hole) if r is not None]
            g = G.polygon([shell] + holes)
        else:
            continue
        feats.append({"id": el["id"], "kind": kind,
                      "objtype": el.get("objtype"),
                      "attrs": el["attrs"], "geom": g})
    return meta, feats


def _distrib_rows(fp):
    """Worker-side row generator for read_sosi."""
    _, feats = parse_sosi(fp)
    for f in feats:
        yield (f["id"], f["kind"], f["objtype"],
               {str(k): str(v) for k, v in f["attrs"].items()},
               WKB.to_wkb(f["geom"]))


def read_sosi(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for .sos: (id, kind, objtype, attrs, geom) — one row per
    PUNKT/KURVE/FLATE element; FLATE boundaries assemble from their
    KURVE references. Per-file parsing runs distributed; the KOORDSYS
    code tags the geometry column's CRS (EUREF89 UTM zones)."""
    from pyspark.sql import types as T

    from ._distrib import distributed_file_read

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.sos")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    # KOORDSYS binds driver-side from a cheap header-only scan of EVERY
    # file, landing in the geom StructField metadata (the shapefile .prj
    # tagging idiom). Mixed zones across a directory (KOORDSYS 22 vs 23
    # is common across Kartverket municipality files) would mis-reference
    # every non-first file, so disagreement omits the tag entirely.
    codes = {_header_koordsys(f) for f in files}
    epsg = _KOORDSYS_EPSG.get(codes.pop()) if len(codes) == 1 else None
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("objtype", T.StringType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("geom", T.BinaryType(), True,
                      {"crs": f"EPSG:{epsg}"} if epsg else None),
    ])
    return distributed_file_read(
        spark, files, schema,
        "duckdb_spatial_spark.sources.sosi:_distrib_rows")


def write_sosi(df: DataFrame, path: str, geom_col: str = "geom",
               objtype_col: str | None = None, enhet: float = 0.01,
               origo: tuple = (0.0, 0.0), koordsys: int | None = None,
               attrs: list | None = None,
               max_rows: int = 1_000_000) -> None:
    """Minimal SOSI writer: UTF-8 HODE (TEGNSETT/TRANSPAR/OMRÅDE) + one
    PUNKT/KURVE per point/linestring and FLATE + boundary KURVEs per
    polygon (holes in parenthesized REF groups). ``attrs=[cols...]``
    writes each listed column as a ..NAME value group. Single-document
    format, driver-streamed with a hard cap (write_kml policy)."""
    o_n, o_e = float(origo[0]), float(origo[1])

    def q(v):  # coordinate -> integer units
        return int(round(v / enhet))

    lines: list[str] = []
    serial = [0]

    def nxt():
        serial[0] += 1
        return serial[0]

    def coord_lines(pts):
        return [f"{q(p[1] - o_n)} {q(p[0] - o_e)}" for p in pts]

    def attr_lines(d):
        out = []
        if objtype_col and d.get(objtype_col) is not None:
            out.append(f"..OBJTYPE {d[objtype_col]}")
        for c in attrs or []:
            if d.get(c) is not None:
                out.append(f"..{c.upper()} {d[c]}")
        return out

    n = 0
    ext: list[float] = []
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(f"write_sosi: more than max_rows={max_rows} rows")
        d = r.asDict()
        wkb = d.get(geom_col)
        if wkb is None:
            continue
        g = WKB.from_wkb(bytes(wkb))
        if g.tag == G.POINT:
            lines += [f".PUNKT {nxt()}:"] + attr_lines(d) + ["..NØ"]
            lines += coord_lines([list(g.data)])
            ext += [g.data[0], g.data[1]]
        elif g.tag == G.LINESTRING:
            lines += [f".KURVE {nxt()}:"] + attr_lines(d) + ["..NØ"]
            pts = [list(p) for p in g.data]
            lines += coord_lines(pts)
            ext += [c for p in pts for c in p[:2]]
        elif g.tag == G.POLYGON:
            ring_ids = []
            for ring in g.data:
                rid = nxt()
                ring_ids.append(rid)
                pts = [list(p) for p in ring]
                lines += [f".KURVE {rid}:", "..NØ"] + coord_lines(pts)
                ext += [c for p in pts for c in p[:2]]
            ref = f":{ring_ids[0]}" + "".join(
                f" (:{h})" for h in ring_ids[1:])
            rep = [list(g.data[0][0])]
            lines += ([f".FLATE {nxt()}:"] + attr_lines(d)
                      + [f"..REF {ref}", "..NØ"] + coord_lines(rep))
        else:
            raise ValueError(
                f"write_sosi: unsupported geometry tag {g.tag} "
                "(point/linestring/polygon)")
    xs = ext[0::2] or [0.0]
    ys = ext[1::2] or [0.0]
    head = [
        ".HODE", "..TEGNSETT UTF-8", "..TRANSPAR",
    ]
    if koordsys is not None:
        head.append(f"...KOORDSYS {koordsys}")
    head += [
        f"...ORIGO-NØ {int(o_n)} {int(o_e)}",
        f"...ENHET {enhet}",
        "..OMRÅDE",
        f"...MIN-NØ {q(min(ys) - o_n)} {q(min(xs) - o_e)}",
        f"...MAX-NØ {q(max(ys) - o_n)} {q(max(xs) - o_e)}",
        "..SOSI-VERSJON 4.5",
    ]
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(head + lines + [".SLUTT", ""]))
