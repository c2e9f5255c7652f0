"""SDTS Topological Vector Profile source (.DDF — the USGS Spatial Data
Transfer Standard; the reference reads it through GDAL's SDTS driver,
listed by ``gdal/functions/st_drivers.cpp``'s GDAL enumeration).
Independent implementation of the PUBLIC transfer structure (ANSI NCITS
320-1998 / the USGS TVP; GDAL's frmts/sdts reader defines the behavior
matched here):

  a transfer is a directory of ISO 8211 .DDF files named
  <XXXX><MODN>.DDF (4-char transfer prefix + module name):

  CATD   catalog/directory: one CATD field per record with the module
         NAME and its FILE — the enumeration GDAL walks (sdtscatalog)
  IREF   internal reference: X/Y scale factors (SFAX/SFAY) and origins
         (XORG/YORG) — stored coordinates decode as org + raw * scale
  NO##/NA##/NP## point-node modules: one point per record — identity
         field PNTS (module name + record id) + one SADR coordinate
  LE##   line modules: identity field LINE, optional ATID attribute
         references, and a repeating SADR coordinate field
  AP##   attribute-primary modules: identity field ATPR + ATTP labels

Coordinates in SADR are X,Y pairs of 4-byte big-endian two's-complement
integers (the TVP's BI32 convention). Identity/reference subfields are
MODN A(4) + RCID as 4-byte big-endian unsigned — in a real transfer the
DDR record describes every subfield format; this reader does not
interpret DDRs (the S-57 stance, sources/s57.py) so these fixed layouts
are pinned by this module's writer-reader pair and stated here, the
same visible-assumption policy as dgn.py's B-spline header note. ATTP
payloads surface as UT-delimited ``label=value`` strings into an attrs
map — the model-less view (GDAL resolves real labels through the DDR).
Polygon modules (PC##) assemble areas from line topology; this subset
reads points and lines (the primitives GDAL's SDTSRawPoint/SDTSRawLine
expose) and skips polygon modules, counted in the parse meta."""

from __future__ import annotations

import glob as _glob
import os
import struct

from pyspark.sql import DataFrame, SparkSession

from ..geo import geom as G
from ..geo import wkb as WKB
from .s57 import _UT, _mk_record, iso8211_records

_DDR_FIELDS = [("0000", b";&SDTS fixture DDR (uninterpreted; see module docstring)")]


def _name4(data: bytes, off: int = 0):
    """MODN A(4) + RCID BE-uint32 identity/reference layout."""
    modn = data[off:off + 4].decode("ascii", "replace").strip()
    rcid = struct.unpack_from(">I", data, off + 4)[0]
    return modn, rcid


def _wr_name4(modn: str, rcid: int) -> bytes:
    return modn.ljust(4)[:4].encode("ascii") + struct.pack(">I", rcid)


def parse_sdts_iref(path: str) -> dict:
    """IREF module: UT-delimited ASCII reals SFAX, SFAY, XORG, YORG."""
    out = {"sfax": 1.0, "sfay": 1.0, "xorg": 0.0, "yorg": 0.0}
    with open(path, "rb") as fh:
        buf = fh.read()
    for leader_id, fields in iso8211_records(buf):
        if leader_id == "L":
            continue
        for tag, data in fields:
            if tag == "IREF":
                parts = data.split(_UT)
                for key, raw in zip(("sfax", "sfay", "xorg", "yorg"), parts):
                    try:
                        out[key] = float(raw)
                    except ValueError:
                        pass
    return out


def parse_sdts_catd(path: str) -> list[dict]:
    """CATD module: [{'name': module, 'file': filename}] per record."""
    with open(path, "rb") as fh:
        buf = fh.read()
    out = []
    for leader_id, fields in iso8211_records(buf):
        if leader_id == "L":
            continue
        for tag, data in fields:
            if tag == "CATD":
                parts = [p.decode("ascii", "replace") for p in data.split(_UT)]
                if len(parts) >= 2 and parts[0].strip():
                    out.append({"name": parts[0].strip(),
                                "file": parts[1].strip()})
    return out


def _parse_attrs(datas: list[bytes]) -> dict:
    """ATTP payloads: UT-delimited 'label=value' strings -> map."""
    out = {}
    for data in datas:
        for piece in data.split(_UT):
            s = piece.decode("utf-8", "replace")
            k, eq, v = s.partition("=")
            if eq and k:
                out[k] = v
    return out


def _sadr_points(data: bytes, iref: dict) -> list:
    pts = []
    for off in range(0, len(data) - 7, 8):
        xr, yr = struct.unpack_from(">ii", data, off)
        pts.append([iref["xorg"] + xr * iref["sfax"],
                    iref["yorg"] + yr * iref["sfay"]])
    return pts


def parse_sdts(path: str):
    """Parse a transfer (directory or its CATD .DDF) -> (meta, features);
    features are dicts {module, rcid, attrs, geometry}."""
    if os.path.isdir(path):
        cats = sorted(_glob.glob(os.path.join(path, "*CATD.DDF"))
                      + _glob.glob(os.path.join(path, "*catd.ddf")))
        if not cats:
            raise FileNotFoundError(f"{path}: no CATD module found")
        cat_path = cats[0]
    else:
        cat_path = path
    root = os.path.dirname(os.path.abspath(cat_path))
    modules = parse_sdts_catd(cat_path)
    files = {m["name"]: os.path.join(root, m["file"]) for m in modules}

    iref = {"sfax": 1.0, "sfay": 1.0, "xorg": 0.0, "yorg": 0.0}
    for name, fp in files.items():
        if name.upper().startswith("IREF") and os.path.exists(fp):
            iref = parse_sdts_iref(fp)

    # attribute-primary modules first, so ATID references resolve
    attr_recs: dict[tuple, dict] = {}
    for name, fp in files.items():
        if not name.upper().startswith("AP") or not os.path.exists(fp):
            continue
        with open(fp, "rb") as fh:
            buf = fh.read()
        for leader_id, fields in iso8211_records(buf):
            if leader_id == "L":
                continue
            rcid = None
            attps = []
            for tag, data in fields:
                if tag == "ATPR" and len(data) >= 8:
                    _, rcid = _name4(data)
                elif tag == "ATTP":
                    attps.append(data)
            if rcid is not None:
                attr_recs[(name, rcid)] = _parse_attrs(attps)

    meta = {"iref": iref, "modules": [m["name"] for m in modules],
            "skipped": {}}
    feats = []
    for name, fp in files.items():
        up = name.upper()
        if up.startswith(("CATD", "IREF", "AP")):
            continue
        if not os.path.exists(fp):
            meta["skipped"][name] = "missing file"
            continue
        is_point = up.startswith(("NO", "NA", "NP"))
        is_line = up.startswith("LE")
        if not (is_point or is_line):
            meta["skipped"][name] = "unsupported module type"
            continue
        with open(fp, "rb") as fh:
            buf = fh.read()
        for leader_id, fields in iso8211_records(buf):
            if leader_id == "L":
                continue
            rcid = None
            coords: list = []
            atids: list[tuple] = []
            for tag, data in fields:
                if tag in ("PNTS", "LINE") and len(data) >= 8:
                    _, rcid = _name4(data)
                elif tag == "SADR":
                    coords.extend(_sadr_points(data, iref))
                elif tag == "ATID" and len(data) >= 8:
                    atids.append(_name4(data))
            if rcid is None or not coords:
                continue
            attrs: dict = {}
            for ref in atids:
                attrs.update(attr_recs.get(ref, {}))
            if is_point:
                g = G.point(*coords[0])
            elif len(coords) >= 2:
                g = G.linestring(coords)
            else:
                continue
            feats.append({"module": name, "rcid": rcid,
                          "attrs": attrs, "geom": g})
    return meta, feats


def _distrib_rows(fp):
    """Worker-side row generator for read_sdts (one transfer per task —
    a transfer's modules cross-reference, so the CATD is the unit)."""
    _, feats = parse_sdts(fp)
    for f in feats:
        yield (f["module"], int(f["rcid"]),
               {str(k): str(v) for k, v in f["attrs"].items()},
               WKB.to_wkb(f["geom"]))


def read_sdts(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for SDTS transfers: (module, rcid, attrs, geom) — one row
    per point/line record, attributes resolved through ATID references
    into the AP modules. ``path`` is the transfer directory, its CATD
    .DDF, or a glob of CATD files; each transfer parses as one input
    partition (modules cross-reference inside a transfer)."""
    from pyspark.sql import types as T

    from ._distrib import distributed_file_read

    if os.path.isdir(path):
        cats = sorted(_glob.glob(os.path.join(path, "*CATD.DDF"))
                      + _glob.glob(os.path.join(path, "*catd.ddf")))
        files = cats or None
        if files is None:
            # directory of transfer subdirectories
            files = sorted(_glob.glob(os.path.join(path, "*", "*CATD.DDF")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    schema = T.StructType([
        T.StructField("module", T.StringType()),
        T.StructField("rcid", T.LongType()),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
        T.StructField("geom", T.BinaryType()),
    ])
    return distributed_file_read(
        spark, files, schema,
        "duckdb_spatial_spark.sources.sdts:_distrib_rows")


def write_sdts(df: DataFrame, path: str, geom_col: str = "geom",
               rcid_col: str | None = None, attrs: list | None = None,
               prefix: str = "TR01", sfax: float = 0.01, sfay: float = 0.01,
               xorg: float = 0.0, yorg: float = 0.0,
               max_rows: int = 1_000_000) -> None:
    """Minimal TVP transfer writer (fixture/export path, the write_kml
    policy): CATD + IREF + NO01 point module + LE01 line module + AP01
    attribute module into ``path`` (a directory). Points/linestrings
    only; ``attrs=[cols...]`` writes each row's listed columns as one
    AP01 record referenced via ATID. Coordinates quantize at the
    sfax/sfay scale (exact for inputs on that grid)."""
    os.makedirs(path, exist_ok=True)

    def q(v, scale, org):
        return int(round((v - org) / scale))

    def rec(recno, fields):
        return _mk_record("D", [("0001", struct.pack("<H", recno))] + fields)

    iref_rec = rec(1, [("IREF", (f"{sfax!r}".encode() + _UT
                                 + f"{sfay!r}".encode() + _UT
                                 + f"{xorg!r}".encode() + _UT
                                 + f"{yorg!r}".encode()))])
    points, lines, aprecs = [], [], []
    n = 0
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(f"write_sdts: more than max_rows={max_rows} rows")
        d = r.asDict()
        wkb = d.get(geom_col)
        if wkb is None:
            continue
        rv = d.get(rcid_col) if rcid_col else None
        rcid = n if rv is None else int(rv)
        fields = []
        if attrs:
            vals = [f"{c}={d.get(c)}" for c in attrs if d.get(c) is not None]
            if vals:
                ap_id = len(aprecs) + 1
                aprecs.append(rec(
                    len(aprecs) + 2,
                    [("ATPR", _wr_name4("AP01", ap_id)),
                     ("ATTP", _UT.join(v.encode("utf-8") for v in vals))]))
                fields.append(("ATID", _wr_name4("AP01", ap_id)))
        g = WKB.from_wkb(bytes(wkb))
        if g.tag == G.POINT:
            sadr = struct.pack(">ii", q(g.data[0], sfax, xorg),
                               q(g.data[1], sfay, yorg))
            points.append(rec(len(points) + 2,
                              [("PNTS", _wr_name4("NO01", rcid))]
                              + fields + [("SADR", sadr)]))
        elif g.tag == G.LINESTRING:
            sadr = b"".join(struct.pack(">ii", q(p[0], sfax, xorg),
                                        q(p[1], sfay, yorg))
                            for p in g.data)
            lines.append(rec(len(lines) + 2,
                             [("LINE", _wr_name4("LE01", rcid))]
                             + fields + [("SADR", sadr)]))
        else:
            raise ValueError(f"write_sdts: unsupported geometry tag {g.tag} "
                             "(point/linestring modules only)")
    mods = [("IREF", f"{prefix}IREF.DDF", [iref_rec]),
            ("NO01", f"{prefix}NO01.DDF", points),
            ("LE01", f"{prefix}LE01.DDF", lines),
            ("AP01", f"{prefix}AP01.DDF", aprecs)]
    catd = [_mk_record("L", _DDR_FIELDS, field_control_len="09")]
    for i, (name, fname, recs) in enumerate(mods):
        catd.append(rec(i + 2, [("CATD", name.encode() + _UT
                                 + fname.encode())]))
        with open(os.path.join(path, fname), "wb") as fh:
            fh.write(_mk_record("L", _DDR_FIELDS, field_control_len="09")
                     + b"".join(recs))
    with open(os.path.join(path, f"{prefix}CATD.DDF"), "wb") as fh:
        fh.write(b"".join(catd))
