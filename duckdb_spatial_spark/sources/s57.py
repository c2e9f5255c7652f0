"""S-57 ENC source (the reference reads nautical charts through GDAL's
S57 driver, listed in ``gdal/functions/st_drivers.cpp``). Independent
implementation of the PUBLIC structures: the ISO/IEC 8211 container
(leader / directory / field area with 0x1E field and 0x1F unit
terminators) and the IHO S-57 Part 3 binary field layouts:

  DSPM   COMF coordinate multiplication factor (lat/lon = XCOO/COMF)
  VRID   vector records (RCNM 110 VI / 120 VC isolated+connected nodes,
         130 VE edges) with SG2D (YCOO,XCOO int32 LE pairs — Y first)
         and VRPT begin/end-node pointers (NAME = RCNM byte + RCID LE)
  FRID   feature records (PRIM 1 point / 2 line / 3 area, OBJL class)
         with FSPT spatial pointers (NAME, ORNT 2 = reversed, USAG
         2 = interior ring)

Feature geometry assembles exactly as GDAL does: FSPT pointers resolve
to vector records; edge coordinates are the begin node + SG2D vertices
+ end node (VRPT TOPI 1/2), reversed under ORNT=2; area rings group by
USAG. The reader takes field LAYOUTS from the published S-57 binary
formats (they are fixed by the product spec), so a structurally exotic
DDR cannot misdirect it; the writer emits a conformant-shaped DDR, one
vector record per geometry and the FRID referencing it.

ATTF attribute fields parse into a per-feature map of
``{ATTL code: value string}`` (values are lexical-level-0/1 strings
terminated by the 0x1F unit terminator, per Part 3 §7.6.3); the writer
emits them from an ``attrs=`` column-to-code mapping.

Out of scope (skipped, not raised): NATF national attributes, 3D
soundings (SG3D), update files (.001+), multiple exterior rings."""

from __future__ import annotations

import glob as _glob
import os
import struct

from pyspark.sql import DataFrame, SparkSession

from ..geo import geom as G
from ..geo import wkb as WKB

_FT = b"\x1e"  # ISO 8211 field terminator
_UT = b"\x1f"  # unit terminator

RCNM_VI, RCNM_VC, RCNM_VE, RCNM_VF = 110, 120, 130, 140
RCNM_FE = 100
PRIM_P, PRIM_L, PRIM_A = 1, 2, 3


# --------------------------------------------------------------------------
# ISO 8211 container
# --------------------------------------------------------------------------
def iso8211_records(buf: bytes):
    """Yield (leader_id, [(tag, field_bytes), ...]) per record."""
    off = 0
    n = len(buf)
    while off + 24 <= n:
        try:
            reclen = int(buf[off : off + 5])
        except ValueError:
            return
        leader_id = chr(buf[off + 6])
        base = int(buf[off + 12 : off + 17])
        sz_len = int(chr(buf[off + 20]))
        sz_pos = int(chr(buf[off + 21]))
        sz_tag = int(chr(buf[off + 23]))
        entry = sz_tag + sz_len + sz_pos
        d = off + 24
        fields = []
        while buf[d : d + 1] != _FT and d + entry <= off + base:
            tag = buf[d : d + sz_tag].decode("ascii", "replace")
            flen = int(buf[d + sz_tag : d + sz_tag + sz_len])
            fpos = int(buf[d + sz_tag + sz_len : d + entry])
            start = off + base + fpos
            data = buf[start : start + flen]
            if data.endswith(_FT):
                data = data[:-1]
            fields.append((tag, data))
            d += entry
        yield leader_id, fields
        off += reclen


def _mk_record(leader_id: str, fields, field_control_len: str = "  ") -> bytes:
    sz_tag = 4
    dir_entries = b""
    area = b""
    ents = []
    for tag, data in fields:
        data = data + _FT
        ents.append((tag, len(data), len(area)))
        area += data
    sz_len = max(len(str(max((l for _, l, _ in ents), default=0))), 1)
    sz_pos = max(len(str(max((p for _, _, p in ents), default=0))), 1)
    for tag, l, p in ents:
        dir_entries += (
            tag.ljust(sz_tag).encode()
            + str(l).zfill(sz_len).encode()
            + str(p).zfill(sz_pos).encode()
        )
    dir_entries += _FT
    base = 24 + len(dir_entries)
    total = base + len(area)
    leader = (
        str(total).zfill(5).encode()
        + b"3"
        + leader_id.encode()
        + b"E1 "
        + field_control_len.encode()
        + str(base).zfill(5).encode()
        + b" ! "
        + str(sz_len).encode()
        + str(sz_pos).encode()
        + b"0"
        + str(sz_tag).encode()
    )
    assert len(leader) == 24
    return leader + dir_entries + area


# --------------------------------------------------------------------------
# S-57 parse
# --------------------------------------------------------------------------
def _name(b: bytes) -> tuple:
    return b[0], struct.unpack("<I", b[1:5])[0]


def _parse_attf(data: bytes) -> dict:
    """Repeating (ATTL b12, ATVL string + UT) -> {code: value}."""
    out = {}
    i = 0
    while i + 2 <= len(data):
        attl = struct.unpack_from("<H", data, i)[0]
        i += 2
        end = data.find(_UT, i)
        if end == -1:
            end = len(data)
        out[attl] = data[i:end].decode("utf-8", "replace")
        i = end + 1
    return out


def parse_s57(path: str):
    """-> list of (rcid, objl, prim, attrs_dict, geometry)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    comf = 1.0
    nodes: dict = {}   # (rcnm, rcid) -> [x, y]
    edges: dict = {}   # (rcnm, rcid) -> dict(coords=[...], begin=NAME, end=NAME)
    feats = []
    for leader_id, fields in iso8211_records(buf):
        if leader_id == "L":
            continue  # DDR: layouts come from the S-57 product spec
        fmap: dict = {}
        for tag, data in fields:
            fmap.setdefault(tag, []).append(data)
        if "DSPM" in fmap:
            d = fmap["DSPM"][0]
            if len(d) >= 20:
                comf = float(struct.unpack_from("<I", d, 16)[0]) or 1.0
        if "VRID" in fmap:
            v = fmap["VRID"][0]
            rcnm, rcid = v[0], struct.unpack_from("<I", v, 1)[0]
            coords = []
            for sg in fmap.get("SG2D", []):
                for i in range(0, len(sg) - 7, 8):
                    y, x = struct.unpack_from("<ii", sg, i)
                    coords.append([x / comf, y / comf])
            rec = {"coords": coords, "begin": None, "end": None}
            for vp in fmap.get("VRPT", []):
                for i in range(0, len(vp) - 8, 9):
                    nm = _name(vp[i : i + 5])
                    topi = vp[i + 7]
                    if topi == 1:
                        rec["begin"] = nm
                    elif topi == 2:
                        rec["end"] = nm
            if rcnm in (RCNM_VI, RCNM_VC):
                if coords:
                    nodes[(rcnm, rcid)] = coords[0]
            elif rcnm == RCNM_VE:
                edges[(rcnm, rcid)] = rec
        if "FRID" in fmap:
            f = fmap["FRID"][0]
            rcnm, rcid = f[0], struct.unpack_from("<I", f, 1)[0]
            if rcnm != RCNM_FE or len(f) < 12:
                continue
            prim = f[5]
            objl = struct.unpack_from("<H", f, 7)[0]
            ptrs = []
            for fs in fmap.get("FSPT", []):
                for i in range(0, len(fs) - 7, 8):
                    nm = _name(fs[i : i + 5])
                    ornt, usag = fs[i + 5], fs[i + 6]
                    ptrs.append((nm, ornt, usag))
            attrs = {}
            for a in fmap.get("ATTF", []):
                attrs.update(_parse_attf(a))
            g = _assemble(prim, ptrs, nodes, edges)
            if g is not None:
                feats.append((rcid, objl, prim, attrs, g))
    return feats


def _edge_coords(nm, ornt, nodes, edges):
    rec = edges.get(nm)
    if rec is None:
        return []
    pts = list(rec["coords"])
    if rec["begin"] is not None and rec["begin"] in nodes:
        pts.insert(0, list(nodes[rec["begin"]]))
    if rec["end"] is not None and rec["end"] in nodes:
        pts.append(list(nodes[rec["end"]]))
    if ornt == 2:
        pts = pts[::-1]
    return pts


def _assemble(prim, ptrs, nodes, edges):
    if prim == PRIM_P:
        for nm, _, _ in ptrs:
            if nm in nodes:
                xy = nodes[nm]
                return G.point(xy[0], xy[1])
        return None
    if prim == PRIM_L:
        pts = []
        for nm, ornt, _ in ptrs:
            seg = _edge_coords(nm, ornt, nodes, edges)
            if pts and seg and pts[-1] == seg[0]:
                seg = seg[1:]
            pts.extend(seg)
        return G.linestring(pts) if len(pts) >= 2 else None
    if prim == PRIM_A:
        exterior, holes, cur, cur_usag = [], [], [], 1
        rings = []
        for nm, ornt, usag in ptrs:
            seg = _edge_coords(nm, ornt, nodes, edges)
            if cur and seg and cur[-1] == seg[0]:
                seg = seg[1:]
            if cur and not seg:
                continue
            if cur and cur_usag != usag:
                rings.append((cur_usag, cur))
                cur = []
            cur_usag = usag
            cur.extend(seg)
            if len(cur) >= 4 and cur[0] == cur[-1]:
                rings.append((cur_usag, cur))
                cur = []
        if cur:
            rings.append((cur_usag, cur))
        for usag, ring in rings:
            if len(ring) < 3:
                continue
            if ring[0] != ring[-1]:
                ring.append(list(ring[0]))
            (holes if usag == 2 else exterior).append(ring)
        if not exterior:
            return None
        return G.polygon([exterior[0]] + holes)
    return None


def read_s57(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for .000 ENC cells: (rcid, objl, prim, attrs, geom) —
    ``attrs`` is the ATTF map {attribute code: value string}."""
    from pyspark.sql import types as T

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.000")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    rows = []
    for fp in files:
        for rcid, objl, prim, attrs, g in parse_s57(fp):
            rows.append((int(rcid), int(objl), int(prim),
                         {int(k): str(v) for k, v in attrs.items()},
                         WKB.to_wkb(g)))
    schema = T.StructType(
        [
            T.StructField("rcid", T.LongType()),
            T.StructField("objl", T.IntegerType()),
            T.StructField("prim", T.IntegerType()),
            T.StructField("attrs", T.MapType(T.IntegerType(), T.StringType())),
            T.StructField("geom", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------
_DDR_FIELDS = [
    ("0000", b"0100;&   S57 subset"),
    ("0001", b"0100;&ISO 8211 Record Identifier"),
    ("DSPM", b"1600;&Data set parameter field"),
    ("VRID", b"1600;&Vector record identifier field"),
    ("SG2D", b"2600;&2-D coordinate field"),
    ("VRPT", b"2600;&Vector record pointer field"),
    ("FRID", b"1600;&Feature record identifier field"),
    ("FSPT", b"2600;&Feature to spatial record pointer field"),
]


def _vrid(rcnm: int, rcid: int) -> bytes:
    return bytes([rcnm]) + struct.pack("<IHB", rcid, 1, 1)


def _sg2d(coords, comf: float) -> bytes:
    out = b""
    for x, y in coords:
        out += struct.pack("<ii", int(round(y * comf)), int(round(x * comf)))
    return out


def _fspt(entries) -> bytes:
    out = b""
    for (rcnm, rcid), ornt, usag in entries:
        out += bytes([rcnm]) + struct.pack("<I", rcid) + bytes([ornt, usag, 2])
    return out


def write_s57(df: DataFrame, path: str, geom_col: str = "geom",
              objl_col: str | None = None, comf: float = 10_000_000.0,
              attrs: dict | None = None,
              max_rows: int = 1_000_000) -> None:
    """Minimal ENC writer: DDR + DSPM record, one vector record (VI node /
    VE edge) per geometry and the FRID feature referencing it via FSPT.
    Points/linestrings/polygons (with holes: one closed VE per ring,
    interior rings at USAG 2). Single-document format, driver-streamed
    with a hard cap (write_kml policy).

    ``attrs={column: ATTL_code}`` writes each listed column's non-null
    values as ATTF (code, stringified value) pairs on the feature."""
    recs = [_mk_record("L", _DDR_FIELDS, field_control_len="09")]
    dspm = (
        bytes([20])
        + struct.pack("<I", 1)
        + bytes([2, 7, 1])
        + struct.pack("<I", 52000)
        + bytes([1, 1, 1, 1])
        + struct.pack("<II", int(comf), 10)
    )
    recs.append(_mk_record("D", [("0001", struct.pack("<H", 1)), ("DSPM", dspm)]))
    next_rc = [1]
    recno = [2]

    def rec(fields):
        recno[0] += 1
        return _mk_record("D", [("0001", struct.pack("<H", recno[0]))] + fields)

    n = 0
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(f"write_s57: more than max_rows={max_rows} rows")
        d = r.asDict()
        wkb = d.get(geom_col)
        if wkb is None:
            continue
        objl = int(d.get(objl_col, 1) or 1) if objl_col else 1
        g = WKB.from_wkb(bytes(wkb))
        fspt_entries = []
        if g.tag == G.POINT:
            rcid = next_rc[0]; next_rc[0] += 1
            recs.append(rec([
                ("VRID", _vrid(RCNM_VI, rcid)),
                ("SG2D", _sg2d([(g.data[0], g.data[1])], comf)),
            ]))
            prim = PRIM_P
            fspt_entries.append(((RCNM_VI, rcid), 1, 1))
        elif g.tag == G.LINESTRING:
            rcid = next_rc[0]; next_rc[0] += 1
            recs.append(rec([
                ("VRID", _vrid(RCNM_VE, rcid)),
                ("SG2D", _sg2d([(p[0], p[1]) for p in g.data], comf)),
            ]))
            prim = PRIM_L
            fspt_entries.append(((RCNM_VE, rcid), 1, 1))
        elif g.tag == G.POLYGON:
            prim = PRIM_A
            for k, ring in enumerate(g.data):
                rcid = next_rc[0]; next_rc[0] += 1
                recs.append(rec([
                    ("VRID", _vrid(RCNM_VE, rcid)),
                    ("SG2D", _sg2d([(p[0], p[1]) for p in ring], comf)),
                ]))
                fspt_entries.append(((RCNM_VE, rcid), 1, 2 if k else 1))
        else:
            raise ValueError(f"write_s57: unsupported geometry tag {g.tag}")
        frid_id = next_rc[0]; next_rc[0] += 1
        frid = bytes([RCNM_FE]) + struct.pack("<I", frid_id) + bytes(
            [prim, 1]) + struct.pack("<HHB", objl, 1, 1)
        fields = [("FRID", frid), ("FSPT", _fspt(fspt_entries))]
        if attrs:
            attf = b""
            for col, code in attrs.items():
                v = d.get(col)
                if v is None:
                    continue
                attf += struct.pack("<H", int(code)) + str(v).encode("utf-8") + _UT
            if attf:
                fields.insert(1, ("ATTF", attf))
        recs.append(rec(fields))
    with open(path, "wb") as fh:
        fh.write(b"".join(recs))
