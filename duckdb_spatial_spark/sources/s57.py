"""S-57 ENC source (the reference reads nautical charts through GDAL's
S57 driver, listed in ``gdal/functions/st_drivers.cpp``). Independent
implementation of the PUBLIC structures: the ISO/IEC 8211 container
(leader / directory / field area with 0x1E field and 0x1F unit
terminators) and the IHO S-57 Part 3 binary field layouts:

  DSID   data set identification (DSNM/EDTN/UPDN surfaced via
         st_read_meta)
  DSPM   COMF coordinate multiplication factor (lat/lon = XCOO/COMF)
         and SOMF sounding multiplication factor (depth = VE3D/SOMF)
  VRID   vector records (RCNM 110 VI / 120 VC isolated+connected nodes,
         130 VE edges) with SG2D (YCOO,XCOO int32 LE pairs — Y first),
         SG3D sounding triplets (YCOO,XCOO,VE3D) and VRPT begin/end-node
         pointers (NAME = RCNM byte + RCID LE)
  FRID   feature records (PRIM 1 point / 2 line / 3 area, OBJL class)
         with FSPT spatial pointers (NAME, ORNT 2 = reversed, USAG
         2 = interior ring)

Feature geometry assembles exactly as GDAL does: FSPT pointers resolve
to vector records; edge coordinates are the begin node + SG2D vertices
+ end node (VRPT TOPI 1/2), reversed under ORNT=2; area rings group by
USAG — multiple exterior rings become a MULTIPOLYGON with each interior
ring attached to the shell containing it (GDAL organizes the same way
via OGRGeometryFactory::organizePolygons). VI nodes carrying SG3D emit
POINT Z / MULTIPOINT Z soundings. The reader takes field LAYOUTS from
the published S-57 binary formats (they are fixed by the product spec),
so a structurally exotic DDR cannot misdirect it; the writer emits a
conformant-shaped DDR, one vector record per geometry and the FRID
referencing it.

ATTF attribute fields parse into a per-feature map of
``{ATTL code: value string}`` (values are lexical-level-0/1 strings
terminated by the 0x1F unit terminator, per Part 3 §7.6.3); NATF
national attributes parse the same way into a separate ``natf`` map.
The writer emits them from ``attrs=`` / ``natf=`` column-to-code
mappings.

Update files (.001, .002, ...) found next to the base .000 cell apply
in numeric order at the RECORD level (S-57 Part 3 ch. 8): RUIN 1
inserts the record, 2 deletes it by (RCNM, RCID), 3 modifies it —
ATTF/NATF merge per attribute code; SG2D/SG3D/VRPT/FSPT replace
wholesale when no control field accompanies them. The partial-edit
control fields ARE honored when present (Part 3 §8.4): SGCC
(CCUI 1=insert/2=delete/3=modify, CCIX 1-based index, CCNC count)
splices the accompanying SG2D coordinates into the target's array,
FSPC (FSUI/FSIX/NSPT) splices FSPT pointer entries the same way, and
VRPC (VPUI/VPIX/NVPT) splices VRPT vector-pointer entries — the full
set of operations GDAL's S57 driver applies via ApplyRecordUpdate.
A RUIN=3 (modify) whose target is absent from the base is skipped,
as GDAL does — inserting the fragment would fabricate a feature.

Exchange sets (r16): a CATALOG.031 catalogue (one CATD field per
ISO 8211 record, Part 3 §5.2) enumerates the set's files; read_s57
accepts the catalogue path or the exchange-set root (ENC_ROOT layout)
and reads exactly the referenced .000 cells — GDAL's S57 enumeration
behavior, including '\\\\'-separator normalization and skipping
ancillary/missing entries."""

from __future__ import annotations

import glob as _glob
import os
import re as _re
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
        # malformed/zero-padded leaders would loop forever or point the
        # directory outside the record — bail loudly-by-stopping
        if reclen <= 24 or base <= 24 or base > reclen:
            return
        sz_len = int(chr(buf[off + 20]))
        sz_pos = int(chr(buf[off + 21]))
        sz_tag = int(chr(buf[off + 23]))
        entry = sz_tag + sz_len + sz_pos
        if entry <= 0:
            return
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


def _parse_dsid(data: bytes) -> dict:
    """DSID: RCNM(1) RCID(4) EXPP(1) INTU(1) then UT-terminated DSNM,
    EDTN, UPDN, UADT, ISDT strings (Part 3 §7.3.1.1)."""
    out = {}
    if len(data) < 7:
        return out
    out["expp"] = int(data[5])   # exchange purpose (1 new / 2 revision)
    out["intu"] = int(data[6])   # intended usage (navigational purpose)
    parts = data[7:].split(_UT)
    for key, val in zip(("dsnm", "edtn", "updn", "uadt", "isdt"), parts):
        out[key] = val.decode("utf-8", "replace")
    return out


def _collect_records(buf: bytes):
    """One pass over the ISO 8211 records -> (comf, somf, dsid_meta,
    records). Each record: dict(kind 'V'|'F', rcnm, rcid, ruin, fmap)."""
    comf, somf = 1.0, 10.0
    dsid: dict = {}
    records = []
    for leader_id, fields in iso8211_records(buf):
        if leader_id == "L":
            continue  # DDR: layouts come from the S-57 product spec
        fmap: dict = {}
        for tag, data in fields:
            fmap.setdefault(tag, []).append(data)
        if "DSID" in fmap:
            dsid = _parse_dsid(fmap["DSID"][0]) or dsid
        if "DSPM" in fmap:
            d = fmap["DSPM"][0]
            if len(d) >= 20:
                comf = float(struct.unpack_from("<I", d, 16)[0]) or 1.0
            if len(d) >= 24:
                somf = float(struct.unpack_from("<I", d, 20)[0]) or 10.0
        if "VRID" in fmap:
            v = fmap["VRID"][0]
            rcnm, rcid = v[0], struct.unpack_from("<I", v, 1)[0]
            ruin = v[7] if len(v) >= 8 else 1
            records.append({"kind": "V", "rcnm": rcnm, "rcid": rcid,
                            "ruin": ruin, "fmap": fmap})
        if "FRID" in fmap:
            f = fmap["FRID"][0]
            rcnm, rcid = f[0], struct.unpack_from("<I", f, 1)[0]
            if rcnm != RCNM_FE or len(f) < 12:
                continue
            ruin = f[11] if len(f) >= 12 else 1
            records.append({"kind": "F", "rcnm": rcnm, "rcid": rcid,
                            "ruin": ruin, "fmap": fmap})
    return comf, somf, dsid, records



def _splice(items: list, blob: bytes, width: int, instr: int,
            ix: int, count: int) -> list:
    """Part 3 §8.4 control-field splice over fixed-width array entries:
    instr 1 = insert ``count`` new entries at 1-based position ``ix``,
    2 = delete ``count`` entries from ``ix``, 3 = replace ``count``
    entries from ``ix`` with the new ones."""
    new = [blob[i:i + width] for i in range(0, len(blob) - width + 1, width)]
    i = max(0, ix - 1)
    if instr == 1:
        return items[:i] + new[:count or len(new)] + items[i:]
    if instr == 2:
        return items[:i] + items[i + count:]
    if instr == 3:
        return items[:i] + new[:count] + items[i + count:]
    return items


def _entries(datas: list, width: int) -> list:
    out = []
    for d in datas:
        out.extend(d[i:i + width] for i in range(0, len(d) - width + 1, width))
    return out


def _apply_updates(base: list, upd: list) -> list:
    """Record-level RUIN application: 1 insert, 2 delete, 3 modify.
    Modify honors SGCC/FSPC partial-edit control fields when present."""
    by_key = {(r["kind"], r["rcnm"], r["rcid"]): r for r in base}
    order = [(r["kind"], r["rcnm"], r["rcid"]) for r in base]
    for u in upd:
        key = (u["kind"], u["rcnm"], u["rcid"])
        if u["ruin"] == 2:
            by_key.pop(key, None)
        elif u["ruin"] == 3 and key in by_key:
            tgt = by_key[key]["fmap"]
            ufm = u["fmap"]
            handled = set()
            if "SGCC" in ufm and len(ufm["SGCC"][0]) >= 9:
                # CCUI b11, CCIX b14, CCNC b14 (Part 3 §7.7.2.4)
                c = ufm["SGCC"][0]
                instr = c[0]
                ccix, ccnc = struct.unpack_from("<II", c, 1)
                coords = _entries(tgt.get("SG2D", []), 8)
                blob = b"".join(ufm.get("SG2D", [b""]))
                tgt["SG2D"] = [b"".join(_splice(coords, blob, 8, instr,
                                                ccix, ccnc))]
                handled.update(("SGCC", "SG2D"))
            if "FSPC" in ufm and len(ufm["FSPC"][0]) >= 9:
                c = ufm["FSPC"][0]
                instr = c[0]
                fsix, nspt = struct.unpack_from("<II", c, 1)
                ptrs = _entries(tgt.get("FSPT", []), 8)
                blob = b"".join(ufm.get("FSPT", [b""]))
                tgt["FSPT"] = [b"".join(_splice(ptrs, blob, 8, instr,
                                                fsix, nspt))]
                handled.update(("FSPC", "FSPT"))
            if "VRPC" in ufm and len(ufm["VRPC"][0]) >= 9:
                # VRPC (VPUI b11, VPIX b14, NVPT b14) splices 9-byte VRPT
                # pointer entries — the last §8.4 control field GDAL
                # applies (ApplyRecordUpdate) that r14 still replaced
                # wholesale
                c = ufm["VRPC"][0]
                instr = c[0]
                vpix, nvpt = struct.unpack_from("<II", c, 1)
                ptrs = _entries(tgt.get("VRPT", []), 9)
                blob = b"".join(ufm.get("VRPT", [b""]))
                tgt["VRPT"] = [b"".join(_splice(ptrs, blob, 9, instr,
                                                vpix, nvpt))]
                handled.update(("VRPC", "VRPT"))
            for tag, datas in ufm.items():
                if tag in ("0001", "VRID", "FRID") or tag in handled:
                    continue
                if tag in ("ATTF", "NATF"):
                    # merge per attribute code
                    merged = {}
                    for d in tgt.get(tag, []):
                        merged.update(_parse_attf(d))
                    for d in datas:
                        merged.update(_parse_attf(d))
                    blob = b"".join(
                        struct.pack("<H", k) + v.encode("utf-8") + _UT
                        for k, v in merged.items())
                    tgt[tag] = [blob]
                else:
                    tgt[tag] = list(datas)  # wholesale replacement
        elif u["ruin"] == 3:
            # modify of a record absent from the base: GDAL warns and
            # skips — inserting the fragment would surface a bogus
            # partial record as a feature (r14 advisory)
            continue
        else:  # insert (or unknown RUIN: treat as insert, GDAL warns too)
            if key not in by_key:
                order.append(key)
            by_key[key] = u
    return [by_key[k] for k in order if k in by_key]


def _parse_catd(data: bytes) -> dict:
    """CATD (Catalogue Directory field, S-57 Part 3 §5.2): RCNM A(2) and
    RCID I(10) fixed-width, then UT-delimited FILE, LFIL, VOLM; IMPL A(3)
    fixed at the head of the next slice followed by SLAT; then WLON,
    NLAT, ELON, CRCS, COMT — all ASCII in the catalogue implementation."""
    out: dict = {}
    if len(data) < 12:
        return out
    out["rcnm"] = data[0:2].decode("ascii", "replace")
    try:
        out["rcid"] = int(data[2:12])
    except ValueError:
        out["rcid"] = None
    parts = data[12:].split(_UT)

    def s(i):
        return parts[i].decode("utf-8", "replace") if len(parts) > i else ""

    def fl(b):
        try:
            return float(b)
        except ValueError:
            return None

    out["file"] = s(0)
    out["lfil"] = s(1)
    out["volm"] = s(2)
    p3 = parts[3] if len(parts) > 3 else b""
    out["impl"] = p3[:3].decode("ascii", "replace")
    out["slat"] = fl(p3[3:])
    out["wlon"] = fl(parts[4]) if len(parts) > 4 else None
    out["nlat"] = fl(parts[5]) if len(parts) > 5 else None
    out["elon"] = fl(parts[6]) if len(parts) > 6 else None
    out["crcs"] = s(7)
    out["comt"] = s(8)
    return out


def parse_s57_catalog(path: str) -> list[dict]:
    """Exchange-set catalogue (CATALOG.031): one CATD field per ISO 8211
    record — GDAL's S57 driver enumerates ENC cells from the same
    records. Returns [{rcid, file, impl, volm, ...}] with ``file`` the
    exchange-set-relative path; '\\\\' separators normalize to '/' (the
    spec allows either, GDAL normalizes the same way)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    out = []
    for leader_id, fields in iso8211_records(buf):
        if leader_id == "L":
            continue  # DDR
        for tag, data in fields:
            if tag == "CATD":
                d = _parse_catd(data)
                if d.get("file"):
                    d["file"] = d["file"].replace("\\", "/")
                    out.append(d)
    return out


def exchange_set_cells(cat_path: str) -> list[str]:
    """Base-cell (.000) paths referenced by an exchange-set CATALOG.031,
    resolved against the catalogue's own directory. Update cells (.001+)
    ride along via the readers' sibling-update machinery, the catalogue
    row itself and text/ancillary entries (IMPL ASC/TXT) are skipped,
    and missing referenced files are skipped like GDAL (warn-and-
    continue); an exchange set that resolves zero cells raises."""
    root = os.path.dirname(os.path.abspath(cat_path))
    cells = []
    for e in parse_s57_catalog(cat_path):
        f = e["file"]
        if os.path.basename(f).upper().startswith("CATALOG.0"):
            continue
        if not f.lower().endswith(".000"):
            continue
        fp = os.path.join(root, *f.split("/"))
        if os.path.exists(fp):
            cells.append(fp)
    if not cells:
        raise FileNotFoundError(
            f"{cat_path}: catalogue references no existing .000 cells")
    return sorted(cells)


def find_catalog(path: str) -> str | None:
    """CATALOG.031 under an exchange-set root: the directory itself or
    its ENC_ROOT child (the standard exchange-set layout)."""
    for d in (path, os.path.join(path, "ENC_ROOT")):
        for n in ("CATALOG.031", "catalog.031"):
            fp = os.path.join(d, n)
            if os.path.exists(fp):
                return fp
    return None


def write_s57_catalog(path: str, files, volm: str = "V01X01") -> None:
    """Build a CATALOG.031 for fixtures/exports: one CATD record per
    entry. ``files`` holds exchange-set-relative paths (or (path, impl)
    tuples, impl in BIN/ASC/TXT). The bbox/CRC subfields are written
    empty — optional per the spec, and ignored for enumeration."""
    recs = [_mk_record("L", _DDR_FIELDS, field_control_len="09")]
    rcid = 0
    for f in files:
        fp, impl = f if isinstance(f, tuple) else (f, "BIN")
        rcid += 1
        catd = (b"CD" + str(rcid).zfill(10).encode()
                + fp.encode() + _UT + _UT + volm.encode() + _UT
                + impl.encode("ascii")[:3].ljust(3) + _UT      # IMPL+SLAT
                + _UT + _UT + _UT                              # WLON NLAT ELON
                + _UT)                                         # CRCS, COMT=''
        recs.append(_mk_record(
            "D", [("0001", struct.pack("<H", rcid)), ("CATD", catd)]))
    with open(path, "wb") as fh:
        fh.write(b"".join(recs))


def update_files_for(path: str) -> list[str]:
    """Sibling update cells of a base .000, in numeric order."""
    stem = os.path.splitext(path)[0]
    out = []
    for fp in _glob.glob(stem + ".[0-9][0-9][0-9]"):
        ext = fp.rsplit(".", 1)[1]
        if _re.fullmatch(r"\d{3}", ext) and ext != "000":
            out.append((int(ext), fp))
    return [fp for _, fp in sorted(out)]


def parse_s57(path: str, apply_updates: bool = True):
    """-> list of (rcid, objl, prim, attrs_dict, natf_dict, geometry).
    ``apply_updates`` folds sibling .001+ cells into the base first."""
    with open(path, "rb") as fh:
        buf = fh.read()
    comf, somf, _dsid, records = _collect_records(buf)
    if apply_updates and path.endswith(".000"):
        for up in update_files_for(path):
            with open(up, "rb") as fh:
                ubuf = fh.read()
            _, _, _, urecs = _collect_records(ubuf)
            records = _apply_updates(records, urecs)

    nodes: dict = {}    # (rcnm, rcid) -> [x, y]
    nodes3d: dict = {}  # (rcnm, rcid) -> [[x, y, z], ...]
    edges: dict = {}    # (rcnm, rcid) -> dict(coords, begin, end)
    feats = []
    # two passes: ALL vector records bind before any feature assembles —
    # update-inserted nodes/edges append after the base's feature records
    # in merge order, and a feature may point at them (r15 VRPC fix)
    for r in sorted(records, key=lambda r: r["kind"] != "V"):
        fmap = r["fmap"]
        if r["kind"] == "V":
            rcnm, rcid = r["rcnm"], r["rcid"]
            coords = []
            for sg in fmap.get("SG2D", []):
                for i in range(0, len(sg) - 7, 8):
                    y, x = struct.unpack_from("<ii", sg, i)
                    coords.append([x / comf, y / comf])
            sounds = []
            for sg in fmap.get("SG3D", []):
                for i in range(0, len(sg) - 11, 12):
                    y, x, z = struct.unpack_from("<iii", sg, i)
                    sounds.append([x / comf, y / comf, z / somf])
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
                if sounds:
                    nodes3d[(rcnm, rcid)] = sounds
                if coords:
                    nodes[(rcnm, rcid)] = coords[0]
                elif sounds:
                    nodes[(rcnm, rcid)] = sounds[0][:2]
            elif rcnm == RCNM_VE:
                edges[(rcnm, rcid)] = rec
        else:
            f = fmap["FRID"][0]
            rcid = r["rcid"]
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
            natf = {}
            for a in fmap.get("NATF", []):
                natf.update(_parse_attf(a))
            g = _assemble(prim, ptrs, nodes, edges, nodes3d)
            if g is not None:
                feats.append((rcid, objl, prim, attrs, natf, g))
    return feats


def s57_meta(path: str) -> dict:
    """DSID metadata (dsnm/edtn/updn/...) + comf/somf + applied updates."""
    with open(path, "rb") as fh:
        buf = fh.read()
    comf, somf, dsid, records = _collect_records(buf)
    ups = update_files_for(path) if path.endswith(".000") else []
    return {"comf": comf, "somf": somf, "updates": [os.path.basename(u)
                                                    for u in ups], **dsid}


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


def _assemble(prim, ptrs, nodes, edges, nodes3d=None):
    if prim == PRIM_P:
        for nm, _, _ in ptrs:
            if nodes3d and nm in nodes3d:
                snd = nodes3d[nm]
                pts = [G.point(p[0], p[1], p[2]) for p in snd]
                return pts[0] if len(pts) == 1 else G.collect(pts)
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
        if len(exterior) == 1:
            return G.polygon(exterior[0:1] + holes)
        # multiple exterior rings: each interior ring attaches to the
        # shell that contains it -> MULTIPOLYGON
        from ..geo.algorithms import point_in_ring
        import numpy as np

        shells = [np.asarray(r, dtype=np.float64) for r in exterior]
        grouped = [[s] for s in shells]
        for h in holes:
            ha = np.asarray(h, dtype=np.float64)
            for k, s in enumerate(shells):
                if point_in_ring(float(ha[0][0]), float(ha[0][1]), s) == 2:
                    grouped[k].append(ha)
                    break
            else:
                grouped[0].append(ha)
        return G.collect([G.Geometry(G.POLYGON, rs) for rs in grouped])
    return None


def read_s57(spark: SparkSession, path: str,
             apply_updates: bool = True, layer: str | None = None) -> DataFrame:
    """ST_Read for .000 ENC cells: (rcid, objl, prim, attrs, natf, geom) —
    ``attrs``/``natf`` are the ATTF/NATF maps {attribute code: value}.
    Sibling update cells (.001+) apply first; per-file parsing runs
    distributed (one input partition per base cell).

    ``layer="DSID"`` (r15) returns GDAL's DSID pseudo-layer instead: one
    row per cell with the dataset-identification fields (EXPP/INTU/DSNM/
    EDTN/UPDN/UADT/ISDT), COMF/SOMF and the applied-update count.

    Exchange sets (r16): pointing at a CATALOG.031, or at a directory
    containing one (directly or under ENC_ROOT — the standard exchange
    layout), enumerates the base cells from the catalogue's CATD records
    exactly like GDAL's S57 driver, instead of globbing."""
    from pyspark.sql import types as T

    from ._distrib import distributed_file_read

    if os.path.isdir(path):
        cat = find_catalog(path)
        if cat is not None:
            files = exchange_set_cells(cat)
        else:
            files = sorted(_glob.glob(os.path.join(path, "*.000")))
    elif path.upper().endswith(".031"):
        files = exchange_set_cells(path)
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    if layer is not None:
        if str(layer).upper() != "DSID":
            raise ValueError(
                f"read_s57: unknown layer {layer!r} — the only pseudo-layer "
                "is 'DSID' (feature records are the default read)")
        rows = []
        for fp in files:
            m = s57_meta(fp)
            rows.append((
                os.path.basename(fp), m.get("expp"), m.get("intu"),
                m.get("dsnm"), m.get("edtn"), m.get("updn"),
                m.get("uadt"), m.get("isdt"),
                float(m["comf"]), float(m["somf"]),
                len(m.get("updates") or []),
            ))
        return spark.createDataFrame(
            rows,
            "file string, expp int, intu int, dsnm string, edtn string,"
            " updn string, uadt string, isdt string, comf double,"
            " somf double, updates int",
        )
    schema = T.StructType(
        [
            T.StructField("rcid", T.LongType()),
            T.StructField("objl", T.IntegerType()),
            T.StructField("prim", T.IntegerType()),
            T.StructField("attrs", T.MapType(T.IntegerType(), T.StringType())),
            T.StructField("natf", T.MapType(T.IntegerType(), T.StringType())),
            T.StructField("geom", T.BinaryType()),
        ]
    )

    return distributed_file_read(
        spark, files, schema,
        "duckdb_spatial_spark.sources.s57:_distrib_rows",
        {"apply_updates": bool(apply_updates)})


def _distrib_rows(fp, apply_updates=True):
    """Worker-side row generator for read_s57 (imported by name through
    sources/_distrib.py options — no closures in the plan)."""
    for rcid, objl, prim, attrs, natf, g in parse_s57(fp, apply_updates):
        yield (int(rcid), int(objl), int(prim),
               {int(k): str(v) for k, v in attrs.items()},
               {int(k): str(v) for k, v in natf.items()},
               WKB.to_wkb(g))


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------
_DDR_FIELDS = [
    ("0000", b"0100;&   S57 subset"),
    ("0001", b"0100;&ISO 8211 Record Identifier"),
    ("DSID", b"1600;&Data set identification field"),
    ("DSPM", b"1600;&Data set parameter field"),
    ("VRID", b"1600;&Vector record identifier field"),
    ("SG2D", b"2600;&2-D coordinate field"),
    ("SG3D", b"2600;&3-D coordinate (sounding array) field"),
    ("SGCC", b"1600;&Coordinate control field"),
    ("FSPC", b"1600;&Feature record to spatial record pointer control field"),
    ("VRPC", b"1600;&Vector record pointer control field"),
    ("VRPT", b"2600;&Vector record pointer field"),
    ("FRID", b"1600;&Feature record identifier field"),
    ("ATTF", b"2600;&Feature record attribute field"),
    ("NATF", b"2600;&Feature record national attribute field"),
    ("FSPT", b"2600;&Feature to spatial record pointer field"),
]


def _vrid(rcnm: int, rcid: int, ruin: int = 1, rver: int = 1) -> bytes:
    return bytes([rcnm]) + struct.pack("<IHB", rcid, rver, ruin)


def _sg2d(coords, comf: float) -> bytes:
    out = b""
    for x, y in coords:
        out += struct.pack("<ii", int(round(y * comf)), int(round(x * comf)))
    return out


def _sg3d(coords, comf: float, somf: float) -> bytes:
    out = b""
    for x, y, z in coords:
        out += struct.pack("<iii", int(round(y * comf)),
                           int(round(x * comf)), int(round(z * somf)))
    return out


def sgcc(instr: int, ix: int, count: int) -> bytes:
    """SGCC / FSPC control-field payload (CCUI/FSUI b11, index b14,
    count b14) for update cells built with write_s57_update."""
    return bytes([instr]) + struct.pack("<II", ix, count)


def _fspt(entries) -> bytes:
    out = b""
    for (rcnm, rcid), ornt, usag in entries:
        out += bytes([rcnm]) + struct.pack("<I", rcid) + bytes([ornt, usag, 2])
    return out


def _attf_blob(d, mapping) -> bytes:
    blob = b""
    for col, code in mapping.items():
        v = d.get(col)
        if v is None:
            continue
        blob += struct.pack("<H", int(code)) + str(v).encode("utf-8") + _UT
    return blob


def write_s57(df: DataFrame, path: str, geom_col: str = "geom",
              objl_col: str | None = None, comf: float = 10_000_000.0,
              somf: float = 10.0, attrs: dict | None = None,
              natf: dict | None = None, dsnm: str | None = None,
              max_rows: int = 1_000_000) -> None:
    """Minimal ENC writer: DDR + DSID/DSPM record, one vector record (VI
    node / VE edge) per geometry and the FRID feature referencing it via
    FSPT. Points/linestrings/polygons (holes: one closed VE per ring,
    interior rings at USAG 2; MULTIPOLYGON: every shell at USAG 1).
    POINT Z / MULTIPOINT Z write SG3D sounding arrays on a VI node.
    Single-document format, driver-streamed with a hard cap (write_kml
    policy).

    ``attrs={column: ATTL_code}`` writes each listed column's non-null
    values as ATTF (code, stringified value) pairs on the feature;
    ``natf=`` does the same into the NATF national-attribute field."""
    recs = [_mk_record("L", _DDR_FIELDS, field_control_len="09")]
    name = (dsnm or os.path.basename(path)).encode("utf-8")
    dsid = (bytes([10]) + struct.pack("<I", 1) + bytes([1, 1])
            + name + _UT + b"1" + _UT + b"0" + _UT)
    dspm = (
        bytes([20])
        + struct.pack("<I", 1)
        + bytes([2, 7, 1])
        + struct.pack("<I", 52000)
        + bytes([1, 1, 1, 1])
        + struct.pack("<II", int(comf), int(somf))
    )
    recs.append(_mk_record("D", [("0001", struct.pack("<H", 1)),
                                 ("DSID", dsid), ("DSPM", dspm)]))
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
        if g.has_z and g.tag in (G.POINT, G.MULTIPOINT):
            pts = ([list(g.data)] if g.tag == G.POINT
                   else [list(m.data) for m in g.data])
            rcid = next_rc[0]; next_rc[0] += 1
            recs.append(rec([
                ("VRID", _vrid(RCNM_VI, rcid)),
                ("SG3D", _sg3d([(p[0], p[1], p[2]) for p in pts],
                               comf, somf)),
            ]))
            prim = PRIM_P
            fspt_entries.append(((RCNM_VI, rcid), 1, 1))
        elif g.tag == G.POINT:
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
        elif g.tag in (G.POLYGON, G.MULTIPOLYGON):
            prim = PRIM_A
            polys = [g] if g.tag == G.POLYGON else list(g.data)
            for poly in polys:
                for k, ring in enumerate(poly.data):
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
        if natf:
            blob = _attf_blob(d, natf)
            if blob:
                fields.insert(1, ("NATF", blob))
        if attrs:
            blob = _attf_blob(d, attrs)
            if blob:
                fields.insert(1, ("ATTF", blob))
        recs.append(rec(fields))
    with open(path, "wb") as fh:
        fh.write(b"".join(recs))


def write_s57_update(path: str, ops, comf: float = 10_000_000.0,
                     somf: float = 10.0) -> None:
    """Build an update cell (.001+). ``ops`` is a list of dicts:

      {"kind": "F"|"V", "rcnm": int, "rcid": int, "ruin": 1|2|3,
       "fields": [(tag, payload_bytes), ...]}     (fields for insert/modify)

    The VRID/FRID identifier is synthesized from kind/rcnm/rcid/ruin;
    extra fields (SG2D blobs via ``sg2d()``, ATTF via ``attf()``) pass
    through verbatim. Mirrors the base writer's record shape so the
    reader's record-level update application exercises the real path."""
    recs = [_mk_record("L", _DDR_FIELDS, field_control_len="09")]
    recno = [1]
    for op in ops:
        recno[0] += 1
        if op["kind"] == "V":
            ident = ("VRID", _vrid(op["rcnm"], op["rcid"], ruin=op["ruin"]))
        else:
            frid = bytes([RCNM_FE]) + struct.pack("<I", op["rcid"]) + bytes(
                [op.get("prim", PRIM_P), 1]) + struct.pack(
                "<HHB", op.get("objl", 1), 2, op["ruin"])
            ident = ("FRID", frid)
        fields = [("0001", struct.pack("<H", recno[0])), ident]
        fields += [tuple(f) for f in op.get("fields", [])]
        recs.append(_mk_record("D", fields))
    with open(path, "wb") as fh:
        fh.write(b"".join(recs))
