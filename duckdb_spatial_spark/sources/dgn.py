"""MicroStation DGN v7 source (the reference reads DGN through GDAL's
DGN driver — built on the public-domain dgnlib; listed in
``gdal/functions/st_drivers.cpp``). Independent implementation of the
PUBLIC Intergraph Standard File Format (ISFF) element structure for the
2D vector subset:

  element = 4-byte header + 2*words_to_follow bytes
    byte 0      level (bits 0-5)
    byte 1      type (bits 0-6) | complex flag (bit 7)
    bytes 2-3   words-to-follow (uint16 LE)
  graphic elements continue:
    bytes 4-27  range: 6 x uint32 biased by 2^31 (xlo ylo zlo xhi yhi zhi)
    bytes 28-29 graphic group   bytes 30-31 attribute index
    bytes 32-33 properties      bytes 34-35 symbology (color|weight|style)
  payloads (2D):
    type 3  LINE           x0 y0 x1 y1
    type 4  LINE STRING    numverts, then numverts x (x y)
    type 6  SHAPE          like 4, closed ring -> POLYGON
    type 12 COMPLEX CHAIN  header: totlength u16 @36, numelems u16 @38;
    type 14 COMPLEX SHAPE  followed by numelems members (complex bit set)
                           -> concatenated LINESTRING / closed POLYGON
    type 15 ELLIPSE (2D)   axes dbl @36/@44, rotation i32 @52, origin
                           dbl @56/@64 -> stroked POLYGON ring
    type 16 ARC (2D)       start i32 @36, sweep sign-magnitude i32 @40,
                           axes dbl @44/@52, rotation i32 @60, origin
                           dbl @64/@72 -> stroked LINESTRING (5-degree
                           steps, the dgnlib DGNStrokeArc behavior);
                           doubles are IEEE in reverse word order
    type 17 TEXT (2D)      font @36, just @37, lengthmult i32 @38,
                           heightmult i32 @42, rotation i32 @46
                           (deg*360000), origin x @50 y @54, numchars @58,
                           chars from @60 -> POINT + ``text`` column
  int32 coordinates use the VAX-heritage "word-swapped" order: the
  HIGH 16-bit word first, each word little-endian. The file opens with
  a TCB element (type 9) and ends with an 0xFFFF end-of-file word.

Coordinates are UORs (integer units of resolution); ``uor_scale``
divides on read / multiplies on write. On read the default comes from
the file's own TCB (subunits-per-master i32 @1112 x uor-per-subunit
i32 @1116, the dgnlib TCB layout), falling back to 1000.0 when the TCB
carries zeros — pass ``uor_scale=`` to override. CELL headers (type 2)
collect their line/linestring/shape members into one multi-geometry row
with the RAD50-decoded cell name in ``text``.

3D design files (r15): the TCB dimension flag (byte 1214 bit 0x40, the
dgnlib DGNLoadTCB convention) switches linear payloads to (x y z) int32
triplets — LINE / LINE STRING / SHAPE / CURVE and complex/cell members
read as Z-carrying geometries (our writer stamps the same flag via
``dimension=3``). 3D ELLIPSE / ARC / TEXT (r16) use the quaternion
layouts: rotation stored as 4 x i32 (w x y z scaled by 2^31, the
dgnlib DGNQuaternionToMatrix scaling) where the 2D layout has a
rotation angle — ellipse: axes dbl @36/@44, quat @52, origin dbl
@68/@76/@84; arc: start/sweep i32 @36/@40, axes dbl @44/@52, quat @60,
origin dbl @76/@84/@92; text: quat @46, origin i32 @62/@66/@70,
numchars @74, chars @76. The quaternion rotates the element-local
ellipse plane (a cos t, b sin t, 0) onto the design axes. CURVE elements (type 11) are the ISFF parametric
spline: the first and last vertices are slope-control points that the
curve does not pass through; we stroke a C1 cubic through the interior
vertices with Catmull-Rom tangents (the control points supply the end
slopes — their ISFF role), 8 samples per span. B-SPLINE CURVE headers
(type 27) consume their complex-bit component elements — POLE (21,
line-string-shaped payload), KNOT (26) and WEIGHT (28) are accepted and
the uniform stroke ignores knots/weights — and stroke a uniform
B-spline over the poles via De Boor (order u8 @38, clamped to the pole
count; properties u8 @39 bit 0 = closed/periodic; header words u16 @36
count the member words, mirroring the complex-chain convention). The
pole/knot/weight component structure is dgnlib's; the two header bytes
are pinned by this module's own writer-reader pair (the public ISFF
copies do not reproduce the 27-header byte layout) and documented here
so the assumption is visible."""

from __future__ import annotations

import glob as _glob
import os
import struct

from pyspark.sql import DataFrame, SparkSession

from ..geo import geom as G
from ..geo import wkb as WKB

_BIAS = 1 << 31

DGNT_CELL_HEADER = 2
DGNT_LINE = 3
DGNT_LINE_STRING = 4
DGNT_SHAPE = 6
DGNT_TCB = 9
DGNT_CURVE = 11
DGNT_COMPLEX_CHAIN = 12
DGNT_COMPLEX_SHAPE = 14
DGNT_ELLIPSE = 15
DGNT_ARC = 16
DGNT_TEXT = 17
DGNT_BSPLINE_POLE = 21
DGNT_BSPLINE_KNOT = 26
DGNT_BSPLINE_CURVE_HEADER = 27
DGNT_BSPLINE_WEIGHT = 28

# stroking density for arc/ellipse -> vertex sequences (GDAL's DGN layer
# strokes them the same way via dgnlib DGNStrokeArc/DGNStrokeCurve)
_ARC_STEP_DEG = 5.0


def _rd_i32(buf: bytes, off: int) -> int:
    """DGN int32: high 16-bit word first, words little-endian."""
    hi, lo = struct.unpack_from("<HH", buf, off)
    v = (hi << 16) | lo
    return v - (1 << 32) if v >= (1 << 31) else v


def _wr_i32(v: int) -> bytes:
    v &= 0xFFFFFFFF
    return struct.pack("<HH", (v >> 16) & 0xFFFF, v & 0xFFFF)


def _rd_dbl(buf: bytes, off: int) -> float:
    """DGN 8-byte IEEE double in reverse word order (the VAX-heritage
    convention dgnlib's DGN2IEEEDouble undoes): four 16-bit words stored
    high-to-low, each word little-endian."""
    w = struct.unpack_from("<4H", buf, off)
    return struct.unpack("<d", struct.pack("<4H", w[3], w[2], w[1], w[0]))[0]


def _wr_dbl(v: float) -> bytes:
    w = struct.unpack("<4H", struct.pack("<d", float(v)))
    return struct.pack("<4H", w[3], w[2], w[1], w[0])


def _iter_elements(buf: bytes):
    """-> (level, type, complex, payload_bytes_incl_header)."""
    off = 0
    n = len(buf)
    while off + 4 <= n:
        if buf[off] == 0xFF and buf[off + 1] == 0xFF:
            return  # end-of-file word
        level = buf[off] & 0x3F
        etype = buf[off + 1] & 0x7F
        cmplx = bool(buf[off + 1] & 0x80)
        (wtf,) = struct.unpack_from("<H", buf, off + 2)
        size = 4 + 2 * wtf
        yield level, etype, cmplx, buf[off : off + size]
        off += size


def tcb_uor_scale(path_or_buf) -> float | None:
    """UORs per master unit from the design file's TCB element (type 9):
    subunits-per-master (i32 @1112) x uor-per-subunit (i32 @1116), the
    dgnlib TCB word layout. None when the TCB is absent/zeroed."""
    if isinstance(path_or_buf, (bytes, bytearray)):
        buf = bytes(path_or_buf)
    else:
        with open(path_or_buf, "rb") as fh:
            buf = fh.read(4096)
    for _, etype, _, el in _iter_elements(buf):
        if etype != DGNT_TCB:
            continue
        if len(el) < 1120:
            return None
        spm = _rd_i32(el, 1112)
        ups = _rd_i32(el, 1116)
        if spm > 0 and ups > 0:
            return float(spm * ups)
        return None
    return None


def tcb_dimension(buf: bytes) -> int:
    """2 or 3 from the TCB dimension flag (byte 1214 bit 0x40, the
    dgnlib DGNLoadTCB convention; write_dgn stamps the same bit)."""
    for _, etype, _, el in _iter_elements(buf[:4096]):
        if etype == DGNT_TCB:
            return 3 if len(el) > 1214 and (el[1214] & 0x40) else 2
    return 2


def _symb(el: bytes):
    (symb,) = struct.unpack_from("<H", el, 34)
    return symb & 0xFF, (symb >> 8) & 0x1F, (symb >> 13) & 0x7


def _vertices(etype: int, body: bytes, uor: float, dim: int = 2):
    w = 4 * dim  # bytes per vertex
    if etype == DGNT_LINE:
        if len(body) < 2 * w:
            return []
        return [
            [_rd_i32(body, 4 * k) / uor for k in range(dim)],
            [_rd_i32(body, w + 4 * k) / uor for k in range(dim)],
        ]
    (nv,) = struct.unpack_from("<H", body, 0)
    return [
        [_rd_i32(body, 2 + w * i + 4 * k) / uor for k in range(dim)]
        for i in range(nv)
        if 2 + w * (i + 1) <= len(body)
    ]


def _stroke_curve(pts, samples_per_span: int = 8):
    """ISFF CURVE (type 11) stroke: a C1 cubic through the interior
    vertices; the first and last vertices are slope-control points the
    curve does not pass through (their ISFF role) — Catmull-Rom tangents
    use them at the ends. Works for 2D and 3D vertex lists."""
    if len(pts) < 4:
        return [list(p) for p in pts[1:-1]] if len(pts) > 2 else []
    import numpy as np

    v = np.asarray(pts, dtype=np.float64)
    out = [list(v[1])]
    t = np.linspace(0.0, 1.0, samples_per_span + 1)[1:]
    for i in range(1, len(v) - 2):
        p0, p1, p2, p3 = v[i - 1], v[i], v[i + 1], v[i + 2]
        m1 = (p2 - p0) / 2.0
        m2 = (p3 - p1) / 2.0
        # Hermite basis over [0,1]
        h00 = 2 * t**3 - 3 * t**2 + 1
        h10 = t**3 - 2 * t**2 + t
        h01 = -2 * t**3 + 3 * t**2
        h11 = t**3 - t**2
        seg = (h00[:, None] * p1 + h10[:, None] * m1
               + h01[:, None] * p2 + h11[:, None] * m2)
        out.extend(seg.tolist())
    return out


def _stroke_bspline(poles, order: int, closed: bool,
                    samples_per_span: int = 10):
    """Uniform B-spline stroke over control poles via De Boor (open
    curves use a clamped knot vector so the stroke starts/ends on the
    first/last pole; closed curves wrap the poles periodically)."""
    import numpy as np

    P = np.asarray(poles, dtype=np.float64)
    n = len(P)
    if n == 0:
        return []
    k = max(2, min(int(order), n if not closed else n + 1))
    if closed:
        P = np.vstack([P, P[: k - 1]])
        n = len(P)
        knots = np.arange(n + k, dtype=np.float64)
        t0, t1 = knots[k - 1], knots[n]
    else:
        if n < k:
            k = n
        knots = np.concatenate([
            np.zeros(k), np.arange(1, n - k + 1, dtype=np.float64),
            np.full(k, float(n - k + 1)),
        ])
        t0, t1 = knots[k - 1], knots[n]
    spans = max(1, n - k + 1)
    ts = np.linspace(t0, t1, spans * samples_per_span + 1)
    out = []
    for t in ts:
        # De Boor at parameter t
        j = int(np.searchsorted(knots, t, side="right") - 1)
        j = min(max(j, k - 1), n - 1)
        d = [P[j - k + 1 + r].copy() for r in range(k)]
        for r in range(1, k):
            for i in range(k - 1, r - 1, -1):
                il = j - k + 1 + i
                den = knots[il + k - r] - knots[il]
                alpha = 0.0 if den == 0.0 else (t - knots[il]) / den
                d[i] = (1.0 - alpha) * d[i - 1] + alpha * d[i]
        out.append(d[k - 1].tolist())
    return out


def _stroke_arc(cx, cy, a, b, rot_deg, start_deg, sweep_deg):
    """Parametric ellipse-arc vertices: origin + R(rot) @ (a cos t, b sin t)."""
    import math

    n = max(2, int(abs(sweep_deg) / _ARC_STEP_DEG) + 1)
    rot = math.radians(rot_deg)
    cr, sr = math.cos(rot), math.sin(rot)
    pts = []
    for i in range(n + 1):
        t = math.radians(start_deg + sweep_deg * i / n)
        ex, ey = a * math.cos(t), b * math.sin(t)
        pts.append([cx + ex * cr - ey * sr, cy + ex * sr + ey * cr])
    return pts


def _quat_rot(el: bytes, off: int):
    """3D element rotation: unit quaternion stored as 4 x i32 (w x y z,
    scaled by 2^31 — the dgnlib DGNQuaternionToMatrix scaling) -> 3x3
    rotation matrix mapping the element-local plane to design axes
    (standard unit-quaternion matrix). Zero quaternion -> identity."""
    import math

    q = [_rd_i32(el, off + 4 * i) / float(1 << 31) for i in range(4)]
    n = math.sqrt(sum(c * c for c in q))
    if n == 0.0:
        w, x, y, z = 1.0, 0.0, 0.0, 0.0
    else:
        w, x, y, z = (c / n for c in q)
    return [
        [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
    ]


def _stroke_arc3(cx, cy, cz, a, b, R, start_deg, sweep_deg):
    """3D ellipse-arc vertices: origin + R @ (a cos t, b sin t, 0)."""
    import math

    n = max(2, int(abs(sweep_deg) / _ARC_STEP_DEG) + 1)
    pts = []
    for i in range(n + 1):
        t = math.radians(start_deg + sweep_deg * i / n)
        ex, ey = a * math.cos(t), b * math.sin(t)
        pts.append([cx + R[0][0] * ex + R[0][1] * ey,
                    cy + R[1][0] * ex + R[1][1] * ey,
                    cz + R[2][0] * ex + R[2][1] * ey])
    return pts


_RAD50 = " ABCDEFGHIJKLMNOPQRSTUVWXYZ$.%0123456789"


def _rad50_decode(word: int) -> str:
    return (_RAD50[(word // 1600) % 40] + _RAD50[(word // 40) % 40]
            + _RAD50[word % 40])


def _rad50_encode(s: str) -> int:
    s = (s.upper() + "   ")[:3]
    idx = [_RAD50.find(c) if _RAD50.find(c) >= 0 else 0 for c in s]
    return idx[0] * 1600 + idx[1] * 40 + idx[2]


def _member_geom(etype, el, uor, dim: int = 2):
    """Geometry of a complex/cell member element (types 3/4/6)."""
    pts = _vertices(etype, el[36:], uor, dim) if len(el) >= 36 else []
    if etype == DGNT_SHAPE:
        if not pts:
            return None
        if pts[0] != pts[-1]:
            pts.append(list(pts[0]))
        return G.polygon([pts])
    return G.linestring(pts) if len(pts) >= 2 else None


def parse_dgn(path: str, uor_scale: float | None = None):
    """-> list of (level, color, weight, style, text, geometry); skips
    non-vector elements. ``uor_scale=None`` reads it from the TCB
    (fallback 1000.0). CELL headers (type 2) collect their member
    elements into one multi-geometry row with the RAD50-decoded cell
    name in the ``text`` column."""
    with open(path, "rb") as fh:
        buf = fh.read()
    uor = uor_scale if uor_scale is not None else (tcb_uor_scale(buf) or 1000.0)
    dim = tcb_dimension(buf)
    out = []
    # pending complex assembly: (etype, level, color, weight, style,
    #                            remaining-members, coords)
    pending = None
    # pending cell: dict(level, color, weight, style, words, name, geoms)
    cell = None
    # pending B-spline: dict(level, color, weight, style, order, closed,
    #                        words, poles)
    bspl = None

    def close_cell():
        nonlocal cell
        if cell is None:
            return
        c, cell = cell, None
        if not c["geoms"]:
            return
        g = c["geoms"][0] if len(c["geoms"]) == 1 else G.collect(c["geoms"])
        out.append((c["level"], c["color"], c["weight"], c["style"],
                    c["name"] or None, g))

    def close_pending():
        nonlocal pending
        if pending is None:
            return
        etype, level, color, weight, style, _, pts = pending
        pending = None
        if len(pts) < 2:
            return
        if etype == DGNT_COMPLEX_SHAPE:
            if pts[0] != pts[-1]:
                pts.append(list(pts[0]))
            g = G.polygon([pts])
        else:
            g = G.linestring(pts)
        out.append((level, color, weight, style, None, g))

    def close_bspl():
        nonlocal bspl
        if bspl is None:
            return
        b, bspl = bspl, None
        pts = _stroke_bspline(b["poles"], b["order"], b["closed"])
        if len(pts) >= 2:
            out.append((b["level"], b["color"], b["weight"], b["style"],
                        None, G.linestring(pts)))

    for level, etype, cmplx, el in _iter_elements(buf):
        if bspl is not None and cmplx:
            # B-spline components: POLE carries the control points
            # (line-string-shaped payload); KNOT/WEIGHT are consumed and
            # ignored by the uniform stroke
            if etype == DGNT_BSPLINE_POLE and len(el) >= 36:
                bspl["poles"].extend(
                    _vertices(DGNT_LINE_STRING, el[36:], uor, dim))
            bspl["words"] -= len(el) // 2
            if bspl["words"] <= 0:
                close_bspl()
            continue
        if bspl is not None:
            close_bspl()
        if pending is not None and cmplx and etype in (DGNT_LINE,
                                                       DGNT_LINE_STRING):
            pts = _vertices(etype, el[36:], uor, dim) if len(el) >= 36 else []
            acc = pending[6]
            if acc and pts and acc[-1] == pts[0]:
                pts = pts[1:]
            acc.extend(pts)
            pending = pending[:5] + (pending[5] - 1,) + (acc,)
            if pending[5] <= 0:
                close_pending()
            continue
        if pending is not None:
            close_pending()
        if cell is not None and cmplx:
            # cell members: words counted against the header's totlength
            if etype in (DGNT_LINE, DGNT_LINE_STRING, DGNT_SHAPE):
                g = _member_geom(etype, el, uor, dim)
                if g is not None:
                    cell["geoms"].append(g)
            cell["words"] -= len(el) // 2
            if cell["words"] <= 0:
                close_cell()
            continue
        if cell is not None:
            close_cell()
        if etype == DGNT_CELL_HEADER:
            # ISFF 2D cell header: totlength u16 @36 (words of members),
            # RAD50 cell name 2 words @38, class @42, levels @44,
            # range @52, transform @68, origin @84
            if len(el) < 42:
                continue
            color, weight, style = _symb(el)
            (totlength,) = struct.unpack_from("<H", el, 36)
            w1, w2 = struct.unpack_from("<HH", el, 38)
            name = (_rad50_decode(w1) + _rad50_decode(w2)).strip()
            cell = {"level": level, "color": color, "weight": weight,
                    "style": style, "words": totlength, "name": name,
                    "geoms": []}
            continue
        if etype in (DGNT_COMPLEX_CHAIN, DGNT_COMPLEX_SHAPE):
            if len(el) < 40:
                continue
            color, weight, style = _symb(el)
            (numelems,) = struct.unpack_from("<H", el, 38)
            pending = (etype, level, color, weight, style, numelems, [])
            continue
        if etype == DGNT_BSPLINE_CURVE_HEADER:
            # words u16 @36 (member words, the complex-header convention),
            # order u8 @38, properties u8 @39 bit 0 = closed — see module
            # docstring for the provenance of these two bytes
            if len(el) < 40:
                continue
            color, weight, style = _symb(el)
            (words,) = struct.unpack_from("<H", el, 36)
            bspl = {"level": level, "color": color, "weight": weight,
                    "style": style, "order": el[38] or 4,
                    "closed": bool(el[39] & 1), "words": words, "poles": []}
            continue
        if cmplx:
            continue  # stray complex member without a header
        if etype == DGNT_CURVE:
            if len(el) < 38:
                continue
            color, weight, style = _symb(el)
            pts = _stroke_curve(_vertices(DGNT_LINE_STRING, el[36:], uor, dim))
            if len(pts) >= 2:
                out.append((level, color, weight, style, None,
                            G.linestring(pts)))
            continue
        if etype == DGNT_ELLIPSE:
            # ISFF ellipse: primary/secondary axis doubles @36/@44, then
            # 2D: rotation i32 @52 (deg*360000), origin doubles @56/@64
            # 3D: quaternion 4 x i32 @52, origin doubles @68/@76/@84
            color, weight, style = _symb(el)
            if dim == 3:
                if len(el) < 92:
                    continue
                a = _rd_dbl(el, 36) / uor
                b_ax = _rd_dbl(el, 44) / uor
                R = _quat_rot(el, 52)
                cx = _rd_dbl(el, 68) / uor
                cy = _rd_dbl(el, 76) / uor
                cz = _rd_dbl(el, 84) / uor
                ring = _stroke_arc3(cx, cy, cz, a, b_ax, R, 0.0, 360.0)
            else:
                if len(el) < 72:
                    continue
                a = _rd_dbl(el, 36) / uor
                b_ax = _rd_dbl(el, 44) / uor
                rot = _rd_i32(el, 52) / 360000.0
                cx = _rd_dbl(el, 56) / uor
                cy = _rd_dbl(el, 64) / uor
                ring = _stroke_arc(cx, cy, a, b_ax, rot, 0.0, 360.0)
            ring[-1] = list(ring[0])
            out.append((level, color, weight, style, None, G.polygon([ring])))
            continue
        if etype == DGNT_ARC:
            # ISFF arc: start i32 @36, sweep sign-magnitude i32 @40
            # (deg*360000), axes doubles @44/@52, then
            # 2D: rotation i32 @60, origin doubles @64/@72
            # 3D: quaternion 4 x i32 @60, origin doubles @76/@84/@92
            color, weight, style = _symb(el)
            start = _rd_i32(el, 36) / 360000.0 if len(el) >= 44 else 0.0
            raw = (_rd_i32(el, 40) & 0xFFFFFFFF) if len(el) >= 44 else 0
            sweep = -(raw & 0x7FFFFFFF) if raw & 0x80000000 else raw
            sweep /= 360000.0
            if dim == 3:
                if len(el) < 100:
                    continue
                a = _rd_dbl(el, 44) / uor
                b_ax = _rd_dbl(el, 52) / uor
                R = _quat_rot(el, 60)
                cx = _rd_dbl(el, 76) / uor
                cy = _rd_dbl(el, 84) / uor
                cz = _rd_dbl(el, 92) / uor
                pts = _stroke_arc3(cx, cy, cz, a, b_ax, R, start, sweep)
            else:
                if len(el) < 80:
                    continue
                a = _rd_dbl(el, 44) / uor
                b_ax = _rd_dbl(el, 52) / uor
                rot = _rd_i32(el, 60) / 360000.0
                cx = _rd_dbl(el, 64) / uor
                cy = _rd_dbl(el, 72) / uor
                pts = _stroke_arc(cx, cy, a, b_ax, rot, start, sweep)
            out.append((level, color, weight, style, None, G.linestring(pts)))
            continue
        if etype == DGNT_TEXT:
            # ISFF text: font @36, just @37, length/height mult i32
            # @38/@42, then 2D: rotation i32 @46, origin i32 @50/@54,
            # numchars @58, chars @60; 3D: quaternion 4 x i32 @46,
            # origin i32 @62/@66/@70, numchars @74, chars @76
            color, weight, style = _symb(el)
            if dim == 3:
                if len(el) < 76:
                    continue
                x = _rd_i32(el, 62) / uor
                y = _rd_i32(el, 66) / uor
                z = _rd_i32(el, 70) / uor
                nch = el[74]
                txt = el[76 : 76 + nch].decode("latin-1", "replace")
                out.append((level, color, weight, style, txt,
                            G.point(x, y, z)))
            else:
                if len(el) < 60:
                    continue
                x = _rd_i32(el, 50) / uor
                y = _rd_i32(el, 54) / uor
                nch = el[58]
                txt = el[60 : 60 + nch].decode("latin-1", "replace")
                out.append((level, color, weight, style, txt, G.point(x, y)))
            continue
        if etype not in (DGNT_LINE, DGNT_LINE_STRING, DGNT_SHAPE):
            continue
        if len(el) < 36:
            continue
        color, weight, style = _symb(el)
        body = el[36:]
        pts = _vertices(etype, body, uor, dim)
        if etype == DGNT_SHAPE:
            if not pts:
                continue
            if pts[0] != pts[-1]:
                pts.append(list(pts[0]))
            g = G.polygon([pts])
        elif len(pts) >= 2:
            g = G.linestring(pts)
        else:
            continue
        out.append((level, color, weight, style, None, g))
    close_pending()
    close_cell()
    close_bspl()
    return out


def read_dgn(spark: SparkSession, path: str,
             uor_scale: float | None = None) -> DataFrame:
    """ST_Read for .dgn: one row per vector element with level/symbology
    attributes, a ``text`` column (non-null for TEXT elements) and WKB
    geom (GDAL's DGN layer exposes the same columns). Per-file parsing
    runs distributed (one input partition per file); ``uor_scale``
    defaults to each file's own TCB value."""
    from pyspark.sql import types as T

    from ._distrib import distributed_file_read

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.dgn")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    schema = T.StructType(
        [
            T.StructField("level", T.IntegerType()),
            T.StructField("color", T.IntegerType()),
            T.StructField("weight", T.IntegerType()),
            T.StructField("style", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("geom", T.BinaryType()),
        ]
    )

    return distributed_file_read(
        spark, files, schema,
        "duckdb_spatial_spark.sources.dgn:_distrib_rows",
        {"uor_scale": uor_scale})


def _distrib_rows(fp, uor_scale=None):
    """Worker-side row generator for read_dgn (imported by name through
    sources/_distrib.py options — no closures in the plan)."""
    for level, color, weight, style, txt, g in parse_dgn(fp, uor_scale):
        yield (level, color, weight, style, txt, WKB.to_wkb(g))


def _element(etype: int, level: int, symb: int, rng, body: bytes,
             cmplx: bool = False) -> bytes:
    wtf = (24 + 8 + len(body)) // 2  # range + fixed words + payload
    type_byte = (etype & 0x7F) | (0x80 if cmplx else 0)
    head = bytes([level & 0x3F, type_byte]) + struct.pack("<H", wtf)
    rbytes = b"".join(struct.pack("<HH", ((v + _BIAS) >> 16) & 0xFFFF,
                                  (v + _BIAS) & 0xFFFF) for v in rng)
    fixed = struct.pack("<HHHH", 0, 0, 0, symb)
    return head + rbytes + fixed + body


def _wr_quat(quat) -> bytes:
    """Encode a unit quaternion (w x y z floats) as the 4 x i32 layout
    (scaled by 2^31-1 to stay in int32 range; the reader re-normalizes)."""
    mx = (1 << 31) - 1
    return b"".join(_wr_i32(max(-mx, min(mx, int(round(c * mx)))))
                    for c in quat)


def ellipse_element(cx, cy, a, b, rot_deg=0.0, level=0,
                    uor_scale: float = 1000.0, cz=None, quat=None) -> bytes:
    """Raw ISFF ELLIPSE element (type 15) — for producing fixtures
    and for callers that need true curve elements (write_dgn strokes
    nothing; parse_dgn strokes these to rings). ``cz`` non-None writes
    the 3D layout (quaternion rotation, default identity; the file must
    also stamp the TCB flag via write_dgn_elements ``dimension=3``)."""
    if cz is not None:
        body = (_wr_dbl(a * uor_scale) + _wr_dbl(b * uor_scale)
                + _wr_quat(quat or (1.0, 0.0, 0.0, 0.0))
                + _wr_dbl(cx * uor_scale) + _wr_dbl(cy * uor_scale)
                + _wr_dbl(cz * uor_scale))
    else:
        body = (_wr_dbl(a * uor_scale) + _wr_dbl(b * uor_scale)
                + _wr_i32(int(round(rot_deg * 360000)))
                + _wr_dbl(cx * uor_scale) + _wr_dbl(cy * uor_scale))
    r = max(a, b) * uor_scale
    z = int((cz or 0.0) * uor_scale)
    rng = (int(cx * uor_scale - r), int(cy * uor_scale - r), z,
           int(cx * uor_scale + r), int(cy * uor_scale + r), z)
    return _element(DGNT_ELLIPSE, level, 0, rng, body)


def arc_element(cx, cy, a, b, start_deg, sweep_deg, rot_deg=0.0, level=0,
                uor_scale: float = 1000.0, cz=None, quat=None) -> bytes:
    """Raw ISFF ARC element (type 16); sweep uses the sign-magnitude
    convention (high bit = negative sweep). ``cz`` non-None writes the
    3D layout (quaternion rotation, default identity)."""
    raw = (0x80000000 | int(round(-sweep_deg * 360000))
           if sweep_deg < 0 else int(round(sweep_deg * 360000)))
    body = (_wr_i32(int(round(start_deg * 360000))) + _wr_i32(raw)
            + _wr_dbl(a * uor_scale) + _wr_dbl(b * uor_scale))
    if cz is not None:
        body += (_wr_quat(quat or (1.0, 0.0, 0.0, 0.0))
                 + _wr_dbl(cx * uor_scale) + _wr_dbl(cy * uor_scale)
                 + _wr_dbl(cz * uor_scale))
    else:
        body += (_wr_i32(int(round(rot_deg * 360000)))
                 + _wr_dbl(cx * uor_scale) + _wr_dbl(cy * uor_scale))
    r = max(a, b) * uor_scale
    z = int((cz or 0.0) * uor_scale)
    rng = (int(cx * uor_scale - r), int(cy * uor_scale - r), z,
           int(cx * uor_scale + r), int(cy * uor_scale + r), z)
    return _element(DGNT_ARC, level, 0, rng, body)


def write_dgn_elements(path: str, elements, uor_scale: float = 1000.0,
                       dimension: int = 2) -> None:
    """Write raw ISFF elements (built with curve_element /
    bspline_elements / arc_element / ellipse_element / cell_element)
    into a minimal design file: TCB (uor_scale + dimension flag) +
    elements + EOF word — the fixture path for element types write_dgn
    does not synthesize from geometries."""
    tcb = bytearray(bytes([0, DGNT_TCB]) + struct.pack("<H", 766)
                    + b"\x00" * 1532)
    tcb[1112:1116] = _wr_i32(1)
    tcb[1116:1120] = _wr_i32(int(round(uor_scale)))
    if dimension == 3:
        tcb[1214] |= 0x40  # dgnlib DGNLoadTCB dimension flag
    with open(path, "wb") as fh:
        fh.write(bytes(tcb) + b"".join(elements) + b"\xff\xff")


def curve_element(pts, level=0, uor_scale: float = 1000.0) -> bytes:
    """Raw ISFF CURVE element (type 11): line-string-shaped payload whose
    first and last vertices are slope-control points (parse_dgn strokes
    a C1 cubic through the interior vertices). 2D (x,y) or 3D (x,y,z)
    vertex tuples — 3D files must also stamp the TCB flag (write_dgn
    ``dimension=3``)."""
    ipts = [tuple(int(round(c * uor_scale)) for c in p) for p in pts]
    body = struct.pack("<H", len(ipts)) + b"".join(
        _wr_i32(v) for p in ipts for v in p)
    return _element(DGNT_CURVE, level, 0, _rng(ipts), body)


def bspline_elements(poles, order: int = 4, closed: bool = False,
                     level: int = 0, uor_scale: float = 1000.0) -> bytes:
    """Raw B-SPLINE CURVE header (type 27) + one POLE component (type 21,
    complex bit) carrying the control points; parse_dgn strokes a uniform
    B-spline over them (see module docstring for the header-byte
    provenance)."""
    ipts = [tuple(int(round(c * uor_scale)) for c in p) for p in poles]
    pole_body = struct.pack("<H", len(ipts)) + b"".join(
        _wr_i32(v) for p in ipts for v in p)
    pole = _element(DGNT_BSPLINE_POLE, level, 0, _rng(ipts), pole_body,
                    cmplx=True)
    hdr_body = (struct.pack("<H", len(pole) // 2)
                + bytes([order & 0xFF, 1 if closed else 0]))
    return _element(DGNT_BSPLINE_CURVE_HEADER, level, 0, _rng(ipts),
                    hdr_body) + pole


def cell_element(name: str, members: list[bytes], level: int = 0) -> bytes:
    """Raw ISFF CELL HEADER element (type 2, 2D) followed by its member
    elements (pass elements built with the complex bit set, e.g. via
    ``_element(..., cmplx=True)``); ``totlength`` counts the members'
    words. The RAD50-packed name occupies two words."""
    mem = b"".join(members)
    w1 = _rad50_encode(name[:3])
    w2 = _rad50_encode(name[3:6])
    body = (struct.pack("<H", len(mem) // 2) + struct.pack("<HH", w1, w2)
            + b"\x00" * 50)  # class/levels/range/transform/origin zeroed
    return _element(DGNT_CELL_HEADER, level, 0, (0, 0, 0, 0, 0, 0), body) + mem


def _linework(pts):
    """(etype, payload) for a 2D line/linestring vertex list."""
    if len(pts) == 2:
        return DGNT_LINE, b"".join(_wr_i32(v) for p in pts for v in p)
    return DGNT_LINE_STRING, struct.pack("<H", len(pts)) + b"".join(
        _wr_i32(v) for p in pts for v in p)


def _rng(pts):
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (min(xs), min(ys), 0, max(xs), max(ys), 0)


def write_dgn(df: DataFrame, path: str, geom_col: str = "geom",
              uor_scale: float = 1000.0, level_col: str | None = None,
              text_col: str | None = None, complex_shapes: bool = False,
              dimension: int = 2, max_rows: int = 1_000_000) -> None:
    """Minimal DGN v7 writer (2D lines/linestrings/polygon shells, TEXT
    elements, complex chains for MULTILINESTRING): TCB carrying
    ``uor_scale`` (subunits-per-master=1) + one element per row + EOF
    word. Single-document format, driver-streamed with a hard cap
    (write_kml policy). Polygon holes are not representable as one SHAPE
    element and raise. ``text_col=``: rows with a non-null value write a
    TEXT element at the geometry's first point. ``complex_shapes=True``
    splits each polygon ring across two members of a COMPLEX SHAPE
    header instead of one SHAPE element (for parity testing).
    ``dimension=3`` stamps the TCB dimension flag and writes (x y z)
    int32 triplets for linework (z from the geometry when it has one,
    else 0)."""
    if dimension not in (2, 3):
        raise ValueError("write_dgn: dimension must be 2 or 3")

    def _ipt(p):
        co = [int(round(float(p[0]) * uor_scale)),
              int(round(float(p[1]) * uor_scale))]
        if dimension == 3:
            co.append(int(round(float(p[2]) * uor_scale))
                      if len(p) > 2 else 0)
        return tuple(co)

    elems = []
    n = 0
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(f"write_dgn: more than max_rows={max_rows} rows")
        d = r.asDict()
        wkb = d.get(geom_col)
        if wkb is None:
            continue
        level = int(d.get(level_col, 0) or 0) if level_col else 0
        txt = d.get(text_col) if text_col else None
        g = WKB.from_wkb(bytes(wkb))
        if txt is not None:
            if g.tag == G.POINT:
                xy = g.data
            else:
                p0 = g.flatten()[0]
                xy = p0.data if p0.tag == G.POINT else p0.data[0]
            ox, oy = float(xy[0]), float(xy[1])
            oz = float(xy[2]) if dimension == 3 and len(xy) > 2 else 0.0
            ix, iy = int(round(ox * uor_scale)), int(round(oy * uor_scale))
            iz = int(round(oz * uor_scale))
            raw = str(txt).encode("latin-1", "replace")[:255]
            if dimension == 3:
                # 3D text: quaternion (identity) @46, origin xyz @62,
                # numchars @74, chars @76
                body = (bytes([0, 0]) + _wr_i32(0) + _wr_i32(0)
                        + _wr_quat((1.0, 0.0, 0.0, 0.0))
                        + _wr_i32(ix) + _wr_i32(iy) + _wr_i32(iz)
                        + bytes([len(raw), 0]) + raw)
            else:
                body = (bytes([0, 0]) + _wr_i32(0) + _wr_i32(0) + _wr_i32(0)
                        + _wr_i32(ix) + _wr_i32(iy)
                        + bytes([len(raw), 0]) + raw)
            if len(body) % 2:
                body += b"\x00"
            elems.append(_element(DGNT_TEXT, level, 0,
                                  (ix, iy, iz, ix, iy, iz), body))
            continue
        if g.tag == G.MULTILINESTRING:
            # complex chain: type-12 header + one member per part
            members = []
            allpts = []
            for part in g.data:
                pts = [_ipt(p) for p in part.data]
                allpts.extend(pts)
                etype, body = _linework(pts)
                members.append(_element(etype, level, 0, _rng(pts), body,
                                        cmplx=True))
            mem = b"".join(members)
            hdr_body = struct.pack("<HH", len(mem) // 2, len(members))
            elems.append(_element(DGNT_COMPLEX_CHAIN, level, 0,
                                  _rng(allpts), hdr_body))
            elems.append(mem)
            continue
        if g.tag == G.LINESTRING:
            pts = [_ipt(p) for p in g.data]
            etype, body = _linework(pts)
        elif g.tag == G.POLYGON:
            if len(g.data) != 1:
                raise ValueError("write_dgn: polygon holes are not "
                                 "representable as one SHAPE element")
            pts = [_ipt(p) for p in g.data[0]]
            if complex_shapes and len(pts) >= 4:
                # split the ring into two members under a type-14 header
                cut = max(2, len(pts) // 2)
                parts = [pts[:cut], pts[cut - 1:]]
                members = []
                for ppts in parts:
                    et, body = _linework(ppts)
                    members.append(_element(et, level, 0, _rng(ppts), body,
                                            cmplx=True))
                mem = b"".join(members)
                hdr_body = struct.pack("<HH", len(mem) // 2, len(members))
                elems.append(_element(DGNT_COMPLEX_SHAPE, level, 0,
                                      _rng(pts), hdr_body))
                elems.append(mem)
                continue
            etype = DGNT_SHAPE
            body = struct.pack("<H", len(pts)) + b"".join(
                _wr_i32(v) for p in pts for v in p)
        else:
            raise ValueError(f"write_dgn: unsupported geometry tag {g.tag} "
                             "(2D line/linestring/polygon shell only)")
        elems.append(_element(etype, level, 0, _rng(pts), body))
    # TCB: type 9, standard 1536-byte element (4 header + 766 words),
    # stamped with subunits-per-master=1 @1112 and uor-per-subunit @1116
    tcb = bytearray(bytes([0, DGNT_TCB]) + struct.pack("<H", 766)
                    + b"\x00" * 1532)
    tcb[1112:1116] = _wr_i32(1)
    tcb[1116:1120] = _wr_i32(int(round(uor_scale)))
    if dimension == 3:
        tcb[1214] |= 0x40  # dgnlib DGNLoadTCB dimension flag
    with open(path, "wb") as fh:
        fh.write(bytes(tcb) + b"".join(elems) + b"\xff\xff")
