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
    type 3  LINE        x0 y0 x1 y1
    type 4  LINE STRING numverts, then numverts x (x y)
    type 6  SHAPE       like 4, closed ring -> POLYGON
  int32 coordinates use the VAX-heritage "word-swapped" order: the
  HIGH 16-bit word first, each word little-endian. The file opens with
  a TCB element (type 9) and ends with an 0xFFFF end-of-file word.

Coordinates are UORs (integer units of resolution); ``uor_scale``
divides on read / multiplies on write (default 1000.0, a common
uor-per-master-unit choice — pass your design file's value for real
data). Complex chains/shapes, cells, text, arcs and 3D are out of
scope and are SKIPPED on read (counted, not raised — a real design
file mixes them with the vector subset)."""

from __future__ import annotations

import glob as _glob
import os
import struct

from pyspark.sql import DataFrame, SparkSession

from ..geo import geom as G
from ..geo import wkb as WKB

_BIAS = 1 << 31

DGNT_LINE = 3
DGNT_LINE_STRING = 4
DGNT_SHAPE = 6
DGNT_TCB = 9


def _rd_i32(buf: bytes, off: int) -> int:
    """DGN int32: high 16-bit word first, words little-endian."""
    hi, lo = struct.unpack_from("<HH", buf, off)
    v = (hi << 16) | lo
    return v - (1 << 32) if v >= (1 << 31) else v


def _wr_i32(v: int) -> bytes:
    v &= 0xFFFFFFFF
    return struct.pack("<HH", (v >> 16) & 0xFFFF, v & 0xFFFF)


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


def parse_dgn(path: str, uor_scale: float = 1000.0):
    """-> list of (level, color, weight, style, geometry); skips
    non-vector / complex elements."""
    with open(path, "rb") as fh:
        buf = fh.read()
    out = []
    for level, etype, cmplx, el in _iter_elements(buf):
        if cmplx or etype not in (DGNT_LINE, DGNT_LINE_STRING, DGNT_SHAPE):
            continue
        if len(el) < 36:
            continue
        (symb,) = struct.unpack_from("<H", el, 34)
        color = symb & 0xFF
        weight = (symb >> 8) & 0x1F
        style = (symb >> 13) & 0x7
        body = el[36:]
        if etype == DGNT_LINE:
            if len(body) < 16:
                continue
            pts = [
                (_rd_i32(body, 0) / uor_scale, _rd_i32(body, 4) / uor_scale),
                (_rd_i32(body, 8) / uor_scale, _rd_i32(body, 12) / uor_scale),
            ]
            g = G.linestring([list(p) for p in pts])
        else:
            (nv,) = struct.unpack_from("<H", body, 0)
            pts = [
                [_rd_i32(body, 2 + 8 * i) / uor_scale,
                 _rd_i32(body, 6 + 8 * i) / uor_scale]
                for i in range(nv)
            ]
            if etype == DGNT_SHAPE:
                if pts and pts[0] != pts[-1]:
                    pts.append(list(pts[0]))
                g = G.polygon([pts])
            else:
                g = G.linestring(pts)
        out.append((level, color, weight, style, g))
    return out


def read_dgn(spark: SparkSession, path: str, uor_scale: float = 1000.0) -> DataFrame:
    """ST_Read for .dgn: one row per vector element with level/symbology
    attributes and WKB geom (GDAL's DGN layer exposes the same columns)."""
    from pyspark.sql import types as T

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.dgn")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    rows = []
    for fp in files:
        for level, color, weight, style, g in parse_dgn(fp, uor_scale):
            rows.append((level, color, weight, style, WKB.to_wkb(g)))
    schema = T.StructType(
        [
            T.StructField("level", T.IntegerType()),
            T.StructField("color", T.IntegerType()),
            T.StructField("weight", T.IntegerType()),
            T.StructField("style", T.IntegerType()),
            T.StructField("geom", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _element(etype: int, level: int, symb: int, rng, body: bytes) -> bytes:
    wtf = (24 + 8 + len(body)) // 2  # range + fixed words + payload
    head = bytes([level & 0x3F, etype & 0x7F]) + struct.pack("<H", wtf)
    rbytes = b"".join(struct.pack("<HH", ((v + _BIAS) >> 16) & 0xFFFF,
                                  (v + _BIAS) & 0xFFFF) for v in rng)
    fixed = struct.pack("<HHHH", 0, 0, 0, symb)
    return head + rbytes + fixed + body


def write_dgn(df: DataFrame, path: str, geom_col: str = "geom",
              uor_scale: float = 1000.0, level_col: str | None = None,
              max_rows: int = 1_000_000) -> None:
    """Minimal DGN v7 writer (2D lines/linestrings/polygon shells):
    TCB stub + one element per row + end-of-file word. Single-document
    format, driver-streamed with a hard cap (write_kml policy). Polygon
    holes are not representable as one SHAPE element and raise."""
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
        g = WKB.from_wkb(bytes(wkb))
        if g.tag == G.LINESTRING:
            pts = [(int(round(p[0] * uor_scale)), int(round(p[1] * uor_scale)))
                   for p in g.data]
            if len(pts) == 2:
                etype = DGNT_LINE
                body = b"".join(_wr_i32(v) for p in pts for v in p)
            else:
                etype = DGNT_LINE_STRING
                body = struct.pack("<H", len(pts)) + b"".join(
                    _wr_i32(v) for p in pts for v in p)
        elif g.tag == G.POLYGON:
            if len(g.data) != 1:
                raise ValueError("write_dgn: polygon holes are not "
                                 "representable as one SHAPE element")
            pts = [(int(round(p[0] * uor_scale)), int(round(p[1] * uor_scale)))
                   for p in g.data[0]]
            etype = DGNT_SHAPE
            body = struct.pack("<H", len(pts)) + b"".join(
                _wr_i32(v) for p in pts for v in p)
        else:
            raise ValueError(f"write_dgn: unsupported geometry tag {g.tag} "
                             "(2D line/linestring/polygon shell only)")
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        rng = (min(xs), min(ys), 0, max(xs), max(ys), 0)
        elems.append(_element(etype, level, 0, rng, body))
    # TCB stub: type 9, standard 1536-byte element (4 header + 766 words)
    tcb = bytes([0, DGNT_TCB]) + struct.pack("<H", 766) + b"\x00" * 1532
    with open(path, "wb") as fh:
        fh.write(tcb + b"".join(elems) + b"\xff\xff")
