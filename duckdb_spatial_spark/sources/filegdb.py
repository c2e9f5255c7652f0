"""Esri FileGDB (OpenFileGDB) reader + writer — minimal v10 subset.

The reference reaches FileGDB through GDAL's OpenFileGDB driver
(``spatial/src/spatial/gdal/functions/st_read.cpp:684-692``); its own test
is a write->read round trip that requires an explicit ``GEOMETRY_TYPE``
parameter and rejects rows of any other geometry type
(``test/sql/gdal/st_read_gdb.test``). This module mirrors exactly that
contract without GDAL (unavailable in this container): ``write_gdb``
emits a ``.gdb`` directory, ``read_gdb`` parses one back, with the row
scan distributed over executor-side row-range partitions.

Wire format: the FileGDB ``.gdbtable``/``.gdbtablx`` layout is not
published by Esri; the public reverse-engineered spec ("FGDB Spec",
github.com/rouault/dump_gdbtable/wiki — the basis of GDAL's OpenFileGDB
driver) documents the load-bearing encodings implemented here exactly:

* ``.gdbtablx``: 16-byte header (magic=3, n-1024-blocks, nrows, offset
  width), then ``nrows`` little-endian row offsets padded to 1024-entry
  blocks, then a 16-byte trailer (bitmap words=0 -> all blocks stored).
* ``.gdbtable``: 40-byte header (magic=3, nrows, max row size, constant 5,
  int64 file size @24, int64 field-descriptor offset @32), a field
  descriptor section (version=4, low byte of the layer flags = geometry
  table type, uint16 field count, per-field: length-prefixed UTF-16 name
  and alias, type byte, per-type metadata), then length-prefixed rows:
  null bitmap over the nullable fields followed by field values in
  declared order (ObjectID is implicit, never stored).
* unsigned varints: 7-bit little-endian groups, bit 7 continues; signed
  varints (coordinate deltas): bit 6 of the FIRST byte is the sign, bits
  0-5 are the low payload bits — FGDB's own encoding, not zigzag.
* geometry "shape buffer": varuint shapefile-style type code, then for
  points the scaled-plus-one coordinates (0 = EMPTY); for multipoint /
  polyline / polygon a varuint point count, part count, quantized bbox,
  per-part vertex counts (last implied), and per-point signed varint
  deltas of the quantized coordinates (dx, dy interleaved; running
  delta starts at 0), with Z then M delta streams appended when present.
  Coordinates quantize as ``round((v - origin) * scale)``.

Where the public spec marks a byte "unknown" this writer emits the
constant observed there and the reader skips it; the SRS is written as an
empty string and the catalog holds only ``GDB_SystemCatalog`` plus the
layer tables (the ArcGIS ``GDB_Items`` XML catalog, curved segments,
multipatch and replica metadata are out of scope — a round-trip
interchange subset, like the SHP/MIF/DXF writers here).
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geo import geom as G
from ..geo import wkb as WKB

_MAGIC = 3

# field type codes (FGDB Spec "field description section")
FT_INT16 = 0
FT_INT32 = 1
FT_FLOAT32 = 2
FT_FLOAT64 = 3
FT_STRING = 4
FT_DATETIME = 5
FT_OBJECTID = 6
FT_GEOMETRY = 7
FT_BINARY = 8

# shapefile-style shape type codes used inside the shape buffer
_SHP_OF_TAG = {G.POINT: 1, G.LINESTRING: 3, G.POLYGON: 5, G.MULTIPOINT: 8,
               G.MULTILINESTRING: 3, G.MULTIPOLYGON: 5}
_SHP_Z = {1: 11, 3: 13, 5: 15, 8: 18}
_SHP_M = {1: 21, 3: 23, 5: 25, 8: 28}
_TAG_OF_SHP = {1: G.POINT, 3: G.MULTILINESTRING, 5: G.MULTIPOLYGON, 8: G.MULTIPOINT}

# geometry table type byte (header "layer flags" low byte)
_TABLE_GEOM_TYPE = {"POINT": 1, "MULTIPOINT": 2, "LINESTRING": 3, "POLYLINE": 3,
                    "POLYGON": 4, "NONE": 0}
_ALLOWED_TAGS = {1: {G.POINT}, 2: {G.MULTIPOINT}, 3: {G.LINESTRING, G.MULTILINESTRING},
                 4: {G.POLYGON, G.MULTIPOLYGON}}

_XY_ORIGIN = -400.0
_XY_SCALE = 1e9  # ArcGIS default degree-grid resolution (1e-9)
_Z_ORIGIN = -100000.0
_Z_SCALE = 1e9
# default quantization grid: (origin_x, origin_y, origin_z, xy_scale, z_scale)
_DEFAULT_GRID = (_XY_ORIGIN, _XY_ORIGIN, _Z_ORIGIN, _XY_SCALE, _Z_SCALE)


def _grid_for(ext, zmin=0.0):
    """Per-dataset XY quantization grid: origin just below the data minimum
    (scaled values must be unsigned, as in the real format), scale the
    largest power of 10 whose products stay exactly representable in
    float64 (<= 2^53), capped at ArcGIS's 1e-9 grid.

    The Z grid stays at the module defaults: this subset's field
    descriptor stores only the XY origin/scale, so an adapted Z grid on
    the writer could not be recovered by the reader. Z below the default
    origin still round-trips through the signed per-vertex deltas of
    multi-part shapes; the point-Z path rejects it loudly."""
    ox = min(math.floor(ext[0]) - 1.0, _XY_ORIGIN)
    oy = min(math.floor(ext[1]) - 1.0, _XY_ORIGIN)
    span = max(ext[2] - ox, ext[3] - oy, 1.0)
    scale = min(_XY_SCALE, 10.0 ** math.floor(math.log10((2.0 ** 53) / span)))
    return (ox, oy, _Z_ORIGIN, scale, _Z_SCALE)


# ------------------------------------------------------------------ varints

def _wvaruint(out: bytearray, v: int):
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _wvarint(out: bytearray, v: int):
    # FGDB signed varint: first byte carries the sign in bit 6
    sign = 0x40 if v < 0 else 0
    v = -v if v < 0 else v
    b = (v & 0x3F) | sign
    v >>= 6
    if v:
        out.append(b | 0x80)
        _wvaruint(out, v)
    else:
        out.append(b)


def _rvaruint(buf: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _rvarint(buf: bytes, pos: int) -> tuple[int, int]:
    b = buf[pos]
    pos += 1
    sign = -1 if b & 0x40 else 1
    v = b & 0x3F
    shift = 6
    while b & 0x80:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
    return sign * v, pos


# ------------------------------------------------------ shape buffer codec

def _quant(vals, origin, scale):
    return np.rint((np.asarray(vals, dtype=np.float64) - origin) * scale).astype(np.int64)


def _delta_write(out: bytearray, xs: np.ndarray, ys: np.ndarray):
    px = py = 0
    for x, y in zip(xs.tolist(), ys.tolist()):
        _wvarint(out, x - px)
        _wvarint(out, y - py)
        px, py = x, y


def _wind_rings(rings):
    """Shapefile winding (the FGDB shape buffer inherits it): shell
    clockwise (signed area < 0), holes counter-clockwise — the reader
    reassembles polygons from ring winding alone."""
    from ..geo.algorithms import _ring_signed_area

    out = []
    for i, r in enumerate(rings):
        a = _ring_signed_area(r)
        want_cw = i == 0  # subset: POLYGON data lists shell first, then holes
        if (a > 0) == want_cw:
            r = r[::-1].copy()
        out.append(r)
    return out


def _encode_shape(g: G.Geometry, grid=_DEFAULT_GRID) -> bytes:
    ox, oy, oz, sc, zsc = grid
    out = bytearray()
    code = _SHP_OF_TAG[g.tag]
    if g.has_z:
        code = _SHP_Z[code]
    elif g.has_m:
        code = _SHP_M[code]
    _wvaruint(out, code)
    if g.tag == G.POINT:
        if g.data is None:
            _wvaruint(out, 0)
            _wvaruint(out, 0)
            return bytes(out)
        x, y = g.data[0], g.data[1]
        qvals = [int(_quant([x], ox, sc)[0]), int(_quant([y], oy, sc)[0])]
        qvals += [int(_quant([v], oz, zsc)[0]) for v in g.data[2:]]
        if min(qvals) < 0:
            raise ValueError(
                f"filegdb: coordinate below the dataset quantization origin "
                f"({ox}, {oy}, {oz}) — scaled values must be unsigned"
            )
        for q in qvals:
            _wvaruint(out, q + 1)
        return bytes(out)

    # flatten parts: multipoint -> 1 implicit part; (multi)linestring ->
    # one part per line; (multi)polygon -> one part per ring
    if g.tag == G.MULTIPOINT:
        parts = [np.vstack([p.data for p in g.data])] if g.data else []
    elif g.tag == G.LINESTRING:
        parts = [g.data] if len(g.data) else []
    elif g.tag == G.MULTILINESTRING:
        parts = [c.data for c in g.data if len(c.data)]
    elif g.tag == G.POLYGON:
        parts = _wind_rings([r for r in g.data if len(r)])
    else:  # MULTIPOLYGON
        parts = [r for p in g.data for r in _wind_rings([q for q in p.data if len(q)])]
    npoints = sum(len(p) for p in parts)
    _wvaruint(out, npoints)
    if npoints == 0:
        return bytes(out)
    if g.tag != G.MULTIPOINT:
        _wvaruint(out, len(parts))
    all_xy = np.vstack([np.asarray(p, dtype=np.float64) for p in parts])
    qx = _quant(all_xy[:, 0], ox, sc)
    qy = _quant(all_xy[:, 1], oy, sc)
    if qx.min() < 0 or qy.min() < 0:
        raise ValueError(
            "filegdb: coordinate below the dataset quantization origin "
            f"({ox}, {oy}) — scaled values must be unsigned"
        )
    _wvaruint(out, int(qx.min()))
    _wvaruint(out, int(qy.min()))
    _wvaruint(out, int(qx.max() - qx.min()))
    _wvaruint(out, int(qy.max() - qy.min()))
    if g.tag != G.MULTIPOINT:
        for p in parts[:-1]:
            _wvaruint(out, len(p))
    _delta_write(out, qx, qy)
    col = 2
    if g.has_z:
        qz = _quant(all_xy[:, col], oz, zsc)
        col += 1
        pz = 0
        for z in qz.tolist():
            _wvarint(out, z - pz)
            pz = z
    if g.has_m:
        qm = _quant(all_xy[:, col], oz, zsc)
        pm = 0
        for m in qm.tolist():
            _wvarint(out, m - pm)
            pm = m
    return bytes(out)


def _decode_shape(buf: bytes, grid=_DEFAULT_GRID) -> G.Geometry | None:
    ox, oy, oz, sc, zsc = grid
    code, pos = _rvaruint(buf, 0)
    base = code % 10 if code in (11, 13, 15, 18, 21, 23, 25, 28) else code
    if code in (18, 28):
        base = 8
    has_z = code in (11, 13, 15, 18)
    has_m = code in (21, 23, 25, 28)
    if base == 1:
        qx, pos = _rvaruint(buf, pos)
        qy, pos = _rvaruint(buf, pos)
        if qx == 0:
            return G.Geometry(G.POINT, None, has_z, has_m)
        coords = [(qx - 1) / sc + ox, (qy - 1) / sc + oy]
        for _ in range(has_z + has_m):
            qe, pos = _rvaruint(buf, pos)
            coords.append((qe - 1) / zsc + oz)
        return G.Geometry(G.POINT, np.asarray(coords), has_z, has_m)

    tag = _TAG_OF_SHP[base]
    npoints, pos = _rvaruint(buf, pos)
    if npoints == 0:
        return G.empty(tag, has_z, has_m)
    nparts = 1
    if base != 8:
        nparts, pos = _rvaruint(buf, pos)
    for _ in range(4):  # quantized bbox — recomputable, skip
        _, pos = _rvaruint(buf, pos)
    counts = []
    if base != 8:
        for _ in range(nparts - 1):
            c, pos = _rvaruint(buf, pos)
            counts.append(c)
    counts.append(npoints - sum(counts))
    qx = np.empty(npoints, dtype=np.int64)
    qy = np.empty(npoints, dtype=np.int64)
    px = py = 0
    for i in range(npoints):
        dx, pos = _rvarint(buf, pos)
        dy, pos = _rvarint(buf, pos)
        px += dx
        py += dy
        qx[i] = px
        qy[i] = py
    cols = [qx / sc + ox, qy / sc + oy]
    for _ in range(has_z + has_m):
        qe = np.empty(npoints, dtype=np.int64)
        pe = 0
        for i in range(npoints):
            de, pos = _rvarint(buf, pos)
            pe += de
            qe[i] = pe
        cols.append(qe / zsc + oz)
    xy = np.column_stack(cols)
    parts = []
    at = 0
    for c in counts:
        parts.append(xy[at:at + c])
        at += c
    if tag == G.MULTIPOINT:
        return G.Geometry(G.MULTIPOINT,
                          [G.Geometry(G.POINT, p, has_z, has_m) for p in xy], has_z, has_m)
    if tag == G.MULTILINESTRING:
        if len(parts) == 1:
            return G.Geometry(G.LINESTRING, parts[0], has_z, has_m)
        return G.Geometry(G.MULTILINESTRING,
                          [G.Geometry(G.LINESTRING, p, has_z, has_m) for p in parts],
                          has_z, has_m)
    # polygon: rings -> shells (clockwise in shapefile convention carries
    # over; this subset reassembles ring runs exactly as written: each
    # clockwise-signed shell starts a polygon, following rings are holes)
    from ..geo.algorithms import _ring_signed_area

    polys: list[list[np.ndarray]] = []
    for r in parts:
        if _ring_signed_area(r) <= 0 or not polys:  # CW shell (shapefile winding)
            polys.append([r])
        else:
            polys[-1].append(r)
    if len(polys) == 1:
        return G.Geometry(G.POLYGON, polys[0], has_z, has_m)
    return G.Geometry(G.MULTIPOLYGON,
                      [G.Geometry(G.POLYGON, p, has_z, has_m) for p in polys],
                      has_z, has_m)


# ------------------------------------------------------------- field codecs

def _field_of_spark(name: str, dt: T.DataType):
    if isinstance(dt, (T.ShortType,)):
        return (name, FT_INT16)
    if isinstance(dt, (T.IntegerType, T.LongType)):
        return (name, FT_INT32)
    if isinstance(dt, T.FloatType):
        return (name, FT_FLOAT32)
    if isinstance(dt, (T.DoubleType, T.DecimalType)):
        return (name, FT_FLOAT64)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return (name, FT_DATETIME)
    if isinstance(dt, T.BinaryType):
        return (name, FT_BINARY)
    return (name, FT_STRING)


_SPARK_OF_FIELD = {FT_INT16: T.IntegerType(), FT_INT32: T.IntegerType(),
                   FT_FLOAT32: T.DoubleType(), FT_FLOAT64: T.DoubleType(),
                   FT_STRING: T.StringType(), FT_DATETIME: T.TimestampNTZType(),
                   FT_BINARY: T.BinaryType()}


def _utf16_name(out: bytearray, s: str):
    enc = s.encode("utf-16-le")
    out.append(len(enc) // 2)
    out += enc


def _write_field_descs(fields, geom_type_byte: int, extent, grid=_DEFAULT_GRID) -> bytes:
    """fields: [(name, type_code)]; ObjectID first, geometry (if any) holds
    the quantization grid + extent."""
    ox, oy, _oz, sc, _zsc = grid
    body = bytearray()
    body += struct.pack("<i", 4)  # version 4 = FGDB 10
    body += struct.pack("<i", geom_type_byte)
    body += struct.pack("<H", len(fields))
    for name, code in fields:
        _utf16_name(body, name)
        body.append(0)  # no alias
        body.append(code)
        if code == FT_OBJECTID:
            body += bytes((4, 2))  # constants per FGDB Spec ("unknown")
        elif code == FT_GEOMETRY:
            body.append(0)
            body.append(7)  # nullable + spec-observed flag bits
            body += struct.pack("<H", 0)  # empty SRS WKT
            body.append(0)  # zm flag byte: bit0 z, bit1 m (subset: 2D tables)
            body += struct.pack("<3d", ox, oy, sc)
            body += struct.pack("<d", 1.0 / sc)  # xy tolerance
            body += struct.pack("<4d", *extent)
            body.append(1)  # grid count
            body += struct.pack("<d", 1000.0)  # spatial-index grid size
        elif code == FT_STRING:
            body += struct.pack("<i", 65536)
            body.append(1)
        elif code == FT_BINARY:
            body += bytes((0, 1))
        else:
            width = {FT_INT16: 2, FT_INT32: 4, FT_FLOAT32: 4,
                     FT_FLOAT64: 8, FT_DATETIME: 8}[code]
            body += bytes((width, 1))
    return struct.pack("<i", len(body)) + bytes(body)


def _read_field_descs(buf: bytes, pos: int):
    size = struct.unpack_from("<i", buf, pos)[0]
    end = pos + 4 + size
    pos += 4
    _version, geom_type = struct.unpack_from("<ii", buf, pos)
    pos += 8
    nfields = struct.unpack_from("<H", buf, pos)[0]
    pos += 2
    grid = _DEFAULT_GRID
    fields = []
    for _ in range(nfields):
        nlen = buf[pos]
        pos += 1
        name = buf[pos:pos + 2 * nlen].decode("utf-16-le")
        pos += 2 * nlen
        alen = buf[pos]
        pos += 1 + 2 * alen
        code = buf[pos]
        pos += 1
        nullable = True
        if code == FT_OBJECTID:
            pos += 2
            nullable = False
        elif code == FT_GEOMETRY:
            pos += 1
            flag = buf[pos]
            pos += 1
            nullable = bool(flag & 1) or flag in (6, 7)
            srs_len = struct.unpack_from("<H", buf, pos)[0]
            pos += 2 + srs_len
            pos += 1  # zm flag byte
            gox, goy, gsc = struct.unpack_from("<3d", buf, pos)
            grid = (gox, goy, _Z_ORIGIN, gsc, _Z_SCALE)
            pos += 8 * 3 + 8  # origins/scale + tolerance
            pos += 8 * 4  # extent
            ngrids = buf[pos]
            pos += 1 + 8 * ngrids
        elif code == FT_STRING:
            pos += 4
            nullable = bool(buf[pos] & 1)
            pos += 1
        else:
            pos += 1
            nullable = bool(buf[pos] & 1)
            pos += 1
        fields.append((name, code, nullable))
    return fields, geom_type & 0xFF, end, grid


# --------------------------------------------------------------- table io

def _write_tablx(path: str, offsets: list[int]):
    n = len(offsets)
    nblocks = max(1, math.ceil(n / 1024))
    with open(path, "wb") as f:
        f.write(struct.pack("<4i", _MAGIC, nblocks, n, 5))
        for off in offsets:
            f.write(off.to_bytes(5, "little"))
        f.write(b"\x00" * 5 * (nblocks * 1024 - n))
        f.write(struct.pack("<4i", 0, nblocks, nblocks, 0))


def _read_tablx(path: str) -> list[int]:
    with open(path, "rb") as f:
        magic, _nblocks, n, width = struct.unpack("<4i", f.read(16))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a .gdbtablx (magic {magic})")
        raw = f.read(n * width)
    return [int.from_bytes(raw[i * width:(i + 1) * width], "little") for i in range(n)]


def _encode_row(fields, values) -> bytes:
    """values aligned with fields; ObjectID entries ignored (implicit)."""
    nullable = [(i, f) for i, f in enumerate(fields) if f[1] != FT_OBJECTID]
    bitmap = bytearray((len(nullable) + 7) // 8)
    body = bytearray()
    for bit, (i, (name, code)) in enumerate(nullable):
        v = values[i]
        if v is None:
            bitmap[bit // 8] |= 1 << (bit % 8)
            continue
        if code in (FT_INT16, FT_INT32):
            body += struct.pack("<h" if code == FT_INT16 else "<i", int(v))
        elif code == FT_FLOAT32:
            body += struct.pack("<f", float(v))
        elif code == FT_FLOAT64:
            body += struct.pack("<d", float(v))
        elif code == FT_DATETIME:
            import datetime as _dt

            if isinstance(v, _dt.datetime):
                days = (v.replace(tzinfo=None) - _dt.datetime(1899, 12, 30)).total_seconds() / 86400.0
            elif isinstance(v, _dt.date):
                days = float((v - _dt.date(1899, 12, 30)).days)
            else:
                days = float(v)
            body += struct.pack("<d", days)
        elif code == FT_STRING:
            enc = str(v).encode("utf-8")
            _wvaruint(body, len(enc))
            body += enc
        elif code in (FT_BINARY, FT_GEOMETRY):
            _wvaruint(body, len(v))
            body += v
    return bytes(bitmap) + bytes(body)


def _decode_row(buf: bytes, fields) -> list:
    nullable = [f for f in fields if f[1] != FT_OBJECTID]
    nbytes = (len(nullable) + 7) // 8
    bitmap = buf[:nbytes]
    pos = nbytes
    out = []
    bit = 0
    for name, code, is_nullable in fields:
        if code == FT_OBJECTID:
            out.append(None)  # filled by caller with the row id
            continue
        isnull = bool(bitmap[bit // 8] & (1 << (bit % 8)))
        bit += 1
        if isnull:
            out.append(None)
            continue
        if code == FT_INT16:
            out.append(struct.unpack_from("<h", buf, pos)[0])
            pos += 2
        elif code == FT_INT32:
            out.append(struct.unpack_from("<i", buf, pos)[0])
            pos += 4
        elif code == FT_FLOAT32:
            out.append(float(struct.unpack_from("<f", buf, pos)[0]))
            pos += 4
        elif code == FT_FLOAT64:
            out.append(struct.unpack_from("<d", buf, pos)[0])
            pos += 8
        elif code == FT_DATETIME:
            days = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
            import datetime as _dt

            out.append(_dt.datetime(1899, 12, 30)
                       + _dt.timedelta(microseconds=round(days * 86400.0 * 1e6)))
        elif code == FT_STRING:
            ln, pos = _rvaruint(buf, pos)
            out.append(buf[pos:pos + ln].decode("utf-8"))
            pos += ln
        else:  # binary / geometry
            ln, pos = _rvaruint(buf, pos)
            out.append(buf[pos:pos + ln])
            pos += ln
    return out


def _write_gdbtable(path: str, fields, rows, geom_type_byte: int, extent,
                    grid=_DEFAULT_GRID):
    """fields: [(name, code)]; rows: iterable of value tuples aligned with
    fields. Writes path(.gdbtable) + sibling .gdbtablx."""
    offsets = []
    blobs = []
    max_size = 0
    for vals in rows:
        blob = _encode_row(fields, vals)
        blobs.append(blob)
        max_size = max(max_size, len(blob))
    desc = _write_field_descs(fields, geom_type_byte, extent, grid)
    with open(path, "wb") as f:
        f.write(b"\x00" * 40)
        f.write(desc)
        for blob in blobs:
            offsets.append(f.tell())
            f.write(struct.pack("<i", len(blob)))
            f.write(blob)
        size = f.tell()
        f.seek(0)
        f.write(struct.pack("<6i", _MAGIC, len(blobs), max_size, 5, 0, 0))
        f.write(struct.pack("<qq", size, 40))
    _write_tablx(os.path.splitext(path)[0] + ".gdbtablx", offsets)


def _read_gdbtable_header(path: str):
    with open(path, "rb") as f:
        head = f.read(40)
        magic, nrows = struct.unpack_from("<2i", head, 0)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a .gdbtable (magic {magic})")
        desc_off = struct.unpack_from("<q", head, 32)[0]
        f.seek(desc_off)
        size = struct.unpack("<i", f.read(4))[0]
        f.seek(desc_off)
        fields, geom_type, _, grid = _read_field_descs(f.read(4 + size), 0)
    return nrows, fields, geom_type, grid


# ------------------------------------------------------------- public API

def write_gdb(
    df: DataFrame,
    path: str,
    layer: str | None = None,
    geom_col: str = "geom",
    geometry_type: str | None = None,
    max_rows: int = 5_000_000,
):
    """COPY TO (FORMAT GDAL, DRIVER 'OpenFileGDB') analog. Mirrors the
    reference's contract (test/sql/gdal/st_read_gdb.test): ``geometry_type``
    is required, and a row of any other geometry type raises. The dataset
    is a directory; tables are single files, so rows stream through the
    driver bounded by ``max_rows`` (same contract as write_gpkg /
    write_shapefile — big data belongs in GeoParquet)."""
    if geometry_type is None:
        raise ValueError(
            "OpenFileGDB requires 'GEOMETRY_TYPE' parameter to be set when "
            "writing (one of POINT, MULTIPOINT, LINESTRING, POLYGON)"
        )
    gt = geometry_type.upper()
    if gt not in _TABLE_GEOM_TYPE:
        raise ValueError(f"unsupported GEOMETRY_TYPE {geometry_type!r}")
    geom_byte = _TABLE_GEOM_TYPE[gt]
    layer = layer or os.path.splitext(os.path.basename(path.rstrip("/")))[0]

    attr_cols = [f for f in df.schema.fields if f.name != geom_col]
    has_geom = geom_col in df.columns
    fields = [("OBJECTID", FT_OBJECTID)]
    if has_geom:
        fields.append(("SHAPE", FT_GEOMETRY))
    fields += [_field_of_spark(f.name, f.dataType) for f in attr_cols]

    # pass 1: decode + bounds (the quantization grid must cover the data
    # before any shape is encoded — scaled values are unsigned)
    staged = []
    ext = [math.inf, math.inf, -math.inf, -math.inf]
    zmin = 0.0
    n = 0
    cols = ([geom_col] if has_geom else []) + [f.name for f in attr_cols]
    for r in df.select(*cols).toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(
                f"write_gdb: more than max_rows={max_rows} rows; FileGDB is a "
                "single-file-per-table interchange format — use GeoParquet "
                "(write_geo_parquet) for large outputs"
            )
        g = None
        if has_geom:
            wkb = r[geom_col]
            if wkb is not None:
                g = WKB.from_wkb(bytes(wkb))
                if g.tag not in _ALLOWED_TAGS.get(geom_byte, set()):
                    raise ValueError(
                        f"Expected all geometries to be of type '{gt}', but "
                        f"got one of type '{g.type_name}'"
                    )
                for arr in g.coord_arrays():
                    if len(arr):
                        ext[0] = min(ext[0], float(arr[:, 0].min()))
                        ext[1] = min(ext[1], float(arr[:, 1].min()))
                        ext[2] = max(ext[2], float(arr[:, 0].max()))
                        ext[3] = max(ext[3], float(arr[:, 1].max()))
                        if arr.shape[1] > 2:
                            zmin = min(zmin, float(arr[:, 2:].min()))
        staged.append((n, g, [r[f.name] for f in attr_cols]))
    if not math.isfinite(ext[0]):
        ext = [0.0, 0.0, 0.0, 0.0]
    grid = _grid_for(ext, zmin)

    # pass 2: encode with the dataset grid
    rows = []
    for oid, g, attrs in staged:
        vals = [oid]
        if has_geom:
            vals.append(_encode_shape(g, grid) if g is not None else None)
        vals += attrs
        rows.append(tuple(vals))

    os.makedirs(path, exist_ok=True)
    open(os.path.join(path, "gdb"), "wb").close()  # dataset marker file
    # catalog: system table names (ids 1..8, ArcGIS-reserved) + the layer
    cat_fields = [("ID", FT_OBJECTID), ("Name", FT_STRING), ("FileFormat", FT_INT32)]
    system = ["GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs", "GDB_Items",
              "GDB_ItemTypes", "GDB_ItemRelationships", "GDB_ItemRelationshipTypes",
              "GDB_ReplicaLog"]
    cat_rows = [(i + 1, nm, 0) for i, nm in enumerate(system)] + [(9, layer, 0)]
    _write_gdbtable(os.path.join(path, "a00000001.gdbtable"), cat_fields,
                    cat_rows, 0, [0.0, 0.0, 0.0, 0.0])
    _write_gdbtable(os.path.join(path, "a00000009.gdbtable"), fields, rows,
                    geom_byte, ext, grid)


def gdb_layers(path: str) -> list[str]:
    """Layer names in a .gdb directory (non-system catalog entries)."""
    cat = os.path.join(path, "a00000001.gdbtable")
    _, fields, _, _ = _read_gdbtable_header(cat)
    offsets = _read_tablx(os.path.join(path, "a00000001.gdbtablx"))
    names = []
    with open(cat, "rb") as f:
        for off in offsets:
            if off == 0:
                continue
            f.seek(off)
            ln = struct.unpack("<i", f.read(4))[0]
            vals = _decode_row(f.read(ln), fields)
            nm = vals[[i for i, fl in enumerate(fields) if fl[0] == "Name"][0]]
            if nm and not nm.startswith("GDB_"):
                names.append(nm)
    return names


def read_gdb(spark: SparkSession, path: str, layer: str | None = None,
             rows_per_partition: int = 50_000,
             fid_column: str | None = None) -> DataFrame:
    """ST_Read for FileGDB datasets. Finds the layer via GDB_SystemCatalog
    (or takes a direct ``.gdbtable`` path), then scans row ranges in
    parallel: each partition seeks into its ``.gdbtablx`` slice on the
    executor, so a big table fans out without a driver bottleneck.

    Column order matches GDAL's st_read surface (attributes first, ``geom``
    last) and the ObjectID is hidden like GDAL's FID — pass
    ``fid_column="OBJECTID"`` to expose it as the first column
    (reference parity: ``FROM st_read('test.gdb')`` yields the attribute +
    geometry columns only, test/sql/gdal/st_read_gdb.test)."""
    if path.endswith(".gdbtable"):
        table = path
    else:
        want = layer
        cat = os.path.join(path, "a00000001.gdbtable")
        _, cfields, _, _ = _read_gdbtable_header(cat)
        offsets = _read_tablx(os.path.join(path, "a00000001.gdbtablx"))
        table = None
        with open(cat, "rb") as f:
            for oid, off in enumerate(offsets, start=1):
                if off == 0:
                    continue
                f.seek(off)
                ln = struct.unpack("<i", f.read(4))[0]
                vals = _decode_row(f.read(ln), cfields)
                nm = vals[[i for i, fl in enumerate(cfields) if fl[0] == "Name"][0]]
                if nm is None or nm.startswith("GDB_"):
                    continue
                if want is None or nm.lower() == want.lower():
                    table = os.path.join(path, f"a{oid:08x}.gdbtable")
                    break
        if table is None:
            raise ValueError(f"layer {layer!r} not found in {path!r}")

    nrows, fields, geom_type, grid = _read_gdbtable_header(table)
    # output order: [fid?] attributes..., geom last (GDAL st_read surface)
    ordered = []
    if fid_column is not None:
        ordered += [f for f in fields if f[1] == FT_OBJECTID]
    ordered += [f for f in fields if f[1] not in (FT_OBJECTID, FT_GEOMETRY)]
    ordered += [f for f in fields if f[1] == FT_GEOMETRY]
    schema_fields = []
    for name, code, _null in ordered:
        if code == FT_OBJECTID:
            schema_fields.append(T.StructField(fid_column, T.LongType(), False))
        elif code == FT_GEOMETRY:
            schema_fields.append(T.StructField("geom", T.BinaryType()))
        else:
            schema_fields.append(T.StructField(name, _SPARK_OF_FIELD[code]))
    schema = T.StructType(schema_fields)
    tablx = os.path.splitext(table)[0] + ".gdbtablx"
    ranges = [(start, min(start + rows_per_partition, nrows))
              for start in range(0, max(nrows, 1), rows_per_partition)]

    src_pos = {id(f): i for i, f in enumerate(fields)}
    emit_pos = [src_pos[id(f)] for f in ordered]

    def iter_range(bounds):
        start, end = bounds
        # seek straight to this partition's offset slice — a big table's
        # partitions must not each re-read the whole .gdbtablx
        with open(tablx, "rb") as xf:
            magic, _nb, _n, width = struct.unpack("<4i", xf.read(16))
            if magic != _MAGIC:
                raise ValueError(f"{tablx}: not a .gdbtablx (magic {magic})")
            xf.seek(16 + start * width)
            raw = xf.read((end - start) * width)
        offsets = [int.from_bytes(raw[i * width:(i + 1) * width], "little")
                   for i in range(end - start)]
        with open(table, "rb") as f:
            for k, off in enumerate(offsets):
                if off == 0:
                    continue  # deleted row
                f.seek(off)
                ln = struct.unpack("<i", f.read(4))[0]
                vals = _decode_row(f.read(ln), fields)
                out = []
                for i in emit_pos:
                    name, code, _nl = fields[i]
                    v = vals[i]
                    if code == FT_OBJECTID:
                        out.append(start + k + 1)
                    elif code == FT_GEOMETRY:
                        if v is None:
                            out.append(None)
                        else:
                            g = _decode_shape(bytes(v), grid)
                            out.append(WKB.to_wkb(g) if g is not None else None)
                    elif code in (FT_INT16, FT_INT32):
                        out.append(int(v) if v is not None else None)
                    elif code == FT_BINARY:
                        out.append(bytes(v) if v is not None else None)
                    else:
                        out.append(v)
                yield tuple(out)

    try:
        from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

        # unique per-call registration name: Spark resolves python
        # sources BY NAME; a fixed name + fresh closure state hands a
        # second read the stale reader (schema mismatch)
        import uuid as _uuid

        _ds_name = f"filegdb_{_uuid.uuid4().hex[:12]}"

        class _Reader(DataSourceReader):
            def partitions(self):
                return [InputPartition(r) for r in ranges]

            def read(self, partition):
                yield from iter_range(partition.value)

        class _Src(DataSource):
            @classmethod
            def name(cls):
                return _ds_name

            def schema(self):
                return schema

            def reader(self, schema):
                return _Reader()

        spark.dataSource.register(_Src)
        return spark.read.format(_ds_name).schema(schema).load(table)
    except ImportError:
        return spark.createDataFrame([r for rng in ranges for r in iter_range(rng)], schema)
