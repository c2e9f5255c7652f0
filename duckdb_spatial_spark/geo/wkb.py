"""WKB reader/writer — the engine's canonical serialized geometry form.

The reference stores GEOMETRY as its own serialized blob
(``spatial/src/spatial/core/geometry/geometry_serialization.cpp:14-37``) and
ships separate WKB read/write paths (``geometry/wkb_reader.cpp``,
``geometry/wkb_writer.cpp``). We collapse the two: canonical form IS
standard ISO WKB (little-endian), so Parquet interchange and GeoParquet
compatibility are free.

Reader accepts:
  * ISO WKB: type = base + 1000*Z + 2000*M (+3000 for ZM)
  * EWKB (PostGIS): flag bits 0x80000000 (Z), 0x40000000 (M),
    0x20000000 (SRID present — SRID is read and discarded; the reference
    likewise stores no SRID in geometries, see ``test/sql/proj.test:4-8``).
  * both endiannesses.

Writer emits little-endian ISO WKB. EMPTY points serialize as NaN
coordinates (the common convention).
"""

from __future__ import annotations

import struct

import numpy as np

from . import geom as G

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class WKBParseError(ValueError):
    pass


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.i = 0

    def read(self, fmt, size):
        if self.i + size > len(self.buf):
            raise WKBParseError(f"truncated WKB at byte {self.i}")
        out = struct.unpack_from(fmt, self.buf, self.i)
        self.i += size
        return out

    def geometry(self) -> G.Geometry:
        (order,) = self.read("B", 1)
        bo = "<" if order == 1 else ">"
        (code,) = self.read(bo + "I", 4)
        has_z = has_m = False
        if code & (_EWKB_Z | _EWKB_M | _EWKB_SRID):
            has_z = bool(code & _EWKB_Z)
            has_m = bool(code & _EWKB_M)
            if code & _EWKB_SRID:
                self.read(bo + "I", 4)  # discard SRID
            base = code & 0xFFFF
        else:
            base = code % 1000
            zm = code // 1000
            has_z = zm in (1, 3)
            has_m = zm in (2, 3)
        if base not in G.TYPE_NAMES:
            raise WKBParseError(f"unknown WKB geometry type code {code}")
        dim = 2 + has_z + has_m

        if base == G.POINT:
            vals = self.read(bo + "d" * dim, 8 * dim)
            arr = np.asarray(vals, dtype=np.float64)
            if np.all(np.isnan(arr)):
                return G.Geometry(G.POINT, None, has_z, has_m)
            return G.Geometry(G.POINT, arr, has_z, has_m)
        if base == G.LINESTRING:
            return G.Geometry(G.LINESTRING, self._seq(bo, dim), has_z, has_m)
        if base == G.POLYGON:
            (nrings,) = self.read(bo + "I", 4)
            if nrings * 4 > len(self.buf) - self.i:
                raise WKBParseError(f"ring count {nrings} exceeds buffer")
            rings = [self._seq(bo, dim) for _ in range(nrings)]
            return G.Geometry(G.POLYGON, rings, has_z, has_m)
        # multi / collection: children are full WKB geometries
        (n,) = self.read(bo + "I", 4)
        if n * 5 > len(self.buf) - self.i:  # each child >= 5 bytes
            raise WKBParseError(f"child count {n} exceeds buffer")
        children = [self.geometry() for _ in range(n)]
        hz = has_z or any(c.has_z for c in children)
        hm = has_m or any(c.has_m for c in children)
        return G.Geometry(base, children, hz, hm)

    def _seq(self, bo, dim):
        (n,) = self.read(bo + "I", 4)
        if n == 0:
            return np.empty((0, dim))
        size = 8 * n * dim
        # bound-check BEFORE building the format string: a hostile count
        # would otherwise allocate a gigabyte-scale format string
        if size > len(self.buf) - self.i:
            raise WKBParseError(f"vertex count {n} exceeds buffer at byte {self.i}")
        flat = self.read(bo + "d" * (n * dim), size)
        return np.asarray(flat, dtype=np.float64).reshape(n, dim)


def from_wkb(buf: bytes) -> G.Geometry:
    if buf is None:
        return None
    r = _Reader(bytes(buf))
    return r.geometry()


# ---------------------------------------------------------------- writer
def _code(g: G.Geometry) -> int:
    return g.tag + 1000 * (1 if g.has_z else 0) + 2000 * (1 if g.has_m else 0)


def _write(g: G.Geometry, out: list):
    out.append(struct.pack("<BI", 1, _code(g)))
    dim = g.dim
    if g.tag == G.POINT:
        if g.data is None:
            out.append(struct.pack("<" + "d" * dim, *([float("nan")] * dim)))
        else:
            out.append(struct.pack("<" + "d" * dim, *[float(v) for v in g.data]))
    elif g.tag == G.LINESTRING:
        arr = np.ascontiguousarray(g.data, dtype="<f8")
        out.append(struct.pack("<I", arr.shape[0]))
        out.append(arr.tobytes())
    elif g.tag == G.POLYGON:
        out.append(struct.pack("<I", len(g.data)))
        for ring in g.data:
            arr = np.ascontiguousarray(ring, dtype="<f8")
            out.append(struct.pack("<I", arr.shape[0]))
            out.append(arr.tobytes())
    else:
        out.append(struct.pack("<I", len(g.data)))
        for child in g.data:
            _write(child, out)


def to_wkb(g: G.Geometry) -> bytes:
    if g is None:
        return None
    out: list = []
    _write(g, out)
    return b"".join(out)
