"""WKT reader/writer.

Independent recursive-descent implementation of OGC WKT with Z/M modifiers
and EMPTY, matching the surface of the reference's reader/writer
(``spatial/src/spatial/core/geometry/wkt_reader.cpp:26-80``). Parse errors
carry the character position, mirroring the reference's error style.

Number formatting: shortest round-trip (Python ``repr``) with a trailing
``.0`` stripped, so integral coordinates print as ``POINT (1 2)`` — the same
style the reference's ST_AsText produces.
"""

from __future__ import annotations

import re

import numpy as np

from . import geom as G

# nan/inf accepted: the writer emits "nan" for partially-NaN coordinates
# (GEOS writes "NaN" too), so to_wkt output must survive from_wkt
_NUM = re.compile(r"[-+]?(?:nan|inf(?:inity)?|(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)", re.IGNORECASE)
_WORD = re.compile(r"[A-Za-z]+")


class WKTParseError(ValueError):
    pass


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def err(self, msg):
        raise WKTParseError(f"{msg} at position {self.i} in WKT: {self.s[:80]!r}")

    def skip_ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def peek(self):
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def expect(self, ch):
        self.skip_ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            self.err(f"expected {ch!r}")
        self.i += 1

    def word(self):
        self.skip_ws()
        m = _WORD.match(self.s, self.i)
        if not m:
            self.err("expected identifier")
        self.i = m.end()
        return m.group(0).upper()

    def number(self):
        self.skip_ws()
        m = _NUM.match(self.s, self.i)
        if not m:
            self.err("expected number")
        self.i = m.end()
        return float(m.group(0))

    def try_word(self, *words):
        save = self.i
        self.skip_ws()
        m = _WORD.match(self.s, self.i)
        if m and m.group(0).upper() in words:
            self.i = m.end()
            return m.group(0).upper()
        self.i = save
        return None

    # grammar -----------------------------------------------------------
    def coords(self, dim):
        vals = [self.number() for _ in range(2)]
        # Z/M columns: consume up to dim extra numbers
        while len(vals) < dim:
            self.skip_ws()
            if _NUM.match(self.s, self.i):
                vals.append(self.number())
            else:
                break
        if len(vals) != dim:
            self.err(f"expected {dim} coordinates, got {len(vals)}")
        return vals

    def coord_seq(self, dim):
        self.expect("(")
        rows = [self.coords(dim)]
        while self.peek() == ",":
            self.expect(",")
            rows.append(self.coords(dim))
        self.expect(")")
        return np.asarray(rows, dtype=np.float64)

    def rings(self, dim):
        self.expect("(")
        out = [self.coord_seq(dim)]
        while self.peek() == ",":
            self.expect(",")
            out.append(self.coord_seq(dim))
        self.expect(")")
        return out

    def geometry(self):
        name = self.word()
        if name not in G.NAME_TYPES:
            self.err(f"unknown geometry type {name}")
        tag = G.NAME_TYPES[name]
        zm = self.try_word("Z", "M", "ZM", "EMPTY")
        has_z = zm in ("Z", "ZM")
        has_m = zm in ("M", "ZM")
        if zm == "EMPTY":
            return G.empty(tag)
        if self.try_word("EMPTY"):
            return G.empty(tag, has_z, has_m)
        dim = 2 + has_z + has_m
        if tag == G.POINT:
            self.expect("(")
            vals = self.coords(dim)
            self.expect(")")
            arr = np.asarray(vals, dtype=np.float64)
            return G.Geometry(G.POINT, arr, has_z, has_m)
        if tag == G.LINESTRING:
            return G.Geometry(G.LINESTRING, self.coord_seq(dim), has_z, has_m)
        if tag == G.POLYGON:
            return G.Geometry(G.POLYGON, self.rings(dim), has_z, has_m)
        if tag == G.MULTIPOINT:
            # both MULTIPOINT(0 0, 1 1) and MULTIPOINT((0 0), (1 1)) are
            # legal; EMPTY is accepted as a member (wkt_reader.cpp accepts
            # empty children in multi-geometries)
            self.expect("(")
            pts = []
            while True:
                if self.try_word("EMPTY"):
                    pts.append(G.empty(G.POINT, has_z, has_m))
                elif self.peek() == "(":
                    self.expect("(")
                    vals = self.coords(dim)
                    self.expect(")")
                    pts.append(G.Geometry(G.POINT, np.asarray(vals), has_z, has_m))
                else:
                    vals = self.coords(dim)
                    pts.append(G.Geometry(G.POINT, np.asarray(vals), has_z, has_m))
                if self.peek() != ",":
                    break
                self.expect(",")
            self.expect(")")
            return G.Geometry(G.MULTIPOINT, pts, has_z, has_m)
        if tag == G.MULTILINESTRING:
            self.expect("(")
            lines = []
            while True:
                if self.try_word("EMPTY"):
                    lines.append(G.empty(G.LINESTRING, has_z, has_m))
                else:
                    lines.append(G.Geometry(G.LINESTRING, self.coord_seq(dim), has_z, has_m))
                if self.peek() != ",":
                    break
                self.expect(",")
            self.expect(")")
            return G.Geometry(G.MULTILINESTRING, lines, has_z, has_m)
        if tag == G.MULTIPOLYGON:
            self.expect("(")
            polys = []
            while True:
                if self.try_word("EMPTY"):
                    polys.append(G.empty(G.POLYGON, has_z, has_m))
                else:
                    polys.append(G.Geometry(G.POLYGON, self.rings(dim), has_z, has_m))
                if self.peek() != ",":
                    break
                self.expect(",")
            self.expect(")")
            return G.Geometry(G.MULTIPOLYGON, polys, has_z, has_m)
        # GEOMETRYCOLLECTION
        self.expect("(")
        children = [self.geometry()]
        while self.peek() == ",":
            self.expect(",")
            children.append(self.geometry())
        self.expect(")")
        if zm in ("Z", "M", "ZM"):
            # a declared dimension must match every child (the reference's
            # wkt reader errors on GEOMETRYCOLLECTION ZM (POINT Z ...))
            for c in children:
                if (c.has_z, c.has_m) != (has_z, has_m):
                    self.err(
                        f"GEOMETRYCOLLECTION {zm} child has mismatched dimensions"
                    )
            return G.Geometry(G.GEOMETRYCOLLECTION, children, has_z, has_m)
        hz = any(c.has_z for c in children)
        hm = any(c.has_m for c in children)
        return G.Geometry(G.GEOMETRYCOLLECTION, children, hz, hm)


_SRID_PREFIX = re.compile(r"^\s*SRID\s*=\s*\d+\s*;", re.IGNORECASE)


def from_wkt(s: str) -> G.Geometry:
    # EWKT: accept and drop a leading "SRID=n;" (the reference's reader
    # does the same; test/sql/geometry/st_geomfromtext.test)
    s = _SRID_PREFIX.sub("", s, count=1)
    p = _Parser(s)
    g = p.geometry()
    p.skip_ws()
    if p.i != len(p.s):
        p.err("trailing characters")
    return g


# ---------------------------------------------------------------- writer
def _fmt(v: float) -> str:
    if v != v:  # nan
        return "nan"
    r = repr(float(v))
    if r.endswith(".0"):
        r = r[:-2]
    return r


def _fmt_coords(row) -> str:
    return " ".join(_fmt(v) for v in row)


def _zm_suffix(g: G.Geometry) -> str:
    if g.has_z and g.has_m:
        return " ZM"
    if g.has_z:
        return " Z"
    if g.has_m:
        return " M"
    return ""


def _seq(arr) -> str:
    return "(" + ", ".join(_fmt_coords(row) for row in arr) + ")"


def _body(g: G.Geometry) -> str:
    # multi/collection emptiness is STRUCTURAL: a MULTIPOINT holding one
    # empty point renders "MULTIPOINT (EMPTY)" (reference st_multi.test),
    # while a memberless MULTIPOINT renders "MULTIPOINT EMPTY"
    if g.tag in (G.MULTIPOINT, G.MULTILINESTRING, G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        if not g.data:
            return "EMPTY"
    elif g.is_empty():
        return "EMPTY"
    if g.tag == G.POINT:
        return "(" + _fmt_coords(g.data) + ")"
    if g.tag == G.LINESTRING:
        return _seq(g.data)
    if g.tag == G.POLYGON:
        return "(" + ", ".join(_seq(r) for r in g.data) + ")"
    if g.tag == G.MULTIPOINT:
        return "(" + ", ".join(
            "EMPTY" if c.is_empty() else _fmt_coords(c.data) for c in g.data) + ")"
    if g.tag == G.MULTILINESTRING:
        return "(" + ", ".join(
            "EMPTY" if c.is_empty() else _seq(c.data) for c in g.data) + ")"
    if g.tag == G.MULTIPOLYGON:
        return "(" + ", ".join(
            "EMPTY" if c.is_empty() else "(" + ", ".join(_seq(r) for r in c.data) + ")"
            for c in g.data) + ")"
    return "(" + ", ".join(to_wkt(c) for c in g.data) + ")"


def to_wkt(g: G.Geometry) -> str:
    return g.type_name + _zm_suffix(g) + " " + _body(g)
