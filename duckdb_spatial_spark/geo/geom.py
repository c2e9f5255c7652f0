"""In-memory geometry model for the PySpark spatial engine.

Design follows the reference's two-tier model (duckdb_spatial
``spatial/include/spatial/core/geometry/geometry.hpp:19-120``): a tagged
recursive structure with POINT/LINESTRING/POLYGON/MULTI*/COLLECTION subtypes
and Z/M carried as *flags*, not separate types
(``geometry_type.hpp:11-19``, ``geometry_properties.hpp:10-63``).

Coordinate sequences are numpy ``float64`` arrays of shape ``(n, dim)`` where
``dim = 2 + has_z + has_m`` — the columnar layout the reference calls out in
docs/internals.md ("Multi-tiered Geometry Type System"). All heavy math in
:mod:`.algorithms` vectorizes over these arrays.

No code is copied from the reference; this is an independent implementation
of the OGC Simple Features model.
"""

from __future__ import annotations

import numpy as np

# geometry type tags (match WKB type codes 1-7)
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "POINT",
    LINESTRING: "LINESTRING",
    POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT",
    MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
    GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}
NAME_TYPES = {v: k for k, v in TYPE_NAMES.items()}

_MULTI_FOR = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING, POLYGON: MULTIPOLYGON}


class Geometry:
    """Tagged geometry value.

    ``data`` layout by ``tag``:
      POINT              -> ``np.ndarray (dim,)`` or ``None`` (EMPTY)
      LINESTRING         -> ``np.ndarray (n, dim)`` (n == 0 for EMPTY)
      POLYGON            -> ``list[np.ndarray (n, dim)]`` rings, shell first
      MULTI*/COLLECTION  -> ``list[Geometry]``
    """

    __slots__ = ("tag", "data", "has_z", "has_m")

    def __init__(self, tag: int, data, has_z: bool = False, has_m: bool = False):
        self.tag = tag
        self.data = data
        self.has_z = bool(has_z)
        self.has_m = bool(has_m)

    # ------------------------------------------------------------- structure
    @property
    def dim(self) -> int:
        return 2 + self.has_z + self.has_m

    @property
    def type_name(self) -> str:
        return TYPE_NAMES[self.tag]

    def is_empty(self) -> bool:
        if self.tag == POINT:
            return self.data is None
        if self.tag == LINESTRING:
            return len(self.data) == 0
        if self.tag == POLYGON:
            return len(self.data) == 0
        return all(g.is_empty() for g in self.data) if self.data else True

    def geometries(self):
        """Immediate children for multi/collection; [] otherwise."""
        if self.tag in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            return self.data
        return []

    def flatten(self):
        """Yield all non-collection leaf geometries (POINT/LINESTRING/POLYGON)."""
        if self.tag in (POINT, LINESTRING, POLYGON):
            if not self.is_empty():
                yield self
        else:
            for g in self.data:
                yield from g.flatten()

    def num_points(self) -> int:
        if self.tag == POINT:
            return 0 if self.data is None else 1
        if self.tag == LINESTRING:
            return len(self.data)
        if self.tag == POLYGON:
            return sum(len(r) for r in self.data)
        return sum(g.num_points() for g in self.data)

    def coord_arrays(self):
        """Yield every coordinate ndarray (n, dim) in the geometry."""
        if self.tag == POINT:
            if self.data is not None:
                yield self.data.reshape(1, -1)
        elif self.tag == LINESTRING:
            if len(self.data):
                yield self.data
        elif self.tag == POLYGON:
            yield from self.data
        else:
            for g in self.data:
                yield from g.coord_arrays()

    def map_coords(self, fn) -> "Geometry":
        """Structure-preserving transform: fn(ndarray (n, dim)) -> ndarray (n, d2)."""
        if self.tag == POINT:
            if self.data is None:
                return Geometry(POINT, None, self.has_z, self.has_m)
            out = fn(self.data.reshape(1, -1))[0]
            return Geometry(POINT, out, self.has_z, self.has_m)
        if self.tag == LINESTRING:
            arr = fn(self.data) if len(self.data) else self.data
            return Geometry(LINESTRING, arr, self.has_z, self.has_m)
        if self.tag == POLYGON:
            return Geometry(POLYGON, [fn(r) for r in self.data], self.has_z, self.has_m)
        return Geometry(self.tag, [g.map_coords(fn) for g in self.data], self.has_z, self.has_m)

    # ---------------------------------------------------------------- dunder
    def __eq__(self, other):
        if not isinstance(other, Geometry):
            return NotImplemented
        if (self.tag, self.has_z, self.has_m) != (other.tag, other.has_z, other.has_m):
            return False
        if self.tag == POINT:
            if self.data is None or other.data is None:
                return self.data is None and other.data is None
            return bool(np.array_equal(self.data, other.data))
        if self.tag == LINESTRING:
            return bool(np.array_equal(self.data, other.data))
        if self.tag == POLYGON:
            return len(self.data) == len(other.data) and all(
                np.array_equal(a, b) for a, b in zip(self.data, other.data)
            )
        return self.data == other.data

    def __repr__(self):
        from .wkt import to_wkt

        return f"<Geometry {to_wkt(self)}>"


# ------------------------------------------------------------- constructors
def point(x: float, y: float, z=None, m=None) -> Geometry:
    coords = [x, y]
    if z is not None:
        coords.append(z)
    if m is not None:
        coords.append(m)
    return Geometry(POINT, np.asarray(coords, dtype=np.float64),
                    has_z=z is not None, has_m=m is not None)


def empty(tag: int = GEOMETRYCOLLECTION, has_z=False, has_m=False) -> Geometry:
    if tag == POINT:
        return Geometry(POINT, None, has_z, has_m)
    if tag == LINESTRING:
        return Geometry(LINESTRING, np.empty((0, 2 + has_z + has_m)), has_z, has_m)
    if tag == POLYGON:
        return Geometry(POLYGON, [], has_z, has_m)
    return Geometry(tag, [], has_z, has_m)


def linestring(coords) -> Geometry:
    arr = np.asarray(coords, dtype=np.float64)
    if arr.size == 0:
        return empty(LINESTRING)
    return Geometry(LINESTRING, arr, has_z=arr.shape[1] >= 3, has_m=arr.shape[1] >= 4)


def polygon(rings) -> Geometry:
    arrs = [np.asarray(r, dtype=np.float64) for r in rings]
    if not arrs:
        return empty(POLYGON)
    d = arrs[0].shape[1]
    return Geometry(POLYGON, arrs, has_z=d >= 3, has_m=d >= 4)


def box_polygon(min_x: float, min_y: float, max_x: float, max_y: float) -> Geometry:
    """Axis-aligned box as a CCW polygon (reference ST_MakeEnvelope,
    ``spatial/src/spatial/core/functions/scalar/st_makeenvelope.cpp``)."""
    ring = np.array(
        [[min_x, min_y], [max_x, min_y], [max_x, max_y], [min_x, max_y], [min_x, min_y]],
        dtype=np.float64,
    )
    return Geometry(POLYGON, [ring])


def collect(geoms, force_collection: bool = False) -> Geometry:
    """ST_Collect semantics (reference ``st_collect.cpp:135-138``): pick the
    narrowest multi-type if all children share a tag, else a collection.
    Empty input -> GEOMETRYCOLLECTION EMPTY; NULLs are skipped by callers."""
    geoms = [g for g in geoms if g is not None]
    if not geoms:
        return empty(GEOMETRYCOLLECTION)
    has_z = any(g.has_z for g in geoms)
    has_m = any(g.has_m for g in geoms)
    tags = {g.tag for g in geoms}
    if not force_collection and len(tags) == 1:
        t = tags.pop()
        if t in _MULTI_FOR:
            return Geometry(_MULTI_FOR[t], list(geoms), has_z, has_m)
    return Geometry(GEOMETRYCOLLECTION, list(geoms), has_z, has_m)


def multi(geom: Geometry) -> Geometry:
    """ST_Multi: promote single geometry to its MULTI* wrapper."""
    if geom.tag in _MULTI_FOR:
        return Geometry(_MULTI_FOR[geom.tag], [geom], geom.has_z, geom.has_m)
    return geom
