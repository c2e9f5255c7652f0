"""Geometry algorithms (pure numpy) — the engine's GEOS replacement.

The reference delegates these to vendored libgeos (see SURVEY.md §2.3,
``spatial/src/spatial/geos/*``); this container has no GEOS/shapely, so the
kernels are implemented from first principles against the OGC Simple
Features semantics the reference's tests pin down
(``/root/reference/test/sql/geometry/*.test``, ``test/sql/geos/*.test``).

Numeric conventions:
  * planar math in float64; ray-casting point-in-polygon with explicit
    boundary detection (the reference's native ST_Contains uses a winding
    test, ``spatial/src/spatial/core/functions/scalar/st_contains.cpp:30-150``)
  * overlay (intersection/union/difference): convex second operands take
    the half-plane clipping fast path here; the general concave×concave
    case is handled by triangle decomposition + dissolve in overlay.py
    (see ``geo/overlay.py`` docstring for the decomposition invariants).
"""

from __future__ import annotations

import math

import numpy as np

from . import geom as G
from .geom import Geometry

# ---------------------------------------------------------------------------
# bounds / measures
# ---------------------------------------------------------------------------

def bounds(g: Geometry):
    """(min_x, min_y, max_x, max_y) or None for EMPTY."""
    mins = None
    maxs = None
    for arr in g.coord_arrays():
        if len(arr) == 0:
            continue
        lo = arr[:, :2].min(axis=0)
        hi = arr[:, :2].max(axis=0)
        mins = lo if mins is None else np.minimum(mins, lo)
        maxs = hi if maxs is None else np.maximum(maxs, hi)
    if mins is None:
        return None
    return (float(mins[0]), float(mins[1]), float(maxs[0]), float(maxs[1]))


def _ring_signed_area(ring: np.ndarray) -> float:
    # shift to the first vertex before the cross products: at coordinate
    # magnitudes ~1e2 a sliver area ~1e-9 loses ~6 digits unshifted
    # (measured against exact rational arithmetic; the shifted form
    # reproduces it to the last ulp)
    x = ring[:, 0] - ring[0, 0]
    y = ring[:, 1] - ring[0, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def area(g: Geometry) -> float:
    """Planar area; holes subtracted; 0 for points/lines; collections recurse
    (reference ``st_area.cpp`` semantics)."""
    if g.tag == G.POLYGON:
        if not g.data:
            return 0.0
        a = abs(_ring_signed_area(g.data[0]))
        for hole in g.data[1:]:
            a -= abs(_ring_signed_area(hole))
        return a
    if g.tag in (G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        return sum(area(c) for c in g.data)
    return 0.0


def _seq_length(arr: np.ndarray) -> float:
    if len(arr) < 2:
        return 0.0
    d = np.diff(arr[:, :2], axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def length(g: Geometry) -> float:
    """Linestring length; 0 for points/polygons; collections recurse
    (reference ``st_length.cpp``)."""
    if g.tag == G.LINESTRING:
        return _seq_length(g.data)
    if g.tag in (G.MULTILINESTRING, G.GEOMETRYCOLLECTION):
        return sum(length(c) for c in g.data)
    return 0.0


def perimeter(g: Geometry) -> float:
    """Sum of polygon ring lengths (reference ``st_perimeter.cpp``)."""
    if g.tag == G.POLYGON:
        return sum(_seq_length(r) for r in g.data)
    if g.tag in (G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        return sum(perimeter(c) for c in g.data)
    return 0.0


def centroid(g: Geometry):
    """(x, y) centroid of the highest-dimension components, or None.

    Area-weighted for polygons, length-weighted for lines, mean for points —
    standard OGC semantics (reference ``st_centroid.cpp``)."""
    leaves = list(g.flatten())
    if not leaves:
        return None
    top = max(2 if l.tag == G.POLYGON else (1 if l.tag == G.LINESTRING else 0) for l in leaves)
    wx = wy = wsum = 0.0
    for l in leaves:
        if top == 2 and l.tag == G.POLYGON:
            for k, ring in enumerate(l.data):
                sa = _ring_signed_area(ring)
                w = abs(sa) if k == 0 else -abs(sa)
                x, y = ring[:, 0], ring[:, 1]
                cross = x[:-1] * y[1:] - x[1:] * y[:-1]
                if sa < 0:
                    cross = -cross
                denom = 6.0 * abs(sa) if sa != 0 else 1.0
                cx = float(((x[:-1] + x[1:]) * cross).sum()) / denom if sa != 0 else float(x.mean())
                cy = float(((y[:-1] + y[1:]) * cross).sum()) / denom if sa != 0 else float(y.mean())
                wx += w * cx
                wy += w * cy
                wsum += w
        elif top == 1 and l.tag == G.LINESTRING:
            arr = l.data
            for i in range(len(arr) - 1):
                p, q = arr[i, :2], arr[i + 1, :2]
                seg = float(np.hypot(*(q - p)))
                wx += seg * (p[0] + q[0]) / 2
                wy += seg * (p[1] + q[1]) / 2
                wsum += seg
        elif top == 0 and l.tag == G.POINT:
            wx += float(l.data[0])
            wy += float(l.data[1])
            wsum += 1.0
    if wsum == 0:
        # degenerate (zero-area polygon / zero-length line): mean of vertices
        allpts = np.vstack([a[:, :2] for a in g.coord_arrays()])
        return (float(allpts[:, 0].mean()), float(allpts[:, 1].mean()))
    return (wx / wsum, wy / wsum)


# ---------------------------------------------------------------------------
# low-level predicates
# ---------------------------------------------------------------------------

def _cross(ox, oy, ax, ay, bx, by):
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def point_on_seq(x: float, y: float, arr: np.ndarray, closed_only=False) -> bool:
    """True if (x,y) lies on any segment of the sequence."""
    if len(arr) < 2:
        return len(arr) == 1 and arr[0, 0] == x and arr[0, 1] == y
    x1, y1 = arr[:-1, 0], arr[:-1, 1]
    x2, y2 = arr[1:, 0], arr[1:, 1]
    cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
    on = (
        (cross == 0)
        & (np.minimum(x1, x2) <= x)
        & (x <= np.maximum(x1, x2))
        & (np.minimum(y1, y2) <= y)
        & (y <= np.maximum(y1, y2))
    )
    return bool(on.any())


def point_in_ring(x: float, y: float, ring: np.ndarray) -> int:
    """2 = strictly inside, 1 = on boundary, 0 = outside (ray casting)."""
    if point_on_seq(x, y, ring):
        return 1
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cond = ((y1 <= y) & (y2 > y)) | ((y2 <= y) & (y1 > y))
    if not cond.any():
        return 0
    xs1, ys1, xs2, ys2 = x1[cond], y1[cond], x2[cond], y2[cond]
    xint = xs1 + (y - ys1) * (xs2 - xs1) / (ys2 - ys1)
    return 2 if (int((xint > x).sum()) % 2) == 1 else 0


def point_in_polygon(x: float, y: float, poly: Geometry) -> int:
    """2 = interior, 1 = boundary, 0 = exterior — holes respected."""
    if not poly.data:
        return 0
    s = point_in_ring(x, y, poly.data[0])
    if s != 2:
        return s
    for hole in poly.data[1:]:
        h = point_in_ring(x, y, hole)
        if h == 2:
            return 0
        if h == 1:
            return 1
    return 2


def _segs(arr: np.ndarray):
    """(n-1, 2, 2) segment array from a coordinate sequence."""
    if len(arr) < 2:
        return np.empty((0, 2, 2))
    pts = arr[:, :2]
    return np.stack([pts[:-1], pts[1:]], axis=1)


def segs_intersect_matrix(A: np.ndarray, B: np.ndarray, proper: bool = False) -> np.ndarray:
    """Boolean (n, m): does segment A[i] intersect B[j]?

    proper=True counts only crossings at interior points of both segments
    (used for touches/crosses interior tests). Vectorized orientation test.
    """
    n, m = len(A), len(B)
    if n == 0 or m == 0:
        return np.zeros((n, m), dtype=bool)
    p1 = A[:, 0][:, None, :]
    p2 = A[:, 1][:, None, :]
    q1 = B[None, :, 0, :]
    q2 = B[None, :, 1, :]

    def orient(o, a, b):
        v = (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
            a[..., 1] - o[..., 1]
        ) * (b[..., 0] - o[..., 0])
        return np.sign(v)

    d1 = orient(p1, p2, q1)
    d2 = orient(p1, p2, q2)
    d3 = orient(q1, q2, p1)
    d4 = orient(q1, q2, p2)
    properx = (d1 * d2 < 0) & (d3 * d4 < 0)
    if proper:
        return properx

    def onseg(o, a, b):  # b collinear with segment (o,a) and within its bbox
        return (
            (np.minimum(o[..., 0], a[..., 0]) <= b[..., 0])
            & (b[..., 0] <= np.maximum(o[..., 0], a[..., 0]))
            & (np.minimum(o[..., 1], a[..., 1]) <= b[..., 1])
            & (b[..., 1] <= np.maximum(o[..., 1], a[..., 1]))
        )

    touch = (
        ((d1 == 0) & onseg(p1, p2, q1))
        | ((d2 == 0) & onseg(p1, p2, q2))
        | ((d3 == 0) & onseg(q1, q2, p1))
        | ((d4 == 0) & onseg(q1, q2, p2))
    )
    return properx | touch


def _any_seg_intersect(a: Geometry, b: Geometry, proper=False) -> bool:
    for aa in a.coord_arrays():
        A = _segs(aa)
        for bb in b.coord_arrays():
            if segs_intersect_matrix(A, _segs(bb), proper=proper).any():
                return True
    return False


def _bbox_disjoint(a: Geometry, b: Geometry) -> bool:
    ba, bb = bounds(a), bounds(b)
    if ba is None or bb is None:
        return True
    return ba[0] > bb[2] or ba[2] < bb[0] or ba[1] > bb[3] or ba[3] < bb[1]


# ---------------------------------------------------------------------------
# OGC predicates over leaf pairs
# ---------------------------------------------------------------------------

def _leaf_intersects(a: Geometry, b: Geometry) -> bool:
    if a.tag > b.tag:
        a, b = b, a
    if a.tag == G.POINT:
        x, y = float(a.data[0]), float(a.data[1])
        if b.tag == G.POINT:
            return x == float(b.data[0]) and y == float(b.data[1])
        if b.tag == G.LINESTRING:
            return point_on_seq(x, y, b.data)
        return point_in_polygon(x, y, b) > 0
    if a.tag == G.LINESTRING:
        if b.tag == G.LINESTRING:
            return _any_seg_intersect(a, b)
        # line vs polygon: any vertex inside, or any edge crossing
        for v in a.data:
            if point_in_polygon(float(v[0]), float(v[1]), b) > 0:
                return True
        return _any_seg_intersect(a, b)
    # polygon vs polygon
    for v in a.data[0] if a.data else []:
        if point_in_polygon(float(v[0]), float(v[1]), b) > 0:
            return True
    for v in b.data[0] if b.data else []:
        if point_in_polygon(float(v[0]), float(v[1]), a) > 0:
            return True
    return _any_seg_intersect(a, b)


def intersects(a: Geometry, b: Geometry) -> bool:
    if a.is_empty() or b.is_empty() or _bbox_disjoint(a, b):
        return False
    return any(_leaf_intersects(la, lb) for la in a.flatten() for lb in b.flatten())


def disjoint(a: Geometry, b: Geometry) -> bool:
    return not intersects(a, b)


def _poly_widest_interval_at(p: Geometry, y: float):
    xs = []
    for ring in p.data:
        x1, y1 = ring[:-1, 0], ring[:-1, 1]
        x2, y2 = ring[1:, 0], ring[1:, 1]
        cond = ((y1 <= y) & (y2 > y)) | ((y2 <= y) & (y1 > y))
        if cond.any():
            xi = x1[cond] + (y - y1[cond]) * (x2[cond] - x1[cond]) / (y2[cond] - y1[cond])
            xs.extend(xi.tolist())
    xs.sort()
    best = None
    for j in range(0, len(xs) - 1, 2):
        if xs[j + 1] > xs[j]:
            if best is None or (xs[j + 1] - xs[j]) > best[1]:
                best = ((xs[j] + xs[j + 1]) / 2.0, xs[j + 1] - xs[j])
    return (best[0], y) if best else None


def _poly_interior_point(p: Geometry):
    """Representative interior point — GEOS InteriorPointArea convention:
    horizontal bisector at the midpoint of the two vertex ys straddling the
    bbox centre, widest intersection interval's midpoint (the PostGIS-
    pinned answers in test/sql/postgis/st_pointonsurface.test follow this)."""
    if not p.data:
        return None
    ys = np.unique(np.concatenate([r[:, 1] for r in p.data]))
    if len(ys) < 2:
        return None
    centre = (float(ys.min()) + float(ys.max())) / 2.0
    lo_arr = ys[ys <= centre]
    hi_arr = ys[ys > centre]
    candidates = []
    if len(lo_arr) and len(hi_arr):
        candidates.append((float(lo_arr.max()) + float(hi_arr.min())) / 2.0)
    # fallbacks: midpoints of every consecutive distinct-y pair
    candidates.extend((float(ys[i]) + float(ys[i + 1])) / 2.0 for i in range(len(ys) - 1))
    for y in candidates:
        got = _poly_widest_interval_at(p, y)
        if got is not None:
            return got
    return None


def _interiors_intersect(a: Geometry, b: Geometry) -> bool:
    """Do the interiors of a and b share a point? (approximate for lines)"""
    for la in a.flatten():
        for lb in b.flatten():
            x, y = la, lb
            if x.tag > y.tag:
                x, y = y, x
            if x.tag == G.POINT:
                px, py = float(x.data[0]), float(x.data[1])
                if y.tag == G.POINT:
                    if px == float(y.data[0]) and py == float(y.data[1]):
                        return True
                elif y.tag == G.LINESTRING:
                    # interior of line = line minus endpoints
                    if point_on_seq(px, py, y.data) and not (
                        (px, py) == (float(y.data[0, 0]), float(y.data[0, 1]))
                        or (px, py) == (float(y.data[-1, 0]), float(y.data[-1, 1]))
                    ):
                        return True
                else:
                    if point_in_polygon(px, py, y) == 2:
                        return True
            elif x.tag == G.LINESTRING:
                if y.tag == G.LINESTRING:
                    if _any_seg_intersect(x, y, proper=True):
                        return True
                    # collinear overlap of positive length: midpoints of one on other
                    mids = (x.data[:-1, :2] + x.data[1:, :2]) / 2
                    for mxy in mids:
                        if point_on_seq(float(mxy[0]), float(mxy[1]), y.data):
                            return True
                else:
                    for v in x.data:
                        if point_in_polygon(float(v[0]), float(v[1]), y) == 2:
                            return True
                    mids = (x.data[:-1, :2] + x.data[1:, :2]) / 2
                    for mxy in mids:
                        if point_in_polygon(float(mxy[0]), float(mxy[1]), y) == 2:
                            return True
                    if _any_seg_intersect(x, Geometry(G.LINESTRING, y.data[0]), proper=True):
                        return True
            else:  # polygon vs polygon
                pa = _poly_interior_point(x)
                if pa and point_in_polygon(pa[0], pa[1], y) == 2:
                    return True
                pb = _poly_interior_point(y)
                if pb and point_in_polygon(pb[0], pb[1], x) == 2:
                    return True
                if _any_seg_intersect(x, y, proper=True):
                    return True
                for v in (x.data[0] if x.data else []):
                    if point_in_polygon(float(v[0]), float(v[1]), y) == 2:
                        return True
                for v in (y.data[0] if y.data else []):
                    if point_in_polygon(float(v[0]), float(v[1]), x) == 2:
                        return True
    return False


def _covers_leaf(a: Geometry, b: Geometry, strict: bool) -> bool:
    """Does leaf a cover leaf b? strict=True -> interior only (contains-properly
    style boundary exclusion for points on a's boundary)."""
    lo = 2 if strict else 1
    if a.tag == G.POINT:
        if b.tag != G.POINT:
            return False
        return float(a.data[0]) == float(b.data[0]) and float(a.data[1]) == float(b.data[1])
    if a.tag == G.LINESTRING:
        if b.tag == G.POINT:
            return point_on_seq(float(b.data[0]), float(b.data[1]), a.data)
        if b.tag == G.LINESTRING:
            # every vertex and midpoint of b lies on a
            pts = np.vstack([b.data[:, :2], (b.data[:-1, :2] + b.data[1:, :2]) / 2])
            return all(point_on_seq(float(p[0]), float(p[1]), a.data) for p in pts)
        return False
    # a is polygon
    if b.tag == G.POINT:
        return point_in_polygon(float(b.data[0]), float(b.data[1]), a) >= lo
    if b.tag == G.LINESTRING:
        for v in b.data:
            if point_in_polygon(float(v[0]), float(v[1]), a) < lo:
                return False
        if _any_seg_intersect(b, a, proper=True):
            return False
        mids = (b.data[:-1, :2] + b.data[1:, :2]) / 2
        return all(point_in_polygon(float(p[0]), float(p[1]), a) >= lo for p in mids)
    # polygon covers polygon
    for ring in b.data:
        for v in ring:
            if point_in_polygon(float(v[0]), float(v[1]), a) < lo:
                return False
    if _any_seg_intersect(b, a, proper=True):
        return False
    ip = _poly_interior_point(b)
    if ip is not None and point_in_polygon(ip[0], ip[1], a) == 0:
        return False
    # b must not wrap around a hole of a: a hole interior point inside b => fail
    for hole in a.data[1:]:
        hp = _poly_interior_point(Geometry(G.POLYGON, [hole]))
        if hp is not None and point_in_polygon(hp[0], hp[1], b) == 2:
            return False
    return True


def covers(a: Geometry, b: Geometry, strict: bool = False) -> bool:
    if a.is_empty() or b.is_empty():
        return False
    for lb in b.flatten():
        if not any(_covers_leaf(la, lb, strict) for la in a.flatten()):
            # a multipolygon may cover b jointly; fall back to sampled check
            if not _multi_covers(a, lb, strict):
                return False
    return True


def _multi_covers(a: Geometry, lb: Geometry, strict: bool) -> bool:
    polys = [l for l in a.flatten() if l.tag == G.POLYGON]
    if not polys:
        return False
    lo = 2 if strict else 1

    def covered_pt(x, y):
        return any(point_in_polygon(x, y, p) >= lo for p in polys)

    if lb.tag == G.POINT:
        return covered_pt(float(lb.data[0]), float(lb.data[1]))
    pts = np.vstack([arr[:, :2] for arr in lb.coord_arrays()])
    mids = []
    for arr in lb.coord_arrays():
        if len(arr) > 1:
            mids.append((arr[:-1, :2] + arr[1:, :2]) / 2)
    if mids:
        pts = np.vstack([pts] + mids)
    return all(covered_pt(float(p[0]), float(p[1])) for p in pts)


def contains(a: Geometry, b: Geometry) -> bool:
    """OGC contains: covers + interiors intersect (so a point on the boundary
    only is NOT contained — matches GEOS/PostGIS and the reference)."""
    if not covers(a, b, strict=False):
        return False
    return _interiors_intersect(a, b)


def contains_properly(a: Geometry, b: Geometry) -> bool:
    return covers(a, b, strict=True)


def within(a: Geometry, b: Geometry) -> bool:
    return contains(b, a)


def covered_by(a: Geometry, b: Geometry) -> bool:
    return covers(b, a)


def crosses(a: Geometry, b: Geometry) -> bool:
    """OGC crosses via the exact DE-9IM matrix (``geo/relate.py``):
    dim(Int∩Int) below both operands' max dim, with an interior escape on
    the lower-dimensional side."""
    if a.is_empty() or b.is_empty() or _bbox_disjoint(a, b):
        return False
    from .relate import im_crosses, relate9

    return im_crosses(relate9(a, b), _dimension(a), _dimension(b))


def _collinear_overlap_len(a: Geometry, b: Geometry) -> float:
    """Total length of collinear segment overlap between two geometries."""
    total = 0.0
    for aa in a.coord_arrays():
        for i in range(len(aa) - 1):
            p, q = aa[i, :2], aa[i + 1, :2]
            d = q - p
            L2 = float(d[0] * d[0] + d[1] * d[1])
            if L2 == 0:
                continue
            for bb in b.coord_arrays():
                for j in range(len(bb) - 1):
                    r, s = bb[j, :2], bb[j + 1, :2]
                    if (
                        _cross(p[0], p[1], q[0], q[1], r[0], r[1]) != 0
                        or _cross(p[0], p[1], q[0], q[1], s[0], s[1]) != 0
                    ):
                        continue
                    t0 = float((r - p) @ d) / L2
                    t1 = float((s - p) @ d) / L2
                    lo, hi = max(0.0, min(t0, t1)), min(1.0, max(t0, t1))
                    if hi > lo:
                        total += (hi - lo) * math.sqrt(L2)
    return total


def overlaps(a: Geometry, b: Geometry) -> bool:
    """OGC overlaps via the exact DE-9IM matrix: same dimension, interiors
    share that dimension (for lines: positive-length, not a point-cross),
    and each interior escapes the other."""
    if a.is_empty() or b.is_empty() or _bbox_disjoint(a, b):
        return False
    da, db = _dimension(a), _dimension(b)
    if da != db:
        return False
    from .relate import im_overlaps, relate9

    return im_overlaps(relate9(a, b), da, db)


def touches(a: Geometry, b: Geometry) -> bool:
    """OGC touches via the exact DE-9IM matrix: they intersect but the
    interiors never meet (noded-piece classification — no sampling)."""
    if not intersects(a, b):
        return False
    from .relate import im_touches, relate9

    return im_touches(relate9(a, b))


def equals(a: Geometry, b: Geometry) -> bool:
    """Set equality: normalization fast path, then the exact DE-9IM
    pattern T*F**FFF* (interiors meet; nothing of either side falls in
    the other's exterior)."""
    from .wkb import to_wkb

    if a.is_empty() and b.is_empty():
        return True
    if a.is_empty() or b.is_empty() or _bbox_disjoint(a, b):
        return False
    na, nb = normalize(a), normalize(b)
    if to_wkb(na) == to_wkb(nb):
        return True
    from .relate import im_equals, relate9

    return im_equals(relate9(a, b))


def _dimension(g: Geometry) -> int:
    dims = [2 if l.tag == G.POLYGON else (1 if l.tag == G.LINESTRING else 0) for l in g.flatten()]
    return max(dims) if dims else 0


def dimension(g: Geometry) -> int:
    """ST_Dimension: topological dimension BY TYPE — an empty LINESTRING is
    still dimension 1 (reference st_dimension.test); collections take the
    max over children (empty collection -> 0). `_dimension` (content-based)
    stays as the DE-9IM helper."""
    if g.tag in (G.POLYGON, G.MULTIPOLYGON):
        return 2
    if g.tag in (G.LINESTRING, G.MULTILINESTRING):
        return 1
    if g.tag in (G.POINT, G.MULTIPOINT):
        return 0
    return max((dimension(c) for c in g.data), default=0)


# ---------------------------------------------------------------------------
# distance
# ---------------------------------------------------------------------------

def _pt_seg_dist(px, py, x1, y1, x2, y2):
    dx, dy = x2 - x1, y2 - y1
    denom = dx * dx + dy * dy
    if denom == 0:
        return math.hypot(px - x1, py - y1), (x1, y1)
    t = max(0.0, min(1.0, ((px - x1) * dx + (py - y1) * dy) / denom))
    cx, cy = x1 + t * dx, y1 + t * dy
    return math.hypot(px - cx, py - cy), (cx, cy)


def _pt_seq_dist(px, py, arr):
    if len(arr) == 1:
        return math.hypot(px - arr[0, 0], py - arr[0, 1]), (float(arr[0, 0]), float(arr[0, 1]))
    x1, y1 = arr[:-1, 0], arr[:-1, 1]
    x2, y2 = arr[1:, 0], arr[1:, 1]
    dx, dy = x2 - x1, y2 - y1
    denom = dx * dx + dy * dy
    denom = np.where(denom == 0, 1.0, denom)
    t = np.clip(((px - x1) * dx + (py - y1) * dy) / denom, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    d = np.hypot(px - cx, py - cy)
    i = int(np.argmin(d))
    return float(d[i]), (float(cx[i]), float(cy[i]))


def distance(a: Geometry, b: Geometry, with_points: bool = False):
    """Min euclidean distance; 0 when intersecting. Optionally returns the
    closest point pair (for ST_ShortestLine)."""
    if a.is_empty() or b.is_empty():
        return (None, None, None) if with_points else None
    if intersects(a, b):
        # find a shared point for shortest_line: any vertex of a inside b, else seg isect
        if with_points:
            for la in a.flatten():
                for arr in la.coord_arrays():
                    for v in arr:
                        x, y = float(v[0]), float(v[1])
                        vg = G.point(x, y)
                        if intersects(vg, b):
                            return 0.0, (x, y), (x, y)
            bb = bounds(a)
            return 0.0, (bb[0], bb[1]), (bb[0], bb[1])
        return 0.0
    best = math.inf
    pa = pb = None
    a_arrs = list(a.coord_arrays())
    b_arrs = list(b.coord_arrays())
    for aa in a_arrs:
        for bb in b_arrs:
            # vertex-to-sequence both directions (sufficient for disjoint shapes)
            for v in aa:
                d, c = _pt_seq_dist(float(v[0]), float(v[1]), bb)
                if d < best:
                    best, pa, pb = d, (float(v[0]), float(v[1])), c
            for v in bb:
                d, c = _pt_seq_dist(float(v[0]), float(v[1]), aa)
                if d < best:
                    best, pa, pb = d, c, (float(v[0]), float(v[1]))
    if with_points:
        return best, pa, pb
    return best


def dwithin(a: Geometry, b: Geometry, dist: float) -> bool:
    d = distance(a, b)
    return d is not None and d <= dist


def shortest_line(a: Geometry, b: Geometry):
    d, pa, pb = distance(a, b, with_points=True)
    if d is None:
        return None
    return G.linestring([[pa[0], pa[1]], [pb[0], pb[1]]])


# ---------------------------------------------------------------------------
# constructive ops
# ---------------------------------------------------------------------------

def envelope(g: Geometry) -> Geometry:
    b = bounds(g)
    if b is None:
        return G.empty(G.POLYGON)
    if b[0] == b[2] and b[1] == b[3]:
        return G.point(b[0], b[1])
    return G.box_polygon(*b)


def convex_hull(g: Geometry) -> Geometry:
    """Andrew's monotone chain."""
    arrs = [a[:, :2] for a in g.coord_arrays()]
    if not arrs:
        return G.empty(G.GEOMETRYCOLLECTION)
    pts = np.unique(np.vstack(arrs), axis=0)
    if len(pts) == 1:
        return G.point(pts[0, 0], pts[0, 1])
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]
    if len(pts) == 2:
        return G.linestring(pts)

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and _cross(out[-2][0], out[-2][1], out[-1][0], out[-1][1], p[0], p[1]) <= 0:
                out.pop()
            out.append((float(p[0]), float(p[1])))
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    ring = lower[:-1] + upper[:-1]
    if len(ring) < 3:
        return G.linestring(np.asarray([ring[0], ring[-1]]))
    ring.append(ring[0])
    return G.polygon([np.asarray(ring)])


def simplify(g: Geometry, tol: float, preserve_topology: bool = False) -> Geometry:
    """Douglas–Peucker per coordinate sequence; rings keep >= 4 points when
    preserve_topology is set."""

    def dp(arr: np.ndarray) -> np.ndarray:
        n = len(arr)
        if n < 3:
            return arr
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True
        stack = [(0, n - 1)]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            seg = arr[[i, j], :2]
            dmax, imax = -1.0, -1
            for k in range(i + 1, j):
                d, _ = _pt_seg_dist(float(arr[k, 0]), float(arr[k, 1]),
                                    seg[0, 0], seg[0, 1], seg[1, 0], seg[1, 1])
                if d > dmax:
                    dmax, imax = d, k
            if dmax > tol:
                keep[imax] = True
                stack.append((i, imax))
                stack.append((imax, j))
        return arr[keep]

    def simp_ring(ring: np.ndarray) -> np.ndarray:
        out = dp(ring)
        if preserve_topology and len(out) < 4:
            return ring
        return out

    if g.tag == G.LINESTRING:
        return Geometry(G.LINESTRING, dp(g.data) if len(g.data) else g.data, g.has_z, g.has_m)
    if g.tag == G.POLYGON:
        rings = [simp_ring(r) for r in g.data]
        rings = [r for r in rings if len(r) >= 4]
        return Geometry(G.POLYGON, rings, g.has_z, g.has_m)
    if g.tag in (G.MULTILINESTRING, G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        return Geometry(g.tag, [simplify(c, tol, preserve_topology) for c in g.data], g.has_z, g.has_m)
    return g


def reduce_precision(g: Geometry, grid: float) -> Geometry:
    if grid <= 0:
        return g
    return g.map_coords(lambda a: np.round(a / grid) * grid)


def remove_repeated_points(g: Geometry, tol: float = 0.0) -> Geometry:
    def dedupe(arr: np.ndarray) -> np.ndarray:
        if len(arr) < 2:
            return arr
        if tol <= 0.0:
            d = np.sqrt(((np.diff(arr[:, :2], axis=0)) ** 2).sum(axis=1))
            keep = np.concatenate([[True], d > tol])
            out = arr[keep]
            if len(out) == 1 and len(arr) > 1:
                out = arr[[0, -1]]
            return out
        # tolerance variant mirrors the reference exactly
        # (st_removerepeatedpoints.cpp tolerance path): greedy keep when the
        # squared distance from the LAST KEPT point exceeds tol^2, counting
        # over all vertices; then re-emit middles with the same rule and
        # force the final kept slot to the input's last vertex.
        n = len(arr)
        if n < 3:
            return arr
        t2 = tol * tol

        def d2(i, last):
            dx = arr[i, 0] - last[0]
            dy = arr[i, 1] - last[1]
            return dx * dx + dy * dy

        keep_n = 1
        last = (arr[0, 0], arr[0, 1])
        for i in range(1, n):
            if d2(i, last) > t2:
                keep_n += 1
                last = (arr[i, 0], arr[i, 1])
        if keep_n == 1:
            return arr[[0, -1]]
        idx = [0]
        last = (arr[0, 0], arr[0, 1])
        for i in range(1, n - 1):
            if d2(i, last) > t2:
                idx.append(i)
                last = (arr[i, 0], arr[i, 1])
        idx = idx[:keep_n]
        while len(idx) < keep_n:
            idx.append(n - 1)
        idx[keep_n - 1] = n - 1
        return arr[idx]

    if g.tag == G.POINT:
        return g
    return g.map_coords(dedupe)


def flip_coordinates(g: Geometry) -> Geometry:
    def flip(a):
        out = a.copy()
        out[:, [0, 1]] = out[:, [1, 0]]
        return out

    return g.map_coords(flip)


def reverse(g: Geometry) -> Geometry:
    if g.tag == G.POINT:
        return g
    if g.tag == G.LINESTRING:
        return Geometry(G.LINESTRING, g.data[::-1].copy(), g.has_z, g.has_m)
    if g.tag == G.POLYGON:
        return Geometry(G.POLYGON, [r[::-1].copy() for r in g.data], g.has_z, g.has_m)
    return Geometry(g.tag, [reverse(c) for c in g.data], g.has_z, g.has_m)


def force_dims(g: Geometry, has_z: bool, has_m: bool, z_default=0.0, m_default=0.0) -> Geometry:
    """ST_Force2D/3DZ/3DM/4D (reference ``st_force.cpp``)."""
    src_z, src_m = g.has_z, g.has_m

    def conv(a: np.ndarray) -> np.ndarray:
        n = len(a)
        cols = [a[:, 0], a[:, 1]]
        if has_z:
            cols.append(a[:, 2] if src_z else np.full(n, z_default))
        if has_m:
            midx = 2 + (1 if src_z else 0)
            cols.append(a[:, midx] if src_m else np.full(n, m_default))
        return np.column_stack(cols)

    out = g.map_coords(conv)

    def retag(x: Geometry) -> Geometry:
        x.has_z, x.has_m = has_z, has_m
        for c in x.geometries():
            retag(c)
        return x

    return retag(out)


def boundary(g: Geometry) -> Geometry:
    if g.tag == G.GEOMETRYCOLLECTION:
        # the reference returns NULL for geometry collections
        # (duckdb_spatial issue 204, pinned by st_disjoint.test)
        return None
    if g.tag == G.POINT or g.tag == G.MULTIPOINT:
        return G.empty(G.GEOMETRYCOLLECTION)
    if g.tag == G.LINESTRING:
        if g.is_empty() or bool(np.array_equal(g.data[0], g.data[-1])):
            return G.empty(G.MULTIPOINT)
        return G.Geometry(G.MULTIPOINT,
                          [G.point(*g.data[0, :2]), G.point(*g.data[-1, :2])])
    if g.tag == G.POLYGON:
        lines = [Geometry(G.LINESTRING, r.copy()) for r in g.data]
        if len(lines) == 1:
            return lines[0]
        return Geometry(G.MULTILINESTRING, lines)
    parts = [boundary(c) for c in g.data]
    parts = [p for p in parts if not p.is_empty()]
    flat = []
    for p in parts:
        flat.extend(p.flatten())
    if g.tag == G.MULTILINESTRING:
        # SFS mod-2 rule (GEOS BoundaryOp): an endpoint shared by an even
        # number of component curves is interior, not boundary.
        from collections import Counter

        counts = Counter((float(pt.data[0]), float(pt.data[1])) for pt in flat)
        flat = [
            pt
            for pt in flat
            if counts[(float(pt.data[0]), float(pt.data[1]))] % 2 == 1
        ]
        seen = set()
        uniq = []
        for pt in flat:
            key = (float(pt.data[0]), float(pt.data[1]))
            if key not in seen:
                seen.add(key)
                uniq.append(pt)
        if not uniq:
            return G.empty(G.MULTIPOINT)
        return G.Geometry(G.MULTIPOINT, uniq)
    return G.collect(flat)


def point_on_surface(g: Geometry) -> Geometry:
    leaves = list(g.flatten())
    if not leaves:
        return G.empty(G.POINT)
    top = max(leaves, key=lambda l: (2 if l.tag == G.POLYGON else (1 if l.tag == G.LINESTRING else 0)))
    if top.tag == G.POLYGON:
        p = _poly_interior_point(top)
        if p is not None:
            return G.point(p[0], p[1])
        return G.point(float(top.data[0][0, 0]), float(top.data[0][0, 1]))
    if top.tag == G.LINESTRING:
        # GEOS InteriorPointLine: vertex closest to the centroid, first wins
        c = centroid(top)
        d = np.hypot(top.data[:, 0] - c[0], top.data[:, 1] - c[1])
        mid = top.data[int(np.argmin(d))]
        return G.point(float(mid[0]), float(mid[1]))
    return G.point(float(top.data[0]), float(top.data[1]))


def is_closed(g: Geometry) -> bool:
    if g.tag == G.LINESTRING:
        return len(g.data) > 0 and bool(np.array_equal(g.data[0], g.data[-1]))
    if g.tag == G.MULTILINESTRING:
        return all(is_closed(c) for c in g.data) and len(g.data) > 0
    return True  # points/polygons are closed by definition


def is_ring(g: Geometry) -> bool:
    return g.tag == G.LINESTRING and is_closed(g) and is_simple(g)


def is_simple(g: Geometry) -> bool:
    if g.tag == G.LINESTRING:
        segs = _segs(g.data)
        n = len(segs)
        closed = is_closed(g)
        for i in range(n):
            for j in range(i + 1, n):
                if j == i + 1 or (closed and i == 0 and j == n - 1):
                    # adjacent segments share one endpoint; proper crossing still bad
                    if segs_intersect_matrix(segs[i: i + 1], segs[j: j + 1], proper=True).any():
                        return False
                    continue
                if segs_intersect_matrix(segs[i: i + 1], segs[j: j + 1]).any():
                    return False
        return True
    if g.tag == G.MULTIPOINT:
        seen = set()
        for c in g.data:
            key = (float(c.data[0]), float(c.data[1]))
            if key in seen:
                return False
            seen.add(key)
        return True
    if g.tag in (G.MULTILINESTRING, G.GEOMETRYCOLLECTION):
        return all(is_simple(c) for c in g.data)
    return True


def _ring_self_intersections(ring: np.ndarray):
    """Proper self-intersection points of a closed ring."""
    segs = _segs(ring)
    n = len(segs)
    pts = []
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if segs_intersect_matrix(segs[i: i + 1], segs[j: j + 1], proper=True).any():
                # compute intersection point
                p, p2 = segs[i]
                q, q2 = segs[j]
                r = p2 - p
                s = q2 - q
                denom = r[0] * s[1] - r[1] * s[0]
                if denom != 0:
                    t = ((q[0] - p[0]) * s[1] - (q[1] - p[1]) * s[0]) / denom
                    pts.append((i, j, p + t * r))
    return pts


def is_valid(g: Geometry) -> bool:
    if g.tag == G.POLYGON:
        for ring in g.data:
            if len(ring) < 4 or not np.array_equal(ring[0], ring[-1]):
                return False
            if abs(_ring_signed_area(ring)) == 0:
                return False
            if _ring_self_intersections(ring):
                return False
        # holes inside shell, not crossing
        for hole in g.data[1:]:
            for v in hole:
                if point_in_ring(float(v[0]), float(v[1]), g.data[0]) == 0:
                    return False
        return True
    if g.tag in (G.MULTIPOLYGON, G.GEOMETRYCOLLECTION, G.MULTILINESTRING, G.MULTIPOINT):
        return all(is_valid(c) for c in g.data)
    if g.tag == G.LINESTRING:
        return len(g.data) != 1
    return True


def _node_ring(ring: np.ndarray) -> list:
    """Ring vertex sequence with all proper self-intersection points
    inserted (noded), as a closed list of (x, y) tuples."""
    segs = _segs(ring)
    n = len(segs)
    inserts: dict = {}
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue
            if not segs_intersect_matrix(segs[i: i + 1], segs[j: j + 1], proper=True).any():
                continue
            p, p2 = segs[i]
            q, q2 = segs[j]
            r = p2 - p
            s = q2 - q
            denom = r[0] * s[1] - r[1] * s[0]
            if denom == 0:
                continue
            t = ((q[0] - p[0]) * s[1] - (q[1] - p[1]) * s[0]) / denom
            u = ((q[0] - p[0]) * r[1] - (q[1] - p[1]) * r[0]) / denom
            pt = (float(p[0] + t * r[0]), float(p[1] + t * r[1]))
            inserts.setdefault(i, []).append((t, pt))
            inserts.setdefault(j, []).append((u, pt))
    out = []
    for i in range(n):
        out.append((float(ring[i, 0]), float(ring[i, 1])))
        for t, pt in sorted(inserts.get(i, [])):
            out.append(pt)
    out.append((float(ring[-1, 0]), float(ring[-1, 1])))
    return out


def _extract_loops(seq: list) -> list:
    """Split a closed noded walk into simple loops: whenever a vertex
    repeats on the stack, pop that cycle (classic figure-eight split)."""
    key = lambda p: (round(p[0], 12), round(p[1], 12))
    stack = []
    pos: dict = {}
    loops = []
    for p in seq[:-1]:
        k = key(p)
        if k in pos:
            start = pos[k]
            cycle = stack[start:] + [p]
            for q in stack[start + 1 :]:
                pos.pop(key(q), None)
            del stack[start + 1 :]
            if len(cycle) >= 4:
                loops.append(np.asarray(cycle))
        else:
            pos[k] = len(stack)
            stack.append(p)
    if len(stack) >= 3:
        loops.append(np.asarray(stack + [stack[0]]))
    return loops


def make_valid(g: Geometry) -> Geometry:
    """Repair invalid polygons: self-intersecting rings are noded at every
    crossing and split into simple sub-rings (figure-eight/star repair —
    the even-odd decomposition GEOSMakeValid produces for these shapes);
    repeated points cleaned. Valid input returns unchanged."""
    if is_valid(g):
        return g
    if g.tag == G.POLYGON and g.data:
        ring = remove_repeated_points(Geometry(G.LINESTRING, g.data[0])).data
        loops = _extract_loops(_node_ring(ring))
        polys = [
            Geometry(G.POLYGON, [lp]) for lp in loops if abs(_ring_signed_area(lp)) > 0
        ]
        if len(polys) > 1:
            return Geometry(G.MULTIPOLYGON, polys)
        if len(polys) == 1:
            return polys[0]
    if g.tag in (G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        return Geometry(g.tag, [make_valid(c) for c in g.data], g.has_z, g.has_m)
    return g


def normalize(g: Geometry) -> Geometry:
    """Canonical form matching JTS/GEOS ``normalize()``: shells CW / holes
    CCW, rings rotated to start at their lexicographically smallest vertex,
    multi-parts sorted by serialized form."""
    from .wkb import to_wkb

    def norm_ring(ring: np.ndarray, want_ccw: bool) -> np.ndarray:
        r = ring[:-1]
        sa = _ring_signed_area(ring)
        if (sa > 0) != want_ccw and sa != 0:
            r = r[::-1]
        # rotate to lexicographic min
        idx = np.lexsort((r[:, 1], r[:, 0]))[0]
        r = np.vstack([r[idx:], r[:idx]])
        return np.vstack([r, r[:1]])

    if g.tag == G.POLYGON and g.data:
        rings = [norm_ring(g.data[0], False)] + [norm_ring(h, True) for h in g.data[1:]]
        return Geometry(G.POLYGON, rings, g.has_z, g.has_m)
    if g.tag == G.LINESTRING and len(g.data):
        a, b = g.data[0, :2], g.data[-1, :2]
        if (b[0], b[1]) < (a[0], a[1]):
            return Geometry(G.LINESTRING, g.data[::-1].copy(), g.has_z, g.has_m)
        return g
    if g.tag in (G.MULTIPOINT, G.MULTILINESTRING, G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        kids = sorted((normalize(c) for c in g.data), key=to_wkb)
        return Geometry(g.tag, kids, g.has_z, g.has_m)
    return g


def line_merge(g: Geometry, directed: bool = False) -> Geometry:
    """Merge connected linestrings (reference ``st_linemerge.cpp`` -> GEOS
    LineMerger semantics, pinned by test/sql/postgis/st_linemerge.test):
    lines join only at nodes where EXACTLY two line endpoints meet (a 3-way
    junction stops the merge); each merged chain keeps the orientation of
    its earliest input line; components are emitted in lexicographic
    coordinate-sequence order. ``directed=True`` additionally requires an
    end-to-start match (no flipping)."""
    from collections import defaultdict

    lines = [l.data[:, :2].copy() for l in g.flatten() if l.tag == G.LINESTRING]
    lines = [a for a in lines if len(a) >= 2]
    if not lines:
        return G.empty(G.GEOMETRYCOLLECTION)
    nodes = defaultdict(list)  # coord -> [(line_idx, end)] end: 0=start 1=end
    for i, arr in enumerate(lines):
        nodes[tuple(arr[0])].append((i, 0))
        nodes[tuple(arr[-1])].append((i, 1))
    join = {}
    for inc in nodes.values():
        if len(inc) != 2:
            continue
        (i, ie), (j, je) = inc
        if i == j:
            continue  # closed ring touching itself
        if directed and ie == je:
            continue  # directed merge needs one end meeting one start
        join[(i, ie)] = (j, je)
        join[(j, je)] = (i, ie)
    visited = [False] * len(lines)
    chains = []
    for i in range(len(lines)):
        if visited[i]:
            continue
        visited[i] = True
        chain = [(i, False)]  # (line_idx, flipped)
        # extend forward from the tail
        while True:
            li, fl = chain[-1]
            nxt = join.get((li, 0 if fl else 1))
            if nxt is None or visited[nxt[0]]:
                break
            j, je = nxt
            visited[j] = True
            chain.append((j, je == 1))
        # extend backward from the head
        while True:
            li, fl = chain[0]
            nxt = join.get((li, 1 if fl else 0))
            if nxt is None or visited[nxt[0]]:
                break
            j, je = nxt
            visited[j] = True
            chain.insert(0, (j, je == 0))
        # orientation follows the earliest input line in the chain
        first = min(range(len(chain)), key=lambda k: chain[k][0])
        if chain[first][1]:
            chain = [(li, not fl) for li, fl in reversed(chain)]
        coords = []
        for li, fl in chain:
            a = lines[li][::-1] if fl else lines[li]
            coords.append(a if not coords else a[1:])
        chains.append(np.vstack(coords))
    chains.sort(key=lambda a: tuple(map(tuple, a)))
    out = [G.linestring(c) for c in chains]
    if len(out) == 1:
        return out[0]
    return Geometry(G.MULTILINESTRING, out)


def buffer(
    g: Geometry, radius: float, nseg: int = 8,
    cap: str = "round", join: str = "round", mitre_limit: float = 5.0,
) -> Geometry:
    """Point buffers are exact circles (nseg segments per quadrant, GEOS
    convention); zero-radius returns the input. Lines/polygons are the
    union-of-convex-parts Minkowski sum in overlay.buffer_general, with
    round|flat|square caps and round|mitre|bevel joins."""
    if radius == 0:
        return g
    leaves = list(g.flatten())
    if radius < 0 and not any(l.tag == G.POLYGON for l in leaves):
        # GEOS: negative buffer of 0/1-dimensional input is POLYGON EMPTY
        return G.empty(G.POLYGON)
    if leaves and all(l.tag == G.POINT for l in leaves):
        polys = []
        n = max(4, 4 * nseg)
        ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
        for l in leaves:
            cx, cy = float(l.data[0]), float(l.data[1])
            ring = np.column_stack([cx + radius * np.cos(ang), cy + radius * np.sin(ang)])
            ring = np.vstack([ring, ring[:1]])
            polys.append(Geometry(G.POLYGON, [ring]))
        if len(polys) == 1:
            return polys[0]
        return union_all(polys)
    # lines / polygons / mixed: union of convex parts (vertex circles +
    # segment rectangles + polygon body); negative radius erodes
    from .overlay import buffer_general

    return buffer_general(g, radius, nseg, cap=cap, join=join, mitre_limit=mitre_limit)


# ---------------------------------------------------------------------------
# overlay: exact for convex second operand (half-plane clipping)
# ---------------------------------------------------------------------------

def _maybe_dissolve(g: Geometry) -> Geometry:
    """Dissolve fragmented multi-piece overlay output at the API boundary."""
    if g.tag == G.MULTIPOLYGON and len(g.data) > 1:
        from .dissolve import try_dissolve

        return try_dissolve(g)
    return g

def _is_convex_ring(ring: np.ndarray) -> bool:
    r = ring[:-1, :2]
    n = len(r)
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        o, a, b = r[i], r[(i + 1) % n], r[(i + 2) % n]
        c = _cross(o[0], o[1], a[0], a[1], b[0], b[1])
        if c != 0:
            s = 1 if c > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return sign != 0


def is_convex_polygon(g: Geometry) -> bool:
    return g.tag == G.POLYGON and len(g.data) == 1 and _is_convex_ring(g.data[0])


def _clip_ring_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Sutherland–Hodgman step: keep the region where a*x + b*y + c >= 0.

    Works on the FULL coordinate width — Z/M values on vertices introduced
    at the clip line are linearly interpolated (the reference interpolates
    Z through GEOS overlay the same way)."""
    pts = ring[:-1]
    n = len(pts)
    w = ring.shape[1]
    out = []
    for i in range(n):
        p, q = pts[i], pts[(i + 1) % n]
        dp = a * p[0] + b * p[1] + c
        dq = a * q[0] + b * q[1] + c
        if dp >= 0:
            out.append(p)
            if dq < 0:
                t = dp / (dp - dq)
                out.append(p + t * (q - p))
        elif dq >= 0:
            t = dp / (dp - dq)
            out.append(p + t * (q - p))
    if len(out) < 3:
        return np.empty((0, w))
    arr = np.asarray(out)
    return np.vstack([arr, arr[:1]])


def _convex_edges(ring: np.ndarray):
    """Half-planes (a, b, c) with inside >= 0 for a convex ring (either
    orientation)."""
    ccw = _ring_signed_area(ring) > 0
    pts = ring[:-1, :2]
    n = len(pts)
    planes = []
    for i in range(n):
        p, q = pts[i], pts[(i + 1) % n]
        # interior is left of each directed edge for CCW rings: normal (-dy, dx)
        a = p[1] - q[1]
        b = q[0] - p[0]
        if not ccw:
            a, b = -a, -b
        c = -(a * p[0] + b * p[1])
        if a == 0 and b == 0:
            continue
        planes.append((float(a), float(b), float(c)))
    return planes


def _clip_polygon_convex(poly: Geometry, planes) -> Geometry:
    """poly ∩ convex region (shell + holes clipped ring-by-ring)."""
    rings = []
    for k, ring in enumerate(poly.data):
        r = ring
        for (a, b, c) in planes:
            r = _clip_ring_halfplane(r, a, b, c)
            if len(r) == 0:
                break
        if len(r) and abs(_ring_signed_area(r)) > 0:
            if k == 0:
                rings.insert(0, r)
            else:
                rings.append(r)
        elif k == 0:
            return G.empty(G.POLYGON)
    if not rings:
        return G.empty(G.POLYGON)
    return Geometry(G.POLYGON, rings, poly.has_z, poly.has_m)


def _clip_line_convex(line: Geometry, planes) -> Geometry:
    """line ∩ convex region via parametric clipping of each segment."""
    pieces = []
    cur = []
    for i in range(len(line.data) - 1):
        # full coordinate width: Z/M on clip-introduced vertices interpolate
        p = line.data[i].astype(float)
        q = line.data[i + 1].astype(float)
        t0, t1 = 0.0, 1.0
        ok = True
        for (a, b, c) in planes:
            dp = a * p[0] + b * p[1] + c
            dq = a * q[0] + b * q[1] + c
            if dp < 0 and dq < 0:
                ok = False
                break
            if dp < 0:
                t0 = max(t0, dp / (dp - dq))
            elif dq < 0:
                t1 = min(t1, dp / (dp - dq))
        if not ok or t0 > t1:
            if len(cur) > 1:
                pieces.append(np.asarray(cur))
            cur = []
            continue
        s = p + t0 * (q - p)
        e = p + t1 * (q - p)
        if not cur:
            cur = [s]
        elif not np.array_equal(np.asarray(cur[-1]), s):
            if len(cur) > 1:
                pieces.append(np.asarray(cur))
            cur = [s]
        cur.append(e)
        if t1 < 1.0:
            pieces.append(np.asarray(cur))
            cur = []
    if len(cur) > 1:
        pieces.append(np.asarray(cur))
    pieces = [p for p in pieces if _seq_length(p) > 0]
    if not pieces:
        return G.empty(G.LINESTRING)
    mk = lambda arr: Geometry(G.LINESTRING, np.asarray(arr, dtype=np.float64), line.has_z, line.has_m)
    if len(pieces) == 1:
        return mk(pieces[0])
    return Geometry(G.MULTILINESTRING, [mk(p) for p in pieces], line.has_z, line.has_m)


def _line_line_pieces(a_lines, b_lines):
    """Pairwise segment intersection of two linework sets: returns
    (points, segments) — 0D proper crossings / endpoint touches and 1D
    collinear-overlap pieces. Exact rational-free arithmetic on the
    cross-product signs; parameters only for the located coordinates."""
    pts: list = []
    segs: list = []
    for la in a_lines:
        aa = la.data
        for i in range(len(aa) - 1):
            p = aa[i, :2].astype(float)
            q = aa[i + 1, :2].astype(float)
            d1 = q - p
            L2 = float(d1 @ d1)
            if L2 == 0.0:
                continue
            for lb in b_lines:
                bb = lb.data
                for j in range(len(bb) - 1):
                    r = bb[j, :2].astype(float)
                    s = bb[j + 1, :2].astype(float)
                    d2 = s - r
                    if float(d2 @ d2) == 0.0:
                        continue
                    denom = float(d1[0] * d2[1] - d1[1] * d2[0])
                    if denom == 0.0:
                        if _cross(p[0], p[1], q[0], q[1], r[0], r[1]) != 0:
                            continue  # parallel, not collinear
                        t0 = float((r - p) @ d1) / L2
                        t1 = float((s - p) @ d1) / L2
                        lo = max(0.0, min(t0, t1))
                        hi = min(1.0, max(t0, t1))
                        if hi > lo:
                            segs.append((tuple(p + lo * d1), tuple(p + hi * d1)))
                        elif hi == lo:
                            pt = p + lo * d1
                            pts.append((float(pt[0]), float(pt[1])))
                        continue
                    rp = r - p
                    t = float(rp[0] * d2[1] - rp[1] * d2[0]) / denom
                    u = float(rp[0] * d1[1] - rp[1] * d1[0]) / denom
                    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
                        pt = p + t * d1
                        pts.append((float(pt[0]), float(pt[1])))
    return pts, segs


def _intersection_lines(a: Geometry, b: Geometry) -> Geometry:
    """Intersection when neither input has an areal component: 1D
    collinear overlaps merged into maximal polylines (line_merge), plus
    0D crossing/touch points not already covered by the 1D part; stray
    POINT leaves in collections contribute point hits. Mirrors GEOS
    OverlayNG's L x L result dimension rules (reference
    geos/functions/scalar/st_intersection.cpp delegates there)."""
    a_pts = [l for l in a.flatten() if l.tag == G.POINT]
    b_pts = [l for l in b.flatten() if l.tag == G.POINT]
    a_lines = [l for l in a.flatten() if l.tag == G.LINESTRING]
    b_lines = [l for l in b.flatten() if l.tag == G.LINESTRING]
    pts, segs = _line_line_pieces(a_lines, b_lines)
    for p in a_pts:
        if not p.is_empty() and intersects(p, b):
            pts.append((float(p.data[0]), float(p.data[1])))
    for p in b_pts:
        if not p.is_empty() and intersects(p, a):
            pts.append((float(p.data[0]), float(p.data[1])))
    lines: Geometry | None = None
    if segs:
        two_pt = [
            Geometry(G.LINESTRING, np.asarray([s0, s1], dtype=np.float64))
            for s0, s1 in segs
        ]
        merged = line_merge(
            Geometry(G.MULTILINESTRING, two_pt) if len(two_pt) > 1 else two_pt[0]
        )
        lines = normalize(merged)
        line_leaves = [l for l in lines.flatten() if l.tag == G.LINESTRING]
        # drop 0D hits interior to the 1D result (GEOS reports the higher
        # dimension only)
        pts = [
            (x, y)
            for x, y in pts
            if not any(point_on_seq(x, y, l.data) for l in line_leaves)
        ]
    uniq = sorted(set(pts))
    point_geoms = [G.point(x, y) for x, y in uniq]
    if lines is None and not point_geoms:
        return G.empty(G.GEOMETRYCOLLECTION)
    if lines is None:
        return point_geoms[0] if len(point_geoms) == 1 else G.collect(point_geoms)
    if not point_geoms:
        return lines
    parts = [l for l in lines.flatten()] + point_geoms
    return Geometry(G.GEOMETRYCOLLECTION, parts)


def _tri_clip_data(b: Geometry):
    """Triangle decomposition of ``b``'s polygonal parts with per-triangle
    (bbox, half-plane) clip data."""
    from .triangulate import triangulate

    tri_data = []
    for tri in triangulate(b):
        planes = _convex_edges(np.vstack([tri, tri[:1]]))
        tb = (
            float(tri[:, 0].min()),
            float(tri[:, 1].min()),
            float(tri[:, 0].max()),
            float(tri[:, 1].max()),
        )
        tri_data.append((tb, planes))
    return tri_data


def _segment_inside_intervals(p, q, tri_data):
    """Merged parameter intervals of segment p->q inside the (closed)
    triangle union. Zero-width entries are touch points. Adjacent
    triangles produce exactly adjoining intervals (the shared-edge plane
    yields identical split parameters), so the merge is watertight."""
    sx0, sx1 = min(p[0], q[0]), max(p[0], q[0])
    sy0, sy1 = min(p[1], q[1]), max(p[1], q[1])
    ivs: list = []
    for (bx0, by0, bx1, by1), planes in tri_data:
        if sx0 > bx1 or sx1 < bx0 or sy0 > by1 or sy1 < by0:
            continue
        t0, t1 = 0.0, 1.0
        ok = True
        for (pa, pb, pc) in planes:
            dp = pa * p[0] + pb * p[1] + pc
            dq = pa * q[0] + pb * q[1] + pc
            if dp < 0 and dq < 0:
                ok = False
                break
            if dp < 0:
                t0 = max(t0, dp / (dp - dq))
            elif dq < 0:
                t1 = min(t1, dp / (dp - dq))
        if not ok or t0 > t1:
            continue
        ivs.append((t0, t1))
    if not ivs:
        return []
    ivs.sort()
    merged = [list(ivs[0])]
    for lo, hi in ivs[1:]:
        if lo <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    return merged


def _difference_line_areal(part: Geometry, b: Geometry) -> list:
    """Lineal ``part`` minus polygonal ``b``: the complement (gap)
    intervals of the inside-interval union per segment — duplication-free
    by construction (the progressive half-plane complement double-counts
    boundary-running pieces), closed-set (a boundary run is INSIDE, so it
    leaves the difference). Returns a list of LINESTRING pieces; the
    caller chains them (line_merge)."""
    tri_data = _tri_clip_data(b)
    out = []
    aa = part.data
    for i in range(len(aa) - 1):
        p = aa[i, :2].astype(float)
        q = aa[i + 1, :2].astype(float)
        if np.array_equal(p, q):
            continue
        prev = 0.0
        for lo, hi in _segment_inside_intervals(p, q, tri_data):
            if lo > prev:
                out.append(Geometry(
                    G.LINESTRING,
                    np.asarray([p + prev * (q - p), p + lo * (q - p)], dtype=np.float64),
                ))
            prev = max(prev, hi)
        if prev < 1.0:
            out.append(Geometry(
                G.LINESTRING,
                np.asarray([p + prev * (q - p), q], dtype=np.float64),
            ))
    return out


def _intersection_line_areal(a: Geometry, b: Geometry) -> Geometry:
    """Lineal/puntal ``a`` ∩ arbitrary polygonal ``b`` (concave, holes,
    multipolygon) via triangle decomposition with per-segment interval
    union: each line segment collects its inside-parameter intervals
    across all triangles, merges them (adjacent triangles produce exactly
    adjoining intervals — the shared-edge plane yields identical split
    parameters), and emits the surviving sub-segments; line_merge chains
    them back into maximal polylines. Touch points (zero-width intervals)
    surface as POINTs unless covered by a 1D piece, matching GEOS
    OverlayNG's dimension rules."""
    from .triangulate import triangulate

    tri_data = _tri_clip_data(b)
    if not tri_data:
        return G.empty(G.GEOMETRYCOLLECTION)
    segs: list = []
    pts: list = []
    for line in (l for l in a.flatten() if l.tag == G.LINESTRING):
        aa = line.data
        for i in range(len(aa) - 1):
            p = aa[i, :2].astype(float)
            q = aa[i + 1, :2].astype(float)
            if np.array_equal(p, q):
                continue
            for lo, hi in _segment_inside_intervals(p, q, tri_data):
                if hi > lo:
                    segs.append((tuple(p + lo * (q - p)), tuple(p + hi * (q - p))))
                else:
                    pt = p + lo * (q - p)
                    pts.append((float(pt[0]), float(pt[1])))
    for leaf in (l for l in a.flatten() if l.tag == G.POINT):
        if not leaf.is_empty() and intersects(leaf, b):
            pts.append((float(leaf.data[0]), float(leaf.data[1])))
    lines: Geometry | None = None
    if segs:
        two_pt = [
            Geometry(G.LINESTRING, np.asarray([s0, s1], dtype=np.float64))
            for s0, s1 in segs
        ]
        lines = normalize(line_merge(
            Geometry(G.MULTILINESTRING, two_pt) if len(two_pt) > 1 else two_pt[0]
        ))
        line_leaves = [l for l in lines.flatten() if l.tag == G.LINESTRING]
        pts = [
            (x, y)
            for x, y in pts
            if not any(point_on_seq(x, y, l.data) for l in line_leaves)
        ]
    point_geoms = [G.point(x, y) for x, y in sorted(set(pts))]
    if lines is None and not point_geoms:
        return G.empty(G.GEOMETRYCOLLECTION)
    if lines is None:
        return point_geoms[0] if len(point_geoms) == 1 else G.collect(point_geoms)
    if not point_geoms:
        return lines
    return Geometry(G.GEOMETRYCOLLECTION, list(lines.flatten()) + point_geoms)


def intersection(a: Geometry, b: Geometry) -> Geometry:
    if a.is_empty() or b.is_empty() or _bbox_disjoint(a, b):
        return G.empty(G.GEOMETRYCOLLECTION)
    # point cases
    a_leaves = list(a.flatten())
    if all(l.tag == G.POINT for l in a_leaves):
        hits = [l for l in a_leaves if intersects(l, b)]
        return G.collect(hits) if len(hits) != 1 else hits[0]
    b_leaves = list(b.flatten())
    if all(l.tag == G.POINT for l in b_leaves):
        return intersection(b, a)
    # no areal component on either side: dedicated linework overlay
    if all(l.tag in (G.POINT, G.LINESTRING) for l in a_leaves) and all(
        l.tag in (G.POINT, G.LINESTRING) for l in b_leaves
    ):
        return _intersection_lines(a, b)
    # convex clip region?
    clip = None
    if is_convex_polygon(b):
        clip = _convex_edges(b.data[0])
    elif is_convex_polygon(a):
        a, b = b, a
        clip = _convex_edges(b.data[0])
    if clip is not None:
        out = []
        for l in a.flatten():
            if l.tag == G.POLYGON:
                r = _clip_polygon_convex(l, clip)
            elif l.tag == G.LINESTRING:
                r = _clip_line_convex(l, clip)
            else:
                r = l if intersects(l, b) else G.empty(G.POINT)
            if not r.is_empty():
                out.extend(r.flatten())
        if not out:
            return G.empty(G.GEOMETRYCOLLECTION)
        return _maybe_dissolve(out[0] if len(out) == 1 else G.collect(out))
    # lineal x general areal (concave / holes / multipolygon): the convex
    # fast path above could not apply, but the triangle-decomposition line
    # clip can
    a_tags = {l.tag for l in a_leaves}
    b_tags = {l.tag for l in b_leaves}
    if a_tags <= {G.POINT, G.LINESTRING} and b_tags == {G.POLYGON}:
        return _intersection_line_areal(a, b)
    if b_tags <= {G.POINT, G.LINESTRING} and a_tags == {G.POLYGON}:
        return _intersection_line_areal(b, a)
    if covers(b, a):
        return a
    if covers(a, b):
        return b
    if not intersects(a, b):
        return G.empty(G.GEOMETRYCOLLECTION)
    # general concave x concave: triangle-decomposition overlay
    from .overlay import intersection_tri

    return intersection_tri(a, b)


def _subtract_line_overlap(line: Geometry, b_lines: list) -> list:
    """``line`` minus the collinear overlapping portions of ``b_lines``,
    as a list of linestrings (interval subtraction per segment, chained
    back into maximal polylines)."""
    aa = line.data
    chains: list = []
    chain: list = []

    def flush():
        nonlocal chain
        if len(chain) >= 2:
            chains.append(np.asarray(chain, dtype=np.float64))
        chain = []

    for i in range(len(aa) - 1):
        p, q = aa[i, :2].astype(float), aa[i + 1, :2].astype(float)
        d = q - p
        L2 = float(d[0] * d[0] + d[1] * d[1])
        if L2 == 0:
            continue
        cut: list = []
        for bl in b_lines:
            bb = bl.data
            for j in range(len(bb) - 1):
                r, s = bb[j, :2], bb[j + 1, :2]
                if (
                    _cross(p[0], p[1], q[0], q[1], r[0], r[1]) != 0
                    or _cross(p[0], p[1], q[0], q[1], s[0], s[1]) != 0
                ):
                    continue
                t0 = float((r - p) @ d) / L2
                t1 = float((s - p) @ d) / L2
                lo, hi = max(0.0, min(t0, t1)), min(1.0, max(t0, t1))
                if hi > lo:
                    cut.append((lo, hi))
        cut.sort()
        kept: list = []
        cur = 0.0
        for lo, hi in cut:
            if lo > cur:
                kept.append((cur, lo))
            cur = max(cur, hi)
        if cur < 1.0:
            kept.append((cur, 1.0))
        for t0, t1 in kept:
            p0 = p + t0 * d
            p1 = p + t1 * d
            if chain and np.allclose(chain[-1], p0):
                chain.append(p1)
            else:
                flush()
                chain = [p0, p1]
    flush()
    return [G.linestring(c) for c in chains]


def _difference_lower_dim(a: Geometry, b: Geometry) -> Geometry:
    """a minus a 0/1-dimensional b: areas pass through, lines lose collinear
    overlap with b's lines, points covered by b are dropped."""
    b_lines = [l for l in b.flatten() if l.tag == G.LINESTRING]
    parts: list = []
    changed = False
    for part in a.flatten():
        if part.tag == G.POLYGON:
            parts.append(part)
        elif part.tag == G.LINESTRING:
            if b_lines and _collinear_overlap_len(part, b) > 0:
                parts.extend(_subtract_line_overlap(part, b_lines))
                changed = True
            else:
                parts.append(part)
        else:  # POINT
            if covers(b, part):
                changed = True
            else:
                parts.append(part)
    if not changed:
        return a
    if not parts:
        return G.empty(G.GEOMETRYCOLLECTION)
    return parts[0] if len(parts) == 1 else G.collect(parts)


def difference(a: Geometry, b: Geometry) -> Geometry:
    """a \\ b, exact when b's polygons are convex (progressive half-plane
    decomposition — pieces a∩H̄ᵢ∩H₁..Hᵢ₋₁ are disjoint and union to a\\b)."""
    if a.is_empty():
        return a
    if b.is_empty() or not intersects(a, b):
        return a
    b_polys = [l for l in b.flatten() if l.tag == G.POLYGON]
    if not b_polys:
        # subtracting a lower-dimension geometry leaves areas unchanged, but
        # line\line must drop collinear overlap and point\b drops covered
        # points (GEOS semantics)
        return _difference_lower_dim(a, b)
    result_parts = list(a.flatten())
    for bp in b_polys:
        if not is_convex_polygon(bp):
            if not intersects(a, bp):
                continue
            # concave subtrahend: triangle-decomposition difference
            from .overlay import difference_tri

            nxt = []
            for part in result_parts:
                if part.tag == G.POINT:
                    if not covers(bp, part):
                        nxt.append(part)
                    continue
                if part.tag != G.POLYGON:
                    # lineal \ concave area: gap intervals of the
                    # triangle-union clip (duplication-free; a line
                    # PARTIALLY inside survives as its outside pieces —
                    # the old covers() test dropped all-or-nothing)
                    nxt.extend(_difference_line_areal(part, bp))
                    continue
                d = difference_tri(part, bp)
                nxt.extend(d.flatten())
            result_parts = nxt
            continue
        planes = _convex_edges(bp.data[0])
        next_parts = []
        for part in result_parts:
            if part.tag == G.POINT:
                if point_in_polygon(float(part.data[0]), float(part.data[1]), bp) != 2:
                    next_parts.append(part)
                continue
            if not intersects(part, bp):
                next_parts.append(part)
                continue
            if part.tag != G.POLYGON:
                # lineal: gap-interval clip (the half-plane complement
                # double-counts boundary-running pieces; closed-set, so a
                # boundary run leaves the difference)
                next_parts.extend(_difference_line_areal(part, bp))
                continue
            prefix = []  # half-planes already inside
            for (pa, pb_, pc) in planes:
                piece_planes = prefix + [(-pa, -pb_, -pc)]
                piece = _clip_polygon_convex(part, piece_planes)
                if not piece.is_empty():
                    next_parts.extend(piece.flatten())
                prefix.append((pa, pb_, pc))
        result_parts = next_parts
    result_parts = [p for p in result_parts if not p.is_empty()]
    if not result_parts:
        return G.empty(G.GEOMETRYCOLLECTION)
    # lineal survivors fragment at clip boundaries (triangle edges of a
    # concave subtrahend, half-plane seams of a convex one) — chain them
    # back into maximal polylines like GEOS does
    line_parts = [p for p in result_parts if p.tag == G.LINESTRING]
    if len(line_parts) > 1:
        other = [p for p in result_parts if p.tag != G.LINESTRING]
        merged = line_merge(Geometry(G.MULTILINESTRING, line_parts))
        result_parts = other + [l for l in merged.flatten() if not l.is_empty()]
    return _maybe_dissolve(
        result_parts[0] if len(result_parts) == 1 else G.collect(result_parts)
    )


def union(a: Geometry, b: Geometry) -> Geometry:
    """a ∪ b as a valid disjoint decomposition: b ∪ (a \\ b). Exact when b's
    polygons are convex; area/set semantics preserved (the result may be a
    MULTIPOLYGON of pieces rather than one dissolved shell)."""
    if a.is_empty():
        return b
    if b.is_empty():
        return a
    if not intersects(a, b):
        return G.collect(list(a.flatten()) + list(b.flatten()))
    if covers(a, b):
        return a
    if covers(b, a):
        return b
    if dimension(a) != dimension(b):
        # mixed dimensions: the higher-dimension side absorbs the overlap
        # (GEOS: polygon ∪ line keeps only the line's OUTSIDE pieces,
        # regardless of argument order)
        hi, lo = (a, b) if dimension(a) > dimension(b) else (b, a)
        rest = difference(lo, hi)
        parts = list(hi.flatten()) + [p for p in rest.flatten() if not p.is_empty()]
        return _maybe_dissolve(parts[0] if len(parts) == 1 else G.collect(parts))
    diff = difference(a, b)
    parts = list(b.flatten()) + list(diff.flatten())
    return _maybe_dissolve(parts[0] if len(parts) == 1 else G.collect(parts))


def union_all(geoms) -> Geometry:
    acc = None
    for g in geoms:
        if g is None:
            continue
        acc = g if acc is None else union(acc, g)
    return acc if acc is not None else G.empty(G.GEOMETRYCOLLECTION)


def intersection_all(geoms) -> Geometry:
    acc = None
    for g in geoms:
        if g is None:
            continue
        acc = g if acc is None else intersection(acc, g)
        if acc.is_empty():
            return acc
    return acc if acc is not None else G.empty(G.GEOMETRYCOLLECTION)


def snap_overlay(op: str, a: Geometry, b: Geometry, grid_size: float) -> Geometry:
    """Fixed-precision overlay (the GEOS OverlayNG precision-model analog,
    simplified): both inputs' vertices snap to the ``grid_size`` grid and
    are repaired, the float overlay runs, and the RESULT's vertices —
    including newly-created intersection points — snap to the same grid
    and are repaired again, so every output coordinate is an exact grid
    multiple and near-degenerate slivers thinner than the grid collapse
    deterministically.

    Honest scope: this is input/output vertex snapping, NOT OverlayNG's
    full hot-pixel snap-rounding — a segment passing within half a cell
    of another segment's interior (no vertex nearby) can still node
    off-grid internally before the output snap. For data whose
    coordinates are meaningful at the grid scale (the use case of a
    precision model), the visible contract holds: valid, grid-aligned,
    sliver-free output, with area perturbation O(grid * perimeter)."""
    if grid_size <= 0:
        raise ValueError("snap_overlay: grid_size must be > 0")
    ops = {"intersection": intersection, "union": union, "difference": difference}
    if op not in ops:
        raise ValueError(f"snap_overlay: op must be one of {sorted(ops)}")

    def _prep(g: Geometry) -> Geometry:
        g = make_valid(remove_repeated_points(reduce_precision(g, grid_size)))
        return g

    out = ops[op](_prep(a), _prep(b))
    out = reduce_precision(out, grid_size)
    out = remove_repeated_points(out)
    # rounding can collapse rings below 4 points / zero area: drop them
    kept = []
    for leaf in out.flatten():
        if leaf.tag == G.POLYGON:
            rings = [r for r in leaf.data if len(r) >= 4]
            if not rings or abs(_ring_signed_area(np.asarray(rings[0]))) == 0.0:
                continue
            leaf = Geometry(G.POLYGON, rings)
        elif leaf.tag == G.LINESTRING and len(leaf.data) < 2:
            continue
        kept.append(leaf)
    if not kept:
        return G.empty(G.GEOMETRYCOLLECTION)
    res = kept[0] if len(kept) == 1 else G.collect(kept)
    return make_valid(res)

