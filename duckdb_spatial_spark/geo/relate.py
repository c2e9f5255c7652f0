"""Exact DE-9IM dimension matrix via segment noding.

``relate9(a, b)`` returns the 3x3 matrix of intersection dimensions
(-1/0/1/2) over [Interior, Boundary, Exterior] x [Interior, Boundary,
Exterior] — the machinery behind touches / crosses / overlaps / equals
(the reference gets these from GEOS relate,
``spatial/src/spatial/geos/functions/scalar/st_touches.cpp`` etc.).

Method (public computational-geometry practice, e.g. the JTS relate
design): every line/ring segment of one geometry is noded at every
intersection with the other geometry's segments — including collinear
overlap interval endpoints. After noding, a piece lies wholly inside ONE
class (interior / boundary / exterior) of the other geometry, so its
midpoint classifies it; intersection nodes themselves contribute the
dimension-0 cells. Polygon *interior* cells need no area computation: a
ring piece classified interior-of-B proves 2D interior overlap on one
side of the ring (a disc around the midpoint is inside B and straddles
the ring), and the purely-nested cases (no boundary crossing at all) are
resolved with one representative interior point per polygon, whose class
is then uniform.

MultiLineString boundaries follow the OGC mod-2 rule (an endpoint is
boundary iff it ends an odd number of curves); closed curves have no
boundary.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from . import geom as G

INT, BND, EXT = 0, 1, 2


class _Ctx:
    def __init__(self, g: G.Geometry):
        self.pts: list = []
        self.lines: list = []
        self.polys: list = []
        if g is not None and not g.is_empty():
            for leaf in g.flatten():
                if leaf.is_empty():
                    continue
                if leaf.tag == G.POINT:
                    self.pts.append((float(leaf.data[0]), float(leaf.data[1])))
                elif leaf.tag == G.LINESTRING:
                    if len(leaf.data) >= 2:
                        self.lines.append(np.asarray(leaf.data[:, :2], dtype=np.float64))
                    elif len(leaf.data) == 1:
                        self.pts.append((float(leaf.data[0, 0]), float(leaf.data[0, 1])))
                else:
                    self.polys.append(leaf)
        # mod-2 line boundary
        c: Counter = Counter()
        for arr in self.lines:
            if not (arr[0] == arr[-1]).all():
                c[(float(arr[0, 0]), float(arr[0, 1]))] += 1
                c[(float(arr[-1, 0]), float(arr[-1, 1]))] += 1
        self.line_bnd = {p for p, n in c.items() if n % 2 == 1}
        # flattened segment arrays (x1,y1,x2,y2)
        self.line_segs = _segs_of(self.lines)
        ring_arrays = [np.asarray(r[:, :2], dtype=np.float64) for p in self.polys for r in p.data]
        self.ring_segs = _segs_of(ring_arrays)
        coords = [self.line_segs, self.ring_segs] + (
            [np.asarray(self.pts, dtype=np.float64)] if self.pts else []
        )
        m = 1.0
        for a in coords:
            if a is not None and len(a):
                m = max(m, float(np.abs(a).max()))
        self.scale = m

    def all_segs(self):
        parts = [s for s in (self.line_segs, self.ring_segs) if s is not None and len(s)]
        if not parts:
            return None
        return np.vstack(parts)

    def is_empty(self):
        return not (self.pts or self.lines or self.polys)


def _segs_of(arrays):
    rows = []
    for arr in arrays:
        if len(arr) >= 2:
            rows.append(np.hstack([arr[:-1], arr[1:]]))
    return np.vstack(rows) if rows else None


def _dist_to_segs(px, py, segs) -> float:
    if segs is None or not len(segs):
        return math.inf
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    denom = dx * dx + dy * dy
    denom = np.where(denom == 0, 1.0, denom)
    t = np.clip(((px - x1) * dx + (py - y1) * dy) / denom, 0.0, 1.0)
    cx, cy = x1 + t * dx, y1 + t * dy
    return float(np.hypot(px - cx, py - cy).min())


def _locate_detail(px, py, ctx: _Ctx, eps: float):
    """(class, in_area): class is INT/BND/EXT; in_area is True only when
    the point sits in a polygon interior of ctx — the distinction matters
    for the 2D inference (a ring piece lying on the OTHER side's *line* is
    'interior of other' with measure zero, proving nothing about area)."""
    from .algorithms import point_in_polygon

    if _dist_to_segs(px, py, ctx.ring_segs) <= eps:
        return BND, False
    for (bx, by) in ctx.line_bnd:
        if math.hypot(px - bx, py - by) <= eps:
            return BND, False
    for poly in ctx.polys:
        st = point_in_polygon(px, py, poly)
        if st == 2:
            return INT, True
        if st == 1:
            return BND, False
    if _dist_to_segs(px, py, ctx.line_segs) <= eps:
        return INT, False
    for (qx, qy) in ctx.pts:
        if math.hypot(px - qx, py - qy) <= eps:
            return INT, False
    return EXT, False


def _locate(px, py, ctx: _Ctx, eps: float) -> int:
    return _locate_detail(px, py, ctx, eps)[0]


def _seg_seg(p1, p2, q1, q2, eps):
    """Params t on [p1,p2] of intersections with [q1,q2] + node points.

    Returns (ts, nodes): ts to split the p-segment at; nodes are actual
    shared points (for collinear overlap: the overlap interval endpoints)."""
    d = p2 - p1
    e = q2 - q1
    denom = d[0] * e[1] - d[1] * e[0]
    L2 = float(d[0] * d[0] + d[1] * d[1])
    if L2 == 0:
        return [], []
    r = q1 - p1
    area_scale = max(math.sqrt(L2) * max(math.hypot(e[0], e[1]), 1.0), 1.0)
    if abs(denom) <= 1e-14 * area_scale:
        # parallel: collinear iff q1 lies on the p-line
        if abs(r[0] * d[1] - r[1] * d[0]) > eps * max(math.sqrt(L2), 1.0):
            return [], []
        t0 = float(np.dot(q1 - p1, d)) / L2
        t1 = float(np.dot(q2 - p1, d)) / L2
        lo, hi = (t0, t1) if t0 <= t1 else (t1, t0)
        lo, hi = max(lo, 0.0), min(hi, 1.0)
        if hi < lo:
            return [], []
        ts = [lo, hi] if hi > lo else [lo]
        nodes = [tuple(p1 + t * d) for t in ts]
        return ts, nodes
    t = (r[0] * e[1] - r[1] * e[0]) / denom
    u = (r[0] * d[1] - r[1] * d[0]) / denom
    tol = eps / max(math.sqrt(L2), 1.0)
    if -tol <= t <= 1 + tol and -tol <= u <= 1 + tol:
        t = min(max(t, 0.0), 1.0)
        return [t], [tuple(p1 + t * d)]
    return [], []


def _noded_pieces(segs, other: _Ctx, eps):
    """Midpoints of pieces after noding ``segs`` against other's segments,
    plus the node points. segs: (N,4) array or None."""
    mids = []
    nodes = []
    if segs is None or not len(segs):
        return mids, nodes
    osegs = other.all_segs()
    for row in segs:
        p1 = row[:2]
        p2 = row[2:]
        ts = {0.0, 1.0}
        if osegs is not None:
            for orow in osegs:
                t_list, n_list = _seg_seg(p1, p2, orow[:2], orow[2:], eps)
                ts.update(t_list)
                nodes.extend(n_list)
        tss = sorted(ts)
        d = p2 - p1
        seg_len = math.hypot(float(d[0]), float(d[1]))
        for t0, t1 in zip(tss[:-1], tss[1:]):
            if (t1 - t0) * seg_len > 2 * eps:
                m = p1 + ((t0 + t1) / 2.0) * d
                mids.append((float(m[0]), float(m[1])))
    return mids, nodes


def relate9(a: G.Geometry, b: G.Geometry):
    """DE-9IM dimension matrix for a vs b."""
    from .algorithms import _poly_interior_point

    A, B = _Ctx(a), _Ctx(b)
    eps = 1e-9 * max(A.scale, B.scale)
    M = [[-1] * 3 for _ in range(3)]
    M[EXT][EXT] = 2

    def fill(S: _Ctx, O: _Ctx, transpose: bool):
        def bump(part, cls, dim):
            i, j = (cls, part) if transpose else (part, cls)
            if M[i][j] < dim:
                M[i][j] = dim

        for (x, y) in S.pts:
            bump(INT, _locate(x, y, O, eps), 0)
        for (x, y) in S.line_bnd:
            bump(BND, _locate(x, y, O, eps), 0)
        line_mids, _ = _noded_pieces(S.line_segs, O, eps)
        for (x, y) in line_mids:
            bump(INT, _locate(x, y, O, eps), 1)
        for poly in S.polys:
            ring_arrays = [np.asarray(r[:, :2], dtype=np.float64) for r in poly.data]
            segs = _segs_of(ring_arrays)
            mids, _ = _noded_pieces(segs, O, eps)
            classes = set()  # (class, in_area) pairs
            for (x, y) in mids:
                c, in_area = _locate_detail(x, y, O, eps)
                classes.add((c, in_area))
                bump(BND, c, 1)
            ip = _poly_interior_point(poly)
            ip_cls, ip_area = (
                _locate_detail(ip[0], ip[1], O, eps) if ip is not None else (None, False)
            )
            # 2D interior cells: a ring piece inside O's AREA proves
            # interior overlap on the S-interior side of the ring and
            # O-interior beyond it; a ring piece in O's exterior — or on a
            # mere line of O (measure zero) — proves S-interior ∩
            # O-exterior. Purely-nested cases (no boundary interaction)
            # come from the representative interior point, whose class is
            # then uniform over the whole polygon interior.
            if (INT, True) in classes:
                bump(INT, INT, 2)
                bump(EXT, INT, 2)
            if (EXT, False) in classes or (INT, False) in classes:
                bump(INT, EXT, 2)
            if ip_cls == INT and ip_area:
                bump(INT, INT, 2)
            elif ip_cls == EXT or (ip_cls == INT and not ip_area):
                bump(INT, EXT, 2)

    fill(A, B, transpose=False)
    fill(B, A, transpose=True)

    # dimension-0 cells from the intersection nodes themselves
    a_segs = A.all_segs()
    if a_segs is not None:
        _, nodes = _noded_pieces(a_segs, B, eps)
        for (x, y) in nodes:
            pa = _node_part(x, y, A, eps)
            pb = _node_part(x, y, B, eps)
            if pa is not None and pb is not None:
                if M[pa][pb] < 0:
                    M[pa][pb] = 0
    return M


def _node_part(x, y, ctx: _Ctx, eps) -> int | None:
    """Which part of ctx a node point belongs to (INT for line interiors,
    BND for rings / mod-2 endpoints)."""
    if _dist_to_segs(x, y, ctx.ring_segs) <= eps:
        return BND
    for (bx, by) in ctx.line_bnd:
        if math.hypot(x - bx, y - by) <= eps:
            return BND
    if _dist_to_segs(x, y, ctx.line_segs) <= eps:
        return INT
    for (qx, qy) in ctx.pts:
        if math.hypot(x - qx, y - qy) <= eps:
            return INT
    return None


# -------------------------------------------------------------- predicates
def im_intersects(M) -> bool:
    return M[0][0] >= 0 or M[0][1] >= 0 or M[1][0] >= 0 or M[1][1] >= 0


def im_touches(M) -> bool:
    return im_intersects(M) and M[0][0] == -1


def im_crosses(M, dim_a: int, dim_b: int) -> bool:
    if dim_a < dim_b:
        return M[0][0] >= 0 and M[0][2] >= 0
    if dim_a > dim_b:
        return M[0][0] >= 0 and M[2][0] >= 0
    if dim_a == 1:
        return M[0][0] == 0
    return False


def im_overlaps(M, dim_a: int, dim_b: int) -> bool:
    if dim_a != dim_b:
        return False
    if dim_a == 1:
        return M[0][0] == 1 and M[0][2] >= 0 and M[2][0] >= 0
    return M[0][0] >= 0 and M[0][2] >= 0 and M[2][0] >= 0


def im_equals(M) -> bool:
    return (
        M[0][0] >= 0
        and M[0][2] == -1
        and M[2][0] == -1
        and M[1][2] == -1
        and M[2][1] == -1
    )
