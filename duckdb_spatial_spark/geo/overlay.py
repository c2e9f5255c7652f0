"""General polygon overlay via triangle decomposition.

Any×any boolean ops reduce to the exact convex half-plane machinery in
:mod:`.algorithms`:

  A ∩ B  =  ⋃ over triangle pairs  ta ∩ tb      (convex ∩ convex, exact)
  A \\ B  =  ⋃ over ta of (ta \\ tb1 \\ tb2 ...)  (convex-difference chains,
             every intermediate piece stays convex)
  A ∪ B  =  A triangles + (B \\ A)

Raw output is a disjoint MULTIPOLYGON of convex pieces — set- and
area-exact; at API boundaries :mod:`.dissolve` reconstructs the minimal
boundary (shells + holes), falling back to the fragmented-but-exact form
when tracing fails. This upgrades ST_Intersection / ST_Union /
ST_Difference / ST_Union_Agg from convex-only to arbitrary polygons, and
enables line/polygon ST_Buffer as a union of convex parts.
"""

from __future__ import annotations

import math

import numpy as np

from . import algorithms as A
from . import geom as G
from .geom import Geometry
from .triangulate import triangulate


def _tri_poly(tri: np.ndarray, has_z: bool = False, has_m: bool = False) -> Geometry:
    return Geometry(G.POLYGON, [np.vstack([tri, tri[:1]])], has_z, has_m)


def _norm_zm(ga: Geometry, gb: Geometry):
    """Force both inputs to the UNION of their Z/M flags (missing dims
    default 0), so triangles from either side share a coordinate width —
    the reference propagates flags the same way through GEOS overlay
    (geometry_properties.hpp:10-63)."""
    hz, hm = ga.has_z or gb.has_z, ga.has_m or gb.has_m
    if (ga.has_z, ga.has_m) != (hz, hm):
        ga = A.force_dims(ga, hz, hm)
    if (gb.has_z, gb.has_m) != (hz, hm):
        gb = A.force_dims(gb, hz, hm)
    return ga, gb, hz, hm


def _pieces_to_geom(pieces, dissolve: bool = False, has_z: bool = False, has_m: bool = False) -> Geometry:
    pieces = [p for p in pieces if not p.is_empty() and A.area(p) > 0]
    if not pieces:
        return G.empty(G.GEOMETRYCOLLECTION, has_z, has_m)
    if len(pieces) == 1:
        return pieces[0]
    frag = Geometry(G.MULTIPOLYGON, pieces, has_z, has_m)
    # dissolve only at API boundaries (O(edges x pieces)); internal overlay
    # chains pass dissolve=False and stay fragmented
    if dissolve and len(pieces) <= 256:
        from .dissolve import try_dissolve

        return try_dissolve(frag)
    return frag


def _subtract_convex(piece: Geometry, clip_planes) -> list:
    """convex piece \\ convex region -> disjoint convex pieces."""
    out = []
    prefix = []
    for (a, b, c) in clip_planes:
        part = A._clip_polygon_convex(piece, prefix + [(-a, -b, -c)])
        if not part.is_empty():
            out.append(part)
        prefix.append((a, b, c))
    return out


def intersection_tri(ga: Geometry, gb: Geometry, dissolve: bool = True) -> Geometry:
    ga, gb, hz, hm = _norm_zm(ga, gb)
    tas = triangulate(ga)
    tbs = triangulate(gb)
    pieces = []
    tb_planes = [(tb, A._convex_edges(np.vstack([tb, tb[:1]]))) for tb in tbs]
    for ta in tas:
        pa = _tri_poly(ta, hz, hm)
        bb_a = A.bounds(pa)
        for tb, planes in tb_planes:
            if (
                bb_a[0] > tb[:, 0].max()
                or bb_a[2] < tb[:, 0].min()
                or bb_a[1] > tb[:, 1].max()
                or bb_a[3] < tb[:, 1].min()
            ):
                continue
            piece = A._clip_polygon_convex(pa, planes)
            if not piece.is_empty():
                pieces.append(piece)
    return _pieces_to_geom(pieces, dissolve=dissolve, has_z=hz, has_m=hm)


def difference_tri(ga: Geometry, gb: Geometry, dissolve: bool = True) -> Geometry:
    ga, gb, hz, hm = _norm_zm(ga, gb)
    tas = triangulate(ga)
    tbs = triangulate(gb)
    tb_info = [
        (
            (tb[:, 0].min(), tb[:, 1].min(), tb[:, 0].max(), tb[:, 1].max()),
            A._convex_edges(np.vstack([tb, tb[:1]])),
        )
        for tb in tbs
    ]
    pieces = []
    for ta in tas:
        parts = [_tri_poly(ta, hz, hm)]
        for bb, planes in tb_info:
            nxt = []
            for p in parts:
                pb = A.bounds(p)
                if pb is None:
                    continue
                if pb[0] > bb[2] or pb[2] < bb[0] or pb[1] > bb[3] or pb[3] < bb[1]:
                    nxt.append(p)
                    continue
                nxt.extend(_subtract_convex(p, planes))
            parts = nxt
            if not parts:
                break
        pieces.extend(parts)
    return _pieces_to_geom(pieces, dissolve=dissolve, has_z=hz, has_m=hm)


def union_tri(ga: Geometry, gb: Geometry, dissolve: bool = True) -> Geometry:
    ga, gb, hz, hm = _norm_zm(ga, gb)
    a_parts = [_tri_poly(t, hz, hm) for t in triangulate(ga)]
    diff = difference_tri(gb, ga, dissolve=False)
    pieces = a_parts + [p for p in diff.flatten() if p.tag == G.POLYGON]
    return _pieces_to_geom(pieces, dissolve=dissolve, has_z=hz, has_m=hm)


def buffer_general(
    g: Geometry,
    radius: float,
    nseg: int = 8,
    cap: str = "round",
    join: str = "round",
    mitre_limit: float = 5.0,
) -> Geometry:
    """Buffer of any geometry as a union of convex parts — the Minkowski
    sum with a disk IS exactly per-segment rectangles + per-vertex circles
    for the round style, so the only approximation is the inscribed-circle
    discretization (same convention as GEOS quadrant segments).

    ``cap``: round | flat | square (line endpoints; reference ST_Buffer's
    cap_style arg, geos/functions/scalar.cpp buffer entry).
    ``join``: round | mitre | bevel (corners; mitre falls back to bevel
    past ``mitre_limit`` * radius, GEOS semantics). Negative radius on
    polygons erodes via difference with the boundary's buffer."""
    cap = cap.lower()
    join = join.lower()
    if cap not in ("round", "flat", "square"):
        raise ValueError(f"unknown cap style {cap!r} (round|flat|square)")
    if join not in ("round", "mitre", "miter", "bevel"):
        raise ValueError(f"unknown join style {join!r} (round|mitre|bevel)")
    if join == "miter":
        join = "mitre"
    if radius == 0:
        return g
    n = max(8, 4 * nseg)
    ang = np.linspace(0, 2 * math.pi, n, endpoint=False)
    cos_a, sin_a = np.cos(ang), np.sin(ang)

    def circle(cx, cy, r):
        ring = np.column_stack([cx + r * cos_a, cy + r * sin_a])
        return Geometry(G.POLYGON, [np.vstack([ring, ring[:1]])])

    def seg_rect(p, q, r):
        d = q - p
        L = math.hypot(d[0], d[1])
        if L == 0:
            return None
        nx, ny = -d[1] / L * r, d[0] / L * r
        ring = np.array(
            [
                [p[0] + nx, p[1] + ny],
                [q[0] + nx, q[1] + ny],
                [q[0] - nx, q[1] - ny],
                [p[0] - nx, p[1] - ny],
                [p[0] + nx, p[1] + ny],
            ]
        )
        return Geometry(G.POLYGON, [ring])

    def square_cap(p, other, r):
        """Half-square past endpoint p, away from its neighbor vertex."""
        d = p - other
        L = math.hypot(d[0], d[1])
        if L == 0:
            return None
        ux, uy = d[0] / L * r, d[1] / L * r  # outward along the segment
        nx, ny = -uy, ux
        ring = np.array(
            [
                [p[0] + nx, p[1] + ny],
                [p[0] + ux + nx, p[1] + uy + ny],
                [p[0] + ux - nx, p[1] + uy - ny],
                [p[0] - nx, p[1] - ny],
                [p[0] + nx, p[1] + ny],
            ]
        )
        return Geometry(G.POLYGON, [ring])

    def join_piece(prev, v, nxt, r):
        """Corner fill at interior vertex v between segments prev->v->nxt:
        None for round (caller adds a circle), else a convex bevel triangle
        or mitre quad on the OUTSIDE of the turn."""
        d1 = v - prev
        d2 = nxt - v
        L1 = math.hypot(d1[0], d1[1])
        L2 = math.hypot(d2[0], d2[1])
        if L1 == 0 or L2 == 0:
            return None
        u1 = d1 / L1
        u2 = d2 / L2
        turn = u1[0] * u2[1] - u1[1] * u2[0]
        if abs(turn) < 1e-12:  # collinear: rectangles already cover it
            return None
        # outward normals on the convex side of the corner
        if turn < 0:  # right turn: outside is the left side
            n1 = np.array([-u1[1], u1[0]])
            n2 = np.array([-u2[1], u2[0]])
        else:
            n1 = np.array([u1[1], -u1[0]])
            n2 = np.array([u2[1], -u2[0]])
        p1 = v + r * n1
        p2 = v + r * n2
        if join == "bevel":
            ring = np.array([v, p1, p2, v], dtype=float)
            return Geometry(G.POLYGON, [ring])
        # mitre: offset-line intersection point, limited
        bis = n1 + n2
        bl = math.hypot(bis[0], bis[1])
        if bl < 1e-12:
            return None  # 180-degree reversal: no finite mitre
        cos_half = bl / 2.0
        ratio = 1.0 / cos_half
        if ratio > mitre_limit:
            ring = np.array([v, p1, p2, v], dtype=float)
            return Geometry(G.POLYGON, [ring])
        m = v + (r * ratio) * (bis / bl)
        ring = np.array([v, p1, m, p2, v], dtype=float)
        return Geometry(G.POLYGON, [ring])

    if radius < 0:
        polys = [l for l in g.flatten() if l.tag == G.POLYGON]
        if not polys:
            return G.empty(G.GEOMETRYCOLLECTION)
        body = _pieces_to_geom([Geometry(G.POLYGON, p.data) for p in polys])
        boundary_parts = []
        for p in polys:
            for ring in p.data:
                for i in range(len(ring) - 1):
                    rect = seg_rect(ring[i, :2], ring[i + 1, :2], -radius)
                    if rect is not None:
                        boundary_parts.append(rect)
                    boundary_parts.append(circle(ring[i, 0], ring[i, 1], -radius))
        acc = body
        for part in boundary_parts:
            acc = difference_tri(acc, part, dissolve=False)
            if acc.is_empty():
                return acc
        from .dissolve import try_dissolve

        return try_dissolve(acc)

    def corner(prev, v, nxt):
        if join == "round":
            return circle(float(v[0]), float(v[1]), radius)
        return join_piece(np.asarray(prev[:2], float), np.asarray(v[:2], float),
                          np.asarray(nxt[:2], float), radius)

    parts = []
    for leaf in g.flatten():
        if leaf.tag == G.POINT:
            parts.append(circle(float(leaf.data[0]), float(leaf.data[1]), radius))
        elif leaf.tag == G.LINESTRING:
            arr = leaf.data
            m = len(arr)
            for i in range(m):
                if i in (0, m - 1):  # endpoint: cap style
                    if cap == "round":
                        parts.append(circle(float(arr[i, 0]), float(arr[i, 1]), radius))
                    elif cap == "square" and m > 1:
                        other = arr[1, :2] if i == 0 else arr[m - 2, :2]
                        sq = square_cap(
                            np.asarray(arr[i, :2], float), np.asarray(other, float), radius
                        )
                        if sq is not None:
                            parts.append(sq)
                else:  # interior vertex: join style
                    piece = corner(arr[i - 1, :2], arr[i, :2], arr[i + 1, :2])
                    if piece is not None:
                        parts.append(piece)
                if i + 1 < m:
                    rect = seg_rect(arr[i, :2], arr[i + 1, :2], radius)
                    if rect is not None:
                        parts.append(rect)
        else:  # polygon: body + boundary swept, ring vertices use join style
            parts.append(Geometry(G.POLYGON, leaf.data))
            for ring in leaf.data:
                k = len(ring) - 1  # ring closed: last == first
                for i in range(k):
                    piece = corner(ring[(i - 1) % k, :2], ring[i, :2], ring[(i + 1) % k, :2])
                    if piece is not None:
                        parts.append(piece)
                    rect = seg_rect(ring[i, :2], ring[i + 1, :2], radius)
                    if rect is not None:
                        parts.append(rect)
    if not parts:
        return G.empty(G.GEOMETRYCOLLECTION)
    # union all parts: fold with triangle-difference to keep pieces disjoint
    acc_pieces = [p for p in intersection_keepall(parts)]
    return _pieces_to_geom(acc_pieces, dissolve=True)


def intersection_keepall(parts):
    """Disjoint decomposition of a union of overlapping convex parts:
    part_i minus the previous parts whose bboxes overlap it. The bbox
    prefilter turns a long buffer chain (k segments -> k rects + k caps,
    mostly pairwise-disjoint) from O(k^2) difference calls into
    O(k * local overlaps)."""
    out = []
    prev: list = []  # (part, bbox)
    for p in parts:
        piece = p
        bb = A.bounds(p)
        if bb is None:
            continue
        for q, qb in prev:
            if qb[0] > bb[2] or qb[2] < bb[0] or qb[1] > bb[3] or qb[3] < bb[1]:
                continue
            piece = difference_tri(piece, q, dissolve=False)
            if piece.is_empty():
                break
        if not piece.is_empty():
            out.extend(l for l in piece.flatten() if l.tag == G.POLYGON)
        prev.append((p, bb))
    return out
