"""Dissolve a disjoint collection of convex pieces into clean polygons.

The triangle-decomposition overlay (:mod:`.overlay`) returns set-exact but
fragmented MULTIPOLYGONs. This pass reconstructs the minimal boundary:

  1. collect every piece edge; insert nodes where other pieces' vertices
     lie on an edge (T-junctions from clipping chains)
  2. a sub-edge is boundary iff its midpoint is NOT interior to the union
     of the *other* pieces (pieces are disjoint, so interior-side edges are
     shared or covered)
  3. stitch surviving directed edges into rings (each boundary vertex has
     matching in/out degree since pieces tile the region)
  4. orient/assign rings: CCW shells, holes by containment

Numerically defensive: if stitching fails to close every ring (float
mismatch along cut lines), the caller falls back to the fragmented result —
never wrong, occasionally un-pretty.
"""

from __future__ import annotations

import math

import numpy as np

from . import algorithms as A
from . import geom as G
from .geom import Geometry

_EPS = 1e-9


def _snap(v: float) -> float:
    return round(v, 9)


def _key(p) -> tuple:
    return (_snap(float(p[0])), _snap(float(p[1])))


def dissolve_pieces(pieces) -> Geometry | None:
    """pieces: list of POLYGON Geometry (disjoint interiors, single ring).
    Returns a dissolved (MULTI)POLYGON or None if tracing failed."""
    polys = [p for p in pieces if p.tag == G.POLYGON and p.data and A.area(p) > 0]
    if not polys:
        return G.empty(G.GEOMETRYCOLLECTION)
    if len(polys) == 1:
        return polys[0]

    # all vertices (for noding) — FULL coordinate width so Z/M survive
    # the re-stitch (keys stay xy-only)
    width = polys[0].data[0].shape[1]
    all_pts = np.vstack([p.data[0][:-1] for p in polys])
    uniq = {}
    for pt in all_pts:
        uniq[_key(pt)] = pt
    vyx = np.array(list(uniq.values())) if uniq else np.empty((0, width))

    # collect directed edges per piece, CCW orientation
    edges = []  # (piece_idx, p, q)
    for pi, poly in enumerate(polys):
        ring = poly.data[0]
        if A._ring_signed_area(poly.data[0]) < 0:
            ring = ring[::-1]
        for i in range(len(ring) - 1):
            p, q = ring[i], ring[i + 1]
            if _key(p) == _key(q):
                continue
            # node: split at any other vertex lying on this edge — use the
            # EXACT node coordinates (recomputing p + t*d drifts off the
            # neighbors' vertices and breaks key matching)
            d = (q - p)[:2]
            L2 = float(d @ d)
            nodes = [(0.0, p), (1.0, q)]
            if len(vyx):
                w = vyx[:, :2] - p[:2]
                cross = np.abs(w[:, 0] * d[1] - w[:, 1] * d[0]) / math.sqrt(L2)
                t = (w @ d) / L2
                on = (cross < 1e-7) & (t > 1e-9) & (t < 1 - 1e-9)
                for idx in np.nonzero(on)[0]:
                    nodes.append((float(t[idx]), vyx[idx]))
            nodes.sort(key=lambda x: x[0])
            for (ta, pa), (tb, pb) in zip(nodes[:-1], nodes[1:]):
                if _key(pa) != _key(pb):
                    edges.append((pi, pa, pb))

    # boundary test: midpoint interior to any OTHER piece?
    out_edges = []
    rowmap: dict = {}
    for (pi, p, q) in edges:
        mx, my = (p[0] + q[0]) / 2, (p[1] + q[1]) / 2
        interior = False
        for pj, poly in enumerate(polys):
            if pj == pi:
                continue
            st = A.point_in_polygon(mx, my, poly)
            if st == 2:
                interior = True
                break
            if st == 1:
                # shared edge: keep only the copy from the lower piece index
                # whose direction is canonical (avoids double boundary)
                interior = True
                break
        if not interior:
            rowmap[_key(p)] = p
            rowmap[_key(q)] = q
            out_edges.append((_key(p), _key(q)))

    if not out_edges:
        return None

    # stitch into rings
    nxt: dict = {}
    for a, b in out_edges:
        nxt.setdefault(a, []).append(b)
    rings = []
    used = set()
    for a, b in out_edges:
        if (a, b) in used:
            continue
        ring = [a]
        cur = a
        prev = None
        guard = 0
        while guard <= len(out_edges) + 1:
            guard += 1
            outs = [t for t in nxt.get(cur, []) if (cur, t) not in used]
            if not outs:
                return None  # dead end: tracing failed
            # prefer the most counter-clockwise turn for proper face tracing
            if prev is None or len(outs) == 1:
                t = outs[0]
            else:
                base = math.atan2(cur[1] - prev[1], cur[0] - prev[0])

                def turn(c):
                    ang = math.atan2(c[1] - cur[1], c[0] - cur[0])
                    return (ang - base + math.pi) % (2 * math.pi)

                t = min(outs, key=turn)
            used.add((cur, t))
            if t == ring[0]:
                ring.append(t)
                rings.append(ring)
                break
            ring.append(t)
            prev, cur = cur, t
        else:
            return None
    if not rings:
        return None

    ring_arrays = [
        np.array([rowmap[k] for k in r], dtype=np.float64) for r in rings if len(r) >= 4
    ]
    if not ring_arrays:
        return None
    shells = []
    holes = []
    for r in ring_arrays:
        sa = A._ring_signed_area(r)
        if abs(sa) < _EPS:
            continue
        (shells if sa > 0 else holes).append(r)
    if not shells:
        return None
    out_polys = [[s] for s in shells]
    for h in holes:
        hx, hy = float(h[0, 0]), float(h[0, 1])
        target = None
        for op in out_polys:
            if A.point_in_ring(hx, hy, op[0]) > 0:
                target = op
                break
        if target is None:
            return None
        target.append(h)
    hz, hm = polys[0].has_z, polys[0].has_m
    geoms = [Geometry(G.POLYGON, op, hz, hm) for op in out_polys]
    result = geoms[0] if len(geoms) == 1 else Geometry(G.MULTIPOLYGON, geoms, hz, hm)

    # sanity: dissolved area must match the pieces' total
    if abs(A.area(result) - sum(A.area(p) for p in polys)) > max(1e-6, 1e-9 * sum(A.area(p) for p in polys)):
        return None
    return result


def try_dissolve(g: Geometry) -> Geometry:
    """Dissolve a fragmented overlay result; returns input on any failure."""
    if g.tag not in (G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        return g
    pieces = [l for l in g.flatten() if l.tag == G.POLYGON]
    if len(pieces) < 2 or any(len(p.data) != 1 for p in pieces):
        return g
    out = dissolve_pieces(pieces)
    return out if out is not None else g
