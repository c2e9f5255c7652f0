"""Polygon triangulation (ear clipping, holes via bridge edges).

Feeds the general overlay engine (:mod:`.overlay`): any polygon becomes a
set of disjoint convex triangles, so boolean ops reduce to the exact
convex half-plane machinery in :mod:`.algorithms`.

Independent implementation of the standard ear-clipping algorithm with
hole bridging (David Eberly's "Triangulation by Ear Clipping" construction:
connect each hole's rightmost vertex to a visible shell vertex).
"""

from __future__ import annotations

import numpy as np

from . import geom as G


def _signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(
        np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    )


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c, eps=0.0):
    d1 = _cross(a, b, p)
    d2 = _cross(b, c, p)
    d3 = _cross(c, a, p)
    has_neg = (d1 < -eps) or (d2 < -eps) or (d3 < -eps)
    has_pos = (d1 > eps) or (d2 > eps) or (d3 > eps)
    return not (has_neg and has_pos)


def _open_ring(ring: np.ndarray) -> np.ndarray:
    """Open + dedupe a ring, KEEPING the full coordinate width: triangles
    slice whole rows, so Z/M ride through the decomposition and the convex
    clip machinery interpolates them at cut vertices."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) > 1 and np.array_equal(pts[0, :2], pts[-1, :2]):
        pts = pts[:-1]
    # drop consecutive duplicates (by xy; extra dims follow their vertex)
    if len(pts) > 1:
        keep = np.concatenate([[True], np.any(np.diff(pts[:, :2], axis=0) != 0, axis=1)])
        pts = pts[keep]
    return pts


def _bridge_holes(shell: np.ndarray, holes: list) -> np.ndarray:
    """Merge holes into the shell with bridge edges -> single simple ring."""
    shell = list(map(tuple, shell))
    # process holes by decreasing max-x (rightmost first)
    hs = sorted((list(map(tuple, h)) for h in holes), key=lambda h: -max(p[0] for p in h))
    for hole in hs:
        # rightmost hole vertex (by xy only — rows may carry Z/M)
        hi = max(range(len(hole)), key=lambda i: (hole[i][0], hole[i][1]))
        hp = hole[hi]
        # find visible shell vertex: nearest shell vertex right of hp with
        # unobstructed segment (simple robust heuristic: nearest by distance
        # among vertices whose connecting segment crosses no shell edge)
        best = None
        best_d = None
        n = len(shell)
        for j in range(n):
            sp = shell[j]
            d = (sp[0] - hp[0]) ** 2 + (sp[1] - hp[1]) ** 2
            if best_d is not None and d >= best_d:
                continue
            # does segment hp-sp cross any shell edge (excluding edges at j)?
            ok = True
            for k in range(n):
                if k == j or (k + 1) % n == j:
                    continue
                a, b = shell[k], shell[(k + 1) % n]
                if _segs_properly_cross(hp, sp, a, b):
                    ok = False
                    break
            if ok:
                for k in range(len(hole)):
                    if k == hi or (k + 1) % len(hole) == hi:
                        continue
                    a, b = hole[k], hole[(k + 1) % len(hole)]
                    if _segs_properly_cross(hp, sp, a, b):
                        ok = False
                        break
            if ok:
                best, best_d = j, d
        if best is None:
            best = max(range(n), key=lambda j: shell[j][0] >= hp[0])
        # splice: shell[..best] + [shell[best], hp] + hole rotated at hi + [hp? ]
        rotated = hole[hi:] + hole[:hi]
        shell = shell[: best + 1] + [hole[hi]] + rotated[1:] + [hole[hi], shell[best]] + shell[best + 1 :]
    return np.asarray(shell)


def _segs_properly_cross(p, q, a, b):
    d1 = _cross(p, q, a)
    d2 = _cross(p, q, b)
    d3 = _cross(a, b, p)
    d4 = _cross(a, b, q)
    return (d1 > 0) != (d2 > 0) and (d3 > 0) != (d4 > 0) and d1 != 0 and d2 != 0 and d3 != 0 and d4 != 0


def triangulate_ring(pts: np.ndarray):
    """Ear-clip a simple ring (open, any orientation) -> list of (3,2) arrays."""
    pts = np.asarray(pts, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return []
    if _signed_area(pts) < 0:
        pts = pts[::-1]
        n = len(pts)
    idx = list(range(n))
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 4 * n * n:
        guard += 1
        found = False
        m = len(idx)
        for ii in range(m):
            i0, i1, i2 = idx[(ii - 1) % m], idx[ii], idx[(ii + 1) % m]
            a, b, c = pts[i0], pts[i1], pts[i2]
            if _cross(a, b, c) <= 0:
                continue  # reflex or collinear
            # no other (reflex) vertex strictly blocking the candidate ear;
            # bridge splices duplicate coordinates, so compare by value
            ear_ok = True
            for kk in range(m):
                jj = idx[kk]
                if jj in (i0, i1, i2):
                    continue
                p = pts[jj]
                if (
                    (p[0] == a[0] and p[1] == a[1])
                    or (p[0] == b[0] and p[1] == b[1])
                    or (p[0] == c[0] and p[1] == c[1])
                ):
                    continue
                # only reflex vertices can invalidate an ear
                pv = pts[idx[(kk - 1) % m]]
                nx = pts[idx[(kk + 1) % m]]
                if _cross(pv, p, nx) > 0:
                    continue
                if _point_in_tri(p, a, b, c):
                    ear_ok = False
                    break
            if ear_ok:
                tris.append(np.array([a, b, c]))
                idx.pop(ii)
                found = True
                break
        if not found:
            # fallback: clip the least-reflex ear to guarantee progress
            ii = max(
                range(len(idx)),
                key=lambda k: _cross(
                    pts[idx[(k - 1) % len(idx)]], pts[idx[k]], pts[idx[(k + 1) % len(idx)]]
                ),
            )
            i0, i1, i2 = idx[(ii - 1) % len(idx)], idx[ii], idx[(ii + 1) % len(idx)]
            tri = np.array([pts[i0], pts[i1], pts[i2]])
            if abs(_signed_area(tri)) > 0:
                tris.append(tri)
            idx.pop(ii)
    if len(idx) == 3:
        tri = pts[idx]
        if abs(_signed_area(tri)) > 0:
            tris.append(tri.copy())
    return tris


def triangulate_polygon(poly: G.Geometry):
    """Polygon (with holes) -> list of CCW triangles (3,2). Degenerate
    rings are dropped."""
    if poly.tag != G.POLYGON or not poly.data:
        return []
    shell = _open_ring(poly.data[0])
    holes = [_open_ring(h) for h in poly.data[1:]]
    holes = [h for h in holes if len(h) >= 3]
    if len(shell) < 3:
        return []
    if _signed_area(shell) < 0:
        shell = shell[::-1]
    # holes must be CW for the bridged ring to stay simple
    holes = [h[::-1] if _signed_area(h) > 0 else h for h in holes]
    ring = _bridge_holes(shell, holes) if holes else shell
    return triangulate_ring(ring)


def triangulate(g: G.Geometry):
    """Any geometry -> triangles of its polygonal parts."""
    tris = []
    for leaf in g.flatten():
        if leaf.tag == G.POLYGON:
            tris.extend(triangulate_polygon(leaf))
    return tris
