"""Unary GEOS-tail semantics pinned by the spatial_unary_ops driver query.

Verifies the semantic contracts behind the pinned oracle literals:
PointOnSurface results actually lie on the geometry, multiline boundaries
follow the SFS mod-2 rule (GEOS BoundaryOp), normalize follows the
JTS/GEOS convention (shells CW, holes CCW, min-vertex start).
Reference: geos/functions/st_boundary.cpp, st_pointonsurface.cpp,
st_normalize.cpp; test/sql/geos/*.test.
"""

import numpy as np

from duckdb_spatial_spark.geo import algorithms as A
from duckdb_spatial_spark.geo import geom as G
from duckdb_spatial_spark.geo import wkt as WKT


def test_boundary_mod2_rule():
    # endpoint (1,1) shared by exactly two curves -> interior, not boundary
    g = WKT.from_wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))")
    b = A.boundary(g)
    pts = sorted((float(p.data[0]), float(p.data[1])) for p in b.data)
    assert pts == [(0.0, 0.0), (2.0, 2.0)]
    # shared by three curves -> odd -> boundary
    g3 = WKT.from_wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2), (1 1, 3 0))")
    b3 = A.boundary(g3)
    pts3 = sorted((float(p.data[0]), float(p.data[1])) for p in b3.data)
    assert (1.0, 1.0) in pts3
    # closed ring component contributes nothing
    gc = WKT.from_wkt("MULTILINESTRING ((0 0, 1 0, 1 1, 0 0), (5 5, 6 6))")
    bc = A.boundary(gc)
    ptsc = sorted((float(p.data[0]), float(p.data[1])) for p in bc.data)
    assert ptsc == [(5.0, 5.0), (6.0, 6.0)]


def test_boundary_all_even_is_empty():
    g = WKT.from_wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 0 0))")
    assert A.boundary(g).is_empty()


def _point_on(g, p):
    """p lies on g (polygon: inside shell minus holes; line: on a segment)."""
    x, y = p
    if g.tag == G.POLYGON:
        probe = G.point(x, y)
        return A.contains(g, probe) or A.intersects(g, probe)
    if g.tag == G.LINESTRING:
        d = g.data
        for i in range(len(d) - 1):
            ax, ay, bx, by = d[i][0], d[i][1], d[i + 1][0], d[i + 1][1]
            cross = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
            if abs(cross) < 1e-9 and min(ax, bx) - 1e-9 <= x <= max(ax, bx) + 1e-9 \
                    and min(ay, by) - 1e-9 <= y <= max(ay, by) + 1e-9:
                return True
        return False
    return bool(np.allclose(g.data[:2], [x, y]))


def test_point_on_surface_is_on_surface():
    cases = [
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
        "LINESTRING (0 0, 3 0, 3 4)",
        "LINESTRING (0 0, 1 0.1, 2 -0.1, 3 0.2, 4 0)",
        "POINT (1.23456 7.65432)",
    ]
    for w in cases:
        g = WKT.from_wkt(w)
        pos = A.point_on_surface(g)
        p = (float(pos.data[0]), float(pos.data[1]))
        leaf = next(iter(g.flatten()))
        assert _point_on(leaf, p), f"{w}: {p} not on surface"
        if leaf.tag == G.POLYGON and len(leaf.data) > 1:
            # must not fall inside a hole
            hole = G.Geometry(G.POLYGON, [leaf.data[1]])
            assert not A.contains_properly(hole, G.point(*p))


def test_normalize_jts_convention():
    g = WKT.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    n = A.normalize(g)
    shell, hole = n.data

    def signed(r):
        r = np.asarray(r)
        return 0.5 * float(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))

    assert signed(shell) < 0  # shell clockwise
    assert signed(hole) > 0  # hole counter-clockwise
    # rings start at their lexicographically smallest vertex
    assert tuple(shell[0][:2]) == (0.0, 0.0)
    assert tuple(hole[0][:2]) == (2.0, 2.0)
    # idempotent
    n2 = A.normalize(n)
    assert WKT.to_wkt(n2) == WKT.to_wkt(n)
