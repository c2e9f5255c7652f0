"""Exact DE-9IM predicate matrix — pinned GEOS/PostGIS semantics.

Each row pins (touches, crosses, overlaps, equals) for a geometry pair,
including the cases the round-1 sampled implementation could get wrong
(partial collinear overlap whose midpoints miss the shared piece, lines
riding polygon boundaries, mixed collections)."""

import pytest

from duckdb_spatial_spark.geo import algorithms as A, from_wkt
from duckdb_spatial_spark.geo.relate import relate9

# (wkt_a, wkt_b, touches, crosses, overlaps, equals)
CASES = [
    # --- line / line ---
    ("LINESTRING (0 0, 10 0)", "LINESTRING (9 0, 30 0)", False, False, True, False),
    ("LINESTRING (0 0, 10 0)", "LINESTRING (4 0, 6 0)", False, False, False, False),  # covers
    ("LINESTRING (0 0, 10 10)", "LINESTRING (0 10, 10 0)", False, True, False, False),
    ("LINESTRING (0 0, 1 1)", "LINESTRING (1 1, 2 0)", True, False, False, False),
    ("LINESTRING (0 0, 2 0)", "LINESTRING (1 0, 1 5)", True, False, False, False),
    ("LINESTRING (0 0, 2 0)", "LINESTRING (1 -1, 1 1)", False, True, False, False),
    ("LINESTRING (0 0, 2 0)", "MULTILINESTRING ((0 0, 1 0), (1 0, 2 0))", False, False, False, True),
    ("LINESTRING (0 0, 5 0)", "LINESTRING (5 0, 9 0)", True, False, False, False),
    # --- polygon / polygon ---
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))", True, False, False, False),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", True, False, False, False),
    ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))", False, False, True, False),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", False, False, False, False),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", False, False, False, False),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((1 1, 0 1, 0 0, 1 0, 1 1))", False, False, False, True),
    ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)))", False, False, False, True),
    # --- line / polygon ---
    ("LINESTRING (-1 0.5, 3 0.5)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", False, True, False, False),
    ("LINESTRING (0.2 0.5, 0.8 0.5)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", False, False, False, False),
    ("LINESTRING (0 0, 1 0)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", True, False, False, False),
    ("LINESTRING (0 0, 2 0)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", True, False, False, False),
    ("LINESTRING (0.5 0.5, 2 0.5)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", False, True, False, False),
    # --- point mixes ---
    ("POINT (1 0)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", True, False, False, False),
    ("POINT (0.5 0.5)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", False, False, False, False),
    ("MULTIPOINT (0.5 0.5, 5 5)", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", False, True, False, False),
    ("MULTIPOINT (0.5 0.5, 5 5)", "MULTIPOINT (0.5 0.5, 9 9)", False, False, True, False),
    ("POINT (3 3)", "POINT (3 3)", False, False, False, True),
    ("MULTIPOINT (1 0, 2 0)", "LINESTRING (0 0, 3 0)", False, False, False, False),  # within
    ("MULTIPOINT (0 0, 5 5)", "LINESTRING (0 0, 3 0)", True, False, False, False),  # bnd touch only
    # --- collections ---
    (
        "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 1 0))",
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        True, False, False, False,
    ),
    (
        "GEOMETRYCOLLECTION (POINT (0.5 0.5), LINESTRING (4 4, 6 4))",
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
        False, True, False, False,
    ),
    # hole interactions: b fills a's hole exactly -> touches along hole ring
    (
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))",
        "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",
        True, False, False, False,
    ),
    # b inside a's hole, not touching
    (
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))",
        "POLYGON ((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))",
        False, False, False, False,
    ),
]


@pytest.mark.parametrize("wa,wb,t,c,o,e", CASES)
def test_de9im_predicates(wa, wb, t, c, o, e):
    a, b = from_wkt(wa), from_wkt(wb)
    assert A.touches(a, b) == t, f"touches({wa}, {wb})"
    assert A.crosses(a, b) == c, f"crosses({wa}, {wb})"
    assert A.overlaps(a, b) == o, f"overlaps({wa}, {wb})"
    assert A.equals(a, b) == e, f"equals({wa}, {wb})"
    # symmetry (all four are symmetric predicates)
    assert A.touches(b, a) == t
    assert A.crosses(b, a) == c
    assert A.overlaps(b, a) == o
    assert A.equals(b, a) == e


def test_matrix_cells_line_cross():
    M = relate9(from_wkt("LINESTRING (0 0, 2 2)"), from_wkt("LINESTRING (0 2, 2 0)"))
    assert M[0][0] == 0  # interiors meet at a point
    assert M[0][2] == 1 and M[2][0] == 1
    assert M[1][2] == 0 and M[2][1] == 0  # endpoints in each other's exterior


def test_matrix_cells_shared_edge_squares():
    M = relate9(
        from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        from_wkt("POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))"),
    )
    assert M[0][0] == -1  # interiors disjoint
    assert M[1][1] == 1  # boundaries share a 1D piece
    assert M[0][2] == 2 and M[2][0] == 2


def test_disjoint_and_empty():
    a = from_wkt("POINT (0 0)")
    b = from_wkt("POINT (5 5)")
    assert not A.touches(a, b) and not A.equals(a, b)
    assert A.equals(from_wkt("POINT EMPTY"), from_wkt("LINESTRING EMPTY"))


# ---------------------------------------------------------------------------
# adversarial / near-degenerate noding cases (round-4; bar:
# reference test/sql/geos/predicates.test). The eps in relate9 is relative
# (1e-9 * coordinate scale) — these pin that it stays scale-aware.
# ---------------------------------------------------------------------------
import math

import numpy as np

from duckdb_spatial_spark.geo import geom as G
from duckdb_spatial_spark.geo import relate as R


def _poly(pts):
    ring = list(pts) + [pts[0]]
    return G.Geometry(G.POLYGON, [np.array(ring, dtype=float)])


@pytest.mark.parametrize("S", [1.0, 1e6, 1e8])
def test_predicates_scale_invariant(S):
    a = _poly([(0, 0), (2 * S, 0), (2 * S, 2 * S), (0, 2 * S)])
    # exact shared edge -> touches
    b = _poly([(2 * S, 0), (4 * S, 0), (4 * S, 2 * S), (2 * S, 2 * S)])
    assert R.im_touches(R.relate9(a, b))
    # edge offset far below eps (1e-12 * S) -> still touches, not overlap
    d = 1e-12 * S
    b2 = _poly([(2 * S + d, 0), (4 * S, 0), (4 * S, 2 * S), (2 * S + d, 2 * S)])
    assert R.im_touches(R.relate9(a, b2))
    # gap well above eps -> disjoint
    d = 1e-6 * S
    b3 = _poly([(2 * S + d, 0), (4 * S, 0), (4 * S, 2 * S), (2 * S + d, 2 * S)])
    assert not R.im_intersects(R.relate9(a, b3))
    # genuine overlap unaffected
    b4 = _poly([(S, 0), (3 * S, 0), (3 * S, 2 * S), (S, 2 * S)])
    assert R.im_overlaps(R.relate9(a, b4), 2, 2)


def _rot(pts, th, cx, cy):
    c, s = math.cos(th), math.sin(th)
    return [((x - cx) * c - (y - cy) * s + cx, (x - cx) * s + (y - cy) * c + cy) for x, y in pts]


@pytest.mark.parametrize("off", [0.0, 1e7])
@pytest.mark.parametrize("th", [0.1, 0.3, math.pi / 4, 1.1])
def test_overlay_invariants_rotated(off, th):
    """area(A)+area(B) == area(A∪B)+area(A∩B) and diff == A minus I for
    rotated overlapping squares, including at a 1e7 coordinate offset where
    absolute-eps noding would collapse."""
    sq = [(0, 0), (2, 0), (2, 2), (0, 2)]
    a = _poly([(x + off, y + off) for x, y in sq])
    b = _poly([(x + off, y + off) for x, y in _rot(sq, th, 1, 1)])
    ai = A.area(A.intersection(a, b))
    au = A.area(A.union(a, b))
    ad = A.area(A.difference(a, b))
    tol = 1e-6 * max(1.0, off / 1e3)
    assert abs((au + ai) - 8.0) < tol
    assert abs(ad - (4.0 - ai)) < tol


def test_near_parallel_crossing_and_slivers():
    # bottom edge of b crosses a at ~1e-8 radian grazing angle
    a = _poly([(0, 0), (10, 0), (10, 1), (0, 1)])
    b = _poly([(0, 0.5 - 5e-8), (10, 0.5 + 5e-8), (10, 1.5), (0, 1.5)])
    assert R.im_overlaps(R.relate9(a, b), 2, 2)
    assert abs(A.area(A.intersection(a, b)) - 5.0) < 1e-5
    # 1e-9-thin sliver rectangle still intersects exactly
    sliver = _poly([(0, 0), (10, 0), (10, 1e-9), (0, 1e-9)])
    box = _poly([(5, -1), (6, -1), (6, 1), (5, 1)])
    assert abs(A.area(A.intersection(sliver, box)) - 1e-9) < 1e-15
    # corner-only contact is touches, never overlap
    c = _poly([(2, 2), (4, 2), (4, 4), (2, 4)])
    d = _poly([(4, 4), (6, 4), (6, 6), (4, 6)])
    M = R.relate9(c, d)
    assert R.im_touches(M) and not R.im_overlaps(M, 2, 2)
