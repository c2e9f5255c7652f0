"""Property-based kernel tests (hypothesis) — mirrors the reference's
randomized fuzz strategy (test/python/rtree_fuzz.py) at the kernel level."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from duckdb_spatial_spark.geo import algorithms as A, from_wkb, from_wkt, geom as G, to_wkb, to_wkt

coord = st.floats(-1000, 1000, allow_nan=False, allow_infinity=False).map(lambda v: round(v, 6))


@st.composite
def points(draw):
    return G.point(draw(coord), draw(coord))


@st.composite
def linestrings(draw):
    n = draw(st.integers(2, 8))
    return G.linestring([[draw(coord), draw(coord)] for _ in range(n)])


@st.composite
def boxes(draw):
    x1, y1 = draw(coord), draw(coord)
    w = draw(st.floats(0.001, 100)).__round__(6)
    h = draw(st.floats(0.001, 100)).__round__(6)
    return G.box_polygon(x1, y1, x1 + w, y1 + h)


any_geom = st.one_of(points(), linestrings(), boxes())


@given(any_geom)
@settings(max_examples=150, deadline=None)
def test_wkb_roundtrip(g):
    assert to_wkt(from_wkb(to_wkb(g))) == to_wkt(g)


@given(any_geom)
@settings(max_examples=150, deadline=None)
def test_wkt_roundtrip(g):
    assert to_wkt(from_wkt(to_wkt(g))) == to_wkt(g)


@given(any_geom, any_geom)
@settings(max_examples=100, deadline=None)
def test_predicate_duality(a, b):
    assert A.intersects(a, b) == A.intersects(b, a)
    assert A.disjoint(a, b) == (not A.intersects(a, b))
    assert A.within(a, b) == A.contains(b, a)
    assert A.covered_by(a, b) == A.covers(b, a)
    if A.contains(a, b):
        assert A.covers(a, b)  # contains implies covers
    if A.within(a, b):
        assert A.intersects(a, b)  # within implies intersects


@given(any_geom, any_geom)
@settings(max_examples=100, deadline=None)
def test_distance_symmetry_and_consistency(a, b):
    d1, d2 = A.distance(a, b), A.distance(b, a)
    assert abs(d1 - d2) < 1e-9
    assert (d1 == 0.0) == A.intersects(a, b)


@given(boxes(), boxes())
@settings(max_examples=80, deadline=None)
def test_box_overlay_area_algebra(a, b):
    ia = A.area(A.intersection(a, b))
    ua = A.area(A.union(a, b))
    da = A.area(A.difference(a, b))
    assert abs((ia + ua) - (A.area(a) + A.area(b))) < 1e-6  # inclusion-exclusion
    assert abs(da - (A.area(a) - ia)) < 1e-6
    assert ia >= -1e-12 and ua <= A.area(a) + A.area(b) + 1e-9


@given(any_geom)
@settings(max_examples=100, deadline=None)
def test_invariants_under_transform(g):
    assert abs(A.area(A.reverse(g)) - A.area(g)) < 1e-9
    assert abs(A.length(A.reverse(g)) - A.length(g)) < 1e-9
    assert abs(A.area(A.normalize(g)) - A.area(g)) < 1e-9
    fl = A.flip_coordinates(A.flip_coordinates(g))
    assert to_wkt(fl) == to_wkt(g)
    b1 = A.bounds(g)
    b2 = A.bounds(A.flip_coordinates(g))
    if b1 is not None:
        assert b2 == (b1[1], b1[0], b1[3], b1[2])


@given(boxes(), st.floats(0.01, 5).map(lambda v: round(v, 4)))
@settings(max_examples=40, deadline=None)
def test_buffer_grows_area(b, r):
    buf = A.buffer(b, r)
    assert A.area(buf) > A.area(b)
    assert A.covers(buf, b) or A.area(A.difference(b, buf)) < 1e-6


@given(linestrings(), st.floats(0.001, 10))
@settings(max_examples=60, deadline=None)
def test_simplify_reduces_points(l, tol):
    s = A.simplify(l, tol)
    assert s.num_points() <= l.num_points()
    assert s.num_points() >= 2
    # endpoints preserved
    assert np.array_equal(s.data[0], l.data[0]) and np.array_equal(s.data[-1], l.data[-1])


@given(st.lists(points(), min_size=1, max_size=20))
@settings(max_examples=60, deadline=None)
def test_hull_contains_all_points(pts):
    mp = G.collect(pts)
    hull = A.convex_hull(mp)
    for p in pts:
        assert A.covers(hull, p) or A.distance(hull, p) < 1e-9


@st.composite
def l_polygons(draw):
    """Concave L-shaped polygon at a random offset/scale."""
    ox, oy = draw(coord), draw(coord)
    s = draw(st.floats(0.5, 50).map(lambda v: round(v, 4)))
    return G.Geometry(G.POLYGON, [np.asarray([
        [ox, oy], [ox + 4 * s, oy], [ox + 4 * s, oy + s],
        [ox + s, oy + s], [ox + s, oy + 4 * s], [ox, oy + 4 * s], [ox, oy],
    ])])


@given(linestrings(), l_polygons())
@settings(max_examples=60, deadline=None)
def test_line_areal_overlay_length_conservation(ln, poly):
    """len(ln ∩ poly) + len(ln \\ poly) == len(ln) — the mixed-dimension
    overlay must partition the line exactly (triangle interval-union
    intersection + progressive half-plane difference agree)."""
    inter = A.intersection(ln, poly)
    diff = A.difference(ln, poly)
    total = A.length(ln)
    got = A.length(inter) + A.length(diff)
    assert math.isclose(got, total, rel_tol=1e-9, abs_tol=1e-6)


@given(linestrings(), linestrings())
@settings(max_examples=60, deadline=None)
def test_line_line_intersection_symmetry_and_containment(la, lb):
    """L x L intersection is symmetric and its 1D part is covered by both
    inputs (0D points lie on both lines)."""
    ab = A.intersection(la, lb)
    ba = A.intersection(lb, la)
    assert math.isclose(A.length(ab), A.length(ba), rel_tol=1e-9, abs_tol=1e-9)
    for leaf in ab.flatten():
        if leaf.tag == G.POINT and not leaf.is_empty():
            # the located point is a float computation: within ulp-scale
            # distance of both inputs (GEOS has the same contract)
            assert A.distance(leaf, la) < 1e-6 and A.distance(leaf, lb) < 1e-6


@given(l_polygons(), l_polygons())
@settings(max_examples=40, deadline=None)
def test_areal_overlay_area_conservation(pa, pb):
    """area(a ∩ b) + area(a \\ b) == area(a) — the triangle-decomposition
    overlay must partition a's area exactly, concave x concave included."""
    inter = A.intersection(pa, pb)
    diff = A.difference(pa, pb)
    total = A.area(pa)
    got = A.area(inter) + A.area(diff)
    assert math.isclose(got, total, rel_tol=1e-7, abs_tol=1e-6)


@given(l_polygons(), boxes())
@settings(max_examples=40, deadline=None)
def test_union_area_inclusion_exclusion(pa, pb):
    """area(a ∪ b) == area(a) + area(b) - area(a ∩ b)."""
    u = A.area(A.union(pa, pb))
    want = A.area(pa) + A.area(pb) - A.area(A.intersection(pa, pb))
    assert math.isclose(u, want, rel_tol=1e-7, abs_tol=1e-6)


@given(
    st.floats(-179.9, 179.9).map(lambda v: round(v, 5)),
    st.floats(-84.9, 84.9).map(lambda v: round(v, 5)),
)
@settings(max_examples=60, deadline=None)
def test_webmerc_transform_roundtrip(lon, lat):
    """4326 -> 3857 -> 4326 returns to the input within 1e-9 deg."""
    from duckdb_spatial_spark.functions.crs import transform_xy

    x, y = transform_xy(np.array([lon]), np.array([lat]), "EPSG:4326", "EPSG:3857", always_xy=True)
    lon2, lat2 = transform_xy(x, y, "EPSG:3857", "EPSG:4326", always_xy=True)
    assert abs(float(lon2[0]) - lon) < 1e-9
    assert abs(float(lat2[0]) - lat) < 1e-9


@given(boxes(), st.floats(0.05, 5.0).map(lambda v: round(v, 3)))
@settings(max_examples=30, deadline=None)
def test_buffer_area_bounds(poly, r):
    """area(buffer(P, r)) lies within the exact Minkowski bounds for a
    rectangle: A + perimeter*r + pi*r^2 is the exact value (circular
    corners); the polygonal approximation is <= exact and >= the
    inscribed (nseg-gon corner) value."""
    A = A_mod.area(poly)
    per = A_mod.perimeter(poly)
    buf = A_mod.buffer(poly, r)
    got = A_mod.area(buf)
    exact = A + per * r + math.pi * r * r
    assert got <= exact + 1e-6
    # 8-segment default quarter-corners: inscribed polygon of the corner
    # circle has area >= pi*r^2 * (nseg/pi)*sin(pi/nseg) with nseg*4 sides
    assert got >= A + per * r + math.pi * r * r * 0.97 - 1e-6


A_mod = A
