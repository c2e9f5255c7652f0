"""Geometry kernel unit tests.

WKT literals mirror the reference's test corpus
(``/root/reference/test/sql/geometry/*.test`` — e.g. the tiny-precision
polygon from ``st_area.test:135-138`` and the FIXTURES.md T1/T6/T7 rows).
"""

import math

from duckdb_spatial_spark.geo import algorithms as A
from duckdb_spatial_spark.geo import from_wkb, from_wkt, geom as G, to_wkb, to_wkt

ROUNDTRIP_CASES = [
    "POINT (0 0)",
    "POINT EMPTY",
    "LINESTRING (0 0, 1 1, 2 2)",
    "LINESTRING EMPTY",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
    "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))",
    "MULTIPOINT (0 0, 1 1)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
    "GEOMETRYCOLLECTION (POINT (0 0), LINESTRING (0 0, 1 1), POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))",
    "GEOMETRYCOLLECTION EMPTY",
    "POINT Z (0 0 0)",
    "POINT M (1 2 3)",
    "POINT ZM (1 2 3 4)",
    "LINESTRING Z (0 0 0, 1 1 1)",
]


def test_wkt_wkb_roundtrip():
    for c in ROUNDTRIP_CASES:
        g = from_wkt(c)
        assert to_wkt(from_wkb(to_wkb(g))) == c


def test_measures():
    p = from_wkt(
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), (0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))"
    )
    assert abs(A.area(p) - 0.64) < 1e-12
    assert abs(A.perimeter(p) - 6.4) < 1e-12
    assert A.length(from_wkt("LINESTRING (0 0, 3 4)")) == 5.0
    sq = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert A.centroid(sq) == (1.0, 1.0)
    # reference st_area.test:135-138 precision case
    tiny = from_wkt(
        "POLYGON ((-82.03623 29.60482, -82.0357 29.605, -82.03526 29.60513, -82.03623 29.60482))"
    )
    assert abs(A.area(tiny) - 5.15e-09) < 2e-10


def test_point_in_polygon():
    sq = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert A.point_in_polygon(1, 1, sq) == 2
    assert A.point_in_polygon(0, 0, sq) == 1
    assert A.point_in_polygon(5, 5, sq) == 0
    hole = from_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    )
    assert A.point_in_polygon(2, 2, hole) == 0  # inside the hole = outside
    assert A.point_in_polygon(0.5, 0.5, hole) == 2


def test_predicates():
    sq = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert A.contains(sq, from_wkt("POINT (1 1)"))
    assert not A.contains(sq, from_wkt("POINT (0 0)"))  # boundary: not contained
    assert A.covers(sq, from_wkt("POINT (0 0)"))
    assert A.within(from_wkt("POINT (1 1)"), sq)
    l1, l2 = from_wkt("LINESTRING (0 0, 2 2)"), from_wkt("LINESTRING (0 2, 2 0)")
    assert A.crosses(l1, l2) and not A.touches(l1, l2)
    assert A.touches(l1, from_wkt("LINESTRING (2 2, 3 0)"))
    sq2 = from_wkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    assert A.overlaps(sq, sq2)
    assert A.touches(sq, from_wkt("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"))
    assert A.equals(
        from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"),
        from_wkt("POLYGON ((1 1, 0 1, 0 0, 1 0, 1 1))"),
    )
    assert A.disjoint(sq, from_wkt("POINT (9 9)"))


def test_overlay_convex():
    sq = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    sq2 = from_wkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    assert abs(A.area(A.intersection(sq, sq2)) - 1.0) < 1e-12
    assert abs(A.area(A.union(sq, sq2)) - 7.0) < 1e-9
    assert abs(A.area(A.difference(sq, sq2)) - 3.0) < 1e-9
    # overlapping unit squares at 50% offsets (FIXTURES T7 pattern)
    sqs = [
        from_wkt(f"POLYGON (({x} 0, {x + 1} 0, {x + 1} 1, {x} 1, {x} 0))")
        for x in (0, 0.5, 1.0)
    ]
    assert abs(A.area(A.union_all(sqs)) - 2.0) < 1e-9
    assert abs(A.area(A.intersection_all(sqs[:2])) - 0.5) < 1e-9


def test_distance():
    assert A.distance(from_wkt("POINT (0 0)"), from_wkt("POINT (3 4)")) == 5.0
    sq = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert A.distance(sq, from_wkt("POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))")) == 0.0
    assert abs(A.distance(from_wkt("POINT (3 0)"), sq) - 1.0) < 1e-12
    sl = A.shortest_line(from_wkt("POINT (3 0)"), sq)
    assert to_wkt(sl) == "LINESTRING (3 0, 2 0)"


def test_constructive():
    hull = A.convex_hull(from_wkt("MULTIPOINT (0 0, 1 0, 1 1, 0 1, 0.5 0.5)"))
    assert abs(A.area(hull) - 1.0) < 1e-12
    simp = A.simplify(from_wkt("LINESTRING (0 0, 1 0.01, 2 0)"), 0.1)
    assert simp.num_points() == 2
    buf = A.buffer(from_wkt("POINT (0 0)"), 1.0)
    assert abs(A.area(buf) - math.pi) < 0.03
    env = A.envelope(from_wkt("LINESTRING (0 0, 2 3)"))
    assert A.area(env) == 6.0


def test_validity_repair():
    bow = from_wkt("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))")  # FIXTURES T6 bowtie
    assert not A.is_valid(bow)
    mv = A.make_valid(bow)
    assert A.is_valid(mv) and mv.tag == G.MULTIPOLYGON
    assert abs(A.area(mv) - 0.5) < 1e-9
    rr = A.remove_repeated_points(from_wkt("LINESTRING (0 0, 0 0, 1 1)"))
    assert rr.num_points() == 2


def test_structural_ops():
    sq = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    assert A.boundary(sq).tag == G.LINESTRING
    assert A.is_closed(from_wkt("LINESTRING (0 0, 1 0, 1 1, 0 0)"))
    assert not A.is_simple(from_wkt("LINESTRING (0 0, 2 2, 2 0, 0 2)"))
    pos = A.point_on_surface(sq)
    assert A.point_in_polygon(float(pos.data[0]), float(pos.data[1]), sq) == 2
    lm = A.line_merge(from_wkt("MULTILINESTRING ((0 0, 1 1), (1 1, 2 2))"))
    assert to_wkt(lm) == "LINESTRING (0 0, 1 1, 2 2)"
    assert to_wkt(A.reverse(from_wkt("LINESTRING (0 0, 1 1)"))) == "LINESTRING (1 1, 0 0)"
    assert to_wkt(A.flip_coordinates(from_wkt("POINT (1 2)"))) == "POINT (2 1)"
    f3 = A.force_dims(from_wkt("POINT (1 2)"), True, False, 9.0)
    assert to_wkt(f3) == "POINT Z (1 2 9)"
    assert to_wkt(A.force_dims(from_wkt("POINT Z (1 2 3)"), False, False)) == "POINT (1 2)"


def test_collect_semantics():
    pts = [from_wkt("POINT (0 0)"), from_wkt("POINT (1 1)")]
    assert G.collect(pts).tag == G.MULTIPOINT
    mixed = [from_wkt("POINT (0 0)"), from_wkt("LINESTRING (0 0, 1 1)")]
    assert G.collect(mixed).tag == G.GEOMETRYCOLLECTION
    assert G.collect([]).tag == G.GEOMETRYCOLLECTION
    assert G.multi(from_wkt("POINT (0 0)")).tag == G.MULTIPOINT


def test_makevalid_multi_crossing():
    """General self-intersection repair (beyond the single-crossing bowtie)."""
    import math

    pts = []
    for k in range(5):
        ang = math.pi / 2 + k * 4 * math.pi / 5
        pts.append((round(math.cos(ang), 6), round(math.sin(ang), 6)))
    star = from_wkt(
        "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in pts + [pts[0]]) + "))"
    )
    assert not A.is_valid(star)
    mv = A.make_valid(star)
    assert A.is_valid(mv) and A.area(mv) > 0

    double = from_wkt("POLYGON ((0 0, 2 2, 2 0, 0 2, 4 2, 4 0, 0 0))")
    mv2 = A.make_valid(double)
    assert A.is_valid(mv2) and A.area(mv2) > 0


def test_line_line_difference_collinear():
    # ADVICE r1: collinear overlap must be removed (GEOS semantics)
    a = from_wkt("LINESTRING (0 0, 10 0)")
    b = from_wkt("LINESTRING (4 0, 6 0)")
    d = A.difference(a, b)
    assert abs(A.length(d) - 8.0) < 1e-9
    parts = [l for l in d.flatten() if l.tag == G.LINESTRING]
    assert len(parts) == 2
    # crossing at a point removes nothing
    c = from_wkt("LINESTRING (5 -1, 5 1)")
    d2 = A.difference(a, c)
    assert abs(A.length(d2) - 10.0) < 1e-9
    # full cover -> empty
    d3 = A.difference(b, a)
    assert d3.is_empty()
    # point minus covering line -> empty; off-line point survives
    assert A.difference(from_wkt("POINT (5 0)"), a).is_empty()
    assert not A.difference(from_wkt("POINT (5 1)"), a).is_empty()


def test_negative_buffer_low_dim_empty():
    # ADVICE r1: GEOS returns POLYGON EMPTY for negative buffer of 0/1-D
    assert A.buffer(from_wkt("POINT (1 1)"), -1.0).is_empty()
    assert A.buffer(from_wkt("LINESTRING (0 0, 5 0)"), -0.5).is_empty()
    # positive point buffer still a disc
    disc = A.buffer(from_wkt("POINT (0 0)"), 1.0)
    assert abs(A.area(disc) - math.pi) < 0.03  # 32-gon inscribed-area deficit


def test_wkt_nan_roundtrip():
    # ADVICE r1: writer emits 'nan' for partially-NaN points; reader accepts
    import struct

    wkb = b"\x01\x01\x00\x00\x00" + struct.pack("<dd", float("nan"), 2.0)
    w = to_wkt(from_wkb(wkb))
    g = from_wkt(w)  # must not raise
    assert g.tag == G.POINT


def test_overlay_z_interpolation():
    # Z on vertices introduced at the clip line is linearly interpolated
    line = from_wkt("LINESTRING Z (0 0 0, 10 0 100)")
    box = from_wkt("POLYGON ((2 -1, 6 -1, 6 1, 2 1, 2 -1))")
    out = A.intersection(line, box)
    assert out.has_z
    arr = [l.data for l in out.flatten() if l.tag == G.LINESTRING][0]
    zs = {round(float(r[0]), 6): round(float(r[2]), 6) for r in arr}
    assert zs[2.0] == 20.0 and zs[6.0] == 60.0  # z = 10 * x on this line

    poly = from_wkt("POLYGON Z ((0 0 0, 4 0 40, 4 4 80, 0 4 40, 0 0 0))")
    clip = from_wkt("POLYGON ((2 -1, 9 -1, 9 9, 2 9, 2 -1))")
    cut = A.intersection(poly, clip)
    assert cut.has_z
    ring = [l for l in cut.flatten() if l.tag == G.POLYGON][0].data[0]
    at_x2 = {round(float(r[1]), 6): round(float(r[2]), 6) for r in ring if abs(r[0] - 2.0) < 1e-9}
    assert at_x2[0.0] == 20.0  # on edge (0 0 0)->(4 0 40)
