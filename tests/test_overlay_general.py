"""General (concave) overlay, triangulation, and general buffers."""

import math

import numpy as np
import pytest

from duckdb_spatial_spark.geo import algorithms as A, from_wkt, geom as G
from duckdb_spatial_spark.geo.triangulate import triangulate_polygon

# L-shaped concave polygon, area 3
L_SHAPE = "POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
# U-shaped concave polygon, area 5
U_SHAPE = "POLYGON ((0 0, 3 0, 3 2, 2 2, 2 1, 1 1, 1 2, 0 2, 0 0))"
# square with hole, area 8
HOLED = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"


def test_triangulation_areas():
    for wkt, expected in [(L_SHAPE, 3.0), (U_SHAPE, 5.0), (HOLED, 8.0)]:
        tris = triangulate_polygon(from_wkt(wkt))
        total = sum(abs(np.cross(t[1] - t[0], t[2] - t[0])) / 2 for t in tris)
        assert abs(total - expected) < 1e-9, wkt


def test_concave_intersection():
    l_shape = from_wkt(L_SHAPE)
    # concave x concave: L and its mirror overlap in [0,1]x[0,1] + corners
    sq = from_wkt("POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))")
    inter = A.intersection(l_shape, sq)
    # region of sq inside L: area = 0.75 (sq minus the [1,1.5]x[1,1.5] notch
    # and nothing else: L covers x<=2,y<=1 and x<=1,y<=2)
    assert abs(A.area(inter) - 0.75) < 1e-9
    # concave x concave including holes
    inter2 = A.intersection(from_wkt(HOLED), from_wkt(U_SHAPE))
    # U area 5; holed square covers [0,3]x[0,2] portion of U except hole
    # U ∩ [0,3]x[0,3] = U (area 5); minus hole overlap: hole [1,2]x[1,2] ∩ U =
    # x in [1,2], y in [1,2]: U has the notch [1,2]x[1,2) removed -> overlap 0
    assert abs(A.area(inter2) - 5.0) < 1e-9


def test_concave_union_difference():
    a = from_wkt(L_SHAPE)
    b = from_wkt("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")  # fills the notch
    u = A.union(a, b)
    assert abs(A.area(u) - 4.0) < 1e-9
    d = A.difference(a, b)
    assert abs(A.area(d) - 3.0) < 1e-9  # disjoint interiors (b is the notch)
    # subtract overlapping concave from concave
    c = from_wkt("POLYGON ((0.5 0.5, 2.5 0.5, 2.5 1.5, 1.5 1.5, 1.5 2.5, 0.5 2.5, 0.5 0.5))")
    d2 = A.difference(a, c)
    inter_ac = A.intersection(a, c)
    assert abs(A.area(d2) - (3.0 - A.area(inter_ac))) < 1e-9
    u2 = A.union(a, c)
    assert abs(A.area(u2) - (3.0 + A.area(c) - A.area(inter_ac))) < 1e-9


def test_union_all_concave():
    shapes = [from_wkt(L_SHAPE), from_wkt(U_SHAPE)]
    u = A.union_all(shapes)
    inter = A.intersection(from_wkt(L_SHAPE), from_wkt(U_SHAPE))
    expected = 3.0 + 5.0 - A.area(inter)
    assert abs(A.area(u) - expected) < 1e-9


def test_line_buffer():
    line = from_wkt("LINESTRING (0 0, 10 0)")
    buf = A.buffer(line, 1.0)
    # area ~ rectangle 10x2 + circle pi (two half circles at the ends)
    expected = 20.0 + math.pi
    assert abs(A.area(buf) - expected) / expected < 0.03
    # every original vertex strictly inside
    assert A.intersects(buf, from_wkt("POINT (5 0)"))
    assert A.intersects(buf, from_wkt("POINT (0 0.9)"))
    assert not A.intersects(buf, from_wkt("POINT (5 1.5)"))


def test_polygon_buffer():
    sq = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    buf = A.buffer(sq, 1.0)
    # area ~ 16 + perimeter*r + pi*r^2 = 16 + 16 + pi
    expected = 32.0 + math.pi
    assert abs(A.area(buf) - expected) / expected < 0.03
    erode = A.buffer(sq, -1.0)
    assert abs(A.area(erode) - 4.0) < 0.25  # inner 2x2 square (circle approx)


def test_bowtie_makevalid_then_overlay():
    bow = A.make_valid(from_wkt("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))"))
    sq = from_wkt("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    inter = A.intersection(sq, bow)
    assert abs(A.area(inter) - 0.5) < 1e-9


def test_dissolve_clean_output():
    """Overlay results dissolve into minimal boundaries when traceable."""
    a = from_wkt("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    b = from_wkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    u = A.union(a, b)
    assert u.tag == G.POLYGON  # dissolved to one ring, not fragments
    assert abs(A.area(u) - 7.0) < 1e-9

    # hole reconstruction: big \ inner = polygon with one hole
    big = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    inner = from_wkt("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
    d = A.difference(big, inner)
    assert d.tag == G.POLYGON and len(d.data) == 2
    assert abs(A.area(d) - 12.0) < 1e-9
    # the hole is where inner was
    assert A.point_in_polygon(2, 2, d) == 0
    assert A.point_in_polygon(0.5, 0.5, d) == 2

    # disjoint union stays a multi-part
    far = from_wkt("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")
    u2 = A.union(a, far)
    assert len(list(u2.flatten())) == 2


def test_overlay_preserves_z():
    """Z rides through the triangle decomposition + dissolve: cut vertices
    interpolate linearly (reference keeps Z/M flags through GEOS overlay,
    geometry_properties.hpp:10-63)."""
    import numpy as np

    from duckdb_spatial_spark.geo import algorithms as A
    from duckdb_spatial_spark.geo import geom as G

    def zpoly(pts, z):
        ring = [list(p) + [zv] for p, zv in zip(pts, z)]
        ring.append(ring[0])
        return G.Geometry(G.POLYGON, [np.array(ring, dtype=float)], has_z=True)

    def z_is_x_plus_y(g):
        for leaf in g.flatten():
            if leaf.tag == G.POLYGON:
                for r in leaf.data:
                    for row in r:
                        assert len(row) >= 3 and abs(row[2] - (row[0] + row[1])) < 1e-9, tuple(row)

    a = zpoly([(0, 0), (4, 0), (4, 4), (0, 4)], [0, 4, 8, 4])          # z = x+y
    b = zpoly([(2, 2), (6, 2), (6, 6), (2, 6)], [4, 8, 12, 8])         # z = x+y
    conc = zpoly([(0, 0), (6, 0), (6, 6), (3, 3), (0, 6)], [0, 6, 12, 6, 6])
    for g, want_area in ((A.intersection(a, b), 4.0), (A.union(a, b), 28.0),
                         (A.difference(a, b), 12.0), (A.intersection(conc, b), 9.0)):
        assert g.has_z and abs(A.area(g) - want_area) < 1e-9
        z_is_x_plus_y(g)
    # mixed 2D x 3D: flags union; the 2D side defaults z=0, pieces from the
    # 3D side keep interpolated z
    from duckdb_spatial_spark.geo import from_wkt

    m = A.intersection(a, from_wkt("POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))"))
    assert m.has_z and abs(A.area(m) - 1.0) < 1e-9
    z_is_x_plus_y(m)


def test_buffer_cap_join_styles():
    """Cap (round|flat|square) and join (round|mitre|bevel) styles against
    closed-form areas (reference ST_Buffer 5-arg overload semantics)."""
    import math

    import pytest

    from duckdb_spatial_spark.geo import algorithms as A, from_wkt

    line = from_wkt("LINESTRING (0 0, 10 0)")
    assert abs(A.area(A.buffer(line, 2.0, 16, cap="flat")) - 40.0) < 1e-9
    assert abs(A.area(A.buffer(line, 2.0, 16, cap="square")) - 56.0) < 1e-9
    # round cap: inscribed-circle discretization converges from below
    assert abs(A.area(A.buffer(line, 2.0, 32)) - (40 + math.pi * 4)) < 0.01

    el = from_wkt("LINESTRING (0 0, 10 0, 10 10)")
    assert abs(A.area(A.buffer(el, 1.0, 8, cap="flat", join="mitre")) - 40.0) < 1e-9
    assert abs(A.area(A.buffer(el, 1.0, 8, cap="flat", join="bevel")) - 39.5) < 1e-9

    poly = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    assert abs(A.area(A.buffer(poly, 1.0, 8, join="mitre")) - 36.0) < 1e-9
    assert abs(A.area(A.buffer(poly, 1.0, 8, join="bevel")) - 34.0) < 1e-9

    # mitre limit: a 170-degree-sharp corner falls back to bevel
    sharp = from_wkt("LINESTRING (0 0, 10 0, 0 1)")
    lim = A.buffer(sharp, 1.0, 8, cap="flat", join="mitre", mitre_limit=2.0)
    unlim = A.buffer(sharp, 1.0, 8, cap="flat", join="mitre", mitre_limit=1000.0)
    assert A.area(lim) < A.area(unlim)

    with pytest.raises(ValueError):
        A.buffer(line, 1.0, 8, cap="weird")
    with pytest.raises(ValueError):
        A.buffer(line, 1.0, 8, join="weird")


def test_buffer_style_sql(spark):
    # Spark can't overload one UDF name by arity: the reference's 5-arg
    # ST_Buffer(geom, r, nseg, cap, join) registers as ST_Buffer_Style
    rows = spark.sql(
        "SELECT round(ST_Area(ST_Buffer_Style(ST_GeomFromText('LINESTRING (0 0, 10 0)'),"
        " 2.0D, 16, 'flat', 'round')), 6) AS a"
    ).collect()
    assert rows[0].a == 40.0


# ---------------------------------------------------------------------------
# mixed-dimension intersection (line x line, line x areal) — reference
# geos/functions/scalar/st_intersection.cpp delegates to GEOS OverlayNG;
# these pin the L x L and L x A dimension rules
# ---------------------------------------------------------------------------

from duckdb_spatial_spark.geo import to_wkt


@pytest.mark.parametrize(
    "a, b, expected",
    [
        # proper crossing -> point
        ("LINESTRING (0 0, 4 4)", "LINESTRING (0 4, 4 0)", "POINT (2 2)"),
        # endpoint touch -> point
        ("LINESTRING (0 0, 2 2)", "LINESTRING (2 2, 4 0)", "POINT (2 2)"),
        # collinear overlap -> line
        ("LINESTRING (0 0, 4 0)", "LINESTRING (2 0, 6 0)", "LINESTRING (2 0, 4 0)"),
        # disjoint -> empty
        ("LINESTRING (0 0, 1 0)", "LINESTRING (0 2, 1 2)", "GEOMETRYCOLLECTION EMPTY"),
        # identical -> self
        ("LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)", "LINESTRING (0 0, 1 1)"),
        # crossing + collinear mix -> collection, 0D hit not covered by 1D
        (
            "LINESTRING (0 0, 4 0, 4 4)",
            "LINESTRING (2 0, 6 0, 6 2, 2 2)",
            "GEOMETRYCOLLECTION (LINESTRING (2 0, 4 0), POINT (4 2))",
        ),
        # two branches crossing at one coordinate -> deduped single point
        (
            "MULTILINESTRING ((0 0, 2 2), (0 2, 2 0))",
            "LINESTRING (1 0, 1 4)",
            "POINT (1 1)",
        ),
        # collection with stray point leaf
        (
            "GEOMETRYCOLLECTION (POINT (3 3), LINESTRING (0 0, 2 0))",
            "LINESTRING (1 -1, 1 5)",
            "POINT (1 0)",
        ),
    ],
)
def test_line_line_intersection(a, b, expected):
    assert to_wkt(A.intersection(from_wkt(a), from_wkt(b))) == expected
    # symmetric
    assert to_wkt(A.intersection(from_wkt(b), from_wkt(a))) == expected


L_BIG = "POLYGON ((0 0, 4 0, 4 1, 1 1, 1 4, 0 4, 0 0))"


@pytest.mark.parametrize(
    "a, b, expected",
    [
        # convex square, line across -> clipped line (convex fast path)
        (
            "LINESTRING (-1 1, 5 1)",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
            "LINESTRING (0 1, 4 1)",
        ),
        # concave L, line through the left column only
        ("LINESTRING (-1 2.5, 5 2.5)", L_BIG, "LINESTRING (0 2.5, 1 2.5)"),
        # concave L, line through the bottom bar spanning both arms
        ("LINESTRING (-1 0.5, 5 0.5)", L_BIG, "LINESTRING (0 0.5, 4 0.5)"),
        # holed polygon, line across the hole -> split into two pieces
        (
            "LINESTRING (-1 5, 11 5)",
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
            "MULTILINESTRING ((0 5, 4 5), (6 5, 10 5))",
        ),
        # multipolygon, line across both parts
        (
            "LINESTRING (-1 1, 7 1)",
            "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((4 0, 6 0, 6 2, 4 2, 4 0)))",
            "MULTILINESTRING ((0 1, 2 1), (4 1, 6 1))",
        ),
        # line along a boundary edge of the concave polygon (closed set)
        ("LINESTRING (-1 0, 5 0)", L_BIG, "LINESTRING (0 0, 4 0)"),
        # vertex-only touch -> point
        (
            "LINESTRING (1 5, 3 5)",
            "POLYGON ((0 0, 4 0, 4 1, 1 1, 1 4, 2 5, 0 4, 0 0))",
            "POINT (2 5)",
        ),
    ],
)
def test_line_areal_intersection(a, b, expected):
    assert to_wkt(A.intersection(from_wkt(a), from_wkt(b))) == expected
    assert to_wkt(A.intersection(from_wkt(b), from_wkt(a))) == expected


@pytest.mark.parametrize(
    "a, b, expected",
    [
        # line minus concave polygon: partial survivors, chained maximal
        ("LINESTRING (-1 2.5, 5 2.5)", L_BIG,
         "MULTILINESTRING ((-1 2.5, 0 2.5), (1 2.5, 5 2.5))"),
        # line across a hole: the in-hole piece SURVIVES the difference
        ("LINESTRING (-1 5, 11 5)",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))",
         "MULTILINESTRING ((-1 5, 0 5), (4 5, 6 5), (10 5, 11 5))"),
        # multipolygon subtrahend
        ("LINESTRING (-1 1, 7 1)",
         "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((4 0, 6 0, 6 2, 4 2, 4 0)))",
         "MULTILINESTRING ((-1 1, 0 1), (2 1, 4 1), (6 1, 7 1))"),
        # point minus concave polygon: inside -> empty, outside notch -> kept
        ("POINT (0.5 0.5)", L_BIG, "GEOMETRYCOLLECTION EMPTY"),
        ("POINT (3 3)", L_BIG, "POINT (3 3)"),
    ],
)
def test_line_concave_difference(a, b, expected):
    from duckdb_spatial_spark.geo import to_wkt

    assert to_wkt(A.difference(from_wkt(a), from_wkt(b))) == expected


def test_mixed_dim_union_absorbs_overlap():
    from duckdb_spatial_spark.geo import to_wkt

    sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    ln = "LINESTRING (-1 1, 5 1)"
    want = ("GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
            "LINESTRING (-1 1, 0 1), LINESTRING (4 1, 5 1))")
    assert to_wkt(A.union(from_wkt(sq), from_wkt(ln))) == want
    assert to_wkt(A.union(from_wkt(ln), from_wkt(sq))) == want
    # point on line absorbed either way
    assert to_wkt(A.union(from_wkt("POINT (1 1)"), from_wkt("LINESTRING (0 0, 2 2)"))) == "LINESTRING (0 0, 2 2)"
