"""Property-based round trips for the r13 format codecs (GMT / DGN /
S-57) — pure driver-side parser<->writer fuzz, no SparkSession needed —
plus the uniform ST_Read bbox=/columns= contract over the new sources.

Coordinates are drawn on the formats' own quantization grids (DGN UORs
at uor_scale, S-57 1/COMF degrees) so equality is exact, the same
discipline as the codec property tests."""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_spatial_spark.geo import geom as G
from duckdb_spatial_spark.geo import wkb as WKB

# quantized coordinate: k/100 over a modest range -> exact in every codec
_coord = st.integers(min_value=-170_00, max_value=170_00).map(lambda k: k / 100.0)
_pt = st.tuples(_coord, _coord)



class _Row:
    def __init__(self, d):
        self._d = d

    def asDict(self):
        return self._d


class _DF:
    columns = ["geom"]
    dtypes = [("geom", "binary")]

    def __init__(self, rows):
        self._rows = rows

    def toLocalIterator(self):
        return iter(self._rows)


def _geom_rows(geoms, **extra):
    return _DF([_Row({"geom": WKB.to_wkb(g), **extra}) for g in geoms])


@given(st.lists(st.tuples(st.integers(-17000, 16900), st.integers(-17000, 16900),
                          st.integers(1, 40), st.integers(1, 40)),
                min_size=1, max_size=6))
@settings(max_examples=40, deadline=None)
def test_s57_polygon_roundtrip_property(tmp_path_factory, rects):
    from duckdb_spatial_spark.sources.s57 import parse_s57, write_s57

    # corners computed in integer hundredths so every coordinate sits
    # exactly on the 1e-2 grid (a float x + w/100 sum does NOT)
    geoms = [
        G.polygon([[
            [xk / 100.0, yk / 100.0],
            [(xk + w) / 100.0, yk / 100.0],
            [(xk + w) / 100.0, (yk + h) / 100.0],
            [xk / 100.0, (yk + h) / 100.0],
            [xk / 100.0, yk / 100.0],
        ]])
        for xk, yk, w, h in rects
    ]
    p = str(tmp_path_factory.mktemp("s57") / "c.000")
    write_s57(_geom_rows(geoms), p)
    feats = parse_s57(p)
    assert len(feats) == len(geoms)
    got = sorted(tuple(map(tuple, g.data[0][:, :2])) for *_, g in feats)
    want = sorted(tuple(map(tuple, g.data[0][:, :2])) for g in geoms)
    assert got == want


@given(st.lists(st.lists(_pt, min_size=2, max_size=8, unique=True),
                min_size=1, max_size=5))
@settings(max_examples=40, deadline=None)
def test_dgn_linestring_roundtrip_property(tmp_path_factory, lines):
    from duckdb_spatial_spark.sources.dgn import parse_dgn, write_dgn

    geoms = [G.linestring([list(p) for p in pts]) for pts in lines]
    p = str(tmp_path_factory.mktemp("dgn") / "c.dgn")
    write_dgn(_geom_rows(geoms), p)
    feats = parse_dgn(p)
    assert len(feats) == len(geoms)
    got = sorted(tuple(map(tuple, g.data[:, :2])) for *_, g in feats)
    want = sorted(tuple(map(tuple, g.data[:, :2])) for g in geoms)
    assert got == want


@given(st.lists(_pt, min_size=1, max_size=10, unique=True))
@settings(max_examples=40, deadline=None)
def test_gmt_point_roundtrip_property(tmp_path_factory, pts):
    from duckdb_spatial_spark.sources.gmt import parse_gmt, write_gmt

    geoms = [G.point(x, y) for x, y in pts]
    p = str(tmp_path_factory.mktemp("gmt") / "c.gmt")
    write_gmt(_geom_rows(geoms), p)
    gtype, _fields, feats = parse_gmt(p)
    assert gtype == "POINT" and len(feats) == len(geoms)
    got = sorted((g.data[0], g.data[1]) for _, g in feats)
    assert got == sorted(pts)


def test_uniform_bbox_columns_contract_on_new_sources(spark, tmp_path):
    """st_read's bbox=/columns= semantics apply to the r13 sources
    through the shared _apply_read_filters pass."""
    from duckdb_spatial_spark.functions import register_all
    from duckdb_spatial_spark.sources import st_read, st_write

    register_all(spark)
    df = spark.createDataFrame([(i,) for i in range(10)], "id long").selectExpr(
        "id",
        "ST_AsWKB(ST_MakeEnvelope(CAST(id * 10 AS DOUBLE), 0.0,"
        " CAST(id * 10 + 5 AS DOUBLE), 5.0)) AS geom",
    )
    for ext in (".gmt", ".dgn", ".000"):
        p = str(tmp_path / f"u{ext}")
        st_write(df, p)
        full = st_read(spark, p)
        assert full.count() == 10, ext
        # window covering rectangles 0..3 (x < 40)
        assert st_read(spark, p, bbox=(0, 0, 34, 10)).count() == 4, ext
    # columns= projection on gmt (it carries an attribute column)
    p = str(tmp_path / "attr.gmt")
    st_write(df.selectExpr("id", "id * 2 AS twice", "geom"), p)
    proj = st_read(spark, p, columns=["id"])
    assert proj.columns == ["id", "geom"]
