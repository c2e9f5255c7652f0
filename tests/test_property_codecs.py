"""Hypothesis property tests for the round-9 binary codecs.

netCDF and MVT are hand-rolled wire formats; random-structure roundtrips
catch layout/padding/winding bugs the pinned fixtures miss (the repo's
overlay property suites caught two real kernel bugs the same way).
These exercise the codec layer directly (no SparkSession) so hypothesis
can run hundreds of examples cheaply.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_spatial_spark.geo import geom as G
from duckdb_spatial_spark.geo import wkb as WKB

# ---------------------------------------------------------------- netCDF


class _FakeDF:
    """Duck-typed stand-in for the tiny DataFrame surface write_netcdf
    uses (count + toPandas) — keeps hypothesis off the JVM."""

    def __init__(self, pdf):
        self._pdf = pdf

    def count(self):
        return len(self._pdf)

    def toPandas(self):  # noqa: N802 - Spark API name
        return self._pdf


finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(
    data=st.lists(
        st.tuples(
            finite, finite,
            st.one_of(st.none(), finite),
            st.one_of(st.none(), st.integers(-2**31 + 1, 2**31 - 1)),
            st.text(max_size=12),
        ),
        min_size=1, max_size=40,
    )
)
@settings(max_examples=80, deadline=None)
def test_netcdf_writer_reader_property(tmp_path_factory, data):
    import pandas as pd

    from duckdb_spatial_spark.sources import netcdf3 as nc

    p = str(tmp_path_factory.mktemp("ncprop") / "f.nc")
    pdf = pd.DataFrame(
        {
            "dv": pd.Series([d[2] for d in data], dtype="float64"),
            "iv": pd.Series(
                [0 if d[3] is None else d[3] for d in data], dtype="int64"
            ),
            "sv": pd.Series([d[4] for d in data], dtype="object"),
            "geom": pd.Series(
                [WKB.to_wkb(G.point(d[0], d[1])) for d in data], dtype="object"
            ),
        }
    )
    nc.write_netcdf(_FakeDF(pdf), p)
    h = nc.parse_header(p)
    lat_v, lon_v = nc._find_coords(h)
    lat = nc._load_var(h, lat_v).astype(np.float64)
    lon = nc._load_var(h, lon_v).astype(np.float64)
    assert len(lat) == len(data)
    for i, d in enumerate(data):
        assert lon[i] == d[0] and lat[i] == d[1]  # float64 vars: bit-exact
    dv = nc._decode_values(
        next(v for v in h["variables"] if v["name"] == "dv"),
        nc._load_var(h, next(v for v in h["variables"] if v["name"] == "dv")),
    )
    for i, d in enumerate(data):
        if d[2] is None:
            assert math.isnan(dv[i])
        else:
            assert dv[i] == d[2]
    sv = next(v for v in h["variables"] if v["name"] == "sv")
    arr = nc._load_var(h, sv)
    for i, d in enumerate(data):
        got = b"".join(arr[i]).decode("utf-8", errors="replace").rstrip("\x00")
        # embedded NULs are unrepresentable in netCDF char matrices and
        # stripped by the writer (C-style NUL padding)
        want = (d[4] or "").replace("\x00", "")
        assert got == want


# ------------------------------------------------------------------ MVT

ipt = st.tuples(st.integers(0, 4000), st.integers(0, 4000))


def _ring(c, w, h):
    x, y = c
    return [[x, y], [x + w, y], [x + w, y + h], [x, y + h], [x, y]]


geoms = st.one_of(
    ipt.map(lambda p: G.point(float(p[0]), float(p[1]))),
    st.lists(ipt, min_size=2, max_size=8, unique=True).map(
        lambda ps: G.linestring(np.asarray(ps, dtype=np.float64))
    ),
    st.tuples(ipt, st.integers(1, 50), st.integers(1, 50)).map(
        lambda t: G.polygon([_ring(t[0], t[1], t[2])])
    ),
)


@given(gs=st.lists(geoms, min_size=1, max_size=20))
@settings(max_examples=80, deadline=None)
def test_mvt_geometry_roundtrip_property(gs):
    from duckdb_spatial_spark.geo import algorithms as A
    from duckdb_spatial_spark.sources import mvt

    def to_tile(x, y):
        return (int(np.floor(x + 0.5)), int(np.floor(4096.0 - y + 0.5)))

    def from_tile(tx, ty):
        return (float(tx), 4096.0 - float(ty))

    for g in gs:
        ftype, cmds = mvt._encode_geometry(g, to_tile)
        back = mvt._decode_geometry(ftype, cmds, from_tile)
        # integer coordinates roundtrip exactly; rings may renumber, so
        # compare canonical forms
        from duckdb_spatial_spark.geo.wkt import to_wkt

        assert to_wkt(A.normalize(back)) == to_wkt(A.normalize(g))


@given(
    xs=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=999.0, allow_nan=False),
            st.floats(min_value=0.0, max_value=999.0, allow_nan=False),
        ),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=60, deadline=None)
def test_mvt_quantization_bound_property(xs):
    """Float points over a world bbox roundtrip within half a tile unit."""
    from duckdb_spatial_spark.sources import mvt

    ext, x0, y0, x1, y1 = 4096, 0.0, 0.0, 1000.0, 1000.0
    sx, sy = ext / (x1 - x0), ext / (y1 - y0)
    res_x, res_y = (x1 - x0) / ext, (y1 - y0) / ext

    def to_tile(x, y):
        return (
            int(np.floor((x - x0) * sx + 0.5)),
            int(np.floor((y1 - y) * sy + 0.5)),
        )

    def from_tile(tx, ty):
        return (x0 + tx / sx, y1 - ty / sy)

    for x, y in xs:
        ftype, cmds = mvt._encode_geometry(G.point(x, y), to_tile)
        back = mvt._decode_geometry(ftype, cmds, from_tile)
        assert abs(float(back.data[0]) - x) <= res_x / 2 + 1e-9
        assert abs(float(back.data[1]) - y) <= res_y / 2 + 1e-9
