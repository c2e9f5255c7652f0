"""FileGDB (OpenFileGDB) writer + reader — the reference's own GDB test is
a write -> read round trip with a mandatory GEOMETRY_TYPE and a type gate
(test/sql/gdal/st_read_gdb.test); these tests mirror that contract and pin
the wire-format invariants of the minimal v10 subset."""

import os
import struct

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources import st_read
from duckdb_spatial_spark.sources.filegdb import (
    _decode_shape,
    _encode_shape,
    _rvarint,
    _rvaruint,
    _wvarint,
    _wvaruint,
    gdb_layers,
    read_gdb,
    write_gdb,
)


def test_varint_roundtrip():
    for v in (0, 1, 63, 64, 127, 128, 300, 2**31, 2**45 + 17):
        out = bytearray()
        _wvaruint(out, v)
        got, pos = _rvaruint(bytes(out), 0)
        assert got == v and pos == len(out)
    for v in (0, 1, -1, 63, -63, 64, -64, 8191, -8192, 2**40, -(2**40)):
        out = bytearray()
        _wvarint(out, v)
        got, pos = _rvarint(bytes(out), 0)
        assert got == v and pos == len(out)


def test_signed_varint_sign_in_first_byte():
    # FGDB signed varint: bit 6 of the FIRST byte is the sign (not zigzag)
    out = bytearray()
    _wvarint(out, -5)
    assert out[0] & 0x40  # sign bit set
    assert out[0] & 0x3F == 5


def test_geometry_type_required(spark):
    df = spark.sql("SELECT ST_Point(1.0D, 2.0D) AS geom, 10 AS i")
    with pytest.raises(ValueError, match="GEOMETRY_TYPE"):
        write_gdb(df, "/tmp/never.gdb")


def test_geometry_type_gate(spark, tmp_path):
    df = spark.sql("SELECT ST_Point(1.0D, 2.0D) AS geom, 10 AS i")
    with pytest.raises(ValueError, match="Expected all geometries to be of type 'LINESTRING', but got one of type 'POINT'"):
        write_gdb(df, str(tmp_path / "fail.gdb"), geometry_type="LINESTRING")


def test_reference_point_roundtrip(spark, tmp_path):
    # the exact sequence of st_read_gdb.test: COPY one point + int, read back
    p = str(tmp_path / "test.gdb")
    df = spark.sql("SELECT ST_Point(1.0D, 2.0D) AS geom, 10 AS i")
    write_gdb(df, p, geometry_type="POINT")
    back = st_read(spark, p)  # sniffed via .gdb
    rows = back.selectExpr("i", "ST_AsText(geom) AS wkt").collect()
    assert [(r.i, r.wkt) for r in rows] == [(10, "POINT (1 2)")]


def test_attrs_nulls_and_types(spark, tmp_path):
    p = str(tmp_path / "t.gdb")
    df = spark.sql(
        """
        SELECT id,
          CASE WHEN id = 2 THEN NULL ELSE ST_Point(CAST(id AS DOUBLE), 0.5D) END AS geom,
          CASE WHEN id = 1 THEN NULL ELSE concat('s', id) END AS name,
          CASE WHEN id = 3 THEN NULL ELSE CAST(id AS DOUBLE) * 1.25 END AS score,
          TIMESTAMP '2024-06-15 08:30:00' + make_interval(0,0,0,0,0,0,id) AS ts,
          CAST(concat('b', id) AS BINARY) AS blob
        FROM range(5)
        """
    )
    write_gdb(df, p, layer="attrs", geometry_type="POINT")
    assert gdb_layers(p) == ["attrs"]
    back = read_gdb(spark, p, fid_column="OBJECTID").orderBy("OBJECTID")
    assert back.columns[0] == "OBJECTID" and back.columns[-1] == "geom"
    rows = back.selectExpr(
        "id", "ST_AsText(geom) AS wkt", "name", "score",
        "CAST(ts AS STRING) AS ts", "CAST(blob AS STRING) AS blob"
    ).collect()
    assert rows[1].wkt == "POINT (1 0.5)" and rows[1].name is None
    assert rows[2].wkt is None and rows[2].name == "s2"
    assert rows[3].score is None and rows[0].score == 0.0
    assert rows[4].ts == "2024-06-15 08:30:04"
    assert rows[4].blob == "b4"


def test_polygon_holes_and_multi(spark, tmp_path):
    p = str(tmp_path / "poly.gdb")
    df = spark.sql(
        """
        SELECT 1 AS id, ST_GeomFromText(
          'POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))') AS geom
        UNION ALL SELECT 2, ST_GeomFromText(
          'MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 6 5, 6 6, 5 6, 5 5)))')
        """
    )
    write_gdb(df, p, geometry_type="POLYGON")
    got = {
        r.id: (r.t, r.a)
        for r in read_gdb(spark, p).selectExpr(
            "id", "ST_GeometryType(geom) AS t", "ST_Area(geom) AS a"
        ).collect()
    }
    assert got[1] == ("POLYGON", pytest.approx(15.0, abs=1e-6))
    assert got[2] == ("MULTIPOLYGON", pytest.approx(2.0, abs=1e-6))


def test_lines_and_quantization(spark, tmp_path):
    p = str(tmp_path / "l.gdb")
    df = spark.sql(
        """
        SELECT 1 AS id, ST_GeomFromText('LINESTRING (0.123456789 0, 1 1.987654321)') AS geom
        UNION ALL SELECT 2, ST_GeomFromText('MULTILINESTRING ((0 0, 1 0), (2 2, 3 3, 4 2))')
        """
    )
    write_gdb(df, p, geometry_type="LINESTRING")
    rows = {r.id: r for r in read_gdb(spark, p).selectExpr(
        "id", "ST_XMin(geom) AS x0", "ST_YMax(geom) AS y1", "ST_NPoints(geom) AS np"
    ).collect()}
    # 1e-9 coordinate grid (ArcGIS default degree resolution)
    assert rows[1].x0 == pytest.approx(0.123456789, abs=2e-9)
    assert rows[1].y1 == pytest.approx(1.987654321, abs=2e-9)
    assert rows[2].np == 5


def test_z_roundtrip():
    from duckdb_spatial_spark.geo import wkt as WKT

    for w in ("POINT Z (1 2 3)", "LINESTRING Z (0 0 1, 1 1 2, 2 0 3)"):
        g = WKT.from_wkt(w)
        back = _decode_shape(_encode_shape(g))
        assert back.has_z and not back.has_m
        assert WKT.to_wkt(back) == w


def test_empty_point_shape():
    from duckdb_spatial_spark.geo import geom as G

    g = G.Geometry(G.POINT, None)
    assert _decode_shape(_encode_shape(g)).is_empty()


def test_max_rows_guard(spark, tmp_path):
    df = spark.sql("SELECT ST_Point(CAST(id AS DOUBLE), 0.0D) AS geom FROM range(20)")
    with pytest.raises(ValueError, match="max_rows"):
        write_gdb(df, str(tmp_path / "big.gdb"), geometry_type="POINT", max_rows=10)


def test_table_header_and_tablx_shape(spark, tmp_path):
    # structural pins of the public FGDB-Spec layout: .gdbtable magic 3 +
    # row count at offset 4 + field-descriptor offset at 32; .gdbtablx
    # 16-byte header + 5-byte offsets padded to 1024-entry blocks
    p = str(tmp_path / "hdr.gdb")
    df = spark.sql("SELECT ST_Point(CAST(id AS DOUBLE), 1.0D) AS geom, id FROM range(7)")
    write_gdb(df, p, geometry_type="POINT")
    t = os.path.join(p, "a00000009.gdbtable")
    with open(t, "rb") as f:
        head = f.read(40)
    magic, nrows = struct.unpack_from("<2i", head, 0)
    fsize, desc_off = struct.unpack_from("<qq", head, 24)
    assert magic == 3 and nrows == 7 and desc_off == 40
    assert fsize == os.path.getsize(t)
    x = os.path.join(p, "a00000009.gdbtablx")
    xm, nblocks, xn, width = struct.unpack("<4i", open(x, "rb").read(16))
    assert (xm, nblocks, xn, width) == (3, 1, 7, 5)
    assert os.path.getsize(x) == 16 + 1024 * 5 + 16


def test_parallel_range_read(spark, tmp_path):
    p = str(tmp_path / "par.gdb")
    df = spark.sql("SELECT ST_Point(CAST(id AS DOUBLE), 0.0D) AS geom, id FROM range(100)")
    write_gdb(df, p, geometry_type="POINT")
    back = read_gdb(spark, p, rows_per_partition=17)
    assert back.rdd.getNumPartitions() == 6
    assert back.count() == 100
    s = back.agg(F.sum("id")).collect()[0][0]
    assert s == 4950


# ------------------------------------------------------------ fuzz (codec)

from hypothesis import given, settings, strategies as hst  # noqa: E402

from duckdb_spatial_spark.geo import geom as G  # noqa: E402

_c = hst.floats(-1000, 1000, allow_nan=False, allow_infinity=False).map(
    lambda v: round(v, 6)
)


@hst.composite
def _lines(draw):
    n = draw(hst.integers(2, 10))
    import numpy as np

    return G.Geometry(G.LINESTRING, np.asarray([[draw(_c), draw(_c)] for _ in range(n)]))


@hst.composite
def _multilines(draw):
    k = draw(hst.integers(1, 4))
    return G.Geometry(G.MULTILINESTRING, [draw(_lines()) for _ in range(k)])


_FUZZ_GRID = None  # computed lazily (covers the +-1000 fuzz range)


def _fuzz_grid():
    global _FUZZ_GRID
    if _FUZZ_GRID is None:
        from duckdb_spatial_spark.sources.filegdb import _grid_for

        _FUZZ_GRID = _grid_for([-1000.0, -1000.0, 1000.0, 1000.0])
    return _FUZZ_GRID


@settings(max_examples=120, deadline=None)
@given(hst.one_of(_lines(), _multilines()))
def test_fuzz_shape_codec_roundtrip(g):
    """Quantize-aware shape-buffer roundtrip: coordinates survive to the
    1e-9 grid, structure exactly."""
    import numpy as np

    back = _decode_shape(_encode_shape(g, _fuzz_grid()), _fuzz_grid())
    orig = list(g.flatten())
    got = list(back.flatten())
    assert len(orig) == len(got)
    for a, b in zip(orig, got):
        assert a.tag == b.tag
        xa = np.vstack(list(a.coord_arrays()))
        xb = np.vstack(list(b.coord_arrays()))
        assert xa.shape == xb.shape
        assert np.abs(xa - xb).max() < 2e-9


@settings(max_examples=120, deadline=None)
@given(_c, _c)
def test_fuzz_point_codec(x, y):
    import numpy as np

    g = G.Geometry(G.POINT, np.asarray([x, y]))
    back = _decode_shape(_encode_shape(g, _fuzz_grid()), _fuzz_grid())
    assert abs(back.data[0] - x) < 2e-9 and abs(back.data[1] - y) < 2e-9


def test_below_origin_raises_not_hangs():
    import numpy as np

    g = G.Geometry(G.POINT, np.asarray([-999.0, -999.0]))
    with pytest.raises(ValueError, match="quantization origin"):
        _encode_shape(g)  # default grid's origin is -400
    line = G.Geometry(G.LINESTRING, np.asarray([[-999.0, 0.0], [0.0, 1.0]]))
    with pytest.raises(ValueError, match="quantization origin"):
        _encode_shape(line)


def test_negative_coordinates_roundtrip_via_writer(spark, tmp_path):
    # the dataset grid is derived from the data extent, so coordinates far
    # below the ArcGIS default origin round-trip fine through write/read
    p = str(tmp_path / "neg.gdb")
    df = spark.sql(
        "SELECT id, ST_Point(CAST(id AS DOUBLE) - 500000.0D, -123456.789D) AS geom"
        " FROM range(5)"
    )
    write_gdb(df, p, geometry_type="POINT")
    rows = read_gdb(spark, p).selectExpr(
        "id", "ST_X(geom) AS x", "ST_Y(geom) AS y").orderBy("id").collect()
    assert rows[0].x == pytest.approx(-500000.0, abs=1e-6)
    assert rows[0].y == pytest.approx(-123456.789, abs=1e-6)


def test_deep_negative_z_roundtrip_multiline():
    # Z below the default origin still round-trips: multi-part shapes carry
    # Z as signed deltas and both codec sides use the same default Z grid
    import numpy as np

    g = G.Geometry(G.LINESTRING,
                   np.asarray([[0.0, 0.0, -250000.0], [1.0, 1.0, -249999.5]]),
                   has_z=True)
    back = _decode_shape(_encode_shape(g))
    arr = np.vstack(list(back.coord_arrays()))
    assert abs(arr[0, 2] + 250000.0) < 1e-6 and abs(arr[1, 2] + 249999.5) < 1e-6


def test_deep_negative_z_point_raises():
    import numpy as np

    g = G.Geometry(G.POINT, np.asarray([0.0, 0.0, -250000.0]), has_z=True)
    with pytest.raises(ValueError, match="quantization origin"):
        _encode_shape(g)
