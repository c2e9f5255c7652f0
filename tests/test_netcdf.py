"""netCDF classic (CDF-1/CDF-2) codec: roundtrip, grid flattening, CF
attribute conventions, record variables, and loud netCDF-4 rejection.

Reference behavior: GDAL netCDF driver via ``st_read.cpp:684-692``; the
binary layout is the public Unidata NetCDF Classic Format Specification.
"""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F


def _write_raw_grid(path):
    """Hand-crafted CDF-1 grid file: lat(3), lon(4), temp(lat,lon) short
    with scale_factor/add_offset/_FillValue — exercises the reader's grid
    lane + CF decoding against bytes we lay out independently of the
    writer."""
    def name(s):
        b = s.encode()
        return struct.pack(">i", len(b)) + b + b"\x00" * (-len(b) % 4)

    hdr = b"CDF\x01" + struct.pack(">i", 0)
    # dims: lat=3, lon=4
    hdr += struct.pack(">ii", 0x0A, 2) + name("lat") + struct.pack(">i", 3)
    hdr += name("lon") + struct.pack(">i", 4)
    hdr += struct.pack(">ii", 0, 0)  # no global atts

    lat_data = np.array([10.0, 20.0, 30.0], dtype=">f8").tobytes()
    lon_data = np.array([100.0, 101.0, 102.0, 103.0], dtype=">f8").tobytes()
    temp = np.arange(12, dtype=">i2")
    temp_arr = temp.copy()
    temp_arr[5] = -999  # fill
    temp_data = temp_arr.tobytes()  # 24 bytes, already 4-aligned

    def var(nm, dimids, atts, t, vsize, begin):
        out = name(nm) + struct.pack(">i", len(dimids))
        for d in dimids:
            out += struct.pack(">i", d)
        if atts:
            out += struct.pack(">ii", 0x0C, len(atts))
            for an, (at, av) in atts.items():
                out += name(an) + struct.pack(">ii", at, len(np.atleast_1d(av)))
                if at == 6:
                    out += np.asarray(av, dtype=">f8").tobytes()
                elif at == 3:
                    raw = np.asarray(av, dtype=">i2").tobytes()
                    out += raw + b"\x00" * (-len(raw) % 4)
        else:
            out += struct.pack(">ii", 0, 0)
        return out + struct.pack(">iii", t, vsize, begin)

    # sizes first (two-pass like any classic writer)
    def header(b_lat, b_lon, b_temp):
        vs = struct.pack(">ii", 0x0B, 3)
        vs += var("lat", [0], {"units": None}, 6, len(lat_data), b_lat)
        vs += var("lon", [1], {"units": None}, 6, len(lon_data), b_lon)
        vs += var(
            "temp", [0, 1],
            {"scale_factor": (6, 0.5), "add_offset": (6, 100.0), "_FillValue": (3, -999)},
            3, len(temp_data), b_temp,
        )
        return hdr + vs

    # the units att needs real encoding: easier to inline it as char att
    def var_units(nm, dimids, units, t, vsize, begin):
        out = name(nm) + struct.pack(">i", len(dimids))
        for d in dimids:
            out += struct.pack(">i", d)
        ub = units.encode()
        out += struct.pack(">ii", 0x0C, 1) + name("units")
        out += struct.pack(">ii", 2, len(ub)) + ub + b"\x00" * (-len(ub) % 4)
        return out + struct.pack(">iii", t, vsize, begin)

    def header(b_lat, b_lon, b_temp):  # noqa: F811
        vs = struct.pack(">ii", 0x0B, 3)
        vs += var_units("lat", [0], "degrees_north", 6, len(lat_data), b_lat)
        vs += var_units("lon", [1], "degrees_east", 6, len(lon_data), b_lon)
        vs += var(
            "temp", [0, 1],
            {"scale_factor": (6, 0.5), "add_offset": (6, 100.0), "_FillValue": (3, -999)},
            3, len(temp_data), b_temp,
        )
        return hdr + vs

    hs = len(header(0, 0, 0))
    b_lat, b_lon, b_temp = hs, hs + len(lat_data), hs + len(lat_data) + len(lon_data)
    with open(path, "wb") as f:
        f.write(header(b_lat, b_lon, b_temp) + lat_data + lon_data + temp_data)


def test_netcdf_roundtrip(spark, tmp_path):
    from duckdb_spatial_spark.functions import udfs
    from duckdb_spatial_spark.sources import st_read, st_write

    df = (
        spark.range(25)
        .select(
            F.col("id"),
            (F.col("id") * 1.5).alias("v"),
            F.concat(F.lit("station_"), F.col("id")).alias("nm"),
            udfs.st_point(
                (F.col("id") % 7).cast("double"), (F.col("id") % 5).cast("double")
            ).alias("geom"),
        )
    )
    p = str(tmp_path / "pts.nc")
    st_write(df, p, format="netcdf")
    back = st_read(spark, p)
    assert back.count() == 25
    rows = {r.id: r for r in back.collect()}
    orig = {r.id: r for r in df.collect()}
    for k, r in rows.items():
        assert r.v == orig[k].v and r.nm == orig[k].nm
        assert bytes(r.geom) == bytes(orig[k].geom)
    # pushdown contract: bbox + columns work through the uniform layer
    sub = st_read(spark, p, bbox=(0, 0, 2, 2), columns=["id"])
    assert set(sub.columns) == {"id", "geom"}
    assert 0 < sub.count() < 25


def test_netcdf_grid_cf_decode(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read

    p = str(tmp_path / "grid.nc")
    _write_raw_grid(p)
    df = st_read(spark, p, format="netcdf")
    rows = df.collect()
    assert len(rows) == 12  # 3 lat x 4 lon cells
    from duckdb_spatial_spark.geo import wkb as WKB

    by_cell = {}
    for r in rows:
        g = WKB.from_wkb(bytes(r.geom))
        by_cell[(float(g.data[1]), float(g.data[0]))] = r.temp
    # temp[i, j] = (i*4 + j) * 0.5 + 100.0 ; cell (lat 20, lon 101) is
    # flat index 5 = the fill value -> NULL
    assert by_cell[(10.0, 100.0)] == 100.0
    assert by_cell[(30.0, 103.0)] == pytest.approx(105.5)
    assert by_cell[(20.0, 101.0)] is None


def test_netcdf_record_dim(spark, tmp_path):
    """Record (unlimited) dimension: the single-record-variable packing
    special case from the spec."""
    import duckdb_spatial_spark.sources.netcdf3 as nc

    def name(s):
        b = s.encode()
        return struct.pack(">i", len(b)) + b + b"\x00" * (-len(b) % 4)

    # dims: obs=UNLIMITED(0), plus fixed lat/lon over a 'fix' dim shared
    lat_data = np.array([1.0, 2.0, 3.0], dtype=">f8").tobytes()
    lon_data = np.array([4.0, 5.0, 6.0], dtype=">f8").tobytes()
    # v(obs, fix): 2 records x 3 -> but make lat/lon over 'fix' so the
    # point-series lane is NOT chosen; instead craft lat/lon over fix and
    # v over (fix) only... simplest REAL record test: lat/lon/v all over
    # the record dim (point series on an unlimited dimension).
    hdr = b"CDF\x01" + struct.pack(">i", 3)  # numrecs=3
    hdr += struct.pack(">ii", 0x0A, 1) + name("obs") + struct.pack(">i", 0)
    hdr += struct.pack(">ii", 0, 0)

    def var_units(nm, units, t, vsize, begin):
        out = name(nm) + struct.pack(">i", 1) + struct.pack(">i", 0)
        ub = units.encode()
        out += struct.pack(">ii", 0x0C, 1) + name("units")
        out += struct.pack(">ii", 2, len(ub)) + ub + b"\x00" * (-len(ub) % 4)
        return out + struct.pack(">iii", t, vsize, begin)

    def header(b_lat, b_lon, b_v):
        vs = struct.pack(">ii", 0x0B, 3)
        vs += var_units("lat", "degrees_north", 6, 8, b_lat)
        vs += var_units("lon", "degrees_east", 6, 8, b_lon)
        vs += var_units("v", "K", 6, 8, b_v)
        return hdr + vs

    hs = len(header(0, 0, 0))
    # 3 record vars, each 8 bytes per record -> recsize 24, interleaved
    recs = b""
    for r in range(3):
        recs += np.array([10.0 + r], dtype=">f8").tobytes()
        recs += np.array([20.0 + r], dtype=">f8").tobytes()
        recs += np.array([0.5 * r], dtype=">f8").tobytes()
    p = str(tmp_path / "rec.nc")
    with open(p, "wb") as f:
        f.write(header(hs, hs + 8, hs + 16) + recs)
    df = nc.read_netcdf(spark, p)
    rows = sorted(df.collect(), key=lambda r: r.v)
    assert [r.v for r in rows] == [0.0, 0.5, 1.0]
    from duckdb_spatial_spark.geo import wkb as WKB

    g = WKB.from_wkb(bytes(rows[2].geom))
    assert (float(g.data[0]), float(g.data[1])) == (22.0, 12.0)


def test_netcdf4_rejected(tmp_path):
    import duckdb_spatial_spark.sources.netcdf3 as nc

    p = str(tmp_path / "h5.nc")
    with open(p, "wb") as f:
        f.write(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError, match="netCDF-4"):
        nc.parse_header(p)


def test_netcdf_meta(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_read_meta

    p = str(tmp_path / "grid.nc")
    _write_raw_grid(p)
    # header-only branch: feature count from dims, no feature scan
    r = st_read_meta(spark, p).collect()[0]
    assert r.driver == "netCDF"
    assert r.feature_count == 12
    assert r.geometry_types == "Point"
