"""netCDF classic (CDF-1/CDF-2) reader + writer — pure binary codec.

The reference reads netCDF through GDAL's netCDF driver
(``st_read.cpp:684-692`` format tail). This is a from-scratch
implementation of the public *NetCDF Classic Format Specification*
(Unidata; the on-disk CDF-1 magic ``CDF\\x01`` / CDF-2 ``CDF\\x02``
layout): big-endian header of dim/gatt/var lists, 4-byte-aligned
name/value padding, contiguous fixed variables, interleaved record
variables. No netCDF4/HDF5 (that container raises loudly).

Vector semantics (GDAL treats netCDF as raster; ST_Read wants rows):

* **point series** — lat/lon 1-D over the SAME dimension (CF discrete
  sampling "point" featureType): one row per element, POINT(lon, lat)
  geometry, every other 1-D variable on that dimension as a column.
* **grid** — lat(nlat) and lon(nlon) over DIFFERENT dimensions: one row
  per cell, POINT(lon[j], lat[i]), every 2-D (nlat, nlon) variable as a
  column. This is the "flatten a raster grid to a point table" pipeline
  shape.

CF attribute conventions honored: coordinate variables found by
``units`` (degrees_north/degrees_east), ``standard_name``
(latitude/longitude) or name; ``scale_factor``/``add_offset`` applied;
``_FillValue``/``missing_value`` → NULL. Scale story: the header parse
is O(header) on the driver and data loads once as numpy — one-file
codec like the other single-file formats; at 100 TB convert to
(geo)parquet once and scan that.
"""

from __future__ import annotations

import os
import struct

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C
_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_SIZES = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def i4(self) -> int:
        v = struct.unpack_from(">i", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def u4(self) -> int:
        v = struct.unpack_from(">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def i8(self) -> int:
        v = struct.unpack_from(">q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n + (-n % 4)  # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, nelems: int):
        size = _SIZES[nc_type] * nelems
        raw = self.buf[self.pos : self.pos + size]
        self.pos += size + (-size % 4)
        if nc_type == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        return np.frombuffer(raw, dtype=_DTYPES[nc_type])


def _parse_atts(r: _Reader) -> dict:
    tag = r.i4()
    n = r.i4()
    if tag == 0 and n == 0:
        return {}
    if tag != _NC_ATTRIBUTE:
        raise ValueError(f"bad attribute list tag 0x{tag:X}")
    out = {}
    for _ in range(n):
        nm = r.name()
        t = r.i4()
        ne = r.i4()
        out[nm] = r.values(t, ne)
    return out


def parse_header(path: str) -> dict:
    """Header-only parse: dims, global atts, variables (no data read).
    Used by both the reader and ``st_read_meta``."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head[:3] != b"CDF":
            if head[:4] == b"\x89HDF":
                raise ValueError(
                    f"{path}: netCDF-4 (HDF5 container) is not supported; "
                    "convert to classic (nccopy -k classic) or parquet"
                )
            raise ValueError(f"{path}: not a netCDF classic file")
        version = head[3]
        if version not in (1, 2):
            raise ValueError(f"{path}: unsupported CDF version {version}")
        f.seek(0)
        # headers are small; the data region is only mapped lazily below
        buf = f.read()
    r = _Reader(buf)
    r.pos = 4
    numrecs = r.u4()  # 0xFFFFFFFF = streaming ("indeterminate")
    tag = r.i4()
    ndims = r.i4()
    dims = []
    if tag == _NC_DIMENSION:
        for _ in range(ndims):
            dims.append((r.name(), r.i4()))
    elif not (tag == 0 and ndims == 0):
        raise ValueError("bad dimension list")
    gatts = _parse_atts(r)
    tag = r.i4()
    nvars = r.i4()
    if tag not in (_NC_VARIABLE, 0):
        raise ValueError("bad variable list")
    variables = []
    for _ in range(nvars if tag == _NC_VARIABLE else 0):
        nm = r.name()
        nd = r.i4()
        dimids = [r.i4() for _ in range(nd)]
        atts = _parse_atts(r)
        t = r.i4()
        vsize = r.u4()
        begin = r.i8() if version == 2 else r.u4()
        variables.append(
            {
                "name": nm,
                "dimids": dimids,
                "atts": atts,
                "type": t,
                "vsize": vsize,
                "begin": begin,
                "record": bool(dimids) and dims[dimids[0]][1] == 0,
            }
        )
    # recsize = sum of record-var vsizes (spec: each vsize already padded,
    # except the special case of exactly ONE record variable, which is
    # packed without padding)
    rec_vars = [v for v in variables if v["record"]]
    recsize = sum(v["vsize"] for v in rec_vars)
    if len(rec_vars) == 1:
        v = rec_vars[0]
        per_rec = max(
            _SIZES[v["type"]]
            * int(np.prod([dims[d][1] for d in v["dimids"][1:]], dtype=np.int64)),
            _SIZES[v["type"]],
        )
        recsize = per_rec
    if numrecs == 0xFFFFFFFF and rec_vars:
        first = min(v["begin"] for v in rec_vars)
        numrecs = (os.path.getsize(path) - first) // max(recsize, 1)
    return {
        "version": version,
        "numrecs": int(numrecs),
        "dims": dims,
        "gatts": gatts,
        "variables": variables,
        "recsize": recsize,
        "_buf": buf,
    }


def _load_var(h: dict, v: dict) -> np.ndarray:
    """Materialize one variable as a numpy array (record dim resolved)."""
    dims = h["dims"]
    buf = h["_buf"]
    shape = [dims[d][1] for d in v["dimids"]]
    if v["record"]:
        shape[0] = h["numrecs"]
        per_rec_elems = int(np.prod(shape[1:], dtype=np.int64)) if len(shape) > 1 else 1
        itemsize = _SIZES[v["type"]]
        out = np.empty(int(np.prod(shape, dtype=np.int64)), dtype=_DTYPES[v["type"]])
        for rec in range(shape[0]):
            off = v["begin"] + rec * h["recsize"]
            chunk = np.frombuffer(
                buf, dtype=_DTYPES[v["type"]], count=per_rec_elems, offset=off
            )
            out[rec * per_rec_elems : (rec + 1) * per_rec_elems] = chunk
        arr = out.reshape(shape)
    else:
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        arr = np.frombuffer(buf, dtype=_DTYPES[v["type"]], count=n, offset=v["begin"])
        arr = arr.reshape(shape) if shape else arr
    return arr


def _decode_values(v: dict, arr: np.ndarray):
    """Apply CF scale_factor/add_offset; _FillValue/missing_value → NaN."""
    atts = v["atts"]
    fill = atts.get("_FillValue", atts.get("missing_value"))
    if v["type"] == NC_CHAR:
        return arr
    out = arr.astype(np.float64) if v["type"] != NC_DOUBLE else arr.astype(np.float64).copy()
    if fill is not None and len(np.atleast_1d(fill)):
        out[arr == np.asarray(fill).ravel()[0]] = np.nan
    scale = atts.get("scale_factor")
    off = atts.get("add_offset")
    if scale is not None:
        out = out * float(np.asarray(scale).ravel()[0])
    if off is not None:
        out = out + float(np.asarray(off).ravel()[0])
    if scale is None and off is None and v["type"] in (NC_BYTE, NC_SHORT, NC_INT):
        # keep integral types integral when nothing remaps them
        if fill is None or not np.isnan(out).any():
            return arr.astype(np.int64)
    return out


def _att_str(atts: dict, key: str) -> str:
    v = atts.get(key)
    return v.strip().lower() if isinstance(v, str) else ""


def _find_coords(h: dict):
    """Locate the latitude/longitude variables by CF conventions."""
    lat = lon = None
    for v in h["variables"]:
        units = _att_str(v["atts"], "units")
        std = _att_str(v["atts"], "standard_name")
        nm = v["name"].lower()
        if lat is None and (
            units.startswith("degrees_north") or std == "latitude" or nm in ("lat", "latitude", "y")
        ):
            lat = v
        elif lon is None and (
            units.startswith("degrees_east") or std == "longitude" or nm in ("lon", "longitude", "x")
        ):
            lon = v
    if lat is None or lon is None:
        raise ValueError(
            "no CF latitude/longitude coordinate variables found "
            "(units degrees_north/degrees_east, standard_name, or lat/lon names)"
        )
    return lat, lon


def read_netcdf(spark, path: str):
    """ST_Read for netCDF classic: rows of POINT geometries + attribute
    columns, per the point-series / grid semantics in the module doc."""
    from pyspark.sql import types as T

    from ..geo import geom as G
    from ..geo import wkb as WKB

    h = parse_header(path)
    lat_v, lon_v = _find_coords(h)
    lat = _decode_values(lat_v, _load_var(h, lat_v)).astype(np.float64).ravel()
    lon = _decode_values(lon_v, _load_var(h, lon_v)).astype(np.float64).ravel()

    same_dim = (
        len(lat_v["dimids"]) == 1
        and lat_v["dimids"] == lon_v["dimids"]
    )
    cols: list[tuple[str, object]] = []
    if same_dim:
        obs_dim = lat_v["dimids"][0]
        n = len(lat)
        ys, xs = lat, lon
        for v in h["variables"]:
            if v in (lat_v, lon_v):
                continue
            if v["type"] == NC_CHAR and len(v["dimids"]) == 2 and v["dimids"][0] == obs_dim:
                arr = _load_var(h, v)
                strs = [
                    b"".join(row).decode("utf-8", errors="replace").rstrip("\x00 ")
                    for row in arr
                ]
                cols.append((v["name"], strs))
            elif len(v["dimids"]) == 1 and v["dimids"][0] == obs_dim and v["type"] != NC_CHAR:
                cols.append((v["name"], _decode_values(v, _load_var(h, v)).ravel()))
    else:
        if len(lat_v["dimids"]) != 1 or len(lon_v["dimids"]) != 1:
            raise ValueError("only 1-D coordinate variables are supported")
        dlat, dlon = lat_v["dimids"][0], lon_v["dimids"][0]
        n = len(lat) * len(lon)
        ys = np.repeat(lat, len(lon))
        xs = np.tile(lon, len(lat))
        for v in h["variables"]:
            if v in (lat_v, lon_v) or v["type"] == NC_CHAR:
                continue
            if [d for d in v["dimids"]] == [dlat, dlon]:
                cols.append((v["name"], _decode_values(v, _load_var(h, v)).reshape(n)))
            elif [d for d in v["dimids"]] == [dlon, dlat]:
                cols.append(
                    (v["name"], _decode_values(v, _load_var(h, v)).T.reshape(n))
                )

    fields = []
    for nm, vals in cols:
        if isinstance(vals, list):
            fields.append(T.StructField(nm, T.StringType(), True))
        elif np.issubdtype(np.asarray(vals).dtype, np.integer):
            fields.append(T.StructField(nm, T.LongType(), True))
        else:
            fields.append(T.StructField(nm, T.DoubleType(), True))
    fields.append(T.StructField("geom", T.BinaryType(), True))
    schema = T.StructType(fields)

    rows = []
    for i in range(n):
        vals = []
        for nm, arr in cols:
            v = arr[i]
            if isinstance(arr, list):
                vals.append(v)
            elif isinstance(v, (np.floating, float)) and np.isnan(v):
                vals.append(None)
            else:
                vals.append(int(v) if np.issubdtype(type(v), np.integer) else float(v))
        x, y = xs[i], ys[i]
        if np.isnan(x) or np.isnan(y):
            vals.append(None)
        else:
            vals.append(WKB.to_wkb(G.point(float(x), float(y))))
        rows.append(tuple(vals))
    return spark.createDataFrame(rows, schema)


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def i4(self, v: int):
        self.parts.append(struct.pack(">i", int(v)))

    def name(self, s: str):
        b = s.encode("utf-8")
        self.i4(len(b))
        self.parts.append(b + b"\x00" * (-len(b) % 4))

    def raw(self, b: bytes):
        self.parts.append(b)

    def size(self) -> int:
        return sum(len(p) for p in self.parts)


def write_netcdf(df, path: str, geom_col: str = "geom", max_rows: int = 1_000_000) -> int:
    """COPY TO netCDF classic (CDF-1): one ``obs`` dimension, ``lat``/
    ``lon`` double coordinate variables (CF units) from POINT geometries,
    numeric columns as doubles/ints, strings as char matrices over a
    per-column strN dimension. Single-file sink — collect is bounded by
    ``max_rows`` like the other one-file writers."""
    from ..geo import wkb as WKB

    n_rows = df.count()
    if n_rows > max_rows:
        raise ValueError(
            f"write_netcdf is a single-file sink: {n_rows} rows > max_rows={max_rows}; "
            "raise max_rows= explicitly or write (geo)parquet instead"
        )
    pdf = df.toPandas()
    cols = [c for c in pdf.columns if c != geom_col]
    lat = np.full(len(pdf), np.nan)
    lon = np.full(len(pdf), np.nan)
    for i, b in enumerate(pdf[geom_col]):
        if b is None:
            continue
        g = WKB.from_wkb(bytes(b))
        if g.tag == 1 and g.data is not None:  # POINT
            lon[i], lat[i] = float(g.data[0]), float(g.data[1])

    # variable planning: (name, nc_type, dims, big-endian payload)
    dims: list[tuple[str, int]] = [("obs", len(pdf))]
    var_plans = []
    var_plans.append(("lat", NC_DOUBLE, [0], lat.astype(">f8").tobytes(),
                      {"units": "degrees_north"}))
    var_plans.append(("lon", NC_DOUBLE, [0], lon.astype(">f8").tobytes(),
                      {"units": "degrees_east"}))
    for c in cols:
        s = pdf[c]
        if s.dtype.kind in ("i", "u") and not s.isna().any():
            var_plans.append((c, NC_INT, [0], s.to_numpy(np.int64).astype(">i4").tobytes(), {}))
        elif s.dtype.kind in ("f", "i", "u"):
            arr = s.to_numpy(np.float64)
            var_plans.append((c, NC_DOUBLE, [0], arr.astype(">f8").tobytes(), {}))
        else:
            # netCDF char matrices are C-style NUL-padded: embedded NULs
            # are not representable and are stripped on write
            strs = ["" if v is None else str(v).replace("\x00", "") for v in s]
            width = max(1, max((len(x.encode("utf-8")) for x in strs), default=1))
            dim_id = len(dims)
            dims.append((f"str_{c}", width))
            buf = b"".join(x.encode("utf-8").ljust(width, b"\x00")[:width] for x in strs)
            var_plans.append((c, NC_CHAR, [0, dim_id], buf, {}))

    def emit_prefix(w):
        w.raw(b"CDF\x01")
        w.i4(0)  # numrecs (no record dimension used)
        w.i4(_NC_DIMENSION)
        w.i4(len(dims))
        for nm, ln in dims:
            w.name(nm)
            w.i4(ln)
        w.i4(0)
        w.i4(0)  # no global attributes
        w.i4(_NC_VARIABLE)
        w.i4(len(var_plans))

    w = _Writer()
    emit_prefix(w)

    # two passes: first with begin=0 to size the header, then for real
    def emit_vars(begin_offsets):
        for (nm, t, dimids, payload, atts), begin in zip(var_plans, begin_offsets):
            w.name(nm)
            w.i4(len(dimids))
            for d in dimids:
                w.i4(d)
            if atts:
                w.i4(_NC_ATTRIBUTE)
                w.i4(len(atts))
                for an, av in atts.items():
                    w.name(an)
                    w.i4(NC_CHAR)
                    ab = av.encode("utf-8")
                    w.i4(len(ab))
                    w.raw(ab + b"\x00" * (-len(ab) % 4))
            else:
                w.i4(0)
                w.i4(0)
            w.i4(t)
            vsize = len(payload) + (-len(payload) % 4)
            w.i4(vsize)
            w.i4(begin)

    emit_vars([0] * len(var_plans))
    header_size = w.size()
    begins = []
    off = header_size
    for _, _, _, payload, _ in var_plans:
        begins.append(off)
        off += len(payload) + (-len(payload) % 4)
    w = _Writer()
    emit_prefix(w)
    emit_vars(begins)
    assert w.size() == header_size
    with open(path, "wb") as f:
        for p in w.parts:
            f.write(p)
        for _, _, _, payload, _ in var_plans:
            f.write(payload + b"\x00" * (-len(payload) % 4))
    return n_rows
