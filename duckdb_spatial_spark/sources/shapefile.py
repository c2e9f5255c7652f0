"""Native shapefile reader (ST_ReadSHP analog).

The reference bundles shapelib (``spatial/src/spatial/core/io/shapefile/
read_shapefile.cpp``, fixed 578 LoC surface: .shp geometry + .dbf
attributes, encoding option, projection pushdown). This is an independent
pure-Python implementation of the public ESRI shapefile spec:

  .shp  100-byte header; records = (big-endian recno/length) + shape
  .dbf  dBase III header + fixed-width attribute records
  .prj  optional WKT CRS — tagged onto the geom column metadata as
        ``{"crs": <wkt>}`` (the reference's geometry-column CRS tagging,
        st_read.cpp:345-369); consume via functions.crs.geom_crs /
        st_transform_tagged

Shape types: Point(Z/M) 1/11/21, PolyLine(Z/M) 3/13/23, Polygon(Z/M)
5/15/25, MultiPoint(Z/M) 8/18/28. Polygon ring assembly follows the spec:
clockwise rings are shells, counter-clockwise rings are holes assigned to
the containing shell.

Spark integration: one DataSource partition per (file, record-range) so a
directory of shapefiles scans in parallel.
"""

from __future__ import annotations

import glob as _glob
import os
import struct

import numpy as np

from ..geo import geom as G
from ..geo import wkb as WKB

_SHAPE_POINT = {1, 11, 21}
_SHAPE_LINE = {3, 13, 23}
_SHAPE_POLY = {5, 15, 25}
_SHAPE_MPOINT = {8, 18, 28}


def _ring_signed_area(pts: np.ndarray) -> float:
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_ring(x, y, ring) -> bool:
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cond = ((y1 <= y) & (y2 > y)) | ((y2 <= y) & (y1 > y))
    if not cond.any():
        return False
    xi = x1[cond] + (y - y1[cond]) * (x2[cond] - x1[cond]) / (y2[cond] - y1[cond])
    return (int((xi > x).sum()) % 2) == 1


def _assemble_polygons(rings) -> G.Geometry:
    """SHP ring soup -> (multi)polygon: CW shells, CCW holes by containment."""
    shells = []
    holes = []
    for r in rings:
        if len(r) < 4:
            continue
        (shells if _ring_signed_area(r) < 0 else holes).append(r)
    if not shells:  # degenerate: treat everything as shells
        shells, holes = holes, []
    polys = [[s] for s in shells]
    for h in holes:
        placed = False
        hx, hy = float(h[0, 0]), float(h[0, 1])
        for p in polys:
            if _point_in_ring(hx, hy, p[0]):
                p.append(h)
                placed = True
                break
        if not placed and polys:
            polys[0].append(h)
    geoms = [G.Geometry(G.POLYGON, p) for p in polys]
    if len(geoms) == 1:
        return geoms[0]
    return G.Geometry(G.MULTIPOLYGON, geoms)


def _parse_shp_record(buf: bytes, shape_type: int):
    """One .shp record body -> Geometry (2D; Z/M coordinates are read as
    2D + has_z upgrade when present)."""
    st_ = struct.unpack_from("<i", buf, 0)[0]
    if st_ == 0:
        return None
    if st_ in _SHAPE_POINT:
        x, y = struct.unpack_from("<2d", buf, 4)
        if st_ == 11 and len(buf) >= 28:
            (z,) = struct.unpack_from("<d", buf, 20)
            return G.point(x, y, z)
        return G.point(x, y)
    if st_ in _SHAPE_MPOINT:
        (n,) = struct.unpack_from("<i", buf, 36)
        pts = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=40).reshape(n, 2)
        return G.Geometry(G.MULTIPOINT, [G.point(float(p[0]), float(p[1])) for p in pts])
    if st_ in _SHAPE_LINE or st_ in _SHAPE_POLY:
        nparts, npoints = struct.unpack_from("<2i", buf, 36)
        parts = list(struct.unpack_from(f"<{nparts}i", buf, 44))
        pts = np.frombuffer(buf, dtype="<f8", count=2 * npoints, offset=44 + 4 * nparts).reshape(
            npoints, 2
        )
        bounds = parts + [npoints]
        seqs = [np.array(pts[bounds[i]: bounds[i + 1]]) for i in range(nparts)]
        seqs = [s for s in seqs if len(s) >= 2]
        if st_ in _SHAPE_LINE:
            lines = [G.Geometry(G.LINESTRING, s) for s in seqs]
            return lines[0] if len(lines) == 1 else G.Geometry(G.MULTILINESTRING, lines)
        return _assemble_polygons(seqs)
    raise ValueError(f"unsupported shapefile shape type {st_}")


def iter_shp(path: str):
    """Yield (record_number, Geometry|None) from a .shp file."""
    with open(path, "rb") as f:
        header = f.read(100)
        if struct.unpack_from(">i", header, 0)[0] != 9994:
            raise ValueError(f"{path}: not a shapefile (bad magic)")
        shape_type = struct.unpack_from("<i", header, 32)[0]
        while True:
            rec = f.read(8)
            if len(rec) < 8:
                break
            recno, length = struct.unpack(">2i", rec)
            body = f.read(length * 2)
            if len(body) < 4:
                break
            yield recno, _parse_shp_record(body, shape_type)


def read_dbf(path: str, encoding: str = "utf-8"):
    """(.dbf fields, list of row tuples). Types: C->str, N/F->float/int,
    L->bool, D->str(yyyymmdd)."""
    with open(path, "rb") as f:
        hdr = f.read(32)
        n_records = struct.unpack_from("<I", hdr, 4)[0]
        header_size, record_size = struct.unpack_from("<2H", hdr, 8)
        fields = []
        while True:
            fd = f.read(32)
            if fd[0:1] == b"\r" or len(fd) < 32:
                break
            name = fd[:11].split(b"\0")[0].decode("ascii", "ignore")
            ftype = fd[11:12].decode("ascii")
            flen = fd[16]
            fdec = fd[17]
            fields.append((name, ftype, flen, fdec))
        f.seek(header_size)
        rows = []
        for _ in range(n_records):
            rec = f.read(record_size)
            if len(rec) < record_size or rec[0:1] == b"\x1a":
                break
            deleted = rec[0:1] == b"*"
            vals = []
            off = 1
            for (name, ftype, flen, fdec) in fields:
                raw = rec[off: off + flen]
                off += flen
                s = raw.decode(encoding, "replace").strip()
                if ftype in ("N", "F"):
                    if s in ("", "*" * len(s)):
                        vals.append(None)
                    elif ftype == "N" and fdec == 0 and "." not in s:
                        try:
                            vals.append(int(s))
                        except ValueError:
                            vals.append(None)
                    else:
                        try:
                            vals.append(float(s))
                        except ValueError:
                            vals.append(None)
                elif ftype == "L":
                    vals.append(True if s in "YyTt" else (False if s in "NnFf" else None))
                else:
                    vals.append(s if s else None)
            if not deleted:
                rows.append(tuple(vals))
    return fields, rows


def _spark_type(ftype: str, fdec: int):
    from pyspark.sql import types as T

    if ftype in ("N", "F"):
        return T.LongType() if (ftype == "N" and fdec == 0) else T.DoubleType()
    if ftype == "L":
        return T.BooleanType()
    return T.StringType()


def read_shapefile(spark, path: str, encoding: str = "utf-8",
                   sibling_files: list | None = None):
    """ST_ReadSHP: .shp geometry + .dbf attributes as a DataFrame
    (geom = WKB BinaryType). ``path`` may be a .shp file, a glob, or a dir.

    ``sibling_files`` (GDAL open-option parity, ``st_read.cpp:684-692``):
    when given, sidecar discovery is RESTRICTED to that list — the .dbf
    for each .shp is taken from it (matched by stem) instead of probed
    from the filesystem, and a .shp whose .dbf is not listed reads with
    geometry only. Useful against object stores where LIST is expensive
    or sidecars live elsewhere."""
    from .vfs import localize

    _v = localize(path, (".shp",))
    if _v is not None:
        if len(_v) != 1:
            raise ValueError(f"{path!r}: archive holds {len(_v)} .shp members; address one with !member")
        path = _v[0]
    from pyspark.sql import types as T

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.shp")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)

    def _sidecar_for(fp: str, ext: str):
        if sibling_files is not None:
            stem = os.path.splitext(os.path.basename(fp))[0].lower()
            for s in sibling_files:
                if s.lower().endswith(ext) and (
                    os.path.splitext(os.path.basename(s))[0].lower() == stem
                ):
                    return s
            return None  # siblings listed, sidecar not among them
        return os.path.splitext(fp)[0] + ext

    def _dbf_for(fp: str):
        return _sidecar_for(fp, ".dbf")

    # .prj sidecar -> geometry-column CRS tag (the reference tags the
    # geometry column with the layer CRS at bind time, st_read.cpp:345-369;
    # here the WKT lands in the geom StructField metadata under "crs",
    # consumable by functions.crs.st_transform_tagged)
    prj = _sidecar_for(files[0], ".prj")
    crs_wkt = None
    if prj is not None and os.path.exists(prj):
        try:
            with open(prj, encoding="utf-8", errors="replace") as fh:
                crs_wkt = fh.read().strip() or None
        except OSError:
            crs_wkt = None

    # bind-time schema from the first .dbf (mirrors read_shapefile.cpp:45-130)
    dbf0 = _dbf_for(files[0])
    if dbf0 is not None and os.path.exists(dbf0):
        fields, _ = read_dbf(dbf0, encoding)
    else:
        fields = []
    schema = T.StructType(
        [T.StructField(n or f"f{i}", _spark_type(t, d), True) for i, (n, t, fl, d) in enumerate(fields)]
        + [T.StructField("geom", T.BinaryType(), True,
                         {"crs": crs_wkt} if crs_wkt else None)]
    )

    try:
        from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

        # unique per-call registration name: Spark resolves python
        # sources BY NAME; a fixed name + fresh closure state hands a
        # second read the stale reader (schema mismatch)
        import uuid as _uuid

        _ds_name = f"shapefile_{_uuid.uuid4().hex[:12]}"

        class _Reader(DataSourceReader):
            def __init__(self, files, schema):
                self._files = files

            def partitions(self):
                return [InputPartition(f) for f in self._files]

            def read(self, partition):
                fp = partition.value
                dbf = _dbf_for(fp)
                attrs = (
                    read_dbf(dbf, encoding)[1]
                    if dbf is not None and os.path.exists(dbf) else None
                )
                for i, (recno, geom) in enumerate(iter_shp(fp)):
                    row = list(attrs[i]) if attrs and i < len(attrs) else [None] * len(fields)
                    row.append(WKB.to_wkb(geom) if geom is not None else None)
                    yield tuple(row)

        class ShapefileSource(DataSource):
            @classmethod
            def name(cls):
                return _ds_name

            def schema(self):
                return schema

            def reader(self, schema):
                return _Reader(files, schema)

        spark.dataSource.register(ShapefileSource)
        return spark.read.format(_ds_name).schema(schema).load(path)
    except ImportError:
        rows = []
        for fp in files:
            dbf = _dbf_for(fp)
            attrs = (
                read_dbf(dbf, encoding)[1]
                if dbf is not None and os.path.exists(dbf) else None
            )
            for i, (recno, geom) in enumerate(iter_shp(fp)):
                row = list(attrs[i]) if attrs and i < len(attrs) else [None] * len(fields)
                row.append(WKB.to_wkb(geom) if geom is not None else None)
                rows.append(tuple(row))
        return spark.createDataFrame(rows, schema)


def write_shapefile(df, path: str, geom_col: str = "geom", max_rows: int = 5_000_000,
                    crs: str | None = None):
    """Minimal .shp/.shx/.dbf writer (point/line/polygon 2D) — enough for
    round-trip tests and export; collects to the driver, bounded by
    ``max_rows`` (shapefiles are a legacy small-data interchange format and
    capped at 2 GB anyway; big data should use GeoParquet).

    ``crs=`` writes a ``.prj`` sidecar with the given WKT CRS text; when
    omitted, a ``crs`` tag on the geom column metadata (as produced by
    read_shapefile / read_gpkg) is propagated automatically."""
    if crs is None:
        md = df.schema[geom_col].metadata if geom_col in df.columns else None
        crs = (md or {}).get("crs")
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"write_shapefile: {n} rows exceeds max_rows={max_rows}; a "
            "shapefile is a single driver-materialized file — write "
            "GeoParquet (plans.pruning.write_geo_parquet) for tables this size"
        )
    rows = df.collect()
    cols = [c for c in df.columns if c != geom_col]
    geoms = [WKB.from_wkb(bytes(r[geom_col])) if r[geom_col] is not None else None for r in rows]
    tags = {g.tag for g in geoms if g is not None}
    if tags <= {G.POINT}:
        shp_type = 1
    elif tags <= {G.LINESTRING, G.MULTILINESTRING}:
        shp_type = 3
    elif tags <= {G.POLYGON, G.MULTIPOLYGON}:
        shp_type = 5
    else:
        raise ValueError(f"mixed geometry types not writable to shapefile: {tags}")

    recs = []
    minx = miny = float("inf")
    maxx = maxy = float("-inf")
    from ..geo import algorithms as A

    for g in geoms:
        if g is None:
            recs.append(struct.pack("<i", 0))
            continue
        b = A.bounds(g)
        minx, miny = min(minx, b[0]), min(miny, b[1])
        maxx, maxy = max(maxx, b[2]), max(maxy, b[3])
        if shp_type == 1:
            recs.append(struct.pack("<i2d", 1, float(g.data[0]), float(g.data[1])))
        else:
            seqs = []
            for leaf in g.flatten():
                if leaf.tag == G.LINESTRING:
                    seqs.append(leaf.data[:, :2])
                else:
                    for k, ring in enumerate(leaf.data):
                        r = ring[:, :2]
                        sa = _ring_signed_area(r)
                        # spec: shells CW (negative area), holes CCW
                        if (k == 0 and sa > 0) or (k > 0 and sa < 0):
                            r = r[::-1]
                        seqs.append(r)
            npoints = sum(len(s) for s in seqs)
            body = struct.pack("<i4d2i", shp_type, b[0], b[1], b[2], b[3], len(seqs), npoints)
            off = 0
            for s in seqs:
                body += struct.pack("<i", off)
                off += len(s)
            for s in seqs:
                body += np.ascontiguousarray(s, dtype="<f8").tobytes()
            recs.append(body)

    base = os.path.splitext(path)[0]
    shp_payload = b""
    shx_payload = b""
    offset = 50  # in 16-bit words
    for i, body in enumerate(recs, start=1):
        length = len(body) // 2
        shp_payload += struct.pack(">2i", i, length) + body
        shx_payload += struct.pack(">2i", offset, length)
        offset += 4 + length
    if not np.isfinite(minx):
        minx = miny = maxx = maxy = 0.0

    def header(total_words):
        h = struct.pack(">i", 9994) + b"\0" * 20 + struct.pack(">i", total_words)
        h += struct.pack("<2i", 1000, shp_type)
        h += struct.pack("<4d", minx, miny, maxx, maxy) + struct.pack("<4d", 0, 0, 0, 0)
        return h

    with open(base + ".shp", "wb") as f:
        f.write(header(50 + len(shp_payload) // 2) + shp_payload)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + len(shx_payload) // 2) + shx_payload)
    if crs:
        with open(base + ".prj", "w", encoding="utf-8") as f:
            f.write(str(crs).strip())

    # dbf: stringify everything (C fields) — portable and lossless enough
    with open(base + ".dbf", "wb") as f:
        n = len(rows)
        flen = 32
        fields_desc = b""
        for c in cols or ["fid"]:
            fields_desc += c[:10].encode("ascii", "ignore").ljust(11, b"\0") + b"C" + b"\0" * 4 + bytes([flen]) + b"\0" * 15
        header_size = 32 + len(fields_desc) + 1
        record_size = 1 + flen * max(len(cols), 1)
        f.write(struct.pack("<4BI2H20x", 3, 24, 1, 1, n, header_size, record_size))
        f.write(fields_desc + b"\r")
        for r in rows:
            f.write(b" ")
            if cols:
                for c in cols:
                    v = "" if r[c] is None else str(r[c])
                    f.write(v[:flen].encode("ascii", "ignore").ljust(flen))
            else:
                f.write(b" " * flen)
        f.write(b"\x1a")
