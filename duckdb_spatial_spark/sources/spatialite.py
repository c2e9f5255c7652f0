"""SpatiaLite reader/writer via stdlib sqlite3 (GDAL's "SQLite/Spatialite"
driver analog — the reference reaches it through GDAL dispatch,
``st_read.cpp``; no libspatialite needed for the storage format itself).

Independent implementation of the public SpatiaLite BLOB-Geometry format
(spatialite.org "BLOB-Geometry format" document):

  byte 0      0x00                  START marker
  byte 1      endianness            0x01 little / 0x00 big (whole blob)
  bytes 2-5   int32 SRID
  bytes 6-37  4 x f64 MBR           (minx, miny, maxx, maxy)
  byte 38     0x7C                  MBR_END marker
  bytes 39-42 int32 geometry class  1..7 (+1000 Z, +2000 M, +3000 ZM)
  payload     WKB-shaped but with NO per-geometry byte-order bytes; every
              child of a Multi*/GeometryCollection is preceded by a 0x69
              ENTITY marker + its own int32 class
  last byte   0xFE                  END marker

Layer discovery uses the ``geometry_columns`` registry (both the modern
``geometry_type INTEGER`` schema and the legacy ``type TEXT`` one).
Write side emits the modern schema + a minimal ``spatial_ref_sys``.
"""

from __future__ import annotations

import os
import sqlite3
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geo import geom as G
from ..geo import wkb as WKB
from ..geo.algorithms import bounds as _bounds
from .gpkg import _layer_schema, _ro_connect, _sqlite_to_spark

_START, _MBR_END, _END, _ENTITY = 0x00, 0x7C, 0xFE, 0x69


def _dims(cls: int) -> tuple[bool, bool]:
    return (cls // 1000) in (1, 3), (cls // 1000) in (2, 3)


def _decode_payload(buf, off, cls, fmt, has_z, has_m):
    width = 2 + has_z + has_m
    base = cls % 1000
    if base == G.POINT:
        vals = struct.unpack_from(f"{fmt}{width}d", buf, off)
        return G.Geometry(G.POINT, __import__("numpy").asarray(vals), has_z, has_m), off + 8 * width
    if base == G.LINESTRING:
        (n,) = struct.unpack_from(f"{fmt}i", buf, off)
        off += 4
        import numpy as np

        arr = np.frombuffer(buf, dtype=f"{fmt}f8", count=n * width, offset=off).reshape(n, width)
        return G.Geometry(G.LINESTRING, arr.copy(), has_z, has_m), off + 8 * n * width
    if base == G.POLYGON:
        (nr,) = struct.unpack_from(f"{fmt}i", buf, off)
        off += 4
        import numpy as np

        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(f"{fmt}i", buf, off)
            off += 4
            rings.append(
                np.frombuffer(buf, dtype=f"{fmt}f8", count=n * width, offset=off)
                .reshape(n, width).copy()
            )
            off += 8 * n * width
        return G.Geometry(G.POLYGON, rings, has_z, has_m), off
    if base in (G.MULTIPOINT, G.MULTILINESTRING, G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        (n,) = struct.unpack_from(f"{fmt}i", buf, off)
        off += 4
        kids = []
        for _ in range(n):
            if buf[off] != _ENTITY:
                raise ValueError(f"SpatiaLite BLOB: missing ENTITY marker at {off}")
            (kcls,) = struct.unpack_from(f"{fmt}i", buf, off + 1)
            kid, off = _decode_payload(buf, off + 5, kcls, fmt, *_dims(kcls))
            kids.append(kid)
        return G.Geometry(base, kids, has_z, has_m), off
    raise ValueError(f"SpatiaLite BLOB: unsupported class {cls}")


def splite_to_wkb(blob: bytes):
    """SpatiaLite BLOB geometry -> standard WKB (None on NULL/invalid)."""
    if blob is None or len(blob) < 44 or blob[0] != _START or blob[38] != _MBR_END:
        return None
    fmt = "<" if blob[1] == 0x01 else ">"
    (cls,) = struct.unpack_from(f"{fmt}i", blob, 39)
    g, off = _decode_payload(blob, 43, cls, fmt, *_dims(cls))
    if off >= len(blob) or blob[off] != _END:
        raise ValueError("SpatiaLite BLOB: missing END marker")
    return WKB.to_wkb(g)


def _encode_payload(g: G.Geometry, out: list):
    import numpy as np

    width = 2 + g.has_z + g.has_m
    if g.tag == G.POINT:
        out.append(np.asarray(g.data, dtype="<f8")[:width].tobytes())
    elif g.tag == G.LINESTRING:
        out.append(struct.pack("<i", len(g.data)))
        out.append(np.asarray(g.data, dtype="<f8")[:, :width].tobytes())
    elif g.tag == G.POLYGON:
        out.append(struct.pack("<i", len(g.data)))
        for r in g.data:
            out.append(struct.pack("<i", len(r)))
            out.append(np.asarray(r, dtype="<f8")[:, :width].tobytes())
    elif g.tag in (G.MULTIPOINT, G.MULTILINESTRING, G.MULTIPOLYGON, G.GEOMETRYCOLLECTION):
        out.append(struct.pack("<i", len(g.data)))
        for kid in g.data:
            out.append(bytes([_ENTITY]))
            out.append(struct.pack("<i", _splite_class(kid)))
            _encode_payload(kid, out)
    else:
        raise ValueError(f"SpatiaLite BLOB: unsupported geometry tag {g.tag}")


def _splite_class(g: G.Geometry) -> int:
    return g.tag + (1000 if g.has_z and not g.has_m else 0) + (
        2000 if g.has_m and not g.has_z else 0
    ) + (3000 if g.has_z and g.has_m else 0)


def wkb_to_splite(wkb: bytes, srid: int = 0):
    """Standard WKB -> SpatiaLite BLOB geometry (little-endian)."""
    if wkb is None:
        return None
    g = WKB.from_wkb(bytes(wkb))
    bb = _bounds(g)
    if bb is None or bb[0] is None:
        bb = (0.0, 0.0, 0.0, 0.0)
    out = [bytes([_START, 0x01]), struct.pack("<i", int(srid)),
           struct.pack("<4d", bb[0], bb[1], bb[2], bb[3]), bytes([_MBR_END]),
           struct.pack("<i", _splite_class(g))]
    _encode_payload(g, out)
    out.append(bytes([_END]))
    return b"".join(out)


def spatialite_layers(path: str) -> list[dict]:
    """[{table, geom_col, srid}] from the geometry_columns registry
    (modern INTEGER-typed or legacy TEXT-typed schema)."""
    con = _ro_connect(path)
    try:
        cols = {r[1] for r in con.execute("PRAGMA table_info(geometry_columns)")}
        if not cols:
            return []
        rows = con.execute(
            "SELECT f_table_name, f_geometry_column, srid FROM geometry_columns"
        ).fetchall()
        return [{"table": r[0], "geom_col": r[1], "srid": r[2]} for r in rows]
    finally:
        con.close()


def read_spatialite(
    spark: SparkSession, path: str, layer: str | None = None
) -> DataFrame:
    """ST_Read for SpatiaLite databases: geometry BLOBs decode to WKB
    ``geom``-typed binary; attributes per SQLite declared affinity."""
    from .xmlgeo import _make_df

    layers = spatialite_layers(path)
    if not layers:
        raise ValueError(f"{path}: no geometry_columns registry (not SpatiaLite?)")
    meta = next((l for l in layers if l["table"] == layer), layers[0]) if layer else layers[0]
    if layer and meta["table"] != layer:
        raise ValueError(f"{path}: no layer {layer!r}; have {[l['table'] for l in layers]}")
    table, geom_col = meta["table"], meta["geom_col"]
    schema = _layer_schema(path, table, geom_col)
    gi = [f.name for f in schema.fields].index(geom_col)

    def iter_rows(fp):
        con = _ro_connect(fp)
        try:
            for row in con.execute(f'SELECT * FROM "{table}"'):
                row = list(row)
                row[gi] = splite_to_wkb(row[gi])
                yield tuple(row)
        finally:
            con.close()

    return _make_df(spark, [path], schema, iter_rows, "spatialite")


_SPARK_TO_SQLITE = {
    "long": "INTEGER", "integer": "INTEGER", "short": "INTEGER",
    "double": "DOUBLE", "float": "DOUBLE", "boolean": "INTEGER",
    "string": "TEXT", "binary": "BLOB",
}


def write_spatialite(
    df: DataFrame,
    path: str,
    layer: str = "layer",
    geom_col: str = "geom",
    srid: int = 4326,
    max_rows: int = 5_000_000,
) -> None:
    """COPY TO (FORMAT GDAL, DRIVER SQLite, SPATIALITE=YES) analog: one
    SQLite file with the modern geometry_columns registry and SpatiaLite
    BLOB geometries. Serial single-file writer (standard cap)."""
    names = df.columns
    if geom_col not in names:
        raise ValueError(f"geometry column {geom_col!r} not in {names}")
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_spatialite: result exceeds max_rows={max_rows}; one SQLite "
            "file is a serial interchange format — use GeoParquet for big tables"
        )
    if os.path.exists(path):
        os.remove(path)
    gi = names.index(geom_col)
    con = sqlite3.connect(path)
    try:
        con.execute(
            "CREATE TABLE spatial_ref_sys (srid INTEGER PRIMARY KEY, auth_name TEXT,"
            " auth_srid INTEGER, ref_sys_name TEXT, proj4text TEXT, srtext TEXT)"
        )
        con.execute(
            "INSERT INTO spatial_ref_sys VALUES (4326, 'epsg', 4326, 'WGS 84',"
            " '+proj=longlat +datum=WGS84 +no_defs', 'GEOGCS[\"WGS 84\"]')"
        )
        con.execute(
            "CREATE TABLE geometry_columns (f_table_name TEXT NOT NULL,"
            " f_geometry_column TEXT NOT NULL, geometry_type INTEGER NOT NULL,"
            " coord_dimension INTEGER NOT NULL, srid INTEGER NOT NULL,"
            " spatial_index_enabled INTEGER NOT NULL,"
            " CONSTRAINT pk_geom_cols PRIMARY KEY (f_table_name, f_geometry_column))"
        )
        cols_sql = []
        for f in df.schema.fields:
            if f.name == geom_col:
                cols_sql.append(f'"{f.name}" BLOB')
            else:
                cols_sql.append(
                    f'"{f.name}" {_SPARK_TO_SQLITE.get(f.dataType.typeName(), "TEXT")}'
                )
        con.execute(f'CREATE TABLE "{layer}" ({", ".join(cols_sql)})')
        con.execute(
            "INSERT INTO geometry_columns VALUES (?, ?, 0, 2, ?, 0)",
            (layer, geom_col, srid),
        )
        out_rows = []
        for r in rows:
            row = list(r)
            row[gi] = wkb_to_splite(row[gi], srid) if row[gi] is not None else None
            out_rows.append(
                [v.item() if hasattr(v, "item") else v for v in row]
            )
        ph = ", ".join("?" for _ in names)
        collist = ", ".join(f'"{n}"' for n in names)
        con.executemany(f'INSERT INTO "{layer}" ({collist}) VALUES ({ph})', out_rows)
        con.commit()
    finally:
        con.close()
