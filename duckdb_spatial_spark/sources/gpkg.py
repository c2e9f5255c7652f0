"""GeoPackage reader/writer via stdlib sqlite3 (the reference's highest-value
``ST_Read`` format after shapefile; it reads .gpkg through GDAL,
``spatial/src/spatial/gdal/functions/st_read.cpp:153-395``, exercised by
``test/sql/gdal/*``).

Independent implementation of the public OGC GeoPackage spec (12-128r19):

  * discovery: ``gpkg_contents`` (data_type='features') joined with
    ``gpkg_geometry_columns`` for the geometry column + srs
  * GeoPackageBinary: magic ``GP`` + version + flags + int32 srs_id, then an
    optional envelope (flags bits 1-3: 0 none, 1 xy, 2 xyz, 3 xym, 4 xyzm),
    then standard WKB — exactly what the rest of the engine consumes
  * attribute types per the SQLite affinity table in the spec

Spark integration: **rowid-range partitions** — the driver reads only
``min(rowid), max(rowid)`` per layer, then each task opens the file
read-only (``immutable=1`` URI) and scans its own range. A directory of
.gpkg files additionally fans out per file. SQLite allows any number of
concurrent readers, so a 1000-task scan is safe; one file is still one
disk, so at 100 TB you'd shard into many .gpkg files (the layout this
reader's per-file fan-out already handles).
"""

from __future__ import annotations

import glob as _glob
import os
import sqlite3
import struct

_ENVELOPE_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


def strip_gp_header(blob: bytes):
    """GeoPackageBinary -> raw WKB bytes (None for the empty-geometry flag)."""
    if blob is None or len(blob) < 8 or blob[0:2] != b"GP":
        return None
    flags = blob[3]
    if flags & 0x20:  # extended (non-WKB) encoding — not supported
        return None
    env_ind = (flags >> 1) & 0x7
    nd = _ENVELOPE_DOUBLES.get(env_ind)
    if nd is None:
        return None
    off = 8 + 8 * nd
    if flags & 0x10:  # empty-geometry flag
        return None
    if len(blob) <= off:
        return None
    return bytes(blob[off:])


def make_gp_header(wkb: bytes, srs_id: int = 4326, envelope: tuple | None = None) -> bytes:
    """Raw WKB -> GeoPackageBinary (little-endian header; envelope optional)."""
    flags = 0x01  # little-endian
    env = b""
    if envelope is not None:
        flags |= 0x02  # envelope indicator 1 (xy)
        env = struct.pack("<4d", envelope[0], envelope[2], envelope[1], envelope[3])
        # spec order: minx, maxx, miny, maxy
    return b"GP\x00" + bytes([flags]) + struct.pack("<i", srs_id) + env + wkb


def _ro_connect(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)


def gpkg_layers(path: str) -> list[dict]:
    """Feature layers: [{table, geom_col, srs_id, geometry_type}]."""
    con = _ro_connect(path)
    try:
        rows = con.execute(
            "SELECT c.table_name, g.column_name, g.srs_id, g.geometry_type_name"
            " FROM gpkg_contents c JOIN gpkg_geometry_columns g"
            " ON c.table_name = g.table_name WHERE c.data_type = 'features'"
        ).fetchall()
        return [
            {"table": r[0], "geom_col": r[1], "srs_id": r[2], "geometry_type": r[3]}
            for r in rows
        ]
    finally:
        con.close()


_AFFINITY = (
    ("INT", "long"),
    ("CHAR", "string"), ("CLOB", "string"), ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"), ("FLOA", "double"), ("DOUB", "double"),
    ("BOOL", "boolean"),
    ("DATE", "string"),  # DATE/DATETIME kept as ISO strings (spec stores TEXT)
)


def _sqlite_to_spark(decl: str):
    from pyspark.sql import types as T

    d = (decl or "").upper()
    for k, v in _AFFINITY:
        if k in d:
            return {
                "long": T.LongType(), "string": T.StringType(), "binary": T.BinaryType(),
                "double": T.DoubleType(), "boolean": T.BooleanType(),
            }[v]
    return T.StringType()  # NUMERIC/unknown affinity: keep text


def _srs_crs(path: str, srs_id) -> str | None:
    """CRS string for a layer's srs_id from gpkg_spatial_ref_sys: the WKT
    ``definition`` when the file carries a real one, else ``EPSG:<code>``
    for EPSG-organization rows. Feeds the geom-column crs tag."""
    if srs_id is None or srs_id in (-1, 0):
        return None
    con = _ro_connect(path)
    try:
        row = con.execute(
            "SELECT organization, organization_coordsys_id, definition"
            " FROM gpkg_spatial_ref_sys WHERE srs_id = ?", (srs_id,)
        ).fetchone()
    except sqlite3.Error:
        row = None
    finally:
        con.close()
    if row is None:
        return f"EPSG:{srs_id}"
    org, code, definition = row
    # prefer the EPSG code: many writers (ours included) store an
    # abbreviated definition (e.g. GEOGCS["WGS 84"]) that names the CRS
    # without carrying a parseable datum
    if org and str(org).upper() == "EPSG" and code is not None:
        return f"EPSG:{code}"
    d = (definition or "").strip()
    if d and d.lower() != "undefined" and "[" in d:
        return d
    return f"EPSG:{srs_id}"


def _layer_schema(path: str, table: str, geom_col: str, crs: str | None = None):
    from pyspark.sql import types as T

    con = _ro_connect(path)
    try:
        info = con.execute(f'PRAGMA table_info("{table}")').fetchall()
    finally:
        con.close()
    fields = []
    for cid, name, decl, notnull, dflt, pk in info:
        if name == geom_col:
            fields.append(
                T.StructField(name, T.BinaryType(), True,
                              {"crs": crs} if crs else None)
            )
        else:
            fields.append(T.StructField(name, _sqlite_to_spark(decl), True))
    return T.StructType(fields)


def read_gpkg(spark, path: str, layer: str | None = None, num_partitions: int | None = None,
              max_rows_per_batch: int | None = None):
    """ST_Read for .gpkg: one DataFrame per layer (default: first feature
    layer). ``path`` may be a file, glob, or directory of .gpkg files (all
    must share the layer's schema).

    ``max_rows_per_batch`` caps each scan partition's rowid span (the
    ST_Read ``max_batch_size`` parameter routed through st_read) — more,
    smaller partitions instead of defaultParallelism-sized ones."""
    from .vfs import localize

    _v = localize(path, (".gpkg",))
    if _v is not None:
        if len(_v) != 1:
            raise ValueError(f"{path!r}: archive holds {len(_v)} .gpkg members; address one with !member")
        path = _v[0]
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.gpkg")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)

    layers = gpkg_layers(files[0])
    if not layers:
        raise ValueError(f"{files[0]}: no feature layers in gpkg_contents")
    if layer is None:
        meta = layers[0]
    else:
        match = [l for l in layers if l["table"] == layer]
        if not match:
            raise ValueError(f"layer {layer!r} not found; have {[l['table'] for l in layers]}")
        meta = match[0]
    table, geom_col = meta["table"], meta["geom_col"]
    schema = _layer_schema(
        files[0], table, geom_col, crs=_srs_crs(files[0], meta.get("srs_id"))
    )
    names = [f.name for f in schema.fields]
    gidx = names.index(geom_col)
    n_parts = int(num_partitions or spark.sparkContext.defaultParallelism)

    # rowid ranges per file (driver reads 2 ints per file, no data scan)
    parts = []
    for fp in files:
        con = _ro_connect(fp)
        try:
            lo, hi = con.execute(f'SELECT min(rowid), max(rowid) FROM "{table}"').fetchone()
        finally:
            con.close()
        if lo is None:
            continue
        per_file = max(1, n_parts // len(files))
        span = (hi - lo + 1 + per_file - 1) // per_file
        if max_rows_per_batch is not None:
            span = max(1, min(span, int(max_rows_per_batch)))
        for s in range(lo, hi + 1, span):
            parts.append((fp, s, min(s + span - 1, hi)))

    collist = ", ".join(f'"{n}"' for n in names)

    def scan(part):
        fp, lo, hi = part
        con = _ro_connect(fp)
        try:
            cur = con.execute(
                f'SELECT {collist} FROM "{table}" WHERE rowid BETWEEN ? AND ?', (lo, hi)
            )
            for row in cur:
                row = list(row)
                row[gidx] = strip_gp_header(row[gidx])
                yield tuple(row)
        finally:
            con.close()

    try:
        from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

        # unique per-call registration name: Spark resolves python
        # sources BY NAME; a fixed name + fresh closure state hands a
        # second read the stale reader (schema mismatch)
        import uuid as _uuid

        _ds_name = f"geopackage_{_uuid.uuid4().hex[:12]}"

        class _Reader(DataSourceReader):
            def __init__(self):
                pass

            def partitions(self):
                return [InputPartition(p) for p in parts] or [InputPartition(None)]

            def read(self, partition):
                if partition.value is None:
                    return iter(())
                return scan(partition.value)

        class GpkgSource(DataSource):
            @classmethod
            def name(cls):
                return _ds_name

            def schema(self):
                return schema

            def reader(self, schema):
                return _Reader()

        spark.dataSource.register(GpkgSource)
        return spark.read.format(_ds_name).schema(schema).load(path)
    except ImportError:  # pre-4.0 fallback: parallelize ranges
        rdd = spark.sparkContext.parallelize(parts, max(len(parts), 1)).flatMap(scan)
        return spark.createDataFrame(rdd, schema)


_SPARK_TO_SQLITE = {
    "long": "INTEGER", "int": "MEDIUMINT", "short": "SMALLINT", "byte": "TINYINT",
    "double": "DOUBLE", "float": "FLOAT", "string": "TEXT", "binary": "BLOB",
    "boolean": "BOOLEAN", "date": "DATE", "timestamp": "DATETIME",
}


def write_gpkg(
    df,
    path: str,
    layer: str = "layer",
    geom_col: str = "geom",
    srs_id: int = 4326,
    max_rows: int = 5_000_000,
    crs: str | None = None,
):
    """COPY TO (FORMAT GDAL, DRIVER 'GPKG') analog. A GeoPackage is one
    SQLite file, so the write is inherently serial (the reference's GDAL
    write is too) — rows are collected via Arrow, bounded by ``max_rows``
    so a big table cannot OOM the driver. Use GeoParquet for big data;
    this is the interchange path.

    ``crs=`` registers the layer SRS in gpkg_spatial_ref_sys: an
    ``EPSG:n`` code sets ``srs_id`` to n with the EPSG organization
    row; any other string is stored as the WKT ``definition`` under
    ``srs_id`` (pass a custom id for non-EPSG systems). When omitted,
    a ``crs`` tag on the geom column metadata (as produced by the
    readers' auto-CRS tagging) is propagated the same way."""
    if crs is None:
        try:
            crs = (df.schema[geom_col].metadata or {}).get("crs")
        except KeyError:
            crs = None
    srs_name, srs_org, srs_code, srs_def = "WGS 84", "EPSG", 4326, 'GEOGCS["WGS 84"]'
    if crs:
        c = str(crs).strip()
        if c.upper().startswith("EPSG:"):
            srs_id = int(c.split(":")[1])
            srs_name = f"EPSG:{srs_id}"
            srs_org, srs_code, srs_def = "EPSG", srs_id, c
        else:
            srs_name = c.split('"')[1] if '"' in c else "custom"
            srs_org, srs_code, srs_def = "NONE", srs_id, c
    elif srs_id != 4326:
        srs_name, srs_org, srs_code, srs_def = (
            f"EPSG:{srs_id}", "EPSG", srs_id, f"EPSG:{srs_id}"
        )
    from ..geo import algorithms as A
    from ..geo import wkb as WKB

    names = df.columns
    if geom_col not in names:
        raise ValueError(f"geometry column {geom_col!r} not in {names}")
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"write_gpkg: {n} rows exceeds max_rows={max_rows}; a GeoPackage "
            "is a single driver-materialized SQLite file — write GeoParquet "
            "(plans.pruning.write_geo_parquet) for tables this size"
        )
    pdf = df.toPandas()
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        con.execute("PRAGMA user_version = 10300")  # spec 1.3
        con.execute(
            "CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,"
            " organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,"
            " definition TEXT NOT NULL, description TEXT)"
        )
        con.executemany(
            "INSERT INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,?)",
            [
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined", None),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined", None),
                (srs_name, srs_id, srs_org, srs_code, srs_def, None),
            ],
        )
        con.execute(
            "CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,"
            " identifier TEXT UNIQUE, description TEXT DEFAULT '', last_change DATETIME,"
            " min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL,"
            " geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL,"
            " m TINYINT NOT NULL, CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"
        )
        cols_sql = []
        for f in df.schema.fields:
            if f.name == geom_col:
                cols_sql.append(f'"{f.name}" GEOMETRY')
            elif f.name == "fid":
                # a df carrying its own fid (e.g. a read_gpkg round trip)
                # supplies the primary key instead of colliding with a
                # synthesized one
                cols_sql.append('"fid" INTEGER PRIMARY KEY')
            else:
                cols_sql.append(f'"{f.name}" {_SPARK_TO_SQLITE.get(f.dataType.typeName(), "TEXT")}')
        if "fid" in df.columns:
            con.execute(f'CREATE TABLE "{layer}" ({", ".join(cols_sql)})')
        else:
            con.execute(
                f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT,'
                f' {", ".join(cols_sql)})'
            )

        ext = [None, None, None, None]
        rows = []
        gidx = names.index(geom_col)
        for tup in pdf.itertuples(index=False):
            row = list(tup)
            b = row[gidx]
            if b is not None:
                b = bytes(b)
                bb = A.bounds(WKB.from_wkb(b))
                if bb is not None:
                    ext[0] = bb[0] if ext[0] is None else min(ext[0], bb[0])
                    ext[1] = bb[1] if ext[1] is None else min(ext[1], bb[1])
                    ext[2] = bb[2] if ext[2] is None else max(ext[2], bb[2])
                    ext[3] = bb[3] if ext[3] is None else max(ext[3], bb[3])
                row[gidx] = make_gp_header(b, srs_id, bb)
            rows.append([v.item() if hasattr(v, "item") else v for v in row])
        ph = ", ".join("?" for _ in names)
        collist = ", ".join(f'"{n}"' for n in names)
        con.executemany(f'INSERT INTO "{layer}" ({collist}) VALUES ({ph})', rows)
        con.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, last_change,"
            " min_x, min_y, max_x, max_y, srs_id)"
            " VALUES (?, 'features', ?, datetime('now'), ?, ?, ?, ?, ?)",
            (layer, layer, ext[0], ext[1], ext[2], ext[3], srs_id),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, ?, 'GEOMETRY', ?, 0, 0)",
            (layer, geom_col, srs_id),
        )
        con.commit()
    finally:
        con.close()
