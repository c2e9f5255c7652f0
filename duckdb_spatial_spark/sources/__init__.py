"""Sources & sinks (ST_Read / COPY TO analogs)."""

from __future__ import annotations

import os
import re


def st_read(spark, path: str, format: str | None = None, **options):
    """Generic ST_Read: dispatch on format (or sniff the extension), return
    a DataFrame with a WKB ``geom``/``geometry`` column. The reference's
    ``ST_Read`` does the same via GDAL driver sniffing
    (``spatial/src/spatial/gdal/functions/st_read.cpp``)."""
    from .vfs import localize

    local = localize(path)
    if local is not None:
        if not local:
            raise FileNotFoundError(f"{path!r}: archive matched no files")
        path = local[0] if len(local) == 1 else local

    def _sniff(p: str):
        p = p.lower()
        for ext, f in (
            (".shp", "shapefile"), (".fgb", "flatgeobuf"), (".gpkg", "geopackage"),
            (".geojson", "geojson"), (".ndjson", "geojson"), (".json", "geojson"),
            (".osm.pbf", "osm"), (".pbf", "osm"), (".parquet", "geoparquet"),
            (".csv", "wkt_csv"), (".kml", "kml"), (".gpx", "gpx"), (".gml", "gml"),
            (".topojson", "topojson"), (".dxf", "dxf"), (".xlsx", "xlsx"),
            (".mif", "mapinfo"), (".gdb", "filegdb"), (".gdbtable", "filegdb"),
        ):
            if p.endswith(ext):
                return f
        return None

    fmt = (format or "").lower()
    if not fmt:
        cands = path if isinstance(path, list) else [path]
        for c in cands:
            fmt = _sniff(c)
            if fmt:
                break
        if not fmt:
            raise ValueError(f"cannot sniff format from {path!r}; pass format=")
    if isinstance(path, list):
        # multi-member archive: keep members of the dispatched format; the
        # per-format readers accept a single path, so recurse + union
        keep = [p for p in path if _sniff(p) == fmt]
        if not keep:
            raise ValueError(f"no archive member matches format {fmt!r}")
        if len(keep) > 1:
            from functools import reduce

            dfs = [st_read(spark, p, fmt, **options) for p in keep]
            return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
        path = keep[0]
    if fmt in ("shapefile", "shp"):
        return read_shapefile(spark, path, **options)
    if fmt in ("flatgeobuf", "fgb"):
        return read_flatgeobuf(spark, path, **options)
    if fmt in ("geopackage", "gpkg"):
        return read_gpkg(spark, path, **options)
    if fmt == "geojson":
        return read_geojson(spark, path, **options)
    if fmt == "osm":
        return read_osm(spark, path, **options)
    if fmt in ("geoparquet", "parquet"):
        return spark.read.parquet(path)
    if fmt in ("wkt_csv", "csv"):
        return read_wkt_csv(spark, path, **options)
    if fmt == "kml":
        return read_kml(spark, path, **options)
    if fmt == "gpx":
        return read_gpx(spark, path, **options)
    if fmt == "gml":
        return read_gml(spark, path, **options)
    if fmt == "topojson":
        return read_topojson(spark, path, **options)
    if fmt == "dxf":
        return read_dxf(spark, path, **options)
    if fmt == "xlsx":
        return read_xlsx(spark, path, **options)
    if fmt in ("mapinfo", "mif"):
        return read_mif(spark, path, **options)
    if fmt in ("filegdb", "gdb", "openfilegdb"):
        return read_gdb(spark, path, **options)
    raise ValueError(f"unsupported format {format!r}")


def register_geo_read(spark, path: str, format: str | None = None, name: str | None = None, **options) -> str:
    """``FROM ST_Read('...')`` call-site analog: PySpark cannot register
    Python table functions, so this loads the file with :func:`st_read` and
    registers the result as a temp view — ``spark.sql(f"SELECT * FROM
    {register_geo_read(spark, p)}")`` is the closest idiomatic spelling.
    Returns the view name (sanitized file stem by default)."""
    df = st_read(spark, path, format, **options)
    if name is None:
        stem = os.path.basename(path.rstrip("/")).split(".")[0] or "geo_read"
        name = "geo_" + re.sub(r"[^A-Za-z0-9_]", "_", stem)
    df.createOrReplaceTempView(name)
    return name


from .geojson import (  # noqa: F401
    read_geojson,
    read_wkt_csv,
    st_drivers,
    st_generatepoints,
    st_read_meta,
    write_geojson,
)
from .flatgeobuf import read_flatgeobuf  # noqa: F401
from .gpkg import gpkg_layers, read_gpkg, write_gpkg  # noqa: F401
from .osm import read_osm  # noqa: F401
from .shapefile import read_shapefile, write_shapefile  # noqa: F401
from .topojson import read_topojson  # noqa: F401
from .xmlgeo import read_gml, read_gpx, read_kml, write_kml  # noqa: F401
from .dxf import read_dxf, write_dxf  # noqa: F401
from .tabular import read_xlsx, write_xlsx, xlsx_sheets  # noqa: F401
from .mapinfo import read_mif, write_mif  # noqa: F401
from .filegdb import gdb_layers, read_gdb, write_gdb  # noqa: F401
