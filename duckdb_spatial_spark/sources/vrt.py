"""OGR VRT virtual-layer source (the reference reads VRT through GDAL's
OGR_VRT driver — listed in ``gdal/functions/st_drivers.cpp``; this is an
independent implementation of the PUBLIC OGR VRT schema subset,
gdal.org/drivers/vector/vrt.html).

Supported elements:

  <OGRVRTDataSource>
    <OGRVRTLayer name="layer_name">
      <SrcDataSource relativeToVRT="0|1">path</SrcDataSource>
      <SrcLayer>source layer</SrcLayer>                      (optional)
      <SrcSQL>SELECT ... FROM src_layer ...</SrcSQL>         (optional)
      <GeometryField encoding="PointFromColumns" x="x" y="y"/>
        | <GeometryField encoding="WKT" field="wkt"/>
        | <GeometryField encoding="WKB" field="blob"/>
        | <GeometryField field="col"/>        (Direct: rename to geom)
        | (absent -> the source's own geometry column passes through)
      <LayerSRS>EPSG:n | WKT</LayerSRS>                      (optional)
      <Field name="out" src="in"/>                           (optional)
    </OGRVRTLayer>
    <OGRVRTUnionLayer name="u">
      <OGRVRTLayer .../> ...                 (unionByName of members)
    </OGRVRTUnionLayer>
    <OGRVRTWarpedLayer name="w">
      <OGRVRTLayer .../>                     (single member)
      <SrcSRS>EPSG:n</SrcSRS>                (optional; default = member's
                                              crs tag, else error)
      <TargetSRS>EPSG:n</TargetSRS>          (reprojects geom, retags)
    </OGRVRTWarpedLayer>
  </OGRVRTDataSource>

``relativeToVRT`` defaults to "0" (path relative to the process CWD),
matching OGR; set relativeToVRT="1" to resolve against the .vrt's own
directory. <SrcSQL> runs through the Spark SQL engine: each table name
referenced in the statement is read from SrcDataSource as a layer of
that name (or the whole datasource for single-layer formats) and
registered as a temp view. Multiple top-level layer elements are a
multi-layer container: ``layer=`` selects by name (default: first).
<LayerSRS> lands in the geom column's ``crs`` metadata tag — the same
convention as the .prj / gpkg-srs / GeoParquet-footer paths, consumable
by st_transform_tagged.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LAYER_TAGS = ("OGRVRTLayer", "OGRVRTUnionLayer", "OGRVRTWarpedLayer")


def vrt_layers(path: str) -> list[str]:
    """Top-level layer names (plain and union) in document order."""
    root = ET.parse(path).getroot()
    _check_root(root)
    return [el.get("name") or f"layer{i}"
            for i, el in enumerate(_top_layers(root))]


def _check_root(root) -> None:
    if root.tag != "OGRVRTDataSource":
        raise ValueError(f"vrt: root element is {root.tag!r}, "
                         "expected OGRVRTDataSource")


def _top_layers(root) -> list:
    return [el for el in root if el.tag in _LAYER_TAGS]


def _vrt_resolve(src: str) -> str | None:
    """Format of a VRT source path: extension sniff for files, first
    recognizable member for directories (Spark-written csv/parquet dirs
    carry no extension of their own)."""
    from . import _resolve_format

    if os.path.isdir(src):
        return next(
            (f for f in (
                _resolve_format(os.path.join(src, n), None)
                for n in sorted(os.listdir(src))
            ) if f),
            None,
        )
    return _resolve_format(src, None)


_SQL_TABLES = re.compile(r"\b(?:from|join)\s+([A-Za-z_][\w$]*)",
                         re.IGNORECASE)


def _read_src_sql(spark: SparkSession, src: str, sql: str,
                  options: dict) -> DataFrame:
    """<SrcSQL>: register every table name referenced in the statement as
    a temp view over the source datasource (layer of that name when the
    format is multi-layer, the whole read otherwise) and run the SQL
    through the Spark SQL engine. GDAL evaluates SrcSQL with its own SQL
    dialect against the source; this is the Spark-first equivalent."""
    from . import st_read

    names = list(dict.fromkeys(_SQL_TABLES.findall(sql)))
    if not names:
        raise ValueError(f"vrt: SrcSQL has no FROM table: {sql!r}")

    def _raw_tabular(fmt):
        # SrcSQL often projects the raw attribute columns (GDAL runs it
        # over the bare OGR layer); a tabular source whose geometry the
        # reader cannot derive is still a valid SQL input
        if fmt in ("wkt_csv", "csv"):
            return (spark.read.option("header", True)
                    .option("inferSchema", True).csv(src))
        if fmt in ("geoparquet", "parquet"):
            return spark.read.parquet(src)
        return None

    # a user's pre-existing temp view with the same name must survive the
    # SrcSQL evaluation (r14 advisory): capture its plan before replacing,
    # restore it after — permanent tables are only shadowed for the
    # duration and need no restore beyond dropping our temp view
    def _existing_temp(name):
        try:
            t = spark.catalog.getTable(name)
        except Exception:  # noqa: BLE001 - not a resolvable table
            return None
        return spark.table(name) if t.isTemporary else None

    saved = {n: _existing_temp(n) for n in names}
    for name in names:
        try:
            member = st_read(spark, src, layer=name, **options)
        except (ValueError, TypeError, KeyError):
            try:
                member = st_read(spark, src, **options)
            except ValueError:
                member = _raw_tabular(options.get("format")
                                      or _vrt_resolve(src))
                if member is None:
                    raise
        member.createOrReplaceTempView(name)
    try:
        return spark.sql(sql)
    finally:
        for name in names:
            if saved.get(name) is not None:
                saved[name].createOrReplaceTempView(name)
            else:
                spark.catalog.dropTempView(name)


def read_vrt(spark: SparkSession, path: str, layer: str | None = None,
             **options) -> DataFrame:
    """ST_Read for .vrt: resolve the selected layer's source through
    st_read (format sniffed from the source path), then derive/rename the
    geometry column per GeometryField and apply Field projections.
    OGRVRTUnionLayer members are each read like a plain layer and
    combined with unionByName(allowMissingColumns=True)."""
    root = ET.parse(path).getroot()
    _check_root(root)
    layers = _top_layers(root)
    if not layers:
        raise ValueError(f"{path!r}: no OGRVRTLayer")
    if layer is None:
        el = layers[0]
    else:
        match = [l for l in layers if l.get("name") == layer]
        if not match:
            have = [l.get("name") for l in layers]
            raise ValueError(f"vrt layer {layer!r} not found (have {have})")
        el = match[0]
    return _read_layer(spark, el, path, dict(options))


def _read_layer(spark: SparkSession, el, vrt_path: str,
                options: dict) -> DataFrame:
    from . import st_read
    from ..functions import udfs

    if el.tag == "OGRVRTWarpedLayer":
        # GDAL's warped layer: reproject the single member to TargetSRS
        members = [m for m in el if m.tag in _LAYER_TAGS]
        if len(members) != 1:
            raise ValueError("vrt: OGRVRTWarpedLayer needs exactly one "
                             f"member layer (got {len(members)})")
        target = (el.findtext("TargetSRS") or "").strip()
        if not target:
            raise ValueError("vrt: OGRVRTWarpedLayer needs <TargetSRS>")
        df = _read_layer(spark, members[0], vrt_path, dict(options))
        gcol = next((c for c in ("geom", "geometry", "wkb_geometry")
                     if c in df.columns), None)
        if gcol is None:
            raise ValueError("vrt: OGRVRTWarpedLayer member has no "
                             f"geometry column (columns: {df.columns})")
        src_srs = (el.findtext("SrcSRS") or "").strip()
        from ..functions.crs import geom_crs, make_st_transform

        if not src_srs:
            src_srs = geom_crs(df, gcol)
        if not src_srs:
            raise ValueError("vrt: OGRVRTWarpedLayer member declares no "
                             "CRS — add <SrcSRS> (guessing one would be "
                             "data corruption)")
        tr = make_st_transform()
        df = df.withColumn(gcol, tr(F.col(gcol), F.lit(str(src_srs)),
                                    F.lit(target), F.lit(True)))
        return df.withMetadata(gcol, {"crs": target})

    if el.tag == "OGRVRTUnionLayer":
        members = [m for m in el if m.tag in _LAYER_TAGS]
        if not members:
            raise ValueError("vrt: OGRVRTUnionLayer has no member layers")
        dfs = [_read_layer(spark, m, vrt_path, dict(options))
               for m in members]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    src_el = el.find("SrcDataSource")
    if src_el is None or not (src_el.text or "").strip():
        raise ValueError(f"{vrt_path!r}: OGRVRTLayer has no SrcDataSource")
    src = (src_el.text or "").strip()
    # OGR default is relativeToVRT="0": a relative path resolves against
    # the process CWD, not the .vrt location (gdal.org/drivers/vector/vrt)
    relative = (src_el.get("relativeToVRT") or "0").strip()
    if not os.path.isabs(src):
        if relative == "1":
            src = os.path.join(os.path.dirname(os.path.abspath(vrt_path)), src)
        else:
            # absolutize against the Python CWD here: Spark would otherwise
            # resolve the relative path against the driver JVM's CWD
            src = os.path.abspath(src)
    src_layer = el.findtext("SrcLayer")
    if src_layer and src_layer.strip():
        options.setdefault("layer", src_layer.strip())
    src_sql = el.findtext("SrcSQL")

    if os.path.isdir(src) and "format" not in options:
        # a directory source (e.g. a Spark-written csv/parquet dir) has no
        # extension of its own: sniff from the first recognizable member
        fmt = _vrt_resolve(src)
        if fmt:
            options["format"] = fmt

    gf = el.find("GeometryField")
    enc = (gf.get("encoding") or "").lower() if gf is not None else None
    # missing encoding = GDAL's "Direct": the named source column IS the
    # geometry (a rename), or a pure pass-through when no field is named
    if enc is not None and enc not in ("", "direct", "pointfromcolumns",
                                       "wkt", "wkb"):
        raise ValueError(f"vrt: unsupported GeometryField encoding {enc!r}")
    fmt_resolved = options.get("format") or _vrt_resolve(src)
    sql_mode = bool(src_sql and src_sql.strip())
    if enc == "pointfromcolumns" and not sql_mode:
        # tabular sources build the point themselves (keeps the CSV
        # reader from deriving its own geometry first)
        options.setdefault("x_col", gf.get("x"))
        options.setdefault("y_col", gf.get("y"))
    elif enc == "wkt" and fmt_resolved in ("wkt_csv", "csv") and not sql_mode:
        # the CSV reader consumes a named WKT column natively
        options.setdefault("wkt_col", gf.get("field"))

    if sql_mode:
        df = _read_src_sql(spark, src, src_sql.strip(), options)
        # GeometryField applies to the SQL result, not the raw source
        if enc == "pointfromcolumns":
            xc, yc = gf.get("x"), gf.get("y")
            if not xc or not yc or xc not in df.columns or yc not in df.columns:
                raise ValueError(f"vrt: PointFromColumns x={xc!r} y={yc!r} "
                                 f"not in SrcSQL columns {df.columns}")
            df = (df.withColumn("geom", udfs.st_point(
                      F.col(xc).cast("double"), F.col(yc).cast("double")))
                    .drop(xc, yc))
            enc = None
        elif enc == "wkt":
            fmt_resolved = None  # convert the SQL result's WKT column below
    else:
        df = st_read(spark, src, **options)

    if enc == "wkt" and fmt_resolved not in ("wkt_csv", "csv"):
        field = gf.get("field")
        if not field or field not in df.columns:
            raise ValueError(f"vrt: WKT GeometryField field={field!r} "
                             f"not in source columns {df.columns}")
        df = df.withColumn("geom", udfs.st_geomfromtext(F.col(field))).drop(field)
    elif enc in ("wkb", "", "direct"):
        field = gf.get("field")
        if enc == "wkb" and (not field or field not in df.columns):
            raise ValueError(f"vrt: WKB GeometryField field={field!r} "
                             f"not in source columns {df.columns}")
        if field and field in df.columns and field != "geom":
            df = df.withColumnRenamed(field, "geom")

    fields = el.findall("Field")
    if fields:
        gcol = next((c for c in ("geom", "geometry", "wkb_geometry")
                     if c in df.columns), None)
        # OGR Field type names -> Spark cast targets (gdal.org VRT
        # <Field type=>; omitted = pass the source type through)
        type_map = {"integer": "int", "integer64": "bigint",
                    "real": "double", "string": "string", "date": "date",
                    "datetime": "timestamp"}
        cols = []
        for f_el in fields:
            name = f_el.get("name")
            src_col = f_el.get("src") or name
            if src_col not in df.columns:
                raise ValueError(f"vrt: Field src={src_col!r} not in source "
                                 f"columns {df.columns}")
            c = F.col(src_col)
            ftype = (f_el.get("type") or "").lower()
            if ftype:
                if ftype not in type_map:
                    raise ValueError(f"vrt: unsupported Field type {ftype!r} "
                                     f"(supported: {sorted(type_map)})")
                c = c.cast(type_map[ftype])
            cols.append(c.alias(name))
        if gcol:
            cols.append(F.col(gcol))
        df = df.select(*cols)

    srs = el.findtext("LayerSRS")
    if srs and srs.strip():
        gcol = next((c for c in ("geom", "geometry", "wkb_geometry")
                     if c in df.columns), None)
        if gcol:
            df = df.withMetadata(gcol, {"crs": srs.strip()})
    return df
