"""OGR VRT virtual-layer source (the reference reads VRT through GDAL's
OGR_VRT driver — listed in ``gdal/functions/st_drivers.cpp``; this is an
independent implementation of the PUBLIC OGR VRT schema subset,
gdal.org/drivers/vector/vrt.html).

Supported elements:

  <OGRVRTDataSource>
    <OGRVRTLayer name="layer_name">
      <SrcDataSource>path (relative to the .vrt)</SrcDataSource>
      <SrcLayer>source layer</SrcLayer>                      (optional)
      <GeometryField encoding="PointFromColumns" x="x" y="y"/>
        | <GeometryField encoding="WKT" field="wkt"/>
        | <GeometryField encoding="WKB" field="blob"/>
        | (absent -> the source's own geometry column passes through)
      <LayerSRS>EPSG:n | WKT</LayerSRS>                      (optional)
      <Field name="out" src="in"/>                           (optional)
    </OGRVRTLayer>
  </OGRVRTDataSource>

Multiple <OGRVRTLayer> elements are a multi-layer container: ``layer=``
selects by name (default: first). <LayerSRS> lands in the geom column's
``crs`` metadata tag — the same convention as the .prj / gpkg-srs /
GeoParquet-footer paths, consumable by st_transform_tagged.
<OGRVRTUnionLayer> and SQL-backed layers are not supported and raise.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def vrt_layers(path: str) -> list[str]:
    """Layer names in document order."""
    root = ET.parse(path).getroot()
    _check_root(root)
    return [el.get("name") or f"layer{i}"
            for i, el in enumerate(root.findall("OGRVRTLayer"))]


def _check_root(root) -> None:
    if root.tag != "OGRVRTDataSource":
        raise ValueError(f"vrt: root element is {root.tag!r}, "
                         "expected OGRVRTDataSource")
    for el in root:
        if el.tag == "OGRVRTUnionLayer":
            raise ValueError("vrt: OGRVRTUnionLayer is not supported")


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


def read_vrt(spark: SparkSession, path: str, layer: str | None = None,
             **options) -> DataFrame:
    """ST_Read for .vrt: resolve the selected OGRVRTLayer's source through
    st_read (format sniffed from the source path), then derive/rename the
    geometry column per GeometryField and apply Field projections."""
    from . import st_read
    from ..functions import udfs

    root = ET.parse(path).getroot()
    _check_root(root)
    layers = root.findall("OGRVRTLayer")
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

    src_el = el.find("SrcDataSource")
    if src_el is None or not (src_el.text or "").strip():
        raise ValueError(f"{path!r}: OGRVRTLayer has no SrcDataSource")
    src = (src_el.text or "").strip()
    relative = (src_el.get("relativeToVRT") or "1").strip()
    if not os.path.isabs(src) and relative != "0":
        src = os.path.join(os.path.dirname(os.path.abspath(path)), src)
    src_layer = el.findtext("SrcLayer")
    if src_layer and src_layer.strip():
        options.setdefault("layer", src_layer.strip())

    if os.path.isdir(src) and "format" not in options:
        # a directory source (e.g. a Spark-written csv/parquet dir) has no
        # extension of its own: sniff from the first recognizable member
        fmt = _vrt_resolve(src)
        if fmt:
            options["format"] = fmt

    gf = el.find("GeometryField")
    enc = (gf.get("encoding") or "").lower() if gf is not None else None
    if enc is not None and enc not in ("pointfromcolumns", "wkt", "wkb"):
        raise ValueError(f"vrt: unsupported GeometryField encoding {enc!r}")
    fmt_resolved = options.get("format") or _vrt_resolve(src)
    if enc == "pointfromcolumns":
        # tabular sources build the point themselves (keeps the CSV
        # reader from deriving its own geometry first)
        options.setdefault("x_col", gf.get("x"))
        options.setdefault("y_col", gf.get("y"))
    elif enc == "wkt" and fmt_resolved in ("wkt_csv", "csv"):
        # the CSV reader consumes a named WKT column natively
        options.setdefault("wkt_col", gf.get("field"))
    df = st_read(spark, src, **options)

    if enc == "wkt" and fmt_resolved not in ("wkt_csv", "csv"):
        field = gf.get("field")
        if not field or field not in df.columns:
            raise ValueError(f"vrt: WKT GeometryField field={field!r} "
                             f"not in source columns {df.columns}")
        df = df.withColumn("geom", udfs.st_geomfromtext(F.col(field))).drop(field)
    elif enc == "wkb":
        field = gf.get("field")
        if not field or field not in df.columns:
            raise ValueError(f"vrt: WKB GeometryField field={field!r} "
                             f"not in source columns {df.columns}")
        if field != "geom":
            df = df.withColumnRenamed(field, "geom")

    fields = el.findall("Field")
    if fields:
        gcol = next((c for c in ("geom", "geometry", "wkb_geometry")
                     if c in df.columns), None)
        cols = []
        for f_el in fields:
            name = f_el.get("name")
            src_col = f_el.get("src") or name
            if src_col not in df.columns:
                raise ValueError(f"vrt: Field src={src_col!r} not in source "
                                 f"columns {df.columns}")
            cols.append(F.col(src_col).alias(name))
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
