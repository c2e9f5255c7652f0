"""DXF (AutoCAD ASCII drawing exchange) reader — ST_Read's GDAL DXF
driver analog (``st_read.cpp`` dispatches it via GDAL; the wire format is
public: group-code/value line pairs).

Supported entities (the same core set GDAL's DXF reader surfaces as
features): POINT, LINE, LWPOLYLINE (closed flag -> polygon), classic
POLYLINE/VERTEX/SEQEND, CIRCLE and ARC (tessellated like GDAL does),
TEXT/MTEXT (point + text attribute). Each entity becomes a row with its
``layer``, ``entity`` type, optional ``text``, and WKB ``geom``.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geo import geom as G
from ..geo import wkb as WKB
from .xmlgeo import _expand, _make_df

_ARC_SEGS = 64


def _pairs(fp: str):
    """Yield (group_code, value) pairs from a DXF file."""
    with open(fp, "r", encoding="utf-8", errors="replace") as f:
        while True:
            code = f.readline()
            if not code:
                return
            val = f.readline()
            if not val:
                return
            try:
                yield int(code.strip()), val.rstrip("\r\n").strip()
            except ValueError:
                continue


def _arc_points(cx, cy, r, a0_deg, a1_deg):
    a0, a1 = math.radians(a0_deg), math.radians(a1_deg)
    if a1 <= a0:
        a1 += 2 * math.pi
    ts = np.linspace(a0, a1, _ARC_SEGS + 1)
    return np.column_stack([cx + r * np.cos(ts), cy + r * np.sin(ts)])


def _entities(fp: str):
    """Yield (entity_type, layer, text, Geometry) from the ENTITIES section."""
    it = _pairs(fp)
    in_entities = False
    cur = None  # dict of collected codes for the current entity
    pending_poly = None  # classic POLYLINE accumulator

    def flush(ent):
        if ent is None:
            return None
        typ = ent["_type"]
        layer = ent.get(8, "0")
        if typ == "POINT" and 10 in ent:
            return (typ, layer, None, G.point(float(ent[10]), float(ent[20])))
        if typ == "LINE" and 10 in ent and 11 in ent:
            arr = np.array(
                [[float(ent[10]), float(ent[20])], [float(ent[11]), float(ent[21])]]
            )
            return (typ, layer, None, G.Geometry(G.LINESTRING, arr))
        if typ == "LWPOLYLINE" and ent.get("_xs"):
            arr = np.column_stack([ent["_xs"], ent["_ys"]])
            closed = int(ent.get(70, 0)) & 1
            if closed and len(arr) >= 3:
                ring = np.vstack([arr, arr[:1]])
                return (typ, layer, None, G.Geometry(G.POLYGON, [ring]))
            return (typ, layer, None, G.Geometry(G.LINESTRING, arr))
        if typ == "CIRCLE" and 10 in ent and 40 in ent:
            ring = _arc_points(float(ent[10]), float(ent[20]), float(ent[40]), 0, 360)
            return (typ, layer, None, G.Geometry(G.POLYGON, [ring]))
        if typ == "ARC" and 10 in ent and 40 in ent:
            pts = _arc_points(
                float(ent[10]), float(ent[20]), float(ent[40]),
                float(ent.get(50, 0.0)), float(ent.get(51, 360.0)),
            )
            return (typ, layer, None, G.Geometry(G.LINESTRING, pts))
        if typ in ("TEXT", "MTEXT") and 10 in ent:
            return (typ, layer, ent.get(1), G.point(float(ent[10]), float(ent[20])))
        return None

    for code, val in it:
        if code == 0:
            if val == "SECTION":
                cur = {"_type": "_SECTION"}
                continue
            if val == "ENDSEC":
                if in_entities and cur is not None and cur is not pending_poly \
                        and cur.get("_type") not in ("_SECTION", "VERTEX"):
                    row = flush(cur)
                    if row:
                        yield row
                in_entities = False
                cur = None
                pending_poly = None
                continue
            if not in_entities and cur is not None and cur.get("_type") == "_SECTION":
                cur = None
            if in_entities:
                # close out whatever entity was being collected
                if cur is not None and cur.get("_type") == "VERTEX":
                    if pending_poly is not None and 10 in cur:
                        pending_poly["_xs"].append(float(cur[10]))
                        pending_poly["_ys"].append(float(cur[20]))
                elif cur is not None and cur is not pending_poly:
                    row = flush(cur)
                    if row:
                        yield row
                # open the next one
                if val == "VERTEX" and pending_poly is not None:
                    cur = {"_type": "VERTEX"}
                elif val == "SEQEND" and pending_poly is not None:
                    arr = np.column_stack([pending_poly["_xs"], pending_poly["_ys"]])
                    layer = pending_poly.get(8, "0")
                    if len(arr) >= 2:
                        if int(pending_poly.get(70, 0)) & 1 and len(arr) >= 3:
                            ring = np.vstack([arr, arr[:1]])
                            yield ("POLYLINE", layer, None, G.Geometry(G.POLYGON, [ring]))
                        else:
                            yield ("POLYLINE", layer, None, G.Geometry(G.LINESTRING, arr))
                    pending_poly = None
                    cur = None
                elif val == "POLYLINE":
                    pending_poly = {"_type": "POLYLINE", "_xs": [], "_ys": []}
                    cur = pending_poly
                else:
                    cur = {"_type": val, "_xs": [], "_ys": []}
            continue
        if cur is not None and cur.get("_type") == "_SECTION" and code == 2:
            in_entities = val == "ENTITIES"
            cur = None
            continue
        if cur is not None:
            if code == 10 and cur["_type"] == "LWPOLYLINE":
                cur["_xs"].append(float(val))
            elif code == 20 and cur["_type"] == "LWPOLYLINE":
                cur["_ys"].append(float(val))
            elif code not in cur:  # first occurrence wins (per-entity scalars)
                cur[code] = val
    if cur is not None and cur.get("_type") not in (None, "_SECTION", "POLYLINE", "VERTEX"):
        row = flush(cur)
        if row:
            yield row


def _dxf_entity(g, layer: str, out: list):
    if g is None or g.is_empty():
        return
    if g.tag == G.POINT:
        out.append(f"0\nPOINT\n8\n{layer}\n10\n{g.data[0]!r}\n20\n{g.data[1]!r}\n")
    elif g.tag == G.LINESTRING:
        out.append(f"0\nLWPOLYLINE\n8\n{layer}\n70\n0\n90\n{len(g.data)}\n")
        for p in g.data:
            out.append(f"10\n{p[0]!r}\n20\n{p[1]!r}\n")
    elif g.tag == G.POLYGON:
        # DXF has no ring structure: each ring becomes its own closed
        # LWPOLYLINE on the feature's layer (GDAL's DXF writer does the
        # same for polygons without HATCH support)
        for ring in g.data:
            pts = ring[:-1] if len(ring) > 1 else ring
            out.append(f"0\nLWPOLYLINE\n8\n{layer}\n70\n1\n90\n{len(pts)}\n")
            for p in pts:
                out.append(f"10\n{p[0]!r}\n20\n{p[1]!r}\n")
    else:
        for part in g.flatten():
            _dxf_entity(part, layer, out)


def write_dxf(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    layer_col: str | None = None,
    max_rows: int = 2_000_000,
) -> None:
    """COPY TO ... (FORMAT GDAL, DRIVER 'DXF') analog: writes the ENTITIES
    section (POINT / open + closed LWPOLYLINE). DXF carries no attribute
    table — only the layer name survives (``layer_col``, default layer 0).
    Serial single-file interchange writer with the standard ``max_rows``
    guard (use write_geo_parquet for large tables)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_dxf: result exceeds max_rows={max_rows}; DXF is a serial "
            "single-file interchange format — use write_geo_parquet for large tables"
        )
    gi = df.columns.index(geom_col)
    li = df.columns.index(layer_col) if layer_col else None
    out = ["0\nSECTION\n2\nENTITIES\n"]
    for r in rows:
        if r[gi] is None:
            continue
        layer = str(r[li]) if li is not None and r[li] is not None else "0"
        _dxf_entity(WKB.from_wkb(r[gi]), layer, out)
    out.append("0\nENDSEC\n0\nEOF\n")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(out))


def read_dxf(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for .dxf: every drawing entity becomes a row
    (layer, entity, text, WKB geom) — the feature model GDAL's DXF
    driver exposes."""
    files = _expand(path, (".dxf",))
    schema = T.StructType(
        [
            T.StructField("layer", T.StringType()),
            T.StructField("entity", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("geom", T.BinaryType()),
        ]
    )

    def iter_rows(fp):
        for typ, layer, text, g in _entities(fp):
            yield (layer, typ, text, WKB.to_wkb(g))

    return _make_df(spark, files, schema, iter_rows, "dxf")
