"""Esri JSON (FeatureSet) source + sink.

GDAL ships an ESRIJSON driver for the ArcGIS REST API's FeatureSet
payload (the reference reaches it through ST_Read's GDAL dispatch,
``st_read.cpp:684-692``); the format is publicly documented in the
ArcGIS REST API reference:

  {"geometryType": "esriGeometryPolygon",
   "fields": [{"name": ..., "type": "esriFieldTypeInteger", ...}, ...],
   "features": [{"attributes": {...},
                 "geometry": {"rings": [[[x, y], ...], ...]}}, ...]}

Geometries: Point ``{x, y}``, Multipoint ``{points}``, Polyline
``{paths}``, Polygon ``{rings}`` where EXTERIOR rings wind clockwise and
holes counter-clockwise (the Esri convention, opposite of OGC). The
reader groups rings into polygons by orientation + containment exactly
like GDAL's OGRESRIJSON ring organizer; the writer re-emits that
winding. Files are driver-parsed like the other single-document
interchange readers (they are REST responses, memory-bounded by
construction)."""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geo import geom as G
from ..geo import wkb as WKB

_FIELD_TYPES = {
    "esriFieldTypeSmallInteger": T.IntegerType(),
    "esriFieldTypeInteger": T.LongType(),
    "esriFieldTypeOID": T.LongType(),
    "esriFieldTypeSingle": T.DoubleType(),
    "esriFieldTypeDouble": T.DoubleType(),
    "esriFieldTypeString": T.StringType(),
    "esriFieldTypeDate": T.LongType(),  # epoch millis per the REST spec
    "esriFieldTypeGUID": T.StringType(),
    "esriFieldTypeGlobalID": T.StringType(),
}


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _point_in_ring(pt, ring: np.ndarray) -> bool:
    # even-odd ray cast
    x, y = float(pt[0]), float(pt[1])
    inside = False
    n = len(ring)
    j = n - 1
    for i in range(n):
        xi, yi = ring[i, 0], ring[i, 1]
        xj, yj = ring[j, 0], ring[j, 1]
        if (yi > y) != (yj > y) and x < (xj - xi) * (y - yi) / (yj - yi) + xi:
            inside = not inside
        j = i
    return inside


def _rings_to_geometry(rings) -> G.Geometry:
    """Group Esri rings (cw = exterior, ccw = hole) into (Multi)Polygon."""
    arrs = [np.asarray(r, dtype=np.float64) for r in rings if len(r) >= 4]
    if not arrs:
        return G.empty(G.POLYGON)
    shells = [r for r in arrs if _ring_signed_area(r) <= 0]  # cw
    holes = [r for r in arrs if _ring_signed_area(r) > 0]
    if not shells:  # nonconformant producer: treat every ring as a shell
        shells, holes = arrs, []
    polys = [[s] for s in shells]
    for h in holes:
        placed = False
        for p in polys:
            if _point_in_ring(h[0], p[0]):
                p.append(h)
                placed = True
                break
        if not placed:
            polys.append([h])  # orphan hole: promote (GDAL does the same)
    gs = [G.Geometry(G.POLYGON, p) for p in polys]
    return gs[0] if len(gs) == 1 else G.Geometry(G.MULTIPOLYGON, gs)


def _feature_geometry(gt: str, g) -> G.Geometry | None:
    if g is None:
        return None
    if "x" in g:  # point (possibly NaN for null per the spec)
        x, y = g.get("x"), g.get("y")
        if x is None or (isinstance(x, str) and x.upper() == "NAN"):
            return G.empty(G.POINT)
        return G.point(float(x), float(y))
    if "points" in g:
        pts = [G.point(float(p[0]), float(p[1])) for p in g["points"]]
        return G.Geometry(G.MULTIPOINT, pts) if pts else G.empty(G.MULTIPOINT)
    if "paths" in g:
        lines = [
            G.linestring(np.asarray(p, dtype=np.float64))
            for p in g["paths"] if len(p) >= 2
        ]
        if not lines:
            return G.empty(G.MULTILINESTRING)
        return lines[0] if len(lines) == 1 else G.Geometry(G.MULTILINESTRING, lines)
    if "rings" in g:
        return _rings_to_geometry(g["rings"])
    return None


def read_esrijson(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for Esri JSON FeatureSets: one row per feature with typed
    attribute columns (from ``fields``) and WKB ``geom``."""
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    feats = doc.get("features", [])
    fields = doc.get("fields") or []
    if not fields and feats:
        # no field table: infer names from the first feature's attributes
        names = list((feats[0].get("attributes") or {}).keys())
        fields = [{"name": n, "type": "esriFieldTypeString"} for n in names]
    schema = T.StructType(
        [
            T.StructField(
                fd["name"], _FIELD_TYPES.get(fd.get("type"), T.StringType()), True
            )
            for fd in fields
        ]
        + [T.StructField("geom", T.BinaryType(), True)]
    )
    gt = doc.get("geometryType", "")
    rows = []
    for ft in feats:
        attrs = ft.get("attributes") or {}
        vals = []
        for fd in fields:
            v = attrs.get(fd["name"])
            dt = _FIELD_TYPES.get(fd.get("type"), T.StringType())
            if v is not None:
                if isinstance(dt, (T.IntegerType, T.LongType)):
                    v = int(v)
                elif isinstance(dt, T.DoubleType):
                    v = float(v)
                elif isinstance(dt, T.StringType):
                    v = str(v)
            vals.append(v)
        g = _feature_geometry(gt, ft.get("geometry"))
        vals.append(WKB.to_wkb(g) if g is not None else None)
        rows.append(tuple(vals))
    return spark.createDataFrame(rows, schema)


def _orient(ring: np.ndarray, clockwise: bool) -> np.ndarray:
    cw = _ring_signed_area(ring) <= 0
    return ring if cw == clockwise else ring[::-1]


def write_esrijson(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    max_rows: int = 1_000_000,
) -> None:
    """COPY TO (FORMAT GDAL, DRIVER ESRIJSON) analog: FeatureSet document
    with a typed ``fields`` table; exterior rings clockwise, holes
    counter-clockwise (Esri winding). Single-document writer with the
    standard driver-collect cap."""
    import os

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_esrijson: more than max_rows={max_rows} rows")
    props = [(f.name, f.dataType) for f in df.schema.fields if f.name != geom_col]
    gi = df.columns.index(geom_col)

    def ftype(dt):
        if isinstance(dt, (T.IntegerType, T.ShortType)):
            return "esriFieldTypeInteger"
        if isinstance(dt, T.LongType):
            return "esriFieldTypeInteger"
        if isinstance(dt, (T.DoubleType, T.FloatType, T.DecimalType)):
            return "esriFieldTypeDouble"
        return "esriFieldTypeString"

    gtype = None
    feats = []
    for r in rows:
        attrs = {}
        for name, dt in props:
            v = r[name]
            if v is not None and not isinstance(v, (int, float, str, bool)):
                v = str(v)
            attrs[name] = v
        geom_json = None
        if r[gi] is not None:
            g = WKB.from_wkb(r[gi])
            tag = g.tag
            if tag == G.POINT:
                geom_json = (
                    {"x": None, "y": None} if g.is_empty()
                    else {"x": float(g.data[0]), "y": float(g.data[1])}
                )
                gtype = gtype or "esriGeometryPoint"
            elif tag == G.MULTIPOINT:
                geom_json = {
                    "points": [[float(p.data[0]), float(p.data[1])] for p in g.data]
                }
                gtype = gtype or "esriGeometryMultipoint"
            elif tag in (G.LINESTRING, G.MULTILINESTRING):
                parts = [g.data] if tag == G.LINESTRING else [p.data for p in g.data]
                geom_json = {
                    "paths": [np.asarray(p)[:, :2].tolist() for p in parts]
                }
                gtype = gtype or "esriGeometryPolyline"
            elif tag in (G.POLYGON, G.MULTIPOLYGON):
                polys = [g.data] if tag == G.POLYGON else [p.data for p in g.data]
                rings = []
                for rs in polys:
                    for i, ring in enumerate(rs):
                        arr = np.asarray(ring)[:, :2]
                        rings.append(_orient(arr, clockwise=(i == 0)).tolist())
                geom_json = {"rings": rings}
                gtype = gtype or "esriGeometryPolygon"
            else:
                raise ValueError(
                    f"write_esrijson: unsupported geometry {g.type_name}"
                )
        feats.append({"attributes": attrs, "geometry": geom_json})
    doc = {
        "displayFieldName": "",
        "geometryType": gtype or "esriGeometryPoint",
        "spatialReference": {"wkid": 4326},
        "fields": [{"name": n, "type": ftype(dt), "alias": n} for n, dt in props],
        "features": feats,
    }
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(doc, f)
    os.replace(tmp, path)
