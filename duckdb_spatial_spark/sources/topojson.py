"""TopoJSON reader (public spec: github.com/topojson/topojson-specification).

A Topology stores shared arcs once — delta-encoded and quantized when a
``transform`` is present — and geometries reference arcs by index, with
``~i`` (one's complement) meaning arc ``i`` reversed. ST_Read support for
it mirrors the reference's GDAL TopoJSON driver; decoding is pure json +
arithmetic.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.udfs import _from_geojson
from ..geo import wkb as WKB


def _decode_arcs(topo: dict) -> list:
    tr = topo.get("transform")
    out = []
    for arc in topo["arcs"]:
        pts = []
        if tr:
            sx, sy = tr["scale"]
            tx, ty = tr["translate"]
            x = y = 0
            for dx, dy in arc:
                x += dx
                y += dy
                pts.append([x * sx + tx, y * sy + ty])
        else:
            pts = [[float(p[0]), float(p[1])] for p in arc]
        out.append(pts)
    return out


def _line_from_arcs(arc_idxs, arcs) -> list:
    coords: list = []
    for ai in arc_idxs:
        seg = arcs[~ai][::-1] if ai < 0 else arcs[ai]
        # consecutive arcs share their junction vertex
        coords.extend(seg if not coords else seg[1:])
    return coords


def _geom_from_topo(obj: dict, topo: dict, arcs) -> dict | None:
    t = obj.get("type")
    if t is None:
        return None
    tr = topo.get("transform")

    def pt(c):
        if tr:
            sx, sy = tr["scale"]
            tx, ty = tr["translate"]
            return [c[0] * sx + tx, c[1] * sy + ty]
        return [float(c[0]), float(c[1])]

    if t == "Point":
        return {"type": "Point", "coordinates": pt(obj["coordinates"])}
    if t == "MultiPoint":
        return {"type": "MultiPoint", "coordinates": [pt(c) for c in obj["coordinates"]]}
    if t == "LineString":
        return {"type": "LineString", "coordinates": _line_from_arcs(obj["arcs"], arcs)}
    if t == "MultiLineString":
        return {
            "type": "MultiLineString",
            "coordinates": [_line_from_arcs(a, arcs) for a in obj["arcs"]],
        }
    if t == "Polygon":
        return {
            "type": "Polygon",
            "coordinates": [_line_from_arcs(r, arcs) for r in obj["arcs"]],
        }
    if t == "MultiPolygon":
        return {
            "type": "MultiPolygon",
            "coordinates": [[_line_from_arcs(r, arcs) for r in poly] for poly in obj["arcs"]],
        }
    if t == "GeometryCollection":
        parts = [_geom_from_topo(g, topo, arcs) for g in obj.get("geometries", [])]
        return {"type": "GeometryCollection", "geometries": [p for p in parts if p]}
    return None


def _iter_topo_features(topo: dict, layer: str | None):
    arcs = _decode_arcs(topo)
    objects = topo.get("objects", {})
    names = [layer] if layer else list(objects)
    for name in names:
        obj = objects.get(name)
        if obj is None:
            raise ValueError(f"TopoJSON object {name!r} not found (have {sorted(objects)})")
        members = obj.get("geometries", [obj]) if obj.get("type") == "GeometryCollection" else [obj]
        for m in members:
            props = dict(m.get("properties") or {})
            if "id" in m and "id" not in props:
                props["id"] = m["id"]
            yield name, props, _geom_from_topo(m, topo, arcs)


def read_topojson(
    spark: SparkSession, path: str, layer: str | None = None, columns: list | None = None
) -> DataFrame:
    """ST_Read for TopoJSON: each geometry of the selected object (all
    objects when ``layer`` is None) becomes one row; properties surface as
    string columns, geometry as WKB ``geom``. Arc reconstruction happens
    once per file at bind time (topologies are driver-sized; the big-data
    path is parquet)."""
    from .vfs import localize
    from .xmlgeo import _make_df

    v = localize(path, (".topojson", ".json"))
    files = v if v is not None else None
    if files is None:
        import glob as _glob
        import os as _os

        if _os.path.isdir(path):
            files = sorted(
                _glob.glob(_os.path.join(path, "*.topojson"))
                + _glob.glob(_os.path.join(path, "*.json"))
            )
        else:
            files = sorted(_glob.glob(path)) or [path]

    names: list[str] = ["layer"]
    for fp in files:
        with open(fp, encoding="utf-8") as f:
            topo = json.load(f)
        if topo.get("type") != "Topology":
            raise ValueError(f"{fp}: not a TopoJSON Topology")
        for _, props, _g in _iter_topo_features(topo, layer):
            for k in props:
                if k not in names:
                    names.append(k)
    if columns is not None:
        keep = set(columns) | {"layer"}
        names = [n for n in names if n in keep]
    schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
        + [T.StructField("geom", T.BinaryType())]
    )

    def iter_rows(fp):
        with open(fp, encoding="utf-8") as f:
            topo = json.load(f)
        for lname, props, gj in _iter_topo_features(topo, layer):
            row = tuple(
                lname if n == "layer" else (None if props.get(n) is None else str(props[n]))
                for n in names
            )
            yield row + (WKB.to_wkb(_from_geojson(gj)) if gj else None,)

    return _make_df(spark, files, schema, iter_rows, "topojson")
