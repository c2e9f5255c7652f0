"""KML / GPX / GML sources + KML sink (pure stdlib ``xml.etree``).

The reference reads these through GDAL drivers (KML/LIBKML, GPX, GML) behind
``ST_Read`` (``spatial/src/spatial/gdal/functions/st_read.cpp``); GDAL is not
in this container, so the public encodings — OGC KML 2.2, Topografix GPX 1.1,
OGC GML 2/3.2 — are parsed directly here. Same distribution model as the
GeoJSON source: one input partition per file via the Spark 4 Python
DataSource API, geometry emitted as WKB in a ``geom`` column.

Axis order: coordinates are kept exactly as written in the file (KML/GPX are
lon,lat by spec; GML is emitted x,y as written — GDAL's default for
simple-feature GML). srsDimension=3 posLists keep Z.
"""

from __future__ import annotations

import glob as _glob
import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.udfs import _from_geojson, _to_geojson
from ..geo import wkb as WKB


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _expand(path: str, exts: tuple[str, ...]):
    from .vfs import localize

    v = localize(path, exts)
    if v is not None:
        return v
    if os.path.isdir(path):
        files = sorted(
            f for e in exts for f in _glob.glob(os.path.join(path, "*" + e))
        )
    else:
        files = sorted(_glob.glob(path)) or [path]
    return files


def _make_df(spark: SparkSession, files, schema: T.StructType, iter_rows, source_name: str) -> DataFrame:
    """One partition per file (the reference parallelizes GDAL reads the same
    way, st_read.cpp InitGlobal); falls back to driver-side parse on PySpark
    builds without the Python DataSource API.

    The registered name is uniquified per call: Spark resolves Python
    data sources BY NAME, so re-registering a fixed name with fresh
    closure state (new files/schema) can hand the new read the STALE
    reader — two different files of the same format in one session then
    return mismatched schemas (the flatgeobuf source hit this first)."""
    import uuid as _uuid

    source_name = f"{source_name}_{_uuid.uuid4().hex[:12]}"
    try:
        from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

        class _Reader(DataSourceReader):
            def partitions(self):
                return [InputPartition(f) for f in files]

            def read(self, partition):
                yield from iter_rows(partition.value)

        class _Src(DataSource):
            @classmethod
            def name(cls):
                return source_name

            def schema(self):
                return schema

            def reader(self, schema):
                return _Reader()

        spark.dataSource.register(_Src)
        return spark.read.format(source_name).schema(schema).load(files[0])
    except ImportError:
        return spark.createDataFrame([tuple(r) for f in files for r in iter_rows(f)], schema)


# --------------------------------------------------------------------------
# KML (OGC KML 2.2 / Google earth 2.x namespaces)
# --------------------------------------------------------------------------

def _kml_coords(text: str):
    """'lon,lat[,alt] lon,lat[,alt] ...' -> [[x, y(, z)], ...]"""
    out = []
    for tok in (text or "").split():
        parts = tok.split(",")
        if len(parts) >= 2:
            out.append([float(v) for v in parts[:3]])
    return out


def _kml_geom(el):
    """KML geometry element -> GeoJSON-style dict (or None)."""
    t = _local(el.tag)
    if t == "Point":
        for c in el:
            if _local(c.tag) == "coordinates":
                pts = _kml_coords(c.text)
                return {"type": "Point", "coordinates": pts[0]} if pts else None
        return None
    if t in ("LineString", "LinearRing"):
        for c in el:
            if _local(c.tag) == "coordinates":
                return {"type": "LineString", "coordinates": _kml_coords(c.text)}
        return None
    if t == "Polygon":
        rings = []
        for b in el:
            bt = _local(b.tag)
            if bt in ("outerBoundaryIs", "innerBoundaryIs"):
                for lr in b.iter():
                    if _local(lr.tag) == "coordinates":
                        ring = _kml_coords(lr.text)
                        (rings.insert(0, ring) if bt == "outerBoundaryIs" else rings.append(ring))
                        break
        return {"type": "Polygon", "coordinates": rings} if rings else None
    if t == "MultiGeometry":
        parts = [g for g in (_kml_geom(c) for c in el) if g is not None]
        if not parts:
            return None
        kinds = {g["type"] for g in parts}
        if kinds <= {"Point"}:
            return {"type": "MultiPoint", "coordinates": [g["coordinates"] for g in parts]}
        if kinds <= {"LineString"}:
            return {"type": "MultiLineString", "coordinates": [g["coordinates"] for g in parts]}
        if kinds <= {"Polygon"}:
            return {"type": "MultiPolygon", "coordinates": [g["coordinates"] for g in parts]}
        return {"type": "GeometryCollection", "geometries": parts}
    return None


_KML_GEOM_TAGS = {"Point", "LineString", "LinearRing", "Polygon", "MultiGeometry"}


def _kml_placemarks(fp: str):
    for _, el in ET.iterparse(fp):
        if _local(el.tag) != "Placemark":
            continue
        props: dict = {}
        geom = None
        for c in el:
            t = _local(c.tag)
            if t in ("name", "description", "address", "phoneNumber"):
                props[t] = (c.text or "").strip() or None
            elif t == "ExtendedData":
                for d in c.iter():
                    dt = _local(d.tag)
                    if dt == "Data":
                        for v in d:
                            if _local(v.tag) == "value":
                                props[d.get("name", "data")] = (v.text or "").strip() or None
                    elif dt == "SimpleData":
                        props[d.get("name", "data")] = (d.text or "").strip() or None
            elif t in _KML_GEOM_TAGS:
                geom = _kml_geom(c)
        yield props, geom
        el.clear()


def read_kml(spark: SparkSession, path: str, columns: list | None = None) -> DataFrame:
    """ST_Read for KML: every ``<Placemark>`` (any Folder depth) becomes a
    row; ``name``/``description`` + ExtendedData/SchemaData entries become
    string columns, the placemark geometry becomes WKB ``geom``."""
    files = _expand(path, (".kml",))
    names: list[str] = []
    for f in files:
        for props, _ in _kml_placemarks(f):
            for k in props:
                if k not in names:
                    names.append(k)
    if columns is not None:
        names = [n for n in names if n in set(columns)]
    schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
        + [T.StructField("geom", T.BinaryType())]
    )

    def iter_rows(fp):
        for props, geom in _kml_placemarks(fp):
            yield tuple(props.get(n) for n in names) + (
                WKB.to_wkb(_from_geojson(geom)) if geom else None,
            )

    return _make_df(spark, files, schema, iter_rows, "kml")


def write_kml(df: DataFrame, path: str, geom_col: str = "geom", name_col: str | None = None, max_rows: int = 1_000_000) -> None:
    """COPY TO (FORMAT GDAL, DRIVER KML) analog. KML is a single-document
    format, so like the shapefile writer this collects to the driver —
    capped at ``max_rows`` (raise for bigger exports at your own peril)."""
    import json as _json

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_kml: more than max_rows={max_rows} rows; raise the cap explicitly")
    props = [c for c in df.columns if c != geom_col]

    def esc(s):
        return (str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))

    def coords(c):
        return " ".join(",".join(repr(float(v)) for v in pt) for pt in c)

    def geom_xml(gj) -> str:
        t = gj["type"]
        if t == "Point":
            return f"<Point><coordinates>{coords([gj['coordinates']])}</coordinates></Point>"
        if t == "LineString":
            return f"<LineString><coordinates>{coords(gj['coordinates'])}</coordinates></LineString>"
        if t == "Polygon":
            out = "<Polygon>"
            for i, ring in enumerate(gj["coordinates"]):
                b = "outerBoundaryIs" if i == 0 else "innerBoundaryIs"
                out += f"<{b}><LinearRing><coordinates>{coords(ring)}</coordinates></LinearRing></{b}>"
            return out + "</Polygon>"
        if t == "MultiPoint":
            inner = "".join(geom_xml({"type": "Point", "coordinates": c}) for c in gj["coordinates"])
        elif t == "MultiLineString":
            inner = "".join(geom_xml({"type": "LineString", "coordinates": c}) for c in gj["coordinates"])
        elif t == "MultiPolygon":
            inner = "".join(geom_xml({"type": "Polygon", "coordinates": c}) for c in gj["coordinates"])
        else:  # GeometryCollection
            inner = "".join(geom_xml(g) for g in gj["geometries"])
        return f"<MultiGeometry>{inner}</MultiGeometry>"

    parts = ['<?xml version="1.0" encoding="UTF-8"?>',
             '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>']
    for r in rows:
        d = r.asDict()
        parts.append("<Placemark>")
        if name_col and d.get(name_col) is not None:
            parts.append(f"<name>{esc(d[name_col])}</name>")
        ext = [
            f'<Data name="{esc(c)}"><value>{esc(d[c])}</value></Data>'
            for c in props
            if c != name_col and d.get(c) is not None
        ]
        if ext:
            parts.append("<ExtendedData>" + "".join(ext) + "</ExtendedData>")
        wkb = d.get(geom_col)
        if wkb is not None:
            parts.append(geom_xml(_json.loads(_to_geojson(WKB.from_wkb(bytes(wkb))))))
        parts.append("</Placemark>")
    parts.append("</Document></kml>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(parts))


# --------------------------------------------------------------------------
# GPX (Topografix GPX 1.0/1.1)
# --------------------------------------------------------------------------

_GPX_PT_FIELDS = ("ele", "time", "name", "sym", "type")


def _gpx_pt(el):
    lat, lon = float(el.get("lat")), float(el.get("lon"))
    vals = {}
    for c in el:
        t = _local(c.tag)
        if t in _GPX_PT_FIELDS:
            vals[t] = (c.text or "").strip() or None
    z = vals.get("ele")
    coord = [lon, lat] if z is None else [lon, lat, float(z)]
    return coord, vals


def read_gpx(spark: SparkSession, path: str, layer: str = "waypoints") -> DataFrame:
    """ST_Read for GPX. ``layer`` mirrors the GDAL GPX driver's layer set:
    ``waypoints`` (wpt -> Point), ``routes`` (rte -> LineString), ``tracks``
    (trk -> MultiLineString, one part per trkseg), ``route_points`` /
    ``track_points`` (individual rtept/trkpt -> Point with parent ids)."""
    files = _expand(path, (".gpx",))
    S, D, I = T.StringType(), T.DoubleType(), T.IntegerType()
    if layer == "waypoints":
        schema = T.StructType([
            T.StructField("name", S), T.StructField("ele", D), T.StructField("time", S),
            T.StructField("sym", S), T.StructField("geom", T.BinaryType()),
        ])

        def iter_rows(fp):
            for _, el in ET.iterparse(fp):
                if _local(el.tag) == "wpt":
                    coord, v = _gpx_pt(el)
                    yield (v.get("name"), float(v["ele"]) if v.get("ele") else None,
                           v.get("time"), v.get("sym"),
                           WKB.to_wkb(_from_geojson({"type": "Point", "coordinates": coord})))
                    el.clear()

    elif layer in ("routes", "tracks"):
        container, seg_tag, pt_tag = (
            ("rte", None, "rtept") if layer == "routes" else ("trk", "trkseg", "trkpt")
        )
        schema = T.StructType([
            T.StructField("name", S), T.StructField("number", I),
            T.StructField("geom", T.BinaryType()),
        ])

        def iter_rows(fp):
            for _, el in ET.iterparse(fp):
                if _local(el.tag) != container:
                    continue
                name = number = None
                segs = []
                pts = []
                for c in el:
                    t = _local(c.tag)
                    if t == "name":
                        name = (c.text or "").strip() or None
                    elif t == "number":
                        number = int(c.text)
                    elif seg_tag and t == seg_tag:
                        seg = [_gpx_pt(p)[0] for p in c if _local(p.tag) == pt_tag]
                        if seg:
                            segs.append(seg)
                    elif t == pt_tag:
                        pts.append(_gpx_pt(c)[0])
                # Z only when every vertex has <ele> — a mixed 2D/3D part set
                # would make one inconsistent geometry
                if layer == "routes":
                    if pts and any(len(p) < 3 for p in pts):
                        pts = [p[:2] for p in pts]
                    gj = {"type": "LineString", "coordinates": pts} if pts else None
                else:
                    if segs and any(len(p) < 3 for s in segs for p in s):
                        segs = [[p[:2] for p in s] for s in segs]
                    gj = {"type": "MultiLineString", "coordinates": segs} if segs else None
                yield (name, number, WKB.to_wkb(_from_geojson(gj)) if gj else None)
                el.clear()

    elif layer in ("route_points", "track_points"):
        container, pt_tag, fid = (
            ("rte", "rtept", "route_fid") if layer == "route_points" else ("trk", "trkpt", "track_fid")
        )
        fields = [T.StructField(fid, I)]
        if layer == "track_points":
            fields.append(T.StructField("track_seg_id", I))
        fields += [
            T.StructField("point_id", I), T.StructField("ele", D),
            T.StructField("time", S), T.StructField("geom", T.BinaryType()),
        ]
        schema = T.StructType(fields)

        def iter_rows(fp):
            ci = -1
            for _, el in ET.iterparse(fp):
                if _local(el.tag) != container:
                    continue
                ci += 1
                if layer == "route_points":
                    pi = -1
                    for p in el:
                        if _local(p.tag) == pt_tag:
                            pi += 1
                            coord, v = _gpx_pt(p)
                            yield (ci, pi, float(v["ele"]) if v.get("ele") else None, v.get("time"),
                                   WKB.to_wkb(_from_geojson({"type": "Point", "coordinates": coord})))
                else:
                    si = -1
                    for seg in el:
                        if _local(seg.tag) != "trkseg":
                            continue
                        si += 1
                        pi = -1
                        for p in seg:
                            if _local(p.tag) == pt_tag:
                                pi += 1
                                coord, v = _gpx_pt(p)
                                yield (ci, si, pi, float(v["ele"]) if v.get("ele") else None, v.get("time"),
                                       WKB.to_wkb(_from_geojson({"type": "Point", "coordinates": coord})))
                el.clear()

    else:
        raise ValueError(f"unknown GPX layer {layer!r}")
    return _make_df(spark, files, schema, iter_rows, f"gpx_{layer}")


# --------------------------------------------------------------------------
# GML (OGC GML 2 coordinates / GML 3 pos|posList)
# --------------------------------------------------------------------------

def _floats(text):
    return [float(v) for v in (text or "").replace(",", " ").split()]


def _gml_poslist(el, default_dim=2):
    dim = int(el.get("srsDimension", default_dim))
    vals = _floats(el.text)
    return [vals[i : i + dim] for i in range(0, len(vals) - dim + 1, dim)]


def _gml_coords_el(el):
    """GML2 <coordinates>: tuples split by ts (space), ordinates by cs (,)."""
    cs, ts = el.get("cs", ","), el.get("ts", " ")
    out = []
    for tok in (el.text or "").split(ts if ts.strip() else None):
        parts = [p for p in tok.split(cs) if p != ""]
        if len(parts) >= 2:
            out.append([float(v) for v in parts])
    return out


def _gml_ring(el):
    """LinearRing -> coordinate list."""
    for c in el.iter():
        t = _local(c.tag)
        if t == "posList":
            return _gml_poslist(c)
        if t == "coordinates":
            return _gml_coords_el(c)
    # GML3 ring as repeated <pos>
    pts = [_floats(c.text) for c in el.iter() if _local(c.tag) == "pos"]
    return pts or None


_GML_GEOM_TAGS = {
    "Point", "LineString", "Curve", "Polygon", "Surface", "MultiPoint",
    "MultiLineString", "MultiCurve", "MultiPolygon", "MultiSurface",
    "MultiGeometry", "LinearRing",
}


def _gml_geom(el):
    t = _local(el.tag)
    if t == "Point":
        for c in el:
            ct = _local(c.tag)
            if ct == "pos":
                return {"type": "Point", "coordinates": _floats(c.text)}
            if ct == "coordinates":
                pts = _gml_coords_el(c)
                return {"type": "Point", "coordinates": pts[0]} if pts else None
        return None
    if t in ("LineString", "LinearRing"):
        ring = _gml_ring(el)
        return {"type": "LineString", "coordinates": ring} if ring else None
    if t == "Curve":
        pts = []
        for seg in el.iter():
            if _local(seg.tag) == "LineStringSegment":
                part = _gml_ring(seg) or []
                pts.extend(part if not pts else part[1:])  # join shared vertex
        return {"type": "LineString", "coordinates": pts} if pts else None
    if t in ("Polygon", "PolygonPatch"):
        ext, ints = None, []
        for b in el:
            bt = _local(b.tag)
            if bt in ("exterior", "outerBoundaryIs"):
                ext = _gml_ring(b)
            elif bt in ("interior", "innerBoundaryIs"):
                r = _gml_ring(b)
                if r:
                    ints.append(r)
        if ext is None:
            return None
        return {"type": "Polygon", "coordinates": [ext] + ints}
    if t == "Surface":
        polys = [g for g in (_gml_geom(p) for p in el.iter() if _local(p.tag) == "PolygonPatch") if g]
        if not polys:
            return None
        if len(polys) == 1:
            return polys[0]
        return {"type": "MultiPolygon", "coordinates": [p["coordinates"] for p in polys]}
    member_map = {
        "MultiPoint": ("Point", "MultiPoint"),
        "MultiLineString": ("LineString", "MultiLineString"),
        "MultiCurve": ("LineString", "MultiLineString"),
        "MultiPolygon": ("Polygon", "MultiPolygon"),
        "MultiSurface": ("Polygon", "MultiPolygon"),
    }
    if t in member_map:
        want, out_t = member_map[t]
        parts = []
        for c in _top_geoms(el):
            g = _gml_geom(c)
            if g and g["type"] == want:
                parts.append(g["coordinates"])
            elif g and g["type"] == "MultiPolygon" and out_t == "MultiPolygon":
                parts.extend(g["coordinates"])
        return {"type": out_t, "coordinates": parts} if parts else None
    if t == "MultiGeometry":
        parts = [g for g in (_gml_geom(c) for c in _top_geoms(el)) if g]
        return {"type": "GeometryCollection", "geometries": parts} if parts else None
    return None


def _top_geoms(el):
    """First-level geometry descendants: descend through member/property
    wrapper elements but NOT into geometry elements themselves (a Polygon's
    LinearRing must not surface as a separate member)."""
    out, stack = [], list(el)
    while stack:
        c = stack.pop(0)
        if _local(c.tag) in _GML_GEOM_TAGS:
            out.append(c)
        else:
            stack[:0] = list(c)
    return out


def _gml_features(fp: str):
    """Yield (props, geom_geojson) per feature member of a FeatureCollection;
    a file whose root is neither a collection nor a member is treated as one
    feature."""
    root = ET.parse(fp).getroot()
    members = []
    for el in root.iter():
        if _local(el.tag) in ("featureMember", "member", "featureMembers"):
            members.extend(list(el))
    if not members and _local(root.tag).endswith("FeatureCollection"):
        members = list(root)
    if not members:
        members = [root]
    for feat in members:
        props: dict = {}
        geom = None
        for c in feat:
            t = _local(c.tag)
            if t in _GML_GEOM_TAGS:
                geom = _gml_geom(c)
                continue
            sub = [s for s in c if _local(s.tag) in _GML_GEOM_TAGS]
            if sub:
                if geom is None:
                    geom = _gml_geom(sub[0])
            elif len(c) == 0:
                props[t] = (c.text or "").strip() or None
        yield props, geom


def read_gml(spark: SparkSession, path: str, columns: list | None = None) -> DataFrame:
    """ST_Read for GML feature collections (WFS-style): simple-content child
    elements become string columns, the first gml geometry property becomes
    WKB ``geom``."""
    files = _expand(path, (".gml", ".xml"))
    names: list[str] = []
    for f in files:
        for props, _ in _gml_features(f):
            for k in props:
                if k not in names:
                    names.append(k)
    if columns is not None:
        names = [n for n in names if n in set(columns)]
    schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in names]
        + [T.StructField("geom", T.BinaryType())]
    )

    def iter_rows(fp):
        for props, geom in _gml_features(fp):
            yield tuple(props.get(n) for n in names) + (
                WKB.to_wkb(_from_geojson(geom)) if geom else None,
            )

    return _make_df(spark, files, schema, iter_rows, "gml")


def _xml_esc(s) -> str:
    return str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _gml_geom_xml(gj) -> str:
    """GeoJSON dict -> GML3 fragment (posList dialect, the one read_gml
    round-trips; reference writes via GDAL's GML driver, st_write.cpp)."""
    t = gj["type"]

    def pos(c):
        return " ".join(repr(float(v)) for v in c)

    def poslist(cs):
        return " ".join(repr(float(v)) for pt in cs for v in pt[:2])

    if t == "Point":
        return f"<gml:Point><gml:pos>{pos(gj['coordinates'])}</gml:pos></gml:Point>"
    if t == "LineString":
        return (f"<gml:LineString><gml:posList>{poslist(gj['coordinates'])}"
                "</gml:posList></gml:LineString>")
    if t == "Polygon":
        out = "<gml:Polygon>"
        for i, ring in enumerate(gj["coordinates"]):
            b = "exterior" if i == 0 else "interior"
            out += (f"<gml:{b}><gml:LinearRing><gml:posList>{poslist(ring)}"
                    f"</gml:posList></gml:LinearRing></gml:{b}>")
        return out + "</gml:Polygon>"
    wrap = {"MultiPoint": ("gml:MultiPoint", "gml:pointMember", "Point"),
            "MultiLineString": ("gml:MultiCurve", "gml:curveMember", "LineString"),
            "MultiPolygon": ("gml:MultiSurface", "gml:surfaceMember", "Polygon")}
    if t in wrap:
        outer, member, part_t = wrap[t]
        inner = "".join(
            f"<{member}>{_gml_geom_xml({'type': part_t, 'coordinates': c})}</{member}>"
            for c in gj["coordinates"]
        )
        return f"<{outer}>{inner}</{outer}>"
    inner = "".join(
        f"<gml:geometryMember>{_gml_geom_xml(g)}</gml:geometryMember>"
        for g in gj["geometries"]
    )
    return f"<gml:MultiGeometry>{inner}</gml:MultiGeometry>"


def write_gml(
    df: DataFrame, path: str, geom_col: str = "geom", layer: str = "feature",
    max_rows: int = 1_000_000,
) -> None:
    """COPY TO (FORMAT GDAL, DRIVER GML) analog: a WFS-style
    FeatureCollection with one featureMember per row; single-document
    format, so rows stream through the driver with a hard cap (same policy
    as write_kml)."""
    import json as _json

    props = [c for c in df.columns if c != geom_col]
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml" xmlns:x="urn:x">',
    ]
    n = 0
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(f"write_gml: more than max_rows={max_rows} rows; raise the cap explicitly")
        d = r.asDict()
        parts.append(f"<gml:featureMember><x:{layer}>")
        for c in props:
            if d.get(c) is not None:
                parts.append(f"<x:{_xml_esc(c)}>{_xml_esc(d[c])}</x:{_xml_esc(c)}>")
        wkb = d.get(geom_col)
        if wkb is not None:
            gj = _json.loads(_to_geojson(WKB.from_wkb(bytes(wkb))))
            parts.append(f"<x:geometry>{_gml_geom_xml(gj)}</x:geometry>")
        parts.append(f"</x:{layer}></gml:featureMember>")
    parts.append("</gml:FeatureCollection>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(parts))


def write_gpx(
    df: DataFrame, path: str, geom_col: str = "geom", name_col: str | None = None,
    max_rows: int = 1_000_000,
) -> None:
    """COPY TO (FORMAT GDAL, DRIVER GPX) analog. Point rows become <wpt>,
    LineString/MultiLineString rows become <trk>/<trkseg>; other geometry
    types raise (GPX has no polygon concept — GDAL's driver skips them,
    we'd rather tell the user)."""
    import json as _json

    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<gpx version="1.1" creator="duckdb_spatial_spark" xmlns="http://www.topografix.com/GPX/1/1">',
    ]

    def pt(tag, c, nm):
        ele = f"<ele>{repr(float(c[2]))}</ele>" if len(c) > 2 else ""
        nm_x = f"<name>{_xml_esc(nm)}</name>" if nm is not None else ""
        return f'<{tag} lat="{repr(float(c[1]))}" lon="{repr(float(c[0]))}">{ele}{nm_x}</{tag}>'

    n = 0
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(f"write_gpx: more than max_rows={max_rows} rows; raise the cap explicitly")
        d = r.asDict()
        wkb = d.get(geom_col)
        if wkb is None:
            continue
        nm = d.get(name_col) if name_col else None
        gj = _json.loads(_to_geojson(WKB.from_wkb(bytes(wkb))))
        t = gj["type"]
        if t == "Point":
            parts.append(pt("wpt", gj["coordinates"], nm))
        elif t == "MultiPoint":
            parts.extend(pt("wpt", c, nm) for c in gj["coordinates"])
        elif t in ("LineString", "MultiLineString"):
            segs = [gj["coordinates"]] if t == "LineString" else gj["coordinates"]
            nm_x = f"<name>{_xml_esc(nm)}</name>" if nm is not None else ""
            body = "".join(
                "<trkseg>" + "".join(pt("trkpt", c, None) for c in seg) + "</trkseg>"
                for seg in segs
            )
            parts.append(f"<trk>{nm_x}{body}</trk>")
        else:
            raise ValueError(f"write_gpx: unsupported geometry type {t} (GPX has points/tracks only)")
    parts.append("</gpx>")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(parts))


# --------------------------------------------------------------------------
# GeoRSS (GDAL's GeoRSS driver analog — reference reaches it via st_read.cpp
# GDAL dispatch). RSS 2.0 <item> / Atom <entry> rows; geometry from
# GeoRSS-Simple (<georss:point/line/polygon/box>, lat-lon order), GML inside
# <georss:where>, or W3C <geo:lat>/<geo:long>.
# --------------------------------------------------------------------------

_GEORSS_FIELDS = ("title", "link", "description", "author", "pubDate", "updated")


def _georss_simple_coords(text: str):
    """GeoRSS-Simple coordinate lists are 'lat lon lat lon ...'."""
    vals = [float(v) for v in (text or "").split()]
    return [[vals[i + 1], vals[i]] for i in range(0, len(vals) - 1, 2)]


def _swap_xy_geojson(gj):
    def sw(c):
        if isinstance(c[0], (int, float)):
            return [c[1], c[0]] + list(c[2:])
        return [sw(x) for x in c]

    out = dict(gj)
    if "coordinates" in out:
        out["coordinates"] = sw(out["coordinates"])
    elif out.get("type") == "GeometryCollection":
        out["geometries"] = [_swap_xy_geojson(g) for g in out.get("geometries", [])]
    return out


def _georss_geom(el):
    """First GeoRSS geometry found among an item's children -> geojson."""
    lat = lon = None
    for c in el:
        t = _local(c.tag).lower()
        if t == "point":
            pts = _georss_simple_coords(c.text)
            if pts:
                return {"type": "Point", "coordinates": pts[0]}
        elif t == "line":
            return {"type": "LineString", "coordinates": _georss_simple_coords(c.text)}
        elif t == "polygon":
            ring = _georss_simple_coords(c.text)
            if ring and ring[0] != ring[-1]:
                ring.append(ring[0])
            return {"type": "Polygon", "coordinates": [ring]}
        elif t == "box":
            pts = _georss_simple_coords(c.text)
            if len(pts) == 2:
                (x0, y0), (x1, y1) = pts
                return {
                    "type": "Polygon",
                    "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
                }
        elif t == "where":
            for g in c:
                gj = _gml_geom(g)
                if gj is not None:
                    # GML inside georss:where is in EPSG:4326 axis order
                    # (lat lon) — swap to x=lon like GDAL's GeoRSS driver
                    return _swap_xy_geojson(gj)
        elif t == "lat":
            lat = float(c.text)
        elif t in ("long", "lon"):
            lon = float(c.text)
    if lat is not None and lon is not None:
        return {"type": "Point", "coordinates": [lon, lat]}
    return None


def read_georss(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for GeoRSS feeds: one row per RSS ``<item>`` / Atom
    ``<entry>`` with the common feed fields as strings and WKB ``geom``."""
    files = _expand(path, (".xml", ".rss", ".georss", ".atom"))
    schema = T.StructType(
        [T.StructField(n, T.StringType()) for n in _GEORSS_FIELDS]
        + [T.StructField("geom", T.BinaryType())]
    )

    def iter_rows(fp):
        for _, el in ET.iterparse(fp):
            if _local(el.tag) not in ("item", "entry"):
                continue
            vals = {}
            for c in el:
                t = _local(c.tag)
                if t in _GEORSS_FIELDS and c.text and c.text.strip():
                    vals[t] = c.text.strip()
                elif t == "link" and not c.text and c.get("href"):
                    vals["link"] = c.get("href")  # Atom <link href="..."/>
                elif t == "author" and len(c):  # Atom <author><name>..
                    for a in c:
                        if _local(a.tag) == "name" and a.text:
                            vals["author"] = a.text.strip()
            gj = _georss_geom(el)
            yield tuple(vals.get(n) for n in _GEORSS_FIELDS) + (
                WKB.to_wkb(_from_geojson(gj)) if gj else None,
            )
            el.clear()

    return _make_df(spark, files, schema, iter_rows, "georss")


def write_georss(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    title_col: str | None = None,
    max_rows: int = 1_000_000,
) -> None:
    """COPY TO (FORMAT GDAL, DRIVER GeoRSS) analog: RSS 2.0 feed with
    GeoRSS-Simple geometry (lat-lon order). Single-document writer with
    the standard driver-collect cap."""
    from ..geo import wkb as _WKB

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_georss: more than max_rows={max_rows} rows")
    props = [c for c in df.columns if c != geom_col]
    gi = df.columns.index(geom_col)

    def esc(s):
        return str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def simple(g) -> str:
        # float() first: numpy>=2 scalar repr is "np.float64(1.5)" — unparseable
        def ll(arr):
            return " ".join(f"{float(p[1])!r} {float(p[0])!r}" for p in arr)

        if g.tag == 1:  # point
            return (
                f"<georss:point>{float(g.data[1])!r} "
                f"{float(g.data[0])!r}</georss:point>"
            )
        if g.tag == 2:  # linestring
            return f"<georss:line>{ll(g.data)}</georss:line>"
        if g.tag == 3 and g.data:  # polygon: shell only (GeoRSS-Simple limit)
            return f"<georss:polygon>{ll(g.data[0])}</georss:polygon>"
        raise ValueError(
            f"write_georss: GeoRSS-Simple supports point/line/polygon; got tag {g.tag}"
        )

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<rss version="2.0" xmlns:georss="http://www.georss.org/georss">',
        "<channel><title>export</title>",
    ]
    for r in rows:
        out.append("<item>")
        tcol = title_col or ("title" if "title" in props else None)
        for c in props:
            v = r[c]
            if v is None:
                continue
            tag = "title" if c == tcol else c
            out.append(f"<{esc(tag)}>{esc(v)}</{esc(tag)}>")
        if r[gi] is not None:
            out.append(simple(_WKB.from_wkb(r[gi])))
        out.append("</item>")
    out += ["</channel>", "</rss>"]
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out))
