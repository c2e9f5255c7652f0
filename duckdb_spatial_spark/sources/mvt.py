"""Mapbox Vector Tile (MVT) reader + writer — pure protobuf codec.

GDAL ships an MVT driver (the reference reaches it through the
``st_read.cpp:684-692`` format tail); this is a from-scratch
implementation of the public *Mapbox Vector Tile Specification 2.1*
(protobuf wire format hand-rolled — varints, length-delimited fields,
packed uint32s; no protobuf library):

* ``Tile`` { repeated Layer layers = 3 }
* ``Layer`` { version=15, name=1, features=2, keys=3, values=4, extent=5 }
* ``Feature`` { id=1, packed tags=2, type=3, packed geometry=4 }
* geometry = command integers ``(id & 7) | (count << 3)`` with id
  1=MoveTo 2=LineTo 7=ClosePath and zigzag-encoded cursor deltas;
  polygon ring role decided by the surveyor-formula sign in tile
  coordinates (y down): positive = exterior, negative = interior.

Tiles are integer-quantized by construction: the writer maps world
coordinates into ``extent`` tile units over an explicit ``bbox`` (tile y
axis points DOWN, so y inverts), the reader maps back — a roundtrip
therefore snaps to the tile grid, resolution ``(x1-x0)/extent``. That
quantization is exactly reproducible in plain SQL
(``floor(t + 0.5) / extent`` math), which is what the oracle pins.
Attribute values use the spec's typed ``Value`` oneof (string / double /
int64 / bool); per-layer key/value tables are deduplicated like any
conforming encoder.
"""

from __future__ import annotations

import struct

import numpy as np

from ..geo import geom as G

_MOVETO, _LINETO, _CLOSEPATH = 1, 2, 7


# ---------------------------------------------------------------- varint


def _uvarint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (int(v) << 1) ^ (int(v) >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _read_uvarint(buf: bytes, pos: int):
    shift = 0
    out = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _field(tag: int, wire: int) -> bytes:
    return _uvarint((tag << 3) | wire)


def _ld(tag: int, payload: bytes) -> bytes:  # length-delimited
    return _field(tag, 2) + _uvarint(len(payload)) + payload


# ---------------------------------------------------------------- values


def _encode_value(v) -> bytes:
    if isinstance(v, (bool, np.bool_)):
        return _field(7, 0) + _uvarint(1 if v else 0)
    if isinstance(v, (int, np.integer)):
        return _field(6, 0) + _uvarint(_zigzag(int(v)))  # sint64
    if isinstance(v, (float, np.floating)):
        return _field(3, 1) + struct.pack("<d", float(v))
    b = str(v).encode("utf-8")
    return _ld(1, b)


def _decode_value(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        tag, wire = key >> 3, key & 7
        if tag == 1:
            n, pos = _read_uvarint(buf, pos)
            return buf[pos : pos + n].decode("utf-8")
        if tag == 2:
            return float(struct.unpack_from("<f", buf, pos)[0])
        if tag == 3:
            return float(struct.unpack_from("<d", buf, pos)[0])
        if tag in (4, 5):
            v, pos = _read_uvarint(buf, pos)
            return int(v)
        if tag == 6:
            v, pos = _read_uvarint(buf, pos)
            return int(_unzigzag(v))
        if tag == 7:
            v, pos = _read_uvarint(buf, pos)
            return bool(v)
        raise ValueError(f"unknown Value field {tag}")
    return None


# ---------------------------------------------------------------- geometry


def _ring_area2(pts) -> float:
    """Twice the signed surveyor area in tile coords (y down)."""
    a = 0.0
    for i in range(len(pts) - 1):
        a += pts[i][0] * pts[i + 1][1] - pts[i + 1][0] * pts[i][1]
    return a


def _encode_geometry(g: G.Geometry, to_tile) -> tuple[int, list[int]]:
    """Returns (feature_type, command ints). ``to_tile(x, y) -> (tx, ty)``."""
    cmds: list[int] = []
    cx = cy = 0

    def move(pts):
        nonlocal cx, cy
        cmds.append((_MOVETO & 7) | (1 << 3))
        tx, ty = pts[0]
        cmds.append(_zigzag(tx - cx))
        cmds.append(_zigzag(ty - cy))
        cx, cy = tx, ty

    def lines(pts):
        nonlocal cx, cy
        cmds.append((_LINETO & 7) | (len(pts) << 3))
        for tx, ty in pts:
            cmds.append(_zigzag(tx - cx))
            cmds.append(_zigzag(ty - cy))
            cx, cy = tx, ty

    def tile_pts(arr):
        return [to_tile(p[0], p[1]) for p in np.asarray(arr, dtype=np.float64)]

    tag = g.tag
    if tag in (G.POINT, G.MULTIPOINT):
        pts = (
            [to_tile(g.data[0], g.data[1])]
            if tag == G.POINT
            else [to_tile(p.data[0], p.data[1]) for p in g.data]
        )
        out = [(_MOVETO & 7) | (len(pts) << 3)]
        for tx, ty in pts:
            out.append(_zigzag(tx - cx))
            out.append(_zigzag(ty - cy))
            cx, cy = tx, ty
        return 1, out
    if tag in (G.LINESTRING, G.MULTILINESTRING):
        parts = [g.data] if tag == G.LINESTRING else [p.data for p in g.data]
        for arr in parts:
            pts = tile_pts(arr)
            if len(pts) < 2:
                continue
            move(pts)
            lines(pts[1:])
        return 2, cmds
    if tag in (G.POLYGON, G.MULTIPOLYGON):
        polys = [g.data] if tag == G.POLYGON else [p.data for p in g.data]
        for rings in polys:
            for ri, arr in enumerate(rings):
                pts = tile_pts(arr)
                if len(pts) < 4:
                    continue
                if pts[0] == pts[-1]:
                    pts = pts[:-1]  # ClosePath implies closure
                # spec winding in tile coords: exterior positive area,
                # interior negative (y axis points down)
                a2 = _ring_area2(pts + [pts[0]])
                want_pos = ri == 0
                if (a2 > 0) != want_pos:
                    pts = pts[::-1]
                move(pts)
                lines(pts[1:])
                cmds.append(_CLOSEPATH & 7 | (1 << 3))
        return 3, cmds
    raise ValueError(f"MVT cannot encode geometry tag {tag}")


def _decode_geometry(ftype: int, cmds: list[int], from_tile) -> G.Geometry:
    i = 0
    cx = cy = 0
    parts: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] | None = None
    closed: list[bool] = []
    while i < len(cmds):
        c = cmds[i]
        i += 1
        cid, cnt = c & 7, c >> 3
        if cid == _MOVETO:
            for _ in range(cnt):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur = [(cx, cy)]
                parts.append(cur)
                closed.append(False)
        elif cid == _LINETO:
            for _ in range(cnt):
                cx += _unzigzag(cmds[i])
                cy += _unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cid == _CLOSEPATH:
            closed[-1] = True
        else:
            raise ValueError(f"bad MVT command {cid}")

    def world(pts, close=False):
        arr = pts + ([pts[0]] if close else [])
        return np.asarray([from_tile(tx, ty) for tx, ty in arr], dtype=np.float64)

    if ftype == 1:
        pts = [p for part in parts for p in part]
        if len(pts) == 1:
            x, y = from_tile(*pts[0])
            return G.point(x, y)
        return G.Geometry(
            G.MULTIPOINT, [G.point(*from_tile(tx, ty)) for tx, ty in pts]
        )
    if ftype == 2:
        lines = [G.linestring(world(p)) for p in parts if len(p) >= 2]
        return lines[0] if len(lines) == 1 else G.Geometry(G.MULTILINESTRING, lines)
    if ftype == 3:
        # group rings into polygons by winding: positive tile-area ring
        # (y down) starts a new polygon, negative is a hole of the current
        polys: list[list[np.ndarray]] = []
        for pts in parts:
            if len(pts) < 3:
                continue
            a2 = _ring_area2(pts + [pts[0]])
            ring = world(pts, close=True)
            if a2 > 0 or not polys:
                polys.append([ring])
            else:
                polys[-1].append(ring)
        gs = [G.Geometry(G.POLYGON, rings) for rings in polys]
        return gs[0] if len(gs) == 1 else G.Geometry(G.MULTIPOLYGON, gs)
    raise ValueError(f"bad MVT feature type {ftype}")


# ---------------------------------------------------------------- writer


def write_mvt(
    df,
    path: str,
    bbox: tuple | None = None,
    geom_col: str = "geom",
    layer: str = "layer",
    extent: int = 4096,
    max_rows: int = 1_000_000,
) -> int:
    """COPY TO a single .mvt/.pbf tile: world coordinates quantize into
    ``extent`` tile units over ``bbox`` (the tile's world bounds; tile y
    axis DOWN — defaults to ``(0, 0, extent, extent)``, i.e. tile-unit
    passthrough). Attribute columns become per-layer deduplicated
    key/value tables. Single-file sink, collect bounded by ``max_rows``."""
    from ..geo import wkb as WKB

    n_rows = df.count()
    if n_rows > max_rows:
        raise ValueError(
            f"write_mvt is a single-file sink: {n_rows} rows > max_rows={max_rows}"
        )
    pdf = df.toPandas()
    if bbox is None:
        bbox = (0.0, 0.0, float(extent), float(extent))
    x0, y0, x1, y1 = (float(v) for v in bbox)
    sx = extent / (x1 - x0)
    sy = extent / (y1 - y0)

    def to_tile(x, y):
        return (
            int(np.floor((x - x0) * sx + 0.5)),
            int(np.floor((y1 - y) * sy + 0.5)),
        )

    attr_cols = [c for c in pdf.columns if c != geom_col]
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    val_idx: dict[bytes, int] = {}
    feats = []
    for rowi in range(len(pdf)):
        b = pdf[geom_col].iloc[rowi]
        if b is None:
            continue
        g = WKB.from_wkb(bytes(b))
        if g.is_empty():
            continue
        ftype, cmds = _encode_geometry(g, to_tile)
        if not cmds:
            continue
        tags = []
        for c in attr_cols:
            v = pdf[c].iloc[rowi]
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            if c not in key_idx:
                key_idx[c] = len(keys)
                keys.append(c)
            ev = _encode_value(v)
            if ev not in val_idx:
                val_idx[ev] = len(values)
                values.append(ev)
            tags.append(key_idx[c])
            tags.append(val_idx[ev])
        body = _field(1, 0) + _uvarint(rowi)
        if tags:
            packed = b"".join(_uvarint(t) for t in tags)
            body += _ld(2, packed)
        body += _field(3, 0) + _uvarint(ftype)
        body += _ld(4, b"".join(_uvarint(c) for c in cmds))
        feats.append(body)

    lay = _field(15, 0) + _uvarint(2)  # version 2
    lay += _ld(1, layer.encode("utf-8"))
    for f in feats:
        lay += _ld(2, f)
    for k in keys:
        lay += _ld(3, k.encode("utf-8"))
    for v in values:
        lay += _ld(4, v)
    lay += _field(5, 0) + _uvarint(extent)
    with open(path, "wb") as f:
        f.write(_ld(3, lay))
    return len(feats)


# ---------------------------------------------------------------- reader


def _parse_layer(buf: bytes):
    pos = 0
    out = {"name": "", "extent": 4096, "features": [], "keys": [], "values": []}
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        tag, wire = key >> 3, key & 7
        if wire == 2:
            n, pos = _read_uvarint(buf, pos)
            payload = buf[pos : pos + n]
            pos += n
            if tag == 1:
                out["name"] = payload.decode("utf-8")
            elif tag == 2:
                out["features"].append(payload)
            elif tag == 3:
                out["keys"].append(payload.decode("utf-8"))
            elif tag == 4:
                out["values"].append(_decode_value(payload))
        elif wire == 0:
            v, pos = _read_uvarint(buf, pos)
            if tag == 5:
                out["extent"] = v
        else:
            raise ValueError(f"unexpected wire type {wire} in Layer")
    return out


def _parse_feature(buf: bytes):
    pos = 0
    fid = None
    tags: list[int] = []
    ftype = 0
    cmds: list[int] = []
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        tag, wire = key >> 3, key & 7
        if tag == 1 and wire == 0:
            fid, pos = _read_uvarint(buf, pos)
        elif tag == 3 and wire == 0:
            ftype, pos = _read_uvarint(buf, pos)
        elif wire == 2:
            n, pos = _read_uvarint(buf, pos)
            end = pos + n
            lst = tags if tag == 2 else cmds
            while pos < end:
                v, pos = _read_uvarint(buf, pos)
                lst.append(v)
        else:
            raise ValueError(f"unexpected Feature field {tag}/{wire}")
    return fid, tags, ftype, cmds


def read_mvt(spark, path: str, bbox: tuple | None = None, layer: str | None = None):
    """ST_Read for a .mvt/.pbf tile: one row per feature with the layer
    name, feature id, typed attribute columns (union of layer keys) and
    WKB ``geom`` mapped back to world coordinates over ``bbox`` (the
    tile's world bounds; default = per-layer ``(0, 0, extent, extent)``,
    i.e. tile-unit coordinates with y flipped back up)."""
    from pyspark.sql import types as T

    from ..geo import wkb as WKB

    with open(path, "rb") as f:
        buf = f.read()
    layers = []
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        tag, wire = key >> 3, key & 7
        if tag == 3 and wire == 2:
            n, pos = _read_uvarint(buf, pos)
            layers.append(_parse_layer(buf[pos : pos + n]))
            pos += n
        else:
            raise ValueError("not an MVT tile (expected Tile.layers)")
    if layer is not None:
        layers = [l for l in layers if l["name"] == layer]
        if not layers:
            raise ValueError(f"layer {layer!r} not in tile")

    rows = []
    all_keys: list[str] = []
    key_types: dict[str, type] = {}
    parsed = []
    for lay in layers:
        ext = lay["extent"]
        x0, y0, x1, y1 = (
            (0.0, 0.0, float(ext), float(ext))
            if bbox is None
            else tuple(float(v) for v in bbox)
        )
        sx = (x1 - x0) / ext
        sy = (y1 - y0) / ext

        def from_tile(tx, ty, sx=sx, sy=sy, x0=x0, y1=y1):
            return (x0 + tx * sx, y1 - ty * sy)

        for fb in lay["features"]:
            fid, tags, ftype, cmds = _parse_feature(fb)
            attrs = {}
            for i in range(0, len(tags) - 1, 2):
                k = lay["keys"][tags[i]]
                v = lay["values"][tags[i + 1]]
                attrs[k] = v
                if k not in key_types:
                    all_keys.append(k)
                    key_types[k] = type(v)
            g = _decode_geometry(ftype, cmds, from_tile)
            parsed.append((lay["name"], fid, attrs, WKB.to_wkb(g)))

    _T = {str: T.StringType(), int: T.LongType(), float: T.DoubleType(), bool: T.BooleanType()}
    schema = T.StructType(
        [T.StructField("layer", T.StringType()), T.StructField("feature_id", T.LongType())]
        + [T.StructField(k, _T[key_types[k]], True) for k in all_keys]
        + [T.StructField("geom", T.BinaryType(), True)]
    )
    for name, fid, attrs, wkb in parsed:
        rows.append(
            (name, fid, *[attrs.get(k) for k in all_keys], wkb)
        )
    return spark.createDataFrame(rows, schema)
