"""MapInfo MIF/MID reader + writer (ST_Read's GDAL "MapInfo File" driver
analog — the reference reaches it via GDAL dispatch, ``st_read.cpp``).

MIF (MapInfo Interchange Format) is a public ASCII format: a ``.mif`` file
with a header (``Version``/``Charset``/``Delimiter``/``Columns``) and a
``Data`` section of geometry objects, plus a ``.mid`` file of delimited
attribute rows in the same order. Supported objects: ``Point``, ``Line``,
``Pline`` (incl. ``Multiple``), ``Region`` (rings reassembled into
polygons/holes by containment, as GDAL does), ``None``; styling clauses
(``Symbol``/``Pen``/``Brush``/``Smooth``/``Center``) are skipped.
Column types: Char/Integer/Smallint/Float/Decimal/Logical/Date.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geo import geom as G
from ..geo import wkb as WKB
from ..geo.algorithms import _ring_signed_area, point_in_ring
from .xmlgeo import _expand, _make_df

_STYLE = ("symbol", "pen", "brush", "smooth", "center", "font")


def _parse_columns(lines, i):
    """Parse ``Columns N`` block starting at line i; return (cols, next_i)
    where cols is [(name, spark_type, converter)]."""
    n = int(lines[i].split()[1])
    cols = []
    for j in range(i + 1, i + 1 + n):
        parts = lines[j].strip().split(None, 1)
        name, typ = parts[0], (parts[1] if len(parts) > 1 else "Char(254)")
        t = typ.strip().lower()
        if t.startswith(("integer", "smallint")):
            cols.append((name, T.LongType(), lambda v: int(v) if v not in ("", None) else None))
        elif t.startswith(("float", "decimal")):
            cols.append((name, T.DoubleType(), lambda v: float(v) if v not in ("", None) else None))
        elif t.startswith("logical"):
            cols.append((name, T.BooleanType(),
                         lambda v: v.strip().upper() in ("T", "TRUE", "1") if v not in ("", None) else None))
        else:  # Char(n), Date, anything else -> string
            cols.append((name, T.StringType(), lambda v: v if v != "" else None))
    return cols, i + 1 + n


def _assemble_region(rings):
    """MIF Region rings -> POLYGON / MULTIPOLYGON: largest-|area|-first
    shells; a ring whose first vertex falls inside an existing shell (and
    outside its holes so far) becomes that shell's hole — GDAL's MIF reader
    applies the same containment reassembly (regions carry no explicit
    shell/hole structure on the wire)."""
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return G.Geometry(G.POLYGON, [])
    order = sorted(range(len(rings)), key=lambda k: -abs(_ring_signed_area(rings[k])))
    polys = []  # list of [shell, hole, ...]
    for k in order:
        r = rings[k]
        placed = False
        for rings_k in polys:
            if point_in_ring(r[0, 0], r[0, 1], rings_k[0]) == 2 and not any(
                point_in_ring(r[0, 0], r[0, 1], h) == 2 for h in rings_k[1:]
            ):
                rings_k.append(r)
                placed = True
                break
        if not placed:
            polys.append([r])
    if len(polys) == 1:
        return G.Geometry(G.POLYGON, polys[0])
    return G.Geometry(
        G.MULTIPOLYGON, [G.Geometry(G.POLYGON, p) for p in polys]
    )


def _read_coords(lines, i, n):
    pts = []
    while len(pts) < n:
        for tok in lines[i].split():
            pts.append(float(tok))
        i += 1
    return np.array(pts, dtype=np.float64).reshape(-1, 2), i


def _geometries(lines, i):
    """Yield Geometry (or None) per feature from the Data section."""
    while i < len(lines):
        line = lines[i].strip()
        if not line:
            i += 1
            continue
        parts = line.split()
        kw = parts[0].lower()
        if kw in _STYLE:
            i += 1
            continue
        if kw == "none":
            yield None
            i += 1
        elif kw == "point":
            yield G.point(float(parts[1]), float(parts[2]))
            i += 1
        elif kw == "line":
            arr = np.array(
                [[float(parts[1]), float(parts[2])], [float(parts[3]), float(parts[4])]]
            )
            yield G.Geometry(G.LINESTRING, arr)
            i += 1
        elif kw == "pline":
            if len(parts) >= 3 and parts[1].lower() == "multiple":
                nsec = int(parts[2])
                i += 1
                segs = []
                for _ in range(nsec):
                    cnt = int(lines[i].split()[0])
                    arr, i2 = _read_coords(lines, i + 1, cnt * 2)
                    segs.append(G.Geometry(G.LINESTRING, arr))
                    i = i2
                yield G.Geometry(G.MULTILINESTRING, segs)
            else:
                cnt = int(parts[1]) if len(parts) > 1 else int(lines[i + 1].split()[0])
                start = i + 1
                if len(parts) == 1:
                    start = i + 2
                arr, i = _read_coords(lines, start, cnt * 2)
                yield G.Geometry(G.LINESTRING, arr)
        elif kw == "region":
            nring = int(parts[1])
            i += 1
            rings = []
            for _ in range(nring):
                cnt = int(lines[i].split()[0])
                arr, i = _read_coords(lines, i + 1, cnt * 2)
                if len(arr) and not np.array_equal(arr[0], arr[-1]):
                    arr = np.vstack([arr, arr[:1]])
                rings.append(arr)
            yield _assemble_region(rings)
        else:
            # unknown object (Arc, Text, Rect, ...): skip the line; any
            # coordinate continuation lines are numeric-only and will also
            # be skipped by the unknown-keyword branch on the next pass
            i += 1


def _split_mid(line: str, delim: str):
    """Split a MID row on the delimiter, honoring double-quoted fields."""
    out, cur, inq = [], [], False
    for ch in line:
        if ch == '"':
            inq = not inq
        elif ch == delim and not inq:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def read_mif(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for MapInfo ``.mif``/``.mid`` pairs. Attributes come from the
    ``.mid`` file (typed per the ``Columns`` header), geometry from the
    ``.mif`` Data section; rows pair up in file order."""
    files = _expand(path, (".mif",))
    # parse the first header for the schema (all members must agree,
    # like every other multi-file reader here)
    with open(files[0], "r", encoding="latin-1") as f:
        head_lines = f.read().splitlines()
    delim = "\t"
    cols = []
    for idx, ln in enumerate(head_lines):
        low = ln.strip().lower()
        if low.startswith("delimiter"):
            q = ln.split('"')
            if len(q) >= 2 and q[1]:
                delim = q[1][0]
        elif low.startswith("columns"):
            cols, _ = _parse_columns(head_lines, idx)
        elif low == "data":
            break
    schema = T.StructType(
        [T.StructField(n, t) for n, t, _ in cols] + [T.StructField("geom", T.BinaryType())]
    )
    convs = [c for _, _, c in cols]

    def iter_rows(fp):
        with open(fp, "r", encoding="latin-1") as f:
            lines = f.read().splitlines()
        fdelim, fcols, data_at = "\t", [], None
        for idx, ln in enumerate(lines):
            low = ln.strip().lower()
            if low.startswith("delimiter"):
                q = ln.split('"')
                if len(q) >= 2 and q[1]:
                    fdelim = q[1][0]
            elif low.startswith("columns"):
                fcols, _ = _parse_columns(lines, idx)
            elif low == "data":
                data_at = idx + 1
                break
        if data_at is None:
            return
        mid_path = None
        for ext in (".mid", ".MID"):
            cand = os.path.splitext(fp)[0] + ext
            if os.path.exists(cand):
                mid_path = cand
                break
        mid_rows = []
        if mid_path is not None:
            with open(mid_path, "r", encoding="latin-1") as f:
                mid_rows = [l for l in f.read().splitlines() if l != ""]
        for k, g in enumerate(_geometries(lines, data_at)):
            attrs = []
            if k < len(mid_rows):
                vals = _split_mid(mid_rows[k], fdelim)
                for conv, v in zip(convs, vals):
                    try:
                        attrs.append(conv(v))
                    except (TypeError, ValueError):
                        attrs.append(None)
            attrs += [None] * (len(convs) - len(attrs))
            yield tuple(attrs) + (WKB.to_wkb(g) if g is not None else None,)

    return _make_df(spark, files, schema, iter_rows, "mif")


def _fmt(v: float) -> str:
    return repr(float(v))


def _mif_object(g: G.Geometry | None, out: list):
    if g is None or g.is_empty():
        out.append("None")
        return
    if g.tag == G.POINT:
        out.append(f"Point {_fmt(g.data[0])} {_fmt(g.data[1])}")
    elif g.tag == G.LINESTRING:
        if len(g.data) == 2:
            a, b = g.data[0], g.data[1]
            out.append(f"Line {_fmt(a[0])} {_fmt(a[1])} {_fmt(b[0])} {_fmt(b[1])}")
        else:
            out.append(f"Pline {len(g.data)}")
            for p in g.data:
                out.append(f"{_fmt(p[0])} {_fmt(p[1])}")
    elif g.tag == G.MULTILINESTRING:
        parts = [p for p in g.data if not p.is_empty()]
        out.append(f"Pline Multiple {len(parts)}")
        for p in parts:
            out.append(f"  {len(p.data)}")
            for q in p.data:
                out.append(f"{_fmt(q[0])} {_fmt(q[1])}")
    elif g.tag in (G.POLYGON, G.MULTIPOLYGON):
        rings = []
        polys = [g] if g.tag == G.POLYGON else list(g.data)
        for poly in polys:
            rings.extend(poly.data)
        out.append(f"Region {len(rings)}")
        for r in rings:
            out.append(f"  {len(r)}")
            for p in r:
                out.append(f"{_fmt(p[0])} {_fmt(p[1])}")
    elif g.tag == G.MULTIPOINT:
        # MIF has Multipoint (version 650+)
        pts = [p for p in g.data if not p.is_empty()]
        out.append(f"Multipoint {len(pts)}")
        for p in pts:
            out.append(f"{_fmt(p.data[0])} {_fmt(p.data[1])}")
    else:
        for part in g.flatten():
            _mif_object(part, out)


def write_mif(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    delimiter: str = ",",
    max_rows: int = 2_000_000,
) -> None:
    """COPY TO ... (FORMAT GDAL, DRIVER 'MapInfo File') analog: writes a
    ``.mif``/``.mid`` pair. Single-file interchange format — driver-collected
    with the same ``max_rows`` guard as the other serial writers (point big
    tables at GeoParquet instead)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_mif: result exceeds max_rows={max_rows}; MIF is a serial "
            "single-file interchange format — use write_geo_parquet for large tables"
        )
    attr_fields = [f for f in df.schema.fields if f.name != geom_col]

    def mif_type(f):
        t = f.dataType
        if isinstance(t, (T.LongType, T.IntegerType, T.ShortType)):
            return "Integer"
        if isinstance(t, (T.DoubleType, T.FloatType)):
            return "Float"
        if isinstance(t, T.BooleanType):
            return "Logical"
        return "Char(254)"

    mif = [
        "Version 300",
        'Charset "WindowsLatin1"',
        f'Delimiter "{delimiter}"',
        f"Columns {len(attr_fields)}",
    ]
    mif += [f"  {f.name} {mif_type(f)}" for f in attr_fields]
    mif.append("Data")
    mid = []
    gi = df.columns.index(geom_col)
    for r in rows:
        g = WKB.from_wkb(r[gi]) if r[gi] is not None else None
        _mif_object(g, mif)
        vals = []
        for f in attr_fields:
            v = r[f.name]
            if v is None:
                vals.append("")
            elif isinstance(v, bool):
                vals.append("T" if v else "F")
            elif isinstance(v, str):
                vals.append('"' + v.replace('"', "'") + '"')
            else:
                vals.append(str(v))
        mid.append(delimiter.join(vals))
    base = os.path.splitext(path)[0]
    with open(base + ".mif", "w", encoding="latin-1") as f:
        f.write("\n".join(mif) + "\n")
    with open(base + ".mid", "w", encoding="latin-1") as f:
        f.write("\n".join(mid) + "\n")
