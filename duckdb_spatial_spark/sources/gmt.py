"""GMT ASCII vector source (the reference reads/writes .gmt through
GDAL's OGR GMT driver, listed in ``gdal/functions/st_drivers.cpp``; this
is an independent implementation of the PUBLIC OGR/GMT vector format,
gdal.org/drivers/vector/gmt.html):

  # @VGMT1.0 @GPOINT|@GLINESTRING|@GPOLYGON     collection geometry type
  # @Nfield1|field2                             attribute names
  # @Tdouble|integer|string                     attribute types
  > (segment separator), then per feature:
  # @Dval1|val2                                 attribute values
  lon lat                                       coordinate rows
  @P / @H after '>' mark polygon shells/holes.

POINT collections carry one feature per coordinate row; LINESTRING one
per segment; POLYGON one shell (+ following @H hole segments) per
feature. MULTIPOLYGON collections (# @VGMT1.0 @GMULTIPOLYGON) delimit
features by their "# @D" line: every @P shell (and its @H holes) up to
the next @D belongs to the same feature — an attribute-less
MULTIPOLYGON file is therefore one feature. Attribute values use GMT's
pipe separator with quoting left to the producer (values here never
contain pipes when written by write_gmt)."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession

from ..geo import geom as G
from ..geo import wkb as WKB


def _parse_types(names, types):
    from pyspark.sql import types as T

    mapping = {"integer": T.LongType(), "double": T.DoubleType()}
    out = []
    for i, n in enumerate(names):
        t = types[i] if i < len(types) else "string"
        out.append((n, mapping.get(t, T.StringType()), t))
    return out


def _conv(raw: str, t: str):
    if raw == "" or raw is None:
        return None
    if t == "integer":
        return int(raw)
    if t == "double":
        return float(raw)
    return raw


def parse_gmt(path: str):
    """-> (geom_type, [(name, spark_type, gmt_type)], [(attrs, geom)])."""
    gtype = "POINT"
    names, types = [], []
    feats = []  # (attrs tuple, geometry)
    cur_attrs = None
    cur_coords: list = []
    cur_rings: list = []
    cur_polys: list = []  # MULTIPOLYGON: member ring-lists of the feature
    ring_role = "P"

    def close_segment():
        nonlocal cur_coords
        if not cur_coords:
            return
        if gtype == "LINESTRING":
            feats.append((cur_attrs, G.linestring(cur_coords)))
        elif gtype in ("POLYGON", "MULTIPOLYGON"):
            ring = list(cur_coords)
            if ring[0] != ring[-1]:
                ring.append(list(ring[0]))
            if gtype == "MULTIPOLYGON":
                if ring_role == "H" and cur_polys:
                    cur_polys[-1].append(ring)
                else:
                    cur_polys.append([ring])
            elif ring_role == "H" and cur_rings:
                cur_rings.append(ring)
            else:
                close_polygon()
                cur_rings.append(ring)
        cur_coords = []

    def close_polygon():
        nonlocal cur_rings
        if cur_rings:
            feats.append((cur_attrs_of_poly[0], G.polygon(cur_rings)))
            cur_rings = []

    def close_multipolygon():
        nonlocal cur_polys
        if cur_polys:
            polys = [G.polygon(rs) for rs in cur_polys]
            geom = polys[0] if len(polys) == 1 else G.collect(polys)
            feats.append((cur_attrs_of_poly[0], G.multi(geom)))
            cur_polys = []

    cur_attrs_of_poly = [None]

    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                body = line[1:].strip()
                if body.startswith("@VGMT"):
                    for tok in body.split("@")[1:]:
                        tok = tok.strip()
                        if tok.startswith("G"):
                            gtype = tok[1:].upper() or "POINT"
                elif body.startswith("@N"):
                    names = body[2:].split("|")
                elif body.startswith("@T"):
                    types = body[2:].split("|")
                elif body.startswith("@D"):
                    if gtype == "MULTIPOLYGON":
                        # a @D starts a new feature: flush rings seen so far
                        close_segment()
                        close_multipolygon()
                    cur_attrs = tuple(body[2:].split("|"))
                    if gtype == "POLYGON" and not cur_rings:
                        cur_attrs_of_poly[0] = cur_attrs
                    elif gtype == "MULTIPOLYGON":
                        cur_attrs_of_poly[0] = cur_attrs
                continue
            if line.startswith(">"):
                close_segment()
                role = "P"
                rest = line[1:].strip()
                if rest.startswith("@H") or " @H" in f" {rest}":
                    role = "H"
                elif rest.startswith("@P"):
                    role = "P"
                if gtype == "POLYGON" and role == "P":
                    close_polygon()
                    cur_attrs_of_poly[0] = None
                ring_role = role
                continue
            parts = line.replace(",", " ").split()
            if len(parts) < 2:
                continue
            x, y = float(parts[0]), float(parts[1])
            if gtype == "POINT":
                feats.append((cur_attrs, G.point(x, y)))
            else:
                cur_coords.append([x, y])
    close_segment()
    if gtype == "POLYGON":
        close_polygon()
    elif gtype == "MULTIPOLYGON":
        close_multipolygon()
    fields = _parse_types(names, types)
    return gtype, fields, feats


def gmt_header(path: str):
    """Schema-only scan: @N/@T field declarations from the leading comment
    block (stops at the first data/segment line — no coordinate parsing)."""
    names, types = [], []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if not line.startswith("#"):
                break
            body = line[1:].strip()
            if body.startswith("@N"):
                names = body[2:].split("|")
            elif body.startswith("@T"):
                types = body[2:].split("|")
    return _parse_types(names, types)


def read_gmt(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for .gmt: attributes per @N/@T declarations + WKB geom.
    Schema binds from the first file's header on the driver; per-file
    parsing runs distributed (one input partition per file)."""
    from pyspark.sql import types as T

    from ._distrib import distributed_file_read

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.gmt")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    fields = gmt_header(files[0])
    schema = T.StructType(
        [T.StructField(n, st, True) for n, st, _ in fields]
        + [T.StructField("geom", T.BinaryType(), True)]
    )

    return distributed_file_read(
        spark, files, schema,
        "duckdb_spatial_spark.sources.gmt:_distrib_rows",
        {"gmt_types": [t for _, _, t in fields]})


def _distrib_rows(fp, gmt_types=None):
    """Worker-side row generator for read_gmt (imported by name through
    sources/_distrib.py options — no closures in the plan); the column
    types come from the FIRST file's header, bound driver-side."""
    gmt_types = gmt_types or []
    _, _, feats = parse_gmt(fp)
    for attrs, g in feats:
        vals = []
        for i, gmt_t in enumerate(gmt_types):
            raw = attrs[i] if attrs and i < len(attrs) else None
            vals.append(_conv(raw, gmt_t))
        yield tuple(vals) + (WKB.to_wkb(g),)


_TAG_NAMES = {G.POINT: "POINT", G.LINESTRING: "LINESTRING",
              G.POLYGON: "POLYGON", G.MULTIPOLYGON: "MULTIPOLYGON"}


def write_gmt(df: DataFrame, path: str, geom_col: str = "geom",
              max_rows: int = 1_000_000, gtype: str | None = None) -> None:
    """COPY TO (FORMAT GDAL, DRIVER GMT) analog: single ASCII document,
    driver-streamed with a hard cap (same policy as write_kml/write_gml).
    Geometry collection type is taken from ``gtype=`` or the first
    non-null row, and every later row is validated against it — mixed
    point/line/polygon tables are not writable to one .gmt layer and
    raise instead of corrupting the output. POLYGON rows are accepted
    into a MULTIPOLYGON layer (promoted)."""
    props = [c for c in df.columns if c != geom_col]
    dtypes = dict(df.dtypes)

    def gmt_type(c):
        t = dtypes[c]
        if t in ("bigint", "int", "smallint", "tinyint", "long"):
            return "integer"
        if t in ("double", "float"):
            return "double"
        return "string"

    lines = []
    n = 0
    gtag = gtype.upper() if gtype else None
    if gtag is not None and gtag not in _TAG_NAMES.values():
        raise ValueError(f"write_gmt: unsupported gtype {gtype!r}")
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(f"write_gmt: more than max_rows={max_rows} rows")
        d = r.asDict()
        wkb = d.get(geom_col)
        if wkb is None:
            continue
        g = WKB.from_wkb(bytes(wkb))
        rtag = _TAG_NAMES.get(g.tag)
        if rtag is None:
            raise ValueError(f"write_gmt: unsupported geometry tag {g.tag}")
        if gtag is None:
            gtag = rtag
        elif rtag != gtag and not (gtag == "MULTIPOLYGON" and rtag == "POLYGON"):
            raise ValueError(
                f"write_gmt: row {n} is {rtag} but the layer is {gtag}; "
                "mixed-type tables are not writable to one .gmt layer")
        attrs = "|".join("" if d.get(c) is None else str(d[c]) for c in props)
        if gtag == "POINT":
            if props:
                lines.append(f"# @D{attrs}")
            lines.append(f"{g.data[0]!r} {g.data[1]!r}")
        elif gtag == "LINESTRING":
            lines.append(">")
            if props:
                lines.append(f"# @D{attrs}")
            lines.extend(f"{p[0]!r} {p[1]!r}" for p in g.data)
        elif gtag == "MULTIPOLYGON":
            members = g.data if rtag == "MULTIPOLYGON" else [g]
            first_seg = True
            for poly in members:
                for k, ring in enumerate(poly.data):
                    lines.append("> @P" if k == 0 else "> @H")
                    if first_seg:
                        # the @D after the first segment delimits the feature
                        lines.append(f"# @D{attrs}")
                        first_seg = False
                    lines.extend(f"{p[0]!r} {p[1]!r}" for p in ring)
        else:
            for k, ring in enumerate(g.data):
                lines.append("> @P" if k == 0 else "> @H")
                if k == 0 and props:
                    lines.append(f"# @D{attrs}")
                lines.extend(f"{p[0]!r} {p[1]!r}" for p in ring)
    header = [f"# @VGMT1.0 @G{gtag or 'POINT'}"]
    if props:
        header.append("# @N" + "|".join(props))
        header.append("# @T" + "|".join(gmt_type(c) for c in props))
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(header + lines) + "\n")
