"""INTERLIS 1 transfer-format source (.itf — the Swiss cadastral
exchange format; the reference reads it through GDAL's "Interlis 1"
driver, listed in ``gdal/functions/st_drivers.cpp``). Independent
implementation of the PUBLIC ITF syntax (INTERLIS 1 Reference Manual
ch. 3, "Transfer"):

  SCNT ... ////          comment block (skipped)
  MTID INTERLIS1         transfer id
  MODL <name>            model
  TOPI <name>            topic          (ETOP closes)
  TABL <name>            table          (ETAB closes)
  OBJE <tid> <values...> object row; '@' marks an undefined value;
                         CONT lines continue the value list
  STPT <c1> <c2>         start point of a line sequence
  LIPT <c1> <c2>         line point
  ARCP <c1> <c2>         circular-arc point between its neighbors
                         (stroked through the circumcircle, 5-degree
                         steps — the same density GDAL's stroking uses)
  ELIN                   closes the sequence
  EMOD / ENDE            end model / end transfer

Geometry tables interleave OBJE rows with STPT/LIPT/ARCP/ELIN
sequences; the sequences up to the next OBJE belong to the preceding
object. One sequence reads as LINESTRING, several as MULTILINESTRING,
and a lone STPT reads as POINT. Without a compiled .ili model the
attribute names/types are unknown (GDAL needs ili2c for them), so —
like GDAL's model-less path — values surface as a string array with
'@' mapped to null; coordinates are emitted in transfer order
(x=first, y=second). Unknown directives (PERI area markers, ...) are
skipped."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession

from ..geo import geom as G
from ..geo import wkb as WKB
from .sosi import _stroke_buep


def parse_itf(path: str):
    """-> (meta, features): meta has model/mtid; features are dicts
    {topic, table, tid, attrs, geometry-or-None}."""
    meta: dict = {"mtid": None, "model": None}
    feats: list[dict] = []
    topic = table = None
    cur: dict | None = None
    seq: list | None = None   # open STPT.. sequence
    arc_pending = None        # ARCP coordinate awaiting its end point
    in_comment = False

    def close_obj():
        nonlocal cur
        if cur is None:
            return
        lines = cur.pop("_lines")
        if not lines:
            cur["geom"] = None
        elif len(lines) == 1:
            pts = lines[0]
            cur["geom"] = (G.point(*pts[0]) if len(pts) == 1
                           else G.linestring(pts))
        else:
            cur["geom"] = G.collect(
                [G.linestring(p) for p in lines if len(p) >= 2])
        feats.append(cur)
        cur = None

    with open(path, encoding="utf-8", errors="replace") as fh:
        for raw in fh:
            parts = raw.split()
            if not parts:
                continue
            tag = parts[0].upper()
            if in_comment:
                if tag == "////":
                    in_comment = False
                continue
            if tag == "SCNT":
                in_comment = True
                continue
            if tag == "MTID":
                meta["mtid"] = " ".join(parts[1:])
            elif tag == "MODL":
                meta["model"] = parts[1] if len(parts) > 1 else None
            elif tag == "TOPI":
                topic = parts[1] if len(parts) > 1 else None
            elif tag == "TABL":
                close_obj()
                table = parts[1] if len(parts) > 1 else None
            elif tag in ("ETAB", "ETOP", "EMOD", "ENDE"):
                close_obj()
                if tag == "ETAB":
                    table = None
                elif tag == "ETOP":
                    topic = None
            elif tag == "OBJE":
                close_obj()
                tid = None
                if len(parts) > 1:
                    try:
                        tid = int(parts[1])
                    except ValueError:
                        tid = None
                vals = [None if v == "@" else v for v in parts[2:]]
                cur = {"topic": topic, "table": table, "tid": tid,
                       "attrs": vals, "_lines": []}
            elif tag == "CONT" and cur is not None:
                cur["attrs"].extend(
                    None if v == "@" else v for v in parts[1:])
            elif tag == "STPT" and cur is not None and len(parts) >= 3:
                seq = [[float(parts[1]), float(parts[2])]]
                cur["_lines"].append(seq)
                arc_pending = None
            elif tag == "ARCP" and seq is not None and len(parts) >= 3:
                arc_pending = [float(parts[1]), float(parts[2])]
            elif tag == "LIPT" and seq is not None and len(parts) >= 3:
                p = [float(parts[1]), float(parts[2])]
                if arc_pending is not None:
                    # circular arc prev -> ARCP -> here, endpoints exact
                    seq.extend(_stroke_buep(seq[-1], arc_pending, p)[1:])
                    arc_pending = None
                else:
                    seq.append(p)
            elif tag == "ELIN":
                seq = None
                arc_pending = None
            # anything else (PERI, table-definition noise) is skipped
    close_obj()
    return meta, feats


def _distrib_rows(fp):
    """Worker-side row generator for read_interlis."""
    _, feats = parse_itf(fp)
    for f in feats:
        g = f.get("geom")
        yield (f["topic"], f["table"], f["tid"], f["attrs"],
               WKB.to_wkb(g) if g is not None else None)


def read_interlis(spark: SparkSession, path: str) -> DataFrame:
    """ST_Read for .itf: (topic, table, tid, attrs, geom) — one row per
    OBJE; ``attrs`` is the model-less string-array view of the value
    list ('@' -> null) and ``geom`` assembles from the object's
    STPT/LIPT/ARCP/ELIN sequences. Per-file parsing runs distributed
    (one input partition per file)."""
    from pyspark.sql import types as T

    from ._distrib import distributed_file_read

    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.itf")))
    else:
        files = sorted(_glob.glob(path)) or [path]
    if not files:
        raise FileNotFoundError(path)
    schema = T.StructType([
        T.StructField("topic", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("tid", T.LongType()),
        T.StructField("attrs", T.ArrayType(T.StringType())),
        T.StructField("geom", T.BinaryType()),
    ])
    return distributed_file_read(
        spark, files, schema,
        "duckdb_spatial_spark.sources.interlis:_distrib_rows")


def _fmt(v: float) -> str:
    s = f"{v:.3f}".rstrip("0").rstrip(".")
    return s if s else "0"


def write_interlis(df: DataFrame, path: str, geom_col: str = "geom",
                   tid_col: str | None = None, attrs: list | None = None,
                   model: str = "Model", topic: str = "Topic",
                   table: str = "Table",
                   max_rows: int = 1_000_000) -> None:
    """Minimal ITF writer (fixture/export path, the write_kml policy):
    MTID/MODL/TOPI/TABL framing, one OBJE per row with ``attrs=``
    columns as values (null -> '@'), geometry as STPT/LIPT sequences
    (POINT -> lone STPT; LINESTRING -> one sequence; MULTILINESTRING ->
    one per part; POLYGON rings -> one per ring, the ITF area-boundary
    convention). Coordinates keep <= 3 decimals exactly."""
    lines = [f"MTID INTERLIS1", f"MODL {model}", f"TOPI {topic}",
             f"TABL {table}"]
    n = 0
    for r in df.toLocalIterator():
        n += 1
        if n > max_rows:
            raise ValueError(
                f"write_interlis: more than max_rows={max_rows} rows")
        d = r.asDict()
        tv = d.get(tid_col) if tid_col else None
        tid = n if tv is None else int(tv)  # 0 is a valid tid
        vals = []
        for c in attrs or []:
            v = d.get(c)
            vals.append("@" if v is None else str(v))
        lines.append(("OBJE " + str(tid) + (" " if vals else "")
                      + " ".join(vals)).rstrip())
        wkb = d.get(geom_col)
        if wkb is None:
            continue
        g = WKB.from_wkb(bytes(wkb))
        if g.tag == G.POINT:
            seqs = [[list(g.data[:2])]]
        elif g.tag == G.LINESTRING:
            seqs = [[list(p[:2]) for p in g.data]]
        elif g.tag == G.MULTILINESTRING:
            seqs = [[list(p[:2]) for p in part.data] for part in g.data]
        elif g.tag == G.POLYGON:
            seqs = [[list(p[:2]) for p in ring] for ring in g.data]
        else:
            raise ValueError(
                f"write_interlis: unsupported geometry tag {g.tag}")
        for pts in seqs:
            lines.append(f"STPT {_fmt(pts[0][0])} {_fmt(pts[0][1])}")
            for p in pts[1:]:
                lines.append(f"LIPT {_fmt(p[0])} {_fmt(p[1])}")
            lines.append("ELIN")
    lines += ["ETAB", "ETOP", "EMOD", "ENDE"]
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
