"""PostgreSQL/PostGIS dump sink (GDAL's write-only "PGDump" driver analog
— the reference reaches it via ``st_write.cpp`` GDAL dispatch).

``write_pgdump`` emits a psql-loadable ``.sql`` file: DROP/CREATE TABLE
with typed columns, ``COPY ... FROM stdin`` with tab-separated rows
(``\\N`` NULLs, PostgreSQL text-format escaping), geometry as hex WKB —
EWKB with an SRID word when ``srid`` is given (PostGIS's parser accepts
ISO type codes alongside the EWKB SRID flag for 2D geometries), plus the
same ``CREATE INDEX ... USING GIST`` epilogue GDAL writes.

``read_pgdump`` parses the COPY block back into a DataFrame. GDAL's
PGDump driver is write-only; the reader here exists because ingesting
``pg_dump``-style text dumps is a real pipeline source shape (and it
closes the round-trip for the correctness gate).
"""

from __future__ import annotations

import os
import re
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_PG_TYPES = (
    (T.LongType, "BIGINT"),
    (T.IntegerType, "INTEGER"),
    (T.ShortType, "SMALLINT"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.FloatType, "REAL"),
    (T.BooleanType, "BOOLEAN"),
    (T.TimestampType, "TIMESTAMP"),
    (T.DateType, "DATE"),
)


def _pg_type(dt) -> str:
    for py, pg in _PG_TYPES:
        if isinstance(dt, py):
            return pg
    return "TEXT"


_COPY_ESC = {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}
_COPY_UNESC = {"\\\\": "\\", "\\t": "\t", "\\n": "\n", "\\r": "\r", "\\N": None}


def _copy_escape(v) -> str:
    if isinstance(v, bool):
        return "t" if v else "f"
    s = str(v)
    return "".join(_COPY_ESC.get(ch, ch) for ch in s)


def _ewkb_hex(wkb: bytes, srid: int) -> str:
    """Hex geometry for the COPY stream. srid=0 -> plain ISO WKB; else the
    outer type word gains the EWKB SRID flag (0x20000000) and the srid
    int32 follows it — PostGIS's reader accepts ISO Z/M numeric codes
    combined with the SRID bit, so nested type words stay untouched."""
    if not srid:
        return wkb.hex().upper()
    bo = wkb[0]
    fmt = "<I" if bo == 1 else ">I"
    (code,) = struct.unpack_from(fmt, wkb, 1)
    head = wkb[:1] + struct.pack(fmt, code | 0x20000000) + struct.pack(fmt, srid)
    return (head + wkb[5:]).hex().upper()


def write_pgdump(
    df: DataFrame,
    path: str,
    table: str = "export",
    geom_col: str = "geom",
    srid: int = 0,
    schema: str = "public",
    create_index: bool = True,
    max_rows: int = 2_000_000,
) -> None:
    """COPY TO ... (FORMAT GDAL, DRIVER 'PGDump') analog. Single-file SQL
    dump — driver-collected with the standard serial-writer cap."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"write_pgdump: result exceeds max_rows={max_rows}; a SQL text dump "
            "is a serial interchange format — use parquet for large tables"
        )
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table) or not re.fullmatch(
        r"[A-Za-z_][A-Za-z0-9_]*", schema
    ):
        raise ValueError("write_pgdump: table/schema must be plain identifiers")
    attr_fields = [f for f in df.schema.fields if f.name != geom_col]
    has_geom = geom_col in df.columns
    gi = df.columns.index(geom_col) if has_geom else -1
    qt = f'"{schema}"."{table}"'

    cols_sql = [f'"{f.name}" {_pg_type(f.dataType)}' for f in attr_fields]
    if has_geom:
        cols_sql.append(f'"{geom_col}" GEOMETRY')
    copy_cols = [f'"{f.name}"' for f in attr_fields] + (
        [f'"{geom_col}"'] if has_geom else []
    )

    out = [
        "SET standard_conforming_strings = OFF;",
        f"DROP TABLE IF EXISTS {qt} CASCADE;",
        f"CREATE TABLE {qt} ({', '.join(cols_sql)});",
        f"COPY {qt} ({', '.join(copy_cols)}) FROM stdin;",
    ]
    for r in rows:
        vals = []
        for f in attr_fields:
            v = r[f.name]
            vals.append("\\N" if v is None else _copy_escape(v))
        if has_geom:
            g = r[gi]
            vals.append("\\N" if g is None else _ewkb_hex(bytes(g), srid))
        out.append("\t".join(vals))
    out.append("\\.")
    if has_geom and create_index:
        out.append(
            f'CREATE INDEX "{table}_{geom_col}_geom_idx" ON {qt} '
            f'USING GIST ("{geom_col}");'
        )
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(out) + "\n")


def _copy_unescape(tok: str):
    if tok == "\\N":
        return None
    out = []
    i = 0
    while i < len(tok):
        if tok[i] == "\\" and i + 1 < len(tok):
            out.append(_COPY_UNESC.get(tok[i : i + 2], tok[i + 1]))
            i += 2
        else:
            out.append(tok[i])
            i += 1
    return "".join(out)


_COPY_RE = re.compile(r'COPY\s+(\S+)\s*\(([^)]*)\)\s+FROM\s+stdin;', re.I)
_CREATE_RE = re.compile(
    r'CREATE\s+TABLE\s+\S+\s*\((.*?)\);', re.I | re.S
)

_PG_TO_SPARK = {
    "BIGINT": T.LongType(),
    "INTEGER": T.IntegerType(),
    "SMALLINT": T.ShortType(),
    "DOUBLE PRECISION": T.DoubleType(),
    "REAL": T.FloatType(),
    "BOOLEAN": T.BooleanType(),
    "GEOMETRY": T.BinaryType(),
}


def read_pgdump(spark: SparkSession, path: str) -> DataFrame:
    """Parse a PGDump ``.sql`` file's CREATE TABLE + COPY block back into a
    DataFrame (geometry hex -> WKB binary, EWKB SRID word stripped)."""
    from .xmlgeo import _expand, _make_df

    files = [f for f in _expand(path, (".sql",)) if os.path.exists(f)]
    if not files:
        raise FileNotFoundError(path)

    def parse_header(fp):
        text = open(fp, "r", encoding="utf-8").read()
        mc = _CREATE_RE.search(text)
        mcopy = _COPY_RE.search(text)
        if mc is None or mcopy is None:
            raise ValueError(f"{fp}: no CREATE TABLE + COPY block found")
        types = {}
        for part in mc.group(1).split(","):
            toks = part.strip().split(None, 1)
            if len(toks) == 2:
                types[toks[0].strip('"')] = toks[1].strip().upper()
        cols = [c.strip().strip('"') for c in mcopy.group(2).split(",")]
        body_start = text.index("\n", mcopy.end()) + 1
        return cols, types, text, body_start

    cols0, types0, _, _ = parse_header(files[0])
    fields = []
    for c in cols0:
        pg = types0.get(c, "TEXT")
        fields.append(T.StructField(c, _PG_TO_SPARK.get(pg, T.StringType()), True))
    schema = T.StructType(fields)

    def convert(tok, dt, pg):
        v = _copy_unescape(tok)
        if v is None:
            return None
        if pg == "GEOMETRY":
            raw = bytes.fromhex(v)
            bo = raw[0]
            fmt = "<I" if bo == 1 else ">I"
            (code,) = struct.unpack_from(fmt, raw, 1)
            if code & 0x20000000:  # EWKB SRID word: strip it
                raw = raw[:1] + struct.pack(fmt, code & ~0x20000000) + raw[9:]
            return raw
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType)):
            return int(v)
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return float(v)
        if isinstance(dt, T.BooleanType):
            return v in ("t", "true", "T")
        return v

    def iter_rows(fp):
        cols, types, text, body_start = parse_header(fp)
        for line in text[body_start:].splitlines():
            if line == "\\.":
                break
            toks = line.split("\t")
            yield tuple(
                convert(tok, schema[c].dataType, types.get(c, "TEXT"))
                for tok, c in zip(toks, cols)
            )

    return _make_df(spark, files, schema, iter_rows, "pgdump")
