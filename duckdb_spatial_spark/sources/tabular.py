"""XLSX reader/writer (ST_Read's GDAL XLSX driver analog).

The reference reads spreadsheets through GDAL's XLSX driver
(``spatial/src/spatial/gdal/functions/st_read.cpp``; exercised by
``test/sql/gdal/``). XLSX is OOXML: a zip of XML parts — readable with
stdlib ``zipfile`` + ``xml.etree`` alone, no GDAL needed. Supported:
shared strings, inline strings, numeric/boolean cells, multiple sheets.
Column types are inferred like GDAL's HEADERS=AUTO mode: first row =
header, a column whose every non-null cell parses as a number becomes
DOUBLE, else STRING.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(ref: str) -> int:
    """A1-style cell reference -> 0-based column index."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def _sheet_rows(zf: zipfile.ZipFile, member: str, shared: list[str]):
    """Yield rows (lists of python values, None-padded) from one sheet."""
    root = ET.fromstring(zf.read(member))
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.iter(f"{_NS}c"):
            ci = _col_index(c.get("r", "A"))
            t = c.get("t", "n")
            if t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
            else:
                v = c.find(f"{_NS}v")
                if v is None or v.text is None:
                    val = None
                elif t == "s":
                    val = shared[int(v.text)]
                elif t == "b":
                    val = v.text == "1"
                elif t == "str":
                    val = v.text
                else:
                    val = v.text  # numeric kept as text; typed later
            cells[ci] = val
        if cells:
            width = max(cells) + 1
            yield [cells.get(i) for i in range(width)]


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ET.fromstring(raw).iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def xlsx_sheets(path: str) -> list[str]:
    """Sheet names in workbook order (GDAL: each sheet is a layer)."""
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        return [s.get("name") for s in wb.iter(f"{_NS}sheet")]


def _sheet_member(zf: zipfile.ZipFile, sheet: str | None) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels.iter(f"{_REL_NS}Relationship")
    }
    for s in wb.iter(f"{_NS}sheet"):
        if sheet is None or s.get("name") == sheet:
            target = rid_to_target[s.get(f"{_RID_NS}id")]
            return target if target.startswith("xl/") else f"xl/{target}"
    have = [s.get("name") for s in wb.iter(f"{_NS}sheet")]
    raise ValueError(f"sheet {sheet!r} not found (have {have})")


def read_xlsx(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    header: bool = True,
) -> DataFrame:
    """ST_Read for .xlsx: one sheet -> one DataFrame. Numeric-only columns
    come back as DOUBLE, everything else STRING (GDAL XLSX autodetect
    analog). Spreadsheets are driver-parsed (they are small interchange
    files by construction — the zip central directory must fit in memory
    anyway)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        member = _sheet_member(zf, sheet)
        rows = list(_sheet_rows(zf, member, shared))
    return rows_to_typed_df(spark, rows, header)


def rows_to_typed_df(spark: SparkSession, rows: list, header: bool) -> DataFrame:
    """Shared spreadsheet-row typing (GDAL HEADERS/autodetect analog):
    first row = header when ``header``, numeric-only columns DOUBLE,
    everything else STRING. Used by the XLSX and ODS readers."""
    if not rows:
        return spark.createDataFrame([], "c0 string")
    width = max(len(r) for r in rows)
    rows = [list(r) + [None] * (width - len(r)) for r in rows]
    if header:
        names = [str(v) if v is not None else f"c{i}" for i, v in enumerate(rows[0])]
        data = rows[1:]
    else:
        names = [f"c{i}" for i in range(width)]
        data = rows
    names = [re.sub(r"[^A-Za-z0-9_]", "_", n) for n in names]

    def numeric(col):
        seen = False
        for r in data:
            v = r[col]
            if v is None or isinstance(v, bool):
                continue
            seen = True
            try:
                float(v)
            except (TypeError, ValueError):
                return False
        return seen

    kinds = [numeric(i) for i in range(width)]

    def conv(i, v):
        if v is None:
            return None
        return float(v) if kinds[i] else str(v)

    typed = [tuple(conv(i, v) for i, v in enumerate(r)) for r in data]
    schema = T.StructType(
        [
            T.StructField(n, T.DoubleType() if k else T.StringType())
            for n, k in zip(names, kinds)
        ]
    )
    return spark.createDataFrame(typed, schema)


def write_xlsx(df: DataFrame, path: str, sheet: str = "Sheet1", max_rows: int = 1_000_000) -> None:
    """Minimal single-sheet .xlsx writer (inline strings — no shared-string
    table). Driver-collected and capped like the other single-file
    interchange writers."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_xlsx: more than max_rows={max_rows} rows")
    cols = df.columns

    def esc(s: str) -> str:
        return (
            str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def cell(ci: int, ri: int, v) -> str:
        ref = ""
        n = ci + 1
        while n:
            n, rem = divmod(n - 1, 26)
            ref = chr(65 + rem) + ref
        ref += str(ri + 1)
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{esc(v)}</t></is></c>'

    body = []
    body.append(
        "<row r=\"1\">" + "".join(cell(i, 0, c) for i, c in enumerate(cols)) + "</row>"
    )
    for ri, r in enumerate(rows, start=1):
        body.append(
            f'<row r="{ri + 1}">'
            + "".join(cell(ci, ri, r[ci]) for ci in range(len(cols)))
            + "</row>"
        )
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{esc(sheet)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
