"""ODS (OpenDocument spreadsheet) reader/writer — the GDAL ODS driver
analog (``st_read.cpp`` reaches it via GDAL; this is an independent
implementation of the public OASIS OpenDocument v1.2 format: a zip with
``content.xml`` carrying office:spreadsheet -> table:table ->
table-row/table-cell, values typed by ``office:value-type``).

Shares the XLSX reader's typing contract (rows_to_typed_df: header row,
numeric-only columns DOUBLE, else STRING) and the st_read layer model
(each table:table is a layer/sheet). Handles the format's repeat
attributes (``number-columns-repeated`` / ``number-rows-repeated`` —
LibreOffice pads trailing emptiness with huge repeats, which are
clamped and trailing-stripped rather than materialized)."""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_T = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_X = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"

_MAX_REPEAT = 4096  # clamp for EMPTY repeats only (LibreOffice pads the
# sheet tail with number-rows/columns-repeated up to 2^20 empty runs);
# repeats carrying DATA are materialized fully, bounded by _DATA_REPEAT_MAX
_DATA_REPEAT_MAX = 1_000_000  # loud failure instead of silent truncation


def _cell_value(cell):
    vt = cell.get(f"{_O}value-type")
    if vt in ("float", "currency", "percentage"):
        return cell.get(f"{_O}value")
    if vt == "boolean":
        return cell.get(f"{_O}boolean-value") == "true"
    if vt == "date":
        return cell.get(f"{_O}date-value")
    if vt == "time":
        return cell.get(f"{_O}time-value")
    ps = cell.findall(f"{_X}p")
    if not ps:
        return None
    return "\n".join("".join(p.itertext()) for p in ps) or None


def _table_rows(table):
    # Repeat semantics (ODF 1.2 §9.1.3/§19.676): a repeat carrying DATA is
    # real content and materializes fully — clamping it would silently
    # lose rows/cells (r12 ADVICE); only all-EMPTY repeats (the
    # whole-sheet trailing pad LibreOffice writes) are clamped. Interior
    # empty rows stay as empty lists so row alignment survives; only the
    # trailing empty run is stripped.
    rows = []
    for tr in table.iter(f"{_T}table-row"):
        vals = []
        for cell in tr:
            if cell.tag not in (f"{_T}table-cell", f"{_T}covered-table-cell"):
                continue
            rep = int(cell.get(f"{_T}number-columns-repeated", 1))
            v = _cell_value(cell) if cell.tag == f"{_T}table-cell" else None
            if v is None:
                rep = min(rep, _MAX_REPEAT)
            elif rep > _DATA_REPEAT_MAX:
                raise ValueError(
                    f"ods: number-columns-repeated={rep} on a non-empty cell "
                    f"exceeds {_DATA_REPEAT_MAX}"
                )
            vals.extend([v] * rep)
        while vals and vals[-1] is None:  # strip the repeat padding
            vals.pop()
        rrep = int(tr.get(f"{_T}number-rows-repeated", 1))
        if vals:
            if rrep > _DATA_REPEAT_MAX:
                raise ValueError(
                    f"ods: number-rows-repeated={rrep} on a non-empty row "
                    f"exceeds {_DATA_REPEAT_MAX}"
                )
            rows.extend(list(vals) for _ in range(rrep))
        else:
            # interior empty rows preserve alignment; a trailing empty
            # run (the sheet pad) is stripped below
            rows.extend([] for _ in range(min(rrep, _MAX_REPEAT)))
    while rows and not rows[-1]:
        rows.pop()
    return rows


def ods_sheets(path: str) -> list[str]:
    """Table (sheet) names in document order."""
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    return [t.get(f"{_T}name") for t in root.iter(f"{_T}table")]


def read_ods(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    header: bool = True,
) -> DataFrame:
    """ST_Read for .ods: one table -> one DataFrame, typed exactly like
    the XLSX lane (shared rows_to_typed_df)."""
    from .tabular import rows_to_typed_df

    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    tables = list(root.iter(f"{_T}table"))
    if not tables:
        raise ValueError(f"{path!r}: no table in content.xml")
    if sheet is None:
        table = tables[0]
    else:
        match = [t for t in tables if t.get(f"{_T}name") == sheet]
        if not match:
            have = [t.get(f"{_T}name") for t in tables]
            raise ValueError(f"sheet {sheet!r} not found (have {have})")
        table = match[0]
    return rows_to_typed_df(spark, _table_rows(table), header)


def write_ods(df: DataFrame, path: str, sheet: str = "Sheet1",
              max_rows: int = 1_000_000) -> None:
    """Minimal single-sheet .ods writer (driver-collected, capped like
    the other single-file interchange sinks). Numeric columns write as
    office float values, everything else as text."""
    from xml.sax.saxutils import escape

    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"write_ods: more than max_rows={max_rows} rows")
    cols = df.columns
    numeric = {
        f.name for f in df.schema.fields
        if f.dataType.simpleString() in
        ("double", "float", "int", "bigint", "smallint", "tinyint", "decimal")
    }

    def cell(name, v):
        if v is None:
            return "<table:table-cell/>"
        if name in numeric:
            return (f'<table:table-cell office:value-type="float" '
                    f'office:value="{float(v)!r}"><text:p>{float(v)!r}'
                    f"</text:p></table:table-cell>")
        return (f'<table:table-cell office:value-type="string">'
                f"<text:p>{escape(str(v))}</text:p></table:table-cell>")

    body = ["".join(
        f'<table:table-cell office:value-type="string"><text:p>'
        f"{escape(c)}</text:p></table:table-cell>" for c in cols
    )]
    for r in rows:
        body.append("".join(cell(c, r[c]) for c in cols))
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'office:version="1.2"><office:body><office:spreadsheet>'
        f'<table:table table:name="{escape(sheet)}">'
        + "".join(f"<table:table-row>{r}</table:table-row>" for r in body)
        + "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    manifest = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<manifest:manifest '
        'xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" '
        'manifest:version="1.2">'
        '<manifest:file-entry manifest:full-path="/" manifest:media-type='
        '"application/vnd.oasis.opendocument.spreadsheet"/>'
        '<manifest:file-entry manifest:full-path="content.xml" '
        'manifest:media-type="text/xml"/></manifest:manifest>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        # spec: mimetype first, STORED (uncompressed)
        zf.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.spreadsheet",
            compress_type=zipfile.ZIP_STORED,
        )
        zf.writestr("META-INF/manifest.xml", manifest)
        zf.writestr("content.xml", content)
