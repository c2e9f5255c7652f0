"""ODS spreadsheet source (sources/ods.py, OASIS OpenDocument v1.2):
roundtrip through the minimal writer, repeat-attribute handling, sheet
selection, typing parity with the XLSX lane, st_read dispatch."""

import zipfile

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources import ods_sheets, read_ods, st_read, write_ods


def test_roundtrip_and_typing(spark, tmp_path):
    p = str(tmp_path / "t.ods")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.25)],
        "id long, name string, v double",
    )
    write_ods(df, p, sheet="data")
    # spec detail: mimetype is the FIRST member, stored uncompressed
    with zipfile.ZipFile(p) as zf:
        first = zf.infolist()[0]
        assert first.filename == "mimetype"
        assert first.compress_type == zipfile.ZIP_STORED
    assert ods_sheets(p) == ["data"]
    back = read_ods(spark, p)
    assert back.columns == ["id", "name", "v"]
    assert dict(back.dtypes)["id"] == "double"  # numeric-only -> DOUBLE
    assert dict(back.dtypes)["name"] == "string"
    rows = {int(r["id"]): r for r in back.collect()}
    assert rows[1]["name"] == "a" and rows[1]["v"] == 1.5
    assert rows[2]["v"] is None and rows[3]["name"] is None


def test_repeat_attributes_and_sheet_selection(spark, tmp_path):
    # hand-written content.xml exercising number-columns/rows-repeated
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="s1"><table:table-row>'
        '<table:table-cell office:value-type="string"><text:p>a</text:p></table:table-cell>'
        '<table:table-cell office:value-type="string"><text:p>b</text:p></table:table-cell>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="3">'
        '<table:table-cell office:value-type="float" office:value="7" '
        'table:number-columns-repeated="2"><text:p>7</text:p></table:table-cell>'
        '<table:table-cell table:number-columns-repeated="1000"/>'
        "</table:table-row></table:table>"
        '<table:table table:name="s2"><table:table-row>'
        '<table:table-cell office:value-type="string"><text:p>x</text:p></table:table-cell>'
        "</table:table-row><table:table-row>"
        '<table:table-cell office:value-type="boolean" office:boolean-value="true"/>'
        "</table:table-row></table:table>"
        "</office:spreadsheet></office:body></office:document-content>"
    )
    p = str(tmp_path / "rep.ods")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    assert ods_sheets(p) == ["s1", "s2"]
    df = read_ods(spark, p)  # first sheet: repeated row x3, col-repeat x2
    assert df.columns == ["a", "b"] and df.count() == 3
    assert df.agg(F.sum("a"), F.sum("b")).first() == (21.0, 21.0)
    s2 = read_ods(spark, p, sheet="s2", header=False)
    assert s2.count() == 2
    with pytest.raises(ValueError, match="not found"):
        read_ods(spark, p, sheet="nope")


def test_st_read_dispatch_and_layers(spark, tmp_path):
    p = str(tmp_path / "d.ods")
    write_ods(spark.createDataFrame([(1.0,), (2.0,)], "v double"), p)
    assert st_read(spark, p).count() == 2
    assert st_read(spark, p, allowed_drivers=["ODS"]).count() == 2
    assert st_read(spark, p, sequential_layer_scan=True).count() == 2


def test_data_repeats_materialize_fully_and_interior_empty_rows_kept(spark, tmp_path):
    """r12 ADVICE: repeats carrying DATA must materialize past the
    empty-pad clamp (4096), and a fully-empty row in the MIDDLE of a
    sheet is a real (all-null) row, not droppable padding."""
    ns = (
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content {ns}>"
        "<office:body><office:spreadsheet>"
        '<table:table table:name="s1"><table:table-row>'
        '<table:table-cell office:value-type="string"><text:p>v</text:p></table:table-cell>'
        "</table:table-row>"
        # 5000 identical DATA rows via rows-repeated > the 4096 pad clamp
        '<table:table-row table:number-rows-repeated="5000">'
        '<table:table-cell office:value-type="float" office:value="1"><text:p>1</text:p></table:table-cell>'
        "</table:table-row>"
        # interior fully-empty row (blank separator), then one more row
        "<table:table-row><table:table-cell/></table:table-row>"
        "<table:table-row>"
        '<table:table-cell office:value-type="float" office:value="9"><text:p>9</text:p></table:table-cell>'
        "</table:table-row>"
        # trailing whole-sheet pad: must still be stripped
        '<table:table-row table:number-rows-repeated="1048576"><table:table-cell/></table:table-row>'
        "</table:table></office:spreadsheet></office:body></office:document-content>"
    )
    p = str(tmp_path / "big.ods")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    df = read_ods(spark, p)
    # 5000 data rows + 1 interior empty (all-null) + 1 final row
    assert df.count() == 5002
    assert df.agg(F.sum("v")).first()[0] == 5009.0
    rows = [r.v for r in df.collect()]
    assert rows[5000] is None and rows[5001] == 9.0

    # wide DATA column repeat also materializes fully
    content2 = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<office:document-content {ns}>"
        "<office:body><office:spreadsheet>"
        '<table:table table:name="w"><table:table-row>'
        '<table:table-cell office:value-type="float" office:value="2" '
        'table:number-columns-repeated="5000"><text:p>2</text:p></table:table-cell>'
        "</table:table-row></table:table>"
        "</office:spreadsheet></office:body></office:document-content>"
    )
    p2 = str(tmp_path / "wide.ods")
    with zipfile.ZipFile(p2, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content2)
    w = read_ods(spark, p2, header=False)
    assert len(w.columns) == 5000 and w.count() == 1
