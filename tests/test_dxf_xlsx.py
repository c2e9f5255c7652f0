"""DXF and XLSX readers (GDAL DXF / XLSX driver analogs; the reference
reaches both through ST_Read's GDAL dispatch, ``st_read.cpp``; XLSX is
exercised by the reference's ``test/sql/gdal/`` suite)."""

import zipfile

import pytest

from duckdb_spatial_spark.sources import st_read
from duckdb_spatial_spark.sources.dxf import read_dxf
from duckdb_spatial_spark.sources.tabular import read_xlsx, write_xlsx, xlsx_sheets


def _dxf(entities: str) -> str:
    return "0\nSECTION\n2\nENTITIES\n" + entities + "0\nENDSEC\n0\nEOF\n"


@pytest.fixture(scope="module")
def dxf_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("dxf") / "drawing.dxf"
    ents = (
        # POINT on layer A
        "0\nPOINT\n8\nA\n10\n1.5\n20\n2.5\n"
        # LINE
        "0\nLINE\n8\nA\n10\n0\n20\n0\n11\n3\n21\n4\n"
        # closed LWPOLYLINE (unit square) -> polygon
        "0\nLWPOLYLINE\n8\nB\n70\n1\n90\n4\n"
        "10\n0\n20\n0\n10\n1\n20\n0\n10\n1\n20\n1\n10\n0\n20\n1\n"
        # open LWPOLYLINE -> linestring
        "0\nLWPOLYLINE\n8\nB2\n70\n0\n90\n3\n"
        "10\n0\n20\n0\n10\n2\n20\n0\n10\n2\n20\n2\n"
        # CIRCLE radius 2 -> polygon
        "0\nCIRCLE\n8\nC\n10\n5\n20\n5\n40\n2\n"
        # ARC 0..90 deg
        "0\nARC\n8\nC\n10\n0\n20\n0\n40\n1\n50\n0\n51\n90\n"
        # classic POLYLINE with VERTEX/SEQEND, closed triangle
        "0\nPOLYLINE\n8\nD\n70\n1\n"
        "0\nVERTEX\n10\n0\n20\n0\n0\nVERTEX\n10\n4\n20\n0\n0\nVERTEX\n10\n0\n20\n3\n"
        "0\nSEQEND\n"
        # TEXT entity
        "0\nTEXT\n8\nE\n10\n7\n20\n8\n1\nhello\n"
    )
    p.write_text(_dxf(ents))
    return str(p)


def test_dxf_entities(spark, dxf_file):
    df = read_dxf(spark, dxf_file)
    df.createOrReplaceTempView("dxf")
    rows = {
        (r.entity, r.layer): r.wkt
        for r in spark.sql(
            "SELECT entity, layer, ST_AsText(geom) AS wkt FROM dxf"
        ).collect()
    }
    assert rows[("POINT", "A")] == "POINT (1.5 2.5)"
    assert rows[("LINE", "A")] == "LINESTRING (0 0, 3 4)"
    # closed lwpolyline became a polygon with area 1
    areas = {
        (r.entity, r.layer): r.a
        for r in spark.sql("SELECT entity, layer, ST_Area(geom) AS a FROM dxf").collect()
    }
    assert areas[("LWPOLYLINE", "B")] == pytest.approx(1.0)
    # circle tessellation: area close to pi*r^2
    assert areas[("CIRCLE", "C")] == pytest.approx(3.14159 * 4, rel=0.01)
    # classic polyline closed triangle: area 6
    assert areas[("POLYLINE", "D")] == pytest.approx(6.0)
    # arc is a linestring of ~quarter circumference
    ln = {
        (r.entity, r.layer): r.l
        for r in spark.sql("SELECT entity, layer, ST_Length(geom) AS l FROM dxf").collect()
    }
    assert ln[("ARC", "C")] == pytest.approx(3.14159 / 2, rel=0.01)
    texts = {r.entity: r.text for r in df.collect()}
    assert texts["TEXT"] == "hello"
    # st_read dispatch by extension
    assert st_read(spark, dxf_file).count() == df.count()


def test_dxf_write_roundtrip(spark, tmp_path):
    from duckdb_spatial_spark.sources.dxf import write_dxf
    from pyspark.sql import functions as F

    df = spark.sql(
        """
        SELECT id, concat('L', CAST(id % 3 AS STRING)) AS lyr,
               CASE WHEN id % 3 = 0 THEN ST_Point(CAST(id AS DOUBLE), 1.0D)
                    WHEN id % 3 = 1 THEN ST_MakeLine(array(
                        ST_Point(0.0D, CAST(id AS DOUBLE)), ST_Point(1.0D, 0.0D),
                        ST_Point(2.0D, CAST(id AS DOUBLE))))
                    ELSE ST_MakeEnvelope(CAST(id AS DOUBLE), 0.0D, CAST(id+2 AS DOUBLE), 3.0D)
               END AS geom
        FROM range(9)
        """
    )
    p = str(tmp_path / "w.dxf")
    write_dxf(df, p, layer_col="lyr")
    back = read_dxf(spark, p)
    back.createOrReplaceTempView("dxf_w")
    got = spark.sql(
        "SELECT layer, entity, count(*) AS n, round(sum(ST_Area(geom)), 6) AS a,"
        " round(sum(ST_Length(geom)), 6) AS l FROM dxf_w GROUP BY 1, 2 ORDER BY 1, 2"
    ).collect()
    by = {(r.layer, r.entity): (r.n, r.a, r.l) for r in got}
    assert by[("L0", "POINT")][0] == 3
    # three open polylines, each length 2*sqrt(1+id^2)... just check count
    assert by[("L1", "LWPOLYLINE")][0] == 3
    # three closed rectangles, each area 2*3=6
    assert by[("L2", "LWPOLYLINE")] == (3, 18.0, 0.0)
    with pytest.raises(ValueError, match="max_rows"):
        write_dxf(df, p, layer_col="lyr", max_rows=5)


def test_xlsx_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0), (3, None, 0.25)],
        "id long, name string, score double",
    )
    p = str(tmp_path / "t.xlsx")
    write_xlsx(df, p, sheet="data")
    assert xlsx_sheets(p) == ["data"]
    back = read_xlsx(spark, p)
    assert back.columns == ["id", "name", "score"]
    rows = {int(r.id): (r.name, r.score) for r in back.collect()}
    assert rows[1] == ("alpha", 1.5)
    assert rows[2] == ("beta", -2.0)
    assert rows[3] == (None, 0.25)
    # numeric-only columns inferred DOUBLE, mixed -> STRING
    assert dict(back.dtypes)["id"] == "double"
    assert dict(back.dtypes)["name"] == "string"
    # dispatch via st_read
    assert st_read(spark, p).count() == 3


def test_xlsx_shared_strings_and_sheet_select(spark, tmp_path):
    # hand-build a workbook with a sharedStrings table and two sheets
    p = str(tmp_path / "ss.xlsx")
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/></Types>',
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {ns} {rns}><sheets>'
            '<sheet name="first" sheetId="1" r:id="rId1"/>'
            '<sheet name="second" sheetId="2" r:id="rId2"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>'
            '<Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst {ns}><si><t>k</t></si><si><t>v1</t></si><si><t>v2</t></si></sst>',
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
        zf.writestr(
            "xl/worksheets/sheet2.xml",
            f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>2</v></c></row>'
            "</sheetData></worksheet>",
        )
    assert xlsx_sheets(p) == ["first", "second"]
    assert [r.k for r in read_xlsx(spark, p).collect()] == ["v1"]
    assert [r.k for r in read_xlsx(spark, p, sheet="second").collect()] == ["v2"]
    with pytest.raises(ValueError, match="not found"):
        read_xlsx(spark, p, sheet="nope")
