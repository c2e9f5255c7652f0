"""KML / GPX / GML source tests (sources/xmlgeo.py): hand-written sample
documents per the public OGC KML 2.2 / Topografix GPX 1.1 / OGC GML specs,
matching what GDAL's drivers produce for the same inputs (the reference
reads these formats through ``st_read.cpp``)."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import udfs
from duckdb_spatial_spark.sources import (
    read_gml,
    read_gpx,
    read_kml,
    st_read,
    write_kml,
)

KML = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2">
  <Document>
    <Folder>
      <name>places</name>
      <Placemark>
        <name>alpha</name>
        <description>first</description>
        <ExtendedData><Data name="pop"><value>1200</value></Data></ExtendedData>
        <Point><coordinates>4.9,52.37,3.0</coordinates></Point>
      </Placemark>
      <Placemark>
        <name>road</name>
        <LineString><coordinates>0,0 1,1 2,0</coordinates></LineString>
      </Placemark>
      <Placemark>
        <name>block</name>
        <Polygon>
          <outerBoundaryIs><LinearRing><coordinates>0,0 4,0 4,4 0,4 0,0</coordinates></LinearRing></outerBoundaryIs>
          <innerBoundaryIs><LinearRing><coordinates>1,1 2,1 2,2 1,2 1,1</coordinates></LinearRing></innerBoundaryIs>
        </Polygon>
      </Placemark>
      <Placemark>
        <name>pair</name>
        <MultiGeometry>
          <Point><coordinates>9,9</coordinates></Point>
          <Point><coordinates>8,8</coordinates></Point>
        </MultiGeometry>
      </Placemark>
      <Placemark><name>nogeom</name></Placemark>
    </Folder>
  </Document>
</kml>
"""

GPX = """<?xml version="1.0" encoding="UTF-8"?>
<gpx xmlns="http://www.topografix.com/GPX/1/1" version="1.1" creator="t">
  <wpt lat="52.37" lon="4.9"><ele>3.5</ele><name>dam</name><time>2020-01-01T00:00:00Z</time></wpt>
  <wpt lat="48.86" lon="2.35"><name>louvre</name></wpt>
  <rte><name>r1</name><rtept lat="0" lon="0"/><rtept lat="1" lon="1"/></rte>
  <trk><name>t1</name><number>7</number>
    <trkseg><trkpt lat="0" lon="0"><ele>1</ele></trkpt><trkpt lat="0" lon="1"><ele>2</ele></trkpt></trkseg>
    <trkseg><trkpt lat="5" lon="5"/><trkpt lat="6" lon="6"/></trkseg>
  </trk>
</gpx>
"""

GML = """<?xml version="1.0" encoding="utf-8"?>
<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/" xmlns:gml="http://www.opengis.net/gml">
  <gml:featureMember>
    <ogr:city>
      <ogr:name>ams</ogr:name>
      <ogr:pop>860000</ogr:pop>
      <ogr:geometryProperty><gml:Point><gml:pos>4.9 52.37</gml:pos></gml:Point></ogr:geometryProperty>
    </ogr:city>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:city>
      <ogr:name>line2</ogr:name>
      <ogr:geometryProperty><gml:LineString><gml:posList srsDimension="2">0 0 1 1 2 0</gml:posList></gml:LineString></ogr:geometryProperty>
    </ogr:city>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:city>
      <ogr:name>poly</ogr:name>
      <ogr:geometryProperty>
        <gml:Polygon>
          <gml:exterior><gml:LinearRing><gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList></gml:LinearRing></gml:exterior>
          <gml:interior><gml:LinearRing><gml:posList>1 1 2 1 2 2 1 2 1 1</gml:posList></gml:LinearRing></gml:interior>
        </gml:Polygon>
      </ogr:geometryProperty>
    </ogr:city>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:city>
      <ogr:name>multi</ogr:name>
      <ogr:geometryProperty>
        <gml:MultiSurface>
          <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>0 0 1 0 1 1 0 0</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
          <gml:surfaceMember><gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>5 5 6 5 6 6 5 5</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></gml:surfaceMember>
        </gml:MultiSurface>
      </ogr:geometryProperty>
    </ogr:city>
  </gml:featureMember>
  <gml:featureMember>
    <ogr:city>
      <ogr:name>gml2pt</ogr:name>
      <ogr:geometryProperty><gml:Point><gml:coordinates>10,20</gml:coordinates></gml:Point></ogr:geometryProperty>
    </ogr:city>
  </gml:featureMember>
</ogr:FeatureCollection>
"""


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("xmlgeo")
    paths = {}
    for name, body in (("sample.kml", KML), ("sample.gpx", GPX), ("sample.gml", GML)):
        p = os.path.join(d, name)
        with open(p, "w") as f:
            f.write(body)
        paths[name.split(".")[1]] = p
    return paths


def _wkt_map(df, key):
    rows = df.withColumn("wkt", udfs.st_astext(F.col("geom"))).collect()
    return {r[key]: r["wkt"] for r in rows}


def test_kml_read(spark, files):
    df = read_kml(spark, files["kml"])
    assert set(df.columns) >= {"name", "description", "pop", "geom"}
    m = _wkt_map(df, "name")
    assert m["alpha"] == "POINT Z (4.9 52.37 3)"
    assert m["road"] == "LINESTRING (0 0, 1 1, 2 0)"
    assert m["block"] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    assert m["pair"] == "MULTIPOINT (9 9, 8 8)"
    assert m["nogeom"] is None
    row = {r["name"]: r for r in df.collect()}
    assert row["alpha"]["pop"] == "1200"
    assert row["alpha"]["description"] == "first"


def test_kml_via_st_read(spark, files):
    assert st_read(spark, files["kml"]).count() == 5


def test_gpx_layers(spark, files):
    wpt = read_gpx(spark, files["gpx"], layer="waypoints")
    m = _wkt_map(wpt, "name")
    assert m["dam"] == "POINT Z (4.9 52.37 3.5)"
    assert m["louvre"] == "POINT (2.35 48.86)"
    assert {r["ele"] for r in wpt.collect()} == {3.5, None}

    rte = read_gpx(spark, files["gpx"], layer="routes")
    assert _wkt_map(rte, "name")["r1"] == "LINESTRING (0 0, 1 1)"

    trk = read_gpx(spark, files["gpx"], layer="tracks")
    assert (
        _wkt_map(trk, "name")["t1"]
        == "MULTILINESTRING ((0 0, 1 0), (5 5, 6 6))"
    )
    assert trk.collect()[0]["number"] == 7

    tp = read_gpx(spark, files["gpx"], layer="track_points").collect()
    assert len(tp) == 4
    assert [(r["track_fid"], r["track_seg_id"], r["point_id"]) for r in tp] == [
        (0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1)
    ]


def test_gml_read(spark, files):
    df = read_gml(spark, files["gml"])
    m = _wkt_map(df, "name")
    assert m["ams"] == "POINT (4.9 52.37)"
    assert m["line2"] == "LINESTRING (0 0, 1 1, 2 0)"
    assert m["poly"] == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    assert m["multi"] == "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
    assert m["gml2pt"] == "POINT (10 20)"
    props = {r["name"]: r["pop"] for r in df.collect()}
    assert props["ams"] == "860000"


def test_kml_write_roundtrip(spark, files, tmp_path):
    df = read_kml(spark, files["kml"]).filter(F.col("geom").isNotNull())
    out = os.path.join(tmp_path, "out.kml")
    write_kml(df, out, name_col="name")
    back = read_kml(spark, out)
    assert sorted(_wkt_map(back, "name").items()) == sorted(_wkt_map(df, "name").items())
    pops = {r["name"]: r["pop"] for r in back.collect()}
    assert pops["alpha"] == "1200"


# ---------------------------------------------------------------------------
# GeoRSS
# ---------------------------------------------------------------------------

def test_georss_roundtrip(spark, tmp_path):
    from duckdb_spatial_spark.sources.xmlgeo import read_georss, write_georss

    df = spark.sql(
        """
        SELECT concat('t', CAST(id AS STRING)) AS title,
               concat('http://x/', CAST(id AS STRING)) AS link,
               ST_Point(CAST(id AS DOUBLE) / 10 - 5, CAST(id * 3 AS DOUBLE) / 10 - 8) AS geom
        FROM range(40) 
        """
    )
    p = str(tmp_path / "feed.xml")
    write_georss(df, p)
    back = read_georss(spark, p)
    back.createOrReplaceTempView("_rss")
    rows = spark.sql(
        "SELECT title, link, round(ST_X(geom), 9) AS x, round(ST_Y(geom), 9) AS y FROM _rss"
    ).collect()
    assert len(rows) == 40
    got = {r.title: (r.link, r.x, r.y) for r in rows}
    assert got["t7"] == ("http://x/7", -4.3, -5.9)


def test_georss_simple_and_w3c_and_where(spark, tmp_path):
    from duckdb_spatial_spark.sources.xmlgeo import read_georss

    feed = """<?xml version="1.0"?>
<rss version="2.0" xmlns:georss="http://www.georss.org/georss"
     xmlns:geo="http://www.w3.org/2003/01/geo/wgs84_pos#"
     xmlns:gml="http://www.opengis.net/gml">
<channel><title>t</title>
<item><title>pt</title><georss:point>45.5 -122.6</georss:point></item>
<item><title>ln</title><georss:line>45 -122 46 -121</georss:line></item>
<item><title>pg</title><georss:polygon>45 -122 46 -122 46 -121 45 -122</georss:polygon></item>
<item><title>bx</title><georss:box>42 -71 43 -70</georss:box></item>
<item><title>w3c</title><geo:lat>12.5</geo:lat><geo:long>99.25</geo:long></item>
<item><title>where</title><georss:where><gml:Point><gml:pos>45.256 -71.92</gml:pos></gml:Point></georss:where></item>
<item><title>none</title><description>no geom</description></item>
</channel></rss>"""
    p = tmp_path / "mixed.rss"
    p.write_text(feed)
    back = read_georss(spark, str(p))
    back.createOrReplaceTempView("_rss2")
    rows = {
        r.title: r
        for r in spark.sql(
            "SELECT title, ST_AsText(geom) AS wkt, ST_GeometryType(geom) AS gt FROM _rss2"
        ).collect()
    }
    assert rows["pt"].wkt == "POINT (-122.6 45.5)"  # lat-lon -> x=lon
    assert rows["ln"].gt == "LINESTRING"
    assert rows["pg"].gt == "POLYGON"
    assert rows["bx"].wkt == "POLYGON ((-71 42, -70 42, -70 43, -71 43, -71 42))"
    assert rows["w3c"].wkt == "POINT (99.25 12.5)"
    # GML inside georss:where is lat-lon order; driver swaps like GDAL
    assert rows["where"].wkt == "POINT (-71.92 45.256)"
    assert rows["none"].wkt is None
