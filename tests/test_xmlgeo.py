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
