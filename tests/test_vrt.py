"""OGR VRT virtual-layer source (sources/vrt.py): geometry derivation
(PointFromColumns / WKT / WKB / source passthrough), Field projection,
SrcLayer, layer selection, LayerSRS -> crs tag, st_read dispatch."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import register_all
from duckdb_spatial_spark.functions.crs import geom_crs
from duckdb_spatial_spark.sources import st_read, vrt_layers
from duckdb_spatial_spark.sources.vrt import read_vrt


@pytest.fixture()
def csvdir(spark, tmp_path):
    p = str(tmp_path / "pts_csv")
    spark.createDataFrame(
        [(1, 10.0, 20.0, "POINT (1 2)"), (2, 30.0, 40.0, "POINT (3 4)")],
        "id long, px double, py double, wkt string",
    ).coalesce(1).write.option("header", True).csv(p)
    return p


def _write_vrt(tmp_path, body):
    p = str(tmp_path / "t.vrt")
    with open(p, "w", encoding="utf-8") as f:
        f.write(f"<OGRVRTDataSource>{body}</OGRVRTDataSource>")
    return p


def test_point_from_columns_and_srs(spark, tmp_path, csvdir):
    register_all(spark)
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="pts">
        <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
        <GeometryField encoding="PointFromColumns" x="px" y="py"/>
        <LayerSRS>EPSG:4326</LayerSRS>
      </OGRVRTLayer>""")
    df = st_read(spark, vrt)
    assert geom_crs(df) == "EPSG:4326"
    rows = {r.id: r for r in df.selectExpr(
        "id", "ST_X(geom) AS x", "ST_Y(geom) AS y").collect()}
    assert (rows[1].x, rows[1].y) == (10.0, 20.0)
    assert (rows[2].x, rows[2].y) == (30.0, 40.0)


def test_wkt_encoding_and_field_projection(spark, tmp_path, csvdir):
    register_all(spark)
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="w">
        <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
        <GeometryField encoding="WKT" field="wkt"/>
        <Field name="feature_id" src="id"/>
      </OGRVRTLayer>""")
    df = read_vrt(spark, vrt)
    assert df.columns == ["feature_id", "geom"]
    rows = {int(r.feature_id): r for r in df.selectExpr(
        "feature_id", "ST_AsText(geom) AS t").collect()}
    assert rows[1].t == "POINT (1 2)" and rows[2].t == "POINT (3 4)"


def test_src_layer_and_selection(spark, tmp_path):
    register_all(spark)
    from duckdb_spatial_spark.sources.gpkg import write_gpkg

    gp = str(tmp_path / "two.gpkg")
    df = spark.createDataFrame(
        [(1, -0.13, 51.5)], "id long, lon double, lat double"
    ).selectExpr("id", "ST_AsWKB(ST_Point(lon, lat)) AS geom")
    write_gpkg(df, gp, layer="a", srs_id=4326)
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="first"><SrcDataSource relativeToVRT="0">{gp}</SrcDataSource>
        <SrcLayer>a</SrcLayer></OGRVRTLayer>
      <OGRVRTLayer name="second"><SrcDataSource relativeToVRT="0">{gp}</SrcDataSource>
        <SrcLayer>a</SrcLayer>
        <LayerSRS>EPSG:27700</LayerSRS></OGRVRTLayer>""")
    assert vrt_layers(vrt) == ["first", "second"]
    assert st_read(spark, vrt).count() == 1
    # geometry passes through untouched; gpkg's own srs tag survives
    assert geom_crs(st_read(spark, vrt)) == "EPSG:4326"
    # LayerSRS on the second layer OVERRIDES the source tag
    assert geom_crs(st_read(spark, vrt, layer="second")) == "EPSG:27700"
    with pytest.raises(ValueError, match="not found"):
        read_vrt(spark, vrt, layer="nope")


def test_relative_src_and_errors(spark, tmp_path, csvdir, monkeypatch):
    register_all(spark)
    # relativeToVRT="1": SrcDataSource resolves against the .vrt's directory
    rel = os.path.relpath(csvdir, str(tmp_path))
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="pts">
        <SrcDataSource relativeToVRT="1">{rel}</SrcDataSource>
        <GeometryField encoding="PointFromColumns" x="px" y="py"/>
      </OGRVRTLayer>""")
    assert read_vrt(spark, vrt).count() == 2
    # default (attribute omitted) is OGR's relativeToVRT="0": CWD-relative
    vrt0 = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="pts"><SrcDataSource>{rel}</SrcDataSource>
        <GeometryField encoding="PointFromColumns" x="px" y="py"/>
      </OGRVRTLayer>""")
    monkeypatch.chdir(str(tmp_path))
    assert read_vrt(spark, vrt0).count() == 2
    bad_enc = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="x"><SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
        <GeometryField encoding="Shape"/></OGRVRTLayer>""")
    with pytest.raises(ValueError, match="encoding"):
        read_vrt(spark, bad_enc)
    union = _write_vrt(tmp_path, "<OGRVRTUnionLayer name='u'/>")
    with pytest.raises(ValueError, match="no member layers"):
        read_vrt(spark, union)


def test_direct_encoding_renames_geometry(spark, tmp_path):
    register_all(spark)
    pq = str(tmp_path / "direct_pq")
    spark.createDataFrame([(1, -0.1, 51.5)], "id long, lon double, lat double") \
        .selectExpr("id", "ST_AsWKB(ST_Point(lon, lat)) AS shape") \
        .write.parquet(pq)
    # GDAL's default encoding is Direct: the named field IS the geometry
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="d"><SrcDataSource relativeToVRT="0">{pq}</SrcDataSource>
        <GeometryField field="shape"/></OGRVRTLayer>""")
    df = read_vrt(spark, vrt)
    assert "geom" in df.columns and "shape" not in df.columns
    assert df.selectExpr("ST_AsText(geom) AS t").first().t == "POINT (-0.1 51.5)"


def test_union_layer(spark, tmp_path, csvdir):
    register_all(spark)
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTUnionLayer name="u">
        <OGRVRTLayer name="a">
          <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
          <GeometryField encoding="PointFromColumns" x="px" y="py"/>
        </OGRVRTLayer>
        <OGRVRTLayer name="b">
          <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
          <GeometryField encoding="WKT" field="wkt"/>
          <Field name="id" src="id"/>
        </OGRVRTLayer>
      </OGRVRTUnionLayer>""")
    assert vrt_layers(vrt) == ["u"]
    df = read_vrt(spark, vrt)
    # member a contributes px/py columns, member b only id+geom
    assert df.count() == 4
    assert df.where(F.col("px").isNull()).count() == 2


def test_src_sql(spark, tmp_path, csvdir):
    register_all(spark)
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="s">
        <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
        <SrcSQL>SELECT id, px, py FROM pts WHERE id = 2</SrcSQL>
        <GeometryField encoding="PointFromColumns" x="px" y="py"/>
      </OGRVRTLayer>""")
    df = read_vrt(spark, vrt)
    rows = df.selectExpr("id", "ST_X(geom) AS x").collect()
    assert len(rows) == 1 and rows[0].id == 2 and rows[0].x == 30.0


def test_field_type_override(spark, tmp_path, csvdir):
    register_all(spark)
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="t">
        <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
        <GeometryField encoding="PointFromColumns" x="px" y="py"/>
        <Field name="fid" src="id" type="Integer"/>
        <Field name="xs" src="px" type="String"/>
      </OGRVRTLayer>""")
    df = read_vrt(spark, vrt)
    types = dict(df.dtypes)
    assert types["fid"] == "int" and types["xs"] == "string"
    bad = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="t">
        <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
        <Field name="fid" src="id" type="Blob"/>
      </OGRVRTLayer>""")
    with pytest.raises(ValueError, match="Field type"):
        read_vrt(spark, bad)


def test_warped_layer(spark, tmp_path, csvdir):
    register_all(spark)
    import math

    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTWarpedLayer name="w">
        <OGRVRTLayer name="pts">
          <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
          <GeometryField encoding="WKT" field="wkt"/>
          <LayerSRS>EPSG:4326</LayerSRS>
        </OGRVRTLayer>
        <TargetSRS>EPSG:3857</TargetSRS>
      </OGRVRTWarpedLayer>""")
    df = read_vrt(spark, vrt)
    assert geom_crs(df) == "EPSG:3857"
    rows = {r.id: r for r in df.selectExpr(
        "id", "ST_X(geom) AS x", "ST_Y(geom) AS y").collect()}
    a = 6378137.0
    assert abs(rows[1].x - math.radians(1.0) * a) < 1e-6
    assert abs(rows[1].y - a * math.log(math.tan(math.pi / 4 + math.radians(2.0) / 2))) < 1e-6
    # member without a CRS tag and no SrcSRS refuses loudly
    bad = _write_vrt(tmp_path, f"""
      <OGRVRTWarpedLayer name="w">
        <OGRVRTLayer name="pts">
          <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
          <GeometryField encoding="WKT" field="wkt"/>
        </OGRVRTLayer>
        <TargetSRS>EPSG:3857</TargetSRS>
      </OGRVRTWarpedLayer>""")
    with pytest.raises(ValueError, match="SrcSRS"):
        read_vrt(spark, bad)


def test_src_sql_preserves_user_temp_view(spark, tmp_path, csvdir):
    """A pre-existing session temp view whose name collides with a SrcSQL
    table reference must survive the evaluation (r14 advisory: the old
    code clobbered and then DROPPED it)."""
    register_all(spark)
    spark.createDataFrame([(999, "mine")], "id long, tag string") \
        .createOrReplaceTempView("pts")
    vrt = _write_vrt(tmp_path, f"""
      <OGRVRTLayer name="s">
        <SrcDataSource relativeToVRT="0">{csvdir}</SrcDataSource>
        <SrcSQL>SELECT id, px, py FROM pts WHERE id = 2</SrcSQL>
        <GeometryField encoding="PointFromColumns" x="px" y="py"/>
      </OGRVRTLayer>""")
    try:
        df = read_vrt(spark, vrt)
        assert df.count() == 1  # SrcSQL saw the SOURCE, not the user view
        back = spark.table("pts").collect()  # user view restored
        assert len(back) == 1 and back[0].tag == "mine"
    finally:
        spark.catalog.dropTempView("pts")


def test_repeated_reads_share_one_datasource(spark, tmp_path, csvdir):
    """read_dgn/read_gmt/read_s57 in a loop must not grow the session's
    Python data-source registry (r14 advisory): the shared source is
    registered under ONE fixed name with per-load options."""
    from duckdb_spatial_spark.sources.dgn import read_dgn, write_dgn

    df = spark.createDataFrame([(1,)], "id long").selectExpr(
        "ST_AsWKB(ST_MakeLine(ARRAY(ST_Point(0.0, 0.0),"
        " ST_Point(1.0, 1.0)))) AS geom")
    p = str(tmp_path / "loop.dgn")
    write_dgn(df, p)
    first = read_dgn(spark, p)
    assert first.count() == 1
    for _ in range(3):
        assert read_dgn(spark, p).count() == 1
    # the FIRST DataFrame still re-executes correctly after later
    # registrations (the old fixed-name+closure shape returned the
    # stale reader here)
    assert first.count() == 1
