"""ST_Read named-parameter parity (sources/__init__.py r12): the GDAL
option quartet open_options / allowed_drivers / sibling_files /
sequential_layer_scan now has a uniform surface (st_read.cpp:684-692),
plus the stale-datasource-registration regression (fixed-name python
sources handed a second read the previous read's reader)."""

import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import udfs
from duckdb_spatial_spark.sources import st_read, write_gpkg, write_shapefile


@pytest.fixture(scope="module")
def fixtures(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("st_read_opts"))
    g = spark.range(20).select(
        F.col("id"), udfs.st_point(F.col("id") * 1.0, F.col("id") * 2.0).alias("geom")
    )
    gpkg = os.path.join(d, "two.gpkg")
    write_gpkg(g.filter("id < 10"), gpkg, layer="a")
    con = sqlite3.connect(gpkg)
    con.execute("CREATE TABLE b AS SELECT * FROM a WHERE fid <= 5")
    con.execute(
        "INSERT INTO gpkg_contents SELECT 'b', data_type, 'b', description,"
        " last_change, min_x, min_y, max_x, max_y, srs_id"
        " FROM gpkg_contents WHERE table_name='a'"
    )
    con.execute(
        "INSERT INTO gpkg_geometry_columns SELECT 'b', column_name,"
        " geometry_type_name, srs_id, z, m"
        " FROM gpkg_geometry_columns WHERE table_name='a'"
    )
    con.commit()
    con.close()
    shp = os.path.join(d, "pts.shp")
    write_shapefile(g.withColumn("tag", F.lit("x")), shp)
    return {"gpkg": gpkg, "shp": shp, "dir": d}


def test_sequential_layer_scan_unions_all_layers(spark, fixtures):
    assert st_read(spark, fixtures["gpkg"], sequential_layer_scan=True).count() == 15
    # layer= still wins (no scan-all)
    assert st_read(spark, fixtures["gpkg"], layer="a",
                   sequential_layer_scan=True).count() == 10


def test_allowed_drivers(spark, fixtures):
    with pytest.raises(ValueError, match="not in allowed_drivers"):
        st_read(spark, fixtures["gpkg"], allowed_drivers=["GeoJSON"])
    # GDAL driver short names and our format keys both accepted
    assert st_read(spark, fixtures["gpkg"], allowed_drivers=["GPKG"],
                   layer="a").count() == 10
    assert st_read(spark, fixtures["shp"],
                   allowed_drivers=["ESRI Shapefile"]).count() == 20


def test_open_options_gdal_string_form(spark, fixtures):
    assert st_read(spark, fixtures["gpkg"], open_options=["LAYER=b"]).count() == 5
    # explicit kwarg wins over open_options on conflict
    assert st_read(spark, fixtures["gpkg"], open_options=["LAYER=b"],
                   layer="a").count() == 10


def test_sibling_files_restricts_sidecars(spark, fixtures):
    shp = fixtures["shp"]
    full = st_read(spark, shp)
    assert len(full.columns) == 3 and full.count() == 20
    # .dbf not in the sibling list -> geometry-only read, same rows
    noattr = st_read(spark, shp, sibling_files=[shp.replace(".shp", ".shx")])
    assert noattr.columns == ["geom"] and noattr.count() == 20
    withattr = st_read(spark, shp,
                       sibling_files=[shp.replace(".shp", ".dbf")])
    assert len(withattr.columns) == 3 and withattr.count() == 20


def test_no_stale_datasource_between_schema_changing_reads(spark, fixtures):
    """Regression: python data sources resolve BY NAME; a fixed name with
    fresh closure state handed read #2 read #1's reader, so two reads of
    the same format with different schemas crashed (or worse, returned
    the wrong file). Names are unique per call now."""
    shp = fixtures["shp"]
    a = st_read(spark, shp)  # 3 columns
    b = st_read(spark, shp, sibling_files=[])  # 1 column (no sidecars)
    c = st_read(spark, shp)  # 3 columns again
    assert len(a.columns) == 3 and a.count() == 20
    assert b.columns == ["geom"] and b.count() == 20
    assert len(c.columns) == 3 and c.count() == 20


def test_max_batch_size_and_keep_wkb(spark, fixtures):
    """r13: the last two ST_Read named params (st_read.cpp:275-287).
    max_batch_size must be positive and, on GeoPackage, caps each scan
    partition's rowid span; keep_wkb is accepted (GEOMETRY here IS raw
    WKB, so the result is byte-identical either way)."""
    with pytest.raises(ValueError, match="must be positive"):
        st_read(spark, fixtures["gpkg"], max_batch_size=0)
    with pytest.raises(ValueError, match="must be positive"):
        st_read(spark, fixtures["gpkg"], max_batch_size=-3)

    base = st_read(spark, fixtures["gpkg"], layer="a")
    capped = st_read(spark, fixtures["gpkg"], layer="a", max_batch_size=3)
    assert capped.count() == base.count() == 10
    # 10 rows at <=3 rows per batch -> at least 4 scan partitions
    assert capped.rdd.getNumPartitions() >= 4
    assert sorted(r.geom for r in capped.collect()) == sorted(
        r.geom for r in base.collect()
    )

    kept = st_read(spark, fixtures["gpkg"], layer="a", keep_wkb=True)
    assert sorted(r.geom for r in kept.collect()) == sorted(
        r.geom for r in base.collect()
    )
    with pytest.raises(ValueError, match="keep_wkb"):
        st_read(spark, fixtures["gpkg"], keep_wkb="yes")
