"""VFS shims (sources/vfs.py): /vsizip/ + bang-zip + gzip member reads —
the analog of the reference's GDAL VFS bridge (test/sql/gdal/st_read_vsi.test)."""

import gzip
import json
import os
import zipfile

import pytest

from duckdb_spatial_spark.sources import st_read
from duckdb_spatial_spark.sources.vfs import localize


@pytest.fixture(scope="module")
def archive(tmp_path_factory, spark):
    d = tmp_path_factory.mktemp("vfs")
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"name": f"p{i}"},
             "geometry": {"type": "Point", "coordinates": [float(i), float(2 * i)]}}
            for i in range(5)
        ],
    }
    gj = d / "pts.geojson"
    gj.write_text(json.dumps(fc))
    other = d / "other.txt"
    other.write_text("not geo")
    # a shapefile with sidecars, via our own writer
    from duckdb_spatial_spark.sources.shapefile import write_shapefile

    df = spark.sql(
        "SELECT CAST(id AS INT) AS id, ST_Point(CAST(id AS DOUBLE), 0.0D) AS geom FROM range(4)"
    )
    shp_dir = d / "shp"
    os.makedirs(shp_dir)
    write_shapefile(df, str(shp_dir / "pts.shp"))
    z = d / "data.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(gj, "pts.geojson")
        zf.write(other, "other.txt")
        for fn in os.listdir(shp_dir):
            zf.write(shp_dir / fn, f"shp/{fn}")
    gz = d / "pts.geojson.gz"
    gz.write_bytes(gzip.compress(gj.read_bytes()))
    return {"zip": str(z), "gz": str(gz)}


def test_vsizip_member(spark, archive):
    df = st_read(spark, f"/vsizip/{archive['zip']}/pts.geojson")
    assert df.count() == 5 and "geom" in df.columns


def test_bang_member_and_glob(spark, archive):
    assert st_read(spark, f"{archive['zip']}!pts.geojson").count() == 5
    assert st_read(spark, f"{archive['zip']}!*.geojson").count() == 5


def test_whole_zip_dispatches_geo_members(spark, archive):
    # archive holds geojson + txt + shapefile: sniffs the first geo format
    # and reads only members of that format
    df = st_read(spark, archive["zip"], format="geojson")
    assert df.count() == 5


def test_zip_shapefile_with_sidecars(spark, archive):
    df = st_read(spark, f"{archive['zip']}!shp/pts.shp")
    assert df.count() == 4 and "geom" in df.columns


def test_gzip_single_file(spark, archive):
    df = st_read(spark, archive["gz"][: -len(".gz")] + ".gz")
    assert df.count() == 5


def test_localize_non_vfs_passthrough():
    assert localize("/some/plain/path.geojson") is None


def test_missing_member_raises(archive):
    with pytest.raises(FileNotFoundError):
        localize(f"{archive['zip']}!nope.geojson")
