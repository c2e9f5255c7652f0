"""Uniform ST_Read option contract across every source format
(st_read.cpp:681-682: spatial_filter_box + columns): bbox= keeps features
whose EXTENT intersects the window, columns= projects attributes with the
geometry column always kept. One matrix over the writer-backed formats
plus read-only fixtures (FlatGeobuf against the reference's real file).

Native pushdown evidence is asserted separately: GeoParquet bbox conjuncts
reach the scan's PushedFilters; the FlatGeobuf R-tree prunes candidate
features before the uniform recheck."""

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources import st_read, st_write

# six points on the diagonal: (0,0), (5,5), ..., (25,25)
# bbox (4,4,16,16) keeps exactly (5,5), (10,10), (15,15)
BBOX = (4.0, 4.0, 16.0, 16.0)
EXPECT_X = {5.0, 10.0, 15.0}


@pytest.fixture(scope="module")
def diag(spark):
    return spark.createDataFrame(
        [(i, f"t{i}", float(5 * (i - 1))) for i in range(1, 7)],
        "id long, title string, v double",
    ).selectExpr("id", "title", "ST_Point(v, v) AS geom")


# (format, filename, writer kwargs, attribute column to project)
MATRIX = [
    ("geojson", "d.geojson", {}, "id"),
    ("wkt_csv", "d.csv", {}, "id"),
    ("shapefile", "d.shp", {}, "id"),
    ("geopackage", "d.gpkg", {}, "id"),
    ("kml", "d.kml", {}, "name"),
    ("gml", "d.gml", {}, "id"),
    ("mapinfo", "d.mif", {}, "id"),
    ("mapinfo_tab", "d.tab", {}, "id"),
    ("filegdb", "d.gdb", {"geometry_type": "POINT"}, "id"),
    ("arrow", "d.arrow", {}, "id"),
    ("georss", "d.rss", {}, "title"),
    ("pgdump", "d.sql", {}, "id"),
    ("spatialite", "d.sqlite", {}, "id"),
    ("geoparquet", "d.parquet", {}, "id"),
    ("dxf", "d.dxf", {}, "layer"),
    ("esrijson", "d.esrijson", {}, "id"),
    ("netcdf", "d.nc", {}, "id"),
    ("mvt", "d.mvt", {}, "id"),
    ("geoparquet", "d_file.parquet", {"file": True}, "id"),
    ("geojsonseq", "d.geojsonl", {}, "id"),
    ("sosi", "d.sos", {}, "id"),
    ("interlis", "d.itf", {}, "tid"),
    ("sdts", "d_sdts", {}, "rcid"),
]


def _xs(df):
    gcol = next(c for c in ("geom", "geometry", "wkb_geometry") if c in df.columns)
    return {
        round(r.x, 6)
        for r in df.selectExpr(f"ST_X({gcol}) AS x").collect()
    }


@pytest.mark.parametrize("fmt,fname,wkw,attr", MATRIX, ids=[m[0] for m in MATRIX])
def test_bbox_and_columns_contract(spark, diag, tmp_path, fmt, fname, wkw, attr):
    path = str(tmp_path / fname)
    df = diag
    if fmt == "kml":
        # KML features carry name/description; map title -> name
        df = diag.selectExpr("title AS name", "id", "geom")
    st_write(df, path, format=fmt, **wkw)

    full = st_read(spark, path, format=fmt)
    assert full.count() == 6

    # bbox=: extent-intersects the window
    win = st_read(spark, path, format=fmt, bbox=BBOX)
    assert _xs(win) == EXPECT_X, fmt
    # spatial_filter_box= alias
    win2 = st_read(spark, path, format=fmt, spatial_filter_box=BBOX)
    assert win2.count() == 3

    # columns=: projected attribute + geometry, nothing else
    proj = st_read(spark, path, format=fmt, columns=[attr])
    gcol = next(c for c in ("geom", "geometry", "wkb_geometry") if c in proj.columns)
    assert set(proj.columns) == {attr, gcol}, fmt
    assert proj.count() == 6

    # both together
    both = st_read(spark, path, format=fmt, bbox=BBOX, columns=[attr])
    assert both.count() == 3
    assert set(both.columns) == {attr, gcol}

    # unknown column: loud failure
    with pytest.raises(ValueError, match="columns="):
        st_read(spark, path, format=fmt, columns=["no_such_col"])


def test_xlsx_is_attribute_only(spark, diag, tmp_path):
    """XLSX (like GDAL's driver) carries no geometry: columns= works,
    bbox= fails loudly instead of silently returning everything."""
    path = str(tmp_path / "d.xlsx")
    st_write(diag.drop("geom"), path, format="xlsx")
    back = st_read(spark, path, format="xlsx", columns=["id"])
    assert back.columns == ["id"] and back.count() == 6
    with pytest.raises(ValueError, match="geometry column"):
        st_read(spark, path, format="xlsx", bbox=BBOX).count()


def test_geoparquet_bbox_reaches_pushed_filters(spark, diag, tmp_path):
    """Native lane: on a clustered layout the bbox= conjuncts land in the
    parquet scan's PushedFilters (row-group skipping), and the plan keeps
    them ahead of the recheck."""
    from duckdb_spatial_spark.plans.pruning import write_geo_parquet

    path = str(tmp_path / "clustered")
    write_geo_parquet(diag, path, num_partitions=2)
    win = st_read(spark, path, format="geoparquet", bbox=BBOX)
    assert _xs(win) == EXPECT_X
    plan = win._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "bbox_min_x" in plan.split("PushedFilters", 1)[1][:400]


def test_flatgeobuf_rtree_prunes_before_recheck(spark):
    """Native lane: the .fgb packed R-tree restricts the scan to candidate
    features; the uniform recheck then only normalizes semantics. Compare
    against the full-scan + filter answer on the reference's real file."""
    import os

    fgb = "/root/reference/test/data/amsterdam_roads.fgb"
    if not os.path.exists(fgb):
        pytest.skip("reference fgb fixture not present")
    bbox = (554000.0, 6858000.0, 556000.0, 6860000.0)  # web-mercator meters
    full = st_read(spark, fgb)
    pruned = st_read(spark, fgb, bbox=bbox)
    n_pruned = pruned.count()
    # ground truth: generic extent filter over the full scan
    from duckdb_spatial_spark.sources import _apply_read_filters

    truth = _apply_read_filters(full, bbox, None).count()
    assert n_pruned == truth
    assert 0 < n_pruned < full.count()


def test_geojsonseq_gzip(spark, diag, tmp_path):
    """A gzipped .geojsonl single file reads through st_read: Spark's text
    source decompresses, schema inference gunzips its sample."""
    import gzip

    from duckdb_spatial_spark.sources import read_geojsonseq, st_write

    plain = str(tmp_path / "d.geojsonl")
    st_write(diag, plain, format="geojsonseq")
    lines = []
    import glob as _g

    for part in sorted(_g.glob(plain + "/part-*")):
        if part.endswith(".crc"):
            continue
        with open(part, "r", encoding="utf-8") as f:
            lines += [ln for ln in f.read().splitlines() if ln]
    gz = str(tmp_path / "one.geojsonl.gz")
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    back = read_geojsonseq(spark, gz)
    assert back.count() == 6
    assert _xs(st_read(spark, gz, bbox=BBOX)) == EXPECT_X
