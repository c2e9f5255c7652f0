"""FlatGeobuf reader against the reference's real amsterdam_roads.fgb,
cross-validated with its independent GeoJSON extract."""

import gzip
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions import udfs
from duckdb_spatial_spark.sources.flatgeobuf import iter_features, read_flatgeobuf, read_header

FGB = "/root/reference/test/data/amsterdam_roads.fgb"
GJ50 = "/root/reference/test/data/amsterdam_roads_50.geojson.gz"


@pytest.mark.skipif(not os.path.exists(FGB), reason="reference data not present")
def test_header_and_full_scan(spark):
    h = read_header(FGB)
    assert h["name"] == "roads" and h["features_count"] == 21648
    df = read_flatgeobuf(spark, FGB)
    assert df.columns == ["kind", "geom"]
    assert df.count() == 21648
    kinds = {r.kind for r in df.select("kind").distinct().collect()}
    assert "service" in kinds
    # spatial pipeline over it: total length via engine
    total = df.select(F.sum(udfs.st_length(F.col("geom"))).alias("s")).collect()[0].s
    assert total > 1e6  # ~4000 km of roads in projected meters


@pytest.mark.skipif(not os.path.exists(FGB), reason="reference data not present")
def test_first50_match_geojson_extract():
    gfeats = json.loads(gzip.open(GJ50).read())["features"]
    mine = []
    for i, fe in enumerate(iter_features(FGB)):
        mine.append(fe)
        if i >= len(gfeats) - 1:
            break
    for (props, geom), gf in zip(mine, gfeats):
        assert props.get("kind") == gf["properties"].get("kind")
        assert geom.type_name == gf["geometry"]["type"].upper()
        assert np.allclose(geom.data, np.asarray(gf["geometry"]["coordinates"]), atol=1e-9)


@pytest.mark.skipif(not os.path.exists(FGB), reason="reference data not present")
def test_rtree_bbox_pushdown(spark):
    """The file's packed Hilbert R-tree prunes to the window's features."""
    W = (554000.0, 6858000.0, 556000.0, 6860000.0)
    env = udfs.st_makeenvelope(F.lit(W[0]), F.lit(W[1]), F.lit(W[2]), F.lit(W[3]))
    full = read_flatgeobuf(spark, FGB)
    n_full = full.filter(udfs.st_intersects(F.col("geom"), env)).count()
    idx = read_flatgeobuf(spark, FGB, bbox=W)
    n_cand = idx.count()
    n_idx = idx.filter(udfs.st_intersects(F.col("geom"), env)).count()
    assert n_idx == n_full > 0
    assert n_cand < 100  # of 21648: the index actually pruned
