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
