"""WFS remote-service lane (sources/wfs.py): request construction pinned
offline (no network in this container — the postgis/jdbc_spatial test
split) and the paging/stop logic driven against canned GeoJSON pages
through the injectable fetch."""

import json

import pytest

from duckdb_spatial_spark.sources.wfs import (
    read_wfs,
    wfs_getcapabilities_url,
    wfs_getfeature_url,
)


def test_request_urls_pinned():
    assert wfs_getcapabilities_url("https://h/geoserver/wfs") == (
        "https://h/geoserver/wfs?service=WFS&version=2.0.0"
        "&request=GetCapabilities"
    )
    u = wfs_getfeature_url(
        "https://h/wfs", "ns:roads", bbox=(1, 2, 3, 4),
        srs="EPSG:4326", count=500, start_index=1000,
    )
    assert u == (
        "https://h/wfs?service=WFS&version=2.0.0&request=GetFeature"
        "&typeNames=ns:roads&outputFormat=application%2Fjson"
        "&bbox=1.0,2.0,3.0,4.0,EPSG:4326&srsName=EPSG:4326"
        "&count=500&startIndex=1000"
    )
    # WFS 1.1: typeName/maxFeatures, no startIndex
    u11 = wfs_getfeature_url(
        "https://h/wfs?foo=1", "roads", version="1.1.0", count=9,
        start_index=50,
    )
    assert "typeName=roads" in u11 and "maxFeatures=9" in u11
    assert "startIndex" not in u11 and u11.startswith("https://h/wfs?foo=1&")
    # cql filter is percent-encoded
    assert "cql_filter=kind%3D%27a%27" in wfs_getfeature_url(
        "https://h/wfs", "t", cql_filter="kind='a'"
    )


def _page(ids, matched):
    return json.dumps({
        "type": "FeatureCollection",
        "numberMatched": matched,
        "features": [
            {"type": "Feature", "id": i,
             "geometry": {"type": "Point", "coordinates": [float(i), 2.0]},
             "properties": {"fid": i, "kind": "r"}}
            for i in ids
        ],
    }).encode()


def test_paging_and_parse(spark):
    calls = []

    def fetch(url):
        calls.append(url)
        if "startIndex=0" in url:
            return _page(range(0, 3), 5)
        return _page(range(3, 5), 5)

    df = read_wfs(spark, "https://h/wfs", "ns:roads", page_size=3, fetch=fetch)
    rows = df.collect()
    assert len(rows) == 5 and len(calls) == 2
    assert "count=3" in calls[0] and "startIndex=3" in calls[1]
    cols = set(df.columns)
    assert "geom" in cols or "geometry" in cols
    assert {r["fid"] for r in rows} == set(range(5))


def test_max_features_guard_and_empty(spark):
    def fetch(url):
        return _page(range(0, 4), 1000)

    df = read_wfs(spark, "https://h/wfs", "t", page_size=4, max_features=4,
                  fetch=fetch)
    assert df.count() == 4  # stopped by the guard after one page

    def fetch_empty(url):
        return _page([], 0)

    empty = read_wfs(spark, "https://h/wfs", "t", fetch=fetch_empty)
    assert empty.count() == 0


def test_bbox_reaches_the_server(spark):
    seen = {}

    def fetch(url):
        seen["url"] = url
        return _page([1], 1)

    read_wfs(spark, "https://h/wfs", "t", bbox=(10, 20, 30, 40),
             fetch=fetch).count()
    assert "bbox=10.0,20.0,30.0,40.0" in seen["url"]


def test_st_read_wfs_path_dispatch(spark):
    from duckdb_spatial_spark.sources import st_read

    def fetch(url):
        assert url.startswith("https://h/wfs?")
        return _page([7, 8], 2)

    df = st_read(spark, "WFS:https://h/wfs", layer="ns:t", fetch=fetch)
    assert df.count() == 2
    with pytest.raises(ValueError, match="feature type"):
        st_read(spark, "WFS:https://h/wfs")
    with pytest.raises(ValueError, match="allowed_drivers"):
        st_read(spark, "WFS:https://h/wfs", layer="t",
                allowed_drivers=["GPKG"])
