"""OSM PBF reader: fixed 8-column schema (reference st_read_osm.cpp:39-96)."""

from pyspark.sql import functions as F

from duckdb_spatial_spark.sources.osm import read_osm, write_osm_fixture


def test_osm_roundtrip(spark, tmp_path):
    pbf = str(tmp_path / "tiny.osm.pbf")
    nodes = [
        (1, 52.37, 4.90, {"name": "dam", "tourism": "attraction"}),
        (2, 52.38, 4.91, None),
        (3, 52.39, 4.92, {"amenity": "cafe"}),
    ]
    ways = [(10, [1, 2, 3], {"highway": "residential"})]
    rels = [(20, [(10, "outer", "way"), (1, "admin_centre", "node")], {"type": "multipolygon"})]
    write_osm_fixture(pbf, nodes, ways, rels)

    df = read_osm(spark, pbf)
    assert df.columns == ["kind", "id", "tags", "refs", "lat", "lon", "ref_roles", "ref_types"]
    rows = {(r.kind, r.id): r for r in df.collect()}
    assert len(rows) == 5

    n1 = rows[("node", 1)]
    assert abs(n1.lat - 52.37) < 1e-7 and abs(n1.lon - 4.90) < 1e-7
    assert n1.tags["name"] == "dam"
    assert rows[("node", 2)].tags is None

    w = rows[("way", 10)]
    assert w.refs == [1, 2, 3] and w.tags["highway"] == "residential"
    assert w.lat is None

    r = rows[("relation", 20)]
    assert r.refs == [10, 1]
    assert r.ref_roles == ["outer", "admin_centre"]
    assert r.ref_types == ["way", "node"]


def test_osm_ways_to_lines(spark, tmp_path):
    """The standard OSM pipeline: join way refs to node coords -> linestrings."""
    pbf = str(tmp_path / "lines.osm.pbf")
    nodes = [(i, 50.0 + i * 0.01, 4.0 + i * 0.01, None) for i in range(1, 6)]
    ways = [(100, [1, 2, 3], {"highway": "a"}), (101, [3, 4, 5], {"highway": "b"})]
    write_osm_fixture(pbf, nodes, ways)
    osm = read_osm(spark, pbf)
    nodes_df = osm.filter("kind = 'node'").select("id", "lat", "lon")
    ways_df = osm.filter("kind = 'way'").select(
        "id", F.posexplode("refs").alias("seq", "ref")
    )
    joined = (
        ways_df.join(nodes_df.withColumnRenamed("id", "ref"), "ref")
        .groupBy(ways_df.id)
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {r.id: r.n for r in joined} == {100: 3, 101: 3}
