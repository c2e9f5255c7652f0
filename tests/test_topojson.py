"""TopoJSON reader: quantized delta-encoded arcs, shared-arc reversal
(~i complement), object/layer selection, property surfacing."""

import json

from duckdb_spatial_spark.sources import st_read
from duckdb_spatial_spark.sources.topojson import read_topojson

TOPO = {
    "type": "Topology",
    "transform": {"scale": [0.5, 0.5], "translate": [10, 20]},
    "objects": {
        "zones": {"type": "GeometryCollection", "geometries": [
            {"type": "Polygon", "arcs": [[0, 1]], "properties": {"name": "left"}},
            {"type": "Polygon", "arcs": [[2, -1]], "properties": {"name": "right"}},
        ]},
        "spots": {"type": "GeometryCollection", "geometries": [
            {"type": "Point", "coordinates": [2, 2], "id": "c"},
        ]},
    },
    "arcs": [
        [[4, 0], [0, 4]],                       # shared edge
        [[4, 4], [-4, 0], [0, -4], [4, 0]],
        [[4, 0], [4, 0], [0, 4], [-4, 0]],
    ],
}


def test_topojson_shared_arcs(spark, tmp_path):
    p = str(tmp_path / "z.topojson")
    with open(p, "w") as f:
        json.dump(TOPO, f)
    df = st_read(spark, p)  # sniffs .topojson
    rows = {(r.layer, r.name): r for r in df.collect()}
    wkts = {
        k: v for k, v in (
            (r[0], w.wkt) for r, w in zip(
                rows.items(),
                df.selectExpr("layer", "name", "ST_AsText(geom) AS wkt").collect(),
            )
        )
    }
    z = df.filter("layer = 'zones'").selectExpr("name", "ST_AsText(geom) AS wkt").collect()
    got = {r.name: r.wkt for r in z}
    # transform: x*0.5+10, y*0.5+20 over the 2x2-quantized squares
    assert got["left"] == "POLYGON ((12 20, 12 22, 10 22, 10 20, 12 20))"
    assert got["right"] == "POLYGON ((12 20, 14 20, 14 22, 12 22, 12 20))"
    pts = df.filter("layer = 'spots'").selectExpr("id", "ST_AsText(geom) AS wkt").collect()
    assert pts[0].id == "c" and pts[0].wkt == "POINT (11 21)"


def test_topojson_layer_select(spark, tmp_path):
    p = str(tmp_path / "z.topojson")
    with open(p, "w") as f:
        json.dump(TOPO, f)
    only = read_topojson(spark, p, layer="zones")
    assert only.count() == 2 and {r.layer for r in only.collect()} == {"zones"}
