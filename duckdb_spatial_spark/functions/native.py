"""Columnar native-type kernels: pure Column expressions, zero Python cost.

Mirrors the reference's columnar fast path — its POINT_2D / BOX_2D /
LINESTRING_2D / POLYGON_2D types are structs/lists over double vectors
(``spatial/src/spatial/core/types.cpp:11-62``), giving per-column stats and
serialization-free execution (docs/internals.md "Multi-tiered Geometry Type
System"). Spark struct/array columns are the exact analog: every function
here stays inside WholeStageCodegen, so filters on them push down to
Parquet row-group stats — this is the engine's 100-TB hot path. Spark types:

  POINT_2D       struct<x: double, y: double>
  BOX_2D         struct<min_x: double, min_y: double, max_x: double, max_y: double>
  LINESTRING_2D  array<struct<x: double, y: double>>
  POLYGON_2D     array<array<struct<x: double, y: double>>>
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def point_2d(x, y) -> Column:
    """ST_Point2D (reference types.cpp:11-15)."""
    return F.struct(F.col(x).alias("x") if isinstance(x, str) else x.alias("x"),
                    F.col(y).alias("y") if isinstance(y, str) else y.alias("y"))


def box_2d(min_x, min_y, max_x, max_y) -> Column:
    cols = []
    for name, c in zip(("min_x", "min_y", "max_x", "max_y"), (min_x, min_y, max_x, max_y)):
        c = F.col(c) if isinstance(c, str) else (F.lit(c) if not isinstance(c, Column) else c)
        cols.append(c.alias(name))
    return F.struct(*cols)


# ---------------------------------------------------------------- accessors
def st_x(pt) -> Column:
    return (F.col(pt) if isinstance(pt, str) else pt)["x"]


def st_y(pt) -> Column:
    return (F.col(pt) if isinstance(pt, str) else pt)["y"]


# --------------------------------------------------------------- predicates
def point_in_box(px: Column, py: Column, min_x, min_y, max_x, max_y) -> Column:
    """ST_Within(point, envelope) as 4 comparisons — pushes to Parquet scan.

    Matches the reference's R-tree query rewrite target
    (``rtree_index_plan_scan.cpp``): bbox conjuncts on plain numeric columns."""
    return (px >= min_x) & (px <= max_x) & (py >= min_y) & (py <= max_y)


def box_intersects(a, b) -> Column:
    """ST_Intersects(BOX_2D, BOX_2D) — 4-comparison Column expr
    (reference st_intersects.cpp:14-30)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return (
        (a["min_x"] <= b["max_x"])
        & (a["max_x"] >= b["min_x"])
        & (a["min_y"] <= b["max_y"])
        & (a["max_y"] >= b["min_y"])
    )


def bbox_overlap(amin_x, amax_x, amin_y, amax_y, bmin_x, bmax_x, bmin_y, bmax_y) -> Column:
    """Bbox overlap over 8 loose columns (the spatial-join prefilter — the
    same conjunction the reference's optimizer rewrite emits,
    ``optimizer_rules.cpp:244-253``)."""
    return (amin_x <= bmax_x) & (amax_x >= bmin_x) & (amin_y <= bmax_y) & (amax_y >= bmin_y)


# ----------------------------------------------------------------- measures
def point_distance(ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    """Euclidean POINT_2D distance (reference st_distance.cpp native path)."""
    return F.sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))


def haversine(lon1: Column, lat1: Column, lon2: Column, lat2: Column,
              radius: float = 6371000.0) -> Column:
    """ST_Distance_Sphere / ST_Haversine as pure trig Column expr
    (reference st_distance_sphere.cpp:18-38) — no UDF, fully codegen'd."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = p2 - p1
    dl = F.radians(lon2 - lon1)
    h = F.sin(dp / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) ** 2
    return F.lit(2.0 * radius) * F.asin(F.sqrt(h))


def linestring_2d_length(line) -> Column:
    """LINESTRING_2D length via higher-order functions — stays JVM-side."""
    line = F.col(line) if isinstance(line, str) else line
    n = F.size(line)
    pairs = F.zip_with(
        F.slice(line, 1, n - 1),
        F.slice(line, 2, n - 1),
        lambda p, q: F.sqrt((p["x"] - q["x"]) * (p["x"] - q["x"]) + (p["y"] - q["y"]) * (p["y"] - q["y"])),
    )
    return F.when(n < 2, F.lit(0.0)).otherwise(F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v))


def _ring_shoelace(ring) -> Column:
    n = F.size(ring)
    terms = F.zip_with(
        F.slice(ring, 1, n - 1),
        F.slice(ring, 2, n - 1),
        lambda p, q: p["x"] * q["y"] - q["x"] * p["y"],
    )
    return F.aggregate(terms, F.lit(0.0), lambda acc, v: acc + v) / 2.0


def polygon_2d_area(poly) -> Column:
    """POLYGON_2D shoelace area, holes subtracted — higher-order Column expr
    (reference st_area.cpp POLYGON_2D overload)."""
    poly = F.col(poly) if isinstance(poly, str) else poly
    shell = F.abs(_ring_shoelace(F.element_at(poly, 1)))
    holes = F.when(
        F.size(poly) > 1,
        F.aggregate(
            F.slice(poly, 2, F.size(poly) - 1),
            F.lit(0.0),
            lambda acc, ring: acc + F.abs(_ring_shoelace(ring)),
        ),
    ).otherwise(F.lit(0.0))
    return shell - holes


def box_area(box) -> Column:
    box = F.col(box) if isinstance(box, str) else box
    return (box["max_x"] - box["min_x"]) * (box["max_y"] - box["min_y"])


def box_centroid(box) -> Column:
    box = F.col(box) if isinstance(box, str) else box
    return F.struct(
        ((box["min_x"] + box["max_x"]) / 2).alias("x"),
        ((box["min_y"] + box["max_y"]) / 2).alias("y"),
    )


def linestring_2d_npoints(line) -> Column:
    return F.size(F.col(line) if isinstance(line, str) else line)


def linestring_2d_startpoint(line) -> Column:
    return F.element_at(F.col(line) if isinstance(line, str) else line, 1)


def linestring_2d_endpoint(line) -> Column:
    return F.element_at(F.col(line) if isinstance(line, str) else line, -1)


def linestring_2d_pointn(line, n) -> Column:
    """1-based, negative from end — element_at has the same convention
    (reference st_pointn.cpp)."""
    return F.element_at(F.col(line) if isinstance(line, str) else line, n)


def flip_point_2d(pt) -> Column:
    pt = F.col(pt) if isinstance(pt, str) else pt
    return F.struct(pt["y"].alias("x"), pt["x"].alias("y"))


# -------------------------------------------------- extent aggregate (agg)
def extent_agg_exprs(min_x, min_y, max_x, max_y):
    """ST_Extent_Agg as plain min/max aggregates (reference
    ``st_extent_agg.cpp:14-86`` keeps exactly this 4-double state) — pure
    Spark partial aggregation, no UDAF needed."""
    return [
        F.min(min_x).alias("min_x"),
        F.min(min_y).alias("min_y"),
        F.max(max_x).alias("max_x"),
        F.max(max_y).alias("max_y"),
    ]


# ------------------------------------------- WKB -> native-type casts
# (reference registers ST_Point2DFromWKB / ST_LineString2DFromWKB /
# ST_Polygon2DFromWKB as the internal cast kernels behind
# `wkb::CAST(POINT_2D)` etc., spatial/src/spatial/core/functions/cast/*;
# materializing a columnar layout from WKB is a one-time ingest cost that
# buys the all-JVM kernels above for every later query)
def _native_cast_udfs():
    """Built lazily (pandas import only when used)."""
    import pandas as pd
    from pyspark.sql import types as T

    from ..geo import geom as G
    from ..geo import wkb as WKB

    p2d = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())]
    )
    ls2d = T.ArrayType(p2d)
    pg2d = T.ArrayType(ls2d)

    def _pt(g):
        return {"x": float(g[0]), "y": float(g[1])}

    @F.pandas_udf(p2d)
    def st_point2dfromwkb(s):
        xs, ys = [], []
        for b in s:
            if b is None:
                xs.append(None); ys.append(None); continue
            g = WKB.from_wkb(bytes(b))
            if g.tag != G.POINT:
                raise ValueError(
                    f"ST_Point2DFromWKB: expected POINT, got {g.type_name}"
                )
            if g.data is None:  # EMPTY
                xs.append(None); ys.append(None)
            else:
                xs.append(float(g.data[0])); ys.append(float(g.data[1]))
        return pd.DataFrame({"x": xs, "y": ys})

    @F.pandas_udf(ls2d)
    def st_linestring2dfromwkb(s):
        out = []
        for b in s:
            if b is None:
                out.append(None); continue
            g = WKB.from_wkb(bytes(b))
            if g.tag != G.LINESTRING:
                raise ValueError(
                    f"ST_LineString2DFromWKB: expected LINESTRING, got {g.type_name}"
                )
            out.append([_pt(p) for p in g.data])
        return pd.Series(out)

    @F.pandas_udf(pg2d)
    def st_polygon2dfromwkb(s):
        out = []
        for b in s:
            if b is None:
                out.append(None); continue
            g = WKB.from_wkb(bytes(b))
            if g.tag != G.POLYGON:
                raise ValueError(
                    f"ST_Polygon2DFromWKB: expected POLYGON, got {g.type_name}"
                )
            out.append([[_pt(p) for p in ring] for ring in g.data])
        return pd.Series(out)

    return {
        "st_point2dfromwkb": st_point2dfromwkb,
        "st_linestring2dfromwkb": st_linestring2dfromwkb,
        "st_polygon2dfromwkb": st_polygon2dfromwkb,
    }
