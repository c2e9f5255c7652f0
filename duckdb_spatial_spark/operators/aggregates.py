"""Spatial aggregates (SURVEY.md §2.5).

* ST_Extent_Agg — pure Spark min/max partial aggregation (the reference's
  aggregate state is exactly 4 doubles, ``st_extent_agg.cpp:14-86``); fully
  map-side combinable, no UDAF, no Python.
* ST_Union_Agg / ST_Intersection_Agg — two-level combine mirroring the
  reference's init/update/combine/finalize (``geos/functions/aggregate.cpp:
  106-172``): partial fold per partition (mapInPandas-style inside
  applyInPandas groups), then final fold per group. NULL and EMPTY inputs
  are skipped, matching the reference's update loop.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import udfs
from ..geo import algorithms as A
from ..geo import geom as G
from ..geo import wkb as WKB


def st_extent_agg(df: DataFrame, geom_col: str, group_cols=()) -> DataFrame:
    """Per-group envelope as a BOX_2D struct + polygon GEOMETRY."""
    bb = udfs.st_extent(F.col(geom_col))
    tmp = df.withColumn("_bb", bb)
    aggs = [
        F.min("_bb.min_x").alias("min_x"),
        F.min("_bb.min_y").alias("min_y"),
        F.max("_bb.max_x").alias("max_x"),
        F.max("_bb.max_y").alias("max_y"),
    ]
    out = tmp.groupBy(*group_cols).agg(*aggs) if group_cols else tmp.agg(*aggs)
    return out.withColumn(
        "extent",
        udfs.st_makeenvelope(F.col("min_x"), F.col("min_y"), F.col("max_x"), F.col("max_y")),
    )


def _fold_agg(
    df: DataFrame,
    geom_col: str,
    group_cols,
    fold_fn,
    out_name: str,
    final_fn=None,
    skip_empty: bool = True,
) -> DataFrame:
    """Generic two-level geometric fold per group. ``final_fn`` (defaults to
    ``fold_fn``) merges the level-1 partials — aggregates whose partial is a
    container (ST_Collect) need a different merge than their update."""
    group_cols = list(group_cols)
    if not group_cols:
        df = df.withColumn("_g", F.lit(1))
        group_cols = ["_g"]
        drop_key = True
    else:
        drop_key = False
    final_fn = final_fn or fold_fn

    key_fields = [df.schema[c] for c in group_cols]
    partial_schema = T.StructType(key_fields + [T.StructField(out_name, T.BinaryType())])

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [WKB.from_wkb(bytes(b)) for b in pdf[geom_col] if b is not None]
        if skip_empty:
            geoms = [g for g in geoms if not g.is_empty()]
        acc = fold_fn(geoms) if geoms else None
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row[out_name] = WKB.to_wkb(acc) if acc is not None else None
        return pd.DataFrame([row])

    # level 1: fold within each (group, partition-salt) bucket to bound memory
    salted = df.withColumn("_salt", F.spark_partition_id())
    lvl1_schema = T.StructType(
        key_fields
        + [T.StructField("_salt", T.IntegerType()), T.StructField(out_name, T.BinaryType())]
    )

    def partial_with_salt(pdf: pd.DataFrame) -> pd.DataFrame:
        out = partial(pdf)
        out["_salt"] = pdf["_salt"].iloc[0]
        return out[[f.name for f in lvl1_schema.fields]]

    lvl1 = salted.groupBy(*group_cols, "_salt").applyInPandas(partial_with_salt, lvl1_schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [WKB.from_wkb(bytes(b)) for b in pdf[out_name] if b is not None]
        acc = final_fn(geoms) if geoms else None
        row = {c: pdf[c].iloc[0] for c in group_cols}
        row[out_name] = WKB.to_wkb(acc) if acc is not None else None
        return pd.DataFrame([row])

    out = lvl1.groupBy(*group_cols).applyInPandas(final, partial_schema)
    if drop_key:
        out = out.drop("_g")
    return out


def st_union_agg(df: DataFrame, geom_col: str = "geom", group_cols=()) -> DataFrame:
    """Running union per group (reference ``aggregate.cpp:106-172``)."""
    return _fold_agg(df, geom_col, group_cols, A.union_all, "union_agg")


def st_intersection_agg(df: DataFrame, geom_col: str = "geom", group_cols=()) -> DataFrame:
    """Running intersection per group (reference ``aggregate.cpp:34-100``)."""
    return _fold_agg(df, geom_col, group_cols, A.intersection_all, "intersection_agg")


def st_collect_agg(df: DataFrame, geom_col: str = "geom", group_cols=()) -> DataFrame:
    """ST_Collect as a salted two-level fold: a giant group never
    materializes all WKB in one task's ``collect_list``. Level 1 wraps each
    (group, partition) slice in a forced GEOMETRYCOLLECTION; the final merge
    unwraps one level and re-collects, so the result equals single-pass
    ST_Collect over the same rows (child order is partition order — no more
    deterministic than collect_list's). All-NULL groups yield NULL."""

    def part(geoms):
        return G.collect(geoms, force_collection=True)

    def fin(colls):
        parts = []
        for c in colls:
            parts.extend(c.data)
        return G.collect(parts)

    return _fold_agg(
        df, geom_col, group_cols, part, "collected", final_fn=fin, skip_empty=False
    )


# the reference docs also expose the extent aggregate as ST_Envelope_Agg
st_envelope_agg = st_extent_agg
