"""Hilbert-clustered storage + bbox pruning — the R-tree equivalent.

The reference's R-tree (``spatial/src/spatial/core/index/rtree/``, STR bulk
load: sort by xmin, slice, sort by y-center, pack 128-ary —
``rtree_index_create_physical.cpp:139-240``) gives it windowed-query
skipping. Spark has no secondary indexes; the idiomatic equivalent is:

  write time:  materialize bbox as 4 plain double columns + a Hilbert index
               of the bbox center, ``repartitionByRange(hilbert)`` +
               ``sortWithinPartitions(hilbert)`` so spatially-near rows land
               in the same parquet row groups (same locality goal as the
               STR pack);
  query time:  rewrite ``pred(geom, const)`` into bbox conjuncts on those
               numeric columns (exactly the rewrite the reference's
               ``RTreeIndexScanOptimizer`` does, ``rtree_index_plan_scan.cpp:
               102-232``) — Parquet row-group min/max stats + Spark's
               scan-level filter pushdown then skip non-overlapping data —
               plus the exact predicate re-check on survivors.

At 100 TB this is the difference between a full scan and touching only the
row groups whose Hilbert range overlaps the query window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import udfs

BBOX_COLS = ("bbox_min_x", "bbox_min_y", "bbox_max_x", "bbox_max_y")


def with_bbox_columns(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Sidecar bbox columns (the reference's cached-bbox header, §4.5)."""
    bb = udfs.st_extent(F.col(geom_col))
    df = df.withColumn("_bb", bb)
    for i, c in enumerate(BBOX_COLS):
        df = df.withColumn(c, F.col(f"_bb.{['min_x','min_y','max_x','max_y'][i]}"))
    return df.drop("_bb")


def hilbert_cluster(
    df: DataFrame,
    geom_col: str = "geom",
    bounds: tuple | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add bbox columns + hilbert index and range-partition by it.

    ``bounds`` (min_x, min_y, max_x, max_y) defaults to the data extent
    (one aggregate job, like the reference's index build scan)."""
    df = with_bbox_columns(df, geom_col)
    if bounds is None:
        r = df.agg(
            F.min(BBOX_COLS[0]), F.min(BBOX_COLS[1]), F.max(BBOX_COLS[2]), F.max(BBOX_COLS[3])
        ).collect()[0]
        bounds = (r[0], r[1], r[2], r[3])
    cx = (F.col(BBOX_COLS[0]) + F.col(BBOX_COLS[2])) / 2
    cy = (F.col(BBOX_COLS[1]) + F.col(BBOX_COLS[3])) / 2
    df = df.withColumn(
        "hilbert",
        udfs.st_hilbert(
            cx, cy, F.lit(float(bounds[0])), F.lit(float(bounds[1])), F.lit(float(bounds[2])), F.lit(float(bounds[3]))
        ),
    )
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    return df.repartitionByRange(int(n), "hilbert").sortWithinPartitions("hilbert")


def write_geo_parquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    mode: str = "overwrite",
    bounds: tuple | None = None,
    num_partitions: int | None = None,
) -> None:
    """Hilbert-clustered GeoParquet-style write (geometry stays WKB binary,
    which IS GeoParquet's encoding)."""
    hilbert_cluster(df, geom_col, bounds, num_partitions).write.mode(mode).parquet(path)


def read_geo_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def filter_bbox(
    df: DataFrame,
    min_x: float,
    min_y: float,
    max_x: float,
    max_y: float,
    geom_col: str = "geom",
    exact: str | None = "intersects",
) -> DataFrame:
    """Windowed query with data skipping.

    Emits bbox conjuncts on the plain numeric bbox columns (pushed to the
    parquet scan -> row-group skipping), then optionally re-checks the exact
    predicate against the query envelope — the same filter pull-up split as
    the reference (``rtree_index_plan_scan.cpp:207-231``)."""
    if all(c in df.columns for c in BBOX_COLS):
        pre = (
            (F.col(BBOX_COLS[0]) <= max_x)
            & (F.col(BBOX_COLS[2]) >= min_x)
            & (F.col(BBOX_COLS[1]) <= max_y)
            & (F.col(BBOX_COLS[3]) >= min_y)
        )
        df = df.filter(pre)
    if exact:
        env = udfs.st_makeenvelope(
            F.lit(float(min_x)), F.lit(float(min_y)), F.lit(float(max_x)), F.lit(float(max_y))
        )
        pred = {"intersects": udfs.st_intersects, "within": udfs.st_within, "contains": udfs.st_contains}[
            exact
        ]
        df = df.filter(pred(F.col(geom_col), env))
    return df
