"""Dump .explain('formatted') for the polys + points cluster-build lanes,
old vs new plan, into plans/r16/. Small n — plan shape only, no timing."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master("local[4]")
    .appName("capture_cluster_plans")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb_spatial_spark  # noqa: E402
from duckdb_spatial_spark.functions import udfs  # noqa: E402
from duckdb_spatial_spark.plans import hilbert_cluster, hilbert_cluster_boxes  # noqa: E402
from duckdb_spatial_spark.plans.pruning import hilbert_cluster_points  # noqa: E402

duckdb_spatial_spark.register_all(spark)

out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
os.makedirs(out_dir, exist_ok=True)

import tempfile  # noqa: E402

tmp = tempfile.mkdtemp(prefix="cap_plans_")
praw = f"{tmp}/polys_raw"
spark.sql(
    "SELECT id, CAST(id * 7919 % 9900 AS DOUBLE) AS mx,"
    " CAST(id * 104729 % 9900 AS DOUBLE) AS my,"
    " CAST(id % 23 + 1 AS DOUBLE) AS w, CAST(id % 19 + 1 AS DOUBLE) AS h"
    " FROM range(100000)"
).write.mode("overwrite").parquet(praw)
praw_df = spark.read.parquet(praw)


def fmt(df):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


old = hilbert_cluster(
    praw_df.select(
        "id",
        udfs.st_makeenvelope("mx", "my", F.col("mx") + F.col("w"), F.col("my") + F.col("h")).alias("geom"),
    ),
    num_partitions=4,
)
with open(os.path.join(out_dir, "polys_cluster_build_before.txt"), "w") as f:
    f.write(fmt(old))

new = hilbert_cluster_boxes(
    praw_df.selectExpr("id", "mx", "my", "mx + w AS _mxx", "my + h AS _mxy"),
    "mx", "my", "_mxx", "_mxy", num_partitions=4,
)
with open(os.path.join(out_dir, "polys_cluster_build_after.txt"), "w") as f:
    f.write(fmt(new))

# ---- points lane: old = st_point UDF -> generic SAMPLED hilbert_cluster
# (the pre-r16 bench shape); new = hilbert_cluster_points(point_xy), whose
# r16 refactor moved the WKB build below the sort (narrow hilbert/route
# crossing before the exchange)
ptsraw = f"{tmp}/pts_raw"
spark.sql(
    "SELECT id, CAST(id * 7919 % 10000 AS DOUBLE) AS x,"
    " CAST(id * 104729 % 10000 AS DOUBLE) AS y FROM range(100000)"
).write.mode("overwrite").parquet(ptsraw)
pts_df = spark.read.parquet(ptsraw)

old_pts = hilbert_cluster(
    pts_df.withColumn("geom", udfs.st_point("x", "y")).select("id", "geom"),
    num_partitions=4,
    sample_fraction=0.01,
)
with open(os.path.join(out_dir, "points_cluster_build_before.txt"), "w") as f:
    f.write(fmt(old_pts))

new_pts = hilbert_cluster_points(
    pts_df.select("id", "x", "y"), "x", "y", num_partitions=4
)
with open(os.path.join(out_dir, "points_cluster_build_after.txt"), "w") as f:
    f.write(fmt(new_pts))

print("written", out_dir)
spark.stop()
