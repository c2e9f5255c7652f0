"""Dump .explain('formatted') for the r17 cluster-lane WKB-kernel change.

Run once from a pre-change tree (git stash) with suffix 'before' and once
from the changed tree with suffix 'after':

    PYTHONPATH=/root/repo python scripts/capture_cluster_plans_r17.py before
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

suffix = sys.argv[1]

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[4]")
    .appName("capture_cluster_plans_r17")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb_spatial_spark  # noqa: E402
from duckdb_spatial_spark.plans import hilbert_cluster_boxes  # noqa: E402
from duckdb_spatial_spark.plans.pruning import hilbert_cluster_points  # noqa: E402

duckdb_spatial_spark.register_all(spark)

out_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
)
os.makedirs(out_dir, exist_ok=True)

import tempfile  # noqa: E402


def fmt(df):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


tmp = tempfile.mkdtemp(prefix="cap_r17_")
spark.sql(
    "SELECT id, CAST(id * 7919 % 10000 AS DOUBLE) AS x,"
    " CAST(id * 104729 % 10000 AS DOUBLE) AS y FROM range(100000)"
).write.mode("overwrite").parquet(f"{tmp}/pts")
pts = spark.read.parquet(f"{tmp}/pts")
with open(os.path.join(out_dir, f"points_cluster_build_{suffix}.txt"), "w") as f:
    f.write(fmt(hilbert_cluster_points(pts.select("id", "x", "y"), "x", "y", num_partitions=4)))

spark.sql(
    "SELECT id, CAST(id * 7919 % 9900 AS DOUBLE) AS mx,"
    " CAST(id * 104729 % 9900 AS DOUBLE) AS my,"
    " CAST(id % 23 + 1 AS DOUBLE) AS w, CAST(id % 19 + 1 AS DOUBLE) AS h"
    " FROM range(100000)"
).write.mode("overwrite").parquet(f"{tmp}/polys")
polys = spark.read.parquet(f"{tmp}/polys")
with open(os.path.join(out_dir, f"polys_cluster_build_{suffix}.txt"), "w") as f:
    f.write(
        fmt(
            hilbert_cluster_boxes(
                polys.selectExpr("id", "mx", "my", "mx + w AS _mxx", "my + h AS _mxy"),
                "mx", "my", "_mxx", "_mxy", num_partitions=4,
            )
        )
    )

import shutil  # noqa: E402

shutil.rmtree(tmp, ignore_errors=True)
print(f"wrote {out_dir}/*_{suffix}.txt")
spark.stop()
