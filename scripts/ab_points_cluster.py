"""Isolated interleaved A/B for the POINT cluster-build lane (r16 opt).

  * OLD (bench shape through r16-build): st_point UDF -> generic sampled
    hilbert_cluster (stats job evaluates the st_point ArrowEval over every
    row, fused crossing re-decodes the WKB it just built)
  * NEW: write_geo_parquet(point_xy=...) -> hilbert_cluster_points (JVM
    stats, one fused crossing assembles WKB+bbox+hilbert+route)
  * DuckDB comparable: morton-sort + COPY (the bench's denominator)

Usage: python scripts/ab_points_cluster.py [n_points] [reps]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab_points_cluster")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb  # noqa: E402

import duckdb_spatial_spark  # noqa: E402
from duckdb_spatial_spark.functions import udfs  # noqa: E402
from duckdb_spatial_spark.plans import write_geo_parquet  # noqa: E402
from duckdb_spatial_spark.sources import st_generatepoints  # noqa: E402

duckdb_spatial_spark.register_all(spark)

con = duckdb.connect()
con.execute(f"SET threads TO {cpus}")
con.execute("CREATE OR REPLACE MACRO _m1(v) AS ((v | (v << 8)) & 16711935)")
con.execute("CREATE OR REPLACE MACRO _m2(v) AS ((v | (v << 4)) & 252645135)")
con.execute("CREATE OR REPLACE MACRO _m3(v) AS ((v | (v << 2)) & 858993459)")
con.execute("CREATE OR REPLACE MACRO _m4(v) AS ((v | (v << 1)) & 1431655765)")
con.execute("CREATE OR REPLACE MACRO _spread16(v) AS _m4(_m3(_m2(_m1(v))))")
con.execute(
    "CREATE OR REPLACE MACRO _morton(x, y) AS"
    " (_spread16(CAST(least(greatest(x, 0), 9999.99) / 10000 * 65535 AS BIGINT))"
    " | (_spread16(CAST(least(greatest(y, 0), 9999.99) / 10000 * 65535 AS BIGINT)) << 1))"
)

tmp = tempfile.mkdtemp(prefix="ab_points_")
try:
    raw = f"{tmp}/raw"
    pts = st_generatepoints(spark, 0, 0, 10000, 10000, n_points, seed=1337)
    pts.select("id", "x", "y").write.mode("overwrite").parquet(raw)
    flat = spark.read.parquet(raw)

    spark.sql("SELECT count(*) FROM range(1000000)").collect()
    spark.range(100_000).select(
        udfs.st_astext(udfs.st_point(F.col("id") * 1.0, F.col("id") * 2.0))
    ).count()

    def old_lane():
        write_geo_parquet(
            flat.withColumn("geom", udfs.st_point("x", "y")).select("id", "geom"),
            f"{tmp}/pts_old", num_partitions=max(cpus, 16), sample_fraction=0.01,
        )

    def new_lane():
        write_geo_parquet(
            flat.select("id", "x", "y"), f"{tmp}/pts_new",
            num_partitions=max(cpus, 16), point_xy=("x", "y"),
        )

    duck_sql = (
        f"COPY (SELECT id, x, y, _morton(x, y) AS mkey"
        f" FROM '{raw}/*.parquet' ORDER BY mkey)"
        f" TO '{tmp}/duck_pts.parquet' (FORMAT parquet)"
    )

    results = {"old": [], "new": [], "duck": []}
    for i in range(reps):
        for name, fn in (("old", old_lane), ("new", new_lane)):
            t0 = time.time()
            fn()
            results[name].append(round(time.time() - t0, 2))
            print(f"rep {i} {name}: {results[name][-1]}s", flush=True)
        t0 = time.time()
        con.execute(duck_sql)
        results["duck"].append(round(time.time() - t0, 2))
        print(f"rep {i} duck: {results['duck'][-1]}s", flush=True)

    print("RESULTS", results, flush=True)
    best = {k: min(v) for k, v in results.items()}
    print(
        f"best old={best['old']} new={best['new']} duck={best['duck']}"
        f" | ratio old={best['old']/best['duck']:.2f}"
        f" new={best['new']/best['duck']:.2f}", flush=True,
    )

    a = spark.read.parquet(f"{tmp}/pts_old")
    b = spark.read.parquet(f"{tmp}/pts_new")
    assert a.count() == b.count() == n_points
    assert [f.name for f in a.schema.fields] == [f.name for f in b.schema.fields]
    sa = {r.id: (bytes(r.geom), r.hilbert, r.bbox_min_x) for r in a.filter("id % 1000000 = 7").collect()}
    sb = {r.id: (bytes(r.geom), r.hilbert, r.bbox_min_x) for r in b.filter("id % 1000000 = 7").collect()}
    assert sa == sb, "sampled rows diverge between lanes"
    print("row-equivalence sample check: OK", flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
