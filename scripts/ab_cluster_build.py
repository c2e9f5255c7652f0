"""Isolated interleaved A/B for the polygon cluster-build lane (r16 opt).

Times, rep-by-rep in ONE session (host walls shift 2-3x between sessions;
same-session ratios are the signal):

  * OLD plan: st_makeenvelope UDF -> generic hilbert_cluster (bounds agg +
    repartitionByRange sample + shuffle = 3 full Python evaluations)
  * NEW plan: hilbert_cluster_boxes via write_geo_parquet(box_xyxy=...)
    (JVM stats, one narrow hilbert/route crossing, WKB built post-sort)
  * DuckDB comparable: morton-sort + COPY (the bench's denominator)

Usage: python scripts/ab_cluster_build.py [n_polys] [reps]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_polys = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab_cluster_build")
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

tmp = tempfile.mkdtemp(prefix="ab_cluster_")
try:
    praw = f"{tmp}/polys_raw"
    spark.sql(
        f"SELECT id, CAST(id * 7919 % 9900 AS DOUBLE) AS mx,"
        f" CAST(id * 104729 % 9900 AS DOUBLE) AS my,"
        f" CAST(id % 23 + 1 AS DOUBLE) AS w, CAST(id % 19 + 1 AS DOUBLE) AS h"
        f" FROM range({n_polys})"
    ).write.mode("overwrite").parquet(praw)
    praw_df = spark.read.parquet(praw)

    # warmup
    spark.sql("SELECT count(*) FROM range(1000000)").collect()
    spark.range(100_000).select(
        udfs.st_astext(udfs.st_point(F.col("id") * 1.0, F.col("id") * 2.0))
    ).count()

    def old_lane():
        g = praw_df.select(
            "id",
            udfs.st_makeenvelope(
                "mx", "my", F.col("mx") + F.col("w"), F.col("my") + F.col("h")
            ).alias("geom"),
        )
        write_geo_parquet(g, f"{tmp}/polys_old", num_partitions=max(cpus, 16))

    def new_lane():
        g = praw_df.selectExpr("id", "mx", "my", "mx + w AS _mxx", "my + h AS _mxy")
        write_geo_parquet(
            g, f"{tmp}/polys_new", num_partitions=max(cpus, 16),
            box_xyxy=("mx", "my", "_mxx", "_mxy"),
        )

    duck_sql = (
        f"COPY (SELECT id, mx, my, w, h, _morton(mx + w / 2, my + h / 2) AS mkey"
        f" FROM '{praw}/*.parquet' ORDER BY mkey)"
        f" TO '{tmp}/duck_polys.parquet' (FORMAT parquet)"
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

    # sanity: same row count + same per-row geom/hilbert on a sample
    a = spark.read.parquet(f"{tmp}/polys_old")
    b = spark.read.parquet(f"{tmp}/polys_new")
    assert a.count() == b.count() == n_polys
    sa = {r.id: (bytes(r.geom), r.hilbert) for r in a.filter("id % 1000000 = 7").collect()}
    sb = {r.id: (bytes(r.geom), r.hilbert) for r in b.filter("id % 1000000 = 7").collect()}
    assert sa == sb, "sampled rows diverge between lanes"
    print("row-equivalence sample check: OK", flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
