"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": "total_sec", "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": <sf>}.

Workloads mirror BASELINE.md's derived protocol:
  * windowed point count full-scan vs Hilbert-clustered + bbox-pruned
    (the reference's rtree_points_index/_noindex A/B pair, 10M points)
  * spatial join points x rects (the optimizer-rewrite path)
  * TPC-H q1/q6, hourly events rollup (host-engine capability)
  * MinHash-LSH dedup + brute-force ANN (pipeline operators)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("duckdb_spatial_spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb_spatial_spark
    from duckdb_spatial_spark.functions import native, udfs
    from duckdb_spatial_spark.operators import st_join
    from duckdb_spatial_spark.operators.dedup import minhash_lsh_pairs
    from duckdb_spatial_spark.operators.knn import ann_brute_topk
    from duckdb_spatial_spark.plans import filter_bbox, write_geo_parquet
    from duckdb_spatial_spark.sources import st_generatepoints

    duckdb_spatial_spark.register_all(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events ns timestamps
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)

    timings: dict[str, float] = {}

    def bench(name):
        def deco(fn):
            t0 = time.time()
            fn()
            timings[name] = round(time.time() - t0, 3)
            return fn

        return deco

    pts_sql = (
        "SELECT o_orderkey AS id, CAST(o_orderkey * 7919 % 10000 AS DOUBLE) AS x,"
        " CAST(o_orderkey * 104729 % 10000 AS DOUBLE) AS y FROM orders"
    )

    @bench("envelope_native")
    def _():
        spark.sql(pts_sql).filter(
            native.point_in_box(F.col("x"), F.col("y"), 450.0, 450.0, 2650.0, 2650.0)
        ).count()

    @bench("envelope_geom_udf")
    def _():
        spark.sql(
            f"SELECT count(*) FROM ({pts_sql}) WHERE ST_Within(ST_Point(x, y),"
            " ST_MakeEnvelOPE(450.0D, 450.0D, 2650.0D, 2650.0D))"
        ).collect()

    n_points = int(os.environ.get("SPARK_GRAFT_BENCH_POINTS", "10000000"))
    tmp = tempfile.mkdtemp(prefix="bench_clustered_")
    try:
        pts10m = st_generatepoints(spark, 0, 0, 10000, 10000, n_points, seed=1337)

        @bench("points10m_fullscan_count")
        def _():
            pts10m.filter(
                native.point_in_box(F.col("x"), F.col("y"), 450.0, 450.0, 650.0, 650.0)
            ).count()

        @bench("points10m_cluster_build")
        def _():
            # sampled split points: one full UDF pass instead of two (the
            # repartitionByRange sampling job re-evaluates the extent UDF)
            write_geo_parquet(
                pts10m, tmp + "/pts", num_partitions=max(cpus, 16), sample_fraction=0.01
            )

        clustered = spark.read.parquet(tmp + "/pts")

        @bench("points10m_pruned_count")
        def _():
            filter_bbox(clustered, 450, 450, 650, 650, exact="within").count()

        @bench("spatial_join_grid")
        def _():
            pts = spark.sql(pts_sql).withColumn("geom", udfs.st_point("x", "y")).select("id", "geom")
            rects = spark.sql(
                "SELECT p_partkey AS rid, CAST(p_partkey * 7919 % 9900 AS DOUBLE) AS mx,"
                " CAST(p_partkey * 104729 % 9900 AS DOUBLE) AS my,"
                " CAST(p_partkey % 97 + 3 AS DOUBLE) AS w, CAST(p_partkey % 89 + 2 AS DOUBLE) AS h FROM part"
            )
            rects = rects.select(
                "rid",
                udfs.st_makeenvelope("mx", "my", F.col("mx") + F.col("w"), F.col("my") + F.col("h")).alias("geom"),
            )
            st_join(pts, rects, predicate="within").count()

        @bench("spatial_join_native")
        def _():
            # native lane: whole join JVM-side (PLANS.md) — the ingested-data path
            pts = spark.sql(pts_sql)
            rects = spark.sql(
                "SELECT p_partkey AS rid, CAST(p_partkey * 7919 % 9900 AS DOUBLE) AS mnx,"
                " CAST(p_partkey * 104729 % 9900 AS DOUBLE) AS mny FROM part"
            ).selectExpr("rid", "mnx", "mny", "mnx + 50.0 AS mxx", "mny + 50.0 AS mxy")
            st_join(
                pts, rects, predicate="within",
                left_point=("x", "y"), right_bbox=("mnx", "mny", "mxx", "mxy"),
                right_is_box=True,
            ).count()

        @bench("tpch_q1")
        def _():
            spark.sql(
                """
                SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice),
                       sum(l_extendedprice * (1 - l_discount)),
                       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
                       avg(l_quantity), avg(l_extendedprice), avg(l_discount), count(*)
                FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
                GROUP BY l_returnflag, l_linestatus
                """
            ).collect()

        @bench("tpch_q6")
        def _():
            spark.sql(
                """
                SELECT sum(l_extendedprice * l_discount) FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
                """
            ).collect()

        @bench("events_hourly")
        def _():
            spark.sql(
                "SELECT ts div 3600000000000, event_type, count(*), sum(value)"
                " FROM events GROUP BY 1, 2"
            ).collect()

        @bench("minhash_lsh_docs")
        def _():
            docs = spark.table("documents")
            minhash_lsh_pairs(docs, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5).count()

        @bench("ann_brute_topk")
        def _():
            emb = spark.table("embeddings")
            q = emb.limit(50)
            ann_brute_topk(emb, q, k=10).count()

    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(json.dumps({"metric": "total_sec", "value": total, "unit": "sec", "queries": timings, "sf": sf}))
    spark.stop()


if __name__ == "__main__":
    main()
