"""r17 decomposition + A/B of the excise_dup_spans 10x bench tier.

Stages timed with the noop sink (guide §1.4), interleaved with the DuckDB
comparable so host drift cancels (rounds alternate every variant):

  passA      window-text build alone (_window_text_spans -> noop)
  passA_cnt  + exchange(_wt) + WindowExec count + filter + per-doc agg
  text_full  the shipped text-method lane (agg collect, as the bench times)
  hash_full  method="hash" lane (same output, candidate-join shape)
  duck       the DuckDB oracle aggregate over the same replica files

Usage: python scripts/ab_excise_r17.py [rounds] [doc_mult]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    doc_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import duckdb
    from pyspark.sql import SparkSession, functions as F

    import duckdb_spatial_spark
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab-excise-r17")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    duckdb_spatial_spark.register_all(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")

    import tempfile

    tmp = tempfile.mkdtemp(prefix="exciser17_")
    docs_big = f"{tmp}/docs_big"
    (
        spark.table("documents")
        .select("doc_id", "text")
        .crossJoin(spark.range(doc_mult).select(F.col("id").alias("_rep")))
        .selectExpr("doc_id + _rep * 10000000 AS doc_id", "text")
        .repartition(cpus)
        .write.mode("overwrite")
        .parquet(docs_big)
    )
    big = spark.read.parquet(docs_big)
    big.createOrReplaceTempView("documents_big")

    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    con.execute(f"CREATE VIEW documents_big AS FROM '{docs_big}/*.parquet'")
    duck_sql = (
        "SELECT sum(n_removed), sum(length(clean_text)) FROM ("
        + E.oracle_sql()["excise_spans"].replace("FROM documents", "FROM documents_big")
        + ")"
    )

    from duckdb_spatial_spark.operators.dedup import (
        _window_text_spans,
        excise_dup_spans,
    )
    from duckdb_spatial_spark.operators._util import widen_narrow_input
    from pyspark.sql.window import Window

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def v_passA():
        base = widen_narrow_input(big.select("doc_id", "text"))
        noop(_window_text_spans(base, "doc_id", "text", 8))

    def v_passA_cnt():
        base = widen_narrow_input(big.select("doc_id", "text"))
        wt = _window_text_spans(base, "doc_id", "text", 8)
        flagged = (
            wt.withColumn("_c", F.count("*").over(Window.partitionBy("_wt")))
            .where(F.col("_c") >= 2)
            .groupBy("doc_id")
            .agg(F.collect_list("_s").alias("_flags"))
        )
        noop(flagged)

    def v_text_full():
        excise_dup_spans(big, method="text").agg(
            F.sum("n_removed"), F.sum(F.length("clean_text"))
        ).collect()

    def v_hash_full():
        excise_dup_spans(big, method="hash").agg(
            F.sum("n_removed"), F.sum(F.length("clean_text"))
        ).collect()

    def v_duck():
        con.execute(duck_sql).fetchall()

    variants = [
        ("passA", v_passA),
        ("passA_cnt", v_passA_cnt),
        ("text_full", v_text_full),
        ("hash_full", v_hash_full),
        ("duck", v_duck),
    ]

    # warmup: one small spark job + python workers
    spark.sql("SELECT count(*) FROM documents").collect()
    excise_dup_spans(spark.table("documents")).agg(F.sum("n_removed")).collect()

    walls: dict[str, list[float]] = {k: [] for k, _ in variants}
    for r in range(rounds):
        for name, fn in variants:
            spark.sparkContext.setJobDescription(f"excise-r17 {name} round {r}")
            t0 = time.time()
            fn()
            walls[name].append(round(time.time() - t0, 3))
        print(f"round {r}: " + "  ".join(f"{k}={walls[k][-1]}" for k, _ in variants))
    print("\nbest-of:")
    for k, _ in variants:
        print(f"  {k}: best {min(walls[k])}  all {walls[k]}")

    # sanity: both methods identical on the tier
    a = excise_dup_spans(big, method="text")
    b = excise_dup_spans(big, method="hash")
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"exceptAll text-vs-hash: {d1} / {d2}")

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
