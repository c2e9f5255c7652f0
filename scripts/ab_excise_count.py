"""A/B: excise_dup_spans count-stage variants at the bench's 10x tier
(r16 opt — extends the r13 five-variant bracket with the one unmeasured
shape: JVM-side counting that removes the SECOND Python crossing of the
window rows without re-running the window pass).

NOTE (r16 advisory): the v_win plan below WON this bracket and shipped
as excise_dup_spans' "text" method, so v_cur now builds the same window
plan as v_win — re-running this script compares v_win against itself.
The pre-change baseline (window rows -> Exchange(_wt) -> mapInPandas
factorize+bincount -> flags -> rebuild, the r13 shape) only exists in
a pre-2660be1 worktree; run it there for a true before/after, the same
caveat capture_excise_plan.py documents. Historical results are in
OPTIMIZATION_r16.md change 10.

  v_cur   the shipped plan (was the mapInPandas count-filter baseline;
          post-2660be1 it is the v_win shape)
  v_win   count(*) OVER (PARTITION BY _wt) — same single Exchange, the
          count runs JVM-side (WindowExec sort) and only flagged
          (id, _s) rows continue; no second Python crossing
  v_semi  persist the window rows, count via partial HashAggregate
          (map-side combine, small exchange), semi-join texts with
          count>=2 back against the persisted rows

Every variant is exact (duplication decided by literal window text);
equality of the final (id, clean_text, n_tokens, n_removed) output is
asserted per round via exceptAll both ways against v_cur. DuckDB runs
the same-work oracle replica interleaved as the rate anchor.

Usage: python scripts/ab_excise_count.py [doc_mult] [rounds]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

doc_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab_excise_count")
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
import __spark_entry__ as E  # noqa: E402
from duckdb_spatial_spark.operators import dedup as DD  # noqa: E402
from duckdb_spatial_spark.operators.dedup import (  # noqa: E402
    _excise_rebuild,
    _window_text_spans,
    excise_dup_spans,
)
from duckdb_spatial_spark.operators._util import widen_narrow_input  # noqa: E402

duckdb_spatial_spark.register_all(spark)

con = duckdb.connect()
con.execute(f"SET threads TO {cpus}")

tmp = tempfile.mkdtemp(prefix="ab_excise_")
docs_big = f"{tmp}/docs_big"
(
    spark.read.parquet(f"{sf_dir}/documents.parquet")
    .select("doc_id", "text")
    .crossJoin(spark.range(doc_mult).select(F.col("id").alias("_rep")))
    .selectExpr("doc_id + _rep * 10000000 AS doc_id", "text")
    .repartition(cpus)
    .write.mode("overwrite")
    .parquet(docs_big)
)
df = spark.read.parquet(docs_big)
df.createOrReplaceTempView("documents_big")
con.execute(f"CREATE VIEW documents_big AS FROM '{docs_big}/*.parquet'")
duck_sql = (
    "SELECT sum(n_removed), sum(length(clean_text)) FROM ("
    + E.oracle_sql()["excise_spans"].replace("FROM documents", "FROM documents_big")
    + ")"
)

W = 8


def v_cur():
    return excise_dup_spans(df)


def v_win():
    base = widen_narrow_input(df.select("doc_id", "text"))
    wtexts = _window_text_spans(base, "doc_id", "text", W)
    flagged = (
        wtexts.withColumn("_c", F.count("*").over(Window.partitionBy("_wt")))
        .where("_c >= 2")
        .groupBy("doc_id")
        .agg(F.collect_list("_s").alias("_flags"))
    )
    src = base.join(flagged, "doc_id", "left")
    return _excise_rebuild(df, src, "doc_id", W)


def v_semi():
    base = widen_narrow_input(df.select("doc_id", "text"))
    wtexts = _window_text_spans(base, "doc_id", "text", W).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dup_texts = (
        wtexts.groupBy("_wt").agg(F.count("*").alias("_c")).where("_c >= 2")
        .select("_wt")
    )
    flagged = (
        wtexts.join(dup_texts, "_wt", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_list("_s").alias("_flags"))
    )
    src = base.join(flagged, "doc_id", "left")
    out = _excise_rebuild(df, src, "doc_id", W)
    return out, wtexts


VARIANTS = ["v_cur", "v_win", "v_semi"]
res = {v: [] for v in VARIANTS}
duck_walls = []

# warm
spark.sql("SELECT count(*) FROM documents_big").collect()
excise_dup_spans(df.limit(2000)).agg(F.sum("n_removed")).collect()

for rnd in range(rounds):
    for v in VARIANTS:
        to_unpersist = None
        if v == "v_semi":
            out, to_unpersist = v_semi()
        else:
            out = {"v_cur": v_cur, "v_win": v_win}[v]()
        t0 = time.time()
        out.agg(F.sum("n_removed"), F.sum(F.length("clean_text"))).collect()
        wall = round(time.time() - t0, 3)
        if to_unpersist is not None:
            to_unpersist.unpersist()
        res[v].append(wall)
        print(f"[round {rnd}] {v}: {wall}s", flush=True)
    t0 = time.time()
    con.execute(duck_sql).fetchall()
    duck_walls.append(round(time.time() - t0, 3))
    print(f"[round {rnd}] duck: {duck_walls[-1]}s", flush=True)

print("\nEquivalence (exceptAll both ways vs v_cur):", flush=True)
cur_out = v_cur()
for name, mk in (("v_win", v_win), ("v_semi", lambda: v_semi()[0])):
    o = mk()
    a = cur_out.exceptAll(o).count()
    b = o.exceptAll(cur_out).count()
    print(f"  {name}: exceptAll {a}/{b} {'OK' if a == b == 0 else 'MISMATCH!'}",
          flush=True)

print("\nvariant  best    walls")
for v in VARIANTS:
    print(f"{v:<8} {min(res[v]):>5.2f}   {res[v]}")
print(f"duck     {min(duck_walls):>5.2f}   {duck_walls}")

import shutil  # noqa: E402

shutil.rmtree(tmp, ignore_errors=True)
