"""r17 A/B: vectorized excise Arrow crossings vs the r16 loop kernels.

The OLD window-build (per-window Python slice loop + pandas boxing) and
OLD rebuild (per-doc split/join loop) are INLINED here as the baseline —
the shipped operator already uses the vectorized kernels, so calling it
for "before" would compare the new code against itself (the r16 ADVICE
lesson on ab_excise_count.py).

Variants, interleaved round-robin with the DuckDB oracle replica:

  old_full  old window build + window count + old rebuild (r16 shipped plan)
  new_full  shipped excise_dup_spans (vectorized build + rebuild)
  duck      DuckDB oracle aggregate over the same replica files

Per round both variants' outputs are proven exceptAll-identical both
ways once at the end.

Usage: python scripts/ab_excise_vec.py [rounds] [doc_mult]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
doc_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession, functions as F, types as T  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab_excise_vec")
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
from duckdb_spatial_spark.operators._ascii import ws_split as _ascii_ws_split  # noqa: E402
from duckdb_spatial_spark.operators._util import widen_narrow_input  # noqa: E402
from duckdb_spatial_spark.operators.dedup import excise_dup_spans  # noqa: E402

duckdb_spatial_spark.register_all(spark)

con = duckdb.connect()
con.execute(f"SET threads TO {cpus}")

import tempfile  # noqa: E402

tmp = tempfile.mkdtemp(prefix="ab_excise_vec_")
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
con.execute(f"CREATE VIEW documents_big AS FROM '{docs_big}/*.parquet'")
duck_sql = (
    "SELECT sum(n_removed), sum(length(clean_text)) FROM ("
    + E.oracle_sql()["excise_spans"].replace("FROM documents", "FROM documents_big")
    + ")"
)

W = 8


def _old_window_text_spans(src, id_col, text_col, w):
    """r16 loop implementation, verbatim."""
    out_schema = T.StructType(
        [
            src.schema[id_col],
            T.StructField("_s", T.LongType()),
            T.StructField("_wt", T.StringType()),
        ]
    )
    ii = src.columns.index(id_col)
    ti = src.columns.index(text_col)

    def gen(batches):
        for pdf in batches:
            ids, ss, wts = [], [], []
            for did, text in zip(pdf.iloc[:, ii], pdf.iloc[:, ti]):
                if text is None:
                    continue
                toks = _ascii_ws_split(str(text))
                if len(toks) < w:
                    continue
                joined = " ".join(toks)
                tl = np.fromiter(
                    (len(t) for t in toks), dtype=np.int64, count=len(toks)
                )
                off = np.zeros(len(toks) + 1, dtype=np.int64)
                np.cumsum(tl + 1, out=off[1:])
                nwin = len(toks) - w + 1
                a = off[:nwin]
                b = off[w : w + nwin] - 1
                for s in range(nwin):
                    ids.append(did)
                    ss.append(s)
                    wts.append(joined[a[s] : b[s]])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "_s": pd.Series(ss, dtype="int64"),
                    "_wt": pd.Series(wts, dtype="object"),
                }
            )

    return src.mapInPandas(gen, out_schema)


def _old_rebuild(df0, src, id_col, w):
    """r16 loop implementation, verbatim."""
    out_schema = T.StructType(
        [
            df0.schema[id_col],
            T.StructField("clean_text", T.StringType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_removed", T.LongType()),
        ]
    )

    def rebuild(batches):
        for pdf in batches:
            ids, cleans, ntoks, nrem = [], [], [], []
            for did, text, flags in zip(
                pdf.iloc[:, 0], pdf.iloc[:, 1], pdf.iloc[:, 2]
            ):
                toks = _ascii_ws_split(str(text)) if text is not None else []
                n = len(toks)
                if flags is None or (hasattr(flags, "__len__") and len(flags) == 0):
                    clean, nkept = " ".join(toks), n
                else:
                    starts = np.asarray(list(flags), dtype=np.int64)
                    diff = np.zeros(n + 1, dtype=np.int64)
                    np.add.at(diff, starts, 1)
                    np.add.at(diff, np.minimum(starts + w, n), -1)
                    alive = np.cumsum(diff[:n]) <= 0
                    kept = np.asarray(toks, dtype=object)[alive]
                    clean, nkept = " ".join(kept), int(alive.sum())
                ids.append(did)
                cleans.append(clean)
                ntoks.append(n)
                nrem.append(n - nkept)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids),
                    "clean_text": pd.Series(cleans, dtype="object"),
                    "n_tokens": pd.Series(ntoks, dtype="int64"),
                    "n_removed": pd.Series(nrem, dtype="int64"),
                }
            )

    return src.mapInPandas(rebuild, out_schema)


def old_plan():
    base = widen_narrow_input(df.select("doc_id", "text"))
    wtexts = _old_window_text_spans(base, "doc_id", "text", W)
    flagged = (
        wtexts.withColumn("_c", F.count("*").over(Window.partitionBy("_wt")))
        .where(F.col("_c") >= 2)
        .groupBy("doc_id")
        .agg(F.collect_list("_s").alias("_flags"))
    )
    src = base.join(flagged, "doc_id", "left")
    return _old_rebuild(df, src, "doc_id", W)


def new_plan():
    return excise_dup_spans(df)


res = {"old_full": [], "new_full": []}
duck_walls = []

# warm
spark.sql("SELECT count(*) FROM parquet.`" + docs_big + "`").collect()
excise_dup_spans(df.limit(2000)).agg(F.sum("n_removed")).collect()
old_plan().limit(1).count()

for rnd in range(rounds):
    for name, mk in (("old_full", old_plan), ("new_full", new_plan)):
        out = mk()
        t0 = time.time()
        out.agg(F.sum("n_removed"), F.sum(F.length("clean_text"))).collect()
        res[name].append(round(time.time() - t0, 3))
        print(f"[round {rnd}] {name}: {res[name][-1]}s", flush=True)
    t0 = time.time()
    con.execute(duck_sql).fetchall()
    duck_walls.append(round(time.time() - t0, 3))
    print(f"[round {rnd}] duck: {duck_walls[-1]}s", flush=True)

print("\nEquivalence (exceptAll both ways, old vs new):", flush=True)
a, b = old_plan(), new_plan()
d1 = a.exceptAll(b).count()
d2 = b.exceptAll(a).count()
print(f"  exceptAll {d1}/{d2} {'OK' if d1 == d2 == 0 else 'MISMATCH!'}")

print("\nvariant   best    walls")
for v in res:
    print(f"{v:<9} {min(res[v]):>5.2f}   {res[v]}")
print(f"duck      {min(duck_walls):>5.2f}   {duck_walls}")

import shutil  # noqa: E402

shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
