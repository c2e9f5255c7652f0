"""r17 A/B: Arrow input-batch byte cap on the doc kernels (r16 verdict
item 4). The allocator fix (r16 change 7) removed the per-batch
page-fault tax, but per-batch scratch still scales with batch size
(= partition size under maxRecordsPerBatch), so low-core runs hand the
kernels bigger working sets. This probe flips
``spark.sql.execution.arrow.maxBytesPerBatch`` per round IN ONE SESSION
(the conf is read at execution, verified: default -> 10000-row batches,
set -> byte-capped) and runs the three Arrow-heaviest doc lanes plus
DuckDB anchors interleaved.

Usage: SPARK_GRAFT_CPUS=8 python scripts/ab_arrow_batch_cap.py [rounds]
Configs: unset (engine default), 4 MiB, 16 MiB.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("ab_arrow_batch_cap")
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
from duckdb_spatial_spark.operators.dedup import (  # noqa: E402
    excise_dup_spans,
    minhash_lsh_pairs,
)
from duckdb_spatial_spark.operators.pipeline import linear_classifier_score  # noqa: E402

duckdb_spatial_spark.register_all(spark)
con = duckdb.connect()
con.execute(f"SET threads TO {cpus}")

tmp = tempfile.mkdtemp(prefix="ab_batchcap_")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
for name, mult in (("docs_sf1", 10), ("docs_big", 10)):
    (
        docs.crossJoin(spark.range(mult).select(F.col("id").alias("_rep")))
        .selectExpr("doc_id + _rep * 10000000 AS doc_id", "text")
        .repartition(cpus)
        .write.mode("overwrite")
        .parquet(f"{tmp}/{name}")
    )
sf1 = spark.read.parquet(f"{tmp}/docs_sf1")
big = spark.read.parquet(f"{tmp}/docs_big")

CONF = "spark.sql.execution.arrow.maxBytesPerBatch"
CONFIGS = [("off", None), ("4m", str(4 << 20)), ("16m", str(16 << 20))]


def set_cap(v):
    if v is None:
        spark.conf.unset(CONF)
    else:
        spark.conf.set(CONF, v)


def v_clf():
    w = [(((b * 1103515245 + 12345) % 2049) - 1024) / 1024.0 for b in range(512)]
    linear_classifier_score(sf1, w, bias=13.0 / 256.0, seed=7).agg(
        F.sum("clf_raw"), F.sum(F.col("clf_keep").cast("long"))
    ).collect()


def v_minhash():
    minhash_lsh_pairs(
        sf1, "doc_id", "text", n=3, num_hashes=32, bands=8, threshold=0.5
    ).count()


def v_excise():
    excise_dup_spans(big).agg(
        F.sum("n_removed"), F.sum(F.length("clean_text"))
    ).collect()


LANES = [("clf_sf1", v_clf), ("minhash_sf1", v_minhash), ("excise_big", v_excise)]

# warm
spark.sql(f"SELECT count(*) FROM parquet.`{tmp}/docs_sf1`").collect()
v_clf()

walls: dict[tuple, list] = {}
for r in range(rounds):
    # rotate the config order every round: a fixed order hands the last
    # config the warmest JVM (measured as a systematic ~20% bias)
    order = CONFIGS[r % len(CONFIGS):] + CONFIGS[: r % len(CONFIGS)]
    for cname, cval in order:
        set_cap(cval)
        for lname, fn in LANES:
            t0 = time.time()
            fn()
            walls.setdefault((lname, cname), []).append(round(time.time() - t0, 3))
    print(
        f"round {r} (order {[c for c, _ in order]}): "
        + "  ".join(
            f"{ln}/{cn}={walls[(ln, cn)][-1]}"
            for ln, _ in LANES
            for cn, _ in CONFIGS
        ),
        flush=True,
    )
set_cap(None)

print("\nlane        config  best    walls")
for (ln, cn), ws in walls.items():
    print(f"{ln:<11} {cn:<7} {min(ws):>5.2f}   {ws}")

import shutil  # noqa: E402

shutil.rmtree(tmp, ignore_errors=True)
spark.stop()
