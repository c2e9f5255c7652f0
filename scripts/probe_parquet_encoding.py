"""Probe: parquet writer encodings for the clustered-layout write lanes (r16 opt).

The cluster-build lanes are write-wall-bound (both engines converge to the
same Mrows/s in interleaved reps; the host throttles sustained writes to
20-40 MB/s in its slow phases while dd bursts at ~130 MB/s) — so bytes
written is the lever (optimization guide section 6). This probe writes the
SAME clustered layout under writer-option variants, round-robin so host
drift cancels, and records wall seconds + directory bytes + a content
signature (count, sum(hilbert), bit_xor(xxhash64(geom/bbox))) that must be
identical across variants (encodings are logically transparent). Every
signature component is EXACT and order-independent — a float sum over the
bbox doubles is NOT (different encoded sizes -> different splits -> a
different add order flips the last ulp on random coordinates), which
produced a false SIG-MISMATCH in the first run of this probe; the definitive
equivalence proof is exceptAll both ways = 0 on the same staged rows
(recorded in OPTIMIZATION_r16.md).

Variants:
  v1_snappy   current production settings (dictionary off, snappy, v1 pages)
  v2_snappy   parquet.writer.version=v2: DELTA_BINARY_PACKED for the
              hilbert-SORTED int64 column + id, DELTA_BYTE_ARRAY
              (prefix-delta) for the WKB geom whose rows share headers
  v1_zstd     zstd instead of snappy
  v2_zstd     both
  v2_dictbbox v2 + per-column dictionary re-enabled on the bbox sidecars
              (parquet-java per-column key `parquet.enable.dictionary#col`;
              pays off when coordinates are quantized, auto-falls-back to
              plain when near-unique)

Read-side guard: times a fullscan aggregate over each written layout so an
encoding that wins the write but tanks the vectorized reader is rejected.

Usage: python scripts/probe_parquet_encoding.py [n_points] [n_polys] [reps]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
n_polys = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("probe_parquet_encoding")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb_spatial_spark  # noqa: E402
from duckdb_spatial_spark.plans.pruning import (  # noqa: E402
    BBOX_COLS,
    hilbert_cluster_boxes,
    hilbert_cluster_points,
)
from duckdb_spatial_spark.sources import st_generatepoints  # noqa: E402

duckdb_spatial_spark.register_all(spark)

BBOX = tuple(BBOX_COLS)

VARIANTS = [
    ("v1_snappy", {"parquet.enable.dictionary": "false", "compression": "snappy"}),
    ("v2_snappy", {"parquet.enable.dictionary": "false", "compression": "snappy",
                   "parquet.writer.version": "v2"}),
    ("v1_zstd", {"parquet.enable.dictionary": "false", "compression": "zstd"}),
    ("v2_zstd", {"parquet.enable.dictionary": "false", "compression": "zstd",
                 "parquet.writer.version": "v2"}),
    ("v2_dictbbox", dict(
        {"parquet.enable.dictionary": "false", "compression": "snappy",
         "parquet.writer.version": "v2"},
        **{f"parquet.enable.dictionary#{c}": "true" for c in BBOX})),
]


def dir_bytes(p):
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
    )


def signature(path):
    df = spark.read.parquet(path)
    t0 = time.time()
    row = df.agg(
        F.count("*"), F.sum("hilbert"),
        F.expr("bit_xor(xxhash64(geom))"), F.expr(f"bit_xor(xxhash64({BBOX[0]}))"),
    ).collect()[0]
    return tuple(row), round(time.time() - t0, 3)


tmp = tempfile.mkdtemp(prefix="probe_enc_")
results = {}  # (lane, variant) -> dict
try:
    raw = f"{tmp}/raw_pts"
    st_generatepoints(spark, 0, 0, 10000, 10000, n_points, seed=1337).select(
        "id", "x", "y"
    ).write.mode("overwrite").parquet(raw)
    flat = spark.read.parquet(raw)

    praw = f"{tmp}/raw_polys"
    spark.sql(
        f"SELECT id, CAST(id * 7919 % 9900 AS DOUBLE) AS mx,"
        f" CAST(id * 104729 % 9900 AS DOUBLE) AS my,"
        f" CAST(id % 23 + 1 AS DOUBLE) AS w, CAST(id % 19 + 1 AS DOUBLE) AS h"
        f" FROM range({n_polys})"
    ).write.mode("overwrite").parquet(praw)
    praw_df = spark.read.parquet(praw).selectExpr(
        "id", "mx", "my", "mx + w AS _mxx", "my + h AS _mxy"
    )

    # warm workers
    spark.sql("SELECT count(*) FROM range(1000000)").collect()

    def run(lane, build_df):
        for rep in range(reps):
            for vname, opts in VARIANTS:
                out = f"{tmp}/{lane}_{vname}"
                t0 = time.time()
                build_df().write.mode("overwrite").options(**opts).parquet(out)
                wall = round(time.time() - t0, 3)
                rec = results.setdefault((lane, vname), {"walls": [], "bytes": 0})
                rec["walls"].append(wall)
                rec["bytes"] = dir_bytes(out)
                print(f"[probe] {lane} {vname} rep{rep}: {wall}s"
                      f" {rec['bytes']/1e6:.1f}MB", flush=True)
                if rep == reps - 1:
                    rec["sig"], rec["read_s"] = signature(out)
                    shutil.rmtree(out, ignore_errors=True)

    run("points", lambda: hilbert_cluster_points(
        flat, "x", "y", num_partitions=max(cpus, 16)))
    run("polys", lambda: hilbert_cluster_boxes(
        praw_df, "mx", "my", "_mxx", "_mxy", num_partitions=max(cpus, 16)))

    print("\nlane        variant      best_s  walls                bytes        MB    read_s")
    base_sig = {}
    for (lane, vname), rec in results.items():
        base_sig.setdefault(lane, rec["sig"])
        match = "OK" if rec["sig"] == base_sig[lane] else "SIG-MISMATCH!"
        print(f"{lane:<11} {vname:<12} {min(rec['walls']):>6.1f}  {str(rec['walls']):<20} "
              f"{rec['bytes']:>11} {rec['bytes']/1e6:>7.1f}  {rec['read_s']:>6.2f}  {match}",
              flush=True)
finally:
    shutil.rmtree(tmp, ignore_errors=True)
