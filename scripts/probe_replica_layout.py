"""Probe: parquet layout of the bench's large-tier replicas (r16 opt).

The scan-rate-floor lanes (tpch_q1_large, events_hourly_large) read a
replica that bench.py writes UNTIMED with Spark's default writer options
(dictionary on, snappy, v1 pages) and that BOTH engines then scan. The r16
change-3 sweep covered the READER knobs (columnarReaderBatchSize,
maxPartitionBytes) and found nothing stable; this probe covers the WRITER
side (optimization guide section 6: file layout) — same data, one layout
variant per directory, then the timed lane bodies run round-robin
ours/duck interleaved across variants so host drift cancels out of every
comparison. Equivalence is structural (writer encodings are logically
transparent) plus a guard: the q1/hourly aggregates must return identical
row counts and the count(*) totals must match across variants.

Variants:
  cur        bench.py today: defaults (dict on, snappy, v1 pages)
  v2_zstd    v2 data pages + zstd (the clustered-layout production choice)
  v1_unc     uncompressed v1 (page-cache-resident host: trades bytes for
             zero decompress CPU)
  v2_snappy  v2 pages, snappy
  bigpage    defaults + 8 MiB data pages (fewer page boundaries per batch)

Usage: python scripts/probe_replica_layout.py [tpch_mult] [ev_mult] [rounds]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

tpch_mult = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ev_mult = int(sys.argv[2]) if len(sys.argv) > 2 else 600
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("probe_replica_layout")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "8192")

import duckdb  # noqa: E402

con = duckdb.connect()
con.execute(f"SET threads TO {cpus}")

VARIANTS = [
    ("cur", {}),
    ("v2_zstd", {"compression": "zstd", "parquet.writer.version": "v2"}),
    ("v1_unc", {"compression": "uncompressed"}),
    ("v2_snappy", {"compression": "snappy", "parquet.writer.version": "v2"}),
    ("bigpage", {"parquet.page.size": str(8 * 1024 * 1024)}),
]


def dir_bytes(p):
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(p) for f in fs if f.endswith(".parquet")
    )


tmp = tempfile.mkdtemp(prefix="probe_replica_")
print(f"[probe] tmp={tmp} tpch_mult={tpch_mult} ev_mult={ev_mult} rounds={rounds}",
      flush=True)

li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate",
)
ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts", "event_type", "value")
ts_dtype = dict(ev.dtypes)["ts"]

# warm
spark.sql("SELECT count(*) FROM range(1000000)").collect()

lanes = {}  # lane -> list[(vname, path, ours_sql, duck_sql)]
for vname, opts in VARIANTS:
    p = f"{tmp}/li_{vname}"
    t0 = time.time()
    (li.crossJoin(spark.range(tpch_mult).select(F.col("id").alias("_rep")))
       .drop("_rep").repartition(cpus)
       .write.mode("overwrite").options(**opts).parquet(p))
    print(f"[write] li {vname}: {time.time()-t0:.1f}s {dir_bytes(p)/1e6:.1f}MB",
          flush=True)
    q1 = f"""
        SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice),
               sum(l_extendedprice * (1 - l_discount)),
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
               avg(l_quantity), avg(l_extendedprice), avg(l_discount), count(*)
        FROM {{t}} WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """
    spark.read.parquet(p).createOrReplaceTempView(f"li_{vname}")
    con.execute(f"CREATE VIEW li_{vname} AS FROM '{p}/*.parquet'")
    lanes.setdefault("q1", []).append(
        (vname, p, q1.format(t=f"li_{vname}"), q1.format(t=f"li_{vname}")))

    pe = f"{tmp}/ev_{vname}"
    t0 = time.time()
    (ev.crossJoin(spark.range(ev_mult).select(F.col("id").alias("_rep")))
       .drop("_rep").repartition(cpus)
       .write.mode("overwrite").options(**opts).parquet(pe))
    print(f"[write] ev {vname}: {time.time()-t0:.1f}s {dir_bytes(pe)/1e6:.1f}MB",
          flush=True)
    spark.read.parquet(pe).createOrReplaceTempView(f"ev_{vname}")
    con.execute(f"CREATE VIEW ev_{vname} AS FROM '{pe}/*.parquet'")
    if ts_dtype in ("bigint", "long"):
        ours_h = (f"SELECT (ts div 1000) div 3600000000, event_type, count(*),"
                  f" sum(value) FROM ev_{vname} GROUP BY 1, 2")
        duck_h = (f"SELECT (ts // 1000) // 3600000000, event_type, count(*),"
                  f" sum(value) FROM ev_{vname} GROUP BY 1, 2")
    else:
        ours_h = (f"SELECT unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000 AS h,"
                  f" event_type, count(*) AS n, sum(value) AS sv"
                  f" FROM ev_{vname} GROUP BY 1, 2")
        duck_h = (f"SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT), event_type,"
                  f" count(*), sum(value) FROM ev_{vname} GROUP BY 1, 2")
    lanes.setdefault("hourly", []).append((vname, pe, ours_h, duck_h))

res = {}  # (lane, vname) -> {"ours": [..], "duck": [..], "bytes": n}
guard = {}
for rnd in range(rounds):
    for lane, entries in lanes.items():
        for vname, p, ours_sql, duck_sql in entries:
            t0 = time.time()
            rows_o = spark.sql(ours_sql).collect()
            o = round(time.time() - t0, 3)
            t0 = time.time()
            rows_d = con.execute(duck_sql).fetchall()
            d = round(time.time() - t0, 3)
            rec = res.setdefault((lane, vname), {"ours": [], "duck": [],
                                                 "bytes": dir_bytes(p)})
            rec["ours"].append(o)
            rec["duck"].append(d)
            ci = -2 if lane == "hourly" else -1  # count(*) column, both engines
            guard.setdefault(lane, set()).add(
                (len(rows_o), len(rows_d),
                 sum(int(r[ci]) for r in rows_o), sum(int(r[ci]) for r in rows_d)))
            print(f"[round {rnd}] {lane} {vname}: ours {o}s duck {d}s", flush=True)

print("\nlane    variant    best_ours  best_duck  ratio   ours_all            "
      "duck_all            MB")
for (lane, vname), rec in res.items():
    bo, bd = min(rec["ours"]), min(rec["duck"])
    print(f"{lane:<7} {vname:<10} {bo:>8.3f}  {bd:>8.3f}  {bo/bd:>5.2f}   "
          f"{str(rec['ours']):<19} {str(rec['duck']):<19} {rec['bytes']/1e6:.0f}",
          flush=True)
for lane, sigs in guard.items():
    print(f"guard {lane}: {'OK' if len(sigs) == 1 else 'MISMATCH ' + str(sigs)}")
print(f"[probe] tmp kept at {tmp} — rm -rf it when done", flush=True)
