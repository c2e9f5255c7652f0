"""A/B: do the glibc allocator tunables help the JVM side too? (r16 opt,
"Not yet optimized" item 1 from change 7.)

Change 7 injected GLIBC_TUNABLES into the PYTHON WORKERS' exec env (the
measured page-fault cliff was in per-batch numpy scratch). The JVM's own
native allocations (JNI decompressors, netty/Arrow buffers) still go
through the driver JVM's malloc, and local-mode executors live in that
JVM. This probe runs the scan-floor lane body (tpch q1 over a pre-built
replica) in SUBPROCESSES that either do or don't carry GLIBC_TUNABLES in
the environment the JVM inherits at exec, alternating off/on for
``rounds`` rounds so host drift cancels.

Usage:
  python scripts/ab_jvm_alloc.py <replica_dir> [rounds] [reps]
  python scripts/ab_jvm_alloc.py --child <mode> <replica_dir> <reps>

The replica_dir must hold the 7-column lineitem replica parquet files
(e.g. the li_cur directory a probe_replica_layout.py run left behind).
"""

import json
import os
import subprocess
import sys
import time

TUNABLES = (
    "glibc.malloc.mmap_threshold=268435456:glibc.malloc.trim_threshold=268435456"
)

Q1 = """
    SELECT l_returnflag, l_linestatus, sum(l_quantity), sum(l_extendedprice),
           sum(l_extendedprice * (1 - l_discount)),
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)),
           avg(l_quantity), avg(l_extendedprice), avg(l_discount), count(*)
    FROM li WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""


def child(mode: str, replica: str, reps: int) -> None:
    # GLIBC_TUNABLES must be in os.environ BEFORE the JVM gateway is
    # launched: the JVM child inherits it at exec, when ld.so parses it.
    if mode == "on":
        os.environ["GLIBC_TUNABLES"] = TUNABLES
    else:
        os.environ.pop("GLIBC_TUNABLES", None)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"ab_jvm_alloc_{mode}")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "8192")
    spark.read.parquet(replica).createOrReplaceTempView("li")
    spark.sql("SELECT count(*) FROM li").collect()  # warm reader + codegen
    walls = []
    for _ in range(reps):
        t0 = time.time()
        spark.sql(Q1).collect()
        walls.append(round(time.time() - t0, 3))
    print("RESULT " + json.dumps({"mode": mode, "walls": walls}), flush=True)


def main() -> None:
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    replica = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out = {"off": [], "on": []}
    for rnd in range(rounds):
        for mode in ("off", "on"):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", mode,
                 replica, str(reps)],
                capture_output=True, text=True, check=False,
            )
            line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT ")]
            if not line:
                print(f"[round {rnd}] {mode}: CHILD FAILED\n{p.stderr[-2000:]}",
                      flush=True)
                continue
            walls = json.loads(line[0][7:])["walls"]
            out[mode].append(walls)
            print(f"[round {rnd}] {mode}: {walls}", flush=True)
    for mode, rows in out.items():
        flat = [w for row in rows for w in row]
        bests = [min(row) for row in rows if row]
        print(f"{mode}: per-round bests {bests}  overall best "
              f"{min(flat) if flat else float('nan')}")


if __name__ == "__main__":
    main()
