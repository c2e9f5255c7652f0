"""Capture .explain('formatted') for the excise_spans lane (r16 opt change
10). Run with PYTHONPATH pointing at the tree whose plan you want (e.g. a
git worktree of the pre-change HEAD for the 'before' file).

Usage: python scripts/capture_excise_plan.py <out_file>
"""

import io
import os
import sys
from contextlib import redirect_stdout

out_file = sys.argv[1]
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("capture_excise_plan")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import duckdb_spatial_spark  # noqa: E402
from duckdb_spatial_spark.operators.dedup import excise_dup_spans  # noqa: E402

duckdb_spatial_spark.register_all(spark)

df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
buf = io.StringIO()
with redirect_stdout(buf):
    excise_dup_spans(df).explain("formatted")
with open(out_file, "w") as f:
    f.write(f"# excise_dup_spans(documents) — {sf_dir}\n")
    f.write(buf.getvalue())
print(f"wrote {out_file}")
