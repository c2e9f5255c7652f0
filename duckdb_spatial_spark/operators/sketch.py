"""Distributed, cross-engine-verifiable sketches.

The built-in approximate aggregates (Spark approx_count_distinct /
DuckDB approx_count_distinct) are engine-specific HLL implementations —
their values can never be compared across engines. The sketches here are
DETERMINISTIC given the portable polynomial hash (``dedup.poly_hash_expr``:
bit-identical in Spark Columns and plain DuckDB SQL), so the driver's
DuckDB oracle verifies the sketch VALUES, not just row counts.

  distinct_count_kmv   K-minimum-values distinct-count sketch
                       (Bar-Yossef et al. 2002): keep the k smallest
                       distinct hash values per group; if fewer than k
                       distinct hashes exist the count is exact, else
                       est = (k-1) / U_(k) with U_(k) the k-th smallest
                       hash normalized to (0,1].

Scale shape: one exchange on (group, hash) to dedupe, then a map-side
per-partition bottom-k (Arrow-batched) bounds the final per-group state
to k * num_shuffle_partitions rows — no whole-group sort, no unbounded
collect_list. Mergeability is the point of KMV: bottom-k of a union is
the bottom-k of the per-part bottom-ks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import poly_hash_expr

_MOD = 1_000_000_007  # poly_hash_expr modulus; hash/(MOD) normalizes to (0,1)


def distinct_count_kmv(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
    ndigits: int = 4,
) -> DataFrame:
    """(group, est_distinct) per group via the KMV sketch. Exact when a
    group has fewer than ``k`` distinct hash values."""
    if k < 2:
        raise ValueError("distinct_count_kmv: k must be >= 2")
    # the 131-poly hash is linear: values sharing a prefix and differing
    # in a short suffix land on CLUSTERED hashes (measured: 3x downward
    # bias on 'value-<i>' style keys), which breaks KMV's uniformity
    # assumption. A square mix (h^2 + h mod p) is non-linear, stays in
    # BIGINT range (p^2 < 2^63), and is equally replicable in plain SQL.
    raw = poly_hash_expr(F.col(value_col).cast("string"), 1)
    mixed = (raw * raw + raw) % F.lit(_MOD)
    hashed = df.select(
        F.col(group_col).alias("_g"),
        mixed.alias("_h"),
    ).where(F.col("_h").isNotNull()).dropDuplicates(["_g", "_h"])

    # per-partition bottom-k per group (map-side, Arrow-batched): the
    # following groupBy then sees at most k rows per (group, partition)
    out_schema = T.StructType(
        [
            T.StructField("_g", df.schema[group_col].dataType),
            T.StructField("_h", T.LongType()),
        ]
    )

    def local_bottom_k(batches):
        best: dict = {}
        for pdf in batches:
            for g, h in zip(pdf["_g"], pdf["_h"]):
                lst = best.setdefault(g, [])
                lst.append(int(h))
                if len(lst) > 4 * k:
                    lst.sort()
                    del lst[k:]
        rows_g, rows_h = [], []
        for g, lst in best.items():
            lst.sort()
            for h in lst[:k]:
                rows_g.append(g)
                rows_h.append(h)
        yield pd.DataFrame({"_g": rows_g, "_h": rows_h})

    partial = hashed.mapInPandas(local_bottom_k, out_schema)

    kk = int(k)

    @F.pandas_udf(T.DoubleType())
    def kmv_estimate(hs: pd.Series) -> pd.Series:
        out = []
        for arr in hs:
            vals = sorted(set(int(v) for v in arr))[:kk]
            if len(vals) < kk:
                out.append(float(len(vals)))
            else:
                u_k = vals[kk - 1] / float(_MOD)
                out.append((kk - 1) / u_k)
        return pd.Series(out)

    return (
        partial.groupBy("_g")
        .agg(F.collect_list("_h").alias("_hs"))
        .select(
            F.col("_g").alias(group_col),
            F.round(kmv_estimate(F.col("_hs")), ndigits).alias("est_distinct"),
        )
    )
