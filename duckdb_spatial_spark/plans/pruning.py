"""Hilbert-clustered storage + bbox pruning — the R-tree equivalent.

The reference's R-tree (``spatial/src/spatial/core/index/rtree/``, STR bulk
load: sort by xmin, slice, sort by y-center, pack 128-ary —
``rtree_index_create_physical.cpp:139-240``) gives it windowed-query
skipping. Spark has no secondary indexes; the idiomatic equivalent is:

  write time:  materialize bbox as 4 plain double columns + a Hilbert index
               of the bbox center, ``repartitionByRange(hilbert)`` +
               ``sortWithinPartitions(hilbert)`` so spatially-near rows land
               in the same parquet row groups (same locality goal as the
               STR pack);
  query time:  rewrite ``pred(geom, const)`` into bbox conjuncts on those
               numeric columns (exactly the rewrite the reference's
               ``RTreeIndexScanOptimizer`` does, ``rtree_index_plan_scan.cpp:
               102-232``) — Parquet row-group min/max stats + Spark's
               scan-level filter pushdown then skip non-overlapping data —
               plus the exact predicate re-check on survivors.

At 100 TB this is the difference between a full scan and touching only the
row groups whose Hilbert range overlaps the query window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import udfs

BBOX_COLS = ("bbox_min_x", "bbox_min_y", "bbox_max_x", "bbox_max_y")


def _fixed_record_binary(recs, width, nan):
    """Zero-boxing WKB column: ``recs`` is the flat uint8 record buffer
    (``width`` bytes per row), ``nan`` the null mask. One
    ``Array.from_buffers`` replaces the per-row ``rows[i*w:(i+1)*w]``
    bytes-slice list the pandas_udf shape needs (r16 opt note 6b; the
    r17 kernel A/B in scripts/ab_wkb_kernel.py measures 12-16x on the
    21-byte point record and 3-11x on the 93-byte envelope, both
    boundary conversions included). Null rows keep their record bytes
    in the data buffer (offsets stay uniform); the validity bitmap
    carries the nulls."""
    import pyarrow as pa

    m = len(recs) // width
    offsets = np.arange(m + 1, dtype=np.int32) * width
    if nan.any():
        validity = pa.py_buffer(np.packbits(~nan, bitorder="little"))
        nulls = int(nan.sum())
    else:
        validity, nulls = None, 0
    return pa.Array.from_buffers(
        pa.binary(), m,
        [validity, pa.py_buffer(offsets), pa.py_buffer(recs)],
        null_count=nulls,
    )


@F.arrow_udf(T.BinaryType())
def _point_wkb_arrow(x, y):
    """21-byte little-endian point WKB, arrow-native (pa.Array in/out).
    Byte-identical to udfs.st_point / the r16 lane-local point_wkb on
    every valid row, same null semantics (NULL or NaN coordinate ->
    NULL geometry); used by the layout write stage where the per-row
    boxing of the pandas_udf shape was the remaining Python cost."""
    xs = np.asarray(x.to_numpy(zero_copy_only=False), dtype=np.float64)
    ys = np.asarray(y.to_numpy(zero_copy_only=False), dtype=np.float64)
    m = len(xs)
    buf = np.zeros((m, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1] = 1  # type = POINT
    buf[:, 5:13] = xs.astype("<f8").view(np.uint8).reshape(m, 8)
    buf[:, 13:21] = ys.astype("<f8").view(np.uint8).reshape(m, 8)
    return _fixed_record_binary(
        buf.reshape(-1), 21, np.isnan(xs) | np.isnan(ys)
    )


@F.arrow_udf(T.BinaryType())
def _envelope_wkb_arrow(min_x, min_y, max_x, max_y):
    """93-byte single-ring box polygon WKB, arrow-native. Byte-identical
    to udfs.st_makeenvelope (same Polygon::CreateFromBox vertex order),
    same null semantics (any NULL/NaN bound -> NULL geometry)."""
    cols = [
        np.asarray(s.to_numpy(zero_copy_only=False), dtype=np.float64)
        for s in (min_x, min_y, max_x, max_y)
    ]
    a, b, c, d = cols
    m = len(a)
    buf = np.zeros((m, 93), dtype=np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1] = 3  # type = POLYGON
    buf[:, 5] = 1  # one ring
    buf[:, 9] = 5  # five points (closed)
    ring = np.empty((m, 10), dtype=np.float64)
    ring[:, 0], ring[:, 1] = a, b
    ring[:, 2], ring[:, 3] = a, d
    ring[:, 4], ring[:, 5] = c, d
    ring[:, 6], ring[:, 7] = c, b
    ring[:, 8], ring[:, 9] = a, b
    buf[:, 13:93] = ring.astype("<f8").view(np.uint8).reshape(m, 80)
    nan = np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d)
    return _fixed_record_binary(buf.reshape(-1), 93, nan)

# Layout writer options (see write_geo_parquet docstring for the measured
# rationale): dictionary off (near-unique WKB), v2 data pages (delta
# encodings for the sorted hilbert column and prefix-sharing WKB), zstd.
# Encodings are logically transparent — readers see identical rows.
GEO_PARQUET_WRITE_OPTIONS = {
    "parquet.enable.dictionary": "false",
    "parquet.writer.version": "v2",
    "compression": "zstd",
}


def with_bbox_columns(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Sidecar bbox columns (the reference's cached-bbox header, §4.5).

    One mapInPandas barrier: the decode runs exactly once per row (a
    projection-level ST_Extent gets re-expanded by Catalyst into every
    downstream reference — audited at 4+ evals in the round-1 cluster
    build), and point WKB decodes as a single numpy view. NULL/EMPTY
    geometries keep NULL bbox columns (rows are not dropped)."""
    from ..functions import fastpath

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(c, T.DoubleType()) for c in BBOX_COLS]
    )
    gi = df.columns.index(geom_col)

    def gen(batches):
        for pdf in batches:
            arrs = fastpath.bbox_arrays(pdf.iloc[:, gi])
            nan = np.isnan(arrs[0])
            if nan.any():  # NULL (not NaN) for missing/EMPTY — parquet stats stay clean
                arrs = [pd.arrays.FloatingArray(a, nan) for a in arrs]
            yield pdf.assign(**dict(zip(BBOX_COLS, arrs)))

    return df.mapInPandas(gen, schema=schema)


def _hash_preimages(spark: SparkSession, n: int) -> list[int]:
    """For each bucket b in [0, n): an int j with pmod(hash(j), n) == b.

    Lets ``repartition(n, j)`` place bucket b exactly in partition b —
    manual range partitioning with a single shuffle and NO sampling pass.
    Found with Spark's own hash() so the mapping matches the shuffle's
    Murmur3 exactly (one tiny driver-side job, no data scan)."""
    need, out = set(range(n)), [0] * n
    width = max(64 * n, 256)
    rows = (
        spark.range(0, width)
        .select(
            F.col("id").cast("int").alias("j"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("b"),
        )
        .collect()
    )
    for r in rows:
        if r.b in need:
            out[r.b] = r.j
            need.discard(r.b)
    if need:  # astronomically unlikely with 64n candidates; widen once
        for r in spark.range(width, width * 16).select(
            F.col("id").cast("int").alias("j"),
            F.pmod(F.hash(F.col("id").cast("int")), F.lit(n)).alias("b"),
        ).collect():
            if r.b in need:
                out[r.b] = r.j
                need.discard(r.b)
    return out


def hilbert_cluster(
    df: DataFrame,
    geom_col: str = "geom",
    bounds: tuple | None = None,
    num_partitions: int | None = None,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Add bbox columns + hilbert index and range-partition by it.

    ``bounds`` (min_x, min_y, max_x, max_y) defaults to the data extent
    (one aggregate job, like the reference's index build scan).

    ``sample_fraction`` switches to **sampled split points**: Spark's
    ``repartitionByRange`` runs a reservoir-sampling job that re-evaluates
    the whole child plan — including the geometry decode — before the
    shuffle pass evaluates it again. With a fraction set, a single bounded
    stats job per-batch-samples bbox centers (and the data bounds, when not
    given); split points come from exact quantiles of the sampled Hilbert
    values driver-side; then ONE barrier pass computes bbox + hilbert +
    route together and one hash shuffle places bucket b in partition b via
    :func:`_hash_preimages`. Exactly two decodes of the data (stats +
    shuffle) regardless of how many plan operators reference the columns —
    the difference matters at 100 TB (and measurably at 10M rows)."""
    from ..functions import fastpath

    n = int(num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    gi = df.columns.index(geom_col)

    if not sample_fraction:
        df = with_bbox_columns(df, geom_col)
        if bounds is None:
            r = df.agg(
                F.min(BBOX_COLS[0]), F.min(BBOX_COLS[1]), F.max(BBOX_COLS[2]), F.max(BBOX_COLS[3])
            ).collect()[0]
            bounds = (r[0], r[1], r[2], r[3])
        cx = (F.col(BBOX_COLS[0]) + F.col(BBOX_COLS[2])) / 2
        cy = (F.col(BBOX_COLS[1]) + F.col(BBOX_COLS[3])) / 2
        df = df.withColumn(
            "hilbert",
            udfs.st_hilbert(
                cx, cy, F.lit(float(bounds[0])), F.lit(float(bounds[1])), F.lit(float(bounds[2])), F.lit(float(bounds[3]))
            ),
        )
        return df.repartitionByRange(n, "hilbert").sortWithinPartitions("hilbert")

    # --- sampled path: one geom-only stats job, then ONE fused projection ---
    # The fused pandas UDF emits struct<bbox, hilbert, route> in a single
    # Project; Spark chains it with any upstream geometry-constructor UDF
    # into ONE ArrowEvalPython crossing (verified: one node, rows evaluated
    # exactly once), and the only downstream consumers are the shuffle and
    # the sort — no operator that could re-expand the projection.
    frac = float(sample_fraction)
    step = max(int(round(1.0 / max(frac, 1e-9))), 1)
    stats_schema = T.StructType([
        T.StructField("mnx", T.DoubleType()), T.StructField("mny", T.DoubleType()),
        T.StructField("mxx", T.DoubleType()), T.StructField("mxy", T.DoubleType()),
        T.StructField("sx", T.ArrayType(T.DoubleType())),
        T.StructField("sy", T.ArrayType(T.DoubleType())),
    ])

    def stats_gen(batches):
        # decode only every step-th row: bounds come from the sample too,
        # which can undershoot the true extent — hilbert_scaled clips
        # out-of-range centers to the curve edge, so clustering quality at
        # the fringe degrades slightly but correctness never does
        for pdf in batches:
            mnx, mny, mxx, mxy = fastpath.bbox_arrays(pdf.iloc[::step, 0])
            ok = ~np.isnan(mnx)
            if not ok.any():
                continue
            cx = (mnx[ok] + mxx[ok]) / 2.0
            cy = (mny[ok] + mxy[ok]) / 2.0
            yield pd.DataFrame({
                "mnx": [float(np.min(mnx[ok]))], "mny": [float(np.min(mny[ok]))],
                "mxx": [float(np.max(mxx[ok]))], "mxy": [float(np.max(mxy[ok]))],
                "sx": [cx.tolist()], "sy": [cy.tolist()],
            })

    stats = df.select(geom_col).mapInPandas(stats_gen, stats_schema).collect()
    if not stats:
        return with_bbox_columns(df, geom_col).withColumn("hilbert", F.lit(None).cast("long"))
    if bounds is None:
        bounds = (
            min(r.mnx for r in stats), min(r.mny for r in stats),
            max(r.mxx for r in stats), max(r.mxy for r in stats),
        )
    sx = np.concatenate([np.asarray(r.sx) for r in stats if r.sx])
    sy = np.concatenate([np.asarray(r.sy) for r in stats if r.sy])
    hs = udfs.hilbert_scaled(sx, sy, *[float(b) for b in bounds])
    probs = np.arange(1, n) / n
    splits = np.unique(np.quantile(hs, probs).astype(np.int64)) if len(hs) else np.array([], dtype=np.int64)
    nb = len(splits) + 1
    jmap = np.asarray(_hash_preimages(df.sparkSession, nb), dtype=np.int32) if nb > 1 else None
    b0, b1, b2, b3 = (float(b) for b in bounds)

    stype = T.StructType(
        [T.StructField(c, T.DoubleType()) for c in BBOX_COLS]
        + [T.StructField("hilbert", T.LongType()), T.StructField("route", T.IntegerType())]
    )

    @F.pandas_udf(stype)
    def fused(g: pd.Series) -> pd.DataFrame:
        arrs = fastpath.bbox_arrays(g)
        mnx, mny, mxx, mxy = arrs
        nan = np.isnan(mnx)
        h = udfs.hilbert_scaled(
            np.nan_to_num((mnx + mxx) / 2.0), np.nan_to_num((mny + mxy) / 2.0), b0, b1, b2, b3
        )
        bucket = np.searchsorted(splits, h, side="right") if len(splits) else np.zeros(len(h), dtype=np.int64)
        route = jmap[bucket] if jmap is not None else np.zeros(len(h), dtype=np.int32)
        out = dict(zip(BBOX_COLS, arrs))
        if nan.any():
            out = {k: pd.arrays.FloatingArray(v, nan) for k, v in out.items()}
            out["hilbert"] = pd.arrays.IntegerArray(h, nan)
        else:
            out["hilbert"] = h
        out["route"] = route.astype(np.int32)
        return pd.DataFrame(out)

    s = fused(F.col(geom_col))
    out = df.select("*", s.alias("_s")).select(
        "*",
        *[F.col(f"_s.{c}").alias(c) for c in BBOX_COLS],
        F.col("_s.hilbert").alias("hilbert"),
        F.col("_s.route").alias("_route"),
    ).drop("_s")
    if nb == 1:
        return out.coalesce(1).sortWithinPartitions("hilbert").drop("_route")
    return (
        out.repartition(nb, F.col("_route"))
        .sortWithinPartitions("hilbert")
        .drop("_route")
    )


def hilbert_cluster_points(
    df: DataFrame,
    x_col: str,
    y_col: str,
    geom_col: str = "geom",
    bounds: tuple | None = None,
    num_partitions: int | None = None,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """Point-ingest clustering: the source rows carry plain ``x``/``y``
    doubles (raw telemetry, the 100 TB shape), so the bounds aggregate and
    the split-point sample run entirely JVM-side against the numeric
    columns — the generic path must push every row through the geometry
    UDF chain even for its stats job.

    r16 optimization (guide §2.3/§8 — shuffle fewer bytes, build heavy
    bytes once, late): the pre-exchange crossing now computes ONLY
    (hilbert, route) from (x, y) — 16 B/row up, 12 B/row down — so the
    exchange and sort carry plain numerics (~36 B/row instead of ~61 with
    the 21-byte WKB and duplicated bbox doubles). The point WKB is
    assembled AFTER the sort, in the write stage, and the bbox sidecars
    are JVM conditional projections of x/y. Per-row output values are
    bit-identical to the pre-r16 fused lane (same WKB construction, same
    null semantics: bbox/hilbert/geom NULL when either coordinate is
    NULL), pinned by tests/test_storage_sources.py and
    tests/test_hilbert_boxes.py."""
    from ..functions import fastpath  # noqa: F401  (parity with generic path)

    spark = df.sparkSession
    n = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if bounds is None:
        r = df.agg(F.min(x_col), F.min(y_col), F.max(x_col), F.max(y_col)).collect()[0]
        bounds = (r[0], r[1], r[2], r[3])
    b0, b1, b2, b3 = (float(b) for b in bounds)
    sample = (
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .sample(fraction=float(sample_fraction), seed=seed)
        .limit(2_000_000)  # driver-memory guard: 1% of a 100 TB table is not collectable
        .collect()
    )
    if sample:
        sx = np.asarray([r.x for r in sample], dtype=np.float64)
        sy = np.asarray([r.y for r in sample], dtype=np.float64)
        hs = udfs.hilbert_scaled(sx, sy, b0, b1, b2, b3)
        probs = np.arange(1, n) / n
        splits = np.unique(np.quantile(hs, probs).astype(np.int64))
    else:
        splits = np.array([], dtype=np.int64)
    nb = len(splits) + 1
    jmap = np.asarray(_hash_preimages(spark, nb), dtype=np.int32) if nb > 1 else None

    stype = T.StructType(
        [T.StructField("hilbert", T.LongType()), T.StructField("route", T.IntegerType())]
    )

    @F.pandas_udf(stype)
    def hilbert_route(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        xs = x.to_numpy(dtype=np.float64, na_value=np.nan)
        ys = y.to_numpy(dtype=np.float64, na_value=np.nan)
        nan = np.isnan(xs) | np.isnan(ys)
        h = udfs.hilbert_scaled(np.nan_to_num(xs), np.nan_to_num(ys), b0, b1, b2, b3)
        bucket = np.searchsorted(splits, h, side="right") if len(splits) else np.zeros(len(h), dtype=np.int64)
        route = jmap[bucket] if jmap is not None else np.zeros(len(h), dtype=np.int32)
        return pd.DataFrame({
            "hilbert": pd.arrays.IntegerArray(h, nan) if nan.any() else h,
            "route": route.astype(np.int32),
        })

    px, py = F.col(x_col), F.col(y_col)
    both = px.isNotNull() & py.isNotNull()
    keep = [c for c in df.columns if c not in (x_col, y_col)]
    routed = df.select("*", hilbert_route(px, py).alias("_s")).select(
        "*", F.col("_s.hilbert").alias("hilbert"), F.col("_s.route").alias("_route")
    ).drop("_s")
    if nb == 1:
        placed = routed.coalesce(1).sortWithinPartitions("hilbert")
    else:
        placed = routed.repartition(nb, F.col("_route")).sortWithinPartitions("hilbert")
    # WKB + bbox sidecars materialize HERE, post-sort, in the write stage;
    # bbox NULL iff either coordinate is NULL (the fused lane's semantics).
    # r17: zero-boxing arrow_udf kernel (scripts/ab_wkb_kernel.py)
    return placed.select(
        *keep,
        _point_wkb_arrow(px, py).alias(geom_col),
        F.when(both, px).alias(BBOX_COLS[0]),
        F.when(both, py).alias(BBOX_COLS[1]),
        F.when(both, px).alias(BBOX_COLS[2]),
        F.when(both, py).alias(BBOX_COLS[3]),
        "hilbert",
    )


def hilbert_cluster_boxes(
    df: DataFrame,
    min_x_col: str,
    min_y_col: str,
    max_x_col: str,
    max_y_col: str,
    geom_col: str = "geom",
    bounds: tuple | None = None,
    num_partitions: int | None = None,
    sample_fraction: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """Box-ingest clustering: source rows carry the rectangle bounds as 4
    plain double columns (any ingested-extent layout — building footprints,
    tiles, envelopes), so, like :func:`hilbert_cluster_points`, the bounds
    aggregate and split-point sample run entirely JVM-side. The generic
    path must instead evaluate the geometry-constructor UDF chain + WKB
    bbox decode once for the bounds job, AGAIN for repartitionByRange's
    reservoir sample, and AGAIN for the shuffle pass (3 full Python
    evaluations, audited r16).

    Plan shape (optimization-guide §2.3/§8: decide with small rows, build
    heavy bytes once, late):

    * ONE narrow Python crossing BEFORE the exchange: (cx, cy) in,
      (hilbert, route) out — 16 B/row up, 12 B/row down;
    * the exchange + sort carry only the numeric bounds + hilbert
      (~56 B/row), never WKB;
    * the 93-byte envelope WKB is assembled AFTER the sort, in the write
      stage, by the vectorized :func:`udfs.st_makeenvelope` kernel —
      built exactly once and never shuffled.

    Output schema matches the generic lane: (*other cols, geom, bbox_*,
    hilbert); bbox sidecars are plain renames of the input bounds."""
    spark = df.sparkSession
    n = int(num_partitions or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    mnx, mny, mxx, mxy = (F.col(c) for c in (min_x_col, min_y_col, max_x_col, max_y_col))
    if bounds is None:
        r = df.agg(F.min(mnx), F.min(mny), F.max(mxx), F.max(mxy)).collect()[0]
        bounds = (r[0], r[1], r[2], r[3]) if r[0] is not None else (0.0, 0.0, 0.0, 0.0)
    b0, b1, b2, b3 = (float(b) for b in bounds)
    sample = (
        df.select(((mnx + mxx) / 2).alias("x"), ((mny + mxy) / 2).alias("y"))
        .sample(fraction=float(sample_fraction), seed=seed)
        .limit(2_000_000)  # driver-memory guard, same as the points lane
        .collect()
    )
    sample = [r for r in sample if r.x is not None and r.y is not None]
    if sample:
        sx = np.asarray([r.x for r in sample], dtype=np.float64)
        sy = np.asarray([r.y for r in sample], dtype=np.float64)
        hs = udfs.hilbert_scaled(sx, sy, b0, b1, b2, b3)
        probs = np.arange(1, n) / n
        splits = np.unique(np.quantile(hs, probs).astype(np.int64))
    else:
        splits = np.array([], dtype=np.int64)
    nb = len(splits) + 1
    jmap = np.asarray(_hash_preimages(spark, nb), dtype=np.int32) if nb > 1 else None

    stype = T.StructType(
        [T.StructField("hilbert", T.LongType()), T.StructField("route", T.IntegerType())]
    )

    @F.pandas_udf(stype)
    def hilbert_route(cx: pd.Series, cy: pd.Series) -> pd.DataFrame:
        xs = cx.to_numpy(dtype=np.float64, na_value=np.nan)
        ys = cy.to_numpy(dtype=np.float64, na_value=np.nan)
        nan = np.isnan(xs) | np.isnan(ys)
        h = udfs.hilbert_scaled(np.nan_to_num(xs), np.nan_to_num(ys), b0, b1, b2, b3)
        bucket = (
            np.searchsorted(splits, h, side="right")
            if len(splits)
            else np.zeros(len(h), dtype=np.int64)
        )
        route = jmap[bucket] if jmap is not None else np.zeros(len(h), dtype=np.int32)
        out = {
            "hilbert": pd.arrays.IntegerArray(h, nan) if nan.any() else h,
            "route": route.astype(np.int32),
        }
        return pd.DataFrame(out)

    keep = [c for c in df.columns if c not in (min_x_col, min_y_col, max_x_col, max_y_col)]
    routed = df.select(
        "*", hilbert_route((mnx + mxx) / 2, (mny + mxy) / 2).alias("_s")
    ).select("*", F.col("_s.hilbert").alias("hilbert"), F.col("_s.route").alias("_route")).drop("_s")
    if nb == 1:
        placed = routed.coalesce(1).sortWithinPartitions("hilbert")
    else:
        placed = routed.repartition(nb, F.col("_route")).sortWithinPartitions("hilbert")
    # WKB assembled HERE — after the exchange and sort, once, in the write
    # stage; bbox sidecars are zero-cost renames of the bound columns.
    # r17: zero-boxing arrow_udf kernel, byte-identical to
    # udfs.st_makeenvelope (scripts/ab_wkb_kernel.py)
    return placed.select(
        *keep,
        _envelope_wkb_arrow(mnx, mny, mxx, mxy).alias(geom_col),
        mnx.alias(BBOX_COLS[0]),
        mny.alias(BBOX_COLS[1]),
        mxx.alias(BBOX_COLS[2]),
        mxy.alias(BBOX_COLS[3]),
        "hilbert",
    )


def write_geo_parquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    mode: str = "overwrite",
    bounds: tuple | None = None,
    num_partitions: int | None = None,
    sample_fraction: float | None = None,
    point_xy: tuple | None = None,
    box_xyxy: tuple | None = None,
) -> None:
    """Hilbert-clustered GeoParquet-style write (geometry stays WKB binary,
    which IS GeoParquet's encoding).

    ``point_xy=(x_col, y_col)``: point-ingest fast lane — geometry is
    ASSEMBLED here from numeric columns (stats jobs stay JVM-side, one
    Python crossing total; see :func:`hilbert_cluster_points`).

    ``box_xyxy=(min_x, min_y, max_x, max_y)``: box-ingest fast lane —
    same idea for rectangle extents (stats JVM-side, one narrow Python
    crossing for hilbert/route, envelope WKB built post-sort; see
    :func:`hilbert_cluster_boxes`).

    Parquet dictionary encoding is disabled: WKB geometries are near-unique,
    so dictionary pages only add CPU + a failed-dictionary fallback per row
    group (measured 2.3s of a 6s write at 10M points).

    Writer encodings (r16, optimization-guide §6 — the cluster-build lanes
    are write-wall-bound, so bytes written are the wall): v2 data pages
    (DELTA_BINARY_PACKED for the SORTED hilbert int64 + id, DELTA_BYTE_ARRAY
    prefix-delta for WKB whose consecutive rows share header + high
    coordinate bytes after the hilbert sort) + zstd. Measured on the bench
    layouts (scripts/probe_parquet_encoding.py, 3M rows, interleaved reps):
    envelope layout 76.9 -> 31.5 MB (2.4x) with best write wall 3.9 -> 3.2 s,
    point layout 176.9 -> 145.6 MB (1.22x) with 4.0 -> 2.9 s; row-identical
    content (exceptAll both ways = 0 and per-column bit_xor(xxhash64)
    signatures equal on the same staged rows) and no read-side regression
    (Spark's vectorized reader decodes v2 pages natively; probe read guard
    0.2-0.7 s across variants)."""
    if point_xy is not None:
        if bounds is None:
            # compute the exact bounds HERE (same JVM agg the cluster lane
            # would run) so the metadata sidecar needs no extra job
            r = df.agg(
                F.min(point_xy[0]), F.min(point_xy[1]), F.max(point_xy[0]), F.max(point_xy[1])
            ).collect()[0]
            # empty input (or all-null coordinates) aggregates to NULLs —
            # degenerate bounds keep the downstream arithmetic well-defined
            bounds = (r[0], r[1], r[2], r[3]) if r[0] is not None else (0.0, 0.0, 0.0, 0.0)
        clustered = hilbert_cluster_points(
            df, point_xy[0], point_xy[1], geom_col, bounds, num_partitions,
            sample_fraction if sample_fraction else 0.01,
        )
    elif box_xyxy is not None:
        if bounds is None:
            r = df.agg(
                F.min(box_xyxy[0]), F.min(box_xyxy[1]), F.max(box_xyxy[2]), F.max(box_xyxy[3])
            ).collect()[0]
            bounds = (r[0], r[1], r[2], r[3]) if r[0] is not None else (0.0, 0.0, 0.0, 0.0)
        clustered = hilbert_cluster_boxes(
            df, *box_xyxy, geom_col=geom_col, bounds=bounds,
            num_partitions=num_partitions,
            sample_fraction=sample_fraction if sample_fraction else 0.01,
        )
    else:
        clustered = hilbert_cluster(df, geom_col, bounds, num_partitions, sample_fraction)
    clustered.write.mode(mode).options(**GEO_PARQUET_WRITE_OPTIONS).parquet(path)
    if mode == "overwrite" and not path.startswith(("s3://", "s3a://", "hdfs://")):
        # metadata sidecar for append_geo_parquet: the clustering bounds
        # (explicit or just computed; the generic sampled lane reconstructs
        # from the written footer stats — its own bounds are sampled)
        # one footer-stats job at WRITE time records per-file bboxes in
        # the manifest, so a windowed read can drop whole files from the
        # driver-side manifest BEFORE Spark lists them or tasks open
        # their footers (the reference's R-tree answers the same
        # question from its root node; see scan_geo_parquet)
        frows = geo_parquet_stats(df.sparkSession, path, level="file").collect()
        fmap = {
            r["file"]: [r["min_x"], r["min_y"], r["max_x"], r["max_y"]]
            for r in frows
            if r["min_x"] is not None
        }
        eff = bounds
        if eff is None and frows:
            xs = [r for r in frows if r["min_x"] is not None]
            if xs:
                eff = (
                    min(r["min_x"] for r in xs), min(r["min_y"] for r in xs),
                    max(r["max_x"] for r in xs), max(r["max_y"] for r in xs),
                )
        if eff is not None and eff[0] is not None:
            _write_layout_meta(
                path,
                {
                    "bounds": [float(v) for v in eff],
                    "geom_col": geom_col,
                    "generation": 1,
                    "files": fmap,
                    # written schema, so scan_geo_parquet can bind the
                    # pruned file set without a per-query schema-inference
                    # footer read (measured ~0.1 s per bind)
                    "schema": clustered.schema.jsonValue(),
                },
            )


def read_geo_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def scan_geo_parquet(
    spark: SparkSession,
    path: str,
    bbox: tuple | None = None,
) -> DataFrame:
    """Read a clustered layout with MANIFEST-level file pruning.

    With ``bbox=(min_x, min_y, max_x, max_y)``, files whose manifest
    bounds (recorded at write time in ``_geo_layout.json``) don't
    intersect the window are dropped on the DRIVER, before Spark lists
    them into a file index or any task opens a parquet footer — the
    analog of the reference's R-tree descending from the root node
    (``rtree_index_plan_scan.cpp``) instead of visiting every leaf.
    Row-group skipping inside the surviving files still comes from the
    footer stats via :func:`filter_bbox`'s pushed bbox conjuncts.

    Safety contract: pruning is CONSERVATIVE — a file not listed in the
    manifest (legacy layout, foreign writer) is always read, and a
    manifest entry for a since-deleted file is ignored, so the result
    equals ``spark.read.parquet(path)`` plus the caller's own bbox
    filter in every case. Layouts maintained through
    :func:`append_geo_parquet` / :func:`compact_geo_parquet` keep the
    manifest fresh."""
    if bbox is None:
        return spark.read.parquet(path)
    meta = read_layout_meta(path)
    fmap = (meta or {}).get("files") or {}
    files = _hadoop_list_parquet(spark, path)
    if not fmap or not files:
        return spark.read.parquet(path)
    reader = spark.read
    if (meta or {}).get("schema"):
        # manifest-recorded schema: binding the pruned file set does not
        # re-infer from footers (a per-query driver-side footer read)
        reader = reader.schema(T.StructType.fromJson(meta["schema"]))
    x0, y0, x1, y1 = (float(v) for v in bbox)

    def _keep(fp: str) -> bool:
        import os as _os

        b = fmap.get(_os.path.basename(fp))
        if b is None or b[0] is None:
            return True  # unknown to the manifest: conservative read
        return not (b[2] < x0 or b[0] > x1 or b[3] < y0 or b[1] > y1)

    kept = [fp for fp in files if _keep(fp)]
    if not kept:
        # schema from the manifest (or ONE footer), zero data files
        return reader.parquet(files[0]).filter(F.lit(False))
    return reader.parquet(*kept)


def _hadoop_list_parquet(spark: SparkSession, path: str) -> list[str]:
    """List ``*.parquet`` members of ``path`` (dir | file | glob) via the
    Hadoop FileSystem API — object-store-safe, unlike a local ``glob``."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    if fs.exists(jpath):
        st = fs.getFileStatus(jpath)
        if st.isDirectory():
            stats = fs.listStatus(jpath)
            return sorted(
                s.getPath().toString()
                for s in stats
                if s.isFile() and s.getPath().getName().endswith(".parquet")
            )
        return [st.getPath().toString()]
    stats = fs.globStatus(jpath)
    if stats is None:
        return []
    # same .parquet name filter as the directory branch: a glob like dir/*
    # also matches _SUCCESS / .crc sidecars, which are not parquet footers
    return sorted(
        s.getPath().toString()
        for s in stats
        if s.isFile() and s.getPath().getName().endswith(".parquet")
    )


def _pyarrow_openable(fp: str):
    """Map a Hadoop path/URI to something pyarrow can open on an executor:
    strip ``file:`` schemes to a local path; translate ``s3a://`` to the
    ``s3://`` scheme pyarrow's native S3 filesystem expects."""
    if fp.startswith("file:"):
        rest = fp[len("file:"):]
        if rest.startswith("///"):
            rest = rest[2:]
        return rest
    if fp.startswith("s3a://"):
        return "s3://" + fp[len("s3a://"):]
    return fp


def geo_parquet_stats(
    spark: SparkSession, path: str, level: str = "rowgroup", files: list | None = None
) -> DataFrame:
    """R-tree introspection analog (``rtree_index_pragmas.cpp`` exposes
    ``rtree_index_dump`` with per-node bounding boxes; here the 'nodes' are
    parquet row groups of a :func:`write_geo_parquet` dataset).

    Returns one row per row group (or per file with ``level='file'``) with
    the bbox-column min/max from the parquet FOOTER statistics plus row
    counts — exactly the numbers the pruning rewrite skips on, so a slow
    windowed query can be debugged by eyeballing which row groups a window
    overlaps. Listing goes through the Hadoop FileSystem API (so ``file:``,
    ``hdfs:`` and ``s3a:`` dataset paths all work — no driver-side local
    glob); footers are read on executors (one task per file): no data pages
    are touched and no driver bottleneck at 100k files."""
    import os

    if files is None:
        files = _hadoop_list_parquet(spark, path)

    want_file_level = level == "file"

    def footer_stats(fp: str):
        import pyarrow.parquet as pq

        md = pq.ParquetFile(_pyarrow_openable(fp)).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = {c: names.index(c) for c in BBOX_COLS + ("hilbert",) if c in names}
        rows = []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            vals = {}
            for c, ci in idx.items():
                st = g.column(ci).statistics
                vals[c] = (st.min, st.max) if st is not None and st.has_min_max else (None, None)
            rows.append(
                (
                    os.path.basename(fp),
                    rg,
                    g.num_rows,
                    vals.get(BBOX_COLS[0], (None, None))[0],
                    vals.get(BBOX_COLS[1], (None, None))[0],
                    vals.get(BBOX_COLS[2], (None, None))[1],
                    vals.get(BBOX_COLS[3], (None, None))[1],
                    vals.get("hilbert", (None, None))[0],
                    vals.get("hilbert", (None, None))[1],
                )
            )
        if want_file_level and rows:
            agg = (
                os.path.basename(fp),
                -1,
                sum(r[2] for r in rows),
                min((r[3] for r in rows if r[3] is not None), default=None),
                min((r[4] for r in rows if r[4] is not None), default=None),
                max((r[5] for r in rows if r[5] is not None), default=None),
                max((r[6] for r in rows if r[6] is not None), default=None),
                min((r[7] for r in rows if r[7] is not None), default=None),
                max((r[8] for r in rows if r[8] is not None), default=None),
            )
            return [agg]
        return rows

    schema = (
        "file string, row_group int, n_rows long, min_x double, min_y double,"
        " max_x double, max_y double, hilbert_min long, hilbert_max long"
    )
    rdd = spark.sparkContext.parallelize(files, max(len(files), 1)).flatMap(footer_stats)
    return spark.createDataFrame(rdd, schema)


def filter_bbox(
    df: DataFrame,
    min_x: float,
    min_y: float,
    max_x: float,
    max_y: float,
    geom_col: str = "geom",
    exact: str | None = "intersects",
    points: bool = False,
    solid: bool = False,
) -> DataFrame:
    """Windowed query with data skipping.

    Emits bbox conjuncts on the plain numeric bbox columns (pushed to the
    parquet scan -> row-group skipping), then optionally re-checks the exact
    predicate against the query envelope — the same filter pull-up split as
    the reference (``rtree_index_plan_scan.cpp:207-231``).

    ``points=True`` declares every geometry a POINT (e.g. a layout written
    with ``write_geo_parquet(point_xy=...)``): a point's bbox IS the point,
    so within/intersects against the envelope are decided by plain Column
    compares on the bbox columns — no geometry decode, no Python. This is
    the native POINT fast path of the reference's ``st_contains.cpp``
    (POLYGON_2D x POINT_2D) re-expressed on the layout's sidecar columns;
    within excludes the envelope boundary, matching ST_Within.

    ``solid=True`` declares every geometry 2-DIMENSIONAL with nonempty
    interior (valid polygons/multipolygons of positive area — building
    footprints, parcels, admin boundaries). For such geometries,
    ``within`` against the AXIS-ALIGNED query envelope is decided
    exactly by the closed bbox containment alone, no WKB decode:
    (1) the sidecar bbox is tight, so geom ⊆ envelope ⟺ bbox ⊆
    envelope for an axis-aligned convex window; (2) DE-9IM Within
    additionally needs interior(geom) ∩ interior(env) ≠ ∅, and any
    interior point of geom carries an open disc inside the closed
    envelope, so it cannot lie on the envelope boundary — the interior
    condition is implied. (A boundary-hugging POINT or LINESTRING would
    break (2), which is why this is a declaration like ``points=True``,
    not an inference.) ``intersects`` keeps its boundary-band recheck —
    partial overlap is not decidable from the bbox."""
    if all(c in df.columns for c in BBOX_COLS):
        pre = (
            (F.col(BBOX_COLS[0]) <= max_x)
            & (F.col(BBOX_COLS[2]) >= min_x)
            & (F.col(BBOX_COLS[1]) <= max_y)
            & (F.col(BBOX_COLS[3]) >= min_y)
        )
        df = df.filter(pre)
    if exact and points and exact in ("within", "intersects") and all(
        c in df.columns for c in BBOX_COLS
    ):
        if exact == "within":
            return df.filter(
                (F.col(BBOX_COLS[0]) > min_x) & (F.col(BBOX_COLS[0]) < max_x)
                & (F.col(BBOX_COLS[1]) > min_y) & (F.col(BBOX_COLS[1]) < max_y)
            )
        return df  # intersects: the inclusive prefilter above IS exact for points
    if exact == "within" and solid and all(c in df.columns for c in BBOX_COLS):
        # solid-2D declaration: closed bbox containment IS ST_Within
        # against the axis-aligned envelope (see docstring) — the whole
        # query stays JVM-side, one scan, zero Python
        return df.filter(
            (F.col(BBOX_COLS[0]) >= min_x) & (F.col(BBOX_COLS[1]) >= min_y)
            & (F.col(BBOX_COLS[2]) <= max_x) & (F.col(BBOX_COLS[3]) <= max_y)
        )
    if exact:
        # envelope WKB built ONCE driver-side and shipped as a binary
        # literal: chaining st_makeenvelope(lit,...) as a pandas UDF makes
        # the Python worker rebuild the envelope per ROW (measured 4x on a
        # 10M-point scan — the constant column defeats the point fast path)
        from ..geo import geom as G
        from ..geo import wkb as WKB

        x0, y0, x1, y1 = float(min_x), float(min_y), float(max_x), float(max_y)
        env = F.lit(
            WKB.to_wkb(G.polygon([[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]))
        )
        pred = {"intersects": udfs.st_intersects, "within": udfs.st_within, "contains": udfs.st_contains}[
            exact
        ]
        if exact in ("within", "intersects") and all(c in df.columns for c in BBOX_COLS):
            # Sure-true short-circuit on the TIGHT sidecar bbox (the
            # reference's cached-bbox prefilter, geometry_type.hpp:100-146,
            # completed into a decision): geom ⊆ bbox always, and the bbox
            # is the exact extent written at cluster time, so
            #   * bbox strictly inside the OPEN envelope  ⇒ within  TRUE
            #     (geom can't touch the envelope boundary at all)
            #   * bbox inside the CLOSED envelope         ⇒ intersects TRUE
            #     (every geom point is in bbox ⊆ envelope)
            #   * within + bbox poking OUTSIDE the closed envelope ⇒ FALSE
            #     (tight bbox ⇒ some geom vertex is outside)
            # Only the boundary band (bbox touching/straddling the envelope
            # edge) decodes WKB in the exact UDF — interior rows stay
            # all-JVM. The plan is a union of a pure-Column branch and a
            # UDF branch, both reading the same pruned scan.
            bx0, by0, bx1, by1 = (F.col(c) for c in BBOX_COLS)
            inside_closed = (
                (bx0 >= min_x) & (by0 >= min_y) & (bx1 <= max_x) & (by1 <= max_y)
            )
            if exact == "within":
                sure_true = (
                    (bx0 > min_x) & (by0 > min_y) & (bx1 < max_x) & (by1 < max_y)
                )
                band = inside_closed & ~sure_true
            else:
                sure_true = inside_closed
                band = ~inside_closed
            # ONE scan (r13; the union-of-branches this replaces read the
            # pruned files twice — two jobs for a count): the UDF input is
            # null-masked to the boundary band, so ExtractPythonUDFs may
            # schedule it over every pruned row but the kernel's null fast
            # path touches only band rows, and Arrow ships a null bitmap
            # for the rest. Semantics unchanged: sure_true rows pass
            # outright, band rows are decided by the exact WKB predicate,
            # outside-band rows fail both disjuncts.
            band_pred = F.coalesce(
                pred(F.when(band, F.col(geom_col)), env), F.lit(False)
            )
            return df.filter(sure_true | band_pred)
        df = df.filter(pred(F.col(geom_col), env))
    return df


# ---------------------------------------------------------------------------
# incremental maintenance (reference core/index/rtree/rtree.cpp keeps the
# R-tree current under insert/delete with a WAL; the lakehouse-shaped analog
# for a clustered-parquet layout is append-batch + fragmentation metric +
# offline compaction, like OPTIMIZE in the public Delta/Iceberg designs)
# ---------------------------------------------------------------------------
_LAYOUT_META = "_geo_layout.json"


def _write_layout_meta(path: str, meta: dict) -> None:
    import json as _json
    import os as _os

    with open(_os.path.join(path, _LAYOUT_META), "w", encoding="utf-8") as f:
        _json.dump(meta, f)


def read_layout_meta(path: str) -> dict | None:
    """Layout metadata written by :func:`write_geo_parquet` (None for
    layouts written before this existed — callers fall back to footer
    stats). Spark ignores underscore-prefixed files, so the sidecar never
    pollutes reads."""
    import json as _json
    import os as _os

    p = _os.path.join(path, _LAYOUT_META)
    if not _os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return _json.load(f)


def append_geo_parquet(
    df: DataFrame,
    path: str,
    geom_col: str = "geom",
    num_partitions: int | None = None,
    sample_fraction: float | None = None,
    point_xy: tuple | None = None,
) -> None:
    """Append a batch to an existing clustered layout (rtree.cpp:Insert
    analog). The batch is Hilbert-clustered against the layout's ORIGINAL
    bounds — hilbert values stay comparable across generations, so bbox
    pruning and the hilbert sort order remain valid; the new files simply
    overlap old ones in hilbert range until :func:`compact_geo_parquet`
    folds them in. Bounds come from the metadata sidecar, else from the
    bbox footer stats of the existing files (legacy layouts)."""
    meta = read_layout_meta(path)
    if meta is not None:
        bounds = tuple(meta["bounds"])
    else:
        spark = df.sparkSession
        st = geo_parquet_stats(spark, path, level="file").agg(
            F.min("min_x"), F.min("min_y"), F.max("max_x"), F.max("max_y")
        ).collect()[0]
        if st[0] is None:
            raise ValueError(f"{path}: not an existing clustered layout (no bbox stats)")
        bounds = (st[0], st[1], st[2], st[3])
    write_geo_parquet(
        df, path, geom_col=geom_col, mode="append", bounds=bounds,
        num_partitions=num_partitions, sample_fraction=sample_fraction,
        point_xy=point_xy,
    )
    gen = (meta or {}).get("generation", 1) + 1
    # refresh the per-file bounds so scan_geo_parquet's manifest pruning
    # stays exact across generations (one footer-stats job, append-time)
    frows = geo_parquet_stats(df.sparkSession, path, level="file").collect()
    fmap = {
        r["file"]: [r["min_x"], r["min_y"], r["max_x"], r["max_y"]]
        for r in frows
        if r["min_x"] is not None
    }
    _write_layout_meta(path, {**(meta or {"bounds": list(bounds), "geom_col": geom_col}),
                              "generation": gen, "files": fmap})


def layout_fragmentation(
    spark: SparkSession, path: str, files: list | None = None
) -> float:
    """Mean number of OTHER files each file overlaps in hilbert range,
    normalized by file count (0 = perfectly disjoint ranges, -> 1 = every
    file overlaps every other). Freshly-clustered layouts sit near 0;
    appends push it up — the driver-side signal for when to compact.
    ``files`` restricts the computation to an explicit list (snapshot
    manifests) instead of listing the directory."""
    import heapq

    rows = geo_parquet_stats(spark, path, level="file", files=files).select(
        "hilbert_min", "hilbert_max"
    ).collect()
    rng = [(r.hilbert_min, r.hilbert_max) for r in rows if r.hilbert_min is not None]
    k = len(rng)
    if k <= 1:
        return 0.0
    # O(k log k) sweep (100k-file layouts would make the naive pairwise
    # loop a 10^10-op driver stall): process intervals by start; every
    # interval still active (end >= this start) overlaps this one
    overlaps = 0
    active: list = []  # min-heap of ends
    for lo, hi in sorted(rng):
        while active and active[0] < lo:
            heapq.heappop(active)
        overlaps += 2 * len(active)
        heapq.heappush(active, hi)
    return overlaps / (k * (k - 1))


def compact_geo_parquet(
    spark: SparkSession,
    path: str,
    geom_col: str = "geom",
    num_partitions: int | None = None,
    min_fragmentation: float = 0.0,
) -> bool:
    """Re-cluster the whole layout in place (OPTIMIZE analog; the reference
    instead maintains the R-tree online via its WAL — rtree.cpp:63-118 —
    which parquet files can't do). Skips when fragmentation <=
    ``min_fragmentation``. Rewrites into a sibling temp dir then swaps via
    two renames — readers already BOUND to the old files keep working, but
    the swap is NOT atomic: between the two renames the dataset path
    briefly does not exist, so a reader binding at that instant fails.
    Single-writer / no-concurrent-bind semantics; a truly atomic swap
    needs a symlink flip or a table-format commit protocol (Iceberg/Delta),
    which is the recommended wrapper at production scale."""
    import os as _os
    import shutil as _shutil

    if layout_fragmentation(spark, path) <= min_fragmentation:
        return False
    meta = read_layout_meta(path)
    bounds = tuple(meta["bounds"]) if meta else None
    df = spark.read.parquet(path).drop(*BBOX_COLS, "hilbert")
    tmp = path.rstrip("/") + "__compact"
    write_geo_parquet(df, tmp, geom_col=geom_col, mode="overwrite", bounds=bounds,
                      num_partitions=num_partitions)
    if meta:
        # keep the FRESH per-file bounds write_geo_parquet just recorded
        # for the compacted files; carry identity fields + generation
        fresh = read_layout_meta(tmp) or {}
        _write_layout_meta(
            tmp, {**meta, **fresh, "generation": meta.get("generation", 1) + 1}
        )
    old = path.rstrip("/") + "__old"
    _os.rename(path, old)
    _os.rename(tmp, path)
    _shutil.rmtree(old)
    return True
