"""Spatial join: ``FROM a JOIN b ON ST_Predicate(a.geom, b.geom)``.

The reference rewrites such joins into a bbox range-join plus an exact
re-check filter (``spatial/src/spatial/core/optimizer_rules.cpp:33-279``:
``a.xmin<=b.xmax AND a.xmax>=b.xmin AND ...`` + LogicalFilter). OSS Spark has
no IEJoin physical operator, so the bbox phase is re-expressed as a
**grid-tessellation equi-join** (the published SpatialSpark/Sedona approach,
see PAPERS.md):

  1. bbox per row (sidecar struct column, the reference's cached-bbox analog)
  2. explode each side onto the fixed grid cells its bbox overlaps —
     pure-Column ``explode(sequence(...))``, stays JVM-side
  3. shuffle equi-join on cell id (hash-partitioned both sides — scales
     linearly with executors; no broadcast of the big side)
  4. bbox-overlap conjuncts (cheap, codegen'd)
  5. de-duplicate multi-cell pairs with the *reference-point* trick: a pair
     is emitted only in the cell containing the top-left corner of the two
     bboxes' intersection — no dropDuplicates shuffle needed
  6. exact predicate re-check (pandas UDF over WKB) — same two-phase
     exactness argument as the reference (bbox overlap is implied by all
     supported predicates, ``optimizer_rules.cpp:30-31``)

A **broadcast** strategy covers the small-side case (the reference's
prepared-geometry probe, ``geos_executor.hpp:28-67``): the small side is
collected into an in-memory grid index, broadcast, and probed per Arrow
batch with mapInPandas — zero shuffle.

All 10 reference predicates are supported; ``ST_Disjoint`` is NOT eligible
(same exclusion as ``optimizer_rules.cpp:95``).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geo import algorithms as A
from ..geo import wkb as WKB
from ..functions import udfs

_PREDICATES = {
    "intersects": A.intersects,
    "contains": A.contains,
    "contains_properly": A.contains_properly,
    "within": A.within,
    "covers": lambda a, b: A.covers(a, b),
    "covered_by": A.covered_by,
    "touches": A.touches,
    "crosses": A.crosses,
    "overlaps": A.overlaps,
    "equals": A.equals,
    "dwithin": None,  # handled specially (distance arg)
}

_CELL_SHIFT = 1 << 22  # pack (cx, cy) into one bigint cell id
_SJ_ID = "__sj_left_id"  # surrogate key for left/semi/anti reconciliation


def _with_bbox(df: DataFrame, geom_col: str, prefix: str) -> DataFrame:
    bb = f"{prefix}_bbox"
    return df.withColumn(bb, udfs.st_extent(F.col(geom_col))).filter(F.col(bb + ".min_x").isNotNull())


def _grid_params(left_b: DataFrame, right_b: DataFrame, lp: str, rp: str, cell_size, pad=0.0):
    """One tiny aggregate job per side to size the grid (like the reference's
    bind-time statistics; runs once per join)."""
    stats = []
    for df, p in ((left_b, lp), (right_b, rp)):
        r = df.agg(
            F.min(f"{p}_bbox.min_x").alias("mnx"),
            F.min(f"{p}_bbox.min_y").alias("mny"),
            F.max(f"{p}_bbox.max_x").alias("mxx"),
            F.max(f"{p}_bbox.max_y").alias("mxy"),
            F.avg(F.col(f"{p}_bbox.max_x") - F.col(f"{p}_bbox.min_x")).alias("aw"),
            F.avg(F.col(f"{p}_bbox.max_y") - F.col(f"{p}_bbox.min_y")).alias("ah"),
        ).collect()[0]
        stats.append(r)
    if any(s.mnx is None for s in stats):
        return None
    min_x = min(s.mnx for s in stats)
    min_y = min(s.mny for s in stats)
    max_x = max(s.mxx for s in stats)
    max_y = max(s.mxy for s in stats)
    if cell_size is None:
        avg_dim = max(max(s.aw or 0.0, s.ah or 0.0) for s in stats)
        extent = max(max_x - min_x, max_y - min_y, 1e-9)
        # ~2 cells per avg (pad-expanded) geometry; degenerate (point) data
        # falls back to a 1024^2 grid; never more than 2^20 cells per axis
        base = avg_dim * 2.0 + pad * 2.0
        if base <= 0:
            base = extent / 1024.0
        cell_size = max(base, extent / float(1 << 20))
    return float(min_x), float(min_y), float(cell_size)


def _cells(df: DataFrame, p: str, origin_x, origin_y, cs, pad) -> DataFrame:
    """Explode rows onto overlapped grid cells — sequence() keeps it JVM-side."""
    bb = f"{p}_bbox"
    cx0 = F.floor((F.col(f"{bb}.min_x") - pad - origin_x) / cs).cast("long")
    cx1 = F.floor((F.col(f"{bb}.max_x") + pad - origin_x) / cs).cast("long")
    cy0 = F.floor((F.col(f"{bb}.min_y") - pad - origin_y) / cs).cast("long")
    cy1 = F.floor((F.col(f"{bb}.max_y") + pad - origin_y) / cs).cast("long")
    return (
        df.withColumn(f"{p}_cx", F.explode(F.sequence(cx0, cx1)))
        .withColumn(f"{p}_cy", F.explode(F.sequence(cy0, cy1)))
        .withColumn(f"{p}_cell", F.col(f"{p}_cx") * _CELL_SHIFT + F.col(f"{p}_cy"))
    )


def _make_recheck_udf(predicate: str, distance):
    from pyspark.sql import types as T

    pred_fn = _PREDICATES[predicate]

    @F.pandas_udf(T.BooleanType())
    def recheck(a: pd.Series, b: pd.Series) -> pd.Series:
        # vectorized lane: left side all 2D-point WKBs (the dominant join
        # shape) -> group rows by the right geometry and run one numpy
        # point-in-polygon per distinct geometry instead of per pair
        if predicate in ("within", "intersects", "covered_by"):
            from ..functions import fastpath

            pa = fastpath.points_xy(a)
            if pa is not None:
                xs, ys, mask = pa
                out = np.zeros(len(a), dtype=bool)
                groups: dict = {}
                bvals = b.to_numpy(dtype=object)
                for i, bv in enumerate(bvals):
                    if bv is None or not mask[i]:
                        continue
                    groups.setdefault(bytes(bv), []).append(i)
                vectorized = True
                results = {}
                for bb, idxs in groups.items():
                    g = udfs._g(bb)
                    ii = np.asarray(idxs)
                    st_arr = fastpath._poly_state_or_none((xs[ii], ys[ii], None), g)
                    if st_arr is None:
                        vectorized = False
                        break
                    if predicate == "within":
                        results[bb] = (ii, st_arr == 2)
                    else:
                        results[bb] = (ii, st_arr >= 1)
                if vectorized:
                    for ii, vals in results.values():
                        out[ii] = vals
                    return pd.Series(out)
        out = []
        for x, y in zip(a, b):
            if x is None or y is None:
                out.append(False)
                continue
            ga, gb = udfs._g(x), udfs._g(y)
            if predicate == "dwithin":
                out.append(A.dwithin(ga, gb, distance))
            else:
                out.append(pred_fn(ga, gb))
        return pd.Series(out)

    return recheck


def st_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    left_geom: str = "geom",
    right_geom: str = "geom",
    how: str = "inner",
    strategy: str = "auto",
    cell_size: float | None = None,
    distance: float | None = None,
    broadcast_threshold: int = 100_000,
    left_point: tuple | None = None,
    right_bbox: tuple | None = None,
    right_is_box: bool = False,
) -> DataFrame:
    """Spatial join of two DataFrames on a spatial predicate.

    how: inner | left_semi | left_anti | left. Column name clashes on the
    right side get a ``_right`` suffix (geometry columns included).

    Native fast lane (the 100-TB path): pass ``left_point=("x", "y")``
    and/or ``right_bbox=("mnx", "mny", "mxx", "mxy")`` to build the bbox
    sidecars from plain columns (no Python). With ``right_is_box=True``
    and a point left side, within/intersects/covered_by/dwithin joins
    skip the exact-recheck UDF entirely — the whole join is JVM-side
    (bbox test IS the exact test for point×box)."""
    if predicate not in _PREDICATES:
        raise ValueError(f"unsupported predicate {predicate!r}; supported: {sorted(_PREDICATES)}")
    if predicate == "dwithin" and distance is None:
        raise ValueError("dwithin requires distance=")
    if predicate == "disjoint":
        raise ValueError("disjoint joins are not accelerable (reference excludes them too)")

    # left/semi/anti reconciliation joins back on a surrogate row id, never on
    # the left columns themselves: plain equality drops NULL-bearing rows,
    # collapses duplicate rows, and would compare full WKB blobs in the
    # shuffle. The id is assigned before the spatial join so it rides through
    # it; both reconciliation branches derive from this same tagged plan.
    if how != "inner":
        left = left.withColumn(_SJ_ID, F.monotonically_increasing_id())

    # disambiguate clashing column names (right gets _right suffix)
    clash = set(left.columns) & set(right.columns)
    renames = {c: f"{c}_right" for c in clash}
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    if right_geom in renames:
        right_geom = renames[right_geom]
    if right_bbox is not None:
        right_bbox = tuple(renames.get(c, c) for c in right_bbox)

    if left_point is not None:
        px, py = (F.col(c) for c in left_point)
        lb = left.withColumn(
            "l_bbox",
            F.struct(px.alias("min_x"), py.alias("min_y"), px.alias("max_x"), py.alias("max_y")),
        ).filter(px.isNotNull() & py.isNotNull())
    else:
        lb = _with_bbox(left, left_geom, "l")
    if right_bbox is not None:
        c0, c1, c2, c3 = (F.col(c) for c in right_bbox)
        rb = right.withColumn(
            "r_bbox",
            F.struct(c0.alias("min_x"), c1.alias("min_y"), c2.alias("max_x"), c3.alias("max_y")),
        ).filter(c0.isNotNull() & c2.isNotNull())
    else:
        rb = _with_bbox(right, right_geom, "r")

    # point x box: the bbox comparison IS the exact predicate -> no UDF
    native_exact = None
    if left_point is not None and right_is_box:
        if predicate == "within":
            native_exact = (
                (F.col("l_bbox.min_x") > F.col("r_bbox.min_x"))
                & (F.col("l_bbox.min_x") < F.col("r_bbox.max_x"))
                & (F.col("l_bbox.min_y") > F.col("r_bbox.min_y"))
                & (F.col("l_bbox.min_y") < F.col("r_bbox.max_y"))
            )
        elif predicate in ("intersects", "covered_by"):
            native_exact = F.lit(True)  # bbox-overlap prefilter already exact
        elif predicate == "dwithin":
            dx = F.greatest(
                F.col("r_bbox.min_x") - F.col("l_bbox.min_x"),
                F.col("l_bbox.min_x") - F.col("r_bbox.max_x"),
                F.lit(0.0),
            )
            dy = F.greatest(
                F.col("r_bbox.min_y") - F.col("l_bbox.min_y"),
                F.col("l_bbox.min_y") - F.col("r_bbox.max_y"),
                F.lit(0.0),
            )
            native_exact = F.sqrt(dx * dx + dy * dy) <= F.lit(float(distance))

    if strategy == "auto":
        # broadcast when the build side is small by plan statistics (the
        # analog of Spark's own autoBroadcastJoinThreshold); native-exact
        # grid is already UDF-free so prefer it when available
        strategy = "grid"
        if native_exact is None and right_geom in rb.columns:
            try:
                # broadcast probe is Python-per-row: only worth it for tiny
                # build sides (measured: 20k-geometry side is faster via grid)
                size = int(rb._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
                if size < 256 * 1024:
                    strategy = "broadcast"
            except Exception:
                pass

    if strategy == "broadcast":
        if left_geom not in lb.columns or right_geom not in rb.columns:
            raise ValueError(
                "broadcast strategy needs geometry columns on both sides; "
                "native bbox-only inputs are grid-join only"
            )
        joined = _broadcast_join(lb, rb, predicate, left_geom, right_geom, distance, left, right)
    else:
        joined = _grid_join(
            lb, rb, predicate, left_geom, right_geom, cell_size, distance, native_exact
        )

    if how == "inner":
        return joined
    matched_ids = joined.select(_SJ_ID).distinct()
    if how in ("left_semi", "left_anti"):
        return left.join(matched_ids, on=_SJ_ID, how=how).drop(_SJ_ID)
    if how == "left":
        unmatched = left.join(matched_ids, on=_SJ_ID, how="left_anti")
        for c in [c for c in joined.columns if c not in left.columns]:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(joined.schema[c].dataType))
        return joined.unionByName(unmatched).drop(_SJ_ID)
    raise ValueError(f"unsupported how={how!r}")


def st_join_stream_static(
    stream,
    static: DataFrame,
    predicate: str = "within",
    cell_size: float = 100.0,
    left_point: tuple = ("x", "y"),
    right_geom: str = "geom",
    distance: float | None = None,
) -> DataFrame:
    """Stream-static spatial join for Structured Streaming.

    The batch grid join sizes its grid with two aggregate jobs — illegal on
    a stream — so this variant takes an explicit ``cell_size`` and a fixed
    origin (0,0). Stream side provides point columns (pure-Column cell
    assignment, watermark-compatible); the static side is bbox'd/exploded
    once and broadcast by Spark's stream-static equi-join."""
    px, py = (F.col(c) for c in left_point)
    pad = float(distance or 0.0)
    lc = (
        stream.filter(px.isNotNull() & py.isNotNull())
        .withColumn("_cx", F.explode(F.sequence(
            F.floor((px - pad) / cell_size).cast("long"), F.floor((px + pad) / cell_size).cast("long"))))
        .withColumn("_cy", F.explode(F.sequence(
            F.floor((py - pad) / cell_size).cast("long"), F.floor((py + pad) / cell_size).cast("long"))))
        .withColumn("_cell", F.col("_cx") * _CELL_SHIFT + F.col("_cy"))
        .drop("_cx", "_cy")
    )
    rb = _with_bbox(static, right_geom, "r")
    rc = _cells(rb, "r", 0.0, 0.0, cell_size, 0.0).drop("r_cx", "r_cy")
    cond = (
        (px - pad <= F.col("r_bbox.max_x"))
        & (px + pad >= F.col("r_bbox.min_x"))
        & (py - pad <= F.col("r_bbox.max_y"))
        & (py + pad >= F.col("r_bbox.min_y"))
    )
    joined = lc.join(rc, lc["_cell"] == rc["r_cell"], "inner").filter(cond)
    # reference-point dedup on the stream side
    ref_cell = (
        F.floor((F.greatest(px - pad, F.col("r_bbox.min_x"))) / cell_size).cast("long") * _CELL_SHIFT
        + F.floor((F.greatest(py - pad, F.col("r_bbox.min_y"))) / cell_size).cast("long")
    )
    joined = joined.filter(F.col("_cell") == ref_cell)
    recheck = _make_recheck_udf(predicate, distance)
    from ..functions import udfs as _udfs

    pt = _udfs.st_point(px, py)
    joined = joined.filter(recheck(pt, F.col(right_geom)))
    return joined.drop("_cell", "r_cell", "r_bbox")


def _grid_join(lb, rb, predicate, left_geom, right_geom, cell_size, distance, native_exact=None):
    pad = float(distance or 0.0)
    params = _grid_params(lb, rb, "l", "r", cell_size, pad)
    out_cols = [c for c in lb.columns if c != "l_bbox"] + [c for c in rb.columns if c != "r_bbox"]
    if params is None:  # one side has no non-null geometry
        return lb.limit(0).crossJoin(rb.limit(0)).select(*out_cols)
    ox, oy, cs = params

    lc = _cells(lb, "l", ox, oy, cs, pad)
    rc = _cells(rb, "r", ox, oy, cs, 0.0)

    bbox_overlap = (
        (F.col("l_bbox.min_x") - pad <= F.col("r_bbox.max_x"))
        & (F.col("l_bbox.max_x") + pad >= F.col("r_bbox.min_x"))
        & (F.col("l_bbox.min_y") - pad <= F.col("r_bbox.max_y"))
        & (F.col("l_bbox.max_y") + pad >= F.col("r_bbox.min_y"))
    )
    # reference-point dedup: count the pair only in the cell that contains the
    # lower-left corner of the bbox intersection
    ref_x = F.greatest(F.col("l_bbox.min_x") - pad, F.col("r_bbox.min_x"))
    ref_y = F.greatest(F.col("l_bbox.min_y") - pad, F.col("r_bbox.min_y"))
    ref_cell = (
        F.floor((ref_x - ox) / cs).cast("long") * _CELL_SHIFT + F.floor((ref_y - oy) / cs).cast("long")
    )

    pairs = (
        lc.join(rc, on=lc["l_cell"] == rc["r_cell"], how="inner")
        .filter(bbox_overlap)
        .filter(F.col("l_cell") == ref_cell)
    )
    if native_exact is not None:
        pairs = pairs.filter(native_exact)  # pure Column — whole join JVM-side
    else:
        recheck = _make_recheck_udf(predicate, distance)
        pairs = pairs.filter(recheck(F.col(left_geom), F.col(right_geom)))
    return pairs.select(*out_cols)


def _broadcast_join(lb, rb, predicate, left_geom, right_geom, distance, left, right):
    """Collect + broadcast the right side as an in-memory grid index; probe
    the left side per Arrow batch (no shuffle at all)."""
    rows = rb.collect()
    out_cols = [c for c in lb.columns if c != "l_bbox"] + [c for c in rb.columns if c != "r_bbox"]
    r_cols = [c for c in rb.columns if c != "r_bbox"]
    geoms = []
    boxes = []
    payload = []
    for r in rows:
        d = r.asDict()
        b = d[right_geom]
        if b is None:
            continue
        g = WKB.from_wkb(bytes(b))
        bb = A.bounds(g)
        if bb is None:
            continue
        geoms.append(g)
        boxes.append(bb)
        payload.append([d[c] for c in r_cols])
    if not boxes:
        empty = lb.limit(0)
        for c in r_cols:
            empty = empty.withColumn(c, F.lit(None))
        return empty.select(*out_cols)

    boxes_np = np.asarray(boxes)
    # grid sized to ~4 entries per cell
    span_x = max(boxes_np[:, 2].max() - boxes_np[:, 0].min(), 1e-9)
    cs = max(span_x / max(int(np.sqrt(len(boxes) / 4)) + 1, 1), 1e-9)
    ox, oy = float(boxes_np[:, 0].min()), float(boxes_np[:, 1].min())
    index = defaultdict(list)
    for i, bb in enumerate(boxes):
        for cx in range(int((bb[0] - ox) / cs), int((bb[2] - ox) / cs) + 1):
            for cy in range(int((bb[1] - oy) / cs), int((bb[3] - oy) / cs) + 1):
                index[(cx, cy)].append(i)

    spark = lb.sparkSession
    bc = spark.sparkContext.broadcast((index, boxes_np, [WKB.to_wkb(g) for g in geoms], payload, ox, oy, cs))
    pred_name = predicate
    dist = distance
    l_schema = lb.drop("l_bbox").schema
    from pyspark.sql import types as T

    out_schema = T.StructType(list(l_schema.fields) + [f for f in rb.schema.fields if f.name != "r_bbox"])
    l_cols = [c for c in lb.columns if c != "l_bbox"]
    lg_idx = l_cols.index(left_geom)

    def probe(batches):
        import functools

        from ..functions import fastpath

        index, boxes_np, wkbs, payload, ox, oy, cs = bc.value
        parse = functools.lru_cache(maxsize=None)(lambda i: WKB.from_wkb(wkbs[i]))
        pred = _PREDICATES[pred_name]
        pad = float(dist or 0.0)
        for pdf in batches:
            # vectorized lane: all-point probe side + polygon build side
            if pred_name in ("within", "intersects", "covered_by") and len(pdf):
                pa = fastpath.points_xy(pdf.iloc[:, lg_idx])
                if pa is not None:
                    xs, ys, mask = pa
                    out_rows = []
                    for i in range(len(wkbs)):
                        bb = boxes_np[i]
                        cand = (
                            (xs >= bb[0] - pad)
                            & (xs <= bb[2] + pad)
                            & (ys >= bb[1] - pad)
                            & (ys <= bb[3] + pad)
                            & mask
                        )
                        if not cand.any():
                            continue
                        idxs = np.nonzero(cand)[0]
                        st_arr = fastpath._poly_state_or_none((xs[idxs], ys[idxs], None), parse(i))
                        if st_arr is None:
                            break  # build side not polygonal: per-row path
                        ok = st_arr == 2 if pred_name == "within" else st_arr >= 1
                        for j in idxs[ok]:
                            out_rows.append(list(pdf.iloc[j]) + payload[i])
                    else:
                        if out_rows:
                            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])
                        else:
                            yield pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})
                        continue
            out_rows = []
            for row in pdf.itertuples(index=False):
                b = row[lg_idx]
                if b is None:
                    continue
                g = WKB.from_wkb(bytes(b))
                bb = A.bounds(g)
                if bb is None:
                    continue
                cand = set()
                for cx in range(int((bb[0] - pad - ox) / cs), int((bb[2] + pad - ox) / cs) + 1):
                    for cy in range(int((bb[1] - pad - oy) / cs), int((bb[3] + pad - oy) / cs) + 1):
                        cand.update(index.get((cx, cy), ()))
                for i in sorted(cand):
                    obb = boxes_np[i]
                    if bb[0] - pad > obb[2] or bb[2] + pad < obb[0] or bb[1] - pad > obb[3] or bb[3] + pad < obb[1]:
                        continue
                    og = parse(i)
                    ok = A.dwithin(g, og, pad) if pred_name == "dwithin" else pred(g, og)
                    if ok:
                        out_rows.append(list(row) + payload[i])
            if out_rows:
                yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])
            else:
                yield pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})

    return lb.drop("l_bbox").mapInPandas(probe, schema=out_schema)
