"""Streaming spatial / dedup pipelines (Structured Streaming).

Batch parity: each function also accepts a batch DataFrame (Spark's
unified API), so the same plan is testable synchronously and deployable
on a stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def streaming_envelope_counts(
    events: DataFrame,
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
    envelope=(450.0, 450.0, 650.0, 650.0),
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Geofence hit counts per event-time window.

    The spatial predicate is the native columnar kernel (pure comparisons),
    so the streaming plan contains no Python and supports watermarked state
    cleanup — the 100-TB/day shape."""
    from ..functions import native

    hit = native.point_in_box(
        F.col(x_col), F.col(y_col), envelope[0], envelope[1], envelope[2], envelope[3]
    )
    out = events.filter(hit)
    if out.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    return out.groupBy(F.window(F.col(ts_col), window).alias("w")).agg(
        F.count("*").alias("n_hits")
    ).select(F.col("w.start").alias("window_start"), "n_hits")


def streaming_session_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content fingerprint
    wins; later duplicates are dropped across micro-batches via
    applyInPandasWithState (GroupState keyed by fingerprint).

    ``state_ttl_ms``: optional ProcessingTimeTimeout TTL — a fingerprint
    not seen for this long is evicted, so a duplicate arriving later than
    the TTL is re-emitted. Without it the fingerprint state grows with the
    number of DISTINCT documents forever (unbounded at 100 TB/day unless
    the keyspace is bounded); dedup-within-retention is the standard
    trade (same contract as Kafka Streams' windowed dedup)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.textops import fingerprint

    fp = fingerprint(docs, text_col).withColumn("fp", F.col("fingerprint")).drop("fingerprint")

    out_schema = T.StructType(
        [
            T.StructField("fp", T.LongType()),
            T.StructField(id_col, T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    ttl = int(state_ttl_ms) if state_ttl_ms else 0

    def dedupe(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # TTL expiry tick: drop the fingerprint; a future duplicate
            # re-enters as first-seen
            state.remove()
            return iter([])
        seen = state.exists
        if ttl:
            state.setTimeoutDuration(ttl)
        if seen:
            return iter([])
        first_id = None
        for pdf in pdfs:
            if len(pdf):
                mn = int(pdf[id_col].min())
                first_id = mn if first_id is None else min(first_id, mn)
        state.update((True,))
        if first_id is None:
            return iter([])
        return iter([pd.DataFrame({"fp": [key[0]], id_col: [first_id]})])

    if fp.isStreaming:
        timeout = (
            GroupStateTimeout.ProcessingTimeTimeout if ttl else GroupStateTimeout.NoTimeout
        )
        return fp.groupBy("fp").applyInPandasWithState(
            dedupe, out_schema, state_schema, "append", timeout
        )
    # batch parity path
    from ..operators.dedup import dedup_exact

    return dedup_exact(fp, "fp", id_col=id_col).select("fp", id_col)


def streaming_interval_join(
    left,
    right,
    key_col: str,
    ts_col: str = "ts",
    tolerance: str = "2 minutes",
    watermark: str = "2 hours",
):
    """Stream-stream inner join on a key within an event-time tolerance
    (|ts_l - ts_r| <= tolerance) — the Structured Streaming two-stream
    correlation primitive (enrichment, funnel stitching). Both sides are
    watermarked so the join state is bounded: rows older than
    watermark + tolerance are evicted. Fully JVM-side (no Python in the
    streaming plan)."""
    from pyspark.sql import functions as F

    a = left.withWatermark(ts_col, watermark).alias("l")
    b = right.withWatermark(ts_col, watermark).alias("r")
    tol = F.expr(f"INTERVAL {tolerance}")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}") - tol)
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + tol)
    )
    return a.join(b, cond, "inner")


def streaming_extent_agg(
    events: DataFrame,
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed ST_Extent_Agg on a stream: per event-time window, the
    bounding box (+ count) of the points that arrived in it — the
    continuous-aggregate (hypertable-rollup) shape. min/max are
    map-side-combinable, so the streaming state per window is four doubles
    and a long regardless of input volume; watermarking bounds the number
    of open windows. Pure Column plan (no Python), batch/stream unified."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.min(x_col).alias("min_x"),
            F.min(y_col).alias("min_y"),
            F.max(x_col).alias("max_x"),
            F.max(y_col).alias("max_y"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("window_start"), "min_x", "min_y", "max_x", "max_y", "n")
    )


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates on a STREAM via the built-in
    ``session_window`` — the same plan :func:`duckdb_spatial_spark.
    operators.events.session_stats` runs in batch, plus a watermark, so
    batch and streaming sessionization are literally one implementation
    (the merging partial aggregation; state per open session is the
    aggregate tuple, and the watermark bounds how long a session can
    stay open).

    Returns ``(user, session_start, session_end, n_events[, sum_value])``
    with start/end as min/max EVENT timestamps (padding-independent, so
    a plain gaps-and-islands SQL oracle replays the values)."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap), F.col(user_col)
        )
        .agg(*aggs)
        .drop("session_window")
    )


def streaming_tagged_transform(
    points: DataFrame,
    dst_crs: str,
    crs: str,
    ts_col: str = "ts",
    x_col: str = "x",
    y_col: str = "y",
    z_col: str | None = None,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tagged-CRS transform on a stream: the source-declared CRS rides the
    geom column's metadata into the streaming plan (the same ``crs`` tag
    convention every st_read source uses) and ``st_transform_tagged``
    consumes it — no caller-side restatement of what the source already
    declared. A watermarked per-window extent of the TRANSFORMED
    coordinates follows, so state stays four doubles + a long per window
    (the reference's proj transform is a per-row scalar the same way,
    proj/functions.cpp; here it is one Arrow-batched kernel inside the
    micro-batch).

    ``z_col`` (r16): builds POINT Z inputs so compound/vertical tags
    ('EPSG:4326+5703', 5498, MSL depth codes...) resolve their geoid
    grids inside the micro-batch exactly like the batch path — executor
    workers find GTX grids through register_vertical_grid() or the
    PROJ_DATA convention dir — and the windowed extent gains
    min_z/max_z of the TRANSFORMED heights (state: six doubles + a
    long per window)."""
    from ..functions import udfs
    from ..functions.crs import st_transform_tagged

    if z_col is not None:
        g = points.withColumn(
            "geom",
            udfs.st_point3d(F.col(x_col).cast("double"),
                            F.col(y_col).cast("double"),
                            F.col(z_col).cast("double")),
        )
    else:
        g = points.withColumn(
            "geom",
            udfs.st_point(F.col(x_col).cast("double"),
                          F.col(y_col).cast("double")),
        )
    g = g.withMetadata("geom", {"crs": str(crs)})
    t = st_transform_tagged(g, dst_crs)
    t = t.withColumn("tx", udfs.st_x(F.col("geom"))).withColumn(
        "ty", udfs.st_y(F.col("geom"))
    )
    aggs = [
        F.min("tx").alias("min_x"), F.min("ty").alias("min_y"),
        F.max("tx").alias("max_x"), F.max("ty").alias("max_y"),
    ]
    cols = ["min_x", "min_y", "max_x", "max_y"]
    if z_col is not None:
        t = t.withColumn("tz", udfs.st_z(F.col("geom")))
        aggs += [F.min("tz").alias("min_z"), F.max("tz").alias("max_z")]
        cols += ["min_z", "max_z"]
    aggs.append(F.count("*").alias("n"))
    if t.isStreaming:
        t = t.withWatermark(ts_col, watermark)
    return t.groupBy(F.window(F.col(ts_col), window).alias("w")).agg(
        *aggs
    ).select(F.col("w.start").alias("window_start"), *cols, "n")


def streaming_ivf_probe(
    queries: DataFrame,
    index_path: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 3,
) -> DataFrame:
    """Probe a PERSISTENT IVF index (built by operators.knn.build_ivf_index)
    from a stream of query vectors: nprobe nearest cells per query (Arrow
    kernel over broadcast centroids), stream-static equi-join against the
    cell-partitioned vector layout, exact cosine re-rank inside the probed
    lists. Top-k collapses per query via sort_array+slice inside the
    aggregation (streaming plans cannot use rank() windows), emitting one
    row per query with the ranked (cosine, neighbor) array."""
    import json as _json
    import os as _os

    from ..operators.knn import _cosine_batch

    spark = queries.sparkSession
    with open(_os.path.join(index_path, "centroids.json"), encoding="utf-8") as f:
        meta = _json.load(f)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    nprobe = min(int(nprobe), len(cent))
    bc = spark.sparkContext.broadcast(cent)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        C = bc.value
        mat = np.array(list(v), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        order = np.argsort(-(mat @ C.T), axis=1)[:, :nprobe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    b = spark.read.parquet(f"{index_path}/vectors")
    q = (
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cell", F.explode(probe_cells(F.col("q_vec"))))
    )
    cand = b.join(q, "cell").withColumn(
        "cosine", _cosine_batch(F.col("q_vec"), F.col("b_vec"))
    )
    ranked = F.slice(
        F.sort_array(
            F.collect_list(F.struct(F.col("cosine"), F.col("b_id"))), asc=False
        ),
        1, int(k),
    )
    return cand.groupBy("q_id").agg(ranked.alias("topk"))


def streaming_minhash_probe(
    stream: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.99,
) -> DataFrame:
    """Probe a PERSISTENT MinHash index (operators.dedup.minhash_index_build)
    from a stream of documents — the streaming decontamination /
    incremental-dedup shape: new documents arrive, near-dup matches
    against the indexed corpus come out.

    Streaming-plan constraints drive the design: the batch
    ``minhash_signature`` is a groupBy over exploded shingles (an
    aggregation a streaming plan cannot join after), so the stream side
    computes each document's signature ROW-LOCALLY in one Arrow pass —
    for the portable poly131 space this costs O(text + num_hashes x
    shingles) via the closed form (k+1)*131^L + base (mod p), where
    ``base``/``131^L`` are seed-independent per shingle. Band keys
    derive as plain columns (same xxhash64 concat as the index build),
    the band equi-join is stream-static, signature agreement is an
    Arrow compare, and the ONLY stateful operator is the final
    per-query match-set aggregation (complete output mode).

    Returns one row per matched query: (query_id, matches) where
    ``matches`` is the sorted array of (index_id, est_jaccard) structs."""
    from ..operators.dedup import (
        _band_explode, _minhash_index_meta, poly131_sigs_batch,
    )

    meta = _minhash_index_meta(index_path)
    if meta.get("hash") != "poly131":
        raise ValueError(
            "streaming_minhash_probe needs an index built with "
            "hash='poly131' (the row-local closed form is specific to the "
            f"portable polynomial space; this index is {meta.get('hash')!r})")
    n, nh, bands = meta["n"], meta["num_hashes"], meta["bands"]

    # one shared, numpy-vectorized kernel (operators.dedup.poly131_sigs_batch)
    # computes the signature bit-identically to the batch Column lane the
    # index was built with — ASCII-\s tokenization, short-doc drop, and
    # code-point hashing all pinned by the kernel's parity test
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(s: pd.Series) -> pd.Series:
        return pd.Series(poly131_sigs_batch(list(s), n, nh))

    spark = stream.sparkSession
    q = (
        stream.select(F.col(id_col).alias("query_id"),
                      sig_udf(F.col(text_col)).alias("_sig"))
        .where(F.col("_sig").isNotNull())
        .select("query_id", "_sig", _band_explode(bands, nh // bands))
    )
    ib = spark.read.parquet(f"{index_path}/bands").select(
        F.col("_id").alias("index_id"), "band", "bhash")
    isigs = spark.read.parquet(f"{index_path}/sigs").select(
        F.col("_id").alias("index_id"), F.col("_sig").alias("_isig"))
    nhf = float(nh)

    @F.pandas_udf("double")
    def _agree(qs: pd.Series, ws: pd.Series) -> pd.Series:
        return pd.Series(
            [float(np.sum(np.asarray(a) == np.asarray(b))) / nhf
             for a, b in zip(qs, ws)],
            dtype="float64",
        )

    cand = (
        q.join(ib, ["band", "bhash"])
        .join(isigs, "index_id")
        .withColumn("est_jaccard", F.round(_agree(F.col("_sig"),
                                                  F.col("_isig")), 6))
        .filter(F.col("est_jaccard") >= float(threshold))
    )
    # collect_set dedups the multi-band candidate repeats; the struct
    # carries the agreement so the caller can flatten to pairs
    return cand.groupBy("query_id").agg(
        F.sort_array(F.collect_set(F.struct(
            F.col("index_id"), F.col("est_jaccard")))).alias("matches"))
