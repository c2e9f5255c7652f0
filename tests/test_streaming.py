"""Structured Streaming: windowed geofence counts + stateful dedup."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from duckdb_spatial_spark.streaming import streaming_envelope_counts, streaming_session_dedup


def test_streaming_envelope_counts(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    schema = "id long, ts timestamp, x double, y double"
    rows = []
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    for i in range(1000):
        rows.append(
            (i, base + dt.timedelta(seconds=30 * i), float(i % 1000), float((i * 7) % 1000))
        )
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    events = spark.readStream.schema(schema).parquet(src)
    agg = streaming_envelope_counts(events, envelope=(100.0, 100.0, 500.0, 500.0))
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("geofence_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT sum(n_hits) AS s FROM geofence_out").collect()[0].s
    # batch parity
    batch = streaming_envelope_counts(
        spark.read.parquet(src), envelope=(100.0, 100.0, 500.0, 500.0)
    )
    expected = batch.agg(F.sum("n_hits")).collect()[0][0]
    # append mode emits only watermark-closed windows; all but the last close
    assert got is not None and expected is not None
    assert got <= expected and got >= expected * 0.8


def test_streaming_session_dedup(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    rows = [(i, f"text {i % 30}") for i in range(200)]  # 30 distinct texts
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(src)

    docs = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = streaming_session_dedup(docs)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
    assert n == 30
    # batch parity path
    nb = streaming_session_dedup(spark.read.parquet(src)).count()
    assert nb == 30
