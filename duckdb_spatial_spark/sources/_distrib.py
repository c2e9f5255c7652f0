"""Distributed per-file reads for small-format sources.

The reference binds a GDAL layer once and scans it through DuckDB's
table-function pipeline (``gdal/functions/st_read.cpp``); the Spark-first
equivalent is one input partition per file with parsing on the
executors. This helper wraps the Spark-4 Python DataSource the same way
``sources/shapefile.py`` / ``flatgeobuf.py`` do, so a directory of
thousands of GMT/DGN/S-57 files plans distributed tasks instead of
serializing through the driver."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def distributed_file_read(spark: SparkSession, files: list[str], schema,
                          per_file_rows, name_prefix: str) -> DataFrame:
    """One Spark input partition per file; ``per_file_rows(path)`` yields
    row tuples matching ``schema`` worker-side. Falls back to a
    driver-side createDataFrame when the Python DataSource API is
    unavailable (pre-Spark-4)."""
    try:
        from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                            InputPartition)

        # unique per-call registration name: Spark resolves python sources
        # BY NAME; a fixed name + fresh closure state hands a second read
        # the stale reader (schema mismatch)
        _ds_name = f"{name_prefix}_{uuid.uuid4().hex[:12]}"

        class _Reader(DataSourceReader):
            def __init__(self, files):
                self._files = files

            def partitions(self):
                return [InputPartition(f) for f in self._files]

            def read(self, partition):
                yield from per_file_rows(partition.value)

        class _Source(DataSource):
            @classmethod
            def name(cls):
                return _ds_name

            def schema(self):
                return schema

            def reader(self, schema):
                return _Reader(files)

        spark.dataSource.register(_Source)
        return spark.read.format(_ds_name).schema(schema).load()
    except ImportError:
        rows = [r for fp in files for r in per_file_rows(fp)]
        return spark.createDataFrame(rows, schema)
