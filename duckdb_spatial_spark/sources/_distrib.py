"""Distributed per-file reads for small-format sources.

The reference binds a GDAL layer once and scans it through DuckDB's
table-function pipeline (``gdal/functions/st_read.cpp``); the Spark-first
equivalent is one input partition per file with parsing on the
executors. This helper wraps the Spark-4 Python DataSource the same way
``sources/shapefile.py`` / ``flatgeobuf.py`` do, so a directory of
thousands of GMT/DGN/S-57 files plans distributed tasks instead of
serializing through the driver.

Design (r15, closes the r14 advisory): ONE stateless DataSource class
under ONE fixed name. All per-read state — the file list, the handler
(an importable ``module:function`` string) and its keyword params —
travels through the load OPTIONS, which Spark snapshots into each
DataFrame's plan. That removes both failure modes of the previous
shapes: a fixed name with closure state handed re-executions a STALE
reader, and unique per-call names grew the session's data-source
registry (holding the closures alive) forever.
"""

from __future__ import annotations

import importlib
import json

from pyspark.sql import DataFrame, SparkSession


def _resolve_handler(spec: str):
    mod, fn = spec.split(":", 1)
    return getattr(importlib.import_module(mod), fn)


_DS_NAME = "duckdb_spatial_files"


def distributed_file_read(spark: SparkSession, files: list[str], schema,
                          handler: str, params: dict | None = None) -> DataFrame:
    """One Spark input partition per file; ``handler`` names an importable
    ``module:function`` called as ``fn(path, **params)`` worker-side,
    yielding row tuples matching ``schema``. ``params`` must be
    JSON-serializable. Falls back to a driver-side createDataFrame when
    the Python DataSource API is unavailable (pre-Spark-4)."""
    params = params or {}
    spec = json.dumps({"files": list(files), "handler": handler,
                       "params": params})
    try:
        from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                            InputPartition)

        class _Reader(DataSourceReader):
            def __init__(self, spec_json: str):
                s = json.loads(spec_json)
                self._files = s["files"]
                self._handler = s["handler"]
                self._params = s.get("params") or {}

            def partitions(self):
                return [InputPartition(f) for f in self._files]

            def read(self, partition):
                fn = _resolve_handler(self._handler)
                yield from fn(partition.value, **self._params)

        class _Source(DataSource):
            @classmethod
            def name(cls):
                return _DS_NAME

            def reader(self, schema):
                return _Reader(self.options["spec"])

        # registering the same stateless class again is a no-op
        # semantically (behavior depends only on per-load options), so
        # repeated reads neither grow the registry nor alias state
        spark.dataSource.register(_Source)
        return (spark.read.format(_DS_NAME).schema(schema)
                .option("spec", spec).load())
    except ImportError:
        fn = _resolve_handler(handler)
        rows = [r for fp in files for r in fn(fp, **params)]
        return spark.createDataFrame(rows, schema)
