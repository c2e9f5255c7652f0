"""Arrow IPC (Feather v2) reader/writer — ST_Read's GDAL "Arrow" driver
analog (the reference reads Arrow/Feather datasets through GDAL's Arrow
driver; ``spatial/src/spatial/gdal/functions/st_read.cpp``).

The Arrow IPC *file* format stores independently addressable record
batches with a footer index, so the read side fans out one Spark
partition per record batch (each executor opens the file and reads only
its batch — same shape as the reference's per-layer-block parallel GDAL
scan). Geometry travels as WKB binary columns; a ``geo`` schema-metadata
key (mirroring GeoParquet) marks which columns are geometry.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

GEO_META_KEY = b"geo"


def _geometry_columns(df: DataFrame) -> list[str]:
    from pyspark.sql import types as T

    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.BinaryType)
        and (f.name in ("geom", "geometry", "wkb_geometry") or (f.metadata or {}).get("geometry"))
    ]


def write_arrow_ipc(df: DataFrame, path: str, max_rows: int = 5_000_000,
                    batch_rows: int = 65_536) -> None:
    """COPY TO (FORMAT arrow): single Arrow IPC file with a GeoParquet-style
    ``geo`` metadata entry naming the WKB geometry columns.

    Single-file interchange format -> driver-materialized and bounded by
    ``max_rows`` like the other COPY sinks (gpkg/shp/xlsx); the big-data
    path is GeoParquet via ``write_geo_parquet``.
    """
    import pyarrow as pa

    rows = df.limit(max_rows + 1).toArrow()
    if rows.num_rows > max_rows:
        raise ValueError(
            f"write_arrow_ipc: result exceeds max_rows={max_rows}; "
            "use write_geo_parquet for large tables"
        )
    geo_cols = _geometry_columns(df)
    meta = dict(rows.schema.metadata or {})
    meta[GEO_META_KEY] = json.dumps(
        {"primary_column": geo_cols[0] if geo_cols else None, "columns": geo_cols}
    ).encode()
    rows = rows.replace_schema_metadata(meta)
    with pa.OSFile(path, "wb") as sink:
        with pa.ipc.new_file(sink, rows.schema) as writer:
            for batch in rows.to_batches(max_chunksize=batch_rows):
                writer.write_batch(batch)


def read_arrow_ipc(spark: SparkSession, path: str, columns=None) -> DataFrame:
    """ST_Read for .arrow/.feather: one Spark partition per IPC record
    batch. Column pruning (``columns=``) is applied at the Arrow read, so
    only requested buffers are deserialized."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    try:
        with pa.OSFile(path, "rb") as f:
            reader = pa.ipc.open_file(f)
            schema = reader.schema
            n_batches = reader.num_record_batches
    except pa.ArrowInvalid:
        # Arrow IPC STREAM format (.arrows convention): no footer, no
        # random access -> materialize once and hand Spark the table
        # (streams are unbounded pipes by design; the parallel path is
        # the file format)
        with pa.OSFile(path, "rb") as f:
            table = pa.ipc.open_stream(f).read_all()
        if columns:
            table = table.select([c for c in table.schema.names if c in set(columns)])
        return spark.createDataFrame(table.to_pandas(), from_arrow_schema(table.schema))
    if columns:
        keep = [c for c in schema.names if c in set(columns)]
        schema = pa.schema([schema.field(c) for c in keep], metadata=schema.metadata)
    spark_schema = from_arrow_schema(schema)

    try:
        from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

        # unique per-call registration name: Spark resolves python
        # sources BY NAME; a fixed name + fresh closure state hands a
        # second read the stale reader (schema mismatch)
        import uuid as _uuid

        _ds_name = f"arrowipc_{_uuid.uuid4().hex[:12]}"

        cols = list(columns) if columns else None

        class _Reader(DataSourceReader):
            def partitions(self):
                return [InputPartition(i) for i in range(n_batches)]

            def read(self, partition):
                import pyarrow as pa  # executor-side

                with pa.OSFile(path, "rb") as f:
                    batch = pa.ipc.open_file(f).get_batch(partition.value)
                if cols:
                    batch = batch.select([c for c in batch.schema.names if c in set(cols)])
                # yielding the RecordBatch itself keeps the whole read
                # Arrow-native — no per-row Python conversion
                yield batch

        class ArrowIPCSource(DataSource):
            @classmethod
            def name(cls):
                return _ds_name

            def schema(self):
                return spark_schema

            def reader(self, schema):
                return _Reader()

        spark.dataSource.register(ArrowIPCSource)
        return spark.read.format(_ds_name).schema(spark_schema).load(path)
    except ImportError:
        with pa.OSFile(path, "rb") as f:
            table = pa.ipc.open_file(f).read_all()
        if columns:
            table = table.select([c for c in table.schema.names if c in set(columns)])
        return spark.createDataFrame(table.to_pandas(), spark_schema)
