"""duckdb_spatial_spark — PySpark-native spatial analytics engine.

Re-expresses the capability surface of the duckdb/duckdb_spatial extension
(reference snapshot at /root/reference, 2024-10-16) Spark-first:

* GEOMETRY = WKB bytes in a BinaryType column (canonical form)
* columnar POINT_2D / BOX_2D / LINESTRING_2D / POLYGON_2D = struct/array
  columns with pure Column-expression kernels (no Python cost)
* ~110 ST_* functions registered as Spark SQL functions
* spatial join, Hilbert clustering + bbox pruning (R-tree analog)
* large-scale pipeline operators: dedup, ANN, text analysis, multimodal
"""

__version__ = "0.1.0"


def register_all(spark):
    """Register every ST_* function + pipeline SQL function on the session."""
    from .functions import register_all as _reg

    return _reg(spark)
