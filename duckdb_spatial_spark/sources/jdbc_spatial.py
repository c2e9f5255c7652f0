"""Live SQL Server / Oracle Spatial sources — the reference's GDAL
"MSSQLSpatial" / "OCI" driver analogs (``st_read.cpp:684-692`` reaches
them via GDAL; here each is a thin wrapper over Spark's built-in JDBC
source, the same design as :mod:`.postgis`).

Both lanes share the read contract read_postgis established:

  * geometry ships as WKB, converted SERVER-side (SQL Server
    ``geom.STAsBinary()``; Oracle ``SDO_UTIL.TO_WKBGEOMETRY``), so rows
    land directly in this repo's WKB kernels;
  * ``bbox=`` pushes the engine's spatial-INDEX primary filter into the
    server WHERE clause (SQL Server ``geometry::Filter`` — an
    index-only approximate intersect; Oracle ``SDO_FILTER`` — the
    R-tree primary filter), mirroring the reference's R-tree scan
    rewrite: the prune happens where the index lives;
  * ``columns=`` prunes attributes server-side, geometry always kept;
  * ``predicate=`` appends an arbitrary trusted SQL conjunct;
  * range partitioning passes through to Spark's parallel JDBC read.

The JDBC driver jars (``com.microsoft.sqlserver.jdbc.SQLServerDriver``,
``oracle.jdbc.OracleDriver``) and live servers are deployment concerns;
this container has neither, so every statement is built by a pure
function the tests pin offline — the postgis.py split.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_$#]*$")


def _quote_mssql(name: str) -> str:
    parts = name.split(".")
    if len(parts) > 3 or not all(_IDENT.match(p) for p in parts):
        raise ValueError(f"read_mssql: invalid identifier {name!r}")
    return ".".join(f"[{p}]" for p in parts)


def _quote_oracle(name: str) -> str:
    parts = name.split(".")
    if len(parts) > 2 or not all(_IDENT.match(p) for p in parts):
        raise ValueError(f"read_oracle: invalid identifier {name!r}")
    return ".".join(f'"{p.upper()}"' for p in parts)


def mssql_query_sql(
    table: str | None = None,
    query: str | None = None,
    geom_col: str = "geom",
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    srid: int = 0,
    predicate: str | None = None,
) -> str:
    """The server-side SELECT ``read_mssql`` executes.

    The bbox conjunct is ``geom.Filter(@window) = 1`` — SQL Server's
    INDEX-ONLY approximate intersection (its docs: "may produce
    false positives" — the exact recheck belongs to the caller's Spark
    predicates, exactly like the repo's own bbox prefilters)."""
    if (table is None) == (query is None):
        raise ValueError("read_mssql: pass exactly one of table= or query=")
    src = _quote_mssql(table) if table else f"({query}) AS _q"
    gq = _quote_mssql(geom_col)
    if columns:
        attrs = [_quote_mssql(c) for c in columns if c != geom_col]
        select = ", ".join(attrs + [f"{gq}.STAsBinary() AS {gq}"])
    else:
        select = f"*, {gq}.STAsBinary() AS [__wkb_{geom_col}]"
    where = []
    if bbox is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        wkt = (
            f"POLYGON(({xmin!r} {ymin!r}, {xmax!r} {ymin!r}, "
            f"{xmax!r} {ymax!r}, {xmin!r} {ymax!r}, {xmin!r} {ymin!r}))"
        )
        where.append(
            f"{gq}.Filter(geometry::STGeomFromText('{wkt}', {int(srid)})) = 1"
        )
    if predicate:
        where.append(f"({predicate})")
    sql = f"SELECT {select} FROM {src}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    return sql


def oracle_query_sql(
    table: str | None = None,
    query: str | None = None,
    geom_col: str = "geom",
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    srid: int | None = None,
    predicate: str | None = None,
) -> str:
    """The server-side SELECT ``read_oracle`` executes.

    The bbox conjunct is ``SDO_FILTER(geom, <optimized rect>) = 'TRUE'``
    — Oracle Spatial's R-tree PRIMARY filter (element-info 1003,3 is
    the axis-aligned optimized rectangle encoding). WKB comes from
    ``SDO_UTIL.TO_WKBGEOMETRY`` as a BLOB.

    NOTE: the ``columns=None`` star form projects the raw SDO_GEOMETRY
    object through ``_t.*`` — Spark's OracleDialect has no mapping for
    Oracle object types, so that SQL is NOT loadable through Spark
    JDBC. ``read_oracle`` never executes it: it resolves the attribute
    list server-side (``oracle_columns_sql``) and always projects an
    explicit column list. The star form remains for users driving a
    non-Spark client."""
    if (table is None) == (query is None):
        raise ValueError("read_oracle: pass exactly one of table= or query=")
    # the source is always aliased _t so the *-form can project
    # _t.* alongside the WKB expression
    src = f"{_quote_oracle(table)} _t" if table else f"({query}) _t"
    gq = _quote_oracle(geom_col)
    if columns:
        attrs = [f"_t.{_quote_oracle(c)}" for c in columns if c != geom_col]
        select = ", ".join(
            attrs + [f"SDO_UTIL.TO_WKBGEOMETRY(_t.{gq}) AS {gq}"]
        )
    else:
        select = (
            f"_t.*, SDO_UTIL.TO_WKBGEOMETRY(_t.{gq})"
            f" AS \"__WKB_{geom_col.upper()}\""
        )
    where = []
    if bbox is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        sr = str(int(srid)) if srid is not None else "NULL"
        rect = (
            f"SDO_GEOMETRY(2003, {sr}, NULL, "
            f"SDO_ELEM_INFO_ARRAY(1, 1003, 3), "
            f"SDO_ORDINATE_ARRAY({xmin!r}, {ymin!r}, {xmax!r}, {ymax!r}))"
        )
        where.append(f"SDO_FILTER(_t.{gq}, {rect}) = 'TRUE'")
    if predicate:
        where.append(f"({predicate})")
    sql = f"SELECT {select} FROM {src}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    return sql


def oracle_columns_sql(table: str) -> str:
    """The catalog SELECT ``read_oracle`` uses to resolve a table's
    column list when ``columns=None``.

    Spark 4.1.2's OracleDialect cannot map Oracle object types
    (SDO_GEOMETRY arrives as java.sql.Types.STRUCT), so the star form
    would fail schema inference before a single row ships. Instead the
    attribute list is resolved from ALL_TAB_COLUMNS and the projection
    is always explicit — object-typed columns other than the requested
    geometry are dropped server-side."""
    parts = table.split(".")
    if len(parts) > 2 or not all(_IDENT.match(p) for p in parts):
        raise ValueError(f"read_oracle: invalid identifier {table!r}")
    if len(parts) == 2:
        where = (
            f"owner = '{parts[0].upper()}' "
            f"AND table_name = '{parts[1].upper()}'"
        )
    else:
        where = f"table_name = '{parts[0].upper()}'"
    return (
        "SELECT column_name, data_type FROM ALL_TAB_COLUMNS "
        f"WHERE {where} ORDER BY column_id"
    )


# Oracle types Spark's JDBC dialect can receive as plain JDBC scalars.
# Object/opaque types (SDO_GEOMETRY, XMLTYPE, ANYDATA, user-defined)
# are excluded from the auto-resolved projection.
_ORACLE_SCALAR_TYPES = re.compile(
    r"^(VARCHAR2?|NVARCHAR2|CHAR|NCHAR|NUMBER|FLOAT|BINARY_FLOAT|"
    r"BINARY_DOUBLE|DATE|TIMESTAMP.*|INTERVAL.*|RAW|LONG|CLOB|NCLOB|"
    r"BLOB)$"
)


def _read_options(
    url: str,
    sql: str,
    driver: str,
    url_prefix: str,
    lane: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    fetchsize: int = 10_000,
) -> dict:
    if not url.startswith(url_prefix):
        raise ValueError(f"{lane}: url must start with {url_prefix} (got {url!r})")
    opts = {
        "url": url,
        "query": sql,
        "driver": driver,
        "fetchsize": str(int(fetchsize)),
    }
    part = (partition_column, num_partitions, lower_bound, upper_bound)
    if any(v is not None for v in part):
        if any(v is None for v in part):
            raise ValueError(
                f"{lane}: partitioned reads need all of partition_column, "
                f"num_partitions, lower_bound, upper_bound"
            )
        opts.pop("query")
        opts["dbtable"] = f"({sql}) _part"
        opts["partitionColumn"] = str(partition_column)
        opts["numPartitions"] = str(int(num_partitions))
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
    return opts


def mssql_read_options(url: str, sql: str, **kw) -> dict:
    """Option map for ``spark.read.format('jdbc')`` against SQL Server."""
    return _read_options(
        url, sql, "com.microsoft.sqlserver.jdbc.SQLServerDriver",
        "jdbc:sqlserver:", "read_mssql", **kw,
    )


def oracle_read_options(url: str, sql: str, **kw) -> dict:
    """Option map for ``spark.read.format('jdbc')`` against Oracle."""
    return _read_options(
        url, sql, "oracle.jdbc.OracleDriver",
        "jdbc:oracle:", "read_oracle", **kw,
    )


def _finish(spark, opts, user, password, columns, geom_col, wkb_alias):
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    df = spark.read.format("jdbc").options(**opts).load()
    if columns is None and wkb_alias in df.columns:
        df = df.drop(geom_col).withColumnRenamed(wkb_alias, geom_col)
    return df


def read_mssql(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    geom_col: str = "geom",
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    srid: int = 0,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Read a SQL Server spatial table/query into a DataFrame with WKB
    geometry. Requires the mssql-jdbc jar on the Spark classpath."""
    sql = mssql_query_sql(
        table=table, query=query, geom_col=geom_col, columns=columns,
        bbox=bbox, srid=srid, predicate=predicate,
    )
    opts = mssql_read_options(
        url, sql, partition_column=partition_column,
        num_partitions=num_partitions, lower_bound=lower_bound,
        upper_bound=upper_bound, fetchsize=fetchsize,
    )
    return _finish(spark, opts, user, password, columns, geom_col,
                   f"__wkb_{geom_col}")


def read_oracle(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    geom_col: str = "geom",
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    srid: int | None = None,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    user: str | None = None,
    password: str | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Read an Oracle Spatial (SDO_GEOMETRY) table/query into a
    DataFrame with WKB geometry. Requires the ojdbc jar on the Spark
    classpath.

    When ``columns=None`` the attribute list is resolved server-side
    from ALL_TAB_COLUMNS (one bounded metadata query) because Spark's
    OracleDialect cannot receive SDO_GEOMETRY through a ``_t.*``
    projection; ``query=`` sources must pass ``columns=`` explicitly."""
    if columns is None:
        if table is None:
            raise ValueError(
                "read_oracle: columns= is required with query= — Spark's "
                "OracleDialect has no SDO_GEOMETRY mapping, so the star "
                "projection cannot be schema-inferred; list the attribute "
                "columns explicitly (geometry arrives as WKB regardless)"
            )
        meta_opts = oracle_read_options(url, oracle_columns_sql(table),
                                        fetchsize=fetchsize)
        if user is not None:
            meta_opts["user"] = user
        if password is not None:
            meta_opts["password"] = password
        meta = spark.read.format("jdbc").options(**meta_opts).load().collect()
        gup = geom_col.upper()
        columns = [
            r["COLUMN_NAME"] for r in meta
            if r["COLUMN_NAME"] != gup
            and _ORACLE_SCALAR_TYPES.match(str(r["DATA_TYPE"]).upper())
        ]
        if not any(r["COLUMN_NAME"] == gup for r in meta):
            raise ValueError(
                f"read_oracle: geometry column {geom_col!r} not found in "
                f"{table!r} (ALL_TAB_COLUMNS returned "
                f"{[r['COLUMN_NAME'] for r in meta]!r})"
            )
        columns = columns + [geom_col]
    sql = oracle_query_sql(
        table=table, query=query, geom_col=geom_col, columns=columns,
        bbox=bbox, srid=srid, predicate=predicate,
    )
    opts = oracle_read_options(
        url, sql, partition_column=partition_column,
        num_partitions=num_partitions, lower_bound=lower_bound,
        upper_bound=upper_bound, fetchsize=fetchsize,
    )
    return _finish(spark, opts, user, password, columns, geom_col,
                   f"__WKB_{geom_col.upper()}")
