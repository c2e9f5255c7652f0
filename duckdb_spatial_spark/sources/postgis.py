"""Live PostGIS source — the reference's GDAL "PostgreSQL" driver analog
(``st_read.cpp:684-692`` format dispatch reaches it via GDAL; here it is
a thin, inspectable wrapper over Spark's built-in JDBC source).

``read_postgis(spark, url, table=...)`` builds ONE server-side SQL
statement and hands it to ``spark.read.format("jdbc")``:

  * geometry columns are shipped as WKB (``ST_AsBinary`` server-side), so
    the result plugs straight into this repo's WKB kernels;
  * ``bbox=`` pushes a ``geom && ST_MakeEnvelope(...)`` conjunct into the
    server WHERE clause — PostGIS answers it from its GiST index, which
    is the exact scale story of the reference's R-tree scan rewrite: the
    index prune happens where the index lives, rows never leave the
    server;
  * ``columns=`` prunes attributes server-side (the uniform ST_Read
    option contract: attributes restricted, geometry always kept);
  * ``predicate=`` appends an arbitrary extra SQL conjunct (trusted
    input — this mirrors Spark JDBC's own dbtable/query trust model);
  * ``partition_column``/``num_partitions``/bounds pass through to
    Spark's range-partitioned parallel JDBC read — at 100 TB the read
    parallelism comes from N executors each fetching one id-range slice.

The JDBC driver jar (``org.postgresql.Driver``) and a live server are
deployment concerns; this container has neither, so the SQL/option
construction is factored into :func:`postgis_query_sql` /
:func:`postgis_read_options` which the tests pin exactly (the same
split the tabular sinks use for their header logic).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _quote_ident(name: str) -> str:
    """Quote a PostgreSQL identifier; allow schema-qualified names."""
    parts = name.split(".")
    if len(parts) > 2 or not all(_IDENT.match(p) for p in parts):
        raise ValueError(f"read_postgis: invalid identifier {name!r}")
    return ".".join(f'"{p}"' for p in parts)


def postgis_query_sql(
    table: str | None = None,
    query: str | None = None,
    geom_col: str = "geom",
    columns: list[str] | None = None,
    bbox: tuple[float, float, float, float] | None = None,
    srid: int | None = None,
    predicate: str | None = None,
) -> str:
    """The single server-side SELECT ``read_postgis`` executes.

    Exactly one of ``table`` / ``query`` must be given; ``query`` wraps as
    a subselect (Spark's own ``query`` option semantics). The geometry
    column ships as WKB bytes under its original name."""
    if (table is None) == (query is None):
        raise ValueError("read_postgis: pass exactly one of table= or query=")
    src = _quote_ident(table) if table else f"({query}) AS _q"
    gq = _quote_ident(geom_col)
    if columns:
        # attribute pruning keeps the geometry (uniform ST_Read contract);
        # a list that prunes every attribute (e.g. columns=[geom_col])
        # ships the geometry alone — no dangling comma
        attrs = [_quote_ident(c) for c in columns if c != geom_col]
        wkb = f"ST_AsBinary({gq}) AS {gq}"
        select = ", ".join(attrs + [wkb])
    else:
        # PostgreSQL has no SELECT * REPLACE, so the * form ships the WKB
        # under a suffixed name and read_postgis drops the native column
        # Spark-side (the raw geometry does cross the wire here — pass
        # columns= to avoid that on wide tables)
        select = f"*, ST_AsBinary({gq}) AS __wkb_{geom_col}"
    where = []
    if bbox is not None:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        env = f"ST_MakeEnvelope({xmin!r}, {ymin!r}, {xmax!r}, {ymax!r}"
        env += f", {int(srid)})" if srid is not None else ")"
        # && is the bbox-overlap operator the GiST index serves; the
        # index prune runs server-side, mirroring plans/pruning.py
        where.append(f"{gq} && {env}")
    if predicate:
        where.append(f"({predicate})")
    sql = f"SELECT {select} FROM {src}"
    if where:
        sql += " WHERE " + " AND ".join(where)
    return sql


def postgis_read_options(
    url: str,
    sql: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound=None,
    upper_bound=None,
    fetchsize: int = 10_000,
) -> dict:
    """The option map handed to ``spark.read.format('jdbc')``. Range
    partitioning needs all four knobs; Spark then issues one server query
    per slice (the parallel-read contract)."""
    if not url.startswith("jdbc:postgresql:"):
        raise ValueError(
            f"read_postgis: url must start with jdbc:postgresql: (got {url!r})"
        )
    opts = {
        "url": url,
        "query": sql,
        "driver": "org.postgresql.Driver",
        "fetchsize": str(int(fetchsize)),
    }
    part = (partition_column, num_partitions, lower_bound, upper_bound)
    if any(v is not None for v in part):
        if any(v is None for v in part):
            raise ValueError(
                "read_postgis: partitioned reads need all of "
                "partition_column, num_partitions, lower_bound, upper_bound"
            )
        # Spark forbids query= with partitionColumn; wrap as dbtable
        opts.pop("query")
        opts["dbtable"] = f"({sql}) AS _part"
        opts["partitionColumn"] = str(partition_column)
        opts["numPartitions"] = str(int(num_partitions))
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
    return opts


def read_postgis(
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
    """Read a PostGIS table/query into a DataFrame with WKB geometry.

    See the module docstring for the pushdown contract. Requires the
    PostgreSQL JDBC driver on the Spark classpath
    (``spark.jars.packages=org.postgresql:postgresql:42.x``)."""
    sql = postgis_query_sql(
        table=table, query=query, geom_col=geom_col, columns=columns,
        bbox=bbox, srid=srid, predicate=predicate,
    )
    opts = postgis_read_options(
        url, sql,
        partition_column=partition_column, num_partitions=num_partitions,
        lower_bound=lower_bound, upper_bound=upper_bound, fetchsize=fetchsize,
    )
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    df = spark.read.format("jdbc").options(**opts).load()
    if columns is None and f"__wkb_{geom_col}" in df.columns:
        df = df.drop(geom_col).withColumnRenamed(f"__wkb_{geom_col}", geom_col)
    return df


# ---------------------------------------------------------------------------
# write-back lane — the GDAL "PostgreSQL" driver's write direction
# (st_write's analog for a live server). Same deployment split as the
# read lane: every server-side statement is built by a pure function the
# tests pin offline; execution needs the JDBC jar + a live server.
# ---------------------------------------------------------------------------

_PG_TYPES = {
    "string": "TEXT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "integer": "INTEGER",
    "smallint": "SMALLINT",
    "tinyint": "SMALLINT",
    "double": "DOUBLE PRECISION",
    "float": "REAL",
    "boolean": "BOOLEAN",
    "binary": "BYTEA",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
}


def postgis_create_table_sql(
    table: str,
    fields: list[tuple[str, str]],
    geom_col: str = "geom",
    geom_type: str = "GEOMETRY",
    srid: int = 0,
) -> str:
    """``CREATE TABLE`` DDL for the target: attribute columns from
    ``fields`` (Spark simpleString type names), the geometry column as a
    typed ``geometry(TYPE, SRID)`` so the server enforces what a GDAL
    layer definition would."""
    cols = []
    for name, dtype in fields:
        if name == geom_col:
            continue
        pg = _PG_TYPES.get(dtype)
        if pg is None:
            raise ValueError(
                f"write_postgis: no PostgreSQL mapping for Spark type "
                f"{dtype!r} (column {name!r}); cast it first"
            )
        cols.append(f"{_quote_ident(name)} {pg}")
    gt = geom_type.upper()
    if not _IDENT.match(gt):
        raise ValueError(f"write_postgis: invalid geometry type {gt!r}")
    cols.append(f"{_quote_ident(geom_col)} geometry({gt}, {int(srid)})")
    return f"CREATE TABLE {_quote_ident(table)} ({', '.join(cols)})"


def postgis_insert_from_staging_sql(
    table: str,
    staging: str,
    attr_cols: list[str],
    geom_col: str = "geom",
    srid: int = 0,
) -> str:
    """Move rows from the JDBC-written staging table (geometry as WKB
    bytea) into the typed target: the WKB decodes SERVER-side via
    ``ST_GeomFromWKB`` + ``ST_SetSRID`` — Spark's JDBC writer can only
    ship plain types, so the cast happens where the geometry type
    lives."""
    attrs = [_quote_ident(c) for c in attr_cols if c != geom_col]
    gq = _quote_ident(geom_col)
    cols = ", ".join(attrs + [gq])
    sel = ", ".join(attrs + [f"ST_SetSRID(ST_GeomFromWKB({gq}), {int(srid)})"])
    return (
        f"INSERT INTO {_quote_ident(table)} ({cols}) "
        f"SELECT {sel} FROM {_quote_ident(staging)}"
    )


def postgis_gist_index_sql(table: str, geom_col: str = "geom") -> str:
    """GiST index DDL — the server-side R-tree the read lane's ``bbox=``
    pushdown is answered from."""
    idx = f"{table.split('.')[-1]}_{geom_col}_gist"
    if not _IDENT.match(idx):
        raise ValueError(f"write_postgis: cannot derive index name for {table!r}")
    return (
        f"CREATE INDEX {_quote_ident(idx)} ON {_quote_ident(table)} "
        f"USING GIST ({_quote_ident(geom_col)})"
    )


def postgis_write_plan(
    table: str,
    fields: list[tuple[str, str]],
    geom_col: str = "geom",
    geom_type: str = "GEOMETRY",
    srid: int = 0,
    index: bool = True,
) -> tuple[str, list[str]]:
    """The full write-back recipe: returns ``(staging_table,
    statements)`` where ``statements`` run in order AFTER Spark's JDBC
    writer lands the staging table. Pure function — pinned by tests."""
    staging = f"{table}__spark_stage"
    stmts = [
        postgis_create_table_sql(
            table, fields, geom_col=geom_col, geom_type=geom_type, srid=srid
        ),
        postgis_insert_from_staging_sql(
            table, staging, [n for n, _ in fields],
            geom_col=geom_col, srid=srid,
        ),
        f"DROP TABLE {_quote_ident(staging)}",
    ]
    if index:
        stmts.append(postgis_gist_index_sql(table, geom_col))
    return staging, stmts


def write_postgis(
    df: DataFrame,
    url: str,
    table: str,
    geom_col: str = "geom",
    geom_type: str = "GEOMETRY",
    srid: int = 0,
    index: bool = True,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
) -> None:
    """Write a DataFrame with a WKB geometry column (``binary``) to a
    live PostGIS table.

    Two phases: (1) Spark's parallel JDBC writer lands the rows in a
    staging table — the geometry ships as plain WKB bytea, N executors
    insert concurrently (the scale path; a single-connection
    ST_GeomFromWKB INSERT stream would serialize the cluster); (2) one
    driver-side connection replays :func:`postgis_write_plan` —
    CREATE TABLE with a typed geometry column, INSERT ... SELECT with
    the server-side WKB decode, staging drop, GiST index DDL.

    Requires the PostgreSQL JDBC jar on the Spark classpath (same
    contract as :func:`read_postgis`); the driver-side statements run
    through ``java.sql.DriverManager`` on the already-loaded jar, so no
    extra Python dependency."""
    if not url.startswith("jdbc:postgresql:"):
        raise ValueError(
            f"write_postgis: url must start with jdbc:postgresql: (got {url!r})"
        )
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    staging, stmts = postgis_write_plan(
        table, fields, geom_col=geom_col, geom_type=geom_type,
        srid=srid, index=index,
    )
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .option("driver", "org.postgresql.Driver")
        .option("batchsize", str(int(batchsize)))
        .mode("errorifexists")
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    writer.save()
    jvm = df.sparkSession._jvm
    props = jvm.java.util.Properties()
    if user is not None:
        props.setProperty("user", user)
    if password is not None:
        props.setProperty("password", password)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        # One transaction for the whole post-staging plan: if CREATE
        # TABLE or INSERT..SELECT fails (e.g. target exists), everything
        # rolls back and the staging table is dropped below, so a retry
        # doesn't trip over a leftover <table>__spark_stage at the
        # errorifexists staging write.
        conn.setAutoCommit(False)
        st = conn.createStatement()
        try:
            for sql in stmts:
                st.execute(sql)
            conn.commit()
        except Exception:
            conn.rollback()
            try:
                conn.setAutoCommit(True)
                st.execute(f"DROP TABLE IF EXISTS {_quote_ident(staging)}")
            except Exception:  # noqa: BLE001 - best-effort cleanup
                pass
            raise
        finally:
            st.close()
    finally:
        conn.close()
