"""SQL Server / Oracle Spatial JDBC lanes (sources/jdbc_spatial.py):
server-side SQL and option construction pinned exactly — the container
has no JDBC drivers or servers, so everything except the final .load()
is testable offline (reference reaches these via GDAL's MSSQLSpatial /
OCI drivers, st_read.cpp:684-692). Same design split as the PostGIS
lane."""

import pytest

from duckdb_spatial_spark.sources.jdbc_spatial import (
    _ORACLE_SCALAR_TYPES,
    mssql_query_sql,
    mssql_read_options,
    oracle_columns_sql,
    oracle_query_sql,
    oracle_read_options,
    read_oracle,
)


def test_mssql_star_and_pruned():
    assert mssql_query_sql(table="dbo.roads") == (
        "SELECT *, [geom].STAsBinary() AS [__wkb_geom] FROM [dbo].[roads]"
    )
    assert mssql_query_sql(table="roads", columns=["id", "name", "geom"]) == (
        "SELECT [id], [name], [geom].STAsBinary() AS [geom] FROM [roads]"
    )
    # pruning every attribute keeps just the geometry - no dangling comma
    assert mssql_query_sql(table="roads", columns=["geom"]) == (
        "SELECT [geom].STAsBinary() AS [geom] FROM [roads]"
    )


def test_mssql_bbox_is_index_filter():
    sql = mssql_query_sql(table="roads", bbox=(0, 1, 2, 3), srid=4326)
    assert sql.endswith(
        "WHERE [geom].Filter(geometry::STGeomFromText("
        "'POLYGON((0.0 1.0, 2.0 1.0, 2.0 3.0, 0.0 3.0, 0.0 1.0))', 4326)) = 1"
    )
    sql2 = mssql_query_sql(
        query="SELECT * FROM roads WHERE kind = 1",
        predicate="updated > '2024-01-01'",
    )
    assert "(SELECT * FROM roads WHERE kind = 1) AS _q" in sql2
    assert sql2.endswith("WHERE (updated > '2024-01-01')")


def test_oracle_star_pruned_and_bbox():
    assert oracle_query_sql(table="gis.roads") == (
        'SELECT _t.*, SDO_UTIL.TO_WKBGEOMETRY(_t."GEOM") AS "__WKB_GEOM" '
        'FROM "GIS"."ROADS" _t'
    )
    assert oracle_query_sql(table="roads", columns=["id", "geom"]) == (
        'SELECT _t."ID", SDO_UTIL.TO_WKBGEOMETRY(_t."GEOM") AS "GEOM" '
        'FROM "ROADS" _t'
    )
    sql = oracle_query_sql(table="roads", bbox=(450, 450, 1650, 1650), srid=28992)
    assert sql.endswith(
        "WHERE SDO_FILTER(_t.\"GEOM\", SDO_GEOMETRY(2003, 28992, NULL, "
        "SDO_ELEM_INFO_ARRAY(1, 1003, 3), "
        "SDO_ORDINATE_ARRAY(450.0, 450.0, 1650.0, 1650.0))) = 'TRUE'"
    )
    # no srid -> NULL srid in the optimized rectangle
    assert "SDO_GEOMETRY(2003, NULL, NULL" in oracle_query_sql(
        table="roads", bbox=(0, 0, 1, 1)
    )


def test_oracle_column_resolution_path():
    # the star SQL exists for non-Spark clients, but read_oracle never
    # executes it: Spark's OracleDialect can't map SDO_GEOMETRY (STRUCT),
    # so columns are resolved from ALL_TAB_COLUMNS instead.
    assert oracle_columns_sql("gis.roads") == (
        "SELECT column_name, data_type FROM ALL_TAB_COLUMNS "
        "WHERE owner = 'GIS' AND table_name = 'ROADS' ORDER BY column_id"
    )
    assert oracle_columns_sql("roads") == (
        "SELECT column_name, data_type FROM ALL_TAB_COLUMNS "
        "WHERE table_name = 'ROADS' ORDER BY column_id"
    )
    with pytest.raises(ValueError, match="invalid identifier"):
        oracle_columns_sql("roads; DROP TABLE x")
    # query= sources have no catalog entry -> columns= is required
    with pytest.raises(ValueError, match="columns= is required"):
        read_oracle(None, "jdbc:oracle:thin:@h:1521/gis",
                    query="SELECT * FROM roads")
    # the scalar-type allowlist keeps JDBC-mappable types, drops objects
    for t in ("VARCHAR2", "NUMBER", "TIMESTAMP(6)", "BLOB", "DATE"):
        assert _ORACLE_SCALAR_TYPES.match(t), t
    for t in ("SDO_GEOMETRY", "XMLTYPE", "ANYDATA", "MY_UDT"):
        assert not _ORACLE_SCALAR_TYPES.match(t), t


def test_read_options_and_partitioning():
    o = mssql_read_options("jdbc:sqlserver://h:1433;databaseName=gis", "SELECT 1")
    assert o["driver"] == "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    assert o["query"] == "SELECT 1"
    o2 = oracle_read_options(
        "jdbc:oracle:thin:@h:1521/gis", "SELECT 1",
        partition_column="id", num_partitions=8,
        lower_bound=0, upper_bound=1000,
    )
    assert o2["dbtable"] == "(SELECT 1) _part"
    assert o2["numPartitions"] == "8" and "query" not in o2
    with pytest.raises(ValueError, match="url must start"):
        oracle_read_options("jdbc:postgresql://h/db", "SELECT 1")
    with pytest.raises(ValueError, match="partitioned reads"):
        mssql_read_options(
            "jdbc:sqlserver://h", "SELECT 1", partition_column="id"
        )
    with pytest.raises(ValueError, match="invalid identifier"):
        mssql_query_sql(table="roads; DROP TABLE x")
