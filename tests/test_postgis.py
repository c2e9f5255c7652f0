"""Live-PostGIS lane (sources/postgis.py): the server-side SQL and JDBC
option construction are pinned exactly — the container has no JDBC driver
or server, and the wrapper is factored so everything except the final
``.load()`` is testable offline (reference reaches live PostgreSQL via
GDAL's PostgreSQL driver, st_read.cpp:684-692)."""

import pytest

from duckdb_spatial_spark.sources.postgis import (
    postgis_query_sql,
    postgis_read_options,
)


def test_query_sql_table_star():
    sql = postgis_query_sql(table="public.roads")
    assert sql == (
        'SELECT *, ST_AsBinary("geom") AS __wkb_geom FROM "public"."roads"'
    )


def test_query_sql_columns_prune_keeps_geometry():
    sql = postgis_query_sql(
        table="roads", columns=["id", "name", "geom"], geom_col="geom"
    )
    # attributes pruned server-side; geometry always kept, as WKB, under
    # its own name (uniform ST_Read columns= contract)
    assert sql == (
        'SELECT "id", "name", ST_AsBinary("geom") AS "geom" FROM "roads"'
    )


def test_query_sql_bbox_pushdown():
    sql = postgis_query_sql(
        table="roads", bbox=(450, 450, 1650, 1650), srid=28992
    )
    assert (
        'WHERE "geom" && ST_MakeEnvelope(450.0, 450.0, 1650.0, 1650.0, 28992)'
        in sql
    )
    # no srid -> envelope without the srid arg
    sql2 = postgis_query_sql(table="roads", bbox=(0, 1, 2, 3))
    assert 'ST_MakeEnvelope(0.0, 1.0, 2.0, 3.0)' in sql2


def test_query_sql_predicate_and_query_source():
    sql = postgis_query_sql(
        query="SELECT * FROM roads WHERE kind = 'motorway'",
        bbox=(0, 0, 1, 1),
        predicate="updated_at >= '2024-01-01'",
    )
    assert sql.startswith(
        "SELECT *, ST_AsBinary(\"geom\") AS __wkb_geom FROM "
        "(SELECT * FROM roads WHERE kind = 'motorway') AS _q"
    )
    assert sql.endswith(
        "WHERE \"geom\" && ST_MakeEnvelope(0.0, 0.0, 1.0, 1.0)"
        " AND (updated_at >= '2024-01-01')"
    )


def test_query_sql_validation():
    with pytest.raises(ValueError, match="exactly one"):
        postgis_query_sql()
    with pytest.raises(ValueError, match="exactly one"):
        postgis_query_sql(table="a", query="SELECT 1")
    with pytest.raises(ValueError, match="invalid identifier"):
        postgis_query_sql(table="roads; DROP TABLE x")
    with pytest.raises(ValueError, match="invalid identifier"):
        postgis_query_sql(table="roads", geom_col='g"eom')


def test_read_options_single_and_partitioned():
    opts = postgis_read_options("jdbc:postgresql://h:5432/db", "SELECT 1")
    assert opts == {
        "url": "jdbc:postgresql://h:5432/db",
        "query": "SELECT 1",
        "driver": "org.postgresql.Driver",
        "fetchsize": "10000",
    }
    part = postgis_read_options(
        "jdbc:postgresql://h/db", "SELECT * FROM t",
        partition_column="id", num_partitions=16,
        lower_bound=0, upper_bound=1_000_000,
    )
    # Spark forbids query= with partitionColumn -> dbtable subselect
    assert "query" not in part
    assert part["dbtable"] == "(SELECT * FROM t) AS _part"
    assert part["partitionColumn"] == "id"
    assert part["numPartitions"] == "16"
    assert part["lowerBound"] == "0" and part["upperBound"] == "1000000"

    with pytest.raises(ValueError, match="jdbc:postgresql"):
        postgis_read_options("jdbc:mysql://h/db", "SELECT 1")
    with pytest.raises(ValueError, match="all of"):
        postgis_read_options(
            "jdbc:postgresql://h/db", "SELECT 1", partition_column="id"
        )


def test_query_sql_geom_only_columns():
    # pruning every attribute must not emit a dangling comma
    sql = postgis_query_sql(table="roads", columns=["geom"])
    assert sql == 'SELECT ST_AsBinary("geom") AS "geom" FROM "roads"'


def test_write_plan_statements():
    from duckdb_spatial_spark.sources.postgis import postgis_write_plan

    fields = [("id", "bigint"), ("name", "string"), ("geom", "binary")]
    staging, stmts = postgis_write_plan(
        "public.roads", fields, geom_col="geom",
        geom_type="LineString", srid=28992,
    )
    assert staging == "public.roads__spark_stage"
    assert stmts[0] == (
        'CREATE TABLE "public"."roads" ("id" BIGINT, "name" TEXT, '
        '"geom" geometry(LINESTRING, 28992))'
    )
    assert stmts[1] == (
        'INSERT INTO "public"."roads" ("id", "name", "geom") '
        'SELECT "id", "name", ST_SetSRID(ST_GeomFromWKB("geom"), 28992) '
        'FROM "public"."roads__spark_stage"'
    )
    assert stmts[2] == 'DROP TABLE "public"."roads__spark_stage"'
    assert stmts[3] == (
        'CREATE INDEX "roads_geom_gist" ON "public"."roads" '
        'USING GIST ("geom")'
    )
    # unmappable Spark type fails loudly, naming the column
    with pytest.raises(ValueError, match="decimal.*amount"):
        postgis_write_plan("t", [("amount", "decimal(10,2)"), ("geom", "binary")])
    # no-index variant omits the DDL
    _, s2 = postgis_write_plan("t", fields, index=False)
    assert len(s2) == 3
