"""SQL entry point: the engine is DataFrame/SQL-first — spark.sql over
registered views must agree with DuckDB on the ANSI-shared dialect subset.
(The reference had no SQL at all; this is the declarative surface users
actually switch to.)"""

from __future__ import annotations

import duckdb
import pytest

from hadoop_prototype_spark.sources.tables import register_views

from .parity import duckdb_connection

SHARED_SQL = {
    "top_nations": """
        SELECT n_name, count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_customers DESC, n_name LIMIT 5
    """,
    "order_priority_counts": """
        SELECT o_orderpriority, count(*) AS n
        FROM orders WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "part_type_stats": """
        SELECT p_type, count(*) AS n,
               CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM part GROUP BY p_type ORDER BY p_type
    """,
}


@pytest.mark.parametrize("name", sorted(SHARED_SQL))
def test_sql_surface_matches_duckdb(spark, sf_dir, name):
    sql = SHARED_SQL[name]
    register_views(spark, sf_dir)
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb_connection(sf_dir)
    expected = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == expected
