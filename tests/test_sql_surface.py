"""The spark.sql() entry point: registered views + SQL text must produce
the same results as the DataFrame plans (SURVEY.md §7: public API (a)).
The reference ships its queries as SQL for other engines
(cpp/tpch_sql/presto/query/*.sql); this is our native path for them."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import register_views
from codecdb_queryengine_spark.queries import tpch


def test_sql_q6_matches_dataframe_plan(spark, sf_dir):
    register_views(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT sum(l_extendedprice * l_discount) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """
    ).collect()[0]
    df = tpch.q6(spark, sf_dir).collect()[0]
    assert round(sql.revenue, 2) == round(df.revenue, 2)


def test_sql_q1_matches_dataframe_plan(spark, sf_dir):
    register_views(spark, sf_dir)
    sql_rows = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    df_rows = tpch.q1(spark, sf_dir).collect()
    assert len(sql_rows) == len(df_rows)
    for s, d in zip(sql_rows, df_rows):
        assert (s.l_returnflag, s.l_linestatus) == (d.l_returnflag, d.l_linestatus)
        assert round(s.sum_qty, 2) == round(d.sum_qty, 2)
        assert s.count_order == d.count_order


def test_sql_join_uses_registered_views(spark, sf_dir):
    register_views(spark, sf_dir)
    n = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_cust
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
    total = n.agg(F.sum("n_cust").alias("t")).collect()[0].t
    from codecdb_queryengine_spark.catalog import load_tables

    assert total == load_tables(spark, sf_dir)["customer"].count()
