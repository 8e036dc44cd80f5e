"""SQL-text entry point: the full TPC-H + SSB corpus as executable SQL.

The reference ships its query corpus as per-dialect SQL files it cannot
execute itself (cpp/tpch_sql/{presto,vertica,monetdb}/query/q*.sql,
cpp/ssb_sql/...; SURVEY.md §5) — queries run only through hand-built C++
plans.  Here the SQL surface is executable: every oracle string is written
dialect-neutral, runs verbatim through spark.sql() over the registered
views, AND is the DuckDB oracle — so the SQL path is pinned end-to-end by
construction (same text, two engines, hash-compared).

This is entry point A of SURVEY.md §7 (declarative SQL over registered
tables); the DataFrame plans in tpch.py/ssb.py are entry point B, and
plans/builder.py is the reference-vocabulary operator API.  All three
compile to the same Catalyst physical plans, which is why bench.py only
times representatives of this module (BENCH_SKIP in __spark_entry__).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from codecdb_queryengine_spark.catalog import register_views
from codecdb_queryengine_spark.queries.ssb import ORACLE as _SSB_ORACLE
from codecdb_queryengine_spark.queries.tpch import ORACLE as _TPCH_ORACLE


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return fn


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}
for _name, _sql in {**_TPCH_ORACLE, **_SSB_ORACLE}.items():
    QUERIES[f"{_name}_sql"] = _sql_query(_sql)
    ORACLE[f"{_name}_sql"] = _sql
