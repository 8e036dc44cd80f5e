"""codecdb_queryengine_spark — a PySpark-native OLAP + data-pipeline engine.

A from-scratch re-expression of the query surface of the reference engine
(UCHI-DB/codecdb-queryengine, a single-node C++ OLAP engine — "LQF" — embedded
in an Arrow fork; see /root/reference/cpp/src/lqf) on top of Apache Spark.

Design stance (SURVEY.md §7): semantics from the reference, architecture from
Spark.  The reference hand-assembles physical DAGs of filter / hash-join /
semi-join / aggregate / top-k operators over Parquet (reference:
cpp/src/lqf/parallel.cc:29-82); here every query is a declarative DataFrame
plan and Catalyst + Tungsten + AQE pick the physical strategy.  Custom work is
reserved for what Spark genuinely lacks: the reference's explicit
materialization points (lqf/mat.h) map to persist(), its semi-join reduction
idiom (lqf/join.h:179-199) maps to explicit left-semi pre-joins + runtime
bloom filters, and the LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal, streaming) are built as DataFrame /
Structured Streaming transformers.
"""

from codecdb_queryengine_spark.session import get_spark  # noqa: F401
from codecdb_queryengine_spark.catalog import load_tables, register_views  # noqa: F401
from codecdb_queryengine_spark.plans.builder import Plan  # noqa: F401

__version__ = "0.1.0"

__all__ = ["get_spark", "load_tables", "register_views", "Plan"]
