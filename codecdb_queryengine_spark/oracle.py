"""Local mirror of the driver's correctness gate: Spark result vs DuckDB
oracle on the same parquet, order-insensitive, doubles rounded (FIXTURES.md §5).
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
from pyspark.sql import DataFrame

from codecdb_queryengine_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v: Any, ndigits: int = 2) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ndigits)
    if isinstance(v, list):
        return tuple(_norm_cell(x, ndigits) for x in v)
    return v


def normalize(rows: list[tuple], columns: list[str], ndigits: int = 2) -> list[tuple]:
    """Sort columns by name, then rows; round floats — mirrors the driver."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i], ndigits) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df: DataFrame, sql: str, sf_dir: str, ndigits: int = 2) -> tuple[bool, str]:
    """Return (match, detail). Row count + column names + normalized values."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    con = duckdb_connect(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [c[0] for c in res.description]
        d_rows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn = normalize(s_rows, s_cols, ndigits)
    dn = normalize(d_rows, d_cols, ndigits)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
