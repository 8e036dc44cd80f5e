"""Streaming sinks: checkpointed, partitioned, restart-idempotent.

The reference's only sink is a stdout Printer (reference:
cpp/src/lqf/print.h:74-90); a 100-TB ingestion pipeline needs durable
sinks with exactly-once restarts.  Structured Streaming gives this via
the checkpoint + file-sink commit log: re-running a finished availableNow
trigger is a no-op, a killed run resumes from the last committed batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = (),
    available_now: bool = True,
) -> StreamingQuery:
    """Append a stream to a partitioned parquet table with exactly-once
    semantics (file-sink commit log under `checkpoint`).

    Partitioning by a low-cardinality derived column (hour/day) keeps
    file counts bounded and gives downstream scans partition pruning.
    """
    w = df.writeStream.format("parquet").option("path", path).option(
        "checkpointLocation", checkpoint
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_parquet_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read back what the streaming sink committed (respects the sink's
    _spark_metadata commit log, so uncommitted files are invisible)."""
    return spark.read.parquet(path)


def materialize_rollup(
    events: DataFrame,
    path: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Hypertable-style continuous aggregate: the events stream rolls up
    into per-(window, event_type) rows appended to a parquet table as each
    window finalizes (append mode emits a window only once its end passes
    the watermark — so every materialized row is immutable and re-runs
    append nothing twice).

    The sink is the serving table: time-ordered, pre-aggregated,
    partition-prunable — the standard continuous-rollup pattern a
    TimescaleDB/Druid user expects, built from watermark + append + file
    commit log.  Windows newer than the watermark horizon stay pending in
    the state store until more data arrives.
    """
    from codecdb_queryengine_spark.streaming.events import windowed_counts

    rolled = windowed_counts(events, window=window, watermark=watermark)
    return stream_to_parquet(rolled, path, checkpoint)
