"""Streaming pinned against its batch twin: the windowed aggregation over
the events file-stream must produce exactly the batch groupBy result."""

from pyspark.sql import functions as F

from codecdb_queryengine_spark.catalog import load_tables
from codecdb_queryengine_spark.streaming import events as E


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = E.read_events_stream(spark, sf_dir)
    assert stream.isStreaming
    result = E.run_to_memory(E.windowed_counts(stream), "t_windowed_counts")

    ev = load_tables(spark, sf_dir)["events"]
    batch = (
        ev.groupBy(F.window("ts", "1 hour").getField("start").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
    )
    got = sorted(
        (r.window_start, r.event_type, r.n, round(r.sum_value, 6)) for r in result.collect()
    )
    exp = sorted(
        (r.window_start, r.event_type, r.n, round(r.sum_value, 6)) for r in batch.collect()
    )
    assert got == exp


def test_session_windows_run(spark, sf_dir):
    stream = E.read_events_stream(spark, sf_dir)
    result = E.run_to_memory(E.session_windows(stream), "t_session_windows")
    rows = result.collect()
    assert len(rows) > 0
    # session windows must be disjoint per user and ordered start < end
    assert all(r.session_start < r.session_end for r in rows)


def test_stateful_running_totals_match_batch(spark, sf_dir):
    stream = E.read_events_stream(spark, sf_dir)
    result = E.run_to_memory(
        E.running_user_totals(stream), "t_running_totals", output_mode="update"
    )
    # Last emitted row per user = final state; with one input file there is
    # one batch, but dedupe by latest anyway to stay trigger-count agnostic.
    final = {}
    for r in result.collect():
        final[r.user_id] = (r.n_events, round(r.sum_value, 6))
    ev = load_tables(spark, sf_dir)["events"]
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    )
    exp = {r.user_id: (r.n, round(r.s, 6)) for r in batch.collect()}
    assert final == exp
