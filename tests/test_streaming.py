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


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    stream = E.read_events_stream(spark, sf_dir)
    result = E.run_to_memory(
        E.static_enriched_totals(stream, tables["customer"], tables["nation"]),
        "t_stream_enrich",
        output_mode="complete",
    )
    batch = (
        tables["events"]
        .join(tables["customer"], F.col("user_id") == F.col("c_custkey"))
        .join(tables["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
    )
    got = sorted((r.n_name, r.n, round(r.sum_value, 4)) for r in result.collect())
    exp = sorted((r.n_name, r.n, round(r.sum_value, 4)) for r in batch.collect())
    assert got == exp and len(got) > 0


def test_stream_dedup_drops_reinjected_duplicates(spark, sf_dir):
    # two readers of the same file unioned = every event seen twice
    doubled = E.read_events_stream(spark, sf_dir).unionByName(
        E.read_events_stream(spark, sf_dir)
    )
    result = E.run_to_memory(
        E.dedup_stream(doubled), "t_stream_dedup", output_mode="append"
    )
    ev = load_tables(spark, sf_dir)["events"]
    assert result.count() == ev.count()
    assert result.select("event_id").distinct().count() == ev.count()


def test_stream_stream_join_matches_batch(spark, sf_dir):
    stream = E.read_events_stream(spark, sf_dir)
    result = E.run_to_memory(
        E.purchases_with_recent_click(stream), "t_ss_join", output_mode="append"
    )
    ev = load_tables(spark, sf_dir)["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    batch = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 hour")),
    )
    got = sorted((r.purchase_id, r.click_id) for r in result.collect())
    exp = sorted((r.purchase_id, r.click_id) for r in batch.collect())
    assert got == exp and len(got) > 0


def test_parquet_sink_exactly_once_restart(spark, sf_dir, tmp_path):
    from codecdb_queryengine_spark.streaming import sinks

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = E.read_events_stream(spark, sf_dir).withColumn(
            "hour", F.date_trunc("hour", F.col("ts"))
        )
        q = sinks.stream_to_parquet(stream, out, ckpt, partition_by=("event_type",))
        q.awaitTermination()

    run_once()
    n_events = load_tables(spark, sf_dir)["events"].count()
    first = sinks.read_parquet_sink(spark, out)
    assert first.count() == n_events
    # restart with the same checkpoint: nothing new to process, no dupes
    run_once()
    assert sinks.read_parquet_sink(spark, out).count() == n_events
    # partition pruning works on the sink layout
    clicks = sinks.read_parquet_sink(spark, out).filter(F.col("event_type") == "click")
    assert 0 < clicks.count() < n_events


def test_materialized_rollup_emits_finalized_windows(spark, sf_dir, tmp_path):
    import datetime

    from codecdb_queryengine_spark.streaming import sinks

    out, ckpt = str(tmp_path / "rollup"), str(tmp_path / "rollup_ckpt")
    stream = E.read_events_stream(spark, sf_dir)
    q = sinks.materialize_rollup(stream, out, ckpt)
    q.awaitTermination()

    ev = load_tables(spark, sf_dir)["events"]
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(hours=2)
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    # append mode materializes exactly the windows finalized by the watermark
    expected = {
        (r.window_start, r.event_type, r.n, round(r.sum_value, 6))
        for r in batch.filter(F.col("window_end") < F.lit(horizon)).collect()
    }
    got = {
        (r.window_start, r.event_type, r.n, round(r.sum_value, 6))
        for r in sinks.read_parquet_sink(spark, out).collect()
    }
    assert got == expected and len(got) > 0
    # re-running the finished trigger appends nothing (immutable rollup rows)
    q2 = sinks.materialize_rollup(E.read_events_stream(spark, sf_dir), out, ckpt)
    q2.awaitTermination()
    assert sinks.read_parquet_sink(spark, out).count() == len(got)
