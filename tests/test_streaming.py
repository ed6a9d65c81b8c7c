"""Structured Streaming tests: the streaming tumbling aggregation must
equal its batch twin (q_tumbling_events grouping) over the same data;
dedup stream preserves distinct event_ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from p6_spark.sources.tables import load_table
from p6_spark.streaming.events import (
    deduped_stream,
    read_events_stream,
    run_to_memory,
    tumbling_counts,
)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    run_to_memory(stream, "stream_tumbling")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from stream_tumbling").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,12)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    )
    want = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"]) for r in batch}
    # append mode only emits windows closed by the watermark: the final
    # watermark horizon (max_ts - 2h) legitimately holds back the last
    # window(s). Everything emitted must match batch exactly.
    assert len(got) > 0
    assert got.items() <= want.items()
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    import datetime

    horizon = max_ts - datetime.timedelta(hours=3)  # watermark 2h + 1h window
    missing = set(want) - set(got)
    assert all(ws >= horizon for ws, _ in missing)


def test_stream_dedup_distinct_ids(spark, sf_dir):
    stream = deduped_stream(read_events_stream(spark, sf_dir))
    run_to_memory(stream.select("event_id"), "stream_dedup")
    n = spark.sql("select count(distinct event_id) c, count(*) n from stream_dedup").collect()[0]
    assert n["c"] == n["n"] > 0
