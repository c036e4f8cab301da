"""Streaming twins must agree with their batch forms (availableNow drain
over the same parquet)."""

import pyspark.sql.functions as F

from progquery_spark.ops.events import q_events_hourly
from progquery_spark.streaming.stream import (
    hourly_stream,
    read_event_stream,
    run_available_now,
    user_counter_stream,
)

SF = "/root/testdata/sf0.001"


def test_hourly_stream_equals_batch(spark):
    stream = hourly_stream(read_event_stream(spark, SF))
    got = run_available_now(stream, "t_hourly")
    s = {
        (r["hour_ep"], r["event_type"], r["n"], r["value_cents"])
        for r in got.collect()
    }
    b = {
        (r["hour_ep"], r["event_type"], r["n"], r["value_cents"])
        for r in q_events_hourly(spark, SF).select(
            "hour_ep", "event_type", "n", "value_cents"
        ).collect()
    }
    assert s == b and len(s) > 0


def test_stateful_user_counter(spark):
    stream = user_counter_stream(read_event_stream(spark, SF))
    got = run_available_now(stream, "t_counter")
    # update mode: keep the last emitted row per user
    final = {r["user_id"]: r["n_events"] for r in got.collect()}
    batch = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == batch and len(final) > 0
