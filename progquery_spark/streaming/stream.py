"""Structured Streaming twins of the batch event operators.

The reference is strictly batch (SURVEY.md §2.8 — javac runs once), so
streaming is additive capability, built the Spark-native way:

  readStream (file source) -> watermarked event-time windows -> sink

- ``hourly_stream``: tumbling 1-hour window aggregation with a 2-hour
  watermark — the streaming twin of ops.events.q_events_hourly. Tests run
  it with ``trigger(availableNow=True)`` against the same parquet and
  assert batch == streaming output.
- ``user_counter_stream``: custom stateful operator via
  ``applyInPandasWithState`` (GroupState) — a running per-user event
  counter + last-seen timestamp, the minimal template for the stateful
  ops the north star mentions (session state, dedup-by-key, CDC upserts).

File-source notes: schema must be supplied explicitly (no inference on
streams); ``pathGlobFilter`` scopes the directory to the events table.
At scale the source would be Kafka/Iceberg-CDC; the transformation layer
is source-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def hourly_stream(events: DataFrame) -> DataFrame:
    """Watermarked tumbling-window agg (streaming twin of events_hourly)."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_ep"),
            "event_type",
            "n",
            F.col("value_cents").cast("long"),
        )
    )


_COUNTER_OUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("last_ep", LongType(), False),
    ]
)
_COUNTER_STATE = StructType(
    [StructField("n", LongType(), False), StructField("last_ep", LongType(), False)]
)


def _count_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, last_ep = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_ep = max(last_ep, int(pdf["ts"].astype("int64").max() // 10**9))
    state.update((n, last_ep))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "last_ep": [last_ep]})


def user_counter_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count + last-seen,
    maintained in GroupState across micro-batches."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _count_user,
            outputStructType=_COUNTER_OUT,
            stateStructType=_COUNTER_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream with availableNow into a memory sink; return the
    final table (latest row per key for update-mode queries)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
