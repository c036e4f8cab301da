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


def test_streaming_kg_extract_equals_batch(spark, tmp_path):
    """availableNow drain of the stateful streaming extractor emits exactly
    the batch extraction rows (same conversations, same triples)."""
    from progquery_spark.datagen import build_transcripts
    from progquery_spark.extraction.extract import extract
    from progquery_spark.streaming.kg_stream import (
        run_streaming_extract_available_now,
    )

    tr = build_transcripts(spark, "/root/testdata/sf0.001")
    inp = str(tmp_path / "turns")
    tr.write.parquet(inp)

    q = run_streaming_extract_available_now(
        spark, inp, str(tmp_path / "ckpt"), "kg_stream_out"
    )
    q.awaitTermination(300)

    key_cols = "conv_id, turn_idx, kind, coalesce(norm_key, subj, ''), " \
        "coalesce(pred, mention_type, ''), span_start, span_end"
    got = {
        tuple(r)
        for r in spark.sql(
            f"SELECT {key_cols} FROM kg_stream_out"
        ).collect()
    }
    extract(tr).createOrReplaceTempView("kg_batch_out")
    want = {
        tuple(r)
        for r in spark.sql(f"SELECT {key_cols} FROM kg_batch_out").collect()
    }
    assert got == want and len(got) > 0
