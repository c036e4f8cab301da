"""Event-stream operators over the ``events`` table: gap sessionization and
tumbling-window aggregation — the batch forms whose streaming twins live in
``progquery_spark.streaming`` (same logic via readStream + availableNow;
tests assert batch == streaming output).

Money/value columns go through cents (round(value*100) as BIGINT) so the
aggregation is exact integer arithmetic — immune to float sum ordering in
either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import register_sf_views

SESSION_GAP_S = 1800  # 30 min
WINDOW_S = 3600  # 1 h tumbling


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sf_views(spark, sf_dir)
    return spark.table("events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("ep"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )


def sessionize(ev: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Classic gap sessionization: new session when the gap from the
    previous event of the same user exceeds ``gap_s``. Two window passes
    over one shuffle on user_id (lag -> flag -> running sum = session ordinal).
    Ties on ts are broken by event_id for a total order."""
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            (F.col("ep") - F.lag("ep").over(w)) > gap_s, F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "new_sess", F.when(F.lag("ep").over(w).isNull(), F.lit(1)).otherwise(F.col("new_sess"))
    )
    return flagged.withColumn(
        "session_ord", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = sessionize(_events(spark, sf_dir))
    return s.groupBy("user_id", "session_ord").agg(
        F.min("ep").alias("t_start_ep"),
        F.max("ep").alias("t_end_ep"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_cents").cast("long").alias("value_cents"),
    ).withColumn("session_ord", F.col("session_ord").cast("long"))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("hour_ep", (F.col("ep") - F.pmod("ep", F.lit(WINDOW_S))).cast("long"))
        .groupBy("event_type", "hour_ep")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value_cents").cast("long").alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def queries():
    return {
        "events_sessionized": q_events_sessionized,
        "events_hourly": q_events_hourly,
    }


def oracles():
    base = """
        -- floor(epoch()) because events.ts carries sub-second fractions:
        -- Spark's unix_timestamp truncates, a bare BIGINT cast would round
        ev AS (SELECT event_id, user_id, event_type,
                      CAST(floor(epoch(ts)) AS BIGINT) AS ep,
                      CAST(round(value * 100) AS BIGINT) AS value_cents
               FROM events)
    """
    return {
        "events_sessionized": f"""
        WITH {base},
        flagged AS (
          SELECT *,
                 CASE WHEN LAG(ep) OVER w IS NULL THEN 1
                      WHEN ep - LAG(ep) OVER w > {SESSION_GAP_S} THEN 1
                      ELSE 0 END AS new_sess
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)),
        sess AS (
          SELECT *,
                 SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ep, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_ord
          FROM flagged)
        SELECT user_id, CAST(session_ord AS BIGINT) AS session_ord,
               MIN(ep) AS t_start_ep, MAX(ep) AS t_end_ep,
               COUNT(*) AS n_events,
               CAST(SUM(value_cents) AS BIGINT) AS value_cents
        FROM sess GROUP BY user_id, session_ord
        """,
        "events_hourly": f"""
        WITH {base}
        SELECT event_type,
               CAST(ep - ep % {WINDOW_S} AS BIGINT) AS hour_ep,
               COUNT(*) AS n,
               CAST(SUM(value_cents) AS BIGINT) AS value_cents,
               COUNT(DISTINCT user_id) AS n_users
        FROM ev GROUP BY event_type, ep - ep % {WINDOW_S}
        """,
    }
