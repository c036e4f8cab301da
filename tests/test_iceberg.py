"""Environment-gated Iceberg integration test (VERDICT r3 #7).

The sandbox ships no Iceberg jars, so ``io.sinks.write_stage``'s
``writeTo`` branch and the C4 ``iceberg_merge_statements`` pair can only
be semantics-verified here (DuckDB execution of the exact statements,
tests/test_pipeline.py). The day the environment grows
``iceberg-spark-runtime-*.jar`` — drop it into ``$SPARK_HOME/jars`` or
point ``PQ_ICEBERG_JARS`` at it — this test self-activates and verifies
the real catalog path end-to-end: stage write via ``writeTo``, hidden
``bucket(conv_id)`` partitioning, and the keyed DELETE + append merge as
two Iceberg snapshots.

Run it STANDALONE (``pytest tests/test_iceberg.py``): it must own the
JVM's session config (catalog + extensions are set at session build), so
it cannot share the suite's session fixture.
"""

from __future__ import annotations

import glob
import os

import pytest


def _iceberg_jars() -> list[str]:
    extra = os.environ.get("PQ_ICEBERG_JARS")
    if extra:
        return extra.split(",")
    roots = [os.environ.get("SPARK_HOME")]
    try:
        import pyspark

        roots.append(os.path.dirname(pyspark.__file__))
    except ImportError:
        pass
    hits: list[str] = []
    for r in roots:
        if r:
            hits += glob.glob(os.path.join(r, "jars", "iceberg-spark-runtime*.jar"))
    return hits


pytestmark = pytest.mark.skipif(
    not _iceberg_jars(),
    reason="no iceberg-spark-runtime jar in this environment "
    "(set PQ_ICEBERG_JARS or add it to $SPARK_HOME/jars); the merge "
    "semantics are pinned by test_iceberg_merge_statements_semantics",
)


def test_iceberg_write_stage_and_c4_merge(tmp_path):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from progquery_spark.io.sinks import iceberg_merge_statements, write_stage

    spark = (
        SparkSession.builder.appName("pq-iceberg-it")
        .master("local[2]")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.pq", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.pq.type", "hadoop")
        .config("spark.sql.catalog.pq.warehouse", str(tmp_path / "icewh"))
        .getOrCreate()
    )
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS pq.db")
        base = spark.createDataFrame(
            [("conv-1", 0, "a"), ("conv-1", 1, "b"), ("conv-2", 0, "c")],
            "conv_id string, turn_idx int, text string",
        )
        # stage write through the Iceberg branch (atomic snapshot commit);
        # production tables use hidden bucket(conv_id) partitioning
        spark.sql(
            "CREATE TABLE IF NOT EXISTS pq.db.transcripts "
            "(conv_id string, turn_idx int, text string) USING iceberg "
            "PARTITIONED BY (bucket(4, conv_id))"
        )
        write_stage(base, "pq.db.transcripts")
        assert spark.table("pq.db.transcripts").count() == 3

        # C4 merge: conv-1 re-compiled (replaced), conv-3 appended
        batch = spark.createDataFrame(
            [("conv-1", 0, "a2"), ("conv-3", 0, "d")],
            "conv_id string, turn_idx int, text string",
        )
        batch.createOrReplaceTempView("staging_batch")
        for stmt in iceberg_merge_statements("pq.db.transcripts", "staging_batch"):
            spark.sql(stmt)
        got = {
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in spark.table("pq.db.transcripts").collect()
        }
        assert got == {("conv-1", 0, "a2"), ("conv-2", 0, "c"), ("conv-3", 0, "d")}

        # the merge pair is idempotent under re-run (crash-resume contract)
        for stmt in iceberg_merge_statements("pq.db.transcripts", "staging_batch"):
            spark.sql(stmt)
        again = {
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in spark.table("pq.db.transcripts").collect()
        }
        assert again == got
        # two more snapshots were committed (DELETE + append), history grows
        assert (
            spark.sql("SELECT COUNT(*) AS n FROM pq.db.transcripts.snapshots")
            .collect()[0]["n"]
            >= 4
        )
        # writeTo branch detection: _has_iceberg sees the catalog conf
        from progquery_spark.io.sinks import _has_iceberg

        assert _has_iceberg(spark)
    finally:
        spark.stop()
