"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction query at sf0.001.
``queries()``   — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``— matching DuckDB SQL per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from progquery_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: extract + link + canonicalize over synthesized transcripts
    at sf0.001; returns the canonical triple set with provenance."""
    return Q.q_triples_canonical(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from progquery_spark.ops import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(Q.kg_queries())
    out.update(all_queries())
    return out


def oracle_sql() -> dict[str, str]:
    from progquery_spark.ops import all_oracles

    out: dict[str, str] = {}
    out.update(Q.kg_oracles())
    out.update(all_oracles())
    return out
