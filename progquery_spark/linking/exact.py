"""Exact-key entity linking with placeholder synthesis (SURVEY.md §2.3 J1-J4).

Reference semantics being reproduced:
- lookup by natural key, and on miss create an ``isDeclared=false``
  placeholder registered under the same key
  (DefinitionCache.java:96-112; ASTTypesVisitor.java:1077-1081,108-160;
  DatabaseFacade.createNonDeclaredCLASSTypeDecNode, DatabaseFacade.java:126-134);
- forward references: the reference defers them as closures in a
  ``toDo`` map replayed when the declaration arrives
  (PDGProcessing.java:42,107-114). In batch Spark the mechanism dissolves:
  we extract *everything first*, then resolve declaredness with one
  aggregation — arrival order cannot matter (tested by the
  order-invariance fixture).

Implementation is pure DataFrame ops — one shuffle on ``norm_key``:
``max(is_decl)`` per key plays the role of "a declaration arrived at some
point"; keys where it is false are the synthesized placeholders (the
left-anti branch of the J1 pattern collapses into the same aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ENTITY_MENTION_TYPES


def surface_stats(mentions: DataFrame) -> DataFrame:
    """One-shuffle pre-aggregation over the (huge) mention set.

    Returns (mention_type, surface, norm_key, is_decl, n_mentions), one row
    per distinct entity surface — orders of magnitude smaller than the
    mention set (distinct surfaces vs occurrences). Both the entity table
    and the alias graph derive from this table with cheap re-aggregations,
    so the corpus-sized shuffle on the mention columns happens exactly once
    per run instead of once per consumer.
    """
    ent = mentions.filter(F.col("mention_type").isin(*ENTITY_MENTION_TYPES))
    return ent.groupBy("mention_type", "surface", "norm_key").agg(
        F.max("is_decl").alias("is_decl"),
        F.count(F.lit(1)).alias("n_mentions"),
    )


def link_entities_from_stats(stats: DataFrame) -> DataFrame:
    """surface_stats -> pre-canonicalization entity table.

    Returns (norm_key, mention_type, name, is_declared, n_mentions,
    n_surfaces). ``name`` is the lexicographically-min surface — a
    deterministic representative (min-tie-breaking keeps P/R parity stable,
    SURVEY.md §7.3.1). ``norm_key`` is a function of (mention_type,
    surface), so per-group surface counts equal the stats row counts.
    """
    return stats.groupBy("norm_key", "mention_type").agg(
        F.min("surface").alias("name"),
        F.max("is_decl").alias("is_declared"),
        F.sum("n_mentions").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_surfaces"),
    )


def link_entities(mentions: DataFrame) -> DataFrame:
    """mentions -> entity table (J1-J4); see link_entities_from_stats."""
    return link_entities_from_stats(surface_stats(mentions))


def alias_edges_from_stats(stats: DataFrame) -> DataFrame:
    """surface_stats -> alias-graph edges: surface-vertex <-> norm-vertex.

    Vertex ids are strings; surface vertices are namespaced so a surface
    that happens to equal a norm key cannot collide. Rows of ``stats`` are
    already unique per (mention_type, surface), so no dedup is needed.
    Fuzzy linking (linking.fuzzy) unions additional norm<->norm edges into
    this graph.
    """
    return stats.select(
        F.concat(
            F.lit("s|"), F.col("mention_type"), F.lit("|"), F.col("surface")
        ).alias("src"),
        F.col("norm_key").alias("dst"),
    )


def alias_edges_exact(mentions: DataFrame) -> DataFrame:
    """mentions -> alias-graph edges; see alias_edges_from_stats."""
    return alias_edges_from_stats(surface_stats(mentions))
