"""Canonicalization: remap triple/edge endpoints through the alias map
(SURVEY.md §2.4 C1 — the batch form of DefinitionCache.putDefinition's
eager edge rewiring, DefinitionCache.java:56-74: every in/out edge moves
from the placeholder to the definition).

Two broadcast-or-shuffle joins (subj side, obj side). The alias map is
small relative to the triple set (≈ #distinct entities) but NOT guaranteed
small in absolute terms — at 10^12-turn scale it approaches the distinct-
entity set (potentially billions of rows). The join strategy is therefore
deliberately left to Catalyst + AQE (no ``F.broadcast`` hard hint, which
Spark would honor regardless of size and OOM on): a parquet-backed alias
map under ``autoBroadcastJoinThreshold`` plans a static broadcast join; a
checkpointed or oversized one starts as a shuffled join and AQE converts
it to broadcast at runtime when the actual build-side bytes are small, or
keeps the shuffled hash join with skew splitting when they are not
(plan-tested both ways in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# predicates whose object is an entity reference (closed vocabulary —
# schemas.REL_GRAPHS['SEMANTIC']); others carry literal objects which must
# pass through *byte-identical* (the per-turn text-equality discipline).
OBJ_IS_ENTITY = ("from_nation", "placed", "includes", "supplied_by")


def normalize_endpoint(col: F.Column) -> F.Column:
    """surface-typed endpoint -> norm key (prefix + lowercased surface)."""
    return F.lower(col)


def canonicalize_triples(triples: DataFrame, alias_map: DataFrame) -> DataFrame:
    """raw surface triples -> canonical-key triples.

    subj is always an entity reference; obj only for OBJ_IS_ENTITY preds.
    """
    t = triples.withColumn("subj_norm", normalize_endpoint(F.col("subj"))).withColumn(
        "obj_norm",
        F.when(
            F.col("pred").isin(*OBJ_IS_ENTITY), normalize_endpoint(F.col("obj"))
        ).otherwise(F.col("obj")),
    )
    amap = alias_map
    t = (
        t.join(
            amap.withColumnRenamed("norm_key", "subj_norm").withColumnRenamed(
                "canonical_key", "subj_canon"
            ),
            "subj_norm",
            "left",
        )
        .join(
            amap.withColumnRenamed("norm_key", "obj_norm").withColumnRenamed(
                "canonical_key", "obj_canon"
            ),
            "obj_norm",
            "left",
        )
    )
    return t.select(
        "conv_id",
        "turn_idx",
        F.coalesce("subj_canon", "subj_norm").alias("subj"),
        "pred",
        F.when(F.col("pred").isin(*OBJ_IS_ENTITY), F.coalesce("obj_canon", "obj_norm"))
        .otherwise(F.col("obj"))
        .alias("obj"),
        "ordinal",
        "span_start",
        "span_end",
    )
