"""Schemas + closed vocabularies for the transcript knowledge graph.

Mirrors the reference's data model (SURVEY.md §1):
- closed node-type vocabulary with hypernym categories
  (reference: NodeTypes.java:8-97 + NodeCategory.java:5-18 — 79 types /
  17 categories; ours is the transcript-domain equivalent),
- closed edge vocabularies namespaced per overlay graph
  (reference: 6 Relation* enums, database/relations/*.java),
- open string->string property map on nodes and edges
  (reference: setProperty call sites throughout),
- provenance columns on every node (reference: lineNumber/column/position,
  DatabaseFacade.java:51-58) — here (conv_id, turn_idx, span_start, span_end),
- ordinal on ordered edges (reference: argumentIndex/paramIndex,
  ASTTypesVisitor.java:994-1002).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input table (fixed by BASELINE.json input_hint)
# ---------------------------------------------------------------------------
TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), False),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Extraction outputs
# ---------------------------------------------------------------------------
MENTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("mention_type", StringType(), False),
        StructField("surface", StringType(), False),
        StructField("norm_key", StringType(), False),  # lower-cased surface key
        StructField("span_start", IntegerType(), False),
        StructField("span_end", IntegerType(), False),
        StructField("is_decl", BooleanType(), False),  # mention *declares* entity
    ]
)

TRIPLE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("subj", StringType(), False),
        StructField("pred", StringType(), False),
        StructField("obj", StringType(), False),
        StructField("ordinal", IntegerType(), True),
        StructField("span_start", IntegerType(), False),
        StructField("span_end", IntegerType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Graph tables (the Neo4j-property-graph analog, SURVEY.md §1.5)
# ---------------------------------------------------------------------------
NODE_SCHEMA = StructType(
    [
        StructField("node_id", LongType(), False),
        StructField("node_type", StringType(), False),
        StructField("categories", ArrayType(StringType()), False),
        StructField("name", StringType(), True),
        StructField("canonical_key", StringType(), True),
        StructField("is_declared", BooleanType(), False),
        StructField("conv_id", StringType(), True),
        StructField("turn_idx", IntegerType(), True),
        StructField("span_start", IntegerType(), True),
        StructField("span_end", IntegerType(), True),
        StructField("props", MapType(StringType(), StringType()), True),
    ]
)

EDGE_SCHEMA = StructType(
    [
        StructField("src_id", LongType(), False),
        StructField("dst_id", LongType(), False),
        StructField("rel_type", StringType(), False),
        StructField("rel_graph", StringType(), False),
        StructField("ordinal", IntegerType(), True),
        StructField("props", MapType(StringType(), StringType()), True),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("stage", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("input_rows", LongType(), False),
        StructField("rows_out", LongType(), False),
        StructField("wall_ms", LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Closed vocabularies (reference: NodeTypes/NodeCategory enums)
# ---------------------------------------------------------------------------
# node_type -> hypernym categories; applied at node creation exactly like
# DatabaseFacade.addMultiLabelHypernyms (DatabaseFacade.java:44-47): a
# deterministic closed map, attached via a literal expression — no join.
NODE_CATEGORIES: dict[str, list[str]] = {
    "CONVERSATION": ["CONTAINER", "PQ_NODE"],
    "TURN": ["CONTAINER", "PQ_NODE"],
    "MENTION": ["OCCURRENCE", "PQ_NODE"],
    "ENTITY": ["DEFINITION", "PQ_NODE"],
    "CUSTOMER": ["ENTITY", "AGENT", "DEFINITION", "PQ_NODE"],
    "NATION": ["ENTITY", "PLACE", "DEFINITION", "PQ_NODE"],
    "ORDER": ["ENTITY", "ARTIFACT", "DEFINITION", "PQ_NODE"],
    "PART": ["ENTITY", "ARTIFACT", "DEFINITION", "PQ_NODE"],
    "SUPPLIER": ["ENTITY", "AGENT", "DEFINITION", "PQ_NODE"],
    "LITERAL": ["VALUE", "PQ_NODE"],
    # merged-away norm key kept as a queryable tombstone (J5 trace —
    # DefinitionCache.putClassDefinition preserves a trace of superseded
    # definitions, DefinitionCache.java:40-54)
    "ALIAS": ["DEFINITION", "PQ_NODE"],
}

# Edge vocabularies, namespaced by overlay graph (reference: the six
# disjoint Relation* enums — SURVEY.md §1.1 table).
REL_GRAPHS: dict[str, list[str]] = {
    # AST-analog: syntactic containment of the transcript itself
    "STRUCTURE": ["HAS_TURN", "HAS_MENTION", "NEXT_TURN"],
    # CFG-analog: conversational flow (reference: CFGRelationTypes)
    "FLOW": ["NEXT_TURN_SAME_ROLE", "REPLIES_TO", "TOOL_RESULT_OF"],
    # semantic triples (reference: PDG/CG edges)
    "SEMANTIC": [
        "from_nation",
        "placed",
        "has_priority",
        "includes",
        "supplied_by",
        "has_total",
        "has_status",
    ],
    # linking graph (reference: REFERS_TO / MAY_REFER_TO, HAS_DEF)
    "LINK": ["REFERS_TO", "MAY_REFER_TO", "ALIAS_OF"],
}

PREDICATES = tuple(REL_GRAPHS["SEMANTIC"])

MENTION_TYPES = ("customer", "nation", "order", "part", "supplier", "literal")

# entity mention types that get ENTITY nodes (literals become LITERAL nodes)
ENTITY_MENTION_TYPES = ("customer", "nation", "order", "part", "supplier")

# which mention types *declare* their entity (reference: isDeclared —
# DatabaseFacade.createNonDeclaredCLASSTypeDecNode, DatabaseFacade.java:126-134:
# a reference to a never-declared entity yields an isDeclared=false
# placeholder). In our domain: a customer introducing themselves ("I am X")
# declares X; an order being placed+closed in its own conversation declares
# the order; nations/parts/suppliers are only ever referenced -> placeholders.
DECLARING_MENTION_TYPES = ("customer", "order")
