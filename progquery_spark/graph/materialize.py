"""Graph materialization: nodes + edges tables (SURVEY.md §1.5, §2.1 S4-S7).

Reference behavior reproduced:
- typed nodes with hypernym category labels attached at creation
  (NodeTypes.java:81-97, DatabaseFacade.addMultiLabelHypernyms,
  DatabaseFacade.java:44-47) — here a literal map lookup, no join;
- provenance on every node (DatabaseFacade.createSkeletonNode,
  DatabaseFacade.java:51-58);
- deterministic ids: the reference buffers writes, lets Neo4j assign ids,
  then *backfills* them into pending edge statements
  (DriverLazyInsertionService.java:65-80, InfoToInsert.java:51-63 — S7).
  We instead derive ids as xxhash64 of natural keys, so node and edge
  writes are independent and idempotent — the key semantic simplification
  Spark buys (SURVEY.md §2.1 S7);
- duplicate-edge suppression via guard sets (ASTTypesVisitor.java:925-932)
  -> dropDuplicates on (src, dst, rel_type, ordinal) (C3).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import NODE_CATEGORIES

def _category_map():
    # literal map: node_type -> hypernym categories. Built lazily (Column
    # construction needs an active SparkContext).
    return F.create_map(
        *chain.from_iterable(
            (F.lit(k), F.array(*[F.lit(c) for c in v]))
            for k, v in NODE_CATEGORIES.items()
        )
    )


def node_id(*cols):
    return F.xxhash64(*cols)


def _with_categories(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "categories",
        F.coalesce(_category_map()[F.col("node_type")], F.array(F.lit("PQ_NODE"))),
    )


_NODE_COLS = [
    "node_id",
    "node_type",
    "categories",
    "name",
    "canonical_key",
    "is_declared",
    "conv_id",
    "turn_idx",
    "span_start",
    "span_end",
    "props",
]

def _EMPTY_PROPS():
    return F.create_map().cast("map<string,string>")


def _pad(df: DataFrame) -> DataFrame:
    cols = set(df.columns)
    out = df
    defaults = {
        "name": F.lit(None).cast("string"),
        "canonical_key": F.lit(None).cast("string"),
        "is_declared": F.lit(True),
        "conv_id": F.lit(None).cast("string"),
        "turn_idx": F.lit(None).cast("int"),
        "span_start": F.lit(None).cast("int"),
        "span_end": F.lit(None).cast("int"),
        "props": _EMPTY_PROPS(),
    }
    for c, d in defaults.items():
        if c not in cols:
            out = out.withColumn(c, d)
    return _with_categories(out).select(*_NODE_COLS)


def build_nodes(
    transcripts: DataFrame,
    mentions: DataFrame,
    entities: DataFrame,
    alias_map: DataFrame,
) -> DataFrame:
    """All node families, unioned under NODE_SCHEMA."""
    conv_nodes = (
        transcripts.select("conv_id")
        .distinct()
        .select(
            node_id(F.lit("conv"), "conv_id").alias("node_id"),
            F.lit("CONVERSATION").alias("node_type"),
            F.col("conv_id").alias("name"),
            F.col("conv_id"),
        )
    )
    turn_nodes = transcripts.select(
        node_id(F.lit("turn"), "conv_id", "turn_idx").alias("node_id"),
        F.lit("TURN").alias("node_type"),
        F.col("role").alias("name"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.create_map(
            F.lit("role"), F.col("role"), F.lit("n_chars"), F.length("text").cast("string")
        ).alias("props"),
    )
    mention_nodes = mentions.select(
        node_id(
            F.lit("mention"), "conv_id", "turn_idx", "span_start", "mention_type"
        ).alias("node_id"),
        F.lit("MENTION").alias("node_type"),
        F.col("surface").alias("name"),
        F.col("norm_key").alias("canonical_key"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("span_start"),
        F.col("span_end"),
        F.create_map(F.lit("mention_type"), F.col("mention_type")).alias("props"),
    )
    # entity nodes live at the *canonical* key (placeholder rows that were
    # merged into a definition disappear here — the J5 rewiring analog)
    # alias-map join strategy is Catalyst/AQE's choice (no hard broadcast
    # hint): at 10^12 turns the alias map ≈ the distinct-entity set and a
    # forced broadcast is a guaranteed OOM; at sane scales the threshold
    # (session.py) broadcasts it anyway, and AQE converts shuffled joins
    # back to broadcast at runtime when the build side is actually small.
    ent_nodes = (
        entities.join(alias_map, "norm_key", "left")
        .withColumn("ck", F.coalesce("canonical_key", "norm_key"))
        .groupBy("ck")
        .agg(
            F.max("mention_type").alias("mention_type"),
            F.min("name").alias("name"),
            F.max("is_declared").alias("is_declared"),
            F.sum("n_mentions").alias("nm"),
            F.sum("n_surfaces").alias("ns"),
        )
        .select(
            node_id(F.lit("entity"), "ck").alias("node_id"),
            F.upper("mention_type").alias("node_type"),
            F.col("name"),
            F.col("ck").alias("canonical_key"),
            F.col("is_declared"),
            # analysis results as node attributes — the reference stamps
            # computed facts onto nodes the same way (mustBeExecuted,
            # isInitializer — ASTTypesVisitor.java:228,
            # ASTAuxiliarStorage.java:176-177)
            F.create_map(
                F.lit("n_mentions"),
                F.col("nm").cast("string"),
                F.lit("n_surfaces"),
                F.col("ns").cast("string"),
            ).alias("props"),
        )
    )
    lit_nodes = (
        mentions.filter(F.col("mention_type") == "literal")
        .select(F.col("norm_key"), F.col("surface"))
        .distinct()
        .select(
            node_id(F.lit("lit"), "norm_key").alias("node_id"),
            F.lit("LITERAL").alias("node_type"),
            F.col("surface").alias("name"),
            F.col("norm_key").alias("canonical_key"),
            F.lit(False).alias("is_declared"),
        )
    )
    return (
        _pad(conv_nodes)
        .unionByName(_pad(turn_nodes))
        .unionByName(_pad(mention_nodes))
        .unionByName(_pad(ent_nodes))
        .unionByName(_pad(lit_nodes))
    )


def alias_nodes(alias_map: DataFrame) -> DataFrame:
    """ALIAS tombstone nodes for merged-away keys.

    J5 rewiring (DefinitionCache.putDefinition, DefinitionCache.java:56-74)
    deletes the placeholder — but the class variant preserves a trace of
    the superseded definition (putClassDefinition keeps USES_TYPE_DEF,
    DefinitionCache.java:40-54). The analog: every norm key the CC merged
    into another canonical key keeps an ALIAS node at its pre-merge entity
    id, so ALIAS_OF edges have a first-class source endpoint and the merge
    is queryable output, not a silent rewrite."""
    merged = alias_map.filter(F.col("norm_key") != F.col("canonical_key"))
    return _pad(
        merged.select(
            node_id(F.lit("entity"), "norm_key").alias("node_id"),
            F.lit("ALIAS").alias("node_type"),
            F.col("norm_key").alias("name"),
            F.col("canonical_key"),
            F.lit(False).alias("is_declared"),
        )
    )


_EDGE_COLS = ["src_id", "dst_id", "rel_type", "rel_graph", "ordinal", "props"]


def mention_id_frame(mentions: DataFrame) -> DataFrame:
    """Narrow per-mention frame with both endpoint ids precomputed:
    (conv_id, turn_idx, span_start, mention_type, norm_key, is_decl,
    turn_id, mention_id).

    Every edge family that touches mentions (HAS_MENTION, REFERS_TO,
    MAY_REFER_TO) consumes THIS projection instead of re-reading the full
    mention snapshot — the pipeline localCheckpoints it once, so the wide
    columns (surface, spans) are scanned exactly once per edges stage
    instead of once per family (BENCH r2: stage_edges re-read the snapshot
    in four subtrees)."""
    return mentions.select(
        "conv_id",
        "turn_idx",
        "span_start",
        "mention_type",
        "norm_key",
        "is_decl",
        node_id(F.lit("turn"), "conv_id", "turn_idx").alias("turn_id"),
        node_id(
            F.lit("mention"), "conv_id", "turn_idx", "span_start", "mention_type"
        ).alias("mention_id"),
    )


def _edge(df: DataFrame, rel_type: str, rel_graph: str) -> DataFrame:
    out = df
    if "ordinal" not in df.columns:
        out = out.withColumn("ordinal", F.lit(None).cast("int"))
    if "props" not in out.columns:
        out = out.withColumn("props", _EMPTY_PROPS())
    return out.select(
        "src_id",
        "dst_id",
        F.lit(rel_type).alias("rel_type"),
        F.lit(rel_graph).alias("rel_graph"),
        "ordinal",
        "props",
    )


def build_edges(
    transcripts: DataFrame,
    mentions: DataFrame,
    canonical_triples: DataFrame,
    alias_map: DataFrame,
    mention_ids: DataFrame | None = None,
) -> DataFrame:
    """Structure + link + semantic edges (flow edges come from passes.py).

    ``mention_ids`` optionally supplies a precomputed (ideally
    checkpointed) ``mention_id_frame`` shared with ``may_refer_edges`` so
    the mention snapshot is scanned once per edges stage.

    REFERS_TO edges carry a ``role`` prop (declares | references) from the
    mention's declaredness — the PDG-analog use/def classification
    (reference: every identifier access typed USED_BY / MODIFIED_BY /
    STATE_MODIFIED_BY, PDGProcessing.java:299-321,361-376; our transcript
    grammar has two access roles, declaration vs reference).
    """
    if mention_ids is None:
        mention_ids = mention_id_frame(mentions)
    has_turn = transcripts.select(
        node_id(F.lit("conv"), "conv_id").alias("src_id"),
        node_id(F.lit("turn"), "conv_id", "turn_idx").alias("dst_id"),
        F.col("turn_idx").alias("ordinal"),
    )
    has_mention = mention_ids.select(
        F.col("turn_id").alias("src_id"),
        F.col("mention_id").alias("dst_id"),
    )
    # no broadcast hint on the alias map: see module docstring of
    # canonicalize.remap — Catalyst's threshold / AQE runtime conversion
    # picks broadcast when it actually fits, shuffled-hash when it doesn't
    refers_to = (
        mention_ids.filter(F.col("mention_type") != "literal")
        .join(alias_map, "norm_key", "left")
        .withColumn("ck", F.coalesce("canonical_key", "norm_key"))
        .select(
            F.col("mention_id").alias("src_id"),
            node_id(F.lit("entity"), "ck").alias("dst_id"),
            F.create_map(
                F.lit("role"),
                F.when(F.col("is_decl"), F.lit("declares")).otherwise(
                    F.lit("references")
                ),
            ).alias("props"),
        )
    )
    # semantic edges between canonical entities (literal objects -> LITERAL
    # nodes); one edge per distinct (src, dst, rel_type, ordinal) — C3 dedup
    # as a groupBy whose aggregate keeps the lexicographically-first
    # asserting (conv_id, turn_idx) as provenance props — the reference's
    # edges carry provenance attributes (exceptionType/methodName,
    # ASTAuxiliarStorage.java:120-125), and min() keeps the dedup
    # deterministic under any partitioning
    from ..canonicalize.remap import OBJ_IS_ENTITY

    sem = (
        canonical_triples.select(
            node_id(F.lit("entity"), "subj").alias("src_id"),
            F.when(
                F.col("pred").isin(*OBJ_IS_ENTITY), node_id(F.lit("entity"), "obj")
            )
            .otherwise(node_id(F.lit("lit"), F.concat(F.lit("lit:"), F.col("obj"))))
            .alias("dst_id"),
            F.col("pred").alias("rel_type"),
            F.col("ordinal"),
            "conv_id",
            "turn_idx",
        )
        .groupBy("src_id", "dst_id", "rel_type", "ordinal")
        .agg(F.min(F.struct("conv_id", "turn_idx")).alias("prov"))
        .select(
            "src_id",
            "dst_id",
            "rel_type",
            F.lit("SEMANTIC").alias("rel_graph"),
            "ordinal",
            F.create_map(
                F.lit("prov_conv"),
                F.col("prov.conv_id"),
                F.lit("prov_turn"),
                F.col("prov.turn_idx").cast("string"),
            ).alias("props"),
        )
    )

    return (
        _edge(has_turn, "HAS_TURN", "STRUCTURE")
        .unionByName(_edge(has_mention, "HAS_MENTION", "STRUCTURE"))
        .unionByName(_edge(refers_to, "REFERS_TO", "LINK"))
        .unionByName(sem.select(*_EDGE_COLS))
    )


def alias_of_edges(alias_map: DataFrame) -> DataFrame:
    """ALIAS_OF: merged-away key's (ALIAS) node -> canonical entity node —
    the materialized form of the J5 placeholder->definition rewiring."""
    merged = alias_map.filter(F.col("norm_key") != F.col("canonical_key"))
    return _edge(
        merged.select(
            node_id(F.lit("entity"), "norm_key").alias("src_id"),
            node_id(F.lit("entity"), "canonical_key").alias("dst_id"),
        ),
        "ALIAS_OF",
        "LINK",
    )


def may_refer_edges(
    mentions: DataFrame,
    entities: DataFrame,
    alias_map: DataFrame,
    may_pairs: DataFrame,
    mention_ids: DataFrame | None = None,
) -> DataFrame:
    """MAY_REFER_TO fan-out: mentions of an ambiguous key get an edge to
    each sub-threshold candidate's canonical entity.

    Reference semantics ported (rule, not mechanism):
    - fan-out across candidates: HierarchyAnalysis rewrites REFERS_TO into
      MAY_REFER_TO edges to every non-abstract overrider
      (HierarchyAnalysis.java:93-104);
    - trustable pruning: statically-bound invocations skip the fan-out
      (ASTAuxiliarStorage.checkIfTrustableInvocation,
      ASTAuxiliarStorage.java:48-62) — here a mention whose entity is
      *declared* is statically bound (customers introduce themselves,
      orders close their own conversation), so only placeholder-entity
      mentions fan out;
    - a candidate that resolves to the mention's own canonical entity is
      dropped (fan-out to the already-resolved target is no information).

    ``targets``/``decl`` derive from the may-pair set and the entity
    table; like the alias map they are left UNHINTED — the previous hard
    ``F.broadcast(decl)`` shipped the entire entity table to every
    executor, a guaranteed OOM at billion-entity scale. Catalyst/AQE
    broadcast them when (and only when) they fit the threshold.
    """
    if mention_ids is None:
        mention_ids = mention_id_frame(mentions)
    amap = alias_map
    targets = (
        may_pairs.select(
            F.col("key_a").alias("src_key"), F.col("key_b").alias("tgt_key")
        )
        .unionByName(
            may_pairs.select(
                F.col("key_b").alias("src_key"), F.col("key_a").alias("tgt_key")
            )
        )
        .join(
            amap.withColumnRenamed("norm_key", "tgt_key").withColumnRenamed(
                "canonical_key", "tgt_ck"
            ),
            "tgt_key",
            "left",
        )
        .select("src_key", F.coalesce("tgt_ck", "tgt_key").alias("tgt"))
        .distinct()
    )
    decl = entities.select(F.col("norm_key").alias("src_key"), "is_declared")
    fan = (
        mention_ids.filter(F.col("mention_type") != "literal")
        .withColumnRenamed("norm_key", "src_key")
        .join(targets, "src_key")
        .join(decl, "src_key")
        .filter(~F.col("is_declared"))
        .join(
            amap.withColumnRenamed("norm_key", "src_key").withColumnRenamed(
                "canonical_key", "src_ck"
            ),
            "src_key",
            "left",
        )
        .filter(F.col("tgt") != F.coalesce("src_ck", "src_key"))
        .select(
            F.col("mention_id").alias("src_id"),
            node_id(F.lit("entity"), "tgt").alias("dst_id"),
        )
        .dropDuplicates(["src_id", "dst_id"])
    )
    return _edge(fan, "MAY_REFER_TO", "LINK")
