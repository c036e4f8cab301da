"""Driver-facing correctness queries (SURVEY.md §2 operator inventory).

Each callable takes (spark, sf_dir) and returns a DataFrame whose columns /
types align exactly with the matching ``oracle.*_sql()`` DuckDB query.
Every query is a lazy composition of the real pipeline stages — nothing is
special-cased for the oracle; the driver's value-hash compare therefore
certifies the production code path.

Inventory mapping (SURVEY.md §2):
  kg_transcripts        S2/S3  source synthesis (conv reassembly input)
  kg_mentions           E1-E10 mention detection
  kg_triples_raw        E1-E10 (subj, pred, obj) emission w/ spans+ordinal
  kg_entities           J1-J4  exact linking + placeholder synthesis
  kg_alias_map          J5/C2  CC canonicalization (exact == identity)
  kg_triples_canonical  C1     endpoint remap through alias map
  kg_fuzzy_pairs        §2.3   MinHash-LSH blocking + structure verify
  kg_triples_canonical_fuzzy J5/C1-C2 remap through exact+fuzzy CC
  kg_link_edges         G3     ALIAS_OF + MAY_REFER_TO fan-out w/
                               trustable pruning (HierarchyAnalysis)
  kg_node_counts        S4/§1  node materialization (typed + hypernyms)
  kg_node_props         §1.2   analysis results as node attributes
  kg_edge_counts        S4/C3  edge materialization + dedup + flow (G1)
  kg_edge_props         §1.3   property-bearing edges (gap_s, provenance)
  kg_next_turn          G1     CFG-analog sequential threading
  kg_modality           A4/G4  consensus may/must
  kg_must_reach         G4     iterative summary-propagation fixpoint
  kg_reachability       G3/G5  iterative BFS over the entity DAG
  kg_mention_counts     §4.3.1 salted two-phase aggregation
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .canonicalize.cc import canonical_map, connected_components
from .canonicalize.remap import canonicalize_triples
from .datagen import build_transcripts
from .extraction.extract import extract, mentions_of, triples_of
from .graph.materialize import build_edges, build_nodes
from .graph.passes import (
    consensus_modality,
    entity_reachability,
    flow_edges,
    must_reach_fixpoint,
    salted_mention_counts,
)
from .linking.exact import (
    alias_edges_from_stats,
    link_entities,
    link_entities_from_stats,
    surface_stats,
)
from .linking.fuzzy import (
    alias_edges_from_scored,
    fuzzy_alias_edges,
    fuzzy_scored_pairs,
    may_pairs_from_scored,
)


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_transcripts(spark, sf_dir)


# One extraction pass per (session, sf_dir): without a materialization
# barrier, a query that consumes both mentions_of(ex) and triples_of(ex)
# holds the mapInPandas subtree twice in one plan and Spark may run the
# regex pass twice (ReuseExchange is not guaranteed across mapInPandas).
# The pipeline path avoids this with stage snapshots; the bare query path
# localCheckpoints the extraction once and every query of the session
# reuses it (keyed by applicationId so a stopped session's entries can
# never be returned to a new one).
#
# Eviction: entries (and the checkpointed blocks they pin) live until the
# session stops — correct for the driver gate and bench (one session, a
# few sf_dirs), but a long-lived service iterating many sf_dirs should
# call clear_query_caches() between datasets.
_EX_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_query_caches() -> None:
    """Drop the per-session extraction/alias-map checkpoints (releases the
    pinned localCheckpoint blocks; see _EX_CACHE eviction note)."""
    _EX_CACHE.clear()
    _AMAP_CACHE.clear()
    from .ops.similarity import _CB_CACHE

    _CB_CACHE.clear()


def _extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _EX_CACHE.get(key)
    if df is None:
        df = extract(_transcripts(spark, sf_dir)).localCheckpoint(eager=True)
        _EX_CACHE[key] = df
    return df


def _alias_map_from_stats(stats: DataFrame) -> DataFrame:
    labels, _ = connected_components(alias_edges_from_stats(stats))
    return canonical_map(
        labels, stats.select("norm_key").dropDuplicates(["norm_key"])
    )


def _alias_map(mentions: DataFrame, entities: DataFrame) -> DataFrame:
    labels, _ = connected_components(
        alias_edges_from_stats(surface_stats(mentions))
    )
    return canonical_map(labels, entities.select("norm_key"))


# Exact alias map cached per (session, sf_dir), like _EX_CACHE: the CC
# loop is driver-coordinated (per-round jobs), so nine oracle queries
# re-running it from scratch is pure waste. Fixture-fed helpers above stay
# uncached (content isn't keyable by path).
_AMAP_CACHE: dict[tuple[str, str], DataFrame] = {}


def _alias_map_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _AMAP_CACHE.get(key)
    if df is None:
        m = mentions_of(_extraction(spark, sf_dir))
        df = _alias_map_from_stats(surface_stats(m)).localCheckpoint(eager=True)
        # SIZE-GATED broadcast hint (VERDICT r2 #1: no unconditional
        # hints). A checkpointed frame carries no Catalyst stats, so
        # every downstream join would pay an AQE runtime conversion
        # (measured: q_canonical 9.5 -> ~20 s at sf0.1). The frame is
        # already materialized, so one aggregation over it is cheap; hint
        # ONLY when the MEASURED bytes — actual key byte lengths plus
        # ~48 B/row of UnsafeRow + hashed-relation overhead, not a
        # hardcoded per-row constant (ADVICE r3: long surface keys could
        # pass a count*96 gate while the real broadcast is far larger) —
        # fit the session threshold. At billion-entity scale the gate
        # fails and the joins stay shuffled.
        try:
            thr = int(spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
        except ValueError:  # e.g. "10m" form — be conservative, no hint
            thr = -1
        if thr > 0:
            est = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.octet_length("norm_key") + F.octet_length("canonical_key")
                ).alias("key_bytes"),
            ).collect()[0]
            if (est["key_bytes"] or 0) + 48 * est["n"] <= thr:
                df = F.broadcast(df)
        _AMAP_CACHE[key] = df
    return df


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_timestamp("ts").alias("ts_epoch"),
    )


def q_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mentions_of(_extraction(spark, sf_dir))


def q_triples_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triples_of(_extraction(spark, sf_dir))


def q_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    return link_entities(mentions_of(_extraction(spark, sf_dir)))


def q_alias_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _alias_map_cached(spark, sf_dir)


def q_triples_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = _extraction(spark, sf_dir)
    amap = _alias_map_cached(spark, sf_dir)
    return canonicalize_triples(triples_of(ex), amap)


def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH blocking + structure-aware verify over the entity table
    (the north star's signature stage; reference analog:
    DefinitionCache.putDefinition unifying references through one key,
    DefinitionCache.java:56-74 — generalized to approximate keys)."""
    ents = link_entities(mentions_of(_extraction(spark, sf_dir)))
    return fuzzy_alias_edges(ents).select("src", "dst")


def q_triples_canonical_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical triples with the fuzzy alias pairs unioned into the CC
    graph: typo'd supplier keys (datagen.supp_typo) collapse into their
    true entities before endpoint remapping."""
    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    stats = surface_stats(m)
    ents = link_entities_from_stats(stats)
    edges = alias_edges_from_stats(stats).unionByName(fuzzy_alias_edges(ents))
    labels, _ = connected_components(edges)
    amap = canonical_map(labels, ents.select("norm_key"))
    return canonicalize_triples(triples_of(ex), amap)


def q_link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINK-graph edge counts from the fuzzy layer: ALIAS_OF (accepted
    merges, J5 trace) and MAY_REFER_TO (sub-threshold fan-out with the
    trustable-pruning rule — HierarchyAnalysis.java:93-104,
    ASTAuxiliarStorage.java:48-62)."""
    from .graph.materialize import alias_of_edges, may_refer_edges

    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    stats = surface_stats(m)
    ents = link_entities_from_stats(stats)
    # the LSH self-join feeds two consumers (accepted + may) — checkpoint
    # it once, mirroring the pipeline path's fuzzy_pairs stage snapshot
    scored = fuzzy_scored_pairs(ents).localCheckpoint(eager=True)
    edges = alias_edges_from_stats(stats).unionByName(
        alias_edges_from_scored(scored)
    )
    labels, _ = connected_components(edges)
    amap = canonical_map(labels, ents.select("norm_key"))
    link = alias_of_edges(amap).unionByName(
        may_refer_edges(m, ents, amap, may_pairs_from_scored(scored))
    )
    return link.groupBy("rel_type").agg(F.count(F.lit(1)).alias("n"))


def q_node_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = _transcripts(spark, sf_dir)
    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    stats = surface_stats(m)
    ents = link_entities_from_stats(stats)
    amap = _alias_map_cached(spark, sf_dir)
    nodes = build_nodes(tr, m, ents, amap)
    return nodes.groupBy("node_type").agg(F.count(F.lit(1)).alias("n"))


def q_node_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-property audit (§1.2 'analysis results as attributes'):
    ENTITY-family nodes carry n_mentions/n_surfaces, TURN nodes carry
    n_chars — summed per node_type so the value hash certifies the
    attribute values themselves."""
    tr = _transcripts(spark, sf_dir)
    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    stats = surface_stats(m)
    ents = link_entities_from_stats(stats)
    amap = _alias_map_cached(spark, sf_dir)
    nodes = build_nodes(tr, m, ents, amap)
    v = F.coalesce(
        F.col("props")["n_mentions"], F.col("props")["n_chars"]
    ).cast("long")
    return (
        nodes.filter(F.col("node_type").isin(
            "TURN", "CUSTOMER", "NATION", "ORDER", "PART", "SUPPLIER"
        ))
        .groupBy("node_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(v).alias("sum_v"))
    )


def q_edge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = _transcripts(spark, sf_dir)
    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    amap = _alias_map_cached(spark, sf_dir)
    tcanon = canonicalize_triples(triples_of(ex), amap)
    edges = build_edges(tr, m, tcanon, amap).unionByName(flow_edges(tr))
    return edges.groupBy("rel_graph", "rel_type").agg(F.count(F.lit(1)).alias("n"))


def q_edge_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-property audit (reference: property-bearing relationships,
    SURVEY.md §1.3): FLOW edges carry gap_s (seconds between endpoint
    turns), SEMANTIC edges carry first-asserting provenance
    (prov_conv, prov_turn), REFERS_TO edges carry the use/def role
    (declares | references — the G2/PDG access-classification analog,
    PDGProcessing.java:299-321). Aggregated per rel_type so the value
    hash certifies every edge's props, not just their presence; for
    REFERS_TO, sum_v = number of declaring mentions."""
    tr = _transcripts(spark, sf_dir)
    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    amap = _alias_map_cached(spark, sf_dir)
    tcanon = canonicalize_triples(triples_of(ex), amap)
    edges = build_edges(tr, m, tcanon, amap).unionByName(flow_edges(tr))
    v = F.when(
        F.col("rel_type") == "REFERS_TO",
        (F.col("props")["role"] == "declares").cast("long"),
    ).otherwise(
        F.coalesce(F.col("props")["gap_s"], F.col("props")["prov_turn"]).cast(
            "long"
        )
    )
    return (
        edges.filter(
            F.col("rel_graph").isin("FLOW", "SEMANTIC")
            | (F.col("rel_type") == "REFERS_TO")
        )
        .groupBy("rel_graph", "rel_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(v).alias("sum_v"))
    )


def q_tool_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOOL_RESULT_OF provenance audit: per tool name (carried as an edge
    prop — the exception-provenance analog, CFG_MAY_THROW edges carry
    exceptionType/methodName, ASTAuxiliarStorage.java:106-131), the edge
    count and total gap seconds. Certifies the prop VALUES, not just
    their presence."""
    tr = _transcripts(spark, sf_dir)
    e = flow_edges(tr).filter(F.col("rel_type") == "TOOL_RESULT_OF")
    return e.groupBy(F.col("props")["tool"].alias("tool")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("props")["gap_s"].cast("long")).alias("sum_gap_s"),
    )


def q_node_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypernym-category audit (§1.1): explode every node's ``categories``
    array and count per (node_type, category) — value-certifies the
    multi-label hypernym attachment itself (reference:
    DatabaseFacade.addMultiLabelHypernyms, DatabaseFacade.java:44-47;
    NodeTypes enum hypernym accumulation, NodeTypes.java:81-97)."""
    tr = _transcripts(spark, sf_dir)
    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    ents = link_entities_from_stats(surface_stats(m))
    amap = _alias_map_cached(spark, sf_dir)
    nodes = build_nodes(tr, m, ents, amap)
    return (
        nodes.select("node_type", F.explode("categories").alias("category"))
        .groupBy("node_type", "category")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_next_turn(spark: SparkSession, sf_dir: str) -> DataFrame:
    tr = _transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        tr.select(
            "conv_id",
            "turn_idx",
            "role",
            F.lead("turn_idx").over(w).alias("next_turn_idx"),
            F.lead("role").over(w).alias("next_role"),
        )
        .filter(F.col("next_turn_idx").isNotNull())
        .select("conv_id", "turn_idx", "next_turn_idx", "role", "next_role")
    )


def q_modality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return consensus_modality(q_triples_canonical(spark, sf_dir))


def q_must_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4 analog: iterative summary-propagation fixpoint — transitive
    closure over 'must'-modality entity edges (semi-naive, per-round
    checkpointing; InterproceduralPDG.java:18-187)."""
    return must_reach_fixpoint(q_modality(spark, sf_dir))


def q_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3/G5 analog: BFS entity reachability from nation roots."""
    return entity_reachability(q_triples_canonical(spark, sf_dir))


def q_mention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = mentions_of(_extraction(spark, sf_dir))
    amap = _alias_map_cached(spark, sf_dir)
    return salted_mention_counts(m, amap)


def _property_graph(spark: SparkSession, sf_dir: str):
    """Full property graph (all node families; structure + link + semantic
    + flow edges) wrapped in the ProgQuery-analog query surface."""
    from .graph.query import PropertyGraph

    tr = _transcripts(spark, sf_dir)
    ex = _extraction(spark, sf_dir)
    m = mentions_of(ex)
    stats = surface_stats(m)
    ents = link_entities_from_stats(stats)
    amap = _alias_map_cached(spark, sf_dir)
    tcanon = canonicalize_triples(triples_of(ex), amap)
    nodes = build_nodes(tr, m, ents, amap)
    edges = build_edges(tr, m, tcanon, amap).unionByName(flow_edges(tr))
    return PropertyGraph(nodes, edges)


def q_gq_tool_callers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-query surface (reference parity: downstream Cypher over the
    built graph — the exception-provenance query shape, 'which methods are
    reached by CFG_MAY_THROW edges of type X', ASTAuxiliarStorage.java:
    106-131): per (tool, caller_role), how many tool results flowed back —
    match TURN(name='tool') -[TOOL_RESULT_OF {tool}]-> TURN, grouped by
    the edge's tool prop and the destination turn's role."""
    g = _property_graph(spark, sf_dir)
    # rel_graph is a LITERAL per edge family, so passing it lets constant
    # folding prune every other family's subtree from the plan — rel_type
    # alone cannot prune SEMANTIC edges (their rel_type is the data-borne
    # pred column)
    hop = g.match("TURN", name="tool").out(
        "TOOL_RESULT_OF", rel_graph="FLOW", into="TURN", edge_props=("tool",)
    )
    return (
        hop.df()
        .groupBy(
            F.col("edge_tool").alias("tool"),
            F.col("name").alias("caller_role"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_gq_entity_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-query surface: entities referenced from 2+ conversations —
    match MENTION -[REFERS_TO]-> entity, carrying the mention's conv_id
    through the hop, then count distinct conversations per canonical
    entity (the 'definition used across compilation units' query shape,
    DefinitionCache.java:20-31)."""
    g = _property_graph(spark, sf_dir)
    hop = g.match("MENTION").out(
        "REFERS_TO", rel_graph="LINK", carry=("conv_id",)
    )
    return (
        hop.df()
        .groupBy("canonical_key")
        .agg(F.countDistinct("src_conv_id").alias("n_convs"))
        .filter(F.col("n_convs") >= 2)
    )


def q_gq_assistant_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-query surface, two STRUCTURE hops with a node-prop filter:
    match CONVERSATION -[HAS_TURN]-> TURN {role: assistant}
    -[HAS_MENTION]-> MENTION, counted per conversation — mentions that
    assistant turns contributed (the scoped-containment query shape,
    'program -> class -> member' traversals over HAS_* structure edges)."""
    g = _property_graph(spark, sf_dir)
    hop = (
        g.match("CONVERSATION")
        .out("HAS_TURN", rel_graph="STRUCTURE", into="TURN")
        .where(F.col("props")["role"] == "assistant")
        .out("HAS_MENTION", rel_graph="STRUCTURE", into="MENTION")
    )
    return hop.df().groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_mentions"))


def q_gq_customer_orbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-query surface, variable-length traversal: everything within
    1..2 SEMANTIC hops of any customer entity — match CUSTOMER
    -[*1..2 {rel_graph: SEMANTIC}]-> node, counted per (hops, destination
    node type). Cypher's ``-[:R*1..k]->`` with min-distance semantics (the
    transitive-walk query shape: subtype-DAG propagation,
    HierarchyAnalysis.java:28-113). One count unit = one distinct
    (customer root, destination node) pair at its BFS distance; hop 1
    reaches nations/orders/literal props, hop 2 reaches parts + order
    literals."""
    g = _property_graph(spark, sf_dir)
    orbit = g.match("CUSTOMER").out_star(rel_graph="SEMANTIC", max_hops=2)
    return (
        orbit.df()
        .groupBy("hops", F.col("node_type").alias("dst_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_gq_supplier_upstream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-query surface, variable-length traversal AGAINST edge
    direction: everything within 1..3 reverse SEMANTIC hops of any
    supplier entity — match SUPPLIER <-[*1..3 {rel_graph: SEMANTIC}]-
    node, counted per (hops, source node type). Cypher's ``<-[:R*1..k]-``
    (the reference's reverse-traversal query shape: 'which callers reach
    this definition', the backward walk over CALLS/REFERS_TO edges that
    DefinitionCache consumers issue). The semantic graph is layered
    (customer -placed-> order -includes-> part -supplied_by-> supplier),
    so the reverse frontier is PART at hop 1, ORDER at hop 2, CUSTOMER at
    hop 3 — three BFS rounds, one deeper than the forward orbit gate, and
    the frontier drains exactly at the bound (no truncation warning).
    One count unit = one distinct (supplier root, upstream node) pair at
    its min BFS distance."""
    g = _property_graph(spark, sf_dir)
    up = g.match("SUPPLIER").in_star(rel_graph="SEMANTIC", max_hops=3)
    return (
        up.df()
        .groupBy("hops", F.col("node_type").alias("src_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_gq_part_early_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-query surface, relationship predicate: parts appearing in
    the first two line slots of any order — match ORDER
    -[includes WHERE ordinal <= 2]-> PART, counted per part. Cypher's
    ``-[r:R WHERE r.p]->`` (the reference's property-qualified edge
    matches: CFG_MAY_THROW filtered by exceptionType, switch dispatch by
    caseIndex — ASTAuxiliarStorage.java:120-125, CFGVisitor.java:544-556).
    The predicate is an arbitrary Column over the edge frame applied
    BEFORE the hop joins, so it reaches the SEMANTIC family's C3-dedup
    aggregate instead of filtering post-join; one count unit = one
    materialized edge, i.e. one distinct (order, part, 'includes',
    ordinal <= 2) tuple."""
    g = _property_graph(spark, sf_dir)
    hop = g.match("ORDER").out(
        "includes",
        rel_graph="SEMANTIC",
        into="PART",
        edge_where=F.col("ordinal") <= 2,
    )
    return (
        hop.df()
        .groupBy(F.col("canonical_key").alias("part_key"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_gq_turn_tool_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-query surface, OPTIONAL MATCH: per turn role, how many turns
    exist and how many of them produced a tool result — match TURN,
    OPTIONAL MATCH (turn)-[TOOL_RESULT_OF]->(prev), group by the START
    turn's role. Unmatched turns (every non-tool turn, plus a tool turn
    opening its conversation) survive as one null-destination row, so
    ``count(*)`` counts turns while ``count(node_id)`` counts matches —
    the left-join query shape the reference's consumers use for coverage
    audits ('which methods have NO incoming call edge'). The carried
    start-role column rides the left join untouched."""
    g = _property_graph(spark, sf_dir)
    hop = g.match("TURN").out(
        "TOOL_RESULT_OF", rel_graph="FLOW", into="TURN", carry=("name",),
        optional=True,
    )
    return (
        hop.df()
        .groupBy(F.col("src_name").alias("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.count("node_id").alias("n_tool_results"),
        )
    )


def kg_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_transcripts": q_transcripts,
        "kg_mentions": q_mentions,
        "kg_triples_raw": q_triples_raw,
        "kg_entities": q_entities,
        "kg_alias_map": q_alias_map,
        "kg_triples_canonical": q_triples_canonical,
        "kg_fuzzy_pairs": q_fuzzy_pairs,
        "kg_triples_canonical_fuzzy": q_triples_canonical_fuzzy,
        "kg_link_edges": q_link_edges,
        "kg_node_counts": q_node_counts,
        "kg_node_props": q_node_props,
        "kg_node_categories": q_node_categories,
        "kg_edge_counts": q_edge_counts,
        "kg_edge_props": q_edge_props,
        "kg_next_turn": q_next_turn,
        "kg_tool_provenance": q_tool_provenance,
        "kg_modality": q_modality,
        "kg_must_reach": q_must_reach,
        "kg_reachability": q_reachability,
        "kg_mention_counts": q_mention_counts,
        "kg_gq_tool_callers": q_gq_tool_callers,
        "kg_gq_entity_reach": q_gq_entity_reach,
        "kg_gq_assistant_mentions": q_gq_assistant_mentions,
        "kg_gq_customer_orbit": q_gq_customer_orbit,
        "kg_gq_supplier_upstream": q_gq_supplier_upstream,
        "kg_gq_part_early_slots": q_gq_part_early_slots,
        "kg_gq_turn_tool_coverage": q_gq_turn_tool_coverage,
    }


def kg_oracles() -> dict[str, str]:
    from . import oracle as O

    return {
        "kg_transcripts": O.transcripts_sql(),
        "kg_mentions": O.mentions_sql(),
        "kg_triples_raw": O.triples_raw_sql(),
        "kg_entities": O.entities_sql(),
        "kg_alias_map": O.alias_map_sql(),
        "kg_triples_canonical": O.triples_canonical_sql(),
        "kg_fuzzy_pairs": O.fuzzy_pairs_sql(),
        "kg_triples_canonical_fuzzy": O.triples_canonical_fuzzy_sql(),
        "kg_link_edges": O.link_edges_sql(),
        "kg_node_counts": O.node_counts_sql(),
        "kg_node_props": O.node_props_sql(),
        "kg_node_categories": O.node_categories_sql(),
        "kg_edge_counts": O.edge_counts_sql(),
        "kg_edge_props": O.edge_props_sql(),
        "kg_next_turn": O.next_turn_sql(),
        "kg_tool_provenance": O.tool_provenance_sql(),
        "kg_modality": O.modality_sql(),
        "kg_must_reach": O.must_reach_sql(),
        "kg_reachability": O.reachability_sql(),
        "kg_mention_counts": O.mention_counts_sql(),
        "kg_gq_tool_callers": O.gq_tool_callers_sql(),
        "kg_gq_entity_reach": O.gq_entity_reach_sql(),
        "kg_gq_assistant_mentions": O.gq_assistant_mentions_sql(),
        "kg_gq_customer_orbit": O.gq_customer_orbit_sql(),
        "kg_gq_supplier_upstream": O.gq_supplier_upstream_sql(),
        "kg_gq_part_early_slots": O.gq_part_early_slots_sql(),
        "kg_gq_turn_tool_coverage": O.gq_turn_tool_coverage_sql(),
    }
