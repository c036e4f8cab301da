"""DuckDB oracle SQL for the driver's correctness gate.

Each function returns ANSI SQL runnable by DuckDB over the pre-registered
parquet views. The oracles derive expected pipeline outputs **directly from
the structured base tables** (span offsets by template-segment arithmetic,
casing by the same deterministic CASE rules) — the Spark pipeline must
recover identical values from the rendered transcript text. That makes the
driver's value-hash comparison a true end-to-end extraction/linking/
canonicalization parity check, the P/R>=0.95 discipline of BASELINE.json
with P=R=1.0 as the actual bar.

All column names and types are aligned with the Spark side (INT spans,
BIGINT counts, BOOLEAN flags); SUMs are cast to BIGINT because DuckDB
widens integer SUM to HUGEINT.
"""

from __future__ import annotations

from .datagen import LINEITEM_RN, cust_cased, duckdb_transcripts_cte, supp_cased
from .extraction import rules as R
from .linking import fuzzy as FZ

_L = {
    "i0": len(R.INTRO_P0),
    "i1": len(R.INTRO_P1),
    "i2": len(R.INTRO_P2),
    "i3": len(R.INTRO_P3),
    "t0": len(R.ITEM_P0),
    "t1": len(R.ITEM_P1),
    "t2": len(R.ITEM_P2),
    "t3": len(R.ITEM_P3),
    "f0": len(R.FINAL_P0),
    "f1": len(R.FINAL_P1),
    "f2": len(R.FINAL_P2),
}

# --- shared CTEs ------------------------------------------------------------

_BASE_CTES = f"""
lrn AS ({LINEITEM_RN}),
intro AS (
  SELECT 'conv-' || CAST(o.o_orderkey AS VARCHAR) AS conv_id,
         CAST(0 AS INT) AS turn_idx,
         {cust_cased('o', 'c')} AS cust,
         n.n_name AS nation,
         CAST(o.o_orderkey AS VARCHAR) AS okey,
         o.o_orderpriority AS prio
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n   ON n.n_nationkey = c.c_nationkey),
item AS (
  SELECT 'conv-' || CAST(l.l_orderkey AS VARCHAR) AS conv_id,
         l.rn AS turn_idx,
         CAST(l.rn AS VARCHAR) AS ln,
         CAST(CAST(floor(l.l_quantity) AS BIGINT) AS VARCHAR) AS qty,
         p.p_name AS part,
         {supp_cased('l', 's')} AS supp,
         CAST(l.l_orderkey AS VARCHAR) AS okey
  FROM lrn l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey),
fin AS (
  SELECT 'conv-' || CAST(o.o_orderkey AS VARCHAR) AS conv_id,
         CAST(m.cnt + 1 AS INT) AS turn_idx,
         CAST(o.o_orderkey AS VARCHAR) AS okey,
         CAST(CAST(floor(o.o_totalprice) AS BIGINT) AS VARCHAR) AS total,
         o.o_orderstatus AS status
  FROM orders o
  JOIN (SELECT l_orderkey, CAST(COUNT(*) AS INT) AS cnt
        FROM lineitem GROUP BY l_orderkey) m
    ON m.l_orderkey = o.o_orderkey)
"""

_MENTIONS_CTE = f"""
mentions AS (
  SELECT conv_id, turn_idx, 'customer' AS mention_type, cust AS surface,
         'customer:' || lower(cust) AS norm_key,
         CAST({_L['i0']} AS INT) AS span_start,
         CAST({_L['i0']} + length(cust) AS INT) AS span_end,
         TRUE AS is_decl
  FROM intro
  UNION ALL
  SELECT conv_id, turn_idx, 'nation', nation,
         'nation:' || lower(nation),
         CAST({_L['i0']} + length(cust) + {_L['i1']} AS INT),
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) AS INT),
         FALSE
  FROM intro
  UNION ALL
  SELECT conv_id, turn_idx, 'order', okey,
         'order:' || okey,
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} AS INT),
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} + length(okey) AS INT),
         TRUE
  FROM intro
  UNION ALL
  SELECT conv_id, turn_idx, 'literal', prio,
         'lit:' || prio,
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} + length(okey) + {_L['i3']} AS INT),
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} + length(okey) + {_L['i3']} + length(prio) AS INT),
         FALSE
  FROM intro
  UNION ALL
  SELECT conv_id, turn_idx, 'part', part,
         'part:' || lower(part),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} AS INT),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} + length(part) AS INT),
         FALSE
  FROM item
  UNION ALL
  SELECT conv_id, turn_idx, 'supplier', supp,
         'supplier:' || lower(supp),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} + length(part) + {_L['t3']} AS INT),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} + length(part) + {_L['t3']} + length(supp) AS INT),
         FALSE
  FROM item
  UNION ALL
  SELECT conv_id, turn_idx, 'order', okey,
         'order:' || okey,
         CAST({_L['f0']} AS INT),
         CAST({_L['f0']} + length(okey) AS INT),
         TRUE
  FROM fin
  UNION ALL
  SELECT conv_id, turn_idx, 'literal', total,
         'lit:' || total,
         CAST({_L['f0']} + length(okey) + {_L['f1']} AS INT),
         CAST({_L['f0']} + length(okey) + {_L['f1']} + length(total) AS INT),
         FALSE
  FROM fin
  UNION ALL
  SELECT conv_id, turn_idx, 'literal', status,
         'lit:' || status,
         CAST({_L['f0']} + length(okey) + {_L['f1']} + length(total) + {_L['f2']} AS INT),
         CAST({_L['f0']} + length(okey) + {_L['f1']} + length(total) + {_L['f2']} + 1 AS INT),
         FALSE
  FROM fin
)
"""

_TRIPLES_CTE = f"""
triples_raw AS (
  SELECT conv_id, turn_idx,
         'customer:' || cust AS subj, 'from_nation' AS pred,
         'nation:' || nation AS obj,
         CAST(NULL AS INT) AS ordinal,
         CAST({_L['i0']} + length(cust) + {_L['i1']} AS INT) AS span_start,
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) AS INT) AS span_end
  FROM intro
  UNION ALL
  SELECT conv_id, turn_idx,
         'customer:' || cust, 'placed', 'order:' || okey, CAST(NULL AS INT),
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} AS INT),
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} + length(okey) AS INT)
  FROM intro
  UNION ALL
  SELECT conv_id, turn_idx,
         'order:' || okey, 'has_priority', prio, CAST(NULL AS INT),
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} + length(okey) + {_L['i3']} AS INT),
         CAST({_L['i0']} + length(cust) + {_L['i1']} + length(nation) + {_L['i2']} + length(okey) + {_L['i3']} + length(prio) AS INT)
  FROM intro
  UNION ALL
  SELECT conv_id, turn_idx,
         'order:' || okey, 'includes', 'part:' || part, CAST(ln AS INT),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} AS INT),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} + length(part) AS INT)
  FROM item
  UNION ALL
  SELECT conv_id, turn_idx,
         'part:' || part, 'supplied_by', 'supplier:' || supp, CAST(NULL AS INT),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} + length(part) + {_L['t3']} AS INT),
         CAST({_L['t0']} + length(ln) + {_L['t1']} + length(qty) + {_L['t2']} + length(part) + {_L['t3']} + length(supp) AS INT)
  FROM item
  UNION ALL
  SELECT conv_id, turn_idx,
         'order:' || okey, 'has_total', total, CAST(NULL AS INT),
         CAST({_L['f0']} + length(okey) + {_L['f1']} AS INT),
         CAST({_L['f0']} + length(okey) + {_L['f1']} + length(total) AS INT)
  FROM fin
  UNION ALL
  SELECT conv_id, turn_idx,
         'order:' || okey, 'has_status', status, CAST(NULL AS INT),
         CAST({_L['f0']} + length(okey) + {_L['f1']} + length(total) + {_L['f2']} AS INT),
         CAST({_L['f0']} + length(okey) + {_L['f1']} + length(total) + {_L['f2']} + 1 AS INT)
  FROM fin
)
"""

_ENTITY_PREDS = "('from_nation','placed','includes','supplied_by')"

_TRIPLES_CANON_CTE = f"""
triples_canon AS (
  SELECT conv_id, turn_idx, lower(subj) AS subj, pred,
         CASE WHEN pred IN {_ENTITY_PREDS} THEN lower(obj) ELSE obj END AS obj,
         ordinal, span_start, span_end
  FROM triples_raw
)
"""


def _poly_hash_sql(col: str) -> str:
    """Rolling polynomial char hash mod 2^31-1 — mirrors fuzzy.poly_hash."""
    return f"""list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(range(1, length({col}) + 1),
                       i -> CAST(ascii(substr({col}, CAST(i AS INT), 1)) AS BIGINT))),
      (acc, c) -> (acc * 131 + c) % {FZ._M})"""


def _fuzzy_ctes() -> str:
    """Step-for-step DuckDB replica of linking.fuzzy (shingle -> poly-hash
    minhash -> 2-row band keys -> capped bucket self-join -> structure-aware
    Levenshtein verify). Chains onto the ``mentions`` CTE; exposes
    ``fuzzy_pairs(src, dst)`` with src < dst. Constants are imported from
    linking.fuzzy so the two engines can never drift."""
    M = FZ._M
    perms = ", ".join(
        f"({i}, {FZ._A[i]}, {FZ._B[i]})" for i in range(FZ.NUM_PERM)
    )
    return f"""
fents AS (
  SELECT norm_key AS key, mention_type AS mtype, lower(MIN(surface)) AS nm
  FROM mentions WHERE mention_type <> 'literal'
  GROUP BY norm_key, mention_type
  HAVING NOT MAX(is_decl)),
fsh AS (
  SELECT key, mtype, nm,
         list_distinct(list_transform(
           range(1, greatest(length(nm), 1) + 1),
           i -> substr('^' || nm || '$', CAST(i AS INT), {FZ.K_SHINGLE}))) AS sh
  FROM fents),
fshh AS (
  SELECT key, {_poly_hash_sql('s')} AS h
  FROM (SELECT key, unnest(sh) AS s FROM fsh)),
fperms(i, a, b) AS (VALUES {perms}),
fsig AS (
  SELECT key, p.i, MIN((p.a * h.h + p.b) % {M}) AS v
  FROM fshh h CROSS JOIN fperms p GROUP BY key, p.i),
fbands AS (
  SELECT key, i // 2 AS band_idx,
         MAX(CASE WHEN i % 2 = 0 THEN v END) * {M}
           + MAX(CASE WHEN i % 2 = 1 THEN v END) AS band_hash
  FROM fsig GROUP BY key, i // 2),
fcap AS (
  SELECT b.key, e.mtype, e.nm, b.band_idx, b.band_hash,
         COUNT(*) OVER (PARTITION BY e.mtype, b.band_idx, b.band_hash) AS bucket_n
  FROM fbands b JOIN fents e ON e.key = b.key),
fcand AS (
  SELECT DISTINCT a.key AS key_a, b.key AS key_b, a.nm AS nm_a, b.nm AS nm_b
  FROM fcap a JOIN fcap b
    ON a.mtype = b.mtype AND a.band_idx = b.band_idx
   AND a.band_hash = b.band_hash AND a.key < b.key
  WHERE a.bucket_n <= {FZ.BUCKET_CAP} AND b.bucket_n <= {FZ.BUCKET_CAP}),
fscored AS (
  SELECT key_a, key_b,
         regexp_replace(nm_a, '[^0-9]', '', 'g') AS dig_a,
         regexp_replace(nm_b, '[^0-9]', '', 'g') AS dig_b,
         CASE WHEN regexp_replace(nm_a, '[^0-9]', '', 'g') = '' THEN nm_a
              ELSE regexp_replace(nm_a, '[^a-z]', '', 'g') END AS head_a,
         CASE WHEN regexp_replace(nm_b, '[^0-9]', '', 'g') = '' THEN nm_b
              ELSE regexp_replace(nm_b, '[^a-z]', '', 'g') END AS head_b
  FROM fcand),
fuzzy_pairs AS (
  SELECT key_a AS src, key_b AS dst
  FROM fscored
  WHERE dig_a = dig_b
    AND 1.0 - levenshtein(head_a, head_b)
          / greatest(length(head_a), length(head_b), 1) >= {FZ.THRESHOLD})
"""


# Connected components over the fuzzy pair graph (closure from every key,
# canonical = min reachable) — components are tiny (near-star alias
# clusters), so full transitive closure is the honest recursive-SQL form
# of the Spark side's min-label-propagation CC.
_FUZZY_CC_CTES = """
fund AS (
  SELECT src AS a, dst AS b FROM fuzzy_pairs
  UNION
  SELECT dst, src FROM fuzzy_pairs),
freach AS (
  SELECT a AS key, a AS r FROM (SELECT DISTINCT a FROM fund)
  UNION
  SELECT fr.key, u.b FROM freach fr JOIN fund u ON u.a = fr.r),
fcmap AS (SELECT key AS norm_key, MIN(r) AS canonical_key FROM freach GROUP BY key)
"""


def fuzzy_pairs_sql() -> str:
    return (
        "WITH "
        + ",\n".join(
            c.strip().strip(",") for c in (_BASE_CTES, _MENTIONS_CTE, _fuzzy_ctes())
        )
        + "\nSELECT src, dst FROM fuzzy_pairs"
    )


def triples_canonical_fuzzy_sql() -> str:
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            c.strip().strip(",")
            for c in (
                _BASE_CTES,
                _MENTIONS_CTE,
                _TRIPLES_CTE,
                _TRIPLES_CANON_CTE,
                _fuzzy_ctes(),
                _FUZZY_CC_CTES,
            )
        )
        + f"""
SELECT t.conv_id, t.turn_idx,
       COALESCE(ms.canonical_key, t.subj) AS subj,
       t.pred,
       CASE WHEN t.pred IN {_ENTITY_PREDS}
            THEN COALESCE(mo.canonical_key, t.obj) ELSE t.obj END AS obj,
       t.ordinal, t.span_start, t.span_end
FROM triples_canon t
LEFT JOIN fcmap ms ON ms.norm_key = t.subj
LEFT JOIN fcmap mo ON mo.norm_key = t.obj AND t.pred IN {_ENTITY_PREDS}
"""
    )


def link_edges_sql() -> str:
    """ALIAS_OF + MAY_REFER_TO counts, replicating materialize.alias_of_edges
    and materialize.may_refer_edges (fan-out + trustable pruning +
    self-target drop) over the fuzzy layer."""
    sim = (
        "1.0 - levenshtein(head_a, head_b)"
        " / greatest(length(head_a), length(head_b), 1)"
    )
    extra = f"""
may_pairs AS (
  SELECT key_a, key_b FROM fscored
  WHERE dig_a = dig_b AND {sim} >= {FZ.MAY_FLOOR} AND {sim} < {FZ.THRESHOLD}),
decl AS (
  SELECT norm_key, MAX(is_decl) AS is_declared
  FROM mentions WHERE mention_type <> 'literal' GROUP BY norm_key),
mayt AS (
  SELECT DISTINCT src_key, tgt FROM (
    SELECT key_a AS src_key, COALESCE(c.canonical_key, key_b) AS tgt
    FROM may_pairs LEFT JOIN fcmap c ON c.norm_key = key_b
    UNION
    SELECT key_b, COALESCE(c.canonical_key, key_a)
    FROM may_pairs LEFT JOIN fcmap c ON c.norm_key = key_a)),
maye AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, m.span_start, m.mention_type, t.tgt
  FROM mentions m
  JOIN mayt t ON t.src_key = m.norm_key
  JOIN decl d ON d.norm_key = m.norm_key
  LEFT JOIN fcmap c2 ON c2.norm_key = m.norm_key
  WHERE m.mention_type <> 'literal' AND NOT d.is_declared
    AND t.tgt <> COALESCE(c2.canonical_key, m.norm_key))
"""
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            c.strip().strip(",")
            for c in (
                _BASE_CTES,
                _MENTIONS_CTE,
                _fuzzy_ctes(),
                _FUZZY_CC_CTES,
                extra,
            )
        )
        + """
SELECT 'ALIAS_OF' AS rel_type, COUNT(*) AS n FROM fcmap WHERE norm_key <> canonical_key
UNION ALL
SELECT 'MAY_REFER_TO', COUNT(*) FROM maye
"""
    )


def _with(*ctes: str, select: str) -> str:
    return "WITH " + ",\n".join(c.strip().strip(",") for c in ctes) + "\n" + select


def transcripts_sql() -> str:
    return (
        duckdb_transcripts_cte()
        + " SELECT conv_id, turn_idx, role, text, tool, ts_epoch FROM transcripts"
    )


def mentions_sql() -> str:
    return _with(
        _BASE_CTES,
        _MENTIONS_CTE,
        select="SELECT conv_id, turn_idx, mention_type, surface, norm_key, "
        "span_start, span_end, is_decl FROM mentions",
    )


def triples_raw_sql() -> str:
    return _with(
        _BASE_CTES,
        _TRIPLES_CTE,
        select="SELECT conv_id, turn_idx, subj, pred, obj, ordinal, "
        "span_start, span_end FROM triples_raw",
    )


def triples_canonical_sql() -> str:
    return _with(
        _BASE_CTES,
        _TRIPLES_CTE,
        _TRIPLES_CANON_CTE,
        select="SELECT conv_id, turn_idx, subj, pred, obj, ordinal, "
        "span_start, span_end FROM triples_canon",
    )


def entities_sql() -> str:
    return _with(
        _BASE_CTES,
        _MENTIONS_CTE,
        select="""
        SELECT norm_key, mention_type, MIN(surface) AS name,
               MAX(is_decl) AS is_declared,
               COUNT(*) AS n_mentions,
               COUNT(DISTINCT surface) AS n_surfaces
        FROM mentions
        WHERE mention_type <> 'literal'
        GROUP BY norm_key, mention_type
        """,
    )


def alias_map_sql() -> str:
    # exact-alias input => CC must produce the identity map (C2 invariant)
    return _with(
        _BASE_CTES,
        _MENTIONS_CTE,
        select="""
        SELECT DISTINCT norm_key, norm_key AS canonical_key
        FROM mentions WHERE mention_type <> 'literal'
        """,
    )


def node_counts_sql() -> str:
    return _with(
        _BASE_CTES,
        _MENTIONS_CTE,
        select="""
        SELECT 'CONVERSATION' AS node_type, COUNT(*) AS n FROM (SELECT DISTINCT conv_id FROM mentions)
        UNION ALL
        SELECT 'TURN', COUNT(*) FROM (SELECT DISTINCT conv_id, turn_idx FROM mentions)
        UNION ALL
        SELECT 'MENTION', COUNT(*) FROM mentions
        UNION ALL
        SELECT upper(mention_type), COUNT(DISTINCT norm_key) FROM mentions
        WHERE mention_type <> 'literal' GROUP BY upper(mention_type)
        UNION ALL
        SELECT 'LITERAL', COUNT(DISTINCT norm_key) FROM mentions WHERE mention_type = 'literal'
        """,
    )


def node_props_sql() -> str:
    """ENTITY nodes: n = distinct keys per type, sum_v = total mentions
    (exact alias map is the identity, so per-canonical == per-norm-key);
    TURN nodes: sum_v = total chars."""
    tcte = duckdb_transcripts_cte().replace("WITH ", "")
    return _with(
        tcte,
        _BASE_CTES,
        _MENTIONS_CTE,
        select="""
        SELECT upper(mention_type) AS node_type,
               COUNT(DISTINCT norm_key) AS n,
               CAST(COUNT(*) AS BIGINT) AS sum_v
        FROM mentions WHERE mention_type <> 'literal'
        GROUP BY upper(mention_type)
        UNION ALL
        SELECT 'TURN', COUNT(*), CAST(SUM(length(text)) AS BIGINT)
        FROM transcripts
        """,
    )


def node_categories_sql() -> str:
    """Hypernym-category audit: per-(node_type, category) counts = the
    node-type counts fanned out across the literal category map
    (schemas.NODE_CATEGORIES — the closed vocabulary both engines embed),
    exactly the semantics of exploding each node's ``categories`` array."""
    from .schemas import NODE_CATEGORIES

    cat_values = ", ".join(
        f"('{t}', '{c}')" for t, cs in NODE_CATEGORIES.items() for c in cs
    )
    counts = """
    ncounts AS (
      SELECT 'CONVERSATION' AS node_type, COUNT(*) AS n FROM (SELECT DISTINCT conv_id FROM mentions)
      UNION ALL
      SELECT 'TURN', COUNT(*) FROM (SELECT DISTINCT conv_id, turn_idx FROM mentions)
      UNION ALL
      SELECT 'MENTION', COUNT(*) FROM mentions
      UNION ALL
      SELECT upper(mention_type), COUNT(DISTINCT norm_key) FROM mentions
      WHERE mention_type <> 'literal' GROUP BY upper(mention_type)
      UNION ALL
      SELECT 'LITERAL', COUNT(DISTINCT norm_key) FROM mentions WHERE mention_type = 'literal')
    """
    cats = f"cats(node_type, category) AS (VALUES {cat_values})"
    return _with(
        _BASE_CTES,
        _MENTIONS_CTE,
        counts,
        cats,
        select="""
        SELECT nc.node_type, c.category, nc.n
        FROM ncounts nc JOIN cats c ON c.node_type = nc.node_type
        """,
    )


def edge_counts_sql() -> str:
    # semantic edge counts = distinct (subj, obj, ordinal) per pred;
    # structure/link counts from mention cardinalities; flow counts via
    # windows over the transcripts CTE
    tcte = duckdb_transcripts_cte().replace("WITH ", "")
    return _with(
        tcte,
        _BASE_CTES,
        _MENTIONS_CTE,
        _TRIPLES_CTE,
        _TRIPLES_CANON_CTE,
        select="""
        SELECT 'STRUCTURE' AS rel_graph, 'HAS_TURN' AS rel_type, COUNT(*) AS n FROM transcripts
        UNION ALL
        SELECT 'STRUCTURE', 'HAS_MENTION', COUNT(*) FROM mentions
        UNION ALL
        SELECT 'LINK', 'REFERS_TO', COUNT(*) FROM mentions WHERE mention_type <> 'literal'
        UNION ALL
        SELECT 'SEMANTIC', pred, COUNT(*) FROM
          (SELECT DISTINCT subj, obj, ordinal, pred FROM triples_canon) GROUP BY pred
        UNION ALL
        SELECT 'FLOW', 'NEXT_TURN', COUNT(*) FROM
          (SELECT conv_id, turn_idx,
                  LEAD(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nx
           FROM transcripts) WHERE nx IS NOT NULL
        UNION ALL
        SELECT 'FLOW', 'NEXT_TURN_SAME_ROLE', COUNT(*) FROM
          (SELECT conv_id, turn_idx,
                  LEAD(turn_idx) OVER (PARTITION BY conv_id, role ORDER BY turn_idx) AS nx
           FROM transcripts) WHERE nx IS NOT NULL
        UNION ALL
        SELECT 'FLOW', 'REPLIES_TO', COUNT(*) FROM
          (SELECT conv_id, turn_idx, role,
                  MAX(CASE WHEN role='user' THEN turn_idx END)
                    OVER (PARTITION BY conv_id ORDER BY turn_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pu
           FROM transcripts) WHERE role <> 'user' AND pu IS NOT NULL
        UNION ALL
        SELECT 'FLOW', 'TOOL_RESULT_OF', COUNT(*) FROM
          (SELECT conv_id, turn_idx, role,
                  LAG(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS pv
           FROM transcripts) WHERE role = 'tool' AND pv IS NOT NULL
        """,
    )


def edge_props_sql() -> str:
    """FLOW gap_s sums from ts_epoch windows; SEMANTIC provenance = the
    (conv_id, turn_idx)-lexicographic first asserting turn per deduped
    edge (turn order == ts order in this corpus, so MAX over the
    preceding-user window matches Spark's last-preceding-user);
    LINK/REFERS_TO role = the mention's declaredness (sum_v = number of
    'declares' mentions — the G2 use/def classification analog)."""
    tcte = duckdb_transcripts_cte().replace("WITH ", "")
    sem = """
    sem_prov AS (
      SELECT pred, conv_id, turn_idx,
             ROW_NUMBER() OVER (PARTITION BY subj, pred, obj, ordinal
                                ORDER BY conv_id, turn_idx) AS rn
      FROM triples_canon)
    """
    return _with(
        tcte,
        _BASE_CTES,
        _MENTIONS_CTE,
        _TRIPLES_CTE,
        _TRIPLES_CANON_CTE,
        sem,
        select="""
        SELECT 'LINK' AS rel_graph, 'REFERS_TO' AS rel_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN is_decl THEN 1 ELSE 0 END) AS BIGINT) AS sum_v
        FROM mentions WHERE mention_type <> 'literal'
        UNION ALL
        SELECT 'FLOW' AS rel_graph, 'NEXT_TURN' AS rel_type,
               COUNT(*) AS n, CAST(SUM(g) AS BIGINT) AS sum_v FROM
          (SELECT LEAD(turn_idx) OVER w AS nx,
                  LEAD(ts_epoch) OVER w - ts_epoch AS g
           FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        WHERE nx IS NOT NULL
        UNION ALL
        SELECT 'FLOW', 'NEXT_TURN_SAME_ROLE', COUNT(*), CAST(SUM(g) AS BIGINT) FROM
          (SELECT LEAD(turn_idx) OVER w AS nx,
                  LEAD(ts_epoch) OVER w - ts_epoch AS g
           FROM transcripts WINDOW w AS (PARTITION BY conv_id, role ORDER BY turn_idx))
        WHERE nx IS NOT NULL
        UNION ALL
        SELECT 'FLOW', 'REPLIES_TO', COUNT(*), CAST(SUM(g) AS BIGINT) FROM
          (SELECT role,
                  MAX(CASE WHEN role='user' THEN turn_idx END) OVER w AS pu,
                  ts_epoch - MAX(CASE WHEN role='user' THEN ts_epoch END) OVER w AS g
           FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        WHERE role <> 'user' AND pu IS NOT NULL
        UNION ALL
        SELECT 'FLOW', 'TOOL_RESULT_OF', COUNT(*), CAST(SUM(g) AS BIGINT) FROM
          (SELECT role,
                  LAG(turn_idx) OVER w AS pv,
                  ts_epoch - LAG(ts_epoch) OVER w AS g
           FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        WHERE role = 'tool' AND pv IS NOT NULL
        UNION ALL
        SELECT 'SEMANTIC', pred, COUNT(*), CAST(SUM(turn_idx) AS BIGINT)
        FROM sem_prov WHERE rn = 1 GROUP BY pred
        """,
    )


_MODALITY_CTES = """
per_conv AS (SELECT DISTINCT conv_id, subj, pred, obj FROM triples_canon),
subj_convs AS (SELECT subj, COUNT(*) AS n_conv_subj FROM
                (SELECT DISTINCT conv_id, subj FROM per_conv) GROUP BY subj),
asserting AS (SELECT subj, pred, obj, COUNT(*) AS n_conv_asserting
              FROM per_conv GROUP BY subj, pred, obj)
"""


def modality_sql() -> str:
    return _with(
        _BASE_CTES,
        _TRIPLES_CTE,
        _TRIPLES_CANON_CTE,
        _MODALITY_CTES,
        select="""
        SELECT a.subj, a.pred, a.obj, a.n_conv_asserting, s.n_conv_subj,
               CASE WHEN a.n_conv_asserting = s.n_conv_subj THEN 'must' ELSE 'may' END AS modality
        FROM asserting a JOIN subj_convs s ON s.subj = a.subj
        """,
    )


def must_reach_sql() -> str:
    """G4 fixpoint oracle: transitive closure over 'must' entity edges as
    a recursive CTE; MIN(hops) equals the semi-naive BFS discovery level.
    Termination: the must-graph is a DAG by entity-type structure (see
    must_reach_fixpoint)."""
    body = f"""
must_edges AS (
  SELECT DISTINCT a.subj AS src, a.obj AS dst
  FROM asserting a JOIN subj_convs s ON s.subj = a.subj
  WHERE a.n_conv_asserting = s.n_conv_subj AND a.pred IN {_ENTITY_PREDS}),
mreach AS (
  SELECT src, dst, 1 AS hops FROM must_edges
  UNION
  SELECT r.src, e.dst, r.hops + 1
  FROM mreach r JOIN must_edges e ON e.src = r.dst)
"""
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            c.strip().strip(",")
            for c in (
                _BASE_CTES,
                _TRIPLES_CTE,
                _TRIPLES_CANON_CTE,
                _MODALITY_CTES,
                body,
            )
        )
        + "\nSELECT src, dst, CAST(MIN(hops) AS INT) AS hops "
        "FROM mreach GROUP BY src, dst"
    )


def mention_counts_sql() -> str:
    return _with(
        _BASE_CTES,
        _MENTIONS_CTE,
        select="""
        SELECT norm_key AS canonical_key, COUNT(*) AS n_mentions
        FROM mentions WHERE mention_type <> 'literal'
        GROUP BY norm_key
        """,
    )


def tool_provenance_sql() -> str:
    """TOOL_RESULT_OF per-tool audit — mirrors flow_edges' tool prop
    (COALESCE to '' for null tool names) and gap_s seconds."""
    return (
        duckdb_transcripts_cte()
        + """
        SELECT COALESCE(tool, '') AS tool, COUNT(*) AS n,
               CAST(SUM(g) AS BIGINT) AS sum_gap_s FROM
          (SELECT role, tool,
                  LAG(turn_idx) OVER w AS pv,
                  ts_epoch - LAG(ts_epoch) OVER w AS g
           FROM transcripts WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        WHERE role = 'tool' AND pv IS NOT NULL
        GROUP BY COALESCE(tool, '')
        """
    )


def next_turn_sql() -> str:
    return (
        duckdb_transcripts_cte()
        + """
        SELECT conv_id, turn_idx, nx AS next_turn_idx, role, nrole AS next_role FROM
          (SELECT conv_id, turn_idx, role,
                  LEAD(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nx,
                  LEAD(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nrole
           FROM transcripts) t
        WHERE nx IS NOT NULL
        """
    )


def reachability_sql() -> str:
    """BFS reachability oracle (G3/G5 analog) as a recursive CTE.

    min(hops) per (root, node) over all path lengths equals the BFS level
    the Spark pass assigns (level-synchronous + anti-join).

    Termination assumption: the predicate-induced graph is a DAG (nation ->
    customer -> order -> part, depth 3). The CTE's ``hops`` column grows
    monotonically, so a cycle-introducing predicate would make the UNION
    never converge — keep cyclic relations out of ``reach_edges`` (the
    Spark pass is bounded by max_hops and warns on truncation instead)."""
    body = f"""
reach_edges AS (
  SELECT DISTINCT obj AS src, subj AS dst FROM triples_canon WHERE pred = 'from_nation'
  UNION
  SELECT DISTINCT subj, obj FROM triples_canon WHERE pred = 'placed'
  UNION
  SELECT DISTINCT subj, obj FROM triples_canon WHERE pred = 'includes'
),
reach AS (
  SELECT src AS root, src AS node, 0 AS hops
  FROM (SELECT DISTINCT src FROM reach_edges WHERE src LIKE 'nation:%')
  UNION
  SELECT r.root, e.dst, r.hops + 1
  FROM reach r JOIN reach_edges e ON e.src = r.node
)
"""
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            c.strip().strip(",")
            for c in (_BASE_CTES, _TRIPLES_CTE, _TRIPLES_CANON_CTE, body)
        )
        + "\nSELECT root, node, CAST(MIN(hops) AS INT) AS hops "
        "FROM reach GROUP BY root, node"
    )


# --- graph-query surface oracles (round 5: downstream querying analog) ------
# The reference's users query the BUILT graph (Cypher over Neo4j); these
# replicate the registered graph-surface queries (queries.q_gq_*) from the
# base tables, certifying that match -> hop -> filter -> aggregate over the
# materialized node/edge frames equals the direct relational form.


def gq_customer_orbit_sql() -> str:
    """Variable-length traversal oracle (out_star): BFS min-distance from
    customer entities over ALL SEMANTIC edges, bounded at 2 hops, counted
    per (hops, destination node type). Mirrors the materialized edge
    builder's key space: entity objs stay canonical keys, literal objs get
    the ``lit:`` node namespace (materialize.build_edges). Rootless
    customers (no outgoing triples) contribute nothing at hops >= 1, so
    deriving roots from triple subjects equals the Spark side's
    all-CUSTOMER-nodes match. Termination: hops grows monotonically and
    the recursive branch is bounded (hops < 2), so cycles cannot loop."""
    body = f"""
sem_edges AS (
  SELECT DISTINCT subj AS src,
         CASE WHEN pred IN {_ENTITY_PREDS} THEN obj
              ELSE 'lit:' || obj END AS dst
  FROM triples_canon
),
orbit AS (
  SELECT src AS root, src AS node, 0 AS hops
  FROM (SELECT DISTINCT src FROM sem_edges WHERE src LIKE 'customer:%')
  UNION
  SELECT o.root, e.dst, o.hops + 1
  FROM orbit o JOIN sem_edges e ON e.src = o.node
  WHERE o.hops < 2
),
orbit_min AS (
  SELECT root, node, MIN(hops) AS hops FROM orbit GROUP BY root, node
)
"""
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            c.strip().strip(",")
            for c in (_BASE_CTES, _TRIPLES_CTE, _TRIPLES_CANON_CTE, body)
        )
        + "\nSELECT CAST(hops AS INT) AS hops,"
        "\n       CASE WHEN node LIKE 'lit:%' THEN 'LITERAL'"
        "\n            ELSE UPPER(split_part(node, ':', 1)) END AS dst_type,"
        "\n       COUNT(*) AS n"
        "\nFROM orbit_min WHERE hops >= 1 GROUP BY 1, 2"
    )


def gq_supplier_upstream_sql() -> str:
    """Reverse variable-length traversal oracle (in_star): BFS
    min-distance AGAINST edge direction from supplier entities over ALL
    SEMANTIC edges, bounded at 3 hops, counted per (hops, source node
    type). Same key space as the orbit oracle (canonical entity keys;
    literal objs in the ``lit:`` namespace — unreachable here, since the
    reverse walk only ever stands on triple SUBJECTS, but kept in the
    edge set so it mirrors the Spark side's full SEMANTIC family).
    Every supplier node exists only as a supplied_by obj, so deriving
    roots from edge dsts equals the Spark side's all-SUPPLIER-nodes
    match; the layered graph (customer->order->part->supplier) drains
    the reverse frontier exactly at hop 3. Termination: hops grows
    monotonically, recursion bounded at hops < 3."""
    body = f"""
sem_edges AS (
  SELECT DISTINCT subj AS src,
         CASE WHEN pred IN {_ENTITY_PREDS} THEN obj
              ELSE 'lit:' || obj END AS dst
  FROM triples_canon
),
upstream AS (
  SELECT dst AS root, dst AS node, 0 AS hops
  FROM (SELECT DISTINCT dst FROM sem_edges WHERE dst LIKE 'supplier:%')
  UNION
  SELECT u.root, e.src, u.hops + 1
  FROM upstream u JOIN sem_edges e ON e.dst = u.node
  WHERE u.hops < 3
),
upstream_min AS (
  SELECT root, node, MIN(hops) AS hops FROM upstream GROUP BY root, node
)
"""
    return (
        "WITH RECURSIVE "
        + ",\n".join(
            c.strip().strip(",")
            for c in (_BASE_CTES, _TRIPLES_CTE, _TRIPLES_CANON_CTE, body)
        )
        + "\nSELECT CAST(hops AS INT) AS hops,"
        "\n       CASE WHEN node LIKE 'lit:%' THEN 'LITERAL'"
        "\n            ELSE UPPER(split_part(node, ':', 1)) END AS src_type,"
        "\n       COUNT(*) AS n"
        "\nFROM upstream_min WHERE hops >= 1 GROUP BY 1, 2"
    )


def gq_part_early_slots_sql() -> str:
    """Relationship-predicate oracle (edge_where): ORDER -[includes WHERE
    ordinal <= 2]-> PART counted per part. One count unit = one
    materialized SEMANTIC edge, i.e. one distinct (subj, obj, ordinal)
    tuple of the 'includes' pred after canonicalization (the C3 dedup
    grain, materialize.build_edges: groupBy src/dst/rel_type/ordinal) —
    NOT one per asserting mention."""
    return _with(
        _BASE_CTES,
        _TRIPLES_CTE,
        _TRIPLES_CANON_CTE,
        select="""
        SELECT obj AS part_key, COUNT(*) AS n
        FROM (SELECT DISTINCT subj, obj, ordinal
              FROM triples_canon
              WHERE pred = 'includes' AND ordinal <= 2)
        GROUP BY obj
        """,
    )


def gq_turn_tool_coverage_sql() -> str:
    """OPTIONAL MATCH oracle: per turn role, all turns (count(*)) vs
    turns with an outgoing TOOL_RESULT_OF edge (count of matches). A
    TOOL_RESULT_OF edge exists exactly for tool-role turns with a
    predecessor (passes.flow_edges), and each such turn has exactly one,
    so the left-join multiplicity is 1 row per turn either way."""
    return (
        duckdb_transcripts_cte()
        + """
        SELECT role, COUNT(*) AS n_turns,
               CAST(SUM(CASE WHEN role = 'tool' AND pv IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_results
        FROM (SELECT role,
                     LAG(turn_idx) OVER (PARTITION BY conv_id
                                         ORDER BY turn_idx) AS pv
              FROM transcripts)
        GROUP BY role
        """
    )


def gq_tool_callers_sql() -> str:
    """TURN(tool) -[TOOL_RESULT_OF {tool}]-> TURN grouped by (tool prop,
    caller role): the dst of a TOOL_RESULT_OF edge is the turn preceding
    the tool turn (passes.flow_edges), so LAG(role) is the caller."""
    return (
        duckdb_transcripts_cte()
        + """
        SELECT tool, caller_role, COUNT(*) AS n FROM (
          SELECT coalesce(tool, '') AS tool, role,
                 LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS caller_role
          FROM transcripts) t
        WHERE role = 'tool' AND caller_role IS NOT NULL
        GROUP BY tool, caller_role
        """
    )


def gq_entity_reach_sql() -> str:
    """MENTION -[REFERS_TO]-> entity with carried conv_id: REFERS_TO edges
    exist for every non-literal mention and land on the canonical entity;
    the exact alias map is the identity, so canonical_key = norm_key."""
    return _with(
        _BASE_CTES,
        _MENTIONS_CTE,
        select="""
        SELECT norm_key AS canonical_key,
               COUNT(DISTINCT conv_id) AS n_convs
        FROM mentions WHERE mention_type <> 'literal'
        GROUP BY norm_key HAVING COUNT(DISTINCT conv_id) >= 2
        """,
    )


def gq_assistant_mentions_sql() -> str:
    """CONVERSATION -[HAS_TURN]-> TURN{role=assistant} -[HAS_MENTION]->
    MENTION per conversation: HAS_MENTION fans out one edge per mention of
    the turn, so the count equals mentions on assistant turns."""
    tcte = duckdb_transcripts_cte().replace("WITH ", "")
    return _with(
        tcte,
        _BASE_CTES,
        _MENTIONS_CTE,
        select="""
        SELECT m.conv_id AS conv_id, COUNT(*) AS n_mentions
        FROM mentions m JOIN transcripts t
          ON t.conv_id = m.conv_id AND t.turn_idx = m.turn_idx
        WHERE t.role = 'assistant'
        GROUP BY m.conv_id
        """,
    )
