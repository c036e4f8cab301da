"""Deterministic synthetic transcripts (the BASELINE.json input_hint table).

The north rule fixes the input shape: ``(conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp)``. No transcript table
ships in /root/testdata, so we synthesize one **deterministically from the
driver's own parquet tables** (orders/customer/nation/lineitem/part/supplier)
using templated turn text with planted ground-truth triples — the exact
strategy FIXTURES.md §1 prescribes ("golden output = by-construction").

Crucially, the synthesis is expressed in a SQL dialect subset that runs
identically in Spark SQL *and* DuckDB. That lets the driver's correctness
gate (Spark ``queries()`` vs DuckDB ``oracle_sql()``) verify the *entire*
extraction->linking->canonicalization pipeline by value hash: the oracle
derives expected triples straight from the structured columns, while the
Spark pipeline must recover them from the rendered text.

Conversation shape (one conversation per order):
  turn 0               role=user       "Hello, I am {CUST} from {NATION}.
                                        I want to place order {KEY} with
                                        priority {PRIO}."
  turn 1..k (per item) role=tool       "Added item {LN}: {QTY} units of
                       tool=order_api   {PART} supplied by {SUPP}."
  turn k+1             role=assistant  "Order {KEY} total is {TOTAL} with
                                        status {STATUS}."

Alias noise (drives fuzzy linking + connected components, FIXTURES.md §1):
customer and supplier surfaces are deterministically case-mangled by
``o_orderkey % 3`` — upper / lower / as-is — so one entity appears under
three alias surfaces across conversations. Canonicalization must unify them
(the analog of ProgQuery unifying references through one fullyQualifiedName
key — DefinitionCache.java:56-74).

Skew: conversation length follows the order's lineitem count (1..7 turns) —
intentionally mild here; the Zipf-shaped straggler fixtures live in
``fixtures.py``. Hot-entity skew is real though: nations (25 values) and
priorities (5 values) are mentioned by every conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extraction import rules as R
from .session import register_sf_views

_DIALECTS = {
    "spark": {"STR": "STRING", "EPOCH": "unix_timestamp"},
    "duckdb": {"STR": "VARCHAR", "EPOCH": "epoch"},
}

# Deterministic alias-noise casing (valid in both dialects). Parameterized
# on the table aliases so the oracle generator can reuse them verbatim.
def cust_cased(o: str = "o", c: str = "c") -> str:
    return (
        f"CASE CAST({o}.o_orderkey % 3 AS INT) "
        f"WHEN 0 THEN upper({c}.c_name) WHEN 1 THEN lower({c}.c_name) "
        f"ELSE {c}.c_name END"
    )


def supp_typo(l: str = "l", s: str = "s") -> str:
    """Deterministic typo noise (drives fuzzy linking, VERDICT r1 #1):
    item turns with (l_orderkey + rn) % 7 == 3 drop the 3rd character of
    the supplier name ('Supplier#...' -> 'Suplier#...'), creating a
    distinct norm key at edit distance 1 that only MinHash-LSH + edit
    verification can re-unify (digit id intact — the strong-key rule).
    Valid in both SQL dialects, so every oracle sees the same noise."""
    return (
        f"CASE WHEN CAST(({l}.l_orderkey + {l}.rn) % 7 AS INT) = 3 "
        f"THEN substr({s}.s_name, 1, 2) || substr({s}.s_name, 4) "
        f"ELSE {s}.s_name END"
    )


def supp_cased(l: str = "l", s: str = "s") -> str:
    nm = supp_typo(l, s)
    return (
        f"CASE CAST(({l}.l_orderkey + {l}.rn) % 3 AS INT) "
        f"WHEN 0 THEN upper({nm}) WHEN 1 THEN lower({nm}) "
        f"ELSE {nm} END"
    )


# l_linenumber is NOT unique per order in the driver's synthetic data, so
# turn indices come from a deterministic ROW_NUMBER (total order: no
# fully-duplicate (orderkey, linenumber, partkey, suppkey, qty, price) rows
# exist at any SF — verified). This is the stable-(conv_id, turn_idx)
# ordering discipline the BASELINE.json invariant demands.
LINEITEM_RN = (
    "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY "
    "l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS INT) AS rn "
    "FROM lineitem"
)


def transcripts_select(dialect: str) -> str:
    """SELECT producing (conv_id, turn_idx, role, text, tool, ts_epoch).

    Valid in both Spark SQL and DuckDB (dialect only swaps the string type
    name and the epoch function).
    """
    d = _DIALECTS[dialect]
    s = d["STR"]
    epoch = d["EPOCH"]

    cust_expr = cust_cased()
    supp_expr = supp_cased()

    intro = f"""
    SELECT
      'conv-' || CAST(o.o_orderkey AS {s})              AS conv_id,
      CAST(0 AS INT)                                    AS turn_idx,
      'user'                                            AS role,
      '{R.INTRO_P0}' || {cust_expr} || '{R.INTRO_P1}' || n.n_name
        || '{R.INTRO_P2}' || CAST(o.o_orderkey AS {s})
        || '{R.INTRO_P3}' || o.o_orderpriority || '.'   AS text,
      CAST(NULL AS {s})                                 AS tool,
      CAST({epoch}(o.o_orderdate) AS BIGINT)            AS ts_epoch
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    """

    items = f"""
    SELECT
      'conv-' || CAST(l.l_orderkey AS {s})              AS conv_id,
      l.rn                                              AS turn_idx,
      'tool'                                            AS role,
      '{R.ITEM_P0}' || CAST(l.rn AS {s}) || '{R.ITEM_P1}'
        || CAST(CAST(floor(l.l_quantity) AS BIGINT) AS {s})
        || '{R.ITEM_P2}' || p.p_name || '{R.ITEM_P3}' || {supp_expr}
        || '.'                                          AS text,
      'order_api'                                       AS tool,
      CAST({epoch}(o.o_orderdate) AS BIGINT) + 60 * l.rn AS ts_epoch
    FROM ({LINEITEM_RN}) l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    """

    final = f"""
    SELECT
      'conv-' || CAST(o.o_orderkey AS {s})              AS conv_id,
      CAST(m.maxln + 1 AS INT)                          AS turn_idx,
      'assistant'                                       AS role,
      '{R.FINAL_P0}' || CAST(o.o_orderkey AS {s}) || '{R.FINAL_P1}'
        || CAST(CAST(floor(o.o_totalprice) AS BIGINT) AS {s})
        || '{R.FINAL_P2}' || o.o_orderstatus || '.'     AS text,
      CAST(NULL AS {s})                                 AS tool,
      CAST({epoch}(o.o_orderdate) AS BIGINT) + 60 * (m.maxln + 1)
                                                        AS ts_epoch
    FROM orders o
    JOIN (SELECT l_orderkey, CAST(COUNT(*) AS INT) AS maxln
          FROM lineitem GROUP BY l_orderkey) m
      ON m.l_orderkey = o.o_orderkey
    """

    return f"{intro}\nUNION ALL\n{items}\nUNION ALL\n{final}"


def duckdb_transcripts_cte() -> str:
    """``WITH transcripts AS (...)`` prefix for DuckDB oracle queries."""
    return f"WITH transcripts AS (\n{transcripts_select('duckdb')}\n)"


# --------------------------------------------------------------------------
# Derived op-gate inputs (duplicate-bearing documents, planted near-dup
# embeddings). The driver's testdata has no exact duplicates and no
# tight-angle vector pairs, so the dedup gates would certify over empty
# work; these views plant the structure DETERMINISTICALLY, in a SQL subset
# both engines run, so the synthesis itself is part of the certified
# semantics — and the registered operators stay pure functions of their
# input table (VERDICT r3 #5: no fixture synthesis inside an operator).
# --------------------------------------------------------------------------

DOC_CLONE_MOD = 10  # every 10th doc cloned at doc_id + (max(doc_id) + 1)


def documents_with_dups_select() -> str:
    """Duplicate-bearing documents view (same text in both dialects).

    Clone ids live at ``doc_id + max(doc_id) + 1`` — a CORPUS-RELATIVE
    offset (cheap: MAX comes from parquet footer stats), because any
    fixed constant collides with real ids once the corpus outgrows it
    (code-review finding, round 4: the 2M-doc scale corpus has ids
    0..2M-1, so a +100000 clone landed on a real document's id and made
    per-id dedup verdicts ambiguous)."""
    return (
        "SELECT doc_id, text FROM documents "
        "UNION ALL "
        "SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents) AS doc_id, "
        f"text FROM documents WHERE doc_id % {DOC_CLONE_MOD} = 0"
    )


def build_documents_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sf_views(spark, sf_dir)
    return spark.sql(documents_with_dups_select())


VEC_PLANT_MOD = 40  # every 40th vector gets a planted near-dup clone at
# vec_id + (max(vec_id) + 1) — corpus-relative like the doc clones
# clone = 1.03*v + 0.01 (per component, double math): the uniform scale
# preserves direction exactly and the small constant shift tilts it by a
# tiny angle (cos ≈ 0.999+ for the testdata's vector scale) — the
# tight-angle planted pair a corpus-scale LSH width must recover
_VEC_PLANT_EXPR = "CAST(x AS DOUBLE) * 1.03 + 0.01"


def embeddings_planted_select(dialect: str) -> str:
    """Embeddings with planted tight-angle near-dup clones.

    Both branches cast components to DOUBLE explicitly so the UNION has
    one element type in both engines; the perturbation is two IEEE double
    ops, bit-identical cross-engine. Clone ids are corpus-relative
    (max(vec_id) + 1) so they can never collide with real vectors."""
    lt = "transform" if dialect == "spark" else "list_transform"
    return (
        f"SELECT vec_id, label, {lt}(embedding, x -> CAST(x AS DOUBLE)) "
        "AS embedding FROM embeddings "
        "UNION ALL "
        "SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings) AS vec_id, "
        f"label, {lt}(embedding, x -> {_VEC_PLANT_EXPR}) AS embedding "
        f"FROM embeddings WHERE vec_id % {VEC_PLANT_MOD} = 0"
    )


def build_embeddings_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sf_views(spark, sf_dir)
    return spark.sql(embeddings_planted_select("spark"))


def build_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the transcripts DataFrame (real ``ts`` timestamp column).

    Replaces the reference's source discovery + javac compile loop
    (CompilationScheduler.java:62-94): the 'compilation units' are
    conversations, materialized as a declarative plan over the parquet scans
    so Catalyst prunes columns/pushes filters into the scans.
    """
    register_sf_views(spark, sf_dir)
    df = spark.sql(transcripts_select("spark"))
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.timestamp_seconds("ts_epoch").alias("ts"),
    )
