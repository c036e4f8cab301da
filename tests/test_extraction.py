"""Golden + invariance tests for the extraction stage (FIXTURES.md §4:
t-extract-golden, t-order-invariance, t-forward-ref)."""

import pyspark.sql.functions as F

from progquery_spark.extraction.extract import extract, mentions_of, triples_of
from progquery_spark.fixtures import make_fixture, to_spark
from progquery_spark.canonicalize.cc import canonical_map, connected_components
from progquery_spark.canonicalize.remap import canonicalize_triples
from progquery_spark.linking.exact import alias_edges_exact, link_entities


def _canonical_triples(spark, tr, fuzzy=None):
    ex = extract(tr)
    m = mentions_of(ex)
    ents = link_entities(m)
    edges = alias_edges_exact(m)
    if fuzzy is not None:
        edges = edges.unionByName(fuzzy)
    labels, _ = connected_components(edges)
    amap = canonical_map(labels, ents.select("norm_key"))
    return canonicalize_triples(triples_of(ex), amap)


def _triple_set(df):
    return {
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
        for r in df.collect()
    }


def test_extract_golden(spark):
    fx = make_fixture(n_convs=8)
    tr = to_spark(spark, fx)
    got = _triple_set(_canonical_triples(spark, tr))
    assert got == set(fx.expected_triples)


def test_text_byte_equality(spark):
    """Per-turn text survives the shuffle+Arrow round trip byte-identically,
    including emoji/newlines (BASELINE.json per-row invariant)."""
    fx = make_fixture(n_convs=2)
    fx.rows[1]["text"] = "emoji \U0001f600é\n newline \t tab 中文"
    tr = to_spark(spark, fx)
    round_trip = (
        tr.repartition(4, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .mapInPandas(lambda it: it, tr.schema)
    )
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in tr.collect()}
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in round_trip.collect()}
    assert orig == got


def test_order_invariance(spark):
    fx = make_fixture(n_convs=6)
    tr = to_spark(spark, fx)
    shuffled = tr.orderBy(F.rand(seed=7))
    a = {tuple(r) for r in extract(tr).collect()}
    b = {tuple(r) for r in extract(shuffled).collect()}
    assert a == b and len(a) > 0


def test_forward_ref(spark):
    """Items referencing an order key declared only in a LATER turn must
    still resolve (batch extract-then-link dissolves arrival order)."""
    fx = make_fixture(n_convs=6, forward_ref=True)
    tr = to_spark(spark, fx)
    got = _triple_set(_canonical_triples(spark, tr))
    assert got == set(fx.expected_triples)


def test_small_batch_carryover(spark):
    """Conversations straddling Arrow batches must not lose context: force
    tiny batches so every conversation spans several."""
    fx = make_fixture(n_convs=6, max_items=8)
    tr = to_spark(spark, fx)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = _triple_set(_canonical_triples(spark, tr))
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    assert got == set(fx.expected_triples)


def test_duplicate_trap_dedup(spark):
    """Same fact stated twice -> triples keep provenance rows, but the
    semantic edge table dedups on (src, dst, rel_type, ordinal) (C3)."""
    from progquery_spark.graph.materialize import build_edges, build_nodes
    from progquery_spark.linking.exact import link_entities

    fx = make_fixture(n_convs=4, duplicate_traps=True)
    tr = to_spark(spark, fx)
    ex = extract(tr)
    m = mentions_of(ex)
    ents = link_entities(m)
    labels, _ = connected_components(alias_edges_exact(m))
    amap = canonical_map(labels, ents.select("norm_key"))
    tcanon = canonicalize_triples(triples_of(ex), amap)
    edges = build_edges(tr, m, tcanon, amap)
    sem = edges.filter(F.col("rel_graph") == "SEMANTIC")
    n = sem.count()
    n_distinct = sem.dropDuplicates(["src_id", "dst_id", "rel_type", "ordinal"]).count()
    assert n == n_distinct
    # supplied_by restated with same endpoints must appear exactly once
    dup = (
        sem.groupBy("src_id", "dst_id", "rel_type", "ordinal")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_pre_bucketed_extraction_equals_shuffled(spark, tmp_path):
    """The zero-shuffle pre-bucketed path (storage bucket(conv_id) layout)
    must emit exactly the rows of the shuffle+sort path — and its plan
    must contain no Exchange."""
    fx = make_fixture(n_convs=12, zipf_lengths=True, seed=5)
    tr = to_spark(spark, fx)
    path = str(tmp_path / "bucketed")
    # the production layout: conversations co-located per file
    tr.repartition(4, "conv_id").write.parquet(path)
    bucketed = spark.read.parquet(path)

    key = ["kind", "conv_id", "turn_idx", "span_start", "span_end"]

    def rows(df):
        return sorted(tuple(r) for r in df.select(*key).collect())

    fast = extract(bucketed, pre_bucketed=True)
    assert rows(fast) == rows(extract(tr))

    plan = fast._jdf.queryExecution().explainString(
        fast._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan, plan


def test_long_conversation_bounded_carry(monkeypatch):
    """SURVEY §4.3.2 skew axis A: a conversation longer than MAX_CARRY is
    flushed as chunked prefixes with only the resolved context carried —
    output must equal the unchunked extraction (pure-pandas drive of the
    worker iterator)."""
    import pandas as pd

    from progquery_spark.extraction import extract as X
    from progquery_spark.extraction import rules as R

    intro = (
        f"{R.INTRO_P0}Customer#000000001{R.INTRO_P1}FRANCE"
        f"{R.INTRO_P2}777{R.INTRO_P3}1-URGENT."
    )

    def item(i):
        return (
            f"{R.ITEM_P0}{i}{R.ITEM_P1}5{R.ITEM_P2}red widget"
            f"{R.ITEM_P3}Supplier#000000001."
        )

    final = f"{R.FINAL_P0}777{R.FINAL_P1}999{R.FINAL_P2}F."
    n_items = 40
    rows = (
        [("conv-long", 0, intro)]
        + [("conv-long", i, item(i)) for i in range(1, n_items + 1)]
        + [("conv-long", n_items + 1, final)]
        + [("conv-x", 0, intro.replace("777", "778"))]
    )
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])

    def run(batch_size):
        batches = [
            pdf.iloc[i : i + batch_size] for i in range(0, len(pdf), batch_size)
        ]
        outs = list(X._extract_iter(iter(batches)))
        allr = pd.concat(outs) if outs else pd.DataFrame(columns=X._COLS)
        key = ["kind", "conv_id", "turn_idx", "span_start", "span_end"]
        return sorted(map(tuple, allr[key].values.tolist()))

    want = run(len(pdf))  # everything in one batch, no cap hit
    monkeypatch.setattr(X, "MAX_CARRY", 7)  # force prefix flushing
    got = run(5)
    assert got == want
    # the long conversation's item triples all resolved (nothing dropped)
    n_triples = sum(1 for r in want if r[0] == "triple" and r[1] == "conv-long")
    assert n_triples == 3 + 2 * n_items + 2
