"""Per-conversation mention + triple extraction (SURVEY.md §2.2 E1-E10).

The reference walks each *complete, attributed* compilation unit with one
visitor (ASTTypesVisitor, fired from GetStructuresAfterAnalyze.java:60-108 —
only after ANALYZE, because extraction needs the whole ordered unit). Our
analog: each conversation is reassembled under stable ``(conv_id, turn_idx)``
order and extracted in one vectorized pass.

Physical plan (scale path):
    transcripts.repartition(N, conv_id)          -- co-locate conversations
               .sortWithinPartitions(conv_id, turn_idx)
               .mapInPandas(extract, EXTRACTION_SCHEMA)

``mapInPandas`` (not ``groupBy().applyInPandas``) is deliberate: at 10^12
turns, one-pandas-call-per-conversation is billions of tiny Python frames;
instead each Arrow batch holds *thousands* of conversations processed by
vectorized pandas regex. Conversations can straddle consecutive Arrow
batches of a partition, so the extractor carries the trailing (possibly
incomplete) conversation over to the next batch — bounded memory: at most
one conversation's rows are held back. Conversation-context facts (the order
key declared in turn 0, needed by item-turn triples — the analog of the
reference's enclosing-callable context, ASTTypesVisitor.java:1085-1089)
therefore always resolve within one pandas call.

Output is a single unioned frame (kind ∈ {mention, triple}) so the pipeline
materializes the regex pass exactly once; mentions/triples are cheap filters
downstream (reference analog: one visitor emits both nodes and relations,
SURVEY.md §2.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from . import rules as R

EXTRACTION_SCHEMA = StructType(
    [
        StructField("kind", StringType(), False),  # 'mention' | 'triple'
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("mention_type", StringType(), True),
        StructField("surface", StringType(), True),
        StructField("norm_key", StringType(), True),
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj", StringType(), True),
        StructField("ordinal", IntegerType(), True),
        StructField("span_start", IntegerType(), False),
        StructField("span_end", IntegerType(), False),
        StructField("is_decl", BooleanType(), True),
    ]
)

_COLS = [f.name for f in EXTRACTION_SCHEMA.fields]

_L = {
    "intro_p0": len(R.INTRO_P0),
    "intro_p1": len(R.INTRO_P1),
    "intro_p2": len(R.INTRO_P2),
    "intro_p3": len(R.INTRO_P3),
    "item_p0": len(R.ITEM_P0),
    "item_p1": len(R.ITEM_P1),
    "item_p2": len(R.ITEM_P2),
    "item_p3": len(R.ITEM_P3),
    "final_p0": len(R.FINAL_P0),
    "final_p1": len(R.FINAL_P1),
    "final_p2": len(R.FINAL_P2),
}


def _mk(kind: str, conv, turn, **cols) -> dict:
    """One emitted row-block as a dict of per-column numpy arrays.

    Blocks are assembled with per-column ``np.concatenate`` rather than
    ``pd.concat`` of DataFrames: profiling showed the frame concat spending
    ~73% of total extraction time scanning every element of the all-None
    object blocks for NA compatibility (pandas ``is_valid_na_for_dtype``,
    1.4M calls per 100k turns). Array concatenation is a memcpy.
    """
    n = len(conv)
    d = {
        "kind": np.full(n, kind, dtype=object),
        "conv_id": conv.to_numpy(),
        "turn_idx": turn.to_numpy(),
    }
    for c in _COLS:
        if c in ("kind", "conv_id", "turn_idx"):
            continue
        v = cols.get(c)
        if isinstance(v, pd.Series):
            d[c] = v.to_numpy()
        else:
            d[c] = np.full(n, v, dtype=object)
    return d


def _assemble(parts: list[dict]) -> pd.DataFrame:
    return pd.DataFrame(
        {c: np.concatenate([p[c] for p in parts]) for c in _COLS}
    )


def _mention(conv, turn, mtype, surface, start, end, is_decl) -> pd.DataFrame:
    nk = surface.str.lower() if mtype in R.PFX else surface
    prefix = R.PFX.get(mtype, "lit:")
    return _mk(
        "mention",
        conv,
        turn,
        mention_type=mtype,
        surface=surface,
        norm_key=prefix + nk,
        span_start=start,
        span_end=end,
        is_decl=is_decl,
    )


def _triple(conv, turn, subj, pred, obj, start, end, ordinal=None) -> pd.DataFrame:
    return _mk(
        "triple",
        conv,
        turn,
        subj=subj,
        pred=pred,
        obj=obj,
        ordinal=ordinal,
        span_start=start,
        span_end=end,
    )


def _match(text: pd.Series, prefix: str, regex) -> pd.DataFrame:
    """Literal-prefix dispatch before the full regex.

    ``str.startswith`` is a cheap memcmp per row; running each anchored
    regex only over its own turn subset cuts the string bytes each regex
    scans to ~1/3 (extraction is memory-bandwidth-bound — this is the
    difference between saturating DRAM at 8 workers vs 16). Semantics are
    identical: the regexes are prefix-anchored, and the notna guard keeps
    the behavior for prefix-matching-but-malformed rows.
    """
    cand = text.str.startswith(prefix, na=False)
    if not cand.any():
        return text.iloc[0:0].str.extract(regex)
    m = text[cand].str.extract(regex)
    return m[m[0].notna()]


def extract_pandas(
    turns: pd.DataFrame, ctx_in: dict | None = None
) -> pd.DataFrame:
    """Vectorized extraction over a frame of whole conversations.

    ``turns`` must contain every turn of every conversation it mentions
    (the carry-over logic in ``_extract_iter`` guarantees this) and be
    sorted by (conv_id, turn_idx). Pure pandas — also used directly by the
    test oracle.

    ``ctx_in`` optionally seeds the conversation context (conv_id ->
    declared order key) for conversations whose declaring turn was
    already processed in an earlier chunk (the long-conversation
    chunked-prefix path, see _extract_iter); in-frame declarations take
    precedence. Resolved context is exposed on the result as
    ``.attrs['ctx']`` so callers can carry it forward.
    """
    text = turns["text"]
    conv = turns["conv_id"]
    tidx = turns["turn_idx"].astype("int32")
    parts: list[pd.DataFrame] = []

    # --- intro turns (E1 analog: declaration + references) ----------------
    g_intro = _match(text, R.INTRO_P0, R.INTRO_RE)
    if len(g_intro):
        g = g_intro
        c, t = conv.loc[g.index], tidx.loc[g.index]
        cust, nation, okey, prio = g[0], g[1], g[2], g[3]
        cust_s = _L["intro_p0"]
        cust_e = cust_s + cust.str.len()
        nat_s = cust_e + _L["intro_p1"]
        nat_e = nat_s + nation.str.len()
        ok_s = nat_e + _L["intro_p2"]
        ok_e = ok_s + okey.str.len()
        pr_s = ok_e + _L["intro_p3"]
        pr_e = pr_s + prio.str.len()
        order_key = "order:" + okey
        cust_key = "customer:" + cust
        nation_key = "nation:" + nation
        parts += [
            _mention(c, t, "customer", cust, cust_s, cust_e, True),
            _mention(c, t, "nation", nation, nat_s, nat_e, False),
            _mention(c, t, "order", okey, ok_s, ok_e, True),
            _mention(c, t, "literal", prio, pr_s, pr_e, False),
            _triple(c, t, cust_key, "from_nation", nation_key, nat_s, nat_e),
            _triple(c, t, cust_key, "placed", order_key, ok_s, ok_e),
            _triple(c, t, order_key, "has_priority", prio, pr_s, pr_e),
        ]

    # conversation context: order key declared in intro (or final) turn —
    # needed by item turns whose text does not repeat the key. Seeded from
    # ctx_in for chunked long conversations; in-frame declarations win.
    ctx = dict(ctx_in or {})

    # --- final turns (declares the order too) ------------------------------
    g_final = _match(text, R.FINAL_P0, R.FINAL_RE)
    if len(g_final):
        g = g_final
        c, t = conv.loc[g.index], tidx.loc[g.index]
        okey, total, status = g[0], g[1], g[2]
        ok_s = _L["final_p0"]
        ok_e = ok_s + okey.str.len()
        tot_s = ok_e + _L["final_p1"]
        tot_e = tot_s + total.str.len()
        st_s = tot_e + _L["final_p2"]
        st_e = st_s + 1
        order_key = "order:" + okey
        parts += [
            _mention(c, t, "order", okey, ok_s, ok_e, True),
            _mention(c, t, "literal", total, tot_s, tot_e, False),
            _mention(c, t, "literal", status, st_s, st_e, False),
            _triple(c, t, order_key, "has_total", total, tot_s, tot_e),
            _triple(c, t, order_key, "has_status", status, st_s, st_e),
        ]

    if len(g_intro):
        ctx.update(zip(conv.loc[g_intro.index], g_intro[2]))
    if len(g_final):
        for cv, k in zip(conv.loc[g_final.index], g_final[0]):
            ctx.setdefault(cv, k)

    # --- item turns (context-dependent subject) ----------------------------
    g_item = _match(text, R.ITEM_P0, R.ITEM_RE)
    if len(g_item):
        g = g_item
        c, t = conv.loc[g.index], tidx.loc[g.index]
        ln, qty, part, supp = g[0], g[1], g[2], g[3]
        okey = c.map(ctx)
        resolved = okey.notna()
        if not resolved.all():
            # a conversation with item turns but no intro/final declaration:
            # defensive drop, mirroring the reference's unexpected-tree
            # assertions (ASTTypesVisitor.visitOther:1299-1302)
            c, t = c[resolved], t[resolved]
            ln, qty, part, supp = (x[resolved] for x in (ln, qty, part, supp))
            okey = okey[resolved]
        if len(c):
            ln_e = _L["item_p0"] + ln.str.len()
            qty_s = ln_e + _L["item_p1"]
            qty_e = qty_s + qty.str.len()
            part_s = qty_e + _L["item_p2"]
            part_e = part_s + part.str.len()
            sup_s = part_e + _L["item_p3"]
            sup_e = sup_s + supp.str.len()
            order_key = "order:" + okey
            part_key = "part:" + part
            supp_key = "supplier:" + supp
            ordv = ln.astype("int32")
            parts += [
                _mention(c, t, "part", part, part_s, part_e, False),
                _mention(c, t, "supplier", supp, sup_s, sup_e, False),
                _triple(c, t, order_key, "includes", part_key, part_s, part_e, ordv),
                _triple(c, t, part_key, "supplied_by", supp_key, sup_s, sup_e),
            ]

    if not parts:
        out = pd.DataFrame({c: pd.Series(dtype="object") for c in _COLS})
        out.attrs["ctx"] = ctx
        return out
    out = _assemble(parts)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    out["span_start"] = out["span_start"].astype("int32")
    out["span_end"] = out["span_end"].astype("int32")
    out.attrs["ctx"] = ctx
    return out


# Upper bound on rows per yielded frame. The worker serializes each yielded
# frame as ONE Arrow record batch (no re-chunking), and oversized batches in
# flight in both socket directions at once can stall the runner's flow
# control — observed as non-deterministic multi-minute stalls when a single
# conversation-dense input batch fanned out to ~100k output rows. Slicing
# every yielded frame to <=4096 rows keeps each burst small relative to the
# worker socket buffers in both directions.
_OUT_CHUNK = 4096


def _chunked(out: pd.DataFrame) -> Iterator[pd.DataFrame]:
    for i in range(0, len(out), _OUT_CHUNK):
        yield out.iloc[i : i + _OUT_CHUNK]


# Bounded carry (SURVEY §4.3.2, skew axis A — pathological long
# conversations): the worker never holds more than MAX_CARRY rows of a
# trailing conversation. A longer conversation is flushed as chunked
# prefixes, and only the tiny resolved context (conv -> declared order
# key) — not the raw rows — travels to the next chunk, so item turns
# after the cut still resolve their subject. Memory stays O(MAX_CARRY)
# per worker no matter how long a single conversation is.
MAX_CARRY = 100_000


def _extract_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: carry the trailing conversation across batches,
    with the carry bounded by MAX_CARRY rows (see above)."""
    carry: pd.DataFrame | None = None
    ctx_carry: dict = {}
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        last = pdf["conv_id"].iloc[-1]
        tail = pdf["conv_id"] == last
        carry = pdf[tail]
        work = pdf[~tail]
        if len(work):
            yield from _chunked(extract_pandas(work, ctx_carry))
        # context is only ever carried for a flushed-prefix conversation;
        # once that conversation is no longer the tail it has completed,
        # so prune to the current tail
        ctx_carry = {last: ctx_carry[last]} if last in ctx_carry else {}
        if len(carry) > MAX_CARRY:
            # oversized conversation: flush the buffered prefix now and
            # keep only its resolved context for the rest of the rows
            out = extract_pandas(carry, ctx_carry)
            yield from _chunked(out)
            ctx_carry = (
                {last: out.attrs["ctx"][last]} if last in out.attrs["ctx"] else {}
            )
            carry = None
    if carry is not None and len(carry):
        yield from _chunked(extract_pandas(carry, ctx_carry))


# Input slice size for the buffered (pre-bucketed) path. Extraction makes
# ~20 vectorized passes over its frame; a ~10k-row slice (~1 MB of text)
# stays cache-resident across passes, while one whole-split frame (~450k
# rows) streams through DRAM on every pass — measured 2x slower end-to-end
# at 16 workers on this DRAM-limited host.
_IN_CHUNK = 10_000


def _extract_buffered_iter(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for PRE-BUCKETED input: buffer the task's whole
    split, sort it once, then stream cache-sized conv-contiguous slices
    through the same carry-over extractor the shuffle path uses. Memory is
    bounded by the scan split size (spark.sql.files.maxPartitionBytes),
    not the corpus."""
    parts = [p for p in batches if len(p)]
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True).sort_values(
        ["conv_id", "turn_idx"], kind="stable", ignore_index=True
    )
    slices = (pdf.iloc[i : i + _IN_CHUNK] for i in range(0, len(pdf), _IN_CHUNK))
    yield from _extract_iter(slices)


def extract(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    pre_bucketed: bool = False,
) -> DataFrame:
    """The extraction stage.

    Default path: one shuffle (repartition by conv_id) + sort + one Arrow
    pass, with conversations carried across Arrow batches.

    ``pre_bucketed=True`` is the ZERO-SHUFFLE path for input that is
    already conversation-bucketed in storage — the production layout
    (Iceberg hidden ``bucket(conv_id)`` partitioning, SURVEY.md §4.2): a
    storage-partitioned scan already co-locates every conversation's
    turns inside one file, so the repartition+sort — which re-materializes
    the full text column through shuffle write, fetch, and external sort
    (3+ extra memory-bandwidth passes over the corpus; measured as the
    difference between 0.88 and ~0.35 scaling efficiency at 16 local
    workers on tmpfs) — is pure waste. The worker instead buffers its
    whole scan split and extracts once.

    CORRECTNESS REQUIREMENT for pre_bucketed: every conversation's rows
    must live in ONE file, and files must not be split mid-file — set
    ``spark.sql.files.maxPartitionBytes`` >= the largest input file
    (whole files may still be packed together; that preserves
    conversation completeness). Violating this silently drops item turns
    of straddling conversations (the extractor's defensive
    context-missing drop), so callers must know their input layout.
    """
    pruned = transcripts.select("conv_id", "turn_idx", "text")
    if pre_bucketed:
        return pruned.mapInPandas(_extract_buffered_iter, EXTRACTION_SCHEMA)
    spark = transcripts.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        pruned.repartition(num_partitions, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .mapInPandas(_extract_iter, EXTRACTION_SCHEMA)
    )


def mentions_of(extraction: DataFrame) -> DataFrame:
    cols = [
        "conv_id",
        "turn_idx",
        "mention_type",
        "surface",
        "norm_key",
        "span_start",
        "span_end",
        "is_decl",
    ]
    return extraction.filter(F.col("kind") == "mention").select(*cols)


def triples_of(extraction: DataFrame) -> DataFrame:
    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "ordinal", "span_start", "span_end"]
    return extraction.filter(F.col("kind") == "triple").select(*cols)
