"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in expressions (JVM-side, whole-stage codegen); every query
has an exact DuckDB oracle. Ratios are emitted as integer per-mille
(floor(1000*a/b)) so cross-engine float formatting can never flake the
value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import register_sf_views

_M = (1 << 31) - 1

# BPE-ish token regex: alpha runs, digit runs, single non-alnum glyphs
# (valid in both Java regex and RE2)
BPE_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

# tiny marker-token profiles for the langid heuristic. The documents table's
# text is synthetic English-ish word soup, so 'en' dominates — the point of
# the query is deterministic rule parity, not linguistic accuracy; a real
# deployment swaps in char-n-gram profiles behind the same interface.
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "is", "on"],
    "es": ["el", "la", "de", "y", "es", "en"],
    "de": ["der", "die", "das", "und", "ist", "auf"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sf_views(spark, sf_dir)
    return spark.table("documents")


def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts.

    ``regexp_count`` is the measured-best form for the BPE leg despite
    its per-row String/Matcher allocation (13.0 of 16.4 s at 2M docs /
    32 cores, 4->16 scaling 0.30 in one shared local-mode JVM — see
    BENCH/BASELINE.md). The obvious "fix" — a regex-free char-class
    transition count via the ``ascii(substr(col, i, 1))`` HOF shape that
    serves ``poly_hash`` so well — was tried and REVERTED: Spark's
    UTF8String substr seeks character i by scanning from the string
    start (multibyte-aware), so the per-char pass is O(len^2) per
    document; fine for ~15-char entity names, 15x SLOWER than the regex
    (252 vs 16.4 s at 2M) on ~300-char documents."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_PAT)).alias("n_bpe_tokens"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/alpha-ratio quality banding — a standard
    pretraining-corpus filter pass.

    The built-in split/array_intersect/regexp_replace form IS the
    measured-best form (round 5): an Arrow-vectorized twin (the
    tokens_fast/fingerprint_long pattern — boundary-checked stopword
    substring masks over the slice codepoint array) was built,
    value-certified on every adversarial fixture, measured, and REVERTED:
    13.5 vs 14.9 s at 2M short docs / 4 cores (a wash), and LOSES on 5k-
    char documents (3.5 vs 2.5 s at 100k docs / 16 cores) — unlike
    regexp_count's Matcher churn or substr's O(len^2) fold, these array
    built-ins are linear and allocation-light, and the Arrow twin's
    ~30 full-slice mask passes plus transport cost more than they save.
    Numbers in BENCH/BASELINE.md (round-5 note)."""
    d = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS])
        )
    )
    alpha_chars = F.length(F.regexp_replace("text", "[^a-z]", ""))
    # empty documents define alpha_pm = 0 (mirrored in the oracle's CASE):
    # under ANSI mode the bare ratio is a divide-by-zero crash, not a null
    out = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        stop_hits.alias("stopword_hits"),
        F.when(
            F.length("text") > 0,
            F.floor(1000 * alpha_chars / F.length("text")),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("alpha_pm"),
    )
    return out.withColumn(
        "quality_band",
        F.when((F.col("n_tokens") >= 40) & (F.col("stopword_hits") >= 2), "high")
        .when(F.col("n_tokens") >= 20, "medium")
        .otherwise("low"),
    )


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.array_distinct(F.split("text", " "))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in mk])))
        for lang, mk in LANG_MARKERS.items()
    }
    out = d.select(
        "doc_id",
        scores["en"].alias("en_score"),
        scores["es"].alias("es_score"),
        scores["de"].alias("de_score"),
    )
    return out.withColumn(
        "pred_lang",
        F.when(
            (F.col("en_score") >= F.col("es_score"))
            & (F.col("en_score") >= F.col("de_score")),
            "en",
        )
        .when(F.col("es_score") >= F.col("de_score"), "es")
        .otherwise("de"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash h <- (h*131 + charcode) mod (2^31-1) over the
    full text — deterministic content fingerprint (order-sensitive, unlike
    a token-set hash). Sequential fold in both engines.

    Scale bound: ``substr(text, i, 1)`` seeks char i from the string
    start (multibyte-aware UTF8String), so the fold is O(len^2) per
    document — measured fine at transcript-derived ~300-char docs
    (19.2 s / 2M docs / 32 cores, 4->16 scaling 0.93) but wrong for
    book-length documents; there the same field arithmetic belongs in an
    Arrow-batched numpy pass (the ops.multimodal pattern: one
    np.frombuffer view, vectorized Horner fold), worth it only once doc
    length outgrows the codegen form."""
    d = _docs(spark, sf_dir)
    codes = F.transform(
        F.sequence(F.lit(1), F.length("text")),
        lambda i: F.ascii(F.substr(F.col("text"), i, F.lit(1))).cast("long"),
    )
    fp = F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: F.pmod(acc * 131 + c, F.lit(_M))
    )
    return d.select("doc_id", fp.alias("fp"))


# Output slice bound for mapInPandas yields (the Arrow-runner flow-control
# discipline from ops.multimodal: oversized batches in flight both ways
# stall the worker socket).
_OUT_CHUNK = 4096
# Input re-slice bound for the vectorized char-level workers: caps the
# ~40 bytes/char of transient int64/bool arrays at ~80 MB per worker
# regardless of document length or Arrow batch sizing (see _fp_long_iter
# memory bound). Bound in CHARS, not rows: row payloads vary ~100x.
_CHUNK_CHARS = 2_000_000


def _char_slices(pdf: pd.DataFrame):
    """Re-slice an Arrow batch so each slice holds ~_CHUNK_CHARS of text
    (at least one row). Shared by every vectorized char-level op."""
    chars = pdf["text"].fillna("").str.len().to_numpy(np.int64)
    cum = np.cumsum(chars)
    start = 0
    while start < len(pdf):
        base = cum[start - 1] if start else 0
        end = int(np.searchsorted(cum, base + _CHUNK_CHARS, side="left")) + 1
        yield pdf.iloc[start:end]
        start = end


def _codepoints(texts: pd.Series, total: int) -> np.ndarray:
    """Concatenated per-char codepoint array for a slice. latin-1 gives
    byte == codepoint (< 256) in one memcpy; wider codepoints fall back to
    a UTF-32-LE view (4 bytes == exactly 1 codepoint, astral chars
    included, still memcpy speed — not a per-char ord() loop, which would
    silently forfeit the vectorized speedup on any CJK/emoji slice;
    ADVICE r4). Both paths match the engines' ascii()/regex per-CODEPOINT
    semantics (UTF-8 byte views would miscount multibyte chars; Python
    str, pandas str.len and Spark's length() all count astral chars as 1
    codepoint — proven by the beyond-latin-1 equivalence tests)."""
    joined = "".join(texts)
    try:
        return np.frombuffer(joined.encode("latin-1"), dtype=np.uint8).astype(
            np.int64
        )
    except UnicodeEncodeError:
        codes = np.frombuffer(
            joined.encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        assert len(codes) == total  # 1 uint32 per codepoint, no surrogates
        return codes

_FP_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(text) + 1),
                          i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
         (acc, c) -> (acc * 131 + c) % {_M}) AS fp
FROM documents
"""


def _fp_long_iter(batches):
    """mapInPandas worker: the SAME rolling-hash math as
    ``q_text_fingerprint`` — fp = sum(code_i * 131^(n-1-i)) mod (2^31-1) —
    but O(len) per document instead of O(len^2).

    Fully vectorized across the batch (the ops.multimodal pattern): one
    concatenated byte view of every document, one exponent array built by
    repeat/arange, one gather into a cached mod-power table, segment sums
    via prefix sums (reduceat mishandles empty segments). latin-1 gives
    byte == codepoint for the verified-ASCII corpus; a batch with wider
    codepoints falls back to a UTF-32-LE view (see ``_codepoints``) so the
    math still matches the oracle's ascii() (codepoint) semantics.

    Overflow audit: terms are reduced mod M (< 2^31) before the prefix
    sum, so the cumsum stays exact int64 for any batch under 2^32 chars
    (a >4 GB Arrow batch cannot exist).

    Memory bound: the vectorized pass allocates ~5 int64 arrays over the
    slice's total chars (~40 B/char peak). An Arrow batch of 10k
    book-length docs is 10^8+ chars -> multi-GB per worker across 32
    workers (measured: 20k-char docs fell off the DRAM cliff, 1.6 -> 22 s
    for 2x chars), so input batches are re-sliced to ~_CHUNK_CHARS before
    vectorizing — O(1) worker memory at any doc length. A single document
    longer than _CHUNK_CHARS still processes whole (the fold needs its
    full char sequence); at 64 MB/doc that is ~2.5 GB transient — tighten
    by Horner-chaining prefix fingerprints if corpora ever carry
    multi-GB single documents."""
    pow_tab = np.ones(1, dtype=np.int64)  # [131^0 .. ] mod M, grown on demand

    def grow(n: int) -> None:
        nonlocal pow_tab
        while len(pow_tab) < n:
            m = len(pow_tab)
            factor = pow_tab[m - 1] * 131 % _M
            pow_tab = np.concatenate([pow_tab, pow_tab * factor % _M])

    for big in batches:
        for pdf in _char_slices(big):
            nulls = pdf["text"].isna().to_numpy()
            texts = pdf["text"].fillna("")
            lens = texts.str.len().to_numpy(np.int64)
            total = int(lens.sum())
            if total == 0:
                fp = np.zeros(len(pdf), dtype=np.int64)
            else:
                codes = _codepoints(texts, total)
                grow(int(lens.max()))
                ends = np.cumsum(lens)
                starts = ends - lens
                # exponent of the char at global position i of doc d is
                # (ends[d] - 1 - i): descending from len-1 to 0 within each doc
                e = np.repeat(ends, lens) - 1 - np.arange(total, dtype=np.int64)
                terms = codes * pow_tab[e] % _M
                csum = np.concatenate([[0], np.cumsum(terms)])
                fp = (csum[ends] - csum[starts]) % _M
            # NULL text -> NULL fp, matching the codegen form and the oracle
            fp_col = pd.Series(fp).astype("Int64")
            fp_col[nulls] = pd.NA
            out = pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "fp": fp_col})
            for i in range(0, len(out), _OUT_CHUNK):
                yield out.iloc[i : i + _OUT_CHUNK]


def q_text_fingerprint_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document fingerprint (VERDICT r3 #4): identical math and
    identical oracle as ``text_fingerprint``, computed in one Arrow-batched
    numpy pass so cost is O(len) per document. The codegen form's
    ``substr(text, i, 1)`` seeks char i from the string start, making it
    O(len^2) — measured fine at ~300-char transcript docs, quadratic ruin
    at book length (the corpus a 100-TB pretraining pipeline reads; see
    BENCH/BASELINE.md for the measured crossover). This is the documented
    dispatch: codegen form for short fields, this for documents."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", "text").mapInPandas(
        _fp_long_iter, "doc_id long, fp bigint"
    )


def _tokens_fast_iter(batches):
    """mapInPandas worker: the BPE-ish token count as vectorized char-class
    run detection — the regex-free twin of ``q_text_tokens``.

    ``regexp_count(text, BPE_PAT)`` allocates a String + Matcher per row
    and re-scans with backtracking alternation: 13.0 of 16.4 s at 2M docs
    / 32 cores, 4->16 scaling 0.30 (BENCH/BASELINE.md). The pattern is
    just three char classes, so the count equals
        (# starts of [A-Za-z]+ runs) + (# starts of [0-9]+ runs)
      + (# codepoints not in [A-Za-z0-9 ]),
    computable with boolean masks over the slice's codepoint array: run
    starts are ``cls & ~prev(cls)`` with the previous-char mask forced
    False at document boundaries; per-doc totals are prefix-sum diffs.
    Whitespace tokens are spaces+1 (Spark's size(split(text, ' '))
    counts empty fields). NULL text -> NULL counts, matching the
    built-in forms under their null propagation."""
    for big in batches:
        for pdf in _char_slices(big):
            nulls = pdf["text"].isna().to_numpy()
            texts = pdf["text"].fillna("")
            lens = texts.str.len().to_numpy(np.int64)
            total = int(lens.sum())
            n = len(pdf)
            if total == 0:
                n_ws = np.ones(n, dtype=np.int64)
                n_bpe = np.zeros(n, dtype=np.int64)
            else:
                codes = _codepoints(texts, total)
                ends = np.cumsum(lens)
                starts = ends - lens
                alpha = ((codes >= 65) & (codes <= 90)) | (
                    (codes >= 97) & (codes <= 122)
                )
                digit = (codes >= 48) & (codes <= 57)
                space = codes == 32

                def seg_sum(mask):
                    cs = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
                    return cs[ends] - cs[starts]

                def run_starts(cls):
                    prev = np.empty_like(cls)
                    prev[0] = False
                    prev[1:] = cls[:-1]
                    prev[starts[lens > 0]] = False  # runs reset per document
                    return cls & ~prev

                n_bpe = (
                    seg_sum(run_starts(alpha))
                    + seg_sum(run_starts(digit))
                    + seg_sum(~(alpha | digit | space))
                )
                n_ws = seg_sum(space) + 1
            ws_col = pd.Series(n_ws).astype("Int32")
            bpe_col = pd.Series(n_bpe).astype("Int32")
            ws_col[nulls] = pd.NA
            bpe_col[nulls] = pd.NA
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_ws_tokens": ws_col,
                    "n_bpe_tokens": bpe_col,
                }
            )
            for i in range(0, len(out), _OUT_CHUNK):
                yield out.iloc[i : i + _OUT_CHUNK]


def q_text_tokens_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized token counting (same oracle as ``text_tokens``): the
    tokenization pass is THE hot per-document op of a pretraining
    pipeline, and the regex form's per-row Matcher allocation was the
    measured bottleneck of the text family (13.0 of 16.4 s at 2M docs).
    See BENCH/BASELINE.md for the measured 2M-doc comparison."""
    d = _docs(spark, sf_dir)
    return d.select("doc_id", "text").mapInPandas(
        _tokens_fast_iter, "doc_id long, n_ws_tokens int, n_bpe_tokens int"
    )


def queries():
    return {
        "text_tokens": q_text_tokens,
        "text_tokens_fast": q_text_tokens_fast,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "text_fingerprint_long": q_text_fingerprint_long,
    }


def oracles():
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

    def mk_list(xs):
        return "[" + ", ".join(f"'{x}'" for x in xs) + "]"

    tokens_sql = f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS INT) AS n_bpe_tokens
        FROM documents
        """
    return {
        "text_tokens": tokens_sql,
        # identical semantics, regex-free physical plan — one oracle
        "text_tokens_fast": tokens_sql,
        "text_quality": f"""
        SELECT doc_id,
               CAST(length(text) AS INT) AS n_chars,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                       {stop_list})) AS INT) AS stopword_hits,
               CAST(CASE WHEN length(text) = 0 THEN 0
                         ELSE floor(1000 * length(regexp_replace(text, '[^a-z]', '', 'g'))
                                    / length(text)) END AS INT) AS alpha_pm,
               CASE WHEN len(string_split(text, ' ')) >= 40
                         AND len(list_intersect(list_distinct(string_split(text, ' ')),
                                                {stop_list})) >= 2 THEN 'high'
                    WHEN len(string_split(text, ' ')) >= 20 THEN 'medium'
                    ELSE 'low' END AS quality_band
        FROM documents
        """,
        "text_langid": f"""
        WITH s AS (
          SELECT doc_id,
            CAST(len(list_intersect(list_distinct(string_split(text,' ')), {mk_list(LANG_MARKERS['en'])})) AS INT) AS en_score,
            CAST(len(list_intersect(list_distinct(string_split(text,' ')), {mk_list(LANG_MARKERS['es'])})) AS INT) AS es_score,
            CAST(len(list_intersect(list_distinct(string_split(text,' ')), {mk_list(LANG_MARKERS['de'])})) AS INT) AS de_score
          FROM documents)
        SELECT doc_id, en_score, es_score, de_score,
               CASE WHEN en_score >= es_score AND en_score >= de_score THEN 'en'
                    WHEN es_score >= de_score THEN 'es'
                    ELSE 'de' END AS pred_lang
        FROM s
        """,
        "text_fingerprint": _FP_SQL,
        # identical math, different physical plan — one oracle serves both
        "text_fingerprint_long": _FP_SQL,
    }
