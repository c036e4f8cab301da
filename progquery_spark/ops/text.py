"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in expressions (JVM-side, whole-stage codegen); every query
has an exact DuckDB oracle. Ratios are emitted as integer per-mille
(floor(1000*a/b)) so cross-engine float formatting can never flake the
value hash.
"""

from __future__ import annotations

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


def queries():
    return {
        "text_tokens": q_text_tokens,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
    }


def oracles():
    stop_list = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

    def mk_list(xs):
        return "[" + ", ".join(f"'{x}'" for x in xs) + "]"

    return {
        "text_tokens": f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{BPE_PAT}')) AS INT) AS n_bpe_tokens
        FROM documents
        """,
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
        "text_fingerprint": f"""
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(text) + 1),
                                  i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
                 (acc, c) -> (acc * 131 + c) % {_M}) AS fp
        FROM documents
        """,
    }
