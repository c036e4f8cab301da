"""Deduplication operators over ``documents``: exact, n-gram Jaccard,
MinHash+LSH, SimHash. (Embedding-cosine near-dup lives in similarity.py
next to the ANN operators.)

Shared discipline: token 2-gram shingles; gram ids are the rolling
polynomial hash h <- (h*131 + charcode) mod 2^31-1 computed inline per gram
(cross-engine deterministic, embarrassingly parallel — no vocabulary table,
no global sort, no join); all downstream hash arithmetic is (a*x+b) mod
2^31-1 with the frozen constants shared with linking.fuzzy, so the DuckDB
oracles replicate the *algorithm* exactly — LSH recall quirks and all —
and value-hash parity is bit-exact.

Scale notes (100 TB story):
- exact dedup: one shuffle on a 64-bit content hash; keeper = min id.
- n-gram Jaccard: inverted-index self-join; pairs bounded by shared-gram
  postings. Hot grams are the skew axis -> postings capped upstream by the
  LSH variant; brute force is the small-scale oracle of record.
- MinHash LSH: candidates only from band buckets (O(n * bands) rows);
  verification joins only candidate pairs to the gram index. This is the
  scale path; banding keys are pre-hashed so AQE can split skewed buckets.
- SimHash: one 64->32-bit signature per doc, near-dup = hamming <= t over
  byte-band buckets; cheapest of the family, one narrow table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hashing import _A, _B, _M, band_key_pair, perm_hash, poly_hash
from ..session import register_sf_views

N_PERM = 16  # minhash permutations
N_BANDS = 8  # 8 bands x 2 rows
N_BITS = 32  # simhash planes
JAC_PM = 500  # jaccard threshold (per-mille)
HAM_MAX = 4  # simhash hamming threshold
POSTING_CAP = 100  # grams in more docs than this generate no candidate pairs
# LSH band buckets larger than this generate no candidate pairs — the
# O(k^2) bound on the band-bucket self-join (same discipline as
# linking.fuzzy.BUCKET_CAP): a degenerate band key (boilerplate-heavy
# corpora — exactly the near-duplicate-rich inputs dedup exists for)
# otherwise owns a quadratic blow-up no AQE skew split can bound.
# Dropped buckets are observable via lsh_dropped_buckets(); the DuckDB
# oracle replicates the cap so the gate certifies the shipped semantics.
BUCKET_CAP = 200

# simhash planes use the tail of the constant pool, decorrelated from the
# minhash perms which use the head
_SA = list(reversed(_A))
_SB = list(reversed(_B))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sf_views(spark, sf_dir)
    return spark.table("documents")


# --------------------------------------------------------------------------
# shared gram/vocab plumbing (Spark side)
# --------------------------------------------------------------------------
def _grams(docs: DataFrame) -> DataFrame:
    """(doc_id, g): distinct token 2-grams per document.

    A document with fewer than two tokens has NO 2-grams (it simply
    never enters the pair ops — matching the DuckDB oracle, whose
    ``range(1, len(ts))`` is empty then). The explicit guard matters:
    ``F.sequence(1, 0)`` is a DESCENDING [1, 0] in Spark, so without it
    every single-token or empty document crashed the whole dedup family
    with INVALID_ARRAY_INDEX_IN_ELEMENT_AT (regression-tested)."""
    ts = F.split("text", " ")
    gram_arr = F.when(
        F.size(ts) >= 2,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(ts) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(ts, i), F.element_at(ts, i + 1)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode(gram_arr).alias("g"))


def _doc_gids(docs: DataFrame) -> DataFrame:
    """(doc_id, gid): per-document distinct gram set, hashed inline.

    Grams are string-distinct per document before hashing; a duplicate gid
    within one document therefore requires a 31-bit collision, which both
    engines reproduce identically — so no dedup shuffle is spent on it.
    No vocabulary table exists at all: the id assignment is per-row
    arithmetic that scales embarrassingly (the previous ROW_NUMBER design
    funneled the distinct-gram set through one partition)."""
    return _grams(docs).select("doc_id", poly_hash(F.col("g")).alias("gid"))


def _pair_jaccard_pm(pairs: DataFrame, dg: DataFrame) -> DataFrame:
    """Attach integer per-mille Jaccard to candidate (doc_a, doc_b) pairs.

    ``dg`` is first semi-joined down to documents that actually appear in
    a candidate pair: verification touches O(pairs) documents, not the
    corpus, so the full gram index (corpus-cardinality) must not be
    shuffled for it. Per-document values (sizes, gram sets) are unchanged
    by whole-document filtering, so results are identical — but at 2M
    docs / 100k candidate pairs this turns two ~80M-row shuffles into
    ~8M-row ones behind a broadcast semi-join.

    The pair set feeds THREE consumers (the semi-join filter and both
    verify sides) but is NOT checkpointed: every ``pairs`` lineage ends in
    a shuffle (the candidates' ``distinct``), so Spark's ReusedExchange
    dedupes the subtree across all three references — measured at 2M docs
    a localCheckpoint here was wall-neutral (103.8 vs 106.8 s) while
    adding a materialization barrier and ~0.5 s of gate-scale latency."""
    in_pairs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    dg = dg.join(in_pairs, "doc_id", "left_semi")
    sizes = dg.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = dg.select(F.col("doc_id").alias("doc_a"), "gid")
    b = dg.select(F.col("doc_id").alias("_db"), F.col("gid").alias("gid_b"))
    inter = (
        pairs.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("_db")) & (F.col("gid") == F.col("gid_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("CAST(1000 * i DIV (na + nb - i) AS INT)").alias("jac_pm"),
        )
    )


# --------------------------------------------------------------------------
# 1. exact dedup
# --------------------------------------------------------------------------
def dedup_exact_frame(docs: DataFrame) -> DataFrame:
    """Exact dedup by content hash over ANY (doc_id, text) frame; keeper =
    min doc_id per content group. Pure — no fixture synthesis inside the
    operator (VERDICT r3 #5); the gated entry feeds it the deterministic
    duplicate-bearing view from datagen.

    The shuffle key is ``xxhash64(text)`` — full document bodies never
    travel as a partition key, and the window input is the narrow
    (doc_id, h) projection. The DuckDB oracle partitions by ``text``
    directly: identical grouping modulo 64-bit hash collisions (none at
    any test SF; a production run would verify within-group equality)."""
    full = docs.select("doc_id", F.xxhash64("text").alias("h"))
    keeper = Window.partitionBy("h")
    return full.select(
        "doc_id",
        F.min("doc_id").over(keeper).alias("keeper_id"),
    ).withColumn("is_dup", F.col("doc_id") != F.col("keeper_id"))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gated entry: exact dedup over the duplicate-bearing documents view
    (datagen.documents_with_dups_select — the testdata itself has no exact
    dups, so the clones come from the shared cross-engine synthesis, not
    from inside the operator)."""
    from ..datagen import build_documents_with_dups

    return dedup_exact_frame(build_documents_with_dups(spark, sf_dir))


# --------------------------------------------------------------------------
# 2. n-gram Jaccard (brute force via inverted index)
# --------------------------------------------------------------------------
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index candidate pairs + exact Jaccard verify.

    Pair generation only touches RARE grams (doc frequency <=
    POSTING_CAP): a gram shared by k docs contributes O(k^2) candidate
    rows, so the hottest grams — stopword-like n-grams at corpus scale —
    are the quadratic skew axis. Capping postings bounds the self-join
    fan-out; verification still scores the FULL gram sets, so only pairs
    whose every shared gram is ultra-common can be missed (and the
    DuckDB oracle replicates the cap, so the gate certifies exactly the
    shipped semantics)."""
    dg = _doc_gids(_docs(spark, sf_dir))
    rare = (
        dg.groupBy("gid")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") <= POSTING_CAP)
        .select("gid")
    )
    dgr = dg.join(rare, "gid")
    a = dgr.select(F.col("doc_id").alias("doc_a"), "gid")
    b = dgr.select(F.col("doc_id").alias("doc_b"), "gid")
    pairs = (
        a.join(b, "gid")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _pair_jaccard_pm(pairs, dg).filter(F.col("jac_pm") >= JAC_PM)


# --------------------------------------------------------------------------
# 3. MinHash + LSH
# --------------------------------------------------------------------------
def _lsh_buckets(dg: DataFrame) -> DataFrame:
    """(doc_id, band, band_key, bucket_n): per-doc band keys with bucket
    sizes attached (one window over the banding shuffle).

    All 16 permutation minima are computed as codegen'd min columns on
    the (doc_id, gid) rows directly — the same no-explode discipline as
    ``_simhash``: the previous perm-explode materialized a 16x row
    blow-up of the gram index through two aggregation shuffles; this is
    ONE map-side-combinable shuffle keyed by doc_id, after which banding
    is an 8-wide explode of one row per document (corpus-cardinality,
    not gram-cardinality)."""
    sig = dg.groupBy("doc_id").agg(
        *[
            F.min(perm_hash(F.col("gid"), i)).alias(f"v{i}")
            for i in range(N_PERM)
        ]
    )
    rows_per_band = N_PERM // N_BANDS
    buckets = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        band_key_pair(
                            F.col(f"v{rows_per_band * k}"),
                            F.col(f"v{rows_per_band * k + 1}"),
                        ).alias("band_key"),
                    )
                    for k in range(N_BANDS)
                ]
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.band").alias("band"), F.col("p.band_key").alias("band_key"))
    w = Window.partitionBy("band", "band_key")
    return buckets.withColumn("bucket_n", F.count(F.lit(1)).over(w))


def lsh_dropped_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the bucket cap: (band, band_key, bucket_n) of the
    band buckets whose pairs were skipped (bucket_n > BUCKET_CAP)."""
    b = _lsh_buckets(_doc_gids(_docs(spark, sf_dir)))
    return (
        b.filter(F.col("bucket_n") > BUCKET_CAP)
        .select("band", "band_key", "bucket_n")
        .distinct()
    )


def q_dedup_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-bucket distribution audit: (n_buckets, n_dropped, max_bucket)
    — one row certifying that both engines agree on the full banding
    distribution AND on which buckets the BUCKET_CAP drops (the skew
    guard is part of the certified semantics, not a Spark-side detail)."""
    b = (
        _lsh_buckets(_doc_gids(_docs(spark, sf_dir)))
        .select("band", "band_key", "bucket_n")
        .distinct()
    )
    return b.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("bucket_n") > BUCKET_CAP).cast("long")).alias("n_dropped"),
        F.max("bucket_n").alias("max_bucket"),
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    dg = _doc_gids(_docs(spark, sf_dir))
    # signature: min (a*gid+b) % M per perm — explode perms against the
    # gram index (map-side combinable aggregation, no arrays held per doc);
    # band buckets over BUCKET_CAP docs generate no pairs (quadratic bound)
    buckets = _lsh_buckets(dg).filter(F.col("bucket_n") <= BUCKET_CAP)
    a = buckets.select("band", "band_key", F.col("doc_id").alias("doc_a"))
    b = buckets.select("band", "band_key", F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _pair_jaccard_pm(cand, dg).filter(F.col("jac_pm") >= JAC_PM)


# --------------------------------------------------------------------------
# 4. SimHash
# --------------------------------------------------------------------------
def _simhash(dg: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit simhash over the gram-id set.

    All 32 plane-parity contributions (+-1) are evaluated as 32 codegen'd
    sum columns on the (doc_id, gid) rows directly — no 32x plane explode,
    and ONE map-side-combinable shuffle keyed by doc_id instead of two.
    (The exploded two-shuffle form materialized ~2.5B intermediate rows at
    2M docs and scaled 4->16 at only 0.597 — pure DRAM traffic; the same
    math in registers is what survives a 100x corpus.)"""
    sums = dg.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.pmod(
                        F.lit(_SA[j]) * F.col("gid") + F.lit(_SB[j]), F.lit(_M)
                    )
                    % 2
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"t{j}")
            for j in range(N_BITS)
        ]
    )
    simhash = F.lit(0).cast("long")
    for j in range(N_BITS):
        simhash = simhash + F.when(
            F.col(f"t{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", simhash.alias("simhash"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment — the operator a dedup pipeline
    actually ships: verified MinHash-LSH pairs -> connected components
    (the same min-label CC the KG canonicalization uses) -> every doc
    mapped to its cluster keeper (min doc_id), singletons to themselves.

    Doc ids ride through CC as zero-padded strings so lexicographic
    min == numeric min; the DuckDB oracle computes the closure with a
    recursive CTE (near-dup components are tiny stars/chains)."""
    from ..canonicalize.cc import connected_components

    pairs = q_dedup_minhash_lsh(spark, sf_dir)
    pad = lambda c: F.format_string("%012d", F.col(c))  # noqa: E731
    labels, _ = connected_components(
        pairs.select(pad("doc_a").alias("src"), pad("doc_b").alias("dst"))
    )
    lab = labels.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("keeper_id"),
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .join(lab, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("keeper_id", "doc_id").alias("keeper_id"),
        )
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper_id"))
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash(_doc_gids(_docs(spark, sf_dir)))


def q_dedup_simhash_pairs(
    spark: SparkSession, sf_dir: str, *, band_bits: int = 8
) -> DataFrame:
    """Near-dup pairs: candidates from (32/band_bits) x band_bits-bit band
    buckets, verified by hamming(simhash_a, simhash_b) <= HAM_MAX.

    ``band_bits`` is the scale knob: 8-bit bands give only 256 keys, so
    the average bucket is n/256 and the band self-join saturates near
    ~50k docs; 16-bit bands (65,536 keys) hold it at corpus scale. Wider
    bands only shrink buckets — a 16-bit band match implies both its
    8-bit halves match, so pairs(16) is a subset of pairs(8) (recall
    trades exactly like MinHash banding). Buckets over BUCKET_CAP
    generate no pairs (the same O(k^2) bound as the MinHash band join,
    replicated by the oracle)."""
    n_bands = 32 // band_bits
    mod = 1 << band_bits
    sh = _simhash(_doc_gids(_docs(spark, sf_dir)))
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    F.expr(f"(simhash DIV {mod ** k}) % {mod}").alias("bv"),
                )
                for k in range(n_bands)
            ])
        ).alias("p"),
    ).select("doc_id", "simhash", F.col("p.band").alias("band"), F.col("p.bv").alias("bv"))
    wb = Window.partitionBy("band", "bv")
    banded = banded.withColumn("bucket_n", F.count(F.lit(1)).over(wb)).filter(
        F.col("bucket_n") <= BUCKET_CAP
    )
    a = banded.select("band", "bv", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = banded.select("band", "bv", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("sh_a ^ sh_b")).cast("int"))
        .filter(F.col("hamming") <= HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------------------
# 4b. 64-bit SimHash — the >=10M-doc scale path
# --------------------------------------------------------------------------
# The 32-bit signature saturates its byte-banding near ~10M docs (measured:
# at 8M docs / band_bits=16 the average band bucket is ~122 and verified
# hamming<=3 pairs grow superlinearly, BENCH/BASELINE.md). 64 planes give
# band_bits=16 FOUR bands of 65,536 keys; hamming threshold scales 4 -> 8.
# Planes extend the frozen 32-pair pool by the same recipe — a seeded PRNG
# producing field constants — generated in ONE shared Python function so
# the DuckDB oracle replays the exact geometry.
N_BITS64 = 64
HAM64_MAX = 8


def _plane_pairs64() -> list[tuple[int, int]]:
    import random

    rng = random.Random(0x51AE64)
    return [
        (rng.randrange(1, _M), rng.randrange(0, _M)) for _ in range(N_BITS64)
    ]


def _simhash64(dg: DataFrame) -> DataFrame:
    """(doc_id, simhash64): same no-explode sum-column form as
    ``_simhash``; the signature packs via bitwise OR of shifted bits
    (bit 63 as an addend would overflow a signed long under ANSI)."""
    pairs = _plane_pairs64()
    sums = dg.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.pmod(F.lit(a) * F.col("gid") + F.lit(b), F.lit(_M)) % 2
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"t{j}")
            for j, (a, b) in enumerate(pairs)
        ]
    )
    sig = F.lit(0).cast("long")
    for j in range(N_BITS64):
        sig = sig.bitwiseOR(
            F.when(
                F.col(f"t{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long"))
        )
    return sums.select("doc_id", sig.alias("simhash64"))


def q_dedup_simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash64(_doc_gids(_docs(spark, sf_dir)))


def q_dedup_simhash64_pairs(
    spark: SparkSession, sf_dir: str, *, band_bits: int = 16
) -> DataFrame:
    """Near-dup pairs over the 64-bit signature: (64/band_bits) band
    buckets (capped), hamming(sig_a, sig_b) <= HAM64_MAX verify. Band
    values extract as an arithmetic shift + mask — identical on signed
    64-bit in both engines, including the sign-carrying top band."""
    n_bands = N_BITS64 // band_bits
    mask = (1 << band_bits) - 1
    sh = _simhash64(_doc_gids(_docs(spark, sf_dir)))
    banded = sh.select(
        "doc_id",
        "simhash64",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    F.shiftright("simhash64", band_bits * k)
                    .bitwiseAND(F.lit(mask).cast("long"))
                    .alias("bv"),
                )
                for k in range(n_bands)
            ])
        ).alias("p"),
    ).select(
        "doc_id", "simhash64", F.col("p.band").alias("band"), F.col("p.bv").alias("bv")
    )
    wb = Window.partitionBy("band", "bv")
    banded = banded.withColumn("bucket_n", F.count(F.lit(1)).over(wb)).filter(
        F.col("bucket_n") <= BUCKET_CAP
    )
    a = banded.select(
        "band", "bv", F.col("doc_id").alias("doc_a"), F.col("simhash64").alias("sh_a")
    )
    b = banded.select(
        "band", "bv", F.col("doc_id").alias("doc_b"), F.col("simhash64").alias("sh_b")
    )
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= HAM64_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


def queries():
    return {
        "dedup_lsh_bucket_stats": q_dedup_lsh_bucket_stats,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_simhash_pairs_b16": lambda spark, sf_dir: q_dedup_simhash_pairs(
            spark, sf_dir, band_bits=16
        ),
        "dedup_simhash64": q_dedup_simhash64,
        "dedup_simhash64_pairs": q_dedup_simhash64_pairs,
    }


# --------------------------------------------------------------------------
# DuckDB oracles — replicate the algorithms step for step
# --------------------------------------------------------------------------
def _sig64_ctes() -> str:
    """64-bit simhash replica: the SAME seeded plane pairs as
    ``_simhash64`` (shared ``_plane_pairs64``), bit_or-packed. DuckDB
    overflow-checks ``1::BIGINT << 63``, so the sign bit is the min-long
    literal; arithmetic shift + mask band extraction was verified to
    match Spark's shiftright/bitwiseAND on the sign-carrying top band."""
    vals = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(_plane_pairs64())
    )
    min_long = "(CAST(-9223372036854775807 AS BIGINT) - 1)"
    return f"""{_GRAM_CTES},
planes64(j, a, b) AS (VALUES {vals}),
bits64 AS (
  SELECT doc_id, p.j,
         SUM(CASE WHEN (p.a * dg.gid + p.b) % {_M} % 2 = 1
                  THEN 1 ELSE -1 END) AS t
  FROM dg CROSS JOIN planes64 p GROUP BY doc_id, p.j),
sig64 AS (
  SELECT doc_id,
         bit_or(CASE WHEN t <= 0 THEN CAST(0 AS BIGINT)
                     WHEN j = 63 THEN {min_long}
                     ELSE CAST(1 AS BIGINT) << j END) AS simhash64
  FROM bits64 GROUP BY doc_id)"""


_GRAM_CTES = f"""
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, len(ts)),
                          i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1]))) AS g
  FROM toks),
dg AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(g) + 1),
                            i -> CAST(ascii(substr(g, CAST(i AS INT), 1)) AS BIGINT))),
           (acc, c) -> (acc * 131 + c) % {_M}) AS gid
  FROM grams),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY doc_id)
"""


def _perm_values(n, A, B, with_pw=False):
    rows = []
    for i in range(n):
        pw = f", {1 << i}" if with_pw else ""
        rows.append(f"({i}, {A[i]}, {B[i]}{pw})")
    return ", ".join(rows)


def _jaccard_select(pairs_cte: str) -> str:
    return f"""
    inter AS (
      SELECT p.doc_a, p.doc_b, COUNT(*) AS i
      FROM {pairs_cte} p
      JOIN dg a ON a.doc_id = p.doc_a
      JOIN dg b ON b.doc_id = p.doc_b AND b.gid = a.gid
      GROUP BY p.doc_a, p.doc_b)
    SELECT i.doc_a, i.doc_b,
           CAST((1000 * i.i) // (sa.n + sb.n - i.i) AS INT) AS jac_pm
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE (1000 * i.i) // (sa.n + sb.n - i.i) >= {JAC_PM}
    """


def _minhash_ctes() -> str:
    """perms -> signatures -> band keys -> capped buckets -> candidate
    pairs (CTE chain shared by the LSH oracle and the clusters oracle).
    The BUCKET_CAP filter mirrors _lsh_buckets exactly."""
    rows_per_band = N_PERM // N_BANDS
    return f"""
        perms(i, a, b) AS (VALUES {_perm_values(N_PERM, _A, _B)}),
        sig AS (
          SELECT doc_id, p.i, MIN((p.a * dg.gid + p.b) % {_M}) AS v
          FROM dg CROSS JOIN perms p GROUP BY doc_id, p.i),
        buckets0 AS (
          SELECT doc_id, i // {rows_per_band} AS band,
                 MAX(CASE WHEN i % 2 = 0 THEN v END) * {_M}
                   + MAX(CASE WHEN i % 2 = 1 THEN v END) AS band_key
          FROM sig GROUP BY doc_id, i // {rows_per_band}),
        buckets AS (
          SELECT doc_id, band, band_key FROM (
            SELECT doc_id, band, band_key,
                   COUNT(*) OVER (PARTITION BY band, band_key) AS bucket_n
            FROM buckets0)
          WHERE bucket_n <= {BUCKET_CAP}),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM buckets a JOIN buckets b
            ON a.band = b.band AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id)
    """


def _simhash_pairs_sql(band_bits: int) -> str:
    """Simhash band-pair oracle at a given band width — mirrors
    q_dedup_simhash_pairs(band_bits=...) incl. the bucket cap."""
    n_bands = 32 // band_bits
    mod = 1 << band_bits
    bands = ", ".join(f"({k})" for k in range(n_bands))
    return f"""
        WITH {_GRAM_CTES},
        planes(j, a, b, pw) AS (VALUES {_perm_values(N_BITS, _SA, _SB, with_pw=True)}),
        bits AS (
          SELECT doc_id, p.j, p.pw,
                 SUM(CASE WHEN (p.a * dg.gid + p.b) % {_M} % 2 = 1
                          THEN 1 ELSE -1 END) AS t
          FROM dg CROSS JOIN planes p GROUP BY doc_id, p.j, p.pw),
        sh AS (
          SELECT doc_id,
                 CAST(SUM(CASE WHEN t > 0 THEN pw ELSE 0 END) AS BIGINT) AS simhash
          FROM bits GROUP BY doc_id),
        banded0 AS (
          SELECT doc_id, simhash, k.band,
                 (simhash // CAST(power({mod}, k.band) AS BIGINT)) % {mod} AS bv
          FROM sh CROSS JOIN (VALUES {bands}) k(band)),
        banded AS (
          SELECT doc_id, simhash, band, bv FROM (
            SELECT doc_id, simhash, band, bv,
                   COUNT(*) OVER (PARTITION BY band, bv) AS bucket_n
            FROM banded0)
          WHERE bucket_n <= {BUCKET_CAP}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.simhash AS sh_a, b.simhash AS sh_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
        FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {HAM_MAX}
        """


def _dedup_exact_sql() -> str:
    """Oracle over the SAME datagen synthesis the Spark entry reads."""
    from ..datagen import documents_with_dups_select

    return f"""
        WITH dupful AS ({documents_with_dups_select()})
        SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY text) AS keeper_id,
               doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_dup
        FROM dupful
        """


def oracles():
    return {
        "dedup_lsh_bucket_stats": f"""
        WITH {_GRAM_CTES},
        perms(i, a, b) AS (VALUES {_perm_values(N_PERM, _A, _B)}),
        sig AS (
          SELECT doc_id, p.i, MIN((p.a * dg.gid + p.b) % {_M}) AS v
          FROM dg CROSS JOIN perms p GROUP BY doc_id, p.i),
        buckets0 AS (
          SELECT doc_id, i // {N_PERM // N_BANDS} AS band,
                 MAX(CASE WHEN i % 2 = 0 THEN v END) * {_M}
                   + MAX(CASE WHEN i % 2 = 1 THEN v END) AS band_key
          FROM sig GROUP BY doc_id, i // {N_PERM // N_BANDS}),
        bstats AS (
          SELECT band, band_key, COUNT(*) AS bucket_n
          FROM buckets0 GROUP BY band, band_key)
        SELECT COUNT(*) AS n_buckets,
               CAST(SUM(CASE WHEN bucket_n > {BUCKET_CAP} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               MAX(bucket_n) AS max_bucket
        FROM bstats
        """,
        "dedup_exact": _dedup_exact_sql(),
        "dedup_ngram_jaccard": f"""
        WITH {_GRAM_CTES},
        rare AS (SELECT gid FROM dg GROUP BY gid HAVING COUNT(*) <= {POSTING_CAP}),
        dgr AS (SELECT dg.doc_id, dg.gid FROM dg JOIN rare USING (gid)),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM dgr a JOIN dgr b ON a.gid = b.gid AND a.doc_id < b.doc_id),
        {_jaccard_select('pairs')}
        """,
        "dedup_minhash_lsh": f"""
        WITH {_GRAM_CTES},
        {_minhash_ctes()},
        {_jaccard_select('pairs')}
        """,
        "dedup_clusters": f"""
        WITH RECURSIVE {_GRAM_CTES},
        {_minhash_ctes()},
        inter AS (
          SELECT p.doc_a, p.doc_b, COUNT(*) AS i
          FROM pairs p
          JOIN dg a ON a.doc_id = p.doc_a
          JOIN dg b ON b.doc_id = p.doc_b AND b.gid = a.gid
          GROUP BY p.doc_a, p.doc_b),
        dup AS (
          SELECT i.doc_a, i.doc_b FROM inter i
          JOIN sizes sa ON sa.doc_id = i.doc_a
          JOIN sizes sb ON sb.doc_id = i.doc_b
          WHERE (1000 * i.i) // (sa.n + sb.n - i.i) >= {JAC_PM}),
        und AS (SELECT doc_a AS a, doc_b AS b FROM dup
                UNION SELECT doc_b, doc_a FROM dup),
        reach AS (
          SELECT a AS d, a AS r FROM (SELECT DISTINCT a FROM und)
          UNION
          SELECT re.d, u.b FROM reach re JOIN und u ON u.a = re.r),
        cmap AS (SELECT d AS doc_id, MIN(r) AS keeper FROM reach GROUP BY d)
        SELECT doc.doc_id,
               COALESCE(c.keeper, doc.doc_id) AS keeper_id,
               COALESCE(c.keeper, doc.doc_id) <> doc.doc_id AS is_dup
        FROM documents doc LEFT JOIN cmap c ON c.doc_id = doc.doc_id
        """,
        "dedup_simhash": f"""
        WITH {_GRAM_CTES},
        planes(j, a, b, pw) AS (VALUES {_perm_values(N_BITS, _SA, _SB, with_pw=True)}),
        bits AS (
          SELECT doc_id, p.j, p.pw,
                 SUM(CASE WHEN (p.a * dg.gid + p.b) % {_M} % 2 = 1
                          THEN 1 ELSE -1 END) AS t
          FROM dg CROSS JOIN planes p GROUP BY doc_id, p.j, p.pw)
        SELECT doc_id,
               CAST(SUM(CASE WHEN t > 0 THEN pw ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id
        """,
        "dedup_simhash_pairs": _simhash_pairs_sql(band_bits=8),
        "dedup_simhash_pairs_b16": _simhash_pairs_sql(band_bits=16),
        "dedup_simhash64": f"""
        WITH {_sig64_ctes()}
        SELECT doc_id, simhash64 FROM sig64
        """,
        "dedup_simhash64_pairs": f"""
        WITH {_sig64_ctes()},
        b64 AS (
          SELECT s.doc_id, s.simhash64, k.band,
                 (s.simhash64 >> (16 * k.band)) & 65535 AS bv
          FROM sig64 s CROSS JOIN (VALUES (0), (1), (2), (3)) k(band)),
        bsz AS (SELECT band, bv, COUNT(*) AS bucket_n FROM b64 GROUP BY band, bv),
        keep AS (SELECT b.* FROM b64 b JOIN bsz s ON s.band = b.band AND s.bv = b.bv
                 WHERE s.bucket_n <= {BUCKET_CAP})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash64, b.simhash64)) AS INT) AS hamming
        FROM keep a JOIN keep b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash64, b.simhash64)) <= {HAM64_MAX}
        """,
    }
