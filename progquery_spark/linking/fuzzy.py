"""Fuzzy entity linking: MinHash-LSH blocking + exact-Jaccard verification
(SURVEY.md §2.3 closing note — the Spark-native generalization of the
reference's exact-key lookup that the north star adds on top).

Pipeline (all built-in expressions, zero Python UDFs):

  1. shingle   — character k-grams of the entity name (array_distinct)
  2. minhash   — P permutations h_i(x) = (a_i * x + b_i) mod M over a
                 rolling polynomial char hash of the shingle (mod M, the
                 same cross-engine fingerprint the dedup/text ops use —
                 every step is DuckDB-replicable, which is what puts this
                 stage under the driver's value-hash oracle gate);
                 signature = array of per-perm minima
  3. band      — split signature into B bands of 2 rows, band key =
                 v0 * M + v1 (exact integer, < 2^62 — no opaque hash),
                 posexplode -> (band_idx, band_hash) blocking keys
  4. bucket-join — self-join within blocks (same mention_type only),
                 a < b to kill mirror/self pairs
  5. verify    — structure-aware scoring: entity names are compound keys
                 (alpha head + digit id), mirroring the reference's compound
                 fullyQualifiedName keys (owner:name(params) —
                 utils/MethodNameInfo.java:20-32). The digit part is a
                 *strong key* that must agree exactly (a one-digit
                 difference means a different entity, not a typo); the
                 alpha head is scored with normalized Levenshtein
                 similarity (Spark built-in). Names without digits fall
                 back to whole-name edit similarity. Exact shingle Jaccard
                 is also computed and exposed for diagnostics.

Skew controls: blocking buckets are capped (a band-hash shared by > cap
entities is dropped with a metric — hot buckets come from ultra-common
shingle patterns and contribute near-duplicate-noise pairs, not signal);
the self-join is an equi-join on (band_idx, band_hash) so AQE skew
splitting applies to what remains.

Determinism: permutation constants are fixed literals; candidate pairs are
dropDuplicates'd and scored with exact Jaccard, so LSH randomness can only
affect *recall*, never scores — combined with min-key canonicalization in
CC this keeps P/R parity stable (SURVEY.md §7.3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The certified cross-engine hash kernel — constant pool, poly_hash,
# minhash — lives in ONE module (hashing.py, VERDICT r4 #7) so the fuzzy
# linker and the ops dedup/similarity families cannot silently diverge.
# Re-exported names keep this module's public surface unchanged.
from ..hashing import (  # noqa: F401
    _A,
    _B,
    _M,
    band_key_pair,
    minhash_signature,
    poly_hash,
)

# Frozen defaults, shared with the DuckDB oracle generator (oracle.py)
# so the driver's value-hash gate certifies this exact configuration.
K_SHINGLE = 3
NUM_PERM = 16
BANDS = 8
BUCKET_CAP = 200
THRESHOLD = 0.8
# Sub-threshold candidates in [MAY_FLOOR, THRESHOLD) become MAY_REFER_TO
# fan-out instead of merging — the analog of the reference rewriting
# REFERS_TO into a MAY_REFER_TO fan-out across possible targets
# (HierarchyAnalysis.java:93-104).
MAY_FLOOR = 0.6


def shingles(name_col, k: int = 3):
    """Distinct character k-grams (padded so short names still shingle)."""
    padded = F.concat(F.lit("^"), F.lower(name_col), F.lit("$"))
    n = F.greatest(F.length(padded) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substr(padded, i, F.lit(k)))
    )


def candidate_pairs(
    entities: DataFrame,
    name_col: str = "name",
    key_col: str = "norm_key",
    k: int = K_SHINGLE,
    num_perm: int = NUM_PERM,
    bands: int = BANDS,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """LSH-blocked candidate pairs: (key_a, key_b, type) with key_a < key_b."""
    rows_per_band = num_perm // bands
    if rows_per_band != 2:
        raise ValueError(
            "bands must split the signature into 2-row bands "
            "(band key = v0*M + v1 requires exactly two values)"
        )
    sig = (
        entities.select(
            F.col(key_col).alias("key"),
            F.col("mention_type").alias("mtype"),
            F.lower(F.col(name_col)).alias("nm"),
            shingles(F.col(name_col), k).alias("sh"),
        )
        .withColumn("sig", minhash_signature(F.col("sh"), num_perm))
    )
    banded = sig.select(
        "key",
        "mtype",
        "sh",
        "nm",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: band_key_pair(
                    F.element_at(F.col("sig"), b * rows_per_band + 1),
                    F.element_at(F.col("sig"), b * rows_per_band + 2),
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    # hot-bucket cap (count, filter) — a window keeps it to one shuffle
    from pyspark.sql import Window

    w = Window.partitionBy("mtype", "band_idx", "band_hash")
    banded = banded.withColumn("bucket_n", F.count(F.lit(1)).over(w)).filter(
        F.col("bucket_n") <= bucket_cap
    )
    a = banded.select(
        "mtype",
        "band_idx",
        "band_hash",
        F.col("key").alias("key_a"),
        F.col("sh").alias("sh_a"),
        F.col("nm").alias("nm_a"),
    )
    b = banded.select(
        "mtype",
        "band_idx",
        "band_hash",
        F.col("key").alias("key_b"),
        F.col("sh").alias("sh_b"),
        F.col("nm").alias("nm_b"),
    )
    return (
        a.join(b, ["mtype", "band_idx", "band_hash"])
        .filter(F.col("key_a") < F.col("key_b"))
        .select("mtype", "key_a", "key_b", "sh_a", "sh_b", "nm_a", "nm_b")
        .dropDuplicates(["key_a", "key_b"])
    )


def fuzzy_scored_pairs(
    entities: DataFrame,
    name_col: str = "name",
    key_col: str = "norm_key",
    **lsh_kwargs,
) -> DataFrame:
    """LSH candidates with structure-aware scores:
    (key_a, key_b, dig_a, dig_b, edit_sim, jaccard), key_a < key_b.

    Candidate pool = NOT-declared entities only — the trustable-pruning
    rule applied at generation time (reference: statically-bound
    invocations skip the dispatch fan-out entirely,
    ASTAuxiliarStorage.checkIfTrustableInvocation:48-62). A declared key
    has an authoritative definition; fuzzy aliasing exists to resolve
    reference-only surfaces. This is also the scale guard: declared
    orders are digit-only names whose tiny shingle alphabet floods the
    band buckets with candidates that digit-verification then rejects —
    measured 172 s -> ~5 s for the fuzzy stage at sf0.1. Output is
    unchanged (no declared-entity pair can pass the digit strong-key
    rule), and the DuckDB oracle applies the same filter.

    Scoring rule (see module docstring): digit suffixes are a strong key
    that must agree exactly; the alpha residue is scored by normalized
    Levenshtein similarity (names without digits fall back to whole-name
    edit similarity). All signals are Spark built-ins — the whole fuzzy
    layer stays JVM-side.
    """
    if "is_declared" in entities.columns:
        entities = entities.filter(~F.col("is_declared"))
    pairs = candidate_pairs(entities, name_col, key_col, **lsh_kwargs)

    def digits(c):
        return F.regexp_replace(c, "[^0-9]", "")

    def alpha(c):
        return F.regexp_replace(c, "[^a-z]", "")

    return (
        pairs.withColumn("dig_a", digits("nm_a"))
        .withColumn("dig_b", digits("nm_b"))
        .withColumn(
            "head_a",
            F.when(F.col("dig_a") == "", F.col("nm_a")).otherwise(alpha("nm_a")),
        )
        .withColumn(
            "head_b",
            F.when(F.col("dig_b") == "", F.col("nm_b")).otherwise(alpha("nm_b")),
        )
        .withColumn(
            # the lit(1) floor guards the both-heads-empty degenerate case
            # (pure-digit names): 0/0 would raise under ANSI; sim becomes
            # 1.0 there, and the digit-equality filter still decides
            "edit_sim",
            F.lit(1.0)
            - F.levenshtein("head_a", "head_b")
            / F.greatest(F.length("head_a"), F.length("head_b"), F.lit(1)),
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("key_a", "key_b", "dig_a", "dig_b", "edit_sim", "jaccard")
    )


def alias_edges_from_scored(
    scored: DataFrame, threshold: float = THRESHOLD
) -> DataFrame:
    """Accepted pairs (merge into one entity): digits agree, sim >= t."""
    return scored.filter(
        (F.col("dig_a") == F.col("dig_b")) & (F.col("edit_sim") >= threshold)
    ).select(F.col("key_a").alias("src"), F.col("key_b").alias("dst"))


def may_pairs_from_scored(
    scored: DataFrame,
    floor: float = MAY_FLOOR,
    threshold: float = THRESHOLD,
) -> DataFrame:
    """Ambiguous pairs (MAY_REFER_TO fan-out): digits agree, sim in
    [floor, threshold). Too similar to ignore, not similar enough to
    merge — the reference's multi-candidate dispatch analog."""
    return scored.filter(
        (F.col("dig_a") == F.col("dig_b"))
        & (F.col("edit_sim") >= floor)
        & (F.col("edit_sim") < threshold)
    ).select("key_a", "key_b")


def fuzzy_alias_edges(
    entities: DataFrame,
    threshold: float = THRESHOLD,
    name_col: str = "name",
    key_col: str = "norm_key",
    **lsh_kwargs,
) -> DataFrame:
    """norm<->norm alias edges passing structure-aware verification."""
    return alias_edges_from_scored(
        fuzzy_scored_pairs(entities, name_col, key_col, **lsh_kwargs), threshold
    )
