"""Similarity search over the ``embeddings`` table (array<float>, 64-d):
embedding-cosine near-duplicate pairs, brute-force cosine top-k, and an
IVF-bucketed variant as the scale path.

Cross-engine determinism trick: embeddings are quantized to integers
(round(x*1000)) before any arithmetic. Dot products and squared norms are
then *exact* integer sums — associativity-proof, so Spark's fold order and
DuckDB's aggregation order cannot diverge. Cosine enters float land only
through one divide and one sqrt (IEEE-exact in both engines) and is
emitted as an integer (floor(100000*cos)). Integer quantization is also an
honest production technique (int8 vector search), not just an oracle hack.

Scale notes:
- brute-force top-k is O(n*q) — the correct exact baseline (broadcast
  query set x linear candidate scan). At 10^9 vectors the IVF variant is
  the path: a coarse quantizer assigns each vector to the nearest of K
  codebook centroids and search touches only same-bucket candidates.
  The codebook here is a FIXED literal matrix derived from the frozen
  constant pool — deterministic, broadcast as literals (exactly how a
  trained codebook ships to executors), and integer-exact so the DuckDB
  oracle replicates the assignment bit-for-bit. A production deployment
  swaps the literal matrix for pyspark.ml KMeans cluster centers; every
  other line stays identical.
- embedding near-dup is bucket-blocked through the same quantizer
  (candidate pairs share a centroid), not an all-pairs cartesian; recall
  is bounded by the blocking like any IVF search.
- the pair join is an equi-join on the bucket key -> AQE skew splitting
  covers hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..linking.fuzzy import _A, _B
from ..session import register_sf_views

Q_SCALE = 1000  # quantization: int(round(x * 1000))
COS_SCALE = 100000  # cosine emitted as floor(100000 * cos)
NEAR_DUP_COS = 45000  # near-dup threshold (0.45)
TOP_K = 10
N_QUERIES = 10  # vec_id < 10 serve as the query set

# --- IVF coarse quantizer: fixed integer codebook ---------------------------
N_CENTROIDS = 8
DIM = 64


def _centroid_rows() -> list[list[int]]:
    """K x DIM integer codebook in [-7, 7], derived deterministically from
    the frozen LCG constant pool (no data, no RNG — both engines embed the
    same literals)."""
    return [
        [
            ((_A[(7 * k + d) % 32] * (d + 3) + _B[(11 * k + 5 * d) % 32]) % 15) - 7
            for d in range(DIM)
        ]
        for k in range(N_CENTROIDS)
    ]


_CENTS = _centroid_rows()


def _bucket_expr(qcol):
    """Spherical (cosine) coarse assignment: argmax of q . c_k over the
    codebook, ties -> smallest centroid id. Norm-free on purpose — an L2
    argmin against a fixed-scale codebook degenerates to the min-norm
    centroid when data and codebook scales differ (observed: all vectors
    in one bucket); the dot-product direction test cannot collapse. All
    arithmetic is exact int64; the codebook travels as literals (exactly
    how a trained spherical-KMeans codebook ships to executors)."""
    cents = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.array(*[F.lit(v) for v in _CENTS[k]]).alias("c"),
            )
            for k in range(N_CENTROIDS)
        ]
    )

    def _score(ct):
        dot = F.aggregate(
            F.zip_with(qcol, ct.c, lambda x, y: x * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.struct((-dot).alias("score"), ct.k.cast("int").alias("k"))

    return F.array_min(F.transform(cents, _score)).getField("k")


N_PROBE = 2


def _probe_buckets_expr(qcol, n_probe: int = N_PROBE):
    """Top-n_probe nearest buckets (multiprobe IVF): same spherical score,
    best n centroid ids in score order."""
    cents = F.array(
        *[
            F.struct(
                F.lit(k).alias("k"),
                F.array(*[F.lit(v) for v in _CENTS[k]]).alias("c"),
            )
            for k in range(N_CENTROIDS)
        ]
    )

    def _score(ct):
        dot = F.aggregate(
            F.zip_with(qcol, ct.c, lambda x, y: x * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.struct((-dot).alias("score"), ct.k.cast("int").alias("k"))

    ranked = F.array_sort(F.transform(cents, _score))
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s.getField("k"))


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_sf_views(spark, sf_dir)
    q = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * Q_SCALE).cast("long")
    )
    n2 = F.aggregate(
        F.transform(q, lambda v: v * v), F.lit(0).cast("long"), lambda a, b: a + b
    )
    return spark.table("embeddings").select(
        "vec_id", "label", q.alias("q"), n2.alias("n2")
    ).withColumn("bucket", _bucket_expr(F.col("q")))


def _cos_pm(dot_col, n2a_col, n2b_col):
    return F.floor(
        F.lit(float(COS_SCALE)) * dot_col / F.sqrt((n2a_col * n2b_col).cast("double"))
    ).cast("int")


def _pair_cos(a: DataFrame, b: DataFrame, join_on) -> DataFrame:
    """(a x b) pairs with integer cosine; arrays zipped JVM-side."""
    dot = F.aggregate(
        F.zip_with("q_a", "q_b", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, join_on)
        .withColumn("dot", dot)
        .withColumn("cos_pm", _cos_pm(F.col("dot"), F.col("n2_a"), F.col("n2_b")))
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.45), IVF-blocked:
    candidates share a coarse-quantizer bucket (equi-join, AQE-splittable),
    then exact integer cosine verifies. No cartesian anywhere in the plan."""
    v = _vecs(spark, sf_dir)
    a = v.select(
        "bucket", F.col("vec_id").alias("vec_a"),
        F.col("q").alias("q_a"), F.col("n2").alias("n2_a"),
    )
    b = v.select(
        "bucket", F.col("vec_id").alias("vec_b"),
        F.col("q").alias("q_b"), F.col("n2").alias("n2_b"),
    )
    pairs = _pair_cos(a, b, ["bucket"]).filter(F.col("vec_a") < F.col("vec_b"))
    return pairs.filter(F.col("cos_pm") >= NEAR_DUP_COS).select(
        "vec_a", "vec_b", "cos_pm"
    )


def _topk(pairs: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_pm").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rnk").cast("int").alias("rnk"), "cos_pm")
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for the query set (vec_id < N_QUERIES)."""
    v = _vecs(spark, sf_dir)
    qs = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("q_a"), F.col("n2").alias("n2_a")
    )
    cands = v.select(
        F.col("vec_id").alias("neighbor_id"), F.col("q").alias("q_b"), F.col("n2").alias("n2_b")
    )
    pairs = _pair_cos(
        F.broadcast(qs), cands, F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(pairs)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: search only the query's coarse-quantizer bucket
    (nearest-centroid assignment against the literal codebook)."""
    v = _vecs(spark, sf_dir)
    qs = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "bucket",
        F.col("q").alias("q_a"),
        F.col("n2").alias("n2_a"),
    )
    cands = v.select(
        F.col("vec_id").alias("neighbor_id"),
        "bucket",
        F.col("q").alias("q_b"),
        F.col("n2").alias("n2_b"),
    )
    pairs = _pair_cos(F.broadcast(qs), cands, ["bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(pairs)


def q_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe IVF top-k: each query searches its N_PROBE nearest
    buckets — the standard recall lever when the true neighbor falls just
    across a Voronoi boundary. A candidate lives in exactly one bucket,
    so probing n buckets cannot duplicate (query, neighbor) pairs."""
    v = _vecs(spark, sf_dir)
    qs = (
        v.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(_probe_buckets_expr(F.col("q"))).alias("bucket"),
            F.col("q").alias("q_a"),
            F.col("n2").alias("n2_a"),
        )
    )
    cands = v.select(
        F.col("vec_id").alias("neighbor_id"),
        "bucket",
        F.col("q").alias("q_b"),
        F.col("n2").alias("n2_b"),
    )
    pairs = _pair_cos(F.broadcast(qs), cands, ["bucket"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(pairs)


def queries():
    return {
        "dedup_embedding": q_dedup_embedding,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_multiprobe": q_ann_ivf_multiprobe,
    }


def _cent_values() -> str:
    return ", ".join(
        f"({k}, {d + 1}, {v})"
        for k, row in enumerate(_CENTS)
        for d, v in enumerate(row)
    )


_QVEC_CTE = f"""
qv AS (SELECT vec_id, label,
              list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT)) AS q
       FROM embeddings),
ex AS (SELECT vec_id, label, unnest(q) AS qe, generate_subscripts(q, 1) AS pos FROM qv),
nrm AS (SELECT vec_id, SUM(qe * qe) AS n2 FROM ex GROUP BY vec_id),
cent(k, pos, val) AS (VALUES {_cent_values()}),
cdot AS (SELECT e.vec_id, c.k, SUM(e.qe * c.val) AS dot
         FROM ex e JOIN cent c ON c.pos = e.pos GROUP BY e.vec_id, c.k),
assign AS (
  SELECT vec_id, CAST(k AS INT) AS bucket FROM (
    SELECT vec_id, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY -dot, k) AS rn
    FROM cdot) WHERE rn = 1)
"""


def _cos_sql(dot, n2a, n2b):
    return f"CAST(floor({float(COS_SCALE)} * {dot} / sqrt(CAST({n2a} * {n2b} AS DOUBLE))) AS INT)"


def oracles():
    return {
        "dedup_embedding": f"""
        WITH {_QVEC_CTE},
        dots AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.qe * b.qe) AS dot
          FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id < b.vec_id
          JOIN assign aa ON aa.vec_id = a.vec_id
          JOIN assign ab ON ab.vec_id = b.vec_id AND ab.bucket = aa.bucket
          GROUP BY a.vec_id, b.vec_id)
        SELECT vec_a, vec_b, {_cos_sql('dot', 'na.n2', 'nb.n2')} AS cos_pm
        FROM dots JOIN nrm na ON na.vec_id = vec_a JOIN nrm nb ON nb.vec_id = vec_b
        WHERE {_cos_sql('dot', 'na.n2', 'nb.n2')} >= {NEAR_DUP_COS}
        """,
        "ann_topk": f"""
        WITH {_QVEC_CTE},
        dots AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.qe * b.qe) AS dot
          FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id <> b.vec_id
          WHERE a.vec_id < {N_QUERIES}
          GROUP BY a.vec_id, b.vec_id),
        scored AS (
          SELECT query_id, neighbor_id,
                 {_cos_sql('dot', 'na.n2', 'nb.n2')} AS cos_pm
          FROM dots JOIN nrm na ON na.vec_id = query_id
                    JOIN nrm nb ON nb.vec_id = neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos_pm,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos_pm DESC, neighbor_id ASC) AS INT) AS rnk
          FROM scored)
        SELECT query_id, neighbor_id, rnk, cos_pm FROM ranked WHERE rnk <= {TOP_K}
        """,
        "ann_ivf_multiprobe": f"""
        WITH {_QVEC_CTE},
        probe AS (
          SELECT vec_id, CAST(k AS INT) AS bucket FROM (
            SELECT vec_id, k,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY -dot, k) AS rn
            FROM cdot WHERE vec_id < {N_QUERIES})
          WHERE rn <= {N_PROBE}),
        dots AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.qe * b.qe) AS dot
          FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id <> b.vec_id
          JOIN probe p ON p.vec_id = a.vec_id
          JOIN assign ab ON ab.vec_id = b.vec_id AND ab.bucket = p.bucket
          GROUP BY a.vec_id, b.vec_id),
        scored AS (
          SELECT query_id, neighbor_id,
                 {_cos_sql('dot', 'na.n2', 'nb.n2')} AS cos_pm
          FROM dots JOIN nrm na ON na.vec_id = query_id
                    JOIN nrm nb ON nb.vec_id = neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos_pm,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos_pm DESC, neighbor_id ASC) AS INT) AS rnk
          FROM scored)
        SELECT query_id, neighbor_id, rnk, cos_pm FROM ranked WHERE rnk <= {TOP_K}
        """,
        "ann_ivf": f"""
        WITH {_QVEC_CTE},
        dots AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, SUM(a.qe * b.qe) AS dot
          FROM ex a JOIN ex b ON a.pos = b.pos AND a.vec_id <> b.vec_id
          JOIN assign aa ON aa.vec_id = a.vec_id
          JOIN assign ab ON ab.vec_id = b.vec_id AND ab.bucket = aa.bucket
          WHERE a.vec_id < {N_QUERIES}
          GROUP BY a.vec_id, b.vec_id),
        scored AS (
          SELECT query_id, neighbor_id,
                 {_cos_sql('dot', 'na.n2', 'nb.n2')} AS cos_pm
          FROM dots JOIN nrm na ON na.vec_id = query_id
                    JOIN nrm nb ON nb.vec_id = neighbor_id),
        ranked AS (
          SELECT query_id, neighbor_id, cos_pm,
                 CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cos_pm DESC, neighbor_id ASC) AS INT) AS rnk
          FROM scored)
        SELECT query_id, neighbor_id, rnk, cos_pm FROM ranked WHERE rnk <= {TOP_K}
        """,
    }
