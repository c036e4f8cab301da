"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so actual decoding is STUBBED
(``decode_image`` raises NotImplementedError; ``fake_features`` is the
deterministic stand-in) — but everything Spark-side is real and tested:
the binary column construction, the metadata struct schema, the
mapInPandas UDF signature and batch shape, and the partitioning story.
Swapping the stub for PIL/torchaudio changes one function body.

The payloads here are UTF-8 document bytes (the only binary source in the
testdata), which conveniently makes the fake feature extraction
oracle-checkable byte for byte in DuckDB.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..session import register_sf_views

_M = (1 << 31) - 1

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("head_byte", IntegerType(), False),
        StructField("byte_sum_pm", LongType(), False),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Real decode hook — not available in this container."""
    raise NotImplementedError(
        "image/audio decoding requires PIL/torchaudio; wire them in here. "
        "The Spark-side plumbing (binary column, metadata struct, "
        "mapInPandas batching) is exercised via fake_features()."
    )


def fake_features(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for decode+feature-extract: byte length,
    first byte, byte-sum mod 2^31-1 — vectorized over the Arrow batch.

    All per-byte work happens on ONE concatenated numpy view of the
    batch's payload bytes (`np.frombuffer` + prefix-sum segment reduce);
    the only per-row Python is the O(1) `len()` needed to build segment
    offsets."""
    payloads = batch["payload"]
    n = len(payloads)
    lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    head = np.full(n, -1, dtype=np.int32)
    nz = lens > 0
    head[nz] = buf[starts[nz]]
    # segment sums via prefix sums: exact, handles empty payloads, no
    # per-segment Python (np.add.reduceat mishandles zero-length segments)
    csum = np.concatenate([[0], np.cumsum(buf, dtype=np.int64)])
    byte_sum = (csum[ends] - csum[starts]) % _M
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(),
            "n_bytes": lens.astype("int32"),
            "head_byte": head,
            "byte_sum_pm": byte_sum.astype("int64"),
        }
    )


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, payload:binary, meta:struct) — the canonical
    multimodal layout: opaque bytes + typed metadata for pruning/pushdown
    (scan never decodes; filters on meta reach the parquet footer)."""
    register_sf_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.length("text").cast("int").alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield fake_features(b)

    return binary_df.select("doc_id", "payload").mapInPandas(_run, FEATURE_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(binary_table(spark, sf_dir))


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_table(spark, sf_dir)
    return b.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.lang").alias("lang"),
        F.col("meta.n_chars").alias("n_chars"),
        F.length("payload").cast("int").alias("n_bytes"),
    )


def queries():
    return {
        "multimodal_features": q_multimodal_features,
        "multimodal_meta": q_multimodal_meta,
    }


def oracles():
    # documents are pure ASCII (verified) so byte ops == char ops
    return {
        "multimodal_features": f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               CAST(ascii(substr(text, 1, 1)) AS INT) AS head_byte,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(text) + 1),
                                  i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
                 (acc, c) -> acc + c) % {_M} AS byte_sum_pm
        FROM documents
        """,
        "multimodal_meta": """
        SELECT doc_id, 'text/plain' AS mime, lang,
               CAST(length(text) AS INT) AS n_chars,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes
        FROM documents
        """,
    }
