"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so compressed-format decoding
is stubbed — but ``decode_image`` is REAL for binary PPM/PGM (pure-numpy
parser) with ``resize_image`` nearest-neighbor over the decoded array;
JPEG/PNG/audio raise NotImplementedError until PIL/torchaudio are wired
into that one branch. Everything Spark-side is real and tested: the
binary column construction, the metadata struct schema, the mapInPandas
UDF signature and batch shape (incl. the row-exploding frame-sample
path), and the partitioning story.

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


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) / PGM (P5) payload to an HxWx3 / HxW uint8
    array — pure numpy, no media libraries needed. Every other format
    (JPEG/PNG/...) needs PIL, which this container lacks, and raises
    NotImplementedError; wiring PIL in changes only that branch."""
    magic = payload[:2]
    if magic in (b"P6", b"P5"):
        # header: magic, whitespace-separated width/height/maxval with
        # optional '#' comment lines, ONE whitespace byte, then the raster.
        # Malformed payloads (header truncated mid-field, '#' comment with
        # no trailing newline, short raster) raise ONE diagnosable
        # ValueError instead of an opaque int()/index()/frombuffer
        # traceback — inside mapInPandas a per-row failure kills the whole
        # task, so the message must say what was wrong (ADVICE r3).
        try:
            pos, fields = 2, []
            while len(fields) < 3:
                while pos < len(payload) and payload[pos : pos + 1].isspace():
                    pos += 1
                if payload[pos : pos + 1] == b"#":
                    pos = payload.index(b"\n", pos) + 1
                    continue
                start = pos
                while pos < len(payload) and not payload[pos : pos + 1].isspace():
                    pos += 1
                fields.append(int(payload[start:pos]))
            pos += 1  # the single whitespace after maxval
            w, h, maxval = fields
            if maxval > 255:
                raise NotImplementedError("16-bit PPM/PGM not supported")
            ch = 3 if magic == b"P6" else 1
            raster = np.frombuffer(
                payload, dtype=np.uint8, count=h * w * ch, offset=pos
            )
            return raster.reshape((h, w, 3) if ch == 3 else (h, w))
        except (ValueError, IndexError) as e:
            raise ValueError(
                f"malformed {magic.decode()} payload "
                f"({len(payload)} bytes): {e}"
            ) from e
    raise NotImplementedError(
        "only binary PPM/PGM decode ships here; JPEG/PNG/audio require "
        "PIL/torchaudio — wire them into this branch. The Spark-side "
        "plumbing (binary column, metadata struct, mapInPandas batching) "
        "is format-agnostic and exercised via fake_features()."
    )


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of a decoded HxW[xC] uint8 array — two
    integer index maps, one fancy-indexing gather; no per-pixel Python."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows[:, None], cols[None, :]]


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


# --- frame sampling + resize analogs -------------------------------------
#
# The driver brief's multimodal list is decode / feature-extract / resize /
# frame-sample. Decode is the stub above; these two make the remaining pair
# real Spark plumbing with deterministic math (no media libs needed):
#
# * frame_sample: payload split into fixed FRAME_BYTES blocks ("frames");
#   every FRAME_STRIDE-th frame is sampled (the video frame-sampling access
#   pattern) and checksummed. Row-EXPLODING mapInPandas: output rows >>
#   input rows, so output frames are sliced to <=_OUT_CHUNK rows (big Arrow
#   batches in both directions deadlock the Python runner's flow control).
# * byte_resample: every RESAMPLE_STRIDE-th byte (1-D nearest-neighbor
#   downsample — the resize access pattern), reduced to a position-weighted
#   checksum per doc.
#
# Checksums are position-weighted byte sums mod 2^31-1: exact int64 in
# numpy, exactly replicable in DuckDB (ascii/substr over the verified-ASCII
# corpus), and sensitive to byte order — unlike the plain byte_sum above.

FRAME_BYTES = 64
FRAME_STRIDE = 4
RESAMPLE_STRIDE = 7
_OUT_CHUNK = 4096

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_len", IntegerType(), False),
        StructField("frame_wsum_pm", LongType(), False),
    ]
)

RESAMPLE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("out_len", IntegerType(), False),
        StructField("res_wsum_pm", LongType(), False),
    ]
)


def _segments(payloads: "pd.Series"):
    """Concatenate a batch's payloads into one uint8 view + int64 offsets.

    int64 weighted prefix sums bound the batch at ~100 MB of payload before
    overflow; Arrow's maxRecordsPerBatch (10k rows) keeps real batches far
    below that."""
    n = len(payloads)
    lens = np.fromiter((len(b) for b in payloads), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
    ends = np.cumsum(lens)
    return lens, buf, ends - lens, ends


def sample_frames(batch: pd.DataFrame) -> pd.DataFrame:
    """One output row per sampled frame; weight of byte j (0-based in the
    frame) is j+1, summed mod 2^31-1."""
    lens, buf, starts, ends = _segments(batch["payload"])
    n_frames = -(-lens // FRAME_BYTES)  # ceil; 0 for empty payloads
    n_samp = -(-n_frames // FRAME_STRIDE)
    total = int(n_samp.sum())
    doc_ids = batch["doc_id"].to_numpy()
    if total == 0:
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, dtype=np.int64),
                "frame_idx": np.empty(0, dtype=np.int32),
                "frame_len": np.empty(0, dtype=np.int32),
                "frame_wsum_pm": np.empty(0, dtype=np.int64),
            }
        )
    rep = np.repeat(np.arange(len(lens)), n_samp)
    cum = np.concatenate([[0], np.cumsum(n_samp)])
    k = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], n_samp)
    frame_idx = k * FRAME_STRIDE
    fstart = starts[rep] + frame_idx * FRAME_BYTES
    fend = np.minimum(fstart + FRAME_BYTES, ends[rep])
    s_pre = np.concatenate([[0], np.cumsum(buf, dtype=np.int64)])
    w_pre = np.concatenate(
        [[0], np.cumsum(buf * np.arange(len(buf), dtype=np.int64), dtype=np.int64)]
    )
    # sum b*(pos - fstart + 1) over [fstart, fend)
    wsum = (w_pre[fend] - w_pre[fstart]) - (fstart - 1) * (s_pre[fend] - s_pre[fstart])
    return pd.DataFrame(
        {
            "doc_id": doc_ids[rep],
            "frame_idx": frame_idx.astype(np.int32),
            "frame_len": (fend - fstart).astype(np.int32),
            "frame_wsum_pm": wsum % _M,
        }
    )


def resample_bytes(batch: pd.DataFrame) -> pd.DataFrame:
    """Stride-RESAMPLE_STRIDE downsample; weight of the k-th sampled byte
    (0-based) is k+1, summed mod 2^31-1. Empty payloads yield checksum 0."""
    lens, buf, starts, _ = _segments(batch["payload"])
    out_len = -(-lens // RESAMPLE_STRIDE)
    total = int(out_len.sum())
    rep = np.repeat(np.arange(len(lens)), out_len)
    cum = np.concatenate([[0], np.cumsum(out_len)])
    k = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], out_len)
    vals = buf[starts[rep] + k * RESAMPLE_STRIDE].astype(np.int64)
    w = (k + 1) * vals
    w_pre = np.concatenate([[0], np.cumsum(w, dtype=np.int64)])
    sums = w_pre[cum[1:]] - w_pre[cum[:-1]]
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(),
            "out_len": out_len.astype(np.int32),
            "res_wsum_pm": sums % _M,
        }
    )


def frame_sample(binary_df: DataFrame) -> DataFrame:
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = sample_frames(b)
            for i in range(0, len(out), _OUT_CHUNK):
                yield out.iloc[i : i + _OUT_CHUNK]

    return binary_df.select("doc_id", "payload").mapInPandas(_run, FRAME_SCHEMA)


def byte_resample(binary_df: DataFrame) -> DataFrame:
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield resample_bytes(b)

    return binary_df.select("doc_id", "payload").mapInPandas(_run, RESAMPLE_SCHEMA)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return frame_sample(binary_table(spark, sf_dir))


def q_multimodal_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_resample(binary_table(spark, sf_dir))


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
        "multimodal_frames": q_multimodal_frames,
        "multimodal_resample": q_multimodal_resample,
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
        "multimodal_frames": f"""
        SELECT d.doc_id,
               CAST(f.frame_idx AS INT) AS frame_idx,
               CAST(LEAST({FRAME_BYTES},
                    octet_length(encode(d.text)) - f.frame_idx * {FRAME_BYTES})
                    AS INT) AS frame_len,
               CAST(list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(
                          range(1, CAST(LEAST({FRAME_BYTES},
                                octet_length(encode(d.text))
                                - f.frame_idx * {FRAME_BYTES}) AS BIGINT) + 1),
                          j -> j * CAST(ascii(substr(d.text,
                                 CAST(f.frame_idx * {FRAME_BYTES} + j AS INT),
                                 1)) AS BIGINT))),
                      (a, b) -> a + b) % {_M} AS BIGINT) AS frame_wsum_pm
        FROM documents d,
             LATERAL (SELECT unnest(range(0,
                        CAST(ceil(octet_length(encode(d.text)) / {FRAME_BYTES}.0)
                             AS BIGINT),
                        {FRAME_STRIDE})) AS frame_idx) f
        """,
        "multimodal_resample": f"""
        SELECT doc_id,
               CAST(ceil(octet_length(encode(text)) / {RESAMPLE_STRIDE}.0) AS INT)
                 AS out_len,
               CAST(coalesce(list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(
                          range(0, CAST(ceil(octet_length(encode(text))
                                   / {RESAMPLE_STRIDE}.0) AS BIGINT)),
                          k -> (k + 1) * CAST(ascii(substr(text,
                                 CAST(1 + k * {RESAMPLE_STRIDE} AS INT),
                                 1)) AS BIGINT))),
                      (a, b) -> a + b), 0) % {_M} AS BIGINT) AS res_wsum_pm
        FROM documents
        """,
    }
