"""Streaming twin of the KG extraction stage: incremental per-conversation
triple extraction over a stream of arriving turns.

The reference's incremental story is the ``MERGING_ALLOWED`` re-attach
path (CompilationScheduler.java:33,47-60): a new compile run appends its
compilation units to the already-stored graph. The streaming-native form
of "a unit arrives, extract it, append to the graph" is a stateful
grouped-map operator:

    turns readStream
      -> groupBy(conv_id)
      -> applyInPandasWithState        (buffer turns per conversation)
      -> mentions/triples appended to the sink

State per conversation = the buffered (turn_idx, text) arrays. A
conversation is extracted and its state dropped when either
- its *final* turn has arrived (the transcript grammar marks it — the
  analog of javac's ANALYZE-complete event that fires the reference's
  visitor, GetStructuresAfterAnalyze.java:60-108), or
- the state times out (ProcessingTimeTimeout) — incomplete conversations
  are flushed rather than leaking state forever.

Extraction itself is the SAME vectorized ``extract_pandas`` the batch
stage uses; the availableNow test asserts set-equality of emitted rows
against ``extract(transcripts)`` for the delivery contract below.

Delivery contract (what "agrees with batch" requires):
- **per-conversation in-order delivery** — all of a conversation's turns
  must reach the operator before or with its final turn (at scale: Kafka
  partitioned by conv_id gives per-key ordering). If item turns arrive in
  a LATER microbatch than the final turn, extraction has already fired
  and dropped state; the stragglers re-buffer without their intro/final
  context and are flushed on timeout as ``kind='dead_letter'`` rows
  (conv_id + turn_idx preserved for replay/repair) — never silently
  dropped, but also not equal to the batch output;
- **one-shot drains only see completed conversations** — with
  ``trigger(availableNow)`` the ProcessingTimeTimeout cannot fire before
  the query stops, so conversations still missing their final turn emit
  nothing in that drain; a subsequent drain (same checkpoint) or a live
  trigger flushes them via the idle timeout.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..extraction.extract import EXTRACTION_SCHEMA, extract_pandas
from ..extraction import rules as R

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# state: parallel arrays of buffered turn indices and texts
_STATE_SCHEMA = StructType(
    [
        StructField("idxs", ArrayType(IntegerType()), True),
        StructField("texts", ArrayType(StringType()), True),
    ]
)

_IDLE_TIMEOUT_MS = 60_000


def transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stand-in; at scale this is Kafka / Iceberg CDC."""
    return spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(path)


def _extract_conv(conv_id: str, idxs: list, texts: list) -> pd.DataFrame:
    """Extract one buffered conversation; un-extractable item turns become
    dead-letter rows.

    ``extract_pandas`` defensively drops item turns whose conversation
    context (the order key from the intro/final turn) is missing —
    correct for malformed batch input, but in streaming that state means
    *late data after context was flushed*. Emitting
    ``kind='dead_letter'`` rows (conv_id, turn_idx preserved) makes the
    loss observable and replayable instead of silent."""
    turns = pd.DataFrame(
        {"conv_id": conv_id, "turn_idx": idxs, "text": texts}
    ).sort_values("turn_idx", kind="stable")
    turns["turn_idx"] = turns["turn_idx"].astype("int32")
    out = extract_pandas(turns)
    emitted = set(out["turn_idx"]) if len(out) else set()
    dead = turns[
        turns["text"].str.startswith(R.ITEM_P0, na=False)
        & ~turns["turn_idx"].isin(emitted)
    ]
    if not len(dead):
        return out
    dl = pd.DataFrame(
        {
            "kind": "dead_letter",
            "conv_id": dead["conv_id"],
            "turn_idx": dead["turn_idx"],
            "span_start": 0,
            "span_end": 0,
        }
    )
    for f in EXTRACTION_SCHEMA.fields:
        if f.name not in dl.columns:
            dl[f.name] = None
    return pd.concat([out, dl[[f.name for f in EXTRACTION_SCHEMA.fields]]],
                     ignore_index=True)


def _kg_state_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        idxs, texts = state.get
        state.remove()
        if idxs:
            yield _extract_conv(conv_id, idxs, texts)
        return

    idxs, texts = (state.get if state.exists else ([], []))
    idxs, texts = list(idxs), list(texts)
    for pdf in pdfs:
        idxs.extend(int(i) for i in pdf["turn_idx"])
        texts.extend(pdf["text"])

    # the conversation's final turn is grammatically marked — extract now
    if any(R.FINAL_RE.match(t or "") for t in texts):
        if state.exists:
            state.remove()
        yield _extract_conv(conv_id, idxs, texts)
    else:
        state.update((idxs, texts))
        state.setTimeoutDuration(_IDLE_TIMEOUT_MS)


def streaming_extract(turns: DataFrame) -> DataFrame:
    """turns stream -> extraction rows (same schema as the batch stage)."""
    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            _kg_state_fn,
            outputStructType=EXTRACTION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def run_streaming_extract_available_now(
    spark: SparkSession, input_path: str, checkpoint: str, table: str
) -> Any:
    """One availableNow drain into an in-memory sink; returns the query."""
    return (
        streaming_extract(transcript_stream(spark, input_path))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
