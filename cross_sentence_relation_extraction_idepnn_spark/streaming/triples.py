"""Streaming KG construction over a transcript feed.

The reference is purely batch; this is the engine's continuous-ingest
surface: transcript turns arrive as a stream (file source here;
Kafka / Iceberg incremental scan in production) and each micro-batch
runs the SAME batch triple pipeline (``triples_from_transcripts``)
inside ``foreachBatch`` — one code path for batch and stream, so the
stream can never drift semantically from the oracle-checked batch
plan.

Correctness contract (tested): on a bounded input driven with
``Trigger.AvailableNow``, the streamed triple set equals the batch
triple set exactly.

Conversation-completeness caveat (documented, by design): cross-turn
candidate generation (J3, k ≤ K) needs a conversation's turns to be
visible together. A micro-batch boundary that splits a conversation
would lose cross-boundary pairs, so the production deployment closes
conversations BEFORE extraction — either the upstream feed emits
whole conversations (transcript logs are conversation-atomic), or the
stateful sessionizer (``events.sessionize``, gap timeout) buffers
turns per ``conv_id`` and releases closed sessions downstream. The
``foreachBatch`` stage itself is conversation-agnostic either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..config import MAX_K, SCORE_THRESHOLD

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def stream_transcripts(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of transcript turns with the explicit input
    schema (streams never infer schema). ``maxFilesPerTrigger`` keeps
    micro-batches bounded when a backlog is replayed."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(src_dir)
    )


def run_stream_triples(
    spark: SparkSession,
    src_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    threshold: float = SCORE_THRESHOLD,
    max_k: int = MAX_K,
    weights=None,
) -> None:
    """Drive the transcript stream to completion (AvailableNow): every
    micro-batch runs the batch triple pipeline and appends its triples
    to a parquet sink. The checkpoint dir gives exactly-once file-sink
    semantics — a killed-and-restarted query does not double-emit a
    committed batch (the streaming twin of the batch pipeline's
    per-stage resume)."""
    from ..plans.pipeline import triples_from_transcripts

    def one_batch(bdf: DataFrame, batch_id: int) -> None:
        out = triples_from_transcripts(
            spark, bdf, threshold=threshold, max_k=max_k, weights=weights
        )
        out.write.mode("append").parquet(sink_dir)

    q = (
        stream_transcripts(spark, src_dir)
        .writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
