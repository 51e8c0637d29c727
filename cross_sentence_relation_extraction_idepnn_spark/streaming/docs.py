"""Structured Streaming document ingest + continuous exact dedup.

The batch engine dedups the corpus with ``operators.dedup`` (exact /
MinHash / SimHash families); a production training-data pipeline also
ingests documents CONTINUOUSLY and must drop re-crawled duplicates
*online*, before they reach storage. This is Spark's purpose-built
operator for that: ``dropDuplicatesWithinWatermark`` — state keyed by
content hash, evicted once the event-time watermark passes a key's
last-seen time plus the delay, so state is bounded by the duplicate-
arrival horizon instead of growing with the corpus (the property that
matters at 100 TB/day: an unbounded ``dropDuplicates`` would
accumulate one state row per distinct document forever).

The documents table carries no timestamp, so ingest time is
synthesized deterministically from ``doc_id`` (epoch 2024-01-01 plus
``doc_id mod 3600`` seconds) — in production this is the crawl/ingest
timestamp. Correctness contract (tested): on a bounded input the
emitted key set equals the batch ``dedup_exact`` key set — one
surviving row per distinct content hash, including duplicates that
arrive in *different* micro-batches (cross-batch state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

# duplicates of a document arrive within this horizon of its first
# sighting; beyond it the key's state row is evicted (re-crawls later
# than the horizon would re-admit the doc — the documented trade)
DEDUP_HORIZON = "1 hour"

_EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z


def stream_documents(
    spark: SparkSession, path: str, glob: str = "documents.parquet"
) -> DataFrame:
    """File-source stream over a documents parquet directory (explicit
    schema — inference is disabled on streams by design); one file per
    micro-batch so multi-file directories exercise cross-batch state."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", glob)
        .parquet(path)
    )


def with_ingest_ts(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic ingest time (the corpus carries none)."""
    return docs.withColumn(
        "ingest_ts",
        F.timestamp_seconds(F.lit(_EPOCH_2024) + F.col("doc_id") % 3600),
    )


def stream_dedup(stream: DataFrame) -> DataFrame:
    """(text_md5, doc_id, ingest_ts) — first-arrival survivor per
    distinct document content within the watermark horizon."""
    return (
        with_ingest_ts(stream)
        .withColumn("text_md5", F.md5("text"))
        .withWatermark("ingest_ts", DEDUP_HORIZON)
        .dropDuplicatesWithinWatermark(["text_md5"])
        .select("text_md5", "doc_id", "ingest_ts")
    )
