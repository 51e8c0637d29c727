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


def run_stream_neardup(
    spark: SparkSession,
    src_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    index_dir: str,
    tau: float | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Continuous NEAR-dup maintenance — the streaming composition of
    the incremental MinHash plan (``operators.dedup.minhash_delta``):
    every micro-batch of documents probes a persisted LSH signature
    index with its OWN band signatures only, verifies the surviving
    candidates by exact Jaccard against the persisted shingle-set
    store, appends its pairs, and extends the index.

    State layout (all append-only, per-batch ``b=<id>`` partitions,
    replay-idempotent because a batch derives everything from
    partitions STRICTLY BELOW its id plus its own input):

    - ``{index_dir}/bands/b=N``  — (doc_id, band, band_sig)
    - ``{index_dir}/sets/b=N``   — (doc_id, shs) shingle-set store
    - ``{pairs_dir}/b=N``        — (doc_a, doc_b, jaccard) pairs with
      ≥ 1 endpoint in batch N

    Per-batch cost is the batch's (map-only) signature build + one
    bucket equi-join of batch bands against the index bands + exact
    verification of the survivors — index↔index candidate pairs are
    never generated, and the historical corpus is never re-shingled:
    at 100 TB/day the index tables are exactly the signature store a
    production deployment maintains. Completeness (tested): each pair
    (a, b) surfaces exactly once, in batch max(batch(a), batch(b)) —
    the union of all pair partitions EQUALS the batch
    ``minhash_pairs`` over everything ingested."""
    import os

    from ..operators.dedup import (
        MINHASH_TAU,
        _band_sigs_df,
        _shingle_arrays_df,
        _verify_jaccard_sets,
    )
    from .triples import _latest_kg_version as _latest_version

    eff_tau = MINHASH_TAU if tau is None else tau
    BAND_SCHEMA = "doc_id bigint, band int, band_sig string"
    SET_SCHEMA = "doc_id bigint, shs array<string>"

    def _read_below(sub: str, schema: str, below: int) -> DataFrame | None:
        root = f"{index_dir}/{sub}"
        if not os.path.isdir(root):
            return None
        parts = [
            f"{root}/{d}"
            for d in os.listdir(root)
            if d.startswith("b=") and int(d.split("=")[1]) < below
        ]
        if not parts:
            return None
        return spark.read.schema(schema).parquet(*parts)

    def one_batch(bdf: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        sets_b = _shingle_arrays_df(bdf)
        sets_b.write.mode("overwrite").parquet(f"{index_dir}/sets/b={bid}")
        sets_b = spark.read.schema(SET_SCHEMA).parquet(f"{index_dir}/sets/b={bid}")
        bands_b = _band_sigs_df(sets_b)
        bands_b.write.mode("overwrite").parquet(f"{index_dir}/bands/b={bid}")
        bands_b = spark.read.schema(BAND_SCHEMA).parquet(
            f"{index_dir}/bands/b={bid}"
        )
        prev_bands = _read_below("bands", BAND_SCHEMA, bid)
        prev_sets = _read_below("sets", SET_SCHEMA, bid)
        all_bands = (
            bands_b if prev_bands is None else bands_b.unionByName(prev_bands)
        )
        all_sets = sets_b if prev_sets is None else sets_b.unionByName(prev_sets)
        cand = (
            bands_b.alias("x")
            .join(all_bands.alias("y"), ["band", "band_sig"])
            .filter(F.col("x.doc_id") != F.col("y.doc_id"))
            .select(
                F.least("x.doc_id", "y.doc_id").alias("doc_a"),
                F.greatest("x.doc_id", "y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        _verify_jaccard_sets(cand, all_sets, eff_tau).write.mode(
            "overwrite"
        ).parquet(f"{pairs_dir}/b={bid}")

    src = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        src.parquet(src_dir)
        .writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_stream_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """All near-dup pairs found so far (union of batch partitions —
    each pair appears exactly once, see :func:`run_stream_neardup`)."""
    return (
        spark.read.schema("doc_a bigint, doc_b bigint, jaccard double")
        .parquet(f"{pairs_dir}/b=*")
        .select("doc_a", "doc_b", "jaccard")
    )
