"""Structured Streaming ingest over the ``events`` table.

The reference is purely batch (SURVEY.md §2.11), so nothing here is a
parity target; this is the engine's streaming surface for continuous
transcript/event feeds at production scale:

- ``stream_events``: file-source ``readStream`` with an explicit schema
  (schema inference is disabled on streams by design);
- ``windowed_counts``: event-time tumbling window + watermark — late
  rows beyond the watermark are dropped, state is bounded;
- ``sessionize``: custom stateful operator via
  ``applyInPandasWithState`` (per-user session aggregation with gap
  timeout) — the state-store path a 100 TB streaming job would use;
- ``run_available_now``: drives any of the above to a memory sink with
  ``Trigger.AvailableNow`` so batch-vs-stream equivalence is testable.

The *same* windowed aggregation is exposed in batch form
(``windowed_counts_batch``) with a DuckDB oracle: the streaming result
on a bounded input must equal the batch result — that equivalence is
the streaming correctness test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import read_parquet_cached

EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

WINDOW = "10 minutes"
WATERMARK = "30 minutes"


def events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_cached(spark, f"{sf_dir}/events.parquet")


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one-file directory
    glob; in production: Kafka/Iceberg incremental scan)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )



def _epoch_ntz(col_sql: str):
    """Wall-time epoch seconds for a TIMESTAMP_NTZ column — pure
    timestamp arithmetic, independent of spark.sql.session.timeZone
    (a plain ntz→long cast interprets wall time in the session zone
    and breaks under non-UTC driver sessions)."""
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col_sql})"
    )

def _windowed(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            _epoch_ntz("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts(stream: DataFrame) -> DataFrame:
    """Streaming: tumbling event-time window per event_type."""
    return _windowed(stream)


def windowed_counts_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`windowed_counts` (oracle-checkable; the
    watermark is a no-op on bounded batch input)."""
    return (
        events_batch(spark, sf_dir)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            _epoch_ntz("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def duck_windowed_counts() -> str:
    """DuckDB oracle: 10-minute tumbling windows on the raw timestamp.

    ``win_start`` is epoch seconds floored to 600s — exactly Spark's
    tumbling-window start for UTC session timezone.
    """
    return """
        SELECT CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    """


def sessionize_batch(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Batch twin of the stateful sessionizer, expressed with window
    functions (oracle-checkable): a session starts where the gap from
    the previous event of the same user exceeds ``gap_minutes``;
    session id = running count of starts.

    Output: (user_id, session_seq, n_events, sum_value, start_epoch,
    end_epoch).
    """
    from pyspark.sql import Window

    ev = events_batch(spark, sf_dir).select(
        "user_id", _epoch_ntz("ts").alias("te"), "value",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("te", "event_id")
    gap = gap_minutes * 60
    prev = F.lag("te").over(w)
    starts = ev.withColumn(
        "is_start",
        F.when(prev.isNull() | (F.col("te") - prev > gap), 1).otherwise(0),
    )
    sess = starts.withColumn(
        "session_seq",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.min("te").alias("start_epoch"),
            F.max("te").alias("end_epoch"),
        )
        .withColumn("session_seq", F.col("session_seq").cast("int"))
    )


def duck_sessionize_batch(gap_minutes: int = 30) -> str:
    gap = gap_minutes * 60
    return f"""
        SELECT user_id, CAST(session_seq AS INT) AS session_seq,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value,
               MIN(te) AS start_epoch, MAX(te) AS end_epoch
        FROM (
            SELECT user_id, te, value,
                   SUM(is_start) OVER (PARTITION BY user_id
                                       ORDER BY te, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM (
                SELECT user_id, te, value, event_id,
                       CASE WHEN te - LAG(te) OVER (PARTITION BY user_id
                                                    ORDER BY te, event_id) > {gap}
                            OR LAG(te) OVER (PARTITION BY user_id
                                             ORDER BY te, event_id) IS NULL
                            THEN 1 ELSE 0 END AS is_start
                -- FLOOR before CAST: DuckDB rounds float->int casts,
                -- Spark's timestamp->long cast truncates
                FROM (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS te,
                             value, event_id
                      FROM events)
            )
        )
        GROUP BY user_id, session_seq
    """


def sessionize(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user sessions with a ``gap``
    timeout via ``applyInPandasWithState`` — events within ``gap`` of
    each other belong to one session; a watermark-driven timeout emits
    the closed session (session_id, user_id, n_events, sum_value,
    start/end epoch seconds).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000
    out_schema = (
        "user_id bigint, n_events bigint, sum_value double, "
        "start_epoch bigint, end_epoch bigint"
    )
    state_schema = "n bigint, s double, t0 bigint, t1 bigint"

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            n, s, t0, t1 = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "sum_value": s,
                        "start_epoch": t0,
                        "end_epoch": t1,
                    }
                ]
            )
            return
        n, s, t0, t1 = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            ts = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
            n += len(pdf)
            s += float(pdf["value"].sum())
            t0 = min([x for x in [t0, *ts] if x is not None])
            t1 = max([x for x in [t1, *ts] if x is not None])
        state.update((n, s, t0, t1))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_ms)
        yield pd.DataFrame(
            columns=["user_id", "n_events", "sum_value", "start_epoch", "end_epoch"]
        )

    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(
    df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive a streaming DataFrame to completion into a memory sink;
    returns the sink table. Bounded-input equivalence harness."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(query_name)


def _hll_cols(key):
    """(bucket, rank) sketch columns for a key Column — shared by the
    stream and batch twins (operators.sketch discipline: H mod 64
    buckets, leading-zero rank of the remaining 54 bits)."""
    from ..hashing import spark_h15
    from ..operators.sketch import HLL_BUCKETS, HLL_REST_BITS

    h = spark_h15(key.cast("string"))
    rest = F.shiftright(h, 6)
    rank = F.when(rest == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
        F.lit(HLL_REST_BITS + 1) - F.length(F.bin(rest))
    )
    return (h % HLL_BUCKETS).cast("int").alias("bucket"), rank.cast("int").alias(
        "rank"
    )


def windowed_hll(stream: DataFrame) -> DataFrame:
    """Streaming sketch: per-window HyperLogLog register table for
    distinct-user estimation — (win_start, bucket, max_rank). The
    state per window is ≤ 64 integers however many events arrive (the
    sketch property carried into streaming: an exact windowed
    COUNT(DISTINCT) would hold every user id in state); ``max`` is
    insensitive to both duplication and arrival order, so the stream
    result equals the batch twin exactly."""
    bucket, rank = _hll_cols(F.col("user_id"))
    return (
        stream.withWatermark("ts", WATERMARK)
        .select(F.window("ts", WINDOW).alias("w"), bucket, rank)
        .groupBy("w", "bucket")
        .agg(F.max("rank").alias("max_rank"))
        .select(
            _epoch_ntz("w.start").alias("win_start"), "bucket", "max_rank"
        )
    )


def windowed_hll_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`windowed_hll` (oracle-checkable)."""
    bucket, rank = _hll_cols(F.col("user_id"))
    return (
        events_batch(spark, sf_dir)
        .select(F.window("ts", WINDOW).alias("w"), bucket, rank)
        .groupBy("w", "bucket")
        .agg(F.max("rank").alias("max_rank"))
        .select(
            _epoch_ntz("w.start").alias("win_start"), "bucket", "max_rank"
        )
    )


def duck_windowed_hll() -> str:
    """Oracle: same 600s window floor, same hash/bucket/rank algebra
    as ``operators.sketch.duck_hll_registers``."""
    from ..hashing import duck_h15
    from ..operators.sketch import HLL_BUCKETS, HLL_REST_BITS

    h = duck_h15("CAST(user_id AS VARCHAR)")
    return f"""
        SELECT CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
               CAST(({h}) % {HLL_BUCKETS} AS INT) AS bucket,
               CAST(MAX(CASE WHEN ({h}) // {HLL_BUCKETS} = 0
                             THEN {HLL_REST_BITS + 1}
                             ELSE {HLL_REST_BITS + 1}
                                  - length(bin(({h}) // {HLL_BUCKETS}))
                        END) AS INT) AS max_rank
        FROM events
        GROUP BY 1, 2
    """


def _cms_cols(key):
    """(r, c) Count-Min coordinates for a key Column across the
    ``CMS_DEPTH`` hash rows — shared by stream and batch twins."""
    from ..hashing import spark_h15, spark_minhash_term
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH

    h = spark_h15(key.cast("string"))
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (spark_minhash_term(h, r) % CMS_WIDTH).cast("int").alias("c"),
            )
            for r in range(CMS_DEPTH)
        ]
    )
    return F.explode(rows).alias("rc")


def windowed_cms(stream: DataFrame) -> DataFrame:
    """Streaming Count-Min: per-window user-activity sketch —
    (win_start, r, c, cnt). State per window is the fixed 4×128 grid
    however many users are active (the heavy-hitter / rate-limiting
    shape: an exact per-user windowed count keys state by user).
    Counts are additive and arrival-order-insensitive, so the stream
    result equals the batch twin exactly on bounded input."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .select(F.window("ts", WINDOW).alias("w"), _cms_cols(F.col("user_id")))
        .groupBy("w", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cnt"))
        .select(_epoch_ntz("w.start").alias("win_start"), "r", "c", "cnt")
    )


def windowed_cms_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of :func:`windowed_cms` (oracle-checkable)."""
    return (
        events_batch(spark, sf_dir)
        .select(F.window("ts", WINDOW).alias("w"), _cms_cols(F.col("user_id")))
        .groupBy("w", F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("cnt"))
        .select(_epoch_ntz("w.start").alias("win_start"), "r", "c", "cnt")
    )


def duck_windowed_cms() -> str:
    from ..hashing import duck_h15, duck_minhash_term
    from ..operators.sketch import CMS_DEPTH, CMS_WIDTH

    h = duck_h15("CAST(user_id AS VARCHAR)")
    branches = " UNION ALL ".join(
        f"""SELECT CAST(FLOOR(epoch(ts) / 600) * 600 AS BIGINT) AS win_start,
                   {r} AS r,
                   CAST(({duck_minhash_term(f'({h})', r)}) % {CMS_WIDTH} AS INT) AS c
            FROM events"""
        for r in range(CMS_DEPTH)
    )
    return f"SELECT win_start, r, c, COUNT(*) AS cnt FROM ({branches}) GROUP BY 1, 2, 3"


# ------------------------------------------------- stream-stream join


def interval_join_stream(purchases: DataFrame, errors: DataFrame) -> DataFrame:
    """Watermarked stream-stream inner join: the streaming twin of
    :func:`..operators.temporal.interval_join` (purchase × recent-error
    pairs). Watermarks on BOTH sides plus the two-sided time-range
    condition let Spark derive a state watermark, so buffered rows are
    evicted once they can no longer match — state is bounded by
    (watermark delay + join window), never by stream length. Append
    output mode; on bounded input the result equals the batch form
    (asserted in tests/test_temporal.py)."""
    from ..operators.temporal import interval_join

    return interval_join(
        purchases.withWatermark("ts", WATERMARK),
        errors.withWatermark("ts", WATERMARK),
    )


# ---------------------------------------------------------- CDC stream

CDC_STATE_SCHEMA = (
    "user_id bigint, last_event_id bigint, last_ts timestamp, "
    "last_type string, last_value double"
)


def _state_as_events(state: DataFrame) -> DataFrame:
    """Rename a CDC snapshot back to change-event shape so it can be
    refolded through ``cdc_state`` (the associative-merge trick)."""
    return state.select(
        F.col("last_event_id").alias("event_id"),
        F.col("last_ts").alias("ts"),
        "user_id",
        F.col("last_type").alias("event_type"),
        F.col("last_value").alias("value"),
    )


def run_stream_cdc(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Continuous MERGE INTO: every micro-batch of change events folds
    into the latest-wins snapshot via the ASSOCIATIVE ``cdc_state``
    merge law (state(A ∪ B) = state(state(A) ∪ state(B)) —
    pytest-pinned in test_temporal), so history is never re-read: the
    per-batch cost is one key exchange over (existing state + batch).

    Durability follows the ``run_stream_kg`` versioned-overwrite
    contract: each batch writes the full merged state to
    ``v=<batch_id>`` and merges against the highest version BELOW its
    own id, so foreachBatch's at-least-once replay recomputes the
    identical merge and overwrites its own version — idempotent, and
    the latest version always equals a from-scratch ``cdc_state`` over
    everything ingested (tested). Tombstones stay IN the state
    (resurrection guard); ``cdc_snapshot`` semantics (drop tombstoned
    keys) apply at read time."""
    from ..operators.temporal import cdc_state
    from .triples import _latest_kg_version

    def one_batch(bdf: DataFrame, batch_id: int) -> None:
        batch_state = cdc_state(bdf)
        prev_v = _latest_kg_version(spark, state_dir, below=int(batch_id))
        if prev_v is None:
            merged = batch_state
        else:
            prev = spark.read.schema(CDC_STATE_SCHEMA).parquet(
                f"{state_dir}/v={prev_v}"
            )
            merged = cdc_state(
                _state_as_events(prev).unionByName(
                    _state_as_events(batch_state)
                )
            )
        merged.select(
            "user_id",
            F.col("last_event_id").cast("bigint").alias("last_event_id"),
            F.col("last_ts").cast("timestamp").alias("last_ts"),
            "last_type",
            F.col("last_value").cast("double").alias("last_value"),
        ).write.mode("overwrite").parquet(f"{state_dir}/v={int(batch_id)}")

    src = spark.readStream.schema(EVENT_SCHEMA)
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


def read_latest_cdc(spark: SparkSession, state_dir: str) -> DataFrame:
    """The current CDC state: the highest committed version."""
    from .triples import _latest_kg_version

    v = _latest_kg_version(spark, state_dir, below=1 << 62)
    return spark.read.schema(CDC_STATE_SCHEMA).parquet(f"{state_dir}/v={v}")
