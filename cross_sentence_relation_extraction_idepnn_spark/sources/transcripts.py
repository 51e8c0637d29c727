"""Transcript table source.

The engine's input contract (BASELINE.json ``input_hint``) is an
Iceberg table of multi-turn conversation transcripts::

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

In production this is a real Iceberg scan (``spark.read.table``).
In-sandbox we derive a deterministic transcript corpus from the
driver-provided ``documents`` parquet (one conversation per document,
turns = fixed-width word windows), so that the DuckDB oracle can
re-derive the *identical* table from the same parquet — giving the
correctness harness a shared ground truth without external data.

Reference analogue: the corpus scan + raw-text read of
``generate_bb_training_data_2016.py:20-36,596-606`` (SURVEY.md §2.1
S1/S2) — a directory walk becomes a single partition-prunable table
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import read_parquet_cached

TURN_WORDS = 8
EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_cached(spark, f"{sf_dir}/documents.parquet")


_FANOUT_CACHE: dict[tuple[str, str], DataFrame] = {}


def _fanned_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents scan, repartitioned iff under-parallel.

    A single-file fixture arrives as ONE scan partition (one parquet
    row group — byte-range splitting can't help), which would
    serialize the whole turn derivation into one task (measured:
    1.2 s of a 7.7 s sf0.1 run). A production corpus has
    >> parallelism file splits, so the repartition (and its shuffle of
    the raw text) never triggers there. Memoized — the partition-count
    probe costs an RDD conversion."""
    key = (spark.sparkContext.applicationId, sf_dir)
    df = _FANOUT_CACHE.get(key)
    if df is None:
        df = documents(spark, sf_dir)
        par = spark.sparkContext.defaultParallelism
        n = df.rdd.getNumPartitions()
        # only when it genuinely adds parallelism (at local[1] a 1→1
        # repartition would be a pure-overhead shuffle — and would
        # artificially slow the scaling block's low side)
        if n < max(par // 2, 2) and par > n:
            df = df.repartition(par, "doc_id")
        if len(_FANOUT_CACHE) > 64:
            _FANOUT_CACHE.clear()
        _FANOUT_CACHE[key] = df
    return df


def transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcript table (full schema, real timestamp).

    Stays entirely in native Column expressions (whole-stage codegen):
    split → sequence/transform → posexplode. At 100 TB the equivalent
    is a straight Iceberg scan; this derivation exists only so tests,
    bench, and the DuckDB oracle share one deterministic input.
    """
    # selectExpr strings keep the build at a handful of py4j round
    # trips (the Column-by-Column form cost ~0.3 s of driver time per
    # cold build — measured, round 4); the parsed plan is identical.
    # Plan-memoized (r6): every pipeline-prefix consumer receives the
    # SAME lazy DataFrame object, which lets downstream operators
    # memoize on input identity (session.input_plan_memo).
    from ..session import plan_memo

    return plan_memo(
        spark, ("transcripts", sf_dir), lambda: _transcripts_build(spark, sf_dir)
    )


def _transcripts_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = TURN_WORDS
    docs = _fanned_documents(spark, sf_dir)
    return (
        docs.selectExpr(
            "doc_id",
            "split(text, ' ') AS ws",
            f"sequence(0, CAST(greatest(ceil(size(split(text, ' ')) / {w}), 1) "
            "AS INT) - 1) AS idxs",
        )
        .selectExpr(
            "doc_id",
            "explode(transform(idxs, i -> struct("
            "CAST(i AS INT) AS turn_idx, "
            f"array_join(slice(ws, i * {w} + 1, {w}), ' ') AS text))) AS turn",
        )
        .selectExpr(
            "concat('conv-', CAST(doc_id AS STRING)) AS conv_id",
            "turn.turn_idx AS turn_idx",
            "CASE WHEN turn.turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role",
            "turn.text AS text",
            "CASE WHEN turn.turn_idx % 2 = 1 AND turn.turn_idx % 3 = 0 THEN 'search' "
            "WHEN turn.turn_idx % 2 = 1 AND turn.turn_idx % 5 = 0 THEN 'code' "
            "ELSE CAST(NULL AS STRING) END AS tool",
            f"timestamp_seconds({EPOCH_2024} + doc_id * 3600 "
            "+ turn.turn_idx * 13) AS ts",
        )
    )


def tool_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript analytics over the full input schema: per (role,
    tool) turn counts, distinct conversations, and average turn length
    — exercises the ``role``/``tool``/``ts`` columns end-to-end."""
    t = transcripts(spark, sf_dir)
    return (
        t.groupBy("role", "tool")
        .agg(
            F.count("*").alias("n_turns"),
            F.countDistinct("conv_id").alias("n_convs"),
            F.round(F.avg(F.length("text")), 6).alias("avg_len"),
            F.min(F.col("ts").cast("long")).alias("first_ts"),
            F.max(F.col("ts").cast("long")).alias("last_ts"),
        )
    )


def duck_tool_usage() -> str:
    return """
        SELECT role, tool, COUNT(*) AS n_turns,
               COUNT(DISTINCT conv_id) AS n_convs,
               ROUND(AVG(length(text)), 6) AS avg_len,
               MIN(ts_epoch) AS first_ts, MAX(ts_epoch) AS last_ts
        FROM transcripts GROUP BY role, tool
    """


def transcripts_scaled(spark: SparkSession, sf_dir: str, copies: int) -> DataFrame:
    """Deterministic corpus replication for throughput/scaling runs:
    ``copies`` distinct-``conv_id`` replicas of every conversation
    (``conv-<doc>-c<i>``). Same schema, same per-conversation content —
    a bigger instance of the workload, no external data. Used by
    ``bench.py`` to evidence the N→4N scaling rule in the regime where
    parallel work (not fixed per-job overhead) dominates."""
    t = transcripts(spark, sf_dir)
    c = spark.range(copies).select(F.col("id").cast("int").alias("copy"))
    return t.crossJoin(F.broadcast(c)).select(
        F.concat_ws("-", "conv_id", F.concat(F.lit("c"), F.col("copy"))).alias(
            "conv_id"
        ),
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    )


def duck_transcripts_cte() -> str:
    """DuckDB CTE body producing the identical transcript table.

    Exposes ``ts_epoch`` (bigint) rather than a timestamp so value
    hashing is format-independent. Downstream oracle queries compose
    with ``WITH transcripts AS ({this})``.
    """
    w = TURN_WORDS
    return f"""
        SELECT 'conv-' || CAST(doc_id AS VARCHAR) AS conv_id,
               CAST(turn_idx AS INT) AS turn_idx,
               CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
               array_to_string(ws[turn_idx*{w}+1 : turn_idx*{w}+{w}], ' ') AS text,
               CASE WHEN turn_idx % 2 = 1 AND turn_idx % 3 = 0 THEN 'search'
                    WHEN turn_idx % 2 = 1 AND turn_idx % 5 = 0 THEN 'code'
                    ELSE NULL END AS tool,
               CAST({EPOCH_2024} + doc_id*3600 + turn_idx*13 AS BIGINT) AS ts_epoch
        FROM (
            SELECT doc_id, ws,
                   UNNEST(range(GREATEST(CAST(CEIL(len(ws)/{w}.0) AS BIGINT), 1))) AS turn_idx
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        )
    """


def tool_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_tool, dst_tool, n, p) — first-order Markov transition
    statistics over per-conversation tool sequences (non-tool turns
    are the 'chat' state): for consecutive turns (turn_idx, turn_idx+1)
    within a conversation, transition counts and the row-normalized
    transition probability. This is agent-behavior analytics over the
    north-rule input schema — which tool follows which — and leans on
    the same stable turn ordering the per-turn text-equality invariant
    pins.

    Plan: ONE conversation-grain exchange (the ``lead`` window), one
    map-side-combinable count over the (src, dst) dimension (≤ |tools|²
    rows at any corpus size), and the per-source normalization is a
    window over that already-tiny grid — the corpus is read exactly
    once (a totals join would re-derive the grid from scratch on the
    broadcast side: a second corpus pass for a 9-row denominator)."""
    from pyspark.sql import Window

    t = transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", F.coalesce("tool", F.lit("chat")).alias("s")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tr = (
        t.withColumn("nxt", F.lead("s").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("s").alias("src_tool"), F.col("nxt").alias("dst_tool"))
        .agg(F.count("*").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("src_tool"))
    return tr.select(
        "src_tool",
        "dst_tool",
        "n",
        F.round(F.col("n") / tot, 6).alias("p"),
    )


def duck_tool_transition() -> str:
    """Oracle (compose after a ``transcripts`` CTE): the same counts by
    a turn_idx+1 self-join — the independent formulation of the
    engine's window ``lead``."""
    return """
        SELECT src_tool, dst_tool, n,
               ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY src_tool), 6) AS p
        FROM (
            SELECT COALESCE(a.tool, 'chat') AS src_tool,
                   COALESCE(b.tool, 'chat') AS dst_tool, COUNT(*) AS n
            FROM transcripts a
            JOIN transcripts b
              ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
            GROUP BY 1, 2
        )
    """


# Turns per salted sub-key a key-grain stage targets. At this fixture's
# TURN_WORDS=8 the corpus has conversations of 1..~15 turns so a target
# of 4 exercises salt factors > 1; a production deployment tunes this to
# rows-that-fit-one-task (order 10^4-10^5) — the arithmetic is identical.
SALT_TARGET_TURNS = 4


def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(turns_per_conv, n_convs, share_pct, salt_factor) — the exact
    count-of-counts over conversation sizes, plus the integer salt
    factor each size class needs to bound any salted sub-key at
    ``SALT_TARGET_TURNS`` rows.

    This is the operational input to the north rule's "skew from long
    conversations" handling (J2/J3 salting, `operators/mentions.py`):
    before committing a salting constant for a 10^12-turn corpus you
    profile the key distribution, and this query IS that profile —
    exact, not sketched, because the profile grain (distinct
    conversation SIZES) is tiny regardless of corpus size.

    Plan: one conversation-grain exchange (map-side-combined count),
    one count-of-counts aggregation over the already-small conv grain,
    and the share denominator is a global window over the ALREADY-TINY
    profile (distinct conversation sizes) — the corpus is read exactly
    once; a separate totals aggregate would re-scan it (the
    ``tool_transition`` lesson)."""
    from pyspark.sql import Window

    prof = (
        transcripts(spark, sf_dir)
        .groupBy("conv_id")
        .agg(F.count("*").alias("turns_per_conv"))
        .groupBy("turns_per_conv")
        .agg(F.count("*").alias("n_convs"))
    )
    tot = F.sum("n_convs").over(Window.partitionBy())
    return prof.select(
        "turns_per_conv",
        "n_convs",
        F.round(F.col("n_convs") * 100.0 / tot, 6).alias("share_pct"),
        F.expr(
            f"(turns_per_conv + {SALT_TARGET_TURNS - 1}) div {SALT_TARGET_TURNS}"
        ).alias("salt_factor"),
    )


def duck_skew_profile() -> str:
    """Oracle (compose after a ``transcripts`` CTE): same profile via a
    global window denominator and DuckDB's ``//`` integer division."""
    t = SALT_TARGET_TURNS
    return f"""
        SELECT turns_per_conv, COUNT(*) AS n_convs,
               ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 6) AS share_pct,
               (turns_per_conv + {t - 1}) // {t} AS salt_factor
        FROM (
            SELECT conv_id, COUNT(*) AS turns_per_conv
            FROM transcripts GROUP BY conv_id
        )
        GROUP BY turns_per_conv
    """


def tool_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t1, t2, t3, n) — order-2 sequence mining over per-conversation
    tool sequences: counts of every CONSECUTIVE tool trigram (non-tool
    turns are the 'chat' state). ``tool_transition`` is the first-order
    Markov view; trigrams expose the multi-step agent workflows
    (search → read → write) a transition matrix averages away — the
    GSP-style sequential-pattern census at fixed k=3, exact because
    consecutive k-grams need no candidate generation.

    Plan: the SAME single conversation-grain exchange as
    ``tool_transition`` (one window sort yields both ``lead`` columns),
    then one map-side-combinable count over a ≤ |tools|³ dimension grid
    — corpus read exactly once, output size independent of corpus
    size."""
    from pyspark.sql import Window

    t = transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", F.coalesce("tool", F.lit("chat")).alias("s")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        t.withColumn("t2", F.lead("s", 1).over(w))
        .withColumn("t3", F.lead("s", 2).over(w))
        .filter(F.col("t3").isNotNull())
        .groupBy(F.col("s").alias("t1"), "t2", "t3")
        .agg(F.count("*").alias("n"))
    )


def duck_tool_ngrams() -> str:
    """Oracle (compose after a ``transcripts`` CTE): the same trigram
    counts via a double turn_idx self-join — the independent relational
    formulation of the engine's window ``lead`` pair."""
    return """
        SELECT COALESCE(a.tool, 'chat') AS t1,
               COALESCE(b.tool, 'chat') AS t2,
               COALESCE(c.tool, 'chat') AS t3,
               COUNT(*) AS n
        FROM transcripts a
        JOIN transcripts b
          ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
        JOIN transcripts c
          ON c.conv_id = a.conv_id AND c.turn_idx = a.turn_idx + 2
        GROUP BY 1, 2, 3
    """


def turn_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_role, dst_role, n, sum_ms, min_ms, max_ms) — response-
    latency census per role transition: for consecutive turns within a
    conversation (stable turn ordering — the north-rule invariant), the
    exact integer millisecond gap ``ts(turn+1) − ts(turn)``, aggregated
    by (previous role → role). The operational latency dashboard of an
    agent-transcript corpus: how long users wait for assistants, how
    long tool results take — and, fed back, the SLA outlier filter for
    curation. All-integer (epoch milliseconds), so cross-engine exact.

    Plan: one conversation-grain exchange (the ``lag`` window — same
    sort as ``tool_transition``; a production job computes all three
    sequence queries off ONE sorted pass), then one map-side-combinable
    aggregation over the ≤ |roles|² grid."""
    from pyspark.sql import Window

    t = transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        t.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("gap_ms", F.col("ms") - F.lag("ms").over(w))
        .filter(F.col("prev_role").isNotNull())
    )
    return gaps.groupBy(
        F.col("prev_role").alias("src_role"), F.col("role").alias("dst_role")
    ).agg(
        F.count("*").alias("n"),
        F.sum("gap_ms").alias("sum_ms"),
        F.min("gap_ms").alias("min_ms"),
        F.max("gap_ms").alias("max_ms"),
    )


def duck_turn_latency() -> str:
    """Oracle (compose after a ``transcripts`` CTE): same gaps via the
    turn_idx+1 self-join. The CTE exposes ``ts_epoch`` (bigint
    seconds); ``× 1000`` matches the engine's ``unix_millis`` exactly
    because the synthetic timestamps are whole seconds."""
    return """
        SELECT a.role AS src_role, b.role AS dst_role,
               COUNT(*) AS n,
               CAST(SUM((b.ts_epoch - a.ts_epoch) * 1000) AS BIGINT) AS sum_ms,
               MIN((b.ts_epoch - a.ts_epoch) * 1000) AS min_ms,
               MAX((b.ts_epoch - a.ts_epoch) * 1000) AS max_ms
        FROM transcripts a
        JOIN transcripts b
          ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
        GROUP BY 1, 2
    """


def conv_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(conv_id, n_turns, n_tool_turns, n_tool_kinds, first_tool_idx,
    max_chat_run) — per-conversation agentic-shape census: how many
    turns, how much of the conversation is tool work, how many distinct
    tools, when the first tool fires (−1 for pure-chat conversations),
    and the longest run of consecutive non-tool turns (the "talk
    stretch" between tool invocations). The conversation-grain segmenter
    for agent corpora: pure-chat vs tool-heavy conversations get
    different curation (and different candidate-window budgets)
    downstream. All-integer, so cross-engine exact.

    Plan: TWO conversation-grain aggregations over one corpus scan —
    the flat per-conv rollup (map-side combinable) and the
    gaps-and-islands run-length pass (one window sort over the chat
    subset, then count at (conv, island) grain, then max at conv
    grain) — joined at conv grain. Every exchange is keyed by conv_id
    (AQE reuses the sort exchange for the island aggregation); nothing
    is ever keyed finer than the conversation, so 1000 executors see
    pure hash-partitioned conversation streams."""
    from pyspark.sql import Window

    t = transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "tool"
    )
    flat = t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count("tool").alias("n_tool_turns"),
        F.count_distinct("tool").alias("n_tool_kinds"),
        F.coalesce(
            F.min(F.when(F.col("tool").isNotNull(), F.col("turn_idx"))),
            F.lit(-1),
        ).alias("first_tool_idx"),
    )
    chat = t.filter(F.col("tool").isNull())
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    runs = (
        chat.withColumn(
            "island", F.col("turn_idx") - F.row_number().over(w)
        )
        .groupBy("conv_id", "island")
        .agg(F.count("*").alias("run_len"))
        .groupBy("conv_id")
        .agg(F.max("run_len").alias("max_chat_run"))
    )
    return flat.join(runs, "conv_id", "left").select(
        "conv_id",
        "n_turns",
        "n_tool_turns",
        "n_tool_kinds",
        "first_tool_idx",
        F.coalesce("max_chat_run", F.lit(0)).alias("max_chat_run"),
    )


def duck_conv_shape() -> str:
    """Oracle (compose after a ``transcripts`` CTE — this fragment
    CONTINUES the WITH chain): the same two conversation-grain
    aggregations — an independent SQL-window formulation of the
    gaps-and-islands run length."""
    return """
        , flat AS (
            SELECT conv_id,
                   COUNT(*) AS n_turns,
                   COUNT(tool) AS n_tool_turns,
                   COUNT(DISTINCT tool) AS n_tool_kinds,
                   COALESCE(MIN(CASE WHEN tool IS NOT NULL
                                     THEN turn_idx END), -1) AS first_tool_idx
            FROM transcripts
            GROUP BY conv_id
        ),
        runs AS (
            SELECT conv_id, MAX(run_len) AS max_chat_run
            FROM (
                SELECT conv_id, island, COUNT(*) AS run_len
                FROM (
                    SELECT conv_id,
                           turn_idx - ROW_NUMBER() OVER (
                               PARTITION BY conv_id ORDER BY turn_idx
                           ) AS island
                    FROM transcripts WHERE tool IS NULL
                )
                GROUP BY conv_id, island
            )
            GROUP BY conv_id
        )
        SELECT f.conv_id, f.n_turns, f.n_tool_turns, f.n_tool_kinds,
               f.first_tool_idx, COALESCE(r.max_chat_run, 0) AS max_chat_run
        FROM flat f LEFT JOIN runs r ON r.conv_id = f.conv_id
    """


def response_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(role, n, sum_x, sum_y, slope_num, slope_den, slope_e6) —
    per-role least-squares drift of turn length over conversation
    position: does a role's output grow or shrink as conversations run
    long? (The behavioural-drift monitor for agent corpora: assistant
    verbosity creep and context-exhaustion truncation both show up as a
    non-zero slope.) The OLS slope over (x = turn_idx, y = chars) is
    kept EXACT: integer sufficient statistics, then
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` emitted as the
    integer (num, den) pair plus a sign-safe half-up-free e6 quotient
    (numerator may be negative — both engines divide the NEGATED
    positive product and negate back, avoiding the floor-vs-truncate
    divergence). All corpus-wide work is ONE map-side-combinable
    aggregation onto the |roles| grid; at 10^12 turns the int64
    sufficient statistics would swap to DECIMAL(38,0) — a type, not a
    plan, change."""
    t = transcripts(spark, sf_dir).select(
        "role",
        F.col("turn_idx").cast("long").alias("x"),
        F.length("text").cast("long").alias("y"),
    )
    agg = t.groupBy("role").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        "role",
        "n",
        "sum_x",
        "sum_y",
        F.expr("n * sxy - sum_x * sum_y").alias("slope_num"),
        F.expr("n * sxx - sum_x * sum_x").alias("slope_den"),
        F.expr(
            "CASE WHEN n * sxy - sum_x * sum_y >= 0"
            " THEN ((n * sxy - sum_x * sum_y) * 1000000)"
            " div (n * sxx - sum_x * sum_x)"
            " ELSE -(((sum_x * sum_y - n * sxy) * 1000000)"
            " div (n * sxx - sum_x * sum_x)) END"
        ).alias("slope_e6"),
    )


def duck_response_drift() -> str:
    """Oracle (compose after a ``transcripts`` CTE): identical integer
    sufficient statistics and the same sign-safe staged division."""
    return """
        SELECT role, n, sum_x, sum_y,
               n * sxy - sum_x * sum_y AS slope_num,
               n * sxx - sum_x * sum_x AS slope_den,
               CAST(CASE WHEN n * sxy - sum_x * sum_y >= 0
                    THEN ((n * sxy - sum_x * sum_y) * 1000000)
                         // (n * sxx - sum_x * sum_x)
                    ELSE -(((sum_x * sum_y - n * sxy) * 1000000)
                         // (n * sxx - sum_x * sum_x)) END AS BIGINT)
                   AS slope_e6
        FROM (
            SELECT role, COUNT(*) AS n,
                   CAST(SUM(turn_idx) AS BIGINT) AS sum_x,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_y,
                   CAST(SUM(turn_idx * CAST(length(text) AS BIGINT)) AS BIGINT) AS sxy,
                   CAST(SUM(turn_idx * CAST(turn_idx AS BIGINT)) AS BIGINT) AS sxx
            FROM transcripts
            GROUP BY role
        )
    """


def conv_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(depth, n_convs_at, n_convs_ge, survival_e6) — conversation
    depth survival curve: for every observed turn count d, how many
    conversations have EXACTLY d turns, how many reach AT LEAST d
    turns, and the half-up e6 survivor fraction. The retention census
    of an agent corpus (where do conversations die?) and the direct
    input to truncation/packing policy: choosing a max-turns cutoff K
    drops exactly 1 − survival(K) of conversations.

    Plan: one conv-grain count (map-side combinable — the only
    corpus-wide stage), one count onto the DEPTH grid (≤ max
    conversation length rows), then the ≥-cumulation as a window over
    the GRID — free. At 10^12 turns nothing after the first
    aggregation ever sees corpus-scale data."""
    per_conv = (
        transcripts(spark, sf_dir)
        .groupBy("conv_id")
        .agg(F.count("*").alias("depth"))
    )
    grid = per_conv.groupBy("depth").agg(F.count("*").alias("n_convs_at"))
    w_ge = (
        Window.orderBy(F.col("depth").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        grid.withColumn("n_convs_ge", F.sum("n_convs_at").over(w_ge))
        .withColumn("total", F.sum("n_convs_at").over(w_all))
        .select(
            "depth",
            "n_convs_at",
            "n_convs_ge",
            F.expr(
                "(n_convs_ge * 1000000 + total div 2) div total"
            ).alias("survival_e6"),
        )
    )


def duck_conv_survival() -> str:
    """Oracle (compose after a ``transcripts`` CTE — extends the CTE
    list, hence the leading comma): the same depth-grid cumulation."""
    return """
        , per_conv AS (
            SELECT conv_id, COUNT(*) AS depth FROM transcripts GROUP BY 1
        ),
        grid AS (
            SELECT depth, COUNT(*) AS n_convs_at FROM per_conv GROUP BY 1
        )
        SELECT depth, n_convs_at,
               CAST(SUM(n_convs_at) OVER (ORDER BY depth DESC) AS BIGINT) AS n_convs_ge,
               CAST((SUM(n_convs_at) OVER (ORDER BY depth DESC) * 1000000
                     + SUM(n_convs_at) OVER () // 2)
                    // SUM(n_convs_at) OVER () AS BIGINT) AS survival_e6
        FROM grid
    """


def echo_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_role, role, n_transitions, sum_tokens, sum_echoed,
    echo_e6) — parroting census over adjacent turn transitions: for
    every consecutive turn pair inside a conversation, how many of the
    later turn's DISTINCT tokens already appear in the immediately
    preceding turn, aggregated onto the |roles|² transition grid with
    the half-up e6 micro-averaged echo fraction. High
    user→assistant echo flags copy-through/parrot behaviour (low
    training value); high assistant→user echo flags quote-back
    confirmation loops. Token-set containment keeps both engines
    exact: Spark ``array_intersect`` and DuckDB ``list_intersect``
    both return the deduplicated common-element set.

    Plan: ONE conv-grain window (lag — the same (conv, turn_idx) sort
    every sequence operator shuffles on), per-row set algebra inside
    codegen, then one map-side-combinable aggregation onto the
    |roles|² grid. No join, no Python."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "role",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    pairs = (
        t.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_toks", F.lag("toks").over(w))
        .filter(F.col("prev_role").isNotNull())
        .select(
            "prev_role",
            "role",
            F.size("toks").cast("long").alias("n_tok"),
            F.size(F.array_intersect("toks", "prev_toks"))
            .cast("long")
            .alias("n_echo"),
        )
    )
    return pairs.groupBy("prev_role", "role").agg(
        F.count("*").alias("n_transitions"),
        F.sum("n_tok").alias("sum_tokens"),
        F.sum("n_echo").alias("sum_echoed"),
        F.expr(
            "(sum(n_echo) * 1000000 + sum(n_tok) div 2) div sum(n_tok)"
        ).alias("echo_e6"),
    )


def duck_echo_rate() -> str:
    """Oracle (compose after a ``transcripts`` CTE — extends the CTE
    list, hence the leading comma): identical lag + distinct-token
    intersection + grid aggregation."""
    return """
        , toks AS (
            SELECT conv_id, turn_idx, role,
                   list_distinct(string_split(text, ' ')) AS toks
            FROM transcripts
        ),
        pairs AS (
            SELECT LAG(role) OVER w AS prev_role, role,
                   CAST(len(toks) AS BIGINT) AS n_tok,
                   CAST(len(list_intersect(
                       toks, LAG(toks) OVER w)) AS BIGINT) AS n_echo
            FROM toks
            WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
        )
        SELECT prev_role, role, COUNT(*) AS n_transitions,
               CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
               CAST(SUM(n_echo) AS BIGINT) AS sum_echoed,
               CAST((SUM(n_echo) * 1000000 + SUM(n_tok) // 2)
                    // SUM(n_tok) AS BIGINT) AS echo_e6
        FROM pairs WHERE prev_role IS NOT NULL
        GROUP BY 1, 2
    """


def conv_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, n_convs, n_transitions) — lexical-cohesion histogram of
    conversations: each conversation's mean adjacent-turn Jaccard
    (distinct-token, half-up e6) is banded into deciles
    (``least(9, mean div 100000)``), then the band grid counts
    conversations and their transitions. The TextTiling-style topical
    -drift census at corpus grain: a left-shifted histogram means
    conversations wander (poor multi-turn coherence supervision), a
    right-shifted one means repetitive/templated dialogue. Single-turn
    conversations have no transitions and are excluded.

    Plan: ONE conversation-grain lag window, per-row set algebra in
    codegen, a conv-grain mean aggregation (same key as the window —
    no second corpus exchange), then a count onto the 10-row band
    grid. No join, no Python."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.array_distinct(F.split("text", " ")).alias("toks"),
    )
    jac = (
        t.withColumn("prev_toks", F.lag("toks").over(w))
        .filter(F.col("prev_toks").isNotNull())
        .select(
            "conv_id",
            F.size(F.array_intersect("toks", "prev_toks"))
            .cast("long")
            .alias("i"),
            (
                F.size("toks") + F.size("prev_toks")
                - F.size(F.array_intersect("toks", "prev_toks"))
            )
            .cast("long")
            .alias("u"),
        )
        .select(
            "conv_id",
            F.expr("(i * 1000000 + u div 2) div u").alias("jac_e6"),
        )
    )
    per_conv = jac.groupBy("conv_id").agg(
        F.count("*").alias("n_trans"),
        F.expr(
            "(sum(jac_e6) + count(*) div 2) div count(*)"
        ).alias("mean_jac_e6"),
    )
    return (
        per_conv.select(
            F.expr("least(9, mean_jac_e6 div 100000)").alias("band"),
            "n_trans",
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_convs"),
            F.sum("n_trans").alias("n_transitions"),
        )
    )


def duck_conv_cohesion() -> str:
    """Oracle (compose after a ``transcripts`` CTE — extends the CTE
    list, hence the leading comma): identical lag + Jaccard + decile
    banding."""
    return """
        , toks AS (
            SELECT conv_id, turn_idx,
                   list_distinct(string_split(text, ' ')) AS toks
            FROM transcripts
        ),
        jac AS (
            SELECT conv_id,
                   CAST((i * 1000000 + u // 2) // u AS BIGINT) AS jac_e6
            FROM (
                SELECT conv_id,
                       CAST(len(list_intersect(toks, LAG(toks) OVER w))
                            AS BIGINT) AS i,
                       CAST(len(toks) + len(LAG(toks) OVER w)
                            - len(list_intersect(toks, LAG(toks) OVER w))
                            AS BIGINT) AS u
                FROM toks
                WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
            )
            WHERE u IS NOT NULL
        ),
        per_conv AS (
            SELECT conv_id, COUNT(*) AS n_trans,
                   (SUM(jac_e6) + COUNT(*) // 2) // COUNT(*)
                       AS mean_jac_e6
            FROM jac GROUP BY conv_id
        )
        SELECT CAST(LEAST(9, mean_jac_e6 // 100000) AS BIGINT) AS band,
               COUNT(*) AS n_convs,
               CAST(SUM(n_trans) AS BIGINT) AS n_transitions
        FROM per_conv GROUP BY 1
    """


def tool_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(stage, n_convs, rate_e6) — ordered tool-adoption funnel over
    conversations: ``any`` (all conversations), ``search`` (used the
    search tool), ``search_then_code`` (used code strictly AFTER the
    first search — the agentic escalation pattern). The conversation-
    grain complement of ``event_funnel`` (user/event grain): a
    shallow funnel says tool use doesn't compound and multi-tool
    training examples are rare.

    Plan: one conversation-grain aggregation computes both first-use
    indices (min turn_idx per tool as conditional mins), then one
    global aggregation with conditional sums and a 1-row unpivot —
    one corpus pass, no window, no join."""
    t = transcripts(spark, sf_dir).select("conv_id", "turn_idx", "tool")
    per_conv = t.groupBy("conv_id").agg(
        F.min(
            F.when(F.col("tool") == "search", F.col("turn_idx"))
        ).alias("first_search"),
        F.min(
            F.when(F.col("tool") == "code", F.col("turn_idx"))
        ).alias("first_code"),
    )
    one = per_conv.agg(
        F.count("*").alias("n_any"),
        F.sum(
            F.col("first_search").isNotNull().cast("long")
        ).alias("n_search"),
        F.sum(
            (
                F.col("first_search").isNotNull()
                & (F.col("first_code") > F.col("first_search"))
            ).cast("long")
        ).alias("n_chain"),
    )
    return one.selectExpr(
        "n_any",
        "stack(3, 'any', n_any, 'search', n_search,"
        " 'search_then_code', n_chain) as (stage, n_convs)",
    ).selectExpr(
        "stage",
        "n_convs",
        "(n_convs * 1000000 + n_any div 2) div n_any as rate_e6",
    )


def duck_tool_funnel() -> str:
    """Oracle (compose after a ``transcripts`` CTE — extends the CTE
    list, hence the leading comma): identical conditional-min funnel."""
    return """
        , per_conv AS (
            SELECT conv_id,
                   MIN(CASE WHEN tool = 'search' THEN turn_idx END)
                       AS first_search,
                   MIN(CASE WHEN tool = 'code' THEN turn_idx END)
                       AS first_code
            FROM transcripts GROUP BY conv_id
        ),
        one AS (
            SELECT COUNT(*) AS n_any,
                   CAST(SUM(CASE WHEN first_search IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_search,
                   CAST(SUM(CASE WHEN first_search IS NOT NULL
                            AND first_code > first_search
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_chain
            FROM per_conv
        )
        SELECT stage, n_convs,
               CAST((n_convs * 1000000 + n_any // 2) // n_any AS BIGINT)
                   AS rate_e6
        FROM (
            SELECT n_any, 'any' AS stage, n_any AS n_convs FROM one
            UNION ALL
            SELECT n_any, 'search', n_search FROM one
            UNION ALL
            SELECT n_any, 'search_then_code', n_chain FROM one
        )
    """


def role_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(share_decile, n_convs, total_tokens) — assistant token-share
    census over conversations: per conversation the half-up e6 share
    of whitespace tokens spoken by the ``assistant`` role, bucketed
    into deciles (0–9, exact-100% landing in 9), with conversation
    counts and total token mass per bucket. The corpus-shape number an
    SFT/RLHF pipeline reads first: a mass concentrated in high deciles
    means assistant-heavy transcripts (cheap completion tokens,
    expensive prompt diversity); low deciles mean the assistant barely
    speaks and per-conversation supervision is thin.

    Plan: one narrow token-count projection, one conversation-grain
    conditional-sum aggregation (map-side combinable), then one count
    onto the 10-bucket grid — a single corpus pass, no window, no
    join."""
    t = transcripts(spark, sf_dir).select(
        "conv_id",
        "role",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    per_conv = t.groupBy("conv_id").agg(
        F.sum("n_tok").alias("tot"),
        F.sum(
            F.when(F.col("role") == "assistant", F.col("n_tok")).otherwise(
                F.lit(0)
            )
        ).alias("asst"),
    )
    bucketed = per_conv.select(
        "tot",
        F.least(
            F.expr("(asst * 1000000 + tot div 2) div tot div 100000"),
            F.lit(9).cast("long"),
        ).alias("share_decile"),
    )
    return bucketed.groupBy("share_decile").agg(
        F.count("*").alias("n_convs"),
        F.sum("tot").alias("total_tokens"),
    )


def duck_role_balance() -> str:
    """Oracle (compose after a ``transcripts`` CTE — extends the CTE
    list, hence the leading comma): identical conditional-sum share."""
    return """
        , per_conv AS (
            SELECT conv_id, CAST(SUM(n_tok) AS BIGINT) AS tot,
                   CAST(SUM(CASE WHEN role = 'assistant' THEN n_tok
                       ELSE 0 END) AS BIGINT) AS asst
            FROM (
                SELECT conv_id, role,
                       len(string_split(text, ' ')) AS n_tok
                FROM transcripts
            ) GROUP BY conv_id
        ),
        bucketed AS (
            SELECT tot,
                   LEAST((asst * 1000000 + tot // 2) // tot // 100000, 9)
                       AS share_decile
            FROM per_conv
        )
        SELECT share_decile, COUNT(*) AS n_convs,
               CAST(SUM(tot) AS BIGINT) AS total_tokens
        FROM bucketed GROUP BY 1
    """


def turn_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(multiplicity, n_classes, n_turns) — turn-grain exact-duplicate
    census: how many distinct turn texts occur once, twice, … across
    the whole corpus, with the turn mass per band. The transcript-
    native boilerplate detector (greetings, canned tool preambles,
    retry loops repeat at TURN grain, invisible to document-grain
    dedup and coarser than line_dedup's line grain) — a heavy
    multiplicity head is the signal to run turn-level dedup before
    pair generation wastes candidate budget on template turns.

    Plan: one turn-text count (the single corpus-grain exchange,
    map-side combinable), then a count onto the multiplicity grid —
    the same two-level shape as ``dedup_exact``, one grain finer."""
    t = transcripts(spark, sf_dir).select("text")
    classes = t.groupBy("text").agg(F.count("*").alias("multiplicity"))
    return classes.groupBy("multiplicity").agg(
        F.count("*").alias("n_classes"),
        (F.count("*") * F.col("multiplicity")).alias("n_turns"),
    )


def duck_turn_dedup() -> str:
    """Oracle (compose after a ``transcripts`` CTE — leading comma):
    identical two-level count."""
    return """
        , classes AS (
            SELECT text, COUNT(*) AS multiplicity
            FROM transcripts GROUP BY text
        )
        SELECT multiplicity, COUNT(*) AS n_classes,
               COUNT(*) * multiplicity AS n_turns
        FROM classes GROUP BY multiplicity
    """


CONTEXT_BUDGETS = (64, 256, 1024)


def conv_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(budget, n_convs_intact, turns_kept, turns_dropped,
    tokens_dropped) — context-window truncation census under the
    KEEP-THE-SUFFIX policy every chat assembly uses: for each audited
    token budget B, a turn survives iff the whitespace-token mass from
    it to the END of its conversation fits in B. The conversation-
    grain complement of ``truncation_loss`` (doc-grain prefix cutoff):
    it prices what context budgets actually destroy — early turns of
    long conversations — and ``n_convs_intact`` counts conversations
    that fit whole. All-integer.

    Plan: ONE reverse running-sum window per conversation (rows
    frame, state = one partial sum), a conversation-grain rollup, and
    one global aggregate unpivoted onto the |budgets| grid — one
    corpus pass regardless of how many budgets are audited."""
    from pyspark.sql import Window

    t = transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    per_turn = t.select(
        "conv_id", "n_tok", F.sum("n_tok").over(w).alias("sfx")
    )
    per_conv = per_turn.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        *[
            F.sum((F.col("sfx") <= b).cast("long")).alias(f"kept_{b}")
            for b in CONTEXT_BUDGETS
        ],
        *[
            F.sum(
                F.when(F.col("sfx") > b, F.col("n_tok")).otherwise(0)
            ).alias(f"drop_{b}")
            for b in CONTEXT_BUDGETS
        ],
    )
    one = per_conv.agg(
        F.sum("n_turns").alias("tot_turns"),
        *[
            F.sum(
                (F.col(f"kept_{b}") == F.col("n_turns")).cast("long")
            ).alias(f"intact_{b}")
            for b in CONTEXT_BUDGETS
        ],
        *[F.sum(f"kept_{b}").alias(f"k_{b}") for b in CONTEXT_BUDGETS],
        *[F.sum(f"drop_{b}").alias(f"d_{b}") for b in CONTEXT_BUDGETS],
    )
    cells = ", ".join(
        f"{b}L, intact_{b}, k_{b}, tot_turns - k_{b}, d_{b}"
        for b in CONTEXT_BUDGETS
    )
    return one.selectExpr(
        f"stack({len(CONTEXT_BUDGETS)}, {cells}) AS (budget,"
        " n_convs_intact, turns_kept, turns_dropped, tokens_dropped)"
    )


def duck_conv_context_budget() -> str:
    """Oracle (compose after a ``transcripts`` CTE — leading comma):
    identical reverse running sum and budget grid."""
    kept = ", ".join(
        f"SUM(CASE WHEN sfx <= {b} THEN 1 ELSE 0 END) AS kept_{b},"
        f" SUM(CASE WHEN sfx > {b} THEN n_tok ELSE 0 END) AS drop_{b}"
        for b in CONTEXT_BUDGETS
    )
    glob = ", ".join(
        f"CAST(SUM(CASE WHEN kept_{b} = n_turns THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS intact_{b}, CAST(SUM(kept_{b}) AS BIGINT) AS k_{b},"
        f" CAST(SUM(drop_{b}) AS BIGINT) AS d_{b}"
        for b in CONTEXT_BUDGETS
    )
    rows = " UNION ALL ".join(
        f"SELECT CAST({b} AS BIGINT) AS budget, intact_{b} AS n_convs_intact,"
        f" k_{b} AS turns_kept, tot_turns - k_{b} AS turns_dropped,"
        f" d_{b} AS tokens_dropped FROM one"
        for b in CONTEXT_BUDGETS
    )
    return f"""
        , per_turn AS (
            SELECT conv_id, n_tok,
                   SUM(n_tok) OVER (
                       PARTITION BY conv_id ORDER BY turn_idx DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS sfx
            FROM (
                SELECT conv_id, turn_idx,
                       len(string_split(text, ' ')) AS n_tok
                FROM transcripts
            )
        ),
        per_conv AS (
            SELECT conv_id, COUNT(*) AS n_turns, {kept}
            FROM per_turn GROUP BY conv_id
        ),
        one AS (SELECT CAST(SUM(n_turns) AS BIGINT) AS tot_turns, {glob} FROM per_conv)
        {rows}
    """


def tool_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tool, n_turns, sum_next_len, mean_next_len_e2) — does tool use
    change what the assistant says next? For every turn, the
    whitespace-token length of the NEXT turn in the conversation,
    aggregated by the current turn's tool (NULL tool → the ``none``
    baseline row). A search result that doubles the next turn's length
    is grounding being used; a tool whose next-turn length matches the
    baseline is plausibly ignored — the cheap causal-proxy readout an
    agent-platform team watches per release. ``mean_next_len_e2`` is
    the half-up 1e2 fixed-point mean (integers end-to-end).

    Plan: ONE lead window per conversation (same sort the other
    sequence queries share at 100 TB), then a map-side-combinable
    aggregation onto the ≤|tools|+1 grid."""
    from pyspark.sql import Window

    t = transcripts(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "tool",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    led = t.withColumn("next_len", F.lead("n_tok").over(w)).filter(
        F.col("next_len").isNotNull()
    )
    return led.groupBy(
        F.coalesce(F.col("tool"), F.lit("none")).alias("tool")
    ).agg(
        F.count("*").alias("n_turns"),
        F.sum("next_len").alias("sum_next_len"),
        F.expr(
            "(sum(next_len) * 100 + count(*) div 2) div count(*)"
        ).alias("mean_next_len_e2"),
    )


def duck_tool_effect() -> str:
    """Oracle (compose after a ``transcripts`` CTE — leading comma):
    the lead via the turn_idx+1 self-join (inner join ≡ the engine's
    next-turn-exists filter under dense per-conversation turn
    indices)."""
    return """
        , led AS (
            SELECT COALESCE(a.tool, 'none') AS tool,
                   len(string_split(b.text, ' ')) AS next_len
            FROM transcripts a
            JOIN transcripts b
              ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
        )
        SELECT tool, COUNT(*) AS n_turns,
               CAST(SUM(next_len) AS BIGINT) AS sum_next_len,
               CAST((SUM(next_len) * 100 + COUNT(*) // 2) // COUNT(*)
                    AS BIGINT) AS mean_next_len_e2
        FROM led GROUP BY tool
    """


def tool_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tool, n, sum_ms, min_ms, max_ms) — response latency by TOOL
    NAME: for each tool-bearing turn, the millisecond gap to the next
    turn in the conversation. The per-tool SLA complement of
    ``turn_latency`` (which aggregates by role transition): a tool
    whose max gap explodes is the pipeline's slow dependency, and the
    sum/n pair feeds any latency budget exactly (integers
    end-to-end).

    Plan: the same per-conversation sorted pass as the other sequence
    queries (one lead window), filtered to tool turns, then one
    map-side-combinable aggregation onto the |tools| grid."""
    from pyspark.sql import Window

    t = transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "tool", F.unix_millis("ts").alias("ms")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        t.withColumn("next_ms", F.lead("ms").over(w))
        .filter(F.col("tool").isNotNull() & F.col("next_ms").isNotNull())
        .select("tool", (F.col("next_ms") - F.col("ms")).alias("gap_ms"))
    )
    return gaps.groupBy("tool").agg(
        F.count("*").alias("n"),
        F.sum("gap_ms").alias("sum_ms"),
        F.min("gap_ms").alias("min_ms"),
        F.max("gap_ms").alias("max_ms"),
    )


def duck_tool_latency() -> str:
    """Oracle (compose after a ``transcripts`` CTE — leading comma):
    gaps via the turn_idx+1 self-join on bigint epoch seconds × 1000
    (the synthetic timestamps are whole seconds, so this matches
    ``unix_millis`` exactly)."""
    return """
        , gaps AS (
            SELECT a.tool, (b.ts_epoch - a.ts_epoch) * 1000 AS gap_ms
            FROM transcripts a
            JOIN transcripts b
              ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx + 1
            WHERE a.tool IS NOT NULL
        )
        SELECT tool, COUNT(*) AS n, CAST(SUM(gap_ms) AS BIGINT) AS sum_ms,
               MIN(gap_ms) AS min_ms, MAX(gap_ms) AS max_ms
        FROM gaps GROUP BY tool
    """
