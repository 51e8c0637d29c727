"""Cross-table data-quality expectation suite (``dq_audit``).

A production ingestion pipeline gates every load behind declarative
expectations (the Deequ / Great Expectations / dbt-test pattern): FK
referential integrity, key uniqueness, null budgets, domain ranges,
and ordering invariants, each reported as an exact violation count so
the gate is a threshold comparison, not a judgment call.

Engine shape at 100 TB: every expectation over one table rides a
SINGLE conditional-aggregation pass (one scan → one row, unpivoted to
one row per check with ``stack``); the two FK checks are dimension
joins — customer keys broadcast against orders, and the
orders-key/lineitem check a plain shuffled left join that AQE turns
into a broadcast when the key side fits. The ordering check
(per-user event-time regressions vs the event_id write order) is one
window on the natural (user_id) partitioning. Nothing here is
corpus-grain × corpus-grain; the audit result is O(#checks) rows
regardless of input size.

No reference analogue (iDepNN consumes pre-cleaned corpora); this is
the LLM-pipeline brief's observability surface, same family as
``curation_funnel`` / ``props_profile``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_parquet_cached

AUDIT_COLS = ["tbl", "chk", "n_bad", "n_rows"]


def _stack(df_onerow: DataFrame, tbl: str, checks: list[str]) -> DataFrame:
    """Unpivot a one-row conditional-agg result (columns named after
    the checks, plus ``n_rows``) into (tbl, chk, n_bad, n_rows)."""
    args = ", ".join(f"'{c}', `{c}`" for c in checks)
    return df_onerow.select(
        F.lit(tbl).alias("tbl"),
        F.expr(f"stack({len(checks)}, {args}) AS (chk, n_bad)"),
        F.col("n_rows"),
    ).select(*AUDIT_COLS)


def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tbl, chk, n_bad, n_rows) — one row per expectation:

    - ``events.unique_event_id``   duplicate primary keys
    - ``events.null_props``        null payload budget
    - ``events.nonpos_value``      domain: value must be > 0
    - ``events.ts_regression``     event_time going backwards within a
      user's event_id (write-order) sequence — the out-of-orderness
      the streaming watermark has to absorb
    - ``orders.fk_custkey``        orders → customer orphans
    - ``lineitem.fk_orderkey``     lineitem → orders orphans
    - ``customer.negative_acctbal`` credit-hold accounts (non-zero on
      TPC-H-shaped data — keeps the audit non-vacuous)
    - ``documents.empty_text``     zero-length payloads
    """
    events = read_parquet_cached(spark, f"{sf_dir}/events.parquet")
    orders = read_parquet_cached(spark, f"{sf_dir}/orders.parquet")
    lineitem = read_parquet_cached(spark, f"{sf_dir}/lineitem.parquet")
    customer = read_parquet_cached(spark, f"{sf_dir}/customer.parquet")
    documents = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")

    lng = lambda c: c.cast("long")  # noqa: E731

    ev = events.agg(
        lng(F.count("*") - F.count_distinct("event_id")).alias(
            "unique_event_id"
        ),
        lng(F.sum(F.col("props").isNull().cast("int"))).alias("null_props"),
        lng(F.sum((F.col("value") <= 0).cast("int"))).alias("nonpos_value"),
        lng(F.count("*")).alias("n_rows"),
    )
    ev_checks = _stack(
        ev, "events", ["unique_event_id", "null_props", "nonpos_value"]
    )

    w = Window.partitionBy("user_id").orderBy("event_id")
    ev_order = (
        events.withColumn("prev_ts", F.lag("ts").over(w))
        .agg(
            lng(
                F.sum(
                    F.when(F.col("ts") < F.col("prev_ts"), 1).otherwise(0)
                )
            ).alias("ts_regression"),
            lng(F.count("*")).alias("n_rows"),
        )
    )
    ev_order_checks = _stack(ev_order, "events", ["ts_regression"])

    ord_fk = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders.o_custkey == F.col("c_custkey"),
            "left",
        )
        .agg(
            lng(F.sum(F.col("c_custkey").isNull().cast("int"))).alias(
                "fk_custkey"
            ),
            lng(F.count("*")).alias("n_rows"),
        )
    )
    ord_checks = _stack(ord_fk, "orders", ["fk_custkey"])

    li_fk = (
        lineitem.join(
            orders.select("o_orderkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            lng(F.sum(F.col("o_orderkey").isNull().cast("int"))).alias(
                "fk_orderkey"
            ),
            lng(F.count("*")).alias("n_rows"),
        )
    )
    li_checks = _stack(li_fk, "lineitem", ["fk_orderkey"])

    cust = customer.agg(
        lng(F.sum((F.col("c_acctbal") < 0).cast("int"))).alias(
            "negative_acctbal"
        ),
        lng(F.count("*")).alias("n_rows"),
    )
    cust_checks = _stack(cust, "customer", ["negative_acctbal"])

    docs = documents.agg(
        lng(
            F.sum(
                (
                    F.col("text").isNull() | (F.length("text") == 0)
                ).cast("int")
            )
        ).alias("empty_text"),
        lng(F.count("*")).alias("n_rows"),
    )
    doc_checks = _stack(docs, "documents", ["empty_text"])

    out = ev_checks
    for part in (
        ev_order_checks,
        ord_checks,
        li_checks,
        cust_checks,
        doc_checks,
    ):
        out = out.unionByName(part)
    return out


def duck_dq_audit() -> str:
    """Oracle: the same expectations as independent scalar subqueries
    (one UNION ALL branch per check)."""
    return """
        SELECT 'events' AS tbl, 'unique_event_id' AS chk,
               CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS n_bad,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events
        UNION ALL
        SELECT 'events', 'null_props',
               CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'events', 'nonpos_value',
               CAST(SUM(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'events', 'ts_regression',
               (SELECT CAST(SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END)
                            AS BIGINT)
                FROM (SELECT ts, LAG(ts) OVER (
                          PARTITION BY user_id ORDER BY event_id
                      ) AS prev_ts FROM events)),
               CAST(COUNT(*) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'orders', 'fk_custkey',
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        UNION ALL
        SELECT 'lineitem', 'fk_orderkey',
               CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        UNION ALL
        SELECT 'customer', 'negative_acctbal',
               CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'documents', 'empty_text',
               CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0
                             THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM documents
    """


# -------------------------------------------------------- table stats

# (column, kind): kind selects the exact-integer min/max encoding —
# 'int' as-is, 'cents' = round(value·100) (the events_rollup cents
# convention), 'us' = epoch microseconds, 'str' = lengths only.
STATS_COLS = {
    "documents": [
        ("doc_id", "int"),
        ("text", "str"),
        ("lang", "str"),
        ("source", "str"),
        ("n_chars", "int"),
    ],
    "events": [
        ("event_id", "int"),
        ("ts", "us"),
        ("user_id", "int"),
        ("event_type", "str"),
        ("value", "cents"),
        ("props", "str"),
    ],
}


def _stat_expr(col: str, kind: str):
    if kind == "int":
        return F.col(col).cast("long")
    if kind == "cents":
        return F.round(F.col(col) * 100).cast("long")
    if kind == "us":
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        ).cast("long")
    return None


def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tbl, col, n_rows, n_null, n_distinct, min_i, max_i, max_len) —
    the optimizer/monitoring statistics surface (ANALYZE TABLE): per
    column, row count, null count, EXACT distinct count, integer-coded
    min/max (ids as-is, money in cents, timestamps in epoch µs;
    NULL for strings), and max string length (NULL for non-strings).

    One conditional-aggregation pass per table (one scan → one wide
    row → ``stack`` to column grain). Exact ``count_distinct`` is the
    correctness baseline and is the expensive part at 100 TB (Spark
    expands the multi-distinct aggregate); the engine's scale path for
    NDV is the mergeable ``hll_registers``/``kmv_sketch`` pair — this
    operator is what you VALIDATE those sketches against on samples.
    Output is O(#columns) rows."""
    out = None
    for tbl, specs in STATS_COLS.items():
        df = read_parquet_cached(spark, f"{sf_dir}/{tbl}.parquet")
        aggs = [F.count("*").cast("long").alias("n_rows")]
        for c, kind in specs:
            aggs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn")
            )
            aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"{c}__nd"))
            e = _stat_expr(c, kind)
            if e is not None:
                aggs.append(F.min(e).alias(f"{c}__mn"))
                aggs.append(F.max(e).alias(f"{c}__mx"))
                aggs.append(F.lit(None).cast("long").alias(f"{c}__ml"))
            else:
                aggs.append(F.lit(None).cast("long").alias(f"{c}__mn"))
                aggs.append(F.lit(None).cast("long").alias(f"{c}__mx"))
                aggs.append(
                    F.max(F.length(c)).cast("long").alias(f"{c}__ml")
                )
        one = df.agg(*aggs)
        args = ", ".join(
            f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`, `{c}__ml`"
            for c, _ in specs
        )
        part = one.select(
            F.lit(tbl).alias("tbl"),
            F.expr(
                f"stack({len(specs)}, {args})"
                " AS (col, n_null, n_distinct, min_i, max_i, max_len)"
            ),
            "n_rows",
        ).select(
            "tbl", "col", "n_rows", "n_null", "n_distinct",
            "min_i", "max_i", "max_len",
        )
        out = part if out is None else out.unionByName(part)
    return out


def duck_table_stats() -> str:
    """Oracle: one UNION ALL branch per (table, column) with the same
    integer encodings."""
    branches = []
    for tbl, specs in STATS_COLS.items():
        for c, kind in specs:
            if kind == "int":
                mn, mx = f"MIN(CAST({c} AS BIGINT))", f"MAX(CAST({c} AS BIGINT))"
                ml = "NULL"
            elif kind == "cents":
                mn = f"MIN(CAST(ROUND({c} * 100) AS BIGINT))"
                mx = f"MAX(CAST(ROUND({c} * 100) AS BIGINT))"
                ml = "NULL"
            elif kind == "us":
                mn, mx = f"MIN(epoch_us({c}))", f"MAX(epoch_us({c}))"
                ml = "NULL"
            else:
                mn = mx = "NULL"
                ml = f"MAX(length({c}))"
            branches.append(f"""
        SELECT '{tbl}' AS tbl, '{c}' AS col,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST({mn} AS BIGINT) AS min_i,
               CAST({mx} AS BIGINT) AS max_i,
               CAST({ml} AS BIGINT) AS max_len
        FROM {tbl}""")
    return "\n        UNION ALL\n".join(branches)
