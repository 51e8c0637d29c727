"""dq_audit crafted-violation pins: every expectation must FIRE with
the exact planted count (the sf fixture is clean for most checks, so
without this the audit rows would be vacuous zeros), and the clean
twin of each check must stay zero."""

from __future__ import annotations

import os

from cross_sentence_relation_extraction_idepnn_spark.operators.audit import (
    dq_audit,
)


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, f"{name}.parquet"))


def test_dq_audit_counts_planted_violations_exactly(spark, tmp_path):
    sf = str(tmp_path)
    # events: 2 duplicate ids, 1 null props, 3 nonpositive values,
    # 2 ts regressions within user 1's event_id order
    ev = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-03 00:00:00", 1, "view", 2.0, "{}"),
        (3, "2024-01-02 00:00:00", 1, "view", 0.0, "{}"),   # regress+nonpos
        (4, "2024-01-01 00:00:00", 1, "view", -1.0, None),  # regress+nonpos+null
        (5, "2024-01-05 00:00:00", 2, "click", 0.0, "{}"),  # nonpos
        (5, "2024-01-05 00:00:00", 2, "view", 3.0, "{}"),   # dup id (same ts: dup order must not fabricate a regression)
        (6, "2024-01-07 00:00:00", 2, "view", 4.0, "{}"),
        (6, "2024-01-08 00:00:00", 3, "view", 5.0, "{}"),   # dup id
    ]
    _write(
        spark, sf, "events", ev,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    )
    _write(
        spark, sf, "customer",
        [(1, -5.0), (2, 10.0), (3, 0.0)],
        "c_custkey bigint, c_acctbal double",
    )
    _write(
        spark, sf, "orders",
        [(100, 1), (101, 2), (102, 99), (103, 98)],  # 2 orphans
        "o_orderkey bigint, o_custkey bigint",
    )
    _write(
        spark, sf, "lineitem",
        [(100, 1), (100, 2), (999, 1)],  # 1 orphan
        "l_orderkey bigint, l_linenumber bigint",
    )
    _write(
        spark, sf, "documents",
        [(1, "hello"), (2, ""), (3, None)],  # 2 empty
        "doc_id bigint, text string",
    )

    got = {
        (r.tbl, r.chk): (r.n_bad, r.n_rows)
        for r in dq_audit(spark, sf).collect()
    }
    # events.ts is read as string here; dq_audit compares ts ordering —
    # ISO strings order identically to timestamps, so counts hold
    assert got[("events", "unique_event_id")] == (2, 8)
    assert got[("events", "null_props")] == (1, 8)
    assert got[("events", "nonpos_value")] == (3, 8)
    assert got[("events", "ts_regression")] == (2, 8)
    assert got[("orders", "fk_custkey")] == (2, 4)
    assert got[("lineitem", "fk_orderkey")] == (1, 3)
    assert got[("customer", "negative_acctbal")] == (1, 3)
    assert got[("documents", "empty_text")] == (2, 3)


def test_dq_audit_result_is_check_grain(spark, sf_dir):
    """O(#checks) rows regardless of input size, and the fixture's
    TPC-H-shaped customer table keeps negative_acctbal non-vacuous."""
    rows = dq_audit(spark, sf_dir).collect()
    assert len(rows) == 8
    by = {(r.tbl, r.chk): r.n_bad for r in rows}
    assert by[("customer", "negative_acctbal")] > 0
    assert by[("orders", "fk_custkey")] == 0
    assert by[("lineitem", "fk_orderkey")] == 0


def test_table_stats_crafted_exact_values(spark, tmp_path):
    """Hand-computed statistics: ndv counts ignore NULLs, money is
    exact cents, timestamps are epoch µs, strings report max_len with
    NULL min_i/max_i."""
    sf = str(tmp_path)
    _write(
        spark, sf, "documents",
        [
            (1, "hello world", "en", "web", 11),
            (2, None, "en", "web", None),
            (3, "abc", None, "chat", 3),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    ev = [
        (10, "2024-01-01 00:00:00", 7, "click", 1.25, "{}"),
        (11, "2024-01-02 00:00:01", 7, "view", -0.5, None),
        (12, "2024-01-01 12:00:00", 8, "click", 1.25, "{}"),
    ]
    _write(
        spark, sf, "events", ev,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    )
    # table_stats expects a real timestamp column
    import os

    from pyspark.sql import functions as F

    spark.read.parquet(os.path.join(sf, "events.parquet")).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    ).write.mode("overwrite").parquet(os.path.join(sf, "events2.parquet"))
    os.system(f"rm -rf {sf}/events.parquet && mv {sf}/events2.parquet {sf}/events.parquet")

    from cross_sentence_relation_extraction_idepnn_spark.operators.audit import table_stats

    got = {(r.tbl, r.col): r for r in table_stats(spark, sf).collect()}
    t = got[("documents", "text")]
    assert (t.n_rows, t.n_null, t.n_distinct, t.max_len) == (3, 1, 2, 11)
    assert t.min_i is None and t.max_i is None
    n = got[("documents", "n_chars")]
    assert (n.n_null, n.n_distinct, n.min_i, n.max_i) == (1, 2, 3, 11)
    v = got[("events", "value")]
    assert (v.n_distinct, v.min_i, v.max_i) == (2, -50, 125)
    ts = got[("events", "ts")]
    day_us = 86_400_000_000
    epoch_0101 = 19723 * day_us  # 2024-01-01 in days since 1970-01-01
    assert ts.min_i == epoch_0101
    assert ts.max_i == epoch_0101 + day_us + 1_000_000
    assert got[("events", "user_id")].n_distinct == 2
