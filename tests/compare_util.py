"""Shared Spark-vs-DuckDB comparison helper for oracle parity tests."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def compare_frames(spark_df, con, sql: str) -> dict:
    """Non-raising variant of :func:`assert_frames_match` returning the
    driver-harness row shape (rows/schema/hash match flags + counts).
    Used by ``jobs/parity_self.py`` to record ``PARITY_SELF.json``."""
    spd = spark_df.toPandas()
    dpd = con.sql(sql).df()
    schema_match = sorted(spd.columns) == sorted(dpd.columns)
    rows_match = len(spd) == len(dpd)
    hash_match = False
    err = None
    if schema_match and rows_match:
        try:
            cols = sorted(spd.columns)
            a = spd[cols].sort_values(cols).reset_index(drop=True)
            b = dpd[cols].sort_values(cols).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False)
            hash_match = True
        except AssertionError as exc:
            err = str(exc)[:300]
    return {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": hash_match,
        "spark_rows": len(spd),
        "oracle_rows": len(dpd),
        "err": err,
    }


def assert_frames_match(spark_df, con, sql: str) -> pd.DataFrame:
    """Order-insensitive, dtype-lenient equality of a Spark DataFrame
    against a DuckDB query (mirrors the driver's correctness gate)."""
    spd = spark_df.toPandas()
    dpd = con.sql(sql).df()
    assert sorted(spd.columns) == sorted(dpd.columns), (
        f"columns differ: {sorted(spd.columns)} vs {sorted(dpd.columns)}"
    )
    cols = sorted(spd.columns)
    spd = spd[cols].sort_values(cols).reset_index(drop=True)
    dpd = dpd[cols].sort_values(cols).reset_index(drop=True)
    assert len(spd) == len(dpd), f"row counts differ: {len(spd)} vs {len(dpd)}"
    pd.testing.assert_frame_equal(spd, dpd, check_dtype=False)
    return spd
