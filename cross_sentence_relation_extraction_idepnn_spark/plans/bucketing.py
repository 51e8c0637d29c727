"""Bucketed-table materialization: co-located joins without a shuffle.

At 100 TB the KG triple table is joined on ``subj`` by every analytics
query (degrees, neighbors, rollups, entity enrichment). Rewriting that
exchange on every query is the dominant cost; bucketing the table ON
WRITE (`bucketBy(subj)`) makes the partitioning a durable property of
the storage layout, so any join between two tables bucketed on the
same key with the same bucket count runs with ZERO Exchange operators
— Spark's scan reports the bucket partitioning and the join reuses it
(the same role Iceberg's bucket partition transform plays in the
production deployment this repo targets).

``tests/test_plans.py::test_bucketed_kg_join_has_no_exchange`` pins
the plan: a subj-keyed self-enrichment join over the bucketed triple
table contains no Exchange, while the identical join over plain
parquet needs two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    keys: list[str],
    buckets: int = 8,
) -> None:
    """Materialize ``df`` as an external bucketed+sorted parquet table
    (hash-bucketed on ``keys``; files sorted by the same keys so
    downstream sort-merge joins can also skip the Sort when bucket
    files are single)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
        .format("parquet")
        .saveAsTable(name)
    )


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
