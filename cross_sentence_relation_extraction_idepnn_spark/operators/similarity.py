"""Similarity search over the ``embeddings`` table.

- ``cosine_topk``: brute-force cosine top-k — the correctness baseline.
  Query side is tiny → broadcast; dot products run as native
  ``zip_with``/``aggregate`` Column expressions in whole-stage codegen
  (no UDF), all in float64 so the DuckDB oracle matches bit-for-bit
  before rounding.
- ``lsh_ann_topk``: the scale path — sign-projection LSH buckets
  (deterministically chosen dimensions), candidates restricted to the
  query's bucket, then exact cosine within the bucket. At 100 TB the
  bucket join replaces the all-pairs scan; multiple probe tables would
  raise recall (documented, single table here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..hashing import py_h15

TOP_K = 5
N_QUERIES = 10
LSH_BITS = 8
EMB_DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """(query_id, rank, neighbor_id, cosine) — brute-force baseline."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    joined = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
            6,
        ).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cosine")
    )


def duck_cosine_topk(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {n_queries}),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   ROUND(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i]))
                         / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                            * sqrt(list_sum(list_transform(v, x -> x * x)))), 6) AS cosine
            FROM e JOIN q ON e.vec_id != q.query_id
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored)
        WHERE rank <= {k}
    """


def proj_dims(bits: int = LSH_BITS, dim: int = EMB_DIM) -> list[int]:
    """Deterministic projection dimensions for the sign-LSH bucket."""
    return [py_h15(f"proj-{j}") % dim for j in range(bits)]


def lsh_bucket_expr(col, dims: list[int]):
    return sum(
        F.when(F.element_at(col, d + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j, d in enumerate(dims)
    ).cast("int")


def lsh_ann_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """(query_id, rank, neighbor_id, cosine) within the query's LSH bucket."""
    dims = proj_dims()
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        "embedding",
        lsh_bucket_expr(F.col("embedding"), dims).alias("bucket"),
    )
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket"),
    )
    joined = emb.join(F.broadcast(q), "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
            6,
        ).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cosine")
    )


def duck_lsh_ann_topk(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    dims = proj_dims()
    bucket = " + ".join(
        f"CASE WHEN v[{d + 1}] > 0 THEN {1 << j} ELSE 0 END" for j, d in enumerate(dims)
    )
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                          CAST({bucket} AS INT) AS bucket
                   FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {n_queries}),
        scored AS (
            SELECT q.query_id, e.vec_id AS neighbor_id,
                   ROUND(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * e.v[i]))
                         / (sqrt(list_sum(list_transform(qv, x -> x * x)))
                            * sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) AS cosine
            FROM e JOIN q ON e.bucket = q.bucket AND e.vec_id != q.query_id
        )
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                           ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored)
        WHERE rank <= {k}
    """
