"""Distributed exact linear algebra over the embedding table: the
Gram (scatter) matrix and the PCA that falls out of it.

Why this is THE 100 TB shape for PCA/whitening: for a corpus matrix
``Q`` (n rows × d dims, n astronomically large, d small), everything
PCA needs is ``QᵀQ`` — a d×d matrix. Each Arrow batch contributes a
constant-size partial ``BᵀB`` (d×d int64), partials add, so the whole
computation is one ``mapInPandas`` scan producing ~``n_partitions``
tiny rows plus ONE reduce over d(d+1)/2 keys. Nothing corpus-sized
ever shuffles; the eigen-decomposition runs driver-side on the d×d
result (the classic "compute the Gram distributed, solve it locally"
split — Halko et al. 2011 §4 use the same shape for randomized PCA).

Exactness: embeddings are quantized JVM-side to integer millis
(``round(x * 1000)`` on the float32 value widened to double — both
engines widen float32→double losslessly and round half-away-from-zero,
the convention already proven cross-engine by ``temporal.gap_fill``'s
cents quantization), so every Gram entry is an exact int64 and the
driver hash comparison has no float hazard. Magnitudes: |q| ≤ ~1000·4
per coordinate, so a product is ≤ ~1.6e7 and int64 holds ~5.7e11 rows
per partial; beyond that a real deployment adds one intermediate
merge level (partials are associative), same as any decomposable agg.

The float stages (eigenvectors via power iteration, projections) stay
OUT of the parity surface and are pytest-verified against
``numpy.linalg.eigh`` — the same split as ``sketch.hll_estimate``.

No reference analogue (the reference never builds a Gram matrix);
this is the LLM-data-pipeline brief's embedding-ops family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_parquet_cached

Q_SCALE = 1000  # float32 → integer millis; exact in both engines


def embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, g) — upper triangle (i ≤ j) of the exact quantized Gram
    matrix ``QᵀQ`` over the embeddings table. d(d+1)/2 rows however
    large the corpus."""
    return gram_from_embeddings(
        read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    )


def gram_from_embeddings(emb: DataFrame) -> DataFrame:
    """One narrow scan (quantize is a codegen'd ``transform``), one
    Arrow kernel emitting a constant-size partial per batch-group, one
    tiny reduce. The kernel accumulates across ALL batches of its
    partition before emitting — partials per task, not per batch."""
    q = emb.select(
        F.expr(
            f"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT))"
        ).alias("q")
    )

    def part(batches):
        import numpy as np
        import pandas as pd

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray(pdf["q"].tolist(), dtype=np.int64)
            g = m.T @ m  # exact int64
            acc = g if acc is None else acc + g
        if acc is not None:
            iu, ju = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "g": acc[iu, ju],
                }
            )

    partials = q.mapInPandas(part, "i int, j int, g long")
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


def duck_embedding_gram() -> str:
    """Oracle in the other formulation: unnest to (vec_id, idx, q) and
    self-join on vec_id — quadratic in d per row, fine at oracle scale,
    and deliberately NOT the shape the Spark side uses."""
    return f"""
        WITH base AS (
            SELECT vec_id,
                   list_transform(
                       embedding,
                       x -> CAST(ROUND(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT)
                   ) AS ql
            FROM embeddings
        ),
        idx AS (SELECT vec_id, ql, UNNEST(range(1, len(ql) + 1)) AS i FROM base),
        e AS (SELECT vec_id, i, ql[i] AS q FROM idx)
        SELECT CAST(a.i - 1 AS INT) AS i, CAST(b.i - 1 AS INT) AS j,
               CAST(SUM(a.q * b.q) AS BIGINT) AS g
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    """


def gram_to_matrix(rows) -> "object":
    """Rebuild the symmetric d×d numpy matrix from collected
    (i, j, g) rows (driver-side: d(d+1)/2 values, constant size)."""
    import numpy as np

    d = max(r["j"] for r in rows) + 1
    m = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        m[r["i"], r["j"]] = r["g"]
        m[r["j"], r["i"]] = r["g"]
    return m


def power_iteration(m, iters: int = 200):
    """Principal eigenvector of a symmetric PSD matrix by normalized
    power iteration with a deterministic all-ones start — the float
    stage, pytest-verified against ``numpy.linalg.eigh``. Sign fixed
    so the largest-|coordinate| entry is positive."""
    import numpy as np

    v = np.ones(m.shape[0]) / np.sqrt(m.shape[0])
    for _ in range(iters):
        w = m @ v
        n = np.linalg.norm(w)
        if n == 0.0:
            return v, 0.0
        v = w / n
    lam = float(v @ m @ v)
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    return v, lam


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, vmin, vmax, n_dims, q_sum, sse) — per-vector int8
    min-max quantization audit: the storage decision every
    billion-vector ANN index makes (float32 → uint8 is a 4× index
    shrink) shipped WITH its measured reconstruction error instead of
    a hope. ``q_i = round(255·(x_i−min)/(max−min))``; ``q_sum`` is the
    codebook checksum and ``sse`` the exact squared reconstruction
    residual ``Σ((x_i−min)·255 − q_i·(max−min))²`` in (milli·255)²
    units — divide by ``n_dims·255²·10⁶`` for MSE in input units.

    Exactness discipline (the ``embedding_gram`` convention): values
    are first quantized to integer millis (float32→double widening +
    half-away rounding, proven cross-engine), then EVERYTHING —
    min/max, the rounded q via ``(2·diff·255 + rng) // (2·rng)``, the
    residuals — is int64 arithmetic: no float enters the parity
    surface at all. Plan: one narrow codegen scan, zero exchanges;
    constant vectors (rng = 0) quantize to all-zeros with sse 0."""
    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * {Q_SCALE}) AS BIGINT))"
        ).alias("v"),
    ).select(
        "vec_id",
        F.expr("array_min(v)").alias("vmin"),
        F.expr("array_max(v)").alias("vmax"),
        F.expr("CAST(size(v) AS BIGINT)").alias("n_dims"),
        F.expr(
            """aggregate(v, CAST(0 AS BIGINT), (acc, x) ->
                 acc + CASE WHEN array_max(v) = array_min(v) THEN CAST(0 AS BIGINT)
                 ELSE ((x - array_min(v)) * 510 + (array_max(v) - array_min(v)))
                      div (2 * (array_max(v) - array_min(v))) END)"""
        ).alias("q_sum"),
        F.expr(
            """aggregate(v, CAST(0 AS BIGINT), (acc, x) ->
                 acc + CASE WHEN array_max(v) = array_min(v) THEN CAST(0 AS BIGINT)
                 ELSE
                   ((x - array_min(v)) * 255
                    - (((x - array_min(v)) * 510 + (array_max(v) - array_min(v)))
                       div (2 * (array_max(v) - array_min(v))))
                      * (array_max(v) - array_min(v)))
                   * ((x - array_min(v)) * 255
                    - (((x - array_min(v)) * 510 + (array_max(v) - array_min(v)))
                       div (2 * (array_max(v) - array_min(v))))
                      * (array_max(v) - array_min(v))) END)"""
        ).alias("sse"),
    )


def duck_embedding_quantize() -> str:
    """Oracle: identical integer pipeline (millis quantization, the
    same ``(2·diff·255 + rng) // (2·rng)`` rounding, integer SSE)."""
    return f"""
        WITH e AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(ROUND(x * {Q_SCALE}) AS BIGINT)) AS v
            FROM embeddings
        ),
        m AS (
            SELECT vec_id, v,
                   list_min(v) AS vmin, list_max(v) AS vmax,
                   list_max(v) - list_min(v) AS rng
            FROM e
        )
        SELECT vec_id, vmin, vmax, CAST(len(v) AS BIGINT) AS n_dims,
               CAST(COALESCE(list_sum(list_transform(v, x ->
                   CASE WHEN rng = 0 THEN 0
                        ELSE ((x - vmin) * 510 + rng) // (2 * rng) END)), 0)
                   AS BIGINT) AS q_sum,
               CAST(COALESCE(list_sum(list_transform(v, x ->
                   CASE WHEN rng = 0 THEN 0
                        ELSE ((x - vmin) * 255
                              - (((x - vmin) * 510 + rng) // (2 * rng)) * rng)
                           * ((x - vmin) * 255
                              - (((x - vmin) * 510 + rng) // (2 * rng)) * rng)
                   END)), 0) AS BIGINT) AS sse
        FROM m
    """
