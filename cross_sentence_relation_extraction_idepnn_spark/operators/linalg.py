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
               SUM(a.q * b.q) AS g
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
