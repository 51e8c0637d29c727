"""Distributed Gram matrix / PCA: exactness vs numpy, partial-merge
invariance under repartitioning, the driver-side eigen stage, and the
plan shape (cross-engine parity runs via tests/test_oracle_parity.py).
"""

from __future__ import annotations

import contextlib
import io
import re

import numpy as np
import pytest

from cross_sentence_relation_extraction_idepnn_spark.operators.linalg import (
    Q_SCALE,
    embedding_gram,
    gram_from_embeddings,
    gram_to_matrix,
    power_iteration,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    # final plan only (an executed memoized df appends the AQE initial plan)
    return buf.getvalue().split("== Initial Plan ==")[0]


def _numpy_gram(sf_dir: str) -> np.ndarray:
    import duckdb

    emb = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY ALL"
    ).fetchall()
    m = np.round(
        np.array([np.asarray(e, dtype=np.float64) for (e,) in emb]) * Q_SCALE
    ).astype(np.int64)
    return m.T @ m


def test_gram_matches_numpy_exactly(spark, sf_dir):
    want = _numpy_gram(sf_dir)
    rows = embedding_gram(spark, sf_dir).collect()
    d = want.shape[0]
    assert len(rows) == d * (d + 1) // 2
    for r in rows:
        assert want[r.i, r.j] == r.g, (r.i, r.j)


def test_gram_invariant_under_repartitioning(spark, sf_dir):
    """Per-task partials are associative: 1 partition and 13 partitions
    reduce to the same matrix (the decomposability the 100 TB merge
    tree relies on)."""
    from cross_sentence_relation_extraction_idepnn_spark.session import (
        read_parquet_cached,
    )

    emb = read_parquet_cached(spark, f"{sf_dir}/embeddings.parquet")
    one = sorted(
        map(tuple, gram_from_embeddings(emb.coalesce(1)).collect())
    )
    many = sorted(
        map(tuple, gram_from_embeddings(emb.repartition(13)).collect())
    )
    assert one == many


def test_power_iteration_matches_numpy_eigh(spark, sf_dir):
    rows = [r.asDict() for r in embedding_gram(spark, sf_dir).collect()]
    m = gram_to_matrix(rows)
    v, lam = power_iteration(m)
    w, vecs = np.linalg.eigh(m)
    # top eigenvalue and eigenvector (up to sign, which we fix)
    assert lam == pytest.approx(w[-1], rel=1e-9)
    assert abs(float(v @ vecs[:, -1])) == pytest.approx(1.0, abs=1e-6)
    # projection sanity: variance along v1 >= variance along any axis
    d = m.shape[0]
    assert lam >= max(m[i, i] for i in range(d))


def test_gram_plan_is_one_exchange_no_join(spark, sf_dir):
    """Corpus never shuffles: the only Exchange moves the constant-size
    per-task partials into the final (i, j) reduce."""
    plan = _plan(embedding_gram(spark, sf_dir))
    n_exchange = len(
        re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE)
    )
    assert n_exchange == 1, plan
    assert "Join" not in plan, plan


def test_embedding_quantize_exact_values_and_constant_vector(spark, tmp_path):
    """Hand-checked int8 quantization: [0.0, 1.0, 0.5] → millis
    (0, 1000, 500), rng 1000, q = (0, 255, 128) [500/1000 rounds UP at
    the exact midpoint], q_sum 383, sse = (500·255 − 128·1000)² =
    250000; a constant vector quantizes to all-zeros with sse 0. The
    DuckDB oracle agrees frame-exactly on the same fixture."""
    import duckdb

    from compare_util import assert_frames_match
    from cross_sentence_relation_extraction_idepnn_spark.operators import linalg

    rows = [(1, [0.0, 1.0, 0.5], "a"), (2, [0.25, 0.25, 0.25], "b")]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {
        r.vec_id: r
        for r in linalg.embedding_quantize(spark, str(tmp_path)).collect()
    }
    r1 = out[1]
    assert (r1.vmin, r1.vmax, r1.n_dims) == (0, 1000, 3)
    assert r1.q_sum == 0 + 255 + 128
    assert r1.sse == (500 * 255 - 128 * 1000) ** 2
    r2 = out[2]
    assert (r2.vmin, r2.vmax, r2.q_sum, r2.sse) == (250, 250, 0, 0)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    assert_frames_match(
        linalg.embedding_quantize(spark, str(tmp_path)),
        con,
        linalg.duck_embedding_quantize(),
    )
