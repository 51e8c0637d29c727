"""Sketch-family semantics: estimator accuracy, the merge property
(the thing that makes sketches useful at 100 TB — per-shard states
roll up without re-reading history), CMS point-query guarantees, and
the kg_triangles crafted-graph pin. The bit-level Spark-vs-DuckDB
parity of the sketch STATE lives in test_oracle_parity.py."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_BUCKETS,
    cms_from_docs,
    cms_query,
    cms_sketch,
    hll_estimate,
    hll_from_docs,
    hll_registers,
)
from cross_sentence_relation_extraction_idepnn_spark.session import (
    read_parquet_cached,
    release_caches,
)


def _docs(spark, sf_dir):
    return read_parquet_cached(spark, f"{sf_dir}/documents.parquet")


def test_hll_estimate_tracks_exact_distinct(spark, sf_dir):
    regs = hll_registers(spark, sf_dir).toPandas()
    exact = duckdb.sql(
        f"SELECT source, COUNT(DISTINCT text) AS n "
        f"FROM '{sf_dir}/documents.parquet' GROUP BY source"
    ).df()
    assert set(regs["source"]) == set(exact["source"])
    for _, row in exact.iterrows():
        sub = regs[regs["source"] == row["source"]]
        registers = dict(zip(sub["bucket"], sub["max_rank"]))
        est = hll_estimate(registers)
        # p=6 → σ ≈ 13%; allow 3.5σ (plus linear-counting small range)
        assert abs(est - row["n"]) <= max(0.45 * row["n"], 3), (
            row["source"], est, row["n"],
        )


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Registers over the full corpus == element-wise MAX of registers
    over any partition of it (here: doc_id parity halves)."""
    docs = _docs(spark, sf_dir)
    full = hll_from_docs(docs).toPandas()
    halves = [
        hll_from_docs(docs.filter(F.col("doc_id") % 2 == i)).toPandas()
        for i in (0, 1)
    ]
    import pandas as pd

    merged = (
        pd.concat(halves)
        .groupby(["source", "bucket"], as_index=False)["max_rank"]
        .max()
    )
    key = ["source", "bucket", "max_rank"]
    assert sorted(map(tuple, full[key].values.tolist())) == sorted(
        map(tuple, merged[key].values.tolist())
    )


def test_cms_merges_and_never_undercounts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    full = cms_sketch(spark, sf_dir).toPandas()
    grid = {(r, c): n for r, c, n in full.itertuples(index=False)}
    assert len(grid) <= CMS_DEPTH * CMS_WIDTH  # constant-size state

    # merge property: cell-wise sum of parity-half grids == full grid
    import pandas as pd

    halves = [
        cms_from_docs(docs.filter(F.col("doc_id") % 2 == i)).toPandas()
        for i in (0, 1)
    ]
    merged = pd.concat(halves).groupby(["r", "c"], as_index=False)["cnt"].sum()
    assert sorted(map(tuple, merged.values.tolist())) == sorted(
        map(tuple, full.values.tolist())
    )

    # point queries: never under-count, bounded by total mass
    exact = duckdb.sql(
        f"SELECT tok, COUNT(*) AS n FROM (SELECT UNNEST(string_split(text, ' ')) AS tok "
        f"FROM '{sf_dir}/documents.parquet') GROUP BY tok ORDER BY n DESC LIMIT 20"
    ).df()
    total = int(duckdb.sql(
        f"SELECT SUM(len(string_split(text, ' '))) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0])
    for tok, n in exact.itertuples(index=False):
        est = cms_query(grid, tok)
        assert est >= n
        assert est <= total


def test_kg_triangles_crafted(spark):
    """K4 on {A,B,C,D} (4 triangles, each node in 3) plus a dangling
    edge D—E (E in 0)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_triangles,
    )

    k4 = [
        ("A", "B"), ("A", "C"), ("A", "D"),
        ("B", "C"), ("B", "D"), ("C", "D"),
    ]
    kg = spark.createDataFrame(
        [(a, "r", b, 1) for a, b in k4 + [("D", "E")]],
        "subj string, pred string, obj string, support long",
    )
    got = {r["node"]: r["n_tri"] for r in kg_triangles(kg).collect()}
    release_caches()
    assert got == {"A": 3, "B": 3, "C": 3, "D": 3, "E": 0}


def test_kg_triangles_direction_and_dup_invariant(spark):
    """Reversed / duplicated / self-loop edges must not change the
    undirected triangle counts."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_triangles,
    )

    tri = [("A", "B"), ("B", "C"), ("C", "A")]
    noisy = tri + [("B", "A"), ("A", "B"), ("A", "A")]
    kg = spark.createDataFrame(
        [(a, "r", b, 1) for a, b in noisy],
        "subj string, pred string, obj string, support long",
    )
    got = {r["node"]: r["n_tri"] for r in kg_triangles(kg).collect()}
    release_caches()
    assert got == {"A": 1, "B": 1, "C": 1}


def test_heavy_hitters_prefilter_is_lossless_and_prunes(spark, sf_dir):
    """Two-pass heavy hitters: the result must equal the brute-force
    HAVING query exactly (CMS never under-counts ⇒ no heavy hitter is
    pruned), AND the CMS prefilter must actually prune — some token's
    estimate falls below the threshold."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        HH_MIN_THRESHOLD,
        HH_THRESHOLD_DIV,
        cms_query,
        cms_sketch,
        heavy_hitters,
    )

    got = {
        (r["tok"], r["n"]) for r in heavy_hitters(spark, sf_dir).collect()
    }
    exact = duckdb.sql(
        f"SELECT tok, COUNT(*) AS n FROM (SELECT UNNEST(string_split(text, ' ')) "
        f"AS tok FROM '{sf_dir}/documents.parquet') GROUP BY tok"
    ).df()
    total = int(exact["n"].sum())
    thr = max(HH_MIN_THRESHOLD, total // HH_THRESHOLD_DIV)
    want = {
        (t, int(n)) for t, n in exact.itertuples(index=False) if n >= thr
    }
    assert got == want and got
    # non-vacuous pruning: at least one token's estimate is sub-threshold
    grid = {(r, c): n for r, c, n in cms_sketch(spark, sf_dir).collect()}
    ests = [cms_query(grid, t) for t in exact["tok"].head(500)]
    assert any(e < thr for e in ests), "prefilter never pruned anything"


# --------------------------------------------------- fixed-bin histogram


def test_histogram_counts_match_numpy_binning(spark, sf_dir):
    import numpy as np

    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        HIST_BIN_WIDTH,
        HIST_BINS,
        value_histogram,
    )

    got = {
        (r.event_type, r.bin): r.cnt
        for r in value_histogram(spark, sf_dir).collect()
    }
    import duckdb as _dd

    rows = _dd.sql(
        f"SELECT event_type, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    want: dict = {}
    for t, v in rows:
        b = int(min(max(np.floor(v / HIST_BIN_WIDTH), 0), HIST_BINS - 1))
        want[(t, b)] = want.get((t, b), 0) + 1
    assert got == want


def test_histogram_clamps_out_of_range_values(spark):
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        histogram_from_events,
    )

    df = spark.createDataFrame(
        [(1, -3.0), (2, 0.0), (3, 7.99), (4, 8.0), (5, 1e9)],
        "event_id bigint, value double",
    ).withColumn("event_type", F.lit("x"))
    got = {r.bin: r.cnt for r in histogram_from_events(df).collect()}
    assert got == {0: 3, 1: 1, 63: 1}


def test_histogram_quantile_within_one_bin_width(spark, sf_dir):
    import numpy as np

    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        HIST_BIN_WIDTH,
        histogram_quantile,
        value_histogram,
    )

    rows = value_histogram(spark, sf_dir).collect()
    import duckdb as _dd

    vals = np.array(
        [
            v
            for (v,) in _dd.sql(
                f"SELECT value FROM '{sf_dir}/events.parquet'"
            ).fetchall()
        ]
    )
    # merge across types: cell-wise addition (the mergeability claim)
    bins: dict = {}
    for r in rows:
        bins[r.bin] = bins.get(r.bin, 0) + r.cnt
    for q in (0.1, 0.5, 0.9, 0.99):
        est = histogram_quantile(bins, q)
        exact = float(np.quantile(vals, q))
        assert abs(est - exact) <= HIST_BIN_WIDTH, (q, est, exact)


# ------------------------------------------------------------- KMV


def test_kmv_merge_law_scopes_roll_up_to_all(spark, sf_dir):
    """kmv(A ∪ B ∪ …) = merge(kmv(A), kmv(B), …): the __all__ scope's
    value list must equal the Python bigint merge of the per-source
    bottom-k lists — per-shard sketches roll up without re-reading."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        KMV_K,
        KMV_SCOPE_ALL,
        kmv_merge,
        kmv_sketch,
    )

    rows = kmv_sketch(spark, sf_dir).collect()
    by_scope: dict = {}
    for r in rows:
        by_scope.setdefault(r.scope, []).append((r.k_rank, r.hval))
    got_all = [h for _, h in sorted(by_scope.pop(KMV_SCOPE_ALL))]
    merged = kmv_merge(
        [[h for _, h in sorted(v)] for v in by_scope.values()], KMV_K
    )
    assert got_all == merged
    release_caches()


def test_kmv_estimator_tracks_exact_distinct(spark, sf_dir):
    """Full sketch: (k-1)·2^60/h_k within the bottom-k error envelope
    of the exact distinct count; undersized sketch: exact."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        KMV_K,
        KMV_SCOPE_ALL,
        kmv_estimate,
        kmv_sketch,
    )

    vals = [
        r.hval
        for r in kmv_sketch(spark, sf_dir)
        .filter(F.col("scope") == KMV_SCOPE_ALL)
        .orderBy("k_rank")
        .collect()
    ]
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT text) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    est = kmv_estimate(vals, KMV_K)
    if len(vals) < KMV_K:
        assert est == float(exact)
    else:
        # bottom-k relative std error ≈ 1/sqrt(k-1) ≈ 18% at k=32;
        # 3-sigma envelope
        assert abs(est - exact) / exact < 0.55, (est, exact)
    release_caches()


def test_kmv_intersection_estimate_exact_regimes():
    """Crafted sketches where the estimator's answer is derivable by
    hand: identical sets → the union estimate; disjoint sets → 0."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        kmv_estimate,
        kmv_intersection_estimate,
        kmv_merge,
    )

    k = 8
    a = [10, 20, 30, 40, 50, 60, 70, 80]
    assert kmv_intersection_estimate(a, list(a), k) == kmv_estimate(a, k)
    b = [15, 25, 35, 45, 55, 65, 75, 85]
    assert kmv_intersection_estimate(a, b, k) == 0.0
    assert kmv_merge([a, b], k) == [10, 15, 20, 25, 30, 35, 40, 45]


# --------------------------------------------- join size estimation


def test_join_size_est_exact_twin_and_upper_bound(spark, sf_dir):
    """The exact join size must equal a python Σ aₖ·bₖ over pandas
    counts; the CMS inner-product estimate must NEVER under-count
    (AMS/CMS guarantee: collisions only add mass) and must be exact
    when no two keys collide in some depth's row."""
    import collections

    import pandas as pd

    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        join_size_est,
    )

    r = join_size_est(spark, sf_dir).first()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[["event_id", "user_id"]]
    a = collections.Counter(ev[ev.event_id % 2 == 0]["user_id"])
    b = collections.Counter(ev[ev.event_id % 2 == 1]["user_id"])
    exact = sum(a[k] * b[k] for k in a if k in b)
    assert r.exact_join == exact
    assert (r.n_a, r.n_b) == (sum(a.values()), sum(b.values()))
    assert r.cms_estimate >= r.exact_join
    assert r.overest_e6 == (r.cms_estimate - exact) * 1_000_000 // exact
    release_caches()


def test_join_size_est_crafted_collision_free(spark, tmp_path):
    """Two users, no hash collisions at width 128 w.h.p. across all 4
    depths: the estimate must equal the exact size exactly."""
    import os

    rows = []
    for i in range(10):
        rows.append((i, "2024-01-01 00:00:00", i % 2, "click", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "events.parquet")
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        join_size_est,
    )

    r = join_size_est(spark, str(tmp_path)).first()
    # user 0: events 0,2,4,6,8 → a side {0,2,4,6,8 by parity}: a(0)=
    # events even-id & user0 = ids 0,2,4,6,8 all user0? id%2==user%... 
    # ids 0..9, user = id%2: even ids → user 0 (5 events, all side A);
    # odd ids → user 1 (5 events, all side B). No shared key → join 0.
    assert r.exact_join == 0
    assert r.cms_estimate >= 0
    release_caches()
