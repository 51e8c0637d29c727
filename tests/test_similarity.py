

def test_ann_recall_equals_python_set_intersection(spark, sf_dir):
    """recall@k cross-checked against a Python set-intersection of the
    two collected rankings: hits = |exact ∩ approx| per query, recall
    = hits/k_exact, always within [0, 1], one row per query point."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        lsh_ann_topk,
    )

    exact: dict = {}
    for r in cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx: dict = {}
    for r in lsh_ann_topk(spark, sf_dir).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {r["query_id"]: r for r in ann_recall(spark, sf_dir).collect()}
    assert set(got) == set(exact)
    for q, ex in exact.items():
        hits = len(ex & approx.get(q, set()))
        assert got[q]["k_exact"] == len(ex)
        assert got[q]["hits"] == hits
        assert got[q]["recall"] == round(hits / len(ex), 6)
        assert 0.0 <= got[q]["recall"] <= 1.0


def test_dup_source_matrix_partitions_pair_set(spark, sf_dir):
    """The source-pair matrix must partition the verified MinHash pair
    set exactly (Σ n_pairs = |pairs|), with ordered source keys and
    min ≤ max within every cell."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        dup_source_matrix,
        minhash_pairs,
    )

    cells = dup_source_matrix(spark, sf_dir).collect()
    n_pairs = minhash_pairs(spark, sf_dir).count()
    assert sum(c.n_pairs for c in cells) == n_pairs
    for c in cells:
        assert c.src_a <= c.src_b
        assert c.min_jac <= c.max_jac


def test_source_bigram_sim_crafted_profiles(spark, tmp_path):
    """Identical-text sources must score a squared cosine of exactly
    1e6; a disjoint-vocabulary source must produce NO pair row (no
    shared bigram ⇒ no candidate); every score is ≤ 1e6."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.textstats import (
        source_bigram_sim,
    )

    rows = [
        (1, "x y z", "en", "srcA", 5),
        (2, "x y z", "en", "srcB", 5),
        (3, "p q", "en", "srcC", 3),
    ]
    path = str(tmp_path / "sbs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    got = source_bigram_sim(spark, path).collect()
    assert len(got) == 1
    (r,) = got
    assert (r.src_a, r.src_b) == ("srcA", "srcB")
    assert r.dot == 2 and r.cos2_e6 == 1_000_000


def test_conv_cohesion_crafted_bands(spark, tmp_path):
    """A twin-half conversation (turn1 == turn0) lands in band 9 with
    Jaccard exactly 1e6; a disjoint-vocabulary one lands in band 0;
    the single-turn conversation contributes nothing."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        conv_cohesion,
    )

    eight = "a b c d e f g h"
    rows = [
        (1, eight),                                    # 1 turn — excluded
        (2, eight + " " + eight),                      # identical halves
        (3, eight + " i j k l m n o p"),               # disjoint halves
    ]
    path = str(tmp_path / "cc")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        r.band: (r.n_convs, r.n_transitions)
        for r in conv_cohesion(spark, path).collect()
    }
    assert got == {9: (1, 1), 0: (1, 1)}


def test_quality_dup_matrix_matches_python_twin(spark, sf_dir):
    """Cross-check against a python composition of the two audited
    sides: cluster membership collected from dedup_clusters, quality
    decile bands recomputed with exact integers from the parquet; the
    20-cell grid must match and partition the corpus."""
    import collections

    import pandas as pd

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        dedup_clusters,
        quality_dup_matrix,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.textstats import (
        STOPWORDS,
    )

    clus = dedup_clusters(spark, sf_dir).collect()
    size = collections.Counter(r.cluster_id for r in clus)
    is_dup = {r.doc_id: size[r.cluster_id] >= 2 for r in clus}
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want: dict[tuple, int] = collections.defaultdict(int)
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = str(text).split(" ")
        n, d = len(toks), len(set(toks))
        s = sum(1 for t in toks if t in STOPWORDS)
        q_e6 = (
            (min(n, 64) * n + 48 * n + 48 * (d - s)) * 1_000_000
            + (160 * n) // 2
        ) // (160 * n)
        band = min(9, q_e6 // 100_000)
        want[(band, is_dup[doc_id])] += 1
    got = {
        (r.band, r.is_dup): r.n_docs
        for r in quality_dup_matrix(spark, sf_dir).collect()
    }
    assert got == dict(want)
    assert sum(got.values()) == len(df)


def test_lsh_bucket_stats_conserves_docs_and_pairs(spark, sf_dir):
    """Per band, Σ bucket_size·n_buckets must equal the corpus size
    (every doc hashes into every band exactly once) and every row's
    cand_pairs must equal n_buckets · k(k−1)/2; byte-identical twin
    docs must share a bucket in EVERY band."""
    import os

    import pandas as pd

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        lsh_bucket_stats,
    )

    n_docs = len(pd.read_parquet(f"{sf_dir}/documents.parquet"))
    rows = lsh_bucket_stats(spark, sf_dir).collect()
    assert rows
    per_band: dict[int, int] = {}
    for r in rows:
        per_band[r.band] = per_band.get(r.band, 0) + (
            r.bucket_size * r.n_buckets
        )
        assert r.cand_pairs == (
            r.n_buckets * r.bucket_size * (r.bucket_size - 1) // 2
        )
    assert set(per_band.values()) == {n_docs}

    # crafted twins collide in every band
    import tempfile

    same = "twin document with plenty of shingle material inside it"
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(1, same, "en", "a", 1), (2, same, "en", "b", 1),
             (3, "entirely unrelated text body with other words", "en", "a", 1)],
            "doc_id bigint, text string, lang string, source string,"
            " n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet")
        )
        crafted = lsh_bucket_stats(spark, td).collect()
        bands_with_pair = {
            r.band for r in crafted if r.bucket_size >= 2
        }
        n_bands = len({r.band for r in crafted})
        assert bands_with_pair == set(range(n_bands))


def test_normalized_dedup_crafted_variants(spark, tmp_path):
    """'Hello, World!' and 'hello   world' are distinct raw texts that
    collapse under normalization → exactly one norm-only dup among
    three docs, dup_rate_e6 = 333333 (half-up of 1/3)."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        normalized_dedup,
    )

    rows = [
        (1, "Hello, World!", "en", "a", 1),
        (2, "hello   world", "en", "b", 1),
        (3, "a unique document", "en", "a", 1),
    ]
    path = str(tmp_path / "nd")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    (row,) = normalized_dedup(spark, path).collect()
    assert (
        row.n_docs, row.n_distinct_raw, row.n_distinct_norm,
        row.norm_only_dups, row.dup_rate_e6,
    ) == (3, 3, 2, 1, 333333)


def test_partition_balance_conserves_rows(spark, sf_dir):
    """Every candidate P must account for the whole corpus, the mean
    must be total·1000/P half-up-free (floor), and skew_e6 ≥ 1e6 by
    max ≥ mean."""
    import pandas as pd

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        PARTITION_CANDIDATES,
        partition_balance,
    )

    n = len(pd.read_parquet(f"{sf_dir}/documents.parquet"))
    rows = {r.n_partitions: r for r in partition_balance(spark, sf_dir).collect()}
    assert set(rows) == set(PARTITION_CANDIDATES)
    for p, r in rows.items():
        assert r.n_rows == n
        assert r.mean_rows_e3 == (n * 1000 + p // 2) // p
        assert r.skew_e6 >= 1_000_000
        assert r.max_rows * p >= n


def test_simhash_bit_bias_independent_recompute(spark, sf_dir):
    """The 32-row audit equals a pure-Python recompute over the
    collected signature table (bit extraction + half-up e6), and
    every bit row is present exactly once."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_bit_bias,
        simhash_docs,
    )

    sigs = [r.simhash for r in simhash_docs(spark, sf_dir).collect()]
    n = len(sigs)
    expected = {}
    for b in range(SIMHASH_BITS):
        ones = sum((s >> b) & 1 for s in sigs)
        expected[b] = (ones, (ones * 1_000_000 + n // 2) // n)
    got = {
        r.bit: (r.n_ones, r.ones_e6)
        for r in simhash_bit_bias(spark, sf_dir).collect()
    }
    assert got == expected
    assert len(got) == SIMHASH_BITS


def test_embedding_dim_profile_independent_recompute(spark, sf_dir):
    """The 64-row profile equals a pure-Python recompute over the
    collected embedding table (same floor(v·1e6 + 0.5) quantizer,
    signed half-up integer mean)."""
    import math

    from cross_sentence_relation_extraction_idepnn_spark.operators.similarity import (
        EMB_DIM,
        _emb,
        embedding_dim_profile,
    )

    vecs = [r.embedding for r in _emb(spark, sf_dir).collect()]
    n = len(vecs)
    expected = {}
    for d in range(EMB_DIM):
        qs = [int(math.floor(float(v[d]) * 1000000.0 + 0.5)) for v in vecs]
        s = sum(qs)
        mean = (s + n // 2) // n if s >= 0 else -((-s + n // 2) // n)
        expected[d] = (n, s, min(qs), max(qs), mean)
    got = {
        r.dim: (r.n_vecs, r.sum_q, r.min_q, r.max_q, r.mean_e6)
        for r in embedding_dim_profile(spark, sf_dir).collect()
    }
    assert got == expected


def test_jaccard_histogram_conserves_candidates(spark, sf_dir):
    """The percent histogram's pair mass equals the distinct LSH
    candidate-pair count (independently derived from the band table),
    and the ≥(100·τ) tail can never undercount the τ-filtered
    verified pair set whose rounded jaccard is strictly above the
    band boundary."""
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        _band_sigs,
        jaccard_histogram,
    )

    hist = jaccard_histogram(spark, sf_dir).collect()
    bands = _band_sigs(spark, sf_dir)
    n_cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "band_sig"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select("x.doc_id", "y.doc_id")
        .distinct()
        .count()
    )
    assert sum(r.n_pairs for r in hist) == n_cand
    assert all(0 <= r.jaccard_pct <= 100 for r in hist)


def test_jaccard_histogram_crafted_percent(spark, tmp_path):
    """Two 12-word docs sharing all but the last word: shingle sets
    (k-shingles over words) have |A∩B| and |A∪B| known exactly; the
    operator must land them in the half-up percent band computed by
    hand from those counts."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        _shingle_arrays,
        jaccard_histogram,
    )

    base = [f"w{i}" for i in range(12)]
    d2 = base[:-1] + ["zz"]
    rows = [(1, " ".join(base)), (2, " ".join(d2))]
    path = str(tmp_path / "jh")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    sets = {
        r.doc_id: set(r.shs) for r in _shingle_arrays(spark, path).collect()
    }
    inter = len(sets[1] & sets[2])
    union = len(sets[1] | sets[2])
    expect_pct = (inter * 100 + union // 2) // union
    got = {
        r.jaccard_pct: r.n_pairs
        for r in jaccard_histogram(spark, path).collect()
    }
    assert got == {expect_pct: 1}


def test_simhash_hamming_histogram_consistent_with_pairs(spark, sf_dir):
    """The sweep's ≤ HAMMING_MAX mass equals the simhash_pairs row
    count (same candidate subtree, filter vs census), and the grid
    stays within [0, 32]."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        HAMMING_MAX,
        simhash_hamming_histogram,
        simhash_pairs,
    )

    hist = {r.hamming: r.n_pairs
            for r in simhash_hamming_histogram(spark, sf_dir).collect()}
    n_kept = simhash_pairs(spark, sf_dir).count()
    assert sum(v for h, v in hist.items() if h <= HAMMING_MAX) == n_kept
    assert all(0 <= h <= 32 for h in hist)


def test_dedup_family_agreement_conserves(spark, sf_dir):
    """minhash_only + both equals the MinHash pair count;
    simhash_only + both equals the SimHash pair count — the census
    partitions the union of the two pair sets exactly."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        dedup_family_agreement,
        minhash_pairs,
        simhash_pairs,
    )

    got = {r.family: r.n_pairs
           for r in dedup_family_agreement(spark, sf_dir).collect()}
    n_mh = minhash_pairs(spark, sf_dir).count()
    n_sh = simhash_pairs(spark, sf_dir).count()
    assert got.get("minhash_only", 0) + got.get("both", 0) == n_mh
    assert got.get("simhash_only", 0) + got.get("both", 0) == n_sh


def test_length_dup_matrix_conserves_docs(spark, sf_dir):
    """Every document lands in exactly one (band, dup) cell, and the
    dup mass equals the independently-counted members of clusters of
    size ≥ 2."""
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        dedup_clusters,
        length_dup_matrix,
    )

    rows = length_dup_matrix(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    cl = dedup_clusters(spark, sf_dir)
    sz = cl.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    n_dup = cl.join(sz, "cluster_id").filter("sz >= 2").count()
    assert sum(r.n_docs for r in rows if r.is_dup) == n_dup


def test_simhash_boilerplate_corpus_brute_force_parity(spark, tmp_path):
    """Hot-bucket guard pin (VERDICT r4 #3): a template-heavy corpus —
    50 byte-identical docs (one simhash, one signature row) plus a few
    distinct docs — must produce exactly the brute-force pair set
    (C(50,2) hamming-0 pairs among the copies + any ≤ HAMMING_MAX cross
    pairs), the histogram must agree arithmetically, and the candidate
    join must run at signature grain: exactly ONE join whose inputs are
    the collapsed distinct-signature table (HashAggregate below the
    join), with pair expansion (Generate) only above it."""
    import itertools
    import os
    import re

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        HAMMING_MAX,
        simhash_docs,
        simhash_hamming_histogram,
        simhash_pairs,
    )
    from test_plans import count_op, plan_of

    rows = [(i, "the same boilerplate template text", "en", "t", 1)
            for i in range(1, 51)]
    rows += [(100 + j, f"unique doc number {j} with words {j*7}", "en", "u", 1)
             for j in range(4)]
    path = str(tmp_path / "bp")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )

    sigs = {r.doc_id: r.simhash for r in simhash_docs(spark, path).collect()}
    blocks = lambda s: {(j, (s >> (j * 8)) & 255) for j in range(4)}
    expect = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if blocks(sigs[a]) & blocks(sigs[b]):
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= HAMMING_MAX:
                expect.add((a, b, h))
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in simhash_pairs(spark, path).collect()}
    assert got == expect
    assert len([p for p in got if p[2] == 0]) >= 50 * 49 // 2

    hist = {r.hamming: r.n_pairs
            for r in simhash_hamming_histogram(spark, path).collect()}
    assert hist[0] >= 50 * 49 // 2
    assert sum(v for h, v in hist.items() if h <= HAMMING_MAX) == len(got)

    # plan-shape pin needs a FRESH (un-executed) plan: the memoized df
    # was collected above, so its explain would show the AQE-finalized
    # tree (joins inside reused query stages)
    from cross_sentence_relation_extraction_idepnn_spark import session as _session

    _session._PLAN_CACHE.clear()
    plan = plan_of(simhash_pairs(spark, path))
    n_joins = count_op(plan, "SortMergeJoin") + count_op(plan, "BroadcastHashJoin")
    assert n_joins == 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    # signature collapse (collect_list agg) must feed the join: the
    # plan has HashAggregate/ObjectHashAggregate nodes for _simhash_sigs
    assert (count_op(plan, "ObjectHashAggregate")
            + count_op(plan, "HashAggregate")
            + count_op(plan, "SortAggregate")) >= 2, plan


def test_simhash_signature_stats_crafted_multiplicity(spark, tmp_path):
    """50 identical docs + 4 distinct docs: the 50-clone signature lands
    in mult_bucket floor(log2(50)) = 5 with C(50,2) within-pairs; the
    singletons land in bucket 0 with zero pairs; doc mass conserves."""
    import math
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        simhash_docs,
        simhash_signature_stats,
    )

    rows = [(i, "the same boilerplate template text", "en", "t", 1)
            for i in range(1, 51)]
    rows += [(100 + j, f"distinct doc {j} tokens {j*13}", "en", "u", 1)
             for j in range(4)]
    path = str(tmp_path / "ss")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )

    # independent recompute from the signature table
    from collections import Counter
    mult = Counter(
        r.simhash for r in simhash_docs(spark, path).collect()
    )
    expect = {}
    for n in mult.values():
        b = int(math.floor(math.log2(n)))
        s, d, p = expect.get(b, (0, 0, 0))
        expect[b] = (s + 1, d + n, p + n * (n - 1) // 2)

    got = {
        r.mult_bucket: (r.n_signatures, r.n_docs, r.n_pairs_within)
        for r in simhash_signature_stats(spark, path).collect()
    }
    assert got == expect
    assert got[5][2] >= 50 * 49 // 2  # the clone signature's pair mass
    assert sum(v[1] for v in got.values()) == 54  # doc conservation


def test_simhash_delta_equals_filtered_pairs(spark, sf_dir):
    """The incremental result equals simhash_pairs filtered to >=1 new
    (odd doc_id) endpoint, with n_new = endpoint parity sum — the
    delta ≡ rebuild law for the simhash family."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        simhash_delta,
        simhash_pairs,
    )

    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs(spark, sf_dir).collect()
        if r.doc_a % 2 == 1 or r.doc_b % 2 == 1
    }
    delta = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_delta(spark, sf_dir).collect()
    }
    assert delta == full
    for r in simhash_delta(spark, sf_dir).collect():
        assert r.n_new == r.doc_a % 2 + r.doc_b % 2
        assert r.n_new in (1, 2)


def test_simhash_delta_boilerplate_no_index_pairs(spark, tmp_path):
    """Hot-signature incremental pin: 40 index clones (even ids) + 10
    new clones (odd ids) of the same template. The delta must emit
    exactly the new-internal C(10,2) + new-vs-index 10x40 hamming-0
    pairs — and NEVER an index-index pair, however hot the signature."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        simhash_delta,
    )

    rows = [(2 * i, "the same boilerplate template text", "en", "t", 1)
            for i in range(1, 41)]
    rows += [(2 * j + 1, "the same boilerplate template text", "en", "t", 1)
             for j in range(10)]
    path = str(tmp_path / "sd")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    got = simhash_delta(spark, path).collect()
    assert all(r.doc_a % 2 == 1 or r.doc_b % 2 == 1 for r in got)
    assert all(r.hamming == 0 for r in got)
    n_internal = sum(1 for r in got if r.n_new == 2)
    n_vs_index = sum(1 for r in got if r.n_new == 1)
    assert n_internal == 10 * 9 // 2
    assert n_vs_index == 10 * 40
    assert len(got) == len({(r.doc_a, r.doc_b) for r in got})


def test_ivf_probe_sweep_monotone_with_exact_canary(spark, sf_dir):
    """Recall@k is non-decreasing in nprobe, possible = k·n_queries on
    every row, and the nprobe = IVF_CELLS row is EXACT by construction
    (probing every cell is the brute-force search) — the standing
    canary for quantizer/scoring drift."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.similarity import (
        IVF_CELLS,
        N_QUERIES,
        TOP_K,
        ivf_probe_sweep,
    )

    rows = sorted(
        ivf_probe_sweep(spark, sf_dir).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    assert all(r.possible == TOP_K * N_QUERIES for r in rows)
    hits = [r.hits for r in rows]
    assert hits == sorted(hits)
    last = rows[-1]
    assert last.nprobe == IVF_CELLS
    assert last.hits == last.possible
    assert last.recall_e6 == 1_000_000
    for r in rows:
        assert r.recall_e6 == (r.hits * 1_000_000 + r.possible // 2) // r.possible


def test_ivf_probe_sweep_single_cell_matches_ivf_recall(spark, sf_dir):
    """The nprobe = 1 row of the sweep equals the summed per-query
    ivf_recall rollup — the curve's first point is the existing
    single-probe audit."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.similarity import (
        ivf_probe_sweep,
        ivf_recall,
    )

    p1 = [r for r in ivf_probe_sweep(spark, sf_dir).collect() if r.nprobe == 1][0]
    per_q = ivf_recall(spark, sf_dir).collect()
    assert p1.hits == sum(r.hits for r in per_q)
    assert p1.possible == sum(r.k_exact for r in per_q)


def test_lsh_band_sweep_monotone_with_full_band_canary(spark, sf_dir):
    """Band-budget recall is non-decreasing, possible equals the
    verified minhash pair count on every row, and the all-bands row is
    exact by construction (every verified pair matched some band)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        BAND_ROWS,
        NUM_PERMS,
        lsh_band_sweep,
        minhash_pairs,
    )

    n_total = NUM_PERMS // BAND_ROWS
    rows = sorted(lsh_band_sweep(spark, sf_dir).collect(),
                  key=lambda r: r.n_bands)
    assert [r.n_bands for r in rows] == list(range(1, n_total + 1))
    n_pairs = minhash_pairs(spark, sf_dir).count()
    assert all(r.possible == n_pairs for r in rows)
    hits = [r.hits for r in rows]
    assert hits == sorted(hits)
    assert rows[-1].hits == n_pairs
    assert rows[-1].recall_e6 == 1_000_000


def test_ngram_block_overflow_conserves_and_caps(spark, sf_dir):
    """Stage doc-mass partitions the shingled corpus exactly, kept
    stages respect the cap, and a crafted viral-shingle corpus routes
    mass through level-2 re-blocking with the overflow REPORTED."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        NGRAM_MAX_BLOCK,
        _shingle_arrays,
        ngram_block_overflow,
    )

    rows = {r.stage: r for r in ngram_block_overflow(spark, sf_dir).collect()}
    n_shingled = _shingle_arrays(spark, sf_dir).count()
    assert sum(r.n_docs for r in rows.values()) == n_shingled
    for stage in ("level1_kept", "level2_kept"):
        if stage in rows:
            assert rows[stage].max_block_size <= NGRAM_MAX_BLOCK
    if "dropped" in rows:
        assert rows["dropped"].max_block_size > NGRAM_MAX_BLOCK


def test_ngram_block_overflow_viral_shingle(spark, tmp_path):
    """A corpus where every doc shares its minimal shingle (one viral
    boilerplate prefix) but has a distinct second shingle: level 1
    overflows, re-blocking spreads docs across level-2 singleton
    blocks, and nothing is silently lost — the census accounts for
    every doc."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        NGRAM_MAX_BLOCK,
        _shingle_arrays,
        ngram_block_overflow,
    )

    n_docs = NGRAM_MAX_BLOCK + 20
    # NGRAM_N-token shingles: give every doc the same long prefix (the
    # viral min shingle comes from there) + a unique tail
    rows = [
        (i, "aaa bbb ccc ddd eee fff ggg hhh " + f"tail{i} t{i}x t{i}y t{i}z",
         "en", "v", 1)
        for i in range(1, n_docs + 1)
    ]
    path = str(tmp_path / "vs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    got = {r.stage: r for r in ngram_block_overflow(spark, path).collect()}
    n_shingled = _shingle_arrays(spark, path).count()
    assert sum(r.n_docs for r in got.values()) == n_shingled
    assert "level1_kept" not in got or got["level1_kept"].n_docs < n_docs
