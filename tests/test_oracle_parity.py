"""Every __spark_entry__ query vs its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01 — this is the local
fast loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from compare_util import duck_con, assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_con(sf_dir)
    yield c
    c.close()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        assert_frames_match(df, con, ORACLES[name])
    else:
        # non-SQL-expressible kernel ops: rows-only smoke (driver parity)
        assert df.count() >= 0


def test_embedding_neardup_nonvacuous_and_full_recall(spark, sf_dir, con):
    """The planted-twin parity row must be non-vacuous (VERDICT r1 #6),
    and the sign-LSH bucketed candidate generation must achieve FULL
    recall vs the all-pairs oracle on this fixture (positive per-dim
    scales never flip a sign bit, so every twin shares its original's
    bucket)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import similarity

    df = similarity.embedding_neardup_pairs(spark, sf_dir, plant=True)
    got = assert_frames_match(df, con, similarity.duck_embedding_neardup(plant=True))
    assert len(got) >= 20  # 500 vectors / PLANT_EVERY=25 planted twins
    # all-pairs (bucket-free) ground truth: brute-force join in DuckDB
    bucketed_sql = similarity.duck_embedding_neardup(plant=True)
    allpairs_sql = bucketed_sql.replace(
        "ON x.bucket = y.bucket AND x.vec_id < y.vec_id", "ON x.vec_id < y.vec_id"
    )
    assert allpairs_sql != bucketed_sql
    n_all = len(con.sql(allpairs_sql).df())
    assert len(got) == n_all, "LSH buckets dropped a true near-dup pair"


def test_located_annotations_exercises_both_passes(spark, sf_dir):
    """J2's two reference passes must BOTH fire on the fixture: the
    offset interval join for clean annotations and the lowercased
    contains-fallback for the deterministically drifted ones
    (generate_bb_training_data_2016.py:669-707 and :313-477)."""
    df = QUERIES["located_annotations"](spark, sf_dir)
    counts = {r["via"]: r["count"] for r in df.groupBy("via").count().collect()}
    assert counts.get("offset", 0) > 0, "offset pass vacuous"
    assert counts.get("contains", 0) > 0, "contains fallback vacuous"
    # every drifted annotation that has a containing sentence is recovered:
    # no annotation appears under both vias
    dup = (
        df.groupBy("conv_id", "ann_id")
        .agg(F.countDistinct("via").alias("nv"))
        .filter("nv > 1")
        .count()
    )
    assert dup == 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj", "pred", "obj", "support", "max_score", "min_k"}


def test_curation_ops_nonvacuous(spark, sf_dir):
    """The curation family must exercise its interesting paths on the
    fixture: planted PII gets masked, duplicate n-grams exist, and the
    decontamination join flags at least one doc."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import curation

    pii = curation.pii_scrub(spark, sf_dir, plant=True)
    masked = pii.filter("n_pii > 0")
    assert masked.count() > 0
    one = masked.first()
    assert "<EMAIL>" in one.clean_text and "<SSN>" in one.clean_text
    assert "@example.com" not in one.clean_text

    rep = curation.repetition_score(spark, sf_dir)
    assert rep.filter("n_distinct < n_grams").count() > 0
    assert rep.filter("n_distinct > n_grams").count() == 0  # invariant

    dec = curation.decontaminate(spark, sf_dir)
    assert dec.filter("contaminated").count() > 0
    assert dec.filter("NOT contaminated").count() > 0


def test_decontaminate_flags_planted_benchmark_copy(spark, tmp_path):
    """Semantic check on crafted docs: a corpus doc embedding an 8-gram
    from a benchmark doc is flagged; an unrelated doc is not."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import curation

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    leak = "prefix words here alpha beta gamma delta epsilon zeta eta theta trailing"
    clean = "totally unrelated content with many distinct words in this row"
    docs = spark.createDataFrame(
        [(0, bench_text), (7, leak), (11, clean)], "doc_id long, text string"
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r.contaminated
        for r in curation.decontaminate(spark, str(tmp_path)).collect()
    }
    assert 0 not in out  # benchmark docs are excluded from the corpus side
    assert out[7] is True
    assert out[11] is False


def test_domain_mixture_prefilter_is_lossless(spark, sf_dir):
    """The percentile-threshold prefilter (scale path) must select the
    exact same quota rows as the unfiltered exact rank."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import curation

    fast = curation.domain_mixture(spark, sf_dir, prefilter=True).collect()
    slow = curation.domain_mixture(spark, sf_dir, prefilter=False).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


def test_locate_annotations_drops_unmatchable(spark):
    """An annotation whose offset hits no sentence AND whose surface
    appears nowhere in the turn is dropped (the reference counts and
    skips it) — crafted-input pin of the drop behavior."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        locate_annotations,
    )

    sents = spark.createDataFrame(
        [("c1", 0, 0, "the cat sat", 0, 11)],
        "conv_id string, turn_idx int, sent_idx int, sent_text string, begin int, end int",
    )
    anns = spark.createDataFrame(
        [
            ("c1", 0, "a1", 4, 7, "cat"),        # offset hit
            ("c1", 0, "a2", 900, 903, "sat"),    # drifted, contains-recoverable
            ("c1", 0, "a3", 900, 903, "zebra"),  # unmatchable -> dropped
        ],
        "conv_id string, turn_idx int, ann_id string, a_begin int, a_end int, surface string",
    )
    got = {r.ann_id: r.via for r in locate_annotations(anns, sents).collect()}
    assert got == {"a1": "offset", "a2": "contains"}


def test_semantic_dedup_drops_one_of_each_planted_pair(spark, sf_dir, con):
    """On the fixture (no organic semantic dups at tau=0.99) the only
    duplicate groups are the 20 (original, planted-twin) pairs: exactly
    ONE member of each pair must be dropped — whichever has the higher
    (rounded cent_cos, vec_id) priority, per the SemDeDup keep-rule —
    and no unpaired vector may be dropped."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import similarity

    df = similarity.semantic_dedup(spark, sf_dir, plant=True)
    assert_frames_match(df, con, similarity.duck_semantic_dedup(plant=True))
    rows = {r["vec_id"]: (r["cent_cos"], r["is_dup"]) for r in df.collect()}
    twins = {v for v in rows if v >= similarity.PLANT_OFFSET}
    assert len(twins) == 20
    dropped = {v for v, (_, d) in rows.items() if d}
    for t in twins:
        o = t - similarity.PLANT_OFFSET
        (t_cos, t_dup), (o_cos, o_dup) = rows[t], rows[o]
        assert t_dup != o_dup, f"pair ({o},{t}) must drop exactly one side"
        loser = t if (t_cos, t) > (o_cos, o) else o
        assert rows[loser][1] is True, f"pair ({o},{t}) kept the wrong side"
    paired = twins | {t - similarity.PLANT_OFFSET for t in twins}
    assert dropped <= paired, "a vector outside the planted pairs was dropped"


def test_semantic_dedup_keeps_lowest_centroid_cosine_not_lowest_id(spark, tmp_path):
    """SemDeDup keep-rule on a crafted clique: vectors 0, 10, 11, 12
    all within tau of each other in centroid 0's cell, with cent_cos
    DECREASING in vec_id — the survivor must be vec 12 (lowest
    cent_cos, highest id), proving the rule is the paper's
    prototypicality rule and not accidental min-id ordering."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators import similarity

    path = str(tmp_path / "crafted")
    os.makedirs(path, exist_ok=True)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),    # centroid 0, cent_cos = 1.0
        (1, [0.0, 1.0, 0.0, 0.0], 0),    # centroid 1, alone in its cell
        (10, [1.0, 0.01, 0.0, 0.0], 0),  # cent_cos ~ 0.99995
        (11, [1.0, 0.02, 0.0, 0.0], 0),  # cent_cos ~ 0.9998
        (12, [1.0, 0.05, 0.0, 0.0], 0),  # cent_cos ~ 0.998752  (lowest)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "embeddings.parquet")
    )
    got = {
        r["vec_id"]: r["is_dup"]
        for r in similarity.semantic_dedup(spark, path, cells=2).collect()
    }
    assert got == {0: True, 1: False, 10: True, 11: True, 12: False}


def test_dedup_clusters_merges_pairs_and_keeps_min_id(spark, tmp_path):
    """Crafted corpus: docs 1/2/3 are near-identical (single edge-word
    edits), doc 4 unrelated. The cluster table must (a) be EXACTLY the
    connected components of the minhash_pairs edge set (python
    union-find re-derivation — sound whatever the banding decides),
    (b) merge 1/2/3 into cluster 1 with doc 1 the sole canonical, and
    (c) leave doc 4 a canonical singleton."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators import dedup

    base = [f"w{i}" for i in range(20)]
    v2 = list(base)
    v2[0] = "xray"
    v3 = list(v2)
    v3[19] = "yankee"
    other = " ".join(f"z{i}" for i in range(20))
    path = str(tmp_path / "docs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(v2)), (3, " ".join(v3)), (4, other)],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in dedup.minhash_pairs(spark, path).collect()
    ]
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup.dedup_clusters(spark, path).collect()
    }
    # (a) exact CC-of-pairs consistency via union-find
    parent = {d: d for d in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {d: (find(d), find(d) == d) for d in got}
    assert got == expect
    # (b) the crafted near-dup chain merged, min id canonical
    assert got[1] == (1, True) and got[2] == (1, False) and got[3] == (1, False)
    # (c) unrelated doc is its own canonical singleton
    assert got[4] == (4, True)


def test_chunk_documents_boundaries_and_coverage(spark, tmp_path):
    """Crafted boundary pins: n == chunk → one chunk; n == chunk+1 →
    two overlapping chunks whose union covers all tokens; every chunk's
    text is exactly the token slice; the final chunk always ends at n."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators import curation

    c, s = curation.CHUNK_TOKENS, curation.CHUNK_STRIDE
    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    path = str(tmp_path / "docs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        [(1, mk(c)), (2, mk(c + 1)), (3, mk(3 * c)), (4, "solo")],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    rows = curation.chunk_documents(spark, path).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in by_doc.values():
        d.sort(key=lambda r: r.chunk_idx)
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tok == c
    assert len(by_doc[4]) == 1 and by_doc[4][0].chunk_text == "solo"
    assert len(by_doc[2]) == 2
    # second chunk of doc 2 starts at stride and reaches token n-1
    last = by_doc[2][-1]
    assert last.begin_tok == s and last.begin_tok + last.n_chunk_tok == c + 1
    for doc_id, n in ((1, c), (2, c + 1), (3, 3 * c)):
        toks = mk(n).split(" ")
        covered = set()
        for r in by_doc[doc_id]:
            assert r.chunk_text == " ".join(
                toks[r.begin_tok : r.begin_tok + r.n_chunk_tok]
            )
            covered |= set(range(r.begin_tok, r.begin_tok + r.n_chunk_tok))
        assert covered == set(range(n)), f"doc {doc_id} dropped tokens"
        assert by_doc[doc_id][-1].begin_tok + by_doc[doc_id][-1].n_chunk_tok == n


def test_quality_classifier_tracks_quality_rule(spark, sf_dir):
    """The pretrained LR must actually discriminate: both classes
    present on the fixture, and ≥95% agreement with the quality-rule
    label it was trained against (quality_e6 >= 680000)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import textstats

    qc = {r.doc_id: r.keep for r in textstats.quality_classifier(spark, sf_dir).collect()}
    q = {
        r.doc_id: round(r.quality * 1e6) >= 680_000
        for r in textstats.quality_score(spark, sf_dir).collect()
    }
    assert any(qc.values()) and not all(qc.values()), "classifier is degenerate"
    agree = sum(qc[d] == q[d] for d in qc) / len(qc)
    assert agree >= 0.95, f"classifier agreement {agree:.3f} < 0.95"


def test_kg_neighbors_crafted_graph(spark):
    """Hand-computed graph: chain a→b→c→d plus c→a back-edge and a
    parallel edge (duplicate triple rows must collapse). 2-hop sets:
    a:{c}, b:{d,a}, c:{b}, d:{}; self-reach (b→c→... no) and dup
    edges must not inflate counts."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_neighbors,
    )

    kg = spark.createDataFrame(
        [
            ("a", "p", "b", 1, 0),
            ("a", "p", "b", 9, 1),  # duplicate edge — must collapse
            ("b", "p", "c", 1, 0),
            ("c", "p", "d", 1, 0),
            ("c", "p", "a", 1, 0),
        ],
        "subj string, pred string, obj string, support long, min_k int",
    )
    got = {
        r.node: (r.n_out, r.n_in, r.n_two_hop)
        for r in kg_neighbors(kg).collect()
    }
    assert got == {
        "a": (1, 1, 1),  # a→b→c
        "b": (1, 1, 2),  # b→c→{d,a}
        "c": (2, 1, 1),  # c→d (sink), c→a→b
        "d": (0, 1, 0),
    }


def test_kg_temporal_consistent_with_kg(spark, sf_dir):
    """The temporal KG must cover EXACTLY the kg triple set, with a
    well-ordered observation window and conv-support bounded by the
    kg support count (several candidates per conv ⇒ n_convs <= support)."""
    kgt = {
        (r.subj, r.pred, r.obj): (r.first_seen, r.last_seen, r.n_convs)
        for r in QUERIES["kg_temporal"](spark, sf_dir).collect()
    }
    kg = {
        (r.subj, r.pred, r.obj): r.support
        for r in QUERIES["kg"](spark, sf_dir).collect()
    }
    assert set(kgt) == set(kg)
    for t, (f, l, n) in kgt.items():
        assert f <= l, f"inverted window for {t}"
        assert 1 <= n <= kg[t], f"n_convs out of bounds for {t}"


def test_kg_negatives_never_hit_true_tail(spark):
    """Crafted 2-node graph maximizes hash-collision pressure on the
    true tail: every triple must still get exactly k negatives, each a
    real node and NEVER the triple's own tail (wraparound rule)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        NEG_SAMPLES,
        kg_negatives,
    )

    kg = spark.createDataFrame(
        [("a", "p", "b", 1, 0), ("b", "p", "a", 1, 0), ("a", "q", "b", 1, 0)],
        "subj string, pred string, obj string, support long, min_k int",
    )
    rows = kg_negatives(kg).collect()
    assert len(rows) == 3 * NEG_SAMPLES
    nodes = {"a", "b"}
    seen = set()
    for r in rows:
        assert r.neg_obj in nodes
        assert r.neg_obj != r.obj, f"negative equals true tail for {r}"
        seen.add((r.subj, r.pred, r.obj, r.neg_idx))
    assert len(seen) == 3 * NEG_SAMPLES  # k distinct neg_idx per triple


def test_kg_temporal_delta_merge_equals_full(spark, sf_dir):
    """Proves the kg_temporal docstring's decomposability claim: split
    the corpus into two conv-hash deltas, build a temporal KG per
    delta WITH THE SAME shipped operator (``temporal_kg`` — the test
    and the driver query share one implementation), merge with the
    decomposable combiners (min first_seen, max last_seen, SUM
    n_convs — valid because deltas PARTITION the conv space), and the
    merge must equal the full-corpus build exactly."""
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        canonicalize,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        detect_mentions,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        segment,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        temporal_kg,
    )
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        transcripts,
    )

    tdf = transcripts(spark, sf_dir)
    canon = canonicalize(detect_mentions(spark, segment(tdf)))  # global dim
    h = spark_h15(F.col("conv_id"))

    deltas = [
        temporal_kg(spark, tdf=tdf.filter(h % 2 == i), canon=canon)
        for i in (0, 1)
    ]
    merged = (
        deltas[0]
        .unionByName(deltas[1])
        .groupBy("subj", "pred", "obj")
        .agg(
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
            F.sum("n_convs").alias("n_convs"),
        )
    )
    full = temporal_kg(spark, tdf=tdf, canon=canon)
    got = sorted(map(tuple, merged.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want


def test_bpe_merges_match_pure_python_reference(spark, sf_dir):
    """Third independent formulation: the classic dict-based Sennrich
    loop (overlapping pair counts, count-desc/pair-asc argmax, greedy
    leftmost skip-2 application) in pure Python over the same parquet,
    compared row-for-row with the distributed trainer."""
    import glob

    import pyarrow.parquet as pq

    from cross_sentence_relation_extraction_idepnn_spark.operators import bpe

    got = [
        (r.merge_idx, r.lsym, r.rsym, r.pair_count)
        for r in bpe.bpe_merges(spark, sf_dir).orderBy("merge_idx").collect()
    ]
    assert len(got) == bpe.N_MERGES  # fixture has plenty of pairs

    from collections import Counter

    wc: Counter = Counter()
    for f in glob.glob(f"{sf_dir}/documents.parquet") + glob.glob(
        f"{sf_dir}/documents.parquet/*.parquet"
    ):
        for text in pq.read_table(f, columns=["text"]).column("text").to_pylist():
            for w in text.split(" "):
                if w:
                    wc[w] += 1
    syms = {w: list(w) for w in wc}
    expect = []
    for m in range(bpe.N_MERGES):
        stats: Counter = Counter()
        for w, c in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += c
        if not stats:
            break
        (l, r), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((m, l, r, cnt))
        for w in wc:
            s = syms[w]
            new, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
    assert got == expect


def test_bpe_token_counts_bounds_and_compression(spark, sf_dir):
    """Trained-tokenizer counts must satisfy the structural bounds:
    n_words <= n_bpe_tokens <= character count (the 0-merge
    segmentation), and the learned merges must actually compress at
    least one document."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import bpe

    full = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in bpe.bpe_token_counts(spark, sf_dir).collect()}
    chars = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_token_counts(spark, sf_dir, n_merges=0).collect()}
    assert set(full) == set(chars)
    for d, (nw, nb) in full.items():
        assert nw <= nb <= chars[d], f"doc {d}: {nw} <= {nb} <= {chars[d]} violated"
    assert any(nb < chars[d] for d, (_, nb) in full.items()), "merges never fired"


def test_dedup_delta_equals_filtered_full_pairs(spark, sf_dir):
    """The incremental plan (new-batch bands probe the full band
    table; index-index candidates never generated) must emit EXACTLY
    the full ``minhash_pairs`` result restricted to >= 1 new endpoint.
    Non-vacuity guards: the corpus must exercise all three pair
    classes — excluded index-index pairs (the work the incremental
    plan skips), new-vs-index (n_new=1), and batch-internal
    (n_new=2)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        minhash_delta,
        minhash_pairs,
    )

    full = minhash_pairs(spark, sf_dir).collect()
    want = {
        (r.doc_a, r.doc_b, r.jaccard, int(r.doc_a % 2 + r.doc_b % 2))
        for r in full
        if r.doc_a % 2 == 1 or r.doc_b % 2 == 1
    }
    got = {tuple(r) for r in minhash_delta(spark, sf_dir).collect()}
    assert got == want
    assert len(want) < len(full), "no index-index pair to skip"
    assert {n for *_, n in want} == {1, 2}, "missing an n_new class"


def test_dedup_clusters_delta_matches_python_twin(spark, sf_dir):
    """Label-stable incremental cluster maintenance pinned against an
    independent pure-Python twin over the collected pair set: existing
    (even-half) cluster assignments equal a union-find over both-even
    pairs with keep-min-id labels; every new (odd) document adopts the
    minimum existing cluster reachable through >=1-odd pairs (BFS
    through chains of new docs, existing clusters contracted), else
    founds a new cluster under its minimum reachable new doc; the
    is_canonical rule stays cluster_id == doc_id. Non-vacuity: at
    least one new document must adopt an existing cluster and at least
    one must found a multi-member new cluster or singleton."""
    from collections import defaultdict

    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        dedup_clusters_delta,
        minhash_pairs,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import read_parquet_cached

    docs = [
        r.doc_id
        for r in read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    pairs = [(r.doc_a, r.doc_b) for r in minhash_pairs(spark, sf_dir).collect()]
    evens = sorted(d for d in docs if d % 2 == 0)
    odds = sorted(d for d in docs if d % 2 == 1)

    # even-half union-find (keep-min-id)
    parent = {d: d for d in evens}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        if a % 2 == 0 and b % 2 == 0:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    canon = {d: find(d) for d in evens}

    # odd-side BFS adoption with contracted existing clusters
    nn = defaultdict(set)
    seeds = defaultdict(set)  # odd doc -> reachable existing cluster ids
    for a, b in pairs:
        if a % 2 == 1 and b % 2 == 1:
            nn[a].add(b)
            nn[b].add(a)
        elif a % 2 != b % 2:
            y, e = (a, b) if a % 2 == 1 else (b, a)
            seeds[y].add(canon[e])
    want = {(d, canon[d], canon[d] == d, 0) for d in evens}
    for d in odds:
        frontier, seen = {d}, {d}
        while frontier:
            frontier = {z for y in frontier for z in nn[y]} - seen
            seen |= frontier
        ex = {c for y in seen for c in seeds[y]}
        cl = min(ex) if ex else min(seen)
        want.add((d, cl, cl == d, 1))
    got = {tuple(r) for r in dedup_clusters_delta(spark, sf_dir).collect()}
    assert got == want
    adopted = sum(1 for _, cl, _, n in want if n == 1 and cl % 2 == 0)
    assert adopted > 0, "no new doc adopts an existing cluster — fixture vacuous"
    assert any(n == 1 and cl % 2 == 1 for _, cl, _, n in want)
