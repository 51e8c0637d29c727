

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
