

def test_bloom_prefilter_lossless_and_consistent_with_decontaminate(
    spark, sf_dir
):
    """The Bloom pre-filter can never miss: n_exact <= n_candidates on
    every doc (no false negatives), the exact counts agree with
    decontaminate's boolean (n_exact > 0 <=> contaminated), and the
    filter is non-vacuous both ways — some candidates are rejected by
    the exact join (false positives exist at m=4096) and most grams
    are screened out without any exact-join work."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        bloom_prefilter,
        decontaminate,
    )

    rows = bloom_prefilter(spark, sf_dir).collect()
    assert all(r["n_exact"] <= r["n_candidates"] for r in rows)
    assert all(
        r["n_fp"] == r["n_candidates"] - r["n_exact"] for r in rows
    )
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(spark, sf_dir).collect()
    }
    assert {r["doc_id"] for r in rows} == set(flags)
    for r in rows:
        assert (r["n_exact"] > 0) == flags[r["doc_id"]], r["doc_id"]
    total_g = sum(r["n_grams"] for r in rows)
    total_c = sum(r["n_candidates"] for r in rows)
    total_fp = sum(r["n_fp"] for r in rows)
    assert total_fp > 0, "FP measurement vacuous at this m"
    assert total_c < total_g * 0.5, "pre-filter screened out too little"
