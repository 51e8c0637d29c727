"""North-rule parity metric: the distributed pipeline's emitted triples
vs the deterministic gold rule (the in-sandbox stand-in for the
reference's annotated relations) must reach P/R ≥ 0.95.

Gold: relation holds iff the entities are dependency-proximate
(SDP ≤ GOLD_MAX_HOPS edges) — computed here *independently* of the
scoring model from the featurized SDP, exactly as the numpy training
oracle defines it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cross_sentence_relation_extraction_idepnn_spark.operators.candidates import (
    candidate_pairs,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.graph import (
    candidate_windows,
    featurize_pair,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
    detect_mentions,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.scoring import (
    score_pairs,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
    segment,
)
from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
    transcripts,
)
from cross_sentence_relation_extraction_idepnn_spark.training import (
    GOLD_MAX_HOPS,
    load_weights,
)


def test_triple_parity_pr_against_gold_rule(spark, sf_dir):
    sents = segment(transcripts(spark, sf_dir))
    feats = featurize_pair(
        candidate_windows(candidate_pairs(detect_mentions(spark, sents)), sents)
    ).filter("ok")
    scored = score_pairs(feats, weights=load_weights(), keep_cols=["cand_id"])
    gold = feats.select(
        "cand_id",
        (F.size("sdp_gidx") - 1 <= GOLD_MAX_HOPS).cast("int").alias("gold"),
    )
    agg = (
        scored.join(gold, "cand_id")
        .agg(
            F.sum(((F.col("p_rel") >= 0.5) & (F.col("gold") == 1)).cast("int")).alias("tp"),
            F.sum(((F.col("p_rel") >= 0.5) & (F.col("gold") == 0)).cast("int")).alias("fp"),
            F.sum(((F.col("p_rel") < 0.5) & (F.col("gold") == 1)).cast("int")).alias("fn"),
        )
        .collect()[0]
    )
    assert agg.tp > 0
    precision = agg.tp / (agg.tp + agg.fp)
    recall = agg.tp / (agg.tp + agg.fn)
    assert precision >= 0.95, f"precision {precision} below north-rule target"
    assert recall >= 0.95, f"recall {recall} below north-rule target"


def test_scores_are_not_knife_edge(spark, sf_dir):
    """Confidence margin: accepted triples score well above θ and
    rejected ones well below — float drift between engines cannot flip
    the emitted set (SURVEY.md §7.3.3)."""
    sents = segment(transcripts(spark, sf_dir))
    feats = featurize_pair(
        candidate_windows(candidate_pairs(detect_mentions(spark, sents)), sents)
    ).filter("ok")
    scored = score_pairs(feats, weights=load_weights(), keep_cols=["cand_id"])
    row = scored.agg(
        F.min(F.when(F.col("p_rel") >= 0.5, F.col("p_rel"))).alias("min_pos"),
        F.max(F.when(F.col("p_rel") < 0.5, F.col("p_rel"))).alias("max_neg"),
    ).collect()[0]
    assert row.min_pos is None or row.min_pos >= 0.6
    assert row.max_neg is None or row.max_neg <= 0.4


def test_punkt_treebank_e2e_matches_numpy_pipeline(spark, sf_dir):
    """VERDICT r2 #9: the gated punkt/treebank end-to-end mode — the
    full KG pipeline on a PUNCTUATED corpus with segment_punkt
    segmentation and treebank tokenization in every stage — must match
    an independently-written single-node pipeline (punkt spans →
    treebank tokens → alias mentions → nearest-pair candidates →
    kernel featurize+score) triple for triple."""
    import pyspark.sql.functions as F

    from cross_sentence_relation_extraction_idepnn_spark import kernels
    from cross_sentence_relation_extraction_idepnn_spark.config import ENTITY_ALIASES
    from cross_sentence_relation_extraction_idepnn_spark.operators import (
        segmentation as seg,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        triples_from_transcripts,
    )
    from cross_sentence_relation_extraction_idepnn_spark.training import load_weights

    pdx = seg.punctuated_transcripts(spark, sf_dir).filter(
        F.col("conv_id").cast("int") < 120
    )
    got = triples_from_transcripts(
        spark, pdx, segmenter=seg.segment_punkt, tokenizer="treebank"
    ).toPandas()

    W = load_weights()
    expected = set()
    for r in pdx.collect():
        spans = seg.punkt_spans(r["text"])
        sents = [s for s, _b, _e in spans]
        toks = [seg.treebank_tokenize(s) for s in sents]
        ops, objs = [], []
        for si, tl in enumerate(toks):
            for ti, w in enumerate(tl):
                ent = ENTITY_ALIASES.get(w.lower())
                if ent:
                    (ops if ent[1] == "OP" else objs).append((si, ti, ent[0]))
        best = {}
        for s1, t1, e1 in ops:
            for s2, t2, e2 in objs:
                k = abs(s2 - s1)
                if k > 3:
                    continue
                cand = (k, s1, t1, s2, t2)
                if (e1, e2) not in best or cand < best[(e1, e2)]:
                    best[(e1, e2)] = cand
        for (e1, e2), (k, s1, t1, s2, t2) in best.items():
            smin, smax = min(s1, s2), max(s1, s2)
            f = kernels.featurize_window(
                sents[smin : smax + 1], s1, t1, s2, t2, smin,
                tokenize=seg.treebank_tokenize,
            )
            if f is None:
                continue
            if kernels.score_batch([f], W)[0, 1] >= 0.5:
                expected.add((r["conv_id"], e1, e2, int(k)))

    got_set = set(
        (c, s, o, int(k))
        for c, s, o, k in got[["conv_id", "subj", "obj", "k"]].values
    )
    assert len(expected) > 0
    # cross-sentence pairs must be at stake, not just k=0
    assert any(k > 0 for (_c, _s, _o, k) in expected)
    assert got_set == expected


def test_staged_path_matches_fused_in_treebank_mode(spark, sf_dir):
    """The checkpointed/staged operators (featurize_pair → score_pairs)
    must produce bit-identical posteriors to the fused kernel under
    the punkt/treebank gates — otherwise a resumable punctuated-corpus
    run would silently diverge from the fast path."""
    import numpy as np
    import pyspark.sql.functions as F

    from cross_sentence_relation_extraction_idepnn_spark.operators.candidates import (
        candidate_pairs_fast,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.graph import (
        candidate_windows,
        featurize_pair,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        detect_mentions,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.scoring import (
        featurize_and_score,
        score_pairs,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        punctuated_transcripts,
        segment_punkt,
    )
    from cross_sentence_relation_extraction_idepnn_spark.training import load_weights

    pdx = punctuated_transcripts(spark, sf_dir).filter(F.col("conv_id").cast("int") < 60)
    sents = segment_punkt(pdx)
    wins = candidate_windows(
        candidate_pairs_fast(detect_mentions(spark, sents, tokenizer="treebank")), sents
    )
    W = load_weights()
    fused = {
        r["cand_id"]: r["p_rel"]
        for r in featurize_and_score(wins, weights=W, tokenizer="treebank")
        .filter("ok")
        .select("cand_id", "p_rel")
        .collect()
    }
    staged = {
        r["cand_id"]: r["p_rel"]
        for r in score_pairs(
            featurize_pair(wins, tokenizer="treebank").filter("ok"), weights=W
        )
        .select("cand_id", "p_rel")
        .collect()
    }
    assert len(fused) > 0 and set(fused) == set(staged)
    for k, v in fused.items():
        assert np.isclose(v, staged[k], rtol=0, atol=0), k  # bit-identical
