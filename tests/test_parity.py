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
