"""Parity of the reference's string heuristics (SURVEY.md §7.3.1):
T3 replace-once tag insertion with offset fallback, G3 entity-index
resolution with occurrence priority."""

from __future__ import annotations

from cross_sentence_relation_extraction_idepnn_spark.kernels import (
    entity_token_index,
    tag_insert_replace_once,
)


class TestT3TagInsertion:
    def test_simple_first_occurrence(self):
        out = tag_insert_replace_once("the scan reads a table", "scan", "table")
        assert out == "the <e1>scan</e1> reads a <e2>table</e2>"

    def test_multi_occurrence_uses_offset_fallback(self):
        """Reference: replace-once would tag the WRONG (first) mention;
        with offsets the slice fallback tags the intended one
        (generate_bb_training_data_2016.py:498-508)."""
        sent = "scan the scan output table"
        # intended e1 = SECOND 'scan' at char 9
        out = tag_insert_replace_once(sent, "scan", "table", start1=9, start2=21)
        assert out == "scan the <e1>scan</e1> output <e2>table</e2>"

    def test_no_offsets_ambiguous_tags_first(self):
        # without offsets the reference tags the first occurrence —
        # faithfully reproduced (the quirk IS the contract)
        out = tag_insert_replace_once("scan the scan", "scan", "the")
        assert out.startswith("<e1>scan</e1>")

    def test_e2_offset_shift_after_e1_tags(self):
        sent = "table scan table"
        out = tag_insert_replace_once(sent, "scan", "table", start1=6, start2=11)
        assert out == "table <e1>scan</e1> <e2>table</e2>"


class TestG3EntityIndex:
    words = "the scan reads scan output".split()

    def test_priority_first_vs_last(self):
        assert entity_token_index(self.words, "scan", priority=0) == 1
        assert entity_token_index(self.words, "scan", priority=1) == 3

    def test_substring_fallback(self):
        # no exact token 'scans' → substring fallback hits 'scan'... the
        # reverse: entity 'scan' matches token 'scanning' by substring
        assert entity_token_index(["a", "scanning", "b"], "scan") == 1

    def test_multiword_second_token_fallback(self):
        # 'fast' matches nothing → reference's except-branch falls back
        # to the second entity token's list (generate_sdp.py:44-46)
        assert entity_token_index(self.words, "fast scan", priority=0) == 1

    def test_multiword_walkback_required(self):
        """The ≤3-token walk-back (generate_sdp.py:47-51): base index
        from the ambiguous first token is 0, but the unique second token
        at position 3 re-anchors to 3 - 1 = 2."""
        words = "scan a scan network b".split()
        assert entity_token_index(words, "scan network", priority=0) == 2
        # priority=1 picks the LAST occurrence as base (scan@2) but the
        # unique-token walk-back overrides it identically
        assert entity_token_index(words, "scan network", priority=1) == 2

    def test_walkback_last_unique_token_wins(self):
        # both tokens unique → the loop keeps overwriting; the last
        # unique token anchors: idx = pos('network') - 1 = 1
        words = "deep neural network model".split()
        assert entity_token_index(words, "neural network", priority=0) == 1

    def test_walkback_capped_at_token_3(self):
        # 4th entity token (iterator 3) breaks out before re-anchoring
        # (generate_sdp.py:48-49) — unique 'd' at 7 must NOT win
        words = "a x a x a x a d".split()
        assert entity_token_index(words, "a x a d", priority=0) == 0

    def test_walkback_no_clamp_can_go_negative(self):
        # the reference subtracts without clamping; pin that behavior
        words = "network others".split()
        assert entity_token_index(words, "ghost network", priority=0) == -1

    def test_unresolvable_returns_none(self):
        assert entity_token_index(self.words, "zebra") is None


class TestT12StopwordPunctGates:
    """Config-gated T12 behaviors (features_bb2016.py:1639-1678) and the
    F6 OTHER-class drop (:1322-1336) — both off by default."""

    def test_remove_stopwords_matches_reference(self, spark):
        from pyspark.sql import functions as F

        from cross_sentence_relation_extraction_idepnn_spark.functions.text import (
            remove_stopwords,
        )

        df = spark.createDataFrame(
            [("a scan and . the table",), ("a an and",)], "t string"
        )
        got = [r[0] for r in df.select(remove_stopwords(F.col("t"))).collect()]
        # reference remove_stop_words: drop stoplist tokens, lstrip
        assert got == ["scan the table", ""]

    def test_remove_punctuation_matches_reference(self, spark):
        from pyspark.sql import functions as F

        from cross_sentence_relation_extraction_idepnn_spark.functions.text import (
            PUNCTUATIONS,
            remove_punctuation,
        )

        def ref(sentence: str) -> str:
            no_punct = ""
            for char in sentence:
                if char not in PUNCTUATIONS:
                    no_punct = no_punct + str(char).lower()
            return no_punct

        samples = ["Hello, World! (test)", "A-B.c/d:e", "plain text"]
        df = spark.createDataFrame([(s,) for s in samples], "t string")
        got = [r[0] for r in df.select(remove_punctuation(F.col("t"))).collect()]
        assert got == [ref(s) for s in samples]

    def test_all_stopwords_skip_condition(self, spark):
        from pyspark.sql import functions as F

        from cross_sentence_relation_extraction_idepnn_spark.functions.text import (
            all_stopwords,
        )

        df = spark.createDataFrame(
            [("a an and .",), ("a scan",), ("AND A",)], "t string"
        )
        got = [r[0] for r in df.select(all_stopwords(F.col("t"))).collect()]
        assert got == [True, False, True]  # lowercased before the check

    def test_f6_other_class_drop_gate(self, spark):
        from cross_sentence_relation_extraction_idepnn_spark.sources.standoff import (
            parse_cc_records,
        )

        recs = spark.createDataFrame(
            [
                ("c1 :: 0 :: Rel :: a :: b :: <e1> a </e1> x <e2> b </e2>",),
                ("c1 :: 1 :: OTHER :: a :: c :: <e1> a </e1> y <e2> c </e2>",),
            ],
            "rec string",
        )
        assert parse_cc_records(recs).count() == 2  # default keeps OTHER
        kept = parse_cc_records(recs, remove_other_class=True).collect()
        assert [r.label for r in kept] == ["Rel"]

    def test_o3_second_ranked_class(self, spark):
        """O3 (gated): 2nd-ranked class per elman-bidirection.py:924-926
        — argsort[-2] over the confidence vector; for the 2-class head
        y_2nd is always the non-argmax class."""
        import numpy as np

        from cross_sentence_relation_extraction_idepnn_spark import kernels

        # 19-class SemEval shape: argsort(confidences)[17] == argsort[-2]
        rng = np.random.RandomState(7)
        probs = rng.rand(50, 19)
        got = kernels.second_ranked(probs)
        ref = np.array([np.argsort(p)[17] for p in probs])
        assert (got == ref).all()
        assert kernels.second_ranked(np.zeros((0, 2))).shape == (0,)

    def test_o3_gated_column_in_score_pairs(self, spark, sf_dir):
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

        sents = segment(transcripts(spark, sf_dir))
        feats = featurize_pair(
            candidate_windows(candidate_pairs(detect_mentions(spark, sents)), sents)
        ).filter("ok").limit(50)
        base = score_pairs(feats)
        assert "y_2nd" not in base.columns  # default off, like RANKING=False
        scored = score_pairs(feats, emit_second=True).select("y_pred", "y_2nd").collect()
        assert len(scored) > 0
        assert all(r.y_2nd == 1 - r.y_pred for r in scored)  # 2-class head
