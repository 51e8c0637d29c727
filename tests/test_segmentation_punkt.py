"""Punkt-like segmentation for punctuated text (reference T1 semantics,
``generate_bb_training_data_2016.py:613-630``): boundary rules,
leading-space absorption into the span head, span tiling."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
    punkt_sentences,
    punkt_spans,
    segment_punkt,
)


class TestPunktSentences:
    def test_plain_boundaries(self):
        assert punkt_sentences("Hello world. Next one. And a third.") == [
            "Hello world.",
            "Next one.",
            "And a third.",
        ]

    def test_abbreviation_not_a_boundary(self):
        assert punkt_sentences("Dr. Smith arrived. He sat down.") == [
            "Dr. Smith arrived.",
            "He sat down.",
        ]

    def test_initial_not_a_boundary(self):
        assert punkt_sentences("J. Smith joined. Then left.") == [
            "J. Smith joined.",
            "Then left.",
        ]

    def test_decimal_not_a_boundary(self):
        assert punkt_sentences("Pi is 3.14 exactly. Yes.") == [
            "Pi is 3.14 exactly.",
            "Yes.",
        ]

    def test_lowercase_continuation_not_a_boundary(self):
        assert punkt_sentences("It ran... then stopped. Done.") == [
            "It ran... then stopped.",
            "Done.",
        ]

    def test_question_exclamation(self):
        assert punkt_sentences("Really? Yes! Fine.") == ["Really?", "Yes!", "Fine."]

    def test_no_terminal_punctuation(self):
        assert punkt_sentences("no punctuation at all") == ["no punctuation at all"]


class TestPunktSpans:
    def test_leading_space_absorbed_into_span_head(self):
        """The reference extends ``end`` past separator spaces and stores
        text[start:end] — the SECOND span carries the space at its head."""
        text = "Hello world. Next one."
        assert punkt_spans(text) == [
            ("Hello world.", 0, 12),
            (" Next one.", 12, 22),
        ]

    def test_multiple_separator_spaces(self):
        text = "One.   Two."
        assert punkt_spans(text) == [("One.", 0, 4), ("   Two.", 4, 11)]

    def test_spans_tile_the_text(self):
        text = "Dr. A spoke. Pi is 3.14 now. Really? Yes! The end"
        spans = punkt_spans(text)
        assert spans[0][1] == 0
        for (_s1, _b1, e1), (_s2, b2, _e2) in zip(spans, spans[1:]):
            assert e1 == b2
        assert "".join(s for s, _, _ in spans) == text[: spans[-1][2]]

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet="abcDEF gh.!?3",
                min_size=1,
                max_size=30,
            ),
            min_size=1,
            max_size=5,
        )
    )
    def test_tiling_property(self, parts):
        text = " ".join(p.strip() for p in parts).strip()
        spans = punkt_spans(text)
        prev_end = 0
        for s, b, e in spans:
            assert b == prev_end
            assert text[b:e] == s
            assert e > b
            prev_end = e
        if spans:
            assert spans[0][1] == 0
            # nothing but whitespace after the last span
            assert text[spans[-1][2]:].strip() == ""
            assert "".join(s for s, _, _ in spans) == text[: spans[-1][2]]


def test_segment_punkt_matches_kernel(spark):
    rows = [
        ("c1", 0, "Hello world. Next one."),
        ("c1", 1, "Dr. Smith arrived. He sat down. Pi is 3.14 now."),
        ("c2", 0, "Really? Yes! no punct tail"),
        ("c2", 1, ""),
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = (
        segment_punkt(t)
        .orderBy("conv_id", "turn_idx", "sent_in_turn")
        .collect()
    )
    expect = []
    for conv_id, turn_idx, text in rows:
        for i, (s, b, e) in enumerate(punkt_spans(text)):
            expect.append((conv_id, turn_idx, i, s, b, e))
    assert [
        (r.conv_id, r.turn_idx, r.sent_in_turn, r.sent_text, r.begin, r.end)
        for r in got
    ] == expect
    # sent_idx is the stable per-conversation ordering (W1 contract)
    by_conv: dict[str, list[int]] = {}
    for r in sorted(got, key=lambda r: (r.conv_id, r.turn_idx, r.begin)):
        by_conv.setdefault(r.conv_id, []).append(r.sent_idx)
    for idxs in by_conv.values():
        assert idxs == list(range(len(idxs)))
    # n_tokens counts whitespace-delimited words despite absorbed spaces
    row = [r for r in got if r.sent_text == " Next one."][0]
    assert row.n_tokens == 2


class TestT2TreebankTokenizer:
    """The reference's two-tokenizer distinction (T2): generate_sdp.py
    uses word_tokenize while generate_pos.py whitespace-splits — pinned
    by treebank_tokenize so the divergence is testable."""

    def test_punctuation_split(self):
        from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
            treebank_tokenize,
        )

        assert treebank_tokenize("Hello, world.") == ["Hello", ",", "world", "."]
        assert treebank_tokenize("wait... what?!") == ["wait", "...", "what", "?", "!"]
        assert treebank_tokenize('"Quoted text"') == ["``", "Quoted", "text", "''"]

    def test_contractions_split(self):
        from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
            treebank_tokenize,
        )

        assert treebank_tokenize("don't stop") == ["do", "n't", "stop"]
        assert treebank_tokenize("it's Bob's (test)") == [
            "it", "'s", "Bob", "'s", "(", "test", ")",
        ]

    def test_interior_periods_kept(self):
        from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
            treebank_tokenize,
        )

        assert treebank_tokenize("3.14 is pi.") == ["3.14", "is", "pi", "."]
        assert treebank_tokenize("U.S. policy works") == ["U.S.", "policy", "works"]

    def test_divergence_from_whitespace_split_on_punctuated_text(self):
        """THE T2 point: the two tokenizations disagree on punctuated
        input (so SDP indices and POS indices shift in the reference),
        but coincide on the punctuation-free synthetic corpus — which is
        why production keeps one tokenizer."""
        from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
            treebank_tokenize,
        )

        punctuated = "the scan, it ran."
        assert treebank_tokenize(punctuated) != punctuated.split()
        assert len(treebank_tokenize(punctuated)) == len(punctuated.split()) + 2

        clean = "the scan reads the table fast"
        assert treebank_tokenize(clean) == clean.split()


def test_punctuated_fixture_exercises_every_boundary_rule(spark, sf_dir):
    """The driver-surface punkt query must be non-vacuous: each
    suppression rule (abbreviation, single initial, mid-number period,
    lowercase continuation) and the '!?' run must actually fire on the
    fixture — otherwise the green oracle row proves nothing."""
    import re

    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        punctuated_transcripts,
        segment_punkt,
    )

    sents = [
        r["sent_text"]
        for r in segment_punkt(punctuated_transcripts(spark, sf_dir))
        .select("sent_text")
        .collect()
    ]
    assert sum(bool(re.search(r"Dr\. [A-Z0-9]", s)) for s in sents) > 0
    assert sum(bool(re.search(r"J\. [A-Z0-9]", s)) for s in sents) > 0
    assert sum("3.14" in s for s in sents) > 0
    assert sum(bool(re.search(r"[a-z]\. [a-z]", s)) for s in sents) > 0
    assert sum(s.rstrip().endswith("!?") for s in sents) > 0


def test_token_level_boundary_rule_equals_char_scan_randomized():
    """The sentences_punkt oracle reformulates punkt_sentences at token
    level (boundary between tokens j, j+1 iff token j ends with a
    [.!?] run, token j+1 starts upper/digit, and the pre-run word is
    neither abbreviation nor single initial). For single-spaced text
    the two formulations must agree — randomized over words decorated
    with the full rule surface (abbrevs, initials, numbers, !? runs,
    quotes/parens prefixes)."""
    import random
    import re

    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        ABBREVIATIONS,
        punkt_sentences,
    )

    rng = random.Random(7)
    base = ["alpha", "bravo", "Charlie", "delta9", "Echo", "x", "Dr", "fig", "3"]
    decor = ["", ".", "!?", "...", "!"]
    prefix = ["", "(", '"']

    def token_rule_sentences(text):
        toks = text.split(" ")
        bounds = []
        for j in range(len(toks) - 1):
            tok, nxt = toks[j], toks[j + 1]
            if not re.search(r"[.!?]$", tok):
                continue
            if not re.match(r"^[A-Z0-9]", nxt):
                continue
            wrd = re.sub(r"[.!?]+$", "", tok)
            if len(wrd) == 1 and wrd.isupper() and wrd.isalpha():
                continue
            if wrd.lower().lstrip("(\"'").rstrip(".") in ABBREVIATIONS:
                continue
            bounds.append(j)
        out, start = [], 0
        for b in bounds:
            out.append(" ".join(toks[start : b + 1]))
            start = b + 1
        if start < len(toks):
            out.append(" ".join(toks[start:]))
        return out

    for _ in range(400):
        n = rng.randint(1, 14)
        toks = [
            rng.choice(prefix) + rng.choice(base) + rng.choice(decor)
            for _ in range(n)
        ]
        text = " ".join(toks)
        assert punkt_sentences(text) == token_rule_sentences(text), text


def test_segmenter_divergence_hand_computed(spark, tmp_path):
    """5-word doc: fixture 'W0 w1 w2 Dr. W4.' — punkt sees 1 sentence
    ('Dr.' is an abbreviation, the trailing period has no successor),
    the 4-word window sees 2 → diff 1. 8-word doc: fixture
    'W0 w1 w2 Dr. W4. W5. w6 J.' — punkt splits only after 'W4.'
    ('W5.' precedes lowercase, 'J.' is terminal) = 2 sentences,
    window ceil(8/4) = 2 → diff 0. Histogram {1: 1, 0: 1}."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        segmenter_divergence,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(5))),
        (2, " ".join(f"w{i}" for i in range(8))),
    ]
    path = str(tmp_path / "segdiv")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        r.sent_diff: r.n_docs
        for r in segmenter_divergence(spark, path).collect()
    }
    assert got == {1: 1, 0: 1}


def test_segmenter_divergence_conserves_docs(spark, sf_dir):
    """The histogram's doc mass equals the corpus doc count and its
    signed mass equals the difference of the two public row-level
    operators' totals — the census cannot invent or drop documents."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        punctuated_transcripts,
        segment,
        segment_punkt,
        segmenter_divergence,
    )

    hist = segmenter_divergence(spark, sf_dir).collect()
    pdoc = punctuated_transcripts(spark, sf_dir)
    n_docs = pdoc.count()
    n_win = segment(pdoc).count()
    n_pk = segment_punkt(pdoc).count()
    assert sum(r.n_docs for r in hist) == n_docs
    assert sum(r.sent_diff * r.n_docs for r in hist) == n_win - n_pk


def test_turn_reassembly_invariant_holds(spark, sf_dir):
    """The north-rule invariant as a census: over the real corpus
    every reassembled turn equals its transcript text — (N, N, 0)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        turn_reassembly,
    )
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        transcripts,
    )

    row = turn_reassembly(spark, sf_dir).collect()[0]
    n = transcripts(spark, sf_dir).count()
    assert (row.n_turns, row.n_match, row.n_mismatch) == (n, n, 0)


def test_turn_reassembly_detects_mismatch(spark, tmp_path, monkeypatch):
    """Force a divergent reassembly (a corrupted segmenter that drops
    the first word of every turn) and the census must count every
    multi-word turn as a mismatch — the tripwire actually fires."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators import (
        segmentation as seg_mod,
    )

    rows = [(1, " ".join(f"w{i}" for i in range(8)))]
    path = str(tmp_path / "tr")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))

    real_segment = seg_mod.segment

    def corrupted(transcripts_df, sent_words=seg_mod.SENT_WORDS):
        s = real_segment(transcripts_df, sent_words)
        return s.withColumn(
            "sent_text",
            F.when(
                F.col("sent_in_turn") == 0,
                F.expr("substring(sent_text, instr(sent_text, ' ') + 1)"),
            ).otherwise(F.col("sent_text")),
        )

    monkeypatch.setattr(seg_mod, "segment", corrupted)
    row = seg_mod.turn_reassembly(spark, path).collect()[0]
    assert row.n_turns == 1 and row.n_mismatch == 1 and row.n_match == 0
