"""Standoff / ::-record codecs (S3/S10/S12) and training extras
(W6 context windows, M9 optimizer variants)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cross_sentence_relation_extraction_idepnn_spark import kernels as K
from cross_sentence_relation_extraction_idepnn_spark.operators.candidates import (
    candidate_pairs,
    tag_candidates,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
    detect_mentions,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
    segment,
)
from cross_sentence_relation_extraction_idepnn_spark.sources.standoff import (
    format_cc_records,
    format_standoff,
    parse_cc_records,
    parse_standoff,
    write_triples,
)
from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
    transcripts,
)


def test_standoff_roundtrip_entities(spark, sf_dir):
    mens = detect_mentions(spark, segment(transcripts(spark, sf_dir)))
    parsed = parse_standoff(format_standoff(mens)).toPandas()
    src = mens.toPandas()
    assert len(parsed) == len(src)
    assert (parsed["kind"] == "entity").all()
    src["ann_id"] = "T" + (src["sent_idx"] * 1000 + src["tok_idx"]).astype(str)
    j = parsed.merge(src, on=["conv_id", "ann_id"])
    assert len(j) == len(src)
    assert (j["mention"] == j["surface"]).all()
    assert (j["tag"] == j["ner_tag"]).all()
    assert (j["start"] == j["m_begin"]).all() and (j["end"] == j["m_end"]).all()


def test_standoff_relation_lines_and_f1_drop(spark):
    lines = spark.createDataFrame(
        [
            ("c1", "R1\tacts_on Arg1:T1 Arg2:T2"),
            ("c1", "T9\tTitle 0 5\tdummy"),
            ("c1", "T10\tParagraph 0 5\tdummy"),
            ("c1", "T3\tOP 0 4\tscan"),
        ],
        "conv_id string, line string",
    )
    out = parse_standoff(lines).toPandas().set_index("ann_id")
    assert "T9" not in out.index and "T10" not in out.index  # F1 drop
    assert out.loc["R1", "kind"] == "relation"
    assert out.loc["R1", "arg1"] == "T1" and out.loc["R1", "arg2"] == "T2"
    assert out.loc["T3", "mention"] == "scan"


def test_cc_record_roundtrip(spark, sf_dir):
    sents = segment(transcripts(spark, sf_dir))
    tagged = tag_candidates(candidate_pairs(detect_mentions(spark, sents)), sents)
    recs = format_cc_records(tagged)
    parsed = parse_cc_records(recs.select("rec")).toPandas().sort_values(
        ["conv_id", "k", "e1", "e2", "tagged_text"]
    ).reset_index(drop=True)
    src = (
        tagged.select(
            "conv_id",
            "k",
            F.lit("Rel").alias("label"),
            F.col("e1_surface").alias("e1"),
            F.col("e2_surface").alias("e2"),
            "tagged_text",
        )
        .toPandas()
        .sort_values(["conv_id", "k", "e1", "e2", "tagged_text"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(parsed, src, check_dtype=False)


def test_write_triples_partitioned_sink(spark, sf_dir, tmp_path):
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        materialize_kg,
    )
    import os

    kg = materialize_kg(spark, sf_dir)
    path = str(tmp_path / "kg")
    back = write_triples(kg, path, n_buckets=4)
    a = kg.toPandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = (
        back.select(*kg.columns)
        .toPandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    parts = [p for p in os.listdir(path) if p.startswith("bucket=")]
    assert len(parts) >= 2  # actually partitioned


# ------------------------------------------------------- W6 / M9 extras

def test_context_windows_reference_semantics():
    assert K.context_windows([4, 7, 9], 3) == [[-1, 4, 7], [4, 7, 9], [7, 9, -1]]
    assert K.context_windows([5], 5) == [[-1, -1, 5, -1, -1]]
    with pytest.raises(ValueError):
        K.context_windows([1, 2], 2)


def _tiny_rows(n=12, seed=4):
    rng = np.random.RandomState(seed)
    vocab = ["scan", "table", "reads", "the", "fast", "row"]
    rows = []
    for _ in range(n):
        sents = [
            [vocab[rng.randint(6)] for _ in range(int(rng.randint(2, 5)))]
            for _ in range(int(rng.randint(1, 3)))
        ]
        texts = [" ".join(s) for s in sents]
        rows.append(
            K.featurize_window(texts, 0, 0, len(sents) - 1, len(sents[-1]) - 1, 0)
        )
    return rows


@pytest.mark.parametrize("opt", ["adagrad", "adadelta"])
def test_optimizer_variants_reduce_loss(opt):
    from cross_sentence_relation_extraction_idepnn_spark import training as T

    rows = _tiny_rows()
    labels = np.array([K.h15(r["sdp_words"][0]) % 2 for r in rows])
    base = K.init_weights()

    def nll(W):
        p = K.score_batch(rows, W)
        return float(-np.log(p[np.arange(len(rows)), labels] + 1e-12).mean())

    before = nll(base)
    after = nll(T.train_full(rows, labels, base, epochs=30, lr=0.5, optimizer=opt))
    assert after < before


# ------------------------------------ official-eval .a2 assembly + zip sink


def _ref_a2_loop(records: list[tuple], threshold: float) -> dict[str, list[str]]:
    """Pure-Python mirror of the reference's defaultdict loop
    (bionlp_rnn_results_annotations.py:55-91): per-doc R-numbering in
    encounter order, fixed Bacteria/Location roles."""
    from collections import defaultdict

    predicted = defaultdict(list)
    for conv_id, _cand_id, e1_id, e2_id, p_rel in records:
        if p_rel >= threshold:
            rel_id = "R" + str(len(predicted[conv_id]) + 1)
            predicted[conv_id].append(
                f"{rel_id}\tLives_In Bacteria:{e1_id} Location:{e2_id}"
            )
    return dict(predicted)


def test_a2_lines_match_reference_loop(spark):
    from cross_sentence_relation_extraction_idepnn_spark.sources.standoff import (
        a2_annotation_lines,
    )

    records = [
        ("d1", "d1#a#b", "T1", "T2", 0.9),
        ("d1", "d1#a#c", "T1", "T3", 0.2),   # rejected
        ("d1", "d1#b#c", "T2", "T3", 0.7),
        ("d2", "d2#a#b", "T1", "T2", 0.55),
        ("d3", "d3#a#b", "T1", "T2", 0.1),   # doc with zero accepted rels
    ]
    scored = spark.createDataFrame(
        records, "conv_id string, cand_id string, e1_id string, e2_id string, p_rel double"
    )
    got = a2_annotation_lines(scored, threshold=0.5).collect()
    by_doc: dict[str, list[str]] = {}
    for r in sorted(got, key=lambda r: (r.conv_id, r.rel_num)):
        by_doc.setdefault(r.conv_id, []).append(r.line)
    assert by_doc == _ref_a2_loop(records, 0.5)
    assert "d3" not in by_doc


def test_write_a2_zip_roundtrip(spark, tmp_path):
    import os
    import zipfile

    from cross_sentence_relation_extraction_idepnn_spark.sources.standoff import (
        a2_annotation_lines,
        write_a2_zip,
    )

    scored = spark.createDataFrame(
        [
            ("d1", "d1#a#b", "T1", "T2", 0.9),
            ("d1", "d1#b#c", "T2", "T3", 0.8),
            ("d2", "d2#a#b", "T5", "T6", 0.9),
        ],
        "conv_id string, cand_id string, e1_id string, e2_id string, p_rel double",
    )
    out = str(tmp_path / "ann")
    zpath = write_a2_zip(a2_annotation_lines(scored, threshold=0.5), out)
    assert os.path.exists(os.path.join(out, "d1.a2"))
    with open(os.path.join(out, "d1.a2")) as f:
        assert f.read() == (
            "R1\tLives_In Bacteria:T1 Location:T2\n"
            "R2\tLives_In Bacteria:T2 Location:T3\n"
        )
    with zipfile.ZipFile(zpath) as zf:
        assert sorted(zf.namelist()) == ["d1.a2", "d2.a2"]
        assert zf.read("d2.a2").decode() == "R1\tLives_In Bacteria:T5 Location:T6\n"


def test_parsers_skip_malformed_lines(spark):
    """Reference parse loops skip unparseable lines (try/except +
    counters); the Spark parsers must do the same instead of dying on
    an ANSI cast/index error — one bad line must not kill a 100 TB scan."""
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.sources.standoff import (
        parse_cc_records,
        parse_standoff,
    )

    lines = spark.createDataFrame(
        [
            ("c1", "garbage no tabs"),
            ("c1", "T1\tOP 0"),  # entity missing end+mention
            ("c1", ""),
            ("c1", "T5\tHabitat 0 7\tgut"),  # valid entity
            ("c1", "R1\tLives_In Arg1:T5 Arg2:T6"),  # valid relation
            ("c1", "R2\tLives_In Arg1:T5"),  # relation missing Arg2
            ("c1", "T9\tnotanint x y\tz"),  # non-numeric offsets
        ],
        "conv_id string, line string",
    )
    got = parse_standoff(lines).collect()
    assert sorted(r.ann_id for r in got) == ["R1", "T5"]

    recs = spark.createDataFrame(
        [
            ("no separators here",),
            ("a :: b",),
            ("",),
            ("c1 :: 0 :: Rel :: a :: b :: <e1> a </e1> x <e2> b </e2>",),
            ("c1 :: notint :: Rel :: a :: b :: t",),
        ],
        "rec string",
    )
    kept = parse_cc_records(recs).collect()
    assert len(kept) == 1 and kept[0].k == 0
