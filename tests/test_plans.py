"""Physical-plan regression tests: the plan shapes we designed for
must survive code changes (SURVEY.md §4, task rule: broadcast what's
broadcast-able, push down what's pushable, keep codegen wide)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from cross_sentence_relation_extraction_idepnn_spark.operators import (
    dedup,
    similarity,
    textstats,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.candidates import (
    candidate_pairs_fast,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
    detect_mentions,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
    segment,
)
from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
    transcripts,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def count_op(plan: str, op: str) -> int:
    """Count physical operators by their '(n) OpName' detail headers."""
    import re

    return len(re.findall(rf"^\(\d+\) {op}\b", plan, flags=re.MULTILINE))


def test_alias_dictionary_join_is_broadcast(spark, sf_dir):
    plan = plan_of(detect_mentions(spark, segment(transcripts(spark, sf_dir))))
    assert "BroadcastHashJoin" in plan  # tiny dim → no shuffle
    assert "BroadcastExchange" in plan


def test_similarity_query_side_is_broadcast(spark, sf_dir):
    plan = plan_of(similarity.cosine_topk(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    """lang_id needs only (doc_id, text): the scan must not read the
    other document columns (Catalyst column pruning → ReadSchema)."""
    plan = plan_of(textstats.lang_id(spark, sf_dir))
    scan = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in scan and "text" in scan
    assert "n_chars" not in scan and "source" not in scan


def test_predicate_pushdown_reaches_parquet_scan(spark, sf_dir):
    """A doc_id filter must reach the parquet reader as PushedFilters."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 10
    ).select("doc_id", "text")
    plan = plan_of(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "LessThan(doc_id,10)" in pushed


def test_dedup_exact_is_single_exchange(spark, sf_dir):
    """Hash-groupBy dedup: one shuffle, partial aggregation before it
    (map-side combine)."""
    plan = plan_of(dedup.dedup_exact(spark, sf_dir))
    assert count_op(plan, "Exchange") == 1
    assert count_op(plan, "HashAggregate") == 2  # partial + final


def test_candidate_fast_path_single_agg_exchange(spark, sf_dir):
    """candidate_pairs_fast: the nearest-pair min_by agg adds exactly
    one non-broadcast exchange beyond the segmentation window's, and
    no Sort-based window operator appears."""
    mens = detect_mentions(spark, segment(transcripts(spark, sf_dir)))
    plan = plan_of(candidate_pairs_fast(mens))
    # exchanges: sentence window per self-join side (no reuse without
    # persist) + the min_by agg = ≤ 3; crucially only ObjectHashAggregate/
    # SortAggregate — the two ROW_NUMBER windows of the oracle variant
    # are gone (exactly the sentence-index windows remain)
    assert count_op(plan, "Exchange") <= 3, plan
    assert count_op(plan, "Window") <= 2, plan  # only W1 sent_idx windows


def test_whole_stage_codegen_covers_textstats(spark, sf_dir):
    """Text-analysis queries must stay in codegen (no Python in the
    row path)."""
    for fn in (textstats.lang_id, textstats.quality_score, textstats.token_counts):
        plan = plan_of(fn(spark, sf_dir))
        assert "codegen id" in plan  # whole-stage codegen spans exist
        assert "PythonUDF" not in plan and "MapInPandas" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
