"""Batched relation-scoring kernel (SURVEY.md §2.12 #4, §2.10 M1–M7).

``score_pairs`` applies the frozen iDepNN forward pass (bi-RNN over the
iSDP + TreeRNN over the ADP) to featurized candidates inside
``mapInPandas``. Weights are broadcast once per job (the reference
reloads ``.npy`` files per run, ``elman_bidirection_RC.py:1273-1281``);
each Arrow chunk is scored with batched matmuls — no per-row Python.

Output mirrors the reference's ``.decision``/``.prob`` sinks
(``elman-bidirection.py:2547-2562``) as columns: ``y_pred`` (argmax)
and ``p_rel`` (P(class=1)).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels
from ..config import PREDICATE, SCORE_THRESHOLD


FEATURE_COLS = [
    "sdp_gidx",
    "sdp_words",
    "sdp_pos",
    "sdp_iob",
    "pi_e1",
    "pi_e2",
    "win_words",
    "parents",
    "tree_order",
]

PASSTHROUGH_COLS = [
    "conv_id",
    "cand_id",
    "cand_seq",
    "e1_id",
    "e2_id",
    "e1_surface",
    "e2_surface",
    "k",
]


def score_pairs(
    featurized: DataFrame,
    weights=None,
    use_adp: bool = True,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """featurized (ok rows) → (keep_cols…, y_pred int, p_rel double).

    Arrow traffic is pruned on both sides of the kernel: only the
    feature arrays + ``keep_cols`` enter Python, and only ``keep_cols``
    + scores come back (the feature arrays never cross the boundary
    twice). ``keep_cols`` defaults to the id/surface columns
    ``emit_triples`` needs.
    """
    if weights is None:
        weights = kernels.init_weights()
    if keep_cols is None:
        keep_cols = [c for c in PASSTHROUGH_COLS if c in featurized.columns]
    wlists = kernels.weights_to_lists(weights)
    sc = featurized.sparkSession.sparkContext
    bweights = sc.broadcast(wlists)

    pruned = featurized.select(*keep_cols, *FEATURE_COLS)
    keep_fields = [f for f in pruned.schema.fields if f.name in keep_cols]
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep_fields)
        + ", y_pred int, p_rel double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W = kernels.weights_from_lists(bweights.value)
        for pdf in batches:
            rows = [
                {k: list(getattr(r, k)) for k in FEATURE_COLS}
                for r in pdf.itertuples(index=False)
            ]
            probs = kernels.score_batch(rows, W, use_adp=use_adp)
            out = pdf[keep_cols].reset_index(drop=True).copy()
            out["y_pred"] = probs.argmax(axis=1).astype("int32")
            out["p_rel"] = probs[:, 1]
            yield out

    return pruned.mapInPandas(run, schema=out_schema)


def emit_triples(scored: DataFrame, threshold: float = SCORE_THRESHOLD) -> DataFrame:
    """Threshold + triple assembly (reference: ``bb2016_threshold.py:44-81``).

    Output: ``(conv_id, subj, pred, obj, subj_surface, obj_surface,
    k, score, cand_id)`` — one row per accepted candidate; dedup /
    canonicalization happen downstream (A10/G6).
    """
    return (
        scored.filter(F.col("p_rel") >= threshold)
        .select(
            "conv_id",
            F.col("e1_id").alias("subj"),
            F.lit(PREDICATE).alias("pred"),
            F.col("e2_id").alias("obj"),
            F.col("e1_surface").alias("subj_surface"),
            F.col("e2_surface").alias("obj_surface"),
            "k",
            F.round(F.col("p_rel"), 6).alias("score"),
            "cand_id",
        )
    )
