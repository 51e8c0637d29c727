"""Single-node training of the relation-scoring head (SURVEY.md §3.3).

The reference trains end-to-end with per-example Theano steps
(M8 NLL + L2 cost ``elman_bidirection_RC.py:532-550``; M9 SGD with
gradient clipping ``optimiser/grad_optimiser.py:83-103``). Per
SURVEY.md §7.0 the distributed path is inference-only: training runs
once, single-node, and ships frozen weights.

Here the recurrent feature extractor stays at its deterministic frozen
initialization and the softmax head (M7) is trained by full-batch
gradient descent on NLL + L2 with gradient-norm clipping — the same
cost/update family, applied to the parameters the parity metric
actually exercises. Gold labels come from the synthetic corpus rule
(relation holds iff the pair is intra-sentence or adjacent, k ≤ 1 —
mirroring the reference's train-k≤1 configuration,
``supplementary_material.pdf`` Table 3).

``python -m cross_sentence_relation_extraction_idepnn_spark.training`` regenerates
``artifacts/weights.json``; the pipeline loads it at job start and
broadcasts once.
"""

from __future__ import annotations

import json
import os

import numpy as np

from . import kernels

ARTIFACT = os.path.join(os.path.dirname(__file__), "artifacts", "weights.json")

GOLD_MAX_K = 1
L2 = 1e-4
LR = 1.0
EPOCHS = 400
CLIP = 5.0


def gold_label(k: int) -> int:
    """Synthetic gold rule: relation holds iff k ≤ GOLD_MAX_K."""
    return 1 if k <= GOLD_MAX_K else 0


def train_head(
    feats: np.ndarray, labels: np.ndarray, base: dict[str, np.ndarray]
) -> dict[str, np.ndarray]:
    """Full-batch NLL + L2 gradient descent on (W_hy_adp, b_y)."""
    n, d = feats.shape
    W = base["W_hy_adp"].copy()
    b = base["b_y"].copy()
    onehot = np.eye(kernels.N_CLASSES)[labels]
    for _ in range(EPOCHS):
        logits = feats @ W + b
        logits -= logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        p = e / e.sum(axis=1, keepdims=True)
        gl = (p - onehot) / n
        gW = feats.T @ gl + L2 * W
        gb = gl.sum(axis=0)
        norm = float(np.sqrt((gW**2).sum() + (gb**2).sum()))
        if norm > CLIP:  # M9 gradient-norm cutoff
            gW *= CLIP / norm
            gb *= CLIP / norm
        W -= LR * gW
        b -= LR * gb
    out = dict(base)
    out["W_hy_adp"] = W
    out["b_y"] = b
    return out


def save_weights(weights: dict[str, np.ndarray], path: str = ARTIFACT) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(kernels.weights_to_lists(weights), f)


def load_weights(path: str = ARTIFACT) -> dict[str, np.ndarray]:
    """Frozen weights; falls back to the deterministic init when the
    artifact is absent (e.g. fresh checkout before training ran)."""
    if os.path.exists(path):
        with open(path) as f:
            return kernels.weights_from_lists(json.load(f))
    return kernels.init_weights()


def _collect_training_set(sf_dir: str):
    """Featurize candidates at small scale through the Spark path and
    pull them to the driver (training sets are tiny by design)."""
    from .operators.candidates import candidate_pairs
    from .operators.graph import candidate_windows, featurize_pair
    from .operators.mentions import detect_mentions
    from .operators.segmentation import segment
    from .session import get_spark
    from .sources.transcripts import transcripts

    spark = get_spark("idepnn_train", cores=8)
    sents = segment(transcripts(spark, sf_dir))
    cands = candidate_pairs(detect_mentions(spark, sents))
    feats = featurize_pair(candidate_windows(cands, sents)).filter("ok")
    pdf = feats.select(
        "k",
        "sdp_gidx",
        "sdp_words",
        "sdp_pos",
        "sdp_iob",
        "pi_e1",
        "pi_e2",
        "win_words",
        "parents",
        "tree_order",
    ).toPandas()
    rows = pdf.to_dict("records")
    ks = np.array([int(r.pop("k")) for r in rows])
    return rows, ks


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    base = kernels.init_weights()
    rows, ks = _collect_training_set(sf_dir)
    labels = np.array([gold_label(k) for k in ks])
    feats = kernels.feature_batch(rows, base, use_adp=True)
    trained = train_head(feats, labels, base)
    probs = kernels.softmax_head(feats, trained, use_adp=True)
    pred = probs.argmax(axis=1)
    acc = float((pred == labels).mean())
    tp = int(((pred == 1) & (labels == 1)).sum())
    fp = int(((pred == 1) & (labels == 0)).sum())
    fn = int(((pred == 0) & (labels == 1)).sum())
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    print(
        f"train n={len(labels)} pos={int(labels.sum())} acc={acc:.4f} "
        f"P={p:.4f} R={r:.4f} F1={f1:.4f}"
    )
    save_weights(trained)
    print(f"saved {ARTIFACT}")


if __name__ == "__main__":
    main()
