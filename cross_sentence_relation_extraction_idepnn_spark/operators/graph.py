"""SDP/ADP featurization as a vectorized Arrow kernel (SURVEY.md §2.12 #3).

``featurize_pair`` is the ``mapInPandas`` stage that turns each
candidate window into inter-sentential dependency-path features:
deterministic parse (G1), global graph with root chaining (G2), exact
entity-index resolution (G3), BFS shortest path = iSDP (G4), flattened
ADP tree schedule (G5), position/POS/IOB index arrays (M11–M13).

The reference re-parses every candidate through a JVM subprocess
(``generate_sdp.py:24-28,70-79``) — the dominant hot spot (SURVEY.md
§4.2.1). Here parsing is in-process, batched, and *narrow*: no shuffle;
Arrow batches cross the JVM↔Python boundary once.

Rows whose SDP is unreachable or that tokenize empty are routed to the
quarantine side-output (F3/F5 semantics,
``generate_bb_training_data_2016.py:765-769``) via ``ok = false`` —
the pipeline splits on the flag so both sides stay observable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels

CAND_COLS = [
    "conv_id",
    "cand_id",
    "cand_seq",
    "e1_id",
    "e2_id",
    "e1_surface",
    "e2_surface",
    "sent1",
    "tok1",
    "sent2",
    "tok2",
    "k",
]

FEAT_FIELDS = (
    "sdp_gidx array<int>, sdp_words array<string>, sdp_pos array<int>, "
    "sdp_iob array<int>, pi_e1 array<int>, pi_e2 array<int>, "
    "win_words array<string>, parents array<int>, tree_order array<int>, "
    # M12 — explicit entity-presence bit pairs (word-set membership,
    # elman-bidirection.py:186-189); the model consumes the IOB channel,
    # these stay observable columns for reference parity
    "ent_pres_e1 array<int>, ent_pres_e2 array<int>"
)


def candidate_windows(candidates: DataFrame, sentences: DataFrame) -> DataFrame:
    """Attach the ordered window sentence texts to each candidate.

    Sentences are first folded into ONE ordered array per conversation
    (``sent_idx`` is 0-based dense per conv, so array position =
    sent_idx), then the window is a native ``slice`` after an equi-join
    on ``conv_id``. Both inputs are already hash-partitioned by
    ``conv_id`` (segmentation window / candidate aggregation), so the
    fold and the join introduce no new exchange — unlike the previous
    range-join + per-candidate collect_list formulation, which shuffled
    every (candidate × window-sentence) row twice.
    """
    conv_sents = sentences.groupBy("conv_id").agg(
        F.array_sort(F.collect_list(F.struct("sent_idx", "sent_text"))).alias("_arr")
    )
    c = candidates.withColumn("smin", F.least("sent1", "sent2")).withColumn(
        "smax", F.greatest("sent1", "sent2")
    )
    win = F.slice(F.col("_arr"), F.col("smin") + 1, F.col("smax") - F.col("smin") + 1)
    return (
        c.join(conv_sents, "conv_id")
        .withColumn("wtexts", F.transform(win, lambda s: s.sent_text))
        .drop("_arr")
    )


def _entity_path_positions():
    """(p1, p2) — 0-based SDP index of each entity, from the IOB
    channel (1 marks e1, 2 marks e2; a contained pair has no 2 and the
    kernel anchors both positions at e1, mirrored here)."""
    p1 = F.array_position("sdp_iob", 1) - 1
    raw_p2 = F.array_position("sdp_iob", 2)
    p2 = F.when(raw_p2 == 0, p1).otherwise(raw_p2 - 1)
    return p1, p2


def position_bounds(featurized: DataFrame) -> DataFrame:
    """A4 — global unnormalised-position bounds scan
    (``elman-bidirection.py:276-314``): min/max of *signed*
    token-to-entity distances over every featurized sequence, plus
    ``pos_vocab_size = int(max + |min|)``. The reference loops the
    whole corpus on the driver; here it is one map-side-combined
    ``agg(min, max)`` — the 2-pass structure survives (bounds then
    shift) but each pass is distributed. Signed distances per row span
    ``[-p, L-1-p]`` for each entity position p, so the scan needs no
    re-featurization — pure Column algebra over ``sdp_iob``."""
    p1, p2 = _entity_path_positions()
    last = F.size("sdp_iob") - 1
    row_min = F.least(-p1, -p2)
    row_max = F.greatest(last - p1, last - p2)
    return featurized.filter("ok").agg(
        F.min(row_min).cast("int").alias("min_pos"),
        F.max(row_max).cast("int").alias("max_pos"),
        (F.max(row_max) + F.abs(F.min(row_min))).cast("int").alias("pos_vocab_size"),
    )


def shift_positions(featurized: DataFrame) -> DataFrame:
    """A4 application — per-token signed distances shifted
    non-negative by ``|min_pos|`` (the reference adds
    ``[abs(min), abs(min)]`` to every pair). The 1-row bounds side is
    broadcast; the shift itself is a native array ``transform`` (no
    Python). Adds ``pos_e1``/``pos_e2`` arrays."""
    b = position_bounds(featurized)
    p1, p2 = _entity_path_positions()
    shift = F.abs(F.col("min_pos"))

    def pos(p):
        return F.transform(
            F.sequence(F.lit(0), F.size("sdp_iob") - 1),
            lambda i: (i - p + shift).cast("int"),
        )

    return (
        featurized.filter("ok")
        .crossJoin(F.broadcast(b))
        .withColumn("pos_e1", pos(p1))
        .withColumn("pos_e2", pos(p2))
    )


def featurize_pair(windows: DataFrame) -> DataFrame:
    """candidate windows → feature arrays (+ ``ok`` quarantine flag)."""
    out_schema = (
        ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in windows.schema.fields
        )
        + ", ok boolean, "
        + FEAT_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        empty = {
            "sdp_gidx": None,
            "sdp_words": None,
            "sdp_pos": None,
            "sdp_iob": None,
            "pi_e1": None,
            "pi_e2": None,
            "win_words": None,
            "parents": None,
            "tree_order": None,
            "ent_pres_e1": None,
            "ent_pres_e2": None,
        }
        for pdf in batches:
            feats = []
            for row in pdf.itertuples(index=False):
                f = kernels.featurize_window(
                    list(row.wtexts),
                    int(row.sent1),
                    int(row.tok1),
                    int(row.sent2),
                    int(row.tok2),
                    int(row.smin),
                )
                if f is None:
                    feats.append({"ok": False, **empty})
                else:
                    f1, f2 = kernels.entity_presence_flags(
                        f["sdp_words"], str(row.e1_surface), str(row.e2_surface)
                    )
                    feats.append(
                        {"ok": True, **f, "ent_pres_e1": f1, "ent_pres_e2": f2}
                    )
            out = pd.concat(
                [pdf.reset_index(drop=True), pd.DataFrame(feats)], axis=1
            )
            yield out

    return windows.mapInPandas(run, schema=out_schema)
