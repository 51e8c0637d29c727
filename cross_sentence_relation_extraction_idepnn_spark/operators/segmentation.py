"""Sentence segmentation with character offsets (SURVEY.md §2.8 T1, §2.5 W1–W2).

Reference semantics: NLTK punkt segmentation with offsets re-derived
against the raw text, including the leading-space absorption fixup
(``generate_bb_training_data_2016.py:613-630``). The synthetic corpus
is punctuation-free, so the punkt-equivalent deterministic boundary is
a fixed word window (``SENT_WORDS``); offsets follow the same contract:
``begin`` = first char of the sentence within the *turn* text,
``end`` = one past the last char, a leading separator space is absorbed
into the gap (never into the sentence).

Everything here is native Column algebra — no Python in the row path.
The W1 invariant (stable turn ordering) is realized as a
``row_number`` window over ``(conv_id, turn_idx, begin)``: the global
``sent_idx`` every downstream operator keys on.

Scale note: the window partitions by ``conv_id`` only — one shuffle,
reused by the downstream candidate join which is keyed on the same
column, so Catalyst/AQE can avoid a second exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SENT_WORDS
from ..sources.transcripts import duck_transcripts_cte


def segment(transcripts: DataFrame, sent_words: int = SENT_WORDS) -> DataFrame:
    """transcripts → sentences ``(conv_id, turn_idx, sent_idx, sent_in_turn,
    sent_text, begin, end, n_tokens)``."""
    ws = F.col("ws")
    n_sents = F.greatest(F.ceil(F.size(ws) / F.lit(sent_words)), F.lit(1)).cast("int")
    sent = F.explode(
        F.transform(
            F.sequence(F.lit(0), n_sents - 1),
            lambda i: F.struct(
                i.cast("int").alias("sent_in_turn"),
                F.array_join(
                    F.slice(F.col("ws"), i * sent_words + 1, sent_words), " "
                ).alias("sent_text"),
                # chars of all prior words + one separator space if i > 0
                (
                    F.length(F.array_join(F.slice(F.col("ws"), 1, i * sent_words), " "))
                    + F.when(i > 0, F.lit(1)).otherwise(F.lit(0))
                )
                .cast("int")
                .alias("begin"),
            ),
        )
    )
    exploded = (
        transcripts.select(
            "conv_id", "turn_idx", F.split(F.col("text"), " ").alias("ws")
        )
        .select("conv_id", "turn_idx", sent.alias("s"))
        .select(
            "conv_id",
            "turn_idx",
            F.col("s.sent_in_turn").alias("sent_in_turn"),
            F.col("s.sent_text").alias("sent_text"),
            F.col("s.begin").alias("begin"),
            (F.col("s.begin") + F.length("s.sent_text")).cast("int").alias("end"),
            F.size(F.split(F.col("s.sent_text"), " ")).alias("n_tokens"),
        )
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "begin")
    return exploded.withColumn(
        "sent_idx", (F.row_number().over(w) - 1).cast("int")
    ).select(
        "conv_id",
        "turn_idx",
        "sent_idx",
        "sent_in_turn",
        "sent_text",
        "begin",
        "end",
        "n_tokens",
    )


def token_offsets(sentences: DataFrame) -> DataFrame:
    """W2/W3: running char offset and global token index per sentence —
    cumulative window sums over the stable sentence ordering
    (``generate_sdp.py:82-104`` sentences_offset accumulation)."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("sent_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sentences.select(
        "conv_id",
        "sent_idx",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("int").alias("tok_offset"),
        F.coalesce(F.sum(F.length("sent_text") + 1).over(w), F.lit(0))
        .cast("int")
        .alias("char_offset"),
    )


DUCK_TOKEN_OFFSETS = """
    SELECT conv_id, sent_idx, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER w, 0) AS INT) AS tok_offset,
           CAST(COALESCE(SUM(length(sent_text) + 1) OVER w, 0) AS INT) AS char_offset
    FROM sentences
    WINDOW w AS (PARTITION BY conv_id ORDER BY sent_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""


def duck_sentences_cte(sent_words: int = SENT_WORDS) -> str:
    """DuckDB CTE body producing the identical sentences table
    (compose as ``WITH transcripts AS (...), sentences AS ({this})``)."""
    sw = sent_words
    return f"""
        SELECT conv_id, turn_idx, sent_in_turn, sent_text, begin,
               CAST(begin + length(sent_text) AS INT) AS "end",
               CAST(len(string_split(sent_text, ' ')) AS INT) AS n_tokens,
               CAST(ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx, begin) - 1 AS INT) AS sent_idx
        FROM (
            SELECT conv_id, turn_idx,
                   CAST(i AS INT) AS sent_in_turn,
                   array_to_string(ws[i*{sw}+1 : i*{sw}+{sw}], ' ') AS sent_text,
                   CAST(length(COALESCE(array_to_string(ws[1 : i*{sw}], ' '), ''))
                        + CASE WHEN i > 0 THEN 1 ELSE 0 END AS INT) AS begin
            FROM (
                SELECT conv_id, turn_idx, ws,
                       UNNEST(range(GREATEST(CAST(CEIL(len(ws)/{sw}.0) AS BIGINT), 1))) AS i
                FROM (SELECT conv_id, turn_idx, string_split(text, ' ') AS ws FROM transcripts)
            )
        )
    """


def duck_with_prefix() -> str:
    """``WITH transcripts AS (...), sentences AS (...)`` prefix shared by
    downstream oracle queries."""
    return (
        f"WITH transcripts AS ({duck_transcripts_cte()}), "
        f"sentences AS ({duck_sentences_cte()})"
    )
