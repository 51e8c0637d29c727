"""Mention detection via broadcast alias dictionary (SURVEY.md §2.3 J7/J2).

Reference semantics being re-expressed:

- the standoff ``.a1`` entity parse + mention/sentence interval join
  (``generate_bb_training_data_2016.py:547-573,669-707``): entities land
  in sentences by char-offset containment with a lowercased
  string-match fallback;
- ``get_entity_index`` tokenwise matching (``generate_sdp.py:31-61``).

Here mentions are *detected* (inference mode) by exploding sentence
tokens and broadcast-joining the alias dictionary on the lowercased
surface form — the J2 interval join is then definitionally satisfied
(tokens are generated inside their sentence), and we still emit the
char offsets ``m_begin``/``m_end`` so the interval-join contract (W2
running offsets) stays observable and testable.

Scale: the alias dictionary is tiny → ``F.broadcast`` (no shuffle);
token explode is narrow. At 100 TB this stage is embarrassingly
parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import alias_rows, duck_alias_values


def alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        alias_rows(), schema="surface string, entity_id string, ner_tag string"
    )


def detect_mentions(spark: SparkSession, sentences: DataFrame) -> DataFrame:
    """sentences → mentions ``(conv_id, turn_idx, sent_idx, tok_idx,
    surface, entity_id, ner_tag, m_begin, m_end)``.

    ``m_begin``/``m_end`` are char offsets within the sentence text.
    """
    ws = F.split(F.col("sent_text"), " ")
    toks = (
        sentences.select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            ws.alias("ws"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.posexplode(F.col("ws")).alias("tok_idx", "word"),
            F.col("ws"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            F.col("tok_idx").cast("int").alias("tok_idx"),
            F.lower(F.col("word")).alias("surface"),
            (
                F.length(F.array_join(F.slice(F.col("ws"), 1, F.col("tok_idx")), " "))
                + F.when(F.col("tok_idx") > 0, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("m_begin"),
            F.length("word").alias("wlen"),
        )
    )
    al = alias_df(spark)
    return (
        toks.join(F.broadcast(al), "surface")
        .select(
            "conv_id",
            "turn_idx",
            "sent_idx",
            "tok_idx",
            "surface",
            "entity_id",
            "ner_tag",
            "m_begin",
            (F.col("m_begin") + F.col("wlen")).cast("int").alias("m_end"),
        )
    )


def duck_mentions_cte() -> str:
    """DuckDB CTE body (compose after the sentences CTE)."""
    return f"""
        SELECT t.conv_id, t.turn_idx, t.sent_idx, t.tok_idx,
               t.surface, alias_dict.entity_id, alias_dict.ner_tag, t.m_begin,
               CAST(t.m_begin + length(t.surface) AS INT) AS m_end
        FROM (
            SELECT conv_id, turn_idx, sent_idx,
                   CAST(i AS INT) AS tok_idx,
                   lower(ws[i + 1]) AS surface,
                   CAST(length(COALESCE(array_to_string(ws[1:i], ' '), ''))
                        + CASE WHEN i > 0 THEN 1 ELSE 0 END AS INT) AS m_begin
            FROM (
                SELECT conv_id, turn_idx, sent_idx, ws,
                       UNNEST(range(len(ws))) AS i
                FROM (SELECT conv_id, turn_idx, sent_idx,
                             string_split(sent_text, ' ') AS ws
                      FROM sentences)
            )
        ) t
        JOIN {duck_alias_values()} ON t.surface = alias_dict.surface
    """
