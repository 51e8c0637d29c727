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

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SENT_WORDS
from ..sources.transcripts import duck_transcripts_cte
from ..session import read_parquet_cached


def segment(transcripts: DataFrame, sent_words: int = SENT_WORDS) -> DataFrame:
    """transcripts → sentences ``(conv_id, turn_idx, sent_idx, sent_in_turn,
    sent_text, begin, end, n_tokens)``.

    Built with ``selectExpr`` strings — one parser round trip per
    stage instead of dozens of py4j Column calls (the cold-build
    driver cost matters: this subtree underlies every pipeline query).
    Construction is memoized on the input DataFrame's identity (r6):
    ``transcripts()`` hands every caller the same object, so the
    sentence plan builds once per session.
    """
    from ..session import input_plan_memo

    return input_plan_memo(
        ("segment", sent_words),
        (transcripts,),
        lambda: _segment_build(transcripts, sent_words),
    )


def _segment_build(transcripts: DataFrame, sent_words: int) -> DataFrame:
    k = sent_words
    return (
        transcripts.selectExpr(
            "conv_id", "turn_idx", "split(text, ' ') AS ws"
        )
        .selectExpr(
            "conv_id",
            "turn_idx",
            # begin = chars of all prior words + one separator space if
            # i > 0; n_tok = slice width (== size(split(sent_text)) —
            # the r5 form re-split the joined text per sentence, r6
            # derives the count from the slice bounds instead)
            f"explode(transform(sequence(0, CAST(greatest(ceil(size(ws) / {k}), 1) "
            "AS INT) - 1, 1), i -> struct("
            "CAST(i AS INT) AS sent_in_turn, "
            f"array_join(slice(ws, i * {k} + 1, {k}), ' ') AS sent_text, "
            f"CAST(length(array_join(slice(ws, 1, i * {k}), ' ')) "
            "+ IF(i > 0, 1, 0) AS INT) AS begin, "
            f"CAST(least({k}, size(ws) - i * {k}) AS INT) AS n_tok))) AS s",
        )
        .selectExpr(
            "conv_id",
            "turn_idx",
            "CAST(row_number() OVER (PARTITION BY conv_id "
            "ORDER BY turn_idx, s.begin) - 1 AS INT) AS sent_idx",
            "s.sent_in_turn AS sent_in_turn",
            "s.sent_text AS sent_text",
            "s.begin AS begin",
            "CAST(s.begin + length(s.sent_text) AS INT) AS end",
            "s.n_tok AS n_tokens",
        )
    )


# ----------------------------- punkt-like path for punctuated text (T1)

# deterministic stand-in for punkt's learned abbreviation set
ABBREVIATIONS = frozenset(
    """dr mr mrs ms prof sr jr st vs etc fig al inc ltd co corp dept est
    approx no vol pp ed eds repr trans ca cf id op loc seq ibid
    jan feb mar apr jun jul aug sep sept oct nov dec
    mon tue wed thu fri sat sun e.g i.e""".split()
)

def punkt_sentences(text: str) -> list[str]:
    """Deterministic punkt-like sentence splitting: a boundary is a
    ``[.!?]+`` run followed by whitespace and an upper-case letter or
    digit, unless the preceding word is a known abbreviation, a single
    initial (``J.``), or the period sits inside a number (``3.14`` has
    no following space). A fixed abbreviation list replaces punkt's
    learned parameters so results are reproducible."""
    import re

    n = len(text)
    bounds: list[int] = []
    for m in re.finditer(r"[.!?]+", text):
        e = m.end()
        j = e
        while j < n and text[j] == " ":
            j += 1
        if j == e:  # no following space: mid-number / mid-token period
            continue
        if j < n and not (text[j].isupper() or text[j].isdigit()):
            continue
        word = text[: m.start()].rsplit(" ", 1)[-1]
        w = word.lower().lstrip("(\"'").rstrip(".")
        if w in ABBREVIATIONS or (len(word) == 1 and word.isupper()):
            continue
        bounds.append(e)
    pieces: list[str] = []
    prev = 0
    for b in bounds + [n]:
        s = text[prev:b].strip()
        if s:
            pieces.append(s)
        prev = b
    return pieces


def punkt_spans(text: str) -> list[tuple[str, int, int]]:
    """Reference T1 offset re-derivation over punkt-like sentences
    (``generate_bb_training_data_2016.py:613-630``): spans tile the
    text — each span starts at the previous span's end, and leading
    separator spaces are absorbed into the span's HEAD (``end`` is
    extended past them, the stored text is ``text[start:end]`` spaces
    included), exactly like the reference's ``space_counter`` loop."""
    out: list[tuple[str, int, int]] = []
    start = 0
    for sent in punkt_sentences(text):
        end = start + len(sent)
        if 0 < start < len(text):
            c = 0
            while start + c < len(text) and text[start + c] == " ":
                end += 1
                c += 1
        out.append((text[start:end], start, end))
        start = end
    return out


def segment_punkt(transcripts: DataFrame) -> DataFrame:
    """Punctuated-text twin of :func:`segment` — same output schema,
    sentence boundaries from :func:`punkt_spans` instead of the fixed
    word window. The split is an Arrow-batched pandas UDF (the one
    sanctioned Python step; everything downstream is Column algebra).
    ``n_tokens`` counts whitespace-delimited words of the span."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    span_t = ArrayType(
        StructType(
            [
                StructField("sent_text", StringType()),
                StructField("begin", IntegerType()),
                StructField("end", IntegerType()),
            ]
        )
    )

    @F.pandas_udf(span_t)
    def spans_udf(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: [
                {"sent_text": s, "begin": b, "end": e}
                for s, b, e in punkt_spans(t or "")
            ]
        )

    exploded = (
        transcripts.select(
            "conv_id",
            "turn_idx",
            F.posexplode(spans_udf(F.col("text"))).alias("sent_in_turn", "s"),
        )
        .select(
            "conv_id",
            "turn_idx",
            F.col("sent_in_turn").cast("int").alias("sent_in_turn"),
            F.col("s.sent_text").alias("sent_text"),
            F.col("s.begin").alias("begin"),
            F.col("s.end").alias("end"),
            F.size(F.split(F.trim(F.col("s.sent_text")), " +")).alias("n_tokens"),
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


# -------------------------- T2: treebank-style word tokenizer (pinned)

def treebank_tokenize(text: str) -> list[str]:
    """Deterministic Penn-Treebank-style word tokenizer — the
    ``nltk.word_tokenize`` side of the reference's T2 *two-tokenizer*
    distinction (``generate_sdp.py:71`` tokenizes with word_tokenize
    while ``generate_pos.py:16-17`` whitespace-splits the same text, so
    SDP token indices and POS token indices disagree on punctuated
    input — pinned here so that divergence is testable). Production
    keeps ONE tokenizer (whitespace) end-to-end: candidate coordinates
    (sent, tok) must index the same token list in every operator, and
    the synthetic corpus is punctuation-free so the two coincide there.

    Rules (the classic treebank sed script, abridged): standalone
    punctuation split, sentence-final period split, ``...`` split,
    brackets/quotes split (``"`` → \\`\\` / ''), contractions
    (``n't 'll 're 've 's 'm 'd``) split.
    """
    import re

    s = " " + text + " "
    s = re.sub(r'(^|[ (\[{<])"', r"\1 `` ", s)
    s = re.sub(r"\.\.\.", " ... ", s)
    s = re.sub(r"([,;@#$%&])", r" \1 ", s)
    # final period (possibly followed by closing brackets/quotes)
    s = re.sub(r"([^\.])(\.)([\]\)}>\"']*)\s*$", r"\1 \2\3 ", s)
    s = re.sub(r"([?!])", r" \1 ", s)
    s = re.sub(r"([\]\[\(\)\{\}<>])", r" \1 ", s)
    s = re.sub(r"--", " -- ", s)
    s = re.sub(r'"', " '' ", s)
    s = re.sub(r"([^' ])('s|'S|'m|'M|'d|'D|') ", r"\1 \2 ", s)
    s = re.sub(r"([^' ])('ll|'LL|'re|'RE|'ve|'VE|n't|N'T) ", r"\1 \2 ", s)
    return s.split()


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


# ------------- punctuated fixture + oracle for the punkt driver surface

# Deterministic punctuation injection over the (lowercase alnum,
# single-spaced) documents corpus. Index rules, by precedence:
#   i%17==3 → 'Dr.'   (abbreviation; next word force-capitalized, so
#                      the would-be boundary is suppressed by the rule)
#   i%23==7 → 'J.'    (single initial, same suppression shape)
#   i%29==11 → '3.14' (mid-number period: no following space)
#   else: capitalize iff i%5==0 or the previous word was substituted;
#         append '!?' iff i%5==4 and i%3==0, '.' iff i%5==4,
#         '.' iff i%19==5 (usually followed by lowercase → tests the
#         lowercase-continuation skip; occasionally capital → genuine
#         boundary)

_PUNKT_FIX = dict(abbr=17, init=23, num=29, dot=5, bang=3, low=19)


def punctuated_transcripts(spark, sf_dir: str) -> DataFrame:
    """(conv_id, turn_idx, text) fixture: documents with deterministic
    punctuation injected (mirrored exactly by duck_punctuated_cte), so
    the production punkt path runs over text that actually exercises
    every boundary rule."""
    m = _PUNKT_FIX
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    ws = F.split(F.col("text"), " ")

    def word(w, i):
        prev_sub = (i >= 1) & (
            ((i - 1) % m["abbr"] == 3)
            | ((i - 1) % m["init"] == 7)
            | ((i - 1) % m["num"] == 11)
        )
        base = F.when(
            (i % m["dot"] == 0) | prev_sub,
            F.concat(F.upper(F.substring(w, 1, 1)), w.substr(F.lit(2), F.length(w))),
        ).otherwise(w)
        decorated = (
            F.when(
                i % m["dot"] == 4,
                F.concat(base, F.when(i % m["bang"] == 0, F.lit("!?")).otherwise(F.lit("."))),
            )
            .when(i % m["low"] == 5, F.concat(base, F.lit(".")))
            .otherwise(base)
        )
        return (
            F.when(i % m["abbr"] == 3, F.lit("Dr."))
            .when(i % m["init"] == 7, F.lit("J."))
            .when(i % m["num"] == 11, F.lit("3.14"))
            .otherwise(decorated)
        )

    return docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.array_join(F.transform(ws, word), " ").alias("text"),
    )


def duck_punctuated_cte() -> str:
    """DuckDB twin of :func:`punctuated_transcripts` (reads
    ``documents``)."""
    m = _PUNKT_FIX
    w = "ws[CAST(i AS INT) + 1]"
    prev_sub = (
        f"(i >= 1 AND ((i - 1) % {m['abbr']} = 3 OR (i - 1) % {m['init']} = 7"
        f" OR (i - 1) % {m['num']} = 11))"
    )
    base = (
        f"CASE WHEN i % {m['dot']} = 0 OR {prev_sub}"
        f" THEN upper(substr({w}, 1, 1)) || substr({w}, 2) ELSE {w} END"
    )
    decorated = (
        f"CASE WHEN i % {m['dot']} = 4 THEN {base} ||"
        f" (CASE WHEN i % {m['bang']} = 0 THEN '!?' ELSE '.' END)"
        f" WHEN i % {m['low']} = 5 THEN {base} || '.'"
        f" ELSE {base} END"
    )
    return f"""
        SELECT CAST(doc_id AS VARCHAR) AS conv_id, CAST(0 AS INT) AS turn_idx,
               array_to_string(list_transform(range(len(ws)),
                   i -> CASE WHEN i % {m['abbr']} = 3 THEN 'Dr.'
                             WHEN i % {m['init']} = 7 THEN 'J.'
                             WHEN i % {m['num']} = 11 THEN '3.14'
                             ELSE {decorated} END), ' ') AS text
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    """


def duck_sentences_punkt() -> str:
    """Oracle for ``segment_punkt`` over the punctuated fixture — an
    *independent token-level formulation* of the boundary rule
    (``punkt_sentences``): for single-space-separated text, a boundary
    falls between token j and j+1 iff token j ends with a ``[.!?]``
    run, token j+1 starts upper/digit, and the pre-run word is neither
    a known abbreviation (after punkt's lstrip/rstrip cleanup) nor a
    single uppercase initial. Spans then tile the text with the
    leading separator space absorbed into each non-first span
    (``punkt_spans``' space_counter loop)."""
    abbr = ", ".join(f"'{a}'" for a in sorted(ABBREVIATIONS))
    return f"""
        WITH pdoc AS ({duck_punctuated_cte()}),
        ptoks AS (
            SELECT conv_id, CAST(i AS INT) AS j, ws[CAST(i AS INT) + 1] AS tok
            FROM (SELECT conv_id, string_split(text, ' ') AS ws,
                         UNNEST(range(len(string_split(text, ' ')))) AS i
                  FROM pdoc)
        ),
        pmark AS (
            SELECT conv_id, j, tok,
                   regexp_replace(tok, '[.!?]+$', '') AS wrd,
                   CAST(COALESCE(SUM(length(tok) + 1) OVER
                       (PARTITION BY conv_id ORDER BY j
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS INT) AS cstart,
                   LEAD(tok) OVER (PARTITION BY conv_id ORDER BY j) AS nxt
            FROM ptoks
        ),
        pbound AS (
            SELECT conv_id, j, cstart, cstart + length(tok) AS cend,
                   CASE WHEN nxt IS NULL THEN FALSE
                        WHEN NOT regexp_matches(tok, '[.!?]$') THEN FALSE
                        WHEN NOT regexp_matches(nxt, '^[A-Z0-9]') THEN FALSE
                        WHEN length(wrd) = 1 AND wrd BETWEEN 'A' AND 'Z'
                             AND wrd = upper(wrd) THEN FALSE
                        WHEN list_contains([{abbr}],
                             rtrim(ltrim(lower(wrd), '("' || chr(39)), '.'))
                             THEN FALSE
                        ELSE TRUE END AS boundary_after
            FROM pmark
        ),
        pgrp AS (
            SELECT conv_id, j, cstart, cend,
                   CAST(COALESCE(SUM(CASE WHEN boundary_after THEN 1 ELSE 0 END)
                       OVER (PARTITION BY conv_id ORDER BY j
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS INT) AS sid
            FROM pbound
        ),
        pspan AS (
            SELECT conv_id, sid, MIN(cstart) AS s0, CAST(MAX(cend) AS INT) AS e0,
                   CAST(COUNT(*) AS INT) AS n_tokens
            FROM pgrp GROUP BY conv_id, sid
        )
        SELECT p.conv_id, CAST(0 AS INT) AS turn_idx,
               p.sid AS sent_idx, p.sid AS sent_in_turn,
               substring(d.text, CASE WHEN p.sid > 0 THEN p.s0 ELSE 1 END,
                         p.e0 - (CASE WHEN p.sid > 0 THEN p.s0 - 1 ELSE 0 END))
                   AS sent_text,
               CAST(CASE WHEN p.sid > 0 THEN p.s0 - 1 ELSE 0 END AS INT) AS begin,
               p.e0 AS "end",
               p.n_tokens
        FROM pspan p JOIN pdoc d ON d.conv_id = p.conv_id
    """


# ------------- segmenter-divergence census (backend drift audit, T1/T2)


def segmenter_divergence(spark, sf_dir: str) -> DataFrame:
    """(sent_diff, n_docs) — per-document sentence-count disagreement
    between the two segmentation backends over the SAME punctuated
    fixture: ``sent_diff = n_window − n_punkt`` (word-window
    :func:`segment` minus punctuation-driven :func:`segment_punkt`),
    histogrammed over documents. The drift monitor VERDICT r3's seam
    concern asks for in census form: a production swap of the
    segmentation backend (punkt → spaCy → …) moves this distribution,
    and a shifted histogram is the cheap tripwire that fires BEFORE
    downstream candidate counts silently change. Both backends already
    have independently oracle-checked row-level outputs (``sentences``,
    ``sentences_punkt``); this audits their relationship.

    Plan: the fixture subtree is built once per branch (narrow
    projection over documents); each branch aggregates to conv grain
    before the single conv-keyed full-outer join, so the join is
    dimension-over-dimension; then one count onto the diff grid.
    The punkt branch carries the engine's one sanctioned Arrow UDF."""
    pdoc = punctuated_transcripts(spark, sf_dir)
    n_win = segment(pdoc).groupBy("conv_id").agg(
        F.count("*").alias("n_window")
    )
    n_pk = segment_punkt(pdoc).groupBy("conv_id").agg(
        F.count("*").alias("n_punkt")
    )
    per_doc = n_win.join(n_pk, "conv_id", "full").select(
        (
            F.coalesce(F.col("n_window"), F.lit(0))
            - F.coalesce(F.col("n_punkt"), F.lit(0))
        ).alias("sent_diff")
    )
    return per_doc.groupBy("sent_diff").agg(F.count("*").alias("n_docs"))


def duck_segmenter_divergence() -> str:
    """Oracle: both segmenter oracles (word-window CTE and the
    independent token-level punkt formulation) over the punctuated
    fixture, joined at document grain."""
    win_q = (
        f"WITH transcripts AS ({duck_punctuated_cte()}), "
        f"sentences AS ({duck_sentences_cte()}) "
        "SELECT conv_id FROM sentences"
    )
    return f"""
        WITH win AS (
            SELECT conv_id, COUNT(*) AS n_window FROM ({win_q})
            GROUP BY conv_id
        ),
        pk AS (
            SELECT conv_id, COUNT(*) AS n_punkt
            FROM ({duck_sentences_punkt()}) GROUP BY conv_id
        ),
        per_doc AS (
            SELECT COALESCE(w.n_window, 0) - COALESCE(p.n_punkt, 0)
                       AS sent_diff
            FROM win w FULL JOIN pk p ON w.conv_id = p.conv_id
        )
        SELECT sent_diff, COUNT(*) AS n_docs FROM per_doc GROUP BY 1
    """


# --------------- turn-reassembly invariant census (north-rule audit)


def turn_reassembly(spark, sf_dir: str) -> DataFrame:
    """(n_turns, n_match, n_mismatch) — the per-turn text-equality
    invariant as a first-class, monitorable census: every transcript
    turn's text, re-assembled from the sentences table (spans joined
    in ``sent_in_turn`` order with single spaces), must equal the
    original turn text under stable turn ordering. ``n_mismatch``
    MUST be 0 — this is the invariant the whole pipeline's
    offset/indexing arithmetic rests on; running it as a query (not
    only a pytest) means a production corpus with pathological text
    (double spaces, zero-width chars after a backend swap) trips a
    dashboard number instead of a silent candidate-window shift.

    Plan: the segmentation subtree aggregates back to turn grain
    (sort_array over the per-turn span structs — bounded by spans per
    turn, not corpus), one turn-keyed LEFT join against the
    transcript (a missing reassembly counts as mismatch), one global
    conditional-sum aggregate. Join is corpus-grain but key-distinct
    on both sides — no fanout."""
    from ..sources.transcripts import transcripts

    t = transcripts(spark, sf_dir).select("conv_id", "turn_idx", "text")
    rebuilt = (
        segment(t)
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sent_in_turn", "sent_text"))
                    ),
                    lambda x: x["sent_text"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    joined = t.join(rebuilt, ["conv_id", "turn_idx"], "left")
    return joined.agg(
        F.count("*").alias("n_turns"),
        F.sum(
            (F.col("rebuilt") == F.col("text")).cast("long")
        ).alias("n_match"),
        F.sum(
            F.when(
                F.col("rebuilt").isNull()
                | (F.col("rebuilt") != F.col("text")),
                1,
            )
            .otherwise(0)
            .cast("long")
        ).alias("n_mismatch"),
    )


def duck_turn_reassembly() -> str:
    """Oracle: string_agg in sent_in_turn order, same LEFT-join census
    (compose after the shared transcripts+sentences prefix)."""
    return """
        , rebuilt AS (
            SELECT conv_id, turn_idx,
                   string_agg(sent_text, ' ' ORDER BY sent_in_turn)
                       AS rebuilt
            FROM sentences GROUP BY conv_id, turn_idx
        )
        SELECT COUNT(*) AS n_turns,
               CAST(SUM(CASE WHEN r.rebuilt = t.text THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_match,
               CAST(SUM(CASE WHEN r.rebuilt IS NULL OR r.rebuilt <> t.text
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch
        FROM transcripts t
        LEFT JOIN rebuilt r
          ON r.conv_id = t.conv_id AND r.turn_idx = t.turn_idx
    """
