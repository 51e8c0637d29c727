"""Aggregation & evaluation operators (SURVEY.md §2.4).

- A1/A3: per-relation intra/inter counters and class frequencies
- A6:    per-conversation relation numbering (``R<n>`` ids,
         ``bb2016_threshold.py:57``)
- A7:    macro-averaged F1 (``getMacroFScore_bb2016.py:27-81``) as a
         grouped-pivot arithmetic query — P/R/F1 per class from
         (pred, gold) pair counts, macro mean over the class list
- A9:    vocabulary build with deterministic index
         (``features_bb2016.py:2481-2506``; index order pinned to
         sorted words — documented deviation from first-occurrence
         order, SURVEY.md §7.0)

All native Column algebra; DuckDB oracles inline in
``__spark_entry__``-land via the emitters here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..session import track_cache


def intra_inter_counts(candidates: DataFrame) -> DataFrame:
    """A1: candidate counts by (k-bucket) intra (k=0) vs inter (k>0)."""
    return (
        candidates.withColumn("is_inter", (F.col("k") > 0).cast("int"))
        .groupBy("e1_id", "is_inter")
        .agg(F.count("*").alias("n"))
    )


DUCK_INTRA_INTER = """
    SELECT e1_id, CAST(k > 0 AS INT) AS is_inter, COUNT(*) AS n
    FROM candidates GROUP BY e1_id, CAST(k > 0 AS INT)
"""


def class_frequency(scored_or_cands: DataFrame, label_col: str = "k") -> DataFrame:
    """A3: label frequency (itemfreq analogue)."""
    return scored_or_cands.groupBy(label_col).agg(F.count("*").alias("freq"))


def relation_numbering(triples: DataFrame) -> DataFrame:
    """A6: R<n> ids by deterministic order per conversation."""
    w = Window.partitionBy("conv_id").orderBy("cand_id")
    return triples.withColumn(
        "rel_id", F.concat(F.lit("R"), F.row_number().over(w).cast("string"))
    )


def vocabulary(sentences: DataFrame, n_ranges: int = 32) -> DataFrame:
    """A9: distinct tokens with deterministic 0-based index — identical
    to ``ROW_NUMBER() OVER (ORDER BY word) - 1`` but WITHOUT the
    single-task global sort that serializes a 100M-word vocabulary:
    range-partition by word (partition p holds a sorted range), number
    within each range, and add per-range prefix offsets (a driver-side
    cumsum over ≤ ``n_ranges`` partition counts). Every stage stays
    parallel. The ranged DF is persisted so the count pass and the
    numbering pass see the same (sampled) range bounds."""
    toks = (
        sentences.select(F.explode(F.split("sent_text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    from ..plans.rangenum import prefix_offset_col, ranged_by

    ranged = ranged_by(toks, n_ranges, "word")
    off, total = prefix_offset_col(ranged)
    if total == 0:
        return toks.withColumn("word_idx", F.lit(0).cast("int"))
    w = Window.partitionBy("pid").orderBy("word")
    return ranged.withColumn(
        "word_idx",
        (F.row_number().over(w) - 1 + off).cast("int"),
    ).select("word", "word_idx")


DUCK_VOCAB = """
    SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY word) - 1 AS INT) AS word_idx
    FROM (SELECT DISTINCT UNNEST(string_split(sent_text, ' ')) AS word
          FROM sentences)
    WHERE word != ''
"""


def macro_f1(pairs: DataFrame, classes: list[int] | None = None) -> DataFrame:
    """A7: macro P/R/F1 from a (pred int, gold int) DataFrame.

    Per class c: P = TP/(TP+FP), R = TP/(TP+FN); zero-denominator → 0
    (reference behavior, getMacroFScore_bb2016.py:46-58). Returns one
    row: (macro_p, macro_r, macro_f1), rounded to 6.
    """
    classes = classes or [0, 1]
    aggs = []
    for c in classes:
        tp = F.sum(((F.col("pred") == c) & (F.col("gold") == c)).cast("int"))
        fp = F.sum(((F.col("pred") == c) & (F.col("gold") != c)).cast("int"))
        fn = F.sum(((F.col("pred") != c) & (F.col("gold") == c)).cast("int"))
        aggs += [tp.alias(f"tp{c}"), fp.alias(f"fp{c}"), fn.alias(f"fn{c}")]
    g = pairs.agg(*aggs)

    def safe_div(n, d):
        return F.when(d > 0, n / d).otherwise(F.lit(0.0))

    ps, rs, fs = [], [], []
    for c in classes:
        p = safe_div(F.col(f"tp{c}"), F.col(f"tp{c}") + F.col(f"fp{c}"))
        r = safe_div(F.col(f"tp{c}"), F.col(f"tp{c}") + F.col(f"fn{c}"))
        f1 = safe_div(2 * p * r, p + r)
        ps.append(p)
        rs.append(r)
        fs.append(f1)
    n = len(classes)
    return g.select(
        F.round(sum(ps) / n, 6).alias("macro_p"),
        F.round(sum(rs) / n, 6).alias("macro_r"),
        F.round(sum(fs) / n, 6).alias("macro_f1"),
    )


def duck_macro_f1(pairs_cte: str, classes: list[int] | None = None) -> str:
    classes = classes or [0, 1]
    aggs = []
    for c in classes:
        aggs.append(
            f"SUM(CASE WHEN pred = {c} AND gold = {c} THEN 1 ELSE 0 END) AS tp{c}"
        )
        aggs.append(
            f"SUM(CASE WHEN pred = {c} AND gold != {c} THEN 1 ELSE 0 END) AS fp{c}"
        )
        aggs.append(
            f"SUM(CASE WHEN pred != {c} AND gold = {c} THEN 1 ELSE 0 END) AS fn{c}"
        )
    terms_p, terms_r, terms_f = [], [], []
    for c in classes:
        p = f"(CASE WHEN tp{c} + fp{c} > 0 THEN tp{c} * 1.0 / (tp{c} + fp{c}) ELSE 0.0 END)"
        r = f"(CASE WHEN tp{c} + fn{c} > 0 THEN tp{c} * 1.0 / (tp{c} + fn{c}) ELSE 0.0 END)"
        f1 = f"(CASE WHEN {p} + {r} > 0 THEN 2 * {p} * {r} / ({p} + {r}) ELSE 0.0 END)"
        terms_p.append(p)
        terms_r.append(r)
        terms_f.append(f1)
    n = len(classes)
    return f"""
        , f1pairs AS ({pairs_cte})
        , f1agg AS (SELECT {", ".join(aggs)} FROM f1pairs)
        SELECT ROUND(({" + ".join(terms_p)}) / {n}, 6) AS macro_p,
               ROUND(({" + ".join(terms_r)}) / {n}, 6) AS macro_r,
               ROUND(({" + ".join(terms_f)}) / {n}, 6) AS macro_f1
        FROM f1agg
    """


# ------------------------------------------------- annotator agreement

KAPPA_E6 = 1_000_000


def annotator_agreement(pairs: DataFrame) -> DataFrame:
    """(n, agree, a1, b1, po_e6, pe_e6, kappa_e6) — Cohen's kappa
    between two binary labelings of the same items (label-noise /
    inter-annotator QA over a (pred, gold) pair table — the A7 metric
    family extended from accuracy to chance-corrected agreement).

    Exact BIGINT algebra (the macro_f1-via-integers discipline):
    po = agree/n, pe = (a1·b1 + a0·b0)/n², and
    kappa = (agree·n − pe_num) / (n² − pe_num) emitted in micro-units
    with truncation TOWARD ZERO on the signed value (Spark ``div``
    truncates; the oracle mirrors with an explicit sign split so
    DuckDB's flooring ``//`` can never disagree on negatives).
    One exchange (the single aggregate); one output row. n² stays
    well inside BIGINT for any per-task eval set (quadrillions)."""
    g = pairs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("pred") == F.col("gold")).cast("long")).alias("agree"),
        F.sum(F.col("pred").cast("long")).alias("a1"),
        F.sum(F.col("gold").cast("long")).alias("b1"),
    )
    pe_num = "(a1*b1 + (n-a1)*(n-b1))"
    den = f"(n*n - {pe_num})"
    return g.select(
        "n", "agree", "a1", "b1",
        F.expr(f"agree * {KAPPA_E6} div n").cast("long").alias("po_e6"),
        F.expr(f"{pe_num} * {KAPPA_E6} div (n*n)").cast("long").alias("pe_e6"),
        F.expr(
            f"CASE WHEN {den} = 0 THEN 0"
            f" WHEN agree*n >= {pe_num}"
            f" THEN (agree*n - {pe_num}) * {KAPPA_E6} div {den}"
            f" ELSE -(({pe_num} - agree*n) * {KAPPA_E6} div {den}) END"
        ).cast("long").alias("kappa_e6"),
    )


def duck_annotator_agreement(pred_gold_sql: str) -> str:
    """Oracle: same integer algebra over a (pred, gold) SELECT."""
    pe_num = "(a1*b1 + (n-a1)*(n-b1))"
    den = f"(n*n - {pe_num})"
    return f"""
        , pairs AS ({pred_gold_sql}),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN pred = gold THEN 1 ELSE 0 END)
                        AS BIGINT) AS agree,
                   CAST(SUM(pred) AS BIGINT) AS a1,
                   CAST(SUM(gold) AS BIGINT) AS b1
            FROM pairs
        )
        SELECT n, agree, a1, b1,
               CAST(agree * {KAPPA_E6} // n AS BIGINT) AS po_e6,
               CAST({pe_num} * {KAPPA_E6} // (n*n) AS BIGINT) AS pe_e6,
               CAST(CASE WHEN {den} = 0 THEN 0
                         WHEN agree*n >= {pe_num}
                         THEN (agree*n - {pe_num}) * {KAPPA_E6} // {den}
                         ELSE -(({pe_num} - agree*n) * {KAPPA_E6} // {den})
                    END AS BIGINT) AS kappa_e6
        FROM g
    """
