"""Standoff-annotation and ``::``-record formats (SURVEY.md §2.1
S3/S10/S12).

The reference's interchange formats, re-expressed as native Column
algebra over line-oriented text:

- **standoff** (BioNLP ``.a1``/``.a2``): entity lines
  ``T<n>\\t<TAG> <start> <end>\\t<mention>`` and relation lines
  ``R<n>\\t<REL> Arg1:T<i> Arg2:T<j>`` — parser dispatches on the id
  prefix exactly like ``generate_bb_training_data_2016.py:44-227``,
  including the F1 Title/Paragraph drop (``:554-560``).
- **``::``-records** (candidate interchange,
  ``generate_bb_training_data_2016.py:771``): positional text records
  ``conv :: k :: label :: e1 :: e2 :: tagged_text``.

Both directions (format + parse) are implemented so round-trip
identity is testable and the DuckDB oracle can check the parse
bit-for-bit. In production these are *fixture/golden-file* codecs —
the engine's real storage is columnar (SURVEY.md §2.1 S10 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ------------------------------------------------------------- S3 standoff

def format_standoff(mentions: DataFrame) -> DataFrame:
    """mentions → ``(conv_id, line)`` entity standoff lines; ids are
    T<tok-ordinal> per conversation (deterministic)."""
    return mentions.select(
        "conv_id",
        F.concat(
            F.lit("T"),
            (F.col("sent_idx") * 1000 + F.col("tok_idx")).cast("string"),
            F.lit("\t"),
            F.col("ner_tag"),
            F.lit(" "),
            F.col("m_begin").cast("string"),
            F.lit(" "),
            F.col("m_end").cast("string"),
            F.lit("\t"),
            F.col("surface"),
        ).alias("line"),
    )


def parse_standoff(lines: DataFrame) -> DataFrame:
    """``(conv_id, line)`` standoff lines → parsed annotation rows.

    Line dispatch on the id prefix (T=entity, R=relation); Title and
    Paragraph entities are dropped (F1). Pure ``split``/``element_at``
    Column expressions — the S3 mapping from SURVEY.md §2.1.
    """
    tab = F.split(F.col("line"), "\t")
    ann_id = F.try_element_at(tab, F.lit(1))
    body = F.split(F.try_element_at(tab, F.lit(2)), " ")
    is_ent = ann_id.startswith("T")
    is_rel = ann_id.startswith("R")
    # try_element_at / try_cast throughout: the reference's parse loop
    # skips lines it cannot parse (try/except + counters); under
    # Spark 4 ANSI mode a plain element_at/cast would instead kill the
    # job on the first malformed line of a 100 TB scan.
    parsed = lines.select(
        "conv_id",
        ann_id.alias("ann_id"),
        F.when(is_ent, F.lit("entity"))
        .when(is_rel, F.lit("relation"))
        .otherwise(F.lit("other"))
        .alias("kind"),
        F.try_element_at(body, F.lit(1)).alias("tag"),
        F.when(is_ent, F.try_element_at(body, F.lit(2)).try_cast("int")).alias("start"),
        F.when(is_ent, F.try_element_at(body, F.lit(3)).try_cast("int")).alias("end"),
        F.when(is_ent, F.try_element_at(tab, F.lit(3))).alias("mention"),
        F.when(
            is_rel,
            F.regexp_extract(F.try_element_at(body, F.lit(2)), r"Arg1:(\S+)", 1),
        ).alias("arg1"),
        F.when(
            is_rel,
            F.regexp_extract(F.try_element_at(body, F.lit(3)), r"Arg2:(\S+)", 1),
        ).alias("arg2"),
    )
    # malformed-line skip (reference try/except semantics): an entity
    # needs offsets + mention, a relation needs both args
    well_formed = (
        ((F.col("kind") == "entity")
         & F.col("start").isNotNull() & F.col("end").isNotNull()
         & F.col("mention").isNotNull())
        | ((F.col("kind") == "relation")
           & (F.col("arg1") != "") & (F.col("arg2") != ""))
        | ((F.col("kind") == "other")
           & (F.col("ann_id") != "") & F.col("tag").isNotNull())
    )
    # F1: Title/Paragraph entity drop (generate_bb_training_data_2016.py:554-560)
    return parsed.filter(well_formed).filter(
        ~(F.col("kind") == "entity")
        | ~F.lower(F.col("tag")).isin("title", "paragraph")
    )


def duck_parse_standoff(lines_cte: str) -> str:
    """DuckDB oracle for :func:`parse_standoff` over a CTE named
    ``standoff_lines(conv_id, line)``."""
    return f"""
        , standoff_lines AS ({lines_cte})
        SELECT conv_id, ann_id, kind, tag, start, "end", mention, arg1, arg2
        FROM (
            SELECT conv_id,
                   tab[1] AS ann_id,
                   CASE WHEN tab[1] LIKE 'T%' THEN 'entity'
                        WHEN tab[1] LIKE 'R%' THEN 'relation'
                        ELSE 'other' END AS kind,
                   body[1] AS tag,
                   CASE WHEN tab[1] LIKE 'T%' THEN CAST(body[2] AS INT) END AS start,
                   CASE WHEN tab[1] LIKE 'T%' THEN CAST(body[3] AS INT) END AS "end",
                   CASE WHEN tab[1] LIKE 'T%' THEN tab[3] END AS mention,
                   CASE WHEN tab[1] LIKE 'R%' THEN regexp_extract(body[2], 'Arg1:(\\S+)', 1) END AS arg1,
                   CASE WHEN tab[1] LIKE 'R%' THEN regexp_extract(body[3], 'Arg2:(\\S+)', 1) END AS arg2
            FROM (
                SELECT conv_id, string_split(line, chr(9)) AS tab,
                       string_split(string_split(line, chr(9))[2], ' ') AS body
                FROM standoff_lines
            )
        )
        WHERE NOT (kind = 'entity') OR lower(tag) NOT IN ('title', 'paragraph')
    """


def duck_standoff_lines_cte() -> str:
    """DuckDB CTE body producing the identical formatted lines from the
    mentions CTE."""
    return """
        SELECT conv_id,
               'T' || CAST(sent_idx * 1000 + tok_idx AS VARCHAR) || chr(9) ||
               ner_tag || ' ' || CAST(m_begin AS VARCHAR) || ' ' ||
               CAST(m_end AS VARCHAR) || chr(9) || surface AS line
        FROM mentions
    """


# ----------------------------------------------------------- S10 ::-records

REC_SEP = " :: "


def format_cc_records(tagged: DataFrame, label_expr=None) -> DataFrame:
    """tagged candidates → ``(conv_id, cand_id, rec)`` positional
    ``::``-records (``generate_bb_training_data_2016.py:771`` layout,
    6-field variant ``:513``)."""
    label = label_expr if label_expr is not None else F.lit("Rel")
    return tagged.select(
        "conv_id",
        "cand_id",
        F.concat_ws(
            REC_SEP,
            F.col("conv_id"),
            F.col("k").cast("string"),
            label,
            F.col("e1_surface"),
            F.col("e2_surface"),
            F.col("tagged_text"),
        ).alias("rec"),
    )


def parse_cc_records(
    records: DataFrame,
    remove_other_class: bool = False,
    other_label: str = "OTHER",
) -> DataFrame:
    """``rec`` strings → positional fields (the reference parses by
    index, e.g. ``features_bb2016.py:1371,1389`` — field 5 = tagged
    text, field 2 = label).

    ``remove_other_class`` gates the reference F6 drop
    (``features_bb2016.py:1322-1336``: records whose class field equals
    the OTHER class — id 18 there, a label string here — are skipped at
    parse time). Default off, matching the reference's default config.
    """
    f = F.split(F.col("rec"), " :: ")
    # try_* variants + well-formed filter: skip unparseable records
    # like the reference's positional parse (ANSI-safe at scale)
    out = records.select(
        F.try_element_at(f, F.lit(1)).alias("conv_id"),
        F.try_element_at(f, F.lit(2)).try_cast("int").alias("k"),
        F.try_element_at(f, F.lit(3)).alias("label"),
        F.try_element_at(f, F.lit(4)).alias("e1"),
        F.try_element_at(f, F.lit(5)).alias("e2"),
        F.try_element_at(f, F.lit(6)).alias("tagged_text"),
    ).filter(F.col("k").isNotNull() & F.col("tagged_text").isNotNull())
    if remove_other_class:
        out = out.filter(F.col("label") != other_label)
    return out


# --------------------------------------------- official-eval .a2 assembly

def a2_annotation_lines(
    scored: DataFrame,
    threshold: float | None = None,
    relation: str = "Lives_In",
    role1: str = "Bacteria",
    role2: str = "Location",
) -> DataFrame:
    """Official-eval ``.a2`` assembly
    (``bionlp_rnn_results_annotations.py:55-91``,
    ``bb2016_threshold.py:60-81``): accepted predictions grouped per
    document, numbered ``R1..Rn`` in stable candidate order (the
    reference's encounter order over the pickled candidate list), each
    formatted ``R{n}\\tLives_In Bacteria:{e1} Location:{e2}``. The
    hard-coded role names are pinned reference behavior (it parses the
    entity *types* from the record but writes fixed roles); entity refs
    are the mention ids (the 10-field ``::``-record's fields 8/9).

    Numbering orders by the candidate *encounter order* — the
    (k, sent1, tok1, sent2, tok2, e1, e2) key that defines
    ``cand_seq`` — not the ``cand_id`` string, whose lexicographic
    order diverges from encounter order ('conv#10' < 'conv#2', and
    the fast-path id carries no sequence at all).

    Output: ``(conv_id, rel_num, line)``.
    """
    from ..config import SCORE_THRESHOLD
    from ..operators.candidates import CAND_ORDER

    thr = SCORE_THRESHOLD if threshold is None else threshold
    cols = set(scored.columns)
    if cols.issuperset(CAND_ORDER):
        order = [*CAND_ORDER, "e1_id", "e2_id"]
    elif "cand_seq" in cols:  # slow-path id: numeric sequence exists
        order = ["cand_seq"]
    else:  # minimal projections (tests / external scored tables)
        order = ["cand_id"]
    w = Window.partitionBy("conv_id").orderBy(*order)
    return (
        scored.filter(F.col("p_rel") >= thr)
        .withColumn("rel_num", F.row_number().over(w).cast("int"))
        .select(
            "conv_id",
            "rel_num",
            F.concat(
                F.lit("R"),
                F.col("rel_num").cast("string"),
                F.lit("\t"),
                F.lit(f"{relation} {role1}:"),
                F.col("e1_id"),
                F.lit(f" {role2}:"),
                F.col("e2_id"),
            ).alias("line"),
        )
    )


def write_a2_zip(lines: DataFrame, out_dir: str) -> str:
    """Evaluation-service sink: one ``{conv_id}.a2`` file per document
    plus ``annotations.zip`` (the reference's per-doc write loop +
    ``shutil.make_archive``). The per-doc concatenation runs
    distributed (one groupBy); only the eval-sized final text reaches
    the driver for file materialization. Returns the zip path."""
    import os
    import zipfile

    grouped = lines.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rel_num", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("content")
    )
    os.makedirs(out_dir, exist_ok=True)
    zpath = os.path.join(out_dir, "annotations.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for r in grouped.collect():
            fname = f"{r['conv_id']}.a2"
            body = r["content"] + "\n"
            with open(os.path.join(out_dir, fname), "w") as f:
                f.write(body)
            zf.writestr(fname, body)
    return zpath


# ------------------------------------------------------------- S12 KG sink

def write_triples(kg: DataFrame, path: str, n_buckets: int = 16) -> DataFrame:
    """Partitioned KG materialization (S12: the ``.a2``-zip sink
    becomes a bucketed columnar table). Bucket key is the portable
    hash of ``subj`` so partition layout is deterministic and
    co-locates each entity's triples; in production this is
    ``writeTo(...).partitionedBy(bucket(N, subj))`` on Iceberg."""
    from ..hashing import spark_h15

    out = kg.withColumn("bucket", (spark_h15(F.col("subj")) % n_buckets).cast("int"))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)
    return kg.sparkSession.read.parquet(path)
