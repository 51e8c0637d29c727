"""MUC6 key-template parser (SURVEY.md §2.1 S6/S7).

The reference parses MUC-6 management-succession answer keys — nested
``:=``-structured templates — with a stateful line walker
(``generate_muc6_data.py:7-31``) and expands ``PER_ALIAS`` lines into
extra surface forms (``:51-53``). Re-expressed here as a vectorized
pandas UDF over whole template documents: one input row per template
blob, one output row per (slot, value) binding, with alias expansion
as a downstream explode.

Template grammar (as in the reference data)::

    <TEMPLATE-9301060029-1> :=
       CONTENT: <SUCCESSION_EVENT-1>
    <SUCCESSION_EVENT-1> :=
       POST: "chief executive officer"
       IN_AND_OUT: <IN_AND_OUT-1>
    <IN_AND_OUT-1> :=
       IO_PERSON: <PERSON-1>
       NEW_STATUS: IN
    <PERSON-1> :=
       PER_NAME: "John Smith"
       PER_ALIAS: "Smith" "J. Smith"
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# object ids may be multi-part (<TEMPLATE-9301060029-1>); the object's
# ordinal is the last numeric segment
_OBJ_RE = re.compile(r"^<([A-Z_]+)-(?:\d+-)*(\d+)>\s*:=\s*$")
_SLOT_RE = re.compile(r"^\s+([A-Z_]+):\s*(.+?)\s*$")
_QUOTED_RE = re.compile(r'"([^"]*)"')

OUT_SCHEMA = (
    "doc_id string, obj_type string, obj_id int, slot string, "
    "value string, is_ref boolean"
)


def parse_template_text(doc_id: str, text: str) -> list[dict]:
    """Stateful line parse of one template blob → slot-binding rows.
    Quoted slot values yield one row per quoted string (PER_ALIAS
    expansion, ``generate_muc6_data.py:51-53``); ``<REF-n>`` values
    yield a single is_ref row."""
    rows: list[dict] = []
    cur_type, cur_id = None, None
    for line in text.splitlines():
        m = _OBJ_RE.match(line.strip()) if not line.startswith(" ") else None
        if m:
            cur_type, cur_id = m.group(1), int(m.group(2))
            continue
        s = _SLOT_RE.match(line)
        if s and cur_type is not None:
            slot, raw = s.group(1), s.group(2)
            quoted = _QUOTED_RE.findall(raw)
            if quoted:
                for q in quoted:
                    rows.append(
                        dict(doc_id=doc_id, obj_type=cur_type, obj_id=cur_id,
                             slot=slot, value=q, is_ref=False)
                    )
            else:
                rows.append(
                    dict(doc_id=doc_id, obj_type=cur_type, obj_id=cur_id,
                         slot=slot, value=raw, is_ref=raw.startswith("<"))
                )
    return rows


def parse_muc6_templates(templates: DataFrame) -> DataFrame:
    """``(doc_id, template_text)`` → parsed slot bindings via
    ``mapInPandas`` (the stateful parser runs per document inside the
    Arrow batch — no per-row Python at the Spark level)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for r in pdf.itertuples(index=False):
                out.extend(parse_template_text(str(r.doc_id), r.template_text))
            yield pd.DataFrame(
                out,
                columns=["doc_id", "obj_type", "obj_id", "slot", "value", "is_ref"],
            )

    return templates.mapInPandas(run, schema=OUT_SCHEMA)


def succession_triples(bindings: DataFrame) -> DataFrame:
    """The reference's MUC6 relation assembly in DataFrame form:
    (person, post, status) triples by joining slot bindings through
    the ``<IN_AND_OUT>``/``<PERSON>`` references."""
    ev = bindings.filter(
        (F.col("obj_type") == "SUCCESSION_EVENT") & (F.col("slot") == "POST")
    ).select("doc_id", F.col("obj_id").alias("ev_id"), F.col("value").alias("post"))
    io_ref = bindings.filter(
        (F.col("obj_type") == "SUCCESSION_EVENT") & (F.col("slot") == "IN_AND_OUT")
    ).select(
        "doc_id",
        F.col("obj_id").alias("ev_id"),
        F.regexp_extract("value", r"<IN_AND_OUT-(\d+)>", 1).try_cast("int").alias("io_id"),
    )
    person_ref = bindings.filter(
        (F.col("obj_type") == "IN_AND_OUT") & (F.col("slot") == "IO_PERSON")
    ).select(
        "doc_id",
        F.col("obj_id").alias("io_id"),
        F.regexp_extract("value", r"<PERSON-(\d+)>", 1).try_cast("int").alias("per_id"),
    )
    status = bindings.filter(
        (F.col("obj_type") == "IN_AND_OUT") & (F.col("slot") == "NEW_STATUS")
    ).select("doc_id", F.col("obj_id").alias("io_id"), F.col("value").alias("status"))
    name = bindings.filter(
        (F.col("obj_type") == "PERSON") & (F.col("slot") == "PER_NAME")
    ).select("doc_id", F.col("obj_id").alias("per_id"), F.col("value").alias("person"))
    return (
        ev.join(io_ref, ["doc_id", "ev_id"])
        .join(person_ref, ["doc_id", "io_id"])
        .join(status, ["doc_id", "io_id"])
        .join(name, ["doc_id", "per_id"])
        .select("doc_id", "person", "post", "status")
    )


# ----------------------------------------- S7: MUC6 SGML document parse

SGML_OUT_SCHEMA = "doc_id string, para_idx int, paragraph string"


def parse_sgml_text(text: str) -> list[tuple[str, int, str]]:
    """Faithful port of the reference's ``extract_sentences`` document
    walk (``generate_muc6_data.py:59-73``): wrap the corpus file in a
    synthetic ``<ROOT>``, XML-parse, and for each ``<DOC>`` take
    ``DOC[1]`` (the SECOND child — the reference indexes positionally,
    typically ``<DOCNO>``) as the doc id with ``.`` removed, then every
    paragraph under each ``<TXT>`` child, ``\\n`` → space, stripped.

    Returns (doc_id, para_idx, paragraph) rows; sentence splitting is a
    separate operator (:func:`muc6_doc_sentences`) so the paragraph
    table stays reusable.
    """
    import xml.etree.ElementTree as ET

    root = ET.fromstring("<ROOT>" + text + "</ROOT>")
    out: list[tuple[str, int, str]] = []
    for doc in root:
        doc_id = (doc[1].text or "").strip().replace(".", "")
        p_idx = 0
        for child in doc:
            if child.tag == "TXT":
                for p in child:
                    out.append(
                        (doc_id, p_idx, (p.text or "").strip().replace("\n", " "))
                    )
                    p_idx += 1
    return out


def sgml_docs(blobs: DataFrame, text_col: str = "sgml") -> DataFrame:
    """SGML corpus blobs → (doc_id, para_idx, paragraph) via an
    Arrow-batched kernel (XML parsing is the sanctioned Python step)."""
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for t in pdf[text_col] for r in parse_sgml_text(t or "")]
            yield pd.DataFrame(rows, columns=["doc_id", "para_idx", "paragraph"])

    return blobs.mapInPandas(run, schema=SGML_OUT_SCHEMA)


def muc6_doc_sentences(paragraphs: DataFrame) -> DataFrame:
    """Reference sentence extraction over parsed paragraphs
    (``generate_muc6_data.py:70-72``: ``sent_tokenize`` per paragraph,
    extended in paragraph order): (doc_id, sent_idx, sentence) with
    sent_idx numbered across the whole document, punkt-like boundaries
    from :func:`segmentation.punkt_sentences`."""
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType, StringType

    from ..operators.segmentation import punkt_sentences

    sents_udf = F.pandas_udf(
        lambda s: s.map(lambda t: punkt_sentences(t or "")),
        ArrayType(StringType()),
    )
    w = Window.partitionBy("doc_id").orderBy("para_idx", "pos")
    return (
        paragraphs.select(
            "doc_id",
            "para_idx",
            F.posexplode(sents_udf(F.col("paragraph"))).alias("pos", "sentence"),
        )
        .withColumn("sent_idx", (F.row_number().over(w) - 1).cast("int"))
        .select("doc_id", "sent_idx", "sentence")
    )
