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
from ..session import read_parquet_cached

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


# ---------------- deterministic end-to-end fixture + driver surface

def _w(k: int):
    """k-th corpus word of the doc, modular (docs are ≥10 words but
    the index math stays total anyway)."""
    ws = F.split(F.col("text"), " ")
    return F.element_at(ws, (F.lit(k) % F.size(ws) + 1).cast("int"))


def _cap(c):
    return F.concat(F.upper(F.substring(c, 1, 1)), c.substr(F.lit(2), F.length(c)))


def muc6_sgml_blobs(spark, sf_dir: str) -> DataFrame:
    """One synthetic MUC6 corpus document per ``documents`` row:
    ``<DOC>`` with a headline child, a ``<DOCNO>`` whose text carries a
    period (exercising S7's positional child walk + ``.`` removal) and
    a two-paragraph ``<TXT>`` whose first paragraph splits into two
    punkt sentences. Mirrored field-for-field by the DuckDB oracle."""
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    p1 = F.concat(
        _cap(_w(0)), F.lit(" "), _w(1), F.lit(" "), _w(2), F.lit(". "),
        _cap(_w(3)), F.lit(" "), _w(4), F.lit("."),
    )
    p2 = F.concat(_cap(_w(5)), F.lit(" "), _w(6), F.lit("."))
    blob = F.concat(
        F.lit("<DOC><HL>h</HL><DOCNO> d"),
        F.col("doc_id").cast("string"),
        F.lit(".nr </DOCNO><TXT><P>"), p1, F.lit("</P><P>"), p2,
        F.lit("</P></TXT></DOC>"),
    )
    return docs.select(blob.alias("sgml"))


def muc6_template_blobs(spark, sf_dir: str) -> DataFrame:
    """One answer-key template blob per document (keyed by the same
    ``d{id}nr`` doc id S7 recovers from the SGML): every doc carries a
    SUCCESSION_EVENT with quoted POST, an IN_AND_OUT ref chain and a
    PERSON with PER_ALIAS expansion; every third doc adds a second
    event so multi-object numbering is exercised."""
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    did = F.concat(F.lit("d"), F.col("doc_id").cast("string"), F.lit("nr"))
    person = F.concat(_cap(_w(1)), F.lit(" "), _cap(_w(2)))
    post = F.concat(_w(3), F.lit(" "), _w(4))
    status = F.when(F.col("doc_id") % 2 == 0, F.lit("IN")).otherwise(F.lit("OUT"))
    person2 = F.concat(_cap(_w(5)), F.lit(" "), _cap(_w(6)))
    post2 = F.concat(_w(7), F.lit(" "), _w(8))
    ev1 = F.concat(
        F.lit("<TEMPLATE-"), F.col("doc_id").cast("string"), F.lit("-1> :=\n"),
        F.lit("   CONTENT: <SUCCESSION_EVENT-1>\n"),
        F.lit("<SUCCESSION_EVENT-1> :=\n"),
        F.lit('   POST: "'), post, F.lit('"\n'),
        F.lit("   IN_AND_OUT: <IN_AND_OUT-1>\n"),
        F.lit("<IN_AND_OUT-1> :=\n"),
        F.lit("   IO_PERSON: <PERSON-1>\n"),
        F.lit("   NEW_STATUS: "), status, F.lit("\n"),
        F.lit("<PERSON-1> :=\n"),
        F.lit('   PER_NAME: "'), person, F.lit('"\n'),
        F.lit('   PER_ALIAS: "'), _cap(_w(2)), F.lit('" "'), _w(1), F.lit('"\n'),
    )
    ev2 = F.concat(
        F.lit("<SUCCESSION_EVENT-2> :=\n"),
        F.lit('   POST: "'), post2, F.lit('"\n'),
        F.lit("   IN_AND_OUT: <IN_AND_OUT-2>\n"),
        F.lit("<IN_AND_OUT-2> :=\n"),
        F.lit("   IO_PERSON: <PERSON-2>\n"),
        F.lit("   NEW_STATUS: OUT\n"),
        F.lit("<PERSON-2> :=\n"),
        F.lit('   PER_NAME: "'), person2, F.lit('"\n'),
    )
    blob = F.when(F.col("doc_id") % 3 == 0, F.concat(ev1, ev2)).otherwise(ev1)
    return docs.select(did.alias("doc_id"), blob.alias("template_text"))


def muc6_triples_query(spark, sf_dir: str, release: bool = True) -> DataFrame:
    """S6+S7 end-to-end: SGML corpus parse (positional XML walk) →
    punkt sentence extraction, answer-key template parse (stateful
    walker in Arrow batches) → 4-way succession join, then an INNER
    evidence join on the S7-recovered doc id — if the XML walk or the
    sentence splitter drifted, rows vanish and the oracle row goes
    red. Output: (doc_id, person, post, status, evidence).

    ``release=True`` (default): the (small, triple-sized) result
    checkpoints eagerly, the internal bindings cache is unpersisted
    before returning, and the result's backing checkpoint is
    registered so ``release_caches()`` frees it when the caller is
    done — repeated calls in a long-lived session accumulate nothing.
    ``release=False`` keeps the lazy plan and relies on the global
    ``release_caches()`` registry."""
    from pyspark.storagelevel import StorageLevel

    from ..session import cache_scope, track_cache, track_checkpoint

    def build() -> DataFrame:
        paras = sgml_docs(muc6_sgml_blobs(spark, sf_dir))
        sents = muc6_doc_sentences(paras).filter(F.col("sent_idx") == 0).select(
            "doc_id", F.col("sentence").alias("evidence")
        )
        # the 4-way succession join consumes the bindings 5 ways —
        # without a persist the stateful parser's mapInPandas subtree
        # re-executes per branch (measured: 7 Python stages in the
        # plan, 1 after)
        bindings = track_cache(
            parse_muc6_templates(muc6_template_blobs(spark, sf_dir)).persist(
                StorageLevel.MEMORY_AND_DISK
            )
        )
        return succession_triples(bindings).join(sents, "doc_id")

    if not release:
        return build()
    with cache_scope():
        out = build().localCheckpoint(eager=True)
    return track_checkpoint(out)


def duck_muc6_triples() -> str:
    """Oracle: the expected (doc_id, person, post, status, evidence)
    rows derived *directly* from the fixture arithmetic over
    ``documents`` — an independent formulation that never runs the
    SGML/template parsers, so parser + joins are genuinely checked."""
    def w(k: int) -> str:
        return f"ws[CAST({k} % len(ws) AS INT) + 1]"

    def cap(e: str) -> str:
        return f"upper(substr({e}, 1, 1)) || substr({e}, 2)"

    return f"""
        WITH base AS (
            SELECT 'd' || CAST(doc_id AS VARCHAR) || 'nr' AS doc_id,
                   doc_id AS raw_id,
                   {cap(w(1))} || ' ' || {cap(w(2))} AS person,
                   {w(3)} || ' ' || {w(4)} AS post,
                   CASE WHEN doc_id % 2 = 0 THEN 'IN' ELSE 'OUT' END AS status,
                   {cap(w(5))} || ' ' || {cap(w(6))} AS person2,
                   {w(7)} || ' ' || {w(8)} AS post2,
                   {cap(w(0))} || ' ' || {w(1)} || ' ' || {w(2)} || '.' AS evidence
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        )
        SELECT doc_id, person, post, status, evidence FROM base
        UNION ALL
        SELECT doc_id, person2 AS person, post2 AS post, 'OUT' AS status, evidence
        FROM base WHERE raw_id % 3 = 0
    """
