"""Training-data curation operators (task-brief LLM-pipeline family):
PII scrubbing, repetition scoring, and benchmark decontamination over
the ``documents`` table.

All three are the shapes a 100 TB curation pass needs:

- ``pii_scrub`` — narrow regexp chain, zero shuffles, whole-stage
  codegen (the regex dialect is kept to the Java/RE2 common subset so
  the DuckDB oracle matches byte-for-byte);
- ``repetition_score`` — Gopher-style repeated-n-gram fraction, pure
  array algebra per row, emitted as INTEGER (total, distinct) counts
  so there is no float-rounding knife-edge between engines;
- ``decontaminate`` — n-gram overlap against a benchmark set: the
  benchmark's shingle table is tiny (that is the real-world shape —
  eval sets are KBs against TBs of training data), so the probe join
  broadcasts; the corpus side is one explode + semi-join, never a
  cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Java-regex / RE2 common subset only (no lookarounds, no \b).
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}", "<PHONE>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
]

def pii_exprs(text):
    """(clean_text, n_pii) Column pair for a text Column: sequential
    masking chain + per-pattern span counts taken on the chain state
    *before* each replacement, so overlapping spans count once."""
    clean = text
    span_counts = []
    for pat, repl in PII_PATTERNS:
        span_counts.append(F.size(F.split(clean, pat, -1)) - 1)
        clean = F.regexp_replace(clean, pat, repl)
    return clean, sum(span_counts, F.lit(0))


REP_N = 3  # repeated-n-gram window (Gopher uses 2..4-gram fractions)

DECON_N = 8  # contamination shingle width (n-gram overlap standard)
BENCH_EVERY = 50  # deterministic benchmark subset: doc_id % 50 == 0


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_cached(spark, f"{sf_dir}/documents.parquet")


PII_PLANT_EVERY = 20  # synthetic corpus carries no organic PII


def pii_scrub(spark: SparkSession, sf_dir: str, plant: bool = False) -> DataFrame:
    """(doc_id, clean_text, n_pii) — mask emails/phones/SSN-likes and
    count masked spans. Narrow; no shuffle.

    ``n_pii`` counts each pattern against the *progressively cleaned*
    text (the same chain the masking walks), so a span matched by two
    patterns — an SSN-like substring inside an email local part, say —
    counts once, as masked, not once per pattern.

    ``plant=True`` deterministically appends one email + one SSN-like
    span to every ``PII_PLANT_EVERY``-th doc (mirrored in the oracle)
    so the masking path is non-vacuous on the synthetic corpus."""
    text = F.col("text")
    if plant:
        text = F.when(
            F.col("doc_id") % PII_PLANT_EVERY == 0,
            F.concat(
                text,
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com id 123-45-6789"),
            ),
        ).otherwise(text)
    clean, n_pii = pii_exprs(text)
    return _docs(spark, sf_dir).select(
        "doc_id",
        clean.alias("clean_text"),
        n_pii.cast("int").alias("n_pii"),
    )


def duck_pii_scrub(plant: bool = False) -> str:
    text = "text"
    if plant:
        text = (
            f"CASE WHEN doc_id % {PII_PLANT_EVERY} = 0 THEN text"
            " || ' contact user' || CAST(doc_id AS VARCHAR)"
            " || '@example.com id 123-45-6789' ELSE text END"
        )
    clean = text
    npii = []
    for pat, repl in PII_PATTERNS:
        # count on the pre-replacement chain state (mirrors pii_scrub)
        npii.append(f"(len(string_split_regex({clean}, '{pat}')) - 1)")
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
        SELECT doc_id, {clean} AS clean_text,
               CAST({' + '.join(npii)} AS INT) AS n_pii
        FROM documents
    """


def repetition_score(spark: SparkSession, sf_dir: str, n: int = REP_N) -> DataFrame:
    """(doc_id, n_grams, n_distinct) — word-``n``-gram totals per doc.
    The repeated fraction is ``1 - n_distinct/n_grams``; both sides are
    emitted as exact integers (no cross-engine float rounding). Docs
    shorter than ``n`` words emit (0, 0)."""
    ws = F.split(F.col("text"), " ")
    # guard: Spark sequence(0, -1) DESCENDS — short docs must yield []
    grams = F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", grams.alias("g"))
        .select(
            "doc_id",
            F.size("g").cast("int").alias("n_grams"),
            F.size(F.array_distinct("g")).cast("int").alias("n_distinct"),
        )
    )


def duck_repetition() -> str:
    n = REP_N
    return f"""
        SELECT doc_id,
               CAST(len(g) AS INT) AS n_grams,
               CAST(len(list_distinct(g)) AS INT) AS n_distinct
        FROM (
            SELECT doc_id,
                   list_transform(
                       range(0, GREATEST(len(ws) - {n} + 1, 0)),
                       i -> array_to_string(ws[i + 1 : i + {n}], ' ')
                   ) AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        )
    """


def _fanned_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text), repartitioned iff under-parallel: a small local
    file reads as ONE split and per-doc n-gram construction is the
    dominant cost — at cluster scale the scan already has ≥ cores
    splits and the branch never fires."""
    raw = _docs(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < par:
        raw = raw.repartition(par)
    return raw.select("doc_id", "text")


def _gram_rows(docs: DataFrame, n: int) -> DataFrame:
    """Per-doc DISTINCT word-``n``-gram rows ``(doc_id, gram)`` via ONE
    ``mapInArrow`` (r6 re-plan, guide §4.2): the r5 Column-algebra
    build (``transform`` → ``array_join(slice)`` → explode) evaluates
    its higher-order lambdas INTERPRETED per element — measured 4.8 s
    of bloom_prefilter's 7 s at sf0.1 — vs C-speed ``str.join`` inside
    Arrow batches. Semantics identical: grams only when
    ``size(ws) >= n`` (shorter docs yield no rows), first-occurrence
    dedup per doc. Callers push their doc_id filters BELOW the map so
    each Python pass touches only its slice."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            did_col = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            idx: list[int] = []  # row index per emitted gram (take)
            o_gram: list[str] = []
            for row, text in enumerate(texts):
                ws = (text or "").split(" ")
                if len(ws) < n:
                    continue
                uniq = dict.fromkeys(
                    " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
                )
                idx.extend([row] * len(uniq))
                o_gram.extend(uniq)
            yield pa.RecordBatch.from_arrays(
                [
                    did_col.take(pa.array(idx, type=pa.int64())),
                    pa.array(o_gram, type=pa.string()),
                ],
                names=["doc_id", "gram"],
            )

    did_t = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "text").mapInArrow(
        run, schema=f"doc_id {did_t}, gram string"
    )


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    n: int = DECON_N,
    bench_every: int = BENCH_EVERY,
) -> DataFrame:
    """(doc_id, contaminated) over the non-benchmark corpus: a doc is
    contaminated when it shares ANY word-``n``-gram with a benchmark
    document (deterministic benchmark subset ``doc_id % bench_every
    == 0``). The benchmark shingle set is dimension-sized → broadcast
    semi-join; the corpus side is the :func:`_gram_rows` Arrow pass."""
    raw = _fanned_docs(spark, sf_dir)
    bench_g = (
        _gram_rows(raw.filter(F.col("doc_id") % bench_every == 0), n)
        .select("gram")
        .distinct()
    )
    corpus = raw.filter(F.col("doc_id") % bench_every != 0)
    hit = (
        _gram_rows(corpus, n)
        .join(F.broadcast(bench_g), "gram")
        .select("doc_id")
        .distinct()
    )
    return corpus.join(hit.withColumn("contaminated", F.lit(True)), "doc_id", "left").select(
        "doc_id", F.coalesce("contaminated", F.lit(False)).alias("contaminated")
    )


def duck_decontaminate() -> str:
    n, be = DECON_N, BENCH_EVERY
    return f"""
        WITH g AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(0, GREATEST(len(ws) - {n} + 1, 0)),
                       i -> array_to_string(ws[i + 1 : i + {n}], ' ')
                   )) AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        ),
        bench AS (
            SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % {be} = 0
        ),
        corpus AS (SELECT * FROM g WHERE doc_id % {be} != 0),
        hits AS (
            SELECT DISTINCT c.doc_id
            FROM (SELECT doc_id, UNNEST(grams) AS gram FROM corpus) c
            JOIN bench USING (gram)
        )
        SELECT corpus.doc_id, (hits.doc_id IS NOT NULL) AS contaminated
        FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id
    """


# --------------------------------------------------------------- sampling

from ..hashing import duck_h15, spark_h15  # noqa: E402
from ..session import read_parquet_cached

STRATUM_MOD = 4  # deterministic domain proxy: doc_id % 4
SAMPLE_RATES = {0: 10000, 1: 5000, 2: 2500, 3: 1000}  # per-10k keep rates
MIXTURE_QUOTAS = {0: 60, 1: 30, 2: 15, 3: 5}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, stratum) — deterministic per-stratum Bernoulli sample
    via hash threshold: keep doc iff ``H(doc_id) % 10000 <
    rate_per_10k[stratum]``. Reproducible (same sample every run, any
    cluster size), ZERO shuffles — the shape a 100 TB mixture-building
    pass needs (Spark's ``sampleBy`` is seed-and-partition dependent;
    a content hash is not)."""
    h = spark_h15(F.col("doc_id").cast("string")) % 10000
    stratum = (F.col("doc_id") % STRATUM_MOD).cast("int")
    rate = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]
        ),
        stratum,
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", stratum.alias("stratum"), (h < rate).alias("keep"))
        .filter("keep")
        .select("doc_id", "stratum")
    )


def duck_sample_stratified() -> str:
    h = duck_h15("CAST(doc_id AS VARCHAR)")
    rate = "CASE " + " ".join(
        f"WHEN doc_id % {STRATUM_MOD} = {k} THEN {v}"
        for k, v in SAMPLE_RATES.items()
    ) + " END"
    return f"""
        SELECT doc_id, CAST(doc_id % {STRATUM_MOD} AS INT) AS stratum
        FROM documents
        WHERE {h} % 10000 < {rate}
    """


# train/val/test boundaries on H(doc_id||':split') % 100 — a salted key
# (NOT the sample_stratified key) so split membership and sampling stay
# statistically independent decisions on the same corpus
SPLIT_BOUNDS = (90, 95)  # < 90 train, < 95 val, else test


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, split) — deterministic train/val/test assignment
    by content-keyed hash threshold: ``H(doc_id || ':split') % 100`` →
    ``train``/``val``/``test`` at 90/5/5.

    The property a 100 TB pretraining corpus needs is that the split is
    a PURE FUNCTION of the row key: stable under re-runs, repartitions,
    cluster resizes, and incremental corpus growth (a new document
    lands in a split without ever moving an old one — `randomSplit` has
    none of these). Uniform hashing also makes the split stratified in
    expectation within every source with zero extra machinery.

    Plan: one narrow codegen projection over the scan — zero exchanges,
    zero Python."""
    return _docs(spark, sf_dir).select(
        "doc_id", "source", _split_case("doc_id").alias("split")
    )


def duck_dataset_split() -> str:
    h = duck_h15("CAST(doc_id AS VARCHAR) || ':split'")
    lo, hi = SPLIT_BOUNDS
    return f"""
        SELECT doc_id, source,
               CASE WHEN {h} % 100 < {lo} THEN 'train'
                    WHEN {h} % 100 < {hi} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """


H60_MAX = 1 << 60  # h15 range: uniform md5-derived 60-bit hash


def _hash_threshold_prefilter(
    base: DataFrame,
    counts: dict[int, int],
    quotas: dict[int, int],
    mult: float = 3.0,
) -> DataFrame:
    """Cut ``base`` (stratum, h, …) to a verified superset of each
    stratum's ``quota`` lowest-``h`` rows. Threshold is deterministic
    arithmetic on the uniform hash (``mult·quota/count · 2^60``); the
    survivor count per stratum is then *checked* and the threshold
    widened 4× on any shortfall, ending (worst case) at the unfiltered
    exact path. Expected cost: one filtered-count aggregate."""
    while True:
        thr = {
            s: min(H60_MAX, int(mult * quotas[s] / max(c, 1) * H60_MAX))
            for s, c in counts.items()
        }
        if all(t >= H60_MAX for t in thr.values()):
            return base  # threshold covers everything — no filter left
        thr_col = F.element_at(
            F.create_map(*[F.lit(x) for kv in thr.items() for x in kv]),
            F.col("stratum"),
        )
        filtered = base.filter(F.col("h") <= thr_col)
        surv = {
            r["stratum"]: r["cnt"]
            for r in filtered.groupBy("stratum").agg(F.count("*").alias("cnt")).collect()
        }
        if all(
            surv.get(s, 0) >= min(quotas[s], c) for s, c in counts.items()
        ):
            return filtered
        mult *= 4.0


def domain_mixture(
    spark: SparkSession, sf_dir: str, prefilter: bool = True
) -> DataFrame:
    """(doc_id, stratum, rk) — exact per-domain quotas by hash rank:
    rank docs inside each stratum by ``(H(doc_id), doc_id)`` and keep
    ``rk <= quota``.

    Scale path (``prefilter=True``, default): an exact rank serializes
    each stratum through one window task, so the corpus is first cut
    to a small superset of the true top-``quota`` per stratum. ``h``
    is a uniform 60-bit md5-derived hash, so the threshold needs no
    quantile sketch at all: ``thr = 3·quota/count · 2^60`` (pure
    arithmetic from the per-stratum counts — a 4-row collect) keeps
    ≈3×quota survivors. A previous revision used ``percentile_approx``
    here; its rank error is relative to *stratum size*, so a stratum
    over ~2·accuracy·quota rows silently outgrew the margin, and
    scaling ``accuracy`` with count/quota makes the sketch itself
    O(count/quota) memory — the uniform-hash threshold has neither
    failure mode. Losslessness is *verified*, not assumed: the
    per-stratum survivor count (an aggregate over the ~3×quota-row
    filtered set) must reach min(quota, count); if any stratum falls
    short (astronomically unlikely under uniform hashing, but checked)
    the threshold widens 4× and retries, degenerating to the exact
    unfiltered rank in the worst case. Equality with the unfiltered
    exact rank is asserted in tests AND by the DuckDB oracle (which
    ranks exhaustively)."""
    from pyspark.sql import Window

    h = spark_h15(F.col("doc_id").cast("string"))
    stratum = (F.col("doc_id") % STRATUM_MOD).cast("int")
    base = _docs(spark, sf_dir).select(
        "doc_id", stratum.alias("stratum"), h.alias("h")
    )
    if prefilter:
        counts = {
            r["stratum"]: r["cnt"]
            for r in base.groupBy("stratum").agg(F.count("*").alias("cnt")).collect()
        }
        base = _hash_threshold_prefilter(base, counts, MIXTURE_QUOTAS)
    quota = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in MIXTURE_QUOTAS.items() for x in kv]
        ),
        F.col("stratum"),
    )
    w = Window.partitionBy("stratum").orderBy("h", "doc_id")
    return (
        base.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= quota)
        .select("doc_id", "stratum", "rk")
    )


def duck_domain_mixture() -> str:
    h = duck_h15("CAST(doc_id AS VARCHAR)")
    quota = "CASE " + " ".join(
        f"WHEN stratum = {k} THEN {v}" for k, v in MIXTURE_QUOTAS.items()
    ) + " END"
    return f"""
        SELECT doc_id, stratum, rk FROM (
            SELECT doc_id, stratum,
                   CAST(ROW_NUMBER() OVER (PARTITION BY stratum
                                           ORDER BY h, doc_id) AS INT) AS rk
            FROM (SELECT doc_id, CAST(doc_id % {STRATUM_MOD} AS INT) AS stratum,
                         {h} AS h
                  FROM documents)
        ) WHERE rk <= {quota}
    """


# --------------------------- CCNet-style boilerplate line deduplication

LINE_WORDS = 8        # words per "line" (deterministic chunking)
LINE_HOT_DOCS = 5     # a line in ≥ this many docs is boilerplate
LINE_PLANT_EVERY = 4  # plant: every 4th doc carries the boilerplate line

_BOILER = "subscribe to our newsletter for updates terms apply"


def _doc_lines(plant: bool):
    """Chunk the doc into LINE_WORDS-word lines (native Column
    algebra); ``plant=True`` appends one fixed boilerplate line to
    every ``LINE_PLANT_EVERY``-th doc as its own line (the synthetic
    corpus has no organic cross-doc duplicate lines)."""
    ws = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(LINE_WORDS)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(ws, i * LINE_WORDS + 1, LINE_WORDS), " "),
    )
    if plant:
        chunks = F.when(
            F.col("doc_id") % LINE_PLANT_EVERY == 0,
            F.concat(chunks, F.array(F.lit(_BOILER))),
        ).otherwise(chunks)
    return chunks


def line_dedup(
    spark: SparkSession, sf_dir: str, plant: bool = False, hot_docs: int = LINE_HOT_DOCS
) -> DataFrame:
    """(doc_id, clean_text, n_lines, n_dropped) — CCNet/RefinedWeb-style
    boilerplate removal: drop every line that appears in ≥ ``hot_docs``
    distinct documents.

    100 TB shape: one explode → line groupBy (map-side combined count
    of DISTINCT docs per line — lines are chunk-local so a doc repeats
    a line at most a handful of times; we count distinct doc_ids) to
    find the hot set, which is by definition TINY (only true
    boilerplate crosses the threshold) and rides back as a broadcast
    one-row array. The corpus itself never shuffles: the removal is a
    narrow array filter per document."""
    docs = _docs(spark, sf_dir).select("doc_id", _doc_lines(plant).alias("lines"))
    hot = (
        docs.select(F.explode(F.array_distinct("lines")).alias("line"))
        .groupBy("line")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= hot_docs)
        .agg(F.sort_array(F.collect_list("line")).alias("hot"))
    )
    kept = F.filter("lines", lambda l: ~F.array_contains("hot", l))
    return (
        docs.crossJoin(F.broadcast(hot))
        .select(
            "doc_id",
            F.array_join(kept, " ").alias("clean_text"),
            F.size("lines").cast("int").alias("n_lines"),
            (F.size("lines") - F.size(kept)).cast("int").alias("n_dropped"),
        )
    )


def duck_line_dedup(plant: bool = False, hot_docs: int = LINE_HOT_DOCS) -> str:
    lw = LINE_WORDS
    chunks = (
        f"list_transform(range(CAST(CEIL(len(ws) / {lw}.0) AS BIGINT)), "
        f"i -> array_to_string(ws[CAST(i*{lw}+1 AS INT) : CAST(i*{lw}+{lw} AS INT)], ' '))"
    )
    if plant:
        chunks = (
            f"CASE WHEN doc_id % {LINE_PLANT_EVERY} = 0 "
            f"THEN list_append({chunks}, '{_BOILER}') ELSE {chunks} END"
        )
    return f"""
        WITH dl AS (
            SELECT doc_id, {chunks} AS lines
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        ),
        hot AS (
            SELECT line FROM (
                SELECT UNNEST(list_distinct(lines)) AS line FROM dl
            ) GROUP BY line HAVING COUNT(*) >= {hot_docs}
        ),
        hotlist AS (SELECT COALESCE(list_sort(list(line)), []) AS hot FROM hot)
        SELECT doc_id,
               array_to_string(list_filter(lines, l -> NOT list_contains(hot, l)), ' ')
                   AS clean_text,
               CAST(len(lines) AS INT) AS n_lines,
               CAST(len(lines) - len(list_filter(lines, l -> NOT list_contains(hot, l)))
                    AS INT) AS n_dropped
        FROM dl, hotlist
    """


# --------------------------- sequence packing (pretraining batch prep)

PACK_MAX_TOKENS = 256
PACK_BINS = 8


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    max_tokens: int = PACK_MAX_TOKENS,
    n_bins: int = PACK_BINS,
) -> DataFrame:
    """(doc_id, bin, pack_id, pack_pos, n_tok) — greedy sequence
    packing for pretraining: docs are hashed into ``n_bins``
    independent bins, and within each bin (ordered by doc_id) a pack
    accumulates docs until the next one would exceed ``max_tokens``
    (an oversize doc gets its own pack).

    This is the canonical grouped-SEQUENTIAL shape: packing is
    inherently a running scan, so it runs as ``applyInPandas`` per
    bin — embarrassingly parallel ACROSS bins (at 100 TB, thousands of
    hash bins ≫ executor count; one shuffle on ``bin``), sequential
    only within one bin's slice. The DuckDB oracle walks the same
    greedy recurrence as a recursive CTE — two independent
    formulations of the scan."""
    import pandas as pd

    from ..hashing import spark_h15

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        (spark_h15(F.col("doc_id").cast("string")) % n_bins).cast("int").alias("bin"),
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_id, acc, pos = 0, 0, 0
        pids, poss = [], []
        for n in pdf["n_tok"]:
            if acc > 0 and acc + n > max_tokens:
                pack_id, acc, pos = pack_id + 1, 0, 0
            acc += int(n)
            pids.append(pack_id)
            poss.append(pos)
            pos += 1
        pdf["pack_id"] = pids
        pdf["pack_pos"] = poss
        return pdf

    return docs.groupBy("bin").applyInPandas(
        pack, schema="doc_id bigint, bin int, n_tok int, pack_id int, pack_pos int"
    ).select("doc_id", "bin", "pack_id", "pack_pos", "n_tok")


def duck_pack_sequences(
    max_tokens: int = PACK_MAX_TOKENS, n_bins: int = PACK_BINS
) -> str:
    from ..hashing import duck_h15

    h = duck_h15("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH RECURSIVE d AS (
            SELECT doc_id, CAST({h} % {n_bins} AS INT) AS bin,
                   CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
                   CAST(ROW_NUMBER() OVER (PARTITION BY CAST({h} % {n_bins} AS INT)
                                           ORDER BY doc_id) AS INT) AS rn
            FROM documents
        ),
        walk(bin, rn, doc_id, n_tok, pack_id, pack_pos, acc) AS (
            SELECT bin, rn, doc_id, n_tok, 0, 0, n_tok FROM d WHERE rn = 1
            UNION ALL
            SELECT nxt.bin, nxt.rn, nxt.doc_id, nxt.n_tok,
                   CASE WHEN w.acc + nxt.n_tok > {max_tokens}
                        THEN w.pack_id + 1 ELSE w.pack_id END,
                   CASE WHEN w.acc + nxt.n_tok > {max_tokens}
                        THEN 0 ELSE w.pack_pos + 1 END,
                   CASE WHEN w.acc + nxt.n_tok > {max_tokens}
                        THEN nxt.n_tok ELSE w.acc + nxt.n_tok END
            FROM walk w JOIN d nxt ON nxt.bin = w.bin AND nxt.rn = w.rn + 1
        )
        SELECT doc_id, bin, CAST(pack_id AS INT) AS pack_id,
               CAST(pack_pos AS INT) AS pack_pos, n_tok
        FROM walk
    """


# ----------------------------------------- end-to-end curation funnel

QUALITY_KEEP_E6 = 550_000  # keep docs with quality >= 0.55
REP_MAX_FRAC = (1, 5)      # repeated n-gram fraction <= 1/5 (exact rational)


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pass_quality, pass_repetition, pass_decontamination,
    pass_sample, kept) — the production curation FUNNEL: every doc
    flows through quality scoring, repetition filtering, benchmark
    decontamination and deterministic stratified sampling, with a
    per-stage boolean so attrition is observable per stage (what a
    real 100 TB curation run logs). Composes the individually
    oracle-checked operators; benchmark docs themselves are excluded
    (as in ``decontaminate``). ``kept`` is the conjunction.

    Plan shape: three narrow per-doc computations joined on doc_id
    (AQE-broadcast at these sizes; co-partitioned equi-joins at
    scale) + the broadcast contamination semi-join."""
    from ..operators import textstats

    q = textstats.quality_score(spark, sf_dir).select(
        "doc_id", (F.col("quality") >= QUALITY_KEEP_E6 / 1e6).alias("pass_quality")
    )
    rnum, rden = REP_MAX_FRAC
    r = repetition_score(spark, sf_dir).select(
        "doc_id",
        # repeated fraction (g-d)/g <= rnum/rden, exact ints; empty docs pass
        (
            (F.col("n_grams") - F.col("n_distinct")) * rden
            <= F.col("n_grams") * rnum
        ).alias("pass_repetition"),
    )
    c = decontaminate(spark, sf_dir).select(
        "doc_id", (~F.col("contaminated")).alias("pass_decontamination")
    )
    h = spark_h15(F.col("doc_id").cast("string")) % 10000
    stratum = (F.col("doc_id") % STRATUM_MOD).cast("int")
    rate = F.element_at(
        F.create_map(*[F.lit(x) for kv in SAMPLE_RATES.items() for x in kv]),
        stratum,
    )
    s = _docs(spark, sf_dir).select("doc_id", (h < rate).alias("pass_sample"))
    out = (
        c.join(q, "doc_id").join(r, "doc_id").join(s, "doc_id")
        .select(
            "doc_id",
            "pass_quality",
            "pass_repetition",
            "pass_decontamination",
            "pass_sample",
            (
                F.col("pass_quality")
                & F.col("pass_repetition")
                & F.col("pass_decontamination")
                & F.col("pass_sample")
            ).alias("kept"),
        )
    )
    return out


def duck_curation_funnel() -> str:
    from ..operators import textstats

    rnum, rden = REP_MAX_FRAC
    rates = " ".join(
        f"WHEN doc_id % {STRATUM_MOD} = {k} THEN {v}"
        for k, v in SAMPLE_RATES.items()
    )
    h = duck_h15("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH q AS (SELECT doc_id, quality >= {QUALITY_KEEP_E6 / 1e6} AS pass_quality
                   FROM ({textstats.duck_quality()})),
        r AS (SELECT doc_id,
                     (n_grams - n_distinct) * {rden} <= n_grams * {rnum}
                         AS pass_repetition
              FROM ({duck_repetition()})),
        c AS (SELECT doc_id, NOT contaminated AS pass_decontamination
              FROM ({duck_decontaminate()})),
        s AS (SELECT doc_id,
                     ({h} % 10000) < (CASE {rates} END) AS pass_sample
              FROM documents)
        SELECT c.doc_id, q.pass_quality, r.pass_repetition,
               c.pass_decontamination, s.pass_sample,
               (q.pass_quality AND r.pass_repetition
                AND c.pass_decontamination AND s.pass_sample) AS kept
        FROM c JOIN q USING (doc_id) JOIN r USING (doc_id) JOIN s USING (doc_id)
    """


# --------------------- context-window chunking (pretraining prep)

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    chunk: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """(doc_id, chunk_idx, begin_tok, n_chunk_tok, chunk_text) —
    fixed-size token-window chunking with stride/overlap: the
    complement of ``pack_sequences`` (long docs split into
    context-window-sized pieces for pretraining or embedding, short
    docs pass through as one chunk).

    Chunk k covers tokens [k*stride, min(k*stride + chunk, n)); the
    chunk count is 1 for n <= chunk else
    1 + ceil((n - chunk) / stride) in pure integer arithmetic, so the
    final chunk always reaches the last token and no start index runs
    past the text. The whole operator is ONE narrow projection +
    explode — no shuffle, no Python; row amplification is bounded by
    ~n/stride, the same fan-out a tokenizer shard would produce. At
    100 TB this runs map-side at scan speed and the output partitions
    inherit the scan's (AQE re-balances the amplified size if a
    downstream exchange follows)."""
    toks = F.split(F.col("text"), " ")
    d = _docs(spark, sf_dir).select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("int").alias("n_tok")
    )
    d = d.withColumn(
        "m",
        F.when(F.col("n_tok") <= chunk, F.lit(1))
        .otherwise(
            F.lit(1) + F.expr(f"(n_tok - {chunk} + {stride - 1}) div {stride}")
        )
        .cast("int"),
    )
    c = F.explode(F.sequence(F.lit(0), F.col("m") - 1)).alias("chunk_idx")
    ex = d.select("doc_id", "toks", "n_tok", c)
    begin = F.col("chunk_idx") * stride
    end = F.least(begin + chunk, F.col("n_tok"))
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        begin.cast("int").alias("begin_tok"),
        (end - begin).cast("int").alias("n_chunk_tok"),
        F.array_join(F.slice("toks", begin + 1, end - begin), " ").alias(
            "chunk_text"
        ),
    )


def duck_chunk_documents(
    chunk: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> str:
    return f"""
        SELECT doc_id,
               CAST(chunk_idx AS INT) AS chunk_idx,
               CAST(chunk_idx * {stride} AS INT) AS begin_tok,
               CAST(LEAST(chunk_idx * {stride} + {chunk}, n_tok)
                    - chunk_idx * {stride} AS INT) AS n_chunk_tok,
               array_to_string(
                   list_slice(toks, chunk_idx * {stride} + 1,
                              LEAST(chunk_idx * {stride} + {chunk}, n_tok)),
                   ' ') AS chunk_text
        FROM (
            SELECT doc_id, toks, n_tok,
                   UNNEST(range(0, CASE WHEN n_tok <= {chunk} THEN 1
                                        ELSE 1 + (n_tok - {chunk} + {stride - 1}) // {stride}
                                   END)) AS chunk_idx
            FROM (
                SELECT doc_id, string_split(text, ' ') AS toks,
                       CAST(len(string_split(text, ' ')) AS INT) AS n_tok
                FROM documents
            )
        )
    """


# ------------------------------------------------------ bloom prefilter

BLOOM_BITS = 4096
BLOOM_K = 3


def bloom_prefilter(
    spark: SparkSession,
    sf_dir: str,
    n: int = DECON_N,
    bench_every: int = BENCH_EVERY,
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """(doc_id, n_grams, n_candidates, n_exact, n_fp) — Bloom-filter
    pre-screening for decontamination, with its false-positive cost
    MEASURED per document (the ann_recall discipline: an index change
    lands with numbers, not hope). The benchmark shingle set folds
    into an ``m``-bit Bloom filter (``k`` portable md5 hash functions);
    a corpus shingle is a *candidate* when all ``k`` bits are set, and
    ``n_fp = n_candidates − n_exact`` counts the shingles the exact
    semi-join then rejects. Blooms never miss (``n_exact ≤
    n_candidates`` always — pinned in tests), so the pre-filter is
    lossless.

    Why this exists next to :func:`decontaminate`: the broadcast
    semi-join needs the RAW shingle set driver-side — fine for a KB
    eval set, impossible when the blocklist is billions of shingles.
    The Bloom table is ≤ ``m`` rows (here 4 KB) NO MATTER how large
    the blocklist grows, so it always broadcasts; the expensive exact
    join then runs only on the candidate subset. Integer bit
    positions and counts make the whole surface hash-exact across
    engines."""
    raw = _fanned_docs(spark, sf_dir)
    bench_g = (
        _gram_rows(raw.filter(F.col("doc_id") % bench_every == 0), n)
        .select("gram")
        .distinct()
    )

    def bit(j, col="gram"):
        return (
            spark_h15(F.concat(F.lit(f"bloom{j}|"), F.col(col))) % m
        ).cast("int")

    # Literal-bitmask re-plan (round 4, the IVF literal-quantizer
    # pattern): the filter is ≤ m bits NO MATTER the blocklist size, so
    # it rides into codegen as ONE boolean-array literal and the k-bit
    # membership test is a narrow projection — the old explode(×k) →
    # broadcast-join → (doc, gram) re-aggregation (the plan's only
    # corpus-scale shuffle, 38 s at sf1) is gone. The collect is the
    # sanctioned dimension-sized kind (≤ m rows, here 4 KB).
    import functools

    bloom_positions = {
        r.bitpos
        for r in bench_g.select(
            F.explode(F.array(*[bit(j) for j in range(k)])).alias("bitpos")
        )
        .distinct()
        .collect()
    }
    lit_mask = F.lit([i in bloom_positions for i in range(m)])
    cand = functools.reduce(
        lambda a, b: a & b,
        [F.element_at(lit_mask, bit(j) + 1) for j in range(k)],
    )
    cg = _gram_rows(raw.filter(F.col("doc_id") % bench_every != 0), n)
    flagged = cg.withColumn("cand", cand).join(
        F.broadcast(bench_g.withColumn("exact", F.lit(True))), "gram", "left"
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum(F.col("cand").cast("long")).alias("n_candidates"),
        F.sum(F.coalesce("exact", F.lit(False)).cast("long")).alias("n_exact"),
        (
            F.sum(F.col("cand").cast("long"))
            - F.sum(F.coalesce("exact", F.lit(False)).cast("long"))
        ).alias("n_fp"),
    )


def duck_bloom_prefilter(
    n: int = DECON_N,
    bench_every: int = BENCH_EVERY,
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> str:
    """Oracle: identical bit algebra, bit membership via IN-subquery."""
    from ..hashing import duck_h15

    def bit(j, col):
        return f"CAST({duck_h15(repr('bloom' + str(j) + '|') + ' || ' + col)} % {m} AS INT)"

    bits_b = ", ".join(bit(j, "gram") for j in range(k))
    return f"""
        WITH g AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(0, GREATEST(len(ws) - {n} + 1, 0)),
                       i -> array_to_string(ws[i + 1 : i + {n}], ' ')
                   )) AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        ),
        bench AS (
            SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % {bench_every} = 0
        ),
        bloom AS (
            SELECT DISTINCT UNNEST([{bits_b}]) AS bitpos FROM bench
        ),
        cg AS (
            SELECT doc_id, UNNEST(grams) AS gram FROM g
            WHERE doc_id % {bench_every} != 0
        ),
        per_gram AS (
            SELECT c.doc_id, c.gram,
                   ({" AND ".join(f"{bit(j, 'c.gram')} IN (SELECT bitpos FROM bloom)" for j in range(k))}) AS cand,
                   (c.gram IN (SELECT gram FROM bench)) AS exact
            FROM cg c
        )
        SELECT doc_id, COUNT(*) AS n_grams,
               CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
               CAST(SUM(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN cand THEN 1 ELSE 0 END)
                   - SUM(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
        FROM per_gram GROUP BY 1
    """


# ------------------------------------------------------- split leakage

def _split_case(doc_col: str):
    """The dataset_split assignment as a pure Column function of a
    document-id column — shared by :func:`dataset_split` and the
    leakage audit so the two can never drift."""
    h = spark_h15(F.concat(F.col(doc_col).cast("string"), F.lit(":split"))) % 100
    lo, hi = SPLIT_BOUNDS
    return (
        F.when(h < lo, F.lit("train")).when(h < hi, F.lit("val")).otherwise("test")
    )


def _duck_split_case(doc_col: str) -> str:
    h = duck_h15(f"CAST({doc_col} AS VARCHAR) || ':split'")
    lo, hi = SPLIT_BOUNDS
    return (
        f"CASE WHEN {h} % 100 < {lo} THEN 'train' "
        f"WHEN {h} % 100 < {hi} THEN 'val' ELSE 'test' END"
    )


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, jaccard, split_a, split_b) — verified MinHash
    near-dup pairs whose members were assigned to DIFFERENT
    train/val/test splits: the eval-contamination audit every
    pretraining pipeline must run AFTER splitting (a near-duplicate of
    a test document sitting in train silently inflates eval scores —
    the within-corpus twin of ``decontaminate``'s external-benchmark
    check). An empty result is the pass condition; non-empty rows are
    the work-list for quarantining or re-assigning the contained side.

    Plan: the split is a PURE FUNCTION of each pair endpoint
    (``H(doc_id||':split') % 100`` — the ``dataset_split`` contract),
    so the audit adds ZERO joins and zero extra corpus scans on top of
    ``minhash_pairs``: two codegen hash projections and a filter over
    the (tiny) verified-pair table."""
    from .dedup import minhash_pairs

    return (
        minhash_pairs(spark, sf_dir)
        .withColumn("split_a", _split_case("doc_a"))
        .withColumn("split_b", _split_case("doc_b"))
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "jaccard", "split_a", "split_b")
    )


def duck_split_leakage() -> str:
    """Oracle: the minhash pair derivation with both endpoints' split
    CASEs applied — composes after the shared ``shingles`` CTE."""
    from .dedup import MINHASH_TAU, _duck_minhash_pair_parts

    ctes, final = _duck_minhash_pair_parts(tau=MINHASH_TAU)
    ca, cb = _duck_split_case("doc_a"), _duck_split_case("doc_b")
    return f"""
        {ctes}
        SELECT doc_a, doc_b, jaccard, {ca} AS split_a, {cb} AS split_b
        FROM ({final}) WHERE {ca} <> {cb}
    """


# ---------------------------------------------------- keep-best survivor

def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, cluster_id, quality, rank, action) — QUALITY-aware
    survivor selection over the near-dup clusters: within each
    ``dedup_clusters`` component the highest-``quality_score`` member
    is kept (ties to the smallest doc_id) and the rest are dropped.
    This is the policy step a production dedup pipeline actually
    ships — keep-min-id (``dedup_clusters``' built-in survivor) is
    reproducible but quality-blind; training pipelines keep the BEST
    copy of duplicated content, not the first-crawled one.

    Plan: clusters are pair-bounded and quality is a narrow per-doc
    projection, so the compose is one doc-keyed join plus ONE
    doc-grain window partitioned by cluster_id (singleton clusters
    dominate the partition count; near-dup groups are tiny — no skew
    hazard, AQE handles the residue)."""
    from .dedup import dedup_clusters
    from .textstats import quality_score

    from pyspark.sql import Window

    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.col("doc_id")
    )
    return (
        clusters.join(q, "doc_id")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn(
            "action",
            F.when(F.col("rank") == 1, F.lit("keep")).otherwise(F.lit("drop")),
        )
        .select("doc_id", "cluster_id", "quality", "rank", "action")
    )


def duck_dedup_keep_best() -> str:
    """Oracle: the self-contained clusters oracle joined to the quality
    oracle, same rounded-quality ranking with doc_id tie-break."""
    from .dedup import duck_dedup_clusters
    from .textstats import duck_quality

    return f"""
        WITH cl AS ({duck_dedup_clusters()}),
        q AS ({duck_quality()})
        SELECT cl.doc_id, cl.cluster_id, q.quality,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY cl.cluster_id
                   ORDER BY q.quality DESC, cl.doc_id
               ) AS INTEGER) AS rank,
               CASE WHEN ROW_NUMBER() OVER (
                   PARTITION BY cl.cluster_id
                   ORDER BY q.quality DESC, cl.doc_id
               ) = 1 THEN 'keep' ELSE 'drop' END AS action
        FROM cl JOIN q ON q.doc_id = cl.doc_id
    """


# ---------------------------------------------------- reservoir sample

RESERVOIR_K = 25  # exact sample size per stratum
RESERVOIR_SALTS = 64  # phase-1 fan-out guard for hot strata


def reservoir_sample(
    spark: SparkSession, sf_dir: str, k: int = RESERVOIR_K
) -> DataFrame:
    """(source, rnk, doc_id) — EXACT-``k``-per-stratum deterministic
    sample: the ``k`` documents with the smallest uniform hash
    ``h15(doc_id)`` within each source (distributed reservoir
    sampling, Vitter/Efraimidis-Spirakis with the random key replaced
    by the engine-portable hash — rerunnable, audit-stable).

    Complements :func:`sample_stratified` (hash-threshold Bernoulli:
    EXPECTED rate, variable size) when the contract is a fixed-size
    panel per stratum (eval sets, human-review batches).

    100 TB shape: strata are FEW (sources), so a naive per-source
    window is a hot-partition sort; phase 1 ranks within
    (source, hash-salt) groups — ``RESERVOIR_SALTS`` of them — and
    keeps ≤ k per group, so the phase-2 per-source window sorts at
    most k·SALTS rows per stratum regardless of corpus size (bottom-k
    is decomposable: the global k-smallest survive every per-salt
    k-smallest cut)."""
    from pyspark.sql import Window

    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    hkey = spark_h15(F.col("doc_id").cast("string"))
    keyed = docs.select("source", "doc_id", hkey.alias("hkey")).withColumn(
        "salt", F.col("hkey") % RESERVOIR_SALTS
    )
    w1 = Window.partitionBy("source", "salt").orderBy("hkey", "doc_id")
    pre = keyed.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= k
    )
    w2 = Window.partitionBy("source").orderBy("hkey", "doc_id")
    return (
        pre.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("source", "rnk", "doc_id")
    )


def duck_reservoir_sample(k: int = RESERVOIR_K) -> str:
    """Oracle: single global per-source ROW_NUMBER over the same hash
    order (independent of the engine's two-phase bottom-k)."""
    h = duck_h15("CAST(doc_id AS VARCHAR)")
    return f"""
        SELECT source, rnk, doc_id FROM (
            SELECT source, doc_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY {h}, doc_id
                   ) AS BIGINT) AS rnk
            FROM documents
        ) WHERE rnk <= {k}
    """


# ------------------------------------------------------- novelty score

NOVELTY_E6 = 1_000_000


def novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_known, novelty_e6) — per-document
    NOVELTY against a reference corpus: the fraction of the document's
    distinct 3-gram shingles NOT present in the reference (here: the
    doc-hash-even half, the ``kg_incremental`` split convention; in
    production: the previous crawl snapshot or the training set).

    The memorization/contamination dial between two existing
    operators: ``decontaminate`` answers the BOOLEAN "does this doc
    leak an eval item", ``span_coverage`` measures WITHIN-corpus
    duplication — this measures graded cross-snapshot novelty, the
    signal used to price a re-crawl (mostly-known shards are not worth
    training on again) and to audit eval novelty.

    100 TB shape: one left semi-ish join of the doc-shingle stream
    against the DISTINCT reference shingle set keyed by shingle (the
    decontaminate join shape — AQE broadcasts when the reference set
    fits, hash-shuffles otherwise), then one doc-grain count
    aggregate. Integer micro-units; no floats anywhere."""
    from pyspark.sql import DataFrame as _DF

    from ..operators.dedup import _shingle_arrays_df

    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    h = spark_h15(F.col("doc_id").cast("string"))
    sh = _shingle_arrays_df(docs).select(
        "doc_id", F.explode("shs").alias("shingle")
    )
    ref = (
        _shingle_arrays_df(docs.filter(h % 2 == 0))
        .select(F.explode("shs").alias("shingle"))
        .distinct()
        .withColumn("known", F.lit(1))
    )
    return (
        sh.join(ref, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("known"), F.lit(0)))
            .cast("long")
            .alias("n_known"),
        )
        .withColumn(
            "novelty_e6",
            F.expr(
                f"(n_shingles - n_known) * {NOVELTY_E6} div n_shingles"
            ).cast("long"),
        )
    )


def duck_novelty_score() -> str:
    from ..operators.dedup import duck_shingles_cte

    h = duck_h15("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH shingles AS ({duck_shingles_cte()}),
        ref AS (
            SELECT DISTINCT s.shingle
            FROM shingles s
            JOIN documents d ON d.doc_id = s.doc_id
            WHERE ({duck_h15("CAST(d.doc_id AS VARCHAR)")}) % 2 = 0
        )
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN r.shingle IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_known,
               CAST((COUNT(*) - SUM(CASE WHEN r.shingle IS NOT NULL
                                         THEN 1 ELSE 0 END))
                    * {NOVELTY_E6} // COUNT(*) AS BIGINT) AS novelty_e6
        FROM shingles s
        LEFT JOIN ref r ON r.shingle = s.shingle
        GROUP BY s.doc_id
    """


# ------------------------------------------------------ weighted sample

WEIGHTED_K = 25


def weighted_sample(
    spark: SparkSession, sf_dir: str, k: int = WEIGHTED_K
) -> DataFrame:
    """(source, rnk, doc_id, weight) — deterministic WEIGHTED
    fixed-size sample per stratum: the ``k`` docs with the smallest
    ``h15(doc_id) div weight`` key, weight = max(n_chars, 1) — the
    integer-algebra analogue of Efraimidis-Spirakis A-ES keys
    (u^(1/w) replaced by hash/w so the oracle is exact; heavier docs
    get proportionally smaller keys, i.e. proportionally higher
    selection odds — importance sampling for curation panels where a
    long document should count by its mass).

    Same salted two-phase bottom-k scale shape as
    :func:`reservoir_sample` (few hot strata never sort corpus-sized
    partitions); deterministic and rerunnable like every sampler in
    the family."""
    from pyspark.sql import Window

    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    w_col = F.greatest(F.col("n_chars").cast("long"), F.lit(1))
    keyed = (
        docs.select(
            "source",
            "doc_id",
            w_col.alias("weight"),
            spark_h15(F.col("doc_id").cast("string")).alias("hval"),
        )
        # exact integer division: the 60-bit hash over a long `/`
        # would round-trip through DOUBLE and lose bits past 2^53
        .withColumn("wkey", F.expr("hval div weight").cast("long"))
        .withColumn("salt", F.col("wkey") % RESERVOIR_SALTS)
    )
    w1 = Window.partitionBy("source", "salt").orderBy("wkey", "doc_id")
    pre = keyed.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= k
    )
    w2 = Window.partitionBy("source").orderBy("wkey", "doc_id")
    return (
        pre.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("source", "rnk", "doc_id", "weight")
    )


def duck_weighted_sample(k: int = WEIGHTED_K) -> str:
    h = duck_h15("CAST(doc_id AS VARCHAR)")
    return f"""
        SELECT source, rnk, doc_id, weight FROM (
            SELECT source, doc_id,
                   CAST(GREATEST(n_chars, 1) AS BIGINT) AS weight,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY ({h}) // GREATEST(n_chars, 1), doc_id
                   ) AS BIGINT) AS rnk
            FROM documents
        ) WHERE rnk <= {k}
    """


# ------------------------------------------------------------- DSIR

DSIR_BUCKETS = 128
DSIR_TARGET_SOURCES = ("src0", "src1")  # the "target domain" slice


def dsir_weights(
    spark: SparkSession,
    sf_dir: str,
    targets: tuple[str, ...] = DSIR_TARGET_SOURCES,
) -> DataFrame:
    """(doc_id, n_toks, dsir_e6) — Data Selection via Importance
    Resampling (Xie et al., NeurIPS 2023): per-document importance
    log-weight ``Σ_tokens [ln p̂_target(bucket) − ln p̂_raw(bucket)]``
    over ``DSIR_BUCKETS`` hashed unigram features with Laplace
    smoothing — the standard "make the pretraining mix look like the
    target domain" resampling score. The target distribution is
    estimated from the ``targets`` sources; raw from the whole corpus.

    Cross-engine exactness: the ONLY float step is one ``ln`` per
    bucket on a 128-row table, immediately fixed to integers via
    ``floor(x·1e6 + 0.5)`` (identical half-up semantics in both
    engines — no ROUND-mode dependence); per-doc scores are then pure
    BIGINT sums of those integers, so token order and partitioning
    cannot drift the result.

    Plan: ONE corpus scan persisted at (doc, bucket) grain; the
    128-row histogram re-aggregates from it (map-side combined) and
    rides BACK as a broadcast; one doc-grain sum. At 100 TB the
    histogram is a table statistic you maintain incrementally — the
    scoring pass is then scan + broadcast-join + doc-grain aggregate,
    embarrassingly parallel."""
    from pyspark.storagelevel import StorageLevel

    from ..hashing import spark_h15
    from ..session import cache_scope, track_cache, track_checkpoint

    B = DSIR_BUCKETS
    tgt = F.array(*[F.lit(t) for t in targets])

    def build() -> DataFrame:
        toks = (
            _docs(spark, sf_dir)
            .select(
                "doc_id",
                F.array_contains(tgt, F.col("source")).alias("is_t"),
                F.explode(F.split(F.col("text"), " ")).alias("tok"),
            )
            .filter(F.col("tok") != "")
        )
        db = track_cache(
            toks.groupBy(
                "doc_id", "is_t", (spark_h15(F.col("tok")) % B).alias("bucket")
            )
            .agg(F.count("*").alias("cnt"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        hist = db.groupBy("bucket").agg(
            F.sum("cnt").alias("cnt_all"),
            F.sum(F.when(F.col("is_t"), F.col("cnt")).otherwise(0)).alias(
                "cnt_t"
            ),
        )
        w = Window.partitionBy()
        ratio = hist.select(
            "bucket",
            F.floor(
                (
                    F.log((F.col("cnt_t") + 1) / (F.sum("cnt_t").over(w) + B))
                    - F.log(
                        (F.col("cnt_all") + 1) / (F.sum("cnt_all").over(w) + B)
                    )
                )
                * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("w_e6"),
        )
        return (
            db.join(F.broadcast(ratio), "bucket")
            .groupBy("doc_id")
            .agg(
                F.sum("cnt").cast("long").alias("n_toks"),
                F.sum(F.col("cnt") * F.col("w_e6")).cast("long").alias(
                    "dsir_e6"
                ),
            )
        )

    with cache_scope():
        out = build().localCheckpoint(eager=True)
    return track_checkpoint(out)


def duck_dsir_weights(targets: tuple[str, ...] = DSIR_TARGET_SOURCES) -> str:
    """Oracle: the same hashed-feature histogram / smoothed log-ratio /
    integer fixing in SQL (window totals over the 128-row grid)."""
    from ..hashing import duck_h15

    B = DSIR_BUCKETS
    tlist = ", ".join(f"'{t}'" for t in targets)
    h = duck_h15("tok")
    return f"""
        WITH toks AS MATERIALIZED (
            SELECT doc_id, source IN ({tlist}) AS is_t,
                   UNNEST(string_split(text, ' ')) AS tok
            FROM documents
        ),
        db AS MATERIALIZED (
            SELECT doc_id, is_t, ({h}) % {B} AS bucket, COUNT(*) AS cnt
            FROM toks WHERE tok <> '' GROUP BY 1, 2, 3
        ),
        hist AS (
            SELECT bucket, SUM(cnt) AS cnt_all,
                   SUM(CASE WHEN is_t THEN cnt ELSE 0 END) AS cnt_t
            FROM db GROUP BY bucket
        ),
        ratio AS (
            SELECT bucket,
                   CAST(FLOOR((ln((cnt_t + 1) / (SUM(cnt_t) OVER () + {B}))
                             - ln((cnt_all + 1) / (SUM(cnt_all) OVER () + {B})))
                        * 1000000 + 0.5) AS BIGINT) AS w_e6
            FROM hist
        )
        SELECT db.doc_id, CAST(SUM(db.cnt) AS BIGINT) AS n_toks,
               CAST(SUM(db.cnt * ratio.w_e6) AS BIGINT) AS dsir_e6
        FROM db JOIN ratio USING (bucket)
        GROUP BY db.doc_id
    """


# ----------------------------------------- tool × PII exposure audit

PII_TURN_PLANT_MOD = 7  # plant a PII span on turn_idx % 7 == 3


def tool_pii_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tool, n_turns, n_pii_turns, n_spans) — the agent-transcript
    security audit: which tool contexts see PII, how often, and how
    many spans. Runs the SAME progressive masking chain as
    ``pii_scrub`` (span counted once even when patterns overlap) at
    TURN grain, then aggregates per tool state ('chat' for non-tool
    turns). The synthetic corpus carries no organic PII, so every
    ``turn_idx % 7 == 3`` turn deterministically plants one email +
    one SSN-like span (mirrored in the oracle) — the masking path is
    non-vacuous and the expected exposure profile is derivable.

    Plan: narrow regexp chain per turn (zero Python), ONE map-side-
    combinable aggregation onto the |tools|-sized grid — at 100 TB
    this is scan-speed, the same shape as ``pii_scrub`` itself."""
    from ..sources.transcripts import transcripts

    t = transcripts(spark, sf_dir)
    planted = F.when(
        F.col("turn_idx") % PII_TURN_PLANT_MOD == 3,
        F.concat(
            F.col("text"),
            F.lit(" contact agent"),
            F.col("turn_idx").cast("string"),
            F.lit("@example.com id 123-45-6789"),
        ),
    ).otherwise(F.col("text"))
    _, n_pii = pii_exprs(planted)
    return (
        t.select(
            F.coalesce("tool", F.lit("chat")).alias("tool"),
            n_pii.cast("int").alias("n_pii"),
        )
        .groupBy("tool")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum((F.col("n_pii") > 0).cast("long")).alias("n_pii_turns"),
            F.sum("n_pii").cast("long").alias("n_spans"),
        )
    )


def duck_tool_pii_exposure() -> str:
    """Oracle (compose after a ``transcripts`` CTE): identical plant +
    progressive-chain span counts per turn, grouped by tool state."""
    planted = (
        f"CASE WHEN turn_idx % {PII_TURN_PLANT_MOD} = 3 THEN text"
        " || ' contact agent' || CAST(turn_idx AS VARCHAR)"
        " || '@example.com id 123-45-6789' ELSE text END"
    )
    clean = planted
    npii = []
    for pat, repl in PII_PATTERNS:
        npii.append(f"(len(string_split_regex({clean}, '{pat}')) - 1)")
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    return f"""
        SELECT COALESCE(tool, 'chat') AS tool,
               COUNT(*) AS n_turns,
               CAST(SUM(CASE WHEN {' + '.join(npii)} > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pii_turns,
               CAST(SUM({' + '.join(npii)}) AS BIGINT) AS n_spans
        FROM transcripts
        GROUP BY 1
    """


# ------------------------------------------------- k-anonymity audit

K_ANON_K = 5  # standard privacy threshold: groups below k are at risk
K_ANON_BAND = 64  # quasi-identifier length band width (chars)


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(role, tool, len_band, n_turns, n_convs, at_risk) — k-anonymity
    equivalence-class audit over the transcript corpus' quasi-
    identifiers. A release/retention review asks: if an attacker knows
    a turn's ROLE, TOOL context, and approximate LENGTH (all visible in
    logs/metadata even when text is redacted), how many turns share
    that fingerprint? Equivalence classes smaller than ``K_ANON_K``
    re-identify — the classic k-anonymity criterion (Sweeney 2002) at
    corpus scale. All-integer output.

    Plan: ONE map-side-combinable aggregation onto the
    |roles| × |tools| × |bands| quasi-identifier grid — scan-speed at
    100 TB, output size independent of corpus size. No join, no
    window, no Python."""
    from ..sources.transcripts import transcripts

    t = transcripts(spark, sf_dir)
    grp = t.select(
        "role",
        F.coalesce("tool", F.lit("chat")).alias("tool"),
        (F.length("text") / F.lit(K_ANON_BAND)).cast("long").alias("len_band"),
        "conv_id",
    )
    return grp.groupBy("role", "tool", "len_band").agg(
        F.count("*").alias("n_turns"),
        F.count_distinct("conv_id").alias("n_convs"),
        (F.count("*") < K_ANON_K).alias("at_risk"),
    )


def duck_k_anonymity() -> str:
    """Oracle (compose after a ``transcripts`` CTE): identical grid.
    Both engines band by ``length // 64`` on non-negative lengths, so
    truncating and flooring division agree."""
    return f"""
        SELECT role,
               COALESCE(tool, 'chat') AS tool,
               CAST(length(text) // {K_ANON_BAND} AS BIGINT) AS len_band,
               COUNT(*) AS n_turns,
               COUNT(DISTINCT conv_id) AS n_convs,
               COUNT(*) < {K_ANON_K} AS at_risk
        FROM transcripts
        GROUP BY 1, 2, 3
    """


# --------------------------------------------- PII-type co-occurrence

PII_TYPE_NAMES = ("email", "phone", "ssn")


def pii_type_counts(text):
    """Per-pattern masked-span count Columns, taken on the same
    progressively cleaned chain state as :func:`pii_exprs` — the
    decomposition of ``n_pii`` by type."""
    clean = text
    counts = []
    for pat, repl in PII_PATTERNS:
        counts.append(F.size(F.split(clean, pat, -1)) - 1)
        clean = F.regexp_replace(clean, pat, repl)
    return counts


def pii_cooccurrence(
    spark: SparkSession, sf_dir: str, plant: bool = True
) -> DataFrame:
    """(type_a, type_b, n_docs) — PII-type co-occurrence grid over
    documents (diagonal rows = per-type document counts, off-diagonal
    = documents carrying BOTH types). The privacy-risk stratifier: a
    document with co-occurring identifier types (email + SSN-like) is
    categorically riskier than either alone — re-identification needs
    a join key and this grid counts where the corpus hands one over.
    Uses the same planted fixture (and the same progressively-cleaned
    span counting) as ``pii_scrub``, so the masking chain and this
    census cannot drift apart.

    Plan: one narrow flag projection + ONE global aggregation with
    |types|·(|types|+1)/2 conditional sums (map-side combinable,
    single-row shuffle), then a stack unpivot onto the grid — scan
    speed, join-free."""
    text = F.col("text")
    if plant:
        text = F.when(
            F.col("doc_id") % PII_PLANT_EVERY == 0,
            F.concat(
                text,
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com id 123-45-6789"),
            ),
        ).otherwise(text)
    counts = pii_type_counts(text)
    flags = _docs(spark, sf_dir).select(
        *[
            (c > 0).cast("long").alias(PII_TYPE_NAMES[i])
            for i, c in enumerate(counts)
        ]
    )
    names = PII_TYPE_NAMES
    aggs = []
    cells = []
    for i, a in enumerate(names):
        for b in names[i:]:
            col = f"c_{a}_{b}"
            aggs.append(
                F.sum(F.col(a) * F.col(b)).alias(col)
                if a != b
                else F.sum(F.col(a)).alias(col)
            )
            cells.append(f"'{a}', '{b}', {col}")
    one = flags.agg(*aggs)
    return one.selectExpr(
        f"stack({len(cells)}, {', '.join(cells)})"
        " AS (type_a, type_b, n_docs)"
    )


def duck_pii_cooccurrence(plant: bool = True) -> str:
    """Oracle: identical chain-state flags and conditional sums."""
    text = "text"
    if plant:
        text = (
            f"CASE WHEN doc_id % {PII_PLANT_EVERY} = 0 THEN text"
            " || ' contact user' || CAST(doc_id AS VARCHAR)"
            " || '@example.com id 123-45-6789' ELSE text END"
        )
    clean = text
    flags = []
    for pat, repl in PII_PATTERNS:
        flags.append(
            f"CASE WHEN len(string_split_regex({clean}, '{pat}')) - 1 > 0"
            " THEN 1 ELSE 0 END"
        )
        clean = f"regexp_replace({clean}, '{pat}', '{repl}', 'g')"
    names = PII_TYPE_NAMES
    sel = ", ".join(
        f"{f} AS {n}" for f, n in zip(flags, names)
    )
    rows = []
    for i, a in enumerate(names):
        for b in names[i:]:
            expr = f"SUM({a})" if a == b else f"SUM({a} * {b})"
            rows.append(
                f"SELECT '{a}' AS type_a, '{b}' AS type_b,"
                f" CAST({expr} AS BIGINT) AS n_docs FROM flags"
            )
    body = " UNION ALL ".join(rows)
    return f"""
        WITH flags AS (SELECT {sel} FROM documents)
        {body}
    """


# ----------------------------------------- packing efficiency audit


def pack_efficiency(
    spark: SparkSession,
    sf_dir: str,
    max_tokens: int = PACK_MAX_TOKENS,
    n_bins: int = PACK_BINS,
) -> DataFrame:
    """(fill_decile, n_packs, n_docs, sum_tokens) — fill-rate census of
    the :func:`pack_sequences` output: every pretraining pack bucketed
    by ``least(10, fill·10 div max_tokens)`` (decile 10 = exactly-full
    or oversize packs — a single doc above the budget lands there too). The number a
    data-pipeline team actually watches about packing: mass in low
    deciles is padding the trainer pays for, and a drift here (corpus
    length distribution changed, max_tokens mis-sized) shows up before
    the loss curves do. Σ n_docs conserves the corpus and
    Σ sum_tokens conserves the token count — both pinned in tests.

    Plan: the cost is the pack_sequences subtree itself (one shuffle
    on ``bin`` + per-bin sequential Arrow kernel); the audit on top is
    a pack-grain aggregation (packs ≪ docs) and a ≤ 11-row grid."""
    packs = pack_sequences(spark, sf_dir, max_tokens=max_tokens, n_bins=n_bins)
    per_pack = packs.groupBy("bin", "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("fill"),
    )
    decile = F.expr(f"least(10, (fill * 10) div {max_tokens})").cast("int")
    return (
        per_pack.select(
            decile.alias("fill_decile"), "n_docs", "fill"
        )
        .groupBy("fill_decile")
        .agg(
            F.count("*").cast("long").alias("n_packs"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("fill").cast("long").alias("sum_tokens"),
        )
    )


def duck_pack_efficiency(
    max_tokens: int = PACK_MAX_TOKENS, n_bins: int = PACK_BINS
) -> str:
    """Oracle: the pack_sequences recursive walk re-aggregated to the
    fill-decile grid."""
    return f"""
        WITH packed AS ({duck_pack_sequences(max_tokens, n_bins)}),
        per_pack AS (
            SELECT bin, pack_id,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS fill
            FROM packed GROUP BY 1, 2
        )
        SELECT CAST(LEAST(10, (fill * 10) // {max_tokens}) AS INT)
                   AS fill_decile,
               CAST(COUNT(*) AS BIGINT) AS n_packs,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(fill) AS BIGINT) AS sum_tokens
        FROM per_pack GROUP BY 1
    """
