"""Text analysis for the training-data pipeline: language ID, quality
scoring, token counting, document fingerprinting.

All four are pure Column algebra over ``documents`` with exact DuckDB
oracles. The text-normalization idioms mirror the reference's T-chain
(SURVEY.md §2.8): masking/lowercasing stay native ``regexp_replace``;
the heuristics below are corpus-statistics analogues of
``features_bb2016.py``'s normalization plumbing applied at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..hashing import duck_h15, spark_h15
from ..session import read_parquet_cached

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "fast"),
    "qry": ("query", "scan", "join", "filter", "sort"),
    "dat": ("data", "row", "table", "batch", "value"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in")

FP_WIN = 8  # char-shingle width for fingerprinting
FP_STEP = 4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_cached(spark, f"{sf_dir}/documents.parquet")


def _count_in(tokens, markers: tuple[str, ...]):
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred, score): argmax marker-token density; tie /
    zero → 'und'. (An n-gram-frequency language heuristic — the corpus
    is synthetic so the marker sets are corpus-tuned; the *shape* is
    what scales: one narrow pass, no shuffle.)"""
    toks = F.split(F.lower(F.col("text")), " ")
    df = _docs(spark, sf_dir).select("doc_id", toks.alias("toks"))
    for lang, markers in LANG_MARKERS.items():
        df = df.withColumn(f"c_{lang}", _count_in(F.col("toks"), markers))
    best_count = F.greatest(*[F.col(f"c_{lang}") for lang in LANG_MARKERS])
    n_best = sum(
        F.when(F.col(f"c_{lang}") == best_count, 1).otherwise(0)
        for lang in LANG_MARKERS
    )
    pred = F.when(best_count == 0, F.lit("und")).when(n_best > 1, F.lit("und"))
    for lang in LANG_MARKERS:
        pred = pred.when(F.col(f"c_{lang}") == best_count, F.lit(lang))
    return df.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.round(best_count / F.greatest(F.size("toks"), F.lit(1)), 6).alias("score"),
    )


def duck_lang_id() -> str:
    cols = []
    for lang, markers in LANG_MARKERS.items():
        lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        cols.append(
            f"len(list_filter(toks, t -> list_contains({lst}, t))) AS c_{lang}"
        )
    best = "GREATEST(" + ", ".join(f"c_{lang}" for lang in LANG_MARKERS) + ")"
    nbest = " + ".join(
        f"CASE WHEN c_{lang} = {best} THEN 1 ELSE 0 END" for lang in LANG_MARKERS
    )
    pred = f"CASE WHEN {best} = 0 THEN 'und' WHEN ({nbest}) > 1 THEN 'und' "
    for lang in LANG_MARKERS:
        pred += f"WHEN c_{lang} = {best} THEN '{lang}' "
    pred += "END"
    return f"""
        SELECT doc_id, {pred} AS lang_pred,
               ROUND({best} * 1.0 / GREATEST(len(toks), 1), 6) AS score
        FROM (
            SELECT doc_id, toks, {", ".join(cols)}
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
        )
    """


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_tok_len, stopword_ratio,
    type_token_ratio, quality): length/stopword/diversity heuristic.

    ``quality`` is the exact rational

        0.4*min(n,64)/64 + 0.3*(1 - s/n) + 0.3*(d/n)
      = (min(n,64)*n + 48*n + 48*(d - s)) / (160*n)

    half-up rounded to 6 decimals in *pure integer arithmetic*
    (``q_e6 = (numer*1e6 + denom/2) div denom``), then divided by 1e6.
    Composing from pre-rounded float components lands on exact
    7th-decimal ties that Spark and DuckDB round differently — integer
    units make the tie impossible (both engines emit the same integer,
    then the same IEEE division by 1e6)."""
    toks = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    df = _docs(spark, sf_dir).select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        toks.alias("toks"),
    )
    df = (
        df.withColumn(
            "n_stop",
            F.size(F.filter(F.col("toks"), lambda t: F.array_contains(stop, t))),
        )
        .withColumn("n_distinct", F.size(F.array_distinct("toks")))
        .withColumn(
            "avg_tok_len",
            F.round(
                (F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens"), 6
            ),
        )
        .withColumn(
            "stopword_ratio", F.round(F.col("n_stop") / F.col("n_tokens"), 6)
        )
        .withColumn(
            "type_token_ratio", F.round(F.col("n_distinct") / F.col("n_tokens"), 6)
        )
    )
    # ONE definition site for the rational (VERDICT r5 next-#4): the
    # same quality_rational_e6 string feeds this Column expr, the
    # quality_bands expr, and both DuckDB oracles. Long casts first —
    # numer*1e6 exceeds int32 AND 2^53, so neither int nor float is safe.
    df = (
        df.withColumn("n", F.col("n_tokens").cast("long"))
        .withColumn("s", F.col("n_stop").cast("long"))
        .withColumn("d", F.col("n_distinct").cast("long"))
    )
    q_e6 = F.expr(quality_rational_e6("div"))
    return df.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "avg_tok_len",
        "stopword_ratio",
        "type_token_ratio",
        (q_e6 / F.lit(1000000.0)).alias("quality"),
    )


def duck_quality() -> str:
    """Mirrors quality_score's integer-exact composite: same numer/denom
    BIGINT arithmetic, same half-up integer rounding (`//` truncates and
    all quantities are positive, so it equals floor), same final /1e6."""
    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
        SELECT doc_id, n_chars, n_tokens, avg_tok_len, stopword_ratio, type_token_ratio,
               ((numer * 1000000 + denom // 2) // denom) / 1000000.0 AS quality
        FROM (
            SELECT *,
                   LEAST(CAST(n_tokens AS BIGINT), 64) * CAST(n_tokens AS BIGINT)
                     + 48 * CAST(n_tokens AS BIGINT)
                     + 48 * (CAST(n_distinct AS BIGINT) - CAST(n_stop AS BIGINT)) AS numer,
                   160 * CAST(n_tokens AS BIGINT) AS denom
            FROM (
                SELECT doc_id,
                       CAST(length(text) AS INT) AS n_chars,
                       CAST(len(toks) AS INT) AS n_tokens,
                       len(list_filter(toks, t -> list_contains({stop}, t))) AS n_stop,
                       len(list_distinct(toks)) AS n_distinct,
                       ROUND((length(text) - (len(toks) - 1)) * 1.0 / len(toks), 6) AS avg_tok_len,
                       ROUND(len(list_filter(toks, t -> list_contains({stop}, t))) * 1.0
                             / len(toks), 6) AS stopword_ratio,
                       ROUND(len(list_distinct(toks)) * 1.0 / len(toks), 6) AS type_token_ratio
                FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
            )
        )
    """


TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ws_tokens, re_tokens, bpe_ish_tokens): whitespace count,
    regex token count (letters|digits|punct), and a deterministic
    BPE-proxy (⌈len/4⌉ subwords per whitespace token)."""
    toks = F.split(F.col("text"), " ")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)).alias(
            "re_tokens"
        ),
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int"),
        ).alias("bpe_ish_tokens"),
    )


def duck_token_counts() -> str:
    return f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS INT) AS re_tokens,
               CAST(list_sum(list_transform(string_split(text, ' '),
                                            t -> CAST(CEIL(length(t) / 4.0) AS INT))) AS INT)
                   AS bpe_ish_tokens
        FROM documents
    """


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp_min, fp_xor): rolling char-shingle fingerprint —
    min-hash and xor-fold of H over width-8 step-4 character windows.

    Kept as TRANSPARENT Column algebra deliberately (r6): Catalyst can
    prune the fingerprint computation entirely under a bare count()
    (the projection is provably non-filtering), which an opaque Arrow
    map would forfeit. Consumers that force the VALUES
    (``fingerprint_collisions``) use :func:`_doc_fingerprint_arrow` —
    2× faster when the fingerprints are actually computed (guide
    §4.2: the per-window md5 runs interpreted inside the
    ``transform`` lambda here)."""
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length("text") - (FP_WIN - 1), F.lit(1)),
        F.lit(FP_STEP),
    )
    hs = F.transform(
        starts, lambda p: spark_h15(F.col("text").substr(p, F.lit(FP_WIN)))
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.array_min(hs).alias("fp_min"),
        F.aggregate(hs, F.lit(0).cast("long"), lambda a, v: a.bitwiseXOR(v)).alias(
            "fp_xor"
        ),
    )


def _doc_fingerprint_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`doc_fingerprint` as ONE map-side ``mapInArrow`` pass —
    value-identical (H(s) is the md5 digest's top 60 bits; pinned by
    the shared DuckDB oracle and the equality test), ~2× faster when
    the fingerprint values are actually materialized."""
    import pyarrow as pa

    def run(batches):
        from hashlib import md5 as _md5

        K, S = FP_WIN, FP_STEP
        for batch in batches:
            did_col = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            o_min: list[int] = []
            o_xor: list[int] = []
            for text in texts:
                text = text or ""
                n_max = max(len(text) - (K - 1), 1)
                mn = (1 << 62)
                xr = 0
                for p in range(0, n_max, S):
                    h = (
                        int.from_bytes(
                            _md5(text[p : p + K].encode("utf-8")).digest()[:8],
                            "big",
                        )
                        >> 4
                    )
                    if h < mn:
                        mn = h
                    xr ^= h
                o_min.append(mn)
                o_xor.append(xr)
            yield pa.RecordBatch.from_arrays(
                [
                    did_col,
                    pa.array(o_min, type=pa.int64()),
                    pa.array(o_xor, type=pa.int64()),
                ],
                names=["doc_id", "fp_min", "fp_xor"],
            )

    docs = _docs(spark, sf_dir)
    did_t = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "text").mapInArrow(
        run, schema=f"doc_id {did_t}, fp_min bigint, fp_xor bigint"
    )


def duck_fingerprint() -> str:
    h = duck_h15("substr(text, CAST(p AS INT), 8)")
    return f"""
        SELECT doc_id, MIN(hv) AS fp_min, bit_xor(hv) AS fp_xor
        FROM (
            SELECT doc_id, {h} AS hv
            FROM (
                SELECT doc_id, text,
                       UNNEST(range(1, GREATEST(length(text) - {FP_WIN - 1}, 1) + 1, {FP_STEP})) AS p
                FROM documents
            )
        )
        GROUP BY doc_id
    """


# --------------------- model-based quality filtering (pretrained LR)

# Logistic-regression weights fit OFFLINE (numpy gradient descent on
# the sf0.01 fixture; label = curation quality_e6 >= 680000, a median-
# region split — 73% positive) over the three integer-e6 features
# below, then rounded to integer micro-units. Train accuracy of the
# integerized model: 0.992. The weights are data, not code — a
# production deployment swaps in weights fit on its own labeled set
# (the fastText-classifier role in Llama/GPT-3-style curation).
QC_BIAS_E6 = -56_340_675
QC_W_E6 = (94_916_212, -36_877_417, 42_615_799)  # (len_capped, stop_ratio, ttr)


def quality_rational_e6(idiv: str) -> str:
    """The quality_score half-up-e6 rational over integer columns
    (n = tokens, s = stopwords, d = distinct tokens) — ONE definition
    shared by the Spark exprs AND DuckDB oracles of calibration_bins
    and dedup.quality_dup_matrix (ADVICE r4: the literal was duplicated
    in four places and could drift). ``idiv`` is the engine's integer-
    division token: 'div' in Spark SQL, '//' in DuckDB."""
    return (
        "((least(n, 64) * n + 48 * n + 48 * (d - s)) * 1000000"
        f" + (160 * n) {idiv} 2) {idiv} (160 * n)"
    )


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, logit_e6, keep) — model-based quality filtering: a
    pretrained logistic-regression scorer over length/stopword/
    diversity features, the fastText-classifier stage of an LLM data
    pipeline (GPT-3 §2.2, Llama quality classifiers) as ONE narrow
    codegen projection — no join, no shuffle, no Python; at 100 TB it
    streams map-side at scan speed.

    All arithmetic is integer micro-units: features are exact e6
    rationals (half-up), the logit is ``bias + Σ (w_i * f_i) div 1e6``
    in BIGINT, and ``keep = logit_e6 >= 0`` — the sigmoid is monotone,
    so thresholding the logit at 0 IS thresholding the probability at
    0.5, with no transcendental to drift cross-engine."""
    toks = F.split(F.col("text"), " ")
    df = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).cast("long").alias("n"),
        _count_in(toks, STOPWORDS).cast("long").alias("s"),
        F.size(F.array_distinct(toks)).cast("long").alias("d"),
    )
    f1 = F.least(F.col("n"), F.lit(100)) * F.lit(10_000)  # min(n,100)/100 in e6
    df = df.withColumn("f1", f1).withColumn(
        "f2", F.expr("(s * 1000000 + n div 2) div n")
    ).withColumn("f3", F.expr("(d * 1000000 + n div 2) div n"))
    w1, w2, w3 = QC_W_E6
    logit = F.expr(
        f"{QC_BIAS_E6} + ({w1} * f1) div 1000000"
        f" + ({w2} * f2) div 1000000 + ({w3} * f3) div 1000000"
    ).cast("long")
    return df.select(
        "doc_id", logit.alias("logit_e6"), (logit >= 0).alias("keep")
    )


def duck_quality_classifier() -> str:
    """Same integer recurrence: e6 features, BIGINT logit, threshold 0.
    DuckDB ``//`` truncates like Spark ``div`` — every operand that
    feeds a division is non-negative except the final weighted terms,
    whose divisions happen on the PRODUCT (w*f), so both engines must
    floor identically: use explicit CASE-free arithmetic on products
    whose sign matches (w2 < 0 ⇒ product ≤ 0; DuckDB ``//`` floors
    toward negative infinity while Spark ``div`` truncates toward
    zero — avoid the mismatch by dividing the NEGATED positive product
    and negating back)."""
    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    w1, w2, w3 = QC_W_E6
    assert w2 < 0 and w1 > 0 and w3 > 0
    return f"""
        SELECT doc_id,
               CAST({QC_BIAS_E6}
                    + ({w1} * f1) // 1000000
                    - (({-w2} * f2) // 1000000)
                    + ({w3} * f3) // 1000000 AS BIGINT) AS logit_e6,
               ({QC_BIAS_E6}
                    + ({w1} * f1) // 1000000
                    - (({-w2} * f2) // 1000000)
                    + ({w3} * f3) // 1000000) >= 0 AS keep
        FROM (
            SELECT doc_id,
                   LEAST(n, 100) * 10000 AS f1,
                   (s * 1000000 + n // 2) // n AS f2,
                   (d * 1000000 + n // 2) // n AS f3
            FROM (
                SELECT doc_id,
                       CAST(len(toks) AS BIGINT) AS n,
                       CAST(len(list_filter(toks, t -> list_contains({stop}, t))) AS BIGINT) AS s,
                       CAST(len(list_distinct(toks)) AS BIGINT) AS d
                FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
            )
        )
    """


def quality_bands(
    spark: SparkSession, sf_dir: str, n_bands: int = 4, n_ranges: int = 16
) -> DataFrame:
    """(lang, band, n_docs, min_q_e6, max_q_e6): exact per-language
    quality quartiles — identical to ``NTILE(4) OVER (PARTITION BY lang
    ORDER BY q_e6, doc_id)`` but WITHOUT putting each whole language in
    a single window task (at corpus scale one language IS the corpus,
    so ``Window.partitionBy(lang)`` would serialize it). Same shape as
    :func:`..operators.metrics.vocabulary`: range-partition on the full
    sort key, number locally per partition, add driver-side per-(range,
    lang) prefix offsets (≤ ``n_ranges × n_langs`` tiny rows collected),
    then map ranks to NTILE buckets with the standard first-``rem``-
    buckets-get-one-extra rule. ``q_e6`` is the integer micro-unit
    quality from :func:`quality_score` — every emitted column is an
    integer, so the cross-engine hash has no float hazard."""
    from pyspark.sql import Window
    from pyspark.storagelevel import StorageLevel

    from ..session import track_cache

    toks = F.split(F.col("text"), " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop, t))
    ).cast("long")
    n_dist = F.size(F.array_distinct(toks)).cast("long")
    # shared quality_rational_e6 definition (VERDICT r5 next-#4)
    base = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        n.alias("n"),
        n_stop.alias("s"),
        n_dist.alias("d"),
    ).select(
        "doc_id",
        "lang",
        F.expr(quality_rational_e6("div")).alias("q_e6"),
    )
    from ..plans.rangenum import exclusive_prefix, ranged_by

    ranged = ranged_by(base, n_ranges, "lang", "q_e6", "doc_id")
    counts = ranged.groupBy("pid", "lang").agg(F.count("*").alias("cnt")).collect()
    if not counts:
        return spark.createDataFrame(
            [],
            "lang string, band int, n_docs bigint, "
            "min_q_e6 bigint, max_q_e6 bigint",
        )
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in counts:
        by_lang.setdefault(r["lang"], []).append((r["pid"], r["cnt"]))
    off_entries: list = []
    tot_entries: list = []
    for lang, lst in by_lang.items():
        offsets, tot = exclusive_prefix(lst)
        for pid, off in offsets.items():
            off_entries += [F.lit(f"{pid}|{lang}"), F.lit(off)]
        tot_entries += [F.lit(lang), F.lit(tot)]
    off_map = F.create_map(*off_entries)
    tot_map = F.create_map(*tot_entries)
    w = Window.partitionBy("pid", "lang").orderBy("q_e6", "doc_id")
    rank = (
        F.row_number().over(w)
        + off_map[F.concat_ws("|", F.col("pid"), F.col("lang"))]
    ).cast("long")
    cnt = tot_map[F.col("lang")].cast("long")
    # NTILE rule in pure integer `div` arithmetic (float division +
    # floor would drift once ranks exceed 2^53): the first cnt%b
    # buckets hold cnt div b + 1 rows, the rest cnt div b;
    # greatest(…, 1) guards the unreachable else-branch divisor when
    # cnt < n_bands (ANSI mode evaluates both branches' divisors)
    band = F.expr(
        f"""CAST(CASE
            WHEN _rank <= (_cnt % {n_bands}) * (_cnt div {n_bands} + 1)
            THEN (_rank - 1) div (_cnt div {n_bands} + 1)
            ELSE (_cnt % {n_bands})
                 + (_rank - (_cnt % {n_bands}) * (_cnt div {n_bands} + 1) - 1)
                   div greatest(_cnt div {n_bands}, 1)
        END + 1 AS INT)"""
    )
    banded = (
        ranged.withColumn("_cnt", cnt)
        .withColumn("_rank", rank)
        .select("lang", "q_e6", band.alias("band"))
    )
    return banded.groupBy("lang", "band").agg(
        F.count("*").alias("n_docs"),
        F.min("q_e6").alias("min_q_e6"),
        F.max("q_e6").alias("max_q_e6"),
    )


def duck_quality_bands(n_bands: int = 4) -> str:
    """Oracle: the plain windowed NTILE over the same integer q_e6."""
    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
        WITH q AS (
            SELECT doc_id, lang,
                   (numer * 1000000 + denom // 2) // denom AS q_e6
            FROM (
                SELECT doc_id, lang,
                       LEAST(CAST(len(toks) AS BIGINT), 64)
                         * CAST(len(toks) AS BIGINT)
                         + 48 * CAST(len(toks) AS BIGINT)
                         + 48 * (CAST(len(list_distinct(toks)) AS BIGINT)
                                 - CAST(len(list_filter(toks,
                                       t -> list_contains({stop}, t)))
                                     AS BIGINT)) AS numer,
                       160 * CAST(len(toks) AS BIGINT) AS denom
                FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
                      FROM documents)
            )
        ),
        banded AS (
            SELECT lang,
                   CAST(NTILE({n_bands}) OVER (PARTITION BY lang
                                               ORDER BY q_e6, doc_id)
                        AS INT) AS band,
                   q_e6
            FROM q
        )
        SELECT lang, band, COUNT(*) AS n_docs,
               MIN(q_e6) AS min_q_e6, MAX(q_e6) AS max_q_e6
        FROM banded GROUP BY lang, band
    """


# -------------------------------------------------------- source keyness

KEYNESS_TOP_K = 10


def source_keywords(
    spark: SparkSession, sf_dir: str, k: int = KEYNESS_TOP_K
) -> DataFrame:
    """(source, token, cnt, g2, rank) — the ``k`` most DISTINCTIVE
    tokens of each document source by Dunning's log-likelihood ratio
    (G², Dunning 1993), restricted to positively-associated tokens
    (observed > expected). This is the domain-diagnostics operator a
    corpus-mixture pipeline runs before choosing sampling weights:
    which vocabulary makes ``source`` different from the rest.

    All four contingency cells derive from ONE persisted (source,
    token) count grid — corpus-grain work is the single tokenize +
    count exchange; everything after (token/source marginals, the
    grand total, G², per-source top-k) is window/broadcast algebra
    over the vocabulary × |sources| dimension grid. Ranking orders by
    the ROUNDED statistic (ties then by token) so the cross-engine
    ordering has no float-ulp hazard — the cosine_topk discipline."""
    from pyspark.storagelevel import StorageLevel

    from ..session import track_cache

    toks = _docs(spark, sf_dir).select(
        "source",
        F.explode(F.split(F.lower("text"), " ")).alias("token"),
    ).filter(F.col("token") != "")
    cnts = track_cache(
        toks.groupBy("source", "token")
        .agg(F.count("*").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_df = cnts.agg(F.sum("cnt").alias("n_total"))
    tok_tot = F.sum("cnt").over(Window.partitionBy("token"))
    src_tot = F.sum("cnt").over(Window.partitionBy("source"))
    g = (
        cnts.withColumn("tok_tot", tok_tot)
        .withColumn("src_tot", src_tot)
        .crossJoin(F.broadcast(n_df))
    )
    a = F.col("cnt").cast("double")
    b = (F.col("tok_tot") - F.col("cnt")).cast("double")
    c = (F.col("src_tot") - F.col("cnt")).cast("double")
    d = (
        F.col("n_total") - F.col("tok_tot") - F.col("src_tot") + F.col("cnt")
    ).cast("double")
    n = F.col("n_total").cast("double")
    row1, row2 = a + b, c + d
    col1, col2 = a + c, b + d

    def xlx(x, e):
        return F.when(x > 0, x * F.log(x / e)).otherwise(F.lit(0.0))

    g2 = F.round(
        2.0
        * (
            xlx(a, row1 * col1 / n)
            + xlx(b, row1 * col2 / n)
            + xlx(c, row2 * col1 / n)
            + xlx(d, row2 * col2 / n)
        ),
        6,
    )
    w = Window.partitionBy("source").orderBy(F.desc("g2"), F.col("token"))
    return (
        g.withColumn("g2", g2)
        .filter(a * n > F.col("tok_tot").cast("double") * F.col("src_tot"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("source", "token", "cnt", "g2", "rank")
    )


def duck_source_keywords(k: int = KEYNESS_TOP_K) -> str:
    """Oracle: identical G² over the same count grid, windows for the
    marginals, scalar subquery for the grand total."""
    return f"""
        WITH cnts AS (
            SELECT source, token, COUNT(*) AS cnt
            FROM (
                SELECT source, UNNEST(string_split(lower(text), ' ')) AS token
                FROM documents
            ) WHERE token <> '' GROUP BY 1, 2
        ),
        m AS (
            SELECT *,
                   SUM(cnt) OVER (PARTITION BY token) AS tok_tot,
                   SUM(cnt) OVER (PARTITION BY source) AS src_tot,
                   (SELECT SUM(cnt) FROM cnts) AS n_total
            FROM cnts
        ),
        g AS (
            SELECT source, token, cnt,
                   ROUND(2.0 * (
                       CASE WHEN cnt > 0 THEN cnt * ln(cnt /
                           (tok_tot * 1.0 * src_tot / n_total)) ELSE 0 END
                     + CASE WHEN tok_tot - cnt > 0 THEN (tok_tot - cnt) * ln((tok_tot - cnt) /
                           (tok_tot * 1.0 * (n_total - src_tot) / n_total)) ELSE 0 END
                     + CASE WHEN src_tot - cnt > 0 THEN (src_tot - cnt) * ln((src_tot - cnt) /
                           ((n_total - tok_tot) * 1.0 * src_tot / n_total)) ELSE 0 END
                     + CASE WHEN n_total - tok_tot - src_tot + cnt > 0
                            THEN (n_total - tok_tot - src_tot + cnt) * ln((n_total - tok_tot - src_tot + cnt) /
                           ((n_total - tok_tot) * 1.0 * (n_total - src_tot) / n_total)) ELSE 0 END
                   ), 6) AS g2,
                   tok_tot, src_tot, n_total
            FROM m
        )
        SELECT source, token, cnt, g2,
               CAST(rank AS INT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY g2 DESC, token) AS rank
            FROM g WHERE cnt * 1.0 * n_total > tok_tot * 1.0 * src_tot
        )
        WHERE rank <= {k}
    """


# ------------------------------------------------------ tf-idf keywords

TFIDF_TOP_K = 5


def tfidf_keywords(
    spark: SparkSession, sf_dir: str, k: int = TFIDF_TOP_K
) -> DataFrame:
    """(doc_id, token, tf, score, rank) — each document's ``k`` most
    salient tokens by classic TF-IDF (``tf · ln(N/df)``): the per-
    document metadata/tagging primitive complementing
    ``source_keywords`` (which is per-SOURCE keyness, G²) and
    ``bm25_topk`` (which scores docs against a QUERY, not terms
    against their doc).

    Scale shape: ONE corpus-grain exchange (the tokenize → (doc,
    token) tf groupBy); the document-frequency table derived from it
    is VOCABULARY-sized, so the tf ⋈ df join and the scalar N ride as
    dimension work, and the final per-doc top-k is a doc-grain window
    over ≤ |doc| rows. Ranking orders by the ROUNDED score (ties then
    by token) — the ``source_keywords`` discipline, no float-ulp
    ordering hazard between engines."""
    from pyspark.storagelevel import StorageLevel

    from ..session import track_cache

    tf = track_cache(
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = _docs(spark, sf_dir).agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("token"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "token", "tf", "score", "rank")
    )


def duck_tfidf_keywords(k: int = TFIDF_TOP_K) -> str:
    """Oracle: identical tf/df/N derivation and rounded-score ranking."""
    return f"""
        WITH tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM (
                SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
                FROM documents
            ) WHERE token <> '' GROUP BY 1, 2
        ),
        dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token, tf.tf,
                   ROUND(tf.tf * LN(n.n_docs * 1.0 / dfreq.df), 6) AS score
            FROM tf JOIN dfreq USING (token) CROSS JOIN n
        )
        SELECT doc_id, token, tf, score,
               CAST(rank AS INTEGER) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, token
            ) AS rank FROM scored
        ) WHERE rank <= {k}
    """


# ------------------------------------------------------- vocab growth

VG_CHECKPOINTS = tuple(1 << k for k in range(8, 23))  # 256 … 4,194,304


def vocab_growth(
    spark: SparkSession, sf_dir: str, n_ranges: int = 32
) -> DataFrame:
    """(n_tokens, n_distinct) — the vocabulary-growth (Heaps' law)
    curve: number of DISTINCT terms seen within the first ``c`` tokens
    of the corpus in stable (doc_id, position) order, sampled at
    power-of-two checkpoints ≤ the corpus token count.

    Why a pipeline wants it: the V(n) ≈ K·n^β fit predicts vocabulary
    (and tokenizer/embedding-table) size at 100× the crawl BEFORE
    committing to a vocab budget, and a β break between crawl slices
    is a fast drift alarm (template/boilerplate floods bend the curve
    down, encoding bugs bend it up).

    Shape: per-doc token offsets come from the A9 two-phase numbering
    (range-partition by doc_id → windowed in-range cumsum + ≤
    ``n_ranges`` driver-side prefix offsets — never a single-task
    global sort); first-occurrence index is one groupBy(term) MIN; the
    checkpoint counts are ONE conditional aggregation over the
    term-grain table (vocab-sized, not corpus-sized), unpivoted with
    ``stack``."""
    from pyspark.storagelevel import StorageLevel

    from ..session import track_cache

    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    sized = docs.select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        F.size(F.split("text", " ")).cast("long").alias("dl"),
    )
    from ..plans.rangenum import prefix_offset_col, ranged_by

    ranged = ranged_by(sized, n_ranges, "doc_id")
    off_col, total = prefix_offset_col(ranged, F.col("dl"))
    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("dl").over(w), F.lit(0)) + off_col
    toks = (
        ranged.withColumn("off", off)
        .select("off", F.posexplode("ws").alias("pos", "word"))
        .select(
            "word", (F.col("off") + F.col("pos") + 1).alias("gidx")
        )
    )
    first = toks.groupBy("word").agg(F.min("gidx").alias("fi"))
    cps = [c for c in VG_CHECKPOINTS if c <= total]
    if not cps:
        cps = [max(total, 1)]
    agg = first.agg(
        *[
            F.sum((F.col("fi") <= c).cast("long")).alias(f"c{c}")
            for c in cps
        ]
    )
    stack_args = ", ".join(
        f"CAST({c} AS BIGINT), c{c}" for c in cps
    )
    return agg.select(
        F.expr(
            f"stack({len(cps)}, {stack_args}) AS (n_tokens, n_distinct)"
        )
    )


def duck_vocab_growth() -> str:
    """Oracle: global ordered window for the offsets (independent of
    the engine's two-phase cumsum) + one UNION ALL branch per
    checkpoint, each self-gated by ``HAVING total >= c`` so the
    emitted checkpoint set matches at every scale factor."""
    branches = "\n        UNION ALL\n".join(
        f"""
        SELECT CAST({c} AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN fi <= {c} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_distinct
        FROM first
        HAVING (SELECT SUM(dl) FROM sized) >= {c}"""
        for c in VG_CHECKPOINTS
    )
    return f"""
        WITH sized AS (
            SELECT doc_id, string_split(text, ' ') AS ws,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
            FROM documents
        ),
        offs AS (
            SELECT doc_id, ws,
                   COALESCE(SUM(dl) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS off
            FROM sized
        ),
        toks AS (
            SELECT ws[i + 1] AS word, off + i + 1 AS gidx
            FROM (SELECT ws, off, UNNEST(range(len(ws))) AS i FROM offs)
        ),
        first AS (SELECT word, MIN(gidx) AS fi FROM toks GROUP BY word)
        {branches}
    """


# ------------------------------------------------- composition indexes

DIV_E6 = 1_000_000
DIV_SCOPE_ALL = "__all__"


def source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(scope, n_docs, n_groups, simpson_e6, dominance_e6) — exact
    Simpson diversity of each source's LANGUAGE composition plus an
    ``__all__`` corpus row: simpson = 1 − Σ(nᵢ/N)², the probability
    two random docs differ in language; dominance = max nᵢ/N.

    The corpus-composition monitor a mixture pipeline reads next to
    ``domain_mixture``: a collapsing diversity (or rising dominance)
    in a crawl slice is the template-flood alarm, and unlike Shannon
    entropy the Simpson index is an exact RATIONAL — Σnᵢ² and N are
    BIGINTs, so micro-unit emission is log-free and the oracle
    hash-matches.

    One groupBy(scope, lang) over the scan (map-side combinable),
    then a scope-grain aggregate — group-dimension-sized all the way
    after the first exchange."""
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    per = docs.select("source", "lang").unionByName(
        docs.select(F.lit(DIV_SCOPE_ALL).alias("source"), "lang")
    )
    counts = per.groupBy(F.col("source").alias("scope"), "lang").agg(
        F.count("*").cast("long").alias("n")
    )
    return (
        counts.groupBy("scope")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_groups"),
            F.sum(F.col("n") * F.col("n")).cast("long").alias("_sq"),
            F.max("n").cast("long").alias("_mx"),
        )
        .withColumn(
            "simpson_e6",
            F.expr(
                f"(n_docs * n_docs - _sq) * {DIV_E6} div (n_docs * n_docs)"
            ).cast("long"),
        )
        .withColumn(
            "dominance_e6",
            F.expr(f"_mx * {DIV_E6} div n_docs").cast("long"),
        )
        .select("scope", "n_docs", "n_groups", "simpson_e6", "dominance_e6")
    )


def duck_source_diversity() -> str:
    return f"""
        WITH per AS (
            SELECT source AS scope, lang FROM documents
            UNION ALL
            SELECT '{DIV_SCOPE_ALL}' AS scope, lang FROM documents
        ),
        counts AS (
            SELECT scope, lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM per GROUP BY scope, lang
        )
        SELECT scope,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST((SUM(n) * SUM(n) - SUM(n * n)) * {DIV_E6}
                    // (SUM(n) * SUM(n)) AS BIGINT) AS simpson_e6,
               CAST(MAX(n) * {DIV_E6} // SUM(n) AS BIGINT) AS dominance_e6
        FROM counts GROUP BY scope
    """


# ------------------------------------------------- MOSS winnowing

WINNOW_W = 4  # k-gram hashes per winnowing window


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, fp) — winnowing fingerprints (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003 — the MOSS algorithm): over the rolling
    ``FP_WIN``-char k-gram hashes of each document, every window of
    ``WINNOW_W`` consecutive hashes selects its minimum (RIGHTMOST
    occurrence on ties), and the distinct selected (position, hash)
    pairs are the document's fingerprint set. Winnowing guarantees any
    shared substring of length ≥ FP_WIN + WINNOW_W − 1 yields a shared
    fingerprint — the local-dedup/plagiarism primitive that
    ``doc_fingerprint``'s global min/xor summary cannot give (it
    detects whole-doc twins; winnowing detects SHARED PASSAGES when
    fingerprints are equi-joined across docs).

    Plan (r6 re-plan, guide §4.2): ONE ``mapInArrow`` over
    ``(doc_id, text)`` — zero joins, zero shuffles, map-side at scan
    speed at any corpus size. The r5 shape was pure Column algebra,
    but higher-order-function lambdas (``transform``/``array_min``)
    evaluate INTERPRETED per element, and the per-position
    ``md5 → substr → conv`` chain measured 140 µs/k-gram of JVM time
    (8.9 s at sf0.1, the slowest standalone bench row). Inside Arrow
    batches the same hashes come from C-speed ``hashlib.md5`` (the
    first 15 hex digits are the digest's top 60 bits) and the
    rightmost-min window selection + distinct run vectorized in
    numpy. Exactness is pinned by the pure-Python winnowing twin
    (``test_winnow_matches_python_twin``: positions AND values) and
    the DuckDB oracle, both unchanged."""
    import pyarrow as pa

    def run(batches):
        from hashlib import md5 as _md5

        import numpy as np

        K, W = FP_WIN, WINNOW_W
        for batch in batches:
            did_col = batch.column("doc_id")
            texts = batch.column("text").to_pylist()
            idx_rows: list[int] = []  # row index per fingerprint (take)
            o_pos: list[int] = []
            o_fp: list[int] = []
            for row, text in enumerate(texts):
                text = text or ""
                n_kg = max(len(text) - (K - 1), 1)
                hs = np.fromiter(
                    (
                        int.from_bytes(
                            _md5(text[i : i + K].encode("utf-8")).digest()[:8],
                            "big",
                        )
                        >> 4
                        for i in range(n_kg)
                    ),
                    dtype=np.int64,
                    count=n_kg,
                )
                if n_kg <= W:
                    # single (possibly truncated) window: rightmost min
                    j = n_kg - 1 - int(hs[::-1].argmin())
                    sel = np.array([j], dtype=np.int64)
                else:
                    n_win = n_kg - W + 1
                    idx = np.arange(n_win)[:, None] + np.arange(W)[None, :]
                    M = hs[idx]
                    # argmin on the REVERSED window → rightmost tie wins
                    am = M[:, ::-1].argmin(axis=1)
                    sel = np.unique(np.arange(n_win) + (W - 1) - am)
                idx_rows.extend([row] * len(sel))
                o_pos.extend((sel + 1).tolist())
                o_fp.extend(hs[sel].tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    did_col.take(pa.array(idx_rows, type=pa.int64())),
                    pa.array(o_pos, type=pa.int32()),
                    pa.array(o_fp, type=pa.int64()),
                ],
                names=["doc_id", "pos", "fp"],
            )

    docs = _docs(spark, sf_dir)
    did_t = docs.schema["doc_id"].dataType.simpleString()
    return docs.select("doc_id", "text").mapInArrow(
        run, schema=f"doc_id {did_t}, pos int, fp bigint"
    )


def duck_winnow() -> str:
    """Oracle: the same rightmost-min selection via a window-to-kgram
    range join and ROW_NUMBER ordered (hash, pos DESC)."""
    h = duck_h15(f"substr(text, CAST(p AS INT), {FP_WIN})")
    return f"""
        WITH hv AS MATERIALIZED (
            SELECT doc_id, CAST(p AS INT) AS p, {h} AS fp,
                   GREATEST(length(text) - {FP_WIN - 1}, 1) AS n_kg
            FROM (
                SELECT doc_id, text,
                       UNNEST(range(1, GREATEST(length(text) - {FP_WIN - 1}, 1) + 1)) AS p
                FROM documents
            )
        ),
        wins AS (
            SELECT doc_id,
                   UNNEST(range(1, GREATEST(n_kg - {WINNOW_W - 1}, 1) + 1)) AS s
            FROM (SELECT DISTINCT doc_id, n_kg FROM hv)
        ),
        sel AS (
            SELECT w.doc_id, h.p, h.fp,
                   ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.s
                                      ORDER BY h.fp, h.p DESC) AS rn
            FROM wins w
            JOIN hv h ON h.doc_id = w.doc_id
                     AND h.p BETWEEN w.s AND w.s + {WINNOW_W - 1}
        )
        SELECT DISTINCT doc_id, CAST(p AS INT) AS pos, fp
        FROM sel WHERE rn = 1
    """


# --------------------------------------- source-profile similarity


def source_bigram_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_a, src_b, dot, cos2_e6) — pairwise source-profile
    similarity over word-bigram count vectors: the corpus-drift /
    feed-overlap matrix (which sources publish the same *kind* of text,
    as opposed to ``dup_source_matrix``'s literal near-copies).
    ``dot`` is the exact integer inner product of the two sources'
    bigram-count profiles; ``cos2_e6`` is the squared cosine as the
    staged integer ``((dot² div ‖a‖²) × 1e6) div ‖b‖²`` —
    square-root-free, so no transcendental drifts cross-engine, and
    staged so the intermediate stays ≈ 1e6·dot²/(na·nb) ≤ 1e6·dot
    (BIGINT-safe headroom even at 10⁶× the bench profile counts,
    where the naive ``dot²×1e6`` product would overflow). Both
    engines floor non-negative operands identically. src_a < src_b.

    Plan: ONE corpus-scan explode of per-row bigram arrays into a
    map-side-combinable count onto the (source × bigram-vocab) grid —
    the profile table is DIMENSION-sized (sources × bounded bigram
    vocabulary), so the pairwise self-join on bigram and the final
    |sources|² aggregation never touch corpus-scale data again. At
    100 TB the only corpus-wide stage is the scan-shaped profile
    build."""
    grams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(0, size(split(text, ' ')) - 2), "
        "i -> concat(element_at(split(text, ' '), i + 1), ' ', "
        "element_at(split(text, ' '), i + 2))) "
        "ELSE array() END"
    )
    prof = (
        _docs(spark, sf_dir)
        .select("source", F.explode(grams).alias("bigram"))
        .groupBy("source", "bigram")
        .agg(F.count("*").alias("cnt"))
    )
    norms = prof.groupBy("source").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("norm_sq")
    )
    pairs = (
        prof.alias("a")
        .join(prof.alias("b"), "bigram")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot"))
    )
    return (
        pairs.join(norms.withColumnRenamed("source", "src_a"), "src_a")
        .withColumnRenamed("norm_sq", "na")
        .join(norms.withColumnRenamed("source", "src_b"), "src_b")
        .withColumnRenamed("norm_sq", "nb")
        .select(
            "src_a",
            "src_b",
            "dot",
            F.expr("(((dot * dot) div na) * 1000000) div nb").alias("cos2_e6"),
        )
    )


def duck_source_bigram_sim() -> str:
    """Same profile build via list_transform + UNNEST; integer dot and
    squared-cosine. DuckDB ``//`` floors but every operand here is
    non-negative, so it agrees with Spark's truncating ``div``."""
    return """
        WITH prof AS (
            SELECT source, bigram, COUNT(*) AS cnt
            FROM (
                SELECT source, UNNEST(
                    CASE WHEN len(ws) >= 2
                         THEN list_transform(range(1, len(ws)),
                                             i -> ws[i] || ' ' || ws[i + 1])
                         ELSE []::VARCHAR[] END) AS bigram
                FROM (SELECT source, string_split(text, ' ') AS ws
                      FROM documents)
            )
            GROUP BY source, bigram
        ),
        norms AS (
            SELECT source, SUM(cnt * cnt) AS norm_sq
            FROM prof GROUP BY source
        ),
        pairs AS (
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
            FROM prof a JOIN prof b
              ON a.bigram = b.bigram AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT p.src_a, p.src_b, p.dot,
               CAST((((p.dot * p.dot) // na.norm_sq) * 1000000)
                    // nb.norm_sq AS BIGINT) AS cos2_e6
        FROM pairs p
        JOIN norms na ON na.source = p.src_a
        JOIN norms nb ON nb.source = p.src_b
    """


# ------------------------------------------ classifier calibration

# Probability-decile logit thresholds: round(ln((k/10)/(1-k/10))·1e6)
# for k = 1..9 — constants, so both engines CASE on identical integer
# literals (the transcendental is evaluated once, offline, here).
CAL_LOGIT_E6 = (
    -2197225, -1386294, -847298, -405465, 0,
    405465, 847298, 1386294, 2197225,
)


def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, n_docs, n_pos, pos_rate_e6) — reliability diagram of the
    pretrained quality classifier: documents bucketed into probability
    deciles (via integer logit thresholds — sigmoid is monotone, so
    decile-of-p ≡ interval-of-logit), against the ground-truth quality
    rule the classifier was fit to (``quality_e6 ≥ 680000``). The
    model-QA step every production filtering stage needs: a
    well-calibrated bin-k has pos_rate ≈ (k+0.5)/10, and ECE is one
    weighted sum over these rows. All-integer (counts + half-up e6
    rate), so cross-engine exact.

    Plan: ONE narrow projection computes BOTH the classifier logit and
    the label from the same token stats (no join between model and
    truth), then one map-side-combinable aggregation onto the 10-bin
    grid — scan-speed at 100 TB."""
    toks = F.split(F.col("text"), " ")
    df = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).cast("long").alias("n"),
        _count_in(toks, STOPWORDS).cast("long").alias("s"),
        F.size(F.array_distinct(toks)).cast("long").alias("d"),
    )
    df = (
        df.withColumn("f1", F.least(F.col("n"), F.lit(100)) * F.lit(10_000))
        .withColumn("f2", F.expr("(s * 1000000 + n div 2) div n"))
        .withColumn("f3", F.expr("(d * 1000000 + n div 2) div n"))
    )
    w1, w2, w3 = QC_W_E6
    logit = F.expr(
        f"{QC_BIAS_E6} + ({w1} * f1) div 1000000"
        f" + ({w2} * f2) div 1000000 + ({w3} * f3) div 1000000"
    ).cast("long")
    # ground truth: the quality_score rational, half-up e6
    q_e6 = F.expr(quality_rational_e6("div"))
    binned = df.select(
        logit.alias("logit_e6"), (q_e6 >= 680000).alias("pos")
    )
    bin_col = F.lit(9)
    for k in range(len(CAL_LOGIT_E6), 0, -1):
        bin_col = F.when(
            F.col("logit_e6") < CAL_LOGIT_E6[k - 1], F.lit(k - 1)
        ).otherwise(bin_col)
    return (
        binned.select(bin_col.alias("bin"), "pos")
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("pos").cast("long")).alias("n_pos"),
        )
        .select(
            "bin",
            "n_docs",
            "n_pos",
            F.expr(
                "(n_pos * 1000000 + n_docs div 2) div n_docs"
            ).alias("pos_rate_e6"),
        )
    )


def duck_calibration_bins() -> str:
    """Identical integer logit (sign-safe division — see
    :func:`duck_quality_classifier`), label rule, and decile CASE."""
    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    w1, w2, w3 = QC_W_E6
    assert w2 < 0 and w1 > 0 and w3 > 0
    case = "CASE "
    for k, thr in enumerate(CAL_LOGIT_E6):
        case += f"WHEN logit_e6 < {thr} THEN {k} "
    case += "ELSE 9 END"
    return f"""
        SELECT {case} AS bin,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               CAST((SUM(CASE WHEN pos THEN 1 ELSE 0 END) * 1000000
                     + COUNT(*) // 2) // COUNT(*) AS BIGINT) AS pos_rate_e6
        FROM (
            SELECT CAST({QC_BIAS_E6}
                        + ({w1} * f1) // 1000000
                        - (({-w2} * f2) // 1000000)
                        + ({w3} * f3) // 1000000 AS BIGINT) AS logit_e6,
                   {quality_rational_e6("//")} >= 680000 AS pos
            FROM (
                SELECT LEAST(n, 100) * 10000 AS f1,
                       (s * 1000000 + n // 2) // n AS f2,
                       (d * 1000000 + n // 2) // n AS f3,
                       n, s, d
                FROM (
                    SELECT CAST(len(toks) AS BIGINT) AS n,
                           CAST(len(list_filter(toks,
                                t -> list_contains({stop}, t))) AS BIGINT) AS s,
                           CAST(len(list_distinct(toks)) AS BIGINT) AS d
                    FROM (SELECT string_split(text, ' ') AS toks FROM documents)
                )
            )
        )
        GROUP BY 1
    """


# --------------------------------------------------- readability census


def readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_words, n_sents, n_syll, fre_e3) — per-source
    Flesch reading-ease census kept integer-exact: syllables are vowel
    runs (the classic approximation), sentences are '.' counts floored
    at one per doc, and the score is the micro-average
    ``206.835 − 1.015·(W/S) − 84.6·(Y/W)`` ×1000 with each rational
    term half-up-rounded BEFORE the subtraction (so both engines
    subtract identical integers; the result may legitimately go
    negative for pathological text). The corpus-mix readability dial:
    training mixtures are routinely rebalanced on exactly this
    statistic.

    Plan: one narrow projection (regexp + split counts, all codegen)
    feeding one map-side-combinable aggregation onto the |sources|
    grid — scan-speed at 100 TB."""
    df = _docs(spark, sf_dir).select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("w"),
        F.greatest(
            F.lit(1),
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "\\.", ""))
            ).cast("long"),
        ).alias("s"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiouAEIOU]+"), 0))
        .cast("long")
        .alias("y"),
    )
    return (
        df.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("w").alias("n_words"),
            F.sum("s").alias("n_sents"),
            F.sum("y").alias("n_syll"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_sents",
            "n_syll",
            F.expr(
                "206835 - (1015 * n_words + n_sents div 2) div n_sents"
                " - (84600 * n_syll + n_words div 2) div n_words"
            ).alias("fre_e3"),
        )
    )


def duck_readability() -> str:
    """Oracle: identical vowel-run / dot-count derivation and staged
    half-up terms."""
    return """
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS n_words, CAST(SUM(s) AS BIGINT) AS n_sents,
               CAST(SUM(y) AS BIGINT) AS n_syll,
               CAST(206835
                    - (1015 * SUM(w) + SUM(s) // 2) // SUM(s)
                    - (84600 * SUM(y) + SUM(w) // 2) // SUM(w)
                    AS BIGINT) AS fre_e3
        FROM (
            SELECT source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
                   GREATEST(1, CAST(length(text)
                       - length(replace(text, '.', '')) AS BIGINT)) AS s,
                   CAST(len(regexp_extract_all(text, '[aeiouAEIOU]+'))
                        AS BIGINT) AS y
            FROM documents
        )
        GROUP BY source
    """


# ------------------------------------------------ truncation-loss audit

TRUNC_LENGTHS = (64, 128, 256, 512)


def truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(max_len, n_docs, n_over, tokens_total, tokens_lost, loss_e6) —
    context-length policy audit: for each candidate whitespace-token
    cutoff L, how many documents exceed it and what half-up e6
    fraction of all tokens a hard truncation at L would discard. THE
    table one reads before choosing a packing/truncation length — the
    knee of loss_e6 vs L is the cheapest L that wastes nothing.

    Plan: ONE corpus pass computes per-doc token counts and the |L|
    conditional aggregates as columns (map-side combinable), then the
    single output row unpivots via ``stack`` onto the |L|-row grid —
    the corpus is scanned once regardless of how many cutoffs are
    audited."""
    n = F.size(F.split("text", " ")).cast("long")
    aggs = [
        F.count("*").alias("n_docs"),
        F.sum(n).alias("tok"),
    ]
    for ln in TRUNC_LENGTHS:
        aggs.append(
            F.sum(F.when(n > ln, 1).otherwise(0)).alias(f"over_{ln}")
        )
        aggs.append(
            F.sum(F.when(n > ln, n - ln).otherwise(0)).alias(f"lost_{ln}")
        )
    one = _docs(spark, sf_dir).agg(*aggs)
    stack = ", ".join(
        f"{ln}L, over_{ln}, lost_{ln}" for ln in TRUNC_LENGTHS
    )
    return one.selectExpr(
        "n_docs",
        "tok",
        f"stack({len(TRUNC_LENGTHS)}, {stack})"
        " as (max_len, n_over, tokens_lost)",
    ).selectExpr(
        "max_len",
        "n_docs",
        "n_over",
        "tok as tokens_total",
        "tokens_lost",
        "(tokens_lost * 1000000 + tok div 2) div tok as loss_e6",
    )


def duck_truncation_loss() -> str:
    """Oracle: the same conditional aggregates, one row per cutoff via
    a literal lengths list."""
    selects = []
    for ln in TRUNC_LENGTHS:
        selects.append(
            f"""
            SELECT CAST({ln} AS BIGINT) AS max_len, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN n > {ln} THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
                   CAST(SUM(n) AS BIGINT) AS tokens_total,
                   CAST(SUM(CASE WHEN n > {ln} THEN n - {ln} ELSE 0 END)
                       AS BIGINT) AS tokens_lost,
                   CAST((SUM(CASE WHEN n > {ln} THEN n - {ln} ELSE 0 END)
                         * 1000000 + SUM(n) // 2) // SUM(n) AS BIGINT)
                       AS loss_e6
            FROM toks
            """
        )
    body = " UNION ALL ".join(selects)
    return f"""
        WITH toks AS (
            SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n
            FROM documents
        )
        {body}
    """


# ---------------------------------------------------- dialog-act census


def dialog_acts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(role, n_turns, n_question, n_exclaim, n_code, question_e6,
    exclaim_e6, code_e6) — per-role dialog-act census via surface
    heuristics: a turn is a QUESTION if its right-trimmed text ends
    with '?', an EXCLAMATION if it ends with '!', and CODE-BEARING if
    it contains a backtick. The conversational-style profile of an
    agent corpus (which roles ask, which emote, which paste code) and
    a drift monitor across corpus versions. Pure narrow Column
    algebra, half-up e6 rates.

    Plan: one narrow projection + one map-side-combinable aggregation
    onto the |roles| grid — scan-speed at 100 TB."""
    from ..sources.transcripts import transcripts

    t = transcripts(spark, sf_dir).select(
        "role",
        F.rtrim(F.col("text")).alias("txt"),
    )
    flags = t.select(
        "role",
        F.col("txt").endswith("?").cast("long").alias("q"),
        F.col("txt").endswith("!").cast("long").alias("x"),
        F.col("txt").contains("`").cast("long").alias("c"),
    )
    return flags.groupBy("role").agg(
        F.count("*").alias("n_turns"),
        F.sum("q").alias("n_question"),
        F.sum("x").alias("n_exclaim"),
        F.sum("c").alias("n_code"),
        F.expr(
            "(sum(q) * 1000000 + count(*) div 2) div count(*)"
        ).alias("question_e6"),
        F.expr(
            "(sum(x) * 1000000 + count(*) div 2) div count(*)"
        ).alias("exclaim_e6"),
        F.expr(
            "(sum(c) * 1000000 + count(*) div 2) div count(*)"
        ).alias("code_e6"),
    )


def duck_dialog_acts() -> str:
    """Oracle (compose after a ``transcripts`` CTE — extends the CTE
    list, hence the leading comma): identical rtrim + suffix/contains
    flags."""
    return """
        , flags AS (
            SELECT role,
                   CASE WHEN rtrim(text) LIKE '%?' THEN 1 ELSE 0 END AS q,
                   CASE WHEN rtrim(text) LIKE '%!' THEN 1 ELSE 0 END AS x,
                   CASE WHEN text LIKE '%`%' THEN 1 ELSE 0 END AS c
            FROM transcripts
        )
        SELECT role, COUNT(*) AS n_turns,
               CAST(SUM(q) AS BIGINT) AS n_question, CAST(SUM(x) AS BIGINT) AS n_exclaim,
               CAST(SUM(c) AS BIGINT) AS n_code,
               CAST((SUM(q) * 1000000 + COUNT(*) // 2) // COUNT(*)
                    AS BIGINT) AS question_e6,
               CAST((SUM(x) * 1000000 + COUNT(*) // 2) // COUNT(*)
                    AS BIGINT) AS exclaim_e6,
               CAST((SUM(c) * 1000000 + COUNT(*) // 2) // COUNT(*)
                    AS BIGINT) AS code_e6
        FROM flags GROUP BY role
    """


# ------------------------------------------------- head-gram coverage

COVERAGE_KS = (10, 100, 1000)


def gram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(top_k, n_grams, total_occ, covered, coverage_e6) —
    templatedness census: what half-up e6 fraction of ALL bigram
    occurrences the top-k most frequent bigrams account for, for each
    audited k. A steep curve (tiny head covers most mass) is the
    boilerplate/template signature that predicts big wins from
    ``line_dedup``/``repetition_score``; a flat curve means genuinely
    diverse text. Ties rank deterministically by (count desc, gram
    asc) in both engines.

    Plan: the corpus-wide stage is ONE explode + map-side-combinable
    bigram count; everything after runs on the VOCABULARY dimension
    (distinct bigrams): a single rank window, one aggregate with |K|
    conditional sums, a 1-row stack unpivot. At 100 TB the vocab sort
    is the classic head-selection problem — if even the vocab outgrows
    one sort, a two-pass threshold select (count histogram → cutoff)
    replaces the window without changing the contract."""
    toks = F.split(F.col("text"), " ")
    grams = (
        _docs(spark, sf_dir)
        .select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat(element_at(t, i), ' ',"
                    " element_at(t, i + 1)))"
                )
            ).alias("gram")
        )
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("gram"))
    ranked = counts.withColumn("rk", F.row_number().over(w))
    aggs = [
        F.count("*").alias("n_grams"),
        F.sum("cnt").alias("total_occ"),
    ]
    for k in COVERAGE_KS:
        aggs.append(
            F.sum(F.when(F.col("rk") <= k, F.col("cnt")).otherwise(0)).alias(
                f"cov_{k}"
            )
        )
    one = ranked.agg(*aggs)
    stack = ", ".join(f"{k}L, cov_{k}" for k in COVERAGE_KS)
    return one.selectExpr(
        "n_grams",
        "total_occ",
        f"stack({len(COVERAGE_KS)}, {stack}) as (top_k, covered)",
    ).selectExpr(
        "top_k",
        "n_grams",
        "total_occ",
        "covered",
        "(covered * 1000000 + total_occ div 2) div total_occ"
        " as coverage_e6",
    )


def duck_gram_coverage() -> str:
    """Oracle: identical bigram derivation, (count desc, gram) rank,
    and per-k conditional coverage."""
    selects = []
    for k in COVERAGE_KS:
        selects.append(
            f"""
            SELECT CAST({k} AS BIGINT) AS top_k,
                   (SELECT COUNT(*) FROM ranked) AS n_grams,
                   CAST((SELECT SUM(cnt) FROM ranked) AS BIGINT) AS total_occ,
                   CAST(SUM(CASE WHEN rk <= {k} THEN cnt ELSE 0 END) AS BIGINT) AS covered,
                   CAST((SUM(CASE WHEN rk <= {k} THEN cnt ELSE 0 END)
                         * 1000000 + (SELECT SUM(cnt) FROM ranked) // 2)
                        // (SELECT SUM(cnt) FROM ranked) AS BIGINT)
                       AS coverage_e6
            FROM ranked
            """
        )
    body = " UNION ALL ".join(selects)
    return f"""
        WITH grams AS (
            SELECT t[i] || ' ' || t[i + 1] AS gram
            FROM (SELECT string_split(text, ' ') AS t FROM documents),
                 UNNEST(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
        ),
        counts AS (SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram),
        ranked AS (
            SELECT cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS rk
            FROM counts
        )
        {body}
    """


# ------------------------------------------ per-source length quantiles

LEN_QUANT_PCTS = (50, 90, 99)


def len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, p50, p90, p99) — EXACT discrete (lower) token-
    length order statistics per source: rank(q) = ``(q·(n−1)) div 100
    + 1`` in (n_tokens, doc_id) order, so every quantile is an actual
    document length and ties are deterministic. The per-source length
    profile that drives packing/truncation policy per corpus slice
    (one global curve — ``truncation_loss`` — hides a bimodal mix).

    Plan: one narrow token-count projection, one source-grain window
    rank (sources are the partition key — each source sorts
    independently; at 100 TB a single source IS a corpus, so the
    production swap is the range-partitioned rank of
    ``quality_bands``), then a |sources|-grid conditional aggregate."""
    df = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    w = Window.partitionBy("source").orderBy("n_tok", "doc_id")
    ranked = df.select(
        "source",
        "n_tok",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("source")).alias("n"),
    )
    aggs = [F.max("n").alias("n_docs")]
    for q in LEN_QUANT_PCTS:
        aggs.append(
            F.max(
                F.when(
                    F.col("rn") == F.expr(f"({q} * (n - 1)) div 100 + 1"),
                    F.col("n_tok"),
                )
            ).alias(f"p{q}")
        )
    return ranked.groupBy("source").agg(*aggs)


def duck_len_quantiles() -> str:
    """Oracle: identical rank selection in SQL."""
    picks = ", ".join(
        f"MAX(CASE WHEN rn = ({q} * (n - 1)) // 100 + 1"
        f" THEN n_tok END) AS p{q}"
        for q in LEN_QUANT_PCTS
    )
    return f"""
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ),
        ranked AS (
            SELECT source, n_tok,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY n_tok, doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n
            FROM toks
        )
        SELECT source, MAX(n) AS n_docs, {picks}
        FROM ranked GROUP BY source
    """


# ------------------------------------------ fingerprint collision audit


def fingerprint_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_docs_per_fp, n_fps) — collision census of the joint
    (fp_min, fp_xor) document fingerprint: how many fingerprint values
    are shared by exactly k documents. THE false-merge risk audit for
    fingerprint-keyed dedup — any mass at k ≥ 2 that exceeds the true
    duplicate rate means the 15-bit hash family needs widening before
    the fingerprint becomes a dedup key at corpus scale.

    Plan: reuses the audited fingerprint derivation (the Arrow twin —
    this query forces the values, where the transparent Column form
    pays the interpreted-lambda md5 tax), then one fingerprint-grain
    count and one count onto the k grid — monotonically shrinking
    grains."""
    fp = _doc_fingerprint_arrow(spark, sf_dir)
    per_fp = fp.groupBy("fp_min", "fp_xor").agg(
        F.count("*").alias("n_docs_per_fp")
    )
    return per_fp.groupBy("n_docs_per_fp").agg(F.count("*").alias("n_fps"))


def duck_fingerprint_collisions() -> str:
    """Oracle: the fingerprint CTE re-aggregated to the k grid."""
    return f"""
        WITH fp AS ({duck_fingerprint()}),
        per_fp AS (
            SELECT fp_min, fp_xor, COUNT(*) AS n_docs_per_fp
            FROM fp GROUP BY 1, 2
        )
        SELECT n_docs_per_fp, COUNT(*) AS n_fps
        FROM per_fp GROUP BY 1
    """


# ----------------------------------------- language-ID confusion matrix


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang_true, lang_pred, n_docs) — confusion matrix of the
    ``lang_id`` heuristic against the corpus ground-truth ``lang``
    column. The model-QA table for the language router: per-language
    recall, the und-rate, and every systematic confusion fall straight
    out of this grid — run it per corpus version to catch router
    drift before a mis-routed slice poisons a monolingual model.

    Plan: prediction and truth live on the SAME row (no model⋈truth
    join — the same trick as ``calibration_bins``), so the whole
    operator is one narrow projection + one map-side-combinable count
    onto the |langs|² grid."""
    toks = F.split(F.lower(F.col("text")), " ")
    df = _docs(spark, sf_dir).select(
        "lang", toks.alias("toks")
    )
    for lang, markers in LANG_MARKERS.items():
        df = df.withColumn(f"c_{lang}", _count_in(F.col("toks"), markers))
    best = F.greatest(*[F.col(f"c_{lang}") for lang in LANG_MARKERS])
    n_best = sum(
        F.when(F.col(f"c_{lang}") == best, 1).otherwise(0)
        for lang in LANG_MARKERS
    )
    pred = F.when(best == 0, F.lit("und")).when(n_best > 1, F.lit("und"))
    for lang in LANG_MARKERS:
        pred = pred.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return (
        df.select(F.col("lang").alias("lang_true"), pred.alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


def duck_lang_confusion() -> str:
    """Oracle: reuses the audited ``duck_lang_id`` prediction CTE,
    re-keyed by the ground-truth column (the doc_id join exists only
    oracle-side; the Spark plan keeps truth and prediction on one
    row)."""
    return f"""
        WITH pred AS ({duck_lang_id()})
        SELECT d.lang AS lang_true, p.lang_pred, COUNT(*) AS n_docs
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY 1, 2
    """


# ---------------------------------------------- prefix duplication census

PREFIX_LEN = 32


def prefix_dup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_docs_per_prefix, n_prefixes) — histogram of how many
    documents share each 32-char text prefix. Templated intros
    (boilerplate headers, scraped navigation, form letters) show up as
    mass at k ≥ 2 long before full-document near-dup detection fires —
    this is the cheapest early-warning signal in the dedup family
    (exact-prefix equality, zero hashing), and heavy prefix classes
    are exactly the snm_pairs sort-key collisions that need widening.

    Plan: narrow substr projection → prefix-grain count → k-grid
    count; monotonically shrinking grains, join/window-free."""
    pre = _docs(spark, sf_dir).select(
        F.substring("text", 1, PREFIX_LEN).alias("prefix")
    )
    per = pre.groupBy("prefix").agg(F.count("*").alias("n_docs_per_prefix"))
    return per.groupBy("n_docs_per_prefix").agg(
        F.count("*").alias("n_prefixes")
    )


def duck_prefix_dup_census() -> str:
    """Oracle: identical substr + two-level count."""
    return f"""
        WITH per AS (
            SELECT substr(text, 1, {PREFIX_LEN}) AS prefix,
                   COUNT(*) AS n_docs_per_prefix
            FROM documents GROUP BY 1
        )
        SELECT n_docs_per_prefix, COUNT(*) AS n_prefixes
        FROM per GROUP BY 1
    """


# ----------------------------------------------------- zipf profile


def zipf_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rank_bucket, n_tokens, total_occ) — rank-frequency mass curve
    of the corpus vocabulary in log2-rank buckets (bucket b holds
    ranks [2^b, 2^{b+1})): the Zipf-shape fingerprint. A natural
    corpus puts roughly constant mass per bucket (slope ≈ −1); a
    template-heavy corpus front-loads the first buckets; a
    machine-generated one flattens the tail. Cheap drift detector to
    run per corpus version, complementary to ``gram_coverage`` (which
    sweeps top-k coverage, not the full curve). Ranks tie-break
    deterministically by (count desc, token asc) in both engines;
    ``floor(log2(rank))`` is exact in IEEE at the bucket boundaries
    (powers of two), so the bucketing is engine-stable.

    Plan: the corpus-wide stage is ONE explode + token count;
    everything after runs on the VOCABULARY dimension — a single rank
    window and a count onto the ≤ log2|V| bucket grid. If the vocab
    outgrows one sort at extreme scale, the same two-pass threshold
    select documented for ``gram_coverage`` applies."""
    from pyspark.sql import Window

    toks = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("occ"))
    )
    w = Window.orderBy(F.col("occ").desc(), F.col("tok").asc())
    ranked = toks.select(
        "occ", F.row_number().over(w).alias("rank")
    )
    return (
        ranked.select(
            F.floor(F.log2("rank")).cast("long").alias("rank_bucket"),
            "occ",
        )
        .groupBy("rank_bucket")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("occ").alias("total_occ"),
        )
    )


def duck_zipf_profile() -> str:
    """Oracle: identical rank window and log2 bucketing."""
    return """
        WITH toks AS (
            SELECT tok, COUNT(*) AS occ FROM (
                SELECT UNNEST(string_split(text, ' ')) AS tok
                FROM documents
            ) GROUP BY tok
        ),
        ranked AS (
            SELECT occ, ROW_NUMBER() OVER
                       (ORDER BY occ DESC, tok ASC) AS rank
            FROM toks
        )
        SELECT CAST(FLOOR(LOG2(rank)) AS BIGINT) AS rank_bucket,
               COUNT(*) AS n_tokens, CAST(SUM(occ) AS BIGINT) AS total_occ
        FROM ranked GROUP BY 1
    """


# ----------------------------------------------------- mask census

_MASK_STEPS = "currency", "time", "number", "url"

MASK_PLANT_EVERY = 10  # synthetic corpus carries no organic maskable spans


def mask_census(
    spark: SparkSession, sf_dir: str, plant: bool = True
) -> DataFrame:
    """(mask_type, n_docs, n_hits) — observability for the T4-T8
    normalization chain: per mask type (currency → time → number →
    url, measured in REFERENCE CHAIN ORDER on the progressively
    masked state, exactly as ``normalize_chain`` applies them), how
    many documents contain at least one maskable span and how many
    spans the chain rewrites in total. The drift monitor for the
    text-normalization stage: a corpus refresh that doubles ``url``
    hits changes the token distribution every downstream model sees —
    this table fires before the vocabulary silently shifts. Counting
    on the chain state matters (a digit inside a URL is masked as
    part of the URL step only if the number step didn't eat it first
    — same discipline as ``pii_scrub``'s span counting).

    Plan: one narrow regex projection + one global aggregation
    (single-row shuffle) + a 4-row stack unpivot — scan-speed."""
    from ..functions.text import _TIME_RE, space_tags

    text = F.col("text")
    if plant:
        # deterministic maskable spans on every Nth doc (the pii_scrub
        # plant pattern), so the chain is non-vacuous on the synthetic
        # corpus; expected per planted doc: currency 1, time 1,
        # number 2 (the 5 freed by the currency mask + the 3), url 1
        text = F.when(
            F.col("doc_id") % MASK_PLANT_EVERY == 0,
            F.concat(text, F.lit(" price $5 in 3 days see //x.io/q")),
        ).otherwise(text)
    spaced = space_tags(text)
    # chain states mirror functions.text.normalize_chain exactly
    steps = []
    state = spaced
    # currency: count '$' occurrences, then mask
    steps.append(("currency", F.size(F.split(state, r"\$", -1)) - 1))
    state = F.trim(
        F.regexp_replace(
            F.regexp_replace(state, r"\$", " currency "), r"  +", " "
        )
    )
    # time: reference lowercases first (side effect), then masks units
    state = F.lower(state)
    steps.append(("time", F.size(F.split(state, _TIME_RE, -1)) - 1))
    state = F.regexp_replace(state, _TIME_RE, "time")
    # numbers
    steps.append(("number", F.size(F.split(state, r"\b[0-9]+\b", -1)) - 1))
    state = F.regexp_replace(state, r"\b[0-9]+\b", "0")
    # urls
    steps.append(("url", F.size(F.split(state, r"//\S*", -1)) - 1))
    one = _docs(spark, sf_dir).select(
        *[cnt.alias(f"c_{name}") for name, cnt in steps]
    ).agg(
        *[
            F.sum((F.col(f"c_{name}") > 0).cast("long")).alias(f"d_{name}")
            for name, _ in steps
        ],
        *[
            F.sum(F.col(f"c_{name}").cast("long")).alias(f"h_{name}")
            for name, _ in steps
        ],
    )
    cells = ", ".join(
        f"'{name}', d_{name}, h_{name}" for name, _ in steps
    )
    return one.selectExpr(
        f"stack({len(steps)}, {cells}) AS (mask_type, n_docs, n_hits)"
    )


def duck_mask_census(plant: bool = True) -> str:
    """Oracle: identical plant + chain-state regex counting."""
    from ..functions.text import _TIME_RE

    text = "text"
    if plant:
        text = (
            f"CASE WHEN doc_id % {MASK_PLANT_EVERY} = 0 THEN text"
            " || ' price $5 in 3 days see //x.io/q' ELSE text END"
        )
    spaced = (
        f"trim(regexp_replace(regexp_replace({text},"
        " '(</?e[12]>)', ' \\1 ', 'g'), '  +', ' ', 'g'))"
    )
    state = spaced
    exprs = []
    exprs.append(
        ("currency", f"len(string_split_regex({state}, '\\$')) - 1")
    )
    state = (
        f"trim(regexp_replace(regexp_replace({state}, '\\$',"
        f" ' currency ', 'g'), '  +', ' ', 'g'))"
    )
    state = f"lower({state})"
    exprs.append(
        ("time", f"len(string_split_regex({state}, '{_TIME_RE}')) - 1")
    )
    state = f"regexp_replace({state}, '{_TIME_RE}', 'time', 'g')"
    exprs.append(
        ("number", f"len(string_split_regex({state}, '\\b[0-9]+\\b')) - 1")
    )
    state = f"regexp_replace({state}, '\\b[0-9]+\\b', '0', 'g')"
    exprs.append(
        ("url", f"len(string_split_regex({state}, '//\\S*')) - 1")
    )
    sel = ", ".join(f"({e}) AS c_{n}" for n, e in exprs)
    rows = " UNION ALL ".join(
        f"SELECT '{n}' AS mask_type,"
        f" CAST(SUM(CASE WHEN c_{n} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,"
        f" CAST(SUM(c_{n}) AS BIGINT) AS n_hits FROM flags"
        for n, _e in exprs
    )
    return f"WITH flags AS (SELECT {sel} FROM documents) {rows}"
