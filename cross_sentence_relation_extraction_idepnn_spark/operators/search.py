"""Corpus-statistics ranking for the training-data pipeline: BM25
retrieval over an inverted-posting join, and bigram-LM scoring (the
CCNet-style "score each document against a corpus language model"
quality signal).

Both operators are exact-arithmetic by construction so the DuckDB
oracle hash-matches: every weight is a ratio of BIGINTs, half-up
rounded to integer micro-units (1e-6) BEFORE any aggregation, so the
aggregate is an order-independent integer sum — float summation order
(Spark partial aggs vs DuckDB single-threaded) can never flip a
rounded digit or a rank. This is the same integer-units discipline as
``textstats.quality_score`` and the PageRank fixed-point
(``linking.kg_pagerank``).

BM25 constants are baked in as exact rationals: k1 = 1.2 = 6/5 and
b = 0.75 = 3/4, so the per-term weight

    idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

clears denominators to pure BIGINT algebra (``tf_num = 44*tf*A``,
``tf_den = 20*tf*A + 6*A + 18*dl`` with A the half-up integer avgdl).
The classic ``ln`` idf is replaced by its rational argument
``(N - df + 0.5)/(df + 0.5)`` — a strictly monotonic surrogate
(log deferred to a presentation layer) so cross-engine libm
differences cannot exist. Scores are reported in integer micro-units
(``score_e6``).

100 TB shape: the corpus is never scored wholesale — the exploded
token stream is semi-joined against the (tiny, broadcast) query-term
set FIRST, so only matching posting lists flow into tf/df aggregation;
df and the query map ride back as broadcasts. Corpus size N / total
length L are one aggregate pass here; a production deployment keeps
them as maintained table statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_parquet_cached

N_QUERY_DOCS = 8  # the N_QUERY_DOCS smallest doc_ids pose the queries
QUERY_TOKEN_POS0 = (0, 2, 4, 6, 8)  # 0-based token positions per query doc
TOP_K = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_cached(spark, f"{sf_dir}/documents.parquet")


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(F.col("text"), " ")
    return _docs(spark, sf_dir).select(
        "doc_id", toks.alias("toks"), F.size(toks).cast("long").alias("dl")
    )


def _qterms(base: DataFrame) -> DataFrame:
    """Corpus-derived query-term set (query_id, term) — shared by the
    BM25 and overlap rankers."""
    return (
        base.filter(F.col("doc_id") < N_QUERY_DOCS)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array(*[F.get("toks", p) for p in QUERY_TOKEN_POS0])
            ).alias("term"),
        )
        .where(F.col("term").isNotNull())
        .distinct()
    )


def _postings(base: DataFrame, qterms: DataFrame) -> DataFrame:
    """(doc_id, term, dl, tf) — the ONE corpus pass both rankers need:
    exploded tokens semi-joined against the broadcast query-term set,
    then tf-aggregated. (doc, term)-unique by construction.

    Persisted (query-matched postings only — KB-sized, never the
    corpus): df derivation, BM25 weighting, and the conjunctive gold
    of :func:`retrieval_eval` all reuse this subtree, and without the
    persist each consumer would re-explode the corpus."""
    from pyspark.storagelevel import StorageLevel

    from ..session import track_cache

    return track_cache(
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _bm25_rank(base: DataFrame, qterms: DataFrame, postings: DataFrame) -> DataFrame:
    """BM25 integer-microunit scoring + per-query top-k over a postings
    table (see module docstring for the exact-rational algebra)."""
    n_docs, total_len = base.agg(
        F.count("*").cast("long"), F.sum("dl").cast("long")
    ).first()
    avgdl = (2 * int(total_len) + int(n_docs)) // (2 * int(n_docs))  # half-up
    dfreq = postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_lit = F.lit(int(n_docs)).cast("long")
    a_lit = F.lit(avgdl).cast("long")
    w = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .withColumn("_idf_num", 2 * n_lit - 2 * F.col("df") + 1)
        .withColumn("_idf_den", 2 * F.col("df") + 1)
        .withColumn("_tf_num", 44 * F.col("tf") * a_lit)
        .withColumn(
            "_tf_den", 20 * F.col("tf") * a_lit + 6 * a_lit + 18 * F.col("dl")
        )
        .withColumn(
            "_idf6", F.expr("(_idf_num * 2000000 + _idf_den) div (2 * _idf_den)")
        )
        .withColumn(
            "_tf6", F.expr("(_tf_num * 2000000 + _tf_den) div (2 * _tf_den)")
        )
        .withColumn("_w12", F.col("_idf6") * F.col("_tf6"))
    )
    scores = w.groupBy("query_id", "doc_id").agg(
        F.expr("(sum(_w12) + 500000) div 1000000").alias("score_e6")
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("score_e6").desc(), F.col("doc_id")
    )
    return (
        scores.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "doc_id", "score_e6")
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rnk, doc_id, score_e6): BM25 top-``TOP_K`` docs per
    query, exact integer micro-unit scores, ties broken by doc_id.

    Queries are derived from the corpus itself (no external data): the
    ``N_QUERY_DOCS`` smallest doc_ids each contribute their distinct
    tokens at positions ``QUERY_TOKEN_POS0``.

    Plan: one stats aggregate (N docs, total length L → integer avgdl
    A), then explode → broadcast semi-join on the query-term set →
    tf groupBy → df from the surviving postings → broadcast df + query
    map back on → integer weight → sum → per-query top-k window. The
    only wide exchanges are the tf groupBy (keyed on (doc,term), no
    skew: term set is tiny and pre-filtered) and the final per-query
    window over candidate docs."""
    base = _base(spark, sf_dir)
    qterms = _qterms(base)
    return _bm25_rank(base, qterms, _postings(base, qterms))


def duck_bm25() -> str:
    """Same BIGINT algebra; `//` is floor which equals half-up round
    here because every numerator/denominator is positive."""
    ctes, final = _duck_bm25_parts()
    return f"WITH {ctes}\n{final}"


def _duck_bm25_parts() -> tuple[str, str]:
    """(CTE chain, final SELECT) — split so :func:`duck_retrieval_eval`
    can reuse the ranking as a named CTE."""
    pos = ", ".join(f"toks[{p + 1}]" for p in QUERY_TOKEN_POS0)  # 1-based
    ctes = f"""base AS (
            SELECT doc_id, string_split(text, ' ') AS toks,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
            FROM documents
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS l
            FROM base
        ),
        avgs AS (SELECT n, (2 * l + n) // (2 * n) AS a FROM stats),
        qt AS (
            SELECT DISTINCT doc_id AS query_id, t AS term
            FROM (
                SELECT doc_id, UNNEST([{pos}]) AS t
                FROM base WHERE doc_id < {N_QUERY_DOCS}
            )
            WHERE t IS NOT NULL
        ),
        posts AS (
            SELECT doc_id, dl, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, dl, UNNEST(toks) AS t FROM base)
            WHERE t IN (SELECT term FROM qt)
            GROUP BY doc_id, dl, t
        ),
        dfreq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM posts GROUP BY term
        ),
        w AS (
            SELECT q.query_id, p.doc_id,
                   ((2*a.n - 2*d.df + 1) * 2000000 + (2*d.df + 1))
                       // (2 * (2*d.df + 1)) AS idf6,
                   (44*p.tf*a.a * 2000000 + (20*p.tf*a.a + 6*a.a + 18*p.dl))
                       // (2 * (20*p.tf*a.a + 6*a.a + 18*p.dl)) AS tf6
            FROM posts p
            JOIN dfreq d USING (term)
            JOIN qt q USING (term)
            CROSS JOIN avgs a
        ),
        s AS (
            SELECT query_id, doc_id,
                   CAST((SUM(idf6 * tf6) + 500000) // 1000000 AS BIGINT) AS score_e6
            FROM w GROUP BY query_id, doc_id
        )"""
    final = f"""
        SELECT query_id, rnk, doc_id, score_e6
        FROM (
            SELECT query_id, doc_id, score_e6,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY score_e6 DESC, doc_id
                   ) AS BIGINT) AS rnk
            FROM s
        )
        WHERE rnk <= {TOP_K}
    """
    return ctes, final


def lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, mean_p6, min_p6): score every document under
    a Laplace-smoothed bigram model of the corpus itself —
    P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V) with V the distinct-token
    vocabulary size. Each conditional probability is half-up rounded
    to integer micro-units BEFORE the per-doc mean, so the output is
    exact; ``mean_p6`` is the arithmetic-mean fixed-point surrogate for
    perplexity (the log/geometric-mean transform is presentation-layer
    — it is per-value monotonic and adds nothing to the filtering
    decision), ``min_p6`` is the most surprising bigram. Documents with
    fewer than two tokens have no bigrams and no row.

    100 TB shape: bigram counts are one groupBy (map-side combinable);
    the left-context totals derive from the bigram table (no second
    corpus pass); scoring is two equi-joins on (w1,w2)/(w1) — the
    count tables are vocabulary-sized, far below corpus-sized, and a
    production run would persist them as a reusable model artifact."""
    base = _base(spark, sf_dir)
    vocab = base.select(F.explode("toks").alias("t")).distinct().count()

    n1 = F.col("dl") - 1
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("toks", 1, n1),
                F.slice("toks", 2, n1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")

    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))

    p = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .withColumn("_den", F.col("c1") + F.lit(int(vocab)).cast("long"))
        .withColumn(
            "p6", F.expr("((c2 + 1) * 2000000 + _den) div (2 * _den)")
        )
    )
    return p.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.expr("(2 * sum(p6) + count(*)) div (2 * count(*))").alias("mean_p6"),
        F.min("p6").alias("min_p6"),
    )


def duck_lm_score() -> str:
    return """
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        big AS (
            SELECT doc_id, toks[CAST(i AS INT)] AS w1,
                   toks[CAST(i AS INT) + 1] AS w2
            FROM (
                SELECT doc_id, toks, UNNEST(range(1, len(toks))) AS i FROM base
            )
        ),
        c2 AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
            FROM big GROUP BY w1, w2
        ),
        c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
        v AS (
            SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
            FROM (SELECT UNNEST(toks) AS t FROM base)
        ),
        p AS (
            SELECT b.doc_id,
                   ((c2.c2 + 1) * 2000000 + (c1.c1 + v.v))
                       // (2 * (c1.c1 + v.v)) AS p6
            FROM big b
            JOIN c2 USING (w1, w2)
            JOIN c1 USING (w1)
            CROSS JOIN v
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST((2 * SUM(p6) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS mean_p6,
               MIN(p6) AS min_p6
        FROM p GROUP BY doc_id
    """


RRF_K = 60


def overlap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rnk, doc_id, n_overlap): the second retrieval signal
    for hybrid fusion — per query, the top-``TOP_K`` docs by count of
    DISTINCT query terms present in the document (exact integer; ties
    by doc_id). Same corpus-derived query set as :func:`bm25_topk`.

    Plan: the SAME postings table as BM25 (exploded tokens →
    broadcast-query-semi-join → tf groupBy; (doc, term)-unique by
    construction, so counting its rows per (query, doc) IS the
    distinct-term overlap); one map-side-combinable aggregation over
    the tiny surviving postings."""
    base = _base(spark, sf_dir)
    qterms = _qterms(base)
    return _overlap_rank(qterms, _postings(base, qterms))


def _overlap_rank(qterms: DataFrame, postings: DataFrame) -> DataFrame:
    hits = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("n_overlap").desc(), F.col("doc_id")
    )
    return (
        hits.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "doc_id", "n_overlap")
    )


def duck_overlap() -> str:
    pos = ", ".join(f"toks[{p + 1}]" for p in QUERY_TOKEN_POS0)
    return f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        qt AS (
            SELECT DISTINCT doc_id AS query_id, t AS term
            FROM (
                SELECT doc_id, UNNEST([{pos}]) AS t
                FROM base WHERE doc_id < {N_QUERY_DOCS}
            )
            WHERE t IS NOT NULL
        ),
        hits AS (
            SELECT q.query_id, d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
            FROM (SELECT doc_id, UNNEST(list_distinct(toks)) AS term FROM base) d
            JOIN qt q USING (term)
            GROUP BY q.query_id, d.doc_id
        )
        SELECT query_id, rnk, doc_id, n_overlap
        FROM (
            SELECT query_id, doc_id, n_overlap,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY n_overlap DESC, doc_id
                   ) AS BIGINT) AS rnk
            FROM hits
        )
        WHERE rnk <= {TOP_K}
    """


def hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rnk, doc_id, rrf_e6): Reciprocal-Rank Fusion
    (Cormack et al. 2009) of the BM25 and distinct-term-overlap
    top-``TOP_K`` lists — the standard hybrid-retrieval combiner for
    lexical + second-signal rankers. Contribution per list is the
    exact integer ``1e6 div (60 + rank)``; docs absent from a list
    contribute 0; final ties by doc_id.

    Plan: the corpus is touched ONCE — both rankers read the same
    persisted postings table (the overlap count is derivable from
    BM25's postings because it is (doc, term)-unique), so hybrid costs
    one corpus explode + two tiny ranking subtrees instead of two full
    corpus passes. Fusion then runs on the two top-k LISTS (≤ 2·K rows
    per query — constant-bounded however large the corpus): a union +
    one tiny aggregation + the final per-query window."""
    from pyspark.storagelevel import StorageLevel

    from ..session import track_cache

    base = _base(spark, sf_dir)
    qterms = _qterms(base)
    postings = track_cache(
        _postings(base, qterms).persist(StorageLevel.MEMORY_AND_DISK)
    )
    contrib = F.expr(f"1000000 div ({RRF_K} + rnk)").alias("c")
    fused = (
        _bm25_rank(base, qterms, postings)
        .select("query_id", "doc_id", contrib)
        .unionByName(
            _overlap_rank(qterms, postings).select("query_id", "doc_id", contrib)
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("rrf_e6"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("rrf_e6").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(win).cast("long"))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "doc_id", "rrf_e6")
    )


def duck_hybrid() -> str:
    """Oracle: the two ranker chains nested as CTEs + the same integer
    RRF recurrence."""
    return f"""
        WITH bm AS MATERIALIZED ({duck_bm25()}),
        ov AS MATERIALIZED ({duck_overlap()}),
        fused AS (
            SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_e6
            FROM (
                SELECT query_id, doc_id, 1000000 // ({RRF_K} + rnk) AS c FROM bm
                UNION ALL
                SELECT query_id, doc_id, 1000000 // ({RRF_K} + rnk) AS c FROM ov
            )
            GROUP BY query_id, doc_id
        )
        SELECT query_id, rnk, doc_id, rrf_e6
        FROM (
            SELECT query_id, doc_id, rrf_e6,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY rrf_e6 DESC, doc_id
                   ) AS BIGINT) AS rnk
            FROM fused
        )
        WHERE rnk <= {TOP_K}
    """


COLL_MIN_COUNT = 5
COLL_TOP = 50


def collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rnk, w1, w2, c2, lift_e6): the corpus's top-``COLL_TOP``
    collocations — adjacent token pairs ranked by exact-integer LIFT
    against their positional marginals (same monotone-in-PMI two-step
    floor-division contract as ``linking.kg_edge_lift``), with a
    ``COLL_MIN_COUNT`` support floor so hapax pairs can't dominate.
    The classic phrase-mining signal (Mikolov-style phrase joining
    uses exactly this statistic) for tokenizer/vocab curation.

    Plan: one bigram groupBy (map-side combinable) builds c2; both
    marginals and the total derive FROM c2 (vocabulary-sized — no
    second corpus pass); marginals broadcast back on; the global
    top-k is a distributed TakeOrdered over the min-count survivors —
    the corpus is touched exactly once."""
    base = _base(spark, sf_dir)
    n1 = F.col("dl") - 1
    bigrams = base.select(
        F.explode(
            F.zip_with(
                F.slice("toks", 1, n1),
                F.slice("toks", 2, n1),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    cr = c2.groupBy("w2").agg(F.sum("c2").alias("cr"))
    total = c2.agg(F.sum("c2")).collect()[0][0]
    lift = F.expr(f"((c2 * 1000000) div c1) * {int(total)} div cr").cast("long")
    ranked = (
        c2.filter(F.col("c2") >= COLL_MIN_COUNT)
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(cr), "w2")
        .select("w1", "w2", "c2", lift.alias("lift_e6"))
        .orderBy(F.col("lift_e6").desc(), "w1", "w2")
        .limit(COLL_TOP)
    )
    win = Window.orderBy(F.col("lift_e6").desc(), "w1", "w2")
    return ranked.select(
        F.row_number().over(win).cast("long").alias("rnk"),
        "w1",
        "w2",
        "c2",
        "lift_e6",
    )


def duck_collocations() -> str:
    return f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        big AS (
            SELECT toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
            FROM (SELECT doc_id, toks, UNNEST(range(1, len(toks))) AS i FROM base)
        ),
        c2 AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
            FROM big GROUP BY w1, w2
        ),
        c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
        cr AS (SELECT w2, SUM(c2) AS cr FROM c2 GROUP BY w2),
        tot AS (SELECT SUM(c2) AS t FROM c2),
        ranked AS (
            SELECT c2.w1, c2.w2, c2.c2,
                   CAST(((c2.c2 * 1000000) // c1.c1)
                        * (SELECT t FROM tot) // cr.cr AS BIGINT) AS lift_e6
            FROM c2
            JOIN c1 USING (w1)
            JOIN cr USING (w2)
            WHERE c2.c2 >= {COLL_MIN_COUNT}
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY lift_e6 DESC, w1, w2) AS BIGINT)
                   AS rnk,
               w1, w2, c2, lift_e6
        FROM ranked
        ORDER BY lift_e6 DESC, w1, w2
        LIMIT {COLL_TOP}
    """


# ------------------------------------------------------ retrieval eval

MRR_E6 = 1_000_000


def retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_rel, hits, first_rank, mrr_e6, p_at_k_e6,
    r_at_k_e6) — ranking-quality evaluation of the BM25 top-k against
    a corpus-derived boolean gold: a document is RELEVANT to a query
    iff it contains ALL the query's terms (conjunctive relevance — the
    exact-match labels a retrieval harness derives when no human
    judgments exist).

    Exact-integer metric surface (the ``ann_recall``/``ivf_recall``
    precedent extended to graded ranking): reciprocal rank, P@k and
    R@k are emitted in integer micro-units via BIGINT floor division
    — IEEE log-free, so the oracle hash-matches. nDCG is deliberately
    NOT emitted: its log2 discount is not exact-rational, and MRR +
    P@k + R@k dominate it for conjunctive (binary) gold.

    100 TB shape: gold reuses the SAME posting pass BM25 ranks with
    (one corpus scan total — the semi-joined postings table feeds
    both), per-query term counts and the gold set ride as broadcasts,
    and everything after the postings groupBy is query-grain
    (#queries × k rows)."""
    base = _base(spark, sf_dir)
    qterms = _qterms(base)
    posts = _postings(base, qterms)
    nq = qterms.groupBy("query_id").agg(
        F.count_distinct("term").alias("n_terms")
    )
    gold = (
        posts.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").alias("n_match"))
        .join(F.broadcast(nq), "query_id")
        .filter(F.col("n_match") == F.col("n_terms"))
        .select("query_id", "doc_id")
    )
    topk = _bm25_rank(base, qterms, posts)
    scored = topk.join(
        gold.withColumn("rel", F.lit(1)), ["query_id", "doc_id"], "left"
    )
    per_q = scored.groupBy("query_id").agg(
        F.sum(F.coalesce(F.col("rel"), F.lit(0))).cast("long").alias("hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("_fr"),
    )
    nrel = gold.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_rel")
    )
    return (
        per_q.join(nrel, "query_id", "left")
        .withColumn("n_rel", F.coalesce(F.col("n_rel"), F.lit(0)).cast("long"))
        .withColumn(
            "first_rank", F.coalesce(F.col("_fr"), F.lit(0)).cast("long")
        )
        .withColumn(
            "mrr_e6",
            F.expr(
                f"CASE WHEN first_rank > 0 THEN {MRR_E6} div first_rank"
                " ELSE 0 END"
            ).cast("long"),
        )
        .withColumn(
            "p_at_k_e6", F.expr(f"hits * {MRR_E6} div {TOP_K}").cast("long")
        )
        .withColumn(
            "r_at_k_e6",
            F.expr(
                f"CASE WHEN n_rel > 0 THEN hits * {MRR_E6} div n_rel"
                " ELSE 0 END"
            ).cast("long"),
        )
        .select(
            "query_id", "n_rel", "hits", "first_rank",
            "mrr_e6", "p_at_k_e6", "r_at_k_e6",
        )
    )


def duck_retrieval_eval() -> str:
    """Oracle: the shared BM25 CTE chain + the same conjunctive gold
    and integer metric algebra."""
    ctes, final = _duck_bm25_parts()
    return f"""
        WITH {ctes},
        topk AS ({final}),
        nq AS (
            SELECT query_id, COUNT(DISTINCT term) AS n_terms
            FROM qt GROUP BY query_id
        ),
        gold AS (
            SELECT m.query_id, m.doc_id
            FROM (
                SELECT q.query_id, p.doc_id,
                       COUNT(DISTINCT p.term) AS n_match
                FROM posts p JOIN qt q USING (term)
                GROUP BY q.query_id, p.doc_id
            ) m
            JOIN nq USING (query_id)
            WHERE m.n_match = nq.n_terms
        ),
        per_q AS (
            SELECT t.query_id,
                   CAST(SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS hits,
                   MIN(CASE WHEN g.doc_id IS NOT NULL THEN t.rnk END) AS _fr
            FROM topk t
            LEFT JOIN gold g
              ON g.query_id = t.query_id AND g.doc_id = t.doc_id
            GROUP BY t.query_id
        ),
        nrel AS (
            SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel
            FROM gold GROUP BY query_id
        )
        SELECT p.query_id,
               CAST(COALESCE(r.n_rel, 0) AS BIGINT) AS n_rel,
               p.hits,
               CAST(COALESCE(p._fr, 0) AS BIGINT) AS first_rank,
               CAST(CASE WHEN p._fr IS NOT NULL THEN {MRR_E6} // p._fr
                         ELSE 0 END AS BIGINT) AS mrr_e6,
               CAST(p.hits * {MRR_E6} // {TOP_K} AS BIGINT) AS p_at_k_e6,
               CAST(CASE WHEN COALESCE(r.n_rel, 0) > 0
                         THEN p.hits * {MRR_E6} // r.n_rel
                         ELSE 0 END AS BIGINT) AS r_at_k_e6
        FROM per_q p LEFT JOIN nrel r USING (query_id)
    """


# ------------------------------------------------------- phrase search

PHRASE_LEN = 3  # reuses the dedup family's 3-gram convention


def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, n_hits) — exact phrase retrieval: documents
    containing the query phrase as a CONSECUTIVE token run, with the
    occurrence count. Complements :func:`bm25_topk` (bag-of-words):
    phrase match is the query class a term-frequency index cannot
    answer.

    Queries are corpus-derived (the bm25 convention): each of the
    ``N_QUERY_DOCS`` smallest doc_ids poses its own first
    ``PHRASE_LEN`` tokens as the phrase.

    Index shape, not scan shape: the corpus is mapped ONCE to
    positional trigram postings (per-row ``transform`` over the token
    array — the dedup shingle pass WITH multiplicity), semi-joined
    against the broadcast phrase set, and counted per (query, doc).
    At 100 TB the trigram postings ARE the phrase index a search tier
    materializes; the per-query cost after the one corpus pass is a
    broadcast equi-join, never a re-scan. A substring LIKE scan gives
    the same answer semantics at full-scan cost — pinned equivalent in
    tests."""
    toks = F.split(F.col("text"), " ")
    grams = F.when(
        F.size(toks) >= PHRASE_LEN,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (PHRASE_LEN - 1)),
            lambda i: F.array_join(F.slice(toks, i, PHRASE_LEN), " "),
        ),
    ).otherwise(F.array())
    docs = _docs(spark, sf_dir)
    phrases = (
        docs.filter(
            (F.col("doc_id") < N_QUERY_DOCS)
            & (F.size(toks) >= PHRASE_LEN)
        )
        .select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, PHRASE_LEN), " ").alias("gram"),
        )
    )
    postings = docs.select("doc_id", F.explode(grams).alias("gram"))
    return (
        postings.join(F.broadcast(phrases), "gram")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def duck_phrase_search() -> str:
    n = PHRASE_LEN
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        grams AS (
            SELECT doc_id,
                   UNNEST(CASE WHEN len(ws) >= {n}
                        THEN list_transform(range(1, len(ws) - {n - 2}),
                             i -> array_to_string(ws[i : i + {n - 1}], ' '))
                        ELSE [] END) AS gram
            FROM toks
        ),
        phrases AS (
            SELECT doc_id AS query_id,
                   array_to_string(ws[1 : {n}], ' ') AS gram
            FROM toks
            WHERE doc_id < {N_QUERY_DOCS} AND len(ws) >= {n}
        )
        SELECT p.query_id, g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM grams g JOIN phrases p USING (gram)
        GROUP BY p.query_id, g.doc_id
    """
