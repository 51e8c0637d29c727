"""Mergeable sketches over the corpus: HyperLogLog registers and a
Count-Min sketch — both DETERMINISTIC (built on the portable ``H``
hash, :mod:`..hashing`), so the sketch STATE itself is oracle-checked
bit-for-bit in DuckDB, not just the float estimate derived from it.

Why sketches are first-class at 100 TB: exact ``COUNT(DISTINCT)`` and
exact per-token frequencies need a corpus-sized shuffle; a sketch is a
CONSTANT-size state (64 registers / a 4×128 counter grid here) built
by one map-side-combinable aggregation, and it MERGES — HLL registers
by ``max``, CMS cells by ``+`` — so per-shard/per-day sketches roll up
without re-reading history (the same decomposability argument as
``merge_kg_tables``). Spark's built-in ``approx_count_distinct`` is
HLL++ too, but its register layout isn't reproducible in another
engine; this implementation trades its bias corrections for exact
cross-engine checkability with the standard error still ~1.04/√64.

Estimator floats (harmonic mean, bias ranges) stay OUT of the parity
surface: the driver-checked queries emit the integer register/counter
tables, and the float estimators are pytest-verified against exact
counts in numpy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..hashing import duck_h15, duck_minhash_term, spark_h15, spark_minhash_term
from ..session import read_parquet_cached

HLL_BUCKETS = 64  # p=6; relative error ~ 1.04/sqrt(64) = 13%
HLL_REST_BITS = 54  # H is 60-bit; 6 bits index the bucket

CMS_DEPTH = 4
CMS_WIDTH = 128


def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, bucket, max_rank) — per-source HLL register table for
    distinct-document estimation. ``bucket = H(text) mod 64``; ``rank``
    = leading zeros of the remaining 54 bits + 1 (``55`` for the
    all-zero remainder). One map-side-combinable max-aggregation; the
    result is ≤ 64 rows per group regardless of corpus size."""
    return hll_from_docs(
        read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    )


def hll_from_docs(docs: DataFrame) -> DataFrame:
    h = spark_h15(F.col("text"))
    # h div 64 via shiftright — a float `/` would lose exactness above
    # 2^53 (H is 60-bit); duck's `//` is exact on the oracle side
    rest = F.shiftright(h, 6)
    # bin() renders without leading zeros in BOTH engines, so
    # bit_length(rest) = length(bin(rest)) for rest > 0
    rank = F.when(rest == 0, F.lit(HLL_REST_BITS + 1)).otherwise(
        F.lit(HLL_REST_BITS + 1) - F.length(F.bin(rest))
    )
    return (
        docs.select(
            "source",
            (h % HLL_BUCKETS).cast("int").alias("bucket"),
            rank.cast("int").alias("rank"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def duck_hll_registers() -> str:
    h = duck_h15("text")
    return f"""
        SELECT source,
               CAST(({h}) % {HLL_BUCKETS} AS INT) AS bucket,
               CAST(MAX(CASE WHEN ({h}) // {HLL_BUCKETS} = 0
                             THEN {HLL_REST_BITS + 1}
                             ELSE {HLL_REST_BITS + 1}
                                  - length(bin(({h}) // {HLL_BUCKETS}))
                        END) AS INT) AS max_rank
        FROM documents
        GROUP BY source, CAST(({h}) % {HLL_BUCKETS} AS INT)
    """


def hll_estimate(registers: dict[int, int], m: int = HLL_BUCKETS) -> float:
    """Flajolet et al. 2007 raw estimator with the small-range
    (linear-counting) correction — the float stage, verified in pytest
    against exact distinct counts (the register table itself is the
    driver-checked artifact). ``registers`` maps bucket → max_rank;
    absent buckets are zero."""
    import math

    alpha = 0.709  # alpha_64
    zsum = sum(2.0 ** -registers.get(b, 0) for b in range(m))
    est = alpha * m * m / zsum
    zeros = sum(1 for b in range(m) if registers.get(b, 0) == 0)
    if est <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return est


def cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r, c, cnt) — Count-Min sketch (Cormode & Muthukrishnan 2005)
    over whitespace tokens of the documents table: ``CMS_DEPTH``
    pairwise-independent hash rows (the MinHash universal-hash family,
    reused), ``CMS_WIDTH`` columns. The grid is ≤ 4×128 cells however
    large the corpus — one explode + one map-side-combinable count;
    per-shard grids merge by cell-wise addition."""
    return cms_from_docs(
        read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    )


def cms_from_docs(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("h", spark_h15(F.col("tok")))
    rows = [
        toks.select(
            F.lit(r).alias("r"),
            (spark_minhash_term(F.col("h"), r) % CMS_WIDTH)
            .cast("int")
            .alias("c"),
        )
        for r in range(CMS_DEPTH)
    ]
    import functools

    allrows = functools.reduce(lambda a, b: a.unionByName(b), rows)
    return allrows.groupBy("r", "c").agg(F.count("*").alias("cnt"))


def duck_cms_sketch() -> str:
    h = duck_h15("tok")
    branches = " UNION ALL ".join(
        f"SELECT {r} AS r, CAST(({duck_minhash_term(f'({h})', r)}) % {CMS_WIDTH} AS INT) AS c FROM toks"
        for r in range(CMS_DEPTH)
    )
    return f"""
        WITH toks AS (
            SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
        )
        SELECT r, c, COUNT(*) AS cnt FROM ({branches}) GROUP BY r, c
    """


def cms_query(grid: dict[tuple[int, int], int], token: str) -> int:
    """Point-frequency estimate: min over the token's cells. Never
    under-counts (CMS guarantee); over-counts by at most εN w.h.p."""
    from ..hashing import py_h15, py_minhash_term

    h = py_h15(token)
    return min(
        grid.get((r, py_minhash_term(h, r) % CMS_WIDTH), 0)
        for r in range(CMS_DEPTH)
    )


HH_MIN_THRESHOLD = 25
HH_THRESHOLD_DIV = 200  # threshold = max(25, total_tokens div 200)


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, n) — EXACT counts of every token whose frequency reaches
    ``max(25, total div 200)``, found with the canonical two-pass
    sketch pipeline: pass 1 builds the Count-Min grid (constant-size
    state); pass 2 re-scans and exact-counts ONLY tokens whose CMS
    estimate clears the threshold. CMS never under-counts, so the
    prefilter is LOSSLESS for heavy hitters — but it prunes the long
    tail BEFORE the shuffle, so the aggregation carries rows
    proportional to heavy-token mass instead of the full vocabulary
    (at 100 TB: the difference between shuffling every distinct token
    and shuffling the few thousand that matter). The oracle is the
    brute-force HAVING query — equality IS the losslessness proof."""
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    total = toks.count()
    thr = max(HH_MIN_THRESHOLD, total // HH_THRESHOLD_DIV)
    # the grid is ≤ 4×128 cells — a literal map in the executor closure
    grid = {
        (r, c): n for r, c, n in cms_sketch(spark, sf_dir).collect()
    }
    h = spark_h15(F.col("tok"))
    est = F.least(
        *[
            F.coalesce(
                F.create_map(
                    *[
                        x
                        for (r, c), n in grid.items()
                        if r == row
                        for x in (F.lit(c), F.lit(n))
                    ]
                )[(spark_minhash_term(h, row) % CMS_WIDTH).cast("int")],
                F.lit(0),
            )
            for row in range(CMS_DEPTH)
        ]
    )
    return (
        toks.filter(est >= thr)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= thr)
    )


def duck_heavy_hitters() -> str:
    """Brute-force oracle — the CMS prefilter is lossless by the
    never-under-count guarantee, so plain HAVING matches exactly."""
    return f"""
        WITH toks AS (
            SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents
        ),
        tot AS (SELECT COUNT(*) AS t FROM toks),
        thr AS (SELECT GREATEST({HH_MIN_THRESHOLD},
                                (SELECT t FROM tot) // {HH_THRESHOLD_DIV}) AS v)
        SELECT tok, COUNT(*) AS n
        FROM toks
        GROUP BY tok
        HAVING COUNT(*) >= (SELECT v FROM thr)
    """


# --------------------------------------------------- fixed-bin histogram

HIST_BINS = 64
HIST_BIN_WIDTH = 8  # power of two: value/8 is exact in IEEE double


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, bin, cnt) — per-event-type fixed-bin histogram of
    the ``value`` column: the mergeable quantile/distribution sketch.
    ≤ 64 rows per type however large the feed; per-shard histograms
    merge by cell-wise addition (the same decomposability as the CMS
    grid), and any quantile is answered from the constant-size state
    with error ≤ one bin width (estimator pytest-verified against
    exact numpy quantiles — the float stage stays out of the parity
    surface). One map-side-combinable count aggregation; bin width is
    a power of two so ``value / 8`` is exact in IEEE double in both
    engines (no float-boundary tie hazard)."""
    from ..session import read_parquet_cached

    ev = read_parquet_cached(spark, f"{sf_dir}/events.parquet")
    return histogram_from_events(ev)


def histogram_from_events(events: DataFrame) -> DataFrame:
    b = F.least(
        F.greatest(
            F.floor(F.col("value") / HIST_BIN_WIDTH), F.lit(0)
        ),
        F.lit(HIST_BINS - 1),
    )
    return (
        events.select("event_type", b.cast("int").alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def duck_value_histogram() -> str:
    return f"""
        SELECT event_type,
               CAST(LEAST(GREATEST(FLOOR(value / {HIST_BIN_WIDTH}), 0),
                          {HIST_BINS - 1}) AS INT) AS bin,
               COUNT(*) AS cnt
        FROM events
        GROUP BY 1, 2
    """


def histogram_quantile(bins: dict[int, int], q: float) -> float:
    """Quantile estimate from the integer bin counts (linear
    interpolation within the hit bin) — the float stage, verified in
    pytest against exact quantiles with error ≤ one bin width."""
    total = sum(bins.values())
    if total == 0:
        return 0.0
    target = q * total
    run = 0
    for b in range(HIST_BINS):
        c = bins.get(b, 0)
        if run + c >= target and c > 0:
            frac = (target - run) / c
            return (b + frac) * HIST_BIN_WIDTH
        run += c
    return HIST_BINS * HIST_BIN_WIDTH


# ----------------------------------------------------------------- KMV

KMV_K = 32
KMV_SCOPE_ALL = "__all__"
H_SPACE = 1 << 60  # H() is a 60-bit value


def kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(scope, k_rank, hval) — K-minimum-values (bottom-k) distinct
    sketch (Bar-Yossef et al. 2002 / the Theta-sketch family) over
    ``H(text)``, one scope per document source plus a ``__all__``
    union scope.

    What HLL can't do and KMV can: SET OPERATIONS. Two KMV sketches
    intersect/union by merging their value lists (union = k smallest
    of the merged minima; intersection estimated from the overlap
    inside the union's k-th-value prefix), so cross-shard overlap
    questions ("how many docs do crawl A and crawl B share?") stay
    sketch-sized. Merge law ``kmv(A ∪ B) = merge(kmv(A), kmv(B))``
    is pytest-verified (:mod:`tests.test_sketch`).

    Parity surface is the integer value list itself (the HLL/CMS
    precedent): the float estimator ``(k-1)·2^60 / h_k`` lives in
    :func:`kmv_estimate` and is pytest-checked against exact distinct
    counts. At 100 TB the exact bottom-k is a decomposable aggregate
    (per-partition k minima, then k minima of the ≤ k·P merged
    candidates); this expression uses the distinct + per-scope window
    form, which AQE executes as partial-distinct → one exchange on
    scope — the window sorts only distinct hashes, never the corpus."""
    return kmv_from_docs(
        read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    )


def kmv_from_docs(docs: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    h = spark_h15(F.col("text")).alias("hval")
    per = docs.select(F.col("source").alias("scope"), h)
    both = per.unionByName(
        docs.select(F.lit(KMV_SCOPE_ALL).alias("scope"), h)
    ).distinct()
    win = Window.partitionBy("scope").orderBy("hval")
    return (
        both.withColumn("k_rank", F.row_number().over(win).cast("long"))
        .filter(F.col("k_rank") <= KMV_K)
        .select("scope", "k_rank", "hval")
    )


def duck_kmv_sketch() -> str:
    h = duck_h15("text")
    return f"""
        WITH hv AS (
            SELECT source AS scope, {h} AS hval FROM documents
            UNION ALL
            SELECT '{KMV_SCOPE_ALL}' AS scope, {h} AS hval FROM documents
        ),
        d AS (SELECT DISTINCT scope, hval FROM hv),
        r AS (
            SELECT scope, hval,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY scope ORDER BY hval
                   ) AS BIGINT) AS k_rank
            FROM d
        )
        SELECT scope, k_rank, hval FROM r WHERE k_rank <= {KMV_K}
    """


def kmv_merge(sketches: list[list[int]], k: int = KMV_K) -> list[int]:
    """Merge per-shard KMV value lists: k smallest of the distinct
    union — exact Python bigints (the pytest oracle for the merge
    law and the estimator)."""
    return sorted(set().union(*map(set, sketches)))[:k]


def kmv_estimate(values: list[int], k: int = KMV_K) -> float:
    """(k-1) · 2^60 / h_k when the sketch is full, else the exact
    count (the sketch saw every distinct value)."""
    if len(values) < k:
        return float(len(values))
    return (k - 1) * H_SPACE / values[k - 1]


def kmv_intersection_estimate(
    a: list[int], b: list[int], k: int = KMV_K
) -> float:
    """|A ∩ B| estimate: Jaccard from the overlap inside the k-th
    smallest value of the MERGED sketch, scaled by the union
    estimate (the standard bottom-k set-operation rule)."""
    merged = kmv_merge([a, b], k)
    if not merged:
        return 0.0
    kk = min(k, len(merged))
    prefix = set(merged[:kk])
    inter = len(prefix & set(a) & set(b))
    return inter / kk * kmv_estimate(merged, k)


# ------------------------------------------------- join size estimation

JSE_E6 = 1_000_000


def _cms_key_cells(keys: DataFrame, col: str, alias: str) -> DataFrame:
    """(r, c, <alias>) — CMS grid of a key column under the shared
    pairwise-independent hash family (the cms_sketch machinery applied
    to join keys instead of tokens)."""
    import functools

    hk = keys.select(spark_h15(F.col(col).cast("string")).alias("h"))
    rows = [
        hk.select(
            F.lit(r).alias("r"),
            (spark_minhash_term(F.col("h"), r) % CMS_WIDTH)
            .cast("int")
            .alias("c"),
        )
        for r in range(CMS_DEPTH)
    ]
    return (
        functools.reduce(lambda a, b: a.unionByName(b), rows)
        .groupBy("r", "c")
        .agg(F.count("*").cast("long").alias(alias))
    )


def join_size_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_a, n_b, exact_join, cms_estimate, overest_e6) — equi-join
    CARDINALITY estimation, the cost-based-optimizer input: exact
    |A ⋈ B on user_id| = Σ_k aₖ·bₖ for the two event-id-parity halves
    of the events feed, against the AMS/CMS inner-product estimate
    min_d Σ_w A_d[w]·B_d[w] (Alon-Matias-Szegedy via the CMS grids).

    Why an engine wants it: Σ aₖ·bₖ is what decides shuffle-vs-
    broadcast and detects join blowups BEFORE running the join, and
    the CMS form needs only two 4×128 grids — mergeable, maintainable
    as table statistics — while the exact form scans both sides. The
    estimate NEVER under-counts (collisions only add mass), so it is
    a safe upper bound for planning; ``overest_e6`` measures the
    looseness on this feed (the minhash_error / ann_recall
    "measure the sketch" discipline).

    Plan: per-key count aggregates (map-side combinable) + key-grain
    join for the exact side; two CMS grids (≤ 512 cells each) + a
    cell equi-join for the estimate. All BIGINT."""
    ev = read_parquet_cached(spark, f"{sf_dir}/events.parquet")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    ak = a.groupBy("user_id").agg(F.count("*").cast("long").alias("an"))
    bk = b.groupBy("user_id").agg(F.count("*").cast("long").alias("bn"))
    exact = ak.join(bk, "user_id").agg(
        F.coalesce(F.sum(F.col("an") * F.col("bn")), F.lit(0))
        .cast("long")
        .alias("exact_join")
    )
    ca = _cms_key_cells(a, "user_id", "an")
    cb = _cms_key_cells(b, "user_id", "bn")
    est = (
        ca.join(cb, ["r", "c"])
        .groupBy("r")
        .agg(F.sum(F.col("an") * F.col("bn")).cast("long").alias("dot"))
        .agg(
            F.coalesce(F.min("dot"), F.lit(0))
            .cast("long")
            .alias("cms_estimate")
        )
    )
    na = a.agg(F.count("*").cast("long").alias("n_a"))
    nb = b.agg(F.count("*").cast("long").alias("n_b"))
    return (
        na.crossJoin(nb)
        .crossJoin(exact)
        .crossJoin(est)
        .withColumn(
            "overest_e6",
            F.expr(
                "CASE WHEN exact_join > 0 THEN"
                f" (cms_estimate - exact_join) * {JSE_E6} div exact_join"
                " ELSE 0 END"
            ).cast("long"),
        )
    )


def duck_join_size_est() -> str:
    h = duck_h15("CAST(user_id AS VARCHAR)")
    grids = []
    for side, par in (("a", 0), ("b", 1)):
        branches = " UNION ALL ".join(
            f"SELECT {r} AS r,"
            f" CAST(({duck_minhash_term(f'({h})', r)}) % {CMS_WIDTH} AS INT)"
            f" AS c FROM events WHERE event_id % 2 = {par}"
            for r in range(CMS_DEPTH)
        )
        grids.append(
            f"cms_{side} AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n"
            f" FROM ({branches}) GROUP BY r, c)"
        )
    return f"""
        WITH ak AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS an
            FROM events WHERE event_id % 2 = 0 GROUP BY user_id
        ),
        bk AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS bn
            FROM events WHERE event_id % 2 = 1 GROUP BY user_id
        ),
        ex AS (
            SELECT CAST(COALESCE(SUM(an * bn), 0) AS BIGINT) AS exact_join
            FROM ak JOIN bk USING (user_id)
        ),
        {grids[0]},
        {grids[1]},
        dots AS (
            SELECT a.r, CAST(SUM(a.n * b.n) AS BIGINT) AS dot
            FROM cms_a a JOIN cms_b b ON a.r = b.r AND a.c = b.c
            GROUP BY a.r
        ),
        est AS (SELECT CAST(COALESCE(MIN(dot), 0) AS BIGINT)
                AS cms_estimate FROM dots),
        na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a FROM events
               WHERE event_id % 2 = 0),
        nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b FROM events
               WHERE event_id % 2 = 1)
        SELECT n_a, n_b, exact_join, cms_estimate,
               CAST(CASE WHEN exact_join > 0 THEN
                    (cms_estimate - exact_join) * {JSE_E6} // exact_join
                    ELSE 0 END AS BIGINT) AS overest_e6
        FROM na, nb, ex, est
    """
