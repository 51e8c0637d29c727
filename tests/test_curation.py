

def test_bloom_prefilter_lossless_and_consistent_with_decontaminate(
    spark, sf_dir
):
    """The Bloom pre-filter can never miss: n_exact <= n_candidates on
    every doc (no false negatives), the exact counts agree with
    decontaminate's boolean (n_exact > 0 <=> contaminated), and the
    filter is non-vacuous both ways — some candidates are rejected by
    the exact join (false positives exist at m=4096) and most grams
    are screened out without any exact-join work."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        bloom_prefilter,
        decontaminate,
    )

    rows = bloom_prefilter(spark, sf_dir).collect()
    assert all(r["n_exact"] <= r["n_candidates"] for r in rows)
    assert all(
        r["n_fp"] == r["n_candidates"] - r["n_exact"] for r in rows
    )
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(spark, sf_dir).collect()
    }
    assert {r["doc_id"] for r in rows} == set(flags)
    for r in rows:
        assert (r["n_exact"] > 0) == flags[r["doc_id"]], r["doc_id"]
    total_g = sum(r["n_grams"] for r in rows)
    total_c = sum(r["n_candidates"] for r in rows)
    total_fp = sum(r["n_fp"] for r in rows)
    assert total_fp > 0, "FP measurement vacuous at this m"
    assert total_c < total_g * 0.5, "pre-filter screened out too little"


def test_reservoir_sample_exact_k_and_two_phase_equals_naive(spark, sf_dir):
    """Exactly min(k, |stratum|) rows per source, ranks dense from 1,
    and the salted two-phase bottom-k returns the SAME panel as a
    naive single per-source window (the decomposability law the scale
    guard relies on)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        RESERVOIR_K,
        reservoir_sample,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import (
        read_parquet_cached,
    )

    got = reservoir_sample(spark, sf_dir).collect()
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    sizes = {r.source: r.cnt for r in docs.groupBy("source").agg(
        F.count("*").alias("cnt")).collect()}
    per = {}
    for r in got:
        per.setdefault(r.source, []).append((r.rnk, r.doc_id))
    for src, rows in per.items():
        assert len(rows) == min(RESERVOIR_K, sizes[src])
        assert sorted(rnk for rnk, _ in rows) == list(range(1, len(rows) + 1))
    w = Window.partitionBy("source").orderBy(
        spark_h15(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = (
        docs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= RESERVOIR_K)
        .select("source", "rnk", "doc_id")
        .collect()
    )
    assert {tuple(r) for r in got} == {tuple(r) for r in naive}


def test_novelty_score_crafted_regimes(spark, tmp_path):
    """Reference docs (hash-even half) score novelty 0 by definition;
    an unseen doc that copies a reference doc scores 0; a fully unique
    unseen doc scores 1e6; a half-known doc lands at the hand-computed
    fraction."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.hashing import py_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        novelty_score,
    )

    ref_text = "r1 r2 r3 r4 r5 r6"          # shingles: r1r2r3..r4r5r6 (4)
    half_text = "r1 r2 r3 u1 u2 u3"         # 1 known shingle of 4
    uniq_text = "u4 u5 u6 u7"
    # pick ids on each side of the hash split
    evens = [i for i in range(200) if py_h15(str(i)) % 2 == 0]
    odds = [i for i in range(200) if py_h15(str(i)) % 2 == 1]
    rows = [
        (evens[0], ref_text),
        (odds[0], ref_text),   # copy of a reference doc
        (odds[1], half_text),
        (odds[2], uniq_text),
    ]
    path = str(tmp_path / "docs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {r.doc_id: r for r in novelty_score(spark, path).collect()}
    assert got[evens[0]].novelty_e6 == 0
    assert got[odds[0]].novelty_e6 == 0
    assert (got[odds[1]].n_shingles, got[odds[1]].n_known) == (4, 1)
    assert got[odds[1]].novelty_e6 == 750_000
    assert got[odds[2]].novelty_e6 == 1_000_000


def test_weighted_sample_favors_heavy_docs_and_matches_naive(spark, sf_dir):
    """The integer A-ES key must (a) reproduce the naive single-window
    selection exactly (two-phase decomposability), (b) produce a panel
    whose mean weight exceeds the corpus mean (heavier docs get
    smaller keys — the importance-sampling property), and (c) emit
    exactly min(k, |stratum|) dense-ranked rows per source."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        WEIGHTED_K,
        weighted_sample,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import (
        read_parquet_cached,
    )

    got = weighted_sample(spark, sf_dir).collect()
    docs = read_parquet_cached(spark, f"{sf_dir}/documents.parquet")
    per: dict = {}
    for r in got:
        per.setdefault(r.source, []).append(r)
    sizes = {r.source: r.cnt for r in docs.groupBy("source").agg(
        F.count("*").alias("cnt")).collect()}
    for src, rows in per.items():
        assert len(rows) == min(WEIGHTED_K, sizes[src])
        assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    w = Window.partitionBy("source").orderBy(
        F.expr("hval div weight"), "doc_id"
    )
    naive = (
        docs.select(
            "source", "doc_id",
            F.greatest(F.col("n_chars").cast("long"), F.lit(1)).alias("weight"),
            spark_h15(F.col("doc_id").cast("string")).alias("hval"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= WEIGHTED_K)
        .select("source", "rnk", "doc_id", "weight")
        .collect()
    )
    assert {tuple(r) for r in got} == {tuple(r) for r in naive}


def test_weighted_sample_importance_property_crafted(spark, tmp_path):
    """One source, 50 docs at weight 10000 and 50 at weight 10
    (1000× mass ratio): the k=10 panel must be dominated by heavy
    docs — deterministic given the fixed hash keys."""
    import os

    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        weighted_sample,
    )

    rows = [
        (i, "t", "en", "A", 10000 if i % 2 == 0 else 10) for i in range(100)
    ]
    path = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    got = weighted_sample(spark, path, k=10).collect()
    assert len(got) == 10
    heavy = sum(1 for r in got if r.weight == 10000)
    assert heavy >= 8, heavy


# ---------------------------------------------- session-7 wave 2

def test_dsir_weights_match_python_twin_on_crafted_corpus(spark, tmp_path):
    """Two-token corpus, target = src0: the exact smoothed log-ratio
    twin (math.log + floor-half-up) must reproduce dsir_e6 for every
    doc — and the target-only token must score strictly higher than
    the raw-only token."""
    import math
    import os

    from cross_sentence_relation_extraction_idepnn_spark.hashing import py_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        DSIR_BUCKETS,
        dsir_weights,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import (
        release_caches,
    )

    rows = [
        (1, "alpha alpha alpha", "en", "src0"),
        (2, "beta beta beta", "en", "srcX"),
        (3, "alpha beta", "en", "srcY"),
    ]
    path = str(tmp_path / "docs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    got = {r["doc_id"]: (r["n_toks"], r["dsir_e6"])
           for r in dsir_weights(spark, path).collect()}
    release_caches()

    B = DSIR_BUCKETS
    cnt_all: dict[int, int] = {}
    cnt_t: dict[int, int] = {}
    for _, text, _, src in rows:
        for tok in text.split(" "):
            b = py_h15(tok) % B
            cnt_all[b] = cnt_all.get(b, 0) + 1
            if src == "src0":
                cnt_t[b] = cnt_t.get(b, 0) + 1
    tot_all, tot_t = sum(cnt_all.values()), sum(cnt_t.values())
    w = {
        b: math.floor(
            (math.log((cnt_t.get(b, 0) + 1) / (tot_t + B))
             - math.log((cnt_all[b] + 1) / (tot_all + B))) * 1e6 + 0.5
        )
        for b in cnt_all
    }
    for doc_id, text, _, _ in rows:
        toks = text.split(" ")
        exp = sum(w[py_h15(t) % B] for t in toks)
        assert got[doc_id] == (len(toks), exp), doc_id
    # the target-domain doc outranks the raw-only doc per token
    assert got[1][1] / 3 > got[2][1] / 3


def test_tool_pii_exposure_plant_profile(spark, sf_dir):
    """Every planted turn (turn_idx % 7 == 3) carries exactly 2 spans
    (email + SSN-like), every other turn 0 — so n_spans must equal
    2·n_pii_turns per tool, and the per-tool planted-turn counts must
    equal an independent aggregation of the transcript table."""
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        PII_TURN_PLANT_MOD,
        tool_pii_exposure,
    )
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        transcripts,
    )

    got = {r["tool"]: r for r in tool_pii_exposure(spark, sf_dir).collect()}
    exp = {
        r["tool"]: (r["n_turns"], r["n_planted"])
        for r in transcripts(spark, sf_dir)
        .groupBy(F.coalesce("tool", F.lit("chat")).alias("tool"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(
                (F.col("turn_idx") % PII_TURN_PLANT_MOD == 3).cast("long")
            ).alias("n_planted"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    total_planted = 0
    for tool, row in got.items():
        n_turns, n_planted = exp[tool]
        assert row["n_turns"] == n_turns
        assert row["n_pii_turns"] == n_planted, tool
        assert row["n_spans"] == 2 * n_planted, tool
        total_planted += n_planted
    assert total_planted > 0  # the plant is non-vacuous at sf0.001


def test_conv_shape_crafted_word_counts(spark, tmp_path):
    """Hand-computed shape census for conversations of 1, 4, 8, and 15
    turns (turn derivation: 8 words per turn; tools fire on odd
    turn_idx divisible by 3 or 5 — search for %3, code for %5)."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        conv_shape,
    )

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    rows = [
        (1, words(8)),    # 1 turn: no tools
        (2, words(32)),   # 4 turns: search@3
        (3, words(64)),   # 8 turns: search@3, code@5
        (4, words(120)),  # 15 turns: search@3, code@5, search@9
    ]
    path = str(tmp_path / "cs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {r.conv_id: r for r in conv_shape(spark, path).collect()}
    assert got["conv-1"] == ("conv-1", 1, 0, 0, -1, 1)
    assert got["conv-2"] == ("conv-2", 4, 1, 1, 3, 3)
    assert got["conv-3"] == ("conv-3", 8, 2, 2, 3, 3)
    assert got["conv-4"] == ("conv-4", 15, 3, 2, 3, 5)


def test_k_anonymity_flag_and_totals(spark, sf_dir):
    """The at_risk flag must equal n_turns < K on every equivalence
    class, and the class sizes must partition the corpus exactly."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        K_ANON_K,
        k_anonymity,
    )
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        transcripts,
    )

    rows = k_anonymity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.at_risk == (r.n_turns < K_ANON_K)
        assert 1 <= r.n_convs <= r.n_turns
    assert sum(r.n_turns for r in rows) == transcripts(spark, sf_dir).count()


def test_conv_survival_crafted_depths(spark, tmp_path):
    """Depths (1, 2, 2, 4) — derivation: 8 words per turn, as in
    test_conv_shape_crafted_word_counts — give a hand-computed
    survival curve; the ≥-cumulation and the half-up e6 fractions are
    pinned exactly."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        conv_survival,
    )

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    rows = [(1, words(8)), (2, words(16)), (3, words(16)), (4, words(32))]
    path = str(tmp_path / "cs")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        r.depth: (r.n_convs_at, r.n_convs_ge, r.survival_e6)
        for r in conv_survival(spark, path).collect()
    }
    assert got == {
        1: (1, 4, 1000000),
        2: (2, 3, 750000),
        4: (1, 1, 250000),
    }


def test_echo_rate_matches_python_twin(spark, sf_dir):
    """Independent Python re-implementation (dict + set algebra) of
    the transition-grid echo census over the same derived turns: every
    (prev_role, role) row must match, and the transition count must
    equal Σ(conv turns − 1)."""
    import collections

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        echo_rate,
        transcripts,
    )

    turns = transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", "role", "text"
    ).collect()
    by_conv: dict[str, list] = collections.defaultdict(list)
    for r in turns:
        by_conv[r.conv_id].append((r.turn_idx, r.role, r.text))
    grid: dict[tuple, list[int]] = collections.defaultdict(lambda: [0, 0, 0])
    for conv in by_conv.values():
        conv.sort()
        for (_, pr, pt), (_, cr, ct) in zip(conv, conv[1:]):
            cur, prev = set(ct.split(" ")), set(pt.split(" "))
            g = grid[(pr, cr)]
            g[0] += 1
            g[1] += len(cur)
            g[2] += len(cur & prev)
    want = {
        k: (n, st, se, (se * 1_000_000 + st // 2) // st)
        for k, (n, st, se) in grid.items()
    }
    got = {
        (r.prev_role, r.role): (
            r.n_transitions, r.sum_tokens, r.sum_echoed, r.echo_e6
        )
        for r in echo_rate(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == sum(
        len(c) - 1 for c in by_conv.values()
    )


def test_tool_funnel_crafted_stages(spark, tmp_path):
    """Three conversations: 15 turns (search@3 then code@5 — full
    chain), 4 turns (search@3 only), 1 turn (no tools) → funnel
    3 / 2 / 1 with half-up e6 rates."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        tool_funnel,
    )

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    rows = [(1, words(120)), (2, words(32)), (3, words(8))]
    path = str(tmp_path / "tf")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        r.stage: (r.n_convs, r.rate_e6)
        for r in tool_funnel(spark, path).collect()
    }
    assert got == {
        "any": (3, 1000000),
        "search": (2, 666667),
        "search_then_code": (1, 333333),
    }


def test_role_balance_crafted_shares(spark, tmp_path):
    """8-word doc → one user turn (share 0, decile 0); 16 words →
    user 8 / assistant 8 (500000 → decile 5); 24 words → turns
    user/assistant/user = 8 assistant of 24 (333333 → decile 3).
    Token mass rides along per bucket."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        role_balance,
    )

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    rows = [(1, words(8)), (2, words(16)), (3, words(24))]
    path = str(tmp_path / "rb")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        r.share_decile: (r.n_convs, r.total_tokens)
        for r in role_balance(spark, path).collect()
    }
    assert got == {0: (1, 8), 5: (1, 16), 3: (1, 24)}


def test_pii_cooccurrence_crafted_grid(spark, tmp_path):
    """doc1 email only, doc2 ssn only, doc3 email+ssn, doc4 clean,
    doc5 email+phone → diagonal (email 3, phone 1, ssn 2),
    off-diagonal (email,ssn)=1, (email,phone)=1, (phone,ssn)=0.
    plant=False so only the crafted spans count."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        pii_cooccurrence,
    )

    rows = [
        (1, "reach me at a.b@example.com today"),
        (2, "ssn is 123-45-6789 ok"),
        (3, "x@y.org and 987-65-4321 together"),
        (4, "nothing sensitive here"),
        (5, "mail q@r.io call +1 555-123-4567 now"),
    ]
    path = str(tmp_path / "pc")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        (r.type_a, r.type_b): r.n_docs
        for r in pii_cooccurrence(spark, path, plant=False).collect()
    }
    assert got == {
        ("email", "email"): 3,
        ("phone", "phone"): 1,
        ("ssn", "ssn"): 2,
        ("email", "phone"): 1,
        ("email", "ssn"): 1,
        ("phone", "ssn"): 0,
    }


def test_turn_dedup_crafted_multiplicity(spark, tmp_path):
    """Two 8-word docs with identical text yield one turn class of
    multiplicity 2; a distinct third doc is a singleton →
    {2: (1, 2), 1: (1, 1)}."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        turn_dedup,
    )

    same = " ".join(f"w{i}" for i in range(8))
    rows = [(1, same), (2, same), (3, " ".join(f"z{i}" for i in range(8)))]
    path = str(tmp_path / "td")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        r.multiplicity: (r.n_classes, r.n_turns)
        for r in turn_dedup(spark, path).collect()
    }
    assert got == {2: (1, 2), 1: (1, 1)}


def test_conv_context_budget_crafted_suffix(spark, tmp_path):
    """72-word doc → 9 turns of 8 tokens; suffix sums are 8..72, so
    budget 64 keeps 8 turns (drops the opening 8 tokens, conversation
    not intact) while 256/1024 keep everything; an 8-word doc is
    always intact."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        conv_context_budget,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(72))),
        (2, " ".join(f"z{i}" for i in range(8))),
    ]
    path = str(tmp_path / "ccb")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    got = {
        r.budget: (
            r.n_convs_intact,
            r.turns_kept,
            r.turns_dropped,
            r.tokens_dropped,
        )
        for r in conv_context_budget(spark, path).collect()
    }
    assert got == {
        64: (1, 9, 1, 8),
        256: (2, 10, 0, 0),
        1024: (2, 10, 0, 0),
    }


def test_tool_effect_and_latency_crafted(spark, tmp_path):
    """40-word doc → 5 turns of 8 tokens; tool turns (search@3) have a
    next turn of 8 tokens, 13 s later; the baseline rows cover every
    other non-terminal turn. Hand-computed grids."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        tool_effect,
        tool_latency,
    )

    rows = [(1, " ".join(f"w{i}" for i in range(40)))]
    path = str(tmp_path / "te")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    # turns 0..4; tool: turn 3 -> 'search' (odd and %3==0); others None
    eff = {
        r.tool: (r.n_turns, r.sum_next_len, r.mean_next_len_e2)
        for r in tool_effect(spark, path).collect()
    }
    assert eff == {"none": (3, 24, 800), "search": (1, 8, 800)}
    lat = {
        r.tool: (r.n, r.sum_ms, r.min_ms, r.max_ms)
        for r in tool_latency(spark, path).collect()
    }
    assert lat == {"search": (1, 13000, 13000, 13000)}


def test_pack_efficiency_conserves_docs_and_tokens(spark, sf_dir):
    """The fill-decile census partitions the pack set exactly: doc mass
    equals the corpus, token mass equals the corpus token count, pack
    mass equals the distinct (bin, pack_id) count, and deciles stay in
    [0, 10]."""
    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        pack_efficiency,
        pack_sequences,
    )

    rows = pack_efficiency(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).first()["s"]
    packs = pack_sequences(spark, sf_dir)
    n_packs = packs.select("bin", "pack_id").distinct().count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.sum_tokens for r in rows) == n_tokens
    assert sum(r.n_packs for r in rows) == n_packs
    assert all(0 <= r.fill_decile <= 10 for r in rows)
