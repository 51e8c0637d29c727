"""Temporal / warehouse operator semantics: as-of strictness and tie
rules, SCD2 interval correctness, stream≡batch for the stream-stream
interval join, and plan-shape pins (cross-engine parity for all five
queries runs via tests/test_oracle_parity.py)."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from cross_sentence_relation_extraction_idepnn_spark.operators import temporal
from cross_sentence_relation_extraction_idepnn_spark.streaming import (
    events as stream_events,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    # final plan only (an executed memoized df appends the AQE initial plan)
    return buf.getvalue().split("== Initial Plan ==")[0]


def _count_op(plan: str, op: str) -> int:
    return len(re.findall(rf"^\(\d+\) {op}\b", plan, flags=re.MULTILINE))


def _events(spark, rows):
    """(event_id, ts_str, user_id, event_type, value) -> events frame."""
    df = spark.createDataFrame(
        [(i, ts, u, t, 1.0, "{}") for (i, ts, u, t) in rows],
        "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double, props string",
    )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


# ------------------------------------------------------------- as-of


def test_asof_is_strictly_prior_and_breaks_ts_ties_by_event_id(spark):
    """An error AT the probe's timestamp must be invisible (strict <);
    two errors sharing a timestamp resolve to the max event_id; users
    with no prior error keep a NULL enrichment."""
    rows = [
        # user 1: errors at 00:10 (ids 10 and 11 — tie) and at 00:30
        (10, "2024-01-01 00:10:00", 1, "error"),
        (11, "2024-01-01 00:10:00", 1, "error"),
        (12, "2024-01-01 00:30:00", 1, "error"),
        # probes: before any error / between / exactly at an error ts
        (1, "2024-01-01 00:05:00", 1, "click"),
        (2, "2024-01-01 00:20:00", 1, "purchase"),
        (3, "2024-01-01 00:30:00", 1, "click"),
        # user 2: no errors at all
        (4, "2024-01-01 00:20:00", 2, "click"),
    ]
    got = {
        r["event_id"]: (r["last_err_id"], r["gap_us"])
        for r in temporal.asof_enrich(_events(spark, rows)).collect()
    }
    assert got[1] == (None, None)  # nothing prior
    assert got[2] == (11, 600 * 1_000_000)  # tie → max event_id
    assert got[3] == (11, 1200 * 1_000_000)  # 00:30 error not yet visible
    assert got[4] == (None, None)  # user without references


def test_asof_plan_is_window_form_no_join(spark):
    """The as-of must compile to the union+window shape: zero Join
    operators (a range join would explode on hot users) and a single
    user_id exchange feeding the window."""
    df = temporal.events_asof(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert _count_op(plan, "SortMergeJoin") == 0
    assert _count_op(plan, "BroadcastHashJoin") == 0
    assert _count_op(plan, "BroadcastNestedLoopJoin") == 0
    assert _count_op(plan, "CartesianProduct") == 0
    assert _count_op(plan, "Window") == 1
    assert _count_op(plan, "Exchange") == 1


# -------------------------------------------------------------- SCD2


def test_scd2_intervals_versions_and_current_flag(spark):
    """A→A→B→A history: three runs with touching [from, to) intervals,
    versions 1..3, only the last current."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, "a"),
        (2, "2024-01-01 00:10:00", 7, "a"),
        (3, "2024-01-01 00:20:00", 7, "b"),
        (4, "2024-01-01 00:30:00", 7, "a"),
    ]
    got = sorted(
        temporal.scd2_history(_events(spark, rows)).collect(),
        key=lambda r: r["version"],
    )
    base = 1_704_067_200 * 1_000_000  # 2024-01-01 epoch us
    m = 60 * 1_000_000
    assert [
        (r["event_type"], r["version"], r["valid_from_us"], r["valid_to_us"],
         r["n_events"], r["is_current"])
        for r in got
    ] == [
        ("a", 1, base, base + 20 * m, 2, False),
        ("b", 2, base + 20 * m, base + 30 * m, 1, False),
        ("a", 3, base + 30 * m, None, 1, True),
    ]


def test_scd2_merge_of_delta_equals_full_rebuild(spark):
    """CDC property: appending a late delta batch and re-running the
    history build gives the same table as building from the unioned
    input — SCD2 is a pure function of the event log, so incremental
    maintenance can re-derive only the affected users' partitions."""
    old = [
        (1, "2024-01-01 00:00:00", 7, "a"),
        (2, "2024-01-01 00:10:00", 7, "b"),
        (3, "2024-01-01 00:00:00", 8, "a"),
    ]
    delta = [
        (4, "2024-01-01 00:20:00", 7, "b"),
        (5, "2024-01-01 00:05:00", 8, "b"),  # late arrival, rewrites user 8
    ]
    full = temporal.scd2_history(_events(spark, old + delta))
    merged = temporal.scd2_history(
        _events(spark, old).unionByName(_events(spark, delta))
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, merged.collect())
    )


# ----------------------------------------------- stream-stream join


def test_interval_join_stream_equals_batch(spark, sf_dir):
    """The watermarked stream-stream join on bounded input must equal
    the batch interval join — the streaming-correctness contract used
    for every streaming twin in this engine."""
    batch = temporal.events_interval_join(spark, sf_dir).toPandas()
    ev = stream_events.stream_events(spark, sf_dir)
    joined = stream_events.interval_join_stream(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == temporal.ASOF_REF_TYPE),
    )
    got = stream_events.run_available_now(
        joined, "interval_join_test", output_mode="append"
    ).toPandas()
    cols = sorted(batch.columns)
    assert sorted(got.columns) == cols
    a = batch[cols].sort_values(cols).reset_index(drop=True)
    b = got[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0, "vacuous join fixture"


# ------------------------------------------------------------ rollup


def test_rollup_gid_bitmask_and_single_pass(spark, sf_dir):
    """events_rollup emits all four CUBE grouping sets from ONE
    aggregation pass (a single Expand feeding ≤2 exchanges), and the
    gid bitmask is MSB-first (event_type high bit)."""
    df = temporal.events_rollup(spark, sf_dir)
    plan = _plan(df)
    assert _count_op(plan, "Expand") == 1
    assert _count_op(plan, "Exchange") <= 2  # AQE final agg exchange
    gids = {r["gid"] for r in df.select("gid").distinct().collect()}
    assert gids == {0, 1, 2, 3}
    grand = df.filter("gid = 3").collect()
    assert len(grand) == 1 and grand[0]["event_type"] is None
    # hh rolled out (gid bit 1 set) => hh NULL, event_type kept
    only_type = df.filter("gid = 1").filter(F.col("event_type").isNull())
    assert only_type.count() == 0


# ----------------------------------------------------- quality bands


def test_quality_bands_uneven_counts_follow_ntile_rule(spark, tmp_path):
    """7 docs in one language, 4 bands → sizes (2, 2, 2, 1): the
    first cnt%b buckets take the extra row. The synthetic corpus langs
    may all divide evenly, so this pins the rem-branch explicitly."""
    from cross_sentence_relation_extraction_idepnn_spark.operators import textstats

    rows = [(i, "w " * (i + 1) + "end", "xx", "s", 1) for i in range(7)]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["band"]: r["n_docs"]
        for r in textstats.quality_bands(spark, str(tmp_path)).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2, 4: 1}


# ----------------------------------------------------------- gap fill


def test_gap_fill_locf_semantics(spark):
    """Gaps carry the last observation forward; observed flags mark
    real days; the per-day value is the LATEST event's (by ts then
    event_id); each user's spine spans only their own active range."""
    day0 = "2024-01-01 12:00:00"  # day 19723
    rows = [
        (1, day0, 7, "a"),
        (2, "2024-01-01 13:00:00", 7, "a"),   # later same day → wins
        (3, "2024-01-04 01:00:00", 7, "b"),   # 2-day gap before this
        (4, "2024-01-02 00:00:00", 8, "a"),   # different user, 1 day
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, float(i * 10), "{}") for (i, ts, u, t) in rows],
        "event_id bigint, ts string, user_id bigint, "
        "event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = {
        (r["user_id"], r["day"]): (r["cents"], r["observed"])
        for r in temporal.gap_fill_daily(df).collect()
    }
    d = 19723
    assert got[(7, d)] == (2000, True)       # event 2 (later ts) wins day 0
    assert got[(7, d + 1)] == (2000, False)  # gap: carried forward
    assert got[(7, d + 2)] == (2000, False)
    assert got[(7, d + 3)] == (3000, True)
    assert got[(8, d + 1)] == (4000, True)
    assert len(got) == 5  # user 8 contributes exactly one spine day


# ------------------------------------------------------------- funnel


US = 1_000_000


def _us(h, m, s=0):
    """Epoch micros for 2024-01-01 HH:MM:SS (the _events fixture day)."""
    import datetime

    return int(
        datetime.datetime(2024, 1, 1, h, m, s).timestamp()
        - datetime.datetime(1970, 1, 1).timestamp()
    ) * US


def test_funnel_out_of_order_stages_do_not_count(spark):
    """A click BEFORE the first view is invisible; a purchase after the
    view but with no intervening click leaves the funnel at stage 1."""
    rows = [
        (2, "2024-01-01 00:05:00", 1, "click"),
        (1, "2024-01-01 00:10:00", 1, "view"),
        (3, "2024-01-01 00:20:00", 1, "purchase"),
    ]
    out = temporal.funnel_stages(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.stage, r.t1_us, r.t2_us, r.t3_us) == (1, _us(0, 10), None, None)


def test_funnel_ts_ties_resolve_by_event_id_order(spark):
    """At equal timestamps the (ts, event_id) total order decides
    'after': a click with a larger event_id than the view counts; a
    purchase with a smaller event_id than that click does not."""
    rows = [
        (9, "2024-01-01 00:10:00", 2, "purchase"),
        (10, "2024-01-01 00:10:00", 2, "view"),
        (11, "2024-01-01 00:10:00", 2, "click"),
    ]
    r = temporal.funnel_stages(_events(spark, rows)).collect()[0]
    assert (r.stage, r.t1_us, r.t2_us, r.t3_us) == (
        2,
        _us(0, 10),
        _us(0, 10),
        None,
    )


def test_funnel_greedy_earliest_completion_times(spark):
    """Each stage takes its EARLIEST eligible event: with view@01,
    click@03, purchase@04, view@05 the times are (01, 03, 04) — the
    later view never displaces the earlier anchor."""
    rows = [
        (20, "2024-01-01 00:01:00", 3, "view"),
        (22, "2024-01-01 00:03:00", 3, "click"),
        (23, "2024-01-01 00:04:00", 3, "purchase"),
        (21, "2024-01-01 00:05:00", 3, "view"),
    ]
    r = temporal.funnel_stages(_events(spark, rows)).collect()[0]
    assert (r.stage, r.t1_us, r.t2_us, r.t3_us) == (
        3,
        _us(0, 1),
        _us(0, 3),
        _us(0, 4),
    )


def test_funnel_stage_zero_user_still_emits_a_row(spark):
    """A user with funnel-type events but no view anchors at stage 0
    (present in the output — the funnel reports attrition, not just
    converters); a user with NO funnel-type events emits nothing."""
    rows = [
        (30, "2024-01-01 00:01:00", 4, "click"),
        (31, "2024-01-01 00:02:00", 4, "purchase"),
        (32, "2024-01-01 00:03:00", 5, "error"),
    ]
    out = temporal.funnel_stages(_events(spark, rows)).collect()
    assert [r.user_id for r in out] == [4]
    assert (out[0].stage, out[0].t1_us) == (0, None)


def test_funnel_plan_is_single_exchange_fold(spark):
    """The fold formulation shuffles ONCE (the user-grain aggregate);
    no join, no window cascade."""
    rows = [(40, "2024-01-01 00:01:00", 6, "view")]
    plan = _plan(temporal.funnel_stages(_events(spark, rows)))
    assert _count_op(plan, "Exchange") == 1, plan
    assert _count_op(plan, r"\w*Join\w*") == 0, plan


# ------------------------------------------------------ cohort retention


def test_cohort_retention_hand_computed(spark):
    """Two cohorts, hand-checked grid. Users 1,2 first appear in epoch-
    week W (2024-01-01 falls in week 2817); user 1 returns in W+1 and
    W+3, user 2 never returns, user 3 starts in W+1 and returns in
    W+2. Repeat events inside one week count the user once."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-02 00:00:00", 1, "view"),     # same week, dedup
        (3, "2024-01-08 00:00:00", 1, "view"),     # W+1
        (4, "2024-01-22 00:00:00", 1, "view"),     # W+3
        (5, "2024-01-01 12:00:00", 2, "click"),    # W only
        (6, "2024-01-08 00:00:00", 3, "view"),     # starts W+1
        (7, "2024-01-15 00:00:00", 3, "view"),     # W+2
    ]
    got = {
        (r["cohort_week"], r["week_offset"]): (r["n_users"], r["p"])
        for r in temporal.cohort_retention(_events(spark, rows)).collect()
    }
    w = (1704067200 // 604800)  # epoch-week of 2024-01-01
    assert got == {
        (w, 0): (2, 1.0),
        (w, 1): (1, 0.5),
        (w, 3): (1, 0.5),
        (w + 1, 0): (1, 1.0),
        (w + 1, 1): (1, 1.0),
    }


def test_tool_transition_probabilities_sum_to_one(spark, sf_dir):
    """Corpus-level invariants: (a) total transition count equals
    turns minus conversations (every turn but each conversation's last
    has a successor), (b) per-source probabilities sum to 1 within
    rounding, (c) states are exactly the synthetic tool alphabet."""
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        tool_transition,
        transcripts,
    )

    t = transcripts(spark, sf_dir)
    n_turns = t.count()
    n_convs = t.select("conv_id").distinct().count()
    rows = tool_transition(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == n_turns - n_convs
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["src_tool"], []).append(r)
        assert r["src_tool"] in {"chat", "search", "code"}
        assert r["dst_tool"] in {"chat", "search", "code"}
    for src, rs in by_src.items():
        assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, src


# --------------------------------------------------- activity anomalies


def test_activity_anomalies_integer_exact_twin(spark):
    """Crafted feed + pure-Python replay of the integer inequality
    (n·x − s)² > z²(n·q − s²): a 30-event spike against a 12-day flat
    baseline flags, the flat days don't, and a 2-day user is skipped
    by min_days (one observation has no variance)."""
    rows = []
    eid = 0
    for d in range(12):  # user 1: flat baseline, 2 events/day
        for j in range(2):
            eid += 1
            rows.append((eid, f"2024-01-{d + 1:02d} 0{j}:00:00", 1, "view"))
    for j in range(30):  # user 1: day-13 spike
        eid += 1
        rows.append((eid, f"2024-01-13 00:{j:02d}:00", 1, "view"))
    for d in range(2):  # user 2: below min_days
        eid += 1
        rows.append((eid, f"2024-01-{d + 1:02d} 00:00:00", 2, "view"))
    got = {
        (r["user_id"], r["day"]): (r["n_events"], r["n_days"], r["is_anomaly"])
        for r in temporal.activity_anomalies(_events(spark, rows)).collect()
    }
    assert all(u == 1 for (u, _d) in got), "user 2 must be skipped"
    assert len(got) == 13
    counts = [v[0] for v in got.values()]
    n, s, q = len(counts), sum(counts), sum(c * c for c in counts)
    for (u, d), (x, nd, flag) in got.items():
        assert nd == n
        assert flag == ((n * x - s) ** 2 > 9 * (n * q - s * s)), (d, x)
    spike = [v for v in got.values() if v[0] == 30]
    assert spike and spike[0][2] is True
    assert all(v[2] is False for v in got.values() if v[0] == 2)


def test_props_profile_discovers_keys_and_profiles_types(spark, tmp_path):
    """Profiling semantics on crafted heterogeneous JSON: keys are
    DISCOVERED per row (no hardcoded schema) — a key present in only
    some rows counts only those; JSON null values count as n_null;
    non-numeric keys get NULL min/max under try_cast; numeric ranges
    are exact. DuckDB oracle (json_keys + dynamic-path extraction)
    agrees frame-exactly."""
    import duckdb
    from datetime import datetime

    from compare_util import assert_frames_match
    from cross_sentence_relation_extraction_idepnn_spark.operators import temporal

    ts = datetime(2026, 1, 1)
    rows = [
        (1, ts, 10, "click", 1.0, '{"k": 5, "tag": "a"}'),
        (2, ts, 10, "click", 1.0, '{"k": 9}'),
        (3, ts, 11, "click", 1.0, '{"k": -3, "tag": "b", "extra": null}'),
        (4, ts, 11, "view", 1.0, '{"tag": "a"}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {
        (r.event_type, r.key): r
        for r in temporal.props_profile(spark, str(tmp_path)).collect()
    }
    k = out[("click", "k")]
    assert (k.n, k.n_null, k.n_distinct, k.min_num, k.max_num) == (3, 0, 3, -3, 9)
    tag = out[("click", "tag")]
    assert (tag.n, tag.n_distinct) == (2, 2)
    assert tag.min_num is None and tag.max_num is None  # non-numeric
    extra = out[("click", "extra")]
    assert (extra.n, extra.n_null, extra.n_distinct) == (1, 1, 0)
    assert ("view", "k") not in out  # discovery is per-row, not global
    assert out[("view", "tag")].n == 1

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    assert_frames_match(
        temporal.props_profile(spark, str(tmp_path)),
        con,
        temporal.duck_props_profile(),
    )


def test_disorder_profile_hand_computed_inversions_and_late(spark, tmp_path):
    """Crafted arrival sequences with hand-counted inversions and max
    lateness. User 1 arrives [t=100, 95, 110, 90] (event_id order):
    two adjacent inversions (100→95, 110→90), max late = running-max
    110 − 90 = 20 s. User 2 is perfectly ordered: zero inversions,
    zero lateness. Sub-second skew (user 3: 0.4 s late) floors to 0 —
    the census is second-granular by contract."""
    from datetime import datetime, timedelta

    base = datetime(2026, 1, 1)
    rows = [
        (1, base + timedelta(seconds=100), 1),
        (2, base + timedelta(seconds=95), 1),
        (3, base + timedelta(seconds=110), 1),
        (4, base + timedelta(seconds=90), 1),
        (5, base + timedelta(seconds=10), 2),
        (6, base + timedelta(seconds=20), 2),
        (7, base + timedelta(seconds=5), 3),
        (8, base + timedelta(seconds=4, microseconds=600_000), 3),
    ]
    spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for (i, ts, u) in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r.user_id: (r.n_events, r.n_inversions, r.max_late_s)
        for r in temporal.disorder_profile(spark, str(tmp_path)).collect()
    }
    assert got == {1: (4, 2, 20), 2: (2, 0, 0), 3: (2, 1, 0)}


def test_watermark_sim_block_boundary_and_strict_drop(spark, tmp_path):
    """Micro-batch watermark semantics on a crafted feed (block=4):
    the first block never drops (no prior watermark); an event 5 s
    late vs the PRIOR block's max is dropped at delays < 5 and KEPT at
    delay 5 exactly (strict inequality — Spark keeps ts == watermark);
    lateness within a block is invisible (the watermark only advances
    at batch boundaries)."""
    from datetime import datetime, timedelta

    base = datetime(2026, 1, 1)
    t = lambda s: base + timedelta(seconds=s)
    rows = [
        # block 0 (ids 0-3): max ts = 100; id 2 is late WITHIN block -> kept
        (0, t(90)), (1, t(100)), (2, t(10)), (3, t(95)),
        # block 1 (ids 4-7): watermark = 100 - delay
        (4, t(95)),   # 5 s late: dropped at delay<5, kept at delay>=5
        (5, t(120)),  # on time
        (6, t(98)),   # 2 s late: dropped at delay<2
        (7, t(130)),
    ]
    spark.createDataFrame(
        [(i, ts, 1, "view", 1.0, "{}") for (i, ts) in rows],
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r.delay_s: (r.n_dropped, r.drop_permille)
        for r in temporal.watermark_sim(
            spark, str(tmp_path), delays=(0, 1, 2, 4, 5, 60), block=4
        ).collect()
    }
    assert got == {
        0: (2, 250),   # ids 4 and 6
        1: (2, 250),
        2: (1, 125),   # id 6 kept (late 2 not > 2), id 4 still dropped
        4: (1, 125),
        5: (0, 0),     # id 4 kept at exactly its lateness
        60: (0, 0),
    }


def test_disorder_and_watermark_driver_rows_nonvacuous(spark, sf_dir):
    """The driver-facing jittered variants must exercise real disorder
    on the (totally ordered) synthetic feed: some user has an
    inversion and some candidate delay drops events while the widest
    delay drops none — the decision curve actually decides."""
    from pyspark.sql import functions as F

    dp = temporal.disorder_profile(
        spark, sf_dir, jitter=temporal.DISORDER_JITTER
    )
    assert dp.agg(F.sum("n_inversions")).collect()[0][0] > 0
    drops = {
        r.delay_s: r.n_dropped
        for r in temporal.watermark_sim(
            spark, sf_dir, jitter=temporal.DISORDER_JITTER
        ).collect()
    }
    assert drops[0] > 0
    assert drops[max(drops)] < drops[0]


def test_events_quantiles_matches_numpy_lower_method(spark, tmp_path):
    """The rank formula ((q·(n−1)) div 100 + 1, 1-based) IS numpy's
    method='lower' discrete quantile; verified on crafted types
    covering n=1, duplicate-heavy ties, and a clean ramp — plus the
    tie-break determinism (value then event_id) that makes the window
    reproducible across partitionings."""
    import numpy as np
    from datetime import datetime

    ts = datetime(2026, 1, 1)
    vals = {
        "ramp": [10.0, 20.0, 30.0, 40.0, 50.0],
        "single": [7.0],
        "dupes": [5.0, 5.0, 5.0, 9.0],
    }
    rows, eid = [], 0
    for t, vs in vals.items():
        for v in vs:
            eid += 1
            rows.append((eid, ts, 1, t, v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r.event_type: (r.n, r.p50, r.p90, r.p99)
        for r in temporal.events_quantiles(spark, str(tmp_path)).collect()
    }
    for t, vs in vals.items():
        want = tuple(
            float(np.percentile(vs, q, method="lower")) for q in (50, 90, 99)
        )
        assert got[t] == (len(vs),) + want, t
    assert got["ramp"] == (5, 30.0, 40.0, 40.0)
    assert got["dupes"] == (4, 5.0, 5.0, 5.0)
    assert got["single"] == (1, 7.0, 7.0, 7.0)


# ------------------------------------------------------------- CDC


def test_cdc_state_merge_law_and_tie_break(spark):
    """state(A ∪ B) = latest(state(A) ∪ state(B)) — daily change
    batches fold into the snapshot without re-reading history — and
    equal-ts changes resolve by event_id (write order)."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click"),
        (2, "2024-01-03 00:00:00", 1, "view"),
        (3, "2024-01-02 00:00:00", 1, "purchase"),
        (4, "2024-01-03 00:00:00", 1, "signup"),  # ts tie with #2
        (5, "2024-01-01 00:00:00", 2, "click"),
        (6, "2024-01-05 00:00:00", 2, "error"),  # tombstone newest
        (7, "2024-01-04 00:00:00", 2, "view"),
        (8, "2024-01-02 00:00:00", 3, "view"),
    ]
    ev = _events(spark, rows)
    full = {r.user_id: r for r in temporal.cdc_state(ev).collect()}
    # tie at 2024-01-03 broken by event_id: 4 beats 2
    assert full[1].last_event_id == 4 and full[1].last_type == "signup"
    # state REMEMBERS the tombstone (resurrection guard)
    assert full[2].last_type == "error"
    # merge law: state over union == state over union of per-batch states
    a = temporal.cdc_state(ev.filter(F.col("event_id") % 2 == 0))
    b = temporal.cdc_state(ev.filter(F.col("event_id") % 2 == 1))
    refold = temporal.cdc_state(
        a.unionByName(b).select(
            F.col("last_event_id").alias("event_id"),
            F.col("last_ts").alias("ts"),
            "user_id",
            F.col("last_type").alias("event_type"),
            F.col("last_value").alias("value"),
        )
    )
    assert {tuple(r) for r in refold.collect()} == {
        tuple(r) for r in full.values()
    }


def test_cdc_snapshot_drops_tombstoned_keys_only(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click"),
        (2, "2024-01-02 00:00:00", 2, "error"),   # newest = tombstone
        (3, "2024-01-03 00:00:00", 3, "error"),
        (4, "2024-01-04 00:00:00", 3, "view"),    # resurrected after
    ]
    snap = {
        r.user_id: r
        for r in temporal.cdc_state(_events(spark, rows))
        .filter(F.col("last_type") != temporal.CDC_TOMBSTONE)
        .collect()
    }
    assert set(snap) == {1, 3}
    assert snap[3].last_event_id == 4


def test_cdc_state_plan_is_single_exchange(spark, sf_dir):
    """MERGE kernel shape: one hash exchange on the key, no join."""
    df = temporal.cdc_state(temporal.events_batch(spark, sf_dir))
    plan = _plan(df)
    assert _count_op(plan, "Exchange") == 1, plan
    assert "Join" not in plan


def test_rollup_merge_is_associative_across_batch_counts(spark, sf_dir):
    """merge(cube(A), cube(B), cube(C)) == cube(A ∪ B ∪ C) for a
    3-way split (the driver row proves the 2-way split) — daily
    partials fold regardless of batch boundaries."""
    ev = stream_events.events_batch(spark, sf_dir)
    full = {
        (r.event_type, r.hh, r.gid): (r.n_events, r.cents_sum)
        for r in temporal._rollup_cube(ev).collect()
    }
    parts = [
        temporal._rollup_cube(ev.filter(F.col("event_id") % 3 == i))
        for i in range(3)
    ]
    merged = {
        (r.event_type, r.hh, r.gid): (r.n_events, r.cents_sum)
        for r in temporal.rollup_merge(parts).collect()
    }
    assert merged == full


# ----------------------------------- event-sequence Markov + Gini


def test_event_markov_crafted_grid_and_tie_break(spark, tmp_path):
    """Hand-computed transition grid: user 1 walks A→B→A→B with a ts
    tie inside (the tie breaks by event_id, so the A at id=3 precedes
    the B at id=4); user 2 fires A→A. p_e6 is half-up row-normalized."""
    import os

    rows = [
        (1, "2024-01-01 00:00:01", 1, "A"),
        (2, "2024-01-01 00:00:02", 1, "B"),
        (3, "2024-01-01 00:00:03", 1, "A"),  # ts tie with id=4
        (4, "2024-01-01 00:00:03", 1, "B"),
        (5, "2024-01-01 00:00:01", 2, "A"),
        (6, "2024-01-01 00:00:02", 2, "A"),
    ]
    path = str(tmp_path / "mk")
    os.makedirs(path, exist_ok=True)
    _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )
    got = {
        (r.src_type, r.dst_type): (r.n, r.p_e6)
        for r in temporal.event_markov(spark, path).collect()
    }
    assert got == {
        ("A", "B"): (2, 666667),  # (2e6 + 1) // 3 half-up
        ("B", "A"): (1, 1000000),
        ("A", "A"): (1, 333333),
    }


def test_activity_gini_uniform_zero_and_crafted_skew(spark, tmp_path):
    """Perfectly uniform users → gini_e6 == 0 exactly; volumes
    (1, 1, 2) → G = 1/6 → half-up 166667. Exercises the closed form
    G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) end to end."""
    import os

    def write(rows, sub):
        path = str(tmp_path / sub)
        os.makedirs(path, exist_ok=True)
        _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "events.parquet")
        )
        return path

    uniform = [
        (i, f"2024-01-01 00:00:{i:02d}", u, "A")
        for i, u in enumerate((1, 1, 2, 2, 3, 3))
    ]
    (row,) = temporal.activity_gini(spark, write(uniform, "u")).collect()
    assert (row.n_users, row.n_events, row.gini_e6) == (3, 6, 0)

    skew = [
        (i, f"2024-01-01 00:00:{i:02d}", u, "A")
        for i, u in enumerate((1, 2, 3, 3))
    ]
    (row,) = temporal.activity_gini(spark, write(skew, "s")).collect()
    # sorted x = [1, 1, 2]: Σi·x = 9, (2·9 − 4·4)·1e6 + 6 ) // 12
    assert (row.n_users, row.n_events, row.gini_e6) == (3, 4, 166667)


def test_burstiness_matches_python_twin(spark, sf_dir):
    """Exact-integer twin of the Fano census: per-user timeline gaps
    keyed by the later event's type, then count / sum / half-up e3
    mean / half-up e3 dispersion (variance-to-mean) — every row must
    match, including the Σd²-as-arbitrary-precision accumulation."""
    import collections

    rows = (
        stream_events.events_batch(spark, sf_dir)
        .selectExpr(
            "user_id",
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS us",
            "event_id",
            "event_type",
        )
        .collect()
    )
    by_user: dict[int, list] = collections.defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.us, r.event_id, r.event_type))
    stats: dict[str, list[int]] = collections.defaultdict(lambda: [0, 0, 0])
    for tl in by_user.values():
        tl.sort()
        for (pus, _, _), (cus, _, ct) in zip(tl, tl[1:]):
            d = (cus - pus) // 1_000_000
            st = stats[ct]
            st[0] += 1
            st[1] += d
            st[2] += d * d
    want = {}
    for t, (n, sd, sd2) in stats.items():
        mean = (sd * 1000 + n // 2) // n
        disp = (
            ((n * sd2 - sd * sd) * 1000 + (n * sd) // 2) // (n * sd)
            if sd > 0
            else None
        )
        want[t] = (n, sd, mean, disp)
    got = {
        r.event_type: (r.n_gaps, r.sum_dt_s, r.mean_dt_e3, r.disp_e3)
        for r in temporal.burstiness(spark, sf_dir).collect()
    }
    assert got == want
    # a bursty corpus has at least one type with dispersion > mean
    assert any(
        d is not None and d > m for (_, _, m, d) in got.values()
    ) or all(d is None for (_, _, _, d) in got.values())


def test_event_seasonality_crafted_cells(spark, tmp_path):
    """2024-01-01 is a Monday: events at Mon 00:30, Mon 13:05 ×2, and
    Tue 23:59 land in hand-computed (dow, hod) cells with half-up e6
    shares of a 4-event total."""
    import os

    rows = [
        (1, "2024-01-01 00:30:00", 1, "A"),
        (2, "2024-01-01 13:05:00", 1, "A"),
        (3, "2024-01-01 13:59:59", 2, "B"),
        (4, "2024-01-02 23:59:59", 2, "B"),
    ]
    path = str(tmp_path / "se")
    os.makedirs(path, exist_ok=True)
    _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )
    got = {
        (r.dow, r.hod): (r.n_events, r.share_e6)
        for r in temporal.event_seasonality(spark, path).collect()
    }
    assert got == {
        (1, 0): (1, 250000),   # Monday == 1 (0 = Sunday)
        (1, 13): (2, 500000),
        (2, 23): (1, 250000),
    }


def test_session_gap_whatif_crafted_thresholds(spark, tmp_path):
    """User 1's gaps are 30 s / 120 s / 1700 s; user 2 has one event.
    Session counts at T = 60/300/1800 are hand-computed 4/3/2 with
    half-up e3 means 1250/1667/2500 over the 5-event corpus."""
    import os

    rows = [
        (1, "2024-01-01 00:00:00", 1, "A"),
        (2, "2024-01-01 00:00:30", 1, "A"),
        (3, "2024-01-01 00:02:30", 1, "A"),
        (4, "2024-01-01 00:30:50", 1, "A"),
        (5, "2024-01-01 09:00:00", 2, "B"),
    ]
    path = str(tmp_path / "sg")
    os.makedirs(path, exist_ok=True)
    _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )
    got = {
        r.gap_s: (r.n_sessions, r.n_events, r.mean_events_e3)
        for r in temporal.session_gap_whatif(spark, path).collect()
    }
    assert got == {
        60: (4, 5, 1250),
        300: (3, 5, 1667),
        1800: (2, 5, 2500),
    }
    ns = [got[t][0] for t in sorted(got)]
    assert ns == sorted(ns, reverse=True)  # monotone in the threshold


def test_error_bursts_crafted_windows(spark, tmp_path):
    """User 1's errors at 0 / 1800 / 3599 s all fit one trailing hour
    (max 3); the 7200 s error stands alone; user 2 has a single error
    → histogram {3: 1, 1: 1}. Non-error events must not count."""
    import os

    rows = [
        (1, "2024-01-01 00:00:00", 1, "error"),
        (2, "2024-01-01 00:30:00", 1, "error"),
        (3, "2024-01-01 00:59:59", 1, "error"),
        (4, "2024-01-01 02:00:00", 1, "error"),
        (5, "2024-01-01 00:10:00", 1, "click"),   # ignored
        (6, "2024-01-01 05:00:00", 2, "error"),
    ]
    path = str(tmp_path / "eb")
    os.makedirs(path, exist_ok=True)
    _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )
    got = {
        r.max_in_window: r.n_users
        for r in temporal.error_bursts(spark, path).collect()
    }
    assert got == {3: 1, 1: 1}


def test_event_cooccurrence_crafted(spark, tmp_path):
    """User 1 emits {error, click, buy} (3 pairs), user 2 {error,
    click} (1 more on that pair), user 3 {click} only (none);
    repeated events must not double-count the incidence."""
    import os

    rows = [
        (1, "2024-01-01 00:00:00", 1, "error"),
        (2, "2024-01-01 00:01:00", 1, "error"),  # dup incidence
        (3, "2024-01-01 00:02:00", 1, "click"),
        (4, "2024-01-01 00:03:00", 1, "buy"),
        (5, "2024-01-01 00:04:00", 2, "error"),
        (6, "2024-01-01 00:05:00", 2, "click"),
        (7, "2024-01-01 00:06:00", 3, "click"),
    ]
    path = str(tmp_path / "ec")
    os.makedirs(path, exist_ok=True)
    _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )
    got = {
        (r.type_a, r.type_b): r.n_users
        for r in temporal.event_cooccurrence(spark, path).collect()
    }
    assert got == {
        ("click", "error"): 2,
        ("buy", "click"): 1,
        ("buy", "error"): 1,
    }
