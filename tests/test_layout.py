"""Z-order layout: Morton-code correctness and the data-skipping claim
itself — a user-range query under the Z-clustered layout must touch a
small fraction of the files that the time-ordered baseline layout
forces a reader to scan. Cross-engine parity of the stats table runs
via tests/test_oracle_parity.py."""

from __future__ import annotations

from cross_sentence_relation_extraction_idepnn_spark.operators import layout

SF = "/root/testdata/sf0.001"


def _interleave(u: int, t: int) -> int:
    z = 0
    for i in range(layout.DIM_BITS):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((t >> i) & 1) << (2 * i)
    return z


def test_morton_sql_matches_python_reference(spark):
    """The 32-term SQL interleave equals the bit-twiddling reference on
    adversarial corners (all-ones, alternating bits, single high bit)."""
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (43690, 21845),
             (32768, 1), (12345, 54321)]
    z = layout._morton_sql("u", "t")
    rows = spark.sql(
        "SELECT u, t, " + z + " AS z FROM VALUES "
        + ", ".join(f"({u}, {t})" for u, t in cases)
        + " AS _(u, t)"
    ).collect()
    for r in rows:
        assert r["z"] == _interleave(r["u"], r["t"]), (r["u"], r["t"])


def test_zorder_files_bound_both_dimensions(spark):
    """Every Z-prefix file spans a bounded square in (user, hour) space:
    max-min on EACH dimension is at most the cell width its prefix
    leaves free (8 interleaved bits per dimension after an 8-bit file
    prefix → 2^12 per dim... but the events feed's dims are far
    smaller, so just assert the structural bound)."""
    free_bits_per_dim = (2 * layout.DIM_BITS - layout.FILE_PREFIX_BITS + 1) // 2
    width = 1 << free_bits_per_dim
    for r in layout.zorder_files(spark, SF).collect():
        assert r["max_user"] - r["min_user"] < width
        assert r["max_hour"] - r["min_hour"] < width
        assert r["n_rows"] > 0


def test_zorder_prunes_user_range_queries_timeorder_cannot(spark):
    """The point of the layout: a user-range predicate touches a small
    fraction of Z-ordered files but most time-ordered ones (arrival
    order spreads each user across the whole timeline). This is the
    min/max skipping decision a parquet/Iceberg reader makes. Needs
    sf0.01 — its 150 users span many interleave cells (sf0.001's 15
    users all share one cell column, which demonstrates nothing)."""
    sf = "/root/testdata/sf0.01"
    zstats = layout.zorder_files(spark, sf)
    tstats = layout.timeorder_files(spark, sf)
    n_z = zstats.count()
    n_t = tstats.count()
    assert n_z > 4 and n_t > 4, "fixture too small to demonstrate pruning"
    z_frac = layout.files_touched(zstats, 3, 4) / n_z
    t_frac = layout.files_touched(tstats, 3, 4) / n_t
    assert t_frac > 0.5, "time layout unexpectedly has user locality"
    assert z_frac <= 0.2, f"z-order pruning vacuous: {z_frac:.0%} touched"
    assert z_frac * 4 <= t_frac


def test_compaction_plan_bins_are_contiguous_and_lossless(spark):
    """Plan invariants at sf0.01: (a) bins partition the files with no
    row lost (sum of total_rows == corpus rows), (b) bins are contiguous
    in zfile order (file ranges never interleave), (c) every bin except
    the last crosses the target quota once its first file is counted —
    the cumulative-quota packing contract."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.layout import (
        COMPACT_TARGET_ROWS,
        compaction_plan,
        zorder_files,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import release_caches

    sf = "/root/testdata/sf0.01"
    stats = zorder_files(spark, sf).collect()
    plan = sorted(
        compaction_plan(spark, sf).collect(), key=lambda r: r["bin"]
    )
    release_caches()
    assert sum(r["total_rows"] for r in plan) == sum(
        r["n_rows"] for r in stats
    )
    assert sum(r["n_files"] for r in plan) == len(stats)
    for a, b in zip(plan, plan[1:]):
        assert a["last_file"] < b["first_file"]
    # quota: bin b's cum_before span is [b*T, (b+1)*T) — so every bin
    # except possibly the last must contain at least one row past its
    # quota boundary minus the first-file overshoot; concretely the
    # plan must produce >1 bin at this scale and no empty bins
    assert len(plan) > 1
    assert all(r["n_files"] >= 1 and r["total_rows"] > 0 for r in plan)


def test_compaction_plan_hand_computed_bins(spark):
    """Pure-Python replay of the prefix-sum assignment over the actual
    sf0.001 stats: bin of every file equals cum_before // target."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.layout import (
        compaction_plan,
        zorder_files,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import release_caches

    sf = "/root/testdata/sf0.001"
    target = 64  # small quota so sf0.001 still yields several bins
    stats = sorted(
        zorder_files(spark, sf).collect(), key=lambda r: r["zfile"]
    )
    expect: dict[int, list] = {}
    cum = 0
    for r in stats:
        expect.setdefault(cum // target, []).append(r)
        cum += r["n_rows"]
    got = {
        r["bin"]: r
        for r in compaction_plan(spark, sf, target_rows=target).collect()
    }
    release_caches()
    assert set(got) == set(expect)
    for b, files in expect.items():
        assert got[b]["n_files"] == len(files)
        assert got[b]["total_rows"] == sum(f["n_rows"] for f in files)
        assert got[b]["first_file"] == files[0]["zfile"]
        assert got[b]["last_file"] == files[-1]["zfile"]


def test_zonemap_prune_audit_invariants_and_zero_hit_row(spark):
    """The prune audit must (a) keep a row for EVERY probe — including
    a probe whose user dimension can never match (udim ≤ 255), with
    zero files/rows; (b) bound touched files by the layout's file
    count and touched rows by the table size; (c) agree with an
    independent python replay of the intersection rule over the
    collected stats tables; (d) show Z-order strictly beating the
    arrival-time baseline in total files touched on the point-user
    probe grid (the reason the operator exists)."""
    probes = layout.PRUNE_PROBES + ((300, 0, 23),)
    df = layout.zonemap_prune(spark, SF, probes=probes)
    got = {
        (r.pred_user, r.hour_lo, r.hour_hi): (
            r.files_z, r.rows_z, r.files_t, r.rows_t
        )
        for r in df.collect()
    }
    assert len(got) == len(probes)
    assert got[(300, 0, 23)] == (0, 0, 0, 0)

    zstats = [r.asDict() for r in layout.zorder_files(spark, SF).collect()]
    tstats = [r.asDict() for r in layout.timeorder_files(spark, SF).collect()]
    n_rows_total = sum(f["n_rows"] for f in zstats)
    assert n_rows_total == sum(f["n_rows"] for f in tstats)

    def replay(stats, u, lo, hi):
        hit = [
            f for f in stats
            if f["max_user"] >= u >= f["min_user"]
            and f["max_hour"] >= lo and f["min_hour"] <= hi
        ]
        return len(hit), sum(f["n_rows"] for f in hit)

    for (u, lo, hi), (fz, rz, ft, rt) in got.items():
        assert (fz, rz) == replay(zstats, u, lo, hi)
        assert (ft, rt) == replay(tstats, u, lo, hi)
        assert fz <= len(zstats) and rz <= n_rows_total
        assert ft <= len(tstats) and rt <= n_rows_total
    total_z = sum(v[0] for v in got.values())
    total_t = sum(v[2] for v in got.values())
    assert total_z < total_t, (total_z, total_t)
