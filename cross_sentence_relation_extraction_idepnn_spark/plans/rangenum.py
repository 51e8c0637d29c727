"""Shared range-partitioned global numbering (the A9 "vocabulary"
recipe, SURVEY.md §2 A9) — ONE audited implementation of the two-phase
pattern that replaces a single-task global sort / global running sum:

1. ``repartitionByRange(n_ranges, keys)`` + ``spark_partition_id`` tag,
   persisted so the measure pass and the numbering pass see the SAME
   sampled range bounds (repartitionByRange re-samples per action);
2. per-partition local order (``row_number`` / running ``sum`` over a
   pid-partitioned window — all parallel);
3. a driver-side EXCLUSIVE prefix offset per partition, from collecting
   ≤ ``n_ranges`` (pid, measure) rows — bounded by the range count,
   never the data.

At 100 TB the collect is still ~32 rows; every heavy stage stays
distributed. Extracted per VERDICT r4 next-#6: the boundary arithmetic
(sorted-pid exclusive prefix, None measures = 0) was hand-rolled in five
operators and could drift independently.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def ranged_by(df: DataFrame, n_ranges: int, *cols) -> DataFrame:
    """Range-partition ``df`` by ``cols`` and tag each row with its
    partition id as ``pid``, persisted (see module docstring: the bounds
    are sampled, so both passes must read one materialization)."""
    from ..session import track_cache

    ranged = (
        df.repartitionByRange(n_ranges, *cols)
        .withColumn("pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    track_cache(ranged)
    return ranged


def exclusive_prefix(
    pairs: Iterable[tuple[int, int | None]],
) -> tuple[dict[int, int], int]:
    """(pid → exclusive prefix of measure over lower pids, grand total)
    from (pid, measure) pairs. Pids sorted ascending; a None measure
    counts as 0. This is THE boundary arithmetic — partition p's first
    row gets global position ``offsets[p] (+1 for 1-based ranks)``."""
    offsets: dict[int, int] = {}
    acc = 0
    for pid, v in sorted(pairs, key=lambda t: t[0]):
        offsets[pid] = acc
        acc += int(v or 0)
    return offsets, acc


def prefix_offset_col(
    ranged: DataFrame, measure: Column | None = None
) -> tuple[Column, int]:
    """(offset column, grand total): maps each row's ``pid`` to the
    exclusive prefix of ``measure`` (COUNT(*) when None) over lower
    pids. The offset column is a literal ``create_map`` lookup — pure
    map-side, no join."""
    agg = F.count("*") if measure is None else F.sum(measure)
    rows = ranged.groupBy("pid").agg(agg.alias("_m")).collect()
    offsets, total = exclusive_prefix((r["pid"], r["_m"]) for r in rows)
    if not offsets:
        return F.lit(0).cast("long"), 0
    entries: list[Column] = []
    for pid, off in offsets.items():
        entries += [F.lit(pid), F.lit(off)]
    col = F.coalesce(
        F.create_map(*entries)[F.col("pid")], F.lit(0)
    ).cast("long")
    return col, total
