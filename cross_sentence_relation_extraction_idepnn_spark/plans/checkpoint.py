"""Per-stage checkpointing with lineage + counters (north rule).

The reference "checkpoints" by pickling every intermediate to disk and
re-running scripts by hand (``load_save_pkl.py:4-22``, SURVEY.md §2.1
S9). The engine makes that first-class: every stage writes a parquet
checkpoint table plus a ``_meta`` lineage row (stage name, upstream
stage, row count, partition count, wall seconds, input fingerprint).
A completed stage is detected via Spark's ``_SUCCESS`` marker, so a
killed job resumes idempotently: finished stages are read back,
unfinished ones recompute. In production the same API targets Iceberg
tables (atomic snapshot commits make the marker implicit); parquet +
``_SUCCESS`` is the sandbox stand-in.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _footer_row_counts(path: str) -> list[int]:
    """num_rows per data file, read from parquet footers (recursing into
    partitionBy subdirectories) — no data pages are touched."""
    import pyarrow.parquet as pq

    counts: list[int] = []
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if fname.endswith(".parquet"):
                counts.append(
                    pq.ParquetFile(os.path.join(root, fname)).metadata.num_rows
                )
    return counts


class Checkpointer:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.warehouse, stage)

    def is_complete(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self._path(stage), "_SUCCESS"))

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._path(stage))

    def meta(self) -> list[dict]:
        mpath = os.path.join(self.warehouse, "_meta.jsonl")
        if not os.path.exists(mpath):
            return []
        with open(mpath) as f:
            return [json.loads(line) for line in f]

    def _append_meta(self, row: dict) -> None:
        mpath = os.path.join(self.warehouse, "_meta.jsonl")
        with open(mpath, "a") as f:
            f.write(json.dumps(row) + "\n")

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        upstream: list[str] | None = None,
        resume: bool = True,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage: build → write parquet → lineage row.

        Counters come from the parquet FOOTERS of the files the write
        just produced — row count and the per-file row histogram (skew
        observable per stage) are O(#files) metadata reads, zero Spark
        jobs after the write itself. At 100 TB this is the difference
        between one pass and two.
        """
        if resume and self.is_complete(name):
            return self.read(name)
        t0 = time.time()
        df = build()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        path = self._path(name)
        writer.parquet(path)
        pp = _footer_row_counts(path)
        self._append_meta(
            {
                "stage": name,
                "upstream": upstream or [],
                "rows": sum(pp),
                "n_files": len(pp),
                "partitions": {
                    "n": len(pp),
                    "min_rows": min(pp) if pp else 0,
                    "max_rows": max(pp) if pp else 0,
                },
                "wall_sec": round(time.time() - t0, 3),
                "ts": time.time(),
            }
        )
        # explicit schema skips the read-back's footer-inference job
        return self.spark.read.schema(df.schema).parquet(path)
