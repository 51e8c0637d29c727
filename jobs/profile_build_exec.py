#!/usr/bin/env python
"""Round-6 wave-2 profiler (guide §1): split every driver-surface query
into plan-BUILD time (driver-side py4j Column-tree construction, before
any job) and EXEC time (the .count() action). Identifies which
operators should plan-memoize their construction and which are
genuinely compute-bound.

Not part of the frozen bench. Usage:
    python jobs/profile_build_exec.py [passes] [name_filter_substr]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entry
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        extract_triples,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import (
        get_spark,
        release_caches,
    )

    spark = get_spark(f"profile_c{CPUS}", cores=CPUS)
    sc = spark.sparkContext

    extract_triples(spark, SF_DIR).count()  # warm JIT + Python workers

    qs = entry.queries()
    names = [n for n in qs if name_filter in n]
    # rows[name] = list of (build_s, exec_s) per pass
    rows: dict[str, list[tuple[float, float]]] = {n: [] for n in names}
    for p in range(passes):
        for n in names:
            release_caches()
            spark.catalog.clearCache()
            sc.setJobDescription(f"profile:{n}")
            t0 = time.time()
            df = qs[n](spark, SF_DIR)
            t1 = time.time()
            df.count()
            t2 = time.time()
            sc.setJobDescription(None)
            rows[n].append((round(t1 - t0, 3), round(t2 - t1, 3)))
            sys.stderr.write(
                f"pass{p} {n}: build={t1 - t0:.3f} exec={t2 - t1:.3f}\n"
            )
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "passes": passes,
        "rows": {
            n: {
                "build": [b for b, _ in v],
                "exec": [e for _, e in v],
                "build_min": min(b for b, _ in v),
                "exec_min": min(e for _, e in v),
                "total_min": min(b + e for b, e in v),
            }
            for n, v in rows.items()
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
