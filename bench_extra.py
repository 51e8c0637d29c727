#!/usr/bin/env python
"""Round-6 optimization harness (guide §1.4): per-stage noop-sink
timings for the KG pipeline plus isolated headline-query timings.

NOT the driver bench — ``bench.py`` stays frozen. This file exists so
optimization work can attribute time to individual operators (scan,
segment, mentions, candidates, windows, kernel) instead of whole
queries, and so before/after numbers in OPTIMIZATION_r06.md have a
reproducible source.

Usage: python bench_extra.py [stage|headline|all] [repeats]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from cross_sentence_relation_extraction_idepnn_spark.operators.candidates import (
        candidate_pairs_fast,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.graph import (
        candidate_windows,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        detect_mentions,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.scoring import (
        emit_triples,
        featurize_and_score,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        segment,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        extract_triples,
        materialize_kg,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import (
        get_spark,
        release_caches,
    )
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        transcripts,
    )
    from cross_sentence_relation_extraction_idepnn_spark.training import load_weights

    spark = get_spark(f"bench_extra_c{CPUS}", cores=CPUS)
    sc = spark.sparkContext
    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        best = None
        for _ in range(repeats):
            release_caches()
            spark.catalog.clearCache()
            sc.setJobDescription(name)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            sc.setJobDescription(None)
        timings[name] = round(best, 3)
        sys.stderr.write(f"  {name}: {timings[name]}\n")

    # warm: JIT + Python workers
    extract_triples(spark, SF_DIR).count()

    if mode in ("stage", "all"):
        w = load_weights()
        tdf = transcripts(spark, SF_DIR)
        timed("s0_transcripts_noop", lambda: noop(tdf))
        timed("s1_segment_noop", lambda: noop(segment(tdf)))
        timed(
            "s2_mentions_noop",
            lambda: noop(detect_mentions(spark, segment(tdf))),
        )
        timed(
            "s3_candidates_noop",
            lambda: noop(
                candidate_pairs_fast(detect_mentions(spark, segment(tdf)))
            ),
        )
        timed(
            "s4_windows_noop",
            lambda: noop(
                candidate_windows(
                    candidate_pairs_fast(detect_mentions(spark, segment(tdf))),
                    segment(tdf),
                )
            ),
        )
        timed(
            "s5_fscore_noop",
            lambda: noop(
                featurize_and_score(
                    candidate_windows(
                        candidate_pairs_fast(
                            detect_mentions(spark, segment(tdf))
                        ),
                        segment(tdf),
                    ),
                    weights=w,
                )
            ),
        )
        timed(
            "s6_triples_noop",
            lambda: noop(
                emit_triples(
                    featurize_and_score(
                        candidate_windows(
                            candidate_pairs_fast(
                                detect_mentions(spark, segment(tdf))
                            ),
                            segment(tdf),
                        ),
                        weights=w,
                    )
                )
            ),
        )

    if mode in ("headline", "all"):
        import __spark_entry__ as entry

        from cross_sentence_relation_extraction_idepnn_spark.operators import (
            dedup,
            linking,
        )
        from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
            segment as _seg,
        )

        timed("kg_pipeline", lambda: extract_triples(spark, SF_DIR).count())
        timed("kg_materialize", lambda: materialize_kg(spark, SF_DIR).count())
        timed(
            "minhash_pairs", lambda: dedup.minhash_pairs(spark, SF_DIR).count()
        )
        timed(
            "simhash_pairs", lambda: dedup.simhash_pairs(spark, SF_DIR).count()
        )
        timed(
            "ngram_pairs",
            lambda: dedup.ngram_jaccard_pairs(spark, SF_DIR).count(),
        )
        timed(
            "canonicalize",
            lambda: linking.canonicalize(
                detect_mentions(spark, _seg(transcripts(spark, SF_DIR)))
            ).count(),
        )
        timed(
            "dedup_family_agreement",
            lambda: dedup.dedup_family_agreement(spark, SF_DIR).count(),
        )
        timed(
            "extraction_funnel",
            lambda: entry.queries()["extraction_funnel"](spark, SF_DIR).count(),
        )

    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
