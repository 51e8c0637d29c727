"""sf1-scale evidence run (VERDICT r3 next-round #4).

Materializes an sf1 stand-in (10× the sf0.1 ``documents`` table — the
only physical input; transcripts derive from it) and records wall
time, output row counts, and per-query peak/total shuffle bytes for
the three headline queries at local[$SPARK_GRAFT_CPUS]. This is SCALE
evidence, not parity — correctness stays gated at sf0.01 where the
DuckDB oracles run.

Replication detail: each copy's text is cyclically word-rotated by a
copy-specific offset. Plain replication would make every document an
EXACT cross-copy twin, collapsing MinHash into one giant duplicate
cluster per source doc (a quadratic pair blow-up that measures the
fixture, not the engine). Rotation preserves document length, word
frequencies, and within-copy near-dup structure while keeping
cross-copy shingle Jaccard low — the workload scales by 10× without
changing character.

Usage::

    python jobs/scale_sf1.py            # writes SCALE_SF1.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))
SCRATCH = os.path.join(ROOT, ".scratch", "sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# comma-list to run a SUBSET of the query dict (new-operator increments
# merge into the existing SCALE_SF1.json instead of re-running all)
ONLY = {q for q in os.environ.get("SPARK_GRAFT_SF1_ONLY", "").split(",") if q}


def build_scaled_documents(spark) -> str:
    """Write the rotated 10× documents parquet; returns the sf dir."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC_SF}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("copy"))
    ws = F.split(F.col("text"), " ")
    n = F.size(ws)
    k = (F.col("copy") * 7) % F.greatest(n, F.lit(1))
    rotated = F.array_join(
        F.concat(F.slice(ws, k + 1, n - k), F.slice(ws, F.lit(1), k)), " "
    )
    out = docs.crossJoin(F.broadcast(copies)).select(
        (F.col("doc_id") * COPIES + F.col("copy")).alias("doc_id"),
        rotated.alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    )
    if os.path.exists(SCRATCH):
        shutil.rmtree(SCRATCH)
    os.makedirs(SCRATCH, exist_ok=True)
    out.write.mode("overwrite").parquet(f"{SCRATCH}/documents.parquet")
    build_scaled_events(spark)
    build_scaled_embeddings(spark)
    build_scaled_tpch(spark)
    return SCRATCH


def build_scaled_tpch(spark) -> None:
    """10x customer/orders/lineitem with key spaces scaled in LOCKSTEP
    (every key k -> k*COPIES+copy) so FK integrity — the property
    dq_audit checks — is preserved exactly."""
    from pyspark.sql import functions as F

    copies = spark.range(COPIES).select(F.col("id").cast("long").alias("copy"))

    def scaled(name: str, keys: list[str]):
        df = spark.read.parquet(f"{SRC_SF}/{name}.parquet")
        out = df.crossJoin(F.broadcast(copies)).select(
            *[
                (F.col(c) * COPIES + F.col("copy")).alias(c)
                if c in keys
                else F.col(c)
                for c in df.columns
            ]
        )
        out.write.mode("overwrite").parquet(f"{SCRATCH}/{name}.parquet")

    scaled("customer", ["c_custkey"])
    scaled("orders", ["o_orderkey", "o_custkey"])
    scaled("lineitem", ["l_orderkey"])


def build_scaled_events(spark) -> None:
    """10× events for the temporal/layout operators: copies get DISJOINT
    user-id spaces (user_id*COPIES+copy) so every per-user sequence —
    the thing the as-of/SCD2/interval operators key on — is preserved
    exactly while the table grows 10×."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SRC_SF}/events.parquet")
    copies = spark.range(COPIES).select(F.col("id").cast("long").alias("copy"))
    out = ev.crossJoin(F.broadcast(copies)).select(
        (F.col("event_id") * COPIES + F.col("copy")).alias("event_id"),
        "ts",
        (F.col("user_id") * COPIES + F.col("copy")).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    out.write.mode("overwrite").parquet(f"{SCRATCH}/events.parquet")


def build_scaled_embeddings(spark) -> None:
    """10x embeddings for the linalg/ANN operators: disjoint vec_id
    spaces plus a copy-specific cyclic rotation of the vector dims --
    norms (and hence the Gram trace and cosine structure within a
    copy) are preserved exactly while LSH buckets and top-k sets
    change across copies, so the ANN candidate joins grow 10x in
    work, not just in duplicate rows."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SRC_SF}/embeddings.parquet")
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("copy"))
    v = F.col("embedding")
    d = F.size(v)
    c = F.col("copy") % F.greatest(d, F.lit(1))
    rotated = F.concat(F.slice(v, c + 1, d - c), F.slice(v, F.lit(1), c))
    out = emb.crossJoin(F.broadcast(copies)).select(
        (F.col("vec_id") * COPIES + F.col("copy")).alias("vec_id"),
        rotated.alias("embedding"),
        *[c2 for c2 in emb.columns if c2 not in ("vec_id", "embedding")],
    )
    out.write.mode("overwrite").parquet(f"{SCRATCH}/embeddings.parquet")


def stage_metrics(spark) -> dict[int, dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/stages"
    stages = json.load(urllib.request.urlopen(url))
    return {
        s["stageId"]: {
            "sw": s.get("shuffleWriteBytes", 0),
            "sr": s.get("shuffleReadBytes", 0),
        }
        for s in stages
    }


def main() -> None:
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import minhash_pairs
    from cross_sentence_relation_extraction_idepnn_spark.operators import dedup as _dedup_mod
    from cross_sentence_relation_extraction_idepnn_spark.operators import similarity as _sim_mod
    from cross_sentence_relation_extraction_idepnn_spark.operators import curation as _cur_mod
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        extract_triples,
        materialize_kg,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import get_spark, release_caches

    spark = get_spark(
        f"scale_sf1_c{CPUS}", cores=CPUS, extra_conf={"spark.ui.enabled": "true"}
    )
    sf1 = build_scaled_documents(spark)

    # warm at source scale: JIT + Python worker spin-up
    extract_triples(spark, SRC_SF).count()

    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        bloom_prefilter,
        chunk_documents,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        linkpred_eval,
        transe_step,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_assortativity,
        kg_bridges,
        kg_communities,
        kg_component_sizes,
        kg_reciprocity,
        entity_lifespan,
        predicate_cooccurrence,
        kg_support_matrix,
        kg_degree_hist,
        kg_functionality,
        kg_hyperanf,
        kg_neighbors,
        kg_triangles,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.search import (
        collocations,
        hybrid_topk,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        cms_sketch,
        hll_registers,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.textstats import (
        quality_bands,
        quality_classifier,
        source_keywords,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators import temporal
    from cross_sentence_relation_extraction_idepnn_spark.operators.layout import (
        compaction_plan,
        zonemap_prune,
        zorder_files,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_kcore,
        kg_paths,
        kg_walks,
        walk_pairs,
        canonicalize,
        entity_pmi,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.linalg import (
        embedding_gram,
        embedding_quantize,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        value_histogram,
    )

    from cross_sentence_relation_extraction_idepnn_spark.operators import similarity
    from cross_sentence_relation_extraction_idepnn_spark.plans import pipeline as _temporal_kg_mod
    import __spark_entry__ as _entry_mod
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        pii_cooccurrence as curation_pii_cooccurrence,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        mention_density,
        mention_recurrence,
        alias_hit_rate,
        detect_mentions,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
        segment,
        segmenter_divergence,
        turn_reassembly,
    )
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        conv_cohesion,
        conv_shape,
        conv_survival,
        tool_funnel,
        role_balance,
        turn_dedup,
        conv_context_budget,
        tool_effect,
        tool_latency,
        echo_rate,
        response_drift,
        tool_ngrams,
        tool_transition,
        transcripts,
        turn_latency,
    )

    def _m(s, d):
        return detect_mentions(s, segment(transcripts(s, d)))

    from pyspark.sql import functions as F

    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        dataset_split,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        minhash_delta,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        kg_neighbor_agg,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        canonicalize_incremental,
        kg_clustering,
        kg_resolve,
    )
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
        skew_profile,
    )

    def _canon_delta(s, d):
        m = _m(s, d)
        h = spark_h15(F.col("conv_id"))
        return canonicalize_incremental(
            canonicalize(m.filter(h % 2 == 0)),
            m.filter(h % 2 == 1).select("surface"),
        )

    from cross_sentence_relation_extraction_idepnn_spark.operators.curation import (
        dedup_keep_best,
        split_leakage,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.dedup import (
        containment_pairs,
        minhash_error,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_condense,
        kg_ktruss,
        kg_ppr,
        kg_provenance,
        surface_editsim,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.textstats import (
        tfidf_keywords,
    )

    from cross_sentence_relation_extraction_idepnn_spark.operators import (
        audit as audit_mod,
        curation as curation_mod,
        dedup as dedup_mod,
        search as search_mod,
        sketch as sketch_mod,
        temporal as temporal_mod,
        textstats as textstats_mod,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.candidates import (
        candidate_pairs,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.metrics import (
        annotator_agreement as _kappa,
    )

    def _agreement(s, d):
        cands = candidate_pairs(_m(s, d))
        return _kappa(
            cands.select(
                (F.col("k") <= 1).cast("int").alias("pred"),
                (F.col("k") == 0).cast("int").alias("gold"),
            )
        )

    def _cooc_truss(s, d):
        pmi = entity_pmi(_m(s, d), canonicalize(_m(s, d)))
        return kg_ktruss(
            pmi.select(F.col("e1").alias("subj"), F.col("e2").alias("obj"))
        )

    queries = {
        "kg_pipeline": extract_triples,
        "kg_materialize": materialize_kg,
        "kg_neighbors": lambda s, d: kg_neighbors(materialize_kg(s, d)),
        "kg_communities": lambda s, d: kg_communities(materialize_kg(s, d)),
        "kg_triangles": lambda s, d: kg_triangles(materialize_kg(s, d)),
        "transe_step": lambda s, d: transe_step(materialize_kg(s, d)),
        "minhash_pairs": minhash_pairs,
        # r5: standalone simhash family rows — evidence that the
        # signature-grain hot-bucket guard bounds the CANDIDATE join on
        # the identical-simhash-heavy rotation fixture (the remaining
        # dedup_family_agreement volume is the TRUE pair set itself)
        "simhash_pairs": _dedup_mod.simhash_pairs,
        "simhash_hamming_histogram": _dedup_mod.simhash_hamming_histogram,
        "simhash_signature_stats": _dedup_mod.simhash_signature_stats,
        "simhash_delta": _dedup_mod.simhash_delta,
        "ivf_probe_sweep": _sim_mod.ivf_probe_sweep,
        "lsh_band_sweep": _dedup_mod.lsh_band_sweep,
        "pack_efficiency": _cur_mod.pack_efficiency,
        "ngram_block_overflow": _dedup_mod.ngram_block_overflow,
        "chunk_documents": chunk_documents,
        "quality_classifier": quality_classifier,
        "hll_registers": hll_registers,
        "cms_sketch": cms_sketch,
        "hybrid_topk": hybrid_topk,
        "collocations": collocations,
        # filter on the enrichment column: a bare count() lets Catalyst
        # prune the window projection away and times only the scan
        "events_asof": lambda s, d: temporal.events_asof(s, d).filter(
            "last_err_id IS NOT NULL"
        ),
        "scd2_users": temporal.scd2_users,
        "quality_bands": quality_bands,
        "zorder_files": zorder_files,
        "kg_paths": lambda s, d: kg_paths(materialize_kg(s, d)),
        "embedding_gram": embedding_gram,
        "kg_kcore": lambda s, d: kg_kcore(materialize_kg(s, d)),
        "event_funnel": temporal.event_funnel,
        "value_histogram": value_histogram,
        "kg_walks": lambda s, d: kg_walks(materialize_kg(s, d)),
        "walk_pairs": lambda s, d: walk_pairs(materialize_kg(s, d)),
        "compaction_plan": compaction_plan,
        "entity_pmi": lambda s, d: entity_pmi(
            _m(s, d), canonicalize(_m(s, d))
        ),
        "ann_recall": similarity.ann_recall,
        "tool_transition": tool_transition,
        "events_cohorts": temporal.events_cohorts,
        "source_keywords": source_keywords,
        "kg_linkpred": lambda s, d: linkpred_eval(materialize_kg(s, d)),
        "events_anomalies": temporal.events_anomalies,
        "bloom_prefilter": bloom_prefilter,
        "skew_profile": skew_profile,
        "dataset_split": dataset_split,
        "canonicalize_delta": _canon_delta,
        "kg_resolve": lambda s, d: kg_resolve(materialize_kg(s, d)),
        "dedup_delta": minhash_delta,
        "kg_neighbor_agg": lambda s, d: kg_neighbor_agg(materialize_kg(s, d)),
        "kg_clustering": lambda s, d: kg_clustering(materialize_kg(s, d)),
        "kg_ppr": lambda s, d: kg_ppr(materialize_kg(s, d)),
        "kg_condense": lambda s, d: kg_condense(materialize_kg(s, d)),
        "cooc_ktruss": _cooc_truss,
        "containment_pairs": containment_pairs,
        "tfidf_keywords": tfidf_keywords,
        "split_leakage": split_leakage,
        "ivf_recall": similarity.ivf_recall,
        "minhash_error": minhash_error,
        "props_profile": temporal.props_profile,
        "dedup_keep_best": dedup_keep_best,
        "embedding_quantize": embedding_quantize,
        "surface_editsim": lambda s, d: surface_editsim(
            _m(s, d).select("surface")
        ),
        "disorder_profile": lambda s, d: temporal.disorder_profile(
            s, d, jitter=temporal.DISORDER_JITTER
        ),
        "watermark_sim": lambda s, d: temporal.watermark_sim(
            s, d, jitter=temporal.DISORDER_JITTER
        ),
        "kg_provenance": lambda s, d: kg_provenance(
            extract_triples(s, d), canonicalize(_m(s, d))
        ),
        "zonemap_prune": zonemap_prune,
        "events_quantiles": temporal.events_quantiles,
        # session-6 additions
        "snm_pairs": dedup_mod.snm_pairs,
        "retrieval_eval": search_mod.retrieval_eval,
        "phrase_search": search_mod.phrase_search,
        "kmv_sketch": sketch_mod.kmv_sketch,
        "cdc_snapshot": temporal.cdc_snapshot,
        "vocab_growth": textstats_mod.vocab_growth,
        "dq_audit": audit_mod.dq_audit,
        # sample QA at a QA-sized budget: mod=40 keeps the truth join's
        # sample at ~12.5k docs on the 500k-doc sf1 corpus (the operator
        # contract: raise mod with corpus size)
        "blocking_quality": lambda s, d: dedup_mod.blocking_quality(
            s, d, mod=40
        ),
        "rollup_delta": temporal.rollup_delta,
        "reservoir_sample": curation_mod.reservoir_sample,
        "table_stats": audit_mod.table_stats,
        "annotator_agreement": _agreement,
        "novelty_score": curation_mod.novelty_score,
        "source_diversity": textstats_mod.source_diversity,
        "join_size_est": sketch_mod.join_size_est,
        "weighted_sample": curation_mod.weighted_sample,
        "conv_neardup": dedup_mod.conv_neardup,
        # session-7 additions
        "kg_bridges": lambda s, d: kg_bridges(materialize_kg(s, d)),
        "kg_assortativity": lambda s, d: kg_assortativity(
            materialize_kg(s, d)
        ),
        "kg_hyperanf": lambda s, d: kg_hyperanf(materialize_kg(s, d)),
        "winnow_fingerprints": textstats_mod.winnow_fingerprints,
        "tool_ngrams": tool_ngrams,
        "turn_latency": turn_latency,
        "dsir_weights": curation_mod.dsir_weights,
        "tool_pii_exposure": curation_mod.tool_pii_exposure,
        # session-9 additions
        "conv_shape": conv_shape,
        "k_anonymity": curation_mod.k_anonymity,
        "dup_source_matrix": dedup_mod.dup_source_matrix,
        "source_bigram_sim": textstats_mod.source_bigram_sim,
        "calibration_bins": textstats_mod.calibration_bins,
        "response_drift": response_drift,
        "event_markov": temporal_mod.event_markov,
        "activity_gini": temporal_mod.activity_gini,
        "kg_functionality": lambda s, d: kg_functionality(
            materialize_kg(s, d)
        ),
        "conv_survival": conv_survival,
        "echo_rate": echo_rate,
        "burstiness": temporal_mod.burstiness,
        "readability": textstats_mod.readability,
        "truncation_loss": textstats_mod.truncation_loss,
        "dialog_acts": textstats_mod.dialog_acts,
        "kg_degree_hist": lambda s, d: kg_degree_hist(
            materialize_kg(s, d)
        ),
        "conv_cohesion": conv_cohesion,
        "quality_dup_matrix": dedup_mod.quality_dup_matrix,
        "gram_coverage": textstats_mod.gram_coverage,
        "event_seasonality": temporal_mod.event_seasonality,
        "len_quantiles": textstats_mod.len_quantiles,
        "fingerprint_collisions": textstats_mod.fingerprint_collisions,
        "lsh_bucket_stats": dedup_mod.lsh_bucket_stats,
        "session_gap_whatif": temporal_mod.session_gap_whatif,
        "lang_confusion": textstats_mod.lang_confusion,
        "prefix_dup_census": textstats_mod.prefix_dup_census,
        "kg_component_sizes": lambda s, d: kg_component_sizes(
            materialize_kg(s, d)
        ),
        "error_bursts": temporal_mod.error_bursts,
        "normalized_dedup": dedup_mod.normalized_dedup,
        "tool_funnel": tool_funnel,
        "partition_balance": dedup_mod.partition_balance,
        "kg_reciprocity": lambda s, d: kg_reciprocity(
            materialize_kg(s, d)
        ),
        "segmenter_divergence": segmenter_divergence,
        "role_balance": role_balance,
        "simhash_bit_bias": dedup_mod.simhash_bit_bias,
        "turn_reassembly": turn_reassembly,
        "predicate_cooccurrence": lambda s, d: predicate_cooccurrence(
            materialize_kg(s, d)
        ),
        "event_cooccurrence": temporal_mod.event_cooccurrence,
        "entity_lifespan": lambda s, d: entity_lifespan(
            _temporal_kg_mod.temporal_kg(s, d)
        ),
        "embedding_dim_profile": similarity.embedding_dim_profile,
        "jaccard_histogram": dedup_mod.jaccard_histogram,
        "pii_cooccurrence": lambda s, d: curation_pii_cooccurrence(
            s, d, plant=True
        ),
        "mention_density": mention_density,
        "kg_support_matrix": lambda s, d: kg_support_matrix(
            materialize_kg(s, d)
        ),
        "kg_temporal_incremental": _entry_mod.queries()[
            "kg_temporal_incremental"
        ],
        "mention_recurrence": mention_recurrence,
        "turn_dedup": turn_dedup,
        "zipf_profile": textstats_mod.zipf_profile,
        "kg_partitioned_write": _entry_mod.queries()["kg_partitioned_write"],
        "alias_hit_rate": alias_hit_rate,
        "simhash_hamming_histogram": dedup_mod.simhash_hamming_histogram,
        "extraction_funnel": _entry_mod.queries()["extraction_funnel"],
        "mask_census": lambda s, d: textstats_mod.mask_census(
            s, d, plant=True
        ),
        "conv_context_budget": conv_context_budget,
        "dedup_family_agreement": dedup_mod.dedup_family_agreement,
        "length_dup_matrix": dedup_mod.length_dup_matrix,
        "tool_effect": tool_effect,
        "tool_latency": tool_latency,
    }
    if ONLY:
        queries = {k: v for k, v in queries.items() if k in ONLY}
    out: dict[str, dict] = {}
    # steady-window protocol (VERDICT r4 next-#7): gate the recording on
    # the SAME host-capacity probe floors as bench.py, so sf1 rows from
    # different sessions are comparable and a scale regression is
    # distinguishable from a degraded host window.
    import bench as _bench

    probe, probe_attempts, probe_healthy = _bench.probe_gate()
    sys.stderr.write(
        f"scale_sf1 probe: healthy={probe_healthy} "
        f"attempts={probe_attempts} {probe}\n"
    )

    for name, fn in queries.items():
        release_caches()
        spark.catalog.clearCache()
        before = stage_metrics(spark)
        t0 = time.time()
        rows = fn(spark, sf1).count()
        sec = time.time() - t0
        after = stage_metrics(spark)
        new = {sid: m for sid, m in after.items() if sid not in before}
        out[name] = {
            "probe_healthy": probe_healthy,
            "sec": round(sec, 3),
            "rows": rows,
            "n_stages": len(new),
            "peak_stage_shuffle_write_mb": round(
                max((m["sw"] for m in new.values()), default=0) / 1e6, 2
            ),
            "total_shuffle_write_mb": round(
                sum(m["sw"] for m in new.values()) / 1e6, 2
            ),
            "total_shuffle_read_mb": round(
                sum(m["sr"] for m in new.values()) / 1e6, 2
            ),
        }
        sys.stderr.write(f"{name}: {out[name]}\n")

    n_docs = spark.read.parquet(f"{sf1}/documents.parquet").count()
    from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import transcripts

    n_turns = transcripts(spark, sf1).count()
    path = os.path.join(ROOT, "SCALE_SF1.json")
    result = {
        "sf_equivalent": 1.0,
        "source_sf_dir": SRC_SF,
        "copies": COPIES,
        "n_docs": n_docs,
        "n_turns": n_turns,
        "cpus": CPUS,
        # probe blocks, same shape as BENCH (VERDICT r4 next-#7): the
        # pre-recording gated probe + a post-run probe bracketing the
        # whole window; per-query rows also carry probe_healthy so
        # incremental merges stay self-describing
        "host_cpu_probe": probe,
        "host_cpu_probe_after": _bench.host_cpu_probe(),
        "probe_attempts": probe_attempts,
        "probe_healthy": probe_healthy,
        "probe_floors": _bench._probe_floors(),
        "queries": out,
    }
    if ONLY and os.path.exists(path):
        prior = json.load(open(path))
        prior["queries"].update(out)
        for k in ("host_cpu_probe", "host_cpu_probe_after",
                  "probe_attempts", "probe_healthy", "probe_floors"):
            prior[k] = result[k]
        result = prior
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
