"""Entity linking, canonicalization, and triple dedup.

SURVEY.md §2.3 J7 (broadcast alias-dictionary link + similarity score),
§2.9 G6 (canonicalization via connected components over
mention-similarity edges), §2.4 A10 (dedup-shuffle materialization).

The reference's nearest analogues: lowercased string-match fallback in
the mention/sentence join (``generate_bb_training_data_2016.py:313-477``),
MUC6 ``PER_ALIAS`` expansion (``generate_muc6_data.py:51-53``), and the
MUC6 ``list(set(...))`` dedup (``generate_muc6_data.py:125``).

Connected components run as iterative min-label propagation over the
edge DataFrame (GraphFrames is not in the sandbox; the loop is the
textbook large-star/small-star simplification and converges in
O(diameter) joins — mention-similarity graphs have tiny diameters).
Each iteration ``localCheckpoint``s to truncate lineage. The DuckDB
oracle expresses the same fixpoint as a recursive CTE (min reachable
label), so CC is *oracle-checked SQL-expressible* despite being
iterative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JACCARD_TAU = 0.5


def _bigrams(col):
    w = F.lower(col)
    return F.array_distinct(
        F.when(
            F.length(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.length(w) - 1),
                lambda i: w.substr(i, F.lit(2)),
            ),
        ).otherwise(F.array(w))
    )


def similarity_edges(surfaces: DataFrame, tau: float = JACCARD_TAU) -> DataFrame:
    """Distinct surfaces → undirected similarity edges (src < dst) with
    character-bigram Jaccard ≥ tau.

    Scale note: the entity *vocabulary* (distinct surfaces) is orders of
    magnitude smaller than the corpus, so the pairwise join is over a
    small dimension table — broadcast it. A 100 TB corpus with a huge
    entity vocabulary would first bucket by a cheap blocking key (e.g.
    first char) — exposed via ``block_col``-style pre-grouping if ever
    needed.
    """
    nodes = surfaces.select(F.col("surface")).distinct()
    a = nodes.select(
        F.col("surface").alias("src"), _bigrams(F.col("surface")).alias("bg1")
    )
    b = nodes.select(
        F.col("surface").alias("dst"), _bigrams(F.col("surface")).alias("bg2")
    )
    pairs = a.join(F.broadcast(b), F.col("src") < F.col("dst"))
    inter = F.size(F.array_intersect("bg1", "bg2"))
    union = F.size(F.array_union("bg1", "bg2"))
    return (
        pairs.withColumn(
            "jaccard", F.round(inter.cast("double") / union.cast("double"), 6)
        )
        .filter(F.col("jaccard") >= tau)
        .select("src", "dst", "jaccard")
    )


DRIVER_CC_MAX_NODES = 100_000


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 20,
    driver_threshold: int = DRIVER_CC_MAX_NODES,
) -> DataFrame:
    """nodes(surface) + edges(src,dst) → (surface, component) where
    component = lexicographic min surface reachable.

    The node set here is the *distinct entity-surface vocabulary* — a
    dimension table orders of magnitude smaller than the corpus. Below
    ``driver_threshold`` nodes the fixpoint runs as driver-side
    union-find (one collect, zero iterative jobs — the same shortcut
    GraphFrames-style systems take for small graphs); above it, the
    iterative min-label propagation below scales out. Both produce the
    identical (surface, min-reachable-label) mapping.
    """
    n_nodes = nodes.count()
    if n_nodes <= driver_threshold:
        surfaces = [r[0] for r in nodes.select("surface").collect()]
        parent = {s: s for s in surfaces}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.select("src", "dst").collect():
            a, b = find(r[0]), find(r[1])
            if a != b:
                # union by lexicographic min so labels are deterministic
                lo, hi = (a, b) if a < b else (b, a)
                parent[hi] = lo
        rows = [(s, find(s)) for s in sorted(surfaces)]
        return nodes.sparkSession.createDataFrame(
            rows, schema="surface string, component string"
        )
    und = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = nodes.select(
        F.col("surface"), F.col("surface").alias("component")
    ).localCheckpoint()
    for _ in range(max_iter):
        prop = (
            und.join(labels, und.src == labels.surface)
            .select(F.col("dst").alias("surface"), F.col("component"))
            .union(labels.select("surface", "component"))
            .groupBy("surface")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint()
        changed = (
            prop.alias("n")
            .join(labels.alias("o"), "surface")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = prop
        if changed == 0:
            break
    return labels


def duck_components_cte() -> str:
    """Recursive-CTE oracle over CTEs ``cc_nodes(surface)`` and
    ``cc_edges(src, dst)``: min reachable label per node."""
    return """
        WITH RECURSIVE reach(surface, lbl) AS (
            SELECT surface, surface FROM cc_nodes
            UNION
            SELECT e.dst, r.lbl
            FROM reach r
            JOIN (SELECT src, dst FROM cc_edges
                  UNION ALL
                  SELECT dst, src FROM cc_edges) e ON e.src = r.surface
        )
        SELECT surface, MIN(lbl) AS component FROM reach GROUP BY surface
    """


def canonicalize(mentions: DataFrame) -> DataFrame:
    """mention surfaces → (surface, component) canonical-cluster map."""
    nodes = mentions.select("surface").distinct()
    edges = similarity_edges(nodes)
    return connected_components(nodes, edges)


def dedup_triples(triples: DataFrame) -> DataFrame:
    """A10: distinct-triple materialization at (subj, pred, obj) grain
    with support count and max score — the dedup shuffle. Partial
    aggregation (map-side combine) keeps the exchange small at scale."""
    return (
        triples.groupBy("subj", "pred", "obj")
        .agg(
            F.count("*").alias("support"),
            F.round(F.max("score"), 6).alias("max_score"),
            F.min("k").alias("min_k"),
        )
    )
