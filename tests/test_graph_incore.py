"""Hybrid-path equivalence pins for the iterative KG analytics.

Each operator runs twice on the SAME materialized KG: once on the
in-core fast path (default — the sf0.001 KG is far below
``INCORE_MAX_EDGES``) and once with ``incore_max_edges=0`` forcing the
distributed per-round loop. The sorted row sets and the schemas must be
IDENTICAL — the recurrences are integer/lexicographic-exact, so the two
paths are bit-equal by construction, and this test keeps that contract
honest against future edits to either path.

A crafted worst-case graph (chain + hub + self-loops + isolated-ish
nodes) exercises the edge semantics that differ between operators
(self-loop filtering, symmetrization, sink halting, tie-breaks).
"""

from __future__ import annotations

import pytest

from cross_sentence_relation_extraction_idepnn_spark.operators import linking
from cross_sentence_relation_extraction_idepnn_spark.plans.pipeline import (
    materialize_kg,
)
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def kg(spark):
    return materialize_kg(spark, SF_SMALL)


@pytest.fixture(scope="module")
def crafted_kg(spark):
    # chain a->b->c->d, hub h -> {a..d}, self-loop s->s, back-edge d->a,
    # plus a 2-clique island (x<->y) — covers peel survival, BFS tie on
    # hub pick (h and the chain), LPA oscillation, walk sink halting
    rows = [
        ("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"), ("d", "p", "a"),
        ("h", "p", "a"), ("h", "p", "b"), ("h", "p", "c"), ("h", "p", "d"),
        ("s", "p", "s"), ("x", "p", "y"), ("y", "p", "x"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


OPS = [
    ("kg_pagerank", lambda kg, **kw: linking.kg_pagerank(kg, **kw)),
    ("kg_ppr", lambda kg, **kw: linking.kg_ppr(kg, **kw)),
    ("kg_communities", lambda kg, **kw: linking.kg_communities(kg, **kw)),
    ("kg_kcore", lambda kg, **kw: linking.kg_kcore(kg, **kw)),
    ("kg_ktruss", lambda kg, **kw: linking.kg_ktruss(kg, **kw)),
    ("kg_paths", lambda kg, **kw: linking.kg_paths(kg, **kw)),
    ("kg_walks", lambda kg, **kw: linking.kg_walks(kg, **kw)),
]


@pytest.mark.parametrize("name,op", OPS, ids=[n for n, _ in OPS])
def test_incore_matches_distributed_on_corpus_kg(name, op, kg):
    fast = op(kg)
    slow = op(kg, incore_max_edges=0)
    assert fast.schema == slow.schema, name
    assert _rows(fast) == _rows(slow), name


@pytest.mark.parametrize("name,op", OPS, ids=[n for n, _ in OPS])
def test_incore_matches_distributed_on_crafted_graph(name, op, crafted_kg):
    fast = op(crafted_kg)
    slow = op(crafted_kg, incore_max_edges=0)
    assert fast.schema == slow.schema, name
    rows = _rows(fast)
    assert rows == _rows(slow), name
    assert rows, name  # non-vacuous


def test_walk_pairs_rides_the_fast_path(kg):
    # walk_pairs composes kg_walks: the corpus-level counts must be
    # unchanged whichever path the walk corpus took
    fast = linking.walk_pairs(kg)
    slow_walks = linking.kg_walks(kg, incore_max_edges=0)
    import pyspark.sql.functions as F

    seqs = slow_walks.groupBy("start", "walk").agg(
        F.array_sort(F.collect_list(F.struct("step", "node"))).alias("seq")
    )
    pairs = F.expr(
        """flatten(transform(seq, (c, i) -> transform(
               filter(seq, (x, j) -> j != i AND abs(j - i) <= 2),
               x -> named_struct('center', c.node, 'context', x.node))))"""
    )
    slow = (
        seqs.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.center").alias("center"),
            F.col("p.context").alias("context"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    assert _rows(fast) == _rows(slow)


def test_kg_ppr_localizes_mass_to_seed_component(spark):
    """Personalization semantics: restart mass returns only to the
    seed set, so nodes unreachable from every seed score EXACTLY 0
    (integer arithmetic — no epsilon), while global kg_pagerank gives
    every node its base share. Seeds are the top-out-degree hubs."""
    # hub h -> {a,b,c,d} (out-deg 4, the clear single top-3 anchor),
    # chain a->b->c, plus an island i1->i2, i2->i1 disconnected from h
    rows = [
        ("h", "p", "a"), ("h", "p", "b"), ("h", "p", "c"), ("h", "p", "d"),
        ("a", "p", "b"), ("b", "p", "c"),
        ("i1", "p", "i2"), ("i2", "p", "i1"),
    ]
    kg = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r.node: r.ppr for r in linking.kg_ppr(kg).collect()}
    # seeds by (deg desc, node asc): h (deg 4), then a and b win the
    # lexicographic tie among the deg-1 sources {a, b, i1, i2}
    from cross_sentence_relation_extraction_idepnn_spark.operators.graph_incore import (
        ppr_seeds,
    )

    edges = [(s, o) for s, _, o in rows]
    assert ppr_seeds(edges, 3) == ["h", "a", "b"]
    # the island is unreachable from every seed: exactly zero
    assert got["i1"] == 0 and got["i2"] == 0
    # seed-adjacent mass is strictly positive
    assert got["h"] > 0 and got["c"] > 0 and got["d"] > 0
    # global pagerank, by contrast, funds the island via its base share
    pr = {r.node: r.pr for r in linking.kg_pagerank(kg).collect()}
    assert pr["i1"] > 0 and pr["i2"] > 0


def test_kg_ktruss_peels_triangle_free_edges(spark, crafted_kg):
    """Truss semantics on the crafted graph: at k=3 the triangle-
    supported cycle+star survives (and is at fixpoint) while the
    2-clique island x<->y — which no triangle touches — peels in round
    one; at k=4 the peel CASCADES to empty (round 1 keeps only the
    star spokes, which then have no triangles left)."""
    got3 = {(r.u, r.v): r.support for r in linking.kg_ktruss(crafted_kg).collect()}
    assert ("x", "y") not in got3
    assert got3[("a", "h")] == 2  # common neighbours of a and h: {b, d}
    assert got3[("a", "b")] == 1  # single triangle a-b-h
    assert len(got3) == 8  # cycle (4) + star (4)
    assert linking.kg_ktruss(crafted_kg, k=4).count() == 0


def test_kg_condense_contracts_cliques_and_keeps_backbone(spark):
    """Two disconnected 3-cliques condense to one intra-community row
    each; a lone p→q edge (whose synchronous-LPA labels oscillate with
    period 2, so after the even round count p and q keep their OWN
    labels) condenses to an inter-community backbone row; and every
    distinct edge is accounted for exactly once. (A single bridge edge
    between cliques would NOT separate them — the min-tie-break floods
    the lexicographically smallest label across any short bridge, which
    is exactly why the corpus KG condenses to one supernode.)"""
    tri1 = [("a1", "p", "a2"), ("a2", "p", "a3"), ("a3", "p", "a1")]
    tri2 = [("b1", "p", "b2"), ("b2", "p", "b3"), ("b3", "p", "b1")]
    lone = [("p", "p", "q")]
    kg = spark.createDataFrame(
        tri1 + tri2 + lone, "subj string, pred string, obj string"
    )
    got = linking.kg_condense(kg).collect()
    comm = {r.node: r.community for r in linking.kg_communities(kg).collect()}
    assert comm["a1"] == comm["a2"] == comm["a3"] == "a1"
    assert comm["b1"] == comm["b2"] == comm["b3"] == "b1"
    assert comm["p"] == "p" and comm["q"] == "q"
    assert sum(r.n_edges for r in got) == 7  # 3 + 3 + 1 distinct edges
    as_map = {(r.c_src, r.c_dst): r.n_edges for r in got}
    assert as_map == {("a1", "a1"): 3, ("b1", "b1"): 3, ("p", "q"): 1}
