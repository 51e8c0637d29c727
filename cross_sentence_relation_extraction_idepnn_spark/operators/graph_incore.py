"""In-core exact twins of the iterative KG-graph recurrences.

The KG's entity graph is DIMENSION-sized (entities), not corpus-sized:
after canonicalization even a 100 TB transcript corpus collapses to a
node set in the millions, and the bench/driver scales collapse to a
few thousand. Below that threshold, running an N-round synchronous
recurrence as N Spark jobs is pure scheduler overhead — each round is
a fixed ~0.5-1 s of job launch + broadcast + checkpoint against
milliseconds of actual arithmetic. This module supplies the *identical*
recurrences in plain Python so the operators in :mod:`linking` can run
the hybrid plan ``connected_components`` already uses (driver
union-find below ``DRIVER_CC_MAX_NODES``, distributed star rounds
above): ONE collect of the distinct edge table, the same synchronous
rounds in-core, results re-created as a local DataFrame.

Both paths are bit-identical by construction — every recurrence here
is integer/lexicographic-exact (no float summation order, no RNG), and
``tests/test_graph_incore.py`` pins in-core ≡ distributed on the same
inputs while the driver's DuckDB oracles keep covering the default
(in-core at test scales) path end-to-end.

The threshold is on DISTINCT EDGES — the quantity actually collected.
At 100 TB-derived KG sizes (10^7-10^8 edges) the operators stay on the
distributed loops; the env override exists so a deployment can tune
the crossover to its driver memory.
"""

from __future__ import annotations

import os
from collections import Counter, defaultdict
from typing import Iterable, Sequence

from ..hashing import py_h15

#: distinct-edge count at or below which the iterative KG analytics run
#: their in-core twin (one collect) instead of per-round Spark jobs.
INCORE_MAX_EDGES = int(os.environ.get("SPARK_GRAFT_INCORE_MAX_EDGES", "200000"))


def _symmetrize(pairs: Iterable[tuple[str, str]]) -> set[tuple[str, str]]:
    """Distinct undirected edge set (both orientations, self-loops
    dropped) — the ``directed ∪ reversed → distinct`` derivation the
    distributed loops build."""
    sym: set[tuple[str, str]] = set()
    for s, d in pairs:
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    return sym


def kcore(
    kg_pairs: Sequence[tuple[str, str]], k: int, rounds: int
) -> list[tuple[str, int]]:
    """(node, deg) after ``rounds`` synchronous k-core peel rounds —
    twin of :func:`linking.kg_kcore`'s loop. ``kg_pairs`` are the raw
    (subj, obj) KG rows; the symmetric distinct edge derivation and the
    "final degree measured on the surviving subgraph, nodes with no
    surviving edge absent" contract match the distributed plan."""
    nbrs: dict[str, set[str]] = defaultdict(set)
    for s, d in _symmetrize(kg_pairs):
        nbrs[s].add(d)
    alive = set(nbrs)
    for _ in range(rounds):
        alive = {
            n for n in alive if sum(1 for m in nbrs[n] if m in alive) >= k
        }
    out = []
    for n in sorted(alive):
        deg = sum(1 for m in nbrs[n] if m in alive)
        if deg > 0:
            out.append((n, deg))
    return out


def pagerank(
    edges: Sequence[tuple[str, str]], iters: int, scale: int
) -> list[tuple[str, int]]:
    """(node, pr) after ``iters`` integer fixed-point iterations — twin
    of :func:`linking.kg_pagerank`'s loop. ``edges`` must already be
    the DISTINCT (src, dst) set (self-loops kept, as in the distributed
    plan). All arithmetic is integer floor division; summation order
    cannot matter, so in-core ≡ shuffle-grouped bit-for-bit."""
    edges = list(edges)
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    n = len(nodes)
    if n == 0:
        return []
    base = (scale * 15) // (100 * n)
    outdeg = Counter(s for s, _ in edges)
    pr = {v: scale // n for v in nodes}
    for _ in range(iters):
        contrib: dict[str, int] = defaultdict(int)
        for s, d in edges:
            contrib[d] += pr[s] // outdeg[s]
        pr = {v: base + (17 * contrib.get(v, 0)) // 20 for v in nodes}
    return [(v, pr[v]) for v in sorted(nodes)]


def lpa(
    kg_pairs: Sequence[tuple[str, str]], iters: int
) -> list[tuple[str, str]]:
    """(node, community) after ``iters`` synchronous label-propagation
    rounds — twin of :func:`linking.kg_communities`'s loop. Vote = most
    frequent neighbour label over the symmetric distinct edge set, ties
    to the lexicographically smallest (the ``min(struct(-cnt, label))``
    total order); isolated / self-loop-only nodes keep their label."""
    nbrs: dict[str, list[str]] = defaultdict(list)
    for s, d in _symmetrize(kg_pairs):
        nbrs[s].append(d)
    nodes = sorted({s for s, _ in kg_pairs} | {d for _, d in kg_pairs})
    lab = {v: v for v in nodes}
    for _ in range(iters):
        nxt = {}
        for v in nodes:
            if nbrs[v]:
                cnt = Counter(lab[u] for u in nbrs[v])
                nxt[v] = min((-c, l) for l, c in cnt.items())[1]
            else:
                nxt[v] = lab[v]
        lab = nxt
    return [(v, lab[v]) for v in nodes]


def bfs_layers(
    edges: Sequence[tuple[str, str]], max_hops: int
) -> list[tuple[str, int]]:
    """(node, dist) BFS layers from the hub — twin of
    :func:`linking.kg_paths`'s loop. ``edges`` must be the DISTINCT
    directed (subj, obj) set; hub = highest out-degree, ties to the
    lexicographically smallest subject."""
    if not edges:
        return []
    outdeg = Counter(s for s, _ in edges)
    hub = min((-c, s) for s, c in outdeg.items())[1]
    adj: dict[str, set[str]] = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    dist = {hub: 0}
    frontier = [hub]
    for h in range(1, max_hops + 1):
        new = sorted(
            {d for s in frontier for d in adj[s]} - dist.keys()
        )
        if not new:
            break
        for v in new:
            dist[v] = h
        frontier = new
    return sorted(dist.items())


def walks(
    edges: Sequence[tuple[str, str]],
    n_walks: int,
    length: int,
    max_nbrs: int,
) -> list[tuple[str, int, int, str]]:
    """(start, walk, step, node) long-form walk corpus — twin of
    :func:`linking.kg_walks`'s loop. ``edges`` must be the DISTINCT
    directed (subj, obj) set; adjacency = sorted distinct objects
    truncated at ``max_nbrs``; step *t* of walk *w* from ``start``
    standing at ``node`` moves to
    ``nbrs[H(start|w|t|node) mod len(nbrs)]`` with the engine-portable
    60-bit md5 hash (:func:`hashing.py_h15`); walks halt at sinks."""
    adj: dict[str, list[str]] = {}
    objs: dict[str, set[str]] = defaultdict(set)
    for s, d in edges:
        objs[s].add(d)
    for s, ds in objs.items():
        adj[s] = sorted(ds)[:max_nbrs]
    out: list[tuple[str, int, int, str]] = []
    for start in sorted(adj):
        for w in range(n_walks):
            node = start
            out.append((start, w, 0, node))
            for t in range(1, length + 1):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                node = nbrs[py_h15(f"{start}|{w}|{t}|{node}") % len(nbrs)]
                out.append((start, w, t, node))
    return out


def ppr_seeds(edges: Sequence[tuple[str, str]], n_seeds: int) -> list[str]:
    """Deterministic seed choice shared by both engines: the
    ``n_seeds`` nodes with the highest OUT-degree over the distinct
    edge set, ties broken by node ascending — the KG's hub entities,
    the natural personalization set for 'what is close to the core of
    this graph'."""
    outdeg = Counter(s for s, _ in edges)
    return [
        v for v, _ in sorted(outdeg.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:n_seeds]


def ppr(
    edges: Sequence[tuple[str, str]], iters: int, scale: int, n_seeds: int
) -> list[tuple[str, int]]:
    """(node, ppr) after ``iters`` integer fixed-point personalized-
    PageRank iterations — twin of :func:`linking.kg_ppr`'s loop. The
    restart mass returns ONLY to the seed set (uniformly), so scores
    measure proximity to the seeds instead of global centrality. Same
    integer discipline as :func:`pagerank`: floor division everywhere,
    damping 17/20, restart 15/100 — summation order cannot matter."""
    edges = list(edges)
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    if not nodes:
        return []
    seeds = set(ppr_seeds(edges, n_seeds))
    # divisor is the REQUESTED seed count (mirrors the distributed
    # path's literal and the oracle) even if the graph has fewer hubs
    base = (scale * 15) // (100 * n_seeds)
    outdeg = Counter(s for s, _ in edges)
    pr = {v: (scale // n_seeds if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        contrib: dict[str, int] = defaultdict(int)
        for s, d in edges:
            contrib[d] += pr[s] // outdeg[s]
        pr = {
            v: (base if v in seeds else 0) + (17 * contrib.get(v, 0)) // 20
            for v in nodes
        }
    return [(v, pr[v]) for v in sorted(nodes)]


def ktruss(
    kg_pairs: Sequence[tuple[str, str]], k: int, rounds: int
) -> list[tuple[str, str, int]]:
    """(u, v, support) after ``rounds`` synchronous k-truss peel rounds
    — twin of :func:`linking.kg_ktruss`'s loop. Each round removes
    every undirected edge whose triangle support inside the current
    subgraph is < k-2; the final support is re-measured on the
    surviving subgraph (so it may be below k-2 where a partner edge
    was peeled in the last round — the synchronous-state contract)."""
    und = {(min(s, d), max(s, d)) for s, d in kg_pairs if s != d}

    def supports(es: set[tuple[str, str]]) -> dict[tuple[str, str], int]:
        nbrs: dict[str, set[str]] = defaultdict(set)
        for u, v in es:
            nbrs[u].add(v)
            nbrs[v].add(u)
        return {(u, v): len(nbrs[u] & nbrs[v]) for (u, v) in es}

    for _ in range(rounds):
        sup = supports(und)
        und = {e for e in und if sup[e] >= k - 2}
    sup = supports(und)
    return sorted((u, v, sup[(u, v)]) for (u, v) in und)
