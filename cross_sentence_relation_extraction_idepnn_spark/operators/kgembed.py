"""Distributed KG-embedding training step (TransE, Bordes et al. 2013).

The engine's KG product feeds embedding trainers downstream;
``linking.kg_negatives`` already materializes the corrupted-tail
training pairs. This module closes the loop with ONE full SGD step of
TransE margin-ranking training executed AS A DATAFLOW — the shape a
100 TB deployment needs, where the triple set no longer fits one
machine and per-epoch gradients must be computed as a shuffle-
aggregation rather than a parameter-server loop. The reference trains
its relation scorer on a single node (``elman-bidirection.py``
training loop); this is the distributed analogue for the KG-embedding
stage it never had, expressed Spark-first.

Exactness contract (what makes this ORACLE-CHECKABLE, unlike float
SGD): embeddings are INTEGERS — init ``e_d(name) = H(name#emb#d) %
201 - 100`` — the score is the L1 norm ``s(h,r,t) = Σ_d |h_d + r_d -
t_d|``, whose subgradient is the SIGN vector (±1/0), and the margin
loss ``max(0, margin + s_pos - s_neg)`` gates whole-pair
contributions. With learning rate 1 the update ``e' = e - Σ sign
terms`` is pure integer arithmetic: Spark and DuckDB reproduce every
updated coordinate bit-for-bit, and the pytest oracle re-derives it
independently in numpy. (Production would iterate this step with
float embeddings and row-normalization; the dataflow — and its one
gradient shuffle per step — is identical.)

Plan at scale: the corpus is never touched — everything is KG-grain.
The negatives subtree persists once and feeds the four contribution
branches (head, true tail, corrupted tail, relation); gradients are
one map-side-combinable (name, d) aggregation; the final join of the
node-dimension-sized init table against gradients broadcasts. One
real exchange (the gradient groupBy) per training step.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hashing import duck_h15, spark_h15

TRANSE_DIM = 4
TRANSE_MARGIN = 50
EMB_MOD = 201  # init values in [-100, 100]
EMB_OFF = 100
REL_PREFIX = "@rel:"  # entity ids are canonical mention surfaces — never ':'-prefixed


def _emb(name: Column, d: Column) -> Column:
    """Deterministic integer init for coordinate ``d`` of ``name``."""
    return (
        spark_h15(F.concat_ws("#", name, F.lit("emb"), d.cast("string")))
        % EMB_MOD
        - EMB_OFF
    )


def transe_step(
    kg: DataFrame,
    dim: int = TRANSE_DIM,
    margin: int = TRANSE_MARGIN,
    release: bool = True,
) -> DataFrame:
    """(name, d, val) — every entity and relation embedding coordinate
    after one exact-integer TransE SGD step over the KG's triples and
    their ``kg_negatives`` corrupted-tail pairs.

    Per (positive, negative) pair with ``margin + s_pos - s_neg > 0``:
    head and relation receive ``sign(h+r-t) - sign(h+r-t')``, the true
    tail ``-sign(h+r-t)``, the corrupted tail ``+sign(h+r-t')`` —
    summed per coordinate across all active pairs, then subtracted
    from the init (lr = 1)."""
    from pyspark.storagelevel import StorageLevel

    from ..session import cache_scope, track_cache, track_checkpoint
    from .linking import kg_negatives

    def build() -> DataFrame:
        # one kg-subtree execution feeds BOTH the negatives build and
        # the name dimension (measured at sf1: the un-persisted names
        # derivation doubled end-to-end wall time)
        from pyspark.storagelevel import StorageLevel as _SL

        base = track_cache(
            kg.select("subj", "pred", "obj").persist(_SL.MEMORY_AND_DISK)
        )
        dims = F.sequence(F.lit(0), F.lit(dim - 1))
        rel = F.concat(F.lit(REL_PREFIX), F.col("pred"))
        diff_pos = F.transform(
            dims,
            lambda d: _emb(F.col("subj"), d) + _emb(rel, d) - _emb(F.col("obj"), d),
        )
        diff_neg = F.transform(
            dims,
            lambda d: _emb(F.col("subj"), d)
            + _emb(rel, d)
            - _emb(F.col("neg_obj"), d),
        )
        l1 = lambda arr: F.aggregate(  # noqa: E731
            arr, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        )
        sign = lambda arr: F.transform(  # noqa: E731
            arr, lambda x: F.signum(x).cast("long")
        )
        # the negatives subtree (kg extraction + sampling) feeds FOUR
        # contribution branches — persist the slim pair table once
        pairs = track_cache(
            kg_negatives(base, release=False)
            .withColumn("dp", diff_pos)
            .withColumn("dn", diff_neg)
            .withColumn(
                "active", F.lit(margin) + l1(F.col("dp")) - l1(F.col("dn")) > 0
            )
            .filter("active")
            .select(
                "subj",
                "pred",
                "obj",
                "neg_obj",
                sign(F.col("dp")).alias("sp"),
                sign(F.col("dn")).alias("sn"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        head_rel_c = F.zip_with("sp", "sn", lambda a, b: a - b)

        def branch(name: Column, arr: Column) -> DataFrame:
            return pairs.select(
                name.alias("name"), F.posexplode(arr).alias("d", "c")
            )

        contribs = (
            branch(F.col("subj"), head_rel_c)
            .unionByName(branch(F.col("obj"), F.transform("sp", lambda x: -x)))
            .unionByName(branch(F.col("neg_obj"), F.col("sn")))
            .unionByName(branch(rel, head_rel_c))
        )
        grads = contribs.groupBy("name", "d").agg(F.sum("c").alias("g"))
        names = (
            base.select(F.col("subj").alias("name"))
            .unionByName(base.select(F.col("obj").alias("name")))
            .unionByName(base.select(rel.alias("name")))
            .distinct()
        )
        return (
            names.select("name", F.explode(dims).alias("d"))
            .withColumn("init", _emb(F.col("name"), F.col("d")))
            .join(grads, ["name", "d"], "left")
            .select(
                "name",
                F.col("d").cast("int").alias("d"),
                (F.col("init") - F.coalesce("g", F.lit(0)))
                .cast("long")
                .alias("val"),
            )
        )

    if not release:
        return build()
    with cache_scope():
        out = build().localCheckpoint(eager=True)
    return track_checkpoint(out)


def duck_transe_over(
    kg_cte: str, dim: int = TRANSE_DIM, margin: int = TRANSE_MARGIN
) -> str:
    """Oracle: the identical integer recurrence at (pair, d) grain —
    the negatives CTE is the shared ``duck_negatives_over`` chain
    nested over the outer KG table."""
    from .linking import duck_negatives_over

    def emb(name_expr: str) -> str:
        h = duck_h15(f"{name_expr} || '#emb#' || CAST(dm.d AS VARCHAR)")
        return f"({h} % {EMB_MOD} - {EMB_OFF})"

    return f"""
        WITH RECURSIVE okg AS MATERIALIZED ({kg_cte}),
        negs AS MATERIALIZED ({duck_negatives_over("SELECT * FROM okg")}),
        dims AS (SELECT UNNEST(range({dim})) AS d),
        pd AS MATERIALIZED (
            SELECT n.subj, n.pred, n.obj, n.neg_idx, n.neg_obj, dm.d,
                   {emb("n.subj")} + {emb(f"'{REL_PREFIX}' || n.pred")}
                       - {emb("n.obj")} AS dp,
                   {emb("n.subj")} + {emb(f"'{REL_PREFIX}' || n.pred")}
                       - {emb("n.neg_obj")} AS dn
            FROM negs n CROSS JOIN dims dm
        ),
        ps AS (
            SELECT subj, pred, obj, neg_idx,
                   SUM(ABS(dp)) AS s_pos, SUM(ABS(dn)) AS s_neg
            FROM pd GROUP BY 1, 2, 3, 4
        ),
        act AS MATERIALIZED (
            SELECT pd.* FROM pd
            JOIN ps USING (subj, pred, obj, neg_idx)
            WHERE {margin} + ps.s_pos - ps.s_neg > 0
        ),
        co AS (
            SELECT subj AS name, d,
                   CAST(SIGN(dp) AS BIGINT) - CAST(SIGN(dn) AS BIGINT) AS c
            FROM act
            UNION ALL
            SELECT obj, d, -CAST(SIGN(dp) AS BIGINT) FROM act
            UNION ALL
            SELECT neg_obj, d, CAST(SIGN(dn) AS BIGINT) FROM act
            UNION ALL
            SELECT '{REL_PREFIX}' || pred, d,
                   CAST(SIGN(dp) AS BIGINT) - CAST(SIGN(dn) AS BIGINT)
            FROM act
        ),
        gr AS (SELECT name, d, SUM(c) AS g FROM co GROUP BY 1, 2),
        nm AS (SELECT DISTINCT name FROM (
            SELECT subj AS name FROM okg
            UNION ALL SELECT obj FROM okg
            UNION ALL SELECT '{REL_PREFIX}' || pred FROM okg
        )),
        nd AS (SELECT nm.name, dm.d, {emb("nm.name")} AS init
               FROM nm CROSS JOIN dims dm)
        SELECT nd.name, CAST(nd.d AS INT) AS d,
               CAST(nd.init - COALESCE(gr.g, 0) AS BIGINT) AS val
        FROM nd LEFT JOIN gr USING (name, d)
    """


TRANSE_EPOCHS = 3


def transe_epochs(
    kg: DataFrame,
    steps: int = TRANSE_EPOCHS,
    dim: int = TRANSE_DIM,
    margin: int = TRANSE_MARGIN,
    release: bool = True,
) -> DataFrame:
    """(name, d, val) — ``steps`` full TransE SGD epochs as an
    ITERATIVE dataflow: the embedding table is explicit state that
    each epoch reads (four broadcast joins of the node-dimension-sized
    state onto the persisted-once pair table), produces one
    map-side-combinable gradient aggregation from, and updates with
    lineage truncated per epoch (eager ``localCheckpoint``, previous
    epoch's RDD freed as the next lands — the kg_pagerank /
    kg_communities discipline).

    ``steps=1`` is provably identical to :func:`transe_step` (tested);
    unlike the closed-form single step, later epochs' inits are the
    previous epoch's output, which the DuckDB oracle threads through
    as one chained CTE block per epoch — distributed multi-epoch
    KG-embedding training, bit-exact at every epoch."""
    from pyspark.storagelevel import StorageLevel

    from ..session import (
        cache_scope,
        track_cache,
        track_checkpoint,
        unpersist_checkpoint,
    )
    from .linking import kg_negatives

    def loop() -> DataFrame:
        base = track_cache(
            kg.select("subj", "pred", "obj").persist(
                StorageLevel.MEMORY_AND_DISK
            )
        )
        dims = F.sequence(F.lit(0), F.lit(dim - 1))
        rel = F.concat(F.lit(REL_PREFIX), F.col("pred"))
        pairs = track_cache(
            kg_negatives(base, release=False)
            .withColumn("rel", rel)
            .withColumn("d", F.explode(dims))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        names = (
            base.select(F.col("subj").alias("name"))
            .unionByName(base.select(F.col("obj").alias("name")))
            .unionByName(base.select(rel.alias("name")))
            .distinct()
        )
        emb = (
            names.select("name", F.explode(dims).alias("d"))
            .withColumn("val", _emb(F.col("name"), F.col("d")).cast("long"))
            .localCheckpoint(eager=release)
        )
        prev = emb if release else None

        def side(key: str, out: str):
            return F.broadcast(
                emb.select(
                    F.col("name").alias(key), "d", F.col("val").alias(out)
                )
            )

        sgn = lambda c: F.signum(c).cast("long")  # noqa: E731
        for _i in range(steps):
            j = (
                pairs.join(side("subj", "h"), ["subj", "d"])
                .join(side("rel", "r"), ["rel", "d"])
                .join(side("obj", "t"), ["obj", "d"])
                .join(side("neg_obj", "tn"), ["neg_obj", "d"])
                .withColumn("dp", F.col("h") + F.col("r") - F.col("t"))
                .withColumn("dn", F.col("h") + F.col("r") - F.col("tn"))
            )
            ps = j.groupBy("subj", "pred", "obj", "neg_idx").agg(
                F.sum(F.abs("dp")).alias("s_pos"),
                F.sum(F.abs("dn")).alias("s_neg"),
            )
            act = j.join(ps, ["subj", "pred", "obj", "neg_idx"]).filter(
                F.lit(margin) + F.col("s_pos") - F.col("s_neg") > 0
            )

            def branch(name_col, c):
                return act.select(name_col.alias("name"), "d", c.alias("c"))

            contribs = (
                branch(F.col("subj"), sgn("dp") - sgn("dn"))
                .unionByName(branch(F.col("obj"), -sgn("dp")))
                .unionByName(branch(F.col("neg_obj"), sgn("dn")))
                .unionByName(branch(F.col("rel"), sgn("dp") - sgn("dn")))
            )
            grads = contribs.groupBy("name", "d").agg(F.sum("c").alias("g"))
            emb = (
                emb.join(grads, ["name", "d"], "left")
                .select(
                    "name",
                    "d",
                    (F.col("val") - F.coalesce("g", F.lit(0)))
                    .cast("long")
                    .alias("val"),
                )
                .localCheckpoint(eager=release)
            )
            if release:
                unpersist_checkpoint(prev)
                prev = emb
        return emb

    # rename AFTER checkpoint registration (the handle needs the bare
    # LogicalRDD plan — same discipline as kg_communities)
    rename = lambda df: df.select(  # noqa: E731
        "name", F.col("d").cast("int").alias("d"), "val"
    )
    if not release:
        return rename(loop())
    with cache_scope():
        out = loop()
    return rename(track_checkpoint(out))


def duck_transe_epochs_over(
    kg_cte: str,
    steps: int = TRANSE_EPOCHS,
    dim: int = TRANSE_DIM,
    margin: int = TRANSE_MARGIN,
) -> str:
    """Oracle: one chained CTE block per epoch — each epoch's embedding
    table (emb{i}) is explicit state read by the next block, exactly
    like the Spark loop's checkpointed DataFrames."""
    from .linking import duck_negatives_over

    h0 = duck_h15("nm.name || '#emb#' || CAST(dm.d AS VARCHAR)")
    ctes = [
        f"okg AS MATERIALIZED ({kg_cte})",
        f"negs AS MATERIALIZED ({duck_negatives_over('SELECT * FROM okg')})",
        f"dims AS (SELECT UNNEST(range({dim})) AS d)",
        f"""nm AS (SELECT DISTINCT name FROM (
            SELECT subj AS name FROM okg
            UNION ALL SELECT obj FROM okg
            UNION ALL SELECT '{REL_PREFIX}' || pred FROM okg
        ))""",
        f"""emb0 AS MATERIALIZED (
            SELECT nm.name, dm.d, CAST({h0} % {EMB_MOD} - {EMB_OFF} AS BIGINT) AS val
            FROM nm CROSS JOIN dims dm
        )""",
    ]
    for i in range(steps):
        ctes.append(f"""
        pd{i} AS MATERIALIZED (
            SELECT n.subj, n.pred, n.obj, n.neg_idx, n.neg_obj, dm.d,
                   eh.val + er.val - et.val AS dp,
                   eh.val + er.val - en.val AS dn
            FROM negs n
            CROSS JOIN dims dm
            JOIN emb{i} eh ON eh.name = n.subj AND eh.d = dm.d
            JOIN emb{i} er ON er.name = '{REL_PREFIX}' || n.pred AND er.d = dm.d
            JOIN emb{i} et ON et.name = n.obj AND et.d = dm.d
            JOIN emb{i} en ON en.name = n.neg_obj AND en.d = dm.d
        )""")
        ctes.append(f"""
        ps{i} AS (
            SELECT subj, pred, obj, neg_idx,
                   SUM(ABS(dp)) AS s_pos, SUM(ABS(dn)) AS s_neg
            FROM pd{i} GROUP BY 1, 2, 3, 4
        )""")
        ctes.append(f"""
        act{i} AS MATERIALIZED (
            SELECT pd{i}.* FROM pd{i}
            JOIN ps{i} USING (subj, pred, obj, neg_idx)
            WHERE {margin} + ps{i}.s_pos - ps{i}.s_neg > 0
        )""")
        ctes.append(f"""
        gr{i} AS (
            SELECT name, d, SUM(c) AS g FROM (
                SELECT subj AS name, d,
                       CAST(SIGN(dp) AS BIGINT) - CAST(SIGN(dn) AS BIGINT) AS c
                FROM act{i}
                UNION ALL SELECT obj, d, -CAST(SIGN(dp) AS BIGINT) FROM act{i}
                UNION ALL SELECT neg_obj, d, CAST(SIGN(dn) AS BIGINT) FROM act{i}
                UNION ALL SELECT '{REL_PREFIX}' || pred, d,
                       CAST(SIGN(dp) AS BIGINT) - CAST(SIGN(dn) AS BIGINT)
                FROM act{i}
            ) GROUP BY 1, 2
        )""")
        ctes.append(f"""
        emb{i + 1} AS MATERIALIZED (
            SELECT e.name, e.d,
                   CAST(e.val - COALESCE(g.g, 0) AS BIGINT) AS val
            FROM emb{i} e LEFT JOIN gr{i} g USING (name, d)
        )""")
    return (
        "WITH RECURSIVE "
        + ", ".join(ctes)
        + f" SELECT name, CAST(d AS INT) AS d, val FROM emb{steps}"
    )


# ----------------------------------------------------- link-pred eval

LINKPRED_TEST_MOD = 5


def linkpred_eval(
    kg: DataFrame, dim: int = TRANSE_DIM, test_mod: int = LINKPRED_TEST_MOD
) -> DataFrame:
    """(subj, pred, obj, rank, rr) — raw-setting link-prediction
    evaluation of the TransE embedding table over a deterministic
    hash-held-out test slice (``H(subj#pred#obj) % test_mod == 0``):
    for each test triple the true tail is ranked among ALL entities by
    the L1 score ``Σ_d |e(subj,d) + e(rel,d) - e(tail,d)|`` (ties
    broken by entity id, so the rank is exact, not estimated);
    ``rr = 1/rank`` — averaging it downstream gives MRR, counting
    ``rank ≤ k`` gives hits@k. Evaluates the deterministic INIT table
    (the oracle-checkable surface — see the module exactness
    contract); a production run plugs the trained float table into
    the identical dataflow.

    Plan: everything is KG-grain. The entity dimension broadcasts
    into the test × entities scoring join (the standard link-pred
    eval blow-up, bounded by the hash-sampled test slice); per-test
    rank is ONE map-side-combinable count of strictly-better
    candidates. The corpus is never touched."""
    nodes = (
        kg.select(F.explode(F.array("subj", "obj")).alias("ent"))
        .distinct()
    )
    h = spark_h15(F.concat_ws("#", "subj", "pred", "obj"))
    test = kg.select("subj", "pred", "obj").distinct().filter(
        h % test_mod == 0
    )
    rel = F.concat(F.lit(REL_PREFIX), F.col("pred"))
    q = test.select(
        "subj",
        "pred",
        "obj",
        *[
            (_emb(F.col("subj"), F.lit(d)) + _emb(rel, F.lit(d))).alias(
                f"q{d}"
            )
            for d in range(dim)
        ],
    )
    s_true = sum(
        F.abs(F.col(f"q{d}") - _emb(F.col("obj"), F.lit(d)))
        for d in range(dim)
    )
    scored = q.withColumn("s_true", s_true).join(F.broadcast(nodes))
    s_cand = sum(
        F.abs(F.col(f"q{d}") - _emb(F.col("ent"), F.lit(d)))
        for d in range(dim)
    )
    better = (
        (s_cand < F.col("s_true"))
        | ((s_cand == F.col("s_true")) & (F.col("ent") < F.col("obj")))
    ).cast("long")
    return (
        scored.groupBy("subj", "pred", "obj")
        .agg((F.sum(better) + 1).cast("int").alias("rank"))
        .select(
            "subj",
            "pred",
            "obj",
            "rank",
            F.round(1.0 / F.col("rank"), 6).alias("rr"),
        )
    )


def duck_linkpred_over(
    kg_cte: str, dim: int = TRANSE_DIM, test_mod: int = LINKPRED_TEST_MOD
) -> str:
    """Oracle: identical ranks via the same hash-init embeddings and a
    plain CROSS JOIN + conditional count."""

    def e(name_sql: str, d: int) -> str:
        return f"({duck_h15(f'{name_sql} || ' + repr('#emb#' + str(d)))} % {EMB_MOD} - {EMB_OFF})"

    q = {d: f"({e('t.subj', d)} + {e(chr(39) + REL_PREFIX + chr(39) + ' || t.pred', d)})" for d in range(dim)}
    s_true = " + ".join(f"ABS({q[d]} - {e('t.obj', d)})" for d in range(dim))
    s_cand = " + ".join(f"ABS({q[d]} - {e('n.ent', d)})" for d in range(dim))
    h = duck_h15("t.subj || '#' || t.pred || '#' || t.obj")
    return f"""
        WITH kgt AS MATERIALIZED ({kg_cte}),
        nodes AS (
            SELECT DISTINCT ent FROM (
                SELECT subj AS ent FROM kgt UNION SELECT obj FROM kgt
            )
        ),
        test AS (
            SELECT DISTINCT subj, pred, obj FROM kgt t
            WHERE ({h}) % {test_mod} = 0
        ),
        ranked AS (
            SELECT t.subj, t.pred, t.obj,
                   CAST(1 + SUM(CASE WHEN ({s_cand}) < ({s_true})
                                 OR (({s_cand}) = ({s_true}) AND n.ent < t.obj)
                            THEN 1 ELSE 0 END) AS INT) AS rank
            FROM test t CROSS JOIN nodes n
            GROUP BY 1, 2, 3
        )
        SELECT subj, pred, obj, rank, ROUND(1.0 / rank, 6) AS rr
        FROM ranked
    """


def kg_neighbor_agg(
    kg: DataFrame, dim: int = TRANSE_DIM, release: bool = True
) -> DataFrame:
    """(node, d, deg, nbr_sum) — one round of GraphSAGE-style neighbor
    aggregation over the KG's distinct undirected edge set with the
    deterministic init embeddings: for each node and coordinate ``d``,
    the exact integer SUM of its neighbors' ``e_d`` plus the degree.
    This is the GNN data-prep primitive the embedding family was
    missing (negatives → step → epochs → eval → walks/skip-gram →
    NEIGHBOR AGGREGATION); emitting (sum, count) instead of a float
    mean keeps the aggregate decomposable (map-side combine, exact
    incremental merge) and the DuckDB oracle exact — the consumer
    divides.

    Plan: the symmetrized edge list is dimension-sized (KG grain, not
    corpus grain); the ``dim`` fan-out rides a broadcast range (no
    shuffle grows by ``dim`` until the single (node, d) aggregation
    exchange, which is map-side-combined). At billion-edge scale hub
    nodes make (node, d) mildly skewed — AQE splits, and the aggregate
    is decomposable so salting composes if needed."""
    from pyspark.storagelevel import StorageLevel

    from ..session import cache_scope, track_cache, track_checkpoint

    def build() -> DataFrame:
        und = track_cache(
            kg.select(
                F.least("subj", "obj").alias("u"),
                F.greatest("subj", "obj").alias("v"),
            )
            .filter(F.col("u") < F.col("v"))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        sym = und.select(
            F.col("u").alias("node"), F.col("v").alias("nbr")
        ).unionByName(und.select(F.col("v").alias("node"), F.col("u").alias("nbr")))
        dm = (
            kg.sparkSession.range(dim)
            .select(F.col("id").cast("int").alias("d"))
        )
        return (
            sym.join(F.broadcast(dm))
            .groupBy("node", "d")
            .agg(
                F.count(F.lit(1)).alias("deg"),
                F.sum(_emb(F.col("nbr"), F.col("d"))).alias("nbr_sum"),
            )
        )

    if not release:
        return build()
    with cache_scope():
        out = build().localCheckpoint(eager=True)
    return track_checkpoint(out)


def duck_neighbor_agg_over(kg_cte: str, dim: int = TRANSE_DIM) -> str:
    """Oracle for :func:`kg_neighbor_agg`: the same symmetrized-edge ×
    dimension aggregation in SQL with the hash init re-derived
    byte-for-byte."""
    emb = (
        f"({duck_h15('s.nbr || ' + repr('#emb#') + ' || CAST(dm.d AS VARCHAR)')}"
        f" % {EMB_MOD} - {EMB_OFF})"
    )
    return f"""
        WITH RECURSIVE kg AS MATERIALIZED ({kg_cte}),
        und AS (
            SELECT DISTINCT LEAST(subj, obj) AS u, GREATEST(subj, obj) AS v
            FROM kg WHERE LEAST(subj, obj) < GREATEST(subj, obj)
        ),
        sym AS (
            SELECT u AS node, v AS nbr FROM und
            UNION ALL
            SELECT v AS node, u AS nbr FROM und
        ),
        dm AS (SELECT UNNEST(range(0, {dim})) AS d)
        SELECT s.node, CAST(dm.d AS INT) AS d,
               COUNT(*) AS deg,
               CAST(SUM({emb}) AS BIGINT) AS nbr_sum
        FROM sym s CROSS JOIN dm
        GROUP BY s.node, dm.d
    """
