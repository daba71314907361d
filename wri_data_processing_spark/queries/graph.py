"""Iterative graph algorithms as DataFrame programs.

Complements the label-propagation connected components in llm_dedup.py
(dedup_clusters) with PageRank over the co-purchase graph — the template for
any fixed-point iteration in Spark: a driver-side Python loop that REBUILDS
the plan each round (join ranks to edges, scatter contributions, gather by
sum), with cache()/checkpoint() breaking lineage every few rounds at scale.

Determinism: ranks are Q30 FIXED-POINT INT64, not doubles. Each update is
    rank' = floor(0.15 * 2^30) + (17 * sum(rank // degree)) // 20
— pure integer multiply/floor-divide/sum, so the result is bit-identical
regardless of partitioning, summation order, or engine (the DuckDB oracle
unrolls the same five iterations in SQL). The float PageRank everyone
writes first is NOT reproducible across partition counts; quantization is
the engineering fix, same trick as the centroid in events_analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wri_data_processing_spark.catalog import table
from wri_data_processing_spark.registry import query

_Q30 = 1_073_741_824  # 2^30, fixed-point scale: rank 1.0 == 2^30
_TELEPORT_Q = 161_061_273  # floor(0.15 * 2^30)
_ITERS = 5


def _pagerank_iter_sql() -> str:
    """Unrolled 5-iteration PageRank CTE chain (DuckDB has no aggregate in
    recursive CTEs, so the fixed iteration count is written out)."""
    parts = [
        """
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    undirected AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT u AS node, v AS nb FROM undirected
      UNION ALL
      SELECT v AS node, u AS nb FROM undirected
    ),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
            FROM edges GROUP BY node),
    r0 AS (SELECT node, CAST(1073741824 AS BIGINT) AS rq FROM deg)"""
    ]
    for k in range(1, _ITERS + 1):
        parts.append(
            f"""
    r{k} AS (
      SELECT e.nb AS node,
             CAST(161061273 + (17 * SUM(r.rq // d.degree)) // 20 AS BIGINT) AS rq
      FROM edges e
      JOIN r{k - 1} r ON e.node = r.node
      JOIN deg d ON e.node = d.node
      GROUP BY e.nb
    )"""
        )
    return ",".join(parts)


@query(
    "graph_pagerank",
    oracle=f"""
    WITH {_pagerank_iter_sql()}
    SELECT node, rq AS rank_q, rq / 1073741824.0 AS rank
    FROM r{_ITERS}
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {5} synchronous iterations) over the
    undirected co-purchase part graph, in Q30 integer fixed point.

    Each iteration: scatter rank//degree along edges (join), gather by sum
    (groupBy) — two shuffles on the node key that AQE coalesces; rank and
    degree stay co-partitioned so only the scatter moves data. The driver
    loop only BUILDS the plan; nothing executes until the consumer acts.
    At 100 TB: cache + localCheckpoint every ~5 rounds (lineage otherwise
    deepens linearly), and the heavy-hitter nodes this very query surfaces
    get the salted-join treatment from scale_patterns.join_skew_salted.
    The final double is rank_q / 2^30 — an exact binary scale, so even the
    float projection is bit-identical.
    """
    items = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    undirected = (
        a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v").distinct()
    )
    edges = undirected.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
        undirected.select(F.col("v").alias("node"), F.col("u").alias("nb"))
    )
    deg = edges.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    ranks = deg.select("node", F.lit(_Q30).cast("long").alias("rq"))
    for _ in range(_ITERS):
        contribs = (
            edges.join(ranks, "node")
            .join(deg, "node")
            .select(F.col("nb").alias("node"), F.expr("rq div degree").alias("contrib"))
        )
        ranks = contribs.groupBy("node").agg(
            F.expr(f"CAST({_TELEPORT_Q} + (17 * sum(contrib)) div 20 AS BIGINT)").alias("rq")
        )
    return ranks.select(
        "node",
        F.col("rq").alias("rank_q"),
        (F.col("rq") / F.lit(float(_Q30))).alias("rank"),
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM e e1 JOIN e e2 ON e1.pb = e2.pa
                           JOIN e e3 ON e1.pa = e3.pa AND e2.pb = e3.pb)
                AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the co-purchase graph (clustering structure).

    Edges: part pairs co-ordered >= 2 times (the support threshold is the
    scale guard — it prunes the quadratic pair tail before any graph
    work). Triangles via the canonical oriented two-path join: edges are
    stored once with pa < pb, so each triangle a<b<c is found exactly
    once as (a,b)+(b,c) closed by (a,c) — no /6 correction, no duplicate
    candidates. Two joins on the edge list; at 100 TB the standard
    refinement is degree-ordering the orientation so high-degree hubs
    generate few open wedges.
    """
    items = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("pa", "pb")
    )
    # The edge list feeds FOUR plan branches (two wedge sides, the closing
    # join, and the edge count); materialize it once — it is the post-
    # threshold survivor set (tiny by construction), and without this the
    # distinct+self-join lineage re-executes per branch (AQE breaks
    # ReusedExchange on self-joins — measured on the jaccard plan).
    e = e.localCheckpoint()
    e1 = e.select(F.col("pa").alias("x"), F.col("pb").alias("y"))
    e2 = e.select(F.col("pa").alias("y"), F.col("pb").alias("z"))
    wedges = e1.join(e2, "y")
    closed = wedges.join(
        e.select(F.col("pa").alias("x"), F.col("pb").alias("z")), ["x", "z"]
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_tri = closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return n_edges.crossJoin(n_tri)


@query(
    "graph_connected_components",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    undirected AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS MATERIALIZED (
      SELECT u AS node, v AS nb FROM undirected
      UNION ALL
      SELECT v AS node, u AS nb FROM undirected),
    l0 AS MATERIALIZED (SELECT node AS n, node AS m
      FROM (SELECT DISTINCT node FROM edges)),
    l1 AS MATERIALIZED (
      SELECT l.n,
             LEAST(l.m, pj.m, nbmin.m) AS m
      FROM l0 l
      JOIN l0 pj ON l.m = pj.n
      JOIN (SELECT e.node AS n, MIN(l2.m) AS m
            FROM edges e JOIN l0 l2 ON e.nb = l2.n GROUP BY 1) nbmin
        ON l.n = nbmin.n),
    l2 AS MATERIALIZED (
      SELECT l.n,
             LEAST(l.m, pj.m, nbmin.m) AS m
      FROM l1 l
      JOIN l1 pj ON l.m = pj.n
      JOIN (SELECT e.node AS n, MIN(l2.m) AS m
            FROM edges e JOIN l1 l2 ON e.nb = l2.n GROUP BY 1) nbmin
        ON l.n = nbmin.n),
    l3 AS MATERIALIZED (
      SELECT l.n,
             LEAST(l.m, pj.m, nbmin.m) AS m
      FROM l2 l
      JOIN l2 pj ON l.m = pj.n
      JOIN (SELECT e.node AS n, MIN(l2.m) AS m
            FROM edges e JOIN l2 l2 ON e.nb = l2.n GROUP BY 1) nbmin
        ON l.n = nbmin.n),
    l4 AS MATERIALIZED (
      SELECT l.n,
             LEAST(l.m, pj.m, nbmin.m) AS m
      FROM l3 l
      JOIN l3 pj ON l.m = pj.n
      JOIN (SELECT e.node AS n, MIN(l2.m) AS m
            FROM edges e JOIN l3 l2 ON e.nb = l2.n GROUP BY 1) nbmin
        ON l.n = nbmin.n),
    l5 AS MATERIALIZED (
      SELECT l.n,
             LEAST(l.m, pj.m, nbmin.m) AS m
      FROM l4 l
      JOIN l4 pj ON l.m = pj.n
      JOIN (SELECT e.node AS n, MIN(l2.m) AS m
            FROM edges e JOIN l4 l2 ON e.nb = l2.n GROUP BY 1) nbmin
        ON l.n = nbmin.n),
    l6 AS MATERIALIZED (
      SELECT l.n,
             LEAST(l.m, pj.m, nbmin.m) AS m
      FROM l5 l
      JOIN l5 pj ON l.m = pj.n
      JOIN (SELECT e.node AS n, MIN(l2.m) AS m
            FROM edges e JOIN l5 l2 ON e.nb = l2.n GROUP BY 1) nbmin
        ON l.n = nbmin.n)
    SELECT m AS component, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM l6 GROUP BY 1 ORDER BY 1
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph — the general-graph
    registration of the pointer-jumping min-label machinery dedup_clusters
    applies to near-dup edges (llm_dedup.propagate_min_labels), completing
    the graph family: PageRank (centrality), triangles (clustering),
    degrees (shape), components (reachability). Output: one row per
    component with its min-part-id label and node count.

    Exactness: min-label propagation converges to the per-component
    MINIMUM regardless of iteration strategy, so the engine's
    pointer-jumping fixpoint (measured: 3 rounds at both test SFs) and
    the oracle's SIX unrolled pointer-jumping rounds (covering component
    diameter up to 2^6; a bigger-diameter fixture would mismatch LOUDLY,
    not silently pass) reach the same labels. The first oracle draft was
    a recursive-CTE reachability closure — semantically cleaner but
    O(V·E): 59 s at sf0.01 on this graph's giant component, a
    driver-timeout risk; the unrolled form runs in under a second.

    Scale: the engine side is the proven bounded loop — one equi-join +
    min-aggregate + label-pointer hop per round, localCheckpoint per
    round, exact fixpoint test, cap raises rather than mislabeling.
    """
    from wri_data_processing_spark.queries.llm_dedup import propagate_min_labels

    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    labels, _rounds = propagate_min_labels(edges)
    return (
        labels.groupBy(F.col("lbl").alias("component"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("component")
    )


@query(
    "graph_jaccard_linkpred",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS MATERIALIZED (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    adj AS MATERIALIZED (
      SELECT pa AS node, pb AS nb FROM e
      UNION ALL SELECT pb, pa FROM e),
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
    cn AS (
      SELECT a1.node AS u, a2.node AS v, CAST(COUNT(*) AS BIGINT) AS cn
      FROM adj a1 JOIN adj a2 ON a1.nb = a2.nb AND a1.node < a2.node
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    cand AS (
      SELECT cn.u, cn.v, cn.cn, du.d AS du, dv.d AS dv
      FROM cn JOIN deg du ON cn.u = du.node JOIN deg dv ON cn.v = dv.node
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.pa = cn.u AND e.pb = cn.v))
    SELECT u, v, cn, du, dv,
           ROUND(CAST(cn AS DOUBLE) / CAST(du + dv - cn AS DOUBLE), 6)
             AS jaccard
    FROM cand
    ORDER BY CAST(cn AS DOUBLE) / CAST(du + dv - cn AS DOUBLE) DESC, u, v
    LIMIT 10
    """,
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: the 10 NON-adjacent part
    pairs with the highest neighbor-set Jaccard — "these two parts are
    never co-ordered, but their co-purchase neighborhoods overlap most".
    The classic common-neighbors/Jaccard recommender primitive, and the
    graph-native twin of dedup_ngram_jaccard's set similarity.

    Semantics: candidates are non-adjacent pairs with >= 2 common
    neighbors (the cn floor drops the degree-1 tail whose Jaccard is a
    vacuous 1.0 and bounds the wedge output); NOT-an-edge is a left_anti
    on the canonical pa<pb edge list — one check suffices since both
    sides store u<v.
    jaccard = cn / (du + dv - cn) with all three terms exact BIGINTs, so
    the score is ONE IEEE division — the top-10 ordering compares those
    exact quotients (tie-broken by (u, v)), bit-identical across engines.

    Scale: the wedge self-join on the shared-neighbor key is the classic
    common-neighbor enumeration — the >=2-support edge threshold prunes
    hub explosion before it (same guard as graph_triangle_count; at
    100 TB the standard refinement is capping/degree-ordering hub
    neighbor lists). Degree attachment is two equi-joins on the bounded
    candidate frame; top-10 is a TakeOrdered, never a global sort. The
    edge survivor set is localCheckpointed once and feeds adjacency,
    degrees, and the anti-join from memory (AQE breaks ReusedExchange on
    self-joins — the triangle-count lesson).
    """
    items = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("pa", "pb")
        .localCheckpoint()
    )
    adj = e.select(F.col("pa").alias("node"), F.col("pb").alias("nb")).unionAll(
        e.select(F.col("pb").alias("node"), F.col("pa").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    a1 = adj.select(F.col("node").alias("u"), F.col("nb").alias("w"))
    a2 = adj.select(F.col("node").alias("v"), F.col("nb").alias("w"))
    cn = (
        a1.join(a2, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
        .filter(F.col("cn") >= 2)
    )
    cand = (
        cn.join(
            e.select(F.col("pa").alias("u"), F.col("pb").alias("v")),
            ["u", "v"],
            "left_anti",
        )
        .join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
    )
    jac = F.col("cn").cast("double") / (
        F.col("du") + F.col("dv") - F.col("cn")
    ).cast("double")
    return (
        cand.orderBy(jac.desc(), "u", "v")
        .limit(10)
        .select("u", "v", "cn", "du", "dv", F.round(jac, 6).alias("jaccard"))
    )


_KCORE_K = 4
_KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    """Unrolled 6-round k-core peel. Every CTE is AS MATERIALIZED: each
    round references the previous edge set THREE times (degree filter +
    both endpoint joins), so without the hint DuckDB inlines the chain
    3^6 times — the graph_connected_components lesson verbatim."""
    parts = [
        """
    items AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2),
    sup AS MATERIALIZED (SELECT u, v FROM und WHERE w >= 2),
    e0 AS MATERIALIZED (
      SELECT u AS node, v AS nb FROM sup
      UNION ALL SELECT v AS node, u AS nb FROM sup)"""
    ]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(
            f"""
    k{r} AS MATERIALIZED (
      SELECT node FROM e{r - 1} GROUP BY node HAVING COUNT(*) >= {_KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT e.node, e.nb FROM e{r - 1} e
      JOIN k{r} a ON e.node = a.node JOIN k{r} b ON e.nb = b.node)"""
        )
    sel = "\n    UNION ALL ".join(
        f"SELECT {r} AS round, "
        f"(SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM e{r}) AS n_nodes, "
        f"(SELECT CAST(COUNT(*) // 2 AS BIGINT) FROM e{r}) AS n_edges"
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return ",".join(parts) + "\n    " + sel + "\n    ORDER BY round"


@query("graph_kcore", oracle=f"WITH {_kcore_oracle()}")
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (k=4, 6 synchronous rounds) over the support-2
    co-purchase graph: repeatedly delete every node with degree < k and
    the edges it carries, emitting the (n_nodes, n_edges) trajectory per
    round. The k-core is the standard "dense backbone" extractor —
    spam-farm detection, community seeding, and the usual prefilter
    before expensive clique mining.

    The TRUE k-core is the peel's fixpoint; 6 rounds is the bounded
    algorithm (the graph_connected_components contract: closure is the
    spec, a fixed unrolled round count is the implementation, and the
    trajectory itself shows convergence — two equal consecutive rows
    mean the fixpoint was reached). Support >= 2 (parts co-purchased in
    at least two orders) keeps the graph from being the near-clique the
    raw co-purchase graph is, so the peel has real work to do.

    Determinism: pure integer degree counts and semi-join survivals —
    no floats anywhere, bit-identical under any partitioning. Plan: per
    round one map-side-combined degree count plus two survivor
    equi-joins (never a cartesian); the edge set only shrinks, so round
    cost is monotonically decreasing. At 100 TB the first-round degree
    count dominates and is exactly the shape AQE skew-handles; each
    round's frame would take a localCheckpoint every few rounds to cap
    lineage, as graph_pagerank documents.
    """
    items = (
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    sup = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
    )
    edges = sup.select(F.col("u").alias("node"), F.col("v").alias("nb")).unionAll(
        sup.select(F.col("v").alias("node"), F.col("u").alias("nb"))
    )
    out = None
    for r in range(1, _KCORE_ROUNDS + 1):
        keep = (
            edges.groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("node")
        )
        # Each round references the previous edge frame three times
        # (degree filter + both endpoint joins): without a lineage cut
        # the logical plan grows 3^R copies of the base scan — the same
        # exponential the oracle's AS MATERIALIZED hints kill — and the
        # driver OOMs on plan size alone. localCheckpoint materializes
        # the shrinking edge set once per round (consumers' subplans
        # DIFFER, the case where checkpointing wins — see SCALE.md).
        edges = (
            edges.join(keep, "node")
            .join(keep.select(F.col("node").alias("nb")), "nb")
            .select("node", "nb")
            .localCheckpoint()
        )
        row = edges.agg(
            F.lit(r).alias("round"),
            F.countDistinct("node").cast("long").alias("n_nodes"),
            F.expr("count(1) div 2").cast("long").alias("n_edges"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("round")


_MKV_ITERS = 6
_MKV_Q = 1_073_741_824  # Q30, matching the PageRank fixed point


def _markov_oracle() -> str:
    """Unrolled 6-step integer power iteration over the event-type
    transition matrix; MATERIALIZED per round (each round re-reads the
    cells and the previous vector)."""
    parts = [
        f"""
    seq AS MATERIALIZED (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    m AS MATERIALIZED (
      SELECT prev AS i, event_type AS j, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    rt AS MATERIALIZED (
      SELECT i, CAST(SUM(c) AS BIGINT) AS r FROM m GROUP BY 1),
    cells AS MATERIALIZED (
      SELECT m.i, m.j, m.c, rt.r FROM m JOIN rt USING (i)),
    v0 AS MATERIALIZED (
      SELECT i AS t, CAST({_MKV_Q} // (SELECT COUNT(*) FROM rt) AS BIGINT) AS q
      FROM rt)"""
    ]
    for k in range(1, _MKV_ITERS + 1):
        parts.append(
            f"""
    v{k} AS MATERIALIZED (
      SELECT cells.j AS t,
             CAST(SUM(v.q * cells.c // cells.r) AS BIGINT) AS q
      FROM cells JOIN v{k - 1} v ON cells.i = v.t
      GROUP BY 1)"""
        )
    return (
        ",".join(parts)
        + f""",
    tot AS (SELECT CAST(SUM(q) AS BIGINT) AS s FROM v{_MKV_ITERS})
    SELECT t AS event_type, q AS visits_q,
           CAST(q AS DOUBLE) / CAST(tot.s AS DOUBLE) AS share
    FROM v{_MKV_ITERS}, tot ORDER BY t"""
    )


@query("graph_markov_steady", oracle=f"WITH {_markov_oracle()}")
def graph_markov_steady(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state of the user-journey Markov chain: 6 synchronous power
    iterations of the event-type transition matrix from a uniform start —
    "where does a session settle?", the long-run occupancy that ranks
    journey states by structural importance rather than raw frequency
    (events_transition_matrix gives the one-step view; this is its
    fixpoint, and removal-effect attribution is built on exactly this
    chain).

    Determinism: the graph_pagerank fixed point on a |types|² matrix —
    Q30 integer occupancy, each step's contribution floor((q·c)/r) pure
    integer multiply/divide (q·c tops out ~2^44, far inside int64),
    integer sums commutative under any partitioning. The share column is
    one exact division by the vector's own total (the floors make it sum
    just under 2^30; normalizing by the actual total is exact).

    Plan: ONE data-sized stage (the per-user LAG + transition count);
    the matrix is |types|² cells and every iteration is a broadcast join
    + tiny aggregate over it. At 100 TB the matrix is still 25 cells —
    the chain math is free, the transition count is the only work.
    """
    e = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    m = seq.groupBy(F.col("prev").alias("i"), F.col("event_type").alias("j")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rt = m.groupBy("i").agg(F.sum("c").cast("long").alias("r"))
    cells = m.join(F.broadcast(rt), "i").localCheckpoint()
    k_types = rt.count()
    v = rt.select(
        F.col("i").alias("t"), F.lit(_MKV_Q // k_types).cast("long").alias("q")
    )
    for _ in range(_MKV_ITERS):
        v = (
            cells.join(F.broadcast(v), cells["i"] == v["t"])
            .select("j", F.expr("q * c div r").alias("contrib"))
            .groupBy(F.col("j").alias("t"))
            .agg(F.sum("contrib").cast("long").alias("q"))
        )
    tot = v.agg(F.sum("q").cast("long").alias("s"))
    return (
        v.crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("event_type"),
            F.col("q").alias("visits_q"),
            (F.col("q").cast("double") / F.col("s").cast("double")).alias("share"),
        )
        .orderBy("event_type")
    )
