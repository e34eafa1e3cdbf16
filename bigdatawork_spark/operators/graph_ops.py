"""Graph analytics over relations — PageRank and triangle counting on the
nation-to-nation trade graph derived from lineitem⋈orders.  REF:∅
(reference snapshot empty — SURVEY.md §0); adds the iterative-graph family
next to dedup_cluster_cc's label propagation (curation.py).

Determinism discipline for PageRank (SURVEY.md §5.3): transition
probabilities are single IEEE divisions of exact integers (bit-identical on
both engines); each iteration's per-node contribution sum is decimal-cast
(order-independent) and the new rank is ROUND(…, 12) — so five unrolled
iterations stay bit-stable cross-engine.

Scale notes: the edge build is the usual dims-broadcast fact shuffle and
aggregates to |nations|² ≤ 625 rows, so the iterative loop runs on a
broadcast-sized graph (driver loop is control flow only).  For web-scale
graphs (doc-link graphs at 100 TB) the same loop holds with the rank
relation shuffle-partitioned on node id and localCheckpoint() every few
rounds to truncate lineage — the Pregel pattern expressed as joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register


def _trade_edges_sql(weighted: bool) -> str:
    w = "COUNT(*) AS w" if weighted else "1 AS one"
    return f"""
  SELECT n1.n_name AS src, n2.n_name AS dst, {w}
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  GROUP BY src, dst
"""


def _trade_edges(spark, sf_dir):
    """(src nation, dst nation, weight) from supplier→customer line flows."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("src")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("dst")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )


_PR_ITERS = 5

_PR_ITER_SQL = """
r{i} AS (
  SELECT node,
         ROUND(CAST(0.15 AS DOUBLE) / (SELECT COUNT(*) FROM nodes)
               + CAST(0.85 AS DOUBLE) * COALESCE(contrib, CAST(0.0 AS DOUBLE)),
               12) AS pr
  FROM nodes LEFT JOIN (
    SELECT t.dst AS nd,
           CAST(SUM(CAST(r.pr * t.p AS DECIMAL(18,16))) AS DOUBLE) AS contrib
    FROM r{prev} r JOIN trans t ON r.node = t.src
    GROUP BY t.dst) c ON node = nd
)"""


@register(
    "graph_pagerank",
    oracle=(
        "WITH edges AS ("
        + _trade_edges_sql(weighted=True)
        + """),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS ow FROM edges GROUP BY src),
trans AS (
  SELECT src, dst, CAST(w AS DOUBLE) / CAST(ow AS DOUBLE) AS p
  FROM edges JOIN outw USING (src)
),
nodes AS (SELECT DISTINCT n_name AS node FROM nation),
r0 AS (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT COUNT(*) FROM nodes) AS pr
  FROM nodes
),"""
        + ",".join(
            _PR_ITER_SQL.format(i=i, prev=i - 1) for i in range(1, _PR_ITERS + 1)
        )
        + f"""
SELECT node, ROUND(pr, 8) AS pagerank
FROM r{_PR_ITERS} ORDER BY node
"""
    ),
)
def graph_pagerank(spark, sf_dir):
    """PageRank (damping 0.85, 5 fixed iterations) over the weighted
    nation trade graph.  Each iteration is join(rank, transition) →
    groupBy(dst) → decimal-exact contribution sum → ROUND(…, 12); the
    oracle unrolls the same five iterations as chained CTEs (recursive
    CTEs cannot re-aggregate per step).  Dangling-node mass is dropped on
    both sides identically.  The transition matrix broadcasts (≤625
    rows); at web scale the join flips to shuffle-on-node-id with
    periodic localCheckpoint()."""
    edges = _trade_edges(spark, sf_dir).localCheckpoint()
    outw = edges.groupBy(F.col("src").alias("ok")).agg(F.sum("w").alias("ow"))
    trans = (
        edges.join(F.broadcast(outw), edges.src == outw.ok)
        .select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("ow").cast("double")).alias("p"),
        )
        .localCheckpoint()
    )
    nodes = load(spark, sf_dir, "nation").select(F.col("n_name").alias("node")).distinct()
    n = nodes.count()
    ranks = nodes.select("node", (F.lit(1.0) / F.lit(float(n))).alias("pr"))
    for _ in range(_PR_ITERS):
        contrib = (
            ranks.join(F.broadcast(trans), ranks.node == trans.src)
            .groupBy(F.col("dst").alias("nd"))
            .agg(
                F.sum((F.col("pr") * F.col("p")).cast("decimal(18,16)"))
                .cast("double")
                .alias("contrib")
            )
        )
        ranks = nodes.join(F.broadcast(contrib), nodes.node == contrib.nd, "left_outer").select(
            "node",
            F.round(
                F.lit(0.15) / F.lit(float(n))
                + F.lit(0.85) * F.coalesce(F.col("contrib"), F.lit(0.0)),
                12,
            ).alias("pr"),
        )
    return ranks.select("node", F.round("pr", 8).alias("pagerank")).orderBy("node")


@register(
    "graph_triangle_count",
    oracle=(
        "WITH raw AS ("
        + _trade_edges_sql(weighted=False)
        + """),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst
),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e1.b = e2.a
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (SELECT x AS node FROM tris UNION ALL
      SELECT y FROM tris UNION ALL
      SELECT z FROM tris) t
GROUP BY node ORDER BY node
"""
    ),
)
def graph_triangle_count(spark, sf_dir):
    """Per-node triangle counts on the undirected nation trade graph —
    the canonical two-hop self-join: canonicalize edges to a < b
    (each triangle materializes exactly once as a<b<c), wedge-join on the
    shared middle vertex, close with a third edge probe, then explode
    each triangle to its three corners.  Integer counts are hash-stable.
    At scale the standard refinement orients edges from low- to
    high-degree vertices so wedge fan-out is bounded by O(m^1.5)
    (Suri & Vassilvitskii, WWW'11); edges here broadcast."""
    raw = _trade_edges(spark, sf_dir)
    und = (
        raw.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tris = (
        e1.join(F.broadcast(e2), F.col("y") == F.col("y2"))
        .join(
            F.broadcast(e3),
            (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")),
            "left_semi",
        )
        .select("x", "y", "z")
    )
    corners = (
        tris.select(F.col("x").alias("node"))
        .unionAll(tris.select(F.col("y").alias("node")))
        .unionAll(tris.select(F.col("z").alias("node")))
    )
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("node")
    )


_BFS_MAX_HOPS = 4


@register(
    "graph_shortest_path",
    oracle=(
        "WITH RECURSIVE edges0 AS ("
        + _trade_edges_sql(weighted=True)
        + f"""),
thr AS (
  SELECT src AS tsrc, CAST(SUM(w) AS DOUBLE) / COUNT(*) AS t
  FROM edges0 GROUP BY src
),
edges AS (
  SELECT src, dst FROM edges0 JOIN thr ON src = tsrc
  WHERE CAST(w AS DOUBLE) > t
),
bfs AS (
  SELECT (SELECT MIN(n_name) FROM nation) AS node, 0 AS hops
  UNION
  SELECT e.dst, b.hops + 1
  FROM bfs b JOIN edges e ON b.node = e.src
  WHERE b.hops < {_BFS_MAX_HOPS}
)
SELECT node, CAST(MIN(hops) AS BIGINT) AS hops
FROM bfs GROUP BY node ORDER BY node
"""
    ),
)
def graph_shortest_path(spark, sf_dir):
    """Unweighted shortest-path hop counts (BFS, ≤4 hops) from the
    MIN(n_name) nation (a computed seed — hardcoded names don't survive
    dataset renames; this one was measured to: the testdata uses
    synthetic nation names) on the trade graph SPARSIFIED per source: an
    edge survives only if its
    weight strictly exceeds its source's mean out-edge weight (the full
    nation graph is near-complete; a GLOBAL mean threshold was measured
    to orphan low-volume nations entirely — source-relative keeps every
    node ~half its out-edges, so the graph stays connected with real
    multi-hop structure, deterministically on both engines).  Spark runs
    the textbook iterative-join BFS — each
    round joins the frontier to the edge list, the closing MIN collapses
    revisits; the oracle is the same search as a recursive CTE with
    UNION-dedup.  Hop counts are integers, hash-stable.  The sparsified
    edge list broadcasts (≤625 rows); at web scale the frontier⋈edges
    join shuffles on node id with localCheckpoint() per round — same
    loop, different join strategy, which is exactly the Pregel-as-joins
    pattern PageRank above already demonstrates."""
    edges0 = _trade_edges(spark, sf_dir)
    thr = edges0.groupBy(F.col("src").alias("tsrc")).agg(
        (F.sum("w").cast("double") / F.count(F.lit(1))).alias("t")
    )
    edges = (
        edges0.join(F.broadcast(thr), edges0.src == thr.tsrc)
        .filter(F.col("w").cast("double") > F.col("t"))
        .select("src", "dst")
        .localCheckpoint()
    )
    reached = frontier = (
        load(spark, sf_dir, "nation")
        .agg(F.min("n_name").alias("node"))
        .select("node", F.lit(0).cast("int").alias("hops"))
    )
    for i in range(1, _BFS_MAX_HOPS + 1):
        frontier = (
            frontier.join(F.broadcast(edges), frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(i).alias("hops"))
            .distinct()
        )
        reached = reached.unionByName(frontier)
    return (
        reached.groupBy("node")
        .agg(F.min("hops").cast("bigint").alias("hops"))
        .orderBy("node")
    )
