"""Pivot / unpivot / bucketed-join operators (beyond SURVEY §2 — standard
analytics-engine surface).  REF:∅.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


@register(
    "agg_pivot",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def agg_pivot(spark, sf_dir):
    """Pivot order counts: status rows × priority columns.  Explicit value
    list (no discovery pass) — at scale an unlisted pivot would first scan
    for distinct values; listing them keeps it a single aggregate."""
    o = load(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renamed = pivoted
    for src, dst in zip(_PRIORITIES, _PRIORITY_COLS):
        renamed = renamed.withColumnRenamed(src, dst)
    exprs = [F.coalesce(F.col(c), F.lit(0)).alias(c) for c in _PRIORITY_COLS]
    return renamed.select("o_orderstatus", *exprs).orderBy("o_orderstatus")


@register(
    "reshape_unpivot",
    oracle="""
SELECT c_custkey, metric, val FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
  FROM customer
)
ORDER BY c_custkey, metric
""",
)
def reshape_unpivot(spark, sf_dir):
    """Unpivot (melt): wide customer columns → long (metric, val) rows.
    Zero-shuffle: unpivot is a per-row generator."""
    c = load(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .orderBy("c_custkey", "metric")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
)
def join_bucketed_colocated(spark, sf_dir):
    """The SCALE.md bucketing story, executed: write orders+lineitem
    bucketed by the join key (8 buckets), join the bucketed tables.  Both
    sides arrive pre-partitioned, so the join plan contains NO shuffle
    exchange (asserted in tests/test_plans.py) — at 100 TB this deletes the
    dominant cost of fact⋈fact joins.

    Hash-checked since r14 (was rows-only as "bucketed tables live in the
    local warehouse" — but the contract is the bucketed join PRODUCING
    the same relation as the plain join, which is plain SQL on the source
    views; a bucketing layout that dropped or duplicated rows now
    hash-mismatches, on top of the zero-Exchange plan pin)."""
    # pid-scoped external-table path: a shared dir lets two concurrent
    # verification processes overwrite each other's bucket files mid-read
    # (same race class as io_ops._TMP_ROOT, hardened in round 4)
    warehouse = os.path.join(tempfile.gettempdir(), f"bdw_warehouse-{os.getpid()}")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    ot, lt = f"bdw_orders_b_{tag}", f"bdw_lineitem_b_{tag}"
    if not spark.catalog.tableExists(ot):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice", "o_orderstatus")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", os.path.join(warehouse, ot))  # external table
            .mode("overwrite")
            .saveAsTable(ot)
        )
    if not spark.catalog.tableExists(lt):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity", "l_extendedprice")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", os.path.join(warehouse, lt))  # external table
            .mode("overwrite")
            .saveAsTable(lt)
        )
    # merge hint: at test SF the small side would broadcast (also fine, but
    # the point here is the bucketed SMJ that 100 TB facts would use)
    o = spark.table(ot).hint("merge")
    li = spark.table(lt)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "sql_interface",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def sql_interface(spark, sf_dir):
    """The ad-hoc SQL façade (sql_api.sql): corpus registered as views, an
    arbitrary Spark SQL string executed — the entry point a reference user
    reaches first."""
    from ..sql_api import sql

    return sql(
        spark,
        sf_dir,
        """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
    )


@register(
    "gen_explode_outer",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents WHERE doc_id < 40
)
SELECT doc_id, word
FROM (
  SELECT doc_id, unnest(ws) AS word FROM toks WHERE len(ws) > 0
  UNION ALL
  SELECT doc_id, NULL FROM toks WHERE len(ws) = 0
)
ORDER BY doc_id, word NULLS FIRST
""",
)
def gen_explode_outer(spark, sf_dir):
    """explode_outer: rows with EMPTY arrays survive as a single
    NULL-element row instead of vanishing — the left-join-shaped generate
    that keeps parent rows accountable (an inner explode silently drops
    empty docs; at corpus scale that's a row-count discrepancy nobody can
    audit).  The oracle models outer semantics as inner-explode UNION
    the empty-array remainder."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    toks = d.select(
        "doc_id", F.filter(F.split("text", " "), lambda w: w != "").alias("ws")
    )
    return toks.select(
        "doc_id", F.explode_outer("ws").alias("word")
    ).orderBy("doc_id", F.col("word").asc_nulls_first())


@register(
    "set_union_schema_evolve",
    oracle="""
SELECT event_id, event_type, value, CAST(NULL AS BIGINT) AS user_id
FROM events WHERE event_id < 100
UNION ALL
SELECT event_id, event_type, CAST(NULL AS DOUBLE), user_id
FROM events WHERE event_id >= 100 AND event_id < 200
ORDER BY event_id
""",
)
def set_union_schema_evolve(spark, sf_dir):
    """unionByName(allowMissingColumns=True): two relations with
    DIFFERENT column sets (one carries value, the other user_id) align by
    NAME and NULL-fill the gaps — the batch-side schema-evolution union
    (scan_schema_evolution is the storage-side twin).  Positional
    unionAll would silently mis-bind here; by-name alignment is the only
    safe union under evolving schemas."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") < 100).select("event_id", "event_type", "value")
    b = ev.filter((F.col("event_id") >= 100) & (F.col("event_id") < 200)).select(
        "event_id", "event_type", "user_id"
    )
    return a.unionByName(b, allowMissingColumns=True).orderBy("event_id")
