"""Subquery shapes — scalar-correlated, EXISTS, and IN-HAVING (TPC-H
Q17/Q4/Q18 adapted to this corpus's columns).  REF:∅ (reference snapshot
empty — SURVEY.md §0); widens §2-C/D with the decorrelation patterns every
warehouse workload leans on.

The oracles state each query the natural way (correlated subquery); the
Spark side states the DECORRELATED form explicitly — aggregate-then-join —
which is exactly what Catalyst rewrites a correlated subquery into.  Writing
the decorrelated plan by hand keeps the shuffle structure visible and
auditable (one keyed aggregation + one join per subquery, no per-row
re-execution anywhere).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register


def _dsum(col, scale: int = 2):
    """Exact sum of a double column via decimal cast; result as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


@register(
    "subquery_scalar_q17",
    oracle="""
SELECT ROUND(
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0,
         6) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
""",
)
def subquery_scalar_q17(spark, sf_dir):
    """TPC-H Q17 shape: small-quantity-order revenue — lineitems below
    0.2× their part's average quantity.  The correlated scalar subquery
    decorrelates to a per-part aggregate joined back to the fact table:
    one groupBy(l_partkey) over lineitem (map-side partial applies), one
    equi join, no per-row subquery execution.  At 100 TB the threshold
    table is #parts rows — orders of magnitude smaller than the fact —
    and AQE broadcasts it when it fits."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresh = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(_dsum(F.col("l_extendedprice")) / 7.0, 6).alias("avg_yearly")
        )
    )


@register(
    "subquery_exists_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def subquery_exists_q4(spark, sf_dir):
    """TPC-H Q4 shape: orders (one quarter) with at least one line shipped
    >60 days after the order date, counted by priority.  EXISTS
    decorrelates to a LEFT SEMI join whose condition mixes the equi key
    with the non-equi date predicate — the semi join deduplicates
    multi-line matches for free (no DISTINCT pass), and only the order
    keys + two date columns move through the shuffle."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "subquery_in_q18",
    oracle="""
SELECT c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(l_quantity) > 300)
GROUP BY c_name, o_orderkey, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
""",
)
def subquery_in_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity exceeds 300, with their customer and quantity sum.  The IN
    + GROUP-BY-HAVING subquery decorrelates to an aggregate producing the
    qualifying key set, applied as a LEFT SEMI join before the wide
    customer join — the filter runs on the (small) aggregated key set, so
    the 3-way join only sees qualifying orders."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(_dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )
