"""Additional TPC-H query shapes (Q7/Q10/Q14/Q19 adapted to this corpus's
columns and value domains).  REF:∅ (reference snapshot empty — SURVEY.md
§0); widens §2's query surface with the classic warehouse patterns not yet
represented: bidirectional nation-pair filters, outer-data top-k, ratio of
conditional aggregates, and disjunctive multi-column predicates.

Scale notes: every query is joins + one keyed aggregation; constant-size
dims (nation/region, scalar thresholds) broadcast with pinned hints, while
SF-growing tables (customer/supplier/part) are left to the size-threshold/
AQE planner; facts shuffle once, revenue sums use the decimal-exact
discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register
from .aggregations import _dsum


@register(
    "q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: shipping volume between a nation pair (both
    directions), by ship year.  The disjunctive nation-pair predicate
    evaluates after two broadcast nation joins — the fact tables are
    filtered by the pushed ship-date range before any join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(vol, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned items
    in one quarter.  Both fact filters (order-date window, returnflag)
    push to their scans; the top-k rides TakeOrderedAndProject with a
    deterministic (revenue DESC, custkey) tiebreak."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dsum(vol, 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle="""
SELECT ROUND(
  100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE),
  6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-02-01'
""",
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue as a percentage of one month's
    revenue — the conditional-aggregate-ratio pattern.  Both sums are
    decimal-exact, so the double division sees bit-identical inputs on
    both engines and the ROUND(…,6) is stable."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_vol = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * _dsum(promo_vol, 4) / _dsum(vol, 4), 6
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q19_disjunctive",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of multi-column conjunctions spanning
    BOTH join sides.  Catalyst factors the per-side conjuncts it can
    (brand/size reach the part scan, quantity the lineitem scan as an OR)
    while the cross-side residual evaluates post-join — the classic
    disjunctive-pushdown test."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    b = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(b).agg(
        _dsum(vol, 4).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    the reused-CTE + uncorrelated-MAX-subquery pattern.  The revenue CTE
    computes once; the scalar MAX comes back as a broadcast 1-row cross
    join (NOT a whole-frame window, which would drag every supplier row
    into a single partition at scale).  Revenue is decimal-exact, so the
    equality against MAX is safe cross-engine."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q22_dormant_customers",
    oracle="""
WITH thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
),
cut AS (
  SELECT max(o_orderdate) - INTERVAL 365 DAY AS cutoff FROM orders
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, thresh, cut
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderdate > cutoff)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers DORMANT for the
    corpus's trailing 365 days (no order after max(o_orderdate) − 1 year),
    grouped by nation — uncorrelated scalar threshold + anti join.
    Dormancy is recency-based rather than TPC-H's never-ordered because
    this generator leaves NO order-less customers at small SF (r05
    measurement: 0 of 1500 at sf0.01, 1 of 15000 at sf0.1 — the original
    never-ordered predicate made the key vacuously hash-green, 0 = 0
    rows; the 365-day rule selects 149 customers at sf0.01).  The
    threshold is sum/count with a decimal-exact sum (a plain AVG of
    doubles folds in partition order, so rows at the boundary could flip
    between engines); threshold and cutoff each join back as a broadcast
    1-row cross join.  NOT EXISTS is a LEFT ANTI join shipping only the
    recency-filtered order keys."""
    c = load(spark, sf_dir, "customer")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    o = load(spark, sf_dir, "orders")
    cut = o.agg(
        F.expr("max(o_orderdate) - INTERVAL 365 DAYS").alias("cutoff")
    )
    recent = (
        o.crossJoin(F.broadcast(cut))
        .filter(F.col("o_orderdate") > F.col("cutoff"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
