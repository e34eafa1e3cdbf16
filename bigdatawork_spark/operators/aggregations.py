"""§2-D aggregations (SURVEY.md).  REF:∅ — contract is SURVEY.md §2-D.

Determinism strategy for float hash-matching (SURVEY.md §5.3.2 / §7.4.1):
large SUMs of doubles are order-dependent across engines, so money sums are
computed exactly by casting to DECIMAL *inside* the SUM on BOTH sides, then
cast back to DOUBLE.  AVGs carry ~1e-9 absolute error at this scale, so
ROUND(avg, 6) is stable.  At 100 TB the decimal sums stay exact (decimal(38,x)
headroom) and remain a single partial+final HashAggregate — no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register


def _dsum(col, scale: int = 2):
    """Exact sum of a double column via decimal cast; result as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


@register(
    "agg_groupby_q1",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
  ROUND(AVG(l_quantity), 6) AS avg_qty,
  ROUND(AVG(l_extendedprice), 6) AS avg_price,
  ROUND(AVG(l_discount), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def agg_groupby_q1(spark, sf_dir):
    """TPC-H Q1-shape pricing summary — the flagship query (SURVEY §2-D).

    Plan shape: parquet scan (filter pushed to row-groups) → partial
    HashAggregate → single shuffle on 2 low-cardinality keys → final
    HashAggregate.  6 groups regardless of SF → scales to 100 TB with a
    tiny shuffle.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(disc_price, 4).alias("sum_disc_price"),
            _dsum(charge, 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
