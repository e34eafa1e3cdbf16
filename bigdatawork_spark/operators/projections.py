"""§2-B projections / filters / predicates (SURVEY.md).  REF:∅.

All predicates stay on raw columns so Catalyst pushes them into the parquet
scan (PushedFilters — SURVEY.md §4 row 1); at 100 TB this is the difference
between reading row-groups and reading the table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "project_select",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net
FROM lineitem
""",
)
def project_select(spark, sf_dir):
    """Column subset + arithmetic expression with alias.  Column pruning:
    the scan should read only 4 of 11 lineitem columns (ReadSchema)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )


@register(
    "project_cast",
    oracle="""
SELECT CAST(l_linenumber AS DOUBLE) AS linenumber_d,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(l_orderkey AS VARCHAR) AS orderkey_str,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date
FROM lineitem
""",
)
def project_cast(spark, sf_dir):
    """Casts across int/double/string/timestamp/date.  double→int goes via
    FLOOR on both sides: raw CAST truncates in Spark but rounds in DuckDB
    (SURVEY.md §7.4.3) — floor removes the convention delta.  The date is
    emitted as VARCHAR: pandas materializes DuckDB DATE as midnight
    datetime64 but Spark DateType as datetime.date, which no value-hash
    canonicalization can be trusted to unify."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_linenumber").cast("double").alias("linenumber_d"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_date"),
    )


@register(
    "project_case_when",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
            WHEN o_orderpriority IN ('2-HIGH', '3-MEDIUM') THEN 'warm'
            ELSE 'cold' END AS urgency,
       CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END AS big_ticket
FROM orders
""",
)
def project_case_when(spark, sf_dir):
    """Multi-branch CASE WHEN projection — evaluates entirely inside
    whole-stage codegen as nested conditionals; branch order matters
    semantically (first match wins) and matches the SQL oracle's."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", "hot")
        .when(F.col("o_orderpriority").isin("2-HIGH", "3-MEDIUM"), "warm")
        .otherwise("cold")
        .alias("urgency"),
        F.when(F.col("o_totalprice") > 200000, 1).otherwise(0).alias("big_ticket"),
    )


@register(
    "filter_simple",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_quantity > 30
""",
)
def filter_simple(spark, sf_dir):
    """Single comparison predicate — pushed to the parquet row-group scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "filter_compound",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_quantity > 45 AND l_discount < 0.05) OR NOT (l_returnflag = 'N')
""",
)
def filter_compound(spark, sf_dir):
    """Compound predicate (AND / OR / NOT mix).  Conjuncts push to the
    parquet scan independently; the disjunctive part evaluates in the
    codegen'd Filter — no row leaves the scan stage unnecessarily."""
    li = load(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.05)) | ~(
        F.col("l_returnflag") == "N"
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "filter_in_between",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
  AND c_acctbal BETWEEN 1000 AND 5000
""",
)
def filter_in_between(spark, sf_dir):
    """IN-list + BETWEEN predicates — both convert to scan-level pushed
    filters (In / GreaterThanOrEqual+LessThanOrEqual), so row-group
    statistics skip non-matching parquet pages at any scale."""
    c = load(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_acctbal").between(1000, 5000)
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


@register(
    "filter_like",
    oracle="""
SELECT p_partkey, p_type, p_brand
FROM part
WHERE p_type LIKE 'PROMO%' OR regexp_matches(p_brand, 'Brand#1[0-9]')
""",
)
def filter_like(spark, sf_dir):
    """LIKE prefix + regex predicate (pattern chosen to behave identically
    under Java regex and DuckDB's RE2 — SURVEY.md §7.4.3)."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%") | F.col("p_brand").rlike("Brand#1[0-9]")
    ).select("p_partkey", "p_type", "p_brand")


@register(
    "filter_null",
    oracle="""
SELECT l_orderkey, l_linenumber,
       COALESCE(NULLIF(l_returnflag, 'N'), 'was-null') AS flag_or_default
FROM lineitem
WHERE (NULLIF(l_returnflag, 'N') IS NULL AND l_quantity > 48)
   OR (NULLIF(l_returnflag, 'N') IS NOT NULL AND l_quantity < 2)
""",
)
def filter_null(spark, sf_dir):
    """isNull / isNotNull / coalesce — nulls injected via NULLIF so the
    predicates are actually exercised (corpus has no natural nulls)."""
    li = load(spark, sf_dir, "lineitem")
    flag = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return li.filter(
        (flag.isNull() & (F.col("l_quantity") > 48))
        | (flag.isNotNull() & (F.col("l_quantity") < 2))
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(flag, F.lit("was-null")).alias("flag_or_default"),
    )


@register(
    "distinct_rows",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
)
def distinct_rows(spark, sf_dir):
    """SELECT DISTINCT — partial dedup before the shuffle (map-side combine),
    so at 100 TB the shuffle carries only unique pairs per partition."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()
