"""User-facing SQL interface: the whole corpus as temp views + arbitrary
Spark SQL.  This is how a reference user runs ad-hoc queries here
(`python -m bigdatawork_spark "SELECT ..."` drives it from the shell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load
from .registry import register
from .schemas import TABLES


def register_corpus(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (idempotent).  Views go
    through :func:`io.load`, so the events ns→µs rewrite and session tuning
    apply uniformly."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a Spark SQL string against the registered corpus."""
    register_corpus(spark, sf_dir)
    return spark.sql(query)


@register(
    "sql_catalog_api",
    oracle="""
SELECT * FROM (VALUES
  ('bdw_cat_orders', TRUE),
  ('bdw_cat_region', TRUE)
) AS t(table_name, is_temporary)
ORDER BY table_name
""",
)
def sql_catalog_api(spark, sf_dir):
    """Catalog introspection surface: register temp views, then answer
    "what tables exist?" from ``spark.catalog.listTables`` — the metadata
    API a notebook user and a metastore sync job both depend on.  The
    listing is filtered to this key's own views (the shared session
    holds others) and rebuilt as a DataFrame with a stable schema."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("bdw_cat_orders")
    load(spark, sf_dir, "region").createOrReplaceTempView("bdw_cat_region")
    rows = [
        (t.name, bool(t.isTemporary))
        for t in spark.catalog.listTables()
        if t.name.startswith("bdw_cat_")
    ]
    return spark.createDataFrame(
        sorted(rows), "table_name string, is_temporary boolean"
    ).orderBy("table_name")


@register(
    "observe_metrics",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_negative
FROM events
""",
)
def observe_metrics(spark, sf_dir):
    """DataFrame.observe(): named metrics piggyback on a query's OWN
    execution (zero extra passes) and surface through the Observation
    handle — the in-flight data-quality monitoring hook (row counts,
    invariant violations) a production pipeline attaches to every write.
    Here the observed aggregates themselves are the result, so the
    mechanism is oracle-checked: what observe() reports must equal what
    SQL computes."""
    from pyspark.sql import Observation

    obs = Observation("dq")
    ev = load(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("n_negative"),
    )
    ev.write.format("noop").mode("overwrite").save()  # the observed action
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_value"], m["n_negative"])],
        "n_rows bigint, sum_value double, n_negative bigint",
    )
