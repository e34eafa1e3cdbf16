"""User-facing SQL interface: the whole corpus as temp views + arbitrary
Spark SQL.  This is how a reference user runs ad-hoc queries here
(`python -m bigdatawork_spark "SELECT ..."` drives it from the shell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import load
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
