"""Table loading (TESTDATA.md:14-15 load path).

At 100 TB the same call reads a partitioned directory tree instead of a single
file; predicate pushdown + partition pruning come free from expressing filters
on raw columns (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table.  Tunes the session on every call so the
    driver-owned session also gets UTC/AQE/shuffle settings."""
    tune(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
