"""Property-style algebraic identity tests (SURVEY §5.2): catch
expression-translation bugs without oracles.  Seeded random frames."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rand_df(spark):
    rng = random.Random(42)
    rows = [
        (i, rng.randint(0, 9), rng.uniform(-100, 100), rng.choice("abcde"))
        for i in range(2000)
    ]
    return spark.createDataFrame(rows, "id long, k int, v double, tag string").cache()


def test_filter_conjunction(rand_df):
    p, q = F.col("v") > 0, F.col("k") < 5
    assert rand_df.filter(p).filter(q).count() == rand_df.filter(p & q).count()


def test_union_all_counts(rand_df):
    a = rand_df.filter(F.col("v") > 0)
    b = rand_df.filter(F.col("k") >= 5)
    assert a.unionByName(b).count() == a.count() + b.count()


def test_semi_equals_inner_distinct_left(rand_df, spark):
    dim = spark.createDataFrame([(i,) for i in range(0, 5)], "k int")
    semi = rand_df.join(dim, "k", "left_semi").count()
    inner = rand_df.join(dim.distinct(), "k", "inner").count()
    assert semi == inner  # dim keys unique → semi ≡ inner here


def test_except_intersect_partition_law(rand_df):
    a = rand_df.filter(F.col("v") > -50).select("id")
    b = rand_df.filter(F.col("v") < 50).select("id")
    assert a.exceptAll(b).count() + a.intersect(b).count() == a.count()


def test_running_sum_final_row_equals_group_sum(spark, rand_df):
    from pyspark.sql import Window

    w = (
        Window.partitionBy("k")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    final = (
        rand_df.withColumn("rs", F.sum("v").over(w))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("k").orderBy(F.col("id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .select("k", F.round("rs", 6).alias("total"))
    )
    direct = rand_df.groupBy("k").agg(F.round(F.sum("v"), 6).alias("total"))
    assert sorted(final.collect()) == sorted(direct.collect())


def test_rollup_total_equals_global(rand_df):
    roll = (
        rand_df.rollup("k", "tag")
        .agg(F.count(F.lit(1)).alias("n"), F.grouping_id().alias("gid"))
        .filter(F.col("gid") == 3)
        .collect()
    )
    assert len(roll) == 1 and roll[0]["n"] == rand_df.count()


def test_outer_join_row_accounting(rand_df, spark):
    right = spark.createDataFrame([(k, k * 10) for k in range(3, 8)], "k int, w int")
    inner = rand_df.join(right, "k", "inner").count()
    left_only = rand_df.join(right, "k", "left_anti").count()
    left = rand_df.join(right, "k", "left").count()
    assert left == inner + left_only


def test_range_partitions_are_disjoint_and_sorted(spark, sf_dir):
    """sort_range_partitioned layout property: within every partition rows
    are sorted, and partition [min,max] value ranges do not overlap."""
    from pyspark.sql import functions as F

    from bigdatawork_spark.registry import QUERIES

    df = QUERIES["sort_range_partitioned"](spark, sf_dir)
    parts = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi"))
        .orderBy("pid")
        .collect()
    )
    bounds = [(r["lo"], r["hi"]) for r in parts if r["lo"] is not None]
    assert all(b[0] <= b[1] for b in bounds)
    assert all(bounds[i][1] <= bounds[i + 1][0] for i in range(len(bounds) - 1))

    def check_sorted(it):
        import pandas as pd
        for pdf in it:
            ok = pdf["o_totalprice"].is_monotonic_increasing
            yield pd.DataFrame({"ok": [bool(ok)]})

    flags = df.select("o_totalprice").mapInPandas(check_sorted, "ok boolean").collect()
    assert all(r["ok"] for r in flags)
