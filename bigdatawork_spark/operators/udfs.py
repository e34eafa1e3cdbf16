"""§2-J UDF / UDAF / UDTF surface (SURVEY.md; patterns per SNIPPETS.md
87-166).  REF:∅.

UDFs are the slow path by design — every key here exists to prove the Python
extension surface, with an oracle showing the builtin-SQL equivalent.  Pandas
UDFs ride Arrow record batches (vectorized); the plain ``@F.udf`` key is the
one deliberate row-at-a-time example.  At 100 TB: pandas UDFs scale linearly
with partitions; plain Python UDFs would be rewritten as builtins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load
from ..registry import register


# NOTE: all UDF decorators live INSIDE the query builders — @udf/@pandas_udf
# parse their return type through the active SparkSession, and this module is
# imported before the driver's session exists.


@register(
    "udf_python",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_discount < 0.03 THEN 'low'
            WHEN l_discount < 0.07 THEN 'mid'
            ELSE 'high' END AS band
FROM lineitem
""",
)
def udf_python(spark, sf_dir):
    """Plain row-at-a-time Python UDF (pickled rows — the 10-100× slower
    path; kept as the API-surface proof)."""

    @F.udf("string")
    def disc_band(d: float) -> str:
        if d is None:
            return "unknown"
        if d < 0.03:
            return "low"
        if d < 0.07:
            return "mid"
        return "high"

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", disc_band("l_discount").alias("band")
    )


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net
FROM lineitem
""",
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized scalar pandas UDF over Arrow batches (SNIPPETS.md:87-103).
    Per-row IEEE arithmetic — bit-identical to the SQL expression."""

    @pandas_udf("double")
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net"),
    )


@register(
    "udaf_pandas_grouped_agg",
    oracle="""
SELECT l_suppkey,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 6) AS w_mean_price
FROM lineitem
GROUP BY l_suppkey
ORDER BY l_suppkey
""",
)
def udaf_pandas_grouped_agg(spark, sf_dir):
    """GROUPED_AGG pandas UDF: quantity-weighted mean price per supplier
    (SNIPPETS.md:106-115).  Small groups (~600 rows) keep float
    accumulation noise far below the 6-dp round."""

    @pandas_udf("double")
    def weighted_mean(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                weighted_mean("l_extendedprice", "l_quantity"), 6
            ).alias("w_mean_price")
        )
        .orderBy("l_suppkey")
    )


@register(
    "udtf_grouped_map",
    oracle="""
SELECT event_id, user_id,
       ROUND((value - AVG(value) OVER w) / stddev_samp(value) OVER w, 6) AS z
FROM events
WINDOW w AS (PARTITION BY user_id)
""",
)
def udtf_grouped_map(spark, sf_dir):
    """Grouped-map applyInPandas: per-user z-score normalization
    (SNIPPETS.md:121-166) — the custom-operator escape hatch; one shuffle on
    the group key, arbitrary pandas per group.

    The pandas callback is a closure (pickled by value) so Spark workers
    never need ``bigdatawork_spark`` on their import path.

    r16 optimization (guide §4.1 "pass only the columns the function
    needs" + §2.6 idle capacity; A/B in OPTIMIZATION_r16.md): the group
    shuffle previously carried all six event columns — including the fat
    ``props`` JSON — through the exchange AND the Arrow boundary when the
    callback reads three (Spark cannot prune into an opaque pandas
    function: 12.1 s at sf1.0 → 7.4 s with the projection), and the
    8-partition session shuffle width ran ~15k pandas groups on a quarter
    of the cores — the explicit core-width repartition on the group key
    satisfies the groupBy's required distribution, so applyInPandas runs
    per-core wide with no second exchange (→ 3.0 s)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=1)  # sample std = stddev_samp
        pdf = pdf.assign(z=((pdf["value"] - mu) / sd).round(6))
        return pdf[["event_id", "user_id", "z"]]

    ev = load(spark, sf_dir, "events")
    return (
        ev.select("event_id", "user_id", "value")
        .repartition(spark.sparkContext.defaultParallelism, "user_id")
        .groupBy("user_id")
        .applyInPandas(zscore, schema="event_id long, user_id long, z double")
    )


@register(
    "udtf_map_in_pandas",
    oracle="""
SELECT event_id, user_id, value, value * 2.0 AS value_x2
FROM events WHERE value > 90.0
""",
)
def udtf_map_in_pandas(spark, sf_dir):
    """Partition-wise mapInPandas iterator (UDTF-style: n rows in, m rows
    out) — streams Arrow batches, never materializes a partition.  Closure
    callback → pickled by value (workers don't import this package)."""

    def high_value(batches):
        for pdf in batches:
            out = pdf[pdf["value"] > 90.0]
            yield out.assign(value_x2=out["value"] * 2.0)[
                ["event_id", "user_id", "value", "value_x2"]
            ]

    ev = load(spark, sf_dir, "events")
    # guide §4.1: mapInPandas is opaque to column pruning — project the
    # three consumed columns explicitly so ts/event_type/props never
    # cross the Arrow boundary (r16)
    return ev.select("event_id", "user_id", "value").mapInPandas(
        high_value, schema="event_id long, user_id long, value double, value_x2 double"
    )


@register(
    "udtf_python",
    oracle="""
SELECT doc_id, word, length(word) AS wlen
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
""",
)
def udtf_python(spark, sf_dir):
    """Spark 4 Python UDTF: explode text into (word, wlen) rows via a
    lateral join.  Falls back to explode+builtins if the UDTF API is
    unavailable (SURVEY §7.4.8) — semantics identical either way."""
    d = load(spark, sf_dir, "documents")
    try:
        from pyspark.sql.functions import udtf

        @udtf(returnType="word: string, wlen: int")
        class WordSplit:
            def eval(self, text: str):
                if text:
                    for w in text.split(" "):
                        if w:
                            yield w, len(w)

        spark.udtf.register("word_split", WordSplit)
        d.createOrReplaceTempView("udtf_documents")
        return spark.sql(
            "SELECT doc_id, word, wlen "
            "FROM udtf_documents, LATERAL word_split(text)"
        )
    except Exception:
        return (
            d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .select("doc_id", "word", F.length("word").cast("int").alias("wlen"))
        )


@register(
    "sql_udf_register",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 250000 THEN 'jumbo'
            WHEN o_totalprice > 100000 THEN 'large'
            ELSE 'standard' END AS order_class
FROM orders
""",
)
def sql_udf_register(spark, sf_dir):
    """Register a Python UDF into the SQL catalog and call it from a SQL
    string (SNIPPETS.md:48-56 registration pattern)."""

    def order_class(p: float) -> str:
        if p > 250000:
            return "jumbo"
        if p > 100000:
            return "large"
        return "standard"

    spark.udf.register("order_class", order_class, "string")
    load(spark, sf_dir, "orders").createOrReplaceTempView("sqludf_orders")
    return spark.sql(
        "SELECT o_orderkey, order_class(o_totalprice) AS order_class "
        "FROM sqludf_orders"
    )


@register(
    "udtf_cogrouped_map",
    oracle="""
SELECT o_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       o_totalprice,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
         AS computed_charge
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey % 100 = 0
GROUP BY o_orderkey, o_totalprice
ORDER BY o_orderkey
""",
)
def udtf_cogrouped_map(spark, sf_dir):
    """Cogrouped-map applyInPandas — the two-sided custom-operator escape
    hatch: orders and lineitem cogroup on orderkey, and arbitrary pandas
    reconciles each key's two row sets (here: line count + recomputed
    order charge next to the stored total).  One co-partitioning shuffle
    per side, then pure Python per key — the API a user reaches for when
    the reconciliation logic outgrows SQL.  Run on a 1-in-100 key sample:
    per-KEY pandas invocation costs dominate when groups are tiny (≤7
    lines — measured 52 s full vs ~2 s on the 1-in-100 sample at sf0.1: ~3 ms of pandas overhead PER KEY), which is the
    honest scale note: cogroup pays off for heavy per-key logic over
    fewer, fatter keys; row-wise scalar work belongs in the JVM or a
    scalar pandas_udf (the equivalent SQL is this key's oracle).
    Per-order float sums span ≤7 lines, so the 6-dp round dominates
    accumulation-order noise (same argument as udaf_pandas_grouped_agg).
    Closure callback → pickled by value (workers never import this
    package)."""

    def recon(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "n_lines", "o_totalprice", "computed_charge"]
            )
        charge = (
            right["l_extendedprice"]
            * (1 - right["l_discount"])
            * (1 + right["l_tax"])
        ).sum()
        return pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "n_lines": [len(right)],
                "o_totalprice": [float(left["o_totalprice"].iloc[0])],
                "computed_charge": [round(float(charge), 6)],
            }
        )

    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 100 == 0)
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    )
    # r16 (guide §2.6, the udtf_grouped_map width fix): per-key pandas
    # dispatch is the declared cost here, and the 8-partition session
    # shuffle ran it on a quarter of the cores — explicit core-width
    # repartitions on the cogroup key pre-satisfy both sides' required
    # distribution, so the cogroup runs per-core wide with no extra
    # exchange (sf1.0: ~49 s audit-cold → 18.9 s cold / 6.2 s warm)
    width = spark.sparkContext.defaultParallelism
    o = o.repartition(width, "o_orderkey")
    li = li.repartition(width, "l_orderkey")
    return (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            recon,
            schema="o_orderkey long, n_lines long, o_totalprice double,"
            " computed_charge double",
        )
        .orderBy("o_orderkey")
    )


@register(
    "udtf_map_in_arrow",
    oracle="""
SELECT event_id, user_id, value, value * value AS value_sq
FROM events WHERE value > 95.0
""",
)
def udtf_map_in_arrow(spark, sf_dir):
    """mapInArrow — the zero-copy sibling of mapInPandas: the callback
    sees raw ``pyarrow.RecordBatch``es, so columnar data never converts
    to pandas at all (the fastest Python hook for vectorized libraries
    that speak Arrow natively).  Same streaming-batch contract: n rows
    in, m rows out, no partition materialization."""

    def square_high(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.Table.from_batches([batch])
            t = t.filter(pc.greater(t["value"], 95.0))
            t = t.append_column("value_sq", pc.multiply(t["value"], t["value"]))
            yield from t.select(
                ["event_id", "user_id", "value", "value_sq"]
            ).to_batches()

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.mapInArrow(
        square_high,
        schema="event_id long, user_id long, value double, value_sq double",
    )
