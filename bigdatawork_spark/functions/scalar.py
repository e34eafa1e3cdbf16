"""§2-H scalar function batteries (SURVEY.md).  REF:∅.

All JVM-builtin expressions inside whole-stage codegen — no Python in the hot
path.  Engine-convention deltas handled per SURVEY §7.4.3: dayofweek
normalized to 0=Sunday on both sides, regexp_replace gets DuckDB's 'g' flag,
libm-backed functions (sqrt/ln/exp) rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "str_funcs",
    oracle="""
SELECT p_partkey,
       lower(p_name) AS name_lc,
       upper(p_brand) AS brand_uc,
       trim(p_type) AS type_trim,
       substring(p_name, 1, 5) AS name_head,
       length(p_name) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       replace(p_type, ' ', '_') AS type_snake
FROM part
""",
)
def str_funcs(spark, sf_dir):
    """lower/upper/trim/substring/length/concat_ws/lpad/replace battery."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "wordcount",
    oracle="""
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 50
""",
)
def wordcount(spark, sf_dir):
    """THE coursework op: tokenize → count → deterministic top-50.
    explode+groupBy = map-side partial count then tiny shuffle; at 100 TB
    the word-key shuffle is the classic skew case (stopwords) — AQE
    skew-split covers it, salting recipe in SURVEY §7.5."""
    d = load(spark, sf_dir, "documents")
    return (
        d.selectExpr("explode(split(lower(text), ' ')) as word")
        .where("word != ''")
        .groupBy("word")
        .agg(F.expr("count(1) as n"))
        .orderBy(F.desc("n"), "word")
        .limit(50)
    )


@register(
    "str_regexp",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
       regexp_replace(p_name, ' +', '_', 'g') AS name_compact
FROM part
""",
)
def str_regexp(spark, sf_dir):
    """regexp_extract group + global regexp_replace (DuckDB needs the 'g'
    flag; Spark replaces all matches by default — §7.4.3)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r" +", "_").alias("name_compact"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mon,
       dayofweek(CAST(o_orderdate AS DATE)) AS dow0,
       date_trunc('month', o_orderdate) AS month_start,
       o_orderdate + INTERVAL 30 DAY AS plus_30d,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end
FROM orders
""",
)
def date_funcs(spark, sf_dir):
    """Date battery.  dayofweek emitted 0=Sunday on both sides (Spark is
    1=Sunday, DuckDB 0=Sunday — §7.4.3)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        (F.dayofweek("o_orderdate") - 1).alias("dow0"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus_30d"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
    )


@register(
    "ts_funcs",
    oracle="""
SELECT event_id,
       hour(CAST(ts AS TIMESTAMP)) AS hr,
       minute(CAST(ts AS TIMESTAMP)) AS mi,
       epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS unix_sec,
       strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S'),
                '%Y-%m-%d %H:%M:%S') AS ts_reparsed
FROM events
""",
)
def ts_funcs(spark, sf_dir):
    """Timestamp battery over events.ts: extract fields, epoch seconds
    (integer floor both sides), format→parse round-trip."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.hour("ts").alias("hr"),
        F.minute("ts").alias("mi"),
        F.unix_timestamp("ts").alias("unix_sec"),
        F.to_timestamp(F.date_format("ts", "yyyy-MM-dd HH:mm:ss")).alias(
            "ts_reparsed"
        ),
    )


@register(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice / 7, 4) AS price_div,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
       ABS(l_quantity - 25) AS qty_dev,
       ROUND(pow(l_quantity, 2), 6) AS qty_sq,
       ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
       ROUND(ln(l_extendedprice), 6) AS price_ln,
       ROUND(log10(l_extendedprice), 6) AS price_log10,
       ROUND(exp(l_discount), 6) AS disc_exp,
       CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
       l_orderkey % 7 AS key_mod
FROM lineitem
""",
)
def math_funcs(spark, sf_dir):
    """Math battery.  libm-backed fns rounded to 6 dp (JVM Math vs C libm
    can differ in the last ulp)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 4).alias("price_div"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod"),
    )


@register(
    "cond_funcs",
    oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'suppressed') AS seg_masked,
       GREATEST(c_acctbal, 0.0) AS bal_floor0,
       LEAST(c_acctbal, 5000.0) AS bal_cap5k
FROM customer
""",
)
def cond_funcs(spark, sf_dir):
    """coalesce / nullif / greatest / least battery."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("suppressed")
        ).alias("seg_masked"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
    )


@register(
    "array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) * 2.0 AS head1_x2,
       CAST(embedding[2] AS DOUBLE) * 2.0 AS head2_x2,
       CAST(embedding[3] AS DOUBLE) * 2.0 AS head3_x2,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                      'sum') AS vec_sum
FROM embeddings
""",
)
def array_funcs(spark, sf_dir):
    """Higher-order array functions over the embedding column.  Elements
    cast float→double (exact) before arithmetic so both engines fold
    identical doubles in identical order — bit-exact, no rounding.

    Output columns are all scalar on purpose: the driver's canonicalizer
    pandas-sorts raw columns and crashes on array cells (``unhashable
    numpy.ndarray`` — CORRECTNESS_r01), so the transform(slice(...))
    head is unpacked via element_at into three double columns instead of
    being returned as array<double>."""
    e = load(spark, sf_dir, "embeddings")
    head3 = F.expr("transform(slice(embedding, 1, 3), x -> cast(x as double) * 2.0d)")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(head3, 1).alias("head1_x2"),
        F.element_at(head3, 2).alias("head2_x2"),
        F.element_at(head3, 3).alias("head3_x2"),
        F.size(F.expr("filter(embedding, x -> x > 0f)")).alias("n_positive"),
        F.expr(
            "aggregate(embedding, cast(0.0 as double), (acc, x) -> acc + cast(x as double))"
        ).alias("vec_sum"),
    )


@register(
    "map_json_funcs",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def map_json_funcs(spark, sf_dir):
    """Parse the JSON props column, extract integer field k, aggregate —
    the semi-structured path (JSON stays a string at rest; extraction is a
    codegen'd expression, no UDF)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("k_total"),
            F.min(k).alias("k_min"),
            F.max(k).alias("k_max"),
        )
        .orderBy("event_type")
    )


@register(
    "hash_funcs",
    oracle="""
SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
FROM documents
""",
)
def hash_funcs(spark, sf_dir):
    """md5 / sha2-256 hex digests — the exact-dedup building block."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


@register(
    "gen_posexplode",
    oracle="""
SELECT vec_id, g.i AS pos, CAST(embedding[g.i + 1] AS DOUBLE) AS x
FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
ORDER BY vec_id, pos
""",
)
def gen_posexplode(spark, sf_dir):
    """Positional explode of the embedding arrays (64 rows per vector).
    Oracle reproduces posexplode with a generate_series index join."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "xf"))
        .select("vec_id", "pos", F.col("xf").cast("double").alias("x"))
        .orderBy("vec_id", "pos")
    )


@register(
    "stat_crosstab",
    oracle="""
SELECT l_returnflag AS flag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt
FROM lineitem
GROUP BY l_returnflag
ORDER BY flag
""",
)
def stat_crosstab(spark, sf_dir):
    """Contingency table via df.stat.crosstab — the DataFrameStatFunctions
    surface (pair-count matrix in one pass)."""
    li = load(spark, sf_dir, "lineitem")
    ct = li.stat.crosstab("l_returnflag", "l_linestatus")
    return ct.select(
        F.col("l_returnflag_l_linestatus").alias("flag"),
        F.col("F").alias("f_cnt"),
        F.col("O").alias("o_cnt"),
    ).orderBy("flag")


@register(
    "url_funcs",
    oracle="""
SELECT doc_id,
       'https://' || source || '.example.com/' || lang || '/doc/'
         || CAST(doc_id AS VARCHAR) || '?len=' || CAST(n_chars AS VARCHAR)
         AS url,
       source || '.example.com' AS host,
       '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path,
       CAST(n_chars AS VARCHAR) AS len_param
FROM documents WHERE doc_id < 20 ORDER BY doc_id
""",
)
def url_funcs(spark, sf_dir):
    """URL construction + parse round-trip: build a URL from document
    attributes, then recover host / path / a query parameter with
    Spark's parse_url.  The oracle reconstructs the same components from
    the source attributes directly, so the check validates parse_url's
    RFC semantics against a known construction (DuckDB has no URL
    parser).  Pure narrow projection — codegen'd, no shuffle."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?len="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("len")).alias("len_param"),
    ).orderBy("doc_id")


@register(
    "variant_funcs",
    oracle="""
SELECT event_id,
       CAST(props->>'k' AS BIGINT) AS k,
       event_type AS t,
       CAST(props->>'k' AS BIGINT) % 10 = 0 AS k_div10
FROM events WHERE event_id < 50 ORDER BY event_id
""",
)
def variant_funcs(spark, sf_dir):
    """Spark 4 VARIANT semi-structured type: parse_json(props) once into
    an open-schema variant, then typed path extraction with variant_get —
    Spark's answer to the JSON-column pattern (binary-encoded, so repeated
    path access skips re-parsing; shredded storage at rest).  A nested
    variant built from row values proves multi-level paths.  The DuckDB
    oracle extracts the same paths with JSON operators — semantics match,
    encodings differ."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    v = F.parse_json("props")
    nested = F.parse_json(
        F.concat(
            F.lit('{"m":{"t":"'), F.col("event_type"), F.lit('"}}')
        )
    )
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(nested, "$.m.t", "string").alias("t"),
        (F.variant_get(v, "$.k", "bigint") % 10 == 0).alias("k_div10"),
    ).orderBy("event_id")
