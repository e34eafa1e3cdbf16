"""Data-platform operators: table reconciliation diff, single-pass column
profiling, time-series resampling with forward fill, and Z-order clustering
keys.  REF:∅ (reference snapshot empty — SURVEY.md §0); these are the
operational tools around the query surface — migration validation, data
discovery, gap repair, and layout optimization.

Scale notes: table_diff is one full-outer join on the key (the only
correct-by-construction way to reconcile 100 TB tables — checksum
strategies degrade to this on mismatch); profile_table computes every
column's stats in ONE aggregation pass then unpivots driver-side-free;
ts_resample's spine explodes per entity so no global series materializes;
zorder_cluster is a narrow expression — the sort it feeds is
range-partitioned by Spark's global orderBy.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "table_diff",
    oracle="""
WITH lhs AS (
  SELECT event_id, value FROM events WHERE event_id % 5 <> 0
),
rhs AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END AS value
  FROM events WHERE event_id % 11 <> 0
),
j AS (
  SELECT COALESCE(lhs.event_id, rhs.event_id) AS k,
         lhs.event_id IS NULL AS only_right,
         rhs.event_id IS NULL AS only_left,
         lhs.value AS lv, rhs.value AS rv
  FROM lhs FULL OUTER JOIN rhs ON lhs.event_id = rhs.event_id
)
SELECT CASE WHEN only_left THEN 'only_left'
            WHEN only_right THEN 'only_right'
            WHEN lv = rv THEN 'equal'
            ELSE 'differs' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM j GROUP BY status ORDER BY status
""",
)
def table_diff(spark, sf_dir):
    """Table reconciliation: classify every key of two table versions as
    equal / differs / only_left / only_right (versions derived
    deterministically from events: left drops ids ≡0 mod 5, right drops
    ≡0 mod 11 and perturbs values ≡0 mod 7).  One full-outer join on the
    key, then a tiny keyed count — the migration-validation pass.  The
    value comparison is exact (both sides derive from identical parquet
    doubles).  At 100 TB both sides shuffle once on the key; comparing
    only a hash of the payload columns shrinks the shuffle further."""
    ev = load(spark, sf_dir, "events")
    lhs = ev.filter(F.col("event_id") % 5 != 0).select(
        F.col("event_id").alias("lk"), F.col("value").alias("lv")
    )
    rhs = ev.filter(F.col("event_id") % 11 != 0).select(
        F.col("event_id").alias("rk"),
        F.when(F.col("event_id") % 7 == 0, F.col("value") + 1.0)
        .otherwise(F.col("value"))
        .alias("rv"),
    )
    status = (
        F.when(F.col("rk").isNull(), "only_left")
        .when(F.col("lk").isNull(), "only_right")
        .when(F.col("lv") == F.col("rv"), "equal")
        .otherwise("differs")
    )
    return (
        lhs.join(rhs, lhs.lk == rhs.rk, "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


@register(
    "profile_table",
    oracle="""
SELECT 'o_orderkey' AS col, CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(MIN(o_orderkey) AS DOUBLE) AS min_num, CAST(MAX(o_orderkey) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
       CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
       MIN(o_totalprice), MAX(o_totalprice), NULL, NULL
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
       NULL, NULL, MIN(o_orderstatus), MAX(o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
       NULL, NULL, MIN(o_orderpriority), MAX(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
       CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
       NULL, NULL, CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
       CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)
FROM orders
ORDER BY col
""",
)
def profile_table(spark, sf_dir):
    """Column profiler over orders: per column — null count, exact
    distinct count, min/max (numerics as DOUBLE, strings/dates as
    VARCHAR).  Two passes since round 7: the PLAIN stats (nulls, min,
    max) come from one Expand-free aggregation over all columns, and the
    six exact distinct counts come from a second scan that stack()s the
    columns into narrow (col, value) rows and runs ONE grouped
    countDistinct — the former single-aggregation form mixed six
    COUNT(DISTINCT)s into one Aggregate, which Spark plans as an Expand
    replicating every row 7× (measured 14-23 s at synthetic sf1.0; the
    split form runs in ~7 s; the oracle's UNION ALL of six scans states
    the semantics, not the plan).  At 100 TB: two columnar scans beat a
    7× row replication through the aggregate exchange by an order of
    magnitude in shuffled bytes; swap COUNT(DISTINCT) for
    approx_count_distinct when ±2% suffices."""
    o = load(spark, sf_dir, "orders")
    num_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    str_cols = ["o_orderstatus", "o_orderpriority"]
    all_cols = num_cols + str_cols + ["o_orderdate"]
    aggs = []
    for c in all_cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"))
    for c in num_cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min_num"),
            F.max(c).cast("double").alias(f"{c}__max_num"),
        ]
    for c in str_cols:
        aggs += [F.min(c).alias(f"{c}__min_str"), F.max(c).alias(f"{c}__max_str")]
    aggs += [
        F.min("o_orderdate").cast("date").cast("string").alias("o_orderdate__min_str"),
        F.max("o_orderdate").cast("date").cast("string").alias("o_orderdate__max_str"),
    ]
    one = o.agg(*aggs)
    stack_expr = (
        f"stack({len(all_cols)}, "
        + ", ".join(f"'{c}', cast({c} as string)" for c in all_cols)
        + ") as (col, v)"
    )
    distinct = (
        o.selectExpr(stack_expr)
        .where("v is not null")
        .groupBy("col")
        .agg(F.countDistinct("v").alias("n_distinct"))
    )
    rows = []
    for c in num_cols:
        rows.append(
            f"named_struct('col', '{c}', 'n_nulls', {c}__nulls,"
            f" 'min_num', {c}__min_num,"
            f" 'max_num', {c}__max_num, 'min_str', CAST(NULL AS STRING),"
            " 'max_str', CAST(NULL AS STRING))"
        )
    for c in str_cols + ["o_orderdate"]:
        rows.append(
            f"named_struct('col', '{c}', 'n_nulls', {c}__nulls,"
            f" 'min_num', CAST(NULL AS DOUBLE),"
            f" 'max_num', CAST(NULL AS DOUBLE), 'min_str', {c}__min_str,"
            f" 'max_str', {c}__max_str)"
        )
    stacked = one.select(F.expr("inline(array(" + ", ".join(rows) + "))"))
    return (
        stacked.join(F.broadcast(distinct), "col")
        .select(
            "col", "n_nulls", "n_distinct", "min_num", "max_num",
            "min_str", "max_str",
        )
        .orderBy("col")
    )


@register(
    "ts_resample_ffill",
    oracle="""
WITH bounds AS (
  SELECT user_id,
         date_trunc('hour', MIN(ts)) AS t0,
         date_trunc('hour', MAX(ts)) AS t1
  FROM events WHERE user_id < 5 GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*), 6) AS avg_value
  FROM events WHERE user_id < 5 GROUP BY user_id, hour
)
SELECT s.user_id, CAST(s.hour AS VARCHAR) AS hour,
       h.avg_value IS NOT NULL AS observed,
       last_value(h.avg_value IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.hour) AS value_ffill
FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
ORDER BY s.user_id, s.hour
""",
)
def ts_resample_ffill(spark, sf_dir):
    """Time-series resampling: per entity, build a dense hourly spine
    between its first and last event, left-join the observed hourly
    aggregate, and forward-fill gaps with the last observation.  The
    spine generates per entity (sequence + explode), so no global
    timeline materializes and the window partitions by entity — at
    100 TB each entity's series fills independently inside its shuffle
    partition.  Hourly averages are decimal-exact then rounded, so the
    filled values are bit-stable."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("t0"),
            F.date_trunc("hour", F.max("ts")).alias("t1"),
        )
        .select(
            "user_id",
            F.explode(
                F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy(spine.user_id)
        .orderBy(spine.hour)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(
        hourly,
        (spine.user_id == hourly.user_id) & (spine.hour == hourly.hour),
        "left_outer",
    ).select(
        spine.user_id,
        spine.hour,
        F.col("avg_value").isNotNull().alias("observed"),
        F.last("avg_value", ignorenulls=True).over(w).alias("value_ffill"),
    )
    return joined.select(
        "user_id",
        F.col("hour").cast("string").alias("hour"),
        "observed",
        "value_ffill",
    ).orderBy("user_id", "hour")


@register(
    "zorder_cluster",
    oracle="""
WITH keyed AS (
  SELECT o_orderkey,
         CAST(o_custkey % 1024 AS BIGINT) AS x,
         CAST(dayofyear(o_orderdate) % 512 AS BIGINT) AS y
  FROM orders
),
z AS (
  SELECT o_orderkey,
         CAST(list_sum(list_transform(generate_series(0, 9),
              i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1))))
              AS BIGINT) AS zval
  FROM keyed
)
SELECT CAST(zval // 4096 AS BIGINT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(zval) AS BIGINT) AS z_min,
       CAST(MAX(zval) AS BIGINT) AS z_max
FROM z GROUP BY z_bucket ORDER BY z_bucket
""",
)
def zorder_cluster(spark, sf_dir):
    """Z-order clustering key: interleave the bits of two dimensions
    (customer bucket, day-of-year) into one Morton code, then summarize
    occupancy per Z-range bucket.  The interleave is a pure JVM-side
    bit-fold (aggregate over sequence(0,9) — no UDF).  This is the sort
    key a layout-optimization pass writes files by: range-partitioning on
    zval gives every file a tight bounding box in BOTH dimensions, so
    min/max file skipping prunes on either predicate.  The bucket
    summary here is the occupancy histogram that validates the layout."""
    o = load(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).cast("bigint").alias("x"),
        (F.dayofyear("o_orderdate") % 512).cast("bigint").alias("y"),
    )
    # r17 (guide §4.1 — higher-order functions run on the INTERPRETED
    # expression path, outside whole-stage codegen): the aggregate(
    # sequence(0,9), ...) bit-fold allocated a 10-element array and ran
    # an interpreted lambda per row; unrolling the 10 fixed iterations
    # into a flat 20-term arithmetic expression keeps the interleave in
    # codegen.  A/B at sf1.0: 3.6-3.9 s → 0.4-0.8 s, output identical.
    _terms = " + ".join(
        f"shiftleft(shiftright(x, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright(y, {i}) & 1, {2 * i + 1})"
        for i in range(10)
    )
    zval = F.expr(f"cast({_terms} as bigint)")
    return (
        keyed.select(zval.alias("zval"))
        .groupBy(F.floor(F.col("zval") / 4096).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
        .orderBy("z_bucket")
    )


@register(
    "ts_interpolate_linear",
    oracle="""
WITH bounds AS (
  SELECT user_id,
         date_trunc('hour', MIN(ts)) AS t0,
         date_trunc('hour', MAX(ts)) AS t1
  FROM events WHERE user_id < 5 GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour
  FROM bounds
),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*), 6) AS avg_value
  FROM events WHERE user_id < 5 GROUP BY user_id, hour
),
ctx AS (
  SELECT s.user_id, s.hour, h.avg_value,
         last_value(h.avg_value IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.hour) AS pv,
         last_value(CASE WHEN h.avg_value IS NOT NULL THEN s.hour END
                    IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.hour) AS ph,
         first_value(h.avg_value IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.hour
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN h.avg_value IS NOT NULL THEN s.hour END
                     IGNORE NULLS)
           OVER (PARTITION BY s.user_id ORDER BY s.hour
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
)
SELECT user_id, CAST(hour AS VARCHAR) AS hour,
       avg_value IS NOT NULL AS observed,
       ROUND(CASE
         WHEN avg_value IS NOT NULL THEN avg_value
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           pv + (nv - pv) * (CAST(epoch(hour) - epoch(ph) AS DOUBLE)
                             / CAST(epoch(nh) - epoch(ph) AS DOUBLE))
         ELSE pv END, 6) AS value_interp
FROM ctx
ORDER BY user_id, hour
""",
)
def ts_interpolate_linear(spark, sf_dir):
    """Linear-interpolation resampling: like ts_resample_ffill, but gap
    hours take the time-weighted blend of the surrounding observations
    (prev + (next-prev) * elapsed-fraction); trailing gaps fall back to
    forward fill.  prev/next value-and-timestamp pairs come from IGNORE
    NULLS windows (preceding-inclusive and following-exclusive), so each
    entity interpolates in one windowed pass inside its shuffle partition
    — no self-join of observation pairs.  The elapsed fraction divides
    exact epoch-second integers, and endpoints are the same rounded
    doubles on both engines, so the blend is bit-stable before the final
    ROUND."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value")
    )
    spine = (
        ev.groupBy("user_id")
        .agg(
            F.date_trunc("hour", F.min("ts")).alias("t0"),
            F.date_trunc("hour", F.max("ts")).alias("t1"),
        )
        .select(
            "user_id",
            F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias(
                "hour"
            ),
        )
    )
    joined = spine.join(
        hourly,
        (spine.user_id == hourly.user_id) & (spine.hour == hourly.hour),
        "left_outer",
    ).select(spine.user_id, spine.hour, "avg_value")
    back = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("avg_value").isNotNull(), F.col("hour"))
    ctx = joined.select(
        "user_id",
        "hour",
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(back).alias("ph"),
        F.first("avg_value", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(fwd).alias("nh"),
    )
    frac = (
        (F.unix_timestamp("hour") - F.unix_timestamp("ph")).cast("double")
        / (F.unix_timestamp("nh") - F.unix_timestamp("ph")).cast("double")
    )
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .otherwise(F.col("pv"))
    )
    return ctx.select(
        "user_id",
        F.col("hour").cast("string").alias("hour"),
        F.col("avg_value").isNotNull().alias("observed"),
        F.round(interp, 6).alias("value_interp"),
    ).orderBy("user_id", "hour")


@register(
    "incremental_agg_merge",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
         AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def incremental_agg_merge(spark, sf_dir):
    """Incremental aggregate maintenance: the base partition's partial
    aggregates (count, decimal-exact sum per key) merge with a delta
    batch's partials by summing — and the merged result must equal the
    full recompute, which is exactly what the oracle verifies.  This is
    the mergeable-state contract that lets a 100 TB rollup absorb a new
    partition by aggregating ONLY the delta (seconds) instead of
    rescanning history (hours); decimal sums are associative so the
    merge is exact, and avg derives from merged (sum, count) — never
    averaged averages."""
    ev = load(spark, sf_dir, "events")

    def partials(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
        )

    base = partials(ev.filter(F.col("event_id") % 10 != 0))
    delta = partials(ev.filter(F.col("event_id") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").alias("sum_dec"),
        )
    )
    return merged.select(
        "event_type",
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
        F.round(F.col("sum_dec").cast("double") / F.col("n_events"), 6).alias(
            "avg_value"
        ),
    ).orderBy("event_type")


@register(
    "dq_rule_checks",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_orderdate,
         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS nonpositive_total,
         CAST(SUM(CASE WHEN o_orderpriority NOT IN
                  ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
                  THEN 1 ELSE 0 END) AS BIGINT) AS bad_priority,
         CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           AS dup_orderkey
  FROM orders
)
SELECT rule, n_violations, n_violations = 0 AS passed FROM (
  SELECT 'null_orderdate' AS rule, null_orderdate AS n_violations FROM m
  UNION ALL SELECT 'nonpositive_total', nonpositive_total FROM m
  UNION ALL SELECT 'bad_priority', bad_priority FROM m
  UNION ALL SELECT 'dup_orderkey', dup_orderkey FROM m
) ORDER BY rule
""",
)
def dq_rule_checks(spark, sf_dir):
    """Declarative data-quality expectations (the Deequ/Great-Expectations
    shape): completeness (no NULL order dates), range (positive totals),
    domain (priority in its enum), and uniqueness (no duplicate keys) —
    ALL evaluated in one conditional-aggregate scan pass (the uniqueness
    check rides the same pass as a count-distinct), then unpivoted to one
    row per rule via inline(named_struct) (stack() rejects differing
    field names on this build).  At 100 TB the rule count is free: each
    extra expectation is another conditional sum in the same partial
    aggregate, not another scan."""
    o = load(spark, sf_dir, "orders")
    prios = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    m = o.agg(
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias(
            "null_orderdate"
        ),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "nonpositive_total"
        ),
        F.sum(
            F.when(~F.col("o_orderpriority").isin(*prios), 1).otherwise(0)
        ).alias("bad_priority"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_orderkey"),
    )
    unpivoted = m.select(
        F.expr(
            "inline(array("
            "named_struct('rule', 'null_orderdate', 'n_violations', null_orderdate),"
            "named_struct('rule', 'nonpositive_total', 'n_violations', nonpositive_total),"
            "named_struct('rule', 'bad_priority', 'n_violations', bad_priority),"
            "named_struct('rule', 'dup_orderkey', 'n_violations', dup_orderkey)))"
        )
    )
    return unpivoted.select(
        "rule", "n_violations", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("rule")


@register(
    "ts_hypertable_rollup",
    oracle="""
SELECT CAST(GROUPING(date_trunc('day', ts), hour(ts)) AS BIGINT) AS lvl,
       CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
       CAST(hour(ts) AS BIGINT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), hour(ts))
ORDER BY lvl, day NULLS FIRST, hod NULLS FIRST
""",
)
def ts_hypertable_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: ONE pass produces the
    hour-of-day, daily, and grand-total rollups of the event stream via
    GROUP BY ROLLUP on the (day, hour) time hierarchy, with GROUPING()
    labeling each row's granularity — the multi-resolution materialized
    view TimescaleDB calls a continuous aggregate, as a single Spark
    aggregate.  Partial aggregation applies to the finest level and the
    coarser levels re-aggregate those partials (Expand + re-agg), so the
    raw table is read once.  The decimal sums make every level's total
    exact and mergeable — the same partials serve incremental refresh
    (cf. incremental_agg_merge)."""
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string")
    hod = F.hour("ts").cast("bigint")
    return (
        ev.select(day.alias("day"), hod.alias("hod"), "value")
        .rollup("day", "hod")
        .agg(
            F.grouping_id().cast("bigint").alias("lvl"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select("lvl", "day", "hod", "n_events", "sum_value")
        .orderBy("lvl", F.col("day").asc_nulls_first(), F.col("hod").asc_nulls_first())
    )


@register(
    "incremental_join_maintenance",
    oracle="""
WITH o_all AS (SELECT o_orderkey, o_totalprice FROM orders),
     l_all AS (SELECT l_orderkey, l_extendedprice FROM lineitem)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_o,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_l
FROM o_all JOIN l_all ON o_orderkey = l_orderkey
""",
)
def incremental_join_maintenance(spark, sf_dir):
    """Incremental JOIN maintenance: with base relations (O, L) and
    deltas (ΔO, ΔL), the delta of O'⋈L' is  ΔO⋈L ∪ O⋈ΔL ∪ ΔO⋈ΔL — the
    three-term identity every IVM engine implements.  Spark computes the
    join INCREMENTALLY (base-pairs plus the three delta terms, unioned
    and re-aggregated); the oracle computes the full join from scratch —
    hash equality IS the maintenance-correctness proof (the join twin of
    incremental_agg_merge).  At 100 TB the three delta terms each join a
    small delta against a base (broadcast or pruned-shuffle), so a new
    commit costs |Δ|-proportional work instead of a full re-join."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o_base, o_delta = o.filter(F.col("o_orderkey") % 10 != 0), o.filter(
        F.col("o_orderkey") % 10 == 0
    )
    l_base, l_delta = li.filter(F.col("l_orderkey") % 7 != 0), li.filter(
        F.col("l_orderkey") % 7 == 0
    )
    cond = F.col("o_orderkey") == F.col("l_orderkey")
    parts = (
        o_base.join(l_base, cond)
        .unionByName(o_delta.join(l_base, cond))
        .unionByName(o_base.join(l_delta, cond))
        .unionByName(o_delta.join(l_delta, cond))
    )
    return parts.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_o"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_l"),
    )


@register(
    "dq_skew_profile",
    oracle="""
WITH freq AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(c) AS BIGINT) AS n_rows,
       CAST(MAX(c) AS BIGINT) AS max_freq,
       ROUND(AVG(c), 6) AS avg_freq,
       ROUND(quantile_cont(c, 0.5), 6) AS p50_freq,
       ROUND(quantile_cont(c, 0.99), 6) AS p99_freq,
       ROUND(MAX(c) / AVG(c), 6) AS skew_ratio
FROM freq
""",
)
def dq_skew_profile(spark, sf_dir):
    """Join-key skew diagnostic — the measurement you run BEFORE choosing a
    strategy (plain shuffle vs AQE skew-join vs salting, join_salted_skew)
    for a 100 TB join.  Two keyed aggregations: per-key frequency (|keys|
    rows, the same shuffle the join itself would do) then a global scalar
    profile of that frequency distribution (key count, max/avg/p50/p99
    frequency, max-to-mean skew ratio).  Output is O(1) regardless of
    corpus size; skew_ratio >> 1 on the driver's dashboard is the salting
    trigger.  REF:∅ (SURVEY §2 extras; platform tooling).

    Scale note (ADVICE r03): the exact ``percentile()`` aggregate buffers
    every per-key frequency in ONE aggregation buffer — fine at test SF and
    kept for oracle parity with DuckDB ``quantile_cont``, but at 100 TB
    (billions of distinct keys) swap the two percentile expressions for
    ``approx_percentile(c, array(0.5, 0.99), 1000)`` — constant-memory
    mergeable summaries, same output columns."""
    ev = load(spark, sf_dir, "events")
    freq = ev.groupBy("user_id").agg(F.expr("count(1) as c"))
    return freq.agg(
        F.expr("cast(count(1) as bigint) as n_keys"),
        F.expr("cast(sum(c) as bigint) as n_rows"),
        F.expr("cast(max(c) as bigint) as max_freq"),
        F.expr("round(avg(c), 6) as avg_freq"),
        F.expr("round(percentile(c, 0.5), 6) as p50_freq"),
        F.expr("round(percentile(c, 0.99), 6) as p99_freq"),
        F.expr("round(max(c) / avg(c), 6) as skew_ratio"),
    )


@register(
    "privacy_k_anonymity",
    oracle="""
WITH g AS (
  SELECT lang, source, COUNT(*) AS n
  FROM documents GROUP BY lang, source
)
SELECT lang, source, CAST(n AS BIGINT) AS n_rows,
       CAST(CASE WHEN n < 5 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
FROM g ORDER BY lang, source
""",
)
def privacy_k_anonymity(spark, sf_dir):
    """k-anonymity audit over quasi-identifier columns (lang, source),
    k=5: any equivalence class smaller than k can re-identify its members
    when joined with side data, so it must be suppressed or generalized
    before the corpus ships.  The release-gate counterpart of
    ``text_pii_scrub`` — that op redacts direct identifiers; this one
    measures INDIRECT identifiability.

    Plan: one keyed aggregation over the quasi-identifier tuple —
    |classes| output rows regardless of corpus size, the same scaling
    argument as ``dq_skew_profile``.  At 100 TB the audit runs on every
    release candidate; an ``at_risk`` row triggers generalization (drop a
    quasi-column, bucket a value) and a re-run."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(F.expr("count(1) as n_rows"))
        .selectExpr(
            "lang",
            "source",
            "n_rows",
            "cast(case when n_rows < 5 then 1 else 0 end as int) as at_risk",
        )
        .orderBy("lang", "source")
    )


#: The correctness gate checks every key at this fixed scale (driver
#: contract: "side-by-side at sf=0.01"), so the layout-audit oracle may
#: name the audited file literally — parquet_metadata() takes a PATH, not
#: a view, which is what kept this key rows-only through r14.
_LAYOUT_AUDIT_SF_DIR = "/root/testdata/sf0.01"


@register(
    "parquet_layout_audit",
    oracle=f"""
SELECT parse_filename(file_name) AS file_name,
       CAST(row_group_id AS INTEGER) AS row_group_id,
       CAST(row_group_num_rows AS BIGINT) AS n_rows,
       CAST(row_group_num_columns AS INTEGER) AS n_columns,
       CAST(row_group_bytes AS BIGINT) AS n_bytes,
       CAST(CASE WHEN row_group_num_rows < 10000 THEN 1 ELSE 0 END AS INTEGER)
         AS small_rowgroup
FROM parquet_metadata('{_LAYOUT_AUDIT_SF_DIR}/lineitem.parquet')
GROUP BY ALL
ORDER BY file_name, row_group_id
""",
)
def parquet_layout_audit(spark, sf_dir):
    """Physical-layout audit of a parquet dataset — the diagnostic you run
    BEFORE tuning maxPartitionBytes or scheduling a compaction at 100 TB:
    per row group, its row count, column count, and byte size, plus a
    small-rowgroup flag (tiny row groups defeat vectorized scans and
    bloat footer metadata; the fix is table_format_compaction).

    Plan: the driver holds only the FILE LIST (bounded by file count, the
    same information any planner lists); footers are read in EXECUTORS
    via pyarrow through ``mapInPandas`` — distributed metadata
    inspection, no data pages touched, so auditing a petabyte costs
    footer-bytes × files.

    Oracled since r15 (VERDICT r14 item 2): DuckDB's parquet_metadata()
    over the same file IS the expressible oracle — one metadata row per
    column chunk, GROUP BY ALL collapsing to row-group grain.  The oracle
    names the audited file via the contract's fixed sf0.01 dir
    (parquet_metadata takes a path, not a pre-registered view — the
    reason this key sat rows-only through r14); tests/test_corpus_ops.py
    keeps the sf-parametric cross-check."""
    import os as _os

    import pandas as pd

    target = f"{sf_dir}/lineitem.parquet"
    files = (
        [target]
        if _os.path.isfile(target)
        else sorted(
            _os.path.join(target, f)
            for f in _os.listdir(target)
            if f.endswith(".parquet")
        )
    )
    fdf = spark.createDataFrame([(f,) for f in files], "file_path string")

    def inspect(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for p in pdf["file_path"]:
                md = pq.ParquetFile(p).metadata
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    rows.append(
                        (
                            _os.path.basename(p),
                            i,
                            rg.num_rows,
                            rg.num_columns,
                            rg.total_byte_size,
                            1 if rg.num_rows < 10_000 else 0,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "row_group_id",
                    "n_rows",
                    "n_columns",
                    "n_bytes",
                    "small_rowgroup",
                ],
            )

    return fdf.repartition(8, "file_path").mapInPandas(
        inspect,
        schema=(
            "file_name string, row_group_id int, n_rows long,"
            " n_columns int, n_bytes long, small_rowgroup int"
        ),
    ).orderBy("file_name", "row_group_id")


# --- folded from the round-10 module (r15 module-hygiene fold,
# VERDICT r14 item 5): moved VERBATIM — zero behavior change. ---

def _zvalue_terms(xcol: str, ycol: str, bits: int = 12) -> str:
    """Morton/Z-order bit interleave of two ``bits``-wide ints — the SAME
    SQL text runs on Spark and DuckDB (both parse >> & << identically;
    probed r10)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xcol} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ycol} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


#: epoch-day of 1992-01-01 (orders dates start there in TPC-H-shaped data)
_Z_EPOCH0 = 8035

_Z_SPARK_XY = (
    "least(greatest(cast(floor(unix_timestamp(o_orderdate) / 86400) as int)"
    f" - {_Z_EPOCH0}, 0), 4095)",
    "least(greatest(cast(floor(o_totalprice / 200) as int), 0), 4095)",
)
_Z_DUCK_XY = (
    "least(greatest(CAST(FLOOR(epoch(o_orderdate) / 86400) AS INT)"
    f" - {_Z_EPOCH0}, 0), 4095)",
    "least(greatest(CAST(FLOOR(o_totalprice / 200) AS INT), 0), 4095)",
)


@register(
    "layout_zorder_stats",
    oracle=f"""
WITH xy AS (
  SELECT {_Z_DUCK_XY[0]} AS x, {_Z_DUCK_XY[1]} AS y FROM orders
),
z AS (SELECT x, y, {_zvalue_terms('x', 'y')} AS zv FROM xy)
SELECT CAST(zv >> 20 AS BIGINT) AS tile,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM z GROUP BY 1 ORDER BY tile
""",
)
def layout_zorder_stats(spark, sf_dir):
    """Z-order (Morton) layout clustering — the OPTIMIZE ZORDER story
    executed relationally: interleave the bits of two query dimensions
    (order date-day, price bucket; 12 bits each), then tile rows by the
    TOP 4 z-bits.  A z-prefix tile IS a quadtree cell, so each tile's
    per-dimension min/max span is bounded by its quadrant — the emitted
    per-tile (x_min..x_max, y_min..y_max) ranges are exactly the
    file-footer min/max stats a 100 TB table written in this order would
    carry, and they prune reads for predicates on EITHER dimension
    (a single-column sort prunes only its own column).

    Scale: the z-value is a pure per-row bit expression (shared SQL text
    with the oracle — no engine-specific hashing); tiling is a prefix
    shift, so the whole key is one map + one 16-group aggregation.  In a
    real write path the same z column feeds repartitionByRange(z) before
    the sink — sort_range_partitioned demonstrates that half."""
    x_expr, y_expr = _Z_SPARK_XY
    return (
        load(spark, sf_dir, "orders")
        .selectExpr(f"{x_expr} as x", f"{y_expr} as y")
        .selectExpr("x", "y", f"{_zvalue_terms('x', 'y')} as zv")
        .selectExpr(
            "cast(zv >> 20 as bigint) as tile", "x", "y"
        )
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .orderBy("tile")
    )


# --- folded from the staged round-6 module (r15 module-hygiene
# fold, VERDICT r14 item 5): moved VERBATIM apart from the
# @_staged -> @register decorator (the module's own documented
# endgame: 'delete this module and inline the @register
# decorators'). Zero behavior change. ---

# ---------------------------------------------------------------------------
# privacy_dp_count — deterministic-noise DP counts (hash-green)

_DP_EPS = 1.0  # laplace scale b = sensitivity/eps = 1.0 for count queries


@register(
    "privacy_dp_count",
    oracle="""
WITH g AS (
  SELECT lang, source, COUNT(*) AS true_n,
         ('0x' || substr(md5(lang || '|' || source), 1, 6))::BIGINT
           / 16777216.0 - 0.5 AS c
  FROM documents GROUP BY lang, source
)
SELECT lang, source, CAST(true_n AS BIGINT) AS true_n,
       ROUND(-1.0 * sign(c) * ln(greatest(1e-12, 1 - 2 * abs(c))), 6)
         AS noise,
       CAST(greatest(0, CAST(round(true_n
           - 1.0 * sign(c) * ln(greatest(1e-12, 1 - 2 * abs(c)))) AS BIGINT))
         AS BIGINT) AS dp_n
FROM g ORDER BY lang, source
""",
)
def privacy_dp_count(spark, sf_dir):
    """ε-DP noisy group counts (ε=1, sensitivity 1): per-(lang, source)
    counts plus Laplace(1/ε) noise drawn by INVERSE-CDF from a
    content-hash uniform — u = first 6 md5 hex digits of the group key /
    16^6, noise = -b·sign(u-½)·ln(1-2|u-½|).  The hash-derived draw makes
    the mechanism deterministic per key, hence reproducible across
    engines/partitionings/runs (same rationale as
    sample_hash_deterministic) and oracle-verifiable; production would
    swap the uniform for a calibrated RNG — the surrounding plan is
    unchanged.  Released count clamps at 0 (post-processing preserves DP).

    100 TB: one keyed aggregation; noise is a scalar expression on the
    (tiny) grouped result — zero extra shuffles."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("true_n"))
    u = (
        F.expr("conv(substring(md5(concat(lang, '|', source)), 1, 6), 16, 10)")
        .cast("double")
        / F.lit(16777216.0)
    )
    c = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / _DP_EPS)
        * F.signum(c)
        * F.log(F.greatest(F.lit(1e-12), F.lit(1.0) - F.lit(2.0) * F.abs(c)))
    )
    return (
        g.select(
            "lang",
            "source",
            F.col("true_n").cast("bigint").alias("true_n"),
            F.round(noise, 6).alias("noise"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.round(F.col("true_n") + noise, 0).cast("bigint"),
            ).alias("dp_n"),
        )
        .orderBy("lang", "source")
    )
