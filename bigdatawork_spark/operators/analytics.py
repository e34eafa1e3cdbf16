"""Warehouse / product-analytics composite operators — SCD2 dimension
builds, funnel conversion, cohort retention, bucketed interval joins.
REF:∅ (reference snapshot empty — SURVEY.md §0); these widen §2's query
capabilities with the canonical analytics shapes a user of the reference
would expect to run.

Scale notes: all four compile to window functions + keyed aggregations —
one shuffle per distinct partitioning key, no driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "cdc_scd2",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         CAST(ts AS TIMESTAMP) AS valid_from,
         lead(CAST(ts AS TIMESTAMP))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         lag(event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT user_id, event_type AS state, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM seq
WHERE prev_type IS NULL OR prev_type <> event_type
ORDER BY user_id, valid_from
""",
)
def cdc_scd2(spark, sf_dir):
    """Slowly-changing-dimension type 2 build from an event log: collapse
    consecutive same-state events, emit one versioned row per state change
    with [valid_from, valid_to) and an is_current flag — the CDC-to-
    dimension pattern.  One shuffle on user_id serves both windows (lag for
    change detection, lead for interval close); Catalyst computes them in a
    single Window operator.

    Note the lead() is taken BEFORE the change-filter in both engines, so
    valid_to is the next raw event's ts (when the state was re-asserted or
    changed), matching a real CDC feed where any newer record supersedes."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("state")))
        .select(
            "user_id",
            "state",
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "funnel_conversion",
    oracle="""
WITH stages AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS viewed,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     THEN 1 ELSE 0 END) AS BIGINT) AS clicked_after_view,
       CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                      AND t_purchase > t_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS purchased_after_click
FROM stages
""",
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel (view → click → purchase): per user, the earliest
    timestamp of each stage via conditional MIN — ONE aggregation pass, no
    self-joins (the naive 3-way self-join is quadratic per user; this is
    the linear formulation) — then strict time-ordering between stages.
    A NULL stage timestamp fails the > comparison in both engines, so
    missing stages drop out without explicit null checks."""
    ev = load(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        stage("view").alias("t_view"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    as_cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        as_cnt(viewed).alias("viewed"),
        as_cnt(clicked).alias("clicked_after_view"),
        as_cnt(purchased).alias("purchased_after_click"),
    )


@register(
    "retention_cohort",
    oracle="""
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         date_trunc('week', f.first_day) AS cohort_week,
         CAST(floor(date_diff('day', f.first_day, CAST(e.ts AS DATE)) / 7.0)
              AS BIGINT) AS week_no
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(CAST(cohort_week AS DATE) AS VARCHAR) AS cohort_week, week_no,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity
GROUP BY cohort_week, week_no
ORDER BY cohort_week, week_no
""",
)
def retention_cohort(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen week, counted
    as active in each subsequent week offset.  Two shuffles (first-seen per
    user, then the cohort×week distinct-count); the first-seen table is
    user-cardinality — at 100 TB it broadcasts or bucket-joins back onto
    the raw events.  Dates emitted as strings (SURVEY §5.3 DATE delta)."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            F.date_trunc("week", "first_day").cast("date").alias("cohort_week"),
            F.floor(F.datediff(F.to_date("ts"), F.col("first_day")) / 7)
            .cast("long")
            .alias("week_no"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_no")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            "week_no",
            "active_users",
        )
        .orderBy("cohort_week", "week_no")
    )


@register(
    "join_interval_bucketed",
    oracle="""
SELECT a.event_id AS first_id, b.event_id AS second_id, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
""",
)
def join_interval_bucketed(spark, sf_dir):
    """Scale path for join_interval (joins.py): add a coarse 10-minute time
    bucket to the equi key so each left row joins only its own and the next
    bucket instead of every same-user row — per-key pair counts drop from
    O(events_per_user²) to O(events_per_bucket²)·2.  Same result set as the
    plain interval join (the oracle IS the unbucketed join); the bucket is
    pure execution strategy, like the salt in join_salted_skew."""
    ev = load(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / 600).cast("long")
    a = ev.select(
        F.col("event_id").alias("first_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("ts_a"),
        bucket.alias("bk"),
    )
    # right side lands in its own bucket AND the previous one: a match is
    # ≤10 min after ts_a, so it lives in bucket(ts_a) or bucket(ts_a)+1 —
    # explode the LEFT row into both candidate buckets instead of the right
    b = ev.select(
        F.col("event_id").alias("second_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("ts_b"),
        bucket.alias("bk"),
    )
    a2 = a.withColumn("bk", F.explode(F.array(F.col("bk"), F.col("bk") + 1)))
    return (
        a2.join(b, ["user_id", "bk"])
        .filter(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 10 MINUTES"))
        )
        .select("first_id", "second_id", "user_id")
    )


@register(
    "merge_upsert",
    oracle="""
WITH target AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer
),
batch AS (
  SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'new:' || c_name, 0.0
  FROM customer WHERE c_custkey % 97 = 0
)
SELECT COALESCE(b.c_custkey, t.c_custkey) AS c_custkey,
       COALESCE(b.c_name, t.c_name) AS c_name,
       COALESCE(b.c_acctbal, t.c_acctbal) AS c_acctbal,
       CASE WHEN t.c_custkey IS NULL THEN 'insert'
            WHEN b.c_custkey IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM target t FULL OUTER JOIN batch b USING (c_custkey)
ORDER BY c_custkey
""",
)
def merge_upsert(spark, sf_dir):
    """MERGE INTO semantics (upsert) expressed as a full-outer join —
    WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT, unmatched
    target rows pass through.  The CDC batch is derived deterministically
    from the snapshot itself (every 7th key updated, every 97th key
    re-inserted under a shifted key) so the oracle sees the same inputs.

    At 100 TB: this is the Delta/Iceberg MERGE pattern without the table
    format — one shuffle on the merge key; with the target bucketed on
    c_custkey (see join_bucketed_colocated) the target side doesn't
    re-shuffle, and AQE handles batch-side skew.  The +100.0 stays
    un-rounded: one IEEE add on identical inputs is bit-equal across
    engines, while round() would expose half-up vs half-away deltas."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select("c_custkey", "c_name", (F.col("c_acctbal") + 100.0).alias("c_acctbal"))
    )
    inserts = c.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("new:"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    batch = updates.unionByName(inserts)
    t, b = c.alias("t"), batch.alias("b")
    merged = t.join(b, "c_custkey", "full_outer").select(
        F.col("c_custkey"),
        F.coalesce("b.c_name", "t.c_name").alias("c_name"),
        F.coalesce("b.c_acctbal", "t.c_acctbal").alias("c_acctbal"),
        F.when(F.col("t.c_name").isNull(), "insert")
        .when(F.col("b.c_name").isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
    return merged.orderBy("c_custkey")


@register(
    "event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq
WHERE next_type IS NOT NULL
  AND next_ts <= ts + INTERVAL 30 MINUTE
GROUP BY from_type, to_type
ORDER BY from_type, to_type
""",
)
def event_transitions(spark, sf_dir):
    """Event-type transition matrix (first-order Markov counts): per user,
    pair each event with its successor (ordered by ts with event_id
    tiebreak) and count from→to pairs occurring within a 30-minute
    session bound.  One shuffle on user_id feeds the lead() window; the
    pair count re-shuffles only the (from, to) aggregate — tiny.  This is
    the path-analysis primitive behind next-step prediction and funnel
    discovery."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return (
        seq.filter(
            F.col("next_type").isNotNull()
            & (F.col("next_ts") <= F.col("ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("from_type", "to_type")
    )


@register(
    "basket_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
HAVING COUNT(*) >= 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 50
""",
)
def basket_pairs(spark, sf_dir):
    """Market-basket co-occurrence: part pairs appearing in the same
    order at least twice, top-50 by support.  Distinct (order, part)
    first so repeated lines don't inflate support; the canonical a < b
    pairs fall out of each basket once.

    r17 rewrite (guide §2.4 remove shuffles): the previous distinct +
    a < b SELF-JOIN shape cost three ~6M-row exchanges at sf1.0
    (distinct hashed by (order, part), then BOTH join sides re-shuffled
    by orderkey).  A basket is a set: ``collect_set(l_partkey)`` per
    order IS the distinct, in ONE exchange keyed directly by the basket
    key, and the canonical a < b pairs fall out map-side from the
    sorted array (``array_sort`` + triangular ``transform``/``slice``)
    — identical pair multiset by construction (verified pandas-equal at
    sf1.0; oracle HASH green).  9.0 → 5.4 s warm at sf1.0; the pair
    aggregate still shuffles only pair keys.  At 100 TB prune to
    frequent items first (apriori) so the basket arrays shrink; a
    pathological mega-basket wants a block cap (the
    dedup_ngram_jaccard discipline) before the triangular expansion."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " transform(slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> struct(x as part_a, y as part_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.part_a", "p.part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(50)
    )


@register(
    "anomaly_zscore",
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) AS sq
  FROM events GROUP BY event_type
),
scored AS (
  SELECT e.event_type, e.value,
         CASE WHEN sq / n - (s / n) * (s / n) > 0
              THEN (e.value - s / n) / sqrt(sq / n - (s / n) * (s / n))
         END AS z
  FROM events e JOIN stats USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN abs(z) > 2.5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies,
       ROUND(MAX(abs(z)), 6) AS max_abs_z
FROM scored GROUP BY event_type ORDER BY event_type
""",
)
def anomaly_zscore(spark, sf_dir):
    """Z-score anomaly flagging: per event type, score every value
    against the type's mean and population std (computed from
    decimal-exact sum and sum-of-squares, so the moments are bit-stable)
    and count |z| > 2.5 outliers.  Two passes over events — the stats
    aggregate broadcasts back onto the scan (no row explosion) — the
    standard streaming-friendly shape for 100 TB anomaly sweeps; MAX of
    a deterministic double is order-independent.

    Degenerate groups (std = 0: single-event or constant-valued types)
    score NULL, not NaN (fuzz finding, r12): float cancellation makes
    the variance term go slightly negative there, sqrt gives NaN, and
    Spark SQL's non-IEEE ordering treats NaN as LARGER than any number —
    so `abs(NaN) > 2.5` is TRUE and every row of a constant-valued type
    would be counted an anomaly.  The std > 0 guard nulls the score on
    both engines instead (no flag, max_abs_z NULL)."""
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(28,8)"))
        .cast("double")
        .alias("sq"),
    )
    mean = F.col("s") / F.col("n")
    var = F.col("sq") / F.col("n") - mean * mean
    std = F.sqrt(var)
    scored = ev.join(F.broadcast(stats), ev.event_type == F.col("et")).select(
        "event_type",
        F.when(var > 0, (F.col("value") - mean) / std).alias("z"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.abs("z") > 2.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
            F.round(F.max(F.abs("z")), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


@register(
    "stats_winsorized",
    oracle="""
WITH bands AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS p1,
         quantile_cont(value, 0.99) AS p99
  FROM events GROUP BY event_type
),
clipped AS (
  SELECT e.event_type,
         LEAST(GREATEST(e.value, b.p1), b.p99) AS v
  FROM events e JOIN bands b USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
         AS winsorized_mean
FROM clipped GROUP BY event_type ORDER BY event_type
""",
)
def stats_winsorized(spark, sf_dir):
    """Winsorized mean per event type: clip values to the exact
    [P1, P99] band, then take the decimal-exact mean of the clipped
    values — the robust-statistics pass that tames heavy tails before
    downstream modeling.  Spark's exact percentile() and DuckDB's
    quantile_cont use the same linear interpolation (verified
    bit-identical on this corpus), and LEAST/GREATEST of identical
    doubles is exact, so the clipped sums agree bitwise.  At 100 TB
    swap percentile() for approx_percentile(…, ε) — the clip bands
    tolerate sketch error by construction."""
    ev = load(spark, sf_dir, "events")
    bands = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.expr("percentile(value, 0.01)").alias("p1"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    clipped = ev.join(F.broadcast(bands), ev.event_type == F.col("et")).select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("p1")), F.col("p99")).alias("v"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("v").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


@register(
    "pattern_match_strict_seq",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts,
         lead(event_type, 1) OVER w AS t1,
         lead(ts, 1)         OVER w AS ts1,
         lead(event_type, 2) OVER w AS t2,
         lead(ts, 2)         OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       CAST(SUM(CASE WHEN t1 = 'click' AND ts1 <= ts + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
       CAST(SUM(CASE WHEN t1 = 'click' AND ts1 <= ts + INTERVAL 30 MINUTE
                     AND t2 = 'purchase' AND ts2 <= ts1 + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
FROM seq
WHERE event_type = 'view'
GROUP BY user_id
HAVING SUM(CASE WHEN t1 = 'click' AND ts1 <= ts + INTERVAL 30 MINUTE
           THEN 1 ELSE 0 END) > 0
ORDER BY user_id
""",
)
def pattern_match_strict_seq(spark, sf_dir):
    """MATCH_RECOGNIZE-style strict-contiguity patterns: count, per user,
    view→click and view→click→purchase as IMMEDIATELY consecutive events
    with ≤30 min between steps (unlike funnel_conversion's
    any-subsequence semantics).  Both prefix lengths are reported because
    the full 3-step chain is corpus-rare (r05 measurement: 0 occurrences
    at sf0.01, 1 at sf0.1 — the original 3-step-only output made this key
    vacuously hash-green, 0 = 0 rows; the 2-step prefix fires 22 times at
    sf0.01, so the driver check now exercises real matches while the
    3-step column keeps its honest zeros).  Fixed-length patterns compile
    to lead() probes in ONE window pass per user partition — no joins, no
    state machine; variable-length patterns (A B* C) would move to
    applyInPandasWithState.  At scale: one shuffle on user_id, identical
    to any windowed read."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("ts", 1).over(w).alias("ts1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    half_hour = F.expr("INTERVAL 30 MINUTES")
    step1 = (F.col("t1") == "click") & (F.col("ts1") <= F.col("ts") + half_hour)
    step2 = (
        step1
        & (F.col("t2") == "purchase")
        & (F.col("ts2") <= F.col("ts1") + half_hour)
    )
    return (
        seq.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(step1, 1).otherwise(0)).alias("n_view_click"),
            F.sum(F.when(step2, 1).otherwise(0)).alias("n_view_click_purchase"),
        )
        .filter(F.col("n_view_click") > 0)
        .orderBy("user_id")
    )


@register(
    "session_paths",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_type, ts, event_id,
         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
),
paths AS (
  SELECT user_id, session_no,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM sessions GROUP BY user_id, session_no
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths
GROUP BY path
HAVING COUNT(*) >= 5
ORDER BY n_sessions DESC, path
""",
)
def session_paths(spark, sf_dir):
    """Session path mining: sessionize by 30-minute inactivity gaps
    (lag + running sum of session starts — the standard two-window
    sessionizer), concatenate each session's event types in time order,
    and count the frequent full paths.  Everything after the one shuffle
    on user_id stays in that partition: both windows and the per-session
    path build share the same ordering.  The path aggregation uses an
    ordered collect, so the string is deterministic under the (ts,
    event_id) total order.  Path counts re-shuffle only distinct paths."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gaps = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sessions = gaps.withColumn("session_no", F.sum("is_start").over(run))
    paths = (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda s: s.event_type,
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= 5)
        .orderBy(F.col("n_sessions").desc(), "path")
    )
