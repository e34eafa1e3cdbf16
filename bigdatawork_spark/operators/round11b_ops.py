"""Round-11 (cont.) pipeline-mechanics additions.  REF:∅ (reference
snapshot empty — SURVEY.md §0); these extend the §2-K training-data
family with five scale-pattern operators a 100 TB curation pipeline
needs and one streaming durability demonstration:

- ``global_row_index`` — the zipWithIndex problem done DataFrame-first:
  a naive ``row_number() OVER (ORDER BY ...)`` collapses the whole
  table into ONE task; the scalable pattern is range-partition → local
  index → per-partition offset broadcast.
- ``quantile_bin_assign`` — equal-frequency feature binning: boundary
  quantiles collected once (9 doubles of driver state), bin assignment
  is a map-only expression.
- ``corr_matrix`` — pairwise Pearson correlations in ONE map-side
  combined aggregate pass (no per-pair scans).
- ``ngram_pmi`` — bigram collocation mining by pointwise mutual
  information; joins touch the vocabulary, never the corpus.
- ``kfold_stratified`` — deterministic, content-ordered k-fold split
  assignment with exact per-stratum balance.
- ``stream_restart_checkpoint`` — exactly-once across a stop/restart
  from the same checkpoint (rows-only; twin test pins values).
"""

from __future__ import annotations

import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# ---------------------------------------------------------------------------
# global_row_index
# ---------------------------------------------------------------------------

# Bounded-lifetime cache for the range-id-assigned relation: it feeds both
# the per-range count pass and the final projection.  Since ADVICE r11 the
# range id is a deterministic expression over literal boundaries, so the
# cache is purely a scan-sharing optimisation — an eviction-forced
# recompute yields identical placement.  Returned-lazy DFs can't unpersist
# in-function, so each call evicts the previous call's relation (the
# minhash_pairs / tfidf_keywords lifetime pattern, ADVICE r10).
_ROWIDX_STAGED_LAST = None

_ROWIDX_PARTITIONS = 16


@register(
    "global_row_index",
    oracle="""
WITH idx AS (
  SELECT l_orderkey, l_linenumber,
         CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1
              AS BIGINT) AS global_idx
  FROM lineitem
)
SELECT global_idx, l_orderkey, l_linenumber
FROM idx WHERE global_idx % 97 = 0 ORDER BY global_idx
""",
)
def global_row_index(spark, sf_dir):
    """Scalable global row numbering (the DataFrame zipWithIndex).

    ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY forces a
    single-partition Window — one task sorts and numbers 100 TB.  The
    scalable plan, built here:

      1. Range boundaries from ``approxQuantile``, embedded as LITERALS;
         each row's range id (pid) is a deterministic map-side expression
         over them (count of boundaries exceeded) — re-executing the plan
         reproduces identical placement, unlike ``repartitionByRange``'s
         per-execution boundary sampling (ADVICE r11).
      2. One tiny counting aggregate: rows per range id (≤ #ranges rows
         ever reach the driver — bounded by cluster layout, not data).
      3. Running-sum offsets broadcast back as a two-column dim; local
         ``row_number`` partitioned BY RANGE ID (every pid group is
         independent → fully parallel, one hash shuffle — the unavoidable
         cost of a total order) + offset = exact global index.

    Boundary placement is sampled and arbitrary, but the final index is
    invariant to it: ranges are disjoint and the sort key (l_orderkey,
    l_linenumber) is unique.  Output is thinned to every 97th index so
    the driver compare stays compact while still covering the whole
    table's numbering."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")

    # Deterministic range placement (ADVICE r11): the partition id is a
    # map-side expression over LITERAL boundaries collected once here, so
    # any re-execution of the returned plan reproduces the exact same
    # placement — correctness no longer depends on a cached relation
    # pinning repartitionByRange's sampled boundaries.  approxQuantile's
    # sampling only affects WHERE the ranges split, never the final index
    # (ranges stay disjoint; the sort key is unique).
    qs = [i / _ROWIDX_PARTITIONS for i in range(1, _ROWIDX_PARTITIONS)]
    # dedupe AFTER the int cast the pid expression applies (ADVICE r12):
    # two distinct float quantiles like 5.2 and 5.9 both truncate to
    # '> 5', and float-level dedup kept both as redundant WHEN branches
    # (result unchanged — pid gaps are absorbed by the counts pass — but
    # the expression carried dead branches)
    bounds = sorted({int(b) for b in li.stat.approxQuantile("l_orderkey", qs, 0.01)})
    # F.lit(0) start value: on an empty/tiny relation approxQuantile
    # returns no boundaries and a bare sum() would be the int 0
    pid_expr = sum(
        (
            F.when(F.col("l_orderkey") > F.lit(b), 1).otherwise(0)
            for b in bounds
        ),
        F.lit(0),
    ).alias("pid")
    rng = li.select("l_orderkey", "l_linenumber", pid_expr)

    global _ROWIDX_STAGED_LAST
    if _ROWIDX_STAGED_LAST is not None:
        try:
            _ROWIDX_STAGED_LAST.unpersist(blocking=False)
        except Exception:
            pass  # the old relation's session may already be stopped
    # Cache is a pure optimisation now (two consumers: counts + final
    # projection) — an eviction-forced recompute yields identical pids.
    rng = rng.cache()
    _ROWIDX_STAGED_LAST = rng

    counts = rng.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).orderBy("pid")
    offsets, acc = [], 0
    for r in counts.collect():  # ≤ len(bounds)+1 rows — bounded
        offsets.append((r["pid"], acc))
        acc += r["cnt"]
    off = spark.createDataFrame(offsets, "pid int, offset long")

    w = Window.partitionBy("pid").orderBy("l_orderkey", "l_linenumber")
    idx = rng.join(F.broadcast(off), "pid").withColumn(
        "global_idx",
        (F.col("offset") + F.row_number().over(w) - F.lit(1)).cast("bigint"),
    )
    return (
        idx.filter(F.col("global_idx") % 97 == 0)
        .select("global_idx", "l_orderkey", "l_linenumber")
        .orderBy("global_idx")
    )


# ---------------------------------------------------------------------------
# quantile_bin_assign
# ---------------------------------------------------------------------------

_BIN_QS = [i / 10.0 for i in range(1, 10)]


@register(
    "quantile_bin_assign",
    oracle="""
WITH b AS (
  SELECT """
    + ",\n         ".join(
        f"round(quantile_cont(l_quantity, {q}), 6) AS b{i}"
        for i, q in enumerate(_BIN_QS, start=1)
    )
    + """
  FROM lineitem
),
a AS (
  SELECT l_quantity AS v,
         ("""
    + " + ".join(
        f"CASE WHEN l_quantity > b{i} THEN 1 ELSE 0 END"
        for i in range(1, 10)
    )
    + """) AS bin
  FROM lineitem, b
)
SELECT CAST(bin AS INTEGER) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(v) AS min_v, MAX(v) AS max_v
FROM a GROUP BY bin ORDER BY bin
""",
)
def quantile_bin_assign(spark, sf_dir):
    """Equal-frequency (decile) binning of a numeric feature.

    Plan shape: ONE aggregate computes all nine boundary quantiles
    (9 doubles of driver state — bounded regardless of table size),
    then bin assignment is a pure map-side expression counting how many
    boundaries each value exceeds; the per-bin rollup shuffles 10 groups.

    Exact ``percentile`` gives cross-engine parity with DuckDB's
    ``quantile_cont`` (identical (n-1)·q interpolation; boundaries
    rounded to 6 dp on both sides before comparison so the assignment
    rule is ulp-robust).  At 100 TB the only change is swapping the
    boundary pass to ``approx_percentile`` (t-digest sketch, bounded
    executor memory, same plan shape) — the engine-side test pins the
    approx path's bins against this exact twin."""
    li = load(spark, sf_dir, "lineitem")
    brow = li.agg(
        *[
            F.round(F.percentile("l_quantity", F.lit(q)), 6).alias(f"b{i}")
            for i, q in enumerate(_BIN_QS, start=1)
        ]
    ).collect()[0]
    bin_expr = sum(
        F.when(F.col("l_quantity") > F.lit(float(brow[f"b{i}"])), 1).otherwise(0)
        for i in range(1, 10)
    )
    return (
        li.select(F.col("l_quantity").alias("v"), bin_expr.alias("bin"))
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .orderBy("bin")
    )


def quantile_bin_assign_approx(spark, sf_dir, accuracy: int = 10000):
    """Sketch-boundary variant (the 100 TB path): identical plan with
    ``approx_percentile`` supplying the boundaries.  Not registered —
    the exact twin above is the oracle-checkable key; the test asserts
    this path's per-bin counts stay within the sketch's error bound."""
    li = load(spark, sf_dir, "lineitem")
    brow = li.agg(
        F.percentile_approx(
            "l_quantity", F.array(*[F.lit(q) for q in _BIN_QS]), F.lit(accuracy)
        ).alias("bs")
    ).collect()[0]
    bs = [round(float(b), 6) for b in brow["bs"]]
    bin_expr = sum(
        F.when(F.col("l_quantity") > F.lit(b), 1).otherwise(0) for b in bs
    )
    return (
        li.select(F.col("l_quantity").alias("v"), bin_expr.alias("bin"))
        .groupBy(F.col("bin").cast("int").alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# corr_matrix
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "corr_matrix",
    oracle="""
WITH m AS (
  SELECT """
    + ",\n         ".join(
        f"round(corr({x}, {y}), 6) AS c_{x}__{y}"
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    )
    + """
  FROM lineitem
)
"""
    + "\nUNION ALL\n".join(
        f"SELECT '{x}' AS var_x, '{y}' AS var_y, c_{x}__{y} AS corr_xy FROM m"
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    )
    + "\nORDER BY var_x, var_y",
)
def corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlation matrix (upper triangle, long form).

    All C(4,2)=6 coefficients come out of ONE aggregate over ONE scan:
    ``F.corr`` is a streaming co-moment aggregate with map-side partial
    combine, so the shuffle carries 6 moment tuples per task — nothing
    scales with rows.  The wide 1-row result is unpivoted to long form
    with a JVM ``stack`` expression (no second scan).  Rounded to 6 dp
    on both engines (SURVEY §5.3.2) — co-moment accumulation order
    differs across engines only below that."""
    li = load(spark, sf_dir, "lineitem")
    pairs = [
        (x, y)
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    ]
    agg = li.agg(
        *[
            F.round(F.corr(x, y), 6).alias(f"c_{x}__{y}")
            for x, y in pairs
        ]
    )
    stack_args = ", ".join(
        f"'{x}', '{y}', c_{x}__{y}" for x, y in pairs
    )
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (var_x, var_y, corr_xy)"
    ).orderBy("var_x", "var_y")


# ---------------------------------------------------------------------------
# ngram_pmi
# ---------------------------------------------------------------------------


@register(
    "ngram_pmi",
    oracle="""
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents WHERE text IS NOT NULL
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w
),
tot AS (SELECT CAST(SUM(c_w) AS DOUBLE) AS t FROM uni),
big AS (
  SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
         CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM (
    SELECT unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1])) AS bg
    FROM toks WHERE len(ws) >= 2
  ) GROUP BY 1, 2
),
btot AS (SELECT CAST(SUM(c_xy) AS DOUBLE) AS bt FROM big),
scored AS (
  SELECT b.w1, b.w2, b.c_xy,
         round(ln((b.c_xy / btot.bt) /
                  ((u1.c_w / tot.t) * (u2.c_w / tot.t))), 6) AS pmi
  FROM big b
  JOIN uni u1 ON b.w1 = u1.w
  JOIN uni u2 ON b.w2 = u2.w
  CROSS JOIN tot CROSS JOIN btot
  WHERE b.c_xy >= 5
)
SELECT w1, w2, c_xy, pmi FROM scored
ORDER BY pmi DESC, w1, w2 LIMIT 20
""",
)
def ngram_pmi(spark, sf_dir):
    """Bigram collocation mining by pointwise mutual information:
    PMI(x,y) = ln( p(x,y) / (p(x)·p(y)) ) with bigram/unigram MLE
    probabilities, keeping pairs seen ≥5 times, top-20 by PMI.

    Scale shape: tokenization and adjacent-pairing are narrow
    (map-only); both count aggregates shuffle the VOCABULARY after
    map-side combine, never the corpus; the scoring joins are
    vocab⋈vocab equi-joins (bigram types × 2 lookups).  The two global
    totals (token count, bigram count) are ONE tiny aggregate collected
    to the driver — 2 doubles of driver state, inlined as literals so
    the scoring stage stays map-only (no scalar broadcast join in the
    plan).  Ordering compares the ROUNDED score so cross-engine tie
    order is deterministic."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = d.select(
        F.filter(F.split("text", " "), lambda w: w != "").alias("ws")
    )
    uni = (
        toks.select(F.explode("ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_w"))
    )
    big = (
        toks.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(element_at(ws, i) AS w1,"
                    " element_at(ws, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
    )
    # Both MLE denominators in one bounded collect: total tokens and total
    # bigram occurrences (the latter BEFORE the ≥5 support cut, matching
    # the oracle's SUM over the unfiltered bigram groups).
    totals = toks.agg(
        F.sum(F.size("ws")).cast("double").alias("t"),
        F.sum(
            F.when(F.size("ws") >= 2, F.size("ws") - 1).otherwise(0)
        ).cast("double").alias("bt"),
    ).collect()[0]
    t, bt = float(totals["t"]), float(totals["bt"])
    scored = (
        big.filter(F.col("c_xy") >= 5)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c2"), "w2")
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") / F.lit(bt))
                    / ((F.col("c1") / F.lit(t)) * (F.col("c2") / F.lit(t)))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(20)


# ---------------------------------------------------------------------------
# kfold_stratified
# ---------------------------------------------------------------------------

_KFOLD_K = 5


@register(
    "kfold_stratified",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
  FROM documents WHERE text IS NOT NULL
),
assigned AS (
  SELECT lang, CAST((rk - 1) % {_KFOLD_K} AS INTEGER) AS fold, n_chars
  FROM ranked
)
SELECT lang, fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM assigned GROUP BY lang, fold ORDER BY lang, fold
""",
)
def kfold_stratified(spark, sf_dir):
    """Deterministic stratified k-fold assignment (k=5): within each
    language stratum, docs are ordered by content hash (md5 — engine-
    and partitioning-independent, the sample_hash_deterministic rule)
    and dealt round-robin, so every stratum's folds are balanced to
    within one document — the property random splitting only gives in
    expectation.

    Scale shape: the per-stratum window parallelizes across strata; for
    a corpus whose language skew makes single strata exceed one task,
    production swaps the dealer to ``pmod(xxhash64(text), k)`` (pure
    map-side, no window — balance within sqrt(n) noise; the engine-side
    test pins that variant's balance), keeping this exact-balance form
    for bounded strata.  Output is the per-(stratum, fold) audit the
    split publisher ships alongside the assignment.

    NULL text is filtered on BOTH engines before ranking (ADVICE r11:
    Spark windows default NULLS FIRST, DuckDB NULLS LAST — one NULL doc
    would shift every row_number in its stratum and silently break the
    cross-engine match)."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    assigned = d.select(
        "lang",
        "n_chars",
        ((F.row_number().over(w) - 1) % _KFOLD_K).cast("int").alias("fold"),
    )
    return (
        assigned.groupBy("lang", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        .orderBy("lang", "fold")
    )


def kfold_hash_assign(spark, sf_dir, k: int = _KFOLD_K):
    """Map-only hash dealer (the skew-immune 100 TB path): fold =
    pmod(xxhash64(text), k).  Not registered (xxhash64 has no DuckDB
    twin) — the engine-side test pins its per-stratum balance against
    the exact round-robin form above."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "lang",
        F.pmod(F.xxhash64("text"), F.lit(k)).cast("int").alias("fold"),
    ).groupBy("lang", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# stream_restart_checkpoint
# ---------------------------------------------------------------------------


@register("stream_restart_checkpoint", streaming=True)
def stream_restart_checkpoint(spark, sf_dir):
    """Exactly-once across a planned restart: a per-user purchase count
    stream runs against file batch 1, STOPS, the source gains batch 2,
    and a NEW query restarts from the SAME checkpoint — the state store
    restores batch-1 counts and processes only the unseen files, so the
    final counts equal the batch groupBy over both batches with no
    double-counting of batch 1.  This is the durability property that
    lets a 100 TB continuous-curation job survive deploys and
    preemptions; rows-only at the driver (wall-clock source lifecycle),
    value-pinned by tests/test_round11b.py::
    test_stream_restart_checkpoint_exactly_once."""
    from ..streaming.stream_ops import _events_source_dir, _fresh_dir

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    cut = ev.agg(F.percentile_approx("event_id", 0.5)).collect()[0][0]
    src = _events_source_dir(
        spark, sf_dir, chunks=[F.col("event_id") <= F.lit(cut)]
    )
    chk = _fresh_dir("chk-restart")
    name = f"t_{uuid.uuid4().hex[:8]}"

    def start(query_name):
        sdf = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .parquet(src)
            .filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
        )
        return (
            sdf.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )

    q1 = start(name)
    q1.awaitTermination()
    q1.stop()

    # the source grows AFTER the first query finished and stopped
    ev.filter(F.col("event_id") > F.lit(cut)).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    name2 = f"t_{uuid.uuid4().hex[:8]}"
    q2 = start(name2)
    q2.awaitTermination()
    q2.stop()
    return spark.table(name2).orderBy("user_id")
