"""Training-data pipeline operators: benchmark-contamination screening,
context-window sequence packing, inverted-index build, and
temperature-balanced mixture resampling.  REF:∅ (reference snapshot empty —
SURVEY.md §0); extends the curation family (curation.py) with the
pretraining-corpus operations a 100 TB text pipeline runs between dedup and
tokenization.

Scale notes: contamination is a broadcast semi-join of training-doc shingles
against the (small) benchmark shingle set; packing windows PARTITION BY
source so no global ordering bottleneck exists; the inverted index shuffles
once on token; mixture resampling derives per-source keep rates from a
broadcast 1-row-per-source aggregate and filters by content hash — the same
engine/layout-independent discipline as sample_hash_deterministic.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "contamination_ngram",
    oracle="""
WITH words AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, len(ws) - 4),
           i -> array_to_string(ws[i:i+4], ' ')))) AS g
  FROM words WHERE len(ws) >= 5
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
SELECT train.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
FROM train JOIN bench ON train.g = bench.g
GROUP BY train.doc_id
ORDER BY train.doc_id
""",
)
def contamination_ngram(spark, sf_dir):
    """Benchmark-contamination screen: flag training documents sharing any
    word 5-gram with a held-out benchmark set (proxied as doc_id % 97 = 0)
    and count the distinct overlapping shingles per document.  The
    benchmark shingle set is DISTINCT and small, so the overlap join
    broadcasts it against the exploded training shingles — no shuffle of
    the big side.  At 100 TB this is exactly the decontamination pass run
    against eval suites before pretraining (shingles of the benchmark fit
    in memory by construction)."""
    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= 5
    )
    grams = words.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(ws) - 4),"
                    " i -> concat_ws(' ', slice(ws, i, 5)))"
                )
            )
        ).alias("g"),
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    train = grams.filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
        .orderBy("doc_id")
    )


@register(
    "pack_sequences",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, len(str_split(text, ' ')) AS n_tok
  FROM documents
),
packed AS (
  SELECT source, doc_id, n_tok,
         CAST(FLOOR(CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS DOUBLE)
                    / 512.0) AS BIGINT) AS bin_id
  FROM toks
)
SELECT source, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM packed
GROUP BY source, bin_id
ORDER BY source, bin_id
""",
)
def pack_sequences(spark, sf_dir):
    """Context-window sequence packing: assign documents to 512-token
    training windows by running token count, packing within each source
    shard in doc_id order (bin = floor(preceding-tokens / 512) — the
    streaming-concatenation layout).  PARTITION BY source keeps the
    running sum shard-local, so at 100 TB each shard packs independently
    — no global sort, no single-partition window.  Counts are
    integer-exact."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")).cast("double") / F.lit(512.0)
        ),
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@register(
    "inverted_index",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(str_split(text, ' '))) AS token
  FROM documents WHERE doc_id < 300
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS doc_freq,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM tok
WHERE length(token) >= 4
GROUP BY token
ORDER BY token
""",
)
def inverted_index(spark, sf_dir):
    """Inverted-index build: token → document frequency + sorted posting
    list (distinct tokens per doc; tokens ≥ 4 chars; doc_id < 300 slice).
    One shuffle on token; posting lists sort inside the aggregation
    (sort_array over collect_list — both engines emit ascending arrays),
    then comma-join to a string so the driver canonicalizer (which cannot
    hash array cells) compares them as scalars.
    At 100 TB postings for frequent tokens are the skew risk — production
    shards them into (token, bucket) segment files; doc_freq here is the
    statistic that drives that split."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    ).filter(F.length("token") >= 4)
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("doc_freq"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list("doc_id")).cast("array<string>")
            ).alias("postings"),
        )
        .orderBy("token")
    )




def mixture_hex_thresh(rate_col):
    """32-bit content-hash keep threshold for a keep-rate in (0, 1] —
    shared by mixture_resample and CurationPipeline.mixture_temperature
    so the policy lives in ONE place.  A full keep-rate maps to 'g'
    (lexicographically after every hex digit, so `md5 prefix < 'g'` keeps
    every row): floor(1.0·2³²) = 2³² whose 9-char hex lpad(…, 8) silently
    TRUNCATED to '10000000', keeping only ~6% of the smallest source
    (r05 review bug, previously mirrored in the oracle)."""
    return F.when(rate_col >= 1.0, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(F.floor(rate_col * F.lit(4294967296.0))), 8, "0"))
    )


@register(
    "mixture_resample",
    oracle="""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
),
rates AS (
  SELECT source, n,
         sqrt(CAST((SELECT MIN(n) FROM counts) AS DOUBLE) / CAST(n AS DOUBLE))
           AS keep_rate
  FROM counts
),
thresh AS (
  SELECT source, n, keep_rate,
         CASE WHEN keep_rate >= 1.0 THEN 'g'
              ELSE lower(lpad(to_hex(CAST(FLOOR(keep_rate * 4294967296.0)
                                          AS BIGINT)), 8, '0')) END
           AS hex_thresh
  FROM rates
)
SELECT t.source,
       t.n AS n_before,
       CAST(COUNT(*) AS BIGINT) AS n_after,
       ROUND(t.keep_rate, 6) AS keep_rate
FROM documents d
JOIN thresh t ON d.source = t.source
WHERE substr(md5(d.text), 1, 8) < t.hex_thresh
GROUP BY t.source, t.n, t.keep_rate
ORDER BY t.source
""",
)
def mixture_resample(spark, sf_dir):
    """Temperature-balanced mixture resampling: downsample each source
    toward the smallest one with keep-rate sqrt(min_count / count) — the
    alpha=0.5 temperature reweighting used to flatten pretraining source
    mixtures.  The rate maps to a 32-bit hex threshold and rows are kept
    when their content-hash prefix falls below it, so the kept set is a
    pure function of content and rates — identical across engines,
    partitionings, and reruns on appended data (old rows never resample).
    Per-source rates come from a broadcast aggregate; the filter is
    narrow, no shuffle of the fact side before the final count."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "source",
        "n",
        F.sqrt(F.col("min_n").cast("double") / F.col("n").cast("double")).alias(
            "keep_rate"
        ),
    )
    thresh = rates.withColumn(
        "hex_thresh", mixture_hex_thresh(F.col("keep_rate"))
    )
    return (
        d.join(F.broadcast(thresh), "source")
        .filter(F.substring(F.md5("text"), 1, 8) < F.col("hex_thresh"))
        .groupBy("source", "n", "keep_rate")
        .agg(F.count(F.lit(1)).alias("n_after"))
        .select(
            "source",
            F.col("n").alias("n_before"),
            "n_after",
            F.round("keep_rate", 6).alias("keep_rate"),
        )
        .orderBy("source")
    )


@register(
    "decontaminate_exact",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN text IS NULL THEN NULL
              ELSE md5(COALESCE(array_to_string(list_sort(list_distinct(
                  list_filter(string_split(lower(text), ' '), w -> w <> ''))),
                  ' '), '')) END AS fp,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
                THEN 'val' ELSE 'test' END AS split
  FROM documents
),
bench AS (SELECT DISTINCT fp FROM d WHERE split IN ('val', 'test'))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_train,
       CAST(SUM(CASE WHEN fp IN (SELECT fp FROM bench) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN fp IN (SELECT fp FROM bench) THEN 0 ELSE 1 END)
            AS BIGINT) AS n_clean
FROM d WHERE split = 'train'
GROUP BY source ORDER BY source
""",
)
def decontaminate_exact(spark, sf_dir):
    """Benchmark DECONTAMINATION by exact content identity — the gate
    every pretraining pipeline runs before training: any train-split
    document whose order-normalized content fingerprint (sorted distinct
    word set, the doc_fingerprint policy) also appears in the held-out
    val/test splits is flagged and dropped, because training on an eval
    document's content invalidates the eval.  Fingerprints rather than
    raw text so reordered/shuffled variants of a benchmark document are
    caught too; contamination_ngram is the partial-overlap sibling
    (13-gram collisions), this is the exact-identity tier of the same
    ladder.  NON-VACUOUS on this corpus: 30 / 29 / 668 contaminated
    train docs at sf0.001 / 0.01 / 0.1 (measured round 7).

    Plan: fingerprint + split label are map-only expressions; the
    benchmark fingerprint set (5-10% of the corpus, hash-sized rows)
    builds with one vocabulary-class aggregate and the membership test is
    a left-semi/anti join on the fingerprint — at 100 TB the benchmark
    side is the broadcast side (eval sets are small by construction), so
    the scan stays single-pass with no wide shuffle."""
    from .curation import split_label_sql

    d = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "source",
        "md5(array_join(array_sort(array_distinct("
        "filter(split(lower(text), ' '), w -> w != ''))), ' ')) as fp",
        f"{split_label_sql('doc_id')} as split",
    )
    bench = (
        d.filter(F.col("split").isin("val", "test")).select("fp").distinct()
    )
    train = d.filter("split = 'train'")
    flagged = train.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "fp", "left"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.sum(F.when(F.col("__hit").isNotNull(), 0).otherwise(1))
            .cast("bigint")
            .alias("n_clean"),
        )
        .orderBy("source")
    )


@register(
    "pack_bins_greedy",
    oracle="""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
              AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens
           AS tokens_before
  FROM t
),
b AS (
  SELECT source, tokens_before // 2048 AS bin, n_tokens FROM c
)
SELECT source, CAST(bin AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(n_tokens) AS DOUBLE) / 2048, 6) AS fill_ratio
FROM b GROUP BY source, bin ORDER BY source, bin
""",
)
def pack_bins_greedy(spark, sf_dir):
    """Sequential greedy BIN PACKING of documents into fixed token
    budgets (2048) per source shard — the document-level packing plan a
    training dataloader consumes (pack_sequences is the window-chunking
    sibling that splits INSIDE documents; this one assigns WHOLE
    documents to training bins in arrival order, the sample-packing
    layout).  A document's bin is determined by the tokens accumulated
    BEFORE it (running sum frame minus self), so assignment is a pure
    function of (source, doc_id order) — append-stable and deterministic
    in both engines.  fill_ratio > 1 marks straddling bins (a document
    crossing the boundary belongs to the bin it started in — the
    padding-vs-splitting decision is the dataloader's, this op gives it
    the ledger).

    Plan: one shuffle on source, a single sorted pass per partition for
    the running sum, then a map-side-combinable (source, bin) aggregate.
    At 100 TB the partition key is (source, shard) so no single source
    serializes into one task — same discipline as sort_range_partitioned."""
    d = load(spark, sf_dir, "documents")
    t = d.selectExpr(
        "doc_id",
        "source",
        "cast(size(filter(split(text, ' '), w -> w != '')) as bigint)"
        " as n_tokens",
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = t.withColumn(
        "tokens_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        c.withColumn("bin", F.floor(F.col("tokens_before") / 2048))
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.round(F.sum("n_tokens").cast("double") / 2048, 6).alias(
                "fill_ratio"
            ),
        )
        .orderBy("source", "bin")
    )


@register(
    "mixture_epoch_plan",
    oracle="""
WITH counts AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> '')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
wsum AS (
  SELECT CAST(SUM(CAST(pow(n_tokens, 0.5) AS DECIMAL(28,12))) AS DOUBLE)
           AS z
  FROM counts
)
SELECT source, n_docs, n_tokens,
       ROUND(pow(n_tokens, 0.5) / z, 6) AS mix_weight,
       CAST(floor(pow(n_tokens, 0.5) / z * 1000000) AS BIGINT)
         AS alloc_tokens,
       ROUND(pow(n_tokens, 0.5) / z * 1000000 / n_tokens, 6) AS epochs
FROM counts CROSS JOIN wsum
ORDER BY source
""",
)
def mixture_epoch_plan(spark, sf_dir):
    """Temperature-weighted training MIXTURE PLAN (α = 0.5): per source,
    the sampling weight n_tokens^α / Σ n_tokens^α, the token allocation
    out of a 1M-token budget, and the implied epoch count (allocation /
    source size — epochs > 1 means the source repeats, the standard
    up-sampling of small high-quality sources; mixture_resample is the
    row-level DOWN-sampling twin that enforces such a plan by content
    hash).  Deterministic: the weight denominator sums per-source
    pow(n,0.5) terms cast to DECIMAL(28,12) first, so the fold is
    order-independent and both engines agree bitwise.

    Plan: one map-side-combined per-source aggregate (sources-sized
    output), a 1-row broadcast denominator fold, map-only scoring — this
    is a planning op: its output is the config a dataloader or
    mixture_resample consumes, at any corpus scale."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.expr("size(filter(split(text, ' '), w -> w != ''))")
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    z = counts.agg(
        F.sum(F.pow("n_tokens", 0.5).cast("decimal(28,12)"))
        .cast("double")
        .alias("z")
    )
    wgt = F.pow("n_tokens", 0.5) / F.col("z")
    return (
        counts.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(wgt, 6).alias("mix_weight"),
            F.floor(wgt * 1000000).cast("bigint").alias("alloc_tokens"),
            F.round(wgt * 1000000 / F.col("n_tokens"), 6).alias("epochs"),
        )
        .orderBy("source")
    )
