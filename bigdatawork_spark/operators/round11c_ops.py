"""Round-11 (cont. 2) incremental-dedup family.  REF:∅ (reference
snapshot empty — SURVEY.md §0).

A production curation pipeline is CONTINUOUS: batch N+1 arrives after
100 TB have already been curated, and must be deduplicated (a) within
itself and (b) against the accumulated corpus — WITHOUT rescanning the
corpus text.  The standing state is a dedup INDEX: the corpus's exact
content hashes (64 bytes/doc) and, for near-dup, the MinHash signatures
of its exact-unique representatives.  These keys demonstrate that shape
on the `documents` table with `doc_id % 10 = 7` playing the arriving
batch and the remaining 90% the standing corpus:

- ``dedup_incremental_exact`` — batch survivors after the exact index
  anti-join + within-batch collapse (oracled).
- ``dedup_incremental_audit`` — the per-source admission report
  (kept / batch_dup / index_hit) a pipeline operator ships per batch
  (oracled; `kept` ≡ the survivor count by construction, pinned in
  tests/test_round11c.py).
- ``dedup_incremental_minhash`` — near-dup hits of the batch RESIDUE
  against the corpus representatives via MinHash-LSH, ladder-style
  (exact collapse first on BOTH sides — the SCALE.md §8 lesson; LSH
  runs index⋈batch, never corpus⋈corpus).  Rows-only (LSH bucketing is
  engine-specific); recall pinned against a hand-built cross-split
  near-dup corpus in tests/test_round11c.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_BATCH_MOD = 10
_BATCH_REM = 7

# The sf corpus carries no natural exact duplicates, so without help the
# exact/audit keys would hash-match with every branch but 'kept' firing on
# ZERO rows (the r05 vacuity lesson; the dedup_ladder_exact_stage replica
# pattern is reused here): both engines inject the SAME deterministic
# replicas — every doc_id % 50 = 0 document reappears in the BATCH
# (+1000007 keeps the new id ≡ 7 mod 10 → an index_hit) and every
# doc_id % 50 = 7 document reappears in the batch again (+1000010 → a
# batch_dup), so all three admission statuses are exercised and checked.
_AUG_SQL = """
aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000007, text, source FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 1000010, text, source FROM documents WHERE doc_id % 50 = 7
)
"""


def _augmented_documents(spark, sf_dir):
    """documents ∪ the deterministic replica plants (see _AUG_SQL)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return (
        d.unionByName(
            d.filter(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 1000007).alias("doc_id"), "text", "source"
            )
        ).unionByName(
            d.filter(F.col("doc_id") % 50 == 7).select(
                (F.col("doc_id") + 1000010).alias("doc_id"), "text", "source"
            )
        )
    )


# Bounded-lifetime cache for the hashed (augmented) relation: every
# admission builder consumes batch/corpus from MULTIPLE subplans (group
# mins + joins), and Spark recomputes the full union+sha2 lineage per
# consumer otherwise (the SURVEY §7 cache-shared-subplans lesson).  One
# sf_dir is live at a time; switching evicts the previous dir's entries
# (tests fuzz over fresh tmp dirs — without eviction each example would
# leak a cached relation into executor storage, ADVICE r10).
_SPLIT_CACHE: dict[str, dict[bool, object]] = {}


def _hashed_documents(spark, sf_dir, *, augmented: bool, cache: bool = True):
    import os

    if os.environ.get("SPARK_GRAFT_CACHE") == "0":
        cache = False  # plan dumps need the file scans visible (io.load rule)
    if not cache:
        d = (
            _augmented_documents(spark, sf_dir)
            if augmented
            else load(spark, sf_dir, "documents").select("doc_id", "text", "source")
        )
        return d.withColumn("h", F.sha2("text", 256))
    per = _SPLIT_CACHE.get(sf_dir)
    if per is None:
        for old_dir in list(_SPLIT_CACHE):
            for df in _SPLIT_CACHE.pop(old_dir).values():
                try:
                    df.unpersist(blocking=False)
                except Exception:
                    pass  # the old relation's session may already be stopped
        per = _SPLIT_CACHE.setdefault(sf_dir, {})
    if augmented not in per:
        per[augmented] = _hashed_documents(
            spark, sf_dir, augmented=augmented, cache=False
        ).cache()
    return per[augmented]


def _split(spark, sf_dir, *, augmented: bool = True, cache: bool = True):
    """(batch, corpus) halves under the %10=7 arrival rule, each with the
    64-hex content hash attached (the only column the index-side plumbing
    ever shuffles).  ``augmented`` adds the replica plants (exact/audit
    keys); the minhash key splits the natural corpus — exact replicas are
    collapsed before LSH anyway, so planting them there would verify
    nothing.  ``cache=False`` bypasses the shared hashed-relation cache
    (dedup_index_persisted pins FileSourceScan Location lines, which an
    InMemoryTableScan would hide)."""
    h = _hashed_documents(spark, sf_dir, augmented=augmented, cache=cache)
    return (
        h.filter(F.col("doc_id") % _BATCH_MOD == _BATCH_REM),
        h.filter(F.col("doc_id") % _BATCH_MOD != _BATCH_REM),
    )


@register(
    "dedup_incremental_exact",
    oracle=f"""
WITH {_AUG_SQL},
batch AS (
  SELECT doc_id, sha256(text) AS h FROM aug
  WHERE doc_id % {_BATCH_MOD} = {_BATCH_REM}
),
idx AS (
  SELECT DISTINCT sha256(text) AS h FROM aug
  WHERE doc_id % {_BATCH_MOD} <> {_BATCH_REM}
),
grp AS (
  SELECT h, MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_batch_copies
  FROM batch GROUP BY h
)
SELECT g.doc_id, g.h AS text_hash, g.n_batch_copies
FROM grp g
WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.h = g.h)
ORDER BY g.doc_id
""",
)
def dedup_incremental_exact(spark, sf_dir):
    """Exact-dedup admission of an arriving batch against the standing
    corpus index: collapse the batch per content hash (keep min doc_id,
    count copies), then anti-join the CORPUS HASH INDEX — the batch
    never sees corpus text, and the join shuffles 64-byte hashes on both
    sides.  At 100 TB the index is a persisted hash-bucketed table of
    ~64 B/doc; admission cost scales with the BATCH, not the corpus.
    Both engines run over the replica-augmented corpus (_AUG_SQL) so the
    anti-join and the within-batch collapse each reject REAL rows — not
    the vacuous 0=0 a dup-free corpus would give."""
    batch, corpus = _split(spark, sf_dir)
    idx = corpus.select("h").distinct()
    grp = batch.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_batch_copies"),
    )
    return (
        grp.join(idx, "h", "left_anti")
        .select("doc_id", F.col("h").alias("text_hash"), "n_batch_copies")
        .orderBy("doc_id")
    )


@register(
    "dedup_incremental_audit",
    oracle=f"""
WITH {_AUG_SQL},
batch AS (
  SELECT doc_id, source, sha256(text) AS h FROM aug
  WHERE doc_id % {_BATCH_MOD} = {_BATCH_REM}
),
idx AS (
  SELECT DISTINCT sha256(text) AS h FROM aug
  WHERE doc_id % {_BATCH_MOD} <> {_BATCH_REM}
),
grp AS (SELECT h, MIN(doc_id) AS keep_id FROM batch GROUP BY h),
cls AS (
  SELECT b.source,
         CASE WHEN i.h IS NOT NULL THEN 'index_hit'
              WHEN b.doc_id > g.keep_id THEN 'batch_dup'
              ELSE 'kept' END AS status
  FROM batch b
  JOIN grp g ON b.h = g.h
  LEFT JOIN idx i ON b.h = i.h
)
SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM cls GROUP BY source, status ORDER BY source, status
""",
)
def dedup_incremental_audit(spark, sf_dir):
    """The per-batch admission report: every arriving doc classified
    `index_hit` (hash already in the corpus index — precedence over the
    within-batch rule), `batch_dup` (a younger copy inside the batch),
    or `kept`, rolled up per source.  This is the audit artifact a
    continuous pipeline publishes with each ingested batch; `kept`
    counts equal ``dedup_incremental_exact``'s survivor count (pinned
    cross-op in tests).  Plan shape: two hash-key joins (batch⋈batch
    group mins, batch⋈index) plus a tiny (source × 3) rollup — nothing
    wider than the hash column moves."""
    batch, corpus = _split(spark, sf_dir)
    idx = corpus.select("h").distinct().withColumn("in_idx", F.lit(True))
    mins = batch.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    cls = (
        batch.join(mins, "h")
        .join(idx, "h", "left")
        .select(
            "source",
            F.when(F.col("in_idx"), "index_hit")
            .when(F.col("doc_id") > F.col("keep_id"), "batch_dup")
            .otherwise("kept")
            .alias("status"),
        )
    )
    return (
        cls.groupBy("source", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("source", "status")
    )


# Bounded-lifetime cache (the minhash_pairs pattern, ADVICE r10): the two
# staged feature relations feed lsh.fit and both join sides; each call
# evicts the previous call's relations.
_INC_STAGED_LAST: list[DataFrame] = []


def incremental_minhash_hits(
    index_docs: DataFrame,
    batch_docs: DataFrame,
    *,
    num_hash_tables: int = 5,
    threshold: float = 0.2,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup hits of ``batch_docs`` against ``index_docs`` (both need
    (doc_id, text)) via the minhash_pairs pipeline (RegexTokenizer →
    NGram(shingle_n) → binary HashingTF → MinHashLSH), joined
    batch⋈index instead of self⋈self: candidate generation is LSH band
    buckets over the INDEX side, so admission cost scales with the batch
    and the bucket densities, never corpus².  Returns
    (batch_doc, index_doc, jaccard_dist ≤ threshold) sorted."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, RegexTokenizer

    tok = RegexTokenizer(inputCol="text", outputCol="words", pattern=r"\s+")
    ngram = NGram(n=shingle_n, inputCol="words", outputCol="shingles")
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )

    def stage(docs):
        s = tf.transform(ngram.transform(tok.transform(docs)))
        return s.filter(F.size("shingles") >= 1).cache()

    global _INC_STAGED_LAST
    for old in _INC_STAGED_LAST:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # the old relation's session may already be stopped
    idx_staged, batch_staged = stage(index_docs), stage(batch_docs)
    _INC_STAGED_LAST = [idx_staged, batch_staged]

    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(idx_staged)
    hits = model.approxSimilarityJoin(
        batch_staged, idx_staged, threshold, distCol="jaccard_dist"
    )
    return (
        hits.select(
            F.col("datasetA.doc_id").alias("batch_doc"),
            F.col("datasetB.doc_id").alias("index_doc"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
        .orderBy("batch_doc", "index_doc")
    )


@register("dedup_incremental_minhash")  # rows-only: LSH bucketing is engine-specific
def dedup_incremental_minhash(spark, sf_dir):
    """Near-dup admission of the arriving batch against the corpus,
    ladder-style (SCALE.md §8: exact collapse BEFORE LSH, on both
    sides — replica floods otherwise saturate band buckets):

      1. corpus → exact-unique representatives (min doc_id per hash) —
         at 100 TB this is the PERSISTED signature index, maintained
         incrementally, not recomputed;
      2. batch → within-batch representatives, MINUS exact index hits
         (those are already decided by ``dedup_incremental_exact`` —
         LSH never re-litigates jaccard=0 pairs);
      3. MinHash-LSH join of the batch residue against the corpus
         representatives (default banding: 5 tables, distance ≤ 0.2).

    Output (batch_doc, index_doc, jaccard_dist): the admission decisions
    a near-dup policy consumes.  Recall is pinned against a hand-built
    cross-split near-dup corpus (tests/test_round11c.py) — the sf corpus
    is not guaranteed to carry near-dups straddling the %10 split.
    Splits the NATURAL corpus (augmented=False): planted exact replicas
    would be collapsed before LSH anyway and verify nothing here."""
    batch, corpus = _split(spark, sf_dir, augmented=False)
    corpus_reps = (
        corpus.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        .join(corpus.select("doc_id", "text"), "doc_id")
    )
    idx_hashes = corpus.select("h").distinct()
    batch_residue = (
        batch.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        .join(idx_hashes, "h", "left_anti")
        .join(batch.select("doc_id", "text"), "doc_id")
    )
    return incremental_minhash_hits(
        corpus_reps.select("doc_id", "text"),
        batch_residue.select("doc_id", "text"),
    )


# ---------------------------------------------------------------------------
# stream_index_admission — the streaming twin of the admission family
# ---------------------------------------------------------------------------


@register("stream_index_admission", streaming=True)  # rows-only: wall-clock source lifecycle
def stream_index_admission(spark, sf_dir):
    """Continuous admission as a STREAM: arriving documents are probed
    against the static corpus hash index (stream-static left_anti join —
    the index broadcasts or probes per micro-batch, no stream state) and
    then folded into a stateful per-hash admission LEDGER
    (``groupBy(h).agg(min(doc_id), count)`` in complete mode — state
    that merges re-arrivals ACROSS micro-batches).  The min-agg ledger
    is deliberately arrival-order-INVARIANT: ``dropDuplicates`` (the
    row-passing alternative, demonstrated by ``stream_dedup``) keeps an
    arbitrary row of a same-batch duplicate pair, so its admitted
    doc_ids depend on file order and intra-batch scheduling; the ledger
    admits min(doc_id) per hash no matter how arrivals are batched.
    The source is written as two files drained one per trigger: file 1
    is the natural batch, file 2 is all replica plants (copies of
    file-1 docs and of corpus docs), so the second micro-batch consists
    entirely of rows the join must drop or the ledger must MERGE rather
    than re-admit — cross-micro-batch, which is what distinguishes
    stateful streaming dedup from a per-batch distinct.

    The final ledger therefore equals ``dedup_incremental_exact``'s
    full (doc_id, text_hash, n_batch_copies) survivor relation (pinned
    in tests/test_round11c.py).  Production note: unbounded per-hash
    state wants a watermark once a re-arrival horizon exists — that
    bounded-state variant is ``stream_index_admission_wm`` (r12), which
    pins the state-store eviction as a runtime metric; the index side
    stays a plain batch relation re-read per micro-batch, i.e. the
    persisted-index shape."""
    import uuid as _uuid

    from ..streaming.stream_ops import _fresh_dir, _read_stream, stamp_mtimes

    batch, corpus = _split(spark, sf_dir, augmented=False)
    src = _fresh_dir("src-adm")
    nat = batch.select("doc_id", "text")
    nat.coalesce(1).write.mode("append").parquet(src)
    stamped: set = set()
    stamp_mtimes(src, 0, stamped)  # explicit mtime order (ADVICE r12)
    plants = nat.filter(F.col("doc_id") % 50 == 7).select(
        (F.col("doc_id") + 1000010).alias("doc_id"), "text"
    ).unionByName(
        corpus.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 1000007).alias("doc_id"), "text"
        )
    )
    plants.coalesce(1).write.mode("append").parquet(src)
    stamp_mtimes(src, 1, stamped)

    idx = corpus.select("h").distinct()
    sdf = (
        _read_stream(spark, src, max_files=1)
        .withColumn("h", F.sha2("text", 256))
        .join(idx, "h", "left_anti")
        .groupBy(F.col("h").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_batch_copies"),
        )
        .select("doc_id", "text_hash", "n_batch_copies")
    )
    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", _fresh_dir("chk-adm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("doc_id")


# ---------------------------------------------------------------------------
# stream_index_admission_wm — the BOUNDED-STATE admission ledger
# ---------------------------------------------------------------------------

# Event-time layout for the watermarked ledger: four source files drained
# one per trigger, each stamped inside a distinct hour so the 30-minute
# watermark finalizes (emits + EVICTS) each admission window as the next
# one arrives.  Listed here so the engine test can rebuild the expected
# relation from the same constants.
_WM_BASE = "2024-03-01 00:10:00"
_WM_PLANT_TS = "2024-03-01 00:30:00"  # same hour window as _WM_BASE
_WM_W2_TS = "2024-03-01 03:10:00"  # advances watermark past window 1
_WM_FLUSH_TS = "2024-03-01 06:10:00"  # advances watermark past window 2
_WM_W2_SHIFT = 2000000
_WM_W2_SUFFIX = " w2marker"

# q.recentProgress of the last stream_index_admission_wm run — the engine
# test reads the per-micro-batch state-store numRowsTotal trace from here
# to pin EVICTION (the metric drops after the horizon passes), the same
# runtime-evidence pattern as join_dpp_partitioned's partitions-read pin.
_WM_LAST_PROGRESS: list = []


def _wm_source_dir(spark, sf_dir) -> str:
    """Write the four-trigger admission source (see the builder docstring
    for the timeline) into a fresh dir, one file per trigger, with
    explicit strictly-increasing mtimes (ADVICE r12: the 50 ms sleeps this
    relied on can tie on coarse-mtime filesystems, letting the 03:10 file
    process first and late-drop window 1 behind the 02:40 watermark).
    Shared by the builder and the kill/restart recovery test so both
    drive the identical source lifecycle."""
    from ..streaming.stream_ops import _fresh_dir, stamp_mtimes

    batch, corpus = _split(spark, sf_dir, augmented=False)
    src = _fresh_dir("src-admwm")
    stamped: set = set()

    nat = batch.select("doc_id", "text").withColumn(
        "event_ts", F.lit(_WM_BASE).cast("timestamp")
    )
    nat.coalesce(1).write.mode("append").parquet(src)
    stamp_mtimes(src, 1, stamped)
    plants = (
        batch.filter(F.col("doc_id") % 50 == 7)
        .select((F.col("doc_id") + 1000010).alias("doc_id"), "text")
        .unionByName(
            corpus.filter(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 1000007).alias("doc_id"), "text"
            )
        )
        .withColumn("event_ts", F.lit(_WM_PLANT_TS).cast("timestamp"))
    )
    plants.coalesce(1).write.mode("append").parquet(src)
    stamp_mtimes(src, 2, stamped)
    w2 = batch.select(
        (F.col("doc_id") + _WM_W2_SHIFT).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_WM_W2_SUFFIX)).alias("text"),
    ).withColumn("event_ts", F.lit(_WM_W2_TS).cast("timestamp"))
    w2.coalesce(1).write.mode("append").parquet(src)
    stamp_mtimes(src, 3, stamped)
    sentinel = spark.createDataFrame(
        [(-1, "wm flush sentinel 5f2a")], "doc_id long, text string"
    ).withColumn("event_ts", F.lit(_WM_FLUSH_TS).cast("timestamp"))
    sentinel.coalesce(1).write.mode("append").parquet(src)
    stamp_mtimes(src, 4, stamped)
    return src


def _wm_admission_stream(spark, sf_dir, src):
    """The watermarked admission streaming DataFrame over ``src`` —
    one-file-per-trigger read, anti-join against the corpus hash index,
    1-hour admission windows under a 30-minute watermark, append-mode
    finalized output.  Extracted so the checkpoint kill/restart test
    runs the EXACT pipeline the registered key runs."""
    from ..streaming.stream_ops import _read_stream

    _, corpus = _split(spark, sf_dir, augmented=False)
    idx = corpus.select("h").distinct()
    return (
        _read_stream(spark, src, max_files=1)
        .withColumn("h", F.sha2("text", 256))
        .withWatermark("event_ts", "30 minutes")
        .join(idx, "h", "left_anti")
        .groupBy(
            F.window("event_ts", "1 hour").alias("win"),
            F.col("h").alias("text_hash"),
        )
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_batch_copies"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "doc_id",
            "text_hash",
            "n_batch_copies",
        )
    )


@register("stream_index_admission_wm", streaming=True)  # rows-only: wall-clock source lifecycle
def stream_index_admission_wm(spark, sf_dir):
    """Bounded-state streaming admission (VERDICT r11 item 5): the
    admission ledger of ``stream_index_admission`` with a RE-ARRIVAL
    HORIZON — a 30-minute event-time watermark over 1-hour admission
    windows, append mode — so per-hash state is EVICTED once the horizon
    passes instead of accumulating forever (the unbounded-ledger caveat
    that key's docstring conceded).

    Semantics: a replica arriving within its window's horizon MERGES
    (same min-doc_id/count ledger as the unbounded twin — window 1's
    emitted relation is pinned ≡ ``stream_index_admission``'s full
    ledger); a "re-arrival" past the horizon would be a NEW admission
    decision made against the persisted index, which at production scale
    has absorbed the earlier window's hashes by then (the index-update
    stage ``dedup_index_persisted`` demonstrates) — exactly the contract
    a continuous pipeline wants, with state bounded by arrival-rate ×
    horizon instead of corpus size.

    Source lifecycle (one file per trigger): file 1 the natural batch at
    00:10; file 2 all replica plants at 00:30 (inside window 1's horizon
    → must merge/drop via state); file 3 a later batch of NEW documents
    at 03:10 (watermark 02:40 > window-1 end 01:00 → window 1 is emitted
    and its state EVICTED); file 4 a single far-future sentinel at 06:10
    (flushes window 2 the same way; the default no-data micro-batch then
    performs the final emit).  The engine test pins both the emitted
    survivor relations AND the state-store ``numRowsTotal`` trace
    (rises, then DROPS after each horizon passes — bounded state as a
    runtime metric, not prose) from ``_WM_LAST_PROGRESS``."""
    import json as _json
    import uuid as _uuid

    from ..streaming.stream_ops import _fresh_dir

    src = _wm_source_dir(spark, sf_dir)
    sdf = _wm_admission_stream(spark, sf_dir, src)
    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append emits a window only once finalized
        .option("checkpointLocation", _fresh_dir("chk-admwm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _WM_LAST_PROGRESS.clear()
    for p in q.recentProgress:
        _WM_LAST_PROGRESS.append(
            _json.loads(p.json) if hasattr(p, "json") else p
        )
    return spark.table(name).orderBy("window_start", "doc_id")


# ---------------------------------------------------------------------------
# dedup_index_persisted — the persisted-index admission, plan-pinned
# ---------------------------------------------------------------------------


@register(
    "dedup_index_update_idempotent",
    oracle=f"""
WITH batch AS (
  SELECT doc_id, sha256(text) AS h FROM documents
  WHERE doc_id % {_BATCH_MOD} = {_BATCH_REM}
),
idx0 AS (
  SELECT DISTINCT sha256(text) AS h FROM documents
  WHERE doc_id % {_BATCH_MOD} <> {_BATCH_REM}
),
grp AS (SELECT h, MIN(doc_id) AS doc_id FROM batch GROUP BY h),
surv AS (
  SELECT g.h FROM grp g
  WHERE NOT EXISTS (SELECT 1 FROM idx0 i WHERE i.h = g.h)
),
idx1 AS (SELECT h FROM idx0 UNION SELECT h FROM surv),
readmit AS (
  SELECT g.h FROM grp g
  WHERE NOT EXISTS (SELECT 1 FROM idx1 i WHERE i.h = g.h)
)
SELECT phase, n FROM (
  SELECT 'admitted_first' AS phase, CAST(COUNT(*) AS BIGINT) AS n FROM surv
  UNION ALL
  SELECT 'admitted_after_update', CAST(COUNT(*) AS BIGINT) FROM readmit
  UNION ALL
  SELECT 'index_size_before', CAST(COUNT(*) AS BIGINT) FROM idx0
  UNION ALL
  SELECT 'index_size_after', CAST(COUNT(*) AS BIGINT) FROM idx1
) ORDER BY phase
""",
)
def dedup_index_update_idempotent(spark, sf_dir):
    """Index MAINTENANCE — the stage that closes the continuous-admission
    loop the §11c family demonstrates (build → admit → UPDATE → re-admit):
    after a batch's survivors are admitted, their hashes are APPENDED to
    the persisted index (new parquet files under the same path — O(batch)
    writes, the standing corpus index is never rewritten or rescanned),
    and re-admitting the SAME batch against the updated index must admit
    ZERO documents.  That idempotence is what makes the pipeline safe to
    re-run after a partial failure (at-least-once delivery upstream) —
    the same guarantee stream_restart_checkpoint pins for streaming
    state, here for the batch index.

    Output: the four-phase audit (admitted_first / admitted_after_update
    / index_size_before / index_size_after) — admitted_after_update is
    pinned 0 and index growth equals the first admission's survivor
    count.  At 100 TB every step is O(batch) plus one anti-join probe of
    the 64 B/doc index; compaction of the appended files is ordinary
    table maintenance."""
    from ..streaming.stream_ops import _fresh_dir

    batch, corpus = _split(spark, sf_dir, augmented=False, cache=False)
    idx_path = _fresh_dir("hashidx-upd")
    corpus.select("h").distinct().write.mode("overwrite").parquet(idx_path)

    grp = batch.groupBy("h").agg(F.min("doc_id").alias("doc_id"))

    # localCheckpoint: the survivor relation feeds both the count and the
    # append write, and the append targets the SAME path its plan reads —
    # materializing it evaluates the anti-join once and severs the
    # self-read-while-appending lineage (code-review r12) instead of
    # leaning on the read-time file-listing snapshot.
    surv = grp.join(
        spark.read.parquet(idx_path), "h", "left_anti"
    ).localCheckpoint()
    n_before = spark.read.parquet(idx_path).count()
    n_first = surv.count()
    # the UPDATE: append only the survivors' hashes — new files, no rewrite
    surv.select("h").write.mode("append").parquet(idx_path)

    idx1 = spark.read.parquet(idx_path)
    n_after = idx1.distinct().count()
    n_re = grp.join(idx1, "h", "left_anti").count()

    return spark.createDataFrame(
        [
            ("admitted_after_update", n_re),
            ("admitted_first", n_first),
            ("index_size_after", n_after),
            ("index_size_before", n_before),
        ],
        "phase string, n long",
    ).orderBy("phase")


@register(
    "dedup_index_persisted",
    oracle=f"""
WITH batch AS (
  SELECT doc_id, sha256(text) AS h FROM documents
  WHERE doc_id % {_BATCH_MOD} = {_BATCH_REM}
),
idx AS (
  SELECT DISTINCT sha256(text) AS h FROM documents
  WHERE doc_id % {_BATCH_MOD} <> {_BATCH_REM}
),
grp AS (
  SELECT h, MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_batch_copies
  FROM batch GROUP BY h
)
SELECT g.doc_id, g.h AS text_hash, g.n_batch_copies
FROM grp g
WHERE NOT EXISTS (SELECT 1 FROM idx i WHERE i.h = g.h)
ORDER BY g.doc_id
""",
)
def dedup_index_persisted(spark, sf_dir):
    """The persisted-index admission: SCALE.md §11c's "the index is a
    persisted table" claim as a PINNED PLAN, not prose.  Stage 1 (index
    build/maintenance — amortized across every future batch) writes the
    corpus's distinct content hashes to parquet; stage 2 (admission)
    reads the BATCH slice of `documents` plus the index FILES — the
    admission query's executed plan contains exactly ONE scan of
    documents.parquet and one of the index path (pinned in
    tests/test_round11c.py), i.e. corpus text is provably not rescanned
    per batch.  Natural split (no replica plants): the plants' union
    would add corpus-slice scans to the admission plan and break the
    very property this key pins; the rejection VALUES are verified by
    ``dedup_incremental_exact`` (planted + fuzzed) and by this key's
    planted-corpus engine test."""
    from ..streaming.stream_ops import _fresh_dir

    batch, corpus = _split(spark, sf_dir, augmented=False, cache=False)
    idx_path = _fresh_dir("hashidx")
    corpus.select("h").distinct().write.mode("overwrite").parquet(idx_path)

    idx = spark.read.parquet(idx_path)
    grp = batch.groupBy("h").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_batch_copies"),
    )
    return (
        grp.join(idx, "h", "left_anti")
        .select("doc_id", F.col("h").alias("text_hash"), "n_batch_copies")
        .orderBy("doc_id")
    )
