"""STAGED round-6 operators — implemented and tested in round 5, but NOT
registered in the live registry.  REF:∅ (reference snapshot empty —
SURVEY.md §0); these extend §2-K / the north-star pipeline mandate
(BASELINE.json:6).

Why staged: round 5 froze key additions so the 49 outstanding extras fit
the driver's 50-key CORRECTNESS window exactly (VERDICT r04 item 1 —
"freeze new key additions until r05 lands").  Each entry below is a
driver-shape builder ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) a DuckDB oracle, held in ``STAGED_QUERIES`` /
``STAGED_ORACLES``.  Round 6 promotes them with ``promote()`` — a one-call
re-registration into the live registry — after CORRECTNESS_r05 lands.

The set closes the "declared scale path" gaps VERDICT r04 / SCALE.md §8
left as docstring promises:

- ``knn_classify_ivf``  — knn_classify's documented swap ("at scale the
  pair stage swaps for the LSH candidate generator") made real, with IVF
  lists instead of BRP-LSH: the unit-norm corpus defeats euclidean LSH
  radii (measured quadratic blow-up at sf1.0), IVF stays n^1.5 and is
  deterministic enough for a hash-green oracle.
- ``dedup_ladder``      — the MEASURED production order from SCALE.md §8
  (exact-dup pre-pass → MinHash on unique representatives) as one
  composed operator instead of a prose recommendation.
- ``privacy_dp_count``  — ε-differential-privacy noisy group counts with
  deterministic content-hash noise (cross-engine reproducible, hence
  hash-green oracleable — same rationale as sample_hash_deterministic).
- ``ts_downsample_lttb``— parallel LTTB-mean downsampling (bucketed
  largest-triangle vs neighbor-bucket means; the sequential dependence of
  classic LTTB removed so every bucket resolves independently —
  shuffle-free beyond one ntile window, SQL-expressible, hash-green).
- ``embedding_pca_gram`` — top principal component via distributed
  Gramian accumulation (constant d×d state per task) + driver-side
  eigensolve of the d×d covariance (the MLlib RowMatrix layout); the
  dimensionality-reduction primitive for embedding-space curation
  (SemDeDup-style clustering preprocessing).
- ``coreset_sample_kcenter`` — greedy k-center coreset (diversity
  sampling for training-data pruning); iterative with one collected row
  per round, the kmeans_iterative state discipline.
- ``semdedup_prune``    — SemDeDup (embedding-space semantic dedup):
  within-cluster near-duplicate pruning over the shared IVF assignment;
  hash-green.
- ``win_rolling_median`` — exact median over a bounded moving row frame
  (the windowed-quantile shape §2-E lacks); hash-green.
- ``dedup_containment`` — asymmetric |A∩B|/min(|A|,|B|) containment, the
  quote/subset-inclusion detector symmetric Jaccard misses; hash-green.
- ``dsir_importance_resample`` — DSIR (unigram-LM importance weights,
  target slice vs whole corpus) with deterministic top-k selection;
  hash-green.
- ``ts_seasonal_decompose`` — hour-of-day seasonal baseline + residual
  RMS per cell (additive decomposition for seasonal anomaly detection);
  hash-green.
- ``table_format_vacuum`` — snapshot expiration for the manifest table
  format (expire superseded versions, delete unreferenced data files,
  content provably intact); hash-green via the structural version count,
  a manifest-derived file-count consistency boolean, and source
  re-aggregation (file counts are never pinned — ADVICE r05 item 4).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load

STAGED_QUERIES: dict[str, Callable] = {}
STAGED_ORACLES: dict[str, str] = {}


def _staged(key: str, oracle: str | None = None):
    def deco(fn):
        if key in STAGED_QUERIES:
            raise ValueError(f"duplicate staged key: {key}")
        STAGED_QUERIES[key] = fn
        if oracle is not None:
            STAGED_ORACLES[key] = oracle.strip()
        fn.query_key = key
        return fn

    return deco


def promote() -> list[str]:
    """Round-6 hook: register every staged key into the live registry.
    Call from operators/__init__ (or delete this module and inline the
    @register decorators) AFTER CORRECTNESS_r05 is committed."""
    from ..registry import register

    for key, fn in STAGED_QUERIES.items():
        register(key, oracle=STAGED_ORACLES.get(key))(fn)
    return sorted(STAGED_QUERIES)


# ---------------------------------------------------------------------------
# knn_classify_ivf — the declared scale path of knn_classify


# Shared oracle prefix: deterministic ⌈√n⌉-centroid IVF assignment (the
# sim_ann_ivf recipe generalized to a data-dependent centroid count).
# Used by knn_classify_ivf and semdedup_prune.
_IVF_ASSIGN_SQL = """
v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm,
         row_number() OVER (ORDER BY vec_id) AS rk,
         CAST(ceil(sqrt(COUNT(*) OVER ())) AS BIGINT) AS n_cent
  FROM v
),
centroids AS (
  SELECT vec_id AS cid, e AS ce, nrm AS cnrm FROM n WHERE rk <= n_cent
),
assign AS (
  SELECT vec_id, label, e, nrm, cid FROM (
    SELECT x.vec_id, x.label, x.e, x.nrm, c.cid,
           row_number() OVER (
             PARTITION BY x.vec_id
             ORDER BY list_aggregate(list_transform(list_zip(x.e, c.ce),
                      z -> z[1] * z[2]), 'sum') / (x.nrm * c.cnrm) DESC, c.cid
           ) AS rc
    FROM n x CROSS JOIN centroids c
  ) WHERE rc = 1
)
"""


def _ivf_assign(spark, sf_dir):
    """Deterministic IVF assignment shared by knn_classify_ivf and
    semdedup_prune: ⌈√n⌉ centroids = first ⌈√n⌉ vectors by vec_id
    (TakeOrdered + one bounded collect — √n×d doubles of driver state),
    sc.broadcast numpy matrix, BLAS argmax per Arrow batch (ascending cid
    order makes numpy's first-max reproduce the cos-desc/cid-asc
    tiebreak).  Returns (embeddings df, assignment df joined with label —
    one narrow shuffle on vec_id), or (df, None) for an empty table."""
    import math

    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    n_rows = e.count()
    n_cent = max(1, math.ceil(math.sqrt(n_rows)))
    cent_rows = e.orderBy("vec_id").limit(n_cent).collect()
    if not cent_rows:
        return e, None
    cid_arr = np.array([r["vec_id"] for r in cent_rows], dtype=np.int64)
    Cm = np.array([list(r["embedding"]) for r in cent_rows], dtype=np.float64)
    cnrm = np.sqrt((Cm * Cm).sum(axis=1))
    if (cnrm == 0).any():
        raise ValueError(
            f"ivf_assign: zero-norm centroid(s) "
            f"{cid_arr[cnrm == 0].tolist()} — cosine undefined"
        )
    bc = spark.sparkContext.broadcast((cid_arr, Cm, cnrm))

    def assign_batches(batches):
        bcid, bC, bcn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            xn = np.sqrt((X * X).sum(axis=1))
            if (xn == 0).any():
                bad = pdf["vec_id"].to_numpy()[xn == 0].tolist()
                raise ValueError(
                    f"ivf_assign: zero-norm embedding(s) {bad} — "
                    "cosine undefined; filter degenerate vectors first"
                )
            cs = (X @ bC.T) / (xn[:, None] * bcn[None, :])
            j = cs.argmax(axis=1)  # first max ⇒ cid-asc tiebreak
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cid": bcid[j]})

    best = e.select("vec_id", "embedding").mapInPandas(
        assign_batches, "vec_id bigint, cid bigint"
    )
    return e, e.join(best, "vec_id")


@_staged(
    "knn_classify_ivf",
    oracle=f"""
WITH {_IVF_ASSIGN_SQL.strip()},
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS nb, b.label AS nb_label,
         list_aggregate(list_transform(list_zip(a.e, b.e),
                        z -> z[1] * z[2]), 'sum') / (a.nrm * b.nrm) AS cos_raw
  FROM assign a JOIN assign b ON a.cid = b.cid AND a.vec_id <> b.vec_id
),
knn AS (
  SELECT src, nb_label FROM (
    SELECT src, nb_label,
           row_number() OVER (PARTITION BY src ORDER BY cos_raw DESC, nb) AS rn
    FROM pairs
  ) WHERE rn <= 5
),
votes AS (
  SELECT src, nb_label, COUNT(*) AS n_votes FROM knn GROUP BY src, nb_label
),
pred AS (
  SELECT src, nb_label AS pred_label FROM (
    SELECT src, nb_label,
           row_number() OVER (PARTITION BY src
                              ORDER BY n_votes DESC, nb_label) AS rv
    FROM votes
  ) WHERE rv = 1
)
SELECT e.vec_id, e.label, p.pred_label,
       CAST(CASE WHEN e.label = p.pred_label THEN 1 ELSE 0 END AS INTEGER)
         AS is_correct
FROM embeddings e JOIN pred p ON e.vec_id = p.src
ORDER BY e.vec_id
""",
)
def knn_classify_ivf(spark, sf_dir):
    """k=5 leave-one-out cosine kNN majority vote with the candidate stage
    swapped from the all-pairs cross join to IVF inverted lists — the swap
    knn_classify's docstring (llm_ops.py:431) and SCALE.md §8 declare for
    ≥10⁶ vectors, realized with the sim_ann_ivf machinery rather than
    BRP-LSH: this corpus is unit-norm (every pairwise distance ≤ 2), so
    any euclidean LSH radius wide enough for recall degenerates to a
    quadratic cross join (measured: >45 s at sf1.0), while IVF caps each
    point's candidates at its own list.  ⌈√n⌉ centroids (the standard IVF
    sizing: lists and centroid count both ~√n, so candidate pairs grow
    n^1.5, not n²) taken deterministically as the first ⌈√n⌉ vectors by
    vec_id; assignment = max cosine, tiebreak cid asc; then the exact
    cosine top-5 / (votes desc, label asc) vote of the brute-force twin,
    restricted to same-list pairs.  Fully deterministic → SQL-expressible
    → hash-green oracle, the stronger gate: a vote-agreement threshold
    would be meaningless here because the corpus labels carry no
    embedding structure (exact kNN accuracy ≈ 10% = chance, measured), so
    approximate candidate sets produce chaotic prediction flips.

    100 TB: centroid table is √n×d — collected once (bounded driver
    state, the kmeans_iterative discipline: 1e9 rows → 31623×64 doubles ≈
    16 MB) and sc.broadcast; assignment is a BLAS matmul per Arrow batch
    emitting narrow (vec_id, cid) rows; the ONLY shuffle is the cid
    grouped-map, whose per-list kNN + vote runs as one numpy Gram matrix
    per inverted list (bounded ~√n×√n).  The JVM-expr formulation was
    measured first and rejected: per-pair ``zip_with`` folds put the
    sf1.0 run at ~39 s against the 45 s budget (the same interpreted-fold
    wall sim_cosine_topk hit pre-BLAS); this form completes in seconds.
    Float caveat as sim_cosine_topk: BLAS sums differ from the oracle's
    sequential folds by ~1e-15, invisible at the 6-decimal rounding and
    far below any argmax/rank gap in this corpus."""
    import numpy as np
    import pandas as pd

    _, assign = _ivf_assign(spark, sf_dir)
    if assign is None:
        return spark.createDataFrame(
            [], "vec_id bigint, label int, pred_label int, is_correct int"
        )

    def list_knn(pdf):
        if len(pdf) < 2:  # singleton list: no leave-one-out neighbors
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "label": pd.Series([], dtype="int64"),
                    "pred_label": pd.Series([], dtype="int64"),
                    "is_correct": pd.Series([], dtype="int64"),
                }
            )
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        labs = pdf["label"].to_numpy(dtype=np.int64)
        X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
        xn = np.sqrt((X * X).sum(axis=1))
        if (xn == 0).any():
            raise ValueError(
                f"knn_classify_ivf: zero-norm embedding(s) "
                f"{ids[xn == 0].tolist()} — cosine undefined"
            )
        S = (X @ X.T) / np.outer(xn, xn)
        np.fill_diagonal(S, -np.inf)
        out = []
        for i in range(len(ids)):
            order = np.lexsort((ids, -S[i]))  # cos desc, nb asc
            top = [o for o in order if o != i][:5]
            votes: dict[int, int] = {}
            for o in top:
                votes[labs[o]] = votes.get(labs[o], 0) + 1
            pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            out.append((ids[i], labs[i], pred, int(labs[i] == pred)))
        return pd.DataFrame(
            out, columns=["vec_id", "label", "pred_label", "is_correct"]
        )

    return (
        assign.groupBy("cid")
        .applyInPandas(
            list_knn, "vec_id bigint, label int, pred_label int, is_correct int"
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# dedup_ladder — the measured production order (SCALE.md §8) as one operator


def _ladder_exact_stage(d):
    """Stage 1 of the ladder, shared with ``dedup_ladder_exact_stage``:
    collapse hash-identical documents to their min-doc_id representative.
    Returns (exact_pairs, representatives).  Shuffles constant-width
    sha256 keys, never documents."""
    hashed = d.select(
        "doc_id", "text", F.sha2("text", 256).alias("text_hash")
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).withColumn(
        "keep_id", F.min("doc_id").over(Window.partitionBy("text_hash"))
    )
    exact_pairs = (
        ranked.filter(F.col("rn") > 1)
        .select(
            F.col("keep_id").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
            F.lit("exact").alias("kind"),
            F.lit(0.0).alias("jaccard_dist"),
        )
    )
    reps = ranked.filter(F.col("rn") == 1).select("doc_id", "text")
    return exact_pairs, reps


@_staged(
    "dedup_ladder_exact_stage",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 5 = 0
),
g AS (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY text) AS keep_id,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM corpus
)
SELECT keep_id AS doc_a, doc_id AS doc_b, 'exact' AS kind,
       CAST(0.0 AS DOUBLE) AS jaccard_dist
FROM g WHERE rn > 1 ORDER BY doc_a, doc_b
""",
)
def dedup_ladder_exact_stage(spark, sf_dir):
    """The ladder's exact pre-pass ALONE, as a DuckDB-oracled key
    (VERDICT r10 item 7: the flagship production-dedup composition was
    rows-only end-to-end; its stage-1 output — every non-representative
    mapped to its min-doc_id representative — is plain SQL, so the driver
    now hash-checks it cross-engine; the MinHash stage stays covered by
    the recall-vs-exact-twin tests).  The sf0.01 corpus carries no
    natural exact duplicates (the stage would hash-match vacuously on
    0 = 0), so both engines first add the SAME deterministic replicas —
    every doc_id % 5 = 0 document re-appears at doc_id + 1000000, the
    round-10 messy-URL-generator pattern — and the checked pairs are the
    (original, replica) mappings the ranking logic must produce.  The
    oracle groups on raw text equality, equivalent to the sha256-key
    grouping the engine uses (the hash exists so the 100 TB shuffle
    carries 64-byte keys, not documents)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    exact_pairs, _ = _ladder_exact_stage(corpus)
    return exact_pairs.orderBy("doc_a", "doc_b")


@_staged("dedup_ladder")  # rows-only: MinHash stage is engine-specific
def dedup_ladder(spark, sf_dir):
    """Production dedup order, composed: (1) exact-dup pre-pass collapses
    hash-identical documents to their min-doc_id representative, (2)
    MinHash-LSH near-dup detection runs ONLY on the unique representatives.
    SCALE.md §8 MEASURED this order at sf1.0: the pre-pass collapses 50k
    docs → 4992 uniques in 1.3 s and the identical MinHash pipeline then
    finishes in 8.3 s total, vs >45 s (budget timeout) without it — exact
    replicas flood LSH band buckets ~10× denser otherwise.

    Output: one row per duplicate relation — kind='exact' rows map every
    non-representative doc to its representative (doc_a = keep, doc_b =
    dup, doc_a < doc_b by min-id choice); kind='near' rows are LSH
    candidate pairs of REPRESENTATIVES with jaccard_dist ≤ 0.2.  Near-dup
    pairs between members of two exact groups are implied by transitivity
    through their representatives (the standard production contract —
    grouping happens downstream in dedup_cluster_cc).

    100 TB: stage 1 shuffles constant-width sha256 keys; stage 2 inherits
    dedup_near_minhash's band-bucket shape on the collapsed corpus."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, RegexTokenizer

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    exact_pairs, reps = _ladder_exact_stage(d)

    tok = RegexTokenizer(inputCol="text", outputCol="words", pattern=r"\s+")
    ngram = NGram(n=3, inputCol="words", outputCol="shingles")
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    staged = tf.transform(ngram.transform(tok.transform(reps)))
    staged = staged.filter(F.size("shingles") >= 1).cache()
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=5, seed=42)
    model = lsh.fit(staged)
    near = model.approxSimilarityJoin(staged, staged, 0.2, distCol="jaccard_dist")
    near_pairs = (
        near.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.lit("near").alias("kind"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
    )
    return exact_pairs.unionByName(near_pairs).orderBy("kind", "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# privacy_dp_count — deterministic-noise DP counts (hash-green)

_DP_EPS = 1.0  # laplace scale b = sensitivity/eps = 1.0 for count queries


@_staged(
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


# ---------------------------------------------------------------------------
# ts_downsample_lttb — parallel LTTB-mean downsampling (hash-green)

_LTTB_BUCKETS = 20


@_staged(
    "ts_downsample_lttb",
    oracle=f"""
WITH pts AS (
  SELECT event_type, event_id, ts, value,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) AS DOUBLE) AS x,
         ntile({_LTTB_BUCKETS}) OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS bkt
  FROM events
),
bmeans AS (
  SELECT event_type, bkt, AVG(x) AS mx, AVG(value) AS my
  FROM pts GROUP BY event_type, bkt
),
ctx AS (
  SELECT event_type, bkt,
         lag(mx)  OVER (PARTITION BY event_type ORDER BY bkt) AS px,
         lag(my)  OVER (PARTITION BY event_type ORDER BY bkt) AS py,
         lead(mx) OVER (PARTITION BY event_type ORDER BY bkt) AS nx,
         lead(my) OVER (PARTITION BY event_type ORDER BY bkt) AS ny
  FROM bmeans
),
scored AS (
  SELECT p.event_type, p.event_id, p.ts, p.value, p.bkt,
         CASE WHEN c.px IS NULL OR c.nx IS NULL THEN NULL
              ELSE abs((c.px - c.nx) * (p.value - c.py)
                       - (c.px - p.x) * (c.ny - c.py)) / 2.0 END AS area
  FROM pts p JOIN ctx c ON p.event_type = c.event_type AND p.bkt = c.bkt
),
picked AS (
  SELECT event_type, event_id, ts, value, bkt, area,
         row_number() OVER (PARTITION BY event_type, bkt
                            ORDER BY area DESC, ts ASC, event_id ASC) AS pk
  FROM scored
)
SELECT event_type, event_id, ts, CAST(bkt AS INTEGER) AS bkt,
       ROUND(value, 6) AS value,
       ROUND(COALESCE(area, -1.0), 6) AS area
FROM picked WHERE pk = 1
ORDER BY event_type, bkt
""",
)
def ts_downsample_lttb(spark, sf_dir):
    """Series downsampling for plotting/sketching — LTTB-mean, the
    parallelizable variant of Largest-Triangle-Three-Buckets (Steinarsson
    2013): split each event_type series into equal-count buckets
    (20 buckets; ntile over ts, event_id), score every interior point by
    the triangle area it forms with the NEIGHBOR BUCKETS' MEAN points, keep the
    max-area point per bucket.  Classic LTTB anchors the triangle on the
    previously SELECTED point, a sequential chain; substituting the
    neighbor-bucket mean (which classic LTTB already uses on the right
    side) removes the chain so all buckets resolve independently —
    the map-reduce-able formulation.  Edge buckets (no left/right
    neighbor) keep their first point (area column = -1 sentinel).
    Deterministic: total order (ts, event_id) everywhere; tiebreak
    area DESC, ts ASC, event_id ASC.  Null-ordering note: within any one
    (event_type, bkt) partition the area column is homogeneous (edge
    buckets all-NULL, interior buckets no-NULL), so the pick never
    compares NULL against non-NULL and Spark's nulls-first-on-asc vs
    DuckDB's nulls-last default cannot diverge.

    100 TB: one shuffle per series partition (the ntile window), one tiny
    bucket-means aggregate joined back (broadcast at any scale — bucket
    count is constant), argmax per bucket via the same partitioning."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    pts = e.select(
        "event_type",
        "event_id",
        "ts",
        "value",
        F.row_number().over(w).cast("double").alias("x"),
        F.ntile(_LTTB_BUCKETS).over(w).alias("bkt"),
    )
    bmeans = pts.groupBy("event_type", "bkt").agg(
        F.avg("x").alias("mx"), F.avg("value").alias("my")
    )
    wb = Window.partitionBy("event_type").orderBy("bkt")
    ctx = bmeans.select(
        "event_type",
        "bkt",
        F.lag("mx").over(wb).alias("px"),
        F.lag("my").over(wb).alias("py"),
        F.lead("mx").over(wb).alias("nx"),
        F.lead("my").over(wb).alias("ny"),
    )
    scored = pts.join(F.broadcast(ctx), ["event_type", "bkt"]).withColumn(
        "area",
        F.when(
            F.col("px").isNull() | F.col("nx").isNull(), F.lit(None)
        ).otherwise(
            F.abs(
                (F.col("px") - F.col("nx")) * (F.col("value") - F.col("py"))
                - (F.col("px") - F.col("x")) * (F.col("ny") - F.col("py"))
            )
            / 2.0
        ),
    )
    # Edge buckets (area all-NULL): area desc ties for every row and the
    # (ts, event_id) tiebreak keeps the first point.  Interior buckets
    # (area no-NULL): plain max-area argmax.
    wp = Window.partitionBy("event_type", "bkt").orderBy(
        F.col("area").desc(),
        F.col("ts").asc(),
        F.col("event_id").asc(),
    )
    return (
        scored.withColumn("pk", F.row_number().over(wp))
        .filter(F.col("pk") == 1)
        .select(
            "event_type",
            "event_id",
            "ts",
            F.col("bkt").cast("int").alias("bkt"),
            F.round("value", 6).alias("value"),
            F.round(F.coalesce("area", F.lit(-1.0)), 6).alias("area"),
        )
        .orderBy("event_type", "bkt")
    )


# ---------------------------------------------------------------------------
# embedding_pca_gram — distributed Gramian + driver eigensolve


@_staged("embedding_pca_gram")  # rows-only: eigensolve not SQL-expressible
def embedding_pca_gram(spark, sf_dir):
    """Top principal component of the (mean-centered) embedding cloud via
    the two-step every distributed PCA uses below ~10³ dims — the exact
    layout of Spark MLlib RowMatrix.computePrincipalComponents: (1) one
    distributed pass accumulates the d×d Gramian and the d-vector mean as
    CONSTANT-SIZE per-task state (mapInPandas partial sums → driver
    reduce — d=64 here, 32 KB per task; same state discipline as
    kmeans_iterative), (2) the driver eigensolves the tiny covariance
    matrix (LAPACK ``eigh``, deterministic; sign-canonicalized so
    component[argmax|c|] > 0 — power iteration was measured too slow to
    converge on this cloud's tight λ₂/λ₁ ≈ 0.96 spectrum, leaving ~1e-2
    projection residuals after 100 rounds), then (3) a second distributed
    pass projects every embedding onto the component.  The d×d collapse
    is why this scales: 100 TB of rows stream through step 1 once,
    nothing driver-side ever depends on row count.

    Output: per-vector PC1 projection + the shared explained-variance
    ratio, the inputs embedding-space curation (SemDeDup-style clustering,
    stratified-by-projection sampling) starts from.  rows-only; tests
    re-derive the projections and variance ratio with an independent
    numpy eigensolve over the raw parquet."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    part_schema = "n bigint, s binary, g binary"

    def partial(batches):
        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            n += M.shape[0]
            s = M.sum(axis=0) if s is None else s + M.sum(axis=0)
            g = M.T @ M if g is None else g + M.T @ M
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tobytes()], "g": [g.tobytes()]}
            )

    parts = e.mapInPandas(partial, part_schema).collect()  # ≤ #tasks rows
    if not parts:
        return spark.createDataFrame(
            [], "vec_id bigint, pc1 double, explained_var_ratio double"
        )
    d = len(np.frombuffer(parts[0]["s"]))
    n_tot = sum(r["n"] for r in parts)
    s_tot = sum(np.frombuffer(r["s"]) for r in parts)
    g_tot = sum(np.frombuffer(r["g"]).reshape(d, d) for r in parts)
    mean = s_tot / n_tot
    cov = g_tot / n_tot - np.outer(mean, mean)

    w, V = np.linalg.eigh(cov)
    v = V[:, -1]
    if v[np.argmax(np.abs(v))] < 0:  # canonical sign
        v = -v
    lam = float(w[-1])
    ratio = lam / float(np.trace(cov)) if np.trace(cov) > 0 else 0.0

    comp = [float(x) for x in v]
    mean_l = [float(x) for x in mean]
    # three-array zip isn't a builtin: fold over the index instead (the
    # mean and component arrays are constant literals, element_at is O(1))
    return (
        e.select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("ev"),
        )
        .withColumn("c", F.array(*[F.lit(x) for x in comp]))
        .withColumn("m", F.array(*[F.lit(x) for x in mean_l]))
        .select(
            "vec_id",
            F.round(
                F.expr(
                    "aggregate(transform(sequence(1, size(ev)),"
                    " i -> (element_at(ev, i) - element_at(m, i))"
                    " * element_at(c, i)),"
                    " cast(0.0 as double), (a, x) -> a + x)"
                ),
                6,
            ).alias("pc1"),
            F.lit(round(ratio, 6)).alias("explained_var_ratio"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# coreset_sample_kcenter — greedy k-center diversity sample

_KCENTER_K = 8


@_staged("coreset_sample_kcenter")  # rows-only: iterative argmax chain
def coreset_sample_kcenter(spark, sf_dir):
    """Greedy k-center coreset (Gonzalez 1985) over the embedding cloud —
    the diversity-sampling primitive for training-data pruning: pick the
    point farthest from all chosen centers, k=8 times, starting from
    min vec_id.  Each round the driver collects exactly ONE row (the
    argmax) and the distributed side keeps a single running min-distance
    column updated by a narrow expression — kmeans_iterative's state
    discipline, with localCheckpoint keeping the plan flat.  2-approx of
    the optimal k-center radius, fully deterministic (dist DESC, vec_id
    ASC tiebreak).

    Output: the k centers in selection order with their coverage radius
    at selection time (radius_before = how far the farthest point was
    when this center was chosen — monotonically non-increasing, asserted
    in tests).

    100 TB: k scans of a cached/checkpointed narrow table; no shuffle at
    all inside a round (global argmax = orderBy(...).limit(1), which
    Spark executes as TakeOrdered — per-partition top-1 then driver
    merge, constant state)."""
    import math

    e = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x as double))").alias("ev"),
        )
        .localCheckpoint()
    )
    first = e.orderBy("vec_id").limit(1).collect()
    if not first:
        return spark.createDataFrame(
            [], "pick_order int, vec_id bigint, radius_before double"
        )
    centers = [(0, int(first[0]["vec_id"]), float("inf"))]

    # euclidean distance from each row's ev to the constant-literal array cv
    _dist = F.sqrt(
        F.expr(
            "aggregate(zip_with(ev, cv, (x, y) -> (x - y) * (x - y)),"
            " cast(0.0 as double), (a, x) -> a + x)"
        )
    )

    cur = (
        e.withColumn("cv", F.array(*[F.lit(float(x)) for x in first[0]["ev"]]))
        .select("vec_id", "ev", _dist.alias("mind"))
        .localCheckpoint()
    )

    for i in range(1, _KCENTER_K):
        far = (
            cur.orderBy(F.col("mind").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()
        )
        if not far or far[0]["mind"] == 0.0:
            break  # fewer than k distinct points
        radius = float(far[0]["mind"])
        cid = int(far[0]["vec_id"])
        centers.append((i, cid, radius))
        cvec = far[0]["ev"]
        cur = (
            cur.withColumn("cv", F.array(*[F.lit(float(x)) for x in cvec]))
            .select("vec_id", "ev", F.least("mind", _dist).alias("mind"))
            .localCheckpoint()
        )

    rows = [
        (o, vid, (round(r, 6) if math.isfinite(r) else -1.0))
        for o, vid, r in centers
    ]
    return spark.createDataFrame(
        rows, "pick_order int, vec_id bigint, radius_before double"
    ).orderBy("pick_order")


# ---------------------------------------------------------------------------
# semdedup_prune — embedding-space semantic dedup (SemDeDup)

_SEMDEDUP_TAU = 0.25


@_staged(
    "semdedup_prune",
    oracle=f"""
WITH {_IVF_ASSIGN_SQL.strip()},
close AS (
  SELECT a.vec_id AS kept_by, b.vec_id AS pruned_id, b.cid,
         list_aggregate(list_transform(list_zip(a.e, b.e),
                        z -> z[1] * z[2]), 'sum') / (a.nrm * b.nrm) AS cos_raw
  FROM assign a JOIN assign b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE ROUND(list_aggregate(list_transform(list_zip(a.e, b.e),
                       z -> z[1] * z[2]), 'sum') / (a.nrm * b.nrm), 6)
        >= {_SEMDEDUP_TAU}
)
SELECT pruned_id, kept_by, cid, ROUND(cos_raw, 6) AS cos_sim FROM (
  SELECT pruned_id, kept_by, cid, cos_raw,
         row_number() OVER (PARTITION BY pruned_id
                            ORDER BY kept_by) AS rk
  FROM close
) WHERE rk = 1
ORDER BY pruned_id
""",
)
def semdedup_prune(spark, sf_dir):
    """Semantic dedup in embedding space (SemDeDup, Abbas et al. 2023):
    cluster the corpus, then inside each cluster prune every vector that
    has a near-duplicate (cos ≥ 0.25 here — sized to this corpus's 5-NN
    cos ≈ 0.29 band) with a SMALLER vec_id, keeping the minimum-id member
    of each similarity clique.  Clustering is the deterministic ⌈√n⌉-
    centroid IVF assignment shared with knn_classify_ivf (the paper uses
    k-means; the candidate-bounding role is identical), which keeps the
    pair stage at n^1.5, never all-pairs — and makes the whole operator
    SQL-expressible, hence hash-green.

    Output: one row per PRUNED vector — (pruned_id, kept_by = its
    smallest same-cluster near-duplicate, cid, cos_sim of that pair).
    Downstream keeps `corpus MINUS pruned_id` (an anti-join).

    100 TB: same shape as knn_classify_ivf — broadcast centroids, BLAS
    assignment per Arrow batch, one cid shuffle, per-list Gram matrix in
    applyInPandas with bounded ~√n×√n lists."""
    import numpy as np
    import pandas as pd

    _, assign = _ivf_assign(spark, sf_dir)
    if assign is None:
        return spark.createDataFrame(
            [], "pruned_id bigint, kept_by bigint, cid bigint, cos_sim double"
        )

    def list_prune(pdf):
        empty = pd.DataFrame(
            {
                "pruned_id": pd.Series([], dtype="int64"),
                "kept_by": pd.Series([], dtype="int64"),
                "cid": pd.Series([], dtype="int64"),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if len(pdf) < 2:
            return empty
        order = np.argsort(pdf["vec_id"].to_numpy(), kind="stable")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)[order]
        X = np.array(pdf["embedding"].tolist(), dtype=np.float64)[order]
        cid = int(pdf["cid"].iloc[0])
        xn = np.sqrt((X * X).sum(axis=1))
        if (xn == 0).any():
            raise ValueError(
                f"semdedup_prune: zero-norm embedding(s) "
                f"{ids[xn == 0].tolist()} — cosine undefined"
            )
        S = (X @ X.T) / np.outer(xn, xn)
        out = []
        for j in range(1, len(ids)):  # ids ascending: candidates are i < j
            # round BEFORE the threshold test, mirroring the oracle's
            # ROUND(...,6) >= τ: BLAS matmul and DuckDB's sequential
            # list_aggregate sum the dot product in different orders, so a
            # pair sitting exactly on the raw float boundary could pass in
            # one engine and fail in the other (ADVICE r05).  Rounding both
            # sides to 6 dp makes the decision identical unless the engines
            # disagree by >=5e-7 — far above matmul reassociation error.
            hits = np.where(np.round(S[j, :j], 6) >= _SEMDEDUP_TAU)[0]
            if len(hits):
                i = hits[0]  # ascending ids ⇒ first hit = smallest kept_by
                out.append((int(ids[j]), int(ids[i]), cid, float(S[j, i])))
        if not out:
            return empty
        return pd.DataFrame(
            out, columns=["pruned_id", "kept_by", "cid", "cos_sim"]
        )

    return (
        assign.groupBy("cid")
        .applyInPandas(
            list_prune,
            "pruned_id bigint, kept_by bigint, cid bigint, cos_sim double",
        )
        .select(
            "pruned_id", "kept_by", "cid", F.round("cos_sim", 6).alias("cos_sim")
        )
        .orderBy("pruned_id")
    )


# ---------------------------------------------------------------------------
# win_rolling_median — exact median over a moving row frame (hash-green)


@_staged(
    "win_rolling_median",
    oracle="""
SELECT event_id, user_id, ts, ROUND(value, 6) AS value,
       ROUND(median(value) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             6) AS rolling_median
FROM events
WHERE user_id <= 50
ORDER BY user_id, ts, event_id
""",
)
def win_rolling_median(spark, sf_dir):
    """EXACT median over a 5-row moving frame per user — the windowed
    quantile shape the §2-E suite lacks (win_moving_avg is the mean twin;
    agg_median_percentile is the grouped, non-windowed one).  Spark has no
    native median window aggregate over a row frame, so the frame's values
    are gathered with collect_list OVER the same frame (bounded: ≤5
    elements — constant state per row, unlike a whole-partition collect)
    and the median computed by sorting the tiny array in-expression:
    odd count → middle, even count → mean of the two middles, matching
    DuckDB's continuous-interpolation median.

    100 TB: one shuffle on user_id (the window), O(frame log frame)
    per-row work on a constant-size frame — the standard pattern until
    SPARK native median-over-frame lands."""
    e = load(spark, sf_dir, "events").where("user_id <= 50")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    # collect_list drops NULLs (as does DuckDB's median); the size-0 guard
    # matters when every value in the frame is NULL — element_at(.., 0)
    # raises in Spark where DuckDB's empty-set median returns NULL
    med = F.expr(
        "case when size(frame) = 0 then cast(null as double)"
        " when size(frame) % 2 = 1"
        " then element_at(array_sort(frame), cast(size(frame) div 2 + 1 as int))"
        " else (element_at(array_sort(frame), cast(size(frame) div 2 as int))"
        "     + element_at(array_sort(frame),"
        "                  cast(size(frame) div 2 + 1 as int))) / 2.0"
        " end"
    )
    return (
        e.select("event_id", "user_id", "ts", "value")
        .withColumn("frame", F.collect_list("value").over(w))
        .withColumn("rolling_median", F.round(med, 6))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round("value", 6).alias("value"),
            "rolling_median",
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ---------------------------------------------------------------------------
# dedup_containment — asymmetric near-dup: quote/subset inclusion


@_staged(
    "dedup_containment",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 2),
                i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS s
  FROM toks WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 5),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a
  JOIN rare r ON a.s = r.s
  JOIN sh b ON b.s = r.s AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, contained_doc, containment FROM (
  SELECT i.doc_a, i.doc_b,
         CASE WHEN za.n_sh <= zb.n_sh THEN i.doc_a ELSE i.doc_b END
           AS contained_doc,
         ROUND(CAST(i.n_common AS DOUBLE)
               / least(za.n_sh, zb.n_sh), 6) AS containment
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
) WHERE containment >= 0.8
ORDER BY doc_a, doc_b
""",
)
def dedup_containment(spark, sf_dir):
    """Asymmetric containment dedup over 3-word-shingle sets:
    |A∩B| / min(|A|,|B|) ≥ 0.8 — the quote/subset-inclusion detector
    symmetric Jaccard structurally misses (a 50-shingle quote fully
    embedded in a 500-shingle doc scores Jaccard 0.1 but containment 1.0;
    Broder's original resemblance/containment pair).  SHINGLE sets, not
    word sets, deliberately: this corpus's 31-word vocabulary makes
    word-set containment vacuous (any long doc contains every word — and
    conversely the registered rare-WORD blocking of dedup_near_exactjacc
    finds zero candidates here because every word's df > 20, measured);
    the ~16k distinct shingles discriminate.  Candidates come from
    rare-shingle blocking (2 ≤ df ≤ 5 caps a block at 5 docs / 10 pairs),
    bounding the pair space at any corpus size.  Reports which side is
    the contained (smaller-set) document.

    100 TB: one shingle explode, df-bounded candidate join,
    count-intersection aggregation — dedup_near_exactjacc's shuffle shape
    with the discriminative token granularity."""
    d = load(spark, sf_dir, "documents")
    sh = (
        d.select(
            "doc_id",
            F.expr("filter(split(text, ' '), w -> w != '')").alias("ws"),
        )
        .filter(F.size("ws") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(ws) - 2),"
                        " i -> concat(element_at(ws, i), ' ',"
                        "             element_at(ws, i + 1), ' ',"
                        "             element_at(ws, i + 2)))"
                    )
                )
            ).alias("s"),
        )
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    rare = (
        sh.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df").between(2, 5))
        .select("s")
    )
    sa_r = sh.join(rare, "s").select(F.col("doc_id").alias("doc_a"), "s")
    sb_r = sh.join(rare, "s").select(F.col("doc_id").alias("doc_b"), "s")
    cand = (
        sa_r.join(sb_r, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    sb = sh.select(F.col("doc_id").alias("sb_doc"), F.col("s").alias("s_b"))
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("sb_doc")) & (F.col("s_a") == F.col("s_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    containment = F.col("n_common").cast("double") / F.least("na", "nb")
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .withColumn("containment", F.round(containment, 6))
        .filter(F.col("containment") >= 0.8)
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("na") <= F.col("nb"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
            "containment",
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# dsir_importance_resample — DSIR-style in-domain selection


@_staged(
    "dsir_importance_resample",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tokf AS (SELECT doc_id, word FROM tok WHERE word <> ''),
tgt_docs AS (SELECT doc_id FROM documents WHERE lang = 'en'),
tgt_freq AS (
  SELECT word, CAST(COUNT(*) AS DOUBLE) AS f
  FROM tokf JOIN tgt_docs USING (doc_id) GROUP BY word
),
src_freq AS (
  SELECT word, CAST(COUNT(*) AS DOUBLE) AS f FROM tokf GROUP BY word
),
vocab AS (SELECT CAST(COUNT(DISTINCT word) AS DOUBLE) AS v FROM tokf),
tgt_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tokf
          JOIN tgt_docs USING (doc_id)),
src_n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tokf),
ratio AS (
  SELECT s.word,
         CAST(ln((COALESCE(t.f, 0) + 1) / (tgt_n.n + vocab.v))
              - ln((s.f + 1) / (src_n.n + vocab.v))
              AS DECIMAL(28,12)) AS lr
  FROM src_freq s
  LEFT JOIN tgt_freq t ON t.word = s.word
  CROSS JOIN vocab CROSS JOIN tgt_n CROSS JOIN src_n
)
SELECT doc_id, n_tokens, avg_log_ratio FROM (
  SELECT tk.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(CAST(SUM(r.lr) AS DOUBLE) / COUNT(*), 6) AS avg_log_ratio,
         row_number() OVER (
           ORDER BY CAST(SUM(r.lr) AS DOUBLE) / COUNT(*) DESC, tk.doc_id
         ) AS rk
  FROM tokf tk JOIN ratio r ON r.word = tk.word
  GROUP BY tk.doc_id
)
WHERE rk <= 50
ORDER BY avg_log_ratio DESC, doc_id
""",
)
def dsir_importance_resample(spark, sf_dir):
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    with unigram LMs: score every document by the average per-token
    log-ratio ln p_target(w) − ln p_source(w) (add-1-smoothed unigram
    models; target = the lang='en' slice as the in-domain proxy, source =
    the whole corpus) and keep the top 50.  This is the importance-weight
    half of DSIR — production resamples proportionally to exp(weight);
    deterministic top-k keeps the operator oracle-checkable, and the
    hash-threshold machinery of mixture_resample is the drop-in
    stochastic-selection stage when weights become sampling rates.

    Determinism: per-token log-ratios are doubles cast to DECIMAL(28,12)
    BEFORE the per-document sum (the text_unigram_logprob discipline —
    a double sum folds in partition order and flips 6th-decimal rounding
    between engines); the average divides once at the end.

    100 TB: two vocabulary aggregates (map-side combined), one
    token⋈vocab equi-join (vocab table ≪ corpus → AQE broadcast; at
    open-vocab scale a sorted-merge with df pruning), one doc-keyed
    aggregation, TakeOrdered for the top-k — no all-pairs stage, no
    driver state beyond k rows."""
    d = load(spark, sf_dir, "documents")
    tokf = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .cache()
    )
    tgt_freq = (
        tokf.filter(F.col("lang") == "en")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    src_freq = tokf.groupBy("word").agg(
        F.count(F.lit(1)).cast("double").alias("sf")
    )
    scalars = tokf.agg(
        F.countDistinct("word").cast("double").alias("v"),
        F.count(F.lit(1)).cast("double").alias("src_n"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("double").alias("tgt_n"),
    )
    ratio = (
        src_freq.join(tgt_freq, "word", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            "word",
            (
                F.log(
                    (F.coalesce(F.col("tf"), F.lit(0.0)) + 1)
                    / (F.col("tgt_n") + F.col("v"))
                )
                - F.log((F.col("sf") + 1) / (F.col("src_n") + F.col("v")))
            )
            .cast("decimal(28,12)")
            .alias("lr"),
        )
    )
    scored = (
        tokf.join(ratio, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lr").cast("double") / F.count(F.lit(1))).alias("alr"),
        )
    )
    # orderBy().limit() compiles to TakeOrderedAndProject — per-partition
    # top-50 heaps merged on the driver — where a global-window row_number
    # would drag every scored document through ONE partition (the promotion
    # rehearsal's WindowExec warning caught exactly that).  Ranking uses
    # the unrounded decimal-exact average so the cut at rank 50 matches the
    # oracle bit-for-bit; rounding happens after selection.
    return (
        scored.orderBy(F.col("alr").desc(), "doc_id")
        .limit(50)
        .select(
            "doc_id",
            "n_tokens",
            F.round("alr", 6).alias("avg_log_ratio"),
        )
        .orderBy(F.col("avg_log_ratio").desc(), "doc_id")
    )


# ---------------------------------------------------------------------------
# ts_seasonal_decompose — hour-of-day seasonal baseline + residual energy


@_staged(
    "ts_seasonal_decompose",
    oracle="""
WITH means AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
           AS seasonal_mean
  FROM events GROUP BY event_type, hour(ts)
)
SELECT m.event_type, m.hr, m.n_events,
       ROUND(m.seasonal_mean, 6) AS seasonal_mean,
       ROUND(sqrt(CAST(SUM(CAST((e.value - m.seasonal_mean)
                               * (e.value - m.seasonal_mean)
                               AS DECIMAL(28,12))) AS DOUBLE)
                  / m.n_events), 6) AS resid_rms
FROM events e
JOIN means m ON m.event_type = e.event_type
            AND m.hr = CAST(hour(e.ts) AS INTEGER)
GROUP BY m.event_type, m.hr, m.n_events, m.seasonal_mean
ORDER BY m.event_type, m.hr
""",
)
def ts_seasonal_decompose(spark, sf_dir):
    """Seasonal-naive decomposition of the event stream: value =
    seasonal(hour-of-day, event_type) + residual, reporting the seasonal
    baseline and the residual RMS per (event_type, hour) cell — the
    additive-decomposition building block behind seasonal anomaly
    detection (anomaly_zscore is the global-stats cousin; this one
    removes the diurnal cycle first).  Two passes: a 120-cell means
    aggregate, then a broadcast join back to score residuals.

    Determinism: cell means use decimal-exact sums divided once;
    residual squares are cast to DECIMAL(28,12) per row before summing
    (the repo's standard defense against partition-order double folds).

    100 TB: the means table is |event_types|×24 rows — broadcast at any
    scale; both aggregations are map-side combinable; one shuffle each."""
    e = load(spark, sf_dir, "events")
    means = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("seasonal_mean"),
    )
    resid_sq = (
        (F.col("value") - F.col("seasonal_mean"))
        * (F.col("value") - F.col("seasonal_mean"))
    ).cast("decimal(28,12)")
    return (
        e.select("event_type", F.hour("ts").cast("int").alias("hr"), "value")
        .join(F.broadcast(means), ["event_type", "hr"])
        .groupBy("event_type", "hr", "n_events", "seasonal_mean")
        .agg(
            F.round(
                F.sqrt(F.sum(resid_sq).cast("double") / F.col("n_events").cast("double")),
                6,
            ).alias("resid_rms")
        )
        .select(
            "event_type",
            "hr",
            "n_events",
            F.round("seasonal_mean", 6).alias("seasonal_mean"),
            "resid_rms",
        )
        .orderBy("event_type", "hr")
    )


# ---------------------------------------------------------------------------
# table_format_vacuum — snapshot expiration for the manifest table format


@_staged(
    "table_format_vacuum",
    oracle="""
SELECT CAST(3 AS BIGINT) AS n_expired_versions,
       TRUE AS counts_manifest_consistent,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
""",
)
def table_format_vacuum(spark, sf_dir):
    """Snapshot expiration (VACUUM) for the manifest table format — the
    lifecycle op that bounds storage: three appends then a compaction
    leave the latest version referencing only the compacted files;
    vacuum(keep_last=1) must expire exactly the 3 superseded versions
    (structural, scale-independent, oracle-pinned) and delete exactly
    the files no kept manifest references.  File counts are DERIVED from
    the manifests and the physical directory walk, never pinned (the
    writer's file count per commit is an implementation detail of the
    parquet committer — VERDICT r06 / ADVICE r05 item 4): the builder
    asserts n_live == |kept manifest| and n_deleted == physical_before −
    n_live, and surfaces that consistency as an oracle-checked boolean.
    The surviving table must still re-aggregate to the source content
    (row count + decimal-exact value sum — so the deletion provably
    removed only dead bytes).  Manifests are removed BEFORE data files,
    so a crash mid-vacuum leaves re-collectable orphans, never a
    manifest pointing at deleted data.

    100 TB: the whole operation is manifest-side bookkeeping plus
    unreferenced-file deletes — no data is read or shuffled; cost scales
    with file COUNT, not bytes (the same reason compaction matters)."""
    import os as _os
    import shutil as _shutil

    from ..sources.io_ops import _tmp
    from ..sources.manifest_format import ManifestTable, _events_cols

    path = _tmp("manifest_vacuum")
    _shutil.rmtree(path, ignore_errors=True)
    t = ManifestTable(spark, path)
    ev = _events_cols(spark, sf_dir)
    for r in range(3):
        t.append(ev.filter(F.col("event_id") % 3 == r))
    t.compact()
    # manifest-derived expectations, measured BEFORE the vacuum mutates disk
    expect_live = t.file_count()  # files the kept (latest) manifest pins
    physical_before = sum(
        1
        for _root, _dirs, files in _os.walk(_os.path.join(path, "data"))
        for f in files
        if f.endswith(".parquet")
    )
    expect_expired = len(t.versions()) - 1
    stats = t.vacuum(keep_last=1)
    consistent = (
        stats["n_expired_versions"] == expect_expired
        and stats["n_live_files"] == expect_live
        and stats["n_deleted_files"] == physical_before - expect_live
    )
    return (
        t.read()
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.lit(stats["n_expired_versions"]).cast("bigint").alias(
                "n_expired_versions"
            ),
            F.lit(consistent).alias("counts_manifest_consistent"),
            "n_rows",
            "sum_value",
        )
    )
