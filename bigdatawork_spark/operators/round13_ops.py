"""Round-13 operators.  REF:∅ (reference snapshot empty — SURVEY.md §0).

Two additions a retrieval-backed training-data pipeline needs:

- ``rank_fusion_rrf`` — hybrid retrieval: fuse a lexical (BM25) ranking
  and a semantic (embedding-cosine) ranking of the same corpus with
  Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
  the standard way RAG/search stacks combine keyword and vector hits
  without score calibration (ranks are comparable; raw scores aren't).
- ``join_bloom_prefilter`` — the Bloom-style pre-shuffle semi-filter:
  hash the (large) build side's join keys into a FIXED-SIZE position
  domain, broadcast the occupied positions, and prune the probe side
  with two cheap hash-membership semi-joins BEFORE the exact join.
  False positives are removed by the exact join; false negatives are
  impossible by construction, so the semantics are exactly the plain
  join — which is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# -- rank_fusion_rrf ---------------------------------------------------------

_RRF_K = 60          # the SIGIR-2009 constant; dampens top-rank dominance
_RRF_TERMS = ("join", "merge", "scan")   # lexical query (bm25_rank's)
_RRF_QVEC = 0        # semantic query = this vec_id's embedding
_RRF_LIST = 50       # per-modality candidate list depth
_K1, _B = 1.2, 0.75  # BM25 constants (search_ops.bm25_rank's)


def _topk_rank(df, score_col: str, id_col: str, rank_col: str):
    """Global top-``_RRF_LIST`` ranking WITHOUT a corpus-wide
    single-partition window: each partition keeps its local top-k under
    the strict total order (score desc, id asc), then one tiny global
    window ranks ≤ k·P candidate rows.  The global top-k is contained in
    the union of partition-local top-ks under the same strict total
    order (sim_cosine_topk's candidate argument), and the result is
    partitioning-invariant because local pruning only ever keeps a
    superset of the global winners."""
    wl = Window.partitionBy("_pid").orderBy(F.col(score_col).desc(), id_col)
    wg = Window.orderBy(F.col(score_col).desc(), id_col)
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(wl))
        .filter(F.col("_lr") <= _RRF_LIST)
        .withColumn(rank_col, F.row_number().over(wg))
        .filter(F.col(rank_col) <= _RRF_LIST)
    )


@register(
    "rank_fusion_rrf",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
  WHERE text IS NOT NULL
),
tokf AS (SELECT doc_id, word FROM tok WHERE word <> ''),
doclen AS (SELECT doc_id, COUNT(*) AS len FROM tokf GROUP BY doc_id),
stats AS (
  SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM tokf)
           / (SELECT COUNT(*) FROM documents) AS avglen,
         (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS n_docs
),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM tokf
  WHERE word IN {_RRF_TERMS!r}
  GROUP BY doc_id, word
),
df AS (SELECT word, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY word),
contrib AS (
  SELECT t.doc_id,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * ({_K1} + 1.0))
           / (t.tf + {_K1} * (1.0 - {_B} + {_B} * l.len / s.avglen)) AS c
  FROM tf t
  JOIN df d ON t.word = d.word
  JOIN doclen l ON t.doc_id = l.doc_id
  CROSS JOIN stats s
),
lex AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY ROUND(CAST(SUM(CAST(c AS DECIMAL(28,12))) AS DOUBLE), 6)
                    DESC, doc_id) AS lex_rank
  FROM contrib GROUP BY doc_id
  QUALIFY lex_rank <= {_RRF_LIST}
),
v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         sqrt(list_aggregate(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
  FROM embeddings
),
q AS (SELECT e AS qe, nrm AS qn FROM v WHERE vec_id = {_RRF_QVEC}),
sem AS (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY ROUND(list_aggregate(list_transform(list_zip(v.e, q.qe),
                            z -> z[1] * z[2]), 'sum') / (v.nrm * q.qn), 6)
                    DESC, vec_id) AS sem_rank
  FROM v CROSS JOIN q WHERE vec_id <> {_RRF_QVEC}
  QUALIFY sem_rank <= {_RRF_LIST}
),
fused AS (
  SELECT COALESCE(l.doc_id, s.vec_id) AS doc_id,
         COALESCE(l.lex_rank, 0) AS lex_rank,
         COALESCE(s.sem_rank, 0) AS sem_rank,
         COALESCE(1.0 / ({_RRF_K} + l.lex_rank), 0)
           + COALESCE(1.0 / ({_RRF_K} + s.sem_rank), 0) AS rrf
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
)
SELECT doc_id, CAST(lex_rank AS INTEGER) AS lex_rank,
       CAST(sem_rank AS INTEGER) AS sem_rank,
       ROUND(rrf, 6) AS rrf_score,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER)
         AS fused_rank
FROM fused QUALIFY fused_rank <= 20
ORDER BY fused_rank
""",
)
def rank_fusion_rrf(spark, sf_dir):
    """Hybrid retrieval via Reciprocal Rank Fusion: BM25 top-50 for the
    fixed query {join, merge, scan} (bm25_rank's scorer and constants)
    fused with cosine top-50 against doc 0's embedding (the corpus links
    doc_id ↔ vec_id 1:1), rrf(d) = Σ_lists 1/(60 + rank), top-20 out.
    A doc missing from one list contributes 0 from it (rank encoded 0 =
    absent).  Ranks come from row_number over the ROUNDED (6 dp) scores
    with an id tiebreak, so a last-ulp ln()/product difference cannot
    reorder either list cross-engine; the fused score is then a sum of
    exact small rationals — identical in any IEEE double engine.

    Scale: both candidate lists are top-k over one corpus pass each —
    BM25 reads a term-pruned posting slice (the IN-filter runs BEFORE
    its shuffle), the cosine side is a scan with a broadcast 1-row query
    vector — and BOTH rank via ``_topk_rank``'s partition-local-top-k →
    global-candidate-window split, so no corpus-sized relation ever
    funnels through a single-partition window; the fusion full-outer
    join touches 2k candidate rows, never the corpus.  At 100 TB the posting/length artifacts are built
    once (bm25_rank materializes exactly those) and each query costs a
    candidate-list merge — this key pins the merge's semantics."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tokf = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    doclen = tokf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = (
        doclen.agg(F.sum("len").cast("double").alias("n_tokens"))
        .crossJoin(
            load(spark, sf_dir, "documents")
            .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
        )
        .select("n_docs", (F.col("n_tokens") / F.col("n_docs")).alias("avglen"))
    )
    tf = (
        tokf.filter(F.col("word").isin(*_RRF_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + _K1 * (
        1.0 - _B + F.lit(_B) * F.col("len") / F.col("avglen")
    )
    scored = (
        tf.join(F.broadcast(df), "word")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * (F.col("tf") * (_K1 + 1.0)) / norm).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("c").cast("decimal(28,12)")).cast("double"), 6
            ).alias("score")
        )
    )
    lex = _topk_rank(scored, "score", "doc_id", "lex_rank").select(
        "doc_id", "lex_rank"
    )

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    ).select(
        "vec_id",
        "e",
        F.sqrt(
            F.aggregate(
                "e", F.lit(0.0), lambda acc, x: acc + x * x
            )
        ).alias("nrm"),
    )
    q = v.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    cos = F.round(
        F.aggregate(
            F.zip_with("e", "qe", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("nrm") * F.col("qn")),
        6,
    )
    sem = _topk_rank(
        v.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cos")),
        "cos",
        "vec_id",
        "sem_rank",
    ).select("vec_id", "sem_rank")

    fused = (
        lex.join(sem, lex["doc_id"] == sem["vec_id"], "full_outer")
        .select(
            F.coalesce(lex["doc_id"], sem["vec_id"]).alias("doc_id"),
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
            (
                F.coalesce(1.0 / (_RRF_K + lex["lex_rank"]), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + sem["sem_rank"]), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    wf = Window.orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.select(
            "doc_id",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("sem_rank").cast("int").alias("sem_rank"),
            F.round("rrf", 6).alias("rrf_score"),
            F.row_number().over(wf).cast("int").alias("fused_rank"),
        )
        .filter(F.col("fused_rank") <= 20)
        .orderBy("fused_rank")
    )


# -- join_bloom_prefilter ----------------------------------------------------

_BLOOM_BITS = 8192   # position domain per hash function (m)
_BLOOM_DIM_NATION = "NATION_7"


@register(
    "join_bloom_prefilter",
    oracle="""
SELECT l.l_suppkey AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                AS BIGINT)) / 10000.0 AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_7'
GROUP BY l.l_suppkey
ORDER BY s_suppkey
""",
)
def join_bloom_prefilter(spark, sf_dir):
    """Selective fact⋈dim join behind a Bloom-style pre-shuffle filter:
    the NATION_7 suppliers' keys hash (xxhash64, two salts) into a
    fixed 8192-position domain; the occupied positions — at most m rows
    of ints, REGARDLESS of dim cardinality — broadcast, and lineitem is
    pruned by two broadcast LEFT SEMI probes (k=2 Bloom membership,
    O(1) hash probe per row, whole-stage codegen'd) before the exact
    broadcast join computes per-supplier revenue.  No false negatives
    by construction (every true key's positions are occupied), false
    positives die in the exact join — so the result is EXACTLY the
    plain join, which the oracle computes with no Bloom at all.

    Why not just broadcast the dim keys?  Here you would (and the final
    exact join does).  The Bloom shape matters when the build side is
    10⁷⁺ keys — too big to broadcast raw — yet the probe side is far
    bigger still: positions saturate at m (sized ~10 bits/key in
    production for ~1% FP; fixed here for determinism), so the filter
    stays broadcastable when the key set isn't, and the facts that
    would miss the join never enter the shuffle.  This is the manual,
    semantics-pinned form of what AQE's runtime Bloom-filter join
    injects; revenue uses the repo's scaled-long exact-sum discipline
    (2dp×2dp products are exactly 4dp)."""
    pruned, dim = _bloom_pruned_facts(
        spark, sf_dir, ["l_suppkey", "l_extendedprice", "l_discount"]
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    return (
        pruned.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(rev) / 10000.0).cast("double").alias("revenue"),
        )
        .orderBy("s_suppkey")
    )


def _bloom_pruned_facts(spark, sf_dir, fact_cols):
    """(pruned lineitem projection, NATION_7 supplier-key dim) — ONE
    construction shared by the registered key and the test diagnostic,
    so a salt/hash/probe change cannot diverge between what ships and
    what the no-false-negative test validates (r13 review)."""
    nat = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == _BLOOM_DIM_NATION
    )
    dim = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )

    def pos(col, salt):
        return F.pmod(F.xxhash64(F.lit(salt), col), F.lit(_BLOOM_BITS))

    # occupied positions per hash: ≤ m distinct ints each — broadcastable
    # at ANY dim cardinality (the whole point of the shape)
    occ1 = dim.select(pos(F.col("s_suppkey"), 1).alias("p1")).distinct()
    occ2 = dim.select(pos(F.col("s_suppkey"), 2).alias("p2")).distinct()
    li = load(spark, sf_dir, "lineitem").select(*fact_cols)
    pruned = (
        li.withColumn("p1", pos(F.col("l_suppkey"), 1))
        .join(F.broadcast(occ1), "p1", "left_semi")
        .withColumn("p2", pos(F.col("l_suppkey"), 2))
        .join(F.broadcast(occ2), "p2", "left_semi")
    )
    return pruned, dim


def bloom_prefilter_pass_count(spark, sf_dir):
    """Diagnostic (non-registry): the lineitem rows surviving the
    two-probe Bloom prefilter alone — tests pin pass_count < total AND
    pass_set ⊇ true-match set (no false negatives), against the SAME
    construction the registered key joins from."""
    pruned, _dim = _bloom_pruned_facts(spark, sf_dir, ["l_suppkey"])
    return pruned.select("l_suppkey")
