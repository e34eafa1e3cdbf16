"""Text-search ranking operators — BM25 scoring and corpus n-gram mining
over the documents table.  REF:∅ (reference snapshot empty — SURVEY.md
§0); complements tfidf_keywords (llm_ops.py) with the query-side ranking
function a search user of the reference would expect.

Determinism discipline (SURVEY.md §5.3): tf/df/doclen are integers;
per-term BM25 contributions are a fixed double formula over those
integers, decimal-cast before the per-document sum (order-independent),
and ranking happens on the ROUNDED score with a doc_id tiebreak so a
last-ulp ln() difference cannot reorder the cut (same discipline as
tfidf_keywords).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_BM25_TERMS = ("join", "merge", "scan")
_K1, _B = 1.2, 0.75


@register(
    "bm25_rank",
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
  WHERE word IN {_BM25_TERMS!r}
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
scored AS (
  SELECT doc_id,
         ROUND(CAST(SUM(CAST(c AS DECIMAL(28,12))) AS DOUBLE), 6) AS score
  FROM contrib GROUP BY doc_id
)
SELECT doc_id, score, rn FROM (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rn
  FROM scored
) WHERE rn <= 20
ORDER BY rn
""",
)
def bm25_rank(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75) top-20 documents for the fixed query
    {join, merge, scan}: idf = ln(1 + (N−df+0.5)/(df+0.5)) per term,
    per-doc length normalization against the corpus mean length, per-term
    contributions decimal-summed per document, ranked on the rounded
    score.  Plan: the corpus explodes ONCE — into two materialized
    (localCheckpoint'd) artifacts, the term-pruned posting slice tf
    (IN-filter BEFORE its shuffle) and the per-doc length table; corpus
    totals derive from the length table as a broadcast 1-row relation
    (no driver-side .count() scalars), and the live scoring query reads
    only the artifacts (plan-asserted: zero Generate).  That is exactly
    a search engine's split: postings and doc-length stats are built
    once, query-time scoring joins broadcast-sized stats onto them."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tokf = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    # the "length table" artifact: checkpointed so the corpus explodes ONCE
    # (doclen feeds both per-doc normalization and the corpus token total)
    doclen = (
        tokf.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len")).localCheckpoint()
    )
    # corpus stats as a broadcast 1-row relation — no driver-side scalars
    # (a .count() here would be an extra job and a driver round-trip)
    stats = (
        doclen.agg(F.sum("len").cast("double").alias("n_tokens"))
        .crossJoin(
            load(spark, sf_dir, "documents")
            .agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
        )
        .select("n_docs", (F.col("n_tokens") / F.col("n_docs")).alias("avglen"))
    )
    tf = (
        tokf.filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df = tf.groupBy("word").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + _K1 * (
        1.0 - _B + F.lit(_B) * F.col("len") / F.col("avglen")
    )
    contrib = (
        tf.join(F.broadcast(df), "word")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id", (idf * (F.col("tf") * (_K1 + 1.0)) / norm).alias("c")
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum(F.col("c").cast("decimal(28,12)")).cast("double"), 6).alias(
            "score"
        )
    )
    w = Window.orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.select("doc_id", "score", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .orderBy("rn")
    )


@register(
    "ngram_topk",
    oracle="""
WITH ws AS (
  SELECT list_filter(string_split(text, ' '), w -> w <> '') AS ws
  FROM documents WHERE text IS NOT NULL
),
bigrams AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM ws WHERE len(ws) >= 2
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM bigrams
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 20
""",
)
def ngram_topk(spark, sf_dir):
    """Corpus-wide top-20 bigrams: per-document token array → adjacent
    pairs via an index-range transform (1-based element_at on both
    engines) → explode → count.  Integer counts are hash-stable; ties
    break on the bigram text.  The array pairing is narrow (no shuffle
    until the count), and the count shuffles only distinct bigrams after
    map-side combine — the vocabulary, not the corpus."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    ws = d.select(
        F.filter(F.split("text", " "), lambda w: w != "").alias("ws")
    ).filter(F.size("ws") >= 2)
    bigrams = ws.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )
