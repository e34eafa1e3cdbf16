"""Round-8 corpus-curation additions: bigram-LM perplexity scoring,
cross-document segment (boilerplate) dedup, and winnowing fingerprints.
REF:∅ (reference snapshot empty — SURVEY.md §0); these extend §2-K per the
LLM-pipeline mandate, filling the three gaps left after round 7: the
trained LM (``ngram_lm_train``) had no SCORING consumer, dedup had no
sub-document (CCNet paragraph-style) granularity, and fingerprinting had
no locality-robust variant (``doc_fingerprint`` is whole-doc, simhash is
global-profile — winnowing survives insertions/reorders because each
fingerprint depends only on a w+k-1-char neighborhood).

Scale notes: all three are explode → keyed-agg → join shapes whose
shuffles carry grams/segments + counts, never documents; each docstring
argues its 100 TB layout.  Hashes are the repo's oracle-mirrored md5-hex
pattern (Spark ``conv(substring(md5(x),1,n),16,10)`` ≡ DuckDB
``('0x' || substr(md5(x),1,n))::BIGINT``) so both engines draw identical
integers — no engine-specific hash in any compared column.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "lm_perplexity_score",
    oracle="""
WITH w AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents WHERE text IS NOT NULL
),
v AS (SELECT COUNT(DISTINCT word) AS vocab
      FROM (SELECT unnest(ws) AS word FROM w)),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> struct_pack(w1 := ws[CAST(i AS INTEGER)],
                                 w2 := ws[CAST(i + 1 AS INTEGER)]))) AS b
  FROM w WHERE len(ws) >= 2
),
p AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
c AS (SELECT w1, w2, COUNT(*) AS cnt FROM p GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(cnt) AS n_ctx FROM c GROUP BY w1),
model AS (
  SELECT c.w1, c.w2, ln((cnt + 0.5) / (n_ctx + 0.5 * vocab)) AS lp
  FROM c JOIN ctx USING (w1) CROSS JOIN v
)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-AVG(lp), 6) AS avg_nll,
       ROUND(exp(ROUND(-AVG(lp), 6)), 4) AS ppl
FROM p JOIN model USING (w1, w2)
GROUP BY p.doc_id
ORDER BY p.doc_id
""",
)
def lm_perplexity_score(spark, sf_dir):
    """CCNet-style perplexity quality signal: score every document under a
    bigram LM with add-k smoothing (k=0.5) TRAINED ON THE CORPUS ITSELF —
    the scoring consumer of ``ngram_lm_train``'s count table.  p(w2|w1) =
    (c(w1,w2)+0.5)/(c(w1·)+0.5·V); per-doc avg negative log-likelihood and
    its exp (perplexity).  In a production pipeline the model side is a
    held-out reference corpus (e.g. Wikipedia) and high-ppl docs are cut;
    the in-corpus formulation keeps the key self-contained and
    hash-verifiable.  ppl derives from the ROUNDED avg_nll so the float
    comparison happens once, at 6 decimals.

    Scale: the corpus explodes ONCE into adjacent pairs (zip_with over two
    slices, no index join); the model is two keyed aggregations over
    (w1,w2) then (w1) — shuffles carry grams+counts.  The scoring join is
    per-bigram on (w1,w2); the model table is bounded by observed-bigram
    cardinality (≪ corpus at 100 TB, broadcastable after frequency
    pruning).  V is a 1-row aggregate, joined via broadcast."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return bigram_nll_scores(d).orderBy("doc_id")


def bigram_nll_scores(d, id_col: str = "doc_id", col: str = "text"):
    """DataFrame-level bigram-LM scorer (the ``lm_perplexity_score`` body,
    reusable from the pipeline API's ``perplexity_gate`` stage): returns
    (id_col, n_bigrams, avg_nll, ppl), unordered — docs with < 2 words
    carry no bigrams and are absent (gate stages must LEFT-join and keep
    them)."""
    words = d.selectExpr(
        f"{id_col}", f"filter(split(lower({col}), ' '), x -> x != '') as ws"
    )
    pairs = (
        words.where("size(ws) >= 2")
        .selectExpr(
            f"{id_col}",
            "explode(zip_with(slice(ws, 1, size(ws) - 1),"
            " slice(ws, 2, size(ws) - 1), (a, b) -> struct(a as w1, b as w2)))"
            " as p",
        )
        .select(id_col, "p.w1", "p.w2")
    )
    vocab = words.selectExpr("explode(ws) as word").agg(
        F.countDistinct("word").alias("vocab")
    )
    c = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = c.groupBy("w1").agg(F.sum("cnt").alias("n_ctx"))
    model = (
        c.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .selectExpr("w1", "w2", "ln((cnt + 0.5) / (n_ctx + 0.5 * vocab)) as lp")
    )
    return (
        pairs.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(-F.avg("lp"), 6).alias("avg_nll"),
        )
        .selectExpr(
            f"{id_col}", "n_bigrams", "avg_nll", "round(exp(avg_nll), 4) as ppl"
        )
    )


@register(
    "dedup_segments_crossdoc",
    oracle="""
WITH w AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
  FROM documents WHERE text IS NOT NULL
),
seg AS (
  SELECT doc_id, i AS pos,
         array_to_string(list_slice(ws, (i - 1) * 3 + 1, i * 3), ' ') AS seg
  FROM w, unnest(generate_series(1, CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS t(i)
  WHERE len(ws) >= 1
),
bp AS (SELECT seg FROM seg GROUP BY seg HAVING COUNT(DISTINCT doc_id) >= 3)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_seg,
       CAST(COUNT(*) FILTER (WHERE bp.seg IS NULL) AS BIGINT) AS n_kept,
       ROUND(COUNT(*) FILTER (WHERE bp.seg IS NULL) * 1.0 / COUNT(*), 4)
         AS keep_ratio,
       COALESCE(array_to_string(list(s.seg ORDER BY s.pos)
                FILTER (WHERE bp.seg IS NULL), ' '), '') AS cleaned_text
FROM seg s LEFT JOIN bp ON s.seg = bp.seg
GROUP BY s.doc_id
ORDER BY s.doc_id
""",
)
def dedup_segments_crossdoc(spark, sf_dir):
    """Sub-document cross-corpus dedup (the CCNet/FineWeb paragraph-removal
    shape): segment each doc into consecutive 3-word chunks (the corpus has
    no newlines, so fixed word-chunks stand in for paragraphs — same
    machinery, different splitter), drop every segment that occurs in >= 3
    DISTINCT documents (corpus boilerplate), and reassemble the survivors
    in original order.  Emits per-doc audit counts + the cleaned text;
    docs whose every segment is boilerplate survive as empty strings
    (2 such docs at sf0.01), which a downstream length filter then cuts.

    Scale: one explode into (doc, pos, segment); the boilerplate set is a
    segment-keyed aggregation whose shuffle carries segments+doc-counts
    (never documents), and BY DEFINITION it is small (only segments
    repeated across >= 3 docs), so the marking join broadcasts it — the
    documents themselves are never re-shuffled.  Reassembly is a per-doc
    collect_list over positions (one keyed shuffle of kept segments).  At
    100 TB hash the segments (sha2-64) before the df-aggregation so the
    shuffle carries 8-byte keys, exactly as ``dedup_exact`` does."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    seg = (
        d.selectExpr(
            "doc_id", "filter(split(lower(text), ' '), x -> x != '') as ws"
        )
        .where("size(ws) >= 1")
        .selectExpr(
            "doc_id",
            "explode(sequence(1, cast(ceil(size(ws) / 3.0) as int))) as pos",
            "ws",
        )
        .selectExpr(
            "doc_id",
            "pos",
            "array_join(slice(ws, (pos - 1) * 3 + 1, 3), ' ') as seg",
        )
    )
    bp = (
        seg.groupBy("seg")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where("df >= 3")
        .select("seg")
        .withColumn("is_bp", F.lit(1))
    )
    marked = seg.join(F.broadcast(bp), "seg", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_seg"),
            F.sum(F.when(F.col("is_bp").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.expr(
                "array_join(transform(filter(array_sort(collect_list("
                "  struct(pos, case when is_bp is null then seg end as seg))),"
                "  x -> x.seg is not null), x -> x.seg), ' ')"
            ).alias("cleaned_text"),
        )
        .selectExpr(
            "doc_id",
            "n_seg",
            "n_kept",
            "round(cast(n_kept as double) / n_seg, 4) as keep_ratio",
            "cleaned_text",
        )
        .orderBy("doc_id")
    )


@register(
    "winnow_fingerprint",
    oracle="""
WITH g AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(substr(lower(text), CAST(i AS INTEGER), 5)),
                         1, 8))::BIGINT AS h,
         length(text) - 4 AS n_grams
  FROM documents, unnest(generate_series(1, length(text) - 4)) AS t(i)
  WHERE text IS NOT NULL AND length(text) >= 5
),
x AS (
  SELECT doc_id, pos, h, n_grams,
         lag(h, 1) OVER win AS l1, lag(h, 2) OVER win AS l2,
         lag(h, 3) OVER win AS l3,
         lead(h, 1) OVER win AS r1, lead(h, 2) OVER win AS r2,
         lead(h, 3) OVER win AS r3
  FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
r AS (
  SELECT doc_id, pos, h, n_grams,
         CASE WHEN l1 IS NOT NULL AND l1 >= h THEN
           CASE WHEN l2 IS NOT NULL AND l2 >= h THEN
             CASE WHEN l3 IS NOT NULL AND l3 >= h THEN 3 ELSE 2 END
           ELSE 1 END ELSE 0 END AS rl,
         CASE WHEN r1 IS NOT NULL AND r1 > h THEN
           CASE WHEN r2 IS NOT NULL AND r2 > h THEN
             CASE WHEN r3 IS NOT NULL AND r3 > h THEN 3 ELSE 2 END
           ELSE 1 END ELSE 0 END AS rr
  FROM x
)
SELECT doc_id, pos AS fp_pos, h AS fp_hash
FROM r
WHERE (n_grams >= 4 AND
       GREATEST(pos - rl, pos - 3, 1) <= LEAST(pos, n_grams - 3, pos + rr - 3))
   OR (n_grams < 4 AND pos - rl <= 1 AND pos + rr >= n_grams)
ORDER BY doc_id, fp_pos
""",
)
def winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    MOSS algorithm): 5-char-gram rolling hashes, and from every window of
    w=4 consecutive hashes select the minimum, rightmost on ties.  Unlike
    ``doc_fingerprint`` (whole-doc) or simhash (global profile), each
    selected fingerprint depends only on a k+w-1-char neighborhood, so
    local edits perturb O(1) fingerprints — the standard primitive for
    copy-span detection across a corpus.  Guaranteed density is
    2/(w+1) = 0.4 of gram positions (measured 0.4035 at sf0.01).

    The per-window argmin is NOT computed per window (that would be a
    w-way self-join): position i is selected iff it is the rightmost
    minimum of SOME window, which reduces to reach arithmetic over at
    most w-1 = 3 neighbors each side — rl = consecutive predecessors with
    h >= h_i, rr = consecutive successors with h > h_i (strict, because a
    tie selects the rightmost), then a w-window fits inside
    [i-rl, i+rr] ∩ [1, n].  Verified against a brute-force per-window
    reference on 50 docs (exact match; see tests).  Docs shorter than one
    full window select their global rightmost-min.

    Scale: explode to (doc, pos, hash) — 8-byte rows; ONE shuffle
    (partition by doc_id, order by pos) computes all six lags/leads and
    the selection predicate in a single Window pass, then a narrow filter.
    No self-joins, no per-window expansion; fingerprint output is ~0.4×
    the gram count and downstream near-dup joins group by fp_hash exactly
    like ``dedup_exact``."""
    return _winnow_selected(spark, sf_dir).selectExpr(
        "doc_id", "pos as fp_pos", "h as fp_hash"
    ).orderBy("doc_id", "fp_pos")


def _winnow_selected(spark, sf_dir):
    """Unordered winnowing selection (doc_id, pos, h) — shared by
    ``winnow_fingerprint`` (which adds the driver-facing global order) and
    ``dedup_winnow_pairs`` (which must NOT inherit that 0.4×-gram-count
    global sort: composing the ordered op measured 54.6 s at sf1.0 vs
    ~30 s without it)."""
    # The documents table is a single ~30 MB parquet file even at sf1.0
    # (under maxPartitionBytes -> ONE scan task), but this op fans each doc
    # into ~550 md5-hashed gram rows.  Repartitioning the 50k compact doc
    # rows by doc_id BEFORE the explode spreads the 27M-hash work across
    # all cores AND pre-satisfies the Window's hashpartitioning(doc_id)
    # requirement, so no second exchange of the exploded rows follows
    # (sf1.0: 51 s -> ~17 s for the pairs consumer).
    d = (
        load(spark, sf_dir, "documents")
        .filter("text is not null and length(text) >= 5")
        .repartition("doc_id")
    )
    g = d.selectExpr(
        "doc_id",
        "explode(sequence(1, length(text) - 4)) as pos",
        "lower(text) as lt",
        "length(text) - 4 as n_grams",
    ).selectExpr(
        "doc_id",
        "pos",
        "cast(conv(substring(md5(substring(lt, pos, 5)), 1, 8), 16, 10)"
        " as bigint) as h",
        "n_grams",
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    x = g.select(
        "doc_id",
        "pos",
        "h",
        "n_grams",
        F.lag("h", 1).over(win).alias("l1"),
        F.lag("h", 2).over(win).alias("l2"),
        F.lag("h", 3).over(win).alias("l3"),
        F.lead("h", 1).over(win).alias("r1"),
        F.lead("h", 2).over(win).alias("r2"),
        F.lead("h", 3).over(win).alias("r3"),
    )
    r = x.selectExpr(
        "doc_id",
        "pos",
        "h",
        "n_grams",
        "case when l1 is not null and l1 >= h then"
        " case when l2 is not null and l2 >= h then"
        " case when l3 is not null and l3 >= h then 3 else 2 end"
        " else 1 end else 0 end as rl",
        "case when r1 is not null and r1 > h then"
        " case when r2 is not null and r2 > h then"
        " case when r3 is not null and r3 > h then 3 else 2 end"
        " else 1 end else 0 end as rr",
    )
    return r.where(
        "(n_grams >= 4 and"
        " greatest(pos - rl, pos - 3, 1)"
        " <= least(pos, n_grams - 3, pos + rr - 3))"
        " or (n_grams < 4 and pos - rl <= 1 and pos + rr >= n_grams)"
    ).select("doc_id", "pos", "h")


@register(
    "dedup_repeated_spans",
    oracle="""
WITH g AS (
  SELECT doc_id, i AS pos,
         md5(substr(lower(text), CAST(i AS INTEGER), 20)) AS h
  FROM documents, unnest(generate_series(1, length(text) - 19)) AS t(i)
  WHERE text IS NOT NULL AND length(text) >= 20
),
rep AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
marked AS (
  SELECT g.doc_id, g.pos,
         g.pos - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos)
           AS grp
  FROM g JOIN rep USING (h)
),
spans AS (
  SELECT doc_id,
         CAST(MIN(pos) AS BIGINT) AS span_start,
         CAST(MAX(pos) + 19 AS BIGINT) AS span_end,
         CAST(MAX(pos) + 19 - MIN(pos) + 1 AS BIGINT) AS span_len
  FROM marked GROUP BY doc_id, grp
)
SELECT doc_id, span_start, span_end, span_len
FROM spans WHERE span_len >= 50
ORDER BY doc_id, span_start
""",
)
def dedup_repeated_spans(spark, sf_dir):
    """Exact repeated-substring spans (the Lee et al., ACL'22
    "Deduplicating Training Data Makes Language Models Better" method, at
    k-gram resolution): mark every position whose 20-char gram occurs >= 2
    times ANYWHERE in the corpus (within- or cross-document), merge
    consecutive marked positions into maximal islands (the pos -
    row_number gaps-and-islands fold), and emit spans covering >= 50
    chars — the cut list for span-level removal.  The reference work
    builds a corpus suffix array; the k-gram anchor is the standard
    distributed approximation (finds every repeat >= k chars, start/end
    resolved to k-gram granularity) and needs only relational shapes.

    Scale: the gram explode repartitions the compact doc rows first (the
    winnow lesson — single small file, fan-out projection); the repeat
    table is a count >= 2 aggregation whose shuffle carries 32-byte
    hashes; the mark join is hash-keyed (AQE broadcast when the repeat
    set fits, skew-handled SMJ otherwise); islands are one window pass
    per doc.  At 100 TB swap md5 for xxhash64 JVM-side (the oracle
    mirror is what pins md5 here) and de-anchor stride-s grams (s ~ k/2)
    to cut the explode volume 10× at k-char resolution loss."""
    d = (
        load(spark, sf_dir, "documents")
        .filter("text is not null and length(text) >= 20")
        .repartition("doc_id")
    )
    # cache: g feeds both the repeat aggregation and the mark join —
    # uncached, the 27M-row explode+md5 runs twice (sf1.0: 28.6 s -> 21.4 s)
    g = (
        d.selectExpr(
            "doc_id",
            "explode(sequence(1, length(text) - 19)) as pos",
            "lower(text) as lt",
        )
        .selectExpr("doc_id", "pos", "md5(substring(lt, pos, 20)) as h")
        .cache()
    )
    rep = g.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).where("cnt >= 2")
    marked = g.join(rep.select("h"), "h").selectExpr(
        "doc_id",
        "pos",
        "pos - row_number() over (partition by doc_id order by pos) as grp",
    )
    return (
        marked.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + 19).cast("bigint").alias("span_end"),
            (F.max("pos") + 19 - F.min("pos") + 1)
            .cast("bigint")
            .alias("span_len"),
        )
        .where("span_len >= 50")
        .select("doc_id", "span_start", "span_end", "span_len")
        .orderBy("doc_id", "span_start")
    )


@register(
    "dedup_spans_removal",
    oracle="""
WITH g AS (
  SELECT doc_id, i AS pos,
         md5(substr(lower(text), CAST(i AS INTEGER), 20)) AS h
  FROM documents, unnest(generate_series(1, length(text) - 19)) AS t(i)
  WHERE text IS NOT NULL AND length(text) >= 20
),
rep AS (SELECT h FROM g GROUP BY h HAVING COUNT(*) >= 2),
marked AS (
  SELECT g.doc_id, g.pos,
         g.pos - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos)
           AS grp
  FROM g JOIN rep USING (h)
),
spans AS (
  SELECT doc_id, MIN(pos) AS s, MAX(pos) + 19 AS e
  FROM marked GROUP BY doc_id, grp
  HAVING MAX(pos) + 19 - MIN(pos) + 1 >= 50
),
bounds AS (
  SELECT doc_id, s, e,
         COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS prev_e,
         row_number() OVER (PARTITION BY doc_id ORDER BY s) AS rn
  FROM spans
),
pieces AS (
  SELECT b.doc_id, b.rn,
         substr(lower(d.text), CAST(b.prev_e + 1 AS INTEGER),
                CAST(GREATEST(b.s - b.prev_e - 1, 0) AS INTEGER)) AS piece
  FROM bounds b JOIN documents d USING (doc_id)
  UNION ALL
  SELECT t.doc_id, t.rn,
         substr(lower(d.text), CAST(t.last_e + 1 AS INTEGER)) AS piece
  FROM (SELECT doc_id, MAX(e) AS last_e, MAX(rn) + 1 AS rn
        FROM bounds GROUP BY doc_id) t
  JOIN documents d USING (doc_id)
),
cleaned AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY rn) AS ctext,
         CAST(COUNT(*) - 1 AS BIGINT) AS n_cut
  FROM pieces GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(c.n_cut, 0) AS n_cut_spans,
       COALESCE(c.ctext, lower(d.text)) AS cleaned_text,
       CAST(length(COALESCE(c.ctext, lower(d.text))) AS BIGINT)
         AS cleaned_len
FROM documents d LEFT JOIN cleaned c USING (doc_id)
WHERE d.text IS NOT NULL
ORDER BY d.doc_id
""",
)
def dedup_spans_removal(spark, sf_dir):
    """The REMOVAL stage of the Lee et al. exact-substring pipeline: apply
    ``dedup_repeated_spans``'s cut list to the corpus — excise every
    >=50-char repeated span from every document (the conservative
    all-copies policy; keep-first needs a global span ranking, a one-line
    change on the spans relation) and emit the cleaned text with audit
    counts.  Untouched documents pass through; fully-repeated documents
    come out empty (length filter downstream).  Gap extraction guards
    GREATEST(len, 0) in BOTH engines: adjacent islands can overlap in
    CHARS (k-1 smear) while being distinct at gram-position level.

    Scale: the span list re-derives (same shapes as dedup_repeated_spans
    — hashed repeat agg, hash-keyed mark join, one window per doc); the
    cut application is a per-doc window over the doc's OWN spans (tiny
    partitions) + one ordered collect per doc; the corpus text moves
    through exactly one join keyed on doc_id.  No driver-side state."""
    d = load(spark, sf_dir, "documents").filter("text is not null")
    return excise_repeated_spans(d).orderBy("doc_id")


def excise_repeated_spans(df, id_col: str = "doc_id", col: str = "text"):
    """DataFrame-level repeated-span excision (the ``dedup_spans_removal``
    body, reusable from the pipeline API): returns
    (id_col, n_cut_spans, cleaned_text, cleaned_len), unordered, one row
    per non-NULL-text input row."""
    d = df.select(id_col, F.lower(col).alias("lt")).cache()
    g = (
        d.filter("length(lt) >= 20")
        .repartition(id_col)
        .selectExpr(id_col, "explode(sequence(1, length(lt) - 19)) as pos", "lt")
        .selectExpr(id_col, "pos", "md5(substring(lt, pos, 20)) as h")
        .cache()
    )
    rep = g.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).where("cnt >= 2")
    spans = (
        g.join(rep.select("h"), "h")
        .selectExpr(
            id_col,
            "pos",
            f"pos - row_number() over (partition by {id_col} order by pos)"
            " as grp",
        )
        .groupBy(id_col, "grp")
        .agg(F.min("pos").alias("s"), (F.max("pos") + 19).alias("e"))
        .where("e - s + 1 >= 50")
    )
    w = Window.partitionBy(id_col).orderBy("s")
    bounds = spans.select(
        id_col,
        "s",
        "e",
        F.coalesce(F.lag("e").over(w), F.lit(0)).alias("prev_e"),
        F.row_number().over(w).alias("rn"),
    )
    gap_pieces = bounds.join(d, id_col).selectExpr(
        id_col,
        "rn",
        "substring(lt, cast(prev_e + 1 as int),"
        " cast(greatest(s - prev_e - 1, 0) as int)) as piece",
    )
    tail_pieces = (
        bounds.groupBy(id_col)
        .agg(F.max("e").alias("last_e"), (F.max("rn") + 1).alias("rn"))
        .join(d, id_col)
        .selectExpr(
            id_col, "rn", "substring(lt, cast(last_e + 1 as int)) as piece"
        )
    )
    cleaned = (
        gap_pieces.unionByName(tail_pieces)
        .groupBy(id_col)
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(rn, piece))), x -> x.piece), '')"
            ).alias("ctext"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_cut"),
        )
    )
    return d.join(cleaned, id_col, "left").selectExpr(
        id_col,
        "coalesce(n_cut, 0L) as n_cut_spans",
        "coalesce(ctext, lt) as cleaned_text",
        "cast(length(coalesce(ctext, lt)) as bigint) as cleaned_len",
    )


@register(
    "topk_heavy_hitters",
    oracle="""
WITH w AS (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
    AS word
  FROM documents WHERE text IS NOT NULL
),
c AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word)
SELECT word, CAST(cnt AS BIGINT) AS cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, word) AS INTEGER) AS rank
FROM c
QUALIFY rank <= 20
ORDER BY rank
""",
)
def topk_heavy_hitters(spark, sf_dir):
    """Exact top-20 words via the two-pass heavy-hitters pattern: pass 1
    runs a Misra-Gries sketch (capacity m=64) PER PARTITION and emits only
    each partition's <= m candidate words — zero shuffle of token rows;
    pass 2 exactly counts ONLY the candidate words (broadcast semi join
    cuts the tail before the one real shuffle) and takes the top-20.

    The result is provably EXACT, which is why this key is hash-verified
    against a plain full wordcount oracle: any word with global frequency
    > n_tokens/m must, by pigeonhole, exceed its partition's n_p/m in at
    least one partition, so it survives that partition's MG sketch and
    reaches the exact pass.  The guarantee needs freq(k-th item) > n/m —
    here trivially (31-word near-uniform vocab, n/m ~ 424 << ~870); on an
    open vocabulary size m ~ k/phi for the target frequency phi.

    Scale: this is THE shape for top-k over 100 TB — pass 1 is map-only
    (the sketch shuffles m rows/partition, not n tokens); pass 2 shuffles
    only candidate-word counts.  Compare `wordcount`, which shuffles the
    full vocabulary; here the full vocabulary never moves.  The MG fold
    is per-batch pandas value_counts + a bounded dict (m entries), Arrow
    batch transfer — no per-row Python."""
    words = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition("doc_id")
        .selectExpr(
            "explode(filter(split(lower(text), ' '), x -> x != '')) as word"
        )
    )

    def mg_candidates(batches):
        import pandas as pd

        m, sketch = 64, {}
        for p in batches:
            for word, c in p["word"].value_counts().items():
                if word in sketch:
                    sketch[word] += int(c)
                elif len(sketch) < m:
                    sketch[word] = int(c)
                else:
                    # decrement-all by the min spendable amount, batched:
                    # classic MG decrements 1 per excess item; folding a
                    # pre-counted batch, decrement by min(c, min(sketch))
                    # repeatedly — equivalent guarantee, fewer passes
                    while c > 0:
                        dec = min(c, min(sketch.values()))
                        c -= dec
                        for k in list(sketch):
                            sketch[k] -= dec
                            if sketch[k] <= 0:
                                del sketch[k]
                        if len(sketch) < m and c > 0:
                            sketch[word] = int(c)
                            break
        yield pd.DataFrame({"word": list(sketch.keys())})

    cands = (
        words.mapInPandas(mg_candidates, "word string").distinct()
    )
    exact = (
        words.join(F.broadcast(cands), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    return (
        exact.selectExpr(
            "word",
            "cnt",
            "cast(row_number() over (order by cnt desc, word) as int) as rank",
        )
        .where("rank <= 20")
        .orderBy("rank")
    )


_WINNOW_FP_CTE = """
WITH g AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(substr(lower(text), CAST(i AS INTEGER), 5)),
                         1, 8))::BIGINT AS h,
         length(text) - 4 AS n_grams
  FROM documents, unnest(generate_series(1, length(text) - 4)) AS t(i)
  WHERE text IS NOT NULL AND length(text) >= 5
),
x AS (
  SELECT doc_id, pos, h, n_grams,
         lag(h, 1) OVER win AS l1, lag(h, 2) OVER win AS l2,
         lag(h, 3) OVER win AS l3,
         lead(h, 1) OVER win AS r1, lead(h, 2) OVER win AS r2,
         lead(h, 3) OVER win AS r3
  FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
),
r AS (
  SELECT doc_id, pos, h, n_grams,
         CASE WHEN l1 IS NOT NULL AND l1 >= h THEN
           CASE WHEN l2 IS NOT NULL AND l2 >= h THEN
             CASE WHEN l3 IS NOT NULL AND l3 >= h THEN 3 ELSE 2 END
           ELSE 1 END ELSE 0 END AS rl,
         CASE WHEN r1 IS NOT NULL AND r1 > h THEN
           CASE WHEN r2 IS NOT NULL AND r2 > h THEN
             CASE WHEN r3 IS NOT NULL AND r3 > h THEN 3 ELSE 2 END
           ELSE 1 END ELSE 0 END AS rr
  FROM x
),
fp AS (
  SELECT DISTINCT doc_id, h FROM r
  WHERE (n_grams >= 4 AND
         GREATEST(pos - rl, pos - 3, 1)
           <= LEAST(pos, n_grams - 3, pos + rr - 3))
     OR (n_grams < 4 AND pos - rl <= 1 AND pos + rr >= n_grams)
)
"""


@register(
    "dedup_winnow_pairs",
    oracle=_WINNOW_FP_CTE
    + """,
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM fp),
hdf AS (SELECT h, COUNT(*) AS df FROM fp GROUP BY h),
rare AS (
  SELECT h FROM hdf CROSS JOIN nd
  WHERE df >= 2
    AND df <= LEAST(GREATEST(2, CAST(0.04 * n_docs AS BIGINT)), 64)
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM fp a JOIN rare USING (h) JOIN fp b USING (h)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 3
ORDER BY doc_a, doc_b
""",
)
def dedup_winnow_pairs(spark, sf_dir):
    """Copy-span candidate pairs from winnowing fingerprints — the
    downstream consumer of ``winnow_fingerprint`` and the MOSS pipeline's
    second stage: docs sharing >= 3 RARE fingerprints are candidate
    near-dups for span-level verification.  "Rare" = document frequency
    in [2, min(max(2, 4% of docs), 64)]: the RELATIVE 4% is the
    stop-fingerprint cut (hashes half the corpus shares identify nothing,
    like stopwords) keeping semantics SF-stable, and the ABSOLUTE 64 is
    the block cap (the dedup_ngram_jaccard discipline) bounding every
    bucket's pair fan-out at 64²/2 regardless of corpus pathology — on
    the 10×-replica sf1.0 corpus the uncapped form ran 138 s (every
    bucket holds all replicas); capped it is budget-safe.

    Scale: the pair join groups by fp_hash with per-bucket size bounded
    by the caps, the same blocked-join discipline as
    ``dedup_near_exactjacc``/``dedup_ngram_jaccard``; fp rows are 16
    bytes (doc_id, hash).  For graceful truncation instead of exclusion
    above the cap, swap in the Bernoulli per-block draw + n_trunc audit
    column demonstrated in dedup_ngram_jaccard; n_docs is a 1-row
    broadcast fold.

    Known corpus limit: the synthetic generator's ~30-word vocabulary
    yields only ~1000 distinct 5-gram hashes corpus-wide, so on the
    10×-replica sf1.0 corpus almost every hash exceeds the cap and the
    capped op returns 0 pairs (the dedup_containment replica-df pathology
    family) — real text has an open gram space and does not saturate."""
    # cache: fp feeds THREE subplans (df-count, join side a, join side b) —
    # uncached, the 27M-gram winnow selection recomputes per use
    # (58 s -> ~30 s at sf1.0); rows are 16 bytes, the cache is tiny.
    fp = (
        _winnow_selected(spark, sf_dir).select("doc_id", "h").distinct().cache()
    )
    nd = fp.agg(F.countDistinct("doc_id").alias("n_docs"))
    rare = (
        fp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(nd))
        .where(
            "df >= 2 and"
            " df <= least(greatest(2, cast(0.04 * n_docs as bigint)), 64)"
        )
        .select("h")
    )
    a = fp.join(rare, "h")
    b = fp.withColumnRenamed("doc_id", "doc_b")
    return (
        a.join(b, "h")
        .where("doc_id < doc_b")
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where("n_shared >= 3")
        .orderBy("doc_a", "doc_b")
    )
