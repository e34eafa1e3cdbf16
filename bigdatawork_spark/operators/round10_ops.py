"""Round-10 curation additions: URL canonicalization + host-level dedup
(VERDICT r08 item 8 — "the one common curation stage absent from the
family").  REF:∅ (reference snapshot empty — SURVEY.md §0); these extend
§2-K per the LLM-pipeline mandate.

Crawl-scale corpora are keyed by URL, and the same page arrives under
many spellings — scheme/host case, default ports, ``www.`` prefixes,
tracking parameters (``utm_*``/``fbclid``/``gclid``/``ref``), unordered
query strings, trailing slashes, fragments.  ``dedup_url_normalize`` is
the canonicalizer (RFC 3986 §6 syntax-based normalization plus the
standard crawl-pipeline tracking-param strip); ``dedup_url_host``
applies it: exact-dup removal at normalized-URL granularity, reported
per host (the unit crawl curation budgets and rate-limits by).

The documents table carries no URL column, so both engines first build
the SAME deterministic messy URL from (doc_id, source) — generator and
normalizer are mirrored Spark/DuckDB expression for expression, so the
driver hash-compares real normalization work, not a constant.

Scale: normalization is a pure per-row column expression — map-only,
stays inside WholeStageCodegen, zero shuffles beyond the presentation
sort (asserted in tests/test_plans.py).  Host-level dedup shuffles
(host, url_norm) group keys + counts, never documents: two keyed
aggregations, both linear, both AQE-coalesced; at 100 TB the second agg
(per-host) is tiny by construction (#hosts << #urls).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register

# Deterministic messy-URL generator, mirrored in the oracle CTE below —
# exercises every normalization rule: scheme case, www + host case,
# default port, path trailing slash, tracking params, param order,
# fragments.
_RAW_URL_SPARK = """
concat(
  CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END,
  CASE WHEN doc_id % 3 = 0 THEN concat('WWW.', upper(source))
       ELSE source END,
  '.Example.COM',
  CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END,
  '/docs/', cast(doc_id % 12 as string),
  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
  CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
       ELSE '?b=2&a=1' END,
  CASE WHEN doc_id % 7 = 0 THEN concat('#s', cast(doc_id as string))
       ELSE '' END
)
"""

_RAW_URL_DUCK = """
(CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'http://' END ||
 CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || upper(source) ELSE source END ||
 '.Example.COM' ||
 CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END ||
 '/docs/' || CAST(doc_id % 12 AS VARCHAR) ||
 CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END ||
 CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
      ELSE '?b=2&a=1' END ||
 CASE WHEN doc_id % 7 = 0 THEN '#s' || CAST(doc_id AS VARCHAR) ELSE '' END)
"""

#: Tracking params every crawl pipeline strips (Google/Facebook click ids,
#: UTM campaign tags, generic ref) — anchored at the param name.
_TRACKING_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def normalize_urls(d):
    """Apply the canonicalizer to any DataFrame carrying (doc_id,
    url_raw); returns (doc_id, url_raw, host, url_norm).

    Generic syntax-based normalization (works on any http(s) URL, not
    just the generator's): strip userinfo (``user:pw@`` — a trivial
    spelling that otherwise bypasses host-keyed blocklists; ADVICE r10),
    lowercase scheme+host, strip ``www.``, strip default ports (80/http,
    443/https) but KEEP non-default ports (incl. after ``[IPv6]``
    literals), strip fragment, drop tracking params, sort surviving
    params, strip trailing path slashes (root stays ``/``).  Fuzzed
    against a pure-Python reference over arbitrary component
    combinations — including userinfo and IPv6 hosts — in
    tests/test_url_fuzz.py."""
    return d.selectExpr(
        "doc_id",
        "url_raw",
        # fragment off first; every later regexp sees the defragged URL
        "regexp_replace(url_raw, '#.*$', '') as u",
    ).selectExpr(
        "doc_id",
        "url_raw",
        "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) as scheme",
        # userinfo off before host/port extraction: 'http://x@host/' must
        # canonicalize to host, or a trivial spelling bypasses host-level
        # blocklists/dedup (ADVICE r10)
        "regexp_replace(regexp_extract(u, '://([^/?#]*)', 1), '^[^@]*@', '')"
        " as hostport",
        "regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) as path",
        "regexp_extract(u, '\\\\?([^#]*)', 1) as query",
    ).selectExpr(
        "doc_id",
        "url_raw",
        "scheme",
        "regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')), "
        "'^www\\\\.', '') as host",
        "regexp_extract(hostport, ':([0-9]+)$', 1) as portnum",
        "CASE WHEN path = '' THEN '/' "
        "     WHEN regexp_replace(path, '/+$', '') = '' THEN '/' "
        "     ELSE regexp_replace(path, '/+$', '') END as path_n",
        f"array_join(array_sort(filter(split(query, '&'), "
        f"p -> p != '' AND NOT p rlike '{_TRACKING_RE}')), '&') as kept",
    ).selectExpr(
        "doc_id",
        "url_raw",
        "host",
        "concat(scheme, '://', host, "
        "CASE WHEN portnum != '' AND NOT (scheme = 'http' AND portnum = '80') "
        "          AND NOT (scheme = 'https' AND portnum = '443') "
        "     THEN concat(':', portnum) ELSE '' END, "
        "path_n, "
        "CASE WHEN kept != '' THEN concat('?', kept) ELSE '' END) as url_norm",
    )


def _url_norm_df(spark, sf_dir):
    """doc_id, url_raw, url_norm, host over the documents-derived URLs —
    the deterministic generator feeding the registry keys."""
    return normalize_urls(
        load(spark, sf_dir, "documents").selectExpr(
            "doc_id", f"{_RAW_URL_SPARK} as url_raw"
        )
    )


_NORM_CTE_DUCK = f"""
raw AS (
  SELECT doc_id, {_RAW_URL_DUCK} AS url_raw FROM documents
),
defrag AS (
  SELECT doc_id, url_raw, regexp_replace(url_raw, '#.*$', '') AS u FROM raw
),
parts AS (
  SELECT doc_id, url_raw,
         lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         regexp_replace(regexp_extract(u, '://([^/?#]*)', 1),
                        '^[^@]*@', '') AS hostport,
         regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
           AS path,
         regexp_extract(u, '\\?([^#]*)', 1) AS query
  FROM defrag
),
cooked AS (
  SELECT doc_id, url_raw, scheme,
         regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')),
                        '^www\\.', '') AS host,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS portnum,
         CASE WHEN path = '' THEN '/'
              WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(path, '/+$', '') END AS path_n,
         array_to_string(list_sort(list_filter(string_split(query, '&'),
           p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))), '&')
           AS kept
  FROM parts
),
norm AS (
  SELECT doc_id, url_raw, host,
         scheme || '://' || host ||
         CASE WHEN portnum <> '' AND NOT (scheme = 'http' AND portnum = '80')
                   AND NOT (scheme = 'https' AND portnum = '443')
              THEN ':' || portnum ELSE '' END ||
         path_n ||
         CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS url_norm
  FROM cooked
)
"""


@register(
    "dedup_url_normalize",
    oracle=f"""
WITH {_NORM_CTE_DUCK}
SELECT doc_id, url_raw, host, url_norm FROM norm ORDER BY doc_id
""",
)
def dedup_url_normalize(spark, sf_dir):
    """URL canonicalization (RFC 3986 §6 syntax normalization + the
    crawl-pipeline tracking-param strip) — see ``_url_norm_df``.  Pure
    per-row column expressions: map-only, WholeStageCodegen, no
    shuffle."""
    return _url_norm_df(spark, sf_dir).select(
        "doc_id", "url_raw", "host", "url_norm"
    ).orderBy("doc_id")


@register(
    "dedup_url_host",
    oracle=f"""
WITH {_NORM_CTE_DUCK},
per_url AS (
  SELECT host, url_norm,
         CAST(COUNT(*) AS BIGINT) AS n_copies,
         MIN(doc_id) AS keep_doc
  FROM norm GROUP BY host, url_norm
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_unique_urls,
       CAST(SUM(n_copies) AS BIGINT) AS n_docs,
       CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_dup_docs_removed,
       MIN(keep_doc) AS first_kept_doc
FROM per_url GROUP BY host ORDER BY host
""",
)
def dedup_url_host(spark, sf_dir):
    """Host-level view of normalized-URL exact dedup: collapse each
    normalized URL to its min-doc_id representative, then report per
    host how many docs the URL dedup removed.  Two keyed aggregations —
    (host, url_norm) then host — shuffling group keys + counts only;
    #hosts << #urls, so the second agg is trivially small at any
    scale."""
    per_url = (
        _url_norm_df(spark, sf_dir)
        .groupBy("host", "url_norm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("doc_id").alias("keep_doc"),
        )
    )
    return (
        per_url.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_unique_urls"),
            F.sum("n_copies").cast("bigint").alias("n_docs"),
            (F.sum("n_copies") - F.count(F.lit(1)))
            .cast("bigint")
            .alias("n_dup_docs_removed"),
            F.min("keep_doc").alias("first_kept_doc"),
        )
        .orderBy("host")
    )


@register(
    "url_filter_blocklist",
    oracle=f"""
WITH {_NORM_CTE_DUCK}
SELECT doc_id, host, url_norm FROM norm
WHERE host NOT IN ('src3.example.com', 'src7.example.com',
                   'src12.example.com')
  AND NOT regexp_matches(url_norm, '/docs/7($|[/?])')
ORDER BY doc_id
""",
)
def url_filter_blocklist(spark, sf_dir):
    """Crawl blocklist gate (the UT1/robots-denylist stage every crawl
    pipeline runs before content filters): drop documents whose
    NORMALIZED host is on the domain blocklist, or whose URL matches a
    blocked-path rule.  Hosts match post-normalization — ``WWW.SRC3...``
    and ``src3...:80`` cannot dodge the list.

    Scale: the blocklist is small by definition (UT1 ~3M hosts, a few
    tens of MB) → broadcast LEFT ANTI join, map-side; the path rule is a
    per-row regexp.  Zero shuffles beyond the presentation sort.  The
    demo list names three live hosts + one path rule so the gate is
    non-vacuous at every SF."""
    bl = spark.createDataFrame(
        [("src3.example.com",), ("src7.example.com",), ("src12.example.com",)],
        "host string",
    )
    return (
        _url_norm_df(spark, sf_dir)
        .join(F.broadcast(bl), "host", "left_anti")
        .filter(~F.col("url_norm").rlike("/docs/7($|[/?])"))
        .select("doc_id", "host", "url_norm")
        .orderBy("doc_id")
    )


#: decontaminate_exact's deterministic 90/5/5 content-hash split
#: (training_ops.py) — same thresholds so the two decontamination keys
#: report over the identical split.
_SPLIT_CASE = (
    "CASE WHEN substring(md5(cast(doc_id as string)), 1, 4) < 'e666' "
    "THEN 'train' WHEN substring(md5(cast(doc_id as string)), 1, 4) "
    "< 'f333' THEN 'val' ELSE 'test' END"
)

_SPLIT_CASE_DUCK = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' "
    "THEN 'train' WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) "
    "< 'f333' THEN 'val' ELSE 'test' END"
)


@register(
    "decontaminate_ngram",
    oracle=f"""
WITH w AS (
  SELECT doc_id, source,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws,
         {_SPLIT_CASE_DUCK} AS split
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, split,
         ('0x' || substr(md5(unnest(list_transform(
             generate_series(1, len(ws) - 7),
             i -> array_to_string(ws[CAST(i AS INTEGER):CAST(i + 7 AS INTEGER)],
                                  ' ')))), 1, 15))::BIGINT AS gh
  FROM w WHERE len(ws) >= 8
),
bench AS (SELECT DISTINCT gh FROM g WHERE split IN ('val', 'test')),
hit AS (
  SELECT DISTINCT doc_id FROM g
  WHERE split = 'train' AND gh IN (SELECT gh FROM bench)
)
SELECT w.source,
       CAST(COUNT(*) AS BIGINT) AS n_train,
       CAST(SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN hit.doc_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clean
FROM w LEFT JOIN hit ON w.doc_id = hit.doc_id
WHERE w.split = 'train'
GROUP BY w.source ORDER BY w.source
""",
)
def decontaminate_ngram(spark, sf_dir):
    """N-gram-overlap benchmark decontamination (the GPT-3 appendix-C /
    PaLM method, at word-8-gram resolution for this corpus's short
    docs): a train document is contaminated if it shares ANY 8-word gram
    with any val/test document — catching partial/embedded benchmark
    leakage that ``decontaminate_exact``'s whole-document fingerprint
    misses.  Same deterministic 90/5/5 content-hash split as the exact
    key, so the two reports compose.

    Scale: compact doc rows repartition BEFORE the gram explode (the r08
    winnow lesson); grams shuffle as 60-bit md5-prefix integers (both
    engines draw identical values — repo hash-mirror pattern), never as
    strings; the bench gram set is distinct-folded val+test grams (5-10%
    of the corpus) and meets the train grams in ONE semi join; the final
    fold is a per-source count.  At 100 TB the gram table dominates —
    de-anchor to stride-4 grams on the TRAIN side only (bench side stays
    exhaustive; any shared gram still overlaps a stride anchor within 4
    positions) to cut the explode 4x."""
    return ngram_contamination(
        load(spark, sf_dir, "documents")
        .filter("text is not null")
        .repartition("doc_id")
    )


def ngram_contamination(docs, n: int = 8):
    """The column-level body of ``decontaminate_ngram``: ``docs`` needs
    (doc_id, source, text); ``n`` is the gram width.  Split assignment,
    gram explode, bench distinct-fold, one semi join, per-source fold —
    fuzzed against a pure-Python reference in tests/test_url_fuzz.py."""
    w = docs.selectExpr(
        "doc_id",
        "source",
        "filter(split(lower(text), ' '), x -> x != '') as ws",
        f"{_SPLIT_CASE} as split",
    )
    g = w.filter(F.size("ws") >= n).selectExpr(
        "doc_id",
        "split",
        f"explode(transform(sequence(1, size(ws) - {n - 1}), "
        f"i -> cast(conv(substring(md5(array_join(slice(ws, i, {n}), ' ')), "
        "1, 15), 16, 10) as bigint))) as gh",
    )
    bench = g.filter("split in ('val', 'test')").select("gh").distinct()
    hit = (
        g.filter("split = 'train'")
        .join(bench, "gh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        w.filter("split = 'train'")
        .join(hit.withColumn("__hit", F.lit(1)), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.sum(F.when(F.col("__hit").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clean"),
        )
        .orderBy("source")
    )


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
