"""Adversarial edge-corpus differential: run the text-family keys AND
their DuckDB oracles over a corpus of degenerate documents — empty
text, whitespace-only, single word, all-one-word, NULL text, embedded
tab/newline, single repeated character, non-ASCII, digits/punctuation,
exact duplicates, and a word-shuffled duplicate — and require the same
engine agreement the driver checks at sf0.01.

The sf0.01 corpus contains none of these shapes, so the per-round
driver gate can never exercise them; this is where engine-edge
divergence hides (r12's z-score NaN-ordering bug, and this file's
first catch: DuckDB's array_to_string([]) returning NULL lumped
empty-text docs with NULL-text docs in doc_fingerprint's oracle)."""

from __future__ import annotations

import pandas as pd
import pytest

from bigdatawork_spark.registry import ORACLES, QUERIES

from .compare import assert_frames_match

EDGE_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog", "en", "src0"),
    (1, "", "en", "src0"),                     # empty text
    (2, "   ", "en", "src1"),                  # whitespace-only
    (3, "word", "en", "src1"),                 # single word
    (4, "dup dup dup dup dup dup", "en", "src2"),  # all-one-word
    (5, None, "en", "src2"),                   # NULL text
    (6, "a\tb\nc mixed whitespace", "en", "src3"),
    (7, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "en", "src3"),
    (8, "café naïve 中文 слова", "zz", "src4"),  # non-ASCII
    (9, "123 456 !!! ??? ...", "en", "src4"),
    (10, "the quick brown fox jumps over the lazy dog", "en", "src5"),
    (11, "dog lazy the over jumps fox brown quick the", "en", "src5"),
    (12, "one two three four five six seven eight nine ten", "en", "src6"),
    # doc_ids 44 and 49 hash into decontaminate_exact's held-out split
    # (md5 prefix ≥ 'e666'): an EMPTY benchmark doc makes the empty
    # train docs contaminated (the branch whose oracle lumping the
    # second review caught), and a duplicate-content benchmark doc
    # contaminates the train copies
    (44, "", "en", "src7"),
    (49, "the quick brown fox jumps over the lazy dog", "en", "src7"),
]

# documents-only keys whose builders and oracles must agree on the edge
# corpus exactly as they do on sf0.01
EDGE_KEYS = [
    "text_langid",
    "text_quality_score",
    "token_count",
    "repetition_ngram_ratio",
    "doc_fingerprint",
    "dedup_simhash",
    "dedup_exact",
    "text_stats",
    "text_entropy_filter",
    "char_ngram_profile",
    "wordcount",
    "text_unigram_logprob",
    "lm_perplexity_score",
    "bm25_rank",
    "ngram_topk",
    "contamination_ngram",
    "chunk_documents",
    "text_normalize",
    "html_strip_tags",
    "quality_filter_gopher",
    "decontaminate_exact",
    "inverted_index",
    "ngram_pmi",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("edge_corpus")
    pd.DataFrame(
        [
            (i, t, l, s, len(t) if t is not None else 0)
            for i, t, l, s in EDGE_ROWS
        ],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("key", EDGE_KEYS)
def test_edge_corpus_engines_agree(key, spark, edge_dir, edge_duck):
    spark_pd = QUERIES[key](spark, edge_dir).toPandas()
    oracle_pd = edge_duck.execute(ORACLES[key]).df()
    assert_frames_match(spark_pd, oracle_pd, f"edge:{key}")


def test_edge_corpus_fingerprint_semantics(spark, edge_dir):
    """The catch this file exists for, pinned directly: empty-word-set
    docs share md5('') and NULL text stays NULL — never lumped."""
    rows = {r["doc_id"]: r for r in QUERIES["doc_fingerprint"](spark, edge_dir).collect()}
    md5_empty = "d41d8cd98f00b204e9800998ecf8427e"
    assert rows[1]["fingerprint"] == md5_empty
    assert rows[2]["fingerprint"] == md5_empty
    assert rows[1]["n_same"] == 3  # docs 1, 2, 44 — the empty-set group
    assert rows[5]["fingerprint"] is None
    assert rows[5]["n_same"] == 1
    # the shuffled duplicate collapses with its source; exact hashing
    # (dedup_exact) would keep them apart — the reason this key exists
    assert rows[11]["fingerprint"] == rows[0]["fingerprint"]


def test_edge_corpus_decontaminate_flags_empty_and_duplicate(spark, edge_dir):
    """The second review's confirmed divergence, now pinned end-to-end:
    the empty benchmark doc (44) contaminates the empty train docs
    (md5('') identity), the duplicate-content benchmark doc (49)
    contaminates the train copies, and NULL-text train docs stay clean
    (a NULL fingerprint matches nothing on either engine)."""
    rows = QUERIES["decontaminate_exact"](spark, edge_dir).collect()
    by_src = {r["source"]: r for r in rows}
    # src0: doc 0 (dup of benchmark 49) contaminated, doc 1 (empty ≡ 44) too
    assert by_src["src0"]["n_contaminated"] == 2, by_src["src0"]
    # src1: doc 2 (whitespace-only ≡ empty set) contaminated, doc 3 clean
    assert by_src["src1"]["n_contaminated"] == 1, by_src["src1"]
    # src2: doc 5 has NULL text — must be counted CLEAN, never matched
    assert by_src["src2"]["n_contaminated"] == 0, by_src["src2"]
    assert by_src["src2"]["n_clean"] == 2, by_src["src2"]
    # src5: both the original and the shuffled variant match benchmark 49
    assert by_src["src5"]["n_contaminated"] == 2, by_src["src5"]
