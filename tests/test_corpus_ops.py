"""Engine-side equivalence tests for operators/corpus_ops.py.

The five oracled keys get row-for-row DuckDB hashes from the driver; these
tests cover the algorithmic guarantees the hashes can't: the iterative BPE
trainer against an independent pure-Python reference, chunk reconstruction,
and normalization idempotency.
"""

from __future__ import annotations

import collections

import pyarrow.parquet as pq

from bigdatawork_spark.registry import QUERIES


def _reference_bpe(texts, n_merges=4):
    """Independent reference BPE learner (Sennrich et al. 2016): greedy
    argmax pair with (count desc, pair asc) tiebreak, left-to-right
    non-overlapping merge — plain dicts, no Spark."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                vocab[tuple(w)] += 1
    merges = []
    for i in range(n_merges):
        pairs = collections.Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i, l, r, l + r, cnt))
        new_vocab = collections.Counter()
        for syms, freq in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def test_bpe_matches_pure_python_reference(spark, sf_dir):
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = _reference_bpe([t for t in texts if t is not None])
    got = [
        (r["merge_idx"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in QUERIES["bpe_train_merges"](spark, sf_dir).collect()
    ]
    assert got == want


def test_bpe_first_k_matches_pure_python_reference(spark, sf_dir):
    """bpe_first_k_merges (VERDICT r11 item 6) returns the trainer's first
    8 rules; the independent pure-Python reference must agree — the DuckDB
    side of the same claim is the driver's hash check over the unrolled
    CTE oracle."""
    from bigdatawork_spark.operators.corpus_ops import _BPE_K

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    want = _reference_bpe([t for t in texts if t is not None], n_merges=_BPE_K)
    got = [
        (r["merge_idx"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in QUERIES["bpe_first_k_merges"](spark, sf_dir).collect()
    ]
    assert got == want


def test_chunks_reconstruct_documents(spark, sf_dir):
    """Stride-24 windows of size 32: chunk 0 plus tokens 9..32 of every
    later chunk (dropping the 8-token overlap) must rebuild each doc."""
    rows = QUERIES["chunk_documents"](spark, sf_dir).collect()
    per_doc = collections.defaultdict(dict)
    for r in rows:
        per_doc[r["doc_id"]][r["chunk_idx"]] = r["chunk_text"].split(" ")
        assert 1 <= r["n_tokens"] <= 32
        assert r["n_tokens"] == len(r["chunk_text"].split(" "))
    texts = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
    }
    for doc_id, chunks in per_doc.items():
        rebuilt = list(chunks[0])
        for i in range(1, len(chunks)):
            rebuilt.extend(chunks[i][8:])
        want = [w for w in texts[doc_id].split(" ") if w != ""]
        assert rebuilt == want, doc_id


def test_normalize_is_idempotent(spark, sf_dir):
    import re
    import unicodedata

    rows = QUERIES["text_normalize"](spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        t = r["norm_text"]
        again = unicodedata.normalize(
            "NFC", re.sub(r"\s+", " ", re.sub(r"[\x00-\x1f]", "", t)).strip().lower()
        )
        assert again == t
        assert r["n_chars_norm"] == len(t)


def test_char_ngram_profile_ranks_and_counts(spark, sf_dir):
    rows = QUERIES["char_ngram_profile"](spark, sf_dir).collect()
    by_lang = collections.defaultdict(list)
    for r in rows:
        assert len(r["gram"]) == 3
        by_lang[r["lang"]].append((r["rank"], r["cnt"], r["gram"]))
    for lang, entries in by_lang.items():
        entries.sort()
        assert [e[0] for e in entries] == list(range(1, len(entries) + 1))
        assert len(entries) <= 20
        cnts = [e[1] for e in entries]
        assert cnts == sorted(cnts, reverse=True), lang


def test_vocab_build_bounds(spark, sf_dir):
    n_docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).num_rows
    rows = QUERIES["vocab_build"](spark, sf_dir).collect()
    assert rows
    dfs = [r["df"] for r in rows]
    assert all(2 <= d <= 0.9 * n_docs for d in dfs)
    assert dfs == sorted(dfs, reverse=True)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["tf"] >= r["df"]  # a word occurs at least once per doc it's in


def test_html_strip_recovers_normalized_text(spark, sf_dir):
    texts = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).to_pylist()
    }
    rows = QUERIES["html_strip_tags"](spark, sf_dir).collect()
    for r in rows[:50]:
        want = " ".join(w for w in texts[r["doc_id"]].split(" ") if w != "")
        assert r["clean_text"] == want
        n_words = len([w for w in texts[r["doc_id"]].split(" ") if w != ""])
        # <p>, </p>, and one <br/> per word gap
        assert r["n_tags"] == 2 + max(0, n_words - 1)


def test_entropy_filter_detects_degenerate_text(spark, sf_dir):
    """Algorithmic sanity on hand-built rows: repeated-char spam scores
    ~0 nats, uniform distinct chars score ln(k); the corpus rows (natural
    word soup) sit in between and carry keep=1."""
    import math

    from pyspark.sql import functions as F

    from bigdatawork_spark.operators import corpus_ops  # noqa: F401
    from bigdatawork_spark.registry import QUERIES

    rows = QUERIES["text_entropy_filter"](spark, sf_dir).collect()
    assert rows and all(r["keep"] in (0, 1) for r in rows)
    assert sum(r["keep"] for r in rows) > len(rows) * 0.9  # word soup is natural

    # hand-built extremes through the same expression chain
    df = spark.createDataFrame(
        [(1, "aaaaaaaaaa"), (2, "abcdefgh")], "doc_id long, text string"
    )
    ent = df.selectExpr(
        "doc_id",
        "filter(split(lower(text), ''), c -> c != '') as cs",
        "cast(length(text) as bigint) as n",
    ).selectExpr(
        "doc_id",
        "round(-aggregate(transform(array_distinct(cs), u ->"
        " (cast(size(filter(cs, x -> x = u)) as double) / n)"
        " * ln(cast(size(filter(cs, x -> x = u)) as double) / n)),"
        " cast(0.0 as double), (a, x) -> a + x), 6) as e",
    )
    got = {r["doc_id"]: r["e"] for r in ent.collect()}
    assert got[1] == 0.0
    assert abs(got[2] - round(math.log(8), 6)) < 1e-9


def test_bpe_encode_matches_reference_token_counts(spark, sf_dir):
    """Encode twin: apply the FROZEN rule table with the pure-Python
    reference encoder and compare per-document BPE token counts.  (Since
    round 7 the encode key pins its rules — train-once/apply-everywhere —
    so the reference applies the same constant, not re-learned merges.)"""
    from bigdatawork_spark.operators.corpus_ops import _FROZEN_BPE_MERGES

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    rules = list(_FROZEN_BPE_MERGES)

    def encode_word(w):
        syms = list(w)
        for l, r in rules:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    want = {
        r["doc_id"]: sum(
            len(encode_word(w)) for w in r["text"].lower().split() if w
        )
        for r in docs
        if r["text"] is not None
    }
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in QUERIES["bpe_encode_apply"](spark, sf_dir).collect()
    }
    assert got == want
    rows = QUERIES["bpe_encode_apply"](spark, sf_dir).collect()
    for r in rows:
        assert r["n_bpe_tokens"] <= r["n_chars"]  # merges only shrink
        assert r["chars_per_token"] >= 1.0


def test_ngram_lm_conditionals_are_probabilities(spark, sf_dir):
    """For every context w1 fully contained in the top-200 cut, the
    published conditionals must be positive; and each p_cond must equal
    cnt / sum-of-context-counts computed independently."""
    rows = QUERIES["ngram_lm_train"](spark, sf_dir).collect()
    assert len(rows) == 200
    by_ctx = collections.defaultdict(list)
    for r in rows:
        assert 0.0 < r["p_cond"] <= 1.0
        by_ctx[r["w1"]].append(r)
    # independent recompute over raw text
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    pair_counts = collections.Counter()
    for t in texts:
        if t is None:
            continue
        ws = [w for w in t.lower().split(" ") if w != ""]
        for a, b in zip(ws, ws[1:]):
            pair_counts[(a, b)] += 1
    ctx_counts = collections.Counter()
    for (a, _), c in pair_counts.items():
        ctx_counts[a] += c
    for r in rows:
        assert pair_counts[(r["w1"], r["w2"])] == r["cnt"]
        assert r["p_cond"] == round(r["cnt"] / ctx_counts[r["w1"]], 6)


def test_ks_drift_null_on_identical_halves(spark, sf_dir):
    """Even/odd doc_id halves draw from the same generator, so the KS
    statistic must be far below any rejection threshold; and KS of a
    distribution against itself is exactly 0."""
    from bigdatawork_spark.registry import QUERIES as Q

    import math

    row = Q["ks_test_drift"](spark, sf_dir).collect()[0]
    assert row["n_a"] + row["n_b"] > 0
    assert 0.0 <= row["ks_stat"] <= 1.0
    # threshold is the alpha=0.05 two-sample critical value, scale-aware
    want_crit = round(
        1.358 * math.sqrt((row["n_a"] + row["n_b"]) / (row["n_a"] * row["n_b"])), 6
    )
    assert row["ks_crit"] == want_crit
    assert row["drifted"] == 0, row  # same generator -> below critical value


def test_k_anonymity_counts_sum_to_corpus(spark, sf_dir):
    from bigdatawork_spark.registry import QUERIES as Q

    n_docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).num_rows
    rows = Q["privacy_k_anonymity"](spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == n_docs
    for r in rows:
        assert r["at_risk"] == (1 if r["n_rows"] < 5 else 0)


def test_parquet_layout_audit_matches_duckdb_metadata(spark, sf_dir):
    """rows-only key: every emitted row group must match DuckDB's
    independent parquet_metadata() reading of the same file."""
    import duckdb

    rows = QUERIES["parquet_layout_audit"](spark, sf_dir).collect()
    assert rows
    con = duckdb.connect()
    want = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            "SELECT row_group_id, row_group_num_rows, row_group_num_columns,"
            " row_group_bytes FROM"
            f" parquet_metadata('{sf_dir}/lineitem.parquet') GROUP BY ALL"
        ).fetchall()
    }
    got = {
        (r["row_group_id"], r["n_rows"]): (r["n_columns"], r["n_bytes"])
        for r in rows
    }
    assert got == want
    for r in rows:
        assert r["small_rowgroup"] == (1 if r["n_rows"] < 10_000 else 0)


def test_negative_pairs_deterministic_and_never_self(spark, sf_dir):
    a = QUERIES["sample_negative_pairs"](spark, sf_dir).collect()
    b = QUERIES["sample_negative_pairs"](spark, sf_dir).collect()
    assert a == b  # hash arithmetic, not RNG
    n_vecs = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id"]).num_rows
    assert len(a) == 3 * n_vecs  # every anchor gets exactly 3 resolved negatives
    for r in a:
        assert r["neg_id"] != r["vec_id"]  # self-collision bumped away
        assert 0 <= r["neg_id"] < n_vecs


def test_bpe_fuzz_vs_python(spark):
    """VERDICT r10 item 6: differential-fuzz the distributed BPE trainer's
    merge sequence against the pure-Python reference on seeded random
    corpora (the test_url_fuzz pattern).  A 3-letter alphabet with short
    words makes pair-count TIES common, so the (count desc, pair asc)
    argmax tiebreak — the part a fixed corpus exercises least — is hit on
    nearly every example.  Also covers: single-char words (no pairs),
    corpora that exhaust their pairs before n_merges (early break), and
    n_merges beyond the default 4."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from bigdatawork_spark.operators.corpus_ops import bpe_train_on

    word = st.text(alphabet="abc", min_size=1, max_size=5)
    doc = st.lists(word, min_size=1, max_size=8).map(" ".join)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(doc, min_size=1, max_size=10),
        n_merges=st.integers(min_value=1, max_value=6),
    )
    def run(docs, n_merges):
        df = spark.createDataFrame([(t,) for t in docs], "text string")
        got = bpe_train_on(df, n_merges)
        want = _reference_bpe(docs, n_merges)
        assert got == want, f"docs={docs!r} n_merges={n_merges}"

    run()
