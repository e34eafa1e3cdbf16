"""Engine-side references for the round-8 curation ops — each key's oracle
parity is driver-checked; these tests re-derive the SEMANTICS in plain
Python from the parquet, so a bug that slipped into both the Spark builder
and the DuckDB oracle identically would still be caught."""

from __future__ import annotations

import hashlib
import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdatawork_spark.operators.curation import dedup_segments_crossdoc
from bigdatawork_spark.operators.corpus_ops import lm_perplexity_score
from bigdatawork_spark.operators.pipeline_ops import (
    dedup_winnow_pairs,
    winnow_fingerprint,
)


@pytest.fixture(scope="module")
def docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _words(text):
    return [w for w in text.lower().split(" ") if w != ""]


# --------------------------------------------------------------------------
# lm_perplexity_score — pure-Python bigram LM re-derivation
# --------------------------------------------------------------------------


def test_lm_perplexity_matches_python_reference(spark, sf_dir, docs):
    got = lm_perplexity_score(spark, sf_dir).toPandas().set_index("doc_id")

    from collections import Counter

    bi, ctx, vocab = Counter(), Counter(), set()
    per_doc = {}
    for _, r in docs[docs.text.notna()].iterrows():
        ws = _words(r.text)
        vocab.update(ws)
        pairs = list(zip(ws, ws[1:]))
        if pairs:
            per_doc[r.doc_id] = pairs
            bi.update(pairs)
            for w1, _ in pairs:
                ctx[w1] += 1
    v = len(vocab)
    for doc_id, pairs in per_doc.items():
        nll = -sum(
            math.log((bi[p] + 0.5) / (ctx[p[0]] + 0.5 * v)) for p in pairs
        ) / len(pairs)
        row = got.loc[doc_id]
        assert row["n_bigrams"] == len(pairs)
        assert abs(row["avg_nll"] - nll) < 1e-5, (doc_id, row["avg_nll"], nll)
        assert abs(row["ppl"] - math.exp(round(nll, 6))) < 1e-3
    assert set(per_doc) == set(got.index)


def test_lm_perplexity_bounds(spark, sf_dir):
    got = lm_perplexity_score(spark, sf_dir).toPandas()
    # Perplexity of any smoothed distribution over V outcomes is >= 1 and
    # (for add-k) bounded by the worst single-event probability bound.
    assert (got.ppl >= 1.0).all()
    assert got.avg_nll.between(0, 50).all()


# --------------------------------------------------------------------------
# dedup_segments_crossdoc — pure-Python segment/boilerplate re-derivation
# --------------------------------------------------------------------------


def _segments(ws, k=3):
    return [
        " ".join(ws[i : i + k]) for i in range(0, len(ws), k)
    ]  # final partial chunk included, matching ceil(len/3) segments


def test_dedup_segments_matches_python_reference(spark, sf_dir, docs):
    got = dedup_segments_crossdoc(spark, sf_dir).toPandas().set_index("doc_id")

    seg_docs: dict[str, set] = {}
    doc_segs = {}
    for _, r in docs[docs.text.notna()].iterrows():
        ws = _words(r.text)
        if not ws:
            continue
        segs = _segments(ws)
        doc_segs[r.doc_id] = segs
        for s in segs:
            seg_docs.setdefault(s, set()).add(r.doc_id)
    boiler = {s for s, d in seg_docs.items() if len(d) >= 3}
    assert boiler, "corpus must produce boilerplate for a non-vacuous test"

    removed_any = 0
    for doc_id, segs in doc_segs.items():
        kept = [s for s in segs if s not in boiler]
        row = got.loc[doc_id]
        assert row["n_seg"] == len(segs)
        assert row["n_kept"] == len(kept)
        assert row["cleaned_text"] == " ".join(kept)
        # SQL ROUND is half-away-from-zero; Python round() is half-even
        assert row["keep_ratio"] == math.floor(
            len(kept) / len(segs) * 10000 + 0.5
        ) / 10000
        removed_any += len(segs) - len(kept)
    assert removed_any > 0
    assert set(doc_segs) == set(got.index)


def test_dedup_segments_cleaned_text_is_subsequence(spark, sf_dir):
    got = dedup_segments_crossdoc(spark, sf_dir).toPandas()
    full = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index("doc_id")
    sample = got.head(50)
    for _, r in sample.iterrows():
        orig = " ".join(_words(full.loc[r.doc_id, "text"]))
        # every kept segment appears verbatim in the original
        for chunk in r.cleaned_text.split(" ") if r.cleaned_text else []:
            assert chunk in orig.split(" ")


# --------------------------------------------------------------------------
# dedup_repeated_spans — pure-Python repeated-substring re-derivation
# --------------------------------------------------------------------------


def test_repeated_spans_matches_python_reference(spark, sf_dir, docs):
    from bigdatawork_spark.operators.curation import dedup_repeated_spans

    got = dedup_repeated_spans(spark, sf_dir).toPandas()

    from collections import Counter

    K, MIN_SPAN = 20, 50
    occ = Counter()
    texts = {}
    for _, r in docs[docs.text.notna()].iterrows():
        if len(r.text) < K:
            continue
        t = r.text.lower()
        texts[r.doc_id] = t
        for i in range(len(t) - K + 1):
            occ[t[i : i + K]] += 1
    expect = []
    for doc_id, t in texts.items():
        marked = [
            i + 1
            for i in range(len(t) - K + 1)
            if occ[t[i : i + K]] >= 2
        ]
        # gaps-and-islands
        start = None
        prev = None
        for p in marked + [None]:
            if start is None:
                start = prev = p
                continue
            if p is not None and p == prev + 1:
                prev = p
                continue
            end = prev + K - 1
            if end - start + 1 >= MIN_SPAN:
                expect.append((doc_id, start, end, end - start + 1))
            start = prev = p
    expect.sort()
    assert (
        [tuple(r) for r in got.itertuples(index=False)] == expect
    )
    assert len(expect) > 0


def test_repeated_spans_are_actually_repeated(spark, sf_dir, docs):
    """Every reported span's text occurs at least twice in the corpus
    (the defining property), checked literally on a sample."""
    from bigdatawork_spark.operators.curation import dedup_repeated_spans

    got = dedup_repeated_spans(spark, sf_dir).toPandas().head(20)
    corpus = "\x00".join(
        t.lower() for t in docs[docs.text.notna()].text
    )
    by_id = docs.set_index("doc_id")
    for _, r in got.iterrows():
        # the span's first 20-gram must occur >= 2 times corpus-wide
        t = by_id.loc[r.doc_id, "text"].lower()
        gram = t[r.span_start - 1 : r.span_start - 1 + 20]
        assert corpus.count(gram) >= 2, (r.doc_id, gram)


def test_spans_removal_matches_python_reference(spark, sf_dir, docs):
    """Span EXCISION re-derived in pure Python: recompute the >=50-char
    repeated spans, cut them out of each doc, compare text + counts —
    including the untouched-passthrough and the fully-repeated->empty
    cases and the k-1 char smear between position-adjacent islands."""
    from bigdatawork_spark.operators.curation import dedup_spans_removal

    got = dedup_spans_removal(spark, sf_dir).toPandas().set_index("doc_id")

    from collections import Counter

    K, MIN_SPAN = 20, 50
    occ = Counter()
    texts = {}
    for _, r in docs[docs.text.notna()].iterrows():
        t = r.text.lower()
        texts[r.doc_id] = t
        for i in range(max(len(t) - K + 1, 0)):
            occ[t[i : i + K]] += 1
    n_with_cuts = 0
    for doc_id, t in texts.items():
        marked = [
            i + 1
            for i in range(max(len(t) - K + 1, 0))
            if occ[t[i : i + K]] >= 2
        ]
        spans = []
        start = prev = None
        for p in marked + [None]:
            if start is None:
                start = prev = p
                continue
            if p is not None and p == prev + 1:
                prev = p
                continue
            end = prev + K - 1
            if end - start + 1 >= MIN_SPAN:
                spans.append((start, end))
            start = prev = p
        cleaned, cursor = [], 0  # cursor = last cut END (0-based exclusive)
        for s, e in spans:
            cleaned.append(t[cursor : max(s - 1, cursor)])
            cursor = max(e, cursor)
        cleaned.append(t[cursor:])
        ctext = "".join(cleaned)
        row = got.loc[doc_id]
        assert row["n_cut_spans"] == len(spans), doc_id
        assert row["cleaned_text"] == ctext, doc_id
        assert row["cleaned_len"] == len(ctext)
        n_with_cuts += bool(spans)
    assert n_with_cuts > 0
    assert set(texts) == set(got.index)


@given(
    texts=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=0,
                max_size=20,
            ).map(" ".join),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_perplexity_fuzz_vs_python(spark, texts):
    """Hypothesis fuzz of the bigram-LM scorer on random tiny-vocab
    corpora incl. NULL texts, empty texts, and single-word docs (no
    bigrams → absent from the output by contract)."""
    import bigdatawork_spark.operators.corpus_ops as r8
    from bigdatawork_spark.operators.corpus_ops import lm_perplexity_score
    from collections import Counter

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    orig = r8.load
    try:
        r8.load = lambda sp, sf, name: sdf
        got = lm_perplexity_score(spark, "x").toPandas().set_index("doc_id")
    finally:
        r8.load = orig

    bi, ctx, vocab, per_doc = Counter(), Counter(), set(), {}
    for i, t in rows:
        if t is None:
            continue
        ws = _words(t)
        vocab.update(ws)
        pairs = list(zip(ws, ws[1:]))
        if pairs:
            per_doc[i] = pairs
            bi.update(pairs)
            for w1, _ in pairs:
                ctx[w1] += 1
    v = len(vocab)
    assert set(per_doc) == set(got.index)
    for i, pairs in per_doc.items():
        nll = -sum(
            math.log((bi[p] + 0.5) / (ctx[p[0]] + 0.5 * v)) for p in pairs
        ) / len(pairs)
        assert abs(got.loc[i, "avg_nll"] - nll) < 1e-5, (i, texts[i])


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),  # 4-word vocab: dense collisions
            min_size=0,
            max_size=20,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_segment_dedup_fuzz_vs_python(spark, texts):
    """Hypothesis fuzz of the cross-doc segment dedup on random tiny-vocab
    corpora (maximizing boilerplate collisions and edge cases: empty
    texts, docs shorter than one segment, every-segment-boilerplate)."""
    import bigdatawork_spark.operators.curation as r8
    from bigdatawork_spark.operators.curation import dedup_segments_crossdoc

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    orig = r8.load
    try:
        r8.load = lambda sp, sf, name: sdf
        got = (
            dedup_segments_crossdoc(spark, "x").toPandas().set_index("doc_id")
        )
    finally:
        r8.load = orig

    seg_docs: dict[str, set] = {}
    doc_segs = {}
    for i, t in rows:
        ws = _words(t)
        if not ws:
            continue
        segs = _segments(ws)
        doc_segs[i] = segs
        for s in segs:
            seg_docs.setdefault(s, set()).add(i)
    boiler = {s for s, d in seg_docs.items() if len(d) >= 3}
    for i, segs in doc_segs.items():
        kept = [s for s in segs if s not in boiler]
        row = got.loc[i]
        assert row["n_seg"] == len(segs)
        assert row["n_kept"] == len(kept)
        assert row["cleaned_text"] == " ".join(kept)
    assert set(doc_segs) == set(got.index)


def test_heavy_hitters_exact_beyond_sketch_capacity(spark):
    """The MG guarantee under adversarial load: a 500-word vocabulary
    (>> the m=64 sketch capacity) with 20 planted heavy words — the
    candidate union must still contain every true top-20, making the
    final answer EXACT vs a Python Counter.  This is the case the real
    corpus (31 words < m) never exercises."""
    import bigdatawork_spark.operators.aggregations as r8
    from bigdatawork_spark.operators.aggregations import topk_heavy_hitters
    from collections import Counter

    # Guarantee precondition: every true top-20 count must exceed
    # n_tokens/m.  Here n ~ 5060, n/m ~ 79, lightest heavy = 110.
    words = []
    for h in range(20):  # heavy: 300 - 10h occurrences each (110..300)
        words += [f"heavy{h:02d}"] * (300 - 10 * h)
    for t in range(480):  # tail: 1-3 occurrences
        words += [f"tail{t:03d}"] * (t % 3 + 1)
    # deterministic interleave so heavies spread across partitions
    words = [words[i] for i in range(0, len(words), 7)] + [
        words[i] for i in range(len(words)) if i % 7 != 0
    ]
    docs = [(i, " ".join(words[i::37])) for i in range(37)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    orig = r8.load
    try:
        r8.load = lambda sp, sf, name: sdf
        got = [
            (r.word, r.cnt) for r in topk_heavy_hitters(spark, "x").collect()
        ]
    finally:
        r8.load = orig
    exact = Counter(w for _, t in docs for w in t.split(" ") if w)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


# --------------------------------------------------------------------------
# winnow_fingerprint — brute-force per-window winnowing reference
# --------------------------------------------------------------------------


def _brute_winnow(text, k=5, w=4):
    """Literal robust-winnowing: enumerate every window, select the
    rightmost minimum (Schleimer et al. §3).  The operator computes the
    same set via reach arithmetic in ONE window pass — this is the
    ground-truth cross-check."""
    t = text.lower()
    n = len(t) - k + 1
    if n < 1:
        return set()
    h = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(n)
    ]
    if n < w:
        m = min(h)
        return {max(i for i in range(n) if h[i] == m) + 1}
    sel = set()
    for s in range(n - w + 1):
        win = h[s : s + w]
        m = min(win)
        j = max(i for i in range(w) if win[i] == m)
        sel.add(s + j + 1)  # 1-based positions
    return sel


def test_winnow_matches_bruteforce(spark, sf_dir, docs):
    got = winnow_fingerprint(spark, sf_dir).toPandas()
    by_doc = {k: set(v["fp_pos"]) for k, v in got.groupby("doc_id")}
    sample = docs[docs.text.notna()].head(100)
    for _, r in sample.iterrows():
        expect = _brute_winnow(r.text)
        assert by_doc.get(r.doc_id, set()) == expect, r.doc_id


def test_winnow_guarantee_every_window_covered(spark, sf_dir, docs):
    """The winnowing guarantee: every window of w consecutive grams
    contains at least one selected fingerprint."""
    got = winnow_fingerprint(spark, sf_dir).toPandas()
    by_doc = {k: sorted(v["fp_pos"]) for k, v in got.groupby("doc_id")}
    w = 4
    for _, r in docs[docs.text.notna()].head(100).iterrows():
        n = len(r.text) - 5 + 1
        pos = by_doc.get(r.doc_id, [])
        assert pos, r.doc_id
        if n >= w:
            # gap between consecutive fingerprints (and the edges) < w
            assert pos[0] <= w
            assert pos[-1] > n - w
            assert max(
                (b - a) for a, b in zip(pos, pos[1:])
            ) <= w if len(pos) > 1 else True


def test_winnow_density_near_theoretical(spark, sf_dir, docs):
    got = winnow_fingerprint(spark, sf_dir).toPandas()
    total_grams = (
        docs[docs.text.notna()].text.str.len().clip(lower=4) - 4
    ).sum()
    density = len(got) / total_grams
    assert 0.33 < density < 0.47  # theoretical 2/(w+1) = 0.4


def test_winnow_pairs_matches_python_reference(spark, sf_dir, docs):
    """Second MOSS stage re-derived in pure Python from the brute-force
    fingerprints: rare-fingerprint (df in [2, max(2, 4% of docs)])
    bucket join, pairs sharing >= 3."""
    got = dedup_winnow_pairs(spark, sf_dir).toPandas()

    fp_docs: dict[int, set] = {}
    for _, r in docs[docs.text.notna()].iterrows():
        if len(r.text) < 5:
            continue
        t = r.text.lower()
        hs = {
            int(
                hashlib.md5(t[p - 1 : p - 1 + 5].encode()).hexdigest()[:8], 16
            )
            for p in _brute_winnow(r.text)
        }
        for h in hs:
            fp_docs.setdefault(h, set()).add(r.doc_id)
    n_docs = len({d for s in fp_docs.values() for d in s})
    cap = min(max(2, int(0.04 * n_docs)), 64)
    from collections import Counter

    shared = Counter()
    for h, ds in fp_docs.items():
        if 2 <= len(ds) <= cap:
            ds = sorted(ds)
            for i, a in enumerate(ds):
                for b in ds[i + 1 :]:
                    shared[(a, b)] += 1
    expect = {p for p, c in shared.items() if c >= 3}
    assert {(r.doc_a, r.doc_b) for _, r in got.iterrows()} == expect
    for _, r in got.iterrows():
        assert r.n_shared == shared[(r.doc_a, r.doc_b)]
    assert len(expect) > 0


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("abcdefg h"),  # small alphabet: dense ties
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_winnow_fuzz_random_strings_vs_bruteforce(spark, texts):
    """Hypothesis fuzz of the reach-arithmetic winnowing against the
    brute-force per-window rule on RANDOM short strings over a tiny
    alphabet (maximizing hash ties and boundary cases: docs shorter than
    k, shorter than one window, exactly one window).  The operator is
    re-pointed at an inline table through a temp view of the same shape."""
    from bigdatawork_spark.operators.pipeline_ops import _winnow_selected
    import bigdatawork_spark.operators.pipeline_ops as r8
    from bigdatawork_spark import io as bio

    rows = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    orig_load = r8.load
    try:
        r8.load = lambda sp, sf, name: sdf  # inject the fuzz corpus
        got = (
            _winnow_selected(spark, "unused")
            .toPandas()
            .groupby("doc_id")["pos"]
            .apply(set)
            .to_dict()
        )
    finally:
        r8.load = orig_load
    for i, t in rows:
        assert got.get(i, set()) == _brute_winnow(t), (i, t)


def test_winnow_local_edit_perturbs_o1_fingerprints(spark, sf_dir):
    """The property winnowing exists for: a single-char edit in the middle
    of a document changes only fingerprints within k+w-1 positions of the
    edit — verified in pure Python with the same hash/rule."""
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    edited = base.replace("jumps", "jumpy", 1)  # same length: positions align
    a, b = _brute_winnow(base), _brute_winnow(edited)
    edit_at = base.index("jumps")
    assert a != b  # the edit is visible...
    for p in a.symmetric_difference(b):
        # ...but only within a k+w-1 neighborhood of the edited span
        assert edit_at - (5 + 4 - 1) <= (p - 1) <= edit_at + len("jumpy") + 4
