"""From-scratch Python references, batch 4 (r13): the corpus-index and
maintenance keys — contamination screening, inverted-index postings,
corpus bigrams, per-class centroids, mergeable-aggregate maintenance,
the near-dup representative pick (char-shingle Jaccard + union-find),
and the skew profile's interpolated percentiles."""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd

from bigdatawork_spark.registry import QUERIES


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def test_contamination_ngram_vs_python_sets(spark, sf_dir):
    """Distinct 5-gram overlap counts against the doc_id%97 benchmark
    split, recomputed with plain set intersections.  Tokenization
    mirrors the op exactly: split(' ') WITHOUT empty filtering."""
    docs = _docs(sf_dir)
    grams = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = (t or "").split(" ")
        if len(ws) >= 5:
            grams[d] = {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)}
    bench = set().union(*(g for d, g in grams.items() if d % 97 == 0))
    ref = {
        d: len(g & bench)
        for d, g in grams.items()
        if d % 97 != 0 and g & bench
    }
    rows = QUERIES["contamination_ngram"](spark, sf_dir).collect()
    assert {r["doc_id"]: r["n_contaminated_grams"] for r in rows} == ref


def test_inverted_index_vs_python_postings(spark, sf_dir):
    """doc-frequency and sorted posting strings from a dict walk."""
    docs = _docs(sf_dir)
    postings = defaultdict(list)
    for d, t in zip(docs["doc_id"], docs["text"]):
        if d >= 300:
            continue
        for tok in set((t or "").split(" ")):
            if len(tok) >= 4:
                postings[tok].append(d)
    rows = QUERIES["inverted_index"](spark, sf_dir).collect()
    assert len(rows) == len(postings)
    for r in rows:
        ids = sorted(postings[r["token"]])
        assert r["doc_freq"] == len(ids), r
        assert r["postings"] == ",".join(str(i) for i in ids), r


def test_ngram_topk_vs_python_counter(spark, sf_dir):
    """Corpus top-20 bigrams ≡ a Counter over adjacent non-empty words,
    ties broken on the bigram text."""
    docs = _docs(sf_dir)
    c = Counter()
    for t in docs["text"]:
        ws = [w for w in (t or "").split(" ") if w]
        c.update(f"{a} {b}" for a, b in zip(ws[:-1], ws[1:]))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = QUERIES["ngram_topk"](spark, sf_dir).collect()
    assert [(r["bigram"], r["n"]) for r in rows] == top


def test_embedding_centroid_vs_python_means(spark, sf_dir):
    """Per-(label, dimension) centroid ≡ plain Python means."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    sums: dict[tuple, list] = defaultdict(lambda: [0.0, 0])
    for lab, e in zip(emb["label"], emb["embedding"]):
        for pos, x in enumerate(e, start=1):
            s = sums[(lab, pos)]
            s[0] += float(x)
            s[1] += 1
    rows = QUERIES["embedding_centroid"](spark, sf_dir).collect()
    assert len(rows) == len(sums)
    for r in rows:
        s, n = sums[(r["label"], r["pos"])]
        assert r["n_vectors"] == n, r
        assert abs(r["centroid"] - s / n) < 1e-6, (r, s / n)


def test_incremental_agg_merge_vs_python_recompute(spark, sf_dir):
    """The merged base+delta partials ≡ a full single-pass recompute —
    the mergeable-state contract, verified by a third engine."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    agg: dict[str, list] = defaultdict(lambda: [0, 0.0])
    for t, v in zip(ev["event_type"], ev["value"]):
        a = agg[t]
        a[0] += 1
        a[1] += round(v, 2)  # the op sums decimal(18,2)-cast values
    rows = QUERIES["incremental_agg_merge"](spark, sf_dir).collect()
    assert len(rows) == len(agg)
    for r in rows:
        n, s = agg[r["event_type"]]
        assert r["n_events"] == n, r
        assert abs(r["sum_value"] - s) < 1e-6 * max(1.0, abs(s)), (r, s)
        assert abs(r["avg_value"] - s / n) < 2e-6, (r, s / n)


def test_keep_representative_vs_python_union_find(spark, sf_dir):
    """The kept set ≡ min-id representatives of a from-scratch union-find
    over char-3-gram Jaccard ≥ 0.45 edges (docs < 60 slice)."""
    docs = _docs(sf_dir)
    shingles = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        if d < 60 and t is not None and len(t) >= 3:
            shingles[d] = {t[i : i + 3] for i in range(len(t) - 2)}
    parent = {d: d for d in shingles}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = sorted(shingles)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(shingles[a] & shingles[b])
            if inter and inter / len(shingles[a] | shingles[b]) >= 0.45:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    kept = sorted(d for d in shingles if find(d) == d)
    rows = QUERIES["dedup_keep_representative"](spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows] == kept


def _quantile_cont(sorted_xs, q):
    h = (len(sorted_xs) - 1) * q
    lo = int(h)
    hi = min(lo + 1, len(sorted_xs) - 1)
    return sorted_xs[lo] + (h - lo) * (sorted_xs[hi] - sorted_xs[lo])


def test_dq_skew_profile_vs_python_percentiles(spark, sf_dir):
    """Key-frequency profile ≡ a Counter plus hand-rolled linear
    interpolation percentiles (the quantile_cont definition)."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    freq = sorted(Counter(ev["user_id"]).values())
    n_keys = len(freq)
    n_rows = sum(freq)
    avg = n_rows / n_keys
    row = QUERIES["dq_skew_profile"](spark, sf_dir).collect()[0]
    assert (row["n_keys"], row["n_rows"], row["max_freq"]) == (
        n_keys,
        n_rows,
        freq[-1],
    )
    assert abs(row["avg_freq"] - avg) < 1e-6
    assert abs(row["p50_freq"] - _quantile_cont(freq, 0.5)) < 1e-6, row
    assert abs(row["p99_freq"] - _quantile_cont(freq, 0.99)) < 1e-6, row
    assert abs(row["skew_ratio"] - freq[-1] / avg) < 1e-5, row
