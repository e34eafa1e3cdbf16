"""From-scratch Python references, batch 3 (r13): the custom-algorithm
keys whose DuckDB oracles are co-designed formulations of the SAME
nonstandard computation — SimHash bit derivation, Morton interleaving,
content fingerprints, the A/B z-statistic, the language-ID heuristic,
repetition ratios, quality scoring, token counting, and embedding norm
stats.  Each is recomputed here from the raw parquet with hashlib/math
only.  (The plain ANSI-SQL keys don't need this treatment: for those,
DuckDB itself is the independent engine.)"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd

from bigdatawork_spark.registry import QUERIES


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _words(text):
    return [w for w in (text or "").split(" ") if w]


def test_simhash_vs_python_bit_walk(spark, sf_dir):
    """64-bit tf-weighted SimHash recomputed bit-by-bit from md5 nibbles
    — signature strings and collision counts must match exactly."""
    docs = _docs(sf_dir)
    sigs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        tf = Counter(_words((text or "").lower()))
        signal = [0] * 64
        for w, n in tf.items():
            h = hashlib.md5(w.encode()).hexdigest()
            for j in range(64):
                nib = int(h[j // 4], 16)
                bit = (nib >> (3 - j % 4)) & 1
                signal[j] += n * (2 * bit - 1)
        sigs[doc_id] = "".join("1" if s >= 0 else "0" for s in signal)
    n_same = Counter(sigs.values())
    rows = QUERIES["dedup_simhash"](spark, sf_dir).collect()
    assert len(rows) == len(sigs)
    for r in rows:
        assert r["simhash"] == sigs[r["doc_id"]], r["doc_id"]
        assert r["n_same"] == n_same[r["simhash"]], r


def test_zorder_vs_python_morton(spark, sf_dir):
    """Morton interleave of (custkey bucket, day-of-year) recomputed with
    plain shifts; per-bucket occupancy/min/max exact."""
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    buckets = defaultdict(list)
    for ck, od in zip(o["o_custkey"], o["o_orderdate"]):
        x = int(ck) % 1024
        y = od.dayofyear % 512
        z = 0
        for i in range(10):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        buckets[z // 4096].append(z)
    rows = QUERIES["zorder_cluster"](spark, sf_dir).collect()
    assert len(rows) == len(buckets)
    for r in rows:
        zs = buckets[r["z_bucket"]]
        assert (r["n_rows"], r["z_min"], r["z_max"]) == (
            len(zs),
            min(zs),
            max(zs),
        ), r


def test_doc_fingerprint_vs_python_md5(spark, sf_dir):
    """Order-normalized word-set fingerprint ≡ hashlib.md5 over the
    sorted distinct words; collision counts exact."""
    docs = _docs(sf_dir)
    fps = {
        d: hashlib.md5(
            " ".join(sorted(set(_words((t or "").lower())))).encode()
        ).hexdigest()
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    n_same = Counter(fps.values())
    rows = QUERIES["doc_fingerprint"](spark, sf_dir).collect()
    assert len(rows) == len(fps)
    for r in rows:
        assert r["fingerprint"] == fps[r["doc_id"]], r["doc_id"]
        assert r["n_same"] == n_same[r["fingerprint"]], r


def test_ab_test_lift_vs_python_ztest(spark, sf_dir):
    """Variant assignment, conversion counts, rates, lift, and the pooled
    two-proportion z recomputed with hashlib + math."""
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    conv = defaultdict(int)
    for u, t in zip(ev["user_id"], ev["event_type"]):
        conv[u] |= t == "purchase"
    n = {"A": 0, "B": 0}
    c = {"A": 0, "B": 0}
    for u, cv in conv.items():
        v = "A" if hashlib.md5(str(u).encode()).hexdigest()[0] <= "7" else "B"
        n[v] += 1
        c[v] += cv
    row = QUERIES["ab_test_lift"](spark, sf_dir).collect()[0]
    assert (row["n_users_a"], row["n_conv_a"]) == (n["A"], c["A"])
    assert (row["n_users_b"], row["n_conv_b"]) == (n["B"], c["B"])
    ra, rb = c["A"] / n["A"], c["B"] / n["B"]
    pool = (c["A"] + c["B"]) / (n["A"] + n["B"])
    denom = math.sqrt(pool * (1 - pool) * (1 / n["A"] + 1 / n["B"]))
    assert abs(row["rate_a"] - ra) < 1e-6 and abs(row["rate_b"] - rb) < 1e-6
    assert abs(row["abs_lift"] - (rb - ra)) < 1e-6
    if denom == 0.0:
        # degenerate split (everyone or no one converts): the op's
        # try_divide yields NULL on both engines by design
        assert row["z_score"] is None, row
    else:
        assert abs(row["z_score"] - (rb - ra) / denom) < 2e-6, row


def test_ab_test_lift_nondegenerate_z(spark, tmp_path_factory):
    """The sf0.01 corpus converts ~everyone (z degenerates to NULL), so
    the z formula itself is pinned on a synthetic partial-conversion
    corpus: 300 users, every third one converts."""
    d = tmp_path_factory.mktemp("ab_synth")
    rows = []
    for u in range(300):
        rows.append((u * 2, pd.Timestamp("2024-01-01"), u, "view", 1.0, "{}"))
        if u % 3 == 0:
            rows.append(
                (u * 2 + 1, pd.Timestamp("2024-01-02"), u, "purchase", 1.0, "{}")
            )
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(f"{d}/events.parquet")
    row = QUERIES["ab_test_lift"](spark, str(d)).collect()[0]
    n = {"A": 0, "B": 0}
    c = {"A": 0, "B": 0}
    for u in range(300):
        v = "A" if hashlib.md5(str(u).encode()).hexdigest()[0] <= "7" else "B"
        n[v] += 1
        c[v] += u % 3 == 0
    ra, rb = c["A"] / n["A"], c["B"] / n["B"]
    pool = (c["A"] + c["B"]) / (n["A"] + n["B"])
    z = (rb - ra) / math.sqrt(pool * (1 - pool) * (1 / n["A"] + 1 / n["B"]))
    assert (row["n_users_a"], row["n_conv_a"]) == (n["A"], c["A"])
    assert (row["n_users_b"], row["n_conv_b"]) == (n["B"], c["B"])
    assert abs(row["z_score"] - z) < 2e-6, (row["z_score"], z)


def test_langid_vs_python_heuristic(spark, sf_dir):
    """Vowel-ratio / word-length bucketing recomputed with str.count."""
    docs = _docs(sf_dir)
    rows = QUERIES["text_langid"](spark, sf_dir).collect()
    ref = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        low = (t or "").lower()
        vr = sum(low.count(v) for v in "aeiou") / len(t)
        awl = len(t) / len(_words(t))
        guess = (
            "en" if vr >= 0.32 else
            "es" if vr >= 0.28 else
            "de" if awl >= 6.5 else
            "fr" if awl >= 5.5 else "zh"
        )
        ref[d] = (guess, vr)
    assert len(rows) == len(ref)
    for r in rows:
        guess, vr = ref[r["doc_id"]]
        assert r["lang_guess"] == guess, (r, guess)
        assert abs(r["vowel_ratio"] - vr) < 1e-6, (r, vr)


def test_repetition_ratio_vs_python_sets(spark, sf_dir):
    """Unigram/3-gram repeat fractions ≡ 1 - len(set)/len over the same
    sliding windows."""
    docs = _docs(sf_dir)
    rows = QUERIES["repetition_ngram_ratio"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    ref = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = _words(t)
        grams = (
            [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
            if len(ws) >= 3
            else []
        )
        rep = lambda xs: 0.0 if not xs else 1.0 - len(set(xs)) / len(xs)  # noqa: E731
        ref[d] = (len(ws), rep(ws), len(grams), rep(grams))
    for r in rows:
        nw, r1, ng, r3 = ref[r["doc_id"]]
        assert (r["n_words"], r["n_grams3"]) == (nw, ng), r
        assert abs(r["rep1_ratio"] - r1) < 1e-6, (r, r1)
        assert abs(r["rep3_ratio"] - r3) < 1e-6, (r, r3)


def test_quality_score_vs_python_formula(spark, sf_dir):
    """Length/word-count saturation + clean-charset bonus recomputed."""
    docs = _docs(sf_dir)
    rows = QUERIES["text_quality_score"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    ref = {}
    for d, t, nc in zip(docs["doc_id"], docs["text"], docs["n_chars"]):
        clean = re.sub(r"[a-z ]", "", t or "") == ""
        ref[d] = (
            min(nc / 400.0, 1.0) * 0.5
            + min(len(_words(t)) / 60.0, 1.0) * 0.3
            + (0.2 if clean else 0.0)
        )
    for r in rows:
        assert abs(r["quality"] - ref[r["doc_id"]]) < 1e-6, r


def test_token_count_vs_python_splits(spark, sf_dir):
    """All three token accountings exact: whitespace, the BPE-ish regex
    pieces (re.split as the third engine), and ceil(chars/4)."""
    docs = _docs(sf_dir)
    rows = QUERIES["token_count"](spark, sf_dir).collect()
    assert len(rows) == len(docs)
    ref = {
        d: (
            len(_words(t)),
            len([p for p in re.split(r"[^a-z0-9]+", t or "") if p]),
            math.ceil(len(t or "") / 4.0),
        )
        for d, t in zip(docs["doc_id"], docs["text"])
    }
    for r in rows:
        assert (
            r["ws_tokens"],
            r["bpe_ish_tokens"],
            r["byte_est_tokens"],
        ) == ref[r["doc_id"]], r


def test_embedding_norm_stats_vs_python_math(spark, sf_dir):
    """L2 norm, max |x|, and the large-component count recomputed from
    the float32 values widened exactly to doubles."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    rows = QUERIES["embedding_norm_stats"](spark, sf_dir).collect()
    assert len(rows) == len(emb)
    ref = {}
    for v, e, lab in zip(emb["vec_id"], emb["embedding"], emb["label"]):
        xs = [float(x) for x in e]
        ref[v] = (
            lab,
            math.sqrt(sum(x * x for x in xs)),
            max(abs(x) for x in xs),
            sum(1 for x in xs if abs(x) > 0.2),
        )
    for r in rows:
        lab, l2, mx, nl = ref[r["vec_id"]]
        assert r["label"] == lab and r["n_large"] == nl, r
        assert abs(r["l2_norm"] - l2) < 1e-6, (r, l2)
        assert abs(r["max_abs"] - mx) < 1e-6, (r, mx)
