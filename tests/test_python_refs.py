"""From-scratch Python references, batch 2 (VERDICT r12 item 6 follow-on).

DuckDB parity can share a defect with the operator under test (both sides
of a co-designed oracle can encode the same misunderstanding — the r05
mixture_resample lesson).  Each test here recomputes the operator's
answer from the raw parquet with plain Python (collections / math /
hashlib), no SQL engine involved, and compares.  Batch 1 (r12, in
test_invariants.py) covered BM25, the bigram-LM counts, naive Bayes,
mixture resampling, DSIR, KS, decile binning, and per-group OLS; this
batch closes the remaining families that had only DuckDB parity or
structural checks: seasonal decomposition, crosstab, bitmap distinct,
k-anonymity, the deterministic-Laplace DP counts, LTTB-mean picking,
bigram perplexity scoring, and unigram surprisal."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pandas as pd

from bigdatawork_spark.registry import QUERIES


def _read(sf_dir: str, table: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _tokens(text: str) -> list[str]:
    return [w for w in (text or "").split(" ") if w]


def test_seasonal_decompose_vs_python_walk(spark, sf_dir):
    """Per-(event_type, hour) seasonal mean and residual RMS recomputed
    with a two-pass Python walk over the same rows."""
    ev = _read(sf_dir, "events")
    sums: dict[tuple, list] = defaultdict(lambda: [0.0, 0])
    for t, ts, v in zip(ev["event_type"], ev["ts"], ev["value"]):
        s = sums[(t, ts.hour)]
        s[0] += v
        s[1] += 1
    means = {k: s[0] / s[1] for k, s in sums.items()}
    rss: dict[tuple, float] = defaultdict(float)
    for t, ts, v in zip(ev["event_type"], ev["ts"], ev["value"]):
        k = (t, ts.hour)
        rss[k] += (v - means[k]) ** 2
    rows = QUERIES["ts_seasonal_decompose"](spark, sf_dir).collect()
    assert len(rows) == len(means)
    for r in rows:
        k = (r["event_type"], r["hr"])
        assert r["n_events"] == sums[k][1], k
        assert abs(r["seasonal_mean"] - means[k]) < 2e-6, (k, r["seasonal_mean"], means[k])
        ref_rms = math.sqrt(rss[k] / sums[k][1])
        assert abs(r["resid_rms"] - ref_rms) < 2e-6, (k, r["resid_rms"], ref_rms)


def test_crosstab_vs_python_counter(spark, sf_dir):
    """df.stat.crosstab's pair counts ≡ a plain Counter over the rows."""
    li = _read(sf_dir, "lineitem")
    c = Counter(zip(li["l_returnflag"], li["l_linestatus"]))
    flags = sorted(set(li["l_returnflag"]))
    rows = QUERIES["stat_crosstab"](spark, sf_dir).collect()
    assert [r["flag"] for r in rows] == flags
    for r in rows:
        assert r["f_cnt"] == c.get((r["flag"], "F"), 0), r
        assert r["o_cnt"] == c.get((r["flag"], "O"), 0), r


def test_bitmap_distinct_vs_python_sets(spark, sf_dir):
    """The RoaringBitmap-style partial-agg distinct count must be EXACT —
    ≡ per-group Python sets (it claims exactness, unlike the HLL key)."""
    ev = _read(sf_dir, "events")
    seen: dict[str, set] = defaultdict(set)
    for t, u in zip(ev["event_type"], ev["user_id"]):
        seen[t].add(u)
    rows = QUERIES["agg_bitmap_distinct"](spark, sf_dir).collect()
    assert {r["event_type"]: r["n_users"] for r in rows} == {
        t: len(s) for t, s in seen.items()
    }


def test_k_anonymity_vs_python_counter(spark, sf_dir):
    """Equivalence-class sizes and the k=5 at-risk flag ≡ a Counter over
    the quasi-identifier tuples."""
    d = _read(sf_dir, "documents")
    c = Counter(zip(d["lang"], d["source"]))
    rows = QUERIES["privacy_k_anonymity"](spark, sf_dir).collect()
    assert len(rows) == len(c)
    for r in rows:
        n = c[(r["lang"], r["source"])]
        assert r["n_rows"] == n, r
        assert r["at_risk"] == (1 if n < 5 else 0), r


def test_dp_count_vs_python_inverse_cdf(spark, sf_dir):
    """The deterministic Laplace draw (md5 inverse-CDF, ε=1) recomputed
    with hashlib + math: same uniform, same noise, same clamped release."""
    d = _read(sf_dir, "documents")
    c = Counter(zip(d["lang"], d["source"]))
    rows = QUERIES["privacy_dp_count"](spark, sf_dir).collect()
    assert len(rows) == len(c)
    for r in rows:
        true_n = c[(r["lang"], r["source"])]
        assert r["true_n"] == true_n, r
        u = (
            int(
                hashlib.md5(f"{r['lang']}|{r['source']}".encode()).hexdigest()[:6],
                16,
            )
            / 16777216.0
        )
        cc = u - 0.5
        noise = (
            -1.0 * math.copysign(1.0, cc) * math.log(max(1e-12, 1 - 2 * abs(cc)))
            if cc != 0
            else 0.0
        )
        assert abs(r["noise"] - noise) < 1.5e-6, (r, noise)
        dp_n = max(0, math.floor(true_n + noise + 0.5))
        assert r["dp_n"] == dp_n, (r, dp_n)


def _lttb_reference(ev: pd.DataFrame, buckets: int = 20):
    """From-scratch LTTB-mean: per series, ntile buckets over the
    (ts, event_id) total order, neighbor-bucket mean anchors, max-area
    pick (edge buckets keep their first point)."""
    picked = {}
    for etype, g in ev.groupby("event_type"):
        pts = sorted(
            zip(g["ts"], g["event_id"], g["value"]), key=lambda p: (p[0], p[1])
        )
        n = len(pts)
        # ntile: first (n % buckets) buckets get ceil(n/buckets) rows
        base, rem = divmod(n, buckets)
        bkt_of = []
        for b in range(1, buckets + 1):
            bkt_of.extend([b] * (base + (1 if b <= rem else 0)))
        mx: dict[int, float] = {}
        my: dict[int, float] = {}
        cnt: dict[int, int] = Counter(bkt_of)
        sx: dict[int, float] = defaultdict(float)
        sy: dict[int, float] = defaultdict(float)
        for i, (b, p) in enumerate(zip(bkt_of, pts)):
            sx[b] += i + 1.0
            sy[b] += p[2]
        for b in cnt:
            mx[b], my[b] = sx[b] / cnt[b], sy[b] / cnt[b]
        per_bucket: dict[int, list] = defaultdict(list)
        for i, (b, p) in enumerate(zip(bkt_of, pts)):
            if b == 1 or b == buckets:
                area = None
            else:
                px, py, nx, ny = mx[b - 1], my[b - 1], mx[b + 1], my[b + 1]
                x = i + 1.0
                area = abs((px - nx) * (p[2] - py) - (px - x) * (ny - py)) / 2.0
            per_bucket[b].append((p, area))
        for b, cands in per_bucket.items():
            best = min(
                cands,
                key=lambda pa: (
                    -(pa[1] if pa[1] is not None else float("-inf")),
                    pa[0][0],
                    pa[0][1],
                ),
            )
            picked[(etype, b)] = best
    return picked


def test_lttb_picks_vs_python_reference(spark, sf_dir):
    """The per-bucket picked point (and its triangle area) ≡ the
    from-scratch Python LTTB-mean on the same total order."""
    ref = _lttb_reference(_read(sf_dir, "events"))
    rows = QUERIES["ts_downsample_lttb"](spark, sf_dir).collect()
    assert len(rows) == len(ref)
    for r in rows:
        (pt, area) = ref[(r["event_type"], r["bkt"])]
        assert r["event_id"] == pt[1], (r, pt)
        want = -1.0 if area is None else area
        assert abs(r["area"] - want) < 2e-6, (r, want)


def test_hypertable_rollup_vs_python_walk(spark, sf_dir):
    """All three rollup levels (hour cell, daily, grand total) recomputed
    from one Python pass; grouping_id levels 0/1/3 must each match."""
    ev = _read(sf_dir, "events")
    cell: dict[tuple, list] = defaultdict(lambda: [0, 0.0])
    for ts, v in zip(ev["ts"], ev["value"]):
        day = str(ts.date())
        # the op casts per-row values to decimal(18,4) before summing
        v4 = round(v, 4)
        for key in ((0, day, ts.hour), (1, day, None), (3, None, None)):
            cell[key][0] += 1
            cell[key][1] += v4
    rows = QUERIES["ts_hypertable_rollup"](spark, sf_dir).collect()
    assert len(rows) == len(cell)
    for r in rows:
        n, s = cell[(r["lvl"], r["day"], r["hod"])]
        assert r["n_events"] == n, r
        assert abs(r["sum_value"] - s) < 1e-6 * max(1.0, abs(s)), (r, s)


def test_incremental_join_maintenance_vs_python_join(spark, sf_dir):
    """The three-term delta-join identity's re-aggregated union ≡ a plain
    Python hash join of the full relations (every (o, l) key pair counted
    exactly once across the four terms)."""
    o = _read(sf_dir, "orders")
    li = _read(sf_dir, "lineitem")
    price = dict(zip(o["o_orderkey"], o["o_totalprice"]))
    n_pairs, sum_o, sum_l = 0, 0.0, 0.0
    for k, ep in zip(li["l_orderkey"], li["l_extendedprice"]):
        if k in price:
            n_pairs += 1
            sum_o += round(price[k], 2)
            sum_l += round(ep, 2)
    row = QUERIES["incremental_join_maintenance"](spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n_pairs
    assert abs(row["sum_o"] - sum_o) < 1e-6 * max(1.0, abs(sum_o)), (row, sum_o)
    assert abs(row["sum_l"] - sum_l) < 1e-6 * max(1.0, abs(sum_l)), (row, sum_l)


def _bigram_model(docs: pd.DataFrame):
    """Add-k (k=0.5) bigram LM trained on the corpus itself."""
    vocab = set()
    pairs_per_doc: dict[int, list] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue
        ws = _tokens(text.lower())
        vocab.update(ws)
        if len(ws) >= 2:
            pairs_per_doc[doc_id] = list(zip(ws[:-1], ws[1:]))
    cnt = Counter(p for ps in pairs_per_doc.values() for p in ps)
    ctx = Counter()
    for (w1, _w2), n in cnt.items():
        ctx[w1] += n
    V = len(vocab)
    lp = {p: math.log((n + 0.5) / (ctx[p[0]] + 0.5 * V)) for p, n in cnt.items()}
    return pairs_per_doc, lp


def test_perplexity_vs_python_bigram_lm(spark, sf_dir):
    """Per-doc bigram NLL and perplexity ≡ the from-scratch Python LM
    (same smoothing, same in-corpus training set)."""
    pairs_per_doc, lp = _bigram_model(_read(sf_dir, "documents"))
    rows = QUERIES["lm_perplexity_score"](spark, sf_dir).collect()
    assert len(rows) == len(pairs_per_doc)
    for r in rows:
        ps = pairs_per_doc[r["doc_id"]]
        assert r["n_bigrams"] == len(ps), r
        nll = -sum(lp[p] for p in ps) / len(ps)
        assert abs(r["avg_nll"] - nll) < 2e-6, (r, nll)
        assert abs(r["ppl"] - math.exp(round(nll, 6))) < 2e-4 * max(
            1.0, r["ppl"]
        ), r


def test_unigram_surprisal_vs_python_counter(spark, sf_dir):
    """The 50 most-surprising docs: per-doc token counts exact, mean
    surprisal within float tolerance, and every returned doc must rank
    in the Python reference's top 52 (2 slots of rounding slack at the
    cut line)."""
    docs = _read(sf_dir, "documents")
    toks = {d: _tokens(t) for d, t in zip(docs["doc_id"], docs["text"])}
    freq = Counter(w for ws in toks.values() for w in ws)
    total = sum(freq.values())
    avg = {
        d: sum(-math.log(freq[w] / total) for w in ws) / len(ws)
        for d, ws in toks.items()
        if ws
    }
    ranked = sorted(avg, key=lambda d: (-round(avg[d], 6), d))
    pos = {d: i for i, d in enumerate(ranked)}
    rows = QUERIES["text_unigram_logprob"](spark, sf_dir).collect()
    assert len(rows) == 50
    last = float("inf")
    for r in rows:
        d = r["doc_id"]
        assert r["n_tokens"] == len(toks[d]), r
        assert abs(r["avg_neg_logprob"] - avg[d]) < 2e-6, (r, avg[d])
        assert r["avg_neg_logprob"] <= last + 1e-9  # non-increasing
        last = r["avg_neg_logprob"]
        assert pos[d] < 52, (d, pos[d])
