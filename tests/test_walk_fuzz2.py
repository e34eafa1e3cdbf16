"""Walk-fuzz batch 2: `fuzzy_match_levenshtein`, `skyline_pareto`,
`ks_test_drift`, `basket_pairs` — each vs an independent pure-Python
restatement on randomized tmp corpora (continues test_seq_ts_fuzz).

Contract note (fuzzy_match_levenshtein): the blocking key is the 2nd
name token; on a SINGLE-token name Spark's ``split().getItem(1)`` is
NULL (never joins) while DuckDB's ``split_part(...,2)`` is '' (joins
other one-token names) — the generators below emit two-token names
only, matching the parts corpus this operator is declared over."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdatawork_spark.registry import QUERIES

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_dir_seq = [0]


def _fresh(tmp_path_factory, tag):
    _dir_seq[0] += 1
    return tmp_path_factory.mktemp(f"{tag}{_dir_seq[0]}")


# --- fuzzy_match_levenshtein ------------------------------------------------

_ADJ = ["red", "reed", "rd", "blue", "blu", "green", "grean", "pink"]
_NOUN = ["widget", "gadget", "sprocket"]

_names = st.sets(
    st.tuples(st.sampled_from(_ADJ), st.sampled_from(_NOUN)).map(
        lambda t: f"{t[0]} {t[1]}"
    ),
    min_size=0,
    max_size=20,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@given(names=_names)
@settings(**_SETTINGS)
def test_random_fuzzy_match_vs_dp_walk(spark, tmp_path_factory, names):
    """Blocked edit-distance matching vs a DP walk: blocking on the 2nd
    token means cross-noun near-misses must NOT pair however close, and
    the <=4 cut is checked on adjective pools built to straddle it."""
    d = _fresh(tmp_path_factory, "fz")
    ns = sorted(names)
    pq.write_table(
        pa.table({"p_name": pa.array(ns, pa.string())}),
        str(d / "part.parquet"),
    )
    got = {
        (r.name_a, r.name_b): r.dist
        for r in QUERIES["fuzzy_match_levenshtein"](spark, str(d)).collect()
    }
    want = {}
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            if a.split(" ")[1] == b.split(" ")[1]:
                dd = _lev(a, b)
                if dd <= 4:
                    want[(a, b)] = dd
    assert got == want, f"names={ns!r}"


# --- skyline_pareto ---------------------------------------------------------

_parts = st.lists(
    st.tuples(
        st.sampled_from(["b1", "b2", "b3"]),          # p_brand
        st.sampled_from(["t1", "t2"]),                # p_type
        st.integers(min_value=100, max_value=500),    # price cents
        st.integers(min_value=1, max_value=10),       # size
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_parts)
@settings(**_SETTINGS)
def test_random_skyline_vs_dominance_walk(spark, tmp_path_factory, rows):
    """Pareto skyline vs brute-force dominance on EXACT group averages:
    the small integer domains make equal-price / equal-size group pairs
    routine, which is where <= vs < dominance drift shows."""
    d = _fresh(tmp_path_factory, "sk")
    pq.write_table(
        pa.table({
            "p_brand": pa.array([r[0] for r in rows], pa.string()),
            "p_type": pa.array([r[1] for r in rows], pa.string()),
            "p_retailprice": pa.array([r[2] / 100.0 for r in rows], pa.float64()),
            "p_size": pa.array([r[3] for r in rows], pa.int64()),
        }),
        str(d / "part.parquet"),
    )
    got = {
        (r.p_brand, r.p_type): (r.avg_price, r.avg_size, r.n_parts)
        for r in QUERIES["skyline_pareto"](spark, str(d)).collect()
    }
    agg: dict[tuple[str, str], list[int]] = {}
    for b, t, c, s in rows:
        ent = agg.setdefault((b, t), [0, 0, 0])
        ent[0] += c
        ent[1] += s
        ent[2] += 1
    stats = {
        k: ((c / 100) / n, s / n, n) for k, (c, s, n) in agg.items()
    }
    want = {}
    for k, (p, s, n) in stats.items():
        dominated = any(
            bp <= p and bs >= s and (bp < p or bs > s)
            for kk, (bp, bs, _) in stats.items()
            if kk != k
        )
        if not dominated:
            want[k] = (round(p, 6), round(s, 6), n)
    assert set(got) == set(want), f"rows={rows!r}"
    for k, (p, s, n) in want.items():
        gp, gs, gn = got[k]
        assert gn == n
        assert abs(gp - p) <= 1.1e-6 and abs(gs - s) <= 1.1e-6, (k, got[k], want[k])


# --- ks_test_drift ----------------------------------------------------------

_chars = st.lists(
    st.integers(min_value=1, max_value=12), min_size=2, max_size=40
)


@given(ncs=_chars)
@settings(**_SETTINGS)
def test_random_ks_drift_vs_ecdf_walk(spark, tmp_path_factory, ncs):
    """Two-sample KS vs an explicit merged-grid ECDF walk, including the
    alpha=0.05 critical value and the strict rejection rule."""
    d = _fresh(tmp_path_factory, "ks")
    n = len(ncs)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x" * c for c in ncs], pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array(ncs, pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    row = QUERIES["ks_test_drift"](spark, str(d)).collect()[0]
    a = sorted(ncs[0::2])
    b = sorted(ncs[1::2])
    na, nb = len(a), len(b)
    ks = 0.0
    for v in sorted(set(a) | set(b)):
        fa = sum(1 for x in a if x <= v) / na
        fb = sum(1 for x in b if x <= v) / nb
        ks = max(ks, abs(fa - fb))
    crit = 1.358 * ((na + nb) / (na * nb)) ** 0.5
    assert (row.n_a, row.n_b) == (na, nb), ncs
    assert abs(row.ks_stat - ks) <= 1.1e-6, (row.ks_stat, ks)
    assert abs(row.ks_crit - crit) <= 1.1e-6, (row.ks_crit, crit)
    assert row.drifted == (1 if ks > crit else 0), ncs


# --- basket_pairs -----------------------------------------------------------

_baskets = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),   # l_orderkey
        st.integers(min_value=1, max_value=8),   # l_partkey
    ),
    min_size=0,
    max_size=40,
)


@given(items=_baskets)
@settings(**_SETTINGS)
def test_random_basket_pairs_vs_itertools_walk(spark, tmp_path_factory, items):
    """Co-occurrence pairs vs an itertools walk: duplicate (order, part)
    lines must collapse BEFORE pairing, and the >=2 support cut and
    a<b orientation are recomputed independently."""
    import itertools

    d = _fresh(tmp_path_factory, "bk")
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([i[0] for i in items], pa.int64()),
            "l_partkey": pa.array([i[1] for i in items], pa.int64()),
        }),
        str(d / "lineitem.parquet"),
    )
    got = {
        (r.part_a, r.part_b): r.n_orders
        for r in QUERIES["basket_pairs"](spark, str(d)).collect()
    }
    orders: dict[int, set[int]] = {}
    for o, p in set(items):
        orders.setdefault(o, set()).add(p)
    counts: dict[tuple[int, int], int] = {}
    for parts in orders.values():
        for a, b in itertools.combinations(sorted(parts), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = {k: v for k, v in counts.items() if v >= 2}
    assert got == want, f"items={items!r}"


# --- bm25_rank ---------------------------------------------------------------

_BM_VOCAB = ["join", "merge", "scan", "the", "fast", "slow", "table"]

_bm_docs = st.lists(
    st.lists(st.sampled_from(_BM_VOCAB), min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=18,  # < 20 so the top-20 cut never truncates
)


@given(texts=_bm_docs)
@settings(**_SETTINGS)
def test_random_bm25_vs_formula_walk(spark, tmp_path_factory, texts):
    """BM25 scores vs a from-scratch formula walk (k1=1.2, b=0.75,
    idf=ln(1+(N-df+.5)/(df+.5)), mean-length normalization): df/avglen
    bookkeeping drifts easily.  Rank order is checked for
    self-consistency against the returned scores (round-6 ties make
    cross-implementation rank order legitimately ambiguous)."""
    import math

    d = _fresh(tmp_path_factory, "bm")
    n = len(texts)
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    rows = QUERIES["bm25_rank"](spark, str(d)).collect()
    got = {r.doc_id: r.score for r in rows}

    toks = {i: [w for w in t.split(" ") if w] for i, t in enumerate(texts)}
    avglen = sum(len(ws) for ws in toks.values()) / n
    terms = ("join", "merge", "scan")
    df = {
        t: sum(1 for ws in toks.values() if t in ws) for t in terms
    }
    want = {}
    for i, ws in toks.items():
        score = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += (
                idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avglen))
            )
        if score > 0:
            want[i] = round(score, 6)
    assert set(got) == set(want), f"texts={texts!r}"
    for i, sc in want.items():
        assert abs(got[i] - sc) <= 2.1e-6, (i, got[i], sc)
    # rank column must be the (score desc, doc_id) rank of the returned rows
    expect_rn = {
        r[0]: k + 1
        for k, r in enumerate(
            sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    assert {r.doc_id: r.rn for r in rows} == expect_rn


# --- ts_period_over_period ---------------------------------------------------

_days = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),      # day offset
        st.sampled_from(["click", "view"]),
        st.integers(min_value=1, max_value=2000),   # cents (nonzero days)
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_days)
@settings(**_SETTINGS)
def test_random_period_over_period_vs_walk(spark, tmp_path_factory, rows):
    """Daily lag deltas vs a walk: missing days make lag jump across
    gaps (it is a ROW lag over present days, not a calendar lag), and
    the first present day NULLs both deltas."""
    import datetime

    d = _fresh(tmp_path_factory, "pp")
    base = datetime.datetime(2024, 3, 1)
    evs = [
        (i, 1, base + datetime.timedelta(days=dd, minutes=i % 60), et, c / 100.0)
        for i, (dd, et, c) in enumerate(rows)
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array([e[0] for e in evs], pa.int64()),
            "ts": pa.array([e[2] for e in evs], pa.timestamp("us")),
            "user_id": pa.array([e[1] for e in evs], pa.int64()),
            "event_type": pa.array([e[3] for e in evs], pa.string()),
            "value": pa.array([e[4] for e in evs], pa.float64()),
            "props": pa.array(["{}"] * len(evs), pa.string()),
        }),
        str(d / "events.parquet"),
    )
    got = {
        (r.event_type, r.day): (r.revenue, r.abs_change, r.pct_change)
        for r in QUERIES["ts_period_over_period"](spark, str(d)).collect()
    }
    daily: dict[tuple[str, str], int] = {}
    for _, _, ts, et, v in evs:
        k = (et, str(ts.date()))
        daily[k] = daily.get(k, 0) + round(v * 100)
    want = {}
    by_type: dict[str, list[str]] = {}
    for et, day in sorted(daily):
        by_type.setdefault(et, []).append(day)
    for et, days in by_type.items():
        prev = None
        for day in days:
            rev = daily[(et, day)] / 100.0
            if prev is None:
                want[(et, day)] = (rev, None, None)
            else:
                want[(et, day)] = (
                    rev,
                    round(rev - prev, 6),
                    round((rev - prev) / prev * 100.0, 6),
                )
            prev = rev
    assert set(got) == set(want), f"rows={rows!r}"
    for k, (rev, ac, pc) in want.items():
        grev, gac, gpc = got[k]
        assert abs(grev - rev) <= 1e-9, (k, grev, rev)
        for g, w in ((gac, ac), (gpc, pc)):
            if w is None:
                assert g is None, (k, g)
            else:
                assert g is not None and abs(g - w) <= 2.1e-6, (k, g, w)


# --- stats_winsorized ----------------------------------------------------------

_win_vals = st.lists(
    st.tuples(
        st.sampled_from(["click", "view"]),
        st.integers(min_value=-500, max_value=5000),  # cents incl. outliers
    ),
    min_size=1,
    max_size=40,
)


@given(rows=_win_vals)
@settings(**_SETTINGS)
def test_random_winsorized_mean_vs_walk(spark, tmp_path_factory, rows):
    """Winsorized mean vs a walk with explicit (n-1)q percentile
    interpolation and HALF_UP 4dp clipping (the decimal cast inside the
    sum): tiny groups make P1/P99 land BETWEEN points, exercising the
    interpolation on both sides."""
    import datetime
    from decimal import ROUND_HALF_UP, Decimal

    d = _fresh(tmp_path_factory, "wz")
    base = datetime.datetime(2024, 3, 1)
    evs = [
        (i, 1, base + datetime.timedelta(minutes=i), et, c / 100.0)
        for i, (et, c) in enumerate(rows)
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array([e[0] for e in evs], pa.int64()),
            "ts": pa.array([e[2] for e in evs], pa.timestamp("us")),
            "user_id": pa.array([e[1] for e in evs], pa.int64()),
            "event_type": pa.array([e[3] for e in evs], pa.string()),
            "value": pa.array([e[4] for e in evs], pa.float64()),
            "props": pa.array(["{}"] * len(evs), pa.string()),
        }),
        str(d / "events.parquet"),
    )
    got = {
        r.event_type: (r.n_events, r.winsorized_mean)
        for r in QUERIES["stats_winsorized"](spark, str(d)).collect()
    }

    def q_cont(s, q):
        import math
        pos = (len(s) - 1) * q
        lo = int(math.floor(pos))
        hi = min(lo + 1, len(s) - 1)
        return s[lo] + (pos - lo) * (s[hi] - s[lo])

    by_type: dict[str, list[float]] = {}
    for _, _, _, et, v in evs:
        by_type.setdefault(et, []).append(v)
    want = {}
    for et, vals in by_type.items():
        s = sorted(vals)
        p1, p99 = q_cont(s, 0.01), q_cont(s, 0.99)
        total = sum(
            Decimal(repr(min(max(v, p1), p99))).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
            for v in vals
        )
        want[et] = (len(vals), round(float(total) / len(vals), 6))
    assert set(got) == set(want), f"rows={rows!r}"
    for et, (n, m) in want.items():
        gn, gm = got[et]
        assert gn == n, (et, rows)
        assert abs(gm - m) <= 2.1e-6, (et, gm, m)


# --- sequence / bin packing ---------------------------------------------------

_pack_docs = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2"]),
        st.integers(min_value=0, max_value=1200),  # words per doc
    ),
    min_size=1,
    max_size=12,
)


def _write_pack_docs(tmp_path_factory, rows):
    d = _fresh(tmp_path_factory, "pk")
    texts = [" ".join(["w"] * n) for _, n in rows]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[0] for r in rows], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    return str(d)


@given(rows=_pack_docs)
@settings(**_SETTINGS)
def test_random_packing_vs_running_sum_walk(spark, tmp_path_factory, rows):
    """Both packing layouts vs one running-sum walk.  The two ops count
    tokens DIFFERENTLY by contract — pack_sequences counts raw split
    fields (an empty text is ONE empty token: split('') = ['']),
    pack_bins_greedy filters empties (an empty text is zero tokens) —
    and a bin is determined by tokens accumulated BEFORE the document
    (sum-minus-self), so a budget-straddling doc belongs to the bin it
    STARTED in.  Zero-length and giant (multi-bin) docs are generated
    on purpose."""
    d = _write_pack_docs(tmp_path_factory, rows)

    def walk(budget, raw):
        agg: dict[tuple[str, int], list[int]] = {}
        per_src: dict[str, int] = {}
        for src, n in rows:  # doc_id order == list order
            n_tok = max(n, 1) if raw else n  # split('') -> [''] counts 1
            before = per_src.get(src, 0)
            b = before // budget
            per_src[src] = before + n_tok
            ent = agg.setdefault((src, b), [0, 0])
            ent[0] += 1
            ent[1] += n_tok
        return agg

    got_seq = {
        (r.source, r.bin_id): (r.n_docs, r.n_tokens)
        for r in QUERIES["pack_sequences"](spark, d).collect()
    }
    assert got_seq == {
        k: tuple(v) for k, v in walk(512, raw=True).items()
    }, f"rows={rows!r}"

    got_bins = {
        (r.source, r.bin): (r.n_docs, r.n_tokens, r.fill_ratio)
        for r in QUERIES["pack_bins_greedy"](spark, d).collect()
    }
    want = {
        k: (nd, nt, round(nt / 2048, 6))
        for k, (nd, nt) in walk(2048, raw=False).items()
    }
    assert set(got_bins) == set(want), f"rows={rows!r}"
    for k, (nd, nt, fr) in want.items():
        gnd, gnt, gfr = got_bins[k]
        assert (gnd, gnt) == (nd, nt), (k, rows)
        assert abs(gfr - fr) <= 1.1e-6, (k, gfr, fr)
