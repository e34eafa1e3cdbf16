"""Differential fuzz of the round-11b pipeline-mechanics operators
against independent pure-Python restatements (the test_url_fuzz /
test_random_differential pattern): hypothesis generates tiny randomized
corpora written to a fresh tmp sf_dir per example, the REGISTERED
operator runs on it, and a from-scratch Python walk recomputes the
answer.  Any drift between the Spark formulation and the plain
restatement fails on a concrete corpus.

These harden the five driver-oracled r11b keys beyond the fixed-corpus
hash check: the fixed tables can't reach empty strata, all-equal
values, exact-quantile-boundary ties, or single-row partitions."""

from __future__ import annotations

import hashlib
import math

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

# io.load memoizes the DataFrame handle per (sf_dir, table): every example
# gets a fresh directory so a rewritten file never hides behind a stale handle
_dir_seq = [0]


def _fresh(tmp_path_factory, tag):
    _dir_seq[0] += 1
    return tmp_path_factory.mktemp(f"{tag}{_dir_seq[0]}")


# --- global_row_index: offset arithmetic vs plain enumerate -----------------

_li_keys = st.sets(
    st.tuples(
        st.integers(min_value=0, max_value=400),  # l_orderkey
        st.integers(min_value=1, max_value=7),    # l_linenumber
    ),
    min_size=0,
    max_size=130,  # >97 so the thinning keeps >1 sampled index sometimes
)


@given(keys=_li_keys)
@settings(**_SETTINGS)
def test_random_global_row_index_vs_enumerate(spark, tmp_path_factory, keys):
    """Range-partition → per-partition offset → local window must equal a
    single-process enumerate of the sorted key list, including partition
    boundaries that land between duplicate orderkeys (same l_orderkey
    split across ranges only by l_linenumber)."""
    rows = sorted(keys)
    d = _fresh(tmp_path_factory, "gri")
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
        }),
        str(d / "lineitem.parquet"),
    )
    got = [
        (r.global_idx, r.l_orderkey, r.l_linenumber)
        for r in QUERIES["global_row_index"](spark, str(d)).collect()
    ]
    want = [
        (i, ok, ln) for i, (ok, ln) in enumerate(rows) if i % 97 == 0
    ]
    assert got == want, f"n={len(rows)}"


# --- quantile_bin_assign: boundary interpolation + assignment rule ----------

_qty = st.lists(
    st.integers(min_value=1, max_value=50).map(float),
    min_size=1,
    max_size=60,
)


@given(vals=_qty)
@settings(**_SETTINGS)
def test_random_quantile_bins_vs_python(spark, tmp_path_factory, vals):
    """Exact-percentile boundaries + strict-greater assignment vs a pure
    Python (n-1)q linear interpolation walk.  Small integer domains make
    boundary TIES (value == quantile) common — the case that decides
    whether the rule is > or >=."""
    d = _fresh(tmp_path_factory, "qb")
    pq.write_table(
        pa.table({"l_quantity": pa.array(vals, pa.float64())}),
        str(d / "lineitem.parquet"),
    )
    got = {
        r.bin: (r.n_rows, r.min_v, r.max_v)
        for r in QUERIES["quantile_bin_assign"](spark, str(d)).collect()
    }

    s = sorted(vals)
    n = len(s)

    def q_cont(q):
        pos = (n - 1) * q
        lo = int(math.floor(pos))
        hi = min(lo + 1, n - 1)
        return round(s[lo] + (pos - lo) * (s[hi] - s[lo]), 6)

    bounds = [q_cont(i / 10.0) for i in range(1, 10)]
    want: dict[int, list] = {}
    for v in vals:
        b = sum(1 for t in bounds if v > t)
        ent = want.setdefault(b, [0, v, v])
        ent[0] += 1
        ent[1] = min(ent[1], v)
        ent[2] = max(ent[2], v)
    assert got == {b: tuple(e) for b, e in want.items()}, f"bounds={bounds}"


# --- corr_matrix: streaming co-moments vs the direct Pearson formula --------

_corr_rows = st.lists(
    st.tuples(
        *[
            st.integers(min_value=-8, max_value=8).map(lambda i: i * 0.25)
            for _ in range(4)
        ]
    ),
    min_size=2,
    max_size=40,
)


@given(rows=_corr_rows)
@settings(**_SETTINGS)
def test_random_corr_matrix_vs_python(spark, tmp_path_factory, rows):
    """Spark's partition-merged co-moment corr vs the direct two-pass
    Pearson formula; constant columns (zero variance) must yield NULL on
    the Spark side and None in the reference — not 0, not NaN."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    d = _fresh(tmp_path_factory, "cm")
    pq.write_table(
        pa.table({
            c: pa.array([r[i] for r in rows], pa.float64())
            for i, c in enumerate(cols)
        }),
        str(d / "lineitem.parquet"),
    )
    got = {
        (r.var_x, r.var_y): r.corr_xy
        for r in QUERIES["corr_matrix"](spark, str(d)).collect()
    }

    def pearson(xs, ys):
        nn = len(xs)
        mx, my = sum(xs) / nn, sum(ys) / nn
        sxx = sum((x - mx) ** 2 for x in xs)
        syy = sum((y - my) ** 2 for y in ys)
        sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        if sxx == 0 or syy == 0:
            return None
        return sxy / math.sqrt(sxx * syy)

    assert set(got) == {
        (x, y) for i, x in enumerate(cols) for y in cols[i + 1 :]
    }
    for (cx, cy), g in got.items():
        xs = [r[cols.index(cx)] for r in rows]
        ys = [r[cols.index(cy)] for r in rows]
        w = pearson(xs, ys)
        if w is None:
            assert g is None, (cx, cy, g)
        else:
            assert g is not None and abs(g - w) <= 2e-6, (cx, cy, g, w)


# --- ngram_pmi: MLE denominators + support cut vs a token walk --------------

_VOCAB = ["aa", "bb", "cc", "dd"]

_docs = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=6).map(" ".join),
    min_size=1,
    max_size=40,
)


@given(texts=_docs)
@settings(**_SETTINGS)
def test_random_ngram_pmi_vs_python(spark, tmp_path_factory, texts):
    """PMI selection and scores vs a pure-Python bigram walk.  A 4-word
    vocabulary caps bigram types at 16, so LIMIT 20 never truncates and
    the comparison is the FULL surviving set; empty docs and one-token
    docs exercise the len>=2 guard."""
    d = _fresh(tmp_path_factory, "pmi")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    got = [
        (r.w1, r.w2, r.c_xy, r.pmi)
        for r in QUERIES["ngram_pmi"](spark, str(d)).collect()
    ]

    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    bt = 0
    for t in texts:
        ws = [w for w in t.split(" ") if w]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            bt += 1
    tot = sum(uni.values())
    want = sorted(
        (
            (
                w1,
                w2,
                c,
                round(
                    math.log(
                        (c / bt) / ((uni[w1] / tot) * (uni[w2] / tot))
                    ),
                    6,
                ),
            )
            for (w1, w2), c in big.items()
            if c >= 5
        ),
        key=lambda r: (-r[3], r[0], r[1]),
    )
    # scores compare with ulp slack (ln rounding may differ in the last
    # fuzz digit); selection, counts and ORDER compare exactly
    assert [(r[0], r[1], r[2]) for r in got] == [
        (r[0], r[1], r[2]) for r in want
    ], f"texts={texts!r}"
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) <= 2e-6, (g, w)


# --- kfold_stratified: md5 deal order vs hashlib ---------------------------

_kdocs = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr"]),
        st.sampled_from(["x", "y", "zz", "ww q", ""]),  # dup texts → md5 ties
        st.integers(min_value=0, max_value=500),
    ),
    min_size=0,
    max_size=45,
)


@given(rows=_kdocs)
@settings(**_SETTINGS)
def test_random_kfold_vs_python(spark, tmp_path_factory, rows):
    """Fold assignment vs a hashlib.md5 walk: duplicate texts force the
    doc_id tiebreak, tiny strata (< k docs) exercise the partial-deal
    case, and per-(lang,fold) sums must match exactly."""
    d = _fresh(tmp_path_factory, "kf")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "source": pa.array(["s"] * len(rows), pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }),
        str(d / "documents.parquet"),
    )
    got = {
        (r.lang, r.fold): (r.n_docs, r.sum_chars)
        for r in QUERIES["kfold_stratified"](spark, str(d)).collect()
    }

    by_lang: dict[str, list[tuple[str, int, int]]] = {}
    for i, (lang, text, nc) in enumerate(rows):
        by_lang.setdefault(lang, []).append(
            (hashlib.md5(text.encode()).hexdigest(), i, nc)
        )
    want: dict[tuple[str, int], list[int]] = {}
    for lang, docs in by_lang.items():
        for rk, (_, _, nc) in enumerate(sorted(docs)):
            ent = want.setdefault((lang, rk % 5), [0, 0])
            ent[0] += 1
            ent[1] += nc
    assert got == {k: tuple(v) for k, v in want.items()}, f"rows={rows!r}"
