"""The thirteen round-6 operators (formerly operators/staged_r06.py;
folded into their domain modules in r15 — VERDICT r14 item 5): oracled
keys run the same DuckDB differential as test_differential, rows-only
keys carry engine-side equivalence/invariant tests (the SURVEY §2
rows-only convention).  The STAGED_* dicts below are reconstructed from
the live registry over the historical key list, so every pre-fold check
still runs verbatim."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from bigdatawork_spark.operators.stats_ops import _LTTB_BUCKETS
from bigdatawork_spark.operators.training_ops import _KCENTER_K
from bigdatawork_spark.registry import ORACLES, QUERIES

_R06_KEYS = [
    "coreset_sample_kcenter", "dedup_containment", "dedup_ladder",
    "dedup_ladder_exact_stage", "dsir_importance_resample",
    "embedding_pca_gram", "knn_classify_ivf", "privacy_dp_count",
    "semdedup_prune", "table_format_vacuum", "ts_downsample_lttb",
    "ts_seasonal_decompose", "win_rolling_median",
]
STAGED_QUERIES = {k: QUERIES[k] for k in _R06_KEYS}
STAGED_ORACLES = {k: ORACLES[k] for k in _R06_KEYS if k in ORACLES}

from .compare import assert_frames_match


# ADVICE r15: STAGED_* is rebuilt from the live registry, so asserting
# `QUERIES[key] is fn` compared the registry to itself (tautological —
# the test no longer caught accidental re-registration).  The drift guard
# is now the documented post-fold HOME of each builder, pinned per key:
# a key silently re-registered from a different module fails here.
_EXPECTED_HOME = {
    "coreset_sample_kcenter": "bigdatawork_spark.operators.training_ops",
    "dedup_containment": "bigdatawork_spark.operators.curation",
    "dedup_ladder": "bigdatawork_spark.operators.curation",
    "dedup_ladder_exact_stage": "bigdatawork_spark.operators.curation",
    "dsir_importance_resample": "bigdatawork_spark.operators.training_ops",
    "embedding_pca_gram": "bigdatawork_spark.operators.training_ops",
    "knn_classify_ivf": "bigdatawork_spark.operators.llm_ops",
    "privacy_dp_count": "bigdatawork_spark.operators.platform_ops",
    "semdedup_prune": "bigdatawork_spark.operators.llm_ops",
    "table_format_vacuum": "bigdatawork_spark.sources.manifest_format",
    "ts_downsample_lttb": "bigdatawork_spark.operators.stats_ops",
    "ts_seasonal_decompose": "bigdatawork_spark.operators.stats_ops",
    "win_rolling_median": "bigdatawork_spark.operators.windows",
}


def test_staged_keys_promoted_verbatim():
    """Post-fold form: every round-6 key is live in the registry, callable,
    registered from its documented post-fold home module, and (where
    declared) carries a non-empty oracle."""
    assert set(_EXPECTED_HOME) == set(STAGED_QUERIES)
    for key, fn in STAGED_QUERIES.items():
        assert callable(fn), key
        assert fn.__module__ == _EXPECTED_HOME[key], (
            key, fn.__module__, _EXPECTED_HOME[key],
        )
        assert getattr(fn, "query_key", None) == key
    assert set(STAGED_ORACLES) <= set(STAGED_QUERIES)
    for key, sql in STAGED_ORACLES.items():
        assert sql.strip(), key


@pytest.mark.parametrize("key", sorted(STAGED_ORACLES))
def test_staged_oracle_match(key, spark, duck, sf_dir):
    """Driver-identical differential for the SQL-expressible staged keys."""
    spark_pd = STAGED_QUERIES[key](spark, sf_dir).toPandas()
    oracle_pd = duck.execute(STAGED_ORACLES[key]).df()
    assert_frames_match(spark_pd, oracle_pd, key)


@pytest.mark.parametrize("key", sorted(set(STAGED_QUERIES) - set(STAGED_ORACLES)))
def test_staged_rows_only_smoke(key, spark, sf_dir):
    df = STAGED_QUERIES[key](spark, sf_dir)
    assert df.count() > 0
    df.limit(5).collect()


# ---------------------------------------------------------------------------
# knn_classify_ivf — independent numpy re-derivation (third implementation)


def test_knn_ivf_matches_numpy_rederivation(spark, sf_dir):
    """The hash-green oracle is co-designed SQL, so re-derive the whole
    IVF-kNN pipeline (⌈√n⌉ first-by-vec_id centroids → max-cos assignment
    → same-list top-5 → majority vote) independently in numpy and demand
    identical predictions.  A vote-agreement threshold against the exact
    twin would be meaningless: this corpus's labels carry no embedding
    structure (exact kNN accuracy ≈ chance), so candidate-set perturbations
    flip votes chaotically — only exact semantic parity is testable."""
    from collections import Counter

    ids, M = _embeddings_matrix(sf_dir)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    lab_by_id = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    lab = np.array([lab_by_id[i] for i in ids])
    n = len(ids)
    n_cent = int(np.ceil(np.sqrt(n)))
    nrm = np.linalg.norm(M, axis=1)
    C = M[:n_cent]  # ids are sorted — first √n by vec_id
    cs = (M @ C.T) / np.outer(nrm, nrm[:n_cent])
    # max cos, tiebreak smaller cid: lexsort on (-cs, cid) per row
    own = np.array(
        [np.lexsort((ids[:n_cent], -cs[i]))[0] for i in range(n)]
    )  # index into centroid block
    preds = {}
    for c in set(own):
        members = np.where(own == c)[0]
        if len(members) < 2:
            continue
        sub = (M[members] @ M[members].T) / np.outer(nrm[members], nrm[members])
        np.fill_diagonal(sub, -np.inf)
        for j, i in enumerate(members):
            order = np.lexsort((ids[members], -sub[j]))
            top = [members[o] for o in order if members[o] != i][:5]
            votes = Counter(lab[top])
            preds[ids[i]] = sorted(
                votes.items(), key=lambda kv: (-kv[1], kv[0])
            )[0][0]

    rows = STAGED_QUERIES["knn_classify_ivf"](spark, sf_dir).collect()
    got = {r["vec_id"]: r["pred_label"] for r in rows}
    assert got == preds
    exact_schema = QUERIES["knn_classify"](spark, sf_dir).schema
    assert [f.name for f in STAGED_QUERIES["knn_classify_ivf"](
        spark, sf_dir
    ).schema.fields] == [f.name for f in exact_schema.fields]


# ---------------------------------------------------------------------------
# dedup_ladder — composition properties


def test_dedup_ladder_structure(spark, duck, sf_dir):
    out = STAGED_QUERIES["dedup_ladder"](spark, sf_dir).collect()
    assert out
    exact = [r for r in out if r["kind"] == "exact"]
    near = [r for r in out if r["kind"] == "near"]

    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents").fetchall()
    )
    reps = {
        r[0]
        for r in duck.execute(
            "SELECT min(doc_id) FROM documents GROUP BY md5(text)"
        ).fetchall()
    }
    group_min = {
        t: m
        for t, m in duck.execute(
            "SELECT text, min(doc_id) FROM documents GROUP BY text"
        ).fetchall()
    }
    for r in exact:
        # exact rows: identical text, keep-side is the group minimum
        assert texts[r["doc_a"]] == texts[r["doc_b"]]
        assert r["doc_a"] == group_min[texts[r["doc_b"]]]
        assert r["doc_a"] < r["doc_b"]
        assert r["jaccard_dist"] == 0.0
    # every non-representative appears exactly once as an exact dup target
    dup_targets = sorted(r["doc_b"] for r in exact)
    expected = sorted(set(texts) - reps)
    assert dup_targets == expected
    for r in near:
        # near rows connect REPRESENTATIVES only, within the LSH threshold
        assert r["doc_a"] in reps and r["doc_b"] in reps
        assert r["doc_a"] < r["doc_b"]
        assert 0.0 <= r["jaccard_dist"] <= 0.2
    assert near, "sf0.01 corpus has near-dups (dedup_near_minhash finds 25)"


def test_dedup_ladder_exact_stage_on_replicated_corpus(spark, tmp_path):
    """sf0.01 has no hash-identical texts (verified against the corpus), so
    the exact stage's collapse logic needs its own fixture: a corpus where
    two texts carry three copies each must yield exactly the four
    (group-min → dup) rows, and the near stage must see only the three
    unique representatives."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (5, "alpha beta gamma delta epsilon zeta"),
        (3, "one two three four five six seven"),
        (4, "one two three four five six seven"),
        (9, "totally different text with unique words here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = STAGED_QUERIES["dedup_ladder"](spark, str(tmp_path)).collect()
    exact = sorted(
        (r["doc_a"], r["doc_b"]) for r in out if r["kind"] == "exact"
    )
    assert exact == [(1, 2), (1, 5), (3, 4)]
    near_ids = {
        i for r in out if r["kind"] == "near" for i in (r["doc_a"], r["doc_b"])
    }
    # representatives are 1, 3, 9 — no dup member may reach the LSH stage
    assert near_ids <= {1, 3, 9}


# ---------------------------------------------------------------------------
# embedding_pca_gram — against numpy's dense eigensolver


def _embeddings_matrix(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], M[order]


def test_pca_gram_matches_numpy_eigh(spark, sf_dir):
    ids, M = _embeddings_matrix(sf_dir)
    mean = M.mean(axis=0)
    cov = (M - mean).T @ (M - mean) / len(M)
    w, V = np.linalg.eigh(cov)
    top = V[:, -1]
    if top[np.argmax(np.abs(top))] < 0:
        top = -top
    ref_proj = (M - mean) @ top
    ref_ratio = w[-1] / w.sum()

    rows = STAGED_QUERIES["embedding_pca_gram"](spark, sf_dir).collect()
    assert len(rows) == len(ids)
    got = {r["vec_id"]: r["pc1"] for r in rows}
    got_proj = np.array([got[i] for i in ids])
    # both sides eigensolve the same 64x64 covariance; residual is float
    # accumulation order in the distributed Gramian plus the 1e-6 rounding
    assert np.allclose(got_proj, ref_proj, atol=1e-4), (
        np.abs(got_proj - ref_proj).max()
    )
    ratios = {r["explained_var_ratio"] for r in rows}
    assert len(ratios) == 1
    assert abs(next(iter(ratios)) - ref_ratio) < 1e-4


# ---------------------------------------------------------------------------
# coreset_sample_kcenter — greedy invariants


def test_kcenter_invariants(spark, sf_dir):
    rows = STAGED_QUERIES["coreset_sample_kcenter"](spark, sf_dir).collect()
    assert len(rows) == _KCENTER_K
    picks = [r["vec_id"] for r in rows]
    assert len(set(picks)) == _KCENTER_K
    assert rows[0]["pick_order"] == 0
    assert rows[0]["radius_before"] == -1.0  # sentinel for the seed pick

    ids, M = _embeddings_matrix(sf_dir)
    assert picks[0] == ids.min()  # deterministic seed = min vec_id
    radii = [r["radius_before"] for r in rows[1:]]
    assert radii == sorted(radii, reverse=True), radii  # non-increasing

    # each reported radius equals the true farthest-point distance given
    # the previously selected centers (greedy re-derivation in numpy)
    by_id = {int(i): M[j] for j, i in enumerate(ids)}
    centers = [by_id[picks[0]]]
    for r in rows[1:]:
        dists = np.min(
            [np.linalg.norm(M - c, axis=1) for c in centers], axis=0
        )
        far_idx = np.lexsort((ids, -dists))[0]
        assert ids[far_idx] == r["vec_id"]
        assert abs(dists[far_idx] - r["radius_before"]) < 1e-5
        centers.append(by_id[r["vec_id"]])

    # coverage: after all k picks the farthest remaining point is no
    # farther than the last reported radius (greedy monotonicity)
    final = np.min([np.linalg.norm(M - c, axis=1) for c in centers], axis=0)
    assert final.max() <= rows[-1]["radius_before"] + 1e-9


# ---------------------------------------------------------------------------
# ts_downsample_lttb — shape invariants beyond the oracle


def test_lttb_bucket_coverage(spark, duck, sf_dir):
    rows = STAGED_QUERIES["ts_downsample_lttb"](spark, sf_dir).collect()
    series = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(r)
    n_per_type = dict(
        duck.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY event_type"
        ).fetchall()
    )
    assert set(series) == set(n_per_type)
    for et, picked in series.items():
        expect = min(n_per_type[et], _LTTB_BUCKETS)
        assert len(picked) == expect, (et, len(picked))
        assert sorted(p["bkt"] for p in picked) == list(range(1, expect + 1))
        # edge buckets carry the -1 sentinel, interior buckets a real area
        for p in picked:
            if p["bkt"] in (1, expect):
                assert p["area"] == -1.0
            else:
                assert p["area"] >= 0.0
        # first pick is the series head (earliest ts, min event_id tiebreak)
        head = duck.execute(
            "SELECT event_id FROM events WHERE event_type = ? "
            "ORDER BY ts, event_id LIMIT 1",
            [et],
        ).fetchone()[0]
        assert picked[0]["event_id"] == head


# ---------------------------------------------------------------------------
# privacy_dp_count — mechanism properties


def test_dp_count_mechanism(spark, duck, sf_dir):
    rows = STAGED_QUERIES["privacy_dp_count"](spark, sf_dir).collect()
    assert rows
    true = {
        (lang, src): n
        for lang, src, n in duck.execute(
            "SELECT lang, source, COUNT(*) FROM documents GROUP BY 1, 2"
        ).fetchall()
    }
    assert {(r["lang"], r["source"]) for r in rows} == set(true)
    for r in rows:
        assert r["true_n"] == true[(r["lang"], r["source"])]
        assert r["dp_n"] >= 0  # post-processing clamp
        # released = clamp(round(true + noise)): re-derive exactly
        assert r["dp_n"] == max(0, round(r["true_n"] + r["noise"]))
    # the hash-uniform draw must actually vary across keys (both signs)
    noises = [r["noise"] for r in rows]
    assert min(noises) < 0 < max(noises)


# ---------------------------------------------------------------------------
# semdedup_prune — survivor independence + prune validity


def test_semdedup_survivors_are_pairwise_dissimilar(spark, sf_dir):
    """After pruning, no two SURVIVORS in the same cluster may still be
    within the similarity threshold (v survives only if it has no smaller
    near-dup, so for any surviving pair u<v, u is not near v) — and every
    pruned row must name a smaller kept_by within the threshold.  Both
    re-derived in numpy from the raw parquet + the operator's own cluster
    assignment."""
    from bigdatawork_spark.operators.llm_ops import _SEMDEDUP_TAU, _ivf_assign

    rows = STAGED_QUERIES["semdedup_prune"](spark, sf_dir).collect()
    assert rows, "sf0.01 corpus has near-threshold pairs — prune must fire"
    pruned = {r["pruned_id"]: r for r in rows}
    assert len(pruned) == len(rows)  # one decision per pruned vector

    ids, M = _embeddings_matrix(sf_dir)
    nrm = np.linalg.norm(M, axis=1)
    vec = {int(i): M[j] for j, i in enumerate(ids)}
    nrm_by = {int(i): nrm[j] for j, i in enumerate(ids)}

    _, assign = _ivf_assign(spark, sf_dir)
    cid_of = {r["vec_id"]: r["cid"] for r in assign.select("vec_id", "cid").collect()}

    for r in rows:
        assert r["kept_by"] < r["pruned_id"]
        assert cid_of[r["kept_by"]] == cid_of[r["pruned_id"]] == r["cid"]
        cos = float(
            vec[r["pruned_id"]] @ vec[r["kept_by"]]
            / (nrm_by[r["pruned_id"]] * nrm_by[r["kept_by"]])
        )
        assert cos >= _SEMDEDUP_TAU - 1e-9
        assert abs(cos - r["cos_sim"]) < 1e-5

    by_cluster = {}
    for i in ids:
        if int(i) not in pruned:
            by_cluster.setdefault(cid_of[int(i)], []).append(int(i))
    for cid, members in by_cluster.items():
        if len(members) < 2:
            continue
        X = np.array([vec[i] for i in members])
        nn = np.array([nrm_by[i] for i in members])
        S = (X @ X.T) / np.outer(nn, nn)
        np.fill_diagonal(S, -np.inf)
        assert S.max() < _SEMDEDUP_TAU + 1e-9, (cid, S.max())


# ---------------------------------------------------------------------------
# win_rolling_median — frame-bound invariants


def test_rolling_median_within_frame_bounds(spark, sf_dir):
    rows = STAGED_QUERIES["win_rolling_median"](spark, sf_dir).collect()
    assert rows
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, seq in by_user.items():
        vals = [r["value"] for r in seq]
        # first row of each user: frame is just itself
        assert seq[0]["rolling_median"] == seq[0]["value"]
        for i, r in enumerate(seq):
            frame = vals[max(0, i - 4) : i + 1]
            assert min(frame) - 1e-9 <= r["rolling_median"] <= max(frame) + 1e-9


# ---------------------------------------------------------------------------
# dedup_containment — asymmetric semantics


def _shingle_set(text):
    ws = [w for w in text.split(" ") if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_containment_flags_subset_doc(spark, duck, sf_dir):
    rows = STAGED_QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert rows, "sf0.01 has 25 full-containment near-dup pairs (measured)"
    texts = dict(duck.execute("SELECT doc_id, text FROM documents").fetchall())
    for r in rows:
        assert 0.8 <= r["containment"] <= 1.0
        a, b = _shingle_set(texts[r["doc_a"]]), _shingle_set(texts[r["doc_b"]])
        # pure-python re-derivation of the asymmetric metric
        expect = len(a & b) / min(len(a), len(b))
        assert abs(expect - r["containment"]) < 1e-6
        small = r["doc_a"] if len(a) <= len(b) else r["doc_b"]
        assert r["contained_doc"] == small


def test_containment_catches_quote_inclusion(spark, tmp_path):
    """The motivating asymmetry: a short doc fully quoted inside a long one
    must be flagged (containment 1.0) even though symmetric Jaccard is far
    below any dedup threshold."""
    quote = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} w{i} filler{i}" for i in range(30))
    rows = [
        (1, f"{filler} {quote}"),  # long doc embedding the quote
        (2, quote),  # the quote alone
        (3, "totally unrelated words here nothing shared at all"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = STAGED_QUERIES["dedup_containment"](spark, str(tmp_path)).collect()
    flagged = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in flagged
    assert flagged[(1, 2)]["containment"] == 1.0
    assert flagged[(1, 2)]["contained_doc"] == 2
    # symmetric jaccard for the same pair is tiny — the shape jaccard misses
    a, b = _shingle_set(rows[0][1]), _shingle_set(rows[1][1])
    assert len(a & b) / len(a | b) < 0.1
    assert not any(3 in k for k in flagged)


@pytest.mark.parametrize("key", sorted(STAGED_QUERIES))
def test_staged_output_is_scalar_only(key, spark, sf_dir):
    """The driver canonicalizer cannot hash array/map/struct cells (the
    CORRECTNESS_r03 crash class); staged keys must satisfy the same
    scalar-only contract BEFORE promotion day, not after."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = STAGED_QUERIES[key](spark, sf_dir)
    for f in df.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{key}.{f.name} is {f.dataType.simpleString()} — stringify it "
            "(concat_ws / to_json) on BOTH the Spark and oracle side"
        )


def test_staged_plans_pass_scale_lint(spark, sf_dir):
    """The registry plan lint (no cartesian, no row-Python, no unlisted
    BNLJ, no single-partition global window) applied to the staged keys
    BEFORE promotion.  dedup_ladder is excluded: its builder fits a
    MinHash model (runs jobs); its plan shape is inherited from the
    registered dedup_near_minhash, which the live lint covers."""
    from bigdatawork_spark.plans.explain import plan_string

    # 1-row scalar folds, same pattern as the registered BNLJ allowlist
    bnlj_ok = {"dsir_importance_resample", "knn_classify_ivf", "semdedup_prune"}
    offenders = []
    for key in sorted(set(STAGED_QUERIES) - {"dedup_ladder"}):
        plan = plan_string(STAGED_QUERIES[key](spark, sf_dir))
        if "CartesianProduct" in plan:
            offenders.append(f"{key}: CartesianProduct")
        if "BatchEvalPython" in plan:
            offenders.append(f"{key}: row-at-a-time Python eval")
        if "BroadcastNestedLoopJoin" in plan and key not in bnlj_ok:
            offenders.append(f"{key}: unlisted BroadcastNestedLoopJoin")
        lines = plan.splitlines()
        for i, ln in enumerate(lines):
            if "Window" in ln or "WindowGroupLimit" in ln:
                if any(
                    "Exchange SinglePartition" in la
                    for la in lines[i + 1 : i + 4]
                ):
                    offenders.append(f"{key}: single-partition global window")
                    break
    assert not offenders, "\n".join(offenders)


def test_vacuum_deletes_only_dead_files_and_truncates_history(spark, sf_dir):
    """Filesystem-level invariants behind the oracle constants: after
    vacuum(keep_last=1) the on-disk parquet set equals exactly the latest
    manifest's file list, expired versions raise on time travel, and the
    surviving read matches the pre-vacuum content row-for-row."""
    import os
    import shutil

    from bigdatawork_spark.sources.io_ops import _tmp
    from bigdatawork_spark.sources.manifest_format import (
        ManifestTable,
        _events_cols,
    )

    path = _tmp("manifest_vacuum_invariants")
    shutil.rmtree(path, ignore_errors=True)
    t = ManifestTable(spark, path)
    ev = _events_cols(spark, sf_dir)
    for r in range(3):
        t.append(ev.filter(f"event_id % 3 = {r}"))
    t.compact()
    before_rows = sorted(map(tuple, t.read().collect()))
    versions_before = t.versions()

    stats = t.vacuum(keep_last=1)
    assert t.versions() == versions_before[-1:]
    assert stats["n_expired_versions"] == len(versions_before) - 1

    live = set(t._manifest(t.versions()[0])["files"])
    on_disk = set()
    for root, _, files in os.walk(os.path.join(path, "data")):
        for f in files:
            if f.endswith(".parquet"):
                on_disk.add(os.path.join(root, f))
    assert on_disk == live  # nothing dead survives, nothing live deleted
    assert stats["n_live_files"] == len(live)

    assert sorted(map(tuple, t.read().collect())) == before_rows
    import pytest as _pytest

    with _pytest.raises(Exception):
        t.read(versions_before[0])  # expired snapshot must not be readable

    # idempotence: a second vacuum finds nothing to do
    again = t.vacuum(keep_last=1)
    assert again["n_expired_versions"] == 0
    assert again["n_deleted_files"] == 0


def test_dsir_matches_python_rederivation(spark, duck, sf_dir):
    """Independent pure-Python re-derivation of the DSIR weights (the
    oracle is co-designed SQL): add-1-smoothed unigram models over the
    en-slice vs the full corpus, average per-token log-ratio per doc,
    top-50 by (weight desc, doc_id).  Exact-fraction arithmetic is
    avoided the same way the engines avoid it — per-token doubles — so
    agreement is asserted at the rounded 6-decimal precision the
    operator publishes."""
    import math
    from collections import Counter

    docs = duck.execute(
        "SELECT doc_id, lang, text FROM documents ORDER BY doc_id"
    ).fetchall()
    src = Counter()
    tgt = Counter()
    doc_toks = {}
    for doc_id, lang, text in docs:
        toks = [w for w in text.split(" ") if w]
        doc_toks[doc_id] = toks
        src.update(toks)
        if lang == "en":
            tgt.update(toks)
    v = len(src)
    n_src = sum(src.values())
    n_tgt = sum(tgt.values())
    lr = {
        w: math.log((tgt.get(w, 0) + 1) / (n_tgt + v))
        - math.log((src[w] + 1) / (n_src + v))
        for w in src
    }
    scored = [
        (sum(lr[w] for w in toks) / len(toks), doc_id, len(toks))
        for doc_id, toks in doc_toks.items()
        if toks
    ]
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = {d: (n, round(s, 6)) for s, d, n in scored[:50]}

    rows = STAGED_QUERIES["dsir_importance_resample"](spark, sf_dir).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["avg_log_ratio"]) for r in rows}
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 2e-6, (d, got[d], want[d])


def test_promotion_registered_all_staged_keys():
    """Round-7 flip: promotion is unconditional at package import — every
    staged key (with its oracle, where declared) must be in the LIVE
    registry, visible to the driver."""
    import bigdatawork_spark as b

    for key in STAGED_QUERIES:
        assert key in b.QUERIES, f"staged key not promoted: {key}"
    for key in STAGED_ORACLES:
        assert key in b.ORACLES, f"staged oracle not promoted: {key}"


def test_vacuum_does_not_tear_pinned_readers_of_kept_versions(spark, sf_dir):
    """The retention contract: a DataFrame planned against the LATEST
    manifest before vacuum still collects its full content after vacuum
    (its files are the referenced set and must survive); a reader pinned
    to an EXPIRED version fails only when it actually reads."""
    import shutil

    from bigdatawork_spark.sources.io_ops import _tmp
    from bigdatawork_spark.sources.manifest_format import (
        ManifestTable,
        _events_cols,
    )

    path = _tmp("manifest_vacuum_pinned")
    shutil.rmtree(path, ignore_errors=True)
    t = ManifestTable(spark, path)
    ev = _events_cols(spark, sf_dir)
    for r in range(2):
        t.append(ev.filter(f"event_id % 2 = {r}"))
    t.compact()
    latest = t.versions()[-1]
    expired_v = t.versions()[0]
    pinned_kept = t.read(latest)      # plans against surviving files
    pinned_expired = t.read(expired_v)  # plans against doomed files
    expected = pinned_kept.count()

    t.vacuum(keep_last=1)
    assert pinned_kept.count() == expected  # kept reader unaffected
    import pytest as _pytest

    with _pytest.raises(Exception):
        pinned_expired.count()  # expired reader fails at read time
