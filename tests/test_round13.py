"""Round-13 keys: rank_fusion_rrf vs a from-scratch Python hybrid
retriever, and join_bloom_prefilter's Bloom-filter properties (the part
the plain-join oracle can't see)."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from bigdatawork_spark.operators.joins import bloom_prefilter_pass_count
from bigdatawork_spark.operators.search_ops import (
    _B,
    _K1,
    _RRF_K,
    _RRF_LIST,
    _RRF_QVEC,
    _RRF_TERMS,
)
from bigdatawork_spark.registry import QUERIES


def _rrf_python_reference(sf_dir: str):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {
        d: [w for w in t.split(" ") if w]
        for d, t in zip(docs["doc_id"], docs["text"])
        if t is not None
    }
    n_docs = len(docs)
    avglen = sum(len(ws) for ws in toks.values()) / n_docs
    tf = {
        d: Counter(w for w in ws if w in _RRF_TERMS) for d, ws in toks.items()
    }
    df = Counter(w for c in tf.values() for w in c)
    bm25 = {}
    for d, c in tf.items():
        if not c:
            continue
        s = 0.0
        for w, t in c.items():
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (t * (_K1 + 1.0)) / (
                t + _K1 * (1.0 - _B + _B * len(toks[d]) / avglen)
            )
        bm25[d] = round(s, 6)
    lex_ranked = sorted(bm25, key=lambda d: (-bm25[d], d))[:_RRF_LIST]
    lex_rank = {d: i + 1 for i, d in enumerate(lex_ranked)}

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {
        v: [float(x) for x in e] for v, e in zip(emb["vec_id"], emb["embedding"])
    }
    qe = vecs[_RRF_QVEC]
    qn = math.sqrt(sum(x * x for x in qe))
    cos = {}
    for v, e in vecs.items():
        if v == _RRF_QVEC:
            continue
        nrm = math.sqrt(sum(x * x for x in e))
        cos[v] = round(sum(a * b for a, b in zip(e, qe)) / (nrm * qn), 6)
    sem_ranked = sorted(cos, key=lambda v: (-cos[v], v))[:_RRF_LIST]
    sem_rank = {v: i + 1 for i, v in enumerate(sem_ranked)}

    rrf = {
        d: (1.0 / (_RRF_K + lex_rank[d]) if d in lex_rank else 0.0)
        + (1.0 / (_RRF_K + sem_rank[d]) if d in sem_rank else 0.0)
        for d in set(lex_rank) | set(sem_rank)
    }
    fused = sorted(rrf, key=lambda d: (-rrf[d], d))[:20]
    return lex_rank, sem_rank, rrf, fused


def test_rrf_vs_python_reference(spark, sf_dir):
    """Top-20 fused list ≡ the from-scratch Python hybrid retriever —
    same BM25, same cosine, same rank-then-fuse arithmetic, no SQL
    engine involved."""
    lex_rank, sem_rank, rrf, fused = _rrf_python_reference(sf_dir)
    rows = QUERIES["rank_fusion_rrf"](spark, sf_dir).collect()
    assert [r["doc_id"] for r in rows] == fused
    for r in rows:
        d = r["doc_id"]
        assert r["lex_rank"] == lex_rank.get(d, 0), r
        assert r["sem_rank"] == sem_rank.get(d, 0), r
        assert abs(r["rrf_score"] - rrf[d]) < 1e-6, (r, rrf[d])


def test_rrf_fuses_both_modalities(spark, sf_dir):
    """Non-vacuousness: the fused top-20 must contain docs from BOTH
    lists and at least one doc present in only one of them — otherwise
    the key degenerates to a single ranker."""
    rows = QUERIES["rank_fusion_rrf"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert any(r["lex_rank"] > 0 for r in rows)
    assert any(r["sem_rank"] > 0 for r in rows)
    assert any(
        (r["lex_rank"] == 0) != (r["sem_rank"] == 0) for r in rows
    ), "every fused doc appears in both lists — fusion untested"


def test_bloom_prefilter_no_false_negatives_and_prunes(spark, sf_dir):
    """The Bloom pass-set must contain EVERY true-match row (no false
    negatives — the correctness half) and be smaller than the full fact
    table (actual pruning — the scale half the oracle can't observe)."""
    from bigdatawork_spark.io import load
    from pyspark.sql import functions as F

    passed = bloom_prefilter_pass_count(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    n_total = li.count()
    n_passed = passed.count()
    assert 0 < n_passed < n_total, (n_passed, n_total)

    nat = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    true_keys = {
        r["s_suppkey"]
        for r in load(spark, sf_dir, "supplier")
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
        .collect()
    }
    passed_keys = {r["l_suppkey"] for r in passed.distinct().collect()}
    true_fact_keys = {
        r["l_suppkey"]
        for r in li.select("l_suppkey").distinct().collect()
        if r["l_suppkey"] in true_keys
    }
    assert true_fact_keys <= passed_keys, true_fact_keys - passed_keys


def test_bloom_prefilter_plan_is_broadcast_semi_then_broadcast_join(
    spark, sf_dir
):
    """Plan pin: the prefilter is two broadcast LEFT SEMI hash joins and
    the exact join broadcasts the dim — no sort-merge join, no shuffle of
    the fact side before the final aggregation's exchange."""
    plan = (
        QUERIES["join_bloom_prefilter"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("LeftSemi") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
