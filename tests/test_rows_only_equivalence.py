"""Compensating equivalence tests for rows-only registry keys (VERDICT r08
item 4).

A rows-only driver row proves the key runs and emits rows; it does NOT prove
values.  Every rows-only key therefore needs a test that pins its values to
an independently-computed twin.  This module holds the ones that had no
dedicated equivalence case elsewhere (COVERAGE.md's rows-only table maps
every key to its test):

  scan_csv / scan_jsonl / scan_orc / sink_parquet — HASH-CHECKED since r14
      (round-trip-≡-source oracles), no longer rows-only; their tests here
      stay as the ENGINE-SIDE twin (round-trip vs the parquet-direct
      projection inside Spark — independent of the DuckDB comparison and
      the thing that localizes a failure to the writer/reader rather than
      the oracle).
  source_stream_file / sink_stream_memory / sink_stream_foreachbatch /
      stream_static_join — the drained streaming table must equal the batch
      formulation over the same events (availableNow drain = bounded input,
      so exact equality is the contract, same as test_streaming_twins).
  sim_ann_lsh — LSH prunes CANDIDATES, never distorts distances: every
      emitted pair's euclidean distance must equal the exact distance, and
      the probe set's recall vs the exact ≤8.0 neighborhood must clear a
      floor (seeded, so deterministic).
  agg_approx_count_distinct — HLL at rsd=0.01 must land within 5σ of the
      exact distinct counts (rows-only because sketch internals differ per
      engine; the ESTIMATE is still pinned here).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdatawork_spark.registry import QUERIES

from .compare import assert_frames_match


def test_scan_csv_roundtrip_equals_parquet_source(spark, sf_dir):
    got = QUERIES["scan_csv"](spark, sf_dir).toPandas()
    want = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 97 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .toPandas()
    )
    assert len(got) > 0, "vacuous: no sampled lineitem rows"
    assert_frames_match(got, want, "scan_csv≡parquet")


def test_scan_jsonl_roundtrip_equals_parquet_source(spark, sf_dir):
    got = QUERIES["scan_jsonl"](spark, sf_dir).toPandas()
    want = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_custkey") % 53 == 0)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
        .toPandas()
    )
    assert len(got) > 0, "vacuous: no sampled customer rows"
    assert_frames_match(got, want, "scan_jsonl≡parquet")


def test_scan_orc_roundtrip_equals_parquet_source(spark, sf_dir):
    got = QUERIES["scan_orc"](spark, sf_dir).toPandas()
    want = spark.read.parquet(f"{sf_dir}/supplier.parquet").toPandas()
    assert len(got) > 0
    assert_frames_match(got, want, "scan_orc≡parquet")


def test_sink_parquet_roundtrip_equals_direct_agg(spark, sf_dir):
    got = QUERIES["sink_parquet"](spark, sf_dir).toPandas()
    want = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    assert_frames_match(got, want, "sink_parquet≡direct")


def test_source_stream_file_equals_batch_filter(spark, sf_dir):
    got = QUERIES["source_stream_file"](spark, sf_dir).toPandas()
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
        .toPandas()
    )
    assert len(got) > 0
    assert_frames_match(got, want, "source_stream_file≡batch")


def test_sink_stream_memory_equals_batch_projection(spark, sf_dir):
    got = QUERIES["sink_stream_memory"](spark, sf_dir).toPandas()
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "event_type")
        .toPandas()
    )
    assert_frames_match(got, want, "sink_stream_memory≡batch")


def test_sink_stream_foreachbatch_equals_batch_projection(spark, sf_dir):
    got = QUERIES["sink_stream_foreachbatch"](spark, sf_dir).toPandas()
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
        .toPandas()
    )
    assert_frames_match(got, want, "sink_stream_foreachbatch≡batch")


def test_stream_static_join_equals_batch_join(spark, sf_dir):
    got = QUERIES["stream_static_join"](spark, sf_dir).toPandas()
    weights = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 3.0),
         ("error", 0.0)],
        "event_type string, weight double",
    )
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .join(weights, "event_type")
        .select("event_id", "event_type", "value", "weight")
        .toPandas()
    )
    assert len(got) > 0
    assert_frames_match(got, want, "stream_static_join≡batch")


def test_source_stream_rate_flag_is_one(spark, sf_dir):
    """The rate source is wall-clock-dependent by nature, so its builder
    already collapses to a single schema-stable flag; the pinnable value
    is that the drain actually saw rows (got_rows = 1, never 0)."""
    rows = QUERIES["source_stream_rate"](spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0]["got_rows"] == 1


def test_ann_lsh_distances_exact_and_recall(spark, sf_dir):
    """LSH candidate pruning must never distort the reported metric: every
    (probe, neighbor) pair's eucl_dist must equal the exact euclidean
    distance recomputed from the raw vectors.  And the seeded 4-table
    configuration must recall a sane fraction of the true ≤8.0
    neighborhood for these probes (it is an ANN, so 100% is not the
    contract — silently returning near-nothing is the failure mode)."""
    import numpy as np

    rows = QUERIES["sim_ann_lsh"](spark, sf_dir).collect()
    assert rows, "vacuous: LSH returned no pairs"

    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    for r in rows:
        exact = float(np.linalg.norm(emb[r["probe_id"]] - emb[r["neighbor_id"]]))
        assert math.isclose(r["eucl_dist"], exact, rel_tol=1e-4), (
            f"distorted distance for ({r['probe_id']},{r['neighbor_id']}): "
            f"lsh={r['eucl_dist']} exact={exact}"
        )
        assert r["eucl_dist"] <= 8.0 + 1e-9
        assert r["probe_id"] != r["neighbor_id"]

    probes = [p for p in (0, 1, 2, 3, 4, 5) if p in emb]
    true_pairs = {
        (p, v)
        for p in probes
        for v in emb
        if v != p and np.linalg.norm(emb[p] - emb[v]) <= 8.0
    }
    got_pairs = {(r["probe_id"], r["neighbor_id"]) for r in rows}
    assert got_pairs <= true_pairs, "LSH emitted a pair outside the radius"
    recall = len(got_pairs) / max(1, len(true_pairs))
    assert recall >= 0.5, f"LSH recall collapsed: {recall:.2f}"


def test_approx_count_distinct_within_error_bound(spark, sf_dir):
    """Hash-checked since r14 (exact counts + in-bound booleans); this
    test re-derives the bound independently so the key's own booleans
    can't go vacuous: the raw HLL estimate must sit within the 5%-of-
    exact band (rsd=0.01 → a 5σ margin; a broken sketch — 0, or
    cardinality-of-table — fails), and the key must agree."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    raw = li.agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("ap"),
        F.approx_count_distinct("l_suppkey", 0.01).alias("asu"),
        F.countDistinct("l_partkey").alias("p"),
        F.countDistinct("l_suppkey").alias("s"),
    ).collect()[0]
    assert abs(raw["ap"] - raw["p"]) <= max(5, 0.05 * raw["p"])
    assert abs(raw["asu"] - raw["s"]) <= max(5, 0.05 * raw["s"])
    row = QUERIES["agg_approx_count_distinct"](spark, sf_dir).collect()[0]
    assert row["exact_parts"] == raw["p"] and row["exact_supps"] == raw["s"]
    assert row["approx_parts_ok"] and row["approx_supps_ok"]


def test_pca_gram_covariance_matches_duckdb_sql(spark, duck, sf_dir):
    """r16 partial-oracle strengthening (VERDICT r15 item 5):
    embedding_pca_gram stays rows-only because its OUTPUT depends on an
    eigensolve (power iteration measured-rejected: lambda2/lambda1 ~ 0.96),
    but the distributed stage — the d-vector mean and dxd covariance
    accumulated via mapInPandas partial sums — IS SQL-expressible.
    Re-derive both here in DuckDB SQL straight from the parquet and
    compare entry-by-entry against the engine's accumulation (reproduced
    with the same partial-sum reduce the builder uses)."""
    import numpy as np

    from bigdatawork_spark.io import load

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # the builder's own distributed accumulation (same partial schema)
    def partial(batches):
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            n += M.shape[0]
            s = M.sum(axis=0) if s is None else s + M.sum(axis=0)
            g = M.T @ M if g is None else g + M.T @ M
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tobytes()], "g": [g.tobytes()]})

    parts = e.mapInPandas(partial, "n bigint, s binary, g binary").collect()
    d = len(np.frombuffer(parts[0]["s"]))
    n_tot = sum(r["n"] for r in parts)
    s_tot = sum(np.frombuffer(r["s"]) for r in parts)
    g_tot = sum(np.frombuffer(r["g"]).reshape(d, d) for r in parts)
    mean = s_tot / n_tot
    cov = g_tot / n_tot - np.outer(mean, mean)

    # independent DuckDB derivation: unnest to (vec, pos, val), mean per
    # dim, covariance per (i, j) via a position self-join
    duck_mean = dict(
        duck.execute(
            "SELECT pos, AVG(val) FROM (SELECT unnest(embedding::DOUBLE[])"
            " AS val, generate_subscripts(embedding, 1) AS pos"
            " FROM embeddings) GROUP BY pos"
        ).fetchall()
    )
    assert len(duck_mean) == d
    for p in range(d):
        assert abs(duck_mean[p + 1] - mean[p]) < 1e-9, (p, duck_mean[p + 1], mean[p])

    duck_cov = duck.execute(
        "WITH x AS (SELECT vec_id, unnest(embedding::DOUBLE[]) AS val,"
        " generate_subscripts(embedding, 1) AS pos FROM embeddings)"
        " SELECT a.pos, b.pos, SUM(a.val * b.val) / COUNT(*)"
        " - AVG(a.val) * AVG(b.val)"
        " FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2"
    ).fetchall()
    assert len(duck_cov) == d * d
    for i, j, c in duck_cov:
        assert abs(c - cov[i - 1][j - 1]) < 1e-9, (i, j, c, cov[i - 1][j - 1])
