"""bench.py module contract — no Spark session needed.

The sf1.0 interleaved phase REQUIRES every headline key to have a DuckDB
oracle (bench._sf1_interleaved returns None otherwise and the artifact
silently loses its ratio_vs_duckdb — the gate number).  Pin that, the
key registrations, and the median helper, so a key rename or an
oracle-less headline swap fails here instead of producing a
ratio-less BENCH_r{N}.json."""

from __future__ import annotations

import bench
from bigdatawork_spark.registry import ORACLES, QUERIES


def test_headline_keys_registered_and_oracled():
    for k in bench.HEADLINE:
        assert k in QUERIES, f"headline key {k} not registered"
        assert ORACLES.get(k), (
            f"headline key {k} has no oracle — the sf1.0 interleaved "
            f"phase would degrade to spark-only and drop the gate ratio"
        )


def test_extended_keys_registered():
    missing = [k for k in bench.EXTENDED if k not in QUERIES]
    assert not missing, missing


def test_headline_set_frozen():
    """BENCH_r{N}.json comparability across rounds depends on this exact
    list (bench.py comment: FROZEN)."""
    assert bench.HEADLINE == [
        "agg_groupby_q1", "limit_topk_q3", "join_multiway_q5",
        "win_row_number", "dedup_exact", "join_inner_shuffle",
        "win_time_tumbling", "wordcount", "sim_cosine_topk",
        "tfidf_keywords",
    ]


def test_median_helper():
    assert bench._median([3.0]) == 3.0
    assert bench._median([4.0, 1.0, 3.0]) == 3.0
    assert bench._median([4.0, 1.0]) == 2.5
    assert bench._median([1.0, 9.0, 2.0, 8.0]) == 5.0
