"""tools/synth_scale.py integrity: replication must preserve join shape.

The scaling-curve measurement (BASELINE.md round 3) is only meaningful if
the synthetic data joins exactly like the base — every replica's foreign
keys must land on that replica's shifted primary keys, never cross-replica.
Checked with DuckDB over a 2-replica build of sf0.001 (no JVM needed).
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
import pytest


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    dst = tmp_path_factory.mktemp("synth")
    spec = importlib.util.spec_from_file_location(
        "synth_scale", "/root/repo/tools/synth_scale.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.SRC = "/root/testdata/sf0.001"
    mod.DST = str(dst)
    old_argv = sys.argv
    sys.argv = ["synth_scale.py", "2"]
    try:
        mod.main()
    finally:
        sys.argv = old_argv
    return str(dst)


def _con(d):
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    return con


def test_row_counts_scale_exactly(synth_dir):
    base = _con("/root/testdata/sf0.001")
    synth = _con(synth_dir)
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        nb = base.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        ns = synth.execute(f"SELECT COUNT(*) FROM {t}").fetchone()[0]
        assert ns == 2 * nb, f"{t}: {ns} != 2×{nb}"


def test_join_cardinality_scales_exactly(synth_dir):
    base = _con("/root/testdata/sf0.001")
    synth = _con(synth_dir)
    q = """SELECT COUNT(*) FROM orders
           JOIN lineitem ON o_orderkey = l_orderkey
           JOIN customer ON o_custkey = c_custkey"""
    nb = base.execute(q).fetchone()[0]
    ns = synth.execute(q).fetchone()[0]
    assert ns == 2 * nb, (
        f"3-way join produced {ns}, expected exactly 2×{nb} — replica keys "
        "are colliding or dangling"
    )


def test_no_dangling_foreign_keys(synth_dir):
    synth = _con(synth_dir)
    dangling = synth.execute(
        """SELECT COUNT(*) FROM lineitem
           LEFT JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderkey IS NULL"""
    ).fetchone()[0]
    assert dangling == 0
