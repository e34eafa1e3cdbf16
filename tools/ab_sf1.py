"""A/B harness for the matched-scale (synthetic sf1.0) bench phase.

Replicates bench.py's sf1.0 protocol — warm table cache, session-default
AQE partitioning (the r05 initialPartitionNum=64 override was removed in
r10 — BASELINE.md), steady-state median of N consecutive runs per key
(first run after a shape switch pays a ~2x JIT-locality penalty; the
median excludes it), whole-row hash-aggregate materialization — for a
chosen subset of headline keys, so optimization candidates can be
measured without a full bench pass.

    python tools/ab_sf1.py agg_groupby_q1 win_row_number [--runs 5] [--duck]

Env toggles under test are read by session.py / io.py as usual; the
harness itself changes nothing it does not print.
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402  (repo root on path)
from bench import SF1_DIR, _ensure_sf1, _fill_cache, _materialize  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
        args = [a for a in args if a != str(runs)]
    os.environ.setdefault("SPARK_GRAFT_CACHE", "1")

    from bigdatawork_spark.registry import QUERIES
    from bigdatawork_spark.session import get_spark

    keys = args or bench.HEADLINE
    if not _ensure_sf1(os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")):
        print("sf1.0 replicas unavailable", file=sys.stderr)
        sys.exit(1)

    if "--duck" in sys.argv:
        import duckdb

        from bigdatawork_spark.registry import ORACLES
        from bigdatawork_spark.schemas import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF1_DIR}/{t}.parquet')"
            )
        for k in keys:
            sql = ORACLES.get(k)
            if sql is None:
                print(f"duck  {k}: n/a (rows-only)")
                continue
            wrapped = f"SELECT bit_xor(hash(q)) FROM ({sql}) q"
            con.execute(wrapped).fetchone()
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                con.execute(wrapped).fetchone()
                times.append(time.perf_counter() - t0)
            print(f"duck  {k}: {sorted(times)[len(times) // 2]:.4f}s")
        con.close()

    spark = get_spark("bigdatawork-ab")
    _fill_cache(spark, SF1_DIR)
    if os.environ.get("AB_INIT_PARTS"):
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ["AB_INIT_PARTS"],
        )
    for k in keys:
        _materialize(QUERIES[k](spark, SF1_DIR))  # untimed prime
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            _materialize(QUERIES[k](spark, SF1_DIR))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(f"spark {k}: {med:.4f}s  (min {min(times):.4f}, max {max(times):.4f})")


if __name__ == "__main__":
    main()
