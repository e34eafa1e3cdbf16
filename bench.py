"""Bench harness — times headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on one shared local[$SPARK_GRAFT_CPUS] session and
prints ONE JSON line.

Metric: total batch wall-clock over the headline set, excluding the one-time
session startup (BASELINE.md "Spark-side plan": per-query Spark floor is
scheduler-dominated; a whole-batch bound amortized over a shared session is
the meaningful comparison).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdatawork_spark.registry import QUERIES  # noqa: E402
import bigdatawork_spark  # noqa: F401, E402
from bigdatawork_spark.session import get_spark  # noqa: E402

# Headline set: the BASELINE.md shapes first, then broad coverage.
HEADLINE = [
    "agg_groupby_q1",
    "limit_topk_q3",
    "join_multiway_q5",
    "win_row_number",
    "dedup_exact",
    "join_inner_shuffle",
    "win_time_tumbling",
    "wordcount",
    "sim_cosine_topk",
    "tfidf_keywords",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bigdatawork-bench")
    keys = [k for k in HEADLINE if k in QUERIES]

    # Warm the JVM + parquet footers once (not timed): tiny count.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    per_query: dict[str, float] = {}
    t_batch = time.perf_counter()
    for key in keys:
        t0 = time.perf_counter()
        df = QUERIES[key](spark, sf_dir)
        n = df.count()  # force full execution
        per_query[key] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(time.perf_counter() - t_batch, 4)

    print(
        json.dumps(
            {
                "metric": "headline_batch_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
