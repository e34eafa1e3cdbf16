"""CLI: run SQL (or a registered operator) over the test corpus.

    python -m bigdatawork_spark "SELECT count(*) FROM lineitem"
    python -m bigdatawork_spark --key agg_groupby_q1
    python -m bigdatawork_spark --list
    python -m bigdatawork_spark --sf /root/testdata/sf0.1 "SELECT ..."
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="bigdatawork_spark",
        description="Run SQL or a registered operator over the corpus.",
    )
    ap.add_argument("query", nargs="?", help="Spark SQL string to run")
    ap.add_argument("--key", help="registered operator key to run instead of SQL")
    ap.add_argument("--list", action="store_true", help="list operator keys")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="corpus dir")
    ap.add_argument("--limit", type=int, default=20, help="max rows to print")
    ap.add_argument("--explain", action="store_true", help="print the plan too")
    args = ap.parse_args(argv)

    from bigdatawork_spark.registry import QUERIES

    if args.list:
        for k in sorted(QUERIES):
            print(k)
        return 0
    if not args.key and not args.query:
        ap.error("provide a SQL string, --key, or --list")

    from bigdatawork_spark.session import get_spark
    from bigdatawork_spark.sql_api import sql as run_sql

    spark = get_spark("bigdatawork-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.key:
            if args.key not in QUERIES:
                print(f"unknown key: {args.key} (try --list)", file=sys.stderr)
                return 2
            df = QUERIES[args.key](spark, args.sf)
        else:
            df = run_sql(spark, args.sf, args.query)
        if args.explain:
            df.explain("formatted")
        df.show(args.limit, truncate=False)
        return 0
    except Exception as exc:  # concise error, not a Java traceback wall
        from pyspark.errors import PySparkException

        if isinstance(exc, PySparkException):
            cond = exc.getCondition() or "ERROR"
            print(f"error [{cond}]: {exc.getMessage()}", file=sys.stderr)
            return 1
        raise
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
