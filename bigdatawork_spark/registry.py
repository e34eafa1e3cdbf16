"""Central operator registry.

Every operator from SURVEY.md §2 registers here: a Spark DataFrame builder
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) the DuckDB oracle
SQL string under the same key.  ``__spark_entry__.py`` exposes these dicts to
the driver verbatim.

Reference citation: REF:∅ (reference snapshot empty — see SURVEY.md §0);
the binding contract is SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[[Any, str], Any]] = {}
ORACLES: dict[str, str] = {}


def register(key: str, oracle: str | None = None):
    """Register a query builder under ``key``; optionally its oracle SQL.

    Oracle SQL must alias every computed column identically to the Spark
    builder (SURVEY.md §5.3.1) and round floats on both sides (§5.3.2).
    """

    def deco(fn):
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle.strip()
        fn.query_key = key
        return fn

    return deco
