"""Physical-plan inspection utilities.

Used by tests/test_plans.py to lock in scale-critical plan properties and
at the REPL to iterate on plans ('.explain until it's the plan you'd want').
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame) -> str:
    """Compact executed-plan string (pre-execution; AQE not yet final)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain('formatted')` text: operator tree + per-scan details
    (PushedFilters, ReadSchema, PartitionFilters)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def final_plan_string(df: DataFrame) -> str:
    """Materialize the DataFrame so AQE finalizes, then return the plan.
    '*(n)' operator prefixes mark WholeStageCodegen stages."""
    df.collect()
    return plan_string(df)


def read_schema_lines(df: DataFrame) -> list[str]:
    """The ReadSchema lines of every scan — what actually gets read."""
    return [l for l in formatted_plan(df).splitlines() if "ReadSchema" in l]


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lines of every scan."""
    return [l for l in formatted_plan(df).splitlines() if "PushedFilters" in l]


def count_operator(df: DataFrame, name: str) -> int:
    """Occurrences of a physical operator (e.g. 'BroadcastHashJoin')."""
    return plan_string(df).count(name)


def executed_scan_metrics(df) -> list[dict[str, int]]:
    """Materialize the DataFrame, then return each FileSourceScan's SQL
    metrics dict from the AQE-finalized executed plan (e.g. ``numFiles``,
    ``numPartitions``, ``staticFilesNum``, ``pruningTime``).  The
    partitions-read metrics are the ground truth for dynamic-partition-
    pruning assertions — the pre-execution plan text only shows the
    pruning EXPRESSION, not what it actually pruned.

    Accepts a zero-arg BUILDER (preferred) or a DataFrame.  SQLMetrics
    accumulate across executions of one QueryExecution (ADVICE r11: a
    DataFrame the caller already materialized reports numPartitions 8
    where one execution reads 4, spuriously failing — or worse, passing —
    pruning assertions), so a passed DataFrame must be freshly built and
    never previously executed; a builder sidesteps the hazard by
    constructing the plan here, guaranteeing exactly one execution."""
    if callable(df) and not isinstance(df, DataFrame):
        df = df()
    df.collect()
    root = df._jdf.queryExecution().executedPlan()
    if root.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        root = root.executedPlan()

    out: list[dict[str, int]] = []

    def walk(n):
        cls = n.getClass().getSimpleName()
        if "FileSourceScan" in cls:
            m = n.metrics()
            it = m.keys().iterator()
            mm = {}
            while it.hasNext():
                k = it.next()
                mm[k] = m.apply(k).value()
            out.append(mm)
        if cls.endswith("QueryStageExec"):
            walk(n.plan())
        ch = n.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(root)
    return out
