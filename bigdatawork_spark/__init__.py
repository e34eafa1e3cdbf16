"""bigdatawork_spark — PySpark-native analytics engine.

Importing this package imports every operator module, which populates
``registry.QUERIES`` / ``registry.ORACLES`` (the driver contract surface).
"""

from . import schemas  # noqa: F401
from .functions import scalar  # noqa: F401
from .sources import io_ops, manifest_format, python_datasource  # noqa: F401
from .streaming import stream_ops  # noqa: F401
from .operators import (  # noqa: F401
    aggregations,
    analytics,
    corpus_ops,
    curation,
    graph_ops,
    joins,
    llm_ops,
    pipeline_ops,
    platform_ops,
    projections,
    reshape,
    round10_ops,
    round11_ops,
    round11b_ops,
    round11c_ops,
    round13_ops,
    search_ops,
    sorts_sets,
    stats_ops,
    subqueries,
    tpch_extra,
    tpch_full,
    training_ops,
    udfs,
    windows,
)
from . import pipeline_api, sql_api  # noqa: F401
from .registry import ORACLES, QUERIES  # noqa: F401

# Round-7 promotion (VERDICT r06 item 1): the 12 operators staged in round 5
# register into the live registry unconditionally.  The env-flag rehearsal
# path (SPARK_GRAFT_PROMOTE_R06=1) is retired — the 247-key rehearsal passed
# in round 5 (COVERAGE.md) and these keys are now part of the driver
# contract surface like any other.
from .operators import staged_r06 as _staged_r06  # noqa: F401

_staged_r06.promote()
