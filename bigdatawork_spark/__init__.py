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

# Round-6 promotion rehearsal: with SPARK_GRAFT_PROMOTE_R06=1 the staged
# operators register into the live registry at import time, so the full
# driver contract (rotation, oracle wiring, scalar sweeps) can be exercised
# against the post-promotion world BEFORE the real flip.  The real round-6
# promotion replaces this block by importing staged_r06 unconditionally and
# calling promote() (or inlining @register decorators).
import os as _os

if _os.environ.get("SPARK_GRAFT_PROMOTE_R06") == "1":
    from .operators import staged_r06 as _staged_r06  # noqa: F401

    _staged_r06.promote()
