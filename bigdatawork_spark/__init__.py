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

# The round-6 staging module (staged_r06.py) is GONE (r15 module-hygiene
# fold, VERDICT r14 item 5): its 13 operators live in their domain modules
# (curation/llm_ops/training_ops/stats_ops/platform_ops/windows/
# manifest_format) with inline @register decorators — the module's own
# documented endgame once promote() became unconditional in round 7.
