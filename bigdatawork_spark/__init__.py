"""bigdatawork_spark — PySpark-native analytics engine.

Importing this package imports every operator module, which populates
``registry.QUERIES`` / ``registry.ORACLES`` (the driver contract surface).
"""

from . import schemas  # noqa: F401
from .functions import scalar  # noqa: F401
from .operators import aggregations, joins, projections, sorts_sets, windows  # noqa: F401
from .registry import ORACLES, QUERIES  # noqa: F401
