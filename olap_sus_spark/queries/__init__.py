"""Query surface: named OLAP operations + per-operator parity batteries.

Importing this package populates ``olap_sus_spark.registry.QUERIES`` /
``ORACLE``.
"""

from olap_sus_spark.queries import (  # noqa: F401
    olap,
    operators,
    pricing,
    text_pipeline,
    vector,
)

__all__ = ["pricing", "olap", "operators", "text_pipeline", "vector"]
