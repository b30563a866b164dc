"""Query surface: named OLAP operations + per-operator parity batteries.

Importing this package populates ``olap_sus_spark.registry.QUERIES`` /
``ORACLE``.
"""

from olap_sus_spark.queries import olap, operators, pricing  # noqa: F401

__all__ = ["pricing", "olap", "operators"]
