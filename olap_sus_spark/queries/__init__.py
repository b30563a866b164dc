"""Query surface: named OLAP operations + per-operator parity batteries.

Importing this package populates ``olap_sus_spark.registry.QUERIES`` /
``ORACLE``.
"""

from olap_sus_spark.queries import (  # noqa: F401
    affinity,
    audio_pipeline,
    bands,
    behavior,
    data_quality,
    events_windows,
    grouping_sets,
    incremental,
    json_functions,
    market,
    money,
    multimodal_pipeline,
    olap,
    operators,
    pricing,
    relational_ext,
    skew_queries,
    streaming_queries,
    text_pipeline,
    timeseries,
    tpch,
    tpch_full,
    vector,
)

__all__ = [
    "affinity",
    "audio_pipeline",
    "bands",
    "behavior",
    "data_quality",
    "events_windows",
    "grouping_sets",
    "incremental",
    "json_functions",
    "market",
    "money",
    "multimodal_pipeline",
    "olap",
    "operators",
    "pricing",
    "relational_ext",
    "skew_queries",
    "streaming_queries",
    "text_pipeline",
    "timeseries",
    "tpch",
    "tpch_full",
    "vector",
]
