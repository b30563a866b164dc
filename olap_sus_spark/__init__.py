"""olap_sus_spark — a PySpark-native OLAP + data-pipeline engine.

A from-scratch rebuild of the capabilities of the reference system
``thiago-shimada/olap-sus`` (a Kimball star-schema warehouse over Brazilian
public-health data with PySpark ETL + Postgres OLAP queries), collapsed into
a single Spark-first engine:

- ingestion (partitioned CSV / Parquet sources with explicit schemas),
- dimensional modeling (generated + seeded dimensions, sentinel members),
- fact building (surrogate-key pipelines, band joins, bridge tables),
- the OLAP query surface (roll-up, drill-down, slice&dice, pivot,
  drill-across, windowed top-k),
- plus large-scale training-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal column plumbing).

Everything is expressed with the DataFrame / Spark SQL API so Catalyst and
AQE choose physical plans; no RDDs, no row-at-a-time Python UDFs in hot
paths.
"""

__version__ = "0.1.0"
