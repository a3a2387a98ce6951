"""cs_5542_lab_6_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``BigDataAnalytics-CS5542/CS_5542_Lab_6``
(reference surveyed in SURVEY.md), rebuilt Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (local + cluster-ready confs)
- ``sources``    : table loaders / temp-view registration for the fixtures
- ``functions``  : scalar/vector/text column expressions (SURVEY §2.8)
- ``operators``  : relational, retrieval, dedup, text-analysis, similarity
- ``pipeline``   : corpus construction (papers/chunks/KG) — SURVEY §3.3
- ``streaming``  : Structured Streaming surface + batch twins (SURVEY §2.10)
- ``plans``      : plan-inspection helpers (explain / pushdown assertions)
- ``registry``   : the single queries()/oracle_sql() registry consumed by
  ``__spark_entry__.py``
"""

__version__ = "0.1.0"
