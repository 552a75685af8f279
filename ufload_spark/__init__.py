"""ufload_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of Unifield/ufload (reference: /root/reference),
re-expressed Spark-first and extended with large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

The reference is a PostgreSQL staging-loader (~2,850 LoC Python 2.7); its
dataflow semantics (SURVEY.md §2) are rebuilt here as declarative DataFrame
plans so Catalyst/AQE own the physical strategy. Nothing is copied from the
reference — it defines WHAT is computed, not HOW.
"""

__version__ = "0.1.0"
