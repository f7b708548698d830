"""aced_etl_pod_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of the
ACED-IDP ``aced_etl_pod`` ETL worker (reference: ``etl-job/fhir_import_export.py``),
re-expressed as idiomatic Spark DataFrame plans, and extended with the
LLM-data-pipeline operator families (dedup, similarity search, multimodal
columns, text analysis) needed at 100 TB scale.

Layout:
  session.py    — SparkSession factory + runtime tuning (AQE, UTC, Arrow)
  tables.py     — test-table loaders
  registry.py   — operator registry: id -> (pyspark callable, DuckDB oracle SQL)
  operators/    — one module per operator family (SURVEY.md §2.b)
  plans/        — the put/get/delete pipeline façade (reference R1–R19 semantics)
  sources/      — NDJSON / CSV / binary / archive ingestion helpers
  streaming/    — deterministic micro-batch replay harness
"""

__version__ = "0.1.0"

from aced_etl_pod_spark.session import get_spark, tune  # noqa: F401
