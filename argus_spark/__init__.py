"""argus_spark — a PySpark-native analytics/ETL engine with the query and
data-processing capabilities of SAIB-Inc/Argus (see SURVEY.md).

Layout:
  session    — SparkSession factory tuned for the target workload
  schemas    — declared StructTypes for the chain data model (FIXTURES.md)
  chain      — synthetic chain derivation + ingest-time decode
  operators  — the relational operator surface (SURVEY §2.B)
  lifecycle  — checkpointed, rollback-aware micro-batch engine (SURVEY §2.A)
  streaming  — Structured Streaming wrapper (foreachBatch)
  datapipe   — LLM-training-data operators (dedup, similarity, text, multimodal)
  functions  — scalar function helpers (hex canonicalization, stable hashes)
"""

__version__ = "0.1.0"
