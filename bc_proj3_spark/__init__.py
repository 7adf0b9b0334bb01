"""bc_proj3_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference pipeline
(infinit3labs/bc-proj3: medallion ELT + NLP scoring on Spark/Delta,
see SURVEY.md) as an idiomatic, self-contained OSS-PySpark library:

- ``session``    — tuned SparkSession builder (AQE, shuffle sizing, Arrow)
- ``catalog``    — layer-namespaced parquet warehouse (bronze/silver/gold)
- ``io``         — landing-file discovery + offline-friendly source fetchers
- ``functions``  — column-level building blocks (keys, text, dates)
- ``operators``  — composable dataframe operators (incremental loads,
                   dedup family, similarity search, text analysis)
- ``plans``      — headline analytical queries over the TPC-H-ish testdata
- ``pipeline``   — bronze → silver → gold runnable stages
- ``streaming``  — Structured Streaming variants of the incremental layer
"""

__version__ = "0.1.0"
