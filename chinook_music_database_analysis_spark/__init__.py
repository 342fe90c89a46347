"""chinook_music_database_analysis_spark — a PySpark-native analytics engine.

Re-expresses the query workload of the reference repo
(anuraj-08/Chinook-Music-Database-Analysis, a 19-query MySQL analytics
workload over the Chinook star schema; see /root/reference/SQL_file.sql)
as an idiomatic Spark DataFrame/SQL engine, plus large-scale
training-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal plumbing, structured streaming).

Layers (SURVEY.md §7.0):
  * ``sources``   — session builder + catalog registration over Parquet.
  * ``functions`` — portable expression helpers (money decimals, date
    diffs, MySQL-dialect shims).
  * ``operators`` — composable DataFrame->DataFrame operators (pair
    affinity, dedup, similarity, text, multimodal, data quality).
  * ``plans``     — the query registry: reference-parity queries
    (SURVEY.md §2.12) and extension queries, each paired with an ANSI
    oracle SQL string for the DuckDB correctness gate.
  * ``streaming`` — Structured Streaming versions of the event ops.
"""

__version__ = "0.1.0"
