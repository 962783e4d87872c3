"""PySpark-native analytics engine with the data-processing capabilities of
``andre-maree/SqlDataIntegrationFunctionTriggerApp`` (reference surveyed in
/root/repo/SURVEY.md), re-expressed Spark-first.

The reference is a .NET CDC->project->HTTP-POST ETL app with durable retry
state. This engine maps those capabilities onto DataFrame/SQL operators,
Structured Streaming with foreachBatch sinks, a small keyed state table, and
retention GC -- plus large-scale LLM-data-pipeline extensions (dedup,
similarity search, text analysis, multimodal columns).

Layout:
  session.py     SparkSession builder tuned for local[] testing / cluster scale
  catalog.py     register the fixture parquet tables as temp views
  config.py      typed engine settings (reference Models/AppSettings.cs)
  state.py       keyed state table == durable entities (EntityFunctions.cs)
  operators/     allowlist projection, dedup, similarity, multimodal
  functions/     scalar/text/json helpers
  sources/       change feed (batch watermark + streaming)
  sinks/         HTTP POST sink with classified retry
  plans/         the query registry backing __spark_entry__.py
  streaming/     watermark/window/session analytics + pipeline wiring
  maintenance.py retention GC (CleanupFunction.cs)
"""

__version__ = "0.1.0"
