"""fotmobdatapipeline_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
ETL pipeline (torresroger776/FotmobDataPipeline, studied at /root/reference)
as an idiomatic, 100-TB-scalable Spark library, and extends it with the
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis).

Layout:
    session     SparkSession factory (AQE, shuffle sizing, UTC)
    sources     ingestion: parquet table registry, nested-JSON landing zone
    operators   star-schema builders, dedup, similarity, joins
    functions   column-level helpers: cleaning, metrics, text analysis
    plans       the query catalog (PySpark builders + DuckDB oracle SQL)
    streaming   Structured Streaming over the events table
    multimodal  binary-column plumbing (decode stubs + mapInPandas)
"""

__version__ = "0.1.0"
