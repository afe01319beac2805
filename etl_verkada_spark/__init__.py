"""etl_verkada_spark — a PySpark-native analytics engine.

Re-expresses every dataflow capability of the reference ETL connector
(dfpc-coe/etl-verkada, surveyed in SURVEY.md) as idiomatic Spark SQL /
DataFrame operators, extends it with the standard relational surface
(windows, sorts, set ops, full aggregation family) and LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis),
and designs every operator for 100 TB scale (see SCALE.md).

Layout:
    session      SparkSession factory + runtime conf defaults
    catalog      parquet table loaders for the driver testdata
    registry     the single source of truth: name -> (spark_fn, oracle_sql)
    operators/   relational operator families (scans, filters, joins, ...)
    functions/   scalar function families
    pipeline/    the flagship reference pipeline (camera -> Feature)
    fixtures     deterministic reference-shaped test tables (FIXTURES.md B)
    llm/         dedup / similarity / text-analysis / multimodal operators
    streaming/   event-time windows, watermarks, merge upsert
    sources/     REST pagination DataSource (Spark 4 Python DataSource API)
    sinks/       rate-limited REST upsert sink
"""

__version__ = "0.1.0"
