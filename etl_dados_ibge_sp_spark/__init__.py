"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL repo (Utahh/etl-dados-ibge-sp).

The reference (see /root/repo/SURVEY.md) is a Polars-based batch ETL:
tolerant semi-structured ingest -> schema normalization -> type/null
repair -> broadcast dimension enrichment -> incremental anti-join dedup
-> idempotent relational load, over rollup-shaped tabular data.

This package re-expresses those capabilities Spark-first (DataFrame /
Spark SQL / Catalyst) and extends them with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal plumbing), designed for 100 TB scale even though tests run
on local[32].

Layout:
    session      SparkSession factory with scale-aware defaults
    sources/     readers: sanitized JSON, delimiter-sniffing CSV,
                 parquet star schema, JDBC with query pushdown
    operators/   projections, type/null repair, joins, aggregation
                 (incl. rollup/cube), top-k, dedup, similarity, text,
                 multimodal, nested-document search
    sinks/       CSV, parquet, JDBC (append / overwrite /
                 delete&insert idempotent restatement)
    plans/       composed pipelines (the reference's DAG shapes)
    streaming/   Structured Streaming restatement of the incremental
                 batch pattern (watermarked dedup, windowed aggs)
"""

__version__ = "0.1.0"
