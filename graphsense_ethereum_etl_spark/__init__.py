"""graphsense_ethereum_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of
graphsense/graphsense-ethereum-etl (reference at /root/reference, cited by
file:line throughout) as idiomatic Spark DataFrame pipelines, plus the
general-purpose operator surface (joins, aggregations, windows, set ops) and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) required by the north star.

Layout:
    session        SparkSession factory with scale-appropriate defaults
    schemas        StructType registry (reference tables + raw entities)
    functions/     column-expression library (hex, bucketing, text, vectors)
    operators/     entity transform pipelines, joins, dedup, similarity,
                   multimodal columns + pure-stdlib media codecs
    sources/       parquet/CSV readers, JSON-RPC fetch source, generators,
                   the "ethrpc" Python Data Source (batch + stream)
    streaming/     incremental ingest (resume semantics), streaming ingest,
                   structured streaming, stateful operators
    plans/         plan inspection / explain helpers
    cli            python -m graphsense_ethereum_etl_spark {ingest,info,
                   ingest-rates,invalidate} — the reference's CLI surface
"""

__version__ = "0.1.0"
