"""spark_streaming_kafka2elasticsearch_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference repo ``addyclement/Spark-Streaming-Kafka2Elasticsearch``
(a Kafka → Elasticsearch Structured Streaming ETL): declared-schema
JSON parsing, column derivation, stream–static enrichment joins,
event-time tumbling-window aggregation with watermarks, and an
idempotent keyed-upsert sink — plus the large-scale training-data
operators a 100 TB pipeline needs (dedup, similarity search, text
analysis, multimodal columns).

Everything is the public PySpark DataFrame / SQL / Structured
Streaming API; the logical plan is declared and Catalyst/Tungsten
pick the physical strategy.
"""

from spark_streaming_kafka2elasticsearch_spark.session import build_session

__version__ = "0.1.0"

__all__ = ["build_session", "__version__"]
