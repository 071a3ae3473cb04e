"""Source abstractions (SURVEY.md §2.1, S1–S4).

A source is anything with ``load(spark) -> DataFrame`` (batch) and/or
``load_stream(spark) -> DataFrame`` (streaming).  Prod sources (Kafka,
JDBC) carry the reference's full option surface; test sources (parquet,
json dir, memory, rate) make every pipeline runnable without
infrastructure — the swappability the reference lacks.
"""

from spark_streaming_kafka2elasticsearch_spark.sources.files import (
    JsonDirSource,
    KafkaEnvelopeReplaySource,
    ParquetSource,
    RateSource,
)
from spark_streaming_kafka2elasticsearch_spark.sources.jdbc import JdbcSource
from spark_streaming_kafka2elasticsearch_spark.sources.kafka import KafkaSource

__all__ = [
    "JdbcSource",
    "JsonDirSource",
    "KafkaEnvelopeReplaySource",
    "KafkaSource",
    "ParquetSource",
    "RateSource",
]
