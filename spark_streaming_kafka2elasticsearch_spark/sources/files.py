"""File / test sources — the swappable endpoints that make every
pipeline runnable (and unit-testable) without Kafka/MySQL.

``JsonDirSource.load_stream`` is the controlled-clock stand-in for the
Kafka source: drop one JSON file per intended micro-batch into the
directory and Structured Streaming consumes them in order — this is
how the watermark/late-data tests get deterministic event time
(SURVEY.md §5 "controlled-clock fixtures").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class ParquetSource:
    """Batch (or streaming, with a schema) parquet directory/file."""

    path: str
    schema: T.StructType | None = None

    def load(self, spark: SparkSession) -> DataFrame:
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.parquet(self.path)

    def load_stream(self, spark: SparkSession, max_files_per_trigger: int = 1) -> DataFrame:
        if self.schema is None:
            raise ValueError("streaming file sources require a declared schema")
        return (
            spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(self.path)
        )


@dataclass
class JsonDirSource:
    """Line-delimited JSON directory; the Kafka test double.

    ``as_kafka_envelope=True`` wraps each line as a single ``value``
    string column, so downstream code written against the Kafka
    envelope (cast→parse→curate) runs unmodified.
    """

    path: str
    schema: T.StructType | None = None
    as_kafka_envelope: bool = False

    _ENVELOPE = T.StructType([T.StructField("value", T.StringType(), True)])

    def load(self, spark: SparkSession) -> DataFrame:
        if self.as_kafka_envelope:
            return spark.read.schema(self._ENVELOPE).text(self.path).toDF("value")
        reader = spark.read
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.json(self.path)

    def load_stream(self, spark: SparkSession, max_files_per_trigger: int = 1) -> DataFrame:
        if self.as_kafka_envelope:
            return (
                spark.readStream.option("maxFilesPerTrigger", str(max_files_per_trigger))
                .text(self.path)
                .toDF("value")
            )
        if self.schema is None:
            raise ValueError("streaming file sources require a declared schema")
        return (
            spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .json(self.path)
        )


@dataclass
class RateSource:
    """Built-in rate source — load/soak testing without a broker."""

    rows_per_second: int = 1000

    def load_stream(self, spark: SparkSession) -> DataFrame:
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(self.rows_per_second))
            .load()
        )
