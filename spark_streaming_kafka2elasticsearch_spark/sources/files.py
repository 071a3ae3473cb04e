"""File / test sources — the swappable endpoints that make every
pipeline runnable (and unit-testable) without Kafka/MySQL.

``JsonDirSource.load_stream`` is the controlled-clock stand-in for the
Kafka source: drop one JSON file per intended micro-batch into the
directory and Structured Streaming consumes them in order — this is
how the watermark/late-data tests get deterministic event time
(SURVEY.md §5 "controlled-clock fixtures").
"""

from __future__ import annotations

import os
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
class CsvDirSource:
    """CSV directory source (header row, declared or inferred schema,
    PERMISSIVE/DROPMALFORMED/FAILFAST modes) — the landing-zone format
    batch backfills actually arrive in.  Streaming requires a declared
    schema, same contract as JsonDirSource; at scale a declared schema
    also skips the inference pre-scan, which on a 100 TB drop is a
    full extra read."""

    path: str
    schema: T.StructType | None = None
    header: bool = True
    mode: str = "PERMISSIVE"

    def _options(self, reader):  # noqa: ANN001, ANN202
        return reader.option("header", str(self.header).lower()).option(
            "mode", self.mode
        )

    def load(self, spark: SparkSession) -> DataFrame:
        reader = self._options(spark.read)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(self.path)

    def load_stream(self, spark: SparkSession, max_files_per_trigger: int = 1) -> DataFrame:
        if self.schema is None:
            raise ValueError("streaming file sources require a declared schema")
        return (
            self._options(spark.readStream.schema(self.schema))
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .csv(self.path)
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


@dataclass
class KafkaEnvelopeReplaySource:
    """File-backed replay of the FULL Kafka envelope — the broker-free
    stand-in that drives the 7-column frame (+ headers) through the
    pipeline exactly as ``KafkaSource.load_stream`` would (reference
    ``bexley_spark_stream_msk_es.py:206,292``: ``includeHeaders`` and the
    value-extract select).

    ``JsonDirSource(as_kafka_envelope=True)`` fakes only the ``value``
    column; THIS source emits the envelope Spark's Kafka connector
    produces — ``key``/``value`` binary, ``topic``, ``partition``,
    ``offset`` (dense, monotonically increasing per topic-partition,
    assigned at append time like a real log), ``timestamp``,
    ``timestampType``, and the ``headers`` array<struct<key,binary>> —
    so envelope-shaped logic (header routing, offset bookkeeping,
    P1's binary cast) is testable end-to-end without a broker.

    Write side: :meth:`append_batch` writes ONE parquet file per call
    (pyarrow, write-then-rename so the streaming file source never
    sees a partial file) — one call ≙ one micro-batch, same
    controlled-clock idiom as ``JsonDirSource``.  Offset counters
    live on the instance; a fresh instance pointed at a non-empty
    directory resumes from the max offset already on disk (scanned
    once), so replay files stay log-consistent across writers.
    """

    path: str
    topic: str = "orders"
    timestamp_type: int = 0  # 0 = CreateTime, matching the connector

    def __post_init__(self) -> None:
        self._next_offset: dict[tuple[str, int], int] = {}

    def _arrow_schema(self):
        import pyarrow as pa

        # timestamp[us, UTC]: isAdjustedToUTC=true → Spark TimestampType
        # (NTZ inference never triggers), microsecond precision exactly
        # like the connector's envelope.
        return pa.schema(
            [
                pa.field("key", pa.binary()),
                pa.field("value", pa.binary()),
                pa.field("topic", pa.string()),
                pa.field("partition", pa.int32()),
                pa.field("offset", pa.int64()),
                pa.field("timestamp", pa.timestamp("us", tz="UTC")),
                pa.field("timestampType", pa.int32()),
                pa.field(
                    "headers",
                    pa.list_(
                        pa.struct(
                            [
                                pa.field("key", pa.string()),
                                pa.field("value", pa.binary()),
                            ]
                        )
                    ),
                ),
            ]
        )

    def _resume_offsets(self) -> None:
        """Scan existing replay files once so a fresh writer instance
        continues each topic-partition's log instead of reusing
        offsets."""
        import glob

        import pyarrow.parquet as pq

        for f in glob.glob(os.path.join(self.path, "*.parquet")):
            t = pq.read_table(f, columns=["topic", "partition", "offset"])
            for topic, part, off in zip(*(c.to_pylist() for c in t.columns)):
                k = (topic, int(part))
                if self._next_offset.get(k, 0) <= off:
                    self._next_offset[k] = off + 1

    def append_batch(
        self,
        records: list[dict],
        batch_name: str | None = None,
    ) -> None:
        """Append one micro-batch.  Each record: ``{"value": bytes,
        "key": bytes|None, "partition": int (default 0), "headers":
        list[(str, bytes)]|None, "timestamp": datetime|None}``.
        Offsets are assigned here, per (topic, partition), dense from
        the current log end."""
        import datetime as _dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.path, exist_ok=True)
        if not self._next_offset:
            self._resume_offsets()
        rows = {k: [] for k in (
            "key", "value", "topic", "partition", "offset",
            "timestamp", "timestampType", "headers",
        )}
        epoch = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
        for rec in records:
            part = int(rec.get("partition", 0))
            k = (self.topic, part)
            off = self._next_offset.get(k, 0)
            self._next_offset[k] = off + 1
            rows["key"].append(rec.get("key"))
            rows["value"].append(rec["value"])
            rows["topic"].append(self.topic)
            rows["partition"].append(part)
            rows["offset"].append(off)
            # deterministic default clock: epoch + offset seconds
            rows["timestamp"].append(
                rec.get("timestamp") or epoch + _dt.timedelta(seconds=off)
            )
            rows["timestampType"].append(self.timestamp_type)
            rows["headers"].append(
                None
                if rec.get("headers") is None
                else [{"key": hk, "value": hv} for hk, hv in rec["headers"]]
            )
        table = pa.Table.from_pydict(rows, schema=self._arrow_schema())
        name = batch_name or f"batch-{len(os.listdir(self.path)):06d}"
        tmp = os.path.join(self.path, f".{name}.parquet.tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(self.path, f"{name}.parquet"))

    def load_stream(
        self, spark: SparkSession, max_files_per_trigger: int = 1
    ) -> DataFrame:
        """Unbounded envelope frame — schema-identical to
        ``KafkaSource.load_stream`` (KAFKA_ENVELOPE_SCHEMA)."""
        from spark_streaming_kafka2elasticsearch_spark.schemas import KAFKA_ENVELOPE_SCHEMA

        return (
            spark.readStream.schema(KAFKA_ENVELOPE_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(self.path)
        )

    def load(self, spark: SparkSession) -> DataFrame:
        """Bounded batch read of the replay log (offset-range replay)."""
        from spark_streaming_kafka2elasticsearch_spark.schemas import KAFKA_ENVELOPE_SCHEMA

        return spark.read.schema(KAFKA_ENVELOPE_SCHEMA).parquet(self.path)
