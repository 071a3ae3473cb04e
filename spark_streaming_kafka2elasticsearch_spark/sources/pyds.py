"""Spark 4 Python DataSource: the Kafka-envelope replay as a REAL
``spark.read.format("kafka_replay")`` source.

``KafkaEnvelopeReplaySource`` (sources/files.py) replays an envelope
through schema'd parquet/json readers; this module exposes the same
contract through the modern extension point — ``pyspark.sql.
datasource.DataSource`` — so the replay directory behaves like any
built-in format: register once per session, then

    spark.dataSource.register(KafkaReplayDataSource)
    df = (spark.read.format("kafka_replay")
          .option("path", dir).option("topic", "orders").load())

yields the exact 7-column-plus-headers Kafka envelope
(schemas.KAFKA_ENVELOPE_SCHEMA) the reference prints at
``bexley_spark_stream_msk_es.py:292`` and our curate pipeline consumes.

Mapping (deterministic, so tests can pin offsets):

* each ``*.json``/``*.jsonl`` file in ``path`` (sorted) is one Kafka
  PARTITION — partition id = file index;
* each line is one record — ``offset`` = line number within the file,
  ``value`` = the raw line as bytes, ``key`` = null;
* ``timestamp`` = epoch + offset seconds (timestampType 0 =
  CreateTime), a controlled clock like every other test source;
* ``headers`` carries the originating file name — exercising the
  headers column end-to-end (``includeHeaders`` parity, reference
  ``:206``).

Scale note: ``partitions()`` returns one ``InputPartition`` per file,
so Spark schedules one task per replay partition — the same
parallelism contract the real Kafka source derives from topic
partitions.  The driver lists file NAMES only; bytes are read inside
each task.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: DDL twin of schemas.KAFKA_ENVELOPE_SCHEMA (the DataSource API wants
#: a schema the worker can rebuild without importing this package).
ENVELOPE_DDL = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key:string,value:binary>>"
)


@dataclass
class _FilePartition(InputPartition):
    index: int
    file_path: str


class KafkaReplayDataSource(DataSource):
    """``format("kafka_replay")`` — envelope replay over a JSONL dir."""

    @classmethod
    def name(cls) -> str:
        return "kafka_replay"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema) -> "KafkaReplayReader":  # noqa: ANN001
        return KafkaReplayReader(self.options)


class KafkaReplayReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options.get("path")
        if not self.path:
            raise ValueError("kafka_replay requires .option('path', <dir>)")
        self.topic = options.get("topic", "replay")

    def partitions(self):  # noqa: ANN201
        files = sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith((".json", ".jsonl")) and not f.startswith(".")
        )
        return [
            _FilePartition(i, os.path.join(self.path, f))
            for i, f in enumerate(files)
        ]

    def read(self, partition: _FilePartition):  # noqa: ANN201
        epoch = datetime(2020, 1, 1, tzinfo=timezone.utc)
        fname = os.path.basename(partition.file_path).encode()
        with open(partition.file_path, "rb") as fh:
            for offset, raw in enumerate(line for line in fh if line.strip()):
                yield (
                    None,  # key
                    raw.rstrip(b"\n"),  # value (raw bytes — P1 casts)
                    self.topic,
                    partition.index,
                    offset,
                    datetime.fromtimestamp(
                        epoch.timestamp() + offset, tz=timezone.utc
                    ),
                    0,  # CreateTime
                    [("source_file", fname)],
                )
