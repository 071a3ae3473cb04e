"""Kafka source (S1) — full option surface of the reference.

Parity with ``extract_json_from_kafka_stream`` (reference
``bexley_spark_stream_msk_es.py:191-221``): SASL auth, subscribe topic,
starting offsets, headers, and the rate cap the reference authored but
disabled (``maxOffsetsPerTrigger``, ``:101,212`` — we expose it as a
real parameter because at scale backpressure is not optional).

This module builds *options*, not connections — it needs the
spark-sql-kafka package on the classpath only when actually started,
so the engine imports and unit-tests cleanly without Kafka.  The
envelope DATAFLOW (7 columns + headers, binary key/value, offset
bookkeeping) is driven end-to-end without a broker by
``sources.files.KafkaEnvelopeReplaySource``, which emits a
schema-identical frame from parquet replay files.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class KafkaSource:
    """Streaming (or batch-replay) Kafka reader.

    ``sasl_username``/``sasl_password`` follow the reference's
    SASL-SCRAM setup (``:201-211``); leave them ``None`` for
    PLAINTEXT brokers (local dev / tests).
    """

    bootstrap_servers: str
    topic: str
    starting_offsets: str = "latest"  # reference default; "earliest" = replay (:102)
    include_headers: bool = True  # reference ":206"
    max_offsets_per_trigger: int | None = None  # reference authored-disabled (:101)
    sasl_username: str | None = None
    sasl_password: str | None = None
    sasl_mechanism: str = "SCRAM-SHA-512"
    security_protocol: str = "SASL_SSL"
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts: dict[str, str] = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": self.topic,
            "startingOffsets": self.starting_offsets,
            "includeHeaders": str(self.include_headers).lower(),
        }
        if self.max_offsets_per_trigger is not None:
            opts["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        if self.sasl_username is not None:
            if self.sasl_password is None:
                raise ValueError(
                    "sasl_password is required when sasl_username is set"
                )

            def _esc(s: str) -> str:
                # JAAS values live inside double quotes: escape backslash
                # first, then the quote itself.
                return s.replace("\\", "\\\\").replace('"', '\\"')

            jaas = (
                "org.apache.kafka.common.security.scram.ScramLoginModule required "
                f'username="{_esc(self.sasl_username)}" '
                f'password="{_esc(self.sasl_password)}";'
            )
            opts.update(
                {
                    "kafka.sasl.mechanism": self.sasl_mechanism,
                    "kafka.security.protocol": self.security_protocol,
                    "kafka.sasl.jaas.config": jaas,
                }
            )
        opts.update(self.extra_options)
        return opts

    def load_stream(self, spark: SparkSession) -> DataFrame:
        """Unbounded envelope frame (schema = KAFKA_ENVELOPE_SCHEMA)."""
        return spark.readStream.format("kafka").options(**self.options()).load()

    def load(self, spark: SparkSession) -> DataFrame:
        """Bounded batch read of the same topic (offset-range replay)."""
        opts = self.options()
        opts.pop("maxOffsetsPerTrigger", None)
        # Spark rejects startingOffsets='latest' for batch Kafka queries
        # (nothing to read between latest and latest); replay from the
        # beginning unless the caller gave explicit offsets.
        if opts.get("startingOffsets") == "latest":
            opts["startingOffsets"] = "earliest"
        return spark.read.format("kafka").options(**opts).load()
