"""Runnable application — the reference's ``main()`` end-to-end, as a
config-driven job builder.

The reference wires its pipeline imperatively inside ``main()``
(``bexley_spark_stream_msk_es.py:65-181``): Secrets-Manager config →
session → Kafka source → parse/curate → MySQL dim join → Elasticsearch
foreachBatch upsert → ``awaitTermination``.  ``build_job`` is that
wiring as a pure function over an injectable ``ConfigProvider`` and
swappable source/dim/sink — so the SAME composition runs in production
(Kafka + JDBC + ES) and under test (JSON dir + literal dim + parquet
sink), which the reference itself says its staged transforms were
designed for (``:374-377``).

A user of the reference switches by exporting the same knobs it read
from the environment/Secrets Manager and running::

    python -m spark_streaming_kafka2elasticsearch_spark.app
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

import logging

from spark_streaming_kafka2elasticsearch_spark.config import ConfigProvider, EnvConfig
from spark_streaming_kafka2elasticsearch_spark.logging_util import (
    configure_json_logging,
)
from spark_streaming_kafka2elasticsearch_spark.session import build_session
from spark_streaming_kafka2elasticsearch_spark.sources.jdbc import JdbcSource
from spark_streaming_kafka2elasticsearch_spark.sources.kafka import KafkaSource
from spark_streaming_kafka2elasticsearch_spark.streaming.jobs import (
    orders_enrichment_stream,
)
from spark_streaming_kafka2elasticsearch_spark.streaming.sinks import (
    ElasticsearchUpsertSink,
)

log = logging.getLogger(__name__)


@dataclass
class OrdersEtlApp:
    """The Kafka → curate → dim-join → Elasticsearch upsert job.

    Every collaborator is injectable; defaults are built from config
    keys mirroring the reference's env/secret names (``:44-52,69-100``).
    """

    config: ConfigProvider
    source: Any = None  # object with .load_stream(spark) -> DataFrame
    dim: Any = None  # DataFrame or object with .load(spark, cache=...)
    sink: Any = None  # object with .start(stream, checkpoint_dir) -> query

    def _source(self) -> Any:
        if self.source is not None:
            return self.source
        c = self.config
        return KafkaSource(
            bootstrap_servers=c.get("KAFKA_BOOTSTRAP"),
            topic=c.get("KAFKA_TOPIC", "orders"),
            starting_offsets=c.get("KAFKA_STARTING_OFFSETS", "latest"),
            max_offsets_per_trigger=(
                int(mo) if (mo := c.get("KAFKA_MAX_OFFSETS")) else None
            ),
            sasl_username=c.get("KAFKA_SASL_USER"),
            sasl_password=c.get("KAFKA_SASL_PASSWORD"),
        )

    def _dim(self, spark: SparkSession) -> Any:
        if self.dim is not None:
            return self.dim
        c = self.config
        return JdbcSource(
            url=c.get("DB_URL"),
            query=c.get("DB_QUERY", "SELECT city_id, city FROM vw_uk_cities"),
            user=c.get("DB_USER"),
            password=c.get("DB_PASSWORD"),
            driver=c.get("DB_DRIVER", "com.mysql.cj.jdbc.Driver"),
        ).load(spark, cache=True)

    def _sink(self) -> Any:
        if self.sink is not None:
            return self.sink
        c = self.config
        return ElasticsearchUpsertSink(
            nodes=c.get("ES_NODES"),
            port=int(c.get("ES_PORT", 9200)),
            index=c.get("ES_INDEX", "orders-v1"),
            username=c.get("ES_USER"),
            password=c.get("ES_PASSWORD"),
        )

    def start(self, spark: SparkSession) -> StreamingQuery:
        log.info("starting orders ETL", extra={"stage": "app_start"})
        dim = self._dim(spark)
        dim_df = dim if hasattr(dim, "columns") else dim.load(spark, cache=True)
        stream = orders_enrichment_stream(spark, self._source(), dim_df)
        checkpoint = self.config.get("CHECKPOINT_DIR", "/tmp/spark_checkpoints/orders")
        return self._sink().start(stream, checkpoint_dir=checkpoint)


def main() -> None:  # pragma: no cover - the production entrypoint
    configure_json_logging()  # ECS JSON lines, as the reference logs (I4)
    config = EnvConfig(prefix="ORDERS_ETL_")
    spark = build_session(app_name=config.get("APP_NAME", "orders-etl"))
    query = OrdersEtlApp(config).start(spark)
    query.awaitTermination()


if __name__ == "__main__":  # pragma: no cover
    main()
