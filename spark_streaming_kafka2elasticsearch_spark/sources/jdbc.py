"""JDBC source (S2/S3) — dimension tables from a relational store.

Parity with ``extract_ship_cities_from_mysql`` (reference
``bexley_spark_stream_msk_es.py:254-285``): whole-query pushdown via
``option("query", ...)`` — the database parses/optimizes/executes the
SQL and Spark wraps the result as a scan.

Two scale upgrades over the reference:

* **parallel reads** — the reference sets no partitionColumn, so its
  read is a single partition; we expose (column, bounds, num) so a big
  dim fans out across executors;
* **read-once caching** — the reference re-reads the dim every
  micro-batch; ``load(cache=True)`` pins it (SURVEY.md §4 improvement).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    url: str
    query: str | None = None
    table: str | None = None
    user: str | None = None
    password: str | None = None
    driver: str | None = None  # e.g. "com.mysql.cj.jdbc.Driver"
    partition_column: str | None = None
    lower_bound: int | None = None
    upper_bound: int | None = None
    num_partitions: int | None = None
    extra_options: dict[str, str] = field(default_factory=dict)

    def load(self, spark: SparkSession, cache: bool = False) -> DataFrame:
        if (self.query is None) == (self.table is None):
            raise ValueError("exactly one of query/table must be set")
        reader = spark.read.format("jdbc").option("url", self.url)
        if self.query is not None:
            reader = reader.option("query", self.query)
        else:
            reader = reader.option("dbtable", self.table)
        if self.user is not None:
            reader = reader.option("user", self.user)
        if self.password is not None:
            reader = reader.option("password", self.password)
        if self.driver is not None:
            reader = reader.option("driver", self.driver)
        if self.partition_column is not None:
            # partitionColumn requires dbtable-style reads + bounds.
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("lowerBound", str(self.lower_bound))
                .option("upperBound", str(self.upper_bound))
                .option("numPartitions", str(self.num_partitions or 8))
            )
        for k, v in self.extra_options.items():
            reader = reader.option(k, v)
        df = reader.load()
        return df.cache() if cache else df
