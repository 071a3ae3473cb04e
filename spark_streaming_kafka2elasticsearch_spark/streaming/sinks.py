"""Streaming sinks (SURVEY.md §2.5, K1–K4).

The reference's delivery contract: at-least-once micro-batch writes
made *effectively-once* by an idempotent document key — foreachBatch
hands each epoch back to Python, which bulk-writes with
``es.mapping.id = data_key`` so replays overwrite instead of duplicate
(reference ``bexley_spark_stream_msk_es.py:506-531``, key derivation
``:396``, id mapping ``:515``).

We reproduce that as a **KeyedUpsertSink** family: the prod
implementation targets Elasticsearch (option-compatible, requires the
es-hadoop connector on the classpath); the test/local implementations
MERGE-by-key into a parquet table or an in-memory dict, preserving the
replay-idempotency semantics exactly — which is what the streaming
tests assert by re-delivering a batch.

Scale note: the upsert key must be high-cardinality and stable
(order_number + date-day here); the merge itself is a per-batch join
against the sink table, so at 100 TB the sink table must be
partitioned/bucketed by key (or be a real MERGE-capable store: Delta,
Iceberg, ES) — the parquet rewrite here is the semantics-faithful
test double, not the scale path, and says so loudly.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_console_sink(
    stream: DataFrame,
    output_mode: str = "complete",
    truncate: bool = False,
    query_name: str = "console_debug",
) -> StreamingQuery:
    """K1 — debug console writer (reference ``:465-476``); ``complete``
    mode mirrors the reference's choice for the windowed agg (``:470``)."""
    return (
        stream.writeStream.format("console")
        .outputMode(output_mode)
        .option("truncate", str(truncate).lower())
        .queryName(query_name)
        .start()
    )


@dataclass
class KeyedUpsertParquetSink:
    """K2 (test/local impl) — foreachBatch MERGE-by-key into parquet.

    Last-write-wins per ``key_col`` within and across batches; replayed
    epochs converge to the same table (idempotent).  The table swap is
    write-tmp-then-rename — atomic enough for tests; production should
    bind the same ``write_batch`` contract to a transactional store.
    """

    path: str
    key_col: str = "data_key"

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from spark_streaming_kafka2elasticsearch_spark.operators.merge import (
            merge_upsert,
        )

        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates([self.key_col])
        if os.path.exists(self.path):
            # One MERGE definition for the whole engine: the batch
            # operator IS the per-epoch upsert (anti-join + union).
            merged = merge_upsert(
                spark.read.parquet(self.path), fresh, keys=[self.key_col]
            )
        else:
            merged = fresh
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str | None = None,
        query_name: str = "keyed_upsert",
    ) -> StreamingQuery:
        """Wire as the reference does: foreachBatch + queryName + start
        (reference ``:521-531``), with the checkpoint location (K4) on
        the stream writer where it belongs (the reference quirkily put
        it inside the batch writer, ``:517``)."""
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix="chk_")
        return (
            stream.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )

    def read(self, spark: Any) -> DataFrame:
        return spark.read.parquet(self.path)


@dataclass
class KeyedUpsertMemorySink:
    """K2 (unit-test impl) — upsert into a driver-side dict.

    Only for small-result assertions (it collects!); the value is that
    idempotency tests can inspect exact key→row state cheaply.
    """

    key_col: str = "data_key"
    rows: dict[str, Any] = field(default_factory=dict)
    epochs_seen: list[int] = field(default_factory=list)

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        self.epochs_seen.append(epoch_id)
        for row in batch_df.collect():
            self.rows[row[self.key_col]] = row.asDict()

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str | None = None,
        query_name: str = "keyed_upsert_mem",
    ) -> StreamingQuery:
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix="chk_")
        return (
            stream.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )


@dataclass
class ElasticsearchUpsertSink:
    """K2 (prod impl) — option-parity Elasticsearch batch writer.

    Builds exactly the reference's writer options (``:506-518``):
    ``es.mapping.id`` (⇒ upsert), ``es.nodes.wan.only``, auth, index
    resource.  Requires the elasticsearch-hadoop connector at runtime;
    constructing the sink (e.g. for config validation/tests) does not.
    """

    nodes: str
    index: str
    port: int = 9200  # reference sets es.port explicitly (:510)
    username: str | None = None
    password: str | None = None
    key_col: str = "data_key"
    wan_only: bool = True
    extra_options: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts = {
            "es.nodes": self.nodes,
            "es.port": str(self.port),
            "es.resource": self.index,
            "es.mapping.id": self.key_col,
            "es.nodes.wan.only": str(self.wan_only).lower(),
        }
        if self.username is not None:
            opts["es.net.http.auth.user"] = self.username
        if self.password is not None:
            opts["es.net.http.auth.pass"] = self.password
        opts.update(self.extra_options)
        return opts

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .format("es")
            .options(**self.options())
            .save()
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        query_name: str = "es_upsert",
    ) -> StreamingQuery:
        return (
            stream.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )


@dataclass
class KeyedUpsertJdbcSink:
    """K2 (database impl) — foreachBatch MERGE-by-key into a JDBC
    table, the relational twin of the ES ``es.mapping.id`` upsert.

    Two-phase per epoch, and only the cheap phase is driver-side:

    1. the batch lands EXECUTOR-PARALLEL into a staging table via
       Spark's JDBC writer (the same parallel path as any JDBC write);
    2. one set-based ``MERGE INTO target USING staging ON key`` runs
       as a single driver-issued statement — executed *by the
       database*, so the driver never touches row data.

    Replays re-stage and re-merge the same rows → same final state
    (idempotent, K4-compatible).  The target is created from the first
    epoch when absent.  String keys default to VARCHAR(512) via
    ``createTableColumnTypes`` — Spark's Derby dialect otherwise maps
    StringType to CLOB, which Derby cannot compare in the ON clause.

    Tested end-to-end on embedded Derby (same-JVM only — production
    points ``url`` at a server database; the two-phase shape is
    unchanged).
    """

    url: str
    table: str
    driver: str
    key_col: str = "data_key"
    staging_table: str | None = None
    create_table_column_types: str | None = None

    def _conn(self, jvm):
        return jvm.java.sql.DriverManager.getConnection(self.url)

    def _table_exists(self, jvm) -> bool:
        conn = self._conn(jvm)
        try:
            stmt = conn.createStatement()
            try:
                stmt.executeQuery(
                    f'SELECT 1 FROM "{self.table}" FETCH FIRST 1 ROWS ONLY'
                )
                return True
            except Exception:
                return False
            finally:
                stmt.close()
        finally:
            conn.close()

    def _jdbc_writer(self, df: DataFrame, dbtable: str):
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("driver", self.driver)
            .option("dbtable", f'"{dbtable}"')
        )
        types = self.create_table_column_types
        if types is None and dict(df.dtypes).get(self.key_col) == "string":
            types = f"{self.key_col} VARCHAR(512)"
        if types:
            w = w.option("createTableColumnTypes", types)
        return w

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        fresh = batch_df.dropDuplicates([self.key_col])
        jvm = batch_df.sparkSession._jvm
        if not self._table_exists(jvm):
            # First epoch: the target IS the batch (an upsert into an
            # empty table). A crash between this write and checkpoint
            # commit replays into the merge path below — still idempotent.
            self._jdbc_writer(fresh, self.table).mode("overwrite").save()
            return
        staging = self.staging_table or f"{self.table}_staging"
        self._jdbc_writer(fresh, staging).mode("overwrite").save()
        cols = fresh.columns
        val_cols = [c for c in cols if c != self.key_col]
        set_clause = ", ".join(f'"{c}" = s."{c}"' for c in val_cols)
        insert_cols = ", ".join(f'"{c}"' for c in cols)
        insert_vals = ", ".join(f's."{c}"' for c in cols)
        merge_sql = (
            f'MERGE INTO "{self.table}" t USING "{staging}" s '
            f'ON t."{self.key_col}" = s."{self.key_col}" '
            f"WHEN MATCHED THEN UPDATE SET {set_clause} "
            f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) "
            f"VALUES ({insert_vals})"
        )
        conn = self._conn(jvm)
        try:
            stmt = conn.createStatement()
            try:
                stmt.executeUpdate(merge_sql)
            finally:
                stmt.close()
        finally:
            conn.close()

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str | None = None,
        query_name: str = "jdbc_upsert",
    ) -> StreamingQuery:
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix="chk_")
        return (
            stream.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )

    def read(self, spark: Any) -> DataFrame:
        return (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("driver", self.driver)
            .option("dbtable", f'"{self.table}"')
            .load()
        )


class RowForeachSink:
    """Row-level ``foreach`` sink — the alternative the reference's K3
    docstring weighs against ``foreachBatch`` and rejects for bulk
    stores (reference ``bexley_spark_stream_msk_es.py:479-499``): one
    connection-ish lifecycle per (partition, epoch) via
    ``open(partition_id, epoch_id) → process(row) → close(error)``,
    instead of one bulk write per epoch.

    The engine ships it anyway because the lifecycle is the right fit
    when the target is a per-record API (a queue producer, a webhook, a
    metrics counter) rather than a batch store.  This implementation
    appends each row as a JSON line to
    ``<target_dir>/p<partition>-e<epoch>.jsonl`` — files are opened in
    ``open`` and closed in ``close``, making the lifecycle itself
    observable by tests.  Delivery is at-least-once (a replayed epoch
    rewrites its own ``p*-e<epoch>`` files, never other epochs'), so
    downstream consumers key on (partition, epoch) for idempotence —
    the same replay story as the keyed-upsert family, expressed in
    file names instead of a MERGE key.

    Scale note: every row crosses the JVM→Python bridge one at a time
    — this is THE slow path the engine's docs warn about, acceptable
    only when the per-row side effect dominates anyway.  Bulk stores
    (ES, JDBC, parquet) always take the foreachBatch sinks above.
    """

    def __init__(self, target_dir: str) -> None:
        self.target_dir = target_dir
        self._fh: Any = None
        self._path: str | None = None

    # -- ForeachWriter lifecycle -------------------------------------
    def open(self, partition_id: int, epoch_id: int) -> bool:  # noqa: A003
        os.makedirs(self.target_dir, exist_ok=True)
        self._path = os.path.join(
            self.target_dir, f"p{partition_id}-e{epoch_id}.jsonl"
        )
        # "w", not "a": an epoch replay overwrites its own output — the
        # file-level idempotence the docstring promises.
        self._fh = open(self._path, "w")
        return True  # accept this (partition, epoch)

    def process(self, row: Any) -> None:
        import json as _json

        self._fh.write(_json.dumps(row.asDict(), default=str) + "\n")

    def close(self, error: Exception | None) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if error is not None:
            raise error

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str | None = None,
        query_name: str = "row_foreach",
    ) -> StreamingQuery:
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix="chk_")
        return (
            stream.writeStream.foreach(self)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )


@dataclass
class IncrementalAggParquetSink:
    """Streaming materialized-view maintenance: every micro-batch folds
    into a keyed aggregate table via ``operators.merge.
    incremental_agg_merge`` — the streaming face of the nightly MV
    refresh, and the scale-correct alternative to complete-mode aggs
    (state is the aggregate TABLE, not an in-memory store; history is
    never rescanned).

    Idempotence differs from the upsert sinks in kind: an upsert
    replay converges because overwrite is idempotent, but a FOLD is
    additive — replaying an epoch would double-count.  So this sink
    keeps an epoch watermark next to the table and silently skips any
    epoch ≤ the last applied one (exactly-once effect under
    at-least-once delivery).  The marker is written after the table
    swap; a crash BETWEEN the two re-folds one epoch on restart — a
    transactional store (Delta/Iceberg) commits both in one
    transaction, which is the production binding of this contract and
    why the two writes sit adjacent here.
    """

    path: str
    keys: tuple[str, ...] = ("k",)
    sum_cols: tuple[str, ...] = ("v",)
    count_col: str = "n_rows"
    #: Epoch watermarks are per QUERY LINEAGE (a checkpoint's epoch
    #: counter restarts from 0 for a new query) — so the marker is
    #: scoped by this name.  One MV fed by several writers (or by a
    #: query restarted with a FRESH checkpoint) needs a distinct
    #: lineage per writer, or the new writer's epoch 0 would be
    #: mistaken for a replay of the old one's.
    lineage: str = "default"

    def _marker(self) -> str:
        return f"{self.path}__epoch_{self.lineage}"

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from spark_streaming_kafka2elasticsearch_spark.operators.merge import (
            incremental_agg_merge,
        )

        last = -1
        if os.path.exists(self._marker()):
            with open(self._marker()) as fh:
                last = int(fh.read().strip() or -1)
        if epoch_id <= last:
            return  # replayed epoch: already folded
        spark = batch_df.sparkSession
        if os.path.exists(self.path):
            prev = spark.read.parquet(self.path)
        else:
            prev = self._empty_agg(batch_df)
        out = incremental_agg_merge(
            prev, batch_df, list(self.keys), list(self.sum_cols), self.count_col
        )
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex}"
        out.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)
        with open(self._marker(), "w") as fh:
            fh.write(str(epoch_id))

    def _empty_agg(self, batch_df: DataFrame) -> DataFrame:
        dec = "decimal(28,10)"
        return batch_df.limit(0).select(
            *self.keys,
            *[F.col(c).cast(dec).alias(f"sum_{c}") for c in self.sum_cols],
            F.lit(0).cast("long").alias(self.count_col),
        )

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str | None = None,
        query_name: str = "incremental_agg",
    ) -> StreamingQuery:
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix="chk_")
        return (
            stream.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )

    def read(self, spark: Any) -> DataFrame:
        return spark.read.parquet(self.path)


@dataclass
class CountMinParquetSink:
    """Streaming frequency-sketch maintenance: every micro-batch's
    items fold into a stored Count-Min grid by cell-wise sum
    (operators/sketches.py) — the streaming twin of the HLL rollup
    for *frequency* (not distinct-count) questions: "how often has
    this token/URL/user appeared, ever?" answered from depth×width
    counters instead of an unbounded keyed state store.

    Mergeability is what makes this exactly-once-able the same way as
    IncrementalAggParquetSink: the fold is additive, so the sink keeps
    the identical per-lineage epoch watermark and skips replayed
    epochs.  The stored artifact stays ≤ depth×width rows forever —
    state size is O(1) in stream length, the whole point of a sketch.
    """

    path: str
    item_col: str = "tok"
    depth: int = 4
    width: int = 1024
    lineage: str = "default"

    def _marker(self) -> str:
        return f"{self.path}__epoch_{self.lineage}"

    def write_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from spark_streaming_kafka2elasticsearch_spark.operators.sketches import (
            countmin_merge,
            countmin_sketch,
        )

        last = -1
        if os.path.exists(self._marker()):
            with open(self._marker()) as fh:
                last = int(fh.read().strip() or -1)
        if epoch_id <= last:
            return  # replayed epoch: already folded
        spark = batch_df.sparkSession
        batch_sketch = countmin_sketch(
            batch_df, self.item_col, depth=self.depth, width=self.width
        )
        if os.path.exists(self.path):
            prev = spark.read.parquet(self.path)
            merged = countmin_merge(prev.unionByName(batch_sketch))
        else:
            merged = batch_sketch
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)
        with open(self._marker(), "w") as fh:
            fh.write(str(epoch_id))

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str | None = None,
        query_name: str = "countmin_sketch",
    ) -> StreamingQuery:
        if checkpoint_dir is None:
            checkpoint_dir = tempfile.mkdtemp(prefix="chk_")
        return (
            stream.writeStream.foreachBatch(self.write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .start()
        )

    def read(self, spark: Any) -> DataFrame:
        return spark.read.parquet(self.path)
