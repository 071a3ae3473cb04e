"""Batch table writer — the storage-layout half of the scale story.

At 100 TB, how a table is laid down decides every later query's cost:

* **partition columns** → partition pruning (a date/tenant filter
  skips whole directories);
* **bucketing** → co-located joins: two tables bucketed by the same
  key join with ZERO shuffle (the single biggest join optimization
  Spark offers for repeated big–big joins);
* **sized files** → ``maxRecordsPerFile`` bounds file size so a scan
  parallelizes without small-file storms.

``write_table`` is deliberately thin — it composes public
DataFrameWriter options; the value is encoding the layout decisions
(and their rationale) as one reviewed code path instead of scattered
``.write`` calls.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Partitioned (hive-layout) write."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Bucketed managed table (bucketing requires saveAsTable).

    Join two tables bucketed by the same key/count and Catalyst elides
    both exchanges — the plan shows SortMergeJoin with no Exchange
    under it.  That property is asserted in tests.
    """
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table_name)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    max_records_per_file: int | None = None,
) -> None:
    """Incremental partition overwrite — replace ONLY the partitions
    present in ``df``, leave every other partition untouched.

    This is the daily-load primitive at 100 TB: re-landing one day of
    a years-deep date-partitioned table must rewrite one directory,
    not the table.  Implemented with Spark's dynamic partition
    overwrite (``partitionOverwriteMode=dynamic``), scoped to this
    write via the writer option so the session default stays static
    (static mode protects full-table overwrites from surprise
    partial-delete semantics)."""
    if not partition_by:
        raise ValueError("overwrite_partitions requires partition columns")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)


def compact_table(
    spark,
    path: str,
    target_files: int,
    partition_by: Sequence[str] = (),
) -> None:
    """Small-file compaction: rewrite a parquet table into
    ``target_files`` files (per partition when partitioned).

    Streaming sinks and incremental loads accrete small files until
    scan planning (footer reads, task scheduling) dominates query
    time; periodic compaction is standard hygiene.  Uses a fresh read
    + repartition so the rewrite is one shuffle-free-if-coalescable
    pass, staged through a temp dir then atomically swapped via
    rename (a direct overwrite of the path being read would truncate
    the input mid-scan)."""
    import shutil
    import uuid

    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    if partition_by:
        out = df.repartition(target_files, *[df[c] for c in partition_by])
        out.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    else:
        out = df.repartition(target_files)
        out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
