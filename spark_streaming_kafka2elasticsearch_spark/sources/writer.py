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


def compact_partitions(
    spark,
    path: str,
    partition_col: str,
    max_files_per_partition: int = 4,
    target_files_per_partition: int = 1,
) -> list:
    """Compact ONLY the oversized partitions of a hive-partitioned
    table — the maintenance primitive append-heavy layouts need
    (VERDICT r10 item 6): the incremental IVF index
    (operators/similarity.ivf_persisted_append, the streaming
    maintenance job) adds files per cell per delta, so at daily
    increments the per-cell file count grows without bound and scan
    planning (footer reads, task scheduling) eats the pruning win.

    Scans the partition directories, finds those whose data-file count
    exceeds ``max_files_per_partition``, reads JUST those partitions'
    rows (directory-pruned scan), breaks lineage with an eager local
    checkpoint (a dynamic overwrite of a path still being read would
    otherwise race its own input), and rewrites them via dynamic
    partition overwrite — untouched partitions keep their files
    byte-identical, readers of other partitions are never disturbed,
    and by determinism of content the serve-before == serve-after
    (the append-equals-rebuild oracle shape; pinned in tests).
    Underscore-prefixed entries (``_quantizer``, ``_SUCCESS``) are
    preserved — dynamic overwrite only replaces partition dirs.

    Returns the list of partition values that were compacted."""
    import os

    prefix = f"{partition_col}="
    oversized = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if not entry.startswith(prefix) or not os.path.isdir(full):
            continue
        n_files = sum(
            1
            for f in os.listdir(full)
            if not f.startswith((".", "_")) and f.endswith(".parquet")
        )
        if n_files > max_files_per_partition:
            oversized.append(entry[len(prefix):])
    if not oversized:
        return []
    df = spark.read.parquet(path)
    # partition values parse back typed (int cells); compare as string
    # so the filter matches the directory names just listed
    rows = df.filter(
        df[partition_col].cast("string").isin(oversized)
    ).localCheckpoint(eager=True)
    compacted = rows.repartition(
        max(target_files_per_partition * len(oversized), 1),
        rows[partition_col],
    )
    overwrite_partitions(compacted, path, [partition_col])
    rows.unpersist()
    return oversized


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
