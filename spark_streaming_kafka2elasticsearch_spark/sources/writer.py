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
