"""Scan-parallelism repair for CPU-heavy first stages (guide §2.2/§6).

A sub-128 MB parquet table arrives as ONE scan split
(``spark.sql.files.maxPartitionBytes``), and a single-row-group file
cannot be split further — so every hash/tokenize/decode-heavy stage
chained directly on such a scan runs as ONE task regardless of core
count.  At the bench scale factors the documents/embeddings tables are
exactly that shape, and the r14 scaling block measured the resulting
inversions (whole families faster at 8 cores than 32, decode ratios
0.29–0.33).

:func:`fan_out_small_scan` repartitions the (small by construction)
input across the session's task slots BEFORE the heavy per-row work.
It is scale-adaptive, never a constant: a source that already has
``defaultParallelism`` or more partitions is returned untouched — on a
real 100 TB corpus the scan is already parallel and this is a no-op —
and only the narrow pre-explode rows ever move.  Round-robin
repartition is retry-safe (``spark.sql.execution.sortBeforeRepartition``
stays on), and every consumer below it is a set-semantics aggregation
or deterministically tie-broken window, so results are
partitioning-independent (pinned by the oracle gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it currently
    has fewer partitions — the narrow-input fan-out for CPU-bound
    stages.  See the module docstring for the contract."""
    import os

    if os.environ.get("SPARK_GRAFT_FAN_OUT", "1") == "0":
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
