"""Mergeable frequency sketches — Count-Min (Cormode & Muthukrishnan
2005) expressed as plain DataFrame aggregations.

North-star extension (no reference counterpart; the reference is a
linear streaming ETL).  The 100 TB story: a Count-Min sketch is a
(depth × width) grid of counters that is **mergeable by cell-wise
sum**, so per-partition / per-source / per-day sketches roll up with
one tiny groupBy — the full corpus never re-aggregates.  Estimates
overestimate only (min over depth rows), with error ≤ ε·N for
width ≈ e/ε at failure probability e^(−depth).

Hashes are md5-derived Kirsch–Mitzenmacher (one md5 per item, row j
uses ``(h1 + j·h2) mod width``) — the same recipe as the MinHash md5
family (operators/dedup.py) — so every counter, and therefore every
estimate, is bit-reproducible in any SQL engine: unlike the HLL
rollup (queries/extended.py:distinct_users_sketch_rollup, whose JVM
sketch has no SQL twin) the Count-Min path gets a FULL DuckDB oracle.

Everything here is codegen'd Catalyst expressions — no UDFs: the
sketch build is one partial-aggregating groupBy over an exploded
(item → depth rows) relation; the estimate is a broadcast join of the
tiny sketch against candidate items.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _km_buckets(item: Column, depth: int, width: int) -> list[Column]:
    """Row-j bucket columns via one shared md5: h1/h2 are the 32-bit
    halves (h2 forced odd), bucket_j = (h1 + j·h2) & (width−1).  The
    38-bit intermediate never overflows a long (ANSI-safe)."""
    if width & (width - 1):
        raise ValueError(f"width must be a power of two, got {width}")
    hx = F.md5(item)
    h1 = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").bitwiseOR(F.lit(1))
    mask = F.lit(width - 1)
    return [(h1 + F.lit(j) * h2).bitwiseAND(mask) for j in range(depth)]


def countmin_sketch(
    df: DataFrame,
    item_col: str,
    group_cols: Sequence[str] = (),
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build one Count-Min sketch per ``group_cols`` combination (or a
    single global one): rows ``(*group_cols, cm_row, cm_bucket,
    cm_count)``.  Shape: explode each item into ``depth`` (row, bucket)
    pairs, then ONE partial-aggregating groupBy — executors ship at
    most depth×width counters per group regardless of input size."""
    from spark_streaming_kafka2elasticsearch_spark.operators.partitioning import (
        fan_out_small_scan,
    )

    buckets = _km_buckets(F.col(item_col), depth, width)
    # the per-item md5 + K-M bucket math is CPU-heavy; a one-split
    # upstream (sf-scale scans) would run it single-threaded — fan out
    # first (scale-adaptive no-op when already parallel).
    exploded = fan_out_small_scan(df.select(*group_cols, item_col)).select(
        *group_cols,
        F.posexplode(F.array(*buckets)).alias("cm_row", "cm_bucket"),
    )
    return exploded.groupBy(*group_cols, "cm_row", "cm_bucket").agg(
        F.count(F.lit(1)).alias("cm_count")
    )


def countmin_merge(sketch: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Merge sketches by cell-wise sum, keeping ``group_cols`` (drop
    all = global sketch).  This one-line groupBy is the entire 100 TB
    rollup story: per-source/day sketches combine without touching the
    underlying corpus."""
    return sketch.groupBy(*group_cols, "cm_row", "cm_bucket").agg(
        F.sum("cm_count").alias("cm_count")
    )


def countmin_estimate(
    items: DataFrame,
    sketch: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each item's count: min over the item's depth
    cells.  The sketch (≤ depth×width rows) is broadcast, so the probe
    is a zero-shuffle map over ``items``; absent cells count 0."""
    buckets = _km_buckets(F.col(item_col), depth, width)
    probed = items.select(
        item_col,
        F.posexplode(F.array(*buckets)).alias("cm_row", "cm_bucket"),
    )
    return (
        probed.join(F.broadcast(sketch), ["cm_row", "cm_bucket"], "left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cm_count"), F.lit(0))).alias("cm_estimate")
        )
    )
