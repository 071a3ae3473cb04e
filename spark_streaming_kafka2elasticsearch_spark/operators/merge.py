"""Batch keyed MERGE / upsert — the batch twin of the streaming
keyed-upsert sink (``streaming/sinks.py``), which reproduces the
reference's Elasticsearch doc-id upsert semantics (reference
``bexley_spark_stream_msk_es.py`` foreachBatch upsert).  Here the same
"latest row per key wins" contract is applied table-to-table, i.e.
ANSI ``MERGE INTO`` with whole-row UPDATE/INSERT and optional DELETE.

Scale shape: the merge is expressed as *anti-join + union*, not a full
outer join — the base (the 100 TB side) is only ever probed for key
membership:

* small update batches (the overwhelmingly common case: a day's
  changes into a years-deep table) **broadcast** the update keys, so
  the base never shuffles at all — survivors are a narrow
  BroadcastHashJoin(anti) map stage and the union is free;
* large update batches fall back to a key-partitioned sort-merge anti
  join — one shuffle of each side on the merge key, which is the
  floor for any keyed merge;
* at rest, writing the result with ``partitionBy`` on a stable bucket
  of the key (or dynamic partition overwrite limited to touched
  partitions) keeps the rewrite proportional to touched data, not
  table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
    broadcast_updates: bool | None = None,
) -> DataFrame:
    """MERGE ``updates`` into ``base`` on ``keys``: matched base rows
    are replaced by their update row, unmatched update rows are
    inserted, unmatched base rows survive.  If ``delete_col`` names a
    boolean column in ``updates``, rows with it true act as tombstones:
    they remove the matching base row and insert nothing (the column
    is dropped from the output).

    Both frames must share the non-key output schema (whole-row
    replace; project per-column merges into whole rows first).

    ``broadcast_updates``: force (True) or forbid (False) broadcasting
    the update side of the anti join; default None lets AQE decide
    from runtime stats, which picks broadcast exactly when the update
    batch is small — the case where the base avoids shuffling.
    """
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    missing = [k for k in keys if k not in base.columns or k not in updates.columns]
    if missing:
        raise ValueError(f"key columns missing from a side: {missing}")

    upd = updates
    if delete_col is not None:
        tombstones = upd.filter(F.col(delete_col))
        upd = upd.filter(~F.col(delete_col) | F.col(delete_col).isNull()).drop(
            delete_col
        )
        dead_keys = tombstones.select(*keys)
    else:
        dead_keys = None

    if set(base.columns) != set(upd.columns):
        raise ValueError(
            "whole-row merge requires matching columns: "
            f"base={sorted(base.columns)} updates={sorted(upd.columns)}"
        )

    # Only key membership of the update batch matters for the probe —
    # project before the (optional) broadcast so the exchanged build
    # side is keys-only no matter how wide the update rows are.
    upd_keys = upd.select(*keys).distinct()
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    if dead_keys is not None:
        upd_keys = upd_keys.unionByName(dead_keys).distinct()
        if broadcast_updates:
            upd_keys = F.broadcast(upd_keys)

    survivors = base.join(upd_keys, list(keys), "left_anti")
    return survivors.unionByName(upd.select(*base.columns))


def incremental_agg_merge(
    prev_agg: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Incremental maintenance of an algebraic aggregate — the nightly
    materialized-view refresh: fold a new DELTA of raw rows into
    yesterday's aggregate table WITHOUT rescanning history.

    ``prev_agg`` must carry ``keys + [f"sum_{c}" for c in sum_cols] +
    [count_col]`` (i.e. this function's own output schema, so refreshes
    chain day after day); ``delta`` is raw rows with ``keys`` and the
    measure columns.  Sums accumulate in DECIMAL(28,10) so a year of
    daily folds equals the one-shot aggregate bit-for-bit — with
    double sums the two paths would drift apart and reconciliation
    checks against a full recompute would false-alarm.

    Scale shape: the delta partial-aggregates map-side to its own key
    set, the union with the (aggregate-sized, not history-sized) prev
    table shuffles on the keys once, and history is never in the plan
    at all — refresh cost is O(delta + |distinct keys|), the whole
    point.  Works for any algebraic measure (sum/count here; avg =
    sum/count downstream; min/max would fold the same way).  Holistic
    measures (exact percentiles, distinct counts) do NOT fold — use
    sketches (HLL rollup, distinct_users_sketch_rollup) for those.
    """
    dec = "decimal(28,10)"
    partial = delta.groupBy(*keys).agg(
        *[F.sum(F.col(c).cast(dec)).alias(f"sum_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias(count_col),
    )
    prev_norm = prev_agg.select(
        *keys,
        *[F.col(f"sum_{c}").cast(dec).alias(f"sum_{c}") for c in sum_cols],
        F.col(count_col),
    )
    return (
        prev_norm.unionByName(partial)
        .groupBy(*keys)
        .agg(
            *[F.sum(f"sum_{c}").cast(dec).alias(f"sum_{c}") for c in sum_cols],
            F.sum(count_col).alias(count_col),
        )
    )
