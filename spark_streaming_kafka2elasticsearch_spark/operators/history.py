"""Temporal / historization operators: SCD2 interval building.

The reference engine upserts "latest state per key" into
Elasticsearch (keyed upsert, reference ``bexley_spark_stream_msk_es.py``
foreachBatch) — i.e. SCD type 1, history discarded.  A warehouse
engine also needs the type-2 shape: every change becomes a VERSIONED
row with a validity interval, so point-in-time queries ("what was the
state as of T?") are a range filter instead of a log replay.

Scale shape: one window function over (key, change order) — a single
shuffle on the key, no self-join (the naive ``lead`` spelled as a
self-join is quadratic per key).  Point-in-time lookups on the result
are then narrow filters; pairing with an as-of join
(``operators/joins.py``) covers the lookup side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Build SCD2 validity intervals from a change log.

    Each input row (a change event carrying the new attribute values
    for its key) becomes one version: ``valid_from`` = its change
    timestamp, ``valid_to`` = the NEXT change's timestamp for the same
    key (exclusive bound; NULL = still open), ``current_flag`` = the
    open-version marker.  ``tiebreak_cols`` break same-timestamp
    changes deterministically — required for reproducible intervals
    (two changes in the same tick otherwise order arbitrarily).
    """
    if not keys:
        raise ValueError("scd2_from_changes needs at least one key column")
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return changes.select(
        "*",
        F.col(ts_col).alias(valid_from),
        nxt.alias(valid_to),
        nxt.isNull().alias(current_flag),
    )
