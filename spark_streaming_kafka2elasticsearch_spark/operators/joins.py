"""Join operators (SURVEY.md §2.3, J1 + the extended join surface).

The reference has exactly one join: a stream–static left-outer equi
join enriching the order stream with a city dimension
(``transform_stream_static_join``, reference
``bexley_spark_stream_msk_es.py:421-439``; join at ``:426``).  We
reproduce it with two scale-critical upgrades the reference lacks:

* the dimension side is **broadcast** explicitly — at 100 TB of stream
  the dim (thousands of rows) must never shuffle the fact side; a
  BroadcastHashJoin keeps enrichment a narrow, shuffle-free map stage;
* the dimension is **cached** — the reference re-reads its JDBC dim
  every micro-batch (SURVEY.md §4 flags this).

The extended surface (semi/anti/range) is included because any user
of a streaming enrichment engine needs them and they are free in Spark.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich_stream_static(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "left",
    broadcast_dim: bool = True,
    cache_dim: bool = False,
) -> DataFrame:
    """J1 — stream–static equi join, dimension on the build side.

    Parity: ``fact.join(dim, fact[k] == dim[k], "left").drop(dim[k])``
    (reference ``:426``).  The duplicate join key from the dim side is
    dropped, exactly as the reference does.
    """
    if cache_dim:
        dim = dim.cache()
    build = F.broadcast(dim) if broadcast_dim else dim
    joined = fact.join(build, fact[fact_key] == dim[dim_key], how)
    return joined.drop(dim[dim_key])


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS — rows of ``left`` with at least one match in ``right``."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS — rows of ``left`` with no match in ``right``."""
    return left.join(right, on, "left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_lo: str,
    right_hi: str,
    equi_keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Range join: ``right.lo <= left.ts < right.hi``.

    With ``equi_keys`` the equality conjunct makes this a hash join with
    a residual range filter (shuffle on the equi key — scales); without,
    Spark must fall back to broadcast-nested-loop, which is only sane
    when ``right`` is small (intervals/dim side) — callers should pass a
    broadcastable right side in that case.
    """
    cond: Column = (right[right_lo] <= left[left_ts]) & (left[left_ts] < right[right_hi])
    if equi_keys:
        for lk, rk in equi_keys:
            cond = (left[lk] == right[rk]) & cond
    right_b = F.broadcast(right) if not equi_keys else right
    return left.join(right_b, cond)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    equi_keys: list[tuple[str, str]],
    interval: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Stream–stream join with a bounded time range:
    ``left.ts ∈ [right.ts, right.ts + interval]``, equi-keyed.

    Beyond the reference's stream–static J1: both sides are unbounded,
    so Spark buffers each side in the state store and the TIME RANGE is
    what bounds that state — the watermarks plus the interval tell the
    engine when a buffered row can never match again and is evicted.
    Without the range conjunct (or with outer joins lacking watermarks)
    state grows forever; this wrapper makes both mandatory.  The equi
    conjunct keeps the physical join a stream-stream hash join
    (shuffled on the key), never a cross product.
    """
    if not equi_keys:
        # Without an equality conjunct Spark falls back to a non-equi
        # stream-stream join that buffers and compares across ALL keys
        # — the cross-product shape this wrapper exists to forbid,
        # same as it already makes the watermarks and range mandatory.
        raise ValueError("stream_stream_interval_join requires equi_keys")
    lw = left.withWatermark(left_ts, left_watermark)
    rw = right.withWatermark(right_ts, right_watermark)
    cond: Column = (lw[left_ts] >= rw[right_ts]) & (
        lw[left_ts] <= rw[right_ts] + F.expr(f"INTERVAL {interval}")
    )
    for lk, rk in equi_keys:
        cond = (lw[lk] == rw[rk]) & cond
    return lw.join(rw, cond, how)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    strict: bool = True,
    tie_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of
    the LATEST right row with the same key and ``right_ts`` before
    ``left_ts`` (strictly before when ``strict``, else ≤) — the
    point-in-time enrichment primitive (last sensor reading, last
    error, SCD2 dim version at event time).

    Scale shape — this is the part that matters at 100 TB: the naive
    formulation (range join + groupBy-max, or a per-key correlated
    subquery) explodes |left|×|candidate window|.  Instead both sides
    are TAGGED and UNIONED, shuffled ONCE on the key, sorted within
    each key by (ts, side-order), and the match is a running
    ``last(payload, ignorenulls=True)`` window — cost is one shuffle +
    one sort, identical to a groupBy on the key, regardless of how
    many right rows precede each left row.  Tie discipline: at equal
    timestamps the left row sorts BEFORE the right row when strict
    (the equal-ts right row must not match) and after it otherwise;
    ``tie_col`` (e.g. a unique id) makes the pick among equal-ts right
    rows deterministic.

    Output: all left columns + ``payload_cols`` (null where no right
    row qualifies).  Columns in ``payload_cols`` must not collide with
    left column names — alias upstream.
    """
    from pyspark.sql.window import Window

    keys = list(on)
    lcols = left.columns
    # Right rows sort after left at equal ts iff strict (so the
    # running last() cannot see them from the left row).
    r_ord = 1 if strict else -1
    l2 = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_ats"),
        F.lit(0).alias("_ord"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in payload_cols
            )
            + ">"
        )
        .alias("_rp"),
    )
    r2 = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(r_ord).alias("_ord"),
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("_tie"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_rp"),
    ).select(*lcols, "_ats", "_ord", "_tie", "_rp")
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), F.col("_ord").asc(), F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_rp", ignorenulls=True).over(w))
    return matched.filter(F.col("_ord") == 0).select(
        *lcols, *[F.col(f"_match.{c}").alias(c) for c in payload_cols]
    )


def salted_equi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster equi join: split each hot fact key across
    ``salt_buckets`` shuffle partitions by salting with a hash of the
    whole fact row, and replicate every dim row once per salt value —
    result rows are identical to ``fact.join(dim, key)``, but no single
    task owns a hot key's entire pair volume.

    When to use over AQE's skew-join split (on by default in this
    engine's session): AQE splits oversized SORT-MERGE partitions
    after the fact, which caps task size but still funnels one key
    through few streams; explicit salting pre-spreads the key at map
    time and composes with broadcast-unfriendly dim sizes.  The dim
    side pays ×``salt_buckets`` replication — keep it the smaller
    side.  Supported joins: inner / left (the replicated dim keeps
    left-outer null semantics: an unmatched fact row misses ALL salt
    replicas, so it still emits exactly one null-padded row... for
    'left' we dedupe nothing because each fact row carries exactly ONE
    salt value and matches at most that salt's replica).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_equi_join supports inner/left joins")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets)
    ).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = f.join(
        d, (f[fact_key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how
    )
    return joined.drop(d["_salt"]).drop(f["_salt"]).drop(d[dim_key])
