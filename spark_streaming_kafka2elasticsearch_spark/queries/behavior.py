"""Behavioral / event-time analytics: cohorts, funnels, gap-fill,
interval joins.

The reference's event stream stops at a tumbling-window count
(bexley_spark_stream_msk_es.py:441-458); any product team running that
pipeline immediately needs the next four shapes over the same events
table — weekly retention cohorts, a sequential conversion funnel,
dense per-user daily series with forward-fill, and a time-banded
correlation join.  Each is written as the plan you'd want at 100 TB:

* cohorts/funnel: partial-agg groupBys whose shuffle rows are
  per-user aggregates (150 rows at sf0.01, |users| anywhere), never
  raw events;
* gap-fill: ``sequence()`` + explode densifies INSIDE each user's own
  span — output is Σ span-days, not |users| × global-days;
* interval join: epoch-bucket expansion (explode into 3 buckets) turns
  the inequality join into an equi-join on (user, bucket) — the
  banded-join trick that keeps Catalyst on a hash join instead of a
  broadcast-nested-loop scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_streaming_kafka2elasticsearch_spark.queries import load_table, register

_DEC = T.DecimalType(28, 10)


# ---------------------------------------------------------------------------
# Q: weekly retention cohorts
# ---------------------------------------------------------------------------


@register(
    "user_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT
  strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
  datediff('day', f.cohort_week, a.week) // 7 AS week_offset,
  count(DISTINCT a.user_id) AS n_users
FROM first_seen f JOIN activity a USING (user_id)
GROUP BY 1, 2
""",
)
def user_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: cohort = ISO week (Monday-truncated)
    of the user's first event; one row per (cohort_week, week_offset)
    with the distinct users still active that week.

    Scale shape: two partial-agg groupBys over user-level rows.  The
    first shuffle carries one (user, min_ts) pair per user per task;
    the DISTINCT activity relation is likewise map-side combined to
    (user, week) before shuffling.  The final count(DISTINCT user)
    re-shuffles per-user rows, which is exact — no events row ever
    crosses the wire.  Week arithmetic is pure integer day-diff / 7
    (both engines truncate weeks to Monday), so the hash check is
    exact."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Q: sequential conversion funnel  view → click → purchase
# ---------------------------------------------------------------------------


@register(
    "purchase_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS c_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.v_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
  GROUP BY e.user_id
)
SELECT 1 AS stage_order, 'view' AS stage, count(*) AS n_users FROM v
UNION ALL
SELECT 2, 'click', count(*) FROM c
UNION ALL
SELECT 3, 'purchase', count(*) FROM p
""",
)
def purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel: first view, then the first click AFTER
    that view, then the first purchase AFTER that click — the ordering
    constraint is what separates a funnel from three independent
    counts (a purchase before any view must NOT convert).

    Scale shape: each stage is filter → join on user_id → partial-agg
    min.  The per-stage join's right side is one row per surviving
    user (≤ |users|), so Catalyst broadcast-joins it against the
    filtered event scan; no stage shuffles raw events.  Emits the
    3-row stage table — counts only, deterministic."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def stage(df: DataFrame, order: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(order).cast("int").alias("stage_order"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return stage(v, 1, "view").unionAll(stage(c, 2, "click")).unionAll(
        stage(p, 3, "purchase")
    )


# ---------------------------------------------------------------------------
# Q: dense per-user daily series with zero-fill + forward-fill
# ---------------------------------------------------------------------------


@register(
    "user_daily_gapfill",
    oracle="""
WITH span AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1
  FROM events GROUP BY user_id
),
dense AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM span
),
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         count(*) AS n_events,
         CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
)
SELECT
  dense.user_id,
  strftime(dense.day, '%Y-%m-%d') AS day,
  coalesce(daily.n_events, 0) AS n_events,
  last_value(daily.day_value IGNORE NULLS) OVER (
    PARTITION BY dense.user_id ORDER BY dense.day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS filled_value
FROM dense LEFT JOIN daily ON dense.user_id = daily.user_id AND dense.day = daily.day
""",
)
def user_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: every user gets one row per calendar
    day of their own active span, with ``n_events`` zero-filled on gap
    days and ``filled_value`` carrying the last observed daily value
    total forward (``last(..., ignorenulls)`` over an ordered per-user
    frame).

    Scale shape: the dense calendar is built per user with
    ``sequence(min_day, max_day)`` + explode — output cardinality is
    Σ user-span-days, not |users| × global-calendar, and the explode
    happens AFTER the per-user min/max aggregation, so it expands 2
    dates per user, never raw events.  The forward-fill window
    partitions by user: state is one scalar per user, and the sort is
    within the same hash partition the join already produced.  Daily
    sums accumulate in DECIMAL(28,10) so the cross-engine hash check
    is exact (see analytics._dsum)."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    dense = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("day_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.col("day"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .withColumn("day", F.date_format("day", "yyyy-MM-dd"))
    )


# ---------------------------------------------------------------------------
# Q: time-banded interval join  purchase ↔ errors within ±30 min
# ---------------------------------------------------------------------------

_BAND_US = 1800 * 1_000_000  # ±30 min in microseconds


@register(
    "purchase_error_correlation",
    oracle=f"""
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
e AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       count(e.ts) AS n_errors
FROM p LEFT JOIN e
  ON p.user_id = e.user_id
 AND abs(epoch_us(p.ts) - epoch_us(e.ts)) <= {_BAND_US}
GROUP BY 1, 2, 3
""",
)
def purchase_error_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, how many errors did the same user hit
    within ±30 minutes?  The naive plan for `|Δt| ≤ band` is a
    broadcast-nested-loop (inequality) join — quadratic per user and
    un-shuffleable.  This is the banded equi-join rewrite: bucket both
    sides by ``floor(epoch_us / band)``, explode the PROBE side into
    its bucket and both neighbors (any |Δt| ≤ band pair lands in
    adjacent buckets, and each error's single bucket matches at most
    one of the three distinct probe buckets — no dedup needed), hash
    join on (user_id, bucket), then apply the exact band filter.
    Candidate work is O(matches in ±2 bands), not O(purchases ×
    errors), and the join stays a shuffled/broadcast HASH join at any
    scale.  Zero-error purchases are preserved by re-joining counts to
    the purchase base (left join + coalesce 0)."""
    ev = load_table(spark, sf_dir, "events")
    band = F.lit(_BAND_US)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_micros("ts") / band).cast("long").alias("_b"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.unix_micros("ts").alias("e_us"),
        F.floor(F.unix_micros("ts") / band).cast("long").alias("e_b"),
    )
    probe = p.select(
        "event_id",
        "user_id",
        "p_ts",
        F.explode(
            F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)
        ).alias("jb"),
    )
    hits = (
        probe.join(
            e, (probe.user_id == e.e_user) & (probe.jb == e.e_b)
        )
        .filter(F.abs(F.unix_micros("p_ts") - F.col("e_us")) <= band)
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        p.join(hits, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
            F.coalesce("_n", F.lit(0)).alias("n_errors"),
        )
    )


# ---------------------------------------------------------------------------
# Q: running distinct event types per user (cumulative-distinct window)
# ---------------------------------------------------------------------------


@register(
    "user_running_distinct_types",
    oracle="""
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) = 1 THEN 1 ELSE 0 END AS first_of_type
  FROM events
)
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CAST(sum(first_of_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_types_so_far
FROM marked
""",
)
def user_running_distinct_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-distinct window: at every event, how many DISTINCT
    event types has this user produced so far?  (The engagement-
    breadth curve; count(DISTINCT) isn't a supported running
    aggregate in any engine, so the canonical rewrite is first-
    occurrence marking + running sum — two windows over the SAME
    (user_id, ts) partitioning.)

    Scale shape: both windows hash-partition on user_id (the second
    adds event_type to the partition key — a subpartition of the
    first, no extra exchange needed after AQE reuses the sort);
    running state is one counter per user.  Ordering is tie-broken by
    event_id so the running sum is a total order — without it, tied
    timestamps would make the cumulative value engine-dependent."""
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.withColumn(
        "first_of_type",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    return marked.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.sum("first_of_type").over(w_run).cast("long").alias("distinct_types_so_far"),
    )


# ---------------------------------------------------------------------------
# Q: event-type transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS cur,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
)
SELECT cur, nxt, count(*) AS n,
       CAST(count(*) AS DOUBLE)
         / sum(count(*)) OVER (PARTITION BY cur) AS p
FROM seq WHERE nxt IS NOT NULL
GROUP BY cur, nxt
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts and probabilities over
    per-user event sequences: P(next = b | current = a).  The
    behavioral fingerprint behind session-flow dashboards and
    anomaly-vs-baseline comparisons (a bot's transition rows look
    nothing like a human's).

    Scale shape: ``lead`` is one window per user partition (state =
    one row lookahead); the count aggregation reduces to the
    |types|² transition vocabulary before the final tiny window
    normalizes each row into probabilities — an exact integer ratio,
    so the double is bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    w_norm = Window.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_norm)).alias("p"),
    )
