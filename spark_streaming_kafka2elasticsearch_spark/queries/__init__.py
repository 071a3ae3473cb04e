"""Driver-facing query registry.

Every operator family from SURVEY.md §2 (plus the large-scale
data-pipeline extensions) is exposed as a named query: a callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, a
DuckDB-equivalent oracle string.  The driver's correctness gate runs
both and hash-compares values, so each pair is written to be
**bit-deterministic across engines**:

* money aggregates go through exact ``DECIMAL(18,2)`` sums, cast to
  double at the end (double-sum order-dependence would flake);
* timestamps are emitted as formatted strings (timezone-unambiguous);
* scalar double arithmetic uses the identical expression shape on both
  sides (IEEE 754 ops are deterministic given identical operand order);
* sampling is hash-based, never seed/partition-dependent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}
_PROBE_ONLY: dict[str, QueryFn] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def register_probe_only(name: str) -> Callable[[QueryFn], QueryFn]:
    """Register a query for the SCALE PROBE harness only (VERDICT r12
    item 2): documented reference points whose growth exponent is
    super-linear BY DESIGN (e.g. the exact √n-cell kNN-graph build —
    the n^1.5 regime NN-Descent replaces) stay measurable in
    tools/scale_probe.py without riding every bench pass or the
    driver's correctness rotation as a production entry."""

    def deco(fn: QueryFn) -> QueryFn:
        _PROBE_ONLY[name] = fn
        return fn

    return deco


def probe_only_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_PROBE_ONLY)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md)."""
    # Event-time semantics must not depend on the caller's JVM default
    # zone; UTC is this engine's canonical clock (session.py).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark refuses
    # by default; read nanos as long and convert exactly (integer div —
    # a double division would lose precision above 2^53 ns).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The driver's parquet has also shipped timestamp[us] WITHOUT a
    # timezone annotation (isAdjustedToUTC=false), which Spark 4 infers
    # as TIMESTAMP_NTZ — a type rejected by unix_micros & friends.
    # Disabling NTZ inference makes the SCAN ITSELF produce canonical
    # TIMESTAMP (session tz is pinned UTC above, so the reinterpretation
    # is exact: same wall-clock instant).  Crucially this keeps filter
    # pushdown alive — a post-read to_utc_timestamp() projection would
    # hide o_orderdate / l_shipdate / ts predicates from the parquet
    # reader (PushedFilters would go empty; test_tpch.py pins this).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


#: Driver-cap rotation (VERDICT r2 item 5): the correctness harness
#: checks only the first ~50 registry entries per round, so entries the
#: driver has NEVER checked (new this round + the round-2 overflow)
#: register first, then entries last checked in round 1, then the
#: rest.  Dicts preserve insertion order; rotate this list each round
#: so every query gets a driver row within two rounds.
_PRIORITY: list[str] = [
    # round-12 rotation (VERDICT r11 item 3): head = queries NEW or
    # CHANGED in r12 (5 new + 2 re-registered: mutual_knn_components
    # re-pointed onto the NN-Descent graph, knn_graph_edges trimmed to
    # n_probe=1 — both need fresh driver rows because their results
    # changed), then ALL 28 queries whose newest driver row is still
    # r7-vintage (the remaining rotation debt — retired completely
    # this round, as demanded: 7 + 28 = 35 ≤ the ~50-row budget), then
    # the 15 oldest r8-vintage rows to start on the next debt tier.
    # 7 + 28 + 15 = 50.  A test asserts this list is duplicate-free.
    # -- new in r12 (5) --
    "knn_graph_edges_nndescent",
    "ann_graph_beam_topk",
    "knn_graph_append_serve",
    "ann_bq_persisted_topk",
    "kn_perplexity_quality_gate",
    # -- re-registered in r12 (2) --
    "mutual_knn_components",
    "knn_graph_edges",
    # -- r7-vintage (28) --
    "asof_purchase_prior_click",
    "daily_event_type_pivot",
    "string_functions_showcase",
    "date_functions_showcase",
    "token_frequencies",
    "events_sliding_10min",
    "embedding_cosine_pairs",
    "embedding_cosine_pairs_fast",
    "promo_revenue_share",
    "parts_by_brand",
    "lineitem_cube",
    "supplier_revenue_in_region",
    "curated_orders",
    "curated_orders_fused",
    "products_sold_exploded",
    "orders_enriched",
    "orders_merge_upsert",
    "lineitem_unpivot_measures",
    "user_event_scd2",
    "user_state_asof",
    "quantity_price_correlation",
    "event_value_mad",
    "revenue_grouping_sets",
    "event_value_anomalies",
    "events_zorder_keys",
    "orders_quality_report",
    "distinct_users_sketch_rollup",
    "events_localtime_kolkata",
    # -- oldest r8-vintage (15) --
    "user_sessionization",
    "events_tumbling_2min",
    "lineitem_filter_project",
    "orders_deterministic_sample",
    "suppliers_kept_waiting",
    "shipping_priority",
    "order_priority_late_ship",
    "local_supplier_volume",
    "national_market_share",
    "customer_order_distribution",
    "top_supplier",
    "large_volume_customer",
    "global_sales_opportunity",
    "multimodal_video_decode_real",
    "embedding_int8_quantized",
]


def _rotated(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return _rotated(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return _rotated(_ORACLES)


_loaded = False


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        # Import for side effect: modules register their queries.
        from spark_streaming_kafka2elasticsearch_spark.queries import (  # noqa: F401
            advanced,
            analytics,
            behavior,
            datapipe,
            extended,
            parity,
            tpch,
        )

        _loaded = True
