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


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated parquet table (TESTDATA.md)."""
    # Event-time semantics must not depend on the caller's JVM default
    # zone; UTC is this engine's canonical clock (session.py).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # events.parquet carries INT64 TIMESTAMP(NANOS) which Spark refuses
    # by default; read nanos as long and convert exactly (integer div —
    # a double division would lose precision above 2^53 ns).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    # new in round 3 — never checked by anyone
    "ann_cosine_topk_pandas",
    "hashed_bow_embeddings",
    "orders_merge_upsert",
    "lineitem_unpivot_measures",
    "deduped_corpus",
    "token_rarity_scores",
    "user_event_scd2",
    "user_state_asof",
    "quantity_price_correlation",
    "event_value_mad",
    "revenue_grouping_sets",
    "event_value_anomalies",
    "events_zorder_keys",
    "orders_quality_report",
    "distinct_users_sketch_rollup",
    "decontaminate_train_docs",
    "near_dup_clusters_star",
    "events_last_error_asof",
    "document_repetition_ratios",
    "document_chunks",
    "suppliers_kept_waiting",
    "multimodal_image_decode_real",
    "multimodal_audio_decode_real",
    # registered in round 2, beyond the driver's 50-cap both rounds
    "events_localtime_kolkata",
    "embedding_cosine_pairs_fast",
    "shipping_priority",
    "order_priority_late_ship",
    "local_supplier_volume",
    "forecast_revenue_change",
    "volume_shipping",
    "national_market_share",
    "returned_item_reporting",
    "customer_order_distribution",
    "top_supplier",
    "large_volume_customer",
    "discounted_revenue",
    "global_sales_opportunity",
    # last driver-checked in round 1
    "token_frequencies",
    "events_sliding_10min",
    "embedding_cosine_pairs",
    "promo_revenue_share",
    "parts_by_brand",
    "lineitem_cube",
    "supplier_revenue_in_region",
    "curated_orders",
    "curated_orders_fused",
    "products_sold_exploded",
    "orders_enriched",
    "events_tumbling_2min",
    "lineitem_filter_project",
    "orders_deterministic_sample",
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
            datapipe,
            extended,
            parity,
            tpch,
        )

        _loaded = True
