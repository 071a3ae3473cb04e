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
    # round-8 rotation (VERDICT r7 item 1): head = the 15 queries whose
    # newest driver row is r4-vintage, then queries new or
    # semantics-changed in r8 (no fresh row exists for them at all),
    # then the 48 r5-vintage rows; r6/r7-fresh rows fall to the natural
    # registry order at the tail.  Computed from the union of
    # CORRECTNESS_r01-r07 (latest row per query); a test asserts this
    # list is duplicate-free.
    # -- r4-vintage --
    "events_tumbling_2min",
    "lineitem_filter_project",
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
    "suppliers_kept_waiting",
    # -- new or semantics-changed in r8 --
    "ann_ivf_persisted_topk",
    "ann_ivf_persisted_topk_multiprobe",
    "quality_logistic_scores",
    "url_dedup_canonical",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "passage_retrieval_topk",
    "image_near_dup_pairs",
    "near_dup_lpa_communities",
    "bpe_train_merges",
    "bpe_vocab_after_training",
    "bpe_encode_documents",
    "token_budget_corpus_selection",
    "set_similarity_prefix_pairs",
    "dup_component_audit",
    "embedding_near_dup_clusters",
    "dsir_importance_weights",
    "dsir_budget_selection",
    "semantic_decontamination",
    "hard_negative_mining",
    "source_temperature_mix",
    "embedding_covariance",
    "embedding_pc_power_iteration",
    "embedding_abtt_postprocess",
    # -- r5-vintage --
    "user_sessionization",
    "multimodal_video_decode_real",
    "embedding_int8_quantized",
    "sequence_packing_plan",
    "training_shard_shuffle",
    "tfidf_scores",
    "orders_deterministic_sample",
    "quantity_percentiles",
    "quantity_percentiles_approx",
    "latest_event_per_user",
    "array_functions_showcase",
    "above_average_customers",
    "document_scores_pandas",
    "ann_cosine_topk_ivf",
    "pricing_summary",
    "revenue_by_nation",
    "customers_with_open_orders",
    "customers_without_orders",
    "top_orders_per_customer",
    "order_status_distinct_customers",
    "order_status_distinct_customers_approx",
    "lineitem_rollup",
    "events_json_props",
    "active_parties_union",
    "nation_party_setops",
    "pii_scrub_stats",
    "window_functions_showcase",
    "events_props_map_keys",
    "sql_region_revenue",
    "salted_brand_revenue",
    "small_qty_order_revenue",
    "dedup_exact_documents",
    "document_fingerprints",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "text_quality_scores",
    "token_stats_by_lang",
    "language_id_heuristic",
    "near_dup_clusters",
    "documents_curation_pipeline",
    "stratified_sample_by_lang",
    "bpe_token_stats",
    "ann_cosine_topk",
    "embedding_near_dup_srp",
    "srp_buckets",
    "embedding_l2_norms",
    "multimodal_image_features",
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
