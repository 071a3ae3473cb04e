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
    # round-11 rotation (VERDICT r10 item 5): head = queries NEW in r11
    # (no driver row exists for them at all), then the 5 queries whose
    # newest driver row is still r6-vintage (the r10 rotation's
    # overflow tail — retired first this round, as demanded), then the
    # 49 r7-vintage rows (computed from the union of
    # CORRECTNESS_r01-r10, latest row per query).  24 + 5 + 49 = 78 >
    # the ~50-row driver budget, so the last ~12 r7 entries may age one
    # more round — new-query coverage outranks rotation freshness when
    # they clash.  A test asserts this list is duplicate-free.
    # -- new in r11 (24) --
    "knn_graph_edges",
    "knn_graph_edges_auto",
    "click_purchase_attribution",
    "click_purchase_attribution_outer",
    "purchase_activity_context",
    "kneser_ney_bigram_scores",
    "ann_mmr_topk",
    "query_likelihood_topk",
    "mutual_knn_components",
    "parts_supplier_census",
    "ivf_cell_stats",
    "bq_embedding_codes",
    "ann_bq_hamming_topk",
    "ann_bq_refine_topk",
    "ann_ivf_bq_topk",
    "ann_ivfadc_refine_topk",
    "ann_ivf_compact_serve",
    "ann_ivf_filtered_topk",
    "ann_range_search",
    "bm25_doc_topk",
    "hybrid_rrf_topk",
    "ann_ivf_diverse_topk",
    "weighted_reservoir_sample",
    "ann_ivfadc_filtered_topk",
    # -- r6-vintage (5) --
    "unigram_logprob_scores",
    "user_cohort_retention",
    "user_daily_gapfill",
    "user_running_distinct_types",
    "weighted_avg_price_pandas",
    # -- r7-vintage (49) --
    "lang_token_stats_pandas",
    "nation_revenue_reconciliation",
    "events_last_error_asof",
    "token_rarity_scores",
    "deduped_corpus",
    "near_dup_clusters_star",
    "decontaminate_train_docs",
    "ann_cosine_topk_pandas",
    "ann_cosine_topk_lsh",
    "multimodal_image_decode_real",
    "multimodal_audio_decode_real",
    "multimodal_video_frames",
    "multimodal_audio_features",
    "document_repetition_ratios",
    "document_chunks",
    "hashed_bow_embeddings",
    "delta_corpus_dedup_check",
    "exact_substring_dup_spans",
    "exact_substring_dedup_corpus",
    "near_dup_pagerank",
    "embedding_dup_kcore",
    "asof_purchase_prior_click",
    "daily_event_type_pivot",
    "string_functions_showcase",
    "date_functions_showcase",
    "events_localtime_kolkata",
    "token_frequencies",
    "events_sliding_10min",
    "embedding_cosine_pairs",
    "embedding_cosine_pairs_fast",
    "promo_revenue_share",
    "parts_by_brand",
    "lineitem_cube",
    "supplier_revenue_in_region",
    "orders_merge_upsert",
    "lineitem_unpivot_measures",
    "user_event_scd2",
    "orders_quality_report",
    "distinct_users_sketch_rollup",
    "events_zorder_keys",
    "user_state_asof",
    "quantity_price_correlation",
    "event_value_mad",
    "revenue_grouping_sets",
    "event_value_anomalies",
    "curated_orders",
    "curated_orders_fused",
    "products_sold_exploded",
    "orders_enriched",
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
