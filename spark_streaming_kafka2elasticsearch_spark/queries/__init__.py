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
    # round-9 rotation (VERDICT r8 item 1): head = the 37 queries
    # whose newest driver row is r5-vintage (computed from the union
    # of CORRECTNESS_r01-r08, latest row per query), so CORRECTNESS_r09
    # leaves zero registry rows predating r6.  Queries NEW or
    # semantics-changed in r9 follow (no driver row exists for them
    # at all); r6-r8-fresh rows fall to the natural registry order at
    # the tail.  A test asserts this list is duplicate-free.
    # -- r5-vintage (37) --
    "above_average_customers",
    "active_parties_union",
    "ann_cosine_topk",
    "bpe_token_stats",
    "customers_with_open_orders",
    "customers_without_orders",
    "dedup_exact_documents",
    "document_fingerprints",
    "document_scores_pandas",
    "documents_curation_pipeline",
    "embedding_l2_norms",
    "embedding_near_dup_srp",
    "events_json_props",
    "events_props_map_keys",
    "language_id_heuristic",
    "lineitem_rollup",
    "multimodal_image_features",
    "nation_party_setops",
    "near_dup_clusters",
    "ngram_jaccard_pairs",
    "order_status_distinct_customers",
    "order_status_distinct_customers_approx",
    "pii_scrub_stats",
    "pricing_summary",
    "revenue_by_nation",
    "salted_brand_revenue",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
    "small_qty_order_revenue",
    "sql_region_revenue",
    "srp_buckets",
    "stratified_sample_by_lang",
    "text_quality_scores",
    "token_stats_by_lang",
    "top_orders_per_customer",
    "window_functions_showcase",
    # -- new or semantics-changed in r9 --
    "url_dedup_canonical",  # canonical_url port rule now scheme-conditional
    "orders_dead_letter_split",
    "ivf_kmeans_codebook",
    "ann_ivf_trained_topk",
    "ccnet_perplexity_buckets",
    "ann_pq_adc_topk",
    "semantic_decontamination",  # refactored onto the shared operator in r9
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
