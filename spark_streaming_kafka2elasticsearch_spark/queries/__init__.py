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
    # round-13 rotation (VERDICT r12 item 6): head = queries NEW or
    # CHANGED in r13 (7 new entries + knn_graph_append_serve, whose
    # merge gained the crash-replay dedup — output unchanged but the
    # plan changed, so it gets a fresh row), then ALL 28 queries whose
    # newest driver row is still r8-vintage (the oldest tier — retired
    # completely this round, as demanded: 8 + 28 = 36 ≤ the ~50-row
    # budget), then the 14 oldest r9-vintage rows to start on the next
    # debt tier.  8 + 28 + 14 = 50.  A test asserts this list is
    # duplicate-free.
    # -- new in r13 (7) --
    "knn_graph_descent_refresh",
    "ann_graph_beam_filtered_topk",
    "ann_graph_beam_hier_topk",
    "knn_graph_delete_serve",
    "ann_ivf_delete_serve",
    "ann_bq_append_serve",
    "ann_bq_delete_serve",
    # -- changed in r13 (1) --
    "knn_graph_append_serve",
    # -- r8-vintage (28) --
    "ann_ivf_persisted_topk_multiprobe",
    "bpe_encode_documents",
    "bpe_train_merges",
    "bpe_vocab_after_training",
    "discounted_revenue",
    "dsir_budget_selection",
    "dsir_importance_weights",
    "dup_component_audit",
    "embedding_abtt_postprocess",
    "embedding_covariance",
    "embedding_near_dup_clusters",
    "embedding_pc_power_iteration",
    "forecast_revenue_change",
    "hard_negative_mining",
    "image_near_dup_pairs",
    "near_dup_lpa_communities",
    "passage_retrieval_topk",
    "quality_logistic_scores",
    "returned_item_reporting",
    "sequence_packing_plan",
    "set_similarity_prefix_pairs",
    "source_temperature_mix",
    "tfidf_scores",
    "token_budget_corpus_selection",
    "training_shard_shuffle",
    "volume_shipping",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    # -- oldest r9-vintage (18) --
    "above_average_customers",
    "active_parties_union",
    "ann_cosine_topk",
    # (ann_cosine_topk_ivf appears in the r9 driver artifact but is no
    # longer a registered name — superseded by the persisted-IVF
    # family; nation_party_setops takes its rotation slot)
    "nation_party_setops",
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
