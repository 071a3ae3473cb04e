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
    # round-10 rotation (VERDICT r9 item 9): head = queries NEW in r10
    # (no driver row exists for them at all), then the 46 queries whose
    # newest driver row is r6-vintage (computed from the union of
    # CORRECTNESS_r01-r09, latest row per query) — 50 rows total,
    # exactly the driver's per-round check budget, so CORRECTNESS_r10
    # leaves zero registry rows predating r7.  r7-r9-fresh rows fall to
    # the natural registry order at the tail.  A test asserts this list
    # is duplicate-free.
    # -- new in r10 (9) --
    # NOTE: 9 new + 46 r6-vintage = 55 > the ~50-row driver budget, so
    # the last ~5 r6-vintage entries below may age one more round —
    # new-query coverage outranks rotation freshness when they clash.
    "pq_trained_codebooks",
    "ann_pq_trained_topk",
    "ann_ivfadc_topk",
    "ccnet_filtered_corpus",
    "ann_ivfadc_residual_topk",
    "sq8_embedding_codes",
    "ann_sq8_adc_topk",
    "ann_ivf_append_serve",
    "ann_ivf_sq8_topk",
    # -- r6-vintage (46) --
    "bigram_counts",
    "bigram_logprob_scores",
    "bpe_merge_candidates",
    "chunk_level_dedup",
    "corpus_summary_report",
    "countmin_token_frequencies",
    "customer_rfm_scores",
    "decontaminate_bloom_prefilter",
    "dedup_cluster_weights",
    "deduped_corpus_best_quality",
    "doc_containment_pairs",
    "doc_length_quantiles_by_lang",
    "document_chunks_udtf",
    "documents_token_ids",
    "dominant_part_suppliers",
    "dup_graph_bfs_hops",
    "dup_graph_triangle_counts",
    "embedding_label_centroids",
    "embedding_near_dup_srp_auto",
    "event_transition_matrix",
    "event_value_histogram",
    "events_variant_props",
    "gopher_quality_flags",
    "image_ahash_fingerprints",
    "important_part_share",
    "join_size_audit",
    "leakage_safe_split",
    "minhash_near_dup_pairs",
    "mixed_corpus_sample",
    "nation_trailing_7day_revenue",
    "part_name_fuzzy_pairs",
    "product_type_profit",
    "purchase_error_correlation",
    "purchase_funnel",
    "returnflag_priority_mix",
    "semdedup_keep_decisions",
    "semdedup_keep_decisions_auto",
    "source_mixing_weights",
    "tokenizer_vocab_ids",
    "top_supplier_per_part",
    "train_val_test_split",
    "unigram_logprob_scores",
    "user_cohort_retention",
    "user_daily_gapfill",
    "user_running_distinct_types",
    "weighted_avg_price_pandas",
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
