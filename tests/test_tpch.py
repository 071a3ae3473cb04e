"""Plan-shape contracts for the TPC-H-style suite (queries/tpch.py).

Correctness is the oracle gate's job; these tests pin the SCALE
properties the docstrings claim: dims broadcast (no sort-merge join of
a fact against a filtered dim), scan-level predicate pushdown, and the
left join in Q13 keeping its unmatched rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_kafka2elasticsearch_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (
        all_queries()[name](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q3_broadcasts_dims_and_pushes_dates(spark):
    plan = _plan(spark, "shipping_priority")
    assert "BroadcastHashJoin" in plan
    # The two date predicates must reach the parquet scans.
    assert "PushedFilters" in plan and "GreaterThan(l_shipdate" in plan
    assert "LessThan(o_orderdate" in plan


def test_q6_is_pure_scan_aggregate(spark):
    plan = _plan(spark, "forecast_revenue_change")
    # No join at all, and the predicates are offered to the scan (the
    # toString truncates the PushedFilters list, so match the prefix).
    assert "Join" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert ">= 0.04)" in plan  # discount bound survives into the Filter


def test_q7_nation_dim_joined_twice_without_shuffle(spark):
    plan = _plan(spark, "volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 4  # c, s, n1, n2
    assert "SortMergeJoin" not in plan or "l_orderkey" in plan.split(
        "SortMergeJoin"
    )[1][:200]  # only the fact-fact join may merge


def test_q13_left_join_keeps_orderless_customers(spark):
    df = all_queries()["customer_order_distribution"](spark, SF_DIR)
    rows = {r["c_count"]: r["custdist"] for r in df.collect()}
    # Every customer appears exactly once in the distribution.
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert sum(rows.values()) == n_cust


def test_q18_having_set_matches_manual_filter(spark):
    df = all_queries()["large_volume_customer"](spark, SF_DIR)
    out = df.select("o_orderkey", "sum_qty").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    manual = {
        r["l_orderkey"]
        for r in li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("s"))
        .filter(F.col("s") > 250)
        .collect()
    }
    assert {r["o_orderkey"] for r in out} == manual
    assert all(r["sum_qty"] > 250 for r in out)


def test_q22_threshold_is_single_broadcast_row(spark):
    plan = _plan(spark, "global_sales_opportunity")
    # Scalar threshold arrives via a broadcast nested-loop/cross join,
    # the anti join stays a hash anti — never a cartesian of facts.
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_runtime_bloom_filter_prunes_shuffle_join_probe_side(spark):
    """100 TB evidence: with AQE's runtime bloom filter enabled (on by
    default in the session), a selective dim filter injects a
    might_contain(bloom_filter_agg(...)) predicate into the FACT scan
    side of a shuffle join — rows that cannot match are dropped before
    the exchange.  Production thresholds (10 GB application side) are
    right-sized for clusters, so this test lowers them to make the
    rewrite observable on test data; the assertion is about the
    optimizer wiring, not the thresholds."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold", "0"
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_global_topk_avoids_full_sort(spark):
    """orderBy + limit must plan as TakeOrderedAndProject — per-
    partition heaps merged on the driver — never a global sort-shuffle
    of the table.  At 100 TB this is the difference between a top-10
    costing one scan and costing a full range-partitioned sort."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    top = li.orderBy(F.desc("l_extendedprice")).limit(10)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_q12_priority_mix_pushes_shipdate_and_partial_aggs(spark):
    plan = _plan(spark, "returnflag_priority_mix")
    # The year window must reach the lineitem scan, and the conditional
    # sums must partial-aggregate before the final exchange.
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan.lower() or "HashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_q9_profit_broadcasts_all_dims(spark):
    plan = _plan(spark, "product_type_profit")
    # part (filtered), supplier and nation all broadcast; the only
    # shuffle join is lineitem⋈orders on the order key.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_q2_top_supplier_is_unique_per_part(spark):
    df = all_queries()["top_supplier_per_part"](spark, SF_DIR)
    rows = df.collect()
    keys = [r["p_partkey"] for r in rows]
    # row_number + deterministic tiebreak ⇒ exactly one winner per part.
    assert len(keys) == len(set(keys)) and len(keys) > 0
    plan = _plan(spark, "top_supplier_per_part")
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_q11_threshold_is_single_broadcast_scalar(spark):
    plan = _plan(spark, "important_part_share")
    # The global total joins back as a 1-row broadcast, never a
    # fact-fact cartesian.
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
    df = all_queries()["important_part_share"](spark, SF_DIR)
    vals = [r["part_value"] for r in df.collect()]
    assert vals and all(v > 0 for v in vals)


def test_join_strategy_hints_are_honored(spark):
    """Join strategy control beyond broadcast: a SHUFFLE_HASH hint must
    produce a ShuffledHashJoin and a MERGE hint a SortMergeJoin for the
    same big-big join — the knobs a 100 TB tuning pass reaches for when
    the optimizer's default pick is wrong for a known skew/size case."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    hashed = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    hp = hashed._jdf.queryExecution().executedPlan().toString()
    mp = merged._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in hp and "SortMergeJoin" not in hp
    assert "SortMergeJoin" in mp and "ShuffledHashJoin" not in mp
