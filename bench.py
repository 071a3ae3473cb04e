"""Benchmark harness — driver contract (BASELINE.md).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Execution is forced with the noop sink (full pipeline runs, nothing
collected to the driver) — the honest way to time a distributed plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# local[N] runs driver+executors in ONE JVM; the 1g default heap is
# the bottleneck long before the 128 GiB box is.  Must be set before
# the py4j gateway launches (builder.config is too late for driver
# memory); respects any value the harness already exported.
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else None

    from spark_streaming_kafka2elasticsearch_spark.queries import all_queries
    from spark_streaming_kafka2elasticsearch_spark.session import (
        build_session,
        release_cached_state,
    )

    spark = build_session(master=f"local[{cpus}]", app_name="bench")

    # Untimed JVM/session warm-up (standard bench hygiene): the first
    # timed query otherwise absorbs session startup — measured ~4s on
    # the r6 rotation head.  A bare range() job is not enough: warm
    # every subsystem the registry's first queries touch — parquet
    # datasource + filter pushdown, shuffle + broadcast-join machinery,
    # localCheckpoint block manager, and the Arrow/pandas-UDF worker
    # pool (first Python worker fork + Arrow init cost ~1-2s alone).
    # Per-query codegen compilation is still paid inside each query's
    # own timing.
    from spark_streaming_kafka2elasticsearch_spark.queries import load_table

    spark.range(1_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    try:
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region")
        warm = (
            nation.filter("n_nationkey >= 0")
            .join(region.hint("broadcast"), nation.n_regionkey == region.r_regionkey)
            .groupBy("r_name")
            .count()
            .localCheckpoint(eager=True)
        )
        warm.write.format("noop").mode("overwrite").save()
        warm.unpersist()

        def _warm_arrow(batches):
            for pdf in batches:
                yield pdf

        nation.select("n_nationkey").limit(64).mapInPandas(
            _warm_arrow, schema="n_nationkey long"
        ).write.format("noop").mode("overwrite").save()
        release_cached_state(spark)
    except Exception as exc:  # warm-up must never kill the bench
        print(f"bench warm-up skipped: {exc}", file=sys.stderr)

    # Median-of-N de-noising (same code measured 122.7s / 268.0s /
    # 190.7s across three r3/r4 runs on this box — a single pass will
    # eventually produce a false 2×-regression).  Pass 1 always runs;
    # extra passes (up to SPARK_GRAFT_BENCH_PASSES, default 3) run only
    # while total elapsed + the last pass's cost stays under
    # SPARK_GRAFT_BENCH_BUDGET_SEC, so the driver's per-round budget is
    # respected.  Reported per-query value = median across passes.
    # Default budget is deliberately conservative: the driver's own
    # bench timeout is unknown, and a lost BENCH artifact costs more
    # than a noisier median (1 full pass has always fit in <300s).
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "420"))
    max_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    t_start = time.time()
    runs: dict[str, list[float]] = {}
    pass_costs: list[float] = []

    def median(xs: list[float]) -> float:
        # Noise here is ADDITIVE and pass-level (one slow pass of
        # 131/128/205s measured on identical code — GC/page-cache, not
        # cold compile).  An odd median outvotes it; with exactly TWO
        # passes the median degenerates to the mean and inherits half
        # the slow pass, so take the MIN instead (a query can't run
        # faster than its true cost).
        ok = sorted(x for x in xs if x >= 0)
        if not ok:  # every pass failed
            return -1.0
        if len(ok) == 2:
            return ok[0]
        mid = len(ok) // 2
        return ok[mid] if len(ok) % 2 else round((ok[mid - 1] + ok[mid]) / 2, 3)

    def summarize(passes_done: int) -> str:
        timings = {name: median(xs) for name, xs in runs.items()}
        spread = {
            name: round(max(xs) - min(xs), 3)
            for name, xs in runs.items()
            if len([x for x in xs if x >= 0]) > 1
        }
        total = round(sum(t for t in timings.values() if t >= 0), 3)
        # Key order matters for the driver artifact: it keeps only the
        # LAST ~2000 chars of stdout, so the big per-query dicts go
        # FIRST and the headline scalars (value!) go LAST — r5 lost its
        # total to the old value-first ordering.
        return json.dumps(
            {
                "metric": "total wall-clock sec for all registered queries "
                f"(noop sink, per-query median of {passes_done} pass(es); "
                "min when exactly 2)",
                "queries": timings,
                "spread": spread,
                "sf": sf,
                "passes": passes_done,
                "unit": "sec",
                "value": total,
            }
        )

    bench_local = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    passes_done = 0
    for _ in range(max_passes):
        pass_t0 = time.time()
        for name, fn in all_queries().items():
            t0 = time.time()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.setdefault(name, []).append(round(time.time() - t0, 3))
            except Exception as exc:  # keep the bench line parseable on failure
                runs.setdefault(name, []).append(-1.0)
                print(f"bench error in {name}: {exc}", file=sys.stderr)
            # Queries are independent; drop persisted intermediates (dedup
            # materialization boundaries) AND orphaned localCheckpoint
            # RDD blocks — clearCache alone leaves the latter, and the
            # accumulated zombies were measured doubling the heavy graph
            # queries by the third pass (spread 22-39s on the iterative
            # plans before this cleanup).
            release_cached_state(spark)
        passes_done += 1
        # Persist after EVERY pass: if the driver's (unknown) timeout
        # kills a later pass, the artifact still carries the last
        # complete pass's medians instead of vanishing.
        with open(bench_local, "w") as f:
            f.write(summarize(passes_done) + "\n")
        pass_cost = time.time() - pass_t0
        pass_costs.append(pass_cost)
        print(f"pass {passes_done}: {pass_cost:.1f}s", file=sys.stderr)
        # Project the NEXT pass at the cheapest observed cost: one
        # GC-noisy pass must not forfeit the 3rd pass that makes the
        # per-query median robust to it.
        if time.time() - t_start + min(pass_costs) > budget:
            break

    # Stdout is the driver contract, but long registries have had the
    # tail of the captured line truncated (r2 lost its total) — the
    # file above always carries the full summary.
    print(summarize(passes_done))


if __name__ == "__main__":
    main()
