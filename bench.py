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
    from spark_streaming_kafka2elasticsearch_spark.session import build_session

    spark = build_session(master=f"local[{cpus}]", app_name="bench")

    # Untimed JVM/session warm-up (standard bench hygiene): one trivial
    # job so executor startup and first-job scheduling overhead don't
    # land inside whichever query happens to run first.  Per-query
    # codegen compilation is still paid inside each query's timing.
    spark.range(1_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, fn in all_queries().items():
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench error in {name}: {exc}", file=sys.stderr)
        # Queries are independent; drop persisted intermediates (dedup
        # materialization boundaries) so cache pressure from one query
        # can't skew the next one's timing.
        spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    summary = {
        "metric": "total wall-clock sec for all registered queries (noop sink)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    line = json.dumps(summary)
    # Stdout is the driver contract, but long registries have had the
    # tail of the captured line truncated (r2 lost its total) — also
    # persist the summary to a file so totals always survive.
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"),
        "w",
    ) as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
