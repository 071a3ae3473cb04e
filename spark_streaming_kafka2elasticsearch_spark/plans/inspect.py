"""Physical-plan inspection — the engine's own scale-review tooling.

Every 100 TB regression in this repo's history was visible in the
physical plan before it was visible in a benchmark: an Exchange that
should not exist, a scan without pushed filters, a join that silently
stopped broadcasting.  ``plan_metrics`` turns the plan string into a
small dict so tests (and operators' own guards) can assert plan SHAPE
— "zero exchanges", "exactly one broadcast join", "filter reached the
scan" — instead of grepping ad hoc.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_metrics(df: DataFrame) -> dict:
    """Summarize the executed (post-AQE-planning) physical plan.

    Returns::

        {
          "n_exchanges": int,          # shuffle boundaries
          "n_broadcast_joins": int,
          "n_sort_merge_joins": int,
          "n_broadcast_nested_loop": int,
          "has_cartesian": bool,
          "n_codegen_spans": int,      # WholeStageCodegen regions; AQE
                                       # assigns these only once a plan
                                       # EXECUTES, so un-executed
                                       # adaptive plans report 0 —
                                       # best-effort, never asserted
                                       # alone
          "n_scans": int,
          "scans_with_pushed_filters": int,
        }
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    codegen_ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)) | set(
        re.findall(r"\*\((\d+)\)", plan)
    )
    return {
        "n_exchanges": plan.count("Exchange"),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sort_merge_joins": plan.count("SortMergeJoin"),
        "n_broadcast_nested_loop": plan.count("BroadcastNestedLoopJoin"),
        # An unconditioned cross shows up as CartesianProduct (both
        # sides big) or as a BroadcastNestedLoopJoin whose join-type
        # field says Cross/Inner with NO trailing condition — a
        # conditioned BNLJ (range join) carries "(cond)" after the type
        # and is legitimate.
        "has_cartesian": "CartesianProduct" in plan
        or bool(
            re.search(r"BroadcastNestedLoopJoin Build(Left|Right), (Cross|Inner)\s*$",
                      plan, re.MULTILINE)
        ),
        "n_codegen_spans": len(codegen_ids),
        "n_scans": plan.count("FileScan") + plan.count("BatchScan"),
        "scans_with_pushed_filters": sum(1 for s in scans if s.strip()),
    }


def assert_no_cartesian(df: DataFrame) -> None:
    """Guard for composed pipelines: raise before launching a job whose
    plan degenerated into a cross product (the classic silent killer
    when a join condition references the wrong column)."""
    m = plan_metrics(df)
    if m["has_cartesian"]:
        raise ValueError(
            "plan contains a cross product (CartesianProduct or "
            "unconditioned BroadcastNestedLoopJoin) — a join condition "
            "is missing or references only one side"
        )
