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


def _scala_seq(seq):
    return [seq.apply(i) for i in range(seq.size())]


def _is_scalar_subtree(jnode) -> bool:
    """True when this physical subtree provably emits EXACTLY ONE row:
    a chain of row-preserving single-child nodes (exchange / project /
    codegen wrapper) ending at a grouping-less aggregate.  Used to
    separate benign broadcast scalar subqueries from real cartesians —
    a ``crossJoin(broadcast(df.agg(...)))`` multiplies nothing."""
    name = jnode.getClass().getSimpleName()
    if name in (
        "HashAggregateExec",
        "SortAggregateExec",
        "ObjectHashAggregateExec",
    ):
        return jnode.groupingExpressions().isEmpty()
    if name == "ReusedExchangeExec":
        return _is_scalar_subtree(jnode.child())
    children = _scala_seq(jnode.children())
    if len(children) == 1 and name in (
        "BroadcastExchangeExec",
        "ShuffleExchangeExec",
        "AQEShuffleReadExec",
        "ProjectExec",
        "WholeStageCodegenExec",
        "InputAdapter",
        "FilterExec",  # filter can only shrink 1 row to 0/1
        "CoalesceExec",
    ):
        return _is_scalar_subtree(children[0])
    return False


def _walk(jnode):
    yield jnode
    name = jnode.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        # AQE wrapper exposes the plan as a field, not as children()
        yield from _walk(jnode.initialPlan())
        return
    for ch in _scala_seq(jnode.children()):
        yield from _walk(ch)


def _tree_has_cartesian(jplan) -> bool:
    """Tree-walk cartesian detection: CartesianProduct, or an
    UNCONDITIONED Cross/Inner BroadcastNestedLoopJoin whose build side
    is NOT a provable single-row (scalar-subquery) subtree."""
    for node in _walk(jplan):
        name = node.getClass().getSimpleName()
        if name == "CartesianProductExec":
            return True
        if name == "BroadcastNestedLoopJoinExec":
            if node.condition().isDefined():
                continue  # conditioned BNLJ (range join) is legitimate
            jt = node.joinType().toString()
            if jt not in ("Cross", "Inner"):
                continue
            build_right = "BuildRight" in node.buildSide().toString()
            left, right = _scala_seq(node.children())
            build = right if build_right else left
            if not _is_scalar_subtree(build):
                return True
    return False


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
        # Tree walk, not string match: an unconditioned Cross/Inner
        # BNLJ or CartesianProduct flags — UNLESS the broadcast side is
        # a provable one-row scalar subquery (grouping-less aggregate
        # behind row-preserving nodes), the standard
        # crossJoin(broadcast(df.agg(...))) idiom that multiplies
        # nothing.  A conditioned BNLJ (range join) is legitimate.
        "has_cartesian": _tree_has_cartesian(
            df._jdf.queryExecution().executedPlan()
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
