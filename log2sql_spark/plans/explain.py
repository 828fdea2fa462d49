"""Physical-plan inspection: the feedback loop for 100 TB plan quality.

The project contract (BASELINE.json / build brief) demands iterating on
``.explain("formatted")`` until the plan is the one you'd *want*: filters
at the scan, dimensions broadcast, no gratuitous shuffles, wide codegen
stages. These helpers turn that from eyeballing into assertions the test
suite enforces (tests/test_plans.py), so a regression that drops a
pushdown or flips a broadcast join to sort-merge fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across every scan in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan
    (AQE may collapse some at runtime; this is the static plan)."""
    return len(re.findall(r"\bExchange ", explain_str(df)))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", explain_str(df)))


def _children(node) -> list:  # py4j TreeNode
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


_BOUNDING_NODES = frozenset(
    {
        # a grouped aggregate caps the window's input at key cardinality
        "Aggregate",
        # LimitPushDownThroughWindow / InferWindowGroupLimit: a top-k
        # rank filter plans as a distributed TakeOrderedAndProject (or a
        # per-partition group limit) BELOW the window, so the single
        # partition sees only k (or partitions*k) rows
        "GlobalLimit",
        "LocalLimit",
        "WindowGroupLimit",
    }
)


def _subtree_has_bounding_node(node) -> bool:
    stack = _children(node)
    while stack:
        n = stack.pop()
        if n.nodeName() in _BOUNDING_NODES:
            return True
        stack.extend(_children(n))
    return False


def unpartitioned_raw_window_count(df: DataFrame) -> int:
    """Count logical Window nodes with an EMPTY partition spec whose
    input subtree contains NO Aggregate — i.e. a single-partition sort
    over data-proportional rows, the one plan shape that cannot scale
    (Catalyst plans it as Exchange SinglePartition + one task holding
    the whole input). Post-aggregate global windows (cumulative curves
    over deciles/hours/distinct scores) and limit-bounded top-k rank
    windows are deliberately NOT counted: their input is already
    cardinality-bounded below the window. The r14 plan-audit gate fails
    any registered query where this is > 0 without a disposition;
    distributed_global_rank (operators/ranks.py) is the sanctioned
    replacement."""
    root = df._jdf.queryExecution().optimizedPlan()
    count = 0
    stack = [root]
    while stack:
        n = stack.pop()
        if (
            n.nodeName() == "Window"
            and n.partitionSpec().size() == 0
            and not _subtree_has_bounding_node(n)
        ):
            count += 1
        stack.extend(_children(n))
    return count


def whole_stage_codegen_ids(df: DataFrame) -> list[int]:
    """Codegen stage ids — wider/fewer stages mean more of the plan runs
    fused in generated JVM code. (Simple mode marks them ``*(n)``;
    formatted mode drops the markers.)"""
    simple = explain_str(df, mode="simple")
    return sorted({int(m.group(1)) for m in re.finditer(r"\*\((\d+)\)", simple)})
