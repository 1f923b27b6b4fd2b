"""Physical-plan assertions (SURVEY §4): the optimizations Catalyst should
be doing for us — predicate pushdown, column pruning, broadcast joins,
whole-stage codegen — verified from ``explain`` output so regressions are
test failures, not silent slowdowns at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The ``df.explain(mode)`` text as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the formatted plan."""
    text = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning check)."""
    text = explain_str(df, "formatted")
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """True if any stage compiles to whole-stage codegen. Under AQE the
    plan only carries codegen spans once stages are materialized, so this
    EXECUTES the frame's own query execution (``collect`` — ``count()``
    would plan a separate job and leave this one adaptive-unresolved) and
    reads the final plan. Call on small/aggregated frames only."""
    df.collect()
    text = explain_str(df, "formatted")
    # codegen'd operators carry a `*` prefix in the final formatted plan
    # (e.g. `+- * HashAggregate (9)`)
    return "WholeStageCodegen" in text or bool(re.search(r"\+- \* \w|^\s*\* \w", text, re.M))


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains an unconstrained CartesianProduct — the
    join-explosion failure mode. A 1-row scalar ``crossJoin(broadcast(...))``
    plans as BroadcastNestedLoopJoin and is NOT flagged."""
    return "CartesianProduct" in explain_str(df, "simple")


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan. After
    adaptive execution the explain output carries BOTH final and initial
    plans — only the final section (before '== Initial Plan ==') counts."""
    text = explain_str(df, "simple").split("== Initial Plan ==")[0]
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", text))


def partitionless_window_count(df: DataFrame) -> int:
    """Number of physical Window operators with an EMPTY partition spec —
    the one-task-holds-everything shape that serializes a corpus through
    a single executor at scale (the repo-wide rule: distributed prefix
    ranks via order-preserving bucketing, never a partition-less window).
    A fully-specified Window prints three top-level bracket groups
    ``Window [funcs], [partSpec], [orderSpec]``; with only two, the
    second is EITHER the partition spec (unordered window — fine) or the
    order spec (partition-less — flagged): order specs carry ASC/DESC
    markers, partition specs never do."""
    text = explain_str(df, "simple").split("== Initial Plan ==")[0]
    n = 0
    for line in text.splitlines():
        m = re.search(r"\bWindow(?:GroupLimit)? (\[.*)$", line)
        if not m or "WindowGroupLimit" in line:
            continue  # group-limit pushdown nodes mirror the real Window
        groups: list[str] = []
        depth = 0
        for ch in m.group(1):
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0:
                groups[-1] += ch
        if len(groups) >= 3:
            continue  # [funcs], [partSpec], [orderSpec]
        if len(groups) == 2 and not re.search(r" ASC| DESC", groups[1]):
            continue  # [funcs], [partSpec] — partitioned, unordered
        n += 1
    return n
