"""Plan inspection: programmatic access to the physical plan so tests
can assert the *shape* of execution, not just results (SURVEY.md §4).

The reference's planner invariant — "the bucket route is byte-identical
to the bypass route, so the feature is a pure optimisation"
(query-engine.md:86) — becomes here: the declarative plan must show the
optimizations we rely on at 100 TB. These helpers let tests assert:

- predicate pushdown reached the parquet scan (PushedFilters);
- column pruning reached the scan (ReadSchema);
- small dimensions joined via BroadcastHashJoin (no shuffle);
- shuffle (Exchange) counts match the expected shape;
- hot expressions sit inside WholeStageCodegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame, *fragments: str) -> bool:
    """True iff every fragment appears in a PushedFilters list of some
    scan in the plan."""
    plan = physical_plan(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    return all(frag in pushed for frag in fragments)


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column sets of all scans — evidence of column pruning."""
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan — the scale
    currency. AQE may remove some at runtime; this counts the static
    plan's upper bound."""
    plan = physical_plan(df)
    # count only the numbered detail entries — the tree rendering repeats
    # each operator once more
    return len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))


def whole_stage_codegen_spans(df: DataFrame) -> int:
    plan = physical_plan(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))


def count_broadcast_hints(df: DataFrame) -> int:
    """Number of explicit broadcast HINTS in the analyzed logical plan.

    Distinct from :func:`uses_broadcast_join`: AQE choosing a broadcast
    for a small side at runtime is healthy; a *hint* pins the choice
    regardless of size and becomes a driver OOM when the hinted side
    scales with the corpus. Tests cap the hint count on operators whose
    join sides are corpus-sized."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))
